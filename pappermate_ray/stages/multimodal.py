"""Multimodal columns (beyond-reference, driver brief): images/audio/video
as opaque ``binary`` columns with typed metadata, processed by actor-pool
``map_batches`` stages.

Codec work is REAL where the environment allows it (functions/media.py,
stdlib+numpy only — the public BMP and WAV formats, and a seekable
length-prefixed frame container whose per-frame codec is BMP):

- ``MediaFeatureExtract`` decodes each payload (BMP image / WAV audio /
  RVID video) and emits a 16-float feature vector; malformed payloads
  soft-fail per row into (decode_status='error', decode_error).
- ``MediaResize`` decodes, nearest-neighbor-resamples into ``max_side``
  (aspect preserved), re-encodes, and updates payload + metadata.
- ``FrameSample`` samples ``n_frames`` uniformly and SEEK-decodes only
  those frames from the container (what a real container gives you —
  sampled-frame cost, not whole-video cost), one output row per frame.

``fake=True`` on each stage swaps in the deterministic byte-hash path
(no codec touched) for hermetic plumbing tests.

At scale: binary payloads are MB-sized → small ``batch_size`` (8-64),
actor pools with ``num_cpus`` sized for the codec, and the blob column
dropped as soon as features are extracted so shuffles never carry media
bytes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..functions.media import (
    FEATURE_DIM,
    audio_features,
    decode_bmp,
    decode_rvid_frame,
    decode_wav,
    encode_bmp,
    encode_rvid,
    encode_wav,
    image_features,
    resize_nearest,
    rvid_frame_count,
)

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # image | audio | video
        ("payload", pa.large_binary()),
        ("meta_width", pa.int32()),
        ("meta_height", pa.int32()),
        ("meta_duration_ms", pa.int32()),
    ]
)


def _fake_feature(payload: bytes, salt: int = 0) -> np.ndarray:
    digest = hashlib.md5((payload or b"") + (bytes([salt]) if salt else b"")).digest()
    return np.frombuffer(digest, dtype=np.uint8).astype(np.float32) / 255.0


class MediaFeatureExtract:
    """Actor-pool stage: decode + feature-extract media payloads.

    ``__init__`` is the once-per-actor setup point (ST1 pattern — a model
    build would pin weights here); ``__call__`` decodes per batch.
    """

    def __init__(self, fake: bool = False):
        self.fake = fake

    def _decode(self, payload: bytes, media_type: str) -> np.ndarray:
        if self.fake:
            return _fake_feature(payload)
        if media_type == "image":
            return image_features(decode_bmp(payload))
        if media_type == "audio":
            return audio_features(*decode_wav(payload))
        if media_type == "video":
            # representative frame (first) + container-level duration signal
            feat = image_features(decode_rvid_frame(payload, 0))
            feat = feat.copy()
            feat[15] = rvid_frame_count(payload) / 1024.0
            return feat
        raise ValueError(f"unknown media_type {media_type!r}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, oks, errs = [], [], []
        for payload, mtype in zip(batch["payload"].to_pylist(), batch["media_type"].to_pylist()):
            try:
                feats.append(self._decode(payload, mtype).tolist())
                oks.append("ok")
                errs.append("")
            except Exception as e:  # soft-fail per row
                feats.append([0.0] * FEATURE_DIM)
                oks.append("error")
                errs.append(str(e)[:200])
        out = batch.drop_columns(["payload"])  # media bytes never leave this stage
        out = out.append_column("features", pa.array(feats, pa.list_(pa.float32(), FEATURE_DIM)))
        out = out.append_column("decode_status", pa.array(oks, pa.string()))
        out = out.append_column("decode_error", pa.array(errs, pa.string()))
        return out


class MediaResize:
    """Actor-pool stage: aspect-preserving image resize into ``max_side``.

    Real path: BMP decode → nearest-neighbor resample → BMP re-encode,
    payload AND metadata updated. ``fake=True`` updates metadata only
    (geometry math identical). Non-image rows pass through untouched;
    undecodable images pass through with original payload/metadata.
    """

    def __init__(self, max_side: int = 256, fake: bool = False):
        self.max_side = max_side
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        types = batch["media_type"].to_pylist()
        payloads = batch["payload"].to_pylist()
        ws = batch["meta_width"].to_pylist()
        hs = batch["meta_height"].to_pylist()
        new_p, new_w, new_h = [], [], []
        for mtype, payload, w, h in zip(types, payloads, ws, hs):
            if mtype != "image":
                new_p.append(payload)
                new_w.append(w or 0)
                new_h.append(h or 0)
                continue
            if self.fake:
                if not w or not h:
                    new_p.append(payload); new_w.append(0); new_h.append(0)
                    continue
                scale = min(1.0, self.max_side / max(w, h))
                new_p.append(payload)
                new_w.append(int(w * scale))
                new_h.append(int(h * scale))
                continue
            try:
                img = decode_bmp(payload)
                ih, iw = img.shape[:2]
                scale = min(1.0, self.max_side / max(iw, ih))
                tw, th = max(int(iw * scale), 1), max(int(ih * scale), 1)
                out = img if (tw, th) == (iw, ih) else resize_nearest(img, tw, th)
                new_p.append(encode_bmp(out))
                new_w.append(tw)
                new_h.append(th)
            except Exception:
                new_p.append(payload)
                new_w.append(w or 0)
                new_h.append(h or 0)
        out = batch.set_column(batch.schema.get_field_index("payload"), "payload",
                               pa.array(new_p, pa.large_binary()))
        out = out.set_column(out.schema.get_field_index("meta_width"), "meta_width",
                             pa.array(new_w, pa.int32()))
        return out.set_column(out.schema.get_field_index("meta_height"), "meta_height",
                              pa.array(new_h, pa.int32()))


class FrameSample:
    """Actor-pool stage: sample ``n_frames`` uniformly per video and emit
    one feature row per frame (flat-map shape: rows explode).

    Real path seek-decodes ONLY the sampled frames from the RVID
    container; non-video rows emit a single frame=-1 row with their own
    modality's features.
    """

    def __init__(self, n_frames: int = 4, fake: bool = False):
        self.n_frames = n_frames
        self.fake = fake

    def _row_feature(self, payload: bytes, mtype: str) -> list:
        if self.fake:
            return _fake_feature(payload).tolist()
        if mtype == "image":
            return image_features(decode_bmp(payload)).tolist()
        if mtype == "audio":
            return audio_features(*decode_wav(payload)).tolist()
        return [0.0] * FEATURE_DIM

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, types, frames, feats = [], [], [], []
        for mid, mtype, payload in zip(
            batch["media_id"].to_pylist(), batch["media_type"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            if mtype != "video":
                ids.append(mid)
                types.append(mtype)
                frames.append(-1)
                try:
                    feats.append(self._row_feature(payload, mtype))
                except Exception:
                    feats.append([0.0] * FEATURE_DIM)
                continue
            if self.fake:
                for f in range(self.n_frames):
                    ids.append(mid); types.append(mtype); frames.append(f)
                    feats.append(_fake_feature(payload, f + 1).tolist())
                continue
            try:
                total = rvid_frame_count(payload)
            except Exception:
                total = 0
            k = min(self.n_frames, total)
            # uniform deterministic sample over the container's frames
            picks = [(j * total) // max(k, 1) for j in range(k)]
            for f in picks:
                ids.append(mid)
                types.append(mtype)
                frames.append(f)
                try:
                    feats.append(image_features(decode_rvid_frame(payload, f)).tolist())
                except Exception:
                    feats.append([0.0] * FEATURE_DIM)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "media_type": pa.array(types, pa.string()),
                "frame": pa.array(frames, pa.int32()),
                "features": pa.array(feats, pa.list_(pa.float32(), FEATURE_DIM)),
            }
        )


def _synth_image(i: int, w: int, h: int) -> np.ndarray:
    """Deterministic gradient-plus-checker test image."""
    ys = np.arange(h, dtype=np.float32)[:, None]
    xs = np.arange(w, dtype=np.float32)[None, :]
    r = (((ys + i * 3) % h) * 255 / max(h - 1, 1)).repeat(w, axis=1)
    g = (((xs + i * 5) % w) * 255 / max(w - 1, 1)).repeat(h, axis=0)
    b = (((ys // 4 + xs // 4 + i) % 2) * 255).astype(np.float32)
    return np.stack([r, g, b], axis=2).astype(np.uint8)


def synth_media_table(n: int) -> pa.Table:
    """Deterministic REAL media rows: BMP images, WAV audio, RVID video —
    all pure functions of the row index."""
    rows = []
    for i in range(n):
        mtype = ["image", "audio", "video"][i % 3]
        if mtype == "image":
            w, h = 48 + (i % 13) * 8, 32 + (i % 7) * 8
            payload = encode_bmp(_synth_image(i, w, h))
            meta = (w, h, 0)
        elif mtype == "audio":
            rate = 8000
            dur_ms = 100 + (i % 10) * 50
            t = np.arange(int(rate * dur_ms / 1000), dtype=np.float32)
            freq = 220.0 + (i % 12) * 55.0
            samples = (np.sin(2 * np.pi * freq * t / rate) * 12000).astype(np.int16)
            payload = encode_wav(samples, rate)
            meta = (0, 0, dur_ms)
        else:
            n_frames = 4 + i % 5
            frames = [_synth_image(i * 31 + f, 40, 24) for f in range(n_frames)]
            payload = encode_rvid(frames)
            meta = (40, 24, n_frames * 40)
        rows.append(
            {
                "media_id": i,
                "media_type": mtype,
                "payload": payload,
                "meta_width": meta[0],
                "meta_height": meta[1],
                "meta_duration_ms": meta[2],
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _hamming_block(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise Hamming distances between two uint64 vectors, (|a|,|b|),
    via byte-table popcount (no Python loop)."""
    x = a[:, None] ^ b[None, :]
    return _POP8[x.view(np.uint8)].reshape(len(a), len(b), 8).sum(
        axis=-1, dtype=np.int64)


def phash_near_dups(
    ds,
    id_col: str = "media_id",
    payload_col: str = "payload",
    max_hamming: int = 3,
    bands: int = 4,
    max_bucket: int = 4096,
) -> "object":
    """Perceptual near-duplicate IMAGE pairs (the multimodal member of
    the near-dup family): (id_a, id_b, hamming) for every pair whose
    64-bit aHash fingerprints differ in ≤ ``max_hamming`` bits.

    Shape (mirrors ``stages/dedup._bucket_pairs_grouped``):

    1. One streaming decode pass emits (id, phash) — 8 bytes/row leave
       the stage; payloads NEVER shuffle. Undecodable rows drop (soft
       fail), matching MediaFeatureExtract's per-row error stance.
    2. Hamming LSH: each hash explodes into ``bands`` disjoint
       (64/bands)-bit band keys. Two hashes within ``max_hamming`` <
       ``bands`` bit flips MUST agree on some whole band (pigeonhole),
       so candidate recall is exact — the same guarantee structure as
       MinHash banding, but deterministic. Candidates are verified
       IN-PARTITION by vectorized byte-table popcount; buckets larger
       than ``max_bucket`` are skipped (the boilerplate-storm cap —
       identical blank images would otherwise make one task O(n²)).
    3. Cross-band repeats collapse in ONE narrow (id_a, id_b) groupby.

    Exchanges: one band-key grouped exchange over 24-byte rows + one
    pair dedup; both O(images), never O(pixels).
    """
    from ..functions.media import ahash64

    def hashes(t: pa.Table) -> pa.Table:
        ids, hs = [], []
        for i, payload in zip(t[id_col].to_pylist(),
                              t[payload_col].to_pylist()):
            try:
                hs.append(ahash64(decode_bmp(payload)))
                ids.append(i)
            except Exception:
                continue  # soft-fail: undecodable rows exit the dedup
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "phash": pa.array(hs, pa.uint64())})

    hashed = ds.map_batches(hashes, batch_format="pyarrow")
    return hamming_near_dup_pairs(hashed, id_col=id_col, hash_col="phash",
                                  max_hamming=max_hamming, bands=bands,
                                  max_bucket=max_bucket)


def hamming_near_dup_pairs(
    hashed,
    id_col: str = "media_id",
    hash_col: str = "phash",
    max_hamming: int = 3,
    bands: int = 4,
    max_bucket: int = 4096,
) -> "object":
    """Hash-level core of ``phash_near_dups``: (id_a, id_b, hamming)
    for every pair of 64-bit fingerprints differing in ≤ ``max_hamming``
    bits, from an already-hashed ``(id_col, hash_col uint64)`` Dataset.
    Exposed so SQL-expressible hash plants can oracle the whole band /
    bucket / popcount-verify / dedup machinery (the decode stage is
    what keeps the image variant rows-only) — see queries.py
    ``hamming_near_dups_planted``. Recall is exact for
    ``max_hamming < bands`` (pigeonhole over disjoint bands)."""
    from ray.data.aggregate import Min

    from ..ops.grouping import partition_grouped

    if not (0 <= max_hamming < bands):
        raise ValueError("recall guarantee needs max_hamming < bands")
    if 64 % bands:
        raise ValueError("bands must divide 64")
    width = 64 // bands
    mask = (1 << width) - 1

    def explode_bands(t: pa.Table) -> pa.Table:
        h = t[hash_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keys, oids, ohs = [], [], []
        for b in range(bands):
            band = ((h >> np.uint64(b * width)) & np.uint64(mask)).astype(np.int64)
            keys.append(band * bands + b)
            oids.append(ids)
            ohs.append(h)
        return pa.table({
            "band_key": pa.array(np.concatenate(keys) if keys else [], pa.int64()),
            id_col: pa.array(np.concatenate(oids) if oids else [], pa.int64()),
            hash_col: pa.array(np.concatenate(ohs) if ohs else [], pa.uint64()),
        })

    banded = hashed.map_batches(explode_bands, batch_format="pyarrow")
    parted, gcols = partition_grouped(banded, ["band_key"])

    def bucket_pairs(df):
        import pandas as pd
        df = df.sort_values(["band_key", id_col], kind="mergesort")
        bk = df["band_key"].to_numpy()
        ids = df[id_col].to_numpy().astype(np.int64)
        hs = df[hash_col].to_numpy().astype(np.uint64)
        starts = np.flatnonzero(np.r_[True, bk[1:] != bk[:-1]])
        ends = np.r_[starts[1:], len(bk)]
        out_a, out_b, out_d = [], [], []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2 or m > max_bucket:
                continue
            rid, rh = ids[s:e], hs[s:e]
            # blockwise so a capped bucket's distance matrix stays small
            for lo in range(0, m, 256):
                hi = min(lo + 256, m)
                d = _hamming_block(rh[lo:hi], rh)
                ai, bj = np.nonzero((d <= max_hamming)
                                    & (rid[lo:hi, None] < rid[None, :]))
                out_a.append(rid[lo + ai])
                out_b.append(rid[bj])
                out_d.append(d[ai, bj])
        if not out_a:
            return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                                 "id_b": pd.Series([], dtype=np.int64),
                                 "hamming": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b),
                             "hamming": np.concatenate(out_d)})

    pairs = parted.groupby(gcols).map_groups(bucket_pairs,
                                             batch_format="pandas")
    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Min("hamming", alias_name="hamming"))


def video_near_dups(
    ds,
    id_col: str = "media_id",
    payload_col: str = "payload",
    n_frames: int = 4,
    min_shared: int = 2,
    max_hash_videos: int = 1024,
) -> "object":
    """Near-duplicate VIDEO pairs: (id_a, id_b, n_shared) for videos
    sharing ≥ ``min_shared`` distinct sampled-frame perceptual hashes —
    re-encodes, frame drops and truncations keep most sampled aHashes
    identical, so shared-hash count is the container-robust signal.

    Shape = ``stages/winnow.winnow_clone_pairs`` over frame hashes:

    1. One streaming pass per video SEEK-decodes only ``n_frames``
       uniformly-sampled frames (the FrameSample contract) and emits
       DISTINCT (frame_hash, id) rows — 16 bytes/row; payloads never
       shuffle. Undecodable containers soft-fail out.
    2. ONE hash-partition-grouped exchange on frame_hash: within each
       partition, per-hash runs emit triu pairs (hashes carried by more
       than ``max_hash_videos`` videos are skipped — the blank-frame
       storm cap, same role as LSH max_bucket) AND pre-combine local
       pair counts (combiner push-down, packed keys).
    3. One narrow (id_a, id_b) groupby-sum finishes; pairs below
       ``min_shared`` drop.
    """
    from ..functions.media import ahash64

    def frame_hashes(t: pa.Table) -> pa.Table:
        ids, hs = [], []
        for i, payload in zip(t[id_col].to_pylist(),
                              t[payload_col].to_pylist()):
            try:
                total = rvid_frame_count(payload)
                k = min(n_frames, total)
                picks = {(j * total) // max(k, 1) for j in range(k)}
                row_hashes = {ahash64(decode_rvid_frame(payload, f))
                              for f in picks}
            except Exception:
                continue  # soft-fail: undecodable containers exit
            ids.extend([i] * len(row_hashes))
            hs.extend(row_hashes)
        return pa.table({"fhash": pa.array(hs, pa.uint64()),
                         id_col: pa.array(ids, pa.int64())})

    hashed = ds.map_batches(frame_hashes, batch_format="pyarrow")
    return _shared_hash_pairs(hashed, id_col, min_shared, max_hash_videos)


def _shared_hash_pairs(hashed, id_col: str, min_shared: int,
                       max_hash_ids: int) -> "object":
    """(fhash, id) rows → (id_a, id_b, n_shared) pairs sharing
    ≥ ``min_shared`` distinct hashes — the winnow_clone_pairs core,
    shared by the video and audio near-dup operators. ONE
    partition-grouped exchange (in-partition triu pair runs with a
    ``max_hash_ids`` storm cap + local groupby-size combine) + one
    narrow pair groupby-sum."""
    from ray.data.aggregate import Sum

    from ..ops.grouping import partition_grouped

    parted, gcols = partition_grouped(hashed, ["fhash"])

    def run_pairs(df):
        import pandas as pd
        df = df.sort_values(["fhash", id_col], kind="mergesort")
        fh = df["fhash"].to_numpy()
        ids = df[id_col].to_numpy().astype(np.int64)
        starts = np.flatnonzero(np.r_[True, fh[1:] != fh[:-1]])
        ends = np.r_[starts[1:], len(fh)]
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            # per-run id dedup (the winnow core does the same): an id
            # carried by several input rows must not self-pair or
            # double-count a shared hash
            run = np.unique(ids[s:e])  # sorted ⇒ triu gives id_a < id_b
            m = len(run)
            if m < 2 or m > max_hash_ids:
                continue
            ia, ib = np.triu_indices(m, 1)
            out_a.append(run[ia])
            out_b.append(run[ib])
        if not out_a:
            return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                                 "id_b": pd.Series([], dtype=np.int64),
                                 "n_shared": pd.Series([], dtype=np.int64)})
        # local combine (combiner push-down): one vectorized groupby-size
        dfp = pd.DataFrame({"id_a": np.concatenate(out_a),
                            "id_b": np.concatenate(out_b)})
        out = dfp.groupby(["id_a", "id_b"], as_index=False).size()
        return out.rename(columns={"size": "n_shared"}).astype(
            {"n_shared": np.int64})

    pairs = parted.groupby(gcols).map_groups(run_pairs,
                                             batch_format="pandas")
    summed = pairs.groupby(["id_a", "id_b"]).aggregate(
        Sum("n_shared", alias_name="n_shared"))

    def threshold(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        return t.filter(_pc.greater_equal(t["n_shared"], min_shared))

    return summed.map_batches(threshold, batch_format="pyarrow")


def audio_near_dups(
    ds,
    id_col: str = "media_id",
    payload_col: str = "payload",
    min_shared: int = 4,
    max_hash_clips: int = 1024,
) -> "object":
    """Near-duplicate AUDIO pairs: clips sharing ≥ ``min_shared``
    distinct Haitsma–Kalker sub-fingerprints (functions/media.
    audio_fingerprints_hk — 32-bit spectral double-difference words,
    invariant to uniform amplitude scaling). Completes the multimodal
    near-dup triad (image ``phash_near_dups`` / video
    ``video_near_dups`` / audio); same two-exchange shared-hash shape,
    payloads never shuffle."""
    from ..functions.media import audio_fingerprints_hk, decode_wav

    def clip_hashes(t: pa.Table) -> pa.Table:
        ids, hs = [], []
        for i, payload in zip(t[id_col].to_pylist(),
                              t[payload_col].to_pylist()):
            try:
                samples, _rate = decode_wav(payload)
                fps = set(audio_fingerprints_hk(samples).tolist())
            except Exception:
                continue  # soft-fail: undecodable clips exit
            ids.extend([i] * len(fps))
            hs.extend(fps)
        return pa.table({"fhash": pa.array(hs, pa.uint64()),
                         id_col: pa.array(ids, pa.int64())})

    hashed = ds.map_batches(clip_hashes, batch_format="pyarrow")
    return _shared_hash_pairs(hashed, id_col, min_shared, max_hash_clips)
