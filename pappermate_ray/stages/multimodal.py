"""Multimodal column plumbing (beyond-reference, driver brief).

Images/audio/video are opaque ``binary`` columns with typed metadata
(media_type, width/height/duration). The Ray-side plumbing — schema,
actor-pool signature, batch sizing, output layout — is real and tested;
the actual codec work is STUBBED: decode raises ``NotImplementedError``
unless ``fake=True``, in which case a deterministic fake "decoder"
produces byte-derived features (the decode libs are not in this
container by design).

At scale: binary payloads are MB-sized → small ``batch_size`` (8-64),
actor pools with ``num_cpus`` sized for the codec, and the blob column
dropped as soon as features are extracted so shuffles never carry media
bytes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

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

FEATURE_DIM = 16


class MediaFeatureExtract:
    """Actor-pool stage: decode + feature-extract media payloads.

    ``__init__`` is where a real build would load the codec / model once
    per actor (the ST1 pattern); ``fake=True`` swaps in a deterministic
    byte-hash feature so the plumbing is testable hermetically.
    """

    def __init__(self, fake: bool = True):
        self.fake = fake

    def _decode(self, payload: bytes, media_type: str) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "real media decode requires PIL/ffmpeg, not present in this container"
            )
        # deterministic fake: 16 float features from the md5 of the payload
        digest = hashlib.md5(payload or b"").digest()
        return np.frombuffer(digest, dtype=np.uint8).astype(np.float32) / 255.0

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
    """Actor-pool stage: image resize plumbing (codec STUBBED).

    Real builds decode + resample in ``__call__`` with the codec loaded in
    ``__init__``; here the geometry math (aspect-preserving fit into
    ``max_side``) is real and the pixel work is stubbed — with ``fake=True``
    the payload is passed through and only typed metadata updates.
    """

    def __init__(self, max_side: int = 256, fake: bool = True):
        self.max_side = max_side
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("real resize requires PIL, not present in this container")
        ws = batch["meta_width"].to_pylist()
        hs = batch["meta_height"].to_pylist()
        new_w, new_h = [], []
        for w, h in zip(ws, hs):
            if not w or not h:
                new_w.append(0)
                new_h.append(0)
                continue
            scale = min(1.0, self.max_side / max(w, h))
            new_w.append(int(w * scale))
            new_h.append(int(h * scale))
        out = batch.set_column(
            batch.schema.get_field_index("meta_width"), "meta_width",
            pa.array(new_w, pa.int32()),
        )
        return out.set_column(
            out.schema.get_field_index("meta_height"), "meta_height",
            pa.array(new_h, pa.int32()),
        )


class FrameSample:
    """Actor-pool stage: sample ``n_frames`` uniformly from video payloads
    and emit one feature row per frame (flat-map shape: rows explode).

    Decode is stubbed: frame features derive deterministically from
    (payload md5, frame index). Non-video rows pass through with frame -1.
    """

    def __init__(self, n_frames: int = 4, fake: bool = True):
        self.n_frames = n_frames
        self.fake = fake

    def _frame_feature(self, payload: bytes, idx: int) -> list:
        if not self.fake:
            raise NotImplementedError("real frame decode requires ffmpeg")
        digest = hashlib.md5((payload or b"") + bytes([idx])).digest()
        return (np.frombuffer(digest, dtype=np.uint8).astype(np.float32) / 255.0).tolist()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, types, frames, feats = [], [], [], []
        for mid, mtype, payload, dur in zip(
            batch["media_id"].to_pylist(), batch["media_type"].to_pylist(),
            batch["payload"].to_pylist(), batch["meta_duration_ms"].to_pylist(),
        ):
            if mtype != "video":
                ids.append(mid)
                types.append(mtype)
                frames.append(-1)
                feats.append(self._frame_feature(payload, 0))
                continue
            for f in range(self.n_frames):
                ids.append(mid)
                types.append(mtype)
                frames.append(f)
                feats.append(self._frame_feature(payload, f))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "media_type": pa.array(types, pa.string()),
                "frame": pa.array(frames, pa.int32()),
                "features": pa.array(feats, pa.list_(pa.float32(), FEATURE_DIM)),
            }
        )


def synth_media_table(n: int) -> pa.Table:
    """Deterministic fake media rows for tests (payload = f(row index))."""
    rows = []
    for i in range(n):
        mtype = ["image", "audio", "video"][i % 3]
        payload = (f"media-{i}-" * (8 + i % 17)).encode()
        rows.append(
            {
                "media_id": i,
                "media_type": mtype,
                "payload": payload,
                "meta_width": 640 if mtype == "image" else 0,
                "meta_height": 480 if mtype == "image" else 0,
                "meta_duration_ms": 0 if mtype == "image" else 1000 + i,
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)
