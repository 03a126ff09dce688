"""Real media codecs (functions/media.py): BMP/WAV/RVID round-trips and
feature extractors — all stdlib+numpy, no imaging libraries."""

import numpy as np
import pytest

from pappermate_ray.functions.media import (
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


def _img(w, h, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


class TestBMP:
    @pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (4, 4), (17, 9), (64, 48)])
    def test_roundtrip_exact(self, w, h):
        img = _img(w, h, seed=w * 100 + h)
        out = decode_bmp(encode_bmp(img))
        assert out.shape == (h, w, 3)
        assert np.array_equal(out, img)  # lossless format → byte-exact

    def test_rejects_garbage(self):
        with pytest.raises(ValueError):
            decode_bmp(b"not a bitmap at all")
        with pytest.raises(ValueError):
            decode_bmp(encode_bmp(_img(8, 8))[:30])  # truncated

    def test_resize_nearest_shapes_and_determinism(self):
        img = _img(64, 48, seed=7)
        small = resize_nearest(img, 16, 12)
        assert small.shape == (12, 16, 3)
        assert np.array_equal(small, resize_nearest(img, 16, 12))
        # nearest-neighbor only ever copies source pixels
        assert set(np.unique(small)) <= set(np.unique(img))


class TestWAV:
    def test_roundtrip_exact(self):
        t = np.arange(800, dtype=np.float32)
        samples = (np.sin(2 * np.pi * 440 * t / 8000) * 10000).astype(np.int16)
        out, rate = decode_wav(encode_wav(samples, 8000))
        assert rate == 8000
        assert np.array_equal(out, samples)

    def test_rejects_garbage(self):
        with pytest.raises(Exception):
            decode_wav(b"RIFFgarbage")


class TestRVID:
    def test_frame_seek_decode(self):
        frames = [_img(10, 6, seed=i) for i in range(5)]
        blob = encode_rvid(frames)
        assert rvid_frame_count(blob) == 5
        for i in (0, 2, 4):
            assert np.array_equal(decode_rvid_frame(blob, i), frames[i])
        with pytest.raises(ValueError):
            decode_rvid_frame(blob, 5)
        with pytest.raises(ValueError):
            rvid_frame_count(b"XXXX")


class TestFeatures:
    def test_image_features_contract(self):
        f = image_features(_img(32, 16, seed=3))
        assert f.shape == (FEATURE_DIM,)
        assert f.dtype == np.float32
        assert np.array_equal(f, image_features(_img(32, 16, seed=3)))  # deterministic
        # dims encoded
        assert f[0] == np.float32(32 / 4096) and f[1] == np.float32(16 / 4096)

    def test_audio_features_contract(self):
        samples = (np.sin(np.linspace(0, 60, 1600)) * 20000).astype(np.int16)
        f = audio_features(samples, 8000)
        assert f.shape == (FEATURE_DIM,)
        assert abs(f[0] - 0.2) < 1e-5  # 1600/8000 s
        assert f[2] > 0  # rms of a sine is positive


def test_phash_near_dups_matches_bruteforce(ray_session):
    """LSH-banded pairs == brute-force all-pairs at hamming <= 3 (the
    pigeonhole recall guarantee), planted copies found at hamming 0,
    undecodable payloads soft-fail out."""
    import ray.data as rd

    from pappermate_ray.functions.media import ahash64, decode_bmp, encode_bmp
    from pappermate_ray.stages.multimodal import (_synth_image,
                                                  phash_near_dups)

    rows = []
    for i in range(40):
        img = _synth_image(i, 48, 32)
        rows.append({"media_id": i, "payload": encode_bmp(img)})
    # planted: exact re-encoded copy of 7, noised copy of 11
    rows.append({"media_id": 1007,
                 "payload": encode_bmp(_synth_image(7, 48, 32))})
    noisy = _synth_image(11, 48, 32).copy()
    noisy[:2, :2] = 255 - noisy[:2, :2]
    rows.append({"media_id": 1011, "payload": encode_bmp(noisy)})
    rows.append({"media_id": 9999, "payload": b"not a bmp"})

    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in phash_near_dups(rd.from_items(rows)).take_all()}

    hashes = {r["media_id"]: ahash64(decode_bmp(r["payload"]))
              for r in rows if r["media_id"] != 9999}
    want = {}
    ks = sorted(hashes)
    for x in range(len(ks)):
        for y in range(x + 1, len(ks)):
            d = bin(hashes[ks[x]] ^ hashes[ks[y]]).count("1")
            if d <= 3:
                want[(ks[x], ks[y])] = d
    assert got == want
    assert got[(7, 1007)] == 0
    assert not any(9999 in p for p in got)


def test_video_near_dups_planted(ray_session):
    """Exact re-encode shares all sampled frame hashes; a truncated
    copy still shares >= min_shared; unrelated videos share none;
    undecodable containers soft-fail out."""
    import ray.data as rd

    from pappermate_ray.functions.media import encode_rvid
    from pappermate_ray.stages.multimodal import video_near_dups

    def frames(seed, n):
        # seeded NOISE frames: aHash of noise is ~uniform over 64 bits,
        # so unrelated videos cannot collide (gradient synth images DO
        # collide at 8x8 resolution — too smooth)
        rng = np.random.RandomState(1000 + seed)
        return [rng.randint(0, 256, (24, 40, 3)).astype(np.uint8)
                for _ in range(n)]

    rows = [{"media_id": i, "payload": encode_rvid(frames(i, 8))}
            for i in range(12)]
    rows.append({"media_id": 100, "payload": encode_rvid(frames(3, 8))})
    # truncation keeps the first 6 of 8 frames: uniform picks over 6
    # still land on frames shared with the original
    rows.append({"media_id": 101, "payload": encode_rvid(frames(3, 8)[:6])})
    rows.append({"media_id": 999, "payload": b"xx"})

    out = {(r["id_a"], r["id_b"]): r["n_shared"]
           for r in video_near_dups(rd.from_items(rows),
                                    n_frames=4, min_shared=2).take_all()}
    assert out[(3, 100)] == 4          # all 4 sampled hashes shared
    assert (3, 101) in out and out[(3, 101)] >= 2
    assert (100, 101) in out
    assert not any(999 in p for p in out)
    # unrelated originals never pair
    assert not [(a, b) for (a, b) in out if a < 12 and b < 12 and a != 3]


def test_media_dedup_composes_with_keep_list(ray_session):
    """The multimodal near-dup pairs plug straight into the existing
    text-dedup keep-list machinery: phash pairs -> connected components
    -> min-id survivor -> losers are exactly the planted copies."""
    import ray.data as rd

    from pappermate_ray.functions.media import encode_bmp
    from pappermate_ray.stages.dedup import (cluster_pairs, keep_list,
                                             loser_ids)
    from pappermate_ray.stages.multimodal import phash_near_dups

    rows = []
    for i in range(30):
        rng = np.random.RandomState(500 + i)
        img = rng.randint(0, 256, (32, 48, 3)).astype(np.uint8)
        rows.append({"media_id": i, "payload": encode_bmp(img)})
        if i % 5 == 0:
            rows.append({"media_id": 1_000 + i, "payload": encode_bmp(img)})

    pairs = phash_near_dups(rd.from_items(rows))
    clusters = cluster_pairs(pairs.select_columns(["id_a", "id_b"]))
    losers = loser_ids(clusters, keep_list(clusters))
    assert {r["doc_id"] for r in losers.take_all()} \
        == {1_000 + i for i in range(0, 30, 5)}


def test_audio_near_dups_planted(ray_session):
    """Amplitude-scaled and truncated copies pair with their original
    (HK double-difference fingerprints are scale-invariant); unrelated
    noise clips never pair; garbage soft-fails out. Refactor guard:
    video_near_dups still finds exact copies through the shared
    _shared_hash_pairs core."""
    import ray.data as rd

    from pappermate_ray.functions.media import encode_wav
    from pappermate_ray.stages.multimodal import audio_near_dups

    def clip(seed, n=16000):
        rng = np.random.RandomState(seed)
        t = np.arange(n, dtype=np.float64)
        f0 = 200 + 37 * seed
        return (np.sin(2 * np.pi * f0 * t / 8000) * 9000
                + np.sin(2 * np.pi * (f0 * 2.3) * t / 8000) * 4000
                + rng.normal(0, 300, n)).astype(np.int16)

    rows = [{"media_id": i, "payload": encode_wav(clip(i), 8000)}
            for i in range(8)]
    half = (clip(3) // 2).astype(np.int16)
    rows.append({"media_id": 100, "payload": encode_wav(half, 8000)})
    rows.append({"media_id": 101, "payload": encode_wav(clip(3)[:10000], 8000)})
    rows.append({"media_id": 999, "payload": b"RIFFgarbage"})

    out = {(r["id_a"], r["id_b"]): r["n_shared"]
           for r in audio_near_dups(rd.from_items(rows),
                                    min_shared=4).take_all()}
    assert (3, 100) in out and out[(3, 100)] >= 10   # scale-invariant
    assert (3, 101) in out and out[(3, 101)] >= 4    # truncation overlap
    assert not any(999 in p for p in out)
    assert not [(a, b) for (a, b) in out if a < 8 and b < 8]


def test_video_near_dups_duplicate_id_rows(ray_session):
    """An id appearing in MULTIPLE input rows (raw recrawl shape) must
    not self-pair or double-count shared hashes."""
    import ray.data as rd

    from pappermate_ray.functions.media import encode_rvid
    from pappermate_ray.stages.multimodal import video_near_dups

    def frames(seed, n):
        rng = np.random.RandomState(3000 + seed)
        return [rng.randint(0, 256, (24, 40, 3)).astype(np.uint8)
                for _ in range(n)]

    rows = [
        {"media_id": 1, "payload": encode_rvid(frames(0, 8))},
        {"media_id": 1, "payload": encode_rvid(frames(0, 8))},  # dup row
        {"media_id": 2, "payload": encode_rvid(frames(0, 8))},
    ]
    out = {(r["id_a"], r["id_b"]): r["n_shared"]
           for r in video_near_dups(rd.from_items(rows),
                                    n_frames=4, min_shared=2).take_all()}
    assert out == {(1, 2): 4}  # no (1,1); n_shared not inflated to 8


def test_shared_hash_pairs_storm_cap(ray_session):
    """A frame hash carried by more ids than max_hash_clips is skipped
    (the blank-frame storm cap) without suppressing pairs from other
    hashes."""
    import pyarrow as pa
    import ray.data as rd

    from pappermate_ray.stages.multimodal import _shared_hash_pairs

    rows = []
    # storm: hash 7 shared by 50 ids (over the cap of 10)
    for i in range(50):
        rows.append({"fhash": 7, "media_id": i})
    # signal: ids 100/101 share hashes 20 and 21
    for h in (20, 21):
        rows.append({"fhash": h, "media_id": 100})
        rows.append({"fhash": h, "media_id": 101})
    ds = rd.from_arrow(pa.table({
        "fhash": pa.array([r["fhash"] for r in rows], pa.uint64()),
        "media_id": pa.array([r["media_id"] for r in rows], pa.int64()),
    }))
    out = {(r["id_a"], r["id_b"]): r["n_shared"]
           for r in _shared_hash_pairs(ds, "media_id", min_shared=2,
                                       max_hash_ids=10).take_all()}
    assert out == {(100, 101): 2}
