"""Multimodal binary-column plumbing: synthetic payloads with the FakeCodec
header, driven through the real mapInPandas stages."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_processing_with_aws_glue_workshop_spark.extensions.multimodal import (
    FakeCodec,
    MEDIA_SCHEMA,
    byte_histogram_features,
    probe_media,
    sample_frames,
)


def _payload(w: int, h: int, frames: int, rate: int, body: bytes) -> bytes:
    return (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + frames.to_bytes(4, "big")
        + rate.to_bytes(4, "big")
        + body
    )


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", _payload(640, 480, 1, 0, b"\x01\x02" * 100), "image/fake", 216),
        (2, "video", _payload(1920, 1080, 95, 30, b"\xff" * 64), "video/fake", 80),
        (3, "audio", _payload(0, 0, 0, 44100, b"\x00\x80" * 256), "audio/fake", 528),
        (4, "image", b"\x00\x01", "image/fake", 2),  # corrupt: short header
        (5, "image", None, "image/fake", 0),  # missing payload
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_probe_media(media):
    got = {r["media_id"]: r.asDict() for r in probe_media(media).collect()}
    assert got[1]["width"] == 640 and got[1]["height"] == 480 and got[1]["valid"]
    assert got[2]["n_frames"] == 95 and got[2]["sample_rate"] == 30
    assert got[3]["sample_rate"] == 44100
    assert not got[4]["valid"] and got[4]["width"] is None  # corrupt -> flagged, kept
    assert not got[5]["valid"]


def test_byte_histogram_features(media):
    feats = {r["media_id"]: r["features"] for r in byte_histogram_features(media).collect()}
    assert len(feats[1]) == 16
    assert abs(sum(feats[1]) - 1.0) < 1e-5  # normalized histogram
    assert feats[5] == [0.0] * 16  # missing payload -> zero vector


def test_sample_frames(media):
    frames = sample_frames(media, every_nth=10).collect()
    by_id: dict[int, list[int]] = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert sorted(by_id[2]) == list(range(0, 95, 10))  # video frames sampled
    assert 3 not in by_id  # audio: n_frames == 0 -> excluded
    assert 4 not in by_id  # corrupt excluded


def test_decode_stub_is_explicit_for_compressed():
    with pytest.raises(NotImplementedError):
        FakeCodec.decode_pixels(b"\xff\xd8\xff\xe0 jpeg-ish")


def test_decode_ppm_real_bytes():
    """The PPM decoder parses genuine P6 bytes, comments and all."""
    import numpy as np

    from big_data_processing_with_aws_glue_workshop_spark.extensions.multimodal import decode_ppm

    plane = bytes(range(2 * 3 * 3))  # 2x3 image, distinct bytes
    w, h, px = decode_ppm(b"P6\n# a comment\n3 2\n255\n" + plane)
    assert (w, h) == (3, 2) and px.shape == (2, 3, 3)
    assert px.dtype == np.uint8 and px.reshape(-1).tolist() == list(plane)
    # FakeCodec routes P6 payloads to the real decoder
    assert FakeCodec.decode_pixels(b"P6\n1 1\n255\nabc")[2].shape == (1, 1, 3)


@pytest.mark.parametrize(
    "payload",
    [
        None,
        b"P5\n1 1\n255\nx",  # wrong magic (PGM)
        b"P6\n2 2\n255\nshort",  # truncated plane
        b"P6\n2",  # truncated header
        b"P6\n1 1\n65535\n\x00\x00",  # 16-bit maxval
        b"P6\n0 1\n255\n",  # degenerate dimensions
    ],
)
def test_decode_ppm_rejects_malformed(payload):
    from big_data_processing_with_aws_glue_workshop_spark.extensions.multimodal import decode_ppm

    with pytest.raises(ValueError):
        decode_ppm(payload)


def test_media_pixel_stats_oracle(spark, sf_dir):
    """REAL decode round-trip: JVM-packed PPM bytes decoded by the numpy
    parser must match the fixture's analytic predictions."""
    from big_data_processing_with_aws_glue_workshop_spark.queries import ORACLES, QUERIES
    from tests.oracle_harness import compare

    compare(QUERIES["media_pixel_stats"](spark, sf_dir), ORACLES["media_pixel_stats"], sf_dir)


def test_media_probe_profile_oracle(spark, sf_dir):
    """Driver-facing round-trip: JVM-packed header bytes parsed back by the
    mapInPandas prober must match the analytic DuckDB twin."""
    from big_data_processing_with_aws_glue_workshop_spark.queries import ORACLES, QUERIES
    from tests.oracle_harness import compare

    compare(QUERIES["media_probe_profile"](spark, sf_dir), ORACLES["media_probe_profile"], sf_dir)


def test_media_byte_histogram_oracle_exact(spark, sf_dir):
    from big_data_processing_with_aws_glue_workshop_spark.queries import ORACLES, QUERIES
    from tests.oracle_harness import compare

    rows = QUERIES["media_byte_histogram"](spark, sf_dir).collect()
    assert [r["media_type"] for r in rows] == ["audio", "image", "video"]
    assert all(0.0 <= r["low_byte_share"] <= 1.0 for r in rows)
    assert all(r["low_byte_count"] <= r["total_bytes"] for r in rows)
    compare(
        QUERIES["media_byte_histogram"](spark, sf_dir),
        ORACLES["media_byte_histogram"],
        sf_dir,
    )


def _wav(channels=1, rate=8000, bits=16, samples=b"\x00\x01\xff\xff", fmt=1):
    import struct

    fmt_body = struct.pack(
        "<HHIIHH", fmt, channels, rate, rate * channels * bits // 8,
        channels * bits // 8, bits,
    )
    return (
        b"RIFF" + struct.pack("<I", 20 + len(fmt_body) + len(samples)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
        + b"data" + struct.pack("<I", len(samples)) + samples
    )


def test_decode_wav_real_bytes():
    from big_data_processing_with_aws_glue_workshop_spark.extensions.multimodal import decode_wav

    ch, rate, samples = decode_wav(_wav())
    assert (ch, rate) == (1, 8000)
    assert samples.tolist() == [256, -1]  # little-endian signed int16
    # stereo interleaved
    ch, _, samples = decode_wav(_wav(channels=2, samples=b"\x01\x00\x02\x00"))
    assert ch == 2 and samples.tolist() == [1, 2]


@pytest.mark.parametrize(
    "payload",
    [
        None,
        b"RIFX" + b"\x00" * 40,  # wrong magic
        _wav()[:20],  # truncated chunk
        _wav(fmt=3),  # non-PCM (IEEE float)
        _wav(bits=8),  # unsupported width
        _wav(samples=b"\x00"),  # odd data length
    ],
)
def test_decode_wav_rejects_malformed(payload):
    from big_data_processing_with_aws_glue_workshop_spark.extensions.multimodal import decode_wav

    with pytest.raises(ValueError):
        decode_wav(payload)


def _vid(frames: list[bytes], n_override: int | None = None) -> bytes:
    import struct

    n = len(frames) if n_override is None else n_override
    return b"VID0" + struct.pack("<I", n) + b"".join(
        struct.pack("<I", len(f)) + f for f in frames
    )


def test_video_frame_offsets_and_sampled_decode():
    from big_data_processing_with_aws_glue_workshop_spark.extensions.multimodal import (
        decode_ppm,
        video_frame_offsets,
    )

    f0 = b"P6\n1 1\n255\n\x01\x01\x01"
    f1 = b"P6\n1 1\n255\n\x02\x02\x02"
    payload = _vid([f0, f1])
    offs = video_frame_offsets(payload)
    assert len(offs) == 2
    # seek to frame 1 only and decode it
    off, ln = offs[1]
    assert payload[off : off + ln] == f1
    assert decode_ppm(payload[off : off + ln])[2].reshape(-1).tolist() == [2, 2, 2]


@pytest.mark.parametrize(
    "payload",
    [
        None,
        b"VID1" + b"\x00" * 8,  # wrong magic
        _vid([b"xy"], n_override=3),  # frame table longer than data
        _vid([b"xy"])[:-1],  # truncated final frame
    ],
)
def test_video_frame_offsets_rejects_malformed(payload):
    from big_data_processing_with_aws_glue_workshop_spark.extensions.multimodal import (
        video_frame_offsets,
    )

    with pytest.raises(ValueError):
        video_frame_offsets(payload)


# ---------------------------------------------------------------------------
# Perceptual image hashing (dHash) + Hamming-banded image near-dup
# ---------------------------------------------------------------------------


def _gradient_ppm(w: int, h: int, fn) -> bytes:
    """Genuine P6 bytes with per-pixel structure: gray value fn(x, y)
    replicated across RGB."""
    header = f"P6\n{w} {h}\n255\n".encode()
    plane = bytearray()
    for y in range(h):
        for x in range(w):
            v = fn(x, y) % 256
            plane += bytes((v, v, v))
    return header + bytes(plane)


def _ref_dhash(payload: bytes) -> int:
    """Pure-Python reference dHash (independent of the numpy operator
    path): parse the plane by hand, integer 9x8 block means, pack
    left>right gradient bits."""
    from big_data_processing_with_aws_glue_workshop_spark.extensions.multimodal import decode_ppm

    w, h, px = decode_ppm(payload)
    gray = [
        [sum(int(px[y][x][ch]) for ch in range(3)) // 3 for x in range(w)]
        for y in range(h)
    ]

    def block(r, c):
        r0 = min(r * h // 8, h - 1)
        r1 = max(r0 + 1, (r + 1) * h // 8)
        c0 = min(c * w // 9, w - 1)
        c1 = max(c0 + 1, (c + 1) * w // 9)
        vals = [gray[y][x] for y in range(r0, r1) for x in range(c0, c1)]
        return sum(vals) // len(vals)

    grid = [[block(r, c) for c in range(9)] for r in range(8)]
    val = 0
    for r in range(8):
        for c in range(8):
            if grid[r][c] > grid[r][c + 1]:
                val |= 1 << (r * 8 + c)
    return val - (1 << 64) if val >= 1 << 63 else val


def test_image_dhash_matches_pure_python_reference(spark):
    """Bit-exact parity on structured images of varied shapes, including
    degenerate 1x1; corrupt payloads surface valid=false."""
    from big_data_processing_with_aws_glue_workshop_spark.extensions.multimodal import (
        image_dhash,
    )

    payloads = {
        1: _gradient_ppm(32, 24, lambda x, y: 7 * x + 3 * y),
        2: _gradient_ppm(17, 11, lambda x, y: (x * x + y) % 251),
        3: _gradient_ppm(9, 8, lambda x, y: 255 - 13 * x),
        4: _gradient_ppm(1, 1, lambda x, y: 42),
        5: b"P6\n trunc",
    }
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in payloads.items()],
        "media_id long, content binary",
    )
    got = {r["media_id"]: (r["valid"], r["dhash"]) for r in image_dhash(df).collect()}
    for k in (1, 2, 3, 4):
        assert got[k] == (True, _ref_dhash(payloads[k])), k
    assert got[5] == (False, None)
    # structure sanity: gradient images produce non-trivial hashes
    assert got[1][1] != 0 and got[3][1] != 0
    # 1x1: constant grid, all gradients false
    assert got[4][1] == 0


def test_image_near_duplicates_blocked_hamming_join(spark):
    """A re-encoded/lightly-perturbed image lands within the threshold
    and is FOUND (pigeonhole recall is structural); an unrelated image
    is not paired; the corrupt row is excluded without failing."""
    from big_data_processing_with_aws_glue_workshop_spark.extensions.multimodal import (
        image_dhash,
        image_near_duplicates,
    )

    base = lambda x, y: 11 * x + 2 * y  # noqa: E731
    perturbed = lambda x, y: 11 * x + 2 * y + (3 if (x, y) == (5, 5) else 0)  # noqa: E731
    unrelated = lambda x, y: 255 - 9 * x + 5 * y  # noqa: E731
    df = spark.createDataFrame(
        [
            (1, bytearray(_gradient_ppm(36, 24, base))),
            (2, bytearray(_gradient_ppm(36, 24, perturbed))),
            (3, bytearray(_gradient_ppm(36, 24, unrelated))),
            (4, bytearray(b"P6\nbroken")),
        ],
        "media_id long, content binary",
    )
    hashes = {
        r["media_id"]: r["dhash"]
        for r in image_dhash(df).filter("valid").collect()
    }
    true_ham = bin((hashes[1] ^ hashes[2]) & ((1 << 64) - 1)).count("1")
    assert true_ham <= 3, "fixture: perturbation must stay within threshold"
    pairs = {
        (r["d1"], r["d2"]): r["hamming"]
        for r in image_near_duplicates(df, max_hamming=3).collect()
    }
    assert pairs == {(1, 2): true_ham}


def test_hamming_near_pairs_pigeonhole_recall_at_threshold(spark):
    """Structural recall: hashes differing in EXACTLY max_hamming bits
    spread across distinct blocks (the worst case for banding) are
    still found — sign bit included (bit 63 exercises the arithmetic-
    shift masking)."""
    from big_data_processing_with_aws_glue_workshop_spark.extensions.dedup_fuzzy import (
        hamming_near_pairs,
    )

    h1 = 0x0123456789ABCDEF
    flips = (1 << 63) | (1 << 40) | (1 << 5)  # three blocks of four
    h2 = h1 ^ flips

    def signed(v):
        return v - (1 << 64) if v >= 1 << 63 else v

    df = spark.createDataFrame(
        [(1, signed(h1)), (2, signed(h2))], "media_id long, dhash long"
    )
    pairs = hamming_near_pairs(df, "media_id", "dhash", 64, max_hamming=3).collect()
    assert len(pairs) == 1 and pairs[0]["hamming"] == 3
    # one bit past the threshold: excluded by the verify
    df2 = spark.createDataFrame(
        [(1, signed(h1)), (2, signed(h2 ^ (1 << 20)))],
        "media_id long, dhash long",
    )
    assert (
        hamming_near_pairs(df2, "media_id", "dhash", 64, max_hamming=3).count()
        == 0
    )


def _pcm_wav(samples: list[int], channels: int = 1, rate: int = 8000) -> bytes:
    """Genuine RIFF/WAVE PCM16 bytes from an int sample list."""
    import struct

    body = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * 2 * channels, 2 * channels, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _ref_energy_hash(samples: list[int], channels: int = 1) -> int:
    """Independent pure-Python reference of the energy-envelope hash."""
    mono = [
        sum(samples[i * channels + c] for c in range(channels)) // channels
        for i in range(len(samples) // channels)
    ]
    n = len(mono)
    sq = [v * v for v in mono]

    def energy(w):
        lo = min(w * n // 65, n - 1)
        hi = max(lo + 1, (w + 1) * n // 65)
        return sum(sq[lo:hi]) // (hi - lo)

    e = [energy(w) for w in range(65)]
    val = 0
    for w in range(64):
        if e[w + 1] > e[w]:
            val |= 1 << w
    return val - (1 << 64) if val >= 1 << 63 else val


def test_audio_energy_hash_matches_pure_python_reference(spark):
    """Bit-exact parity incl. stereo mono-mix; corrupt -> valid=false."""
    from big_data_processing_with_aws_glue_workshop_spark.extensions.multimodal import (
        audio_energy_hash,
    )

    ramp = [((i * 37) % 2000) - 1000 for i in range(1300)]
    stereo = [v for i in range(500) for v in (((i * 13) % 700) - 350, ((i * 7) % 900) - 450)]
    payloads = {
        1: (_pcm_wav(ramp), ramp, 1),
        2: (_pcm_wav(stereo, channels=2), stereo, 2),
    }
    df = spark.createDataFrame(
        [(k, bytearray(v[0])) for k, v in payloads.items()]
        + [(3, bytearray(b"RIFFbroken"))],
        "media_id long, content binary",
    )
    got = {
        r["media_id"]: (r["valid"], r["ahash"])
        for r in audio_energy_hash(df).collect()
    }
    for k, (_, samples, ch) in payloads.items():
        assert got[k] == (True, _ref_energy_hash(samples, ch)), k
    assert got[3] == (False, None)
    assert got[1][1] != 0


def test_audio_near_duplicates_across_modal_shared_join(spark):
    """A lightly-perturbed re-encode is found within the threshold; a
    structurally different signal is not paired."""
    from big_data_processing_with_aws_glue_workshop_spark.extensions.multimodal import (
        audio_energy_hash,
        audio_near_duplicates,
    )

    base = [((i * 29) % 3000) - 1500 for i in range(2600)]
    perturbed = [v + (1 if i % 997 == 0 else 0) for i, v in enumerate(base)]
    unrelated = [((i * i) % 2800) - 1400 for i in range(2600)]
    df = spark.createDataFrame(
        [
            (1, bytearray(_pcm_wav(base))),
            (2, bytearray(_pcm_wav(perturbed))),
            (3, bytearray(_pcm_wav(unrelated))),
        ],
        "media_id long, content binary",
    )
    hashes = {
        r["media_id"]: r["ahash"]
        for r in audio_energy_hash(df).filter("valid").collect()
    }
    true_ham = bin((hashes[1] ^ hashes[2]) & ((1 << 64) - 1)).count("1")
    assert true_ham <= 3, "fixture: perturbation must stay within threshold"
    pairs = {
        (r["d1"], r["d2"]): r["hamming"]
        for r in audio_near_duplicates(df, max_hamming=3).collect()
    }
    assert pairs == {(1, 2): true_ham}


def _vid0(frames: list[bytes]) -> bytes:
    import struct

    out = b"VID0" + struct.pack("<I", len(frames))
    for f in frames:
        out += struct.pack("<I", len(f)) + f
    return out


def test_video_near_duplicates_by_shared_frame_hashes(spark):
    """Two videos sharing >= min_shared sampled-frame dHashes pair; a
    video sharing only one does not; corrupt containers are excluded."""
    from big_data_processing_with_aws_glue_workshop_spark.extensions.multimodal import (
        video_frame_dhash,
        video_near_duplicates,
    )

    # structurally distinct frames: dHash keys on gradients, so vary the
    # gradient COEFFICIENTS per frame (an additive offset would cancel)
    f = lambda s: _gradient_ppm(  # noqa: E731
        18, 12, lambda x, y: ((s + 2) * x * x + (2 * s + 3) * y + x * y * s)
    )
    # every_nth=1 for the test: sampled set == all frames
    a = _vid0([f(1), f(2), f(3), f(4)])
    b = _vid0([f(3), f(1), f(9), f(2)])  # shares 3 frames with a
    c = _vid0([f(4), f(11), f(12), f(13)])  # shares 1 frame with a
    df = spark.createDataFrame(
        [
            (1, bytearray(a)),
            (2, bytearray(b)),
            (3, bytearray(c)),
            (4, bytearray(b"VID0xx")),
        ],
        "media_id long, content binary",
    )
    hashed = video_frame_dhash(df, every_nth=1)
    assert hashed.filter("media_id = 4").collect()[0]["frame_idx"] == -1
    pairs = {
        (r["d1"], r["d2"]): r["shared_frames"]
        for r in video_near_duplicates(df, every_nth=1, min_shared=2).collect()
    }
    assert pairs == {(1, 2): 3}
