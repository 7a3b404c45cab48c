"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas iterators
(``mapInPandas``) — the Spark-side architecture is real and tested.
Uncompressed image decode is REAL (``decode_ppm``: a pure-Python binary-PPM
parser, driven end-to-end by ``image_pixel_stats``); compressed codecs
(JPEG/audio/video) would need libraries absent from this environment and
stay stubbed behind ``FakeCodec``, clearly marked.

Design for 100 TB: binary payloads never pass through Python row-by-row —
mapInPandas streams Arrow record batches; metadata-only plans (filters on
width/duration) prune whole files before any payload is decoded because
metadata lives in ordinary parquet columns, not inside the blob.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Canonical multimodal schema: payload + sidecar metadata columns
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)


class FakeCodec:
    """STUB decoder. A real deployment swaps this for PIL/ffmpeg/soundfile.

    The fake parses a deterministic 16-byte header we also use in tests:
    bytes 0-3 width, 4-7 height, 8-11 n_frames, 12-15 sample_rate
    (big-endian uint32 each). Raises on short payloads like a real codec
    would on a corrupt file.
    """

    HEADER_LEN = 16

    @staticmethod
    def probe(payload: bytes) -> tuple[int, int, int, int]:
        if payload is None or len(payload) < FakeCodec.HEADER_LEN:
            raise ValueError("corrupt media payload: missing header")
        w = int.from_bytes(payload[0:4], "big")
        h = int.from_bytes(payload[4:8], "big")
        frames = int.from_bytes(payload[8:12], "big")
        rate = int.from_bytes(payload[12:16], "big")
        return w, h, frames, rate

    @staticmethod
    def decode_pixels(payload: bytes):
        """Pixel decode. PPM (P6) payloads decode for real via
        ``decode_ppm``; compressed formats (JPEG/PNG) would need an image
        library not present in this environment and stay unsupported."""
        if payload is not None and payload[:2] == b"P6":
            return decode_ppm(payload)
        raise NotImplementedError(
            "compressed pixel decode requires an image library (PIL/libjpeg); "
            "only uncompressed PPM (P6) is supported in this environment"
        )


def decode_ppm(payload: bytes):
    """REAL pure-Python decoder for binary PPM (P6): parses the whitespace/
    comment-tolerant ASCII header, then views the raw RGB plane as a numpy
    (height, width, 3) uint8 array — zero copies beyond the frombuffer view.

    Raises ValueError on anything malformed (wrong magic, truncated header,
    16-bit maxval, short pixel plane) so callers can route corrupt files to
    the invalid path exactly like a libjpeg failure would.
    """
    import numpy as np

    if payload is None or payload[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    pos, fields = 2, []
    n = len(payload)
    while len(fields) < 3:
        while pos < n and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < n and payload[pos : pos + 1] == b"#":
            while pos < n and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < n and not payload[pos : pos + 1].isspace():
            pos += 1
        if pos == start:
            raise ValueError("truncated PPM header")
        try:
            fields.append(int(payload[start:pos]))
        except ValueError as e:
            raise ValueError("malformed PPM header field") from e
    # the spec mandates EXACTLY ONE whitespace byte between maxval and the
    # pixel plane; reject anything else explicitly (a CRLF-separated header
    # would otherwise shift the plane read one byte early and surface only
    # as a confusing truncated-plane error)
    if not payload[pos : pos + 1].isspace():
        raise ValueError(
            "PPM header: maxval must be terminated by a single whitespace byte"
        )
    pos += 1
    width, height, maxval = fields
    if width <= 0 or height <= 0:
        raise ValueError("non-positive PPM dimensions")
    if not 0 < maxval < 256:
        raise ValueError("only 8-bit PPM supported")
    need = width * height * 3
    plane = payload[pos : pos + need]
    if len(plane) < need:
        raise ValueError("truncated PPM pixel plane")
    return width, height, np.frombuffer(plane, dtype=np.uint8).reshape(height, width, 3)


PROBE_SCHEMA = (
    "media_id long, media_type string, width int, height int, "
    "n_frames int, sample_rate int, n_bytes long, valid boolean"
)


def probe_media(df: DataFrame) -> DataFrame:
    """Extract typed metadata from the binary payload via mapInPandas
    (Arrow batches; one Python roundtrip per batch, not per row)."""

    def _probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, mtype, content in zip(
                pdf["media_id"], pdf["media_type"], pdf["content"]
            ):
                try:
                    w, h, fr, rate = FakeCodec.probe(content)
                    out.append((media_id, mtype, w, h, fr, rate, len(content), True))
                except ValueError:
                    out.append((media_id, mtype, None, None, None, None,
                                len(content) if content is not None else 0, False))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "media_type", "width", "height",
                    "n_frames", "sample_rate", "n_bytes", "valid",
                ],
            )

    return df.select("media_id", "media_type", "content").mapInPandas(
        _probe, schema=PROBE_SCHEMA
    )


FEATURE_SCHEMA = "media_id long, features array<float>"


def byte_histogram_features(
    df: DataFrame, n_bins: int = 16, carry: tuple[str, ...] = ()
) -> DataFrame:
    """Feature extraction over the payload: normalized byte histogram —
    a stand-in for a real embedding model, with the identical mapInPandas
    batch shape a model-serving UDF would use.

    ``carry`` names sidecar metadata columns to pass through the batch
    unchanged (typed from the input schema), so callers that need both the
    features AND the metadata don't have to re-derive the input frame and
    join — at scale that join would re-run the whole payload-packing scan a
    second time."""

    carry_fields = [df.schema[c] for c in carry]
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            *carry_fields,
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )
    out_cols = ["media_id", *carry, "features"]

    def _feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for media_id, *extras, content in zip(
                pdf["media_id"], *[pdf[c] for c in carry], pdf["content"]
            ):
                if content is None or len(content) == 0:
                    rows.append((media_id, *extras, [0.0] * n_bins))
                    continue
                arr = np.frombuffer(content, dtype=np.uint8)
                hist, _ = np.histogram(arr, bins=n_bins, range=(0, 256))
                rows.append(
                    (media_id, *extras, (hist / len(arr)).astype("float32").tolist())
                )
            yield pd.DataFrame(rows, columns=out_cols)

    return df.select("media_id", *carry, "content").mapInPandas(
        _feats, schema=out_schema
    )


def decode_wav(payload: bytes):
    """REAL pure-Python decoder for RIFF/WAVE PCM: walks the chunk list,
    reads the fmt descriptor, and views the data chunk as little-endian
    int16 samples. Raises ValueError on malformed/truncated/non-PCM input
    so corrupt files route to the invalid path like a real codec failure.

    Returns (n_channels, sample_rate, samples: np.ndarray[int16]) with
    samples interleaved when multi-channel.
    """
    import numpy as np

    if payload is None or len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = 12, len(payload)
    fmt = data = None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError("truncated WAV chunk")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if len(fmt) < 16:
        raise ValueError("short fmt chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits != 16:
        raise ValueError("only 16-bit PCM supported")
    if channels <= 0 or rate <= 0 or len(data) % (2 * channels):
        raise ValueError("inconsistent PCM geometry")
    return channels, rate, np.frombuffer(data, dtype="<i2")


def video_frame_offsets(payload: bytes) -> list[tuple[int, int]]:
    """Walk a VID0 container (4-byte magic, le32 frame count, then
    length-prefixed frames) and return (offset, length) per frame WITHOUT
    touching frame bytes — the index scan that makes sampled decode cheap.
    Raises ValueError on malformed/truncated containers."""
    if payload is None or len(payload) < 8 or payload[:4] != b"VID0":
        raise ValueError("not a VID0 container")
    n = int.from_bytes(payload[4:8], "little")
    pos, out = 8, []
    for _ in range(n):
        if pos + 4 > len(payload):
            raise ValueError("truncated frame table")
        flen = int.from_bytes(payload[pos : pos + 4], "little")
        pos += 4
        if pos + flen > len(payload):
            raise ValueError("truncated frame payload")
        out.append((pos, flen))
        pos += flen
    return out


FRAME_STATS_SCHEMA = "media_id long, frame_idx int, mean_px double"


def video_frame_stats(df: DataFrame, every_nth: int = 3) -> DataFrame:
    """REAL video decode path: for each container, index the frame table,
    decode ONLY every ``every_nth`` frame (PPM frames, the same pure-Python
    parser as images), and emit one row per sampled frame. Payloads are
    never duplicated per frame — sampling happens inside the Arrow batch,
    which is the 100 TB-relevant property (decode cost tracks frames KEPT,
    not frames stored). Corrupt containers emit a single
    (media_id, -1, NULL) row."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                # accumulate per-container rows locally and publish only on
                # full success: a container whose frame TABLE parses but
                # whose sampled frame BYTES are malformed must yield exactly
                # one corrupt sentinel, never valid-looking partial rows
                # alongside it
                frame_rows = []
                try:
                    offsets = video_frame_offsets(content)
                    for idx in range(0, len(offsets), every_nth):
                        off, flen = offsets[idx]
                        _, _, px = decode_ppm(content[off : off + flen])
                        frame_rows.append(
                            (media_id, idx, float(px.astype("int64").mean()))
                        )
                    rows.extend(frame_rows)
                except ValueError:
                    rows.append((media_id, -1, None))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "mean_px"])

    return df.select("media_id", "content").mapInPandas(
        _stats, schema=FRAME_STATS_SCHEMA
    )


AUDIO_STATS_SCHEMA = (
    "media_id long, valid boolean, n_channels int, sample_rate int, "
    "n_samples int, mean_amplitude double, peak_amplitude int, duration_ms double"
)


def audio_sample_stats(df: DataFrame) -> DataFrame:
    """REAL audio decode path: RIFF/WAV payloads -> per-clip sample stats
    via Arrow-batched mapInPandas, mirroring ``image_pixel_stats``."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    ch, rate, samples = decode_wav(content)
                    frames = len(samples) // ch
                    s64 = samples.astype("int64")
                    rows.append(
                        (
                            media_id, True, ch, rate, frames,
                            float(s64.mean()) if len(s64) else 0.0,
                            int(np.abs(s64).max()) if len(s64) else 0,
                            frames * 1000.0 / rate,
                        )
                    )
                except ValueError:
                    rows.append(
                        (media_id, False, None, None, None, None, None, None)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "valid", "n_channels", "sample_rate",
                    "n_samples", "mean_amplitude", "peak_amplitude", "duration_ms",
                ],
            )

    return df.select("media_id", "content").mapInPandas(
        _stats, schema=AUDIO_STATS_SCHEMA
    )


PIXEL_STATS_SCHEMA = (
    "media_id long, valid boolean, width int, height int, n_pixels int, "
    "mean_r double, mean_g double, mean_b double, byte_sum long"
)


def image_pixel_stats(df: DataFrame) -> DataFrame:
    """REAL decode path: run every payload through the PPM decoder in
    Arrow batches and emit per-image channel statistics — the exact shape a
    resize/feature-extract stage would take. Corrupt payloads (bad magic,
    truncated plane) surface as valid=false rows, not task failures."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    w, h, px = decode_ppm(content)
                    flat = px.reshape(-1, 3).astype("int64")
                    rows.append(
                        (
                            media_id, True, w, h, w * h,
                            float(flat[:, 0].mean()),
                            float(flat[:, 1].mean()),
                            float(flat[:, 2].mean()),
                            int(flat.sum()),
                        )
                    )
                except ValueError:
                    rows.append(
                        (media_id, False, None, None, None, None, None, None, None)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "valid", "width", "height", "n_pixels",
                    "mean_r", "mean_g", "mean_b", "byte_sum",
                ],
            )

    return df.select("media_id", "content").mapInPandas(
        _stats, schema=PIXEL_STATS_SCHEMA
    )


def sample_frames(df: DataFrame, every_nth: int = 10) -> DataFrame:
    """Video frame sampling plan: explode deterministic frame indices from
    metadata WITHOUT touching payloads (pure Column ops) — the decode of the
    selected frames would then run through a mapInPandas stage like
    ``probe_media``. Emits (media_id, frame_idx)."""
    probed = probe_media(df).filter(F.col("valid") & (F.col("n_frames") > 0))
    return probed.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.col("n_frames") - 1,
                F.lit(every_nth),
            )
        ).alias("frame_idx"),
    )


# ---------------------------------------------------------------------------
# Perceptual image hashing (dHash) + Hamming-banded image near-dup
# ---------------------------------------------------------------------------

DHASH_SCHEMA = "media_id long, valid boolean, dhash long"


def _block_mean_gray(px, out_w: int, out_h: int):
    """Integer area-mapped downsample of an (h, w, 3) uint8 plane to an
    (out_h, out_w) int64 grayscale grid: gray = channel sum // 3, each
    output cell = mean (// ) of its source block. Pure integer
    arithmetic end to end, so the hash is bit-deterministic across
    platforms (no float resampling kernels). Images smaller than the
    grid clamp each block to at least one source pixel (a 1x1 image
    yields a constant grid — gradients all zero, by design)."""
    import numpy as np

    h, w = px.shape[0], px.shape[1]
    gray = px.astype("int64").sum(axis=2) // 3
    out = np.zeros((out_h, out_w), dtype="int64")
    for r in range(out_h):
        r0 = min(r * h // out_h, h - 1)
        r1 = max(r0 + 1, (r + 1) * h // out_h)
        for c in range(out_w):
            c0 = min(c * w // out_w, w - 1)
            c1 = max(c0 + 1, (c + 1) * w // out_w)
            block = gray[r0:r1, c0:c1]
            out[r, c] = int(block.sum()) // block.size
    return out


def _dhash_of_px(px) -> int:
    """The dHash core over a decoded (h, w, 3) plane: 9x8 integer block
    means, bit r*8+c = grid[r,c] > grid[r,c+1], packed signed 64-bit.
    Shared by the still-image and per-frame video paths."""
    grid = _block_mean_gray(px, 9, 8)
    val = 0
    for r in range(8):
        for c in range(8):
            if grid[r, c] > grid[r, c + 1]:
                val |= 1 << (r * 8 + c)
    return val - (1 << 64) if val >= 1 << 63 else val


def image_dhash(df: DataFrame) -> DataFrame:
    """64-bit perceptual difference hash (dHash, Krawetz's construction:
    9x8 downsample, one bit per horizontal gradient) over the REAL
    decode path — the image analog of the text SimHash, and the
    standard screening stage for image dedup in web-scale training-data
    pipelines (near-identical crops/re-encodes land within a few bits).

    Deterministic by construction: integer grayscale, integer block
    means, fixed bit order (bit r*8+c = grid[r,c] > grid[r,c+1]), so
    the same payload hashes identically on every platform and the
    pytest pin against a pure-Python reference is exact. Corrupt
    payloads surface as valid=false rows, matching image_pixel_stats.
    Arrow-batched mapInPandas island (decode is the justified Python
    stage; everything downstream of the hash is JVM-side)."""

    def _dhash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    _w, _h, px = decode_ppm(content)
                    rows.append((media_id, True, _dhash_of_px(px)))
                except ValueError:
                    rows.append((media_id, False, None))
            yield pd.DataFrame(rows, columns=["media_id", "valid", "dhash"])

    return df.select("media_id", "content").mapInPandas(
        _dhash, schema=DHASH_SCHEMA
    )


def image_near_duplicates(
    df: DataFrame, max_hamming: int = 3, n_blocks: int = 4
) -> DataFrame:
    """Image near-dup pairs within ``max_hamming`` dHash bits: the
    Hamming-banded block-trick join shared with the text SimHash
    (extensions/dedup_fuzzy.py::hamming_near_pairs — pigeonhole
    recall 1.0 within the threshold, no all-pairs anywhere), over the
    valid decodes only. Emits (d1, d2, hamming) with d1 < d2."""
    from .dedup_fuzzy import hamming_near_pairs

    hashed = image_dhash(df).filter(F.col("valid")).select("media_id", "dhash")
    return hamming_near_pairs(
        hashed, "media_id", "dhash", 64, max_hamming, n_blocks
    )


AUDIO_HASH_SCHEMA = "media_id long, valid boolean, ahash long"


def audio_energy_hash(df: DataFrame) -> DataFrame:
    """64-bit energy-envelope fingerprint over the REAL WAV decode path —
    the audio sibling of ``image_dhash``, feeding the same Hamming-
    banded near-dup join: mono-mix (integer channel mean), 65 area-
    mapped windows, per-window mean energy (sum of squares // length,
    int64 — int16^2 sums stay well under 2^62), one bit per adjacent-
    window energy gradient. All-integer arithmetic, so the hash is
    bit-deterministic and robust to low-level noise (a gradient bit
    only flips when a perturbation crosses an energy ordering). The
    construction is the time-domain energy-envelope variant of classic
    audio fingerprinting (Haitsma-Kalker 2002 band-energy differences,
    without the FFT this sandbox can't make cross-platform
    bit-reproducible). Corrupt payloads -> valid=false rows."""
    import numpy as np

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    channels, _rate, samples = decode_wav(content)
                    if samples.size == 0:
                        raise ValueError("empty PCM stream")
                    mono = (
                        samples.astype("int64")
                        .reshape(-1, channels)
                        .sum(axis=1)
                        // channels
                    )
                    n = mono.size
                    sq = mono * mono
                    energies = []
                    for w in range(65):
                        lo = min(w * n // 65, n - 1)
                        hi = max(lo + 1, (w + 1) * n // 65)
                        energies.append(int(sq[lo:hi].sum()) // (hi - lo))
                    val = 0
                    for w in range(64):
                        if energies[w + 1] > energies[w]:
                            val |= 1 << w
                    if val >= 1 << 63:
                        val -= 1 << 64
                    rows.append((media_id, True, val))
                except ValueError:
                    rows.append((media_id, False, None))
            yield pd.DataFrame(rows, columns=["media_id", "valid", "ahash"])

    return df.select("media_id", "content").mapInPandas(
        _hash, schema=AUDIO_HASH_SCHEMA
    )


def audio_near_duplicates(
    df: DataFrame, max_hamming: int = 3, n_blocks: int = 4
) -> DataFrame:
    """Audio near-dup pairs within ``max_hamming`` envelope bits — the
    third modality over dedup_fuzzy.py::hamming_near_pairs (text
    SimHash, image dHash, audio energy hash: one banded join, no
    all-pairs anywhere)."""
    from .dedup_fuzzy import hamming_near_pairs

    hashed = (
        audio_energy_hash(df).filter(F.col("valid")).select("media_id", "ahash")
    )
    return hamming_near_pairs(
        hashed, "media_id", "ahash", 64, max_hamming, n_blocks
    )


FRAME_DHASH_SCHEMA = "media_id long, frame_idx int, dhash long"


def video_frame_dhash(df: DataFrame, every_nth: int = 3) -> DataFrame:
    """Per-sampled-frame dHash over the VID0 seek path: index the frame
    table, decode ONLY every ``every_nth`` frame (same cost property as
    video_frame_stats — decode tracks frames KEPT), hash each with the
    shared dHash core. Corrupt containers emit one (media_id, -1, NULL)
    sentinel, like the stats path."""

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                frame_rows = []
                try:
                    offsets = video_frame_offsets(content)
                    for idx in range(0, len(offsets), every_nth):
                        off, flen = offsets[idx]
                        _, _, px = decode_ppm(content[off : off + flen])
                        frame_rows.append((media_id, idx, _dhash_of_px(px)))
                    rows.extend(frame_rows)
                except ValueError:
                    rows.append((media_id, -1, None))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "dhash"]
            )

    return df.select("media_id", "content").mapInPandas(
        _hash, schema=FRAME_DHASH_SCHEMA
    )


def video_near_duplicates(
    df: DataFrame, every_nth: int = 3, min_shared: int = 2
) -> DataFrame:
    """Video near-dup pairs by sampled-frame fingerprint overlap: two
    videos pair when >= ``min_shared`` DISTINCT frame hashes coincide
    exactly (the standard shot-level screen — re-encoded/trimmed copies
    share most frame hashes; unrelated videos share none). The join
    keys on the frame hash itself, so candidate buckets are bounded by
    per-hash frequency — no all-pairs; a hash shared by f videos costs
    f^2 pair rows for THAT bucket only, the same cost class as the
    banded joins. Emits (d1, d2, shared_frames) with d1 < d2."""
    hashed = (
        video_frame_dhash(df, every_nth)
        .filter(F.col("dhash").isNotNull())
        .select("media_id", "dhash")
        .distinct()
    )
    left = hashed.select(F.col("media_id").alias("d1"), "dhash")
    right = hashed.select(F.col("media_id").alias("d2"), "dhash")
    return (
        left.join(right, "dhash")
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("shared_frames"))
        .filter(F.col("shared_frames") >= min_shared)
    )
