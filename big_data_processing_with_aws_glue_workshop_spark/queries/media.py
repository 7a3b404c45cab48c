"""Driver-visible multimodal queries.

The testdata ships no binary media, so the fixture is built IN the query,
deterministically, from the ``documents`` table: a 16-byte big-endian header
(width/height/n_frames/sample_rate, the exact layout FakeCodec.probe parses
— extensions/multimodal.py) concatenated with the UTF-8 payload of the text.
Every byte is produced JVM-side (``unhex(lpad(hex(x),8,'0'))`` packs a
big-endian uint32; ``encode`` emits the body), so the binary column is real
Spark plumbing, not a Python detour.

``media_probe_profile`` then round-trips those bytes through the Arrow-
batched ``mapInPandas`` prober and is oracle-checked against a DuckDB twin
that computes the expected header fields analytically — a genuine check
that pack -> binary column -> batch decode agree end to end. A sprinkling
of deliberately-truncated payloads (doc_id % 97 == 0) exercises the corrupt-
file path. ``media_byte_histogram`` aggregates the payload-derived features
exactly (integer low-byte counts recovered from the float32 weights, one
final IEEE division) so even the histogram UDF carries a full DuckDB twin.

Reference parity: the reference has no media surface; this family implements
the brief's multimodal-column requirement (binary payload + typed metadata,
decode stubbed, plumbing real).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ._tables import load, parallelize_scan

CORRUPT_EVERY = 97  # doc_id % 97 == 0 -> truncated payload (corrupt-file path)


def _be32(col: Column) -> Column:
    """Pack a non-negative int (< 2^32) as 4 big-endian bytes, JVM-side."""
    return F.unhex(F.lpad(F.hex(col.cast("bigint")), 8, "0"))


def media_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic (media_id, media_type, content) built from documents."""
    d = parallelize_scan(load(spark, sf_dir, "documents"), "doc_id")
    width = F.col("doc_id") % 640 + 16
    height = F.col("doc_id") % 480 + 16
    frames = F.col("doc_id") % 100
    rate = F.lit(8000) + (F.col("doc_id") % 3) * 4000
    header = F.concat(_be32(width), _be32(height), _be32(frames), _be32(rate))
    content = F.when(
        F.col("doc_id") % CORRUPT_EVERY == 0,
        F.unhex(F.lit("00")),  # 1 byte: shorter than any header
    ).otherwise(
        # coalesce: a NULL text must yield an empty payload, not a NULL
        # content (which would silently flip the row to the corrupt path)
        F.concat(header, F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8"))
    )
    media_type = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return d.select(
        F.col("doc_id").alias("media_id"),
        media_type.alias("media_type"),
        content.alias("content"),
    )


def q_media_probe_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip: pack header bytes JVM-side, parse them back through the
    mapInPandas prober. The oracle recomputes the expected fields
    analytically, so any disagreement in packing, Arrow transfer, or batch
    decode shows up as a value mismatch."""
    from ..extensions.multimodal import probe_media

    return probe_media(media_fixture(spark, sf_dir))


def ppm_image_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic REAL binary-PPM images built JVM-side from documents:
    ASCII header ``P6\\n{w} {h}\\n255\\n`` + a uniform RGB plane (every byte
    = doc_id % 256, packed via unhex(repeat(..))). Dimensions stay small
    (w<=16, h<=8) so the fixture is a few hundred bytes per row; doc_id %
    97 == 0 rows are truncated after 5 bytes to exercise the corrupt path."""
    d = parallelize_scan(load(spark, sf_dir, "documents"), "doc_id")
    width = (F.col("doc_id") % 16 + 1).cast("int")
    height = (F.col("doc_id") % 8 + 1).cast("int")
    header = F.encode(
        F.concat_ws(
            "",
            F.lit("P6\n"),
            width.cast("string"),
            F.lit(" "),
            height.cast("string"),
            F.lit("\n255\n"),
        ),
        "UTF-8",
    )
    plane = F.unhex(
        F.expr("repeat(lpad(hex(doc_id % 256), 2, '0'), "
               "int((doc_id % 16 + 1) * (doc_id % 8 + 1) * 3))")
    )
    full = F.concat(header, plane)
    content = F.when(
        F.col("doc_id") % CORRUPT_EVERY == 0, F.substring(full, 1, 5)
    ).otherwise(full)
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        content.alias("content"),
    )


def q_media_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, driver-checked: pack genuine binary PPM files
    JVM-side, decode them with the pure-Python PPM parser in Arrow batches
    (extensions/multimodal.py::decode_ppm), and emit per-image channel
    stats. The oracle predicts every field analytically from the fixture
    parameters, so a single flipped byte anywhere in pack -> binary column
    -> Arrow transfer -> header parse -> numpy plane view shows up as a
    value mismatch. Truncated payloads must surface as valid=false rows."""
    from ..extensions.multimodal import image_pixel_stats

    return image_pixel_stats(ppm_image_fixture(spark, sf_dir))


def _le16(col: Column) -> Column:
    """Pack a value (interpreted mod 2^16, two's complement) as 2
    little-endian bytes, JVM-side."""
    hx = F.lpad(F.hex(col.cast("bigint").bitwiseAND(F.lit(65535))), 4, "0")
    return F.unhex(F.concat(F.substring(hx, 3, 2), F.substring(hx, 1, 2)))


def _le32(col: Column) -> Column:
    """Pack a non-negative int (< 2^32) as 4 little-endian bytes, JVM-side."""
    hx = F.lpad(F.hex(col.cast("bigint")), 8, "0")
    return F.unhex(
        F.concat(
            F.substring(hx, 7, 2),
            F.substring(hx, 5, 2),
            F.substring(hx, 3, 2),
            F.substring(hx, 1, 2),
        )
    )


def wav_audio_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic REAL RIFF/WAVE PCM16 mono clips built JVM-side from
    documents: canonical RIFF header + fmt + data chunks, with every sample
    equal to doc_id % 2048 - 1024 (negatives exercise the little-endian
    two's-complement path). doc_id % 97 == 0 rows are truncated after 8
    bytes (mid-RIFF-header) for the corrupt path."""
    d = parallelize_scan(load(spark, sf_dir, "documents"), "doc_id")
    n_samples = (F.col("doc_id") % 100 + 1).cast("int")
    rate = F.element_at(
        F.array(F.lit(8000), F.lit(16000), F.lit(44100)),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    data_size = (n_samples * 2).cast("bigint")
    header = F.concat(
        F.encode(F.lit("RIFF"), "UTF-8"),
        _le32(data_size + 36),
        F.encode(F.lit("WAVEfmt "), "UTF-8"),
        _le32(F.lit(16)),
        _le16(F.lit(1)),              # PCM
        _le16(F.lit(1)),              # mono
        _le32(rate),
        _le32(rate * 2),              # byte rate
        _le16(F.lit(2)),              # block align
        _le16(F.lit(16)),             # bits per sample
        F.encode(F.lit("data"), "UTF-8"),
        _le32(data_size),
    )
    # the sample plane: one LE16 hex pattern repeated n_samples times
    # (expr: repeat() needs a column count)
    plane = F.unhex(F.expr(
        "repeat(concat(substring(lpad(hex(int(doc_id % 2048 - 1024) & 65535), 4, '0'), 3, 2),"
        "              substring(lpad(hex(int(doc_id % 2048 - 1024) & 65535), 4, '0'), 1, 2)),"
        "       int(doc_id % 100 + 1))"
    ))
    full = F.concat(header, plane)
    content = F.when(
        F.col("doc_id") % CORRUPT_EVERY == 0, F.substring(full, 1, 8)
    ).otherwise(full)
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("media_type"),
        content.alias("content"),
    )


def q_media_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode, driver-checked: JVM-packed RIFF/WAV PCM16 clips
    parsed back by the pure-Python chunk walker (extensions/multimodal.py::
    decode_wav); every stat is analytically predicted by the oracle."""
    from ..extensions.multimodal import audio_sample_stats

    return audio_sample_stats(wav_audio_fixture(spark, sf_dir))


def framed_video_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic VID0 video containers built JVM-side from documents:
    magic + le32 frame count + length-prefixed 4x2 PPM frames whose uniform
    pixel value VARIES per frame ((doc_id + 7*frame) % 256), so sampled
    decode must seek to the right frame to score. The per-frame bytes are
    assembled with a higher-order F.aggregate over sequence(0, n-1) — all
    JVM-side, no Python in the packer. doc_id % 97 == 0 rows are truncated
    after 6 bytes (mid frame table) for the corrupt path."""
    d = parallelize_scan(load(spark, sf_dir, "documents"), "doc_id")
    n_frames = (F.col("doc_id") % 10 + 1).cast("int")
    # one frame: le32(35) + "P6\n4 2\n255\n" (11 ascii bytes) + 24 plane bytes
    frame_header = F.concat(
        _le32(F.lit(35)), F.encode(F.lit("P6\n4 2\n255\n"), "UTF-8")
    )
    frames = F.aggregate(
        F.sequence(F.lit(0), n_frames - 1),
        F.lit(b""),
        lambda acc, f: F.concat(
            acc,
            frame_header,
            F.unhex(
                F.repeat(
                    F.lpad(
                        F.hex(((F.col("doc_id") + 7 * f) % 256).cast("bigint")),
                        2,
                        "0",
                    ),
                    24,
                )
            ),
        ),
    )
    full = F.concat(F.encode(F.lit("VID0"), "UTF-8"), _le32(n_frames), frames)
    content = F.when(
        F.col("doc_id") % CORRUPT_EVERY == 0, F.substring(full, 1, 6)
    ).otherwise(full)
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("media_type"),
        content.alias("content"),
    )


def q_media_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode, driver-checked: JVM-packed framed containers,
    frame table indexed and ONLY every 3rd frame decoded (extensions/
    multimodal.py::video_frame_stats). The oracle regenerates the sampled
    frame set and the per-frame means analytically, so a wrong seek, a
    misread length prefix, or an off-by-one in sampling all surface as
    value mismatches."""
    from ..extensions.multimodal import video_frame_stats

    return video_frame_stats(framed_video_fixture(spark, sf_dir), every_nth=3)


def q_media_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload feature extraction (normalized 16-bin byte histogram) per
    media type, aggregated EXACTLY so the DuckDB twin can hash-match it:
    the per-payload bin-0 byte COUNT is recovered from the float32 weight
    (round(weight * n_bytes) — exact while count < 2^23, payloads here are
    hundreds of bytes), then only integer sums cross rows, and the final
    share is one IEEE division. The oracle reconstructs each payload's
    low-byte count analytically: the four big-endian header fields
    contribute closed-form byte values and the text contributes its
    sub-0x10 code points (1-byte in UTF-8; continuation/lead bytes are all
    >= 0x80, so code-point counting IS byte counting)."""
    from ..extensions.multimodal import byte_histogram_features

    # media_type and n_bytes ride through the extractor as carry columns:
    # ONE documents scan + ONE packing pass feed the features, the grouping
    # key, and the denominator (a join back to a re-derived fixture would
    # re-run the scan and the JVM byte-packing a second time)
    media = media_fixture(spark, sf_dir).withColumn(
        "n_bytes", F.octet_length("content").cast("bigint")
    )
    feats = byte_histogram_features(media, n_bins=16, carry=("media_type", "n_bytes"))
    return (
        feats.select(
            "media_type",
            "n_bytes",
            F.round(F.element_at(F.col("features"), 1).cast("double") * F.col("n_bytes"))
            .cast("bigint")
            .alias("bin0_count"),
        )
        .groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("bin0_count").alias("low_byte_count"),
            F.sum("n_bytes").alias("total_bytes"),
            (F.sum("bin0_count").cast("double") / F.sum("n_bytes")).alias(
                "low_byte_share"
            ),
        )
        .orderBy("media_type")
    )


QUERIES = {
    "media_probe_profile": q_media_probe_profile,
    "media_pixel_stats": q_media_pixel_stats,
    "media_audio_stats": q_media_audio_stats,
    "media_frame_stats": q_media_frame_stats,
    "media_byte_histogram": q_media_byte_histogram,
}

ORACLES = {
    "media_probe_profile": f"""
        SELECT doc_id AS media_id,
               CASE CAST(doc_id % 3 AS INTEGER)
                 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
               END AS media_type,
               CASE WHEN doc_id % {CORRUPT_EVERY} = 0 THEN NULL
                    ELSE CAST(doc_id % 640 + 16 AS INTEGER) END AS width,
               CASE WHEN doc_id % {CORRUPT_EVERY} = 0 THEN NULL
                    ELSE CAST(doc_id % 480 + 16 AS INTEGER) END AS height,
               CASE WHEN doc_id % {CORRUPT_EVERY} = 0 THEN NULL
                    ELSE CAST(doc_id % 100 AS INTEGER) END AS n_frames,
               CASE WHEN doc_id % {CORRUPT_EVERY} = 0 THEN NULL
                    ELSE CAST(8000 + (doc_id % 3) * 4000 AS INTEGER)
               END AS sample_rate,
               CASE WHEN doc_id % {CORRUPT_EVERY} = 0 THEN CAST(1 AS BIGINT)
                    ELSE CAST(16 + octet_length(encode(coalesce(text, ''))) AS BIGINT)
               END AS n_bytes,
               doc_id % {CORRUPT_EVERY} <> 0 AS valid
        FROM documents
    """,
    # Every field of the decoded stats is analytically determined by the
    # fixture: uniform plane value v = doc_id % 256 makes each channel mean
    # exactly v (integer sums are exact in float64 and the final division
    # is exact because v is representable), byte_sum = w*h*3*v.
    "media_pixel_stats": f"""
        SELECT doc_id AS media_id,
               doc_id % {CORRUPT_EVERY} <> 0 AS valid,
               CASE WHEN doc_id % {CORRUPT_EVERY} = 0 THEN NULL
                    ELSE CAST(doc_id % 16 + 1 AS INTEGER) END AS width,
               CASE WHEN doc_id % {CORRUPT_EVERY} = 0 THEN NULL
                    ELSE CAST(doc_id % 8 + 1 AS INTEGER) END AS height,
               CASE WHEN doc_id % {CORRUPT_EVERY} = 0 THEN NULL
                    ELSE CAST((doc_id % 16 + 1) * (doc_id % 8 + 1) AS INTEGER)
               END AS n_pixels,
               CASE WHEN doc_id % {CORRUPT_EVERY} = 0 THEN NULL
                    ELSE CAST(doc_id % 256 AS DOUBLE) END AS mean_r,
               CASE WHEN doc_id % {CORRUPT_EVERY} = 0 THEN NULL
                    ELSE CAST(doc_id % 256 AS DOUBLE) END AS mean_g,
               CASE WHEN doc_id % {CORRUPT_EVERY} = 0 THEN NULL
                    ELSE CAST(doc_id % 256 AS DOUBLE) END AS mean_b,
               CASE WHEN doc_id % {CORRUPT_EVERY} = 0 THEN NULL
                    ELSE CAST((doc_id % 16 + 1) * (doc_id % 8 + 1) * 3
                              * (doc_id % 256) AS BIGINT)
               END AS byte_sum
        FROM documents
    """,
    # WAV analytic twin: constant-sample PCM16 clips, so every decoded stat
    # is a closed-form function of doc_id. duration_ms is one IEEE division
    # on both sides (n_samples * 1000.0 / rate), mean is exactly the sample
    # value (identical int16 samples).
    "media_audio_stats": f"""
        WITH params AS (
          SELECT doc_id,
                 doc_id % {CORRUPT_EVERY} <> 0 AS ok,
                 CAST(doc_id % 100 + 1 AS INTEGER) AS n_samples,
                 CAST(CASE CAST(doc_id % 3 AS INTEGER)
                      WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100
                 END AS INTEGER) AS rate,
                 CAST(doc_id % 2048 - 1024 AS INTEGER) AS v
          FROM documents
        )
        SELECT doc_id AS media_id,
               ok AS valid,
               CASE WHEN ok THEN 1 END AS n_channels,
               CASE WHEN ok THEN rate END AS sample_rate,
               CASE WHEN ok THEN n_samples END AS n_samples,
               CASE WHEN ok THEN CAST(v AS DOUBLE) END AS mean_amplitude,
               CASE WHEN ok THEN abs(v) END AS peak_amplitude,
               CASE WHEN ok THEN n_samples * CAST(1000 AS DOUBLE) / rate
               END AS duration_ms
        FROM params
    """,
    # Byte-histogram analytic twin: each payload's sub-0x10 byte count is
    # reconstructed in closed form. Header: be32(width) and be32(height)
    # contribute 3 low bytes each (two zero bytes + a high byte that is
    # always < 16 because width <= 655, height <= 495) plus their low
    # byte's test; be32(n_frames <= 99) contributes 3 zeros + (fr < 16);
    # be32(rate in 8000/12000/16000) contributes exactly the 2 zero bytes
    # (both value bytes >= 0x1F). Text: code points < 0x10 are single-byte
    # in UTF-8 and no continuation/lead byte is < 0x80, so counting code
    # points IS counting bytes. Corrupt rows are the single byte 0x00.
    # Cross-row aggregation is integer-only; the share is one IEEE division.
    "media_byte_histogram": f"""
        WITH params AS (
          SELECT CASE CAST(doc_id % 3 AS INTEGER)
                   WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
                 END AS media_type,
                 doc_id % {CORRUPT_EVERY} = 0 AS corrupt,
                 CAST(doc_id % 640 + 16 AS BIGINT) AS w,
                 CAST(doc_id % 480 + 16 AS BIGINT) AS h,
                 CAST(doc_id % 100 AS BIGINT) AS fr,
                 octet_length(encode(coalesce(text, ''))) AS text_bytes,
                 length(coalesce(text, ''))
                   - length(regexp_replace(coalesce(text, ''),
                                           '[\\x01-\\x0f]', '', 'g')) AS text_low
          FROM documents
        ), per AS (
          SELECT media_type,
                 CASE WHEN corrupt THEN CAST(1 AS BIGINT)
                      ELSE 16 + text_bytes END AS n_bytes,
                 CASE WHEN corrupt THEN CAST(1 AS BIGINT)
                      ELSE 11
                           + CASE WHEN (w & 255) < 16 THEN 1 ELSE 0 END
                           + CASE WHEN (h & 255) < 16 THEN 1 ELSE 0 END
                           + CASE WHEN fr < 16 THEN 1 ELSE 0 END
                           + text_low
                 END AS low_bytes
          FROM params
        )
        SELECT media_type,
               count(*) AS n_media,
               CAST(sum(low_bytes) AS BIGINT) AS low_byte_count,
               CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
               CAST(sum(low_bytes) AS DOUBLE) / sum(n_bytes) AS low_byte_share
        FROM per
        GROUP BY media_type
        ORDER BY media_type
    """,
    # Video analytic twin: the engine decodes frames 0, 3, 6, ... of an
    # n = doc_id%10+1 frame container; each frame's uniform pixel value is
    # (doc_id + 7*frame) % 256. Corrupt rows collapse to (-1, NULL).
    "media_frame_stats": f"""
        SELECT doc_id AS media_id,
               CAST(f AS INTEGER) AS frame_idx,
               CAST((doc_id + 7 * f) % 256 AS DOUBLE) AS mean_px
        FROM documents
        CROSS JOIN LATERAL unnest(range(0, CAST(doc_id % 10 + 1 AS BIGINT), 3)) AS t(f)
        WHERE doc_id % {CORRUPT_EVERY} <> 0
        UNION ALL
        SELECT doc_id, -1, NULL FROM documents WHERE doc_id % {CORRUPT_EVERY} = 0
    """,
}
