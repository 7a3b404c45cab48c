"""Compression-ratio quality signal: zlib-compressed size over raw size
per document — the classic cheap detector for machine-generated
boilerplate, template spam, and within-doc repetition used by public
curation recipes (the DataComp-LM baseline filters and the
RedPajama-V2 quality-signal family both ship a compression/repetition
signal of this shape; Gopher's repetition rules approximate the same
phenomenon with n-gram ratios, which ``doc_repetition_scores`` covers
JVM-side).

Why it earns a Python island: there is no JVM-side Catalyst expression
for "compressed size of", so this is a justified Arrow-batched
``mapInPandas`` path — same policy class as the BPE encoder and the
multimodal decoders (SURVEY §2.9). Map-side only: no shuffle, no
grouping, each batch compresses independently, so at 100 TB the cost
is one streaming pass that parallelizes perfectly with the scan.
DETERMINISM: zlib output length for a given (bytes, level) is stable
for a given zlib build, and the parity test pins the ratios against
direct ``zlib.compress`` calls — but it is NOT contractually stable
across zlib versions, so this ships pytest-pinned with no DuckDB
oracle (the BPE/ANN contract class), and downstream DECISIONS should
threshold the ratio, not hash it.

Reading the signal: natural prose lands ~0.3-0.6 at level 6; heavily
repeated/templated text falls well below (repetition compresses);
random or already-compressed content approaches (or exceeds) 1.0.
Thresholds are corpus-specific — calibrate like the near-dup
calibration, don't copy numbers across corpora.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

#: pinned compression level: ratios are only comparable across docs (and
#: across the corpus's refresh increments) when every batch compresses
#: identically
ZLIB_LEVEL = 6


def doc_compression_ratios(
    df: DataFrame, text_col: str = "text", level: int = ZLIB_LEVEL
) -> DataFrame:
    """Append ``raw_bytes``, ``zlib_bytes``, ``compression_ratio``
    (= zlib_bytes / raw_bytes, UTF-8) to every row.

    NULL or empty text yields NULL for all three ratio fields (an empty
    byte string has no meaningful ratio; zlib's ~8-byte header would
    read as a huge one). All input columns pass through unchanged."""
    collisions = {"raw_bytes", "zlib_bytes", "compression_ratio"} & set(df.columns)
    if collisions:
        # appending a duplicate field name would fail deep in the Arrow
        # serializer with a positional column-count mismatch — refuse
        # upfront with the names instead
        raise ValueError(
            f"doc_compression_ratios: input already has column(s) "
            f"{sorted(collisions)} — rename them before appending the signal"
        )
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("raw_bytes", T.LongType()),
            T.StructField("zlib_bytes", T.LongType()),
            T.StructField("compression_ratio", T.DoubleType()),
        ]
    )

    def batches(it: Iterator) -> Iterator:
        import zlib

        for pdf in it:
            raw, comp, ratio = [], [], []
            for text in pdf[text_col]:
                if text is None or text == "":
                    raw.append(None), comp.append(None), ratio.append(None)
                    continue
                b = text.encode("utf-8")
                c = len(zlib.compress(b, level))
                raw.append(len(b)), comp.append(c), ratio.append(c / len(b))
            pdf = pdf.copy()
            pdf["raw_bytes"] = raw
            pdf["zlib_bytes"] = comp
            pdf["compression_ratio"] = ratio
            yield pdf

    return df.mapInPandas(batches, schema=out_schema)
