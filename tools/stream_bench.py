#!/usr/bin/env python
"""Streaming-family micro-bench (r18, VERDICT "Next round #7"): one
measured number per never-benched streaming family so the next
optimization pass starts from costs instead of "wave-bounded by
construction". Deliberately NOT part of bench.py's headline — the
headline record must stay comparable across rounds; results are recorded
in docs/SCALE.md.

Methodology: deterministic synthetic waves land as parquet files in a
temp dir; each wave is drained with availableNow through the family's
own entry point (the same foreachBatch sinks / streaming aggregations
the tests gate), and the per-wave wall seconds are printed as JSON.
Standing-state families (corpus dedup, sketches, upsert sink) report a
per-wave series — the curve's FLATNESS is the scale claim (per-wave
cost must track wave size, not standing-corpus size). The window/
stateful aggregations run one availableNow drain over all waves
(their state is watermark/group-bounded, not target-dir-bounded) and
report total seconds + rows.

Usage: python tools/stream_bench.py [--waves N] [--rows-per-wave N]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _land_docs(path: str, wave: int, rows: int) -> None:
    # ~25% exact duplicates of earlier waves; deterministic content
    base = wave * rows
    ids = list(range(base, base + rows))
    texts = [
        f"synthetic document body {('w%d' % max(0, wave - 1)) if i % 4 == 0 else 'w%d' % wave} "
        f"row {i % (rows // 4 * 3 or 1)} with shared tail tokens for dedup"
        for i in range(base, base + rows)
    ]
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame({"doc_id": ids, "text": texts}), preserve_index=False
        ),
        os.path.join(path, f"wave{wave}.parquet"),
    )


def _land_events(path: str, wave: int, rows: int) -> None:
    base = wave * rows
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "user_id": [i % 500 for i in range(base, base + rows)],
                    "value": [float(i % 97) for i in range(base, base + rows)],
                    "ts_ms": [1_700_000_000_000 + i * 250 for i in range(base, base + rows)],
                }
            ),
            preserve_index=False,
        ),
        os.path.join(path, f"wave{wave}.parquet"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--waves", type=int, default=4)
    ap.add_argument("--rows-per-wave", type=int, default=20_000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from big_data_processing_with_aws_glue_workshop_spark.session import get_session
    from big_data_processing_with_aws_glue_workshop_spark.streaming.corpus_dedup import (
        run_stream_corpus_dedup,
    )
    from big_data_processing_with_aws_glue_workshop_spark.streaming.sketch import (
        run_stream_cms_sketch,
    )
    from big_data_processing_with_aws_glue_workshop_spark.streaming.sinks import (
        run_foreach_batch_upsert,
    )
    from big_data_processing_with_aws_glue_workshop_spark.streaming.stateful import (
        running_user_stats,
    )
    from big_data_processing_with_aws_glue_workshop_spark.streaming.windows import (
        run_streaming_query,
        streaming_tumbling_agg,
    )

    spark = get_session("stream_bench")
    root = tempfile.mkdtemp(prefix="stream_bench_")
    out: dict = {"waves": args.waves, "rows_per_wave": args.rows_per_wave}
    try:
        doc_schema = "doc_id long, text string"

        def wave_series(family: str, landing: str, land, drain) -> None:
            os.makedirs(landing, exist_ok=True)
            secs = []
            for w in range(args.waves):
                land(landing, w, args.rows_per_wave)
                t0 = time.time()
                drain(w)
                secs.append(round(time.time() - t0, 2))
                print(
                    json.dumps({"family": family, "wave": w, "sec": secs[-1]}),
                    flush=True,
                )
            out[family] = secs

        # 1. corpus_dedup: exact-dedup foreachBatch sink, standing corpus
        ded_land = os.path.join(root, "dedup_in")
        ded_tgt = os.path.join(root, "dedup_tgt")
        ded_ck = os.path.join(root, "dedup_ck")
        wave_series(
            "corpus_dedup",
            ded_land,
            _land_docs,
            lambda w: run_stream_corpus_dedup(
                spark.readStream.schema(doc_schema).parquet(ded_land),
                ded_tgt,
                checkpoint_dir=ded_ck,
            ),
        )

        # 2. sketch: CMS over doc ids, monoid merge per wave
        cms_land = os.path.join(root, "cms_in")
        cms_tgt = os.path.join(root, "cms_tgt")
        cms_ck = os.path.join(root, "cms_ck")
        wave_series(
            "sketch_cms",
            cms_land,
            _land_docs,
            lambda w: run_stream_cms_sketch(
                spark.readStream.schema(doc_schema).parquet(cms_land),
                cms_tgt,
                "text",
                checkpoint_dir=cms_ck,
            ),
        )

        # 3. sinks: keyed upsert with versioned snapshots
        up_land = os.path.join(root, "up_in")
        up_tgt = os.path.join(root, "up_tgt")
        up_ck = os.path.join(root, "up_ck")
        wave_series(
            "sink_upsert",
            up_land,
            _land_docs,
            lambda w: run_foreach_batch_upsert(
                spark.readStream.schema(doc_schema).parquet(up_land),
                up_tgt,
                ["doc_id"],
                checkpoint_dir=up_ck,
            ),
        )

        # 4/5. stateful + windows: one availableNow drain over all waves
        ev_land = os.path.join(root, "ev_in")
        os.makedirs(ev_land, exist_ok=True)
        for w in range(args.waves):
            _land_events(ev_land, w, args.rows_per_wave)
        ev_schema = "user_id long, value double, ts_ms long"

        ev = spark.readStream.schema(ev_schema).parquet(ev_land)
        t0 = time.time()
        res = run_streaming_query(
            running_user_stats(ev), "sb_stateful", output_mode="update"
        )
        n = res.count()
        out["stateful_total_sec"] = round(time.time() - t0, 2)
        out["stateful_rows"] = n
        print(json.dumps({"family": "stateful", "sec": out["stateful_total_sec"], "rows": n}), flush=True)

        ev2 = spark.readStream.schema(ev_schema).parquet(ev_land).select(
            F.col("user_id"),
            F.timestamp_millis(F.col("ts_ms")).alias("ts"),
            F.lit("click").alias("event_type"),
            F.col("value"),
        )
        t0 = time.time()
        res = run_streaming_query(streaming_tumbling_agg(ev2), "sb_windows")
        n = res.count()
        out["windows_total_sec"] = round(time.time() - t0, 2)
        out["windows_rows"] = n
        print(json.dumps({"family": "windows", "sec": out["windows_total_sec"], "rows": n}), flush=True)

        print(json.dumps({"stream_bench": out}), flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
