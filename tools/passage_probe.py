"""Scaling probe for the incremental PASSAGE dedup refresh: per-wave
cost as the standing digest set grows, plus the excision rate on a
boilerplate-heavy fixture.

The claims in plans/incremental.py::incremental_passage_dedup_refresh:

1. per-refresh cost is O(increment) plus a read of the standing DIGEST
   set (16-byte rows — standing text is never re-read), so wave wall
   grows with the digest count, not the corpus text volume;
2. passage text never shuffles — digests and integer block indices move,
   words re-slice from the document row at the reassembly join.

Fixture: each wave lands WAVE documents of ~64 words; a document is a
mix of passages drawn from a small boilerplate pool (reused across
waves — the excision target) and fresh random passages. Printed per
wave: refresh wall, passages seen/kept, excision share, standing digest
rows.

Usage: python tools/passage_probe.py [n_waves] [wave_size]
       python tools/passage_probe.py --batch [size ...]
           one-shot batch rewrite (queries/textops.py::dedup_passages —
           the driver row passage_dedup_rewrite) over corpora of the
           given doc counts; prints wall + docs/s + excision share per
           size, so the rewrite's own scale curve is measured, not just
           its incremental twin's.
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
    incremental_passage_dedup_refresh,
)
from big_data_processing_with_aws_glue_workshop_spark.session import get_session
from big_data_processing_with_aws_glue_workshop_spark.sources.bookmarks import JobBookmark


def make_wave(rng: random.Random, size: int, boiler: list[str]) -> list[tuple[int, str]]:
    vocab = [f"tok{i}" for i in range(5000)]
    rows = []
    for _ in range(size):
        make_wave.vid += 1
        parts = []
        for _ in range(8):  # 8 passages ~ 64 words/doc
            if rng.random() < 0.3:  # 30% boilerplate instances
                parts.append(rng.choice(boiler))
            else:
                parts.append(" ".join(rng.choice(vocab) for _ in range(8)))
        rows.append((make_wave.vid, " ".join(parts)))
    return rows


make_wave.vid = 0


def batch_mode(sizes: list[int], decontam: bool = False) -> None:
    import pyspark.sql.functions as F

    from big_data_processing_with_aws_glue_workshop_spark.queries.textops import (
        decontaminate_passages,
        dedup_passages,
    )

    spark = get_session(app_name="passage-probe-batch")
    rng = random.Random(11)
    boiler = [" ".join(f"b{i}_{j}" for j in range(8)) for i in range(500)]
    # --decontam: the boilerplate pool IS the benchmark — planted leaks
    # are excised, fresh passages survive
    bench = spark.createDataFrame([(t,) for t in boiler], "text string") if decontam else None
    for n in sizes:
        rows = [
            (i, f"s{i % 7}", t) for i, t in make_wave(rng, n, boiler)
        ]
        docs = (
            spark.createDataFrame(rows, "doc_id long, source string, text string")
            .repartition(32)
            .cache()
        )
        docs.count()
        # warm + best-of-two, forced through a full-computation aggregate
        # (summing both count columns consumes every rewritten row
        # without collecting text)
        def run():
            out = (
                decontaminate_passages(docs, bench)
                if decontam
                else dedup_passages(docs)
            )
            return out.agg(
                F.sum("n_passages").alias("p"),
                F.sum("n_passages_dropped").alias("d"),
            ).first()
        run()
        best, res = float("inf"), None
        for _ in range(2):
            t0 = time.time()
            res = run()
            best = min(best, time.time() - t0)
        print(
            json.dumps(
                {
                    "docs": n,
                    "passages": int(res["p"]),
                    "excised_share": round(int(res["d"]) / int(res["p"]), 3),
                    "wall_s": round(best, 2),
                    "docs_per_s": int(n / best),
                }
            )
        )
        docs.unpersist()


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--batch" in sys.argv or "--decontam" in sys.argv:
        batch_mode(
            [int(a) for a in args] or [20_000, 80_000, 200_000],
            decontam="--decontam" in sys.argv,
        )
        return
    n_waves = int(args[0]) if args else 3
    wave = int(args[1]) if len(args) > 1 else 20_000

    rng = random.Random(11)
    boiler = [
        " ".join(f"b{i}_{j}" for j in range(8)) for i in range(500)
    ]  # 500 reusable boilerplate passages

    spark = get_session(app_name="passage-probe")
    base = "/tmp/passage_probe"
    shutil.rmtree(base, ignore_errors=True)
    landing = os.path.join(base, "landing")
    target = os.path.join(base, "corpus")
    os.makedirs(landing)
    bm = JobBookmark(os.path.join(base, "bm.json"), "probe")

    standing_digests = 0
    for w in range(n_waves):
        rows = make_wave(rng, wave, boiler)
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            4
        ).write.parquet(os.path.join(landing, f"w{w}"))
        t0 = time.time()
        stats = incremental_passage_dedup_refresh(
            spark, bm, os.path.join(landing, "*"), target
        )
        wall = time.time() - t0
        print(
            json.dumps(
                {
                    "wave": w,
                    "standing_digests_before": standing_digests,
                    "docs": stats["new_docs"],
                    "passages": stats["passages"],
                    "kept": stats["kept_passages"],
                    "excised_share": round(
                        1 - stats["kept_passages"] / stats["passages"], 3
                    ),
                    "wall_s": round(wall, 2),
                }
            )
        )
        standing_digests += stats["kept_passages"]
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
