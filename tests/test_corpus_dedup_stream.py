"""Streaming corpus dedup: micro-batches dedup against the standing
corpus, replayed batches are no-ops, and the stream and the file-based
batch refresh interleave on ONE corpus state."""

from __future__ import annotations

import pandas as pd
import pytest
import pyarrow as pa
import pyarrow.parquet as pq

from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
    incremental_dedup_refresh,
    read_deduped,
)
from big_data_processing_with_aws_glue_workshop_spark.sources.bookmarks import JobBookmark
from big_data_processing_with_aws_glue_workshop_spark.streaming.corpus_dedup import (
    CorpusDedupSink,
    run_stream_corpus_dedup,
)

SCHEMA = "doc_id long, text string"


def _land(path, rows):
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(rows, columns=["doc_id", "text"]), preserve_index=False
        ),
        str(path),
    )


def test_stream_dedups_across_batches_and_skips_replays(spark, tmp_path):
    landing = tmp_path / "stream_in"
    landing.mkdir()
    target = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")

    _land(landing / "w0.parquet", [(1, "alpha"), (2, "beta"), (3, "alpha")])
    stream = spark.readStream.schema(SCHEMA).parquet(str(landing))
    run_stream_corpus_dedup(stream, target, checkpoint_dir=ckpt)
    assert {r["doc_id"] for r in read_deduped(spark, target).collect()} == {1, 2}

    # second drain: re-crawl dup of standing doc + a new doc
    _land(landing / "w1.parquet", [(9, "beta"), (10, "gamma")])
    stream = spark.readStream.schema(SCHEMA).parquet(str(landing))
    run_stream_corpus_dedup(stream, target, checkpoint_dir=ckpt)
    assert {r["doc_id"] for r in read_deduped(spark, target).collect()} == {1, 2, 10}

    # replayed batch id is a no-op (exactly-once after recovery)
    sink = CorpusDedupSink(target)
    batch = spark.createDataFrame([(99, "delta")], SCHEMA)
    import json

    last = json.loads((tmp_path / "corpus" / "current.json").read_text())[
        "last_stream_batch"
    ]
    sink(batch, last)  # same id as already applied -> skipped
    assert {r["doc_id"] for r in read_deduped(spark, target).collect()} == {1, 2, 10}

    # checkpoint-discipline guard
    import pytest

    fresh = spark.readStream.schema(SCHEMA).parquet(str(landing))
    with pytest.raises(ValueError, match="checkpoint"):
        run_stream_corpus_dedup(fresh, target, checkpoint_dir=None)


def test_stream_and_batch_refresh_share_one_corpus(spark, tmp_path):
    """A doc accepted by the STREAM dedups a later FILE-based backfill,
    and a doc accepted by the backfill dedups a later stream batch."""
    stream_in = tmp_path / "stream_in"
    stream_in.mkdir()
    files_in = tmp_path / "files_in"
    files_in.mkdir()
    target = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    bm = JobBookmark(str(tmp_path / "bm.json"), "backfill")

    # stream lands first
    _land(stream_in / "s0.parquet", [(1, "streamed text"), (2, "shared text")])
    run_stream_corpus_dedup(
        spark.readStream.schema(SCHEMA).parquet(str(stream_in)), target, ckpt
    )

    # file backfill: one dup of the streamed doc, one new
    _land(files_in / "f0.parquet", [(20, "shared text"), (21, "backfill text")])
    stats = incremental_dedup_refresh(
        spark, bm, str(files_in / "*.parquet"), target
    )
    assert stats["dropped_vs_corpus"] == 1 and stats["accepted"] == 1

    # stream again: dup of the BACKFILLED doc is dropped
    _land(stream_in / "s1.parquet", [(30, "backfill text"), (31, "fresh text")])
    run_stream_corpus_dedup(
        spark.readStream.schema(SCHEMA).parquet(str(stream_in)), target, ckpt
    )
    got = {r["doc_id"] for r in read_deduped(spark, target).collect()}
    assert got == {1, 2, 21, 31}


def test_stream_neardup_interleaves_with_batch_refresh(spark, tmp_path):
    """Near-dup twin: a streamed doc's LSH index drops a lightly-edited
    FILE backfill, and the backfill's index drops a later stream batch."""
    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        incremental_neardup_refresh,
    )
    from big_data_processing_with_aws_glue_workshop_spark.streaming.corpus_dedup import (
        run_stream_corpus_neardup,
    )

    stream_in = tmp_path / "stream_in"
    stream_in.mkdir()
    files_in = tmp_path / "files_in"
    files_in.mkdir()
    target = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    bm = JobBookmark(str(tmp_path / "bm.json"), "backfill")

    base = ("the quick brown fox jumps over the lazy dog while rain "
            "falls softly on quiet village roofs and children watch")
    other = ("entirely different prose describing columnar shuffles and "
             "broadcast joins inside a distributed query engine runtime")

    _land(stream_in / "s0.parquet", [(1, base), (2, other)])
    run_stream_corpus_neardup(
        spark.readStream.schema(SCHEMA).parquet(str(stream_in)),
        target, ckpt, sim_threshold=0.5,
    )
    assert {r["doc_id"] for r in read_deduped(spark, target).collect()} == {1, 2}

    # file backfill: light edit of the STREAMED doc + one new doc
    _land(
        files_in / "f0.parquet",
        [(20, base.replace("children watch", "children wave")),
         (21, "a wholly new document about medieval bread baking guild "
              "regulations and seasonal river mill disputes")],
    )
    stats = incremental_neardup_refresh(
        spark, bm, str(files_in / "*.parquet"), target, sim_threshold=0.5
    )
    assert stats["dropped_vs_corpus"] == 1 and stats["accepted"] == 1

    # stream again: light edit of the BACKFILLED doc is dropped
    _land(
        stream_in / "s1.parquet",
        [(30, "a wholly new document about medieval bread baking guild "
              "regulations and seasonal river mill feuds")],
    )
    run_stream_corpus_neardup(
        spark.readStream.schema(SCHEMA).parquet(str(stream_in)),
        target, ckpt, sim_threshold=0.5,
    )
    assert {r["doc_id"] for r in read_deduped(spark, target).collect()} == {1, 2, 21}


def test_randomized_interleaving_matches_reference_simulation(spark, tmp_path):
    """Six waves of docs from a small text pool, each wave randomly
    routed to the STREAM sink or the FILE-based refresh (seeded): the
    final corpus must equal a sequential reference simulation — per
    wave, keep min-id per new digest, drop digests already standing."""
    import random

    rng = random.Random(2024)
    pool = [f"text variant {i}" for i in range(12)]

    stream_in = tmp_path / "stream_in"
    stream_in.mkdir()
    files_in = tmp_path / "files_in"
    files_in.mkdir()
    target = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    bm = JobBookmark(str(tmp_path / "bm.json"), "mix")

    standing: dict = {}  # text -> owning doc_id (reference state)
    next_id = 0
    for w in range(6):
        rows = []
        for _ in range(rng.randrange(2, 6)):
            rows.append((next_id, rng.choice(pool)))
            next_id += 1
        # reference: min-id per digest within the wave, standing wins
        first = {}
        for i, t in sorted(rows):
            if t not in first:
                first[t] = i
        for t, i in first.items():
            if t not in standing:
                standing[t] = i

        if rng.random() < 0.5:
            _land(stream_in / f"s{w}.parquet", rows)
            run_stream_corpus_dedup(
                spark.readStream.schema(SCHEMA).parquet(str(stream_in)),
                target, ckpt,
            )
        else:
            _land(files_in / f"f{w}.parquet", rows)
            incremental_dedup_refresh(
                spark, bm, str(files_in / "*.parquet"), target
            )

    got = {
        (r["doc_id"], r["text"])
        for r in read_deduped(spark, target).collect()
    }
    assert got == {(i, t) for t, i in standing.items()}


def test_pointer_keys_survive_cross_path_interleaving(spark, tmp_path):
    """The batch path's delta_files healing list and the stream sink's
    last_stream_batch must COEXIST in the pointer — each flip carries
    forward the other path's keys instead of erasing them (r7 advisory)."""
    import json

    stream_in = tmp_path / "stream_in"
    stream_in.mkdir()
    files_in = tmp_path / "files_in"
    files_in.mkdir()
    target = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    bm = JobBookmark(str(tmp_path / "bm.json"), "backfill")

    _land(stream_in / "s0.parquet", [(1, "streamed text")])
    run_stream_corpus_dedup(
        spark.readStream.schema(SCHEMA).parquet(str(stream_in)), target, ckpt
    )
    _land(files_in / "f0.parquet", [(20, "backfill text")])
    incremental_dedup_refresh(spark, bm, str(files_in / "*.parquet"), target)

    with open(f"{target}/current.json") as f:
        pointer = json.load(f)
    # batch flip happened last and must have preserved the stream keys
    assert "last_stream_batch" in pointer and "stream_checkpoint" in pointer
    assert pointer["delta_files"] == [str(files_in / "f0.parquet")]

    # ...and a subsequent stream flip preserves the batch healing list
    _land(stream_in / "s1.parquet", [(30, "fresh text")])
    run_stream_corpus_dedup(
        spark.readStream.schema(SCHEMA).parquet(str(stream_in)), target, ckpt
    )
    with open(f"{target}/current.json") as f:
        pointer = json.load(f)
    assert pointer["delta_files"] == [str(files_in / "f0.parquet")]
    assert pointer["last_stream_batch"] == 1


def test_fresh_checkpoint_dir_is_rejected(spark, tmp_path):
    """A FRESH (different) checkpoint restarts stream batch ids at 0, and
    the batch_id <= last_stream_batch guard would silently skip all new
    data up to the standing watermark — exactly the failure the error
    message describes, now guarded (r7 advisory)."""
    import pytest

    landing = tmp_path / "stream_in"
    landing.mkdir()
    target = str(tmp_path / "corpus")

    _land(landing / "w0.parquet", [(1, "alpha")])
    stream = spark.readStream.schema(SCHEMA).parquet(str(landing))
    run_stream_corpus_dedup(stream, target, checkpoint_dir=str(tmp_path / "ckptA"))

    _land(landing / "w1.parquet", [(2, "beta")])
    stream = spark.readStream.schema(SCHEMA).parquet(str(landing))
    with pytest.raises(ValueError, match="different checkpoint"):
        run_stream_corpus_dedup(
            stream, target, checkpoint_dir=str(tmp_path / "ckptB")
        )
    # the original checkpoint still drains fine
    run_stream_corpus_dedup(stream, target, checkpoint_dir=str(tmp_path / "ckptA"))
    got = {r["doc_id"] for r in read_deduped(spark, target).collect()}
    assert got == {1, 2}


def test_runner_forwards_drift_gate_and_returns_sink(spark, tmp_path):
    """The drift gate must be reachable from the SUPPORTED entry point,
    not only by hand-building the sink (r9 review: drift/drift_key
    existed solely on the sink classes while the run_stream_* drivers
    neither accepted nor forwarded them). The runner returns the sink so
    callers can read last_drift."""
    landing = tmp_path / "stream_in"
    landing.mkdir()
    target = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")

    _land(landing / "w0.parquet", [(i, "x" * 20) for i in range(40)])
    stream = spark.readStream.schema(SCHEMA).parquet(str(landing))
    sink = run_stream_corpus_dedup(stream, target, checkpoint_dir=ckpt, drift=True)
    assert sink.last_drift is not None and sink.last_drift["first_refresh"]

    _land(landing / "w1.parquet", [(100 + i, "y" * 2000 + str(i)) for i in range(40)])
    stream = spark.readStream.schema(SCHEMA).parquet(str(landing))
    sink = run_stream_corpus_dedup(stream, target, checkpoint_dir=ckpt, drift=True)
    assert sink.last_drift is not None and sink.last_drift["psi"]["all"] > 0.2


def test_stream_sink_drift_gate(spark, tmp_path):
    """The streaming twin of the refresh CLIs' --drift gate: the first
    drained batch seeds the standing doc-length histogram, a
    distribution-shifted second batch reports PSI drift, and a replayed
    batch never double-counts (batch-id-keyed like the CLI path)."""
    import os

    target = str(tmp_path / "corpus")
    sink = CorpusDedupSink(target, drift=True)
    w0 = spark.createDataFrame(
        [(i, "x" * 20) for i in range(40)], SCHEMA
    )
    sink(w0, 0)
    assert sink.last_drift is not None and sink.last_drift["first_refresh"]
    assert os.path.exists(os.path.join(target, "drift_hist.json"))

    # shifted lengths: 20 chars -> 2000 chars
    w1 = spark.createDataFrame(
        [(100 + i, "y" * 2000 + str(i)) for i in range(40)], SCHEMA
    )
    sink(w1, 1)
    rep = sink.last_drift
    assert rep is not None and not rep["first_refresh"]
    assert rep["psi"]["all"] > 0.2, rep  # classic "significant shift" line

    # replayed batch id: sink skips entirely; drift state untouched
    before = open(os.path.join(target, "drift_hist.json")).read()
    sink(w1, 1)
    assert open(os.path.join(target, "drift_hist.json")).read() == before


VEC_SCHEMA = "vec_id long, embedding array<float>"


def _land_vecs(path, rows):
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(
                {"vec_id": [r[0] for r in rows], "embedding": [r[1] for r in rows]}
            ),
            preserve_index=False,
        ).cast(
            pa.schema([("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32()))])
        ),
        str(path),
    )


@pytest.mark.slow
def test_stream_semantic_interleaves_with_batch_refresh(spark, tmp_path):
    """Semantic twin: a streamed vector's pinned-centroid state drops a
    near-copy FILE backfill, and the backfill's state drops a later
    stream batch — one calibration, two ingestion tempos, plus replay
    idempotence on a restarted stream."""
    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        incremental_semantic_refresh,
    )
    from big_data_processing_with_aws_glue_workshop_spark.streaming.corpus_dedup import (
        run_stream_corpus_semantic,
    )

    stream_in = tmp_path / "stream_in"
    stream_in.mkdir()
    files_in = tmp_path / "files_in"
    files_in.mkdir()
    target = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    bm = JobBookmark(str(tmp_path / "bm.json"), "backfill")

    base = [1.0, 0.2, -0.5, 0.8]
    ortho = [-0.2, 1.0, 0.8, 0.1]
    _land_vecs(stream_in / "s0.parquet", [(1, base), (2, ortho)])
    run_stream_corpus_semantic(
        spark.readStream.schema(VEC_SCHEMA).parquet(str(stream_in)),
        target, ckpt, threshold=0.95, nlist=2,
    )
    assert {r["vec_id"] for r in read_deduped(spark, target).collect()} == {1, 2}

    # file backfill: near-copy of the STREAMED base + one new direction
    fresh = [0.1, -0.9, 0.3, 0.6]
    _land_vecs(
        files_in / "f0.parquet",
        [(20, [1.01, 0.21, -0.49, 0.82]), (21, fresh)],
    )
    stats = incremental_semantic_refresh(
        spark, bm, str(files_in / "*.parquet"), target, threshold=0.95, nlist=2
    )
    assert stats["dropped_vs_corpus"] == 1 and stats["accepted"] == 1

    # stream again: near-copy of the BACKFILLED fresh vector is dropped
    _land_vecs(stream_in / "s1.parquet", [(30, [0.101, -0.91, 0.31, 0.59])])
    sink = run_stream_corpus_semantic(
        spark.readStream.schema(VEC_SCHEMA).parquet(str(stream_in)),
        target, ckpt, threshold=0.95, nlist=2,
    )
    assert {r["vec_id"] for r in read_deduped(spark, target).collect()} == {1, 2, 21}
    # the sink surfaces the allowlist pruning health of the applied
    # batch (the re-cell trigger signal): a real share in [0, 1]
    assert sink.last_allow_share is not None
    assert 0.0 <= sink.last_allow_share <= 1.0

    # replay idempotence: a fresh run over the same checkpoint is a no-op
    run_stream_corpus_semantic(
        spark.readStream.schema(VEC_SCHEMA).parquet(str(stream_in)),
        target, ckpt, threshold=0.95, nlist=2,
    )
    assert {r["vec_id"] for r in read_deduped(spark, target).collect()} == {1, 2, 21}

    # calibration is shared across tempos: a mismatched stream refuses
    # (the ValueError surfaces wrapped in the StreamingQueryException)
    import pytest

    _land_vecs(stream_in / "s2.parquet", [(40, [0.5, 0.5, 0.5, 0.5])])
    with pytest.raises(Exception, match="calibration mismatch"):
        run_stream_corpus_semantic(
            spark.readStream.schema(VEC_SCHEMA).parquet(str(stream_in)),
            target, ckpt, threshold=0.9, nlist=2,
        )


def test_stream_passages_interleave_with_batch_refresh(spark, tmp_path):
    """Passage twin: a boilerplate passage STREAMED first is excised from
    a later FILE backfill's document, and the backfill's new passage is
    excised from a later stream batch — one cut-width calibration, two
    ingestion tempos, plus replay idempotence and mismatch refusal."""
    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        incremental_passage_dedup_refresh,
    )
    from big_data_processing_with_aws_glue_workshop_spark.streaming.corpus_dedup import (
        run_stream_corpus_passages,
    )

    stream_in = tmp_path / "stream_in"
    stream_in.mkdir()
    files_in = tmp_path / "files_in"
    files_in.mkdir()
    target = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    bm = JobBookmark(str(tmp_path / "bm.json"), "backfill")

    boiler = "a b c d e f g h"
    body = "i j k l m n o p"
    _land(stream_in / "s0.parquet", [(1, f"{boiler} {body}")])
    run_stream_corpus_passages(
        spark.readStream.schema(SCHEMA).parquet(str(stream_in)), target, ckpt
    )
    got = {r["doc_id"]: r["text"] for r in read_deduped(spark, target).collect()}
    assert got == {1: f"{boiler} {body}"}

    # file backfill: re-uses the streamed boilerplate + brings a new passage
    fresh = "q r s t u v w x"
    _land(files_in / "f0.parquet", [(20, f"{boiler} {fresh} tail")])
    stats = incremental_passage_dedup_refresh(
        spark, bm, str(files_in / "*.parquet"), target
    )
    assert stats["dropped_vs_corpus"] == 1 and stats["kept_passages"] == 1
    got = {r["doc_id"]: r["text"] for r in read_deduped(spark, target).collect()}
    assert got[20] == f"{fresh} tail"

    # stream again: the BACKFILLED passage is now boilerplate too
    _land(stream_in / "s1.parquet", [(30, f"{fresh} y y y y y y y y")])
    run_stream_corpus_passages(
        spark.readStream.schema(SCHEMA).parquet(str(stream_in)), target, ckpt
    )
    got = {r["doc_id"]: r["text"] for r in read_deduped(spark, target).collect()}
    assert got[30] == "y y y y y y y y"

    # replay idempotence: fresh run over the same checkpoint is a no-op
    run_stream_corpus_passages(
        spark.readStream.schema(SCHEMA).parquet(str(stream_in)), target, ckpt
    )
    assert len(read_deduped(spark, target).collect()) == 3

    # cut-width calibration shared across tempos: mismatch refuses
    import pytest

    _land(stream_in / "s2.parquet", [(40, "z z z z z z z z")])
    with pytest.raises(Exception, match="calibration mismatch"):
        run_stream_corpus_passages(
            spark.readStream.schema(SCHEMA).parquet(str(stream_in)),
            target, ckpt, words=4,
        )


def test_passage_sink_drift_gate(spark, tmp_path):
    """Drift parity for the passage sink (r11 verdict stretch item): the
    first drained batch seeds the standing REWRITTEN-doc-length
    histogram (read from the passage layout's docs/ delta), a
    distribution-shifted second batch reports PSI drift, and a replayed
    batch never double-counts — the same seed -> shift -> replay
    contract the doc-level sinks pin."""
    import os

    from big_data_processing_with_aws_glue_workshop_spark.streaming.corpus_dedup import (
        CorpusPassageDedupSink,
    )

    target = str(tmp_path / "corpus")
    sink = CorpusPassageDedupSink(target, drift=True)
    w0 = spark.createDataFrame(
        [(i, "w x y z " * 5 + str(i)) for i in range(40)], SCHEMA
    )
    sink(w0, 0)
    assert sink.last_drift is not None and sink.last_drift["first_refresh"]
    assert os.path.exists(os.path.join(target, "drift_hist.json"))

    # shifted lengths: ~20 chars -> ~2000 chars of unique words (no
    # passage excision noise — every doc keeps its full rewrite)
    w1 = spark.createDataFrame(
        [(100 + i, " ".join(f"t{i}w{j}xxxxxx" for j in range(200))) for i in range(40)],
        SCHEMA,
    )
    sink(w1, 1)
    rep = sink.last_drift
    assert rep is not None and not rep["first_refresh"]
    assert rep["psi"]["all"] > 0.2, rep  # classic "significant shift" line

    # replayed batch id: sink skips entirely; drift state untouched
    before = open(os.path.join(target, "drift_hist.json")).read()
    sink(w1, 1)
    assert open(os.path.join(target, "drift_hist.json")).read() == before


def test_passage_runner_forwards_drift_gate(spark, tmp_path):
    """drift/drift_key must be reachable from run_stream_corpus_passages,
    not only by hand-building the sink (the r9 finding's pattern, applied
    to the new sink)."""
    from big_data_processing_with_aws_glue_workshop_spark.streaming.corpus_dedup import (
        run_stream_corpus_passages,
    )

    landing = tmp_path / "stream_in"
    landing.mkdir()
    target = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    _land(landing / "w0.parquet", [(i, "a b c d " * 5 + str(i)) for i in range(20)])
    stream = spark.readStream.schema(SCHEMA).parquet(str(landing))
    sink = run_stream_corpus_passages(stream, target, ckpt, drift=True)
    assert sink.last_drift is not None and sink.last_drift["first_refresh"]


def test_semantic_recell_preserves_stream_bookkeeping(spark, tmp_path):
    """A maintenance re-cell on a STREAM-built semantic corpus must carry
    the stream's idempotence bookkeeping (last_stream_batch) through the
    pointer flip — a replayed batch after the re-cell stays a no-op —
    and restarted streams must name the NEW nlist (the old calibration
    refuses) while deduping against the re-celled state correctly."""
    import pytest

    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        read_deduped,
        semantic_recell,
    )
    from big_data_processing_with_aws_glue_workshop_spark.streaming.corpus_dedup import (
        run_stream_corpus_semantic,
    )

    stream_in = tmp_path / "stream_in"
    stream_in.mkdir()
    target = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")

    base = [1.0, 0.2, -0.5, 0.8]
    ortho = [-0.2, 1.0, 0.8, 0.1]
    _land_vecs(stream_in / "s0.parquet", [(1, base), (2, ortho)])
    run_stream_corpus_semantic(
        spark.readStream.schema(VEC_SCHEMA).parquet(str(stream_in)),
        target, ckpt, threshold=0.95, nlist=2,
    )

    rc = semantic_recell(spark, target, nlist=3)
    assert rc["rows"] == 2 and rc["new_nlist"] == 3

    # replay over the same checkpoint after the re-cell: still a no-op
    # (last_stream_batch survived the flip via the carry-forward) — this
    # would otherwise re-apply batch 0 and double the corpus
    run_stream_corpus_semantic(
        spark.readStream.schema(VEC_SCHEMA).parquet(str(stream_in)),
        target, ckpt, threshold=0.95, nlist=3,
    )
    assert {r["vec_id"] for r in read_deduped(spark, target).collect()} == {1, 2}

    # the old calibration refuses on genuinely new data ...
    _land_vecs(stream_in / "s1.parquet", [(9, [1.01, 0.21, -0.49, 0.82])])
    with pytest.raises(Exception, match="calibration mismatch"):
        run_stream_corpus_semantic(
            spark.readStream.schema(VEC_SCHEMA).parquet(str(stream_in)),
            target, ckpt, threshold=0.95, nlist=2,
        )
    # ... and under the new one the near-copy of streamed vec 1 drops
    run_stream_corpus_semantic(
        spark.readStream.schema(VEC_SCHEMA).parquet(str(stream_in)),
        target, ckpt, threshold=0.95, nlist=3,
    )
    assert {r["vec_id"] for r in read_deduped(spark, target).collect()} == {1, 2}


@pytest.mark.slow
def test_stream_semantic_recell_on_trigger(spark, tmp_path):
    """The sink's ``recell_on_trigger`` closes the re-cell loop in-band
    (r12 verdict order #4): a streamed batch whose allow_share crosses
    RECELL_ALLOW_SHARE_TRIGGER is followed by an atomic semantic_recell
    inside the same foreachBatch call; carry-forward keeps
    ``last_stream_batch`` so replay idempotence is unaffected; and a
    RESTARTED sink with a stale constructor nlist adopts the stored
    calibration instead of tripping the mismatch guard."""
    import math

    from big_data_processing_with_aws_glue_workshop_spark.plans.incremental import (
        RECELL_ALLOW_SHARE_TRIGGER,
    )
    from big_data_processing_with_aws_glue_workshop_spark.streaming.corpus_dedup import (
        run_stream_corpus_semantic,
    )

    dim, thr = 12, 0.999

    def blob(a, vid, theta):
        # unit vector cos(theta)*e_a + sin(theta)*e_(9 + a%3): exact
        # within-blob angles, nothing dedups at thr 0.999 (0.0447 rad)
        v = [0.0] * dim
        v[a] = math.cos(theta)
        v[9 + a % 3] = math.sin(theta)
        return (vid, v)

    wave1 = [blob(a, 100 * a + j, 0.05 * j) for a in range(3) for j in range(9)]
    wave2 = [blob(a, 100 * a + j, 0.05 * j) for a in range(3, 9) for j in range(9)]
    wave3 = [
        blob(a, 100 * a + 50 + j, 0.05 * (9 + j)) for a in range(9) for j in range(2)
    ]

    stream_in = tmp_path / "stream_in"
    stream_in.mkdir()
    target = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")

    def drain(nlist):
        return run_stream_corpus_semantic(
            spark.readStream.schema(VEC_SCHEMA).parquet(str(stream_in)),
            target, ckpt, threshold=thr, nlist=nlist, recell_on_trigger=True,
        )

    # batch 1: clustered fit — no trigger
    _land_vecs(stream_in / "s0.parquet", wave1)
    sink = drain(3)
    assert sink.recell_count == 0 and sink.nlist == 3
    assert sink.last_allow_share < RECELL_ALLOW_SHARE_TRIGGER

    # batch 2: decayed wave — the sink recells IN-BAND, exactly once,
    # and its post-recell share (the next wave's regime) is back below
    _land_vecs(stream_in / "s1.parquet", wave2)
    sink = drain(3)
    assert sink.recell_count == 1
    assert sink.nlist == 9  # ~sqrt(81) — the adopted new calibration
    assert sink.last_allow_share < RECELL_ALLOW_SHARE_TRIGGER
    assert {r["vec_id"] for r in read_deduped(spark, target).collect()} == {
        100 * a + j for a in range(9) for j in range(9)
    }

    # replay idempotence across the recell: carry-forward preserved
    # last_stream_batch through the recell flip, so a fresh run over the
    # same checkpoint applies nothing and never recells
    before = {r["vec_id"] for r in read_deduped(spark, target).collect()}
    sink = drain(3)
    assert sink.recell_count == 0
    assert {r["vec_id"] for r in read_deduped(spark, target).collect()} == before

    # restart with a STALE constructor nlist (3): the sink adopts the
    # stored calibration's nlist (9) instead of tripping the mismatch
    # guard, drains the post-recell wave, and does not recell again
    _land_vecs(stream_in / "s2.parquet", wave3)
    sink = drain(3)
    assert sink.nlist == 9 and sink.recell_count == 0
    assert sink.last_allow_share < RECELL_ALLOW_SHARE_TRIGGER
    assert len({r["vec_id"] for r in read_deduped(spark, target).collect()}) == 99
