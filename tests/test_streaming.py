"""Streaming surface tests: batch/stream parity + stateful operator.

Strategy: split the driver-generated events table into time-ordered parquet
chunks in a tmp dir, stream them with maxFilesPerTrigger=1 so the run has
multiple micro-batches and the watermark genuinely advances, then compare
against the equivalent batch computation on the full table.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pylluminator_spark.datasets import load_table
from pylluminator_spark.streaming import (
    read_event_stream,
    run_available_now,
    session_window_agg,
    stateful_sessionize,
    streaming_dedup,
    tumbling_window_counts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def event_chunks(spark, tmp_path_factory):
    """Events split into 4 time-ordered parquet files."""
    out = str(tmp_path_factory.mktemp("event_stream"))
    ev = load_table(spark, SF_DIR, "events").orderBy("ts")
    n = ev.count()
    rows = ev.withColumn("_chunk", F.ntile(4).over(Window.orderBy("ts")))
    for c in range(1, 5):
        (
            rows.filter(F.col("_chunk") == c)
            .drop("_chunk")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{out}/chunk={c}")
        )
    return out, n


def _stream(spark, event_chunks):
    path, _ = event_chunks
    return read_event_stream(
        spark, f"{path}/chunk=*", max_files_per_trigger=1, ts_as_nanos=False
    )


def test_tumbling_window_parity(spark, event_chunks):
    # complete mode ignores the watermark -> exact parity with batch
    res = run_available_now(
        tumbling_window_counts(_stream(spark, event_chunks), window_duration="6 hours"),
        output_mode="complete",
    )
    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy(F.window("ts", "6 hours").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    got = {
        (r.window_start, r.event_type): (r.n_events, round(r.sum_value, 6))
        for r in res.collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n_events, round(r.sum_value, 6))
        for r in batch.collect()
    }
    assert got == want


def test_append_mode_emits_closed_windows(spark, event_chunks):
    """With watermarking + append mode, all windows closed by the final
    watermark are emitted exactly once."""
    res = run_available_now(
        tumbling_window_counts(
            _stream(spark, event_chunks),
            window_duration="6 hours",
            watermark="1 minute",
        ),
        output_mode="append",
    )
    rows = res.collect()
    assert len(rows) > 0
    # emitted (window, type) pairs are unique — exactly-once emission
    keys = [(r.window_start, r.event_type) for r in rows]
    assert len(keys) == len(set(keys))
    # every emitted window agrees with the batch computation
    batch = {
        (r[0], r[1]): r[2]
        for r in load_table(spark, SF_DIR, "events")
        .groupBy(F.window("ts", "6 hours").start.alias("ws"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        assert batch[(r.window_start, r.event_type)] == r.n_events


def test_sliding_window_parity(spark, event_chunks):
    """Sliding windows: every event lands in duration/slide panes; complete
    mode drains to exact batch parity."""
    from pylluminator_spark.streaming import sliding_window_counts

    res = run_available_now(
        sliding_window_counts(
            _stream(spark, event_chunks),
            window_duration="2 hours",
            slide="30 minutes",
        ),
        output_mode="complete",
    )
    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy(
            F.window("ts", "2 hours", "30 minutes").alias("win"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )
    got = {
        (r.window_start, r.event_type): r.n_events for r in res.collect()
    }
    want = {
        (r.window_start, r.event_type): r.n_events for r in batch.collect()
    }
    assert got == want
    # pane multiplicity: total pane memberships = 4x the event count
    n_events = load_table(spark, SF_DIR, "events").count()
    assert sum(got.values()) == 4 * n_events


def test_session_window_parity(spark, event_chunks):
    res = run_available_now(
        session_window_agg(_stream(spark, event_chunks), gap="5 minutes"),
        output_mode="complete",
    )
    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy(F.session_window("ts", "5 minutes").alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    assert res.count() == batch.count()
    assert res.agg(F.sum("n_events")).collect()[0][0] == load_table(
        spark, SF_DIR, "events"
    ).count()


def test_streaming_dedup(spark, event_chunks):
    res = run_available_now(
        streaming_dedup(
            _stream(spark, event_chunks),
            keys=["user_id", "event_type"],
            watermark="30 days",  # all data within watermark -> global dedup
        )
    )
    batch_n = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    assert res.count() == batch_n


def test_streaming_dedup_against(spark, event_chunks):
    from pylluminator_spark.streaming.events import streaming_dedup_against

    existing = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("ts") < "2024-01-05 00:00:00")
        .select("user_id", "event_type")
    )
    res = run_available_now(
        streaming_dedup_against(
            _stream(spark, event_chunks),
            existing,
            keys=("user_id", "event_type"),
            watermark="30 days",
        )
    )
    # batch reference: DISTINCT keys minus the static store's keys
    batch = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "event_type")
        .distinct()
        .join(existing.distinct(), ["user_id", "event_type"], "left_anti")
    )
    got = {(r.user_id, r.event_type) for r in res.collect()}
    want = {(r.user_id, r.event_type) for r in batch.collect()}
    assert got == want
    assert got  # non-degenerate: some keys first appear after the cutoff
    # the shuffle-store path must agree with the broadcast default
    res2 = run_available_now(
        streaming_dedup_against(
            _stream(spark, event_chunks),
            existing,
            keys=("user_id", "event_type"),
            watermark="30 days",
            broadcast_existing=False,
        )
    )
    assert {(r.user_id, r.event_type) for r in res2.collect()} == want


def test_stateful_sessionize(spark, event_chunks):
    res = run_available_now(
        stateful_sessionize(
            _stream(spark, event_chunks),
            gap="2 hours",
            jump_cutoff=5000.0,
            watermark="1 minute",
        )
    ).collect()
    assert len(res) > 0
    # segment ids per user are dense from 0 with no duplicates
    per_user: dict[int, list[int]] = {}
    for r in res:
        per_user.setdefault(r.user_id, []).append(r.segment_id)
    for _uid, segs in per_user.items():
        assert len(segs) == len(set(segs))
    # closed segments carry events; totals bounded by the input size
    total_events = sum(r.n_events for r in res)
    assert 0 < total_events <= event_chunks[1]

    # cross-check against the batch change-point rule for one user with
    # multiple closed segments: same rule, same boundaries
    ev = load_table(spark, SF_DIR, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 2 * 3600 * 1_000_000
    batch_seg = (
        ev.withColumn("_prev_v", F.lag("value").over(w))
        .withColumn("_us", F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
            " CAST(ts AS TIMESTAMP_NTZ))"
        ))
        .withColumn("_prev_t", F.lag("_us").over(w))
        .withColumn(
            "_break",
            F.when(
                F.col("_prev_t").isNotNull()
                & (
                    (F.col("_us") - F.col("_prev_t") > gap_us)
                    | (F.pow(F.col("value") - F.col("_prev_v"), 2) > 5000.0)
                ),
                1,
            ).otherwise(0),
        )
        .withColumn("segment_id", F.sum("_break").over(w))
        .groupBy("user_id", "segment_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
    )
    batch_map = {
        (r.user_id, r.segment_id): (r.n_events, round(r.sum_value, 6))
        for r in batch_seg.collect()
    }
    for r in res:
        assert batch_map[(r.user_id, r.segment_id)] == (
            r.n_events,
            round(r.sum_value, 6),
        ), f"user {r.user_id} seg {r.segment_id}"


def test_stream_static_enrich_parity(spark, event_chunks):
    from pylluminator_spark.streaming import stream_static_enrich

    ev_batch = load_table(spark, SF_DIR, "events")
    dim = (
        ev_batch.select("user_id")
        .distinct()
        .withColumn("user_bucket", (F.col("user_id") % 7).cast("string"))
    )
    enriched = stream_static_enrich(
        _stream(spark, event_chunks), dim, on="user_id"
    )
    res = run_available_now(
        enriched.groupBy("user_bucket").agg(F.count(F.lit(1)).alias("n")),
        output_mode="complete",
    )
    batch = (
        ev_batch.join(F.broadcast(dim), "user_id", "left")
        .groupBy("user_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, res.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_stream_stream_interval_join_parity(spark, event_chunks):
    from pylluminator_spark.streaming import stream_stream_interval_join

    purchases = _stream(spark, event_chunks).filter(
        F.col("event_type") == "purchase"
    ).select("user_id", "ts", F.col("event_id").alias("p_event"))
    errors = _stream(spark, event_chunks).filter(
        F.col("event_type") == "error"
    ).select(
        "user_id",
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("e_event"),
    )
    joined = stream_stream_interval_join(
        purchases, errors, key="user_id", watermark="2 hours", within="1 hour"
    )
    res = run_available_now(
        joined.select("user_id", "p_event", "e_event"), output_mode="append"
    )

    ev = load_table(spark, SF_DIR, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("p_event")
    )
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("e_event"),
    )
    batch = p.join(
        e,
        (F.col("user_id") == F.col("e_user"))
        & (F.col("r_ts") >= F.col("ts"))
        & (F.col("r_ts") <= F.col("ts") + F.expr("INTERVAL 1 hour")),
    ).select("user_id", "p_event", "e_event")
    assert sorted(map(tuple, res.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_read_event_stream_auto_single_file_parity(spark):
    """read_event_stream_auto streams the RAW testdata parquet (single file,
    TIMESTAMP(NANOS)) under whatever ts dtype this session produces, and the
    tumbling aggregation matches the batch twin computed via load_table —
    the q_stream_tumbling gate's exact shape."""
    from pylluminator_spark.streaming.events import read_event_stream_auto

    stream = read_event_stream_auto(spark, f"{SF_DIR}/events.parquet")
    res = run_available_now(
        tumbling_window_counts(stream, window_duration="1 hour"),
        output_mode="complete",
    ).select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("ws"),
        "event_type",
        "n_events",
    )
    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("ws"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    assert sorted(map(tuple, res.collect())) == sorted(map(tuple, batch.collect()))


def test_streaming_fuzzy_dedup_to_store(spark, tmp_path):
    """Streaming near-dup ingestion against a persistent LSH band store:
    seeded-corpus near-dups drop, fresh docs land, a LATER micro-batch's
    near-dup of an EARLIER batch's survivor drops (the store grows
    between batches), and batch_id-keyed overwrite keeps the store
    layout replay-idempotent."""
    import os

    from pylluminator_spark.operators.dedup import (
        lsh_band_table,
        minhash_signature,
    )
    from pylluminator_spark.streaming.events import (
        streaming_fuzzy_dedup_to_store,
    )

    def _doc(seed: int, extra: str = "") -> str:
        toks = " ".join(f"w{seed}x{j}" for j in range(12))
        return (toks + " " + extra).strip()

    store = str(tmp_path / "store")
    corpus = spark.createDataFrame(
        [(1, _doc(100)), (2, _doc(200))], "doc_id long, text string"
    )
    lsh_band_table(minhash_signature(corpus, "text", 64, 3)).write.parquet(
        os.path.join(store, "bands", "batch_id=seed")
    )
    src = str(tmp_path / "src")
    # file 1 -> batch 1: near-dup of corpus doc 1 (drop), fresh doc 11
    spark.createDataFrame(
        [(10, _doc(100, "tail")), (11, _doc(300))],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(os.path.join(src, "f=1"))
    # file 2 -> batch 2: near-dup of batch-1 survivor 11 (drop), fresh 21
    spark.createDataFrame(
        [(20, _doc(300, "tail")), (21, _doc(400))],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(os.path.join(src, "f=2"))
    stream = (
        spark.readStream.schema("doc_id long, text string, f int")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    ).drop("f")
    q = streaming_fuzzy_dedup_to_store(
        stream,
        store,
        checkpoint_location=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    got = {
        r.doc_id
        for r in spark.read.parquet(os.path.join(store, "docs")).collect()
    }
    assert got == {11, 21}
    # the store's band partitions: the seed plus one per micro-batch
    parts = sorted(os.listdir(os.path.join(store, "bands")))
    # seed + one per micro-batch: maxFilesPerTrigger=1 over two files
    # must produce TWO batches, or the cross-batch suppression above
    # degenerates into the within-batch rule
    assert "batch_id=seed" in parts and len(parts) == 3, parts


def test_streaming_curate_to_store(spark, tmp_path):
    """Streaming FULL-curation ingestion (r12): micro-batches run the
    complete incremental-curation chain against a shared manifest root.
    Batch 1's dups of the seeded base drop and its footer paragraph is
    suppressed; batch 2's dups of batch 1's SURVIVORS drop (each batch
    becomes a curated generation); a full re-drain with a fresh
    checkpoint is idempotent (content-addressed cache hits + batch_id
    overwrite), never self-suppressing."""
    import os

    from pylluminator_spark.operators.curate import curate_pipeline
    from pylluminator_spark.streaming.events import (
        streaming_curate_to_store,
    )

    root = str(tmp_path / "m")
    store = str(tmp_path / "store")
    footer = "SHARED FOOTER boilerplate notices"
    base = spark.createDataFrame(
        [
            (1, f"base document body about harbor dredging\n\n{footer}"),
            (2, f"base document body about rail ballast\n\n{footer}"),
        ],
        "doc_id long, text string",
    )
    curate_pipeline(
        spark, root, base, source_fingerprint="seed-base",
        keep_lang=None, min_tokens=2, pack_budget=None,
    )
    src = str(tmp_path / "src")
    # batch 1: exact dup of base doc 1 (drop), fresh doc with the base
    # footer (footer suppressed, body kept)
    spark.createDataFrame(
        [
            (10, f"base document body about harbor dredging\n\n{footer}"),
            (11, f"fresh stream content about tidal barrages\n\n{footer}"),
        ],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(os.path.join(src, "f=1"))
    # batch 2: exact dup of batch-1 survivor 11 (drop), fresh doc
    spark.createDataFrame(
        [
            (20, "fresh stream content about tidal barrages"),
            (21, "second batch content about canal aqueducts"),
        ],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(os.path.join(src, "f=2"))

    def _stream():
        return (
            spark.readStream.schema("doc_id long, text string, f int")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        ).drop("f")

    q = streaming_curate_to_store(
        _stream(), root, store,
        checkpoint_location=str(tmp_path / "ckpt"),
        min_tokens=2, max_tokens=10_000,
    )
    q.awaitTermination()
    out = spark.read.parquet(os.path.join(store, "docs"))
    got = {r.doc_id: r.text for r in out.collect()}
    assert sorted(got) == [11, 21]
    assert footer not in got[11]  # base footer paragraph suppressed
    parts = sorted(os.listdir(os.path.join(store, "docs")))
    assert len(parts) == 2, parts  # one partition per micro-batch
    # re-drain with a FRESH checkpoint: same batch ids, same
    # fingerprints -> pure cache hits + overwrite; store unchanged,
    # batches never suppressed by their own prior generations
    q2 = streaming_curate_to_store(
        _stream(), root, store,
        checkpoint_location=str(tmp_path / "ckpt2"),
        min_tokens=2, max_tokens=10_000,
    )
    q2.awaitTermination()
    out2 = spark.read.parquet(os.path.join(store, "docs"))
    assert {r.doc_id for r in out2.collect()} == {11, 21}


def test_streaming_curate_bootstraps_empty_root(spark, tmp_path):
    """On a root with no base run, the first micro-batch bootstraps the
    base pipeline; later batches increment against it. A re-drain with
    a fresh checkpoint replays the bootstrap batch through the base
    path again (never as an increment against its own generation)."""
    import os

    from pylluminator_spark.streaming.events import (
        streaming_curate_to_store,
    )

    root = str(tmp_path / "m")
    store = str(tmp_path / "store")
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [
            (1, "bootstrap corpus doc about millwheels"),
            (2, "bootstrap corpus doc about millwheels"),  # within-batch dup
            (3, "bootstrap corpus doc about weirs"),
        ],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(os.path.join(src, "f=1"))
    spark.createDataFrame(
        [
            (10, "bootstrap corpus doc about weirs"),  # dup of batch-1
            (11, "second batch doc about sluice gates"),
        ],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(os.path.join(src, "f=2"))

    def _stream():
        return (
            spark.readStream.schema("doc_id long, text string, f int")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        ).drop("f")

    q = streaming_curate_to_store(
        _stream(), root, store,
        checkpoint_location=str(tmp_path / "ckpt"),
        min_tokens=2, max_tokens=10_000,
    )
    q.awaitTermination()
    out = spark.read.parquet(os.path.join(store, "docs"))
    assert {r.doc_id for r in out.collect()} == {1, 3, 11}
    # replay from scratch: the bootstrap batch must re-take the base
    # path (cache hit), not increment against its own generation
    q2 = streaming_curate_to_store(
        _stream(), root, store,
        checkpoint_location=str(tmp_path / "ckpt2"),
        min_tokens=2, max_tokens=10_000,
    )
    q2.awaitTermination()
    out2 = spark.read.parquet(os.path.join(store, "docs"))
    assert {r.doc_id for r in out2.collect()} == {1, 3, 11}
    # knob guards
    with pytest.raises(ValueError, match="pack_budget"):
        streaming_curate_to_store(_stream(), root, store, pack_budget=5)
