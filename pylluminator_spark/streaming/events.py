"""Structured Streaming operators over the `events` surface.

The reference engine has no streaming layer (SURVEY §2.9); these operators
extend its windowed/ordered batch semantics (reference dm.py:565-596
change-point segmentation, the batch `sessionize` query) to unbounded input
with correct late-data handling.

Scale design notes (100 TB / 1000-executor target):
- All window aggregations are keyed (`groupBy(window(...), key)`) so state is
  hash-partitioned across executors; no global ordering is ever required.
- Watermarks bound state: every stateful operator here takes an explicit
  watermark delay, so state store size is O(active windows x keys), not
  O(stream history).
- The custom stateful operator uses `applyInPandasWithState` (Arrow-batched,
  grouped by key) — state per key is O(1) scalars, the hot loop is numpy.
"""

from __future__ import annotations

import uuid
from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

# Streaming file sources require an explicit schema (no inference at plan
# time). `ts` is read as epoch-nanos long when the session sets
# spark.sql.legacy.parquet.nanosAsLong (see session.get_spark) and converted
# below, mirroring datasets.load_table.
EVENTS_SCHEMA_NANOS = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession,
    path: str,
    *,
    max_files_per_trigger: int | None = None,
    ts_as_nanos: bool = True,
) -> DataFrame:
    """File-source stream over event parquet files.

    `path` may be a directory of parquet files or a glob; each new file is a
    micro-batch input (with `max_files_per_trigger` controlling batch size —
    used in tests to force multi-batch runs so watermarks actually advance).
    """
    reader = spark.readStream.schema(
        EVENTS_SCHEMA_NANOS if ts_as_nanos else EVENTS_SCHEMA
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(path)
    if ts_as_nanos:
        df = df.withColumn(
            "ts", F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("long"))
        )
    return df


def read_event_stream_auto(spark: SparkSession, path: str) -> DataFrame:
    """Session-config-agnostic event stream: probe the BATCH schema of the
    parquet (footer-only, no job) to see how this session materializes the
    TIMESTAMP(NANOS) ``ts`` column — bigint under nanosAsLong, TIMESTAMP_NTZ
    on vanilla Spark 4, TIMESTAMP otherwise — normalize the WALL CLOCK to
    microseconds exactly like ``datasets.load_table``, then cast to
    TIMESTAMP (watermarks reject NTZ). The NTZ->LTZ cast interprets the
    wall clock in the session timezone and ``date_format`` renders it back
    in the same zone, so downstream timestamps match the DuckDB naive
    reading under any session (including the driver's vanilla one).
    Caveat: Spark aligns ``F.window`` grids to UTC-epoch multiples, so
    under a fractional-hour-offset session timezone pass
    ``wall_clock_window_offset(spark)`` as the window startTime to keep
    hourly labels on wall-clock boundaries."""
    import os

    dt = dict(spark.read.parquet(path).dtypes).get("ts")
    if os.path.isfile(path):
        # FileStreamSource accepts a directory or a glob, never a bare
        # file — a one-character class turns the file path into a glob
        # without changing what it matches.
        path = path[:-1] + "[" + path[-1] + "]"
    if dt == "bigint":
        df = spark.readStream.schema(EVENTS_SCHEMA_NANOS).parquet(path)
        ntz = F.expr(
            "timestampadd(MICROSECOND, ts div 1000,"
            " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
        )
        return df.withColumn("ts", ntz.cast("timestamp"))
    # derive from the canonical schema: only the ts field type varies
    fields = [
        StructField(
            f.name,
            (
                TimestampNTZType() if dt == "timestamp_ntz" else TimestampType()
            )
            if f.name == "ts"
            else f.dataType,
        )
        for f in EVENTS_SCHEMA.fields
    ]
    df = spark.readStream.schema(StructType(fields)).parquet(path)
    if dt == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    else:
        # LTZ session: recover the UTC wall clock (the naive parquet value,
        # same as load_table) and re-anchor it in the session timezone.
        df = df.withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, unix_micros(ts),"
                " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ).cast("timestamp"),
        )
    return df


def wall_clock_window_offset(
    spark: SparkSession, duration_seconds: int = 3600
) -> str:
    """``F.window`` startTime aligning tumbling windows to SESSION-WALL-CLOCK
    boundaries: Spark aligns windows to UTC-epoch multiples, so a session
    timezone with a fractional-hour UTC offset (+05:30 and friends) would
    otherwise label hourly windows at HH:30. Returns the sub-duration
    remainder of the session offset as a startTime string ('0 seconds' for
    whole-offset zones, and on any timezone name zoneinfo cannot resolve).
    DST shifts are whole hours in practice, so the remainder is stable."""
    try:
        from datetime import datetime
        from zoneinfo import ZoneInfo

        tzname = spark.conf.get("spark.sql.session.timeZone")
        off = ZoneInfo(tzname).utcoffset(datetime(2026, 1, 1))
        rem = int(off.total_seconds()) % duration_seconds
    except Exception:
        rem = 0
    return f"{(-rem) % duration_seconds} seconds"


def tumbling_window_counts(
    events: DataFrame,
    *,
    window_duration: str = "1 hour",
    watermark: str = "10 minutes",
    start_time: str | None = None,
) -> DataFrame:
    """Per (tumbling window, event_type) count + value sum.

    Keyed state, watermark-bounded: late rows beyond `watermark` are dropped,
    closed windows are evicted from the state store. ``start_time`` shifts
    the window grid (see ``wall_clock_window_offset``)."""
    win = (
        F.window("ts", window_duration, window_duration, start_time)
        if start_time
        else F.window("ts", window_duration)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_window_counts(
    events: DataFrame,
    *,
    window_duration: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "10 minutes",
    start_time: str | None = None,
) -> DataFrame:
    """Sliding-window per-type counts; each row lands in window/slide panes.
    ``start_time`` shifts the pane grid (see ``wall_clock_window_offset``)."""
    win = (
        F.window("ts", window_duration, slide, start_time)
        if start_time
        else F.window("ts", window_duration, slide)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def session_window_agg(
    events: DataFrame,
    *,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-user session windows (gap-merged), the streaming analogue of the
    batch gaps-and-islands sessionization (reference-side W1 machinery)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def streaming_dedup(
    events: DataFrame,
    keys: Iterable[str] = ("user_id", "event_type"),
    *,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming deduplication with bounded state.

    `dropDuplicatesWithinWatermark` keeps each key's fingerprint only until
    the watermark passes it — O(keys-in-window) state, unlike global
    `dropDuplicates` whose state grows without bound on a stream.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


# --- Custom stateful operator: streaming change-point sessionization --------

_SEG_STATE_SCHEMA = StructType(
    [
        StructField("seg_id", LongType()),
        StructField("n", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("last_value", DoubleType()),
        StructField("last_ts", LongType()),
    ]
)

_SEG_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("segment_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


def _sessionize_fn(gap_us: int, jump_cutoff: float):
    """Build the per-key stateful function.

    A new segment starts when the inter-event time gap exceeds `gap_us` OR
    the squared value jump exceeds `jump_cutoff` — the streaming form of the
    reference's DMR change-point rule (squared distance > cutoff OR
    chromosome boundary, dm.py:569-596). Closed segments are emitted; the
    open segment lives in O(1) state until the event-time timeout fires.
    """

    def fn(key, pdf_iter, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            seg_id, n, sum_value, _lv, _lt = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "segment_id": [seg_id],
                    "n_events": [n],
                    "sum_value": [sum_value],
                }
            )
            return

        if state.exists:
            seg_id, n, sum_value, last_value, last_ts = state.get
        else:
            seg_id, n, sum_value, last_value, last_ts = 0, 0, 0.0, None, None

        out_ids, out_ns, out_sums = [], [], []
        for pdf in pdf_iter:
            pdf = pdf.sort_values("ts")
            ts_us = pdf["ts"].astype("int64") // 1000  # ns -> us
            for value, t in zip(pdf["value"].to_numpy(), ts_us.to_numpy()):
                is_break = last_ts is not None and (
                    (t - last_ts) > gap_us
                    or (value - last_value) ** 2 > jump_cutoff
                )
                if is_break:
                    out_ids.append(seg_id)
                    out_ns.append(n)
                    out_sums.append(sum_value)
                    seg_id, n, sum_value = seg_id + 1, 0, 0.0
                n += 1
                sum_value += float(value)
                last_value, last_ts = float(value), int(t)

        state.update((seg_id, n, sum_value, last_value, last_ts))
        # Event-time timeout: flush the open segment once the watermark
        # passes last_ts + gap (no more in-order data can extend it).
        state.setTimeoutTimestamp(last_ts // 1000 + gap_us // 1000)
        if out_ids:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(out_ids),
                    "segment_id": out_ids,
                    "n_events": out_ns,
                    "sum_value": out_sums,
                }
            )

    return fn


def stateful_sessionize(
    events: DataFrame,
    *,
    gap: str = "30 minutes",
    jump_cutoff: float = 5000.0,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Custom stateful operator: per-user change-point segmentation over an
    unbounded stream via `applyInPandasWithState`.

    Unlike `session_window_agg` (time-gap only), a segment also closes on a
    large value jump — semantics Spark's built-in session windows can't
    express, hence the custom state machine.
    """
    n, unit = gap.split()
    mult = {"second": 1, "minute": 60, "hour": 3600}[unit.rstrip("s")]
    gap_us = int(n) * mult * 1_000_000
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn(gap_us, jump_cutoff),
            outputStructType=_SEG_OUT_SCHEMA,
            stateStructType=_SEG_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# --- Sinks / test drivers ---------------------------------------------------


def streaming_dedup_against(
    stream: DataFrame,
    existing: DataFrame,
    keys: tuple[str, ...] = ("user_id", "event_type"),
    ts_col: str = "ts",
    watermark: str = "1 hour",
    broadcast_existing: bool = True,
) -> DataFrame:
    """Streaming INCREMENTAL dedup — the streaming twin of
    ``operators.curate.curate_increment``'s exact-dedup stage: dedup the
    stream on ``keys`` within the watermark (first arrival wins,
    state evicted as the watermark passes — ``streaming_dedup``
    semantics), then LEFT ANTI join against the STATIC ``existing`` key
    set, so keys already present in the curated store never emit.

    The anti join is STATELESS: each micro-batch hash-probes the
    (broadcast) static side, which is re-resolved per batch — appending
    to the store between batches suppresses later re-arrivals without
    restarting the query. Total state is the dedup's watermark-bounded
    key window only; the store side adds none. ``existing`` must be
    dimension-sized (or pre-reduced to its DISTINCT key projection) if
    broadcast; pass ``broadcast_existing=False`` to let the per-batch
    join shuffle instead when the store's key set is too large to ship.
    """
    deduped = stream.withWatermark(
        ts_col, watermark
    ).dropDuplicatesWithinWatermark(list(keys))
    ex = existing.select(*keys).distinct()
    if broadcast_existing:
        ex = F.broadcast(ex)
    return deduped.join(ex, list(keys), "left_anti")


def streaming_fuzzy_dedup_to_store(
    stream: DataFrame,
    store_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 3,
    band_fn=None,
    checkpoint_location: str | None = None,
):
    """Streaming NEAR-dup ingestion against a persistent LSH band store
    — the fuzzy twin of ``streaming_dedup_against`` and the streaming
    analogue of ``operators.curate``'s incremental fuzzy stage: each
    micro-batch keeps only documents that share no band bucket with the
    store (bands-only MinHash-LSH, ``dedup_minhash_lsh_against``
    ``threshold=None`` semantics) nor with a LOWER-id document of the
    same batch, appends the survivors to ``<store>/docs`` and their
    band rows to ``<store>/bands`` — so the NEXT micro-batch's probe
    sees them (cross-batch near-dups drop, earliest batch wins).

    Scale/state design: LSH state at corpus scale cannot live in the
    streaming state store — here it lives in parquet. The stream side
    is stateless (signature + banding are pure column expressions; the
    store is re-read per batch inside ``foreachBatch``), so executor
    state is zero and the store can be shared with the BATCH pipeline:
    seed ``<store>/bands`` with a curated corpus's
    ``lsh_band_table`` / ``curate_pipeline`` ``fuzzy_bands`` stage and
    the stream filters against the same index batch increments probe.

    Exactly-once: each batch writes to ``batch_id=N`` subdirectories
    with overwrite, so a replayed batch after failure overwrites its own
    prior output instead of duplicating it (requires a real
    ``checkpoint_location`` to get stable batch ids across restarts).

    ``band_fn`` overrides the banding (a callable df -> band table with
    ``(id_col, _band, _band_hash)`` — e.g. a deterministic arithmetic
    twin for cross-engine verification); default is the production
    xxhash64 shingle MinHash. Returns the started StreamingQuery —
    pair with ``.trigger`` availableNow via this helper's default and
    ``awaitTermination()`` for drain-style use.
    """
    import os as _os

    from pylluminator_spark.operators.dedup import (
        dedup_minhash_lsh_against,
        lsh_band_table,
        minhash_signature,
    )
    from pylluminator_spark.plans.checkpoint import stable_checkpoint

    bands_dir = _os.path.join(store_dir, "bands")
    docs_dir = _os.path.join(store_dir, "docs")

    if band_fn is None:

        def band_fn(df):
            return lsh_band_table(
                minhash_signature(df, text_col, num_hashes, shingle_size),
                id_col=id_col,
                bands=bands,
            )

    def _process(batch_df, batch_id: int) -> None:
        # checkpoints route through the package policy (reliable-dir
        # conf honored); foreachBatch replay + batch_id-overwrite keeps
        # executor loss recoverable either way, so the policy here buys
        # consistency, not correctness
        spark = batch_df.sparkSession
        batch_df = stable_checkpoint(batch_df)
        # the batch's band table is computed ONCE and reused for the
        # probe AND the store append (the survivors' bands are a filter
        # of it, not a re-run of the signature map)
        batch_bands = stable_checkpoint(band_fn(batch_df))
        if _os.path.isdir(bands_dir):
            idx = spark.read.parquet(bands_dir).select(
                id_col, "_band", "_band_hash"
            )
        else:  # unseeded store: the first batch probes an empty index
            idx = batch_bands.limit(0).select(
                id_col, "_band", "_band_hash"
            )
        surv = stable_checkpoint(
            dedup_minhash_lsh_against(
                batch_df,
                idx,
                None,
                id_col=id_col,
                text_col=text_col,
                threshold=None,
                new_bands=batch_bands,
            )
        )
        surv.write.mode("overwrite").parquet(
            _os.path.join(docs_dir, f"batch_id={batch_id}")
        )
        batch_bands.join(
            surv.select(id_col), id_col, "left_semi"
        ).write.mode("overwrite").parquet(
            _os.path.join(bands_dir, f"batch_id={batch_id}")
        )

    writer = stream.writeStream.foreachBatch(_process).trigger(
        availableNow=True
    )
    if checkpoint_location is not None:
        writer = writer.option("checkpointLocation", checkpoint_location)
    return writer.start()


def streaming_curate_to_store(
    stream: DataFrame,
    manifest_root: str,
    store_dir: str,
    *,
    checkpoint_location: str | None = None,
    fingerprint_prefix: str = "stream-batch",
    **curate_kwargs,
):
    """Streaming FULL-curation ingestion: each micro-batch runs the
    complete incremental-curation chain (``operators.curate.
    curate_increment`` — policy filters, language ID, exact / fuzzy /
    paragraph dedup against every curated generation, CCNet cut,
    quality gate) against the shared ``manifest_root``, then appends
    the curated survivors to ``<store_dir>/docs/batch_id=N``.

    This composes the two persistence layers the batch pipeline
    already has, and that composition is the whole design:

    - EXACTLY-ONCE curation falls out of the manifest: the batch's
      ``source_fingerprint`` is keyed by the streaming ``batch_id``
      (``<fingerprint_prefix>-<id>``), so a replayed micro-batch
      (failure/restart under a real ``checkpoint_location``) resolves
      to the same frame-source key, CACHE-HITS every stage, and
      overwrites its own store partition instead of duplicating —
      idempotence from content addressing, not from streaming state.
    - each drained batch becomes a curated GENERATION: its gate
      parquet persists the ``content_fp``/``para_fps`` passengers (and
      its ``gate_bands`` index when ``fuzzy`` is on), so every LATER
      batch — streaming or batch-mode ``curate_increment`` against the
      same root — suppresses its duplicates through pruned fingerprint
      scans. Cross-batch dedup state lives entirely in parquet; the
      stream side holds ZERO executor state (the
      ``streaming_fuzzy_dedup_to_store`` scale argument).

    A root with no prior ``curate_pipeline`` run is BOOTSTRAPPED: the
    first batch runs the base pipeline under the same knobs (its
    ``domain_cap`` is that batch-local corpus's cap — identical
    semantics for a single batch) and later batches increment against
    it. ``curate_kwargs`` forwards knobs to ``curate_increment``
    (``min_tokens``, ``fuzzy=``, ``gopher=``, ...); ``pack_budget`` is
    rejected (sequence continuation needs a total order over batches —
    pack downstream with ``pack_sequences``), and ``langid_model``
    requires a pre-seeded base (bootstrap cannot honor it).

    Returns the started StreamingQuery (availableNow trigger — pair
    with ``awaitTermination()`` for drain-style use).
    """
    import os as _os

    from pylluminator_spark.operators.curate import (
        curate_increment,
        curate_pipeline,
    )

    if "pack_budget" in curate_kwargs:
        raise ValueError(
            "streaming_curate_to_store does not support pack_budget — "
            "packing needs a total order over batches; run "
            "pack_sequences over the drained store downstream"
        )
    docs_dir = _os.path.join(store_dir, "docs")

    # base-pipeline stage names, walked inputs[0]-wise to the source key
    _base_walk = frozenset(
        {
            "quality_gate",
            "ccnet_filter",
            "dedup_paragraphs",
            "fuzzy_dedup",
            "dedup_exact",
            "langid_filter",
            "domain_filter",
        }
    )

    def _usable_base(spark, fp: str) -> bool:
        """True iff the root holds a base generation NOT rooted at this
        batch's own fingerprint. A REPLAYED bootstrap batch would
        otherwise see the base it built, take the increment path, and
        self-suppress to empty — it must re-run the (cache-hitting)
        base pipeline instead."""
        from pylluminator_spark.plans.manifest import PipelineManifest

        if not _os.path.exists(
            _os.path.join(manifest_root, "ledger.jsonl")
        ):
            return False
        m = PipelineManifest(spark, manifest_root)
        for e in m.entries_named("quality_gate"):
            k = e["key"]
            while True:
                ent = m.entry(k)
                if ent and ent.get("name") in _base_walk:
                    k = (ent.get("inputs") or [k])[0]
                else:
                    break
            if k != f"frm-{fp}":
                return True
        return False

    def _process(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_df.isEmpty():
            return
        fp = f"{fingerprint_prefix}-{batch_id}"
        if _usable_base(spark, fp):
            res = curate_increment(
                spark,
                manifest_root,
                batch_df,
                source_fingerprint=fp,
                **curate_kwargs,
            )
        else:
            if "langid_model" in curate_kwargs:
                raise ValueError(
                    "streaming_curate_to_store: langid_model needs a "
                    "pre-seeded base — run curate_pipeline on the "
                    "corpus first, then start the stream"
                )
            res = curate_pipeline(
                spark,
                manifest_root,
                batch_df,
                source_fingerprint=fp,
                pack_budget=None,
                **curate_kwargs,
            )
        res.documents.write.mode("overwrite").parquet(
            _os.path.join(docs_dir, f"batch_id={batch_id}")
        )

    writer = stream.writeStream.foreachBatch(_process).trigger(
        availableNow=True
    )
    if checkpoint_location is not None:
        writer = writer.option("checkpointLocation", checkpoint_location)
    return writer.start()


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream ⨝ static dimension (the streaming analogue of the engine's
    fact↔manifest broadcast join, SURVEY §2.3 J1). Stateless: each
    micro-batch hash-joins against the (broadcast) dim — no state store, no
    watermark needed. The dim is re-resolvable per batch, so slowly-changing
    dimensions refresh on re-read at batch boundaries."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on, how)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "r_ts",
    watermark: str = "2 hours",
    within: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner join: rows with equal ``key`` whose right-side
    event time falls in ``[left_ts, left_ts + within]``.

    Both sides carry a watermark so the state store only buffers rows inside
    the join window plus the allowed lateness — O(rate x (watermark +
    within)) state per executor, evicted as the watermark advances. The
    caller must pre-rename the right-side time column (``right_ts``) so the
    equi-key and both time columns coexist unambiguously in the output.
    """
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, cond, "inner").drop(F.col(f"r.{key}"))


def run_available_now(
    stream_df: DataFrame,
    *,
    output_mode: str = "append",
    query_name: str | None = None,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Drain all currently-available input through the streaming plan
    (Trigger.AvailableNow), collect via a memory sink, and return the result
    as a batch DataFrame. Used by tests and by batch/stream parity checks.

    ``shuffle_partitions`` temporarily overrides the session's shuffle
    width for THIS drain (restored afterwards; streaming reads the conf at
    query start). Stateful operators allocate one state-store instance per
    shuffle partition per store — a stream-stream join keeps FOUR stores
    per partition — so a small drain at the session's batch width pays
    mostly store-commit overhead (measured 5.5 s -> 2.4 s at 32 -> 8 for
    the gate's interval join). Partitioning never changes the drained
    result, only the state layout; size it to drain volume and leave None
    at production rates."""
    spark = stream_df.sparkSession
    prev = None
    if shuffle_partitions is not None:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(shuffle_partitions)
        )
    try:
        name = query_name or f"mem_{uuid.uuid4().hex[:8]}"
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


def parquet_sink(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    *,
    output_mode: str = "append",
    available_now: bool = True,
):
    """Fault-tolerant parquet sink (exactly-once via checkpointed offsets)."""
    writer = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    q.awaitTermination()
    return q
