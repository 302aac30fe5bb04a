"""Physical-plan regression tests: the scale properties the engine promises
(broadcast dims, pushed filters, pruned scans, partial aggregation, no
accidental single-partition exchanges, no row-at-a-time Python) are asserted
on the ACTUAL plans, so a refactor that silently de-optimizes a query fails
CI rather than a future 100x scale-up.

Size-based dispatch caveat: the globally-ordered helpers (operators.ordered)
intentionally use a plain global window below SMALL_INPUT_ROWS — queries on
that path are asserted separately with the single-partition exchange ALLOWED
(their scale path is exercised in test_ordered.py with num_partitions set).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"

# queries whose plans must carry NO scale red flag at any size
CLEAN = [
    "anti_join", "asof_join", "beta_distribution", "beta_values", "cnv_regression",
    "corr_by_brand", "cube_agg", "dedup_exact", "distinct_agg",
    "doc_fingerprint", "event_windows", "explode_tokens", "infer_channel",
    "interval_anti_join", "interval_cluster", "lang_profile", "m_values",
    "mask_builders", "mask_nullout", "median_by_brand", "merge_by_group",
    "pivot_wide", "pricing_summary", "probe_suffix_merge", "quality_scores",
    "range_join_count", "revenue_by_nation", "rollup_agg", "running_total",
    "semi_join", "sessionize", "stouffer_groups", "token_stats",
    "top_customers", "top_dm_genes", "top_intensity_median",
    "topk_per_group", "total_ib_intensity", "typed_merge",
    "union_except", "value_segments",
    "outer_join_counts", "scalar_subquery", "moving_avg_time",
    "window_ranks", "grouping_sets", "exists_shapes", "min_cost_match",
    "skew_salted_agg", "hash_split", "bpe_token_stats", "unpivot_melt",
    "shipping_priority", "late_orders", "volume_shipping", "market_share",
    "product_profit", "returned_items", "priority_shipmode",
    "supplier_part_cnt", "large_orders",
    # round 3: real-codec decode (mapInPandas, shuffle-free), LSH bucket
    # join (equi-join on signatures), grouped-map REML, Gram-trick MDS
    "media_decode", "embedding_near_dup_lsh", "mixedlm_dmp", "dr_scores",
    "chunk_documents",
    # round 4: closed-form OLS surrogate, Gram-trick distance matrix
    # (driver-side only the n x n result), streaming drain via memory sink,
    # binned-KDE density grid
    "ols_dmp", "sample_distances", "stream_tumbling", "beta_density",
    "media_decode_jpeg", "pca_gram",
    # round 4 corpus ops: explode -> doc-keyed hash aggregate (gopher /
    # repetition), broadcast-dim semi-join (decontaminate), map-side
    # predicate + agg (stratified_sample), streaming drain (sliding)
    "gopher_quality", "repetition_ratios", "decontaminate",
    "stratified_sample", "stream_sliding", "pii_redact", "stream_session",
    "repeated_spans", "stream_dedup", "top_ngrams", "cohort_retention",
    # r10 streaming incremental dedup: watermark-bounded dedup + stateless
    # per-batch broadcast anti-join vs the static store; drained via the
    # memory sink like the other stream_* entries
    "stream_dedup_inc",
    # r11 streaming fuzzy ingestion: stateless per-batch LSH band probe
    # of a parquet store (foreachBatch); the RETURNED plan is a pruned
    # scan of the store's docs partitions
    "stream_fuzzy_inc",
    # r12 streaming full-curation ingestion: foreachBatch runs
    # curate_increment per micro-batch (manifest-addressed exactly-once);
    # the RETURNED plan is a pruned scan of the store's docs partitions
    "stream_curate_inc",
    # round 4 cleanup ops: codegen regexp chains (clean_html/url_normalize:
    # no shuffle at all), fingerprint-keyed dedup + doc-keyed reassembly
    # (dedup_paragraphs), broadcast blocklist anti-join + hash-partitioned
    # streaming row_number window (domain_cap)
    "clean_html", "url_normalize", "dedup_paragraphs", "domain_cap",
    # per-stratum A-ES draw: one hash-partitioned row_number window
    "weighted_sample",
    # classifier inference: pure codegen sigmoid projection, no shuffle
    "logreg_predict",
    # PQ encoding: broadcast-literal codebooks, map-side only
    "pq_encode",
    # BPE pair stats: two hash aggregates (word types, then pairs)
    "bpe_pairs",
    # ADC search: literal LUT projection + distributed TakeOrdered
    "pq_adc",
    # transition matrix: one keyed window + one hash aggregate; histogram:
    # min/max scan + bucketed hash aggregate
    "event_transitions", "value_histogram",
    # resample: keyed agg + distributed sequence grid + keyed left join +
    # partitioned ffill window; ewma: per-group sorted fold (hash agg);
    # anomalies: one partitioned ROWS window over exact integer sums
    "ts_resample", "ts_ewma", "ts_anomalies",
    # FastSS: explode deletion variants -> variant equi-join -> distinct ->
    # codegen levenshtein verify; no cartesian at any stage
    "fuzzy_pairs",
    # cross-corpus span decontamination: gram-as-rank keyed joins +
    # per-doc island windows (no ranking machinery at gate width)
    "decontaminate_spans",
    # Morton key: pure shift/and/or codegen + one hash aggregate
    "zorder_key",
    # sketches: pure integer hash exprs + one keyed aggregate each
    "hll_registers", "cms_counters",
    # round 5: ComBat's distributed stage — broadcast model join + three
    # probe-keyed hash aggregates/joins; CBS split statistic — chromosome-
    # partitioned windows + one keyed argmax window
    "combat_stats", "cbs_tstat",
    # round 6: watermarked stream-stream interval join drained via memory
    # sink (plan inspected on the drained batch result, like the other
    # stream_* entries)
    "stream_join",
    # round 6 queue: CDC merge — ONE window over the change batch + one
    # anti-join, snapshot never sorted; k-anonymity — one hash aggregate
    # on the quasi key; bloom prune — inlined-literal codegen probe, the
    # fact side reaches the join pre-filtered with zero extra shuffle
    "apply_changes", "k_anonymity", "bloom_prune",
    # winnowing minimizers: array exprs map-side, then explode -> keyed
    # aggregate; the pair stage is a df-capped minimizer equi self-join
    "minimizer_sigs", "minimizer_pairs",
    # calibration: codegen score expr + one <=10-row keyed aggregate
    "calibration_bins",
    # winsorize: grouped percentile stats broadcast back + codegen clamp
    # (robust_zscore is the same shape twice: median pass, MAD pass)
    "winsorize", "robust_zscore",
    # round 9: video near-dup — banded frame-hash equi self-join (never
    # all-pairs) + multiplicity-weighted hash aggregates; fuzzy
    # decontamination — benchmark gram table broadcast, pair-keyed agg
    "video_near_dup", "decontaminate_fuzzy",
]

# global scalar aggregate: the final 1-row stage exchanges O(partitions)
# partial-agg rows, not data — SinglePartition is correct there (and a
# 1-row broadcast scalar compared via crossJoin plans as a BNLJ by design)
SCALAR_AGG_OK = [
    # quantile binning: the two-phase distributed rank (literal-boundary
    # buckets + per-bucket window + offset join — no range exchange, no
    # persist); the <= n-row offsets/total stats branch is the
    # SinglePartition + 1-row-crossJoin shape this category allows
    # (asserted precisely in test_quantile_bins_rank_is_bucketized)
    "quantile_bins",
    "agg_equals_max", "filter_scan_revenue", "promo_revenue",
    "disjunctive_pred", "important_parts", "bulk_suppliers",
    "idle_customers",
    # BM25's / the unigram LM's corpus stats are a broadcast 1-row scalar
    "bm25_rank", "lm_score",
    # the profiler's whole output IS one global aggregate row
    "table_profile",
    # source_mixing's feasibility scalar C is a broadcast 1-row aggregate
    "source_mixing",
    # the funnel's final counts are one global aggregate row
    "event_funnel",
    # the IRLS step's distributed stage is one global suffstats aggregate;
    # the returned 1-row frame is a local scan of the driver solve
    "logreg_step",
    # the whole rule report IS one global aggregate row, unpivoted
    "validate_rules",
    # the graph summary is three 1-row aggregates cross-joined
    "graph_triangles",
    # TF-IDF cosine: the corpus-size scalar (n_docs, for idf) is a 1-row
    # broadcast crossJoin; every data-bearing stage is an equi join /
    # keyed hash aggregate over df-capped posting lists
    "tfidf_pairs",
    # bigram LM: corpus-sized model table joins by HASH (never
    # broadcast); the only broadcast is the 1-row corpus scalar
    "bigram_lm",
    # CCNet paragraph filter: bigram-LM hash joins + bucketized global
    # rank; the broadcasts are the 1-row corpus scalar and the 1-row
    # scored-paragraph count (tercile cuts)
    "paragraph_lm_buckets", "ccnet_filter",
    # DoReMi: two LM scorings (hash joins) + <=n_domains aggregation;
    # the broadcasts are the LM corpus scalars and the 1-row normalizer
    "doremi_weights",
    # DSIR: data-bearing stages are one (doc, bucket) hash aggregate +
    # a broadcast join on the <=buckets-row log-ratio table; the
    # corpus-total scalars are 1-row broadcast crossJoins
    "dsir_weights",
    # histogram sketch: one bucketed hash aggregate over the fact table;
    # the quantile stage windows/joins the <=bins-row sketch and
    # broadcasts the 5-row quantile grid
    "hist_quantiles",

    # Welch z-test: one conditional-sum global aggregate row
    "ab_test",
    # association stats: the cross/window stages run on the CELL table
    # (cardinality-bounded, never data-bounded); output is one row
    "chi_square_assoc", "mutual_info",
    # PSI: per-side count aggregates + category-table outer join + 1-row fold
    "psi_drift",
    # fk report: one distinct-key left join + global aggregate per rule
    "fk_check",
    # WAV synth + decode + framed rfft, all Arrow mapInPandas, shuffle-free
    "audio_spectral",
    # SCD2: two windows over one user-keyed sort, no self-join
    "scd2_history",
    # diff: one keyed full-outer join; index: explode + two keyed collects
    "snapshot_diff", "inverted_postings",
    # JSON: codegen get_json_object projection + one hash aggregate
    "json_extract_agg",
    # geo: 3x3 wrapped-cell explode -> cell equi-join -> haversine verify
    "geo_radius_pairs",
    # impute: one stats aggregate broadcast back; gate output filtered
    "impute_mean",
    # attribution: union + keyed carry window / keyed interval join
    "last_touch_attr", "linear_attr",
    # basket: basket-keyed pair self-join + broadcast item supports
    "basket_rules",
    # rolling autocorr: one partitioned ROWS window over integer moments
    "rolling_corr",
    # prefix-filtered exact Jaccard join: equi joins only (token df,
    # prefix-token candidates, verify-by-id) — no cartesian anywhere
    "jaccard_pairs",
    # bloom filter build: k map-side projections + one keyed bit_or agg
    "bloom_filter",
    # pHash near-dup: Arrow mapInPandas hash pass + band equi-join
    # (pigeonhole-blocked, never all-pairs) + codegen bit_count filter
    "image_phash_pairs",
    # manifest stage-cache: the returned frame is a pruned parquet scan
    # of the content-keyed stage store (stages materialize eagerly in
    # the query function; the scalar-agg share stage lives in the
    # STORED parquet, not the returned plan)
    "lineage_stage_cache",
    # curate_pipeline gate: same manifest discipline — every stage
    # materializes eagerly into content-keyed parquet during the query
    # call (pack_sequences' size-dispatched running sum included); the
    # RETURNED plan is an equi join of two stage-parquet scans
    "curate_corpus",
    # composed incremental curation: base + increment materialize
    # eagerly through the manifest (fingerprint-probe anti joins,
    # broadcast batch fps); the RETURNED plan is a pruned scan of the
    # increment's gate-stage parquet. curate_gc_inc is the same chain
    # with curate_gc between base and increment (gate-only probing —
    # r12), identical returned-plan shape
    "curate_increment_corpus", "curate_gc_inc",
    # incremental dedup vs an existing corpus: within-batch hash dedup
    # + broadcast fingerprint probes of the corpus scan — equi joins
    # only, the corpus never shuffles
    "dedup_exact_inc", "dedup_paragraphs_inc",
    # quality-winner dedup: one fingerprint-PARTITIONED row_number
    # window (hash exchange on the 8-byte fp, never single-partition)
    "dedup_exact_best",
]

# size-dispatched global-order helpers: single partition ALLOWED below the
# small-input threshold (the distributed path is tested in test_ordered.py)
DISPATCHED = [
    "bh_adjust", "ecdf_pvalue", "minhash_signatures", "ngram_jaccard",
    "quantile_normalize", "simhash",
    # incremental LSH twin: band/verify stages are pure equi joins; the
    # union-vocabulary tid rank is the size-dispatched with_global_rank
    # (same shape as minhash_signatures' _doc_tokens_df)
    "dedup_fuzzy_inc",
    # token-vocabulary rank inside _doc_tokens_df is size-dispatched
    "dedup_components",
    # pack_sequences' global running sum is size-dispatched
    "pack_sequences",
    # the frontier window runs on the DISTINCT pair table (see skyline.py
    # note — ordered.with_running_min is the large-input path)
    "skyline_frontier",
    # suffix machinery: each doubling round's dense rank is the
    # size-dispatched with_global_rank (small-window path at gate SF;
    # distributed path covered by test_ordered + test_suffix), and
    # suffix_array's per-doc sa_rank window is doc-keyed
    "exact_substr_spans", "suffix_array_ranks", "exact_substr_dedup",
]

# deliberate broadcast nested-loop shapes: tiny broadcast side by design
# (8 centroids / block-pair triangle / broadcast query set)
BNLJ_OK = [
    "ann_ivf", "cosine_topk", "embedding_near_dup", "kmeans_assign",
    # semantic_near_dup embeds kmeans_assign's broadcast-centroid BNLJ;
    # its pair stage is an equi join on the cluster id
    "semantic_near_dup",
    # prototype_prune embeds the same broadcast-centroid BNLJ assignment
    "prototype_prune",
    # hard-negative mining embeds the broadcast-centroid BNLJ cell
    # assignment; its candidate stage is an equi join on the cell id
    "hard_negatives",
    # pagerank broadcasts the 1-row dangling-mass aggregate each iteration
    "graph_pagerank",
    # LID fans per-doc bucket counts out by the broadcast lang dimension
    # (n_langs rows) — a BNLJ by design; its doc-count total is the
    # 1-row scalar-agg shape
    "langid_predict", "langid_scores",
]


def _plan(spark, name: str) -> str:
    df = em.queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(spark, name: str) -> str:
    df = em.queries()[name](spark, SF)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_inventory_is_fully_classified():
    assert sorted(CLEAN + DISPATCHED + BNLJ_OK + SCALAR_AGG_OK) == sorted(
        em.queries()
    )


@pytest.mark.parametrize("name", CLEAN)
def test_no_scale_red_flags(spark, name):
    plan = _plan(spark, name)
    assert "SinglePartition" not in plan, f"{name}: single-partition exchange"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    assert "BroadcastNestedLoopJoin" not in plan, f"{name}: BNLJ"


@pytest.mark.parametrize("name", DISPATCHED + BNLJ_OK + SCALAR_AGG_OK)
def test_no_row_python_anywhere(spark, name):
    # even the dispatched / BNLJ-by-design queries must never fall back to
    # row-at-a-time Python evaluation
    assert "BatchEvalPython" not in _plan(spark, name), name


def test_pricing_summary_pushdown_prune_partial_agg(spark):
    plan = _formatted(spark, "pricing_summary")
    # the shipdate predicate reaches the parquet scan
    assert "PushedFilters" in plan
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "l_shipdate" in pushed, pushed
    # column pruning: untouched columns never leave the scan
    sch = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    for col in ("l_partkey", "l_suppkey", "l_tax"):
        assert col not in sch, sch
    # partial (map-side) + final aggregation
    assert plan.count("HashAggregate") >= 2
    # whole-stage codegen spans: visible in the AQE FINAL plan ("*(n)" spans)
    df = em.queries()["pricing_summary"](spark, SF)
    df.collect()
    assert "*(" in df._jdf.queryExecution().executedPlan().toString()


def test_revenue_by_nation_broadcasts_all_dims(spark):
    plan = _plan(spark, "revenue_by_nation")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan or plan.count("BroadcastHashJoin") >= 3
    fmt = _formatted(spark, "revenue_by_nation")
    sch = [
        l for l in fmt.splitlines() if "ReadSchema" in l and "lineitem" not in l
    ]
    # lineitem scan reads only the join key + measures
    li_sch = [l for l in fmt.splitlines() if "l_orderkey" in l and "ReadSchema" in l]
    assert li_sch and "l_shipdate" not in li_sch[0], li_sch
    _ = sch


def test_semi_anti_join_strategies(spark):
    assert "LeftSemi" in _plan(spark, "semi_join")
    assert "LeftAnti" in _plan(spark, "anti_join")


def test_range_join_is_equi_bucketed(spark):
    # the bucketed range join must plan as an equi join (hash/sort-merge),
    # never a nested-loop over the raw inequality predicate
    plan = _plan(spark, "range_join_count")
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    )


def test_corpus_ops_broadcast_their_dimension_sides(spark):
    # decontaminate: the benchmark n-gram set is broadcast (never a shuffle
    # of the corpus against it); lm_score: vocab + corpus scalars broadcast
    for name in ("decontaminate", "lm_score"):
        plan = _plan(spark, name)
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name


def test_kmeans_assign_broadcasts_centroids(spark):
    # the k-row centroid side rides a broadcast exchange; the corpus side
    # is map-side only up to the final per-id argmin aggregate
    plan = _plan(spark, "kmeans_assign")
    assert "BroadcastExchange" in plan
    # partial + final argmin (struct-min plans as SortAggregate)
    assert plan.count("Aggregate") >= 2 and "partial_min" in plan


def test_stratified_sample_filters_before_aggregate(spark):
    # the keep/drop decision is a map-side predicate under the aggregate —
    # no join, no extra shuffle beyond the final per-stratum agg
    plan = _plan(spark, "stratified_sample")
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2  # agg shuffle (+AQE read), nothing else


def test_windows_are_partitioned(spark):
    # sessionization / per-group running totals keep their windows keyed
    for name in ("sessionize", "running_total", "topk_per_group", "value_segments"):
        plan = _plan(spark, name)
        assert "SinglePartition" not in plan, name


def test_winsorize_broadcasts_stats_no_second_shuffle(spark):
    # the percentile stats table rides a broadcast; the clamp itself adds
    # no exchange — the only shuffles are the grouped stats aggregate
    plan = _plan(spark, "winsorize")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_minimizer_signature_map_precedes_only_shuffle(spark):
    # signatures: the k-mer hash + window-min map is a projection; the
    # only exchanges are the parallelism repartition and the doc-keyed
    # aggregate — no join anywhere
    plan = _plan(spark, "minimizer_sigs")
    assert "Join" not in plan
    assert "SinglePartition" not in plan


def test_minimizer_pairs_exchange_budget(spark):
    # the bucket self-join is an equi join on the minimizer value; both
    # branches hash-partition on the SAME key below the join, so AQE
    # dedupes the expensive signature-map stage at runtime (stage cache
    # keys on the canonical subplan — ReusedExchange never prints under
    # AQE, so the static assertions are the join shape + the exchange
    # budget: 2x(repartition + minimizer) + the final pair aggregate)
    plan = _plan(spark, "minimizer_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan  # an EQUI join (broadcast at toy size is fine)
    assert plan.count("Exchange hashpartitioning") <= 5


def test_quantile_bins_rank_is_bucketized(spark):
    # the two-phase rank buckets on literal boundaries (no range
    # exchange, no persisted cache); the data-bearing window is
    # bucket-keyed, and the NTILE total is a broadcast scalar off the
    # <= n-row stats branch — never an ntile window over the data
    plan = _plan(spark, "quantile_bins")
    assert "rangepartitioning" not in plan
    assert "windowspecdefinition(_ord_pid" in plan
    assert "ntile" not in plan.lower()  # arithmetic, not a global window
