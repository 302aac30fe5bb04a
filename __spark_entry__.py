"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship methylation-beta pipeline on sf0.001.
``queries()`` exposes one callable per implemented operator from SURVEY §2
(plus the beyond-reference training-data operators); ``oracle_sql()`` gives
the DuckDB-equivalent SQL for each.

Cross-engine float determinism: aggregates over doubles are computed with
integer-scaled sums (``CAST(ROUND(x*100) AS BIGINT)``) so Spark and DuckDB
produce bit-identical results regardless of accumulation order; per-row
derived floats are rounded identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pylluminator_spark.functions.methyl import beta_expr, beta_to_m_expr, meth_unmeth_exprs
from pylluminator_spark.functions.stats import bh_adjust
from pylluminator_spark.functions.text import (
    mean_token_length_expr,
    punct_ratio_expr,
    token_count_expr,
    tokens_expr,
)
from pylluminator_spark.operators.similarity import cosine_expr

SF0001 = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from pylluminator_spark.datasets import load_table

    return load_table(spark, sf_dir, name)


def _cents(col: F.Column, scale: int = 100) -> F.Column:
    """Exact integer-scaled representation for deterministic sums."""
    return F.round(col * scale).cast("long")


# ---------------------------------------------------------------------------
# Synthetic methylation signal derived deterministically from lineitem. The
# same derivation is written in each oracle's CTE so both engines compute on
# identical rows. Maps the FIXTURES §4 semi-wide signal schema onto TPC-H.
# ---------------------------------------------------------------------------

_SIGNAL_CTE = """
signal AS (
  SELECT
    l_orderkey * 10 + l_linenumber          AS probe_id,
    CASE WHEN l_partkey % 3 = 0 THEN 'I' ELSE 'II' END AS type,
    CASE WHEN l_suppkey % 2 = 0 THEN 'G' ELSE 'R' END  AS channel,
    CAST(l_suppkey % 6 AS VARCHAR)          AS sample,
    l_extendedprice                         AS mg,
    l_extendedprice * (1 - l_discount)      AS mr,
    l_quantity * 100.0                      AS ug,
    l_quantity * 100.0 + l_tax * 1000.0     AS ur
  FROM lineitem
)
"""


def _signal_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("probe_id"),
        F.when(F.col("l_partkey") % 3 == 0, "I").otherwise("II").alias("type"),
        F.when(F.col("l_suppkey") % 2 == 0, "G").otherwise("R").alias("channel"),
        (F.col("l_suppkey") % 6).cast("string").alias("sample"),
        F.col("l_extendedprice").alias("mg"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("mr"),
        (F.col("l_quantity") * 100.0).alias("ug"),
        (F.col("l_quantity") * 100.0 + F.col("l_tax") * 1000.0).alias("ur"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synthetic signal -> beta values -> per-sample distribution
    aggregates (the reference's canonical preprocessing query, SURVEY §3.2)."""
    signal = _signal_df(spark, SF0001)
    meth, unmeth = meth_unmeth_exprs(include_out_of_band=False)
    betas = signal.withColumn("beta", beta_expr(meth, unmeth))
    return (
        betas.groupBy("sample")
        .agg(
            F.count("beta").alias("n_probes"),
            F.round(F.avg("beta"), 6).alias("mean_beta"),
            F.sum(F.when(F.col("beta") < 0.3, 1).otherwise(0)).alias("n_hypo"),
            F.sum(F.when(F.col("beta") > 0.7, 1).otherwise(0)).alias("n_hyper"),
        )
        .orderBy("sample")
    )


# ---------------------------------------------------------------------------
# Relational operator queries (SURVEY §2) with DuckDB oracles
# ---------------------------------------------------------------------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/A11-style scan+filter+groupBy aggregate (TPC-H Q1 shape)."""
    li = _t(spark, sf_dir, "lineitem")
    out = (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_cents(F.col("l_quantity"))).alias("_qty_c"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("_base_c"),
            F.sum(
                _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)
            ).alias("_disc_c"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            (F.col("_qty_c").cast("double") / 100).alias("sum_qty"),
            (F.col("_base_c").cast("double") / 100).alias("sum_base_price"),
            (F.col("_disc_c").cast("double") / 10000).alias("sum_disc_price"),
            (F.col("_qty_c").cast("double") / 100 / F.col("count_order")).alias(
                "avg_qty"
            ),
            "count_order",
        )
    )
    return out


ORACLE_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS DOUBLE)/100 AS sum_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100 AS sum_base_price,
       CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*10000) AS BIGINT)) AS DOUBLE)/10000 AS sum_disc_price,
       CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS DOUBLE)/100/COUNT(*) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1-style fact-dim join chain with broadcast dims (TPC-H Q5 shape)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            F.sum(
                _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)
            ).alias("_rev_c"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            "n_name",
            "r_name",
            (F.col("_rev_c").cast("double") / 10000).alias("revenue"),
            "n_items",
        )
    )


ORACLE_REVENUE_NATION = """
SELECT n_name, r_name,
       CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*10000) AS BIGINT)) AS DOUBLE)/10000 AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY n_name, r_name
"""


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 — global top-k with deterministic tie-break."""
    orders = _t(spark, sf_dir, "orders")
    by_cust = orders.groupBy("o_custkey").agg(
        F.sum(_cents(F.col("o_totalprice"))).alias("_rev_c"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return (
        by_cust.orderBy(F.col("_rev_c").desc(), F.col("o_custkey").asc())
        .limit(10)
        .select(
            "o_custkey",
            (F.col("_rev_c").cast("double") / 100).alias("revenue"),
            "n_orders",
        )
    )


ORACLE_TOP_CUSTOMERS = """
SELECT o_custkey,
       CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100 AS revenue,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_custkey
ORDER BY SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) DESC, o_custkey ASC
LIMIT 10
"""


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 — per-group top-k via row_number window."""
    part = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey").asc()
    )
    return (
        part.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "p_brand",
            "p_partkey",
            F.round(F.col("p_retailprice"), 2).alias("price"),
            "rnk",
        )
    )


ORACLE_TOPK_PER_GROUP = """
SELECT p_brand, p_partkey, ROUND(p_retailprice, 2) AS price, rnk
FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         ROW_NUMBER() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey ASC) AS rnk
  FROM part
) t WHERE rnk <= 3
"""


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join idiom (J12 / EXISTS)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    active = cust.join(
        orders.select("o_custkey").distinct(),
        cust.c_custkey == F.col("o_custkey"),
        "left_semi",
    )
    return active.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


ORACLE_SEMI_JOIN = """
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join idiom (P14 / NOT EXISTS): parts never ordered."""
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    never = part.join(
        li.select("l_partkey").distinct(),
        part.p_partkey == F.col("l_partkey"),
        "left_anti",
    )
    return never.groupBy("p_brand").agg(F.count(F.lit(1)).alias("n_unsold"))


ORACLE_ANTI_JOIN = """
SELECT p_brand, COUNT(*) AS n_unsold
FROM part
WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
GROUP BY p_brand
"""


def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7 — per-customer running order total (exact integer window sum)."""
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        (
            F.sum(_cents(F.col("o_totalprice"))).over(w).cast("double") / 100
        ).alias("running_total"),
    )


ORACLE_RUNNING_TOTAL = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))
            OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate ASC, o_orderkey ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)/100
         AS running_total
FROM orders
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/J10 — gaps-and-islands sessionization of the events stream
    (30-minute inactivity gap), the batch analogue of session windows."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    gap_us = 30 * 60 * 1_000_000
    with_flag = ev.withColumn("_us", F.unix_micros(F.col("ts"))).withColumn(
        "_new",
        F.when(
            F.col("_us") - F.lag("_us").over(w) > gap_us, 1
        ).otherwise(0),
    )
    with_sid = with_flag.withColumn(
        "session_id",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return with_sid.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.floor((F.max("_us") - F.min("_us")) / 1_000_000).alias("duration_sec"),
    )


ORACLE_SESSIONIZE = """
WITH flagged AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), sessions AS (
  SELECT user_id, us,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY us ASC, event_id ASC
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM flagged
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       (MAX(us) - MIN(us)) // 1000000 AS duration_sec
FROM sessions GROUP BY user_id, session_id
"""


def q_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation over the event stream (batch equivalent of
    the streaming surface; hourly windows)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn(
            "window_start",
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss"),
        )
        .groupBy("window_start", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.sum(_cents(F.col("value"))).cast("double") / 100
            ).alias("sum_value"),
        )
    )


ORACLE_EVENT_WINDOWS = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS DOUBLE)/100 AS sum_value
FROM events GROUP BY 1, 2
"""


def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A21 — distinct + count-distinct aggregates."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


ORACLE_DISTINCT_AGG = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
FROM events GROUP BY event_type
"""


def q_median_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15 — exact percentile/median per group."""
    part = _t(spark, sf_dir, "part")
    return part.groupBy("p_brand").agg(
        F.round(F.expr("percentile(p_retailprice, 0.5)"), 4).alias("median_price"),
        F.round(F.expr("percentile(p_retailprice, 0.25)"), 4).alias("q1_price"),
        F.round(F.expr("percentile(p_retailprice, 0.75)"), 4).alias("q3_price"),
    )


ORACLE_MEDIAN_BY_BRAND = """
SELECT p_brand,
       ROUND(quantile_cont(p_retailprice, 0.5), 4) AS median_price,
       ROUND(quantile_cont(p_retailprice, 0.25), 4) AS q1_price,
       ROUND(quantile_cont(p_retailprice, 0.75), 4) AS q3_price
FROM part GROUP BY p_brand
"""


def q_beta_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 — methylation beta computation (clip(M,1)/clip(M+U,2)) with the
    type-II zero-fill rules, on the synthetic signal (reference
    samples.py:1074-1108)."""
    signal = _signal_df(spark, sf_dir)
    meth, unmeth = meth_unmeth_exprs(include_out_of_band=False)
    return signal.select(
        "probe_id",
        "sample",
        F.round(beta_expr(meth, unmeth), 6).alias("beta"),
    )


ORACLE_BETA_VALUES = f"""
WITH {_SIGNAL_CTE}
SELECT probe_id, sample,
       ROUND(GREATEST(m, 1.0) / GREATEST(m + u, 2.0), 6) AS beta
FROM (
  SELECT probe_id, sample,
         CASE WHEN type = 'II' THEN mg
              WHEN channel = 'G' THEN mg ELSE mr END AS m,
         CASE WHEN type = 'II' THEN ur
              WHEN channel = 'G' THEN ug ELSE ur END AS u
  FROM signal
) t
"""


def q_m_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 — M-value transform log2((beta+eps)/(1-beta-eps))
    (reference samples.py:1200-1227)."""
    signal = _signal_df(spark, sf_dir)
    meth, unmeth = meth_unmeth_exprs(include_out_of_band=False)
    betas = signal.select(
        "probe_id", "sample", beta_expr(meth, unmeth).alias("beta")
    )
    return betas.select(
        "probe_id",
        "sample",
        F.round(beta_to_m_expr(F.col("beta")), 6).alias("m_value"),
    )


ORACLE_M_VALUES = f"""
WITH {_SIGNAL_CTE},
betas AS (
  SELECT probe_id, sample,
         GREATEST(m, 1.0) / GREATEST(m + u, 2.0) AS beta
  FROM (
    SELECT probe_id, sample,
           CASE WHEN type = 'II' THEN mg
                WHEN channel = 'G' THEN mg ELSE mr END AS m,
           CASE WHEN type = 'II' THEN ur
                WHEN channel = 'G' THEN ug ELSE ur END AS u
    FROM signal
  ) t
)
SELECT probe_id, sample,
       ROUND(log2((beta + 1e-8) / (1 - (beta + 1e-8))), 6) AS m_value
FROM betas
"""


def q_bh_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14/K11 — Benjamini-Hochberg FDR adjustment as window math
    (reference dm.py:475-477). Synthetic p-values from orders."""
    orders = _t(spark, sf_dir, "orders")
    pvals = orders.select(
        F.col("o_orderkey").alias("test_id"),
        (((F.col("o_orderkey") * 7919) % 9973) / 9973.0).alias("p_value"),
    )
    adjusted = bh_adjust(pvals, "p_value", out_col="p_adj")
    return adjusted.select(
        "test_id",
        F.round("p_value", 8).alias("p_value"),
        F.round("p_adj", 8).alias("p_adj"),
    )


ORACLE_BH_ADJUST = """
WITH pvals AS (
  SELECT o_orderkey AS test_id,
         ((o_orderkey * 7919) % 9973) / 9973.0 AS p_value
  FROM orders
), ranked AS (
  SELECT test_id, p_value,
         ROW_NUMBER() OVER (ORDER BY p_value ASC) AS rnk,
         COUNT(*) OVER () AS n
  FROM pvals
)
SELECT test_id, ROUND(p_value, 8) AS p_value,
       ROUND(LEAST(1.0, MIN(p_value * n / rnk)
                         OVER (ORDER BY p_value DESC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             8) AS p_adj
FROM ranked
"""


def q_mask_nullout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11 — mask application as join + null-out, then null-aware aggregates
    (reference samples.py:577-602): mask = small parts (p_size < 10)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    mask = part.filter(F.col("p_size") < 10).select("p_partkey").withColumn(
        "_m", F.lit(True)
    )
    masked = li.join(F.broadcast(mask), li.l_partkey == mask.p_partkey, "left")
    nulled = masked.withColumn(
        "price_masked",
        F.when(F.col("_m"), F.lit(None)).otherwise(F.col("l_extendedprice")),
    )
    return nulled.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("price_masked").alias("n_unmasked"),
        (
            F.sum(_cents(F.col("price_masked"))).cast("double") / 100
        ).alias("sum_unmasked"),
    )


ORACLE_MASK_NULLOUT = """
WITH masked AS (
  SELECT l_returnflag,
         CASE WHEN p.p_partkey IS NOT NULL THEN NULL
              ELSE l_extendedprice END AS price_masked
  FROM lineitem
  LEFT JOIN (SELECT p_partkey FROM part WHERE p_size < 10) p
         ON l_partkey = p.p_partkey
)
SELECT l_returnflag, COUNT(*) AS n_rows,
       COUNT(price_masked) AS n_unmasked,
       CAST(SUM(CAST(ROUND(price_masked*100) AS BIGINT)) AS DOUBLE)/100 AS sum_unmasked
FROM masked GROUP BY l_returnflag
"""


def q_merge_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A4 — type-dispatched group merge (merge_samples_by, reference
    samples.py:604-664 + utils.py:516-564): numeric -> mean, string ->
    ';'-joined sorted distinct."""
    cust = _t(spark, sf_dir, "customer")
    return cust.groupBy("c_nationkey").agg(
        (
            F.sum(_cents(F.col("c_acctbal"))).cast("double")
            / 100
            / F.count(F.lit(1))
        ).alias("avg_acctbal"),
        F.array_join(
            F.array_sort(F.collect_set("c_mktsegment")), ";"
        ).alias("segments"),
        F.count(F.lit(1)).alias("n_customers"),
    )


ORACLE_MERGE_BY_GROUP = """
SELECT c_nationkey,
       CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS DOUBLE)/100/COUNT(*) AS avg_acctbal,
       array_to_string(list_sort(list(DISTINCT c_mktsegment)), ';') AS segments,
       COUNT(*) AS n_customers
FROM customer GROUP BY c_nationkey
"""


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on normalized text: keep lowest doc_id per content
    (beyond-reference training-data operator)."""
    docs = _t(spark, sf_dir, "documents")
    normalized = docs.withColumn(
        "_norm", F.array_join(tokens_expr(F.lower(F.col("text"))), " ")
    )
    keep = normalized.groupBy("_norm").agg(
        F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies")
    )
    return keep.select("doc_id", "n_copies")


ORACLE_DEDUP_EXACT = r"""
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
FROM (
  SELECT doc_id,
         array_to_string(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                     x -> x != ''), ' ') AS norm
  FROM documents
) t
GROUP BY norm
"""


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: token counting + quality metrics per document."""
    docs = _t(spark, sf_dir, "documents")
    toks = tokens_expr(F.col("text"))
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        token_count_expr(F.col("text")).alias("n_tokens"),
        F.round(mean_token_length_expr(toks), 6).alias("mean_token_len"),
        F.round(punct_ratio_expr(F.col("text")), 6).alias("punct_ratio"),
    )


ORACLE_TOKEN_STATS = r"""
SELECT doc_id,
       LENGTH(text) AS n_chars,
       len(list_filter(regexp_split_to_array(text, '\s+'), x -> x != '')) AS n_tokens,
       ROUND(list_sum(list_transform(list_filter(regexp_split_to_array(text, '\s+'),
                                                 x -> x != ''),
                                     x -> LENGTH(x)))
             / GREATEST(len(list_filter(regexp_split_to_array(text, '\s+'),
                                        x -> x != '')), 1) * 1.0, 6) AS mean_token_len,
       ROUND(LENGTH(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))
             / GREATEST(LENGTH(text), 1) * 1.0, 6) AS punct_ratio
FROM documents
"""


def q_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language profiling: per-language doc counts and mean token counts."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.withColumn("_n_tok", token_count_expr(F.col("text")))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (
                F.sum("_n_tok").cast("double") / F.count(F.lit(1))
            ).alias("avg_tokens"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


ORACLE_LANG_PROFILE = r"""
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(len(list_filter(regexp_split_to_array(text, '\s+'), x -> x != ''))) AS DOUBLE)
         / COUNT(*) AS avg_tokens,
       SUM(n_chars) AS total_chars
FROM documents GROUP BY lang
"""


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search — brute-force cosine top-5 neighbors for the first
    five vectors (similarity rounded before ranking for determinism)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("_q")
    )
    corpus = emb.select(
        F.col("vec_id"), F.col("embedding").alias("_c")
    )
    sim = F.round(
        cosine_expr(
            F.col("_q").cast("array<double>"), F.col("_c").cast("array<double>")
        ),
        6,
    )
    scored = (
        F.broadcast(queries)
        .crossJoin(corpus)
        .filter(F.col("query_id") != F.col("vec_id"))
        .withColumn("similarity", sim)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("similarity").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "vec_id", "similarity", "rank")
    )


ORACLE_COSINE_TOPK = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5
), scored AS (
  SELECT q.query_id, e.vec_id,
         ROUND(list_dot_product(CAST(q.qv AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
               / (sqrt(list_dot_product(CAST(q.qv AS DOUBLE[]), CAST(q.qv AS DOUBLE[])))
                  * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                          CAST(e.embedding AS DOUBLE[])))), 6)
           AS similarity
  FROM q CROSS JOIN embeddings e
  WHERE q.query_id != e.vec_id
)
SELECT query_id, vec_id, similarity, rank FROM (
  SELECT query_id, vec_id, similarity,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY similarity DESC, vec_id ASC) AS rank
  FROM scored
) t WHERE rank <= 5
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pricing_summary": q_pricing_summary,
        "revenue_by_nation": q_revenue_by_nation,
        "top_customers": q_top_customers,
        "topk_per_group": q_topk_per_group,
        "semi_join": q_semi_join,
        "anti_join": q_anti_join,
        "running_total": q_running_total,
        "sessionize": q_sessionize,
        "event_windows": q_event_windows,
        "distinct_agg": q_distinct_agg,
        "median_by_brand": q_median_by_brand,
        "beta_values": q_beta_values,
        "m_values": q_m_values,
        "bh_adjust": q_bh_adjust,
        "mask_nullout": q_mask_nullout,
        "merge_by_group": q_merge_by_group,
        "dedup_exact": q_dedup_exact,
        "token_stats": q_token_stats,
        "lang_profile": q_lang_profile,
        "cosine_topk": q_cosine_topk,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "pricing_summary": ORACLE_PRICING,
        "revenue_by_nation": ORACLE_REVENUE_NATION,
        "top_customers": ORACLE_TOP_CUSTOMERS,
        "topk_per_group": ORACLE_TOPK_PER_GROUP,
        "semi_join": ORACLE_SEMI_JOIN,
        "anti_join": ORACLE_ANTI_JOIN,
        "running_total": ORACLE_RUNNING_TOTAL,
        "sessionize": ORACLE_SESSIONIZE,
        "event_windows": ORACLE_EVENT_WINDOWS,
        "distinct_agg": ORACLE_DISTINCT_AGG,
        "median_by_brand": ORACLE_MEDIAN_BY_BRAND,
        "beta_values": ORACLE_BETA_VALUES,
        "m_values": ORACLE_M_VALUES,
        "bh_adjust": ORACLE_BH_ADJUST,
        "mask_nullout": ORACLE_MASK_NULLOUT,
        "merge_by_group": ORACLE_MERGE_BY_GROUP,
        "dedup_exact": ORACLE_DEDUP_EXACT,
        "token_stats": ORACLE_TOKEN_STATS,
        "lang_profile": ORACLE_LANG_PROFILE,
        "cosine_topk": ORACLE_COSINE_TOPK,
    }
