"""Hard-negative mining for contrastive / retrieval training data.

Beyond-reference operator (driver north star: large-scale training-data
pipeline). Dense-retriever and embedding-model training (DPR, Karpukhin
et al. 2020; ANCE, Xiong et al. 2021) needs, for every query/anchor, the
most similar corpus items that are NOT true matches — "hard" negatives.
At 100 TB the all-pairs scan is off the table; the standard production
shape is the same inverted-file (IVF) coarse quantizer the ANN search
path uses: assign the corpus to cells once, probe each query's
``n_probe`` nearest cells, score only those candidates.

Scale design:

- the coarse quantizer (``centroids``) is dimension-sized (k rows) and
  BROADCAST; cell assignment is map-side (one min-struct aggregate per
  side, no shuffle of vector data beyond the cell equi-join);
- the candidate join is an EQUI-join on cell id — each query touches
  ~``n_probe / n_cells`` of the corpus, never all of it;
- the per-query top-k is one hash-partitioned ``row_number`` window
  (per-query state only);
- ``max_sim`` (the ANCE false-negative guard: candidates almost
  identical to the anchor are likely unlabeled positives) and
  ``min_sim`` (skip easy negatives) are map-side predicates applied
  BEFORE the window.

``centroids=None`` is the documented small-side exact path: queries are
broadcast against the full corpus (the ``brute_force_topk`` shape) — use
only when the query set is dimension-sized.

Determinism: similarities are computed with the fixed-order float64 fold
(``cosine_double_expr``) so results are bit-reproducible cross-engine;
ties break on candidate id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pylluminator_spark.operators.similarity import (
    cosine_double_expr,
    sq_dist_expr,
)


def _assign_cells(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str,
    id_col: str,
    centroid_id_col: str,
    centroid_vec_col: str,
    n_probe: int,
) -> DataFrame:
    """(id, cell) pairs: each row's ``n_probe`` nearest centroids by
    squared L2 (ties on centroid id). One broadcast BNLJ + one
    aggregate — no window, no shuffle of the vectors beyond the
    aggregate's own exchange.

    ``n_probe == 1`` (the whole corpus side, and the common query
    default) dispatches to a streaming ``min(struct)`` partial
    aggregate — constant state per group with map-side combine, the
    ``kmeans_assign`` discipline. Multi-probe keeps the
    sort_array(collect_list) top-``n_probe`` slice: state is O(k) per
    row, bounded by the dimension-sized centroid count."""
    cand = df.select(id_col, vec_col).crossJoin(F.broadcast(centroids))
    dist = sq_dist_expr(F.col(vec_col), F.col(centroid_vec_col))
    keyed = cand.select(
        id_col,
        F.struct(
            dist.alias("dist"), F.col(centroid_id_col).alias("cid")
        ).alias("_c"),
    )
    if n_probe == 1:
        return (
            keyed.groupBy(id_col)
            .agg(F.min("_c").alias("_best1"))
            .select(id_col, F.col("_best1.cid").alias("cell"))
        )
    per_id = keyed.groupBy(id_col).agg(
        F.slice(
            F.sort_array(F.collect_list("_c")), 1, n_probe
        ).alias("_best")
    )
    return per_id.select(id_col, F.explode("_best.cid").alias("cell"))


def hard_negative_mining(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    *,
    centroids: DataFrame | None = None,
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_id: str = "query_id",
    centroid_id_col: str = "cid",
    centroid_vec_col: str = "cvec",
    min_sim: float | None = None,
    max_sim: float | None = None,
) -> DataFrame:
    """Top-``k`` hard negatives per query: the most cosine-similar corpus
    rows whose ``label_col`` DIFFERS from the query's (and whose id
    differs — an anchor is never its own negative).

    ``centroids`` (k rows: ``centroid_id_col``, ``centroid_vec_col``)
    selects the IVF scale path: corpus rows live in their 1 nearest cell,
    queries probe their ``n_probe`` nearest cells. ``None`` broadcasts
    the queries against the whole corpus (exact; small query sets only).

    Returns (query_id, id_col, similarity, rank) — rank 1 = hardest.

    NULL labels: SQL three-valued logic makes ``NULL != x`` NULL, so a
    NULL-labeled candidate is never a negative and a NULL-labeled query
    yields no rows. Filter or impute labels upstream if NULL should
    mean "unlabeled, usable as negative".
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_probe < 1:
        # n_probe=0 would make the multi-probe slice silently empty --
        # every query would get zero candidates instead of an error
        raise ValueError(f"n_probe must be >= 1, got {n_probe}")
    q = queries.select(
        F.col(query_id),
        F.col(vec_col).alias("_qv"),
        F.col(label_col).alias("_ql"),
    )
    c = corpus.select(
        F.col(id_col),
        F.col(vec_col).alias("_cv"),
        F.col(label_col).alias("_cl"),
    )
    if centroids is None:
        cand = F.broadcast(q).crossJoin(c)
    else:
        q_cells = _assign_cells(
            queries, centroids, vec_col, query_id,
            centroid_id_col, centroid_vec_col, n_probe,
        )
        c_cells = _assign_cells(
            corpus, centroids, vec_col, id_col,
            centroid_id_col, centroid_vec_col, 1,
        )
        # corpus rows live in exactly ONE cell, so a (query, candidate)
        # pair arises from exactly one corpus cell even under
        # multi-probe — no post-join dedup needed
        cand = (
            q.join(q_cells, query_id)
            .join(c_cells, "cell")
            .join(c, id_col)
        )
    sim = cosine_double_expr(F.col("_qv"), F.col("_cv"))
    cand = (
        cand.filter(F.col(query_id) != F.col(id_col))
        .filter(F.col("_ql") != F.col("_cl"))
        .withColumn("similarity", sim)
    )
    if min_sim is not None:
        cand = cand.filter(F.col("similarity") >= min_sim)
    if max_sim is not None:
        cand = cand.filter(F.col("similarity") <= max_sim)
    w = Window.partitionBy(query_id).orderBy(
        F.col("similarity").desc(), F.col(id_col).asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, id_col, "similarity", "rank")
    )
