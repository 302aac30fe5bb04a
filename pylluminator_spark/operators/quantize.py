"""Product quantization (PQ) for embedding compression at corpus scale.

Beyond-reference operator (driver north star): a 100 TB multimodal corpus
carries billions of float embeddings; PQ (Jegou, Douze, Schmid, "Product
Quantization for Nearest Neighbor Search", TPAMI 2011) compresses each
vector to ``m`` one-byte codes by splitting it into ``m`` subvectors and
vector-quantizing each against its own k-centroid codebook — a 64-dim
float32 vector (256 B) becomes 8 codes (8 B) at ~32x compression, and
asymmetric distance computation over codes powers IVF-PQ ANN search.

Scale design mirrors operators.similarity's k-means:

- **Training** (`pq_train`) runs Lloyd for ALL subspaces jointly: the
  corpus explodes to (id, sub_id, subvec) once, each iteration is one
  Arrow-batched map-side assignment + one (sub_id, code)-keyed hash
  aggregate; only the m x k x dsub codebook tensor reaches the driver.
- **Encoding** (`pq_encode`) is map-side only — codebooks are
  dimension-sized and broadcast; no shuffle at any corpus size. The
  ``expr`` path is a fixed-order float64 fold (bit-reproducible across
  engines — what the cross-engine gate checks); the ``arrow`` path is the
  vectorized production path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pylluminator_spark.operators.similarity import sq_dist_expr


def _qid(name: str) -> str:
    """Backtick-quoted SQL identifier with embedded backticks doubled —
    the generated-SQL paths interpolate caller-supplied column names, so
    a name containing a backtick must not break (or worse, re-shape) the
    parsed expression."""
    return "`" + name.replace("`", "``") + "`"


def subvector_expr(vec: Column, sub_id: int, dsub: int) -> Column:
    """The ``sub_id``-th length-``dsub`` slice of a vector (1-based slice)."""
    return F.slice(vec, sub_id * dsub + 1, dsub)


def _collect_codebooks(codebooks: DataFrame) -> dict[int, list[tuple[int, list[float]]]]:
    """codebooks DF (sub_id, cid, cvec) -> {sub_id: [(cid, vec), ...]} with
    cids sorted. Dimension-sized (m*k rows) by construction."""
    books: dict[int, list[tuple[int, list[float]]]] = {}
    for r in codebooks.select("sub_id", "cid", "cvec").collect():
        books.setdefault(int(r["sub_id"]), []).append(
            (int(r["cid"]), [float(x) for x in r["cvec"]])
        )
    for s in books:
        books[s].sort()
    return books


def pq_encode(
    df: DataFrame,
    codebooks: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    method: str = "expr",
) -> DataFrame:
    """Encode each vector to its PQ codes: per subspace, the id of the
    nearest codebook centroid (ties to the smaller cid). Returns
    (id, codes array<long>, recon_err double) where ``recon_err`` is the
    total squared reconstruction error (the sum of per-subspace best
    distances).

    ``method="expr"`` builds pure column expressions with fixed-order
    float64 folds (cross-engine bit parity; interpreted-lambda cost, fine
    for moderate m*k*dsub). ``method="arrow"`` runs one vectorized numpy
    pass per Arrow batch — the corpus-scale path."""
    books = _collect_codebooks(codebooks)
    subs = sorted(books)
    if not subs:
        raise ValueError("pq_encode: empty codebooks")
    dsub = len(books[subs[0]][0][1])

    if method == "arrow":
        import numpy as np
        import pandas as pd

        C = np.array(
            [[v for _, v in books[s]] for s in subs], dtype=np.float64
        )  # [m, k, dsub]
        cids = np.array([[c for c, _ in books[s]] for s in subs])  # [m, k]
        m = len(subs)

        def encode(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.array(
                    [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
                ).reshape(len(pdf), m, dsub)
                codes = np.empty((len(pdf), m), dtype=np.int64)
                err = np.zeros(len(pdf))
                for s in range(m):
                    d = (
                        (X[:, s, :] ** 2).sum(axis=1)[:, None]
                        - 2.0 * (X[:, s, :] @ C[s].T)
                        + (C[s] ** 2).sum(axis=1)
                    )
                    best = d.argmin(axis=1)
                    codes[:, s] = cids[s][best]
                    err += np.maximum(d[np.arange(len(best)), best], 0.0)
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col].to_numpy(),
                        "codes": list(codes),
                        "recon_err": err,
                    }
                )

        id_type = df.schema[id_col].dataType.simpleString()
        return (
            df.select(id_col, vec_col)
            .filter(F.col(vec_col).isNotNull())
            .mapInPandas(
                encode,
                schema=f"{_qid(id_col)} {id_type}, codes array<long>, "
                "recon_err double",
            )
        )

    # the whole per-subspace nearest-centroid expression is generated as
    # ONE SQL string: the same tree built from Column objects costs
    # m*k*(dsub+constant) py4j round-trips (~3.8 s for 2x16x32 measured
    # at sf0.1 — 20x the job it plans). The SQL parses to the identical
    # Catalyst expressions as subvector_expr/sq_dist_expr (same zip_with
    # double-cast square, same left-associative aggregate from 0.0D), so
    # bit parity with the unrolled-sum oracles is unchanged.
    out = df
    for s in subs:
        sub_sql = f"slice({_qid(vec_col)}, {s * dsub + 1}, {dsub})"
        cands = []
        for cid, cvec in books[s]:
            arr = "array(" + ", ".join(
                f"CAST({float(x)!r} AS DOUBLE)" for x in cvec
            ) + ")"
            dist = (
                f"aggregate(zip_with({sub_sql}, {arr}, (x, y) -> "
                "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * "
                "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
                "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
            )
            cands.append(
                f"named_struct('d', {dist}, 'c', CAST({int(cid)} AS BIGINT))"
            )
        out = out.withColumn(
            f"_pq_best_{s}", F.expr(f"array_min(array({', '.join(cands)}))")
        )
    err = None
    for s in subs:
        d = F.col(f"_pq_best_{s}")["d"]
        err = d if err is None else err + d
    return out.select(
        id_col,
        F.array(*[F.col(f"_pq_best_{s}")["c"] for s in subs]).alias("codes"),
        err.alias("recon_err"),
    )


def pq_train(
    df: DataFrame,
    m: int,
    k: int,
    *,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Train PQ codebooks: Lloyd's k-means independently per subspace, run
    JOINTLY — one exploded (id, sub_id, subvec) frame, one Arrow-batched
    assignment + one hash aggregate per iteration for all m subspaces at
    once. Deterministic key-hash seeding (same contract as
    similarity.kmeans_fit). Returns (sub_id, cid, cvec)."""
    import numpy as np

    spark = df.sparkSession
    probe = df.select(vec_col).filter(F.col(vec_col).isNotNull()).first()
    if probe is None:
        raise ValueError(f"pq_train: no non-null '{vec_col}' rows")
    dim = len(probe[0])
    if dim % m:
        raise ValueError(f"pq_train: dim {dim} not divisible by m={m}")
    dsub = dim // m

    seeds = (
        df.select(id_col, vec_col)
        .filter(F.col(vec_col).isNotNull())
        .orderBy(F.pmod(F.xxhash64(F.col(id_col)), F.lit(2**31 - 1)), id_col)
        .limit(k)
        .collect()
    )
    if len(seeds) < k:
        raise ValueError(f"pq_train: k={k} exceeds corpus size {len(seeds)}")
    C = np.array(
        [
            [
                [float(x) for x in r[1][s * dsub : (s + 1) * dsub]]
                for r in seeds
            ]
            for s in range(m)
        ]
    )  # [m, k, dsub]

    exploded = (
        df.select(id_col, vec_col)
        .filter(F.col(vec_col).isNotNull())
        .select(
            id_col,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(s).alias("sub_id"),
                            subvector_expr(F.col(vec_col), s, dsub).alias(
                                "subvec"
                            ),
                        )
                        for s in range(m)
                    ]
                )
            ).alias("_e"),
        )
        .select(id_col, "_e.sub_id", "_e.subvec")
        .persist()
    )
    try:
        import pandas as pd

        for _ in range(iters):
            Cb = C.copy()

            def assign(batches, Cb=Cb):
                for pdf in batches:
                    if len(pdf) == 0:
                        continue
                    X = np.array(
                        [
                            np.asarray(v, dtype=np.float64)
                            for v in pdf["subvec"]
                        ]
                    )
                    sub_ids = pdf["sub_id"].to_numpy()
                    codes = np.empty(len(pdf), dtype=np.int64)
                    for s in np.unique(sub_ids):
                        mask = sub_ids == s
                        Cs = Cb[s]
                        d = (
                            (X[mask] ** 2).sum(axis=1)[:, None]
                            - 2.0 * (X[mask] @ Cs.T)
                            + (Cs**2).sum(axis=1)
                        )
                        codes[mask] = d.argmin(axis=1)
                    yield pd.DataFrame(
                        {
                            "sub_id": sub_ids,
                            "code": codes,
                            "subvec": pdf["subvec"],
                        }
                    )

            assigned = exploded.mapInPandas(
                assign,
                schema="sub_id int, code long, subvec array<float>",
            )
            new = (
                assigned.groupBy("sub_id", "code")
                .agg(
                    *[
                        F.avg(F.col("subvec")[i].cast("double")).alias(
                            f"d{i}"
                        )
                        for i in range(dsub)
                    ]
                )
                .collect()
            )
            for r in new:
                C[r["sub_id"], r["code"]] = [r[f"d{i}"] for i in range(dsub)]
            # clusters with no members keep their previous centroid (C
            # rows not present in `new` are simply left unchanged)
    finally:
        exploded.unpersist()

    rows = [
        (s, j, [float(x) for x in C[s, j]])
        for s in range(m)
        for j in range(k)
    ]
    return spark.createDataFrame(rows, ["sub_id", "cid", "cvec"]).select(
        "sub_id", "cid", F.col("cvec").cast("array<double>").alias("cvec")
    )


def pq_decode_expr(codes: Column, codebooks: DataFrame) -> Column:
    """Reconstruct the quantized vector from PQ codes (concatenated
    per-subspace centroids) — the decode side of asymmetric search."""
    books = _collect_codebooks(codebooks)
    parts = []
    for s in sorted(books):
        lut = F.map_from_arrays(
            F.array(*[F.lit(c).cast("long") for c, _ in books[s]]),
            F.array(
                *[
                    F.array(*[F.lit(float(x)) for x in v])
                    for _, v in books[s]
                ]
            ),
        )
        parts.append(lut[codes[s]])
    return F.concat(*parts)


def pq_adc_scores(
    codes_df: DataFrame,
    codebooks: DataFrame,
    query: list[float],
    *,
    id_col: str = "vec_id",
    codes_col: str = "codes",
) -> DataFrame:
    """Asymmetric distance computation (ADC, Jegou et al. 2011 §IV): the
    approximate distance between a query vector and every PQ-ENCODED corpus
    row is the sum over subspaces of d(query_subvec, centroid[code]) —
    looked up from an m x k table built ONCE per query on the driver and
    shipped as literals. Scoring is a pure map-side expression over the
    8-byte codes: the corpus's float vectors are never touched, which is
    the entire point of PQ search at 100 TB.

    The LUT distances are computed with the same left-associative float64
    accumulation as sq_dist_expr, so a SQL twin that unrolls the identical
    sums reproduces every score bit-for-bit."""
    books = _collect_codebooks(codebooks)
    subs = sorted(books)
    if not subs:
        raise ValueError("pq_adc_scores: empty codebooks")
    dsub = len(books[subs[0]][0][1])
    if len(query) != len(subs) * dsub:
        raise ValueError(
            f"query dim {len(query)} != m*dsub {len(subs) * dsub}"
        )
    terms = []
    for s in subs:
        qs = [float(x) for x in query[s * dsub : (s + 1) * dsub]]
        entries = []
        for cid, cvec in books[s]:
            d = 0.0
            for a, b in zip(qs, cvec):
                diff = a - b
                d += diff * diff
            entries.append(f"CAST({int(cid)} AS BIGINT), CAST({d!r} AS DOUBLE)")
        # one SQL map literal per subspace (a map_from_arrays of Column
        # literals costs 2*k py4j calls each — see pq_encode)
        terms.append(f"map({', '.join(entries)})[{_qid(codes_col)}[{s}]]")
    return codes_df.select(
        id_col, F.expr(" + ".join(terms)).alias("adc_dist")
    )


def pq_adc_topk(
    codes_df: DataFrame,
    codebooks: DataFrame,
    query: list[float],
    k: int,
    *,
    id_col: str = "vec_id",
    codes_col: str = "codes",
) -> DataFrame:
    """Top-k nearest PQ codes to a query by ADC distance (ties to the
    smaller id). Distributed TakeOrdered — per-partition heaps, only k
    rows cross to the final stage."""
    scores = pq_adc_scores(
        codes_df, codebooks, query, id_col=id_col, codes_col=codes_col
    )
    return scores.orderBy("adc_dist", id_col).limit(k)
