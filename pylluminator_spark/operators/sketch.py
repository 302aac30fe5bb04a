"""Mergeable sketches: HyperLogLog distinct counts and count-min frequency
estimation.

Beyond-reference operators (driver north star): at 100 TB, exact
`COUNT(DISTINCT)` and exact per-item frequencies force full shuffles of
the key space; production pipelines keep SKETCHES instead — tiny,
mergeable summaries that are computed with one keyed aggregation, stored
per partition/day/source, and combined later without touching the data
again. Both sketches here are register TABLES (DataFrames), so merging is
a union + groupBy and everything stays distributed:

- **HyperLogLog** (Flajolet et al. 2007): per group, ``m = 2^p``
  registers holding the max leading-zero rank of hashed keys. The
  register table is (group, bucket, rho); ``hll_merge`` is
  groupBy-max; ``hll_estimate`` applies the standard alpha_m bias
  correction + linear-counting small-range correction. Standard error
  ~= 1.04 / sqrt(m).
- **Count-min** (Cormode & Muthukrishnan 2005): a depth x width counter
  matrix from pairwise-independent hashes; point frequency = min over
  rows (one-sided overestimate by <= e*n/width with prob 1-e^-depth).
  The counter table is exact integers — fully deterministic and
  mergeable by plain addition.

Hashing: the engine-grade entry points use ``xxhash64`` (JVM codegen).
The ``*_arith`` variants use multiply-mod hashes over integer keys whose
bit-rank math is replicated term-for-term in ANSI SQL — that is what the
driver gate checks, following the repo's minhash/simhash recipe.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Mersenne-adjacent 31-bit prime for the arithmetic hash family
_P31 = 2_147_483_647


def _bit_length(col: Column, max_bits: int) -> Column:
    """bit_length(w) for 0 <= w < 2^max_bits via integer indicator terms
    (no float log — exact in any engine)."""
    out = F.lit(0)
    for k in range(max_bits):
        out = out + (col >= F.lit(1 << k)).cast("int")
    return out


def hll_registers_arith(
    df: DataFrame,
    key_col: str,
    *,
    group_cols: Sequence[str] = (),
    p: int = 8,
    a: int = 1_103_515_245,
    b: int = 12_345,
) -> DataFrame:
    """HLL register table from the SQL-replicable hash
    ``h = (a * key + b) mod (2^31 - 1)``: bucket = h mod 2^p, and rho =
    leading-zero rank of the remaining ``31 - p`` bits. Returns (group...,
    bucket, rho) with one row per non-empty register — integer-exact, so
    the driver gate hashes it directly. Keys are expected NON-NEGATIVE:
    Spark's % keeps the dividend sign, and the DuckDB/python twins of
    this arith path assume the non-negative branch (the xxhash64 engine
    path has no such constraint)."""
    m = 1 << p
    wbits = 31 - p
    h = (F.lit(a) * F.col(key_col).cast("long") + F.lit(b)) % F.lit(_P31)
    bucket = h % m
    w = F.expr(f"(({a} * CAST({key_col} AS BIGINT) + {b}) % {_P31}) div {m}")
    rho = F.lit(wbits) - _bit_length(w, wbits) + F.lit(1)
    return (
        df.where(F.col(key_col).isNotNull())
        .select(
            *group_cols,
            bucket.cast("int").alias("bucket"),
            rho.cast("int").alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_registers(
    df: DataFrame,
    key_col: str,
    *,
    group_cols: Sequence[str] = (),
    p: int = 12,
) -> DataFrame:
    """Engine-grade HLL register table using xxhash64: bucket from the low
    ``p`` bits, rho from the leading-zero rank of the next 64 - p bits.
    One keyed shuffle; at most 2^p rows per group."""
    m = 1 << p
    wbits = 64 - p
    h = F.xxhash64(F.col(key_col))
    bucket = h.bitwiseAND(F.lit(m - 1))
    w = F.shiftrightunsigned(h, p)
    rho = F.lit(wbits) - _bit_length(w, wbits) + F.lit(1)
    return (
        df.where(F.col(key_col).isNotNull())
        .select(
            *group_cols,
            bucket.cast("int").alias("bucket"),
            rho.cast("int").alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(
    sketches: Sequence[DataFrame], group_cols: Sequence[str] = ()
) -> DataFrame:
    """Merge register tables (same p) by register-wise max — the HLL merge
    is lossless: merge(sketch(A), sketch(B)) == sketch(A union B)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*group_cols, "bucket").agg(
        F.max("rho").alias("rho")
    )


def hll_estimate(
    registers: DataFrame, *, p: int, group_cols: Sequence[str] = ()
) -> DataFrame:
    """Distinct-count estimate per group from a register table: the
    standard raw estimator ``alpha_m * m^2 / (sum 2^-rho + zeros)`` with
    linear-counting correction below 2.5m. One aggregation; empty
    registers are accounted for arithmetically (m - count(rows))."""
    m = 1 << p
    alpha = (
        0.673 if p == 4 else 0.697 if p == 5 else 0.709 if p == 6
        else 0.7213 / (1 + 1.079 / m)
    )
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_nz"),
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("_hsum"),
    )
    zeros = F.lit(m) - F.col("_nz")
    raw = F.lit(alpha * m * m) / (F.col("_hsum") + zeros.cast("double"))
    lin = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    est = F.when((raw <= 2.5 * m) & (zeros > 0), lin).otherwise(raw)
    return agg.select(
        *group_cols, F.round(est).cast("long").alias("ndv_estimate")
    )


def cms_build_arith(
    df: DataFrame,
    key_col: str,
    *,
    width: int = 64,
    seeds: Sequence[tuple[int, int]] = ((421, 7), (1031, 19), (2017, 41)),
) -> DataFrame:
    """Count-min counter table from SQL-replicable hashes: for each depth
    ``r`` with seed (a, b), col = ((a * key + b) mod p31) mod width.
    Returns (row, col, cnt) — exact integers, mergeable by addition.
    Rows with NULL keys are skipped. Keys are expected NON-NEGATIVE (see
    the note on hll_registers_arith); negative keys stay build/probe-
    consistent — both sides compute the same signed cell — but diverge
    from the SQL twins, unlike the bloom paths which use pmod."""
    keyed = df.where(F.col(key_col).isNotNull())
    parts = []
    for r, (a, b) in enumerate(seeds):
        colx = (
            (F.lit(a) * F.col(key_col).cast("long") + F.lit(b)) % F.lit(_P31)
        ) % F.lit(width)
        parts.append(
            keyed.select(
                F.lit(r).alias("row"), colx.cast("int").alias("col")
            )
        )
    out = parts[0]
    for x in parts[1:]:
        out = out.unionByName(x)
    return out.groupBy("row", "col").agg(F.count(F.lit(1)).alias("cnt"))


def cms_merge(sketches: Sequence[DataFrame]) -> DataFrame:
    """Merge count-min tables by cell-wise addition."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    counters: DataFrame,
    probes: DataFrame,
    key_col: str,
    *,
    width: int = 64,
    seeds: Sequence[tuple[int, int]] = ((421, 7), (1031, 19), (2017, 41)),
) -> DataFrame:
    """Point-frequency estimates for ``probes``: each probe key maps to
    one cell per depth; the estimate is the MIN cell count (0 if a cell is
    empty). The counter table is broadcast — it is at most depth x width
    rows by construction."""
    keys = probes.select(F.col(key_col).alias("key")).distinct()
    cells = []
    for r, (a, b) in enumerate(seeds):
        colx = (
            (F.lit(a) * F.col("key").cast("long") + F.lit(b)) % F.lit(_P31)
        ) % F.lit(width)
        cells.append(
            keys.select(
                "key", F.lit(r).alias("row"), colx.cast("int").alias("col")
            )
        )
    probe_cells = cells[0]
    for x in cells[1:]:
        probe_cells = probe_cells.unionByName(x)
    joined = probe_cells.join(F.broadcast(counters), ["row", "col"], "left")
    return joined.groupBy("key").agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("freq_estimate")
    )


_BLOOM_SEEDS = ((5, 11), (433, 17), (1861, 3), (3643, 101))


def bloom_build_arith(
    df: DataFrame,
    key_col: str,
    *,
    m_bits: int = 1024,
    seeds: Sequence[tuple[int, int]] = _BLOOM_SEEDS,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Bloom filter register table (Bloom 1970) from SQL-replicable
    hashes — the third mergeable sketch next to HLL and count-min.

    For each hash (a, b): ``pos = ((a*key + b) mod p31) mod m_bits``.
    The bit array is stored as BIGINT words of 32 bits each (bit 31 is
    the highest used — staying under the sign bit keeps the register
    arithmetic identical in Spark, DuckDB, and pandas), so the table is
    (group..., word, register) with at most ``m_bits / 32`` rows per
    group. Mergeable by bitwise OR (``bloom_merge``); membership has NO
    false negatives and a false-positive rate of about
    ``(1 - e^(-k*n/m))^k``.

    Scale notes: one union of k map-side projections + one keyed
    aggregate; the register table is tiny by construction, so probing
    (``bloom_probe``) broadcasts it. At 100 TB this is the standard
    join-pruning primitive: build per partition/day, OR together, probe
    before shuffling the big side.
    """
    gcols = list(group_cols)
    keyed = df.where(F.col(key_col).isNotNull())
    parts = []
    for a, b in seeds:
        pos = F.pmod(
            F.pmod(F.lit(a) * F.col(key_col).cast("long") + F.lit(b),
                   F.lit(_P31)),
            F.lit(m_bits),
        )
        parts.append(
            keyed.select(
                *gcols,
                (pos / F.lit(32)).cast("int").alias("word"),
                F.pow(F.lit(2.0), (pos % 32).cast("int"))
                .cast("long")
                .alias("_mask"),
            )
        )
    out = parts[0]
    for x in parts[1:]:
        out = out.unionByName(x)
    return out.groupBy(*gcols, "word").agg(
        F.bit_or("_mask").alias("register")
    )


def bloom_merge(
    sketches: Sequence[DataFrame], group_cols: Sequence[str] = ()
) -> DataFrame:
    """Merge Bloom register tables by word-wise bitwise OR."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*group_cols, "word").agg(
        F.bit_or("register").alias("register")
    )


def bloom_probe(
    registers: DataFrame,
    probes: DataFrame,
    key_col: str,
    *,
    m_bits: int = 1024,
    seeds: Sequence[tuple[int, int]] = _BLOOM_SEEDS,
) -> DataFrame:
    """Membership test: ``maybe_member`` is true iff ALL k bits are set
    (no false negatives; rare false positives by design). The register
    table is broadcast — it is at most ``m_bits / 32`` rows."""
    keys = probes.select(F.col(key_col).alias("key")).distinct()
    cells = []
    for a, b in seeds:
        pos = F.pmod(
            F.pmod(F.lit(a) * F.col("key").cast("long") + F.lit(b),
                   F.lit(_P31)),
            F.lit(m_bits),
        )
        cells.append(
            keys.select(
                "key",
                (pos / F.lit(32)).cast("int").alias("word"),
                F.pow(F.lit(2.0), (pos % 32).cast("int"))
                .cast("long")
                .alias("_mask"),
            )
        )
    probe_cells = cells[0]
    for x in cells[1:]:
        probe_cells = probe_cells.unionByName(x)
    joined = probe_cells.join(F.broadcast(registers), "word", "left")
    hit = (
        F.coalesce(F.col("register"), F.lit(0))
        .bitwiseAND(F.col("_mask"))
        != 0
    ).cast("int")
    return joined.groupBy("key").agg(
        (F.min(hit) == 1).alias("maybe_member")
    )


def bloom_prune_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    *,
    m_bits: int = 16384,
    seeds: Sequence[tuple[int, int]] = _BLOOM_SEEDS,
) -> DataFrame:
    """Semi-join reduction: prune the FACT side with a Bloom filter of the
    dim keys BEFORE the join — the classic 100 TB shuffle-avoidance
    primitive (runtime row-level filtering, done explicitly). The result
    is IDENTICAL to ``fact.join(dim, key)``: Bloom membership has no
    false negatives (nothing joinable is dropped) and the real join
    eliminates the rare false positives. What changes is the plan: only
    the surviving fraction of the fact table reaches the join.

    The register table is collected once (at most ``m_bits / 32`` BIGINT
    words — dimension-sized by construction) and inlined as an array
    literal, so the membership test is a pure codegen filter: k
    multiply-mod bit probes per row, ZERO extra shuffle and no probe-side
    join. Inner join only (pruning the fact side changes outer-join
    semantics).

    All three bloom paths (build / probe / this inline probe) hash with
    ``pmod`` so negative keys land in [0, m_bits) — Spark's ``%`` keeps
    the dividend's sign, which would index ``words`` from the end on the
    build side and feed ``element_at`` an index <= 0 here (ADVICE r5).
    """
    cond = bloom_inline_probe_cond(
        dim, key, probe_key=key, m_bits=m_bits, seeds=seeds
    )
    pruned = fact.filter(F.col(key).isNotNull() & cond)
    return pruned.join(dim, key, "inner")


def bloom_inline_probe_cond(
    dim: DataFrame,
    key: str,
    *,
    probe_key: str | None = None,
    m_bits: int = 16384,
    seeds: Sequence[tuple[int, int]] = _BLOOM_SEEDS,
) -> Column:
    """The codegen membership predicate ``bloom_prune_join`` filters with:
    build the register words from ``dim[key]``, inline them as an array
    literal, and return the k-bit AND-of-hits condition over
    ``probe_key`` (defaults to ``key``). Exposed so tests and custom
    pruning plans replay EXACTLY the production filter instead of
    re-deriving the hash math."""
    n_words = (m_bits + 31) // 32
    words = [0] * n_words
    for r in bloom_build_arith(dim, key, m_bits=m_bits, seeds=seeds).collect():
        words[r["word"]] = int(r["register"])
    arr = F.lit(words)
    kl = F.col(probe_key or key).cast("long")
    cond = None
    for a, b in seeds:
        pos = F.pmod(
            F.pmod(F.lit(a) * kl + F.lit(b), F.lit(_P31)), F.lit(m_bits)
        )
        word = (pos / F.lit(32)).cast("int")
        mask = F.pow(F.lit(2.0), (pos % 32).cast("int")).cast("long")
        hit = F.element_at(arr, word + F.lit(1)).bitwiseAND(mask) != 0
        cond = hit if cond is None else (cond & hit)
    return cond


# ---------------------------------------------------------------------------
# Mergeable histogram quantile sketch
# ---------------------------------------------------------------------------


def hist_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    *,
    lo: float,
    hi: float,
    bins: int = 128,
) -> DataFrame:
    """Fixed-grid histogram sketch: (group..., bin, cnt) over the
    ``bins``-slot equal-width grid on [lo, hi). The quantile counterpart
    of the HLL/CMS/Bloom register tables: exact integers on a FIXED grid,
    so sketches built per partition/day/source merge by plain addition
    (``hist_merge``) regardless of data order or cluster layout — unlike
    GK/t-digest summaries, whose merge is order-sensitive. Quantile
    estimates off the merged table are within one bin width of exact
    (``hist_quantiles``).

    Values outside [lo, hi) clamp to the edge bins (they still count
    toward ranks, estimates at the edges saturate); NULLs are dropped.
    Bounds come from domain knowledge or a prior 1-row min/max scan.
    One keyed aggregation, map-side partial combine; the sketch has at
    most ``bins`` rows per group."""
    w = (float(hi) - float(lo)) / bins
    v = F.col(value_col).cast("double")
    b = F.floor((v - F.lit(float(lo))) / F.lit(w)).cast("int")
    b = F.greatest(F.lit(0), F.least(F.lit(bins - 1), b))
    return (
        df.filter(v.isNotNull())
        .select(*group_cols, b.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_merge(sketches: Sequence[DataFrame]) -> DataFrame:
    """Merge ``hist_sketch`` tables built on the same grid: union +
    per-(group, bin) addition. Exact — merging sketches of shards equals
    the sketch of the union."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c != "cnt"]
    return out.groupBy(*keys).agg(F.sum("cnt").alias("cnt"))


def hist_quantiles(
    sketch: DataFrame,
    qs: Sequence[float],
    group_cols: Sequence[str] = (),
    *,
    lo: float,
    hi: float,
    bins: int = 128,
) -> DataFrame:
    """Interpolated quantile estimates from a ``hist_sketch`` table:
    (group..., q, est). For each q in (0, 1], the target rank is
    ``r = q * n``; the answer lands in the unique bin whose cumulative
    count first reaches r, linearly interpolated within the bin:

        est = lo + width * (bin + (r - cum_prev) / cnt)

    Pure deterministic arithmetic over exact integer counts — the same
    expression runs bit-for-bit in ANSI SQL (the driver gate's DuckDB
    twin). Error <= one bin width vs the exact quantile. The cumulative
    window runs over the SKETCH (<= ``bins`` rows per group), never the
    data."""
    from pyspark.sql import Window

    gc = list(group_cols)
    w = (float(hi) - float(lo)) / bins
    win = (
        Window.partitionBy(*gc).orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = sketch.select(
        *gc, "bin", "cnt",
        F.sum("cnt").over(win).alias("_cum"),
    )
    totals = sketch.groupBy(*gc).agg(F.sum("cnt").alias("_n"))
    spark = sketch.sparkSession
    qdf = spark.createDataFrame([(float(q),) for q in qs], ["q"])
    r = F.col("q") * F.col("_n")
    est = F.lit(float(lo)) + F.lit(w) * (
        F.col("bin")
        + (F.col("_r") - (F.col("_cum") - F.col("cnt"))) / F.col("cnt")
    )
    joined = (
        cum.join(totals, gc)
        if gc
        else cum.crossJoin(F.broadcast(totals))
    )
    return (
        joined.crossJoin(F.broadcast(qdf))
        .withColumn("_r", r)
        .filter(
            (F.col("_cum") - F.col("cnt") < F.col("_r"))
            & (F.col("_r") <= F.col("_cum"))
        )
        .select(*gc, "q", est.alias("est"))
    )


def approx_quantiles(
    df: DataFrame,
    value_col: str,
    qs: Sequence[float],
    group_cols: Sequence[str] = (),
    accuracy: int = 10_000,
) -> DataFrame:
    """The engine-grade quantile path: Spark's native
    ``percentile_approx`` (Greenwald-Khanna, JVM-side, single pass,
    rank error <= 1/accuracy). Use this when bounds are unknown or the
    distribution is heavy-tailed beyond a fixed grid; use
    ``hist_sketch`` when the summary must be STORED and merged across
    batches (GK summaries don't survive as tables). Returns
    (group..., quantiles: array<double>) aligned with ``qs``."""
    return df.groupBy(*group_cols).agg(
        F.percentile_approx(
            value_col, [float(q) for q in qs], accuracy
        ).alias("quantiles")
    )
