"""Product quantization: training convergence, encode parity between the
expr and arrow paths, decode/reconstruction properties, plan shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pylluminator_spark.operators.quantize import (
    pq_decode_expr,
    pq_encode,
    pq_train,
    subvector_expr,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def books(spark, emb):
    return pq_train(emb, m=4, k=8, iters=4).persist()


def test_train_shape(books):
    rows = books.collect()
    assert len(rows) == 4 * 8
    assert all(len(r["cvec"]) == 16 for r in rows)
    assert {r["sub_id"] for r in rows} == {0, 1, 2, 3}


def test_train_rejects_bad_m(emb):
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(emb, m=7, k=4)


def test_encode_expr_arrow_agree(emb, books):
    e1 = {
        r["vec_id"]: (list(r["codes"]), r["recon_err"])
        for r in pq_encode(emb, books, method="expr").collect()
    }
    e2 = {
        r["vec_id"]: (list(r["codes"]), r["recon_err"])
        for r in pq_encode(emb, books, method="arrow").collect()
    }
    assert set(e1) == set(e2)
    for vid in e1:
        assert e1[vid][0] == e2[vid][0], vid
        assert abs(e1[vid][1] - e2[vid][1]) < 1e-9


def test_encode_against_numpy_reference(emb, books):
    X = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }
    B = {}
    for r in books.collect():
        B.setdefault(r["sub_id"], {})[r["cid"]] = np.asarray(r["cvec"])
    got = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(emb, books, method="arrow").collect()
    }
    for vid in list(X)[:50]:
        x = X[vid]
        want = []
        for s in range(4):
            sub = x[s * 16 : (s + 1) * 16]
            dists = [
                ((sub - B[s][c]) ** 2).sum() for c in sorted(B[s])
            ]
            want.append(int(np.argmin(dists)))
        assert got[vid] == want, vid


def test_training_reduces_reconstruction_error(spark, emb):
    seeded = pq_train(emb, m=4, k=8, iters=0)
    trained = pq_train(emb, m=4, k=8, iters=4)
    err0 = pq_encode(emb, seeded, method="arrow").agg(
        F.sum("recon_err")
    ).collect()[0][0]
    err4 = pq_encode(emb, trained, method="arrow").agg(
        F.sum("recon_err")
    ).collect()[0][0]
    assert err4 < err0 * 0.9


def test_decode_reconstruction_error_matches(emb, books):
    enc = pq_encode(emb, books, method="expr")
    joined = enc.join(emb, "vec_id").select(
        "vec_id",
        "recon_err",
        pq_decode_expr(F.col("codes"), books).alias("recon"),
        "embedding",
    )
    rows = joined.limit(30).collect()
    for r in rows:
        x = np.asarray(r["embedding"], dtype=np.float64)
        rec = np.asarray(r["recon"], dtype=np.float64)
        assert len(rec) == 64
        assert abs(((x - rec) ** 2).sum() - r["recon_err"]) < 1e-9


def test_subvector_expr(spark):
    df = spark.createDataFrame([([1.0, 2.0, 3.0, 4.0],)], ["v"])
    got = df.select(
        subvector_expr(F.col("v"), 0, 2).alias("a"),
        subvector_expr(F.col("v"), 1, 2).alias("b"),
    ).collect()[0]
    assert list(got["a"]) == [1.0, 2.0] and list(got["b"]) == [3.0, 4.0]


def test_encode_plan_is_mapside_no_shuffle(emb, books):
    plan = (
        pq_encode(emb, books, method="expr")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


# --------------------------------------------------------------------------
# ADC search over codes
# --------------------------------------------------------------------------

from pylluminator_spark.operators.quantize import pq_adc_scores, pq_adc_topk


def test_adc_matches_numpy(spark, emb, books):
    query = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 1).collect()[0]["embedding"]
    ]
    codes = pq_encode(emb, books, method="arrow").persist()
    got = {
        r["vec_id"]: r["adc_dist"]
        for r in pq_adc_scores(codes, books, query).collect()
    }
    B = {}
    for r in books.collect():
        B.setdefault(r["sub_id"], {})[r["cid"]] = np.asarray(r["cvec"])
    q = np.asarray(query)
    code_map = {r["vec_id"]: list(r["codes"]) for r in codes.collect()}
    for vid, cs in list(code_map.items())[:80]:
        want = sum(
            ((q[s * 16 : (s + 1) * 16] - B[s][cs[s]]) ** 2).sum()
            for s in range(4)
        )
        assert abs(got[vid] - want) < 1e-9, vid
    codes.unpersist()


def test_adc_topk_orders_and_limits(spark, emb, books):
    query = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 1).collect()[0]["embedding"]
    ]
    codes = pq_encode(emb, books, method="arrow")
    top = pq_adc_topk(codes, books, query, 10).collect()
    assert len(top) == 10
    dists = [r["adc_dist"] for r in top]
    assert dists == sorted(dists)
    # the query's own code cell should be among the nearest
    assert top[0]["adc_dist"] <= dists[-1]


def test_adc_validates_query_dim(spark, emb, books):
    codes = pq_encode(emb, books, method="arrow")
    with pytest.raises(ValueError, match="query dim"):
        pq_adc_scores(codes, books, [0.0] * 10)


def test_encode_and_adc_with_quoted_column_names(spark, emb, books):
    """ADVICE r8: the generated-SQL paths interpolate caller column
    names; names with spaces/quotes must render safely (backtick-quoted
    via _qid, embedded backticks doubled) and produce the same codes and
    ADC scores as the plain-named run."""
    from pylluminator_spark.operators.quantize import pq_adc_scores

    odd_vec, odd_codes = "em b'x", "co de's"
    renamed = emb.select(
        "vec_id", F.col("embedding").alias(odd_vec)
    )
    plain = {
        r["vec_id"]: (list(r["codes"]), r["recon_err"])
        for r in pq_encode(emb, books, method="expr").collect()
    }
    got = {
        r["vec_id"]: (list(r["codes"]), r["recon_err"])
        for r in pq_encode(
            renamed, books, vec_col=odd_vec, method="expr"
        ).collect()
    }
    assert got == plain
    codes_df = pq_encode(emb, books, method="expr").select(
        "vec_id", F.col("codes").alias(odd_codes)
    )
    q = [0.1] * 64
    want = {
        r["vec_id"]: r["adc_dist"]
        for r in pq_adc_scores(
            pq_encode(emb, books, method="expr"), books, q
        ).collect()
    }
    got_adc = {
        r["vec_id"]: r["adc_dist"]
        for r in pq_adc_scores(
            codes_df, books, q, codes_col=odd_codes
        ).collect()
    }
    assert got_adc == want
