"""Product-quantization encode/ADC vs numpy replays."""

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def vecs():
    rng = np.random.RandomState(7)
    return rng.uniform(-1, 1, size=(30, 16)).astype(np.float64)


def _np_codes(v, books):
    sub = len(books[0][0])
    out = []
    for s, cents in enumerate(books):
        vm = v[s * sub : (s + 1) * sub]
        dists = [-2.0 * float(np.dot(vm, c)) + sum(x * x for x in c) for c in cents]
        out.append(int(np.argmin(dists)))  # np.argmin takes first on ties
    return out


def test_pq_encode_matches_numpy(spark, vecs):
    from mysql_log_parser_spark.textops.pq import pq_code_cols, pq_codebooks

    books = pq_codebooks(m=4, ks=8, dim=16, salt="t")
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(vecs)], ["vid", "v"]
    )
    got = {
        r["vid"]: [r[f"code{s}"] for s in range(4)]
        for r in df.select("vid", *pq_code_cols(F.col("v"), books)).collect()
    }
    for i, row in enumerate(vecs):
        assert got[i] == _np_codes(row, books), f"vec {i}"


def test_adc_matches_true_distance_to_reconstruction(spark, vecs):
    """ADC(q, codes(x)) must equal the true squared L2 between q and x's
    RECONSTRUCTION from the codebooks — the defining PQ identity."""
    from mysql_log_parser_spark.textops.pq import (
        adc_distance,
        adc_lut_cols,
        pq_code_cols,
        pq_codebooks,
    )

    books = pq_codebooks(m=4, ks=8, dim=16, salt="t")
    sub = 4
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(vecs)], ["vid", "v"]
    )
    n = df.select(F.col("vid").alias("nid"), *pq_code_cols(F.col("v"), books))
    q = df.where(F.col("vid") < 2).select(
        F.col("vid").alias("qid"), *adc_lut_cols(F.col("v"), books)
    )
    got = {
        (r["qid"], r["nid"]): r["adc"]
        for r in n.crossJoin(q).select(
            "qid", "nid", adc_distance(4).alias("adc")
        ).collect()
    }
    for qi in range(2):
        qv = vecs[qi]
        for ni, nv in enumerate(vecs):
            codes = _np_codes(nv, books)
            recon = np.concatenate([np.array(books[s][codes[s]]) for s in range(4)])
            want = sum(
                float(np.sum((qv[s * sub : (s + 1) * sub] - recon[s * sub : (s + 1) * sub]) ** 2))
                for s in range(4)
            )
            assert got[(qi, ni)] == pytest.approx(want, rel=1e-9), (qi, ni)


def test_pq_memory_is_m_codes(spark, vecs):
    """The index side carries cell + M small ints — nothing float-sized."""
    from mysql_log_parser_spark.textops.pq import pq_code_cols, pq_codebooks

    books = pq_codebooks(m=4, ks=8, dim=16, salt="t")
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(vecs)], ["vid", "v"]
    )
    n = df.select("vid", *pq_code_cols(F.col("v"), books))
    assert [f.dataType.simpleString() for f in n.schema.fields] == ["bigint"] + ["int"] * 4
    codes = n.select(*[F.max(f"code{s}") for s in range(4)]).collect()[0]
    assert all(c <= 7 for c in codes)


def test_pq_arrow_kernel_matches_catalyst(spark):
    """Both encoder kernels must emit identical codes on real embeddings —
    the same parity contract the centroid/hyperplane kernels carry."""
    import os

    from mysql_log_parser_spark.textops.pq import pq_codebooks, pq_encode

    sf = "/root/testdata/sf0.01"
    if not os.path.isdir(sf):
        pytest.skip("driver testdata not available")
    books = pq_codebooks(m=4, ks=8, dim=64)
    e = spark.read.parquet(f"{sf}/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    a = {
        r["vec_id"]: tuple(r[f"code{s}"] for s in range(4))
        for r in pq_encode(e, books, kernel="catalyst").collect()
    }
    b = {
        r["vec_id"]: tuple(r[f"code{s}"] for s in range(4))
        for r in pq_encode(e, books, kernel="arrow").collect()
    }
    assert a == b
    plan = pq_encode(e, books, kernel="arrow")._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan


def test_pq_auto_switch(spark):
    from mysql_log_parser_spark.textops.pq import pq_codebooks, pq_encode

    df = spark.createDataFrame([(1, [0.1] * 16)], ["vid", "v"])
    small = pq_encode(df, pq_codebooks(4, 8, 16), kernel="auto")
    assert "MapInPandas" not in small._jdf.queryExecution().executedPlan().toString()
    big = pq_encode(
        spark.createDataFrame([(1, [0.1] * 512)], ["vid", "v"]),
        pq_codebooks(8, 16, 512),
        kernel="auto",
    )
    assert "MapInPandas" in big._jdf.queryExecution().executedPlan().toString()


def test_residual_encode_arrow_matches_catalyst(spark):
    """Residual encoder kernel parity on the gate corpus: the Arrow
    subtract-and-matmul path assigns the same codes as the Catalyst
    constant-folded path (pq.residual_const1) — the constant-fold identity
    -2·dot(v−cent, c) + |c|² = -2·dot(v, c) + (2·dot(cent, c) + |c|²)
    holds to within sub-ulp, so argmins agree on real data."""
    import os

    from mysql_log_parser_spark.entry_queries_ext import _centroid_literals
    from mysql_log_parser_spark.textops.pq import pq_codebooks, pq_encode_residual

    sf = "/root/testdata/sf0.01"
    if not os.path.isdir(sf):
        pytest.skip("driver testdata not available")
    books = pq_codebooks(4, 8, 64)
    cents = _centroid_literals()
    e = spark.read.parquet(f"{sf}/embeddings.parquet").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        (F.col("vec_id") % 4).cast("long").alias("cell"),
    )
    a = {
        r["vec_id"]: tuple(r[f"rcode{s}"] for s in range(4))
        for r in pq_encode_residual(e, books, cents, kernel="catalyst").collect()
    }
    b = {
        r["vec_id"]: tuple(r[f"rcode{s}"] for s in range(4))
        for r in pq_encode_residual(e, books, cents, kernel="arrow").collect()
    }
    assert a == b and len(a) > 0
    plan = (
        pq_encode_residual(e, books, cents, kernel="arrow")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "MapInPandas" in plan


def test_residual_recall_dominates_raw(spark):
    """The point of residual encoding: on the clustered audit corpus the
    residual codes recover MORE of the exact top-k than raw codes at the
    same byte budget (VERDICT r4 next-round #4: 'recall audit showing
    residual >= raw')."""
    import os

    from mysql_log_parser_spark.entry_queries_ext import q_ann_pq_recall_residual

    sf = "/root/testdata/sf0.01"
    if not os.path.isdir(sf):
        pytest.skip("driver testdata not available")
    rows = q_ann_pq_recall_residual(spark, sf).collect()
    raw = sum(r["n_overlap_raw"] for r in rows)
    res = sum(r["n_overlap_res"] for r in rows)
    assert res > raw, (raw, res)


def test_lut_arrow_matches_catalyst_bitwise(spark, vecs):
    """The Arrow LUT twins must reproduce the Catalyst fold trees
    BIT-FOR-BIT (not approximately): the LUT doubles feed round(.,6)
    rankings the DuckDB oracle replays, so the kernels keep the
    sequential fold order (_seq_dot/_seq_sqnorm) and the identical
    association.  Struct equality below is exact float equality."""
    from mysql_log_parser_spark.textops.pq import (
        adc_lut_arrow,
        adc_lut_cols,
        pq_codebooks,
        residual_lut_arrow,
        residual_lut_cols,
    )

    books = pq_codebooks(m=4, ks=8, dim=16, salt="t")
    cents = [[float(i + j % 3) / 4 for j in range(16)] for i in range(3)]
    df = spark.createDataFrame(
        [(i, [float(x) for x in row], i % 3) for i, row in enumerate(vecs)],
        ["vid", "v", "cell"],
    )
    cat = df.select(
        "vid",
        *adc_lut_cols(F.col("v"), books),
        *residual_lut_cols(F.col("v"), F.col("cell"), books, cents),
    )
    arw = residual_lut_arrow(
        adc_lut_arrow(df, books), books, cents, cell_col="cell"
    ).drop("v", "cell")
    names = [f"lut{s}" for s in range(4)] + [f"rlut{s}" for s in range(4)]
    a = {r["vid"]: tuple(tuple(r[n]) for n in names) for r in cat.collect()}
    b = {r["vid"]: tuple(tuple(r[n]) for n in names) for r in arw.collect()}
    assert a == b and len(a) == len(vecs)


def test_residual_arrow_rejects_bad_cells(spark, vecs):
    """Numpy fancy indexing would silently WRAP cell=-1 to the LAST
    centroid where the Catalyst twin's element_at errors — the kernels
    must fail loudly instead of silently diverging."""
    from mysql_log_parser_spark.textops.pq import (
        pq_codebooks,
        pq_encode_residual,
        residual_lut_arrow,
    )

    books = pq_codebooks(m=4, ks=8, dim=16, salt="t")
    cents = [[float(i + j % 3) / 4 for j in range(16)] for i in range(3)]
    df = spark.createDataFrame(
        [(0, [float(x) for x in vecs[0]], -1)], ["vid", "v", "cell"]
    )
    with pytest.raises(Exception, match="cell id out of range"):
        pq_encode_residual(df, books, cents, kernel="arrow").collect()
    with pytest.raises(Exception, match="cell id out of range"):
        residual_lut_arrow(df, books, cents, cell_col="cell").collect()
