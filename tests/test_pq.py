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
