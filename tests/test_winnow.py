"""Winnowing fingerprints (textops/winnow.py): kernel parity, equality
against an independent pure-python reference, the paper's local guarantee
(shared substring >= k+w-1 chars -> shared fingerprint), the POSCAP guard,
and plan shape."""

import hashlib
import os

import pytest

from pyspark.sql import functions as F

from mysql_log_parser_spark.textops.winnow import (
    K,
    POSCAP,
    W,
    winnow_fingerprints,
)

SF = "/root/testdata/sf0.01"


def _ref_winnow(text: str, k: int = K, w: int = W) -> set:
    """Independent reference: literal transcription of Schleimer et al.'s
    definition — per window, pick min hash with rightmost tie-break."""
    n = len(text)
    if n - k + 1 < w:
        return set()
    hs = [
        int(hashlib.md5(text[i:i + k].encode()).hexdigest()[:8], 16)
        for i in range(n - k + 1)
    ]
    out = set()
    for s in range(len(hs) - w + 1):
        best, best_pos = None, None
        for j in range(s, s + w):
            if best is None or hs[j] < best or (hs[j] == best and j > best_pos):
                best, best_pos = hs[j], j
        out.add((best_pos + 1, best))  # 1-indexed positions
    return out


@pytest.fixture(scope="module")
def docs(spark):
    texts = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "aaaaaaaaaaaaaaaa"),          # all-equal hashes: tie-break path
        (3, "abcdefgh"),                  # exactly k + w - 1 chars: 1 window
        (4, "short"),                     # < k + w - 1: no fingerprints
        (5, "the quick brown fox jumps over the lazy dog EXTRA TAIL HERE"),
    ]
    return spark.createDataFrame(texts, ["doc_id", "text"])


def test_matches_reference_both_kernels(spark, docs):
    want = {
        (did, fp, pos)
        for did, txt in docs.collect()
        for pos, fp in _ref_winnow(txt)
    }
    for kernel in ("catalyst", "arrow"):
        got = {
            (r["doc_id"], r["fp"], r["pos"])
            for r in winnow_fingerprints(docs, kernel=kernel).collect()
        }
        assert got == want, kernel


def test_local_guarantee_shared_substring(spark, docs):
    """Docs 1 and 5 share a long prefix -> winnowing MUST surface shared
    fingerprints (the property simhash/minhash don't give per-substring)."""
    fps = winnow_fingerprints(docs, kernel="arrow").collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    shared = by_doc[1] & by_doc[5]
    assert len(shared) >= len(by_doc[1]) * 0.8  # tail only perturbs the end
    assert 4 not in by_doc  # too short
    assert len(by_doc[3]) == 1  # single window -> single fingerprint


def test_kernel_parity_on_corpus(spark):
    if not os.path.isdir(SF):
        pytest.skip("driver testdata not available")
    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    a = {tuple(r) for r in winnow_fingerprints(d, kernel="catalyst").collect()}
    b = {tuple(r) for r in winnow_fingerprints(d, kernel="arrow").collect()}
    assert a == b and len(a) > 0


def test_density(spark):
    """Expected selected density is 2/(w+1) of k-gram positions (paper §5);
    pin a generous band so regressions in window handling get caught."""
    if not os.path.isdir(SF):
        pytest.skip("driver testdata not available")
    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    row = (
        winnow_fingerprints(d, kernel="arrow")
        .agg(F.count(F.lit(1)).alias("n_fp"))
        .crossJoin(d.agg(F.sum(F.length("text") - K + 1).alias("n_pos")))
        .first()
    )
    density = row["n_fp"] / row["n_pos"]
    assert 0.3 < density < 0.5  # 2/(4+1) = 0.4


def test_poscap_guard(spark):
    big = spark.createDataFrame([(1, "x" * POSCAP)], ["doc_id", "text"])
    with pytest.raises(Exception, match="POSCAP"):
        winnow_fingerprints(big, kernel="arrow").collect()
    with pytest.raises(Exception, match="POSCAP"):
        winnow_fingerprints(big, kernel="catalyst").collect()


def test_plan_shape(spark, docs):
    arrow = winnow_fingerprints(docs, kernel="arrow")
    plan = arrow._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan and "BatchEvalPython" not in plan
    # the arrow kernel emits final rows with NO exchange at all
    assert "Exchange" not in plan
    cat = winnow_fingerprints(docs, kernel="catalyst")
    assert "BatchEvalPython" not in cat._jdf.queryExecution().executedPlan().toString()
