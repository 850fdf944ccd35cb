"""Fingerprint + checksum conformance vs the reference corpus
(log_test.go:25-407), run through the native Catalyst column chain."""

import pytest
from pyspark.sql import functions as F

from mysql_log_parser_spark.functions.fingerprint import checksum, fingerprint
from tests.corpus_fingerprint import CASES, CHECKSUM_CASES, NONGOAL_CASES


def _run_all(spark, inputs):
    df = spark.createDataFrame([(i, q) for i, q in enumerate(inputs)], "i int, q string")
    rows = df.select("i", fingerprint(F.col("q")).alias("fp")).collect()
    return [r.fp for r in sorted(rows, key=lambda r: r.i)]


def test_fingerprint_corpus(spark):
    got = _run_all(spark, [q for q, _, _ in CASES])
    failures = []
    for (q, expect, note), actual in zip(CASES, got):
        if actual != expect:
            failures.append(f"[{note}]\n  in:     {q!r}\n  want:   {expect!r}\n  got:    {actual!r}")
    assert not failures, "\n".join(failures)


def test_checksum_vectors(spark):
    df = spark.createDataFrame([(f,) for f, _ in CHECKSUM_CASES], "f string")
    got = [r.c for r in df.select(checksum(F.col("f")).alias("c")).collect()]
    assert got == [c for _, c in CHECKSUM_CASES]


@pytest.mark.parametrize(
    "q,expect",
    [
        ("administrator command: Quit", "administrator command: Quit"),
        ("use x", "use ?"),
        ("  CALL store_proc(1)", "call store_proc"),
    ],
)
def test_fingerprint_special_cases(spark, q, expect):
    df = spark.createDataFrame([(q,)], "q string")
    assert df.select(fingerprint(F.col("q")).alias("fp")).first().fp == expect


@pytest.mark.parametrize(
    "q,want,why", [pytest.param(q, w, why, id=why[:40]) for q, w, why in NONGOAL_CASES]
)
def test_fingerprint_nongoal_regressions(spark, q, want, why):
    """Reference-skipped cases: pin the ACTIVE chain's real behavior."""
    got = (
        spark.createDataFrame([(q,)], "q string")
        .select(fingerprint(F.col("q")).alias("fp"))
        .first()
        .fp
    )
    assert got == want, why
