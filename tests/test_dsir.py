"""DSIR importance weights + hashed linear classifier vs pure-python replays."""

import hashlib
import math
from collections import Counter

import pytest
from pyspark.sql import functions as F


def _bucket(word: str, n_buckets: int, salt: str) -> int:
    h = hashlib.md5(f"{word}:{salt}".encode()).hexdigest()
    return int(h[:8], 16) % n_buckets


DOCS = [
    (1, "the cat sat on the mat", "wiki"),
    (2, "the dog ate the cat food", "wiki"),
    (3, "buy cheap pills now now now", "web"),
    (4, "the mat cat dog", "web"),
    (5, "zxqv qqq zzz", "web"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text", "source"])


def _replay_masses(n_buckets: int, salt: str = "dsir"):
    t_cnt: Counter = Counter()
    r_cnt: Counter = Counter()
    for _, text, src in DOCS:
        for w in text.split():
            b = _bucket(w, n_buckets, salt)
            r_cnt[b] += 1
            if src == "wiki":
                t_cnt[b] += 1
    return t_cnt, r_cnt


def test_importance_features_matches_replay(spark, docs_df):
    from mysql_log_parser_spark.textops.dsir import importance_features

    nb = 16
    out = {
        r["doc_id"]: r
        for r in importance_features(
            docs_df, F.col("source") == "wiki", n_buckets=nb
        ).collect()
    }
    t_cnt, r_cnt = _replay_masses(nb)
    T, R = sum(t_cnt.values()), sum(r_cnt.values())
    for doc_id, text, _ in DOCS:
        words = text.split()
        t_mass = sum(t_cnt[_bucket(w, nb, "dsir")] for w in words)
        r_mass = sum(r_cnt[_bucket(w, nb, "dsir")] for w in words)
        row = out[doc_id]
        assert row["n_words"] == len(words)
        assert row["t_mass"] == t_mass
        assert row["r_mass"] == r_mass
        assert row["dsir_permille"] == math.floor((t_mass * R * 1000) / (r_mass * T))


def test_importance_orders_target_like_docs_first(spark, docs_df):
    """Wiki-vocabulary docs must outscore the spammy/gibberish ones — the
    property DSIR resampling depends on."""
    from mysql_log_parser_spark.textops.dsir import importance_features

    out = {
        r["doc_id"]: r["dsir_permille"]
        for r in importance_features(
            docs_df, F.col("source") == "wiki", n_buckets=64
        ).collect()
    }
    assert min(out[1], out[2]) > max(out[3], out[5])


def test_log_importance_matches_numpy_replay(spark, docs_df):
    from mysql_log_parser_spark.textops.dsir import with_log_importance

    nb = 16
    out = {
        r["doc_id"]: r["log_importance"]
        for r in with_log_importance(
            docs_df, F.col("source") == "wiki", n_buckets=nb
        ).collect()
    }
    t_cnt, r_cnt = _replay_masses(nb)
    T, R = sum(t_cnt.values()), sum(r_cnt.values())
    for doc_id, text, _ in DOCS:
        expect = sum(
            math.log((t_cnt[_bucket(w, nb, "dsir")] + 1) / (T + nb))
            - math.log((r_cnt[_bucket(w, nb, "dsir")] + 1) / (R + nb))
            for w in text.split()
        )
        assert out[doc_id] == pytest.approx(expect, rel=1e-12)


def test_synthetic_weights_deterministic(spark):
    from mysql_log_parser_spark.textops.classifier import synthetic_weights

    rows = {r["bucket"]: r["weight"] for r in synthetic_weights(spark, 32).collect()}
    assert len(rows) == 32
    for b in range(32):
        h = hashlib.md5(f"{b}:clfw".encode()).hexdigest()
        assert rows[b] == int(h[:8], 16) % 2001 - 1000


def test_classify_docs_matches_replay(spark, docs_df):
    from mysql_log_parser_spark.textops.classifier import (
        classify_docs,
        synthetic_weights,
    )

    nb = 64
    wt = synthetic_weights(spark, nb)
    wts = {r["bucket"]: r["weight"] for r in wt.collect()}
    out = {r["doc_id"]: r for r in classify_docs(docs_df, wt, nb, bias=7).collect()}
    for doc_id, text, _ in DOCS:
        score = 7 + sum(wts[_bucket(w, nb, "dsir")] for w in text.split())
        assert out[doc_id]["score"] == score
        assert out[doc_id]["keep"] == (score >= 0)


def test_classifier_plan_broadcasts_weights(spark, docs_df):
    """The weight join must be a broadcast, never a corpus-wide exchange."""
    from mysql_log_parser_spark.textops.classifier import (
        classify_docs,
        synthetic_weights,
    )

    plan = classify_docs(
        docs_df, synthetic_weights(spark, 64), 64
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan
