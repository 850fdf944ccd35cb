"""Aggregate golden parity vs the reference stats tests
(/root/reference/log/log_test.go:418-525): EventStats over slow001 and
slow010, including the reference's deliberately-non-interpolating
percentile indexing (sorted[(95*cnt)/100], 0-indexed)."""

import math
import os

import pytest

from mysql_log_parser_spark import tokenizer
from mysql_log_parser_spark.operators.aggregate import stats_long
from mysql_log_parser_spark.operators.parse import parse_slowlog

LOGS = "/root/reference/test/logs"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(LOGS), reason="reference fixture logs not available"
)

# log_test.go:425-470
SLOW001_EXPECT = {
    ("time", "Lock_time"): dict(cnt=2, sum=0, min=0, avg=0, pct95=0, med=0, max=0),
    ("time", "Query_time"): dict(cnt=2, sum=4, min=2, avg=2, pct95=2, med=2, max=2),
    ("number", "Rows_examined"): dict(cnt=2, sum=0, min=0, avg=0, pct95=0, med=0, max=0),
    ("number", "Rows_sent"): dict(cnt=2, sum=2, min=1, avg=1, pct95=1, med=1, max=1),
}

# log_test.go:485-520 (pqd would give p95=1.964363, med=0.198537 — ours must not)
SLOW010_EXPECT = {
    ("time", "Query_time"): dict(
        cnt=36, sum=22.703689, min=0.000002, avg=0.630658, pct95=2.034012,
        med=0.192812, max=3.034012,
    ),
    ("time", "Lock_time"): dict(cnt=36, sum=0, min=0, avg=0, pct95=0, med=0, max=0),
    ("number", "Rows_sent"): dict(cnt=36, sum=156, min=0, avg=4, pct95=6, med=1, max=99),
}


def _events_df(spark, name):
    text = open(os.path.join(LOGS, name)).read()
    df = spark.createDataFrame(
        [tokenizer.doc_rows(name, text, source="fix")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    return parse_slowlog(df)


def _check(spark, name, expect):
    got = {
        (r.kind, r.metric): r.asDict()
        for r in stats_long(_events_df(spark, name), mode="exact").collect()
    }
    for key, stats in expect.items():
        assert key in got, f"{name}: missing {key}"
        for stat, want in stats.items():
            g = got[key][stat]
            assert math.isclose(g, want, abs_tol=5e-7), (
                f"{name} {key} {stat}: got {g}, want {want}"
            )


def test_stats_slow001(spark):
    _check(spark, "slow001.log", SLOW001_EXPECT)


def test_stats_slow010(spark):
    _check(spark, "slow010.log", SLOW010_EXPECT)


def test_sketch_mode_close_to_exact(spark):
    """The scale path (percentile_approx == GK eps=0.01) must agree with the
    exact path within sketch error at fixture scale."""
    ev = _events_df(spark, "slow010.log")
    exact = {
        (r.kind, r.metric): r for r in stats_long(ev, mode="exact").collect()
    }
    sketch = {
        (r.kind, r.metric): r for r in stats_long(ev, mode="sketch").collect()
    }
    k = ("time", "Query_time")
    # At 36 values with accuracy=100, GK is exact up to rank rounding.
    assert abs(sketch[k].pct95 - exact[k].pct95) <= 1.1
    assert sketch[k].cnt == exact[k].cnt
    assert math.isclose(sketch[k].sum, exact[k].sum, rel_tol=1e-9)
