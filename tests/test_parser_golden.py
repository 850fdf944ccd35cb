"""Golden parity of the Spark slow-log parser vs the reference parser.

Two layers of assertion:

1. *Literal layer*: expectations hand-transcribed from the reference's own
   test literals (/root/reference/log/parser/parser_test.go).  These are the
   authoritative spec.  NB the reference's deep-equality helper iterates
   expected map keys only (test/test.go:70-89), so its literals may omit
   metrics the parser actually emits (e.g. slow016's Last_errno/Killed); the
   literal layer therefore asserts the transcribed keys as a *subset* with
   exact values, like the reference harness does.

2. *Strict layer*: full-row strict equality against tests/golden/
   expected_events.json — a frozen, hand-audited dump that pins the complete
   behavior (all metric keys) for regression.

Both layers run against the real fixture logs at /root/reference/test/logs,
through the pure-pandas batch kernel (fast) and through Spark mapInPandas
with the tokenized input table shape (end-to-end).
"""

import json
import math
import os

import pandas as pd
import pytest

from mysql_log_parser_spark import tokenizer
from mysql_log_parser_spark.operators.parse import _parse_batch, parse_slowlog

LOGS = "/root/reference/test/logs"
GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "expected_events.json")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(LOGS), reason="reference fixture logs not available"
)


def _parse_fixture(name, admin_filter=frozenset(), start=0):
    text = open(os.path.join(LOGS, name)).read()
    pdf = pd.DataFrame(
        {"doc_id": [name], "text": [text], "source": ["fix"], "start_offset": [start]}
    )
    return _parse_batch(pdf, admin_filter)


def _row_to_dict(row) -> dict:
    return {
        "offset": int(row["offset"]),
        "ts": row["ts"],
        "admin": bool(row["admin"]),
        "query": row["query"],
        "user": row["user"],
        "host": row["host"],
        "db": row["db"],
        "rate_type": row["rate_type"],
        "rate_limit": int(row["rate_limit"]),
        "time_metrics": {k: float(v) for k, v in row["time_metrics"].items()},
        "number_metrics": {k: int(v) for k, v in row["number_metrics"].items()},
        "bool_metrics": {k: bool(v) for k, v in row["bool_metrics"].items()},
    }


def _assert_literal(got: dict, expect: dict, where: str):
    """Reference-harness-style comparison: scalar fields exact, metric maps
    compared on the expected keys (6-decimal float tolerance, test/test.go:128-141)."""
    for k in ("offset", "ts", "admin", "query", "user", "host", "db", "rate_type", "rate_limit"):
        if k in expect:
            assert got[k] == expect[k], f"{where}.{k}: {got[k]!r} != {expect[k]!r}"
    for m in ("time_metrics", "number_metrics", "bool_metrics"):
        for name, val in expect.get(m, {}).items():
            assert name in got[m], f"{where}.{m}[{name}] missing"
            g = got[m][name]
            if isinstance(val, float):
                assert math.isclose(g, val, abs_tol=5e-7) or f"{g:.6f}" == f"{val:.6f}", (
                    f"{where}.{m}[{name}]: {g} != {val}"
                )
            else:
                assert g == val, f"{where}.{m}[{name}]: {g} != {val}"


# -- Literal layer: transcribed from parser_test.go ---------------------------

SLOW001 = [  # parser_test.go:36-73
    {
        "ts": "071015 21:43:52", "admin": False, "query": "select sleep(2) from n",
        "user": "root", "host": "localhost", "db": "test", "offset": 200,
        "time_metrics": {"Query_time": 2.0, "Lock_time": 0.0},
        "number_metrics": {"Rows_sent": 1, "Rows_examined": 0},
        "bool_metrics": {},
    },
    {
        "ts": "071015 21:45:10", "admin": False, "query": "select sleep(2) from test.n",
        "user": "root", "host": "localhost", "db": "sakila", "offset": 359,
        "time_metrics": {"Query_time": 2.0, "Lock_time": 0.0},
        "number_metrics": {"Rows_sent": 1, "Rows_examined": 0},
        "bool_metrics": {},
    },
]

SLOW008 = [  # parser_test.go:675-730
    {
        "query": "Quit", "db": "db1", "admin": True, "host": "", "user": "meow",
        "offset": 0, "ts": "",
        "time_metrics": {"Query_time": 0.000002, "Lock_time": 0.0},
        "number_metrics": {"Rows_examined": 0, "Rows_sent": 0, "Thread_id": 5},
    },
    {
        "query": "SET NAMES utf8", "db": "db", "admin": False, "user": "meow",
        "offset": 221,
        "time_metrics": {"Query_time": 0.000899},
        "number_metrics": {"Thread_id": 6},
    },
    {
        "query": "SELECT MIN(id),MAX(id) FROM tbl", "db": "db2", "admin": False,
        "offset": 435,
        "time_metrics": {"Query_time": 0.018799, "Lock_time": 0.009453},
    },
]

SLOW012 = [  # parser_test.go:908-956
    {"query": "select * from mysql.user", "db": "", "host": "localhost",
     "user": "msandbox", "offset": 0, "ts": ""},
    {"query": "Quit", "admin": True, "db": "", "offset": 186,
     "time_metrics": {"Query_time": 0.000016}},
    {"query": "SELECT @@max_allowed_packet", "db": "dev_pct", "offset": 376,
     "ts": "140413 19:34:13"},
]

SLOW013_OFFSETS = [0, 354, 6139, 6667, 7015]  # parser_test.go:968-1066
SLOW014_OFFSETS = [0, 691, 2105, 3164]  # parser_test.go:1079-1246

SLOW011_RATE = [  # parser_test.go:783-899 (Percona rate-limit fields)
    {"offset": 0, "rate_type": "query", "rate_limit": 2, "ts": "131128  1:05:31",
     "db": "maindb", "user": "user1", "host": "localhost",
     "query": "SELECT foo FROM bar WHERE id=1",
     "time_metrics": {"Query_time": 0.000228, "Lock_time": 0.000114},
     "number_metrics": {"Bytes_sent": 545, "InnoDB_pages_distinct": 2},
     "bool_metrics": {"Filesort": False}},
    {"offset": 733, "rate_type": "query", "rate_limit": 2, "ts": "",
     "query": "SELECT foo FROM bar WHERE id=2"},
    {"offset": 1441, "rate_type": "query", "rate_limit": 2,
     "query": "INSERT INTO foo VALUES (NULL, 3)",
     "bool_metrics": {"Filesort": True}},
]


def test_slow001_literal():
    got = [_row_to_dict(r) for _, r in _parse_fixture("slow001.log").iterrows()]
    assert len(got) == 2
    for i, (g, e) in enumerate(zip(got, SLOW001)):
        _assert_literal(g, e, f"slow001[{i}]")


def test_slow008_literal():
    got = [_row_to_dict(r) for _, r in _parse_fixture("slow008.log").iterrows()]
    assert len(got) == 3
    for i, (g, e) in enumerate(zip(got, SLOW008)):
        _assert_literal(g, e, f"slow008[{i}]")


def test_slow012_literal():
    got = [_row_to_dict(r) for _, r in _parse_fixture("slow012.log").iterrows()]
    assert len(got) == 3
    for i, (g, e) in enumerate(zip(got, SLOW012)):
        _assert_literal(g, e, f"slow012[{i}]")


def test_slow011_rate_limits_literal():
    got = [_row_to_dict(r) for _, r in _parse_fixture("slow011.log").iterrows()]
    assert len(got) == 3
    for i, (g, e) in enumerate(zip(got, SLOW011_RATE)):
        _assert_literal(g, e, f"slow011[{i}]")


def test_offsets_meta_and_pseudoheaders():
    assert list(_parse_fixture("slow013.log")["offset"]) == SLOW013_OFFSETS
    assert list(_parse_fixture("slow014.log")["offset"]) == SLOW014_OFFSETS
    # slow014 keeps '### Channels ###' pseudo-header lines inside query text
    q = _parse_fixture("slow014.log").iloc[1]["query"]
    assert q.startswith("### Channels ###\n")


def test_admin_filter():  # parser_test.go:738-777
    got = _parse_fixture("slow009.log", admin_filter=frozenset({"Quit"}))
    assert len(got) == 1
    _assert_literal(
        _row_to_dict(got.iloc[0]),
        {"query": "Refresh", "admin": True, "offset": 197, "ts": "090311 18:11:50",
         "user": "root", "host": "localhost", "db": ""},
        "slow009[0]",
    )
    assert len(_parse_fixture("slow009.log")) == 2  # unfiltered


def test_resume_start_offset():  # parser_test.go:1255-1280
    got = _parse_fixture("slow001.log", start=359)
    assert len(got) == 1
    assert int(got.iloc[0]["offset"]) == 383
    assert got.iloc[0]["db"] == "sakila"


def test_resume_partial_discard():  # parser_test.go:1290-1341
    g16 = _parse_fixture("slow016.log")  # starts mid-header: partial discarded
    g17 = _parse_fixture("slow017.log")  # starts mid-query: leading lines idle-skipped
    assert [int(g16.iloc[0]["offset"]), len(g16)] == [160, 1]
    assert [int(g17.iloc[0]["offset"]), len(g17)] == [27, 1]
    assert g17.iloc[0]["query"] == "SHOW /*!50002 GLOBAL */ STATUS"


def test_slow015_long_line():  # parser_test.go:1284-1287
    assert len(_parse_fixture("slow015.log")) == 2


# -- Strict layer: full pinned behavior ---------------------------------------

def test_all_fixtures_strict_pandas():
    golden = json.load(open(GOLDEN))
    for name, expect in golden.items():
        got = [_row_to_dict(r) for _, r in _parse_fixture(name).iterrows()]
        assert got == expect, f"{name}: strict mismatch"


def test_all_fixtures_strict_spark(spark):
    """End-to-end: tokenized input table -> parse_slowlog -> event rows."""
    golden = json.load(open(GOLDEN))
    rows = []
    for name in golden:
        text = open(os.path.join(LOGS, name)).read()
        rows.append(tokenizer.doc_rows(name, text, source=name))
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )
    out = parse_slowlog(df).orderBy("doc_id", "event_idx").collect()
    got_by_doc = {}
    for r in out:
        d = r.asDict(recursive=True)
        got_by_doc.setdefault(d["doc_id"], []).append(
            {
                "offset": d["offset"], "ts": d["ts"], "admin": d["admin"],
                "query": d["query"], "user": d["user"], "host": d["host"],
                "db": d["db"], "rate_type": d["rate_type"],
                "rate_limit": d["rate_limit"],
                "time_metrics": d["time_metrics"],
                "number_metrics": d["number_metrics"],
                "bool_metrics": d["bool_metrics"],
            }
        )
    for name, expect in golden.items():
        got = got_by_doc.get(name, [])
        assert len(got) == len(expect), f"{name}: {len(got)} != {len(expect)} events"
        for i, (g, e) in enumerate(zip(got, expect)):
            for k in ("offset", "ts", "admin", "query", "user", "host", "db",
                      "rate_type", "rate_limit", "number_metrics", "bool_metrics"):
                assert g[k] == e[k], f"{name}[{i}].{k}: {g[k]!r} != {e[k]!r}"
            assert g["time_metrics"].keys() == e["time_metrics"].keys(), f"{name}[{i}]"
            for mk, mv in e["time_metrics"].items():
                assert math.isclose(g["time_metrics"][mk], mv, rel_tol=1e-6, abs_tol=1e-9), (
                    f"{name}[{i}].time_metrics[{mk}]"
                )


def test_token_roundtrip_all_fixtures():
    """Per-row token-array invariant (BASELINE.json input_hint)."""
    for name in os.listdir(LOGS):
        text = open(os.path.join(LOGS, name)).read()
        toks = tokenizer.encode(text)
        assert tokenizer.decode(toks) == text, name
