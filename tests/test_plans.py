"""Physical-plan guards: the properties that make the pipeline hold at
1000-executor / 100TB scale are asserted on the plan itself, so a regression
(a row-wise Python UDF sneaking into the hot path, a broadcast turning into
a shuffle join, a scan losing pruning/pushdown) fails CI, not production.
"""

import pytest
from pyspark.sql import functions as F

from mysql_log_parser_spark import synth
from mysql_log_parser_spark.functions.fingerprint import with_fingerprint
from mysql_log_parser_spark.operators.aggregate import class_digest
from mysql_log_parser_spark.operators.enrich import build_dims, enrich_events
from mysql_log_parser_spark.operators.parse import parse_slowlog, promote_metrics
from mysql_log_parser_spark.sources.tokens_table import TokensTable


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def tokens_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tokens")
    synth.generate_parquet(str(d / "c0.parquet"), n_docs=6, events_per_doc=8, seed=13)
    return str(d)


def test_pipeline_has_no_rowwise_python(spark, tokens_dir):
    ev = promote_metrics(with_fingerprint(parse_slowlog(spark.read.parquet(tokens_dir))))
    plan = _plan(class_digest(ev, mode="sketch"))
    assert "BatchEvalPython" not in plan, "row-at-a-time Python UDF in the hot path"
    assert ("MapInArrow" in plan) or ("MapInPandas" in plan), "parse kernel missing"


def test_fingerprint_is_jvm_side(spark, tokens_dir):
    ev = parse_slowlog(spark.read.parquet(tokens_dir))
    plan = _plan(with_fingerprint(ev).select("fingerprint", "class_id"))
    # the regex chain must be Catalyst expressions, not any kind of Python eval
    assert "EvalPython" not in plan


def test_enrich_is_broadcast_join(spark, tokens_dir):
    ev = promote_metrics(with_fingerprint(parse_slowlog(spark.read.parquet(tokens_dir))))
    dims = build_dims(spark)
    enriched = enrich_events(
        ev, dims["dim_host"], dims["dim_db"], dims["dim_user"]
    )
    plan = _plan(enriched)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, "dim join fell back to a shuffle join"


def test_scan_prunes_columns(spark, tokens_dir):
    df = TokensTable(spark, tokens_dir).read().select("doc_id", "source")
    plan = _plan(df)
    assert "ReadSchema" in plan
    read_schema = plan[plan.index("ReadSchema") :].splitlines()[0]
    assert "tokens" not in read_schema, "projection did not prune the fat tokens column"
    assert "doc_id" in read_schema


def test_scan_pushes_filters(spark, tokens_dir):
    df = TokensTable(spark, tokens_dir).read(min_tokens=10, sources=["s0"])
    plan = _plan(df.select("doc_id"))
    pushed = plan[plan.index("PushedFilters") :].splitlines()[0]
    assert "n_tok" in pushed and "source" in pushed, pushed


def test_class_agg_is_partial_final(spark, tokens_dir):
    ev = promote_metrics(with_fingerprint(parse_slowlog(spark.read.parquet(tokens_dir))))
    plan = _plan(ev.groupBy("class_id").agg(F.count(F.lit(1)).alias("n")))
    # partial (map-side) aggregation must appear before the exchange
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan
