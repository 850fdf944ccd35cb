"""Lookup-table enrichment: broadcast dimension joins on host/db/user.

The reference has no joins (SURVEY.md §2.8); enrichment is a north-star
addition (BASELINE.json north_star).  Dims are small by construction
(thousands of hosts/users/dbs vs 10^12 events), so the only sane physical
plan is a broadcast hash join per dim — no shuffle of the event stream.
`broadcast()` is applied explicitly so the plan does not depend on
autoBroadcastJoinThreshold statistics being available.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def enrich_events(
    events: DataFrame,
    dim_host: DataFrame | None = None,
    dim_db: DataFrame | None = None,
    dim_user: DataFrame | None = None,
) -> DataFrame:
    """Left-join the dims; unknown keys keep null attributes (null-safe)."""
    out = events
    if dim_host is not None:
        out = out.join(F.broadcast(dim_host), on="host", how="left")
    if dim_db is not None:
        out = out.join(F.broadcast(dim_db), on="db", how="left")
    if dim_user is not None:
        out = out.join(F.broadcast(dim_user), on="user", how="left")
    return out


# -- Deterministic in-repo dim generation (FIXTURES.md §5) --------------------

_FIXTURE_HOSTS = ["localhost", "", "db-prod-1", "db-prod-2", "replica-1"]
_FIXTURE_USERS = [
    "root", "[SQL_SLAVE]", "meow", "msandbox", "user1", "pt_agent",
    "debian-sys-maint", "svc_etl",
]
_FIXTURE_DBS = [
    "test", "sakila", "db", "db1", "db2", "maindb", "dev_pct", "foo", "bar",
    "db950", "db961", "db1006",
]


def build_dims(spark: SparkSession) -> dict[str, DataFrame]:
    """Tiny deterministic dim tables covering every host/db/user in the
    fixtures, plus guaranteed-unmatched rows to exercise left-join nulls."""
    hosts = [
        (h, f"dc{i % 3}", "prod" if i % 2 == 0 else "staging")
        for i, h in enumerate(_FIXTURE_HOSTS)
    ] + [("never-matched-host", "dc9", "qa")]
    users = [
        (u, f"team{i % 4}", u.startswith("[") or u.endswith("_agent"))
        for i, u in enumerate(_FIXTURE_USERS)
    ] + [("never-matched-user", "team9", False)]
    dbs = [
        (d, f"svc_{d[:3]}", "gold" if i % 3 == 0 else "silver")
        for i, d in enumerate(_FIXTURE_DBS)
    ] + [("never-matched-db", "svc_none", "bronze")]
    return {
        "dim_host": spark.createDataFrame(hosts, "host string, datacenter string, env string"),
        "dim_user": spark.createDataFrame(users, "user string, team string, is_service boolean"),
        "dim_db": spark.createDataFrame(dbs, "db string, service string, tier string"),
    }
