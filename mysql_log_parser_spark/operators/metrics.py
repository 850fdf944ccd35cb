"""Pipeline metrics via Spark Observations — zero-cost counters that ride
the existing action instead of scheduling a second pass.

The north rule asks for "per-partition lineage and metrics emitted": lineage
is the checkpoint runner's manifest (operators/checkpoint.py); this module
is the metrics half for plain batch runs.  ``df.observe`` attaches aggregate
expressions that are computed DURING the job that materializes the frame —
map-side, merged like any partial aggregate — so a 10^12-row run pays
nothing beyond the counters themselves, and the driver reads the totals
off the completed action instead of re-scanning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_events(events: DataFrame, name: str = "mlp_events"):
    """Attach the standard pipeline counters to a parsed-events frame.

    Returns (events_with_observation, observation).  Read
    ``observation.get`` AFTER an action has materialized the frame — it
    blocks until the observed job finishes.

    Counters: events total, sum/max of Query_time, events with an empty
    fingerprint (parse fallthrough — should be 0), admin-command events.
    """
    obs = Observation(name)
    observed = events.observe(
        obs,
        F.count(F.lit(1)).alias("events"),
        F.sum(F.col("query_time").cast("double")).alias("qt_sum"),
        F.max(F.col("query_time").cast("double")).alias("qt_max"),
        F.sum(
            F.when(
                F.col("fingerprint").isNull() | (F.col("fingerprint") == ""), 1
            ).otherwise(0)
        ).alias("empty_fingerprints"),
        F.sum(F.when(F.col("admin"), 1).otherwise(0)).alias("admin_events"),
    )
    return observed, obs
