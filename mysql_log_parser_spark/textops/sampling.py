"""Deterministic sampling / splitting for training-data pipelines.

Everything is a pure function of the row's id via md5 — no RNG state, no
seed files, reproducible across engines and cluster sizes, stable under
repartitioning (the classic requirement for train/val/test assignment at
10^12 rows: membership must never depend on partitioning or row order).

u(id) = first-8-hex-digits of md5(id || ':' || salt) / 2^32  in [0, 1)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def unit_hash(id_col: Column, salt: str = "split") -> Column:
    """Uniform [0,1) from the id — md5-based, engine-portable."""
    h = F.md5(F.concat(id_col.cast("string"), F.lit(f":{salt}")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / float(1 << 32)


def with_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    fractions: tuple[float, float, float] = (0.8, 0.1, 0.1),
    salt: str = "split",
) -> DataFrame:
    """Assign train/val/test by hash threshold: stable, exactly reproducible,
    disjoint and exhaustive."""
    train, val, _test = fractions
    u = unit_hash(F.col(id_col), salt)
    split = (
        F.when(u < train, F.lit("train"))
        .when(u < train + val, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return docs.withColumn("split", split)


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Keep each row with its stratum's rate — deterministic per-id, so the
    sample is stable across runs and cluster layouts (unlike df.sample)."""
    u = unit_hash(F.col(id_col), salt)
    rate = F.lit(default_rate)
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == k, F.lit(v)).otherwise(rate)
    return docs.where(u < rate)
