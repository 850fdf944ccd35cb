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


def sequence_pack(
    docs: DataFrame,
    max_len: int = 512,
    order_col: str = "doc_id",
    part_col: str = "source",
    len_col: str = "n_tok",
) -> DataFrame:
    """Assign docs to fixed-length training sequences by contiguous greedy
    packing of the concatenated token stream, per partition key.

    Each doc's byte/token offset is the running sum of preceding docs'
    lengths within its partition (deterministic `order_col` order);
    `start_seq = offset // max_len`.  Docs may straddle sequence boundaries
    — this computes the assignment/offsets, the actual token slicing is a
    narrow follow-up map.

    Scale note: the cumulative sum is a window partitioned by `part_col`
    (source, shard, date...), so parallelism = partition-key cardinality —
    pick a key with enough distinct values; NEVER an unpartitioned global
    window at corpus scale.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = F.coalesce(F.sum(len_col).over(w), F.lit(0)).cast("long")
    return docs.select(
        part_col,
        order_col,
        F.col(len_col).cast("long").alias(len_col),
        off.alias("tok_offset"),
        F.floor(off / max_len).cast("long").alias("start_seq"),
        F.floor((off + F.col(len_col) - 1) / max_len).cast("long").alias("end_seq"),
    )


def pack_sequences(
    docs: DataFrame,
    max_len: int = 512,
    order_col: str = "doc_id",
    part_col: str = "source",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Materialize the fixed-length training sequences: per partition key,
    concatenate doc token arrays in `order_col` order and slice into
    max_len chunks (final short chunk kept, unpadded).

    Arrow-batched applyInPandas per partition key — the whole group must fit
    one worker, so `part_col` should be a sharding key of bounded size
    (source+date, shard id); `sequence_pack` (the assignment pass) is the
    planning twin that stays fully vectorized.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    part_field = docs.schema[part_col]
    out_schema = StructType(
        [
            StructField(part_field.name, part_field.dataType),
            StructField("seq_id", LongType()),
            StructField("n_tok", IntegerType()),
            StructField("tokens", ArrayType(IntegerType())),
        ]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        stream = np.concatenate(
            [np.asarray(t, dtype=np.int32) for t in pdf[tokens_col]]
        ) if len(pdf) else np.array([], dtype=np.int32)
        chunks = [
            stream[i : i + max_len] for i in range(0, len(stream), max_len)
        ]
        return pd.DataFrame(
            {
                part_field.name: pdf[part_col].iloc[0] if len(pdf) else None,
                "seq_id": range(len(chunks)),
                "n_tok": [len(c) for c in chunks],
                "tokens": chunks,
            }
        )

    return (
        docs.select(part_col, order_col, tokens_col)
        .groupBy(part_col)
        .applyInPandas(pack, out_schema)
    )


def upsample(
    docs: DataFrame,
    weights: dict[str, float],
    stratum_col: str = "source",
    id_col: str = "doc_id",
    default_weight: float = 1.0,
    salt: str = "mix",
) -> DataFrame:
    """Domain-mixing upsampler: repeat each row floor(w) times plus one more
    with probability frac(w) — so a stratum with weight 2.3 contributes each
    doc 2 or 3 times, deterministically per id (Wikipedia-x3-style mixture
    weights at 10^12 rows need partition-stable repeats, not df.sample).

    Weight 0.x downsamples (0 or 1 copies); output carries `copy_idx`
    (1..n) so downstream shuffles can decorrelate the copies.  Pure narrow
    ops: a when-chain for the weight, one hash, one explode."""
    u = unit_hash(F.col(id_col), salt)
    w = F.lit(float(default_weight))
    for k, v in sorted(weights.items()):
        w = F.when(F.col(stratum_col) == k, F.lit(float(v))).otherwise(w)
    n = (F.floor(w) + (u < (w - F.floor(w))).cast("long")).cast("int")
    return (
        docs.withColumn("_n", n)
        .where(F.col("_n") > 0)
        .withColumn("copy_idx", F.explode(F.sequence(F.lit(1), F.col("_n"))))
        .drop("_n")
    )


def take_token_budget(
    docs: DataFrame,
    budget: int,
    part_col: str = "source",
    priority_col: str = "quality",
    id_col: str = "doc_id",
    len_col: str = "n_tok",
) -> DataFrame:
    """Keep the highest-priority docs per partition key until the token
    budget fills: running-sum window ordered by (priority desc, id), keep
    while cumulative tokens (INCLUDING this doc) fit.

    Same scale shape as sequence_pack: the window is partitioned by
    `part_col`, so parallelism = key cardinality and no global sort exists.
    A corpus-wide budget at scale = per-shard budgets that sum to it."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(part_col)
        .orderBy(F.desc(priority_col), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum(F.col(len_col).cast("long")).over(w)
    return (
        docs.withColumn("cum_tok", cum)
        .where(F.col("cum_tok") <= budget)
    )


def temperature_mix(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-scaled source mixing weights: p_s proportional to
    n_s^alpha (multilingual-pretraining standard — mBERT/XLM-R's
    exponential smoothing; alpha=1 keeps the natural mix, alpha->0
    approaches uniform).  Emits, per source, the token count, the natural
    and temperature-scaled shares, and the per-source upsample factor
    w_s = p_s * T / n_s that `upsample` consumes to realize the mix.

    Exactness: shares/factors are integer permille.  At alpha=0.5 the
    scaled mass uses sqrt (IEEE-correctly-rounded in every engine, so
    floor(sqrt(n)*1000) is bit-deterministic); other alphas go through
    pow(), which is NOT correctly rounded — fine for production, but the
    oracle gate pins alpha=0.5.  The two share columns use pure int64
    products (1000 * count), safe to ~9e15 total tokens — beyond any
    single-table corpus here.  The factor column's cross product
    s_mass * total_tokens overflows int64 at only ~5e8 tokens/source, so
    it is computed in IEEE doubles instead: every input is an integer
    below 2**53 (exact in double) and *, /, floor are correctly rounded,
    so the permille value is still bit-identical across engines.

    Scale shape: one partial-agg groupBy(source) (source cardinality is
    tiny), a single-row total broadcast back — nothing else touches the
    corpus."""
    if alpha == 0.5:
        scaled = F.floor(F.sqrt(F.col("n_tokens").cast("double")) * 1000).cast("long")
    else:
        scaled = F.floor(
            F.pow(F.col("n_tokens").cast("double"), F.lit(alpha)) * 1000
        ).cast("long")
    from mysql_log_parser_spark.textops.quality import words_of

    per_src = (
        docs.select(F.col(source_col).alias("source"),
                    F.size(words_of(F.col(text_col))).cast("long").alias("n_tok"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("n_tokens"))
        .withColumn("s_mass", scaled)
    )
    totals = per_src.agg(
        F.sum("n_tokens").alias("_t"), F.sum("s_mass").alias("_sm")
    )
    return per_src.crossJoin(F.broadcast(totals)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.expr("(1000 * n_tokens) DIV _t").alias("share_permille"),
        F.expr("(1000 * s_mass) DIV _sm").alias("temp_share_permille"),
        F.expr(
            "CAST(floor(((CAST(s_mass AS DOUBLE) * CAST(_t AS DOUBLE))"
            " / (CAST(_sm AS DOUBLE) * CAST(n_tokens AS DOUBLE))) * 1000.0)"
            " AS BIGINT)"
        ).alias("factor_permille"),
    )


def calibrate_per_source(
    scored: DataFrame,
    score_col: str = "score",
    source_col: str = "source",
    id_col: str = "doc_id",
    cut_permille: int = 800,
) -> DataFrame:
    """Per-source percentile calibration of a quality score — the
    production selection rule "keep the top X% of EACH source": raw
    classifier/heuristic scores are not comparable across sources (a
    mediocre encyclopedia page outscores an excellent forum post), so a
    single global threshold over-prunes whole sources; every large
    curation stack thresholds per-source percentiles instead.

    Scale shape: NEVER a per-doc window over the corpus —
    ``percent_rank().over(Window.partitionBy(source))`` puts an entire
    source in ONE unsplittable WindowExec partition (the same trap the
    span-frequency fix removed, tests/test_plans.py).  The score must be
    BOUNDED-integer (e.g. permille), so the rank comes from the
    per-(source, score) HISTOGRAM: one groupBy shuffle bounded by
    |sources| x |score values| rows, a cumulative window over those few
    histogram rows only, then a broadcast join back onto the corpus.

    pct_permille = floor(1000 * docs-strictly-below / n_source) — the
    exact-integer percentile rank (ties share a rank, like SQL
    cume-below); keep iff pct_permille >= cut_permille (cut=800 keeps
    the top ~20% of each source)."""
    from pyspark.sql import Window

    hist = scored.groupBy(source_col, score_col).agg(
        F.count(F.lit(1)).alias("_n")
    )
    w = Window.partitionBy(source_col).orderBy(score_col)
    cum = hist.select(
        source_col,
        score_col,
        (F.sum("_n").over(w) - F.col("_n")).alias("_below"),
        F.sum("_n").over(Window.partitionBy(source_col)).alias("_tot"),
    )
    ranked = scored.join(F.broadcast(cum), [source_col, score_col])
    pct = F.expr("(1000 * _below) DIV _tot")
    return ranked.select(
        id_col,
        source_col,
        F.col(score_col).cast("long").alias(score_col),
        pct.cast("long").alias("pct_permille"),
        (pct >= cut_permille).alias("keep"),
    )
