"""Hashing-trick linear text classifier — the execution shape of a
fastText-style quality/domain classifier applied at corpus scale (the
filter stage CCNet / RefinedWeb / FineWeb run over every crawled doc).

The MODEL here is a weight vector indexed by hashed unigram bucket.  In
production the weights come out of training and arrive as a small table;
in this repo they are synthesized deterministically from the bucket id
(``synthetic_weights``) so the DuckDB oracle can rebuild the identical
table with generate_series — the POINT is the distributed apply path,
which is exactly the production one:

  explode words -> hash to bucket (narrow, codegen) ->
  broadcast-join the <=n_buckets-row weight table ->
  per-doc integer sum -> threshold

Integer weights keep the gate engine-exact (no float-sum ordering); a
real model's float weights ride the same plan (floats only change the
final agg's dtype).  Scale: the weight table is bounded by construction
(the hashing trick's contract), the corpus is exploded once and shuffled
only by doc_id for the final sum.  No counterpart in the Go reference —
training-data-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_log_parser_spark.textops.dsir import hashed_bucket
from mysql_log_parser_spark.textops.quality import words_of


def synthetic_weights(
    spark: SparkSession, n_buckets: int, salt: str = "clfw", spread: int = 1000
) -> DataFrame:
    """Deterministic stand-in for a trained weight vector: one row per
    bucket, weight in [-spread, spread] derived from md5(bucket:salt) —
    reproducible across engines and runs, so gates don't depend on a
    checked-in model file."""
    h = F.md5(F.concat(F.col("id").cast("string"), F.lit(f":{salt}")))
    w = F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(2 * spread + 1)) - spread
    return spark.range(n_buckets).select(
        F.col("id").alias("bucket"), w.cast("long").alias("weight")
    )


def classify_docs(
    docs: DataFrame,
    weights: DataFrame,
    n_buckets: int,
    bias: int = 0,
    salt: str = "dsir",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score = bias + sum over words of weight[bucket(word)]; keep = score
    >= 0.  ``weights`` is (bucket, weight) with <= n_buckets rows and is
    explicitly broadcast — the model is small by the hashing-trick
    contract, and an implicit shuffle join here would put a corpus-wide
    exchange on the hot path for no reason.  Missing buckets (words whose
    bucket has no weight row) contribute 0, matching a sparse trained
    model."""
    words = docs.select(
        F.col(id_col), F.explode(words_of(F.col(text_col))).alias("word")
    ).withColumn("bucket", hashed_bucket(F.col("word"), n_buckets, salt))
    scored = words.join(F.broadcast(weights), "bucket", "left").select(
        id_col, F.coalesce("weight", F.lit(0)).alias("w")
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_words"),
        (F.sum("w") + F.lit(bias)).cast("long").alias("score"),
    ).select(
        id_col,
        F.col("n_words").cast("long").alias("n_words"),
        "score",
        (F.col("score") >= 0).alias("keep"),
    )
