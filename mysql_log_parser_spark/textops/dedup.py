"""Deduplication operators for large-scale text corpora — first-class
components of the engine alongside the log pipeline (the training-data side
of the tokens table).

All hot paths are native Catalyst expressions (array/lambda functions over
word shingles; md5-based deterministic hashing so results are portable and
oracle-checkable in any SQL engine).  Shapes:

- exact:      one groupBy on a content hash.                O(N) shuffle of hashes
- minhash+LSH: signatures are narrow column ops; candidate
  generation shuffles (band_key) only — never all pairs.   O(N*B) shuffle
- simhash:    narrow column op -> groupBy on the 16-bit key.
- n-gram Jaccard brute force: O(N^2) cross join — baseline / verifier only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_shingles(text: Column, n: int = 3) -> Column:
    """Lowercased word n-grams (distinct).  Empty array if < n words."""
    words = F.split(F.lower(F.trim(text)), r"\s+")
    count = F.greatest(F.size(words) - (n - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(1), count),
        lambda i: F.concat_ws(" ", F.slice(words, i, n)),
    )
    return F.array_distinct(F.when(count > 0, grams).otherwise(F.array()))


def _mh_one(shingles: Column, seed: int) -> Column:
    # NB: a closure, NOT a default-arg lambda — pyspark counts lambda params,
    # and a 2-param lambda is resolved as the (element, index) form.
    return F.array_min(
        F.transform(shingles, lambda s: F.md5(F.concat(F.lit(f"{seed}:"), s)))
    )


def minhash_signature(shingles: Column, num_hashes: int = 16) -> list[Column]:
    """MinHash via lexicographic min of md5(seed || shingle) hex strings —
    deterministic, engine-portable, no RNG state."""
    return [_mh_one(shingles, i).alias(f"mh{i}") for i in range(num_hashes)]


def exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: groups of byte-identical texts (hash-groupBy)."""
    h = F.md5(F.col(text_col)).alias("content_hash")
    return (
        docs.select(h, F.col(id_col))
        .groupBy("content_hash")
        .agg(F.count(F.lit(1)).alias("dup_count"), F.min(id_col).alias("keep_id"))
        .where(F.col("dup_count") > 1)
    )


def with_minhash(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    return docs.withColumn("_sh", word_shingles(F.col(text_col), n)).select(
        "*", *minhash_signature(F.col("_sh"), num_hashes)
    ).drop("_sh")


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Banding: docs sharing any band of the signature become candidates.
    Shuffles (band_idx, band_key) — skew-safe for text because identical
    band keys are (near-)duplicates by construction."""
    rows = num_hashes // bands
    band_cols = [
        F.concat_ws("|", *[F.col(f"mh{b * rows + r}") for r in range(rows)]).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = sigs.select(F.col(id_col), *band_cols)
    long = banded.select(
        id_col,
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band_idx"), F.col(f"band{b}").alias("band_key"))
                for b in range(bands)
            ])
        ).alias("bk"),
    ).select(id_col, "bk.band_idx", "bk.band_key")
    a = long.alias("a")
    b = long.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def jaccard(sh_a: Column, sh_b: Column) -> Column:
    inter = F.size(F.array_intersect(sh_a, sh_b))
    union = F.size(F.array_union(sh_a, sh_b))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def minhash_dedup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.7,
) -> DataFrame:
    """MinHash-LSH near-dup pipeline: shingle -> minhash -> band ->
    bucket-join -> exact-Jaccard verify on candidates only."""
    sigs = with_minhash(docs, text_col, n, num_hashes)
    cands = lsh_candidate_pairs(sigs, id_col, num_hashes, bands)
    sh = docs.select(
        F.col(id_col), word_shingles(F.col(text_col), n).alias("sh")
    )
    return (
        cands.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs_bruteforce(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """All-pairs exact n-gram Jaccard (O(N^2)); the correctness baseline the
    LSH path is validated against.  Never run this at corpus scale."""
    sh = docs.select(F.col(id_col), word_shingles(F.col(text_col), n).alias("sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            jaccard(F.col("a.sh"), F.col("b.sh")).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def simhash(text: Column, bits: int = 16) -> Column:
    """SimHash over words: bit j votes +/-1 from the parity of hex digit j of
    md5(word); the key's bit j is 1 iff the vote sum is positive.  Hex-digit
    parity (instead of raw bit extraction) keeps the definition expressible
    in any SQL engine for oracle checks.  Returns an int key in [0, 2^bits)."""
    assert bits <= 32
    words = F.split(F.lower(F.trim(text)), r"\s+")
    hashes = F.transform(words, lambda w: F.md5(w))
    hexd = "0123456789abcdef"

    def vote(j: int) -> Column:  # closure: see _mh_one note on lambda arity
        return F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + ((F.instr(F.lit(hexd), F.substring(h, j + 1, 1)) - 1) % 2) * 2
            - 1,
        )

    out = F.lit(0).cast("long")
    for j in range(bits):
        out = out + F.when(vote(j) > 0, F.lit(2**j)).otherwise(F.lit(0))
    return out


def simhash_buckets(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16
) -> DataFrame:
    """Groups of docs sharing a SimHash key (near-dup candidates)."""
    return (
        docs.select(F.col(id_col), simhash(F.col(text_col), bits).alias("simhash"))
        .groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("bucket_size"), F.sort_array(F.collect_list(id_col)).alias("ids"))
        .where(F.col("bucket_size") > 1)
    )
