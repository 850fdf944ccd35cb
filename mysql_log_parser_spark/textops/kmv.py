"""K-minimum-values (bottom-k) distinct-set sketches per key.

The exact cross-source trigram-overlap audits (entry_queries_textops
`source_overlap` / `ngram_novelty`) are keyed joins — the right SHAPE — but
their distinct (source, trigram) relation grows ~linearly with the corpus,
so at 10^12 rows every audit re-shuffles a corpus-scale table.  This module
is the scale path: a per-source KMV sketch of the trigram set, built with
MG-summary-style bounded partials (textops/heavyhitters.py), from which
distinct counts, Jaccard, intersection and containment ("share of a's
trigrams also in b") are estimated without ever shuffling the trigram
relation — per-source state is k hashes, the pairwise stage is
|sources|^2 sketch rows.

Estimators (Beyer et al. 2007, "On synopses for distinct-value estimation"):
- distinct(A)   ~= (k-1) * H / h_k  with h_k the k-th smallest hash and
  H = 2^48 the hash space; EXACT (= sketch size) when |A| < k.
- With U = bottom-k of (sketch_A ∪ sketch_B): any x in U that belongs to A
  is necessarily in sketch_A (fewer than k union hashes below it), so
  J ~= |{x in U : x in sketch_A and x in sketch_B}| / |U| is the standard
  KMV Jaccard estimate; intersection ~= J * distinct(A ∪ B).

Hashes are the 48-bit md5 halves used across the repo (deterministic, no
RNG state, identical in any engine) — a sketch built today merges with one
built next year.  Sketches MERGE losslessly (bottom-k of a union of
bottom-k partials = bottom-k of the union), which is what makes the partial
-> merge shape exact w.r.t. the sketch definition, not an approximation of
it.

The reference has no sketch beyond GK quantiles (ref log/stats.go:65);
like the MG heavy hitters this is a north-star operator for the 100 TB
audit path.  The exact operators remain the correctness gates; the gate
query for this module (`source_overlap_sketch`) runs both and asserts the
estimate lands inside its error band.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 48-bit md5-half hash space, shared with the minhash/shingle machinery.
KMV_HASH_SPACE = float(1 << 48)


def md5_48(item: Column) -> Column:
    """First 48 bits of md5 as a long — the repo-standard deterministic
    item hash (see textops/dedup.py minhash)."""
    return F.conv(F.substring(F.md5(item), 1, 12), 16, 10).cast("long")


def kmv_sketch_per_key(
    df: DataFrame,
    key_col: str = "source",
    items_col: str = "hs",
    k: int = 256,
) -> DataFrame:
    """(key, items array<long>) rows -> one (key, sketch array<long>) row
    per key, sketch = the k smallest DISTINCT item hashes, ascending.

    Two-level bounded merge, never a corpus-scale shuffle:
    1. per-PARTITION per-key bottom-k partials in one Arrow-batched
       mapInPandas pass (numpy unique keeps partial state <= k per key —
       the MG-summary shape, textops/heavyhitters.py);
    2. one groupBy(key) whose collect_list holds <= partitions sketches of
       <= k hashes each, merged in Catalyst (flatten -> distinct -> sort ->
       slice).  The shuffle carries partials, not items.
    """
    kk = int(k)
    import numpy as np

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict = {}
        for pdf in batches:
            if not len(pdf):
                continue
            for key, arrs in pdf.groupby(key_col, sort=False)[items_col]:
                chunks = [np.asarray(a, dtype=np.int64) for a in arrs if len(a)]
                if acc.get(key) is not None:
                    chunks.append(acc[key])
                if not chunks:
                    acc.setdefault(key, np.empty(0, dtype=np.int64))
                    continue
                acc[key] = np.unique(np.concatenate(chunks))[:kk]
        if acc:
            yield pd.DataFrame(
                {key_col: list(acc.keys()), "part": [a for a in acc.values()]}
            )

    parts = df.select(key_col, items_col).mapInPandas(
        partials, f"{key_col} string, part array<long>"
    )
    return parts.groupBy(key_col).agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("part")))),
            1,
            kk,
        ).alias("sketch")
    )


def kmv_distinct_est(sketch: Column, k: int) -> Column:
    """Estimated distinct count: exact sketch size below k, else the KMV
    estimator (k-1) * H / h_k."""
    return F.when(
        F.size(sketch) < k, F.size(sketch).cast("double")
    ).otherwise(F.lit(float(k - 1)) * F.lit(KMV_HASH_SPACE) / F.element_at(sketch, k))


def kmv_pairwise_containment(sketches: DataFrame, k: int) -> DataFrame:
    """All ordered key pairs (a != b) with estimated overlap:
    (key_a, key_b, jaccard_est, union_est, inter_est, a_est, share_est)
    where share_est estimates |A n B| / |A| — the `source_overlap` metric.

    |keys|^2 sketch-row work only; every estimate is pure Catalyst array
    math over the two k-length sketches.  The union sketch is materialized
    in its own projection once (HOF results are interpreted and never
    CSE'd — referencing it from four estimators would re-fold it four
    times)."""
    a = sketches.select(
        F.col(sketches.columns[0]).alias("key_a"), F.col("sketch").alias("sk_a")
    )
    b = sketches.select(
        F.col(sketches.columns[0]).alias("key_b"), F.col("sketch").alias("sk_b")
    )
    pairs = a.join(F.broadcast(b), F.col("key_a") != F.col("key_b"))
    pairs = pairs.withColumn(
        "_u",
        F.slice(F.array_sort(F.array_distinct(F.concat("sk_a", "sk_b"))), 1, k),
    )
    m = F.size(
        F.filter(
            "_u",
            lambda x: F.array_contains("sk_a", x) & F.array_contains("sk_b", x),
        )
    )
    pairs = pairs.withColumn("_m", m).withColumn(
        "union_est", kmv_distinct_est(F.col("_u"), k)
    )
    jac = F.when(
        F.size("_u") > 0, F.col("_m") / F.size("_u")
    ).otherwise(F.lit(0.0))
    pairs = (
        pairs.withColumn("jaccard_est", jac)
        .withColumn("inter_est", F.col("jaccard_est") * F.col("union_est"))
        .withColumn("a_est", kmv_distinct_est(F.col("sk_a"), k))
    )
    share = F.when(
        F.col("a_est") > 0, F.col("inter_est") / F.col("a_est")
    ).otherwise(F.lit(0.0))
    return pairs.select(
        "key_a", "key_b", "jaccard_est", "union_est", "inter_est", "a_est",
        share.alias("share_est"),
    )
