"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
SIGMOD 2003 — the MOSS local fingerprinting algorithm): hash every
character k-gram, then in each sliding window of w consecutive hashes
select the minimum (rightmost position on ties) and keep the distinct
selected (position, hash) pairs.  Winnowing guarantees any shared
substring of length >= k + w - 1 yields at least one shared fingerprint
(the local property simhash/minhash lack), with expected density
2/(w+1) — the standard building block for substring-level dup mining
and plagiarism-style containment checks over a training corpus.

Spark shapes (same kernel-pair contract as textops/pq.py and the
centroid/hyperplane kernels in textops/similarity.py):

- ``kernel='arrow'`` (the production default): one ``mapInPandas`` pass;
  each doc's k-gram hashes, sliding-window min, and per-doc dedup happen
  locally in numpy, so the operator emits ~2·n/(w+1) rows per doc with
  ZERO shuffle before any downstream aggregation.  This is the 100 TB
  shape — fingerprint selection is embarrassingly per-doc.
- ``kernel='catalyst'`` (the oracle-mirror form): explode one row per
  k-gram position, window min over (doc_id ORDER BY pos), distinct.
  DuckDB replays it digit-for-digit (entry_queries_textops), but the
  explode is one row PER CHARACTER — at corpus scale that shuffle is the
  reason the arrow kernel is the default.  Both kernels are
  parity-tested for identical output (tests/test_winnow.py).

Engine portability: hashes are the first 8 hex digits of md5 over the
RAW k-gram (no lowercasing — unicode case-folding is the one spot the
three engines could disagree); min-with-rightmost-tie-break is encoded
into a single BIGINT ``h * POSCAP + (POSCAP - 1 - pos)`` so plain
``min()`` implements the paper's tie rule in any engine.  Docs longer
than POSCAP-1 characters fail loudly (same contract as the rawlog
overlap guard) rather than silently corrupting the position encoding.

No counterpart in the Go reference — training-data-pipeline surface
(SURVEY.md 'beyond the reference' list: document fingerprinting).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: position slots per hash in the combined bigint encoding; docs must be
#: shorter than this many characters (1 MiB of text) or the guard fires.
POSCAP = 1 << 20

#: defaults: guarantee threshold t = K + W - 1 = 8 shared characters.
K = 5
W = 4


def _combined(h: F.Column, pos: F.Column) -> F.Column:
    """min(combined) == (min hash, rightmost position): the position is
    stored complemented so larger pos sorts smaller within equal hashes."""
    return h * F.lit(POSCAP) + (F.lit(POSCAP - 1) - pos)


def winnow_fingerprints_catalyst(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    k: int = K, w: int = W,
) -> DataFrame:
    """Explode + window-min form — one row per character position, so it
    shuffles the whole corpus by doc_id; exists as the SQL-mirrorable
    parity twin of the arrow kernel."""
    t = F.col(text_col)
    guarded = F.when(F.length(t) < POSCAP, t).otherwise(
        F.raise_error(
            F.concat(
                F.lit("winnow: doc "),
                F.col(id_col).cast("string"),
                F.lit(f" is >= {POSCAP} chars; POSCAP position encoding "
                      "would alias — split the doc or raise POSCAP"),
            )
        )
    )
    base = docs.where(F.length(t) >= k + w - 1).select(
        F.col(id_col),
        guarded.alias("_txt"),
        (F.length(t) - k + 1).alias("_npos"),
    )
    pos = base.select(
        id_col, "_npos", "_txt",
        F.explode(F.sequence(F.lit(1), F.col("_npos"))).alias("i"),
    )
    h = F.conv(
        F.substring(F.md5(F.substring(F.col("_txt"), F.col("i"), F.lit(k))), 1, 8),
        16, 10,
    ).cast("long")
    win = (
        Window.partitionBy(id_col).orderBy("i")
        .rowsBetween(Window.currentRow, w - 1)
    )
    sel = (
        pos.withColumn("c", _combined(h, F.col("i")))
        .withColumn("sel", F.min("c").over(win))
        .where(F.col("i") <= F.col("_npos") - (w - 1))
    )
    return sel.select(
        id_col,
        F.expr(f"sel DIV {POSCAP}").alias("fp"),
        (F.lit(POSCAP - 1) - F.col("sel") % POSCAP).alias("pos"),
    ).distinct()


def winnow_fingerprints_arrow(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    k: int = K, w: int = W,
) -> DataFrame:
    """Per-doc numpy kernel: O(n) hashing + vectorized sliding-window min
    + per-doc dedup inside one mapInPandas batch — zero shuffle."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import LongType, StructField, StructType

    id_field = docs.schema[id_col]
    out_schema = StructType([
        StructField(id_field.name, id_field.dataType),
        StructField("fp", LongType()),
        StructField("pos", LongType()),
    ])

    def gen(batches):
        for pdf in batches:
            ids: list = []
            fps: list = []
            poss: list = []
            for did, txt in zip(pdf[id_col], pdf[text_col]):
                if txt is None:
                    continue
                n = len(txt)
                if n >= POSCAP:
                    raise ValueError(
                        f"winnow: doc {did} is >= {POSCAP} chars; POSCAP "
                        "position encoding would alias — split the doc or "
                        "raise POSCAP"
                    )
                npos = n - k + 1
                if npos < w:
                    continue
                hs = np.fromiter(
                    (
                        int(hashlib.md5(txt[i:i + k].encode()).hexdigest()[:8], 16)
                        for i in range(npos)
                    ),
                    dtype=np.int64, count=npos,
                )
                c = hs * POSCAP + (POSCAP - 1 - np.arange(1, npos + 1, dtype=np.int64))
                sel = np.unique(
                    np.lib.stride_tricks.sliding_window_view(c, w).min(axis=1)
                )
                ids.extend([did] * len(sel))
                fps.append(sel // POSCAP)
                poss.append(POSCAP - 1 - (sel % POSCAP))
            yield pd.DataFrame({
                id_col: pd.Series(ids, dtype="int64" if not ids else None),
                "fp": np.concatenate(fps) if fps else np.array([], dtype=np.int64),
                "pos": np.concatenate(poss) if poss else np.array([], dtype=np.int64),
            })

    return docs.select(id_col, text_col).mapInPandas(gen, out_schema)


def winnow_fingerprints(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    k: int = K, w: int = W, kernel: str = "auto",
) -> DataFrame:
    """Distinct winnowed fingerprints, one row per selected (doc, pos, fp).
    kernel='auto' resolves to 'arrow' — per-doc-local selection is strictly
    the better distributed shape; 'catalyst' exists for the DuckDB oracle
    mirror and the parity test."""
    if kernel == "auto":
        kernel = "arrow"
    if kernel == "arrow":
        return winnow_fingerprints_arrow(docs, text_col, id_col, k, w)
    return winnow_fingerprints_catalyst(docs, text_col, id_col, k, w)
