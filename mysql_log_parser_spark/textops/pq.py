"""Product quantization (Jégou et al. 2011) for ANN at memory-bounded
scale: compress each d-dim vector to M small codes (one per subspace) and
score queries against codes via an asymmetric-distance lookup table (ADC)
— the index layout behind FAISS IVF-PQ, which is how 10^11-vector corpora
actually get searched (raw float storage at 100 TB of embeddings is the
thing PQ exists to avoid: d=768 float32 = 3 KB/vector vs M=96 bytes).

Spark shapes:

- ``pq_encode``: narrow map — per subspace, argmin squared-L2 over the Ks
  codebook centroids, computed as literal dot-folds (the hyperplane-LSH
  pattern, textops/similarity.py); the |v_m|^2 term is constant across
  candidates so argmin uses -2*v_m.c + |c|^2 only.  At production
  M*Ks*d the literal tree hands over to an Arrow matmul kernel exactly
  like hyperplane_signatures_arrow — the switch pattern already exists in
  this repo; gate dims (M=4, Ks=8, d=64) stay on the Catalyst path the
  oracle can replay.
- ``adc_lut_cols``: per-QUERY lookup table — M arrays of Ks true squared
  distances (|q_m|^2 - 2 q_m.c + |c|^2).  Queries are few; the LUT rides
  the broadcast with them.
- scoring: codes side joins the broadcast query side, ADC = fixed-order
  sum of M ``element_at(lut_m, code_m + 1)`` lookups — no per-row float
  vector math at all, which is the entire point of ADC.

Codebooks here are deterministic md5 literals (the k-means operators in
entry_queries_ext train real ones in production); vectors are encoded RAW,
not as cell residuals — FAISS's residual encoding needs the cell centroid
subtracted first, which at gate exactness would mean referencing a zip_with
column M times (the interpreted-HOF-no-CSE trap, CLAUDE.md); the Arrow
kernel path lifts that restriction at scale.  No counterpart in the Go
reference — training-data-pipeline surface.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def pq_codebooks(m: int, ks: int, dim: int, salt: str = "pq") -> list[list[list[float]]]:
    """codebooks[s][c] = centroid c of subspace s (length dim//m) — md5
    literals in [-1, 1], identical on both engines."""
    sub = dim // m
    books = []
    for s in range(m):
        cents = []
        for c in range(ks):
            row = []
            for j in range(sub):
                h = hashlib.md5(f"{salt}s{s}c{c}d{j}".encode()).hexdigest()
                row.append(((int(h[:8], 16) % 2001) - 1000) / 1000.0)
            cents.append(row)
        books.append(cents)
    return books


def _dot_slice(v: Column, start: int, lits: list[float]) -> Column:
    """Sequential-fold dot of v[start : start+len(lits)] with a literal —
    index-order fold in BOTH engines (Spark aggregate, DuckDB
    list_dot_product), so the doubles agree bit-for-bit."""
    sub = F.slice(v, start + 1, len(lits))
    arr = F.array(*[F.lit(x) for x in lits])
    return F.aggregate(
        F.zip_with(sub, arr, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )


def pq_code_cols(v: Column, books: list[list[list[float]]]) -> list[Column]:
    """One code column per subspace: argmin_c (-2 v_m.c + |c|^2), ties to
    the smallest code index (max over struct (-dist, -code))."""
    cols = []
    sub = len(books[0][0])
    for s, cents in enumerate(books):
        cands = F.array(
            *[
                F.struct(
                    (
                        F.lit(-2.0) * _dot_slice(v, s * sub, c)
                        + F.lit(sum(x * x for x in c))
                    ).alias("d"),
                    F.lit(-ci).alias("nc"),
                )
                for ci, c in enumerate(cents)
            ]
        )
        best = F.array_max(
            F.transform(cands, lambda x: F.struct((-x["d"]).alias("nd"), x["nc"]))
        )
        cols.append((-best["nc"]).cast("int").alias(f"code{s}"))
    return cols


def adc_lut_cols(qv: Column, books: list[list[list[float]]]) -> list[Column]:
    """Per-query ADC lookup tables: lut{s} = array of Ks TRUE squared
    distances |q_m - c|^2 expanded as qq - 2 q.c + cc (no subtraction
    fold, so both engines evaluate the identical expression tree)."""
    cols = []
    sub = len(books[0][0])
    for s, cents in enumerate(books):
        lut = F.array(
            *[
                _dot_slice(qv, s * sub, c) * F.lit(-2.0)
                + F.lit(sum(x * x for x in c))
                + _sq_norm_slice(qv, s * sub, sub)
                for c in cents
            ]
        )
        cols.append(lut.alias(f"lut{s}"))
    return cols


def _sq_norm_slice(v: Column, start: int, n: int) -> Column:
    sub = F.slice(v, start + 1, n)
    return F.aggregate(
        F.transform(sub, lambda a: a * a), F.lit(0.0), lambda acc, x: acc + x
    )


def adc_distance(m: int) -> Column:
    """Fixed-order sum of the M LUT lookups (columns lut{s} on the query
    side, code{s} on the index side) — the only per-pair work ADC does."""
    expr = F.element_at(F.col("lut0"), (F.col("code0") + 1).cast("int"))
    for s in range(1, m):
        expr = expr + F.element_at(F.col(f"lut{s}"), (F.col(f"code{s}") + 1).cast("int"))
    return expr


def pq_encode_arrow(
    df, books: list[list[list[float]]], vec_col: str = "v", prefix: str = "code"
):
    """Arrow-kernel PQ encoder — the production path once M*Ks*sub literals
    would blow past the Catalyst tree (same switch threshold as the
    centroid/hyperplane kernels, textops/similarity._ARROW_LITERAL_SWITCH):
    one mapInPandas pass computes all M argmins per batch as numpy matmuls
    (-2 V_m @ C_m^T + |c|^2, argmin per row; np.argmin takes the first
    minimum, matching the Catalyst tie-break to the smallest code).  Plan
    size is O(1) in M, Ks, and dim; the codebook rides the closure, not
    the plan."""
    import numpy as np
    import pandas as pd  # noqa: F401

    from pyspark.sql.types import IntegerType, StructField, StructType

    m = len(books)
    sub = len(books[0][0])
    mats = [np.asarray(b, dtype=np.float64) for b in books]  # (Ks, sub) each
    ccs = [np.sum(c * c, axis=1) for c in mats]
    # Fresh StructType: StructType.add mutates in place, and df.schema is the
    # DataFrame's cached schema object — mutating it desyncs df.columns.
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField(f"{prefix}{s}", IntegerType()) for s in range(m)]
    )

    def encode(batches):
        for pdf in batches:
            if len(pdf) == 0:
                for s in range(m):
                    pdf[f"{prefix}{s}"] = np.array([], dtype=np.int32)
                yield pdf
                continue
            if pdf[vec_col].isna().any():
                raise ValueError(
                    f"pq_encode: null {vec_col!r} vector in batch — PQ codes "
                    "for null vectors are undefined; filter nulls first "
                    "(the catalyst kernel would emit null codes here, so a "
                    "silent skip would break kernel parity)"
                )
            v = np.stack(pdf[vec_col].map(np.asarray).to_numpy()).astype(np.float64)
            for s in range(m):
                vm = v[:, s * sub : (s + 1) * sub]
                dist = -2.0 * (vm @ mats[s].T) + ccs[s]
                pdf[f"{prefix}{s}"] = np.argmin(dist, axis=1).astype(np.int32)
            yield pdf

    return df.mapInPandas(encode, out_schema)


def pq_encode(
    df,
    books: list[list[list[float]]],
    vec_col: str = "v",
    prefix: str = "code",
    kernel: str = "auto",
):
    """Append the M PQ code columns.  kernel='catalyst' is the literal-fold
    form the DuckDB oracle replays digit-for-digit; 'arrow' is the
    constant-plan-size matmul form for production M*Ks*dim; 'auto' switches
    on the literal-count threshold shared with the other ANN kernels."""
    from mysql_log_parser_spark.textops.similarity import _ARROW_LITERAL_SWITCH

    m = len(books)
    ks = len(books[0])
    sub = len(books[0][0])
    if kernel == "auto":
        kernel = "arrow" if m * ks * sub >= _ARROW_LITERAL_SWITCH else "catalyst"
    if kernel == "arrow":
        return pq_encode_arrow(df, books, vec_col, prefix)
    cols = pq_code_cols(F.col(vec_col), books)
    return df.select("*", *[c.cast("int").alias(f"{prefix}{s}") for s, c in enumerate(cols)])
