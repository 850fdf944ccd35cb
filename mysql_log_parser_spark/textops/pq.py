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
entry_queries_ext train real ones in production).  Vectors can be encoded
RAW (`pq_code_cols`) or as CELL RESIDUALS v - centroid[cell] — the FAISS
IVFADC layout proper, worth real recall at the same byte budget because the
codebook only has to cover the within-cell spread, not the whole space.
The residual path does NOT materialize a residual column (that would be a
zip_with referenced M*Ks times — the interpreted-HOF-no-CSE trap,
CLAUDE.md): the centroid contribution to every argmin/LUT term is a
per-(cell, subspace, code) CONSTANT precomputed in Python —
  -2·dot(v_m - cent_m, c) + |c|² = -2·dot(v_m, c) + [2·dot(cent_m, c) + |c|²]
— so the bracket is a literal array indexed by the row's cell id
(element_at), the only per-row work stays the SAME M*Ks dot folds as the
raw path, and the expression tree is digit-for-digit replayable in the
DuckDB oracle.  At production M*Ks*dim the Arrow kernel
(`pq_encode_residual_arrow`) subtracts the centroid in numpy instead.  No
counterpart in the Go reference — training-data-pipeline surface.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

#: kernel='auto' routing for the PQ encoders.  The generic literal switch
#: (similarity._ARROW_LITERAL_SWITCH = 8192) prices ONE fold per literal,
#: but an encode candidate is a nested argmin STRUCT (fold + struct alloc +
#: array_max comparator) — measured ~10-20x interpreter cost past ~hundreds
#: of structs (M=16/Ks=16 -> 36-42 s/query at sf0.1 on 2k rows, vs ~2 s on
#: arrow), while M=4/Ks=8 (32 structs) is fine and keeps the plan the
#: oracle-mirrored gates replay.  So 'auto' goes arrow once the TOTAL
#: argmin-struct count m*ks reaches this bound, independent of sub.
_ARGMIN_STRUCT_SWITCH = 128


def _pq_auto_kernel(m: int, ks: int, sub: int) -> str:
    from mysql_log_parser_spark.textops.similarity import _ARROW_LITERAL_SWITCH

    big_literals = m * ks * sub >= _ARROW_LITERAL_SWITCH
    many_structs = m * ks >= _ARGMIN_STRUCT_SWITCH
    return "arrow" if (big_literals or many_structs) else "catalyst"


def pq_codebooks(
    m: int, ks: int, dim: int, salt: str = "pq", scale: float = 1.0
) -> list[list[list[float]]]:
    """codebooks[s][c] = centroid c of subspace s (length dim//m) — md5
    literals in [-scale, scale], identical on both engines.  `scale`
    matches the codebook to the encoded distribution's spread (the
    1-parameter stand-in for k-means codebook training — residual
    encodings have a much tighter spread than raw vectors, which is
    exactly why residual wins recall at the same byte budget); powers of
    two keep the literals exact in both engines."""
    sub = dim // m
    books = []
    for s in range(m):
        cents = []
        for c in range(ks):
            row = []
            for j in range(sub):
                h = hashlib.md5(f"{salt}s{s}c{c}d{j}".encode()).hexdigest()
                row.append((((int(h[:8], 16) % 2001) - 1000) / 1000.0) * scale)
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


def adc_distance(m: int, lut_prefix: str = "lut", code_prefix: str = "code") -> Column:
    """Fixed-order sum of the M LUT lookups (columns {lut_prefix}{s} on the
    query side, {code_prefix}{s} on the index side) — the only per-pair
    work ADC does.  Prefixes let the raw and residual index layouts
    coexist in one frame."""
    expr = F.element_at(
        F.col(f"{lut_prefix}0"), (F.col(f"{code_prefix}0") + 1).cast("int")
    )
    for s in range(1, m):
        expr = expr + F.element_at(
            F.col(f"{lut_prefix}{s}"), (F.col(f"{code_prefix}{s}") + 1).cast("int")
        )
    return expr


def _dot_py(a, b) -> float:
    """Sequential Python dot — the deterministic constant-folding twin of
    _dot_slice/list_dot_product, used ONLY at plan-build time to
    precompute per-(cell, subspace, code) constants that both engines then
    embed as identical double literals."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def residual_const1(
    books: list[list[list[float]]], centroids: list[list[float]]
) -> list[list[list[float]]]:
    """c1[s][ci][cell] = 2·dot(cent_m(cell), c_ci) + |c_ci|² — the constant
    that turns the raw argmin/LUT term into the RESIDUAL one:
      -2·dot(v_m − cent_m, c) + |c|² = -2·dot(v_m, c) + c1[s][ci][cell].
    Precomputed in Python so no residual column ever exists in the plan
    (the HOF-no-CSE trap) and both engines embed identical literals."""
    sub = len(books[0][0])
    out = []
    for s, cents_s in enumerate(books):
        rows = []
        for c in cents_s:
            cc = sum(x * x for x in c)
            rows.append(
                [
                    2.0 * _dot_py(cent[s * sub : (s + 1) * sub], c) + cc
                    for cent in centroids
                ]
            )
        out.append(rows)
    return out


def pq_residual_code_cols(
    v: Column,
    cell: Column,
    books: list[list[list[float]]],
    centroids: list[list[float]],
) -> list[Column]:
    """Residual PQ codes (FAISS IVFADC): per subspace, argmin over the
    codebook of |(v_m − cent_m(cell)) − c|² — evaluated WITHOUT a residual
    column as -2·dot(v_m, c) + c1[s][ci][cell] (residual_const1), ties to
    the smallest code.  Same M*Ks dot folds per row as the raw encoder;
    the centroid contribution is one element_at per candidate."""
    c1 = residual_const1(books, centroids)
    sub = len(books[0][0])
    cols = []
    for s, cents_s in enumerate(books):
        cands = F.array(
            *[
                F.struct(
                    (
                        F.lit(-2.0) * _dot_slice(v, s * sub, c)
                        + F.element_at(
                            F.array(*[F.lit(x) for x in c1[s][ci]]),
                            (cell + 1).cast("int"),
                        )
                    ).alias("d"),
                    F.lit(-ci).alias("nc"),
                )
                for ci, c in enumerate(cents_s)
            ]
        )
        best = F.array_max(
            F.transform(cands, lambda x: F.struct((-x["d"]).alias("nd"), x["nc"]))
        )
        cols.append((-best["nc"]).cast("int").alias(f"rcode{s}"))
    return cols


def residual_lut_cols(
    qv: Column,
    cell: Column,
    books: list[list[list[float]]],
    centroids: list[list[float]],
    prefix: str = "rlut",
) -> list[Column]:
    """Per-query RESIDUAL ADC lookup tables: rlut{s}[c] = |r_m − c|² for
    the query residual r = q − centroid[cell], expanded so no residual
    column exists:
      (−2·dot(q_m, c) + c1[s][c][cell]) + qres_s,
      qres_s = |q_m|² + (−2)·dot(q_m, cent_m(cell)) + |cent_m(cell)|².
    The per-cell pieces are element_at lookups (dot(q_m, cent_m) is a
    C-entry array of folds — query side only, a handful of rows)."""
    c1 = residual_const1(books, centroids)
    sub = len(books[0][0])
    ncell = len(centroids)
    cols = []
    for s, cents_s in enumerate(books):
        cent_slices = [
            centroids[i][s * sub : (s + 1) * sub] for i in range(ncell)
        ]
        dcent = F.element_at(
            F.array(*[_dot_slice(qv, s * sub, cs) for cs in cent_slices]),
            (cell + 1).cast("int"),
        )
        ccn = F.element_at(
            F.array(*[F.lit(sum(x * x for x in cs)) for cs in cent_slices]),
            (cell + 1).cast("int"),
        )
        qres = _sq_norm_slice(qv, s * sub, sub) + F.lit(-2.0) * dcent + ccn
        lut = F.array(
            *[
                (
                    F.lit(-2.0) * _dot_slice(qv, s * sub, c)
                    + F.element_at(
                        F.array(*[F.lit(x) for x in c1[s][ci]]),
                        (cell + 1).cast("int"),
                    )
                )
                + qres
                for ci, c in enumerate(cents_s)
            ]
        )
        cols.append(lut.alias(f"{prefix}{s}"))
    return cols


def pq_encode_residual_arrow(
    df,
    books: list[list[list[float]]],
    centroids: list[list[float]],
    vec_col: str = "v",
    cell_col: str = "cell",
    prefix: str = "rcode",
):
    """Arrow-kernel residual encoder — the production path: plan size O(1)
    in M, Ks, dim, and cell count; centroids + codebooks ride the closure.
    Bit-exact by construction with the Catalyst constant-folded kernel
    (pq_residual_code_cols): the distance column per candidate is
    ((-2.0·seq_dot(v_m, c)) + c1[s][ci][cell]) — the SAME expression the
    fold tree evaluates (no residual vector is ever formed, so no
    alternative fp route exists), with np.argmin's first-minimum matching
    the struct-max tie-break.  Cell ids are validated loudly
    (_validated_cells) — numpy would silently wrap a negative id."""
    import numpy as np
    import pandas as pd  # noqa: F401

    from pyspark.sql.types import IntegerType, StructField, StructType

    m = len(books)
    sub = len(books[0][0])
    c1 = residual_const1(books, centroids)
    ncell = len(centroids)
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
                    f"pq_encode_residual: null {vec_col!r} vector in batch "
                    "— filter nulls first (kernel-parity contract, see "
                    "pq_encode_arrow)"
                )
            cell = _validated_cells(pdf, cell_col, ncell, "pq_encode_residual")
            v = np.stack(pdf[vec_col].map(np.asarray).to_numpy()).astype(np.float64)
            for s in range(m):
                vm = v[:, s * sub : (s + 1) * sub]
                c1s = np.asarray(c1[s], dtype=np.float64)  # (Ks, ncell)
                consts = [c1s[ci, cell] for ci in range(len(books[s]))]
                pdf[f"{prefix}{s}"] = _argmin_exact(vm, books[s], consts)
            yield pdf

    return df.mapInPandas(encode, out_schema)


def pq_encode_residual(
    df,
    books: list[list[list[float]]],
    centroids: list[list[float]],
    vec_col: str = "v",
    cell_col: str = "cell",
    prefix: str = "rcode",
    kernel: str = "auto",
):
    """Append the M residual PQ code columns (requires the coarse cell
    column).  kernel='catalyst' is the constant-folded literal form the
    DuckDB oracle replays digit-for-digit; 'arrow' the bit-exact numpy
    form; 'auto' routes on _pq_auto_kernel (argmin-struct pricing)."""
    m = len(books)
    ks = len(books[0])
    sub = len(books[0][0])
    if kernel == "auto":
        kernel = _pq_auto_kernel(m, ks, sub)
    if kernel == "arrow":
        return pq_encode_residual_arrow(df, books, centroids, vec_col, cell_col, prefix)
    cols = pq_residual_code_cols(F.col(vec_col), F.col(cell_col), books, centroids)
    return df.select(
        "*", *[c.cast("int").alias(f"{prefix}{s}") for s, c in enumerate(cols)]
    )


def _seq_dot(vm, c):
    """Sequential-fold dot of the (rows, sub) block with literal c —
    acc starts at 0.0 and adds one product at a time, reproducing the
    Catalyst ``aggregate(zip_with(...), 0.0D, (acc, x) -> acc + x)``
    IEEE op order bit-for-bit (numpy's dot/matmul would pairwise-sum)."""
    import numpy as np

    acc = np.zeros(vm.shape[0], dtype=np.float64)
    for j, cj in enumerate(c):
        acc = acc + vm[:, j] * cj
    return acc


def _seq_sqnorm(vm):
    """Sequential-fold sum of squares (same op order as _sq_norm_slice)."""
    import numpy as np

    acc = np.zeros(vm.shape[0], dtype=np.float64)
    for j in range(vm.shape[1]):
        acc = acc + vm[:, j] * vm[:, j]
    return acc


def _argmin_exact(vm, cents_list, consts):
    """Bit-exact Arrow argmin: per candidate ci the distance column is
    ((-2.0 · seq_dot(vm, c)) + consts[ci]) — the Catalyst fold tree's op
    order and association — and np.argmin's first-minimum matches the
    struct-max tie-break to the smallest code.  `consts[ci]` is either a
    scalar (raw encoding: |c|²) or a per-row array (residual encoding:
    c1[s][ci][cell]).  Ks sequential dots instead of one matmul: same
    flop count, more numpy passes — the price of structural (not
    empirical) agreement with the literal-fold kernel the oracle replays."""
    import numpy as np

    cols = [
        (-2.0 * _seq_dot(vm, c)) + k for c, k in zip(cents_list, consts)
    ]
    return np.argmin(np.stack(cols, axis=1), axis=1).astype(np.int32)


def _validated_cells(pdf, cell_col: str, ncell: int, who: str):
    """Loud cell-id validation for the residual kernels: numpy fancy
    indexing would silently WRAP a negative cell to the last centroid
    (cents[-1]) where the Catalyst twin's element_at(..., cell+1) errors —
    fail-don't-degrade, like the null-vector check."""
    import numpy as np
    import pandas as pd

    raw = pdf[cell_col]
    if pd.isna(raw).any():
        raise ValueError(f"{who}: null {cell_col!r} in batch — assign cells first")
    cell = raw.to_numpy().astype(np.int64)
    if ((cell < 0) | (cell >= ncell)).any():
        bad = cell[(cell < 0) | (cell >= ncell)][:3]
        raise ValueError(
            f"{who}: cell id out of range [0, {ncell}): {bad.tolist()} — "
            "numpy indexing would silently wrap where the Catalyst kernel "
            "errors, breaking kernel parity"
        )
    return cell


def _lut_out_schema(df, m: int, prefix: str):
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    return StructType(
        list(df.schema.fields)
        + [StructField(f"{prefix}{s}", ArrayType(DoubleType())) for s in range(m)]
    )


def adc_lut_arrow(
    df, books: list[list[list[float]]], vec_col: str = "v", prefix: str = "lut"
):
    """Arrow twin of ``adc_lut_cols``: all M LUT array columns in one
    mapInPandas pass.  The Catalyst builder's cost is not execution (the
    query frame is a handful of rows) but PLAN CONSTRUCTION — M·Ks fold
    trees are ~30k py4j round-trips (~18 s measured at M=16/Ks=16), paid
    per query invocation.  Here the plan is O(1); every dot/sq-norm uses
    the sequential fold order (_seq_dot/_seq_sqnorm) and the identical
    ((dot·-2.0) + |c|²) + |q_m|² association, so the doubles match the
    Catalyst tree (and the DuckDB oracle) bit-for-bit."""
    import numpy as np

    m = len(books)
    sub = len(books[0][0])
    ccs = [[sum(x * x for x in c) for c in cents] for cents in books]
    out_schema = _lut_out_schema(df, m, prefix)

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                for s in range(m):
                    pdf[f"{prefix}{s}"] = pdf.get(vec_col, pdf.index).iloc[0:0]
                yield pdf
                continue
            v = np.stack(pdf[vec_col].map(np.asarray).to_numpy()).astype(np.float64)
            for s in range(m):
                vm = v[:, s * sub : (s + 1) * sub]
                sqn = _seq_sqnorm(vm)
                cols = [
                    (_seq_dot(vm, c) * -2.0 + ccs[s][ci]) + sqn
                    for ci, c in enumerate(books[s])
                ]
                pdf[f"{prefix}{s}"] = list(np.stack(cols, axis=1))
            yield pdf

    return df.mapInPandas(gen, out_schema)


def residual_lut_arrow(
    df,
    books: list[list[list[float]]],
    centroids: list[list[float]],
    vec_col: str = "v",
    cell_col: str = "cell",
    prefix: str = "rlut",
):
    """Arrow twin of ``residual_lut_cols`` — same op order and association
    as the Catalyst tree: rlut{s}[c] = ((-2.0·dot(q_m, c)) + c1[s][c][cell])
    + qres, qres = (|q_m|² + (-2.0·dot(q_m, cent_m(cell)))) + |cent_m|²."""
    import numpy as np

    c1 = residual_const1(books, centroids)
    m = len(books)
    sub = len(books[0][0])
    ncell = len(centroids)
    cent_slices = [
        [centroids[i][s * sub : (s + 1) * sub] for i in range(ncell)]
        for s in range(m)
    ]
    ccn_tab = [
        [sum(x * x for x in cs) for cs in cent_slices[s]] for s in range(m)
    ]
    out_schema = _lut_out_schema(df, m, prefix)

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                for s in range(m):
                    pdf[f"{prefix}{s}"] = pdf.get(vec_col, pdf.index).iloc[0:0]
                yield pdf
                continue
            v = np.stack(pdf[vec_col].map(np.asarray).to_numpy()).astype(np.float64)
            cell = _validated_cells(pdf, cell_col, ncell, "residual_lut_arrow")
            rows = np.arange(len(pdf))
            for s in range(m):
                vm = v[:, s * sub : (s + 1) * sub]
                dcents = np.stack(
                    [_seq_dot(vm, cs) for cs in cent_slices[s]], axis=1
                )
                dcent = dcents[rows, cell]
                ccn = np.asarray(ccn_tab[s], dtype=np.float64)[cell]
                qres = (_seq_sqnorm(vm) + -2.0 * dcent) + ccn
                c1s = np.asarray(c1[s], dtype=np.float64)  # (Ks, ncell)
                cols = [
                    ((-2.0 * _seq_dot(vm, c)) + c1s[ci, cell]) + qres
                    for ci, c in enumerate(books[s])
                ]
                pdf[f"{prefix}{s}"] = list(np.stack(cols, axis=1))
            yield pdf

    return df.mapInPandas(gen, out_schema)


def pq_encode_arrow(
    df,
    books: list[list[list[float]]],
    vec_col: str = "v",
    prefix: str = "code",
    exact: bool = True,
):
    """Arrow-kernel PQ encoder — the production path once the Catalyst
    argmin trees get expensive: one mapInPandas pass computes all M
    argmins per batch in numpy; plan size is O(1) in M, Ks, and dim (the
    codebook rides the closure, not the plan).

    `exact=True` (default) evaluates each candidate distance with the
    SEQUENTIAL fold order ((-2·seq_dot(v_m, c)) + |c|²) — bit-identical
    doubles to the Catalyst literal-fold kernel (and so to the DuckDB
    oracle), so argmin agreement is structural, never a near-tie gamble.
    `exact=False` uses one BLAS matmul per subspace (-2 V_m @ C_mᵀ + |c|²)
    — fastest, argmin-equal except on sub-ulp near-ties; fine for pure
    production indexes where either of two equidistant codes is equally
    good, NOT for oracle-gated paths."""
    import numpy as np
    import pandas as pd  # noqa: F401

    from pyspark.sql.types import IntegerType, StructField, StructType

    m = len(books)
    sub = len(books[0][0])
    mats = [np.asarray(b, dtype=np.float64) for b in books]  # (Ks, sub) each
    ccs = [np.sum(c * c, axis=1) for c in mats]
    ccs_py = [[sum(x * x for x in c) for c in cents] for cents in books]
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
                if exact:
                    pdf[f"{prefix}{s}"] = _argmin_exact(vm, books[s], ccs_py[s])
                else:
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
    constant-plan-size numpy form (bit-identical doubles by default, see
    pq_encode_arrow); 'auto' routes on _pq_auto_kernel — which prices
    argmin STRUCTS, not just literals."""
    m = len(books)
    ks = len(books[0])
    sub = len(books[0][0])
    if kernel == "auto":
        kernel = _pq_auto_kernel(m, ks, sub)
    if kernel == "arrow":
        return pq_encode_arrow(df, books, vec_col, prefix)
    cols = pq_code_cols(F.col(vec_col), books)
    return df.select("*", *[c.cast("int").alias(f"{prefix}{s}") for s, c in enumerate(cols)])
