"""Slow-log event assembly: tokens/text docs -> structured event rows.

This is the Spark re-expression of the reference's streaming state-machine
parser (/root/reference/log/parser/slow.go:73-323).  The reference walks a
byte stream line-by-line with three states (idle / inHeader / inQuery) and
emits events on state transitions.  Here each input row is one self-contained
log *document* (event boundaries never cross docs), so the scan is
embarrassingly parallel: one `mapInPandas` pass, vectorized with numpy/pandas
inside each Arrow batch — no per-row Python UDFs, no line-level shuffle.

State machine transitions (slow.go:124-132, 152-243, 270-289) collapse to a
vectorizable form because the automaton is reset-dominated:

  - a header line (`^#\\s+[A-Z]`, slow.go:18) always puts it in `header`
  - an admin line (`# admin` prefix, slow.go:231) always emits+resets to idle
  - any other line maps header->query, keeps query, keeps idle

so the state of every line is a function of the *most recent* header/admin
line (a grouped forward-fill), and event ids are a cumulative sum over
header-run starts.  Parity details reproduced exactly:

  - meta-line filter incl. the >=20-byte fast path       slow.go:107-119
  - offset bookkeeping incl. the documented +1 quirk     slow.go:93-100, 164-166
  - trailing line without '\\n' dropped entirely          slow.go:87-91
  - `# Time` ts extract + combined Time+User lines       slow.go:169-182
  - `User@Host` user/host extract (IP ignored)           slow.go:17, 183-189
  - metrics findall + suffix/value-based typing          slow.go:196-222
  - unparseable uint -> 0, float32 time metrics          slow.go:201, 219
  - `use db;` capture only before first query line       slow.go:245-251
  - SET last_insert_id/insert_id/timestamp skipped       slow.go:21, 252-256
  - admin command extraction + FilterAdminCommand        slow.go:270-289
  - events without Query_time discarded                  slow.go:305-311
  - Db/Query trailing-separator cleanup                  slow.go:313-315
  - tail flush only when queryLines > 0                  slow.go:135-137
"""

from __future__ import annotations

import re
from typing import Iterable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# Regexes, 1:1 with slow.go:16-21 (Python `\Z` == Go `\z`).
TIME_RE = re.compile(r"Time: (\S+\s{1,2}\S+)", re.ASCII)
USER_RE = re.compile(r"User@Host: ([^\[]+|\[[^[]+\]).*?@ (\S*) \[(.*)\]", re.ASCII)
HEADER_RE = re.compile(r"#\s+[A-Z]", re.ASCII)  # anchored via str.match (== Go ^ semantics)
METRICS_RE = re.compile(r"(\w+): (\S+|\Z)", re.ASCII)
ADMIN_RE = re.compile(r"command: (.+)", re.ASCII)
SET_RE = re.compile(r"SET (?:last_insert_id|insert_id|timestamp)")

_UINT_RE = re.compile(r"[0-9]+\Z")  # strconv.ParseUint: no sign prefix permitted
# meta lines (slow.go:107-119): '/...with:\n' | 'Time ' | 'Tcp ' | 'TCP ' prefix
_META_RE = re.compile(r"(?:/.*with:\Z|Time |Tcp |TCP )", re.ASCII)

EVENT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("source", StringType()),
        StructField("event_idx", IntegerType()),
        StructField("offset", LongType()),
        StructField("ts", StringType()),
        StructField("admin", BooleanType()),
        StructField("query", StringType()),
        StructField("user", StringType()),
        StructField("host", StringType()),
        StructField("db", StringType()),
        StructField("rate_type", StringType()),
        StructField("rate_limit", IntegerType()),
        StructField("time_metrics", MapType(StringType(), FloatType())),
        StructField("number_metrics", MapType(StringType(), LongType())),
        StructField("bool_metrics", MapType(StringType(), BooleanType())),
    ]
)

_EMPTY_EVENTS = pd.DataFrame(
    {
        "doc_id": pd.Series(dtype=object),
        "source": pd.Series(dtype=object),
        "event_idx": pd.Series(dtype="int32"),
        "offset": pd.Series(dtype="int64"),
        "ts": pd.Series(dtype=object),
        "admin": pd.Series(dtype=bool),
        "query": pd.Series(dtype=object),
        "user": pd.Series(dtype=object),
        "host": pd.Series(dtype=object),
        "db": pd.Series(dtype=object),
        "rate_type": pd.Series(dtype=object),
        "rate_limit": pd.Series(dtype="int32"),
        "time_metrics": pd.Series(dtype=object),
        "number_metrics": pd.Series(dtype=object),
        "bool_metrics": pd.Series(dtype=object),
    }
)


def _decode_tokens(tokens) -> str:
    return np.asarray(tokens, dtype=np.int64).astype(np.uint8).tobytes().decode("utf-8")


def _group_bounds(sorted_keys: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(unique keys, group start, group end) over a non-decreasing key array."""
    b = np.flatnonzero(np.concatenate(([True], sorted_keys[1:] != sorted_keys[:-1])))
    return sorted_keys[b], b, np.append(b[1:], len(sorted_keys))


def _dicts_by_key(keys: np.ndarray, names: np.ndarray, values: np.ndarray) -> pd.Series:
    """Build {name: value} dicts per key group (keys non-decreasing, group
    entries in occurrence order so dict insertion reproduces last-wins map
    overwrite semantics)."""
    uk, a, b = _group_bounds(keys)
    return pd.Series(
        [dict(zip(names[i:j], values[i:j])) for i, j in zip(a, b)], index=uk, dtype=object
    )


def _split_doc(text: str, start_offset: int) -> tuple[list[str], np.ndarray, np.ndarray]:
    """Split one doc into (lines, adjusted byte offsets, byte lengths incl '\\n').

    Reproduces slow.go:87-100: a final line without '\\n' is dropped (the
    reader breaks on EOF error before processing it); lineOffset is the
    byte offset of the line start, +1 when nonzero (the documented quirk).
    """
    empty = np.empty(0, dtype=np.int64)
    if start_offset > 0:
        text = text.encode("utf-8")[start_offset:].decode("utf-8", errors="replace")
    parts = text.split("\n")
    lines = parts[:-1]  # content after the last '\n' (incl. no-newline tail) dropped
    if not lines:
        return [], empty, empty
    if text.isascii():
        lens = np.fromiter((len(l) + 1 for l in lines), dtype=np.int64, count=len(lines))
    else:
        lens = np.fromiter(
            (len(l.encode("utf-8")) + 1 for l in lines), dtype=np.int64, count=len(lines)
        )
    starts = start_offset + np.concatenate(([0], np.cumsum(lens)[:-1]))
    return lines, starts + (starts != 0), lens  # +1 quirk (slow.go:96-100)


def _parse_batch(pdf: pd.DataFrame, admin_filter: frozenset[str]) -> pd.DataFrame:
    n_docs = len(pdf)
    if n_docs == 0:
        return _EMPTY_EVENTS.copy()

    doc_ids = pdf["doc_id"].tolist()
    sources = pdf["source"].tolist() if "source" in pdf.columns else [""] * n_docs
    if "text" in pdf.columns:
        texts = pdf["text"].tolist()
    else:
        texts = [_decode_tokens(t) for t in pdf["tokens"]]
    start_offsets = (
        pdf["start_offset"].fillna(0).astype("int64").tolist()
        if "start_offset" in pdf.columns
        else [0] * n_docs
    )

    all_lines: list[str] = []
    all_offs: list[np.ndarray] = []
    all_lens: list[np.ndarray] = []
    doc_idx_parts: list[np.ndarray] = []
    for di in range(n_docs):
        lines, offs, lens = _split_doc(texts[di], int(start_offsets[di]))
        if lines:
            all_lines.extend(lines)
            all_offs.append(offs)
            all_lens.append(lens)
            doc_idx_parts.append(np.full(len(lines), di, dtype=np.int64))
    if not all_lines:
        return _EMPTY_EVENTS.copy()

    offs = np.concatenate(all_offs)
    blen = np.concatenate(all_lens)  # byte lengths incl '\n'
    doc_idx = np.concatenate(doc_idx_parts)

    # Meta-line filter (slow.go:107-119); length check is on bytes incl '\n'.
    meta_match = _META_RE.match
    meta = np.fromiter(
        (bool(meta_match(l)) for l in all_lines), dtype=bool, count=len(all_lines)
    ) & (blen >= 20)
    keep = ~meta
    lines_arr = np.array(all_lines, dtype=object)[keep]
    s = pd.Series(lines_arr, dtype=object)
    offs, doc_idx = offs[keep], doc_idx[keep]
    if len(s) == 0:
        return _EMPTY_EVENTS.copy()

    # Line classification (slow.go:18, 231).
    h_match = HEADER_RE.match
    n = len(lines_arr)
    H = np.fromiter((bool(h_match(l)) for l in lines_arr), dtype=bool, count=n)
    A = np.fromiter(
        (l.startswith("# admin") for l in lines_arr), dtype=bool, count=n
    )  # disjoint from H (lowercase 'a')

    # State derivation: grouped forward-fill of the last control line.
    n = len(s)
    ctrl = np.where(H, 1, np.where(A, 2, 0)).astype(np.float64)
    ctrl[ctrl == 0] = np.nan
    lc = pd.Series(ctrl).groupby(doc_idx).ffill()  # last control at/<= i (NaN=none)
    lc_prev = lc.groupby(doc_idx).shift(1)  # last control strictly before i
    lc = lc.to_numpy()
    lc_prev = lc_prev.to_numpy()

    # Event starts: header line whose predecessor (same doc) is not a header.
    prev_H = np.concatenate(([False], H[:-1]))
    first_of_doc = np.concatenate(([True], doc_idx[1:] != doc_idx[:-1]))
    prev_H &= ~first_of_doc
    event_start = H & ~prev_H
    eid = np.cumsum(event_start)  # 1-based once inside an event; 0 = pre-first-event

    # Which lines are live (processed by the automaton)?
    a_live = A & (lc_prev == 1)  # admin line only when state != idle (slow.go:124-132)
    q_live = (~H) & (~A) & (lc == 1)  # other line in header/query state
    live = H | a_live | q_live
    live &= eid > 0

    lf = pd.DataFrame(
        {
            "line": s,
            "off": offs,
            "doc": doc_idx,
            "eid": eid,
            "H": H,
            "A": A & a_live,
            "Q": q_live,
            "start": event_start,
        }
    )[live]
    if len(lf) == 0:
        return _EMPTY_EVENTS.copy()

    # ---- per-event skeleton -------------------------------------------------
    starts = lf[lf["start"]]
    ev = pd.DataFrame(
        {"doc": starts["doc"].to_numpy(), "offset": starts["off"].to_numpy()},
        index=starts["eid"].to_numpy(),
    )
    ev.index.name = "eid"

    # ---- header lines -------------------------------------------------------
    hl = lf[lf["H"]]
    hlines = hl["line"].to_numpy()
    heids = hl["eid"].to_numpy()
    is_time = np.fromiter(
        (l.startswith("# Time") for l in hlines), dtype=bool, count=len(hlines)
    )
    is_user = np.fromiter(
        (l.startswith("# User") for l in hlines), dtype=bool, count=len(hlines)
    )

    if is_time.any():
        t_eids, t_vals = [], []
        for eid, l in zip(heids[is_time], hlines[is_time]):
            m = TIME_RE.search(l)
            if m:
                t_eids.append(eid)
                t_vals.append(m.group(1))
        if t_eids:
            uk, _, b = _group_bounds(np.asarray(t_eids))
            ev["ts"] = pd.Series(np.asarray(t_vals, dtype=object)[b - 1], index=uk)
    ul_mask = is_user | is_time
    if ul_mask.any():
        u_eids, u_user, u_host = [], [], []
        for eid, l in zip(heids[ul_mask], hlines[ul_mask]):
            m = USER_RE.search(l)
            if m:
                u_eids.append(eid)
                u_user.append(m.group(1))
                u_host.append(m.group(2))
        if u_eids:
            uk, _, b = _group_bounds(np.asarray(u_eids))
            ev["user"] = pd.Series(np.asarray(u_user, dtype=object)[b - 1], index=uk)
            ev["host"] = pd.Series(np.asarray(u_host, dtype=object)[b - 1], index=uk)

    # ---- metrics lines (findall + typing, slow.go:196-222) ------------------
    ml_mask = ~is_time & ~is_user
    tmaps: pd.Series = pd.Series(dtype=object)
    nmaps: pd.Series = pd.Series(dtype=object)
    bmaps: pd.Series = pd.Series(dtype=object)
    if ml_mask.any():
        m_eids, m_names, m_vals = [], [], []
        findall = METRICS_RE.findall
        for eid, l in zip(heids[ml_mask], hlines[ml_mask]):
            for nm, vl in findall(l):
                m_eids.append(eid)
                m_names.append(nm)
                m_vals.append(vl)
        if m_eids:
            ex = pd.DataFrame(
                {
                    "eid": np.asarray(m_eids),
                    "name": np.asarray(m_names, dtype=object),
                    "value": np.asarray(m_vals, dtype=object),
                }
            )
            name, value = ex["name"], ex["value"]
            k_time = (name.str.endswith("_time") | name.str.endswith("_wait")).to_numpy()
            k_bool = (~k_time) & (value.isin(("Yes", "No"))).to_numpy()
            k_schema = (~k_time) & (~k_bool) & (name == "Schema").to_numpy()
            k_rt = (~k_time) & (~k_bool) & (name == "Log_slow_rate_type").to_numpy()
            k_rl = (~k_time) & (~k_bool) & (name == "Log_slow_rate_limit").to_numpy()
            k_num = ~(k_time | k_bool | k_schema | k_rt | k_rl)

            def _last_map(sub: pd.DataFrame, conv) -> pd.Series:
                if len(sub) == 0:
                    return pd.Series(dtype=object)
                return _dicts_by_key(
                    sub["eid"].to_numpy(),
                    sub["name"].to_numpy(),
                    conv(sub["value"]).to_numpy(),
                )

            def _f32(v: pd.Series) -> pd.Series:
                # ParseFloat(x, 32): float32 rounding; parse error -> 0 (slow.go:201)
                return (
                    pd.to_numeric(v, errors="coerce")
                    .fillna(0.0)
                    .astype(np.float32)
                    .astype("float64")
                )

            def _u64(v: pd.Series) -> pd.Series:
                # ParseUint errors -> 0 (slow.go:219); clamp to int64 range
                ok = v.str.match(_UINT_RE).fillna(False)
                out = pd.to_numeric(v.where(ok, "0"), errors="coerce").fillna(0)
                return out.clip(upper=np.iinfo(np.int64).max).astype("int64")

            tmaps = _last_map(ex[k_time], _f32)
            nmaps = _last_map(ex[k_num], _u64)
            bmaps = _last_map(ex[k_bool], lambda v: v == "Yes")

            sch = ex[k_schema].groupby("eid")["value"].last()
            ev["db_schema"] = sch
            rt = ex[k_rt].groupby("eid")["value"].last()
            ev["rate_type"] = rt
            rl = ex[k_rl].groupby("eid")["value"].last()
            if len(rl):
                ok = rl.str.match(_UINT_RE).fillna(False)
                ev["rate_limit"] = (
                    pd.to_numeric(rl.where(ok, "0"), errors="coerce").fillna(0).astype("int64")
                    % 256
                )

    # ---- query-ish lines (slow.go:245-267) -----------------------------------
    ql = lf[lf["Q"]]
    if len(ql):
        qlines_all = ql["line"].to_numpy()
        qeids_all = ql["eid"].to_numpy()
        nq = len(qlines_all)
        set_search = SET_RE.search
        is_set = np.fromiter(
            (bool(set_search(l)) for l in qlines_all), dtype=bool, count=nq
        )
        is_use = np.fromiter(
            (l.startswith("use ") for l in qlines_all), dtype=bool, count=nq
        )
        base = ~is_set & ~is_use
        # count of real query lines before/at each position, reset per event
        cum = np.cumsum(base)
        uk_all, a_all, _ = _group_bounds(qeids_all)
        grp_start_cum = np.repeat(cum[a_all] - base[a_all], np.diff(np.append(a_all, nq)))
        bases_before = cum - grp_start_cum  # inclusive of current row (base rows only)
        consumed_use = is_use & (bases_before == 0)
        is_query = base | (is_use & (bases_before > 0))

        if consumed_use.any():
            u_eids = qeids_all[consumed_use]
            u_dbs = np.array(
                [l[4:].rstrip(";") for l in qlines_all[consumed_use]], dtype=object
            )
            uk, _, b = _group_bounds(u_eids)
            ev["db_use"] = pd.Series(u_dbs[b - 1], index=uk)
            ev["has_use"] = ev.index.isin(uk)

        if is_query.any():
            qe = qeids_all[is_query]
            qlines = qlines_all[is_query]
            uk, a, b = _group_bounds(qe)
            ev["qcount"] = pd.Series(b - a, index=uk)
            ev["query"] = pd.Series(
                ["\n".join(qlines[i:j]) for i, j in zip(a, b)], index=uk, dtype=object
            )

    # ---- admin lines (slow.go:270-289) ---------------------------------------
    al = lf[lf["A"]]
    if len(al):
        cmd = al["line"].str.extract(ADMIN_RE, expand=False)
        cmd = pd.DataFrame({"eid": al["eid"].to_numpy(), "cmd": cmd.to_numpy()})
        cmd = cmd.dropna().groupby("eid")["cmd"].last()
        ev["admin_cmd"] = cmd.str.replace(r";\Z", "", regex=True, n=1)

    # ---- emission + finalize (slow.go:291-323, 135-137) ----------------------
    for col, default in (
        ("ts", ""),
        ("user", ""),
        ("host", ""),
        ("db_schema", ""),
        ("db_use", ""),
        ("rate_type", ""),
        ("query", ""),
        ("admin_cmd", np.nan),
    ):
        if col not in ev.columns:
            ev[col] = default
        else:
            ev[col] = ev[col].fillna(default) if default == "" else ev[col]
    if "has_use" not in ev.columns:
        ev["has_use"] = False
    if "rate_limit" not in ev.columns:
        ev["rate_limit"] = 0
    ev["rate_limit"] = ev["rate_limit"].fillna(0).astype("int32")
    if "qcount" not in ev.columns:
        ev["qcount"] = 0
    ev["qcount"] = ev["qcount"].fillna(0).astype("int64")

    ev["time_metrics"] = tmaps.reindex(ev.index)
    ev["number_metrics"] = nmaps.reindex(ev.index)
    ev["bool_metrics"] = bmaps.reindex(ev.index)
    for c in ("time_metrics", "number_metrics", "bool_metrics"):
        nulls = ev[c].isna()
        if nulls.any():
            ev.loc[nulls, c] = pd.Series([{} for _ in range(int(nulls.sum()))]).values

    ev["admin"] = ev["admin_cmd"].notna()
    # emit rule: admin-terminated | followed by another event in-doc | has query
    last_in_doc = ~ev["doc"].duplicated(keep="last")
    emit = ev["admin"] | ~last_in_doc | (ev["qcount"] > 0)
    # discard events without Query_time (slow.go:305-311)
    emit &= ev["time_metrics"].map(lambda m: "Query_time" in m)
    # FilterAdminCommand (slow.go:280-288)
    if admin_filter:
        emit &= ~(ev["admin"] & ev["admin_cmd"].isin(admin_filter))
    ev = ev[emit]
    if len(ev) == 0:
        return _EMPTY_EVENTS.copy()

    query = np.where(ev["admin"], ev["admin_cmd"].fillna(""), ev["query"])
    query = pd.Series(query, index=ev.index).str.replace(r";\Z", "", regex=True, n=1)
    db = np.where(ev["has_use"], ev["db_use"], ev["db_schema"])
    db = pd.Series(db, index=ev.index).str.replace(r";\n\Z", "", regex=True, n=1)

    out = pd.DataFrame(
        {
            "doc_id": ev["doc"].map(lambda d: doc_ids[d]),
            "source": ev["doc"].map(lambda d: sources[d]),
            "event_idx": ev.groupby("doc").cumcount().astype("int32"),
            "offset": ev["offset"].astype("int64"),
            "ts": ev["ts"],
            "admin": ev["admin"].astype(bool),
            "query": query,
            "user": ev["user"],
            "host": ev["host"],
            "db": db,
            "rate_type": ev["rate_type"],
            "rate_limit": ev["rate_limit"].astype("int32"),
            "time_metrics": ev["time_metrics"],
            "number_metrics": ev["number_metrics"],
            "bool_metrics": ev["bool_metrics"],
        }
    )
    return out.reset_index(drop=True)


def parse_slowlog(
    df: DataFrame,
    admin_filter: Iterable[str] | None = None,
) -> DataFrame:
    """Parse a docs DataFrame into structured slow-log events.

    `df` needs `doc_id` plus either `tokens` (array<int>) or `text` (string);
    optional `source` (propagated) and `start_offset` (per-doc resume seek,
    the Options.StartOffset equivalent, slow.go:46-49).

    Returns a DataFrame with EVENT_SCHEMA.  One narrow Arrow-vectorized pass;
    no shuffle.
    """
    filt = frozenset(admin_filter or ())
    cols = [c for c in ("doc_id", "tokens", "text", "source", "start_offset") if c in df.columns]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _parse_batch(pdf, filt)

    return df.select(*cols).mapInPandas(gen, schema=EVENT_SCHEMA)


def promote_metrics(events: DataFrame) -> DataFrame:
    """Promote hot metrics to top-level columns so Catalyst can prune,
    push down, and aggregate them vectorized (SURVEY.md §1.1)."""
    t = F.col("time_metrics")
    m = F.col("number_metrics")
    return (
        events.withColumn("query_time", F.element_at(t, "Query_time"))
        .withColumn("lock_time", F.element_at(t, "Lock_time"))
        .withColumn("rows_sent", F.element_at(m, "Rows_sent"))
        .withColumn("rows_examined", F.element_at(m, "Rows_examined"))
        .withColumn("rows_affected", F.element_at(m, "Rows_affected"))
        .withColumn("bytes_sent", F.element_at(m, "Bytes_sent"))
    )
