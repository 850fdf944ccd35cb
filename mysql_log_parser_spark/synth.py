"""Deterministic synthetic slow-log corpus generator (seeded; no external
data).  Stitches events drawn from a template pool covering every parser
branch (FIXTURES.md §7) into multi-event docs with zipf-hot query classes
(skew) and multiple `source` values, then tokenizes into the input-table
shape (doc_id, tokens array<int32>, n_tok, source).

Query_time values are quantized to multiples of 1/64 so that float32 parsing
and float64 summation are EXACT — aggregate parity checks against an oracle
are then order-independent (no float-accumulation drift).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N_TABLES = 64  # distinct query classes per template family

_HEADER_MIN = "# Time: 240101 {h:2d}:{m:02d}:{s:02d}\n# User@Host: {user}[{user}] @ {host} []\n"
_METRICS = (
    "# Query_time: {qt:.6f}  Lock_time: 0.000000 Rows_sent: {rs}  Rows_examined: {re}\n"
)
_RICH = (
    "# Thread_id: {tid}  Schema: {db}  Last_errno: 0  Killed: 0\n"
    "# Query_time: {qt:.6f}  Lock_time: 0.015625 Rows_sent: {rs}  Rows_examined: {re}\n"
    "# Bytes_sent: {bs}  Tmp_tables: 0  Tmp_disk_tables: 0  Tmp_table_sizes: 0\n"
    "# QC_Hit: No  Full_scan: Yes  Full_join: No  Tmp_table: No  Tmp_table_on_disk: No\n"
)


def _q(rng_val: float) -> float:
    """Quantize to 1/64 steps (exactly representable in float32/64)."""
    return max(1, round(rng_val * 64)) / 64.0


def render_event(rng: np.random.Generator, k: int, kind: int, user: str, host: str) -> str:
    qt = _q(rng.random() * 4)
    rs = int(rng.integers(0, 100))
    re_ = rs * 10
    h, m, s = int(rng.integers(0, 24)), int(rng.integers(0, 60)), int(rng.integers(0, 60))
    head = _HEADER_MIN.format(h=h, m=m, s=s, user=user, host=host)
    if kind == 0:  # point select, minimal header
        body = f"SELECT c FROM tbl{k} WHERE id={rs} AND name='n{rs}';\n"
        return head + _METRICS.format(qt=qt, rs=rs, re=re_) + body
    if kind == 1:  # rich percona header + use db + multi-line update
        body = (
            f"use db{k};\nSET timestamp={1400000000 + rs};\n"
            f"UPDATE tbl{k}\nSET    v = '{rs}'\nWHERE  id IN ({rs}, {rs + 1}, {rs + 2});\n"
        )
        return head + _RICH.format(
            tid=k, db=f"db{k}", qt=qt, rs=rs, re=re_, bs=rs * 7
        ) + body
    if kind == 2:  # insert values
        body = f"INSERT INTO tbl{k} (a, b, c) VALUES ({rs}, 'x{rs}', {rs}.5);\n"
        return head + _METRICS.format(qt=qt, rs=rs, re=re_) + body
    if kind == 3:  # admin command event
        return (
            head
            + _METRICS.format(qt=qt, rs=0, re=0)
            + "# administrator command: Ping;\n"
        )
    # kind == 4: meta lines interleaved + select
    return (
        "/usr/sbin/mysqld, Version: 5.6.15-log (binary). started with:\n"
        "Tcp port: 3306  Unix socket: /var/lib/mysql/mysql.sock\n"
        "Time                 Id Command    Argument\n"
        + head
        + _METRICS.format(qt=qt, rs=rs, re=re_)
        + f"SELECT col FROM big{k} ORDER BY col ASC LIMIT {rs};\n"
    )


def generate(
    n_docs: int,
    events_per_doc: int = 50,
    n_sources: int = 4,
    seed: int = 42,
    zipf_a: float = 1.4,
) -> pa.Table:
    """Build the tokens table as a pyarrow Table (no Spark needed)."""
    rng = np.random.default_rng(seed)
    users = ["root", "app_rw", "etl_batch", "pt_agent"]
    hosts = ["localhost", "10-0-0-7", "web-42"]

    doc_ids, tok_arrays, sources = [], [], []
    for d in range(n_docs):
        src = f"src{d % n_sources}"
        n_ev = events_per_doc
        ks = np.minimum(rng.zipf(zipf_a, n_ev) - 1, N_TABLES - 1)
        kinds = rng.integers(0, 5, n_ev)
        ui = rng.integers(0, len(users), n_ev)
        hi = rng.integers(0, len(hosts), n_ev)
        parts = [
            render_event(rng, int(ks[i]), int(kinds[i]), users[ui[i]], hosts[hi[i]])
            for i in range(n_ev)
        ]
        text = "".join(parts)
        doc_ids.append(f"synth:{seed}:{d}")
        tok_arrays.append(np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.int32))
        sources.append(src)

    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "tokens": pa.array([a.tolist() for a in tok_arrays], pa.list_(pa.int32())),
            "n_tok": pa.array([len(a) for a in tok_arrays], pa.int32()),
            "source": pa.array(sources, pa.string()),
        }
    )


def generate_parquet(
    path: str,
    n_docs: int,
    events_per_doc: int = 50,
    n_sources: int = 4,
    seed: int = 42,
    row_group_docs: int = 512,
) -> str:
    tbl = generate(n_docs, events_per_doc, n_sources, seed)
    pq.write_table(tbl, path, row_group_size=row_group_docs)
    return path
