"""MEASUREMENT-ONLY scale-up of the read-only driver testdata.

The driver's round-end bench may run at a larger, driver-generated
scale factor (r5: sf=1.0) that this sandbox cannot regenerate (seed
unknown). For optimization A/B timing — never correctness — this tool
builds a same-shape dataset N× the size of sf0.1 by deterministic
replication with key offsets (FK structure preserved: lineitem↔orders↔
customer), time-jittered events (10× density in the same 30-day
window, like a larger sf), verbatim-replicated documents (the corpus
is dup-saturated BY DESIGN, so pair-family growth is quadratic either
way) and bootstrap-resampled embeddings (per-dimension empirical
marginals, fresh RNG(42) draws).

Usage: python tools/make_sf_like.py [N] [outdir]   (default 10, /tmp/sf1like)
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np

SRC = "/root/testdata/sf0.1"


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1like"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")

    def src(t: str) -> str:
        return f"'{SRC}/{t}.parquet'"

    def write(t: str, sql: str) -> None:
        path = f"{out}/{t}.parquet"
        con.execute(
            f"COPY ({sql}) TO '{path}' (FORMAT PARQUET, "
            "COMPRESSION SNAPPY, ROW_GROUP_SIZE 262144)")
        nrows = con.execute(
            f"SELECT COUNT(*) FROM '{path}'").fetchone()[0]
        print(f"{t}: {nrows} rows")

    ks = f"(SELECT UNNEST(range({n})) AS k)"

    # dimensions: copied verbatim
    for t in ("nation", "region"):
        write(t, f"SELECT * FROM {src(t)}")
    write("supplier", f"""
        SELECT s_suppkey + k * (SELECT MAX(s_suppkey) + 1 FROM {src('supplier')})
                 AS s_suppkey, s_name, s_nationkey, s_acctbal
        FROM {src('supplier')}, {ks}""")
    write("part", f"""
        SELECT p_partkey + k * (SELECT MAX(p_partkey) + 1 FROM {src('part')})
                 AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
        FROM {src('part')}, {ks}""")

    write("customer", f"""
        SELECT c_custkey + k * (SELECT MAX(c_custkey) + 1 FROM {src('customer')})
                 AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        FROM {src('customer')}, {ks}""")
    write("orders", f"""
        SELECT o_orderkey + k * (SELECT MAX(o_orderkey) + 1 FROM {src('orders')})
                 AS o_orderkey,
               o_custkey + k * (SELECT MAX(c_custkey) + 1 FROM {src('customer')})
                 AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {src('orders')}, {ks}""")
    write("lineitem", f"""
        SELECT l_orderkey + k * (SELECT MAX(o_orderkey) + 1 FROM {src('orders')})
                 AS l_orderkey,
               l_partkey, l_suppkey, l_linenumber, l_quantity,
               l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM {src('lineitem')}, {ks}""")

    write("events", f"""
        SELECT event_id + k * (SELECT MAX(event_id) + 1 FROM {src('events')})
                 AS event_id,
               ts + INTERVAL (k * 97) MILLISECOND AS ts,
               user_id + k * (SELECT MAX(user_id) + 1 FROM {src('events')})
                 AS user_id,
               event_type, value, props
        FROM {src('events')}, {ks}""")

    write("documents", f"""
        SELECT doc_id + k * (SELECT MAX(doc_id) + 1 FROM {src('documents')})
                 AS doc_id, text, lang, source, n_chars
        FROM {src('documents')}, {ks}""")

    # embeddings: bootstrap per-dimension marginals, deterministic RNG
    emb = con.execute(
        f"SELECT vec_id, embedding, label FROM {src('embeddings')}"
    ).fetchall()
    base = np.array([r[1] for r in emb], dtype=np.float32)  # (m, 64)
    m, dim = base.shape
    rng = np.random.default_rng(42)
    total = m * n
    cols = [base[rng.integers(0, m, total), d] for d in range(dim)]
    mat = np.stack(cols, axis=1)
    labels = rng.integers(0, 10, total)
    rows = [(int(i), mat[i].tolist(), int(labels[i])) for i in range(total)]
    con.execute("CREATE TABLE emb_new (vec_id BIGINT, embedding FLOAT[], label INTEGER)")
    con.executemany("INSERT INTO emb_new VALUES (?, ?, ?)", rows)
    write("embeddings", "SELECT * FROM emb_new")


if __name__ == "__main__":
    main()
