"""Build a 10x bench-only scale point from the driver's sf0.1 tables.

VERDICT r1 item 8: the 2x-of-baseline criterion is judged at sf0.1, where
several queries are fixed-overhead-bound; a 10x point exposes shuffle-volume
regressions those numbers hide. No sf1 directory ships with the sandbox, so
this derives one: K key-shifted copies of every sf0.1 fact table, with key
offsets applied consistently across tables so referential integrity holds
(lineitem.l_orderkey copy i joins orders.o_orderkey copy i, etc.). Copy 0 is
the identity, so queries that pin specific ids (emb vec_id < 8 query set)
keep their semantics. Dimension tables (region/nation) are not scaled, like
real dims. Document/embedding copies keep identical text/vectors -- at 10x
every doc has 10 exact dups, which is precisely the workload the dedup
operators exist for.

Output: /root/repo/.bench_sf1/*.parquet (gitignored; ~170 MB). bench.py
picks it up automatically when present. Usage: python tools/scale_up.py [K]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_sf1")

# key column -> offset name; offsets are max(key)+1 per source table so
# shifted ranges never collide
SHIFTS: dict[str, list[tuple[str, str]]] = {
    "customer": [("c_custkey", "c")],
    "supplier": [("s_suppkey", "s")],
    "part": [("p_partkey", "p")],
    "orders": [("o_orderkey", "o"), ("o_custkey", "c")],
    "lineitem": [("l_orderkey", "o"), ("l_partkey", "p"), ("l_suppkey", "s")],
    "events": [("event_id", "e"), ("user_id", "u")],
    "documents": [("doc_id", "d")],
    "embeddings": [("vec_id", "v")],
}
UNSCALED = ["region", "nation"]


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    offsets = {
        "c": con.execute(f"SELECT max(c_custkey)+1 FROM '{SRC}/customer.parquet'").fetchone()[0],
        "s": con.execute(f"SELECT max(s_suppkey)+1 FROM '{SRC}/supplier.parquet'").fetchone()[0],
        "p": con.execute(f"SELECT max(p_partkey)+1 FROM '{SRC}/part.parquet'").fetchone()[0],
        "o": con.execute(f"SELECT max(o_orderkey)+1 FROM '{SRC}/orders.parquet'").fetchone()[0],
        "e": con.execute(f"SELECT max(event_id)+1 FROM '{SRC}/events.parquet'").fetchone()[0],
        "u": con.execute(f"SELECT max(user_id)+1 FROM '{SRC}/events.parquet'").fetchone()[0],
        "d": con.execute(f"SELECT max(doc_id)+1 FROM '{SRC}/documents.parquet'").fetchone()[0],
        "v": con.execute(f"SELECT max(vec_id)+1 FROM '{SRC}/embeddings.parquet'").fetchone()[0],
    }
    for t in UNSCALED:
        con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied unscaled")
    for t, shifts in SHIFTS.items():
        cols = [c[0] for c in con.execute(f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]
        shifted = dict(shifts)
        selects = []
        for i in range(k):
            exprs = [
                f"{c} + {i * offsets[shifted[c]]} AS {c}" if c in shifted else c for c in cols
            ]
            selects.append(f"SELECT {', '.join(exprs)} FROM '{SRC}/{t}.parquet'")
        con.execute(
            f"COPY ({' UNION ALL '.join(selects)}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows ({k}x)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
