"""Regenerate the truss-decomposition golden oracle in __spark_entry__.py.

The oracle is an INDEPENDENT implementation: the classic support peel
(recompute per-edge triangle support, drop below k-2, k = 3, 4, …) in pure
Python over the DuckDB-derived canonical edge table — no Spark code shared
with `algorithms/ktruss.py`.

    python tools/gen_ktruss_golden.py [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import re
import sys
from collections import defaultdict
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def truss_decomposition_flat(edges):
    """{(a,b): truss} by level peeling (truss >= 2 for every simple edge)."""

    def support(cur):
        adj = defaultdict(set)
        for a, b in cur:
            adj[a].add(b)
            adj[b].add(a)
        return {(a, b): len(adj[a] & adj[b]) for a, b in cur}

    cur = set(edges)
    result = {}
    k = 3
    while cur:
        nxt = set(cur)
        while True:
            sup = support(nxt)
            drop = {e for e, s in sup.items() if s < k - 2}
            if not drop:
                break
            nxt -= drop
        for e in cur - nxt:
            result[e] = k - 1
        cur = nxt
        k += 1
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from graphscope_spark.graph import EDGES_FROM_DOCUMENTS_SQL

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{args.sf_dir}/documents.parquet'"
    )
    rows = con.execute(
        f"""WITH e AS ({EDGES_FROM_DOCUMENTS_SQL})
        SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM e WHERE src <> dst"""
    ).fetchall()
    res = truss_decomposition_flat(rows)
    items = sorted(res.items())
    vals = ", ".join(f"({a},{b},{t})" for (a, b), t in items)
    sql = (
        "-- Golden: per-edge trussness computed by an independent pure-Python\n"
        "-- support peel (tools/gen_ktruss_golden.py) over the DuckDB edge\n"
        "-- table. Regenerate if the edge SQL changes.\n"
        f"SELECT CAST(c0 AS BIGINT) AS a, CAST(c1 AS BIGINT) AS b, "
        f"CAST(c2 AS BIGINT) AS truss FROM (VALUES {vals}) t(c0, c1, c2)"
    )
    p = REPO / "__spark_entry__.py"
    s = p.read_text()
    block = '_KTRUSS_GOLDEN_SQL = """\n' + sql + '\n"""'
    if '_KTRUSS_GOLDEN_SQL = """' in s:
        s = re.sub(
            r'_KTRUSS_GOLDEN_SQL = """\n.*?\n"""', block, s, count=1, flags=re.S
        )
    else:
        s = s.replace(
            "_LOUVAIN_GOLDEN_SQL = ", block + "\n\n\n_LOUVAIN_GOLDEN_SQL = ", 1
        )
    p.write_text(s)
    from collections import Counter

    dist = Counter(res.values())
    print(f"pinned {len(items)} edges, truss histogram {dict(sorted(dist.items()))}")


if __name__ == "__main__":
    main()
