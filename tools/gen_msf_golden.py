"""Regenerate the MSF golden oracle in __spark_entry__.py.

The oracle is an INDEPENDENT implementation: Kruskal with union-find in
pure Python over the DuckDB-derived edge table, ordered by (w, a, b) — the
same lexicographic tie-break that makes the Spark Boruvka's forest unique.

    python tools/gen_msf_golden.py [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def kruskal(edges):
    """edges: [(a, b, w)] canonical a<b. Returns the canonical MSF."""
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = []
    for a, b, w in sorted(edges, key=lambda e: (e[2], e[0], e[1])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.append((a, b, w))
    return out


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
        f"""WITH e AS ({EDGES_FROM_DOCUMENTS_SQL}),
        und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
                FROM e WHERE src <> dst)
        SELECT a, b, CAST((a + b) % 10 + 1 AS DOUBLE) AS w FROM und"""
    ).fetchall()
    forest = kruskal(rows)
    vals = ", ".join(f"({a},{b},{w})" for a, b, w in forest)
    sql = (
        "-- Golden: canonical MSF computed by an independent Python Kruskal\n"
        "-- (tools/gen_msf_golden.py) with the same (w, a, b) tie-break that\n"
        "-- makes the Spark Boruvka's forest unique. Regenerate if the weight\n"
        "-- expression changes.\n"
        f"SELECT CAST(c0 AS BIGINT) AS a, CAST(c1 AS BIGINT) AS b, "
        f"ROUND(CAST(c2 AS DOUBLE), 6) AS w FROM (VALUES {vals}) t(c0, c1, c2)"
    )
    p = REPO / "__spark_entry__.py"
    s = p.read_text()
    block = '_MSF_GOLDEN_SQL = """\n' + sql + '\n"""'
    if '_MSF_GOLDEN_SQL = """' in s:
        s = re.sub(r'_MSF_GOLDEN_SQL = """\n.*?\n"""', block, s, count=1, flags=re.S)
    else:
        s = s.replace("_LOUVAIN_GOLDEN_SQL = ", block + "\n\n\n_LOUVAIN_GOLDEN_SQL = ", 1)
    p.write_text(s)
    print(f"pinned {len(forest)} MSF edges, total weight {sum(w for _, _, w in forest)}")


if __name__ == "__main__":
    main()
