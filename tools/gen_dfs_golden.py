"""Generate the pinned DFS-preorder golden for the gate fixture.

Runs a pure-Python lexicographic DFS (recursive AND iterative — two
implementations must agree) over the doc-derived edge table extracted with
DuckDB (no Spark involved), then prints the `_DFS_GOLDEN_SQL` VALUES block
to paste into __spark_entry__.py. Regenerate if EDGES_FROM_DOCUMENTS_SQL or
the dfs_preorder child-order rule changes.

Usage: python tools/gen_dfs_golden.py [--sf-dir /root/testdata/sf0.01] [--source 0]
"""

from __future__ import annotations

import argparse
import sys
from collections import defaultdict
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _edges(sf_dir: str):
    import __spark_entry__ as entry

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    rows = con.execute(
        f"SELECT DISTINCT src, dst FROM ({entry.EDGES_FROM_DOCUMENTS_SQL}) WHERE src <> dst"
    ).fetchall()
    return rows


def _dfs_recursive(out, source):
    sys.setrecursionlimit(1_000_000)
    rank = {source: 0}

    def rec(v):
        for w in sorted(out.get(v, ())):
            if w not in rank:
                rank[w] = len(rank)
                rec(w)

    rec(source)
    return rank


def _dfs_iterative(out, source):
    rank = {source: 0}
    stack = [(source, iter(sorted(out.get(source, ()))))]
    while stack:
        v, it = stack[-1]
        for w in it:
            if w not in rank:
                rank[w] = len(rank)
                stack.append((w, iter(sorted(out.get(w, ())))))
                break
        else:
            stack.pop()
    return rank


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--source", type=int, default=0)
    args = ap.parse_args()

    out = defaultdict(set)
    for s, d in _edges(args.sf_dir):
        out[s].add(d)
    a = _dfs_recursive(out, args.source)
    b = _dfs_iterative(out, args.source)
    assert a == b, "recursive and iterative DFS disagree — do NOT pin"

    rows = ", ".join(f"({v},{r})" for v, r in sorted(a.items()))
    print('_DFS_GOLDEN_SQL = """')
    print("-- Golden: lexicographic DFS preorder from source 0, computed by two")
    print("-- independent pure-Python walkers (tools/gen_dfs_golden.py) over the")
    print("-- DuckDB-extracted edge table. Regenerate if the edge SQL or the")
    print("-- child-order rule changes.")
    print(
        "SELECT CAST(c0 AS BIGINT) AS vid, CAST(c1 AS BIGINT) AS rank FROM "
        f"(VALUES {rows}) t(c0, c1)"
    )
    print('"""')


if __name__ == "__main__":
    main()
