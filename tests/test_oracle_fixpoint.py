"""Guard the data-dependent unroll depths of the DuckDB gate oracles.

The iterative-algorithm oracles in ``__spark_entry__`` unroll a fixed number
of rounds; if any shortest-path hop count at the gate scale factor exceeded
the unroll, the oracle would silently return wrong distances and mask (or
fabricate) a Spark bug. These tests assert the fixpoint property directly:
running each unrolled oracle with ONE extra round changes nothing.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pandas as pd
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entry  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def _conn():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    return con


def _eq(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    a = a[sorted(a.columns)].sort_values(by=sorted(a.columns)).reset_index(drop=True)
    b = b[sorted(b.columns)].sort_values(by=sorted(b.columns)).reset_index(drop=True)
    return a.equals(b)


@pytest.mark.parametrize(
    "name,mk",
    [
        ("bfs", lambda r: entry._bellman_sql(r, "1", 0, "CAST(dist AS BIGINT) AS dist")),
        (
            "sssp",
            lambda r: entry._bellman_sql(
                r, "(src + dst) % 10 + 1", 0, "ROUND(dist, 6) AS dist"
            ),
        ),
    ],
)
def test_bellman_unroll_is_fixpoint(name, mk):
    rounds = {"bfs": 80, "sssp": 200}[name]
    con = _conn()
    at = con.execute(entry._materialize(mk(rounds))).df()
    plus = con.execute(entry._materialize(mk(rounds + 1))).df()
    assert _eq(at, plus), f"{name} oracle not converged at {rounds} rounds"


def test_multi_bfs_unroll_is_fixpoint():
    con = _conn()
    final = "SELECT root, vid, dist FROM {last} WHERE dist IS NOT NULL"
    at = con.execute(
        entry._materialize(entry._multi_bfs_sql(80, "vid % 97 = 0", final))
    ).df()
    plus = con.execute(
        entry._materialize(entry._multi_bfs_sql(81, "vid % 97 = 0", final))
    ).df()
    assert _eq(at, plus), "multi-BFS oracle not converged at 80 rounds"


def test_betweenness_unroll_is_fixpoint():
    con = _conn()
    at = con.execute(
        entry._materialize(entry._betweenness_sql(30, "vid % 97 = 0"))
    ).df()
    plus = con.execute(
        entry._materialize(entry._betweenness_sql(31, "vid % 97 = 0"))
    ).df()
    assert _eq(at, plus), "betweenness oracle not converged at 30 levels"


def test_coreness_unroll_is_fixpoint():
    con = _conn()
    at = con.execute(
        entry._materialize(
            entry._coreness_sql([(1, 4), (2, 4), (3, 4), (4, 4), (5, 120)])
        )
    ).df()
    plus = con.execute(
        entry._materialize(
            entry._coreness_sql([(1, 5), (2, 5), (3, 5), (4, 5), (5, 121)])
        )
    ).df()
    assert _eq(at, plus), "coreness peel unrolls not converged"


def test_mis_unroll_is_fixpoint():
    con = _conn()
    at = con.execute(entry._materialize(entry._mis_sql(25))).df()
    plus = con.execute(entry._materialize(entry._mis_sql(26))).df()
    assert _eq(at, plus), "MIS Luby unroll not converged at 25 rounds"


def test_diameter_unroll_is_fixpoint():
    con = _conn()
    at = con.execute(entry._materialize(entry._diameter_sql(12))).df()
    plus = con.execute(entry._materialize(entry._diameter_sql(13))).df()
    assert _eq(at, plus), "diameter oracle sweeps not converged at 12 rounds"


@pytest.mark.parametrize(
    "name,mk,rounds",
    [
        ("maximal_matching", lambda r: entry._maximal_matching_sql(r), 15),
        ("min_edge_cover", lambda r: entry._min_edge_cover_sql(r), 15),
        ("min_dominating_set", lambda r: entry._min_dominating_sql(r), 12),
        ("degeneracy_order", lambda r: entry._degeneracy_order_sql(r), 130),
        ("onion_layers", lambda r: entry._onion_layers_sql(r), 130),
    ],
)
def test_matching_ordering_unrolls_are_fixpoints(name, mk, rounds):
    con = _conn()
    at = con.execute(entry._materialize(mk(rounds))).df()
    plus = con.execute(entry._materialize(mk(rounds + 1))).df()
    assert _eq(at, plus), f"{name} unroll not converged at {rounds} rounds"
