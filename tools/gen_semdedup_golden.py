"""Regenerate the SemDeDup golden oracle in __spark_entry__.py.

Run after any change to graphscope_spark.datapipe.semdedup or the IVF
quantizer it reuses:

    python tools/gen_semdedup_golden.py [--sf-dir /root/testdata/sf0.01]

semantic_dedup is deterministic end-to-end: the k-means quantizer trains
on a hash-ordered sample with first-k init (no RNG), assignment is an
argmax over broadcast centroids, and the within-cluster keep rule is a
pure function of (sorted ids, exact cosines). Pinning the (id, keep)
table mirrors the reference's LDBC golden-file validation mode
(`analytical_engine/test/app_tests.sh:115-126`). The script verifies
partition-invariance by running twice in fresh processes at different
parallelism/shuffle settings before rewriting the embedded SQL.
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


_CHILD = r"""
import sys
sys.path.insert(0, {repo!r})
from graphscope_spark.session import get_spark
import __spark_entry__ as entry
spark = get_spark("gen-semdedup-golden", master="local[{cpus}]",
                  shuffle_partitions={parts})
rows = sorted((r["id"], bool(r["keep"]))
              for r in entry._q_semdedup(spark, {sf_dir!r}).collect())
print("ROWS " + repr(rows))
spark.stop()
"""


def _run_pass(cpus: int, parts: int, sf_dir: str) -> list[tuple[int, bool]]:
    import ast
    import subprocess
    import sys as _sys

    code = _CHILD.format(repo=str(REPO), cpus=cpus, parts=parts, sf_dir=sf_dir)
    proc = subprocess.run(
        [_sys.executable, "-c", code], capture_output=True, text=True, cwd=str(REPO)
    )
    for line in proc.stdout.splitlines():
        if line.startswith("ROWS "):
            return ast.literal_eval(line[len("ROWS "):])
    raise RuntimeError(f"golden pass local[{cpus}] failed:\n{proc.stdout}\n{proc.stderr}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    a = _run_pass(8, 32, args.sf_dir)
    b = _run_pass(5, 13, args.sf_dir)
    assert a == b, "semdedup output not partition-invariant — do NOT pin a golden"

    rows = ", ".join(f"({i},{str(k).upper()})" for i, k in a)
    n_drop = sum(1 for _, k in a if not k)
    sql = (
        "-- Golden output: semantic_dedup is deterministic (hash-ordered\n"
        "-- sample, first-k k-means init, exact within-cluster cosines,\n"
        "-- smaller-id-wins keep rule) -- verified identical across processes\n"
        "-- and partitionings. Pinning (id, keep) mirrors the reference's\n"
        "-- LDBC golden-file validation (test/app_tests.sh:115-126).\n"
        "-- Regenerate with tools/gen_semdedup_golden.py if the algorithm\n"
        "-- or the IVF quantizer changes.\n"
        f"SELECT CAST(c0 AS BIGINT) AS id, CAST(c1 AS BOOLEAN) AS keep "
        f"FROM (VALUES {rows}) t(c0, c1)"
    )
    p = REPO / "__spark_entry__.py"
    s = p.read_text()
    s = re.sub(
        r'_SEMDEDUP_GOLDEN_SQL = """\n.*?\n"""',
        '_SEMDEDUP_GOLDEN_SQL = """\n' + sql + '\n"""',
        s,
        count=1,
        flags=re.S,
    )
    p.write_text(s)
    print(f"pinned {len(a)} rows, {n_drop} dropped as semantic near-dups")


if __name__ == "__main__":
    main()
