"""HyperANF — approximate neighborhood function and effective diameter.

Boldi, Rosa & Vigna, "HyperANF: Approximating the Neighbourhood Function of
Very Large Graphs on a Budget" (WWW 2011): every vertex carries a
HyperLogLog sketch of the set of vertices reachable from it within t hops;
one BSP round unions each vertex's sketch with its out-neighbors' sketches,
so after t rounds sketch(v) estimates |B(v, t)| and the (out-)neighborhood
function NF(t) = Σ_v |B(v, t)| — the distance distribution of the graph —
falls out of one aggregate per round.  The effective diameter (smallest t
with NF(t) ≥ q·NF(∞)) is the standard web-graph statistic computed this
way on Common-Crawl-scale graphs.

The reference engine has no neighborhood-function app; this is the natural
scale path for its `diameter_approx` surface (`algorithms/closeness.py`) —
exact BFS fan-outs answer small graphs, HyperANF answers 10^9-vertex ones.

Spark shape — ZERO Python in the loop:

* The HLL sketch is m = 2^b REGISTER COLUMNS (`r0..r{m-1}`, tinyint), not
  an opaque binary blob: per-register `max` is a built-in aggregate, so the
  superstep is `state ⋈ edges(dst)` → `groupBy(src).agg(max(r_j)…)` →
  `greatest(own_j, msg_j)` — all whole-stage-codegen, map-side partial
  max, no UDF.  Message size is m bytes/vertex/round; m=64 (b=6, standard
  error 1.04/√64 ≈ 13% per vertex, far less on the NF sum — errors are
  independent across vertices) keeps the shuffled state at 64 B + vid.
* Register init: bucket = low b bits of xxhash64(vid); rho = leading-zero
  count of the remaining (64-b)-bit stream + 1, computed EXACTLY with
  `(65-b) - length(bin(w))` (bin() is integer bit-length — no float log2
  boundary errors).
* The per-round convergence aggregate IS the NF(t) estimate: the raw-HLL
  harmonic mean with the linear-counting small-range correction, one
  codegen expression over the m columns (`run_bsp`'s one-job-per-round
  contract).

The estimate is DETERMINISTIC (xxhash64 is seedless here; max is
associative/commutative), so results are partition-invariant and the gate
can hash-pin them; accuracy vs the exact neighborhood function is asserted
separately (pytest on seeded random digraphs + the gate's in-engine
comparison against the exact multi-source-BFS NF).
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphscope_spark.bsp import run_bsp
from graphscope_spark.graph import LinkGraph


def _alpha(m: int) -> float:
    """Standard HLL bias constant."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _estimate_expr(m: int) -> Column:
    """Per-row HLL cardinality estimate over register columns r0..r{m-1}."""
    inv_sum = reduce(
        lambda a, b: a + b,
        [F.pow(F.lit(2.0), -F.col(f"r{j}").cast("double")) for j in range(m)],
    )
    zeros = reduce(
        lambda a, b: a + b,
        [(F.col(f"r{j}") == 0).cast("int") for j in range(m)],
    )
    raw = F.lit(_alpha(m) * m * m) / inv_sum
    # linear-counting small-range correction (the only regime correction
    # needed here: counts are bounded by |V| << 2^(64-b))
    small = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    return F.when((raw <= F.lit(2.5 * m)) & (zeros > 0), small).otherwise(raw)


def neighborhood_function(
    graph: LinkGraph,
    t_max: int = 64,
    b: int = 6,
    rel_tol: float = 1e-3,
) -> DataFrame:
    """(t, nf) for t = 0..T — the approximate OUT-neighborhood function
    NF(t) = Σ_v (estimated) |{u : dist(v→u) ≤ t}|, T the first t where NF
    grows by < ``rel_tol`` relatively (or ``t_max``).  NF(0) ≈ |V|.

    Directed out-reachability: sketch(v) ← sketch(v) ∪ ⋃_{v→w} sketch(w),
    i.e. messages flow dst→src (join the state on the edge's dst side).
    Set ``rel_tol=0`` to force exactly ``t_max`` rounds (fixed-shape
    output, what the gate row uses).
    """
    m = 1 << b
    spark = graph.edges.sparkSession
    P = graph.num_partitions
    edges = (
        graph.edges.where(F.col("src") != F.col("dst"))
        .repartition(F.col("dst"))
        .persist()
    )
    edges.count()

    h = F.xxhash64(F.col("vid"))
    bucket = h.bitwiseAND(F.lit(m - 1))
    w = F.shiftrightunsigned(h, b)
    # rho = (# leading zeros of the (64-b)-bit stream) + 1; bin() has no
    # leading zeros, so bit-length(w) = length(bin(w)) and
    # rho = (64-b) - bitlen + 1 = (65-b) - len  (59 at the default b=6).
    rho = (F.lit(65 - b) - F.length(F.bin(w))).cast("tinyint")
    regs = [f"r{j}" for j in range(m)]
    state0 = graph.vertices.select(
        "vid",
        *[
            F.when(bucket == j, rho).otherwise(F.lit(0)).cast("tinyint").alias(r)
            for j, r in enumerate(regs)
        ],
    ).repartition(P, F.pmod(F.col("vid"), F.lit(P)))

    def superstep(state: DataFrame, rnd: int) -> DataFrame:
        msgs = (
            state.join(edges, state["vid"] == edges["dst"])
            .groupBy("src")
            .agg(*[F.max(r).alias(r) for r in regs])
        )
        return state.join(msgs, state["vid"] == msgs["src"], "left").select(
            state["vid"],
            *[
                F.greatest(state[r], F.coalesce(msgs[r], F.lit(0)))
                .cast("tinyint")
                .alias(r)
                for r in regs
            ],
        )

    est = _estimate_expr(m)
    nfs: list[float] = []

    def scalar_fn(state: DataFrame) -> float:
        # sum in decimal: addition is exact and order-independent, so the
        # NF estimate is bit-identical across partitionings (double sums
        # are not associative and would drift with the aggregation order)
        v = state.agg(F.sum(est.cast("decimal(32,6)"))).collect()[0][0]
        return float(v) if v is not None else 0.0

    # NF(0) on the initial state (one extra aggregate before the loop)
    nfs.append(scalar_fn(state0))

    def converged(nf: float, rnd: int) -> bool:
        prev = nfs[-1]
        nfs.append(nf)
        if rel_tol <= 0.0:
            return False  # fixed-shape mode: run exactly t_max rounds
        return abs(nf - prev) <= rel_tol * max(abs(nf), 1.0)

    res = run_bsp(
        state0,
        superstep,
        max_rounds=t_max,
        scalar_fn=scalar_fn,
        converged_fn=converged,
        meta={"algorithm": "hyperanf"},
    )
    # the NF numbers are already in `nfs`; free the 64-register-per-vertex
    # final state (the widest BSP state in the suite) instead of retaining
    # it for the session
    res.release()
    edges.unpersist()
    return spark.createDataFrame(
        [(t, float(v)) for t, v in enumerate(nfs)], "t int, nf double"
    )


def effective_diameter(
    graph: LinkGraph,
    q: float = 0.9,
    t_max: int = 64,
    b: int = 6,
    rel_tol: float = 1e-3,
) -> float:
    """Smallest t with NF(t) ≥ q · NF(T) (integer convention; HyperANF's
    interpolated variant differs by < 1).  NF(T) stands in for NF(∞) —
    tighten ``rel_tol`` to push T closer to the true horizon."""
    nf = neighborhood_function(graph, t_max=t_max, b=b, rel_tol=rel_tol)
    rows = sorted(
        ((r["t"], r["nf"]) for r in nf.collect()), key=lambda x: x[0]
    )
    total = rows[-1][1]
    for t, v in rows:
        if v >= q * total:
            return float(t)
    return float(rows[-1][0])  # pragma: no cover - q <= 1 always hits
