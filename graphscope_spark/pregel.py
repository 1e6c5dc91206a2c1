"""Pregel-style vertex programs — the reference's UDF surface, vectorized.

GraphScope exposes user algorithms as Pregel vertex programs: ``Init(v,
ctx)`` / ``Compute(messages, v, ctx)`` with an optional ``Combine``
(reference `analytical_engine/core/app/pregel/i_vertex_program.h:45-60`),
``send_message`` / ``vote_to_halt`` on the vertex handle
(`core/app/pregel/pregel_vertex.h:71-78`), e.g. the builtin
`apps/pregel/pagerank_pregel.h:28-83`. Python users write the same protocol
via the ``@pregel`` decorator (`python/graphscope/analytical/udf/
decorators.py:51-160`) and the coordinator cython-compiles it.

Here the protocol is declarative: a :class:`VertexProgram` supplies COLUMN
EXPRESSIONS (never per-row Python — the input-hint bans it, and expressions
stay inside whole-stage codegen):

* ``init_value``     — expression over the vertex table → initial value;
* ``message``        — expression over the (src value ⋈ edge) frame
                       (columns ``value`` and any edge property) → message
                       sent along each out-edge (both directions when
                       ``directed=False``) — ``send_message`` analog;
* ``combine``        — aggregate applied to incoming messages per target —
                       the ``Combine`` analog (GRAPE's message-manager
                       combine == Spark's partial aggregate);
* ``update``         — (old value, combined message or NULL) → new value —
                       the ``Compute`` body;
* ``halt``           — (old, new) → boolean "this vertex did NOT change";
                       all-halted ends the run — the ``vote_to_halt``
                       analog (a Pregel vertex reawakens on messages; in
                       the synchronous join-formulation every vertex sees
                       its combined message each round, so quiescence ==
                       no value changed anywhere).

One superstep = one join + one partial-aggregated shuffle + one state
update, driven by the shared BSP loop (checkpoint/resume, metrics, one
Spark job per round). This is exactly the plan shape every built-in
algorithm here uses — the Pregel surface adds no overhead, it only names
the protocol.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphscope_spark.bsp import BSPResult, run_bsp
from graphscope_spark.graph import LinkGraph


@dataclass
class VertexProgram:
    init_value: Callable[[], Column]
    message: Callable[[], Column]
    combine: Callable[[Column], Column]
    update: Callable[[Column, Column], Column]
    halt: Callable[[Column, Column], Column] = field(
        default=lambda old, new: old.eqNullSafe(new)
    )
    directed: bool = True


def run_pregel(
    graph: LinkGraph,
    program: VertexProgram,
    max_rounds: int = 100,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
) -> BSPResult:
    """Run a vertex program to quiescence. Result state is (vid, value)."""
    edges = graph.edges if program.directed else graph.undirected_edges()
    edges = edges.repartition(F.col("src")).persist()
    edges.count()

    state0 = graph.vertices.select(
        "vid", program.init_value().alias("value"), F.lit(False).alias("_halted")
    )

    def superstep(state: DataFrame, rnd: int) -> DataFrame:
        msgs = (
            state.select(F.col("vid").alias("src"), "value")
            .join(edges, "src")
            .groupBy("dst")
            .agg(program.combine(program.message()).alias("_m"))
            .withColumnRenamed("dst", "vid")
        )
        new_val = program.update(F.col("value"), F.col("_m"))
        return state.join(msgs, "vid", "left").select(
            "vid",
            new_val.alias("value"),
            program.halt(F.col("value"), new_val).alias("_halted"),
        )

    res = run_bsp(
        state0,
        superstep,
        max_rounds=max_rounds,
        scalar_fn=lambda st: st.where(~F.col("_halted")).count(),
        converged_fn=lambda active, rnd: active == 0,
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every,
        resume=resume,
        meta={"algorithm": "pregel", "directed": program.directed},
    )
    edges.unpersist()
    res.state = res.state.select("vid", "value")
    return res


# --- builtin example programs ---------------------------------------------------


def min_label_program() -> VertexProgram:
    """Connected components as a vertex program: propagate the minimum label
    both ways until quiescence (== ``wcc``; reference semantics
    `apps/projected/wcc_projected.h:76-180`)."""
    return VertexProgram(
        init_value=lambda: F.col("vid"),
        message=lambda: F.col("value"),
        combine=F.min,
        update=lambda old, m: F.least(old, F.coalesce(m, old)),
        directed=False,
    )


def hop_distance_program(source: int) -> VertexProgram:
    """BFS hop distance from ``source`` as a vertex program (== ``bfs``;
    unreached vertices keep NULL)."""
    return VertexProgram(
        init_value=lambda: F.when(F.col("vid") == source, F.lit(0)).cast("long"),
        message=lambda: F.col("value") + 1,
        combine=F.min,
        update=lambda old, m: F.least(old, m),  # least() skips NULLs
        directed=True,
    )
