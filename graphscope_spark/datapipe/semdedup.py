"""SemDeDup: semantic (embedding-space) deduplication.

Abbas et al. 2023 ("SemDeDup: Data-efficient learning at web-scale through
semantic deduplication"): k-means-cluster the embedding space, then inside
every cluster drop all but one member of each group of near-identical
vectors (cosine ≥ threshold). The expensive global near-dup problem
factors into many small within-cluster problems.

Spark shape (the 100 TB plan):

1. Coarse clustering reuses the IVF quantizer
   (``similarity.ivf_assignments`` with nprobe=1): deterministic spherical
   k-means trained on a hash-ordered sample — the sample is the only data
   that reaches the driver; assignment is a broadcast-centroid GEMM per
   Arrow batch.
2. Within-cluster pair scan is ``applyInPandas`` grouped by cluster — one
   shuffle keyed on the cluster id, then an in-memory GEMM per cluster.
   Cluster size is bounded by construction (``n_clusters`` scales with the
   corpus: E[size] = n/k); the guard refuses clusters above
   ``max_cluster_size`` instead of OOMing an executor, pointing at a
   larger ``n_clusters``.
3. Keeper election is deterministic: within every near-dup pair the
   smaller id survives; a vector is dropped iff it loses to ANY neighbor —
   no iterative clustering needed (matches the paper, which also keeps
   one representative per ε-ball greedily).

The result is (id, cluster, keep). Like the reference's LDBC golden-file
mode, the gate pins an independently regenerated golden
(``tools/gen_semdedup_golden.py`` — pure NumPy, no Spark imports).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.datapipe.similarity import ivf_assignments


def semantic_dedup(
    emb: DataFrame,
    n_clusters: int = 16,
    threshold: float = 0.95,
    sample_cap: int = 20_000,
    train_iters: int = 5,
    max_cluster_size: int = 200_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster, keep) — ``keep = false`` iff some other member of the
    same k-means cluster has cosine similarity ≥ ``threshold`` and a
    smaller id."""
    import numpy as np
    import pandas as pd

    assign = ivf_assignments(
        emb,
        n_centroids=n_clusters,
        nprobe=1,
        sample_cap=sample_cap,
        train_iters=train_iters,
        id_col=id_col,
        vec_col=vec_col,
    ).select("id", "vec", "norm", "cluster")

    thr = float(threshold)
    cap = int(max_cluster_size)

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        m = len(pdf)
        if m > cap:
            raise ValueError(
                f"semantic_dedup: cluster of {m} vectors exceeds "
                f"max_cluster_size={cap}; raise n_clusters so E[cluster "
                f"size]=n/k fits executor memory (or raise the cap)"
            )
        pdf = pdf.sort_values("id", kind="mergesort").reset_index(drop=True)
        if m < 2:
            return pd.DataFrame(
                {
                    "id": pdf["id"],
                    "cluster": pdf["cluster"],
                    "keep": np.ones(m, dtype=bool),
                }
            )
        x = np.array(list(pdf["vec"]), dtype=np.float64)
        nrm = pdf["norm"].to_numpy()
        x /= np.where(nrm > 0, nrm, 1.0)[:, None]
        # drop row i iff sim(i, j) >= thr for some j < i (smaller id wins).
        # CHUNKED GEMM: a full m x m sims matrix is 8·m² bytes — 320 GB at
        # the cap — so the pairwise scan runs in row blocks sized to a
        # ~1 GB similarity slab (chunk x m), making max_cluster_size an
        # honest executor-memory bound instead of a number the allocation
        # below would blow through.
        drop = np.zeros(m, dtype=bool)
        chunk = max(64, (1 << 27) // max(m, 1))
        for a in range(1, m, chunk):
            b = min(a + chunk, m)
            block = x[a:b] @ x[:b].T  # rows a..b vs all earlier-or-self
            earlier = (
                np.arange(a, b)[:, None] > np.arange(b)[None, :]
            )
            drop[a:b] = ((block >= thr) & earlier).any(axis=1)
        keep = ~drop
        return pd.DataFrame(
            {"id": pdf["id"], "cluster": pdf["cluster"], "keep": keep}
        )

    return assign.groupBy("cluster").applyInPandas(
        scan, "id long, cluster int, keep boolean"
    )
