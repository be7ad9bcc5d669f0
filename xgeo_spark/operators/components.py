"""Connected components over an edge list — duplicate-cluster resolution.

Why this exists: every near-duplicate detector in this engine (MinHash/LSH,
SimHash, n-gram Jaccard, embedding-cosine — functions/dedup_text.py,
functions/vectors.py) emits candidate PAIRS. A training-data dedup pipeline
needs one more step: fold the pair relation's transitive closure into
clusters (A~B and B~C put A and C in one cluster even when A!~C directly)
and pick one representative per cluster to keep. This operator is that
step, expressed as DataFrame ops only.

Algorithm: iterative min-label propagation. Every node starts labeled with
its own id; each round, every node takes the minimum label among itself and
its neighbors; at fixpoint each node's label is the minimum node id in its
component (the canonical cluster id). Rounds needed = graph diameter, and
each round is one equi-join + one groupBy(min) — all shuffles on the node
id, no all-pairs work anywhere.

Scale: near-dup graphs at 100 TB are huge in node count but shallow —
clusters are cliques-ish blobs with tiny diameter, so the loop runs ~3-5
rounds regardless of data size. Each round's lineage must be truncated
(without it, the plan doubles every round and the driver dies on analysis
long before the executors sweat); HOW it is truncated is the
fault-tolerance knob:

- ``checkpoint_dir`` set (the CLUSTER path): reliable ``checkpoint()`` to
  that directory — each round's labels live on HDFS/object storage, so
  losing an executor mid-loop costs one round's recompute, not the job.
  This is what a 1000-executor run must use.
- ``checkpoint_dir`` unset (single-node/test default): ``localCheckpoint``
  — blocks on executors, zero extra I/O, but an executor loss kills the
  lineage; acceptable only where executor == driver (local mode).

Convergence is an exact changed-label count (an any-change probe:
``limit(1).count()`` over the old⋈new label join, co-partitioned because
both sides were just hash-aggregated on node — one bounded scalar job per
round). For graphs with adversarially long chains, swap the propagation
body for the large-star/small-star rewrite (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) — same interface, fewer
rounds; not needed for dedup-shaped graphs.

Reference provenance: the reference engine has no graph/set operators at
all (SURVEY.md §2.3); this is part of the target's training-data-pipeline
surface, not a ported operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Cluster the undirected graph given by ``edges`` (one row per edge).

    Returns one row per node that appears in any edge, with columns
    ``node`` (the original id, src/dst dtype) and ``component`` (the
    minimum node id in its connected component). Isolated nodes never
    appear in ``edges`` and so are not emitted — callers wanting
    singleton clusters left-join this result against their node set.

    ``checkpoint_dir`` (default: the ``XGEO_CHECKPOINT_DIR`` env var)
    selects reliable per-round checkpoints — REQUIRED on a real cluster,
    see module doc. When neither is given but the session already HAS a
    checkpoint dir (set by the CLI's --checkpoint-dir via
    IngestConfig.checkpoint_dir, or by any caller of
    ``sc.setCheckpointDir``), reliable checkpoints are used there — the
    cluster-safe path needs no env var. Only with no checkpoint root at
    all does it fall back to executor-local lineage truncation.

    Raises RuntimeError if the propagation has not reached a fixpoint
    after ``max_iter`` rounds (diameter > max_iter).
    """
    import os

    checkpoint_dir = checkpoint_dir or os.environ.get("XGEO_CHECKPOINT_DIR")
    sc = edges.sparkSession.sparkContext
    if checkpoint_dir:
        if sc.getCheckpointDir() is None or not str(
            sc.getCheckpointDir()
        ).startswith(checkpoint_dir.rstrip("/")):
            sc.setCheckpointDir(checkpoint_dir)
        reliable = True
    else:
        reliable = sc.getCheckpointDir() is not None

    def _truncate(df: DataFrame, eager: bool) -> DataFrame:
        if reliable:
            return df.checkpoint(eager=eager)
        return df.localCheckpoint(eager=eager)

    # symmetrize once; both directions are needed so a label can travel
    # either way along an edge
    fwd = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = _truncate(
        fwd.union(fwd.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct(),
        eager=True,
    )

    labels = _truncate(
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node")),
        eager=True,
    )
    for _ in range(max_iter):
        # each neighbor offers its current label; min over (self ∪ offers)
        offers = sym.join(labels, sym["a"] == labels["node"]).select(
            F.col("b").alias("node"), F.col("lbl")
        )
        new_labels = _truncate(
            offers.unionByName(labels)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl")),
            # lazy: the convergence probe below is the round's one action
            # and materializes the checkpoint as a side effect — eager=True
            # would compute the same plan twice per round
            eager=False,
        )
        # exact fixpoint test, id-type-agnostic: count nodes whose label
        # moved. Both sides were just hash-aggregated on node, so the join
        # is co-partitioned — one bounded scalar job per round.
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select("node", F.col("lbl").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(graph diameter exceeds max_iter)"
    )


def dup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Near-dup pairs -> cluster assignment with representative + size.

    Output: one row per clustered doc — ``cluster_id`` (min member id,
    the canonical representative a dedup pipeline KEEPS), ``member_id``,
    ``n_members``; every member with ``member_id != cluster_id`` is a
    candidate for dropping.
    """
    comp = connected_components(
        pairs, src=id_a, dst=id_b, checkpoint_dir=checkpoint_dir
    )
    w = comp.groupBy("component").agg(F.count(F.lit(1)).alias("n_members"))
    return (
        comp.join(w, "component")
        .select(
            F.col("component").alias("cluster_id"),
            F.col("node").alias("member_id"),
            "n_members",
        )
    )
