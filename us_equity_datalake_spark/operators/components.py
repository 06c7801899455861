"""Connected components over an edge list — the clustering step of
near-duplicate deduplication (LSH/SimHash/cosine pairs → dup clusters →
one canonical survivor per cluster).

The reference stops at pairwise duplicate detection; a training-data
pipeline needs the transitive closure: if A~B and B~C, all three are one
cluster even when A~C was never scored.  This is iterative min-label
propagation expressed in DataFrame ops:

  1. every node starts with label = its own id,
  2. each iteration, a node's label becomes min(own, neighbors' labels),
  3. stop when no label changed (converges in O(cluster diameter) rounds).

Scale notes (100 TB / 1000 executors):

- Each iteration is one shuffle: edges join labels on src (edges are
  pre-partitioned by src once and reused), then a groupBy(dst) min.  Near-dup
  graphs are overwhelmingly tiny star/clique clusters, so diameter — and the
  iteration count — stays single-digit even at web scale.
- ``localCheckpoint`` truncates the lineage each round; without it the plan
  doubles per iteration and the driver OOMs on plan compilation long before
  data is a problem.
- For adversarial long-chain graphs, swap the loop body for the
  large-star/small-star algorithm (Kiveris et al., "Connected Components in
  MapReduce and Beyond", SoCC'14) — same DataFrame skeleton, provably
  O(log²n) rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    local_threshold: int = 2_000_000,
) -> DataFrame:
    """Return (node, component) where component = min node id reachable.

    ``edges`` may be directed and unsorted; symmetry is added internally.
    Only nodes that appear in at least one edge are returned (isolated nodes
    trivially form their own singleton components).

    Size-adaptive execution (the same two-regime design as GraphFrames'
    ``broadcastThreshold``): the near-dup edge list is typically a sub-percent
    fraction of the corpus, so after the distributed pair generation the graph
    itself often fits on the driver — a local union-find is then O(E·α) with
    zero shuffles, versus O(diameter) full shuffle rounds.  Above
    ``local_threshold`` edges, iterative min-label propagation runs fully
    distributed; pass ``local_threshold=0`` to force the distributed path.
    """
    # materialize the forward edges BEFORE symmetrizing: both union branches
    # read them, and the upstream (e.g. cosine pair generation) is the
    # expensive part — without this it would be computed twice in one job
    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).persist()
    fwd.count()
    sym = fwd.unionByName(fwd.select(F.col("v").alias("u"), F.col("u").alias("v")))
    # distinct narrows the per-iteration join; reused every round, so persist
    sym = sym.distinct().persist()

    n_edges = sym.count()  # also materializes the persist
    fwd.unpersist()
    if n_edges <= local_threshold:
        spark = edges.sparkSession
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        # one collect, bounded by local_threshold edges (toLocalIterator would
        # schedule a separate job per partition — far slower for small graphs)
        for u, v in sym.select("u", "v").collect():
            if u not in parent:
                parent[u] = u
            if v not in parent:
                parent[v] = v
            ru, rv = find(u), find(v)
            if ru != rv:  # min-id root wins => label == min reachable id
                if rv < ru:
                    ru, rv = rv, ru
                parent[rv] = ru
        rows = [(n, find(n)) for n in parent]
        sym.unpersist()
        schema = sym.select(F.col("u").alias("node"), F.col("u").alias("component")).schema
        return spark.createDataFrame(rows, schema)

    # seed labels with min(node, min neighbor): the same shuffle the node-list
    # distinct would cost, but it already IS the first propagation round
    labels = (
        sym.groupBy(F.col("u").alias("node"))
        .agg(F.min("v").alias("nb"))
        .select("node", F.least("node", "nb").alias("label"))
        .localCheckpoint()
    )

    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["u"] == labels["node"])
            .groupBy(F.col("v").alias("node"))
            .agg(F.min("label").alias("nb_label"))
        )
        # checkpoint FIRST, then probe convergence on the materialized rows —
        # counting before checkpointing would run the iteration's join twice
        updated = (
            labels.join(neighbor_min, "node", "left")
            .select("node", F.least("label", "nb_label").alias("new_label"), "label")
            .localCheckpoint()
        )
        changed = updated.filter(F.col("new_label") < F.col("label")).limit(1).count()
        labels = updated.select("node", F.col("new_label").alias("label"))
        if changed == 0:
            break
    sym.unpersist()
    return labels.select("node", F.col("label").alias("component"))


def dedup_clusters(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Cluster summary for near-dup dedup: one row per component with its
    canonical survivor (min id), member count, and the members themselves —
    the "keep one per duplicate cluster" decision table."""
    cc = connected_components(edges, src=src, dst=dst, max_iter=max_iter)
    return cc.groupBy("component").agg(
        F.count("*").alias("cluster_size"),
        F.sort_array(F.collect_list("node")).alias("members"),
    )
