"""Connected components by iterative min-label propagation — the dedup
cluster former: near-dup candidate PAIRS (LSH output) become dup GROUPS,
from which a pipeline keeps one canonical doc per group.

Algorithm: every vertex starts labelled with itself; each round a vertex
takes the min of its own label and its neighbors' labels; converges in
O(graph diameter) rounds to label = min vertex id reachable. This is
the standard Spark shape for iterative graph algorithms (GraphFrames'
connected components is an optimized variant of the same loop):

  * each round is ONE join + ONE groupBy on (src) — both shuffle on the
    vertex key, so rounds co-partition and AQE coalesces;
  * `localCheckpoint(eager=True)` truncates the lineage each round —
    without it the plan doubles per iteration and the driver dies
    planning round ~15 (at cluster scale: checkpoint to durable storage
    instead);
  * the per-round convergence check is a driver-side count of changed
    labels — the loop is control flow, the data never leaves executors.

Dup-graph diameters are tiny (near-dup clusters are dense), so the loop
ends after 2-4 rounds in practice."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """edges (undirected pairs) → (vertex, component) where component =
    min vertex id reachable. Vertices = every endpoint in `edges`."""
    # materialize the edge list ONCE — the join below re-evaluates its
    # input every round, and `edges` may be an expensive DAG (e.g. the
    # LSH near-dup pipeline)
    sym = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    ).distinct().localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("a").alias("vertex")).distinct()
        .withColumn("label", F.col("vertex"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["vertex"])
            .groupBy("a").agg(F.min("label").alias("nmin"))
        )
        # checkpoint FIRST (one materialization per round), then run the
        # cheap convergence probe against the checkpointed frame
        new_labels = (
            labels.join(
                neighbor_min, labels["vertex"] == neighbor_min["a"], "left")
            .select(
                "vertex",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("new_label"),
                "label",
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.where(
            F.col("new_label") != F.col("label")).limit(1).count()
        labels = new_labels.select(
            "vertex", F.col("new_label").alias("label"))
        if changed == 0:
            break
    return labels.select("vertex", F.col("label").alias("component"))


def dedup_keep_list(components: DataFrame) -> DataFrame:
    """(vertex, component) → per component: the canonical (min) doc to
    KEEP, the number of near-dups dropped — the output a training-data
    dedup stage feeds back into the pipeline."""
    return components.groupBy("component").agg(
        F.count("*").alias("group_size"),
        (F.count("*") - 1).alias("n_dropped"),
    )
