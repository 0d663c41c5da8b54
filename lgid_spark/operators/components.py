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


def _checkpoint_tracked(df: DataFrame) -> tuple[DataFrame, set]:
    """localCheckpoint(eager) and return the persistent-RDD ids it
    created, so superseded rounds can be unpersisted explicitly instead
    of lingering until the driver's ContextCleaner happens to run."""
    jsc = df.sparkSession.sparkContext._jsc
    before = {rid for rid in jsc.getPersistentRDDs().keySet()}
    out = df.localCheckpoint(eager=True)
    after = {rid for rid in jsc.getPersistentRDDs().keySet()}
    return out, after - before


def _unpersist_ids(df: DataFrame, ids: set) -> None:
    jmap = df.sparkSession.sparkContext._jsc.getPersistentRDDs()
    for rid in ids:
        rdd = jmap.get(rid)
        if rdd is not None:
            rdd.unpersist(False)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """edges (undirected pairs) → (vertex, component) where component =
    min vertex id reachable. Vertices = every endpoint in `edges`.

    Raises RuntimeError if labels have not converged after ``max_iter``
    rounds (propagation needs ~graph-diameter rounds; a silent break
    would return split components and a dedup stage would then keep
    several "canonical" docs from one duplicate group)."""
    # materialize the edge list ONCE — the join below re-evaluates its
    # input every round, and `edges` may be an expensive DAG (e.g. the
    # LSH near-dup pipeline)
    sym = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    ).distinct().localCheckpoint(eager=True)
    labels, prev_ids = _checkpoint_tracked(
        sym.select(F.col("a").alias("vertex")).distinct()
        .withColumn("label", F.col("vertex"))
    )
    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["vertex"])
            .groupBy("a").agg(F.min("label").alias("nmin"))
        )
        # checkpoint FIRST (one materialization per round), then run the
        # cheap convergence probe against the checkpointed frame
        new_labels, new_ids = _checkpoint_tracked(
            labels.join(
                neighbor_min, labels["vertex"] == neighbor_min["a"], "left")
            .select(
                "vertex",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("new_label"),
                "label",
            )
        )
        changed = new_labels.where(
            F.col("new_label") != F.col("label")).limit(1).count()
        # the superseded round's cached blocks are dead the moment the
        # new checkpoint is materialized — free them now, not at GC time
        _unpersist_ids(new_labels, prev_ids)
        prev_ids = new_ids
        labels = new_labels.select(
            "vertex", F.col("new_label").alias("label"))
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "rounds — the component graph has a longer chain than "
            "expected (near-dup clusters are normally dense); raise "
            "max_iter rather than accept silently split components")
    return labels.select("vertex", F.col("label").alias("component"))


def dedup_keep_list(components: DataFrame) -> DataFrame:
    """(vertex, component) → per component: the canonical (min) doc to
    KEEP, the number of near-dups dropped — the output a training-data
    dedup stage feeds back into the pipeline."""
    return components.groupBy("component").agg(
        F.count("*").alias("group_size"),
        (F.count("*") - 1).alias("n_dropped"),
    )
