"""Connected components over a pair/edge list (training-data mandate,
M15): near-dup mining (q14c Jaccard, MinHash-LSH m4, SimHash m5,
embedding-cosine) emits PAIRS, but canonicalization needs the CLUSTER —
the transitive closure of "is a near-dup of" — so exactly one canonical
document survives per group, not one per pair. The reference dedups on
a composite key only (/root/reference/test.py:103-107); this closes the
pair→cluster gap its pipeline never needed.

Algorithm: min-label propagation with pointer jumping. Each round
  1. every node takes the min label among itself and its neighbors,
  2. labels are short-circuited through their parents (lbl ← lbl(lbl)),
so chains collapse in O(log diameter) rounds, not O(diameter) — a
201-node path (observed in the sf0.1 shingle graph) converges in ~8
rounds instead of ~200. Per-round state is two longs per node; every
shuffle key is a long; lineage is truncated per round with an eager
localCheckpoint (the q21 lesson: unbounded iterative lineage re-plans
the whole history every action).

Scale: edges after near-dup mining are a tiny fraction of the corpus
(only docs with at least one near-dup appear), so the per-round joins
shuffle far less than one corpus pass. The fixpoint test is a monotone
sum (labels only ever decrease), one cheap agg action per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    *,
    max_rounds: int = 25,
) -> DataFrame:
    """Return (node, component) for every node appearing in `edges`,
    where component = the minimum node id in its connected component
    (deterministic canonical label). Nodes must be integral ids.

    Raises RuntimeError if the fixpoint is not reached in `max_rounds`
    (2^25 ≈ 33M-hop diameters — loud is better than silently partial).
    """
    und = edges.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    )
    und = und.union(und.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    # Materialize the symmetrized edge list FIRST — the upstream pair
    # generation (an inverted-index self-join for the dedup consumers)
    # must run exactly once; everything below derives from these
    # blocks. (r11 regression lesson: deriving nodes/self-loops from
    # the UNcheckpointed subtree re-ran that self-join 3x at loop
    # start — bench q30/q74 +1.5-2.5 s — invisible in the isolated A/B
    # whose edges were pre-pinned.)
    und = und.localCheckpoint(eager=True)
    labels = (
        und.select(F.col("u").alias("node")).distinct().withColumn("lbl", F.col("node"))
    ).localCheckpoint(eager=True)
    # r11 round-cost fusion, part 1: append a self-loop per node, so the
    # per-round "min label among self + neighbors" is ONE edge join +
    # min-agg — the previous shape needed a second (node-keyed) left
    # join to fold the node's own label back in. Same labels, same
    # round count (measured: 9 rounds either way on the sf0.1 shingle
    # graph; identical label checksums), one fewer shuffle per round.
    # Built from the two checkpointed frames above (block reads, no
    # recompute); lazy — round 1's propagate job materializes it.
    und = und.union(
        labels.select(F.col("node").alias("u"), F.col("node").alias("v"))
    ).localCheckpoint(eager=False)
    prev_sum = labels.agg(F.sum("lbl")).collect()[0][0]
    if prev_sum is None:  # empty edge list
        return labels.select("node", F.col("lbl").alias("component"))

    # r12 continuation, probed and REJECTED: running TWO rounds per
    # fixpoint action (halving driver barriers; sum is monotone so a
    # 2-round block detects change exactly). Paired knob probes, both
    # orders, min-of-4 at sf0.1: q30 3.437/3.436 fwd, 3.425/3.46 rev;
    # q74 3.716/3.776 fwd, 3.406/3.458 rev (unpaired/paired) — a wash
    # locally, and at scale the up-to-one extra converged round is a
    # FULL edge join + agg while the saved barriers are driver
    # round-trips only. One round per action stays.
    for _ in range(max_rounds):
        # 1. propagate: min label among self + neighbors (self via the
        # self-loops above). Column names are made globally unique
        # before every join — self-joins on shared-lineage frames
        # misresolve by attribute id (observed: silent corruption, not
        # an error), name-based resolution with disjoint names is
        # unambiguous.
        merged = (
            und.join(
                labels.select(F.col("node").alias("v"), F.col("lbl").alias("v_lbl")), "v"
            )
            .groupBy("u")
            .agg(F.min("v_lbl").alias("lbl"))
            .withColumnRenamed("u", "node")
        )
        # `merged` feeds both sides of the pointer-jump join, so the
        # propagate join+min-agg computes twice inside the fixpoint
        # action (ADVICE r11). A lazy localCheckpoint here was A/B'd
        # in r12 (paired knob probe, min-of-4, sf0.1): q30 3.78->4.87,
        # q74 4.13->4.53 — REJECTED: 9 rounds x one extra block
        # materialization cost more than the duplicated propagate over
        # already-pinned inputs. Revisit only if the per-round edge
        # volume grows enough that the propagate dominates.
        # 2. pointer jump: lbl ← lbl(lbl). A label is always itself a
        # node id, so the lookup is a left join that always matches.
        parent = merged.select(F.col("node").alias("p"), F.col("lbl").alias("p_lbl"))
        # r11 round-cost fusion, part 2: the checkpoint is LAZY and the
        # fixpoint-sum action materializes it — one Spark action per
        # round where the eager-checkpoint + separate agg shape paid
        # two (measured with the self-loop fold: q30's closure loop
        # 4.6 s → 3.5 s warm at sf0.1, labels identical).
        labels = (
            merged.join(parent, F.col("lbl") == F.col("p"), "left")
            .select("node", F.coalesce("p_lbl", "lbl").alias("lbl"))
            .localCheckpoint(eager=False)
        )
        new_sum = labels.agg(F.sum("lbl")).collect()[0][0]
        if new_sum == prev_sum:  # monotone ⇒ fixpoint
            return labels.select("node", F.col("lbl").alias("component"))
        prev_sum = new_sum
    raise RuntimeError(f"connected_components: no fixpoint in {max_rounds} rounds")


def dedup_clusters(
    docs: DataFrame, edges: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Full cluster assignment: every document mapped to its component
    (singletons map to themselves), plus the cluster size. Downstream
    keeps `doc_id == component_id` rows for one-canonical-per-cluster
    dedup."""
    from pyspark.sql import Window

    cc = connected_components(edges).withColumnRenamed("node", id_col)
    assign = (
        docs.select(id_col)
        .join(cc, id_col, "left")
        .select(id_col, F.coalesce("component", F.col(id_col)).alias("component_id"))
    )
    w = Window.partitionBy("component_id")
    return assign.withColumn("cluster_size", F.count(F.lit(1)).over(w))
