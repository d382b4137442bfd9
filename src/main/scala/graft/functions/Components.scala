package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge set by min-label
  * propagation — the closure step every pair-emitting dedup pipeline
  * needs: banded LSH (l9) finds near-dup PAIRS, but removal must keep
  * exactly one document per transitive CLUSTER (a re-crawl chain
  * a~b~c is one cluster even if (a, c) never shared a band). The
  * iterative min-label scheme is the standard distributed construction
  * (the simple variant of Kiveris et al., "Connected Components in
  * MapReduce and Beyond", SoCC 2014 — each round every node adopts the
  * smallest label in its closed neighborhood; labels converge to the
  * component's minimum id in at most `diameter` rounds).
  *
  * Everything is declarative joins + aggregations: each round is one
  * equi-join of the self-looped symmetric edges against the labels
  * (shuffle keyed on node id both sides — the SAME partitioning every
  * round, so AQE reuses the layout) and a `min` hash agg. No
  * driver-side graph, no collect.
  *
  * The iteration count is FIXED, not convergence-polled: near-dup
  * clusters are near-cliques (diameter 2-3), so a small budget closes
  * them, and a fixed budget keeps the whole computation one composable
  * plan with no per-round driver action. Callers verify convergence
  * in-plan via [[unconverged]] (l28 emits it as an invariant column
  * the gate pins at 0). At 100 TB each round's labels would
  * `localCheckpoint` to cut lineage — at catalog scale the composed
  * plan is cheaper than the materialization.
  */
object Components {

  /** Symmetrized edges PLUS a self-loop per node. The self-loop is the
    * load-bearing trick: with it, a round's new label is ONE
    * `min(comp)` over the closed neighborhood — the labels frame is
    * referenced exactly once per round, so the composed plan grows
    * LINEARLY in rounds. (The textbook `least(own, min(neighbors))`
    * form references labels twice per round, doubling the plan each
    * iteration — 2^8 subtree copies at 8 rounds, measured ~60 s where
    * this shape runs in ~4 s.) */
  private def closedSym(edges: DataFrame): DataFrame = {
    val se = edges.select(col("ida").as("a"), col("idb").as("b"))
      .unionByName(edges.select(col("idb").as("a"), col("ida").as("b")))
    se.unionByName(
      se.select(col("a")).distinct().select(col("a"), col("a").as("b")))
  }

  /** One propagation round over self-looped edges: every node takes the
    * min label over its closed neighborhood. */
  private def step(closed: DataFrame, labels: DataFrame): DataFrame =
    closed.join(labels.select(col("id").as("b"), col("comp")), "b")
      .groupBy("a").agg(min("comp").as("comp"))
      .withColumnRenamed("a", "id")

  /** Labels after `iters` rounds: (id, comp) for every node appearing
    * in `edges` (columns ida, idb), comp = min id reachable within
    * `iters` hops (= the component minimum once `iters` ≥ diameter). */
  def close(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"Components.close: iters must be >= 1, got $iters")
    val closed = closedSym(edges)
    val nodes = closed.select(col("a").as("id")).distinct()
    (1 to iters).foldLeft(nodes.withColumn("comp", col("id")))(
      (labels, _) => step(closed, labels))
  }

  /** Convergence-adaptive closure for graphs whose diameter is NOT
    * known small: propagate in blocks of `checkpointEvery` rounds,
    * `localCheckpoint` each block (bounded lineage — the fixed-budget
    * [[close]] composes its whole cascade into one plan, which is the
    * right trade only for small budgets), and poll ONE bounded row
    * after each block — an exact label-sum aggregate whose
    * monotonicity makes sum-unchanged equivalent to fixpoint — stopping
    * there. A 40-hop chain thus converges without anyone hand-
    * setting a budget, and the cost on an easy graph is one extra
    * no-change block. Throws if `maxIters` rounds pass without
    * convergence — under-merged labels must never escape silently
    * (same contract as l28's pinned `n_unconverged = 0`).
    *
    * Returns the fixpoint labels; [[closeAdaptiveMeasured]] also
    * reports the rounds run (spec observability). */
  def closeAdaptive(edges: DataFrame, maxIters: Int = 64,
      // 2, not 4: every pipeline caller closes near-dup clusters, which
      // are near-cliques (diameter 2-3) — with blocks of 4 the typical
      // call pays 8 propagation rounds (4 active + a 4-round no-op
      // confirmation block) where blocks of 2 pay 4-6; a long-diameter
      // graph pays one extra poll per 2 rounds, bounded and cheap (the
      // poll is a 1-row scan-aggregate over a checkpointed frame).
      // Labels are the unique fixpoint either way — block size is pure
      // cost, never semantics (ComponentsSpec's explicit-block pins).
      checkpointEvery: Int = 2): DataFrame =
    closeAdaptiveMeasured(edges, maxIters, checkpointEvery)._1

  private[graft] def closeAdaptiveMeasured(edges: DataFrame, maxIters: Int,
      checkpointEvery: Int): (DataFrame, Int) = {
    require(maxIters >= 1, s"closeAdaptive: maxIters must be >= 1, got $maxIters")
    require(checkpointEvery >= 1,
      s"closeAdaptive: checkpointEvery must be >= 1, got $checkpointEvery")
    val closed = closedSym(edges).localCheckpoint()
    var labels = closed.select(col("a").as("id")).distinct()
      .withColumn("comp", col("id")).localCheckpoint()
    // bounded poll: ONE scan-aggregate per BLOCK, not a join — each
    // round every comp either stays or strictly decreases (min over a
    // closed neighborhood that includes self), so the exact label sum
    // is unchanged iff NO label changed ⟺ fixpoint. decimal(38,0)
    // keeps the sum exact at any corpus size (n·maxId ≲ 10³² ≪ 10³⁸);
    // a long sum could wrap and alias two different labelings.
    def labelSum(l: DataFrame): java.math.BigDecimal =
      l.agg(coalesce(sum(col("comp").cast("decimal(38,0)")),
        lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)")).as("s"))
        .collect()(0).getDecimal(0)
    var prevSum = labelSum(labels)
    var rounds = 0
    while (rounds < maxIters) {
      val block = math.min(checkpointEvery, maxIters - rounds)
      val next = (1 to block).foldLeft(labels)((l, _) => step(closed, l))
        .localCheckpoint()
      rounds += block
      val nextSum = labelSum(next)
      labels = next
      if (nextSum.compareTo(prevSum) == 0) return (labels, rounds)
      prevSum = nextSum
    }
    // one more step would still change labels → the budget was too small
    val left = unconverged(edges, labels).collect()(0).getLong(0)
    if (left > 0)
      throw new IllegalStateException(
        s"closeAdaptive: $left labels still unconverged after $maxIters rounds")
    (labels, rounds)
  }

  /** 1-row frame counting labels that would still change in ONE more
    * round — 0 iff [[close]]'s budget reached the fixpoint. Composable
    * as an in-plan invariant column. */
  def unconverged(edges: DataFrame, labels: DataFrame): DataFrame = {
    val next = step(closedSym(edges), labels)
    labels.select(col("id"), col("comp").as("c0"))
      .join(next.select(col("id"), col("comp").as("c1")), "id")
      // coalesce: an empty graph is trivially converged (0), not null
      .agg(coalesce(sum(when(col("c0") =!= col("c1"), 1L).otherwise(0L)),
        lit(0L)).as("n_unconverged"))
  }
}
