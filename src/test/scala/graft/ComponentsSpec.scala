package graft

import graft.functions.Components
import org.scalatest.funsuite.AnyFunSuite

/** Generic guarantees for the min-label-propagation closure, beyond the
  * l28 instantiation: property-tested against union-find on random
  * graphs, plus the budget/fixpoint contract. */
class ComponentsSpec extends AnyFunSuite {

  private lazy val spark = Session.get()

  private def closed(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    import spark.implicits._
    Components.close(edges.toDF("ida", "idb"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("property: closure equals union-find on random graphs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // sparse random graphs over a small id space force multi-hop chains
    val edgeGen = Gen.chooseNum(1, 18).flatMap { n =>
      Gen.listOfN(n, Gen.zip(Gen.chooseNum(0L, 23L), Gen.chooseNum(0L, 23L)))
    }
    val p = Prop.forAll(edgeGen) { es =>
      val edges = es.filter(e => e._1 != e._2)
      edges.isEmpty || closed(edges, iters = 24) == TestGraphs.unionFindLabels(edges)
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(12).withWorkers(1), p)
    assert(res.passed, res.toString)
  }

  test("a chain deeper than the round budget reports unconverged > 0, " +
      "never a silently wrong merge") {
    import spark.implicits._
    // path 0-1-2-...-9: label 0 travels one hop per round
    val chain = (0L until 9L).map(i => (i, i + 1))
    val few = Components.close(chain.toDF("ida", "idb"), iters = 3)
    val unconv = Components.unconverged(chain.toDF("ida", "idb"), few)
      .collect()(0).getLong(0)
    assert(unconv > 0, "a 9-hop chain cannot close in 3 rounds")
    val enough = Components.close(chain.toDF("ida", "idb"), iters = 9)
    val labels = enough.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.values.toSet === Set(0L), s"chain must collapse to 0: $labels")
    assert(Components.unconverged(chain.toDF("ida", "idb"), enough)
      .collect()(0).getLong(0) === 0L)
    intercept[IllegalArgumentException](
      Components.close(chain.toDF("ida", "idb"), iters = 0))
  }

  test("closeAdaptive: a 40-hop chain converges without a hand-set budget, " +
      "easy graphs stop early, and an impossible budget throws") {
    import spark.implicits._
    // path 0-1-...-40: diameter 40, far past close()'s usual budget
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("ida", "idb")
    val (labels, rounds) = Components.closeAdaptiveMeasured(
      chain, maxIters = 64, checkpointEvery = 4)
    val m = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m.size === 41 && m.values.toSet === Set(0L),
      s"chain must collapse to component 0: $m")
    // 40 hops need >= 40 rounds; block granularity rounds up to 44
    assert(rounds >= 40 && rounds <= 48, s"rounds $rounds")
    // a diameter-2 star stops after the first no-change block, not 64
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("ida", "idb")
    val (sl, sr) = Components.closeAdaptiveMeasured(star, 64, 4)
    assert(sl.collect().map(_.getLong(1)).toSet === Set(0L))
    assert(sr <= 8, s"star graph must converge in ~2 blocks, ran $sr rounds")
    // equivalence with the fixed-budget closure on a multi-cluster graph
    val g = Seq((1L, 2L), (2L, 3L), (7L, 8L), (10L, 11L), (11L, 12L), (12L, 13L))
      .toDF("ida", "idb")
    val adaptive = Components.closeAdaptive(g)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fixed = Components.close(g, iters = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(adaptive === fixed)
    // a budget too small for the diameter must THROW, never under-merge
    intercept[IllegalStateException](
      Components.closeAdaptiveMeasured(chain, maxIters = 3, checkpointEvery = 4))
    intercept[IllegalArgumentException](
      Components.closeAdaptiveMeasured(chain, maxIters = 0, checkpointEvery = 4))
    intercept[IllegalArgumentException](
      Components.closeAdaptiveMeasured(chain, maxIters = 8, checkpointEvery = 0))
  }

  test("an empty edge set closes to an empty label frame and reports CONVERGED (0, not null)") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("ida", "idb")
    val labels = Components.close(empty, iters = 2)
    assert(labels.collect().isEmpty)
    val row = Components.unconverged(empty, labels).collect()(0)
    assert(!row.isNullAt(0) && row.getLong(0) === 0L,
      "empty graph must report converged as a real 0")
  }

  test("self-loops and duplicate edges are harmless") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 2L), (4L, 5L), (4L, 5L))
    val labels = closed(edges, iters = 4)
    assert(labels === Map(1L -> 1L, 2L -> 1L, 4L -> 4L, 5L -> 4L))
  }
}
