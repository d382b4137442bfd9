package graft.operators

import graft.{Session, Tables}
import graft.functions.FreqItems
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Misra–Gries frequent-items summary: the published guarantee —
  * est(x) ∈ [n(x) − n/(K+1), n(x)], every item above the bar present —
  * must hold under ANY partitioning (mergeability), and the l52 DQ's
  * invariant columns must read it as zeros. */
class FreqItemsSpec extends AnyFunSuite {

  private lazy val spark = Session.get()
  private val sf = "/root/testdata/sf0.001"

  test("the MG guarantee holds on a skewed stream under every partitioning") {
    import spark.implicits._
    // skew: 'alpha' ×300, 'beta' ×120, 40 distinct singles ×5 = n 620
    val items = Seq.fill(300)("alpha") ++ Seq.fill(120)("beta") ++
      (1 to 40).flatMap(i => Seq.fill(5)(s"tail$i"))
    val exact = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n = items.size.toLong
    val k = 8
    val bound = n / (k + 1)
    for (parts <- Seq(1, 3, 7, 32)) {
      val est = items.toDF("tok").repartition(parts)
        .agg(FreqItems.summaryK(k)(col("tok")).as("mg"))
        .collect().head.getMap[String, Long](0)
      exact.foreach { case (item, cnt) =>
        if (cnt > bound)
          assert(est.contains(item), s"heavy '$item' ($cnt > $bound) missing @$parts")
      }
      est.foreach { case (item, e) =>
        val c = exact(item)
        assert(e <= c, s"'$item' overcounted @$parts: $e > $c")
        assert(e >= c - bound, s"'$item' undercut @$parts: $e < $c - $bound")
      }
    }
  }

  test("single-partition MG matches the textbook hand-trace at K=2") {
    import spark.implicits._
    // stream a a b a c: K=2 trace -> {a:2} ∪ ... final {a:2, c:1}? —
    // a:1, a:2, b:1 (room), a:3, c arrives with table full: decrement
    // all -> {a:2}, c NOT inserted (the classic MG step drops it)
    val est = Seq("a", "a", "b", "a", "c").toDF("tok").coalesce(1)
      .agg(FreqItems.summaryK(2)(col("tok")).as("mg"))
      .collect().head.getMap[String, Long](0)
    assert(est.toMap === Map("a" -> 2L))
  }

  test("l52 heavy-hitter DQ: the guarantee columns are exact zeros and " +
      "the candidate set is bounded by K") {
    val row = LlmQueries.l52.fn(spark, sf).collect().head
    assert(row.getAs[Long]("n_tokens") > 0L)
    assert(row.getAs[Long]("n_heavy_missed") === 0L,
      "an item above n/(K+1) can never be evicted")
    assert(row.getAs[Long]("n_bound_violations") === 0L,
      "estimates must stay in [exact - bound, exact]")
    assert(row.getAs[Long]("n_candidates") <= FreqItems.K.toLong)
    // the corpus genuinely has heavy tokens (stopwords planted by the
    // generator), so the invariant is not vacuous
    assert(row.getAs[Long]("n_heavy") > 0L,
      "the corpus must have at least one heavy token for the pin to bite")
  }

  test("the summary aggregates with a map-side partial (tokens never " +
      "shuffle; only ≤K-entry buffers cross the wire)") {
    val toks = Tables.documents(spark, sf).filter(col("text").isNotNull)
      .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
    val df = toks.agg(FreqItems.summary(col("tok")).as("mg"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"typed aggregator should hash-aggregate:\n$plan")
    assert(plan.toLowerCase.contains("partial"),
      s"map-side combine expected:\n$plan")
  }
}
