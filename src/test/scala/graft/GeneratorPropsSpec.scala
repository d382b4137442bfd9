package graft

import graft.operators.Validation
import graft.sources.{Corruptions, Generator}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck round-trip properties over arbitrary seeds (SURVEY.md §5
  * strategy item 1): generate → corrupt(p) → validate must behave
  * identically for every seed, not just the fixtures in GeneratorSpec. */
class GeneratorPropsSpec extends AnyFunSuite {

  private lazy val spark = Session.get()

  private val seeds: Gen[Long] = Gen.choose(0L, 1000000L)

  // Spark jobs per case are expensive — a handful of seeds is plenty to
  // catch seed-dependent logic; per-seed determinism is covered too.
  private def check(name: String)(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(5).withWorkers(1), p)
    assert(res.passed, s"$name: $res")
  }

  test("property: corrupt(p=1) rejects every product for any seed pair") {
    check("reject-all") {
      Prop.forAll(seeds, seeds) { (gSeed: Long, cSeed: Long) =>
        val corrupted =
          Corruptions.products(Generator.products(spark, 50, gSeed), 1.0, cSeed)
        val s = Validation.validateProducts(corrupted)
        s.valid.count() == 0 && s.rejects.count() == 50
      }
    }
  }

  test("property: corrupt(p=0) accepts every order for any seed") {
    check("accept-all") {
      Prop.forAll(seeds) { (gSeed: Long) =>
        val orders = Generator.orders(spark, 50, 20, 20, gSeed)
        val s = Validation.validateOrders(Corruptions.orders(orders, 0.0, gSeed + 1))
        s.rejects.count() == 0 && s.valid.count() == 50
      }
    }
  }

  test("property: generation is reproducible for any seed") {
    check("reproducible") {
      Prop.forAll(seeds) { (seed: Long) =>
        val a = Generator.events(spark, 40, 10, seed).orderBy("event_id").collect()
        val b = Generator.events(spark, 40, 10, seed).orderBy("event_id").collect()
        a.toSeq == b.toSeq
      }
    }
  }

  test("property: order totals stay consistent with items for any seed") {
    check("total-consistent") {
      Prop.forAll(seeds) { (seed: Long) =>
        Generator.orders(spark, 50, 20, 20, seed)
          .filter(!Validation.totalConsistent).count() == 0
      }
    }
  }
}
