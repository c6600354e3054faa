package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query runs end-to-end on sf0.001 and has an oracle
  * entry (or is explicitly rows-only). Value-level correctness is the
  * driver's DuckDB gate (scripts/check.py locally); this suite catches
  * broken plans early and pins a few known row counts.
  */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.sfDir

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val df = fn(spark, dir)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("no silent battery shrink: query count can only grow") {
    // Round-7 lesson: a ParseException made q85 VANISH from the
    // driver's correctness battery instead of going red (155 → 154
    // with zero err rows). This floor is the pre-commit gate — bump it
    // whenever queries are added, never down.
    assert(SparkEntry.queries.size >= 180,
      s"battery shrank: ${SparkEntry.queries.size} < 180 declared queries")
  }

  test("oracle coverage: EVERY query has oracle SQL (zero rows-only since round 6)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without query: $orphans")
  }

  test("known row counts on sf0.001") {
    def n(q: String) = SparkEntry.queries(q)(spark, dir).count()
    assert(n("q1_pricing_summary") == 6)   // 3 returnflags × 2 linestatus
    assert(n("q2_local_revenue") == 10)    // 10 suppliers at sf0.001 cap the nation set
    assert(n("q12_sort_limit") == 10)
    assert(n("v42_ann_topk") == 30)        // 10 query vecs × top-3
  }
}
