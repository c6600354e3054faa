package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Structural regression net over every declared query's physical plan
  * (sf0.001, pre-AQE): an accidental cartesian or nested-loop join is
  * the classic 100 TB scale-killer that still "passes" at test SF —
  * this suite makes one a named test failure instead. Queries whose
  * SEMANTICS are a theta/cross join are whitelisted explicitly, with
  * the reason, so any new offender must either be fixed or argued into
  * the list in review.
  */
class PlanInvariantsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.sfDir

  /** Queries allowed to contain cartesian / broadcast-nested-loop
    * joins: either the operator under test IS a theta join, or every
    * NL input is a bounded (≤ few rows) aggregate/dim frame.
    *
    * Each entry pins the MAXIMUM allowed offender count (r10 advice: a
    * blanket `succeed` let a whitelisted query regress to an additional
    * unbounded cartesian invisibly). A re-plan that legitimately changes
    * the count must update the bound here, in review, with the reason. */
  val thetaWhitelist: Map[String, (Int, String)] = Map(
    "h17_small_quantity" -> (1, "TPC-H q17 correlated avg: per-part threshold, non-equi compare"),
    "h19_discounted_revenue" -> (1, "TPC-H q19 OR-of-AND bundles over non-equi ranges"),
    "h22_sales_opportunity" -> (1, "1-row global avg_bal crossJoin (bounded build side)"),
    "h11_important_stock" -> (1, "1-row threshold subquery crossJoin (bounded build side)"),
    "h14_promo_effect" -> (1, "1-row denominator crossJoin (bounded build side)"),
    "h08_market_share" -> (1, "1-row year-total frames joined non-equi"),
    "d04_bucket_counts" -> (7, "eight 1-row bucket aggregates crossJoined into one wide row"),
    "d11_frequent_best" -> (2, "1-row frames: best-of crossJoin (bounded)"),
    "d15_or_bundle_agg" -> (1, "OR-of-AND predicate bundles (non-equi by design)"),
    "q24_interval_join" -> (1, "interval join: time-range predicate is the operator"),
    "q51_sql_subqueries" -> (2, "scalar subqueries = 1-row crossJoins (bounded)"),
    "q65_values" -> (1, "VALUES inline relation, driver-side rows"),
    "v41_cosine_pairs" -> (1, "documented blocked all-pairs exact baseline (scale path: v44)"),
    "v42_ann_topk" -> (1, "documented brute-force ANN baseline (scale path: v43/v46)"),
    "v45_pq_ann" -> (2, "documented flat-PQ scan-all baseline (scale path: v46 IVF-PQ)"),
    "v50_pq_refine" -> (1, "flat-PQ ADC shortlist is the documented scan-all baseline (scale path: v51 IVF-PQ refined, whose probe+rerank joins are all equi)"),
    "v53_sq_ann" -> (1, "flat scalar-quantizer asymmetric scan is the documented scan-all baseline of the SQ family (4x-compressed codes; at scale one composes SQ codes under an IVF probe exactly like v51)"),
    "t36_jaccard_pairs" -> (1, "documented exact-Jaccard quadratic baseline (scale path: n53)"),
    "t51_bm25" -> (1, "1-row corpus stats (N, avgdl) broadcast crossJoin (bounded)"),
    "t52_dsir_weights" -> (1, "1-row weight-normalizer broadcast crossJoin (bounded)"),
    "t56_lm_perplexity" -> (1, "1-row vocab-size broadcast crossJoin (bounded)")
  )

  private def offenders(p: SparkPlan): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    p.foreach {
      case _: CartesianProductExec => out += "CartesianProduct"
      case j: BroadcastNestedLoopJoinExec => out += s"BroadcastNestedLoopJoin(${j.joinType})"
      case _ =>
    }
    out.toSeq
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name: no accidental cartesian / nested-loop join") {
      val found = offenders(fn(spark, dir).queryExecution.sparkPlan)
      thetaWhitelist.get(name) match {
        case Some((maxAllowed, reason)) =>
          assert(found.size <= maxAllowed,
            s"$name is whitelisted for <= $maxAllowed non-equi join(s) ($reason) " +
              s"but its plan now contains ${found.size}: ${found.mkString(", ")} — " +
              "a regression past the adjudicated shape")
        case None =>
          assert(found.isEmpty,
            s"$name plan contains ${found.mkString(", ")} — a 100 TB scale-killer; " +
              "fix the join or whitelist with a reason")
      }
    }
  }

  test("whitelist has no stale entries") {
    val stale = thetaWhitelist.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"whitelisted queries no longer declared: $stale")
  }

  test("TIME format roundtrips stay exchange-free map-side shapes (q92-q94)") {
    // The TimeFormats/Avro encode+decode is per-row cast work on both
    // sides of the format; an Exchange appearing here would mean the
    // shim started shuffling a scan-shaped pipeline (PLANS.md r16).
    for (n <- Seq("q92_csv_time_roundtrip", "q93_json_time_roundtrip",
      "q94_avro_time_roundtrip")) {
      val plan = SparkEntry.queries(n)(spark, dir).queryExecution.sparkPlan
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.Exchange => e
      }
      assert(exchanges.isEmpty,
        s"$n read side gained ${exchanges.size} exchange(s):\n$plan")
    }
  }

  test("flagship scans prune columns: q1 lineitem reads <= 8 of 11 columns") {
    val plan = SparkEntry.queries("q1_pricing_summary")(spark, dir)
      .queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val readSchema = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(plan).map(_.group(1)).getOrElse(fail("no ReadSchema in plan"))
    val nCols = readSchema.split(",").length
    assert(nCols <= 8, s"q1 lineitem scan reads $nCols columns: $readSchema")
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      "q1 shipdate filter not pushed to the parquet scan")
  }
}
