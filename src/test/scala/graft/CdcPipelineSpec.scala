package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}
import graft.streaming.Changelog

case class Chg(row_kind: String, k: String, price: Double)

/** The reference's canonical streaming CDC consumption path
  * (DebeziumJsonDeserializationSchema → StreamExecChangelogNormalize →
  * GroupAggFunction), end-to-end over MemoryStream triggers — the
  * streaming form of the oracle-gated q84. Spark disallows chaining a
  * second flatMapGroupsWithState behind the first in one query, so the
  * normalize and aggregate stages run as two queries with the
  * changelog handed across — semantically the reference's exchange
  * between the two operators.
  */
class CdcPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rowS = StructType(Seq(
    StructField("k", StringType), StructField("price", DoubleType)))

  private def env(op: String, k: String, before: Option[Double],
                  after: Option[Double]): String = {
    def row(v: Option[Double]) =
      v.map(p => s"""{"k":"$k","price":$p}""").getOrElse("null")
    s"""{"before":${row(before)},"after":${row(after)},"op":"$op"}"""
  }

  test("debezium → changelogNormalize → retract agg, out-of-order -U/+U") {
    implicit val sc = spark.sqlContext
    // ---- stage 1: decode + normalize across three triggers ----------
    val in = MemoryStream[String]
    val decoded = graft.sources.CdcFormats
      .fromDebeziumJson(in.toDF(), col("value"), rowS)
    // CDC feed consumed as an upsert source (the reference inserts
    // ChangelogNormalize for exactly this shape): strip the envelopes'
    // own -U rows; normalize reconstructs -U/+U pairs in ARRIVAL order
    // from its keyed state, which is what makes out-of-order updates
    // safe downstream.
    val upserts = Changelog.dropUpdateBefore(decoded)
    val normalized = Changelog.changelogNormalize(upserts, Seq("k"))
    val q1 = normalized.writeStream.format("memory").queryName("cdc_norm")
      .outputMode(OutputMode.Append).start()
    val perTrigger = scala.collection.mutable.ArrayBuffer.empty[Seq[Chg]]
    def step(envs: String*): Unit = {
      val before = spark.sql("SELECT * FROM cdc_norm").count()
      in.addData(envs: _*)
      q1.processAllAvailable()
      perTrigger += spark.sql("SELECT row_kind, k, price FROM cdc_norm")
        .collect().drop(before.toInt)
        .map(r => Chg(r.getString(0), r.getString(1), r.getDouble(2))).toSeq
    }
    try {
      // trigger 1: two inserts
      step(env("c", "k1", None, Some(10.0)), env("c", "k2", None, Some(7.0)))
      // trigger 2: k1 updated twice, arriving OUT OF ORDER — the later
      // lifecycle version (11→12) lands before the earlier one (10→11)
      step(env("u", "k1", Some(11.0), Some(12.0)),
        env("u", "k1", Some(10.0), Some(11.0)))
      // trigger 3: delete k1
      step(env("d", "k1", Some(11.0), None))
    } finally q1.stop()

    assert(perTrigger(0).toSet == Set(Chg("+I", "k1", 10.0), Chg("+I", "k2", 7.0)))
    // normalize emits -U/+U pairs in arrival order: state 10 → 12 → 11;
    // the envelopes' claimed `before` values are ignored in favor of
    // the keyed state (StreamExecChangelogNormalize semantics)
    assert(perTrigger(1) == Seq(
      Chg("-U", "k1", 10.0), Chg("+U", "k1", 12.0),
      Chg("-U", "k1", 12.0), Chg("+U", "k1", 11.0)))
    // delete emits the last VISIBLE content (11, not the claimed 11
    // coincidence — state), leaving k2 untouched
    assert(perTrigger(2) == Seq(Chg("-D", "k1", 11.0)))

    // ---- stage 2: retract-aware group agg over that changelog -------
    val in2 = MemoryStream[Chg]
    val agg = Changelog.retractGroupAgg(in2.toDF(), Seq("k"), "price")
    val q2 = agg.writeStream.format("memory").queryName("cdc_agg")
      .outputMode(OutputMode.Update).start()
    def latest(): Map[String, (Long, Double)] =
      spark.sql("SELECT k, cnt, sum_val FROM cdc_agg").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
        .toMap // later rows overwrite: Map keeps the LAST occurrence
    try {
      in2.addData(perTrigger(0): _*)
      q2.processAllAvailable()
      assert(latest() == Map("k1" -> ((1L, 10.0)), "k2" -> ((1L, 7.0))))
      in2.addData(perTrigger(1): _*)
      q2.processAllAvailable()
      // the -U/+U churn nets out to the last visible value
      assert(latest()("k1") == ((1L, 11.0)))
      in2.addData(perTrigger(2): _*)
      q2.processAllAvailable()
      // fully-retracted key: count 0, exact-zero sum, state dropped
      assert(latest()("k1") == ((0L, 0.0)))
      assert(latest()("k2") == ((1L, 7.0)))
    } finally q2.stop()
  }

  test("retractGroupAgg handles a retract arriving before its accumulate") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Chg]
    val agg = Changelog.retractGroupAgg(in.toDF(), Seq("k"), "price")
    val q = agg.writeStream.format("memory").queryName("cdc_agg_ooo")
      .outputMode(OutputMode.Update).start()
    try {
      // -U before its +U within one trigger: iterator order still nets
      // to the correct accumulator (GroupAggFunction is order-stable
      // within a changelog that nets consistently)
      in.addData(Chg("+I", "a", 5.0), Chg("-U", "a", 5.0), Chg("+U", "a", 6.0))
      q.processAllAvailable()
      val r = spark.sql("SELECT cnt, sum_val FROM cdc_agg_ooo").collect().last
      assert((r.getLong(0), r.getDouble(1)) == ((1L, 6.0)))
    } finally q.stop()
  }

  test("retractGroupAgg ignores excess retractions instead of emitting cnt = -1 (r19 review)") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Chg]
    val agg = Changelog.retractGroupAgg(in.toDF(), Seq("k"), "price")
    val q = agg.writeStream.format("memory").queryName("cdc_agg_neg")
      .outputMode(OutputMode.Update).start()
    try {
      // a -D for a key with NO accumulator (replayed retraction / TTL-
      // purged state): GroupAggFunction ignores it — no state, no row
      in.addData(Chg("-D", "ghost", 5.0))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM cdc_agg_neg WHERE k = 'ghost'").collect().isEmpty,
        "an ignored retraction must not emit")
      // the key still accumulates normally afterwards, from zero
      in.addData(Chg("+I", "ghost", 7.0))
      q.processAllAvailable()
      val r = spark.sql("SELECT cnt, sum_val FROM cdc_agg_neg WHERE k = 'ghost'")
        .collect().last
      assert((r.getLong(0), r.getDouble(1)) == ((1L, 7.0)))
      // a batch netting NEGATIVE on a live key clamps at the full
      // retraction (exact zero), never below
      in.addData(Chg("-D", "ghost", 7.0), Chg("-D", "ghost", 7.0))
      q.processAllAvailable()
      val last = spark.sql("SELECT cnt, sum_val FROM cdc_agg_neg WHERE k = 'ghost'")
        .collect().last
      assert((last.getLong(0), last.getDouble(1)) == ((0L, 0.0)))
    } finally q.stop()
  }
}
