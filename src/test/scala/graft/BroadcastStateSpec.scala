package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.BroadcastRules

/** Broadcast state pattern (KeyedBroadcastProcessFunction analog):
  * control-stream rule updates visible to subsequent data batches.
  */
class BroadcastStateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("data batches see the rules in force at their trigger; removals apply") {
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val rules = BroadcastRules[String, Double]()
    // control rows: (category, multiplier, remove?)
    val control = MemoryStream[(String, Double, Boolean)]
    val data = MemoryStream[(String, Double)]

    val out = new java.util.concurrent.ConcurrentLinkedQueue[(String, Double)]()
    val cq = rules.controlSink(control.toDF(),
      r => (r.getString(0), if (r.getBoolean(2)) None else Some(r.getDouble(1))))
    val dq = rules.dataSink(
      data.toDF(),
      (batch, snap) => {
        val bc = snap // immutable snapshot captured per batch
        batch.as[(String, Double)]
          .map(t => (t._1, t._2 * bc.getOrElse(t._1, 1.0))).toDF()
      },
      sink = df => df.as[(String, Double)].collect().foreach(out.add))

    try {
      // rule arrives, then data: multiplier applies; unknown key = identity
      control.addData(("a", 2.0, false))
      cq.processAllAvailable()
      assert(rules.current == Map("a" -> 2.0))
      data.addData(("a", 10.0), ("b", 5.0))
      dq.processAllAvailable()
      assert(out.toArray.toSet == Set(("a", 20.0), ("b", 5.0)))

      // rules change between triggers: update b, remove a
      out.clear()
      control.addData(("b", 3.0, false), ("a", 0.0, true))
      cq.processAllAvailable()
      assert(rules.current == Map("b" -> 3.0))
      data.addData(("a", 10.0), ("b", 5.0))
      dq.processAllAvailable()
      assert(out.toArray.toSet == Set(("a", 10.0), ("b", 15.0)))
    } finally { cq.stop(); dq.stop() }
  }

  test("same-batch control updates fold in arrival order (last write wins)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val rules = BroadcastRules[String, Double]()
    val control = MemoryStream[(String, Double, Boolean)]
    val cq = rules.controlSink(control.toDF(),
      r => (r.getString(0), if (r.getBoolean(2)) None else Some(r.getDouble(1))))
    try {
      control.addData(("x", 1.0, false), ("x", 2.0, false), ("y", 9.0, false),
        ("y", 0.0, true))
      cq.processAllAvailable()
      assert(rules.current == Map("x" -> 2.0))
    } finally cq.stop()
  }
}
