package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{Encoders, Row}
import java.sql.Timestamp

case class LEv(k: String, ts: Timestamp, v: Double)

/** Empirical pin of WHICH GroupStateTimeout modes let late rows (behind
  * the established watermark) reach the user function. r6 verified that
  * EventTimeTimeout filters them (making allowedLateness corrections
  * impossible in that mode); this probe documents that NoTimeout and
  * ProcessingTimeTimeout do NOT filter — the structural opening the
  * late-fire operator builds on.
  */
class LateFilterProbeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def seenUnder(name: String, timeout: GroupStateTimeout): Set[Long] = {
    implicit val sc = spark.sqlContext
    implicit val enc = Encoders.product[LEv]
    val in = MemoryStream[LEv]
    val farFuture = Timestamp.valueOf("2030-01-01 00:00:00").getTime
    val out = in.toDF().withWatermark("ts", "0 seconds")
      .groupByKey(_.getString(0))(Encoders.STRING)
      .flatMapGroupsWithState[Long, Row](OutputMode.Append, timeout) {
        (_: String, rows: Iterator[Row], st: GroupState[Long]) =>
          if (st.hasTimedOut) Iterator.empty
          else {
            val out = rows.map(r => Row(r.getTimestamp(1).getTime)).toVector
            // arm a far-future timer where the mode requires one
            if (timeout == GroupStateTimeout.EventTimeTimeout)
              st.setTimeoutTimestamp(farFuture)
            else if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
              st.setTimeoutDuration(3600 * 1000L)
            out.iterator
          }
      }(Encoders.scalaLong, StatefulOpsTestAccess.rowEnc)
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("late_probe").toString)
      .start()
    try {
      in.addData(LEv("a", Timestamp.valueOf("2024-01-01 10:00:00"), 1.0))
      q.processAllAvailable() // watermark now 10:00:00
      in.addData(LEv("a", Timestamp.valueOf("2024-01-01 09:00:00"), 2.0)) // 1h late
      q.processAllAvailable()
      spark.sql(s"SELECT x FROM $name").collect().map(_.getLong(0)).toSet
    } finally q.stop()
  }

  test("EventTimeTimeout filters late input; NoTimeout delivers it") {
    val late = Timestamp.valueOf("2024-01-01 09:00:00").getTime
    assert(!seenUnder("probe_ett", GroupStateTimeout.EventTimeTimeout).contains(late),
      "EventTimeTimeout must drop late rows (the r6 structural finding)")
    assert(seenUnder("probe_nt", GroupStateTimeout.NoTimeout).contains(late),
      "NoTimeout must deliver late rows to the function")
    // ProcessingTimeTimeout also delivers late rows, but is NOT probed
    // here: an armed processing-time timer makes the micro-batch engine
    // spin no-data batches back-to-back under the default trigger
    // (observed: thousands of stages and a processAllAvailable that
    // never settles) — the operational reason lateFireWindowAgg uses
    // NoTimeout and earlyFireWindowAgg uses EventTimeTimeout.
  }
}

/** Minimal Row encoder access for the probe. */
object StatefulOpsTestAccess {
  import org.apache.spark.sql.types._
  import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
  val rowEnc: ExpressionEncoder[Row] = ExpressionEncoder(
    RowEncoder.encoderFor(StructType(Seq(StructField("x", LongType)))))
}
