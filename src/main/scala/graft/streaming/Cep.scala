package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequence-pattern matching — the workhorse subset of the reference's
  * MATCH_RECOGNIZE / CEP library (SURVEY.md §2.9;
  * flink-libraries/flink-cep/.../pattern/Pattern.java, NFA in
  * flink-libraries/flink-cep/src/main/java/org/apache/flink/cep/nfa/).
  *
  * `matchSequence` detects, per key, an ordered chain of predicate
  * steps within a time budget, with AFTER MATCH SKIP TO NEXT ROW /
  * skip-till-next-match semantics: for every row matching step 1, the
  * chain greedily takes the FIRST later row matching each subsequent
  * step inside the window.
  *
  * Execution shape: one shuffle on the key, per-key time-sorted scan
  * (the same per-key ordering Flink's NFA sees after keyBy +
  * watermark). Per-key data is streamed through a sorted iterator —
  * memory is O(events per key), the same bound Flink CEP has for its
  * per-key buffer.
  */
object Cep {

  /** @param steps (name, predicate-on-Row) — step 1 anchors the match
    * @param withinSec whole chain must fit in [t1, t1 + withinSec]
    * @return one row per complete match:
    *         key, <name>_id and <name>_ts per step (ids from `idCol`)
    */
  def matchSequence(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
                    steps: Seq[(String, Row => Boolean)],
                    withinSec: Long): DataFrame = {
    require(steps.nonEmpty)
    val spark = df.sparkSession
    val schema = df.schema
    val keyIdx = schema.fieldIndex(keyCol)
    val tsIdx = schema.fieldIndex(tsCol)
    val idIdx = schema.fieldIndex(idCol)
    val keyType = schema(keyIdx).dataType
    val idType = schema(idIdx).dataType

    val outSchema = StructType(
      StructField(keyCol, keyType) +:
      steps.flatMap { case (name, _) => Seq(
        StructField(s"${name}_id", idType),
        StructField(s"${name}_ts", TimestampType))
      })
    implicit val outEnc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    implicit val inEnc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(schema))
    implicit val keyEnc = org.apache.spark.sql.Encoders.STRING

    def tsMicros(r: Row): Long = r.get(tsIdx) match {
      case t: java.sql.Timestamp => t.getTime * 1000 + (t.getNanos / 1000) % 1000
      case t: java.time.Instant => t.getEpochSecond * 1000000L + t.getNano / 1000
      case l: Long => l
    }

    df.groupByKey(r => String.valueOf(r.get(keyIdx)))
      .flatMapGroups { (_: String, it: Iterator[Row]) =>
        val events = it.toArray.sortBy(tsMicros)
        val n = events.length
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        var i = 0
        while (i < n) {
          if (steps.head._2(events(i))) {
            val deadline = tsMicros(events(i)) + withinSec * 1000000L
            val matched = scala.collection.mutable.ArrayBuffer(events(i))
            var j = i + 1
            var step = 1
            while (step < steps.length && j < n && tsMicros(events(j)) <= deadline) {
              if (steps(step)._2(events(j))) { matched += events(j); step += 1 }
              j += 1
            }
            if (step == steps.length) {
              val vals = events(i).get(keyIdx) +: matched.toSeq.flatMap { r =>
                Seq(r.get(idIdx), r.get(tsIdx))
              }
              out += Row.fromSeq(vals)
            }
          }
          i += 1
        }
        out.iterator
      }(outEnc)
  }
}
