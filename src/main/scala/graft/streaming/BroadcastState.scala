package graft.streaming

import java.util.concurrent.atomic.AtomicReference
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Broadcast state pattern — the reference's
  * `DataStream.broadcast(MapStateDescriptor)` +
  * `KeyedBroadcastProcessFunction`
  * (flink-streaming-java/.../api/datastream/DataStream.java:434,
  * BroadcastConnectedStream.process): a low-volume CONTROL stream
  * maintains a small rules map replicated to every task, and a DATA
  * stream is processed against the rules currently in force.
  *
  * Spark shape (SURVEY §2.10's mapping): the control stream folds into
  * a driver-held snapshot per micro-batch (`processBroadcastElement`);
  * each DATA micro-batch re-ships the snapshot with its plan —
  * a `foreachBatch` transform closing over the immutable current map,
  * which Spark serializes to every task exactly like a broadcast
  * join's build side. Visibility matches the reference: a control
  * element is seen by data elements processed after it, with no
  * cross-stream ordering guarantee beyond trigger boundaries.
  *
  * Scale: the rules map is control-stream-sized (rule tables, feature
  * flags, dynamic thresholds — metadata scale), never data scale; the
  * data stream stays fully parallel with zero added shuffles.
  */
class BroadcastRules[K, V] {

  private val ref = new AtomicReference[Map[K, V]](Map.empty)

  /** Rules currently in force (immutable snapshot). */
  def current: Map[K, V] = ref.get()

  /** Start the control-side query: each micro-batch's rows fold into
    * the rules map in arrival order. `toEntry` returns
    * `(key, Some(value))` to put and `(key, None)` to remove — the two
    * mutations Flink's broadcast map state supports.
    */
  def controlSink(control: DataFrame, toEntry: Row => (K, Option[V]),
                  queryName: String = "graft_broadcast_control"): StreamingQuery =
    control.writeStream
      .queryName(queryName)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // collect is control-scale by contract (rule updates per trigger)
        val updates = batch.collect().map(toEntry)
        ref.updateAndGet { m0 =>
          updates.foldLeft(m0) {
            case (m, (k, Some(v))) => m.updated(k, v)
            case (m, (k, None)) => m - k
          }
        }
        ()
      }
      .start()

  /** Start the data-side query: per micro-batch, `process` receives
    * the batch and the rules snapshot in force at the trigger
    * (`processElement`'s read-only view), and its result goes to
    * `sink`. The snapshot is a plain immutable map captured in the
    * batch's closures — tasks receive it with the serialized plan.
    */
  def dataSink(data: DataFrame, process: (DataFrame, Map[K, V]) => DataFrame,
               sink: DataFrame => Unit,
               trigger: Trigger = Trigger.ProcessingTime(0L),
               queryName: String = "graft_broadcast_data"): StreamingQuery =
    data.writeStream
      .queryName(queryName)
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(process(batch, ref.get()))
      }
      .start()
}

object BroadcastRules {
  def apply[K, V](): BroadcastRules[K, V] = new BroadcastRules[K, V]
}
