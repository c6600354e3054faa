package graft.streaming

import org.apache.spark.sql.Dataset
import scala.concurrent.{Await, ExecutionContext, Future, TimeoutException}
import scala.concurrent.duration.{Duration, DurationLong}

/** Async I/O analog — the reference's AsyncWaitOperator
  * (flink-streaming-java/.../operators/async/AsyncWaitOperator.java:91)
  * overlaps up to `capacity` in-flight external calls per task while
  * preserving input order (Flink's ORDERED mode).
  *
  * Spark shape: `mapPartitions` with a sliding window of Futures — the
  * partition iterator stays lazy, so at most `capacity` calls are
  * buffered per partition regardless of partition size, and the
  * executor thread blocks only when the window is full (backpressure).
  */
object AsyncOps {

  /** @param timeoutMs per-element timeout, like AsyncWaitOperator's
    *   `timeout` — a hung external call fails the task (Flink's default
    *   behavior) instead of wedging the executor forever.
    */
  def mapAsyncOrdered[I, O: org.apache.spark.sql.Encoder](
      ds: Dataset[I], capacity: Int, timeoutMs: Long = 60000L)(fn: I => O): Dataset[O] = {
    require(capacity > 0)
    require(timeoutMs > 0)
    ds.mapPartitions { it =>
      // bounded thread pool per partition ≈ Flink's per-subtask capacity
      val pool = java.util.concurrent.Executors.newFixedThreadPool(capacity)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
      val inflight = scala.collection.mutable.Queue.empty[Future[O]]
      new Iterator[O] {
        private def fill(): Unit =
          while (inflight.size < capacity && it.hasNext) {
            val elem = it.next() // pull on the caller thread, not in the Future
            inflight.enqueue(Future(fn(elem)))
          }
        override def hasNext: Boolean = {
          fill()
          if (inflight.isEmpty) { pool.shutdown(); false } else true
        }
        override def next(): O = {
          fill()
          try Await.result(inflight.dequeue(), timeoutMs.millis)
          catch {
            case e: TimeoutException =>
              pool.shutdownNow()
              throw new TimeoutException(
                s"async call exceeded ${timeoutMs}ms (AsyncWaitOperator timeout analog)")
          }
        }
      }
    }
  }

  /** UNORDERED mode (Flink's AsyncDataStream.unorderedWait): results
    * emit in COMPLETION order — lower latency than ordered when call
    * durations vary, at the cost of losing input order. Same bounded
    * in-flight window and per-element timeout.
    */
  def mapAsyncUnordered[I, O: org.apache.spark.sql.Encoder](
      ds: Dataset[I], capacity: Int, timeoutMs: Long = 60000L)(fn: I => O): Dataset[O] = {
    require(capacity > 0)
    require(timeoutMs > 0)
    ds.mapPartitions { it =>
      val pool = java.util.concurrent.Executors.newFixedThreadPool(capacity)
      val ecs = new java.util.concurrent.ExecutorCompletionService[O](pool)
      var inflight = 0
      new Iterator[O] {
        private def fill(): Unit =
          while (inflight < capacity && it.hasNext) {
            val elem = it.next()
            ecs.submit(() => fn(elem))
            inflight += 1
          }
        override def hasNext: Boolean = {
          fill()
          if (inflight == 0) { pool.shutdown(); false } else true
        }
        override def next(): O = {
          fill()
          val f = ecs.poll(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)
          if (f == null) {
            pool.shutdownNow()
            throw new TimeoutException(
              s"async call exceeded ${timeoutMs}ms (AsyncWaitOperator timeout analog)")
          }
          inflight -= 1
          f.get()
        }
      }
    }
  }
}
