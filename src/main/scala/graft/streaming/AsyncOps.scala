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
      // The pool's threads are non-daemon and the executor JVM outlives
      // the task: a failing element (non-timeout exception) or an
      // ABANDONED iterator (downstream limit/take stops consuming)
      // would leak `capacity` threads per task. Tie the pool to the
      // task lifecycle — shutdownNow is harmless after a normal drain.
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => pool.shutdownNow()))
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

  /** Retry wrapper for async lookups — the reference's
    * RetryableLookupFunctionDelegator + AsyncRetryStrategies
    * (flink-table-runtime/.../join/lookup/RetryableLookupFunctionDelegator.java;
    * flink-streaming-java/.../functions/async/AsyncRetryStrategy):
    * FIXED_DELAY strategy, retrying on exception and/or on an empty
    * (miss) result up to `maxAttempts`. Wrap the per-element function
    * BEFORE handing it to [[mapAsyncOrdered]]/[[mapAsyncUnordered]] —
    * retries then consume the in-flight slot of the element they serve,
    * preserving the capacity bound, exactly like the delegator retries
    * within the async collector's slot.
    *
    * @param retryOnEmpty also retry when the lookup SUCCEEDS with an
    *   empty Option/Iterable (the reference's
    *   RetryPredicates.EMPTY_RESULT_PREDICATE); the final attempt's
    *   empty result is returned as-is.
    */
  def withRetry[I, O](fn: I => O, maxAttempts: Int, delayMs: Long = 0L,
                      retryOnEmpty: Boolean = false): I => O = {
    require(maxAttempts >= 1)
    def isEmpty(o: O): Boolean = o match {
      case opt: Option[_] => opt.isEmpty
      case it: Iterable[_] => it.isEmpty
      case _ => false
    }
    in => {
      var attempt = 1
      var out: Either[Throwable, O] = null
      var done = false
      while (!done) {
        out = try Right(fn(in)) catch { case e: Exception => Left(e) }
        val retryable = out.fold(_ => true, o => retryOnEmpty && isEmpty(o))
        if (retryable && attempt < maxAttempts) {
          attempt += 1
          if (delayMs > 0) Thread.sleep(delayMs)
        } else done = true
      }
      out.fold(e => throw e, identity)
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
      // task-lifecycle cleanup — see mapAsyncOrdered
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => pool.shutdownNow()))
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
