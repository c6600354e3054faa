package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.AsyncOps

class AsyncOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("mapAsyncOrdered preserves order and overlaps calls") {
    val n = 64
    val ds = spark.range(n).repartition(2).as[Long]
    def timed(cap: Int): (Array[Long], Double) = {
      val t0 = System.nanoTime()
      val out = AsyncOps.mapAsyncOrdered(ds, capacity = cap) { i =>
        Thread.sleep(50) // simulated external call latency
        i * 2
      }.collect()
      (out, (System.nanoTime() - t0) / 1e9)
    }
    timed(16) // warm the stage
    val (serialOut, serialWall) = timed(1)
    val (out, wall) = timed(16)
    assert(out.sorted.sameElements((0L until n).map(_ * 2)))
    assert(serialOut.sorted.sameElements(out.sorted))
    // 16 in-flight calls must beat capacity=1 by a wide margin
    assert(wall < serialWall / 2, s"no overlap? async=$wall serial=$serialWall")
  }

  test("mapAsyncOrdered keeps per-partition input order") {
    val ds = spark.range(100).coalesce(1).as[Long]
    val out = AsyncOps.mapAsyncOrdered(ds, capacity = 8) { i =>
      Thread.sleep((i % 7) * 2) // jittered latency must not reorder
      i
    }.collect()
    assert(out.sameElements(0L until 100))
  }

  test("mapAsyncOrdered times out on a hung call instead of wedging") {
    val ds = spark.range(4).coalesce(1).as[Long]
    val ex = intercept[org.apache.spark.SparkException] {
      AsyncOps.mapAsyncOrdered(ds, capacity = 2, timeoutMs = 200) { i =>
        if (i == 2) Thread.sleep(60000)
        i
      }.collect()
    }
    assert(ex.getMessage.contains("exceeded") ||
      Option(ex.getCause).exists(_.getMessage.contains("exceeded")))
  }

  test("mapAsyncUnordered completes everything; completion order allowed") {
    val ds = spark.range(64).coalesce(1).as[Long]
    val out = AsyncOps.mapAsyncUnordered(ds, capacity = 16) { i =>
      Thread.sleep(if (i % 16 == 0) 30 else 1) // stragglers finish late
      i * 2
    }.collect()
    assert(out.sorted.sameElements((0L until 64).map(_ * 2)))
  }

  test("withRetry: exception retried up to maxAttempts with FIXED_DELAY") {
    val calls = new java.util.concurrent.atomic.AtomicInteger
    val flaky = AsyncOps.withRetry[Long, Long](i => {
      if (calls.incrementAndGet() < 3) throw new RuntimeException("transient")
      i * 10
    }, maxAttempts = 3)
    assert(flaky(7L) == 70L && calls.get() == 3)

    calls.set(0)
    val alwaysFails = AsyncOps.withRetry[Long, Long](
      _ => { calls.incrementAndGet(); throw new RuntimeException("down") },
      maxAttempts = 4)
    val e = intercept[RuntimeException](alwaysFails(1L))
    assert(e.getMessage == "down" && calls.get() == 4)
  }

  test("withRetry: empty-result retry (EMPTY_RESULT_PREDICATE analog)") {
    val calls = new java.util.concurrent.atomic.AtomicInteger
    val lateHit = AsyncOps.withRetry[Long, Option[String]](i =>
      if (calls.incrementAndGet() < 2) None else Some(s"row$i"),
      maxAttempts = 3, retryOnEmpty = true)
    assert(lateHit(5L).contains("row5") && calls.get() == 2)

    calls.set(0)
    val neverHits = AsyncOps.withRetry[Long, Option[String]](
      _ => { calls.incrementAndGet(); None },
      maxAttempts = 3, retryOnEmpty = true)
    assert(neverHits(5L).isEmpty && calls.get() == 3)

    // without retryOnEmpty a miss is a result, not a retry
    calls.set(0)
    val once = AsyncOps.withRetry[Long, Option[String]](
      _ => { calls.incrementAndGet(); None }, maxAttempts = 3)
    assert(once(5L).isEmpty && calls.get() == 1)
  }

  test("withRetry composes with mapAsyncOrdered under the capacity bound") {
    val ds = spark.range(16).coalesce(1).as[Long]
    val out = AsyncOps.mapAsyncOrdered(ds, capacity = 4)(
      AsyncOps.withRetry[Long, Long](i =>
        // deterministic per-element flakiness: fail each element's first try
        if (FlakyCounter.seen.add(i)) throw new RuntimeException("first try fails")
        else i + 100,
        maxAttempts = 2)).collect()
    assert(out.sameElements((0L until 16).map(_ + 100)))
  }

  test("failed tasks do not leak the per-partition pool threads (r16)") {
    // Pool threads are non-daemon and the executor JVM outlives the
    // task: without the task-completion shutdown hook, every FAILING
    // element leaked `capacity` threads. Run several failing jobs and
    // assert the JVM's default-named pool threads settle back.
    import scala.jdk.CollectionConverters._
    def poolThreads(): Int = Thread.getAllStackTraces.keySet().asScala
      .count(t => t.isAlive && t.getName.startsWith("pool-"))
    val before = poolThreads()
    (1 to 3).foreach { _ =>
      intercept[Exception] {
        AsyncOps.mapAsyncOrdered(spark.range(8).coalesce(1).as[Long],
          capacity = 8) { _ => throw new RuntimeException("boom"); 0L }
          .collect()
      }
    }
    // shutdownNow from the completion listener interrupts idle workers;
    // give them a moment to exit
    val deadline = System.currentTimeMillis() + 15000
    var after = poolThreads()
    while (after > before + 4 && System.currentTimeMillis() < deadline) {
      Thread.sleep(250); after = poolThreads()
    }
    assert(after <= before + 4,
      s"3 failing jobs x capacity 8 leaked pool threads: before=$before after=$after")
  }
}

/** Executor-side dedup set for the retry-composition test (a lambda
  * capturing a local mutable set would be serialized per task copy).
  */
object FlakyCounter {
  val seen: java.util.concurrent.ConcurrentHashMap.KeySetView[java.lang.Long, java.lang.Boolean] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.lang.Long]()
}
