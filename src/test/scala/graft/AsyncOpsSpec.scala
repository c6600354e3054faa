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
}
