package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Changelog

class ChangelogBatchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val log = Seq(
    ("+I", "k1", 1L, 10.0),
    ("-U", "k1", 2L, 10.0), ("+U", "k1", 2L, 11.0),
    ("+I", "k2", 3L, 5.0),
    ("-D", "k2", 4L, 5.0),
    ("+I", "k3", 5L, 7.0)
  ).toDF("row_kind", "key", "seq", "v")

  test("dropUpdateBefore strips only -U rows") {
    val out = Changelog.dropUpdateBefore(log).select("row_kind").collect()
      .map(_.getString(0))
    assert(!out.contains("-U") && out.length == 5)
  }

  test("toUpsert collapses a changelog to latest visible rows") {
    val out = Changelog.toUpsert(log, Seq("key"), "seq")
      .select("key", "v").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSet
    // k1 → latest 11.0; k2 deleted; k3 → 7.0
    assert(out == Set(("k1", 11.0), ("k3", 7.0)))
  }
}
