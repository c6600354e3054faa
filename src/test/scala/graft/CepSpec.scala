package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import graft.streaming.Cep

class CepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("matchSequence: finds chain within window, skips incomplete") {
    val df = Seq(
      // u1: complete A→B→C within 1h
      (1L, "u1", ts("2024-01-01 00:00:00"), "A"),
      (2L, "u1", ts("2024-01-01 00:10:00"), "B"),
      (3L, "u1", ts("2024-01-01 00:20:00"), "C"),
      // u2: B too late (>1h after A)
      (4L, "u2", ts("2024-01-01 00:00:00"), "A"),
      (5L, "u2", ts("2024-01-01 01:30:00"), "B"),
      (6L, "u2", ts("2024-01-01 01:40:00"), "C"),
      // u3: wrong order
      (7L, "u3", ts("2024-01-01 00:00:00"), "B"),
      (8L, "u3", ts("2024-01-01 00:10:00"), "A"),
      // u1 second anchor: A at 00:15 → B? none after → no match
      (9L, "u1", ts("2024-01-01 00:15:00"), "A"))
      .toDF("event_id", "user", "ts", "kind")

    def is(k: String) = (r: org.apache.spark.sql.Row) =>
      r.getString(r.fieldIndex("kind")) == k
    val out = Cep.matchSequence(df, "user", "ts", "event_id",
      Seq("a" -> is("A"), "b" -> is("B"), "c" -> is("C")), 3600L)
      .collect()

    assert(out.length == 1)
    val m = out(0)
    assert(m.getString(m.fieldIndex("user")) == "u1")
    assert(m.getLong(m.fieldIndex("a_id")) == 1L)
    assert(m.getLong(m.fieldIndex("b_id")) == 2L)
    assert(m.getLong(m.fieldIndex("c_id")) == 3L)
  }

  test("matchSequence: greedy first-match per step") {
    val df = Seq(
      (1L, "u", ts("2024-01-01 00:00:00"), "A"),
      (2L, "u", ts("2024-01-01 00:01:00"), "B"),
      (3L, "u", ts("2024-01-01 00:02:00"), "B"),  // second B ignored
      (4L, "u", ts("2024-01-01 00:03:00"), "C"))
      .toDF("event_id", "user", "ts", "kind")
    def is(k: String) = (r: org.apache.spark.sql.Row) =>
      r.getString(r.fieldIndex("kind")) == k
    val out = Cep.matchSequence(df, "user", "ts", "event_id",
      Seq("a" -> is("A"), "b" -> is("B"), "c" -> is("C")), 3600L).collect()
    assert(out.length == 1)
    assert(out(0).getLong(out(0).fieldIndex("b_id")) == 2L)
  }
}
