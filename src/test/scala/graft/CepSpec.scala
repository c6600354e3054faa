package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.concat_ws
import org.apache.spark.sql.streaming.OutputMode
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

  test("a NULL key and the literal string 'null' are distinct groups (r19 review)") {
    def is(k: String) = (r: org.apache.spark.sql.Row) =>
      r.getString(r.fieldIndex("kind")) == k
    // step A exists only under the NULL key, step B only under "null" —
    // a String.valueOf grouping would merge them and fabricate an A→B
    // match that happened on neither key
    val mixed = Seq(
      (1L, null.asInstanceOf[String], ts("2024-01-01 00:00:00"), "A"),
      (2L, "null", ts("2024-01-01 00:05:00"), "B"))
      .toDF("event_id", "user", "ts", "kind")
    assert(Cep.matchSequence(mixed, "user", "ts", "event_id",
      Seq("a" -> is("A"), "b" -> is("B")), 3600L).collect().isEmpty)
    assert(Cep.matchPattern(mixed, "user", "ts", "event_id",
      Seq(Cep.Step.once("a", is("A")), Cep.Step.once("b", is("B"))), 3600L)
      .collect().isEmpty)
    // each key alone still matches its own complete chain
    val both = Seq(
      (1L, null.asInstanceOf[String], ts("2024-01-01 00:00:00"), "A"),
      (2L, null.asInstanceOf[String], ts("2024-01-01 00:05:00"), "B"),
      (3L, "null", ts("2024-01-01 00:00:00"), "A"),
      (4L, "null", ts("2024-01-01 00:05:00"), "B"))
      .toDF("event_id", "user", "ts", "kind")
    val out = Cep.matchSequence(both, "user", "ts", "event_id",
      Seq("a" -> is("A"), "b" -> is("B")), 3600L).collect()
    assert(out.length == 2)
    assert(out.map(r => Option(r.getString(r.fieldIndex("user")))).toSet ==
      Set(None, Some("null")))
  }

  // ---- matchPattern: MATCH_RECOGNIZE subset (quantifiers, strict
  // contiguity, skip strategies) — shapes mirror the reference's
  // MatchRecognizeITCase --------------------------------------------

  private def is(k: String) = (r: org.apache.spark.sql.Row) =>
    r.getString(r.fieldIndex("kind")) == k

  private def seqDf(rows: (Long, String, String, String)*) =
    rows.map { case (id, u, t, k) => (id, u, ts(t), k) }
      .toDF("event_id", "user", "ts", "kind")

  test("matchPattern: greedy A+ B consumes the longest A run") {
    val df = seqDf(
      (1L, "u", "2024-01-01 00:00:00", "A"),
      (2L, "u", "2024-01-01 00:01:00", "A"),
      (3L, "u", "2024-01-01 00:02:00", "A"),
      (4L, "u", "2024-01-01 00:03:00", "B"))
    val out = Cep.matchPattern(df, "user", "ts", "event_id",
      Seq(Cep.Step.oneOrMore("a", is("A")), Cep.Step.once("b", is("B"))),
      3600L).collect()
    assert(out.length == 1)
    val m = out(0)
    assert(m.getLong(m.fieldIndex("a_first_id")) == 1L)
    assert(m.getLong(m.fieldIndex("a_last_id")) == 3L)
    assert(m.getInt(m.fieldIndex("a_count")) == 3)
    assert(m.getLong(m.fieldIndex("b_first_id")) == 4L)
  }

  test("matchPattern: reluctant A+? B stops at the first B") {
    val df = seqDf(
      (1L, "u", "2024-01-01 00:00:00", "X"),  // A matches X or B here
      (2L, "u", "2024-01-01 00:01:00", "B"),
      (3L, "u", "2024-01-01 00:02:00", "B"))
    // pattern (X|B)+? B : reluctant takes X then first B; greedy would
    // swallow both B's and fail (no closing B), then backtrack to one.
    val anyXB = Cep.anyOf(is("X"), is("B"))
    val rel = Cep.matchPattern(df, "user", "ts", "event_id",
      Seq(Cep.Step.oneOrMore("a", anyXB).copy(greedy = false),
          Cep.Step.once("b", is("B"))), 3600L).collect()
    assert(rel.length == 1)
    assert(rel(0).getInt(rel(0).fieldIndex("a_count")) == 1)
    assert(rel(0).getLong(rel(0).fieldIndex("b_first_id")) == 2L)
    val greedy = Cep.matchPattern(df, "user", "ts", "event_id",
      Seq(Cep.Step.oneOrMore("a", anyXB), Cep.Step.once("b", is("B"))),
      3600L).collect()
    assert(greedy.length == 1)
    assert(greedy(0).getInt(greedy(0).fieldIndex("a_count")) == 2)
    assert(greedy(0).getLong(greedy(0).fieldIndex("b_first_id")) == 3L)
  }

  test("matchPattern: optional step and times(n) quantifier") {
    val df = seqDf(
      (1L, "u", "2024-01-01 00:00:00", "A"),
      (2L, "u", "2024-01-01 00:01:00", "C"),
      (3L, "v", "2024-01-01 00:00:00", "A"),
      (4L, "v", "2024-01-01 00:01:00", "B"),
      (5L, "v", "2024-01-01 00:02:00", "C"))
    // A B? C matches both keys; b_count differs
    val out = Cep.matchPattern(df, "user", "ts", "event_id",
      Seq(Cep.Step.once("a", is("A")), Cep.Step.optional("b", is("B")),
          Cep.Step.once("c", is("C"))), 3600L)
      .collect().map(r => (r.getString(r.fieldIndex("user")),
        r.getInt(r.fieldIndex("b_count")))).toSet
    assert(out == Set(("u", 0), ("v", 1)))
    // A{2} requires exactly two consecutive A's
    val twice = Cep.matchPattern(seqDf(
      (1L, "w", "2024-01-01 00:00:00", "A"),
      (2L, "w", "2024-01-01 00:01:00", "A"),
      (3L, "w", "2024-01-01 00:02:00", "B")), "user", "ts", "event_id",
      Seq(Cep.Step.times("a", is("A"), 2), Cep.Step.once("b", is("B"))),
      3600L).collect()
    assert(twice.length == 1 && twice(0).getInt(twice(0).fieldIndex("a_count")) == 2)
  }

  test("matchPattern: strict contiguity rejects interleaved rows") {
    val df = seqDf(
      (1L, "u", "2024-01-01 00:00:00", "A"),
      (2L, "u", "2024-01-01 00:01:00", "X"),   // breaks A B adjacency
      (3L, "u", "2024-01-01 00:02:00", "B"))
    val out = Cep.matchPattern(df, "user", "ts", "event_id",
      Seq(Cep.Step.once("a", is("A")), Cep.Step.once("b", is("B"))),
      3600L).collect()
    assert(out.isEmpty)
  }

  test("matchPattern: WITHIN bound cuts the candidate window") {
    val df = seqDf(
      (1L, "u", "2024-01-01 00:00:00", "A"),
      (2L, "u", "2024-01-01 02:00:00", "B"))   // 2h later, gap in rows too
    val out = Cep.matchPattern(df, "user", "ts", "event_id",
      Seq(Cep.Step.once("a", is("A")), Cep.Step.once("b", is("B"))),
      3600L).collect()
    assert(out.isEmpty)
  }

  test("matchPattern: skip strategies control overlap") {
    val df = seqDf(
      (1L, "u", "2024-01-01 00:00:00", "A"),
      (2L, "u", "2024-01-01 00:01:00", "A"),
      (3L, "u", "2024-01-01 00:02:00", "A"))
    val steps = Seq(Cep.Step.times("a", is("A"), 2))
    val past = Cep.matchPattern(df, "user", "ts", "event_id", steps, 3600L,
      Cep.SkipPastLastRow).collect()
    assert(past.length == 1) // rows 1-2 consumed; row 3 alone can't match
    val next = Cep.matchPattern(df, "user", "ts", "event_id", steps, 3600L,
      Cep.SkipToNextRow).collect()
    assert(next.length == 2) // anchors 1 and 2 both match (overlapping)
  }

  test("matchPattern: SKIP TO FIRST/LAST variable resumes inside the match") {
    // pattern (A|B) B over rows A B B: PAST LAST ROW consumes rows 1-2
    // and finds nothing after; SKIP TO FIRST b resumes AT row 2 (the
    // b of match 1), which anchors a second, overlapping match.
    val df = seqDf(
      (1L, "u", "2024-01-01 00:00:00", "A"),
      (2L, "u", "2024-01-01 00:01:00", "B"),
      (3L, "u", "2024-01-01 00:02:00", "B"))
    val steps = Seq(
      Cep.Step.once("a", Cep.anyOf(is("A"), is("B"))),
      Cep.Step.once("b", is("B")))
    val past = Cep.matchPattern(df, "user", "ts", "event_id", steps, 3600L,
      Cep.SkipPastLastRow).collect()
    assert(past.length == 1)
    val toFirst = Cep.matchPattern(df, "user", "ts", "event_id", steps, 3600L,
      Cep.SkipToFirst("b")).collect()
    assert(toFirst.length == 2)
    assert(toFirst.map(r => r.getLong(r.fieldIndex("a_first_id"))).toSet == Set(1L, 2L))
    val toLast = Cep.matchPattern(df, "user", "ts", "event_id", steps, 3600L,
      Cep.SkipToLast("b")).collect()
    assert(toLast.length == 2) // b is one row here: same as toFirst
  }

  test("matchPatternStreaming: emits once when window freezes, drops state") {
    implicit val sc = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Ev]
    val steps = Seq(Cep.Step.once("a", (r: org.apache.spark.sql.Row) =>
        r.getString(r.fieldIndex("tpe")) == "A"),
      Cep.Step.oneOrMore("b", (r: org.apache.spark.sql.Row) =>
        r.getString(r.fieldIndex("tpe")) == "B"))
    val out = Cep.matchPatternStreaming(
      in.toDF().withWatermark("ts", "1 minute")
        .withColumn("eid", org.apache.spark.sql.functions.concat_ws(
          "-", $"user", $"ts".cast("long"))),
      "user", "ts", "eid", steps, withinSec = 600L)
    val q = out.writeStream.format("memory").queryName("cepstream")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
    try {
      in.addData(Ev(ts("2024-01-01 00:00:00"), "u1", "A", 1.0),
                 Ev(ts("2024-01-01 00:01:00"), "u1", "B", 1.0),
                 Ev(ts("2024-01-01 00:02:00"), "u1", "B", 1.0))
      q.processAllAvailable()
      // window not frozen yet (watermark < anchor+10m) → nothing
      assert(spark.sql("SELECT * FROM cepstream").count() == 0)
      // push watermark past the anchor's deadline
      in.addData(Ev(ts("2024-01-01 00:30:00"), "u1", "X", 0.0))
      q.processAllAvailable()
      in.addData(Ev(ts("2024-01-01 00:31:00"), "u1", "X", 0.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT b_count, a_first_id FROM cepstream").collect()
      assert(rows.length == 1)
      assert(rows(0).getInt(0) == 2) // greedy B+ took both B's
    } finally q.stop()
  }

  // ---- Branch alternation (A B | C D) — ref NFA branching states ----

  test("matchPatternBranches: each branch matches at its own anchor") {
    val df = seqDf(
      (1L, "u", "2024-01-01 00:00:00", "A"),
      (2L, "u", "2024-01-01 00:01:00", "B"),
      (3L, "u", "2024-01-01 00:02:00", "C"),
      (4L, "u", "2024-01-01 00:03:00", "D"))
    val out = Cep.matchPatternBranches(df, "user", "ts", "event_id",
      Seq(Seq(Cep.Step.once("a", is("A")), Cep.Step.once("b", is("B"))),
          Seq(Cep.Step.once("c", is("C")), Cep.Step.once("d", is("D")))),
      withinSec = 3600L)
      .orderBy("match_start_ts").collect()
    assert(out.length == 2)
    assert(out(0).getInt(out(0).fieldIndex("branch")) == 0)
    assert(out(0).getLong(out(0).fieldIndex("a_first_id")) == 1L)
    assert(out(0).getLong(out(0).fieldIndex("b_last_id")) == 2L)
    assert(out(0).isNullAt(out(0).fieldIndex("c_first_id"))) // other branch null
    assert(out(0).getInt(out(0).fieldIndex("c_count")) == 0)
    assert(out(1).getInt(out(1).fieldIndex("branch")) == 1)
    assert(out(1).getLong(out(1).fieldIndex("c_first_id")) == 3L)
    assert(out(1).getLong(out(1).fieldIndex("d_last_id")) == 4L)
  }

  test("matchPatternBranches: alternation is ordered — leftmost branch wins") {
    val df = seqDf(
      (1L, "u", "2024-01-01 00:00:00", "A"),
      (2L, "u", "2024-01-01 00:01:00", "B"),
      (3L, "u", "2024-01-01 00:02:00", "C"))
    val long = Seq(Cep.Step.once("a", is("A")), Cep.Step.once("b", is("B")),
      Cep.Step.once("c", is("C")))
    val short = Seq(Cep.Step.once("a", is("A")), Cep.Step.once("b", is("B")))
    // long branch listed first → it wins and consumes all three rows
    val o1 = Cep.matchPatternBranches(df, "user", "ts", "event_id",
      Seq(long, short), 3600L).collect()
    assert(o1.length == 1 && o1(0).getInt(o1(0).fieldIndex("branch")) == 0)
    assert(o1(0).getInt(o1(0).fieldIndex("c_count")) == 1)
    // short branch listed first → it wins, consuming only A B
    val o2 = Cep.matchPatternBranches(df, "user", "ts", "event_id",
      Seq(short, long), 3600L).collect()
    assert(o2.length == 1 && o2(0).getInt(o2(0).fieldIndex("branch")) == 0)
    assert(o2(0).getInt(o2(0).fieldIndex("c_count")) == 0)
  }

  test("matchPatternBranches: one skip cursor suppresses across branches") {
    // A B D with branches (A B | B D): the A-B match consumes B, so
    // under SKIP PAST LAST ROW the B-D branch may not anchor inside it.
    val df = seqDf(
      (1L, "u", "2024-01-01 00:00:00", "A"),
      (2L, "u", "2024-01-01 00:01:00", "B"),
      (3L, "u", "2024-01-01 00:02:00", "D"))
    val branches = Seq(
      Seq(Cep.Step.once("a", is("A")), Cep.Step.once("b", is("B"))),
      Seq(Cep.Step.once("b", is("B")), Cep.Step.once("d", is("D"))))
    val past = Cep.matchPatternBranches(df, "user", "ts", "event_id",
      branches, 3600L, Cep.SkipPastLastRow).collect()
    assert(past.length == 1)
    assert(past(0).getInt(past(0).fieldIndex("branch")) == 0)
    // SKIP TO NEXT ROW allows the overlapping branch-1 match at B
    val next = Cep.matchPatternBranches(df, "user", "ts", "event_id",
      branches, 3600L, Cep.SkipToNextRow)
      .orderBy("match_start_ts").collect()
    assert(next.length == 2)
    assert(next(0).getInt(next(0).fieldIndex("branch")) == 0)
    assert(next(1).getInt(next(1).fieldIndex("branch")) == 1)
    assert(next(1).getLong(next(1).fieldIndex("b_first_id")) == 2L) // shared name, branch-1 mapping
    assert(next(1).getLong(next(1).fieldIndex("d_last_id")) == 3L)
  }

  test("matchPatternBranchesStreaming: branches decide as windows freeze") {
    implicit val sc = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Ev]
    def isTpe(k: String) = (r: org.apache.spark.sql.Row) =>
      r.getString(r.fieldIndex("tpe")) == k
    val branches = Seq(
      Seq(Cep.Step.once("a", isTpe("A")), Cep.Step.once("b", isTpe("B"))),
      Seq(Cep.Step.once("c", isTpe("C")), Cep.Step.once("d", isTpe("D"))))
    val out = Cep.matchPatternBranchesStreaming(
      in.toDF().withWatermark("ts", "1 minute")
        .withColumn("eid", org.apache.spark.sql.functions.concat_ws(
          "-", $"user", $"ts".cast("long"))),
      "user", "ts", "eid", branches, withinSec = 600L)
    val q = out.writeStream.format("memory").queryName("cepbranches")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
    try {
      in.addData(Ev(ts("2024-01-01 00:00:00"), "u1", "A", 1.0),
                 Ev(ts("2024-01-01 00:01:00"), "u1", "B", 1.0),
                 Ev(ts("2024-01-01 00:02:00"), "u1", "C", 1.0),
                 Ev(ts("2024-01-01 00:03:00"), "u1", "D", 1.0))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM cepbranches").count() == 0) // not frozen
      in.addData(Ev(ts("2024-01-01 00:30:00"), "u1", "X", 0.0))
      q.processAllAvailable()
      in.addData(Ev(ts("2024-01-01 00:31:00"), "u1", "X", 0.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT branch FROM cepbranches ORDER BY match_start_ts").collect()
      assert(rows.map(_.getInt(0)).toList == List(0, 1))
    } finally q.stop()
  }

  test("streaming skip continuity across triggers is exact") {
    // The resume position persists as a (rowtime, id) sort-key cursor,
    // so EVERY skip strategy matches its batch result even when the
    // suppressed anchor only becomes decidable in a later trigger than
    // the match that suppresses it.
    implicit val sc = spark.sqlContext
    def isTpe(k: String) = (r: org.apache.spark.sql.Row) =>
      r.getString(r.fieldIndex("tpe")) == k
    val steps = Seq(Cep.Step.oneOrMore("a", isTpe("A")),
      Cep.Step.oneOrMore("b", isTpe("B")))
    val batchDf = Seq(
      (1L, "u", ts("2024-01-01 00:00:00"), "A"),
      (2L, "u", ts("2024-01-01 00:01:00"), "A"),
      (3L, "u", ts("2024-01-01 00:02:00"), "B"),
      (4L, "u", ts("2024-01-01 00:03:00"), "B"))
      .toDF("event_id", "user", "ts", "tpe")
      .withColumn("eid", concat_ws("-", $"user", $"ts".cast("long")))
    // batch ground truth: one match each way (TO FIRST b resumes at the
    // first B, suppressing the second A anchor)
    assert(Cep.matchPattern(batchDf, "user", "ts", "eid", steps, 300L,
      Cep.SkipToFirst("b")).collect().length == 1)
    assert(Cep.matchPattern(batchDf, "user", "ts", "eid", steps, 300L,
      Cep.SkipPastLastRow).collect().length == 1)

    def runStreaming(strategy: Cep.AfterMatch, name: String): Long = {
      val in = MemoryStream[Ev]
      val out = Cep.matchPatternStreaming(
        in.toDF().withWatermark("ts", "1 minute")
          .withColumn("eid", concat_ws("-", $"user", $"ts".cast("long"))),
        "user", "ts", "eid", steps, withinSec = 300L, strategy)
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      try {
        in.addData(Ev(ts("2024-01-01 00:00:00"), "u", "A", 1.0),
                   Ev(ts("2024-01-01 00:01:00"), "u", "A", 1.0),
                   Ev(ts("2024-01-01 00:02:00"), "u", "B", 1.0),
                   Ev(ts("2024-01-01 00:03:00"), "u", "B", 1.0))
        q.processAllAvailable()
        // trigger where only the FIRST A's window is decided
        in.addData(Ev(ts("2024-01-01 00:06:00"), "u", "X", 0.0))
        q.processAllAvailable()
        // trigger deciding the second A
        in.addData(Ev(ts("2024-01-01 00:07:30"), "u", "X", 0.0))
        q.processAllAvailable()
        in.addData(Ev(ts("2024-01-01 00:30:00"), "u", "X", 0.0))
        q.processAllAvailable()
        spark.sql(s"SELECT * FROM $name").count()
      } finally q.stop()
    }
    // both strategies: the persisted sort-key cursor suppresses the
    // second A across the trigger boundary — exactly the batch answer
    assert(runStreaming(Cep.SkipPastLastRow, "cep_past") == 1L)
    assert(runStreaming(Cep.SkipToFirst("b"), "cep_tofirst") == 1L)
  }

  // ---- Absence patterns (notNext / notFollowedBy — Pattern.java:294,325)

  test("matchPattern: trailing notFollowedBy confirms absence within the window") {
    val df = Seq(
      // u1: B inside the 1h window → NO match
      (1L, "u1", ts("2024-01-01 00:00:00"), "A"),
      (2L, "u1", ts("2024-01-01 00:30:00"), "B"),
      // u2: B only after the window → match
      (3L, "u2", ts("2024-01-01 00:00:00"), "A"),
      (4L, "u2", ts("2024-01-01 01:30:00"), "B"),
      // u3: no B at all → match
      (5L, "u3", ts("2024-01-01 00:00:00"), "A"),
      (6L, "u3", ts("2024-01-01 00:20:00"), "C"))
      .toDF("event_id", "user", "ts", "kind")
    def is(k: String) = (r: org.apache.spark.sql.Row) =>
      r.getString(r.fieldIndex("kind")) == k
    val out = Cep.matchPattern(df, "user", "ts", "event_id",
      Seq(Cep.Step.once("a", is("A")), Cep.Step.notFollowedBy("b", is("B"))),
      withinSec = 3600L).collect()
    val users = out.map(r => r.getString(r.fieldIndex("user"))).sorted.toList
    assert(users == List("u2", "u3"), s"got $users")
    // the negated variable consumes nothing: count 0, ids null
    assert(out.forall(r => r.getInt(r.fieldIndex("b_count")) == 0))
    assert(out.forall(r => r.isNullAt(r.fieldIndex("b_first_id"))))
    // match ends at the last CONSUMED row — the anchor itself
    assert(out.forall(r =>
      r.getTimestamp(r.fieldIndex("match_end_ts")) ==
      r.getTimestamp(r.fieldIndex("match_start_ts"))))
  }

  test("matchPattern: interior notFollowedBy gates the gap to the next step") {
    // A (¬B gap) C — the relaxed-contiguity negation: C may match any
    // later row as long as no B occurs in between.
    val df = Seq(
      (1L, "u1", ts("2024-01-01 00:00:00"), "A"), // A X C → match
      (2L, "u1", ts("2024-01-01 00:01:00"), "X"),
      (3L, "u1", ts("2024-01-01 00:02:00"), "C"),
      (4L, "u2", ts("2024-01-01 00:00:00"), "A"), // A B C → no match
      (5L, "u2", ts("2024-01-01 00:01:00"), "B"),
      (6L, "u2", ts("2024-01-01 00:02:00"), "C"),
      (7L, "u3", ts("2024-01-01 00:00:00"), "A"), // A C B → match (B after C)
      (8L, "u3", ts("2024-01-01 00:01:00"), "C"),
      (9L, "u3", ts("2024-01-01 00:02:00"), "B"))
      .toDF("event_id", "user", "ts", "kind")
    def is(k: String) = (r: org.apache.spark.sql.Row) =>
      r.getString(r.fieldIndex("kind")) == k
    val out = Cep.matchPattern(df, "user", "ts", "event_id",
      Seq(Cep.Step.once("a", is("A")),
          Cep.Step.notFollowedBy("nb", is("B")),
          Cep.Step.once("c", is("C"))),
      withinSec = 3600L).collect()
    val users = out.map(r => r.getString(r.fieldIndex("user"))).sorted.toList
    assert(users == List("u1", "u3"), s"got $users")
  }

  test("matchPattern: notNext asserts on the immediate next row only") {
    val df = Seq(
      (1L, "u1", ts("2024-01-01 00:00:00"), "A"), // next is B → no match
      (2L, "u1", ts("2024-01-01 00:01:00"), "B"),
      (3L, "u2", ts("2024-01-01 00:00:00"), "A"), // next is C → match
      (4L, "u2", ts("2024-01-01 00:01:00"), "C"),
      (5L, "u2", ts("2024-01-01 00:02:00"), "B"), // later B is irrelevant
      (6L, "u3", ts("2024-01-01 00:00:00"), "A")) // no next row → match
      .toDF("event_id", "user", "ts", "kind")
    def is(k: String) = (r: org.apache.spark.sql.Row) =>
      r.getString(r.fieldIndex("kind")) == k
    val out = Cep.matchPattern(df, "user", "ts", "event_id",
      Seq(Cep.Step.once("a", is("A")), Cep.Step.notNext("b", is("B"))),
      withinSec = 3600L).collect()
    val users = out.map(r => r.getString(r.fieldIndex("user"))).sorted.toList
    assert(users == List("u2", "u3"), s"got $users")
  }

  test("matchPattern: a pattern cannot start with a negated step") {
    val df = Seq((1L, "u", ts("2024-01-01 00:00:00"), "A"))
      .toDF("event_id", "user", "ts", "kind")
    intercept[IllegalArgumentException] {
      Cep.matchPattern(df, "user", "ts", "event_id",
        Seq(Cep.Step.notFollowedBy("b", _ => true),
            Cep.Step.once("a", _ => true)), 60L).collect()
    }
  }

  test("matchPatternStreaming: late negative row kills the pending match (cross-trigger)") {
    // "A not followed by B within 5m": u1's B arrives in a LATER
    // trigger than its A but with a rowtime inside the window — the
    // pending match must die. u2 (no B, and IDLE after its anchor)
    // confirms via the state-TTL timer: flatMapGroupsWithState only
    // invokes keys with data, so the TTL's final empty invocation is
    // what decides idle keys' frozen anchors — the role Flink's
    // per-key event-time timers play for timeout-confirmed
    // notFollowedBy-at-end. (Set ttlSec ≥ withinSec + watermark lag so
    // anchors decide before the purge.)
    implicit val sc = spark.sqlContext
    def isTpe(k: String) = (r: org.apache.spark.sql.Row) =>
      r.getString(r.fieldIndex("tpe")) == k
    val in = MemoryStream[Ev]
    val out = Cep.matchPatternStreaming(
      in.toDF().withWatermark("ts", "1 minute")
        .withColumn("eid", concat_ws("-", $"user", $"ts".cast("long"))),
      "user", "ts", "eid",
      Seq(Cep.Step.once("a", isTpe("A")), Cep.Step.notFollowedBy("b", isTpe("B"))),
      withinSec = 300L, ttlSec = 300L)
    val q = out.writeStream.format("memory").queryName("cep_absence")
      .outputMode(OutputMode.Append).start()
    try {
      // establish the watermark first so the anchors' TTL timers arm
      in.addData(Ev(ts("2024-01-01 00:00:00"), "u1", "X", 0.0))
      q.processAllAvailable()
      in.addData(Ev(ts("2024-01-01 00:00:30"), "u1", "A", 1.0),
                 Ev(ts("2024-01-01 00:00:30"), "u2", "A", 1.0))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM cep_absence").count() == 0,
        "nothing decidable before the watermark passes the window")
      // the killing row: later trigger, rowtime inside u1's window
      in.addData(Ev(ts("2024-01-01 00:03:00"), "u1", "B", 1.0))
      q.processAllAvailable()
      // advance the watermark past both anchors' deadlines (00:05:30);
      // u1 decides on its own data, u2 decides on its TTL flush
      in.addData(Ev(ts("2024-01-01 00:10:00"), "u1", "X", 0.0))
      q.processAllAvailable()
      in.addData(Ev(ts("2024-01-01 00:12:00"), "u1", "X", 0.0))
      q.processAllAvailable()
      val users = spark.sql("SELECT user FROM cep_absence").collect()
        .map(_.getString(0)).toList
      assert(users == List("u2"),
        s"only the B-free key may confirm absence, got $users")
    } finally q.stop()
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

  test("quantifier depth: a 20k-row A+ run matches without stack overflow") {
    // r19: the recursive take()/gap() exploration burned one stack
    // frame per consumed/skipped row — a hot key with ~20k consecutive
    // matches inside its within-window crashed the task with
    // StackOverflowError. The iterative rewrite keeps the exploration
    // order (greedy peels longest→min; gaps advance earliest-first)
    // with recursion only ACROSS steps.
    val n = 20000
    val rows = (0 until n).map(i =>
      ("k", new java.sql.Timestamp(1700000000000L + i * 10L), s"e$i", "t1"))
    val df = rows.toDF("user", "ts", "eid", "tpe")
    def is(k: String) = (r: org.apache.spark.sql.Row) =>
      r.getString(r.fieldIndex("tpe")) == k
    // greedy A+ consumes the whole run in ONE match
    val greedy = Cep.matchPattern(df, "user", "ts", "eid",
      Seq(Cep.Step.oneOrMore("a", is("t1"))), withinSec = 86400L).collect()
    assert(greedy.length == 1)
    assert(greedy(0).getInt(greedy(0).fieldIndex("a_count")) == n)
    // a long gap through an interior notFollowedBy is also iterative:
    // anchor, then 20k-row B-free gap, then the closing C
    val gapped = (("k", new java.sql.Timestamp(1699999999000L), "anchor", "t0") +:
      rows) :+ ("k", new java.sql.Timestamp(1700000000000L + n * 10L), "end", "t2")
    val out2 = Cep.matchPattern(gapped.toDF("user", "ts", "eid", "tpe"),
      "user", "ts", "eid",
      Seq(Cep.Step.once("a", is("t0")),
          Cep.Step.notFollowedBy("nb", is("t9")),
          Cep.Step.zeroOrMore("fill", is("t1")),
          Cep.Step.once("c", is("t2"))), withinSec = 86400L).collect()
    assert(out2.length == 1)
    assert(out2(0).getInt(out2(0).fieldIndex("fill_count")) == n)
  }

  test("matchPatternStreaming: a QUIET key emits on watermark alone (r20 timer fix)") {
    // the abandoned-cart shape: u1's events stop entirely; only u2's
    // later traffic advances the watermark. Pre-r20 the decided u1
    // match sat unemitted until new u1 data or TTL — the reference's
    // CepOperator registers an event-time timer at the window deadline
    // and emits then.
    implicit val sc = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Ev]
    val steps = Seq(
      Cep.Step.once("a", (r: org.apache.spark.sql.Row) =>
        r.getString(r.fieldIndex("tpe")) == "A"),
      Cep.Step.notFollowedBy("nb", (r: org.apache.spark.sql.Row) =>
        r.getString(r.fieldIndex("tpe")) == "B"))
    val out = Cep.matchPatternStreaming(
      in.toDF().withWatermark("ts", "1 second")
        .withColumn("eid", org.apache.spark.sql.functions.concat_ws(
          "-", $"user", $"ts".cast("long"))),
      "user", "ts", "eid", steps, withinSec = 60L)
    val q = out.writeStream.format("memory").queryName("cepquiet")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
    try {
      in.addData(Ev(ts("2024-01-01 00:00:00"), "u1", "A", 1.0))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM cepquiet").count() == 0, "window not frozen yet")
      // ONLY u2 traffic from here on — u1 never sends again
      in.addData(Ev(ts("2024-01-01 00:05:00"), "u2", "X", 0.0))
      q.processAllAvailable()
      in.addData(Ev(ts("2024-01-01 00:06:00"), "u2", "X", 0.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT user FROM cepquiet").collect().map(_.getString(0))
      assert(rows.toSeq == Seq("u1"),
        s"u1's not-followed-by match must emit on watermark alone: ${rows.toSeq}")
    } finally q.stop()
  }

  test("quantifier worst case is LINEAR, not quadratic (r20): A+ with a never-matching continuation") {
    // r19's iterative rewrite fixed the stack, not the probe count: a
    // 20k-row greedy A+ run whose NEXT step never matches probed the
    // failing continuation once per (anchor × count) and re-walked the
    // run once per anchor — O(n²) per key-window (the reference NFA
    // shares suffix computation across starts, flink-cep
    // SharedBuffer). The r20 memo (failed go-probes + run ends, valid
    // per frozen window) makes each position's predicate run at most
    // once per window. The assertion is on PREDICATE CALLS — a
    // complexity proxy immune to timing noise.
    val n = 20000
    val rows = (0 until n).map(i =>
      ("k", new java.sql.Timestamp(1700000000000L + i * 10L), s"e$i", "t1"))
    val df = rows.toDF("user", "ts", "eid", "tpe").coalesce(1)
    CepSpec.aCalls.set(0); CepSpec.bCalls.set(0)
    val out = Cep.matchPattern(df, "user", "ts", "eid",
      Seq(Cep.Step.oneOrMore("a", r => {
            CepSpec.aCalls.incrementAndGet()
            r.getString(r.fieldIndex("tpe")) == "t1"
          }),
          Cep.Step.once("b", r => {
            CepSpec.bCalls.incrementAndGet()
            r.getString(r.fieldIndex("tpe")) == "t9" // never
          })),
      withinSec = 86400L).collect()
    assert(out.isEmpty, "A+ B with no B must not match")
    val (a, b) = (CepSpec.aCalls.get(), CepSpec.bCalls.get())
    // pre-memo this shape cost ~n²/2 ≈ 200M probes; linear means a few
    // multiples of n (the run is walked once, each continuation
    // position fails once)
    assert(a <= 10L * n, s"A-predicate calls must be O(n): $a for n=$n")
    assert(b <= 10L * n, s"B-predicate calls must be O(n): $b for n=$n")
  }
}

object CepSpec {
  // predicate-call counters for the complexity probe (tasks run in the
  // local[32] JVM, so a static counter sees every call)
  val aCalls = new java.util.concurrent.atomic.AtomicLong
  val bCalls = new java.util.concurrent.atomic.AtomicLong
}
