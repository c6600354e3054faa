package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.streaming.Cep

/** Differential fuzz of the CEP matcher against an INDEPENDENT
  * enumeration-based oracle (r20 — written alongside the cross-anchor
  * memoization, so any unsoundness in the failed-probe / run-end memos
  * shows up as a divergence here, not in production).
  *
  * The oracle is a different ALGORITHM for the same spec: instead of
  * backtracking, it enumerates every consumed-count assignment
  * (c_1..c_k over the steps; gap lengths for interior negation),
  * orders them by the documented exploration priority (DFS left to
  * right; greedy = larger count first, reluctant / gaps = smaller
  * first) and takes the first VALID one — then replays the anchor scan
  * with the skip-strategy cursor semantics. Sampling is seed-pinned.
  */
class CepDifferentialFuzzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val fuzzScale = sys.env.getOrElse("GRAFT_FUZZ_SCALE", "1").toInt
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n * fuzzScale).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(0xCE9D1FFL + i)))

  // ---- oracle model ----------------------------------------------------

  private case class MStep(name: String, sym: Char, min: Int, max: Int,
                           greedy: Boolean, negated: Boolean)

  /** One generated scenario: event symbols (strictly increasing times),
    * the pattern, the within bound and the skip strategy. */
  private case class Scenario(syms: Vector[Char], gapsSec: Vector[Int],
                              steps: Vector[MStep], withinSec: Long,
                              skip: Cep.AfterMatch)

  /** Single-anchor enumerating matcher: Some((endPos, perStep meas))
    * if the pattern matches anchored exactly at `anchor`. */
  private def oracleMatchAt(sc: Scenario, anchor0: Int)
      : Option[(Int, Vector[(Int, Int, Int)])] = {
    val n = sc.syms.length
    val tsSec = sc.gapsSec.scanLeft(0L)(_ + _).take(n)
    def matchesAt(anchor: Int): Option[(Int, Vector[(Int, Int, Int)])] = {
      val deadline = tsSec(anchor) + sc.withinSec
      val limit = tsSec.count(_ <= deadline) // rows are time-sorted
      val k = sc.steps.length
      // candidate counts per step: positives bounded by min..max within
      // window; negated interior = gap length 0..window; negated
      // trailing = 0 (the absence check is applied to the remainder)
      val ranges: Vector[Range] = sc.steps.zipWithIndex.map { case (st, si) =>
        val room = limit - anchor
        if (st.negated) {
          if (si == k - 1) 0 to 0
          else if (st.max == 1) 0 to 0 // notNext consumes nothing
          else 0 to room // interior notFollowedBy gap
        } else st.min to math.min(st.max, room)
      }
      // DFS priority: per-step comparator — greedy desc, reluctant asc,
      // gaps asc (earliest continuation first)
      def ordered(si: Int): Seq[Int] = {
        val r = ranges(si)
        if (!sc.steps(si).negated && sc.steps(si).greedy) r.reverse else r
      }
      def valid(cs: Vector[Int]): Boolean = {
        var pos = anchor
        var ok = true
        sc.steps.zipWithIndex.foreach { case (st, si) =>
          if (!ok) ()
          else {
            val c = cs(si)
            if (pos + c > limit) ok = false
            else if (st.negated) {
              if (si == k - 1) {
                // trailing: notNext checks the immediate next row,
                // notFollowedBy the whole remaining window
                val scanTo = if (st.max == 1) math.min(pos + 1, limit) else limit
                ok = (pos until scanTo).forall(p => sc.syms(p) != st.sym)
              } else if (st.max == 1) {
                ok = pos >= limit || sc.syms(pos) != st.sym
              } else {
                // interior gap: every skipped row fails the predicate
                ok = (pos until pos + c).forall(p => sc.syms(p) != st.sym)
                pos += c
              }
            } else {
              ok = (pos until pos + c).forall(p => sc.syms(p) == st.sym)
              pos += c
            }
          }
        }
        // NOTE: the >=1-row-consumed rule is NOT part of validity —
        // the implementation applies it to the FIRST successful
        // exploration (matchAt's `endPos > anchor` sits outside the
        // search), it never backtracks to force consumption. The
        // oracle mirrors that: pick first valid, then post-filter.
        ok
      }
      // lexicographic DFS order over the per-step priorities
      def search(si: Int, acc: Vector[Int]): Option[Vector[Int]] =
        if (si == k) { if (valid(acc)) Some(acc) else None }
        else ordered(si).iterator
          .map(c => search(si + 1, acc :+ c)).collectFirst { case Some(v) => v }
      search(0, Vector.empty).flatMap { cs =>
        var pos = anchor
        val meas = sc.steps.zipWithIndex.map { case (st, si) =>
          val c = cs(si)
          val m =
            if (st.negated || c == 0) (-1, -1, 0)
            else (pos, pos + c - 1, c)
          if (!st.negated || (st.max > 1 && si < k - 1)) pos += c
          m
        }
        if (pos > anchor) Some((pos, meas)) else None
      }
    }
    matchesAt(anchor0)
  }

  /** The oracle: list of matches as
    * (anchorIdx, endPos, perStep (first,last,count)). */
  private def oracleMatches(sc: Scenario): Seq[(Int, Int, Vector[(Int, Int, Int)])] = {
    val n = sc.syms.length
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Vector[(Int, Int, Int)])]
    // skip cursor as (tsSec, idIdx) — ids are "e<idx>" and times are
    // strictly increasing, so index order IS sort order
    var cursorIdx = -1
    var cursorIncl = true
    var i = 0
    while (i < n) {
      val supp = i < cursorIdx || (i == cursorIdx && cursorIncl)
      if (!supp) oracleMatchAt(sc, i).foreach { case (endPos, meas) =>
        out += ((i, endPos, meas))
        sc.skip match {
          case Cep.SkipPastLastRow => cursorIdx = endPos - 1; cursorIncl = true
          case Cep.SkipToNextRow => cursorIdx = i; cursorIncl = true
          case Cep.SkipToFirst(v) =>
            val si = sc.steps.indexWhere(_.name == v)
            val (f, _, c) = if (si >= 0) meas(si) else (-1, -1, 0)
            if (si >= 0 && c > 0 && f > i) { cursorIdx = f; cursorIncl = false }
            else { cursorIdx = i; cursorIncl = true }
          case Cep.SkipToLast(v) =>
            val si = sc.steps.indexWhere(_.name == v)
            val (_, l, c) = if (si >= 0) meas(si) else (-1, -1, 0)
            if (si >= 0 && c > 0 && l > i) { cursorIdx = l; cursorIncl = false }
            else { cursorIdx = i; cursorIncl = true }
        }
      }
      i += 1
    }
    out.toSeq
  }

  // ---- generators ------------------------------------------------------

  private val stepGen: Gen[MStep] = for {
    sym <- Gen.oneOf('A', 'B', 'C')
    shape <- Gen.oneOf("once", "oneOrMore", "zeroOrMore", "optional", "times")
    greedy <- Gen.oneOf(true, false)
    tn <- Gen.choose(2, 3)
  } yield shape match {
    case "once" => MStep("", sym, 1, 1, greedy = true, negated = false)
    case "oneOrMore" => MStep("", sym, 1, Int.MaxValue, greedy, negated = false)
    case "zeroOrMore" => MStep("", sym, 0, Int.MaxValue, greedy, negated = false)
    case "optional" => MStep("", sym, 0, 1, greedy, negated = false)
    case "times" => MStep("", sym, tn, tn, greedy = true, negated = false)
  }

  private val scenarioGen: Gen[Scenario] = for {
    n <- Gen.choose(6, 22)
    syms <- Gen.listOfN(n, Gen.oneOf('A', 'B', 'C'))
    gaps <- Gen.listOfN(n, Gen.choose(1, 25))
    k <- Gen.choose(1, 3)
    steps0 <- Gen.listOfN(k, stepGen)
    negKind <- Gen.oneOf("none", "trailingNF", "trailingNN", "interiorNF")
    negSym <- Gen.oneOf('A', 'B', 'C')
    within <- Gen.oneOf(30L, 80L, 100000L)
    skip <- Gen.oneOf[Cep.AfterMatch](Cep.SkipPastLastRow, Cep.SkipToNextRow,
      Cep.SkipToFirst("s0"), Cep.SkipToLast("s0"))
  } yield {
    val named = steps0.zipWithIndex.map { case (s, i) => s.copy(name = s"s$i") }
    val steps = negKind match {
      case "none" => named
      case "trailingNF" =>
        named :+ MStep("neg", negSym, 0, Int.MaxValue, greedy = true, negated = true)
      case "trailingNN" =>
        named :+ MStep("neg", negSym, 0, 1, greedy = true, negated = true)
      case "interiorNF" if named.length >= 2 =>
        (named.head :: MStep("neg", negSym, 0, Int.MaxValue, greedy = true,
          negated = true) :: named.tail).toList
      case _ => named
    }
    Scenario(syms.toVector, gaps.toVector, steps.toVector, within, skip)
  }

  test("matchPattern agrees with the enumeration oracle (60 seed-pinned scenarios)") {
    val base = 1700000000L // epoch seconds
    samples(scenarioGen, 60).zipWithIndex.foreach { case (sc, i) =>
      val tsSec = sc.gapsSec.scanLeft(0L)(_ + _).take(sc.syms.length)
      val rows = sc.syms.zipWithIndex.map { case (sym, idx) =>
        ("k", new java.sql.Timestamp((base + tsSec(idx)) * 1000L),
          f"e$idx%04d", sym.toString)
      }
      val df = rows.toDF("user", "ts", "eid", "tpe").coalesce(1)
      val steps = sc.steps.map { st =>
        // capture only primitives/strings — an MStep is an inner case
        // class whose $outer (the spec, holding spark) can't serialize
        val sym = st.sym.toString
        Cep.Step(st.name, r => r.getString(r.fieldIndex("tpe")) == sym,
          st.min, st.max, st.greedy, st.negated)
      }
      val got = Cep.matchPattern(df, "user", "ts", "eid", steps, sc.withinSec, sc.skip)
        .collect().map { r =>
          val meas = sc.steps.map { st =>
            (Option(r.get(r.fieldIndex(s"${st.name}_first_id"))).map(_.toString).orNull,
             Option(r.get(r.fieldIndex(s"${st.name}_last_id"))).map(_.toString).orNull,
             r.getInt(r.fieldIndex(s"${st.name}_count")))
          }
          (r.getTimestamp(r.fieldIndex("match_start_ts")).getTime / 1000L - base,
           r.getTimestamp(r.fieldIndex("match_end_ts")).getTime / 1000L - base,
           meas)
        }.sortBy(_._1)
      val want = oracleMatches(sc).map { case (anchor, endPos, meas) =>
        (tsSec(anchor), tsSec(endPos - 1),
         sc.steps.indices.map { si =>
           val (f, l, c) = meas(si)
           if (c == 0) (null: String, null: String, 0)
           else (f"e$f%04d", f"e$l%04d", c)
         }.toVector)
      }.sortBy(_._1)
      assert(got.length == want.length,
        s"#$i: match count ${got.length} vs oracle ${want.length}\n" +
          s"syms=${sc.syms.mkString} steps=${sc.steps} within=${sc.withinSec} skip=${sc.skip}\n" +
          s"got=${got.toSeq}\nwant=$want")
      got.zip(want).zipWithIndex.foreach { case (((gTs, gE, gM), (wTs, wE, wM)), mi) =>
        assert(gTs == wTs && gE == wE && gM == wM,
          s"#$i match $mi: got ($gTs, $gE, $gM) vs oracle ($wTs, $wE, $wM)\n" +
            s"syms=${sc.syms.mkString} steps=${sc.steps} within=${sc.withinSec} skip=${sc.skip}")
      }
    }
  }

  test("matchPatternBranches agrees with a two-branch oracle (24 seed-pinned scenarios)") {
    // ordered alternation: at each anchor the branches are tried left
    // to right, first match wins, ONE shared skip cursor. The oracle
    // composes the single-branch enumerator per branch and replays the
    // shared-cursor scan independently of the production runner.
    val gen = for {
      sc1 <- scenarioGen
      steps2 <- Gen.listOfN(2, stepGen)
    } yield (sc1, steps2.zipWithIndex.map { case (s, i) => s.copy(name = s"t$i") }.toVector)
    samples(gen, 24).zipWithIndex.foreach { case ((sc1, branch2), i) =>
      val branches = Vector(sc1.steps, branch2)
      // oracle: per-anchor, first branch whose enumerator matches
      def oracle: Seq[(Int, Int, Int, Vector[(Int, Int, Int)])] = {
        val n = sc1.syms.length
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Int, Int, Int, Vector[(Int, Int, Int)])]
        var cursorIdx = -1
        var cursorIncl = true
        var j = 0
        while (j < n) {
          val supp = j < cursorIdx || (j == cursorIdx && cursorIncl)
          if (!supp) {
            val hit = branches.zipWithIndex.iterator.map { case (steps, bi) =>
              oracleMatchAt(sc1.copy(steps = steps), j)
                .map { case (endPos, meas) => (bi, endPos, meas) }
            }.collectFirst { case Some(m) => m }
            hit.foreach { case (bi, endPos, meas) =>
              out += ((j, bi, endPos, meas))
              sc1.skip match {
                case Cep.SkipPastLastRow => cursorIdx = endPos - 1; cursorIncl = true
                case Cep.SkipToNextRow => cursorIdx = j; cursorIncl = true
                case Cep.SkipToFirst(v) =>
                  val si = branches(bi).indexWhere(_.name == v)
                  val (f, _, c) = if (si >= 0) meas(si) else (-1, -1, 0)
                  if (si >= 0 && c > 0 && f > j) { cursorIdx = f; cursorIncl = false }
                  else { cursorIdx = j; cursorIncl = true }
                case Cep.SkipToLast(v) =>
                  val si = branches(bi).indexWhere(_.name == v)
                  val (_, l, c) = if (si >= 0) meas(si) else (-1, -1, 0)
                  if (si >= 0 && c > 0 && l > j) { cursorIdx = l; cursorIncl = false }
                  else { cursorIdx = j; cursorIncl = true }
              }
            }
          }
          j += 1
        }
        out.toSeq
      }
      val tsSec = sc1.gapsSec.scanLeft(0L)(_ + _).take(sc1.syms.length)
      val base = 1700000000L
      val rows = sc1.syms.zipWithIndex.map { case (sym, idx) =>
        ("k", new java.sql.Timestamp((base + tsSec(idx)) * 1000L),
          f"e$idx%04d", sym.toString)
      }
      val df = rows.toDF("user", "ts", "eid", "tpe").coalesce(1)
      val cepBranches = branches.map(_.map { st =>
        val sym = st.sym.toString
        Cep.Step(st.name, r => r.getString(r.fieldIndex("tpe")) == sym,
          st.min, st.max, st.greedy, st.negated)
      }.toSeq)
      val got = Cep.matchPatternBranches(df, "user", "ts", "eid",
        cepBranches, sc1.withinSec, sc1.skip)
        .collect().map { r =>
          (r.getTimestamp(r.fieldIndex("match_start_ts")).getTime / 1000L - base,
           r.getInt(r.fieldIndex("branch")))
        }.sortBy(identity).toSeq
      val want = oracle.map { case (anchor, bi, _, _) => (tsSec(anchor), bi) }
        .sortBy(identity)
      assert(got == want,
        s"#$i: branch divergence\nsyms=${sc1.syms.mkString} " +
          s"b0=${branches(0)} b1=${branches(1)} within=${sc1.withinSec} skip=${sc1.skip}\n" +
          s"got=$got\nwant=$want")
    }
  }

  test("matchPatternStreaming agrees with batch matchPattern (12 seed-pinned scenarios, chunked triggers)") {
    // the streaming path is the subtle one — watermark-frozen anchors,
    // cross-trigger cursor persistence, state eviction. Equivalence
    // contract: once the watermark passes every anchor's deadline, the
    // streaming output equals the batch output on the same rows. Rows
    // feed in 1–3 chunks with a full trigger between, so matches that
    // DECIDE in a later trigger than the match that suppresses them
    // exercise the persisted cursor.
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000L
    samples(scenarioGen, 12).zipWithIndex.foreach { case (sc, i) =>
      val tsSec = sc.gapsSec.scanLeft(0L)(_ + _).take(sc.syms.length)
      val maxTs = tsSec.last
      // two flush rows with a symbol no predicate matches drive the
      // watermark past every real anchor's deadline; they are part of
      // the data on BOTH sides (a gap may skip them), and neither can
      // anchor a match (Z fails every positive predicate; a pure-gap
      // exploration resolves empty first and is discarded)
      val allRows = sc.syms.zipWithIndex.map { case (sym, idx) =>
        (new java.sql.Timestamp((base + tsSec(idx)) * 1000L), "k",
          f"e$idx%04d", sym.toString)
      } ++ Seq(
        (new java.sql.Timestamp((base + maxTs + sc.withinSec + 100) * 1000L),
          "k", "zz01", "Z"),
        (new java.sql.Timestamp((base + maxTs + sc.withinSec + 200) * 1000L),
          "k", "zz02", "Z"))
      val steps = sc.steps.map { st =>
        val sym = st.sym.toString
        Cep.Step(st.name, r => r.getString(r.fieldIndex("tpe")) == sym,
          st.min, st.max, st.greedy, st.negated)
      }
      def key(r: org.apache.spark.sql.Row): String = {
        val meas = sc.steps.map { st => Seq(
          Option(r.get(r.fieldIndex(s"${st.name}_first_id"))).map(_.toString).getOrElse("-"),
          Option(r.get(r.fieldIndex(s"${st.name}_last_id"))).map(_.toString).getOrElse("-"),
          r.getInt(r.fieldIndex(s"${st.name}_count")).toString).mkString(",")
        }.mkString("|")
        s"${r.getTimestamp(r.fieldIndex("match_start_ts")).getTime}" +
          s"/${r.getTimestamp(r.fieldIndex("match_end_ts")).getTime}|$meas"
      }
      val want = Cep.matchPattern(allRows.toDF("ts", "user", "eid", "tpe"),
        "user", "ts", "eid", steps, sc.withinSec, sc.skip)
        .collect().map(key).sorted.toSeq
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(java.sql.Timestamp, String, String, String)]
      val out = Cep.matchPatternStreaming(
        in.toDF().toDF("ts", "user", "eid", "tpe").withWatermark("ts", "1 second"),
        "user", "ts", "eid", steps, sc.withinSec, sc.skip)
      val qn = s"cepdiffstream$i"
      val q = out.writeStream.format("memory").queryName(qn)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
      try {
        val nChunks = 1 + (i % 3)
        val size = math.max(1, allRows.length / nChunks)
        allRows.grouped(size).foreach { chunk =>
          in.addData(chunk: _*)
          q.processAllAvailable()
        }
        val got = spark.sql(s"SELECT * FROM $qn").collect().map(key).sorted.toSeq
        assert(got == want,
          s"#$i: streaming/batch divergence\nsyms=${sc.syms.mkString} " +
            s"steps=${sc.steps} within=${sc.withinSec} skip=${sc.skip} chunks=$nChunks\n" +
            s"got=$got\nwant=$want")
      } finally q.stop()
    }
  }
}
