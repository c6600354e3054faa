package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.{Changelog, ChangelogJoin, RetractTopN}

/** Differential fuzz of the retract/changelog operators (r20) — the
  * class where the r19 streaming-state review found seven wrong-answer
  * bugs by hand. The oracle is the CHANGELOG CONTRACT itself: feed a
  * randomly generated WELL-FORMED changelog (every retraction matches
  * a live row; updates may migrate keys), then
  *  - REPLAY the operator's emitted changelog into a final table
  *    (order-free net counting — every (payload, rank) slot must net
  *    to 0 or 1), and
  *  - compare against the BATCH computation over the final input
  *    table (the state a downstream materialization would hold).
  * Sampling is seed-pinned.
  */
class ChangelogDifferentialFuzzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val fuzzScale = sys.env.getOrElse("GRAFT_FUZZ_SCALE", "1").toInt
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n * fuzzScale).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(0xC16D1FFL + i)))

  /** A well-formed changelog over ids: fold random (action, grp, score)
    * picks against a live table so -U/-D always retract reality. */
  private def buildOps(picks: Seq[(Int, Int, Int)], nGrp: Int)
      : (Seq[Score], Map[String, (String, Double)]) = {
    val live = scala.collection.mutable.LinkedHashMap.empty[String, (String, Double)]
    val ops = scala.collection.mutable.ArrayBuffer.empty[Score]
    var nextId = 0
    picks.foreach { case (a, g, s) =>
      val grp = s"g${math.abs(g) % nGrp}"
      val score = (math.abs(s) % 50).toDouble
      val action = math.abs(a) % 3
      if (action == 0 || live.isEmpty) { // insert
        val id = s"i$nextId"; nextId += 1
        live(id) = (grp, score)
        ops += Score("+I", grp, id, score)
      } else {
        val id = live.keys.toSeq(math.abs(a * 31 + s) % live.size)
        val (og, os) = live(id)
        if (action == 1) { // update — may migrate the group key
          ops += Score("-U", og, id, os)
          live(id) = (grp, score)
          ops += Score("+U", grp, id, score)
        } else { // delete
          ops += Score("-D", og, id, os)
          live.remove(id)
        }
      }
    }
    (ops.toSeq, live.toMap)
  }

  private val scenarioGen: Gen[(Seq[Score], Map[String, (String, Double)], Int)] =
    for {
      n <- Gen.choose(20, 45)
      picks <- Gen.listOfN(n, for {
        a <- Gen.choose(0, 1000); g <- Gen.choose(0, 1000); s <- Gen.choose(0, 1000)
      } yield (a, g, s))
      chunk <- Gen.choose(2, 5)
    } yield {
      val (ops, fin) = buildOps(picks, nGrp = 3)
      (ops, fin, chunk)
    }

  test("retractGroupAgg final state equals batch agg over the final table (8 scenarios)") {
    implicit val sc = spark.sqlContext
    samples(scenarioGen, 8).zipWithIndex.foreach { case ((ops, fin, chunk), i) =>
      val in = MemoryStream[Score]
      val out = Changelog.retractGroupAgg(in.toDF(), Seq("grp"), "score")
      val qn = s"chdiffagg$i"
      val q = out.writeStream.format("memory").queryName(qn)
        .outputMode(OutputMode.Update).start()
      try {
        ops.grouped(chunk).foreach { c => in.addData(c: _*); q.processAllAvailable() }
        // memory-sink rows arrive in batch order; last row per group is
        // the operator's final answer
        val last = scala.collection.mutable.LinkedHashMap.empty[String, (Long, Double)]
        spark.sql(s"SELECT grp, cnt, sum_val FROM $qn").collect().foreach { r =>
          last(r.getString(0)) = (r.getLong(1), r.getDouble(2))
        }
        val want = fin.values.groupBy(_._1).view
          .mapValues(vs => (vs.size.toLong, vs.map(_._2).sum)).toMap
        want.foreach { case (g, (cnt, sum)) =>
          val got = last.getOrElse(g, (-1L, 0.0))
          assert(got._1 == cnt && math.abs(got._2 - sum) < 1e-6,
            s"#$i grp=$g: got $got want ($cnt, $sum)\nops=$ops")
        }
        // groups whose rows all retracted must END at cnt=0
        last.foreach { case (g, (cnt, _)) =>
          if (!want.contains(g))
            assert(cnt == 0L, s"#$i grp=$g fully retracted but last cnt=$cnt\nops=$ops")
        }
      } finally q.stop()
    }
  }

  test("RetractTopN replayed changelog equals batch top-2 of the final table (8 scenarios)") {
    implicit val sc = spark.sqlContext
    samples(scenarioGen, 8).zipWithIndex.foreach { case ((ops, fin, chunk), i) =>
      val in = MemoryStream[Score]
      val out = RetractTopN(in.toDF(), keys = Seq("grp"), idCol = "id",
        scoreCol = "score", n = 2)
      val qn = s"chdifftopn$i"
      val q = out.writeStream.format("memory").queryName(qn)
        .outputMode(OutputMode.Append).start()
      try {
        ops.grouped(chunk).foreach { c => in.addData(c: _*); q.processAllAvailable() }
        // order-free replay: net count per (grp, id, score, rank) slot
        val net = scala.collection.mutable.Map.empty[(String, String, Double, Int), Int]
          .withDefaultValue(0)
        spark.sql(s"SELECT row_kind, grp, id, score, rank_no FROM $qn")
          .collect().foreach { r =>
            val k = (r.getString(1), r.getString(2), r.getDouble(3), r.getInt(4))
            val sgn = if (r.getString(0).startsWith("+")) 1 else -1
            net(k) = net(k) + sgn
          }
        net.foreach { case (k, c) =>
          assert(c == 0 || c == 1, s"#$i slot $k netted $c (unbalanced changelog)\nops=$ops")
        }
        val gotFinal = net.collect { case (k, 1) => k }.toSet
        val wantFinal = fin.toSeq.groupBy(_._2._1).flatMap { case (g, rows) =>
          rows.sortBy { case (id, (_, s)) => (-s, id) }.take(2).zipWithIndex
            .map { case ((id, (_, s)), r0) => (g, id, s, r0 + 1) }
        }.toSet
        assert(gotFinal == wantFinal,
          s"#$i top-2 divergence\ngot=$gotFinal\nwant=$wantFinal\nops=$ops")
      } finally q.stop()
    }
  }

  test("ChangelogJoin (batch) replayed output equals the join of the final tables (10 scenarios)") {
    val gen = for {
      l <- scenarioGen; r <- scenarioGen
    } yield (l, r)
    samples(gen, 10).zipWithIndex.foreach { case (((lOps, lFin, _), (rOps, rFin, _)), i) =>
      // one global seq orders the two sides' ops as one history
      var seq = 0L
      def s(): Long = { seq += 1; seq }
      val lRows = lOps.map(o => (o.row_kind, o.grp, o.id, o.score, s()))
      val rRows = rOps.map(o => (o.row_kind, o.grp, o.id, o.score, s()))
      val left = lRows.toDF("row_kind", "k", "lid", "lv", "seq")
      val right = rRows.toDF("row_kind", "k", "rid", "rv", "seq")
      val out = ChangelogJoin(left, Seq("k"), right, Seq("k"), "seq").collect()
      // order-free multiset replay of the emitted join changelog
      val net = scala.collection.mutable.Map.empty[Seq[Any], Int].withDefaultValue(0)
      out.foreach { r =>
        val sgn = if (r.getString(0).startsWith("+")) 1 else -1
        val payload = r.toSeq.drop(1)
        net(payload) = net(payload) + sgn
      }
      val gotFinal = net.filter(_._2 != 0)
      gotFinal.values.foreach(c => assert(c > 0, s"#$i negative net: $gotFinal"))
      // batch oracle: inner join of the two FINAL tables on k
      val want = scala.collection.mutable.Map.empty[Seq[Any], Int].withDefaultValue(0)
      lFin.foreach { case (lid, (k, lv)) =>
        rFin.foreach { case (rid, (k2, rv)) =>
          if (k == k2) {
            val p = Seq[Any](k, lid, lv, k2, rid, rv)
            want(p) = want(p) + 1
          }
        }
      }
      assert(gotFinal.toMap == want.toMap,
        s"#$i join divergence\ngot=${gotFinal.toMap}\nwant=${want.toMap}")
    }
  }
}
