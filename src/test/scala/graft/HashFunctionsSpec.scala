package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.functions._

class HashFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("minhash: deterministic, length k, identical inputs collide") {
    val df = Seq(
      ("a", Seq("x", "y", "z")),
      ("b", Seq("x", "y", "z")),
      ("c", Seq("p", "q", "r"))).toDF("id", "toks")
    val sigs = df.select($"id", minhash($"toks", 32).as("sig")).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(sigs("a").length == 32)
    assert(sigs("a") == sigs("b"))
    assert(sigs("a") != sigs("c"))
  }

  test("minhash: matching fraction estimates jaccard") {
    // two sets with |∩|=50, |∪|=150 → true J = 1/3
    val s1 = (0 until 100).map(i => s"tok$i")
    val s2 = (50 until 200).map(i => s"tok$i")
    val df = Seq(("a", s1), ("b", s2)).toDF("id", "toks")
    val Array(ra, rb) = df.orderBy("id")
      .select(minhash($"toks", 256).as("sig")).collect()
    val (sa, sb) = (ra.getSeq[Long](0), rb.getSeq[Long](0))
    val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / 256
    assert(math.abs(est - 1.0 / 3.0) < 0.12, s"est=$est")
  }

  test("simhash: equal docs equal, perturbation stays near") {
    val base = (0 until 200).map(i => s"w$i")
    val pert = base.updated(0, "CHANGED").updated(1, "ALSO")
    val far = (0 until 200).map(i => s"other$i")
    val df = Seq(("a", base), ("b", base), ("c", pert), ("d", far))
      .toDF("id", "toks")
    val m = df.select($"id", simhash($"toks").as("s")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("a") == m("b"))
    val near = java.lang.Long.bitCount(m("a") ^ m("c"))
    val dist = java.lang.Long.bitCount(m("a") ^ m("d"))
    assert(near < 16, s"near=$near")
    assert(dist > 16, s"dist=$dist")
  }

  test("hamming64 + registration via SQL") {
    graft.functions.functions.register(spark)
    val r = spark.sql(
      "SELECT hamming64(11, 8) h1, hamming64(5, 5) h2, " +
        "simhash(array('a','b')) s, " +
        "size(minhash(array('a','b'), 16)) k").collect()(0)
    assert(r.getInt(0) == 2)  // 1011 ^ 1000 = 0011
    assert(r.getInt(1) == 0)
    assert(r.getInt(3) == 16)
  }

  test("cosine_sim: identity 1.0, orthogonal 0.0, null-safe") {
    val df = Seq(
      (Array(1f, 2f, 3f), Array(1f, 2f, 3f)),
      (Array(1f, 0f, 0f), Array(0f, 1f, 0f))).toDF("a", "b")
    val vals = df.select(cosine_sim($"a", $"b")).collect().map(_.getDouble(0))
    assert(math.abs(vals(0) - 1.0) < 1e-12)
    assert(vals(1) == 0.0)
  }

  test("hyperplane_bits64: deterministic, sign-symmetric, angle-tracking") {
    import graft.functions.VectorFns.hyperplane_bits64
    val v = Array.tabulate(64)(i => math.sin(i * 1.7).toFloat)
    val nearV = v.clone(); nearV(0) = nearV(0) + 0.01f // tiny perturbation
    val negV = v.map(-_)                               // antipode
    val df = Seq(("v", v), ("near", nearV), ("neg", negV))
      .toDF("name", "emb")
      .select($"name", hyperplane_bits64($"emb").as("bits"))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // deterministic across evaluations
    assert(m("v") == df.filter($"name" === "v").collect()(0).getLong(1))
    // antipodal vector flips every sign bit
    assert((m("v") ^ m("neg")) == -1L)
    // near-identical vector flips almost no bits (θ ≈ 0 → hamming ≈ 0)
    assert(java.lang.Long.bitCount(m("v") ^ m("near")) <= 3)
    // SQL registration
    graft.functions.functions.register(spark)
    val sql = spark.sql(
      "SELECT hyperplane_bits64(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)))").collect()(0).getLong(0)
    val api = Seq(Tuple1(Array(1f, 2f))).toDF("e")
      .select(hyperplane_bits64($"e")).collect()(0).getLong(0)
    assert(sql == api)
  }

  test("token_hashes: per-token base hash feeds the minhash affine min") {
    val toks = Seq("alpha", "beta", "gamma")
    val hs = Seq(Tuple1(toks)).toDF("t")
      .select(token_hashes($"t")).collect()(0).getSeq[Long](0)
    assert(hs.length == 3 && hs.distinct.length == 3)
    // null elements are skipped, mirroring minhash's fold
    val withNull = Seq(Tuple1(Seq("alpha", null, "gamma"))).toDF("t")
      .select(token_hashes($"t")).collect()(0).getSeq[Long](0)
    assert(withNull == Seq(hs(0), hs(2)))
    // recompute the k=4 signature from the base hashes: unsigned min of
    // a_j*h + b_j must equal the minhash expression's output
    val (as, bs) = graft.functions.MinHashSignature.coefficients(4)
    val expected = (0 until 4).map { j =>
      hs.map(h => as(j) * h + bs(j)).minBy(v => v ^ Long.MinValue)
    }
    val sig = Seq(Tuple1(toks)).toDF("t")
      .select(minhash($"t", 4)).collect()(0).getSeq[Long](0)
    assert(sig == expected)
  }

  test("kgram_hashes: rolling equals direct recompute, edge cases") {
    val text = "the quick brown fox jumps"
    val k = 8
    val got = Seq(Tuple1(text)).toDF("s")
      .select(kgram_hashes($"s", k)).collect()(0).getSeq[Long](0)
    val bytes = text.getBytes("UTF-8")
    assert(got.length == bytes.length - k + 1)
    // direct (non-rolling) polynomial evaluation per window
    val direct = (0 to bytes.length - k).map { p =>
      var h = 0L
      (p until p + k).foreach(i => h = h * graft.functions.KGramHashes.Base + (bytes(i) & 0xffL))
      graft.functions.Hashing.mix64(h)
    }
    assert(got == direct)
    // shorter than k → no k-grams; deterministic across calls
    val short = Seq(Tuple1("abc")).toDF("s")
      .select(kgram_hashes($"s", k)).collect()(0).getSeq[Long](0)
    assert(short.isEmpty)
    val again = Seq(Tuple1(text)).toDF("s")
      .select(kgram_hashes($"s", k)).collect()(0).getSeq[Long](0)
    assert(again == got)
  }

  test("ngram_hashes: position count, gram equality, edge cases") {
    val df = Seq(
      ("a", Seq("w", "x", "y", "z", "w", "x", "y", "z")),
      ("b", Seq("q", "w", "x", "y", "z", "k"))).toDF("id", "toks")
    val hs = df.orderBy("id")
      .select(ngram_hashes($"toks", 4)).collect().map(_.getSeq[Long](0))
    assert(hs(0).length == 5 && hs(1).length == 3)
    // same 4-gram (w x y z) hashes identically at every site, across docs
    assert(hs(0)(0) == hs(0)(4) && hs(0)(0) == hs(1)(1))
    // distinct grams disperse
    assert(hs(0).distinct.length == 4) // wxyz, xyzw, yzwx, zwxy
    // shorter than n → empty; n must see token BOUNDARIES, not chars:
    // ["ab","c"] vs ["a","bc"] join to the same chars but differ as grams
    val edge = Seq(
      ("s", Seq("a", "b", "c")),
      ("p1", Seq("ab", "c")),
      ("p2", Seq("a", "bc"))).toDF("id", "toks")
    val eh = edge.orderBy($"id".desc) // s, p2, p1
      .select(ngram_hashes($"toks", 4).as("h4"), ngram_hashes($"toks", 2).as("h2"))
      .collect()
    assert(eh(0).getSeq[Long](0).isEmpty) // 3 tokens, n=4
    assert(eh(1).getSeq[Long](1)(0) != eh(2).getSeq[Long](1)(0))
    // SQL registration agrees with the Column API
    graft.functions.functions.register(spark)
    val viaSql = spark.sql(
      "SELECT ngram_hashes(array('w','x','y','z','w'), 4) AS h").collect()(0).getSeq[Long](0)
    assert(viaSql == Seq(hs(0)(0), hs(0)(1)))
  }

  test("kernel edge hardening (r18 review): k/width guards, null elements, overflow, SIMILAR TO literals") {
    graft.functions.functions.register(spark)
    // minhash: non-positive / NULL k rejected at ANALYSIS time
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT minhash(array('a'), -5)").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT minhash(array('a'), CAST(NULL AS INT))").collect()
    }
    // kgram_hashes: non-positive k → empty, never a negative index read
    assert(spark.sql("SELECT size(kgram_hashes('abcdef', 0)) AS n, " +
      "size(kgram_hashes('abcdef', -1)) AS m").collect()(0).toSeq == Seq(0, 0))
    // shingle widths: wrong type / non-positive rejected at analysis
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT distinct_shingle_count(array('a','b'), '2')").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT top_shingle_count(array('a','b'), 0)").collect()
    }
    // sorted_intersect_count: null elements are skipped, not NPE'd
    // (sort_array places nulls first, so the fixture is genuinely sorted)
    assert(spark.sql("SELECT sort_array(array('b', NULL, 'a')) AS x, " +
        "sort_array(array('b', 'c', NULL)) AS y")
      .select(graft.functions.ArrayFns.sorted_intersect_count(
        col("x"), col("y")).as("c"))
      .collect()(0).getInt(0) == 1)
    // sig_agree / cosine_sim: a NULL position nulls the result (the
    // zip_with chain's semantics); null-free inputs behave as before
    val sa = spark.sql(
      """SELECT sig_agree(array(1L, CAST(NULL AS BIGINT)), array(1L, 2L)) AS a,
        |       sig_agree(array(1L, 2L), array(1L, 3L)) AS b,
        |       cosine_sim(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)),
        |                  array(CAST(1.0 AS FLOAT), CAST(1.0 AS FLOAT))) AS c""".stripMargin)
      .collect()(0)
    assert(sa.isNullAt(0) && sa.getInt(1) == 1 && sa.isNullAt(2))
    // truncate: beyond 2^53 a double has no fractional digits — identity,
    // not an overflowing BIGINT cast
    val tr = spark.sql(
      "SELECT truncate(1e19, 2) AS big, truncate(3.14159, 2) AS small").collect()(0)
    assert(tr.getDouble(0) == 1e19 && tr.getDouble(1) == 3.14)
    // r19 ADVICE: the band |x| < 2^53 <= |x*10^d| still carries
    // sub-10^-d precision (x ~ 9.1e13 has ulp 1/64) — the decimal
    // path must agree with the reference's BigDecimal ROUND_DOWN of
    // BigDecimal.valueOf(x), where the old identity shortcut diverged
    for (x <- Seq(9.1e13 + 1.0 / 64, -(9.1e13 + 1.0 / 64), 2.5e14 + 0.03,
                  9.007e15 - 0.5, 123456789.987654321)) {
      for (d <- Seq(1, 2, 5, 17)) {
        val want = java.math.BigDecimal.valueOf(x)
          .setScale(d, java.math.RoundingMode.DOWN).doubleValue()
        val got = spark.sql(s"SELECT truncate(CAST($x AS DOUBLE), $d) AS t")
          .collect()(0).getDouble(0)
        assert(got == want, s"truncate($x, $d): got $got want $want")
        val gotCol = Seq(x).toDF("x")
          .select(graft.functions.Strings.truncateNum(col("x"), d).as("t"))
          .collect()(0).getDouble(0)
        assert(gotCol == want, s"truncateNum($x, $d): got $gotCol want $want")
      }
    }
    // d >= 18: identity (a shortest double representation in the band
    // has at most 17 significant digits — nothing below 10^-18 to chop)
    assert(spark.sql("SELECT truncate(CAST(0.5 AS DOUBLE), 18) AS t")
      .collect()(0).getDouble(0) == 0.5)
    // split_index: separators containing regex text (incl. the \E that
    // breaks \Q..\E quoting) stay literal
    val si = spark.sql(
      """SELECT split_index('x.y.z', '.', 1) AS dot,
        |       split_index('1a\\Eb2a\\Eb3', 'a\\Eb', 2) AS esc""".stripMargin).collect()(0)
    assert(si.getString(0) == "y" && si.getString(1) == "3", si.toSeq.toString)
    // SIMILAR TO: '$' and '^' are literal characters in SQL:1999
    assert(graft.functions.Strings.similarToRegexp("100$") == "^100\\$$")
    assert("100$".matches(graft.functions.Strings.similarToRegexp("100$")))
    assert(!"100".matches(graft.functions.Strings.similarToRegexp("100$")))
    assert("a^b".matches(graft.functions.Strings.similarToRegexp("a^b")))
    // registration must not clobber a user-set map-key policy
    val old = spark.conf.get("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    try {
      spark.conf.set("spark.sql.mapKeyDedupPolicy", "EXCEPTION")
      graft.functions.functions.register(spark)
      assert(spark.conf.get("spark.sql.mapKeyDedupPolicy") == "EXCEPTION",
        "register() must respect an explicit user policy")
    } finally spark.conf.set("spark.sql.mapKeyDedupPolicy", old)
  }

  test("FlinkSqlOperatorTable stragglers: split_index / hash_code / truncate / is_* / rand_integer") {
    graft.functions.functions.register(spark)
    val r = spark.sql(
      """SELECT
        |  split_index('a.b.c', '.', 1) AS si_mid,
        |  split_index('a.b.c', '.', 5) AS si_oob,
        |  split_index('a.b.c', '.', -1) AS si_neg,
        |  split_index('x,,y,', ',', 3) AS si_trail,
        |  hash_code('graft') AS hc,
        |  hash_code('') AS hc_empty,
        |  truncate(3.14159d, 2) AS tr_pos,
        |  truncate(-3.19d, 1) AS tr_neg,
        |  is_alpha('Abc') AS ia_t, is_alpha('a1') AS ia_f,
        |  is_digit('123') AS id_t, is_digit('1a') AS id_f,
        |  is_decimal('-3.2e4') AS dec_t, is_decimal('x') AS dec_f,
        |  rand_integer(10) AS ri
        |""".stripMargin).collect()(0)
    assert(r.getString(0) == "b")
    assert(r.isNullAt(1) && r.isNullAt(2))
    // preserve-all-tokens: trailing empty token exists at index 3
    assert(r.getString(3) == "")
    assert(r.getInt(4) == math.abs("graft".hashCode))
    assert(r.getInt(5) == 0)
    assert(r.getDouble(6) == 3.14 && r.getDouble(7) == -3.1)
    assert(r.getBoolean(8) && !r.getBoolean(9))
    assert(r.getBoolean(10) && !r.getBoolean(11))
    assert(r.getBoolean(12) && !r.getBoolean(13))
    assert(r.getInt(14) >= 0 && r.getInt(14) < 10)

    // Column-API forms agree with the SQL-text forms
    import graft.functions.Strings
    val c = Seq(("a|b|c", 2)).toDF("s", "i")
      .select(Strings.splitIndex($"s", "|", $"i").as("si"),
        Strings.truncateNum(lit(9.8765), 3).as("tr"))
      .collect()(0)
    assert(c.getString(0) == "c" && c.getDouble(1) == 9.876)
  }
}
