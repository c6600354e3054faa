package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property fuzz of the SQL-client statement DISPATCH — the r14
  * rewrite-scanner fuzz (RewriteFuzzSpec) predates the catalog /
  * function / partition / CTAS / plan statements, so this spec extends
  * the seed-pinned generator approach to the statement surface itself
  * (r17 directive #5). Invariants:
  *
  *  1. ROBUST DISPATCH — generated VALID statements (random identifier
  *     case, keyword case, whitespace/newlines, backticks, optional
  *     semicolon, WITH props) execute without raw Spark parse errors,
  *     and their effects are observable (listings, SELECTs);
  *  2. IDEMPOTENCE — the IF NOT EXISTS / IF EXISTS forms re-execute as
  *     no-ops: running the same lifecycle twice leaves the registries
  *     in the same state;
  *  3. ERROR PROVENANCE — generated NEAR-MISS statements (unknown
  *     objects, invalid bodies, bad specs) throw graft-level messages
  *     that name the statement class, never a raw Spark parse error;
  *  4. PRESERVATION — statement keywords inside string literals of a
  *     plain query are NOT intercepted by the dispatcher (all dispatch
  *     regexes are statement-anchored).
  *
  * Sampling is seed-pinned (deterministic across runs) so a failure is
  * reproducible from its printed seed index.
  */
class StatementFuzzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val env = graft.sql.SqlEnv(spark)

  private val fuzzScale = sys.env.getOrElse("GRAFT_FUZZ_SCALE", "1").toInt
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n * fuzzScale).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(0xF0221L + i)))

  // ---- token-shape generators -----------------------------------------
  // keyword case variants (the dispatch regexes are (?i))
  private def kw(s: String): Gen[String] =
    Gen.oneOf(s, s.toLowerCase, s.toUpperCase,
      s.zipWithIndex.map { case (c, i) =>
        if (i % 2 == 0) c.toUpper else c.toLower }.mkString)
  // inter-token whitespace: spaces, tabs, newlines
  private val ws: Gen[String] =
    Gen.oneOf(" ", "  ", "\t", "\n", " \n ", "   ")
  private def joinTokens(toks: Seq[String]): Gen[String] =
    Gen.listOfN(math.max(0, toks.length - 1), ws).map { seps =>
      toks.head + seps.zip(toks.tail).map { case (s, t) => s + t }.mkString
    }
  // identifiers arrive bare or backticked
  private def quotable(name: String): Gen[String] =
    Gen.oneOf(name, s"`$name`")
  private val semi: Gen[String] = Gen.oneOf("", ";", " ;", ";\n")
  // WITH-props clause (values: letters/digits/space/dash/dot — the
  // option parser's documented charset)
  private val propPair: Gen[String] = for {
    k <- Gen.oneOf("owner", "a.b.c", "format", "note-2")
    v <- Gen.oneOf("graft", "v 1", "x-y.z", "12")
  } yield s"'$k' = '$v'"
  private val withProps: Gen[String] =
    Gen.choose(0, 3).flatMap(n =>
      if (n == 0) Gen.const("")
      else Gen.listOfN(n, propPair).map(ps => s" WITH (${ps.distinct.mkString(", ")})"))

  // ---- 1+2: valid lifecycles are dispatched and idempotent ------------

  test("database/catalog lifecycle: random shapes execute, IF-guards are idempotent (80 samples)") {
    val gen = for {
      obj <- Gen.oneOf("DATABASE", "CATALOG")
      create <- kw(s"CREATE $obj")
      ine <- kw("IF NOT EXISTS")
      drop <- kw(s"DROP $obj")
      ie <- kw("IF EXISTS")
      props <- withProps
      s <- semi
    } yield (obj, create, ine, drop, ie, props, s)
    samples(gen, 80).zipWithIndex.foreach {
      case ((obj, create, ine, drop, ie, props, s), i) =>
        val name = s"fz_${obj.toLowerCase.take(3)}_$i"
        def listed: Boolean = env.executeSql(
          if (obj == "DATABASE") "SHOW DATABASES" else "SHOW CATALOGS")
          .collect().map(_.getString(0)).contains(name)
        val stmt = for {
          q <- quotable(name)
          t <- joinTokens(Seq(create, ine, q + props + s))
        } yield t
        val sql = stmt.apply(Gen.Parameters.default, Seed(0xBEEFL + i)).get
        env.executeSql(sql)
        assert(listed, s"sample #$i: '$sql' must register $name")
        env.executeSql(sql) // IF NOT EXISTS: second run is a no-op
        assert(listed)
        // plain re-create must fail with the statement class in the message
        val dup = intercept[IllegalArgumentException] {
          env.executeSql(s"$create $name")
        }
        assert(dup.getMessage.contains(s"CREATE $obj"), s"#$i: ${dup.getMessage}")
        if (obj == "DATABASE") // ALTER DATABASE only exists for databases
          env.executeSql(s"ALTER DATABASE $name SET ('k' = 'v$i')")
        env.executeSql(s"$drop $name$s")
        assert(!listed, s"sample #$i: $name must be dropped")
        env.executeSql(joinTokens(Seq(drop, ie, name)).apply(
          Gen.Parameters.default, Seed(0xCAFEL + i)).get) // idempotent drop
        val gone = intercept[IllegalArgumentException] {
          env.executeSql(s"$drop $name")
        }
        assert(gone.getMessage.contains(s"DROP $obj"), s"#$i: ${gone.getMessage}")
    }
  }

  test("function lifecycle: random shapes execute end-to-end (40 samples)") {
    val gen = for {
      create <- kw("CREATE FUNCTION")
      tmp <- Gen.oneOf("", "TEMPORARY ", "TEMPORARY SYSTEM ")
      ine <- kw("IF NOT EXISTS")
      lang <- Gen.oneOf("", " LANGUAGE SCALA", " LANGUAGE JAVA")
      drop <- kw("DROP FUNCTION")
      s <- semi
    } yield (create, tmp, ine, lang, drop, s)
    samples(gen, 40).zipWithIndex.foreach { case ((create, tmp, ine, lang, drop, s), i) =>
      val name = s"fz_fn_$i"
      try spark.sessionState.functionRegistry.dropFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name))
      catch { case _: Throwable => () }
      val createSql = create.replaceFirst("(?i)FUNCTION", s"${tmp}FUNCTION") +
        s" $name AS 'graft.TestUdfUpper'$lang$s"
      env.executeSql(createSql)
      assert(spark.sql(s"SELECT $name('ab') AS v").collect()(0).getString(0) == "AB",
        s"sample #$i: '$createSql' must register a working function")
      env.executeSql(s"$create $ine $name AS 'graft.TestUdfUpper'") // no-op
      env.executeSql(s"ALTER FUNCTION $name AS 'graft.TestUdfLower'")
      assert(spark.sql(s"SELECT $name('AB') AS v").collect()(0).getString(0) == "ab")
      env.executeSql(s"$drop $name$s")
      val gone = intercept[IllegalArgumentException] { env.executeSql(s"$drop $name") }
      assert(gone.getMessage.contains("DROP FUNCTION"), s"#$i: ${gone.getMessage}")
      env.executeSql(s"$drop IF EXISTS $name")
    }
  }

  test("CTAS: SELECT/VALUES/WITH/TABLE bodies, random shapes (12 samples)") {
    spark.range(0, 7).selectExpr("id AS x").createOrReplaceTempView("fz_ctas_base")
    val bodies: Gen[(String, Long)] = Gen.oneOf(
      ("SELECT x, x * 2 AS y FROM VALUES (1), (2), (3) AS v(x)", 3L),
      ("VALUES (CAST(1 AS BIGINT)), (CAST(2 AS BIGINT))", 2L),
      ("WITH c AS (SELECT 1 AS x UNION ALL SELECT 2 AS x) SELECT * FROM c", 2L),
      ("TABLE fz_ctas_base", 7L))
    val gen = for {
      create <- kw("CREATE TABLE")
      ine <- Gen.oneOf("", "IF NOT EXISTS ")
      as <- kw("AS")
      (body, n) <- bodies
      s <- semi
    } yield (create, ine, as, body, n, s)
    samples(gen, 12).zipWithIndex.foreach { case ((create, ine, as, body, n, s), i) =>
      val name = s"fz_ctas_$i"
      val dir = s"/tmp/graft_fuzz18/ctas_$i"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      env.executeSql(s"DROP TABLE IF EXISTS $name")
      env.executeSql(
        s"$create $ine$name\nWITH ('connector' = 'filesystem', 'path' = '$dir',\n" +
          s"     'format' = 'parquet')\n$as $body$s")
      assert(env.executeSql(s"SELECT count(*) AS c FROM $name")
        .collect()(0).getLong(0) == n, s"sample #$i body: $body")
      assert(env.executeSql(s"SHOW CREATE TABLE $name").collect()(0).getString(0)
        .contains("'connector' = 'filesystem'"))
      env.executeSql(s"DROP TABLE $name")
      // the reference's validate() rejections, across body forms
      val tmpMsg = intercept[IllegalArgumentException] {
        env.executeSql(s"CREATE TEMPORARY TABLE $name AS $body")
      }
      assert(tmpMsg.getMessage.contains("temporary table"), s"#$i: ${tmpMsg.getMessage}")
      val colsMsg = intercept[IllegalArgumentException] {
        env.executeSql(s"CREATE TABLE $name (a INT) WITH ('connector'='blackhole') AS $body")
      }
      assert(colsMsg.getMessage.contains("explicit columns"), s"#$i: ${colsMsg.getMessage}")
    }
  }

  // ---- 3: near-miss statements carry graft-level provenance -----------

  test("near-miss statements: graft provenance, never a raw Spark parse error (fixed grid x case fuzz)") {
    // (statement template, required message fragment)
    val grid: Seq[(String, String)] = Seq(
      ("ALTER TABLE fz_nope COMPACT", "was not created via CREATE TABLE"),
      ("ALTER TABLE fz_nope ADD PARTITION (k='v')", "was not created via CREATE TABLE"),
      ("ALTER TABLE fz_nope DROP PARTITION (k='v')", "was not created via CREATE TABLE"),
      ("SHOW PARTITIONS fz_nope", "was not created via CREATE TABLE"),
      ("SHOW CREATE TABLE fz_nope", "was not created via CREATE TABLE"),
      ("SHOW CREATE VIEW fz_nope", "was not created via CREATE VIEW"),
      ("DESCRIBE DATABASE fz_nope", "does not exist"),
      ("DESCRIBE CATALOG fz_nope", "does not exist"),
      ("ALTER DATABASE fz_nope SET ('a'='b')", "does not exist"),
      ("USE CATALOG fz_nope", "does not exist"),
      ("ALTER VIEW fz_nope AS SELECT 1", "was not created via CREATE VIEW"),
      ("ALTER FUNCTION fz_nope AS 'x.Y'", "was not created via CREATE FUNCTION"),
      ("LOAD MODULE fz_nope", "no factory for module"),
      ("UNLOAD MODULE fz_nope", "is not loaded"),
      ("COMPILE PLAN '/tmp/fz_plan_miss.json' FOR SELECT 1", "INSERT and STATEMENT SET"),
      ("COMPILE AND EXECUTE PLAN '/tmp/fz_plan_miss.json' FOR SHOW TABLES",
        "INSERT and STATEMENT SET"),
      ("EXECUTE PLAN '/tmp/fz_no_such_plan.json'", "does not exist"),
      ("REMOVE JAR '/tmp/fz.jar'", "REMOVE JAR is not supported"))
    val caseGen = Gen.oneOf[String => String](identity[String] _,
      (s: String) => s.toLowerCase, (s: String) => s.replace(" ", "\n  "))
    grid.zipWithIndex.foreach { case ((stmt, frag), i) =>
      samples(caseGen, 3).foreach { f =>
        val sql = f(stmt)
        val e = intercept[IllegalArgumentException] { env.executeSql(sql) }
        assert(e.getMessage.contains(frag),
          s"grid #$i: '$sql' →\n${e.getMessage}\nexpected fragment: $frag")
      }
    }
    // broken partition specs on a REAL table: spec-level provenance
    val dir = "/tmp/graft_fuzz18/pspec"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    env.executeSql("DROP TABLE IF EXISTS fz_pt")
    env.executeSql(
      s"""CREATE TABLE fz_pt (id BIGINT, g STRING) PARTITIONED BY (g)
         |WITH ('connector' = 'filesystem', 'path' = '$dir', 'format' = 'parquet')""".stripMargin)
    Seq("ALTER TABLE fz_pt ADD PARTITION ()",
        "ALTER TABLE fz_pt ADD PARTITION (nope='x')",
        "ALTER TABLE fz_pt ADD PARTITION (g='a', g='b')",
        "ALTER TABLE fz_pt DROP PARTITION (g='missing')").foreach { sql =>
      val e = intercept[IllegalArgumentException] { env.executeSql(sql) }
      assert(e.getMessage.contains("PARTITION"), s"'$sql' → ${e.getMessage}")
    }
  }

  // ---- r19 directive #4: post-fuzz statement classes -------------------
  // The r17 fuzz commit predates the FLIP-162 EXPLAIN details, the
  // interactive statement-set mode, bare EXECUTE, COMPILE/EXECUTE PLAN
  // and the SHOW USER/FROM/LIKE variants — generator coverage follows.

  test("EXPLAIN detail permutations: every subset/order plans, duplicates rejected (40 samples)") {
    val dir = "/tmp/graft_fuzz19/explain"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    env.executeSql("DROP TABLE IF EXISTS fz_ex_t")
    env.executeSql(
      s"""CREATE TABLE fz_ex_t (x BIGINT) WITH ('connector' = 'filesystem',
         |  'path' = '$dir/t', 'format' = 'parquet')""".stripMargin)
    val allDetails = Seq("ESTIMATED_COST", "CHANGELOG_MODE", "JSON_EXECUTION_PLAN")
    val detailSubset: Gen[Seq[String]] = for {
      n <- Gen.choose(0, 3)
      ds <- Gen.pick(n, allDetails)
      shuffled <- Gen.const(ds.toSeq.reverse) // order varies with n
      cased <- Gen.oneOf(identity[String] _, (s: String) => s.toLowerCase)
    } yield shuffled.map(cased)
    val bodies: Gen[(String, Int)] = Gen.oneOf(
      ("SELECT 1 AS one", 0),
      ("INSERT INTO fz_ex_t SELECT CAST(5 AS BIGINT)", 0),
      ("STATEMENT SET BEGIN INSERT INTO fz_ex_t SELECT CAST(1 AS BIGINT); " +
        "INSERT INTO fz_ex_t SELECT CAST(2 AS BIGINT); END", 2))
    val gen = for {
      ex <- kw("EXPLAIN")
      ds <- detailSubset
      (body, sections) <- bodies
      s <- semi
    } yield (ex, ds, body, sections, s)
    samples(gen, 40).zipWithIndex.foreach { case ((ex, ds, body, sections, s), i) =>
      val sql = s"$ex ${if (ds.isEmpty) "" else ds.mkString(", ") + " "}$body$s"
      val txt = env.executeSql(sql).collect()(0).getString(0)
      assert(txt.nonEmpty, s"#$i: $sql")
      // each requested detail contributes its section, none executes
      if (ds.exists(_.equalsIgnoreCase("CHANGELOG_MODE")))
        assert(txt.contains("== Changelog Mode =="), s"#$i: $sql")
      if (ds.exists(_.equalsIgnoreCase("JSON_EXECUTION_PLAN")))
        assert(txt.contains("== Physical Execution Plan (JSON) =="), s"#$i: $sql")
      if (sections > 0)
        (1 to sections).foreach(k =>
          assert(txt.contains(s"== Statement $k =="), s"#$i: $sql"))
      assert(!new java.io.File(s"$dir/t").exists,
        s"#$i: EXPLAIN must never execute the insert ($sql)")
    }
    // duplicate details rejected with the parser's exact message, at
    // any position and any case mix
    val dupGen = for {
      d <- Gen.oneOf(allDetails)
      other <- Gen.oneOf(allDetails)
      mid <- Gen.oneOf(true, false)
      lower <- Gen.oneOf(true, false)
    } yield (d, if (lower) d.toLowerCase else d, other, mid)
    samples(dupGen, 20).zipWithIndex.foreach { case ((d, second, other, mid), i) =>
      val ds = if (mid) Seq(d, other, second) else Seq(d, second, other)
      // `other` may equal d: then the list duplicates regardless — fine
      val e = intercept[IllegalArgumentException] {
        env.executeSql(s"EXPLAIN ${ds.mkString(", ")} SELECT 1")
      }
      assert(e.getMessage.contains("Duplicate EXPLAIN DETAIL is not allowed."),
        s"dup #$i (${ds.mkString(",")}): ${e.getMessage}")
    }
  }

  test("statement-set interleavings: buffering, illegal members, END discipline (25 samples)") {
    val dir = "/tmp/graft_fuzz19/stmtset"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    // a dedicated env so a failing sample can never strand the SHARED
    // env in set mode
    val env2 = graft.sql.SqlEnv(spark)
    env2.executeSql("DROP TABLE IF EXISTS fz_ss_t")
    env2.executeSql(
      s"""CREATE TABLE fz_ss_t (x BIGINT) WITH ('connector' = 'filesystem',
         |  'path' = '$dir/t', 'format' = 'parquet')""".stripMargin)
    // read the sink DIRECTLY: a SELECT through executeSql would itself
    // be rejected mid-set (the very discipline under test)
    def count(): Long =
      try spark.read.parquet(s"$dir/t").count()
      catch { case _: Exception => 0L } // unmaterialized yet
    val gen = for {
      begin <- kw("BEGIN STATEMENT SET")
      end <- kw("END")
      k <- Gen.choose(1, 3)
      illegal <- Gen.option(Gen.oneOf(
        "SELECT 17", "SHOW TABLES", "DROP TABLE fz_ss_t"))
      s <- semi
    } yield (begin, end, k, illegal, s)
    var expected = 0L
    samples(gen, 25).zipWithIndex.foreach { case ((begin, end, k, illegal, s), i) =>
      val before = count()
      assert(before == expected, s"#$i: stale rows before sample")
      env2.executeSql(s"$begin$s")
      (1 to k).foreach(v =>
        env2.executeSql(s"INSERT INTO fz_ss_t SELECT CAST($v AS BIGINT)"))
      assert(count() == before, s"#$i: nothing may be written before END")
      illegal.foreach { bad =>
        val e = intercept[IllegalArgumentException] { env2.executeSql(bad) }
        assert(e.getMessage.contains("Only INSERT statement is allowed in Statement Set."),
          s"#$i: ${e.getMessage}")
        // the reference CLI stays in set mode after a rejected member
        env2.executeSql(s"INSERT INTO fz_ss_t SELECT CAST(99 AS BIGINT)")
      }
      env2.executeSql(s"$end$s")
      expected = before + k + (if (illegal.isDefined) 1 else 0)
      assert(count() == expected, s"#$i: END must submit the full buffer")
      // END with no open set: the CLI's exact guidance
      val loose = intercept[IllegalArgumentException] { env2.executeSql(s"$end$s") }
      assert(loose.getMessage.contains("No Statement Set to submit"), s"#$i")
    }
  }

  test("COMPILE/EXECUTE PLAN near-misses: overwrite guard, bad envelopes, version gate (15 samples)") {
    val dir = "/tmp/graft_fuzz19/plans"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    new java.io.File(dir).mkdirs()
    env.executeSql("DROP TABLE IF EXISTS fz_pl_t")
    env.executeSql(
      s"""CREATE TABLE fz_pl_t (x BIGINT) WITH ('connector' = 'filesystem',
         |  'path' = '$dir/t', 'format' = 'parquet')""".stripMargin)
    val ins = "INSERT INTO fz_pl_t SELECT CAST(1 AS BIGINT)"
    val gen = for {
      compile <- kw("COMPILE PLAN")
      execute <- kw("EXECUTE PLAN")
      ine <- kw("IF NOT EXISTS")
      s <- semi
    } yield (compile, execute, ine, s)
    samples(gen, 15).zipWithIndex.foreach { case ((compile, execute, ine, s), i) =>
      val plan = s"$dir/p_$i.json"
      env.executeSql(s"$compile '$plan' FOR $ins$s")
      assert(new java.io.File(plan).isFile, s"#$i")
      // overwrite guard fires regardless of statement case/shape
      val over = intercept[IllegalArgumentException] {
        env.executeSql(s"$compile '$plan' FOR $ins")
      }
      assert(over.getMessage.contains("Cannot overwrite the plan file"), s"#$i")
      env.executeSql(s"$compile '$plan' $ine FOR $ins") // silent skip
      // non-JSON garbage and a future version both carry provenance
      val garbled = s"$dir/garbled_$i.json"
      java.nio.file.Files.write(java.nio.file.Paths.get(garbled),
        s"not json at all #$i".getBytes)
      val bad = intercept[IllegalArgumentException] {
        env.executeSql(s"$execute '$garbled'")
      }
      assert(bad.getMessage.contains("not a graft plan file"), s"#$i: ${bad.getMessage}")
      val future = s"$dir/future_$i.json"
      java.nio.file.Files.write(java.nio.file.Paths.get(future),
        s"""{"graftPlanVersion": 99, "statement": "$ins", "tables": {}}""".getBytes)
      val ver = intercept[IllegalArgumentException] {
        env.executeSql(s"$execute '$future'")
      }
      assert(ver.getMessage.contains("unsupported plan version"), s"#$i: ${ver.getMessage}")
    }
    // r21 review finding: the plan file is user-editable, and the
    // function envelope's values are interpolated into a CREATE
    // FUNCTION statement — a crafted className (or name) must be
    // REJECTED with graft provenance, never smuggled through the
    // quotes into executeSql
    val malicious = s"$dir/malicious_fn.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(malicious),
      ("""{"graftPlanVersion": 3, "statement": "SELECT 1", "tables": {},""" +
        """ "views": [], "functions": [{"name": "evil",""" +
        """ "className": "x'; DROP TABLE fz_pl_t; --"}]}""").getBytes)
    val inj = intercept[IllegalArgumentException] {
      env.executeSql(s"EXECUTE PLAN '$malicious'")
    }
    assert(inj.getMessage.contains("graft EXECUTE PLAN") &&
      inj.getMessage.contains("invalid function class"), inj.getMessage)
    val badName = s"$dir/malicious_fn_name.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(badName),
      ("""{"graftPlanVersion": 3, "statement": "SELECT 1", "tables": {},""" +
        """ "views": [], "functions": [{"name": "a b; --",""" +
        """ "className": "graft.TestUdfUpper"}]}""").getBytes)
    val injN = intercept[IllegalArgumentException] {
      env.executeSql(s"EXECUTE PLAN '$badName'")
    }
    assert(injN.getMessage.contains("invalid function name"), injN.getMessage)
    // a well-shaped dotted class name still restores fine
    val good = s"$dir/good_fn.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(good),
      ("""{"graftPlanVersion": 3, "statement": "SELECT 1", "tables": {},""" +
        """ "views": [], "functions": [{"name": "fz_pl_ok",""" +
        """ "className": "graft.TestUdfUpper"}]}""").getBytes)
    env.executeSql(s"EXECUTE PLAN '$good'")
    env.executeSql("DROP FUNCTION IF EXISTS fz_pl_ok")
  }

  test("SHOW TABLES LIKE / NOT LIKE: SQL-LIKE semantics against a reference predicate (60 samples)") {
    val names = Seq("fzs19a", "fzs19ab", "fzs19abc", "fzs19xyz", "fzs19x_z")
    names.foreach { n =>
      env.executeSql(s"DROP TABLE IF EXISTS $n")
      env.executeSql(s"CREATE TABLE $n (x INT) WITH ('connector' = 'blackhole')")
    }
    // independent LIKE implementation: % = any run, _ = one char
    def likeRef(pat: String, s: String): Boolean =
      ("(?s)^" + pat.flatMap {
        case '%' => ".*"
        case '_' => "."
        case c => java.util.regex.Pattern.quote(c.toString)
      } + "$").r.findFirstIn(s).isDefined
    val patGen = for {
      suffix <- Gen.listOfN(3, Gen.oneOf("a", "b", "c", "x", "%", "_", ""))
      not <- Gen.oneOf("", "NOT ")
      like <- kw("LIKE")
      show <- kw("SHOW TABLES")
    } yield (s"fzs19${suffix.mkString}", not, like, show)
    samples(patGen, 60).zipWithIndex.foreach { case ((pat, not, like, show), i) =>
      val got = env.executeSql(s"$show $not$like '$pat'").collect()
        .map(_.getString(0)).toSet.intersect(names.toSet)
      val want = names.filter(n => likeRef(pat, n) != (not == "NOT ")).toSet
      assert(got == want, s"#$i: pattern '$pat' not=${not.nonEmpty} got=$got want=$want")
    }
    // SHOW USER FUNCTIONS lists exactly the CREATE FUNCTION'd names
    env.executeSql("DROP FUNCTION IF EXISTS fz_suf19")
    val withoutFn = env.executeSql("SHOW USER FUNCTIONS").collect().map(_.getString(0)).toSet
    assert(!withoutFn.contains("fz_suf19"))
    env.executeSql("CREATE FUNCTION fz_suf19 AS 'graft.TestUdfUpper'")
    val withFn = env.executeSql("SHOW USER FUNCTIONS").collect().map(_.getString(0)).toSet
    assert(withFn.contains("fz_suf19"), s"got $withFn")
    env.executeSql("DROP FUNCTION fz_suf19")
    names.foreach(n => env.executeSql(s"DROP TABLE $n"))
  }

  test("plan-closure scan: literal/comment decoys never ride along, prefix-overlapping and keyword-prefixed names resolve by word boundary (16 samples)") {
    val dir = "/tmp/graft_fuzz20/closure"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    // decoy contexts: the decoy table's name appears ONLY here — inside
    // a string literal (with '' escapes), a -- line comment, or a
    // /* block */ comment — and must NOT enter the envelope
    val decoyCtx: Gen[String => String] = Gen.oneOf(
      (d: String) => s"'$d went here' AS tag",
      (d: String) => s"'it''s $d quoted' AS tag",
      (d: String) => s"'x' AS tag -- reading from $d\n",
      (d: String) => s"'x' AS tag /* $d and again $d */",
      (d: String) => s"'x' AS tag /* multi\n line $d */",
      // r21 review finding: a backslash-escaped quote inside the
      // literal — the dialect Spark actually parses — must not
      // misalign the scanner (the old tracker closed the literal at
      // \' and then blanked the REAL references that followed,
      // producing an envelope EXECUTE PLAN could not restore)
      (d: String) => s"'$d is\\'nt here' AS tag")
    // view-name shapes: keyword-prefixed and underscore-adjacent names
    // stress the \b word-boundary matching
    val nameShape: Gen[(String, String)] = Gen.oneOf(
      ("v", "v2"), ("select_v", "select_v2"), ("values_x", "values_x_y"),
      ("insert_into", "insert_into2"))
    val gen = for { ctx <- decoyCtx; ns <- nameShape } yield (ctx, ns)
    samples(gen, 16).zipWithIndex.foreach { case ((ctx, (vaSuf, vbSuf)), i) =>
      val (src, sink, decoy) = (s"fzc${i}_src", s"fzc${i}_sink", s"fzc${i}_dec")
      val (va, vb) = (s"fzc${i}_$vaSuf", s"fzc${i}_$vbSuf")
      Seq(src, sink, decoy).foreach(t => env.executeSql(s"DROP TABLE IF EXISTS $t"))
      Seq(va, vb).foreach(v => env.executeSql(s"DROP VIEW IF EXISTS $v"))
      Seq(src, decoy).foreach(t => env.executeSql(
        s"""CREATE TABLE $t (k BIGINT, nm STRING)
           |WITH ('connector' = 'filesystem', 'path' = '$dir/${t}',
           |      'format' = 'parquet')""".stripMargin))
      env.executeSql(
        s"""CREATE TABLE $sink (k BIGINT, nm STRING, tag STRING)
           |WITH ('connector' = 'filesystem', 'path' = '$dir/$sink',
           |      'format' = 'parquet')""".stripMargin)
      env.executeSql(s"INSERT INTO $src VALUES (1, 'a'), (2, 'b')")
      env.executeSql(s"CREATE VIEW $va AS SELECT k, upper(nm) AS nm FROM $src")
      // vb's body mentions va — vb itself is NOT referenced by the
      // statement below, so neither may enter the envelope (forward
      // closure only, and \b must not let '$va' capture via '$vb')
      env.executeSql(s"CREATE VIEW $vb AS SELECT k FROM $va WHERE k > 1")
      val plan = s"$dir/p_$i.json"
      env.executeSql(
        s"COMPILE PLAN '$plan' FOR INSERT INTO $sink SELECT k, nm, ${ctx(decoy)} FROM $va")
      val (_, tables, views, _) = graft.sql.PlanFiles.read(new java.io.File(plan))
      assert(tables.keySet == Set(src, sink),
        s"#$i: decoy/overspill in tables: ${tables.keySet} (decoy=$decoy)")
      assert(views.map(_._1) == Seq(va),
        s"#$i: view closure must be exactly [$va]: ${views.map(_._1)}")
      // the compiled statement still EXECUTES with the adversarial text
      env.executeSql(s"EXECUTE PLAN '$plan'")
      assert(env.executeSql(s"SELECT count(*) AS c FROM $sink")
        .collect()(0).getLong(0) == 2, s"#$i")
      Seq(vb, va).foreach(v => env.executeSql(s"DROP VIEW $v"))
      Seq(src, sink, decoy).foreach(t => env.executeSql(s"DROP TABLE $t"))
    }
    // deterministic pin of the backslash-escape case (not left to the
    // sampler): the decoy rides inside a \'-escaped literal and the
    // REAL table reference after the literal must stay in the closure
    locally {
      val (src, sink, decoy) = ("fzcbs_src", "fzcbs_sink", "fzcbs_dec")
      Seq(src, sink, decoy).foreach(t => env.executeSql(s"DROP TABLE IF EXISTS $t"))
      Seq(src, decoy).foreach(t => env.executeSql(
        s"""CREATE TABLE $t (k BIGINT) WITH ('connector' = 'filesystem',
           |  'path' = '$dir/$t', 'format' = 'parquet')""".stripMargin))
      env.executeSql(
        s"""CREATE TABLE $sink (k BIGINT, tag STRING) WITH ('connector' = 'filesystem',
           |  'path' = '$dir/$sink', 'format' = 'parquet')""".stripMargin)
      env.executeSql(s"INSERT INTO $src VALUES (1), (2)")
      val plan = s"$dir/p_backslash.json"
      env.executeSql(s"COMPILE PLAN '$plan' FOR INSERT INTO $sink " +
        s"SELECT k, '$decoy is\\'nt here' AS tag FROM $src")
      val (_, tables, _, _) = graft.sql.PlanFiles.read(new java.io.File(plan))
      assert(tables.keySet == Set(src, sink),
        s"backslash-escaped literal misaligned the closure scan: ${tables.keySet}")
      env.executeSql(s"EXECUTE PLAN '$plan'")
      Seq(src, sink, decoy).foreach(t => env.executeSql(s"DROP TABLE $t"))
    }
  }

  // ---- 4: statement keywords inside literals are not intercepted ------

  test("preservation: statement text inside string literals passes through to Spark (60 samples)") {
    val inner: Gen[String] = Gen.oneOf(
      "CREATE DATABASE fz_x", "DROP CATALOG fz_x", "ALTER TABLE t COMPACT",
      "ALTER TABLE t ADD PARTITION (k=1)", "SHOW PARTITIONS t",
      "EXECUTE PLAN /x.json", "LOAD MODULE hive", "USE MODULES core",
      "CREATE FUNCTION f AS x.Y", "ADD JAR /tmp/x.jar",
      "COMPILE PLAN f FOR INSERT", "SHOW CURRENT CATALOG")
    val gen = for {
      lit <- inner
      alias <- Gen.oneOf("s", "txt", "v")
      extra <- Gen.choose(1, 99)
    } yield (lit, alias, extra)
    samples(gen, 60).zipWithIndex.foreach { case ((lit, alias, extra), i) =>
      val row = env.executeSql(s"SELECT '$lit' AS $alias, $extra AS n").collect()(0)
      assert(row.getString(0) == lit && row.getInt(1) == extra,
        s"sample #$i: literal '$lit' must survive dispatch untouched")
    }
  }
}
