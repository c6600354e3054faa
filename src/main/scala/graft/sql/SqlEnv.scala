package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}

/** Thin `TableEnvironment`-style facade (reference:
  * flink-table/flink-table-api-java/.../api/internal/TableEnvironmentImpl.java:722
  * `executeSql`, `sqlQuery` :702) over a SparkSession.
  *
  * A user of the reference writes:
  * {{{
  *   val env = TableEnvironment.create(settings)
  *   env.executeSql("CREATE TABLE t (...) WITH ('connector'='filesystem', ...)")
  *   val result = env.executeSql("SELECT ... FROM t")
  * }}}
  * and here writes:
  * {{{
  *   val env = SqlEnv(spark)
  *   env.registerParquet("t", "/data/t.parquet")
  *   val result = env.executeSql("SELECT ... FROM t")
  * }}}
  * The SQL dialect is Spark SQL (no custom parser — SURVEY §7.1);
  * graft's extra functions (minhash/simhash/hamming64/cosine_sim/…)
  * are registered on construction so they work in SQL text.
  */
class SqlEnv private (val spark: SparkSession) {

  graft.functions.functions.register(spark)

  /** Parse+plan+execute a SQL statement (query or command). Three
    * reference SQL surfaces Spark lacks are accepted before Spark
    * parses the statement:
    *  - Flink DDL: `CREATE TABLE ... WITH ('connector'=...)` and
    *    `INSERT INTO/OVERWRITE <created table> SELECT ...` via [[Ddl]];
    *  - window-TVF text `TUMBLE/HOP/CUMULATE(TABLE t, DESCRIPTOR(ts),
    *    INTERVAL ...)` (SqlTumbleTableFunction et al.) onto
    *    [[graft.streaming.Windows]];
    *  - `MATCH_RECOGNIZE (...)` (CommonExecMatch.java:82) onto
    *    [[graft.streaming.Cep]] via [[MatchRecognizeSql]].
    */
  def executeSql(sql: String): DataFrame = {
    if (Ddl.isCreateTable(sql)) {
      val d = Ddl.parseCreateTable(sql)
      tableDefs.put(d.name, d)
      Ddl.executeCreate(spark, d) // false = deferred until first INSERT
      return spark.emptyDataFrame
    }
    // only route INSERTs whose target came from OUR CREATE TABLE;
    // anything else stays Spark-native
    if (Ddl.insertTarget(sql).exists(tableDefs.containsKey))
      return Ddl.executeInsert(spark, asScala.toMap, sql, executeSql)
    val afterTj = TemporalJoinSql.rewrite(spark, asScala.toMap, sql,
      () => s"__graft_tj_${viewCounter.incrementAndGet()}")
    val afterMr = MatchRecognizeSql.rewrite(spark, afterTj,
      () => s"__graft_mr_${viewCounter.incrementAndGet()}")
    spark.sql(rewriteLegacyGroupWindows(rewriteWindowTvfs(afterMr)))
  }

  /** CREATE TABLE definitions by name (drives INSERT routing). */
  private val tableDefs =
    new java.util.concurrent.ConcurrentHashMap[String, Ddl.TableDef]()
  private def asScala = { import scala.jdk.CollectionConverters._; tableDefs.asScala }

  // ---- window TVF text support ----------------------------------------

  // TUMBLE(TABLE t, DESCRIPTOR(c), INTERVAL '15' MINUTE)
  // HOP(TABLE t, DESCRIPTOR(c), INTERVAL slide, INTERVAL size)
  // CUMULATE(TABLE t, DESCRIPTOR(c), INTERVAL step, INTERVAL max)
  // Intervals carry no parentheses, so `[^()]+` safely spans the tail.
  private val tvfRe =
    """(?i)\b(TUMBLE|HOP|CUMULATE)\s*\(\s*TABLE\s+([\w.]+)\s*,\s*DESCRIPTOR\s*\(\s*(\w+)\s*\)\s*,([^()]+)\)""".r
  private val intervalRe =
    """(?i)INTERVAL\s*'(\d+)'\s*(SECOND|MINUTE|HOUR|DAY)S?""".r
  private val viewCounter = new java.util.concurrent.atomic.AtomicInteger()

  private def intervalSec(text: String): Long = text.trim match {
    case intervalRe(n, unit) => n.toLong * (unit.toUpperCase match {
      case "SECOND" => 1L
      case "MINUTE" => 60L
      case "HOUR" => 3600L
      case "DAY" => 86400L
    })
    case other => throw new IllegalArgumentException(
      s"window TVF: cannot parse interval '$other' (expected INTERVAL '<n>' <unit>)")
  }

  /** Replace each window-TVF call with a temp view carrying the
    * reference's output columns: every input column plus window_start,
    * window_end, window_time (= end − 1ms, the event-time attribute).
    * The view body is the corresponding [[graft.streaming.Windows]]
    * assignment, so the SQL-text path and the DataFrame path share one
    * implementation — and one physical plan.
    */
  private[sql] def rewriteWindowTvfs(sql: String): String =
    tvfRe.replaceAllIn(sql, m => {
      val fn = m.group(1).toUpperCase
      val table = m.group(2)
      val ts = col(m.group(3))
      val ivals = m.group(4).split(",").map(intervalSec)
      val base = spark.table(table)
      val withWin = fn match {
        case "TUMBLE" =>
          require(ivals.length == 1, "TUMBLE(TABLE t, DESCRIPTOR(ts), size)")
          base.withColumn("window", graft.streaming.Windows.tumble(ts, s"${ivals(0)} seconds"))
        case "HOP" => // Flink arg order: slide, then size
          require(ivals.length == 2, "HOP(TABLE t, DESCRIPTOR(ts), slide, size)")
          base.withColumn("window", graft.streaming.Windows.hop(ts, s"${ivals(1)} seconds", s"${ivals(0)} seconds"))
        case "CUMULATE" => // step, then max size
          require(ivals.length == 2, "CUMULATE(TABLE t, DESCRIPTOR(ts), step, maxSize)")
          graft.streaming.Windows.cumulate(base, ts, ivals(0), ivals(1))
      }
      val out = withWin
        .withColumn("window_start", col("window.start"))
        .withColumn("window_end", col("window.end"))
        .withColumn("window_time", col("window.end") - expr("INTERVAL 1 MILLISECOND"))
        .drop("window")
      val view = s"__graft_tvf_${viewCounter.incrementAndGet()}"
      out.createOrReplaceTempView(view)
      scala.util.matching.Regex.quoteReplacement(view)
    })

  // ---- legacy group-window text support --------------------------------

  // Flink 1.16's pre-TVF window syntax (FlinkSqlOperatorTable's
  // TUMBLE/HOP/SESSION group functions and their _START/_END/_ROWTIME
  // auxiliaries; planned by StreamExecGroupWindowAggregate):
  //   SELECT k, SESSION_START(ts, INTERVAL '30' MINUTE), COUNT(*)
  //   FROM t GROUP BY SESSION(ts, INTERVAL '30' MINUTE), k
  // The auxiliaries repeat the assigner's arguments, so they rewrite to
  // plain field accesses on the grouped struct column: Spark names the
  // grouped column `window` for window() and `session_window` for
  // session_window(). _ROWTIME is the window's event-time attribute
  // (end − 1ms), like the TVF rewrite's window_time.
  private val legacyAuxRe =
    """(?i)\b(TUMBLE|HOP|SESSION)_(START|END|ROWTIME)\s*\([^()]*\)""".r
  // First argument must be a bare column (the TVF form's `TABLE t,` and
  // Spark's own window()/session_window() never match this shape).
  private val legacyGroupRe =
    """(?i)\b(TUMBLE|HOP|SESSION)\s*\(\s*(\w+)\s*,([^()]+)\)""".r

  private[sql] def rewriteLegacyGroupWindows(sql: String): String = {
    val aux = legacyAuxRe.replaceAllIn(sql, m => {
      val structCol =
        if (m.group(1).equalsIgnoreCase("SESSION")) "session_window" else "window"
      m.group(2).toUpperCase match {
        case "START" => s"$structCol.start"
        case "END" => s"$structCol.end"
        case "ROWTIME" => s"($structCol.end - INTERVAL 1 MILLISECOND)"
      }
    })
    legacyGroupRe.replaceAllIn(aux, m => {
      val ts = m.group(2)
      val ivals = m.group(3).split(",").map(intervalSec)
      scala.util.matching.Regex.quoteReplacement(m.group(1).toUpperCase match {
        case "TUMBLE" =>
          require(ivals.length == 1, "TUMBLE(ts, size)")
          s"window($ts, '${ivals(0)} seconds')"
        case "HOP" => // Flink legacy arg order: slide, then size
          require(ivals.length == 2, "HOP(ts, slide, size)")
          s"window($ts, '${ivals(1)} seconds', '${ivals(0)} seconds')"
        case "SESSION" =>
          require(ivals.length == 1, "SESSION(ts, gap)")
          s"session_window($ts, '${ivals(0)} seconds')"
      })
    })
  }

  /** Register a parquet-backed table under `name`. */
  def registerParquet(name: String, path: String): SqlEnv = {
    spark.read.parquet(path).createOrReplaceTempView(name)
    this
  }

  /** Register a DataFrame as a temporary view. */
  def registerTable(name: String, df: DataFrame): SqlEnv = {
    df.createOrReplaceTempView(name)
    this
  }

  /** Register all driver testdata tables from a scale-factor dir. */
  def registerTestdata(dir: String): SqlEnv = {
    graft.Tables.registerAll(spark, dir)
    this
  }
}

object SqlEnv {
  def apply(spark: SparkSession): SqlEnv = new SqlEnv(spark)
}
