package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** SQL-text operator surfaces added in round 5:
  *
  *  - ScriptTransform — the reference's Hive-compatible script operator
  *    (flink-table/flink-table-planner/.../plan/nodes/exec/batch/
  *    BatchExecScriptTransform.java), which pipes rows through an
  *    external process. Spark's sql/core implements the same `SELECT
  *    TRANSFORM ... USING '<cmd>'` clause natively in no-serde mode
  *    (tab-delimited text in/out, one process per task) — no Hive
  *    metastore or SerDe classes involved, so it works in an in-memory
  *    catalog session.
  *
  *  - Legacy group windows — Flink 1.16's pre-TVF windowed-aggregate
  *    SQL (`GROUP BY TUMBLE/HOP/SESSION(ts, INTERVAL ...)` with
  *    TUMBLE_START/SESSION_END/... auxiliaries; planned by
  *    StreamExecGroupWindowAggregate, runtime RT/window/
  *    WindowOperator.java:97). [[graft.sql.SqlEnv]] rewrites the text
  *    onto Spark's window()/session_window() grouping — one physical
  *    plan shared with the TVF and DataFrame paths.
  */
object SqlSurface {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- ScriptTransform: pipe rows through an external process -------
    // `tr A-Z a-z` lowercases the priority column; the aggregate on top
    // proves every row made the round trip (sum over parsed-back keys).
    // Scale: one `tr` process per partition, rows streamed through
    // stdin/stdout — the reference's per-subtask process model; no
    // driver involvement, no shuffle beyond the final groupBy.
    "q80_script_transform" -> ((s, dir) => {
      Tables.load(s, dir, "orders").createOrReplaceTempView("orders_q80")
      s.sql("""
        SELECT CAST(k AS BIGINT) AS o_orderkey, pri AS lower_priority
        FROM (
          SELECT TRANSFORM(o_orderkey, o_orderpriority)
            ROW FORMAT DELIMITED FIELDS TERMINATED BY '\t'
            USING 'tr A-Z a-z'
            AS (k, pri)
            ROW FORMAT DELIMITED FIELDS TERMINATED BY '\t'
          FROM orders_q80
        )
      """).groupBy(col("lower_priority"))
        .agg(count(lit(1)).as("n"),
             sum(col("o_orderkey")).as("sum_key"))
    }),

    // ---- Legacy group-window SQL: GROUP BY SESSION(...) ---------------
    // The q22 session-window shape expressed in the reference's legacy
    // SQL dialect, executed through SqlEnv's rewrite; the oracle is the
    // same lag/gap sessionization DuckDB replay q22 uses.
    "q81_legacy_session_sql" -> ((s, dir) => {
      val env = graft.sql.SqlEnv(s)
      Tables.load(s, dir, "events").createOrReplaceTempView("events_q81")
      env.executeSql("""
        SELECT user_id,
          SESSION_START(ts, INTERVAL '30' MINUTE) AS session_start,
          SESSION_END(ts, INTERVAL '30' MINUTE) AS session_end,
          COUNT(1) AS n_events,
          CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        FROM events_q81
        GROUP BY SESSION(ts, INTERVAL '30' MINUTE), user_id
      """)
    })
  )

  def oracles: Map[String, String] = Map(
    "q80_script_transform" ->
      """SELECT lower(o_orderpriority) AS lower_priority,
        |  count(*) AS n,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sum_key
        |FROM orders GROUP BY 1""".stripMargin,

    "q81_legacy_session_sql" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN LAG(ts) OVER w IS NULL
        |           OR ts - LAG(ts) OVER w >= INTERVAL '30 minutes'
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), sessioned AS (
        |  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged
        |)
        |SELECT user_id,
        |  CAST(MIN(ts) AS TIMESTAMP) AS session_start,
        |  CAST(MAX(ts) + INTERVAL '30 minutes' AS TIMESTAMP) AS session_end,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |FROM sessioned
        |GROUP BY user_id, sid""".stripMargin
  )
}
