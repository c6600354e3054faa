package graft.tools

import org.apache.spark.sql.SparkSession

/** Dialect EXPLAIN from the command line: runs each `;`-separated
  * statement of args(0) through a fresh [[graft.sql.SqlEnv]] (testdata
  * registered from args(1), default sf0.001) and prints every result —
  * so plan audits of DIALECT paths (INSERT sources, views, EXPLAIN
  * details) are reproducible without writing a throwaway main.
  *
  * Example:
  * {{{
  * sbt 'runMain graft.tools.SqlPlan "CREATE TABLE t (...) WITH (...);
  *   EXPLAIN INSERT INTO t SELECT ..."'
  * }}}
  */
object SqlPlan {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SqlPlan \"<stmt>[; <stmt>...]\" [sfDir]")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.timeType.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val env = graft.sql.SqlEnv(spark).registerTestdata(sfDir)
    graft.sql.Ddl.splitTopLevelSemi(args(0)).foreach { stmt =>
      println(s"\n===== $stmt =====")
      env.executeSql(stmt).collect().foreach(r => println(r.mkString("\n")))
    }
    spark.stop()
  }
}
