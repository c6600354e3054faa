package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  /** Parse+plan+execute a SQL statement (query or command). */
  def executeSql(sql: String): DataFrame = spark.sql(sql)

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
