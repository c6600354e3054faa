package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory (one entry per implemented
  * operator from SURVEY.md §2); `oracleSql` holds the DuckDB-dialect
  * equivalent for the driver's correctness gate. Query bodies live in
  * `graft.queries.*` modules, grouped by the part of the surface they
  * cover.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Events.queries ++ TextOps.queries ++
      VectorOps.queries ++ NearDup.queries ++ MultiModal.queries ++ Functions2.queries ++ Relational2.queries ++ Collections.queries ++ Conversions.queries ++ Functions3.queries ++ TpcH.queries ++ ScaleOps.queries ++ TextOps2.queries ++ TextOps3.queries ++ SqlSurface.queries ++ TpcDs.queries ++ TpcDs2.queries

  def oracleSql: Map[String, String] =
    Relational.oracles ++ Events.oracles ++ TextOps.oracles ++
      VectorOps.oracles ++ NearDup.oracles ++ MultiModal.oracles ++ Functions2.oracles ++ Relational2.oracles ++ Collections.oracles ++ Conversions.oracles ++ Functions3.oracles ++ TpcH.oracles ++ ScaleOps.oracles ++ TextOps2.oracles ++ TextOps3.oracles ++ SqlSurface.oracles ++ TpcDs.oracles ++ TpcDs2.oracles
}
