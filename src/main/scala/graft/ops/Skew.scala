package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys — the manual fallback when AQE's
  * skew-join split (enabled by default in our sessions) isn't enough,
  * e.g. a single key holding >10% of a 100 TB fact table.
  *
  * `saltedJoin` spreads each fact-side key over `buckets` salted
  * sub-keys and replicates the dim side once per bucket: the fact
  * shuffle becomes uniform at the cost of dim×buckets replication —
  * the standard trade for small-dim/skewed-fact joins.
  */
object Skew {

  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 buckets: Int, joinType: String = "inner"): DataFrame = {
    require(buckets > 0)
    // fact rows get a deterministic-per-row salt so reruns are stable
    val salted = fact.withColumn("__salt",
      pmod(hash(fact.columns.map(col).toIndexedSeq: _*), lit(buckets)))
    val replicated = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
