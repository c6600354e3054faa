package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** nprobe → recall@3 curve for the refined IVF-PQ search, plus the
  * probe-coverage ceiling (fraction of exact top-3 neighbors whose
  * index cell is among the query's probed cells — what no amount of
  * within-cell reranking can exceed). This is the measurement behind
  * [[graft.ops.Ivf.defaultNprobe]]'s constants.
  * Run: sbt "runMain graft.tools.NprobeSweep [sfDir]"
  */
object NprobeSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.Tables.load(spark, sfDir, "embeddings").cache()
    val pred = col("vec_id") % 50 === 0
    val q = e.filter(pred).select(col("vec_id").as("query_id"),
      col("embedding").cast("array<float>").as("q"))
    val c = e.select(col("vec_id").as("cand_id"),
      col("embedding").cast("array<float>").as("c"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("d"), col("cand_id"))
    val exact = q.join(c, col("query_id") =!= col("cand_id"))
      .withColumn("d", aggregate(zip_with(col("q"), col("c"),
        (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
        lit(0.0), (a, x) => a + x))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select(col("query_id"), col("cand_id")).cache()
    val nExact = exact.count()
    val cells = math.max(4, math.ceil(math.sqrt(e.count().toDouble)).toInt)
    println(s"[sweep] n=${e.count()} cells=$cells queries=${q.count()}")
    val idx = graft.ops.IvfPq.build(e, "vec_id", "embedding",
      cells = cells, m = 16, k = 64, iters = 2)
    idx.codes.cache()
    for (np <- Seq(2, 4, 8, 16, 32).filter(_ <= cells)) {
      // coverage ceiling: neighbor's index cell ∈ query's np probed cells
      val probes = graft.ops.Ivf.assign(e.filter(pred), "vec_id", "embedding",
          idx.cents, np)
        .select(col("vec_id").as("query_id"), col("cell"))
      val nbrCell = exact.join(
        idx.codes.select(col("cand_id"), col("cell")), "cand_id")
      val covered = nbrCell.join(probes, Seq("query_id", "cell")).count()
      val refined = graft.ops.IvfPq.searchTopKRefined(
        e, "vec_id", "embedding", idx, pred, 3, np, 10)
      val hit = exact.join(refined.select(col("query_id"), col("cand_id")),
        Seq("query_id", "cand_id")).count()
      println(f"[sweep] nprobe=$np%2d coverage=${covered.toDouble / nExact}%.3f refined_recall=${hit.toDouble / nExact}%.3f")
    }
    spark.stop()
  }
}
