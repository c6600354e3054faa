package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** ANN quality diagnostic: recall@3 of the PQ and IVF-PQ query
  * configurations vs exact L2 top-3, plain ADC vs the refined
  * (ADC-shortlist + exact re-rank) search, with nprobe auto-scaled
  * by cell count. Isotropic random fixtures are PQ's worst case;
  * the refined search's recall@k equals the ADC scan's
  * recall@(k·refine), which is why refine is the lever that works
  * where OPQ-style rotations (which exploit inter-dimension
  * correlation — absent by construction here) cannot.
  * Run: sbt "runMain graft.tools.RecallProbe [sfDir]"
  */
object RecallProbe {
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
    val l2 = q.join(c, col("query_id") =!= col("cand_id"))
      .withColumn("d", aggregate(zip_with(col("q"), col("c"),
        (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
        lit(0.0), (a, x) => a + x))
    val w = Window.partitionBy(col("query_id")).orderBy(col("d"), col("cand_id"))
    val exact = l2.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select(col("query_id"), col("cand_id")).cache()
    def recall(approx: org.apache.spark.sql.DataFrame): Double =
      exact.join(approx.select(col("query_id"), col("cand_id")),
        Seq("query_id", "cand_id")).count().toDouble / exact.count()
    val cbs = graft.ops.Pq.train(e, "vec_id", "embedding", 16, 64, 2)
    val codes = graft.ops.Pq.encode(e, "vec_id", "embedding", cbs).cache()
    val pq = graft.ops.Pq.searchTopK(e.filter(pred), "vec_id", "embedding",
      codes, cbs, 3)
    println(f"[recall] pq(m=16,k=64) = ${recall(pq)}%.3f")
    val pqR = graft.ops.Pq.searchTopKRefined(e.filter(pred), "vec_id", "embedding",
      codes, e, "vec_id", "embedding", cbs, 3, refine = 10)
    println(f"[recall] pq_refined(m=16,k=64,refine=10) = ${recall(pqR)}%.3f")
    val cells = math.max(4, math.ceil(math.sqrt(e.count().toDouble)).toInt)
    val np = graft.ops.Ivf.defaultNprobe(cells)
    println(s"[recall] cells=$cells auto-nprobe=$np")
    val idx = graft.ops.IvfPq.build(e, "vec_id", "embedding",
      cells = cells, m = 16, k = 64, iters = 2)
    println(f"[recall] ivfpq(m=16,k=64,nprobe=2) = ${recall(graft.ops.IvfPq.searchTopK(e, "vec_id", "embedding", idx, pred, 3, 2))}%.3f")
    println(f"[recall] ivfpq(m=16,k=64,nprobe=$np) = ${recall(graft.ops.IvfPq.searchTopK(e, "vec_id", "embedding", idx, pred, 3, np))}%.3f")
    println(f"[recall] ivfpq_refined(m=16,k=64,nprobe=$np,refine=10) = ${recall(graft.ops.IvfPq.searchTopKRefined(e, "vec_id", "embedding", idx, pred, 3, np, 10))}%.3f")
    spark.stop()
  }
}
