package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction — the table-maintenance operator every
  * long-running 100 TB lake needs: streaming sinks and fine-grained
  * partitions accumulate thousands of tiny parquet files, and scan
  * cost becomes dominated by per-file open/footer overhead instead of
  * bytes. Compaction rewrites a directory into ~targetBytes-sized
  * files (Spark's maxPartitionBytes analog, applied at WRITE time).
  *
  * The file count is computed from the actual on-disk byte size (not
  * row counts — row width varies), and the rewrite is a single
  * round-robin repartition: no shuffle key needed, every output file
  * lands near the target size. Optional `clusterBy` sorts within each
  * output file so min/max footer stats stay selective after the
  * rewrite (the reference ecosystem's sorted-compaction).
  */
object Compact {

  /** @return number of output files written */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetBytes: Long, clusterBy: Seq[String] = Nil): Int = {
    require(targetBytes > 0)
    val fs = new Path(inPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(new Path(inPath)).getLength
    val n = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(inPath)
    val out =
      if (clusterBy.isEmpty) df.repartition(n)
      else df.repartition(n).sortWithinPartitions(
        clusterBy.map(org.apache.spark.sql.functions.col): _*)
    out.write.mode("overwrite").parquet(outPath)
    n
  }

  /** Count the parquet part files under a path (for specs/audits). */
  def partFileCount(spark: SparkSession, path: String): Int = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new Path(path))
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
  }
}
