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

  /** In-place compaction of a Hive-partitioned directory: each leaf
    * partition (`k=v[/k2=v2]`) rewrites independently to ~targetBytes
    * files, preserving the layout — a leaf's data files carry no
    * partition columns, so reading the leaf directly and writing the
    * result back is layout-faithful by construction. Leaves rewrite via
    * a tmp-dir + rename swap (non-atomic per leaf, like the reference's
    * batch compact job); a leaf already at or under one target-sized
    * file is left untouched. The per-leaf jobs are driver-sequenced but
    * each rewrite is a distributed job, and the leaf listing is
    * metadata-scale (bounded by partition count).
    *
    * @return number of leaf partitions rewritten */
  def compactPartitioned(spark: SparkSession, rootPath: String,
                         targetBytes: Long, partDepth: Int): Int = {
    require(targetBytes > 0 && partDepth > 0)
    val root = new Path(rootPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def leaves(p: Path, depth: Int): Seq[Path] =
      if (depth == 0) Seq(p)
      else fs.listStatus(p).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.contains("="))
        .flatMap(s => leaves(s.getPath, depth - 1))
    var rewritten = 0
    leaves(root, partDepth).foreach { leaf =>
      val bytes = fs.getContentSummary(leaf).getLength
      val nFiles = fs.listStatus(leaf)
        .count(s => s.isFile && !s.getPath.getName.startsWith("_"))
      val n = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
      if (nFiles > n) {
        val tmp = new Path(leaf.getParent, leaf.getName + "__compact_tmp")
        spark.read.parquet(leaf.toString).repartition(n)
          .write.mode("overwrite").parquet(tmp.toString)
        val old = new Path(leaf.getParent, leaf.getName + "__compact_old")
        require(fs.rename(leaf, old), s"compact: could not stage $leaf")
        require(fs.rename(tmp, leaf), s"compact: could not move compacted files for $leaf")
        fs.delete(old, true)
        rewritten += 1
      }
    }
    rewritten
  }
}
