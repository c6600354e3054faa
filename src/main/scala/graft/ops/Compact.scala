package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
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

  private val logger = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Parse the reference's MemorySize notation into bytes — bare bytes
    * or a 1024-based unit suffix ('134217728', '128mb', '1 gb';
    * reference: org.apache.flink.configuration.MemorySize, the type of
    * the compaction target-size options). Anything else is rejected
    * with a graft-level message naming the expected units.
    */
  def parseMemorySize(s: String): Long = {
    val m = """(?i)^\s*(\d+)\s*([a-z]*)\s*$""".r.findFirstMatchIn(s).getOrElse(
      throw new IllegalArgumentException(
        s"cannot parse memory size '$s' (expected bytes or <n> kb|mb|gb|tb)"))
    val mult = m.group(2).toLowerCase match {
      case "" | "b" | "bytes" => 1L
      case "k" | "kb" | "kibibytes" => 1L << 10
      case "m" | "mb" | "mebibytes" => 1L << 20
      case "g" | "gb" | "gibibytes" => 1L << 30
      case "t" | "tb" | "tebibytes" => 1L << 40
      case u => throw new IllegalArgumentException(
        s"unknown memory-size unit '$u' in '$s' (expected bytes or <n> kb|mb|gb|tb)")
    }
    m.group(1).toLong * mult
  }

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
      // r21 (guide §6: partitioning and sort order on write determine
      // how well readers can skip): RANGE-partition on the cluster key
      // before the within-file sort — the reference ecosystem's
      // write.distribution-mode=range. The old round-robin + local
      // sort made every file internally sorted but the files' min/max
      // ranges all overlapped, so a point/range predicate still opened
      // every footer; range distribution gives files disjoint key
      // ranges and min/max stats that actually prune. Row content is
      // unchanged (only the row→file placement moves).
      else df.repartitionByRange(n,
          clusterBy.map(org.apache.spark.sql.functions.col): _*)
        .sortWithinPartitions(
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
    * file is left untouched.
    *
    * Crash safety: staging dirs are DOT-PREFIXED siblings
    * (`.<leaf>__compact_tmp` / `.<leaf>__compact_old`), a namespace
    * Spark's file index skips — a crash between the two renames can
    * never surface a phantom partition to readers. [[sweepStaging]]
    * runs first and repairs any residue of a previous crashed run:
    * stale tmp dirs are deleted (the leaf or its `old` copy still holds
    * the data), and a stale `old` dir is restored to the leaf when the
    * leaf is missing (crash between renames) or deleted when the leaf
    * exists (rewrite completed, only the cleanup failed).
    *
    * Scale: up to `parallelism` leaf rewrites run concurrently (each is
    * its own distributed Spark job), so wall time is leaf-count /
    * parallelism — on a 100k-partition table raise `parallelism` to
    * what the cluster's job scheduler tolerates, and prefer partition-
    * filtered compaction passes over whole-table sweeps (README
    * §COMPACT).
    *
    * @return number of leaf partitions rewritten */
  def compactPartitioned(spark: SparkSession, rootPath: String,
                         targetBytes: Long, partDepth: Int,
                         parallelism: Int = 8,
                         partCols: Seq[String] = Nil,
                         spec: Seq[(String, String)] = Nil): Int = {
    require(targetBytes > 0 && partDepth > 0 && parallelism > 0)
    require(spec.isEmpty || partCols.nonEmpty,
      "compactPartitioned: a partition spec needs the partition columns")
    val root = new Path(rootPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    sweepStaging(fs, root, partDepth)
    // `ALTER TABLE t PARTITION (spec) COMPACT` compacts only the
    // matching leaves (a PARTIAL spec is legal — the reference's
    // targeted compaction, SqlAlterTableCompact's optional
    // PartitionSpecCommaList; this is also the recommended shape at
    // 100k-partition scale: compact what today's sink touched)
    val leaves = graft.sql.Partitions.matchingLeaves(
      graft.sql.Partitions.leafDirs(fs, root, partDepth), partCols, spec)
    if (leaves.isEmpty) return 0
    val rewritten = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(parallelism, leaves.size))
    try {
      val futures = leaves.map { leaf =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit =
            if (compactLeaf(spark, fs, leaf, targetBytes)) rewritten.incrementAndGet()
        })
      }
      var failure: Throwable = null
      futures.foreach { f =>
        if (failure == null)
          try f.get()
          catch {
            case e: java.util.concurrent.ExecutionException => failure = e.getCause
            case e: Throwable => failure = e
          }
      }
      if (failure != null) {
        // a failed leaf must not leave background rewrites mutating the
        // table after the statement reports its error: queued leaves are
        // cancelled before they start, in-flight swaps are waited out
        // (each leaf swap is self-consistent), THEN the caller sees the
        // failure — a retry can never race a still-running rename
        futures.foreach(_.cancel(false))
        pool.shutdown()
        pool.awaitTermination(1, java.util.concurrent.TimeUnit.HOURS)
        throw failure
      }
    } finally pool.shutdown()
    rewritten.get
  }

  /** Rewrite one leaf to ~targetBytes files if it has more files than
    * the target count. @return true if rewritten */
  private def compactLeaf(spark: SparkSession, fs: FileSystem, leaf: Path,
                          targetBytes: Long): Boolean = {
    val bytes = fs.getContentSummary(leaf).getLength
    val nFiles = fs.listStatus(leaf)
      .count(s => s.isFile && !graft.sql.Partitions.hidden(s.getPath.getName))
    val n = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    if (nFiles <= n) return false
    val tmp = new Path(leaf.getParent, "." + leaf.getName + "__compact_tmp")
    fs.delete(tmp, true) // residue of a failed attempt within this run
    spark.read.parquet(leaf.toString).repartition(n)
      .write.mode("overwrite").parquet(tmp.toString)
    val old = new Path(leaf.getParent, "." + leaf.getName + "__compact_old")
    require(fs.rename(leaf, old), s"compact: could not stage $leaf")
    require(fs.rename(tmp, leaf), s"compact: could not move compacted files for $leaf")
    fs.delete(old, true)
    true
  }

  /** Repair crash residue from a previous compaction run (see
    * [[compactPartitioned]]).
    *
    * Only DOT-PREFIXED names are unambiguously ours — a real partition
    * dir always starts with `k=`, never `.`, so `.X__compact_tmp/old`
    * can only be staging. A bare `X__compact_tmp/old` name could ALSO
    * be a legitimate partition whose escaped VALUE ends in the suffix
    * (`_` is never path-escaped), so the pre-r18 unprefixed residue
    * shapes are swept only when the partner leaf `X` exists — which
    * proves residue (a completed rewrite whose cleanup failed, or an
    * abandoned tmp) and makes deletion safe. An UNPARTNERED bare
    * `__compact_old` is REPAIRED (r20): the pre-r18 compactor only
    * ever produced that shape by crashing between its two renames, in
    * which case it holds the ONLY copy of a partition that is
    * invisible to readers — the sweep renames the suffix away so the
    * data is readable again, and logs what it did (the pathological
    * alternative — a user partition whose value literally ends in
    * `__compact_old` — was already unreadable under graft's own
    * compactor namespace contract). An unpartnered bare
    * `__compact_tmp` stays warn-only: a tmp may be a HALF-WRITTEN
    * rewrite, and surfacing truncated data would be worse than the
    * ambiguity. `__compact_old` entries are processed before
    * `__compact_tmp` in each directory so a compound crash (both
    * residues present) converges in one sweep: the restore makes the
    * tmp partnered, and the partnered tmp is then deleted.
    */
  private[graft] def sweepStaging(fs: FileSystem, root: Path, depth: Int): Unit = {
    def partner(p: Path, n: String, suffix: String): Path =
      new Path(p, n.stripPrefix(".").stripSuffix(suffix))
    def scan(p: Path, d: Int): Unit = {
      if (!fs.exists(p)) return
      val entries = fs.listStatus(p).filter(_.isDirectory)
      // _old before _tmp: a restored _old creates the partner that
      // proves a sibling bare _tmp redundant within this same pass
      entries.sortBy(s => !s.getPath.getName.endsWith("__compact_old")).foreach { s =>
        val n = s.getPath.getName
        if (n.startsWith(".") && n.endsWith("__compact_tmp"))
          // never the only copy: the leaf (write crashed) or its old
          // dir (rename crashed) still holds the data
          fs.delete(s.getPath, true)
        else if (n.startsWith(".") && n.endsWith("__compact_old")) {
          val leaf = partner(p, n, "__compact_old")
          if (fs.exists(leaf)) fs.delete(s.getPath, true) // rewrite done, cleanup failed
          else require(fs.rename(s.getPath, leaf), // crash between the two renames
            s"compact: could not restore $leaf from crash residue ${s.getPath}")
        } else if (!n.startsWith(".") && n.endsWith("__compact_old")) {
          val leaf = partner(p, n, "__compact_old")
          if (fs.exists(leaf))
            // legacy (pre-dot-prefix) residue, provably redundant: the
            // partner leaf holds the data
            fs.delete(s.getPath, true)
          else if (fs.exists(new Path(p,
              n.stripSuffix("__compact_old") + "__compact_tmp"))) {
            // unpartnered, CORROBORATED (r21, review finding): a pre-r18
            // crash between the two renames always leaves the fully
            // written bare tmp next to the bare old — so old+tmp with no
            // leaf proves crash residue holding the only copy of the
            // partition, invisible to readers until the suffix comes off.
            require(fs.rename(s.getPath, leaf),
              s"compact: could not restore $leaf from crash residue ${s.getPath}")
            logger.warn(
              s"compact sweep: restored ${s.getPath} to $leaf — pre-upgrade crash " +
                "residue held the only copy of this partition (it was invisible " +
                "to readers until now)")
          } else
            // unpartnered with NO tmp sibling: no pre-r18 crash produces
            // this shape, but a user partition whose value literally
            // ends in '__compact_old' DOES look like this ('_' is never
            // path-escaped) and Spark's file index reads it as partition
            // value 'v__compact_old' — renaming would silently CHANGE
            // that partition's value and query results. Warn-only.
            logger.warn(
              s"compact sweep: leaving ambiguous directory ${s.getPath} in place " +
                s"(no partner leaf and no '__compact_tmp' sibling to corroborate " +
                "crash residue). If this is pre-upgrade residue whose tmp was " +
                "removed by hand, rename away the __compact_old suffix manually.")
        } else if (!n.startsWith(".") && n.endsWith("__compact_tmp")) {
          if (fs.exists(partner(p, n, "__compact_tmp")))
            // legacy residue, provably redundant
            fs.delete(s.getPath, true)
          else
            // UNPARTNERED bare tmp: either a user partition whose
            // escaped value happens to end in the suffix (must not be
            // touched) or a HALF-WRITTEN pre-r18 rewrite — restoring
            // could surface truncated data, so the sweep surfaces the
            // ambiguity instead of acting.
            logger.warn(
              s"compact sweep: leaving ambiguous directory ${s.getPath} in place " +
                s"(no partner '${partner(p, n, "__compact_tmp").getName}' leaf). " +
                "If this is pre-upgrade crash residue it may be a half-written " +
                "rewrite — inspect before renaming away the __compact_tmp suffix.")
        } else if (d > 1 && !graft.sql.Partitions.hidden(n) && n.contains("="))
          scan(s.getPath, d - 1)
      }
    }
    scan(root, depth)
  }
}
