package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Small-file compaction mechanics: file count shrinks to the
  * byte-derived target, content survives byte-for-byte, clustering
  * sorts within output files.
  */
class CompactionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("compact shrinks file count and preserves content") {
    val base = Files.createTempDirectory("graft_compact").toString
    val in = s"$base/in"; val out = s"$base/out"
    val src = Tables.load(spark, TestSpark.sfDir, "lineitem")
    src.repartition(32).write.mode("overwrite").parquet(in)
    assert(ops.Compact.partFileCount(spark, in) == 32)

    val n = ops.Compact.compact(spark, in, out, targetBytes = 8L << 20)
    assert(ops.Compact.partFileCount(spark, out) == n)
    assert(n < 32 && n >= 1)

    // content preserved: same rows, same checksum-ish aggregate
    val a = spark.read.parquet(out)
    assert(a.count() == src.count())
    def sig(df: org.apache.spark.sql.DataFrame) =
      df.agg(sum(hash(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))).as("s")).collect()(0).getLong(0)
    assert(sig(a) == sig(src))
  }

  test("partitioned compaction: parallel leaf rewrites, identical content") {
    // r17 directive #3: leaf rewrites run concurrently (bounded pool);
    // many leaves, each fragmented, must land byte-identical to the
    // sequential result — i.e. to the source content
    val base = Files.createTempDirectory("graft_compact_par").toString
    val root = s"$base/t"
    val src = spark.range(0, 40 * 500)
      .selectExpr("id", "CAST(id % 40 AS STRING) AS grp")
    src.repartition(4).write.partitionBy("grp").mode("overwrite").parquet(root)
    val leaves = (0 until 40).map(g => s"$root/grp=$g")
    assert(leaves.forall(l => ops.Compact.partFileCount(spark, l) >= 2))
    val rewritten = ops.Compact.compactPartitioned(spark, root,
      targetBytes = 64L << 20, partDepth = 1, parallelism = 8)
    assert(rewritten == 40, s"all leaves must compact: $rewritten")
    assert(leaves.forall(l => ops.Compact.partFileCount(spark, l) == 1))
    val after = spark.read.parquet(root)
    assert(after.count() == 40 * 500)
    assert(after.agg(sum(col("id"))).collect()(0).getLong(0) ==
      src.agg(sum(col("id"))).collect()(0).getLong(0))
  }

  test("staging dirs are hidden from readers; crash residue is swept") {
    // r17 ADVICE (medium): staging must live in the '_'/'.' namespace
    // Spark's file index skips, and stale residue from a crashed run
    // must be repaired before compacting, not double-read or recompacted
    val base = Files.createTempDirectory("graft_compact_crash").toString
    val root = s"$base/t"
    spark.range(0, 300).selectExpr("id", "CAST(id % 3 AS STRING) AS grp")
      .repartition(4).write.partitionBy("grp").mode("overwrite").parquet(root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val count0 = spark.read.parquet(root).count()
    assert(count0 == 300)

    // (a) the LEGACY visible residue shape ('<leaf>__compact_old', a
    // sibling whose name contains '=' and no hidden prefix): partition
    // discovery DOES see it — the phantom-partition hazard the fix
    // removes — and the sweep deletes it because the leaf exists
    fs.mkdirs(p(s"$root/grp=9__compact_old"))
    spark.range(0, 50).selectExpr("id").write.mode("overwrite")
      .parquet(s"$root/grp=9__compact_old")
    spark.catalog.refreshByPath(root)
    assert(spark.read.parquet(root).count() == 350,
      "fixture: legacy residue IS visible to readers (the bug being fixed)")
    // ...while a DOT-PREFIXED staging dir (the new namespace) is not
    fs.mkdirs(p(s"$root/.grp=8__compact_tmp"))
    spark.range(0, 50).selectExpr("id").write.mode("overwrite")
      .parquet(s"$root/.grp=8__compact_tmp/x")
    spark.catalog.refreshByPath(root)
    assert(spark.read.parquet(root).count() == 350,
      "hidden staging must be invisible to readers")
    // the legacy residue becomes PROVABLY redundant once its partner
    // leaf exists — the sweep may then delete it safely
    spark.range(1000, 1010).selectExpr("id").write.mode("overwrite")
      .parquet(s"$root/grp=9")
    // ...but a bare name ending in the staging suffix WITHOUT a partner
    // could be a legitimate partition whose value ends in
    // '__compact_tmp' ('_' is never path-escaped) — the sweep must
    // leave it untouched (r18 review finding: deleting it would be
    // silent data loss)
    spark.range(2000, 2020).selectExpr("id").write.mode("overwrite")
      .parquet(s"$root/grp=7__compact_tmp")

    // (b) crash between the two renames: leaf moved to old, new files
    // never moved in — leaf missing, hidden old + tmp present
    require(fs.rename(p(s"$root/grp=1"), p(s"$root/.grp=1__compact_old")))
    fs.mkdirs(p(s"$root/.grp=1__compact_tmp"))
    // (c) crash after the swap, before cleanup: leaf present AND old
    fs.mkdirs(p(s"$root/.grp=2__compact_old"))

    spark.catalog.refreshByPath(root)
    assert(spark.read.parquet(root).count() == 100 + 100 + 10 + 50 + 20,
      "fixture: grp=1 offline; legacy residue + lookalike partition visible")
    ops.Compact.compactPartitioned(spark, root, targetBytes = 64L << 20, partDepth = 1)
    spark.catalog.refreshByPath(root)
    // the sweep restored grp=1, deleted grp=2's stale old, every hidden
    // tmp, and the PARTNERED legacy residue — while the unpartnered
    // lookalike partition kept its 20 rows
    assert(spark.read.parquet(root).count() == 300 + 10 + 20, "crash residue repaired")
    assert(fs.exists(p(s"$root/grp=7__compact_tmp")),
      "unpartnered staging-lookalike partition must survive the sweep")
    assert(!fs.exists(p(s"$root/grp=9__compact_old")) &&
      !fs.exists(p(s"$root/.grp=1__compact_old")) &&
      !fs.exists(p(s"$root/.grp=1__compact_tmp")) &&
      !fs.exists(p(s"$root/.grp=2__compact_old")) &&
      !fs.exists(p(s"$root/.grp=8__compact_tmp")))
  }

  test("sweep REPAIRS unpartnered bare __compact_old residue (r20): the only copy becomes readable again") {
    val base = Files.createTempDirectory("graft_compact_repair").toString
    val root = s"$base/t"
    spark.range(0, 200).selectExpr("id", "CAST(id % 2 AS STRING) AS grp")
      .repartition(4).write.partitionBy("grp").mode("overwrite").parquet(root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    // pre-r18 compactor crash between its two renames: the leaf was
    // renamed to the BARE old name (no dot prefix back then) and the
    // new files never moved in — grp=1 is gone, its only copy sits
    // under a name readers treat as a different partition value
    require(fs.rename(p(s"$root/grp=1"), p(s"$root/grp=1__compact_old")))
    // the compound variant: the same crash also left a bare tmp
    fs.mkdirs(p(s"$root/grp=1__compact_tmp"))
    spark.catalog.refreshByPath(root)
    assert(!fs.exists(p(s"$root/grp=1")), "fixture: partition invisible")
    ops.Compact.compactPartitioned(spark, root, targetBytes = 64L << 20, partDepth = 1)
    spark.catalog.refreshByPath(root)
    // the sweep restored grp=1 from the unpartnered bare old (it could
    // only be crash residue holding the only copy), and the restore
    // made the sibling bare tmp PARTNERED — deleted in the same pass
    assert(fs.exists(p(s"$root/grp=1")), "repair must restore the leaf")
    assert(!fs.exists(p(s"$root/grp=1__compact_old")))
    assert(!fs.exists(p(s"$root/grp=1__compact_tmp")),
      "restored partner proves the bare tmp redundant within the same sweep")
    assert(spark.read.parquet(root).count() == 200,
      "all rows readable again after the repair")
    // an unpartnered bare TMP with no old sibling stays warn-only (it
    // may be a half-written rewrite or a lookalike user partition)
    spark.range(0, 7).selectExpr("id").write.mode("overwrite")
      .parquet(s"$root/grp=5__compact_tmp")
    ops.Compact.compactPartitioned(spark, root, targetBytes = 64L << 20, partDepth = 1)
    assert(fs.exists(p(s"$root/grp=5__compact_tmp")),
      "unpartnered bare tmp must survive — restoring could surface a truncated rewrite")
    // an unpartnered bare OLD with no tmp sibling is NOT restorable
    // (r21 review finding): no pre-r18 crash produces that shape, but a
    // user partition whose value ends in '__compact_old' IS readable
    // under exactly that name — renaming it would silently change the
    // partition value. The sweep must leave it in place.
    spark.range(0, 9).selectExpr("id").write.mode("overwrite")
      .parquet(s"$root/grp=6__compact_old")
    spark.catalog.refreshByPath(root)
    val lookalikeRows = spark.read.parquet(s"$root/grp=6__compact_old").count()
    ops.Compact.compactPartitioned(spark, root, targetBytes = 64L << 20, partDepth = 1)
    assert(fs.exists(p(s"$root/grp=6__compact_old")),
      "uncorroborated bare old must survive — it may be a user partition " +
        "whose value ends in __compact_old")
    assert(!fs.exists(p(s"$root/grp=6")),
      "the sweep must not invent a grp=6 partition from the lookalike")
    assert(lookalikeRows == 9)
  }

  test("clusterBy sorts within each output file") {
    val base = Files.createTempDirectory("graft_compact2").toString
    val in = s"$base/in"; val out = s"$base/out"
    Tables.load(spark, TestSpark.sfDir, "orders").repartition(16)
      .write.mode("overwrite").parquet(in)
    ops.Compact.compact(spark, in, out, targetBytes = 1L << 20,
      clusterBy = Seq("o_orderdate"))
    // within every parquet file, o_orderdate must be non-decreasing
    val bad = spark.read.parquet(out)
      .select(input_file_name().as("f"), col("o_orderdate"))
      .withColumn("prev", lag(col("o_orderdate"), 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("f"))
          .orderBy(monotonically_increasing_id())))
      .filter(col("prev").isNotNull && col("o_orderdate") < col("prev"))
      .count()
    assert(bad == 0)
    // r21 (range distribution): files carry DISJOINT key ranges — the
    // min/max footer stats of distinct files may touch at a shared
    // boundary key but never properly interleave, so a reader's
    // point/range predicate prunes to the files that can match instead
    // of opening every footer (the old round-robin placement made
    // every file span ~the full key range). A smaller target forces
    // multiple output files so the assertion has teeth at this SF.
    val outMulti = s"$base/out_multi"
    ops.Compact.compact(spark, in, outMulti, targetBytes = 64L << 10,
      clusterBy = Seq("o_orderdate"))
    val ranges = spark.read.parquet(outMulti)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("o_orderdate").cast("timestamp").cast("long")).as("lo"),
        max(col("o_orderdate").cast("timestamp").cast("long")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val interleaved = ranges.sliding(2).exists {
      case Array((_, hi1), (lo2, _)) => lo2 < hi1
      case _ => false
    }
    assert(ranges.length > 1, "fixture must produce multiple output files")
    assert(!interleaved,
      s"range-clustered files must not properly interleave: ${ranges.mkString(", ")}")
  }
}
