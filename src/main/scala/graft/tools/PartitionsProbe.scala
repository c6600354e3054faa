package graft.tools

import org.apache.spark.sql.SparkSession

/** Metadata-scale proof for the partition statements (r19 directive
  * #3): `Partitions.scala` argues ADD/DROP/SHOW are "one namenode RPC
  * per spec and nothing else" — this probe MEASURES it at ~10k leaves,
  * the way CompactProbe did for compaction. For each scale it times
  *
  *   - bulk `ALTER TABLE ADD PARTITION` (one statement, N specs, every
  *     100th with a WITH-props sidecar),
  *   - `SHOW PARTITIONS` (full listing) and a spec-filtered listing,
  *   - a fresh-session `partitionProperties` read-through (leaf-match
  *     over the full listing + one sidecar read),
  *   - `ALTER TABLE DROP PARTITION` of 100 specs,
  *   - `Compact.sweepStaging` over the whole tree,
  *
  * and prints per-leaf microseconds so BASELINE.md can pin the
  * near-flat curve. Run in a quiet window:
  *
  *   sbt "runMain graft.tools.PartitionsProbe [scales...]"   # default 1000 5000 10000
  */
object PartitionsProbe {
  def main(args: Array[String]): Unit = {
    val scales = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1000, 5000, 10000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = java.nio.file.Files.createTempDirectory("graft_part_probe").toString

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    scales.foreach { n =>
      val root = s"$base/t_$n"
      val env = graft.sql.SqlEnv(spark)
      val ddl =
        s"""CREATE TABLE pp_probe_$n (x BIGINT, p STRING)
           |PARTITIONED BY (p)
           |WITH ('connector' = 'filesystem', 'path' = '$root',
           |      'format' = 'parquet')""".stripMargin
      env.executeSql(ddl)
      // seed a handful of real partitions so the table reads normally
      env.executeSql(
        s"INSERT INTO pp_probe_$n SELECT CAST(id AS BIGINT), CAST('seed' AS STRING) FROM range(10)")

      val specs = (0 until n).map { i =>
        val props = if (i % 100 == 0) s" WITH ('tier' = 't$i')" else ""
        s"PARTITION (p = 'k$i')$props"
      }.mkString(" ")
      val (_, addSec) = timed {
        env.executeSql(s"ALTER TABLE pp_probe_$n ADD $specs")
      }

      val (full, showSec) = timed {
        env.executeSql(s"SHOW PARTITIONS pp_probe_$n").collect()
      }
      require(full.length == n + 1, s"expected ${n + 1} partitions, got ${full.length}")
      val (one, showSpecSec) = timed {
        env.executeSql(s"SHOW PARTITIONS pp_probe_$n PARTITION (p = 'k${n / 2}')").collect()
      }
      require(one.length == 1)

      // fresh session: durable-props read-through (leaf match + sidecar)
      val envF = graft.sql.SqlEnv(spark)
      envF.executeSql(ddl.replace("CREATE TABLE", "CREATE TABLE IF NOT EXISTS"))
      val (props, propsSec) = timed {
        envF.partitionProperties(s"pp_probe_$n", "p=k100")
      }
      require(props == Map("tier" -> "t100"), s"sidecar read-through: $props")

      val dropSpecs = (0 until 100).map(i => s"PARTITION (p = 'k$i')").mkString(", ")
      val (_, dropSec) = timed {
        env.executeSql(s"ALTER TABLE pp_probe_$n DROP $dropSpecs")
      }

      val rootP = new org.apache.hadoop.fs.Path(root)
      val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val (_, sweepSec) = timed {
        graft.ops.Compact.sweepStaging(fs, rootP, 1)
      }

      println(f"[partitions-probe] leaves=$n%5d add=$addSec%6.2fs (${addSec / n * 1e6}%6.1f us/leaf) " +
        f"show=$showSec%5.2fs (${showSec / n * 1e6}%6.1f us/leaf) showSpec=$showSpecSec%5.3fs " +
        f"propsReadThrough=$propsSec%5.3fs drop100=$dropSec%5.3fs (${dropSec / 100 * 1e6}%6.1f us/leaf) " +
        f"sweep=$sweepSec%5.2fs (${sweepSec / n * 1e6}%6.1f us/leaf)")
    }
    spark.stop()
  }
}
