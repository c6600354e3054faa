package graft.sql

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils

/** Explicit partition DDL for filesystem tables — `ALTER TABLE ADD/DROP
  * PARTITION` (reference: flink-sql-parser `ddl/SqlAddPartitions.java` /
  * `SqlDropPartitions.java`, converter-wired at
  * `SqlToOperationConverter.java:544,557` and executed spec-by-spec via
  * `Catalog.createPartition`/`dropPartition` in
  * `TableEnvironmentImpl.java:1024-1050`).
  *
  * The filesystem analog of the catalog call is the Hive layout itself:
  * a partition IS a `k=v[/k2=v2]` leaf directory under the table root.
  * ADD creates the (empty) leaf — visible in SHOW PARTITIONS before any
  * row lands, contributing zero rows to reads, exactly Hive's contract —
  * and DROP removes the leaf's data. Both are metadata-scale: one
  * filesystem call per spec, no Spark job, so a 100k-partition table
  * costs 100k namenode RPCs and nothing else.
  *
  * Values are escaped into directory names with Spark's own Hive-
  * compatible escaping (`ExternalCatalogUtils.escapePathName`), so a
  * partition added here is byte-identical on disk to one written by a
  * dynamic-partition INSERT of the same value; NULL values land in
  * `__HIVE_DEFAULT_PARTITION__` like both engines' writers.
  */
object Partitions {

  /** Dirs whose names Spark's file index skips (`_`/`.` prefixes) —
    * staging and bookkeeping dirs must live in this namespace so a
    * crash can never surface them to readers as phantom partitions. */
  def hidden(name: String): Boolean =
    name.startsWith("_") || name.startsWith(".")

  /** Partition-properties sidecar: `ADD PARTITION ... WITH (props)` is
    * durable CATALOG state in the reference
    * (`Catalog.getPartition().getProperties()`), so the filesystem
    * analog persists the props UNDER THE LEAF in the same dot-prefixed
    * hidden namespace the compactor stages in — Spark's file index
    * skips it, readers never see it, and DROP PARTITION removes it
    * with the leaf. One small file per propertied partition:
    * metadata-scale, no Spark job. */
  private val PropsFileName = ".graft_partition_props.json"
  private val propsMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Persist partition properties under `leaf` (overwrites). */
  def writeProps(fs: FileSystem, leaf: Path, props: Map[String, String]): Unit = {
    val node = propsMapper.createObjectNode()
    props.toSeq.sortBy(_._1).foreach { case (k, v) => node.put(k, v) }
    val out = fs.create(new Path(leaf, PropsFileName), true)
    try out.write(propsMapper.writeValueAsBytes(node)) finally out.close()
  }

  /** Read the properties sidecar under `leaf` (empty when absent). */
  def readProps(fs: FileSystem, leaf: Path): Map[String, String] = {
    val p = new Path(leaf, PropsFileName)
    if (!fs.exists(p)) return Map.empty
    val in = fs.open(p)
    val bytes = try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
    import scala.jdk.CollectionConverters._
    propsMapper.readTree(bytes).properties().asScala
      .map(e => e.getKey -> e.getValue.asText).toMap
  }

  /** Visible `k=v` leaf directories exactly `depth` levels under
    * `root` (the Hive layout of a `depth`-column partitioned table).
    * Listing cost is bounded by partition count — metadata-scale. */
  def leafDirs(fs: FileSystem, root: Path, depth: Int): Seq[Path] =
    if (depth == 0) Seq(root)
    else if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && !hidden(s.getPath.getName) &&
        s.getPath.getName.contains("="))
      .flatMap(s => leafDirs(fs, s.getPath, depth - 1))

  /** `k1=v1/k2=v2` partition name of a leaf (values unescaped for
    * display — a null partition's `__HIVE_DEFAULT_PARTITION__` segment
    * unescapes to itself, matching the reference's listing). */
  def partName(leaf: Path, depth: Int): String = {
    val segs = Iterator.iterate(leaf)(_.getParent).take(depth).toSeq.reverse
    segs.map { p =>
      val n = p.getName
      val eq = n.indexOf('=')
      n.substring(0, eq + 1) + ExternalCatalogUtils.unescapePathName(n.substring(eq + 1))
    }.mkString("/")
  }

  /** SHOW PARTITIONS listing, optionally filtered by a PARTIAL spec —
    * the reference's `listPartitions` is a catalog call, not a scan;
    * the filesystem analog is this leaf listing (which is also what
    * makes an ADD'ed empty partition visible before any INSERT touches
    * it). The spec matches ESCAPED on-disk segments, so values
    * containing '/' or '=' filter correctly. */
  def listPartitionNames(spark: SparkSession, root: String,
                         partCols: Seq[String],
                         spec: Seq[(String, String)] = Nil): Seq[String] = {
    val rootP = new Path(root)
    val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    matchingLeaves(leafDirs(fs, rootP, partCols.length), partCols, spec)
      .map(partName(_, partCols.length)).sorted
  }

  /** Resolve a full partition spec to its leaf path, validating that it
    * names every partition column (the reference's
    * `Catalog.createPartition` rejects a partial spec the same way). */
  def specLeaf(root: Path, partCols: Seq[String],
               spec: Seq[(String, String)], stmt: String): Path = {
    val keys = spec.map(_._1)
    require(keys.distinct == keys,
      s"$stmt: duplicate partition column in spec (${keys.mkString(", ")})")
    require(keys.toSet == partCols.toSet,
      s"$stmt: partition spec (${keys.mkString(", ")}) must name exactly " +
        s"the partition columns (${partCols.mkString(", ")})")
    val m = spec.toMap
    partCols.foldLeft(root)((p, k) =>
      new Path(p, s"$k=${ExternalCatalogUtils.escapePathName(m(k))}"))
  }

  /** Validate a PARTIAL partition spec's keys against the table's
    * partition columns, with the reference's messages
    * (`SqlToOperationConverter.convertAlterTableCompact:644-663`:
    * "Table X is not partitioned." / "Partition column 'k' not defined
    * in the table schema. Available ordered partition columns: ...").
    */
  def validatePartialSpec(table: String, partCols: Seq[String],
                          spec: Seq[(String, String)]): Unit = {
    require(partCols.nonEmpty, s"Table $table is not partitioned.")
    spec.map(_._1).foreach { k =>
      require(partCols.contains(k),
        s"Partition column '$k' not defined in the table schema. " +
          s"Available ordered partition columns: " +
          partCols.mkString("'", "', '", "'"))
    }
  }

  /** Leaves matching a PARTIAL spec: every (k, v) pair must equal the
    * leaf's path segment at k's depth (values compared escaped — the
    * on-disk form). An empty spec matches every leaf. */
  def matchingLeaves(leaves: Seq[Path], partCols: Seq[String],
                     spec: Seq[(String, String)]): Seq[Path] =
    if (spec.isEmpty) leaves
    else {
      val wanted = spec.map { case (k, v) =>
        partCols.indexOf(k) -> s"$k=${ExternalCatalogUtils.escapePathName(v)}"
      }
      leaves.filter { leaf =>
        val segs = Iterator.iterate(leaf)(_.getParent)
          .take(partCols.length).toSeq.reverse.map(_.getName)
        wanted.forall { case (i, seg) => segs(i) == seg }
      }
    }

  /** `ADD [IF NOT EXISTS] PARTITION (spec)...` — creates each leaf dir.
    * @return partition names actually created */
  def add(spark: SparkSession, root: String, partCols: Seq[String],
          specs: Seq[Seq[(String, String)]], ifNotExists: Boolean): Seq[String] = {
    val rootP = new Path(root)
    val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    specs.flatMap { spec =>
      val leaf = specLeaf(rootP, partCols, spec, "ALTER TABLE ADD PARTITION")
      if (fs.exists(leaf)) {
        require(ifNotExists,
          s"ALTER TABLE ADD PARTITION: partition " +
            s"(${spec.map { case (k, v) => s"$k=$v" }.mkString(", ")}) " +
            "already exists (IF NOT EXISTS skips instead)")
        None
      } else {
        require(fs.mkdirs(leaf), s"ALTER TABLE ADD PARTITION: could not create $leaf")
        Some(partName(leaf, partCols.length))
      }
    }
  }

  /** `DROP [IF EXISTS] PARTITION (spec), ...` — removes each leaf's
    * data. @return partition names actually dropped */
  def drop(spark: SparkSession, root: String, partCols: Seq[String],
           specs: Seq[Seq[(String, String)]], ifExists: Boolean): Seq[String] = {
    val rootP = new Path(root)
    val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    specs.flatMap { spec =>
      val leaf = specLeaf(rootP, partCols, spec, "ALTER TABLE DROP PARTITION")
      if (!fs.exists(leaf)) {
        require(ifExists,
          s"ALTER TABLE DROP PARTITION: partition " +
            s"(${spec.map { case (k, v) => s"$k=$v" }.mkString(", ")}) " +
            "does not exist (IF EXISTS skips instead)")
        None
      } else {
        val name = partName(leaf, partCols.length)
        require(fs.delete(leaf, true), s"ALTER TABLE DROP PARTITION: could not delete $leaf")
        Some(name)
      }
    }
  }
}
