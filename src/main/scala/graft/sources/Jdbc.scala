package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** JDBC connector surface — the reference's JDBC dynamic table
  * (flink-connectors/flink-connector-jdbc/.../table/
  * JdbcDynamicTableFactory.java): bounded scan, lookup by key, and the
  * upsert sink (JdbcOutputFormat with insert-or-update statements).
  *
  * Scan/lookup delegate to Spark's built-in JDBC source (predicate
  * pushdown, partitioned reads via partitionColumn/numPartitions —
  * the exact knobs the reference exposes as scan.partition.*). The
  * upsert sink is the part Spark lacks: implemented as a foreachBatch/
  * foreachPartition writer issuing dialect-specific upsert statements,
  * changelog-aware (-D rows delete, +I/+U upsert, -U dropped) like the
  * reference's JdbcOutputFormat in upsert mode.
  *
  * The connection factory is pluggable so the sink is testable without
  * a database driver on the classpath.
  */
object Jdbc {

  /** Bounded JDBC scan (scan.partition.* analog). */
  def scan(spark: SparkSession, url: String, table: String,
           options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table).options(options).load()

  /** Dialect-specific single-row upsert statement.
    * Mirrors JdbcDialect.getUpsertStatement in the reference.
    */
  def upsertSql(dialect: String, table: String,
                cols: Seq[String], keys: Seq[String]): String = {
    require(keys.nonEmpty && keys.forall(cols.contains))
    val colList = cols.mkString(", ")
    val params = cols.map(_ => "?").mkString(", ")
    val nonKeys = cols.filterNot(keys.contains)
    // an all-key table (link/membership shape) has nothing to update on
    // conflict — the statement degrades to insert-if-absent instead of
    // emitting an empty (syntactically invalid) update list
    dialect.toLowerCase match {
      case "postgres" | "postgresql" =>
        val conflict =
          if (nonKeys.isEmpty) "DO NOTHING"
          else s"DO UPDATE SET ${nonKeys.map(c => s"$c = EXCLUDED.$c").mkString(", ")}"
        s"INSERT INTO $table ($colList) VALUES ($params) " +
          s"ON CONFLICT (${keys.mkString(", ")}) $conflict"
      case "mysql" =>
        // a no-op key assignment is MySQL's insert-if-absent idiom
        // (INSERT IGNORE would swallow unrelated errors too)
        val updates =
          if (nonKeys.isEmpty) s"${keys.head} = ${keys.head}"
          else nonKeys.map(c => s"$c = VALUES($c)").mkString(", ")
        s"INSERT INTO $table ($colList) VALUES ($params) " +
          s"ON DUPLICATE KEY UPDATE $updates"
      case d =>
        // MERGE family. The parameter source needs a FROM-less row:
        // Oracle spells it SELECT ... FROM dual; the ANSI/SQL Server/
        // DB2/H2 form is a VALUES row constructor (a bare SELECT
        // without FROM is invalid on both families).
        val on = keys.map(k => s"t.$k = s.$k").mkString(" AND ")
        val source =
          if (d == "oracle")
            s"(SELECT ${cols.map(c => s"? AS $c").mkString(", ")} FROM dual) s"
          else s"(VALUES ($params)) AS s ($colList)"
        val matched =
          if (nonKeys.isEmpty) ""
          else s"WHEN MATCHED THEN UPDATE SET " +
            s"${nonKeys.map(c => s"t.$c = s.$c").mkString(", ")} "
        val insertVals = cols.map(c => s"s.$c").mkString(", ")
        s"MERGE INTO $table t USING $source ON ($on) " + matched +
          s"WHEN NOT MATCHED THEN INSERT ($colList) VALUES ($insertVals)"
    }
  }

  def deleteSql(table: String, keys: Seq[String]): String =
    s"DELETE FROM $table WHERE ${keys.map(k => s"$k = ?").mkString(" AND ")}"

  /** Write one bounded batch as upserts (and deletes for `-D` rows if a
    * `row_kind` column is present). One connection per partition,
    * statements batched `batchSize` at a time — the reference's
    * sink.buffer-flush.max-rows.
    */
  def writeBatchUpsert(batch: Dataset[Row], table: String, keys: Seq[String],
                       dialect: String,
                       connectionFactory: () => java.sql.Connection,
                       batchSize: Int = 500): Unit = {
    val schema = batch.schema
    val hasKind = schema.fieldNames.contains(graft.streaming.Changelog.KindCol)
    val dataCols = schema.fieldNames.filterNot(_ == graft.streaming.Changelog.KindCol).toSeq
    val upsert = upsertSql(dialect, table, dataCols, keys)
    val delete = deleteSql(table, keys)
    val kindIdx = if (hasKind) schema.fieldIndex(graft.streaming.Changelog.KindCol) else -1
    val dataIdx = dataCols.map(schema.fieldIndex)
    val keyIdx = keys.map(schema.fieldIndex)
    batch.foreachPartition { (it: Iterator[Row]) =>
      val conn = connectionFactory()
      // drivers default autoCommit=true, where commit() THROWS — open an
      // explicit transaction for batch atomicity; a connection that
      // cannot switch (test stubs) keeps its own commit semantics.
      // Only the driver saying "can't" degrades — a fatal Throwable
      // (OOM, dead connection) must surface, not silently drop atomicity
      val txn = try { conn.setAutoCommit(false); true }
                catch {
                  case _: java.sql.SQLException => false
                  case _: UnsupportedOperationException => false
                }
      try {
        val up = conn.prepareStatement(upsert)
        val del = conn.prepareStatement(delete)
        // Per-key last-wins reduce before execution, mirroring the
        // reference's JdbcOutputFormat buffered-upsert reduce: without
        // it, a -D followed by +I for the same key would execute
        // insert-then-delete (two independent statement batches) and
        // wrongly drop the row.
        val pending = new java.util.LinkedHashMap[Seq[Any], (String, Row)]()
        def flush(): Unit = {
          val entries = pending.values.iterator()
          while (entries.hasNext) {
            val (kind, r) = entries.next()
            if (kind == graft.streaming.Changelog.Delete) {
              keyIdx.zipWithIndex.foreach { case (ki, i) => del.setObject(i + 1, r.get(ki)) }
              del.addBatch()
            } else {
              dataIdx.zipWithIndex.foreach { case (di, i) => up.setObject(i + 1, r.get(di)) }
              up.addBatch()
            }
          }
          // Each key appears at most once per flush, so the two
          // statement batches cannot conflict on a key.
          up.executeBatch()
          del.executeBatch()
          pending.clear()
        }
        // the reduce map needs CONTENT equality on the key: a BinaryType
        // key arrives as Array[Byte] (reference equality), so a -D and
        // +I carrying equal bytes would not reduce — and with upserts
        // executing before deletes, the row would be wrongly dropped
        // (the same Array[Byte]-equality class the r19 ChangelogJoin
        // fix closed; ByteBuffer carries content equality)
        def keyOf(r: Row): Seq[Any] = keyIdx.map(i => r.get(i) match {
          case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
          case v => v
        })
        it.foreach { r =>
          val kind = if (hasKind) r.getString(kindIdx) else graft.streaming.Changelog.Insert
          if (kind != graft.streaming.Changelog.UpdateBefore) { // -U superseded by +U
            pending.put(keyOf(r), (kind, r))
            if (pending.size >= batchSize) flush()
          }
        }
        flush()
        if (txn) conn.commit()
      } finally conn.close()
    }
  }

  /** Streaming upsert sink: per micro-batch, [[writeBatchUpsert]] —
    * exactly-once to an idempotent (keyed) target the same way the
    * reference's upsert sink is: upserts are idempotent per key, so
    * micro-batch replays converge.
    */
  def upsertSink(stream: DataFrame, table: String, keys: Seq[String],
                 dialect: String,
                 connectionFactory: () => java.sql.Connection,
                 batchSize: Int = 500): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        writeBatchUpsert(batch, table, keys, dialect, connectionFactory, batchSize)
      }
      .start()
}
