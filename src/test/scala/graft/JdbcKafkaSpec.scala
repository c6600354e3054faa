package graft

import org.scalatest.funsuite.AnyFunSuite
import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, PreparedStatement}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}
import graft.sources.{Jdbc, Kafka, Proto}

/** In-memory keyed "database" behind a reflective JDBC Connection —
  * top-level object so executor closures don't capture the test suite,
  * and static so all local[*] partitions share one table.
  */
object FakeJdbc {
  val rows = new java.util.concurrent.ConcurrentHashMap[String, Seq[Any]]()
  val statements = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  @volatile var autoCommitDisabled = false
  def clear(): Unit = { rows.clear(); statements.clear(); autoCommitDisabled = false }

  def connection(keyCount: Int): Connection = {
    def statement(sql: String): PreparedStatement = {
      val isDelete = sql.trim.toUpperCase.startsWith("DELETE")
      val params = scala.collection.mutable.ArrayBuffer.empty[Any]
      val batch = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
      Proxy.newProxyInstance(getClass.getClassLoader,
        Array(classOf[PreparedStatement]),
        new InvocationHandler {
          def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
            case "setObject" =>
              val i = args(0).asInstanceOf[Integer] - 1
              while (params.size <= i) params += null
              params(i) = args(1); null
            case "addBatch" => batch += params.toSeq; params.clear(); null
            case "executeBatch" =>
              batch.foreach { vals =>
                // key = leading columns (upsert data lists keys first
                // in these tests; DELETE binds only the key); byte-array
                // keys render by CONTENT so distinct instances agree
                val key = vals.take(keyCount).map {
                  case b: Array[Byte] => b.map("%02x".format(_)).mkString
                  case v => v
                }.mkString("|")
                if (isDelete) rows.remove(key) else rows.put(key, vals)
              }
              val n = Array.fill(batch.size)(1)
              batch.clear(); n
            case "close" => null
            case "hashCode" => Integer.valueOf(System.identityHashCode(p))
            case "toString" => "FakePreparedStatement"
            case _ => null
          }
        }).asInstanceOf[PreparedStatement]
    }
    Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[Connection]),
      new InvocationHandler {
        def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
          case "prepareStatement" =>
            statements.add(args(0).asInstanceOf[String])
            statement(args(0).asInstanceOf[String])
          case "setAutoCommit" =>
            if (args(0) == java.lang.Boolean.FALSE) autoCommitDisabled = true
            null
          case "commit" | "close" => null
          case "hashCode" => Integer.valueOf(System.identityHashCode(p))
          case "toString" => "FakeConnection"
          case _ => null
        }
      }).asInstanceOf[Connection]
  }
}

/** JDBC upsert sink + Kafka table wrappers. No database driver or
  * broker exists in the sandbox, so the JDBC tests drive the sink
  * through [[FakeJdbc]] — verifying the sink's real batching and
  * changelog behavior, not just the SQL strings.
  */
class JdbcKafkaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("upsertSql renders the three dialect families") {
    val cols = Seq("id", "name", "score")
    val pg = Jdbc.upsertSql("postgres", "t", cols, Seq("id"))
    assert(pg.contains("ON CONFLICT (id) DO UPDATE SET name = EXCLUDED.name"))
    val my = Jdbc.upsertSql("mysql", "t", cols, Seq("id"))
    assert(my.contains("ON DUPLICATE KEY UPDATE name = VALUES(name)"))
    val me = Jdbc.upsertSql("ansi", "t", cols, Seq("id"))
    assert(me.startsWith("MERGE INTO t t USING") &&
      me.contains("WHEN MATCHED THEN UPDATE") &&
      me.contains("WHEN NOT MATCHED THEN INSERT"))
    // the MERGE source must be a FROM-less row the target DB accepts:
    // a bare SELECT without FROM is invalid on both MERGE families
    assert(me.contains("USING (VALUES (?, ?, ?)) AS s (id, name, score)"), me)
    val ora = Jdbc.upsertSql("oracle", "t", cols, Seq("id"))
    assert(ora.contains("FROM dual"), ora)
    // an all-key table degrades to insert-if-absent, never an empty
    // (syntactically invalid) update list
    val allPg = Jdbc.upsertSql("postgres", "t", Seq("id"), Seq("id"))
    assert(allPg.endsWith("ON CONFLICT (id) DO NOTHING"), allPg)
    val allMy = Jdbc.upsertSql("mysql", "t", Seq("id"), Seq("id"))
    assert(allMy.endsWith("ON DUPLICATE KEY UPDATE id = id"), allMy)
    val allMe = Jdbc.upsertSql("ansi", "t", Seq("id"), Seq("id"))
    assert(!allMe.contains("WHEN MATCHED") &&
      allMe.contains("WHEN NOT MATCHED THEN INSERT"), allMe)
  }

  test("kafka sink key: single column rides raw, composite keys are collision-free JSON") {
    val df = Seq(("x|y", "z"), ("x", "y|z"), ("x", null: String)).toDF("a", "b")
    val composite = df.select(Kafka.keyColumn(Seq("a", "b")).as("k"))
      .collect().map(_.getString(0))
    assert(composite.distinct.length == 3,
      s"composite keys must not collide or drop nulls: ${composite.mkString(" ; ")}")
    val single = df.select(Kafka.keyColumn(Seq("a")).as("k"))
      .collect().map(_.getString(0))
    assert(single.toSeq == Seq("x|y", "x", "x"), "single key column rides raw")
  }

  test("writeBatchUpsert: upserts keyed rows, honors row_kind deletes") {
    FakeJdbc.clear()
    val batch = Seq(
      ("+I", "k1", 1.0),
      ("+U", "k1", 2.0),   // overwrites k1
      ("+I", "k2", 5.0),
      ("-U", "k2", 5.0),   // dropped (superseded by +U)
      ("-D", "k2", 5.0))   // deletes k2
      .toDF("row_kind", "id", "score")
      .coalesce(1)         // deterministic apply order within the batch
    Jdbc.writeBatchUpsert(batch, "t", Seq("id"), "postgres",
      () => FakeJdbc.connection(1), batchSize = 2)
    import scala.jdk.CollectionConverters._
    val rows = FakeJdbc.rows.asScala.map { case (k, v) => k -> v.last }.toMap
    assert(rows == Map("k1" -> 2.0))
    assert(FakeJdbc.statements.asScala.exists(_.contains("ON CONFLICT")))
    assert(FakeJdbc.statements.asScala.exists(_.startsWith("DELETE FROM t")))
    // real drivers default autoCommit=true, where commit() throws —
    // the sink must open an explicit transaction
    assert(FakeJdbc.autoCommitDisabled, "writeBatchUpsert must setAutoCommit(false)")
  }

  test("writeBatchUpsert: -D then +I of one key in one batch keeps the row") {
    // Regression: separate upsert/delete statement batches flushed at the
    // end executed insert-then-delete regardless of arrival order. The
    // per-key last-wins reduce (like the reference's JdbcOutputFormat
    // buffer) must keep only the final action.
    FakeJdbc.clear()
    val batch = Seq(
      ("+I", "k1", 1.0),
      ("-D", "k1", 1.0),
      ("+I", "k1", 3.0))   // final action: row must exist with 3.0
      .toDF("row_kind", "id", "score").coalesce(1)
    Jdbc.writeBatchUpsert(batch, "t", Seq("id"), "postgres",
      () => FakeJdbc.connection(1), batchSize = 500)
    import scala.jdk.CollectionConverters._
    val rows = FakeJdbc.rows.asScala.map { case (k, v) => k -> v.last }.toMap
    assert(rows == Map("k1" -> 3.0))
  }

  test("writeBatchUpsert: BINARY keys reduce by content, not array identity") {
    // A BinaryType key arrives as Array[Byte] whose equality is
    // reference-based: without canonicalization the -D and +I below
    // land as SEPARATE pending entries, and with upserts executing
    // before deletes the row would be wrongly dropped (the r19
    // ChangelogJoin bug class, here in the sink's last-wins reduce).
    FakeJdbc.clear()
    val k = "bin-key".getBytes("UTF-8")
    val batch = Seq(
      ("+I", k.clone(), 1.0),
      ("-D", k.clone(), 1.0),
      ("+I", k.clone(), 7.0))  // final action: row exists with 7.0
      .toDF("row_kind", "id", "score").coalesce(1)
    Jdbc.writeBatchUpsert(batch, "t", Seq("id"), "postgres",
      () => FakeJdbc.connection(1), batchSize = 500)
    import scala.jdk.CollectionConverters._
    val rows = FakeJdbc.rows.asScala.map { case (_, v) => v.last }.toList
    assert(rows == List(7.0))
  }

  test("writeBatchUpsert: +I then -D of one key in one batch deletes the row") {
    FakeJdbc.clear()
    val batch = Seq(
      ("+I", "k1", 1.0),
      ("+U", "k1", 2.0),
      ("-D", "k1", 2.0),   // final action: delete
      ("+I", "k2", 9.0))
      .toDF("row_kind", "id", "score").coalesce(1)
    Jdbc.writeBatchUpsert(batch, "t", Seq("id"), "postgres",
      () => FakeJdbc.connection(1), batchSize = 500)
    import scala.jdk.CollectionConverters._
    val rows = FakeJdbc.rows.asScala.map { case (k, v) => k -> v.last }.toMap
    assert(rows == Map("k2" -> 9.0))
  }

  test("writeBatchUpsert: mixed kinds survive batchSize-boundary flushes") {
    FakeJdbc.clear()
    val batch = Seq(
      ("+I", "k1", 1.0), ("+I", "k2", 2.0),
      ("-D", "k1", 1.0), ("+I", "k3", 3.0),
      ("+I", "k1", 7.0)) // re-insert after the delete, across flush points
      .toDF("row_kind", "id", "score").coalesce(1)
    Jdbc.writeBatchUpsert(batch, "t", Seq("id"), "postgres",
      () => FakeJdbc.connection(1), batchSize = 2)
    import scala.jdk.CollectionConverters._
    val rows = FakeJdbc.rows.asScala.map { case (k, v) => k -> v.last }.toMap
    assert(rows == Map("k1" -> 7.0, "k2" -> 2.0, "k3" -> 3.0))
  }

  test("upsertSink streams micro-batches into the keyed store") {
    FakeJdbc.clear()
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(String, Double)]
    val q = Jdbc.upsertSink(
      in.toDF().toDF("id", "score"),
      "t", Seq("id"), "mysql", () => FakeJdbc.connection(1))
    try {
      in.addData(("a", 1.0), ("b", 2.0))
      q.processAllAvailable()
      in.addData(("a", 9.0)) // second batch upserts same key
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val rows = FakeJdbc.rows.asScala.map { case (k, v) => k -> v.last }.toMap
      assert(rows == Map("a" -> 9.0, "b" -> 2.0))
    } finally q.stop()
  }

  // ---- Kafka wrappers --------------------------------------------------

  test("Kafka sourceOptions translates the reference's connector options") {
    val opts = Kafka.sourceOptions(Kafka.SourceConfig(
      "broker:9092", "events", startupMode = "earliest",
      groupId = Some("g1")))
    assert(opts("kafka.bootstrap.servers") == "broker:9092")
    assert(opts("subscribe") == "events")
    assert(opts("startingOffsets") == "earliest")
    assert(opts("kafka.group.id") == "g1")
    val tsOpts = Kafka.sourceOptions(Kafka.SourceConfig(
      "b:9092", "t", startupMode = "timestamp", startupTimestampMs = Some(42L)))
    assert(tsOpts("startingTimestamp") == "42")
    intercept[IllegalArgumentException] {
      Kafka.sourceOptions(Kafka.SourceConfig("b", "t", startupMode = "nope"))
    }
  }

  test("upsert-kafka tombstones become -D upsert rows") {
    val schema = StructType(Seq(
      StructField("name", StringType), StructField("score", DoubleType)))
    val decoded = Seq(
      ("u1", Some(("ann", 1.0)), 1L),
      ("u1", Some(("ann", 2.0)), 2L),
      ("u1", None, 3L),                 // tombstone
      ("u2", Some(("bob", 7.0)), 4L))
      .toDF("k", "v", "offset")
      .select($"k", $"v".cast(schema), $"offset")
    val changelog = Kafka.upsertToChangelog(decoded)
    val kinds = changelog.orderBy("offset").select("row_kind", "k")
      .collect().map(r => (r.getString(0), r.getString(1))).toList
    assert(kinds == List(("+U", "u1"), ("+U", "u1"), ("-D", "u1"), ("+U", "u2")))
  }

  test("decodeProto: protobuf Kafka values decode against a declared message") {
    import graft.sources.Proto._
    // kafka wire shape: binary key/value + offset (the fields
    // decodeProto touches)
    val msg = PbMessage(Seq(
      PbField(1, "name", PbString), PbField(2, "score", PbDouble)))
    def enc(name: String, score: Double): Array[Byte] =
      Proto.encodeInternal(
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](org.apache.spark.unsafe.types.UTF8String.fromString(name), score)),
        msg)
    val kafkaDf = Seq(
      ("u1".getBytes, enc("ann", 1.5), 1L),
      ("u2".getBytes, enc("bob", -2.0), 2L))
      .toDF("key", "value", "offset")
    val out = Kafka.decodeProto(kafkaDf, msg).orderBy("offset")
      .select($"k", $"v.name", $"v.score").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toList
    assert(out == List(("u1", "ann", 1.5), ("u2", "bob", -2.0)))
  }

  test("upsert-kafka feed through changelogNormalize recovers full kinds") {
    // streaming end-to-end: tombstoned compacted topic → full changelog
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(String, Option[(String, Double)], Long)]
    val schema = StructType(Seq(
      StructField("name", StringType), StructField("score", DoubleType)))
    val decoded = in.toDF().toDF("k", "v", "offset")
      .select($"k", $"v".cast(schema), $"offset")
    val normalized = graft.streaming.Changelog.changelogNormalize(
      Kafka.upsertToChangelog(decoded), Seq("k"))
    val q = normalized.writeStream.format("memory").queryName("upkafka")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
    try {
      in.addData(("u1", Some(("ann", 1.0)), 1L))
      q.processAllAvailable()
      in.addData(("u1", Some(("ann", 2.0)), 2L))
      q.processAllAvailable()
      in.addData(("u1", None, 3L), ("u2", Some(("bob", 7.0)), 4L))
      q.processAllAvailable()
      val out = spark.sql("SELECT row_kind, k FROM upkafka ORDER BY offset, row_kind")
        .collect().map(r => (r.getString(0), r.getString(1))).toList
      assert(out == List(
        ("+I", "u1"),                  // first upsert
        ("-U", "u1"), ("+U", "u1"),    // second upsert retracts first
        ("-D", "u1"),                  // tombstone deletes (old image, offset 2)
        ("+I", "u2")))
    } finally q.stop()
  }
}
