package graft.sources

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro container-file format — the reference's flink-formats/
  * flink-avro (AvroRowDataSerializationSchema /
  * AvroRowDataDeserializationSchema + AvroFileFormatFactory).
  *
  * The sandbox has Avro CORE (avro-1.12.1 on the Spark classpath) but
  * not the spark-avro DataSource module, so — exactly like the
  * reference, which ships its own row↔record converters rather than
  * reusing someone's connector — this implements the format on the
  * generic Avro API:
  *
  *  - write: one container file per partition through the Hadoop
  *    FileSystem (cluster-correct: works on HDFS/S3A the same as
  *    local), schema derived from the DataFrame schema, nullables as
  *    `union(null, T)`, timestamps as timestamp-micros logical type;
  *  - read: `binaryFiles` + DataFileReader per file — splitting at
  *    file granularity like the reference's bulk Avro reader; the
  *    record schema is taken from the container header of the first
  *    file.
  *
  * Types covered: int/long/float/double/boolean/string/binary/
  * timestamp, TIME(p) (time-millis for p<=3, time-micros above —
  * the reference's AvroSchemaConverter TIME mapping; q94 gates the
  * roundtrip against the oracle), plus the NESTED types the reference's converter
  * supports — array<T>, map<string,T>, and struct (nested Avro
  * record), each recursively nullable (AvroNestedSpec roundtrips
  * them; q73 gates an array/struct roundtrip against the oracle).
  */
object Avro {

  private def nullableWrap(s: Schema, nullable: Boolean): Schema =
    if (nullable) Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), s))
    else s

  def toAvroSchema(st: StructType, name: String = "record"): Schema = {
    def conv(dt: DataType, path: String): Schema = dt match {
      case IntegerType => Schema.create(Schema.Type.INT)
      case LongType => Schema.create(Schema.Type.LONG)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case StringType => Schema.create(Schema.Type.STRING)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case TimestampType =>
        LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
      case TimestampNTZType =>
        LogicalTypes.localTimestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
      // TIME(p) rides Avro's time logical types. p<=3 as time-millis
      // (INT) is the reference's AvroSchemaConverter
      // TIME_WITHOUT_TIME_ZONE mapping; time-micros (LONG) for p>3 is
      // an EXTENSION — the reference's internal TIME is millis, so its
      // write side never emits finer than time-millis (its reader
      // handles time-micros, so interop holds). Roundtrip note: the
      // container schema carries only the logical type, so sub-milli
      // declared precisions read back widened — TIME(0..2) as TIME(3),
      // TIME(4..5) as TIME(6) (pinned in TimeFormatsSpec).
      case t: TimeType if t.precision <= 3 =>
        LogicalTypes.timeMillis().addToSchema(Schema.create(Schema.Type.INT))
      case _: TimeType =>
        LogicalTypes.timeMicros().addToSchema(Schema.create(Schema.Type.LONG))
      case ArrayType(et, containsNull) =>
        Schema.createArray(nullableWrap(conv(et, s"${path}_item"), containsNull))
      case MapType(StringType, vt, valueContainsNull) =>
        Schema.createMap(nullableWrap(conv(vt, s"${path}_value"), valueContainsNull))
      case s: StructType => record(s, path)
      case other => throw new IllegalArgumentException(s"unsupported Avro type: $other")
    }
    def record(s: StructType, rname: String): Schema = {
      val fields = s.fields.map { f =>
        val base = conv(f.dataType, s"${rname}_${f.name}")
        new Schema.Field(f.name, nullableWrap(base, f.nullable), null,
          if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
      }
      Schema.createRecord(rname, null, "graft.avro", false, fields.toList.asJava)
    }
    record(st, name)
  }

  /** Spark value → Avro value, aligned with the (possibly union-
    * wrapped) Avro schema node so nested records/collections carry the
    * right sub-schemas.
    */
  private def toAvroValue(v: Any, dt: DataType, sch: Schema): Any = {
    if (v == null) return null
    val s =
      if (sch.getType == Schema.Type.UNION)
        sch.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
      else sch
    (v, dt) match {
      case (t: java.sql.Timestamp, TimestampType) =>
        t.getTime * 1000L + (t.getNanos / 1000) % 1000
      case (t: java.time.Instant, TimestampType) =>
        t.getEpochSecond * 1000000L + t.getNano / 1000
      case (t: java.time.LocalDateTime, TimestampNTZType) =>
        t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000
      case (t: java.time.LocalTime, tt: TimeType) =>
        if (tt.precision <= 3) (t.toNanoOfDay / 1000000L).toInt
        else t.toNanoOfDay / 1000L
      case (b: Array[Byte], BinaryType) => java.nio.ByteBuffer.wrap(b)
      case (seq: scala.collection.Seq[_], ArrayType(et, _)) =>
        val out = new java.util.ArrayList[Any](seq.length)
        seq.foreach(x => out.add(toAvroValue(x, et, s.getElementType)))
        out
      case (m: scala.collection.Map[_, _], MapType(_, vt, _)) =>
        val out = new java.util.HashMap[CharSequence, Any](m.size)
        m.foreach { case (k, x) =>
          out.put(String.valueOf(k), toAvroValue(x, vt, s.getValueType)) }
        out
      case (r: Row, st: StructType) =>
        val rec = new GenericData.Record(s)
        var i = 0
        while (i < st.length) {
          rec.put(st(i).name,
            toAvroValue(r.get(i), st(i).dataType, s.getFields.get(i).schema()))
          i += 1
        }
        rec
      case (x, _) => x
    }
  }

  private def fromAvroValue(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (l: java.lang.Long, TimestampType) =>
      // floor semantics like the NTZ branch below: truncating division
      // would land a pre-epoch value in the wrong second once the
      // (always-positive) sub-second fraction is re-applied
      val t = new java.sql.Timestamp(Math.floorDiv(l, 1000000L) * 1000L)
      t.setNanos((Math.floorMod(l, 1000000L) * 1000L).toInt)
      t
    case (l: java.lang.Long, TimestampNTZType) =>
      java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(l, 1000000L),
        (Math.floorMod(l, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
    case (i: java.lang.Integer, _: TimeType) => // time-millis
      java.time.LocalTime.ofNanoOfDay(i.toLong * 1000000L)
    case (l: java.lang.Long, _: TimeType) => // time-micros
      java.time.LocalTime.ofNanoOfDay(l * 1000L)
    case (u: org.apache.avro.util.Utf8, StringType) => u.toString
    case (b: java.nio.ByteBuffer, BinaryType) =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case (c: java.util.Collection[_], ArrayType(et, _)) =>
      c.asScala.map(fromAvroValue(_, et)).toSeq
    case (m: java.util.Map[_, _], MapType(_, vt, _)) =>
      m.asScala.map { case (k, x) => String.valueOf(k) -> fromAvroValue(x, vt) }.toMap
    case (r: GenericRecord, st: StructType) =>
      Row.fromSeq(st.fields.map(f => fromAvroValue(r.get(f.name), f.dataType)).toSeq)
    case (x, _) => x
  }

  /** Write one Avro container file per partition under `dir`. */
  def write(df: DataFrame, dir: String): Unit = {
    val schema = df.schema
    val avroJson = toAvroSchema(schema).toString
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val out = new Path(dir)
    val fs = out.getFileSystem(conf.value)
    fs.delete(out, true)
    fs.mkdirs(out)
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.nonEmpty) {
        val avroSchema = new Schema.Parser().parse(avroJson)
        val fieldSchemas = avroSchema.getFields.asScala.map(_.schema()).toArray
        val pid = TaskContext.getPartitionId()
        val file = new Path(dir, f"part-$pid%05d.avro")
        val os = file.getFileSystem(conf.value).create(file, true)
        val writer = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](avroSchema))
        writer.create(avroSchema, os)
        try it.foreach { r =>
          val rec = new GenericData.Record(avroSchema)
          var i = 0
          while (i < schema.length) {
            rec.put(schema(i).name,
              toAvroValue(r.get(i), schema(i).dataType, fieldSchemas(i)))
            i += 1
          }
          writer.append(rec)
        } finally writer.close()
      }
    }
  }

  /** Spark StructType view of an Avro record schema. */
  def toSparkSchema(avro: Schema): StructType = {
    def field(s: Schema): (DataType, Boolean) = s.getType match {
      case Schema.Type.UNION =>
        val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
        val (dt, _) = field(nonNull.head)
        (dt, s.getTypes.asScala.exists(_.getType == Schema.Type.NULL))
      case Schema.Type.INT =>
        if (s.getLogicalType != null && s.getLogicalType.getName == "time-millis")
          (TimeType(3), false)
        else (IntegerType, false)
      case Schema.Type.LONG =>
        if (s.getLogicalType == null) (LongType, false)
        else if (s.getLogicalType.getName.startsWith("local-timestamp")) (TimestampNTZType, false)
        else if (s.getLogicalType.getName.startsWith("timestamp")) (TimestampType, false)
        else if (s.getLogicalType.getName == "time-micros") (TimeType(6), false)
        else (LongType, false)
      case Schema.Type.FLOAT => (FloatType, false)
      case Schema.Type.DOUBLE => (DoubleType, false)
      case Schema.Type.BOOLEAN => (BooleanType, false)
      case Schema.Type.STRING => (StringType, false)
      case Schema.Type.BYTES => (BinaryType, false)
      case Schema.Type.ARRAY =>
        val (et, n) = field(s.getElementType)
        (ArrayType(et, containsNull = n), false)
      case Schema.Type.MAP =>
        val (vt, n) = field(s.getValueType)
        (MapType(StringType, vt, valueContainsNull = n), false)
      case Schema.Type.RECORD =>
        (StructType(s.getFields.asScala.map { f =>
          val (dt, n) = field(f.schema())
          StructField(f.name(), dt, n)
        }.toSeq), false)
      case other => throw new IllegalArgumentException(s"unsupported Avro type: $other")
    }
    StructType(avro.getFields.asScala.map { f =>
      val (dt, nullable) = field(f.schema())
      StructField(f.name(), dt, nullable)
    }.toSeq)
  }

  /** Read every container file under `dir` (one Spark partition per
    * file, like the reference's bulk reader). An empty directory (a
    * declared table before any row lands — writing an empty frame
    * produces no container files) reads as an empty frame with
    * `emptySchema` when given, else fails with a clear message instead
    * of an opaque empty-collection error.
    */
  def read(spark: SparkSession, dir: String,
           emptySchema: Option[StructType] = None): DataFrame = {
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val hfs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasFiles = hfs.exists(dirPath) && hfs.listStatus(dirPath)
      .exists(s => s.isFile && s.getPath.getName.endsWith(".avro"))
    if (!hasFiles) {
      val schema = emptySchema.getOrElse(throw new IllegalArgumentException(
        s"Avro.read: no .avro container files under $dir and no schema to " +
          "serve an empty frame with (write at least one row first)"))
      return spark.createDataFrame(new java.util.ArrayList[Row](), schema)
    }
    val files = spark.sparkContext.binaryFiles(s"$dir/*.avro")
    // schema from the first container header
    val headBytes = files.first()._2.toArray()
    val headReader = new DataFileReader[GenericRecord](
      new SeekableByteArrayInput(headBytes), new GenericDatumReader[GenericRecord]())
    val avroSchema = headReader.getSchema
    headReader.close()
    val sparkSchema = toSparkSchema(avroSchema)
    val rows = files.flatMap { case (_, pds) =>
      val reader = new DataFileReader[GenericRecord](
        new SeekableByteArrayInput(pds.toArray()), new GenericDatumReader[GenericRecord]())
      val out = scala.collection.mutable.ArrayBuffer.empty[Row]
      try while (reader.hasNext) {
        val rec = reader.next()
        out += Row.fromSeq(sparkSchema.fields.map(f =>
          fromAvroValue(rec.get(f.name), f.dataType)).toSeq)
      } finally reader.close()
      out
    }
    spark.createDataFrame(rows, sparkSchema)
  }
}
