package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Kafka connector surface — the reference's kafka + upsert-kafka
  * dynamic tables (flink-connectors/flink-connector-kafka/.../table/
  * KafkaDynamicTableFactory.java, UpsertKafkaDynamicTableFactory.java).
  *
  * Spark ships a Kafka source/sink (`format("kafka")`); what this
  * module adds is the reference's TABLE semantics on top of it:
  *
  *  - config translation (`properties.bootstrap.servers`,
  *    `scan.startup.mode`, `topic`, `sink.parallelism`) → Spark options
  *  - value format decode (JSON) against a user schema
  *  - upsert-kafka: compacted-topic records where a null value is a
  *    tombstone → changelog kinds (+U / -D) → [[graft.streaming
  *    .Changelog.changelogNormalize]] for the full +I/-U/+U/-D stream.
  *
  * No broker exists in this sandbox, so option-building and the
  * upsert→changelog interpretation are pure functions, spec-tested on
  * memory streams shaped like Kafka output (key/value binary columns).
  */
object Kafka {

  /** Reference-style source config (KafkaConnectorOptions). */
  final case class SourceConfig(
      bootstrapServers: String,
      topic: String,
      startupMode: String = "latest", // earliest|latest|timestamp
      startupTimestampMs: Option[Long] = None,
      groupId: Option[String] = None,
      failOnDataLoss: Boolean = false)

  /** Translate the reference's connector options to Spark's. */
  def sourceOptions(cfg: SourceConfig): Map[String, String] = {
    val starting = cfg.startupMode match {
      case "earliest" => Map("startingOffsets" -> "earliest")
      case "latest" => Map("startingOffsets" -> "latest")
      case "timestamp" => Map("startingTimestamp" ->
        cfg.startupTimestampMs.getOrElse(
          throw new IllegalArgumentException(
            "startup mode 'timestamp' needs startupTimestampMs")).toString)
      case m => throw new IllegalArgumentException(s"unknown scan.startup.mode: $m")
    }
    Map(
      "kafka.bootstrap.servers" -> cfg.bootstrapServers,
      "subscribe" -> cfg.topic,
      "failOnDataLoss" -> cfg.failOnDataLoss.toString) ++
      starting ++
      cfg.groupId.map("kafka.group.id" -> _)
  }

  /** Streaming Kafka source with the raw Kafka schema
    * (key/value/topic/partition/offset/timestamp).
    */
  def source(spark: SparkSession, cfg: SourceConfig): DataFrame =
    spark.readStream.format("kafka").options(sourceOptions(cfg)).load()

  /** Decode a JSON `value` column against `schema`, keeping the Kafka
    * metadata — the `format = 'json'` path of the reference's table.
    */
  def decodeJson(kafkaDf: DataFrame, schema: DataType): DataFrame =
    kafkaDf.select(
      col("key").cast("string").as("k"),
      // TIME fields ride the value as ISO text (flink-json contract;
      // from_json rejects TimeType) — parseJson casts them back
      TimeFormats.parseJson(col("value").cast("string"), schema).as("v"),
      col("offset"))

  /** Decode a protobuf `value` column against a declared (or
    * descriptor-set-derived, see [[ProtoDescriptors]]) message shape —
    * the `format = 'protobuf'` path of the reference's Kafka table
    * (flink-formats/flink-protobuf). Same output contract as
    * [[decodeJson]]: (k, v struct, offset).
    */
  def decodeProto(kafkaDf: DataFrame, msg: Proto.PbMessage): DataFrame =
    kafkaDf.select(
      col("key").cast("string").as("k"),
      graft.functions.proto.protoDecode(col("value"), msg).as("v"),
      col("offset"))

  /** Interpret compacted-topic records as upsert changelog rows —
    * UpsertKafkaDynamicTableFactory semantics: null value = tombstone
    * (-D, payload fields null), non-null = upsert (+U). Feed the
    * result to `Changelog.changelogNormalize(_, keys)` to recover the
    * full +I/-U/+U/-D stream the reference produces.
    *
    * @param decoded output of [[decodeJson]] (k, v struct, offset)
    */
  def upsertToChangelog(decoded: DataFrame): DataFrame =
    decoded.select(
      when(col("v").isNull, graft.streaming.Changelog.Delete)
        .otherwise(graft.streaming.Changelog.UpdateAfter)
        .as(graft.streaming.Changelog.KindCol),
      col("k"),
      col("v.*"),
      col("offset"))

  /** Sink options (reference: KafkaDynamicSink). */
  def sinkOptions(bootstrapServers: String, topic: String): Map[String, String] =
    Map("kafka.bootstrap.servers" -> bootstrapServers, "topic" -> topic)

  /** Record-key wire: one key column rides raw (the source side's raw
    * single-field key contract); a COMPOSITE key serializes as JSON —
    * a separator join would collide distinct keys ('a|b'+'c' vs
    * 'a'+'b|c') and silently DROP null components, corrupting
    * compaction on the topic. The JSON wire is PINNED (null fields
    * always serialized) rather than inherited from the session's
    * `spark.sql.jsonGenerator.ignoreNullFields` — two writers with
    * different session settings must produce byte-identical keys for
    * the same logical key, or topic compaction splits the key space.
    */
  def keyColumn(keyCols: Seq[String]): org.apache.spark.sql.Column = {
    require(keyCols.nonEmpty, "kafka sink needs at least one key column")
    if (keyCols.length == 1) col(keyCols.head).cast("string")
    else to_json(struct(keyCols.map(col): _*),
      Map("ignoreNullFields" -> "false"))
  }

  /** Write a stream to Kafka as JSON values; `keyCols` become the
    * record key (partitioning/compaction key, like the reference's
    * upsert-kafka PRIMARY KEY).
    */
  def sink(df: DataFrame, bootstrapServers: String, topic: String,
           keyCols: Seq[String], checkpointDir: String) = {
    // TIME columns encode to ISO text before to_json (which rejects
    // TimeType) — same wire contract as the decode side
    val enc = TimeFormats.encodeTimes(df)
    val keyed = enc.select(
      keyColumn(keyCols).cast("binary").as("key"),
      to_json(struct(enc.columns.map(col).toIndexedSeq: _*)).cast("binary").as("value"))
    keyed.writeStream.format("kafka")
      .options(sinkOptions(bootstrapServers, topic))
      .option("checkpointLocation", checkpointDir)
  }
}
