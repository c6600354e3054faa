package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.Changelog

/** CDC changelog formats from the reference's flink-json module: each
  * decodes one JSON envelope string into 0–2 changelog rows carrying
  * the [[Changelog.KindCol]] row kind (+I/-U/+U/-D).
  *
  *  - debezium-json — DebeziumJsonDeserializationSchema
  *    (flink-formats/flink-json/src/main/java/org/apache/flink/formats/
  *    json/debezium/DebeziumJsonDeserializationSchema.java): envelope
  *    `{before, after, op}`; op c/r → +I(after), u → -U(before) +
  *    +U(after), d → -D(before).
  *  - canal-json — canal/CanalJsonDeserializationSchema.java: envelope
  *    `{data: [...], old: [...], type}`; `data` is an ARRAY of rows,
  *    UPDATE's `old` carries only the changed fields (absent fields
  *    fall back to the new row — the reference's null-fallback merge).
  *  - maxwell-json — maxwell/MaxwellJsonDeserializationSchema.java:
  *    envelope `{data, old, type}` with a single-row `data`; update's
  *    partial `old` merges over `data` the same way; `bootstrap-insert`
  *    is an insert.
  *  - ogg-json — ogg/OggJsonDeserializationSchema.java: envelope
  *    `{before, after, op_type}` with op_type I/U/D.
  *
  * All four are pure codegen'd projections (from_json + explode) —
  * zero shuffles, batch or streaming alike; downstream retract-aware
  * operators ([[Changelog.changelogNormalize]], ChangelogJoin,
  * RetractTopN, JDBC upsert sink) consume the output unchanged.
  */
object CdcFormats {

  private def rowStruct(prefix: Column, schema: StructType): Column =
    struct(schema.fieldNames.map(f => prefix.getField(f).as(f)): _*)

  /** Merge a partial old row over the full new row per the reference's
    * canal/maxwell semantics: a field absent (null) in `old` takes the
    * new row's value. (Like the reference, a field genuinely updated
    * TO null is indistinguishable from an absent field after parsing.)
    */
  private def mergeOld(oldRow: Column, newRow: Column, schema: StructType): Column =
    struct(schema.fieldNames.map(f =>
      coalesce(oldRow.getField(f), newRow.getField(f)).as(f)): _*)

  /** Columns of the exploded (kind, row) struct: row_kind + row fields.
    * An envelope with an unrecognized op produces a null array, which
    * explode drops — malformed rows are skipped, not failed.
    */
  private def emit(schema: StructType): Seq[Column] =
    col("__e.kind").as(Changelog.KindCol) +:
      schema.fieldNames.toSeq.map(f => col("__e.row").getField(f).as(f))

  private def kindRow(kind: String, row: Column): Column =
    struct(lit(kind).as("kind"), row.as("row"))

  /** Name for the staged-parse helper column that is guaranteed not to
    * collide with an input column (withColumn would silently replace
    * one, and the parse would then read the wrong input).
    */
  private def stagingName(df: DataFrame): String =
    Iterator.from(0)
      .map(i => if (i == 0) "__cdc_parsed" else s"__cdc_parsed_$i")
      .find(n => !df.columns.contains(n)).get

  /** debezium-json: `{before, after, op}` → changelog rows. */
  def fromDebeziumJson(df: DataFrame, jsonCol: Column, schema: StructType): DataFrame =
    fromBeforeAfter(df, jsonCol, schema, opField = "op",
      insertOps = Seq("c", "r"), updateOp = "u", deleteOp = "d")

  /** ogg-json: `{before, after, op_type}` with I/U/D op codes. */
  def fromOggJson(df: DataFrame, jsonCol: Column, schema: StructType): DataFrame =
    fromBeforeAfter(df, jsonCol, schema, opField = "op_type",
      insertOps = Seq("I"), updateOp = "U", deleteOp = "D")

  private def fromBeforeAfter(df: DataFrame, jsonCol: Column, schema: StructType,
      opField: String, insertOps: Seq[String], updateOp: String,
      deleteOp: String): DataFrame = {
    val env = StructType(Seq(
      StructField("before", schema), StructField("after", schema),
      StructField(opField, StringType)))
    // stage the parse in its own projection: the envelope struct is
    // referenced 5+ times below, and inlining from_json at every
    // reference re-parses the JSON per reference (measured ~2× on
    // q82); CollapseProject keeps a multi-referenced non-trivial
    // alias staged, so the parse runs once per row
    val stage = stagingName(df)
    val parsed = col(stage)
    val op = parsed.getField(opField)
    val before = rowStruct(parsed.getField("before"), schema)
    val after = rowStruct(parsed.getField("after"), schema)
    // TIME fields ride the envelope as ISO text (from_json rejects
    // TimeType) — TimeFormats.parseJson casts them back post-parse
    df.withColumn(stage, TimeFormats.parseJson(jsonCol, env))
      .select(explode(
        when(op.isin(insertOps: _*), array(kindRow(Changelog.Insert, after)))
        .when(op === updateOp, array(kindRow(Changelog.UpdateBefore, before),
          kindRow(Changelog.UpdateAfter, after)))
        .when(op === deleteOp, array(kindRow(Changelog.Delete, before)))
      ).as("__e"))
      .select(emit(schema): _*)
  }

  /** canal-json: `{data: [...], old: [...], type}` → changelog rows.
    * Every element of `data` yields rows; UPDATE pairs data[i] with
    * old[i] (null-fallback merged).
    */
  def fromCanalJson(df: DataFrame, jsonCol: Column, schema: StructType): DataFrame = {
    val env = StructType(Seq(
      StructField("data", ArrayType(schema)), StructField("old", ArrayType(schema)),
      StructField("type", StringType)))
    val stage = stagingName(df) // staged parse — see fromBeforeAfter
    val parsed = col(stage)
    // TIME fields ride the envelope as ISO text (from_json rejects
    // TimeType) — TimeFormats.parseJson casts them back post-parse
    df.withColumn(stage, TimeFormats.parseJson(jsonCol, env))
      .select(parsed.getField("type").as("__t"), parsed.getField("old").as("__old"),
        posexplode(parsed.getField("data")).as(Seq("__i", "__d")))
      .select(explode(
        when(col("__t") === "INSERT", array(kindRow(Changelog.Insert, col("__d"))))
        .when(col("__t") === "UPDATE", array(
          kindRow(Changelog.UpdateBefore,
            mergeOld(element_at(col("__old"), col("__i") + 1), col("__d"), schema)),
          kindRow(Changelog.UpdateAfter, col("__d"))))
        .when(col("__t") === "DELETE", array(kindRow(Changelog.Delete, col("__d"))))
      ).as("__e"))
      .select(emit(schema): _*)
  }

  /** maxwell-json: `{data, old, type}` (single-row data) → changelog
    * rows; `bootstrap-insert` counts as insert, like the reference.
    */
  def fromMaxwellJson(df: DataFrame, jsonCol: Column, schema: StructType): DataFrame = {
    val env = StructType(Seq(
      StructField("data", schema), StructField("old", schema),
      StructField("type", StringType)))
    val stage = stagingName(df) // staged parse — see fromBeforeAfter
    val parsed = col(stage)
    val data = rowStruct(parsed.getField("data"), schema)
    val old = mergeOld(parsed.getField("old"), parsed.getField("data"), schema)
    // TIME fields ride the envelope as ISO text (from_json rejects
    // TimeType) — TimeFormats.parseJson casts them back post-parse
    df.withColumn(stage, TimeFormats.parseJson(jsonCol, env))
      .select(parsed.getField("type").as("__t"), data.as("__d"), old.as("__o"))
      .select(explode(
        when(col("__t").isin("insert", "bootstrap-insert"),
          array(kindRow(Changelog.Insert, col("__d"))))
        .when(col("__t") === "update", array(
          kindRow(Changelog.UpdateBefore, col("__o")),
          kindRow(Changelog.UpdateAfter, col("__d"))))
        .when(col("__t") === "delete", array(kindRow(Changelog.Delete, col("__d"))))
      ).as("__e"))
      .select(emit(schema): _*)
  }
}
