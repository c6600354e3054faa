package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TIME(p) through the TEXT formats — the reference's converters
  * serialize TIME columns as ISO time-of-day text (flink-csv
  * `RowDataToCsvConverters` / `CsvToRowDataConverters` TIME branch,
  * flink-json `RowDataToJsonConverters` / `JsonToRowDataConverters`
  * TIME_WITHOUT_TIME_ZONE branch). Spark 4.1's CSV and JSON
  * datasources reject TimeType outright
  * (UNSUPPORTED_DATA_TYPE_FOR_DATASOURCE — probed in
  * [[graft.tools.TimeProbe]]), so this shim applies the same
  * text-on-the-wire contract around the native datasources:
  *
  *  - write: every TIME(p) column casts to its canonical
  *    `HH:mm:ss[.S…]` string (Spark's TIME→STRING cast — trailing
  *    zero fraction trimmed, value-preserving);
  *  - read: the file is read with those fields as STRING, then each
  *    parses back via the native `to_time` and casts to the declared
  *    TIME(p) — so the returned frame carries the ORIGINAL schema.
  *
  * All non-TIME columns pass straight through to the native
  * datasource, and frames without TIME columns take the identity
  * path — these helpers are safe as general CSV/JSON entry points.
  * The per-column cast is a codegen'd builtin (no UDF), and the
  * encode/decode is per-row map-side work with no extra shuffle, so
  * the shim adds nothing to the scan's scale profile.
  */
object TimeFormats {

  /** TIME(p) columns → canonical time-of-day strings (write side). */
  def encodeTimes(df: DataFrame): DataFrame = {
    if (!df.schema.exists(_.dataType.isInstanceOf[TimeType])) return df
    df.select(df.schema.fields.map { f =>
      f.dataType match {
        case _: TimeType => col(f.name).cast(StringType).as(f.name)
        case _ => col(f.name)
      }
    }.toSeq: _*)
  }

  /** `schema` with TIME(p) fields demoted to STRING (wire schema). */
  def textSchema(schema: StructType): StructType =
    StructType(schema.fields.map { f =>
      f.dataType match {
        case _: TimeType => f.copy(dataType = StringType)
        case _ => f
      }
    })

  /** Parse the STRING-wire TIME fields back to their declared
    * TIME(p) (read side) — requires `spark.sql.timeType.enabled`.
    *
    * `dropMalformed` mirrors the reference's `ignore-parse-errors`
    * contract at the TIME level: a record whose wire text is present
    * but unparseable is DROPPED (Flink's JsonToRowDataConverters skip
    * the whole record on any field-level parse failure), instead of
    * raising the ANSI cast error. Genuine nulls pass through.
    */
  def decodeTimes(raw: DataFrame, schema: StructType,
                  dropMalformed: Boolean = false): DataFrame = {
    if (!schema.exists(_.dataType.isInstanceOf[TimeType])) return raw
    val timeFields = schema.fields.collect { case f if f.dataType.isInstanceOf[TimeType] => f }
    val kept =
      if (!dropMalformed) raw
      else raw.filter(!timeFields.map { f =>
        col(f.name).isNotNull &&
          expr(s"TRY_CAST(`${f.name}` AS TIME(6))").isNull
      }.reduce(_ || _))
    kept.select(schema.fields.map { f =>
      f.dataType match {
        case TimeType(p) =>
          expr(s"CAST(to_time(`${f.name}`) AS TIME($p))").as(f.name)
        case _ => col(f.name)
      }
    }.toSeq: _*)
  }

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    encodeTimes(df).write.mode("overwrite")
      .option("header", header.toString).csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true): DataFrame =
    decodeTimes(
      spark.read.option("header", header.toString)
        .schema(textSchema(schema)).csv(path),
      schema)

  def writeJson(df: DataFrame, path: String): Unit =
    encodeTimes(df).write.mode("overwrite").json(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    decodeTimes(spark.read.schema(textSchema(schema)).json(path), schema)

  // ---- from_json / to_json wire contract --------------------------------
  // The JSON FUNCTIONS reject TimeType like the datasource does
  // (from_json: UNSUPPORTED_DATATYPE; to_json: conversion failure), so
  // every schema-driven JSON envelope — Kafka value decode, the CDC
  // debezium/canal/maxwell/ogg envelopes, JSON sinks — applies the same
  // ISO-text contract: TIME fields travel as STRING on the wire and a
  // struct-level Cast flips them back, recursively through nested
  // structs/arrays/maps. Cast is codegen'd and a no-op when the schema
  // carries no TIME.

  /** `dt` with every (nested) TIME field demoted to STRING. */
  def wireType(dt: DataType): DataType = dt match {
    case _: TimeType => StringType
    case s: StructType =>
      StructType(s.fields.map(f => f.copy(dataType = wireType(f.dataType))))
    case ArrayType(et, n) => ArrayType(wireType(et), n)
    case MapType(kt, vt, n) => MapType(wireType(kt), wireType(vt), n)
    case other => other
  }

  /** `from_json` that accepts TIME fields in `declared`: parses the
    * wire shape and casts back to the declared type (string→TIME per
    * field). Identical to plain `from_json` for TIME-free schemas.
    */
  def parseJson(jsonCol: org.apache.spark.sql.Column,
                declared: DataType): org.apache.spark.sql.Column = {
    val wire = wireType(declared)
    val parsed = org.apache.spark.sql.functions.from_json(jsonCol, wire)
    if (wire == declared) parsed else parsed.cast(declared)
  }

  /** `to_json`-ready view of a struct column: TIME fields cast to
    * their ISO text (no-op cast removed by the optimizer otherwise).
    */
  def toWire(structCol: org.apache.spark.sql.Column,
             declared: DataType): org.apache.spark.sql.Column = {
    val wire = wireType(declared)
    if (wire == declared) structCol else structCol.cast(wire)
  }
}
