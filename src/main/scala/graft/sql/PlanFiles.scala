package graft.sql

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

/** FLIP-190 plan persistence — `COMPILE PLAN` / `EXECUTE PLAN` /
  * `COMPILE AND EXECUTE PLAN` (reference: flink-sql-parser
  * `ddl/SqlCompilePlan.java`, `dml/SqlExecutePlan.java` +
  * `SqlCompileAndExecutePlan.java`, converter-wired at
  * `SqlToOperationConverter.java:366-372`, executed by
  * `TableEnvironmentImpl.compilePlanAndWrite:771`).
  *
  * HONEST ADAPTATION, documented (README §COMPILE PLAN): the reference
  * persists a frozen ExecNodeGraph JSON so a streaming job can be
  * upgraded across Flink versions with operator-state compatibility.
  * Spark has no frozen exec-plan format — Catalyst re-plans every run —
  * so the plan file here persists what IS stable across sessions: the
  * statement text and the CREATE TABLE DDL of every dialect table the
  * statement references. EXECUTE PLAN re-creates missing tables from
  * the persisted DDL and re-executes the statement; the physical plan
  * is re-DERIVED by the current optimizer rather than restored. What
  * survives a version upgrade is therefore the declared query + schema
  * contract, not the operator graph — the same guarantee a re-submitted
  * SQL script has, made durable as a single artifact.
  */
object PlanFiles {

  /** Version 1 carried statement + referenced-table DDL; version 2
    * (r19) adds the VIEW closure — every graft view the statement
    * reaches directly or through other views, as `[{name, query}]` in
    * discovery order — so an INSERT that reads a view restores in a
    * fresh session (the reference never had the gap because it
    * persists the fully-inlined ExecNodeGraph,
    * `TableEnvironmentImpl.compilePlanAndWrite:771`; the view closure
    * is the statement-text analog of that inlining). Version 3 (r20)
    * adds the FUNCTION closure — every CREATE FUNCTION'd name the
    * statement or a reached view body calls, as `[{name, className}]`
    * — the reference likewise serializes function references into the
    * ExecNodeGraph, so an EXECUTE PLAN in a fresh session must not
    * fail on a missing user function. Version-1/2 files still read
    * (they simply have no views / no functions). */
  private val Version = 3
  // ObjectMapper is thread-safe once configured; one shared instance
  private val mapper = new ObjectMapper()

  /** Write the plan envelope. `tables` maps each referenced dialect
    * table to its reconstructed CREATE TABLE DDL; `views` is the
    * transitive view closure as (name, body-query) pairs; `functions`
    * is the CREATE FUNCTION closure as (name, className) pairs. */
  def write(file: java.io.File, statement: String,
            tables: Map[String, String],
            views: Seq[(String, String)] = Nil,
            functions: Seq[(String, String)] = Nil): Unit = {
    val root = mapper.createObjectNode()
    root.put("graftPlanVersion", Version)
    root.put("statement", statement)
    val t = root.putObject("tables")
    tables.toSeq.sortBy(_._1).foreach { case (k, v) => t.put(k, v) }
    val vs = root.putArray("views")
    views.foreach { case (name, query) =>
      val v = vs.addObject(); v.put("name", name); v.put("query", query)
    }
    val fs = root.putArray("functions")
    functions.foreach { case (name, className) =>
      val f = fs.addObject(); f.put("name", name); f.put("className", className)
    }
    Option(file.getParentFile).foreach(_.mkdirs())
    mapper.writerWithDefaultPrettyPrinter().writeValue(file, root)
  }

  /** Read a plan envelope back:
    * (statement, table → DDL, views, functions). */
  def read(file: java.io.File)
      : (String, Map[String, String], Seq[(String, String)], Seq[(String, String)]) = {
    require(file.exists,
      s"EXECUTE PLAN: plan file '${file.getPath}' does not exist " +
        "(COMPILE PLAN '<file>' FOR <insert> writes it)")
    val root =
      try mapper.readTree(file)
      catch {
        case e: Exception => throw new IllegalArgumentException(
          s"EXECUTE PLAN: '${file.getPath}' is not a graft plan file (${e.getMessage})")
      }
    require(root.isInstanceOf[ObjectNode] && root.hasNonNull("statement") &&
      root.hasNonNull("graftPlanVersion"),
      s"EXECUTE PLAN: '${file.getPath}' is not a graft plan file " +
        "(missing statement/graftPlanVersion)")
    require(root.get("graftPlanVersion").asInt <= Version &&
      root.get("graftPlanVersion").asInt >= 1,
      s"EXECUTE PLAN: unsupported plan version ${root.get("graftPlanVersion")} " +
        s"in '${file.getPath}' (this build reads versions 1..$Version)")
    val tables = Option(root.get("tables")).collect { case o: ObjectNode =>
      import scala.jdk.CollectionConverters._
      o.properties().asScala.map(e => e.getKey -> e.getValue.asText).toMap
    }.getOrElse(Map.empty[String, String])
    val views = Option(root.get("views")).toSeq.flatMap { arr =>
      import scala.jdk.CollectionConverters._
      arr.elements().asScala.map(v =>
        v.get("name").asText -> v.get("query").asText).toSeq
    }
    val functions = Option(root.get("functions")).toSeq.flatMap { arr =>
      import scala.jdk.CollectionConverters._
      arr.elements().asScala.map(f =>
        f.get("name").asText -> f.get("className").asText).toSeq
    }
    (root.get("statement").asText, tables, views, functions)
  }
}
