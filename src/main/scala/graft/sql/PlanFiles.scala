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

  private val Version = 1
  // ObjectMapper is thread-safe once configured; one shared instance
  private val mapper = new ObjectMapper()

  /** Write the plan envelope. `tables` maps each referenced dialect
    * table to its reconstructed CREATE TABLE DDL. */
  def write(file: java.io.File, statement: String,
            tables: Map[String, String]): Unit = {
    val root = mapper.createObjectNode()
    root.put("graftPlanVersion", Version)
    root.put("statement", statement)
    val t = root.putObject("tables")
    tables.toSeq.sortBy(_._1).foreach { case (k, v) => t.put(k, v) }
    Option(file.getParentFile).foreach(_.mkdirs())
    mapper.writerWithDefaultPrettyPrinter().writeValue(file, root)
  }

  /** Read a plan envelope back: (statement, table → DDL). */
  def read(file: java.io.File): (String, Map[String, String]) = {
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
    require(root.get("graftPlanVersion").asInt == Version,
      s"EXECUTE PLAN: unsupported plan version ${root.get("graftPlanVersion")} " +
        s"in '${file.getPath}' (this build reads version $Version)")
    val tables = Option(root.get("tables")).collect { case o: ObjectNode =>
      import scala.jdk.CollectionConverters._
      o.properties().asScala.map(e => e.getKey -> e.getValue.asText).toMap
    }.getOrElse(Map.empty[String, String])
    (root.get("statement").asText, tables)
  }
}
