package graft.functions

import com.fasterxml.jackson.databind.{DeserializationFeature, JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `json_node_kind(json, path)` — the JSON node TYPE at a simple path:
  * 'object' | 'array' | 'string' | 'number' | 'boolean' | 'null', or
  * SQL NULL when the document is invalid, the path is absent, or the
  * path uses unsupported syntax (wildcards/unions).
  *
  * This is the classifier behind JSON_VALUE / JSON_QUERY / JSON_EXISTS
  * / IS JSON: the reference (flink-table-runtime/.../functions/
  * SqlJsonUtils.java jsonValue:138, jsonQuery:193, jsonExists:110,
  * isJsonValue:274) decides scalar-vs-container from the ACTUAL parsed
  * node type, not from the re-serialized text — a scalar string whose
  * text happens to start with '[' or '{' must classify as a string.
  * `get_json_object` alone cannot make that distinction (it strips the
  * quotes from string scalars), so this expression re-parses with the
  * same Jackson databind Spark itself bundles and walks the path on
  * the node tree.
  *
  * Path subset: `$` root, `.name` member access, `[n]` array index,
  * `['name']` quoted member — the same simple-path shapes
  * `get_json_object` accepts minus wildcards. A wildcard/union path
  * returns NULL ("error" per SQL/JSON FALSE/NULL ON ERROR defaults:
  * multiple results are an error for JSON_VALUE/JSON_QUERY anyway).
  */
case class JsonNodeKind(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == StringType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (STRING, STRING) arguments")
  override def dataType: DataType = StringType
  // nullSafeEval returns null for invalid docs / absent paths even when
  // both inputs are non-nullable; without this the optimizer folds
  // `json_node_kind(j,p) IS NOT NULL` to true (r7 advisor finding).
  override def nullable: Boolean = true
  override def prettyName: String = "json_node_kind"

  override protected def nullSafeEval(json: Any, path: Any): Any = {
    val node = JsonNodeKind.navigate(json.toString, path.toString)
    if (node == null) null else UTF8String.fromString(JsonNodeKind.kindOf(node))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JsonNodeKind =
    copy(left = newLeft, right = newRight)
}

object JsonNodeKind {
  // ObjectMapper is thread-safe for reads; share one instance per JVM.
  // FAIL_ON_TRAILING_TOKENS: '{} junk' must be invalid (the reference
  // validates the whole document, not a prefix).
  private val mapper = new ObjectMapper()
    .configure(DeserializationFeature.FAIL_ON_TRAILING_TOKENS, true)

  private[functions] def kindOf(n: JsonNode): String =
    if (n.isObject) "object"
    else if (n.isArray) "array"
    else if (n.isTextual) "string"
    else if (n.isNumber) "number"
    else if (n.isBoolean) "boolean"
    else "null"

  /** Walk `path` on the parsed tree; null = invalid doc / absent path /
    * unsupported path syntax.
    */
  private[functions] def navigate(json: String, path: String): JsonNode = {
    if (path == null || path.isEmpty || path.charAt(0) != '$') return null
    val root =
      try mapper.readTree(json)
      catch { case _: Exception => return null }
    if (root == null || root.isMissingNode) return null
    var node: JsonNode = root
    var i = 1
    while (i < path.length) {
      path.charAt(i) match {
        case '.' =>
          var j = i + 1
          while (j < path.length && path.charAt(j) != '.' && path.charAt(j) != '[') j += 1
          val name = path.substring(i + 1, j)
          if (name.isEmpty || name.contains("*")) return null
          node = node.get(name)
          if (node == null) return null
          i = j
        case '[' =>
          val end = path.indexOf(']', i)
          if (end < 0) return null
          val raw = path.substring(i + 1, end).trim
          if (raw.isEmpty || raw.contains("*") || raw.contains(",")) return null
          node =
            if (raw.length > 1 && raw.head == '\'' && raw.last == '\'')
              node.get(raw.substring(1, raw.length - 1))
            else if (raw.forall(_.isDigit))
              // > 9 digits overflows Int; such an index is absent anyway
              if (raw.length > 9) return null else node.get(raw.toInt)
            else return null
          if (node == null) return null
          i = end + 1
        case _ => return null
      }
    }
    node
  }
}
