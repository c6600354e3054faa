package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar-function gap fills — reference:
  * flink-table/flink-table-runtime/.../functions/SqlFunctionUtils.java:62
  * (isAlpha/isDecimal/isDigit), SqlLikeUtils (SIMILAR TO), and
  * BuiltInFunctionDefinitions (TEMPORAL_OVERLAPS).
  *
  * All are pure Column expressions over Spark builtins (rlike/regexp),
  * so they stay inside whole-stage codegen — no UDFs.
  */
object Strings {

  /** Translate a SQL:1999 SIMILAR TO pattern to a Java regex:
    * `%` → `.*`, `_` → `.`; regex operators `| * + ? ( ) [ ] { }` pass
    * through (that IS the SIMILAR TO language); `\x` escapes x.
    * Mirrors Calcite's SqlLikeUtils.similarToRegexp used by the
    * reference planner.
    */
  def similarToRegexp(pattern: String): String = {
    val sb = new StringBuilder("^")
    var i = 0
    while (i < pattern.length) {
      pattern.charAt(i) match {
        case '\\' if i + 1 < pattern.length =>
          sb.append(java.util.regex.Pattern.quote(pattern.charAt(i + 1).toString))
          i += 1
        case '%' => sb.append(".*")
        case '_' => sb.append('.')
        case '.' => sb.append("\\.")     // literal dot in SIMILAR TO
        case '$' => sb.append("\\$")     // literal in SIMILAR TO, anchor in Java regex
        case '^' => sb.append("\\^")     // likewise
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('$').toString
  }

  /** `expr SIMILAR TO pattern` (SQL:1999 semantics, unlike Spark's
    * absent builtin and DuckDB's regex-flavored one).
    */
  def similarTo(c: Column, pattern: String): Column =
    c.rlike(similarToRegexp(pattern))

  /** True iff the string is non-empty and all-letters (IS_ALPHA). */
  def isAlpha(c: Column): Column = c.rlike("^[A-Za-z]+$")

  /** True iff the string is non-empty and all-digits (IS_DIGIT). */
  def isDigit(c: Column): Column = c.rlike("^[0-9]+$")

  /** True iff the string parses as a decimal number (IS_DECIMAL). */
  def isDecimal(c: Column): Column =
    c.rlike("^[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)([eE][+-]?[0-9]+)?$")

  /** SPLIT_INDEX(str, sep, index) — 0-based, literal separator, NULL
    * when index is negative or out of range
    * (SqlFunctionUtils.splitIndex:387; preserve-all-tokens split).
    */
  def splitIndex(str: Column, sep: String, index: Column): Column =
    when(index < 0, lit(null).cast("string"))
      .otherwise(get(split(str, java.util.regex.Pattern.quote(sep), -1), index))

  /** TRUNCATE(x, d) — toward-zero truncation at d decimal places
    * (SqlFunctionUtils.struncate: BigDecimal ROUND_DOWN on
    * BigDecimal.valueOf(x), i.e. the double's SHORTEST decimal
    * representation). Three regimes:
    *  - |x| >= 2^53: x is integral (ulp >= 1), truncation is identity
    *    at any non-negative scale — never an overflowing BIGINT cast;
    *  - |x*10^d| < 2^53: the scaled double is exact enough for the
    *    BIGINT-cast fast path (whole-stage-codegen'd arithmetic);
    *  - the band |x| < 2^53 <= |x*10^d| (1 <= d <= 17): the double
    *    still carries sub-10^-d precision (d=2, x~9.1e13 has ulp 1/64)
    *    but scaling in double space would destroy it, so truncate in
    *    DECIMAL space: x - (x % 10^-d) with exact decimal remainder
    *    (remainder takes the dividend's sign = toward-zero). Spark's
    *    double→decimal cast goes through BigDecimal.valueOf, matching
    *    the reference's view of the value. d >= 18 stays identity: a
    *    shortest representation with |x| >= 2^53/10^18 has no digits
    *    below 10^-18 to chop (17 significant digits).
    */
  def truncateNum(x: Column, d: Int): Column = {
    val scaled = x * pow(lit(10), lit(d))
    val fast = scaled.cast("bigint").cast("double") / pow(lit(10), lit(d))
    val band =
      if (d >= 1 && d <= 17) {
        val dec = x.cast("decimal(38,18)")
        val step = lit(new java.math.BigDecimal(java.math.BigInteger.ONE, d))
          .cast("decimal(38,18)")
        (dec - (dec % step)).cast("double")
      } else x
    when(abs(x) >= lit(9007199254740992.0), x)
      .otherwise(when(abs(scaled) < lit(9007199254740992.0), fast)
        .otherwise(band))
  }

  /** TEMPORAL_OVERLAPS(s1, e1, s2, e2): whether the two periods share
    * any instant; endpoints may arrive unordered, like the SQL
    * OVERLAPS predicate the reference implements.
    */
  def temporalOverlaps(s1: Column, e1: Column, s2: Column, e2: Column): Column = {
    val lo1 = least(s1, e1); val hi1 = greatest(s1, e1)
    val lo2 = least(s2, e2); val hi2 = greatest(s2, e2)
    lo1 <= hi2 && lo2 <= hi1
  }
}
