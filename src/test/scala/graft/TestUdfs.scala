package graft

/** Fixture classes for the function-DDL spec: `CREATE FUNCTION f AS
  * '<class>'` resolves classes implementing Spark's java UDF
  * interfaces from the session classpath — the engine-appropriate
  * analog of the reference's `extends ScalarFunction` contract.
  */
class TestUdfUpper extends org.apache.spark.sql.api.java.UDF1[String, String] {
  override def call(s: String): String = if (s == null) null else s.toUpperCase
}

class TestUdfLower extends org.apache.spark.sql.api.java.UDF1[String, String] {
  override def call(s: String): String = if (s == null) null else s.toLowerCase
}
