package graft

import org.scalatest.funsuite.AnyFunSuite

class ProbeJsonKind extends AnyFunSuite {
  test("probe") {
    val spark = TestSpark.spark
    graft.sql.SqlEnv(spark)
    spark.sql("""SELECT json_node_kind('{"a": 1}', '$.b') AS k1,
                        json_node_kind('{"a": 1}', '$.a') AS k2,
                        json_node_kind('{"a": null}', '$.a') AS k3,
                        json_exists('{"a": 1}', '$.b') AS e1""").show(false)
  }
}
