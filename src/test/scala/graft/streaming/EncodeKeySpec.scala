package graft.streaming

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** State-key encoding must be collision-free for ANY column content —
  * including nulls vs the literal string "null" (the reference keys
  * state by binary rows, which distinguish these by construction).
  */
class EncodeKeySpec extends AnyFunSuite {

  test("null key value does not collide with the string \"null\"") {
    val a = StatefulOps.encodeKey(Row(null, "x"), Seq(0, 1))
    val b = StatefulOps.encodeKey(Row("null", "x"), Seq(0, 1))
    assert(a != b)
  }

  test("length-prefixing keeps segment boundaries unambiguous") {
    val a = StatefulOps.encodeKey(Row("ab", "c"), Seq(0, 1))
    val b = StatefulOps.encodeKey(Row("a", "bc"), Seq(0, 1))
    assert(a != b)
    // separators inside values don't merge segments
    val c = StatefulOps.encodeKey(Row("a|b", "c"), Seq(0, 1))
    val d = StatefulOps.encodeKey(Row("a", "b|c"), Seq(0, 1))
    assert(c != d)
  }

  test("null in different positions stays distinct") {
    val a = StatefulOps.encodeKey(Row(null, "x"), Seq(0, 1))
    val b = StatefulOps.encodeKey(Row("x", null), Seq(0, 1))
    assert(a != b)
  }
}
