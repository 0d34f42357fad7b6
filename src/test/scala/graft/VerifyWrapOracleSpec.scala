package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The DuckDB oracle normalization wrapper must force every numeric output
  * column to the exact Spark type so the driver's bitwise hash compare can't
  * diverge on representation: float −0.0 → +0.0 and integer width (DuckDB
  * widens window sums / `//` / `%` to HUGEINT). Pure string logic — no jobs.
  */
class VerifyWrapOracleSpec extends AnyFunSuite {

  private def wrap(sql: String, fields: (String, DataType)*): String =
    Verify.wrapOracle(sql, StructType(fields.map { case (n, t) => StructField(n, t) }))

  test("passthrough when no numeric column needs normalization") {
    val sql = "SELECT s FROM t"
    assert(wrap(sql, "s" -> StringType) == sql)
  }

  test("doubles get zero-sign fix, longs get BIGINT cast") {
    val w = wrap("SELECT a, b FROM t", "a" -> DoubleType, "b" -> LongType)
    assert(w.contains("""("a" + 0.0) AS "a""""))
    assert(w.contains("""CAST("b" AS BIGINT) AS "b""""))
    assert(w.contains("__graft_norm"))
  }

  test("integer widths map to matching DuckDB casts") {
    val w = wrap("SELECT i, s, y FROM t",
      "i" -> IntegerType, "s" -> ShortType, "y" -> ByteType)
    assert(w.contains("""CAST("i" AS INTEGER) AS "i""""))
    assert(w.contains("""CAST("s" AS SMALLINT) AS "s""""))
    assert(w.contains("""CAST("y" AS TINYINT) AS "y""""))
  }

  test("ArrayType(LongType) is normalized element-wise") {
    val w = wrap("SELECT xs FROM t", "xs" -> ArrayType(LongType))
    assert(w.contains("""list_transform("xs", __zx0 -> CAST(__zx0 AS BIGINT)) AS "xs""""))
  }

  test("nested arrays use distinct lambda variables") {
    val w = wrap("SELECT xs FROM t", "xs" -> ArrayType(ArrayType(DoubleType)))
    assert(w.contains("__zx0"))
    assert(w.contains("__zx1 -> (__zx1 + 0.0)"))
  }

  test("non-numeric columns pass through inside a mixed projection") {
    val w = wrap("SELECT s, n FROM t", "s" -> StringType, "n" -> LongType)
    assert(w.contains(""""s", CAST("n" AS BIGINT) AS "n""""))
  }

  test("trailing semicolon is stripped before subquery wrapping") {
    val w = wrap("SELECT n FROM t;", "n" -> LongType)
    assert(!w.contains(";"))
  }
}
