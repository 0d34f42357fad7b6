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

  test("property: numeric schemas always wrap, non-numeric always pass through, no column dropped (200 random schemas)") {
    val rng = new scala.util.Random(23)
    val scalars = Seq(DoubleType, FloatType, LongType, IntegerType, ShortType,
      ByteType, StringType, BooleanType, DateType)
    def randType(): DataType = rng.nextInt(3) match {
      case 0 => scalars(rng.nextInt(scalars.size))
      case 1 => ArrayType(scalars(rng.nextInt(scalars.size)))
      case _ => ArrayType(ArrayType(scalars(rng.nextInt(scalars.size))))
    }
    def numeric(dt: DataType): Boolean = dt match {
      case DoubleType | FloatType | LongType | IntegerType | ShortType | ByteType => true
      case ArrayType(e, _) => numeric(e)
      case _ => false
    }
    for (_ <- 0 until 200) {
      val fields = (0 until rng.nextInt(8) + 1)
        .map(i => (s"c$i", randType()))
      val w = wrap("SELECT 1", fields: _*)
      if (fields.exists(f => numeric(f._2))) {
        assert(w.contains("__graft_norm"))
        fields.foreach { case (n, _) => assert(w.contains("\"" + n + "\""), s"dropped $n") }
      } else assert(w == "SELECT 1")
    }
  }
}
