package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Mirror of [[SparkEntry.normalizeZeroSign]] on the DuckDB side: wrap the
    * oracle SQL so every float-typed output column (per the SPARK result
    * schema, the contract's source of truth for names/types) gets `+ 0.0`,
    * turning any −0.0 into +0.0 before the driver hashes bit patterns.
    */
  private[graft] def wrapOracle(sql: String, schema: StructType): String = {
    def dq(n: String) = "\"" + n.replace("\"", "\"\"") + "\""
    def needsFix(dt: DataType): Boolean = dt match {
      case DoubleType | FloatType => true
      case ArrayType(e, _) => needsFix(e)
      case _ => false
    }
    if (!schema.fields.exists(f => needsFix(f.dataType))) sql
    else {
      val cols = schema.fields.map { f =>
        f.dataType match {
          case DoubleType => s"(${dq(f.name)} + 0.0) AS ${dq(f.name)}"
          case FloatType =>
            s"CAST(${dq(f.name)} + 0.0 AS FLOAT) AS ${dq(f.name)}"
          case ArrayType(DoubleType, _) =>
            s"list_transform(${dq(f.name)}, __zx -> (__zx + 0.0)) AS ${dq(f.name)}"
          case ArrayType(FloatType, _) =>
            s"list_transform(${dq(f.name)}, __zx -> CAST(__zx + 0.0 AS FLOAT)) AS ${dq(f.name)}"
          case _ => dq(f.name)
        }
      }.mkString(", ")
      s"SELECT $cols FROM (\n${sql.trim.stripSuffix(";")}\n) __graft_zsign"
    }
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val schemas = scala.collection.mutable.Map.empty[String, StructType]
    SparkEntry.queries.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        schemas(name) = df.schema
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) =>
        val sql = schemas.get(k).map(s => wrapOracle(v, s)).getOrElse(v)
        s"${q(k)}: ${q(sql)}"
      }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
