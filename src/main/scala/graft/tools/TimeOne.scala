package graft.tools

import org.apache.spark.sql.SparkSession

/** Time a single driver-contract query by name — the per-query probe the
  * bench band analysis uses when one gate needs a fresh-JVM measurement
  * without paying for the whole tree.
  * Usage: runMain graft.tools.TimeOne <name> [sfDir]
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    val t0 = System.nanoTime()
    val n = fn(spark, sfDir).count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"query":"$name","rows":$n,"sec":$sec%.2f}""")
    spark.stop()
  }
}
