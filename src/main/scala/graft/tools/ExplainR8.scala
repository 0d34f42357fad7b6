package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `explain("formatted")` plans for named driver-contract queries into
  * plans/r08/<query>_<tag>.txt — the round-7 before/after plan evidence.
  * Usage: runMain graft.tools.ExplainR8 <tag> <sfDir> <query...>
  * (streaming gates execute on construction — pass batch gates only).
  */
object ExplainR8 {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ExplainR8 <tag> <sfDir> <query...>")
    val (tag, dir, names) = (args(0), args(1), args.drop(2).toSeq)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("plans/r08"))
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, dir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"plans/r08/${name}_$tag.txt"), plan)
        println(s"[explain] wrote plans/r08/${name}_$tag.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[explain] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
