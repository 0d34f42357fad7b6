package graft

import org.apache.spark.sql.SparkSession

/** Single-query probe: run one `SparkEntry.queries` entry under the same
  * session config as [[Bench]], with the CC per-round instrumentation
  * visible — `runMain graft.RunOne <query> [sfDir] [reps]`. Diagnostic
  * surface for chasing per-query variance without paying a full bench run.
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, s"usage: RunOne <query> [sfDir] [reps]; " +
      s"known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 1
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // keep the diagnostic loggers audible under the WARN default
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "graft.dedup.CC", org.apache.logging.log4j.Level.INFO)
    // same warmup as Bench: JVM/codegen/table-cache spin-up untimed
    try SparkEntry.queries.get("q_fold_periods").foreach(_(spark, sfDir).count())
    catch { case _: Throwable => () }
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"RUNONE $name rep $r: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
