package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans for selected driver-contract queries —
  * plan-quality review (pushdown, broadcast choice, codegen spans).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSet else Set(
      "q_train_labels", "q_rel_pricing_summary", "q_rel_nation_orders", "q_snapshots")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries.filter(q => names.contains(q._1)).foreach { case (name, fn) =>
      println(s"\n======== $name ========")
      fn(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
