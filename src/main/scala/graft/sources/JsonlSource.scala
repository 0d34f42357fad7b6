package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSONL (newline-delimited JSON) ingest/egress — beyond-reference. JSONL
  * is the lingua franca of text-corpus interchange (crawl dumps, HF
  * datasets, eval suites); an engine that only reads parquet can't sit at
  * the front of a curation pipeline. Two disciplines matter at 100 TB:
  *
  *   - EXPLICIT schema. Schema inference is a full extra scan of the data
  *     before the real job starts, and a type decided by whichever file
  *     the sampler saw first. Production reads declare the schema.
  *   - PERMISSIVE corrupt-record capture. One mangled line in a billion
  *     must not kill the job (FAILFAST) nor silently vanish (DROPMALFORMED
  *     hides data loss); it lands in a quarantine column the caller counts
  *     and routes.
  */
object JsonlSource {

  val CORRUPT_COL = "_corrupt_record"

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Read JSONL with a declared schema; malformed lines appear as rows
    * with every data column null and the raw line in [[CORRUPT_COL]].
    *
    * Implementation: text source + `from_json`, not `spark.read.json` —
    * the raw-JSON reader forbids plans whose referenced columns reduce to
    * the corrupt column alone (`UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_
    * RECORD_COLUMN`), which is exactly what quarantine accounting does.
    * The text+from_json plan has no such restriction, parses once, and
    * stays a single codegen'd scan.
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val withCorrupt = schema.add(CORRUPT_COL, StringType)
    spark.read.text(path)
      .select(from_json(col("value"), withCorrupt,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CORRUPT_COL)).as("__j"))
      .select(withCorrupt.fieldNames.map(n => col(s"__j.`$n`")).toSeq: _*)
  }

  /** Quarantine split: (clean rows without the corrupt column, corrupt raw
    * lines). */
  def splitCorrupt(df: DataFrame): (DataFrame, DataFrame) = {
    val clean = df.filter(col(CORRUPT_COL).isNull).drop(CORRUPT_COL)
    val bad = df.filter(col(CORRUPT_COL).isNotNull).select(col(CORRUPT_COL))
    (clean, bad)
  }
}
