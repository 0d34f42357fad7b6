package graft.text

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Overlapping-window document chunking (beyond-reference training-data op):
  * the RAG/context-window prep primitive — split each document's token
  * stream into windows of `chunkSize` tokens advancing by
  * `stride = chunkSize − overlap`, so consecutive chunks share `overlap`
  * tokens. The final window may be short; every token belongs to ≥ 1 chunk.
  *
  * Scale: the whole operator is ONE row-local projection + explode — no
  * shuffle, no window, no state; it fuses into whatever scan feeds it and
  * parallelizes embarrassingly at any corpus size. Chunk count per doc is
  * ceil((n − overlap)/stride), clamped ≥ 1, in pure INTEGER arithmetic
  * (`DIV`) so engines can't disagree on boundary docs.
  */
object Chunking {

  /** Explode each document into (chunk_idx, chunk_start, n_chunk_tokens,
    * chunk_text) rows.
    */
  def chunkDocs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int,
      overlap: Int): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap ($overlap) < chunkSize ($chunkSize)")
    val stride = chunkSize - overlap
    df.select(col(idCol).as("id"), split(col(textCol), " ").as("__t"))
      .withColumn("__n", size(col("__t")))
      .withColumn("__nch",
        greatest(expr(s"CAST((__n - $overlap + ${stride - 1}) DIV $stride AS INT)"), lit(1)))
      .select(col("id"), col("__t"),
        posexplode(transform(sequence(lit(0), col("__nch") - 1), i => i * stride))
          .as(Seq("chunk_idx", "chunk_start")))
      .select(
        col("id"),
        col("chunk_idx"),
        col("chunk_start"),
        size(slice(col("__t"), col("chunk_start") + 1, lit(chunkSize))).as("n_chunk_tokens"),
        concat_ws(" ", slice(col("__t"), col("chunk_start") + 1, lit(chunkSize))).as("chunk_text"))
  }
}
