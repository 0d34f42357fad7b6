package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.text.CorpusCompare

/** Corpus-comparison gates ([[graft.text.CorpusCompare]]): per-source
  * unigram KL drift and Dunning G² keyness. Oracles replay the pinned
  * per-word terms and the exact-decimal sums term for term.
  */
object CompareQueries extends QueryPack {

  private val TOPK = 10

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_source_kl" -> ((s, dir) =>
      CorpusCompare.sourceKl(Tables.cached(s, dir, "documents"), col("source"), col("text"))),
    "q_keyness_g2" -> ((s, dir) =>
      CorpusCompare.keynessG2(Tables.cached(s, dir, "documents"), col("source"), col("text"), TOPK)),
    // tokenizer fertility per language: BPE tokens per word and chars per
    // token — THE comparison table for choosing a tokenizer per corpus
    // mix; exact integer sums, one IEEE division per ratio
    "q_tokenizer_fertility" -> ((s, dir) => {
      import graft.text.TextFunctions
      Tables.cached(s, dir, "documents").groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextFunctions.bpeTokenCount(col("text")).cast("long")).as("n_tokens"),
          sum(size(split(col("text"), " ")).cast("long")).as("n_words"),
          sum(length(col("text")).cast("long")).as("n_chars"))
        .select(col("lang"), col("n_docs"), col("n_tokens"), col("n_words"), col("n_chars"),
          round(col("n_tokens").cast("double") / col("n_words"), 6).as("fertility"),
          round(col("n_chars").cast("double") / col("n_tokens"), 6).as("chars_per_token"))
        .orderBy("lang")
    }),
  )

  private val countsCtes =
    """csw AS (SELECT source, word, count(*) AS c
      |  FROM (SELECT source, unnest(string_split(text, ' ')) AS word FROM documents) x
      |  WHERE length(word) > 0 GROUP BY 1, 2),
      |cwx AS (SELECT word, sum(c) AS cw FROM csw GROUP BY 1),
      |tsx AS (SELECT source, sum(c) AS ts FROM csw GROUP BY 1),
      |tx AS (SELECT sum(c) AS t FROM csw)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_tokenizer_fertility" ->
      s"""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))) AS BIGINT) AS n_tokens,
         |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_words,
         |  CAST(sum(length(text)) AS BIGINT) AS n_chars,
         |  round(CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))) AS DOUBLE)
         |        / sum(len(string_split(text, ' '))), 6) AS fertility,
         |  round(CAST(sum(length(text)) AS DOUBLE)
         |        / sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))), 6) AS chars_per_token
         |FROM documents GROUP BY lang ORDER BY lang
         |""".stripMargin,
    "q_source_kl" ->
      s"""WITH $countsCtes,
         |term AS (SELECT csw.source, ts,
         |    CAST(round((CAST(c AS DOUBLE) / ts) *
         |      (ln(CAST(c AS DOUBLE)) - ln(CAST(ts AS DOUBLE))
         |       - ln(CAST(cw AS DOUBLE)) + ln(CAST(t AS DOUBLE))), 9) AS DECIMAL(24,9)) AS term
         |  FROM csw JOIN cwx USING (word) JOIN tsx USING (source) CROSS JOIN tx)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(max(ts) AS BIGINT) AS n_tokens,
         |  round(CAST(sum(term) AS DOUBLE), 6) AS kl
         |FROM term GROUP BY 1 ORDER BY 1
         |""".stripMargin,
    "q_keyness_g2" ->
      s"""WITH $countsCtes,
         |base AS (SELECT csw.source, csw.word, c AS a, cw - c AS b,
         |    ts - c AS c2, t - ts - (cw - c) AS d, ts, cw, t
         |  FROM csw JOIN cwx USING (word) JOIN tsx USING (source) CROSS JOIN tx),
         |scored AS (SELECT source, word, a, b,
         |    (CASE WHEN a > 0 THEN CAST(round(CAST(a AS DOUBLE) *
         |       (ln(CAST(a AS DOUBLE)) - ln(CAST(cw AS DOUBLE))
         |        - ln(CAST(ts AS DOUBLE)) + ln(CAST(t AS DOUBLE))), 9) AS DECIMAL(24,9))
         |      ELSE CAST(0.0 AS DECIMAL(24,9)) END
         |     + CASE WHEN b > 0 THEN CAST(round(CAST(b AS DOUBLE) *
         |       (ln(CAST(b AS DOUBLE)) - ln(CAST(cw AS DOUBLE))
         |        - ln(CAST(t - ts AS DOUBLE)) + ln(CAST(t AS DOUBLE))), 9) AS DECIMAL(24,9))
         |      ELSE CAST(0.0 AS DECIMAL(24,9)) END
         |     + CASE WHEN c2 > 0 THEN CAST(round(CAST(c2 AS DOUBLE) *
         |       (ln(CAST(c2 AS DOUBLE)) - ln(CAST(t - cw AS DOUBLE))
         |        - ln(CAST(ts AS DOUBLE)) + ln(CAST(t AS DOUBLE))), 9) AS DECIMAL(24,9))
         |      ELSE CAST(0.0 AS DECIMAL(24,9)) END
         |     + CASE WHEN d > 0 THEN CAST(round(CAST(d AS DOUBLE) *
         |       (ln(CAST(d AS DOUBLE)) - ln(CAST(t - cw AS DOUBLE))
         |        - ln(CAST(t - ts AS DOUBLE)) + ln(CAST(t AS DOUBLE))), 9) AS DECIMAL(24,9))
         |      ELSE CAST(0.0 AS DECIMAL(24,9)) END) AS g2h,
         |    CAST(a AS DECIMAL(19,0)) * CAST(t AS DECIMAL(19,0))
         |      > CAST(cw AS DECIMAL(19,0)) * CAST(ts AS DECIMAL(19,0)) AS over_
         |  FROM base),
         |ranked AS (SELECT source, word, a, b, g2h,
         |    row_number() OVER (PARTITION BY source ORDER BY g2h DESC, word) AS rn
         |  FROM scored WHERE over_)
         |SELECT source, word, CAST(a AS BIGINT) AS n_in_source,
         |  CAST(b AS BIGINT) AS n_in_rest,
         |  round(CAST(g2h * 2 AS DOUBLE), 6) AS g2,
         |  CAST(rn AS INT) AS rank
         |FROM ranked WHERE rn <= $TOPK ORDER BY source, rank
         |""".stripMargin,
  )
}
