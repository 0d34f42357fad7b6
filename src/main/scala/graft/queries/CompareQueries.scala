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
  )

  private val countsCtes =
    """csw AS (SELECT source, word, count(*) AS c
      |  FROM (SELECT source, unnest(string_split(text, ' ')) AS word FROM documents) x
      |  WHERE length(word) > 0 GROUP BY 1, 2),
      |cwx AS (SELECT word, sum(c) AS cw FROM csw GROUP BY 1),
      |tsx AS (SELECT source, sum(c) AS ts FROM csw GROUP BY 1),
      |tx AS (SELECT sum(c) AS t FROM csw)""".stripMargin

  def oracleSql: Map[String, String] = Map(
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
