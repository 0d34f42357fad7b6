package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document character-entropy quality signal as a native Catalyst
  * expression — one O(len) pass per row inside whole-stage codegen.
  *
  * Shannon entropy over the document's Unicode code-point distribution, in
  * bits: H = log2(n) − Σ cᵢ·log2(cᵢ) / n. Low entropy flags keyboard-mash /
  * template / single-token spam that length and stopword heuristics miss;
  * near-log2(alphabet) entropy with no structure flags random-string spam.
  * It is the cheap stand-in for the compression-ratio signal (zlib ratio)
  * used by public curation pipelines — same monotone family, but exactly
  * replayable by a SQL oracle (counts are integers; log2 is the shared
  * IEEE transcendental the LM-scoring gates already rely on cross-engine).
  *
  * Implementation notes for the 100 TB reader: the histogram is a small
  * open-addressing scan over a per-call int table (documents rarely exceed
  * a few hundred distinct code points); terms are summed in ascending
  * code-point order so the JVM result is a well-defined function of the
  * multiset, not of hash iteration order. Empty/whitespace-only strings
  * have H = 0 by the n ≤ 1 convention.
  */
object StringEntropy {

  private val LN2 = math.log(2.0)

  /** Entropy in bits of the code-point distribution of `s`. */
  def entropyBits(s: UTF8String): Double = {
    val str = s.toString
    val len = str.length
    if (len == 0) return 0.0
    // code point -> count, sorted map keeps the summation order canonical
    // (cheap: |alphabet| is tens, not thousands, for natural text)
    val counts = new java.util.TreeMap[Integer, Integer]()
    var i = 0
    var n = 0L
    while (i < len) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      n += 1
      val prev = counts.get(cp)
      counts.put(cp, if (prev == null) 1 else prev + 1)
    }
    if (n <= 1) return 0.0
    var acc = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toDouble
      acc += c * (math.log(c) / LN2)
    }
    (math.log(n.toDouble) / LN2) - acc / n
  }
}

/** `graft_entropy(str)` — see [[StringEntropy.entropyBits]]. */
case class StringEntropyExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"input must be string, got ${child.dataType}")

  override def nullSafeEval(s: Any): Any =
    StringEntropy.entropyBits(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
       |${ev.value} = graft.functions.StringEntropy.entropyBits($a);
     """.stripMargin)

  override protected def withNewChildInternal(c: Expression): StringEntropyExpr =
    copy(child = c)
}

object EntropyExpressions {

  /** Register `graft_entropy(str)` in the session registry (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_entropy", exprs => StringEntropyExpr(exprs.head), "built-in")

  /** Column wrapper. Requires [[register]] on the session first. */
  def stringEntropy(s: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_entropy", s)
}
