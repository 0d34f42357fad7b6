package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SFT conversation lint — format validation for instruction-tuning
  * corpora (beyond-reference training-data op). Chat-format datasets rot
  * in predictable ways: conversations that open with the assistant, end
  * on a dangling user turn (nothing to train on), carry empty turns,
  * repeat a role twice in a row (merge artifacts), or leak system
  * messages mid-dialogue (concatenation bugs). Every SFT pipeline runs
  * exactly this screen before tokenization; a bad conversation that
  * reaches packing poisons every sequence it lands in.
  *
  * The operator is a ROW-LOCAL projection over an
  * `array<struct<role,content>>` column — array expressions only, no
  * shuffle, no UDF; it fuses into the enclosing scan's codegen span, so
  * at 100 TB it rides a pass the pipeline was doing anyway. The check
  * set (role grammar, alternation, emptiness, minimum length) follows
  * the public chat-format conventions (system? (user assistant)+).
  *
  * Checks (1 = pass):
  *   starts_user      — first turn's role is `user`
  *   ends_assistant   — last turn's role is `assistant`
  *   alternating      — no two consecutive turns share a role
  *   no_empty         — no turn has empty content
  *   no_system_mid    — no `system` role after position 1 (a leading
  *                      system prompt is legal; mid-dialogue is not)
  *   enough_turns     — at least `minTurns` turns
  *   valid            — conjunction of all of the above
  */
object SftLint {

  def lintExprs(conv: Column, minTurns: Int): Seq[(String, Column)] = {
    val n = size(conv)
    def role(i: Column) = element_at(conv, i).getField("role")
    val startsUser = n >= 1 && role(lit(1)) === "user"
    val endsAssistant = n >= 1 && role(n) === "assistant"
    // sequence(1, n-1) would COUNT DOWN for n = 1 (Spark defaults the step
    // to -1 when start > stop) — guard the degenerate sizes explicitly
    val alternating = when(n >= 2,
      !exists(sequence(lit(1), n - 1), i => role(i) === role(i + 1)))
      .otherwise(lit(true))
    val noEmpty = !exists(conv, s => s.getField("content") === "")
    val noSystemMid = when(n >= 2,
      !exists(sequence(lit(2), n), i => role(i) === "system"))
      .otherwise(lit(true))
    val enoughTurns = n >= minTurns
    Seq(
      "n_turns" -> n,
      "starts_user" -> startsUser,
      "ends_assistant" -> endsAssistant,
      "alternating" -> alternating,
      "no_empty" -> noEmpty,
      "no_system_mid" -> noSystemMid,
      "enough_turns" -> enoughTurns)
  }

  /** Per-conversation lint report: idCol, n_turns, the six check flags
    * (int 1/0 so the gate hash is exact), valid.
    */
  def lint(df: DataFrame, idCol: String, convCol: String,
      minTurns: Int = 2): DataFrame = {
    val es = lintExprs(col(convCol), minTurns)
    val flags = es.map { case (nm, c) =>
      if (nm == "n_turns") c.as(nm) else c.cast("int").as(nm)
    }
    val valid = es.collect { case (nm, c) if nm != "n_turns" => c }
      .reduce(_ && _).cast("int").as("valid")
    df.select((col(idCol) +: flags :+ valid): _*)
  }
}
