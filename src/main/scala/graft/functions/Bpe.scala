package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic byte-pair-encoding token count (r18) — the
  * tokenizer-true lane for budget operators (`corpus_pack_bpe`): the
  * `n_chars div 4` proxy the char-budget lanes use is off by 2-3× on
  * code or non-Latin text, and a real pretraining pipeline budgets on
  * BPE tokens.
  *
  * Algorithm (classic BPE, Sennrich et al. 2016 / the GPT-2 encoder
  * shape): start from the text's code-point sequence, then apply each
  * merge rule of a FIXED vocabulary in rank order, each rule merging
  * its pair's non-overlapping occurrences left to right. Sequential
  * rank-order application is equivalent to the lowest-rank-first loop
  * because a merge can only create tokens that participate in
  * LATER-ranked rules (a rule's operands must exist before the rule is
  * learned). The token count is what remains.
  *
  * Exactness/oracle story: every token is WRAPPED as
  * `U+0002 token U+0003`, and a merge is a literal left-to-right
  * `String.replace` of `⟨a⟩⟨b⟩` with `⟨ab⟩` — the wrapper anchors the
  * pattern on BOTH sides, so a rule can only ever match two adjacent
  * whole tokens (a single-separator encoding would alias a token's
  * suffix/prefix into the pair, silently merging across boundaries).
  * `String.replace` is precisely DuckDB's `replace()` (literal,
  * left-to-right, non-overlapping), so the whole tokenization replays
  * in SQL as a recursive CTE over the same merge list — one replace
  * per rank, no recursion in the engine, no UDF anywhere. Code
  * POINTS, not UTF-16 units, so both engines split astral characters
  * identically.
  *
  * 100 TB shape: pure map-side — one expression per document, merge
  * vocabulary rides as a reference object (codegen constant-size in
  * vocabulary size), no shuffle, no state. The per-doc cost is
  * O(vocab · len) string scanning — the opt-in budgeting lane's
  * price; the proxy lanes stay the default.
  */
object Bpe {

  /** Token wrappers (U+0002 / U+0003 -- `chr(2)` / `chr(3)` on the
    * SQL side). Text containing these would corrupt the representation
    * identically in both engines; real corpora don't carry C0
    * controls (and the fixture provably doesn't). */
  val Open = '\u0002'
  val Close = '\u0003'

  case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
      extends UnaryExpression with ImplicitCastInputTypes {
    require(merges.nonEmpty, "bpe_token_count: empty merge vocabulary")
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = LongType
    override def prettyName: String = "bpe_token_count"
    override def nullIntolerant: Boolean = true

    // Patterns precomputed once per (deserialized) expression instance.
    @transient private lazy val pats: Array[String] =
      merges.map { case (a, b) => s"$Open$a$Close$Open$b$Close" }.toArray
    @transient private lazy val reps: Array[String] =
      merges.map { case (a, b) => s"$Open$a$b$Close" }.toArray

    override def nullSafeEval(input: Any): Any = {
      val text = input.asInstanceOf[UTF8String].toString
      val sb = new java.lang.StringBuilder(text.length * 2)
      text.codePoints().forEach { cp =>
        sb.append(Open); sb.appendCodePoint(cp); sb.append(Close); ()
      }
      var s = sb.toString
      var i = 0
      while (i < pats.length) {
        // literal, left-to-right, non-overlapping — DuckDB replace()'s
        // exact contract, and one pass per rule is complete: merging
        // (a,b) can never create a NEW (a,b) adjacency (the merged
        // token is `ab`, not `a` or `b`)
        s = s.replace(pats(i), reps(i))
        i += 1
      }
      var n = 0L
      var j = 0
      while (j < s.length) { if (s.charAt(j) == Open) n += 1; j += 1 }
      n
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bpe", this, classOf[BpeTokenCount].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = ((Long) $ref.nullSafeEval($c)).longValue();")
    }

    override protected def withNewChildInternal(c: Expression): BpeTokenCount =
      copy(child = c)
  }

  def bpe_token_count(text: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeTokenCount(ColumnBridge.expression(text), merges))
}
