package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical text normalization — the CCNet/RefinedWeb pre-dedup step:
  * Unicode NFC composition, Unicode-aware lowercasing, C0 controls +
  * DEL mapped to spaces, space runs collapsed, ends trimmed. Applied
  * BEFORE shingling/hashing so that byte-level encoding accidents
  * ("e" + COMBINING ACUTE vs the precomposed "é", CRLF vs LF, tab vs
  * space runs) cannot split otherwise-identical documents across
  * near-dup buckets.
  *
  * One codegen'd map-side expression (the [[SimHash]] packaging): the
  * normalization exists before anything shuffles, and the generated
  * code is a single static call regardless of input size.
  *
  * Determinism/oracle notes: the pipeline is replayed by DuckDB as
  * `trim(regexp_replace(regexp_replace(lower(nfc_normalize(text)),
  * '[\x00-\x1f\x7f]', ' ', 'g'), ' +', ' ', 'g'))`. NFC is
  * version-stable for all precomposed forms that exist in both
  * engines' Unicode tables (stability policy: compositions are never
  * added or removed once published), and lowercasing agrees wherever
  * the simple case mapping applies; exotic divergence candidates
  * (locale-sensitive Turkish İ, expanding ß) are JDK-vs-utf8proc
  * territory the spec documents rather than papers over. The
  * collapse step collapses SPACES only (controls were just mapped to
  * spaces; pre-existing Unicode spaces like U+00A0 are content, not
  * layout, and survive — same as the oracle's ' +' regex). */
object TextNorm {

  /** Called from both eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val nfc = java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC)
    val lower = nfc.toLowerCase(java.util.Locale.ROOT)
    val n = lower.length
    val sb = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val c = lower.charAt(i)
      val mapped = if (c < 0x20 || c == 0x7f) ' ' else c
      if (mapped == ' ') {
        // leading spaces never set the flag (sb still empty) = trim-left;
        // a trailing run never flushes = trim-right
        if (sb.length > 0) pendingSpace = true
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(mapped)
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  case class NormalizeText(child: Expression) extends UnaryExpression
      with ImplicitCastInputTypes {
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = StringType
    override def prettyName: String = "normalize_text"
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(input: Any): Any =
      normalize(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, s =>
        s"${ev.value} = graft.functions.TextNorm.normalize($s);")

    override protected def withNewChildInternal(c: Expression): NormalizeText =
      copy(child = c)
  }

  def normalize_text(text: Column): Column =
    ColumnBridge.column(NormalizeText(ColumnBridge.expression(text)))
}
