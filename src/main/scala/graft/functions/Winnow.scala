package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint in one pass: the minimum md5 over all
  * `width`-codepoint sliding windows of a text (whole-text md5 when
  * shorter than `width`).
  *
  * Semantically identical to
  * `array_min(transform(sequence(1, n-width+1), i -> md5(substr(text, i, width))))`
  * — the declarative form materializes an n-element array of 32-char
  * hex strings per document through interpreted lambdas, then scans it
  * again for the min. This expression keeps a running 16-byte minimum
  * digest instead: no array, no per-window string, one codepoint walk.
  * Hex-string order equals unsigned digest-byte order ('0'..'9' <
  * 'a'..'f' tracks nibble order), so comparing raw digests gives the
  * same minimum the oracle's `list_min` of hex strings picks.
  */
object Winnow {

  private val mdLocal = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  private val HexChars = "0123456789abcdef".toCharArray

  private def toHex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(i * 2) = HexChars((d(i) >> 4) & 0xf).toByte
      out(i * 2 + 1) = HexChars(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  @inline private def lessThan(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** Called from both eval and generated code. */
  def fingerprint(text: UTF8String, width: Int): UTF8String = {
    val bytes = text.getBytes
    val md = mdLocal.get()
    // codepoint start offsets (one walk)
    var nChars = 0
    var i = 0
    while (i < bytes.length) {
      i += UTF8String.numBytesForFirstByte(bytes(i)); nChars += 1
    }
    if (nChars < width) {
      md.reset()
      return toHex(md.digest(bytes))
    }
    val starts = new Array[Int](nChars + 1)
    var c = 0; i = 0
    while (i < bytes.length) {
      starts(c) = i; i += UTF8String.numBytesForFirstByte(bytes(i)); c += 1
    }
    starts(nChars) = bytes.length
    var best: Array[Byte] = null
    var w = 0
    val lastStart = nChars - width
    while (w <= lastStart) {
      val off = starts(w)
      val len = starts(w + width) - off
      md.reset()
      md.update(bytes, off, len)
      val d = md.digest()
      if (best == null || lessThan(d, best)) best = d
      w += 1
    }
    toHex(best)
  }

  case class WinnowFingerprint(child: Expression, width: Int) extends UnaryExpression
      with ImplicitCastInputTypes {
    require(width > 0)
    // SQL surface: non-string inputs coerce (Spark string-function
    // convention) instead of CCEing on the UTF8String cast.
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = StringType
    override def prettyName: String = "winnow_fingerprint"
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(input: Any): Any =
      fingerprint(input.asInstanceOf[UTF8String], width)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, text =>
        s"${ev.value} = graft.functions.Winnow.fingerprint($text, $width);")

    override protected def withNewChildInternal(c: Expression): WinnowFingerprint =
      copy(child = c)
  }

  def winnow_fingerprint(text: Column, width: Int): Column =
    ColumnBridge.column(WinnowFingerprint(ColumnBridge.expression(text), width))

  /** Content-keyed sampled window spans, one pass: the (1-based
    * codepoint position, md5 hex) of every `width`-codepoint sliding
    * window whose digest's first nibble is zero — a deterministic 1/16
    * sample keyed by the window's CONTENT, so an identical span
    * samples identically in every document that contains it (the
    * property that makes cross-document span matching sound; a
    * position- or RNG-keyed sample would miss shared spans that land
    * on unsampled offsets in one of the documents). Documents shorter
    * than `width` contribute no windows. Positions are 1-based
    * codepoints to match `substr` in both engines. */
  def sampledSpans(text: UTF8String, width: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val bytes = text.getBytes
    val md = mdLocal.get()
    var nChars = 0
    var i = 0
    while (i < bytes.length) {
      i += UTF8String.numBytesForFirstByte(bytes(i)); nChars += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    if (nChars >= width) {
      val starts = new Array[Int](nChars + 1)
      var c = 0; i = 0
      while (i < bytes.length) {
        starts(c) = i; i += UTF8String.numBytesForFirstByte(bytes(i)); c += 1
      }
      starts(nChars) = bytes.length
      var w = 0
      val lastStart = nChars - width
      while (w <= lastStart) {
        val off = starts(w)
        val len = starts(w + width) - off
        md.reset()
        md.update(bytes, off, len)
        val d = md.digest()
        if ((d(0) & 0xf0) == 0)
          out += org.apache.spark.sql.catalyst.InternalRow(w + 1, toHex(d))
        w += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  case class WinnowSampledSpans(child: Expression, width: Int) extends UnaryExpression
      with ImplicitCastInputTypes {
    require(width > 0)
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("pos", org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("h", StringType, nullable = false))),
      containsNull = false)
    override def prettyName: String = "winnow_sampled_spans"
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(input: Any): Any =
      sampledSpans(input.asInstanceOf[UTF8String], width)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, text =>
        s"${ev.value} = graft.functions.Winnow.sampledSpans($text, $width);")

    override protected def withNewChildInternal(c: Expression): WinnowSampledSpans =
      copy(child = c)
  }

  def winnow_sampled_spans(text: Column, width: Int): Column =
    ColumnBridge.column(WinnowSampledSpans(ColumnBridge.expression(text), width))
}
