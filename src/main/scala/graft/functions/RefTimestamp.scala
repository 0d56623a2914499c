package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fixed-layout parse/format of the reference timestamp format
  * `yyyy-MM-dd-HH.mm.ss[.S{1..6}]` (`fixed2avro/ColumnBuilder.go:231`,
  * fine print F3) as direct digit arithmetic over the UTF-8 bytes — the
  * same fixed-offset strategy the reference's hand-rolled parsers use
  * (`ColumnBuilder.go:232-383`), ~6x faster than routing every row
  * through java.time's DateTimeFormatter. Timezone-free by construction
  * (the reference parses against a zero-value Location ≡ UTC; Spark
  * side is TimestampNTZ).
  *
  * Civil-date↔epoch-day conversion uses the public-domain Euclidean
  * affine algorithms from Howard Hinnant's "chrono-Compatible Low-Level
  * Date Algorithms" (howardhinnant.github.io/date_algorithms.html).
  */
object RefTimestamp {

  private final val MicrosPerSecond = 1000000L

  /** days since 1970-01-01 for a valid civil date (Hinnant days_from_civil). */
  private def daysFromCivil(yIn: Int, m: Int, d: Int): Long = {
    val y = if (m <= 2) yIn - 1 else yIn
    val era = (if (y >= 0) y else y - 399) / 400
    val yoe = y - era * 400
    val doy = (153 * (if (m > 2) m - 3 else m + 9) + 2) / 5 + d - 1
    val doe = yoe * 365 + yoe / 4 - yoe / 100 + doy
    era * 146097L + doe - 719468L
  }

  private def isLeap(y: Int): Boolean = (y % 4 == 0 && y % 100 != 0) || y % 400 == 0

  private val DaysInMonth = Array(31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)

  /** Parse bytes of `yyyy-MM-dd-HH.mm.ss[.frac]` → micros since epoch,
    * or Long.MinValue on any malformed input (null at the SQL layer).
    * Reads straight off the UTF8String's backing memory — the previous
    * `getBytes` materialized a fresh 26-byte array per value (a copy
    * allocation per timestamp field per row on the parse hot path). */
  def parseMicros(s: UTF8String): Long =
    parseMicros(s.getBaseObject, s.getBaseOffset, s.numBytes())

  /** Raw-memory variant (shared by the fused fixed→Avro encoder, which
    * slices fields as (base, offset, len) without UTF8String wrappers). */
  def parseMicros(base: AnyRef, off: Long, n: Int): Long = {
    if (n < 19) return Long.MinValue
    @inline def b(i: Int): Byte = org.apache.spark.unsafe.Platform.getByte(base, off + i)
    @inline def dig(i: Int): Int = {
      val c = b(i) - '0'
      if (c < 0 || c > 9) -1 else c
    }
    @inline def two(i: Int): Int = {
      val a = dig(i); val c = dig(i + 1)
      if (a < 0 || c < 0) -1 else a * 10 + c
    }
    if (b(4) != '-' || b(7) != '-' || b(10) != '-' || b(13) != '.' || b(16) != '.')
      return Long.MinValue
    val y1 = two(0); val y2 = two(2)
    if (y1 < 0 || y2 < 0) return Long.MinValue
    val year = y1 * 100 + y2
    val month = two(5); val day = two(8)
    val hour = two(11); val minute = two(14); val second = two(17)
    if (month < 1 || month > 12 || day < 1 || hour > 23 || minute > 59 || second > 59 ||
        month == 0 || hour < 0 || minute < 0 || second < 0)
      return Long.MinValue
    val dim = if (month == 2 && isLeap(year)) 29 else DaysInMonth(month - 1)
    if (day > dim) return Long.MinValue
    // optional fraction: '.' + 1..6 digits, nothing after
    var micros = 0L
    if (n > 19) {
      if (b(19) != '.' || n == 20 || n > 26) return Long.MinValue
      var i = 20
      var v = 0
      while (i < n) {
        val c = dig(i)
        if (c < 0) return Long.MinValue
        v = v * 10 + c
        i += 1
      }
      var digits = n - 20
      var scaled = v.toLong
      while (digits < 6) { scaled *= 10; digits += 1 }
      micros = scaled
    }
    val days = daysFromCivil(year, month, day)
    (days * 86400L + hour * 3600L + minute * 60L + second) * MicrosPerSecond + micros
  }

  /** micros since epoch → `yyyy-MM-dd-HH.mm.ss.SSSSSS` (always 26 chars,
    * the reference's render width; Hinnant civil_from_days). */
  def formatMicros(micros: Long): UTF8String = {
    val secs = Math.floorDiv(micros, MicrosPerSecond)
    val frac = Math.floorMod(micros, MicrosPerSecond)
    val days = Math.floorDiv(secs, 86400L)
    val sod = Math.floorMod(secs, 86400L).toInt
    // civil_from_days
    val z = days + 719468L
    val era = (if (z >= 0) z else z - 146096L) / 146097L
    val doe = z - era * 146097L
    val yoe = (doe - doe / 1460 + doe / 36524 - doe / 146096) / 365
    val y0 = yoe + era * 400
    val doy = doe - (365 * yoe + yoe / 4 - yoe / 100)
    val mp = (5 * doy + 2) / 153
    val d = doy - (153 * mp + 2) / 5 + 1
    val m = if (mp < 10) mp + 3 else mp - 9
    val y = if (m <= 2) y0 + 1 else y0
    // The 26-byte layout holds 4 year digits: outside 0000-9999 the
    // put2 arithmetic would emit non-digit bytes (':', '/') and the
    // corrupt "timestamp" would pass every downstream width check and
    // be WRITTEN silently — fail loudly instead, like parseMicros
    // bounds its inputs.
    if (y < 0L || y > 9999L) throw new IllegalArgumentException(
      s"format_ref_timestamp: year $y outside the renderable 0000-9999 " +
        s"(micros=$micros); the reference's fixed 26-byte layout cannot hold it")
    val out = new Array[Byte](26)
    @inline def put2(i: Int, v: Int): Unit = {
      out(i) = ('0' + v / 10).toByte; out(i + 1) = ('0' + v % 10).toByte
    }
    val yi = y.toInt
    put2(0, yi / 100); put2(2, yi % 100)
    out(4) = '-'; put2(5, m.toInt); out(7) = '-'; put2(8, d.toInt)
    out(10) = '-'; put2(11, sod / 3600); out(13) = '.'
    put2(14, (sod % 3600) / 60); out(16) = '.'; put2(17, sod % 60); out(19) = '.'
    var f = frac.toInt
    var i = 25
    while (i >= 20) { out(i) = ('0' + f % 10).toByte; f /= 10; i -= 1 }
    UTF8String.fromBytes(out)
  }

  /** string → Unix SECONDS as long (micros floor-div 1e6), null on
    * malformed input — TIMEZONE-FREE, for the Compat F1 lane: the
    * previous `unix_timestamp(ntz.cast(TimestampType))` route
    * interprets the wall-clock in spark.sql.session.timeZone, so any
    * caller on a non-UTC session got values shifted off the reference
    * (which parses against UTC, `time.Parse`'s zero location).
    * floorDiv matches unix_timestamp's pre-epoch floor. */
  case class ParseRefSeconds(child: Expression) extends UnaryExpression
      with ImplicitCastInputTypes {
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "parse_ref_seconds"

    override def nullSafeEval(input: Any): Any = {
      val v = parseMicros(input.asInstanceOf[UTF8String])
      if (v == Long.MinValue) null else Math.floorDiv(v, MicrosPerSecond)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val tmp = ctx.freshName("micros")
        s"""
           |long $tmp = graft.functions.RefTimestamp.parseMicros($c);
           |if ($tmp == Long.MIN_VALUE) { ${ev.isNull} = true; }
           |else { ${ev.value} = java.lang.Math.floorDiv($tmp, ${MicrosPerSecond}L); }
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): ParseRefSeconds =
      copy(child = c)
  }

  def parse_ref_seconds(c: Column): Column =
    ColumnBridge.column(ParseRefSeconds(ColumnBridge.expression(c)))

  /** string → TimestampNTZ (micros), null on malformed input. */
  case class ParseRefTimestamp(child: Expression) extends UnaryExpression
      with ImplicitCastInputTypes {
    // SQL surface: coerce to string (Spark string-function convention)
    // instead of CCEing on the UTF8String cast.
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = TimestampNTZType
    override def nullable: Boolean = true
    override def prettyName: String = "parse_ref_timestamp"

    override def nullSafeEval(input: Any): Any = {
      val v = parseMicros(input.asInstanceOf[UTF8String])
      if (v == Long.MinValue) null else v
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val tmp = ctx.freshName("micros")
        s"""
           |long $tmp = graft.functions.RefTimestamp.parseMicros($c);
           |if ($tmp == Long.MIN_VALUE) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): ParseRefTimestamp =
      copy(child = c)
  }

  /** TimestampNTZ/Timestamp (micros) → reference-format string. */
  case class FormatRefTimestamp(child: Expression) extends UnaryExpression {
    // Exact type MEMBERSHIP, not coercion: all three accepted types
    // carry micros in their internal long, but an implicit
    // long->timestamp or timestamp->long CAST would reinterpret
    // micros as SECONDS — a silent 1e6x error. Anything else fails
    // at analysis instead of CCEing mid-query (the SQL surface can
    // hand this arbitrary types).
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case LongType | TimestampNTZType | TimestampType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"format_ref_timestamp requires a micros BIGINT, TIMESTAMP_NTZ, or " +
          s"TIMESTAMP argument, got ${other.catalogString}")
    }
    override def dataType: DataType = StringType
    override def prettyName: String = "format_ref_timestamp"

    override def nullSafeEval(input: Any): Any =
      formatMicros(input.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.RefTimestamp.formatMicros($c)")

    override protected def withNewChildInternal(c: Expression): FormatRefTimestamp =
      copy(child = c)
  }

  def parse_ref_timestamp(c: Column): Column =
    ColumnBridge.column(ParseRefTimestamp(ColumnBridge.expression(c)))

  def format_ref_timestamp(c: Column): Column =
    ColumnBridge.column(FormatRefTimestamp(ColumnBridge.expression(c)))
}
