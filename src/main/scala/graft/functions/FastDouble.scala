package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Allocation-free string→double parse for fixed-width numeric fields,
  * with `try_cast(... as double)` semantics (null on failure).
  *
  * Spark's string→double cast materializes a `java.lang.String` per value
  * and calls `Double.parseDouble` — two allocations plus a general-form
  * parse for every row. Fixed-width feeds are overwhelmingly plain
  * decimals (`[+-]?digits[.digits]?`), which this expression parses
  * straight from the UTF-8 bytes: mantissa accumulated in a long capped
  * at 15 significant digits (< 2^53, so exact in double), then ONE
  * correctly-rounded division by an exactly-representable power of ten.
  * A single correctly-rounded operation on exact inputs equals the
  * correctly-rounded value of the decimal itself — bit-identical to
  * `Double.parseDouble` — so the fast path cannot diverge from the cast.
  * Anything else (exponents, >15 digits, specials, garbage) falls back
  * to the cast's own surface: trim → special literals (nan/inf…)
  * case-insensitively → `parseDouble`, null on failure. A property spec
  * pins `fast_try_double(s) === try_cast(s as double)` on adversarial
  * inputs.
  */
object FastDouble {

  // 10^0..10^22 are exactly representable in double (5^22 < 2^53).
  private val Pow10: Array[Double] = Array.tabulate(23)(i => math.pow(10d, i))

  /** Fast-path sentinel: NaN bits. Unreachable from the fast path itself
    * (digit mantissas and exact power-of-ten divisions are always
    * finite), so it unambiguously means "needs the slow surface". */
  final val FallbackBits = 0x7ff8000000000000L

  /** Raw-memory fast path: bits of the parsed double, or [[FallbackBits]]
    * when the input needs the slow surface (exponents, >15 significant
    * digits, specials, garbage). Shared by [[tryParse]] and the fused
    * fixed→Avro encoder, which slices fields as (base, offset, len)
    * without UTF8String wrappers. */
  def fastBits(base: AnyRef, off: Long, n: Int): Long = {
    @inline def at(i: Int): Byte = org.apache.spark.unsafe.Platform.getByte(base, off + i)
    var i = 0
    var neg = false
    if (n > 0) {
      val b0 = at(0)
      if (b0 == '-') { neg = true; i = 1 } else if (b0 == '+') i = 1
    }
    var m = 0L
    var anyDigit = false
    var frac = -1 // digits seen after the dot; -1 = no dot yet
    var fast = i < n
    var j = i
    while (fast && j < n) {
      val b = at(j)
      if (b >= '0' && b <= '9') {
        anyDigit = true
        // cap at 15 significant digits: m stays < 2^53 (exact in double)
        if (m >= 100000000000000L) fast = false
        else {
          m = m * 10 + (b - '0')
          if (frac >= 0) {
            frac += 1
            // Pow10 tops out at 10^22 — and frac counts LEADING
            // fractional zeros the significant-digit cap never sees
            // (m stays 0), so '0.00000000000000000000005' would
            // otherwise index Pow10(23): AIOOBE, not a fallback.
            if (frac > 22) fast = false
          }
        }
      } else if (b == '.' && frac < 0) frac = 0
      else fast = false
      j += 1
    }
    if (fast && anyDigit) {
      val v = if (frac <= 0) m.toDouble else m.toDouble / Pow10(frac)
      java.lang.Double.doubleToRawLongBits(if (neg) -v else v)
    } else FallbackBits
  }

  /** Boxed Double, or null on parse failure — `try_cast` semantics. */
  def tryParse(s: UTF8String): java.lang.Double = {
    val bits = fastBits(s.getBaseObject, s.getBaseOffset, s.numBytes())
    if (bits != FallbackBits) java.lang.Double.valueOf(java.lang.Double.longBitsToDouble(bits))
    else slowParse(s)
  }

  /** The cast's general surface (Cast.processFloatingPointSpecialLiterals
    * shape): trim, special literals, else parseDouble; null on failure. */
  private def slowParse(s: UTF8String): java.lang.Double = {
    val str = s.toString.trim
    str.toLowerCase(java.util.Locale.ROOT) match {
      case "inf" | "+inf" | "infinity" | "+infinity" =>
        java.lang.Double.valueOf(Double.PositiveInfinity)
      case "-inf" | "-infinity" =>
        java.lang.Double.valueOf(Double.NegativeInfinity)
      case "nan" => java.lang.Double.valueOf(Double.NaN)
      case _ =>
        try java.lang.Double.valueOf(java.lang.Double.parseDouble(str))
        catch { case _: NumberFormatException => null }
    }
  }

  case class FastTryDouble(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "fast_try_double"

    override def nullSafeEval(input: Any): Any =
      tryParse(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, in => {
        val tmp = ctx.freshName("parsed")
        s"""java.lang.Double $tmp = graft.functions.FastDouble.tryParse($in);
           |if ($tmp == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $tmp.doubleValue(); }""".stripMargin
      })

    override protected def withNewChildInternal(c: Expression): FastTryDouble =
      copy(child = c)
  }

  def fast_try_double(c: Column): Column =
    ColumnBridge.column(FastTryDouble(ColumnBridge.expression(c)))
}
