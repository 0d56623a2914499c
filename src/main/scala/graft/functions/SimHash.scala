package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** 64-bit SimHash signature of a token array in ONE pass.
  *
  * Bit-identical to the declarative formulation it replaces
  * (explode(tokens) → md5 per token → 64 `sum(±1)` bit counters
  * grouped by document → sign-pack): per token occurrence (duplicates
  * vote once each, exactly like explode), the md5 digest's first four
  * bytes big-endian are the unsigned 32-bit `hi` half and bytes 4-7
  * the `lo` half — the same values `conv(substring(md5(t),1,8),16,10)`
  * / `(...,9,8)` produced — each of the 64 bits votes ±1 into a
  * per-document counter, and output bit k is set iff its counter is
  * strictly positive (a zero tie packs 0, matching `when(c > 0, …)`).
  *
  * What the one-pass form buys at scale: the declarative path
  * materialized one ROW per (document, token) through an exchange
  * whose aggregation buffers were 64 longs wide per document — a
  * token-count-sized shuffle feeding a 512-byte-per-group aggregate.
  * This expression keeps the 64 counters in a stack array per
  * DOCUMENT, map-side, zero shuffle: the signature exists before
  * anything moves, and the only exchange left in the dedup cascade is
  * the id-scale banded candidate join.
  *
  * Divergence note: a NULL token element is skipped (votes nothing).
  * The old Column chain's `when` fell to the `otherwise(-1)` branch on
  * null md5s — an accident of null propagation, unreachable through
  * [[graft.ops.Docs.tokens]] (filter(split) never yields null
  * elements) and not replicated. Empty arrays yield the (0, 0)
  * signature; callers that need the old explode semantics (document
  * with no tokens has NO signature) filter `size(toks) > 0`.
  */
object SimHash {

  private val mdLocal = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** Called from both eval and generated code. */
  def signature(toks: ArrayData): InternalRow = {
    val md = mdLocal.get()
    val counters = new Array[Int](64)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        md.reset()
        val d = md.digest(toks.getUTF8String(i).getBytes)
        val hi = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        val lo = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
          ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
        var k = 0
        while (k < 32) {
          counters(k) += (if (((hi >>> k) & 1L) == 1L) 1 else -1)
          counters(32 + k) += (if (((lo >>> k) & 1L) == 1L) 1 else -1)
          k += 1
        }
      }
      i += 1
    }
    var simHi = 0L
    var simLo = 0L
    var k = 0
    while (k < 32) {
      if (counters(k) > 0) simHi |= (1L << k)
      if (counters(32 + k) > 0) simLo |= (1L << k)
      k += 1
    }
    InternalRow(simHi, simLo)
  }

  case class SimHash64(child: Expression) extends UnaryExpression
      with ImplicitCastInputTypes {
    // SQL surface: coerce element types at analysis (string convention).
    override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = StructType(Seq(
      StructField("sim_hi", LongType, nullable = false),
      StructField("sim_lo", LongType, nullable = false)))
    override def prettyName: String = "simhash64"
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(input: Any): Any =
      signature(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, toks =>
        s"${ev.value} = graft.functions.SimHash.signature($toks);")

    override protected def withNewChildInternal(c: Expression): SimHash64 =
      copy(child = c)
  }

  def simhash64(toks: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(toks)))
}
