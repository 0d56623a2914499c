package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64 MinHash permutation minima of a shingle array in ONE pass.
  *
  * Bit-identical to the declarative formulation it replaces
  * (explode(sh) → `hash(s)` murmur3 rows → 64 `min((h·aⱼ+bⱼ) mod p)`
  * aggregators grouped by document → array-pack): per shingle
  * occurrence the hash is Spark's own Murmur3 (seed 42) over the
  * UTF-8 bytes masked to 31 bits — literally the same
  * `Murmur3_x86_32.hashUnsafeBytes` call `hash(col)` generates — and
  * each permutation's running minimum lives in a stack array per
  * DOCUMENT instead of a 64-column aggregation buffer behind a
  * token-count-scale exchange. The signature exists map-side before
  * anything shuffles; the only exchanges left in the LSH cascade are
  * the id-scale banded candidate join and the verify re-attach (the
  * same shape [[SimHash]] bought the simhash family in r17).
  *
  * Edge parity with the old chain, both spec-pinned:
  *  - a NULL shingle element hashed to the seed (Spark's `hash(null)`
  *    = 42) and voted into every permutation — reproduced, not
  *    skipped;
  *  - a document with an EMPTY (or null) shingle array produced no
  *    rows after the explode and was ABSENT from the signature frame —
  *    the expression returns NULL and [[graft.ops.Dedup.minhashSigs]]
  *    filters it, preserving absent-doc semantics (and the persisted
  *    band-store artifact's contents) exactly.
  */
object MinHash {

  /** Called from both eval and generated code. Returns null for an
    * empty array (absent-doc semantics — see class doc). */
  def signature(sh: ArrayData, a: Array[Long], b: Array[Long], p: Long): ArrayData = {
    val n = sh.numElements()
    if (n == 0) return null
    val k = a.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h: Long =
        if (sh.isNullAt(i)) 42L // Spark hash(null) = the seed
        else {
          val s = sh.getUTF8String(i)
          org.apache.spark.unsafe.hash.Murmur3_x86_32
            .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42)
            .toLong & 0x7fffffffL
        }
      var j = 0
      while (j < k) {
        val v = (h * a(j) + b(j)) % p
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  case class MinHash64(child: Expression, a: Array[Long], b: Array[Long], p: Long)
      extends UnaryExpression with ImplicitCastInputTypes {
    require(a.length == b.length, "minhash64: coefficient arrays must align")
    override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash64"
    override def nullable: Boolean = true
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(input: Any): Any =
      signature(input.asInstanceOf[ArrayData], a, b, p)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val aRef = ctx.addReferenceObj("mhA", a, "long[]")
      val bRef = ctx.addReferenceObj("mhB", b, "long[]")
      nullSafeCodeGen(ctx, ev, sh => s"""
        ${ev.value} = graft.functions.MinHash.signature($sh, $aRef, $bRef, ${p}L);
        ${ev.isNull} = ${ev.value} == null;""")
    }

    override protected def withNewChildInternal(c: Expression): MinHash64 =
      copy(child = c)
  }

  def minhash64(sh: Column, a: Array[Long], b: Array[Long], p: Long): Column =
    ColumnBridge.column(MinHash64(ColumnBridge.expression(sh), a, b, p))
}
