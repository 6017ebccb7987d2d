package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused native sketch expressions over a pre-hashed `ARRAY<BIGINT>`
  * column — the MinHash signature bank and the SimHash bit vote, each
  * as ONE loop per row.
  *
  * The composable forms (16 × `array_min(transform(hs, ...))`,
  * 32 × `aggregate(hs, ...)` bit votes) are semantically identical and
  * remain the spec oracle, but Catalyst higher-order functions run
  * their lambda per element through the interpreter and allocate an
  * intermediate array per signature/bit — 16-48 interpreted passes per
  * row on the dedup hot path (dd02/dd03/dd04/dd07). Values are
  * bit-identical (pure int64 arithmetic, same traversal order), so the
  * DuckDB oracles are unchanged.
  */
object HashSketchOps {
  /** sigs[j] = min over h of (h * a(j) + b(j)) mod P; null-free input
    * expected (md5-derived). Returns null for an empty array, matching
    * `array_min` of an empty transform. */
  def minhash(hs: ArrayData, as: Array[Long], bs: Array[Long],
      p: Long): ArrayData = {
    val n = hs.numElements()
    if (n == 0) return null
    val k = as.length
    val sigs = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < k) {
        val v = (h * as(j) + bs(j)) % p
        if (v < sigs(j)) sigs(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sigs)
  }

  /** Bit b of the result is set iff sum over h of ((h>>b)&1)*2-1 > 0. */
  def simhash(hs: ArrayData, bits: Int): Long = {
    val n = hs.numElements()
    val votes = new Array[Int](bits)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var b = 0
      while (b < bits) {
        votes(b) += (((h >> b) & 1L).toInt * 2) - 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** `minhash_sigs(hs)` — the signature bank as ARRAY<BIGINT> of length
  * params.k, in parameter order (j = array index). */
case class MinHashSigs(child: Expression, params: Seq[(Long, Long)], p: Long)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  // returns null for an empty input array (matching array_min of an
  // empty transform) even when the child is non-nullable — without
  // this, nullSafeCodeGen's non-nullable branch never declares the
  // isNull variable the generated code assigns (janino error →
  // silent codegen fallback), and the interpreted path would return
  // a null the expression doesn't declare
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sigs"

  private lazy val as = params.map(_._1).toArray
  private lazy val bs = params.map(_._2).toArray

  override protected def nullSafeEval(input: Any): Any =
    HashSketchOps.minhash(input.asInstanceOf[ArrayData], as, bs, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("minhashAs", as, "long[]")
    val bsRef = ctx.addReferenceObj("minhashBs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.HashSketchOps.minhash($c, $asRef, $bsRef, ${p}L);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `simhash64(hs, bits)` — the SimHash bit vote as BIGINT. */
case class SimHashBits(child: Expression, bits: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    HashSketchOps.simhash(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashSketchOps.simhash($c, $bits);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
