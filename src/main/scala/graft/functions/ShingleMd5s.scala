package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct `width`-codepoint shingle md5 prefixes of the first
  * `prefixLen` codepoints of a string, as ARRAY<BIGINT> — the fused
  * native form of
  * `transform(array_distinct(charShingles(substring(s,1,prefixLen),
  * width)), x -> md5Long(x, hexDigits))` (spec-asserted equal as a
  * SET; the consumers — MinHash min, SimHash sum — are
  * order-insensitive). One loop, a thread-local digest, and no
  * intermediate string array; md5 bytes and the hex-prefix long are
  * identical to Spark's `md5` + `conv` on the same UTF-8 bytes, so the
  * DuckDB oracles are unchanged.
  */
object ShingleMd5Ops {
  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** First `hexDigits` hex chars of md5(bytes) as a long. */
  private def md5Prefix(md: MessageDigest, bytes: Array[Byte],
      hexDigits: Int): Long = {
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < hexDigits) {
      val b = d(i / 2) & 0xff
      val nibble = if (i % 2 == 0) b >>> 4 else b & 0xf
      v = (v << 4) | nibble
      i += 1
    }
    v
  }

  def shingleMd5s(u: UTF8String, prefixLen: Int, width: Int,
      hexDigits: Int): GenericArrayData = {
    val full = u.toString
    // substring(s, 1, prefixLen) semantics: first prefixLen codepoints
    val s =
      if (full.codePointCount(0, full.length) <= prefixLen) full
      else full.substring(0, full.offsetByCodePoints(0, prefixLen))
    val nCp = s.codePointCount(0, s.length)
    val offsets = CodePoints.offsets(s)
    val windows = math.max(nCp - width + 1, 1)
    val seen = new java.util.LinkedHashSet[String](windows * 2)
    var w = 0
    while (w < windows) {
      val end = math.min(w + width, nCp)
      seen.add(s.substring(offsets(w), offsets(end)))
      w += 1
    }
    val md = digests.get()
    val out = new Array[Long](seen.size)
    var j = 0
    val it = seen.iterator()
    while (it.hasNext) {
      out(j) = md5Prefix(md, it.next().getBytes(StandardCharsets.UTF_8),
        hexDigits)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct whitespace-token md5 prefixes, first-occurrence order —
    * the fused form of
    * `transform(array_distinct(filter(split(s," ",-1), t->len(t)>0)),
    * t -> md5Long(t, hexDigits))`. */
  def tokenMd5s(u: UTF8String, hexDigits: Int): GenericArrayData = {
    val parts = u.toString.split(" ", -1)
    val seen = new java.util.LinkedHashSet[String](parts.length * 2)
    var i = 0
    while (i < parts.length) {
      if (parts(i).nonEmpty) seen.add(parts(i))
      i += 1
    }
    val md = digests.get()
    val out = new Array[Long](seen.size)
    var j = 0
    val it = seen.iterator()
    while (it.hasNext) {
      out(j) = md5Prefix(md, it.next().getBytes(StandardCharsets.UTF_8),
        hexDigits)
      j += 1
    }
    new GenericArrayData(out)
  }
}

case class ShingleMd5s(child: Expression, prefixLen: Int, width: Int,
    hexDigits: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_md5s"

  override protected def nullSafeEval(input: Any): Any =
    ShingleMd5Ops.shingleMd5s(input.asInstanceOf[UTF8String],
      prefixLen, width, hexDigits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleMd5Ops.shingleMd5s(" +
        s"$c, $prefixLen, $width, $hexDigits);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `token_md5s(text)` — distinct whitespace-token md5-prefix hashes as
  * ARRAY<BIGINT>, first-occurrence order. Fused twin of the composable
  * `transform(array_distinct(Funcs.tokens(text)), t -> md5Long(t, n))`
  * (spec-asserted bit-equal, order included). The composable chain is
  * built from higher-order functions, which are CodegenFallback — one
  * of them in a projection drags every co-resident expression (the
  * SimHash vote, the MinHash bank) out of whole-stage codegen; this
  * expression keeps the token-hash prep codegen-able. */
case class TokenMd5s(child: Expression, hexDigits: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_md5s"

  override protected def nullSafeEval(input: Any): Any =
    ShingleMd5Ops.tokenMd5s(input.asInstanceOf[UTF8String], hexDigits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleMd5Ops.tokenMd5s($c, $hexDigits);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
