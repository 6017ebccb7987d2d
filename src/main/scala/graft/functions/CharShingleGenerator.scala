package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, Generator, GenericInternalRow, Literal, UnaryExpression}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Table-generating function for sliding-window character shingles —
  * the reference's P3 n-gram path (`FeatureSelectionCloud.scala:306,
  * 314`, `sliding(14)`) as a true Catalyst `Generator` (SURVEY §2.9's
  * stretch goal): rows stream out of `eval` one at a time instead of
  * materializing a length-N array per input row, which is what the
  * composable `explode(charShingles(...))` form does.
  *
  * Semantics match [[Funcs.charShingles]] exactly: strings shorter
  * than the window emit one (truncated) shingle; otherwise
  * len−width+1 shingles in order.
  */
case class CharShingleGenerator(child: Expression, width: Int)
    extends UnaryExpression with Generator with CodegenFallback
    with ExpectsInputTypes {

  require(width > 0, "shingle width must be positive")

  override def inputTypes = Seq(StringType)

  override def elementSchema: StructType =
    StructType(StructField("shingle", StringType) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val s = v.asInstanceOf[UTF8String].toString
      if (s.length <= width)
        Seq(new GenericInternalRow(Array[Any](UTF8String.fromString(s))))
      else
        (0 to s.length - width).iterator.map { i =>
          new GenericInternalRow(
            Array[Any](UTF8String.fromString(s.substring(i, i + width))))
        }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharShingleGenerator {
  /** Validating builder shared by register() and GraftExtensions —
    * bad arity / non-literal width gets a named error, not a raw CCE
    * (arbitrary SQL reaches this on a shared cluster). */
  def builder(exprs: Seq[Expression]): Expression = {
    val width = exprs match {
      case Seq(_, Literal(w: Int, _)) => w
      case _ => throw new IllegalArgumentException(
        "char_shingles(str, width) requires exactly two arguments " +
          "with width an integer literal")
    }
    CharShingleGenerator(exprs.head, width)
  }

  /** Registers `char_shingles(str, width)` (width must be a literal).
    * Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_shingles", builder, "scala_udf")
}
