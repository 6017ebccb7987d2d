package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** In-order dot product of two FLOAT-array columns as one fused loop —
  * bit-identical to the composable [[Funcs.dotProduct]]
  * (`zip_with` + `aggregate`): each element pair is widened to double,
  * multiplied, and accumulated left-to-right from 0.0, so the IEEE
  * result (and therefore every rounded cosine derived from it) is
  * unchanged. The win is mechanical: Catalyst higher-order functions
  * evaluate their lambda per element through the interpreter, while
  * this compiles to a primitive loop — the similarity/dedup pair joins
  * (dd06/dd08/ss01-ss03) run one to three of these folds per pair.
  *
  * Usable from the Column API via
  * `call_function("vec_dot", a, b)` after [[VecDot.register]] (the
  * public Column↔Expression bridge is private[sql] in Spark 4; the
  * function registry is the supported route).
  */
object VecDotOps {
  /** Null (boxed) on length mismatch — the composable form's
    * `zip_with` pads the shorter side with nulls, which nulls the
    * whole fold; reading past the shorter array here would silently
    * return garbage instead. */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    Double.box(acc)
  }
}

case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // strict ARRAY<FLOAT> inputs: the loop reads via ArrayData.getFloat,
  // so an ARRAY<DOUBLE> argument from plain SQL would reinterpret the
  // wrong 4 bytes per element and return garbage numbers — fail at
  // analysis time instead
  override def inputTypes =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // can return null on length mismatch even for non-nullable inputs —
  // without this, nullSafeCodeGen's non-nullable branch never declares
  // the isNull variable the generated code assigns (janino error)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecDotOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
       |java.lang.Double ${ev.value}Boxed = graft.functions.VecDotOps.dot($a, $b);
       |if (${ev.value}Boxed == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = ${ev.value}Boxed.doubleValue(); }
     """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  /** Validating builder shared by register() and GraftExtensions —
    * wrong arity gets a named error at plan time, not a raw
    * IndexOutOfBoundsException (arbitrary SQL reaches this on a
    * shared cluster). */
  def builder(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(a, b) => VecDot(a, b)
    case _ => throw new IllegalArgumentException(
      s"vec_dot(a, b) requires exactly two arguments, got ${exprs.length}")
  }

  /** Registers `vec_dot(a, b)`. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", builder, "scala_udf")
}
