package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the rolling polynomial document
  * fingerprint: h = (h*31 + codepoint) mod 2147483647 over the
  * string's Unicode code points, left to right.
  *
  * Same values as the composable form in [[Funcs.fingerprint]]
  * (sequence/substring/ascii/aggregate), but with `doGenCode` it
  * compiles to a single Java loop inside whole-stage codegen instead
  * of materializing a length-N integer array per row — the preference
  * order of SURVEY §2.9/§7.3: built-ins first, a custom `Expression`
  * where the built-in composition is the hot-path bottleneck.
  */
case class RollingFingerprint(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_fingerprint"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      h = (h * 31L + cp) % 2147483647L
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("fpStr")
      val h = ctx.freshName("fpH")
      val i = ctx.freshName("fpI")
      val cp = ctx.freshName("fpCp")
      s"""
         |java.lang.String $s = $c.toString();
         |long $h = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $i += java.lang.Character.charCount($cp);
         |  $h = ($h * 31L + $cp) % 2147483647L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingFingerprint {
  /** Validating builder shared by register() and GraftExtensions —
    * wrong arity gets a named error, not a head-of-empty crash. */
  def builder(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(s) => RollingFingerprint(s)
    case _ => throw new IllegalArgumentException(
      s"rolling_fingerprint(str) requires exactly one argument, " +
        s"got ${exprs.length}")
  }

  /** Registers `rolling_fingerprint(str)` as a session temp function
    * (the public Column↔Expression bridge is private[sql] in Spark 4;
    * the function registry is the supported route). Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_fingerprint", builder, "scala_udf")
}
