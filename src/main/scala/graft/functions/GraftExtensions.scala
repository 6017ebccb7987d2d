package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point — the deployment path for the
  * engine's native Catalyst functions on a shared cluster:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions ...
  * }}}
  *
  * injects `rolling_fingerprint` and `char_shingles` into every
  * session built from that config, so pure-SQL users get them without
  * any driver-side `register` call (the per-session
  * `RollingFingerprint.register` / `CharShingleGenerator.register`
  * remain for notebook/test use). Injection happens at extension
  * build time — before any query runs — which is the supported hook
  * for catalog-visible functions, optimizer rules, and planner
  * strategies (SURVEY.md §4.3: no custom Rule/Strategy is *required*
  * for parity; functions are the one extension the engine ships).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("rolling_fingerprint"),
      new ExpressionInfo(classOf[RollingFingerprint].getName,
        "rolling_fingerprint"),
      (exprs: Seq[Expression]) => RollingFingerprint.builder(exprs)))
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => VecDot.builder(exprs)))
    e.injectFunction((
      FunctionIdentifier("distinct_shingles"),
      new ExpressionInfo(classOf[DistinctShingleCount].getName,
        "distinct_shingles"),
      (exprs: Seq[Expression]) => DistinctShingleCount.builder(exprs)))
    e.injectFunction((
      FunctionIdentifier("char_shingles"),
      new ExpressionInfo(classOf[CharShingleGenerator].getName,
        "char_shingles"),
      (exprs: Seq[Expression]) => CharShingleGenerator.builder(exprs)))
  }
}
