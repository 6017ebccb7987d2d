package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` for multiclass Shannon entropy (natural log) of
  * a collection of label counts — the reference's
  * `entropy(counts: Iterable[Int])` (`KmeansVirus.scala:199-206`,
  * duplicated at `SVMDT.scala:291-298`), SURVEY §2.9.
  *
  * IN = one label's count; BUF = (Σn, Σ n·ln n); OUT = entropy.
  * Uses the algebraic identity
  * H = -Σ (n/N) ln(n/N) = ln N − (Σ n ln n)/N,
  * so the buffer is constant-size and merges associatively — a
  * streaming-friendly sketch rather than the reference's
  * collect-all-counts closure. Zero counts are ignored (the reference
  * filters them). Register with `udaf(...)` for SQL use.
  */
class EntropyAggregator extends Aggregator[Long, (Long, Double), Double] {
  override def zero: (Long, Double) = (0L, 0.0)
  override def reduce(b: (Long, Double), n: Long): (Long, Double) =
    if (n <= 0L) b else (b._1 + n, b._2 + n * math.log(n.toDouble))
  override def merge(a: (Long, Double), b: (Long, Double)): (Long, Double) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(b: (Long, Double)): Double =
    if (b._1 == 0L) 0.0 else math.log(b._1.toDouble) - b._2 / b._1
  override def bufferEncoder: Encoder[(Long, Double)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
