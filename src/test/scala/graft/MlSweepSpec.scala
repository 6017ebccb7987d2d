package graft

import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** L1 parity harnesses: `setRuns` emulation (best-of-N seeded fits)
  * and the range-parameterized k-sweep (reference sweeps 5..100 by 5,
  * `KmeansVirus.scala:165-173`). */
class MlSweepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bestOfKMeans cost is non-increasing in runs (setRuns parity)") {
    val data = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(array_to_vector(col("embedding")).as("features"))
      .coalesce(4).cache()
    data.count()
    val single = graft.ml.MlPipeline.bestOfKMeans(data, k = 8, runs = 1)
    val best = graft.ml.MlPipeline.bestOfKMeans(data, k = 8, runs = 4)
    // runs=4 tries seeds {42..45} ⊇ {42}, so its min WSSSE can only
    // improve on the single run
    assert(best.summary.trainingCost <= single.summary.trainingCost)
    // deterministic: same call, same model
    val again = graft.ml.MlPipeline.bestOfKMeans(data, k = 8, runs = 4)
    assert(again.summary.trainingCost == best.summary.trainingCost)
    data.unpersist(false)
  }

  test("kmeansCostSweep runs the reference's full 5..100-by-5 range") {
    val ks = (5 to 100 by 5).toSeq
    val got = graft.ml.MlPipeline
      .kmeansCostSweep(spark, "/root/testdata/sf0.001", ks)
      .collect()
    assert(got.map(_.getInt(0)).toSeq == ks)
    got.foreach(r => assert(r.getDouble(1) >= 0.0))
    // more clusters can only lower the (seed-best) WSSSE materially:
    // sanity that the widest k beats the narrowest
    assert(got.last.getDouble(1) <= got.head.getDouble(1))
  }
}
