package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Property tests for the round-9 operators — the local complement of
  * the driver's DuckDB hash gate. The bloom decontamination pair
  * (ta23/st17) gets the ApproxBoundsSpec treatment: the sketch's
  * one-sided guarantee (no false negatives) is asserted exactly, and
  * the false-positive rate is asserted against a band well above the
  * configured theoretical rate but far below useless.
  */
class Round9OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, d)

  import graft.functions.BloomGate
  import graft.operators.TextAnalysis.{benchSample, wordNgrams, ContamN, DeconHoldoutN}
  import graft.functions.Funcs.tokens

  private lazy val docs = graft.Tables.documents(spark, d)
  private def gramsOf(df: org.apache.spark.sql.DataFrame) = df
    .filter(size(tokens(col("text"))) >= ContamN)
    .select(col("doc_id"), explode(array_distinct(
      wordNgrams(tokens(col("text")), ContamN))).as("g"))

  test("bloom gate has NO false negatives and a banded FP rate") {
    val holdout = benchSample(docs, DeconHoldoutN).localCheckpoint()
    val hGrams = gramsOf(holdout).select("g").distinct().localCheckpoint()
    val bloom = BloomGate.build(hGrams, xxhash64(col("g")))
    // one-sided guarantee: every inserted gram must test positive
    val misses = hGrams
      .filter(!BloomGate.mightContain(bloom, xxhash64(col("g"))))
      .count()
    assert(misses == 0, s"bloom lost $misses inserted grams")
    // FP band: known-negative grams (train grams NOT in the holdout
    // set, exactly) passing the prefilter. Geometry is ~10.5
    // bits/item at FULL load (Items insertions) ≈ 0.8% theoretical;
    // the actual load here is far lighter, so 5% is a loose
    // regression band, not a tuned constant.
    val train = docs.join(holdout.select("doc_id"), Seq("doc_id"), "left_anti")
    val negatives = gramsOf(train).select("g").distinct()
      .join(hGrams, Seq("g"), "left_anti")
      .localCheckpoint()
    val nNeg = negatives.count()
    val nFp = negatives
      .filter(BloomGate.mightContain(bloom, xxhash64(col("g"))))
      .count()
    assert(nNeg > 1000, s"fixture too small for an FP estimate: $nNeg")
    val rate = nFp.toDouble / nNeg
    assert(rate < 0.05, s"bloom FP rate $rate ($nFp/$nNeg) out of band")
  }

  test("em12 covariance eigensolve reproduces ml07's explained variance") {
    // the sufficient statistics are now hash-gated; this pins the
    // only un-gated remainder — the eigendecomposition — by solving
    // em12's (quantized) covariance independently with breeze and
    // matching ml07's explained-variance ratios. u6 quantization of
    // 64² entries perturbs eigenvalues well under the 1e-3 band.
    val rows = q("em12_pca_suffstats").collect()
    val dims = rows.map(_.getInt(0)).max + 1
    assert(dims == 64 && rows.length == dims * (dims + 1) / 2)
    val cov = Array.ofDim[Double](dims, dims)
    rows.foreach { r =>
      val (i, j, c) = (r.getInt(0), r.getInt(1), r.getLong(4) / 1e6)
      cov(i)(j) = c; cov(j)(i) = c
    }
    val ev = breeze.linalg.eigSym(
        breeze.linalg.DenseMatrix.tabulate(dims, dims)((i, j) => cov(i)(j)))
      .eigenvalues.toArray.sorted.reverse
    val tot = ev.sum
    val ml07 = q("ml07_pca_variance").collect().map(_.getDouble(1))
    ev.take(ml07.length).map(_ / tot).zip(ml07).zipWithIndex.foreach {
      case ((ours, theirs), k) =>
        assert(math.abs(ours - theirs) < 1e-3,
          s"component $k: eigensolve $ours vs ml07 $theirs")
    }
  }

  test("ta23 equals the bloom-free exact overlap; st17 is its projection") {
    // exact recompute with NO bloom anywhere: the gate's output may
    // not depend on the sketch (false positives must all die in the
    // confirm join)
    val holdout = benchSample(docs, DeconHoldoutN).localCheckpoint()
    val hGrams = gramsOf(holdout).select("g").distinct()
    val train = docs.join(holdout.select("doc_id"), Seq("doc_id"), "left_anti")
    val exact = gramsOf(train)
      .join(hGrams, Seq("g"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ta23 = q("ta23_bloom_decontaminate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(ta23.map(t => t._1 -> t._3).toMap == exact,
      "ta23 hits diverge from the bloom-free exact overlap")
    ta23.foreach { case (id, nGrams, nHit) =>
      assert(nHit >= 1 && nHit <= nGrams, s"doc $id: $nHit/$nGrams")
    }
    val st17 = q("st17_stream_bloom_decontaminate").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(st17 == exact, "st17 stream gate diverges from the batch rule")
  }
}
