package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q19's sketches are engine-specific, so no DuckDB oracle can hash
  * them — but their ERROR BOUNDS are not engine-specific. This spec is
  * the automated within-bound check: every estimate must sit inside
  * the bound its configuration promises, against the exact twins
  * computed on the same data.
  */
class ApproxBoundsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  test("q19 sketch estimates sit within their configured error bounds") {
    val approx = SparkEntry.queries("q19_approx")(spark, d)
      .select(col("l_returnflag"),
        col("approx_parts").cast("double"),
        col("p50_approx").cast("double"),
        col("p90_approx").cast("double"))
    val exact = graft.Tables.lineitem(spark, d)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).cast("double").as("exact_parts"),
        // percentile() is the exact aggregate — the sketch-free twin
        expr("percentile(l_quantity, array(0.48, 0.52, 0.88, 0.92))")
          .as("pcts"))
      .select(col("l_returnflag"), col("exact_parts"),
        col("pcts")(0).as("p50_lo"), col("pcts")(1).as("p50_hi"),
        col("pcts")(2).as("p90_lo"), col("pcts")(3).as("p90_hi"))
    val rows = approx.join(exact, "l_returnflag").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flag = r.getString(0)
      val (aParts, p50, p90) =
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      val eParts = r.getDouble(4)
      // HLL++ with default rsd = 0.05: |est − exact| ≤ 3·rsd·exact
      // covers ≈99.7% of draws; the seed is fixed, so this is a
      // regression gate, not a flaky sample
      assert(math.abs(aParts - eParts) <= 3 * 0.05 * eParts,
        s"$flag: approx_count_distinct $aParts vs exact $eParts " +
          "outside 3*rsd bound")
      // approx_percentile(accuracy=1000) guarantees rank error
      // ≤ n/1000 = 0.001·n; the returned element therefore lies
      // between the exact percentiles at q ∓ 0.02 (20x slack over the
      // guarantee, still a tight semantic band on this data)
      assert(r.getDouble(5) <= p50 && p50 <= r.getDouble(6),
        s"$flag: p50 estimate $p50 outside exact [q48, q52] band " +
          s"[${r.getDouble(5)}, ${r.getDouble(6)}]")
      assert(r.getDouble(7) <= p90 && p90 <= r.getDouble(8),
        s"$flag: p90 estimate $p90 outside exact [q88, q92] band " +
          s"[${r.getDouble(7)}, ${r.getDouble(8)}]")
    }
  }

  test("ss07 PQ-ADC recall@10 vs exact L2 clears its floor") {
    // the ss04 pattern for the PQ path: ADC ranks by an 8-bytes-per-
    // vector code, so it's lossy by design — this pins the measured
    // quality so a codebook/assignment regression (or a silent change
    // in the distance quantization) fails a test, not just a bench
    import org.apache.spark.sql.expressions.Window
    val pq = SparkEntry.queries("ss07_knn_pq")(spark, d)
      .select(col("query_id"), col("neighbor_id"))
    val e = Tables.embeddings(spark, d)
      .select(col("vec_id"), transform(col("embedding"),
        x => x.cast("double")).as("v"))
    val q = e.filter(col("vec_id") < graft.similarity.Similarity.NumQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val d2 = aggregate(zip_with(col("qv"), col("v"),
      (x, y) => (x - y) * (x - y)), lit(0.0), (a, x) => a + x)
    val w = Window.partitionBy("query_id")
      .orderBy(col("d2").asc, col("neighbor_id").asc)
    val exact = e.select(col("vec_id").as("neighbor_id"), col("v"))
      .crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), d2.as("d2"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 10)
      .select("query_id", "neighbor_id")
    val hits = pq.intersect(exact).count()
    val recall = hits.toDouble / exact.count()
    // deterministic data + fixed codebook → an EXACT per-fixture
    // number, pinned in FIXTURES.md §"Measured per-fixture constants"
    // (update BOTH on regeneration). Exact equality, not a floor: a
    // floor just under the measurement goes vacuous the moment the
    // fixture shifts, and stays silent if quality silently improves
    // for the wrong reason (e.g. the pruning stopped pruning).
    assert(recall == PqRecallAt10Sf0001,
      f"PQ ADC recall@10 = $recall%.2f, expected $PqRecallAt10Sf0001 " +
        "(fixture changed? update FIXTURES.md's measured constant)")
  }

  /** Measured on /root/testdata/sf0.001 (see FIXTURES.md §"Measured
    * per-fixture constants"): 5 queries × top-10, 10/50 ADC hits. */
  private val PqRecallAt10Sf0001 = 0.20

  test("ss14 exact re-rank recall dominates raw ADC recall") {
    // the point of the two-stage serve: re-ranking the C=30 ADC
    // shortlist with true distances must never LOSE recall vs taking
    // ADC's own top-10 (it can only promote true neighbors the
    // compressed metric misranked within the shortlist)
    def recallOf(name: String): Double = {
      val truth = SparkEntry.queries("ss01_knn_brute")(spark, d)
        .select(col("query_id"), col("neighbor_id"))
      val approx = SparkEntry.queries(name)(spark, d)
        .select(col("query_id"), col("neighbor_id"))
      truth.intersect(approx).count().toDouble / truth.count()
    }
    val adc = recallOf("ss07_knn_pq")
    val reranked = recallOf("ss14_pq_rerank")
    assert(reranked >= adc,
      f"re-rank recall $reranked%.2f fell below raw ADC $adc%.2f")
  }

  test("em06 PQ training SSE is non-increasing across Lloyd steps") {
    val sse = SparkEntry.queries("em06_pq_train_sse")(spark, d)
      .orderBy("step").collect().map(_.getLong(1))
    assert(sse.length == graft.operators.TextAnalysis.PqTrainSteps + 1)
    // slack: each SSE point is a sum of floor-quantized micro-unit
    // terms (±0.5/term) and centers are means of micro-quantized
    // coordinates (≤ 0.5e-6 shift/dim) — both effects bounded by one
    // u6 unit per (vector, subspace) term
    val nTerms = Tables.embeddings(spark, d).count() *
      graft.operators.TextAnalysis.PqM
    for (t <- 0 until sse.length - 1)
      assert(sse(t + 1) <= sse(t) + nTerms,
        s"SSE increased at step ${t + 1}: ${sse.mkString(", ")}")
    // the first recenter from the 4-point seed codebook must strictly
    // improve — a no-op step means the recenter isn't feeding back
    assert(sse(1) < sse(0), s"step 1 did not improve: ${sse.mkString(", ")}")
  }

  test("ss08 IVF-PQ agrees with ss07 on every shared pair") {
    // the cell pruning must change WHICH pairs are scored, never the
    // ADC value of a pair — identical integer distances wherever both
    // top-k lists contain the same (query, neighbor)
    val pq = SparkEntry.queries("ss07_knn_pq")(spark, d)
      .select(col("query_id"), col("neighbor_id"), col("adc_u6"))
    val ivfpq = SparkEntry.queries("ss08_knn_ivfpq")(spark, d)
      .select(col("query_id"), col("neighbor_id"),
        col("adc_u6").as("adc_pruned"))
    val joined = ivfpq.join(pq, Seq("query_id", "neighbor_id"), "inner")
    assert(joined.count() > 0, "expected overlap between the two top-k lists")
    assert(joined.filter(col("adc_u6") =!= col("adc_pruned")).count() == 0,
      "ADC distance diverged between ss07 and ss08 on a shared pair")
  }

  test("ss17 delta merge: tombstones vanish, untouched pairs unchanged") {
    import graft.similarity.Similarity.{DeltaMod, UpdMod}
    val delta = SparkEntry.queries("ss17_knn_index_delta")(spark, d)
      .select(col("query_id"), col("neighbor_id"), col("adc_u6"))
      .localCheckpoint()
    // a tombstoned vector must never surface from the merged index
    assert(delta.filter(col("neighbor_id") % DeltaMod === 0 &&
      col("neighbor_id") % UpdMod =!= 0).count() == 0,
      "a deleted vector survived the merge")
    // untouched vectors score EXACTLY as in the unmaintained index —
    // the merge may change membership/ranks, never a kept code
    val base = SparkEntry.queries("ss07_knn_pq")(spark, d)
      .select(col("query_id"), col("neighbor_id"),
        col("adc_u6").as("adc_base"))
      .localCheckpoint()
    val sharedUntouched = delta
      .filter(col("neighbor_id") % DeltaMod =!= 0)
      .join(base, Seq("query_id", "neighbor_id"))
    assert(sharedUntouched.count() > 0, "no untouched overlap to compare")
    assert(sharedUntouched
      .filter(col("adc_u6") =!= col("adc_base")).count() == 0,
      "an untouched vector's ADC distance changed")
    // and the maintenance did something: the served answer is not the
    // stale index's answer (deletes/updates must shift some rank)
    assert(delta.exceptAll(
      base.select(col("query_id"), col("neighbor_id"),
        col("adc_base").as("adc_u6"))).count() > 0,
      "delta-served result identical to the stale index")
  }

  test("ss15 MMR selection is anchored, distinct, and score-monotone") {
    val k = graft.similarity.Similarity.MmrK
    val mmr = SparkEntry.queries("ss15_mmr_topk")(spark, d).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    // exactly K distinct picks per query
    mmr.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.length == k && rows.map(_._3).distinct.length == k,
        s"query $q: expected $k distinct picks")
      // greedy MMR scores are non-increasing FROM RANK 2 ON: the
      // selected set only grows, so each candidate's rel − maxSim
      // shrinks, and the rank-t winner was available at rank t-1.
      // Rank 1 is a different objective (pure relevance) and may be
      // EXCEEDED by rank 2 when similarities are negative — cosines
      // here are signed.
      val byRank = rows.sortBy(_._2).map(_._4).drop(1)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        s"query $q: MMR scores must be non-increasing, got ${byRank.toSeq}")
    }
    // rank 1 is pure relevance — it must equal ss01's nearest neighbor
    val nn1 = SparkEntry.queries("ss01_knn_brute")(spark, d)
      .filter(col("rank") === 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    mmr.filter(_._2 == 1).foreach { case (q, _, n, _) =>
      assert(nn1(q) == n, s"query $q: rank-1 pick must be the 1-NN")
    }
    // and the selection must actually DIVERSIFY on this fixture: at
    // least one query's pick set differs from the plain top-K
    val top5 = SparkEntry.queries("ss01_knn_brute")(spark, d)
      .filter(col("rank") <= k).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .map { case (q, a) => q -> a.map(_._2).toSet }
    val diverged = mmr.groupBy(_._1).exists { case (q, rows) =>
      rows.map(_._3).toSet != top5(q)
    }
    assert(diverged, "MMR never deviated from plain top-k — vacuous")
  }
}
