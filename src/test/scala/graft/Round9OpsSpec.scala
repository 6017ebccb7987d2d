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

  test("q41 rolling window equals a per-day direct recompute") {
    val rows = q("q41_rolling_active").collect()
      .map(r => (r.getDate(0), r.getLong(1), r.getLong(2)))
    val ud = graft.Tables.events(spark, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val allDays = ud.map(_._2).distinct
    rows.foreach { case (daySql, dau, wau) =>
      val day = daySql.toLocalDate
      // the window explode must agree with the obvious O(days²) rule
      val expectWau = ud.filter { case (_, ad) =>
        !ad.isAfter(day) && ad.isAfter(day.minusDays(7))
      }.map(_._1).distinct.size
      val expectDau = ud.filter(_._2 == day).map(_._1).distinct.size
      assert(dau == expectDau && wau == expectWau,
        s"$day: got ($dau, $wau), expected ($expectDau, $expectWau)")
      assert(wau >= dau)
    }
    assert(rows.map(_._1.toLocalDate).toSet == allDays.toSet ||
      rows.length >= allDays.size,
      "every day up to the max must close a window")
  }

  test("mm12 recall is monotone in k over the declared query set") {
    val rows = q("mm12_crossmodal_recall").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == Seq(1, 5, 10))
    val nq = rows.map(_._2).distinct
    assert(nq.size == 1 && nq.head > 0 &&
      nq.head <= graft.multimodal.Multimodal.MmEvalN)
    val hits = rows.map(_._3)
    assert(hits.sliding(2).forall(p => p(0) <= p(1)),
      s"recall must be monotone in k: ${hits.toSeq}")
    rows.foreach { case (_, n, h, u6) =>
      assert(h <= n && u6 == math.floor(h * 1e6 / n + 0.5).toLong)
    }
  }

  test("io19 merged snapshot obeys delete/update/insert law key-by-key") {
    q("io19_merge_upsert").collect() // publishes the snapshot
    val root = graft.io.JsonLines.stagingDir("merge_upsert")
    val snap = spark.read.parquet(
      s"$root/" + graft.io.Commit.readMarker(spark, s"$root/_SNAPSHOT"))
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val byKey = snap.groupBy(_._1)
    assert(byKey.values.forall(_.length == 1), "keys must be unique")
    val baseIds = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    val m = snap.toMap
    baseIds.foreach { id =>
      if (id % 11 == 3) assert(!m.contains(id), s"deleted $id survived")
      else {
        assert(m.contains(id), s"kept row $id vanished")
        if (id % 7 == 0) assert(m(id).endsWith(" [rev2]"),
          s"update $id not applied")
        else assert(!m(id).endsWith(" [rev2]"), s"spurious update on $id")
        if (id % 13 == 1) assert(
          m.get(id + 1000000L).contains(s"ingested revision of $id"),
          s"insert for $id missing")
      }
    }
    assert(m.keySet.forall(k =>
      baseIds.contains(k) || baseIds.contains(k - 1000000L)),
      "no phantom keys")
  }

  test("ta24 mixture honors per-source budgets and the greedy-prefix rule") {
    import graft.operators.TextAnalysis.MixBudget
    val rows = q("ta24_mixture_select").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val totW = rows.map(_._2).sum
    rows.foreach { case (src, wgt, budget, nDocs, selTok) =>
      assert(budget == MixBudget * wgt / totW, s"$src budget drifted")
      assert(selTok <= budget, s"$src overspent: $selTok > $budget")
      assert(nDocs >= 0 && wgt >= 1 && wgt <= 3)
    }
    // greedy-prefix: adding the next hash-ordered doc of any source
    // must overflow its budget (otherwise the selection under-filled)
    val perDoc = docs
      .select(col("source"), col("doc_id"),
        size(graft.functions.Funcs.tokens(col("text"))).cast("long")
          .as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    rows.foreach { case (src, _, budget, nDocs, selTok) =>
      val ordered = perDoc.filter(_._1 == src)
        .sortBy { case (_, id, _) => (md5hex(id.toString), id) }
      if (nDocs < ordered.length) {
        val next = ordered(nDocs.toInt)._3
        assert(selTok + next > budget,
          s"$src under-filled: could still take ${ordered(nDocs.toInt)}")
      }
    }
  }

  test("st18 snapshot is order-independent and replay-idempotent") {
    q("st18_stream_upsert").collect() // publishes the snapshot
    val root = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_stream_upsert").toString
    val out = s"$root/tbl"
    val snap = spark.read.parquet(
      s"$out/" + graft.io.Commit.readMarker(spark, s"$out/_SNAPSHOT"))
    val got = snap.select("doc_id", "text", "version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // one-shot merge of ALL staged slices (a different batch grouping
    // than the stream's 1-file batches) must produce the same table —
    // the associativity/commutativity claim made in the doc comment
    val all = spark.read.parquet(s"$root/src")
    val oneShot = all.groupBy("doc_id")
      .agg(max_by(struct(col("doc_id"), col("text"), col("version")),
        col("version")).as("r"))
      .select("r.*").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == oneShot, "stream merge diverges from one-shot merge")
    // replay: merging any staged slice into the final snapshot again
    // must change nothing
    val replayed = snap.select("doc_id", "text", "lang", "source", "version")
      .unionByName(all.filter(col("version") === 2L))
      .groupBy("doc_id")
      .agg(max_by(struct(col("doc_id"), col("text"), col("version")),
        col("version")).as("r"))
      .select("r.*").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(replayed == got, "replay must be a no-op")
  }

  test("em13 z-scores match a direct Welch recompute") {
    import graft.operators.TextAnalysis.DriftThreshU3
    val rows = q("em13_drift_monitor").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(rows.length == 64)
    val vecs = graft.Tables.embeddings(spark, d)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    rows.foreach { case (dim, ma6, mb6, z3, drifted) =>
      def cohort(p: Long) = vecs.filter(_._1 % 2 == p)
        .map(v => math.floor(v._2(dim).toDouble * 1e6 + 0.5) / 1e6)
      val (a, b) = (cohort(0), cohort(1))
      def mean(x: Array[Double]) = x.sum / x.length
      def varOf(x: Array[Double]) = {
        val m = mean(x)
        x.map(v => (v - m) * (v - m)).sum / (x.length - 1)
      }
      val z = math.abs(mean(a) - mean(b)) /
        math.sqrt(varOf(a) / a.length + varOf(b) / b.length)
      assert(math.abs(z * 1000 - z3) <= 1.0,
        s"dim $dim: z recompute ${z * 1000} vs $z3")
      assert(drifted == (z3 >= DriftThreshU3))
      assert(math.abs(mean(a) * 1e6 - ma6) <= 1.0 &&
        math.abs(mean(b) * 1e6 - mb6) <= 1.0)
    }
    assert(rows.count(_._5) <= 5,
      "a quiet corpus must not light up the drift page")
  }

  test("q42 power numbers obey the CUPED variance inequality") {
    val rows = q("q42_power_analysis").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (vC, nC) = rows("cuped"); val (vN, nN) = rows("naive")
    assert(vC > 0 && vN > 0 && nC > 0 && nN > 0)
    // CUPED variance is var_y·(1−ρ²) ≤ var_y, so its sample size can
    // never exceed the naive one
    assert(vC <= vN, s"cuped variance $vC exceeds naive $vN")
    assert(nC <= nN, s"cuped n $nC exceeds naive $nN")
    // n scales linearly in variance (same Δ, same z) — cross-check
    // the two rows against each other within ceil slack
    val ratio = vC.toDouble / vN
    assert(math.abs(nC - nN * ratio) <= 1.0 + nN * 1e-9,
      s"n must scale with variance: $nC vs ${nN * ratio}")
  }

  test("q43 z-scores match a direct trailing-window recompute") {
    val rows = q("q43_metric_anomaly").collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    assert(rows.nonEmpty)
    val byDay = rows.map(r => r._1 -> r._2).toMap
    val days = rows.map(_._1).sorted
    rows.foreach { case (day, revC, n7, z3, anomaly) =>
      val idx = days.indexOf(day)
      val prior = days.slice(math.max(0, idx - 7), idx).map(byDay)
      assert(n7 == prior.length, s"$day: window count")
      assert(anomaly == (math.abs(z3) >= 3000), s"$day: flag rule")
      if (prior.length >= 3) {
        val m = prior.map(_ / 100.0).sum / prior.length
        val v = prior.map(c => math.pow(c / 100.0 - m, 2)).sum /
          (prior.length - 1)
        if (v > 0) {
          val z = (revC / 100.0 - m) / math.sqrt(v)
          assert(math.abs(z * 1000 - z3) <= 1.0,
            s"$day: z recompute ${z * 1000} vs $z3")
        } else assert(z3 == 0)
      } else assert(z3 == 0, s"$day: warm-up must report 0")
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
