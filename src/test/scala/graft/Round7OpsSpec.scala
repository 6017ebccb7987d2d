package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Property tests for the round-7 operators (dd19, em09, ss22,
  * q36/st14, io15, mm08): each asserts the operator's defining law
  * with an independent in-test recomputation — the local complement of
  * the driver's DuckDB hash gate.
  */
class Round7OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, d)

  // the twin law both streaming gates claim: the stateful stream and
  // the batch window are the SAME rule, so their outputs are equal
  // row-for-row (they also share one oracle at driver time)
  test("st13 streaming debounce emits exactly q33's batch survivors") {
    val batch = q("q33_debounce").select("event_id")
      .collect().map(_.getLong(0)).sorted
    val stream = q("st13_stream_debounce").select("event_id")
      .collect().map(_.getLong(0)).sorted
    assert(stream.length == batch.length && stream.sameElements(batch))
  }

  test("st14 streaming rate limit emits exactly q36's batch survivors") {
    val batch = q("q36_rate_limit").select("event_id")
      .collect().map(_.getLong(0)).sorted
    val stream = q("st14_stream_rate_limit").select("event_id")
      .collect().map(_.getLong(0)).sorted
    assert(stream.length == batch.length && stream.sameElements(batch))
  }

  test("q36's drop path binds at the driver's verify scale (sf0.01)") {
    // sf0.001's thin event stream never exceeds 2/user/hour, so the
    // binding check runs at the scale the oracle gate actually uses
    val d01 = "/root/testdata/sf0.01"
    val kept = SparkEntry.queries("q36_rate_limit")(spark, d01).count()
    val total = graft.Tables.events(spark, d01).count()
    assert(kept < total, "rate limit never dropped anything at sf0.01")
  }

  test("q36 keeps at most N events per (user, hour), earliest first") {
    val n = graft.operators.Relational.RateLimitN
    val over = q("q36_rate_limit")
      .groupBy("user_id", "hour_us").count()
      .filter(col("count") > n).count()
    assert(over == 0, s"some (user, hour) exceeded the quota of $n")
  }

  // dd19's defining law, brute-recomputed: a vector is a semantic dup
  // iff some SAME-CELL vector with a SMALLER id has rounded cosine
  // >= tau (keep-first, non-transitive)
  test("dd19 flags match a brute-force same-cell keep-first recompute") {
    val out = q("dd19_semdedup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val embs = graft.Tables.embeddings(spark, d)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dab = 0.0; var daa = 0.0; var dbb = 0.0; var i = 0
      while (i < a.length) {
        dab += a(i) * b(i); daa += a(i) * a(i); dbb += b(i) * b(i); i += 1
      }
      BigDecimal(dab / (math.sqrt(daa) * math.sqrt(dbb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val byCell = out.groupBy(_._2)
    for ((_, members) <- byCell; (id, _, flagged) <- members) {
      val expect = members.exists { case (other, _, _) =>
        other < id && cos(embs(other), embs(id)) >= graft.dedup.Dedup.SemTau
      }
      assert(flagged == expect, s"vec $id: flagged=$flagged expect=$expect")
    }
    assert(out.exists(_._3) && out.exists(!_._3),
      "fixture should produce both dups and keepers")
  }

  // em09's whole ranked list, recomputed from scratch: sign masks from
  // the raw embeddings, integer Hamming, (distance, id) tie-break
  test("em09 Hamming top-k matches an independent bit-level recompute") {
    val topK = graft.similarity.Similarity.TopK
    val nq = graft.similarity.Similarity.NumQueries
    val embs = graft.Tables.embeddings(spark, d)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def mask(v: Array[Double], off: Int): Long =
      (0 until 32).foldLeft(0L) { (acc, i) =>
        if (v(off + i) >= 0.0) acc | (1L << i) else acc
      }
    val sigs = embs.map { case (id, v) => id -> (mask(v, 0), mask(v, 32)) }
    val expect = (0L until nq.toLong).flatMap { qid =>
      val (ql, qh) = sigs(qid)
      sigs.toSeq.filter(_._1 != qid)
        .map { case (id, (lo, hi)) =>
          (id, java.lang.Long.bitCount(lo ^ ql) +
            java.lang.Long.bitCount(hi ^ qh)) }
        .sortBy { case (id, h) => (h, id) }
        .take(topK).zipWithIndex
        .map { case ((id, h), i) => (qid, i + 1L, id, h.toLong) }
    }.toSet
    val got = q("em09_binary_hamming").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong,
        r.getLong(2), r.getLong(3))).toSet
    assert(got == expect)
  }

  // ss22's fusion arithmetic, recomputed from the two source rankings
  test("ss22 fused scores are the exact integer RRF of ss02 + ss07") {
    def rankMap(name: String): Map[(Long, Long), Long] =
      q(name).select("query_id", "neighbor_id", "rank").collect()
        .map { r =>
          val rk: Long = r.get(2) match {
            case i: java.lang.Integer => i.toLong
            case l: java.lang.Long => l.toLong
            case other => sys.error(s"unexpected rank type: $other")
          }
          (r.getLong(0), r.getLong(1)) -> rk
        }.toMap
    val a = rankMap("ss02_knn_lsh")
    val b = rankMap("ss07_knn_pq")
    val unit = graft.similarity.Similarity.RrfUnit
    val k = graft.similarity.Similarity.RrfK
    val fused = q("ss22_rrf_fusion").collect()
    assert(fused.nonEmpty)
    fused.foreach { r =>
      val key = (r.getLong(0), r.getLong(2)) // query_id, neighbor_id
      val expect = a.get(key).map(rk => unit / (k + rk)).getOrElse(0L) +
        b.get(key).map(rk => unit / (k + rk)).getOrElse(0L)
      assert(r.getLong(3) == expect, s"rrf_u9 mismatch at $key")
      val nLists = a.contains(key).compare(false) +
        b.contains(key).compare(false)
      assert(r.getInt(4) == nLists, s"n_lists mismatch at $key")
    }
    assert(fused.exists(_.getInt(4) == 2),
      "fixture should have consensus candidates (both lists)")
  }

  // io15's migration invariant: zero misplaced rows, nothing lost
  test("io15 dual-generation read loses and duplicates nothing") {
    val out = q("io15_layout_migration").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(4) == 0L, s"misplaced rows for ${r.getString(0)}")
      assert(r.getLong(1) + r.getLong(2) == r.getLong(3))
    }
    val expectTotal = graft.Tables.events(spark, d).count()
    assert(out.map(_.getLong(3)).sum == expectTotal)
  }

  // dd20's defining law: each dup group's weights sum to ~1 document
  // (so total loss mass = number of DISTINCT pages, not copies)
  test("dd20 weights distribute one unit of mass per dup group") {
    val rows = q("dd20_dup_weights").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val nDocs = graft.Tables.documents(spark, d).count()
    assert(rows.length == nDocs, "every document gets a weight")
    rows.groupBy(_._2).foreach { case (g, members) =>
      val n = members.head._3
      assert(members.length == n, s"group $g: n_members mismatch")
      assert(members.forall(_._4 == members.head._4),
        s"group $g: weights must be uniform within the group")
      assert(math.abs(members.map(_._4).sum - 1.0) < 1e-4,
        s"group $g: weights must sum to ~1")
    }
    assert(rows.exists(_._3 > 1), "fixture should contain real dup groups")
    assert(rows.exists(r => r._3 == 1 && r._4 == 1.0),
      "singletons keep weight 1.0")
  }

  // ml19's accounting identities against ml18's shared sums
  test("ml19 leave-one-out rows partition the training mass") {
    val rows = q("ml19_bucket_influence").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(4), r.getDouble(5)))
    assert(rows.map(_._1).sorted.sameElements(0L to 6L),
      "one row per training bucket")
    // n_train(j) = total - |bucket j|; summing over j counts the
    // total 6 times (each bucket excluded exactly once)
    val totals = rows.map(_._2)
    val grand = (totals.sum / 6.0)
    rows.foreach { case (j, n, mseWo, infl) =>
      assert(n < grand && n > 0, s"bucket $j: bad leave-one-out size")
      // influence = mseWo - mseFull, so mseWo - infl reconstructs the
      // shared full-fit MSE; compare with a tolerance — the second
      // floating-point subtraction need not be bit-identical per row
      assert(math.abs((mseWo - infl) - (rows.head._3 - rows.head._4)) < 1e-12,
        s"bucket $j: influence must be vs ONE shared full-fit MSE")
    }
    assert(rows.exists(_._4 != 0.0), "some bucket must have influence")
  }

  // em10's JL norm-preservation: E[|y|^2] = |x|^2 for a +-1 sign
  // matrix scaled by 1/sqrt(k) — the corpus mean ratio must sit near 1
  test("em10 sign projection preserves norms in expectation (JL)") {
    val proj = q("em10_sign_projection").collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getDouble(2)) }
    val embs = graft.Tables.embeddings(spark, d)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
      .toMap
    assert(proj.forall(_._2.length == 16))
    val ratios = proj.toSeq.map { case (id, y) =>
      val y2 = y.map(v => v * v).sum
      val x2 = embs(id).map(v => v * v).sum
      y2 / x2
    }
    val mean = ratios.sum / ratios.length
    assert(mean > 0.7 && mean < 1.3,
      s"JL norm preservation violated: mean |y|^2/|x|^2 = $mean")
  }

  // q37's conservation law: every purchase is attributed exactly once
  test("q37 attributes every purchase to exactly one channel") {
    val out = q("q37_last_touch").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val purchases = graft.Tables.events(spark, d)
      .filter(col("event_type") === "purchase").count()
    assert(out.values.sum == purchases, "conversions must partition")
    assert(!out.contains("purchase"),
      "a purchase can never be its own attribution channel")
  }

  // io16's pruning actually skips files: the stats consult must cut
  // the shard list to the predicate's third of the span
  test("io16 stats pruning reads a strict subset of the shards") {
    val out = q("io16_stats_pruning")
    val res = out.collect()
    assert(res.nonEmpty)
    val scan = out.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("shard"),
      s"io16: the shard list must prune at the scan:\n$scan")
    // the middle third of a range-clustered span can overlap at most
    // ~1/3 of the 16 shards (+2 boundary shards)
    val inClause = "shard#\\d+L? IN \\(([^)]*)\\)".r
      .findFirstMatchIn(scan).map(_.group(1))
    inClause.foreach { lst =>
      val n = lst.split(",").length
      assert(n <= 8, s"io16 pruned to $n of 16 shards — too many: $lst")
    }
  }

  // mm08's worker against an independent BigInt recompute on a known
  // payload — proves the decode + integer energy + VAD gate end to end
  test("mm08 window energies match a BigInt recompute of the PCM") {
    import graft.multimodal.Multimodal
    val rec = Multimodal.MediaRecord(42L,
      Multimodal.encodeWav(42L, 8000, 2, 77))
    val wav = Multimodal.decodeWav(rec.payload)
    assert(wav.channels == 2)
    val frames = wav.pcm.length / (wav.channels * 2)
    def sample(f: Int, c: Int): Int = {
      val off = (f * wav.channels + c) * 2
      ((wav.pcm(off + 1).toInt << 8) | (wav.pcm(off) & 0xFF))
    }
    val got = Multimodal.wavEnergyWindows(rec).toSeq
    assert(got.map(_.n_samples).sum == frames * wav.channels)
    got.foreach { w =>
      val from = w.window_idx * 32
      val until = math.min(from + 32, frames)
      var e = BigInt(0)
      for (f <- from until until; c <- 0 until wav.channels)
        e += BigInt(sample(f, c)) * sample(f, c)
      assert(BigInt(w.energy) == e, s"window ${w.window_idx}")
      assert(w.is_voiced ==
        (e * 3 > BigInt(w.n_samples) * 32768 * 32768))
    }
  }
}
