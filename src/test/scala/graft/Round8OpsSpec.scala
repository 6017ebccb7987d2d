package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Property tests for the round-8 operators (mm09, dd21, ml20, q38,
  * st15, em11): each asserts the operator's defining law with an
  * independent in-test recomputation — the local complement of the
  * driver's DuckDB hash gate.
  */
class Round8OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, d)

  // mm09's defining law, recomputed from the PIXEL GENERATOR (not the
  // codec): the decode→grid→block-mean path must reproduce the hash
  // computed straight from the closed-form pixel bytes
  test("mm09 aHash matches a generator-direct recompute; group counts are consistent") {
    val rows = q("mm09_image_ahash").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val texts = graft.Tables.documents(spark, d)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == texts.size, "one hash row per document")
    rows.foreach { case (id, w, h, hi, lo, _) =>
      val text = texts(id)
      val (ew, eh) =
        graft.multimodal.Multimodal.imgDims(
          id, text.codePointCount(0, text.length))
      assert(w == ew && h == eh, s"doc $id: bad decoded dims")
      val cellSum = new Array[Long](64)
      val cellCnt = new Array[Long](64)
      var total = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val p = y * w + x
        val s = (0 to 2).map(ch =>
          graft.multimodal.Multimodal.pixelByte(id, 3 * p + ch)).sum
        val c = (y * 8 / h) * 8 + (x * 8 / w)
        cellSum(c) += s; cellCnt(c) += 1; total += s
      }
      var ehi = 0L; var elo = 0L
      for (c <- 0 until 64)
        if (cellSum(c) * w.toLong * h > total * cellCnt(c)) {
          if (c < 32) elo |= 1L << c else ehi |= 1L << (c - 32)
        }
      assert(hi == ehi && lo == elo, s"doc $id: aHash mismatch")
    }
    // group-count consistency: n_same_hash is the size of the doc's
    // (hi, lo) equivalence class
    rows.groupBy(r => (r._4, r._5)).foreach { case (_, g) =>
      assert(g.forall(_._6 == g.length), "n_same_hash != class size")
    }
  }

  // dd21's conservation law: the matrix's pair counts sum to the
  // total within-group pair count implied by dd07's group sizes
  test("dd21 pair counts conserve the group-size pair total") {
    val m = q("dd21_source_overlap").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(m.forall { case (a, b, _) => a <= b }, "matrix must be upper-triangular")
    val totalFromMatrix = m.map(_._3).sum
    val groups = q("dd07_dup_groups").collect().map(_.getLong(1))
    val totalFromSizes = groups.groupBy(identity).values
      .map { g => val n = g.length.toLong; n * (n - 1) / 2 }.sum
    assert(totalFromMatrix == totalFromSizes,
      s"matrix pairs $totalFromMatrix != group-size pairs $totalFromSizes")
  }

  // ml20's fit is the OLS of ln(test_mse) on ln(n_train) over ml18's
  // curve — recompute on the curve rows with a tolerance that covers
  // the 1e-6 log quantization
  test("ml20 alpha/ln_c match an OLS recompute over ml18's curve") {
    val curve = q("ml18_learning_curve").collect()
      .map(r => (r.getLong(1).toDouble, r.getDouble(5)))
    val rows = q("ml20_scaling_law").collect()
      .map(r => (r.getLong(0), r.getDouble(3), r.getDouble(4)))
    assert(rows.length == curve.length)
    assert(rows.map(_._2).distinct.length == 1, "one shared alpha")
    val xs = curve.map(p => math.log(p._1))
    val ys = curve.map(p => math.log(p._2))
    val n = xs.length.toDouble
    val sx = xs.sum; val sy = ys.sum
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icept = (sy - slope * sx) / n
    assert(math.abs(rows.head._2 - (-slope)) < 1e-4,
      s"alpha ${rows.head._2} vs recompute ${-slope}")
    assert(math.abs(rows.head._3 - icept) < 1e-4,
      s"ln_c ${rows.head._3} vs recompute $icept")
  }

  // q38's conservation laws: users partition into segments; segment
  // revenue sums to total purchase revenue
  test("q38 segments partition users and conserve revenue") {
    val seg = q("q38_rfm_segments").collect()
      .map(r => (r.getLong(3), r.getDouble(4)))
    val ev = graft.Tables.events(spark, d)
    val nUsers = ev.select("user_id").distinct().count()
    assert(seg.map(_._1).sum == nUsers, "segment user counts must partition users")
    val totalRev = ev.filter(col("event_type") === "purchase")
      .agg(sum(col("value").cast("decimal(18,2)"))).head()
      .getDecimal(0).doubleValue()
    assert(math.abs(seg.map(_._2).sum - totalRev) < 1e-6,
      "segment revenue must sum to total purchase revenue")
  }

  // the st15/q37 twin law: the stream's per-purchase attributions,
  // aggregated by channel, ARE q37's batch attribution table — and
  // every purchase is attributed exactly once
  test("st15 streaming attribution aggregates to q37's batch table") {
    val stream = q("st15_stream_attribution").collect()
      .map(r => (r.getLong(0), r.getString(2)))
    val nPurchases = graft.Tables.events(spark, d)
      .filter(col("event_type") === "purchase").count()
    assert(stream.length == nPurchases, "one attribution per purchase")
    assert(stream.map(_._1).distinct.length == stream.length)
    val fromStream = stream.groupBy(_._2).view
      .mapValues(_.length.toLong).toMap
    val batch = q("q37_last_touch").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fromStream == batch,
      s"stream-aggregated channels $fromStream != batch $batch")
  }

  // io17's two laws: the pruned scan is LOSSLESS (per-key counts
  // equal a direct full-scan aggregate — no false negatives), and the
  // skipping actually BINDS (strictly fewer than all shards scanned)
  test("io17 bitmap index prunes shards without losing events") {
    val rows = q("io17_bitmap_index").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(4), r.getLong(5)))
    val ev = graft.Tables.events(spark, d)
    rows.foreach { case (u, t, n, scanned, total) =>
      val direct = ev.filter(col("user_id") === u &&
        col("event_type") === t).count()
      assert(n == direct, s"probe ($u, $t): pruned scan lost events")
      assert(scanned <= total)
    }
    assert(rows.map(_._4).sum < rows.map(_._5).sum,
      "bitmap skipping never bound — every probe scanned every shard")
  }

  // ss23's defining law, brute-recomputed in plain Scala end to end:
  // same tokenizer, same ln-quantized idf, same integer contribution
  // sums — the top-10 per query must match exactly
  test("ss23 BM25 top-10 matches a pure-Scala recompute") {
    val out = q("ss23_bm25_topk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val docs = graft.Tables.documents(spark, d)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ")
        .filter(_.nonEmpty).toSeq)
    val sim = graft.similarity.Similarity
    val nDocs = docs.length.toDouble
    val total = docs.map(_._2.length.toLong).sum
    val avgdl = total.toDouble / nDocs
    val dl = docs.map { case (id, ts) => id -> ts.length.toLong }.toMap
    val tf = scala.collection.mutable.Map
      .empty[(Long, String), Long].withDefaultValue(0L)
    val terms = sim.Bm25Queries.flatMap(_._2).toSet
    docs.foreach { case (id, ts) =>
      ts.foreach(t => if (terms(t)) tf((id, t)) += 1) }
    val df = terms.map(t =>
      t -> tf.keys.count { case (_, tt) => tt == t }.toLong).toMap
    def idfq(t: String): Double =
      math.floor(math.log((nDocs - df(t) + 0.5) / (df(t) + 0.5) + 1.0)
        * 1e6 + 0.5) / 1e6
    val expected = sim.Bm25Queries.flatMap { case (qid, qts) =>
      // a doc is RANKED iff it has at least one tf row for a query
      // term — even when micro-unit flooring makes its score 0, the
      // operator and oracle both keep it; the test must too
      val scores = docs.flatMap { case (id, _) =>
        if (!qts.exists(t => tf((id, t)) > 0L)) None
        else Some((id, qts.map { t =>
          val f = tf((id, t))
          if (f == 0L) 0L
          else math.floor((idfq(t) * (f.toDouble * (1.2 + 1.0))) /
            (f.toDouble + 1.2 * ((1.0 - 0.75) +
              0.75 * dl(id).toDouble / avgdl)) * 1e6 + 0.5).toLong
        }.sum))
      }
      scores.sortBy { case (id, sq) => (-sq, id) }.take(10)
        .zipWithIndex.map { case ((id, sq), i) =>
          (qid, (i + 1).toLong, id, sq.toDouble / 1e6)
        }
    }
    assert(out.length == expected.length)
    out.sortBy(r => (r._1, r._2)).zip(expected).foreach { case (a, e) =>
      assert(a._1 == e._1 && a._2 == e._2 && a._3 == e._3,
        s"rank row mismatch: $a vs $e")
      assert(math.abs(a._4 - e._4) < 1e-9, s"score mismatch: $a vs $e")
    }
  }

  // ml21's sweep laws: a partition per threshold, monotone tp, one
  // best flag on the max-F1 row
  test("ml21 sweep partitions counts and flags the max-F1 threshold") {
    val rows = q("ml21_threshold_sweep").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), if (r.isNullAt(7)) None else Some(r.getDouble(7)),
        r.getBoolean(8)))
    assert(rows.length == 9)
    val total = graft.Tables.embeddings(spark, d).count()
    rows.foreach { case (_, tp, fp, fn, tn, _, _) =>
      assert(tp + fp + fn + tn == total, "confusion must partition vectors")
    }
    val byTh = rows.sortBy(_._1)
    assert(byTh.map(_._2).zip(byTh.map(_._2).drop(1))
      .forall { case (a, b) => a >= b }, "tp non-increasing in threshold")
    assert(rows.count(_._7) == 1, "exactly one best row")
    val bestF1 = rows.filter(_._7).head._6
    assert(rows.flatMap(_._6).forall(f => bestF1.exists(_ >= f)),
      "best row must carry the maximum F1")
  }

  // q40's defining laws: users partition into the two variants and
  // the CUPED adjustment reduces (or preserves) the metric variance —
  // the whole point of the covariate
  test("q40 CUPED partitions users and does not increase variance") {
    val rows = q("q40_cuped").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.length == 2 && rows.map(_._1).sorted.sameElements(Seq(0L, 1L)))
    val ev = graft.Tables.events(spark, d)
    assert(rows.map(_._2).sum == ev.select("user_id").distinct().count())
    // brute recompute of theta and the adjusted/raw variances
    import org.apache.spark.sql.functions._
    val b = ev.agg(min(unix_micros(col("ts"))),
      max(unix_micros(col("ts")))).head()
    val mid = b.getLong(0) + (b.getLong(1) - b.getLong(0)) / 2
    val users = ev.select(col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"), col("value"))
      .collect().groupBy(_.getLong(0)).map { case (uid, rs) =>
        def revs(pre: Boolean) = rs.filter(r =>
          r.getString(2) == "purchase" &&
            (if (pre) r.getLong(1) < mid else r.getLong(1) >= mid))
          .map(r => BigDecimal(r.getDouble(3)).setScale(2,
            BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
        (uid, revs(pre = true), revs(pre = false))
      }.toSeq
    val n = users.length.toDouble
    val sx = users.map(_._2).sum; val sy = users.map(_._3).sum
    val sxy = users.map(u => u._2 * u._3).sum
    val sxx = users.map(u => u._2 * u._2).sum
    val theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val xbar = sx / n
    def variance(vs: Seq[Double]): Double = {
      val m = vs.sum / vs.length
      vs.map(v => (v - m) * (v - m)).sum / vs.length
    }
    val rawVar = variance(users.map(_._3))
    val adjVar = variance(users.map(u => u._3 - theta * (u._2 - xbar)))
    assert(adjVar <= rawVar + 1e-9,
      s"CUPED must not increase variance: $adjVar > $rawVar")
    // the reported adjusted means match the brute recompute
    val brute = users.groupBy(_._1 % 2).view.mapValues { us =>
      us.map(u => u._3 - theta * (u._2 - xbar)).sum / us.length
    }.toMap
    rows.foreach { case (v, _, _, adj) =>
      assert(math.abs(adj - brute(v)) < 1e-3,
        s"variant $v: adjusted mean $adj vs brute ${brute(v)}")
    }
  }

  // q39's conservation law: a session of length L contributes exactly
  // max(L-2, 0) paths, so the mined counts sum to that total (when
  // all distinct paths fit inside the top-20 report, as they do at
  // this fixture's |types|=5) — recomputed via q13's session table
  test("q39 path counts conserve the per-session triple total") {
    val rows = q("q39_top_paths").collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getString(2),
        r.getString(3)), r.getLong(4)))
    assert(rows.nonEmpty && rows.map(_._1).toSeq == (1L to rows.length))
    val sessLens = q("q13_sessionize").collect().map(_.getLong(3))
    val expectedTotal = sessLens.map(l => math.max(l - 2, 0L)).sum
    if (rows.length < graft.operators.Sessionize.TopPaths)
      assert(rows.map(_._3).sum == expectedTotal,
        s"path counts ${rows.map(_._3).sum} != session triples $expectedTotal")
    else assert(rows.map(_._3).sum <= expectedTotal)
    // counts non-increasing by rank
    val ns = rows.sortBy(_._1).map(_._3)
    assert(ns.zip(ns.drop(1)).forall { case (a, b) => a >= b })
  }

  // st16's twin law: the stream mines exactly the CLOSED sessions —
  // its counts sum to the triple total of q13's sessions minus each
  // user's last (still open in state on a finite source)
  test("st16 streaming paths conserve the closed-session triple total") {
    val rows = q("st16_stream_paths").collect().map(_.getLong(4))
    val sess = q("q13_sessionize").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val closedTotal = sess.groupBy(_._1).values.map { ss =>
      ss.sortBy(_._2).dropRight(1).map(s => math.max(s._3 - 2, 0L)).sum
    }.sum
    if (rows.length < graft.operators.Sessionize.TopPaths)
      assert(rows.sum == closedTotal,
        s"stream triple total ${rows.sum} != closed-session $closedTotal")
    else assert(rows.sum <= closedTotal)
  }

  // ss24's conservation law: every fused score is exactly the sum of
  // its halves' reciprocal-rank contributions, and the candidate set
  // is exactly the union of the two rankings
  test("ss24 hybrid fusion conserves both halves' reciprocal ranks") {
    val sim = graft.similarity.Similarity
    val unit = 1000000000L
    val fused = q("ss24_hybrid_rrf").collect()
      .map(r => ((r.getLong(0), r.getLong(2)),
        (r.getLong(3), r.getInt(4)))).toMap
    val qbIdx = sim.Bm25Queries.map(_._1).zipWithIndex.toMap
    val lex = q("ss23_bm25_topk").collect()
      .map(r => (qbIdx(r.getString(0)).toLong, r.getLong(2)) ->
        unit / (60 + r.getLong(1))).toMap
    val vec = q("ss02_knn_lsh").collect()
      .filter(_.getLong(0) < sim.Bm25Queries.length)
      .map(r => (r.getLong(0), r.getLong(2)) ->
        unit / (60 + r.getInt(1))).toMap
    assert(fused.keySet == lex.keySet ++ vec.keySet,
      "fused candidates must be the union of the two rankings")
    fused.foreach { case (k, (u9, nLists)) =>
      val expected = lex.getOrElse(k, 0L) + vec.getOrElse(k, 0L)
      assert(u9 == expected, s"$k: fused $u9 != ${expected}")
      val n = (if (lex.contains(k)) 1 else 0) + (if (vec.contains(k)) 1 else 0)
      assert(nLists == n, s"$k: n_lists $nLists != $n")
    }
    assert(fused.exists(_._2._2 == 2),
      "some document should be surfaced by BOTH rankers")
  }

  // io18's reader-consistency law: after GC the pointer still resolves
  // and the current snapshot is the full corpus; the policy row shape
  // is pinned by the oracle, so the spec checks what SQL can't — disk
  test("io18 GC keeps the pointer's snapshot readable and complete") {
    val rows = q("io18_snapshot_gc").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2)))
    val nDocs = graft.Tables.documents(spark, d).count()
    assert(rows.length == 4)
    assert(rows.count(_._2) == 2, "exactly KeepVersions survive")
    val last = rows.maxBy(_._1)
    assert(last._2 && last._3 == nDocs,
      "the current version must survive GC holding the full corpus")
    assert(rows.filter(!_._2).forall(_._1 < 2), "only the oldest expire")
  }

  // mm10's defining laws from the generator (not the codec): full
  // frame walk, frame 0 never a boundary, and every flag matches the
  // integer cross-multiplied 5% rule recomputed from videoPixel
  test("mm10 boundaries match a generator-direct recompute") {
    val rows = q("mm10_shot_boundaries").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    val texts = graft.Tables.documents(spark, d)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val byDoc = rows.groupBy(_._1)
    assert(byDoc.keySet == texts.keySet, "every video walked")
    byDoc.foreach { case (id, fs) =>
      val mm = graft.multimodal.Multimodal
      assert(fs.length == mm.videoFrameCount(id), s"doc $id: frame count")
      val cp = texts(id).codePointCount(0, texts(id).length)
      val exp = fs.sortBy(_._2).map { case (_, f, _, _, _) =>
        val (w, h) = mm.videoDims(id, f, cp)
        val n = 3L * w * h
        (f, (0 until n.toInt).map(i => mm.videoPixel(id, f, i).toLong).sum, n)
      }
      fs.sortBy(_._2).zip(exp).foreach {
        case ((_, f, sum, n, cut), (ef, esum, en)) =>
          assert(f == ef && sum == esum && n == en, s"doc $id frame $f")
          if (f == 0) assert(!cut, s"doc $id: frame 0 can't be a cut")
          else {
            val (_, ps, pn) = exp(f - 1)
            assert(cut == (math.abs(sum * pn - ps * n) * 20 > ps * n),
              s"doc $id frame $f: boundary flag mismatch")
          }
      }
    }
    assert(rows.exists(_._5) && rows.exists(r => r._2 > 0 && !r._5),
      "fixture should contain both cuts and continuations")
  }

  // em11's defining law, brute-recomputed end to end: quantized
  // centroids → argmax-cosine assignment (ties to the smaller label)
  // → confusion counts must equal the query's cells exactly
  test("em11 confusion matrix matches a brute-force centroid recompute") {
    val cells = q("em11_centroid_confusion").collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    val embs = graft.Tables.embeddings(spark, d)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray,
        r.getInt(2)))
    assert(cells.values.sum == embs.length,
      "confusion cells must partition the vectors")
    // centroids via the same micro-unit quantization as the operator
    val dims = embs.head._2.length
    val cents = embs.groupBy(_._3).map { case (label, vs) =>
      label -> (0 until dims).map { i =>
        val ci = vs.map(v => math.floor(v._2(i) * 1e6 + 0.5).toLong).sum
        ci.toDouble / 1e6 / vs.length
      }.toArray
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
    }
    val brute = embs.groupBy { case (_, v, label) =>
      // the operator rounds cosines to 6 dp BEFORE the argmax; match
      // that exactly, ties to the smaller centroid label
      val assigned = cents.toSeq
        .map { case (cl, c) =>
          // HALF_UP like Spark's round(), not rint's half-even
          (cl, BigDecimal(cos(v, c))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
        .minBy { case (cl, c6) => (-c6, cl) }._1
      (label, assigned)
    }.view.mapValues(_.length.toLong).toMap
    assert(brute == cells,
      s"brute confusion ${brute.toSeq.sorted} != query ${cells.toSeq.sorted}")
  }
}
