package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plain-Scala recomputes of q32 (CDC merge) and ss16 (filtered ANN)
  * over the sf0.001 fixture — like CurationQueriesSpec, the assertion
  * is independent of BOTH engines the driver compares (Spark and the
  * DuckDB oracle): the expected answer is rebuilt from collected rows
  * with ordinary collections code.
  */
class BruteForceParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val d = "/root/testdata/sf0.001"

  test("q32 CDC merge matches a brute-force snapshot recompute") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, d)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"), col("value"),
        to_date(col("ts")).cast("string").as("day"))
      .as[(Long, Long, Long, String, Double, String)].collect().toSeq
    val lastDay = ev.map(_._6).max
    def latest(rows: Seq[(Long, Long, Long, String, Double, String)]) =
      rows.groupBy(_._1).map { case (u, rs) =>
        val r = rs.maxBy(x => (x._2, x._3)) // (ts_us, event_id)
        u -> ((u, r._2, r._3, r._4, r._5))
      }
    val base = latest(ev.filter(_._6 < lastDay))
    val ch = latest(ev.filter(_._6 == lastDay))
    val expected = (
      base.filterNot { case (u, _) => ch.contains(u) }.values ++
        ch.values.filter(_._4 != "error")
    ).toSeq.sortBy(_._1)

    val got = SparkEntry.queries("q32_cdc_merge")(spark, d)
      .as[(Long, Long, Long, String, Double)].collect().toSeq
    assert(got == expected)
    // all three MERGE arms fired on this fixture: at least one
    // carried-over base user, one updated/inserted user, one tombstone
    val tombstoned = ch.values.filter(_._4 == "error").map(_._1).toSet
    assert(tombstoned.nonEmpty, "fixture must exercise the delete arm")
    assert(got.map(_._1).toSet.intersect(tombstoned).isEmpty,
      "tombstoned users must not survive the merge")
    assert(ch.values.exists(_._4 != "error"), "update/insert arm")
    assert(base.keySet.diff(ch.keySet).nonEmpty, "carry-over arm")
  }

  test("ss16 filtered ANN matches a brute-force IVF recompute") {
    val e = spark.read.parquet(s"$d/embeddings.parquet")
      .selectExpr("vec_id", "embedding", "label")
      .as[(Long, Array[Float], Int)].collect().toSeq
      .sortBy(_._1)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      // the query rounds cos to 6 places via round(); for positive
      // doubles BigDecimal HALF_UP matches Spark/DuckDB round here
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val cents = e.filter(_._1 < 8)
    def centScores(v: Array[Float]) =
      cents.map { case (cid, c, _) => (cid, cos(v, c)) }
    val cell = e.map { case (id, v, _) =>
      id -> centScores(v).maxBy { case (cid, s) => (s, -cid) }._1
    }.toMap
    val expected = e.filter(_._1 < 5).flatMap { case (qid, qv, _) =>
      val probed = centScores(qv).sortBy { case (cid, s) => (-s, cid) }
        .take(2).map(_._1).toSet
      e.filter { case (nid, _, lab) =>
        nid != qid && lab % 2 == 1 && probed(cell(nid))
      }
        .map { case (nid, nv, lab) => (nid, cell(nid), lab, cos(qv, nv)) }
        .sortBy { case (nid, _, _, c) => (-c, nid) }
        .take(10).zipWithIndex
        .map { case ((nid, cl, lab, c), i) =>
          (qid, i + 1L, nid, cl, lab, c) }
    }.sortBy(t => (t._1, t._2))

    val got = SparkEntry.queries("ss16_knn_filtered")(spark, d)
      .as[(Long, Long, Long, Long, Int, Double)].collect().toSeq
    assert(got == expected)
    // the filter is semantic, not cosmetic: every neighbor is odd-
    // labeled, and the result still fills all k slots per query
    assert(got.forall(_._5 % 2 == 1))
    assert(got.groupBy(_._1).forall(_._2.size == 10))
  }
}
