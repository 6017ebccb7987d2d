package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The q22 companion: WHEN does AQE's runtime skew-join handling make
  * manual salting unnecessary — and when is salting still the right
  * tool?
  *
  * AQE's OptimizeSkewedJoin splits an oversized shuffle partition of a
  * sort-merge (or shuffled-hash) join into sub-partitions at runtime,
  * replicating the matching partition of the other side — the same
  * trick saltedJoin applies at plan time, but decided from OBSERVED
  * partition sizes instead of a guessed salt count. This spec builds a
  * Zipf-hot key at test scale, lowers the size thresholds
  * proportionally, and asserts the executed plan actually took the
  * skew path (`skew=true` on the join node).
  *
  * Salting remains necessary where AQE's rewrite cannot apply:
  *   - broadcast-able small sides (a BroadcastHashJoin has no shuffle
  *     partitions to split — but then there's no skew problem either);
  *   - skewed AGGREGATIONS (groupBy on the hot key — AQE splits join
  *     partitions, never aggregation partitions: partial aggregation
  *     helps, salting the key is the full fix);
  *   - joins whose output partitioning is relied on downstream (the
  *     skew split breaks co-partitioning, so AQE skips it when the
  *     join feeds another shuffle-free stage on the same key);
  *   - non-equi joins.
  */
class AqeSkewJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("AQE splits the hot key of an unsalted sort-merge join at runtime") {
    val confs = Seq(
      // force the shuffle path (no broadcast), keep AQE + skew rewrite
      // on, and scale the size thresholds down to fixture size: a
      // partition is "skewed" over 64 KiB and 2x the median, target
      // sub-partition 16 KiB
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16384")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // Zipf-hot big side: 90% of 200k rows share key 0, the rest
      // spread over 999 keys; ~64 bytes of payload per row puts the
      // hot partition well past the lowered threshold
      val big = spark.range(200000L).select(
        when(col("id") % 10 < 9, 0L).otherwise(col("id") % 999 + 1)
          .as("key"),
        concat(lit("x"), lpad(col("id").cast("string"), 60, "0"))
          .as("payload"))
      val small = spark.range(1000L).select(col("id").as("key"),
        (col("id") * 7).as("dim"))
      val joined = big.join(small, Seq("key"))
      // execute through THIS Dataset's queryExecution (count() or a
      // further select() would build a separate plan and leave this
      // one unrun); row count must be the plain-join answer
      // regardless of the runtime rewrite
      assert(joined.collect().length === 200000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan)
      assert(plan.contains("skew=true"),
        s"AQE did not take the skew-join path:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE skew path and q22's salted join agree on the hot-key input") {
    // the q22 tie-in: the runtime rewrite (AQE splitting observed-fat
    // partitions) and the plan-time rewrite (saltedJoin spreading the
    // hot key over salt buckets) are the same fix decided at different
    // times — on the same Zipf-hot input they must produce the exact
    // same multiset of rows, or one of them is not a pure plan change
    val prev = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val big = spark.range(50000L).select(
        when(col("id") % 10 < 9, 0L).otherwise(col("id") % 99 + 1)
          .as("key"),
        (col("id") * 3).as("v"))
      val small = spark.range(100L).select(col("id").as("key"),
        (col("id") * 7).as("dim"))
      val aqe = big.join(small, Seq("key"))
        .groupBy("key").agg(count(lit(1)).as("n"), sum("v").as("sv"),
          sum("dim").as("sd"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      val salted = graft.operators.SkewTools
        .saltedJoin(big, small, "key", salts = 8)
        .groupBy("key").agg(count(lit(1)).as("n"), sum("v").as("sv"),
          sum("dim").as("sd"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(aqe == salted)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("AQE does NOT split a skewed aggregation — salting's remaining job") {
    // the documented negative result: the same hot key under groupBy
    // gets no runtime split (OptimizeSkewedJoin only rewrites joins),
    // so a straggler aggregation task is still fixed by salting the
    // key (partial aggregation bounds the damage for algebraic aggs,
    // but a high-cardinality-payload agg on a hot key is not saved)
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try {
      val big = spark.range(200000L).select(
        when(col("id") % 10 < 9, 0L).otherwise(col("id") % 999 + 1)
          .as("key"))
      val agg = big.groupBy("key").count()
      assert(agg.collect().length === 1000)
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"))
      assert(!plan.contains("skew=true"),
        "aggregation unexpectedly took a skew path — update the scale docs")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
