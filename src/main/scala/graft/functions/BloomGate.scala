package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Bloom-filter gate for decontamination against a holdout TOO LARGE
  * to broadcast — the missing 100 TB curation shape: ta16/st10 ship
  * the benchmark's literal gram set because their holdout is
  * fixed-size by construction, but a production holdout of 10⁷–10⁸
  * grams exceeds broadcast comfort. The answer is Spark's own
  * `BloomFilterAggregate` / `BloomFilterMightContain` (the expression
  * pair behind runtime bloom-filter join pruning, exposed here through
  * the function registry the way `vec_dot`/`char_shingles` are): the
  * holdout aggregates DISTRIBUTED into one fixed-size bitset — the
  * sketch, not the set, is what the driver collects and ships — and
  * the corpus streams through a codegen'd `might_contain` prefilter,
  * so the only rows that ever reach the exact-confirm shuffle join
  * are true hits plus a spec-bounded false-positive residue
  * (Round9OpsSpec asserts the FP band; no-false-negative is the
  * bloom contract, so the confirm join can never lose a real hit).
  *
  * Both expressions hash through `xxhash64` (LongType input), the
  * same canonicalization Spark's injected runtime filters use.
  */
object BloomGate {

  /** Sketch geometry: sized for [[Items]] insertions at [[Bits]] bits
    * → ~10.5 bits/item ≈ 0.8% theoretical FPP. The bitset is 128 KiB
    * regardless of corpus size — that fixed size IS the point. */
  val Items = 100000L
  val Bits  = 1L << 20

  /** Register `bloom_filter_agg` / `might_contain` in the session's
    * function registry (they are not in Spark's public registry; the
    * expressions themselves are the ones the optimizer injects for
    * runtime join pruning). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("bloom_filter_agg",
      (exprs: Seq[Expression]) =>
        new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)),
      "scala_udf")
    reg.createOrReplaceTempFunction("might_contain",
      (exprs: Seq[Expression]) =>
        BloomFilterMightContain(exprs(0), exprs(1)),
      "scala_udf")
  }

  /** Aggregate `h` (a LongType hash column of `df`) into one
    * serialized bloom sketch. Distributed build: executors fill
    * partial bitsets, merge is bitwise-OR (order-independent, so the
    * sketch is deterministic under any partitioning), and the ONLY
    * driver-side object is the fixed-size serialized filter — the
    * st10/st11 bounded-collect rule. */
  def build(df: DataFrame, h: Column): Array[Byte] = {
    register(df.sparkSession)
    df.select(h.as("h"))
      .agg(expr(s"bloom_filter_agg(h, CAST($Items AS BIGINT), " +
        s"CAST($Bits AS BIGINT))").as("bf"))
      .head().getAs[Array[Byte]]("bf")
  }

  /** Membership prefilter: `might_contain(<sketch literal>, h)`. The
    * sketch ships to executors as a literal in the serialized plan —
    * the broadcast-of-the-sketch, never of the set. */
  def mightContain(bloom: Array[Byte], h: Column): Column =
    call_function("might_contain", lit(bloom), h)
}
