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

  /** Sketch geometry FLOOR: at least [[MinItems]] insertions /
    * [[MinBits]] bits (128 KiB). [[build]] sizes the actual sketch
    * from the holdout's real gram count at ≥[[BitsPerItem]] bits/item
    * (~1% theoretical FPP), rounded up to a power of two — a 10⁸-gram
    * production holdout gets a 2^30-bit (128 MiB) sketch, not a
    * saturated 128 KiB one whose might_contain would prune nothing.
    * The floor keeps small fixtures at the documented 128 KiB shape
    * (10·MinItems = 10⁶ bits rounds up to exactly [[MinBits]]). */
  val MinItems    = 100000L
  val MinBits     = 1L << 20
  val BitsPerItem = 10L

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

  /** Sketch geometry for `items` insertions: ≥[[BitsPerItem]]
    * bits/item rounded up to a power of two, floored at [[MinBits]].
    * Exposed so specs can assert the sizing law directly. */
  private[graft] def bitsFor(items: Long): Long = {
    val want = math.max(1L, items) * BitsPerItem
    val pow2 = java.lang.Long.highestOneBit(want)
    math.max(MinBits, if (pow2 == want) pow2 else pow2 << 1)
  }

  /** Aggregate `h` (a LongType hash column of `df`) into one
    * serialized bloom sketch. Distributed build: executors fill
    * partial bitsets, merge is bitwise-OR (order-independent, so the
    * sketch is deterministic under any partitioning), and the ONLY
    * driver-side object is the fixed-size serialized filter — the
    * st10/st11 bounded-collect rule.
    *
    * The sketch is sized from the ACTUAL item count (`items` when the
    * caller already knows it, else one count() over `df` — callers
    * hand a deduplicated, checkpointed gram frame, so the count is a
    * cheap second action on materialized rows): a holdout 1000× the
    * fixture must grow the bitset, or the FPP approaches 1 and the
    * prefilter silently stops pruning. */
  def build(df: DataFrame, h: Column, items: Option[Long] = None)
      : Array[Byte] = {
    register(df.sparkSession)
    val hs = df.select(h.as("h"))
    val n = math.max(MinItems, items.getOrElse(hs.count()))
    df.select(h.as("h"))
      .agg(expr(s"bloom_filter_agg(h, CAST($n AS BIGINT), " +
        s"CAST(${bitsFor(n)} AS BIGINT))").as("bf"))
      .head().getAs[Array[Byte]]("bf")
  }

  /** Membership prefilter: `might_contain(<sketch literal>, h)`. The
    * sketch ships to executors as a literal in the serialized plan —
    * the broadcast-of-the-sketch, never of the set. */
  def mightContain(bloom: Array[Byte], h: Column): Column =
    call_function("might_contain", lit(bloom), h)
}
