package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins on Zipfian keys (SURVEY §4.3: API
  * document frequency is Zipfian — the hottest token appears in every
  * file; the same shape shows up in shingle self-joins).
  *
  * AQE's skew-join handles sort-merge cases at runtime; salting is
  * the plan-level tool when one side can be replicated: the skewed
  * (big) side gets a deterministic salt derived from the row, the
  * replicated (small) side is exploded across all salts, and the join
  * key becomes (key, salt) — splitting each hot key's rows across
  * `salts` tasks instead of one straggler.
  */
object SkewTools {

  /** Inner equi-join `big ⋈ small` on `key`, with the big side salted
    * into `salts` buckets. `small` is replicated `salts`× (keep it
    * broadcast-sized or keep `salts` modest). Result equals
    * `big.join(small, key)` exactly, modulo row order. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int): DataFrame = {
    require(salts > 0)
    val salted = big.withColumn("salt_",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salts)))
    val replicated = small.withColumn("salt_",
      explode(array((0 until salts).map(lit(_)): _*)))
    salted.join(replicated, Seq(key, "salt_")).drop("salt_")
  }
}
