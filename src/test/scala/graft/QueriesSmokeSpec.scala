package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query runs on sf0.001 and (where the data supports
  * it) returns rows; every query with an oracle keeps identical
  * column names between the DataFrame and the SQL (the driver's
  * hash-compare sorts columns by name, so a mismatch breaks the gate
  * even with identical values). */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  // operators whose correct result CAN be empty at this sf
  private val mayBeEmpty = Set("q07_antijoin", "dd03_lsh_pairs")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val df = fn(spark, dir)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("oracle SQL exists only for declared queries") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracle without query: $unknown")
  }

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
