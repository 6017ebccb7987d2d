package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * Replaces the reference's hand-rolled S3 listing + per-file
  * `sc.textFile` scans (`FeatureSelectionCloud.scala:204-246,290,332`)
  * with single columnar parquet scans — Catalyst pushes filters and
  * prunes columns into the scan, so downstream operators only pay for
  * what they read (SURVEY.md §2.1 S1/S2).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** events.ts has shipped under different parquet encodings across
    * testdata generations: TIMESTAMP(NANOS) — which Spark's vectorized
    * reader only surfaces as LONG via the legacy flag — and
    * TIMESTAMP_MICROS with isAdjustedToUTC=false, which surfaces as
    * TIMESTAMP_NTZ. Probe the file's Spark-surfaced schema and branch
    * (see [[normalizeEventTs]]) so either encoding yields the same
    * instant column. The legacy flag is set unconditionally: it only
    * affects NANOS files and lets the probe read a NANOS footer
    * without erroring. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(table(s, d, "events"))
  }

  /** Normalizes an events frame so `ts` is an instant (TimestampType,
    * microsecond precision) whatever the file carried:
    *  - LONG = legacy nanos-since-epoch → exact integer `div 1000`
    *    (`div`, not `/` — ns-since-epoch exceeds 2^53, double division
    *    would lose bits) into `timestamp_micros`;
    *  - TIMESTAMP_NTZ = microsecond wall-clock; every session in this
    *    repo pins spark.sql.session.timeZone=UTC, so the cast to an
    *    instant is value-preserving;
    *  - TIMESTAMP = already an instant, pass through. */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case t => sys.error(s"unsupported events.ts parquet type: $t")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
