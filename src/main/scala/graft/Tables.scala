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
  def lineitem(s: SparkSession, d: String): DataFrame =
    normalizeTo("lineitem", LineitemCanonical)(table(s, d, "lineitem"))
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
  def documents(s: SparkSession, d: String): DataFrame =
    normalizeTo("documents", DocumentsCanonical)(table(s, d, "documents"))
  def embeddings(s: SparkSession, d: String): DataFrame =
    normalizeTo("embeddings", EmbeddingsCanonical)(table(s, d, "embeddings"))

  // ---- schema-drift insurance (round-6 verdict #7) -------------------
  // Round 5's events-ts incident generalized: the driver's testdata
  // generator may re-emit any table under a different physical parquet
  // encoding (INT32 ids, DECIMAL prices, DATE dates...). Every loader
  // of the drift-prone tables declares its CANONICAL Spark schema and
  // normalizes value-preserving encodings to it; anything lossy or
  // unknown fails LOUDLY naming the table, column, and type — never a
  // silent corruption. TableDriftSpec pins the contract.

  import org.apache.spark.sql.types._

  private[graft] val DocumentsCanonical: Seq[(String, DataType)] = Seq(
    "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
    "source" -> StringType, "n_chars" -> LongType)
  private[graft] val EmbeddingsCanonical: Seq[(String, DataType)] = Seq(
    "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
    "label" -> IntegerType)
  private[graft] val LineitemCanonical: Seq[(String, DataType)] = Seq(
    "l_orderkey" -> LongType, "l_partkey" -> LongType,
    "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
    "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
    "l_discount" -> DoubleType, "l_tax" -> DoubleType,
    "l_returnflag" -> StringType, "l_linestatus" -> StringType,
    // the shipped files carry isAdjustedToUTC=false micros → NTZ is
    // what every green query has always seen; DATE and instant
    // encodings widen to it (both value-preserving wall-clock under
    // the repo's pinned UTC session)
    "l_shipdate" -> TimestampNTZType)

  /** Is `have → want` a value-preserving cast? Widenings only:
    * narrower integers widen exactly; FLOAT→DOUBLE is exact; DECIMAL
    * sums read back as the correctly-rounded double (Spark's cast —
    * the best any engine can do for a decimal-encoded file); DATE is
    * midnight UTC; NTZ micros are instants under the repo's pinned
    * UTC session. Narrowings (LONG→INT, DOUBLE→FLOAT) are NOT listed:
    * they can silently lose bits, so they must fail loudly instead. */
  private def safeWidening(have: DataType, want: DataType): Boolean =
    (have, want) match {
      case (ByteType | ShortType, IntegerType | LongType) => true
      case (ByteType | ShortType | IntegerType, LongType) => true
      case (FloatType, DoubleType) => true
      case (_: DecimalType, DoubleType) => true
      case (DateType, TimestampType | TimestampNTZType) => true
      case (TimestampNTZType, TimestampType) => true
      case (TimestampType, TimestampNTZType) => true
      case (ArrayType(h, _), ArrayType(w, _)) => safeWidening(h, w)
      case _ => false
    }

  private def normalizeTo(name: String, canonical: Seq[(String, DataType)])(
      df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    val have = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val missing = canonical.collect { case (n, _) if !have.contains(n) => n }
    if (missing.nonEmpty) sys.error(
      s"$name.parquet is missing expected columns: ${missing.mkString(", ")}")
    val casts = canonical.flatMap { case (n, want) =>
      have(n) match {
        case t if t == want => None
        case t if safeWidening(t, want) => Some(n -> want)
        case t => sys.error(s"$name.$n: parquet surfaced ${t.sql}, expected " +
          s"${want.sql} — not a value-preserving widening; extend " +
          "Tables.safeWidening/normalizeTo if the new encoding is exact " +
          "(see EventTsEncodingSpec/TableDriftSpec for the contract)")
      }
    }
    // identity fast-path: the common case adds no projection, so scan
    // pushdown assertions (PlanSpec q02) see the bare relation
    casts.foldLeft(df) { case (acc, (n, t)) =>
      acc.withColumn(n, col(n).cast(t)) }
  }
}
