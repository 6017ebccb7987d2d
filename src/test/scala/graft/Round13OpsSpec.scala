package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 operator properties: the chunked artifact-encode law,
  * drift-triggered retrain + versioned reindex swap (crash windows,
  * no-op on a healthy index), streaming tombstone deletes, the index
  * lifecycle pipeline, paragraph-granularity near-dup, and the
  * published-weights quality classifier. */
class Round13OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val d = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, d)

  test("ta29 chunked encode ≡ single-chain fold on the published " +
    "merge table — checkpointed chunk boundaries never change a row") {
    import graft.operators.TextAnalysis
    val sep = TextAnalysis.BpeSep
    val root = TextAnalysis.publishedBpeMerges(spark, d)
    val ver = graft.io.Commit.readMarker(spark, s"$root/_MERGES")
    val merges = spark.read.parquet(s"$root/$ver")
      .orderBy("round", "idx").select("lsym", "rsym")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    // a chunk size the published table actually straddles — the law
    // must see real checkpointed chunk boundaries, not one vacuous
    // chunk (the sf0.001 table is ~55 merges, under the production
    // EncodeChunkMerges)
    val chunkSize = 8
    assert(merges.size > chunkSize,
      s"fixture's ${merges.size} merges don't exercise >1 chunk — " +
        "the law below would be vacuous")
    val words = Tables.documents(spark, d)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .select(regexp_replace(col("word"), "(.)", s"$sep$$1$sep").as("seq"))
      .groupBy("seq").agg(count(lit(1)).cast("long").as("f"))
    // the single-chain reference: ALL merges folded into one column
    val single = words
      .select(TextAnalysis.encodeChunkChain(merges).as("seq"), col("f"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val chunked = TextAnalysis.encodeChunked(words, merges, chunkSize)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(chunked == single)
    // and the production path (encodeFromArtifact at EncodeChunkMerges)
    // agrees with both
    val prod = TextAnalysis.encodeFromArtifact(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(prod == single)
  }
}
