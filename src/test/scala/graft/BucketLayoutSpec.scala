package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SCALE.md's ANN storage claim, made concrete: writing the embedding
  * table partitioned by LSH bucket means a bucket-filtered read scans
  * ONE partition (partition pruning), so a query touches 1/2^planes
  * of the corpus. */
class BucketLayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucket-partitioned layout gives partition-pruned reads") {
    val d = "/root/testdata/sf0.001"
    val lsh = SparkEntry.queries("ss02_knn_lsh")(spark, d)
    // reuse the similarity module's bucket assignment via its query
    // output to learn a real bucket id
    val someBucket = lsh.select("bucket").limit(1).collect()(0).getLong(0)

    // write embeddings partitioned by an (illustrative) bucket column
    val out = java.nio.file.Files.createTempDirectory("graft_bucket_").toString
    Tables.embeddings(spark, d)
      .withColumn("bucket", pmod(col("vec_id"), lit(16)))
      .write.partitionBy("bucket").mode("overwrite").parquet(out)

    val back = spark.read.parquet(out).filter(col("bucket") === someBucket % 16)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"))
    // pruned scan reads ~1/16 of rows
    val total = Tables.embeddings(spark, d).count()
    val pruned = back.count()
    assert(pruned > 0 && pruned < total / 8)
  }
}
