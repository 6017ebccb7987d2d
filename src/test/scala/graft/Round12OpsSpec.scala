package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 operator properties: the cu04 two-phase replay guard,
  * dd24's CDC chunk clamps, the BPE artifact encode path, PNG decode
  * parity, the widen+rename merge laws, and the incremental ANN index
  * append law. */
class Round12OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val d = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, d)

  test("cu04 two-phase guard: a crash between publish and commit " +
    "marker does not roll an extra version on replay") {
    import graft.apps.CurationIncremental
    val docs = Tables.documents(spark, d)
    val root = java.nio.file.Files
      .createTempDirectory("graft_cu04_twophase").toString
    CurationIncremental.curateBase(spark, docs, root)
    val wave = graft.operators.TextAnalysis
      .benchSample(docs, 2 * CurationIncremental.BenchN)
      .select("doc_id", "text")
    assert(CurationIncremental.refreshWaveBatch(spark, root, docs, wave, 0L))
    def ver = graft.io.Commit.readMarker(spark, s"$root/_SNAPSHOT")
      .stripPrefix("snap").toLong
    assert(ver == 1L)
    // simulate the crash window: the wave completed (version rolled)
    // but the committed marker write was lost
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(root, "_refresh_committed_0"))
    assert(!CurationIncremental.refreshWaveBatch(spark, root, docs, wave, 0L))
    assert(ver == 1L) // the replay recovered the marker, never re-rolled
    assert(graft.io.Commit.exists(spark, s"$root/_refresh_committed_0"))
    // and a fully-committed wave still skips outright
    assert(!CurationIncremental.refreshWaveBatch(spark, root, docs, wave, 0L))
    assert(ver == 1L)
  }
}
