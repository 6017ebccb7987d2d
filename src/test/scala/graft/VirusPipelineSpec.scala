package graft

import graft.apps.VirusPipeline
import graft.io.Codecs
import graft.operators.FeatureSelection
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end pipeline on the tiny fixture: artifacts exist with the
  * reference's byte formats; assignments join by key (never zip);
  * LIBSVM codec round-trips. */
class VirusPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir =
    new java.io.File("src/test/resources/tiny_api_logs").getAbsolutePath

  test("pipeline writes all four artifacts in reference formats") {
    val out = java.nio.file.Files.createTempDirectory("graft_vp_").toString
    val a = VirusPipeline.run(spark, dir, topN = 10, k = 2)
    VirusPipeline.writeArtifacts(a, out)

    val topLines = scala.io.Source.fromFile(s"$out/topFeatures.txt")
      .getLines().toSeq
    assert(topLines == Seq("(B,0.0)", "(C,0.0)"))

    val libsvm = scala.io.Source.fromFile(s"$out/LIBSVMOutput.txt")
      .getLines().toSeq
    assert(libsvm.sorted == Seq("0 1:1 2:1", "1 1:1", "1 2:1"))

    val output = scala.io.Source.fromFile(s"$out/output.txt")
      .getLines().toSeq
    assert(output.size == 3) // c2 has no features → no row
    // reference byte format incl. spaces after JSON colons; size =
    // nFeatures − (rank−1) = 2 − 0 = 2 for B, 1 for C
    assert(output.exists(_.matches(
      """\d;1\.0;\[\{"name": "B", "size": 2\}\]""")))
    assert(output.exists(_.matches(
      """\d;0\.0;\[\{"name": "B", "size": 2\},\{"name": "C", "size": 1\}\]""")))

    val json = scala.io.Source.fromFile(s"$out/data.json").mkString
    assert(json.contains(""""name":"Main Container""""))
    assert(json.contains(""""name":"Virus""""))

    val report = a.clusterReport.collect().map(_.getString(0))
    assert(report.forall(_.matches("Cluster \\d contains \\d+ (Clean|Virus) files")))

    val score = VirusPipeline.entropyScore(a.assignments)
    assert(score >= 0.0 && score <= math.log(2))
  }

  test("LIBSVM codec round-trips") {
    import spark.implicits._
    val lines = Seq("1 2:1 5:1", "0 1:1").toDS()
    val parsed = Codecs.readLibSvm(lines).collect()
    val byLabel = parsed.map(r =>
      r.getDouble(1) -> r.getSeq[Int](2)).toMap
    assert(byLabel(1.0) == Seq(2, 5) && byLabel(0.0) == Seq(1))
  }

  test("stage-2/3 artifacts byte-match the frozen full-corpus goldens") {
    // Frozen once from this pipeline on /root/reference/api_logs
    // (topN=2000, k=10, best-of-10 seeded k-means) after verifying two
    // independent runs produce identical bytes — the stage-2/3
    // equivalent of ReferenceParitySpec's stage-1 golden. Any change
    // to feature selection, vector assembly, clustering seeds, or the
    // output codecs shows up here as a byte diff.
    assume(new java.io.File("/root/reference/api_logs").isDirectory)
    val out = java.nio.file.Files.createTempDirectory("graft_golden_").toString
    val a = VirusPipeline.run(spark, "/root/reference/api_logs")
    VirusPipeline.writeArtifacts(a, out)
    def bytes(p: String) = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(p))
    assert(java.util.Arrays.equals(bytes(s"$out/output.txt"),
      bytes("src/test/resources/golden/output_fullcorpus.txt")),
      "output.txt drifted from the frozen golden")
    assert(java.util.Arrays.equals(bytes(s"$out/data.json"),
      bytes("src/test/resources/golden/data_fullcorpus.json")),
      "data.json drifted from the frozen golden")
  }

  test("classification report uses the reference's console format") {
    // needs enough rows to split; use the real corpus if present
    assume(new java.io.File("/root/reference/api_logs").isDirectory)
    val a = VirusPipeline.run(spark, "/root/reference/api_logs", topN = 2000)
    val samples = VirusPipeline.assemble(a.vectors, a.top.count().toInt)
    val rep = VirusPipeline.classificationReport(spark, samples)
    val rows = rep.collect()
    assert(rows.length == 19) // 14 DT points + 5 SVC points
    assert(rows.forall(_.getString(3).matches(""".*AUC = \d+\.\d\d%""")))
    // qualitative parity (readme.md:89-118): every AUC is a valid prob.
    assert(rows.forall(r => r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
  }
}
