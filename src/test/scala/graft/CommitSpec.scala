package graft

import org.scalatest.funsuite.AnyFunSuite

/** The shared marker-commit primitive (graft.io.Commit) tested in one
  * place — io09/io12's `_CURRENT` pointer swap and st12's
  * `_committed_<id>` batch markers both ride these guarantees
  * (round-5 review follow-up: one protocol, one spec). Behavioral
  * end-to-end coverage stays where it was: InterchangeSpec (publish /
  * time travel) and WatermarkSpec (exactly-once sink lifecycle).
  */
class CommitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import graft.io.Commit._

  private def tmpDir() =
    java.nio.file.Files.createTempDirectory("graft_commit_").toString

  test("writeMarker round-trips content and leaves no tmp behind") {
    val d = tmpDir()
    writeMarker(spark, s"$d/_CURRENT", "v_1")
    assert(exists(spark, s"$d/_CURRENT"))
    assert(readMarker(spark, s"$d/_CURRENT") == "v_1")
    assert(!exists(spark, s"$d/_CURRENT.tmp"),
      "the staging tmp must not survive a successful swap")
  }

  test("writeMarker replaces an existing marker (pointer swap)") {
    val d = tmpDir()
    writeMarker(spark, s"$d/_CURRENT", "v_1")
    writeMarker(spark, s"$d/_CURRENT", "v_2")
    assert(readMarker(spark, s"$d/_CURRENT") == "v_2")
  }

  test("torn writes are invisible: .tmp is excluded everywhere") {
    val d = tmpDir()
    writeMarker(spark, s"$d/_committed_0", "0")
    writeMarker(spark, s"$d/_committed_2", "2")
    // a crash between tmp-write and rename leaves exactly this file
    val fs = fileSystem(spark)
    val o = fs.create(new org.apache.hadoop.fs.Path(
      s"$d/_committed_1.tmp"), true)
    o.write("1".getBytes("UTF-8")); o.close()
    assert(listMarkers(spark, d, "_committed_") == Seq("_committed_0",
      "_committed_2"))
    assert(!exists(spark, s"$d/_committed_1"),
      "a torn marker must not satisfy the commit predicate")
  }

  test("listMarkers filters by prefix (foreign files are not commits)") {
    val d = tmpDir()
    writeMarker(spark, s"$d/_committed_5", "5")
    writeMarker(spark, s"$d/_CURRENT", "v_9")
    val fs = fileSystem(spark)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$d/batch=5"))
    assert(listMarkers(spark, d, "_committed_") == Seq("_committed_5"))
    assert(listMarkers(spark, d, "_CURRENT") == Seq("_CURRENT"))
  }
}
