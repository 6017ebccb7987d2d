package graft.io

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.SparkSession

/** The one manifest-commit primitive behind every durable artifact in
  * this engine: a small MARKER file made visible atomically
  * (write-temp + rename), with marker existence as the commit
  * predicate. io09/io12's snapshot-publish pointer (`_CURRENT`) and
  * st12's exactly-once batch markers (`_committed_<id>`) are the same
  * protocol — this module holds it once, and CommitSpec tests the
  * torn-write / overwrite / listing contract in one place (round-5
  * review follow-up). The pattern is the two-filesystem-primitive
  * core of every table format's manifest commit; at 100 TB only the
  * marker store changes (metastore / table format), not the logic.
  */
object Commit {

  def fileSystem(s: SparkSession): FileSystem =
    FileSystem.get(s.sparkContext.hadoopConfiguration)

  /** Marker I/O goes through the RAW filesystem on the local scheme:
    * LocalFileSystem is a ChecksumFileSystem whose `.crc` sidecar is a
    * second, non-atomically-maintained file — exactly what a
    * single-file atomic-rename protocol cannot tolerate (a racing
    * swap can pair new content with a stale sidecar and fail every
    * later read). HDFS/object stores have no client-side sidecar, so
    * they pass through unchanged. */
  private def rawFs(s: SparkSession): FileSystem =
    fileSystem(s) match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
      case f => f
    }

  /** Atomically materialize `content` at `path`: write a uniquely
    * named `<path>.tmp-<uuid>`, then atomically rename OVER the
    * destination. A reader sees the previous marker or the new one,
    * never a torn half-write and never *no* marker: there is no
    * delete step, so a crash at any point leaves either the old
    * committed marker (plus an ignorable `.tmp-*` file) or the new
    * one. The uuid staging name also makes concurrent writers safe —
    * each renames its own durable staging file; the last rename wins
    * whole (CommitSpec races 8 writers to pin this).
    *
    * The clobbering rename is scheme-specific because Hadoop's local
    * `FileContext.rename(OVERWRITE)` is emulated as
    * check-delete-rename — NOT atomic under concurrency (two racers
    * both pass the check, and the loser hits the winner's re-created
    * destination). On `file:` the primitive is POSIX `rename(2)` via
    * NIO `ATOMIC_MOVE + REPLACE_EXISTING`; everywhere else
    * `FileContext.rename(OVERWRITE)` is a single atomic namespace
    * operation server-side (HDFS), which is the deployment this
    * protocol targets. */
  def writeMarker(s: SparkSession, path: String, content: String): Unit = {
    val fs = rawFs(s)
    val tmp = new Path(path + ".tmp-" + java.util.UUID.randomUUID().toString)
    val dst = new Path(path)
    val out = fs.create(tmp, true)
    out.write(content.getBytes("UTF-8")); out.close()
    val qDst = fs.makeQualified(dst)
    if (qDst.toUri.getScheme == "file") {
      java.nio.file.Files.move(
        java.nio.file.Paths.get(fs.makeQualified(tmp).toUri),
        java.nio.file.Paths.get(qDst.toUri),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } else {
      val fc = FileContext.getFileContext(
        qDst.toUri, s.sparkContext.hadoopConfiguration)
      fc.rename(fs.makeQualified(tmp), qDst, Options.Rename.OVERWRITE)
    }
  }

  /** The committed marker's content (the reader half). */
  def readMarker(s: SparkSession, path: String): String = {
    val in = rawFs(s).open(new Path(path))
    try scala.io.Source.fromInputStream(in).mkString finally in.close()
  }

  /** Commit predicate: does the durable marker exist? */
  def exists(s: SparkSession, path: String): Boolean =
    fileSystem(s).exists(new Path(path))

  /** Marker names under `dir` starting with `prefix` — the durable
    * commit log, read as a directory listing. In-flight `.tmp*`
    * staging files are invisible by contract; the listing is
    * name-sorted (the filesystem's enumeration order is not
    * deterministic). */
  def listMarkers(s: SparkSession, dir: String, prefix: String): Seq[String] = {
    // prefix filter pushed into the FS listing call: at a big table's
    // commit-log cardinality an unfiltered listStatus enumerates every
    // unrelated file on the driver before we drop them
    val filter = new org.apache.hadoop.fs.PathFilter {
      def accept(p: Path): Boolean = {
        val n = p.getName; n.startsWith(prefix) && !n.contains(".tmp")
      }
    }
    fileSystem(s).listStatus(new Path(dir), filter).toSeq
      .map(_.getPath.getName).sorted
  }
}
