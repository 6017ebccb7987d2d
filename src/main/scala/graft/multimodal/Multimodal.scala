package graft.multimodal

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque `BINARY` payloads with typed
  * metadata, decoded/feature-extracted per partition.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic FAKE of the decode step — but the
  * Spark-side plumbing is real and tested: binary column construction,
  * schema, batch-at-a-time `mapPartitions` over a typed Dataset (the
  * Scala twin of a Pandas-UDF `mapInPandas` pipeline), and arithmetic
  * features the SQL oracle reproduces.
  *
  * Scale: payloads never shuffle — both queries are per-row/partition
  * map work; at 100 TB the binary column rides in parquet and only
  * small extracted features flow downstream.
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, payload: Array[Byte])
  final case class MediaFeatures(doc_id: Long, n_bytes: Int,
      fake_width: Int, fake_height: Int, checksum16: Long)

  /** STUB decode — deterministic fake standing in for a real image
    * decoder (no codec libraries in this environment). Geometry is
    * derived from payload byte length, the checksum from the first 16
    * CODE POINTS of the UTF-8 decode — matching the oracle's
    * `ascii(substr(text,i,1))`, which is code-point-based; summing raw
    * bytes would diverge on any non-ASCII payload. */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val n = r.payload.length
    val s = new String(r.payload, java.nio.charset.StandardCharsets.UTF_8)
    val sum = graft.functions.CodePoints.sum(s, maxCodePoints = 16)
    MediaFeatures(r.doc_id, n, n % 640, (n * 7) % 480, sum)
  }

  final case class Resized(doc_id: Long, orig_cp: Int, resized_cp: Int,
      checksum: Long)

  /** STUB resize — nearest-neighbor downsample with stride 4 over the
    * payload's code points, standing in for an image resize kernel
    * (take every k-th pixel). The kept-sample count and code-point
    * checksum are the verifiable features; a production resizer swaps
    * into the same one-record→one-record map slot. */
  def resizeStub(r: MediaRecord): Resized = {
    val s = new String(r.payload, java.nio.charset.StandardCharsets.UTF_8)
    val nCp = s.codePointCount(0, s.length)
    val offsets = graft.functions.CodePoints.offsets(s)
    var sum = 0L
    var n = 0
    var i = 0
    while (i < nCp) {
      sum += s.codePointAt(offsets(i))
      n += 1
      i += 4
    }
    Resized(r.doc_id, nCp, n, sum)
  }

  final case class Frame(doc_id: Long, frame_idx: Int, n_chars: Int,
      checksum: Long)

  /** STUB frame decoder — stands in for a video frame-sampler: the
    * payload is treated as consecutive 32-codepoint "frames", every
    * 3rd frame is sampled, and the per-frame feature is a code-point
    * checksum. The flatMap one-record→many-frames batch shape, typed
    * Dataset plumbing, and partition-local iteration are the real
    * parts; a production decoder swaps in here unchanged. */
  def sampleFrames(r: MediaRecord): Iterator[Frame] = {
    val s = new String(r.payload, java.nio.charset.StandardCharsets.UTF_8)
    // code-point boundaries (frames are characters, not UTF-16 units,
    // to match the oracle's substr semantics)
    val nCp = s.codePointCount(0, s.length)
    val offsets = graft.functions.CodePoints.offsets(s)
    val nFrames = (nCp + 31) / 32
    Iterator.range(0, nFrames).filter(_ % 3 == 0).map { f =>
      val from = offsets(f * 32)
      val until = offsets(math.min(f * 32 + 32, nCp))
      val chunk = s.substring(from, until)
      Frame(r.doc_id, f, chunk.codePointCount(0, chunk.length),
        graft.functions.CodePoints.sum(chunk))
    }
  }

  final case class Chunk(doc_id: Long, chunk_idx: Int, n_cp: Int,
      checksum: Long)

  /** STUB chunker — OVERLAPPING windows (width 48, stride 32) over
    * the payload's code points, standing in for the audio/ASR
    * chunking shape (each transcription window carries context from
    * the previous one; mm03's frames are the non-overlapping sampled
    * variant). One record → ceil(n/stride) chunks, partition-local. */
  def overlapChunks(r: MediaRecord): Iterator[Chunk] = {
    val s = new String(r.payload, java.nio.charset.StandardCharsets.UTF_8)
    val nCp = s.codePointCount(0, s.length)
    val offsets = graft.functions.CodePoints.offsets(s)
    val stride = 32
    val width = 48
    val nChunks = (nCp + stride - 1) / stride
    Iterator.range(0, nChunks).map { c =>
      val from = offsets(c * stride)
      val until = offsets(math.min(c * stride + width, nCp))
      val chunk = s.substring(from, until)
      Chunk(r.doc_id, c, chunk.codePointCount(0, chunk.length),
        graft.functions.CodePoints.sum(chunk))
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // mm05: overlapping chunk extraction — the ASR/transcription
    // batch shape (stride < width ⇒ consecutive chunks share a
    // 16-codepoint overlap). Payloads never shuffle; only the small
    // per-chunk feature structs flow downstream.
    "mm05_chunk_overlap" -> ((s, d) => {
      import s.implicits._
      documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[MediaRecord]
        .mapPartitions(_.flatMap(overlapChunks))
        .toDF()
        .orderBy("doc_id", "chunk_idx")
    }),

    // mm03: frame sampling — the one-record→many-frames generator
    // shape of a video pipeline (every 3rd 32-char frame, stub
    // features), as partition-local flatMap over a typed Dataset.
    "mm03_frame_sample" -> ((s, d) => {
      import s.implicits._
      documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[MediaRecord]
        .mapPartitions(_.flatMap(sampleFrames))
        .toDF()
        .orderBy("doc_id", "frame_idx")
    }),
    // mm01: binary metadata extraction — byte length + content digest
    // straight over the binary column.
    "mm01_binary_meta" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .select(col("doc_id"), octet_length(col("payload")).as("n_bytes"),
          sha2(col("payload"), 256).as("sha256"))
        .orderBy("doc_id")),

    // mm02: typed-Dataset mapPartitions decode (stubbed) — the real
    // plumbing a media feature-extraction pipeline needs.
    "mm02_decode_features" -> ((s, d) => {
      import s.implicits._
      documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[MediaRecord]
        .mapPartitions(_.map(decodeStub))
        .toDF()
        .orderBy("doc_id")
    }),

    // mm04: resize (stubbed) — stride-4 nearest-neighbor downsample
    // per payload; one-record→one-record map, payloads never shuffle.
    "mm04_resize" -> ((s, d) => {
      import s.implicits._
      documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[MediaRecord]
        .mapPartitions(_.map(resizeStub))
        .toDF()
        .orderBy("doc_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "mm05_chunk_overlap" ->
      """WITH chunks AS (
        |  SELECT doc_id, i - 1 AS chunk_idx,
        |    substr(text, (i - 1) * 32 + 1, 48) AS chunk
        |  FROM documents,
        |    LATERAL unnest(generate_series(1,
        |      greatest((length(text) + 31) // 32, 0))) AS t(i)
        |)
        |SELECT doc_id, chunk_idx, length(chunk) AS n_cp,
        |  list_reduce(list_prepend(0::BIGINT,
        |    list_transform(generate_series(1, length(chunk)),
        |      j -> ascii(substr(chunk, j, 1))::BIGINT)),
        |    (a, b) -> a + b) AS checksum
        |FROM chunks
        |ORDER BY doc_id, chunk_idx""".stripMargin,

    "mm03_frame_sample" ->
      """WITH frames AS (
        |  SELECT doc_id, i - 1 AS frame_idx,
        |    substr(text, (i - 1) * 32 + 1, 32) AS chunk
        |  FROM documents,
        |    LATERAL unnest(generate_series(1,
        |      greatest((length(text) + 31) // 32, 0))) AS t(i)
        |)
        |SELECT doc_id, frame_idx, length(chunk) AS n_chars,
        |  list_reduce(list_prepend(0::BIGINT,
        |    list_transform(generate_series(1, length(chunk)),
        |      j -> ascii(substr(chunk, j, 1))::BIGINT)),
        |    (a, b) -> a + b) AS checksum
        |FROM frames
        |WHERE frame_idx % 3 = 0
        |ORDER BY doc_id, frame_idx""".stripMargin,

    "mm01_binary_meta" ->
      """SELECT doc_id, octet_length(text::BLOB) AS n_bytes,
        |  sha256(text) AS sha256
        |FROM documents ORDER BY doc_id""".stripMargin,

    "mm04_resize" ->
      """SELECT doc_id, length(text) AS orig_cp,
        |  (length(text) + 3) // 4 AS resized_cp,
        |  list_reduce(list_prepend(0::BIGINT,
        |    list_transform(generate_series(1, (length(text) + 3) // 4),
        |      j -> ascii(substr(text, (j - 1) * 4 + 1, 1))::BIGINT)),
        |    (a, b) -> a + b) AS checksum
        |FROM documents ORDER BY doc_id""".stripMargin,

    "mm02_decode_features" ->
      """SELECT doc_id, octet_length(text::BLOB) AS n_bytes,
        |  octet_length(text::BLOB) % 640 AS fake_width,
        |  (octet_length(text::BLOB) * 7) % 480 AS fake_height,
        |  list_reduce(list_prepend(0::BIGINT,
        |    list_transform(generate_series(1, least(16, length(text))),
        |      i -> ascii(substr(text, i, 1))::BIGINT)),
        |    (a, b) -> a + b) AS checksum16
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
