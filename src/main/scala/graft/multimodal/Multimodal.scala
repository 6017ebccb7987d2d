package graft.multimodal

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque `BINARY` payloads with typed
  * metadata, decoded/feature-extracted per partition.
  *
  * mm02/mm04 run a REAL image codec end-to-end: a deterministic
  * encoder renders each document as a genuine PPM (P6) image — ASCII
  * header + raw RGB plane, pixel bytes from a closed-form generator —
  * and a real parser decodes it back (magic, whitespace-delimited
  * dims/maxval, exact-length pixel plane, loud errors on
  * malformation). The oracle reproduces the GENERATOR arithmetic in
  * SQL, so the hash gate proves the encode→decode round trip is
  * byte-correct, not just that two copies of the same stub agree.
  * mm06 runs the same real-codec pattern for AUDIO: a deterministic
  * generator renders each document as a genuine RIFF/WAVE file (RIFF
  * header, fmt chunk, an unknown LIST chunk the parser must skip,
  * 16-bit PCM data chunk), a real parser validates and decodes it,
  * and frame windows are sampled from the DECODED PCM — the
  * frame-sampling shape over a real container.
  *
  * The former code-point stand-ins are RETIRED: mm03 now walks a real
  * multi-frame container (concatenated P6 images — frame sizes
  * differ, so finding frame k requires parsing headers 0..k-1) and
  * mm05 cuts overlapping ASR-style windows from the DECODED PCM of
  * the WAV payloads. Every multimodal feature in the driver surface
  * derives from parsed bytes of a real format.
  *
  * Scale: payloads never shuffle — all queries are per-row/partition
  * map work; at 100 TB the binary column rides in parquet and only
  * small extracted features flow downstream.
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, payload: Array[Byte])

  /** Deterministic pixel generator — the synthetic sensor: byte `i`
    * of document `d`'s RGB plane is `(d*31 + i*7) % 256`. This is the
    * contract the SQL oracle recomputes; keep the two in lockstep. */
  def pixelByte(docId: Long, i: Int): Int =
    ((docId * 31 + i.toLong * 7) % 256).toInt

  /** Image geometry for a document: width from the text's code-point
    * length, height from the id (both oracle-expressible). */
  def imgDims(docId: Long, textCodePoints: Int): (Int, Int) =
    (4 + textCodePoints % 29, 3 + (docId % 17).toInt)

  /** REAL PPM (P6) encoder: `P6\n{w} {h}\n255\n` + w*h RGB triples
    * from an arbitrary pixel generator (mm02 uses [[pixelByte]]; the
    * mm03 video container encodes one segment per frame). */
  def encodePpmFrame(w: Int, h: Int, pix: Int => Int): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + 3 * w * h)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < 3 * w * h) {
      out(header.length + i) = pix(i).toByte
      i += 1
    }
    out
  }

  def encodePpm(docId: Long, w: Int, h: Int): Array[Byte] =
    encodePpmFrame(w, h, pixelByte(docId, _))

  final case class PpmImage(width: Int, height: Int, maxVal: Int,
      pixels: Array[Byte])

  /** REAL PPM (P6) parser for ONE image starting at `start`: validates
    * the magic, parses the whitespace/comment-delimited ASCII dims and
    * maxval, requires the full pixel plane, and returns the image plus
    * the offset just past it — a container of concatenated frames
    * (mm03) walks segments with this; [[decodePpm]] additionally
    * requires full consumption. Malformed payloads throw, they don't
    * produce garbage features. */
  def parsePpmAt(payload: Array[Byte], start: Int): (PpmImage, Int) = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"PPM decode: $msg")
    if (payload.length < start + 2 || payload(start) != 'P' ||
        payload(start + 1) != '6')
      fail(s"bad magic at byte $start (want P6)")
    var pos = start + 2
    def skipWs(): Unit = {
      var more = true
      while (more && pos < payload.length) payload(pos) match {
        case ' ' | '\n' | '\r' | '\t' => pos += 1
        case '#' => // PPM comment: to end of line
          while (pos < payload.length && payload(pos) != '\n') pos += 1
        case _ => more = false
      }
    }
    def parseInt(): Int = {
      skipWs()
      var v = 0
      var any = false
      while (pos < payload.length &&
          payload(pos) >= '0' && payload(pos) <= '9') {
        v = v * 10 + (payload(pos) - '0')
        // overflow guard: a long digit run must fail, not wrap Int and
        // sneak a bogus value past the dim/maxval checks below
        if (v > 100000000) fail("integer too large in header")
        pos += 1
        any = true
      }
      if (!any) fail(s"expected integer at byte $pos")
      v
    }
    val w = parseInt()
    val h = parseInt()
    val mv = parseInt()
    // dim cap also guards the 3*w*h Int arithmetic below: 2^15 each
    // side keeps the plane size < 2^33... so compute in Long and cap
    if (w <= 0 || h <= 0 || w > 0x8000 || h > 0x8000)
      fail(s"bad dims ${w}x$h")
    if (mv != 255) fail(s"unsupported maxval $mv (want 8-bit)")
    // exactly ONE whitespace byte separates maxval from the plane —
    // and it must BE whitespace, or the header is malformed
    if (pos >= payload.length) fail("missing pixel plane")
    payload(pos) match {
      case ' ' | '\n' | '\r' | '\t' => pos += 1
      case b => fail(s"expected whitespace after maxval, got byte $b")
    }
    val nL = 3L * w * h
    if (nL > Int.MaxValue - pos) fail(s"pixel plane too large ($nL)")
    val n = nL.toInt
    if (payload.length - pos < n)
      fail(s"pixel plane is ${payload.length - pos} bytes, want $n")
    (PpmImage(w, h, mv,
      java.util.Arrays.copyOfRange(payload, pos, pos + n)), pos + n)
  }

  /** Single-image decode: one frame, full consumption required. */
  def decodePpm(payload: Array[Byte]): PpmImage = {
    val (img, end) = parsePpmAt(payload, 0)
    if (end != payload.length)
      throw new IllegalArgumentException(
        s"PPM decode: pixel plane has ${payload.length - end} trailing bytes")
    img
  }

  final case class ImgFeatures(doc_id: Long, width: Int, height: Int,
      max_val: Int, n_pixels: Int, checksum: Long)

  /** mm02 worker: decode + feature-extract (dims, pixel-sum). */
  def decodeFeatures(r: MediaRecord): ImgFeatures = {
    val img = decodePpm(r.payload)
    var sum = 0L
    var i = 0
    while (i < img.pixels.length) { sum += img.pixels(i) & 0xFF; i += 1 }
    ImgFeatures(r.doc_id, img.width, img.height, img.maxVal,
      img.width * img.height, sum)
  }

  final case class ResizedImg(doc_id: Long, out_width: Int,
      out_height: Int, checksum: Long)

  /** mm04 worker: decode, then REAL nearest-neighbor 2x downsample on
    * the pixel grid — output pixel (x,y) = input pixel (2x,2y), all
    * three channels — and checksum the resized plane. */
  def resizeHalf(r: MediaRecord): ResizedImg = {
    val img = decodePpm(r.payload)
    val w2 = (img.width + 1) / 2
    val h2 = (img.height + 1) / 2
    var sum = 0L
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) {
        val base = ((2 * y) * img.width + 2 * x) * 3
        sum += (img.pixels(base) & 0xFF) + (img.pixels(base + 1) & 0xFF) +
          (img.pixels(base + 2) & 0xFF)
        x += 1
      }
      y += 1
    }
    ResizedImg(r.doc_id, w2, h2, sum)
  }

  /** mm16: REAL PNG encoder — the same deterministic pixel generator
    * rendered through `javax.imageio` (pure JDK, zero new
    * dependencies): filtered, zlib-compressed, CRC-checked IDAT
    * chunks, not a homegrown container. Pixels land in a
    * TYPE_3BYTE_BGR raster (written bytes are B,G,R per pixel;
    * the generator is R,G,B-ordered, hence the index swizzle). */
  /** One-time JVM-global ImageIO configuration: route stream caching
    * through memory instead of the default temp-file cache. A lazy
    * val so the static `setUseCache` mutation runs ONCE per executor
    * JVM at first codec use (round-12 advisor: the per-record static
    * write was redundant work and an unsynchronized global mutation
    * on every row). Still process-global by ImageIO's design — any
    * co-resident ImageIO user in the JVM inherits the in-memory
    * cache, which is the documented trade for removing a temp-file
    * create/delete per decoded/encoded payload. */
  private lazy val imageIoInMemory: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  def encodePng(docId: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val data = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferByte].getData
    var p = 0
    while (p < w * h) {
      data(p * 3) = pixelByte(docId, p * 3 + 2).toByte // B
      data(p * 3 + 1) = pixelByte(docId, p * 3 + 1).toByte // G
      data(p * 3 + 2) = pixelByte(docId, p * 3).toByte // R
      p += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    // same disk-cache default as the decode path (see
    // decodePngFeatures): write through the in-memory cache
    imageIoInMemory
    if (!javax.imageio.ImageIO.write(img, "png", baos))
      throw new IllegalStateException("no PNG writer available")
    baos.toByteArray
  }

  /** Synthetic PNG media table — [[mediaPayloads]]' geometry with the
    * payload encoded as a genuine PNG instead of PPM. */
  def pngPayloads(s: SparkSession, d: String)
      : org.apache.spark.sql.Dataset[MediaRecord] = {
    import s.implicits._
    documents(s, d).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val (w, h) = imgDims(id, text.codePointCount(0, text.length))
        MediaRecord(id, encodePng(id, w, h))
      }
  }

  final case class PngFeatures(doc_id: Long, width: Int, height: Int,
      n_pixels: Int, checksum: Long)

  /** mm16 worker: REAL PNG decode (ImageIO — zlib inflate, filter
    * reconstruction, CRC validation) + the mm02 feature set. Decode
    * failures throw loudly, they never produce garbage features. */
  def decodePngFeatures(r: MediaRecord): PngFeatures = {
    // ImageIO defaults to a DISK-backed stream cache — one temp file
    // created and deleted per decoded image, pure I/O overhead for a
    // payload already in memory (measured: mm16 swung 2.4–7.1 s run
    // to run with GC and peak memory EXACTLY flat — the variance was
    // temp-file I/O contending with host load, not decode work).
    // The in-memory cache removes the filesystem from the decode
    // path entirely.
    imageIoInMemory
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r.payload))
    require(img != null, s"PNG decode failed for doc ${r.doc_id}")
    val w = img.getWidth
    val h = img.getHeight
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sum += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
        x += 1
      }
      y += 1
    }
    PngFeatures(r.doc_id, w, h, w * h, sum)
  }

  // ---- mm18: JPEG, the LOSSY real-world container ------------------

  /** mm18's pinned encode quality: ImageIO's JPEG writer default is
    * writer-defined, so the quality is set EXPLICITLY — half of the
    * determinism contract a lossy container needs in place of mm16's
    * bit-exactness (round-13 verdict ask #5). */
  private[graft] val JpegQuality = 0.92f

  /** mm18's pixel generator — SMOOTH and CHROMA-NEUTRAL by design,
    * unlike [[pixelByte]]: R=G=B = a linear two-axis luma ramp plus a
    * per-doc DC offset (no mod wraps, no clipping: 96+96+63 ≤ 255).
    * The mm02/mm16 sawtooth (mod-256 wrap every ~12 px) is
    * adversarial for a DCT codec — measured max |err| 249 at any
    * sane quality, i.e. no per-channel tolerance law can hold on
    * it — and RGB gradients lose another 70 levels to 4:2:0 chroma
    * subsampling on these tiny images; a lossy container's contract
    * is only meaningful on signal statistics the codec was built
    * for. Deterministic, doc-dependent, closed-form for the spec. */
  def jpegPixel(docId: Long, w: Int, h: Int, x: Int, y: Int,
      c: Int): Int =
    (x * 96) / math.max(w - 1, 1) + (y * 96) / math.max(h - 1, 1) +
      (docId % 64).toInt

  /** The decode-tolerance law's per-channel bound: every channel of
    * every decoded pixel must sit within this distance of the
    * generator source. Measured max |err| = 2 across every image at
    * both sf0.001 and sf0.01 (Round14OpsSpec re-measures, so a JDK
    * codec change announces itself); the pinned bound carries 4×
    * margin. */
  private[graft] val JpegMaxAbsErr = 8

  def encodeJpeg(docId: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val data = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferByte].getData
    var p = 0
    while (p < w * h) {
      val x = p % w
      val y = p / w
      data(p * 3) = jpegPixel(docId, w, h, x, y, 2).toByte // B
      data(p * 3 + 1) = jpegPixel(docId, w, h, x, y, 1).toByte // G
      data(p * 3 + 2) = jpegPixel(docId, w, h, x, y, 0).toByte // R
      p += 1
    }
    imageIoInMemory
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(JpegQuality)
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    } finally {
      writer.dispose()
      ios.close()
    }
    baos.toByteArray
  }

  /** Synthetic JPEG media table — [[mediaPayloads]]' geometry through
    * the lossy encoder. */
  def jpegPayloads(s: SparkSession, d: String)
      : org.apache.spark.sql.Dataset[MediaRecord] = {
    import s.implicits._
    documents(s, d).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val (w, h) = imgDims(id, text.codePointCount(0, text.length))
        MediaRecord(id, encodeJpeg(id, w, h))
      }
  }

  final case class JpegFeatures(doc_id: Long, width: Int, height: Int,
      n_pixels: Int, within_tolerance: Boolean, decode_stable: Boolean)

  /** Decoded (width, height, per-channel R,G,B plane) of a JPEG
    * payload — throws loudly on a corrupt payload, never garbage. */
  private def jpegPlane(payload: Array[Byte], docId: Long)
      : (Int, Int, Array[Int]) = {
    imageIoInMemory
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    require(img != null, s"JPEG decode failed for doc $docId")
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Int](3 * w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val p = y * w + x
        out(p * 3) = (rgb >> 16) & 0xFF
        out(p * 3 + 1) = (rgb >> 8) & 0xFF
        out(p * 3 + 2) = rgb & 0xFF
        x += 1
      }
      y += 1
    }
    (w, h, out)
  }

  /** The worst per-channel decode error of a payload vs the
    * generator source — the quantity the tolerance law bounds
    * (exposed for the spec's measured-max record). */
  private[graft] def jpegWorstErr(r: MediaRecord): Int = {
    val (w, h, plane) = jpegPlane(r.payload, r.doc_id)
    var worst = 0
    var i = 0
    while (i < plane.length) {
      val p = i / 3
      val e = math.abs(plane(i) -
        jpegPixel(r.doc_id, w, h, p % w, p / w, i % 3))
      if (e > worst) worst = e
      i += 1
    }
    worst
  }

  /** mm18 worker: lossy decode under the DETERMINISM CONTRACT —
    * where mm16's hash gate pins decoded == generator bit-for-bit
    * (lossless), a lossy container pins (a) the geometry survives,
    * (b) every channel of every pixel sits within the spec-pinned
    * tolerance of the source, and (c) the decode is bytewise STABLE
    * (two independent decodes of the payload agree exactly — the
    * JDK-decoder determinism mm17 pinned for WAV, asserted per row
    * inside the hashed output, not just in a spec). */
  def decodeJpegFeatures(r: MediaRecord): JpegFeatures = {
    val (w, h, plane) = jpegPlane(r.payload, r.doc_id)
    val (_, _, plane2) = jpegPlane(r.payload, r.doc_id)
    var worst = 0
    var stable = plane.length == plane2.length
    var i = 0
    while (i < plane.length) {
      val p = i / 3
      val e = math.abs(plane(i) -
        jpegPixel(r.doc_id, w, h, p % w, p / w, i % 3))
      if (e > worst) worst = e
      if (stable && plane(i) != plane2(i)) stable = false
      i += 1
    }
    JpegFeatures(r.doc_id, w, h, w * h,
      within_tolerance = worst <= JpegMaxAbsErr, decode_stable = stable)
  }

  final case class ImgAHash(doc_id: Long, width: Int, height: Int,
      ahash_hi: Long, ahash_lo: Long)

  /** mm09 worker: perceptual AVERAGE-HASH over the DECODED pixel
    * grid — the image near-dup fingerprint (aHash): partition the
    * image into an 8×8 grid of blocks (block of pixel (x,y) is
    * (⌊8x/w⌋, ⌊8y/h⌋)), per-block mean of the per-pixel channel sums,
    * one bit per block = "block mean strictly above the global mean".
    * Every comparison is the integer cross-multiplication
    * `blockSum·nPixels > totalSum·blockCount`, so the 64-bit vector
    * is exact in any engine (no float means). Emitted as two 32-bit
    * halves so the SQL oracle never shifts into the sign bit.
    * Exact while blockSum·nPixels < 2^63, i.e. images up to ~10^8
    * pixels — any practical decode. Blocks that receive no pixels
    * (w or h < 8) hash as 0-bits in both engines. */
  def imageAHash(r: MediaRecord): ImgAHash = aHashOf(r, edited = false)

  /** mm13's re-encoded VARIANT hash: the same aHash computed over the
    * decoded plane after a deterministic small edit — every 37th
    * pixel's three channels shifted by +101 (mod 256), a stand-in for
    * the watermark/recompression perturbations copy detection must
    * survive. Defined on the DECODED bytes (b′ = (b + 101) mod 256),
    * so the oracle reproduces it from the pixel generator. */
  def imageAHashEdited(r: MediaRecord): ImgAHash = aHashOf(r, edited = true)

  private def aHashOf(r: MediaRecord, edited: Boolean): ImgAHash = {
    val img = decodePpm(r.payload)
    val w = img.width
    val h = img.height
    val cellSum = new Array[Long](64)
    val cellCnt = new Array[Long](64)
    var total = 0L
    var y = 0
    while (y < h) {
      val cy = y * 8 / h
      var x = 0
      while (x < w) {
        val cx = x * 8 / w
        val p = y * w + x
        val base = p * 3
        val shift = if (edited && p % 37 == 0) 101 else 0
        val s = ((img.pixels(base) & 0xFF) + shift) % 256 +
          ((img.pixels(base + 1) & 0xFF) + shift) % 256 +
          ((img.pixels(base + 2) & 0xFF) + shift) % 256
        val c = cy * 8 + cx
        cellSum(c) += s
        cellCnt(c) += 1
        total += s
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    var hi = 0L
    var lo = 0L
    var c = 0
    while (c < 64) {
      if (cellSum(c) * n > total * cellCnt(c)) {
        if (c < 32) lo |= 1L << c else hi |= 1L << (c - 32)
      }
      c += 1
    }
    ImgAHash(r.doc_id, w, h, hi, lo)
  }

  // ---- mm03: real multi-frame PPM (video) container -----------------

  /** Frame count / per-frame geometry / per-frame pixel generator of
    * the synthetic video container — all oracle-expressible. */
  def videoFrameCount(docId: Long): Int = 1 + (docId % 7).toInt
  def videoDims(docId: Long, frame: Int, textCodePoints: Int): (Int, Int) =
    (3 + (textCodePoints + frame) % 13, 2 + ((docId + frame) % 5).toInt)
  def videoPixel(docId: Long, frame: Int, i: Int): Int =
    ((docId * 31 + frame.toLong * 17 + i.toLong * 7) % 256).toInt

  /** REAL video-ish container encoder: the payload is a concatenation
    * of genuine P6 images, one per frame — the moral equivalent of an
    * MJPEG stream, parseable only by actually walking the headers
    * (frame sizes differ, so offsets are not computable up front). */
  def encodeVideo(docId: Long, textCodePoints: Int): Array[Byte] = {
    val frames = (0 until videoFrameCount(docId)).map { f =>
      val (w, h) = videoDims(docId, f, textCodePoints)
      encodePpmFrame(w, h, videoPixel(docId, f, _))
    }
    val out = new Array[Byte](frames.map(_.length).sum)
    var pos = 0
    frames.foreach { fr =>
      System.arraycopy(fr, 0, out, pos, fr.length); pos += fr.length
    }
    out
  }

  final case class VideoFrame(doc_id: Long, frame_idx: Int, width: Int,
      height: Int, checksum: Long)

  /** Lazy walk over a container of concatenated P6 frames: each
    * header read decides where the next frame starts; ONE decoded
    * frame lives at a time (mm03 and mm10 share this walk). */
  private def walkPpmFrames(payload: Array[Byte]): Iterator[PpmImage] =
    Iterator.unfold(0) { pos =>
      if (pos >= payload.length) None
      else {
        val (img, next) = parsePpmAt(payload, pos)
        Some((img, next))
      }
    }

  /** mm03 worker: REAL container walk — parse consecutive P6 segments
    * with [[parsePpmAt]] (each header read decides where the next
    * frame starts), sample every 3rd frame, and checksum its DECODED
    * pixel plane. One record → many frames, partition-local. */
  def sampleVideoFrames(r: MediaRecord): Iterator[VideoFrame] = {
    walkPpmFrames(r.payload)
      .zipWithIndex.filter(_._2 % 3 == 0).map { case (img, f) =>
      var sum = 0L
      var i = 0
      while (i < img.pixels.length) { sum += img.pixels(i) & 0xFF; i += 1 }
      VideoFrame(r.doc_id, f, img.width, img.height, sum)
    }
  }

  final case class ShotFrame(doc_id: Long, frame_idx: Int,
      brightness_sum: Long, n_bytes: Long, is_boundary: Boolean)

  /** mm10 worker: SHOT-BOUNDARY DETECTION over the decoded container —
    * walk every frame (real header-by-header parse, like mm03), take
    * the pixel-plane byte sum as the brightness integral, and flag a
    * cut when the mean brightness jumps more than 5% between
    * consecutive frames. Frames differ in geometry, so the comparison
    * is on MEANS via exact integer cross-multiplication:
    * |sum_f·n_p − sum_p·n_f| · 20 > sum_p · n_f  ⇔  |Δmean| > 5%·mean_p
    * — no float anywhere, the flag is engine-exact. Frame 0 is never
    * a boundary (nothing precedes it). */
  def shotBoundaries(r: MediaRecord): Iterator[ShotFrame] = {
    // LAZY frame walk (shared with mm03): one decoded frame in memory
    // at a time — prev sum/count are all the state the cut rule needs
    var prevSum = 0L
    var prevN = 0L
    walkPpmFrames(r.payload).zipWithIndex.map { case (img, f) =>
      var sum = 0L
      var i = 0
      while (i < img.pixels.length) { sum += img.pixels(i) & 0xFF; i += 1 }
      val n = img.pixels.length.toLong
      val cut = f > 0 &&
        math.abs(sum * prevN - prevSum * n) * 20 > prevSum * n
      prevSum = sum
      prevN = n
      ShotFrame(r.doc_id, f, sum, n, cut)
    }
  }

  /** Synthetic video table: (doc_id, payload = concatenated P6
    * frames), geometry derived from the document. */
  def videoPayloads(s: SparkSession, d: String)
      : org.apache.spark.sql.Dataset[MediaRecord] = {
    import s.implicits._
    documents(s, d).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        MediaRecord(id, encodeVideo(id, text.codePointCount(0, text.length)))
      }
  }

  // ---- mm05: overlapping windows over decoded WAV PCM ---------------

  final case class WavChunk(doc_id: Long, chunk_idx: Int, n_frames: Int,
      checksum: Long)

  private val WavChunkStride = 32
  private val WavChunkWidth = 48

  /** mm05 worker: OVERLAPPING windows (width 48 frames, stride 32 —
    * each ASR-style transcription window carries 16 frames of context
    * from its predecessor) over the DECODED PCM of a real WAV payload;
    * per-window feature is the signed-sample checksum across
    * channels. */
  def overlapWavChunks(r: MediaRecord): Iterator[WavChunk] = {
    val wav = decodeWav(r.payload)
    val totalFrames = wav.pcm.length / (wav.channels * 2)
    val nChunks = (totalFrames + WavChunkStride - 1) / WavChunkStride
    Iterator.range(0, nChunks).map { c =>
      val from = c * WavChunkStride
      val until = math.min(from + WavChunkWidth, totalFrames)
      var sum = 0L
      var i = from
      while (i < until) {
        var ch = 0
        while (ch < wav.channels) {
          val off = (i * wav.channels + ch) * 2
          sum += (wav.pcm(off + 1).toInt << 8) | (wav.pcm(off) & 0xFF)
          ch += 1
        }
        i += 1
      }
      WavChunk(r.doc_id, c, until - from, sum)
    }
  }

  // ---- mm06: real RIFF/WAVE codec ----------------------------------

  /** Deterministic PCM generator — the synthetic microphone: sample
    * value of document `d`, frame `i`, channel `c` is
    * `((d*37 + i*11 + c*5) % 65536) - 32768` (full int16 range). The
    * SQL oracle recomputes exactly this. */
  def sampleValue(docId: Long, frame: Int, ch: Int): Int =
    (((docId * 37 + frame.toLong * 11 + ch.toLong * 5) % 65536) - 32768).toInt

  /** WAV geometry for a document: sample rate and channel count from
    * the id, frame count from the text's code-point length (all
    * oracle-expressible). */
  def wavGeometry(docId: Long, textCodePoints: Int): (Int, Int, Int) =
    (8000 + 4000 * (docId % 3).toInt, // sample rate
      1 + (docId % 2).toInt, // channels
      16 + textCodePoints % 101) // frames

  /** REAL RIFF/WAVE encoder: RIFF header, canonical 16-byte fmt chunk
    * (PCM, 16-bit), an even-sized LIST chunk of junk bytes (so the
    * parser's unknown-chunk skip is exercised on every payload), and
    * the interleaved little-endian PCM data chunk. */
  def encodeWav(docId: Long, sampleRate: Int, channels: Int,
      nFrames: Int): Array[Byte] = {
    val listSize = 2 * (docId % 5).toInt // even ⇒ no RIFF pad byte
    val dataSize = nFrames * channels * 2
    val riffSize = 4 + (8 + 16) + (8 + listSize) + (8 + dataSize)
    val out = new Array[Byte](8 + riffSize)
    var pos = 0
    def putTag(tag: String): Unit = {
      var i = 0
      while (i < 4) { out(pos) = tag.charAt(i).toByte; pos += 1; i += 1 }
    }
    def putLE32(v: Long): Unit = {
      out(pos) = (v & 0xFF).toByte
      out(pos + 1) = ((v >> 8) & 0xFF).toByte
      out(pos + 2) = ((v >> 16) & 0xFF).toByte
      out(pos + 3) = ((v >> 24) & 0xFF).toByte
      pos += 4
    }
    def putLE16(v: Int): Unit = {
      out(pos) = (v & 0xFF).toByte
      out(pos + 1) = ((v >> 8) & 0xFF).toByte
      pos += 2
    }
    putTag("RIFF"); putLE32(riffSize.toLong); putTag("WAVE")
    putTag("fmt "); putLE32(16L)
    putLE16(1) // PCM
    putLE16(channels)
    putLE32(sampleRate.toLong)
    putLE32(sampleRate.toLong * channels * 2) // byte rate
    putLE16(channels * 2) // block align
    putLE16(16) // bits per sample
    putTag("LIST"); putLE32(listSize.toLong)
    var j = 0
    while (j < listSize) {
      out(pos) = ((docId + j) % 256).toByte; pos += 1; j += 1
    }
    putTag("data"); putLE32(dataSize.toLong)
    var i = 0
    while (i < nFrames) {
      var c = 0
      while (c < channels) {
        putLE16(sampleValue(docId, i, c) & 0xFFFF)
        c += 1
      }
      i += 1
    }
    out
  }

  final case class WavAudio(sampleRate: Int, channels: Int,
      bitsPerSample: Int, pcm: Array[Byte])

  final case class JdkWavFeatures(doc_id: Long, sample_rate: Int,
      n_channels: Int, n_frames: Long, sum_samples: Long, energy: Long)

  /** mm17 worker: decode the RIFF/WAVE payload through the JDK's OWN
    * decoder (`javax.sound.sampled.AudioSystem` — the standard-library
    * WaveFileReader, zero new dependencies), not the hand-rolled
    * parser mm06 uses: a second, independent implementation of the
    * container spec reading the same bytes. Every declared property is
    * required (PCM-signed, 16-bit, little-endian, frame count =
    * payload), then the decoded samples fold to two order-fixed
    * integer checksums. A corrupted payload throws loudly
    * (UnsupportedAudioFileException), never garbage features. */
  def decodeWavJdk(r: MediaRecord): JdkWavFeatures = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val ais = AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(r.payload))
    // close even though the backing stream is an in-memory byte array:
    // the AudioInputStream wrapper itself is a per-record resource, and
    // a file/stream-backed source would leak without it (round-12
    // advisor)
    val (fmt, ch, frames, bytes) =
      try {
        val f = ais.getFormat
        require(f.getEncoding == AudioFormat.Encoding.PCM_SIGNED,
          s"doc ${r.doc_id}: non-PCM encoding ${f.getEncoding}")
        require(f.getSampleSizeInBits == 16 && !f.isBigEndian,
          s"doc ${r.doc_id}: unexpected sample layout $f")
        (f, f.getChannels, ais.getFrameLength, ais.readAllBytes())
      } finally ais.close()
    require(bytes.length.toLong == frames * ch * 2,
      s"doc ${r.doc_id}: decoded ${bytes.length} bytes, " +
        s"declared ${frames * ch * 2}")
    var sum = 0L
    var energy = 0L
    var off = 0
    while (off < bytes.length) {
      val v = (bytes(off + 1).toInt << 8) | (bytes(off) & 0xFF)
      sum += v
      energy += v.toLong * v
      off += 2
    }
    JdkWavFeatures(r.doc_id, fmt.getSampleRate.toInt, ch, frames,
      sum, energy)
  }

  /** REAL RIFF/WAVE parser: validates the RIFF magic and declared
    * size, requires a canonical PCM/16-bit fmt chunk BEFORE the data
    * chunk, checks byte-rate/block-align consistency and exact data
    * length, skips unknown chunks (with the RIFF odd-size pad rule),
    * and throws loudly on any malformation — truncated or corrupt
    * payloads never produce garbage features. */
  def decodeWav(p: Array[Byte]): WavAudio = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"WAV decode: $msg")
    def u16(off: Int): Int =
      (p(off) & 0xFF) | ((p(off + 1) & 0xFF) << 8)
    def u32(off: Int): Long =
      (p(off) & 0xFFL) | ((p(off + 1) & 0xFFL) << 8) |
        ((p(off + 2) & 0xFFL) << 16) | ((p(off + 3) & 0xFFL) << 24)
    def tag(off: Int): String =
      new String(p, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (p.length < 12 || tag(0) != "RIFF") fail("bad magic (want RIFF)")
    if (u32(4) != p.length - 8)
      fail(s"RIFF size ${u32(4)} != payload ${p.length - 8}")
    if (tag(8) != "WAVE") fail("bad form type (want WAVE)")
    var pos = 12
    var channels = 0
    var sampleRate = 0
    var blockAlign = 0
    var pcm: Array[Byte] = null
    while (pos + 8 <= p.length) {
      val id = tag(pos)
      val sizeL = u32(pos + 4)
      pos += 8
      if (sizeL > p.length - pos) fail(s"chunk $id overruns payload")
      val size = sizeL.toInt
      id match {
        case "fmt " =>
          if (size < 16) fail(s"fmt chunk too short ($size)")
          if (u16(pos) != 1) fail(s"unsupported audio format ${u16(pos)}")
          channels = u16(pos + 2)
          sampleRate = u32(pos + 4).toInt
          blockAlign = u16(pos + 12)
          if (channels <= 0 || sampleRate <= 0) fail("bad fmt geometry")
          if (u16(pos + 14) != 16)
            fail(s"unsupported bits/sample ${u16(pos + 14)} (want 16)")
          if (blockAlign != channels * 2)
            fail(s"block align $blockAlign != channels*2")
          if (u32(pos + 8) != sampleRate.toLong * blockAlign)
            fail("byte rate inconsistent with rate*blockAlign")
        case "data" =>
          if (blockAlign == 0) fail("data chunk before fmt")
          if (size % blockAlign != 0)
            fail(s"data size $size not frame-aligned ($blockAlign)")
          pcm = java.util.Arrays.copyOfRange(p, pos, pos + size)
        case _ => () // unknown chunk (LIST here): skip
      }
      pos += size + (size % 2) // RIFF chunks are word-aligned
    }
    if (pos != p.length) fail("trailing bytes after last chunk")
    if (pcm == null) fail("missing data chunk")
    WavAudio(sampleRate, channels, 16, pcm)
  }

  final case class AudioWindow(doc_id: Long, window_idx: Int,
      sample_rate: Int, n_channels: Int, n_frames: Int, checksum: Long,
      duration_us: Long)

  private val WavWindowFrames = 32

  /** mm06 worker: decode the container, then sample every 2nd
    * 32-frame window from the DECODED PCM — per-window feature is the
    * signed-sample checksum across channels; duration is derived from
    * the decoded frame count and rate (integer µs, engine-exact). */
  def sampleWavWindows(r: MediaRecord): Iterator[AudioWindow] = {
    val wav = decodeWav(r.payload)
    val blockAlign = wav.channels * 2
    val totalFrames = wav.pcm.length / blockAlign
    val durationUs = totalFrames.toLong * 1000000L / wav.sampleRate
    val nWin = (totalFrames + WavWindowFrames - 1) / WavWindowFrames
    Iterator.range(0, nWin).filter(_ % 2 == 0).map { w =>
      val from = w * WavWindowFrames
      val until = math.min(from + WavWindowFrames, totalFrames)
      var sum = 0L
      var i = from
      while (i < until) {
        var c = 0
        while (c < wav.channels) {
          val off = (i * wav.channels + c) * 2
          sum += (wav.pcm(off + 1).toInt << 8) | (wav.pcm(off) & 0xFF)
          c += 1
        }
        i += 1
      }
      AudioWindow(r.doc_id, w, wav.sampleRate, wav.channels,
        until - from, sum, durationUs)
    }
  }

  final case class AudioEnergy(doc_id: Long, window_idx: Int,
      n_samples: Int, energy: Long, is_voiced: Boolean)

  /** mm08 worker: decode the container, then compute per-32-frame
    * window ENERGY (Σ sample² across channels — exact integer, ≤
    * 64·2³⁰ per window, far inside long range) over EVERY window.
    * `is_voiced` is the VAD-style gate — mean square above ⅓ of
    * full-scale², kept as an integer cross-multiplication
    * (energy·3 > n_samples·32768²) so the flag is engine-exact. The
    * segmentation primitive an audio-curation pipeline runs to drop
    * silence before feature extraction. */
  def wavEnergyWindows(r: MediaRecord): Iterator[AudioEnergy] = {
    val wav = decodeWav(r.payload)
    val blockAlign = wav.channels * 2
    val totalFrames = wav.pcm.length / blockAlign
    val nWin = (totalFrames + WavWindowFrames - 1) / WavWindowFrames
    Iterator.range(0, nWin).map { w =>
      val from = w * WavWindowFrames
      val until = math.min(from + WavWindowFrames, totalFrames)
      var energy = 0L
      var i = from
      while (i < until) {
        var c = 0
        while (c < wav.channels) {
          val off = (i * wav.channels + c) * 2
          val s = ((wav.pcm(off + 1).toInt << 8) |
            (wav.pcm(off) & 0xFF)).toLong
          energy += s * s
          c += 1
        }
        i += 1
      }
      val nSamples = (until - from) * wav.channels
      AudioEnergy(r.doc_id, w, nSamples, energy,
        energy * 3 > nSamples.toLong * 32768L * 32768L)
    }
  }

  final case class AudioFrameKey(doc_id: Long, frame_idx: Int, fkey: Long)

  /** mm14 worker: per-frame content keys from the DECODED PCM — the
    * frame-shingle basis of aligned audio copy detection (dd05's
    * shingle-overlap shape on the audio modality): key(f) =
    * Σ_c s(f,c)·(c+1) over the first 16 frames (every payload has
    * ≥ 16 by the generator's floor). A re-encode that perturbs some
    * frames leaves the REST of the keys intact, so copies surface as
    * high aligned-frame overlap; unrelated docs share essentially no
    * aligned keys. `edited = true` keys the deterministic re-encode
    * (every (doc_id+f)%7 frame's samples shifted by 999+31f, wrapped
    * int16 — ~14% of frames touched). */
  def audioFrameKeys(r: MediaRecord,
      edited: Boolean): Iterator[AudioFrameKey] = {
    val wav = decodeWav(r.payload)
    Iterator.range(0, 16).map { f =>
      var key = 0L
      var c = 0
      while (c < wav.channels) {
        val off = (f * wav.channels + c) * 2
        var s = ((wav.pcm(off + 1).toInt << 8) |
          (wav.pcm(off) & 0xFF)).toLong
        if (edited && (r.doc_id + f) % 7 == 0)
          s = ((s + 32768 + 999 + f * 31) % 65536) - 32768
        key += s * (c + 1)
        c += 1
      }
      AudioFrameKey(r.doc_id, f, key)
    }
  }

  /** Synthetic audio table: (doc_id, payload) where payload is a real
    * RIFF/WAVE file whose geometry derives from the document — the
    * binary-column source mm06 decodes. */
  def wavPayloads(s: SparkSession, d: String)
      : org.apache.spark.sql.Dataset[MediaRecord] = {
    import s.implicits._
    documents(s, d).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val (rate, ch, frames) =
          wavGeometry(id, text.codePointCount(0, text.length))
        MediaRecord(id, encodeWav(id, rate, ch, frames))
      }
  }

  /** Synthetic media table: (doc_id, payload) where payload is a real
    * P6 image whose geometry derives from the document (width from
    * code-point length, height from id) — the binary-column source
    * mm02/mm04 decode. Width uses codePointCount to match DuckDB's
    * `length(text)` (code points, not UTF-16 units or bytes). */
  def mediaPayloads(s: SparkSession, d: String)
      : org.apache.spark.sql.Dataset[MediaRecord] = {
    import s.implicits._
    documents(s, d).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val (w, h) = imgDims(id, text.codePointCount(0, text.length))
        MediaRecord(id, encodePpm(id, w, h))
      }
  }

  /** mm07 geometry: bytes per synthetic image patch, the joint
    * sequence budget (text tokens + image patches), and the shard
    * count of the packing layout. */
  private val MmPatchBytes = 64
  private val MmSeqBudget = 512L
  private val MmShards = 8L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // mm07: INTERLEAVED MULTIMODAL PACKING — io11's sequence packing
    // generalized to mixed modalities: each document contributes an
    // IMAGE item (patch count; the stand-in is ceil(bytes/64), the
    // shape a ViT patchifier yields per image) and a TEXT item (token
    // count), the image preceding its text (the vision-language
    // interleave order), and items pack greedily into fixed-budget
    // training sequences per shard. The offsets say which sequences
    // each item spans — the index a multimodal dataloader reads.
    // Scale: identical to io11 — the cumsum windows partition BY
    // SHARD (never a global window), items are metadata-only
    // (id, cost), payloads never move.
    "mm07_modality_pack" -> ((s, d) => {
      import graft.functions.Funcs.{md5Long, tokens}
      val h = md5Long(concat(lit("mmpack:"), col("doc_id").cast("string")), 15)
      val base = documents(s, d)
        .select(col("doc_id"), h.as("h"), (h % MmShards).as("shard"),
          size(tokens(col("text"))).cast("long").as("n_tokens"),
          ceil(octet_length(col("text").cast("binary")).cast("double")
            / MmPatchBytes).cast("long").as("n_patches"))
      val items = base
        .select(col("doc_id"), col("h"), col("shard"),
          lit("image").as("modality"), lit(0L).as("ord"),
          col("n_patches").as("cost"))
        .where(col("cost") > 0)
        .unionByName(base
          .select(col("doc_id"), col("h"), col("shard"),
            lit("text").as("modality"), lit(1L).as("ord"),
            col("n_tokens").as("cost"))
          .where(col("cost") > 0))
      val w = Window.partitionBy("shard").orderBy("h", "doc_id", "ord")
        .rowsBetween(Window.unboundedPreceding, -1)
      items
        .withColumn("start_offset",
          coalesce(sum("cost").over(w), lit(0L)))
        .select(col("shard"), col("doc_id"), col("modality"), col("cost"),
          col("start_offset"),
          expr(s"start_offset div $MmSeqBudget").as("seq_first"),
          expr(s"(start_offset + cost - 1) div $MmSeqBudget")
            .as("seq_last"))
        .orderBy("shard", "start_offset", "ord")
    }),

    // mm05: overlapping chunk extraction over a REAL audio container —
    // the ASR/transcription batch shape (stride 32 < width 48 ⇒
    // consecutive windows share 16 frames of context), computed from
    // the DECODED PCM of a genuine WAV payload (mm06's codec). The
    // oracle recomputes the PCM generator, so the hash proves decode +
    // windowing end-to-end. Payloads never shuffle; only the small
    // per-chunk feature structs flow downstream.
    "mm05_chunk_overlap" -> ((s, d) => {
      import s.implicits._
      wavPayloads(s, d)
        .mapPartitions(_.flatMap(overlapWavChunks))
        .toDF()
        .orderBy("doc_id", "chunk_idx")
    }),

    // mm03: frame sampling over a REAL multi-frame container — the
    // payload is a concatenation of genuine P6 images (an MJPEG-moral
    // stream; frame sizes differ, so the only way to find frame k is
    // to actually parse headers 0..k-1), every 3rd frame is sampled
    // and its DECODED pixel plane checksummed. One record → many
    // frames as a partition-local flatMap over a typed Dataset; the
    // oracle recomputes the generator, proving the container walk
    // byte-exact.
    "mm03_frame_sample" -> ((s, d) => {
      import s.implicits._
      videoPayloads(s, d)
        .mapPartitions(_.flatMap(sampleVideoFrames))
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

    // mm02: REAL codec round trip — render each document as a genuine
    // PPM image (header + RGB plane), then parse it back and extract
    // features per partition. The oracle recomputes the generator
    // arithmetic, so a hash match proves the bytes round-tripped.
    "mm02_decode_features" -> ((s, d) => {
      import s.implicits._
      mediaPayloads(s, d)
        .mapPartitions(_.map(decodeFeatures))
        .toDF()
        .orderBy("doc_id")
    }),

    // mm16: the mm02 round trip through a REAL-WORLD container —
    // PNG via javax.imageio (pure JDK): the encoder emits filtered
    // zlib-compressed CRC-checked IDAT chunks, the decoder inflates
    // and reconstructs, and the oracle recomputes the GENERATOR
    // arithmetic — so the hash gate proves a genuine
    // compress→decompress→filter-reconstruct cycle is pixel-exact,
    // upgrading the mm family's image evidence from
    // synthetic-container (PPM's raw plane) to the container web
    // corpora actually carry. Same scale shape as mm02: payloads
    // never shuffle, one-record→one-record partition map, only
    // small features flow downstream. Round12OpsSpec additionally
    // proves decoded RGB == generator byte-for-byte per pixel.
    "mm16_png_decode" -> ((s, d) => {
      import s.implicits._
      pngPayloads(s, d)
        .mapPartitions(_.map(decodePngFeatures))
        .toDF()
        .orderBy("doc_id")
    }),

    // mm18: the LOSSY real-world container (round-13 verdict ask #5).
    // A lossy codec can't repeat mm16's bit-exact gate, so the hash
    // gate pins the DETERMINISM CONTRACT instead: geometry survives
    // the container (width/height/n_pixels — oracle recomputes the
    // generator arithmetic), every channel of every decoded pixel
    // sits within the spec-pinned tolerance of the source
    // (JpegMaxAbsErr — the law a downstream feature pipeline relies
    // on), and the decode is bytewise stable across two independent
    // reads (mm17's JDK-determinism pin, asserted PER ROW inside the
    // hashed output). The oracle emits the geometry and TRUE for both
    // verdicts — any image violating the law fails the hash, and a
    // corrupt payload throws loudly (spec-pinned). Exact decoded
    // checksums are additionally byte-frozen in Round14OpsSpec so a
    // JDK codec change announces itself.
    "mm18_jpeg_decode" -> ((s, d) => {
      import s.implicits._
      jpegPayloads(s, d)
        .mapPartitions(_.map(decodeJpegFeatures))
        .toDF()
        .orderBy("doc_id")
    }),

    // mm04: decode + real nearest-neighbor 2x downsample on the pixel
    // grid; one-record→one-record map, payloads never shuffle.
    "mm04_resize" -> ((s, d) => {
      import s.implicits._
      mediaPayloads(s, d)
        .mapPartitions(_.map(resizeHalf))
        .toDF()
        .orderBy("doc_id")
    }),

    // mm06: frame sampling over a REAL container — each document is
    // rendered as a genuine RIFF/WAVE file (fmt + skipped LIST + PCM
    // data chunks) and every feature below comes from the PARSED
    // payload: rate/channels from the fmt chunk, duration from the
    // decoded frame count, checksums from the decoded little-endian
    // int16 samples. The oracle recomputes the PCM generator, so the
    // hash match proves the container round trip byte-exact — the
    // mm02 pattern applied to the one-record→many-windows audio
    // shape. Payloads never shuffle; only window features flow.
    "mm06_wav_frames" -> ((s, d) => {
      import s.implicits._
      wavPayloads(s, d)
        .mapPartitions(_.flatMap(sampleWavWindows))
        .toDF()
        .orderBy("doc_id", "window_idx")
    }),

    // mm17: mm16's real-container upgrade for the AUDIO half — the
    // same RIFF/WAVE payloads decoded through the JDK's OWN decoder
    // (javax.sound.sampled, pure standard library): an independent
    // second implementation of the container spec reading the same
    // bytes, the way a production pipeline's decode stage uses a
    // stock library rather than a hand parser. The oracle recomputes
    // the PCM generator, so the hash gate proves the stock decoder +
    // sample fold end-to-end; Round12OpsSpec adds the byte-for-byte
    // half (JDK-decoded PCM == the hand parser's PCM) and loud
    // failure on a corrupted payload. Same scale shape as mm06:
    // payloads never shuffle, one-record→one-record partition map,
    // two integer checksums per doc flow downstream.
    "mm17_wav_jdk_decode" -> ((s, d) => {
      import s.implicits._
      wavPayloads(s, d)
        .mapPartitions(_.map(decodeWavJdk))
        .toDF()
        .orderBy("doc_id")
    }),

    // mm08: audio ENERGY segmentation (VAD shape) over the decoded
    // PCM — mm06's container round trip extended to the per-window
    // sum-of-squares feature and an integer-exact voiced/silence
    // gate. One record → many windows, payloads never shuffle; the
    // oracle recomputes the PCM generator's samples, so the hash
    // proves decode + windowing + energy math end to end.
    "mm08_audio_energy" -> ((s, d) => {
      import s.implicits._
      wavPayloads(s, d)
        .mapPartitions(_.flatMap(wavEnergyWindows))
        .toDF()
        .orderBy("doc_id", "window_idx")
    }),

    // mm10: SHOT-BOUNDARY DETECTION — the video-curation segmentation
    // step (where does one scene end?) over mm03's real container:
    // every frame decoded by walking the concatenated P6 headers, a
    // cut flagged when mean brightness jumps > 5% between consecutive
    // frames. Geometry changes per frame, so the comparison is
    // integer cross-multiplied means — engine-exact, no float. The
    // oracle recomputes the frame generator and the lag-based cut
    // rule in SQL, so the hash proves container walk + brightness
    // integral + boundary rule end to end. Per-record sequential map
    // work; payloads never shuffle — at 100 TB this is one linear
    // decode pass emitting a few rows per video.
    "mm10_shot_boundaries" -> ((s, d) => {
      import s.implicits._
      videoPayloads(s, d)
        .mapPartitions(_.flatMap(shotBoundaries))
        .toDF()
        .orderBy("doc_id", "frame_idx")
    }),

    // mm15: KEYFRAME SELECTION — the frame-sampling step a video
    // curation pipeline ships downstream (one representative frame
    // per shot to the captioner/embedder, instead of every frame):
    // mm10's cut flags segment each video into shots (running count
    // of boundaries), and within each shot the keyframe is the frame
    // with the highest mean brightness (frame_idx as the
    // deterministic tie-break) — brightness compared in integer
    // MILLI-units via exact integral division (sum·1000 div n), so
    // the argmax is engine-exact with no float anywhere (mm10's
    // cross-multiplication discipline). Output per shot: extent,
    // frame count, and the elected keyframe with its score.
    //
    // Scale: payloads decode per-row in the same lazy frame walk as
    // mm10 and never shuffle — only (doc_id, frame_idx, two longs,
    // flag) rows reach the windows, and every window partitions by
    // doc (or doc+shot): state is bounded by frames-per-video, the
    // shuffle is one doc_id exchange reused by both window passes
    // and the final aggregate.
    "mm15_keyframes" -> ((s, d) => {
      import s.implicits._
      val wDoc = Window.partitionBy("doc_id").orderBy("frame_idx")
      val frames = videoPayloads(s, d)
        .mapPartitions(_.flatMap(shotBoundaries)).toDF()
        .withColumn("shot_idx",
          sum(col("is_boundary").cast("long")).over(wDoc))
        .withColumn("mean_milli",
          expr("brightness_sum * 1000 div n_bytes"))
      val wShot = Window.partitionBy("doc_id", "shot_idx")
        .orderBy(col("mean_milli").desc, col("frame_idx").asc)
      frames
        .withColumn("rn", row_number().over(wShot))
        .groupBy("doc_id", "shot_idx")
        .agg(min("frame_idx").as("start_frame"),
          max("frame_idx").as("end_frame"),
          count(lit(1)).as("n_frames"),
          max(when(col("rn") === 1, col("frame_idx")))
            .as("key_frame_idx"),
          max(when(col("rn") === 1, col("mean_milli")))
            .as("key_mean_milli"))
        .orderBy("doc_id", "shot_idx")
    }),

    // mm09: IMAGE NEAR-DUP FINGERPRINTING — the multimodal twin of
    // dd01: perceptual average-hash (aHash) computed from the decoded
    // pixel plane of each real P6 payload, then a hash-equality group
    // count (how many images share my fingerprint — the image-dedup
    // candidate signal). Decode + hash are per-row map work (payloads
    // never shuffle); the only exchange is the 16-byte (hi, lo) hash
    // key for the group-count window — at 100 TB the corpus shuffles
    // 24 bytes/image, and resized/re-encoded copies of a frame land
    // in the same bucket, which is the whole point of hashing means
    // instead of bytes. The oracle recomputes the pixel generator +
    // block-mean bit vector in SQL, so a hash match proves decode,
    // grid partition, and integer mean comparisons end to end.
    "mm09_image_ahash" -> ((s, d) => {
      import s.implicits._
      val wDup = Window.partitionBy("ahash_hi", "ahash_lo")
      mediaPayloads(s, d)
        .mapPartitions(_.map(imageAHash))
        .toDF()
        .withColumn("n_same_hash", count(lit(1)).over(wDup))
        .orderBy("doc_id")
    }),

    // mm13: IMAGE NEAR-DUP DETECTION (banded Hamming LSH over aHash) —
    // mm09 catches only EXACT perceptual-hash matches; this is the
    // production copy detector (the PDQ/PhotoDNA shape): match
    // originals against re-encoded copies whose hash differs in a few
    // bits. Each 64-bit aHash splits into 8 bands of 8 bits; a pair
    // becomes a candidate iff SOME band is equal (one equi-join on
    // (band_id, band_val)); candidates are verified by exact Hamming
    // distance ≤ 7. By pigeonhole, distance ≤ 7 over 8 bands forces
    // at least one equal band — band recall is EXACT for d ≤ 7, not
    // probabilistic (the LSH miss risk starts at d = 8). The variant
    // side here is each image's deterministic edited re-encode
    // ([[imageAHashEdited]]): ~77% of true pairs land within d ≤ 3
    // and 98% within d ≤ 7 on the fixture, so the detector's recall
    // is measurable (`is_true_pair`), and chance band collisions are
    // killed by the verify (random hashes sit at d ≈ 32).
    //
    // Scale: payloads decode per-row and never shuffle — only 24-byte
    // (id, hi, lo) rows enter the band explode (a bounded 8×), and
    // the band join shuffles on a 2-byte key; per-bucket candidate
    // lists are the standard LSH skew surface (a saturated band value
    // → salt or drop the bucket, dd03's rule). The verify is
    // integer xor/popcount on the pair rows — no re-join back to
    // payloads, since the hashes ride through the explode.
    "mm13_image_neardup" -> ((s, d) => {
      import s.implicits._
      val orig = mediaPayloads(s, d)
        .mapPartitions(_.map(imageAHash)).toDF()
        .select(col("doc_id"), col("ahash_hi").as("a_hi"),
          col("ahash_lo").as("a_lo"))
      val vari = mediaPayloads(s, d)
        .mapPartitions(_.map(imageAHashEdited)).toDF()
        .select(col("doc_id").as("re_id"), col("ahash_hi").as("b_hi"),
          col("ahash_lo").as("b_lo"))
      def banded(df: DataFrame, hi: String, lo: String): DataFrame = {
        val bandCols = (0 until 8).map { j =>
          val half = if (j < 4) lo else hi
          struct(lit(j).as("band_id"),
            (shiftright(col(half), 8 * (j % 4)) % 256).as("band_val"))
        }
        df.withColumn("b", explode(array(bandCols: _*)))
          .select(df.columns.map(col) :+ col("b.band_id") :+
            col("b.band_val"): _*)
      }
      banded(orig, "a_hi", "a_lo")
        .join(banded(vari, "b_hi", "b_lo"), Seq("band_id", "band_val"))
        .groupBy("doc_id", "re_id", "a_hi", "a_lo", "b_hi", "b_lo")
        .agg(count(lit(1)).as("n_bands"))
        .withColumn("hamming",
          expr("bit_count(a_hi ^ b_hi) + bit_count(a_lo ^ b_lo)")
            .cast("long"))
        .where(col("hamming") <= 7L)
        .select(col("doc_id"), col("re_id"), col("n_bands"),
          col("hamming"), (col("doc_id") === col("re_id"))
            .as("is_true_pair"))
        .orderBy("doc_id", "re_id")
    }),

    // mm14: AUDIO NEAR-DUP DETECTION (aligned frame-shingle overlap) —
    // mm13's copy-detection role for the audio modality, built the
    // way audio segment matchers actually work: per-frame content
    // keys from the decoded PCM form an INVERTED INDEX on
    // (frame_idx, key); a pair surfaces iff it shares at least one
    // aligned frame key (one equi-join — the dd05 shingle shape),
    // and the verdict is the aligned-overlap count n_match ≥ 12 of
    // 16. The re-encode perturbs every (doc_id+f)%7 frame (~14%), so
    // true pairs land at n_match 13–14 while unrelated docs share
    // essentially no aligned keys (the generator's frame keys are
    // doc-unique). An envelope-bit fingerprint (Haitsma–Kalker) was
    // evaluated and rejected for THIS fixture: the synthetic PCM's
    // envelope is a smooth ramp, so all docs collapse to one
    // envelope pattern — the shingle index is the basis that
    // discriminates here, and it scales the same way.
    //
    // Scale: PCM decodes per-row; only 16 (id, frame, 8-byte key)
    // rows per doc enter the index join; the shuffle key is
    // (frame_idx, key) and per-bucket lists are bounded by true
    // copies + rare collisions (the dd03 skew rule applies to a
    // saturated bucket). The overlap count is a pair-keyed aggregate
    // over join rows — no payload ever shuffles.
    "mm14_audio_neardup" -> ((s, d) => {
      import s.implicits._
      val orig = wavPayloads(s, d)
        .mapPartitions(_.flatMap(audioFrameKeys(_, edited = false)))
        .toDF()
      val vari = wavPayloads(s, d)
        .mapPartitions(_.flatMap(audioFrameKeys(_, edited = true)))
        .toDF()
        .select(col("doc_id").as("re_id"), col("frame_idx"), col("fkey"))
      orig.join(vari, Seq("frame_idx", "fkey"))
        .groupBy("doc_id", "re_id")
        .agg(count(lit(1)).as("n_match"))
        .where(col("n_match") >= 12L)
        .select(col("doc_id"), col("re_id"), col("n_match"),
          lit(16L).as("n_frames"),
          (col("doc_id") === col("re_id")).as("is_true_pair"))
        .orderBy("doc_id", "re_id")
    }),

    // mm11: CAPTION↔IMAGE ALIGNMENT — the CLIP-style joint-embedding
    // gate every multimodal curation pipeline runs between a caption
    // and its media: score = cosine(text-side vector, image-side
    // embedding), thresholded to an aligned/misaligned verdict. The
    // text side here is a deterministic signed hashed bag-of-words
    // projection of the caption into the embedding's 64 dims (a
    // text-encoder stand-in the oracle can recompute — a real CLIP
    // text tower would slot into the same column), the image side is
    // the embeddings table keyed by the same id. Cosine runs on the
    // em-family in-order folds (Funcs.dotProduct ≡ dotProductSql),
    // quantized to micro-units before the verdict so the gate
    // hash-matches across engines.
    //
    // Scale: the caption vector is per-row columnar math (zero
    // shuffle); the pair join is ONE id-keyed equi-join of two
    // corpus-sized tables — the shape you'd bucket or pre-pack
    // (mm07) in production so it co-locates; nothing else shuffles
    // before the presentation sort.
    "mm11_caption_alignment" -> ((s, d) =>
      alignmentScores(s, d).orderBy("doc_id")),

    // NOTE on the fixture: the synthetic embeddings carry no semantic
    // relationship to the captions, so measured recall sits at chance
    // (~k/N — Round9OpsSpec asserts the structural laws instead). The
    // operator's value is the harness: point it at a real joint space
    // and the same plan measures it.
    // mm12: CROSS-MODAL RETRIEVAL EVAL — recall@k of caption→image
    // retrieval, the metric that tells you whether mm11's joint space
    // is good enough to curate with (the CLIP-paper eval): for each
    // query caption, rank EVERY image embedding by cosine and ask
    // whether the true pair (vec_id == doc_id) landed in the top k.
    // The query set is a fixed-SIZE hash-ordered sample (dd05's rule)
    // so the brute-force pair scan is |queries|×N — LINEAR in the
    // corpus; each query's rank comes from counting strictly-better
    // pairs (cos desc, vec_id tie-break) against its own true score —
    // one aggregate, no global sort or window anywhere. Zero-vector
    // captions and queries without an embedding row are excluded from
    // the eval (both engines apply the same rule).
    "mm12_crossmodal_recall" -> ((s, d) => {
      import graft.functions.Funcs.dotProduct
      graft.functions.VecDot.register(s)
      // the caption projection runs over the QUERY SAMPLE only — the
      // id semi-join goes below the (expensive) tvec projection by
      // construction, since Catalyst won't reorder a join under a
      // computed project on its own
      val qIds = graft.operators.TextAnalysis
        .benchSample(documents(s, d), MmEvalN).select("doc_id")
      // per-vector norms precomputed ONCE (the dd06 lesson: 1 fold
      // per pair instead of 3); float-array tvec so the pair fold
      // runs the native vec_dot — counts are small integers, exact
      // in float, so the doubles are bit-identical to the composable
      // form the oracle mirrors
      val emb = embeddings(s, d)
        .select(col("vec_id"), col("embedding"),
          sqrt(dotProduct(col("embedding"), col("embedding"))).as("enorm"))
        .localCheckpoint() // small; read by the true-pair join AND pairs
      val qt = captionVecsOf(
          documents(s, d).join(broadcast(qIds), Seq("doc_id")))
        // materialization barrier on the ≤MmEvalN-row caption frame:
        // without it CollapseProject inlines the tds/tvec expression
        // into the tt filter + tvec_f + tnorm references below and
        // re-runs the per-token hashing ~130× (measured 99 s at
        // sf0.1; mm11 is protected by its join barrier instead)
        .localCheckpoint()
        .filter(dotProduct(col("tvec"), col("tvec")) > 0.0)
        .select(col("doc_id"),
          transform(col("tvec"), x => x.cast("float")).as("tvec_f"),
          sqrt(dotProduct(col("tvec"), col("tvec"))).as("tnorm"))
        .join(emb.select(col("vec_id").as("doc_id"),
          col("embedding").as("true_emb"), col("enorm").as("true_enorm")),
          Seq("doc_id"))
        .select(col("doc_id"), col("tvec_f"), col("tnorm"),
          (call_function("vec_dot", col("tvec_f"), col("true_emb")) /
            (col("tnorm") * col("true_enorm"))).as("cos_true"))
        .localCheckpoint() // ≤MmEvalN rows; feeds pair scan + ranks
      val better = emb.crossJoin(broadcast(qt))
        .withColumn("cos",
          call_function("vec_dot", col("tvec_f"), col("embedding")) /
            (col("tnorm") * col("enorm")))
        .filter(col("cos") > col("cos_true") ||
          (col("cos") === col("cos_true") && col("vec_id") < col("doc_id")))
        .groupBy("doc_id").agg(count(lit(1)).as("n_better"))
      val ranks = qt.select("doc_id")
        .join(better, Seq("doc_id"), "left")
        .select(col("doc_id"),
          (coalesce(col("n_better"), lit(0L)) + 1).as("rnk"))
      ranks.select(col("rnk"), explode(typedlit(Seq(1, 5, 10))).as("k"))
        .groupBy("k")
        .agg(count(lit(1)).as("n_queries"),
          sum(when(col("rnk") <= col("k"), 1L).otherwise(0L)).as("n_hit"))
        .withColumn("recall_u6",
          floor(col("n_hit") * lit(1000000.0) / col("n_queries") + 0.5)
            .cast("long"))
        .orderBy("k")
    })
  )

  /** mm11/mm12's caption projection (doc_id, tvec): the signed hashed
    * bag-of-words of each caption in the embedding's [[AlignDim]]
    * dims — per-row columnar math, zero shuffle. The per-token
    * (dim, sign) hashes are materialized ONCE in their own projection
    * (the em02 lesson: Catalyst does not CSE non-cheap aliases across
    * collapsed projects — inlining the md5s into the 2×[[AlignDim]]
    * filter lambdas re-hashed every token 128×, which measured 23 s
    * instead of ~2 s at sf0.1); the per-dim counting passes then run
    * over a tiny int/bool struct array. */
  private[graft] def captionVecsOf(docs: DataFrame): DataFrame = {
    import graft.functions.Funcs.{md5Long, tokens}
    docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), transform(col("toks"), t => struct(
        (md5Long(t, 7) % AlignDim).as("dd"),
        (md5Long(concat(lit("s:"), t), 7) % 2 === 0).as("p"))).as("tds"))
      .select(col("doc_id"),
        transform(sequence(lit(0), lit(AlignDim - 1)), dd =>
          (size(filter(col("tds"), x => x("dd") === dd && x("p"))) -
            size(filter(col("tds"), x => x("dd") === dd && !x("p"))))
            .cast("double")).as("tvec"))
  }

  /** mm11's scoring frame (doc_id, align_u6, aligned) — exposed so
    * the curation pipeline's opt-in alignment gate filters on the
    * exact oracle-checked scores. Only id-covered pairs score: a doc
    * without an embedding row is absent here (the pipeline's partial-
    * coverage contract — it passes the gate rather than being
    * invisibly dropped). */
  private[graft] def alignmentScores(s: SparkSession, d: String): DataFrame = {
    import graft.functions.Funcs.dotProduct
    captionVecsOf(documents(s, d))
      .join(embeddings(s, d)
        .select(col("vec_id").as("doc_id"), col("embedding")), Seq("doc_id"))
      .select(col("doc_id"),
        dotProduct(col("tvec"), col("tvec")).as("tt"),
        (dotProduct(col("tvec"), col("embedding")) /
          (sqrt(dotProduct(col("tvec"), col("tvec"))) *
            sqrt(dotProduct(col("embedding"), col("embedding")))))
          .as("cos"))
      // all-stopword/empty captions have a zero text vector — they
      // score 0 (misaligned), never NaN
      .select(col("doc_id"),
        when(col("tt") === 0.0, lit(0L))
          .otherwise(floor(col("cos") * 1e6 + 0.5).cast("long"))
          .as("align_u6"))
      .withColumn("aligned", col("align_u6") >= AlignThreshU6)
  }

  /** mm11 text-projection width (matches the embedding table's 64
    * dims) and the alignment gate threshold in micro-units (0.05 —
    * for the synthetic corpus this splits the cosine distribution
    * rather than rubber-stamping either verdict). */
  private[graft] val AlignDim      = 64
  private[graft] val AlignThreshU6 = 50000L

  /** mm12 fixed query-set size (dd05's fixed-SIZE sampling rule: the
    * eval's pair work stays |queries|×N at any corpus size). */
  private[graft] val MmEvalN = 64

  /** Shared mm11/mm12 oracle CTE body for the caption projection
    * (`tv(doc_id, tvec)`) — one fragment so the two queries' text
    * towers can never drift. */
  private def captionTvSqlCte: String = {
    val toksSql = graft.operators.TextAnalysis.toksSql
    def dimSql(t: String) =
      s"('0x' || substr(md5($t), 1, 7))::BIGINT % $AlignDim"
    def posSql(t: String) =
      s"('0x' || substr(md5('s:' || $t), 1, 7))::BIGINT % 2 = 0"
    s"""tv AS (
       |  SELECT doc_id, list_transform(generate_series(0, ${AlignDim - 1}),
       |    dd -> CAST(
       |      len(list_filter(toks, t ->
       |        ${dimSql("t")} = dd AND ${posSql("t")})) -
       |      len(list_filter(toks, t ->
       |        ${dimSql("t")} = dd AND NOT (${posSql("t")})))
       |      AS DOUBLE)) AS tvec
       |  FROM (SELECT doc_id, $toksSql AS toks FROM documents)
       |)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "mm11_caption_alignment" -> {
      val dot = graft.functions.Funcs.dotProductSql _
      s"""WITH $captionTvSqlCte, j AS (
         |  SELECT t.doc_id, t.tvec, e.embedding
         |  FROM tv t JOIN embeddings e ON e.vec_id = t.doc_id
         |), sc AS (
         |  SELECT doc_id,
         |    ${dot("tvec", "tvec")} AS tt,
         |    ${dot("tvec", "embedding")} /
         |      (sqrt(${dot("tvec", "tvec")}) *
         |       sqrt(${dot("embedding", "embedding")})) AS cos
         |  FROM j
         |), u AS (
         |  SELECT doc_id, CASE WHEN tt = 0 THEN CAST(0 AS BIGINT)
         |    ELSE CAST(floor(cos * 1e6 + 0.5) AS BIGINT) END AS align_u6
         |  FROM sc
         |)
         |SELECT doc_id, align_u6, align_u6 >= $AlignThreshU6 AS aligned
         |FROM u ORDER BY doc_id""".stripMargin
    },

    "mm12_crossmodal_recall" -> {
      val dot = graft.functions.Funcs.dotProductSql _
      def cosSql(a: String, b: String) =
        s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"
      s"""WITH $captionTvSqlCte, q AS (
         |  SELECT t.doc_id, t.tvec
         |  FROM tv t
         |  JOIN (SELECT doc_id FROM documents
         |        ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         |        LIMIT $MmEvalN) s USING (doc_id)
         |  WHERE ${dot("t.tvec", "t.tvec")} > 0
         |), qt AS (
         |  SELECT q.doc_id, q.tvec,
         |    ${cosSql("q.tvec", "e.embedding")} AS cos_true
         |  FROM q JOIN embeddings e ON e.vec_id = q.doc_id
         |), pairs AS (
         |  SELECT t.doc_id, e.vec_id, t.cos_true,
         |    ${cosSql("t.tvec", "e.embedding")} AS cos
         |  FROM qt t CROSS JOIN embeddings e
         |), better AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_better
         |  FROM pairs
         |  WHERE cos > cos_true OR (cos = cos_true AND vec_id < doc_id)
         |  GROUP BY doc_id
         |), ranks AS (
         |  SELECT qt.doc_id, 1 + coalesce(b.n_better, 0) AS rnk
         |  FROM qt LEFT JOIN better b USING (doc_id)
         |)
         |SELECT k, CAST(count(*) AS BIGINT) AS n_queries,
         |  CAST(sum(CASE WHEN rnk <= k THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_hit,
         |  CAST(floor(CAST(sum(CASE WHEN rnk <= k THEN 1 ELSE 0 END)
         |      AS BIGINT) * 1000000.0 / count(*) + 0.5) AS BIGINT)
         |    AS recall_u6
         |FROM ranks CROSS JOIN (SELECT unnest([1, 5, 10]) AS k) ks
         |GROUP BY k ORDER BY k""".stripMargin
    },

    "mm07_modality_pack" -> {
      val toksSql = graft.operators.TextAnalysis.toksSql
      s"""WITH t AS (
         |  SELECT doc_id,
         |    ('0x' || substr(md5('mmpack:' || CAST(doc_id AS VARCHAR)),
         |      1, 15))::BIGINT AS h,
         |    CAST(len($toksSql) AS BIGINT) AS n_tokens,
         |    CAST(ceil(CAST(octet_length(text::BLOB) AS DOUBLE) /
         |      $MmPatchBytes) AS BIGINT) AS n_patches
         |  FROM documents
         |), items AS (
         |  SELECT doc_id, h, CAST(h % $MmShards AS BIGINT) AS shard,
         |    'image' AS modality, 0 AS ord, n_patches AS cost
         |  FROM t WHERE n_patches > 0
         |  UNION ALL
         |  SELECT doc_id, h, CAST(h % $MmShards AS BIGINT) AS shard,
         |    'text' AS modality, 1 AS ord, n_tokens AS cost
         |  FROM t WHERE n_tokens > 0
         |), p AS (
         |  SELECT shard, doc_id, modality, ord, cost,
         |    CAST(COALESCE(sum(cost) OVER (
         |      PARTITION BY shard ORDER BY h, doc_id, ord
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS start_offset
         |  FROM items)
         |SELECT shard, doc_id, modality, cost, start_offset,
         |  CAST(start_offset // $MmSeqBudget AS BIGINT) AS seq_first,
         |  CAST((start_offset + cost - 1) // $MmSeqBudget AS BIGINT)
         |    AS seq_last
         |FROM p ORDER BY shard, start_offset, ord""".stripMargin
    },

    // recomputes the WAV PCM generator over overlapping window ranges
    // (rate/channels/frames from wavGeometry, sample from sampleValue)
    "mm05_chunk_overlap" ->
      """WITH geom AS (
        |  SELECT doc_id,
        |    1 + (doc_id % 2) AS n_channels,
        |    16 + (length(text) % 101) AS total_frames
        |  FROM documents
        |), chunks AS (
        |  SELECT doc_id, n_channels, total_frames, c.c AS chunk_idx
        |  FROM geom,
        |    LATERAL unnest(generate_series(0,
        |      (total_frames + 31) // 32 - 1)) AS c(c)
        |)
        |SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
        |  CAST(least(total_frames - chunk_idx * 32, 48) AS INT)
        |    AS n_frames,
        |  list_reduce(list_prepend(0::BIGINT,
        |    list_transform(generate_series(0,
        |      least(total_frames - chunk_idx * 32, 48) * n_channels - 1),
        |      k -> ((doc_id * 37
        |             + (chunk_idx * 32 + k // n_channels) * 11
        |             + (k % n_channels) * 5) % 65536) - 32768)),
        |    (a, b) -> a + b) AS checksum
        |FROM chunks
        |ORDER BY doc_id, chunk_idx""".stripMargin,

    // recomputes the video-container generator: nf = 1 + id%7, frame
    // geometry w = 3 + (cp+f)%13 / h = 2 + (id+f)%5, pixel i of frame
    // f = (id*31 + f*17 + i*7) % 256 — see videoDims/videoPixel
    "mm03_frame_sample" ->
      """WITH geom AS (
        |  SELECT doc_id, length(text) AS cp, 1 + (doc_id % 7) AS nf
        |  FROM documents
        |), frames AS (
        |  SELECT doc_id, f.f AS frame_idx,
        |    3 + ((cp + f.f) % 13) AS width,
        |    2 + ((doc_id + f.f) % 5) AS height
        |  FROM geom,
        |    LATERAL unnest(generate_series(0, nf - 1)) AS f(f)
        |  WHERE f.f % 3 = 0
        |)
        |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
        |  CAST(width AS INT) AS width, CAST(height AS INT) AS height,
        |  list_reduce(list_prepend(0::BIGINT,
        |    list_transform(generate_series(0, 3 * width * height - 1),
        |      i -> (doc_id * 31 + frame_idx * 17 + i * 7) % 256)),
        |    (a, b) -> a + b) AS checksum
        |FROM frames
        |ORDER BY doc_id, frame_idx""".stripMargin,

    "mm01_binary_meta" ->
      """SELECT doc_id, octet_length(text::BLOB) AS n_bytes,
        |  sha256(text) AS sha256
        |FROM documents ORDER BY doc_id""".stripMargin,

    // the mm02/mm04 oracles recompute the pixel GENERATOR (not the
    // codec): geometry w = 4 + cp_len % 29, h = 3 + doc_id % 17,
    // pixel byte i = (doc_id*31 + i*7) % 256 — see pixelByte/imgDims
    "mm04_resize" ->
      """WITH dims AS (
        |  SELECT doc_id,
        |    4 + (length(text) % 29) AS w,
        |    3 + (doc_id % 17) AS h
        |  FROM documents
        |), halved AS (
        |  SELECT doc_id, w, h,
        |    (w + 1) // 2 AS w2, (h + 1) // 2 AS h2
        |  FROM dims
        |)
        |SELECT doc_id, w2 AS out_width, h2 AS out_height,
        |  list_reduce(list_prepend(0::BIGINT,
        |    list_transform(generate_series(0, 3 * w2 * h2 - 1),
        |      k -> (doc_id * 31 +
        |            ((2 * (k // (3 * w2)) * w +
        |              2 * ((k % (3 * w2)) // 3)) * 3 + (k % 3)) * 7)
        |           % 256)),
        |    (a, b) -> a + b) AS checksum
        |FROM halved ORDER BY doc_id""".stripMargin,

    // the mm06 oracle recomputes the PCM GENERATOR (not the codec):
    // rate = 8000 + 4000*(id%3), channels = 1 + id%2, frames =
    // 16 + len%101, sample(i,c) = ((id*37 + i*11 + c*5) % 65536) -
    // 32768 — see sampleValue/wavGeometry
    "mm08_audio_energy" ->
      """WITH geom AS (
        |  SELECT doc_id,
        |    1 + (doc_id % 2) AS n_channels,
        |    16 + (length(text) % 101) AS total_frames
        |  FROM documents
        |), wins AS (
        |  SELECT doc_id, n_channels, total_frames, w.w AS window_idx
        |  FROM geom,
        |    LATERAL unnest(generate_series(0,
        |      (total_frames + 31) // 32 - 1)) AS w(w)
        |)
        |SELECT doc_id, CAST(window_idx AS INT) AS window_idx,
        |  CAST(least(total_frames - window_idx * 32, 32) * n_channels
        |    AS INT) AS n_samples,
        |  list_reduce(list_prepend(0::BIGINT,
        |    list_transform(generate_series(0,
        |      least(total_frames - window_idx * 32, 32) * n_channels - 1),
        |      k -> (((doc_id * 37
        |              + (window_idx * 32 + k // n_channels) * 11
        |              + (k % n_channels) * 5) % 65536) - 32768)
        |           * (((doc_id * 37
        |              + (window_idx * 32 + k // n_channels) * 11
        |              + (k % n_channels) * 5) % 65536) - 32768))),
        |    (a, b) -> a + b) AS energy,
        |  list_reduce(list_prepend(0::BIGINT,
        |    list_transform(generate_series(0,
        |      least(total_frames - window_idx * 32, 32) * n_channels - 1),
        |      k -> (((doc_id * 37
        |              + (window_idx * 32 + k // n_channels) * 11
        |              + (k % n_channels) * 5) % 65536) - 32768)
        |           * (((doc_id * 37
        |              + (window_idx * 32 + k // n_channels) * 11
        |              + (k % n_channels) * 5) % 65536) - 32768))),
        |    (a, b) -> a + b) * 3
        |    > least(total_frames - window_idx * 32, 32) * n_channels
        |      * 32768 * 32768 AS is_voiced
        |FROM wins
        |ORDER BY doc_id, window_idx""".stripMargin,

    // mm17: the PCM generator recomputed whole-file (not windowed) —
    // sum and sum-of-squares over every (frame, channel) sample.
    "mm17_wav_jdk_decode" ->
      """WITH geom AS (
        |  SELECT doc_id,
        |    8000 + 4000 * (doc_id % 3) AS sample_rate,
        |    1 + (doc_id % 2) AS n_channels,
        |    16 + (length(text) % 101) AS total_frames
        |  FROM documents
        |), samples AS (
        |  SELECT doc_id, sample_rate, n_channels, total_frames,
        |    ((doc_id * 37 + (k.k // n_channels) * 11
        |      + (k.k % n_channels) * 5) % 65536) - 32768 AS v
        |  FROM geom,
        |    LATERAL unnest(generate_series(0,
        |      total_frames * n_channels - 1)) AS k(k)
        |)
        |SELECT doc_id, CAST(sample_rate AS INT) AS sample_rate,
        |  CAST(n_channels AS INT) AS n_channels,
        |  CAST(total_frames AS BIGINT) AS n_frames,
        |  CAST(sum(v) AS BIGINT) AS sum_samples,
        |  CAST(sum(v * v) AS BIGINT) AS energy
        |FROM samples
        |GROUP BY 1, 2, 3, 4
        |ORDER BY doc_id""".stripMargin,

    "mm06_wav_frames" ->
      """WITH geom AS (
        |  SELECT doc_id,
        |    8000 + 4000 * (doc_id % 3) AS sample_rate,
        |    1 + (doc_id % 2) AS n_channels,
        |    16 + (length(text) % 101) AS total_frames
        |  FROM documents
        |), wins AS (
        |  SELECT doc_id, sample_rate, n_channels, total_frames,
        |    w.w AS window_idx
        |  FROM geom,
        |    LATERAL unnest(generate_series(0,
        |      (total_frames + 31) // 32 - 1)) AS w(w)
        |  WHERE w.w % 2 = 0
        |)
        |SELECT doc_id, CAST(window_idx AS INT) AS window_idx,
        |  CAST(sample_rate AS INT) AS sample_rate,
        |  CAST(n_channels AS INT) AS n_channels,
        |  CAST(least(total_frames - window_idx * 32, 32) AS INT)
        |    AS n_frames,
        |  list_reduce(list_prepend(0::BIGINT,
        |    list_transform(generate_series(0,
        |      least(total_frames - window_idx * 32, 32) * n_channels - 1),
        |      k -> ((doc_id * 37
        |             + (window_idx * 32 + k // n_channels) * 11
        |             + (k % n_channels) * 5) % 65536) - 32768)),
        |    (a, b) -> a + b) AS checksum,
        |  (total_frames * 1000000) // sample_rate AS duration_us
        |FROM wins
        |ORDER BY doc_id, window_idx""".stripMargin,

    // the video frame generator (videoDims/videoPixel) recomputed per
    // frame, the cut rule as a lag window over (doc, frame)
    "mm10_shot_boundaries" ->
      """WITH geom AS (
        |  SELECT doc_id, length(text) AS cp, 1 + (doc_id % 7) AS nf
        |  FROM documents
        |), frames AS (
        |  SELECT doc_id, f.f AS frame_idx,
        |    3 + ((cp + f.f) % 13) AS width,
        |    2 + ((doc_id + f.f) % 5) AS height
        |  FROM geom,
        |    LATERAL unnest(generate_series(0, nf - 1)) AS f(f)
        |), sums AS (
        |  SELECT doc_id, frame_idx,
        |    list_reduce(list_prepend(0::BIGINT,
        |      list_transform(generate_series(0, 3 * width * height - 1),
        |        i -> (doc_id * 31 + frame_idx * 17 + i * 7) % 256)),
        |      (a, b) -> a + b) AS brightness_sum,
        |    CAST(3 * width * height AS BIGINT) AS n_bytes
        |  FROM frames
        |), lagged AS (
        |  SELECT doc_id, frame_idx, brightness_sum, n_bytes,
        |    lag(brightness_sum) OVER w AS prev_sum,
        |    lag(n_bytes) OVER w AS prev_n
        |  FROM sums
        |  WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)
        |)
        |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
        |  brightness_sum, n_bytes,
        |  CASE WHEN prev_sum IS NULL THEN FALSE
        |       ELSE abs(brightness_sum * prev_n
        |           - prev_sum * n_bytes) * 20 > prev_sum * n_bytes
        |  END AS is_boundary
        |FROM lagged
        |ORDER BY doc_id, frame_idx""".stripMargin,

    // mm15: mm10's generator + cut-rule CTEs, then the running-count
    // shot assignment and the integer-milli argmax election.
    "mm15_keyframes" ->
      """WITH geom AS (
        |  SELECT doc_id, length(text) AS cp, 1 + (doc_id % 7) AS nf
        |  FROM documents
        |), frames AS (
        |  SELECT doc_id, f.f AS frame_idx,
        |    3 + ((cp + f.f) % 13) AS width,
        |    2 + ((doc_id + f.f) % 5) AS height
        |  FROM geom,
        |    LATERAL unnest(generate_series(0, nf - 1)) AS f(f)
        |), sums AS (
        |  SELECT doc_id, frame_idx,
        |    list_reduce(list_prepend(0::BIGINT,
        |      list_transform(generate_series(0, 3 * width * height - 1),
        |        i -> (doc_id * 31 + frame_idx * 17 + i * 7) % 256)),
        |      (a, b) -> a + b) AS brightness_sum,
        |    CAST(3 * width * height AS BIGINT) AS n_bytes
        |  FROM frames
        |), lagged AS (
        |  SELECT doc_id, frame_idx, brightness_sum, n_bytes,
        |    lag(brightness_sum) OVER w AS prev_sum,
        |    lag(n_bytes) OVER w AS prev_n
        |  FROM sums
        |  WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)
        |), cutf AS (
        |  SELECT doc_id, frame_idx, brightness_sum, n_bytes,
        |    CASE WHEN prev_sum IS NULL THEN FALSE
        |         ELSE abs(brightness_sum * prev_n
        |             - prev_sum * n_bytes) * 20 > prev_sum * n_bytes
        |    END AS is_boundary
        |  FROM lagged
        |), shots AS (
        |  SELECT doc_id, frame_idx,
        |    CAST(sum(CASE WHEN is_boundary THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY frame_idx
        |        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS shot_idx,
        |    (brightness_sum * 1000) // n_bytes AS mean_milli
        |  FROM cutf
        |), rk AS (
        |  SELECT doc_id, frame_idx, shot_idx, mean_milli,
        |    row_number() OVER (PARTITION BY doc_id, shot_idx
        |      ORDER BY mean_milli DESC, frame_idx) AS rn
        |  FROM shots
        |)
        |SELECT doc_id, shot_idx,
        |  CAST(min(frame_idx) AS INT) AS start_frame,
        |  CAST(max(frame_idx) AS INT) AS end_frame,
        |  CAST(count(*) AS BIGINT) AS n_frames,
        |  CAST(max(CASE WHEN rn = 1 THEN frame_idx END) AS INT)
        |    AS key_frame_idx,
        |  CAST(max(CASE WHEN rn = 1 THEN mean_milli END) AS BIGINT)
        |    AS key_mean_milli
        |FROM rk GROUP BY doc_id, shot_idx
        |ORDER BY doc_id, shot_idx""".stripMargin,

    // recomputes the pixel generator, the ⌊8x/w⌋ grid assignment and
    // the integer cross-multiplied block-mean bits — in lockstep with
    // [[imageAHash]]
    "mm09_image_ahash" ->
      """WITH dims AS (
        |  SELECT doc_id,
        |    4 + (length(text) % 29) AS w,
        |    3 + (doc_id % 17) AS h
        |  FROM documents
        |), px AS (
        |  SELECT doc_id, w, h, unnest(generate_series(0, w * h - 1)) AS p
        |  FROM dims
        |), cell AS (
        |  SELECT doc_id, w, h,
        |    (((p // w) * 8) // h) * 8 + ((p % w) * 8) // w AS c,
        |    ((doc_id * 31 + (3 * p) * 7) % 256)
        |      + ((doc_id * 31 + (3 * p + 1) * 7) % 256)
        |      + ((doc_id * 31 + (3 * p + 2) * 7) % 256) AS s
        |  FROM px
        |), agg AS (
        |  SELECT doc_id, w, h, c,
        |    CAST(sum(s) AS BIGINT) AS cs, CAST(count(*) AS BIGINT) AS cc
        |  FROM cell GROUP BY doc_id, w, h, c
        |), tot AS (
        |  SELECT doc_id, CAST(sum(cs) AS BIGINT) AS ts
        |  FROM agg GROUP BY doc_id
        |), bits AS (
        |  SELECT a.doc_id, a.w, a.h,
        |    CASE WHEN a.c >= 32 AND a.cs * a.w * a.h > t.ts * a.cc
        |      THEN (1::BIGINT << (a.c - 32)) ELSE 0::BIGINT END AS hi_bit,
        |    CASE WHEN a.c < 32 AND a.cs * a.w * a.h > t.ts * a.cc
        |      THEN (1::BIGINT << a.c) ELSE 0::BIGINT END AS lo_bit
        |  FROM agg a JOIN tot t USING (doc_id)
        |), hashes AS (
        |  SELECT doc_id, w AS width, h AS height,
        |    CAST(sum(hi_bit) AS BIGINT) AS ahash_hi,
        |    CAST(sum(lo_bit) AS BIGINT) AS ahash_lo
        |  FROM bits GROUP BY doc_id, w, h
        |)
        |SELECT doc_id, width, height, ahash_hi, ahash_lo,
        |  CAST(count(*) OVER (PARTITION BY ahash_hi, ahash_lo) AS BIGINT)
        |    AS n_same_hash
        |FROM hashes ORDER BY doc_id""".stripMargin,

    // mm13: mm09's hash CTEs computed twice from the pixel generator —
    // original bytes and the +101-mod-256 edited variant — then the
    // 8×8-bit band explode, candidate equi-join, and exact Hamming
    // verify. The hash match proves decode, edit model, banding and
    // popcount math end to end in both engines.
    "mm13_image_neardup" ->
      """WITH dims AS (
        |  SELECT doc_id,
        |    4 + (length(text) % 29) AS w,
        |    3 + (doc_id % 17) AS h
        |  FROM documents
        |), px AS (
        |  SELECT doc_id, w, h, unnest(generate_series(0, w * h - 1)) AS p
        |  FROM dims
        |), cell AS (
        |  SELECT doc_id, w, h,
        |    (((p // w) * 8) // h) * 8 + ((p % w) * 8) // w AS c,
        |    ((doc_id * 31 + (3 * p) * 7) % 256)
        |      + ((doc_id * 31 + (3 * p + 1) * 7) % 256)
        |      + ((doc_id * 31 + (3 * p + 2) * 7) % 256) AS s,
        |    (((doc_id * 31 + (3 * p) * 7) % 256
        |       + CASE WHEN p % 37 = 0 THEN 101 ELSE 0 END) % 256)
        |      + (((doc_id * 31 + (3 * p + 1) * 7) % 256
        |       + CASE WHEN p % 37 = 0 THEN 101 ELSE 0 END) % 256)
        |      + (((doc_id * 31 + (3 * p + 2) * 7) % 256
        |       + CASE WHEN p % 37 = 0 THEN 101 ELSE 0 END) % 256) AS s2
        |  FROM px
        |), agg AS (
        |  SELECT doc_id, w, h, c,
        |    CAST(sum(s) AS BIGINT) AS cs, CAST(sum(s2) AS BIGINT) AS cs2,
        |    CAST(count(*) AS BIGINT) AS cc
        |  FROM cell GROUP BY doc_id, w, h, c
        |), tot AS (
        |  SELECT doc_id, CAST(sum(cs) AS BIGINT) AS ts,
        |    CAST(sum(cs2) AS BIGINT) AS ts2
        |  FROM agg GROUP BY doc_id
        |), hashes AS (
        |  SELECT a.doc_id,
        |    CAST(sum(CASE WHEN a.c >= 32 AND a.cs * a.w * a.h > t.ts * a.cc
        |      THEN (1::BIGINT << (a.c - 32)) ELSE 0::BIGINT END)
        |      AS BIGINT) AS a_hi,
        |    CAST(sum(CASE WHEN a.c < 32 AND a.cs * a.w * a.h > t.ts * a.cc
        |      THEN (1::BIGINT << a.c) ELSE 0::BIGINT END)
        |      AS BIGINT) AS a_lo,
        |    CAST(sum(CASE WHEN a.c >= 32
        |        AND a.cs2 * a.w * a.h > t.ts2 * a.cc
        |      THEN (1::BIGINT << (a.c - 32)) ELSE 0::BIGINT END)
        |      AS BIGINT) AS b_hi,
        |    CAST(sum(CASE WHEN a.c < 32 AND a.cs2 * a.w * a.h > t.ts2 * a.cc
        |      THEN (1::BIGINT << a.c) ELSE 0::BIGINT END)
        |      AS BIGINT) AS b_lo
        |  FROM agg a JOIN tot t USING (doc_id)
        |  GROUP BY a.doc_id
        |), bandsA AS (
        |  SELECT doc_id, a_hi, a_lo, j AS band_id,
        |    CASE WHEN j < 4 THEN (a_lo >> (8 * j)) % 256
        |         ELSE (a_hi >> (8 * (j - 4))) % 256 END AS band_val
        |  FROM hashes, (SELECT unnest(generate_series(0, 7)) AS j)
        |), bandsB AS (
        |  SELECT doc_id AS re_id, b_hi, b_lo, j AS band_id,
        |    CASE WHEN j < 4 THEN (b_lo >> (8 * j)) % 256
        |         ELSE (b_hi >> (8 * (j - 4))) % 256 END AS band_val
        |  FROM hashes, (SELECT unnest(generate_series(0, 7)) AS j)
        |), cand AS (
        |  SELECT a.doc_id, v.re_id, a.a_hi, a.a_lo, v.b_hi, v.b_lo,
        |    CAST(count(*) AS BIGINT) AS n_bands
        |  FROM bandsA a JOIN bandsB v
        |    ON a.band_id = v.band_id AND a.band_val = v.band_val
        |  GROUP BY a.doc_id, v.re_id, a.a_hi, a.a_lo, v.b_hi, v.b_lo
        |)
        |SELECT doc_id, re_id, n_bands,
        |  CAST(bit_count(xor(a_hi, b_hi)) + bit_count(xor(a_lo, b_lo))
        |    AS BIGINT) AS hamming,
        |  doc_id = re_id AS is_true_pair
        |FROM cand
        |WHERE bit_count(xor(a_hi, b_hi)) + bit_count(xor(a_lo, b_lo)) <= 7
        |ORDER BY doc_id, re_id""".stripMargin,

    // mm14: frame keys recomputed from the PCM sample GENERATOR
    // (the mm06/mm08 oracle discipline), original and edited, then
    // the aligned inverted-index join and the overlap threshold.
    // 33767 = 32768 + 999 (the wrap offset).
    "mm14_audio_neardup" ->
      """WITH dims AS (
        |  SELECT doc_id, 1 + doc_id % 2 AS ch FROM documents
        |), fr AS (
        |  SELECT doc_id, ch, unnest(generate_series(0, 15)) AS f
        |  FROM dims
        |), sm AS (
        |  SELECT doc_id, f, unnest(generate_series(0, ch - 1)) AS c
        |  FROM fr
        |), sv AS (
        |  SELECT doc_id, f, c,
        |    ((doc_id * 37 + f * 11 + c * 5) % 65536) - 32768 AS s
        |  FROM sm
        |), keys AS (
        |  SELECT doc_id, f,
        |    CAST(sum(s * (c + 1)) AS BIGINT) AS a_key,
        |    CAST(sum(CASE WHEN (doc_id + f) % 7 = 0
        |      THEN (((s + 33767 + f * 31) % 65536) - 32768) * (c + 1)
        |      ELSE s * (c + 1) END) AS BIGINT) AS b_key
        |  FROM sv GROUP BY doc_id, f
        |), hits AS (
        |  SELECT a.doc_id, v.doc_id AS re_id,
        |    CAST(count(*) AS BIGINT) AS n_match
        |  FROM keys a JOIN keys v
        |    ON a.f = v.f AND a.a_key = v.b_key
        |  GROUP BY a.doc_id, v.doc_id
        |)
        |SELECT doc_id, re_id, n_match, CAST(16 AS BIGINT) AS n_frames,
        |  doc_id = re_id AS is_true_pair
        |FROM hits
        |WHERE n_match >= 12
        |ORDER BY doc_id, re_id""".stripMargin,

    "mm02_decode_features" ->
      """WITH dims AS (
        |  SELECT doc_id,
        |    4 + (length(text) % 29) AS width,
        |    3 + (doc_id % 17) AS height
        |  FROM documents
        |)
        |SELECT doc_id, width, height, 255 AS max_val,
        |  width * height AS n_pixels,
        |  list_reduce(list_prepend(0::BIGINT,
        |    list_transform(generate_series(0, 3 * width * height - 1),
        |      i -> (doc_id * 31 + i * 7) % 256)),
        |    (a, b) -> a + b) AS checksum
        |FROM dims ORDER BY doc_id""".stripMargin,

    // mm16: identical generator arithmetic to mm02 (PNG is lossless,
    // so the decoded plane must equal the generator exactly); no
    // max_val column — PNG carries bit depth, not a PPM maxval.
    "mm16_png_decode" ->
      """WITH dims AS (
        |  SELECT doc_id,
        |    4 + (length(text) % 29) AS width,
        |    3 + (doc_id % 17) AS height
        |  FROM documents
        |)
        |SELECT doc_id, width, height,
        |  width * height AS n_pixels,
        |  list_reduce(list_prepend(0::BIGINT,
        |    list_transform(generate_series(0, 3 * width * height - 1),
        |      i -> (doc_id * 31 + i * 7) % 256)),
        |    (a, b) -> a + b) AS checksum
        |FROM dims ORDER BY doc_id""".stripMargin,

    // mm18: geometry from the generator arithmetic; the tolerance and
    // stability verdicts are the CONTRACT — the oracle asserts they
    // hold on every row by emitting TRUE (a lossy decode can't be
    // recomputed engine-side; the law, not the pixels, is what's
    // portable).
    "mm18_jpeg_decode" ->
      """WITH dims AS (
        |  SELECT doc_id,
        |    4 + (length(text) % 29) AS width,
        |    3 + (doc_id % 17) AS height
        |  FROM documents
        |)
        |SELECT doc_id, width, height,
        |  width * height AS n_pixels,
        |  TRUE AS within_tolerance,
        |  TRUE AS decode_stable
        |FROM dims ORDER BY doc_id""".stripMargin
  )
}
