package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}

/** Multimodal column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata extracted via typed mapPartitions (the
  * Scala analog of a batched mapInPandas decode).
  *
  * Codec split: payloads the JDK ships an ImageIO reader for (PNG, JPEG,
  * GIF, BMP — sniffed by magic bytes) are REALLY decoded ([[decode]] reads
  * dimensions/format from the header via the reader, no full raster
  * materialization — the right executor-side cost for a metadata pass);
  * everything else (exotic codecs, audio, video, and the synthetic HTML
  * corpus the oracle covers) falls through to the clearly-marked
  * deterministic stub. The Spark-side plumbing — binary schema, partition-
  * preserving batch iteration, metadata struct output — is identical on
  * both paths; swapping the stub for a JNI decoder changes no plan shape.
  */
object Media {

  final case class MediaIn(url: String, html: Array[Byte])
  final case class MediaMeta(url: String, n_bytes: Long, width: Int, height: Int, format: String)

  /** STUB decode: dimensions/format are pure functions of payload size. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, String) = {
    val n = bytes.length
    (64 + n % 101, 64 + n % 67, if (n % 2 == 0) "png" else "jpeg")
  }

  /** Real decode via javax.imageio for any format the JDK recognizes:
    * dimensions come from the image HEADER (reader.getWidth/getHeight —
    * ImageIO readers parse it lazily, the raster is never decoded), format
    * from the matched reader. Unrecognized payloads → [[decodeStub]], and
    * so do recognized-but-corrupt ones (a truncated PNG, or a text blob
    * whose first bytes happen to sniff as BMP, must degrade per-row — a
    * reader exception may NOT abort the whole partition's task). */
  def decode(bytes: Array[Byte]): (Int, Int, String) =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) decodeStub(bytes)
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            (r.getWidth(0), r.getHeight(0),
              r.getFormatName.toLowerCase(java.util.Locale.ROOT))
          } finally r.dispose()
        }
      } finally if (iis != null) iis.close()
    } catch {
      case scala.util.control.NonFatal(_) => decodeStub(bytes)
    }

  final case class AvMeta(url: String, container: String, duration_ms: Long,
                          sample_rate: Int, tracks: Int)

  /** Audio/video HEADER metadata for the two containers the JDK can parse
    * without any codec: WAV (RIFF little-endian chunks — the fmt chunk's
    * channels/sampleRate/byteRate plus the data chunk's size give the
    * duration) and MP4 (ISO-BMFF big-endian boxes — moov/mvhd's
    * timescale+duration, trak children counted). Exactly like [[decode]],
    * only headers are read — no sample data materializes — and anything
    * unrecognized or structurally corrupt degrades PER ROW to
    * ("unknown", 0, 0, 0); a malformed payload may not abort the
    * partition's task. MP4 reports sample_rate 0 (that lives per-track in
    * stsd boxes, codec territory by design). */
  def decodeAv(bytes: Array[Byte]): (String, Long, Int, Int) =
    try {
      def tag(off: Int) = new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      if (bytes.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE") parseWav(bytes)
      else if (bytes.length >= 8 && tag(4) == "ftyp") parseMp4(bytes)
      else ("unknown", 0L, 0, 0)
    } catch {
      case scala.util.control.NonFatal(_) => ("unknown", 0L, 0, 0)
    }

  private def parseWav(bytes: Array[Byte]): (String, Long, Int, Int) = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var off = 12
    var channels = 0
    var sampleRate = 0
    var byteRate = 0
    var dataSize = -1L
    while (off + 8 <= bytes.length && (channels == 0 || dataSize < 0)) {
      val id = new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = bb.getInt(off + 4)
      // a corrupt negative chunk size would walk `off` backwards (or hold
      // it still) — an infinite loop on an executor thread, not just a bad
      // row; degrade like every other structural corruption instead
      if (size < 0) return ("unknown", 0L, 0, 0)
      if (id == "fmt " && off + 20 <= bytes.length) { // reads through byteRate @ +16..19
        channels = bb.getShort(off + 10)
        sampleRate = bb.getInt(off + 12)
        byteRate = bb.getInt(off + 16)
      } else if (id == "data") dataSize = size.toLong
      off += 8 + size + (size & 1) // RIFF chunks pad to even
    }
    if (channels <= 0 || byteRate <= 0 || dataSize < 0) ("unknown", 0L, 0, 0)
    else ("wav", dataSize * 1000L / byteRate, sampleRate, channels)
  }

  private def parseMp4(bytes: Array[Byte]): (String, Long, Int, Int) = {
    val bb = java.nio.ByteBuffer.wrap(bytes) // ISO-BMFF is big-endian
    def boxType(off: Int) = new String(bytes, off + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
    var off = 0
    var durationMs = -1L
    var tracks = 0
    while (off + 8 <= bytes.length) {
      val size = bb.getInt(off)
      if (size < 8) return ("unknown", 0L, 0, 0)
      if (boxType(off) == "moov") {
        var in = off + 8
        val end = math.min(off + size, bytes.length)
        while (in + 8 <= end) {
          val s = bb.getInt(in)
          if (s < 8) return ("unknown", 0L, 0, 0)
          boxType(in) match {
            case "mvhd" =>
              bytes(in + 8) match {
                case 0 if in + 28 <= end => // v0: 32-bit timescale @ +20, duration @ +24
                  val timescale = bb.getInt(in + 20)
                  if (timescale > 0)
                    durationMs = bb.getInt(in + 24).toLong * 1000L / timescale
                case 1 if in + 40 <= end => // v1: 64-bit times — timescale @ +28, duration @ +32
                  val timescale = bb.getInt(in + 28)
                  if (timescale > 0) durationMs = bb.getLong(in + 32) * 1000L / timescale
                case _ =>
              }
            case "trak" => tracks += 1
            case _ =>
          }
          in += s
        }
      }
      off += size
    }
    if (durationMs < 0) ("unknown", 0L, 0, 0) else ("mp4", durationMs, 0, tracks)
  }

  /** pages(url, html) → per-payload AV header metadata, the same
    * partition-preserving typed mapPartitions shape as [[apply]]. */
  def av(pages: DataFrame): Dataset[AvMeta] = {
    val in = pages.select("url", "html").as[MediaIn](Encoders.product[MediaIn])
    in.mapPartitions(_.map { m =>
      val (c, d, sr, t) = decodeAv(m.html)
      AvMeta(m.url, c, d, sr, t)
    })(Encoders.product[AvMeta])
  }

  final case class Frame(url: String, frame_idx: Int, byte_offset: Long)

  /** STUB frame sampling (video analog): derive a deterministic frame count
    * from the payload size and emit evenly-spaced byte offsets — the
    * one-blob → many-frames flatMap shape a real decoder would use. */
  def frameSample(pages: DataFrame): Dataset[Frame] = {
    val in = pages.select("url", "html").as[MediaIn](Encoders.product[MediaIn])
    in.mapPartitions(_.flatMap { m =>
      val n = m.html.length
      val frames = 1 + n % 7
      (0 until frames).map(i => Frame(m.url, i, i.toLong * (n / frames)))
    })(Encoders.product[Frame])
  }

  def apply(pages: DataFrame): Dataset[MediaMeta] = {
    val in = pages.select("url", "html").as[MediaIn](Encoders.product[MediaIn])
    in.mapPartitions(_.map { m =>
      val (w, h, f) = decode(m.html)
      MediaMeta(m.url, m.html.length.toLong, w, h, f)
    })(Encoders.product[MediaMeta])
  }
}
