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
