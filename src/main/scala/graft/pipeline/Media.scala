package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}

/** Multimodal column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata extracted via typed mapPartitions (the
  * Scala analog of a batched mapInPandas decode).
  *
  * The actual codec work is a clearly-marked STUB (no image/audio libs in
  * this container): `decodeStub` derives deterministic fake dimensions from
  * the byte payload. The Spark-side plumbing — binary schema, partition-
  * preserving batch iteration, metadata struct output — is real and tested;
  * swapping `decodeStub` for a JNI/ImageIO decoder changes no plan shape.
  */
object Media {

  final case class MediaIn(url: String, html: Array[Byte])
  final case class MediaMeta(url: String, n_bytes: Long, width: Int, height: Int, format: String)

  /** STUB decode: dimensions/format are pure functions of payload size. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, String) = {
    val n = bytes.length
    (64 + n % 101, 64 + n % 67, if (n % 2 == 0) "png" else "jpeg")
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
      val (w, h, f) = decodeStub(m.html)
      MediaMeta(m.url, m.html.length.toLong, w, h, f)
    })(Encoders.product[MediaMeta])
  }
}
