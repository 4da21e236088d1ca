package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Media.decode: real header decode for JDK-recognized formats, stub for
  * everything else — INCLUDING recognized-but-corrupt payloads, which must
  * degrade per-row rather than abort a partition's task. Pure driver-side. */
class MediaSpec extends AnyFunSuite {

  private def png(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("real PNG decodes to its true dimensions") {
    assert(Media.decode(png(23, 7)) === ((23, 7, "png")))
  }

  test("JPEG format name normalizes to 'jpeg'") {
    val img = new java.awt.image.BufferedImage(
      5, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    assert(Media.decode(baos.toByteArray) === ((5, 4, "jpeg")))
  }

  test("unrecognized payloads fall back to the deterministic stub") {
    val html = "<html><body>not an image</body></html>".getBytes("UTF-8")
    assert(Media.decode(html) === Media.decodeStub(html))
  }

  test("a truncated PNG (valid magic, cut-off header) degrades to the stub") {
    val corrupt = png(23, 7).take(12) // magic survives, IHDR does not
    assert(Media.decode(corrupt) === Media.decodeStub(corrupt))
  }

  test("a text blob sniffing as BMP ('BM' prefix) must not throw") {
    // the BMP reader matches on the 2-byte magic alone; whatever its header
    // parse makes of the prose bytes, the row must come back decoded-or-stub
    val fakeBmp = "BM this is prose that merely starts like a bitmap".getBytes("UTF-8")
    val (w, h, f) = Media.decode(fakeBmp)
    assert(f.nonEmpty && w != 0 && h != 0)
  }

  // ---- decodeAv: WAV / MP4 header parsing and per-row degradation ----

  private def le(n: Int): java.nio.ByteBuffer =
    java.nio.ByteBuffer.allocate(n).order(java.nio.ByteOrder.LITTLE_ENDIAN)
  private def ascii(bb: java.nio.ByteBuffer, s: String): Unit =
    bb.put(s.getBytes("US-ASCII"))

  /** PCM WAV with 16-bit samples; byteRate = rate·ch·2. */
  private def wav(ch: Int, rate: Int, dataBytes: Int): Array[Byte] = {
    val bb = le(44 + dataBytes)
    ascii(bb, "RIFF"); bb.putInt(36 + dataBytes); ascii(bb, "WAVE")
    ascii(bb, "fmt "); bb.putInt(16)
    bb.putShort(1); bb.putShort(ch.toShort); bb.putInt(rate)
    bb.putInt(rate * ch * 2); bb.putShort((ch * 2).toShort); bb.putShort(16)
    ascii(bb, "data"); bb.putInt(dataBytes)
    bb.array()
  }

  test("WAV duration/rate/channels come from the fmt and data chunk headers") {
    // 8000 B of data at 16000 B/s → 500 ms
    assert(Media.decodeAv(wav(1, 8000, 8000)) === (("wav", 500L, 8000, 1)))
    // 44100 B at 176400 B/s → 250 ms, stereo
    assert(Media.decodeAv(wav(2, 44100, 44100)) === (("wav", 250L, 44100, 2)))
  }

  test("a truncated WAV (magic only, no fmt chunk) degrades to unknown") {
    assert(Media.decodeAv(wav(1, 8000, 8000).take(12)) === (("unknown", 0L, 0, 0)))
  }

  test("a WAV whose fmt declares byteRate 0 degrades instead of dividing") {
    val b = wav(1, 8000, 8000)
    val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(28, 0) // byteRate field inside fmt
    assert(Media.decodeAv(b) === (("unknown", 0L, 0, 0)))
  }

  /** ftyp + moov{mvhd v0 + `tracks` empty trak boxes}. */
  private def mp4(timescale: Int, duration: Int, tracks: Int): Array[Byte] = {
    val moovLen = 8 + 108 + 8 * tracks
    val bb = java.nio.ByteBuffer.allocate(16 + moovLen)
    bb.putInt(16); ascii(bb, "ftyp"); ascii(bb, "isom"); bb.putInt(0x200)
    bb.putInt(moovLen); ascii(bb, "moov")
    bb.putInt(108); ascii(bb, "mvhd")
    val end = bb.position() + 100
    bb.putInt(0) // version 0 + flags
    bb.putInt(0); bb.putInt(0); bb.putInt(timescale); bb.putInt(duration)
    bb.position(end)
    (0 until tracks).foreach { _ => bb.putInt(8); ascii(bb, "trak") }
    bb.array()
  }

  test("MP4 duration and track count come from moov/mvhd and trak boxes") {
    assert(Media.decodeAv(mp4(600, 3000, 2)) === (("mp4", 5000L, 0, 2)))
  }

  test("an MP4 with a corrupt box size (< 8) degrades to unknown") {
    val b = mp4(600, 3000, 2)
    java.nio.ByteBuffer.wrap(b).putInt(16, 3) // moov's size field → 3
    assert(Media.decodeAv(b) === (("unknown", 0L, 0, 0)))
  }

  test("an MP4 without a moov box (ftyp only) degrades to unknown") {
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putInt(16); ascii(bb, "ftyp"); ascii(bb, "isom"); bb.putInt(0x200)
    assert(Media.decodeAv(bb.array()) === (("unknown", 0L, 0, 0)))
  }

  test("a WAV chunk with a NEGATIVE size must degrade, not loop forever") {
    // size = -8 makes `off += 8 + size + (size & 1)` a no-op — before the
    // guard this hung the executor thread instead of failing the row
    val b = wav(1, 8000, 64)
    val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(16, -8) // fmt chunk's size field
    assert(Media.decodeAv(b) === (("unknown", 0L, 0, 0)))
  }

  test("decodeAv never throws and always terminates on arbitrary bytes") {
    val rnd = new scala.util.Random(7)
    for (n <- Seq(0, 1, 7, 8, 12, 13, 44, 200, 4096); _ <- 1 to 50) {
      val b = Array.fill[Byte](n)(rnd.nextInt().toByte)
      Media.decodeAv(b) // any result is fine; throwing or hanging is not
    }
    // adversarial prefixes over random tails: magic sniffs into each parser
    for (_ <- 1 to 200) {
      val tail = Array.fill[Byte](100)(rnd.nextInt().toByte)
      Media.decodeAv("RIFF????WAVE".getBytes("US-ASCII") ++ tail)
      Media.decodeAv(Array[Byte](0, 0, 0, 16) ++ "ftyp".getBytes("US-ASCII") ++ tail)
    }
  }

  test("non-media payloads and short buffers degrade to unknown") {
    assert(Media.decodeAv("just prose".getBytes("UTF-8")) === (("unknown", 0L, 0, 0)))
    assert(Media.decodeAv(Array.emptyByteArray) === (("unknown", 0L, 0, 0)))
    assert(Media.decodeAv("RIFF".getBytes("US-ASCII")) === (("unknown", 0L, 0, 0)))
  }
}
