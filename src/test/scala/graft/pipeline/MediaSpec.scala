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
}
