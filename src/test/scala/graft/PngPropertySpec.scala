package graft

import java.awt.image.BufferedImage

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.PngCodec

/** Randomized decode-equality of [[PngCodec]] against the JVM's own
  * PNG encoder+decoder (javax.imageio): for random dimensions and
  * random pixel content across gray / RGB / ARGB rasters, every
  * reconstructed sample must equal what imageio itself reads back —
  * exercising whatever adaptive row filters the encoder chose, odd
  * widths (per-row filter arithmetic with bpp offsets), and 1-pixel
  * edges. Seeded — deterministic. Pure JVM, no Spark session.
  */
class PngPropertySpec extends AnyFunSuite {

  private def encode(img: BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos), "no png encoder")
    bos.toByteArray
  }

  private def check(img: BufferedImage, w: Int, h: Int, hasAlpha: Boolean,
      gray: Boolean): Unit = {
    val bytes = encode(img)
    val p = PngCodec.decode(bytes).getOrElse(
      fail(s"decode failed for ${w}x$h gray=$gray alpha=$hasAlpha"))
    assert(p.width === w && p.height === h)
    // cross-check against imageio's own read-back of the same bytes
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    for (y <- 0 until h; x <- 0 until w) {
      val want = ref.getRGB(x, y)
      if (gray)
        // getRGB on gray rasters applies a colorspace transform; the
        // codec contract is the RAW sample, so compare rasters
        assert(p.sample(x, y, 0) === ref.getRaster.getSample(x, y, 0),
          s"gray ($x,$y)")
      else {
        assert(p.sample(x, y, 0) === ((want >> 16) & 0xff), s"R ($x,$y)")
        assert(p.sample(x, y, 1) === ((want >> 8) & 0xff), s"G ($x,$y)")
        assert(p.sample(x, y, 2) === (want & 0xff), s"B ($x,$y)")
        if (hasAlpha)
          assert(p.sample(x, y, 3) === ((want >> 24) & 0xff), s"A ($x,$y)")
      }
    }
  }

  test("random images round-trip bit-exactly through PngCodec (seeded)") {
    val rnd = new Random(0xbeef)
    for (trial <- 1 to 12) {
      val w = 1 + rnd.nextInt(40)
      val h = 1 + rnd.nextInt(40)
      rnd.nextInt(3) match {
        case 0 =>
          val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          for (y <- 0 until h; x <- 0 until w)
            img.setRGB(x, y, rnd.nextInt() & 0xffffff)
          check(img, w, h, hasAlpha = false, gray = false)
        case 1 =>
          val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
          for (y <- 0 until h; x <- 0 until w)
            img.setRGB(x, y, rnd.nextInt())
          check(img, w, h, hasAlpha = true, gray = false)
        case _ =>
          val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
          for (y <- 0 until h; x <- 0 until w)
            img.getRaster.setSample(x, y, 0, rnd.nextInt(256))
          check(img, w, h, hasAlpha = false, gray = true)
      }
    }
  }

  test("random byte garbage never throws — always a clean None") {
    val rnd = new Random(0xf00d)
    for (_ <- 1 to 200) {
      val b = new Array[Byte](rnd.nextInt(400))
      rnd.nextBytes(b)
      PngCodec.decode(b) // must not throw
    }
    // PNG-signature-prefixed garbage too (walks further into the parser)
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    for (_ <- 1 to 200) {
      val body = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(body)
      PngCodec.decode(sig ++ body) // must not throw
    }
  }
}
