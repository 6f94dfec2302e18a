package graft.multimodal

import graft.SparkSuite
import graft.multimodal.MediaOps.{Bmp, MediaRow}

/** The real BMP codec: header/layout round-trip, row-padding handling,
  * and loud failure on corrupt or unsupported containers.
  */
class BmpCodecSpec extends SparkSuite {
  import spark.implicits._

  test("build emits a spec-valid DIB and parse round-trips dims + histogram") {
    val payload = Array.tabulate[Byte](10)(i => (i * 29).toByte) // 10 bytes -> 4 pixels
    val bmp = Bmp.build(payload)
    assert(bmp(0) == 'B'.toByte && bmp(1) == 'M'.toByte)
    val (w, h) = Bmp.grid(payload.length) // 4 pixels -> 2x2
    assert((w, h) == (2, 2))
    val d = Bmp.parse(3L, bmp)
    assert(d.media_id == 3L && d.width == w && d.height == h && d.channels == 3)
    assert(d.n_bytes == w.toLong * h * 3)
    // histogram recomputed independently: payload bytes + zero pad pixels
    val padded = java.util.Arrays.copyOf(payload, w * h * 3)
    val hist = new Array[Double](8)
    padded.foreach(b => hist((b & 0xff) >> 5) += 1)
    assert(d.features.toSeq == hist.map(_ / (w * h * 3)).toSeq)
  }

  test("a width whose 3-byte rows are not word-aligned still parses (row padding)") {
    // 27 bytes -> 9 pixels -> 3x3 grid: rows are 9 bytes, padded to 12 in
    // the file; a stride bug would shear rows and corrupt the histogram
    val payload = Array.tabulate[Byte](27)(i => (255 - i * 7).toByte)
    val (w, h) = Bmp.grid(payload.length)
    assert(w == 3 && h == 3 && (w * 3) % 4 != 0)
    val d = Bmp.parse(1L, Bmp.build(payload))
    val hist = new Array[Double](8)
    payload.foreach(b => hist((b & 0xff) >> 5) += 1)
    assert(d.features.toSeq == hist.map(_ / 27.0).toSeq)
  }

  test("a width that overflows Int stride arithmetic is rejected, not silently decoded") {
    // width = 0x2AAAAAAB: width*3 wraps Int negative; pre-fix the
    // negative rowSize passed the bounds require and parse returned a
    // zero-histogram DecodedImage with no error
    val evil = Bmp.build(Array[Byte](1, 2, 3))
    val bb = java.nio.ByteBuffer.wrap(evil).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(18, 0x2AAAAAAB) // width field
    bb.putInt(22, 1) // height
    intercept[IllegalArgumentException] { Bmp.parse(1L, evil) }
    // and the Long-product cliff: huge width AND height whose stride
    // product wraps 64-bit must also fail via the division-form bound
    val evil2 = Bmp.build(Array[Byte](1, 2, 3))
    val bb2 = java.nio.ByteBuffer.wrap(evil2).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb2.putInt(18, Int.MaxValue)
    bb2.putInt(22, Int.MaxValue)
    intercept[IllegalArgumentException] { Bmp.parse(1L, evil2) }
  }

  test("empty payloads decode as one black pixel; corrupt containers fail loudly") {
    val empty = Bmp.parse(1L, Bmp.build(Array.emptyByteArray))
    assert(empty.width == 1 && empty.height == 1 && empty.n_bytes == 3)
    assert(empty.features(0) == 1.0) // all three bytes are zero
    intercept[IllegalArgumentException] { Bmp.parse(1L, Array[Byte](1, 2, 3)) }
    val notBmp = Bmp.build(Array[Byte](1, 2, 3)); notBmp(0) = 'X'.toByte
    intercept[IllegalArgumentException] { Bmp.parse(1L, notBmp) }
    val bpp8 = Bmp.build(Array[Byte](1, 2, 3)); bpp8(28) = 8 // bpp field
    intercept[IllegalArgumentException] { Bmp.parse(1L, bpp8) }
  }

  test("distributed decode matches a driver-side decode of the same payloads") {
    val rows = (0L until 40L).map(i =>
      MediaRow(i, "image", Array.tabulate((i % 11).toInt * 5 + 1)(j => (i * 17 + j * 3).toByte)))
    val got = MediaOps.decodeBmps(MediaOps.wrapAsBmp(spark.createDataset(rows)))
      .collect().map(d => d.media_id -> d).toMap
    rows.foreach { m =>
      val exp = Bmp.parse(m.media_id, Bmp.build(m.payload))
      val g = got(m.media_id)
      assert(g.width == exp.width && g.height == exp.height &&
        g.n_bytes == exp.n_bytes && g.features.toSeq == exp.features.toSeq)
    }
  }
}
