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

  test("bmpThumb: box resize by hand — identity at t=width, 2x2 boxes at t=2") {
    // 48 payload bytes -> 16 pixels -> a 4x4 grid exactly
    val payload = Array.tabulate(48)(i => (i * 5 + 3).toByte)
    val bmp = Bmp.build(payload)
    def px(k: Int, c: Int): Int = payload(3 * k + c) & 0xff

    // t=4 on a 4x4 image: one pixel per cell, averages are exact bytes
    val t4 = MediaOps.bmpThumb(9L, bmp, 4)
    assert(t4.length == 16)
    t4.foreach { cell =>
      assert(cell.width == 4 && cell.height == 4 && cell.n_px == 1L)
      val k = cell.cy * 4 + cell.cx
      assert(cell.c0 == px(k, 0).toDouble && cell.c1 == px(k, 1).toDouble
        && cell.c2 == px(k, 2).toDouble)
    }

    // t=2: each cell is a 2x2 pixel box
    val t2 = MediaOps.bmpThumb(9L, bmp, 2).map(c => (c.cy, c.cx) -> c).toMap
    assert(t2.size == 4)
    val c00 = t2((0, 0))
    assert(c00.n_px == 4L)
    val ks = Seq(0, 1, 4, 5) // pixels of the top-left 2x2 box
    assert(c00.c0 == ks.map(px(_, 0)).sum.toDouble / 4)
    assert(c00.c2 == ks.map(px(_, 2)).sum.toDouble / 4)
  }

  test("bmpThumb: sub-target images drop; cells tile exactly on ragged dims") {
    // 2x2 grid (12 bytes): narrower than t=4 -> no cells
    assert(MediaOps.bmpThumb(1L, Bmp.build(Array.tabulate(12)(_.toByte)), 4).isEmpty)
    // a 7x7-ish ragged grid: cell pixel counts must sum to width*height
    // and every cell must be non-empty
    val ragged = Bmp.build(Array.tabulate(150)(i => (i * 11).toByte)) // 50 px -> 7x8
    val cells = MediaOps.bmpThumb(2L, ragged, 4)
    assert(cells.length == 16)
    assert(cells.map(_.n_px).sum == cells.head.width.toLong * cells.head.height)
    assert(cells.forall(_.n_px >= 1L))
  }
}
