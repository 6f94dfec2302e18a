package graft.multimodal

import graft.SparkSuite
import graft.multimodal.MediaOps.{MediaRow, Wav}

/** The real RIFF/WAVE codec: byte-level round-trip, tolerance for
  * foreign chunks (a real-world WAV often leads with LIST/INFO), and
  * loud failure on corrupt or unsupported containers.
  */
class WavCodecSpec extends SparkSuite {
  import spark.implicits._

  private val pcm = Array[Byte](0, 127, -128, -1, 64) // unsigned: 0,127,128,255,64

  test("build emits a spec-valid header and parse round-trips it") {
    val wav = Wav.build(8000, pcm)
    assert(new String(wav.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    assert(new String(wav.slice(12, 16), "US-ASCII") == "fmt ")
    assert(wav.length == 44 + pcm.length + (pcm.length & 1)) // word-aligned
    val d = Wav.parse(7L, wav)
    assert(d.media_id == 7L && d.sample_rate == 8000 && d.n_samples == pcm.length)
    // RMS over excess-128 samples, recomputed independently
    val expected = math.sqrt(pcm.map(b => {
      val s = ((b & 0xff) - 128).toDouble / 128.0; s * s
    }).sum / pcm.length)
    assert(d.rms == expected)
  }

  test("parseStats: pre-emphasized ZCR and mean |delta| on a planted signal") {
    // unsigned samples 100, 150, 120, 180, 60 → excess-128: -28, 22, -8, 52, -68
    // deltas: 50, -30, 60, -120 → sign flips between EVERY adjacent pair = 3
    // mean |d| = (50+30+60+120)/4 = 65.0
    val pcm = Array[Byte](100.toByte, 150.toByte, 120.toByte, 180.toByte, 60.toByte)
    val st = Wav.parseStats(3L, Wav.build(16000, pcm))
    assert(st.media_id == 3L && st.sample_rate == 16000 && st.n_samples == 5L)
    assert(st.n_zero_crossings == 3L)
    assert(st.mean_abs_delta == 65.0)
    // monotone signal: deltas all one sign → zero crossings
    val mono = Wav.parseStats(4L, Wav.build(16000, Array[Byte](10, 20, 30, 40)))
    assert(mono.n_zero_crossings == 0L && mono.mean_abs_delta == 10.0)
    // degenerate: 0- and 1-sample tracks have no deltas
    assert(Wav.parseStats(5L, Wav.build(16000, Array.empty[Byte])).mean_abs_delta == 0.0)
    assert(Wav.parseStats(6L, Wav.build(16000, Array[Byte](7))).n_zero_crossings == 0L)
  }

  test("parse walks past unknown chunks and odd-length padding") {
    // hand-build: RIFF [ JUNK(3 bytes + pad) fmt data ] — parser must
    // skip JUNK (including its pad byte) and still find fmt/data
    val base = Wav.build(16000, pcm)
    val fmtAndData = base.drop(12) // chunks only
    val junk = "JUNK".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte](9, 9, 9, 0) // len=3 + pad
    val bb = java.nio.ByteBuffer
      .allocate(12 + junk.length + fmtAndData.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII"))
      .putInt(4 + junk.length + fmtAndData.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put(junk).put(fmtAndData)
    val d = Wav.parse(1L, bb.array())
    assert(d.sample_rate == 16000 && d.n_samples == pcm.length)
  }

  test("corrupt and unsupported containers fail loudly") {
    intercept[IllegalArgumentException] { Wav.parse(1L, Array[Byte](1, 2, 3)) }
    val notRiff = Wav.build(8000, pcm); notRiff(0) = 'X'
    intercept[IllegalArgumentException] { Wav.parse(1L, notRiff) }
    val stereo = Wav.build(8000, pcm); stereo(22) = 2 // channels field
    intercept[IllegalArgumentException] { Wav.parse(1L, stereo) }
  }

  test("negative or over-long chunk lengths fail loudly instead of looping or decoding garbage") {
    // a NEGATIVE unknown-chunk length repositions the walk BACKWARDS
    // onto the same chunk: pre-fix this spun forever (a hung Spark task,
    // worse than a crash). Build RIFF [ JUNK(len=-8) fmt data ].
    val base = Wav.build(16000, pcm)
    val fmtAndData = base.drop(12)
    val evil = java.nio.ByteBuffer
      .allocate(12 + 8 + fmtAndData.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    evil.put("RIFF".getBytes("US-ASCII")).putInt(4 + 8 + fmtAndData.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("JUNK".getBytes("US-ASCII")).putInt(-8)
      .put(fmtAndData)
    intercept[IllegalArgumentException] { Wav.parse(1L, evil.array()) }
    // a negative DATA length pre-fix passed the bounds require (negative
    // sum) and returned n_samples < 0 — silent garbage
    val negData = Wav.build(16000, pcm)
    val dataLenOff = negData.length - pcm.length - (pcm.length & 1) - 4
    java.nio.ByteBuffer.wrap(negData).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(dataLenOff, -4)
    intercept[IllegalArgumentException] { Wav.parse(1L, negData) }
    // over-long: declares more bytes than remain
    val tooLong = Wav.build(16000, pcm)
    java.nio.ByteBuffer.wrap(tooLong).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(dataLenOff, pcm.length + 1000)
    intercept[IllegalArgumentException] { Wav.parse(1L, tooLong) }
  }

  test("distributed decode matches a driver-side decode of the same payloads") {
    val rows = (0L until 50L).map(i =>
      MediaRow(i, "audio", Array.tabulate((i % 7).toInt + 1)(j => (i * 31 + j).toByte)))
    val ds = spark.createDataset(rows)
    val got = MediaOps.decodeWavs(MediaOps.wrapAsWav(ds, 16000))
      .collect().map(d => d.media_id -> d).toMap
    rows.foreach { m =>
      val exp = Wav.parse(m.media_id, Wav.build(16000, m.payload))
      val g = got(m.media_id)
      assert(g.n_samples == exp.n_samples && g.rms == exp.rms && g.sample_rate == 16000)
    }
  }
}
