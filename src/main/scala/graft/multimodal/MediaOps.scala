package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators: images / audio / video travel through the
  * pipeline as opaque `binary` payload columns plus typed metadata, and
  * decode / feature-extract / resize / frame-sample run as typed
  * `mapPartitions` stages (the Scala analogue of `mapInPandas`: one
  * iterator per partition, so per-batch setup — a real codec context, an
  * inference session — is amortized across the partition, never paid
  * per row).
  *
  * Scale design: payloads stay opaque bytes until the latest possible
  * stage (no decode before a filter that could drop the row); decoded
  * frames/features are columnar primitives (ints / array<double>) so
  * everything downstream is codegen-able; per-media work is
  * embarrassingly parallel — partitioning by media_id keeps any stateful
  * codec local to one task. At 100 TB the payload column dominates I/O,
  * so operators that only need metadata (qm01-style) must prune it —
  * Spark's column pruning drops `payload` from the scan when the plan
  * never touches it.
  *
  * ==== STUB boundary ====
  * This container has no image/audio codec libraries, so `Codecs` fakes
  * the decode deterministically from the payload bytes. Every fake is
  * clearly marked; the Spark-side plumbing (schemas, encoders, batch
  * shape, partitioning) is real and is what the tests pin. Exceptions:
  * [[Wav]] and [[Bmp]] are REAL container codecs (no external library
  * needed for either format), so the audio path qm07 and the image
  * path qm08 run genuine decodes end-to-end.
  */
object MediaOps {

  /** An undecoded media row: opaque payload + the metadata a real
    * ingest would carry (mime kind, declared byte length).
    */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** Decoded-image metadata + a fixed-width feature vector. */
  final case class DecodedImage(
      media_id: Long,
      width: Int,
      height: Int,
      channels: Int,
      n_bytes: Long,
      features: Array[Double])

  /** One sampled video frame: parent media, frame index, frame payload. */
  final case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** 64-bit perceptual hash of a decoded image (63 AC bits, bit 63
    * always 0), with the decoded dims.
    */
  final case class ImagePhash(media_id: Long, width: Int, height: Int, phash: Long)

  /** One target cell of a box-resized thumbnail: integer pixel count
    * plus the per-channel box averages (c0/c1/c2 = the BMP byte order
    * within a pixel). Averages are ONE exactly-rounded division of
    * integer sums, so both engines derive identical doubles.
    */
  final case class ThumbCell(
      media_id: Long, width: Int, height: Int, cy: Int, cx: Int,
      n_px: Long, c0: Double, c1: Double, c2: Double)

  /** Decoded-audio metadata + RMS loudness. */
  final case class DecodedAudio(
      media_id: Long,
      sample_rate: Int,
      n_samples: Long,
      rms: Double)

  /** Segmental audio stats from a real decode: zero crossings and mean
    * |first difference| of the pre-emphasized signal.
    */
  final case class AudioStats(
      media_id: Long,
      sample_rate: Int,
      n_samples: Long,
      n_zero_crossings: Long,
      mean_abs_delta: Double)

  // -----------------------------------------------------------------------
  /** Deterministic codec fakes. A production build replaces the bodies
    * with real codec calls (e.g. javax.imageio / ffmpeg bindings); the
    * signatures — bytes in, typed struct out, pure, batch-safe — are the
    * contract the pipeline depends on.
    */
  object Codecs {
    /** STUB decode: dimensions derived from byte length (square-ish,
      * 3 channels), features = normalized 8-bin byte histogram. A real
      * implementation decodes the actual image here.
      */
    def decodeImage(id: Long, payload: Array[Byte]): DecodedImage = {
      val n = payload.length
      val width = math.max(1, math.sqrt(n.toDouble).toInt)
      val height = (n + width - 1) / width
      val hist = new Array[Double](8)
      var i = 0
      while (i < n) { hist((payload(i) & 0xff) >> 5) += 1; i += 1 }
      if (n > 0) { var b = 0; while (b < 8) { hist(b) /= n; b += 1 } }
      DecodedImage(id, width, height, 3, n.toLong, hist)
    }

    /** STUB resize: real code interpolates pixels; the fake rescales the
      * metadata and keeps the histogram (it is scale-invariant).
      */
    def resize(img: DecodedImage, w: Int, h: Int): DecodedImage =
      img.copy(width = w, height = h)

    /** STUB audio decode: bytes as signed 8-bit PCM at a fixed rate. */
    def decodeAudio(id: Long, payload: Array[Byte]): DecodedAudio = {
      val n = payload.length
      var acc = 0.0
      var i = 0
      while (i < n) { val s = payload(i).toDouble / 128.0; acc += s * s; i += 1 }
      DecodedAudio(id, 16000, n.toLong, if (n == 0) 0.0 else math.sqrt(acc / n))
    }
  }

  // -----------------------------------------------------------------------
  /** REAL codec for one public container format: RIFF/WAVE (the
    * Microsoft/IBM WAV spec — `RIFF <size> WAVE` followed by tagged
    * chunks; PCM format code 1). Unlike `Codecs`, nothing here is
    * faked: `build` emits a byte-valid WAV file and `parse` trusts ONLY
    * the bytes — magic, chunk walk (skipping unknown chunks and their
    * odd-length pad bytes), `fmt ` fields, `data` length. This replaces
    * the stub boundary for the audio family: qm07 decodes actual WAV
    * payloads, and a payload that lies about its container fails loudly.
    *
    * Scope: 8-bit unsigned mono PCM (format 1). That is enough to make
    * the decode real while keeping the parser reviewable; a production
    * build swaps in a full codec behind the same bytes-in, typed-out
    * signature.
    */
  object Wav {
    import java.nio.{ByteBuffer, ByteOrder}

    /** Wrap unsigned-8-bit mono PCM in a valid RIFF/WAVE container. */
    def build(sampleRate: Int, pcm8: Array[Byte]): Array[Byte] = {
      require(sampleRate > 0)
      val pad = pcm8.length & 1 // RIFF chunks are word-aligned
      val bb = ByteBuffer.allocate(44 + pcm8.length + pad).order(ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + pcm8.length + pad)
        .put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1) // PCM
        .putShort(1) // mono
        .putInt(sampleRate)
        .putInt(sampleRate) // byte rate = rate * channels * bytes/sample
        .putShort(1) // block align
        .putShort(8) // bits per sample
      bb.put("data".getBytes("US-ASCII")).putInt(pcm8.length).put(pcm8)
      if (pad == 1) bb.put(0.toByte)
      bb.array()
    }

    /** Parse a WAV payload: chunk-walk to `fmt ` and `data`, then RMS
      * over the samples (8-bit WAV PCM is UNSIGNED, excess-128: sample
      * = (b - 128)/128). Throws on bad magic / missing chunks /
      * unsupported encodings — a corrupt payload must fail the row
      * loudly, not decode to garbage.
      */
    /** Chunk walk shared by [[parse]] and [[parseStats]]: validate the
      * container, return (sampleRate, dataOff, dataLen).
      */
    private def walk(id: Long, wav: Array[Byte]): (Int, Int, Int) = {
      val bb = ByteBuffer.wrap(wav).order(ByteOrder.LITTLE_ENDIAN)
      def tag(): String = { val t = new Array[Byte](4); bb.get(t); new String(t, "US-ASCII") }
      require(wav.length >= 44, s"media $id: truncated WAV (${wav.length} bytes)")
      require(tag() == "RIFF", s"media $id: not a RIFF file")
      bb.getInt // declared riff size (unused: the chunk walk bounds itself)
      require(tag() == "WAVE", s"media $id: RIFF but not WAVE")
      var sampleRate = -1
      var dataOff = -1
      var dataLen = -1
      while ((dataOff < 0 || sampleRate < 0) && bb.remaining() >= 8) {
        val t = tag()
        val len = bb.getInt
        // a negative length would walk the cursor BACKWARDS (same chunk
        // forever — a hung task, worse than a crash) or sign a negative
        // data size past the bounds require; an over-long one just
        // truncates. Loud failure, per the codec's contract.
        require(len >= 0 && len <= bb.remaining(),
          s"media $id: chunk '$t' declares $len bytes with ${bb.remaining()} remaining")
        // chunk bodies are word-aligned: an odd-length chunk is FOLLOWED
        // by a pad byte — but real-world writers omit the pad on the
        // final chunk, so the skip clamps to the buffer end instead of
        // stepping one past the limit (raw IllegalArgumentException)
        def skipTo(end: Int): Unit = bb.position(math.min(end, bb.limit()))
        t match {
          case "fmt " =>
            // a fmt chunk shorter than the 16 PCM header bytes would
            // read the NEXT chunk's bytes as format fields — garbage
            // sample rates accepted silently; fail loudly instead
            require(len >= 16,
              s"media $id: fmt chunk declares $len bytes (PCM header needs 16)")
            val fmtEnd = bb.position() + len
            require(bb.getShort == 1, s"media $id: non-PCM WAV unsupported")
            require(bb.getShort == 1, s"media $id: only mono supported")
            sampleRate = bb.getInt
            bb.getInt; bb.getShort // byte rate, block align
            require(bb.getShort == 8, s"media $id: only 8-bit PCM supported")
            skipTo(fmtEnd + (len & 1))
          case "data" =>
            dataOff = bb.position(); dataLen = len
            skipTo(dataOff + len + (len & 1))
          case _ => // skip unknown chunk + its pad byte
            skipTo(bb.position() + len + (len & 1))
        }
      }
      require(sampleRate > 0, s"media $id: no fmt chunk")
      require(dataOff >= 0 && dataOff + dataLen <= wav.length,
        s"media $id: data chunk out of bounds")
      (sampleRate, dataOff, dataLen)
    }

    def parse(id: Long, wav: Array[Byte]): DecodedAudio = {
      val (sampleRate, dataOff, dataLen) = walk(id, wav)
      var acc = 0.0
      var i = 0
      while (i < dataLen) {
        val s = ((wav(dataOff + i) & 0xff) - 128).toDouble / 128.0
        acc += s * s
        i += 1
      }
      DecodedAudio(id, sampleRate, dataLen.toLong,
        if (dataLen == 0) 0.0 else math.sqrt(acc / dataLen))
    }

    /** Segmental stats over the PRE-EMPHASIZED signal (first difference
      * d_j = s_j − s_{j−1}, the standard high-pass applied before ZCR /
      * energy analysis — raw excess-128 text-derived PCM never crosses
      * zero, the differenced signal does): zero-crossing count by strict
      * sign product < 0 over INTEGER deltas (no float compares, no
      * boundary ambiguity) and mean |d| — an exact integer sum with ONE
      * correctly-rounded division at the end, bit-identical
      * cross-engine. Together the cheap audio-activity gate next to
      * qm07's RMS loudness.
      */
    def parseStats(id: Long, wav: Array[Byte]): AudioStats = {
      val (sampleRate, dataOff, dataLen) = walk(id, wav)
      var zc = 0L
      var absSum = 0L
      var prevD = 0
      var prev = 0
      var i = 0
      while (i < dataLen) {
        val s = (wav(dataOff + i) & 0xff) - 128
        if (i > 0) {
          val d = s - prev
          if (i > 1 && prevD * d < 0) zc += 1
          absSum += math.abs(d)
          prevD = d
        }
        prev = s
        i += 1
      }
      AudioStats(id, sampleRate, dataLen.toLong, zc,
        if (dataLen <= 1) 0.0 else absSum.toDouble / (dataLen - 1).toDouble)
    }
  }

  /** REAL codec #2: BMP (Windows DIB, BITMAPINFOHEADER, uncompressed
    * 24-bit BGR — the other public container format parseable without
    * any library). `build` lays payload bytes out as pixels in a
    * square-ish grid (bottom-up rows, 4-byte row padding, zero pad
    * pixels — all per the DIB spec) and `parse` trusts only the bytes:
    * magic, pixel-data offset, header fields, row stride. Upgrades the
    * IMAGE family from stub to real the way [[Wav]] did audio: qm08
    * decodes genuine BMP payloads, dims and histogram come from actual
    * pixel rows.
    */
  object Bmp {
    import java.nio.{ByteBuffer, ByteOrder}

    /** Grid shape for `n` payload bytes: ceil(n/3) pixels (min 1),
      * width = floor(sqrt(pixels)) (min 1), height = ceil(pixels/width).
      * Shared by build, parse-side tests, and the qm08 oracle.
      */
    def grid(n: Int): (Int, Int) = {
      val npix = math.max(1, (n + 2) / 3)
      val width = math.max(1, math.sqrt(npix.toDouble).toInt)
      (width, (npix + width - 1) / width)
    }

    /** Wrap bytes as a valid 24-bit BMP: payload (zero-padded to
      * width·height pixels) in top-down reading order, stored in the
      * file bottom-up as the format requires.
      */
    def build(payload: Array[Byte]): Array[Byte] = {
      val (width, height) = grid(payload.length)
      val rowSize = (width * 3 + 3) / 4 * 4 // rows pad to 4-byte words
      val dataSize = rowSize * height
      val bb = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
      bb.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
        .putShort(0).putShort(0).putInt(54) // reserved, pixel-data offset
      bb.putInt(40).putInt(width).putInt(height) // BITMAPINFOHEADER
        .putShort(1).putShort(24).putInt(0) // planes, bpp, BI_RGB
        .putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
      val pixels = java.util.Arrays.copyOf(payload, width * height * 3)
      var row = height - 1 // file rows run bottom-up
      while (row >= 0) {
        bb.put(pixels, row * width * 3, width * 3)
        var pad = rowSize - width * 3
        while (pad > 0) { bb.put(0.toByte); pad -= 1 }
        row -= 1
      }
      bb.array()
    }

    /** Validate magic + DIB header and return (dataOffset, width,
      * height, rowSize) — the ONE header walk [[parse]] and
      * [[MediaOps.bmpPhash]] share, so a hardening fix can never apply
      * to one consumer and miss the other.
      */
    private[multimodal] def header(id: Long, bmp: Array[Byte]): (Int, Int, Int, Int) = {
      require(bmp.length >= 54, s"media $id: truncated BMP (${bmp.length} bytes)")
      val bb = ByteBuffer.wrap(bmp).order(ByteOrder.LITTLE_ENDIAN)
      require(bb.get() == 'B'.toByte && bb.get() == 'M'.toByte, s"media $id: not a BMP")
      bb.getInt; bb.getInt // file size, reserved
      val dataOffset = bb.getInt
      require(bb.getInt >= 40, s"media $id: pre-DIB header unsupported")
      val width = bb.getInt
      val height = bb.getInt
      require(width > 0 && height > 0, s"media $id: top-down/degenerate BMP unsupported")
      require(bb.getShort == 1, s"media $id: planes != 1")
      require(bb.getShort == 24, s"media $id: only 24-bit BMP supported")
      require(bb.getInt == 0, s"media $id: compressed BMP unsupported")
      // Long stride: width ≥ ~7.2e8 would overflow Int in width*3 to a
      // NEGATIVE rowSize that sails through the bounds require below —
      // a crafted header would then decode to silent garbage instead of
      // failing loudly. The passing require caps rowSizeL under
      // bmp.length (an Int), so the .toInt narrowing below is exact.
      val rowSizeL = (width.toLong * 3 + 3) / 4 * 4
      // division form: rowSizeL·height ≤ avail without the product (which
      // itself can overflow Long at adversarial width × height)
      require(dataOffset >= 54 && dataOffset <= bmp.length &&
        rowSizeL <= (bmp.length - dataOffset).toLong / height,
        s"media $id: pixel data out of bounds")
      (dataOffset, width, height, rowSizeL.toInt)
    }

    /** Parse a BMP: validate magic/header, walk the bottom-up padded
      * rows, return dims + the normalized 8-bin histogram over the
      * width·height·3 pixel bytes. Throws on non-BMP / compressed /
      * non-24-bit payloads.
      */
    def parse(id: Long, bmp: Array[Byte]): DecodedImage = {
      val (dataOffset, width, height, rowSize) = header(id, bmp)
      val hist = new Array[Double](8)
      var row = 0
      while (row < height) {
        val base = dataOffset + row * rowSize
        var i = 0
        while (i < width * 3) { hist((bmp(base + i) & 0xff) >> 5) += 1; i += 1 }
        row += 1
      }
      val pb = width.toLong * height * 3
      var b = 0
      while (b < 8) { hist(b) /= pb; b += 1 }
      DecodedImage(id, width, height, 3, pb, hist)
    }
  }

  /** INTEGER 8-point DCT-II basis: T(u)(x) = round(16384·cos(π(2x+1)u/16)).
    * Fixed-point so the whole pHash is exact 64-bit integer arithmetic —
    * replayable bit-for-bit by the DuckDB oracle (a float DCT would hinge
    * on cross-engine cos()/rounding agreement at the median-compare
    * boundary). Bounds: |cell| < 2^18, |T| ≤ 2^14 ⟹ |coef| ≤ 64·2^46 < 2^53.
    */
  private[graft] val DctT: Array[Array[Long]] = Array(
    Array(16384L, 16384L, 16384L, 16384L, 16384L, 16384L, 16384L, 16384L),
    Array(16069L, 13623L, 9102L, 3196L, -3196L, -9102L, -13623L, -16069L),
    Array(15137L, 6270L, -6270L, -15137L, -15137L, -6270L, 6270L, 15137L),
    Array(13623L, -3196L, -16069L, -9102L, 9102L, 16069L, 3196L, -13623L),
    Array(11585L, -11585L, -11585L, 11585L, 11585L, -11585L, -11585L, 11585L),
    Array(9102L, -16069L, 3196L, 13623L, -13623L, -3196L, 16069L, -9102L),
    Array(6270L, -15137L, 15137L, -6270L, -6270L, 15137L, -15137L, 6270L),
    Array(3196L, -9102L, 13623L, -16069L, 16069L, -13623L, 9102L, -3196L))

  /** 8×8 DCT perceptual hash from a REAL BMP payload — the image twin of
    * the text near-dup fingerprints (SimHash qd05): same container walk
    * as [[Bmp.parse]], then
    *  1. per-pixel integer gray = B+G+R (channel-order-free),
    *  2. 8×8 average pooling, integer cells = (sum·256) div count,
    *  3. integer 2D DCT-II ([[DctT]]),
    *  4. bit k = (AC coefficient k > median of the 63 ACs).
    * All arithmetic is exact integer, so both engines derive the
    * identical hash from the raw bytes. Returns None when the decoded
    * grid is narrower than the 8×8 pooling (w or h < 8): a sub-8-pixel
    * image has no meaningful 64-cell structure, and pooling would hit
    * empty cells.
    */
  /** ONE box-pooling walk shared by [[bmpPhash]] (gray, t=8) and
    * [[bmpThumb]] (color, any t): per-cell CHANNEL sums + pixel counts
    * over the container's bottom-up padded rows, logical pixel (x, y)
    * in cell (y·t div h, x·t div w) — a hardening fix to the walk can
    * never apply to one consumer and miss the other. None when the
    * image is narrower than t in either dimension (a box would be
    * empty).
    */
  private def boxSums(id: Long, bmp: Array[Byte],
      t: Int): Option[(Int, Int, Array[Array[Array[Long]]], Array[Array[Long]])] = {
    val (dataOffset, width, height, rowSize) = Bmp.header(id, bmp)
    if (width < t || height < t) None
    else {
      val sum = Array.ofDim[Long](t, t, 3)
      val cnt = Array.ofDim[Long](t, t)
      var y = 0
      while (y < height) {
        // file rows run bottom-up; y is the LOGICAL (top-down) row —
        // spatial position matters here, unlike parse's histogram
        val base = dataOffset + (height - 1 - y) * rowSize
        val i = y * t / height
        var x = 0
        while (x < width) {
          val j = x * t / width
          var c = 0
          while (c < 3) { sum(i)(j)(c) += (bmp(base + 3 * x + c) & 0xff); c += 1 }
          cnt(i)(j) += 1
          x += 1
        }
        y += 1
      }
      Some((width, height, sum, cnt))
    }
  }

  def bmpPhash(id: Long, bmp: Array[Byte]): Option[ImagePhash] = boxSums(id, bmp, 8).map {
    case (width, height, cellSum, cellCnt) =>
      // integer gray = B+G+R: the sum of the three channel sums
      val cell = Array.tabulate(8, 8)((i, j) =>
        (cellSum(i)(j)(0) + cellSum(i)(j)(1) + cellSum(i)(j)(2)) * 256 / cellCnt(i)(j))
      // 63 AC coefficients, k = u*8 + v - 1 (DC (0,0) skipped)
      val ac = new Array[Long](63)
      var u = 0
      while (u < 8) {
        var v = 0
        while (v < 8) {
          if (u != 0 || v != 0) {
            var c = 0L
            var i = 0
            while (i < 8) {
              var j = 0
              while (j < 8) { c += cell(i)(j) * DctT(u)(j) * DctT(v)(i); j += 1 }
              i += 1
            }
            ac(u * 8 + v - 1) = c
          }
          v += 1
        }
        u += 1
      }
      val sorted = ac.clone(); java.util.Arrays.sort(sorted)
      val med = sorted(31) // 32nd smallest of 63 = the median
      var hash = 0L
      var k = 0
      while (k < 63) { if (ac(k) > med) hash |= 1L << k; k += 1 }
      ImagePhash(id, width, height, hash)
  }

  /** Perceptual hashes for BMP payloads; sub-8×8 images drop (see
    * [[bmpPhash]]).
    */
  def decodePhashes(media: Dataset[MediaRow]): Dataset[ImagePhash] = {
    import media.sparkSession.implicits._
    media.mapPartitions(it => it.flatMap(m => bmpPhash(m.media_id, m.payload)))
  }

  /** Box-resize a REAL BMP payload to a t×t color thumbnail — the
    * image-preprocessing step a multimodal training pipeline runs before
    * feature extraction (pHash's pooling is its grayscale special case).
    * Same container walk as [[bmpPhash]] (bottom-up rows, 4-byte
    * stride); logical pixel (x, y) lands in cell (y·t div h, x·t div w),
    * so every cell is a contiguous box and the union tiles the image
    * exactly. All sums are integers; the per-channel average is one
    * exactly-rounded division — bit-identical cross-engine. Images
    * narrower than t in either dimension return no cells (a box would
    * be empty), mirroring [[bmpPhash]]'s sub-grid rule.
    */
  def bmpThumb(id: Long, bmp: Array[Byte], t: Int): Seq[ThumbCell] =
    boxSums(id, bmp, t) match {
      case None => Seq.empty
      case Some((width, height, sum, cnt)) =>
        for { i <- 0 until t; j <- 0 until t } yield ThumbCell(
          id, width, height, i, j, cnt(i)(j),
          sum(i)(j)(0).toDouble / cnt(i)(j),
          sum(i)(j)(1).toDouble / cnt(i)(j),
          sum(i)(j)(2).toDouble / cnt(i)(j))
    }

  /** t×t thumbnails for BMP payloads; sub-t×t images drop (see
    * [[bmpThumb]]). One mapPartitions pass, t² rows per image.
    */
  def decodeThumbs(media: Dataset[MediaRow], t: Int): Dataset[ThumbCell] = {
    import media.sparkSession.implicits._
    media.mapPartitions(it => it.flatMap(m => bmpThumb(m.media_id, m.payload, t)))
  }

  /** Wrap each payload in a real BMP container (same ingest-side
    * derivation rule as [[wrapAsWav]]).
    */
  def wrapAsBmp(media: Dataset[MediaRow]): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(it =>
      it.map(m => MediaRow(m.media_id, m.kind, Bmp.build(m.payload))))
  }

  /** Decode BMP payloads with the real parser. */
  def decodeBmps(media: Dataset[MediaRow]): Dataset[DecodedImage] = {
    import media.sparkSession.implicits._
    media.mapPartitions(it => it.map(m => Bmp.parse(m.media_id, m.payload)))
  }

  /** Wrap each payload in a real WAV container (ingest-side adapter:
    * testdata ships no binary tables, so the PCM track is the document
    * bytes — same derivation rule as [[mediaFromDocuments]]).
    */
  def wrapAsWav(media: Dataset[MediaRow], sampleRate: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(it =>
      it.map(m => MediaRow(m.media_id, m.kind, Wav.build(sampleRate, m.payload))))
  }

  /** Decode WAV payloads with the REAL parser — mapPartitions like every
    * decode stage (codec init amortized per partition).
    */
  def decodeWavs(media: Dataset[MediaRow]): Dataset[DecodedAudio] = {
    import media.sparkSession.implicits._
    media.mapPartitions(it => it.map(m => Wav.parse(m.media_id, m.payload)))
  }

  /** Segmental stats (ZCR + mean absolute delta) from real WAV payloads. */
  def decodeWavStats(media: Dataset[MediaRow]): Dataset[AudioStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions(it => it.map(m => Wav.parseStats(m.media_id, m.payload)))
  }

  // -----------------------------------------------------------------------
  /** Decode a batch of images. mapPartitions (not map) so a real codec
    * would init once per partition; the iterator is consumed lazily —
    * constant memory regardless of partition size.
    */
  def decodeImages(media: Dataset[MediaRow]): Dataset[DecodedImage] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition setup would go here (codec context, model session)
      it.map(m => Codecs.decodeImage(m.media_id, m.payload))
    }
  }

  /** Resize decoded images to a fixed target. */
  def resizeImages(imgs: Dataset[DecodedImage], w: Int, h: Int): Dataset[DecodedImage] = {
    import imgs.sparkSession.implicits._
    imgs.mapPartitions(it => it.map(Codecs.resize(_, w, h)))
  }

  /** Sample every `stride`-th fixed-size frame of each "video" payload.
    * flatMap keeps this a single map-side pass: no shuffle, output rows
    * stream out per input row (frame explosion never materializes a
    * whole video's frames in memory at once beyond one row's list).
    */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int, stride: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    require(frameBytes > 0 && stride > 0)
    media.flatMap { m =>
      val nFrames = (m.payload.length + frameBytes - 1) / frameBytes
      (0 until nFrames by stride).iterator.map { f =>
        val from = f * frameBytes
        val until = math.min(from + frameBytes, m.payload.length)
        Frame(m.media_id, f, java.util.Arrays.copyOfRange(m.payload, from, until))
      }
    }
  }

  /** Decode a batch of audio payloads. */
  def decodeAudios(media: Dataset[MediaRow]): Dataset[DecodedAudio] = {
    import media.sparkSession.implicits._
    media.mapPartitions(it => it.map(m => Codecs.decodeAudio(m.media_id, m.payload)))
  }

  // -----------------------------------------------------------------------
  /** The driver testdata ships no binary tables, so media rows are
    * derived deterministically from `documents`: payload = UTF-8 bytes
    * of the text, kind round-robins by doc_id. This is an adapter for
    * tests/queries, not a synthetic data generator — every byte comes
    * from the testdata.
    */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }
}
