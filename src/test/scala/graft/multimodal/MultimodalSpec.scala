package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.multimodal.MediaOps._
import graft.queries.LlmMultimodal
import graft.util.Tables.load

/** Pins the Spark-side plumbing of the multimodal operators (schema,
  * batch shape, partition behavior) and the deterministic stub-codec
  * math on driver testdata at sf0.001.
  */
class MultimodalSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def media = MediaOps.mediaFromDocuments(spark, load(spark, dir, "documents"))

  test("media adapter partitions every document into exactly one kind") {
    val byKind = media.groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKind.keySet == Set("image", "audio", "video"))
    assert(byKind.values.sum == load(spark, dir, "documents").count())
  }

  test("image decode is deterministic, dims cover the payload, histogram sums to 1") {
    val imgs = decodeImages(media.filter(col("kind") === "image")).collect()
    assert(imgs.nonEmpty)
    imgs.foreach { img =>
      assert(img.width.toLong * img.height >= img.n_bytes)
      assert((img.width - 1).toLong * img.height < img.n_bytes)
      assert(img.channels == 3)
      assert(math.abs(img.features.sum - 1.0) < 1e-9)
      assert(img.features.forall(f => f >= 0.0 && f <= 1.0))
    }
    // determinism: second run bit-identical
    val again = decodeImages(media.filter(col("kind") === "image")).collect()
    assert(imgs.map(_.media_id).sorted.sameElements(again.map(_.media_id).sorted))
    val a = imgs.sortBy(_.media_id); val b = again.sortBy(_.media_id)
    a.zip(b).foreach { case (x, y) =>
      assert(x == y.copy(features = x.features) && x.features.sameElements(y.features))
    }
  }

  test("resize rescales metadata and keeps the scale-invariant features") {
    val imgs = decodeImages(media.filter(col("kind") === "image"))
    val resized = resizeImages(imgs, 224, 224).collect()
    resized.foreach { img =>
      assert(img.width == 224 && img.height == 224)
      assert(math.abs(img.features.sum - 1.0) < 1e-9)
    }
  }

  test("frame sampling emits every stride-th 64-byte frame with exact coverage") {
    val vids = media.filter(col("kind") === "video")
    val frames = sampleFrames(vids, frameBytes = 64, stride = 4).collect()
    val byMedia = frames.groupBy(_.media_id)
    val sizes = vids.collect().map(m => m.media_id -> m.payload.length).toMap
    assert(byMedia.keySet == sizes.keySet.filter(id => sizes(id) > 0))
    byMedia.foreach { case (id, fs) =>
      val n = sizes(id)
      val nf = (n + 63) / 64
      assert(fs.length == (nf + 3) / 4)
      assert(fs.map(_.frame_idx).sorted.toSeq == (0 until nf by 4).toSeq)
      fs.foreach { f =>
        val expect = math.min(64, n - f.frame_idx * 64)
        assert(f.frame_bytes.length == expect)
      }
    }
  }

  test("audio decode: n_samples = byte length, rms in (0, 1]") {
    val auds = decodeAudios(media.filter(col("kind") === "audio")).collect()
    assert(auds.nonEmpty)
    auds.foreach { a =>
      assert(a.sample_rate == 16000)
      assert(a.n_samples > 0)
      assert(a.rms > 0.0 && a.rms <= 1.0)
    }
  }

  test("qm03 query returns one row per audio media") {
    val rows = LlmMultimodal.qm03.fn(spark, dir).collect()
    val expected = media.filter(col("kind") === "audio").count()
    assert(rows.length.toLong == expected)
  }
}
