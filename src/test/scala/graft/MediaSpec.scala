package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Media

class MediaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("ingest → features: schema, determinism, histogram sanity") {
    val media = Media.ingestFromDocuments(spark, TestSpark.sfDir)
    val feats = Media.extractFeatures(media)
    assert(feats.schema.fieldNames.toSet ==
      Set("media_id", "media_type", "n_bytes", "histogram", "brightness"))
    val rows = feats.collect()
    assert(rows.length == 500)
    // histogram is a distribution
    rows.take(20).foreach { f =>
      assert(math.abs(f.histogram.sum - 1.0) < 1e-9)
      assert(f.brightness > 0 && f.brightness < 255)
    }
    // deterministic across runs
    val again = Media.extractFeatures(media).collect()
    assert(rows.map(_.brightness).sorted.sameElements(again.map(_.brightness).sorted))
  }

  test("frame sampling covers video payloads with the right stride") {
    val media = Media.ingestFromDocuments(spark, TestSpark.sfDir)
    val frames = Media.sampleFrames(media, frameSize = 64, stride = 32).collect()
    assert(frames.nonEmpty)
    frames.groupBy(_.media_id).foreach { case (_, fs) =>
      val sorted = fs.sortBy(_.frame_no)
      sorted.zipWithIndex.foreach { case (f, i) =>
        assert(f.frame_no == i)
        assert(f.offset == i * 32)
        assert(f.frame_bytes.length <= 64)
      }
    }
  }

  test("resize only touches metadata") {
    val media = Media.ingestFromDocuments(spark, TestSpark.sfDir)
    val resized = Media.resize(media, 32, 32).collect()
    assert(resized.forall(m => m.meta.width == 32 && m.meta.height == 32))
    assert(resized.forall(m => m.payload.nonEmpty))
  }
}
