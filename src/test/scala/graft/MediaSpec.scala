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

  test("resize updates metadata everywhere and re-encodes image payloads") {
    val media = Media.ingestFromDocuments(spark, TestSpark.sfDir)
    val resized = Media.resize(media, 32, 32).collect()
    assert(resized.forall(m => m.meta.width == 32 && m.meta.height == 32))
    assert(resized.forall(m => m.payload.nonEmpty))
    // image payloads are REAL PNGs at the new dimensions
    resized.filter(_.meta.media_type == "image").take(10).foreach { m =>
      val img = Media.ImageCodec.decode(m.payload)
      assert(img.isDefined)
      assert(img.get.getWidth == 32 && img.get.getHeight == 32)
    }
  }

  test("ImageCodec: PNG encode→decode roundtrips pixels exactly") {
    val bytes = "the quick brown fox jumps over the lazy dog".getBytes("UTF-8")
    val img = Media.ImageCodec.imageFromBytes(bytes, 16)
    val png = Media.ImageCodec.encodePng(img)
    // PNG magic
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    val back = Media.ImageCodec.decode(png).get
    assert(back.getWidth == 16 && back.getHeight == 16)
    for (y <- 0 until 16; x <- 0 until 16)
      assert((back.getRGB(x, y) & 0xffffff) == (img.getRGB(x, y) & 0xffffff))
    // luminance features are a distribution with in-range mean
    val (hist, mean) = Media.ImageCodec.luminance(back)
    assert(math.abs(hist.sum - 1.0) < 1e-9)
    assert(mean >= 0 && mean <= 255)
  }

  test("AudioCodec: WAV encode→decode roundtrips samples exactly") {
    val bytes = "pack my box with five dozen liquor jugs".getBytes("UTF-8")
    val samples = Media.AudioCodec.samplesFromBytes(bytes)
    val wav = Media.AudioCodec.encodeWav(samples, 16000)
    // RIFF/WAVE magic
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val (back, rate) = Media.AudioCodec.decode(wav).get
    assert(rate == 16000)
    assert(back.sameElements(samples))
    val (hist, rms) = Media.AudioCodec.energy(back)
    assert(math.abs(hist.sum - 1.0) < 1e-9)
    assert(rms > 0 && rms <= 255)
  }

  test("audio features come from the real decoder, not the byte stub") {
    val media = Media.ingestFromDocuments(spark, TestSpark.sfDir)
    val aud = media.filter(_.meta.media_type == "audio").head()
    val (samples, _) = Media.AudioCodec.decode(aud.payload).get
    val (expectedHist, expectedRms) = Media.AudioCodec.energy(samples)
    val feat = Media.extractFeatures(media)
      .filter(_.media_id == aud.media_id).head()
    assert(feat.brightness == expectedRms)
    assert(feat.histogram.sameElements(expectedHist))
  }

  test("image features come from the real decoder, not the byte stub") {
    val media = Media.ingestFromDocuments(spark, TestSpark.sfDir)
    val img = media.filter(_.meta.media_type == "image").head()
    // stub on the PNG bytes would include header/compression noise; the
    // real path must equal luminance measured on the decoded pixels
    val decoded = Media.ImageCodec.decode(img.payload).get
    val (expectedHist, expectedMean) = Media.ImageCodec.luminance(decoded)
    val feat = Media.extractFeatures(media)
      .filter(_.media_id == img.media_id).head()
    assert(feat.brightness == expectedMean)
    assert(feat.histogram.sameElements(expectedHist))
    val (_, stubMean) = Media.StubCodec.decode(img.payload)
    assert(feat.brightness != stubMean)
  }
}
