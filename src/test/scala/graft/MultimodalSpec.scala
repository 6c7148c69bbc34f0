package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{Asset, FakeCodec}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("stub codec is deterministic and shape-stable") {
    val f1 = FakeCodec.features("hello world".getBytes("UTF-8"))
    val f2 = FakeCodec.features("hello world".getBytes("UTF-8"))
    assert(f1.toSeq == f2.toSeq)
    assert(f1.length == 8)
    assert(f1.forall(v => v >= 0.0f && v < 1.0f))
  }

  test("frame sampling: one frame per second, capped") {
    assert(FakeCodec.sampleFrames(Some(3500L)) == 3)
    assert(FakeCodec.sampleFrames(Some(500L)) == 1)   // floor at 1
    assert(FakeCodec.sampleFrames(Some(60000L)) == 8) // cap
    assert(FakeCodec.sampleFrames(None) == 1)
  }

  test("batched extraction plumbing: schema, null payloads, counts") {
    val assets = Seq(
      // non-PNG image bytes: the real decode declines, the stub covers it
      Asset(1L, "image", "abc".getBytes, Some(64), Some(64), None, Some("fake")),
      Asset(2L, "video", "defg".getBytes, None, None, Some(5000L), Some("fake")),
      Asset(3L, "audio", null, None, None, Some(1000L), None)
    ).toDS()
    val out = Multimodal.extractFeatures(spark, assets).collect()
      .map(a => a.asset_id -> a).toMap
    assert(out.size == 3)
    assert(out(1L).n_bytes == 3 && out(1L).feature.length == 8)
    assert(out(1L).decoded_width.isEmpty) // undecodable → stub, no dims
    assert(out(2L).n_frames_sampled == 5)
    assert(out(3L).n_bytes == 0) // null payload handled
  }

  test("real image codec: PNG encode→decode roundtrip is exact") {
    import Multimodal.ImageCodec
    val png = ImageCodec.syntheticPng(42L)
    assert(png.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte,
      'G'.toByte), "payload must be a genuine PNG stream")
    val d = ImageCodec.decode(png).get
    assert(d.width == 8 && d.height == 8 && d.nPx == 64)
    // the decoded checksum equals the generating formula exactly
    val expected = (for { y <- 0 until 8; x <- 0 until 8 }
      yield ((42L % 256) * 31 + x * 7 + y * 13) % 256).sum
    assert(d.pxSum == expected)
    // non-images decline instead of throwing
    assert(ImageCodec.decode("not an image".getBytes).isEmpty)
    assert(ImageCodec.decode(Array.emptyByteArray).isEmpty)
  }

  test("synthetic fixture assets flow through the full path, images real") {
    val ds = Multimodal.syntheticAssets(spark, "/root/testdata/sf0.001")
    val out = Multimodal.extractFeatures(spark, ds).collect()
    assert(out.nonEmpty)
    val images = out.filter(_.media_type == "image")
    val rest = out.filter(_.media_type != "image")
    // every image asset took the REAL decode path: dims from the decoder,
    // feature = the 1-dim channel mean
    assert(images.nonEmpty)
    assert(images.forall(a => a.decoded_width.contains(8) &&
      a.decoded_height.contains(8) && a.feature.length == 1 &&
      a.n_frames_sampled == 1))
    // audio/video stay on the stub: 8-dim fake features, no decoded dims
    assert(rest.nonEmpty && rest.forall(a =>
      a.feature.length == 8 && a.decoded_width.isEmpty))
  }
}
