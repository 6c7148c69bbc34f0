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
      Asset(1L, "image", "abc".getBytes, Some(64), Some(64), None, Some("fake")),
      Asset(2L, "video", "defg".getBytes, None, None, Some(5000L), Some("fake")),
      Asset(3L, "audio", null, None, None, Some(1000L), None)
    ).toDS()
    val out = Multimodal.extractFeatures(spark, assets).collect()
      .map(a => a.asset_id -> a).toMap
    assert(out.size == 3)
    assert(out(1L).n_bytes == 3 && out(1L).feature.length == 8)
    assert(out(2L).n_frames_sampled == 5)
    assert(out(3L).n_bytes == 0) // null payload handled
  }

  test("synthetic fixture assets flow through the full path") {
    val ds = Multimodal.syntheticAssets(spark, "/root/testdata/sf0.001")
    val out = Multimodal.extractFeatures(spark, ds)
    assert(out.count() > 0)
    assert(out.head().feature.length == 8)
  }
}
