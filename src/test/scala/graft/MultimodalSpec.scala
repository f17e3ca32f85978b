package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** M5 multimodal plumbing: binary payload + metadata schema, per-partition
  * batch feature extraction (decode stubbed deterministically), failure
  * isolation, frame sampling.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.asMultimodal(
    Seq((1L, "web", "hello world"), (2L, "web", "abc"))
      .toDF("doc_id", "source", "text"))

  test("asMultimodal: binary payload + typed metadata struct") {
    val m = media
    assert(m.schema("payload").dataType.typeName == "binary")
    val meta = m.filter(col("media_id") === 1L)
      .select("meta.mime", "meta.n_bytes", "meta.origin")
      .as[(String, Long, String)].head()
    assert(meta == ("application/octet-stream", 11L, "web"))
  }

  test("extractFeatures: deterministic stub features + md5 over payload") {
    val f = Multimodal.extractFeatures(media).orderBy("media_id")
      .select("media_id", "n_bytes", "width", "height", "n_frames")
      .as[(Long, Long, Int, Int, Int)].collect().toSeq
    assert(f == Seq(
      (1L, 11L, 11, 77, 12), // len 11: w=11%640, h=77%480, frames=11%16+1
      (2L, 3L, 3, 21, 4)))
  }

  test("decoder failure yields null features, not task failure") {
    val out = Multimodal.extractFeatures(media, Multimodal.Decoder.Native)
      .orderBy("media_id")
    assert(out.count() == 2)
    assert(out.filter(col("width").isNull).count() == 2)
    // payload md5 still computed
    assert(out.filter(col("payload_md5").isNull).count() == 0)
  }

  test("resizeMeta: aspect-preserving fit, passthrough when already small") {
    val feats = Seq(
      (1L, 640, 480), // landscape, shrink to 320x240
      (2L, 100, 100), // already fits: passthrough
      (3L, 200, 480), // portrait: bind height
      (4L, 0, 400) // degenerate zero width
    ).toDF("media_id", "width", "height")
    val out = Multimodal.resizeMeta(feats, 320, 240).orderBy("media_id")
      .select("out_w", "out_h").as[(Int, Int)].collect().toSeq
    assert(out == Seq((320, 240), (100, 100), (100, 240), (0, 240)))
  }

  test("sampleFrames: every stride-th frame index per media row") {
    val frames = Multimodal.sampleFrames(
      Multimodal.extractFeatures(media), stride = 4)
      .filter(col("media_id") === 1L)
      .select("frame_idx").as[Int].collect().toSeq
    assert(frames == Seq(0, 4, 8)) // 12 frames, stride 4
  }
}
