package graft

import graft.ext.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: metadata derivation, stubbed feature decode
  * (deterministic, correct shape), frame-offset generator shape. */
class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private def media = Seq("hello world", "x").toDF("t")
    .select($"t", encode($"t", "UTF-8").as("media"))

  test("withMediaMeta: typed metadata columns from the binary payload") {
    val out = Multimodal.withMediaMeta(media, $"media", "image/png")
      .orderBy("media_len")
      .select($"mime", $"media_len", $"width", $"height", $"content_id")
      .as[(String, Long, Long, Long, String)].collect().toSeq
    assert(out(0) == (("image/png", 1L, 2L, 8L,
      out(0)._5))) // len 1 → width 1%64+1=2, height 7%64+1=8
    assert(out(1)._2 == 11L && out(1)._3 == 12L && out(1)._4 == 77L % 64 + 1)
    assert(out.map(_._5).distinct.size == 2 && out.forall(_._5.length == 16))
  }

  test("fakeFeatures: fixed dim, deterministic, bounded") {
    val f = media.select(Multimodal.fakeFeatures($"media", 8).as("f"))
      .as[Seq[Float]].collect().toSeq
    assert(f.forall(_.size == 8))
    assert(f.forall(_.forall(v => v >= -0.5f && v <= 0.5f)))
    val f2 = media.select(Multimodal.fakeFeatures($"media", 8).as("f"))
      .as[Seq[Float]].collect().toSeq
    assert(f == f2)
    assert(f(0) != f(1)) // different payloads → different vectors
  }

  test("frameOffsets: one offset per stride step") {
    val out = media.select(Multimodal.frameOffsets($"media", 4).as("o"))
      .orderBy(size($"o"))
      .as[Seq[Long]].collect().toSeq
    assert(out(0) == Seq(0L)) // 1-byte payload
    assert(out(1) == Seq(0L, 4L, 8L)) // 11 bytes, stride 4
  }
}
