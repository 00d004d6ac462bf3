package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.syntheticMedia(spark, 100).cache()

  test("schema: binary payload + typed metadata survive the round trip") {
    val schema = media.toDF().schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("media_id").dataType.typeName == "long")
    assert(media.count() == 100)
    assert(media.filter($"kind" === "video").count() == 33)
  }

  test("image features: deterministic, bounded, one row per image") {
    val feats = Multimodal.imageFeatures(media)
    val rows = feats.collect()
    assert(rows.length == 67)
    assert(rows.forall(_.embedding.length == 16))
    assert(rows.forall(f => f.mean_luma >= 0 && f.mean_luma <= 255))
    // deterministic: same input -> same features
    val again = Multimodal.imageFeatures(media).collect()
    assert(rows.sortBy(_.media_id).zip(again.sortBy(_.media_id))
      .forall { case (a, b) => a == b || a.embedding.sameElements(b.embedding) })
  }

  test("thumbnails: fixed dims, payload re-encoded to the new size") {
    val thumbs = Multimodal.thumbnails(media, 8, 8).collect()
    assert(thumbs.forall(t => t.width == 8 && t.height == 8))
    assert(thumbs.forall(_.payload.length == 64))
  }

  test("frame sampling explodes videos into per-frame rows") {
    val frames = Multimodal.sampleFrames(media, stride = 2)
    assert(frames.count() == 33 * 4) // 8 frames, stride 2 -> 4 per video
    val perVideo = frames.groupBy("media_id").count()
    assert(perVideo.filter($"count" =!= 4).count() == 0)
    assert(frames.filter(length($"payload") === 0).count() == 0)
  }

  test("feature extraction is map-side: no shuffle in the plan") {
    val plan = Multimodal.imageFeatures(media).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
