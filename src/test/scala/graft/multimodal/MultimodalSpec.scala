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

  test("dHash: 64-bit, deterministic, map-side; re-encode noise lands nearby") {
    val hashes = Multimodal.dHash(media).as[(Long, Long)].collect().toMap
    assert(hashes.size == 67, "one hash per image")
    // map-side: payloads never shuffle to compute the fingerprint
    val plan = Multimodal.dHash(media).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    // a noisy variant (the lossy re-encode stand-in) stays within a
    // small Hamming radius of its source; unrelated images sit near 32
    val variants = Multimodal.noisyVariants(media, everyN = 50, delta = 64)
    val vh = Multimodal.dHash(variants).as[(Long, Long)].collect().toMap
    assert(vh.size == 67)
    val selfDists = hashes.map { case (id, h) =>
      java.lang.Long.bitCount(h ^ vh(id + 1000L)) }
    assert(selfDists.max <= 16,
      s"plants must stay within the verify radius, max=${selfDists.max}")
    val crossDists = for ((a, ha) <- hashes.toSeq.take(20);
        (b, hb) <- hashes if a != b) yield java.lang.Long.bitCount(ha ^ hb)
    assert(crossDists.sum.toDouble / crossDists.size > 24,
      "unrelated fake images must look random (mean Hamming near 32)")
  }

  test("noisyVariants: sparse formula-placed byte nudges, ids offset") {
    val v = Multimodal.noisyVariants(media, everyN = 50, delta = 64)
      .filter($"media_id" === 1000L).head()
    val orig = media.filter($"media_id" === 0L).head()
    assert(v.payload.length == orig.payload.length)
    val diffs = v.payload.zip(orig.payload).zipWithIndex
      .collect { case ((a, b), i) if a != b => i }
    assert(diffs.nonEmpty && diffs.forall(_ % 50 == 7), diffs.take(5).toSeq)
    assert(diffs.forall(i =>
      java.lang.Byte.toUnsignedInt(v.payload(i)) ==
        (java.lang.Byte.toUnsignedInt(orig.payload(i)) + 64) % 256))
    intercept[IllegalArgumentException](
      Multimodal.noisyVariants(media, everyN = 4, delta = 64))
    intercept[IllegalArgumentException](
      Multimodal.noisyVariants(media, everyN = 50, delta = 0))
  }
}
