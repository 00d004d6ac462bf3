package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque BINARY payloads plus typed metadata, with decode /
  * feature-extract / resize / frame-sample as *batched partition-level
  * transforms* (`Dataset.mapPartitions` — the Scala/JVM counterpart of
  * Python's `mapInPandas`: one task per partition, rows processed in
  * bounded batches, codec state amortized per batch).
  *
  * The actual codecs are STUBBED (this container has no image/audio
  * libraries): `StubCodecs` derives deterministic fake pixels/samples
  * from the payload bytes, clearly marked for replacement. Everything
  * the pipeline depends on — schema, partitioning, signatures, batch
  * shape — is real and tested.
  *
  * 100 TB posture: payloads never pass through a shuffle — feature
  * extraction is map-side on the scan partitioning; only the small
  * feature/metadata outputs shuffle (e.g. for the embedding-dedup join
  * downstream). Repartition by byte size, not row count, before heavy
  * decode so a task's batch fits executor memory.
  */
final case class MediaFile(media_id: Long, kind: String, mime: String,
    payload: Array[Byte], width: Int, height: Int, n_frames: Int)

final case class ImageFeatures(media_id: Long, width: Int, height: Int,
    mean_luma: Double, embedding: Array[Float])

final case class Frame(media_id: Long, frame_idx: Int, payload: Array[Byte])

final case class AudioChunk(media_id: Long, chunk_idx: Int, n_samples: Long,
    energy: Long, peak: Long)

/** Deterministic stand-ins for real codecs. Replace `decodeImage` with
  * an actual decoder (e.g. TwelveMonkeys/javax.imageio) in production —
  * the call sites and shapes stay identical.
  */
object StubCodecs {
  /** STUB — fake H×W luma plane derived from payload bytes. */
  def decodeImage(payload: Array[Byte], w: Int, h: Int): Array[Array[Int]] =
    Array.tabulate(h, w)((y, x) =>
      java.lang.Byte.toUnsignedInt(payload((y * w + x) % payload.length)))

  /** STUB — nearest-neighbor resize on the fake plane (the arithmetic
    * is the real algorithm; only the pixels are fake).
    */
  def resize(img: Array[Array[Int]], newW: Int, newH: Int): Array[Array[Int]] = {
    val (h, w) = (img.length, img.head.length)
    Array.tabulate(newH, newW)((y, x) => img(y * h / newH)(x * w / newW))
  }

  /** STUB — byte span of frame i inside a fake video payload. */
  def frameBytes(payload: Array[Byte], i: Int, n: Int): Array[Byte] = {
    val span = math.max(1, payload.length / n)
    payload.slice(i * span, math.min((i + 1) * span, payload.length))
  }

  /** STUB — payload bytes as unsigned 8-bit PCM samples. Replace with a
    * real decoder (javax.sound / ffmpeg bindings) in production.
    */
  def decodeAudio(payload: Array[Byte]): Array[Int] =
    payload.map(java.lang.Byte.toUnsignedInt)
}

object Multimodal {

  /** Bounded batch size for partition-level processing (the `mapInPandas`
    * arrow-batch analog): decode state is amortized per batch and memory
    * stays bounded regardless of partition size.
    */
  val BatchSize = 64

  /** Deterministic synthetic media corpus — the test fixture standing in
    * for real files. Payload byte 16k+j is byte j of
    * `md5("media:<id>:<k>")`, NOT a JVM-seeded PRNG stream: md5 is
    * re-derivable in any engine (`('0x'||substr(md5(...),2j+1,2))::INT`
    * in DuckDB), so features computed from these payloads (mean
    * luminance etc.) get full value-level oracle rows instead of
    * rows-only checks — the same trick that made the v6 RP hyperplanes
    * oracle-expressible.
    */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaFile] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val (w, h) = (16 + (i % 8).toInt * 4, 16 + (i % 5).toInt * 4)
      val kind = if (i % 3 == 2) "video" else "image"
      val frames = if (kind == "video") 8 else 1
      val len = w * h * frames
      val md = java.security.MessageDigest.getInstance("MD5")
      val bytes = new Array[Byte](len)
      var k = 0
      while (k * 16 < len) {
        val d = md.digest(s"media:$i:$k".getBytes("UTF-8"))
        var j = 0
        while (j < 16 && k * 16 + j < len) { bytes(k * 16 + j) = d(j); j += 1 }
        k += 1
      }
      MediaFile(i, kind, if (kind == "video") "video/fake" else "image/fake",
        bytes, w, h, frames)
    }
  }

  /** Deterministic synthetic AUDIO corpus — same md5 payload scheme as
    * [[syntheticMedia]] (byte 16k+j of clip i is byte j of
    * `md5("audio:<i>:<k>")`), so sample-level features re-derive in a
    * SQL oracle. Clip length is 2048 + (i % 4) · 512 samples.
    */
  def syntheticAudio(spark: SparkSession, n: Int): Dataset[MediaFile] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val len = 2048 + (i % 4).toInt * 512
      val md = java.security.MessageDigest.getInstance("MD5")
      val bytes = new Array[Byte](len)
      var k = 0
      while (k * 16 < len) {
        val d = md.digest(s"audio:$i:$k".getBytes("UTF-8"))
        var j = 0
        while (j < 16 && k * 16 + j < len) { bytes(k * 16 + j) = d(j); j += 1 }
        k += 1
      }
      MediaFile(i, "audio", "audio/fake", bytes, 0, 0, 1)
    }
  }

  /** Per-chunk audio stats, batched per partition: each `chunk`-sample
    * window of the (stub-decoded) unsigned-8-bit PCM stream emits its
    * signal energy Σ(s−128)² and peak |s−128| — the VAD/loudness
    * pre-filter shape of audio curation. ALL-INTEGER outputs: unlike
    * m1/m2's rounded double means, energy and peak carry zero FP noise,
    * so the feature extraction oracle-checks without any rounding.
    */
  def audioChunkStats(media: Dataset[MediaFile], chunk: Int): Dataset[AudioChunk] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio").mapPartitions { it =>
      it.grouped(BatchSize).flatMap(_.flatMap { m =>
        StubCodecs.decodeAudio(m.payload).grouped(chunk).zipWithIndex.map {
          case (c, idx) =>
            var e = 0L
            var p = 0
            c.foreach { s =>
              val d = s - 128
              e += d.toLong * d
              if (math.abs(d) > p) p = math.abs(d)
            }
            AudioChunk(m.media_id, idx, c.length.toLong, e, p.toLong)
        }
      })
    }
  }

  /** Decode + feature-extract, batched per partition: mean luminance and
    * a 16-dim pooled-patch embedding per image.
    */
  def imageFeatures(media: Dataset[MediaFile]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch => // bounded batch shape
        batch.map { m =>
          val img = StubCodecs.decodeImage(m.payload, m.width, m.height)
          val pooled = StubCodecs.resize(img, 4, 4)
          ImageFeatures(m.media_id, m.width, m.height,
            img.map(_.sum.toDouble).sum / (m.width * m.height),
            pooled.flatten.map(_ / 255.0f))
        }
      }
    }
  }

  /** Resize every image to a fixed thumbnail, re-encoding the (fake)
    * plane back into a payload column.
    */
  def thumbnails(media: Dataset[MediaFile], w: Int, h: Int): Dataset[MediaFile] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions { it =>
      it.grouped(BatchSize).flatMap(_.map { m =>
        val resized = StubCodecs.resize(
          StubCodecs.decodeImage(m.payload, m.width, m.height), w, h)
        m.copy(payload = resized.flatten.map(_.toByte), width = w, height = h)
      })
    }
  }

  /** Deterministic "lossy re-encode" stand-in: a copy of each media row
    * whose payload differs in a sparse, formula-placed set of bytes —
    * position `p ≡ 7 (mod everyN)` becomes `(byte + delta) mod 256` —
    * with `idOffset` added to the id. This is the near-dup PLANT for
    * perceptual-hash testing: a real pipeline meets the same shape as
    * JPEG re-compression artifacts (most pixels identical, a scattered
    * few nudged), and the formula placement keeps the variant
    * md5-re-derivable in a SQL oracle, exactly like the base corpus.
    * CALLER CONTRACT: `idOffset` must exceed the corpus's max media_id
    * or variant ids silently collide with originals (not checkable
    * here without an action over the corpus).
    */
  def noisyVariants(media: Dataset[MediaFile], everyN: Int, delta: Int,
      idOffset: Long = 1000L): Dataset[MediaFile] = {
    require(everyN >= 8, s"everyN must be >= 8 (phase 7 placement), got $everyN")
    require(delta >= 1 && delta <= 255, s"delta must be 1..255, got $delta")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap(_.map { m =>
        val p = m.payload.clone()
        var i = 7
        while (i < p.length) {
          p(i) = ((java.lang.Byte.toUnsignedInt(p(i)) + delta) % 256).toByte
          i += everyN
        }
        m.copy(media_id = m.media_id + idOffset, payload = p)
      })
    }
  }

  /** Difference hash (dHash) per image — the perceptual fingerprint of
    * image dedup pipelines: decode, nearest-neighbor-resize to 9×8
    * (the real algorithm; only the stub pixels are fake), then one bit
    * per adjacent-pixel comparison (`bit (y,x) = 1 iff p(y,x) >
    * p(y,x+1)`, index `y·8+x`) packed into a 64-bit BIGINT. Re-encoding
    * noise nudges a few pixels → a few bits; unrelated images differ in
    * ~32 — so near-dups live at small Hamming distance, which is what
    * makes the hash LSH-bandable (16-bit bands → equi-join candidates,
    * the [[graft.operators.Dedup.candidatePairs]] discipline — an
    * intact band survives up to 3 scattered bit flips with certainty
    * and most 4+ splits too). All integer, so the
    * whole hash re-derives in a SQL oracle. Map-side work fused over
    * the scan partitioning: payloads never shuffle; only the 8-byte
    * hashes do.
    */
  def dHash(media: Dataset[MediaFile]): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions { it =>
      it.grouped(BatchSize).flatMap(_.map { m =>
        val r = StubCodecs.resize(
          StubCodecs.decodeImage(m.payload, m.width, m.height), 9, 8)
        var hash = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            if (r(y)(x) > r(y)(x + 1)) hash |= 1L << (y * 8 + x)
            x += 1
          }
          y += 1
        }
        (m.media_id, hash)
      })
    }.toDF("media_id", "dhash")
  }

  /** Sample every `stride`-th frame of each video into its own row —
    * the row-explosion shape of video pipelines (one payload in, many
    * smaller payloads out; output partition count follows input).
    */
  def sampleFrames(media: Dataset[MediaFile], stride: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      (0 until m.n_frames by stride).map(i =>
        Frame(m.media_id, i, StubCodecs.frameBytes(m.payload, i, m.n_frames)))
    }
  }
}
