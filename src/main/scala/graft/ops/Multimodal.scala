package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (builder brief): image/audio/video as opaque
  * `binary` columns with typed metadata. The Spark-side mechanics — schema,
  * partition sizing, batched per-partition processing shape — are real and
  * tested; the actual codec work is STUBBED behind `MediaCodec` with a
  * deterministic fake (no image/audio libs in this container). On a real
  * cluster, swap `DeterministicFakeCodec` for a JNI/FFI decoder with the
  * same trait — the plan shape does not change.
  */
object Multimodal {

  /** Typed media row: payload + metadata travelling with it. */
  case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte],
      source_url: String)

  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int, feature: Array[Float])

  /** Codec boundary: this is the swap-in point for real decoders. */
  trait MediaCodec extends Serializable {
    def decode(kind: String, payload: Array[Byte]): (Int, Int, Int) // w, h, frames
    def features(payload: Array[Byte], dim: Int): Array[Float]
  }

  /** Deterministic fake: "dimensions" and "features" derived from payload
    * bytes via a splitmix-style hash — stable across runs, no native deps.
    * A real implementation would call the actual codec here (`???` spot). */
  object DeterministicFakeCodec extends MediaCodec {
    private def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    private def payloadSeed(p: Array[Byte]): Long = {
      var h = 1125899906842597L
      var i = 0
      while (i < p.length) { h = 31 * h + p(i); i += 1 }
      h
    }
    override def decode(kind: String, payload: Array[Byte]): (Int, Int, Int) = {
      val s = payloadSeed(payload)
      val w = 64 + (mix(s) & 0x3FF).toInt         // 64..1087 "pixels"
      val h = 64 + (mix(s + 1) & 0x3FF).toInt
      val frames = kind match {
        case "video" => 1 + (mix(s + 2) & 0xFF).toInt
        case _ => 1
      }
      (w, h, frames)
      // real codec: ??? (e.g. javacv / ffmpeg FFI) — same return shape
    }
    override def features(payload: Array[Byte], dim: Int): Array[Float] = {
      val s = payloadSeed(payload)
      Array.tabulate(dim)(i => ((mix(s + 10 + i) & 0xFFFF).toInt / 65535.0f) - 0.5f)
    }
  }

  /** Batched per-partition decode + featurize — the Scala analogue of a
    * `mapInPandas` batch UDF: one codec instance per partition, rows
    * streamed through it, output schema fixed up front. Partition sizing is
    * the caller's lever (`repartition(n)` before calling; payload-heavy
    * tables want many small partitions to bound memory). */
  def decodeAndFeaturize(media: Dataset[MediaRecord], featureDim: Int = 16,
      codec: MediaCodec = DeterministicFakeCodec): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, f) = codec.decode(r.kind, r.payload)
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, w, h, f,
          codec.features(r.payload, featureDim))
      }
    }
  }

  /** Frame-sampling plan for video rows: one output row per sampled frame
    * index (every `stride`-th frame) — the explode-shaped operator a real
    * frame extractor plugs into. */
  def sampleFrames(features: Dataset[MediaFeatures], stride: Int): DataFrame =
    features.toDF()
      .where(col("kind") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)), lit(stride))))
      .select(col("media_id"), col("frame_idx"), col("width"), col("height"))

  /** Deterministic synthetic media table for tests/benches. */
  def syntheticMedia(spark: org.apache.spark.sql.SparkSession, n: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(n.toLong).select(
      col("id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        pmod(col("id"), lit(3)).cast("int") + 1).as("kind"),
      // payload: deterministic pseudo-bytes of varying length
      sha2(concat(lit("payload:"), col("id")), 512).cast("binary").as("payload"),
      concat(lit("https://media.example.com/"), col("id")).as("source_url"))
      .as[MediaRecord]
  }
}
