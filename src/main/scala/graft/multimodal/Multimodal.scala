package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: media travels as an opaque `binary` column with a typed
  * metadata struct alongside; decode / feature-extraction / resize /
  * frame-sampling run distributed via `mapPartitions` over typed
  * Datasets (the JVM analogue of arrow-batched python UDFs — one
  * iterator per partition, no per-row serialization overhead, no
  * driver involvement).
  *
  * REAL here (and tested): the schema contract, binaryFile ingest,
  * partition-wise batch plumbing, feature vectors feeding the
  * Similarity operators.
  *
  * STUBBED here (clearly marked): the actual media codec. This
  * container has no image/audio libraries, so `Codec` implements a
  * deterministic synthetic "GRFT" format — a real decoder (JNI
  * image lib, ffmpeg pipe) would slot in behind the same signatures.
  */
object Multimodal {

  /** Typed metadata extracted from a media payload. */
  case class MediaMeta(width: Int, height: Int, channels: Int,
                       nBytes: Long, format: String)

  case class MediaRecord(media_id: Long, content: Array[Byte])
  case class DecodedRecord(media_id: Long, meta: MediaMeta)
  case class FeatureRecord(media_id: Long, features: Array[Float])
  case class FrameRecord(media_id: Long, frame_idx: Int, frame: Array[Byte])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("content", BinaryType)))

  /** STUB codec for the synthetic GRFT format:
    * magic "GRFT" | width i32 LE | height i32 LE | channels u8 | payload.
    * Deterministic by construction — stands in for a real image codec. */
  object Codec {
    val Magic: Array[Byte] = "GRFT".getBytes

    def encode(width: Int, height: Int, channels: Int, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(13 + payload.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(Magic).putInt(width).putInt(height).put(channels.toByte).put(payload)
      bb.array()
    }

    def decodeMeta(bytes: Array[Byte]): Option[MediaMeta] = {
      if (bytes.length < 13 || !bytes.take(4).sameElements(Magic)) return None
      val bb = java.nio.ByteBuffer.wrap(bytes, 4, 9).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      Some(MediaMeta(bb.getInt, bb.getInt, bb.get & 0xff, bytes.length.toLong, "grft"))
    }

    def payload(bytes: Array[Byte]): Array[Byte] = bytes.drop(13)

    /** STUB "resize": keeps every (factor)-th payload byte and
      * rewrites the header — placeholder for real resampling. */
    def resize(bytes: Array[Byte], factor: Int): Option[Array[Byte]] =
      decodeMeta(bytes).map { m =>
        val p = payload(bytes)
        encode(math.max(m.width / factor, 1), math.max(m.height / factor, 1),
          m.channels, p.indices.collect { case i if i % factor == 0 => p(i) }.toArray)
      }
  }

  /** Open a directory of media files as (path, content) — Spark's
    * binaryFile source: each file is one row, read on executors. */
  def readBinaryDir(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile").load(dir)
      .select(col("path"), col("content"))

  /** Decode typed metadata, partition-wise (invalid payloads drop —
    * make failures explicit downstream by anti-joining ids). */
  def decodeMeta(ds: Dataset[MediaRecord]): Dataset[DecodedRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(r =>
      Codec.decodeMeta(r.content).map(m => DecodedRecord(r.media_id, m))))
  }

  /** Feature extraction: 16-bin byte histogram over the payload,
    * L1-normalized — a deterministic stand-in for an embedding model.
    * Output plugs directly into graft.operators.Similarity. */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[FeatureRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      val p = Codec.payload(r.content)
      val hist = new Array[Float](16)
      var i = 0
      while (i < p.length) { hist((p(i) & 0xff) / 16) += 1f; i += 1 }
      val total = math.max(p.length, 1).toFloat
      FeatureRecord(r.media_id, hist.map(_ / total))
    })
  }

  /** Frame sampling for "video" payloads: split the payload into
    * fixed-size frames and keep every `stride`-th — flatMap shape,
    * one output row per kept frame. */
  def sampleFrames(ds: Dataset[MediaRecord], frameBytes: Int, stride: Int): Dataset[FrameRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap { r =>
      val p = Codec.payload(r.content)
      p.grouped(frameBytes).zipWithIndex.collect {
        case (frame, idx) if idx % stride == 0 => FrameRecord(r.media_id, idx, frame)
      }
    })
  }

  /** Distributed stub-resize over the binary column. */
  def resizeAll(ds: Dataset[MediaRecord], factor: Int): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(r =>
      Codec.resize(r.content, factor).map(b => MediaRecord(r.media_id, b))))
  }
}
