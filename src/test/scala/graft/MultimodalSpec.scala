package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal._
import graft.operators.Similarity

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic synthetic corpus: payload derived from the id. */
  private def corpus(n: Int) = spark.range(n).as[Long].map { i =>
    val payload = Array.tabulate(256)(j => ((i * 31 + j * 7) % 251).toByte)
    MediaRecord(i, Codec.encode(64 + i.toInt, 48, 3, payload))
  }

  test("decodeMeta extracts typed metadata distributed; bad payloads drop") {
    val good = corpus(8)
    val bad = Seq(MediaRecord(99L, Array[Byte](1, 2, 3))).toDS()
    val out = decodeMeta(good.union(bad)).collect()
    assert(out.length == 8)
    val m = out.find(_.media_id == 3L).get.meta
    assert(m == MediaMeta(67, 48, 3, 256 + 13, "grft"))
  }

  test("feature extraction feeds similarity search end-to-end") {
    val feats = extractFeatures(corpus(20))
      .withColumnRenamed("media_id", "vec_id")
      .withColumnRenamed("features", "embedding")
    val top = Similarity.bruteForceTopK(feats, feats.filter($"vec_id" === 0),
      "vec_id", "embedding", 3).collect()
    assert(top.length == 3)
    assert(top.forall(_.getAs[Double]("cos") > 0.5)) // histograms are similar-ish
  }

  test("frame sampling emits every stride-th fixed-size frame") {
    val frames = sampleFrames(corpus(2), frameBytes = 64, stride = 2).collect()
    // 256-byte payload → 4 frames of 64 → keep idx 0, 2 → 2 frames per media
    assert(frames.length == 4)
    assert(frames.forall(_.frame.length == 64))
    assert(frames.map(_.frame_idx).toSet == Set(0, 2))
  }

  test("stub resize halves dimensions and payload") {
    val out = resizeAll(corpus(1), 2).collect().head
    val m = Codec.decodeMeta(out.content).get
    assert(m.width == 32 && m.height == 24)
    assert(Codec.payload(out.content).length == 128)
  }

  test("binaryFile ingest reads a media landing dir on executors") {
    val dir = java.nio.file.Files.createTempDirectory("media")
    corpus(3).collect().foreach { r =>
      java.nio.file.Files.write(dir.resolve(s"m${r.media_id}.grft"), r.content)
    }
    val df = Multimodal.readBinaryDir(spark, dir.toString)
    assert(df.count() == 3)
    val ds = df.select(
      regexp_extract(col("path"), "m(\\d+)\\.grft", 1).cast("long").as("media_id"),
      col("content")).as[MediaRecord]
    assert(decodeMeta(ds).count() == 3)
  }
}
