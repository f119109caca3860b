package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}

/** Audio near-duplicate detection — the last modality without a
  * dedup operator (text, image, video, and embeddings all have
  * detect+act). The audio analogue of the frame dHash: a clip's PCM
  * is cut into fixed windows and each window reduces to a quantized
  * acoustic level pair (RMS, peak) packed into one integer hash —
  * stable across containers and (with quantization headroom) mild
  * re-encodes, cheap enough to compute in the decode pass.
  *
  * The output shape is (media_id, frame_idx, fhash) — EXACTLY the
  * substrate [[VideoDedup]]'s pairing/grouping/incremental machinery
  * consumes, so banding, hash-set containment, connected components,
  * keep-one, and the batch-touching incremental form all come for
  * free: the signature extractor is modality-specific, everything
  * after it is modality-agnostic. For the small hash space quantized
  * audio produces, call the group ops with `nBands = 1, bandBits =
  * 12, hammingMax = 0` — one exact band IS the hash, so candidates
  * are equal-window pairs only.
  */
object AudioDedup {

  /** Per-window signatures: the clip's samples in `windowFrames`
    * windows (tail window included — a truncated outro still
    * fingerprints), each quantized to `levels` RMS levels and
    * `levels` peak levels, packed as `rmsQ · levels + peakQ`.
    * Output: (media_id, frame_idx, fhash). One mapPartitions decode
    * pass; non-WAV payloads contribute nothing. */
  def windowSignatures(media: Dataset[Multimodal.MediaRecord],
                       windowFrames: Int = 400,
                       levels: Int = 64): DataFrame = {
    require(windowFrames >= 1 && levels >= 2,
      s"windowFrames/levels out of range: $windowFrames/$levels")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { r =>
      Audio.Wav.samples(r.content).toSeq.flatMap { pcm =>
        pcm.grouped(windowFrames).zipWithIndex.map { case (w, i) =>
          var sumSq = 0.0
          var peak = 0
          var j = 0
          while (j < w.length) {
            val v = w(j).toInt
            sumSq += v.toDouble * v
            val a = math.abs(v)
            if (a > peak) peak = a
            j += 1
          }
          val rms = math.sqrt(sumSq / w.length) / 32768.0
          val rq = math.min(levels - 1, (rms * levels).toInt)
          val pq = math.min(levels - 1, (peak / 32768.0 * levels).toInt)
          (r.media_id, i.toLong, rq.toLong * levels + pq.toLong)
        }
      }
    }).toDF("media_id", "frame_idx", "fhash")
  }
}
