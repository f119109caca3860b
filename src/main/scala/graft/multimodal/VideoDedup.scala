package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Video near-duplicate detection — the video analogue of the image
  * dHash family (q62/q164), closing the one modality that had decode
  * (q64/q118 frame extraction) but no dedup. A video's identity for
  * dedup purposes is its set of per-frame perceptual hashes: container
  * remuxes, metadata edits, and mild re-encodes leave the frame
  * hashes (nearly) unchanged, so two uploads of the same clip collide
  * even when their bytes share nothing.
  *
  * Pipeline shape — never all-pairs, the LSH discipline the text
  * dedup family established:
  *   1. [[frameSignatures]]: demux (RIFF walk) → per-frame pixel
  *      decode (Codec dispatch: PNG/JPEG/…) → dHash. One
  *      mapPartitions pass, embarrassingly parallel.
  *   2. [[nearDupPairs]]: frame hashes are banded (pigeonhole: two
  *      hashes within hamming `bandBits·nBands/nBands − 1` share at
  *      least one exact band); candidate FRAME pairs come from band
  *      equality, are verified by exact hamming distance, and roll up
  *      to video-pair containment = |matched hashes| / min(|A|,|B|) —
  *      the asymmetric measure that still scores 1.0 when one upload
  *      has an extra trailing frame (outro card, re-encode padding).
  *   3. [[nearDupGroups]]: connected components over verified pairs
  *      (shared [[graft.operators.Dedup.connectedComponents]]
  *      machinery), keep id = component minimum, singletons keep
  *      themselves — the q62/q164 output contract.
  *
  * Scale: the band join's bucket fan-out is the only superlinear
  * risk (a constant black frame shared by millions of videos);
  * `bucketCap` drops band buckets above the cap as a FULL-TABLE
  * statistic before pairing — the q72/q142 hot-cap idiom. Dedup is
  * conservative under the cap (a dropped bucket only loses candidate
  * pairs, never invents them).
  */
object VideoDedup {

  /** Per-frame perceptual signatures: (media_id, frame_idx, fhash).
    * The hash is the q62 difference hash — adjacent-byte comparisons
    * over the first `bits` decoded samples (bit j set iff
    * px[j] > px[j+1]) — computed on DECODED pixels, so it is stable
    * across lossless container/codec changes and (with a hamming
    * tolerance downstream) across mild lossy re-encodes. */
  def frameSignatures(media: Dataset[Multimodal.MediaRecord],
                      bits: Int = 48): DataFrame = {
    require(bits >= 1 && bits <= 63, s"bits must be in [1, 63], got $bits")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { r =>
      Avi.frames(r.content).zipWithIndex.map { case (frame, idx) =>
        val px = Multimodal.Codec.payload(frame)
        var hash = 0L
        var j = 0
        while (j < bits && j + 1 < px.length) {
          if ((px(j) & 0xff) > (px(j + 1) & 0xff)) hash |= 1L << j
          j += 1
        }
        (r.media_id, idx.toLong, hash)
      }
    }).toDF("media_id", "frame_idx", "fhash")
  }

  /** The distinct-hash-per-video view, its per-video set sizes, and
    * the band table — shared by the self-join (batch) and
    * batch-touching (incremental) pair generators. */
  private def bandTables(sigs: DataFrame, bandBits: Int, nBands: Int,
                         bucketCap: Option[Int])
      : (DataFrame, DataFrame) = {
    require(bandBits * nBands <= 63, "bands must cover <= 63 bits")
    val mask = (1L << bandBits) - 1
    // a frame repeated inside one video is one identity unit
    val vh = sigs.select(col("media_id"), col("fhash")).distinct()
    val nh = vh.groupBy(col("media_id"))
      .agg(count(lit(1)).cast("long").as("nh"))
    val bands = vh.select(col("media_id"), col("fhash"),
        explode(sequence(lit(0), lit(nBands - 1))).as("band"))
      .withColumn("band_val",
        expr(s"(fhash >> (band * $bandBits)) & ${mask}L"))
    val cool = bucketCap match {
      case Some(cap) =>
        val hot = bands.groupBy(col("band"), col("band_val"))
          .agg(count(lit(1)).as("__n")).filter(col("__n") > cap)
          .select(col("band"), col("band_val"))
        bands.join(hot, Seq("band", "band_val"), "left_anti")
      case None => bands
    }
    (cool, nh)
  }

  /** Hamming-verified candidates → containment-scored video pairs. */
  private def containmentPairs(cand: DataFrame, nh: DataFrame,
                               hammingMax: Int, simMin: Double): DataFrame =
    cand
      .distinct() // two bands agreeing must not double-count a match
      .filter(expr(s"bit_count(ha ^ hb) <= $hammingMax"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(countDistinct(col("ha")).cast("long").as("__ma"),
        countDistinct(col("hb")).cast("long").as("__mb"))
      .join(nh.select(col("media_id").as("id_a"), col("nh").as("__na")),
        Seq("id_a"))
      .join(nh.select(col("media_id").as("id_b"), col("nh").as("__nb")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(greatest(col("__ma"), col("__mb")).cast("double") /
          least(col("__na"), col("__nb")), 4).as("sim"))
      .filter(col("sim") >= simMin)

  /** Verified near-duplicate video pairs over a [[frameSignatures]]
    * table: (id_a, id_b, sim) with sim = hash-set containment ≥
    * `simMin`. Frames match when their hashes are within `hammingMax`
    * bits; candidates come from band equality only (pigeonhole
    * guarantee holds while hammingMax < nBands), verified exactly —
    * the corpus is never self-joined on raw hashes. */
  def nearDupPairs(sigs: DataFrame, bandBits: Int = 12, nBands: Int = 4,
                   hammingMax: Int = 3, simMin: Double = 0.6,
                   bucketCap: Option[Int] = None): DataFrame = {
    val (cool, nh) = bandTables(sigs, bandBits, nBands, bucketCap)
    val cand = cool.as("x").join(cool.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_val") === col("y.band_val") &&
          col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("id_a"), col("y.media_id").as("id_b"),
        col("x.fhash").as("ha"), col("y.fhash").as("hb"))
    containmentPairs(cand, nh, hammingMax, simMin)
  }

  /** [[nearDupPairs]] restricted to pairs TOUCHING `batchIds` (one
    * id column `media_id`) — the incremental form: the band join is
    * batch×all instead of all×all, so candidate volume is ∝ batch.
    * Pairs are normalized (id_a < id_b) with the hash columns kept on
    * their owning side; scoring is identical. */
  def nearDupPairsTouching(sigs: DataFrame, batchIds: DataFrame,
                           bandBits: Int = 12, nBands: Int = 4,
                           hammingMax: Int = 3, simMin: Double = 0.6,
                           bucketCap: Option[Int] = None): DataFrame = {
    val (cool, nh) = bandTables(sigs, bandBits, nBands, bucketCap)
    val bBands = cool.join(broadcast(batchIds.select(col("media_id"))),
      Seq("media_id"), "left_semi")
    val cand = cool.as("x").join(bBands.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_val") === col("y.band_val") &&
          col("x.media_id") =!= col("y.media_id"))
      .select(
        least(col("x.media_id"), col("y.media_id")).as("id_a"),
        greatest(col("x.media_id"), col("y.media_id")).as("id_b"),
        when(col("x.media_id") < col("y.media_id"), col("x.fhash"))
          .otherwise(col("y.fhash")).as("ha"),
        when(col("x.media_id") < col("y.media_id"), col("y.fhash"))
          .otherwise(col("x.fhash")).as("hb"))
    containmentPairs(cand, nh, hammingMax, simMin)
  }

  /** Each video's exact SET signature: md5 of its sorted distinct
    * frame hashes — the identity under which videos are
    * interchangeable for near-dup purposes (pair similarity is a
    * function of the two hash sets alone). Output:
    * (media_id, set_sig). */
  def setSignatures(sigs: DataFrame): DataFrame =
    sigs.select(col("media_id"), col("fhash")).distinct()
      .groupBy(col("media_id"))
      .agg(md5(concat_ws(",",
        array_sort(collect_list(col("fhash").cast("string")))))
        .as("set_sig"))

  /** INCREMENTAL near-dup maintenance over a signature table whose
    * ids split at `thresh` (old ≤ thresh < batch — append-only
    * ingest, so a signature class's representative never moves):
    * standing state = signature classes + component labels over the
    * OLD representatives; the batch's unseen classes pair against the
    * standing representatives via [[nearDupPairsTouching]] (batch×all
    * banding) and fold through
    * [[graft.operators.Dedup.incrementalComponents]]. Reproduces the
    * from-scratch [[nearDupGroups]] verbatim (invariant-pinned by the
    * q171/q196 oracles). Modality-agnostic: any (media_id, frame_idx,
    * fhash) substrate — video frame hashes, audio window hashes —
    * gets the incremental form for free. */
  def incrementalGroups(sigs: DataFrame, thresh: Long,
                        bandBits: Int = 12, nBands: Int = 4,
                        hammingMax: Int = 3,
                        simMin: Double = 0.6): DataFrame = {
    val sig = setSignatures(sigs).withColumnRenamed("set_sig", "__sig")
    val rep = sig.groupBy(col("__sig")).agg(min(col("media_id")).as("__rep"))
    val members = sig.join(rep, Seq("__sig"))
      .select(col("media_id"), col("__rep"))
    val repIds = rep.select(col("__rep").as("media_id"))
    val repSigs = sigs.join(repIds, Seq("media_id"), "left_semi")
    val oldLabels = graft.operators.Dedup.connectedComponents(
      nearDupPairs(repSigs.filter(col("media_id") <= thresh),
        bandBits, nBands, hammingMax, simMin))
    val newReps = repIds.filter(col("media_id") > thresh)
    val deltaPairs = nearDupPairsTouching(repSigs, newReps,
      bandBits, nBands, hammingMax, simMin)
    val labels = graft.operators.Dedup.incrementalComponents(
        oldLabels, deltaPairs)
      .select(col("id").as("__rep"), col("keep_id").as("__comp"))
    val labeled = members.join(labels, Seq("__rep"), "left")
      .select(col("media_id"),
        coalesce(col("__comp"), col("__rep")).as("keep_id"))
    sigs.groupBy(col("media_id"))
      .agg(count(lit(1)).cast("long").as("n_frames"))
      .join(labeled, Seq("media_id"))
      .select(col("media_id"), col("n_frames"), col("keep_id"))
      .withColumn("is_keeper", col("media_id") === col("keep_id"))
  }

  /** The dedup artifact: every video with its group's canonical
    * keeper (component minimum over the verified-pair graph;
    * singletons keep themselves) and its frame count — the table the
    * physical delete/copy step consumes, mirroring q164's image
    * keep-one contract. Output: (media_id, n_frames, keep_id,
    * is_keeper).
    *
    * Runs as an exact-first CASCADE: pair similarity is a function of
    * the distinct-hash SET alone, so videos with identical sets are
    * interchangeable — they collapse to one representative (the
    * set-minimum id) BEFORE the banded join, and the near-dup
    * machinery runs over representatives only. On a re-upload-heavy
    * corpus the exact tier absorbs the quadratic mass (every pair
    * inside an identical-set class is a near-dup — the pair graph is
    * a clique per class) and the banding/CC tier sees one node per
    * distinct signature. The output partition — and therefore every
    * keep_id — is provably the all-pairs answer: members of one
    * signature are pairwise connected at sim 1.0, and any cross-
    * signature member pair induces the same-sim representative pair
    * (sim depends only on the two sets). The component minimum over
    * representatives IS the member minimum, because each
    * representative is already its class's minimum. */
  def nearDupGroups(sigs: DataFrame, bandBits: Int = 12, nBands: Int = 4,
                    hammingMax: Int = 3, simMin: Double = 0.6,
                    bucketCap: Option[Int] = None): DataFrame = {
    val sig = setSignatures(sigs).withColumnRenamed("set_sig", "__sig")
    val rep = sig.groupBy(col("__sig")).agg(min(col("media_id")).as("__rep"))
    val members = sig.join(rep, Seq("__sig"))
      .select(col("media_id"), col("__rep"))
    val repSigs = sigs.join(
      members.filter(col("media_id") === col("__rep"))
        .select(col("media_id")),
      Seq("media_id"), "left_semi")
    val pairs = nearDupPairs(repSigs, bandBits, nBands, hammingMax, simMin,
      bucketCap)
    val cc = graft.operators.Dedup.connectedComponents(pairs)
      .select(col("id").as("__rep"), col("keep_id").as("__comp"))
    val labeled = members.join(cc, Seq("__rep"), "left")
      .select(col("media_id"),
        coalesce(col("__comp"), col("__rep")).as("keep_id"))
    sigs.groupBy(col("media_id"))
      .agg(count(lit(1)).cast("long").as("n_frames"))
      .join(labeled, Seq("media_id"))
      .select(col("media_id"), col("n_frames"), col("keep_id"))
      .withColumn("is_keeper", col("media_id") === col("keep_id"))
  }
}
