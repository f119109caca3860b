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
        // With hammingMax > 0 one hash can match several on the other
        // side, so the matched count may exceed the smaller set size —
        // cap the numerator so sim stays true containment in [0, 1].
        round(least(greatest(col("__ma"), col("__mb")),
            least(col("__na"), col("__nb"))).cast("double") /
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

  /** The STANDING dedup state over a corpus — the artifact an
    * append-only ingest persists between batches: one row per video,
    * (media_id, n_frames, set_sig, rep, keep_id). `rep` is the
    * identical-set class representative (class-minimum id); `keep_id`
    * is the near-dup component label over representatives (component
    * minimum; singleton classes keep themselves). [[groupsFromState]]
    * projects the q171-shaped output; [[foldBatch]] advances the
    * state by one batch WITHOUT re-running pair generation or CC over
    * the old corpus. */
  def dedupState(sigs: DataFrame, bandBits: Int = 12, nBands: Int = 4,
                 hammingMax: Int = 3, simMin: Double = 0.6,
                 bucketCap: Option[Int] = None): DataFrame = {
    val sig = setSignatures(sigs)
    val rep = sig.groupBy(col("set_sig")).agg(min(col("media_id")).as("rep"))
    val members = sig.join(rep, Seq("set_sig"))
    val repSigs = sigs.join(rep.select(col("rep").as("media_id")),
      Seq("media_id"), "left_semi")
    val cc = graft.operators.Dedup.connectedComponents(
        nearDupPairs(repSigs, bandBits, nBands, hammingMax, simMin,
          bucketCap))
      .select(col("id").as("rep"), col("keep_id").as("__comp"))
    sigs.groupBy(col("media_id"))
      .agg(count(lit(1)).cast("long").as("n_frames"))
      .join(members, Seq("media_id"))
      .join(cc, Seq("rep"), "left")
      .select(col("media_id"), col("n_frames"), col("set_sig"),
        col("rep"), coalesce(col("__comp"), col("rep")).as("keep_id"))
  }

  /** The representatives' frame signatures — the second standing
    * artifact (what future batches band against). */
  def repSignatures(state: DataFrame, sigs: DataFrame): DataFrame =
    sigs.join(state.filter(col("media_id") === col("rep"))
      .select(col("media_id")), Seq("media_id"), "left_semi")

  /** Fold one ingest batch into standing state. Trusts the state's
    * labels outright — the old corpus is never re-paired and never
    * re-CC'd; it streams through exactly two narrow scans (the class
    * map the broadcast batch probes, and the batch×all band join of
    * [[nearDupPairsTouching]]), the same touched-slice discipline as
    * [[graft.operators.Dedup.incrementalComponents]]. Batch videos
    * whose hash set matches a known class adopt its representative;
    * unseen classes elect a batch-minimum representative, band
    * against the standing representatives, and the verified delta
    * pairs fold through `incrementalComponents`. Requires append-only
    * ids (every batch id > every state id), so class representatives
    * and component minima never move. Returns (state', repSigs'). */
  def foldBatch(state: DataFrame, repSigs: DataFrame, batchSigs: DataFrame,
                bandBits: Int = 12, nBands: Int = 4, hammingMax: Int = 3,
                simMin: Double = 0.6): (DataFrame, DataFrame) = {
    val bSig = setSignatures(batchSigs)
    val bFrames = batchSigs.groupBy(col("media_id"))
      .agg(count(lit(1)).cast("long").as("n_frames"))
    // known classes: the (set_sig -> rep) map streams once past the
    // broadcast batch signatures; matching batch videos adopt the rep
    val classMap = state.select(col("set_sig"), col("rep")).distinct()
    val known = classMap.join(broadcast(bSig), Seq("set_sig"))
    // unseen classes: representative = batch-class minimum
    val fresh = bSig.join(classMap.select(col("set_sig")),
      Seq("set_sig"), "left_anti")
    val freshRep = fresh.groupBy(col("set_sig"))
      .agg(min(col("media_id")).as("rep"))
    val freshMembers = fresh.join(freshRep, Seq("set_sig"))
    val newRepIds = freshRep.select(col("rep").as("media_id"))
    val newRepSigs = batchSigs.join(newRepIds, Seq("media_id"), "left_semi")
    val allRepSigs = repSigs.unionByName(newRepSigs)
    val deltaPairs = nearDupPairsTouching(allRepSigs, newRepIds,
      bandBits, nBands, hammingMax, simMin)
    val labels = graft.operators.Dedup.incrementalComponents(
        state.filter(col("media_id") === col("rep"))
          .select(col("media_id").as("id"), col("keep_id")),
        deltaPairs)
      .select(col("id").as("rep"), col("keep_id").as("__comp"))
    val members = state.select(col("media_id"), col("n_frames"),
        col("set_sig"), col("rep"))
      .unionByName(known.join(bFrames, Seq("media_id"))
        .select(col("media_id"), col("n_frames"), col("set_sig"), col("rep")))
      .unionByName(freshMembers.join(bFrames, Seq("media_id"))
        .select(col("media_id"), col("n_frames"), col("set_sig"), col("rep")))
    val state2 = members.join(labels, Seq("rep"), "left")
      .select(col("media_id"), col("n_frames"), col("set_sig"),
        col("rep"), coalesce(col("__comp"), col("rep")).as("keep_id"))
    (state2, allRepSigs)
  }

  /** Project the q171-shaped dedup output from standing state. */
  def groupsFromState(state: DataFrame): DataFrame =
    state.select(col("media_id"), col("n_frames"), col("keep_id"))
      .withColumn("is_keeper", col("media_id") === col("keep_id"))

  /** INCREMENTAL near-dup maintenance over a signature table whose
    * ids split at `thresh` (old ≤ thresh < batch — append-only
    * ingest): bootstrap [[dedupState]] on the old slice, then
    * [[foldBatch]] the rest. Reproduces the from-scratch
    * [[nearDupGroups]] verbatim (invariant-pinned by the q189/q197
    * oracles, which route through this wrapper — so the gate covers
    * the fold path itself). Per-batch cost is ∝ batch: the old side
    * contributes only its persisted labels and streaming scans, never
    * a re-paired/re-CC'd graph (behavior-pinned by the severed-bridge
    * spec in MultimodalSpec). Modality-agnostic: any (media_id,
    * frame_idx, fhash) substrate — video frame hashes, audio window
    * hashes — gets the incremental form for free. */
  def incrementalGroups(sigs: DataFrame, thresh: Long,
                        bandBits: Int = 12, nBands: Int = 4,
                        hammingMax: Int = 3,
                        simMin: Double = 0.6): DataFrame = {
    val old = sigs.filter(col("media_id") <= thresh)
    val batch = sigs.filter(col("media_id") > thresh)
    val st = dedupState(old, bandBits, nBands, hammingMax, simMin)
      .localCheckpoint(true) // standing state is a materialized artifact
    val (st2, _) = foldBatch(st, repSignatures(st, old), batch,
      bandBits, nBands, hammingMax, simMin)
    groupsFromState(st2)
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
