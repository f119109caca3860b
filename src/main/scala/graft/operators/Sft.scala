package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Post-training (SFT/RLHF) data preparation over an event stream —
  * the assembly line that turns raw interaction logs into training
  * examples: sessionize → role-tagged turns → merge consecutive
  * same-role turns → deterministic chat-template render → example
  * extraction / preference pairs / loss-mask packing.
  *
  * The reference has no counterpart; this is the "conversation data"
  * half of a modern training-data pipeline, built on the same
  * primitives the document family uses (gaps-and-islands windows,
  * ordered in-group concat, two-phase prefix-sum packing).
  *
  * Determinism contract (everything the DuckDB gate hash-compares):
  *  - event order inside a conversation is the unique (ts, event_id);
  *  - values enter as BIGINT fixed point (round(value·100)) so no
  *    float ever crosses an aggregation;
  *  - rendered text is single-space joined, so whitespace token
  *    counts are pure integer arithmetic: n_events + n_turns.
  *
  * Scale shape: every step is a per-(user, session) window or a
  * per-conversation agg — partition grain is one conversation
  * (bounded by session length), never the corpus. The only global
  * pass is the packing prefix sum, which is [[Packing]]'s two-phase
  * rank (no single-partition sort; sparse conv keys hit the sampled
  * range fallback).
  */
object Sft {

  val GapUs: Long = 1800L * 1000 * 1000 // 30-min session gap

  /** Events → role-tagged conversation rows. Output: (user_id,
    * session_id, t µs, event_id, role, content, value_fp).
    * Role map: click/view are the human side, everything else
    * (signup/purchase/error) the system side. Content is the
    * deterministic single-token serialization `event_type#value_fp`.
    */
  def rawTurns(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("t"))
    events
      .withColumn("t", expr("ts div 1000"))
      .withColumn("value_fp", round(col("value") * 100).cast("long"))
      .withColumn("prev_t", lag(col("t"), 1).over(w))
      .withColumn("__new",
        when(col("prev_t").isNull || col("t") - col("prev_t") > GapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("role",
        when(col("event_type").isin("click", "view"), lit("user"))
          .otherwise(lit("assistant")))
      .withColumn("content",
        concat(col("event_type"), lit("#"), col("value_fp")))
      .select(col("user_id"), col("session_id"), col("t"),
        col("event_id"), col("role"), col("content"), col("value_fp"))
  }

  /** Consecutive same-role events merge into one turn (the standard
    * alternation repair before templating). Output one row per
    * MERGED turn: (user_id, session_id, turn_id 1-based, role,
    * n_events, value_fp sum, turn_text). Turn text is
    * `<|role|> c1 c2 …` with contents in (t, event_id) order —
    * whitespace tokens per turn = n_events + 1 (the role tag). */
  def mergedTurns(events: DataFrame): DataFrame =
    mergedTurnsOfRaw(rawTurns(events))

  /** [[mergedTurns]] from an ALREADY-SESSIONIZED [[rawTurns]] frame —
    * callers that need both the per-session tail facts AND the merged
    * turns (the sealed-export sink) compute `rawTurns` once,
    * checkpoint it, and feed both consumers, instead of paying the
    * sessionization window cascade twice. */
  def mergedTurnsOfRaw(raw: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("session_id"))
      .orderBy(col("t"), col("event_id"))
    raw
      .withColumn("__rc",
        when(lag(col("role"), 1).over(w).isNull ||
          lag(col("role"), 1).over(w) =!= col("role"), 1L).otherwise(0L))
      .withColumn("turn_id",
        sum(col("__rc")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"), col("turn_id"),
        col("role"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value_fp")).as("value_fp"),
        concat(lit("<|"), col("role"), lit("|> "),
          array_join(transform(
            sort_array(collect_list(struct(col("t"), col("event_id"),
              col("content")))),
            x => x.getField("content")), " ")).as("turn_text"))
  }

  /** Ordered concat of per-turn texts into the conversation render —
    * the deterministic chat template. One row per conversation:
    * (user_id, session_id, n_turns, n_events, rendered, n_tokens).
    */
  def render(turns: DataFrame): DataFrame =
    turns.groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_turns"),
        sum(col("n_events")).as("n_events"),
        array_join(transform(
          sort_array(collect_list(struct(col("turn_id"),
            col("turn_text")))),
          x => x.getField("turn_text")), " ").as("rendered"))
      .withColumn("n_tokens", col("n_events") + col("n_turns"))

  /** First-fail curation verdict per conversation, fixed rule order
    * (the [[Curation]] ledger discipline): too_short (< minTurns
    * merged turns) → no_user_start → no_assistant_end → kept. */
  def ledger(turns: DataFrame, minTurns: Long = 2L): DataFrame =
    turns.groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_turns"),
        min(struct(col("turn_id"), col("role"))).as("__f"),
        max(struct(col("turn_id"), col("role"))).as("__l"))
      .select(col("user_id"), col("session_id"), col("n_turns"),
        col("__f.role").as("first_role"), col("__l.role").as("last_role"),
        when(col("n_turns") < minTurns, lit("too_short"))
          .when(col("__f.role") =!= "user", lit("no_user_start"))
          .when(col("__l.role") =!= "assistant", lit("no_assistant_end"))
          .otherwise(lit("kept")).as("verdict"))

  /** SFT examples from kept conversations: prompt = all turns except
    * the last, target = the final assistant turn. Hashes inside the
    * output pin the exact rendered bytes cross-engine. */
  def sftExamples(turns: DataFrame, minTurns: Long = 2L): DataFrame = {
    val kept = ledger(turns, minTurns)
      .filter(col("verdict") === "kept")
      .select(col("user_id"), col("session_id"), col("n_turns"))
    turns.join(kept, Seq("user_id", "session_id"))
      .groupBy(col("user_id"), col("session_id"), col("n_turns"))
      .agg(
        md5(array_join(transform(
          sort_array(collect_list(when(col("turn_id") < col("n_turns"),
            struct(col("turn_id"), col("turn_text"))))),
          x => x.getField("turn_text")), " ")).as("prompt_md5"),
        max(when(col("turn_id") === col("n_turns"), md5(col("turn_text"))))
          .as("target_md5"),
        sum(when(col("turn_id") < col("n_turns"),
          col("n_events") + 1L).otherwise(0L)).as("prompt_tokens"),
        max(when(col("turn_id") === col("n_turns"),
          col("n_events") + 1L)).as("target_tokens"))
      .drop("n_turns")
  }

  /** Preference pairs: conversations with ≥ 2 assistant turns yield
    * (chosen, rejected) = (max, min) assistant turn by fixed-point
    * score, with turn_id tie-breaks making both picks total orders;
    * zero-margin conversations drop (a tie teaches nothing). */
  def prefPairs(turns: DataFrame): DataFrame =
    turns.filter(col("role") === "assistant")
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("__na"),
        max(struct(col("value_fp"), col("turn_id"))).as("__c"),
        min(struct(col("value_fp"), col("turn_id"))).as("__r"))
      .filter(col("__na") >= 2L &&
        col("__c.value_fp") > col("__r.value_fp"))
      .select(col("user_id"), col("session_id"),
        col("__c.turn_id").as("chosen_turn"),
        col("__r.turn_id").as("rejected_turn"),
        col("__c.value_fp").as("chosen_fp"),
        col("__r.value_fp").as("rejected_fp"),
        (col("__c.value_fp") - col("__r.value_fp")).as("margin_fp"))

  /** Per-turn TIME bounds — (user_id, session_id, turn_id, role, t0 =
    * first event µs, t1 = last event µs), same windows as
    * [[mergedTurns]] but kept separate so the text-fold state stays
    * minimal. Feeds response-latency analytics (assistant t0 minus
    * the preceding turn's t1). */
  def turnTimes(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("session_id"))
      .orderBy(col("t"), col("event_id"))
    rawTurns(events)
      .withColumn("__rc",
        when(lag(col("role"), 1).over(w).isNull ||
          lag(col("role"), 1).over(w) =!= col("role"), 1L).otherwise(0L))
      .withColumn("turn_id",
        sum(col("__rc")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"), col("turn_id"),
        col("role"))
      .agg(min(col("t")).as("t0"), max(col("t")).as("t1"))
  }

  // -------------------------------------------------- incremental

  /** Conversation-tail summary per user: where the user's LAST
    * conversation currently ends — the only per-user facts a
    * strictly-later batch needs to weave itself in. `lastT` supplies
    * the last event TIME per user (not derivable from turns), e.g.
    * from [[rawTurns]] max(t); it folds across batches by max —
    * idempotent state. Output: (user_id, last_session, last_turn,
    * last_role, last_t). */
  def tailOf(turns: DataFrame, lastT: DataFrame): DataFrame =
    turns.groupBy(col("user_id"))
      .agg(max(struct(col("session_id").as("s"), col("turn_id").as("tn"),
        col("role").as("r"))).as("__x"))
      .select(col("user_id"), col("__x.s").as("last_session"),
        col("__x.tn").as("last_turn"), col("__x.r").as("last_role"))
      .join(lastT, Seq("user_id"))

  /** Standing conversation state: (merged turns, tail). */
  def turnsState(events: DataFrame): (DataFrame, DataFrame) = {
    val turns = mergedTurns(events)
    val lastT = rawTurns(events).groupBy(col("user_id"))
      .agg(max(col("t")).as("last_t"))
    (turns, tailOf(turns, lastT))
  }

  /** Fold a STRICTLY-LATER batch of events into standing turns: the
    * old events are never re-sessionized or re-windowed — the batch
    * sessionizes/merges ALONE, then a users-sized tail join decides
    * per user whether its first session attaches to the standing last
    * session (gap rule) and whether its first turn extends the
    * standing last turn (same role → n_events/value_fp add, text
    * concatenates). Old turns flow through one anti-join; touched
    * turns are |users|-bounded. Must equal [[mergedTurns]] over the
    * full event set (the q336 gate pins the RENDERED BYTES — q323's
    * oracle verbatim — so a text-fold bug cannot hide in counts). */
  /** The fold's three parts: (fold keys+payload, old rows UPDATED by
    * a text extension, FRESH batch-derived rows). Shared by the
    * full-table fold ([[foldTurns]]) and the bucket-scoped delta
    * ([[foldTurnsDelta]]). */
  private def foldParts(oldTurns: DataFrame, tail: DataFrame,
                        batch: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    // sessionize and merge the (micro-batch-sized) batch ONCE: bt
    // feeds three subtrees (r1, the join, the fresh rows) and raw
    // feeds two — un-checkpointed, every fold action re-ran the
    // whole window cascade once per subtree
    val raw = rawTurns(batch).localCheckpoint(true)
    val bt = mergedTurnsOfRaw(raw).localCheckpoint(true)
    val first = raw.groupBy(col("user_id"))
      .agg(min(col("t")).as("first_t"))
    val r1 = bt.filter(col("session_id") === 1L && col("turn_id") === 1L)
      .select(col("user_id"), col("role").as("__r1"))
    val j = bt.join(first, Seq("user_id")).join(r1, Seq("user_id"))
      .join(tail, Seq("user_id"), "left")
    val attach = col("last_t").isNotNull &&
      (col("first_t") - col("last_t") <= GapUs)
    val roleMatch = attach && (col("__r1") === col("last_role"))
    val base = coalesce(col("last_session"), lit(0L))
    val sess = when(attach, base + col("session_id") - 1L)
      .otherwise(base + col("session_id"))
    val inS1 = col("session_id") === 1L
    val turn = when(attach && inS1,
        when(roleMatch, col("last_turn") + col("turn_id") - 1L)
          .otherwise(col("last_turn") + col("turn_id")))
      .otherwise(col("turn_id"))
    val renum = j.select(col("user_id"), sess.as("session_id"),
      turn.as("turn_id"), col("role"), col("n_events"), col("value_fp"),
      col("turn_text"),
      (roleMatch && inS1 && col("turn_id") === 1L).as("__fold"))
    val folds = renum.filter(col("__fold"))
      .select(col("user_id"), col("session_id"), col("turn_id"),
        col("n_events").as("__bn"), col("value_fp").as("__bv"),
        // strip the '<|role|> ' prefix (len(role)+5 chars) — the old
        // turn already carries it
        expr("substring(turn_text, length(role) + 6)").as("__btext"))
    val updated = oldTurns
      .join(folds, Seq("user_id", "session_id", "turn_id"))
      .select(col("user_id"), col("session_id"), col("turn_id"),
        col("role"), (col("n_events") + col("__bn")).as("n_events"),
        (col("value_fp") + col("__bv")).as("value_fp"),
        concat(col("turn_text"), lit(" "), col("__btext"))
          .as("turn_text"))
    (folds, updated, renum.filter(!col("__fold")).drop("__fold"))
  }

  def foldTurns(oldTurns: DataFrame, tail: DataFrame,
                batch: DataFrame): DataFrame = {
    val (folds, updated, fresh) = foldParts(oldTurns, tail, batch)
    oldTurns.join(folds, Seq("user_id", "session_id", "turn_id"),
        "left_anti")
      .unionByName(updated)
      .unionByName(fresh)
  }

  /** ONLY the rows the batch changes — extended old turns plus fresh
    * batch turns (the upsert set a bucket-scoped state store writes;
    * untouched turns never flow through anything). */
  def foldTurnsDelta(oldTurns: DataFrame, tail: DataFrame,
                     batch: DataFrame): DataFrame = {
    val (_, updated, fresh) = foldParts(oldTurns, tail, batch)
    updated.unionByName(fresh)
  }

  /** Loss-mask spans for packed conversations: conversations pack
    * into fixed-`budget` token sequences ([[Packing.packWithOffsets]]
    * over the sparse composite conv key — the sampled range-bucketing
    * path), and each ASSISTANT turn contributes one span of
    * loss-active tokens at its global in-sequence position (the role
    * tag token is masked out, content tokens train). Output: one row
    * per assistant turn — (conv_key, turn_id, seq_id, span_start,
    * span_len). */
  def lossMaskSpans(turns: DataFrame, convKey: Column,
                    budget: Long): DataFrame = {
    val t2 = turns.withColumn("conv_key", convKey)
    val conv = t2.groupBy(col("conv_key"))
      .agg((sum(col("n_events")) + count(lit(1))).as("n_tokens"))
    val packed = Packing.packWithOffsets(conv, "conv_key", "n_tokens",
      budget)
    val w = Window.partitionBy(col("conv_key")).orderBy(col("turn_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    t2.withColumn("__tstart",
        coalesce(sum(col("n_events") + 1L).over(w), lit(0L)))
      .filter(col("role") === "assistant")
      .join(packed.select(col("conv_key"), col("seq_id"), col("offset")),
        Seq("conv_key"))
      .select(col("conv_key"), col("turn_id"), col("seq_id"),
        (col("offset") + col("__tstart") + 1L).as("span_start"),
        col("n_events").as("span_len"))
  }
}
