package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical table maintenance the text family's shard writer does not
  * cover: (a) JSONL shard export — the interchange format training
  * stacks actually mount — with a byte-budget layout from the same
  * two-phase prefix sum the token shards use, and (b) a generic keyed
  * BUCKETED parquet store with MERGE INTO semantics (upsert + delete
  * in one batch), rewriting ONLY the buckets the batch touches — the
  * [[graft.multimodal.MediaStore]] delete discipline generalized from
  * keep-one verdicts to arbitrary keyed mutation.
  *
  * Scale shape: shard/bucket assignment is a projection (+ one
  * two-phase prefix pass for JSONL); every write is partitioned by
  * the layout column so a shard/bucket is one task's output; merge
  * I/O is ∝ touched buckets by construction, never the store.
  */
object Lakehouse {

  // ---------------------------------------------------------- JSONL

  /** One JSON line per document, built by explicit concatenation so
    * the bytes are engine-reproducible (to_json's field ordering and
    * float formatting are not part of any cross-engine contract).
    * Only quote and backslash need escaping for string fields whose
    * content is printable (control chars are absent from the corpus
    * contract; a fuller escaper would extend the regex). n_bytes
    * counts the line plus its newline — char count == byte count on
    * this ASCII corpus (octet_length would replace length for UTF-8).
    * Output: (doc_id, line, n_bytes). */
  def jsonLines(docs: DataFrame): DataFrame = {
    val esc = (c: org.apache.spark.sql.Column) =>
      regexp_replace(c, "([\"\\\\])", "\\\\$1")
    docs.select(col("doc_id"),
      concat(lit("{\"doc_id\":"), col("doc_id"),
        lit(",\"lang\":\""), esc(col("lang")),
        lit("\",\"source\":\""), esc(col("source")),
        lit("\",\"text\":\""), esc(col("text")), lit("\"}")).as("line"))
      .withColumn("n_bytes", (length(col("line")) + 1L).cast("long"))
  }

  /** Export documents as JSONL shards under `path/shard=N`, shard =
    * byte-budget greedy fill by global prefix position (the
    * [[Packing.packByBudget]] layout — `byteOffset` is the sealed
    * append hook: a batch of strictly-later ids with the landed byte
    * total as offset lands exactly where the from-scratch layout
    * would put it). One text file per shard (hash-repartitioned on
    * shard, sorted by doc_id inside), `mode` Append for incremental
    * batches. */
  def writeJsonl(docs: DataFrame, path: String, budgetBytes: Long,
                 byteOffset: Long = 0L,
                 mode: SaveMode = SaveMode.Overwrite): Unit =
    writeLines(jsonLines(docs), "doc_id", path, budgetBytes,
      byteOffset, mode)

  /** The generic text-shard writer under [[writeJsonl]]: any
    * (keyCol, line, n_bytes) frame lands as `path/shard=N` text files
    * with the byte-budget prefix-sum layout, lines in key order. */
  def writeLines(lines: DataFrame, keyCol: String, path: String,
                 budgetBytes: Long, byteOffset: Long = 0L,
                 mode: SaveMode = SaveMode.Overwrite): Unit = {
    val sharded = Packing.packByBudget(lines, keyCol, "n_bytes",
        budgetBytes, byteOffset)
      .select(col(keyCol), col("seq_id").as("shard"))
      .join(lines, Seq(keyCol))
    sharded.repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col(keyCol))
      .select(col("shard"), col("line"))
      .write.mode(mode).partitionBy("shard").text(path)
  }

  /** Read a [[writeJsonl]] layout back and manifest it per shard:
    * (shard_id, n_docs, n_bytes, content_md5) where content_md5
    * hashes the newline-joined lines in doc_id order (ids parsed back
    * out of the JSON — after an append a shard may span part files,
    * so file order alone is not the contract; id order is). This is
    * the gate's evidence that the BYTES ON DISK equal the pure-SQL
    * reconstruction. */
  def jsonlManifest(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(col("shard").cast("long").as("shard_id"),
        get_json_object(col("value"), "$.doc_id").cast("long")
          .as("doc_id"),
        col("value"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("value")) + 1L).cast("long").as("n_bytes"),
        md5(array_join(transform(
          sort_array(collect_list(struct(col("doc_id"), col("value")))),
          x => x.getField("value")), "\n")).as("content_md5"))

  /** Read a [[writeJsonl]] layout back into a TYPED table — the
    * import half of the interchange roundtrip (from_json undoes the
    * escaping [[jsonLines]] applied; n_chars re-derives as the text
    * length, the corpus contract). */
  def readJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(from_json(col("value"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id LONG, lang STRING, source STRING, text STRING"))
        .as("j"))
      .select(col("j.doc_id").as("doc_id"), col("j.lang").as("lang"),
        col("j.source").as("source"), col("j.text").as("text"))
      .withColumn("n_chars", length(col("text")).cast("long"))

  // ----------------------------------------------- keyed merge store

  private def bucketed(df: DataFrame, key: String, buckets: Int) =
    df.withColumn("bucket", pmod(col(key), lit(buckets.toLong)))

  /** Materialize a keyed table as a bucketed store (`path/bucket=N`,
    * bucket = key mod buckets) — the layout [[mergeInto]] maintains. */
  def writeStore(df: DataFrame, key: String, path: String,
                 buckets: Int): Unit = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    bucketed(df, key, buckets)
      .repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col(key))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("bucket")
      .parquet(path)
  }

  /** Append an ingest batch: new rows land as additional part files
    * inside their bucket dirs; nothing existing is opened. Work ∝
    * batch — the small-file debt this creates is what
    * [[compactStore]] repays. */
  def appendStore(df: DataFrame, key: String, path: String,
                  buckets: Int): Unit =
    bucketed(df, key, buckets)
      .repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col(key))
      .write.mode(SaveMode.Append)
      .partitionBy("bucket")
      .parquet(path)

  /** OPTIMIZE: rewrite every bucket that has accumulated more than
    * one part file (append debt) into a single file; buckets already
    * compact are not opened, rewritten, or touched — compaction cost
    * is ∝ fragmented buckets, mirroring the merge discipline. The
    * fragmented-bucket scan is a directory listing (≤ buckets
    * entries), not a data read. Content is bit-preserved: the same
    * rows, re-sorted by key within the bucket. Returns (touched,
    * rewritten) — equal by construction. */
  def compactStore(spark: SparkSession, path: String,
                   key: String): (Long, Long) = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val multi = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("bucket="))
      .filter { d =>
        fs.listStatus(d.getPath)
          .count(_.getPath.getName.startsWith("part-")) > 1
      }
      .map(_.getPath.getName.stripPrefix("bucket=").toLong).toSet
    if (multi.isEmpty) return (0L, 0L)
    val replacement = spark.read.parquet(path)
      .filter(col("bucket").isin(multi.toSeq: _*))
      .localCheckpoint(true)
    replacement.repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col(key))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket")
      .parquet(path)
    (multi.size.toLong, multi.size.toLong)
  }

  /** MERGE INTO: apply one batch of upserts (`op = 'U'`, full payload
    * columns) and deletes (`op = 'D'`) to a [[writeStore]] layout.
    * Only buckets that physically change are rewritten: a bucket is
    * touched iff it holds an existing row with a batch key (update or
    * delete) or receives an upsert; deletes of absent keys touch
    * nothing. Touched buckets rebuild from (survivors ∪ upserts) —
    * localCheckpointed BEFORE the dynamic partition overwrite so the
    * write never scans the dirs it replaces — and buckets the merge
    * emptied are removed outright (the [[Packing.repairSealedShards]]
    * delete discipline). Returns (touched, rewritten) bucket counts —
    * equal by construction, emitted separately so gate queries can
    * pin the `changed == touched` contract with measured values.
    *
    * Scale: batch keys flow through joins (left_semi/left_anti);
    * only the touched-bucket ID SET is collected (≤ buckets — the
    * layout's own parallelism constant, never data-sized). */
  def mergeInto(spark: SparkSession, path: String, batch: DataFrame,
                key: String, buckets: Int): (Long, Long) = {
    val store = spark.read.parquet(path)
    val dataCols = store.columns.filter(_ != "bucket").toSeq
    val b = bucketed(batch, key, buckets)
    val batchKeys = b.select(col(key)).distinct()
    val existingTouched = store
      .join(batchKeys, Seq(key), "left_semi")
      .select(col("bucket").cast("long")).distinct()
    val upsertTouched = b.filter(col("op") === "U")
      .select(col("bucket").cast("long")).distinct()
    val touched = existingTouched.union(upsertTouched).distinct()
      .collect().map(_.getLong(0)).toSet
    if (touched.isEmpty) return (0L, 0L)
    val survivors = store
      .filter(col("bucket").isin(touched.toSeq: _*))
      .join(batchKeys, Seq(key), "left_anti")
      .select(("bucket" +: dataCols).map(col): _*)
    val replacement = survivors.unionByName(
        b.filter(col("op") === "U")
          .select(("bucket" +: dataCols).map(col): _*))
      .localCheckpoint(true)
    replacement.repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col(key))
      .write.mode(SaveMode.Overwrite)
      // per-write option, NOT session conf: a session-wide dynamic
      // mode would silently change every later static Overwrite in
      // the shared Verify session
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket")
      .parquet(path)
    val written = replacement.select(col("bucket").cast("long"))
      .distinct().collect().map(_.getLong(0)).toSet
    val emptied = touched -- written
    if (emptied.nonEmpty) {
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      emptied.foreach { bid =>
        fs.delete(new org.apache.hadoop.fs.Path(path, s"bucket=$bid"), true)
      }
    }
    (touched.size.toLong, (written.size + emptied.size).toLong)
  }

  // ------------------------------------- versioned (time travel)

  /** Copy-on-write VERSIONED store — the Delta/Iceberg core mechanic
    * in plain parquet: data files are IMMUTABLE under
    * `path/v<N>/bucket=K`; a manifest (append-only parquet under
    * `path/_manifest`) maps each bucket to the version dir holding
    * its current file. A merge writes only the touched buckets under
    * a fresh v<N> and appends pointers — nothing is ever rewritten in
    * place, so EVERY older version stays fully readable (time
    * travel), and the write cost per merge is ∝ touched buckets.
    * Manifest rows: (version, bucket, vdir, empty) — `empty` marks a
    * bucket the merge emptied (a pointer to nothing beats deleting
    * history). */
  def writeVersioned(df: DataFrame, key: String, path: String,
                     buckets: Int): Unit = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val b = bucketed(df, key, buckets).localCheckpoint(true)
    b.repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col(key))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("bucket")
      .parquet(s"$path/v0")
    b.select(col("bucket").cast("long")).distinct()
      .select(lit(0L).as("version"), col("bucket"),
        lit(0L).as("vdir"), lit(false).as("empty"))
      .coalesce(1).write.mode(SaveMode.Append)
      .parquet(s"$path/_manifest")
  }

  /** Resolve the store AS OF `version`: latest manifest pointer per
    * bucket (≤ buckets rows collected — the layout constant), then
    * one partition-pruned read per distinct version dir. */
  def readVersioned(spark: SparkSession, path: String,
                    version: Long): DataFrame = {
    val ptr = spark.read.parquet(s"$path/_manifest")
      .filter(col("version") <= version)
      .groupBy(col("bucket"))
      .agg(max(struct(col("version").as("v"), col("vdir").as("vdir"),
        col("empty").as("empty"))).as("__m"))
      .select(col("bucket"), col("__m.vdir").as("vdir"),
        col("__m.empty").as("empty"))
      .filter(!col("empty"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    ptr.groupBy(_._2).map { case (vd, bks) =>
      spark.read.parquet(s"$path/v$vd")
        .filter(col("bucket").isin(bks.map(_._1).toSeq: _*))
    }.reduce(_ unionByName _)
  }

  /** Merge a batch as version `version` (must be one past the last):
    * touched buckets rebuild from the RESOLVED current state and land
    * under `path/v<version>`; the manifest gains one pointer per
    * touched bucket. Untouched buckets keep their old pointers — and
    * their bytes, forever. */
  def mergeVersioned(spark: SparkSession, path: String, version: Long,
                     batch: DataFrame, key: String,
                     buckets: Int): Unit = {
    val cur = readVersioned(spark, path, version - 1)
    val dataCols = cur.columns.filter(_ != "bucket").toSeq
    val b = bucketed(batch, key, buckets)
    val batchKeys = b.select(col(key)).distinct()
    val existingTouched = cur.join(batchKeys, Seq(key), "left_semi")
      .select(col("bucket").cast("long")).distinct()
    val upsertTouched = b.filter(col("op") === "U")
      .select(col("bucket").cast("long")).distinct()
    val touched = existingTouched.union(upsertTouched).distinct()
      .collect().map(_.getLong(0)).toSet
    if (touched.isEmpty) return
    val survivors = cur
      .filter(col("bucket").isin(touched.toSeq: _*))
      .join(batchKeys, Seq(key), "left_anti")
      .select(("bucket" +: dataCols).map(col): _*)
    val replacement = survivors.unionByName(
        b.filter(col("op") === "U")
          .select(("bucket" +: dataCols).map(col): _*))
      .localCheckpoint(true)
    replacement.repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col(key))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("bucket")
      .parquet(s"$path/v$version")
    val written = replacement.select(col("bucket").cast("long"))
      .distinct().collect().map(_.getLong(0)).toSet
    val rows = touched.toSeq.sorted.map { bk =>
      (version, bk, version, !written.contains(bk))
    }
    import spark.implicits._
    rows.toDF("version", "bucket", "vdir", "empty")
      .coalesce(1).write.mode(SaveMode.Append)
      .parquet(s"$path/_manifest")
  }

  /** Retention GC (VACUUM) for the versioned store: every version
    * dir that NO as-of view at or above `floor` resolves to is
    * deleted — time travel below the floor is surrendered, the
    * retention contract every production table format ships with.
    * The needed-set scan is per retained version a bounded
    * pointer-resolution (≤ buckets rows each; versions are bounded
    * by the retention window). Returns (deleted, retained) vdir
    * counts. */
  def vacuumVersions(spark: SparkSession, path: String,
                     floor: Long): (Long, Long) = {
    val man = spark.read.parquet(s"$path/_manifest")
      .localCheckpoint(true)
    val maxV = man.agg(max(col("version"))).head().getLong(0)
    val needed = (floor to maxV).flatMap { v =>
      man.filter(col("version") <= v)
        .groupBy(col("bucket"))
        .agg(max(struct(col("version").as("v"), col("vdir").as("vdir"),
          col("empty").as("empty"))).as("__m"))
        .filter(!col("__m.empty"))
        .select(col("__m.vdir")).distinct()
        .collect().map(_.getLong(0))
    }.toSet
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val all = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.matches("v\\d+"))
      .map(_.getPath.getName.stripPrefix("v").toLong)
    val doomed = all.filterNot(needed)
    doomed.foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(path, s"v$v"), true)
    }
    (doomed.length.toLong, needed.size.toLong)
  }

  /** [[mergeInto]] with an AUDIT CHANGELOG: the batch is classified
    * against the current store (updates = upsert keys present,
    * inserts = absent; deletes split into applied and no-op the same
    * way), the merge applies, and ONE row appends to `logPath` —
    * (version, n_updates, n_inserts, n_deletes, n_noop_deletes,
    * touched_buckets). The log is the table's lineage: append-only,
    * one row per merge, reconstructible from the batch definitions
    * (which is exactly what the oracle does). */
  def mergeIntoLogged(spark: SparkSession, path: String, logPath: String,
                      version: Long, batch: DataFrame, key: String,
                      buckets: Int): Unit = {
    val keysInStore = spark.read.parquet(path).select(col(key)).distinct()
      .localCheckpoint(true) // classify against the PRE-merge store
    val ups = batch.filter(col("op") === "U").select(col(key)).distinct()
    val dels = batch.filter(col("op") === "D").select(col(key)).distinct()
    val nUpd = ups.join(keysInStore, Seq(key), "left_semi").count()
    val nIns = ups.join(keysInStore, Seq(key), "left_anti").count()
    val nDel = dels.join(keysInStore, Seq(key), "left_semi").count()
    val nNoop = dels.join(keysInStore, Seq(key), "left_anti").count()
    val (touched, _) = mergeInto(spark, path, batch, key, buckets)
    spark.range(1).select(lit(version).as("version"),
        lit(nUpd).as("n_updates"), lit(nIns).as("n_inserts"),
        lit(nDel).as("n_deletes"), lit(nNoop).as("n_noop_deletes"),
        lit(touched).as("touched_buckets"))
      .coalesce(1).write.mode(SaveMode.Append).parquet(logPath)
  }

  /** Per-bucket content manifest of a store: row count, char mass,
    * and an order-pinned row hash — the read-back evidence a merge
    * gate compares against the pure-SQL expected final state. */
  def storeManifest(store: DataFrame, key: String): DataFrame =
    store.groupBy(col("bucket").cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("n_chars")).cast("long").as("sum_chars"),
        md5(array_join(transform(
          sort_array(collect_list(struct(col(key).as("k"),
            concat_ws(":", col(key), md5(col("text")), col("source"),
              col("lang")).as("s")))),
          x => x.getField("s")), "\n")).as("rows_md5"))
}
