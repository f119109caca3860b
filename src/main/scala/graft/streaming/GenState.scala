package graft.streaming

/** GENERATION-LEDGER state substrate for EXPORT-class streaming
  * sinks — the machinery [[StreamingSealed]] proved out, factored so
  * the next sink of its class lands on it once:
  *
  *   - a GENERATION TEXT FILE (`<root>/<prefix><gen>`): published
  *     complete-or-absent via temp+rename, newest generation wins,
  *     older ones GC'd after the new one is durable. No crash point
  *     ever reads as "no state" once a generation has committed, and
  *     there is no torn-read case to guess about.
  *   - GENERATION DATAFRAME DIRS (`<root>/<dir>/b<gen>`): a parquet
  *     table whose each version publishes as its own dir BEFORE the
  *     state file that names it — a crash between leaves a stray
  *     generation the next attempt deletes ([[gcDirGens]]) before
  *     rewriting.
  *
  * TAXONOMY (why not every sink uses this): this engine's streaming
  * sinks split into two state classes. EXPORT-class sinks (sealed
  * conversation export) append to an out dir they can never rewrite,
  * so their ledger must live OUT-OF-BAND — these generation files,
  * plus an inventory diff to heal torn appends. KEYED-STORE-class
  * sinks ([[StreamingSft]]'s bucketed state, the lakehouse/stats
  * sinks) fold into a store whose merge is already atomic per
  * bucket, so their ledger rides IN-BAND as sentinel rows committed
  * by the same merge that lands the data — moving it out here would
  * ADD a crash window between data and ledger that their in-band
  * design doesn't have. The two classes are deliberately different;
  * this object is the shared substrate for the first.
  */
private[streaming] object GenState {

  type Fs = org.apache.hadoop.fs.FileSystem

  /** Complete (non-`.tmp`) generation numbers of `prefix`-named
    * state files under `root`, ascending. */
  def gens(fs: Fs, root: String, prefix: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(p)) return Nil
    fs.listStatus(p).map(_.getPath.getName)
      .filter(n => n.startsWith(prefix) && !n.endsWith(".tmp"))
      .map(_.stripPrefix(prefix).toLong).toSeq.sorted
  }

  /** Text of the newest complete generation — `None` only before the
    * first publish. */
  def readNewest(fs: Fs, root: String, prefix: String): Option[String] =
    gens(fs, root, prefix).lastOption.map { g =>
      val in = fs.open(new org.apache.hadoop.fs.Path(root, prefix + g))
      try new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
      finally in.close()
    }

  /** Publish `text` as generation `max(genHint, newest + 1)` via the
    * temp+rename discipline, then GC the older generations (the new
    * one is durably in place). A caller with a monotone external id
    * (a streaming batchId) passes it as `genHint` so generations stay
    * id-named; an id-less maintenance publish passes 0 and takes the
    * next free number. Returns the generation published. */
  def publish(fs: Fs, root: String, prefix: String, genHint: Long,
              text: String): Long = {
    val gen = math.max(genHint,
      gens(fs, root, prefix).maxOption.map(_ + 1).getOrElse(0L))
    val p = new org.apache.hadoop.fs.Path(root, prefix + gen)
    val tmp = new org.apache.hadoop.fs.Path(root, prefix + gen + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(text.getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"state publish failed: $tmp -> $p")
    gens(fs, root, prefix).filter(_ != gen).foreach { g =>
      fs.delete(new org.apache.hadoop.fs.Path(root, prefix + g), false)
    }
    gen
  }

  // ------------------- generation dataframe dirs (<root>/<dir>/b<gen>)

  def dirPath(root: String, dir: String, gen: Long): String =
    s"$root/$dir/b$gen"

  def dirGens(fs: Fs, root: String, dir: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(root, dir)
    if (!fs.exists(p)) return Nil
    fs.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith("b"))
      .map(_.stripPrefix("b").toLong).toSeq.sorted
  }

  /** Delete generations other than `keep` (the newest LEDGERED one)
    * — strays are a crashed attempt's unpublished write. */
  def gcDirGens(fs: Fs, root: String, dir: String,
                keep: Option[Long]): Unit =
    dirGens(fs, root, dir).filterNot(keep.contains).foreach { g =>
      fs.delete(
        new org.apache.hadoop.fs.Path(dirPath(root, dir, g)), true)
    }
}
