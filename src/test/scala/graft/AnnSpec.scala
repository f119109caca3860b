package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{IvfIndex, Similarity}
import graft.functions.VectorFunctions

/** Compressed / constrained ANN primitives (q214–q216): sign
  * signatures, Hamming top-k, JL projection, and filtered IVF
  * search — including the pre-filter-vs-post-filter semantic the
  * operator exists for. */
class AnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vec(pos: Set[Int]): Array[Float] =
    (0 until 64).map(i => if (pos(i)) 1.0f else -1.0f).toArray

  test("signSignature64 sets exactly the positive-component bits") {
    val df = Seq((1L, vec(Set(0))), (2L, vec(Set(63))),
      (3L, vec(Set(0, 1, 2))), (4L, vec(Set.empty)))
      .toDF("vec_id", "embedding")
    val got = df.select(col("vec_id"),
        Similarity.signSignature64("embedding").as("sig"))
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == 1L)
    assert(got(2L) == Long.MinValue) // bit 63 — the DuckDB literal case
    assert(got(3L) == 7L)
    assert(got(4L) == 0L)
  }

  test("hammingTopK ranks by bit distance with id tie-break") {
    val sigs = Seq((10L, 0L), (11L, 1L), (12L, 3L), (13L, 3L),
      (14L, 0xffL)).toDF("n_id", "sig")
    val qs = Seq((10L, 0L)).toDF("q_id", "sig")
    val got = Similarity.hammingTopK(sigs, qs, k = 3)
      .orderBy("rk").as[(Long, Long, Long, Long)].collect()
    // 11 (1 bit), then 12 before 13 (2 bits each, id tie-break)
    assert(got.map(r => (r._2, r._3)).toSeq ==
      Seq((11L, 1L), (12L, 2L), (13L, 2L)))
  }

  test("jlSignMatrix is ±1 and jlProject of a one-hot row is a matrix column") {
    val m = VectorFunctions.jlSignMatrix(16, 64)
    assert(m.size == 16 && m.forall(_.size == 64))
    assert(m.flatten.forall(v => v == 1L || v == -1L))
    assert(m.flatten.toSet.size == 2) // both signs occur
    val oneHot = (0 until 64).map(i => if (i == 7) 1.0f else 0.0f).toArray
    val pv = Seq((1L, oneHot)).toDF("vec_id", "embedding")
      .select(VectorFunctions.jlProject(col("embedding"), m))
      .as[Seq[Long]].head
    assert(pv == m.map(row => row(7) * 10000L))
  }

  test("topKFiltered at nprobe=all == brute-force same-label top-k") {
    val e = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val seeds = Similarity.labelCentroids(
        e.select(col("label").cast("long").as("label"), col("embedding")),
        "label", "embedding")
      .orderBy(col("label")).collect().map(_.getSeq[Double](1).toArray)
    val (c0, indexed) = IvfIndex.buildFrom(e, "embedding", seeds, iters = 0)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id"), col("embedding"),
        col("label").cast("long").as("lab"))
    val ivf = IvfIndex.topKFiltered(
        indexed.withColumn("lab", col("label").cast("long")),
        c0, q, "vec_id", "embedding", "lab", k = 5, nprobe = seeds.length)
      .select("q_id", "n_id", "rk").as[(Long, Long, Long)].collect().toSet
    val cand = e.select(col("vec_id").as("n_id"),
      col("embedding").as("n_vec"), col("label").cast("long").as("n_lab"))
    val exact = Similarity.topKPerKey(
        cand.crossJoin(broadcast(q.select(col("vec_id").as("q_id"),
            col("embedding").as("q_vec"), col("lab").as("q_lab"))))
          .filter(col("q_id") =!= col("n_id") &&
            col("n_lab") === col("q_lab"))
          .select(col("q_id"), col("n_id"),
            round(VectorFunctions.cosine(col("q_vec"), col("n_vec")), 4)
              .as("cos")), 5)
      .select("q_id", "n_id", "rk").as[(Long, Long, Long)].collect().toSet
    assert(ivf == exact)
  }

  test("hammingTopK plan: signature scan never shuffles — one " +
    "broadcast in, one rank exchange out") {
    val e = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val sigs = e.select(col("vec_id").as("n_id"),
      Similarity.signSignature64("embedding").as("sig"))
    val qs = sigs.filter(col("n_id") < 5)
      .select(col("n_id").as("q_id"), col("sig"))
    val plan = Similarity.hammingTopK(sigs, qs, k = 3)
      .queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the corpus-side signature scan feeds the broadcast join and the
    // per-partition heaps directly; the ONLY shuffle in the whole
    // plan is the final |partitions|·|queries|·k candidate rank
    val shuffles = "(?<!Broadcast)Exchange".r.findAllIn(plan).length
    assert(shuffles == 1, s"expected exactly 1 shuffle exchange:\n$plan")
  }

  test("pre-filter finds k matches where post-filtering under-fills") {
    val e = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val seeds = Similarity.labelCentroids(
        e.select(col("label").cast("long").as("label"), col("embedding")),
        "label", "embedding")
      .orderBy(col("label")).collect().map(_.getSeq[Double](1).toArray)
    val (c0, indexed) = IvfIndex.buildFrom(e, "embedding", seeds, iters = 0)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding"),
        col("label").cast("long").as("lab"))
    val lab = indexed.withColumn("lab", col("label").cast("long"))
    val filtered = IvfIndex.topKFiltered(lab, c0, q,
      "vec_id", "embedding", "lab", k = 5, nprobe = seeds.length)
    // post-filter: unconstrained top-5, then keep same-label rows
    val unconstrained = IvfIndex.topK(indexed, c0, q,
      "vec_id", "embedding", k = 5, nprobe = seeds.length)
    val labels = e.select(col("vec_id").as("n_id"),
      col("label").cast("long").as("n_lab"))
    val qLabels = q.select(col("vec_id").as("q_id"), col("lab").as("q_lab"))
    val post = unconstrained.join(labels, "n_id").join(qLabels, "q_id")
      .filter(col("n_lab") === col("q_lab"))
    val nFiltered = filtered.count()
    val nPost = post.count()
    assert(nFiltered == 10 * 5, s"pre-filter should fill k: $nFiltered")
    assert(nPost < nFiltered,
      s"post-filtering should under-fill ($nPost vs $nFiltered)")
  }

  test("silhouette: separated clusters score near 1, shuffled labels near 0") {
    // two orthogonal-direction clusters with small deterministic jitter
    def member(cluster: Int, i: Int): Array[Float] =
      (0 until 64).map { j =>
        val base = if (j < 32 == (cluster == 0)) 1.0f else 0.05f
        base + 0.01f * ((i * 7 + j * 3) % 5)
      }.toArray
    val rows = (0 until 40).map(i => (i.toLong, (i % 2).toLong, member(i % 2, i)))
    val good = Similarity.silhouette(
        rows.toDF("vec_id", "label", "embedding"),
        "vec_id", "label", "embedding")
      .select(col("label"), col("mean_sil")).as[(Long, Double)]
      .collect().toMap
    assert(good.size == 2)
    good.values.foreach(s => assert(s > 0.8, s"separated clusters: $s"))
    // same vectors, labels decoupled from geometry → no structure
    val badRows = rows.map { case (id, _, v) => (id, id % 2, v) }
      .map { case (id, l, v) => (id, if (id < 20) 0L else 1L, v) }
    val bad = Similarity.silhouette(
        badRows.toDF("vec_id", "label", "embedding"),
        "vec_id", "label", "embedding")
      .select(col("mean_sil")).as[Double].collect()
    bad.foreach(s => assert(s < 0.2, s"shuffled labels: $s"))
  }
}
