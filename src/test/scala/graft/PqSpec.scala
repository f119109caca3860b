package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Pq

/** Product-quantization pins: the ADC identity (the scan's lookup-table
  * sum IS the L2² distance to the codeword reconstruction — the
  * defining equation of PQ), seed self-encoding, the zero-exchange
  * encode plan, and a recall sanity floor against exact L2. */
class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 8
  private val m = 4 // sub = 2
  // 40 deterministic vectors in 4 loose clusters
  private lazy val vecs = (0L until 40L).map { i =>
    val c = (i % 4).toInt
    (i, Array.tabulate(dim)(d =>
      (c * 10 + ((i * 7 + d * 3) % 5).toInt * 0.1 + d * 0.01).toFloat))
  }
  private lazy val df = vecs.toDF("vec_id", "embedding")

  test("m must divide dim") {
    val cb = Pq.seedCodebook(df, "vec_id", "embedding", 4)
    intercept[IllegalArgumentException] {
      Pq.encode(df, "vec_id", "embedding", cb, 3)
    }
  }

  test("codes are m entries in [0, k); seed vectors encode to themselves") {
    val k = 8
    val cb = Pq.seedCodebook(df, "vec_id", "embedding", k)
    val codes = Pq.encode(df, "vec_id", "embedding", cb, m)
      .as[(Long, Array[Int])].collect().toMap
    assert(codes.size == 40 && codes.values.forall(c =>
      c.length == m && c.forall(x => x >= 0 && x < k)))
    // find each seed row's id by matching the collected codebook vector
    val byVec = vecs.map { case (id, v) => v.toSeq -> id }.toMap
    cb.zipWithIndex.foreach { case (w, c) =>
      val id = byVec(w.toSeq)
      assert(codes(id).forall(_ == c) ||
        // a subspace tie to an identical earlier codeword is the only out
        codes(id).zipWithIndex.forall { case (got, j) =>
          got == c || cb(got).slice(j * 2, j * 2 + 2).sameElements(
            w.slice(j * 2, j * 2 + 2))
        }, s"seed $c (id $id) got ${codes(id).mkString(",")}")
    }
  }

  test("ADC identity: reported dist == round(L2² to the codeword reconstruction, 4)") {
    val k = 8
    val cb = Pq.seedCodebook(df, "vec_id", "embedding", k)
    val codes = Pq.encode(df, "vec_id", "embedding", cb, m)
    val sub = dim / m
    val codeMap = codes.as[(Long, Array[Int])].collect().toMap
    val out = Pq.topK(codes, df.filter($"vec_id" < 5), "vec_id", "embedding",
      cb, m, 3).as[(Long, Long, Double, Long)].collect()
    assert(out.length == 15) // 3 per query
    val byId = vecs.toMap
    out.foreach { case (qId, nId, dist, _) =>
      val q = byId(qId)
      val recon = codeMap(nId).zipWithIndex.flatMap { case (c, j) =>
        cb(c).slice(j * sub, (j + 1) * sub)
      }
      val exact = q.zip(recon).map { case (a, b) =>
        val d = a.toDouble - b.toDouble; d * d
      }.sum
      assert(math.abs(dist - exact) < 1.5e-4, // both rounded at 4 decimals
        s"q=$qId n=$nId adc=$dist recon=$exact")
    }
  }

  test("native PQ kernels are bit-identical to the unrolled composition") {
    val cb = Pq.seedCodebook(df, "vec_id", "embedding", 8)
    val nat = df.select($"vec_id", Pq.codesCol($"embedding", cb, m).as("c"))
      .as[(Long, Array[Int])].collect().toMap
    val comp = df.select($"vec_id",
        Pq.codesColComposed($"embedding", cb, m).as("c"))
      .as[(Long, Array[Int])].collect().toMap
    assert(nat.size == 40)
    nat.foreach { case (k, v) => assert(v.sameElements(comp(k)), s"codes @$k") }
    val lutN = df.filter($"vec_id" < 3)
      .select($"vec_id", Pq.lutCol($"embedding", cb, m, dim / m).as("l"))
      .as[(Long, Array[Array[Double]])].collect().toMap
    val lutC = df.filter($"vec_id" < 3)
      .select($"vec_id", Pq.lutColComposed($"embedding", cb, m, dim / m).as("l"))
      .as[(Long, Array[Array[Double]])].collect().toMap
    lutN.foreach { case (k, v) =>
      v.zip(lutC(k)).foreach { case (a, b) =>
        assert(a.sameElements(b), s"lut @$k") // bit-identical doubles
      }
    }
  }

  test("encode is a zero-exchange projection") {
    val cb = Pq.seedCodebook(df, "vec_id", "embedding", 4)
    val plan = Pq.encode(df, "vec_id", "embedding", cb, m)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("IVF-PQ with every list probed equals full-scan PQ exactly") {
    import graft.operators.IvfIndex
    val k = 8
    val cb = Pq.seedCodebook(df, "vec_id", "embedding", k)
    val (centroids, indexed) =
      IvfIndex.build(df, "vec_id", "embedding", k = 4)
    val coded = indexed.select(col("list_id"), col("vec_id"),
      Pq.codesCol(col("embedding"), cb, m).as("codes"))
    val queries = df.filter($"vec_id" < 5)
    val full = Pq.topK(Pq.encode(df, "vec_id", "embedding", cb, m),
      queries, "vec_id", "embedding", cb, m, 3)
      .as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4))
    val ivfpq = Pq.topKIvf(coded, centroids, queries, "vec_id", "embedding",
      cb, m, k = 3, nprobe = 4)
      .as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4))
    assert(ivfpq.sameElements(full))
    indexed.unpersist()
  }

  test("IVF-PQ pruned probes: bounded scan keeps most of the full-scan top-3") {
    import graft.operators.IvfIndex
    val cb = Pq.seedCodebook(df, "vec_id", "embedding", 8)
    val (centroids, indexed) =
      IvfIndex.build(df, "vec_id", "embedding", k = 4)
    val coded = indexed.select(col("list_id"), col("vec_id"),
      Pq.codesCol(col("embedding"), cb, m).as("codes"))
    val queries = df.filter($"vec_id" < 10)
    val full = Pq.topK(Pq.encode(df, "vec_id", "embedding", cb, m),
      queries, "vec_id", "embedding", cb, m, 3)
      .as[(Long, Long, Double, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val pruned = Pq.topKIvf(coded, centroids, queries, "vec_id", "embedding",
      cb, m, k = 3, nprobe = 2)
      .as[(Long, Long, Double, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = (0L until 10L).map(q =>
      (pruned.getOrElse(q, Set.empty) & full(q)).size.toDouble / 3).sum / 10
    assert(recall >= 0.5, s"nprobe=2/4 recall vs full PQ = $recall")
    indexed.unpersist()
  }

  test("two-level IVF-PQ: every cell probed equals full-scan PQ; pruned " +
      "probes keep most of the top-3") {
    import graft.operators.IvfIndex
    val cb = Pq.seedCodebook(df, "vec_id", "embedding", 8)
    val (coarse, fineSeeds, lists) = IvfIndex.buildTwoLevel(
      df.select(col("vec_id"), col("embedding")), "vec_id", "embedding",
      k1 = 3, k2 = 2, coarseIters = 1)
    val coded = lists.select(col("list_id"), col("fine_id"), col("vec_id"),
      Pq.codesCol(col("embedding"), cb, m).as("codes"))
    val queries = df.filter($"vec_id" < 10)
    val full = Pq.topK(Pq.encode(df, "vec_id", "embedding", cb, m),
      queries, "vec_id", "embedding", cb, m, 3)
      .as[(Long, Long, Double, Long)].collect()
    // every (coarse, fine) cell probed: the ADC scan union is the
    // whole corpus — row-identical to the flat full scan
    val fullProbe = Pq.topKIvf2(coded, coarse, fineSeeds, queries,
        "vec_id", "embedding", cb, m, k = 3, nprobe1 = 3, nprobe2 = 2)
      .as[(Long, Long, Double, Long)].collect()
    assert(fullProbe.sortBy(r => (r._1, r._4))
      .sameElements(full.sortBy(r => (r._1, r._4))))
    val fullBy = full.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val pruned = Pq.topKIvf2(coded, coarse, fineSeeds, queries,
        "vec_id", "embedding", cb, m, k = 3, nprobe1 = 2, nprobe2 = 1)
      .as[(Long, Long, Double, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = (0L until 10L).map(q =>
      (pruned.getOrElse(q, Set.empty) & fullBy(q)).size.toDouble / 3).sum / 10
    assert(recall >= 0.4, s"(2,1)/(3,2) probe recall vs full PQ = $recall")
  }

  test("rerank: scores are exact cosines; recall@3 >= raw PQ against exact top-3") {
    import graft.functions.VectorKernels
    val k = 8
    val cb = Pq.seedCodebook(df, "vec_id", "embedding", k)
    val codes = Pq.encode(df, "vec_id", "embedding", cb, m)
    val queries = df.filter($"vec_id" < 10)
    val byId = vecs.toMap
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rer = Pq.topKRerank(codes, queries, df, "vec_id", "embedding",
      cb, m, k = 3, shortlist = 8).as[(Long, Long, Double, Long)].collect()
    rer.foreach { case (q, n, cos, _) =>
      assert(cos == r4(VectorKernels.cosineArr(byId(q), byId(n))),
        s"rerank cos for ($q,$n) is not the exact cosine")
    }
    // exact cosine top-3 per query (the ground truth)
    val exact = (0L until 10L).map { q =>
      q -> vecs.filter(_._1 != q).map { case (id, v) =>
        (id, r4(VectorKernels.cosineArr(byId(q), v)))
      }.sortBy { case (id, c) => (-c, id) }.take(3).map(_._1).toSet
    }.toMap
    def recall(res: Map[Long, Set[Long]]) =
      (0L until 10L).map(q => (res.getOrElse(q, Set.empty) & exact(q)).size).sum / 30.0
    val rerBy = rer.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // raw PQ ranks by quantized L2; compare its cosine-truth recall
    val pqBy = Pq.topK(codes, queries, "vec_id", "embedding", cb, m, 3)
      .as[(Long, Long, Double, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(recall(rerBy) >= recall(pqBy),
      s"rerank ${recall(rerBy)} < raw PQ ${recall(pqBy)}")
  }

  test("encodeSaved: batch codes through the persisted codebook == direct encode") {
    val cb = Pq.seedCodebook(df.filter($"vec_id" < 30), "vec_id", "embedding", 8)
    Pq.saveCodebook(spark, "g_pq_cb_spec", cb)
    try {
      val batch = df.filter($"vec_id" >= 30)
      val saved = Pq.encodeSaved(spark, "g_pq_cb_spec", batch,
        "vec_id", "embedding", m).as[(Long, Array[Int])].collect().toMap
      val direct = Pq.encode(batch, "vec_id", "embedding", cb, m)
        .as[(Long, Array[Int])].collect().toMap
      assert(saved.size == 10)
      saved.foreach { case (k, v) => assert(v.sameElements(direct(k)), s"@$k") }
      // round-trip preserves the codebook bit-for-bit (codes stay comparable)
      val loaded = Pq.loadCodebook(spark, "g_pq_cb_spec")
      cb.zip(loaded).foreach { case (a, b) => assert(a.sameElements(b)) }
    } finally graft.operators.Bucketing.dropManagedTable(spark, "g_pq_cb_spec")
  }

  test("recall sanity: PQ@3 finds most exact-L2 top-3 in a clustered corpus") {
    val k = 8
    val cb = Pq.seedCodebook(df, "vec_id", "embedding", k)
    val codes = Pq.encode(df, "vec_id", "embedding", cb, m)
    val queries = df.filter($"vec_id" < 10)
    val pq = Pq.topK(codes, queries, "vec_id", "embedding", cb, m, 3)
      .as[(Long, Long, Double, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val byId = vecs.toMap
    val exact = (0L until 10L).map { qId =>
      val q = byId(qId)
      qId -> vecs.filter(_._1 != qId).map { case (id, v) =>
        (id, q.zip(v).map { case (a, b) =>
          val d = a.toDouble - b.toDouble; d * d
        }.sum)
      }.sortBy { case (id, d) => (d, id) }.take(3).map(_._1).toSet
    }.toMap
    // cluster-distances dwarf quantization error, so the same-cluster
    // top-3 should largely survive: mean recall well above chance
    val recall = (0L until 10L).map(q =>
      (pq(q) & exact(q)).size.toDouble / 3).sum / 10
    assert(recall >= 0.6, s"recall@3 = $recall")
  }
}
