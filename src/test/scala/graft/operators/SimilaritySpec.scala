package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.9f, 0.1f)),
    (4L, Array(-1.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("cosine matches hand math") {
    val c = vecs.filter($"vec_id" === 0).as("a")
      .crossJoin(vecs.filter($"vec_id" === 2).as("b"))
      .select(Similarity.cosine(col("a.embedding"), col("b.embedding")))
      .as[Double].head()
    assert(math.abs(c) < 1e-12) // orthogonal
  }

  test("brute-force top-k ranks by cosine with deterministic ties") {
    val top = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0), 2)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    assert(top.map(_._2).toSeq == Seq(1L, 2L))
    assert(top.head._3 > 0.99)
  }

  test("IVF with a matching centroid finds the true neighbor in-cell") {
    val assigned = Similarity.assignCells(vecs, vecs.filter($"vec_id" < 2))
    val cells = assigned.select("vec_id", "cell").as[(Long, Long)]
      .collect().toMap
    assert(cells(0L) == 0L && cells(1L) == 1L || cells(1L) == 1L)
    assert(cells(2L) == 1L) // y-axis closer to (0.9,0.1,0) than (1,0,0)
    val top = Similarity.ivfTopK(assigned, 2L, 2)
      .as[(Long, Double, Int)].collect()
    assert(top.nonEmpty && top.forall(r => cells(r._1) == cells(2L)))
  }

  test("unit vectors have norm 1") {
    val norms = Similarity.withUnitVector(vecs, "embedding")
      .select(Similarity.dotD($"uv", $"uv")).as[Double].collect()
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-12))
  }

  test("dot product propagates null elements like the HOF formulation") {
    val withNulls = Seq(
      (0L, Seq[Option[Float]](Some(1.0f), None, Some(2.0f)), Seq(1.0f, 1.0f, 1.0f)),
      (1L, Seq[Option[Float]](Some(1.0f), Some(2.0f), Some(3.0f)), Seq(1.0f, 1.0f, 1.0f))
    ).toDF("id", "a", "b")
    val native = withNulls
      .select($"id", Similarity.dot($"a", $"b").as("d"))
      .as[(Long, Option[Double])].collect().toMap
    val hof = withNulls
      .select($"id", aggregate(zip_with($"a", $"b",
        (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("d"))
      .as[(Long, Option[Double])].collect().toMap
    assert(native(0L).isEmpty, "null element must null the dot")
    assert(native(1L).contains(6.0))
    assert(native == hof, "native and HOF must agree on null semantics")
  }

  test("RP-LSH: duplicates collide in every band; candidates stay equi-joined") {
    val dim = 8
    // planted exact duplicate (0,1), a scaled copy (0,2 — same direction,
    // so identical sign bits), and an antipodal vector (3: all bits flip)
    val base = Seq(
      (0L, Array.tabulate(dim)(i => (i + 1).toFloat)),
      (1L, Array.tabulate(dim)(i => (i + 1).toFloat)),
      (2L, Array.tabulate(dim)(i => 2f * (i + 1))),
      (3L, Array.tabulate(dim)(i => -(i + 1).toFloat))
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.rpLshNearDups(base, "vec_id", "embedding",
      bits = 16, bands = 4, dim = dim)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    val got = pairs.as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(math.abs(got((0L, 1L)) - 1.0) < 1e-12, "exact dup must score 1")
    assert(math.abs(got((0L, 2L)) - 1.0) < 1e-12, "same-direction dup collides")
    assert(!got.contains((0L, 3L)), "antipodal vector shares no sign band")
    FrameCaches.release(spark)
  }

  test("kmeans: objective is monotone over rounds on real embeddings") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    def objective(iters: Int): Double = {
      val cents = Similarity.kmeansCentroids(e, 8, iters)
      val cu = Similarity.withUnitVector(cents, "embedding")
        .select(col("vec_id").as("cell"), col("uv").as("cuv"))
      Similarity.assignCells(e, cents).join(cu, "cell")
        .agg(avg(Similarity.dotD(col("uv"), col("cuv")))).head().getDouble(0)
    }
    val o1 = objective(1)
    val o3 = objective(3)
    assert(o3 >= o1 - 1e-9, s"Lloyd objective decreased: $o1 -> $o3")
    // training must separate better than (or as well as) first-k-rows
    // centroids — the whole point of the trained build
    val naiveCu = Similarity.withUnitVector(
        e.filter($"vec_id" < 8), "embedding")
      .select(col("vec_id").as("cell"), col("uv").as("cuv"))
    val naive = Similarity.assignCells(e, e.filter($"vec_id" < 8))
      .join(naiveCu, "cell")
      .agg(avg(Similarity.dotD(col("uv"), col("cuv")))).head().getDouble(0)
    assert(o3 >= naive - 1e-9, s"trained worse than first-k: $naive -> $o3")
    FrameCaches.release(spark)
  }

  test("kmeans: deterministic on one partition; empty cells carry forward") {
    // 3 identical vectors, k=2: everything assigns to centroid 1 (ties
    // break low), so centroid 2 loses all members and must carry its
    // seed forward instead of vanishing or going null
    val tiny = Seq(
      (1L, Array(3.0f, 0.0f)), (2L, Array(3.0f, 0.0f)), (3L, Array(3.0f, 0.0f))
    ).toDF("vec_id", "embedding").coalesce(1)
    def run() = Similarity.kmeansCentroids(tiny, 2, 2).orderBy("vec_id")
      .as[(Long, Seq[Double])].collect().toSeq
    val a = run()
    assert(a.map(_._1) == Seq(1L, 2L))
    assert(a.forall(_._2 == Seq(1.0, 0.0))) // unit-normalized everywhere
    assert(a == run(), "same input, same plan: result must be identical")
    FrameCaches.release(spark)
  }

  test("measured recall@10: IVF probe-1 / nprobe-2 / k-means-trained vs brute force") {
    // the ANN quality gate: every IVF variant's top-10 is scored against
    // the exact brute-force top-10 on the real embeddings (the v2 ground
    // truth), with pinned floors — "approximate by construction" is a
    // recall NUMBER, not a shrug. Queries mirror v5/v8 (vec_id 100-104).
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = e.filter($"vec_id" >= 100 && $"vec_id" < 105)
    val k = 10
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val truth = topSets(Similarity.bruteForceTopK(e, queries, k))
    assert(truth.size == 5 && truth.values.forall(_.size == k))
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = topSets(df)
      truth.map { case (q, t) =>
        (got.getOrElse(q, Set.empty) & t).size.toDouble / t.size
      }.sum / truth.size
    }
    val firstK = e.filter($"vec_id" < 8)
    val assignedF = Similarity.assignCells(e, firstK).persist()
    val rProbe1 = recall(Similarity.ivfTopKBatch(assignedF, firstK, queries, k, nprobe = 1))
    val rProbe2 = recall(Similarity.ivfTopKBatch(assignedF, firstK, queries, k, nprobe = 2))
    val trained = Similarity.kmeansCentroids(e, 8, iters = 3)
    val assignedT = Similarity.assignCells(e, trained, vecCol = "embedding").persist()
    val rTrained = recall(Similarity.ivfTopKBatch(assignedT, trained, queries, k, nprobe = 2))
    info(f"recall@10 probe1=$rProbe1%.2f firstK-nprobe2=$rProbe2%.2f trained-nprobe2=$rTrained%.2f")
    // deterministic pipeline ⇒ exact measured values (0.10 / 0.26 / 0.48,
    // recorded in BASELINE.md); floors sit just below so an algorithmic
    // regression trips them but a benign re-measure does not
    assert(rProbe1 >= 0.08, s"probe-1 recall collapsed: $rProbe1")
    assert(rProbe2 >= rProbe1 - 1e-9, s"widening the probe cannot lose recall: $rProbe1 -> $rProbe2")
    assert(rProbe2 >= 0.20, s"nprobe-2 recall collapsed: $rProbe2")
    assert(rTrained >= 0.40, s"trained-centroid recall collapsed: $rTrained")
    assert(rTrained >= rProbe2 - 1e-9,
      s"k-means-trained centroids must not trail first-k rows: $rProbe2 -> $rTrained")
    assignedF.unpersist(); assignedT.unpersist()
    FrameCaches.release(spark)
  }

  test("PQ/ADC recall@10 vs brute force; codebook and codes are structurally sound") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = e.filter($"vec_id" >= 100 && $"vec_id" < 105)
    val k = 10
    val (m, sub, kc) = (16, 4, 64)
    val cu = Similarity.withUnitVector(e, "embedding").select($"vec_id", $"uv")
    val codes = Similarity
      .withQuantized(cu, Similarity.quantStats(cu, "uv"), "uv")
      .select($"vec_id", $"qv").persist()
    val cb = Similarity.pqCodebook(codes, m, sub, kc)
    // structural laws: m*k codewords of sub dims; every corpus vector
    // encodes to exactly m codes in [0, k)
    assert(cb.count() == m.toLong * kc)
    assert(cb.filter(size($"cw") =!= sub).count() == 0)
    val enc = Similarity.pqEncode(codes, cb, m, sub).persist()
    val n = codes.count()
    assert(enc.count() == n * m, "every vector must emit m codes")
    assert(enc.filter($"code" < 0 || $"code" >= kc).count() == 0)
    // a pivot row reconstructs ITSELF: its own subvectors are at
    // distance 0, so its ADC score against itself-as-query equals its
    // exact quantized self-dot — check via the codebook: every pivot's
    // encode picks its own codeword (distance 0 is the unique minimum
    // unless another codeword ties exactly, which min(struct) breaks
    // deterministically)
    val truth = Similarity.bruteForceTopK(e, queries, k)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = Similarity.pqAdcTopK(enc, cb, codes.filter($"vec_id" >= 100 && $"vec_id" < 105), k, sub)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = truth.map { case (q, t) =>
      (got.getOrElse(q, Set.empty) & t).size.toDouble / t.size
    }.sum / truth.size
    info(f"PQ m=$m sub=$sub k=$kc recall@10=$recall%.2f")
    // deterministic pipeline ⇒ exact measured value (0.56, BASELINE.md;
    // the m=4 coarse split measured 0.12 — the sweep is recorded);
    // floor just below so regressions trip but re-measures don't
    assert(recall >= 0.5, s"PQ recall collapsed: $recall")
    codes.unpersist(); enc.unpersist()
    FrameCaches.release(spark)
  }

  test("quantized top-10 tracks the exact float ranking (measured recall)") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = e.filter($"vec_id" >= 100 && $"vec_id" < 105)
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val truth = topSets(Similarity.bruteForceTopK(e, queries, 10))
    val got = topSets(Similarity.quantizedTopK(e, queries, 10))
    val recall = truth.map { case (q, t) =>
      (got.getOrElse(q, Set.empty) & t).size.toDouble / t.size
    }.sum / truth.size
    info(f"int8-quantized recall@10 = $recall%.2f")
    // symmetric int8 on 64 dims measured 1.00 here (BASELINE.md); an
    // affine (per-dim min/max) quantizer measured 0.10 — this floor is
    // the tripwire for that class of regression
    assert(recall >= 0.95, s"quantized recall collapsed: $recall")
  }

  test("IVF-SQ8 recall matches the float IVF path (quantization costs nothing here)") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = e.filter($"vec_id" >= 100 && $"vec_id" < 105)
    val centroids = e.filter($"vec_id" < 8)
    val assigned = Similarity.assignCells(e, centroids).persist()
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recall(got: Map[Long, Set[Long]], truth: Map[Long, Set[Long]]): Double =
      truth.map { case (q, t) =>
        (got.getOrElse(q, Set.empty) & t).size.toDouble / t.size
      }.sum / truth.size
    val truth = topSets(Similarity.bruteForceTopK(e, queries, 10))
    val rFloat = recall(
      topSets(Similarity.ivfTopKBatch(assigned, centroids, queries, 10, nprobe = 2)), truth)
    val rSq8 = recall(
      topSets(Similarity.ivfQuantizedTopKBatch(assigned, centroids, queries, 10, nprobe = 2)), truth)
    info(f"recall@10 ivf-float=$rFloat%.2f ivf-sq8=$rSq8%.2f")
    // candidate pruning dominates; int8 scoring inside the probed cells
    // must not cost measurable recall (v9 measured lossless here)
    assert(rSq8 >= rFloat - 0.05, s"quantization cost recall: $rFloat -> $rSq8")
    assigned.unpersist()
  }

  test("integer k-means: deterministic, empty cells carry, recall holds") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = e.filter($"vec_id" >= 100 && $"vec_id" < 105)
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val truth = topSets(Similarity.bruteForceTopK(e, queries, 10))
    def run() = Similarity.kmeansQuantizedTopK(e, queries, 10, 8, iters = 2)
    val first = run().orderBy("query_id", "rank")
      .as[(Long, Long, Long, Int)].collect().toSeq
    // exact integer training loop: two runs must agree bit-for-bit —
    // this is the property that makes v11 a full oracle row where the
    // float k-means (v8) is rows-only
    assert(first == run().orderBy("query_id", "rank")
      .as[(Long, Long, Long, Int)].collect().toSeq)
    val got = topSets(run())
    val recall = truth.map { case (q, t) =>
      (got.getOrElse(q, Set.empty) & t).size.toDouble / t.size
    }.sum / truth.size
    info(f"integer-kmeans IVF-SQ8 recall@10 = $recall%.2f")
    assert(recall >= 0.30, s"integer-trained recall collapsed: $recall")
    // empty-cell carry-forward: identical codes, k=2 → cell 2 empties
    val tiny = Seq(
      (1L, Array(3.0f, 0.0f)), (2L, Array(3.0f, 0.0f)), (3L, Array(3.0f, 0.0f))
    ).toDF("vec_id", "embedding").coalesce(1)
    val cu = Similarity.withUnitVector(tiny, "embedding")
      .select(col("vec_id"), col("uv"))
    val codes = Similarity.withQuantized(cu,
      Similarity.quantStats(cu, "uv"), "uv").select(col("vec_id"), col("qv"))
    val cents = Similarity.kmeansCentroidsQuantized(codes, 2, iters = 2)
      .orderBy("centroid_id").as[(Long, Seq[Long], Long)].collect().toSeq
    assert(cents.map(_._1) == Seq(1L, 2L))
    assert(cents.head._3 == 3L) // all three members landed on centroid 1
    assert(cents(1)._3 == 1L && cents(1)._2 == Seq(127L, 0L),
      "emptied cell must carry its seed forward")
    FrameCaches.release(spark)
  }

  test("cross-corpus ANN matches a planted duplicate; ref never self-matches") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val ref = e.filter($"vec_id" < 400)
    // batch = copies of two ref vectors under new ids + the real tail
    val planted = ref.filter($"vec_id".isin(42L, 99L))
      .withColumn("vec_id", $"vec_id" + 1000L)
    val batch = e.filter($"vec_id" >= 400).unionByName(planted)
    val out = Similarity.crossCorpusQuantizedMatches(batch, ref,
        minScore = 24000L, numCentroids = 8, nprobe = 2)
      .as[(Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // only batch ids on the left — the reference is never self-joined
    assert(out.forall(_._1 >= 400L))
    // an exact copy lands in its original's cell and scores ~the code
    // self-dot — it MUST be found
    val hits = out.filter(r => r._1 == 1042L || r._1 == 1099L).map(r => (r._1, r._2))
    assert(hits.contains((1042L, 42L)) && hits.contains((1099L, 99L)),
      s"planted duplicates must match their originals, got ${hits.toSeq}")
  }

  // two orthogonal families; ids ordered so the k=2 lowest-id seeds
  // land one per family. Family X = {1, 3, 4 identical, 9 perturbed},
  // family Y = {2, 21 near-dup pair}. In each duplicate group the
  // PERTURBED member is farthest from its centroid (the centroid is
  // dominated by the identical copies) and carries the HIGHEST id —
  // so the centroid-farthest keeper provably differs from min-id.
  private def semCorpus = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
    (3L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (4L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (9L, Array(0.9f, 0.436f, 0.0f, 0.0f)),
    (21L, Array(0.0f, 0.0f, 0.98f, 0.2f))
  ).toDF("vec_id", "embedding")

  test("semDedup keeps the centroid-FARTHEST member of each duplicate group") {
    val out = Similarity.semDedup(semCorpus, numCentroids = 2, iters = 1,
        minScore = 12000L)
      .select("vec_id", "cluster_size").as[(Long, Long)].collect().toSet
    // min-id policy would keep {1, 2}; the paper's rule keeps the
    // perturbed (most marginal-information) members 9 and 21
    assert(out == Set(9L -> 4L, 21L -> 2L), out.toString)
  }

  test("semDedup maxCellSize excludes a hot cluster from pairing (recall trade, capped mass)") {
    // family X's cell holds 4 members > cap 3: its pair join is
    // skipped, every member passes through as its own singleton;
    // family Y (2 <= cap) still dedups
    val out = Similarity.semDedup(semCorpus, numCentroids = 2, iters = 1,
        minScore = 12000L, maxCellSize = Some(3L))
      .select("vec_id", "cluster_size").as[(Long, Long)].collect().toSet
    assert(out == Set(1L -> 1L, 3L -> 1L, 4L -> 1L, 9L -> 1L, 21L -> 2L),
      out.toString)
  }

  test("rpSigns is deterministic and balanced-ish") {
    val a: Array[Double] = Similarity.rpSigns(32, 64).flatten
    val b: Array[Double] = Similarity.rpSigns(32, 64).flatten
    assert(a.sameElements(b))
    assert(a.forall(v => v == 1.0 || v == -1.0))
    val pos = a.count(_ == 1.0)
    assert(pos > 32 * 64 / 4 && pos < 32 * 64 * 3 / 4, s"degenerate sign balance: $pos")
  }
}
