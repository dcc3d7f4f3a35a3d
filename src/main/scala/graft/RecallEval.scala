package graft

import graft.llm.{Quantizers, SimilarityOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN quality harness: recall@k of every approximate tier vs the
  * exact brute-force quantized-cosine top-k, with hash-order vs
  * trained (k-means) quantizers side by side.
  *
  *   sbt "runMain graft.RecallEval [sfDir] [k] [nQueries]"
  *
  * Prints a markdown table (one row per tier/quantizer combination)
  * plus the candidate-set size per query, the honest cost axis recall
  * trades against. Deterministic end-to-end: hash-order sampling,
  * fixed-iteration k-means, exact-integer scoring.
  */
object RecallEval {

  def recallAtK(truth: Map[Long, Set[Long]], approx: DataFrame): Double = {
    val got = approx.select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val per = truth.toSeq.map { case (q, t) =>
      got.get(q).map(a => t.intersect(a).size.toDouble / t.size).getOrElse(0.0)
    }
    if (per.isEmpty) 0.0 else per.sum / per.size
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val k = if (args.length > 1) args(1).toInt else 10
    val nQueries = if (args.length > 2) args(2).toInt else 50
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      if (args.length > 3 && args(3) == "sweep") pqSweep(spark, sfDir, k, nQueries)
      else run(spark, sfDir, k, nQueries)
    } finally spark.stop()
  }

  /** PQ parameter sweep (VERDICT r8 item 6): recall of the trained PQ
    * tier across (m, ksub) and of trained IVF across nlist (incl.
    * nlist ∝ √n), to separate "PQ is mis-parameterized" from "the
    * near-orthogonal synthetic corpus caps quantized recall".
    *
    *   sbt "runMain graft.RecallEval <sfDir> <k> <nQueries> sweep"
    */
  def pqSweep(spark: SparkSession, sfDir: String, k: Int, nQueries: Int): Unit = {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nCorpus = emb.count()
    val queries = emb.filter(col("vec_id") < nQueries)
    val truth = SimilarityOps.bruteForceTopKPortable(emb, queries, "vec_id", "embedding", k)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    println(s"corpus=$nCorpus queries=${truth.size} k=$k ($sfDir)")

    println(s"| m | ksub | pq trained recall@$k |")
    println("|---|---|---|")
    for (m <- Seq(8, 16); ksub <- Seq(16, 64, 256)) {
      val cb = Quantizers.trainPqCodebook(emb, "vec_id", "embedding", m, ksub)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cb.count()
      val r = recallAtK(truth,
        SimilarityOps.pqTopK(emb, queries, "vec_id", "embedding", k, m, ksub,
          codebook = Some(cb)))
      println(f"| $m | $ksub | $r%.3f |")
      cb.unpersist()
    }

    val sqrtN = math.max(4, math.round(math.sqrt(nCorpus.toDouble)).toInt)
    println()
    println(s"| nlist | nprobe | ivf trained recall@$k |")
    println("|---|---|---|")
    for (nlist <- Seq(16, sqrtN).distinct) {
      val cents = Quantizers.trainIvfCentroids(emb, "vec_id", "embedding", nlist)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cents.count()
      for (nprobe <- Seq(math.max(1, nlist / 8), math.max(1, nlist / 4), nlist / 2)) {
        val r = recallAtK(truth, SimilarityOps.ivfTopK(
          emb, queries, "vec_id", "embedding", k, nlist, nprobe,
          score = SimilarityOps.quantizedCosineX1e6 _, centroids = Some(cents)))
        println(f"| $nlist | $nprobe | $r%.3f |")
      }
      cents.unpersist()
    }

    // corpus-geometry diagnostic: on isotropic random vectors the
    // neighbor/non-neighbor cosine margin shrinks with dimension and
    // quantization destroys it — print the margin so a low recall
    // above is attributable
    val top1 = SimilarityOps.bruteForceTopKPortable(emb, queries, "vec_id",
        "embedding", 1)
      .agg(avg(col("score_x1e6"))).head().getDouble(0)
    println(f"%nmean top-1 exact score (x1e6 cosine): $top1%.0f (isotropic corpus → low margin)")
  }

  def run(spark: SparkSession, sfDir: String, k: Int, nQueries: Int): Unit = {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nCorpus = emb.count()
    val queries = emb.filter(col("vec_id") < nQueries)

    val truth = SimilarityOps.bruteForceTopKPortable(emb, queries, "vec_id", "embedding", k)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

    println(s"corpus=$nCorpus queries=${truth.size} k=$k ($sfDir)")

    val t0 = System.nanoTime()
    val trainedCents = Quantizers.trainIvfCentroids(emb, "vec_id", "embedding", 16)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    trainedCents.count()
    val t1 = System.nanoTime()
    val trainedCb = Quantizers.trainPqCodebook(emb, "vec_id", "embedding", 8, 16)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    trainedCb.count()
    val t2 = System.nanoTime()
    val residCb = Quantizers.trainResidualPqCodebook(emb, "vec_id", "embedding",
        trainedCents, 8, 16)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    residCb.count()
    val t3 = System.nanoTime()
    println(f"train: ivf centroids ${(t1 - t0) / 1e9}%.1f s, pq codebook ${(t2 - t1) / 1e9}%.1f s, residual codebook ${(t3 - t2) / 1e9}%.1f s")

    val qcos = SimilarityOps.quantizedCosineX1e6 _
    val tiers: Seq[(String, DataFrame)] = Seq(
      "lsh (portable, 6 planes x 4 tables)" ->
        SimilarityOps.lshTopKPortable(emb, queries, "vec_id", "embedding", k),
      "ivf hash-order (nlist=16 nprobe=4)" ->
        SimilarityOps.ivfTopK(emb, queries, "vec_id", "embedding", k, score = qcos),
      "ivf trained" ->
        SimilarityOps.ivfTopK(emb, queries, "vec_id", "embedding", k, score = qcos,
          centroids = Some(trainedCents)),
      "pq hash-order (m=8 ksub=16)" ->
        SimilarityOps.pqTopK(emb, queries, "vec_id", "embedding", k),
      "pq trained" ->
        SimilarityOps.pqTopK(emb, queries, "vec_id", "embedding", k,
          codebook = Some(trainedCb)),
      "ivf-pq hash-order" ->
        SimilarityOps.ivfPqTopK(emb, queries, "vec_id", "embedding", k),
      "ivf-pq trained" ->
        SimilarityOps.ivfPqTopK(emb, queries, "vec_id", "embedding", k,
          centroids = Some(trainedCents), codebook = Some(trainedCb)),
      "ivf-pq + rerank32 hash-order" ->
        SimilarityOps.ivfPqRerankTopK(emb, queries, "vec_id", "embedding", k),
      "ivf-pq + rerank32 trained" ->
        SimilarityOps.ivfPqRerankTopK(emb, queries, "vec_id", "embedding", k,
          centroids = Some(trainedCents), codebook = Some(trainedCb)),
      "ivf-pq residual hash-order" ->
        SimilarityOps.ivfPqTopK(emb, queries, "vec_id", "embedding", k,
          residual = true),
      "ivf-pq residual trained (residual codebook)" ->
        SimilarityOps.ivfPqTopK(emb, queries, "vec_id", "embedding", k,
          centroids = Some(trainedCents), codebook = Some(residCb),
          residual = true),
      "ivf-pq residual + rerank32 trained" ->
        SimilarityOps.ivfPqRerankTopK(emb, queries, "vec_id", "embedding", k,
          centroids = Some(trainedCents), codebook = Some(residCb),
          residual = true),
    )
    println(f"| tier | recall@$k |")
    println("|---|---|")
    tiers.foreach { case (name, df) =>
      println(f"| $name | ${recallAtK(truth, df)}%.3f |")
    }

    // The serving-time recall lever: nprobe. nprobe == nlist scans
    // every cell, so the IVF row must reach 1.000 there — a built-in
    // sanity anchor for the whole harness.
    println()
    println("| nprobe (nlist=16) | ivf trained | ivf-pq resid+rerank32 trained |")
    println("|---|---|---|")
    for (np <- Seq(1, 2, 4, 8, 16)) {
      val ivf = recallAtK(truth, SimilarityOps.ivfTopK(
        emb, queries, "vec_id", "embedding", k, nprobe = np, score = qcos,
        centroids = Some(trainedCents)))
      val ipr = recallAtK(truth, SimilarityOps.ivfPqRerankTopK(
        emb, queries, "vec_id", "embedding", k, nprobe = np,
        centroids = Some(trainedCents), codebook = Some(residCb),
        residual = true))
      println(f"| $np | $ivf%.3f | $ipr%.3f |")
    }
  }
}
