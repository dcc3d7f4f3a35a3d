package graft

import graft.llm.SimilarityOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall-drift lab for the incremental IVF update
  * (`SimilarityOps.updateIvfIndex`): appending to an index keeps
  * serving CORRECT w.r.t. its centroids (ModelSeamSpec pins
  * serve-after-append == serve-over-rebuilt-same-centroids), but the
  * centroids were laid out for the PRE-append distribution — so as
  * the appended fraction grows, the cells partition the new mass less
  * well and recall@k against the exact top-k drifts. This measures
  * the curve: for appended fraction f, the index is built over the
  * oldest (1−f) of the corpus and the newest f is appended; recall is
  * against exact brute-force cosine over the GROWN corpus, next to a
  * fresh-centroids rebuild at the same f (the rebuild-when-over-
  * budget baseline).
  *
  *   runMain graft.AnnUpdateLab <sfDir> [k] [nQueries]
  */
object AnnUpdateLab {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = if (args.length > 1) args(1).toInt else 10
    val nQ = if (args.length > 2) args(2).toInt else 50
    val spark = SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), col("embedding")).localCheckpoint()
      val n = emb.count()
      val queries = emb.filter(col("vec_id") % lit(n / nQ + 1) === 0)
        .localCheckpoint()
      val sc = SimilarityOps.quantizedCosineX1e6 _
      val truth = SimilarityOps.bruteForceTopK(emb, queries, "vec_id",
          "embedding", k, sc)
        .select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      println(s"corpus $sfDir ($n vectors), recall@$k over " +
        s"${truth.size} queries, nlist=16 nprobe=4")
      println("| appended % | updated-index recall | fresh-rebuild " +
        "recall | gate (r17: max-cell share) |")
      println("|---|---|---|---|")
      for (pct <- Seq(0, 10, 25, 50, 75)) {
        // "oldest" (1-f) by vec_id: appends arrive after the base build
        val cut = n - n * pct / 100
        val base = emb.filter(col("vec_id") < cut)
        val batch = emb.filter(col("vec_id") >= cut)
        val baseIx = SimilarityOps.buildIvfIndex(base, "vec_id",
          "embedding")
        // the r17 gate CONSUMING this lab's finding: what would the
        // drift gate decide for this batch?
        val gate = if (pct == 0) "-" else {
          val (d, _) = SimilarityOps.ivfUpdateDecision(baseIx, batch,
            "vec_id", "embedding")
          s"${d.branch} (${d.maxCellCnt}/${d.batchRows})"
        }
        val updated = SimilarityOps.updateIvfIndex(baseIx,
          batch, "vec_id", "embedding")
        val rUpd = RecallEval.recallAtK(truth,
          SimilarityOps.ivfServeTopK(updated, queries, "vec_id",
            "embedding", k, score = sc))
        val fresh = SimilarityOps.buildIvfIndex(emb, "vec_id", "embedding")
        val rFresh = RecallEval.recallAtK(truth,
          SimilarityOps.ivfServeTopK(fresh, queries, "vec_id",
            "embedding", k, score = sc))
        println(f"| $pct%3d | $rUpd%.3f | $rFresh%.3f | $gate%s |")
      }
    } finally spark.stop()
  }
}
