package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Floor attribution for the two non-streaming ratio-frontier entries
  * (r15 VERDICT item 6): q_ann_ivfpq_rerank (2.0-2.1× its 0.38 s
  * stick) and q_llm_perplexity (2.1× its 0.41 s stick). Each is
  * decomposed into its tiers (the Bm25Lab pattern) against
  * checkpointed inputs, so the residual after the last tier is the
  * fixed per-job planning/scheduling floor — either a cuttable
  * exchange shows up as a tier gap, or the table closes the entry as
  * floor-bound.
  *
  *   runMain graft.FrontierLab <sfDir> [runs]
  */
object FrontierLab {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val So = graft.llm.SimilarityOps
    val Po = graft.llm.PipelineOps
    // time CONSTRUCTION + write: an operator with eager internals
    // (checkpoints, guard collects) does real work before any action
    // runs on its returned frame — a timer around only the final noop
    // undercounts it (the r15 lab-timing trap in by-name-argument
    // form: `noop(mk)` evaluates mk BEFORE the timed body starts)
    def fmt(mk: => DataFrame): String =
      (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        f"${(System.nanoTime() - t0) / 1e9}%.2f"
      }.mkString("/")

    // ---- q_ann_ivfpq_rerank tiers --------------------------------
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val queries = emb.filter(col("vec_id") < 20).localCheckpoint()
    println(s"corpus $dir, $runs runs each (run 1 cold)")
    println(s"ivfpq ADC candidate tier (rerank=32):   ${fmt(
      So.ivfPqTopK(emb, queries, "vec_id", "embedding", 32))}")
    // the exact tier alone, against a CHECKPOINTED candidate frame
    // (lab-timing rule: time the checkpointed copy) — the PRODUCTION
    // kernel itself (SimilarityOps.rescoreCandidates), not an inline
    // re-implementation that could drift from it
    val cands = So.ivfPqTopK(emb, queries, "vec_id", "embedding", 32)
      .select(col("query_id"), col("neighbor_id")).localCheckpoint()
    println(s"exact rescoring tier over cached cands: ${fmt(
      So.rescoreCandidates(cands, emb, queries, "vec_id", "embedding", 5))}")
    println(s"full rerank entry (ADC + exact):        ${fmt(
      So.ivfPqRerankTopK(emb, queries, "vec_id", "embedding", 5))}")

    // ---- q_profile_table tiers (r19 two-job shape) ----------------
    // r17 #1 decomposed the wall; r18 cut the exchanges; r19 cut the
    // ACTIONS (VERDICT #1): the entry now runs as TWO substantive
    // jobs — JOB 1 = the counts collect that materializes the whole
    // data pass (stack → histogram reduce → cached colname-partition
    // → thresholds), JOB 2 = the assembly localCheckpoint (pruned
    // sample off a narrow column-pruned rescan + the FUSED windowed
    // aggregate: stats/KMV/exact-quantile tiers as window columns of
    // one groupBy, three union branches instead of five) with the
    // exactness guard post-hoc on the |columns|-row checkpoint.
    // Tiers below time the shared kernels the entry composes;
    // `full profileTable` is the entry's own two-job kernel.
    {
      val Sk = graft.llm.SketchOps
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val ev = spark.read.parquet(s"$dir/events.parquet")
        .repartition(32, col("user_id")).localCheckpoint()
      val qv = floor(col("value") * 1000).cast("long")
      val pcols = Seq(
        ("user_id", col("user_id"), Some(col("user_id"))),
        ("event_type", col("event_type"), None),
        ("value", qv, Some(qv)))
      def frames() = Sk.profileFrames(ev, col("event_id"), pcols)
      println(s"profileFrames (legacy eager pair, stats artifacts' path): ${(1 to runs).map { _ =>
        val t0 = System.nanoTime(); frames()
        f"${(System.nanoTime() - t0) / 1e9}%.2f"
      }.mkString("/")}")
      val (tall, hist) = frames()
      println(s"pruned bottom-k sample (guarded, off eager frames): ${fmt(
        Sk.profileSampleFromHist(tall, hist, 128))}")
      println(s"salted bottom-k sample (stream-fold path):  ${fmt(
        Sk.profileSample(tall, 128))}")
      val samp = Sk.profileSampleFromHist(tall, hist, 128)
      println(s"FUSED assembly (fromState) over ckpt'd inputs: ${fmt(
        Sk.profileFromState(hist, samp, 128, 4, 1024, 3))}")
      println(s"full profileTable (two-job entry kernel):   ${fmt(
        Sk.profileTable(ev, col("event_id"), pcols))}")
    }

    // ---- q_llm_perplexity tiers ----------------------------------
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).localCheckpoint()
    val isRef = col("doc_id") % 50 === 0
    println(s"bigram-LM TRAIN tier alone:             ${fmt(
      Po.trainBigramLm(docs, "doc_id", "text", isRef))}")
    val model = Po.trainBigramLm(docs, "doc_id", "text", isRef)
      .localCheckpoint()
    println(s"SERVE tier over the cached model:       ${fmt(
      Po.lmPerplexityServe(docs.filter(!isRef), "doc_id", "text", model))}")
    println(s"full fused entry (train + score):       ${fmt(
      Po.lmPerplexity(docs, "doc_id", "text", isRef))}")
    spark.stop()
  }
}
