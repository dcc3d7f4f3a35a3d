package graft
object PlanAudit {

  /** Entries whose CartesianProduct/BroadcastNestedLoopJoin is a
    * BOUNDED broadcast of scalar or model-sized state, not a data×data
    * product — the two accepted categories. The audit prints the
    * justification inline so a flag either resolves here or is a real
    * regression.
    */
  private val boundedCartesians: Map[String, String] = Map(
    "q_asof_global" -> "1-row broadcast of the packed sorted state arrays",
    "q_llm_pipeline_e2e" -> "broadcast scalar totals + centroid/model frames",
    "q_llm_temp_mix" -> "broadcast per-source scalar weights (1 row each)",
    "q_llm_tfidf" -> "broadcast corpus-size scalar (1 row)",
    "q_llm_bm25" -> "broadcast corpus stats scalar (1 row)",
    "q_llm_dsir" -> "broadcast distribution scalars",
    "q_ann_ivf_topk" -> "broadcast centroid array (model state)",
    "q_ann_ivfpq_topk" -> "broadcast centroid/codebook arrays",
    "q_ann_ivfpq_rerank" -> "broadcast centroid/codebook arrays",
    "q_ann_ivfpq_residual" -> "broadcast centroid/codebook arrays",
    "q_ann_pq_topk" -> "broadcast codebook array (model state)",
    "q_ann_cosine_topk" -> "labeled brute-force oracle tier (exact top-k baseline)",
    // below the measured-scalar gate the filtered entry IS the exact
    // brute tier; the gate caps the cross join's small side at
    // bruteGateRows (above it the plan is the IVF bucket join)
    "q_ann_filtered_topk" -> "brute tier below the gate (filtered side capped at bruteGateRows)",
    "q_ann_topk_dot" -> "labeled brute-force oracle tier (exact top-k baseline)",
    "q_emb_cluster_sample" -> "broadcast centroid array (model state)",
    "q_llm_perplexity" -> "broadcast continuation-vocabulary scalar (1 row)",
    // seam twin: runs the SAME scoreBigramLm core as q_llm_perplexity
    // (PipelineOps.scoreBigramLm's crossJoin(broadcast(vocab))), just
    // fed from the persisted model — adjudication inherited verbatim
    "q_llm_perplexity_served" -> "broadcast continuation-vocabulary scalar (1 row)",
    "q_llm_source_overlap" -> "source-catalog-sized signature matrix (sources², never doc-scaled)",
    "q_sketch_kmv_distinct" -> "broadcast of two 1-row sketch/exact scalar frames (merge tier)",
    // the pair frame is sources × sources over the group CATALOG
    // (distinct event_types), never the key stream — groups²·k rows
    "q_sketch_kmv_intersect" -> "source-pair frame (groups², catalog-sized) joined to sketch rows (≤ k/group)",
    // same shape as q_ann_ivf_topk: the folded-centroid single row is
    // BNL-broadcast to the probe side (the loaded index's assignments
    // join is a plain equi-join on cell)
    "q_ann_index_serve" -> "broadcast centroid array (model state, loaded from the persisted index)",
    "q_ann_index_update" -> "broadcast centroid array (model state, loaded from the incrementally-appended persisted index)",
    "q_ann_index_rebuild" -> "broadcast centroid array (model state, loaded from the drift-gated persisted index; both regimes serve from loaded centroids)",
    "q_ann_ivfpq_serve" -> "broadcast centroid+codebook lookup row (model state, loaded from the persisted PQ index)",
    "q_ann_filtered_serve" -> "broadcast centroid array (model state, loaded from the persisted index)",
    // the estimate scalar (1 row) crossed with the exact-twin scalar
    // (1 row) — two aggregates, never data-scaled
    "q_sketch_cms_join_size" -> "1-row estimate × 1-row exact-twin scalar")

  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val dir = "/root/testdata/sf0.001"
    var unexplained = 0
    var errors = 0
    var total = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      total += 1
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
        val bcast = "BroadcastExchange".r.findAllIn(plan).size
        val cartesian = plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoopJoin")
        val smj = "SortMergeJoin".r.findAllIn(plan).size
        val cartFlag =
          if (!cartesian) ""
          else boundedCartesians.get(name) match {
            case Some(why) => s" CARTESIAN(bounded: $why)"
            case None => { unexplained += 1; " CARTESIAN(UNEXPLAINED)" }
          }
        val flags = cartFlag + (if (smj > 0) s" SMJ=$smj" else "")
        println(f"AUDIT $name%-28s shuffles=$exchanges%-3d bcast=$bcast%-3d$flags")
      } catch { case e: Throwable =>
        errors += 1
        println(s"AUDIT $name ERROR ${e.getMessage.take(60)}")
      }
    }
    spark.stop()
    // The repo invariant is 0 UNEXPLAINED over the whole catalog; a
    // nonzero exit makes a missed adjudication (the r13 seam-twin
    // regression) fail the audit run instead of hiding in the table.
    println(s"AUDIT-SUMMARY total=$total unexplained=$unexplained errors=$errors")
    if (unexplained > 0 || errors > 0) sys.exit(1)
  }
}
