package graft
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val traces = graft.sources.SyntheticTraces.fromTpch(spark, "/root/testdata/sf0.01")
    val (txs, _) = graft.operators.TraceEtl.transform(traces)
    txs.toDF().explain("formatted")
    // a representative relational query
    Queries.all("q_a9_degree_gas")(spark, "/root/testdata/sf0.01").explain("formatted")
    // pushdown check
    Queries.all("q_j1_commit_filter")(spark, "/root/testdata/sf0.01").explain("formatted")
    // bucketed candidate generation + codegen'd integer verification
    Queries.all("q_emb_neardup")(spark, "/root/testdata/sf0.01").explain("formatted")
    // iterative clustering: final (post-propagation) plan is flat —
    // localCheckpoint truncates the per-round lineage
    Queries.all("q_llm_dedup_clusters")(spark, "/root/testdata/sf0.01").explain("formatted")
    // interval join: bucket equi-join (broadcast), NOT a nested-loop
    Queries.all("q_range_join")(spark, "/root/testdata/sf0.01").explain("formatted")
    // keyed as-of: one key shuffle + running-last window, no join
    Queries.all("q_asof_keyed")(spark, "/root/testdata/sf0.01").explain("formatted")
    // decontamination: broadcast shingle-fp semi-join over the corpus
    Queries.all("q_llm_decontaminate")(spark, "/root/testdata/sf0.01").explain("formatted")
    spark.stop()
  }
}
