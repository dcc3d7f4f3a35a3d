package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.TraceEtl
import graft.sources.SyntheticTraces

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * "Which transactions invoked the ZK precompiles, with per-degree
    * gas and the contracts involved" — the reference's entire purpose
    * (SURVEY §7.2 step 2) — over a deterministic trace corpus derived
    * from the TPC-H-ish tables, through the fused single-shuffle
    * commit pipeline.
    */
  def entry(spark: SparkSession): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val traces = SyntheticTraces.fromTpch(spark, "/root/testdata/sf0.001")
    val (txs, _) = TraceEtl.transform(traces)
    txs.toDF()
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracles
}
