package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge DataFrames — the Pregel-shaped
  * workloads (rank propagation) done Spark-first: each superstep is
  * one join-aggregate over the edge frame, so Catalyst plans it, AQE
  * sizes it, and nothing ever leaves the cluster. Connected
  * components (large-star/small-star) live in
  * [[graft.llm.DedupOps.nearDupClusters]]; this hosts the
  * fixed-iteration value-propagation family.
  */
object GraphOps {

  /** Fixed-iteration PageRank in exact integer fixed-point: ranks are
    * scaled longs (initial rank = `scale`, i.e. 1.0), damping 0.85 is
    * the exact integer form `(r * 850) DIV (1000 * outdeg)` per edge,
    * and each node's next rank is `0.15·scale + Σ contributions` —
    * every operation is integral, so results are bit-identical across
    * engines, partitionings, and run counts (a double-arithmetic
    * PageRank can't be oracle-compared; this one can).
    *
    * Each of the `iters` supersteps is one shuffle: ranks ⋈ edges on
    * src (contribution projection) then groupBy dst (partial-merge
    * sum), with the per-src out-degree pre-joined once up front.
    * Dangling nodes (no out-edges) contribute nothing; sink-only
    * nodes hold the base rank. Scale shape: the edge frame is the
    * big side and is never collected or replicated — at 100 TB the
    * per-iteration cost is the same join-agg the session already
    * pays for any grouped query, × a small fixed iteration count.
    *
    * The returned frame is the last eagerly-materialized iterate
    * (locally checkpointed); callers running many ranks in one
    * session may `unpersist()` it when done.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, scale: Long = 1000000L): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    import org.apache.spark.storage.StorageLevel
    // ONE edge shuffle total: hash-partition by src, then dedup on
    // (src, dst) — partitioning on a subset of the dedup keys
    // satisfies the aggregate's clustering requirement, so the
    // dedup, the out-degree count, and the degree join below all run
    // exchange-free on the src-partitioned frame.
    val shuffleParts =
      edges.sparkSession.sessionState.conf.numShufflePartitions
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .repartition(shuffleParts, col("src"))
      .dropDuplicates("src", "dst")
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy("src").agg(count(lit(1)).as("d"))
    // iterated frames are materialized per superstep (persist+count,
    // previous iterate released), like GraphX/MLlib: without it,
    // superstep i re-derives the whole prefix DAG — i× the edge prep
    // per iteration and a plan that grows without bound. The edge
    // frame stays src-partitioned, so every superstep's ranks⋈edges
    // shuffles only the (node, rank) frame — the small side — never
    // the edges.
    val eDeg = e.join(deg, "src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val base = lit((scale * 150L) / 1000L)
    var ranks = nodes.withColumn("r", lit(scale))
    var it = 0
    while (it < iters) {
      val contribs = eDeg.join(ranks, eDeg("src") === ranks("id"))
        .select(col("dst").as("id"),
          expr("(r * 850) DIV (1000 * d)").as("c"))
        .groupBy("id").agg(sum("c").as("s"))
      // localCheckpoint (eager) rather than persist: it truncates the
      // lineage, so the logical plan stays one superstep deep instead
      // of embedding the whole prefix (with persist, analysis/codegen
      // cost grows per iteration and the plan text nests
      // exponentially). Trade: blocks are not recomputable — an
      // executor loss restarts the rank job; a 100 TB deployment
      // running many supersteps should reliable-checkpoint every N
      // iterations instead.
      val next = nodes.join(contribs, Seq("id"), "left")
        .select(col("id"), (base + coalesce(col("s"), lit(0L))).as("r"))
        .localCheckpoint(eager = true)
      ranks.unpersist()
      ranks = next
      it += 1
    }
    eDeg.unpersist()
    nodes.unpersist()
    ranks.select(col("id"), col("r").as("rank"))
  }
}
