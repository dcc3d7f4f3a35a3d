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

  /** Below this many supersteps the fused single-plan path stays
    * shallow enough that analysis/codegen cost is negligible; above
    * it the materialized path is forced regardless of input size
    * (the composed plan nests per superstep).
    */
  private val LazyMaxIters = 8

  /** Which path the most recent [[pageRank]] call took (true =
    * per-superstep materialization). Observability for specs and the
    * scale rehearsal; not part of the API contract.
    */
  @volatile private[graft] var lastMaterialized: Boolean = false

  /** Fixed-iteration PageRank in exact integer fixed-point: ranks are
    * scaled longs (initial rank = `scale`, i.e. 1.0), damping 0.85 is
    * the exact integer form `(r * 850) DIV (1000 * outdeg)` per edge,
    * and each node's next rank is `0.15·scale + Σ contributions` —
    * every operation is integral, so results are bit-identical across
    * engines, partitionings, and run counts (a double-arithmetic
    * PageRank can't be oracle-compared; this one can).
    *
    * Shuffle shape: edges are shuffled ONCE total — hash-partitioned
    * by src, then deduped and out-degree-counted (a COUNT window over
    * the same partitioning) exchange-free. The iterated state is the CONTRIBUTION frame
    * `c_t(id) = Σ incoming contributions`, not the rank frame: ranks
    * are implicit (`r_t = 0.15·scale + c_t`, absent id ⇒ c = 0), the
    * t=0 rank is the constant `scale` so the first superstep is a
    * plain aggregate with NO join, and the full node set is joined
    * exactly once at the very end to surface sink-only/isolated
    * nodes. Each superstep therefore moves only one node-sized frame
    * through one join (into the src-partitioned edge frame) + one
    * partial-merge aggregate — at 100 TB the per-iteration cost is
    * the same join-agg the session already pays for any grouped
    * query, × a small fixed iteration count.
    *
    * Dangling nodes (no out-edges) contribute nothing — their mass
    * leaks, matching the reference's fixed-iteration form. Sink-only
    * nodes hold the base rank.
    *
    * Size-gated materialization: iterating frames must not re-derive
    * their whole prefix DAG, but eagerly materializing every
    * superstep costs one scheduled job each — pure fixed overhead
    * that dominates on small graphs (measured ~27× an unrolled-CTE
    * single plan at sf0.1). So: when the Catalyst size estimate of
    * the edge frame is ≤ `materializeAboveBytes` (and `iters` ≤ 8),
    * the supersteps compose into ONE lazy plan run by the CALLER'S
    * action — the oracle's unrolled-CTE shape, with zero actions
    * inside the operator (r10 shipped an eager edge checkpoint + an
    * eager result checkpoint here; removing both was worth ~3× wall
    * at sf0.1 — the result was being materialized twice). The shared
    * edge frame is lazily persisted: plan-time column pruning
    * specializes each textual re-occurrence of a subtree
    * differently, so ReuseExchange never matches (measured: 52
    * exchanges, 0 reused on the unshared form), but an
    * InMemoryRelation is computed once at first use inside the
    * action and every later reference scans the cache — the same
    * each-CTE-once evaluation DuckDB gives the oracle. The cache
    * self-releases when the caller's first action over the returned
    * frame completes (one-shot QueryExecutionListener; see
    * [[releaseAfterFirstAction]]).
    *
    * Above the gate, each superstep is eagerly `localCheckpoint`ed
    * (lineage truncated, plan stays one step deep) and the previous
    * iterate's blocks are released deterministically via the
    * checkpoint-aware shim (plain `unpersist()` is a no-op on
    * checkpointed Datasets). Trade: checkpoint blocks are not
    * recomputable — an executor loss restarts the rank job; a 100 TB
    * deployment running many supersteps should reliable-checkpoint
    * every N iterations instead. Same measure-then-pick shape as the
    * commit filter's size-gated broadcast and the dedup-cluster gate.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, scale: Long = 1000000L,
      materializeAboveBytes: Long = 64L << 20): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    import org.apache.spark.storage.StorageLevel
    val edgeBytes = edges.queryExecution.optimizedPlan.stats.sizeInBytes
    val materialize = iters > LazyMaxIters ||
      edgeBytes > BigInt(materializeAboveBytes)
    lastMaterialized = materialize
    // ONE edge shuffle and ONE persisted frame total: hash-partition
    // by src, dedup on (src, dst) — partitioning on a subset of the
    // dedup keys satisfies the aggregate's clustering requirement —
    // then the out-degree comes from a COUNT window over the same
    // src partitioning (a local sort, no self-join, no second
    // derivation of the edge subtree). The inner-join-on-src shape
    // the window replaces also dropped null-src edges from the
    // contribution feed; the explicit filter keeps that contract.
    val shuffleParts =
      edges.sparkSession.sessionState.conf.numShufflePartitions
    val srcWin = org.apache.spark.sql.expressions.Window.partitionBy("src")
    def eCast = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    // big path: partition by SRC — dedup runs exchange-free on the
    // key subset, the degree comes from a COUNT window over the same
    // partitioning (a local sort, no self-join), and each superstep
    // shuffles only the contribution rows into groupBy(dst).
    // MEMORY_AND_DISK persist — recomputable on block loss, which
    // matters once the edge frame is the 100 TB side. The
    // inner-join-on-src shape the window replaces also dropped
    // null-src edges from the contribution feed; the explicit filter
    // keeps that contract.
    lazy val eDeg = eCast
      .repartition(shuffleParts, col("src"))
      .dropDuplicates("src", "dst")
      .filter(col("src").isNotNull)
      .withColumn("d", count(lit(1)).over(srcWin))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // small path: partition by DST instead — the rank side of every
    // superstep join is broadcast (gate-guaranteed small), so src
    // clustering buys nothing, while dst clustering makes every
    // superstep's groupBy(dst) EXCHANGE-FREE: supersteps become
    // scan → broadcast-join → local agg, zero shuffles. The degree
    // needs one extra tiny aggregate (src grouping isn't available),
    // broadcast back onto the frame. LAZY MEMORY_AND_DISK persist,
    // NOT an eager checkpoint: the whole small path must stay ONE
    // action (r10's eager-ckpt variant paid ~3× the single-plan wall
    // at sf0.1 — the edge build was a second scheduled job and the
    // final eager checkpoint materialized the result once into
    // blocks and then again for the caller's action). The cache is
    // computed at first use inside the caller's action and released
    // by a one-shot listener when that action completes (below);
    // being recomputable, a missed release degrades to recompute,
    // never to data loss.
    // The small-path degree frame is shared with its node derivation
    lazy val degAll = eCast.groupBy("src")
      .agg(count_distinct(struct(col("dst"))).as("d"))
    lazy val eDst = {
      val dd = eCast
        .repartition(shuffleParts, col("dst"))
        .dropDuplicates("src", "dst")
      // degree straight off the raw input (one independent pass;
      // deriving it from `dd` would recompute the dedup — column
      // pruning splits the subtrees, so nothing is reused).
      // count_distinct dedupes map-side; the struct wrapper keeps
      // null-dst edges in the count, as the deduped join-based
      // degree did (count_distinct alone drops NULLs). LEFT join:
      // null-src edges never match (null ≠ null), so they ride along
      // with d = NULL — their contribution expression is NULL and
      // sum() skips it, preserving the null-src-contributes-nothing
      // contract while keeping their dsts visible to the node set.
      dd.join(broadcast(degAll), Seq("src"), "left")
        .persist(StorageLevel.MEMORY_AND_DISK)
    }
    // node set: big path reads it straight off the raw input (two
    // branches + distinct — the edge frame there excludes null-src
    // rows); small path derives it from frames ALREADY computed —
    // dst-distinct runs exchange-free on eDst's partitioning and the
    // src side is the broadcast-sized degree frame (null src
    // included: groupBy keeps the null group), so the final distinct
    // shuffles ~|nodes| rows instead of re-scanning 2× the edges.
    lazy val nodesRaw = edges.select(col(srcCol).cast("long").as("id"))
      .union(edges.select(col(dstCol).cast("long").as("id"))).distinct()
    lazy val nodesSmall = eDst.select(col("dst").as("id")).distinct()
      .unionByName(degAll.select(col("src").as("id"))).distinct()
    // iters == 0 must not build the (checkpointed) edge frame just to
    // list nodes — take the raw derivation there
    def nodes = if (materialize || iters == 0) nodesRaw else nodesSmall
    val base = (scale * 150L) / 1000L

    // in the small path the gate guarantees node-sized frames are
    // broadcastable — hint them so no superstep ever shuffles the
    // edge frame or waits on AQE stats; in the materialized path AQE
    // decides
    def sized(c: DataFrame): DataFrame =
      if (materialize) c else broadcast(c)

    // superstep on the implicit-rank form: rank(src) at step t is
    // base + c_t(src) (c absent ⇒ 0), so the next contribution frame
    // is one join + one aggregate over the path's edge frame.
    def nextContribs(c0: DataFrame): DataFrame = {
      val c = sized(c0)
      val vExpr = expr(s"((${base}L + coalesce(s, 0L)) * 850) DIV (1000 * d)")
      val edgeFrame = if (materialize) eDeg else eDst
      edgeFrame.join(c, edgeFrame("src") === c("id"), "left")
        .select(col("dst"), vExpr.as("c"))
        .groupBy(col("dst").as("id")).agg(sum("c").as("s"))
    }

    // step 1: every rank is the constant `scale` — no join at all
    def firstContribs(): DataFrame = {
      val vExpr = expr(s"(${scale}L * 850) DIV (1000 * d)")
      val edgeFrame = if (materialize) eDeg else eDst
      edgeFrame.select(col("dst"), vExpr.as("c"))
        .groupBy(col("dst").as("id")).agg(sum("c").as("s"))
    }

    def finish(cLast: Option[DataFrame]): DataFrame = cLast match {
      case None => nodes.select(col("id"), lit(scale).as("rank"))
      case Some(c) =>
        nodes.join(sized(c), Seq("id"), "left")
          .select(col("id"),
            (lit(base) + coalesce(col("s"), lit(0L))).as("rank"))
    }

    if (iters == 0) finish(None)
    else if (!materialize) {
      // ONE composed plan, ZERO actions here: the caller's first
      // action computes the eDst cache once (every later reference
      // scans it) and runs the supersteps; the one-shot listener
      // releases the cache when that action completes. Re-running
      // the returned frame after release recomputes eDst — correct,
      // just uncached (documented trade of the single-action shape).
      var c = firstContribs()
      var it = 1
      while (it < iters) { c = nextContribs(c); it += 1 }
      val out = finish(Some(c))
      releaseAfterFirstAction(out, eDst)
      out
    } else {
      var c = firstContribs().localCheckpoint(eager = true)
      var it = 1
      while (it < iters) {
        val next = nextContribs(c).localCheckpoint(eager = true)
        // free the previous iterate's checkpoint blocks now, not at
        // GC: Dataset.unpersist() can't see checkpoint storage
        org.apache.spark.sql.GraftShim.releaseLocalCheckpoint(c)
        c = next
        it += 1
      }
      // the eager checkpoint makes the result self-contained, so the
      // prep persist and the last superstep's blocks drop here
      val out = finish(Some(c)).localCheckpoint(eager = true)
      org.apache.spark.sql.GraftShim.releaseLocalCheckpoint(c)
      eDeg.unpersist()
      out
    }
  }

  /** Unpersist `cached` as soon as the FIRST action that executes
    * `result`'s plan completes (success or failure): a one-shot
    * [[org.apache.spark.sql.util.QueryExecutionListener]] that matches
    * the action's analyzed tree against `result`'s plan objects by
    * REFERENCE (write commands embed the Dataset's own logical plan as
    * their child; re-analysis leaves already-resolved subtrees
    * untouched, so identity survives). This is what lets the fused
    * small-graph path stay a single action and still not leak its
    * prep cache. If no action ever runs — or the matcher misses (the
    * caller transformed the frame first, breaking reference
    * identity) — the MEMORY_AND_DISK cache lingers until session end
    * or eviction: degraded, never wrong, since it is recomputable.
    */
  private def releaseAfterFirstAction(result: DataFrame,
      cached: DataFrame): Unit = {
    val spark = result.sparkSession
    val markers = Seq(result.queryExecution.logical,
      result.queryExecution.analyzed)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      private val done = new java.util.concurrent.atomic.AtomicBoolean(false)
      private def fire(qe: org.apache.spark.sql.execution.QueryExecution): Unit = {
        val hit =
          try qe.analyzed.exists(p => markers.exists(_ eq p)) ||
            qe.logical.exists(p => markers.exists(_ eq p))
          catch { case _: Throwable => true } // fail open: release
        if (hit && done.compareAndSet(false, true)) {
          cached.unpersist(false)
          spark.listenerManager.unregister(this)
        }
      }
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = fire(qe)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = fire(qe)
    }
    spark.listenerManager.register(listener)
  }

  /** Shared prep for the explicit-rank variants: ONE edge shuffle
    * (hash-partition by src → dedup exchange-free → null-src filter →
    * COUNT window degree) checkpointed, plus the full node set off
    * the raw input. Callers release the checkpoint via the shim.
    */
  private def edgePrep(edges: DataFrame, srcCol: String,
      dstCol: String): (DataFrame, DataFrame) = {
    val shuffleParts =
      edges.sparkSession.sessionState.conf.numShufflePartitions
    val srcWin = org.apache.spark.sql.expressions.Window.partitionBy("src")
    val eDeg = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .repartition(shuffleParts, col("src"))
      .dropDuplicates("src", "dst")
      .filter(col("src").isNotNull)
      .withColumn("d", count(lit(1)).over(srcWin))
      .localCheckpoint(eager = true)
    val nodes = edges.select(col(srcCol).cast("long").as("id"))
      .union(edges.select(col(dstCol).cast("long").as("id"))).distinct()
    (eDeg, nodes)
  }

  /** Mass-conserving PageRank: like [[pageRank]] but the rank mass of
    * DANGLING nodes (no out-edges) is redistributed evenly instead of
    * leaking — each superstep every node additionally receives
    * `(D_t * 850) DIV (1000 * N)` where `D_t = Σ ranks of dangling
    * nodes` and `N` = node count, all in the same integer fixed-point
    * (bit-identical to the unrolled-CTE oracle). `D_t` and `N` are
    * BOUNDED driver scalars (one aggregate each — the same "scalar
    * gauge" class as the observability counters), never row data; the
    * edge frame is prepped once and each superstep is the same
    * join-agg as the base form plus one tiny anti-join aggregate.
    * Supersteps are eagerly checkpointed with the previous iterate's
    * blocks released via the shim — the variant exists for semantic
    * completeness, not the toy-scale fast path, so it has no fused
    * small-graph twin.
    */
  def pageRankDangling(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, scale: Long = 1000000L): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val (eDeg, nodes0) = edgePrep(edges, srcCol, dstCol)
    val nodes = nodes0.localCheckpoint(eager = true)
    val base = (scale * 150L) / 1000L
    val n = nodes.count()
    val srcs = eDeg.select(col("src")).distinct()
    var ranks = nodes.withColumn("r", lit(scale))
    var it = 0
    while (it < iters && n > 0) {
      // D_t: one bounded scalar off the current iterate
      val dMass = ranks.join(srcs, ranks("id") === srcs("src"), "left_anti")
        .agg(coalesce(sum("r"), lit(0L))).collect()(0).getLong(0)
      val share = (dMass * 850L) / (1000L * n)
      val contribs = eDeg.join(ranks, eDeg("src") === ranks("id"))
        .select(col("dst").as("cid"),
          expr("(r * 850) DIV (1000 * d)").as("c"))
        .groupBy("cid").agg(sum("c").as("s"))
      val next = nodes.join(contribs, nodes("id") === contribs("cid"), "left")
        .select(col("id"),
          (lit(base) + coalesce(col("s"), lit(0L)) + lit(share)).as("r"))
        .localCheckpoint(eager = true)
      org.apache.spark.sql.GraftShim.releaseLocalCheckpoint(ranks)
      ranks = next
      it += 1
    }
    val out = ranks.select(col("id"), col("r").as("rank"))
      .localCheckpoint(eager = true)
    org.apache.spark.sql.GraftShim.releaseLocalCheckpoint(ranks)
    org.apache.spark.sql.GraftShim.releaseLocalCheckpoint(nodes)
    org.apache.spark.sql.GraftShim.releaseLocalCheckpoint(eDeg)
    out
  }

  /** Iterate-to-ε PageRank (dangling mass leaking, as [[pageRank]]):
    * supersteps run until `max |r_t - r_{t-1}| ≤ eps` or `maxIters`,
    * whichever first, in the same integer fixed-point. Returns the
    * converged ranks plus a constant `t` column — the superstep count
    * actually run — so the oracle must reproduce the STOPPING
    * DECISION, not just the arithmetic (both engines compute the same
    * iterates, hence the same t). The convergence check is one
    * bounded scalar aggregate per superstep — inherent to any
    * iterate-to-fixpoint loop, and the reason this variant has no
    * single-plan form: control flow depends on data.
    */
  def pageRankConverge(edges: DataFrame, srcCol: String, dstCol: String,
      eps: Long, maxIters: Int = 10,
      scale: Long = 1000000L): DataFrame = {
    require(maxIters >= 1, s"maxIters must be >= 1, got $maxIters")
    require(eps >= 0, s"eps must be >= 0, got $eps")
    val (eDeg, nodes0) = edgePrep(edges, srcCol, dstCol)
    val nodes = nodes0.localCheckpoint(eager = true)
    val base = (scale * 150L) / 1000L
    var ranks = nodes.withColumn("r", lit(scale))
    var it = 0
    var done = nodes.isEmpty
    while (!done && it < maxIters) {
      val contribs = eDeg.join(ranks, eDeg("src") === ranks("id"))
        .select(col("dst").as("cid"),
          expr("(r * 850) DIV (1000 * d)").as("c"))
        .groupBy("cid").agg(sum("c").as("s"))
      val next = nodes.join(contribs, nodes("id") === contribs("cid"), "left")
        .select(col("id"), (lit(base) + coalesce(col("s"), lit(0L))).as("r"))
        .localCheckpoint(eager = true)
      it += 1
      // bounded scalar: the max rank delta this superstep
      val md = next.as("n").join(ranks.as("p"), col("n.id") === col("p.id"))
        .agg(coalesce(max(abs(col("n.r") - col("p.r"))), lit(0L)))
        .collect()(0).getLong(0)
      org.apache.spark.sql.GraftShim.releaseLocalCheckpoint(ranks)
      ranks = next
      done = md <= eps
    }
    val out = ranks.select(col("id"), col("r").as("rank"),
        lit(it.toLong).as("t"))
      .localCheckpoint(eager = true)
    org.apache.spark.sql.GraftShim.releaseLocalCheckpoint(ranks)
    org.apache.spark.sql.GraftShim.releaseLocalCheckpoint(nodes)
    org.apache.spark.sql.GraftShim.releaseLocalCheckpoint(eDeg)
    out
  }
}
