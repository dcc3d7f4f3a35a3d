package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (backward) join: attach to every probe row the state row with
  * the greatest timestamp at-or-before the probe's — the canonical
  * "latest reading / latest block / latest session marker" lookup
  * Spark lacks natively (DuckDB's ASOF JOIN, pandas merge_asof).
  *
  * Two scale shapes:
  *  - [[keyed]]: per-key as-of. Pure relational — one shuffle on the
  *    key, a running `last(..., ignoreNulls)` window over the
  *    timestamp-ordered union. This is the common case (per user /
  *    per chain / per instrument) and scales with key cardinality.
  *  - [[global]]: unkeyed as-of. There is no key to shuffle on, so
  *    this is a genuine custom operator: range-repartition the union
  *    on timestamp, scan each partition once carrying the running
  *    state, and seed every partition with the last state of the
  *    partitions before it (a per-partition summary — bounded by the
  *    partition count, never the data — crosses the driver). A naive
  *    range join (probe.ts >= state.ts) is quadratic; a global window
  *    is a single-partition bottleneck; this is neither.
  *
  * Tie discipline: a state AT the probe's timestamp matches (>=), and
  * the caller must make state timestamps unique (per key) — both
  * mirrored by the DuckDB ASOF JOIN oracles.
  */
object AsofJoin {

  /** Per-key backward as-of join. `states` must carry
    * `keyCols ++ tsCol ++ stateCols`; output is every `probes` row
    * plus `asof_<c>` for each state column (null when no state at or
    * before the probe's timestamp).
    */
  def keyed(probes: DataFrame, states: DataFrame, keyCols: Seq[String],
      tsCol: String, stateCols: Seq[String]): DataFrame = {
    val probeCols = probes.columns.filterNot(c => keyCols.contains(c) || c == tsCol)
    val p = probes.select(
      keyCols.map(col) ++ Seq(col(tsCol), lit(1).as("_tag")) ++
        probeCols.map(col) ++
        stateCols.map(c => lit(null).cast(states.schema(c).dataType).as(s"_s_$c")): _*)
    val s = states.select(
      keyCols.map(col) ++ Seq(col(tsCol), lit(0).as("_tag")) ++
        probeCols.map(c => lit(null).cast(probes.schema(c).dataType).as(c)) ++
        stateCols.map(c => col(c).as(s"_s_$c")): _*)
    // state sorts before probe at equal ts -> ">=" semantics
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the carry must be null-gated on _tag: struct() of nulls is a
    // NON-null struct, so last(ignoreNulls) would latch probe rows
    val carry = last(
      when(col("_tag") === 0, struct(stateCols.map(c => col(s"_s_$c")): _*)),
      ignoreNulls = true).over(w)
    p.unionByName(s)
      .withColumn("_carry", carry)
      .filter(col("_tag") === 1)
      .select(
        keyCols.map(col) ++ Seq(col(tsCol)) ++ probeCols.map(col) ++
          stateCols.map(c => col(s"_carry._s_$c").as(s"asof_$c")): _*)
  }

  /** Global (unkeyed) backward as-of join; `tsCol` must be LongType in
    * both inputs, state timestamps must be unique and non-null.
    *
    * Size-gated two-path execution (the measure-then-pick shape the
    * commit filter, dedup clustering, and PageRank use):
    *
    *  - **Broadcast path** (state side's Catalyst size estimate ≤
    *    `broadcastBelowBytes`): states collapse into ONE row of two
    *    sorted arrays (timestamps + state structs, sorted together by
    *    `sort_array` over ts-led structs), broadcast to every probe
    *    partition, and each probe binary-searches its floor state
    *    with the codegen'd [[graft.functions.VecFunctions
    *    .floor_index_long]] kernel — ZERO shuffles of the probe side,
    *    no global sort, log2(n) long reads per probe. The state side
    *    of a global as-of is usually an aggregate (one row per
    *    distinct timestamp), so this is the common case even at
    *    100 TB probe volume.
    *  - **Partitioned path** (above the gate): range-repartition the
    *    union on timestamp, per-partition running-state scan seeded
    *    by a bounded per-partition summary (below). Handles a state
    *    side too large to broadcast.
    *
    * Both paths produce identical rows; the differential is pinned in
    * AsofJoinSpec by forcing each side of the gate.
    *
    * Gate caveats: the broadcast decision trusts Catalyst's size
    * ESTIMATE — a state side whose stats are badly underestimated
    * (e.g. a selective filter under default column stats) would
    * single-task a huge array build; callers with filtered state
    * sides should pass an explicit `broadcastBelowBytes` (0 forces
    * the partitioned path). And `sort_array` needs every state
    * column orderable — a map-typed state column would fail the
    * broadcast path outright — so non-orderable state dtypes fall
    * through to the partitioned path, which carries them fine.
    */
  def global(probes: DataFrame, states: DataFrame, tsCol: String,
      stateCols: Seq[String], numPartitions: Int = 0,
      broadcastBelowBytes: Long = 8L << 20): DataFrame = {
    val orderable = stateCols.forall(c =>
      org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(states.schema(c).dataType))
    if (orderable &&
        states.queryExecution.optimizedPlan.stats.sizeInBytes <=
          BigInt(broadcastBelowBytes))
      globalBroadcast(probes, states, tsCol, stateCols)
    else globalPartitioned(probes, states, tsCol, stateCols, numPartitions)
  }

  private def globalBroadcast(probes: DataFrame, states: DataFrame,
      tsCol: String, stateCols: Seq[String]): DataFrame = {
    val probeCols = probes.columns.filterNot(_ == tsCol)
    // ts array and ts-led struct array sort identically (timestamps
    // are unique by contract), so index i in one matches index i in
    // the other; `get` is 0-based and null-safe for index -1 (no
    // state at or before the probe)
    val packed = states.agg(
      sort_array(collect_list(col(tsCol))).as("_asof_ts"),
      sort_array(collect_list(struct(
        col(tsCol) +: stateCols.map(col): _*))).as("_asof_vs"))
    val idx = graft.functions.VecFunctions.floor_index_long(
      col("_asof_ts"), col(tsCol))
    val hit = get(col("_asof_vs"), idx - lit(1))
    probes.crossJoin(broadcast(packed))
      .select(
        Seq(col(tsCol)) ++ probeCols.map(col) ++
          stateCols.map(c => hit.getField(c).as(s"asof_$c")): _*)
  }

  private def globalPartitioned(probes: DataFrame, states: DataFrame,
      tsCol: String, stateCols: Seq[String],
      numPartitions: Int): DataFrame = {
    val spark = probes.sparkSession
    val probeCols = probes.columns.filterNot(_ == tsCol)
    val p = probes.select(
      Seq(col(tsCol), lit(1).as("_tag")) ++ probeCols.map(col) ++
        stateCols.map(c => lit(null).cast(states.schema(c).dataType).as(s"_s_$c")): _*)
    val s = states.select(
      Seq(col(tsCol), lit(0).as("_tag")) ++
        probeCols.map(c => lit(null).cast(probes.schema(c).dataType).as(c)) ++
        stateCols.map(c => col(c).as(s"_s_$c")): _*)
    val n = if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // range partitions are ordered by id, so "the partitions before
    // me" is a prefix; materialize once for the two passes. LAZY
    // localCheckpoint — the pass-1 collect below is the first action
    // anyway, so it both computes the seeds and pins the blocks in
    // one job instead of paying a separate eager-materialize job.
    // (Persisting the union across repartitionByRange's sampling and
    // shuffle derivations was measured SLOWER here: the inputs are
    // already cached upstream, so the extra cache write outweighs
    // the recompute it saves.)
    val parted = p.unionByName(s)
      .repartitionByRange(n, col(tsCol), col("_tag"))
      .sortWithinPartitions(col(tsCol), col("_tag"))
      .localCheckpoint(eager = false)
    val unionSchema = parted.schema
    val nProbeCols = probeCols.length
    val stateOffset = 2 + nProbeCols

    val rdd = parted.rdd
    // pass 1: last state per partition (tiny: one row per partition)
    val lastStates: Array[(Int, Option[Seq[Any]])] = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var lastState: Option[Seq[Any]] = None
        it.foreach(r => if (r.getInt(1) == 0) lastState = Some(r.toSeq))
        Iterator((pid, lastState))
      }.collect()
    val seeds: Map[Int, Option[Seq[Any]]] = {
      val byPid = lastStates.sortBy(_._1)
      var carry: Option[Seq[Any]] = None
      byPid.map { case (pid, st) =>
        val seed = pid -> carry
        if (st.isDefined) carry = st
        seed
      }.toMap
    }
    // pass 2: seeded single scan per partition
    val outRdd = rdd.mapPartitionsWithIndex { (pid, it) =>
      var carry: Option[Seq[Any]] = seeds.getOrElse(pid, None)
      it.flatMap { r =>
        if (r.getInt(1) == 0) { carry = Some(r.toSeq); None }
        else {
          val stateVals = carry match {
            case Some(st) => st.slice(stateOffset, stateOffset + stateCols.length)
            case None => Seq.fill[Any](stateCols.length)(null)
          }
          Some(Row.fromSeq(Seq(r.get(0)) ++
            (2 until 2 + nProbeCols).map(r.get) ++ stateVals))
        }
      }
    }
    val outSchema = StructType(
      unionSchema(tsCol) +:
        (probeCols.map(c => unionSchema(c)) ++
          stateCols.map(c => unionSchema(s"_s_$c").copy(name = s"asof_$c"))))
    spark.createDataFrame(outRdd, outSchema)
  }
}
