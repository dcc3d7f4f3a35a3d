package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale utilities: skew-resistant aggregation and the partitioned
  * bronze layer.
  */
object Scale {

  /** Per-row round-robin salt in [0, salts): `mono_id mod salts`.
    * `monotonically_increasing_id` is `partition_id << 33 + ordinal`,
    * so the modulus round-robins WITHIN each partition — a hot key's
    * rows spread evenly over all `salts` reducers even when the rows
    * are byte-identical (the spam-contract case), which no
    * content-derived hash can do: identical rows hash identically
    * and land on one reducer, silently defeating the mitigation in
    * exactly the degenerate case it targets.
    *
    * Determinism: the ordinal is stable ONLY when the upstream
    * partition order is itself deterministic (e.g. directly over a
    * file scan, where a recomputed partition replays the same rows
    * in the same order). Spark's indeterminate-stage rollback keys
    * off RDD `DeterministicLevel`, which SQL nondeterministic
    * expressions do NOT set — on a fetch failure only the missing
    * map outputs are recomputed, and if this salt's input is itself
    * downstream of a shuffle, the replayed partition can deliver
    * rows in a different order, assign different salts, and let two
    * reducers see inconsistent views of the same map output.
    * [[saltedJoin]] is correct under ANY per-row salt assignment
    * (consistency across retries doesn't matter — every big-side
    * row meets exactly one copy of each match whatever salt it
    * draws); [[saltedSum]]'s phase-1 partials need a CONSISTENT
    * assignment, so it must not be applied directly downstream of a
    * shuffle — salt over the deterministic source, or
    * `sortWithinPartitions` on a deterministic key first to pin the
    * ordinal. [[saltedSum]] enforces this itself: when its input plan
    * contains a shuffle-planning operator it injects the pin before
    * salting (see `plansAShuffle`).
    */
  private[graft] def rowSalt(salts: Int): Column =
    pmod(monotonically_increasing_id(), lit(salts.toLong))

  /** Two-phase salted aggregation for skewed grouping keys: phase 1
    * aggregates on (key, salt) — spreading a hot key over `salts`
    * reducers — phase 2 merges the partials per key. Correct for any
    * algebraic aggregate (sum/count/min/max) under any per-row salt
    * assignment; results are identical to a direct groupBy, only the
    * shuffle distribution changes. The salt is the round-robin
    * [[rowSalt]] (see there for the identical-rows and determinism
    * story — shared with [[saltedJoin]]).
    *
    * AQE's skew-join splitting handles joins; this is the groupBy-side
    * lever for when one key holds a disproportionate share of rows
    * (e.g. a spam contract emitting millions of traces).
    */
  /** True when `df`'s optimized plan contains an operator that plans
    * to a shuffle (join/aggregate/window/repartition/global sort/…)
    * — the situation where a fetch-failure retry can replay a
    * partition in a different row order and hand [[rowSalt]]
    * inconsistent ordinals. Over-approximates (a partial-only
    * aggregate also matches): the false-positive cost is one
    * per-partition sort, the false-negative cost is silently wrong
    * sums, so erring wide is the only safe direction.
    */
  private def plansAShuffle(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    df.queryExecution.optimizedPlan.exists {
      case _: Join | _: Aggregate | _: Window | _: Sort | _: GlobalLimit |
          _: RepartitionOperation | _: Distinct | _: Deduplicate => true
      case _ => false
    }
  }

  def saltedSum(df: DataFrame, keyCols: Seq[String], valueCol: String,
      resultName: String, salts: Int = 16): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    // Retry-consistency guard (the [[rowSalt]] determinism contract,
    // enforced instead of merely documented): when the input plan has
    // a shuffle boundary beneath the salt, pin the per-partition row
    // order with a sortWithinPartitions on every salt-relevant column
    // — rows tying on (keys, value) are interchangeable for the
    // partial sums, so the pinned assignment is deterministic up to
    // rows the aggregate can't distinguish. Scan-rooted inputs (the
    // common case, where replay order is already deterministic) skip
    // the sort.
    val pinned =
      if (plansAShuffle(df))
        df.sortWithinPartitions((keyCols :+ valueCol).map(col): _*)
      else df
    val salted = pinned.withColumn("_salt", rowSalt(salts))
    val partial = salted
      .groupBy((keyCols.map(col) :+ col("_salt")): _*)
      .agg(sum(col(valueCol)).as("_partial"))
    partial.groupBy(keyCols.map(col): _*)
      .agg(sum(col("_partial")).as(resultName))
  }

  /** Salted replicate join for a skewed join key, for engines/configs
    * where AQE's runtime skew-split isn't available (or the skew is in
    * the FIRST shuffle, before AQE has statistics): the small side is
    * replicated `salts`× (explode over the salt range) and the big
    * side tags each row with the round-robin [[rowSalt]], so a hot
    * key's rows — including byte-identical duplicates — spread over
    * `salts` reducers instead of one. Results are identical to the
    * plain equi-join — every big-side row still meets exactly one
    * copy of each matching small-side row, whatever salt it drew.
    *
    * Never a random(): the ordinal salt is partition-stable (see
    * [[rowSalt]] for the retry semantics Spark applies). Cost: the
    * small side's shuffle volume × salts; use for genuinely small
    * dims that still can't be broadcast (or where the hot key would
    * spill a single reducer at 100 TB).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, salts: Int = 16): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    val bigSalted = big.withColumn("_salt", rowSalt(salts))
    val smallSalted = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    bigSalted.join(smallSalted,
        bigSalted(bigKey) === smallSalted(smallKey) &&
          bigSalted("_salt") === smallSalted("_salt"))
      .drop("_salt")
  }

  /** The skew gate's measurement: (hottest key's row count, total
    * rows) of `df[key]` in ONE map-combined aggregate. Skew-safe by
    * construction — partial aggregation collapses the hot key to one
    * partial PER PARTITION before the shuffle, so the probe's shuffle
    * is ≤ |distinct keys|·|partitions| rows no matter how hot the
    * key; the scan is pruned to the key column.
    */
  def hotKeyShare(df: DataFrame, key: String): (Long, Long) = {
    // NULL keys are excluded: an inner equi-join null-filters them
    // before the shuffle (Catalyst inserts IsNotNull on join keys), so
    // a null-heavy big side causes no reducer skew and must not trip
    // the gate into paying the salted premium
    val st = df.filter(col(key).isNotNull)
      .groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      .agg(max("cnt").as("mx"), sum("cnt").as("n")).head()
    if (st.isNullAt(0)) (0L, 0L) else (st.getLong(0), st.getLong(1))
  }

  /** Skew-GATED join — [[saltedJoin]] made self-gating, so callers
    * don't pay the salted plan's deliberate premium (small side
    * ×salts, wider shuffle key; SaltLab measured 2-5× on unskewed
    * corpora) blind: one measured [[hotKeyShare]] probe over the big
    * side decides. If the hottest key owns ≥ hotNum/hotDen of the
    * rows (default 1/5), the salted plan's skew immunity wins (SaltLab:
    * 2.7-3× at a planted 90%-hot key with AQE skew handling and
    * broadcast off); below it the plain equi-join is strictly better.
    * A measured count, not a stats gate — the same reasoning as the
    * filtered-ANN gate: CBO-less Catalyst has no per-key frequency
    * statistics to consult, and AQE's skew split only helps AFTER a
    * first shuffle has produced stats. Both branches return identical
    * results (ScaleSpec pins the flip differentially), so the gate is
    * a pure plan choice.
    */
  def skewGatedJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, salts: Int = 16, hotNum: Long = 1,
      hotDen: Long = 5): DataFrame = {
    require(hotNum > 0 && hotDen > 0)
    val (mx, n) = hotKeyShare(big, bigKey)
    if (n > 0 && mx * hotDen >= n * hotNum)
      saltedJoin(big, small, bigKey, smallKey, salts)
    else
      big.join(small, big(bigKey) === small(smallKey))
  }

  /** Bronze writer: partitions raw traces by (chain_id, block day) so
    * incremental jobs and per-chain backfills prune at the directory
    * level — at 100 TB a day-of-one-chain query touches its slice
    * only. Verified by [[graft.ScaleSpec]] via PartitionFilters in the
    * physical plan.
    */
  def writeBronze(traces: DataFrame, path: String): Unit =
    traces
      .withColumn("block_date",
        to_date(coalesce(col("block_timestamp"), lit(0L)).cast("timestamp")))
      .write
      .partitionBy("chain_id", "block_date")
      .mode("overwrite")
      .parquet(path)

  def readBronze(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
