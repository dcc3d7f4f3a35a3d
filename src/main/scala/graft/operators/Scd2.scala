package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2 maintenance: apply a CHANGESET to
  * an existing temporal table — the MERGE shape real pipelines run on
  * every batch (the interval BUILD from scratch is `q_scd2_intervals`;
  * this is the incremental twin that keeps a 100 TB dimension current
  * without rebuilding it).
  *
  * Table contract: one row per (key, version) with `[fromCol, toCol)`
  * validity; `toCol IS NULL` marks the single open (current) row per
  * key. Changeset contract: one row per (key, tsCol) — callers dedupe
  * first (e.g. keep-last per key+ts); ties within a key at equal ts
  * are ordered by `tieCols` so the interval chain is deterministic.
  *
  * Semantics (close-then-insert with staleness protection):
  *   - a delta row is EFFECTIVE iff its key has no open row, or its
  *     ts is strictly after the open row's `fromCol` — stale/replayed
  *     changes (at or before the current version's effective time)
  *     are dropped, which makes the merge IDEMPOTENT: re-applying a
  *     batch already merged is a no-op (every ts ≤ the new open
  *     row's `fromCol`);
  *   - each touched key's open row is closed at the key's FIRST
  *     effective delta ts;
  *   - effective delta rows become the key's new interval chain
  *     (lead() per key; last one open);
  *   - closed history and untouched open rows pass through unchanged.
  *
  * Scale shape: everything is keyed on `keyCols` — one shuffle for
  * the per-key delta window, one aggregate for the first-ts frame
  * (map-combined, key-sized output), and two key-equi joins that AQE
  * broadcasts when the changeset is small (the common case: a batch
  * of changes against a huge dimension — the big base side is never
  * shuffled for them) and shuffles otherwise. No windows over the
  * base table: history rows stream through untouched.
  */
object Scd2 {

  /** Point-in-time (`AS OF ts`) read over an SCD-2 temporal table —
    * the natural consumer of [[mergeApply]]'s output: for each probe
    * row (key + `tsCol`) return the version valid at that instant,
    * i.e. the row with `fromCol <= ts < coalesce(toCol, +inf)`.
    *
    * Composes with the as-of machinery instead of a predicate join:
    * versions become per-key states at `fromCol` and
    * [[AsofJoin.keyed]] carries the floor version to each probe in
    * ONE keyed shuffle + window pass — no join operator at all, no
    * cartesian, and no per-probe interval scan (the naive
    * `fromCol <= ts < toCol` theta-join re-checks every version per
    * probe). Correctness beyond the chained-interval happy path:
    *
    *  - zero-length versions (`fromCol == toCol`, produced when two
    *    changes share a key and timestamp) are valid at NO instant —
    *    they are dropped up front, which also restores the per-key
    *    timestamp uniqueness [[AsofJoin.keyed]] requires;
    *  - gapped histories (a closed version followed by nothing until
    *    a later version) are handled by an expiry guard: a carried
    *    version whose `toCol <= ts` was no longer valid at the probe
    *    instant, so its attributes read as NULL (same answer as the
    *    predicate join).
    *
    * Output: every probe row plus `asof_<fromCol>`, `asof_<attr>`...,
    * `asof_<toCol>` (all NULL when no version was valid at `ts`).
    * Scale shape: one shuffle on `keyCols` for the union'd window —
    * the 100 TB story of the keyed as-of join (AsofJoin.scala:38).
    */
  def asOfRead(table: DataFrame, probes: DataFrame, keyCols: Seq[String],
      attrCols: Seq[String], fromCol: String = "valid_from",
      toCol: String = "valid_to", tsCol: String = "ts"): DataFrame = {
    require(keyCols.nonEmpty, "asOfRead needs at least one key column")
    val readable = table.filter(col(toCol).isNull || col(fromCol) < col(toCol))
    val stateCols = (fromCol +: attrCols) :+ toCol
    val states = readable.select(
      keyCols.map(col) ++ Seq(col(fromCol).as(tsCol)) ++ stateCols.map(col): _*)
    val joined = AsofJoin.keyed(probes, states, keyCols, tsCol, stateCols)
    val expired = col(s"asof_$toCol").isNotNull &&
      col(s"asof_$toCol") <= col(tsCol)
    // one select so the expiry test reads the ORIGINAL carried toCol
    // for every guarded column (a per-column withColumn chain would
    // null toCol first and un-expire the rest)
    joined.select(joined.columns.toIndexedSeq.map { c =>
      if (stateCols.map("asof_" + _).contains(c))
        when(expired, lit(null)).otherwise(col(c)).as(c)
      else col(c)
    }: _*)
  }

  /** The shared merge core: base split into open/closed, the delta
    * gated into effective (`eff`) vs stale (`stale` — at or before the
    * open row's effective time, dropped for idempotence), the new
    * per-key interval chain (`effIv`), and the per-touched-key first
    * effective ts (`firstTs`, column `_graft_first_ts`).
    */
  private case class MergeParts(open: DataFrame, closed: DataFrame,
      eff: DataFrame, stale: DataFrame, effIv: DataFrame, firstTs: DataFrame)

  private def mergeParts(base: DataFrame, delta: DataFrame,
      keyCols: Seq[String], attrCols: Seq[String], fromCol: String,
      toCol: String, tsCol: String, tieCols: Seq[String]): MergeParts = {
    val k = keyCols.map(col)
    val open = base.filter(col(toCol).isNull)
    val closed = base.filter(col(toCol).isNotNull)
    // staleness gate: joins only the key-sized open-row metadata
    val openMeta = open.select((k :+ col(fromCol).as("_graft_open_from")): _*)
    val gated = delta.join(openMeta, keyCols, "left")
    val effCond = col("_graft_open_from").isNull ||
      col(tsCol) > col("_graft_open_from")
    val eff = gated.filter(effCond).drop("_graft_open_from")
    val stale = gated.filter(!effCond).drop("_graft_open_from")
    // new interval chain per touched key (tie columns ride along for
    // the window order even when they are not output attributes).
    // tsCol is renamed to fromCol by the select below, so a tieCols
    // entry naming tsCol (or fromCol) must resolve against fromCol —
    // which already leads the ordering, so it simply drops out.
    val extraTies = tieCols.filterNot(c =>
      attrCols.contains(c) || keyCols.contains(c) || c == tsCol)
    val orderTies = tieCols.map(c => if (c == tsCol) fromCol else c)
      .filterNot(_ == fromCol)
    val effIv = eff
      .select((k ++ Seq(col(tsCol).as(fromCol)) ++
        (attrCols ++ extraTies).map(col)): _*)
      .withColumn(toCol, lead(col(fromCol), 1).over(
        Window.partitionBy(k: _*)
          .orderBy((col(fromCol) +: orderTies.map(col)): _*)))
    val firstTs = eff.groupBy(k: _*).agg(min(col(tsCol)).as("_graft_first_ts"))
    MergeParts(open, closed, eff, stale, effIv, firstTs)
  }

  def mergeApply(base: DataFrame, delta: DataFrame, keyCols: Seq[String],
      attrCols: Seq[String], fromCol: String = "valid_from",
      toCol: String = "valid_to", tsCol: String = "ts",
      tieCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "mergeApply needs at least one key column")
    val outCols = (keyCols ++ Seq(fromCol) ++ attrCols ++ Seq(toCol)).map(col)
    val p = mergeParts(base, delta, keyCols, attrCols, fromCol, toCol,
      tsCol, tieCols)
    // close each touched open row at the key's first effective ts;
    // untouched open rows keep toCol NULL through the coalesce
    val openAdj = p.open.join(p.firstTs, keyCols, "left")
      .withColumn(toCol, coalesce(col("_graft_first_ts"), col(toCol)))
      .drop("_graft_first_ts")
    p.closed.select(outCols: _*)
      .unionByName(openAdj.select(outCols: _*))
      .unionByName(p.effIv.select(outCols: _*))
  }

  /** CDC changelog for [[mergeApply]] — the audit trail a lakehouse
    * MERGE produces, emitted as first-class rows instead of being
    * discarded by the table rewrite. One row per CHANGE:
    *
    *   - `close`: a touched key's open row, with its original
    *     `fromCol` and the NEW `toCol` it was closed at (the key's
    *     first effective delta ts);
    *   - `insert`: each new interval from the effective delta chain
    *     (the same rows [[mergeApply]] appends);
    *   - `stale`: delta rows the idempotence gate dropped (ts at or
    *     before the open row's effective time) — `toCol` NULL.
    *
    * Deliberately NOT emitted: `unchanged` base rows. A changelog must
    * be CHANGESET-sized — at 100 TB the unchanged dimension dwarfs
    * every batch, and it is derivable as the complement. Output is
    * bounded by |delta| + touched keys; the plan shares
    * [[mergeApply]]'s shape (key-sized open-row metadata join, one
    * keyed window, one key aggregate) with no base-table window, so
    * running both per batch costs one extra changeset-sized pass.
    * Composes with `PipelineOps.snapshotDiff`'s classification shape.
    */
  def changelog(base: DataFrame, delta: DataFrame, keyCols: Seq[String],
      attrCols: Seq[String], fromCol: String = "valid_from",
      toCol: String = "valid_to", tsCol: String = "ts",
      tieCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "changelog needs at least one key column")
    val k = keyCols.map(col)
    val outCols = (keyCols ++ Seq("action", fromCol) ++ attrCols ++
      Seq(toCol)).map(col)
    val p = mergeParts(base, delta, keyCols, attrCols, fromCol, toCol,
      tsCol, tieCols)
    val toType = base.schema(toCol).dataType
    // inner join: only keys with an effective change close their open row
    val closes = p.open.join(p.firstTs, keyCols, "inner")
      .withColumn(toCol, col("_graft_first_ts"))
      .withColumn("action", lit("close"))
    val inserts = p.effIv.withColumn("action", lit("insert"))
    val stales = p.stale
      .withColumn(fromCol, col(tsCol))
      .withColumn(toCol, lit(null).cast(toType))
      .withColumn("action", lit("stale"))
    closes.select(outCols: _*)
      .unionByName(inserts.select(outCols: _*))
      .unionByName(stales.select(outCols: _*))
  }
}
