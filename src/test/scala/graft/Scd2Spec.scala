package graft

import graft.operators.Scd2
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
/** SCD-2 merge-apply semantics: close-then-insert, staleness gate,
  * new keys, untouched keys, and MERGE idempotence (re-applying an
  * already-merged batch is a no-op).
  */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  // base: k1 has history [10,20) 'a' + open [20,∞) 'b'; k2 open-only;
  // k3 absent (new-key case); k4 open, untouched by any delta
  private def base: DataFrame = Seq(
    ("k1", 10L, "a", Some(20L)),
    ("k1", 20L, "b", None),
    ("k2", 5L, "x", None),
    ("k4", 7L, "q", None)
  ).toDF("k", "valid_from", "v", "valid_to")
    .withColumn("valid_to", col("valid_to").cast("long"))

  private def delta: DataFrame = Seq(
    ("k1", 30L, "c"), ("k1", 40L, "d"), // two chained changes
    ("k2", 5L, "y"),                    // STALE: ts == open valid_from
    ("k3", 15L, "n")                    // new key, no open row
  ).toDF("k", "ts", "v")

  private def merged: DataFrame =
    Scd2.mergeApply(base, delta, Seq("k"), Seq("v"))

  private def rows(df: DataFrame): Set[(String, Long, String, Option[Long])] =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
      if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet

  test("close-then-insert, staleness gate, new key, untouched key") {
    val got = rows(merged.select("k", "valid_from", "v", "valid_to"))
    assert(got == Set(
      ("k1", 10L, "a", Some(20L)),  // closed history untouched
      ("k1", 20L, "b", Some(30L)),  // open row closed at first delta
      ("k1", 30L, "c", Some(40L)),  // chained
      ("k1", 40L, "d", None),       // new open row
      ("k2", 5L, "x", None),        // stale delta dropped -> still open
      ("k3", 15L, "n", None),       // new key: inserted open
      ("k4", 7L, "q", None)         // untouched key passes through
    ))
    // exactly one open row per surviving key
    val opens = merged.filter(col("valid_to").isNull)
      .groupBy("k").count().collect().map(_.getLong(1))
    assert(opens.forall(_ == 1L))
  }

  test("changelog: close/insert/stale rows, changeset-sized, consistent " +
      "with mergeApply") {
    val log = Scd2.changelog(base, delta, Seq("k"), Seq("v"))
    val got = log.select("k", "action", "valid_from", "v", "valid_to")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getString(3), if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSet
    assert(got == Set(
      ("k1", "close", 20L, "b", Some(30L)),  // old from + NEW closing ts
      ("k1", "insert", 30L, "c", Some(40L)),
      ("k1", "insert", 40L, "d", None),
      ("k2", "stale", 5L, "y", None),        // gate-dropped replay
      ("k3", "insert", 15L, "n", None)
    ))
    // k4 (untouched) and closed history NEVER appear: changeset-sized
    assert(!got.exists(_._1 == "k4"))
    // insert + stale partition the delta exactly
    assert(got.count(r => r._2 == "insert" || r._2 == "stale") ==
      delta.count())
    // the insert rows are precisely what mergeApply appended
    val appended = rows(merged.select("k", "valid_from", "v", "valid_to")) --
      rows(base.select("k", "valid_from", "v", "valid_to")) -
      (("k1", 20L, "b", Some(30L)))  // the re-closed open row
    assert(got.filter(_._2 == "insert").map(r => (r._1, r._3, r._4, r._5)) ==
      appended)
  }

  test("idempotence: re-applying the same batch is a no-op") {
    val once = merged
    val twice = Scd2.mergeApply(once, delta, Seq("k"), Seq("v"))
    assert(rows(twice.select("k", "valid_from", "v", "valid_to")) ==
      rows(once.select("k", "valid_from", "v", "valid_to")))
  }

  test("equal-ts delta ties are ordered by tieCols deterministically") {
    val d2 = Seq(("k9", 50L, "b2", 2L), ("k9", 50L, "a1", 1L))
      .toDF("k", "ts", "v", "tie")
    val b0 = Seq.empty[(String, Long, String, Option[Long])]
      .toDF("k", "valid_from", "v", "valid_to")
      .withColumn("valid_to", col("valid_to").cast("long"))
    val out = Scd2.mergeApply(b0, d2, Seq("k"), Seq("v"), tieCols = Seq("tie"))
      .orderBy("valid_from", "v").collect()
    // tie=1 comes first: a1 holds [50,50), b2 is the open row
    assert(out.map(_.getString(2)).toSeq == Seq("a1", "b2"))
    assert(out(0).getLong(3) == 50L && out(1).isNullAt(3))
  }

  test("tieCols naming tsCol resolves (ts is renamed to fromCol by then)") {
    // callers commonly write tieCols = Seq(tsCol, secondary) — tsCol
    // must remap to the renamed fromCol, not throw unresolved-column
    val d2 = Seq(("k9", 50L, "b2", 2L), ("k9", 50L, "a1", 1L))
      .toDF("k", "ts", "v", "tie")
    val b0 = Seq.empty[(String, Long, String, Option[Long])]
      .toDF("k", "valid_from", "v", "valid_to")
      .withColumn("valid_to", col("valid_to").cast("long"))
    val withTs = Scd2.mergeApply(b0, d2, Seq("k"), Seq("v"),
        tieCols = Seq("ts", "tie"))
      .orderBy("valid_from", "v").collect()
    val plain = Scd2.mergeApply(b0, d2, Seq("k"), Seq("v"),
        tieCols = Seq("tie"))
      .orderBy("valid_from", "v").collect()
    assert(withTs.map(_.toSeq).toSeq == plain.map(_.toSeq).toSeq)
  }

  test("asOfRead: containment semantics, gaps expire, zero-length versions " +
      "unreadable, pre-history probes null") {
    // k1: chained [10,20) a, [20,30) b, open [30,∞) c
    // k2: GAPPED history — closed [10,20) x, then nothing until open [50,∞) y
    // k3: zero-length [40,40) z0 then open [40,∞) z1 (same-instant change)
    val table = Seq(
      ("k1", 10L, "a", Some(20L)), ("k1", 20L, "b", Some(30L)),
      ("k1", 30L, "c", None),
      ("k2", 10L, "x", Some(20L)), ("k2", 50L, "y", None),
      ("k3", 40L, "z0", Some(40L)), ("k3", 40L, "z1", None)
    ).toDF("k", "valid_from", "v", "valid_to")
      .withColumn("valid_to", col("valid_to").cast("long"))
    val probes = Seq(
      ("k1", 5L),   // before any version -> nulls
      ("k1", 10L),  // inclusive start -> a
      ("k1", 20L),  // boundary: a expired, b starts -> b
      ("k1", 99L),  // open row -> c
      ("k2", 25L),  // inside the GAP -> nulls (x expired at 20)
      ("k2", 50L),  // gap ends -> y
      ("k3", 40L),  // zero-length z0 never readable -> z1
      ("k9", 10L)   // unknown key -> nulls
    ).toDF("k", "ts")
    val got = Scd2.asOfRead(table, probes, Seq("k"), Seq("v"))
      .select("k", "ts", "asof_v").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2))).toSet
    assert(got == Set(
      ("k1", 5L, null), ("k1", 10L, "a"), ("k1", 20L, "b"), ("k1", 99L, "c"),
      ("k2", 25L, null), ("k2", 50L, "y"), ("k3", 40L, "z1"),
      ("k9", 10L, null)), got.toString)
    // the expiry guard nulls the WHOLE version consistently (from/to too)
    val gapRow = Scd2.asOfRead(table, probes.filter(col("ts") === 25L),
      Seq("k"), Seq("v")).collect().head
    assert(gapRow.isNullAt(gapRow.fieldIndex("asof_valid_from"))
      && gapRow.isNullAt(gapRow.fieldIndex("asof_valid_to")))
  }

  test("asOfRead composes with mergeApply: reading the merged table at a " +
      "version boundary returns the post-merge version") {
    val t = Scd2.mergeApply(base, delta, Seq("k"), Seq("v"))
    val probes = Seq(("k1", 35L), ("k2", 99L), ("k3", 14L)).toDF("k", "ts")
    val got = Scd2.asOfRead(t, probes, Seq("k"), Seq("v"))
      .select("k", "asof_v").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getString(1)))
      .toMap
    // k1 at 35 sits in [30,40) 'c'; k2 still open 'x'; k3 before its
    // first version (inserted at 15) -> null
    assert(got == Map("k1" -> "c", "k2" -> "x", "k3" -> null), got.toString)
  }

  // ----------------------------------------------------------------
  // Changelog REPLAY property: the contract a downstream CDC consumer
  // relies on — applying the emitted changelog to the base reproduces
  // mergeApply's table exactly, including across a two-batch stream
  // where batch 1's merged table is batch 2's base (the
  // q_scd2_stream_merge loop). Randomized with key/ts/tie collisions
  // so equal-ts ordering, staleness gating, and new-key chains are
  // all exercised (the RandomDiffSpec pattern).
  // ----------------------------------------------------------------

  /** The consumer-side replay: set each 'close' action's NEW valid_to
    * on the matching (key, valid_from) row, append the 'insert' rows,
    * ignore 'stale'. Base rows are unique per (k, valid_from) by
    * construction (the generator dedupes), so the close join is exact.
    */
  private def applyChangelog(b: DataFrame, log: DataFrame): DataFrame = {
    val closes = log.filter(col("action") === "close")
      .select(col("k"), col("valid_from"), col("valid_to").as("_new_to"))
    val inserts = log.filter(col("action") === "insert").drop("action")
    // only the OPEN row takes the close — a zero-length closed row
    // (equal-ts ties) can share (k, valid_from) with the open row and
    // must stay untouched, exactly as mergeApply leaves it
    b.join(closes, Seq("k", "valid_from"), "left")
      .withColumn("valid_to",
        when(col("valid_to").isNull, col("_new_to"))
          .otherwise(col("valid_to")))
      .drop("_new_to")
      .unionByName(inserts.select(b.columns.map(col).toIndexedSeq: _*))
  }

  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.selectExpr(cols.toIndexedSeq: _*).collect()
      .map(_.toString).toSeq.sorted
  }

  test("replay property: apply(changelog) == mergeApply on randomized " +
      "collision-heavy inputs, single batch and two-batch sequence") {
    for (seed <- 0 until 6) {
      val rnd = new scala.util.Random(seed)
      def randRows(n: Int, tsLo: Int, tsHi: Int, idBase: Long) =
        (0 until n).map { i =>
          ("k" + rnd.nextInt(8), (tsLo + rnd.nextInt(tsHi - tsLo)).toLong,
            "v" + rnd.nextInt(4), idBase + i)
        }
      // base: a VALID temporal table — dedupe (k, ts) keep max id,
      // then chain per key (lead); ~half the keys get history depth
      val b0 = randRows(40, 0, 30, 0L)
        .toDF("k", "valid_from", "v", "id")
        .groupBy("k", "valid_from")
        .agg(max(struct(col("id"), col("v"))).as("m"))
        .select(col("k"), col("valid_from"), col("m.v").as("v"),
          col("m.id").as("id"))
        .withColumn("valid_to", lead(col("valid_from"), 1).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("k").orderBy("valid_from")))
      // deltas overlap the base's ts range (stale rows), collide on
      // (k, ts) with distinct tie ids (equal-ts ordering), and run
      // past it (new chains); some keys are absent from base
      val d1 = randRows(40, 15, 45, 1000L).toDF("k", "ts", "v", "id")
      val d2 = randRows(40, 25, 60, 2000L).toDF("k", "ts", "v", "id")
      val attrs = Seq("v", "id")
      val m1 = Scd2.mergeApply(b0, d1, Seq("k"), attrs, tieCols = Seq("id"))
      val log1 = Scd2.changelog(b0, d1, Seq("k"), attrs, tieCols = Seq("id"))
      assert(canon(applyChangelog(b0, log1)) == canon(m1),
        s"seed=$seed single-batch replay diverged")
      // two-batch sequence: m1 is batch 2's base (the streaming loop);
      // localCheckpoint m1 so both consumers read the same frame once
      val m1c = m1.localCheckpoint()
      val m2 = Scd2.mergeApply(m1c, d2, Seq("k"), attrs, tieCols = Seq("id"))
      val log2 = Scd2.changelog(m1c, d2, Seq("k"), attrs, tieCols = Seq("id"))
      assert(canon(applyChangelog(applyChangelog(b0, log1), log2)) ==
        canon(m2), s"seed=$seed two-batch replay diverged")
      // stale rows never affect the replay: dropping them is a no-op
      // by construction (replay ignores them), but they must also
      // partition the delta with the inserts
      val acts = log1.groupBy("action").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(acts.getOrElse("insert", 0L) + acts.getOrElse("stale", 0L) ==
        d1.count(), s"seed=$seed insert+stale must partition the delta")
    }
  }
}
