package graft

import graft.llm.SketchOps
import graft.operators.Scale
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The stats-backed join planner (VERDICT r15 next-round #1): a
  * [[SketchOps.tableStats]] artifact consumed by
  * [[Scale.statsJoinDecision]] must (a) carry bit-correct planning
  * stats, (b) make the SAME salted-vs-plain call the live
  * [[Scale.hotKeyShare]] probe makes — from a catalog lookup instead
  * of a key-column scan — and (c) be a PURE plan choice: every branch
  * returns the plain join's rows exactly.
  */
class StatsGateSpec extends SparkSpec {

  private def stats(df: DataFrame, key: String): SketchOps.TableStats =
    SketchOps.tableStats(df, col(key), Seq((key, col(key), None)))

  private def keyCounters(ts: SketchOps.TableStats, key: String): DataFrame =
    ts.counters.filter(col("colname") === key).drop("colname")

  test("tableStats: exact counts, hottest key, CMS bound >= exact hot " +
      "count, KMV passthrough below k") {
    import spark.implicits._
    // 60 rows on key "hot", 40 singletons, 10 nulls
    val df = (Seq.fill(60)(Some("hot")) ++
      (1 to 40).map(i => Some(s"k$i")) ++
      Seq.fill(10)(Option.empty[String])).toDF("k")
    val ts = stats(df, "k")
    val r = ts.cols.head()
    assert(r.getString(0) == "k")
    assert(r.getLong(1) == 110L, "n_rows")
    assert(r.getLong(2) == 10L, "null_cnt")
    assert(r.getLong(3) == 41L, "n_distinct")
    assert(r.getString(4) == "hot" && r.getLong(5) == 60L, "hot term/cnt")
    assert(r.getLong(6) >= 60L, "hot_bound must never undershoot hot_cnt")
    // 41 distinct < k=128: the sketch holds everything, estimate exact
    assert(r.getLong(8) == 41L && r.getLong(9) == 41L, "KMV passthrough")
    // the artifact's counter frames equal the live cmsCounters build
    // (same raw-term hashing — what makes two tables' artifacts
    // join-size-composable)
    val live = SketchOps.cmsCounters(
        df.select(col("k").as("term")), "term", 4, 1024)
      .collect().map(_.toSeq).toSet
    val fromArtifact = keyCounters(ts, "k").collect().map(_.toSeq).toSet
    assert(fromArtifact == live)
  }

  test("stats gate decision == live hotKeyShare decision, from a " +
      "catalog lookup instead of a key-column scan") {
    import spark.implicits._
    val small = (0 to 99).map(i => (i.toLong, s"dim$i")).toDF("dk", "name")
    val uniform = (1 to 6000).map(i => ((i % 100).toLong, i.toLong))
      .toDF("k", "v")
    val hot = ((1 to 5400).map(i => (1L, i.toLong)) ++
      (1 to 600).map(i => (2L + i % 98, i.toLong))).toDF("k", "v")
    val nullHeavy = ((1 to 2400).map(i => (Some((i % 100).toLong), i.toLong))
      ++ (1 to 1600).map(i => (Option.empty[Long], i.toLong)))
      .toDF("k", "v")
    val sTs = stats(small, "dk")
    val sKs = Scale.keyStats(sTs, "dk")
    for ((df, expectSalted, name) <- Seq(
        (uniform, false, "uniform"), (hot, true, "hot"),
        (nullHeavy, false, "null-heavy"))) {
      val ts = stats(df, "k")
      val ks = Scale.keyStats(ts, "k")
      val (mx, n) = Scale.hotKeyShare(df, "k")
      // the persisted stats ARE the live probe's numbers
      assert(ks.hotCnt == mx && ks.nonNull == n,
        s"$name: artifact hot stats diverge from the live probe " +
          s"(${ks.hotCnt}/${ks.nonNull} vs $mx/$n)")
      val d = Scale.statsJoinDecision(ks, sKs,
        keyCounters(ts, "k"), keyCounters(sTs, "dk"), broadcastRows = 10)
      assert((d.branch == "salted") == expectSalted,
        s"$name: stats gate picked ${d.branch}")
      // the same decision the live gate makes
      assert((mx * 5 >= n) == expectSalted)
    }
  }

  test("every branch is a pure plan choice: identical rows, and the " +
      "plan really changes per branch") {
    import spark.implicits._
    val big = (1 to 6000).map(i => ((i % 100).toLong, i.toLong)).toDF("k", "v")
    val small = (0 to 99).map(i => (i.toLong, s"dim$i")).toDF("dk", "name")
    val bTs = stats(big, "k")
    val sTs = stats(small, "dk")
    val bKs = Scale.keyStats(bTs, "k")
    val sKs = Scale.keyStats(sTs, "dk")
    val bC = keyCounters(bTs, "k")
    val sC = keyCounters(sTs, "dk")
    val plain = big.join(small, big("k") === small("dk"))
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    def runBranch(d: Scale.JoinDecision) = {
      val j = Scale.statsGatedJoin(big, small, "k", "dk", d, salts = 8)
      (j.select("k", "v", "name").collect().map(_.toSeq).toSet,
        j.queryExecution.executedPlan.toString)
    }
    // broadcast: small side (100 rows) under the threshold
    val dB = Scale.statsJoinDecision(bKs, sKs, bC, sC, broadcastRows = 1000)
    assert(dB.branch == "broadcast")
    val (rB, pB) = runBranch(dB)
    assert(rB == plain && pB.contains("BroadcastHashJoin"))
    // shuffle with stats-sized DOP: rowsPerPartition=1 makes
    // numParts = min(maxParts, joinSizeBound) — far above the test
    // session's 4 — so both sides repartition to it and the join
    // reuses the exchanges
    val dS = Scale.statsJoinDecision(bKs, sKs, bC, sC, broadcastRows = 10,
      rowsPerPartition = 1, maxParts = 16)
    assert(dS.branch == "shuffle" && dS.numParts == 16)
    val (rS, pS) = runBranch(dS)
    assert(rS == plain)
    assert(pS.contains("hashpartitioning(k#") && pS.contains(", 16)"),
      s"shuffle branch must hash-partition to the stats-sized DOP:\n$pS")
    // salted: forced by the hot-share threshold (hottest uniform key
    // is 60/6000 = 1% >= 1/101)
    val dH = Scale.statsJoinDecision(bKs, sKs, bC, sC, broadcastRows = 10,
      hotNum = 1, hotDen = 101)
    assert(dH.branch == "salted")
    val (rH, pH) = runBranch(dH)
    assert(rH == plain && pH.contains("_salt"))
  }

  test("join-size bound from the persisted counters never " +
      "underestimates; NDV estimate recorded") {
    import spark.implicits._
    val big = (1 to 6000).map(i => ((i % 100).toLong, i.toLong)).toDF("k", "v")
    val small = (0 to 99).map(i => (i.toLong, s"dim$i")).toDF("dk", "name")
    val bTs = stats(big, "k")
    val sTs = stats(small, "dk")
    val d = Scale.statsJoinDecision(Scale.keyStats(bTs, "k"),
      Scale.keyStats(sTs, "dk"), keyCounters(bTs, "k"),
      keyCounters(sTs, "dk"), broadcastRows = 10)
    val exact = big.join(small, big("k") === small("dk")).count()
    assert(exact == 6000L)
    assert(d.joinSizeBound >= exact,
      s"CMS bound ${d.joinSizeBound} under exact $exact")
    // the planner's driver-side bound == the oracled frame-form
    // estimator (a tie-rule or hashing fix cannot silently diverge
    // the two)
    val frameBound = SketchOps.cmsJoinSize(keyCounters(bTs, "k"),
      keyCounters(sTs, "dk"), 4).head().getLong(0)
    assert(d.joinSizeBound == frameBound,
      s"local bound ${d.joinSizeBound} != frame bound $frameBound")
    // 100 and 100 distinct keys, fully overlapping: the textbook
    // rows_a*rows_b/max(ndv) formula gives exactly the true size here
    assert(d.ndvEst == 6000L, s"ndvEst ${d.ndvEst}")
  }

  test("the catalog stats-gated entry consumes the artifact at PLAN " +
      "time: no stats-artifact scan in the executed plan, and all " +
      "three branch plans are present") {
    val df = SparkEntry.queries("q_scale_stats_gated_join")(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    // the persisted stats fed the DECISION (driver-side, during plan
    // construction); the query itself must never rescan them
    assert(!plan.contains("graft_table_stats"),
      "stats-artifact files must not appear in the query's scans")
    // the three regimes really landed on three different plans
    assert(plan.contains("BroadcastHashJoin"),
      "dim_enrich regime must broadcast")
    assert(plan.contains("_salt"), "hot regime must take the salted plan")
  }

  test("join-size bound clamps at Long.MaxValue without wrapping and " +
      "the DOP ceil is overflow-safe at the clamp") {
    import spark.implicits._
    // two ~4e9-count cells: the bucketwise product is 1.6e19 > Long.Max
    // — the BigInt path must clamp, not wrap
    val cell = Map((0, 1L) -> 4000000000L)
    assert(Scale.joinSizeBoundLocal(cell, cell, 1) == Long.MaxValue)
    val huge = Seq((0, 1L, 4000000000L)).toDF("i", "bucket", "cnt")
    val ks = Scale.KeyStats(4000000000L, 0L, 1L, 1L, 4000000000L, 1L)
    val d = Scale.statsJoinDecision(ks, ks, huge, huge, depth = 1,
      broadcastRows = 0, rowsPerPartition = 1000000, maxParts = 2048)
    assert(d.joinSizeBound == Long.MaxValue)
    // the textbook ceil form (bound + rpp - 1) would overflow negative
    // here and collapse the DOP to 1; the safe form caps at maxParts
    assert(d.numParts == 2048, s"numParts ${d.numParts}")
  }

  test("table-stats artifact: save -> load -> plan == plan from the " +
      "in-session frames") {
    import spark.implicits._
    val big = (1 to 3000).map(i => ((i % 50).toLong, i.toLong)).toDF("k", "v")
    val ts = stats(big, "k")
    val path = graft.sources.Staging.sessionTempDir("graft_table_stats_seam")
    SketchOps.saveTableStats(ts, path)
    assert(new java.io.File(s"$path/_SUCCESS").isFile)
    assert(new java.io.File(s"$path/cols/_SUCCESS").isFile)
    assert(new java.io.File(s"$path/counters/_SUCCESS").isFile)
    val loaded = SketchOps.loadTableStats(spark, path)
    assert(loaded.cols.collect().map(_.toSeq).toSet ==
      ts.cols.collect().map(_.toSeq).toSet)
    assert(loaded.counters.collect().map(_.toSeq).toSet ==
      ts.counters.collect().map(_.toSeq).toSet)
    assert(Scale.keyStats(loaded, "k") == Scale.keyStats(ts, "k"))
  }
}
