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
    // the planner's bound is the MIN of the oracled frame-form CMS
    // estimator and the two hot-product bounds (r17) — every leg
    // sound, so the min stays >= exact; here the hot products are
    // exactly the true size (6000·1 and 100·60), so the min strips
    // the CMS's collision slack entirely
    val frameBound = SketchOps.cmsJoinSize(keyCounters(bTs, "k"),
      keyCounters(sTs, "dk"), 4).head().getLong(0)
    assert(frameBound >= d.joinSizeBound,
      s"CMS frame bound $frameBound under the planner min ${d.joinSizeBound}")
    assert(d.joinSizeBound == 6000L,
      s"hot-product legs must tighten the bound to exact, got ${d.joinSizeBound}")
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
    // hotCnt = nRows so the r17 hot-product legs (4e9 · 4e9) ALSO
    // overflow-clamp — this test pins the Long.MaxValue path
    val ks = Scale.KeyStats(4000000000L, 0L, 1L, 4000000000L,
      4000000000L, 1L)
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

  // ---- multi-join ORDER planning (r16 next-round #1) ----------------

  private def cc(ts: SketchOps.TableStats, key: String) =
    Scale.collectCounters(keyCounters(ts, key))

  test("join-order bound composition: EQUALS cmsJoinSize on the joined " +
      "intermediate's own artifact under constant multiplicity, and " +
      "never undershoots it (or the true size) under skew") {
    import spark.implicits._
    // B's k1 is unique and fully covered by A; C joins B on k2
    val b = (1 to 40).map(k => (k.toLong, (k % 8).toLong)).toDF("b_k1", "b_k2")
    val c = (0 to 7).flatMap(k2 => Seq.fill(5)(k2.toLong)).toDF("c_k2")
    val bTs = SketchOps.tableStats(b, col("b_k1"),
      Seq(("b_k1", col("b_k1"), None), ("b_k2", col("b_k2"), None)))
    val cTs = stats(c, "c_k2")
    val bcBound = Scale.joinSizeBoundBig(cc(bTs, "b_k2"), cc(cTs, "c_k2"), 4)
    def check(a: org.apache.spark.sql.DataFrame,
        expectEqual: Boolean): Unit = {
      val aTs = stats(a, "a_k1")
      val mA = Scale.keyStats(aTs, "a_k1").hotCnt
      val composed = BigInt(mA) * bcBound
      // the intermediate A ⋈ B profiled as its OWN artifact
      val inter = a.join(b, a("a_k1") === b("b_k1"))
      val iTs = stats(inter, "b_k2")
      val own = Scale.joinSizeBoundBig(cc(iTs, "b_k2"), cc(cTs, "c_k2"), 4)
      val exact = inter.join(c, inter("b_k2") === c("c_k2")).count()
      assert(own >= exact, s"own bound $own under exact $exact")
      if (expectEqual)
        assert(composed == own,
          s"constant multiplicity must compose exactly: $composed != $own")
      else
        assert(composed >= own,
          s"composed $composed under the intermediate's own bound $own")
    }
    // every A key appears exactly 3 times -> every B row replicates
    // exactly 3x in A ⋈ B, so the intermediate's counter frame is
    // cellwise 3x B's and the composed bound is EXACT
    check((1 to 40).flatMap(k => Seq.fill(3)(k.toLong)).toDF("a_k1"),
      expectEqual = true)
    // skewed A (key 1 x30, keys 2..11 once): composition scales by the
    // hottest multiplicity -> a sound overestimate
    check((Seq.fill(30)(1L) ++ (2 to 11).map(_.toLong)).toDF("a_k1"),
      expectEqual = false)
  }

  test("statsJoinOrder REORDERS the fact chain to the min-bound order, " +
      "KEEPS an already-optimal written order, and execution returns " +
      "exactly the plain join's rows") {
    val dir = "/root/testdata/sf0.001"
    def table(name: String) = spark.read.parquet(s"$dir/$name.parquet")
    def pt(name: String, keys: String*) = {
      val df = table(name)
      val ts = SketchOps.tableStats(df, col(keys.head),
        keys.map(k => (k, col(k), Option.empty[org.apache.spark.sql.Column])).toSeq)
      Scale.planTable(ts, name, keys.toSeq)
    }
    val factTables = Seq(pt("lineitem", "l_orderkey"),
      pt("orders", "o_orderkey", "o_custkey"), pt("customer", "c_custkey"))
    val factEdges = Seq(
      Scale.JoinEdge("lineitem", "l_orderkey", "orders", "o_orderkey"),
      Scale.JoinEdge("orders", "o_custkey", "customer", "c_custkey"))
    val fact = Scale.statsJoinOrder(factTables, factEdges,
      broadcastRows = 100)
    // written lineitem-first; bound(orders ⋈ customer) ≈ |orders| beats
    // bound(lineitem ⋈ orders) ≈ |lineitem| -> the planner reorders
    assert(fact.orderString == "orders,customer,lineitem",
      s"fact chain order ${fact.orderString}")
    assert(fact.steps.map(_.stepBound).sum.toDouble > 0)
    val dimTables = Seq(pt("nation", "n_nationkey", "n_regionkey"),
      pt("region", "r_regionkey"), pt("supplier", "s_nationkey"))
    val dimEdges = Seq(
      Scale.JoinEdge("nation", "n_regionkey", "region", "r_regionkey"),
      Scale.JoinEdge("supplier", "s_nationkey", "nation", "n_nationkey"))
    val dim = Scale.statsJoinOrder(dimTables, dimEdges,
      broadcastRows = 100)
    // written nation,region,supplier is already min-bound (25-row
    // first intermediate); ties resolve to the first enumerated =
    // written order
    assert(dim.orderString == "nation,region,supplier",
      s"dim chain order ${dim.orderString}")
    // 4-table chain (composition depth 3): the fact-first written
    // order is KEPT — any order including customer before the last
    // join pays its c_nationkey max-multiplicity on all later bounds
    val chain4 = Scale.statsJoinOrder(
      Seq(pt("lineitem", "l_orderkey"),
        pt("orders", "o_orderkey", "o_custkey"),
        pt("customer", "c_custkey", "c_nationkey"),
        pt("nation", "n_nationkey")),
      Seq(Scale.JoinEdge("lineitem", "l_orderkey", "orders", "o_orderkey"),
        Scale.JoinEdge("orders", "o_custkey", "customer", "c_custkey"),
        Scale.JoinEdge("customer", "c_nationkey", "nation",
          "n_nationkey")),
      broadcastRows = 100)
    assert(chain4.orderString == "lineitem,orders,customer,nation",
      s"4-table chain order ${chain4.orderString}")
    assert(chain4.steps.last.decision.branch == "broadcast",
      "the 25-row nation leg must broadcast")
    // pure plan choice: the executed chosen order == the plain join
    val dfs = Map(
      "lineitem" -> table("lineitem").select("l_orderkey", "l_linenumber"),
      "orders" -> table("orders").select("o_orderkey", "o_custkey"),
      "customer" -> table("customer").select("c_custkey", "c_nationkey"))
    val got = Scale.executeJoinOrder(dfs, fact)
      .select("l_orderkey", "l_linenumber", "o_custkey", "c_nationkey")
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    val want = dfs("lineitem")
      .join(dfs("orders"), col("l_orderkey") === col("o_orderkey"))
      .join(dfs("customer"), col("o_custkey") === col("c_custkey"))
      .select("l_orderkey", "l_linenumber", "o_custkey", "c_nationkey")
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(got.length == want.length && got.sameElements(want))
  }

  test("incremental stats update (r17): fold-in == from-scratch " +
      "rebuild, bit-identical artifact and identical plan decision") {
    import spark.implicits._
    val base = (1 to 4000).map(i => ((i % 80).toLong, i.toLong)).toDF("k", "v")
    val batch = (1 to 2000).map(i => ((i % 120).toLong, i.toLong)).toDF("k", "v")
    val cols = Seq(("k", col("k"), Option.empty[org.apache.spark.sql.Column]))
    val path = graft.sources.Staging.sessionTempDir("graft_stats_upd")
    SketchOps.saveTableStatsWithHist(
      SketchOps.histFrame(base, col("v"), cols), path)
    assert(new java.io.File(s"$path/hist").isDirectory,
      "the updatable form must persist the histogram half")
    SketchOps.updateTableStats(spark, path,
      SketchOps.histFrame(batch, col("v"), cols))
    val updated = SketchOps.loadTableStats(spark, path)
    val rebuilt = SketchOps.tableStats(base.unionByName(batch), col("v"), cols)
    assert(updated.cols.collect().map(_.toSeq).toSet ==
      rebuilt.cols.collect().map(_.toSeq).toSet,
      "updated cols/ must equal the from-scratch rebuild")
    assert(updated.counters.collect().map(_.toSeq).toSet ==
      rebuilt.counters.collect().map(_.toSeq).toSet,
      "updated counters/ must equal the from-scratch rebuild")
    assert(Scale.keyStats(updated, "k") == Scale.keyStats(rebuilt, "k"))
  }

  test("statsJoinOrder rejects a disconnected chain and non-unique " +
      "table names") {
    import spark.implicits._
    val a = Seq(1L).toDF("ak")
    val ts = stats(a, "ak")
    val p1 = Scale.planTable(ts, "t1", Seq("ak"))
    val p2 = Scale.planTable(ts, "t2", Seq("ak"))
    intercept[IllegalArgumentException] {
      Scale.statsJoinOrder(Seq(p1, p2), Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Scale.statsJoinOrder(Seq(p1, p1),
        Seq(Scale.JoinEdge("t1", "ak", "t1", "ak")))
    }
  }

  test("statsJoinOrderDp (r18): dp cost <= best left-deep on every " +
      "regime under the same model; the star regime picks a strictly " +
      "cheaper BUSHY shape; the chain regime degrades to left-deep; " +
      "step bounds never undershoot true join sizes; execution == " +
      "the plain join") {
    val dir = "/root/testdata/sf0.001"
    def table(name: String) = spark.read.parquet(s"$dir/$name.parquet")
    def ptOf(name: String, df: DataFrame, keys: String*) = {
      val ts = SketchOps.tableStats(df, col(keys.head),
        keys.map(k => (k, col(k), Option.empty[org.apache.spark.sql.Column])).toSeq)
      Scale.planTable(ts, name, keys.toSeq)
    }
    val orders = table("orders")
    val dfs = Map(
      "orders" -> orders.select("o_orderkey", "o_custkey"),
      "dsel1" -> orders.filter(col("o_orderkey") % 100 === 0)
        .select(col("o_orderkey").as("d1_key")),
      "customer" -> table("customer").select("c_custkey"),
      "orders2" -> orders.select(col("o_custkey").as("o2_custkey"),
        col("o_orderkey").as("o2_orderkey")),
      "dsel2" -> orders.filter(col("o_orderkey") % 50 === 0)
        .select(col("o_orderkey").as("d2_key")))
    val star = Seq(
      ptOf("orders", dfs("orders"), "o_orderkey", "o_custkey"),
      ptOf("dsel1", dfs("dsel1"), "d1_key"),
      ptOf("customer", dfs("customer"), "c_custkey"),
      ptOf("orders2", dfs("orders2"), "o2_custkey", "o2_orderkey"),
      ptOf("dsel2", dfs("dsel2"), "d2_key"))
    val starEdges = Seq(
      Scale.JoinEdge("orders", "o_orderkey", "dsel1", "d1_key"),
      Scale.JoinEdge("orders", "o_custkey", "customer", "c_custkey"),
      Scale.JoinEdge("orders2", "o2_custkey", "customer", "c_custkey"),
      Scale.JoinEdge("orders2", "o2_orderkey", "dsel2", "d2_key"))
    val dStar = Scale.statsJoinOrderDp(star, starEdges,
      broadcastRows = 100)
    assert(dStar.totalBound <= dStar.bestLeftDeepBound,
      "dp must never price above the best left-deep (left-deep trees " +
        "are a subset of the dp's search space)")
    assert(dStar.bushyWin, s"star regime must be a bushy win, " +
      s"got ${dStar.shapeString} dp=${dStar.totalBound} " +
      s"ld=${dStar.bestLeftDeepBound}")
    assert(dStar.shapeString ==
      "((orders2,dsel2),(customer,(orders,dsel1)))",
      s"star shape ${dStar.shapeString}")
    // SOUNDNESS of every step bound: >= the step's true join size,
    // checked by executing each subtree
    def trueRows(p: Scale.DpPlan): Long = p match {
      case Scale.DpLeaf(n, _) => dfs(n).count()
      case j: Scale.DpJoin =>
        val got = Scale.executeJoinTree(dfs, j).count()
        assert(BigInt(got) <= j.bound,
          s"step bound ${j.bound} undershoots true size $got " +
            s"at ${j.shapeString}")
        trueRows(j.left); trueRows(j.right); got
    }
    trueRows(dStar.plan)
    // execution == the plain 5-table join
    val got = Scale.executeJoinTree(dfs, dStar.plan)
      .select("o_orderkey", "o2_orderkey")
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    val want = dfs("orders")
      .join(dfs("dsel1"), col("o_orderkey") === col("d1_key"))
      .join(dfs("customer"), col("o_custkey") === col("c_custkey"))
      .join(dfs("orders2"), col("o2_custkey") === col("c_custkey"))
      .join(dfs("dsel2"), col("o2_orderkey") === col("d2_key"))
      .select("o_orderkey", "o2_orderkey")
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(got.length == want.length && got.sameElements(want),
      "dp execution must return exactly the plain join's rows")
    assert(got.nonEmpty)
    // chain regime: dp degrades to the left-deep rung
    val chain = Seq(
      ptOf("lineitem", table("lineitem"), "l_orderkey"),
      ptOf("ordersK", dfs("orders").toDF("o_orderkey", "o_custkey"),
        "o_orderkey", "o_custkey"),
      ptOf("customerK", dfs("customer"), "c_custkey"))
    val dChain = Scale.statsJoinOrderDp(chain,
      Seq(Scale.JoinEdge("lineitem", "l_orderkey", "ordersK",
        "o_orderkey"),
        Scale.JoinEdge("ordersK", "o_custkey", "customerK",
          "c_custkey")),
      broadcastRows = 100)
    assert(!dChain.bushyWin &&
      dChain.totalBound == dChain.bestLeftDeepBound,
      s"chain regime must degrade to left-deep: dp=${dChain.totalBound} " +
        s"ld=${dChain.bestLeftDeepBound}")
    assert(dChain.shapeString == "(lineitem,(ordersK,customerK))",
      s"chain shape ${dChain.shapeString}")
  }

  test("statsJoinOrderDp rejects disconnected inputs and applies " +
      "extra crossing edges of a CYCLIC graph as post-join filters") {
    import spark.implicits._
    val a = (1 to 50).map(i => (i.toLong, (i % 5).toLong)).toDF("ak", "ag")
    val b = (1 to 50).map(i => (i.toLong, (i % 5).toLong)).toDF("bk", "bg")
    def ptOf(name: String, df: DataFrame, keys: String*) = {
      val ts = SketchOps.tableStats(df, col(keys.head),
        keys.map(k => (k, col(k), Option.empty[org.apache.spark.sql.Column])).toSeq)
      Scale.planTable(ts, name, keys.toSeq)
    }
    intercept[IllegalArgumentException] {
      Scale.statsJoinOrderDp(
        Seq(ptOf("ta", a, "ak"), ptOf("tb", b, "bk")), Seq.empty)
    }
    // cyclic: two edges between the same pair — the second must apply
    // as a filter, so the result is the two-key equi-join
    val d = Scale.statsJoinOrderDp(
      Seq(ptOf("ta", a, "ak", "ag"), ptOf("tb", b, "bk", "bg")),
      Seq(Scale.JoinEdge("ta", "ak", "tb", "bk"),
        Scale.JoinEdge("ta", "ag", "tb", "bg")))
    val dfs = Map("ta" -> a, "tb" -> b)
    val got = Scale.executeJoinTree(dfs, d.plan).count()
    val want = a.join(b, col("ak") === col("bk") &&
      col("ag") === col("bg")).count()
    assert(got == want, s"cyclic-edge execution: got $got want $want")
    assert(got == 50L)
  }

  test("filteredTableStats: deriving a filtered dim from the parent " +
      "histogram EQUALS profiling the filtered table — equality and " +
      "mod predicates, stats and counters cell-for-cell") {
    import spark.implicits._
    // skewed parent: key i appears (i % 7 + 1) times, some nulls
    val rows = (1 to 200).flatMap(i =>
      Seq.fill(i % 7 + 1)(Some(i.toLong))) ++ Seq.fill(5)(Option.empty[Long])
    val parent = rows.toDF("k")
    val hist = SketchOps.histFrame(parent, col("k"),
      Seq(("k", col("k"), Option.empty[org.apache.spark.sql.Column])))
      .localCheckpoint()
    def assertSame(derived: SketchOps.TableStats,
        direct: SketchOps.TableStats): Unit = {
      val dCols = derived.cols.collect().map(_.toSeq).toSet
      val fCols = direct.cols.collect().map(_.toSeq).toSet
      assert(dCols == fCols, s"cols: derived $dCols != direct $fCols")
      val dCnt = derived.counters.collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2)) -> r.getLong(3))
        .toMap
      val fCnt = direct.counters.collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2)) -> r.getLong(3))
        .toMap
      assert(dCnt == fCnt, "counter frames differ")
    }
    // equality predicate: exactly the histogram-resident value's rows
    assertSame(
      SketchOps.filteredTableStats(hist, "k", "fk",
        t => t.cast("long") === 13L),
      SketchOps.tableStats(parent.filter(col("k") === 13L)
          .select(col("k").as("fk")), col("fk"),
        Seq(("fk", col("fk"), Option.empty[org.apache.spark.sql.Column]))))
    // mod predicate (the derived-dim entry's regime)
    assertSame(
      SketchOps.filteredTableStats(hist, "k", "fk",
        t => t.cast("long") % 10 === 0),
      SketchOps.tableStats(parent.filter(col("k") % 10 === 0)
          .select(col("k").as("fk")), col("fk"),
        Seq(("fk", col("fk"), Option.empty[org.apache.spark.sql.Column]))))
    // and the planner consumes the derived form identically
    val pDerived = Scale.planTable(
      SketchOps.filteredTableStats(hist, "k", "fk",
        t => t.cast("long") % 10 === 0), "dim", Seq("fk"))
    val pDirect = Scale.planTable(
      SketchOps.tableStats(parent.filter(col("k") % 10 === 0)
          .select(col("k").as("fk")), col("fk"),
        Seq(("fk", col("fk"), Option.empty[org.apache.spark.sql.Column]))),
      "dim", Seq("fk"))
    assert(pDerived == pDirect,
      s"PlanTable derived $pDerived != direct $pDirect")
  }
}
