package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Probe-cost lab for the stats-backed join planner: the r15 verdict
  * named `hotKeyShare`'s full key-column scan per gate decision as
  * the last asserted-not-measured cost in the repo — "at 100 TB a
  * planner reads persisted stats instead". This measures exactly
  * that trade on the driver corpora:
  *
  *  - LIVE probe: [[graft.operators.Scale.hotKeyShare]] over the big
  *    side (map-combined, but still a scan of every key) — repeated
  *    at 1× and a 10× self-union to show the cost is DATA-sized;
  *  - STATS lookup: [[graft.operators.Scale.keyStats]] +
  *    [[graft.operators.Scale.statsJoinDecision]] against the
  *    persisted artifact (a `.head()` on a ≤|columns|-row single-part
  *    parquet plus one counter-sized join) — flat in the data;
  *  - BUILD (one-time, amortized over every later decision): the
  *    profiler pass that writes the artifact.
  *
  *   runMain graft.StatsGateLab <sfDir> [runs]
  */
object StatsGateLab {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: runMain graft.StatsGateLab <sfDir> [runs]")
    val dir = args(0)
    val runs = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val S = graft.llm.SketchOps
    val Sc = graft.operators.Scale

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def fmt(f: => Unit): String =
      (1 to runs).map(_ => f"${timed(f)}%.3f").mkString("/")

    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val li10 = (1 to 10).map(_ => li).reduce(_ unionByName _)
    val ord = spark.read.parquet(s"$dir/orders.parquet")
    println(s"corpus $dir, $runs runs each (run 1 cold), times in sec")

    println(s"LIVE hotKeyShare probe, 1x lineitem:   ${fmt(
      Sc.hotKeyShare(li, "l_orderkey"))}")
    println(s"LIVE hotKeyShare probe, 10x lineitem:  ${fmt(
      Sc.hotKeyShare(li10, "l_orderkey"))}")

    val work = graft.sources.Staging.sessionTempDir("graft_statslab")
    def build(name: String, df: DataFrame, key: String): Double = timed(
      S.saveTableStats(
        S.tableStats(df, col(key), Seq((key, col(key), None))),
        s"$work/$name"))
    println(f"BUILD lineitem artifact (one-time):    ${build("li",
      li, "l_orderkey")}%.3f")
    println(f"BUILD 10x-lineitem artifact:           ${build("li10",
      li10, "l_orderkey")}%.3f")
    println(f"BUILD orders artifact (one-time):      ${build("ord",
      ord, "o_orderkey")}%.3f")

    val liTs = S.loadTableStats(spark, s"$work/li")
    val li10Ts = S.loadTableStats(spark, s"$work/li10")
    val ordTs = S.loadTableStats(spark, s"$work/ord")
    def counters(ts: S.TableStats, key: String) =
      ts.counters.filter(col("colname") === key).drop("colname")
    def decide(big: S.TableStats, bigKey: String): Unit = {
      val d = Sc.statsJoinDecision(Sc.keyStats(big, bigKey),
        Sc.keyStats(ordTs, "o_orderkey"), counters(big, bigKey),
        counters(ordTs, "o_orderkey"))
      require(d.branch.nonEmpty)
    }
    println(s"STATS full decision, 1x artifact:      ${fmt(
      decide(liTs, "l_orderkey"))}")
    println(s"STATS full decision, 10x artifact:     ${fmt(
      decide(li10Ts, "l_orderkey"))}")

    // join-ORDER planning (r16 next-round #1): the full 3-table
    // enumeration — planTable collects counter-sized frames once,
    // then every candidate order is bounded driver-side. Flat at 10x
    // by construction (the collected state is ≤ depth·width cells per
    // column no matter the table size).
    val cust = spark.read.parquet(s"$dir/customer.parquet")
    println(f"BUILD orders(2-col)+customer artifacts: ${timed {
      S.saveTableStats(S.tableStats(ord, col("o_orderkey"),
        Seq(("o_orderkey", col("o_orderkey"), None),
          ("o_custkey", col("o_custkey"), None))), s"$work/ord2")
      S.saveTableStats(S.tableStats(cust, col("c_custkey"),
        Seq(("c_custkey", col("c_custkey"), None))), s"$work/cust")
    }}%.3f")
    val ord2Ts = S.loadTableStats(spark, s"$work/ord2")
    val custTs = S.loadTableStats(spark, s"$work/cust")
    def orderDecision(li: S.TableStats): Unit = {
      val d = Sc.statsJoinOrder(
        Seq(Sc.planTable(li, "lineitem", Seq("l_orderkey")),
          Sc.planTable(ord2Ts, "orders", Seq("o_orderkey", "o_custkey")),
          Sc.planTable(custTs, "customer", Seq("c_custkey"))),
        Seq(Sc.JoinEdge("lineitem", "l_orderkey", "orders", "o_orderkey"),
          Sc.JoinEdge("orders", "o_custkey", "customer", "c_custkey")))
      require(d.order.nonEmpty)
    }
    println(s"ORDER plan (3-table chain), 1x:        ${fmt(
      orderDecision(liTs))}")
    println(s"ORDER plan (3-table chain), 10x:       ${fmt(
      orderDecision(li10Ts))}")

    // Selinger-DP rung (r18): same collected state, subset-DP over it
    // — decision cost flat at 10x by the same construction (driver
    // arithmetic over ≤ depth·width cells per column)
    def dpDecision(li: S.TableStats): Unit = {
      val d = Sc.statsJoinOrderDp(
        Seq(Sc.planTable(li, "lineitem", Seq("l_orderkey")),
          Sc.planTable(ord2Ts, "orders", Seq("o_orderkey", "o_custkey")),
          Sc.planTable(custTs, "customer", Seq("c_custkey"))),
        Seq(Sc.JoinEdge("lineitem", "l_orderkey", "orders", "o_orderkey"),
          Sc.JoinEdge("orders", "o_custkey", "customer", "c_custkey")))
      require(d.shapeString.nonEmpty)
    }
    println(s"DP plan (3-table chain), 1x:           ${fmt(
      dpDecision(liTs))}")
    println(s"DP plan (3-table chain), 10x:          ${fmt(
      dpDecision(li10Ts))}")

    // DERIVED filtered-dim pricing (r19): persist the parent
    // histogram once, then derive a 1%-selective dim's PlanTable from
    // it at plan time — the derivation is a histogram filter +
    // catalog-sized re-finalize, so it must be flat in the table
    // size (the 10x histogram has the same cardinality, only bigger
    // counts)
    println(f"BUILD orders histogram artifact:       ${timed(
      S.saveTableStatsWithHist(S.histFrame(ord, col("o_orderkey"),
        Seq(("o_orderkey", col("o_orderkey"), None))), s"$work/ordh"))}%.3f")
    val ord10 = (1 to 10).map(_ => ord).reduce(_ unionByName _)
    println(f"BUILD 10x-orders histogram artifact:   ${timed(
      S.saveTableStatsWithHist(S.histFrame(ord10, col("o_orderkey"),
        Seq(("o_orderkey", col("o_orderkey"), None))), s"$work/ordh10"))}%.3f")
    def derivedDecision(histPath: String): Unit = {
      val hist = spark.read.parquet(s"$histPath/hist")
      val dim = Sc.planTable(S.filteredTableStats(hist, "o_orderkey",
        "d_key", t => t.cast("long") % 100 === 0), "dim", Seq("d_key"))
      val d = Sc.statsJoinOrderDp(
        Seq(Sc.planTable(ord2Ts, "orders",
            Seq("o_orderkey", "o_custkey")),
          dim, Sc.planTable(custTs, "customer", Seq("c_custkey"))),
        Seq(Sc.JoinEdge("orders", "o_orderkey", "dim", "d_key"),
          Sc.JoinEdge("orders", "o_custkey", "customer", "c_custkey")))
      require(d.shapeString.nonEmpty)
    }
    println(s"DERIVED-dim DP plan, 1x histogram:     ${fmt(
      derivedDecision(s"$work/ordh"))}")
    println(s"DERIVED-dim DP plan, 10x histogram:    ${fmt(
      derivedDecision(s"$work/ordh10"))}")

    spark.stop()
  }
}
