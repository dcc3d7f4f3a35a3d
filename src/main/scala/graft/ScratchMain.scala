package graft

/** Disposable diagnostics main for iterating on one operator — not
  * part of the driver contract; contents change round to round.
  * Currently: DP-vs-left-deep join ordering regimes per SF (shape
  * strings must be SF-invariant before the oracle literal is pinned).
  */
object ScratchMain {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val S = graft.llm.SketchOps
    val Sc = graft.operators.Scale
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val dir = s"/root/testdata/sf$sf"
      def table(name: String) = spark.read.parquet(s"$dir/$name.parquet")
      def pt(name: String, df: org.apache.spark.sql.DataFrame,
          keys: String*) = {
        val ts = S.tableStats(df, col(keys.head),
          keys.map(k => (k, col(k), Option.empty[org.apache.spark.sql.Column])).toSeq)
        Sc.planTable(ts, name, keys.toSeq)
      }
      val orders = table("orders")
      // dp_star: hub customer, two reducing branches
      val star = Seq(
        pt("orders", orders, "o_orderkey", "o_custkey"),
        pt("dsel1", orders.filter(col("o_orderkey") % 100 === 0)
          .select(col("o_orderkey").as("d1_key")), "d1_key"),
        pt("customer", table("customer"), "c_custkey"),
        pt("orders2", orders.select(col("o_custkey").as("o2_custkey"),
          col("o_orderkey").as("o2_orderkey")), "o2_custkey", "o2_orderkey"),
        pt("dsel2", orders.filter(col("o_orderkey") % 50 === 0)
          .select(col("o_orderkey").as("d2_key")), "d2_key"))
      val starEdges = Seq(
        Sc.JoinEdge("orders", "o_orderkey", "dsel1", "d1_key"),
        Sc.JoinEdge("orders", "o_custkey", "customer", "c_custkey"),
        Sc.JoinEdge("orders2", "o2_custkey", "customer", "c_custkey"),
        Sc.JoinEdge("orders2", "o2_orderkey", "dsel2", "d2_key"))
      val dStar = Sc.statsJoinOrderDp(star, starEdges, broadcastRows = 100)
      println(s"sf$sf dp_star : ${dStar.shapeString} dp=${dStar.totalBound} " +
        s"ld=${dStar.bestLeftDeepBound} bushyWin=${dStar.bushyWin}")
      // dp_chain: the existing 3-table fact chain
      val chain = Seq(
        pt("lineitem", table("lineitem"), "l_orderkey"),
        pt("ordersC", orders.select(col("o_orderkey"), col("o_custkey")),
          "o_orderkey", "o_custkey"),
        pt("customerC", table("customer")
          .select(col("c_custkey"), col("c_nationkey")), "c_custkey"))
      val chainEdges = Seq(
        Sc.JoinEdge("lineitem", "l_orderkey", "ordersC", "o_orderkey"),
        Sc.JoinEdge("ordersC", "o_custkey", "customerC", "c_custkey"))
      val dChain = Sc.statsJoinOrderDp(chain, chainEdges, broadcastRows = 100)
      println(s"sf$sf dp_chain: ${dChain.shapeString} dp=${dChain.totalBound} " +
        s"ld=${dChain.bestLeftDeepBound} bushyWin=${dChain.bushyWin}")
    }
    spark.stop()
  }
}
