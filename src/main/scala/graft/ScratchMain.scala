package graft

/** Disposable diagnostics main for iterating on one operator — not
  * part of the driver contract; contents change round to round.
  * Currently: the 4-table chain's chosen join order per SF (must be
  * SF-invariant before the oracle literal is pinned).
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
      def pt(name: String, keys: String*) = {
        val df = table(name)
        val ts = S.tableStats(df, col(keys.head),
          keys.map(k => (k, col(k), Option.empty[org.apache.spark.sql.Column])).toSeq)
        Sc.planTable(ts, name, keys.toSeq)
      }
      val tables = Seq(pt("lineitem", "l_orderkey"),
        pt("orders", "o_orderkey", "o_custkey"),
        pt("customer", "c_custkey", "c_nationkey"),
        pt("nation", "n_nationkey"))
      val edges = Seq(
        Sc.JoinEdge("lineitem", "l_orderkey", "orders", "o_orderkey"),
        Sc.JoinEdge("orders", "o_custkey", "customer", "c_custkey"),
        Sc.JoinEdge("customer", "c_nationkey", "nation", "n_nationkey"))
      val d = Sc.statsJoinOrder(tables, edges, broadcastRows = 100)
      println(s"sf$sf chain4: ${d.orderString} total=${d.totalBound} " +
        d.steps.map(st => s"${st.table}@${st.stepBound}/${st.decision.branch}").mkString(" "))
    }
    spark.stop()
  }
}
