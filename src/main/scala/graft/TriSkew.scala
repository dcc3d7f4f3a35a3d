package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the triangle-orientation bound on a planted power-law
  * graph (r11 VERDICT item 4): the arboricity argument in
  * [[graft.operators.GraphOps.triangleCounts]]'s scaladoc says the
  * degree-ordered orientation caps the wedge frame at Σ d⁺(v)² with
  * d⁺ = O(√m), where an unoriented wedge join pays Σ d(v)² and
  * squares the hub degree. This lab PLANTS the hub and records both
  * sides from the real frames:
  *
  *   sbt "runMain graft.TriSkew [hubDegree] [chainEvery]"
  *
  * Corpus: one hub (node 0) joined to `hubDegree` spokes, plus a
  * chain edge between every `chainEvery`-th consecutive spoke pair so
  * the graph has real triangles (hub, i, i+1). All construction is
  * in-plan (spark.range), no external paths.
  *
  * Reported, all MEASURED (counts of the actual frames, not
  * formulas): unoriented wedge pairs Σ C(d,2) evaluated from the real
  * degree frame, oriented wedge rows = count of the exact self-join
  * [[graft.operators.GraphOps.triangleCounts]] executes, max in/out
  * degree, and the triangle total as a correctness pin.
  */
object TriSkew {

  def main(args: Array[String]): Unit = {
    val hubDeg = args.headOption.map(_.toInt).getOrElse(10000)
    val chainEvery = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, hubDeg, chainEvery)
    finally spark.stop()
  }

  private def run(spark: SparkSession, hubDeg: Int, chainEvery: Int): Unit = {
    // hub 0 -> spokes 1..hubDeg; chain i -> i+1 for every chainEvery-th i
    val hub = spark.range(1, hubDeg + 1L)
      .select(lit(0L).as("src"), col("id").as("dst"))
    val chain = spark.range(1, hubDeg.toLong)
      .filter(col("id") % chainEvery === 1)
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
    val edges: DataFrame = hub.unionByName(chain)

    val (deg, oriented) = graft.operators.GraphOps.degreeOriented(
      edges, "src", "dst")
    val degStats = deg.agg(
      expr("sum(d * (d - 1) DIV 2)").as("unoriented_wedges"),
      max(col("d")).as("max_deg"), count(lit(1)).as("nodes")).head()
    val outDeg = oriented.groupBy("s").agg(count(lit(1)).as("dplus"))
    val outStats = outDeg.agg(
      expr("sum(dplus * (dplus - 1) DIV 2)").as("oriented_wedges_formula"),
      max(col("dplus")).as("max_out_deg")).head()
    // the REAL wedge frame triangleCounts executes
    val wedgeRows = oriented.as("e1").join(oriented.as("e2"),
        col("e1.s") === col("e2.s") && col("e1.t") < col("e2.t"))
      .count()
    val triTotal = graft.operators.GraphOps
      .triangleCounts(edges, "src", "dst")
      .agg(sum("triangles")).head().getLong(0)
    val nChain = (1 until hubDeg).count(_ % chainEvery == 1).toLong
    println(s"### TriSkew hubDeg=$hubDeg chainEvery=$chainEvery")
    println(s"edges=${hubDeg + nChain} nodes=${degStats.getLong(2)} " +
      s"planted_triangles=$nChain")
    println(s"max_deg=${degStats.getLong(1)} max_out_deg=${outStats.getLong(1)}")
    println(s"unoriented_wedges=${degStats.getLong(0)} " +
      s"oriented_wedge_rows=$wedgeRows " +
      s"(formula=${outStats.getLong(0)})")
    println(s"triangle_sum=$triTotal (expect ${3 * nChain}: each planted " +
      "triangle counted at hub, i, i+1)")
  }
}
