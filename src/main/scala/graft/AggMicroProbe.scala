package graft

import graft.model.TraceRow
import graft.operators.{TraceEtl, TraceTreeAggregator, TreeBuf}
import org.apache.spark.sql.SparkSession

/** Isolates the pure-JVM cost of the fused commit aggregation from
  * Spark's plumbing (row deserialization, buffer encoding, shuffle):
  * collects the pruned trace set once, then times reduce+merge+finish
  * as plain Scala over the in-memory rows. If the pure loop is cheap,
  * the commit phase's cost is encoder/shuffle overhead, not the
  * aggregation logic.
  */
object AggMicroProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows: Array[TraceRow] =
      TraceEtl.pruneNonZk(TraceEtl.normalize(
        graft.sources.SyntheticTraces.bronze(spark, dir))).collect()
    println(s"pruned rows: ${rows.length}")
    val agg = new TraceTreeAggregator()
    for (pass <- 1 to 3) {
      var t0 = System.nanoTime()
      val bufs = new java.util.HashMap[(Long, String), TreeBuf]()
      var i = 0
      while (i < rows.length) {
        val r = rows(i)
        val k = (r.chain_id, r.transaction_hash)
        val b = bufs.get(k)
        bufs.put(k, agg.reduce(if (b == null) agg.zero else b, r))
        i += 1
      }
      val tReduce = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      var commits = 0
      val it = bufs.values().iterator()
      while (it.hasNext) {
        if (agg.finish(it.next()).transaction.nonEmpty) commits += 1
      }
      val tFinish = (System.nanoTime() - t0) / 1e9
      println(f"pass $pass: reduce ${tReduce}%.3f s (${bufs.size()} groups), " +
        f"finish ${tFinish}%.3f s ($commits commits)")
    }
    spark.stop()
  }
}
