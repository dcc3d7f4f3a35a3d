package graft.sinks

import graft.obs.StatsRegistry
import org.apache.spark.sql.DataFrame

/** SNK5: console/log debug sink + throughput counting — the analogue
  * of the reference's `trace-result` feature printing and 10k-cadence
  * counter log (reference: main.rs:49-79).
  */
object DebugSink {

  /** foreachBatch body: count rows into the stats registry, log every
    * `logEvery` results per chain, optionally print rows.
    */
  def apply(stats: StatsRegistry, chainId: Long, logEvery: Long = 10000L,
      printRows: Boolean = false)(batch: DataFrame, batchId: Long): Unit = {
    val n = batch.count()
    val key = s"results_$chainId"
    val before = stats.snapshot.getOrElse(key, 0L)
    stats.add(key, n)
    if (before / logEvery != (before + n) / logEvery)
      println(s"[graft] chain $chainId: ${before + n} results (batch $batchId)")
    if (printRows) batch.show(20, truncate = false)
  }
}
