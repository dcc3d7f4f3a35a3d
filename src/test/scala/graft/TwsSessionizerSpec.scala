package graft

import graft.model._
import graft.operators.TraceEtl
import graft.streaming.TwsSessionizer
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** transformWithState sessionizer == batch commit over the synthetic
  * corpus (the same parity bar the classic flatMapGroupsWithState
  * sessionizer passes in StreamBatchParitySpec). Runs on the RocksDB
  * state store provider, which transformWithState requires.
  */
class TwsSessionizerSpec extends SparkSpec {

  test("transformWithState sessionizer matches the batch commit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val norm = TraceEtl.normalize(
        graft.sources.SyntheticTraces.fromTpch(spark, "/root/testdata/sf0.001"))
      val (bTx, bC) = TraceEtl.split(TraceEtl.commitTraces(norm))
      val batchTx = bTx.collect().map(_.toString).toSeq.sorted
      val batchC = bC.collect().map(_.toString).toSeq.sorted

      val rows = norm.collect().sortBy(_.block_timestamp.getOrElse(0L))
      val chunks = rows.grouped(math.max(rows.length / 3, 1)).toSeq
      val mem = MemoryStream[TraceRow]
      val commits = TwsSessionizer.sessionCommit(mem.toDS(),
        gapSeconds = 1L, watermarkDelay = "10 seconds")
      val q = commits.writeStream.format("memory")
        .queryName("tws_out").outputMode("append").start()
      try {
        chunks.foreach { c => mem.addData(c.toIndexedSeq: _*); q.processAllAvailable() }
        val sentinel = rows.head.copy(transaction_hash = "0xsentinel",
          block_timestamp = Some(rows.last.block_timestamp.getOrElse(0L) + 1000000L))
        mem.addData(sentinel)
        q.processAllAvailable()
        mem.addData() // one more batch so pending timers fire
        q.processAllAvailable()

        val streamTx = spark.sql(
          "SELECT transaction.* FROM tws_out WHERE transaction IS NOT NULL")
          .as[TransactionOut].collect().map(_.toString).toSeq.sorted
        val streamC = spark.sql(
          "SELECT inline(contracts) FROM tws_out")
          .as[ContractOut].collect().map(_.toString).toSeq.sorted
        assert(streamTx == batchTx,
          s"transactions differ (stream=${streamTx.size} batch=${batchTx.size})")
        assert(streamC == batchC,
          s"contracts differ (stream=${streamC.size} batch=${batchC.size})")
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
