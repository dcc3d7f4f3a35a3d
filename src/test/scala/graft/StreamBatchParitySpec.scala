package graft

import graft.model._
import graft.operators.TraceEtl
import graft.streaming.StreamingEtl
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming == batch parity: the stateful sessionizer fed the whole
  * sf0.001 synthetic corpus in micro-batch chunks must commit exactly
  * the transactions/contracts the batch pipeline produces.
  */
class StreamBatchParitySpec extends SparkSpec {

  test("sessionizer over the synthetic corpus matches the batch commit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val norm = TraceEtl.normalize(
      graft.sources.SyntheticTraces.fromTpch(spark, "/root/testdata/sf0.001"))
    val (bTx, bC) = TraceEtl.split(TraceEtl.commitTraces(norm))
    val batchTx = bTx.collect().map(_.toString).toSeq.sorted
    val batchC = bC.collect().map(_.toString).toSeq.sorted

    // feed in event-time order in 3 chunks + a watermark-advancing
    // sentinel; groups commit as the watermark passes their gap.
    // watermarkDelay must exceed the reordering window: a tx whose
    // equal-timestamp rows straddle a chunk boundary would otherwise
    // have its tail dropped as late (exactly the protection the delay
    // exists for in production).
    val rows = norm.collect().sortBy(_.block_timestamp.getOrElse(0L))
    val chunks = rows.grouped(math.max(rows.length / 3, 1)).toSeq
    val mem = MemoryStream[TraceRow]
    val commits = StreamingEtl.sessionCommit(mem.toDS(),
      gapSeconds = 1L, watermarkDelay = "10 seconds")
    val q = commits.writeStream.format("memory")
      .queryName("parity_out").outputMode("append").start()
    try {
      chunks.foreach { c => mem.addData(c.toIndexedSeq: _*); q.processAllAvailable() }
      val sentinel = rows.head.copy(transaction_hash = "0xsentinel",
        block_timestamp = Some(rows.last.block_timestamp.getOrElse(0L) + 1000000L))
      mem.addData(sentinel)
      q.processAllAvailable()
      mem.addData() // one more batch so pending timeouts fire
      q.processAllAvailable()

      val streamTx = spark.sql(
        "SELECT transaction.* FROM parity_out WHERE transaction IS NOT NULL")
        .as[TransactionOut].collect().map(_.toString).toSeq.sorted
      val streamC = spark.sql(
        "SELECT inline(contracts) FROM parity_out")
        .as[ContractOut].collect().map(_.toString).toSeq.sorted
      if (streamTx != batchTx)
        fail(s"transactions differ (stream=${streamTx.size} batch=${batchTx.size})\n" +
          "stream-only: " + streamTx.diff(batchTx).take(2).mkString(" | ") +
          "\nbatch-only: " + batchTx.diff(streamTx).take(2).mkString(" | "))
      if (streamC != batchC)
        fail(s"contracts differ (stream=${streamC.size} batch=${batchC.size})\n" +
          "stream-only: " + streamC.diff(batchC).take(2).mkString(" | ") +
          "\nbatch-only: " + batchC.diff(streamC).take(2).mkString(" | "))
    } finally q.stop()
  }

  test("classic sessionizer: timer never regresses on an earlier non-late timestamp") {
    import graft.model.Addresses
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TraceRow]
    val commits = StreamingEtl.sessionCommit(mem.toDS(),
      gapSeconds = 5L, watermarkDelay = "10 seconds")
    val q = commits.writeStream.format("memory")
      .queryName("classic_regress").outputMode("append").start()
    try {
      def tr(hash: String, to: String, root: Boolean, ta: Seq[Int], ts: Long) =
        TraceRow(1L, hash, Some(0), Some("0xa"), Some(to), None, Some("0x1234567890"),
          None, Some(10L), root, Some(1L), Some(ts), Some("0xb"), None)
      val rec = Addresses.EcRecover
      // same scenario as the tws variant: max-so-far 2000, then a
      // later batch delivers a NON-LATE trace at 1993; the persisted
      // running max must keep the session's close time at 2005+
      mem.addData(tr("0xm1", "0xb", root = true, Seq.empty, 2000L))
      q.processAllAvailable()
      mem.addData(tr("0xm1", rec, root = false, Seq(0), 1993L))
      q.processAllAvailable()
      mem.addData(tr("0xtick1", "0xb", root = true, Seq.empty, 2012L)) // wm -> 2002
      q.processAllAvailable()
      assert(spark.table("classic_regress")
        .filter("transaction.transaction_hash = '0xm1'").count() == 0,
        "session committed early: timeout regressed to the batch-local max")
      mem.addData(tr("0xm1", rec, root = false, Seq(1), 2003L)) // extends to 2008
      q.processAllAvailable()
      mem.addData(tr("0xtick2", "0xb", root = true, Seq.empty, 2030L)) // wm -> 2020
      q.processAllAvailable()
      mem.addData()
      q.processAllAvailable()
      val out = spark.sql("SELECT transaction.* FROM classic_regress " +
        "WHERE transaction IS NOT NULL AND transaction.transaction_hash = '0xm1'").collect()
      assert(out.length == 1, s"expected ONE commit of 0xm1, got ${out.length}")
      assert(out.head.getAs[Long]("ec_recover_count") == 2L,
        "commit missing traces that arrived after the would-be-regressed timeout")
    } finally q.stop()
  }

  test("native stream-stream interval join: flushed output == the batch " +
      "interval join, exactly") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    Queries.stageAll(spark, dir)
    val got = SparkEntry.queries("q_stream_interval_join")(spark, dir)
      .collect().map(_.toSeq).toSet
    // independent batch recompute of the same subset + interval
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val base = ev
      .withColumn("sec", Queries.eventSeconds(ev.schema("ts").dataType))
      .filter(col("user_id") % 8 === 0)
    val probes = base.filter(col("event_type") =!= "signup")
      .groupBy(col("user_id").as("key"), col("sec").as("probe_ts"))
      .agg(max("event_id").as("probe_id"))
    val states = base.filter(col("event_type") === "signup")
      .groupBy(col("user_id").as("s_key"), col("sec").as("state_ts"))
      .agg(max("event_id").as("state_id"))
    val batch = probes.join(states,
        col("key") === col("s_key") &&
          col("state_ts") >= col("probe_ts") - 3600 &&
          col("state_ts") <= col("probe_ts"))
      .select("key", "probe_id", "probe_ts", "state_id", "state_ts")
      .collect().map(_.toSeq).toSet
    assert(got == batch)
    assert(got.nonEmpty)
  }

}
