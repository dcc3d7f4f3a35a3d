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

  test("tws: state and timers survive a checkpoint restart") {
    import graft.model.Addresses
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ckpt = java.nio.file.Files.createTempDirectory("graft_tws_ckpt").toString
      val got = new java.util.concurrent.ConcurrentLinkedQueue[TxCommit]()
      val mem = MemoryStream[TraceRow]
      def startQuery() =
        graft.streaming.TwsSessionizer.sessionCommit(mem.toDS(),
            gapSeconds = 1L, watermarkDelay = "0 seconds")
          .writeStream
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[TxCommit], _: Long) =>
            batch.collect().foreach(got.add)
          }.start()
      def tr(hash: String, to: String, root: Boolean, ta: Seq[Int], ts: Long) =
        TraceRow(1L, hash, Some(0), Some("0xa"), Some(to), None, Some("0x1234567890"),
          None, Some(7L), root, Some(1L), Some(ts), Some("0xb"), None)

      // run 1: open a tx (root + recover call), stop BEFORE its timer fires
      val q1 = startQuery()
      mem.addData(
        tr("0xr1", "0xb", root = true, Seq.empty, 1000L),
        tr("0xr1", Addresses.EcRecover, root = false, Seq(0), 1000L))
      q1.processAllAvailable()
      q1.stop()
      assert(got.isEmpty, "tx committed before its gap elapsed")

      // run 2: restart on the same checkpoint; RocksDB state + the
      // registered timer must be restored, so a watermark-advancing
      // event commits the pre-restart transaction with its full tree
      val q2 = startQuery()
      mem.addData(tr("0xtick", "0xb", root = true, Seq.empty, 50000L))
      q2.processAllAvailable()
      mem.addData() // timer delivery batch
      q2.processAllAvailable()
      q2.stop()
      val committed = got.toArray(Array.empty[TxCommit])
        .flatMap(_.transaction).filter(_.transaction_hash == "0xr1")
      assert(committed.length == 1, s"expected 1 commit of 0xr1, got ${committed.length}")
      assert(committed.head.ec_recover_count == 1L,
        "pre-restart traces missing from restored state")
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("tws: out-of-order assembly, timer re-arm, late traces dropped") {
    import graft.model.Addresses
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[TraceRow]
      val commits = TwsSessionizer.sessionCommit(mem.toDS(),
        gapSeconds = 5L, watermarkDelay = "0 seconds")
      val q = commits.writeStream.format("memory")
        .queryName("tws_ooo").outputMode("append").start()
      try {
        def tr(hash: String, from: String, to: String, root: Boolean,
            ta: Seq[Int], ts: Long): TraceRow =
          TraceRow(1L, hash, Some(0), Some(from), Some(to), None, Some("0x1234567890"),
            None, Some(10L), root, Some(1L), Some(ts), Some("0xb"), None)
        val rec = Addresses.EcRecover
        // child before root, across micro-batches; each arrival re-arms
        // the tx's timer to last-event + gap
        mem.addData(tr("0xs1", "0xb", rec, root = false, Seq(1), ts = 1000L))
        q.processAllAvailable()
        mem.addData(tr("0xs1", "0xa", "0xb", root = true, Seq.empty, ts = 1001L))
        q.processAllAvailable()
        assert(spark.table("tws_ooo").count() == 0) // timer not expired yet
        // advance the watermark past 1001 + 5 s: the timer fires
        mem.addData(tr("0xtick1", "0xa", "0xb", root = true, Seq.empty, ts = 2000L))
        q.processAllAvailable()
        mem.addData(tr("0xtick2", "0xa", "0xb", root = true, Seq.empty, ts = 2001L))
        q.processAllAvailable()
        val out = spark.sql(
          "SELECT transaction.* FROM tws_ooo WHERE transaction IS NOT NULL").collect()
        assert(out.length == 1 && out.head.getAs[String]("transaction_hash") == "0xs1")
        assert(out.head.getAs[Long]("ec_recover_count") == 1L)
        // a late trace for the committed tx (event time far behind the
        // watermark) must NOT resurrect it or corrupt a neighbor
        mem.addData(tr("0xs1", "0xz", rec, root = false, Seq(2), ts = 1002L))
        q.processAllAvailable()
        mem.addData(tr("0xtick3", "0xa", "0xb", root = true, Seq.empty, ts = 3000L))
        q.processAllAvailable()
        val again = spark.sql(
          "SELECT transaction.* FROM tws_ooo WHERE transaction IS NOT NULL " +
            "AND transaction.transaction_hash = '0xs1'").count()
        assert(again == 1, s"late trace resurrected the committed tx ($again rows)")
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("tws: timer never regresses when a later batch carries an earlier timestamp") {
    import graft.model.Addresses
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[TraceRow]
      // 10 s watermark delay leaves room for NON-LATE traces whose
      // event time is below the session's max-so-far
      val commits = TwsSessionizer.sessionCommit(mem.toDS(),
        gapSeconds = 5L, watermarkDelay = "10 seconds")
      val q = commits.writeStream.format("memory")
        .queryName("tws_regress").outputMode("append").start()
      try {
        def tr(hash: String, to: String, root: Boolean, ta: Seq[Int], ts: Long) =
          TraceRow(1L, hash, Some(0), Some("0xa"), Some(to), None, Some("0x1234567890"),
            None, Some(10L), root, Some(1L), Some(ts), Some("0xb"), None)
        val rec = Addresses.EcRecover
        // batch 1: root at t=2000 -> session closes at 2005, wm 1990
        mem.addData(tr("0xm1", "0xb", root = true, Seq.empty, 2000L))
        q.processAllAvailable()
        // batch 2: non-late trace BELOW the max seen (1993 > wm 1990).
        // With a batch-local max the timer would regress to 1998 and
        // the session would commit early, splitting into two commits.
        mem.addData(tr("0xm1", rec, root = false, Seq(0), 1993L))
        q.processAllAvailable()
        // batch 3: wm -> 2002, between the regressed (1998) and the
        // correct (2005) close time — nothing may fire here
        mem.addData(tr("0xtick1", "0xb", root = true, Seq.empty, 2012L))
        q.processAllAvailable()
        assert(spark.table("tws_regress")
          .filter("transaction.transaction_hash = '0xm1'").count() == 0,
          "session committed early: timer regressed to the batch-local max")
        // batch 4: in-gap trace at 2003 extends the same session to 2008
        mem.addData(tr("0xm1", rec, root = false, Seq(1), 2003L))
        q.processAllAvailable()
        // batch 5: wm -> 2020 past 2008, the single combined commit fires
        mem.addData(tr("0xtick2", "0xb", root = true, Seq.empty, 2030L))
        q.processAllAvailable()
        mem.addData()
        q.processAllAvailable()
        val out = spark.sql("SELECT transaction.* FROM tws_regress " +
          "WHERE transaction IS NOT NULL AND transaction.transaction_hash = '0xm1'").collect()
        assert(out.length == 1, s"expected ONE commit of 0xm1, got ${out.length}")
        assert(out.head.getAs[Long]("ec_recover_count") == 2L,
          "commit missing traces that arrived after the would-be-regressed timer")
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("sessionized KMV (r17): inline close inside one batch, timer " +
      "close at the watermark, sketch truncation above k — all equal " +
      "the batch kernels") {
    import graft.streaming.{KmvSessEvent, TwsKmvSession}
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val k = 4
      def e(u: Long, id: Long, item: String, ts: Long) =
        KmvSessEvent(u, id, item, ts,
          new java.sql.Timestamp(ts * 1000L))
      // user 1: TWO sessions entirely inside batch 1 (gap 100 between
      // ts 50 and ts 300) -> the second closes by timer later;
      // user 2: one 8-distinct-item session (> k=4, truncation)
      val batch1 = Seq(
        e(1L, 1, "a", 10), e(1L, 2, "b", 20), e(1L, 3, "a", 50),
        e(1L, 4, "c", 300), e(1L, 5, "d", 310)) ++
        (0 until 8).map(i => e(2L, 10 + i, s"i$i", 100 + i))
      val mem = MemoryStream[KmvSessEvent]
      val q = TwsKmvSession.sessionSketch(mem.toDS(), gapSeconds = 100L,
          k = k).toDF()
        .writeStream.format("memory").queryName("kmv_sess_out")
        .outputMode("append").start()
      try {
        mem.addData(batch1.toIndexedSeq: _*)
        q.processAllAvailable()
        // inline close: user 1's first session (ts 10-50) is out
        // immediately; user 2's closes by TIMER as soon as user 1's
        // ts-310 events advance the watermark past its 207 deadline;
        // user 1's second session (timer at 410) is still open
        val afterB1 = spark.sql("SELECT * FROM kmv_sess_out").collect()
        assert(afterB1.map(r => (r.getLong(0), r.getLong(1))).toSet ==
          Set((1L, 10L), (2L, 100L)),
          s"early closes emitted ${afterB1.mkString(",")}")
        // sentinels push the watermark past every open timer
        mem.addData(e(-1L, -1, "s", 100000))
        q.processAllAvailable()
        mem.addData(e(-1L, -2, "s", 200000))
        q.processAllAvailable()
        mem.addData()
        q.processAllAvailable()
        val out = spark.sql(
          "SELECT * FROM kmv_sess_out WHERE user_id >= 0").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .toSet
        // expected sessions by hand, sketched with the SAME scala-side
        // hash kernel the batch mixed63 path delegates to
        val expectSessions = Set(
          (1L, 10L, Seq("a", "b")), (1L, 300L, Seq("c", "d")),
          (2L, 100L, (0 until 8).map(i => s"i$i")))
        val expected = expectSessions.map { case (u, start, items) =>
          val hs = items.map(i => graft.functions.TextHash.mix64(
            graft.functions.TextHash.fnv1a64(i)) & Long.MaxValue)
            .distinct.sorted.take(k)
          (u, start, hs.max, hs.length.toLong)
        }
        assert(out == expected, s"got $out\nwant $expected")
        // truncation really happened for user 2 (8 distinct > k)
        assert(out.exists(r => r._1 == 2L && r._4 == k.toLong))
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("sessionized KMV (r18): a cross-batch LATE event cannot " +
      "regress lastSec and falsely split the session (r17 ADVICE)") {
    import graft.streaming.{KmvSessEvent, TwsKmvSession}
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def e(u: Long, id: Long, item: String, ts: Long) =
        KmvSessEvent(u, id, item, ts, new java.sql.Timestamp(ts * 1000L))
      val mem = MemoryStream[KmvSessEvent]
      // wide watermark delay so the planted late event is admitted —
      // exactly the situation the guard covers
      val q = TwsKmvSession.sessionSketch(mem.toDS(), gapSeconds = 100L,
          k = 4, watermarkDelay = "1000 seconds").toDF()
        .writeStream.format("memory").queryName("kmv_sess_late")
        .outputMode("append").start()
      try {
        // the ADVICE scenario: frontier at 150, late 140 arrives, then
        // 245 — an unguarded fold regresses lastSec to 140 and splits
        // at 245 (245-140 > gap) where the sorted batch twin keeps one
        // session (245-150 <= gap)
        mem.addData(e(1L, 1, "a", 100), e(1L, 2, "b", 150))
        q.processAllAvailable()
        mem.addData(e(1L, 3, "c", 140))
        q.processAllAvailable()
        mem.addData(e(1L, 4, "d", 245))
        q.processAllAvailable()
        // sentinels close every open session
        mem.addData(e(-1L, -1, "s", 100000))
        q.processAllAvailable()
        mem.addData(e(-1L, -2, "s", 200000))
        q.processAllAvailable()
        mem.addData()
        q.processAllAvailable()
        val out = spark.sql(
          "SELECT * FROM kmv_sess_late WHERE user_id >= 0").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        assert(out.length == 1,
          s"late event falsely split the session: ${out.mkString(",")}")
        val hs = Seq("a", "b", "c", "d").map(i =>
          graft.functions.TextHash.mix64(
            graft.functions.TextHash.fnv1a64(i)) & Long.MaxValue)
          .distinct.sorted.take(4)
        assert(out.head == ((1L, 100L, hs.max, hs.length.toLong)),
          s"got ${out.head}; the late event's item must fold into the " +
            "one open session with its start unchanged")
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
