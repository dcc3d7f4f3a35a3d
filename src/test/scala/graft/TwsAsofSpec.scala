package graft

import graft.operators.AsofJoin
import graft.streaming.{AsofInput, TwsAsof}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming keyed as-of == batch AsofJoin.keyed, including the
  * out-of-order case the buffering exists for: a state arriving in a
  * LATER micro-batch (but not late vs the watermark) must still win
  * probes that arrived before it.
  */
class TwsAsofSpec extends SparkSpec {

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  private def withRocks(body: => Unit): Unit = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("out-of-order state arriving in a later batch wins earlier probes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocks {
      val mem = MemoryStream[AsofInput]
      val q = TwsAsof.asofKeyed(mem.toDS(), "60 seconds").writeStream
        .format("memory").queryName("tws_asof_ooo").outputMode("append").start()
      try {
        // batch 1: probe at t=15 (key 1), state at t=5
        mem.addData(
          AsofInput(1L, 1, 100L, 15L, ts(15)),
          AsofInput(1L, 0, 900L, 5L, ts(5)))
        q.processAllAvailable()
        // batch 2: a NEWER state at t=12 arrives out of order (the
        // watermark is still far behind, so it is not late) — it must
        // be the probe's match, proving the probe waited
        mem.addData(AsofInput(1L, 0, 901L, 12L, ts(12)))
        q.processAllAvailable()
        // advance the watermark well past the probe
        mem.addData(AsofInput(2L, 0, 999L, 500L, ts(500)))
        q.processAllAvailable()
        mem.addData() // let timers fire
        q.processAllAvailable()
        val rows = spark.table("tws_asof_ooo")
          .select("probe_id", "state_id").collect()
          .map(r => r.getLong(0) -> Option(r.getAs[Any]("state_id"))).toMap
        assert(rows(100L).contains(901L),
          s"probe must match the out-of-order state, got ${rows(100L)}")
      } finally q.stop()
    }
  }

  test("buffered probes, states, and timers survive a checkpoint restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocks {
      val ckpt = java.nio.file.Files.createTempDirectory("graft_asof_ckpt").toString
      val got = new java.util.concurrent.ConcurrentLinkedQueue[graft.streaming.AsofOut]()
      val mem = MemoryStream[AsofInput]
      def startQuery() =
        TwsAsof.asofKeyed(mem.toDS(), "60 seconds").writeStream
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .foreachBatch { (b: org.apache.spark.sql.Dataset[graft.streaming.AsofOut], _: Long) =>
            b.collect().foreach(got.add)
          }.start()
      // run 1: probe at t=1015 and a state at t=1005 buffer; the
      // watermark stays behind, nothing resolves, query stops
      val q1 = startQuery()
      mem.addData(
        AsofInput(1L, 1, 100L, 1015L, ts(1015)),
        AsofInput(1L, 0, 900L, 1005L, ts(1005)))
      q1.processAllAvailable()
      q1.stop()
      assert(got.isEmpty, "probe resolved before the watermark passed")
      // run 2: restart on the same checkpoint; a newer out-of-order
      // state arrives, then the watermark advances — the pre-restart
      // probe must resolve against the POST-restart state, proving
      // pending probes, the state list, and the timer were restored
      val q2 = startQuery()
      mem.addData(AsofInput(1L, 0, 901L, 1012L, ts(1012)))
      q2.processAllAvailable()
      mem.addData(AsofInput(2L, 0, 999L, 5000L, ts(5000)))
      q2.processAllAvailable()
      mem.addData()
      q2.processAllAvailable()
      q2.stop()
      val matches = got.toArray(Array.empty[graft.streaming.AsofOut])
        .filter(_.probe_id == 100L)
      assert(matches.length == 1, s"expected 1 resolution, got ${matches.length}")
      assert(matches.head.state_id.contains(901L),
        s"restored probe must match the post-restart state, got ${matches.head}")
    }
  }

  test("state stays bounded while a far-future probe pins the timer") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocks {
      val ckpt = java.nio.file.Files.createTempDirectory("graft_asof_pin").toString
      val got = new java.util.concurrent.ConcurrentLinkedQueue[graft.streaming.AsofOut]()
      val mem = MemoryStream[AsofInput]
      def startQuery() =
        TwsAsof.asofKeyed(mem.toDS(), "5000 seconds").writeStream
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .foreachBatch { (b: org.apache.spark.sql.Dataset[graft.streaming.AsofOut], _: Long) =>
            b.collect().foreach(got.add)
          }.start()
      val q1 = startQuery()
      // one probe ahead of every state: pins the per-key timer at
      // t=60000 for the whole run
      mem.addData(AsofInput(1L, 1, 100L, 60000L, ts(60000L)))
      q1.processAllAvailable()
      // 60 state-only batches marching the watermark up to (but never
      // past) the probe: states the watermark has passed must collapse
      // to the single dominating one instead of accumulating behind
      // the pinned timer
      (1 to 60).foreach { i =>
        mem.addData(AsofInput(1L, 0, 9000L + i, 56000L + 150L * i,
          ts(56000L + 150L * i)))
        q1.processAllAvailable()
      }
      q1.stop()
      assert(got.isEmpty, "probe resolved before the watermark passed it")
      val stateRows = spark.read.format("statestore")
        .option("path", ckpt).option("stateVarName", "states").load()
      val n = stateRows.count()
      // kept: 1 dominated-latest below the watermark (t=59900) plus the
      // ~34 states inside the 5000s watermark window; unpruned would
      // be all 60
      assert(n <= 45, s"state not pruned under a pinned timer: $n rows buffered")
      // restart and advance the watermark past the probe: it must
      // resolve against t=59900 — the exact state the prune is
      // required to keep (latest at-or-before an unresolved probe)
      val q2 = startQuery()
      mem.addData(AsofInput(2L, 0, 999L, 70000L, ts(70000L)))
      q2.processAllAvailable()
      mem.addData()
      q2.processAllAvailable()
      q2.stop()
      val matches = got.toArray(Array.empty[graft.streaming.AsofOut])
        .filter(_.probe_id == 100L)
      assert(matches.length == 1, s"expected 1 resolution, got ${matches.length}")
      assert(matches.head.state_id.contains(9026L),
        s"pruning discarded the probe's dominating state: ${matches.head}")
    }
  }

  test("streaming asof == batch AsofJoin.keyed on a random keyed corpus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocks {
      val rnd = new scala.util.Random(11)
      // ts base offset: an event time of epoch 0 EQUALS the initial
      // watermark and is dropped as late on arrival — degenerate for
      // real event-time data, so the corpus lives at 1000..1499s
      val probes = (1L to 200L).map(i =>
        (i, rnd.nextInt(8).toLong + 1, rnd.nextInt(500).toLong + 1000L))
      // unique (key, ts) on the state side (the operator's contract)
      val states = (1L to 120L).map(i =>
        (i + 5000L, rnd.nextInt(8).toLong + 1, rnd.nextInt(500).toLong + 1000L))
        .groupBy(t => (t._2, t._3)).values.map(_.maxBy(_._1)).toSeq

      val batch = AsofJoin.keyed(
          probes.toDF("probe_id", "k", "sec"),
          states.map { case (id, k, s) => (k, s, id) }.toDF("k", "sec", "state_id"),
          Seq("k"), "sec", Seq("state_id"))
        .select(col("probe_id"), col("k"), col("sec"),
          col("asof_state_id"))
        .collect().map(_.toString).sorted

      val all = (probes.map { case (id, k, s) => AsofInput(k, 1, id, s, ts(s)) } ++
          states.map { case (id, k, s) => AsofInput(k, 0, id, s, ts(s)) })
        .sortBy(_.ts)
      val chunks = all.grouped(math.max(all.size / 4, 1)).toSeq
      val mem = MemoryStream[AsofInput]
      val q = TwsAsof.asofKeyed(mem.toDS(), "600 seconds").writeStream
        .format("memory").queryName("tws_asof_par").outputMode("append").start()
      try {
        chunks.foreach { c => mem.addData(c: _*); q.processAllAvailable() }
        mem.addData(AsofInput(99L, 0, 0L, 100000L, ts(100000L)))
        q.processAllAvailable()
        mem.addData()
        q.processAllAvailable()
        val stream = spark.table("tws_asof_par")
          .filter(col("key") =!= 99L)
          .select(col("probe_id"), col("key").as("k"), col("probe_ts").as("sec"),
            col("state_id").as("asof_state_id"))
          .collect().map(_.toString).sorted
        if (stream.length != batch.length) {
          val sIds = spark.table("tws_asof_par").filter(col("key") =!= 99L)
            .select("probe_id").collect().map(_.getLong(0)).toSet
          val missing = probes.filterNot(p => sIds.contains(p._1))
          fail(s"missing probes (id,key,ts): ${missing.mkString(", ")}")
        }
        assert(stream.sameElements(batch), "streaming != batch asof")
      } finally q.stop()
    }
  }
}
