package graft

import graft.model.TraceRow
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Floor decomposition for the streaming flagship
  * (q_etl_stream_transactions): separates the per-micro-batch FIXED
  * machinery cost (trigger planning + flatMapGroupsWithState pass +
  * RocksDB commit + changelog upload per state partition + parquet
  * sink commit) from the data-proportional cost, by driving the SAME
  * operator + state-store config with one-row micro-batches.
  *
  *   sbt "runMain graft.StreamFloor [sfDir] [out]"
  *
  * Probes (all within one session; compare run 2+ per memory of
  * same-box noise):
  *   floor(nBatches)    — nBatches one-row files through sessionCommit
  *                        at the entry's exact store config. Wall and
  *                        per-batch triggerExecution = the machinery
  *                        floor for that batch count.
  *   flagship(nSlices)  — the real catalog body via
  *                        Queries.etlStreamTransactionsWith, per-batch
  *                        progress captured through the onQuery hook.
  *
  * floor(k) vs flagship(k): the difference is the data cost; the floor
  * × slice count is the irreducible machinery bill the reference never
  * pays per-slice because it buffers until queue-empty and flushes
  * once (main.rs:105-121). The table this prints is recorded in
  * SCALE_STREAM_r12.md.
  */
object StreamFloor {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // warm the JVM + bronze staging once (cold-start absorbed here)
      runFlagship(spark, sfDir, nSlices = 8, label = "warmup")
      Seq(10, 4, 3).foreach(n => runFloor(spark, n))
      Seq(8, 8, 4, 3, 2).foreach(n =>
        runFlagship(spark, sfDir, n, label = s"flagship n=$n"))
      Seq(3, 10).foreach(n => runFloor(spark, n))
    } finally spark.stop()
  }

  private def row(i: Int, ts: Long): TraceRow =
    TraceRow(1L, f"0xfloor$i%04d", Some(0), Some("0xa"), Some("0xb"), None,
      Some("0x00"), None, Some(1L), is_root = true, Some(1L), Some(ts),
      Some("0xb"), None)

  /** One-row-per-batch floor at the entry's exact store config:
    * RocksDB + changelog, trackTotalNumberOfRows=false, 8 state
    * partitions (the sf0.1 gate outcome), maxFilesPerTrigger=1.
    * The last two rows are far-future sentinels mirroring the entry's
    * close-out; they are real batches in the entry too, so they count
    * toward the floor.
    */
  private def runFloor(spark: SparkSession, nBatches: Int): Unit = {
    import spark.implicits._
    val work = graft.sources.Staging.sessionTempDir(s"graft_floor_$nBatches")
    val watch = s"$work/in"
    new java.io.File(watch).mkdirs()
    (0 until nBatches).foreach { i =>
      val ts = if (i >= nBatches - 2) 1000000L * (i - nBatches + 3) + 3600L
        else 60L * i
      Seq(row(i, ts)).toDS().coalesce(1).write.parquet(s"$work/one_$i")
      val part = new java.io.File(s"$work/one_$i").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(watch, f"slice_$i%04d_0.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1700000000000L + i * 60000L)
    }
    val conf = spark.conf
    val prevShuffle = conf.get("spark.sql.shuffle.partitions")
    conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    conf.set("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    conf.set("spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows", "false")
    conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val stream = spark.readStream
        .schema(spark.read.parquet(watch).schema)
        .option("maxFilesPerTrigger", 1).parquet(watch)
        .as[TraceRow]
      val t0 = System.nanoTime()
      val q = graft.streaming.StreamingEtl.sessionCommit(stream, gapSeconds = 1L)
        .toDF()
        .writeStream.format("parquet")
        .option("path", s"$work/out").option("checkpointLocation", s"$work/ck")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      report(s"floor n=$nBatches", wall, q)
    } finally {
      conf.set("spark.sql.shuffle.partitions", prevShuffle)
      conf.unset("spark.sql.streaming.stateStore.providerClass")
      conf.unset("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled")
      conf.unset("spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows")
    }
  }

  private def runFlagship(spark: SparkSession, dir: String, nSlices: Int,
      label: String): Unit = {
    var captured: Option[org.apache.spark.sql.streaming.StreamingQuery] = None
    val t0 = System.nanoTime()
    val out = Queries.etlStreamTransactionsWith(spark, dir, partitions = 0,
      nSlices = nSlices, rocksdb = true, changelog = true, trackRows = false,
      onQuery = q => captured = Some(q))
    val rows = out.count()
    val wall = (System.nanoTime() - t0) / 1e9
    captured match {
      case Some(q) => report(s"$label rows=$rows", wall, q)
      case None => println(f"$label%-18s wall=$wall%6.2f s rows=$rows (no query)")
    }
  }

  private def report(label: String, wall: Double,
      q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    val ps = q.recentProgress.toIndexedSeq
    val durs = ps.map(p =>
      Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L))
    val rows = ps.map(_.numInputRows)
    println(f"### $label%-22s wall=$wall%6.2f s batches=${ps.size}%2d " +
      f"sumTrigger=${durs.sum / 1000.0}%6.2f s")
    ps.indices.foreach { i =>
      println(f"  batch ${ps(i).batchId}%2d rows=${rows(i)}%7d trigger=${durs(i)}%6d ms")
    }
  }
}
