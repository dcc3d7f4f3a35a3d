package graft

import org.apache.spark.sql.SparkSession

/** State-store provider/partition sweep for the streaming flagship
  * (q_etl_stream_transactions), driving the EXACT catalog entry body
  * via Queries.etlStreamTransactionsWith so the measured config is the
  * shipped config.
  *
  *   sbt "runMain graft.StreamStoreSweep [sfDir]"
  *
  * Measures wall seconds for each (provider, changelog, partitions)
  * combination, warm (bronze staged once before the sweep, like the
  * bench), and prints one JSON line per cell plus a result-count
  * cross-check so a config that silently drops rows is caught here,
  * not in CORRECTNESS. Results are recorded in SCALE_STREAM_r09.md.
  */
object StreamStoreSweep {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // warm the shared bronze staging out of measured time (bench does
      // the same via stageAll)
      graft.sources.SyntheticTraces.bronze(spark, sfDir)
      var expected = -1L
      // first cell pays JVM/codegen warmup — order can be flipped via
      // args(1)=rev to bracket the warmup bias between two runs
      // (store, changelog, partitions, trackTotalNumberOfRows) — the
      // track=false cells measure skipping the get-before-put RocksDB
      // does per state write purely to maintain the numRowsTotal
      // metric (the documented write-heavy-workload knob)
      val fwd = Seq(
        ("hdfs", false, 8, true), ("hdfs", false, 16, true),
        ("rocksdb", false, 8, true),
        ("rocksdb", true, 8, true), ("rocksdb", true, 8, false),
        ("rocksdb", true, 16, true), ("rocksdb", true, 32, true))
      val cells = if (args.length > 1 && args(1) == "rev") fwd.reverse else fwd
      for ((store, changelog, parts, track) <- cells) {
        val t0 = System.nanoTime()
        val n = Queries.etlStreamTransactionsWith(spark, sfDir,
          partitions = parts, nSlices = 8,
          rocksdb = store == "rocksdb", changelog = changelog,
          trackRows = track).count()
        val sec = (System.nanoTime() - t0) / 1e9
        if (expected < 0) expected = n
        val ok = n == expected
        println(f"""{"store":"$store","changelog":$changelog,"partitions":$parts,"track_rows":$track,"sec":$sec%.2f,"rows":$n,"rows_match":$ok}""")
        require(ok, s"row count diverged: $n != $expected under $store/$parts")
      }
    } finally spark.stop()
  }
}
