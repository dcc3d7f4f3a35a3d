package graft

import org.apache.spark.sql.SparkSession

/** Knob sweep for the RocksDB-state streaming entries (r20): drives
  * the EXACT catalog bodies via their `...With` forms so the measured
  * config is the shipped config (the StreamStoreSweep pattern).
  *
  *   sbt "runMain graft.StreamKnobSweep [sfDir] [entries...]"
  *
  * Per entry, measures wall seconds for each knob cell (2 runs, both
  * printed) and cross-checks the result row count against the first
  * cell so a config that silently drops rows is caught here, not in
  * CORRECTNESS. Cells:
  *   - interval joins: (partitions 8|4) x (stateFormatVersion 2|3)
  *   - asof / neardup / session sketches: partitions 8|4, changelog
  */
object StreamKnobSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val only = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    Queries.stageAll(spark, sfDir)

    def sweep(entry: String,
        cells: Seq[(String, () => org.apache.spark.sql.DataFrame)]): Unit = {
      if (only.nonEmpty && !only.contains(entry)) return
      var expected = -1L
      for ((label, mk) <- cells; run <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = mk().count()
        val sec = (System.nanoTime() - t0) / 1e9
        if (expected < 0) expected = n
        val ok = n == expected
        println(f"""{"entry":"$entry","cell":"$label","run":$run,"sec":$sec%.2f,"rows":$n,"rows_match":$ok}""")
        require(ok, s"row count diverged for $entry/$label: $n != $expected")
      }
    }

    sweep("ssj", Seq(
      "p8_v2" -> (() => Queries.streamIntervalJoinImpl(spark, sfDir, outer = false, partitions = 8, changelog = false, joinFormatVersion = 2)),
      "p8_v3" -> (() => Queries.streamIntervalJoinImpl(spark, sfDir, outer = false, partitions = 8, changelog = false, joinFormatVersion = 3)),
      "p4_v2" -> (() => Queries.streamIntervalJoinImpl(spark, sfDir, outer = false, partitions = 4, changelog = false, joinFormatVersion = 2)),
      "p4_v3" -> (() => Queries.streamIntervalJoinImpl(spark, sfDir, outer = false, partitions = 4, changelog = false, joinFormatVersion = 3)),
      "p4_v3_cl" -> (() => Queries.streamIntervalJoinImpl(spark, sfDir, outer = false, partitions = 4, changelog = true, joinFormatVersion = 3))))
    sweep("ssj_outer", Seq(
      "p8_v2" -> (() => Queries.streamIntervalJoinImpl(spark, sfDir, outer = true, partitions = 8, changelog = false, joinFormatVersion = 2)),
      "p8_v3" -> (() => Queries.streamIntervalJoinImpl(spark, sfDir, outer = true, partitions = 8, changelog = false, joinFormatVersion = 3)),
      "p4_v3" -> (() => Queries.streamIntervalJoinImpl(spark, sfDir, outer = true, partitions = 4, changelog = false, joinFormatVersion = 3))))
    sweep("asof", Seq(
      "p8" -> (() => Queries.asofStreamWith(spark, sfDir, partitions = 8, changelog = false)),
      "p4" -> (() => Queries.asofStreamWith(spark, sfDir, partitions = 4, changelog = false)),
      "p4_cl" -> (() => Queries.asofStreamWith(spark, sfDir, partitions = 4, changelog = true))))
    sweep("asof_mfpt", Seq(
      "p4_f1" -> (() => Queries.asofStreamWith(spark, sfDir, partitions = 4, filesPerTrigger = 1)),
      "p4_f2" -> (() => Queries.asofStreamWith(spark, sfDir, partitions = 4, filesPerTrigger = 2))))
    sweep("kmv_sess_mfpt", Seq(
      "p4_f1" -> (() => Queries.sketchKmvSessionStreamWith(spark, sfDir, partitions = 4, filesPerTrigger = 1)),
      "p4_f2" -> (() => Queries.sketchKmvSessionStreamWith(spark, sfDir, partitions = 4, filesPerTrigger = 2))))
    sweep("cms_sess_mfpt", Seq(
      "p4_f1" -> (() => Queries.sketchCmsSessionStreamWith(spark, sfDir, partitions = 4, filesPerTrigger = 1)),
      "p4_f2" -> (() => Queries.sketchCmsSessionStreamWith(spark, sfDir, partitions = 4, filesPerTrigger = 2))))
    sweep("neardup", Seq(
      "p8" -> (() => Queries.streamNearDupWith(spark, sfDir, partitions = 8, changelog = false)),
      "p4" -> (() => Queries.streamNearDupWith(spark, sfDir, partitions = 4, changelog = false)),
      "p4_cl" -> (() => Queries.streamNearDupWith(spark, sfDir, partitions = 4, changelog = true))))
    sweep("kmv_sess", Seq(
      "p8" -> (() => Queries.sketchKmvSessionStreamWith(spark, sfDir, partitions = 8, changelog = false)),
      "p4" -> (() => Queries.sketchKmvSessionStreamWith(spark, sfDir, partitions = 4, changelog = false)),
      "p4_cl" -> (() => Queries.sketchKmvSessionStreamWith(spark, sfDir, partitions = 4, changelog = true))))
    sweep("cms_sess", Seq(
      "p8" -> (() => Queries.sketchCmsSessionStreamWith(spark, sfDir, partitions = 8, changelog = false)),
      "p4" -> (() => Queries.sketchCmsSessionStreamWith(spark, sfDir, partitions = 4, changelog = false)),
      "p4_cl" -> (() => Queries.sketchCmsSessionStreamWith(spark, sfDir, partitions = 4, changelog = true))))
    sweep("nd_mfpt", Seq(
      "p4_f1" -> (() => Queries.streamNearDupWith(spark, sfDir, partitions = 4, filesPerTrigger = 1)),
      "p4_f2" -> (() => Queries.streamNearDupWith(spark, sfDir, partitions = 4, filesPerTrigger = 2))))
    sweep("etl_mfpt", Seq(
      "p8_f1" -> (() => Queries.etlStreamTransactionsWith(spark, sfDir,
        partitions = 8, nSlices = 3, rocksdb = true, changelog = true, trackRows = false, filesPerTrigger = 1)),
      "p8_f2" -> (() => Queries.etlStreamTransactionsWith(spark, sfDir,
        partitions = 8, nSlices = 3, rocksdb = true, changelog = true, trackRows = false, filesPerTrigger = 2))))
    sweep("etl", Seq(
      "p8_cl" -> (() => Queries.etlStreamTransactionsWith(spark, sfDir,
        partitions = 8, nSlices = 3, rocksdb = true, changelog = true, trackRows = false)),
      "p4_cl" -> (() => Queries.etlStreamTransactionsWith(spark, sfDir,
        partitions = 4, nSlices = 3, rocksdb = true, changelog = true, trackRows = false)),
      "p4_nocl" -> (() => Queries.etlStreamTransactionsWith(spark, sfDir,
        partitions = 4, nSlices = 3, rocksdb = true, changelog = false, trackRows = false))))
    spark.stop()
  }
}
