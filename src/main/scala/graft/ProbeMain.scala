package graft

/** Ad-hoc query profiler: runMain graft.ProbeMain <query>[,<query>…] [sfDir] [n]
  * — comma-separate names to amortize the JVM/session start across probes.
  */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 3
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_PROBE_JOBS=1: per-job wall/task accounting — where a
    // multi-action operator (pagerank, as-of partitioned) spends time
    if (sys.env.contains("SPARK_GRAFT_PROBE_JOBS"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          private val t0 = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
          private val desc = new java.util.concurrent.ConcurrentHashMap[Int, String]()
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            t0.put(j.jobId, System.nanoTime())
            desc.put(j.jobId, String.valueOf(
              j.properties.getProperty("spark.job.description",
                j.properties.getProperty("callSite.short", ""))))
          }
          override def onJobEnd(
              j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val dt = (System.nanoTime() - t0.getOrDefault(j.jobId, 0L)) / 1e9
            val d = desc.getOrDefault(j.jobId, "").take(90)
            println(f"  [job ${j.jobId}%3d] ${dt}%6.3f s  $d")
          }
        })
    graft.functions.GraftFunctions.register(spark)
    // Mirror Bench's sf0.001 whole-catalog warmup (Bench.scala): a
    // fresh probe JVM otherwise carries 2-3× of Janino/JIT cost into
    // run 3-4 even, so cross-session paired probes measured JIT state
    // instead of plans (r18 VERDICT #6 — q_ann_ivfpq_serve read 1.1×
    // in-suite but 2.3-2.5× in a cold probe session). Warm entries
    // run against the SMALLEST corpus and their caches are dropped
    // after, so the measured runs still pay their own staging exactly
    // like Bench's. SPARK_GRAFT_PROBE_NOWARM=1 skips it for quick
    // iteration (numbers then NOT comparable across sessions).
    val warmDir = "/root/testdata/sf0.001"
    if (!sys.env.contains("SPARK_GRAFT_PROBE_NOWARM") &&
        new java.io.File(warmDir).isDirectory && warmDir != dir) {
      val t0w = System.nanoTime()
      SparkEntry.queries.values.foreach { fn =>
        try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }
      Queries.clearCaches()
      println(f"[probe] sf0.001 catalog warmup: ${(System.nanoTime() - t0w) / 1e9}%.1f s (unmeasured)")
    }
    // mirror Bench attribution: corpora + shared persists staged
    // outside measured time
    Queries.stageAll(spark, dir)
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      for (i <- 1 to n) {
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        df.write.format("noop").mode("overwrite").save()
        println(f"PROBE $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        // SPARK_GRAFT_PROBE_PLAN=1: executed (adaptive-final) plan after
        // run 1. The noop write above ran under its OWN QueryExecution,
        // so df's plan is still unexecuted (isFinalPlan=false) — execute
        // df's own plan first (unmeasured) so AQE finalizes it.
        if (i == 1 && sys.env.contains("SPARK_GRAFT_PROBE_PLAN")) {
          df.queryExecution.toRdd.foreach(_ => ())
          println(s"PLAN $name:\n${df.queryExecution.executedPlan}")
        }
      }
    }
    spark.stop()
  }
}
