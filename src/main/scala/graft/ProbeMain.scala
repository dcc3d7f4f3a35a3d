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
