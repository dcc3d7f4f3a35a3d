package graft

/** Disposable diagnostics main for iterating on one operator — not
  * part of the driver contract; contents change round to round.
  * Currently: tier decomposition of q_profile_table (r17 VERDICT #1).
  */
object ScratchMain {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.DataFrame

    // --- partitioning-preservation probe ---------------------------
    val df = spark.range(10000).selectExpr("id % 3 as k", "id as v")
    val ck = df.repartition(4, col("k")).localCheckpoint()
    def nex(d: DataFrame) =
      d.queryExecution.executedPlan.toString.split("\n")
        .count(_.contains("Exchange"))
    println(s"PROBE groupBy(k):   ${nex(ck.groupBy("k").count())} exchanges")
    println(s"PROBE groupBy(k,v): ${nex(ck.groupBy("k", "v").count())} exchanges")
    println(s"PROBE window(k):    ${nex(ck.withColumn("rn",
      org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy("v"))))} exchanges")
    println(s"PROBE after alias:  ${nex(ck.select(col("k").as("s"), col("v"))
      .groupBy("s").count())} exchanges")

    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def noop(d: DataFrame): Unit =
      d.write.format("noop").mode("overwrite").save()
    def timed(tag: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      noop(f)
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def smallShuffle(n: Int)(mk: => DataFrame): DataFrame = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", n.toString)
      try mk.localCheckpoint()
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    val S = graft.llm.SketchOps
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val ev = raw.repartition(32, col("user_id")).localCheckpoint()
    val qv = floor(col("value") * 1000).cast("long")
    val cols = Seq(
      ("user_id", col("user_id"), Some(col("user_id"))),
      ("event_type", col("event_type"), None),
      ("value", qv, Some(qv)))
    val prof = S.profileTable(ev, col("event_id"), cols)
    val planStr = prof.queryExecution.executedPlan.toString
    println(s"PROFILE exchanges: ${planStr.split("\n").count(_.contains("Exchange"))}")
    println(planStr.split("\n").filter(l => l.contains("Exchange") || l.contains("Window") || l.contains("HashAggregate") || l.contains("InMemory") || l.contains("ExistingRDD")).take(60).mkString("\n"))
    for (run <- 1 to 2) {
      println(s"--- run $run ---")
      timed("A as-is (32p in)  ")(S.profileTable(ev, col("event_id"), cols))
      timed("B smallShuffle(8) ")(smallShuffle(8)(S.profileTable(ev, col("event_id"), cols)))
    }
    spark.stop()
  }
}
