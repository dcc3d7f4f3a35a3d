package graft

/** Disposable diagnostics main for iterating on one operator — not
  * part of the driver contract; contents change round to round.
  * Currently: salted vs hist-threshold sample tier timing.
  */
object ScratchMain {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.DataFrame
    val S = graft.llm.SketchOps
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
      .repartition(32, col("user_id")).localCheckpoint()
    val qv = floor(col("value") * 1000).cast("long")
    val cols = Seq(
      ("user_id", col("user_id"), Some(col("user_id"))),
      ("event_type", col("event_type"), None),
      ("value", qv, Some(qv)))
    def timed(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(d: DataFrame): Unit =
      d.write.format("noop").mode("overwrite").save()
    for (run <- 1 to 3) {
      println(s"--- run $run ---")
      val (tall, hist) = S.profileFrames(raw, col("event_id"), cols)
      timed("salted sample (noop)     ")(noop(S.profileSample(tall, 128)))
      timed("pruned sample (incl ckpt)")(noop(S.profileSampleFromHist(tall, hist, 128)))
      timed("assembly w/ salted       ")(noop(S.profileFromState(hist, S.profileSample(tall, 128), 128, 4, 1024, 3)))
      timed("assembly w/ pruned       ")(noop(S.profileFromState(hist, S.profileSampleFromHist(tall, hist, 128), 128, 4, 1024, 3)))
    }
    spark.stop()
  }
}
