package graft

/** Disposable diagnostics main for iterating on one operator — not
  * part of the driver contract; contents change round to round.
  * Currently: the single-action floor measurement — what ONE Spark
  * job costs in the bench configuration regardless of data volume.
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
    val one = spark.range(1).toDF("id")
    val scan = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    for (i <- 1 to 5) {
      var t0 = System.nanoTime()
      one.write.format("noop").mode("overwrite").save()
      val f1 = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      scan.groupBy("event_type").agg(count(lit(1))).write
        .format("noop").mode("overwrite").save()
      val f2 = (System.nanoTime() - t0) / 1e9
      println(f"FLOOR run$i: 1-row-noop=$f1%.3f s  100k-scan-agg-noop=$f2%.3f s")
    }
    spark.stop()
  }
}
