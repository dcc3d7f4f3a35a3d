package graft
import graft.operators._
object StageBench {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val bronze = "/tmp/graft_bronze_sf01"
    // completeness = the committer's _SUCCESS marker, probed through
    // the Hadoop FS resolver (Staging) — a java.io.File dir probe
    // would accept a torn write and is wrong on non-local paths
    if (!graft.sources.Staging.hasMarker(bronze))
      graft.sources.SyntheticTraces.fromTpch(spark, "/root/testdata/sf0.1")
        .write.mode("overwrite").parquet(bronze)
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"STAGE $tag: ${(System.nanoTime()-t0)/1e9}%.2f")
    }
    def read() = spark.read.parquet(bronze)
    for (_ <- 1 to 2) {
      time("scan        ") { read().write.format("noop").mode("overwrite").save() }
      time("normalize   ") { TraceEtl.normalize(read()).toDF().write.format("noop").mode("overwrite").save() }
      time("norm+prune  ") { TraceEtl.pruneNonZk(TraceEtl.normalize(read())).toDF().write.format("noop").mode("overwrite").save() }
      time("full commit ") { TraceEtl.commitTraces(TraceEtl.normalize(read())).toDF().write.format("noop").mode("overwrite").save() }
      time("commit noprefilter") { TraceEtl.commitTraces(TraceEtl.normalize(read()), prefilter=false).toDF().write.format("noop").mode("overwrite").save() }
    }
    spark.stop()
  }
}
