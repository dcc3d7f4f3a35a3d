package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Sizing probe for the sign-LSH near-dup knob: runs
  * [[graft.llm.SimilarityOps.cosineNearDupPairs]] (and the composed
  * [[graft.llm.SimilarityOps.semanticDedup]]) at one or more `planes`
  * settings over a scaled corpus, printing wall / shuffle / spill /
  * pair-count per setting — the measurement behind the "planes must
  * grow with the corpus" sizing rule (candidate volume is
  * Σ_buckets occupancy²; buckets per table = 2^planes).
  *
  *   sbt "runMain graft.LshPlanesProbe [sfDir] [planes...]"
  */
object LshPlanesProbe {

  private class Acc extends SparkListener {
    var shuffleWrite = 0L
    var memSpill = 0L
    var diskSpill = 0L
    var peakMem = 0L
    def reset(): Unit = { shuffleWrite = 0; memSpill = 0; diskSpill = 0; peakMem = 0 }
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
      synchronized {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          shuffleWrite += m.shuffleWriteMetrics.bytesWritten
          memSpill += m.memoryBytesSpilled
          diskSpill += m.diskBytesSpilled
          peakMem = math.max(peakMem, m.peakExecutionMemory)
        }
      }
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/repo/tmp/sf3"
    val planes = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(6, 10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)
    try {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = emb.count()
      println(s"corpus=$n vectors ($dir)")
      planes.foreach { p =>
        acc.reset()
        val t0 = System.nanoTime()
        val pairs = graft.llm.SimilarityOps
          .cosineNearDupPairs(emb, "vec_id", "embedding", planes = p)
          .count()
        val secP = (System.nanoTime() - t0) / 1e9
        val m1 = (acc.shuffleWrite, acc.memSpill, acc.diskSpill, acc.peakMem)
        acc.reset()
        val t1 = System.nanoTime()
        val canon = graft.llm.SimilarityOps
          .semanticDedup(emb, "vec_id", "embedding", planes = p)
          .filter(org.apache.spark.sql.functions.col("is_canonical") === 1)
          .count()
        val secS = (System.nanoTime() - t1) / 1e9
        println(f"""PROBE {"planes":$p,"buckets_per_table":${1 << p},""" +
          f""""neardup_sec":$secP%.1f,"pairs":$pairs,""" +
          f""""shuffle_gb":${m1._1 / 1e9}%.2f,"mem_spill_gb":${m1._2 / 1e9}%.2f,""" +
          f""""disk_spill_gb":${m1._3 / 1e9}%.2f,"peak_task_mem_gb":${m1._4 / 1e9}%.2f,""" +
          f""""semdedup_sec":$secS%.1f,"canonical":$canon,""" +
          f""""semdedup_mem_spill_gb":${acc.memSpill / 1e9}%.2f}""")
      }
    } finally spark.stop()
  }
}
