package graft

import graft.llm.StreamingCuration
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Incremental corpus ingest: cross-batch exact dedup + quality/lang
  * gates over a MemoryStream, including the bounded-state
  * within-watermark variant's pass-late-dupes-through contract.
  */
class StreamingCurationSpec extends SparkSpec {

  private val goodText =
    ("the quick brown fox is a friendly animal and " * 5).trim // 45 tokens, en markers

  test("cross-batch exact dedup + gates: duplicates across batches dropped once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val out = StreamingCuration.curateStream(
      mem.toDS().toDF("doc_id", "text"), "doc_id", "text")
    val q = out.writeStream.format("memory")
      .queryName("cur_out").outputMode("append").start()
    try {
      mem.addData((1L, goodText), (2L, "too short"), (3L, goodText + " extra"))
      q.processAllAvailable()
      // batch 2: exact dup of doc 1 (cross-batch), a fresh good doc,
      // and a no-English-marker doc of valid length
      mem.addData((4L, goodText), (5L, goodText + " more tokens here"),
        (6L, ("lorem ipsum dolor sit amet " * 8).trim))
      q.processAllAvailable()
      val kept = spark.table("cur_out").select("doc_id")
        .collect().map(_.getLong(0)).sorted
      // 1 kept; 2 gated (short); 3 kept; 4 dropped as cross-batch dup;
      // 5 kept; 6 gated (no markers)
      assert(kept.toSeq == Seq(1L, 3L, 5L), s"kept ${kept.toSeq}")
    } finally q.stop()
  }

  test("within-watermark dedup: state expires, late duplicate passes to the sink") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val out = StreamingCuration.curateStreamWithinWatermark(
      mem.toDS().toDF("doc_id", "text", "event_time"),
      "doc_id", "text", "event_time", "5 seconds")
    val q = out.writeStream.format("memory")
      .queryName("cur_wm_out").outputMode("append").start()
    try {
      mem.addData((1L, goodText, ts(10)))
      q.processAllAvailable()
      // in-window duplicate: dropped
      mem.addData((2L, goodText, ts(12)))
      q.processAllAvailable()
      // advance the watermark far past the dedup window
      mem.addData((3L, goodText + " fresh", ts(1000)))
      q.processAllAvailable()
      // duplicate arriving AFTER state expiry: passes through (sink's
      // conflict policy owns it now) — bounded state by design
      mem.addData((4L, goodText, ts(1001)))
      q.processAllAvailable()
      val kept = spark.table("cur_wm_out").select("doc_id")
        .collect().map(_.getLong(0)).sorted
      assert(kept.toSeq == Seq(1L, 3L, 4L), s"kept ${kept.toSeq}")
    } finally q.stop()
  }
}
