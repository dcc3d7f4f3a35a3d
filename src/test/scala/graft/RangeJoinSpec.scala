package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  test("bucketed interval join == naive theta join; no duplicate pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val intervals = (1L to 150L).map(i =>
      (i, rnd.nextInt(1000).toLong, rnd.nextInt(80).toLong + 1))
      .map { case (id, s, len) => (id, s, s + len) }
      .toDF("iv_id", "iv_start", "iv_end")
    val probes = (1L to 400L).map(i => (i, rnd.nextInt(1100).toLong))
      .toDF("p_id", "pts")
    for (bw <- Seq(1L, 16L, 64L, 4096L)) {
      val bucketed = RangeJoin.pointInInterval(
          probes, intervals, "pts", "iv_start", "iv_end", bw)
        .select("p_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      val naive = probes.join(intervals,
          col("pts") >= col("iv_start") && col("pts") < col("iv_end"))
        .select("p_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(bucketed.length == bucketed.distinct.length, s"bw=$bw dup pairs")
      assert(bucketed.sorted.sameElements(naive.sorted), s"bw=$bw mismatch")
    }
  }

  test("auto bucket width: near the median length, same result set, degenerate-safe") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val intervals = (1L to 150L).map(i =>
      (i, rnd.nextInt(1000).toLong, rnd.nextInt(80).toLong + 1))
      .map { case (id, s, len) => (id, s, s + len) }
      .toDF("iv_id", "iv_start", "iv_end")
    val probes = (1L to 400L).map(i => (i, rnd.nextInt(1100).toLong))
      .toDF("p_id", "pts")
    val w = RangeJoin.autoBucketWidth(intervals, "iv_start", "iv_end")
    // lengths are uniform on [1, 80] (median ~40) — width is 2× median
    assert(w >= 50 && w <= 110, s"auto width $w far from 2x the ~40 median")
    val auto = RangeJoin.pointInInterval(probes, intervals, "pts", "iv_start", "iv_end")
      .select("p_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val fixed = RangeJoin.pointInInterval(probes, intervals, "pts", "iv_start", "iv_end", 16L)
      .select("p_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(auto.sorted.sameElements(fixed.sorted))
    // all-empty/inverted intervals: width falls back to 1, join is empty
    val empty = Seq((1L, 10L, 10L), (2L, 9L, 5L)).toDF("iv_id", "iv_start", "iv_end")
    assert(RangeJoin.autoBucketWidth(empty, "iv_start", "iv_end") == 1L)
    assert(RangeJoin.pointInInterval(probes, empty, "pts", "iv_start", "iv_end").count() == 0)
  }

  test("boundary semantics: start inclusive, end exclusive") {
    import spark.implicits._
    val intervals = Seq((1L, 10L, 20L)).toDF("iv_id", "iv_start", "iv_end")
    val probes = Seq((1L, 9L), (2L, 10L), (3L, 19L), (4L, 20L)).toDF("p_id", "pts")
    val hit = RangeJoin.pointInInterval(probes, intervals,
        "pts", "iv_start", "iv_end", 8)
      .select("p_id").collect().map(_.getLong(0)).sorted
    assert(hit.toSeq == Seq(2L, 3L))
  }
}
