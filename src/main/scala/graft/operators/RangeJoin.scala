package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed point-in-interval join: probes (a point column) against
  * intervals [start, end) WITHOUT the quadratic theta-join a naive
  * `p >= start AND p < end` condition plans (BroadcastNestedLoop /
  * cartesian): both sides map to fixed-width buckets — an interval
  * explodes into every bucket it overlaps, a probe into exactly one —
  * the equi-join on bucket bounds the pair space, and the exact
  * containment predicate filters inside the bucket.
  *
  * Cost shape at scale: explode factor = ⌈interval length /
  * bucketWidth⌉ (pick bucketWidth near the median interval length so
  * it stays ~2), pair space = Σ_bucket |probes| · |intervals|
  * per bucket. No duplicate pairs by construction — a probe meets an
  * interval only in the probe's own bucket.
  *
  * Memory watch (SCALE_r06 rehearsal): the per-bucket hash build is
  * the peak-memory site (5.8 GB task peak at sf1). If a deployment
  * grows buckets past executor memory, narrow `bucketWidth` (more,
  * smaller buckets) — AQE's skew-join splitting also applies, since
  * the bucket id is the shuffle key.
  */
object RangeJoin {

  def pointInInterval(probes: DataFrame, intervals: DataFrame,
      ptsCol: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val pb = probes.withColumn("_bucket",
      floor(col(ptsCol) / bucketWidth).cast("long"))
    // guard: an empty/inverted interval (end <= start) must produce
    // ZERO bucket rows, not a descending sequence (Spark auto-steps
    // -1, which would explode |start-end|/width spurious rows before
    // the containment filter drops them). explode(null) drops the row.
    val ib = intervals.withColumn("_bucket",
      explode(when(col(endCol) > col(startCol), sequence(
        floor(col(startCol) / bucketWidth).cast("long"),
        floor((col(endCol) - 1) / bucketWidth).cast("long")))))
    pb.join(ib, Seq("_bucket"))
      .filter(col(ptsCol) >= col(startCol) && col(ptsCol) < col(endCol))
      .drop("_bucket")
  }
}
