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

  /** Default bucket width: 2× the (approximate) median interval
    * length — explode factor ~1.25 at the median and ≤2 for intervals
    * up to 4× it, which a width sweep on the catalog shape measured as
    * the flat left edge of the cost curve (width = median sat ~12%
    * above it; the curve stays flat to ~2.5× before per-bucket pair
    * space takes over). Removes the knob the SCALE_r06 rehearsal
    * showed peak task memory is sensitive to. One driver-side
    * approx-quantile pass over a single column of the intervals side —
    * the build side, the smaller input in every point-in-interval
    * workload this engine ships. The width only shapes cost, never
    * results (RangeJoinSpec pins width-independence), so the quantile
    * sketch's partition-order sensitivity is harmless.
    */
  def autoBucketWidth(intervals: DataFrame, startCol: String,
      endCol: String): Long = {
    // memoized per (session, semantically-identical intervals plan):
    // the width is a dataset statistic — recomputing the quantile job
    // on every execution of a cached query shape would double the
    // fixed cost of small joins. Values are bare longs (no pinned
    // resources), so no eviction is needed; the map is cleared if it
    // ever grows past a bound a sane workload won't reach.
    val key = org.apache.spark.sql.GraftShim.sessionUUID(intervals.sparkSession) +
      "|" + intervals.queryExecution.analyzed.semanticHash() +
      "|" + startCol + "|" + endCol
    if (widthCache.size() > 4096) widthCache.clear()
    widthCache.computeIfAbsent(key, _ => {
      val med = intervals
        .select((col(endCol) - col(startCol)).cast("double").as("_len"))
        .filter(col("_len") > 0)
        .stat.approxQuantile("_len", Array(0.5), 0.05)
      val w: Long = med.headOption.map(m => math.max(1L, 2L * m.toLong)).getOrElse(1L)
      java.lang.Long.valueOf(w)
    }).longValue()
  }

  private val widthCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** [[pointInInterval]] with the bucket width derived from the
    * median interval length.
    */
  def pointInInterval(probes: DataFrame, intervals: DataFrame,
      ptsCol: String, startCol: String, endCol: String): DataFrame =
    pointInInterval(probes, intervals, ptsCol, startCol, endCol,
      autoBucketWidth(intervals, startCol, endCol))

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
