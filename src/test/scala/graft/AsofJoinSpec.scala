package graft

import graft.operators.AsofJoin
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {

  test("global asof: hand corpus — before-first null, at-ts match, carry-forward") {
    import spark.implicits._
    val probes = Seq((1L, 5L), (2L, 10L), (3L, 15L), (4L, 25L), (5L, 20L))
      .toDF("probe_id", "sec")
    val states = Seq((100L, 10L), (200L, 20L)).toDF("state_id", "sec")
    // tiny data over many range partitions: states and probes straddle
    // partition boundaries, exercising the cross-partition seeding
    val out = AsofJoin.global(probes, states, "sec", Seq("state_id"),
        numPartitions = 7, broadcastBelowBytes = -1L) // force partitioned
      .collect().map(r => r.getAs[Long]("probe_id") ->
        Option(r.getAs[Any]("asof_state_id"))).toMap
    assert(out(1L).isEmpty, "probe before first state must be null")
    assert(out(2L).contains(100L), "state AT the probe ts matches (>=)")
    assert(out(3L).contains(100L))
    assert(out(5L).contains(200L))
    assert(out(4L).contains(200L), "carry must cross partition boundaries")
  }

  test("keyed asof: per-key independence and >= tie semantics") {
    import spark.implicits._
    val probes = Seq((1L, "a", 5L), (2L, "a", 12L), (3L, "b", 12L), (4L, "b", 30L))
      .toDF("probe_id", "k", "sec")
    val states = Seq(("a", 10L, 7L), ("b", 12L, 8L), ("b", 20L, 9L))
      .toDF("k", "sec", "state_id")
    val out = AsofJoin.keyed(probes, states, Seq("k"), "sec", Seq("state_id"))
      .collect().map(r => r.getAs[Long]("probe_id") ->
        Option(r.getAs[Any]("asof_state_id"))).toMap
    assert(out(1L).isEmpty)
    assert(out(2L).contains(7L))
    assert(out(3L).contains(8L), "equal-ts state matches the probe")
    assert(out(4L).contains(9L))
  }

  test("keyed == global on a single-key corpus (differential)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val probes = (1L to 300L).map(i => (i, rnd.nextInt(1000).toLong))
      .toDF("probe_id", "sec")
    val states = (1L to 40L).map(i => (i + 1000L, rnd.nextInt(1000).toLong))
      .toDF("state_id", "sec")
      .groupBy("sec").agg(max("state_id").as("state_id"))
    val g = AsofJoin.global(probes, states, "sec", Seq("state_id"), numPartitions = 5)
      .select("probe_id", "sec", "asof_state_id")
      .collect().map(_.toString).sorted
    val k = AsofJoin.keyed(probes.withColumn("k", lit(1)),
        states.withColumn("k", lit(1)), Seq("k"), "sec", Seq("state_id"))
      .select("probe_id", "sec", "asof_state_id")
      .collect().map(_.toString).sorted
    assert(g.sameElements(k))
  }

  test("global asof: broadcast path — same hand-corpus semantics, no shuffle of probes") {
    import spark.implicits._
    val probes = Seq((1L, 5L), (2L, 10L), (3L, 15L), (4L, 25L), (5L, 20L))
      .toDF("probe_id", "sec")
    val states = Seq((100L, 10L), (200L, 20L)).toDF("state_id", "sec")
    val df = AsofJoin.global(probes, states, "sec", Seq("state_id"))
    // tiny states must take the broadcast path: no Exchange above the
    // probe scan (only the state-side aggregate + broadcast build)
    val out = df.collect().map(r => r.getAs[Long]("probe_id") ->
      Option(r.getAs[Any]("asof_state_id"))).toMap
    assert(out(1L).isEmpty && out(2L).contains(100L) &&
      out(3L).contains(100L) && out(5L).contains(200L) && out(4L).contains(200L))
  }

  test("global asof: broadcast == partitioned on random corpora (gate differential)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      // trial shapes: dense ties, sparse states, probes straddling the
      // state range on both ends
      val span = 500 * trial
      val probes = (1L to 400L).map(i =>
          (i, rnd.nextInt(span).toLong - 50L)).toDF("probe_id", "sec")
      val states = (1L to 20L * trial).map(i =>
          (i + 9000L, rnd.nextInt(span - 100).toLong)).toDF("state_id", "sec")
        .groupBy("sec").agg(max("state_id").as("state_id"))
      def run(thresh: Long) =
        AsofJoin.global(probes, states, "sec", Seq("state_id"),
            numPartitions = 5, broadcastBelowBytes = thresh)
          .select("probe_id", "sec", "asof_state_id")
          .collect().map(_.toString).sorted.toSeq
      assert(run(Long.MaxValue) == run(-1L), s"paths diverged on trial $trial")
    }
  }

  test("global asof: empty state side yields all-null attachments") {
    import spark.implicits._
    val probes = Seq((1L, 5L), (2L, 10L)).toDF("probe_id", "sec")
    val states = Seq.empty[(Long, Long)].toDF("state_id", "sec")
    val out = AsofJoin.global(probes, states, "sec", Seq("state_id"))
    assert(out.count() == 2)
    assert(out.filter(col("asof_state_id").isNotNull).count() == 0)
  }
}
