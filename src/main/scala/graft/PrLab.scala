package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch lab for the pageRank small-path structure hunt (round 11).
  * Times alternative single-plan formulations of the fused 3-superstep
  * PageRank at sf0.1 without touching GraphOps. Delete or keep as an
  * experiment log; not part of the API.
  */
/** Gate rehearsal for [[graft.operators.GraphOps.pageRank]]: runs the
  * q_graph_pagerank edge derivation against each given corpus, prints
  * the edge-size estimate, which path the gate picked, the wall time
  * and the rank checksum — the cross-path differential at scale
  * (ScaleUp replicas dedup to the same graph, so every SF must agree).
  *
  *   runMain graft.PrGate <dir1> [dir2 ...]
  */
object PrGate {
  def main(args: Array[String]): Unit = {
    // corpora are explicit args — no machine-specific fallbacks in
    // the shipped artifact (rehearsal commands live in COVERAGE.md)
    require(args.nonEmpty,
      "usage: runMain graft.PrGate <corpusDir> [corpusDir ...]")
    val dirs = args.toSeq
    val spark = SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- dirs) {
      // filesystem probe through the Hadoop FS resolver (Staging) —
      // a java.io.File probe is wrong on any non-local path
      val lineitem = dir + (if (graft.sources.Staging.pathExists(
        s"$dir/lineitem.parquet")) "/lineitem.parquet" else "/lineitem")
      val edges = spark.read.parquet(lineitem).select(
        col("l_suppkey").as("src"), col("l_partkey").as("dst"))
      val est = edges.queryExecution.optimizedPlan.stats.sizeInBytes
      val t0 = System.nanoTime()
      val sums = graft.operators.GraphOps.pageRank(edges, "src", "dst", iters = 3)
        .agg(sum("rank"), count(lit(1))).collect()(0)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"GATE $dir est=${est.toLong / 1048576.0}%.1f MB " +
        f"materialized=${graft.operators.GraphOps.lastMaterialized} " +
        f"rankSum=${sums.getLong(0)} nodes=${sums.getLong(1)} wall=$wall%.2f s")
    }
    spark.stop()
  }
}

object PrLab {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: runMain graft.PrLab <corpusDir> [nRuns]")
    val dir = args(0)
    val n = if (args.length > 1) args(1).toInt else 4
    val spark = SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.contains("SPARK_GRAFT_PROBE_JOBS"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          private val t0 = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            t0.put(j.jobId, System.nanoTime())
          override def onJobEnd(
              j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
            println(f"  [job ${j.jobId}%3d] ${(System.nanoTime() - t0.getOrDefault(j.jobId, 0L)) / 1e9}%6.3f s")
        })
    Queries.stageAll(spark, dir)
    val scale = 1000000L
    val base = 150000L

    def edges = spark.read.parquet(s"$dir/lineitem.parquet").select(
      col("l_suppkey").cast("long").as("src"),
      col("l_partkey").cast("long").as("dst"))

    // S1: current shape — dst-partitioned eager-checkpointed edge
    // frame, broadcast contributions, composed finish plan.
    def s1(): DataFrame =
      graft.operators.GraphOps.pageRank(edges, "src", "dst", iters = 3)

    // S2: lazy-persisted eDst (ONE action total), broadcast contribs.
    def s2(): DataFrame = {
      import org.apache.spark.storage.StorageLevel
      val degAll = edges.groupBy("src")
        .agg(count_distinct(struct(col("dst"))).as("d"))
      val eDst = edges.repartition(32, col("dst"))
        .dropDuplicates("src", "dst")
        .join(broadcast(degAll), Seq("src"), "left")
        .persist(StorageLevel.MEMORY_AND_DISK)
      val nodes = eDst.select(col("dst").as("id")).distinct()
        .unionByName(degAll.select(col("src").as("id"))).distinct()
      def step(c0: Option[DataFrame]): DataFrame = {
        val vExpr = c0 match {
          case None => expr(s"(${scale}L * 850) DIV (1000 * d)")
          case Some(_) => expr(s"((${base}L + coalesce(s, 0L)) * 850) DIV (1000 * d)")
        }
        val j = c0 match {
          case None => eDst
          case Some(c) => eDst.join(broadcast(c), eDst("src") === c("id"), "left")
        }
        j.select(col("dst"), vExpr.as("c"))
          .groupBy(col("dst").as("id")).agg(sum("c").as("s"))
      }
      val c3 = step(Some(step(Some(step(None)))))
      val out = nodes.join(broadcast(c3), Seq("id"), "left")
        .select(col("id"), (lit(base) + coalesce(col("s"), lit(0L))).as("rank"))
        .localCheckpoint(eager = true)
      eDst.unpersist()
      out
    }

    // S3: single aggregate to an adjacency-list frame — one shuffle of
    // the raw edges, degree for free, supersteps explode the list.
    def s3(): DataFrame = {
      import org.apache.spark.storage.StorageLevel
      val adj = edges.groupBy("src")
        .agg(collect_set(col("dst")).as("dsts"))
        .withColumn("d", size(col("dsts")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val nodes = adj.select(explode(col("dsts")).as("id")).distinct()
        .unionByName(adj.select(col("src").as("id"))).distinct()
      def step(c0: Option[DataFrame]): DataFrame = {
        val vExpr = c0 match {
          case None => expr(s"(${scale}L * 850) DIV (1000 * d)")
          case Some(_) => expr(s"((${base}L + coalesce(s, 0L)) * 850) DIV (1000 * d)")
        }
        val j = c0 match {
          case None => adj
          case Some(c) => adj.join(broadcast(c), adj("src") === c("id"), "left")
        }
        j.select(explode(col("dsts")).as("dst"), vExpr.as("c"))
          .groupBy(col("dst").as("id")).agg(sum("c").as("s"))
      }
      val c3 = step(Some(step(Some(step(None)))))
      val out = nodes.join(broadcast(c3), Seq("id"), "left")
        .select(col("id"), (lit(base) + coalesce(col("s"), lit(0L))).as("rank"))
        .localCheckpoint(eager = true)
      adj.unpersist()
      out
    }

    // S4: s2 without the final eager checkpoint (persist leaks during
    // the measurement; hygiene question separated from speed question)
    def s4(): DataFrame = {
      import org.apache.spark.storage.StorageLevel
      val degAll = edges.groupBy("src")
        .agg(count_distinct(struct(col("dst"))).as("d"))
      val eDst = edges.repartition(32, col("dst"))
        .dropDuplicates("src", "dst")
        .join(broadcast(degAll), Seq("src"), "left")
        .persist(StorageLevel.MEMORY_AND_DISK)
      val nodes = eDst.select(col("dst").as("id")).distinct()
        .unionByName(degAll.select(col("src").as("id"))).distinct()
      def step(c0: Option[DataFrame]): DataFrame = {
        val vExpr = c0 match {
          case None => expr(s"(${scale}L * 850) DIV (1000 * d)")
          case Some(_) => expr(s"((${base}L + coalesce(s, 0L)) * 850) DIV (1000 * d)")
        }
        val j = c0 match {
          case None => eDst
          case Some(c) => eDst.join(broadcast(c), eDst("src") === c("id"), "left")
        }
        j.select(col("dst"), vExpr.as("c"))
          .groupBy(col("dst").as("id")).agg(sum("c").as("s"))
      }
      val c3 = step(Some(step(Some(step(None)))))
      nodes.join(broadcast(c3), Seq("id"), "left")
        .select(col("id"), (lit(base) + coalesce(col("s"), lit(0L))).as("rank"))
    }

    // S5: single-task in-memory kernel — the gate guarantees the edge
    // frame is tiny, so run dedup/degree/supersteps imperatively in
    // ONE task: scan → coalesce(1) → mapPartitions. Zero exchanges,
    // zero broadcasts, zero caches.
    def s5(): DataFrame = {
      import spark.implicits._
      edges.as[(Option[Long], Option[Long])].coalesce(1).mapPartitions { it =>
        val seen = new java.util.HashSet[(Option[Long], Option[Long])]()
        val deg = new java.util.HashMap[Option[Long], Long]()
        val adj = new scala.collection.mutable.ArrayBuffer[(Option[Long], Option[Long])]()
        val nodes = new java.util.HashSet[Option[Long]]()
        while (it.hasNext) {
          val e = it.next()
          if (seen.add(e)) {
            nodes.add(e._1); nodes.add(e._2)
            if (e._1.isDefined) { deg.merge(e._1, 1L, _ + _); adj += e }
          }
        }
        var contrib = new java.util.HashMap[Option[Long], Long]()
        var t = 0
        while (t < 3) {
          val next = new java.util.HashMap[Option[Long], Long]()
          adj.foreach { case (s, d) =>
            val r = if (t == 0) scale else base + contrib.getOrDefault(s, 0L)
            next.merge(d, (r * 850L) / (1000L * deg.get(s)), _ + _)
          }
          contrib = next; t += 1
        }
        val out = new scala.collection.mutable.ArrayBuffer[(Option[Long], Long)](nodes.size())
        nodes.forEach(n => out += ((n, base + contrib.getOrDefault(n, 0L))))
        out.iterator
      }.toDF("id", "rank")
    }

    // S6: like S5 but parallel scan feeding ONE exchange into the
    // single compute task (repartition(1) instead of coalesce(1)).
    def s6(): DataFrame = {
      import spark.implicits._
      edges.as[(Option[Long], Option[Long])].repartition(1).mapPartitions { it =>
        val seen = new java.util.HashSet[(Option[Long], Option[Long])]()
        val deg = new java.util.HashMap[Option[Long], Long]()
        val adj = new scala.collection.mutable.ArrayBuffer[(Option[Long], Option[Long])]()
        val nodes = new java.util.HashSet[Option[Long]]()
        while (it.hasNext) {
          val e = it.next()
          if (seen.add(e)) {
            nodes.add(e._1); nodes.add(e._2)
            if (e._1.isDefined) { deg.merge(e._1, 1L, _ + _); adj += e }
          }
        }
        var contrib = new java.util.HashMap[Option[Long], Long]()
        var t = 0
        while (t < 3) {
          val next = new java.util.HashMap[Option[Long], Long]()
          adj.foreach { case (s, d) =>
            val r = if (t == 0) scale else base + contrib.getOrDefault(s, 0L)
            next.merge(d, (r * 850L) / (1000L * deg.get(s)), _ + _)
          }
          contrib = next; t += 1
        }
        val out = new scala.collection.mutable.ArrayBuffer[(Option[Long], Long)](nodes.size())
        nodes.forEach(n => out += ((n, base + contrib.getOrDefault(n, 0L))))
        out.iterator
      }.toDF("id", "rank")
    }

    val variants: Seq[(String, () => DataFrame)] =
      Seq("s1" -> (() => s1()), "s2" -> (() => s2()), "s3" -> (() => s3()),
        "s4" -> (() => s4()), "s5" -> (() => s5()), "s6" -> (() => s6()))
    // correctness cross-check once
    val ref = s1().collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    for ((name, f) <- variants.drop(1)) {
      val got = f().collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      println(s"CHECK $name == s1: ${got.sameElements(ref)} (${got.length} rows)")
    }
    for ((name, f) <- variants; i <- 1 to n) {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      println(f"LAB $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // same variants with AQE disabled for build+execution: the fused
    // small path has no skew/stats decisions left for AQE to make, so
    // every adaptive stage barrier is pure scheduling overhead here
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    for ((name, f) <- variants; i <- 1 to n) {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      println(f"LAB $name-noaqe run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
  }
}
