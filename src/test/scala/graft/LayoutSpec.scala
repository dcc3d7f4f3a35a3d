package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton interleave, bit-by-bit, for differential checks. */
  private def mortonRef(vals: Seq[Long], bits: Int): Long = {
    var z = 0L
    val n = vals.size
    for (d <- vals.indices; i <- 0 until bits)
      z |= ((vals(d) >> i) & 1L) << (i * n + d)
    z
  }

  test("zValue matches the bit-by-bit reference on a deterministic grid") {
    val rows = for {
      x <- 0L until 64L; y <- Seq(0L, 1L, 2L, 31L, 63L, 255L, 65535L)
    } yield (x, y)
    val df = rows.toDF("x", "y")
      .withColumn("z", Layout.zValue(Seq(col("x"), col("y")), bits = 16))
    df.collect().foreach { r =>
      val expect = mortonRef(Seq(r.getLong(0), r.getLong(1)), 16)
      assert(r.getLong(2) == expect, s"(${r.getLong(0)},${r.getLong(1)})")
    }
  }

  test("zValue: three dimensions, masking of high bits, codegen plan") {
    val df = Seq((5L, 9L, 1030L)).toDF("a", "b", "c")
      .withColumn("z", Layout.zValue(Seq(col("a"), col("b"), col("c")), bits = 4))
    // c=1030 keeps only its low 4 bits (6)
    assert(df.head().getLong(3) == mortonRef(Seq(5L, 9L, 6L), 4))
    // the expansion stays inside whole-stage codegen (pure built-ins);
    // checked over a non-literal source (a literal input would be
    // constant-folded into a LocalTableScan before codegen)
    val plan = spark.range(100)
      .withColumn("z", Layout.zValue(Seq(col("id"), col("id") + 1), bits = 8))
      .queryExecution.executedPlan.toString
    // the `*(1)` star marks the Project as inside a WholeStageCodegen span
    assert(plan.startsWith("*("), plan.take(400))
  }

  test("clusterByZorder bounds per-slice ranges on BOTH dimensions") {
    // 4096 points on a 64x64 grid. Linear sort by x gives slices that
    // span the full y domain; Z-order bounds both coordinates.
    val pts = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
    def avgSpan(df: org.apache.spark.sql.DataFrame, dim: String): Double =
      df.withColumn("pid", spark_partition_id())
        .groupBy("pid").agg((max(dim) - min(dim)).as("span"))
        .agg(avg("span")).head().getDouble(0)

    val zed = Layout.clusterByZorder(pts, Seq("x", "y"), numFiles = 16, bits = 6)
      .cache()
    val linear = pts.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .cache()
    assert(zed.count() == 4096 && linear.count() == 4096)

    val (zx, zy) = (avgSpan(zed, "x"), avgSpan(zed, "y"))
    val ly = avgSpan(linear, "y")
    // linear-by-x slices span essentially all of y (~63); z-order
    // quadrants keep both spans near 16 for 16 slices of a 64x64 grid
    assert(ly > 50, s"linear y-span unexpectedly tight: $ly")
    assert(zy < ly / 2, s"z-order y-span $zy not < half of linear $ly")
    assert(zx < 32, s"z-order x-span too wide: $zx")
    zed.unpersist(); linear.unpersist()
  }

  test("hilbert2d: a true Hilbert walk — consecutive indices are grid-neighbours") {
    import graft.functions.SpaceFill
    val bits = 5 // full 32x32 grid, 1024 cells
    val byD = (for (x <- 0L until 32L; y <- 0L until 32L)
      yield SpaceFill.hilbert2d(x, y, bits) -> ((x, y))).toMap
    assert(byD.size == 1024, "index must be a bijection over the grid")
    assert(byD.keySet == (0L until 1024L).toSet)
    for (d <- 0L until 1023L) {
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump at d=$d: ($x1,$y1) -> ($x2,$y2)")
    }
    // masking contract matches zValue's
    assert(SpaceFill.hilbert2d(32L + 3L, 64L + 7L, 5) ==
      SpaceFill.hilbert2d(3L, 7L, 5))
  }

  test("hilbertD (Skilling): bijection + neighbour adjacency at d=3 and d=4") {
    import graft.functions.SpaceFill
    // d=3, bits=3: full 8x8x8 grid, 512 cells
    val byD3 = (for (x <- 0L until 8L; y <- 0L until 8L; z <- 0L until 8L)
      yield SpaceFill.hilbertD(Array(x, y, z), 3) -> ((x, y, z))).toMap
    assert(byD3.size == 512, "d=3 index must be a bijection over the grid")
    assert(byD3.keySet == (0L until 512L).toSet)
    for (d <- 0L until 511L) {
      val (x1, y1, z1) = byD3(d); val (x2, y2, z2) = byD3(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) + math.abs(z1 - z2) == 1,
        s"jump at d=$d: ($x1,$y1,$z1) -> ($x2,$y2,$z2)")
    }
    // d=4, bits=2: full 4^4 grid, 256 cells
    val byD4 = (for (x <- 0L until 4L; y <- 0L until 4L;
        z <- 0L until 4L; w <- 0L until 4L)
      yield SpaceFill.hilbertD(Array(x, y, z, w), 2) -> Seq(x, y, z, w)).toMap
    assert(byD4.size == 256 && byD4.keySet == (0L until 256L).toSet)
    for (d <- 0L until 255L)
      assert(byD4(d).zip(byD4(d + 1)).map { case (a, b) => math.abs(a - b) }.sum == 1,
        s"d=4 jump at $d")
    // masking contract and the fixed-arity 3-D wrapper
    assert(SpaceFill.hilbertD(Array(8L + 3L, 16L + 5L, 24L + 7L), 3) ==
      SpaceFill.hilbertD(Array(3L, 5L, 7L), 3))
    assert(SpaceFill.hilbert3d(3L, 5L, 7L, 3) ==
      SpaceFill.hilbertD(Array(3L, 5L, 7L), 3))
  }

  test("hilbertValue3 column == kernel; tighter 3-D chunk boxes than Morton") {
    import graft.functions.SpaceFill
    val pts = (for (x <- 0L until 16L; y <- 0L until 16L; z <- 0L until 16L)
      yield (x, y, z)).toDF("x", "y", "z")
    val viaCol = pts.withColumn("h",
        Layout.hilbertValue3(col("x"), col("y"), col("z"), bits = 4))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(viaCol.size == 4096)
    assert(viaCol((13L, 7L, 2L)) == SpaceFill.hilbert3d(13L, 7L, 2L, 4))
    // bbox-locality: sort the grid by each code, cut into equal chunks
    // (= files) whose size is NOT octree-aligned (at power-of-two
    // chunk sizes both curves give perfect cubes and the comparison
    // degenerates), sum the chunk bounding-box VOLUMES — the Hilbert
    // layout's per-file boxes must not be looser than Morton's
    def boxVolumeSum(key: (Long, Long, Long) => Long): Long = {
      val sorted = (for (x <- 0L until 16L; y <- 0L until 16L; z <- 0L until 16L)
        yield (x, y, z)).sortBy { case (x, y, z) => key(x, y, z) }
      sorted.grouped(100).map { chunk =>
        def span(f: ((Long, Long, Long)) => Long) =
          chunk.map(f).max - chunk.map(f).min + 1
        span(_._1) * span(_._2) * span(_._3)
      }.sum
    }
    val hVol = boxVolumeSum(SpaceFill.hilbert3d(_, _, _, 4))
    val zVol = boxVolumeSum { (x, y, z) =>
      (0 until 4).map { i =>
        (((x >> i) & 1L) << (3 * i)) | (((y >> i) & 1L) << (3 * i + 1)) |
          (((z >> i) & 1L) << (3 * i + 2))
      }.reduce(_ | _)
    }
    info(s"3-D bbox-volume sum: hilbert = $hVol vs morton = $zVol")
    assert(hVol <= zVol, s"hilbert boxes looser than morton: $hVol vs $zVol")
  }

  test("hilbertValue column == kernel; clusterByHilbert bounds both dims") {
    import graft.functions.SpaceFill
    val pts = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
    val viaCol = pts.withColumn("h",
        Layout.hilbertValue(col("x"), col("y"), bits = 6))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(viaCol(13L -> 27L) == SpaceFill.hilbert2d(13L, 27L, 6))
    assert(viaCol.size == 4096)
    def avgSpan(df: org.apache.spark.sql.DataFrame, dim: String): Double =
      df.withColumn("pid", spark_partition_id())
        .groupBy("pid").agg((max(dim) - min(dim)).as("span"))
        .agg(avg("span")).head().getDouble(0)
    val h = Layout.clusterByHilbert(pts, "x", "y", numFiles = 16, bits = 6).cache()
    assert(h.count() == 4096)
    assert(avgSpan(h, "x") < 32 && avgSpan(h, "y") < 32)
    h.unpersist()
  }

  test("degenerate inputs degrade, never throw") {
    import org.apache.spark.sql.types._
    // null dimension values propagate to a null z-value (no crash)
    val withNull = Seq((Some(3L), 5L), (None, 7L)).toDF("x", "y")
      .withColumn("z", Layout.zValue(Seq(col("x"), col("y")), bits = 8))
    assert(withNull.filter(col("z").isNull).count() == 1)
    // empty frame through clustering and compaction
    val emptyPts = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("x", LongType), StructField("y", LongType))))
    assert(Layout.clusterByZorder(emptyPts, Seq("x", "y"), 4).count() == 0)
    val emptyMf = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("group", StringType),
        StructField("path", StringType), StructField("bytes", LongType))))
    assert(Layout.compactionPlan(emptyMf, 100L).count() == 0)
    // zero-byte files land in the current bin without advancing it
    val zeros = Seq(("g", "a", 0L), ("g", "b", 0L), ("g", "c", 5L))
      .toDF("group", "path", "bytes")
    assert(Layout.compactionPlan(zeros, 100L).select("bin")
      .as[Long].collect().toSet == Set(0L))
  }

  test("z-ordered parquet files prune at the scan: fewer rows leave the reader") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = java.nio.file.Files.createTempDirectory("graft_layout").toFile
    dir.deleteOnExit()
    // pseudo-random spread over a 997x991 domain, 200k points
    val pts = spark.range(200000).select(
      (col("id") % 997).as("x"), (col("id") * 31 % 991).as("y"))
    Layout.clusterByZorder(pts.toDF(), Seq("x", "y"), numFiles = 16, bits = 10)
      .write.mode("overwrite").parquet(s"$dir/zed")
    pts.repartition(16).write.mode("overwrite").parquet(s"$dir/rand")

    def rowsLeavingScan(path: String): Long = {
      val df = spark.read.parquet(path).filter(col("x") === 123L)
      df.collect() // run THIS plan instance (count() would plan anew)
      df.queryExecution.executedPlan.collectLeaves().collectFirst {
        case f: FileSourceScanExec => f.metrics("numOutputRows").value
      }.getOrElse(fail("no FileSourceScanExec in plan"))
    }
    try {
      val (zed, rand) = (rowsLeavingScan(s"$dir/zed"), rowsLeavingScan(s"$dir/rand"))
      // random layout: every row group's x-range covers 123, nothing is
      // skipped — the scan emits all 200k rows and the filter does all
      // the work. Z-ordered files carry tight x min/max, so parquet
      // row-group pushdown drops most groups before they're read.
      assert(rand == 200000L, s"random layout unexpectedly pruned: $rand")
      assert(zed <= rand / 2, s"z-order pruned nothing: $zed vs $rand")
    } finally org.apache.hadoop.fs.FileUtil.fullyDelete(dir)
  }

  test("hilbert-clustered parquet files prune at the scan like z-order, " +
      "with tighter per-file bounding boxes") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = java.nio.file.Files.createTempDirectory("graft_layout_h").toFile
    dir.deleteOnExit()
    // same 200k-point corpus and predicate as the z-order proof
    val pts = spark.range(200000).select(
      (col("id") % 997).as("x"), (col("id") * 31 % 991).as("y"))
    Layout.clusterByHilbert(pts.toDF(), "x", "y", numFiles = 16, bits = 10)
      .write.mode("overwrite").parquet(s"$dir/hil")
    Layout.clusterByZorder(pts.toDF(), Seq("x", "y"), numFiles = 16, bits = 10)
      .write.mode("overwrite").parquet(s"$dir/zed")
    pts.repartition(16).write.mode("overwrite").parquet(s"$dir/rand")

    def rowsLeavingScan(path: String): Long = {
      val df = spark.read.parquet(path).filter(col("x") === 123L)
      df.collect()
      df.queryExecution.executedPlan.collectLeaves().collectFirst {
        case f: FileSourceScanExec => f.metrics("numOutputRows").value
      }.getOrElse(fail("no FileSourceScanExec in plan"))
    }
    // the locality claim, measured directly: sum over output files of
    // the file's (x, y) bounding-box area. Contiguous Hilbert index
    // ranges are connected grid regions (no quadrant jumps), so their
    // boxes should be no looser than z-order's in aggregate.
    def bboxArea(path: String): Long =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(((max("x") - min("x")) * (max("y") - min("y"))).as("a"))
        .agg(sum("a")).collect()(0).getLong(0)
    try {
      val (hil, rand) = (rowsLeavingScan(s"$dir/hil"), rowsLeavingScan(s"$dir/rand"))
      assert(rand == 200000L, s"random layout unexpectedly pruned: $rand")
      assert(hil <= rand / 2, s"hilbert pruned nothing: $hil vs $rand")
      val (hBox, zBox) = (bboxArea(s"$dir/hil"), bboxArea(s"$dir/zed"))
      info(s"measured: hilbert rows leaving scan = $hil / $rand; " +
        s"bbox-area sum hilbert = $hBox vs z-order = $zBox")
      assert(hBox <= zBox,
        s"hilbert per-file boxes looser than z-order: $hBox vs $zBox")
    } finally org.apache.hadoop.fs.FileUtil.fullyDelete(dir)
  }

  test("compactBins: one file per bin, rows and content preserved, idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toFile
    dir.deleteOnExit()
    // 3 groups × 5 buckets of small files, 3000 rows total
    val src = spark.range(3000).select(col("id"),
      (col("id") % 3).cast("string").as("g"),
      (col("id") * 7 % 101).as("v"),
      lpad((col("id") % 5).cast("string"), 2, "0").as("b"))
    src.repartition(col("g"), col("b"))
      .write.partitionBy("g", "b").parquet(s"$dir/src")
    try {
      val listed = spark.read.parquet(s"$dir/src")
        .withColumn("path", input_file_name())
      val manifest = listed.groupBy("path")
        .agg(count(lit(1)).as("bytes"))
        .withColumn("group", regexp_extract(col("path"), "g=([^/]+)", 1))
      // 5 files of ~200 rows per group; target 450 -> bins of ~2-3 files
      val out = Layout.compactBins(manifest, targetBytes = 450L, s"$dir/out")
      // rows and content preserved exactly (multiset via count + hash sum)
      val (n0, h0) = src.agg(count(lit(1)),
        sum(col("id") * 31 + col("v"))).collect()(0) match {
        case r => (r.getLong(0), r.getLong(1))
      }
      val (n1, h1) = out.agg(count(lit(1)),
        sum(col("id") * 31 + col("v"))).collect()(0) match {
        case r => (r.getLong(0), r.getLong(1))
      }
      assert((n1, h1) == (n0, h0))
      // exactly one physical file per planned bin
      val filesPerBin = out.withColumn("f", input_file_name())
        .groupBy("group", "bin")
        .agg(countDistinct("f").as("nf"))
        .select("nf").as[Long].collect()
      assert(filesPerBin.nonEmpty && filesPerBin.forall(_ == 1L))
      // multiple bins per group actually materialized (not one blob)
      assert(out.select("group", "bin").distinct().count() >
        out.select("group").distinct().count())
      // idempotent: a second run is a no-op against the published dir
      val again = Layout.compactBins(manifest, targetBytes = 450L, s"$dir/out")
      assert(again.count() == n0)
      // empty manifest degrades
      assert(Layout.compactBins(manifest.limit(0), 450L, s"$dir/out2")
        .isEmpty)
    } finally org.apache.hadoop.fs.FileUtil.fullyDelete(dir)
  }

  test("compactionPlan: greedy boundary rule, per-group independence") {
    val manifest = Seq(
      ("p1", "a", 40L), ("p1", "b", 40L), ("p1", "c", 40L), ("p1", "d", 250L),
      ("p1", "e", 10L), ("p2", "a", 10L), ("p2", "b", 10L)
    ).toDF("group", "path", "bytes")
    val plan = Layout.compactionPlan(manifest, targetBytes = 100L)
      .orderBy("group", "path").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(3), r.getLong(4)))
    // p1: before = 0,40,80,120,370 -> bins 0,0,0,1,3
    assert(plan.toSeq == Seq(
      ("p1", "a", 0L, 120L), ("p1", "b", 0L, 120L), ("p1", "c", 0L, 120L),
      ("p1", "d", 1L, 250L), ("p1", "e", 3L, 10L),
      ("p2", "a", 0L, 20L), ("p2", "b", 0L, 20L)))
  }

  test("compactionPlan shrinks a real small-file listing to ~target bins") {
    // synthesize a 200-file manifest: sizes 1..200 KB over 4 groups
    val manifest = (1 to 200)
      .map(i => (s"g${i % 4}", f"f$i%04d", i.toLong * 1024))
      .toDF("group", "path", "bytes")
    val plan = Layout.compactionPlan(manifest, targetBytes = 1024 * 1024)
    val bins = plan.groupBy("group", "bin").agg(sum("bytes").as("b"))
    val n = bins.count()
    val total = 1024L * (1 to 200).map(_.toLong).sum
    val ideal = math.ceil(total.toDouble / (1024 * 1024)).toLong
    assert(n >= ideal && n <= ideal + 8, s"bins=$n ideal=$ideal")
    // no bin overshoots target by more than one file's bytes
    val worst = bins.join(
        plan.groupBy("group", "bin").agg(max("bytes").as("mx")),
        Seq("group", "bin"))
      .filter(col("b") > lit(1024 * 1024) + col("mx")).count()
    assert(worst == 0)
  }
}
