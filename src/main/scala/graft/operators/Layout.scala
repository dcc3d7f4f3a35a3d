package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-layout operators for the lakehouse side of the engine: multi-
  * dimensional clustering (Z-order) and small-file compaction
  * planning. At 100 TB the dominant cost of most queries is the scan,
  * and the two levers that shrink it are (a) laying rows out so
  * per-file min/max statistics prune files on EVERY frequently-
  * filtered column, not just the sort leader, and (b) keeping file
  * sizes near the scan-task sweet spot so the driver doesn't drown in
  * footer reads and task scheduling.
  *
  * Everything here is pure DataFrame composition over codegen'd
  * built-ins (shiftleft / shiftright / bitwiseAND / bitwiseOR, window
  * cumsum) — no UDFs, no collect; the Z-value is a single whole-stage-
  * codegen expression and the compaction plan is one window pass over
  * a file manifest.
  */
object Layout {

  /** Morton (Z-order) code of `dims` columns, `bits` low bits each,
    * interleaved into one non-negative BIGINT: bit `i` of dimension
    * `d` lands at output position `i * dims.length + d`, so sorting by
    * the code gives the classic quadrant-recursive space-filling curve
    * and rows close in EVERY dimension land close in the sort.
    *
    * Inputs are masked to their low `bits` bits (callers bucket or
    * hash wider domains down first); `bits * dims.length` must fit in
    * 63. The expansion is `bits × dims` shift/mask/or terms — all
    * codegen'd built-ins, fused into whole-stage codegen like any
    * arithmetic projection.
    */
  def zValue(dims: Seq[Column], bits: Int = 16): Column = {
    require(dims.nonEmpty, "zValue needs at least one dimension")
    require(bits > 0 && bits * dims.size <= 63,
      s"bits=$bits × dims=${dims.size} exceeds a positive BIGINT")
    val n = dims.size
    val terms = for {
      (c, d) <- dims.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(
      shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * n + d)
    terms.reduce(_ bitwiseOR _)
  }

  /** Rewrite `df` into `numFiles` range-partitioned, Z-sorted slices:
    * repartitionByRange on the Z-value (sampled range boundaries →
    * near-equal output files) then sort within each partition, so a
    * writer emits one file per partition whose min/max footer stats
    * are tight on EVERY clustering column. Linear sort tightens only
    * its leading column; Z-order bounds all of them at once, which is
    * what makes `WHERE x = … AND y = …` prune files on either
    * predicate alone.
    *
    * The Z column is internal and dropped; pass the same `bits` the
    * query-side pruning was designed for.
    */
  def clusterByZorder(df: DataFrame, dims: Seq[String], numFiles: Int,
      bits: Int = 16): DataFrame = {
    val z = zValue(dims.map(col), bits)
    df.withColumn("_graft_z", z)
      .repartitionByRange(numFiles, col("_graft_z"))
      .sortWithinPartitions("_graft_z")
      .drop("_graft_z")
  }

  /** Hilbert-curve index of two dimensions — the tighter-locality
    * alternative to [[zValue]]: consecutive curve positions are ALWAYS
    * grid-neighbours (no quadrant-boundary jumps), so equal-width
    * index ranges (= output files) get tighter per-file bounding
    * boxes on adversarial query shapes. One codegen'd kernel call
    * ([[graft.functions.SpaceFill.hilbert2d]]); same masking contract
    * as zValue.
    */
  def hilbertValue(x: Column, y: Column, bits: Int = 16): Column =
    graft.functions.SpaceFillFunctions.hilbert2d(x, y, bits)

  /** 3-D Hilbert index via the Skilling transform
    * ([[graft.functions.SpaceFill.hilbertD]] — bijective and
    * neighbour-adjacent like the 2-D walk; a DIFFERENT curve
    * orientation than [[hilbertValue]], don't mix codes within one
    * layout). The JVM kernel generalizes to any d (d·bits ≤ 62);
    * 2-D and 3-D are the column-level arities.
    */
  def hilbertValue3(x: Column, y: Column, z: Column,
      bits: Int = 16): Column =
    graft.functions.SpaceFillFunctions.hilbert3d(x, y, z, bits)

  /** [[clusterByZorder]] with the Hilbert index as the clustering key
    * (two or three dimensions; [[hilbertValue3]]'s kernel covers
    * d > 3 for library callers).
    */
  def clusterByHilbert(df: DataFrame, xCol: String, yCol: String,
      numFiles: Int, bits: Int = 16): DataFrame =
    df.withColumn("_graft_h", hilbertValue(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col("_graft_h"))
      .sortWithinPartitions("_graft_h")
      .drop("_graft_h")

  /** Greedy small-file compaction plan over a file manifest
    * `(group, path, bytes)`: within each group (a partition
    * directory), files are taken in path order and packed left-to-
    * right into bins of ~`targetBytes` — file f lands in bin
    * `floor(cumsum_before(f) / target)`, the same one-pass greedy rule
    * the shard planner uses for token packing. Output adds `bin` (the
    * compacted-file ordinal within the group) and `bin_bytes` (that
    * bin's total), so an executor can stream-merge each bin's files
    * into one output file independently.
    *
    * One window pass per group — no driver materialization; a manifest
    * of millions of files is just another DataFrame. Bins track the
    * target approximately (a bin closes once its cumulative bytes
    * cross the next target boundary, so it can overshoot by at most
    * one file) — the right trade for compaction, where "roughly
    * target-sized" beats an exact bin-packing that would need a
    * quadratic or driver-side pass.
    */
  def compactionPlan(manifest: DataFrame, targetBytes: Long,
      groupCol: String = "group", pathCol: String = "path",
      bytesCol: String = "bytes"): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(pathCol)
    val before = coalesce(
      sum(col(bytesCol)).over(w.rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L))
    val binned = manifest.withColumn("bin",
      floor(before / lit(targetBytes)).cast("long"))
    binned
      .withColumn("bin_bytes",
        sum(col(bytesCol)).over(
          Window.partitionBy(col(groupCol), col("bin"))))
      .select(col(groupCol), col(pathCol), col(bytesCol),
        col("bin"), col("bin_bytes"))
  }

  /** Execute a [[compactionPlan]]: stream every planned bin's files
    * into ONE output file per bin, in a single Spark job.
    *
    * Shape: the manifest's paths feed one multi-path parquet scan;
    * each row is tagged with its source file (`input_file_name`),
    * joined against the broadcast plan (path → group, bin), hash-
    * repartitioned on (group, bin) — so a bin's rows land in exactly
    * one task — and written `partitionBy(group, bin)`: one file per
    * bin directory, content = the concatenation of the bin's input
    * files. No driver-side per-bin loop, no second listing pass; a
    * manifest of a million files is one job with a million-row
    * broadcast seam at worst (the same driver-sized file-listing
    * metadata Spark's own InMemoryFileIndex holds for any scan).
    *
    * Idempotent via [[graft.sources.Staging.stageOnce]]: the output
    * is built under a process-unique temp sibling and atomically
    * renamed into `outDir`; re-running against a published `outDir`
    * is a no-op. Paths are scheme-normalized (`file:/...` ==
    * `/...`) before the join so manifests may carry either form.
    * Returns the compacted frame read back from `outDir` (data
    * columns + `group`/`bin` partition directories).
    */
  def compactBins(manifest: DataFrame, targetBytes: Long, outDir: String,
      groupCol: String = "group", pathCol: String = "path",
      bytesCol: String = "bytes"): DataFrame = {
    val spark = manifest.sparkSession
    val plan = compactionPlan(manifest, targetBytes, groupCol, pathCol,
      bytesCol)
    def normalize(c: Column): Column =
      regexp_replace(c, "^file:/+", "/")
    // the path list is driver-sized scan metadata, not data — Spark's
    // FileIndex would hold the same listing for any read of the dirs
    val paths = manifest.select(col(pathCol)).collect().map(_.getString(0))
    if (paths.nonEmpty) {
      graft.sources.Staging.stageOnce(outDir) { tmp =>
        val tagged = spark.read.parquet(paths.toIndexedSeq: _*)
          .withColumn("_graft_src", normalize(input_file_name()))
        val binOf = broadcast(plan.select(
          normalize(col(pathCol)).as("_graft_src"),
          col(groupCol).as("_graft_group"), col("bin").as("_graft_bin")))
        tagged.join(binOf, "_graft_src")
          .drop("_graft_src")
          .repartition(col("_graft_group"), col("_graft_bin"))
          .write.partitionBy("_graft_group", "_graft_bin")
          .parquet(tmp)
      }
      spark.read.parquet(outDir)
        .withColumnRenamed("_graft_group", groupCol)
        .withColumnRenamed("_graft_bin", "bin")
    } else manifest.sparkSession.emptyDataFrame
  }
}
