package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale utilities: skew-resistant aggregation and the partitioned
  * bronze layer.
  */
object Scale {

  /** Two-phase salted aggregation for skewed grouping keys: phase 1
    * aggregates on (key, salt) — spreading a hot key over `salts`
    * reducers — phase 2 merges the partials per key. Correct for any
    * algebraic aggregate (sum/count/min/max); results are identical to
    * a direct groupBy, only the shuffle distribution changes.
    *
    * AQE's skew-join splitting handles joins; this is the groupBy-side
    * lever for when one key holds a disproportionate share of rows
    * (e.g. a spam contract emitting millions of traces).
    */
  def saltedSum(df: DataFrame, keyCols: Seq[String], valueCol: String,
      resultName: String, salts: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(hash(col(valueCol), monotonically_increasing_id()), lit(salts)))
    val partial = salted
      .groupBy((keyCols.map(col) :+ col("_salt")): _*)
      .agg(sum(col(valueCol)).as("_partial"))
    partial.groupBy(keyCols.map(col): _*)
      .agg(sum(col("_partial")).as(resultName))
  }

  /** Salted replicate join for a skewed join key, for engines/configs
    * where AQE's runtime skew-split isn't available (or the skew is in
    * the FIRST shuffle, before AQE has statistics): the small side is
    * replicated `salts`× (explode over the salt range) and the big
    * side tags each row with a content-derived salt, so a hot key's
    * rows spread over `salts` reducers instead of one. Results are
    * identical to the plain equi-join — every big-side row still
    * meets exactly one copy of each matching small-side row.
    *
    * The salt is a deterministic hash of the big side's whole row
    * (never a random() — rerun- and retry-stable). Cost: the small
    * side's shuffle volume × salts; use for genuinely small dims
    * that still can't be broadcast (or where the hot key would spill
    * a single reducer at 100 TB).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, salts: Int = 16): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    val bigSalted = big.withColumn("_salt",
      pmod(hash(big.columns.map(col).toSeq: _*), lit(salts)))
    val smallSalted = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigSalted.join(smallSalted,
        bigSalted(bigKey) === smallSalted(smallKey) &&
          bigSalted("_salt") === smallSalted("_salt"))
      .drop("_salt")
  }

  /** Bronze writer: partitions raw traces by (chain_id, block day) so
    * incremental jobs and per-chain backfills prune at the directory
    * level — at 100 TB a day-of-one-chain query touches its slice
    * only. Verified by [[graft.ScaleSpec]] via PartitionFilters in the
    * physical plan.
    */
  def writeBronze(traces: DataFrame, path: String): Unit =
    traces
      .withColumn("block_date",
        to_date(coalesce(col("block_timestamp"), lit(0L)).cast("timestamp")))
      .write
      .partitionBy("chain_id", "block_date")
      .mode("overwrite")
      .parquet(path)

  def readBronze(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
