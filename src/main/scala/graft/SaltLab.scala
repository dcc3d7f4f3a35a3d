package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Attribution lab for `q_scale_salted_join`: the salted replicate
  * join pays a deliberate premium over the plain equi-join (small
  * side ×salts, a wider shuffle key) in exchange for first-shuffle
  * skew immunity. This times the SAME frames through the plain join,
  * the salted join at several salt counts, and (the case the operator
  * exists for) both shapes on a PLANTED hot-key corpus with AQE skew
  * handling disabled — the "first shuffle, before AQE has stats"
  * regime the scaladoc claims.
  *
  *   runMain graft.SaltLab <sfDir> [runs]
  */
object SaltLab {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: runMain graft.SaltLab <sfDir> [runs]")
    val dir = args(0)
    val runs = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def fmt(mk: => DataFrame): String =
      (1 to runs).map(_ => f"${noop(mk)}%.2f").mkString("/")
    val li = spark.read.parquet(s"$dir/lineitem.parquet").select(
      col("l_orderkey"), col("l_linenumber"),
      floor(col("l_quantity")).cast("long").as("qty"))
    val ord = spark.read.parquet(s"$dir/orders.parquet").select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
    val cols = Seq("l_orderkey", "l_linenumber", "qty", "o_custkey",
      "o_orderstatus")
    println(s"corpus $dir, $runs runs (run 1 cold)")
    println(s"plain equi-join:      ${fmt(
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select(cols.map(col): _*))}")
    for (k <- Seq(4, 8, 16))
      println(s"salted join (x$k):    ${fmt(
        graft.operators.Scale.saltedJoin(li, ord, "l_orderkey",
          "o_orderkey", salts = k).select(cols.map(col): _*))}")
    // the skew case: 90% of lineitem keys collapsed onto ONE hot key
    // (as NON-FOLDABLE expressions — literal keys constant-fold the
    // join condition away into a broadcast nested loop and prove
    // nothing), the order side deduped per mapped key so the join
    // stays 1:N, AQE's skew mitigation AND broadcast both off — the
    // regime the operator exists for: first shuffle, no stats, one
    // reducer owning 90% of the stream
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    def hot(c: String) = when(col(c) % 10 =!= 0, lit(1L)).otherwise(col(c))
    val hotLi = li.withColumn("l_orderkey", hot("l_orderkey"))
    val hotOrd = ord.withColumn("o_orderkey", hot("o_orderkey"))
      .groupBy("o_orderkey")
      .agg(first("o_custkey").as("o_custkey"),
        first("o_orderstatus").as("o_orderstatus"))
      .localCheckpoint()
    println(s"SKEWED plain join:    ${fmt(
      hotLi.join(hotOrd, col("l_orderkey") === col("o_orderkey"))
        .select(cols.map(col): _*))}")
    println(s"SKEWED salted (x32):  ${fmt(
      graft.operators.Scale.saltedJoin(hotLi, hotOrd, "l_orderkey",
        "o_orderkey", salts = 32).select(cols.map(col): _*))}")
    // the r15 self-gating operator: pays one hotKeyShare probe, then
    // matches plain on the unskewed corpus and salted at planted skew
    val (uMx, uN) = graft.operators.Scale.hotKeyShare(li, "l_orderkey")
    val (hMx, hN) = graft.operators.Scale.hotKeyShare(hotLi, "l_orderkey")
    println(f"gate probe: uniform hot-share $uMx/$uN (${
      100.0 * uMx / uN}%.2f%%), planted $hMx/$hN (${100.0 * hMx / hN}%.1f%%)")
    println(s"GATED unskewed:       ${fmt(
      graft.operators.Scale.skewGatedJoin(li, ord, "l_orderkey",
        "o_orderkey", salts = 32).select(cols.map(col): _*))}")
    println(s"GATED planted skew:   ${fmt(
      graft.operators.Scale.skewGatedJoin(hotLi, hotOrd, "l_orderkey",
        "o_orderkey", salts = 32).select(cols.map(col): _*))}")
    spark.stop()
  }
}
