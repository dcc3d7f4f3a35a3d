package graft
import graft.operators._
import org.apache.spark.sql.DataFrame
object DiffMain {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[16]").config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val norm = TraceEtl.normalize(graft.sources.SyntheticTraces.fromTpch(spark, "/root/testdata/sf0.01"))
    val (fTx, fC) = TraceEtl.split(TraceEtl.commitTraces(norm))
    val (rTx, rC) = TraceEtlRelational.transform(norm)
    def canon(df: DataFrame): Seq[String] = {
      val cols = df.columns.sorted
      df.selectExpr(cols.toIndexedSeq: _*).collect().map(_.toString).toSeq.sorted
    }
    val txEq = canon(fTx.toDF()) == canon(rTx)
    val cEq = canon(fC.toDF()) == canon(rC.drop("transaction_hash"))
    println(s"DIFF sf0.01: tx_equal=$txEq contracts_equal=$cEq tx_rows=${fTx.count()} c_rows=${fC.count()}")
    spark.stop()
  }
}
