package graft

/** Disposable diagnostics main for iterating on one operator — not
  * part of the driver contract; contents change round to round.
  * Currently: shuffle-partition sensitivity of the two small ANN/LM
  * frontier entries (r17 item 4) — does dropping the session shuffle
  * DOP for counter-sized candidate frames move the wall?
  */
object ScratchMain {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.1"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag: ${ts.map(t => f"$t%.2f").mkString("/")}")
    }
    val emb32 = emb.repartition(32, col("vec_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    emb32.count()
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    time("rerank p=8 raw-scan corpus")(graft.llm.SimilarityOps.ivfPqRerankTopK(
      emb, emb.filter(col("vec_id") < 20), "vec_id", "embedding", 5))
    time("rerank p=8 32-part cached corpus")(graft.llm.SimilarityOps.ivfPqRerankTopK(
      emb32, emb32.filter(col("vec_id") < 20), "vec_id", "embedding", 5))
    val emb4 = emb32.coalesce(4)
    time("rerank p=8 coalesce(4) of cached")(graft.llm.SimilarityOps.ivfPqRerankTopK(
      emb4, emb4.filter(col("vec_id") < 20), "vec_id", "embedding", 5))
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    time("rerank p=2 coalesce(4)")(graft.llm.SimilarityOps.ivfPqRerankTopK(
      emb4, emb4.filter(col("vec_id") < 20), "vec_id", "embedding", 5))
    spark.stop()
  }
}
