package graft.llm

import graft.functions.LlmFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (array<float>).
  *
  * Scale path: [[lshTopK]] buckets vectors by random-hyperplane LSH so
  * the pair space is per-bucket; [[bruteForceTopK]] is the exact
  * baseline (query-set × corpus, corpus side broadcast-friendly when
  * the query set is small, never corpus × corpus).
  */
object SimilarityOps {

  /** Exact integer dot product of two float vectors quantized with
    * floor(x*1000) — IEEE-identical across engines, used for
    * oracle-comparable ranking.
    */
  def quantizedDot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        floor(x.cast("double") * 1000).cast("long") *
          floor(y.cast("double") * 1000).cast("long")),
      lit(0L), (acc, v) => acc + v)

  /** Cosine similarity (double). */
  def cosine(a: Column, b: Column): Column = {
    def dot(u: Column, v: Column) =
      aggregate(zip_with(u, v, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Exact top-k neighbors of each query vector by `score` (a column
    * function of the two embedding columns), ranked descending with
    * id tie-break. Query set × corpus — the baseline ANN oracle.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, k: Int,
      score: (Column, Column) => Column = quantizedDot): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("q_emb"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(embCol).as("c_emb"))
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        score(col("q_emb"), col("c_emb")).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Bucketed approximate top-k via multi-table random-hyperplane LSH
    * (the standard L-tables construction): each of `tables` tables
    * hashes every vector into 2^planes buckets with an independent
    * hyperplane family; a pair is a candidate if it collides in ANY
    * table. Candidates are exact-cosine ranked.
    *
    * Expected candidate count per query is
    * tables * corpus / 2^planes-ish — tune planes up as the corpus
    * grows (e.g. 16 planes -> 65k buckets per table at billion-row
    * scale); the pair space never degenerates to a cross-join.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, k: Int, planes: Int = 6, tables: Int = 8): DataFrame = {
    def bucketsOf(df: DataFrame, idAs: String, embAs: String): DataFrame =
      df.select(col(idCol).as(idAs), col(embCol).as(embAs),
          explode(array((0 until tables).map(tbl =>
            struct(lit(tbl).as("tbl"),
              LlmFunctions.hyperplane_lsh(col(embCol), planes, tbl).as("bucket"))): _*)).as("h"))
        .select(col(idAs), col(embAs), col("h.tbl").as("tbl"), col("h.bucket").as("bucket"))
    val corpusB = bucketsOf(corpus, "neighbor_id", "c_emb")
    val queryB = bucketsOf(queries, "query_id", "q_emb")
    val cands = queryB.join(corpusB, Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id", "q_emb", "c_emb")
      .dropDuplicates("query_id", "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("q_emb"), col("c_emb")).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id").asc)
    cands.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
