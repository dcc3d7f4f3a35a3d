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

  /** IVF (inverted-file) approximate top-k: a deterministic coarse
    * quantizer — `nlist` corpus vectors chosen by id stride act as
    * centroids — partitions the corpus into cells; queries probe their
    * `nprobe` nearest cells and exact-rank only those cells' members.
    *
    * Scale shape: the centroid table is tiny and broadcast twice
    * (assignment pass + probe pass); the corpus shuffles once on
    * cell id; per-query work is nprobe/nlist of the corpus. Swap the
    * stride-sampled centroids for k-means output when quality matters —
    * the plan is identical.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val n = corpus.count()
    val stride = math.max(n / nlist, 1L)
    val centroids = corpus
      .filter(col(idCol) % stride === 0).limit(nlist)
      .select(col(idCol).as("cell"), col(embCol).as("centroid"))
    // assignment pass: each corpus vector -> nearest centroid
    val assigned = corpus.select(col(idCol).as("neighbor_id"), col(embCol).as("c_emb"))
      .crossJoin(broadcast(centroids))
      .select(col("neighbor_id"), col("c_emb"), col("cell"),
        cosine(col("c_emb"), col("centroid")).as("sim"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("neighbor_id").orderBy(col("sim").desc, col("cell").asc)))
      .filter(col("rn") === 1)
      .select("neighbor_id", "c_emb", "cell")
    // probe pass: each query -> its nprobe nearest cells
    val probes = queries.select(col(idCol).as("query_id"), col(embCol).as("q_emb"))
      .crossJoin(broadcast(centroids))
      .select(col("query_id"), col("q_emb"), col("cell"),
        cosine(col("q_emb"), col("centroid")).as("sim"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("sim").desc, col("cell").asc)))
      .filter(col("rn") <= nprobe)
      .select("query_id", "q_emb", "cell")
    // probe side is queries × nprobe — always the small side
    val cands = broadcast(probes).join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("q_emb"), col("c_emb")).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id").asc)
    cands.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
