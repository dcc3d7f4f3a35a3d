package graft

import graft.llm.{DedupOps, Multimodal, SimilarityOps, TextOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class LlmSpec extends SparkSpec {

  private def docs: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private def emb: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  /** Corpus + a near-dup of every doc (last ~5% of chars cut) and an
    * exact dup of every 10th doc, with offset ids.
    */
  private def corpusWithDups: DataFrame = {
    val base = docs.select(col("doc_id"), col("text"))
    val nearDups = base
      .select((col("doc_id") + 100000).as("doc_id"),
        // drop the last two tokens -> shingle-jaccard stays ~0.95
        concat_ws(" ", slice(split(col("text"), " "), lit(1),
          greatest(size(split(col("text"), " ")) - 2, lit(1)))).as("text"))
    val exactDups = base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 200000).as("doc_id"), col("text"))
    base.unionByName(nearDups).unionByName(exactDups)
  }

  test("exact dedup finds planted exact duplicates") {
    val out = DedupOps.exactDedup(corpusWithDups, "doc_id", "text")
    val dupGroups = out.filter(col("n_dups") > 1).count()
    val planted = docs.filter(col("doc_id") % 10 === 0).count()
    // mutated docs can accidentally collide with each other, so allow
    // a small surplus over the planted count
    assert(dupGroups >= planted && dupGroups <= planted + 5,
      s"expected ~$planted dup groups, got $dupGroups")
    // keep_id is the original (minimum) id
    assert(out.filter(col("n_dups") > 1).filter(col("keep_id") >= 100000).count() == 0)
  }

  test("minhash-LSH near-dup: high recall on planted near-duplicates") {
    val corpus = corpusWithDups
    val found = DedupOps.nearDupPairs(corpus, "doc_id", "text", 0.7)
      .select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val nDocs = docs.count()
    // every (d, d+100000) pair is a true near-dup with shingle-jaccard ~0.9+
    val planted = docs.select("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(0) + 100000)).toSet
    val recall = planted.count(found.contains).toDouble / planted.size
    assert(recall >= 0.9, s"recall $recall over $nDocs docs; found ${found.size} pairs")
    // exact dups are found with jaccard exactly 1
    val exact = DedupOps.nearDupPairs(corpus, "doc_id", "text", 0.999)
      .filter(col("id2") >= 200000).count()
    assert(exact >= planted.size / 10 * 9 / 10)
  }

  test("arithmetic minhash-LSH: high recall on planted near-dups, no flood") {
    val corpus = corpusWithDups
    val found = DedupOps.minhashSignaturePairs(corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = docs.select("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(0) + 100000)).toSet
    val recall = planted.count(found.contains).toDouble / planted.size
    // 4 bands x 2 rows at shingle-jaccard ~0.95: P(candidate) ~ 1-(1-s^2)^4 > 0.99
    assert(recall >= 0.9, s"recall $recall; found ${found.size} pairs")
    // candidate set stays bucket-bounded, not an effective cross-join
    assert(found.size < 20L * planted.size,
      s"candidate flood: ${found.size} pairs for ${planted.size} planted")
    // exact dups collide on every band
    val exactPairs = found.count { case (a, b) => b - a == 200000 && a % 10 == 0 }
    assert(exactPairs >= planted.size / 10 * 9 / 10)
  }

  test("dedup clustering: transitive chains collapse to one canonical doc") {
    val corpus = corpusWithDups // base d, near-dup d+100000, exact dup d+200000 (d%10==0)
    val pairs = DedupOps.minhashSignaturePairs(corpus, "doc_id", "text")
    val clusters = DedupOps.dedupClusters(corpus, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every doc got a label; labels are cluster minima (self-consistent)
    assert(clusters.size == corpus.count())
    clusters.values.foreach(lab => assert(clusters(lab) == lab,
      s"non-canonical cluster id $lab"))
    // exact dup chains: base d, its near-dup, and its exact copy must
    // share one cluster whose canonical id is the base (minimum) id
    val bases = docs.filter(col("doc_id") % 10 === 0)
      .select("doc_id").collect().map(_.getLong(0))
    val merged = bases.count(d =>
      clusters(d + 200000) == clusters(d) && clusters(d) <= d)
    assert(merged >= bases.length * 9 / 10,
      s"only $merged/${bases.length} exact-dup chains merged")
    // canonical count == distinct clusters
    val canon = clusters.count { case (id, lab) => id == lab }
    assert(canon == clusters.values.toSet.size)
  }

  test("dedup clustering: empty input converges to an empty frame") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val pairs = Seq.empty[(Long, Long)].toDF("id1", "id2")
    assert(DedupOps.dedupClusters(empty, "doc_id", pairs).count() == 0)
  }

  test("dedup clustering: throws when the iteration cap truncates convergence") {
    import spark.implicits._
    // a 5-node path graph needs >1 round of min-label propagation;
    // maxIter=1 must fail loudly, not return multiple 'canonical' rows
    val docs = (1L to 5L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val pairs = (1L to 4L).map(i => (i, i + 1)).toDF("id1", "id2")
    val e = intercept[IllegalStateException] {
      DedupOps.dedupClusters(docs, "doc_id", pairs, maxIter = 1).count()
    }
    assert(e.getMessage.contains("did not converge"))
    // with room to converge, the path collapses to one cluster
    val ok = DedupOps.dedupClusters(docs, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ok.values.toSet == Set(1L))
  }

  test("cosine near-dup pairs: subset of brute-force threshold pairs, exact dups found") {
    import graft.llm.SimilarityOps
    // plant exact duplicates (cosine 1.0 -> identical sign pattern in
    // every table, so LSH recall on them is 1)
    val base = emb.select(col("vec_id"), col("embedding"))
    val corpus = base.unionByName(
      base.filter(col("vec_id") < 50)
        .select((col("vec_id") + 10000).as("vec_id"), col("embedding")))
    val found = SimilarityOps.cosineNearDupPairs(corpus, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every planted duplicate pair is recovered
    val planted = (0L until 50L).map(i => (i, i + 10000)).toSet
    val foundIds = found.map(t => (t._1, t._2)).toSet
    assert(planted.subsetOf(foundIds),
      s"missing planted dups: ${planted.diff(foundIds).take(3)}")
    // every emitted pair genuinely passes the exact integer threshold
    val qmap = corpus.select(col("vec_id"),
        transform(col("embedding"), x => floor(x.cast("double") * 1000).cast("long")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    found.foreach { case (a, b, dot) =>
      val (qa, qb) = (qmap(a), qmap(b))
      val exact = qa.zip(qb).map { case (x, y) => x * y }.sum
      assert(exact == dot, s"dot mismatch for ($a,$b)")
      val (na, nb) = (qa.map(x => x * x).sum, qb.map(x => x * x).sum)
      assert(dot > 0 && dot * dot * 100 >= 9 * na * nb, s"below threshold: ($a,$b)")
    }
  }

  test("simhash pairs: exact dups at hamming 0; pigeonhole bound enforced") {
    val corpus = corpusWithDups
    val pairs = DedupOps.simhashPairs(corpus, "doc_id", "text", 3)
    val zero = pairs.filter(col("hamming") === 0)
      .filter(col("id2") >= 200000).count()
    val planted = docs.filter(col("doc_id") % 10 === 0).count()
    assert(zero >= planted, s"expected >=$planted hamming-0 pairs, got $zero")
    intercept[IllegalArgumentException] {
      DedupOps.simhashPairs(corpus, "doc_id", "text", 10)
    }
  }

  test("lsh ANN: decent recall vs brute-force cosine top-5") {
    val queries = emb.filter(col("vec_id") < 20)
    val truth = SimilarityOps.bruteForceTopK(emb, queries, "vec_id", "embedding", 5,
        SimilarityOps.cosine)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // these synthetic embeddings are near-orthogonal random vectors, so
    // the "true" top-5 is barely above noise — use coarse buckets
    // (planes=4) and compare against the random-candidate baseline
    val approx = SimilarityOps.lshTopK(emb, queries, "vec_id", "embedding", 5,
        planes = 4, tables = 8)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.count(approx.contains).toDouble / truth.size
    assert(recall >= 0.4, s"recall@5 = $recall (truth=${truth.size}, approx=${approx.size})")
    info(s"LSH ANN recall@5 = $recall")
  }

  test("quantized dot matches a local reference computation") {
    import spark.implicits._
    val rows = emb.filter(col("vec_id") < 3)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().toMap
    val got = SimilarityOps.bruteForceTopK(
        emb.filter(col("vec_id") < 3), emb.filter(col("vec_id") === 0),
        "vec_id", "embedding", 2)
      .select("neighbor_id", "score").as[(Long, Long)].collect().toMap
    def refDot(a: Array[Float], b: Array[Float]): Long =
      a.zip(b).map { case (x, y) =>
        math.floor(x.toDouble * 1000).toLong * math.floor(y.toDouble * 1000).toLong
      }.sum
    for ((nid, score) <- got)
      assert(score == refDot(rows(0L), rows(nid)), s"neighbor $nid")
  }

  test("text ops: stats/quality/langid sane and deterministic") {
    val stats = TextOps.tokenStats(docs, "doc_id", "text")
    assert(stats.filter(col("n_tokens") =!= col("n_spaces") + 1).count() == 0)
    val lang = TextOps.langId(docs, "doc_id", "text")
    val langs = lang.select("predicted").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "es", "fr", "de", "zh")))
    val q = TextOps.qualityScore(docs, "doc_id", "text")
    assert(q.filter(col("stop_ratio_x1000") < 0 || col("stop_ratio_x1000") > 1000).count() == 0)
  }

  test("multimodal: stub decode produces 16-dim normalized features") {
    val feats = Multimodal.extractFeatures(Multimodal.packFromDocuments(docs)).collect()
    assert(feats.length == docs.count())
    assert(feats.forall(_.features.length == 16))
    // histogram is normalized: sums to ~1 for non-empty payloads
    assert(feats.forall(f => math.abs(f.features.sum - 1.0) < 1e-3))
    assert(feats.forall(f => Set("image", "audio", "video").contains(f.kind)))
  }
}
