package graft

import org.apache.spark.sql.functions._
import graft.functions.TextHash
import graft.llm.TextOps

class TextScoreSpec extends SparkSpec {
  import spark.implicits._

  private def refScore(text: String, dims: Int): (Long, Long) = {
    val toks = text.split("\\s+").filter(_.nonEmpty)
    val bigrams = toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
    val ws = bigrams.map { b =>
      val bucket = TextHash.fnv1a64(b) & (dims - 1)
      (bucket + 1L) * 2654435761L % 2001L - 1000L
    }
    (bigrams.size.toLong, ws.sum)
  }

  test("hashedLinearScore matches the per-bigram reference computation") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "to be or not to be that is the question"),
      (3L, "alpha beta")).toDF("doc_id", "text")
    val got = TextOps.hashedLinearScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    for ((id, text) <- Seq(1L -> "the quick brown fox jumps over the lazy dog",
        2L -> "to be or not to be that is the question", 3L -> "alpha beta"))
      assert(got(id) == refScore(text, 4096), s"doc $id")
  }

  test("documents with fewer than two tokens produce no score row") {
    val docs = Seq((1L, "single"), (2L, ""), (3L, "two tokens")).toDF("doc_id", "text")
    val ids = TextOps.hashedLinearScore(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(3L))
  }

  test("chunkDocs: overlap geometry, truncation, reconstruction") {
    val words = (1 to 150).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, words), (2L, "solo"), (3L, ""), (4L, "   "))
      .toDF("doc_id", "text")
    val chunks = TextOps.chunkDocs(docs, "doc_id", "text",
        chunkTokens = 64, overlap = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    // 150 tokens, step 48 -> starts 0, 48, 96, 144
    assert(chunks.keys.count(_._1 == 1L) == 4)
    val (s0, n0, t0) = chunks(1L -> 0L)
    assert(s0 == 0L && n0 == 64L && t0.startsWith("w1 w2 ") && t0.endsWith(" w64"))
    val (s3, n3, t3) = chunks(1L -> 3L)
    assert(s3 == 144L && n3 == 6L && t3 == (145 to 150).map("w" + _).mkString(" "))
    // consecutive chunks share exactly the 16-token overlap
    assert(chunks(1L -> 1L)._3.startsWith("w49 ") &&
      chunks(1L -> 0L)._3.endsWith("w49 w50 w51 w52 w53 w54 w55 w56 w57 w58 w59 w60 w61 w62 w63 w64"))
    // single-token doc -> one 1-token chunk; blank/empty docs emit nothing
    assert(chunks(2L -> 0L) == ((0L, 1L, "solo")))
    assert(!chunks.keys.exists(k => k._1 == 3L || k._1 == 4L))
    // non-overlap prefixes + last chunk reconstruct the original tokens
    val rebuilt = (0 to 2).map(k => chunks(1L -> k.toLong)._3.split(" ").take(48))
      .flatten ++ chunks(1L -> 3L)._3.split(" ")
    assert(rebuilt.mkString(" ") == words)
  }

  test("trainClassifierWeights: smoothed frequencies, and scores separate classes") {
    val docs = Seq(
      (1L, "good stuff here", 1L), (2L, "good stuff again", 1L),
      (3L, "bad stuff here", 0L), (4L, "bad stuff again", 0L)
    ).toDF("doc_id", "text", "y")
    val w = TextOps.trainClassifierWeights(docs, "text", "y")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def bucket(b: String) = TextHash.fnv1a64(b) & 4095L
    // "good stuff" occurs twice, all positive: (2+1)*1e6 DIV (2+2)
    assert(w(bucket("good stuff")) == 750000L)
    assert(w(bucket("bad stuff")) == 250000L)
    // compose through the serving seam: positives outscore negatives
    val weights = TextOps.trainClassifierWeights(docs, "text", "y")
    val scores = TextOps.hashedLinearScore(docs, "doc_id", "text",
        weights = Some(weights))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(Seq(1L, 2L).map(scores).min > Seq(3L, 4L).map(scores).max)
  }

  test("trained-weights seam: a broadcast (bucket, w) frame overrides the pseudo-model") {
    val docs = Seq((1L, "a b a b")).toDF("doc_id", "text")
    // buckets actually hit by this doc's bigrams ("a b", "b a", "a b")
    val hit = Seq("a b", "b a").map(b => TextHash.fnv1a64(b) & 4095L)
    val w = hit.map(b => (b, 7L)).toDF("bucket", "w")
    val r = TextOps.hashedLinearScore(docs, "doc_id", "text", weights = Some(w))
      .head()
    assert(r.getLong(1) == 3L && r.getLong(2) == 21L)
  }

  test("pruned model: absent buckets score 0, documents never vanish") {
    val docs = Seq((1L, "a b a b"), (2L, "x y")).toDF("doc_id", "text")
    // weights carry ONLY doc 1's "a b" bucket; doc 2's bucket and
    // doc 1's "b a" bucket are absent from the model
    val w = Seq((TextHash.fnv1a64("a b") & 4095L, 7L)).toDF("bucket", "w")
    val r = TextOps.hashedLinearScore(docs, "doc_id", "text", weights = Some(w))
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    // doc 1: 3 features ("a b" twice at w=7, "b a" once at w=0)
    assert(r(1L) == (3L, 14L))
    // doc 2: fully unmatched — still present, score 0
    assert(r(2L) == (1L, 0L))
  }
}
