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
}
