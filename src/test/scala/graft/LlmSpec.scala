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

  test("line dedup: inter-doc common lines removed, intra-doc repeats and blanks kept") {
    import spark.implicits._
    val docs = Seq(
      (1L, "shared banner\nunique one\nshared banner\n\nbody a"),
      (2L, "shared banner\nunique two\nbody b"),
      (3L, "solo line\nsolo line\nanother solo")
    ).toDF("doc_id", "text")
    val out = DedupOps.lineDedup(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // doc 1: "shared banner" is in docs 1 AND 2 -> both its occurrences
    // in doc 1 go; the blank line is never treated as common
    assert(out(0).getLong(1) == 5 && out(0).getLong(2) == 2)
    assert(out(0).getString(3) == "unique one\n\nbody a")
    assert(out(1).getLong(1) == 3 && out(1).getLong(2) == 1)
    assert(out(1).getString(3) == "unique two\nbody b")
    // doc 3: "solo line" repeats only WITHIN the doc -> inter-doc
    // frequency is 1, nothing removed
    assert(out(2).getLong(2) == 0)
    assert(out(2).getString(3) == "solo line\nsolo line\nanother solo")
  }

  test("duplicated-substring spans: shared phrases merge to maximal spans") {
    import spark.implicits._
    // a 10-token phrase shared by docs 1 and 2 yields three overlapping
    // 8-shingles -> ONE merged span of 10 tokens in each carrier
    val phrase = "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10"
    val docs = Seq(
      (1L, s"a1 a2 a3 $phrase a4 a5 a6 a7 a8 a9 a10 a11"),
      (2L, s"b1 b2 $phrase b3 b4 b5 b6 b7 b8 b9 b10 b11 b12"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9"), // no shared shingle
      (4L, "short doc") // < n tokens: zero shingles, still reported
    ).toDF("doc_id", "text")
    val out = DedupOps.dupSpanStats(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getInt(1) == 21 && out(0).getLong(2) == 1 && out(0).getLong(3) == 10,
      s"doc1: ${out(0)}")
    assert(out(1).getInt(1) == 22 && out(1).getLong(2) == 1 && out(1).getLong(3) == 10,
      s"doc2: ${out(1)}")
    assert(out(2).getLong(2) == 0 && out(2).getLong(3) == 0)
    assert(out(3).getInt(1) == 2 && out(3).getLong(2) == 0 && out(3).getLong(3) == 0)
  }

  test("dup-span removal excises exactly the planted overlap and rejoins " +
      "the survivors") {
    import spark.implicits._
    val phrase = "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10"
    val docs = Seq(
      (1L, s"a1 a2 a3 $phrase a4 a5 a6 a7 a8 a9 a10 a11"),
      (2L, s"b1 b2 $phrase b3 b4 b5 b6 b7 b8 b9 b10 b11 b12"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9"),   // untouched
      (4L, "short doc"),                     // < n tokens: untouched
      (5L, phrase),                          // fully duplicated -> empty
      (6L, phrase)
    ).toDF("doc_id", "text")
    val out = DedupOps.dupSpanRemove(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // doc 1/2: the 10-token planted phrase is excised, flanks rejoin
    assert(out(0).getLong(1) == 21 && out(0).getLong(2) == 10
      && out(0).getString(3) == "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10 a11",
      s"doc1: ${out(0)}")
    assert(out(1).getString(3) == "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10 b11 b12",
      s"doc2: ${out(1)}")
    // no cross-doc shingle / too short -> text survives verbatim
    assert(out(2).getLong(2) == 0 && out(2).getString(3) == "c1 c2 c3 c4 c5 c6 c7 c8 c9")
    assert(out(3).getLong(2) == 0 && out(3).getString(3) == "short doc")
    // everything duplicated -> empty rewrite, full removal count
    assert(out(4).getLong(2) == 10 && out(4).getString(3) == "",
      s"doc5: ${out(4)}")
    // removal composes with the stats pass: removed == dup_tokens per doc
    val stats = DedupOps.dupSpanStats(docs, "doc_id", "text")
      .select("doc_id", "dup_tokens").as[(Long, Long)].collect().toMap
    out.foreach(r => assert(r.getLong(2) == stats(r.getLong(0)), r.toString))
  }

  test("duplicated-substring spans: disjoint shared regions stay separate islands") {
    import spark.implicits._
    val p = "x1 x2 x3 x4 x5 x6 x7 x8"   // exactly one shingle
    val q = "y1 y2 y3 y4 y5 y6 y7 y8"
    val docs = Seq(
      (1L, s"$p f1 f2 f3 f4 f5 f6 f7 f8 f9 $q"),
      (2L, s"$p g1 g2 g3 g4 g5 g6 g7 g8 g9 $q")
    ).toDF("doc_id", "text")
    val out = DedupOps.dupSpanStats(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // the filler gap (9 unique tokens > n) keeps the two spans apart
    assert(out(0).getLong(2) == 2 && out(0).getLong(3) == 16, s"doc1: ${out(0)}")
    assert(out(1).getLong(2) == 2 && out(1).getLong(3) == 16, s"doc2: ${out(1)}")
  }

  test("minhash estimate audit: exact duplicates read 1000/1000; estimate " +
      "matches a manual recompute from the signatures") {
    import spark.implicits._
    val audit = DedupOps.minhashEstimateAudit(corpusWithDups, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(audit.nonEmpty, "LSH must surface candidate pairs on this corpus")
    // every planted exact duplicate pair agrees on all 8 components
    // and has identical shingle sets
    val exactPairs = docs.select(col("doc_id")).as[Long].collect()
      .filter(_ % 10 == 0).map(id => (id, id + 200000L))
    for (p <- exactPairs; v <- audit.get(p))
      assert(v == ((1000L, 1000L)), s"exact dup pair $p read $v")
    // estimate column == component agreement recomputed from the
    // signature frame, for every emitted pair
    val sig = DedupOps.minhashSignature(corpusWithDups, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (1 to 8).map(r.getLong)).toMap
    for (((a, b), (est, _)) <- audit) {
      val m = sig(a).zip(sig(b)).count { case (x, y) => x == y }
      assert(est == m * 1000L / 8, s"pair ($a,$b): est $est vs recomputed $m/8")
    }
    // estimator sanity on planted near-dups long enough that the
    // 2-token cut leaves the shingle sets mostly intact: the EXACT
    // side stays high deterministically, and the 8-perm estimate is
    // unbiased in aggregate — individual pairs legitimately wobble at
    // k=8 (that variance is exactly what the audit makes measurable)
    val longDocs = docs.filter(size(split(col("text"), "\\s+")) >= 30)
      .select(col("doc_id")).as[Long].collect().toSet
    val nearAudited = docs.select(col("doc_id")).as[Long].collect()
      .filter(longDocs).map(id => (id, id + 100000L)).flatMap(audit.get)
    assert(nearAudited.nonEmpty)
    assert(nearAudited.forall { case (_, jacc) => jacc >= 400 })
    val meanEst = nearAudited.map(_._1).sum.toDouble / nearAudited.length
    val meanJacc = nearAudited.map(_._2).sum.toDouble / nearAudited.length
    assert(math.abs(meanEst - meanJacc) <= 150,
      s"estimator bias: mean est $meanEst vs mean exact $meanJacc")
  }

  test("weighted sample: top-k by the documented integer priority, " +
      "deterministic across partitionings") {
    import graft.llm.PipelineOps
    val df = docs.select(col("doc_id"), col("lang"), col("text"))
    val got = PipelineOps.weightedSample(df, "doc_id", "lang",
        octet_length(col("text")), 5)
      .select("doc_id", "lang", "smpl_pri", "smpl_rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // independent Scala recompute of the priority + per-stratum top-k
    val base = df.collect().map { r =>
      val id = r.getLong(0); val lang = r.getString(1)
      val bytes = r.getString(2).getBytes("UTF-8").length.toLong
      val u = ((id & 2147483647L) * 2654435761L) % 1000000007L
      val w = math.max(math.min(bytes, 1L << 20), 1L)
      (id, lang, (w * (1L << 33)) / (u + 1L))
    }
    val expect = base.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      rows.sortBy(r => (-r._3, r._1)).take(5).zipWithIndex
        .map { case ((id, l, pri), i) => (id, l, pri, i + 1L) }
    }.toSet
    assert(got.toSet == expect)
    assert(got.groupBy(_._2).values.forall(_.length <= 5))
    // partitioning invariance
    val again = PipelineOps.weightedSample(df.repartition(7), "doc_id", "lang",
        octet_length(col("text")), 5)
      .select("doc_id", "lang", "smpl_pri", "smpl_rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(again.toSet == got.toSet)
  }

  test("incremental near-dup: a batch of dups finds its corpus originals; " +
      "never corpus-side or batch-side internal pairs") {
    import spark.implicits._
    val base = docs.select(col("doc_id"), col("text"))
    val batch = corpusWithDups.filter(col("doc_id") >= 100000)
    val pairs = DedupOps.incrementalNearDupPairs(base, batch, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    // direction: batch ids on the left, corpus ids on the right — and
    // never a pair within one side
    assert(pairs.forall { case (b, c) => b >= 100000 && c < 100000 })
    // every planted EXACT duplicate must find its original (identical
    // signatures always share every band)
    val exactIds = docs.select(col("doc_id")).as[Long].collect()
      .filter(_ % 10 == 0)
    val found = pairs.toSet
    assert(exactIds.forall(id => found((id + 200000L, id))),
      "an exact duplicate missed its corpus original")
    // near-dups: banding recall on ~0.9 Jaccard pairs stays high
    val nearIds = docs.select(col("doc_id")).as[Long].collect()
    val nearHits = nearIds.count(id => found((id + 100000L, id)))
    assert(nearHits.toDouble / nearIds.length >= 0.9,
      s"incremental banding recall ${nearHits.toDouble / nearIds.length}")
    // parity with the symmetric pair set: batch×corpus pairs from the
    // union-corpus banding restricted to cross-side == incremental
    val sym = DedupOps.minhashSignaturePairs(
        base.unionByName(batch), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => (a < 100000) != (b < 100000) }
      .map { case (a, b) => if (a >= 100000) (a, b) else (b, a) }.toSet
    assert(found == sym)
  }

  test("edit-verify tier: exact dups at distance 0; decision column is " +
      "the documented integer rule; permille 0 keeps only exact") {
    val out = DedupOps.editVerifiedPairs(corpusWithDups, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getInt(4))).toMap
    assert(out.nonEmpty)
    import spark.implicits._
    val exactPairs = docs.select(col("doc_id")).as[Long].collect()
      .filter(_ % 10 == 0).map(id => (id, id + 200000L))
    val exactAudited = exactPairs.flatMap(out.get)
    assert(exactAudited.nonEmpty)
    assert(exactAudited.forall { case (d, _, keep) => d == 0L && keep == 1 })
    // the keep decision is exactly dist*1000 <= maxLen*200 on every pair
    for (((_, _), (d, ml, keep)) <- out)
      assert((keep == 1) == (d * 1000 <= ml * 200))
    // permille 0: only exact duplicates survive as dups
    val strict = DedupOps.editVerifiedPairs(corpusWithDups, "doc_id", "text",
        maxDistPermille = 0)
      .collect().map(r => (r.getLong(2), r.getInt(4)))
    assert(strict.forall { case (d, keep) => (keep == 1) == (d == 0L) })
  }

  test("calibrate by source: permille percentile ranks match an " +
      "independent recompute; singleton stratum ranks 0") {
    import graft.llm.PipelineOps
    val base = docs.select(col("doc_id"), col("source"), col("text"))
      // plant a singleton stratum
      .unionByName(spark.createDataFrame(Seq((900001L, "solo", "one doc")))
        .toDF("doc_id", "source", "text"))
    val got = PipelineOps.calibrateBySource(base, "doc_id", "source",
        size(filter(split(col("text"), "\\s+"), t => length(t) > 0)).cast("long"))
      .select("doc_id", "source", "cal_score", "pr_milli")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val bySource = got.groupBy(_._2)
    for ((_, rows) <- bySource) {
      val sorted = rows.sortBy(r => (r._3, r._1))
      val n = sorted.length
      for ((r, i) <- sorted.zipWithIndex) {
        val expect =
          if (n == 1) 0L
          else math.floor(i.toDouble / (n - 1) * 1000).toLong
        assert(r._4 == expect, s"row $r expected pr_milli $expect")
      }
    }
    assert(got.count(_._2 == "solo") == 1)
    assert(got.find(_._2 == "solo").get._4 == 0L)
  }

  test("weighted sample: NULL weight degrades to the MINIMUM weight, " +
      "never the clamp ceiling") {
    import graft.llm.PipelineOps
    // one stratum, two rows: a null-weighted row and a mid-weight row;
    // least()/greatest() skip nulls, so without the coalesce the null
    // row would clamp to 2^20 and outrank everything
    val df = spark.createDataFrame(Seq(
        (1L, "s", Some(500L)), (2L, "s", Option.empty[Long])))
      .toDF("doc_id", "stratum", "w")
    val out = PipelineOps.weightedSample(df, "doc_id", "stratum", col("w"), 2)
      .select("doc_id", "smpl_pri").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def pri(id: Long, w: Long): Long = {
      val u = ((id & 2147483647L) * 2654435761L) % 1000000007L
      (w * (1L << 33)) / (u + 1L)
    }
    assert(out(1L) == pri(1L, 500L))
    assert(out(2L) == pri(2L, 1L), "null weight must price as weight 1")
  }

  test("tf-idf top-k: rare terms outrank common ones, exact fixed point") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the the the rare1 common common"),
      (2L, "the common zebra zebra"),
      (3L, "the common common")
    ).toDF("doc_id", "text")
    val out = TextOps.tfidfTopK(docs, "doc_id", "text", 2)
      .orderBy("doc_id", "rnk").collect()
    // idf_x1e6: corpus-wide terms (the/common) = 1e6, singletons = 3e6
    val d1 = out.filter(_.getLong(0) == 1L)
    assert(d1(0).getString(1) == "rare1" && d1(0).getLong(3) == 3000000L,
      s"doc1 top: ${d1.mkString(";")}")
    // tie at 3e6 between rare1 (tf 1 x idf 3e6) and the (tf 3 x idf 1e6)
    // breaks by term asc
    assert(d1(1).getString(1) == "the" && d1(1).getLong(3) == 3000000L)
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2(0).getString(1) == "zebra" && d2(0).getLong(3) == 6000000L,
      s"doc2 top: ${d2.mkString(";")}")
  }

  test("temperature mix: sqrt-proportional budgets flatten the head, exact isqrt") {
    import spark.implicits._
    val ten = "t t t t t t t t t t" // 10 tokens
    val corpus = ((1L to 40L).map(i => (i, ten, "A")) ++
      (101L to 110L).map(i => (i, ten, "B"))).toDF("doc_id", "text", "source")
    // tokens: A=400, B=100 -> w=20,10 -> budgets 300*20/30=200, 100
    val out = graft.llm.PipelineOps.temperatureMix(corpus, "doc_id", "text", "source", 300L)
      .collect()
    val aRows = out.filter(_.getString(1) == "A")
    val bRows = out.filter(_.getString(1) == "B")
    assert(aRows.forall(_.getLong(4) == 200L) && bRows.forall(_.getLong(4) == 100L),
      s"budgets: ${out.map(r => (r.getString(1), r.getLong(4))).distinct.mkString(";")}")
    // A keeps exactly budget/10 docs, B keeps everything: the head's
    // 80% corpus share flattens to 2/3 of the budget
    assert(aRows.length == 20 && bRows.length == 10, s"${aRows.length}/${bRows.length}")
    assert(aRows.forall(_.getLong(3) <= 200L))
    // isqrt exactness at the boundary: 99 vs 100 tokens -> w=9 vs 10
    val edge = ((1L to 9L).map(i => (i, ten + " t", "C")) ++      // 9x11 = 99
      (101L to 110L).map(i => (i, ten, "D"))).toDF("doc_id", "text", "source")
    val eb = graft.llm.PipelineOps.temperatureMix(edge, "doc_id", "text", "source", 100L)
      .select("source", "budget").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // w_sum=19: C -> 100*9 div 19 = 47, D -> 100*10 div 19 = 52
    assert(eb("C") == 47L && eb("D") == 52L, s"edge budgets: $eb")
  }

  test("shard plan: greedy token packing, boundary doc stays in its starting shard; writeShards round-trips") {
    import spark.implicits._
    import graft.llm.PipelineOps
    val ten = "t t t t t t t t t t"
    val corpus = ((1L to 25L).map(i => (i, ten, "A")) ++
      (101L to 103L).map(i => (i, ten, "B"))).toDF("doc_id", "text", "source")
    val plan = PipelineOps.shardPlan(corpus, "doc_id", "text", "source", 100L)
    val rows = plan.collect()
    // A: 250 tokens / 100-token shards -> docs at starting offsets
    // 0..90 -> shard 0, 100..190 -> shard 1, 200..240 -> shard 2
    val aShards = rows.filter(_.getString(1) == "A").map(_.getLong(4))
    assert(aShards.distinct.sorted.sameElements(Array(0L, 1L, 2L)), aShards.mkString(","))
    assert(aShards.count(_ == 0L) == 10 && aShards.count(_ == 1L) == 10
      && aShards.count(_ == 2L) == 5)
    // every doc's shard is its starting offset's shard
    assert(rows.forall(r => r.getLong(4) == (r.getLong(3) - r.getLong(2)) / 100L))
    // B: 30 tokens -> one shard
    assert(rows.filter(_.getString(1) == "B").forall(_.getLong(4) == 0L))
    val out = java.nio.file.Files.createTempDirectory("graft_shards").toString
    val manifest = PipelineOps.writeShards(corpus, "doc_id", "text", "source", 100L, out)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(manifest(("A", 0L)) == ((10L, 100L)) && manifest(("A", 2L)) == ((5L, 50L))
      && manifest(("B", 0L)) == ((3L, 30L)), manifest.toString)
    // the written layout is addressable per (source, shard) and complete
    val back = spark.read.parquet(out)
    assert(back.count() == 28
      && back.filter(col("source") === "A" && col("shard_id") === 2).count() == 5)
    assert(new java.io.File(s"$out/source=A/shard_id=1").isDirectory)
  }

  test("curation pipeline e2e: benchmark never leaks, gates compose, mix stays in budget") {
    import graft.llm.PipelineOps
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = PipelineOps.curationPipeline(docs, "doc_id", "text", "source",
      col("doc_id") % 50 === 0, 6000L).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(0) % 50 != 0), "benchmark slice leaked into the mix")
    assert(out.forall(r => r.getLong(3) <= r.getLong(4)), "prefix cut exceeded budget")
    val budgets = out.map(r => r.getString(1) -> r.getLong(4)).distinct
    assert(budgets.map(_._2).sum <= 6000L, budgets.mkString(";"))
    // survivors are a strict subset: the gates really dropped something
    assert(out.length < docs.count())
  }

  test("new text ops tolerate empty, whitespace-only, and unicode documents") {
    import spark.implicits._
    import graft.llm.{DedupOps, PipelineOps}
    val d = Seq(
      (1L, "", "A"), (2L, "   ", "A"),
      (3L, "héllo wörld héllo wörld héllo wörld", "B"),
      (4L, "normal text with several plain tokens here", "B"),
    ).toDF("doc_id", "text", "source")
    // dup spans: no doc shares a cross-doc shingle -> zero spans, no crash
    val spans = DedupOps.dupSpanStats(d, "doc_id", "text", 3, 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(spans.size == 4 && spans.values.forall(_ == ((0L, 0L))), spans.toString)
    // line dedup: nothing common -> every doc keeps its text verbatim
    val kept = DedupOps.lineDedup(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(kept.values.forall(_._1 == 0L)
      && kept(3L)._2 == "héllo wörld héllo wörld héllo wörld"
      && kept(2L)._2 == "   ", kept.toString)
    // pii redact: unicode and blank text pass through untouched
    val red = PipelineOps.piiRedact(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(red(1L) == "" && red(2L) == "   "
      && red(3L) == "héllo wörld héllo wörld héllo wörld")
    // temperature mix: empty docs still count their split-token ("")
    // tokens, budgets stay positive, no division blowups
    val mix = PipelineOps.temperatureMix(d, "doc_id", "text", "source", 10L)
      .select("source", "budget").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mix.values.forall(_ >= 0L) && mix.values.sum <= 10L, mix.toString)
  }

  test("cluster sample: per-cell quota, full assignment, trained-centroid seam") {
    import spark.implicits._
    val out = SimilarityOps.clusterSample(emb, "vec_id", "embedding", 5)
      .collect()
    // quota bound per cell
    val perCell = out.groupBy(_.getLong(1)).view.mapValues(_.length)
    assert(perCell.values.forall(_ <= 5), s"over-quota cells: $perCell")
    // ranks within a cell are 1..n without gaps
    perCell.keys.foreach { c =>
      val rnks = out.filter(_.getLong(1) == c).map(_.getInt(2)).sorted
      assert(rnks.sameElements(1 to rnks.length), s"cell $c ranks: ${rnks.toSeq}")
    }
    // deterministic
    val again = SimilarityOps.clusterSample(emb, "vec_id", "embedding", 5)
      .collect()
    assert(out.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
    // two orthogonal planted clusters + their own centroids: the
    // sample draws the quota from BOTH (uniform sampling of this
    // 90/10 mix need not)
    val dims = 4
    val mk = (base: Array[Float], ids: Seq[Long]) =>
      ids.map(i => (i, base.zipWithIndex.map { case (v, j) =>
        v + (if (j == dims - 1) i.toFloat / 1000f else 0f) }))
    val a = Array(1f, 0f, 0f, 0f); val b = Array(0f, 1f, 0f, 0f)
    val two = (mk(a, 1L to 90L) ++ mk(b, 1000L to 1009L)).toDF("vec_id", "embedding")
    val cents = Seq((0L, a.toSeq), (1L, b.toSeq)).toDF("cell", "centroid")
    val bal = SimilarityOps.clusterSample(two, "vec_id", "embedding", 3,
      centroids = Some(cents)).collect()
    assert(bal.count(_.getLong(1) == 0L) == 3 && bal.count(_.getLong(1) == 1L) == 3,
      s"unbalanced: ${bal.mkString(";")}")
    assert(bal.filter(_.getLong(1) == 1L).forall(_.getLong(0) >= 1000L))
  }

  test("bloom membership: no false negatives, low FPR, determinism") {
    import spark.implicits._
    val mk = (ids: Seq[Long]) =>
      ids.map(i => (i, i * 0x9E3779B97F4A7C15L)).toDF("doc_id", "fp")
    val build = mk(1L to 100L)
    val shared = mk(1L to 50L)
    val fresh = mk(100000L to 101000L)
    val onShared = graft.llm.PipelineOps.bloomMembership(build, shared, "doc_id", "fp")
      .collect()
    // every key actually inserted must probe as a member with all 4 bits
    assert(onShared.forall(r => r.getInt(1) == 4 && r.getInt(2) == 1),
      s"false negative: ${onShared.filter(_.getInt(2) == 0).mkString(";")}")
    // disjoint keys: false positives exist by design but stay rare
    // (m=65536, k=4, n=100 inserted -> FPR ~ (400/65536)^4, essentially 0)
    val fpCount = graft.llm.PipelineOps.bloomMembership(build, fresh, "doc_id", "fp")
      .filter(col("member") === 1).count()
    assert(fpCount < 50, s"implausible false-positive count $fpCount/1001")
    // deterministic across runs
    val again = graft.llm.PipelineOps.bloomMembership(build, shared, "doc_id", "fp")
      .collect()
    assert(onShared.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("bm25 top-k: tf saturation flips the tf-idf order, exact fixed point") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a a b"),
      (2L, "a c")
    ).toDF("doc_id", "text")
    // N=2 T=7; idf_x: a=1000, b=c=2000
    // score_x = (idf_x*tf*22*T) div (10*T*tf + 3*T + 9*dl*N)
    val bm = TextOps.bm25TopK(docs, "doc_id", "text", 2)
      .orderBy("doc_id", "rnk").collect()
    val d1 = bm.filter(_.getLong(0) == 1L)
    // saturated tf=4 'a' (616000 div 391 = 1575) loses to singleton
    // 'b' (308000 div 181 = 1701)...
    assert(d1(0).getString(1) == "b" && d1(0).getLong(3) == 1701L,
      s"doc1 top: ${d1.mkString(";")}")
    assert(d1(1).getString(1) == "a" && d1(1).getLong(3) == 1575L)
    // ...whereas unsaturated tf-idf ranks 'a' (4e6) over 'b' (2e6)
    val ti = TextOps.tfidfTopK(docs, "doc_id", "text", 1)
      .filter(col("doc_id") === 1L).collect()
    assert(ti(0).getString(1) == "a")
    val d2 = bm.filter(_.getLong(0) == 2L)
    assert(d2(0).getString(1) == "c" && d2(0).getLong(3) == 2425L,
      s"doc2 top: ${d2.mkString(";")}")
  }

  test("token-budget mix: budget bound, prefix monotonicity, determinism") {
    val mix = (b: Long) => graft.llm.PipelineOps.tokenBudgetMix(
      docs, "doc_id", "text", "source", lit(b))
    val small = mix(500L)
    // per-source kept tokens never exceed the budget
    val over = small.groupBy("source").agg(sum(col("n_tokens")).as("s"))
      .filter(col("s") > 500).count()
    assert(over == 0)
    // deterministic across runs
    assert(small.collect().toSet == mix(500L).collect().toSet)
    // a larger budget keeps a superset (prefix cut, no back-fill)
    val smallIds = small.select("doc_id").collect().map(_.getLong(0)).toSet
    val bigIds = mix(2000L).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(smallIds.subsetOf(bigIds), s"${smallIds.size} !<= ${bigIds.size}")
    // an unbounded budget keeps everything
    assert(mix(Long.MaxValue).count() == docs.count())
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

  test("dedup clustering: large-star/small-star matches the min-label reference") {
    import spark.implicits._
    def labelsOf(df: DataFrame): Map[Long, (Long, Int)] =
      df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    // adversarial shapes for the round counts: a long path (diameter
    // 30 — the min-label worst case), a star, two merged triangles,
    // and singletons with no edges at all
    val docs = (1L to 60L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val path = (1L until 30L).map(i => (i, i + 1))
    val star = (32L to 40L).map(i => (31L, i))
    val tris = Seq((41L, 42L), (42L, 43L), (43L, 41L), (43L, 44L),
      (44L, 45L), (45L, 43L))
    val pairs = (path ++ star ++ tris).toDF("id1", "id2")
    // localEdgeMax = 0 forces the distributed contraction; the default
    // gate takes the driver union-find — all three must agree exactly
    val viaStars =
      labelsOf(DedupOps.dedupClusters(docs, "doc_id", pairs, localEdgeMax = 0))
    val viaLocal = labelsOf(DedupOps.dedupClusters(docs, "doc_id", pairs))
    val viaMinLabel = labelsOf(DedupOps.dedupClustersMinLabel(docs, "doc_id", pairs, 40))
    assert(viaStars == viaMinLabel)
    assert(viaLocal == viaStars)
    // and the expected shape: path collapses to 1, star to 31, tris to 41
    assert(viaStars(30L) == ((1L, 0)) && viaStars(40L) == ((31L, 0)) &&
      viaStars(45L) == ((41L, 0)) && viaStars(60L) == ((60L, 1)))
    // the real corpus: identical clustering from all three plans
    val corpus = corpusWithDups
    val cands = DedupOps.minhashSignaturePairs(corpus, "doc_id", "text")
      .localCheckpoint()
    val corpusLocal = labelsOf(DedupOps.dedupClusters(corpus, "doc_id", cands))
    assert(corpusLocal ==
      labelsOf(DedupOps.dedupClusters(corpus, "doc_id", cands, localEdgeMax = 0)))
    assert(corpusLocal ==
      labelsOf(DedupOps.dedupClustersMinLabel(corpus, "doc_id", cands)))
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
      // force the distributed loop — the driver union-find never iterates
      DedupOps.dedupClusters(docs, "doc_id", pairs, maxIter = 1, localEdgeMax = 0)
        .count()
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

  test("dsir scores: target-like documents outrank off-distribution ones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"),          // target
      (2L, "alpha beta gamma epsilon"),        // target
      (100L, "alpha beta gamma delta"),        // candidate: target profile
      (101L, "zeta eta theta iota"),           // candidate: disjoint vocab
      (102L, "alpha beta zeta eta"),           // candidate: half-overlap
      (103L, "filler words filler words"),     // raw mass
      (104L, "more filler content here")
    ).toDF("doc_id", "text")
    val out = graft.llm.PipelineOps.dsirScores(
        docs, "doc_id", "text", col("doc_id") < 10)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(out.size == 7)
    // 4 tokens -> 4 unigrams + 3 bigrams
    assert(out(100L)._1 == 7, s"n_features: ${out(100L)}")
    val (full, none, half) = (out(100L)._2, out(101L)._2, out(102L)._2)
    assert(full > half && half > none,
      s"target-likeness must order scores: full=$full half=$half none=$none")
    // deterministic: identical profile docs score identically
    assert(out(1L)._2 == out(100L)._2)
  }

  test("c4 stats: planted pages exercise every cleaning rule") {
    import spark.implicits._
    val docs = Seq(
      // clean page: 3 retained lines, 6 sentences -> kept
      (1L, "This is a good first line. It really is.\n" +
        "Here is another proper sentence! And one more?\n" +
        "The final line also ends with punctuation. Twice over."),
      // short lines (< 3 words) are dropped even with punctuation;
      // remaining sentences < 5 -> not kept
      (2L, "Too short.\nNo!\nA longer line that does end properly."),
      // lorem ipsum anywhere kills the page (case-folded)
      (3L, "Lorem Ipsum dolor sit amet. A fine sentence here. More words follow now.\n" +
        "Another full line with punctuation. And again. Plus one more!"),
      // curly brace kills the page
      (4L, "A sentence with code follows. function() { return. }\n" +
        "Other perfectly good sentences. Here too. And here. And more!"),
      // javascript line flagged
      (5L, "Please enable JavaScript to view this page.\n" +
        "Real content sentence one. Two here. Three now. Four next. Five last."),
      // no terminal punctuation at all -> zero kept lines
      (6L, "word soup with no punctuation\nmore words here")
    ).toDF("doc_id", "text")
    val out = graft.llm.TextOps.c4Stats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    def f(id: Long, c: String): Int = out(id).getAs[Int](c)
    assert(f(1, "n_kept_lines") == 3 && f(1, "n_sentences_kept") == 6 &&
      f(1, "kept") == 1, s"clean page should keep: ${out(1L)}")
    assert(f(2, "n_kept_lines") == 1 && f(2, "kept") == 0,
      s"short lines must drop: ${out(2L)}")
    assert(f(3, "has_lorem_ipsum") == 1 && f(3, "kept") == 0,
      s"lorem ipsum must flag: ${out(3L)}")
    assert(f(4, "has_curly") == 1 && f(4, "kept") == 0,
      s"curly must flag: ${out(4L)}")
    assert(f(5, "n_javascript_lines") == 1 && f(5, "n_sentences_kept") >= 5 &&
      f(5, "kept") == 0, s"javascript line must flag: ${out(5L)}")
    assert(f(6, "n_kept_lines") == 0 && f(6, "n_sentences_kept") == 0 &&
      f(6, "kept") == 0, s"punctuation-free page keeps nothing: ${out(6L)}")
  }

  test("semantic dedup: planted duplicate groups collapse to one canonical member") {
    import graft.llm.SimilarityOps
    // two extra exact copies of each of the first 20 vectors: each
    // group of 3 must land in ONE cluster whose canonical is the
    // original (min id); everything else keeps itself
    val base = emb.select(col("vec_id"), col("embedding"))
    val corpus = base
      .unionByName(base.filter(col("vec_id") < 20)
        .select((col("vec_id") + 10000).as("vec_id"), col("embedding")))
      .unionByName(base.filter(col("vec_id") < 20)
        .select((col("vec_id") + 20000).as("vec_id"), col("embedding")))
    val out = SimilarityOps.semanticDedup(corpus, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(out.size == corpus.count())
    (0L until 20L).foreach { i =>
      // the original may itself near-dup a lower-id NATURAL neighbor
      // (the synthetic corpus has organic pairs at the 0.3 default
      // threshold), so the pinned property is co-membership: each
      // copy rides its original's cluster, and — copies having the
      // largest ids — a copy is never the canonical representative
      assert(out(i + 10000)._1 == out(i)._1 && out(i + 10000)._2 == 0,
        s"copy ${i + 10000} not clustered with $i: ${out(i + 10000)}")
      assert(out(i + 20000)._1 == out(i)._1 && out(i + 20000)._2 == 0,
        s"copy ${i + 20000} not clustered with $i: ${out(i + 20000)}")
      assert(out(i)._1 <= i, s"cluster id above member id: $i -> ${out(i)}")
    }
    // the deduplicated corpus = one row per cluster
    val canon = out.filter(_._2._2 == 1)
    assert(canon.size == out.values.map(_._1).toSet.size,
      "canonical count != cluster count")
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

  test("filteredTopK gate flip: exact brute force below the gate, IVF " +
      "above it, and full-probe IVF degenerates to the exact answer") {
    val S = SimilarityOps
    val queries = emb.filter(col("vec_id") < 10)
    val pred = col("label") % 3 =!= 0
    val filtered = emb.filter(pred)
    def canon(df: DataFrame): Seq[String] =
      df.select("query_id", "neighbor_id", "score", "rank")
        .collect().map(_.toString).toSeq.sorted
    val brute = canon(S.bruteForceTopK(filtered, queries, "vec_id",
      "embedding", 5, S.quantizedCosineX1e6))
    // gate above |filtered|: the brute path, byte-equal to calling the
    // exact operator on the pre-filtered corpus
    val high = canon(S.filteredTopK(emb, queries, "vec_id", "embedding", 5,
      pred, score = S.quantizedCosineX1e6, bruteGateRows = 1000000L))
    assert(high == brute, "above-gate path must be the exact filtered answer")
    // gate 0: the IVF path, byte-equal to ivfTopK over the filtered set
    val ivfDirect = canon(S.ivfTopK(filtered, queries, "vec_id", "embedding",
      5, nlist = 8, nprobe = 2, score = S.quantizedCosineX1e6))
    val low = canon(S.filteredTopK(emb, queries, "vec_id", "embedding", 5,
      pred, nlist = 8, nprobe = 2, score = S.quantizedCosineX1e6,
      bruteGateRows = 0L))
    assert(low == ivfDirect, "below-gate path must be the IVF probe")
    assert(low != brute,
      "nprobe=2 IVF must differ from exact brute force here — otherwise " +
        "the flip is unobservable and this differential proves nothing")
    // nprobe = nlist: every query probes every cell, so the candidate
    // set is the whole filtered corpus and IVF == exact
    val full = canon(S.filteredTopK(emb, queries, "vec_id", "embedding", 5,
      pred, nlist = 8, nprobe = 8, score = S.quantizedCosineX1e6,
      bruteGateRows = 0L))
    assert(full == brute, "full-probe IVF must equal exact brute force")
  }

  test("filteredTopK: a predicate matching nothing returns empty (the " +
      "gate count is 0, the brute path over the empty set)") {
    val out = SimilarityOps.filteredTopK(emb, emb.filter(col("vec_id") < 5),
      "vec_id", "embedding", 3, col("label") > 1000)
    assert(out.isEmpty)
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

  test("portable simhash pairs: exact dups at hamming 0; matches local reference") {
    import spark.implicits._
    val corpus = corpusWithDups
    val pairs = DedupOps.simhashPortablePairs(corpus, "doc_id", "text", 3)
    val zero = pairs.filter(col("hamming") === 0)
      .filter(col("id2") >= 200000).count()
    val planted = docs.filter(col("doc_id") % 10 === 0).count()
    assert(zero >= planted, s"expected >=$planted hamming-0 pairs, got $zero")
    // signature matches an independent Scala computation of the same
    // arithmetic (two mod-prime token fps, per-bit majority vote)
    def refSig(text: String): Long = {
      val M = DedupOps.FingerprintMod
      val toks = text.split("\\s+").filter(_.nonEmpty)
      def fps(mult: Long) =
        toks.map(t => t.foldLeft(0L)((acc, c) => (acc * mult + c.toInt) % M))
      val (f31, f37) = (fps(31), fps(37))
      ((0 until 30).map { b =>
        val vote = f31.map(f => if (((f >> b) & 1L) == 1L) 1 else -1).sum
        if (vote > 0) 1L << b else 0L
      } ++ (0 until 30).map { b =>
        val vote = f37.map(f => if (((f >> b) & 1L) == 1L) 1 else -1).sum
        if (vote > 0) 1L << (b + 30) else 0L
      }).sum
    }
    val got = docs.filter(col("doc_id") < 5)
      .select(col("doc_id"), DedupOps.portableSimhashSig(col("text")).as("sig"))
      .as[(Long, Long)].collect().toMap
    val txts = docs.filter(col("doc_id") < 5)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    for ((id, sig) <- got) assert(sig == refSig(txts(id)), s"doc $id")
  }

  test("portable fingerprint matches local winnowing reference; stable on dups") {
    import spark.implicits._
    def refFp(text: String, w: Int = 8): Long = {
      val M = DedupOps.FingerprintMod
      def h(s: String): Long = s.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % M)
      if (text.isEmpty) 0L
      else if (text.length < w) h(text)
      else (0 to text.length - w).map(i => h(text.substring(i, i + w))).min
    }
    val got = docs.filter(col("doc_id") < 10)
      .select(col("doc_id"), DedupOps.portableFingerprint(col("text")).as("fp"))
      .as[(Long, Long)].collect().toMap
    val txts = docs.filter(col("doc_id") < 10)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    for ((id, fp) <- got) assert(fp == refFp(txts(id)), s"doc $id")
    // exact dups share the fingerprint
    val joined = corpusWithDups.filter(col("doc_id") % 10 === 0 || col("doc_id") >= 200000)
      .select(col("doc_id"), DedupOps.portableFingerprint(col("text")).as("fp"))
    val byFp = joined.filter(col("doc_id") >= 200000).as("d")
      .join(joined.filter(col("doc_id") < 100000).as("o"),
        col("d.doc_id") === col("o.doc_id") + 200000)
      .filter(col("d.fp") =!= col("o.fp")).count()
    assert(byFp == 0, "exact dup changed the winnowing fingerprint")
  }

  test("quantized cosine score: matches reference and ranks like float cosine top-1") {
    import spark.implicits._
    val vecs = emb.filter(col("vec_id") < 5)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().toMap
    val got = SimilarityOps.bruteForceTopK(
        emb.filter(col("vec_id") < 5), emb.filter(col("vec_id") === 1),
        "vec_id", "embedding", 4, SimilarityOps.quantizedCosineX1e6)
      .select("neighbor_id", "score").as[(Long, Long)].collect().toMap
    def q(a: Array[Float]) = a.map(x => math.floor(x.toDouble * 1000).toLong)
    def ref(a: Array[Float], b: Array[Float]): Long = {
      val (qa, qb) = (q(a), q(b))
      val dot = qa.zip(qb).map { case (x, y) => x * y }.sum
      val (na, nb) = (qa.map(x => x * x).sum, qb.map(x => x * x).sum)
      if (na == 0 || nb == 0) 0L
      else math.floor(dot.toDouble * 1e6 / math.sqrt((na * nb).toDouble)).toLong
    }
    for ((nid, score) <- got)
      assert(score == ref(vecs(1L), vecs(nid)), s"neighbor $nid")
    // quantization at 1e-3 of unit-ish vectors preserves the float top-1
    val floatTop = SimilarityOps.bruteForceTopK(
        emb, emb.filter(col("vec_id") === 1), "vec_id", "embedding", 1,
        SimilarityOps.cosine)
      .select("neighbor_id").as[Long].head()
    val quantTop = SimilarityOps.bruteForceTopK(
        emb, emb.filter(col("vec_id") === 1), "vec_id", "embedding", 1,
        SimilarityOps.quantizedCosineX1e6)
      .select("neighbor_id").as[Long].head()
    assert(floatTop == quantTop)
  }

  test("pre-quantized brute-force top-k == generic formulation with quantized score") {
    val queries = emb.filter(col("vec_id") < 10)
    val a = SimilarityOps.bruteForceTopKPortable(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id", "score_x1e6", "rank")
      .collect().map(_.toString).sorted
    val b = SimilarityOps.bruteForceTopK(emb, queries, "vec_id", "embedding", 5,
        SimilarityOps.quantizedCosineX1e6)
      .select(col("query_id"), col("neighbor_id"), col("score").as("score_x1e6"), col("rank"))
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("portable lsh top-k: candidates bucket-bounded, scores exact, decent recall") {
    val queries = emb.filter(col("vec_id") < 20)
    val truth = SimilarityOps.bruteForceTopK(emb, queries, "vec_id", "embedding", 5,
        SimilarityOps.quantizedCosineX1e6)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = SimilarityOps.lshTopKPortable(emb, queries, "vec_id", "embedding", 5,
        planes = 4, tables = 8)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.count(approx.contains).toDouble / truth.size
    assert(recall >= 0.4, s"recall@5 = $recall")
    info(s"portable LSH ANN recall@5 = $recall")
  }

  test("ivf centroids: deterministic hash-order selection, no count pre-scan") {
    val out = SimilarityOps.ivfTopK(emb, emb.filter(col("vec_id") < 3),
      "vec_id", "embedding", 3, score = SimilarityOps.quantizedCosineX1e6)
    assert(out.count() > 0)
    // centroid selection is a distributed partial top-k, not a global
    // sort (and building the frame ran no count() job on the corpus)
    assert(out.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
    // re-running yields the identical result set (no limit() nondeterminism)
    val a = out.collect().map(_.toString).sorted
    val b = SimilarityOps.ivfTopK(emb, emb.filter(col("vec_id") < 3),
      "vec_id", "embedding", 3, score = SimilarityOps.quantizedCosineX1e6)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
    // injected coarse quantizer (the k-means seam): same plan, cells
    // follow the supplied table
    val custom = emb.filter(col("vec_id").isin(7, 42, 99))
      .select(col("vec_id").as("cell"), col("embedding").as("centroid"))
    val viaCustom = SimilarityOps.ivfTopK(emb, emb.filter(col("vec_id") < 3),
      "vec_id", "embedding", 3, score = SimilarityOps.quantizedCosineX1e6,
      centroids = Some(custom))
    assert(viaCustom.count() > 0)
  }

  test("pq top-k: codes bounded, deterministic, recall over random ranking") {
    val queries = emb.filter(col("vec_id") < 20)
    // codes: m ints, each < ksub
    val codes = SimilarityOps.pqTopK(emb, queries, "vec_id", "embedding", 5)
    val a = codes.collect().map(_.toString).sorted
    val b = SimilarityOps.pqTopK(emb, queries, "vec_id", "embedding", 5)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b), "PQ ranking must be deterministic")
    // recall@5 vs exact integer-L2 brute force (the metric PQ
    // approximates — NOT cosine): 16 codewords per subspace is a
    // coarse codebook, the assertion is a sanity floor far above the
    // ~0.0025 random-pairs baseline
    val ql2 = (x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) => {
      val V = graft.functions.VecFunctions
      def q(c: org.apache.spark.sql.Column) =
        transform(c, v => floor(v.cast("double") * 1000).cast("long"))
      -(V.dot_long(q(x), q(x)) - lit(2) * V.dot_long(q(x), q(y)) + V.dot_long(q(y), q(y)))
    }
    val truth = SimilarityOps.bruteForceTopK(emb, queries, "vec_id", "embedding", 5, ql2)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = SimilarityOps.pqTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.count(approx.contains).toDouble / truth.size
    // random top-5 over 2000 vectors would hit 5/1999 ≈ 0.0025; the
    // untrained hash-order codebook must beat that by an order of
    // magnitude (ranking QUALITY comes from a trained codebook via
    // the `codebook` seam — ranking CORRECTNESS is pinned exactly by
    // the q_ann_pq_topk DuckDB oracle)
    assert(recall >= 0.03, s"PQ recall@5 = $recall (random baseline ~0.0025)")
    info(s"PQ ANN recall@5 = $recall (untrained hash-order codebook, m=8, ksub=16)")
  }

  test("ivf-pq: composed pruning + code scoring, deterministic, subset of pq candidates") {
    val queries = emb.filter(col("vec_id") < 3)
    val out = SimilarityOps.ivfPqTopK(emb, queries, "vec_id", "embedding", 3)
    assert(out.count() > 0)
    val a = out.collect().map(_.toString).sorted
    val b = SimilarityOps.ivfPqTopK(emb, queries, "vec_id", "embedding", 3)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b), "IVF-PQ ranking must be deterministic")
    // every returned neighbor must live in one of the query's probed
    // cells — i.e. the candidate set really is IVF-pruned, not a full
    // code scan with extra steps
    val full = SimilarityOps.pqTopK(emb, queries, "vec_id", "embedding", 2000)
      .select("query_id", "neighbor_id", "adist").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    SimilarityOps.ivfPqTopK(emb, queries, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id", "adist").collect().foreach { r =>
        val key = (r.getLong(0), r.getLong(1))
        assert(full.get(key).contains(r.getLong(2)),
          s"IVF-PQ adist must equal the full-scan PQ adist for $key")
      }
  }

  test("repetition stats: planted repetitious doc vs clean doc") {
    import spark.implicits._
    val planted = Seq(
      // "spam spam"×: 7 tokens, 6 bigrams all "spam spam" -> top 6;
      // 5 trigrams all identical -> 1 distinct
      (1L, "spam spam spam spam spam spam spam"),
      // all-distinct tokens: top bigram 1, trigrams all distinct
      (2L, "one two three four five six seven"),
      (3L, "x"), // degenerate: no bigrams/trigrams
      (4L, "")).toDF("doc_id", "text")
    val out = graft.llm.TextOps.repetitionStats(planted, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val spam = out(1L)
    assert(spam.getAs[Int]("top_bigram_count") == 6 &&
      spam.getAs[Int]("distinct_trigrams") == 1 &&
      spam.getAs[Long]("top_bigram_frac_x1e6") == 1000000L &&
      spam.getAs[Long]("dup_trigram_frac_x1e6") == 800000L, s"spam row: $spam")
    val clean = out(2L)
    assert(clean.getAs[Int]("top_bigram_count") == 1 &&
      clean.getAs[Long]("dup_trigram_frac_x1e6") == 0L, s"clean row: $clean")
    assert(out(3L).getAs[Long]("top_bigram_frac_x1e6") == 0L)
    assert(out(4L).getAs[Int]("n_tokens") == 0)
  }

  test("decontaminate: benchmark docs flag their exact copies, clean docs pass") {
    import graft.llm.PipelineOps
    // corpus = docs, benchmark = every 10th doc's exact text under a
    // shifted id -> every benchmark original must come back contaminated
    val bench = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 500000).as("doc_id"), col("text"))
    val all = docs.select(col("doc_id"), col("text")).unionByName(bench)
    val out = PipelineOps.decontaminate(all, "doc_id", "text",
      col("doc_id") >= 500000)
    val flagged = out.filter(col("contaminated") === 1)
      .filter(col("doc_id") % 10 === 0).filter(col("doc_id") < 500000).count()
    val planted = docs.filter(col("doc_id") % 10 === 0).count()
    assert(flagged == planted, s"expected all $planted originals flagged, got $flagged")
    // output never contains benchmark rows
    assert(out.filter(col("doc_id") >= 500000).count() == 0)
  }

  test("stratified sample: quota respected per stratum, deterministic") {
    import graft.llm.PipelineOps
    val quota = when(col("lang") === "en", 200).otherwise(500)
    val in = docs.select("doc_id", "lang")
    val out = PipelineOps.stratifiedSample(in, "doc_id", "lang", quota)
    // kept fraction tracks quota/1000 loosely (multiplicative hash)
    val byLang = in.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((lang, total) <- byLang if total >= 50) {
      val q = if (lang == "en") 0.2 else 0.5
      val frac = kept.getOrElse(lang, 0L).toDouble / total
      assert(math.abs(frac - q) < 0.2, s"$lang kept $frac of $total, quota $q")
    }
    // exact determinism across runs
    val again = PipelineOps.stratifiedSample(in, "doc_id", "lang", quota)
      .collect().map(_.toString).sorted
    assert(out.collect().map(_.toString).sorted.sameElements(again))
  }

  test("seq pack: offsets stay under capacity and chain correctly per stratum") {
    import spark.implicits._
    import graft.llm.PipelineOps
    val out = PipelineOps.seqPack(docs, "doc_id", "lang", "text", 2048)
    assert(out.filter(col("pack_offset") >= 2048 || col("pack_offset") < 0).count() == 0)
    // per stratum: tokens_before of doc i+1 == tokens_before + n_tokens of doc i
    val rows = out.select("lang", "doc_id", "n_tokens", "pack_id", "pack_offset")
      .as[(String, Long, Long, Long, Long)].collect()
      .groupBy(_._1).values
    for (group <- rows) {
      val sorted = group.sortBy(_._2)
      var before = 0L
      for ((_, id, n, pid, off) <- sorted) {
        assert(pid == before / 2048, s"doc $id pack_id")
        assert(off == before % 2048, s"doc $id pack_offset")
        before += n
      }
    }
  }

  test("ngram top-k: counts match a local reference on a small slice") {
    import spark.implicits._
    import graft.llm.PipelineOps
    val slice = docs.filter(col("doc_id") < 50)
    val got = PipelineOps.ngramTopK(slice, "text", 20)
      .as[(String, Long)].collect()
    val texts = slice.select("text").as[String].collect()
    val ref = texts.flatMap { t =>
      val ts = t.split("\\s+").filter(_.nonEmpty)
      ts.sliding(2).filter(_.length == 2).map(_.mkString(" "))
    }.groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
    val top = ref.toSeq.sortBy { case (bg, c) => (-c, bg) }.take(20)
    assert(got.toSeq == top, s"got ${got.take(3).toSeq}... want ${top.take(3)}...")
  }

  test("pipeline ops: degenerate inputs (empty bench set, empty/1-token docs, zero quota)") {
    import spark.implicits._
    import graft.llm.PipelineOps
    // empty benchmark set: nothing is contaminated, no rows lost
    val out = PipelineOps.decontaminate(docs, "doc_id", "text", lit(false))
    assert(out.count() == docs.count())
    assert(out.filter(col("contaminated") =!= 0).count() == 0)
    // empty and 1-token texts: zero tokens/bigrams, packing well-defined
    val weird = Seq((1L, "en", ""), (2L, "en", "solo"), (3L, "en", "   "),
      (4L, "fr", "a b")).toDF("doc_id", "lang", "text")
    val packed = PipelineOps.seqPack(weird, "doc_id", "lang", "text", 10)
      .orderBy("doc_id").collect()
    assert(packed.map(_.getAs[Long]("n_tokens")).toSeq == Seq(0L, 1L, 0L, 2L))
    assert(packed.forall(_.getAs[Long]("pack_offset") < 10))
    val grams = PipelineOps.ngramTopK(weird, "text", 5).as[(String, Long)].collect()
    assert(grams.toSeq == Seq(("a b", 1L)))
    // zero quota drops everything, deterministic
    assert(PipelineOps.stratifiedSample(weird, "doc_id", "lang", lit(0)).count() == 0)
  }

  test("group quota: cap respected per stratum, kept set stable across runs") {
    import graft.llm.PipelineOps
    val in = docs.select(col("doc_id"), col("lang"))
    val out = PipelineOps.groupQuota(in, "doc_id", "lang", 30)
    val over = out.groupBy("lang").count().filter(col("count") > 30).count()
    assert(over == 0, "stratum exceeded its quota")
    // strata smaller than the quota keep everything
    val sizes = in.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((lang, n) <- sizes)
      assert(kept.getOrElse(lang, 0L) == math.min(n, 30L), s"$lang")
    // deterministic: identical kept set + ranks on a second run
    val a = out.collect().map(_.toString).sorted
    val b = PipelineOps.groupQuota(in, "doc_id", "lang", 30)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("pii counts: planted emails/phones/ips found, clean text zero") {
    import spark.implicits._
    import graft.llm.PipelineOps
    val d = Seq(
      (1L, "contact me at alice@example.com or bob@test.org thanks"),
      (2L, "call +4915112345678 now"),
      (3L, "server at 10.0.0.1 and 192.168.1.255"),
      (4L, "perfectly clean prose with no identifiers at all"),
    ).toDF("doc_id", "text")
    val out = PipelineOps.piiCounts(d, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 2 && out(0).getLong(2) == 0 && out(0).getLong(3) == 0)
    assert(out(1).getLong(2) == 1)
    assert(out(2).getLong(3) == 2)
    assert(out(3).getLong(1) + out(3).getLong(2) + out(3).getLong(3) == 0)
  }

  test("pii redact: masks placed in order, overlaps consumed once, clean text untouched") {
    import spark.implicits._
    import graft.llm.PipelineOps
    val d = Seq(
      (1L, "contact alice@example.com or call +4915112345678 from 10.0.0.1"),
      // dotted quad inside the email's domain: email pass consumes it,
      // so exactly ONE mask lands (piiCounts would report 2 matches)
      (2L, "mail me at a@1.2.3.4.co today"),
      (3L, "already says <EMAIL> literally, plus real bob@test.org"),
      (4L, "perfectly clean prose with no identifiers at all"),
    ).toDF("doc_id", "text")
    val out = PipelineOps.piiRedact(d, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) == "contact <EMAIL> or call <PHONE> from <IP>"
      && out(0).getLong(2) == 3, s"${out(0)}")
    assert(out(1).getString(1) == "mail me at <EMAIL> today" && out(1).getLong(2) == 1)
    assert(out(2).getString(1) == "already says <EMAIL> literally, plus real <EMAIL>"
      && out(2).getLong(2) == 1, s"${out(2)}")
    assert(out(3).getString(1) == "perfectly clean prose with no identifiers at all"
      && out(3).getLong(2) == 0)
  }

  test("lm coverage: repeated-bigram text scores high, unique-bigram text low") {
    import spark.implicits._
    import graft.llm.PipelineOps
    // 20 docs of a shared phrase + 1 doc of unique gibberish
    val common = (1L to 20L).map(i => (i, "the quick brown fox jumps"))
    val odd = Seq((99L, "zxq wvu tsr qpo nml"))
    val d = (common ++ odd).toDF("doc_id", "text")
    val out = PipelineOps.lmCoverage(d, "doc_id", "text", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(1L) == 1000, s"common doc coverage ${out(1L)}")
    assert(out(99L) == 0, s"gibberish coverage ${out(99L)}")
  }

  test("int8 quantization matches a local reference; saturation at max dim") {
    import spark.implicits._
    val vecs = emb.filter(col("vec_id") < 10)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().toMap
    val out = SimilarityOps.int8QuantStats(
        emb.filter(col("vec_id") < 10), "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
    for ((id, (maxQ, checksum, nSat)) <- out) {
      val q = vecs(id).map(x => math.floor(x.toDouble * 1000).toLong)
      val m = q.map(math.abs).max
      assert(maxQ == m, s"vec $id max")
      val codes = q.map { v =>
        if (m == 0) 0L
        else if (v >= 0) math.floor(v.toDouble * 127 / m).toLong
        else -math.floor(-v.toDouble * 127 / m).toLong
      }
      assert(checksum == codes.zipWithIndex.map { case (c, i) => c * (i + 1) }.sum,
        s"vec $id checksum")
      assert(nSat == codes.count(c => math.abs(c) == 127), s"vec $id nSat")
      // the max-magnitude dimension always saturates (for m > 0)
      if (m > 0) assert(nSat >= 1)
    }
  }

  test("codegen'd portable simhash/fingerprint match their HOF formulations") {
    val diff1 = docs.select(
        DedupOps.portableSimhashSig(col("text")).as("a"),
        DedupOps.portableSimhashSigHof(col("text")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff1 == 0, s"$diff1 simhash divergences")
    val diff2 = docs.select(
        DedupOps.portableFingerprint(col("text")).as("a"),
        DedupOps.portableFingerprintHof(col("text")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff2 == 0, s"$diff2 fingerprint divergences")
  }

  test("multimodal: frame sampling and resize stubs are exact and shape-correct") {
    val media = Multimodal.packFromDocuments(docs.filter(col("doc_id") < 50))
    val frames = Multimodal.frameSample(media, frameSize = 64, stride = 2).collect()
    val payloads = media.collect().map(m => m.media_id -> m.payload).toMap
    // per-media frame count = sampled subset of full frames
    val byMedia = frames.groupBy(_.media_id)
    for ((id, fs) <- byMedia) {
      val expected = (0 until payloads(id).length / 64 by 2).toSet
      assert(fs.map(_.frame_idx).toSet == expected, s"media $id frame set")
      // checksum matches a direct fold of that frame's bytes
      for (f <- fs) {
        val bytes = payloads(id).slice(f.frame_idx * 64, f.frame_idx * 64 + 64)
        val want = bytes.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)
        assert(f.checksum == want, s"media $id frame ${f.frame_idx}")
      }
    }
    val resized = Multimodal.resize(media, 64).collect()
    for (r <- resized) {
      val p = payloads(r.media_id)
      val want = (0 until 64).foldLeft(0L)((a, i) =>
        (a * 31 + (p(((i.toLong * p.length) / 64).toInt) & 0xff)) % 1000000007L)
      assert(r.checksum == want && r.n_samples == 64, s"media ${r.media_id}")
    }
  }

  test("multimodal: stub decode produces 16-dim normalized features") {
    val feats = Multimodal.extractFeatures(Multimodal.packFromDocuments(docs)).collect()
    assert(feats.length == docs.count())
    assert(feats.forall(_.features.length == 16))
    // histogram is normalized: sums to ~1 for non-empty payloads
    assert(feats.forall(f => math.abs(f.features.sum - 1.0) < 1e-3))
    assert(feats.forall(f => Set("image", "audio", "video").contains(f.kind)))
  }

  test("multimodal pHash: planted near-dup recovery — exact re-uploads " +
      "at hamming 0, small corruptions within the band radius, " +
      "unrelated media not paired") {
    import spark.implicits._
    val payloadA = ("the quick brown fox jumps over the lazy dog " * 8).trim
    val payloadB = ("pack my box with five dozen liquor jugs now " * 8).trim
    // C: one corrupted byte in A (same length — most sampled pixels
    // identical); D: unrelated random-ish text
    val payloadC = payloadA.updated(10, 'Z')
    val payloadD = (0 until payloadA.length)
      .map(i => ('a' + (i * 7 + i * i % 13) % 26).toChar).mkString
    val docs = Seq((1L, payloadA), (2L, payloadB), (3L, payloadC),
        (4L, payloadD), (5L, payloadA), (6L, ""))
      .toDF("doc_id", "text").withColumn("n_chars", length(col("text")))
    val media = Multimodal.packFromDocuments(docs)
    val hashes = Multimodal.phash(media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 63-bit packing: always non-negative; empty payload hashes to 0
    assert(hashes.values.forall(_ >= 0L))
    assert(hashes(6L) == 0L)
    // exact duplicate payloads hash identically
    assert(hashes(1L) == hashes(5L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // the one-byte corruption stays inside the band radius; unrelated
    // payloads are far apart
    assert(ham(hashes(1L), hashes(3L)) <= 3,
      s"corruption drifted ${ham(hashes(1L), hashes(3L))} bits")
    assert(ham(hashes(1L), hashes(2L)) > 3)
    assert(ham(hashes(1L), hashes(4L)) > 3)
    val pairs = Multimodal.phashNearDup(media)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs.contains((1L, 5L, 0)), "exact re-upload must recover")
    assert(pairs.exists(p => p._1 == 1L && p._2 == 3L),
      "corrupted copy must recover through the Hamming bands")
    assert(!pairs.exists(p => Set(p._1, p._2) == Set(1L, 2L)),
      "unrelated media must not pair")
    // the banding is the SAME core as the text SimHash: pairs equal a
    // brute-force hamming filter on these signatures
    val ids = hashes.keys.toSeq.sorted
    val brute = (for {
      i <- ids; j <- ids if i < j
      h = ham(hashes(i), hashes(j)) if h <= 3
    } yield (i, j, h)).toSet
    assert(pairs == brute, "band recall must equal brute force at r<=3")
    // DECONTAMINATION: a corrupted re-encode of payloadA in the
    // benchmark set must knock out BOTH its source (1) and the exact
    // re-upload (5); unrelated corpus media survive
    val bench = Multimodal.packFromDocuments(
      Seq((100L, payloadC)).toDF("doc_id", "text")
        .withColumn("n_chars", length(col("text"))))
    val survivors = Multimodal.phashDecontaminate(media, bench)
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(!survivors.contains(1L) && !survivors.contains(5L) &&
      !survivors.contains(3L),
      s"perceptual matches must be dropped (got $survivors)")
    assert(Set(2L, 4L).subsetOf(survivors),
      "unrelated media must survive decontamination")
  }

  test("video-sequence near-dup (r17): exact re-uploads and prefix " +
      "trims recover at full ratio, a one-frame corruption loses only " +
      "the shingles crossing it, unrelated clips never pair") {
    import spark.implicits._
    // 10 distinct 64-byte "frames" -> a 640-byte clip
    def frame(seed: Int): String =
      (0 until 64).map(i => ('a' + (seed * 17 + i * 5) % 26).toChar).mkString
    val clipA = (0 until 10).map(frame).mkString
    val clipB = (20 until 30).map(frame).mkString           // unrelated
    val clipTrim = clipA.substring(128)                     // drop 2 frames
    val clipCorrupt = clipA.updated(130, 'Z')               // frame 2 hit
    val docs = Seq((1L, clipA), (2L, clipB), (3L, clipTrim),
        (4L, clipCorrupt), (5L, clipA))
      .toDF("doc_id", "text").withColumn("n_chars", length(col("text")))
    val pairs = Multimodal.frameSequenceNearDup(
        Multimodal.packFromDocuments(docs))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // clipA has 10 frames -> 8 shingles; the trim keeps 8 frames -> 6,
    // ALL shared (shingle fps are position-independent)
    assert(pairs((1L, 5L)) == ((8L, 8L, 8L)), "exact re-upload full ratio")
    assert(pairs((1L, 3L)) == ((6L, 8L, 6L)), "prefix trim is a subset")
    // the corruption sits in frame 2: exactly shingles (0,1,2),
    // (1,2,3), (2,3,4) break -> 5 of 8 shared
    assert(pairs((1L, 4L)) == ((5L, 8L, 8L)), "one-frame corruption")
    // transitives among the planted family may pair; clipB never does
    assert(!pairs.keySet.exists(p => p._1 == 2L || p._2 == 2L),
      "unrelated clip must not pair")
  }

  /** All messages down an exception's cause chain (executor failures
    * surface wrapped in SparkException layers).
    */
  private def chainMessages(e: Throwable): Seq[String] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq

  test("pq: dims < m fails loudly; remainder dims fold into the last subspace") {
    import spark.implicits._
    val tiny = Seq((0L, Array(1f, 2f, 3f, 4f, 5f)), (1L, Array(5f, 4f, 3f, 2f, 1f)),
        (2L, Array(0f, 1f, 0f, 1f, 0f)))
      .toDF("vec_id", "embedding")
    val ex = intercept[Throwable] {
      SimilarityOps.pqTopK(tiny, tiny.filter(col("vec_id") === 0),
        "vec_id", "embedding", 1, m = 8, ksub = 2).collect()
    }
    assert(chainMessages(ex).exists(_.contains("requires dims >= m")),
      s"expected dims<m error, got: ${chainMessages(ex).mkString(" | ")}")
    // dims=64, m=7: 64 = 7*9+1, last subspace covers 10 dims — encode
    // emits exactly m codes and top-k runs green
    val out = SimilarityOps.pqTopK(emb, emb.filter(col("vec_id") < 3),
      "vec_id", "embedding", 3, m = 7, ksub = 8)
    assert(out.count() == 9)
  }

  test("trained quantizers beat hash-order defaults; rerank beats plain ivf-pq") {
    // sf0.01 (500 vectors): large enough that k-means has structure to
    // fit, small enough to train in seconds. Everything below is exact
    // integer math over a fixed corpus, so the recalls are fully
    // deterministic (measured, maximin seeding: ivf 0.458→0.566,
    // pq 0.150→0.272, ivf-pq 0.246→rerank 0.440 trained) — the floors
    // have real margin.
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val queries = e.filter(col("vec_id") < 50)
    val k = 10
    val truth = SimilarityOps.bruteForceTopKPortable(e, queries, "vec_id", "embedding", k)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    def recall(df: DataFrame): Double = RecallEval.recallAtK(truth, df)
    val cents = graft.llm.Quantizers.trainIvfCentroids(e, "vec_id", "embedding", 16)
    val cb = graft.llm.Quantizers.trainPqCodebook(e, "vec_id", "embedding", 8, 16)
    val qcos = SimilarityOps.quantizedCosineX1e6 _
    val ivfHash = recall(SimilarityOps.ivfTopK(e, queries, "vec_id", "embedding", k, score = qcos))
    val ivfTrained = recall(SimilarityOps.ivfTopK(e, queries, "vec_id", "embedding", k,
      score = qcos, centroids = Some(cents)))
    val pqHash = recall(SimilarityOps.pqTopK(e, queries, "vec_id", "embedding", k))
    val pqTrained = recall(SimilarityOps.pqTopK(e, queries, "vec_id", "embedding", k,
      codebook = Some(cb)))
    val ivfPqTrained = recall(SimilarityOps.ivfPqTopK(e, queries, "vec_id", "embedding", k,
      centroids = Some(cents), codebook = Some(cb)))
    val rerankTrained = recall(SimilarityOps.ivfPqRerankTopK(e, queries, "vec_id", "embedding", k,
      centroids = Some(cents), codebook = Some(cb)))
    info(f"ivf $ivfHash%.3f→$ivfTrained%.3f  pq $pqHash%.3f→$pqTrained%.3f  " +
      f"ivfpq $ivfPqTrained%.3f→rerank $rerankTrained%.3f")
    assert(ivfTrained >= ivfHash, s"training worsened IVF recall: $ivfHash -> $ivfTrained")
    assert(pqTrained > pqHash, s"training worsened PQ recall: $pqHash -> $pqTrained")
    assert(rerankTrained >= ivfPqTrained + 0.1,
      s"rerank gained <0.1 recall: $ivfPqTrained -> $rerankTrained")
    assert(ivfTrained >= 0.5, s"trained IVF recall@10 = $ivfTrained")
    assert(pqTrained >= 0.2, s"trained PQ recall@10 = $pqTrained")
    assert(rerankTrained >= 0.35, s"trained rerank recall@10 = $rerankTrained")
  }

  test("residual ivf-pq: needs the residual-domain codebook, then lifts recall") {
    // Same deterministic setup as the trained-quantizer test. On this
    // corpus (near-orthogonal random vectors — little cell-local
    // structure) residual and raw encoding land at parity on the
    // plain tier (measured 0.294 raw vs 0.292 residual at sf0.01,
    // maximin seeding; residual pulls ahead once the rerank stage
    // composes). The load-bearing claims
    // are: (1) residual mode with a RAW codebook is the wrong pairing
    // and scores below the residual-trained form — the two halves of
    // the FAISS design must travel together; (2) the trained residual
    // path holds parity-or-better with the raw trained path.
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val queries = e.filter(col("vec_id") < 50)
    val k = 10
    val truth = SimilarityOps.bruteForceTopKPortable(e, queries, "vec_id", "embedding", k)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    def recall(df: DataFrame): Double = RecallEval.recallAtK(truth, df)
    val cents = graft.llm.Quantizers.trainIvfCentroids(e, "vec_id", "embedding", 16)
    val rawCb = graft.llm.Quantizers.trainPqCodebook(e, "vec_id", "embedding", 8, 16)
    val residCb = graft.llm.Quantizers.trainResidualPqCodebook(
      e, "vec_id", "embedding", cents, 8, 16)
    val rawTrained = recall(SimilarityOps.ivfPqTopK(e, queries, "vec_id", "embedding", k,
      centroids = Some(cents), codebook = Some(rawCb)))
    val residRawCb = recall(SimilarityOps.ivfPqTopK(e, queries, "vec_id", "embedding", k,
      centroids = Some(cents), codebook = Some(rawCb), residual = true))
    val residTrained = recall(SimilarityOps.ivfPqTopK(e, queries, "vec_id", "embedding", k,
      centroids = Some(cents), codebook = Some(residCb), residual = true))
    info(f"ivfpq raw-trained $rawTrained%.3f; residual w/ raw cb $residRawCb%.3f; " +
      f"residual w/ residual cb $residTrained%.3f")
    assert(residTrained > residRawCb,
      s"residual codebook did not beat the mismatched raw codebook: $residRawCb -> $residTrained")
    assert(residTrained >= rawTrained - 0.01,
      s"residual encoding fell below raw parity: $rawTrained -> $residTrained")
    assert(residTrained >= 0.2, s"residual trained recall@10 = $residTrained")
    // degenerate: an empty quantizer degrades to an empty codebook
    import spark.implicits._
    val c0 = Seq.empty[(Long, Array[Float])].toDF("cell", "centroid")
    assert(graft.llm.Quantizers.trainResidualPqCodebook(
      e, "vec_id", "embedding", c0, 8, 16).count() == 0)
  }

  test("quantizer training: degenerate inputs degrade, never throw") {
    import spark.implicits._
    val Q = graft.llm.Quantizers
    // corpus smaller than k: one centroid per vector
    val tiny = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f))).toDF("vec_id", "embedding")
    assert(Q.trainIvfCentroids(tiny, "vec_id", "embedding", 8, iters = 2, trainSize = 8)
      .count() == 2)
    // empty corpus: empty quantizer, and serving with it yields empty
    // results rather than an error
    val empty = tiny.filter(col("vec_id") < 0)
    val c0 = Q.trainIvfCentroids(empty, "vec_id", "embedding", 4, iters = 1, trainSize = 4)
    assert(c0.count() == 0)
    assert(Q.trainPqCodebook(empty, "vec_id", "embedding", 2, 4, iters = 1, trainSize = 4)
      .count() == 0)
    assert(SimilarityOps.ivfTopK(emb, emb.filter(col("vec_id") < 2),
      "vec_id", "embedding", 3, centroids = Some(c0)).count() == 0)
    // constant vectors: all mass in one cell, empty cells keep their
    // seed centroid — k entries out, deterministic
    val const = (1L to 40L).map(i => (i, Array(1f, 1f, 1f, 1f))).toDF("vec_id", "embedding")
    assert(Q.trainIvfCentroids(const, "vec_id", "embedding", 4, iters = 3, trainSize = 40)
      .count() == 4)
    assert(Q.trainPqCodebook(const, "vec_id", "embedding", 2, 4, iters = 2, trainSize = 40)
      .count() == 4)
  }

  test("ivf: malformed centroid dims fail loudly, not truncate-and-score") {
    val badCents = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cell"), slice(col("embedding"), 1, 10).as("centroid"))
    val ex = intercept[Throwable] {
      SimilarityOps.ivfTopK(emb, emb.filter(col("vec_id") < 2),
        "vec_id", "embedding", 3, centroids = Some(badCents)).collect()
    }
    assert(chainMessages(ex).exists(_.contains("nearest_cells_q")),
      s"expected dimension-mismatch error, got: ${chainMessages(ex).mkString(" | ")}")
  }

  test("weighted sample: fractional weights rank by weight, never " +
      "collapse to the all-ties uniform sample") {
    import graft.llm.PipelineOps
    // doubles in (0,1) — the classifier-quality-score case; a bare
    // cast("long") would floor all of them to 0 -> clamp to 1 -> ties
    val df = spark.createDataFrame(Seq(
        (1L, "s", 0.25), (2L, "s", 0.5), (3L, "s", 0.75)))
      .toDF("doc_id", "stratum", "w")
    val out = PipelineOps.weightedSample(df, "doc_id", "stratum", col("w"), 3)
      .select("doc_id", "smpl_pri").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def pri(id: Long, w: Long): Long = {
      val u = ((id & 2147483647L) * 2654435761L) % 1000000007L
      (w * (1L << 33)) / (u + 1L)
    }
    // 1e6-scaled weights (0.25/0.5/0.75 are exact in binary)
    assert(out(1L) == pri(1L, 250000L))
    assert(out(2L) == pri(2L, 500000L))
    assert(out(3L) == pri(3L, 750000L))
    assert(out.values.toSeq.distinct.size == 3, "fractional weights must not tie")
    // integer weights keep the unscaled contract (regression guard for
    // the existing oracle entries)
    val ints = spark.createDataFrame(Seq((1L, "s", 500L)))
      .toDF("doc_id", "stratum", "w")
    val one = PipelineOps.weightedSample(ints, "doc_id", "stratum", col("w"), 1)
      .select("smpl_pri").collect().head.getLong(0)
    assert(one == pri(1L, 500L))
    // a fractional weight ABOVE 1 would scale past the 2^20 clamp and
    // tie with every other large weight — it must fail loudly, not
    // silently collapse the sample to uniform
    val mixed = spark.createDataFrame(Seq((1L, "s", 2.0), (2L, "s", 1500.0)))
      .toDF("doc_id", "stratum", "w")
    val ex = intercept[Exception] {
      PipelineOps.weightedSample(mixed, "doc_id", "stratum", col("w"), 2)
        .collect()
    }
    assert(chainMessages(ex).exists(_.contains("rank-normalize")),
      s"expected the >1 fractional-weight guard, got: ${chainMessages(ex).mkString(" | ")}")
    // a fractional weight <= 0 floors to <= 0 and ties at the MINIMUM
    // clamp — the same silent collapse at the other end of (0,1]
    val nonPos = spark.createDataFrame(Seq((1L, "s", 0.0), (2L, "s", -0.5)))
      .toDF("doc_id", "stratum", "w")
    val ex2 = intercept[Exception] {
      PipelineOps.weightedSample(nonPos, "doc_id", "stratum", col("w"), 2)
        .collect()
    }
    assert(chainMessages(ex2).exists(_.contains("rank-normalize")),
      s"expected the <=0 fractional-weight guard, got: ${chainMessages(ex2).mkString(" | ")}")
    // NULL fractional weights still skip the guard and degrade to the
    // minimum weight (the unscored-row contract)
    val withNull = spark.createDataFrame(Seq(
        (1L, "s", Some(0.5)), (2L, "s", Option.empty[Double])))
      .toDF("doc_id", "stratum", "w")
    val nOut = PipelineOps.weightedSample(withNull, "doc_id", "stratum", col("w"), 2)
      .select("doc_id", "smpl_pri").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nOut(2L) == pri(2L, 1L), "null weight must clamp to the minimum")
  }


  test("inverted index: df/cf cover the FULL posting list while the " +
      "postings CSV is capped and rank-ordered") {
    import graft.llm.TextOps
    import spark.implicits._
    // term "w" appears in 12 docs with tf = doc_id (so the top-3 cap
    // must pick docs 12,11,10), term "solo" in one doc twice
    val docs = ((1 to 12).map(i => (i.toLong, ("w " * i).trim)) :+
      (99L, "solo solo")).toDF("doc_id", "text")
    val idx = TextOps.invertedIndex(docs, "doc_id", "text", postingsCap = 3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(idx("w") == ((12L, 78L, "12:12,11:11,10:10")),
      s"got ${idx("w")}")                       // df=12 docs, cf=1+..+12=78
    assert(idx("solo") == ((1L, 2L, "99:2")))
    // tf ties break by doc_id ascending
    val tie = Seq((5L, "t t"), (2L, "t t"), (9L, "t t")).toDF("doc_id", "text")
    val t = TextOps.invertedIndex(tie, "doc_id", "text", postingsCap = 2)
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(t("t") == "2:2,5:2")
  }


  test("per-source top-k bigrams: counts per source, deterministic cut") {
    import graft.llm.PipelineOps
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b", "s1"),   // s1: "a b" x2 (+ "b a" x1)
      (2L, "a b c", "s1"),     // s1: "a b" 3 total, "b c" 1
      (3L, "x y", "s2"),
      (4L, "x y", "s2")
    ).toDF("doc_id", "text", "source")
    val got = PipelineOps.ngramTopKBySource(docs, "text", "source", 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3))).toSet
    assert(got == Set(
      ("s1", "a b", 3L, 1), ("s1", "b a", 1L, 2),
      ("s2", "x y", 2L, 1)))
  }

  test("snapshot diff: added/removed/changed/unchanged from one full-outer join") {
    import graft.llm.PipelineOps
    import spark.implicits._
    val oldS = Seq((1L, "t1"), (2L, "t2"), (3L, "t3")).toDF("doc_id", "text")
    val newS = Seq((2L, "t2"), (3L, "t3x"), (4L, "t4")).toDF("doc_id", "text")
    val got = PipelineOps.snapshotDiff(oldS, newS, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("source overlap matrix: identical sources read 1000 permille; " +
      "merged signature == signature of the union") {
    import graft.llm.DedupOps
    import spark.implicits._
    // s1 and s2 hold the SAME two documents -> identical union
    // signatures -> estimate 1000; s3 is disjoint vocabulary
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon", "s1"),
      (2L, "one two three four five", "s1"),
      (3L, "alpha beta gamma delta epsilon", "s2"),
      (4L, "one two three four five", "s2"),
      (5L, "zz yy xx ww vv uu tt", "s3")
    ).toDF("doc_id", "text", "source")
    val got = DedupOps.sourceSimilarityMatrix(docs, "doc_id", "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got(("s1", "s2")) == 1000L)
    assert(got(("s1", "s3")) < 1000L)
    assert(got.keySet == Set(("s1","s2"), ("s1","s3"), ("s2","s3")))
    // mergeability: the s1 source signature equals the signature of
    // one document holding s1's concatenated text's shingle UNION —
    // verified indirectly: splitting s1 into more docs changes nothing
    val resplit = Seq(
      (1L, "alpha beta gamma delta epsilon", "s1"),
      (2L, "one two three", "s1"), (9L, "three four five", "s1"),
      (3L, "alpha beta gamma delta epsilon", "s2"),
      (4L, "one two three four five", "s2")
    ).toDF("doc_id", "text", "source")
    val est2 = DedupOps.sourceSimilarityMatrix(resplit, "doc_id", "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // s1 re-split loses the cross-boundary shingles ("two three four"
    // etc.), so the estimate may drop below 1000 but must stay the
    // dominant pair; exact mergeability is over SIGNATURES:
    assert(est2(("s1", "s2")) >= 500L)
  }

  test("bpeTrain == driver-side reference trainer (pair counts, argmax " +
      "tie-break, greedy non-overlapping merges, compression curve)") {
    import graft.llm.TextOps
    import spark.implicits._
    // overlap-heavy corpus: runs of the same char exercise the
    // greedy left-to-right non-overlap semantics ("aaaa" -> "aa aa"),
    // ties exercise the (count, a, b) ordering
    val docs = Seq(
      "aaaa aab the the the quick quick brown fox fox fox",
      "the quick brown aaaa aab banana bandana the quick",
      "fox banana bandana aab aaaa the THE Ignored123 x"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val gens = 6
    val out = TextOps.bpeTrain(docs, "text", gens, topWords = 5).collect()

    // reference trainer over symbol LISTS (no string encoding at all —
    // a genuinely independent formulation)
    var words: Map[List[String], Long] = docs.collect()
      .flatMap(_.getString(1).split("\\s+"))
      .filter(w => w.matches("^[a-z]+$") && w.length >= 2)
      .groupBy(identity).map { case (w, ws) =>
        w.map(_.toString).toList -> ws.length.toLong }
    def mergeOne(s: List[String], a: String, b: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += s(i); i += 1 }
      }
      out.toList
    }
    val refMerges =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long, Long)]
    for (g <- 1 to gens) {
      val pairCnt = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, cnt) <- words; i <- 0 until syms.length - 1)
        pairCnt((syms(i), syms(i + 1))) =
          pairCnt.getOrElse((syms(i), syms(i + 1)), 0L) + cnt
      if (pairCnt.nonEmpty) {
        val ((a, b), c) = pairCnt.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.head
        words = words.groupBy { case (syms, _) => mergeOne(syms, a, b) }
          .map { case (k, vs) => k -> vs.values.sum }
        val nSyms = words.map { case (s, c) => s.length * c }.sum
        refMerges += ((g, a, b, c, nSyms))
      }
    }
    val gotMerges = out.filter(_.getString(0) == "merge")
      .map(r => (r.getInt(1), r.getString(2), r.getString(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1).toSeq
    assert(gotMerges == refMerges.toSeq,
      s"merge table diverged:\n got $gotMerges\n ref $refMerges")
    // seg rows: decode the final encodings and compare to the
    // reference's final symbol lists for the top words
    val refEnc = words.map { case (syms, c) =>
      syms.mkString -> syms }
    val segs = out.filter(_.getString(0) == "seg")
      .map(r => r.getString(6) ->
        r.getString(7).stripPrefix("<").stripSuffix(">")
          .split("><").toList).toMap
    assert(segs.size == 5)
    for ((w, syms) <- segs)
      assert(refEnc(w) == syms, s"word $w segmented as $syms, ref ${refEnc(w)}")
    // the compression curve is monotone non-increasing
    val curve = gotMerges.map(_._5)
    assert(curve.zip(curve.tail).forall { case (x, y) => y <= x })
  }

  test("bpeApply: whole-corpus counts under the learned merges == the " +
      "reference segmenter; persisted model serves identically") {
    import graft.llm.{Quantizers, TextOps}
    import spark.implicits._
    val docs = Seq(
      "aaaa aab the the the quick quick brown fox fox fox",
      "the quick brown aaaa aab banana bandana the quick",
      "fox banana bandana aab aaaa the THE Ignored123 x",
      "   ", "a"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val gens = 6
    val model = TextOps.bpeMergeModel(
      TextOps.bpeTrain(docs, "text", gens, topWords = 5))
    val merges = TextOps.collectMerges(model)
    assert(merges.size == gens)
    // persisted model == in-session model (the seam surface)
    val path = graft.sources.Staging.sessionTempDir("graft_bpe_model_spec")
    Quantizers.saveModel(model, path)
    val loadedMerges = TextOps.collectMerges(Quantizers.loadModel(spark, path))
    assert(loadedMerges == merges)
    val got = TextOps.bpeApply(docs, "doc_id", "text", loadedMerges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // reference: greedy non-overlapping merges per word, in gen order;
    // out-of-domain tokens (uppercase, digits, 1-char) pass through as 1
    def mergeOne(s: List[String], a: String, b: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += s(i); i += 1 }
      }
      out.toList
    }
    def refCount(w: String): Long =
      if (w.matches("^[a-z]+$") && w.length >= 2)
        merges.foldLeft(w.map(_.toString).toList) {
          case (s, (a, b)) => mergeOne(s, a, b)
        }.length.toLong
      else 1L
    for (r <- docs.collect()) {
      val toks = r.getString(1).split("\\s+").filter(_.nonEmpty).toSeq
      val (nRaw, nBpe) = got(r.getLong(0))
      assert(nRaw == toks.size.toLong, s"doc ${r.getLong(0)} raw")
      assert(nBpe == toks.map(refCount).sum, s"doc ${r.getLong(0)} bpe")
    }
    // merged words really compress: "the" appears as one symbol after
    // training on this corpus, so its count is below its char count
    assert(got(0L)._2 < "aaaa aab the the the quick quick brown fox fox fox"
      .split(" ").map(_.length.toLong).sum)
    // empty/whitespace-only doc counts zero
    assert(got(3L) == ((0L, 0L)))
  }

}
