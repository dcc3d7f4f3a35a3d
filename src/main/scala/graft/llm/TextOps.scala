package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token stats,
  * quality scoring, language identification, fingerprinting. All are
  * pure projections (no shuffle) built from codegen'd functions, so
  * they stream through a 100 TB scan at IO speed.
  */
object TextOps {

  def tokens(c: Column): Column = split(c, " ")

  /** Per-document token statistics (exact integers). */
  def tokenStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    df.select(col(idCol),
      length(col(textCol)).as("n_chars"),
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("n_distinct"),
      (length(col(textCol)) - length(replace(col(textCol), lit(" "), lit("")))).as("n_spaces"))
  }

  /** BPE merge-rule TRAINING (Sennrich et al. 2016): learn `gens`
    * merge rules from the corpus by iterative
    * highest-frequency-adjacent-pair merging over the word-TYPE
    * table — the missing half of the tokenizer story next to
    * [[bpeishTokens]]' fixed segmentation regex.
    *
    * Word types are whitespace tokens matching `^[a-z]+$` of length
    * ≥ 2 with their corpus frequencies; a word's segmentation is
    * encoded as `<s1><s2>…<sN>` (per-symbol delimiters are NOT
    * shared between adjacent symbols, so the literal replace of
    * `<a><b>` → `<ab>` applies merges greedily left-to-right,
    * non-overlapping, identically in Spark and DuckDB — both engines'
    * `replace` is a single left-to-right scan). Pair counting weights
    * every adjacent POSITION by the word's frequency (the classic
    * zip(word, word[1:]) Counter form, overlaps included); the argmax
    * is tie-broken (count desc, left asc, right asc) so training is
    * deterministic. No end-of-word marker — merges are learned
    * within words (deliberate simplification, recorded here).
    *
    * Output: one 'merge' row per generation (gen, the learned pair,
    * its count, and the corpus-weighted total symbol count AFTER the
    * merge — the compression curve) plus 'seg' rows giving the
    * `topWords` most frequent words' final segmentations under the
    * learned rules. Stops early if no pair remains.
    *
    * Scale shape: the per-generation state is the word-TYPE table
    * (vocabulary-sized, checkpointed between generations — exactly
    * the PageRank iterate pattern); the corpus is scanned ONCE to
    * build it. Driver-side collects are the 1-row argmax, a scalar,
    * and the `topWords` seg rows — bounded model state, the
    * quantizer-training precedent. The DuckDB oracle reproduces all
    * `gens` generations as unrolled MATERIALIZED CTEs.
    */
  def bpeTrain(docs: DataFrame, textCol: String, gens: Int = 8,
      topWords: Int = 10): DataFrame = {
    require(gens >= 1 && gens <= 32)
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs
      .select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(col("w").rlike("^[a-z]+$") && length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("wcnt"))
    val symsOf = split(regexp_replace(col("enc"), "^<|>$", ""), "><")
    var enc = words.select(col("w"), col("wcnt"),
        concat(lit("<"), concat_ws("><", split(col("w"), "")), lit(">"))
          .as("enc"))
      // vocabulary-sized iterate: single partition keeps each
      // generation's two shuffles at one task instead of 32
      .coalesce(1).localCheckpoint()
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long, Long)]
    // ONE driver action per generation (the loop is job-floor-bound):
    // the current encoding's weighted symbol total — which IS n_syms
    // AFTER the previous merge, backfilled — crossed with the 1-row
    // argmax, collected together.
    def stepStats(e: DataFrame): Option[(Long, String, String, Long)] = {
      val nFrame = e.select(sum(col("wcnt") * size(symsOf)).as("n"))
      val winFrame = e
        .select(col("wcnt"), symsOf.as("syms"))
        .select(col("wcnt"), col("syms"),
          posexplode(col("syms")).as(Seq("pos", "a")))
        // try_: the last symbol has no successor (ANSI element_at throws)
        .withColumn("b", try_element_at(col("syms"), col("pos") + 2))
        .filter(col("b").isNotNull)
        .groupBy("a", "b").agg(sum("wcnt").as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1)
      nFrame.crossJoin(winFrame).collect().headOption
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3)))
    }
    var g = 1
    var done = false
    while (g <= gens && !done) {
      stepStats(enc) match {
        case None => done = true
        case Some((nBefore, a, b, cnt)) =>
          if (g >= 2) {
            val (pg, pa, pb, pc, _) = merges(g - 2)
            merges(g - 2) = (pg, pa, pb, pc, nBefore)
          }
          enc = enc.withColumn("enc",
              expr(s"replace(enc, '<$a><$b>', '<$a$b>')"))
            .coalesce(1).localCheckpoint()
          merges += ((g, a, b, cnt, -1L))
          g += 1
      }
    }
    // the final generation's post-merge total needs one last action
    if (merges.nonEmpty) {
      val n = enc.select(sum(col("wcnt") * size(symsOf)).as("n"))
        .head.getLong(0)
      val (lg, la, lb, lc, _) = merges.last
      merges(merges.length - 1) = (lg, la, lb, lc, n)
    }
    val segRows = enc.orderBy(col("wcnt").desc, col("w").asc)
      .limit(topWords).select(col("w"), col("enc")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val mergeDf = merges.toSeq.toDF("gen", "a", "b", "pair_cnt", "n_syms")
      .select(lit("merge").as("kind"), col("gen"), col("a"), col("b"),
        col("pair_cnt"), col("n_syms"),
        lit(null).cast("string").as("word"),
        lit(null).cast("string").as("enc"))
    val segDf = segRows.toDF("word", "enc")
      .select(lit("seg").as("kind"), lit(gens).as("gen"),
        lit(null).cast("string").as("a"), lit(null).cast("string").as("b"),
        lit(null).cast("long").as("pair_cnt"),
        lit(null).cast("long").as("n_syms"), col("word"), col("enc"))
    mergeDf.unionByName(segDf)
  }

  /** The persisted-model view of a [[bpeTrain]] output: just the
    * learned merge rules, in generation order — the frame the seam
    * persists (`Quantizers.saveModel`) and [[bpeApply]] serves from. */
  def bpeMergeModel(train: DataFrame): DataFrame =
    train.filter(col("kind") === "merge").select("gen", "a", "b")

  /** Collect a merge model to driver-side rules — bounded model state
    * (≤ gens rows, the quantizer-codebook precedent): the rules
    * inline into ONE expression chain, so applying the learned
    * tokenizer to a 100 TB corpus is a zero-shuffle map-only
    * projection. */
  def collectMerges(model: DataFrame): Seq[(String, String)] =
    model.orderBy("gen").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq

  /** Learned-BPE token count of `text` as one expression:
    * whitespace tokens in the learned domain (`[a-z]{2,}` — the
    * domain [[bpeTrain]] learns over) are segmented by the merge
    * rules applied in generation order (literal replace of
    * `<a><b>` → `<ab>` == greedy non-overlapping merge, the bpeTrain
    * encoding contract), every other non-empty token passes through
    * unsegmented as 1 token (deliberate simplification, mirroring
    * training's domain restriction). Zero shuffle — the whole
    * tokenizer is `aggregate` over the token array (a higher-order
    * function, interpreted like the shingle kernels in DedupOps —
    * per-row string work, no exchange; the hot path at scale is the
    * scan, not codegen). */
  def bpeTokenCount(text: Column, merges: Seq[(String, String)]): Column = {
    def segLen(w: Column): Column = {
      val enc0 = concat(lit("<"), concat_ws("><", split(w, "")), lit(">"))
      val encN = merges.foldLeft(enc0) { case (e, (a, b)) =>
        replace(e, lit(s"<$a><$b>"), lit(s"<$a$b>"))
      }
      size(split(regexp_replace(encN, "^<|>$", ""), "><")).cast("long")
    }
    val toks = filter(split(text, "\\s+"), t => length(t) > 0)
    aggregate(toks, lit(0L), (acc, t) => acc +
      when(t.rlike("^[a-z]+$") && length(t) >= 2, segLen(t))
        .otherwise(1L))
  }

  /** BPE APPLY — the missing half of the tokenizer story (train →
    * persist → apply): per-document token counts of the WHOLE corpus
    * under the LEARNED merge table, next to the raw whitespace count.
    * This is the number a token budget is actually denominated in
    * once a trained tokenizer exists — the fixed whitespace count
    * mis-states budgets wherever segmentation differs (see
    * q_llm_bpe_budget_mix, which feeds [[bpeTokenCount]] into the
    * mixing prefix cut). */
  def bpeApply(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame =
    docs.select(col(idCol),
      size(filter(split(col(textCol), "\\s+"), t => length(t) > 0))
        .cast("long").as("n_raw_tokens"),
      bpeTokenCount(col(textCol), merges).as("n_bpe_tokens"))

  /** BPE-ish subword segmentation via regex: alphanumeric runs are
    * one token each, every other non-space character is its own token
    * (the usual pre-tokenization regex shape of GPT-2-family BPE,
    * without the learned merges).
    */
  def bpeishTokens(c: Column): Column =
    regexp_extract_all(c, lit("[A-Za-z0-9]+|[^A-Za-z0-9 ]"), lit(0))

  private val Stopwords = Seq("the", "a", "and", "of", "to", "in", "is")

  /** Count of tokens in `c` that appear in `words`. */
  def markerCount(c: Column, words: Seq[String]): Column =
    size(filter(tokens(c), t => t.isin(words.map(lit(_)): _*)))

  /** Gopher/MassiveText-style repetition evidence (Rae et al. 2021
    * §A1.1 filter repetitious documents by duplicate n-gram
    * fractions): per document, exact counts of bigram/trigram
    * repetition from one codegen'd kernel pass, plus the two derived
    * duplicate fractions quantized to exact integers
    * (floor(1e6·frac), integer division) — map-only, streams at IO
    * speed, and every value hash-compares against the SQL oracle.
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val st = graft.functions.VecFunctions.repetition_stats(col(textCol))
    df.select(col(idCol), st.as("st"))
      .select(col(idCol),
        element_at(col("st"), 1).cast("int").as("n_tokens"),
        element_at(col("st"), 2).cast("int").as("n_bigrams"),
        element_at(col("st"), 3).cast("int").as("top_bigram_count"),
        element_at(col("st"), 4).cast("int").as("n_trigrams"),
        element_at(col("st"), 5).cast("int").as("distinct_trigrams"))
      .withColumn("top_bigram_frac_x1e6",
        when(col("n_bigrams") === 0, 0L).otherwise(
          expr("(top_bigram_count * CAST(1000000 AS BIGINT)) DIV n_bigrams")))
      .withColumn("dup_trigram_frac_x1e6",
        when(col("n_trigrams") === 0, 0L).otherwise(
          expr("((n_trigrams - distinct_trigrams) * CAST(1000000 AS BIGINT)) DIV n_trigrams")))
  }

  /** C4-style heuristic page filters (Raffel et al. 2020, "Exploring
    * the Limits of Transfer Learning…", §2.2: the C4 cleaning rules),
    * as exact-integer per-document evidence:
    *
    *   - a line is RETAINED iff it ends in terminal punctuation
    *     (`.` `!` `?` `"`) and has ≥ 3 space-separated words;
    *   - `n_sentences_kept` counts sentence enders over retained
    *     lines only (C4 drops pages left with < 5 sentences);
    *   - pages containing "lorem ipsum" (case-folded), a curly brace,
    *     or lines mentioning "javascript" are flagged;
    *   - `kept` is the composed C4 verdict.
    *
    * Map-only projection (no shuffle); every value is an integer so
    * the whole verdict hash-compares with the SQL oracle. Word
    * splitting is the same single-space [[tokens]] convention the
    * other text ops use, keeping the oracle engine-portable.
    */
  def c4Stats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = split(col(textCol), "\n")
    def words(l: Column): Column =
      size(filter(split(l, " "), w => length(w) > 0))
    def terminal(l: Column): Column =
      substring(l, -1, 1).isin(".", "!", "?", "\"")
    def senders(l: Column): Column =
      length(l) - length(translate(l, ".!?", ""))
    val keptLines = filter(lines, l => terminal(l) && words(l) >= 3)
    df.select(col(idCol),
      size(lines).as("n_lines"),
      size(keptLines).as("n_kept_lines"),
      aggregate(keptLines, lit(0), (acc, l) => acc + senders(l))
        .as("n_sentences_kept"),
      contains(lower(col(textCol)), lit("lorem ipsum")).cast("int")
        .as("has_lorem_ipsum"),
      contains(col(textCol), lit("{")).cast("int").as("has_curly"),
      size(filter(lines, l => contains(lower(l), lit("javascript"))))
        .as("n_javascript_lines"))
      .withColumn("kept",
        (col("n_sentences_kept") >= 5 && col("has_lorem_ipsum") === 0 &&
          col("has_curly") === 0 && col("n_javascript_lines") === 0).cast("int"))
  }

  /** Heuristic quality score, scaled to exact integers:
    * floor(1000 * stopword_ratio) and floor(100 * avg token length) —
    * the usual length/stopword quality filters of LLM data pipelines
    * quantized so engine comparison is exact.
    */
  def qualityScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val nTok = size(toks)
    val nStop = markerCount(col(textCol), Stopwords)
    val nChars = length(col(textCol))
    df.select(col(idCol),
      nTok.as("n_tokens"),
      nStop.as("n_stopwords"),
      floor(lit(1000.0) * nStop / nTok).cast("long").as("stop_ratio_x1000"),
      floor(lit(100.0) * (nChars - nTok + 1) / nTok).cast("long").as("avg_tok_len_x100"),
      (nTok >= 20 && nTok <= 200).cast("int").as("length_ok"))
  }

  /** Hashed linear classifier inference (the fastText/quality-model
    * serving shape): each document's word bigrams are feature-hashed
    * into `dims` buckets (FNV-1a64, power-of-two mask) and the bucket
    * weights are summed — one codegen'd map-side projection + one
    * partial-merged groupBy, so model scoring streams through a
    * 100 TB scan like any aggregation.
    *
    * `weights` is the trained-model seam: a (bucket, w) frame that is
    * broadcast-joined (a real model is dims·8 bytes — kilobytes to a
    * few MB — never a shuffle side). When absent, a deterministic
    * pseudo-model derives each bucket's weight arithmetically
    * (((bucket+1)·2654435761) mod 2001 − 1000 ∈ [−1000, 1000]), which
    * keeps the whole path — hash, bucket, weight, sum — exact integer
    * math that an independent engine reproduces bit-for-bit.
    *
    * Output: one row per document with ≥1 bigram — (id, n_feats,
    * score). Integer scores are the serving form (a monotone logit);
    * thresholding/sigmoid is the caller's last step.
    */
  /** (id, bucket) feature rows shared by training and serving: one
    * row per word-bigram OCCURRENCE, bucketed by FNV & (dims-1).
    */
  private def featureBuckets(df: DataFrame, idCol: String, textCol: String,
      dims: Int): DataFrame = {
    require(dims > 0 && (dims & (dims - 1)) == 0,
      s"dims must be a power of two, got $dims")
    df.select(col(idCol),
        explode(graft.functions.VecFunctions.word_bigrams(col(textCol))).as("bigram"))
      .withColumn("bucket",
        graft.functions.LlmFunctions.fnv64(col("bigram"))
          .bitwiseAND(lit((dims - 1).toLong)))
  }

  /** Deterministic classifier training for [[hashedLinearScore]]'s
    * `weights` seam: per feature bucket, the add-one-smoothed
    * positive-class frequency in fixed point —
    * w(b) = ((pos_b + 1) · 10⁶) DIV (n_b + 2), where pos_b counts
    * positive-document feature occurrences in the bucket and n_b all
    * of them. The Naive-Bayes-flavoured estimator keeps the whole
    * train→serve loop exact integer arithmetic (no log, no floats),
    * so training is as oracle-comparable as serving — and it is one
    * explode + one groupBy(bucket): the model never exceeds dims
    * rows, the corpus is never collected.
    *
    * `labelCol` is a 0/1 integer column on `df` (the caller encodes
    * its labeling rule).
    */
  def trainClassifierWeights(df: DataFrame, textCol: String,
      labelCol: String, dims: Int = 4096): DataFrame = {
    require(dims > 0 && (dims & (dims - 1)) == 0,
      s"dims must be a power of two, got $dims")
    df.select(col(labelCol).cast("long").as("_y"),
        explode(graft.functions.VecFunctions.word_bigrams(col(textCol))).as("bigram"))
      .withColumn("bucket",
        graft.functions.LlmFunctions.fnv64(col("bigram"))
          .bitwiseAND(lit((dims - 1).toLong)))
      .groupBy("bucket")
      .agg(sum(col("_y")).as("pos"), count(lit(1)).as("n"))
      .select(col("bucket"),
        expr("(pos + 1) * 1000000 DIV (n + 2)").as("w"))
  }

  def hashedLinearScore(df: DataFrame, idCol: String, textCol: String,
      dims: Int = 4096, weights: Option[DataFrame] = None): DataFrame = {
    val feats = featureBuckets(df, idCol, textCol, dims)
    val weighted = weights match {
      case Some(w) =>
        // LEFT join + coalesce: a bucket absent from a pruned or
        // partially-trained model scores 0 — the document still
        // appears, and n_feats counts every feature it emitted (an
        // inner join here silently dropped documents whose buckets
        // all missed the model)
        feats.join(broadcast(w.select(col("bucket"), col("w"))),
            Seq("bucket"), "left")
          .withColumn("w", coalesce(col("w"), lit(0L)))
      case None =>
        feats.withColumn("w",
          (col("bucket") + 1L) * 2654435761L % 2001L - 1000L)
    }
    weighted.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum("w").as("score"))
  }

  /** Overlapping token-window chunking (the RAG-ingestion shape): each
    * document becomes ⌈…⌉ chunks of `chunkTokens` whitespace tokens
    * with `overlap` tokens shared between neighbours — chunk k covers
    * token span [k·step, k·step + chunkTokens) for step = chunkTokens
    * − overlap, truncated at the document end; every start < n_tokens
    * emits. Map-only (tokenize → sequence-explode → slice), so
    * chunking streams through the scan; output rows are
    * (id, chunk_id, start_tok, n_tok, chunk_text). Empty documents
    * emit nothing.
    */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int = 64, overlap: Int = 16): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap < chunkTokens, got ($overlap, $chunkTokens)")
    val step = chunkTokens - overlap
    val toks = filter(split(col(textCol), "\\s+"), t => length(t) > 0)
    df.select(col(idCol), toks.as("tk"))
      .withColumn("n", size(col("tk")).cast("long"))
      .filter(col("n") > 0)
      .withColumn("chunk_id", explode(sequence(lit(0L), expr(s"(n - 1) DIV $step"))))
      .withColumn("start_tok", col("chunk_id") * step)
      .withColumn("n_tok",
        least(lit(chunkTokens.toLong), col("n") - col("start_tok")))
      .select(col(idCol), col("chunk_id"), col("start_tok"), col("n_tok"),
        concat_ws(" ", slice(col("tk"),
          (col("start_tok") + 1).cast("int"), col("n_tok").cast("int")))
          .as("chunk_text"))
  }

  private val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "is", "and"),
    "es" -> Seq("la", "el", "y", "de"),
    "fr" -> Seq("le", "la", "et", "un"),
    "de" -> Seq("der", "die", "und", "ein"),
    "zh" -> Seq("de", "shi", "he", "zai"),
  )

  /** N-gram/marker-word language-ID heuristic: score each language
    * profile by marker-token hits, predict the argmax (ties broken by
    * profile order). Deterministic and SQL-expressible so the oracle
    * can replay it exactly.
    */
  /** End-to-end curation verdict: one row per document with its
    * cluster label (near-dup connected component), language call,
    * token count, and the final `kept` decision — canonical in its
    * cluster ∧ length in band ∧ confident language call. This is the
    * composed pipeline a training-data run executes before writing the
    * kept set; every input is itself an oracled operator.
    */
  def curate(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.llm.DedupOps
    val clusters = DedupOps.dedupClusters(docs, idCol,
      DedupOps.minhashSignaturePairs(docs, idCol, textCol))
    val toks = tokens(col(textCol))
    val enriched = langId(docs, idCol, textCol)
      .select(col(idCol).cast("long").as("doc_id"),
        col("predicted"), col("score_en"))
    val lengths = docs.select(col(idCol).cast("long").as("doc_id"),
      size(toks).as("n_tokens"))
    clusters.join(enriched, "doc_id").join(lengths, "doc_id")
      .select(col("doc_id"), col("cluster_id"), col("predicted"), col("n_tokens"),
        (col("is_canonical") === 1 &&
          col("n_tokens") >= 20 && col("n_tokens") <= 200 &&
          col("score_en") > 0).cast("int").as("kept"))
  }

  /** Per-document top-k terms by TF-IDF, in exact fixed point so the
    * ranking is engine-portable: idf is quantized to
    * `(n_docs * 1e6) div df_term` (integer division) and the score is
    * `tf * idf_x1e6` — all BIGINT arithmetic, no floats, deterministic
    * ties broken by term.
    *
    * Scale shape: the tf table comes from the per-document
    * [[graft.functions.VecBridge.tokenTf]] kernel — each doc's
    * (term, tf) pairs counted inside ONE codegen'd call, so there is
    * no token-stream explode and no (doc, term) shuffle-aggregate at
    * all (the r11 plan paid that aggregate twice: the tf and df_t
    * branches are separate subtrees once column pruning specializes
    * them, and a shared explicit exchange measured slower than the
    * recompute because it shuffles the full string-keyed tf table).
    * The document-frequency leg is a vocabulary-sized aggregate
    * (map-side partials over one-row-per-(doc, term) input) joined
    * back onto the tf table — plan-time broadcast when the INPUT
    * corpus estimate fits the session threshold (a sound upper bound
    * on the vocab, see [[inputFitsBroadcast]]), AQE-decided when a
    * web-scale token tail might outgrow it — so everything that
    * shuffles is vocabulary- and doc-sized. The corpus size comes
    * from the raw documents scan (a count, no explode) and joins in
    * as a 1-row broadcast, never a driver-side collect; the final
    * top-k is a per-doc window over the already tf-aggregated rows,
    * exchange-free when the input is already doc-partitioned.
    */
  /** True when `df`'s plan-time size estimate fits the session's
    * broadcast threshold. Used to gate plan-time broadcast hints on
    * frames DERIVED from `df` whose own stats Catalyst cannot estimate
    * (aggregates over an explode default to huge/unknown): the derived
    * vocabulary is bytes-bounded by the corpus text itself, so the
    * input estimate is a sound upper bound. Above the threshold no
    * hint is attached and AQE's runtime join selection decides — the
    * safe direction for a web-scale token tail.
    */
  private[llm] def inputFitsBroadcast(df: DataFrame): Boolean = !df.isStreaming && {
    val conf = df.sparkSession.sessionState.conf
    conf.autoBroadcastJoinThreshold > 0 &&
      df.queryExecution.optimizedPlan.stats.sizeInBytes <=
        BigInt(conf.autoBroadcastJoinThreshold)
  }

  /** Distributed inverted-index build — the search/dedup
    * infrastructure half of a training-data pipeline (every
    * suffix-array / substring-dedup / retrieval system starts here):
    * per term, the document frequency `df_t`, collection frequency
    * `cf_t` (Σ tf), and a BOUNDED posting prefix — the top
    * `postingsCap` postings by (tf desc, doc_id asc) as a
    * `doc:tf,doc:tf,…` CSV. The cap is what makes the output
    * oracle-hashable AND scale-safe: a stopword's full posting list
    * is corpus-sized, so emitting it whole would concentrate one
    * unbounded string on one reducer; real index builds shard exactly
    * this way (posting blocks). Full lists live where they belong —
    * in the (doc, term, tf) table this derives from.
    *
    * Scale shape: the per-doc [[graft.functions.VecBridge.tokenTf]]
    * kernel produces one (doc, term, tf) row per pair with no token
    * explode; ONE shuffle by term feeds both the aggregates and the
    * per-term top-k window (same exchange — the window and the agg
    * cluster on the same key), which is THE canonical distributed
    * index build: map → partition by term → per-term reduce.
    */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
      postingsCap: Int = 8): DataFrame = {
    // the rank prefix is %03d and stripped as \d{3}: a 4-digit rank
    // would break both the lexicographic sort and the strip
    require(postingsCap >= 1 && postingsCap <= 999,
      s"postingsCap must be in [1, 999], got $postingsCap")
    import org.apache.spark.sql.expressions.Window
    val tf = df.select(col(idCol).as("doc_id"),
        explode(graft.functions.VecFunctions.token_tf(col(textCol))).as("kv"))
      .select(col("doc_id"), col("kv.term").as("term"), col("kv.tf").as("tf"))
    val w = Window.partitionBy("term")
      .orderBy(col("tf").desc, col("doc_id").asc)
    tf.withColumn("rnk", row_number().over(w))
      .withColumn("df_t", count(lit(1)).over(Window.partitionBy("term")))
      .withColumn("cf_t", sum(col("tf")).over(Window.partitionBy("term")))
      .filter(col("rnk") <= postingsCap)
      .groupBy("term", "df_t", "cf_t")
      .agg(concat_ws(",", sort_array(collect_list(
        // zero-pad the rank so lexicographic array order == rank order
        format_string("%03d|%s:%s", col("rnk"), col("doc_id"), col("tf")))))
        .as("postings_ranked"))
      .withColumn("postings",
        regexp_replace(col("postings_ranked"), "\\d{3}\\|", ""))
      .select(col("term"), col("df_t").cast("long").as("df_t"),
        col("cf_t").cast("long").as("cf_t"), col("postings"))
  }

  /** Persist an [[invertedIndex]] frame — the bake-time write of the
    * build→persist→serve retrieval path (same seam as
    * `Quantizers.saveModel` and the incremental-dedup banded
    * projection). At production scale the index is written
    * term-bucketed so [[indexServe]]'s term filter prunes at the scan.
    */
  def saveIndex(index: DataFrame, path: String): Unit =
    index.write.mode("overwrite").parquet(path)

  def loadIndex(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Serve a multi-term query from a (possibly reloaded) inverted
    * index: per candidate document, the matched-term count (`n_terms`
    * — `= terms.size` is the AND answer, `>= 1` the OR answer), total
    * tf over matched terms, and a df-based relevance score
    * (Σ tf · (10^9 div df_t) — rare terms dominate, exact integers),
    * ranked by (score desc, doc_id).
    *
    * Candidates come from the index's BOUNDED posting prefixes, which
    * is the serve-tier contract: everything after the term filter is
    * bounded by |terms| × postingsCap rows, so the rank window's
    * single-partition sort is a constant-size driver-adjacent step,
    * not a data-scaled one. The term filter itself is an `IN` over the
    * index scan — pushed to parquet row-group pruning, and at 100 TB
    * the index is term-bucketed so the probe reads a handful of files.
    */
  def indexServe(index: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "indexServe needs at least one query term")
    import org.apache.spark.sql.expressions.Window
    val hits = index.filter(col("term").isin(terms: _*))
      .select(col("term"), col("df_t"),
        explode(split(col("postings"), ",")).as("p"))
      .select(col("term"), col("df_t"),
        split(col("p"), ":").getItem(0).cast("long").as("doc_id"),
        split(col("p"), ":").getItem(1).cast("long").as("tf"))
    hits.groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_terms"),
        sum(col("tf")).cast("long").as("sum_tf"),
        sum(col("tf") * expr("1000000000L div df_t")).cast("long").as("score_x"))
      .withColumn("and_match",
        (col("n_terms") === lit(terms.size.toLong)).cast("int"))
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("score_x").desc, col("doc_id"))).cast("long"))
  }

  def tfidfTopK(df: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = df.select(col(idCol).as("doc_id"),
        explode(graft.functions.VecFunctions.token_tf(col(textCol))).as("kv"))
      .select(col("doc_id"), col("kv.term").as("term"), col("kv.tf").as("tf"))
    // one row per (doc, term) ⇒ df_t is a plain row count per term:
    // map-side partials make this exchange vocabulary-sized
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df_t"))
    val dfTB = if (inputFitsBroadcast(df)) broadcast(dfT) else dfT
    val nDocs = df.select(count(lit(1)).as("n_docs"))
    val scored = tf
      .join(dfTB, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score_x", col("tf") * expr("(n_docs * 1000000) div df_t"))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("score_x").desc, col("term").asc)))
      .filter(col("rnk") <= k)
      .select("doc_id", "term", "tf", "score_x", "rnk")
  }

  /** Per-document top-k terms by BM25 (Robertson-Spärck Jones term
    * saturation, k1 = 1.2, b = 0.75), in exact fixed point so the
    * ranking is engine-portable. The idf factor is the same quantized
    * ratio as [[tfidfTopK]] (`(n_docs * 1000) div df_term` — the log
    * of the Robertson idf is not exact in integers, and log is
    * monotone in the ratio so per-term idf ordering is preserved; this
    * is an integer-exact BM25 *variant*, not log-BM25 to the decimal).
    * The tf-saturation half is exact: with k1 = 6/5 and b = 3/4,
    *
    *   tf·(k1+1) / (tf + k1·(1−b) + k1·b·dl·n_docs/t_tokens)
    *
    * clears to integers when numerator and denominator are multiplied
    * by 10·t_tokens:
    *
    *   score_x = (idf_x · tf · 22 · t_tokens)
    *             div (10·t_tokens·tf + 3·t_tokens + 9·dl·n_docs)
    *
    * The numerator is computed in decimal(38,0) (HUGEINT on the
    * oracle side) — at web-corpus scale idf_x·tf·22·t_tokens
    * overflows 63 bits long before the corpus reaches 100 TB.
    *
    * Scale shape: identical to [[tfidfTopK]] — the per-document
    * tokenTf kernel replaces the token explode + (doc, term)
    * shuffle-aggregate, df_t is a vocabulary-sized aggregate joined
    * back (AQE broadcast when the vocab is small, shuffled join when
    * a web-scale token tail outgrows broadcast), and dl (doc length
    * in split-on-space tokens) is counted arithmetically per row
    * (spaces + 1), so there is no dl window and no second pass over
    * the token stream. Corpus totals come from the raw documents
    * scan (count + Σ token counts, no explode) and join in as a
    * 1-row broadcast, never a driver collect.
    */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // The tf table comes from the PER-DOCUMENT [[graft.functions
    // .VecBridge.tokenTf]] kernel: each doc's (term, tf) pairs are
    // counted inside one codegen'd call, so there is NO token-stream
    // explode and NO (doc, term) shuffle-aggregate — the r11 plan
    // exploded ~10M tokens and hash-aggregated them TWICE (the tf and
    // df_t branches are separate subtrees; exchange reuse cannot
    // deduplicate them once column pruning specializes the copies —
    // measured in the r12 plan audit, and an explicit shared term
    // exchange measured SLOWER than the double explode because it
    // shuffles the full string-keyed tf table). Here the duplicated
    // branch work is just the per-doc kernel, and dl (doc length in
    // split-on-space tokens, empties included) is counted
    // arithmetically as spaces+1 — no window, no second split.
    val dl = (length(col(textCol)) -
      length(translate(col(textCol), " ", "")) + 1).cast("long")
    val tf = df.select(col(idCol).as("doc_id"), dl.as("dl"),
        explode(graft.functions.VecFunctions.token_tf(col(textCol))).as("kv"))
      .select(col("doc_id"), col("kv.term").as("term"),
        col("kv.tf").as("tf"), col("dl"))
    // one row per (doc, term) ⇒ df_t is a plain row count per term:
    // map-side partials make this exchange vocabulary-sized
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df_t"))
    val dfTB = if (inputFitsBroadcast(df)) broadcast(dfT) else dfT
    // corpus totals are pure arithmetic over the raw scan (dl is
    // spaces+1 — no split, no explode) and broadcast as one row; with
    // both legs plan-time broadcast their build jobs run CONCURRENTLY
    // (measured: riding the corpus on the vocab exchange serializes
    // behind it and loses)
    val corpus = df.agg(count(lit(1)).as("n_docs"),
      sum(dl).cast("long").as("t_tokens"))
    val scored = tf
      .join(dfTB, "term")
      .crossJoin(broadcast(corpus))
      .withColumn("idf_x", expr("(n_docs * 1000) div df_t"))
      .withColumn("score_x", expr(
        """(CAST(idf_x AS DECIMAL(38,0)) * tf * 22 * t_tokens)
          | div (10 * t_tokens * tf + 3 * t_tokens + 9 * dl * n_docs)""".stripMargin))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("score_x").desc, col("term").asc)))
      .filter(col("rnk") <= k)
      .select("doc_id", "term", "tf", "score_x", "rnk")
  }

  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val scores = LangMarkers.map { case (lang, words) =>
      markerCount(col(textCol), words).as(s"score_$lang")
    }
    val langs = LangMarkers.map(_._1)
    // argmax with first-profile-wins tie-break, as a nested CASE
    val predicted = langs.init.zipWithIndex.foldRight(lit(langs.last)) {
      case ((lang, i), rest) =>
        val laterCols = langs.drop(i + 1).map(l => col(s"score_$l"))
        val laterMax = if (laterCols.size == 1) laterCols.head else greatest(laterCols: _*)
        when(col(s"score_$lang") >= laterMax, lang).otherwise(rest)
    }
    df.select((col(idCol) +: scores): _*)
      .withColumn("predicted", predicted)
  }
}
