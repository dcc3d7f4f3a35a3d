package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a large-scale training-data pipeline
  * needs beyond dedup: benchmark decontamination, deterministic
  * stratified sampling, sequence packing, and global n-gram stats.
  *
  * Scale design notes (100 TB corpus):
  *   - decontaminate: the benchmark shingle set is tiny (benchmarks
  *     are MBs, corpora are TBs) — it broadcasts, so the corpus side
  *     is one linear scan + broadcast hash join, no corpus shuffle.
  *   - stratifiedSample: pure per-row arithmetic on (id, stratum) —
  *     a map-only filter, no shuffle, and deterministic across runs
  *     (unlike `df.sample`, which depends on partitioning).
  *   - seqPack: one window shuffle per stratum, cumulative sums only
  *     (no per-group iteration); the pack assignment is the standard
  *     concat-and-split packing used for LLM pretraining batches.
  *   - ngramTopK: map-side partial aggregation collapses the n-gram
  *     explosion before the shuffle; top-k is TakeOrdered (no global
  *     sort materialization).
  */
object PipelineOps {

  /** Whitespace tokens with empties dropped (the shared tokenizer). */
  private def toks(c: Column): Column =
    filter(split(c, "\\s+"), t => length(t) > 0)

  /** Benchmark decontamination: flag every corpus document sharing at
    * least one 3-token shingle with any benchmark document. Returns
    * non-benchmark docs with their contaminated-shingle count.
    *
    * `isBenchmark` partitions the input (the held-out eval set vs the
    * training corpus). Matching is on the codegen'd mod-prime shingle
    * FINGERPRINT (the same unit the arithmetic MinHash min-reduces) —
    * an 8-byte join key instead of a shingle string, which keeps the
    * explode narrow and the scan inside whole-stage codegen (the
    * string-shingle HOF formulation measured ~10x slower).
    */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
      isBenchmark: Column): DataFrame = {
    val fps = array_distinct(
      graft.functions.VecFunctions.arith_shingle_fps(col(textCol)))
    val shingled = docs.select(col(idCol).as("doc_id"),
      isBenchmark.as("is_bench"), fps.as("fps"))
    val bench = shingled.filter(col("is_bench"))
      .select(explode(col("fps")).as("fp")).distinct()
    val corpus = shingled.filter(!col("is_bench"))
    val hits = corpus.select(col("doc_id"), explode(col("fps")).as("fp"))
      .join(broadcast(bench), Seq("fp"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
    corpus.select("doc_id").join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).cast("int").as("contaminated"))
  }

  /** DSIR-style importance scores (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling", arXiv:2302.03169):
    * score raw documents by how target-like their hashed-n-gram
    * profile is, so a curation pipeline can resample toward a target
    * domain. Features are the paper's bag of hashed unigrams+bigrams
    * ([[graft.functions.VecFunctions.arith_ngram_fps]] mod `nBuckets`);
    * the per-bucket weight is the Laplace-smoothed target/raw
    * frequency ratio in exact fixed point,
    * w_f = floor(1e6·(t_f+1)/(r_f+1)), and a document's score sums
    * w over its feature OCCURRENCES — the log-free integer analogue
    * of the paper's Σ count·(log p − log q) (the global normalizer
    * (R+B)/(T+B) scales every score equally, so the resampling ORDER
    * it induces is unchanged and everything stays hash-comparable).
    * Resample by (dsir_score desc) with [[stratifiedSample]] /
    * [[groupQuota]] downstream.
    *
    * Scale shape: one corpus scan to features, one groupBy(f) over at
    * most `nBuckets` result groups, the (tiny, bounded) weight table
    * broadcast back onto the feature stream, one groupBy(doc). No
    * corpus shuffle wider than the exploded feature stream; documents
    * with no tokens have no features and drop (same as the oracle).
    */
  def dsirScores(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, nBuckets: Int = 10000): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val feats = docs.select(col(idCol).cast("long").as("doc_id"),
        isTarget.cast("int").as("is_t"),
        explode(graft.functions.VecFunctions.arith_ngram_fps(col(textCol))).as("fp"))
      .select(col("doc_id"), col("is_t"), (col("fp") % nBuckets).as("f"))
    val weights = feats.groupBy("f")
      .agg(count(lit(1)).as("r_f"), sum(col("is_t")).as("t_f"))
      .select(col("f"),
        expr("CAST(((t_f + 1) * 1000000) DIV (r_f + 1) AS BIGINT)").as("w"))
    feats.join(broadcast(weights), Seq("f"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_features"),
        sum(col("w")).as("dsir_score"))
  }

  /** Deterministic stratified sampling: keep a row iff
    * ((id & 0x7fffffff) · 2654435761) mod 1000 < quota(stratum), i.e.
    * a Knuth multiplicative hash of the id thins each stratum to
    * quota/1000. Reproducible across engines, runs, and partitionings —
    * the property `df.sample` cannot give — so downstream training sets
    * are exactly re-derivable from the raw corpus.
    *
    * The id is masked to 31 bits BEFORE the multiply: the product is
    * then < 2^31 · 2654435761 ≈ 5.7e18 < Long.MaxValue, so the same
    * formula evaluates identically in Spark (which would silently wrap
    * in non-ANSI mode) and in ANSI engines (which would raise) for ids
    * beyond ~3.46e9 — production id scales hit that.
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      quotaPerMille: Column): DataFrame = {
    val bucket = sampleHash(col(idCol)) % 1000
    df.withColumn("bucket", bucket)
      .filter(col("bucket") < quotaPerMille)
  }

  /** Overflow-safe Knuth multiplicative hash shared by the sampling
    * operators (mask to 31 bits, then multiply — never wraps a Long).
    */
  private def sampleHash(id: Column): Column =
    id.bitwiseAND(lit(2147483647L)) * lit(2654435761L)

  /** Deterministic shard plan — the export step of a curation run:
    * within each source, documents accumulate in the same hash order
    * the sampling/mixing operators use, and a document lands in the
    * shard its STARTING token offset falls in (`(cum − n) div
    * shardTokens` — greedy packing, so a shard can overrun by at most
    * one document, never undershoot by one). The plan is pure metadata
    * (doc_id → shard_id); [[writeShards]] materializes it.
    *
    * Scale shape: one token-count map + the per-source running-total
    * window — the same single corpus pass as [[tokenBudgetMix]]; the
    * shard assignment is arithmetic on the window output. Same skew
    * caveat: one giant source serializes into one window partition —
    * pre-split upstream if a source dominates.
    */
  def shardPlan(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, shardTokens: Long): DataFrame = {
    require(shardTokens >= 1, s"shardTokens must be >= 1, got $shardTokens")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source")
      .orderBy(sampleHash(col("doc_id")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol).as("doc_id"), col(sourceCol).as("source"),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("shard_id",
        expr(s"(cum_tokens - n_tokens) div ${shardTokens}L"))
  }

  /** Per-shard manifest of a [[shardPlan]]: document and token counts
    * per (source, shard) — the sidecar a training loader reads to plan
    * epochs without listing files. One vocabulary-sized hash-agg.
    */
  def shardManifest(plan: DataFrame): DataFrame =
    plan.groupBy("source", "shard_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("shard_tokens"),
        min(col("doc_id")).as("min_doc_id"), max(col("doc_id")).as("max_doc_id"))

  /** Materialize a [[shardPlan]]: join the assignment back to the
    * documents (broadcast-sized only when the plan was filtered —
    * normally a co-partitioned equi-join on doc_id) and write parquet
    * partitioned by (source, shard_id), so a loader addresses one
    * shard as one directory. Returns the manifest.
    */
  def writeShards(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, shardTokens: Long, outDir: String): DataFrame = {
    val plan = shardPlan(df, idCol, textCol, sourceCol, shardTokens)
    df.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .join(plan.select("doc_id", "source", "shard_id"), Seq("doc_id"))
      .write.partitionBy("source", "shard_id").mode("overwrite").parquet(outDir)
    shardManifest(plan)
  }

  /** Bloom-filter membership: build a Bloom filter over the build
    * side's 64-bit content keys and probe every probe-side key against
    * it — the compact seen-set primitive of cross-snapshot URL/content
    * dedup at 100 TB (a multi-billion-key exact set doesn't broadcast;
    * `numBits/8` bytes of Bloom does). Deterministic to the bit, false
    * positives included: positions come from double hashing (Kirsch &
    * Mitzenmacher 2006, `pos_i = (b1 + i·b2) mod m`) with the two base
    * hashes derived from the key's low/high 31-bit halves by
    * overflow-safe Knuth multiplies, `b2` forced odd so the probe
    * sequence cycles the whole power-of-two bit space. `numBits` must
    * be a power of two: every reduction is a bit mask, so the exact
    * same integers fall out of any ANSI engine (the oracle runs this
    * in HUGEINT with `&`, avoiding HUGEINT division entirely).
    *
    * Returns one row per probe doc: `(doc_id, n_hit, member)` with
    * `member = 1` iff all `numHashes` probed bits are set.
    *
    * Scale shape: build side is one map (position explode) plus a
    * distinct whose output is bounded by `numBits` rows no matter the
    * corpus size; the bit set broadcasts to the probe join (never a
    * corpus-sized shuffle); the probe side is a map plus a per-doc
    * hash-agg of `numHashes` rows with map-side combine.
    */
  def bloomMembership(build: DataFrame, probe: DataFrame, idCol: String,
      keyCol: String, numBits: Int = 1 << 16, numHashes: Int = 4): DataFrame = {
    require(numBits >= 4 && (numBits & (numBits - 1)) == 0,
      s"numBits must be a power of two, got $numBits")
    val mask = lit((numBits - 1).toLong)
    def positions(key: Column): Column = {
      val h1 = key.bitwiseAND(lit(2147483647L)) * lit(2654435761L)
      val h2 = shiftright(key, 31).bitwiseAND(lit(2147483647L)) * lit(2246822519L)
      val b1 = h1.bitwiseAND(mask)
      val b2 = h2.bitwiseAND(lit((numBits - 2).toLong)) + lit(1L) // odd
      array((0 until numHashes).map(i => (b1 + lit(i.toLong) * b2).bitwiseAND(mask)): _*)
    }
    val bits = build.select(explode(positions(col(keyCol))).as("pos")).distinct()
    probe.select(col(idCol).as("doc_id"), explode(positions(col(keyCol))).as("pos"))
      .join(broadcast(bits.withColumn("hit", lit(1))), Seq("pos"), "left")
      .groupBy("doc_id")
      .agg(sum(coalesce(col("hit"), lit(0))).cast("int").as("n_hit"))
      .withColumn("member", (col("n_hit") === numHashes).cast("int"))
  }

  /** Token-budget corpus mixing (the Dolma/Pile mixing pass): within
    * each source, keep documents in multiplicative-hash order until
    * the running token total reaches that source's budget. Prefix-cut
    * semantics — once the cumulative sum passes the budget every later
    * doc in hash order is dropped too (no back-filling with smaller
    * docs), which keeps the kept set a pure deterministic function of
    * (corpus, budgets), re-derivable across engines and runs.
    *
    * `budgetTokens` is a Column so budgets can come from a literal, a
    * CASE over the source, or a joined-in mixing table.
    *
    * Scale shape: one scan computes token counts map-only; the only
    * shuffle is the per-source window (hash-partition on source, sort
    * by the 64-bit hash). Skew note: a single giant source serializes
    * into one window partition — pre-split such a source upstream or
    * cut it with [[stratifiedSample]] first.
    */
  def tokenBudgetMix(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, budgetTokens: Column): DataFrame =
    tokenBudgetMixWith(df, idCol, sourceCol,
      size(split(col(textCol), " ")), budgetTokens)

  /** [[tokenBudgetMix]] fed by a CALLER-SUPPLIED per-doc token count —
    * the learned-tokenizer consumer: once a trained tokenizer exists
    * (q_llm_bpe_apply), budgets are denominated in ITS counts, and
    * the fixed whitespace count mis-states them wherever segmentation
    * differs. Same prefix-cut semantics and scale shape. */
  def tokenBudgetMixWith(df: DataFrame, idCol: String, sourceCol: String,
      nTokens: Column, budgetTokens: Column): DataFrame =
    // nTokens keeps the caller's integer type (INT for the whitespace
    // count, BIGINT for learned-tokenizer counts) — the oracle pins it
    budgetPrefixCut(df.select(col(idCol).as("doc_id"), col(sourceCol).as("source"),
      nTokens.as("n_tokens"),
      budgetTokens.cast("long").as("budget")))
      .select("doc_id", "source", "n_tokens", "cum_tokens")

  /** Temperature-scaled corpus mixing (the UniMax / multilingual
    * α = 1/2 sampling pass): each source's share of `totalBudget`
    * tokens is proportional to √(its token count), flattening the
    * head sources and lifting the tail relative to natural
    * proportions; documents are then kept by the same hash-order
    * prefix cut as [[tokenBudgetMix]]. Exact in integers end to end:
    * the square root is an exact integer isqrt (double guess,
    * corrected by ±1 with integer compares — floor(√n) precisely, on
    * any engine whose double sqrt is within one ulp), and each budget
    * is `(totalBudget · w_s) div Σw` with the product carried in
    * decimal(38,0) (HUGEINT on the oracle side).
    *
    * Scale shape: one per-source token-count hash-agg (rows =
    * #sources), a scalar Σw broadcast, the tiny budget table
    * broadcast-joined back, then the per-source prefix-cut window —
    * the corpus itself crosses the wire once, in the window.
    */
  def temperatureMix(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, totalBudget: Long): DataFrame = {
    require(totalBudget >= 0, s"totalBudget must be >= 0, got $totalBudget")
    val base = df.select(col(idCol).as("doc_id"), col(sourceCol).as("source"),
      size(split(col(textCol), " ")).as("n_tokens"))
    val weighted = base.groupBy("source").agg(sum(col("n_tokens")).as("n_src"))
      .withColumn("w", isqrt(col("n_src")))
    val totals = weighted.agg(sum(col("w")).as("w_sum"))
    val budgets = weighted.crossJoin(broadcast(totals))
      .withColumn("budget",
        expr(s"(CAST($totalBudget AS DECIMAL(38,0)) * w) div w_sum"))
      .select("source", "budget")
    budgetPrefixCut(base.join(broadcast(budgets), Seq("source")))
      .select("doc_id", "source", "n_tokens", "cum_tokens", "budget")
  }

  /** Exact floor(√n) for non-negative longs: double-sqrt guess,
    * corrected by ±1 with pure integer comparisons.
    */
  private def isqrt(n: Column): Column = {
    val g = floor(sqrt(n.cast("double"))).cast("long")
    when((g + 1) * (g + 1) <= n, g + 1)
      .when(g * g > n, g - 1)
      .otherwise(g)
  }

  /** Shared prefix-cut window: keep each source's documents in
    * multiplicative-hash order while the running token total stays
    * within that row's `budget` column.
    */
  private def budgetPrefixCut(base: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source")
      .orderBy(sampleHash(col("doc_id")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= col("budget"))
  }

  /** The assembled curation run — the story a reference user executes
    * end to end, composed purely from the independently-oracled
    * operators: near-dup clustering keeps one canonical per MinHash
    * cluster, the language gate keeps confident-English docs, the
    * decontamination pass drops benchmark docs and anything sharing a
    * shingle fingerprint with them, and the survivors are
    * temperature-mixed to `totalBudget` tokens ([[temperatureMix]]'s
    * α = 1/2 sqrt budgets). Output is the final mixed selection:
    * (doc_id, source, n_tokens, cum_tokens, budget).
    *
    * Scale shape: each stage keeps its own audited shape (band-bucket
    * join, map-only gates, broadcast shingle semi-join, one window);
    * the stages hand each other doc-id sets, so the gates compose as
    * semi-joins on the id — the corpus text is scanned per stage but
    * never shuffled except inside the clustering and the final window.
    */
  def curationPipeline(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, isBenchmark: Column, totalBudget: Long): DataFrame = {
    import graft.llm.{DedupOps, TextOps}
    val canonical = DedupOps.dedupClusters(docs, idCol,
        DedupOps.minhashSignaturePairs(docs, idCol, textCol))
      .filter(col("is_canonical") === 1).select(col("doc_id").as(idCol))
    val confident = TextOps.langId(docs, idCol, textCol)
      .filter(col("score_en") > 0).select(col(idCol))
    val clean = decontaminate(docs, idCol, textCol, isBenchmark)
      .filter(col("contaminated") === 0).select(col("doc_id").as(idCol))
    val kept = docs.select(col(idCol), col(textCol), col(sourceCol))
      .join(canonical, Seq(idCol), "left_semi")
      .join(confident, Seq(idCol), "left_semi")
      .join(clean, Seq(idCol), "left_semi")
    temperatureMix(kept, idCol, textCol, sourceCol, totalBudget)
  }

  /** Per-stratum quota cap: keep at most `k` rows per stratum, chosen
    * deterministically by multiplicative-hash order of the id (the
    * "at most N documents per domain" cap of web-corpus curation —
    * hash order makes the kept set a uniform-ish, re-derivable sample
    * rather than an id-ordered prefix). One window shuffle.
    */
  def groupQuota(df: DataFrame, idCol: String, stratumCol: String,
      k: Int): DataFrame = {
    val h = sampleHash(col(idCol)) % lit(1000000007L)
    val w = Window.partitionBy(stratumCol).orderBy(h, col(idCol))
    df.withColumn("smpl_rank", row_number().over(w).cast("long"))
      .filter(col("smpl_rank") <= k)
  }

  /** Cross-source score CALIBRATION: raw quality scores are not
    * comparable across sources (each source has its own length/style
    * prior), so curation pipelines convert them to within-source
    * percentile ranks before applying one global keep threshold.
    * Exact order statistics — one window per source, deterministic
    * ties via the id — quantized to permille; both engines evaluate
    * the identical `floor(percent_rank·1000)` (same IEEE double ops
    * in the same order), so the rank column is hash-oracled, not just
    * bound-checked. Same skew caveat as every per-stratum window: a
    * dominant source serializes into one partition.
    *
    * The score column keeps its OWN type — percent_rank only needs an
    * ordering, so real-valued classifier scores in [0, 1) calibrate
    * correctly (an earlier draft cast to long, which would have
    * silently collapsed fractional scores to all-ties). Callers
    * wanting an oracle-hashable score column quantize it themselves.
    */
  def calibrateBySource(df: DataFrame, idCol: String, sourceCol: String,
      scoreCol: Column): DataFrame = {
    val w = Window.partitionBy(sourceCol).orderBy(col("cal_score"), col(idCol))
    df.withColumn("cal_score", scoreCol)
      .withColumn("pr_milli",
        floor(percent_rank().over(w) * lit(1000)).cast("long"))
  }

  /** WEIGHTED top-k sample per stratum — quality-weighted subsampling,
    * the curation step between scoring and mixing: rows compete by
    * priority `(w · 2^33) DIV (u + 1)` where `u` is the shared
    * [[sampleHash]] uniform and `w` the clamped weight, so a row's
    * odds rise monotonically with its weight while selection stays
    * fully deterministic and engine-portable. This is PRIORITY
    * sampling, not exact Efraimidis-Spirakis A-ES (that needs
    * `u^(1/w)`, which no integer formula expresses) — the documented
    * trade is the same as the arithmetic-MinHash twin: a slightly
    * different inclusion distribution in exchange for bit-identical
    * reproducibility across engines, re-runs and partitionings.
    * Overflow-safe by construction: w ≤ 2^20 and u < 2^30, so
    * w · 2^33 ≤ 2^53 — exact in every engine's BIGINT and in doubles.
    * Fractional weight columns (double/float/positive-scale decimal —
    * the classifier-score case) are detected from the input schema
    * and scaled by 1e6 before the integer clamp, so real-valued
    * weights in (0, 1) rank correctly instead of collapsing to
    * all-ties uniform.
    *
    * Scale shape: one window per stratum over (weight, hash)-augmented
    * rows — identical to [[groupQuota]]'s adjudicated single-shuffle
    * shape; a dominant stratum serializes into one partition, the
    * same documented skew caveat (pre-split or salt upstream).
    */
  def weightedSample(df: DataFrame, idCol: String, stratumCol: String,
      weightCol: Column, k: Int): DataFrame = {
    val u = sampleHash(col(idCol)) % lit(1000000007L)
    // Fractional weight columns (the classifier-quality-score case:
    // doubles in [0, 1)) are scaled to integers HERE — a bare
    // cast("long") would floor them all to 0, clamp to 1, and
    // silently degrade the sample to uniform (the exact all-ties
    // hazard calibrateBySource's doc records). 1e6 preserves six
    // significant digits and stays inside the 2^20 clamp; integer
    // weight columns pass through unscaled. Resolved from the input
    // schema at plan time — driver-only, no data touched.
    val isFractional = {
      import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType}
      df.select(weightCol.as("w")).schema.head.dataType match {
        case DoubleType | FloatType => true
        case d: DecimalType => d.scale > 0
        case _ => false
      }
    }
    // Fractional weights must lie in (0, 1] (the classifier-score
    // contract — rank-normalize upstream, e.g. calibrateBySource's
    // percent_rank, when scores mix magnitudes): a weight above 1
    // would scale PAST the 2^20 clamp and tie with every other large
    // weight, and a weight <= 0 floors to <=0 and ties at the MINIMUM
    // clamp — both are the silent all-ties collapse this scaling
    // exists to prevent — so either end fails loudly. NULL weights
    // skip the guard and degrade to the minimum weight below.
    val wScaled =
      if (isFractional)
        when(weightCol.isNull, lit(null).cast("long"))
          .when(weightCol > lit(0.0d) && weightCol <= lit(1.0d),
            (weightCol * lit(1000000L)).cast("long"))
          .otherwise(raise_error(concat(
            lit("weightedSample: fractional weight outside (0,1] ties " +
              "at a clamp — rank-normalize to (0,1] upstream; got "),
            weightCol.cast("string"))).cast("long"))
      else weightCol.cast("long")
    // NULL weights degrade to the MINIMUM weight, not the maximum:
    // least()/greatest() skip nulls, so without the coalesce a
    // null-weighted row would clamp to 2^20 and dominate the sample —
    // the opposite of sane treatment for unscored rows
    val w = greatest(least(coalesce(wScaled, lit(1L)),
      lit(1L << 20)), lit(1L))
    val win = Window.partitionBy(stratumCol).orderBy(col("smpl_pri").desc,
      col(idCol))
    // integer DIV, never the double `/` operator: the numerator runs
    // to 2^53, where double-rounded division can land one past the
    // floor — the oracle's integer floor-div would then disagree
    df.withColumn("smpl_u", u).withColumn("smpl_w", w)
      .withColumn("smpl_pri", expr("smpl_w * 8589934592L DIV (smpl_u + 1L)"))
      .drop("smpl_u", "smpl_w")
      .withColumn("smpl_rank", row_number().over(win).cast("long"))
      .filter(col("smpl_rank") <= k)
  }

  /** Sequence packing (concat-and-split): documents are laid out
    * back-to-back per stratum in id order and cut into fixed
    * `capacity`-token packs; a document starts in pack
    * floor(prefix_tokens / capacity) at offset prefix_tokens mod
    * capacity. One cumulative-sum window per stratum — no per-group
    * iteration, no driver loop.
    */
  def seqPack(df: DataFrame, idCol: String, stratumCol: String,
      textCol: String, capacity: Int = 2048): DataFrame = {
    val w = Window.partitionBy(stratumCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol), col(stratumCol),
        size(toks(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("tokens_before", coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(col(idCol), col(stratumCol), col("n_tokens"),
        (col("tokens_before") / capacity).cast("long").as("pack_id"),
        (col("tokens_before") % capacity).as("pack_offset"))
  }

  /** PII-pattern scan (the redaction/filter pre-pass of a training
    * corpus): counts of email-, phone- and IPv4-shaped matches per
    * document. Patterns stay in the RE2-compatible subset so external
    * engines count identically; a production pass would swap in a
    * vetted PII ruleset — the operator shape (scan-only, map-side,
    * no shuffle) is the point.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+[0-9]{7,15}"
  val Ipv4Re = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  def piiCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      regexp_count(col(textCol), lit(EmailRe)).cast("long").as("n_email"),
      regexp_count(col(textCol), lit(PhoneRe)).cast("long").as("n_phone"),
      regexp_count(col(textCol), lit(Ipv4Re)).cast("long").as("n_ipv4"))

  /** PII redaction — the masking half of the [[piiCounts]] scan:
    * emails → `<EMAIL>`, then +country-code phones → `<PHONE>`, then
    * IPv4 literals → `<IP>`, in that fixed order (order matters where
    * patterns could overlap — a dotted-quad inside an email's domain
    * is consumed by the email pass first, never double-masked). Same
    * demo-ruleset caveat as [[piiCounts]]; `n_redacted` reports the
    * total masks placed so a downstream gate can drop documents whose
    * redaction density is too high.
    *
    * Scale shape: map-only — three codegen'd regexp passes per row, no
    * shuffle, no UDF.
    */
  def piiRedact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val masked = regexp_replace(regexp_replace(regexp_replace(col(textCol),
      lit(EmailRe), lit("<EMAIL>")),
      lit(PhoneRe), lit("<PHONE>")),
      lit(Ipv4Re), lit("<IP>"))
    df.select(col(idCol), masked.as("redacted"),
      (regexp_count(masked, lit("<EMAIL>")) - regexp_count(col(textCol), lit("<EMAIL>")) +
        regexp_count(masked, lit("<PHONE>")) - regexp_count(col(textCol), lit("<PHONE>")) +
        regexp_count(masked, lit("<IP>")) - regexp_count(col(textCol), lit("<IP>")))
        .cast("long").as("n_redacted"))
  }

  /** Common-bigram coverage — a cheap LM-flavored quality score: the
    * fraction (per mille) of a document's bigram INSTANCES that appear
    * in the corpus-wide top-`k` bigram list. Fluent text reuses common
    * transitions; gibberish and boilerplate don't. Two passes: the
    * top-k list (tiny) broadcasts back over the corpus — no
    * corpus-sized shuffle.
    */
  /** CCNet-style bigram-LM perplexity scoring (Wenzek et al. 2020
    * train a KenLM on a reference corpus and keep the low-perplexity
    * tail; this is that filter with the LM reduced to a
    * Laplace-smoothed word-bigram model and the arithmetic made
    * ENGINE-PORTABLE): a conditional model is trained on the
    * `isRef` subset — bigram counts `c(w1 w2)`, context counts
    * `c(w1 ·)`, continuation vocabulary V — and every non-reference
    * document is scored by its total negative log-likelihood
    *
    *   nll_x16 = −Σ_bigrams [ ilog2x16(c12 + 1) − ilog2x16(c1 + V) ]
    *
    * in 16.16 fixed point via the integer-only
    * [[graft.functions.VecBridge.ilog2x16]] (no libm, no doubles —
    * both engines run the same 16 square-and-carry steps, so the
    * scores hash-compare exactly), plus the per-bigram normalization
    * `bits_milli = nll_x16·1000 DIV (n_bigrams·65536)` — millibits
    * per bigram, the quantity a perplexity threshold cuts on
    * (perplexity = 2^(bits)). Unseen bigrams smooth to 1/(c1+V);
    * unseen contexts to 1/V.
    *
    * Scale shape: the model tables are VOCABULARY-bounded (bigram
    * types / context types), never corpus-bounded — they join back to
    * the exploded probe stream as plan-time broadcasts when the input
    * estimate fits (same sound upper-bound gate as bm25's vocab leg)
    * and as term-keyed shuffled joins on a web-scale tail otherwise;
    * V is a 1-row broadcast. Scoring is then ONE doc-keyed aggregate;
    * `explode_outer` keeps zero-bigram documents in that same pass
    * (the lmCoverage trick — no restore join).
    */
  def lmPerplexity(docs: DataFrame, idCol: String, textCol: String,
      isRef: Column): DataFrame = {
    import graft.functions.VecFunctions.word_bigrams
    val bg = docs.select(col(idCol), isRef.as("is_ref"),
      explode_outer(word_bigrams(col(textCol))).as("bigram"))
    // tokens are whitespace-split, so a bigram contains EXACTLY one
    // space: substring_index is an unambiguous (w1, w2) split
    val refBg = bg.filter(col("is_ref") && col("bigram").isNotNull)
    val c12 = refBg.groupBy("bigram").agg(count(lit(1)).as("c12"))
    val c1 = refBg
      .groupBy(substring_index(col("bigram"), " ", 1).as("w1"))
      .agg(count(lit(1)).as("c1"))
    val vocab = refBg
      .agg(count_distinct(substring_index(col("bigram"), " ", -1)).as("v"))
    scoreBigramLm(bg.filter(!col("is_ref")), idCol, c12, c1, vocab,
      gateOn = docs)
  }

  /** The bigram LM as ONE persistable model frame — `(kind, key,
    * cnt)` rows for the bigram counts, context counts and the
    * continuation-vocabulary size — the train-once half of the
    * train→persist→serve seam (`Quantizers.saveModel` layout: the
    * frame is vocabulary-bounded). [[lmPerplexityServe]] scores an
    * arriving batch from it; [[lmPerplexity]] is the fused
    * train+score form, and the two share [[scoreBigramLm]] so they
    * cannot drift.
    */
  def trainBigramLm(docs: DataFrame, idCol: String, textCol: String,
      isRef: Column): DataFrame = {
    import graft.functions.VecFunctions.word_bigrams
    val refBg = docs.filter(isRef)
      .select(explode(word_bigrams(col(textCol))).as("bigram"))
    refBg.groupBy("bigram").agg(count(lit(1)).as("cnt"))
      .select(lit("bigram").as("kind"), col("bigram").as("key"), col("cnt"))
      .unionByName(refBg
        .groupBy(substring_index(col("bigram"), " ", 1).as("key"))
        .agg(count(lit(1)).as("cnt"))
        .select(lit("ctx").as("kind"), col("key"), col("cnt")))
      .unionByName(refBg
        .agg(count_distinct(substring_index(col("bigram"), " ", -1)).as("cnt"))
        .select(lit("vocab").as("kind"), lit("").as("key"), col("cnt")))
  }

  /** Score a document batch against a TRAINED (possibly reloaded)
    * bigram LM — the serve half of the seam. Output identical to
    * [[lmPerplexity]] over the same reference split.
    */
  def lmPerplexityServe(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame): DataFrame = {
    import graft.functions.VecFunctions.word_bigrams
    val bg = docs.select(col(idCol),
      explode_outer(word_bigrams(col(textCol))).as("bigram"))
    val c12 = model.filter(col("kind") === "bigram")
      .select(col("key").as("bigram"), col("cnt").as("c12"))
    val c1 = model.filter(col("kind") === "ctx")
      .select(col("key").as("w1"), col("cnt").as("c1"))
    val vocab = model.filter(col("kind") === "vocab")
      .select(col("cnt").as("v"))
    scoreBigramLm(bg, idCol, c12, c1, vocab, gateOn = model)
  }

  /** Shared scoring core: per-bigram Laplace-smoothed conditional
    * log-probs in 16.16 fixed point, one doc-keyed aggregate.
    * `gateOn` sizes the plan-time broadcast of the model legs (the
    * input corpus for the fused form — a sound upper bound — or the
    * model frame itself for the serve form).
    */
  private def scoreBigramLm(probeBg: DataFrame, idCol: String,
      c12: DataFrame, c1: DataFrame, vocab: DataFrame,
      gateOn: DataFrame): DataFrame = {
    import graft.functions.VecFunctions.ilog2_x16
    val fits = TextOps.inputFitsBroadcast(gateOn)
    val c12B = if (fits) broadcast(c12) else c12
    val c1B = if (fits) broadcast(c1) else c1
    val scored = probeBg
      .join(c12B, Seq("bigram"), "left")
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .join(c1B, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("lp_x16", when(col("bigram").isNotNull,
        ilog2_x16(coalesce(col("c12"), lit(0L)) + 1L) -
          ilog2_x16(coalesce(col("c1"), lit(0L)) + col("v"))))
    scored.groupBy(idCol)
      .agg(count(col("bigram")).as("n_bigrams"),
        coalesce(sum(-col("lp_x16")), lit(0L)).as("nll_x16"))
      .withColumn("bits_milli", when(col("n_bigrams") === 0, 0L)
        .otherwise(expr("nll_x16 * 1000 DIV (n_bigrams * 65536)")))
  }

  def lmCoverage(df: DataFrame, idCol: String, textCol: String,
      k: Int = 1000): DataFrame = {
    val top = ngramTopK(df, textCol, k).select(col("bigram"))
    // explode_OUTER keeps a null-bigram row for documents with no
    // bigrams, so one doc_id aggregate covers every document and the
    // old "join the id list back to restore empty docs" pass (an
    // extra corpus-keyed shuffle + join) disappears: count(bigram)
    // skips the null marker rows, the broadcast probe never matches
    // them, and the whole scoring pass is ONE shuffle (by doc) after
    // the tiny top-k broadcast.
    val exploded = df.select(col(idCol),
        explode_outer(graft.functions.VecFunctions.word_bigrams(col(textCol))).as("bigram"))
    exploded.join(broadcast(top.withColumn("hit", lit(1L))),
        Seq("bigram"), "left")
      .groupBy(idCol)
      .agg(count(col("bigram")).as("n_bigrams"),
        sum(coalesce(col("hit"), lit(0L))).as("n_common"))
      .select(col(idCol), col("n_bigrams"), col("n_common"),
        when(col("n_bigrams") === 0, 0L)
          .otherwise(floor(lit(1000) * col("n_common") / col("n_bigrams"))
            .cast("long")).as("cov_permille"))
  }

  /** Global top-k word bigrams by frequency (corpus-level n-gram
    * statistics), via the codegen'd `word_bigrams` kernel (the HOF
    * transform/element_at formulation is interpreted, ~20x slower).
    * Ties broken lexicographically so the cut is deterministic.
    */
  def ngramTopK(df: DataFrame, textCol: String, k: Int = 100): DataFrame =
    df.select(explode(
        graft.functions.VecFunctions.word_bigrams(col(textCol))).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("bigram").asc)
      .limit(k)

  /** Per-SOURCE top-k word bigrams — the corpus-composition gauge a
    * mixing pipeline reads before setting per-source budgets (which
    * phrases dominate each slice; a source whose top bigrams are
    * boilerplate is a dedup candidate). Same codegen'd `word_bigrams`
    * kernel as [[ngramTopK]]; one (source, bigram) hash-aggregate
    * shuffle (map-combined, vocabulary-sized) feeds one per-source
    * ranking window over the already-aggregated counts — the window
    * input is (sources × vocab)-sized, never token-stream-sized.
    * Deterministic cut: (cnt desc, bigram asc).
    */
  def ngramTopKBySource(df: DataFrame, textCol: String, sourceCol: String,
      k: Int = 5): DataFrame = {
    val w = Window.partitionBy("source")
      .orderBy(col("cnt").desc, col("bigram").asc)
    df.select(col(sourceCol).as("source"), explode(
        graft.functions.VecFunctions.word_bigrams(col(textCol))).as("bigram"))
      .groupBy("source", "bigram").agg(count(lit(1)).as("cnt"))
      .withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= k)
  }

  /** Corpus SNAPSHOT DIFF — the versioning step an incremental
    * training-data pipeline runs between two corpus states: per
    * document id, `added` (new only), `removed` (old only), `changed`
    * (both, different text), `unchanged`. One full-outer equi-join on
    * the id — co-partitioned inputs (the normal case: both snapshots
    * bucketed/partitioned by id) diff exchange-free, and nothing ever
    * compares more than the two versions of one document. Text
    * equality is exact bytes; callers wanting normalized comparison
    * pass pre-normalized frames.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val o = oldDf.select(col(idCol).as("doc_id"), col(textCol).as("_old_text"))
    val n = newDf.select(col(idCol).as("doc_id"), col(textCol).as("_new_text"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("_old_text").isNull, "added")
          .when(col("_new_text").isNull, "removed")
          .when(col("_old_text") === col("_new_text"), "unchanged")
          .otherwise("changed").as("status"))
  }
}
