package graft

/** DuckDB oracle SQL for the FNV-1a64 / splitmix64 fast-path kernels
  * ([[graft.functions.TextHash]]) — previously recorded as rows-only
  * with a "64-bit wrapping multiplication isn't SQL-expressible" note.
  * It is expressible: HUGEINT (int128) carries every intermediate.
  *
  *   - FNV step: `h*prime` with a 40-bit prime keeps the product under
  *     2^104, so one HUGEINT multiply + `% 2^64` wraps exactly; the
  *     byte xor touches only the low 8 bits (`h - h%256 + xor(h%256,c)`).
  *   - splitmix64: the mix constants are 64-bit, so the 64×64 wrapping
  *     multiply splits 32/32: `(((a>>32)*b) & (2^32-1))*2^32 + (a & (2^32-1))*b`
  *     (every term stays under 2^97). DuckDB does no common-subexpr
  *     elimination, so the three mix stages are staged through CTE
  *     columns — inlining them re-evaluates the tree per reference and
  *     was measured 15× slower. All mod-2^64/2^32 reductions are
  *     bitmasks and the 2^32 divide is a shift: HUGEINT division is
  *     ~25× slower than masking (20 s → 0.8 s on the 1.6M-row
  *     permutation pipeline at sf0.01).
  *   - Signatures live in the unsigned [0,2^64) HUGEINT domain and are
  *     converted to Spark's signed BIGINT only at the output edge
  *     (`u2s`); MinHash's per-slot min is a SIGNED min (TextHash uses
  *     `Long.<`), so slots convert before min and back after.
  *
  * Pinned against [[graft.functions.TextHash]] by the q_llm_fingerprints /
  * q_llm_simhash_pairs / q_llm_minhash_pairs hash-compare.
  */
object FnvOracleSql {

  private val Mod = "18446744073709551616::HUGEINT"
  private val Mask = "18446744073709551615::HUGEINT" // 2^64-1
  private val M32 = "4294967295::HUGEINT" // 2^32-1

  /** 64×64→64 wrapping multiply of HUGEINT `a` in [0,2^64) by constant `b`. */
  private def mul64(a: String, b: String): String =
    s"((((($a) >> 32) * ($b)) & $M32) * 4294967296::HUGEINT + (($a) & $M32) * ($b)) & $Mask"

  /** FNV-1a64 fold over a list of byte codes (HUGEINT). */
  private def fnvList(charList: String): String =
    s"""list_reduce(list_prepend(14695981039346656037::HUGEINT, $charList),
       |    (h, c) -> ((h - (h & 255) + xor((h & 255)::BIGINT, c::BIGINT)::HUGEINT)
       |               * 1099511628211::HUGEINT) & $Mask)""".stripMargin

  /** FNV-1a64 of a string expression (ASCII corpus: ord == byte). */
  private def fnvStr(s: String): String =
    fnvList(s"list_transform(range(1, length($s)+1), j -> ord(($s)[j])::HUGEINT)")

  /** [[fnvStr]] for oracle builders outside this object (the hashed-
    * classifier entries bucket bigram strings with it).
    *
    * CORPUS CONSTRAINT (applies to every oracle built on this —
    * lrScore, the nb train→serve oracle in Queries): bit-parity with
    * the Scala kernel holds only for ASCII text whose whitespace is
    * space/tab/\n/\r/\f, because (a) this folds per-CHARACTER
    * `ord()` codepoints while `TextHash.fnv1a64` folds UTF-8 BYTES —
    * identical on ASCII, divergent beyond U+007F — and (b) the
    * tokenizers differ on \x0B (vertical tab): Java's `\s` includes
    * it, DuckDB's RE2 `\s` does not. The synthetic documents corpus
    * satisfies both; a future non-ASCII corpus must either fold
    * codepoints in the Scala kernel or re-derive these oracles over
    * UTF-8 bytes before trusting the gate.
    */
  def fnvStrPublic(s: String): String = fnvStr(s)

  /** Unsigned HUGEINT in [0,2^64) → Spark's signed BIGINT. */
  private def u2s(v: String): String =
    s"CAST(CASE WHEN ($v) >= 9223372036854775808::HUGEINT THEN ($v) - $Mod ELSE ($v) END AS BIGINT)"

  /** splitmix64 staged as six CTEs over `src`'s column `z0`, keeping
    * key columns `ks`; the result lands in `<prefix>f.h`.
    */
  private[graft] def mix64Ctes(prefix: String, src: String, ks: Seq[String]): String = {
    val k = ks.mkString(", ")
    s"""${prefix}a AS (SELECT $k, (z0 + 11400714819323198485::HUGEINT) & $Mask AS z1 FROM $src),
       |${prefix}b AS (SELECT $k, xor(z1, z1 >> 30) AS x1 FROM ${prefix}a),
       |${prefix}c AS (SELECT $k, ${mul64("x1", "13787848793156543929::HUGEINT")} AS z2 FROM ${prefix}b),
       |${prefix}d AS (SELECT $k, xor(z2, z2 >> 27) AS x2 FROM ${prefix}c),
       |${prefix}e AS (SELECT $k, ${mul64("x2", "10725801012601166771::HUGEINT")} AS z3 FROM ${prefix}d),
       |${prefix}f AS (SELECT $k, xor(z3, z3 >> 31) AS h FROM ${prefix}e)""".stripMargin
  }

  /** Per-doc 64-bit SimHash signature (unsigned domain), as a CTE
    * chain ending in `sig(doc_id, text, sig_u)`.
    */
  private val sigCte = {
    val bitTerms = (0 until 64).map(b =>
      s"(CASE WHEN coalesce(list_sum(list_transform(th, h -> CASE WHEN (h >> $b) & 1::HUGEINT = 1::HUGEINT THEN 1 ELSE -1 END)), 0) > 0 THEN ${java.lang.Long.toUnsignedString(1L << b)}::HUGEINT ELSE 0::HUGEINT END)")
      .mkString("\n    + ")
    s"""tokh AS (
       |  SELECT doc_id, text,
       |    list_transform(list_filter(string_split_regex(text, '\\s+'), t -> length(t) > 0),
       |      t -> ${fnvStr("t")}) AS th
       |  FROM documents),
       |sig AS (SELECT doc_id, text, ($bitTerms) AS sig_u FROM tokh)""".stripMargin
  }

  /** q_llm_fingerprints: simhash64 + 16-char winnowing fingerprint.
    * The fingerprint min is an UNSIGNED compare (TextHash uses
    * compareUnsigned), so list_min runs in the HUGEINT domain.
    */
  /** Winnowing-fingerprint CTE (doc_id, fp_u) — shared by
    * `fingerprints` and `bloomSeen`.
    */
  private val fpCte: String =
    s"""fp AS (SELECT doc_id,
       |  CASE WHEN length(text) < 16 THEN ${fnvStr("text")}
       |  ELSE list_min(list_transform(range(1, length(text) - 14),
       |    i -> ${fnvList("list_transform(range(0, 16), j -> ord(text[i+j])::HUGEINT)")})) END AS fp_u
       |  FROM documents)""".stripMargin

  val fingerprints: String =
    s"""WITH $sigCte,
       |$fpCte
       |SELECT s.doc_id, ${u2s("s.sig_u")} AS simhash, ${u2s("fp.fp_u")} AS fingerprint
       |FROM sig s JOIN fp ON s.doc_id = fp.doc_id""".stripMargin

  /** q_llm_bloom_seen: Bloom seen-set over the even-doc_id half's
    * winnowing fingerprints, probed by the odd half. Double hashing
    * (Kirsch-Mitzenmacher) from the fp's low/high 31-bit halves; every
    * reduction is a bit mask (m = 2^16), so nothing here touches
    * HUGEINT division and the signed/unsigned representations agree
    * bit-for-bit (31-bit masked halves are sign-free).
    */
  /** q_llm_lr_score: hashed-linear-classifier inference — word-bigram
    * FNV feature hashing into 4096 buckets, deterministic arithmetic
    * pseudo-weights, integer score sum (TextOps.hashedLinearScore's
    * default-model path).
    */
  val lrScore: String =
    s"""WITH tk AS (
       |  SELECT doc_id,
       |         list_filter(string_split_regex(text, '\\s+'), t -> length(t) > 0) AS tk
       |  FROM documents),
       |bg AS (
       |  SELECT doc_id, unnest(CASE WHEN len(tk) >= 2
       |    THEN list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])
       |    ELSE CAST([] AS VARCHAR[]) END) AS bigram
       |  FROM tk),
       |h AS (
       |  SELECT doc_id,
       |         CAST((${fnvStr("bigram")}) & 4095::HUGEINT AS BIGINT) AS bucket
       |  FROM bg),
       |w AS (
       |  SELECT doc_id, (bucket + 1) * 2654435761 % 2001 - 1000 AS w FROM h)
       |SELECT doc_id, COUNT(*) AS n_feats, CAST(SUM(w) AS BIGINT) AS score
       |FROM w GROUP BY 1""".stripMargin

  val bloomSeen: String =
    s"""WITH $fpCte,
       |hs AS (
       |  SELECT doc_id, doc_id & 1 AS side,
       |         ((fp_u & 2147483647::HUGEINT) * 2654435761::HUGEINT) & 65535::HUGEINT AS b1,
       |         ((((fp_u >> 31) & 2147483647::HUGEINT) * 2246822519::HUGEINT) & 65534::HUGEINT) + 1::HUGEINT AS b2
       |  FROM fp),
       |pos AS (
       |  SELECT doc_id, side, (b1 + t.i::HUGEINT * b2) & 65535::HUGEINT AS pos
       |  FROM hs, (SELECT unnest(range(4)) AS i) t),
       |bits AS (SELECT DISTINCT pos FROM pos WHERE side = 0)
       |SELECT p.doc_id, CAST(count(b.pos) AS INT) AS n_hit,
       |       CAST(count(b.pos) = 4 AS INT) AS member
       |FROM pos p LEFT JOIN bits b ON p.pos = b.pos
       |WHERE p.side = 1
       |GROUP BY p.doc_id""".stripMargin

  /** q_llm_simhash_pairs: 16-bit pigeonhole chunks over the 64-bit
    * signature, hamming ≤ 3. xor/bit_count run in the unsigned domain —
    * identical bit patterns to Spark's signed xor/bit_count.
    */
  val simhashPairs: String =
    s"""WITH $sigCte,
       |chunks AS (
       |  SELECT doc_id, sig_u, t.i AS chunk,
       |    (sig_u >> (16 * CAST(t.i AS INT))) & 65535::HUGEINT AS key
       |  FROM sig, (SELECT unnest(range(4)) AS i) t)
       |SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
       |  CAST(bit_count(xor(a.sig_u, b.sig_u)) AS INT) AS hamming
       |FROM chunks a JOIN chunks b
       |  ON a.chunk = b.chunk AND a.key = b.key AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sig_u, b.sig_u)) <= 3""".stripMargin

  /** q_llm_minhash_pairs: 64-slot FNV+splitmix MinHash over 3-token
    * shingles, 16 FNV-folded band keys, bucket-join candidates, exact
    * 3-shingle Jaccard ≥ 0.5 verify — mirroring TextHash.minhash /
    * lshBands / DedupOps.nearDupPairs step for step.
    */
  val minhashPairs: String = {
    val byteList = "list_transform(range(32), j -> ((sl[CAST(t.b AS INT) * 4 + CAST(j // 8 AS INT) + 1] >> (8 * CAST(j % 8 AS INT))) & 255::HUGEINT)::HUGEINT)"
    s"""WITH toks AS (
       |  SELECT doc_id, text,
       |    list_filter(string_split_regex(text, '\\s+'), t -> length(t) > 0) AS tk
       |  FROM documents),
       |shing AS (
       |  SELECT doc_id,
       |    CASE WHEN len(tk) < 3 THEN [text]
       |    ELSE list_transform(range(len(tk) - 2), j -> tk[j+1] || ' ' || tk[j+2] || ' ' || tk[j+3])
       |    END AS shs
       |  FROM toks),
       |bases AS (SELECT doc_id, ${fnvStr("s.sh")} AS base
       |  FROM shing, LATERAL (SELECT unnest(shs) AS sh) s),
       |seeded AS (SELECT doc_id, t.i AS i,
       |    (base + (${mul64("t.i::HUGEINT", "11400714819323198485::HUGEINT")})) & $Mask AS z0
       |  FROM bases, (SELECT unnest(range(64)) AS i) t),
       |${mix64Ctes("m", "seeded", Seq("doc_id", "i"))},
       |perms AS (SELECT doc_id, i, min(${u2s("h")}) AS mn FROM mf GROUP BY doc_id, i),
       |slots AS (SELECT doc_id,
       |    list(CASE WHEN mn < 0 THEN mn::HUGEINT + $Mod ELSE mn::HUGEINT END ORDER BY i) AS sl
       |  FROM perms GROUP BY doc_id),
       |bandh AS (SELECT doc_id, t.b AS band,
       |    (${fnvList(byteList)} + t.b::HUGEINT) & $Mask AS z0
       |  FROM slots, (SELECT unnest(range(16)) AS b) t),
       |${mix64Ctes("k", "bandh", Seq("doc_id", "band"))},
       |cands AS (
       |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
       |  FROM kf a JOIN kf b
       |    ON a.band = b.band AND a.h = b.h AND a.doc_id < b.doc_id),
       |ssets AS (
       |  SELECT doc_id,
       |    CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
       |    ELSE list_distinct(list_transform(range(len(tk) - 2), j -> tk[j+1] || ' ' || tk[j+2] || ' ' || tk[j+3]))
       |    END AS ss
       |  FROM toks)
       |SELECT id1, id2,
       |  CAST(len(list_intersect(x.ss, y.ss)) AS INT) AS inter,
       |  CAST(len(list_distinct(list_concat(x.ss, y.ss))) AS INT) AS uni,
       |  len(list_intersect(x.ss, y.ss))::DOUBLE / len(list_distinct(list_concat(x.ss, y.ss))) AS jaccard
       |FROM cands JOIN ssets x ON id1 = x.doc_id JOIN ssets y ON id2 = y.doc_id
       |WHERE len(list_intersect(x.ss, y.ss))::DOUBLE / len(list_distinct(list_concat(x.ss, y.ss))) >= 0.5""".stripMargin
  }
}
