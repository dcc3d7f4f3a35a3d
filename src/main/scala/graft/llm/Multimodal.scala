package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One media asset: opaque payload bytes + typed metadata. At 100 TB
  * the payload column stays opaque binary in parquet (never parsed by
  * Catalyst), metadata columns drive partition pruning, and decode
  * happens once inside a per-partition pipeline stage.
  */
case class MediaRow(
    media_id: Long,
    kind: String, // "image" | "audio" | "video"
    payload: Array[Byte],
    width: Int,
    height: Int,
    n_bytes: Long,
)

case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Long,
    features: Array[Float], // 16-dim descriptor
)

case class MediaBinCounts(
    media_id: Long,
    kind: String,
    n_bytes: Long,
    bin_counts: Array[Long], // 16 high-nibble byte-histogram bins
)

case class MediaFrame(
    media_id: Long,
    frame_idx: Int,
    n_bytes: Int,
    checksum: Long, // 31-polynomial mod-prime fold of the frame bytes
)

case class MediaResized(
    media_id: Long,
    n_bytes_in: Long,
    n_samples: Int,
    checksum: Long, // fold of the stride-sampled bytes
)

/** Multimodal-column handling: opaque binary payloads with typed
  * metadata, and a per-partition feature-extraction stage.
  *
  * The decode step is a STUB — image/audio codecs are not available
  * in this environment, so [[decodeStub]] derives a deterministic
  * 16-bin byte histogram instead of real pixel decoding. Everything
  * around it (schema, binary column plumbing, partition-wise batch
  * iteration, feature vector shape) is real and tested; swapping in a
  * codec changes only the function body.
  */
object Multimodal {

  /** Deterministic media corpus derived from the documents table:
    * payload = UTF-8 bytes of the text, metadata from doc fields.
    * Stands in for a real (path, bytes) media scan.
    */
  def packFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      (col("n_chars") % 640 + 1).cast("int").as("width"),
      (col("n_chars") % 480 + 1).cast("int").as("height"),
      length(col("text")).cast("long").as("n_bytes"),
    ).as[MediaRow]
  }

  /** STUB decoder: a real implementation would decode pixels/samples
    * here (e.g. via a JNI codec); this computes a 16-bin normalized
    * byte histogram so the pipeline shape is exercised end-to-end.
    */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xf0) >> 4) += 1f
      i += 1
    }
    if (payload.length > 0) {
      var j = 0
      while (j < 16) { hist(j) /= payload.length; j += 1 }
    }
    hist
  }

  /** Raw integer bin counts (the un-normalized form of [[decodeStub]])
    * — exact integers, so the full decode path is hash-comparable
    * against a SQL oracle, not just row-counted.
    */
  def binCounts(media: Dataset[MediaRow]): Dataset[MediaBinCounts] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val counts = new Array[Long](16)
        var i = 0
        while (i < m.payload.length) {
          counts((m.payload(i) & 0xf0) >> 4) += 1L
          i += 1
        }
        MediaBinCounts(m.media_id, m.kind, m.n_bytes, counts)
      }
    }
  }

  /** STUB frame sampler (the video path): the payload is cut into
    * non-overlapping `frameSize`-byte frames ("decoded frames"),
    * every `stride`-th frame is kept, and each kept frame is reduced
    * to an exact mod-prime checksum so the sampling plumbing is
    * hash-comparable. A real implementation would demux/decode and
    * emit pixel tensors per sampled frame; the iterator shape,
    * explode factor, and per-frame row schema are what carries over.
    */
  def frameSample(media: Dataset[MediaRow], frameSize: Int = 64,
      stride: Int = 2): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { m =>
        val nFrames = m.payload.length / frameSize
        (0 until nFrames by stride).iterator.map { f =>
          var s = 0L
          var i = f * frameSize
          while (i < (f + 1) * frameSize) {
            s = (s * 31L + (m.payload(i) & 0xffL)) % 1000000007L
            i += 1
          }
          MediaFrame(m.media_id, f, frameSize, s)
        }
      }
    }
  }

  /** STUB resizer (the image path): deterministic stride resampling of
    * the payload to `nSamples` points — sample i is byte
    * ⌊i·len/nSamples⌋ — reduced to an exact checksum. A real
    * implementation would decode pixels and interpolate; the per-row
    * compute shape and exact-output contract are the same.
    */
  def resize(media: Dataset[MediaRow], nSamples: Int = 64): Dataset[MediaResized] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val n = m.payload.length
        var s = 0L
        if (n > 0) {
          var i = 0
          while (i < nSamples) {
            s = (s * 31L + (m.payload(((i.toLong * n) / nSamples).toInt) & 0xffL)) % 1000000007L
            i += 1
          }
        }
        MediaResized(m.media_id, n.toLong, if (n > 0) nSamples else 0, s)
      }
    }
  }

  /** Fixed-point DCT-II basis, Q14: `round(cos(π(2n+1)u/16) · 2^14)`
    * via StrictMath (bit-reproducible on every JVM). The SAME integer
    * table is inlined as literals into the DuckDB oracle, so the
    * whole perceptual hash is exact-integer in both engines. */
  val DctQ14: Array[Array[Long]] = Array.tabulate(8, 8)((u, n) =>
    math.round(StrictMath.cos(StrictMath.PI * (2 * n + 1) * u / 16.0)
      * 16384.0))

  /** Integer PERCEPTUAL HASH (pHash, DCT form — Zauner 2010) over the
    * opaque payload: the media-dedup primitive a multimodal training
    * pipeline needs next to the text dedup family (byte-identical
    * images dedup by content hash; re-encoded/resized near-copies
    * need a perceptual signature).
    *
    * Pipeline per row, all exact integers: (1) "decode/resize" — the
    * [[resize]] stub's stride sampling reduces the payload to an 8×8
    * grid of byte values (a real decoder would produce an 8×8
    * luminance thumbnail here; the plumbing, fixed-point DCT, and
    * banding below are what carries over unchanged); (2) 2-D DCT-II
    * in Q14 fixed point ([[DctQ14]] — |coef| ≤ 64·255·2^28 ≈ 2^42,
    * far inside Long); (3) threshold the 63 AC coefficients at their
    * MEDIAN (the 32nd smallest — index 31 of the ascending sort);
    * (4) pack bit `uv-1` per coefficient uv ∈ [1, 63] — 63 bits, so
    * the hash is always non-negative and engine sign semantics never
    * diverge. Empty payloads hash to 0.
    */
  /** The 8×8-grid → 63-bit hash kernel shared by the whole-payload
    * [[phash]] and the per-frame [[framePhash]]: Q14 DCT-II, median
    * threshold over the 63 AC coefficients, bit `uv-1` packing. */
  private[llm] def gridPhash(p: Array[Long]): Long = {
    val coef = new Array[Long](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0L
        var r = 0
        while (r < 8) {
          var c = 0
          while (c < 8) {
            s += p(r * 8 + c) * DctQ14(u)(r) * DctQ14(v)(c)
            c += 1
          }
          r += 1
        }
        coef(u * 8 + v) = s
        v += 1
      }
      u += 1
    }
    val ac = coef.drop(1).sorted
    val median = ac(31)
    var h = 0L
    var i = 1
    while (i < 64) {
      if (coef(i) > median) h |= 1L << (i - 1)
      i += 1
    }
    h
  }

  def phash(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val n = m.payload.length
        if (n == 0) (m.media_id, 0L)
        else (m.media_id, gridPhash(Array.tabulate(64)(i =>
          (m.payload(((i.toLong * n) / 64).toInt) & 0xff).toLong)))
      }
    }.toDF("media_id", "phash")
  }

  /** Per-FRAME perceptual hash — the video-sequence primitive
    * composing [[frameSample]]'s demux plumbing with [[phash]]'s grid
    * kernel: the payload cut into non-overlapping `frameSize`-byte
    * frames, every `stride`-th kept, and each kept frame
    * stride-sampled to the 8×8 grid [[gridPhash]] thresholds (with
    * the default frameSize = 64 the frame's bytes ARE the grid; a
    * real decoder's per-frame luminance thumbnail slots in
    * unchanged). */
  def framePhash(media: Dataset[MediaRow], frameSize: Int = 64,
      stride: Int = 1): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { m =>
        val nFrames = m.payload.length / frameSize
        (0 until nFrames by stride).iterator.map { f =>
          val p = Array.tabulate(64)(i => (m.payload(
            f * frameSize + (i.toLong * frameSize / 64).toInt) & 0xff).toLong)
          (m.media_id, f, gridPhash(p))
        }
      }
    }.toDF("media_id", "frame_idx", "fhash")
  }

  /** VIDEO-SEQUENCE NEAR-DUP — frames × pHash composed into the
    * dup-span/winnowing shape (the media analogue of text
    * dup-span detection): each clip's kept frames reduce to a
    * SEQUENCE of perceptual hashes ([[framePhash]]); shingles of
    * `shingle` consecutive frame hashes are fingerprinted with the
    * string-FNV kernel; candidate pairs come from the shared-
    * fingerprint bucket join (Σ|bucket|² work, never all-pairs); a
    * pair survives when its shared distinct-shingle count covers
    * ≥ num/den of the SHORTER clip's shingle set — re-encodes that
    * perturb a frame lose only the shingles crossing it, and a
    * TRIMMED clip's shingles are a subset of the original's (shingle
    * fingerprints are position-independent), so prefix-trims recover
    * at full ratio. All integers end to end: frame hash, FNV shingle
    * fingerprint, and the DIV-free ratio compare all mirror in SQL.
    */
  def frameSequenceNearDup(media: Dataset[MediaRow], frameSize: Int = 64,
      stride: Int = 1, shingle: Int = 3, num: Long = 1,
      den: Long = 2): DataFrame = {
    require(shingle >= 2, "a sequence shingle needs at least 2 frames")
    require(num > 0 && den > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id").orderBy("frame_idx")
    val fp0 = framePhash(media, frameSize, stride)
    val shCols = (1 until shingle).map(j =>
      lead("fhash", j).over(w).as(s"h$j"))
    val sh = fp0
      .select((col("media_id") +: col("fhash").as("h0") +: shCols): _*)
      .filter(col(s"h${shingle - 1}").isNotNull)
      .select(col("media_id"), graft.functions.LlmFunctions.fnv64(
        concat_ws("|",
          (0 until shingle).map(j => col(s"h$j")): _*)).as("fp"))
      .distinct()
    val counts = sh.groupBy("media_id").agg(count(lit(1)).as("n_sh"))
    val pairs = sh.select(col("media_id").as("id1"), col("fp"))
      .join(sh.select(col("media_id").as("id2"), col("fp")), Seq("fp"))
      .filter(col("id1") < col("id2"))
      .groupBy("id1", "id2").agg(count(lit(1)).as("shared"))
    pairs
      .join(counts.select(col("media_id").as("id1"),
        col("n_sh").as("n1")), Seq("id1"))
      .join(counts.select(col("media_id").as("id2"),
        col("n_sh").as("n2")), Seq("id2"))
      .filter(col("shared") * den >= least(col("n1"), col("n2")) * num)
      .select(col("id1"), col("id2"), col("shared"), col("n1"), col("n2"))
  }

  /** Perceptual-hash NEAR-DUP pairs: [[phash]] signatures through the
    * SAME Hamming-band LSH core as the text SimHash
    * ([[DedupOps.hammingBandPairs]] — 4×16-bit chunk pigeonhole,
    * recall-lossless for hamming ≤ 3, Σ|bucket|² candidates, never
    * all-pairs). The multimodal half of the dedup story. */
  def phashNearDup(media: Dataset[MediaRow],
      maxHamming: Int = 3): DataFrame =
    DedupOps.hammingBandPairs(
      phash(media).select(col("media_id").as("id"), col("phash").as("sig")),
      maxHamming)

  /** Perceptual-hash DECONTAMINATION — the media analogue of the text
    * benchmark-decontamination pass: drop every corpus media item
    * perceptually near-dup (hamming ≤ maxHamming) to ANY benchmark
    * item (a re-encoded/cropped benchmark image in the training set
    * is contamination even though its bytes differ). Candidates come
    * from the Hamming bands joined ACROSS SIDES only (the
    * incremental-dedup shape — linear in each side, never corpus²,
    * and recall-lossless at hamming ≤ 3 by the same pigeonhole);
    * survivors are the corpus anti-joined on the matched ids. */
  def phashDecontaminate(corpus: Dataset[MediaRow],
      benchmark: Dataset[MediaRow], maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      "4-chunk pigeonhole only guarantees recall for hamming <= 3")
    val c = DedupOps.hammingChunks(phash(corpus)
      .select(col("media_id").as("id"), col("phash").as("sig")))
    val b = DedupOps.hammingChunks(phash(benchmark)
        .select(col("media_id").as("id"), col("phash").as("sig")))
      .select(col("sig").as("bsig"), col("chunk"), col("key"))
    val hit = c.join(b, Seq("chunk", "key"))
      .filter(bit_count(col("sig").bitwiseXOR(col("bsig"))) <= maxHamming)
      .select(col("id")).distinct()
    val cdf = corpus.toDF()
    cdf.join(hit, cdf("media_id") === hit("id"), "left_anti")
  }

  /** Per-partition feature extraction: iterator-in/iterator-out so a
    * real decoder can amortize codec init per partition (the Scala
    * analogue of the mapInPandas batch shape).
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here
      rows.map(m => MediaFeatures(m.media_id, m.kind, m.n_bytes, decodeStub(m.payload)))
    }
  }
}
