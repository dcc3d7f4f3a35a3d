package graft.streaming

import graft.llm.DedupOps
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** One LSH-banded row of an incoming document: (band, key) addresses
  * the bucket, `sig` carries the full MinHash signature so candidate
  * similarity is estimable inside the state operator without a join
  * back to the text.
  */
case class BandedDoc(band: Int, key: Long, doc_id: Long, sig: Seq[Long])

/** An emitted candidate near-dup pair. `sig_agree` of `n_perms`
  * signature components matched — agree/n estimates Jaccard, computed
  * from state alone. The same pair can surface from several bands;
  * exact-once delivery is the consumer's dedup (or a downstream
  * `dropDuplicates`), mirroring the batch banding contract.
  */
case class NearDupHit(id1: Long, id2: Long, band: Int, sig_agree: Int, n_perms: Int)

case class BucketEntry(doc_id: Long, sig: Seq[Long])
case class Bucket(entries: Seq[BucketEntry])

/** Per-bucket state: the last `capPerBucket` distinct documents that
  * hashed into this (band, key). Every arrival pairs against the
  * bucket's residents, then joins them (FIFO eviction beyond the cap).
  * State is bounded by #occupied-buckets × cap regardless of stream
  * length — the unbounded thing is the corpus, not the state.
  */
class NearDupBucketProcessor(capPerBucket: Int)
    extends StatefulProcessor[(Int, Long), BandedDoc, NearDupHit] {

  @transient private var bucket: ValueState[Bucket] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    bucket = getHandle.getValueState[Bucket](
      "bucket", Encoders.product[Bucket], TTLConfig.NONE)

  override def handleInputRows(key: (Int, Long), rows: Iterator[BandedDoc],
      tv: TimerValues): Iterator[NearDupHit] = {
    var entries: Seq[BucketEntry] =
      if (bucket.exists()) bucket.get().entries else Vector.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[NearDupHit]
    rows.foreach { d =>
      // a re-delivered doc_id (redundant band, replayed batch) must
      // not pair with itself or occupy a second slot
      if (!entries.exists(_.doc_id == d.doc_id)) {
        entries.foreach { e =>
          val agree = e.sig.lazyZip(d.sig).count(p => p._1 == p._2)
          out += NearDupHit(math.min(e.doc_id, d.doc_id),
            math.max(e.doc_id, d.doc_id), d.band, agree, d.sig.length)
        }
        entries = (entries :+ BucketEntry(d.doc_id, d.sig)).takeRight(capPerBucket)
      }
    }
    bucket.update(Bucket(entries))
    out.iterator
  }
}

/** Cross-batch near-duplicate detection for an incremental corpus:
  * the streaming face of [[graft.llm.DedupOps.minhashSignaturePairs]].
  * New documents are signed with the same arithmetic MinHash kernel,
  * banded with the same band keys, and checked against every PRIOR
  * document sharing a bucket — so a near-dup arriving a million
  * batches after its original is still caught, with per-bucket state
  * instead of a batch self-join.
  *
  * With an unbounded cap and a single batch, the emitted pair set
  * equals the batch operator's on the same corpus (pinned by
  * TwsNearDupSpec); the cap trades recall inside pathological
  * buckets (boilerplate floods) for a hard state bound, and evicts
  * FIFO so the newest residents — the likeliest future matches in a
  * drifting corpus — survive.
  */
object TwsNearDup {

  /** Default MinHash permutation count for [[nearDupPairsStream]]. */
  val DefaultPerms = 8

  /** Bands per document: signatures are banded two permutations per
    * band, so state rows are hard-bounded by `bandCount × documents`.
    */
  def bandCount(nPerms: Int = DefaultPerms): Int = nPerms / 2

  /** Requires the RocksDB state store provider, like every
    * transformWithState operator.
    */
  def nearDupPairsStream(docs: DataFrame, idCol: String, textCol: String,
      nPerms: Int = DefaultPerms, capPerBucket: Int = 64): Dataset[NearDupHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sig = DedupOps.minhashSignature(docs, idCol, textCol, nPerms)
    val keys = (0 until nPerms / 2).map(b =>
      struct(lit(b).as("band"),
        (col(s"mh${2 * b}") * lit(DedupOps.PermMod) + col(s"mh${2 * b + 1}"))
          .as("key")))
    sig
      .withColumn("sig", array((0 until nPerms).map(i => col(s"mh$i")): _*))
      .select(col("doc_id"), col("sig"), explode(array(keys: _*)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.key").as("key"),
        col("doc_id"), col("sig"))
      .as[BandedDoc]
      .groupByKey(d => (d.band, d.key))
      .transformWithState(new NearDupBucketProcessor(capPerBucket),
        TimeMode.None(), OutputMode.Append())
  }
}
