package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming corpus ingest — the incremental form of the batch
  * curation legs for an always-on document feed (crawl drops, log
  * streams): content-hash exact dedup with cross-batch state, then
  * the map-only quality and language gates.
  *
  * Scale shape: the gates are pure projections (stream through at IO
  * speed); dedup is the only stateful operator and its state is one
  * 16-byte hash per distinct kept document. For an unbounded corpus
  * use [[curateStreamWithinWatermark]] — state expires with the
  * watermark and re-emissions past it fall to the sink's conflict
  * policy, the same bounded-state answer the contract seen-set uses
  * (see StreamingEtl.dedupContractsWithinWatermark).
  */
object StreamingCuration {

  /** Quality + language gate as a single column predicate, reusing the
    * batch ops' arithmetic (token band + English marker evidence) so
    * stream and batch keep the same rows.
    */
  private def keepPredicate(textCol: String) = {
    val nTok = size(TextOps.tokens(col(textCol)))
    val enScore = TextOps.markerCount(col(textCol), Seq("the", "a", "is", "and"))
    nTok.between(20, 200) && enScore > 0
  }

  /** Exact-dedup + gate over an unbounded stream; state = one row per
    * distinct content hash ever seen (cross-batch, like the
    * reference's Redis seen-set).
    */
  def curateStream(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("text_hash", md5(col(textCol)))
      .dropDuplicates("text_hash")
      .filter(keepPredicate(textCol))

  /** Bounded-state variant: the seen-set expires with the event-time
    * watermark; a duplicate arriving later than `delay` is passed
    * through and left to the sink's ON CONFLICT / MERGE.
    */
  def curateStreamWithinWatermark(docs: DataFrame, idCol: String,
      textCol: String, eventTimeCol: String, delay: String): DataFrame =
    docs
      .withColumn("text_hash", md5(col(textCol)))
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("text_hash")
      .filter(keepPredicate(textCol))
}
