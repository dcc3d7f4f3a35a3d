package graft.streaming

import graft.model._
import graft.operators.{TraceTreeAggregator, TreeBuf}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One streamed trace with its event-time column (block_timestamp as
  * timestamp) — the watermark column must live in the Dataset that
  * feeds the stateful operator.
  */
case class TimedTrace(trace: TraceRow, event_time: java.sql.Timestamp)

/** Session state: the aggregation buffer plus the RUNNING max event
  * time across micro-batches. The max must be persisted — a later
  * batch can deliver a non-late trace below the earlier max, and
  * re-arming the timeout from a batch-local max would regress the
  * timer and split the session into two commits.
  */
case class SessionBuf(buf: TreeBuf, maxEventMs: Long)

/** Structured-Streaming variants of the per-transaction commit.
  *
  * Two shapes, per SURVEY §2.9:
  *  - [[microBatchCommit]]: reuse the batch core inside foreachBatch —
  *    correct whenever a tx's traces land in one micro-batch (the
  *    reference's own assumption: a tx is contiguous in the stream).
  *  - [[sessionCommit]]: low-latency stateful sessionization with
  *    flatMapGroupsWithState — per-tx TreeBuf state, committed when
  *    the event-time watermark passes the group's last trace + gap.
  *    Robust to traces of one tx spanning micro-batches and to
  *    reordering; a trace arriving after its tx timed out is dropped
  *    by the watermark, never folded into a neighboring tx (the
  *    reference's emit-on-next-root mis-attributes those,
  *    consumer/kafka/trace/mod.rs:65-77 — deliberate delta).
  */
object StreamingEtl {

  private val agg = new TraceTreeAggregator

  /** Stateful sessionizer with event-time semantics: a transaction is
    * committed once the watermark passes its latest trace timestamp
    * plus `gapSeconds`. State per open tx is one TreeBuf.
    */
  def sessionCommit(traces: Dataset[TraceRow],
      gapSeconds: Long = 30L,
      watermarkDelay: String = "10 seconds"): Dataset[TxCommit] = {
    val spark = traces.sparkSession
    import spark.implicits._

    def update(key: (Long, String), rows: Iterator[TimedTrace],
        state: GroupState[SessionBuf]): Iterator[TxCommit] = {
      if (state.hasTimedOut) {
        val out = state.getOption
          .map(s => TraceTreeAggregator.commit(s.buf, key._1, key._2))
          .filter(c => c.transaction.nonEmpty || c.contracts.nonEmpty)
        state.remove()
        out.iterator
      } else {
        val prior = state.getOption
        var maxEventMs = prior.map(_.maxEventMs).getOrElse(Long.MinValue)
        val buf = rows.foldLeft(prior.map(_.buf).getOrElse(agg.zero)) { (b, tt) =>
          if (tt.event_time != null) maxEventMs = math.max(maxEventMs, tt.event_time.getTime)
          agg.reduce(b, tt.trace)
        }
        state.update(SessionBuf(buf, maxEventMs))
        val base = if (maxEventMs == Long.MinValue) state.getCurrentWatermarkMs() else maxEventMs
        state.setTimeoutTimestamp(
          math.max(base + gapSeconds * 1000L, state.getCurrentWatermarkMs() + 1L))
        Iterator.empty
      }
    }

    traces
      .filter(col("transaction_hash").isNotNull)
      .withColumn("event_time",
        coalesce(col("block_timestamp"), lit(0L)).cast("timestamp"))
      .select(struct(traces.columns.toIndexedSeq.map(col): _*).as("trace"), col("event_time"))
      .withWatermark("event_time", watermarkDelay)
      .as[TimedTrace]
      .groupByKey(tt => (tt.trace.chain_id, tt.trace.transaction_hash))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Micro-batch path: run the batch core per micro-batch and hand the
    * (transactions, contracts) pair to the sink callback.
    */
  def microBatchCommit(rawTraces: DataFrame,
      sink: (Dataset[TransactionOut], Dataset[ContractOut], Long) => Unit) = {
    rawTraces.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val (txs, contracts) = graft.operators.TraceEtl.transform(batch)
        sink(txs, contracts, id)
      }
  }

  /** D3: cross-batch contract dedup — the streaming seen-set that
    * replaces the reference's Redis cache (postgres.rs:54-66). Keyed
    * on (chain_id, address, function_signatures); state is bounded by
    * the distinct-contract count (the Redis set had the same growth,
    * postgres.rs:79-89) — pair with a TTL'd state store or a sink-side
    * MERGE when the contract universe is unbounded.
    */
  def dedupContracts(contracts: DataFrame): DataFrame =
    contracts
      .withColumn("_sig_key", concat_ws(",", col("function_signatures")))
      .dropDuplicates("chain_id", "address", "_sig_key")
      .drop("_sig_key")

  /** D3 with bounded state: streaming dedup whose seen-set expires
    * with the watermark — the answer to the reference's
    * forever-growing Redis set (SURVEY §7.4 "unbounded dedup state").
    * A contract re-emitted after `delay` of event time is deduplicated
    * by the sink's ON CONFLICT instead; state size is bounded by the
    * distinct contracts per watermark window.
    */
  def dedupContractsWithinWatermark(contracts: DataFrame,
      eventTimeCol: String, delay: String): DataFrame =
    contracts
      .withColumn("_sig_key", concat_ws(",", col("function_signatures")))
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("chain_id", "address", "_sig_key")
      .drop("_sig_key")
}
