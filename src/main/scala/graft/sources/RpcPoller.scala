package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.operators.Flatten
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SRC4: minimal JSON-RPC client with the reference's retry policy —
  * constant 2 s backoff × 5 attempts (reference:
  * consumer/ws/mod.rs:45-47). `sleeper` is injectable for tests.
  */
class RpcClient(url: String, maxRetries: Int = 5, backoffMs: Long = 2000,
    sleeper: Long => Unit = Thread.sleep) {
  private val mapper = new ObjectMapper()
  private val http = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(20)).build()

  def call(method: String, paramsJson: String): JsonNode = {
    val body = s"""{"jsonrpc":"2.0","id":1,"method":"$method","params":$paramsJson}"""
    var attempt = 0
    var last: Throwable = null
    while (attempt < maxRetries) {
      try {
        val req = HttpRequest.newBuilder(URI.create(url))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(body)).build()
        val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() == 200) {
          val node = mapper.readTree(resp.body())
          if (node.has("error") && !node.get("error").isNull)
            throw new RuntimeException(s"rpc error: ${node.get("error")}")
          return node.get("result")
        }
        throw new RuntimeException(s"http ${resp.statusCode()}")
      } catch {
        case e: Throwable =>
          last = e
          attempt += 1
          if (attempt < maxRetries) sleeper(backoffMs)
      }
    }
    throw new RuntimeException(s"rpc $method failed after $maxRetries attempts", last)
  }

  /** eth_getBlockByNumber (hydrated=false: tx hashes only). */
  def getBlockByNumber(n: Long): JsonNode =
    call("eth_getBlockByNumber", s"""["0x${n.toHexString}", false]""")

  /** debug_traceBlockByNumber with the callTracer and
    * onlyTopCall=false (reference: geth_trace.rs:17-30).
    */
  def traceBlockByNumber(n: Long): JsonNode =
    call("debug_traceBlockByNumber",
      s"""["0x${n.toHexString}", {"tracer": "callTracer", "tracerConfig": {"onlyTopCall": false}}]""")
}

/** One polled block: header JSON + per-transaction frame-tree JSON,
  * zipped in block order.
  */
case class BlockFetch(
    blockNumber: Long,
    txHashes: Seq[String],
    frameJsons: Seq[String],
    blockJson: String,
)

/** SRC3/SRC4: the WS-head path re-expressed as a poller. The reference
  * subscribes to block heads over WS and then RPC-fetches details +
  * traces (consumer/ws/mod.rs:39-103); here the driver polls head
  * numbers and produces bronze rows a Spark job consumes. The
  * flatten + 1-based-index fan-out (F1/F2) and the commit pipeline
  * downstream are identical to the Kafka path.
  */
object RpcPoller {
  private val mapper = new ObjectMapper()

  /** Fetch one block's header + (optionally) its traces, mirroring the
    * reference's ordering quirks: tx list from the header, traces
    * zipped positionally, 1 s courtesy sleep before the trace call
    * (reference: ws/mod.rs:79-85).
    */
  def fetchBlock(client: RpcClient, n: Long, indexTx: Boolean,
      preTraceSleep: Long => Unit = Thread.sleep): BlockFetch = {
    val block = client.getBlockByNumber(n)
    val hashes = Option(block.get("transactions"))
      .map(t => (0 until t.size()).map(t.get(_).asText())).getOrElse(Seq.empty)
    val frames = if (indexTx && hashes.nonEmpty) {
      preTraceSleep(1000L) // reference: sleep to avoid "block not found"
      val traces = client.traceBlockByNumber(n)
      (0 until traces.size()).map { i =>
        val node = traces.get(i)
        val frame = if (node.has("result")) node.get("result") else node
        mapper.writeValueAsString(frame)
      }
    } else Seq.empty
    BlockFetch(n, hashes, frames, mapper.writeValueAsString(block))
  }

  /** P4: project fetched blocks into Schemas.trace-shaped rows (plus
    * chain_id) ready for [[graft.operators.TraceEtl.transform]].
    */
  def tracesFrom(spark: SparkSession, chainId: Long, fetches: Seq[BlockFetch]): DataFrame = {
    import spark.implicits._
    val rows = fetches.map(f => (f.blockNumber, f.txHashes, f.frameJsons))
      .toDF("block_number", "hashes", "frames")
    Flatten.fanOutBlock(rows, "block_number", "hashes", "frames")
      .select(
        lit(chainId).as("chain_id"),
        col("transaction_index"),
        col("from_address"), col("to_address"),
        col("value"), col("input"), col("output"),
        lit("call").as("trace_type"),
        col("call_type"),
        lit(null).cast("string").as("reward_type"),
        col("gas"), col("gas_used"), col("subtraces"),
        col("trace_address"),
        col("error"),
        col("transaction_hash"),
        col("block_number"),
        lit(null).cast("long").as("block_timestamp"),
        lit(null).cast("string").as("block_hash"))
  }
}
