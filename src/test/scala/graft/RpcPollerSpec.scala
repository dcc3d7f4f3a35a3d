package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.model.Addresses
import graft.operators.TraceEtl
import graft.sources.{BlockFetch, RpcClient, RpcPoller}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

/** SRC3/SRC4 integration: a stub JSON-RPC node served over HTTP,
  * driven through fetch -> flatten -> commit end-to-end.
  */
class RpcPollerSpec extends SparkSpec {

  private val rec = Addresses.EcRecover

  private def frameTree: String =
    s"""{"from":"0xaa","to":"0xbb","gas":"0x100","gasUsed":"0x80","type":"CALL",
       |"input":"0x1234567890","calls":[
       |  {"from":"0xbb","to":"$rec","gasUsed":"0x10","type":"STATICCALL",
       |   "input":"0xdeadbeef00",
       |   "output":"0x${"00" * 12}${"00" * 19}ff"}]}""".stripMargin.replace("\n", "")

  private def startStub(failFirst: Int): (HttpServer, AtomicInteger) = {
    val calls = new AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val body = new String(x.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val n = calls.incrementAndGet()
        val resp =
          if (n <= failFirst) { x.sendResponseHeaders(500, -1); x.close(); return }
          else if (body.contains("eth_getBlockByNumber"))
            s"""{"jsonrpc":"2.0","id":1,"result":{"number":"0x64","hash":"0xblk",
               |"transactions":["0xt1"],"size":"0x200"}}""".stripMargin.replace("\n", "")
          else if (body.contains("debug_traceBlockByNumber"))
            s"""{"jsonrpc":"2.0","id":1,"result":[{"txHash":"0xt1","result":$frameTree}]}"""
          else """{"jsonrpc":"2.0","id":1,"error":{"code":-32601,"message":"no method"}}"""
        val bytes = resp.getBytes(StandardCharsets.UTF_8)
        x.sendResponseHeaders(200, bytes.length)
        x.getResponseBody.write(bytes)
        x.close()
      }
    })
    server.start()
    (server, calls)
  }

  test("retry policy: constant backoff, recovers from transient failures") {
    val (server, calls) = startStub(failFirst = 2)
    try {
      var sleeps = 0L
      val client = new RpcClient(s"http://localhost:${server.getAddress.getPort}/",
        maxRetries = 5, backoffMs = 2000, sleeper = ms => sleeps += ms)
      val block = client.getBlockByNumber(100)
      assert(block.get("number").asText() == "0x64")
      assert(sleeps == 4000L) // two failures -> two 2 s backoffs
    } finally server.stop(0)
  }

  test("retry policy: gives up after max attempts") {
    val (server, _) = startStub(failFirst = 99)
    try {
      val client = new RpcClient(s"http://localhost:${server.getAddress.getPort}/",
        maxRetries = 3, backoffMs = 1, sleeper = _ => ())
      val e = intercept[RuntimeException] { client.getBlockByNumber(1) }
      assert(e.getMessage.contains("after 3 attempts"))
    } finally server.stop(0)
  }

  test("end-to-end: stub node -> fetch -> flatten -> commit pipeline") {
    val (server, _) = startStub(failFirst = 0)
    try {
      val client = new RpcClient(s"http://localhost:${server.getAddress.getPort}/",
        maxRetries = 2, backoffMs = 1, sleeper = _ => ())
      var slept = 0L
      val fetch = RpcPoller.fetchBlock(client, 100L, indexTx = true,
        preTraceSleep = ms => slept = ms)
      assert(slept == 1000L) // the reference's courtesy sleep
      assert(fetch.txHashes == Seq("0xt1") && fetch.frameJsons.size == 1)

      val traces = RpcPoller.tracesFrom(spark, chainId = 7L, Seq(fetch))
      val (txs, contracts) = TraceEtl.transform(traces)
      val t = txs.collect()
      assert(t.length == 1)
      assert(t.head.chain_id == 7L)
      assert(t.head.transaction_hash == "0xt1")
      assert(t.head.transaction_index == 1) // 1-based RPC-path quirk
      assert(t.head.ec_recover_count == 1L)
      assert(t.head.ec_recover_addresses == Seq("0x" + "00" * 19 + "ff"))
      val cs = contracts.collect()
      assert(cs.exists(c => c.address == "0xbb" && c.degree == 0))
    } finally server.stop(0)
  }

  test("block fetch without indexTx skips the trace call") {
    val (server, calls) = startStub(failFirst = 0)
    try {
      val client = new RpcClient(s"http://localhost:${server.getAddress.getPort}/",
        maxRetries = 2, backoffMs = 1, sleeper = _ => ())
      val fetch = RpcPoller.fetchBlock(client, 100L, indexTx = false, preTraceSleep = _ => ())
      assert(fetch.frameJsons.isEmpty)
      assert(calls.get() == 1) // only eth_getBlockByNumber
    } finally server.stop(0)
  }
}

class AppFailureSpec extends SparkSpec {
  test("provider path surfaces a clear error after retries are exhausted") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(0), 0)
    server.createContext("/", (x: com.sun.net.httpserver.HttpExchange) => {
      x.sendResponseHeaders(500, -1); x.close()
    })
    server.start()
    try {
      val chain = graft.sources.ProviderChain(7L,
        s"http://localhost:${server.getAddress.getPort}/", "ws://x", true, true)
      val client = new graft.sources.RpcClient(chain.rpcUrl,
        maxRetries = 3, backoffMs = 1, sleeper = _ => ())
      val e = intercept[RuntimeException] {
        App.runProviderRange(spark, chain, client, 1 to 1,
          App.Sinks(None), preTraceSleep = _ => ())
      }
      // the reference panics and lets the orchestrator restart
      // (main.rs:25-30); we surface the same terminal failure
      assert(e.getMessage.contains("failed after 3 attempts"))
    } finally server.stop(0)
  }
}
