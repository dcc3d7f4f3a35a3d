package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.model.Addresses
import graft.sources.{ProviderChain, RpcClient}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** Mini end-to-end run of the assembled service: stub RPC node →
  * provider poll → commit → Derby sink (checksummed) → stats →
  * /health — the whole reference `main` loop in one test.
  */
class AppSpec extends SparkSpec {

  private val rec = Addresses.EcRecover
  private val lowerA = "0x5aaeb6053f3e94c9b9a09f33669435e7ef1beaed"
  private val checksummedA = "0x5aAeb6053F3E94C9b9A09f33669435E7Ef1BeAed"

  private def frameTree: String =
    s"""{"from":"0xaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa","to":"$lowerA",
       |"gas":"0x100","gasUsed":"0x80","type":"CALL","input":"0x1234567890",
       |"calls":[{"from":"$lowerA","to":"$rec","gasUsed":"0x10","type":"STATICCALL",
       |"input":"0xdeadbeef00","output":"0x${"00" * 12}${"11" * 20}"}]}"""
      .stripMargin.replace("\n", "")

  private def startStubNode(): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val body = new String(x.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val resp =
          if (body.contains("eth_getBlockByNumber"))
            """{"jsonrpc":"2.0","id":1,"result":{"number":"0x64","hash":"0xblk","transactions":["0xt1"],"size":"0x200"}}"""
          else s"""{"jsonrpc":"2.0","id":1,"result":[{"result":$frameTree}]}"""
        val bytes = resp.getBytes(StandardCharsets.UTF_8)
        x.sendResponseHeaders(200, bytes.length)
        x.getResponseBody.write(bytes)
        x.close()
      }
    })
    server.start()
    server
  }

  test("mini app run: poll -> commit -> checksummed upsert -> health") {
    val node = startStubNode()
    val url = "jdbc:derby:memory:appdb;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().execute(
      "CREATE TABLE transactions (" +
        graft.sinks.Tables.transactionColumns.map {
          case c @ ("chain_id" | "transaction_index" | "block_number" | "block_timestamp" |
            "gas_used_total" | "gas_used_first_degree" | "gas_used_second_degree" |
            "ec_recover_count" | "ec_add_count" | "ec_mul_count" | "ec_pairing_count") =>
            s""""$c" BIGINT"""
          case c @ ("closest_address" | "ec_pairing_input_sizes" | "ec_recover_addresses") =>
            s""""$c" VARCHAR(2000)"""
          case c => s""""$c" VARCHAR(2000)"""
        }.mkString(", ") +
        """, PRIMARY KEY ("chain_id", "transaction_hash"))""")
    conn.createStatement().execute(
      "CREATE TABLE contracts (" +
        graft.sinks.Tables.contractColumns.map {
          case c @ ("chain_id" | "degree" | "ec_recover_count" | "ec_add_count" |
            "ec_mul_count" | "ec_pairing_count") => s""""$c" BIGINT"""
          case c => s""""$c" VARCHAR(2000)"""
        }.mkString(", ") +
        """, PRIMARY KEY ("chain_id", "address", "function_signatures"))""")
    conn.close()

    try {
      val chain = ProviderChain(42L, s"http://localhost:${node.getAddress.getPort}/",
        "ws://unused", indexBlock = true, indexTx = true)
      val client = new RpcClient(chain.rpcUrl, maxRetries = 2, backoffMs = 1, sleeper = _ => ())
      val sinks = App.Sinks(Some(url), dialect = "derby")

      // the assembled provider path, then redelivered (idempotent)
      App.runProviderRange(spark, chain, client, 100 to 100, sinks,
        preTraceSleep = _ => ())
      App.runProviderRange(spark, chain, client, 100 to 100, sinks,
        preTraceSleep = _ => ())

      val c1 = java.sql.DriverManager.getConnection(url)
      val rs = c1.createStatement().executeQuery(
        """SELECT count(*), min("to_address") FROM transactions""")
      rs.next()
      assert(rs.getInt(1) == 1)
      assert(rs.getString(2) == checksummedA) // EIP-55 applied at the sink
      val rs2 = c1.createStatement().executeQuery("SELECT count(*) FROM contracts")
      rs2.next()
      assert(rs2.getInt(1) >= 1)
      c1.close()

      // stats + health endpoint (O1/O2 gauges from the run)
      assert(sinks.stats.snapshot("latest_transaction_block_42") == 100L)
      assert(sinks.stats.snapshot("latest_block_42") == 100L)
      val health = new graft.obs.HealthServer(sinks.stats)
      val port = health.start()
      try {
        val body = scala.io.Source.fromURL(s"http://localhost:$port/health").mkString
        assert(body.contains("latest_transaction_block_42"))
      } finally health.stop()
    } finally node.stop(0)
  }
}
