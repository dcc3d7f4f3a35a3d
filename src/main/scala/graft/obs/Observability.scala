package graft.obs

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.streaming.StreamingQueryListener
import scala.jdk.CollectionConverters._

/** O1-O6: sync-stats registry + driver HTTP endpoint, the Spark
  * analogue of the reference's axum stats API
  * (reference: api/stats.rs:12-78, api/mod.rs:9-27).
  *
  * Gauges are last-write-wins per key, exactly like the reference's
  * Stats map; counters are monotonic.
  */
class StatsRegistry {
  private val gauges = new ConcurrentHashMap[String, Long]()
  private val counters = new ConcurrentHashMap[String, Long]()

  /** O1/O2: e.g. latest_block_{chain}, latest_transaction_block_{chain}. */
  def setGauge(key: String, value: Long): Unit = gauges.put(key, value)

  /** O6: throughput counters. */
  def add(key: String, delta: Long): Unit =
    counters.merge(key, delta, (a, b) => a + b)

  def snapshot: Map[String, Long] =
    (gauges.asScala ++ counters.asScala).toMap

  def toJson: String =
    snapshot.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", "}")
}

/** O3/O4: streaming progress → registry (offsets per topic, input
  * rates as the queue-depth analogue).
  */
class GraftQueryListener(stats: StatsRegistry) extends StreamingQueryListener {
  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
    stats.add("queries_started", 1)

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    stats.setGauge(s"num_input_rows_${p.name}", p.numInputRows)
    stats.add(s"rows_total_${p.name}", p.numInputRows)
    stats.setGauge(s"batch_id_${p.name}", p.batchId)
  }

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
    stats.add("queries_terminated", 1)
}

/** O5: `/` and `/health` endpoints on the driver. */
class HealthServer(stats: StatsRegistry, port: Int = 0) {
  private val server = HttpServer.create(new InetSocketAddress(port), 0)

  private def handler(body: () => String): HttpHandler = new HttpHandler {
    override def handle(x: HttpExchange): Unit = {
      val bytes = body().getBytes(StandardCharsets.UTF_8)
      x.getResponseHeaders.add("Content-Type", "application/json")
      x.sendResponseHeaders(200, bytes.length)
      val os = x.getResponseBody
      os.write(bytes)
      os.close()
    }
  }

  server.createContext("/", handler(() => stats.toJson))
  server.createContext("/health", handler(() => stats.toJson))
  server.setExecutor(null)

  def start(): Int = {
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = server.stop(0)
}
