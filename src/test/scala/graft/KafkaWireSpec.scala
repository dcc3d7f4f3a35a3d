package graft

import graft.sources.Ingest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The Kafka seam, minus the broker: no kafka-clients or
  * spark-sql-kafka jar exists in this offline sandbox (inventory:
  * /opt/spark/jars ships Derby only), so a live produce→drain test is
  * impossible here. What CAN be pinned offline is OUR half of the
  * contract — this spec drives a stream with the EXACT wire schema
  * the spark-sql-kafka source exposes (key/value binary, topic,
  * partition, offset, timestamp, timestampType) through the decode →
  * commit path, proving the pipeline consumes the connector's schema
  * as-is: decode touches only `value`, wire metadata passes through
  * for offset tracking, and per-partition offsets observed at the
  * sink are exactly the produced set.
  */
case class KafkaWireRow(key: Array[Byte], value: Array[Byte],
    topic: String, partition: Int, offset: Long,
    timestamp: java.sql.Timestamp, timestampType: Int)

class KafkaWireSpec extends SparkSpec {

  private def wire(offset: Long, partition: Int, json: String) =
    KafkaWireRow(null, json.getBytes("UTF-8"), "traces_topic", partition,
      offset, new java.sql.Timestamp(1700000000000L + offset), 0)

  test("kafka wire schema drains through decode -> commit with offset tracking") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def traceJson(hash: String): String =
      s"""{"transaction_hash":"$hash","transaction_index":0,
         |"from_address":"0xA","to_address":"0x0000000000000000000000000000000000000001",
         |"value":"0","input":"0x1234567890","gas_used":5,
         |"trace_address":[],"block_number":1,"block_timestamp":100,
         |"block_hash":"0xb"}""".stripMargin.replace("\n", "")

    val mem = MemoryStream[KafkaWireRow]
    mem.addData(
      wire(0L, 0, traceJson("0xaa")),
      wire(1L, 0, traceJson("0xbb")),
      wire(0L, 1, "{not json"), // corrupt payload on its own partition
      wire(1L, 1, traceJson("0xcc")))

    val sunkHashes = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val seenOffsets = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    val q = mem.toDS().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[KafkaWireRow], _: Long) =>
        // offset tracking reads wire metadata only
        batch.select("partition", "offset").collect()
          .foreach(r => seenOffsets.add((r.getInt(0), r.getLong(1))))
        // decode consumes the connector schema as-is (binary `value`)
        val (good, corrupt) = Ingest.decodeTraces(batch.toDF(), chainId = 7L)
        val commits = graft.operators.TraceEtl.commitTraces(
          graft.operators.TraceEtl.normalize(good), prefilter = false)
        commits.collect().flatMap(_.transaction)
          .foreach(t => sunkHashes.add(t.transaction_hash))
        assert(corrupt.count() == 1, "corrupt payload must quarantine, not crash")
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()

    assert(seenOffsets.toArray.toSet ==
      Set((0, 0L), (0, 1L), (1, 0L), (1, 1L)),
      s"sink must observe every produced (partition, offset): $seenOffsets")
    assert(sunkHashes.toArray.toSet == Set("0xaa", "0xbb", "0xcc"),
      s"all well-formed payloads must commit: $sunkHashes")
  }
}
