package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import graft.model.Schemas
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Chain configuration, mirroring the reference's env-driven tagged
  * wire format (reference: config/chain.rs:4-24, serde format pinned
  * by the unit test at config/chain.rs:35-61):
  *   [{"Kafka": [1, "traces_topic", "blocks_topic"]},
  *    {"Provider": [10, "rpc_url", "ws_url", true, true]}]
  */
sealed trait ChainConfig { def chainId: Long }
case class KafkaChain(chainId: Long, tracesTopic: String, blocksTopic: String)
    extends ChainConfig
case class ProviderChain(chainId: Long, rpcUrl: String, wsUrl: String,
    indexBlock: Boolean, indexTx: Boolean) extends ChainConfig

object ChainConfig {
  private val mapper = new ObjectMapper()

  /** Parse the CHAINS env JSON. */
  def parse(json: String): Seq[ChainConfig] = {
    val root = mapper.readTree(json)
    (0 until root.size()).map { i =>
      val node = root.get(i)
      if (node.has("Kafka")) {
        val a = node.get("Kafka")
        KafkaChain(a.get(0).asLong(), a.get(1).asText(), a.get(2).asText())
      } else if (node.has("Provider")) {
        val a = node.get("Provider")
        ProviderChain(a.get(0).asLong(), a.get(1).asText(), a.get(2).asText(),
          a.get(3).asBoolean(), a.get(4).asBoolean())
      } else throw new IllegalArgumentException(s"unknown chain variant: $node")
    }
  }
}

/** SRC1/SRC2 + P1/P5: source configuration and decode stages.
  *
  * The Kafka option maps mirror the reference consumer config
  * (reference: config.rs:98-114 — SASL/SCRAM-SHA-256, earliest
  * offsets, 20s/60s timeouts); `spark.readStream.format("kafka")
  * .options(kafkaOptions(...)).load()` is the launch-time wiring (the
  * kafka connector jar is a deploy-time dependency, not present in
  * this build environment).
  */
object Ingest {

  def kafkaOptions(bootstrap: String, topic: String,
      user: Option[String] = None, pass: Option[String] = None,
      maxOffsetsPerTrigger: Long = 100000L): Map[String, String] = {
    val base = Map(
      "kafka.bootstrap.servers" -> bootstrap,
      "subscribe" -> topic,
      "startingOffsets" -> "earliest", // reference: auto.offset.reset=earliest
      "failOnDataLoss" -> "false",
      "maxOffsetsPerTrigger" -> maxOffsetsPerTrigger.toString, // backpressure (channel cap analogue)
      "kafka.socket.timeout.ms" -> "20000", // reference: config.rs:109
      "kafka.session.timeout.ms" -> "60000", // reference: config.rs:110
    )
    val sasl = (user, pass) match {
      case (Some(u), Some(p)) => Map(
        "kafka.security.protocol" -> "SASL_SSL",
        "kafka.sasl.mechanism" -> "SCRAM-SHA-256",
        "kafka.sasl.jaas.config" ->
          ("org.apache.kafka.common.security.scram.ScramLoginModule required " +
            s"""username="$u" password="$p";"""),
      )
      case _ => Map.empty[String, String]
    }
    base ++ sasl
  }

  /** P1: decode a raw (key, value) Kafka-shaped stream into typed
    * trace rows + a quarantined corrupt-record stream. The reference
    * kills the stream on the first malformed payload
    * (kafka/mod.rs:47-49); we quarantine and count instead
    * (SURVEY §7.1 delta 3).
    */
  def decodeTraces(raw: DataFrame, chainId: Long): (DataFrame, DataFrame) = {
    val schema = Schemas.trace.add("_corrupt_record", "string")
    val parsed = raw
      .select(col("value").cast("string").as("payload"))
      .select(from_json(col("payload"), schema,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt_record")).as("t"), col("payload"))
    // good rows gated via explode(when), not a Filter — predicate
    // pushdown through the parse projection would re-evaluate
    // from_json once per referenced field (see decodeBlocks)
    val good = parsed
      .select(explode(when(col("t._corrupt_record").isNull, array(col("t")))
        .otherwise(array().cast(
          new org.apache.spark.sql.types.ArrayType(schema, false)))).as("t"))
      .select(lit(chainId).as("chain_id"), col("t.*")).drop("_corrupt_record")
    val corrupt = parsed.filter(col("t._corrupt_record").isNotNull)
      .select(lit(chainId).as("chain_id"), col("payload"))
    (good, corrupt)
  }

  /** P5: block normalizer — drop pending blocks (no hash/number),
    * apply the reference's defaults (reference: types/block.rs:41-75).
    */
  def decodeBlocks(raw: DataFrame, chainId: Long): DataFrame = {
    val schema = Schemas.block.add("_corrupt_record", "string")
    raw.select(col("value").cast("string").as("payload"))
      .select(from_json(col("payload"), schema,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt_record")).as("b0"))
      // corrupt-drop + pending-drop gated via explode(when), NOT a
      // Filter: PushPredicateThroughProject rewrites a filter on
      // parsed fields into one from_json COPY PER REFERENCED FIELD
      // (3 extra interpreted parses per row — JsonToStructs is
      // CodegenFallback), while CollapseProject's expensive-alias
      // guard keeps this single parse out of the explode expression,
      // so each payload is parsed exactly once.
      .select(explode(when(col("b0._corrupt_record").isNull &&
          col("b0.hash").isNotNull && col("b0.number").isNotNull,
        array(col("b0"))).otherwise(array().cast(new org.apache.spark.sql.types.ArrayType(schema, false)))).as("b"))
      .select(lit(chainId).as("chain_id"), col("b.*")).drop("_corrupt_record")
      .select(
        col("chain_id"), col("number"), col("timestamp"), col("hash"),
        col("parent_hash"),
        coalesce(col("transaction_count"), lit(0)).as("transaction_count"),
        coalesce(col("nonce"), lit("0x0000000000000000")).as("nonce"),
        coalesce(col("miner"), lit(graft.model.Addresses.Zero)).as("miner"),
        coalesce(col("difficulty"), lit(0L)).as("difficulty"),
        coalesce(col("total_difficulty"), lit(0.0)).as("total_difficulty"),
        coalesce(col("size"), lit(0)).as("size"),
        coalesce(col("gas_limit"), lit(0L)).as("gas_limit"),
        coalesce(col("gas_used"), lit(0L)).as("gas_used"),
        coalesce(col("base_fee_per_gas"), lit(0L)).as("base_fee_per_gas"))
  }
}
