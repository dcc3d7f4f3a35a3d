package graft

import graft.sources.Ingest

/** SRC1/SRC2 config hardening: the one risk VERDICT r8 left open for
  * the Kafka seam is "config typos, not semantics" — no broker or
  * spark-sql-kafka jar exists in this offline sandbox, so this spec
  * pins the config surface itself:
  *
  *  1. the COMPLETE option map, golden, byte-for-byte (any drift —
  *     added, dropped, renamed, or re-valued key — fails here, the
  *     suite-level analogue of an integration run for the option map);
  *  2. every key against the public spark-sql-kafka + kafka-clients
  *     option vocabulary, so a typo'd key that Kafka would silently
  *     ignore at runtime is caught at test time;
  *  3. the SASL/SCRAM JAAS string exactly (reference config.rs:98-114
  *     is the SASL_SSL + SCRAM-SHA-256 + ScramLoginModule shape), incl.
  *     quoting — a malformed JAAS string only fails at broker auth.
  */
class KafkaConfigSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("full option map is pinned (no silent drift)") {
    val got = Ingest.kafkaOptions("b1:9092,b2:9092", "traces_topic",
      Some("etl_user"), Some("s3cr3t"), maxOffsetsPerTrigger = 50000L)
    val want = Map(
      "kafka.bootstrap.servers" -> "b1:9092,b2:9092",
      "subscribe" -> "traces_topic",
      "startingOffsets" -> "earliest",
      "failOnDataLoss" -> "false",
      "maxOffsetsPerTrigger" -> "50000",
      "kafka.socket.timeout.ms" -> "20000",
      "kafka.session.timeout.ms" -> "60000",
      "kafka.security.protocol" -> "SASL_SSL",
      "kafka.sasl.mechanism" -> "SCRAM-SHA-256",
      "kafka.sasl.jaas.config" ->
        ("org.apache.kafka.common.security.scram.ScramLoginModule required " +
          """username="etl_user" password="s3cr3t";"""),
    )
    assert(got == want,
      s"option map drifted:\n missing=${want.keySet -- got.keySet}" +
        s"\n extra=${got.keySet -- want.keySet}" +
        s"\n changed=${want.collect { case (k, v) if got.get(k).exists(_ != v) => k }}")
  }

  test("anonymous map is the SASL-free subset") {
    val anon = Ingest.kafkaOptions("b:9092", "t")
    val auth = Ingest.kafkaOptions("b:9092", "t", Some("u"), Some("p"))
    assert(auth.view.filterKeys(anon.contains).toMap == anon,
      "SASL credentials must only ADD options, never change the base map")
    assert((auth.keySet -- anon.keySet) == Set("kafka.security.protocol",
      "kafka.sasl.mechanism", "kafka.sasl.jaas.config"))
    // a lone user or lone password must not half-configure auth
    assert(Ingest.kafkaOptions("b:9092", "t", user = Some("u")) == anon)
    assert(Ingest.kafkaOptions("b:9092", "t", pass = Some("p")) == anon)
  }

  test("every option key is in the public connector vocabulary") {
    // source options understood by spark-sql-kafka-0-10 (Spark docs,
    // structured-streaming-kafka-integration) — a key outside this set
    // is silently dropped by the DataSource options parser
    val sparkSourceOpts = Set(
      "subscribe", "subscribepattern", "assign", "startingoffsets",
      "endingoffsets", "startingoffsetsbytimestamp",
      "endingoffsetsbytimestamp", "startingtimestamp", "endingtimestamp",
      "failondataloss", "maxoffsetspertrigger", "minoffsetspertrigger",
      "maxtriggerdelay", "minpartitions", "groupidprefix",
      "kafkaconsumer.polltimeoutms", "fetchoffset.numretries",
      "fetchoffset.retryintervalms", "includeheaders")
    // consumer properties forwarded to kafka-clients via the "kafka."
    // prefix (ConsumerConfig / SaslConfigs public names)
    val kafkaClientOpts = Set(
      "bootstrap.servers", "security.protocol", "sasl.mechanism",
      "sasl.jaas.config", "socket.timeout.ms", "session.timeout.ms",
      "request.timeout.ms", "max.poll.records", "fetch.min.bytes",
      "fetch.max.bytes", "heartbeat.interval.ms")
    val opts = Ingest.kafkaOptions("b:9092", "t", Some("u"), Some("p"))
    val bad = opts.keySet.filterNot { k =>
      if (k.startsWith("kafka.")) kafkaClientOpts(k.stripPrefix("kafka."))
      else sparkSourceOpts(k.toLowerCase(java.util.Locale.ROOT))
    }
    assert(bad.isEmpty, s"unknown option keys (typo?): $bad")
  }

  test("JAAS string quoting survives special characters in credentials") {
    val opts = Ingest.kafkaOptions("b", "t", Some("user"), Some("p@ss w0rd!"))
    val jaas = opts("kafka.sasl.jaas.config")
    assert(jaas ==
      "org.apache.kafka.common.security.scram.ScramLoginModule required " +
        """username="user" password="p@ss w0rd!";""")
    assert(jaas.endsWith(";"), "JAAS config must be semicolon-terminated")
  }
}
