package graft

import org.apache.spark.sql.functions._

/** Drift guard for the driver-generated testdata: when the harness
  * regenerates /root/testdata with a different physical encoding, this
  * suite goes red NAMING the drift instead of letting catalog queries
  * die at analysis time one by one (the round-7 failure mode: events.ts
  * flipped TIMESTAMP(NANOS) → timestamp[us] and killed 9 entries).
  */
class SchemaPinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  test("every shipped table is readable and non-empty") {
    tables.foreach { t =>
      val df = spark.read.parquet(s"$dir/$t.parquet")
      assert(df.columns.nonEmpty, s"$t: empty schema")
      assert(df.limit(1).count() == 1, s"$t: no rows")
    }
  }

  test("event second derivation is physical-timestamp-type agnostic") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft_schemapin").toString
    val sec = 1700000123L
    val micros = sec * 1000000L + 456789L

    // nanos corpora surface as LongType under nanosAsLong — integer path
    val asNanosLong = Seq((1L, micros * 1000L)).toDF("event_id", "ts")
    // µs corpora: parquet timestamp[us] isAdjustedToUTC=false → NTZ
    Seq((1L, micros)).toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
      .write.mode("overwrite").parquet(s"$work/ntz")
    val asNtz = spark.read.parquet(s"$work/ntz")
    // instant-adjusted corpora: timestamp[us] isAdjustedToUTC=true → TZ
    Seq((1L, micros)).toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
      .write.mode("overwrite").parquet(s"$work/tz")
    val asTz = spark.read.parquet(s"$work/tz")

    assert(asNtz.schema("ts").dataType.typeName == "timestamp_ntz",
      s"µs parquet no longer reads as NTZ: ${asNtz.schema("ts").dataType}")
    Seq("nanos-long" -> asNanosLong, "ntz" -> asNtz, "tz" -> asTz).foreach {
      case (label, df) =>
        val got = df.select(Queries.eventSeconds(df.schema("ts").dataType).as("sec"))
          .head().getLong(0)
        assert(got == sec, s"$label: derived sec=$got, want $sec")
    }
  }

  test("the shipped events corpus analyzes through the catalog reader") {
    // whatever precision the current generation carries, the reader must
    // produce a whole-second column usable by the session/dedup entries
    val q = Queries.all("q_d1_dedup_keep_last")(spark, dir)
    assert(q.columns.contains("sec"))
    assert(q.count() > 0)
  }
}
