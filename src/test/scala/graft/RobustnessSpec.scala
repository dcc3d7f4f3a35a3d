package graft

import graft.llm.SimilarityOps
import graft.model._
import graft.operators.{TraceEtl, TraceTreeAggregator}
import graft.sinks.{DoNothing, JdbcUpsert, UpsertSpec}
import graft.streaming.StreamingEtl
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Arbitrary}
import org.scalacheck.rng.Seed

class RobustnessSpec extends SparkSpec {

  private val addrs = Vector("0xa", "0xb", "0xc", Addresses.EcRecover,
    Addresses.EcPairing, Addresses.EcAdd, null)

  private val genTrace: Gen[TraceRow] = for {
    hash <- Gen.oneOf("0xh1", "0xh2", "0xh3")
    from <- Gen.oneOf(addrs)
    to <- Gen.oneOf(addrs)
    gas <- Gen.option(Gen.choose(0L, 100L))
    input <- Gen.option(Gen.oneOf("0x61626364", "0x1234567890", "0x" + "ab" * 40))
    output <- Gen.option(Gen.oneOf("0xab", "0x" + "00" * 31 + "ff"))
    isRoot <- Gen.oneOf(true, false)
    idx <- Gen.option(Gen.choose(0, 5))
  } yield TraceRow(1L, hash, idx, Option(from), Option(to), Some("1"),
    input, output, gas, isRoot, Some(1L), Some(100L), Some("0xb"), None)

  test("property: merge is split-invariant (partial aggregation exactness)") {
    val agg = new TraceTreeAggregator
    for (seed <- 0 until 40) {
      val traces = Gen.listOfN(20, genTrace)(Gen.Parameters.default, Seed(seed.toLong))
        .getOrElse(fail(s"gen failed at $seed"))
        .filter(_.transaction_hash == "0xh1")
      val whole = traces.foldLeft(agg.zero)(agg.reduce)
      for (splitAt <- Seq(1, traces.length / 2, math.max(traces.length - 1, 1))) {
        val (a, b) = traces.splitAt(splitAt)
        val merged = agg.merge(
          a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
        val (cw, cm) = (agg.finish(whole), agg.finish(merged))
        // commit output must be identical regardless of partitioning
        // (sigTree seq ordering differs; finish sorts all arrays)
        assert(cw == cm, s"seed=$seed splitAt=$splitAt")
      }
    }
  }

  test("property: commit invariants on random trees") {
    val agg = new TraceTreeAggregator
    for (seed <- 100 until 140) {
      val traces = Gen.listOfN(25, genTrace)(Gen.Parameters.default, Seed(seed.toLong))
        .getOrElse(fail(s"gen failed at $seed"))
      val byTx = traces.groupBy(_.transaction_hash)
      for ((hash, txTraces) <- byTx) {
        val buf = txTraces.foldLeft(agg.zero)(agg.reduce)
        val c = TraceTreeAggregator.commit(buf, 1L, hash)
        val touchesFilter = txTraces.exists(t =>
          t.from_address.isDefined && t.to_address.exists(Addresses.FirstDegreeFilter.contains))
        val rootOk = txTraces.exists(t => t.is_root) && {
          val root = txTraces.find(_.is_root).get
          root.transaction_index.isDefined && root.from_address.isDefined &&
            root.to_address.isDefined
        }
        if (!touchesFilter) {
          // J1: no filter-precompile call -> nothing emitted at all
          assert(c.transaction.isEmpty && c.contracts.isEmpty, s"seed=$seed $hash")
        }
        for (tx <- c.transaction) {
          assert(touchesFilter)
          // contracts' addresses are callers seen in the tx
          val edgeAddrs = txTraces.flatMap(t => t.from_address ++ t.to_address).toSet
          assert(c.contracts.forall(co => edgeAddrs.contains(co.address)))
          // per-degree gas cannot exceed total edge gas
          val totalGas = txTraces.collect {
            case t if t.from_address.isDefined && t.to_address.isDefined => t.gas_used.getOrElse(0L)
          }.sum
          assert(tx.gas_used_first_degree <= totalGas && tx.gas_used_second_degree <= totalGas)
          // closest addresses are contract addresses
          assert(tx.closest_address.toSet.subsetOf(c.contracts.map(_.address).toSet))
        }
      }
    }
  }

  test("end-to-end streaming: MemoryStream -> microBatchCommit -> idempotent sink") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val url = "jdbc:derby:memory:mbdb;create=true"
    val c0 = java.sql.DriverManager.getConnection(url)
    c0.createStatement().execute(
      """CREATE TABLE txs_out ("chain_id" BIGINT, "hash" VARCHAR(100), "rec" BIGINT, PRIMARY KEY ("chain_id", "hash"))""")
    c0.close()
    val spec = UpsertSpec("txs_out", Seq("chain_id", "hash", "rec"),
      Seq("chain_id", "hash"), DoNothing)

    val mem = MemoryStream[(Long, String, String, String, String, Seq[Int], Long)]
    val raw = mem.toDF().toDF("chain_id", "transaction_hash", "from_address",
        "to_address", "input", "trace_address", "block_number")
      .withColumn("transaction_index", lit(0))
      .withColumn("value", lit("0"))
      .withColumn("output", lit(null).cast("string"))
      .withColumn("trace_type", lit("call"))
      .withColumn("call_type", lit("call"))
      .withColumn("reward_type", lit(null).cast("string"))
      .withColumn("gas", lit(10L)).withColumn("gas_used", lit(5L))
      .withColumn("subtraces", lit(0))
      .withColumn("error", lit(null).cast("string"))
      .withColumn("block_timestamp", lit(100L))
      .withColumn("block_hash", lit("0xb"))
    val q = StreamingEtl.microBatchCommit(raw, (txs, contracts, _) => {
      val rows = txs.toDF().select(col("chain_id"), col("transaction_hash").as("hash"),
        col("ec_recover_count").as("rec"))
      JdbcUpsert.upsert(rows, url, spec, "derby")
      StreamingEtl.dedupContracts(contracts.toDF()) // exercised for plan validity
    }).start()
    try {
      mem.addData((1L, "0xm1", "0xa", "0xb", "0x1234567890", Seq.empty[Int], 5L))
      mem.addData((1L, "0xm1", "0xb", Addresses.EcRecover, "0xdeadbeef01", Seq(0), 5L))
      q.processAllAvailable()
      // redeliver the same rows (at-least-once) in a later batch
      mem.addData((1L, "0xm1", "0xa", "0xb", "0x1234567890", Seq.empty[Int], 5L))
      mem.addData((1L, "0xm1", "0xb", Addresses.EcRecover, "0xdeadbeef01", Seq(0), 5L))
      q.processAllAvailable()
      val c1 = java.sql.DriverManager.getConnection(url)
      val rs = c1.createStatement().executeQuery("""SELECT count(*), max("rec") FROM txs_out""")
      rs.next()
      assert(rs.getInt(1) == 1 && rs.getLong(2) == 1L)
      c1.close()
    } finally q.stop()
  }

  test("IVF ANN: recall comparable to LSH path, candidates bounded") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 20)
    val truth = SimilarityOps.bruteForceTopK(emb, queries, "vec_id", "embedding", 5,
        SimilarityOps.cosine)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = SimilarityOps.ivfTopK(emb, queries, "vec_id", "embedding", 5,
        nlist = 16, nprobe = 8)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.count(approx.contains).toDouble / truth.size
    assert(recall >= 0.4, s"IVF recall@5 = $recall")
    info(s"IVF ANN recall@5 = $recall (nprobe 8/16 cells)")
  }

  test("Staging (r18): a crash inside withMarkerDropped leaves a torn " +
      "marker-less dir that stageOnce REPAIRS (delete + rebuild) " +
      "instead of wedging forever (r17 ADVICE)") {
    val St = graft.sources.Staging
    val root = St.sessionTempDir("graft_torn")
    val path = s"$root/artifact"
    def build(content: String): Unit = St.stageOnce(path) { tmp =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(tmp))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(tmp, "data"), content)
      St.touchMarker(tmp)
    }
    build("v1")
    assert(St.hasMarker(path))
    // a successful in-place mutation round-trips the marker
    St.withMarkerDropped(path) {
      assert(!St.hasMarker(path), "marker must be dropped inside the window")
    }
    assert(St.hasMarker(path))
    // crash mid-mutation: the marker stays dropped
    intercept[RuntimeException] {
      St.withMarkerDropped(path) { throw new RuntimeException("boom") }
    }
    assert(!St.hasMarker(path), "a torn mutation must read as incomplete")
    // the old behavior: rename onto the existing dir fails, the catch
    // saw no marker and rethrew — every later call wedged. Now
    // stageOnce deletes the torn dir and rebuilds.
    build("v2")
    assert(St.hasMarker(path), "stageOnce must repair the torn dir")
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(path, "data")) == "v2")
  }
}
