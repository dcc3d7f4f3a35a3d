package graft

import graft.model._
import graft.operators.{TraceEtl, TraceEtlRelational}
import org.apache.spark.sql.DataFrame
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Spark-level differential on adversarial random traces: nulls,
  * missing roots, multi-chain, duplicate hashes across chains.
  */
class RandomDiffSpec extends SparkSpec {

  private val addrs = Vector("0xaa", "0xbb", "0xcc", "0xdd",
    Addresses.EcRecover, Addresses.EcPairing, Addresses.EcAdd, Addresses.EcMul, null)

  private val genTrace: Gen[TraceRow] = for {
    chain <- Gen.choose(1L, 2L)
    hash <- Gen.oneOf((1 to 30).map(i => s"0xh$i"))
    from <- Gen.oneOf(addrs)
    to <- Gen.oneOf(addrs)
    gas <- Gen.option(Gen.choose(0L, 100L))
    input <- Gen.option(Gen.oneOf("0x61626364", "0x1234567890", "0x" + "ab" * 40))
    output <- Gen.option(Gen.oneOf("0xab", "0x" + "00" * 31 + "ff", "0x" + "22" * 32))
    isRoot <- Gen.frequency(1 -> true, 4 -> false)
    idx <- Gen.option(Gen.choose(0, 5))
    err <- Gen.option(Gen.const("Reverted"))
  } yield TraceRow(chain, hash, idx, Option(from), Option(to), Some("7"),
    input, output, gas, isRoot, Some(5L), Some(100L), Some("0xbh"), err)

  test("random differential: fused == relational on adversarial traces") {
    import spark.implicits._
    def canon(df: DataFrame): Seq[String] = {
      val cols = df.columns.sorted
      df.selectExpr(cols: _*).collect().map(_.toString).toSeq.sorted
    }
    for (seed <- 0 until 6) {
      val rows = Gen.listOfN(400, genTrace)(Gen.Parameters.default, Seed(seed.toLong))
        .getOrElse(fail("gen failed"))
      val ds = spark.createDataset(rows).repartition(5)
      val (fTx, fC) = TraceEtl.split(TraceEtl.commitTraces(ds))
      val (rTx, rC) = TraceEtlRelational.transform(ds)
      assert(canon(fTx.toDF) == canon(rTx), s"seed=$seed transactions differ")
      assert(canon(fC.toDF) == canon(rC.drop("transaction_hash")),
        s"seed=$seed contracts differ: fused=${fC.count()} rel=${rC.count()}")
    }
  }
}

class RootRankSpec extends SparkSpec {
  test("betterRoot ordering == SQL asc_nulls_last window ordering") {
    import graft.operators.TraceOps
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import org.scalacheck.{Gen => G}
    import org.scalacheck.rng.Seed
    val genRoot: G.type => org.scalacheck.Gen[RootInfo] = _ => for {
      idx <- G.option(G.choose(0, 3))
      from <- G.option(G.oneOf("0xa", "0xb"))
      to <- G.option(G.oneOf("0xc", "0xd"))
      value <- G.option(G.oneOf("1", "22"))
      input <- G.option(G.oneOf("0x61", "0x6162"))
      gas <- G.option(G.choose(0L, 2L))
    } yield RootInfo(idx, from, to, value, input, gas, Some(1L), Some(2L), Some("0xb"), None)
    for (seed <- 0 until 10) {
      val roots = G.listOfN(12, genRoot(G))(G.Parameters.default, Seed(seed.toLong)).get
      // Scala side: minimum by betterRoot
      val scalaMin = roots.reduce(TraceOps.betterRoot)
      // SQL side: the same total order as TraceEtlRelational's window
      val df = roots.toDF()
      val sqlMin = df.withColumn("_rn", row_number().over(
          Window.partitionBy(lit(1)).orderBy(
            col("transaction_index").asc_nulls_last,
            col("from_address").asc_nulls_last,
            col("to_address").asc_nulls_last,
            col("value").asc_nulls_last,
            col("input").asc_nulls_last,
            col("gas_used").asc_nulls_last,
            col("block_number").asc_nulls_last,
            col("block_timestamp").asc_nulls_last,
            col("block_hash").asc_nulls_last,
            col("error").asc_nulls_last)))
        .filter(col("_rn") === 1).drop("_rn").as[RootInfo].head()
      assert(TraceOps.rootRank(sqlMin) == TraceOps.rootRank(scalaMin), s"seed=$seed")
    }
  }

  test("IVF-PQ refine differential (r17): the fused carried-vector " +
      "rerank == the standalone id-join rescoreCandidates path") {
    import org.apache.spark.sql.functions._
    val So = graft.llm.SimilarityOps
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") < 20)
    val fused = So.ivfPqRerankTopK(emb, queries, "vec_id", "embedding", 5)
      .collect().map(_.toSeq).toSet
    // the external-reranker shape: ADC candidates as an id list, then
    // the standalone refine joins the vectors back in
    val cands = So.ivfPqTopK(emb, queries, "vec_id", "embedding", 32)
      .select(col("query_id"), col("neighbor_id"))
    val viaJoin = So.rescoreCandidates(cands, emb, queries, "vec_id",
      "embedding", 5).collect().map(_.toSeq).toSet
    assert(fused == viaJoin,
      "carried-vector refine must equal the id-join refine")
    assert(fused.nonEmpty)
  }

  test("DP ordering differential (r18): on randomized star corpora " +
      "the DP plan always executes to the plain join's rows, never " +
      "prices above the best left-deep, and every step bound is " +
      "sound against the executed subtree") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val S = graft.llm.SketchOps
    val Sc = graft.operators.Scale
    for (seed <- 0 until 4) {
      val rnd = new scala.util.Random(seed)
      // random star: hub H(hk); facts F1(f1_hk, f1_dk), F2(f2_hk,
      // f2_dk) with random fan-outs and hot keys; dims D1(d1_k),
      // D2(d2_k) as random-selectivity subsets
      val nHub = 50 + rnd.nextInt(200)
      val fan1 = 1 + rnd.nextInt(20)
      val fan2 = 1 + rnd.nextInt(20)
      val sel1 = 2 + rnd.nextInt(10)
      val sel2 = 2 + rnd.nextInt(10)
      val hub = (1 to nHub).map(_.toLong).toDF("hk")
      def fact(p: String, fan: Int) =
        (1 to nHub).flatMap { h =>
          val n = 1 + rnd.nextInt(fan)
          (1 to n).map(i => (h.toLong, (h * 100 + i).toLong))
        }.toDF(s"${p}_hk", s"${p}_dk")
      val f1 = fact("f1", fan1)
      val f2 = fact("f2", fan2)
      val d1 = f1.filter(col("f1_dk") % sel1 === 0)
        .select(col("f1_dk").as("d1_k"))
      val d2 = f2.filter(col("f2_dk") % sel2 === 0)
        .select(col("f2_dk").as("d2_k"))
      val dfs = Map("hub" -> hub, "f1" -> f1, "f2" -> f2,
        "d1" -> d1, "d2" -> d2)
      def pt(name: String, keys: String*) =
        Sc.planTable(S.tableStats(dfs(name), col(keys.head),
          keys.map(k => (k, col(k), Option.empty[org.apache.spark.sql.Column])).toSeq),
          name, keys.toSeq)
      val tables = Seq(pt("hub", "hk"),
        pt("f1", "f1_hk", "f1_dk"), pt("f2", "f2_hk", "f2_dk"),
        pt("d1", "d1_k"), pt("d2", "d2_k"))
      val edges = Seq(
        Sc.JoinEdge("f1", "f1_hk", "hub", "hk"),
        Sc.JoinEdge("f2", "f2_hk", "hub", "hk"),
        Sc.JoinEdge("f1", "f1_dk", "d1", "d1_k"),
        Sc.JoinEdge("f2", "f2_dk", "d2", "d2_k"))
      val d = Sc.statsJoinOrderDp(tables, edges, broadcastRows = 20)
      assert(d.totalBound <= d.bestLeftDeepBound,
        s"seed $seed: dp ${d.totalBound} > left-deep ${d.bestLeftDeepBound}")
      // step-bound soundness against executed subtrees
      def audit(p: Sc.DpPlan): Unit = p match {
        case _: Sc.DpLeaf => ()
        case j: Sc.DpJoin =>
          val got = Sc.executeJoinTree(dfs, j).count()
          assert(BigInt(got) <= j.bound,
            s"seed $seed: bound ${j.bound} under true $got at ${j.shapeString}")
          audit(j.left); audit(j.right)
      }
      audit(d.plan)
      val got = Sc.executeJoinTree(dfs, d.plan)
        .select("f1_dk", "f2_dk").collect().map(_.toSeq)
        .sortBy(_.mkString("|"))
      val want = f1.join(hub, col("f1_hk") === col("hk"))
        .join(f2, col("f2_hk") === col("hk"))
        .join(d1, col("f1_dk") === col("d1_k"))
        .join(d2, col("f2_dk") === col("d2_k"))
        .select("f1_dk", "f2_dk").collect().map(_.toSeq)
        .sortBy(_.mkString("|"))
      assert(got.length == want.length && got.sameElements(want),
        s"seed $seed: dp execution diverged from the plain join " +
          s"(shape ${d.shapeString})")
    }
  }
}
