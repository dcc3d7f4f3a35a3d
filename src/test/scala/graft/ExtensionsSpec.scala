package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Proves the `spark.sql.extensions=graft.GraftExtensions` deploy
  * path. In a real deployment the conf string lands in the
  * SparkContext conf and Spark instantiates the class by name with a
  * no-arg constructor; the shared test JVM already has a context
  * without the conf, so the spec covers the same contract in two
  * halves: (1) the class loads by name and applies through the
  * builder's public `withExtensions` hook; (2) a session built that
  * way — with NO explicit register() call — resolves and correctly
  * evaluates every graft SQL function.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions loads by name with a no-arg constructor (conf-path contract)") {
    val cls = Class.forName("graft.GraftExtensions")
    val inst = cls.getDeclaredConstructor().newInstance()
    assert(inst.isInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit])
  }

  test("extensions-injected functions resolve and evaluate in plain SQL") {
    // force the shared context up first so the new session reuses it
    val shared = SparkTestBase.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = try {
      SparkSession.builder()
        .master("local[4]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
    assert(s ne shared, "builder must have created a fresh session")
    // keccak256("") — the published empty-input vector
    val empty = s.sql("SELECT keccak256_hex('') AS h").collect().head.getString(0)
    assert(empty ==
      "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    // EIP-55 canonical example address
    val ck = s.sql(
      "SELECT checksum_address('0x5aaeb6053f3e94c9b9a09f33669435e7ef1beaed') AS a")
      .collect().head.getString(0)
    assert(ck == "0x5aAeb6053F3E94C9b9A09f33669435E7Ef1BeAed")
    // every remaining registered name resolves and computes
    assert(s.sql("SELECT simhash64('a b c')").collect().head.getLong(0) ==
      graft.functions.TextHash.simhash64("a b c"))
    assert(s.sql("SELECT dot_long(array(1L,2L), array(3L,4L))")
      .collect().head.getLong(0) == 11L)
    assert(s.sql("SELECT quantized_dot(array(1.0F,2.0F), array(3.0F,4.0F))")
      .collect().head.get(0) != null)
    assert(s.sql("SELECT cosine_sim(array(1.0F,0.0F), array(1.0F,0.0F))")
      .collect().head.get(0) != null)
    // flatten_calls is a Generator — exercised in its LATERAL VIEW form
    assert(s.sql(
      "SELECT count(*) FROM (SELECT 1) " +
        "LATERAL VIEW flatten_calls('{\"calls\":[{\"calls\":[{}]}]}') f")
      .collect().head.getLong(0) == 3L) // root + 2 nested frames
    assert(s.sql("SELECT arith_minhash_sig('a b c')").collect().head
      .getAs[scala.collection.Seq[Long]](0).length == 8)
  }
}
