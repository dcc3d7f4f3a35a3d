package graft

import graft.functions.{GraftFunctions, Keccak, TextHash}
import org.scalatest.funsuite.AnyFunSuite

class KeccakSpec extends AnyFunSuite {

  test("keccak256 known vectors (public keccak.team test vectors)") {
    assert(Keccak.hash256Hex(Array.emptyByteArray) ==
      "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    assert(Keccak.hash256Hex("abc".getBytes("UTF-8")) ==
      "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
    // > one rate block (136 bytes) to exercise multi-block absorb
    val long = ("a" * 200).getBytes("UTF-8")
    assert(Keccak.hash256Hex(long).length == 64)
  }

  test("EIP-55 checksum canonical test addresses (EIP-55 spec)") {
    val vectors = Seq(
      "0x5aaeb6053f3e94c9b9a09f33669435e7ef1beaed" -> "0x5aAeb6053F3E94C9b9A09f33669435E7Ef1BeAed",
      "0xfb6916095ca1df60bb79ce92ce3ea74c37c5d359" -> "0xfB6916095ca1df60bB79Ce92cE3Ea74c37c5d359",
      "0xdbf03b407c01e7cd3cbea99509d93f8dddc8c6fb" -> "0xdbF03B407c01E7cD3CBea99509d93f8DDDC8C6FB",
      "0xd1220a0cf47c7b9be7a2e6ba89f429762e7b9adb" -> "0xD1220A0cf47c7B9Be7A2E6BA89F429762e7b9aDb",
    )
    for ((in, want) <- vectors) {
      assert(Keccak.toChecksumAddress(in) == want)
      assert(Keccak.toChecksumAddress(in.toUpperCase.replace("0X", "0x")) == want)
      assert(Keccak.toChecksumAddress(want) == want) // idempotent
    }
  }

  test("checksum of malformed input is null, not a crash") {
    // 66-char tx hash (the ADVICE.md repro)
    assert(Keccak.toChecksumAddress(
      "0x" + "ab" * 32) == null)
    assert(Keccak.toChecksumAddress("xyz") == null)
    assert(Keccak.toChecksumAddress("") == null)
    assert(Keccak.toChecksumAddress(null) == null)
    assert(Keccak.toChecksumAddress("0x5aaeb6053f3e94c9b9a09f33669435e7ef1beae") == null) // 39 chars
  }

  test("simhash: identical text equal, near-dup close, disjoint far") {
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val b = "the quick brown fox jumps over the lazy cat again and again today"
    val c = "completely different words having zero overlap whatsoever here now"
    assert(TextHash.simhash64(a) == TextHash.simhash64(a))
    val near = TextHash.hamming64(TextHash.simhash64(a), TextHash.simhash64(b))
    val far = TextHash.hamming64(TextHash.simhash64(a), TextHash.simhash64(c))
    assert(near < far, s"near=$near far=$far")
    assert(near <= 16)
  }

  test("minhash: jaccard-similar docs share more signature slots") {
    val a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16"
    val b = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 zz"
    val c = "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11 x12 x13 x14 x15 x16"
    val (sa, sb, sc) = (TextHash.minhash(a, 64, 3), TextHash.minhash(b, 64, 3), TextHash.minhash(c, 64, 3))
    def agree(x: Array[Long], y: Array[Long]) = x.zip(y).count { case (u, v) => u == v }
    assert(agree(sa, sb) > agree(sa, sc))
    assert(agree(sa, sc) == 0)
    assert(TextHash.minhash(a, 64, 3).toSeq == sa.toSeq) // deterministic
  }

  test("lsh bands: identical sigs share all bands; band count stable") {
    val sig = TextHash.minhash("a b c d e f g h i j", 64, 3)
    val b1 = TextHash.lshBands(sig, 16)
    assert(b1.length == 16)
    assert(TextHash.lshBands(sig, 16).toSeq == b1.toSeq)
  }

  test("fingerprint: stable, content-sensitive") {
    val t = "some document text for winnowing fingerprints over characters"
    assert(TextHash.fingerprint(t, 8) == TextHash.fingerprint(t, 8))
    // min-over-windows is append-stable by design; disjoint text differs
    assert(TextHash.fingerprint(t, 8) != TextHash.fingerprint("entirely other corpus body", 8))
    assert(TextHash.fingerprint("tiny", 8) == TextHash.fnv1a64("tiny"))
  }
}

class ExpressionsSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("keccak256_hex / checksum_address via Column API and SQL") {
    import spark.implicits._
    val df = Seq("0x5aaeb6053f3e94c9b9a09f33669435e7ef1beaed").toDF("addr")
    val viaCol = df.select(GraftFunctions.checksum_address(col("addr"))).as[String].head()
    assert(viaCol == "0x5aAeb6053F3E94C9b9A09f33669435E7Ef1BeAed")
    df.createOrReplaceTempView("addrs")
    val viaSql = spark.sql("SELECT checksum_address(addr) FROM addrs").as[String].head()
    assert(viaSql == viaCol)
    val k = Seq("abc").toDF("s")
      .select(GraftFunctions.keccak256_hex(col("s"))).as[String].head()
    assert(k == "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
  }

  test("null and malformed rows flow through as null") {
    import spark.implicits._
    val df = Seq(Some("0x" + "ab" * 32), None, Some("junk")).toDF("addr")
    val out = df.select(GraftFunctions.checksum_address(col("addr"))).as[Option[String]].collect()
    assert(out.forall(_.isEmpty))
  }

  test("wrong arity raises at registration-site, wrong type at analysis") {
    import spark.implicits._
    intercept[Exception] { spark.sql("SELECT keccak256_hex('a','b')").collect() }
    intercept[Exception] {
      Seq(1).toDF("i").select(GraftFunctions.simhash64(col("i"))).collect()
    }
  }

  test("simhash64 expression matches TextHash reference impl") {
    import spark.implicits._
    val t = "spark native analytics engine for traces"
    val got = Seq(t).toDF("s").select(GraftFunctions.simhash64(col("s"))).as[Long].head()
    assert(got == TextHash.simhash64(t))
  }
}
