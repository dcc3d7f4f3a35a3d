package graft.functions

/** Deterministic text-hashing primitives for the LLM-data-pipeline
  * operators (dedup, fingerprinting). Pure JVM, no dependencies, safe
  * inside codegen'd expressions and executor-side closures.
  */
object TextHash {

  final val FnvOffset64 = 0xcbf29ce484222325L
  final val FnvPrime64 = 0x100000001b3L

  /** FNV-1a 64-bit over the UTF-8 bytes of `s`. */
  def fnv1a64(s: String): Long = {
    val bytes = s.getBytes("UTF-8")
    var h = FnvOffset64
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime64
      i += 1
    }
    h
  }

  /** Cheap stateless mixer (splitmix64 finalizer) — used to derive the
    * i-th independent hash family from one base hash for MinHash.
    */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d9b331779e1bb3L
    z ^ (z >>> 31)
  }

  /** Whitespace tokenizer shared by simhash/minhash so signatures are
    * stable across operators. Empty tokens dropped.
    */
  def tokens(text: String): Array[String] =
    text.split("\\s+").filter(_.nonEmpty)

  /** 64-bit SimHash: bit-majority vote over FNV-1a token hashes. */
  def simhash64(text: String): Long = {
    val counts = new Array[Int](64)
    val ts = tokens(text)
    var t = 0
    while (t < ts.length) {
      val h = fnv1a64(ts(t))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** MinHash signature of length `k` over `shingleSize`-token shingles.
    * One base FNV hash per shingle; the i-th family is
    * `mix64(base + i * GOLDEN)` — standard one-permutation-per-seed
    * construction (Broder '97).
    */
  def minhash(text: String, k: Int, shingleSize: Int): Array[Long] = {
    val ts = tokens(text)
    val sig = Array.fill(k)(Long.MaxValue)
    if (ts.length < shingleSize) {
      // degenerate doc: hash the whole text once so it still buckets
      val base = fnv1a64(text)
      var i = 0
      while (i < k) { sig(i) = mix64(base + i * 0x9e3779b97f4a7c15L); i += 1 }
      return sig
    }
    var s = 0
    while (s + shingleSize <= ts.length) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < shingleSize) {
        if (j > 0) sb.append(' ')
        sb.append(ts(s + j))
        j += 1
      }
      val base = fnv1a64(sb.toString)
      var i = 0
      while (i < k) {
        val h = mix64(base + i * 0x9e3779b97f4a7c15L)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      s += 1
    }
    sig
  }

  /** LSH band keys for a MinHash signature: `bands` hashes, each over
    * `rows = sig.length / bands` consecutive signature slots. Two docs
    * share a band key iff those rows agree exactly.
    */
  def lshBands(sig: Array[Long], bands: Int): Array[Long] = {
    val rows = sig.length / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = FnvOffset64
      var r = 0
      while (r < rows) {
        val v = sig(b * rows + r)
        var i = 0
        while (i < 8) { h ^= ((v >>> (8 * i)) & 0xffL); h *= FnvPrime64; i += 1 }
        r += 1
      }
      // fold the band index in so identical row-slices in different
      // bands never collide
      out(b) = mix64(h + b)
      b += 1
    }
    out
  }

  /** Rabin-Karp-style rolling fingerprint of a document: the FNV hash
    * of the `w` character-window with the minimum hash value (a
    * "winnowing" fingerprint; Schleimer et al., SIGMOD'03).
    */
  def fingerprint(text: String, w: Int): Long = {
    if (text.length < w) return fnv1a64(text)
    var min = Long.MaxValue
    var i = 0
    while (i + w <= text.length) {
      val h = fnv1a64(text.substring(i, i + w))
      // unsigned compare so the fingerprint is order-stable
      if (java.lang.Long.compareUnsigned(h, min) < 0) min = h
      i += 1
    }
    min
  }
}
