package graft.functions

/** Pure-Scala Keccak-256 (original Keccak padding 0x01, as used by
  * Ethereum — NOT NIST SHA3's 0x06). Implements Keccak-f[1600] from the
  * public Keccak specification (keccak.team/keccak_specs_summary).
  *
  * Needed for EIP-55 checksum rendering of addresses; the reference
  * engine gets this via ethers-rs `to_checksum`
  * (/root/reference/src/types/etl_result.rs:166-171).
  */
object Keccak {

  private val RC: Array[Long] = Array(
    0x0000000000000001L, 0x0000000000008082L, 0x800000000000808aL,
    0x8000000080008000L, 0x000000000000808bL, 0x0000000080000001L,
    0x8000000080008081L, 0x8000000000008009L, 0x000000000000008aL,
    0x0000000000000088L, 0x0000000080008009L, 0x000000008000000aL,
    0x000000008000808bL, 0x800000000000008bL, 0x8000000000008089L,
    0x8000000000008003L, 0x8000000000008002L, 0x8000000000000080L,
    0x000000000000800aL, 0x800000008000000aL, 0x8000000080008081L,
    0x8000000000008080L, 0x0000000080000001L, 0x8000000080008008L)

  // Rho rotation offsets, indexed by x + 5*y.
  private val ROT: Array[Int] = Array(
    0, 1, 62, 28, 27,
    36, 44, 6, 55, 20,
    3, 10, 43, 25, 39,
    41, 45, 15, 21, 8,
    18, 2, 61, 56, 14)

  private def keccakF(a: Array[Long]): Unit = {
    val c = new Array[Long](5)
    val d = new Array[Long](5)
    val b = new Array[Long](25)
    var round = 0
    while (round < 24) {
      // theta
      var x = 0
      while (x < 5) {
        c(x) = a(x) ^ a(x + 5) ^ a(x + 10) ^ a(x + 15) ^ a(x + 20)
        x += 1
      }
      x = 0
      while (x < 5) {
        d(x) = c((x + 4) % 5) ^ java.lang.Long.rotateLeft(c((x + 1) % 5), 1)
        var y = 0
        while (y < 25) { a(x + y) ^= d(x); y += 5 }
        x += 1
      }
      // rho + pi
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          b(y + 5 * ((2 * x + 3 * y) % 5)) =
            java.lang.Long.rotateLeft(a(x + 5 * y), ROT(x + 5 * y))
          y += 1
        }
        x += 1
      }
      // chi
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          a(x + 5 * y) =
            b(x + 5 * y) ^ (~b((x + 1) % 5 + 5 * y) & b((x + 2) % 5 + 5 * y))
          y += 1
        }
        x += 1
      }
      a(0) ^= RC(round)
      round += 1
    }
  }

  /** Keccak-256 digest of `msg` (32 bytes). Rate = 136 bytes. */
  def hash256(msg: Array[Byte]): Array[Byte] = {
    val rate = 136
    val state = new Array[Long](25)
    // absorb full blocks
    var off = 0
    while (msg.length - off >= rate) {
      absorbBlock(state, msg, off, rate)
      keccakF(state)
      off += rate
    }
    // last (padded) block: msg tail ++ 0x01 .. 0x80
    val last = new Array[Byte](rate)
    System.arraycopy(msg, off, last, 0, msg.length - off)
    last(msg.length - off) = 0x01.toByte
    last(rate - 1) = (last(rate - 1) | 0x80).toByte
    absorbBlock(state, last, 0, rate)
    keccakF(state)
    // squeeze 32 bytes (4 lanes, little-endian)
    val out = new Array[Byte](32)
    var lane = 0
    while (lane < 4) {
      var i = 0
      val v = state(lane)
      while (i < 8) {
        out(lane * 8 + i) = ((v >>> (8 * i)) & 0xff).toByte
        i += 1
      }
      lane += 1
    }
    out
  }

  private def absorbBlock(state: Array[Long], src: Array[Byte], off: Int, rate: Int): Unit = {
    var lane = 0
    while (lane < rate / 8) {
      var v = 0L
      var i = 7
      while (i >= 0) {
        v = (v << 8) | (src(off + lane * 8 + i) & 0xffL)
        i -= 1
      }
      state(lane) ^= v
      lane += 1
    }
  }

  private val HEX = "0123456789abcdef".toCharArray

  def hash256Hex(msg: Array[Byte]): String = {
    val d = hash256(msg)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < d.length) {
      sb.append(HEX((d(i) >> 4) & 0xf)).append(HEX(d(i) & 0xf))
      i += 1
    }
    sb.toString
  }

  private def isHex(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      if (Character.digit(s.charAt(i), 16) < 0) return false
      i += 1
    }
    true
  }

  /** EIP-55 mixed-case checksum of a hex address.
    * Accepts with or without 0x prefix, any case; returns 0x-prefixed
    * checksummed form. Mirrors ethers-rs `to_checksum(addr, None)`
    * (reference output rendering, etl_result.rs:166-171).
    * Returns null for malformed input (not exactly 40 hex chars after
    * stripping the prefix) — an address column can contain junk rows
    * and must not kill the task.
    */
  def toChecksumAddress(address: String): String = {
    if (address == null) return null
    val raw0 = if (address.startsWith("0x") || address.startsWith("0X")) address.substring(2) else address
    if (raw0.length != 40 || !isHex(raw0)) return null
    val raw = raw0.toLowerCase
    val hashHex = hash256Hex(raw.getBytes("US-ASCII"))
    val sb = new java.lang.StringBuilder(42)
    sb.append("0x")
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      val nibble = Character.digit(hashHex.charAt(i), 16)
      sb.append(if (c >= 'a' && c <= 'f' && nibble >= 8) (c - 32).toChar else c)
      i += 1
    }
    sb.toString
  }
}
