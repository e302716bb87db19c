package graft.ext

/** AES (FIPS-197) from scratch — the block cipher behind PDF's /AESV2
  * (AES-128-CBC, PDF 1.6) and /AESV3 (AES-256-CBC, PDF 2.0 / R6)
  * encryption handlers in [[Pdf]].
  *
  * Everything is derived, not recited: the S-box is GENERATED from the
  * published definition (multiplicative inverse in GF(2^8) mod the AES
  * polynomial x^8+x^4+x^3+x+1, then the affine transform with constant
  * 0x63), the round constants by doubling in the same field, and the
  * inverse S-box by inverting the table — so a transcription slip is
  * structurally impossible. Correctness is pinned by the FIPS-197
  * appendix known-answer vectors and a javax.crypto differential in the
  * spec (AesSpec), the same pattern as the SHA-1/MD5 precedent.
  *
  * Block primitives only plus CBC composition; padding policy belongs
  * to the caller ([[Pdf]] applies the PKCS#7-style scheme ISO 32000
  * mandates). Decryption uses the straightforward inverse cipher — at
  * fixture scale the equivalent-inverse-cipher optimization buys
  * nothing and costs derivation risk.
  */
private[ext] object Aes {

  // ---- GF(2^8) arithmetic and the generated tables

  private def xtime(a: Int): Int = {
    val d = a << 1
    if ((d & 0x100) != 0) (d ^ 0x1b) & 0xff else d
  }

  private def gmul(a: Int, b: Int): Int = {
    var acc = 0
    var x = a
    var y = b
    while (y != 0) {
      if ((y & 1) != 0) acc ^= x
      x = xtime(x)
      y >>= 1
    }
    acc & 0xff
  }

  private val sbox: Array[Int] = {
    // exp/log tables over the generator 3 give the multiplicative inverse
    val exp = new Array[Int](256)
    val log = new Array[Int](256)
    var v = 1
    for (i <- 0 until 255) {
      exp(i) = v
      log(v) = i
      v = gmul(v, 3)
    }
    // wrap mod 255: log(1) = 0 would index exp(255), one past the filled
    // range (the generator's cycle is 255 long, exp(255) ≡ exp(0) = 1)
    def inv(x: Int): Int = if (x == 0) 0 else exp((255 - log(x)) % 255)
    def rotl8(x: Int, n: Int): Int = ((x << n) | (x >>> (8 - n))) & 0xff
    Array.tabulate(256) { x =>
      val b = inv(x)
      b ^ rotl8(b, 1) ^ rotl8(b, 2) ^ rotl8(b, 3) ^ rotl8(b, 4) ^ 0x63
    }
  }

  private val invSbox: Array[Int] = {
    val t = new Array[Int](256)
    for (i <- 0 until 256) t(sbox(i)) = i
    t
  }

  // precomputed GF(2^8) multiplication tables for the (Inv)MixColumns
  // constants — the per-byte gmul loop dominated block time before these
  // (the R6 handler's Algorithm 2.B runs thousands of blocks per
  // document, so the block core must be table-driven)
  private def mulTable(k: Int): Array[Int] = Array.tabulate(256)(gmul(_, k))
  private val M2 = mulTable(2)
  private val M3 = mulTable(3)
  private val M9 = mulTable(9)
  private val MB = mulTable(0x0b)
  private val MD = mulTable(0x0d)
  private val ME = mulTable(0x0e)

  // T-tables for the ENCRYPTION rounds: T0(x) = (2·S[x], S[x], S[x],
  // 3·S[x]) packed big-endian, T1..T3 its byte rotations — one lookup+xor
  // per state byte replaces SubBytes+ShiftRows+MixColumns. Encryption is
  // the hot direction (Algorithm 2.B is encrypt-only and runs ~10^2
  // rounds × 128 blocks per R6 document); decryption stays on the plain
  // inverse tables.
  private val T0 = Array.tabulate(256) { x =>
    val s = sbox(x)
    (M2(s) << 24) | (s << 16) | (s << 8) | M3(s)
  }
  private val T1 = Array.tabulate(256)(x => Integer.rotateRight(T0(x), 8))
  private val T2 = Array.tabulate(256)(x => Integer.rotateRight(T0(x), 16))
  private val T3 = Array.tabulate(256)(x => Integer.rotateRight(T0(x), 24))

  // ---- key schedule

  /** Round keys as big-endian WORDS (the encryption path's native form);
    * key length 16 or 32 (24 works too, nothing in the repo uses it).
    */
  private def expandKeyWords(key: Array[Byte]): Array[Int] = {
    require(key.length == 16 || key.length == 24 || key.length == 32,
      s"AES key length ${key.length}")
    val nk = key.length / 4
    val nr = nk + 6
    val w = new Array[Int](4 * (nr + 1)) // words, big-endian byte order inside
    for (i <- 0 until nk)
      w(i) = ((key(4 * i) & 0xff) << 24) | ((key(4 * i + 1) & 0xff) << 16) |
        ((key(4 * i + 2) & 0xff) << 8) | (key(4 * i + 3) & 0xff)
    def subWord(x: Int): Int =
      (sbox((x >>> 24) & 0xff) << 24) | (sbox((x >>> 16) & 0xff) << 16) |
        (sbox((x >>> 8) & 0xff) << 8) | sbox(x & 0xff)
    def rotWord(x: Int): Int = (x << 8) | (x >>> 24)
    var rcon = 1
    for (i <- nk until w.length) {
      var t = w(i - 1)
      if (i % nk == 0) {
        t = subWord(rotWord(t)) ^ (rcon << 24)
        rcon = xtime(rcon)
      } else if (nk > 6 && i % nk == 4) t = subWord(t)
      w(i) = w(i - nk) ^ t
    }
    w
  }

  /** Round-key BYTES (the inverse cipher's state loops index per byte). */
  private def expandKey(key: Array[Byte]): Array[Int] = {
    val w = expandKeyWords(key)
    val out = new Array[Int](4 * w.length)
    for (i <- w.indices; b <- 0 until 4)
      out(4 * i + b) = (w(i) >>> (24 - 8 * b)) & 0xff
    out
  }

  /** One block through the T-table rounds, in place on 4 packed words. */
  private def encryptWords(st: Array[Int], rkw: Array[Int], nr: Int): Unit = {
    var w0 = st(0) ^ rkw(0); var w1 = st(1) ^ rkw(1)
    var w2 = st(2) ^ rkw(2); var w3 = st(3) ^ rkw(3)
    var round = 1
    while (round < nr) {
      val o = 4 * round
      val n0 = T0((w0 >>> 24) & 0xff) ^ T1((w1 >>> 16) & 0xff) ^
        T2((w2 >>> 8) & 0xff) ^ T3(w3 & 0xff) ^ rkw(o)
      val n1 = T0((w1 >>> 24) & 0xff) ^ T1((w2 >>> 16) & 0xff) ^
        T2((w3 >>> 8) & 0xff) ^ T3(w0 & 0xff) ^ rkw(o + 1)
      val n2 = T0((w2 >>> 24) & 0xff) ^ T1((w3 >>> 16) & 0xff) ^
        T2((w0 >>> 8) & 0xff) ^ T3(w1 & 0xff) ^ rkw(o + 2)
      val n3 = T0((w3 >>> 24) & 0xff) ^ T1((w0 >>> 16) & 0xff) ^
        T2((w1 >>> 8) & 0xff) ^ T3(w2 & 0xff) ^ rkw(o + 3)
      w0 = n0; w1 = n1; w2 = n2; w3 = n3
      round += 1
    }
    val o = 4 * nr // final round: SubBytes + ShiftRows only
    st(0) = (((sbox((w0 >>> 24) & 0xff) << 24) | (sbox((w1 >>> 16) & 0xff) << 16) |
      (sbox((w2 >>> 8) & 0xff) << 8) | sbox(w3 & 0xff))) ^ rkw(o)
    st(1) = (((sbox((w1 >>> 24) & 0xff) << 24) | (sbox((w2 >>> 16) & 0xff) << 16) |
      (sbox((w3 >>> 8) & 0xff) << 8) | sbox(w0 & 0xff))) ^ rkw(o + 1)
    st(2) = (((sbox((w2 >>> 24) & 0xff) << 24) | (sbox((w3 >>> 16) & 0xff) << 16) |
      (sbox((w0 >>> 8) & 0xff) << 8) | sbox(w1 & 0xff))) ^ rkw(o + 2)
    st(3) = (((sbox((w3 >>> 24) & 0xff) << 24) | (sbox((w0 >>> 16) & 0xff) << 16) |
      (sbox((w1 >>> 8) & 0xff) << 8) | sbox(w2 & 0xff))) ^ rkw(o + 3)
  }

  private def rounds(keyLen: Int): Int = keyLen / 4 + 6

  // ---- the cipher (state = 16 bytes, column-major per FIPS-197)

  private def addRoundKey(s: Array[Int], rk: Array[Int], off: Int): Unit = {
    var i = 0
    while (i < 16) { s(i) ^= rk(off + i); i += 1 }
  }

  private def invShiftRows(s: Array[Int]): Unit = {
    val t = new Array[Int](16)
    var i = 0
    while (i < 16) { t(i) = s(i); i += 1 }
    var r = 1
    while (r < 4) {
      var c = 0
      while (c < 4) { s(4 * ((c + r) % 4) + r) = t(4 * c + r); c += 1 }
      r += 1
    }
  }

  private def invMixColumns(s: Array[Int]): Unit = {
    var c = 0
    while (c < 4) {
      val a0 = s(4 * c); val a1 = s(4 * c + 1); val a2 = s(4 * c + 2); val a3 = s(4 * c + 3)
      s(4 * c) = ME(a0) ^ MB(a1) ^ MD(a2) ^ M9(a3)
      s(4 * c + 1) = M9(a0) ^ ME(a1) ^ MB(a2) ^ MD(a3)
      s(4 * c + 2) = MD(a0) ^ M9(a1) ^ ME(a2) ^ MB(a3)
      s(4 * c + 3) = MB(a0) ^ MD(a1) ^ M9(a2) ^ ME(a3)
      c += 1
    }
  }

  private def decryptState(s: Array[Int], rk: Array[Int], nr: Int): Unit = {
    addRoundKey(s, rk, 16 * nr)
    var round = nr - 1
    while (round > 0) {
      invShiftRows(s)
      var i = 0
      while (i < 16) { s(i) = invSbox(s(i)); i += 1 }
      addRoundKey(s, rk, 16 * round)
      invMixColumns(s)
      round -= 1
    }
    invShiftRows(s)
    var i = 0
    while (i < 16) { s(i) = invSbox(s(i)); i += 1 }
    addRoundKey(s, rk, 0)
  }

  private def loadWord(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def storeWord(v: Int, b: Array[Byte], off: Int): Unit = {
    b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
  }

  /** One-block ECB (the /Perms field of the R6 handler). */
  def encryptBlock(key: Array[Byte], block: Array[Byte]): Array[Byte] = {
    require(block.length == 16)
    val st = Array(loadWord(block, 0), loadWord(block, 4),
      loadWord(block, 8), loadWord(block, 12))
    encryptWords(st, expandKeyWords(key), rounds(key.length))
    val out = new Array[Byte](16)
    for (c <- 0 until 4) storeWord(st(c), out, 4 * c)
    out
  }

  def decryptBlock(key: Array[Byte], block: Array[Byte]): Array[Byte] = {
    require(block.length == 16)
    val rk = expandKey(key)
    val s = new Array[Int](16)
    var i = 0
    while (i < 16) { s(i) = block(i) & 0xff; i += 1 }
    decryptState(s, rk, rounds(key.length))
    val out = new Array[Byte](16)
    i = 0
    while (i < 16) { out(i) = s(i).toByte; i += 1 }
    out
  }

  /** CBC over whole blocks — `data.length` must already be a multiple of
    * 16 (the caller owns padding policy).
    */
  def cbcEncrypt(key: Array[Byte], iv: Array[Byte], data: Array[Byte]): Array[Byte] = {
    require(iv.length == 16 && data.length % 16 == 0)
    val rkw = expandKeyWords(key)
    val nr = rounds(key.length)
    val out = new Array[Byte](data.length)
    val st = new Array[Int](4)
    var p0 = loadWord(iv, 0); var p1 = loadWord(iv, 4)
    var p2 = loadWord(iv, 8); var p3 = loadWord(iv, 12)
    var off = 0
    while (off < data.length) {
      st(0) = loadWord(data, off) ^ p0
      st(1) = loadWord(data, off + 4) ^ p1
      st(2) = loadWord(data, off + 8) ^ p2
      st(3) = loadWord(data, off + 12) ^ p3
      encryptWords(st, rkw, nr)
      p0 = st(0); p1 = st(1); p2 = st(2); p3 = st(3)
      storeWord(p0, out, off); storeWord(p1, out, off + 4)
      storeWord(p2, out, off + 8); storeWord(p3, out, off + 12)
      off += 16
    }
    out
  }

  def cbcDecrypt(key: Array[Byte], iv: Array[Byte], data: Array[Byte]): Array[Byte] = {
    require(iv.length == 16 && data.length % 16 == 0)
    val rk = expandKey(key)
    val nr = rounds(key.length)
    val out = new Array[Byte](data.length)
    val s = new Array[Int](16)
    val prev = new Array[Int](16)
    var i = 0
    while (i < 16) { prev(i) = iv(i) & 0xff; i += 1 }
    var off = 0
    while (off < data.length) {
      i = 0
      while (i < 16) { s(i) = data(off + i) & 0xff; i += 1 }
      decryptState(s, rk, nr)
      i = 0
      while (i < 16) {
        out(off + i) = (s(i) ^ prev(i)).toByte
        prev(i) = data(off + i) & 0xff
        i += 1
      }
      off += 16
    }
    out
  }
}
