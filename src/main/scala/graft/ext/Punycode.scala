package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** ======== Punycode / IDNA host labels (RFC 3492) ========
  *
  * Internationalized domain names are everywhere in a real crawl
  * frontier — a URL stack that cannot turn `xn--mnchen-3ya` back into
  * `münchen` mis-keys host-level dedup, robots lookups, and link
  * graphs. This is the bootstring algorithm from scratch with the IDNA
  * parameters (base 36, tmin 1, tmax 26, skew 38, damp 700, initial
  * bias 72, initial n 128): generalized variable-length integers over
  * the insertion-ordering state machine, bias adaptation per code
  * point, strict decode (non-basic code points in the basic prefix,
  * bad digits, overflow past 0x10FFFF, and unconsumed input are all
  * malformed).
  *
  * Verified three ways: round trip, a BOTH-directions differential
  * against the JDK's own `java.net.IDN` (toASCII/toUnicode implement
  * the same RFC), and the `idna_host_decode` oracle, where the decoded
  * unicode host is rebuilt closed-form in SQL (`chr()` + concat) — the
  * decode path must invert our encoder bit-exactly to match.
  *
  * 100 TB shape: map-only per-row label transforms; no state, no
  * shuffle. No reference citation — north-star crawl scope.
  */
object Punycode {

  final class MalformedPunycode extends RuntimeException("malformed punycode", null, false, false)
  private def fail(): Nothing = throw new MalformedPunycode

  private val Base = 36
  private val TMin = 1
  private val TMax = 26
  private val Skew = 38
  private val Damp = 700
  private val InitialBias = 72
  private val InitialN = 128

  private def adapt(delta0: Int, numPoints: Int, firstTime: Boolean): Int = {
    var delta = if (firstTime) delta0 / Damp else delta0 / 2
    delta += delta / numPoints
    var k = 0
    while (delta > ((Base - TMin) * TMax) / 2) {
      delta /= Base - TMin
      k += Base
    }
    k + ((Base - TMin + 1) * delta) / (delta + Skew)
  }

  private def digitChar(d: Int): Char =
    if (d < 26) ('a' + d).toChar else ('0' + d - 26).toChar

  private def charDigit(c: Char): Int =
    if (c >= 'a' && c <= 'z') c - 'a'
    else if (c >= 'A' && c <= 'Z') c - 'A'
    else if (c >= '0' && c <= '9') c - '0' + 26
    else fail()

  /** Encode one label's code points to the punycode form (WITHOUT the
    * `xn--` prefix). Pure-ASCII input is the caller's fast path — this
    * always emits the extended form.
    */
  private[ext] def encodeLabel(label: String): String = {
    val cps = label.codePoints().toArray
    val out = new StringBuilder
    cps.foreach(cp => if (cp < InitialN) out.append(cp.toChar))
    val basic = out.length
    if (basic > 0) out.append('-')
    var n = InitialN
    var delta = 0
    var bias = InitialBias
    var handled = basic
    while (handled < cps.length) {
      var m = Int.MaxValue
      cps.foreach(cp => if (cp >= n && cp < m) m = cp)
      if (m - n > (Int.MaxValue - delta) / (handled + 1)) fail() // overflow
      delta += (m - n) * (handled + 1)
      n = m
      cps.foreach { cp =>
        if (cp < n) {
          delta += 1
          if (delta < 0) fail()
        }
        if (cp == n) {
          var q = delta
          var k = Base
          var done = false
          while (!done) {
            val t = if (k <= bias) TMin else if (k >= bias + TMax) TMax else k - bias
            if (q < t) {
              out.append(digitChar(q))
              done = true
            } else {
              out.append(digitChar(t + (q - t) % (Base - t)))
              q = (q - t) / (Base - t)
              k += Base
            }
          }
          bias = adapt(delta, handled + 1, handled == basic)
          delta = 0
          handled += 1
        }
      }
      delta += 1
      n += 1
    }
    out.toString
  }

  /** Strict decode of one punycode label (WITHOUT the `xn--` prefix)
    * back to its unicode string.
    */
  private[ext] def decodeLabel(text: String): String = {
    val lastDelim = text.lastIndexOf('-')
    val cps = new java.util.ArrayList[Integer]()
    var i = 0
    if (lastDelim > 0) {
      while (i < lastDelim) {
        val c = text.charAt(i)
        if (c >= InitialN) fail() // non-basic in the basic prefix
        cps.add(c.toInt)
        i += 1
      }
      i = lastDelim + 1
    } else if (lastDelim == 0) i = 1 // empty basic prefix, delimiter present
    var n = InitialN
    var pos = 0
    var bias = InitialBias
    while (i < text.length) {
      val oldPos = pos
      var w = 1
      var k = Base
      var done = false
      while (!done) {
        if (i >= text.length) fail() // truncated variable-length integer
        val d = charDigit(text.charAt(i))
        i += 1
        if (d > (Int.MaxValue - pos) / w) fail()
        pos += d * w
        val t = if (k <= bias) TMin else if (k >= bias + TMax) TMax else k - bias
        if (d < t) done = true
        else {
          if (w > Int.MaxValue / (Base - t)) fail()
          w *= Base - t
          k += Base
        }
      }
      bias = adapt(pos - oldPos, cps.size() + 1, oldPos == 0)
      if (pos / (cps.size() + 1) > Int.MaxValue - n) fail()
      n += pos / (cps.size() + 1)
      pos %= cps.size() + 1
      if (n < InitialN || n > 0x10FFFF || (n >= 0xD800 && n <= 0xDFFF)) fail()
      cps.add(pos, n)
      pos += 1
    }
    val sb = new StringBuilder
    cps.forEach(cp => sb.appendAll(Character.toChars(cp)))
    sb.toString
  }

  /** IDNA host transforms: per dot-separated label, `xn--` prefixed
    * punycode for labels with any non-ASCII code point (encode), and
    * the inverse (decode). Labels are lowercased before encoding (the
    * IDNA profile this engine normalizes to); a label that is not
    * valid punycode under an `xn--` prefix is malformed.
    */
  def toAscii(host: String): String =
    host.split("\\.", -1).map { label =>
      if (label.forall(_ < 128)) label
      else "xn--" + encodeLabel(label.toLowerCase)
    }.mkString(".")

  def toUnicode(host: String): String =
    host.split("\\.", -1).map { label =>
      val lower = label.toLowerCase
      if (lower.startsWith("xn--")) decodeLabel(lower.substring(4))
      else label
    }.mkString(".")

  final case class IdnaHost(doc_id: Long, host_unicode: String, n_idn_labels: Long)

  /** The oracled fixture pair: a deterministic unicode host per doc id
    * (base word + one non-ASCII code point + digit + TLD; every fifth
    * id stays pure ASCII), pushed through ENCODE (our bootstring, `xn--`
    * form) then DECODE — the emitted host must equal the closed-form
    * construction, so either direction slipping one code point or one
    * bias adaptation fails the hash. Map-only.
    */
  def idnaSignal(docs: DataFrame, idCol: String = "doc_id"): Dataset[IdnaHost] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .filter(col(idCol).isNotNull && col(idCol) >= 0)
      .select(col(idCol).cast("long"))
      .as[Long]
      .map { id =>
        val host = fixtureHost(id)
        val ascii = toAscii(host)
        val back = toUnicode(ascii)
        val idnLabels = ascii.split("\\.", -1).count(_.startsWith("xn--"))
        IdnaHost(id, back, idnLabels.toLong)
      }
  }

  private val baseWords = Array("news", "shop", "blog", "mail", "docs", "wiki", "cloud", "store")
  private val specials = Array(0xE9, 0xFC, 0xF1, 0x4E2D, 0x434, 0x3B1) // é ü ñ 中 д α
  private val tlds = Array("com", "org", "net", "io")

  private[ext] def fixtureHost(id: Long): String = {
    val base = baseWords((id % 8).toInt)
    val label =
      if (id % 5 == 0) base + (id % 10).toString
      else base + new String(Character.toChars(specials((id % 6).toInt))) + (id % 10).toString
    label + "." + tlds((id % 4).toInt)
  }
}
