package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class GorillaSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("bitsFor: exact bucket boundaries, including the asymmetric Gorilla ranges") {
    assert(Gorilla.bitsFor(0L) == 1)
    assert(Gorilla.bitsFor(-63L) == 9 && Gorilla.bitsFor(64L) == 9)
    assert(Gorilla.bitsFor(-64L) == 12 && Gorilla.bitsFor(65L) == 12)
    assert(Gorilla.bitsFor(-255L) == 12 && Gorilla.bitsFor(256L) == 12)
    assert(Gorilla.bitsFor(-256L) == 16 && Gorilla.bitsFor(257L) == 16)
    assert(Gorilla.bitsFor(-2047L) == 16 && Gorilla.bitsFor(2048L) == 16)
    assert(Gorilla.bitsFor(-2048L) == 68 && Gorilla.bitsFor(2049L) == 68)
    assert(Gorilla.bitsFor(Long.MinValue / 2) == 68)
  }

  test("encode/decode: round-trips on every bucket and on random series") {
    // a series whose dods hit each bucket incl. both signs and boundaries
    val deltas = Seq(1000L, 1000L, 1064L, 1001L, 746L, 1002L, 3050L, 1003L,
      1000003L, 5L, 5L)
    val ts = deltas.scanLeft(1700000000000000000L)(_ + _).toArray
    assert(Gorilla.decode(Gorilla.encode(ts), ts.length).toSeq == ts.toSeq)
    val rnd = new scala.util.Random(4)
    (0 until 30).foreach { _ =>
      val n = rnd.nextInt(300) + 1
      var t = rnd.nextLong() & 0x0fffffffffffffffL
      val series = Array.fill(n) { t += rnd.nextInt(1 << rnd.nextInt(20)); t }
      assert(Gorilla.decode(Gorilla.encode(series), n).toSeq == series.toSeq)
    }
  }

  test("regular cadence compresses to one bit per event after the header") {
    val ts = (0 until 1000).map(i => 1700000000000000000L + i * 60000000000L).toArray
    val bytes = Gorilla.encode(ts)
    // 64 (first) + 68 (first delta 6e10 overflows the small buckets) + 998 * 1
    val wantBits = 64 + 68 + 998
    assert(bytes.length == (wantBits + 7) / 8,
      s"steady cadence must cost ~1 bit/event, got ${bytes.length * 8} bits for 1000 stamps")
  }

  test("tsBlocks: exact stats on a crafted two-series frame; ties resolved by event id") {
    import spark.implicits._
    // series 1: stamps 100, 200, 300: first dod = 100 (the 12-bit bucket),
    // then dod 0 -> 64 + 12 + 1 bits
    // series 2: equal stamps disambiguated by event_id; dod 0 -> 64 + 1 + 1
    val rows = Seq(
      (1L, 100L, 10L), (1L, 200L, 11L), (1L, 300L, 12L),
      (2L, 500L, 20L), (2L, 500L, 21L), (2L, 500L, 22L))
    val df = rows.toDF("user_id", "ts", "event_id")
    val out = Gorilla.tsBlocks(df).collect().map(b => b.user_id -> b).toMap
    def fold(vs: Seq[Long]): Long = vs.foldLeft(0L)((a, x) => (a * 31 + x % 1000000007L) % 1000000007L)
    assert(out(1L).n_events == 3L && out(1L).n_bits == 64L + 12L + 1L)
    assert(out(1L).checksum == fold(Seq(100L, 200L, 300L)))
    assert(out(2L).n_events == 3L && out(2L).n_bits == 64L + 1L + 1L)
    assert(out(2L).checksum == fold(Seq(500L, 500L, 500L)))
    val again = Gorilla.tsBlocks(df.repartition(7)).collect().map(b => b.user_id -> b).toMap
    assert(again.keySet == out.keySet && again.forall { case (k, v) => out(k) == v })
  }
}
