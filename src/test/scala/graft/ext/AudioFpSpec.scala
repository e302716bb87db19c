package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class AudioFpSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  /** s16le encode. */
  private def pcm(samples: Seq[Int]): Array[Byte] = {
    val out = new Array[Byte](2 * samples.size)
    samples.zipWithIndex.foreach { case (s, i) =>
      out(2 * i) = (s & 0xff).toByte
      out(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    out
  }

  private def fpOf(bytes: Array[Byte]): Option[String] = {
    import spark.implicits._
    Multimodal.afpPcm16(Seq((1L, bytes)).toDF("doc_id", "payload"))
      .collect().headOption.map(_.getString(1))
  }

  // an energy profile that rises then falls; 520 = 8 * 65 samples, so the
  // 65 window boundaries land exactly (and still do after 2x stretching)
  private def clip(scale: Int) = (0 until 520).map { i =>
    val env = if (i < 260) i else 520 - i
    (env * scale) * (if (i % 2 == 0) 1 else -1)
  }

  test("fingerprint is invariant to exact global gain") {
    assert(fpOf(pcm(clip(10))).get == fpOf(pcm(clip(30))).get)
  }

  test("fingerprint is invariant to 2x stretching of a 65-multiple clip") {
    val doubled = clip(10).flatMap(s => Seq(s, s))
    assert(fpOf(pcm(clip(10))).get == fpOf(pcm(doubled)).get)
  }

  test("a different energy envelope fingerprints differently") {
    val fall = (0 until 520).map(i => (520 - i) * 10 * (if (i % 3 == 0) -1 else 1))
    assert(fpOf(pcm(clip(10))).get != fpOf(pcm(fall)).get)
  }

  test("clips shorter than 65 samples are dropped") {
    assert(fpOf(pcm((0 until 64).map(_ * 100))).isEmpty)
    assert(fpOf(pcm((0 until 65).map(_ * 100))).isDefined)
  }

  test("pairs via the shared block LSH: copy at Hamming 0, perturbed copy nearby") {
    import spark.implicits._
    val a = pcm(clip(10))
    val tweak = a.clone(); tweak(0) = (~tweak(0)).toByte
    val other = pcm((0 until 520).map(i => ((i * 7919) % 2000 - 1000)))
    val df = Seq((1L, a), (2L, a.clone()), (3L, tweak), (4L, other)).toDF("doc_id", "payload")
    val pairs = Multimodal.dhashPairs(Multimodal.afpPcm16(df), maxHamming = 3, hashCol = "afp")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((1L, 2L)) == 0)
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) <= 3)
    assert(!pairs.keys.exists { case (p, q) => p == 4L || q == 4L })
  }
}
