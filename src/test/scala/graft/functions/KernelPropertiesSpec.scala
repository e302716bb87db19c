package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Arbitrary, Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks of the native kernels against independently
  * constructed references (scalacheck driven directly — the scalatest
  * bridge artifact is not on the offline classpath). Each property runs
  * hundreds of randomized cases including unicode, nulls, and empty
  * tokens — the input classes the fixed-fixture specs cannot enumerate.
  */
class KernelPropertiesSpec extends AnyFunSuite {

  private def check(name: String, prop: Prop, min: Int = 300): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(min), prop)
    assert(res.passed, s"$name: $res")
  }

  // token strings: ascii words, unicode (accents, CJK, astral), empty
  private val tokenGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(12)),
    Gen.oneOf("héllo", "wörld", "日本語", "𝒜stral", "ß", ""),
    Gen.listOfN(3, Gen.choose(' ', '߿')).map(_.mkString).map(_.replace(" ", "x")))

  private val tokensGen: Gen[Array[String]] =
    Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(9 -> tokenGen, 1 -> Gen.const(null: String)))
        .map(_.toArray))

  test("NgramHashKernel == xxhash64 of the concat_ws-joined window, any n, any tokens") {
    val prop = Prop.forAll(tokensGen, Gen.choose(1, 5)) { (toks, n) =>
      val arr = new GenericArrayData(toks.map(t => if (t == null) null else UTF8String.fromString(t)))
      val got = NgramHashKernel.compute(arr, n, 42L)
      val wanted =
        if (toks.length < n) Array.emptyLongArray
        else (0 to toks.length - n).map { s =>
          // independent construction: JVM String join with concat_ws null
          // semantics -> UTF8String -> hash its bytes
          val joined = toks.slice(s, s + n).filter(_ != null).mkString(" ")
          val u = UTF8String.fromString(joined)
          XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes(), 42L)
        }.toArray
      got.sameElements(wanted)
    }
    check("ngram kernel", prop)
  }

  test("RollingHash reference == BigInt-naive fold for random unicode strings") {
    val strGen = Gen.listOf(Gen.frequency(
      8 -> Gen.choose('a', 'z'),
      2 -> Gen.oneOf('é', 'ß', '語', ' '))).map(_.mkString)
    val prop = Prop.forAll(strGen) { s =>
      val naive = s.codePoints().toArray.foldLeft(BigInt(0)) {
        (acc, cp) => (acc * 31 + cp) % 1000000007L
      }
      TextExpressions.rollingHashOf(s, 31L, 1000000007L) == naive.toLong
    }
    check("rolling hash", prop)
  }

  test("splitOf is total for random fraction vectors and ids") {
    val fracGen = Gen.choose(2, 5).flatMap(k =>
      Gen.listOfN(k, Gen.choose(1, 100)).map { ws =>
        val total = ws.sum.toDouble
        ws.zipWithIndex.map { case (w, i) => s"s$i" -> w / total }
      })
    val prop = Prop.forAll(fracGen, Arbitrary.arbitrary[Long]) { (splits, id) =>
      val label = graft.ext.Sampling.splitOf(id.toString, splits)
      splits.exists(_._1 == label)
    }
    check("split totality", prop)
  }

  test("SrpKernel: band keys are scale-invariant (the cosine property)") {
    val vecGen = Gen.choose(1, 16).flatMap(d =>
      Gen.listOfN(d, Gen.choose(-100.0, 100.0)).map(_.toArray))
    val planes = Array.tabulate(8, 16)((i, j) => math.sin(i * 17 + j * 3.1) * 2 - 0.5)
    val prop = Prop.forAll(vecGen, Gen.choose(1.0e-3, 1.0e3)) { (v, scale) =>
      def keys(xs: Array[Double]) =
        SrpKernel.compute(new GenericArrayData(xs), planes, 4).toSeq
      // positive scaling never flips a hyperplane sign -> identical band keys
      keys(v) == keys(v.map(_ * scale))
    }
    check("srp scale invariance", prop, min = 200)
  }
}
