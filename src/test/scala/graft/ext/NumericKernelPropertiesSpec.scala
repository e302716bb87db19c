package graft.ext

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks of the round-6 driver-side numeric kernels (PQ
  * encode, ADC identity, power iteration) against independently
  * constructed references — pure JVM, no Spark session, hundreds of
  * randomized cases per property.
  */
class NumericKernelPropertiesSpec extends AnyFunSuite {

  private def check(name: String, prop: Prop, min: Int = 200): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(min), prop)
    assert(res.passed, s"$name: $res")
  }

  private val dimsGen: Gen[(Int, Int, Int)] = for {
    m <- Gen.choose(1, 4)
    sub <- Gen.choose(1, 5)
    c <- Gen.choose(1, 6)
  } yield (m, sub, c)

  private def vecGen(n: Int): Gen[Array[Double]] =
    Gen.listOfN(n, Gen.choose(-5.0, 5.0)).map(_.toArray)

  private def booksGen(m: Int, sub: Int, c: Int): Gen[Array[Array[Array[Double]]]] =
    Gen.listOfN(m, Gen.listOfN(c, vecGen(sub)).map(_.toArray)).map(_.toArray)

  test("PQ encode: codes are the per-subspace argmin and err is the sum of the minima") {
    val prop = Prop.forAll(dimsGen.flatMap { case (m, sub, c) =>
      for {
        books <- booksGen(m, sub, c)
        v <- vecGen(m * sub)
      } yield (m, sub, books, v)
    }) { case (m, sub, books, v) =>
      val (code, err) = Quantization.encode(books, sub, v)
      // independent reference: plain-Scala min over the subspace distances
      val wantCodes = (0 until m).map { j =>
        val ds = books(j).map(cent => Quantization.subDist(v, j * sub, cent))
        ds.indexOf(ds.min) // first minimum, the strict-< tie rule
      }
      val wantErr = (0 until m).map(j => books(j).map(c2 => Quantization.subDist(v, j * sub, c2)).min).sum
      code.toSeq == wantCodes && math.abs(err - wantErr) <= 1e-12 * math.max(1.0, math.abs(wantErr))
    }
    check("pq encode", prop)
  }

  test("ADC identity: LUT distance at a vector's code equals the distance to its reconstruction") {
    val prop = Prop.forAll(dimsGen.flatMap { case (m, sub, c) =>
      for {
        books <- booksGen(m, sub, c)
        v <- vecGen(m * sub)
        q <- vecGen(m * sub)
      } yield (m, sub, books, v, q)
    }) { case (m, sub, books, v, q) =>
      val (code, _) = Quantization.encode(books, sub, v)
      // the ADC table sum, exactly as pqTopK computes it
      val adc = (0 until m).map(j => Quantization.subDist(q, j * sub, books(j)(code(j)))).sum
      // reference: flat squared L2 between q and the codebook reconstruction
      val recon = (0 until m).flatMap(j => books(j)(code(j))).toArray
      val flat = q.zip(recon).map { case (a, b) => (a - b) * (a - b) }.sum
      math.abs(adc - flat) <= 1e-9 * math.max(1.0, flat)
    }
    check("adc identity", prop)
  }

  test("power iteration: dominant eigenpair has a small residual on random PSD matrices") {
    val psdGen: Gen[Array[Array[Double]]] = for {
      d <- Gen.choose(2, 6)
      b <- Gen.listOfN(d, vecGen(d))
    } yield {
      // A = B^T B is symmetric PSD
      val bt = b.toArray
      Array.tabulate(d, d)((i, j) => (0 until d).map(r => bt(r)(i) * bt(r)(j)).sum)
    }
    val prop = Prop.forAll(psdGen) { cov =>
      val d = cov.length
      val (comps, eigs) = Features.topComponents(cov, k = 1, iterations = 500)
      val v = comps(0)
      val lambda = eigs(0)
      val cv = Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * v(j)).sum)
      val residual = math.sqrt(Array.tabulate(d)(i => math.pow(cv(i) - lambda * v(i), 2)).sum)
      val norm = math.sqrt(cov.map(_.map(x => x * x).sum).sum) // Frobenius
      // power iteration converges linearly in the eigengap; random Wishart
      // matrices occasionally have a tiny gap, so accept a loose ceiling —
      // the property still rejects a broken matVec/deflation/sign step
      lambda >= -1e-9 && residual <= 1e-3 * math.max(1.0, norm)
    }
    check("power iteration", prop, min = 100)
  }
}
