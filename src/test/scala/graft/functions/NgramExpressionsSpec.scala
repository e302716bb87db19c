package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.NgramExpressions.NgramHashes

/** The native NgramHashes expression must emit bitwise the longs of the HOF
  * chain it replaced — `xxhash64(concat_ws(" ", window))` per window — so
  * every downstream dedup artifact (MinHash lanes, LSH band keys, df counts)
  * is unchanged. Covers codegen vs interpreted paths, unicode, null tokens
  * (concat_ws skips them), and short arrays.
  */
class NgramExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def nativeGrams(c: org.apache.spark.sql.Column, n: Int) =
    ColumnBridge.column(NgramHashes(ColumnBridge.expression(c), n))

  private def hofGrams(c: org.apache.spark.sql.Column, n: Int) =
    transform(
      sequence(lit(0), size(c) - n),
      i => xxhash64(concat_ws(" ", (0 until n).map(k => element_at(c, i + k + 1)): _*)))

  test("bitwise-equal to the xxhash64(concat_ws) HOF chain") {
    import spark.implicits._
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b c",
      "héllo wörld 𝒜stral plane tokens",
      "single",
      "x y",
      "repeated repeated repeated repeated").toDF("t")
    for (n <- Seq(1, 2, 3, 5)) {
      val rows = docs
        .select(split(col("t"), " ").as("w"))
        .filter(size(col("w")) >= n)
        .select(nativeGrams(col("w"), n).as("nat"), hofGrams(col("w"), n).as("hof"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"n=$n divergence")
      }
    }
  }

  test("null tokens contribute neither bytes nor separator (concat_ws semantics)") {
    import spark.implicits._
    val df = Seq(Tuple1(Seq[String]("a", null, "b", "c"))).toDF("w")
    val rows = df
      .select(nativeGrams(col("w"), 3).as("nat"), hofGrams(col("w"), 3).as("hof"))
      .collect()
    assert(rows.head.getSeq[Long](0) == rows.head.getSeq[Long](1))
  }

  test("codegen and interpreted paths agree") {
    import spark.implicits._
    val toks = Seq("alpha", "beta", "gamma", "délta")
    val viaCodegen = Seq(Tuple1(toks)).toDF("w")
      .select(nativeGrams(col("w"), 2)).collect().head.getSeq[Long](0)
    val viaEval = NgramHashes(
      Literal.create(
        new GenericArrayData(toks.map(UTF8String.fromString).toArray),
        ArrayType(StringType)), 2)
      .eval(null).asInstanceOf[GenericArrayData].toLongArray().toSeq
    assert(viaCodegen == viaEval)
  }

  test("fewer tokens than n yields an empty array; null input yields null") {
    import spark.implicits._
    val df = Seq(Some(Seq("only", "two")), None).toDF("w")
    val got = df.select(nativeGrams(col("w"), 3)).collect()
    assert(got(0).getSeq[Long](0).isEmpty)
    assert(got(1).isNullAt(0))
  }

  test("registered SQL function ngram_hashes works and pins n to a literal") {
    graft.core.GraftFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT ngram_hashes(split('a b c d', ' '), 2) AS g").collect().head.getSeq[Long](0)
    val viaHof = spark.sql(
      "SELECT transform(sequence(0, 2), i -> xxhash64(concat_ws(' ', " +
        "element_at(split('a b c d', ' '), i + 1), " +
        "element_at(split('a b c d', ' '), i + 2)))) AS g").collect().head.getSeq[Long](0)
    assert(viaSql == viaHof)
  }
}
