package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.TextExpressions.RollingHash

/** The native RollingHash expression must be bitwise-equal to the HOF
  * formulation it replaced (`aggregate(split(s, ""), ...)` with per-char
  * `ascii`) and to the shared reference implementation, across codegen and
  * interpreted evaluation paths.
  */
class TextExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private val Mod = 1000000007L

  private def nativeHash(c: org.apache.spark.sql.Column) =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c), 31L, Mod))

  private def hofHash(c: org.apache.spark.sql.Column) =
    aggregate(split(c, ""), lit(0L), (acc, ch) => (acc * 31L + ascii(ch).cast("long")) % Mod)

  test("matches the previous HOF form and the reference impl on ASCII text") {
    import spark.implicits._
    val docs = Seq("hello world", "a", "", "the quick brown fox", "zz zz zz", " ").toDF("t")
    val rows = docs
      .select(col("t"), nativeHash(col("t")).as("nat"), hofHash(col("t")).as("hof"))
      .collect()
    rows.foreach { r =>
      val (t, nat, hof) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(nat == hof, s"native vs HOF divergence on '$t'")
      assert(nat == TextExpressions.rollingHashOf(t, 31L, Mod), s"native vs reference on '$t'")
    }
  }

  test("codegen and interpreted paths agree, including non-ASCII code points") {
    import spark.implicits._
    // astral-plane char (surrogate pair) + accents: code-point semantics,
    // matching DuckDB's regexp_extract_all(s, '.') + ascii (code point)
    val texts = Seq("héllo", "𝒜 b", "ßß", "mixed é ascii")
    val df = texts.toDF("t")
    val viaCodegen = df.select(nativeHash(col("t"))).collect().map(_.getLong(0))
    // force the interpreted path by evaluating the expression directly
    val viaEval = texts.map { t =>
      RollingHash(
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(t)), 31L, Mod)
        .eval(null).asInstanceOf[Long]
    }
    assert(viaCodegen.toSeq == viaEval)
    assert(viaEval == texts.map(TextExpressions.rollingHashOf(_, 31L, Mod)))
  }

  test("null input yields null; empty string hashes to 0") {
    import spark.implicits._
    val df = Seq(Some("abc"), None, Some("")).toDF("t")
    val got = df.select(nativeHash(col("t"))).collect()
    assert(!got(0).isNullAt(0))
    assert(got(1).isNullAt(0), "null text must hash to null")
    assert(got(2).getLong(0) == 0L)
  }

  test("registered SQL function rolling_hash works") {
    graft.core.GraftFunctions.register(spark)
    val r = spark.sql("SELECT rolling_hash('hello world') AS h").collect().head.getLong(0)
    assert(r == TextExpressions.rollingHashOf("hello world", 31L, Mod))
  }
}
