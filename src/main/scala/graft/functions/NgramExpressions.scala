package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform

/** One-pass word-n-gram hashing for the dedup hot path.
  *
  * The previous form — `explode(transform(sequence(0, size(w)-n),
  * i -> concat_ws(" ", w[i+1], ..., w[i+n]))) |> xxhash64` — pays an
  * interpreted lambda dispatch per gram (higher-order functions don't
  * participate in whole-stage codegen) plus a UTF8String allocation per gram
  * for a string whose only purpose is to be hashed and discarded. At 100 TB
  * the gram hash is the map-side inner loop of every MinHash / Jaccard /
  * LSH operator, so it must be a tight loop.
  *
  * [[NgramHashKernel.compute]] writes each window's tokens into one reused
  * byte buffer (single-space-joined, exactly `concat_ws(" ", ...)`'s bytes —
  * null tokens contribute neither bytes nor a separator) and hashes the
  * buffer with the same XXH64(seed=42) Spark's `xxhash64` applies to a
  * string column, so the emitted longs are bitwise-identical to the HOF
  * chain's and every downstream artifact (MinHash lanes, band keys, df
  * counts) is unchanged.
  */
object NgramHashKernel {
  def compute(arr: ArrayData, n: Int, seed: Long): Array[Long] = {
    val m = arr.numElements()
    if (m < n) return Array.emptyLongArray
    val out = new Array[Long](m - n + 1)
    var buf = new Array[Byte](64)
    var g = 0
    while (g < out.length) {
      var len = 0
      var appended = 0
      var k = 0
      while (k < n) {
        if (!arr.isNullAt(g + k)) {
          if (appended > 0) len += 1
          len += arr.getUTF8String(g + k).numBytes()
          appended += 1
        }
        k += 1
      }
      if (buf.length < len) buf = new Array[Byte](math.max(len, buf.length * 2))
      var off = 0
      appended = 0
      k = 0
      while (k < n) {
        if (!arr.isNullAt(g + k)) {
          val t = arr.getUTF8String(g + k)
          if (appended > 0) { buf(off) = ' '; off += 1 }
          t.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET + off)
          off += t.numBytes()
          appended += 1
        }
        k += 1
      }
      out(g) = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, off, seed)
      g += 1
    }
    out
  }
}

object NgramExpressions {

  /** `array<bigint>` of xxhash64 word-n-gram hashes over a token array;
    * empty when the array holds fewer than `n` tokens (explode then yields
    * no rows, matching the `size(w) >= n` pre-filter semantics).
    */
  case class NgramHashes(child: Expression, n: Int, seed: Long = 42L)
      extends UnaryExpression {
    require(n >= 1, "n-gram size must be >= 1")

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got ${other.simpleString}")
      }

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "ngram_hashes"

    override protected def nullSafeEval(input: Any): Any =
      new GenericArrayData(
        NgramHashKernel.compute(input.asInstanceOf[ArrayData], n, seed))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
           |  graft.functions.NgramHashKernel.compute($a, $n, ${seed}L));""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  val registry: Seq[(String, org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    ("ngram_hashes",
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[NgramHashes].getName, "ngram_hashes"),
      (args: Seq[Expression]) => {
        val n = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"ngram_hashes(tokens, n): n must be an integer literal, got $other")
        }
        NgramHashes(args.head, n)
      }))
}
