package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text hot path.
  *
  * The polynomial rolling hash was previously expressed as
  * `aggregate(split(text, ""), ...)` — a per-CHARACTER interpreted lambda
  * dispatch (higher-order functions don't participate in whole-stage
  * codegen), which made `fingerprints` the slowest per-row query in the
  * bench. This expression generates the tight loop instead; one string
  * allocation per row, zero per-character dispatch.
  */
object TextExpressions {

  /** Polynomial rolling hash over the string's Unicode code points:
    * `acc = (acc * mult + codePoint) % mod`, left-to-right from 0.
    *
    * Code-point semantics match both the previous HOF form
    * (`split("")`/`ascii` per character) and DuckDB's
    * `regexp_extract_all(s, '.')` + `ascii` (code point of a one-char
    * string), keeping the cross-engine oracle bitwise. `mod` keeps the
    * accumulator well inside int64 (unchecked wraparound is
    * engine-specific).
    */
  case class RollingHash(child: Expression, mult: Long, mod: Long) extends UnaryExpression {
    // the invariant that keeps the fold engine-portable: the accumulator is
    // < mod after each step, so (mod-1)*mult + maxCodePoint must not wrap
    require(mod > 0 && mult > 0 && (mod - 1) <= (Long.MaxValue - Character.MAX_CODE_POINT) / mult,
      s"rolling hash would overflow int64: (mod-1)*mult + maxCodePoint must fit (mult=$mult, mod=$mod)")

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType.simpleString}")

    override def dataType: DataType = LongType
    override def prettyName: String = "rolling_hash"

    override protected def nullSafeEval(input: Any): Any =
      TextExpressions.rollingHashOf(input.asInstanceOf[UTF8String].toString, mult, mod)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val s = ctx.freshName("s")
        val i = ctx.freshName("i")
        val cp = ctx.freshName("cp")
        val acc = ctx.freshName("acc")
        s"""
           |java.lang.String $s = $c.toString();
           |long $acc = 0L;
           |int $i = 0;
           |while ($i < $s.length()) {
           |  int $cp = $s.codePointAt($i);
           |  $acc = ($acc * ${mult}L + $cp) % ${mod}L;
           |  $i += java.lang.Character.charCount($cp);
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Reference implementation (shared by interpreted eval and tests). */
  def rollingHashOf(s: String, mult: Long, mod: Long): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * mult + cp) % mod
      i += Character.charCount(cp)
    }
    acc
  }

  val registry: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("rolling_hash", new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (args: Seq[Expression]) => RollingHash(args(0), 31L, 1000000007L)))
}
