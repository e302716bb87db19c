package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the embedding hot path.
  *
  * Spark's higher-order functions (`zip_with`/`aggregate`) express a dot
  * product declaratively but break whole-stage codegen and evaluate
  * interpreted with per-element lambda dispatch — measured ~10x slower than
  * a primitive loop on 64-dim vectors. These expressions keep the
  * declarative surface AND generate the tight loop (`doGenCode`), which is
  * the brief's preference order: native Expression > UDF > driver tricks.
  *
  * FP contract: accumulation is left-to-right from 0.0 — bit-identical to
  * the `aggregate`-fold form and to an oracle folding in the same order.
  */
object VectorExpressions {


  private def checkDoubleArrays(name: String, inputs: Seq[Expression]): TypeCheckResult =
    if (inputs.forall(_.dataType == ArrayType(DoubleType)) ||
      inputs.forall(e => e.dataType.isInstanceOf[ArrayType] &&
        e.dataType.asInstanceOf[ArrayType].elementType == DoubleType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$name requires array<double> inputs, got " + inputs.map(_.dataType.simpleString).mkString(", "))

  /** Null propagation matches the HOF reference forms and SQL engines: a
    * null ELEMENT nulls the whole result (zip_with produces a null product,
    * aggregate's sum then sticks to null).
    */
  private def dotOrNull(a: ArrayData, b: ArrayData): Any = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = checkDoubleArrays(prettyName, Seq(left, right))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_dot"
    // a null ELEMENT nulls the result even when children are
    // non-nullable; without this override nullSafeCodeGen would bind
    // ev.isNull to FalseLiteral and the generated "false = true" fails
    // javac (silent interpreted fallback)
    override def nullable: Boolean = true

    override protected def nullSafeEval(a: Any, b: Any): Any =
      dotOrNull(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
           |  $acc += $a.getDouble($i) * $b.getDouble($i);
           |}
           |if (!${ev.isNull}) { ${ev.value} = $acc; }
         """.stripMargin
      })

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  case class L2Norm(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = checkDoubleArrays(prettyName, Seq(child))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_norm"
    // a null ELEMENT nulls the result even when children are
    // non-nullable; without this override nullSafeCodeGen would bind
    // ev.isNull to FalseLiteral and the generated "false = true" fails
    // javac (silent interpreted fallback)
    override def nullable: Boolean = true

    override protected def nullSafeEval(a: Any): Any = {
      val arr = a.asInstanceOf[ArrayData]
      dotOrNull(arr, arr) match {
        case null => null
        case d: java.lang.Double => math.sqrt(d)
      }
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        val v = ctx.freshName("v")
        s"""
           |int $n = $a.numElements();
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
           |  double $v = $a.getDouble($i);
           |  $acc += $v * $v;
           |}
           |if (!${ev.isNull}) { ${ev.value} = Math.sqrt($acc); }
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Squared L2 distance — the IVF assignment kernel. */
  case class SquaredDistance(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = checkDoubleArrays(prettyName, Seq(left, right))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_dist2"
    // a null ELEMENT nulls the result even when children are
    // non-nullable; without this override nullSafeCodeGen would bind
    // ev.isNull to FalseLiteral and the generated "false = true" fails
    // javac (silent interpreted fallback)
    override def nullable: Boolean = true

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        val d = x.getDouble(i) - y.getDouble(i)
        acc += d * d
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        val d = ctx.freshName("d")
        s"""
           |int $n = Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
           |  double $d = $a.getDouble($i) - $b.getDouble($i);
           |  $acc += $d * $d;
           |}
           |if (!${ev.isNull}) { ${ev.value} = $acc; }
         """.stripMargin
      })

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** (name, info, builder) triples for FunctionRegistry / extension injection. */
  val registry: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("vec_dot", new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    ("vec_norm", new ExpressionInfo(classOf[L2Norm].getName, "vec_norm"),
      (args: Seq[Expression]) => L2Norm(args(0))),
    ("vec_dist2", new ExpressionInfo(classOf[SquaredDistance].getName, "vec_dist2"),
      (args: Seq[Expression]) => SquaredDistance(args(0), args(1))))
}
