package graft.core

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier

import graft.functions.{NgramExpressions, TextExpressions, VectorExpressions}

/** SQL-surface registration of the native expressions, so
  * `spark.sql("SELECT vec_dot(a, b) ...")` works cluster-wide:
  *
  *   spark.sql.extensions=graft.core.GraftSparkExtensions
  *
  * (For an already-running session use [[GraftFunctions.register]].)
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, info, builder) =>
      extensions.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

/** Runtime registration into an existing session's function registry. */
object GraftFunctions {
  private[core] val all = VectorExpressions.registry ++ TextExpressions.registry ++ NgramExpressions.registry

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(FunctionIdentifier(name), info, builder)
    }
}
