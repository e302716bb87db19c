package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ======== Closed-form grouped linear regression ========
  *
  * Per-group simple OLS (y = a·x + b) from sufficient statistics — the
  * calibration primitive a curation pipeline uses to relate one quality
  * signal to another (tokens vs chars, score vs length) per language /
  * source stratum, without any iterative solver.
  *
  * All five moments (Σx, Σy, Σx², Σy², Σxy) accumulate as exact
  * DECIMAL(38,0) over integral inputs, so the single hash aggregate is
  * map-side combinable and order-free — one shuffle carrying five
  * decimals + a count per group, deterministic under any partitioning.
  * The slope/intercept/R² read-out is one fixed IEEE expression tree
  * over those exact integers (the [[TimeSeries]] convention), so the
  * DuckDB oracle replays every double bitwise:
  *
  *   denX = n·Σx² − (Σx)²        (zero ⇒ degenerate x: NULL fit)
  *   denY = n·Σy² − (Σy)²        (zero ⇒ constant y: NULL R²)
  *   num  = n·Σxy − Σx·Σy
  *   slope = num / denX,  intercept = (Σy − slope·Σx) / n
  *   R²    = num² / (denX·denY)
  *
  * No reference citation — `/root/reference/src/flinkarima.py` fits its
  * SARIMAX by grid/CSS per key on the driver side of state; closed-form
  * moment regression is north-star calibration scope.
  */
object Regression {

  /** Per-group OLS of `yCol` on `xCol`. Both columns must be integral
    * (they are cast to long; fixed-point upstream if needed — the cents
    * convention). Null x/y rows are dropped. Output:
    * (group, n, slope, intercept, r2).
    */
  def groupedOls(df: DataFrame, groupCol: String = "g",
      xCol: String = "x", yCol: String = "y"): DataFrame = {
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    df
      .filter(col(groupCol).isNotNull && col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(groupCol).as("g"), x.as("x"), y.as("y"))
      .groupBy("g")
      .agg(
        count(lit(1)).as("n"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
        sum((col("y") * col("y")).cast("decimal(38,0)")).as("syy"),
        sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"))
      .withColumn("nd", expr("CAST(n AS DOUBLE)"))
      .withColumn("denx", expr(
        "(nd * CAST(sxx AS DOUBLE)) - (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"))
      .withColumn("deny", expr(
        "(nd * CAST(syy AS DOUBLE)) - (CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"))
      .withColumn("num", expr(
        "(nd * CAST(sxy AS DOUBLE)) - (CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"))
      .withColumn("slope", when(col("denx") > 0.0, col("num") / col("denx")))
      .select(
        col("g"), col("n"),
        col("slope"),
        when(col("denx") > 0.0,
          expr("(CAST(sy AS DOUBLE) - (slope * CAST(sx AS DOUBLE))) / nd")).as("intercept"),
        when(col("denx") > 0.0 && col("deny") > 0.0,
          expr("(num * num) / (denx * deny)")).as("r2"))
  }
}
