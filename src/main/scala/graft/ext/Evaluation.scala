package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier-evaluation operators for curation pipelines at corpus scale:
  * once a quality/filter model scores every document (see
  * [[TextAnalysis.linearTextScore]]), the pipeline needs to know HOW WELL
  * the score separates the populations it gates on — per-slice ROC-AUC for
  * ranking power and calibration bins for probability faithfulness. Both
  * are exact (no sampling, no sketch) and reduce to integer window/group
  * arithmetic with one final IEEE division per output value, so they sit
  * under bitwise oracles.
  *
  * North-star scope (training-data pipeline evaluation); no reference
  * citation — `/root/reference/src/flinkarima.py` has no classifier path.
  */
object Evaluation {

  /** Exact grouped ROC-AUC by the Mann–Whitney rank-sum identity:
    * `AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺ n⁻)` where R⁺ is the sum of the
    * tie-AVERAGED ranks of the positive class within the group. Ties get
    * the midrank — the standard correction; without it a constant score
    * would fake AUC 0.5·(n⁺+1)/… artifacts instead of exactly 0.5.
    *
    * Integer-exact construction: for a tie block spanning ascending ranks
    * `[r, r+c−1]` in a group of n rows, twice the midrank is
    * `2r + c − 1 = rank_asc + (n − rank_desc + 1)` — so ONE window
    * partition (the group) carrying `rank` over both sort directions plus
    * the group count yields `2·midrank` as pure BIGINT arithmetic; the
    * per-group sums stay exact and the AUC is a single IEEE division of
    * exact integers (bitwise-reproducible across engines, immune to
    * float-sum ordering). Groups missing a class are dropped (AUC is
    * undefined there), not emitted as NULL.
    *
    * 100 TB shape: one hash exchange on the group column; both rank
    * windows and the final aggregate ride it (same partition spec → one
    * Exchange, two in-partition sorts; the groupBy's clustering is
    * satisfied by the window's partitioning). Nothing is quadratic and
    * nothing collects: scores stay distributed, per-group state is three
    * BIGINTs.
    */
  def groupAuc(
      scored: DataFrame,
      groupCol: String = "source",
      scoreCol: String = "score",
      labelCol: String = "label"): DataFrame = {
    val byG = Window.partitionBy(groupCol)
    val asc = byG.orderBy(col(scoreCol).asc)
    val desc = byG.orderBy(col(scoreCol).desc)
    scored
      .filter(col(groupCol).isNotNull && col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .withColumn("__r2",
        rank().over(asc) + count(lit(1)).over(byG) - rank().over(desc) + lit(1L))
      .groupBy(col(groupCol))
      .agg(
        sum(when(col(labelCol), col("__r2")).otherwise(lit(0L))).as("__s2"),
        sum(when(col(labelCol), lit(1L)).otherwise(lit(0L))).as("n_pos"),
        sum(when(col(labelCol), lit(0L)).otherwise(lit(1L))).as("n_neg"))
      .filter(col("n_pos") > 0 && col("n_neg") > 0)
      .select(col(groupCol), col("n_pos"), col("n_neg"),
        ((col("__s2") - col("n_pos") * (col("n_pos") + lit(1L))).cast("double")
          / (col("n_pos") * col("n_neg") * lit(2L)).cast("double")).as("auc"))
  }

  /** Reliability-diagram calibration bins over a raw score (logit): bin by
    * `clamp(floor(score), lo, hi−1)` — binning the LOGIT, not
    * `sigmoid(score)`, is deliberate: `exp` differs across libm
    * implementations in the last ulp, while `floor` of a shared IEEE
    * double is exact everywhere. Each bin reports its size, positive
    * count, accuracy, mean score, and |accuracy − mean score| gap (the
    * per-bin term of expected calibration error; the ECE scalar is a
    * trivial weighted sum the caller can take — emitting bins keeps every
    * output value a SINGLE division of exact integers).
    *
    * The mean score is summed in round-half-away micro-units
    * (`round(score·10⁶)` as BIGINT) so the per-bin sum is exact integer
    * arithmetic — a raw double sum would depend on partition/merge order
    * and could never sit under a bitwise gate. The 10⁻⁶ quantization is
    * part of the operator contract, mirrored by the oracle.
    *
    * 100 TB shape: map-side bin assignment, one hash aggregate whose
    * partial combine reduces every partition to ≤ (hi−lo) rows — the
    * shuffle carries bins, not documents.
    */
  def calibrationBins(
      scored: DataFrame,
      scoreCol: String = "score",
      labelCol: String = "label",
      lo: Long = -8L,
      hi: Long = 8L): DataFrame = {
    require(lo < hi, "lo must be below hi")
    scored
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(
        least(greatest(floor(col(scoreCol)), lit(lo)), lit(hi - 1)).cast("long").as("bin"),
        col(labelCol).as("__l"),
        round(col(scoreCol) * lit(1000000.0)).cast("long").as("__s6"))
      .groupBy("bin")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("__l"), lit(1L)).otherwise(lit(0L))).as("n_pos"),
        sum(col("__s6")).as("__c6"))
      .select(col("bin"), col("n"), col("n_pos"),
        (col("n_pos").cast("double") / col("n").cast("double")).as("acc"),
        (col("__c6").cast("double") / (col("n") * lit(1000000L)).cast("double")).as("conf"))
      .withColumn("gap", abs(col("acc") - col("conf")))
  }
}
