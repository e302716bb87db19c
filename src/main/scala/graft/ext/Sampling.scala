package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset-split operators for training-data
  * pipelines. A 100 TB corpus split must be (a) reproducible under any
  * partitioning, retries, and engine version, (b) stable as the corpus
  * grows (a document's split never changes when other rows are added), and
  * (c) auditable by an external engine. `rand()`-based splits are none of
  * these; hashing the stable id is all three.
  */
object Sampling {

  /** Assign each row a split label by the first 8 hex chars of
    * `md5(cast(id AS string))` compared against cumulative-fraction
    * thresholds. MD5-hex (not xxhash64) on purpose: every SQL engine
    * produces the identical lowercase hex digest, so the assignment is
    * portable and externally auditable — a fixed-length lowercase-hex
    * string compare IS the numeric compare.
    *
    * `splits` are (label, fraction) pairs; fractions must sum to 1. The
    * fractions are exact over the hash space (first 32 bits), so realized
    * proportions converge at O(1/sqrt(n)) like any hash split.
    */
  def deterministicSplit(
      df: DataFrame,
      idCol: String,
      splits: Seq[(String, Double)],
      splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(splits.forall(_._2 > 0), "fractions must be positive")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9, "fractions must sum to 1")
    df.withColumn(splitCol, splitExpr(col(idCol), splits))
  }

  /** Boundary for a cumulative fraction, as 8 lowercase hex chars — or the
    * sentinel "g" (which sorts after every hex digit) once the fraction
    * covers the whole hash space. Two failure modes are excluded by
    * construction:
    *  - formatting floor(1.0 * 2^32) directly would yield 9 chars
    *    ("100000000") and the fixed-length string compare — the invariant
    *    the whole scheme rests on — would silently misroute 15/16 of rows;
    *  - clamping to "ffffffff" (the previous fix) made `hexKey < boundary`
    *    FALSE for keys that hash to exactly ffffffff — a fraction-1.0
    *    stratum silently dropped 1-in-2^32 rows instead of keeping all.
    */
  private def boundaryHex(cum: Double): String = {
    val scaled = math.floor(cum * 4294967296.0).toLong
    if (scaled >= 4294967296L) "g" else f"$scaled%08x"
  }

  /** The assignment expression alone (for composing into larger selects). */
  def splitExpr(id: Column, splits: Seq[(String, Double)]): Column = {
    val hexKey = substring(md5(id.cast("string")), 1, 8)
    val cums = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    splits.init.zip(cums.init.map(boundaryHex)).foldRight(lit(splits.last._1): Column) {
      case (((name, _), bHex), rest) => when(hexKey < lit(bHex), name).otherwise(rest)
    }
  }

  /** Deterministic stratified Bernoulli sample: keep a row iff the first 8
    * hex chars of `md5(stratum || ':' || id)` fall below the stratum's
    * fraction boundary. Hashing the (stratum, id) PAIR — not the id alone —
    * decorrelates the strata: the same id can be kept in one stratum and
    * dropped in another, so per-stratum fractions are independent Bernoulli
    * draws, while staying fully reproducible and external-engine-auditable
    * (same argument as [[deterministicSplit]]). Rows whose stratum is not in
    * `fractions` are sampled at `defaultFraction`; a NULL stratum is one
    * such stratum (hashed under a NUL-byte sentinel so its rows still get
    * independent per-id draws). Rows with a NULL id are always EXCLUDED:
    * with no stable identity there is nothing deterministic to hash, and
    * hashing a sentinel instead would make every null-id row of a stratum
    * share one draw — all kept or all dropped together, which is not a
    * Bernoulli sample.
    */
  def stratifiedSample(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0 && f <= 1),
      "fractions must be in [0, 1]")
    val hexKey = substring(
      md5(concat(coalesce(col(strataCol).cast("string"), lit("\u0000")),
        lit(":"), col(idCol).cast("string"))), 1, 8)
    val boundary = fractions.toSeq.sortBy(_._1).foldRight(lit(boundaryHex(defaultFraction))) {
      case ((stratum, f), rest) =>
        when(col(strataCol) === stratum, lit(boundaryHex(f))).otherwise(rest)
    }
    df.filter(hexKey < boundary)
  }

  /** Deterministic weight-proportional Bernoulli sample: keep a row with
    * probability `weight / max(weight)` (the heaviest row is always kept),
    * decided by exact integer math so an external engine replays the exact
    * kept set, not just its size:
    *
    *   keep  <=>  u32 * max_w < w * 2^32
    *
    * with `u32` = first 8 hex chars of `md5(cast(id AS string))` as a
    * uint32. No division, no floats, no transcendentals — the comparison is
    * exact in both engines (decimal(38) here, hugeint in DuckDB), so the
    * cross-engine boundary-rounding hazard that plagues float thresholds
    * cannot occur by construction.
    *
    * The max-weight scalar travels as a broadcast single-row relation (one
    * extra reduce, no driver collect). Null or non-positive weights never
    * survive (`null > anything` is never-true). The weight column must be
    * integral; at 100 TB the scan + filter is one pass, and the broadcast
    * is 16 bytes.
    */
  def weightedBernoulli(
      df: DataFrame,
      idCol: String,
      weightCol: String): DataFrame = {
    val u32 = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("decimal(38,0)")
    val mw = df.select(max(col(weightCol).cast("long")).as("__max_w"))
    df.crossJoin(broadcast(mw))
      .filter(u32 * col("__max_w").cast("decimal(38,0)") <
        col(weightCol).cast("decimal(38,0)") * lit(4294967296L).cast("decimal(38,0)"))
      .drop("__max_w")
  }

  /** Reference implementation for tests (and for consumers outside Spark). */
  def splitOf(id: String, splits: Seq[(String, Double)]): String = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(id.getBytes("UTF-8")).map(b => f"$b%02x").mkString.substring(0, 8)
    val cums = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    splits.init.zip(cums.init).collectFirst {
      case ((name, _), c) if hex < boundaryHex(c) => name
    }.getOrElse(splits.last._1)
  }
}
