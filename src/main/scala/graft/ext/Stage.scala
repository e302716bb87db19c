package graft.ext

import org.apache.spark.sql.DataFrame

/** The staging exchange (optimization guide §2.5) as a shared, GUARDED
  * helper: spread a narrow pre-kernel relation across the session's cores
  * when — and only when — its current partitioning is below them.
  *
  * Why it exists: the bench corpus parquets are ONE file with ONE row
  * group, so every scan is a single task, and any per-doc/per-token work
  * with no earlier exchange (tokenize → explode → partial aggregate,
  * per-doc kernels) runs on one of the session's cores — the guide's
  * "one huge unsplittable file" input-skew shape at the small end. One
  * round-robin repartition of the (id, text)-width rows costs ~the input
  * bytes once and frees every downstream operator.
  *
  * Why it is guarded (unlike the fixture-render sites, which repartition
  * unconditionally): these call sites are SCALE-REAL operators. At
  * cluster volumes the scan has far more splits than cores and an
  * unconditional `repartition(defaultParallelism)` would COALESCE the
  * relation down to the core count — each partition a corpus-sized
  * slice. The guard makes the exchange fire exactly when the input is
  * narrower than the session's cores (the [[CurationPipeline]]
  * exactStage convention).
  *
  * Why the guard is memoized: `df.rdd.getNumPartitions` runs physical
  * planning of the subtree — measured ~0.25s per query BUILD on the
  * bench session (AQE prep + scan partition planning), paid inside the
  * timed region on every rep. The partition count of a given logical
  * plan under a given session does not change between reps, so the
  * decision is cached by (session, canonicalized-plan hash). This caches
  * a PLAN PROPERTY only — never data or results; a wrong entry after a
  * hash collision could only toggle the exchange, never correctness.
  */
private[graft] object Stage {

  private val decisions =
    new java.util.concurrent.ConcurrentHashMap[(org.apache.spark.sql.SparkSession, Int), java.lang.Boolean]()

  /** `df` round-robin-spread to `defaultParallelism` partitions iff it
    * currently has fewer; `df` itself otherwise.
    */
  def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    if (decisions.size() > 4096) decisions.clear() // bound the memo (sessions come and go)
    val key = (spark, df.queryExecution.logical.canonicalized.semanticHash())
    val need = decisions.computeIfAbsent(key, _ => df.rdd.getNumPartitions < target)
    if (need) df.repartition(target) else df
  }
}
