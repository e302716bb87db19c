package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed training-data curation pipeline — the north star's end-to-end
  * shape (BASELINE.json): raw documents -> exact dedup -> near-dup removal ->
  * quality filter -> language tag. Each stage is one of the library
  * operators; this facade wires them the way a 100 TB curation job would:
  *
  *  1. exact dedup keeps the smallest doc_id per content fingerprint
  *     (one shuffle on the 16-byte digest);
  *  2. near-dup removal drops the LARGER id of every verified MinHash-LSH
  *     pair ([[Dedup.minhashLshVerifiedPairs]] — LSH candidates + exact
  *     jaccard verification, never all-pairs);
  *  3. quality gate on cheap single-pass features ([[TextAnalysis.quality]]);
  *  4. language-ID tag kept in the output ([[TextAnalysis.langId]]).
  */
object CurationPipeline {

  final case class Params(
      jaccardThreshold: Double = 0.5,
      minChars: Long = 100L,
      minDistinctRatio: Double = 0.3)

  /** Curated corpus: doc_id, n_chars, n_tokens, distinct_ratio, lang_pred.
    *
    * `materialize = true` (default) stages the exact-deduped set to parquet:
    * the MinHash-LSH verify stage consumes it through several branches
    * (signatures, both gram sides, the anti-join left side), and without
    * materialization each branch re-executes the fingerprint groupBy +
    * semi-join lineage. Parquet staging (not `localCheckpoint`) on purpose:
    * localCheckpoint blocks live only in executor-local storage, so at
    * cluster scale a single lost executor kills the job, whereas staged
    * files sit in shared storage, cut the lineage, and give every
    * downstream branch real size stats for join planning.
    *
    * `stageDir` is the staging location. On a cluster it MUST be a path on
    * shared storage (the job's DFS scratch path, with its lifecycle policy
    * handling cleanup) — executor tasks write the parts, so a node-local
    * path would scatter them. The default uses the session's checkpoint
    * dir when one is configured (already required to be shared storage),
    * else a local temp dir that is deleted on JVM exit — correct for
    * local[*] runs, and loudly wrong (missing parts) rather than subtly
    * wrong on a multi-node cluster without a checkpoint dir.
    */
  def curate(
      docs: DataFrame,
      params: Params = Params(),
      materialize: Boolean = true,
      stageDir: Option[String] = None): DataFrame = {
    // 1. exact duplicates: keep the keeper ids only
    val keepers = Dedup.exact(docs).select(col("keep_id").as("doc_id"))
    val exactDeduped0 = docs.join(keepers, Seq("doc_id"), "left_semi")
    val exactDeduped =
      if (materialize) {
        val spark = docs.sparkSession
        val dir = stageDir
          .orElse(spark.sparkContext.getCheckpointDir.map(d => s"$d/graft-curation-stage-${java.util.UUID.randomUUID()}"))
          .getOrElse {
            val local = java.nio.file.Files.createTempDirectory("graft-curation-stage-")
            Runtime.getRuntime.addShutdownHook(new Thread(() =>
              scala.util.Try {
                java.nio.file.Files.walk(local).sorted(java.util.Comparator.reverseOrder())
                  .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
              }))
            local.toString
          }
        exactDeduped0.write.mode("overwrite").parquet(dir)
        spark.read.parquet(dir)
      } else exactDeduped0

    // 2. near-duplicates among the survivors: drop the larger id of each pair
    val nearDupLosers = Dedup
      .minhashLshVerifiedPairs(exactDeduped, threshold = params.jaccardThreshold)
      .select(col("id_b").as("doc_id"))
      .distinct()
    val nearDeduped = exactDeduped.join(nearDupLosers, Seq("doc_id"), "left_anti")

    // 3+4. quality gate + language tag in ONE pass: both are pure per-row
    // column expressions, so computing them as two scans of nearDeduped and
    // joining back would re-execute the whole dedup DAG twice and add a
    // needless shuffle
    import graft.functions.TextFunctions._
    val langs = langMarkers.map(_._1)
    val pred = langs.init.zipWithIndex.foldRight(lit(langs.last)) { case ((lang, i), rest) =>
      val beatsAllLater = langs.drop(i + 1).map(l2 => col(s"score_$lang") >= col(s"score_$l2")).reduce(_ && _)
      when(beatsAllLater, lang).otherwise(rest)
    }
    nearDeduped
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("distinct_ratio", distinctRatio(col("toks")))
      .filter(col("n_chars") >= params.minChars && col("distinct_ratio") >= params.minDistinctRatio)
      .select(
        Seq(col("doc_id"), col("n_chars"), col("n_tokens"), col("distinct_ratio")) ++
          langMarkers.map { case (lang, markers) => markerScore(col("toks"), markers).as(s"score_$lang") }: _*)
      .withColumn("lang_pred", pred)
      .select("doc_id", "n_chars", "n_tokens", "distinct_ratio", "lang_pred")
  }
}
