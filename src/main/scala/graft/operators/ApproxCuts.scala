package graft.operators

import org.apache.spark.sql.SparkSession

import graft.api.GraftConfig

/** Conf gate for the 100 TB rank-cut path shared by [[CorpusOps.pplBuckets]]
  * and [[TextOps.qualityFilter]].
  *
  * Both queries cut each language's documents at fixed rank fractions
  * (tertiles / the median). The oracle-exact default path ranks with a
  * per-language window — one task per language, fine while a language's
  * (score, id) pairs fit a task's sort budget, a bottleneck at 100 TB
  * where one language can hold billions of documents. Under this gate the
  * cut switches to approx-quantile SCORE cutoffs: one
  * `percentile_approx` aggregate per language (mergeable sketches — fully
  * parallel), then a second scan assigns buckets against the broadcast
  * cutoffs. No per-language window remains; the only window left is the
  * boundary tie-split, partitioned by (lang, score) — tie groups, not
  * languages.
  *
  * Accuracy contract: `percentile_approx(accuracy)` bounds the rank error
  * of the returned cutoff by n/accuracy. When that error is under ONE
  * rank (accuracy > per-language doc count — always true at the test
  * SFs), the cutoff is the exact boundary value and the tie-split
  * reproduces the rank path BIT-EXACTLY (OperatorSpec proves equality at
  * sf0.01); past that scale the buckets deviate by at most n/accuracy
  * documents at each boundary — at n = 10⁹ per language and the default
  * accuracy, ~1000 of 333M head documents, noise for corpus curation.
  */
private[graft] object ApproxCuts {

  /** `"true"` switches the rank cuts to the approx-quantile path. */
  val EnabledKey = "spark.graft.approxQuantileCuts"

  /** `percentile_approx` accuracy (rank error ≤ n/accuracy). */
  val AccuracyKey = "spark.graft.approxQuantileAccuracy"
  val AccuracyDefault = 1000000

  def enabled(spark: SparkSession): Boolean =
    GraftConfig.get(spark, EnabledKey, "false").trim.equalsIgnoreCase("true")

  def accuracy(spark: SparkSession): Int =
    GraftConfig.getInt(spark, AccuracyKey, AccuracyDefault)
}
