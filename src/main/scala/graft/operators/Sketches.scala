package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Statistical profiling + sketch aggregates — the "describe my 100 TB
  * corpus cheaply" surface. Exact profiles (count/avg/stddev/min/max/
  * median) are oracle-checked; the sketch forms (HyperLogLog distinct,
  * approximate quantiles) trade a bounded error for one-pass,
  * fixed-memory aggregation — at scale they are the ONLY way to ask
  * distinct/quantile questions without a full shuffle of the column.
  * Error bounds are asserted against the exact forms in SketchesSpec.
  */
object Sketches {

  /** (event_type, n, n_users, avg_value, stddev_value, min_value,
    * max_value, median_value): exact per-group statistical profile.
    * percentile() is the exact interpolated median — one extra sort
    * per group vs the O(1)-memory sketch below. */
  def statsProfile(events: DataFrame): DataFrame =
    events.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      countDistinct(col("user_id")).as("n_users"),
      round(avg("value"), 6).as("avg_value"),
      round(stddev_samp(col("value")), 6).as("stddev_value"),
      round(min("value"), 6).as("min_value"),
      round(max("value"), 6).as("max_value"),
      round(expr("percentile(value, 0.5)"), 6).as("median_value"))

  /** (column, n_nulls, n_distinct): schema-generic data-quality
    * profile — null and exact-distinct counts for every column of any
    * table, in ONE scan (a single wide aggregate, unpivoted with
    * `stack`). The first thing run against a new 100 TB delivery. */
  def tableProfile(df: DataFrame): DataFrame = {
    val aggs = df.columns.flatMap { c =>
      // coalesce: sum over zero rows is NULL, but "no rows" profiles
      // as zero nulls, not unknown
      Seq(coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(s"__nulls_$c"),
        countDistinct(col(c)).as(s"__distinct_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = df.columns
      .map(c => s"'$c', `__nulls_$c`, `__distinct_$c`").mkString(", ")
    wide.select(expr(
      s"stack(${df.columns.length}, $stackArgs) AS (column, n_nulls, n_distinct)"))
  }

  /** (event_type, approx_users, exact_users): HyperLogLog++ distinct
    * counts beside the exact ones. rsd=0.02 → ~2 % relative error at
    * a few KB of state per group, vs a full per-group shuffle of every
    * user_id for the exact count. */
  def approxDistinct(events: DataFrame, rsd: Double = 0.02): DataFrame =
    events.groupBy("event_type").agg(
      approx_count_distinct(col("user_id"), rsd).as("approx_users"),
      countDistinct(col("user_id")).as("exact_users"))

  /** (event_type, sample_hashes): deterministic uniform sample of each
    * group's distinct users — the k smallest md5 hashes, via the
    * [[graft.functions.BottomK]] typed Aggregator (bounded state ≤ k
    * per group at any corpus size; replayable, unlike RNG reservoir
    * sampling). */
  def kmvSample(events: DataFrame, k: Int = 8): DataFrame = {
    val bottomK = udaf(new graft.functions.BottomK(k),
      org.apache.spark.sql.Encoders.STRING)
    events
      .select(col("event_type"), md5(col("user_id").cast("string")).as("h"))
      .groupBy("event_type")
      .agg(array_join(bottomK(col("h")), ",").as("sample_hashes"))
  }

  /** (event_type, p50, p90, p99): one-pass approximate quantiles
    * (Greenwald-Khanna sketch; `accuracy` trades state for error —
    * observed rank error ≤ 1/accuracy). */
  def approxQuantiles(events: DataFrame, accuracy: Int = 10000): DataFrame =
    events.groupBy("event_type").agg(
      expr(s"approx_percentile(value, array(0.5, 0.9, 0.99), $accuracy)").as("qs"))
      .select(col("event_type"),
        round(element_at(col("qs"), 1), 6).as("p50"),
        round(element_at(col("qs"), 2), 6).as("p90"),
        round(element_at(col("qs"), 3), 6).as("p99"))

  /** (term, est_count): Count-Min-Sketch heavy hitters — terms whose
    * ESTIMATED corpus frequency is ≥ `minShare` of all kept tokens.
    * The sketch is a fixed (eps, confidence)-sized 2-D counter array
    * folded in one distributed pass (`stat.countMinSketch` merges
    * per-partition sketches); estimates then price the DISTINCT terms
    * only. CMS never undercounts, so the result is a SUPERSET of the
    * true heavy hitters with est ≤ true + eps·N (w.p. ≥ confidence) —
    * both bounds are asserted in SketchesSpec. At 100 TB this answers
    * "which tokens dominate my corpus" in one pass with ~eps⁻¹·ln(1/δ)
    * counters of state, no term-keyed shuffle of the full stream. */
  def heavyHitters(docs: DataFrame, minShare: Double = 0.01,
                   eps: Double = 0.001, confidence: Double = 0.99): DataFrame = {
    val toks = Bm25.tokenize(docs)
    val cms = toks.stat.countMinSketch(col("term"), eps, confidence, seed = 42)
    val total = cms.totalCount()
    val threshold = (total * minShare).toLong
    val est = udf((t: String) => cms.estimateCount(t))
    toks.select("term").distinct()
      .withColumn("est_count", est(col("term")))
      .filter(col("est_count") >= threshold)
  }
}
