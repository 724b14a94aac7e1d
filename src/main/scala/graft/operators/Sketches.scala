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
    * The sketch is the classic d×w counter array (Cormode &
    * Muthukrishnan 2005), built here from md5-DERIVED row hashes
    * (`conv(substr(md5(r:term),1,8),16,10) % w`) so the whole sketch
    * is deterministic and replayable — the DuckDB oracle rebuilds the
    * identical counters, promoting this key from rows-only to
    * hash-checked (same treatment the MinHash banding got). Counter
    * fold = one aggregation on (row, bucket): d·w distinct keys
    * (8,192 at the defaults), so map-side partial aggregation
    * collapses every partition to sketch-sized state and the shuffle
    * moves ~d·w rows per partition — NO term-keyed shuffle of the
    * token stream, the property that makes CMS the 100 TB answer to
    * "which tokens dominate". Estimates then price the DISTINCT terms
    * via a broadcast join against the tiny counter relation, min over
    * the d rows. CMS never undercounts, so the result is a SUPERSET
    * of the true heavy hitters with est ≤ true + (e/w)·N — both
    * bounds asserted in SketchesSpec. */
  def heavyHitters(docs: DataFrame, minShare: Double = 0.01,
                   d: Int = 4, w: Int = 2048): DataFrame = {
    val toks = Bm25.tokenize(docs)
    val rows = (0 until d).map { r =>
      struct(lit(r).as("r"),
        (conv(substring(md5(concat(lit(s"$r:"), col("term"))), 1, 8), 16, 10)
          .cast("long") % w).as("bucket"))
    }
    def buckets(rel: DataFrame): DataFrame =
      rel.select(col("term"), explode(array(rows: _*)).as("rb"))
        .select(col("term"), col("rb.r").as("r"), col("rb.bucket").as("bucket"))
    val counters = buckets(toks).groupBy("r", "bucket").agg(count(lit(1)).as("cnt"))
    // N = every token counted once = the row-0 counter mass
    val total = counters.filter(col("r") === 0).agg(sum("cnt").as("n"))
    // distinct on the term ALONE (not term×d exploded rows) — the
    // d bucket columns re-derive as a pure projection after the shuffle
    buckets(toks.select("term").distinct())
      .join(broadcast(counters), Seq("r", "bucket"))
      .groupBy("term").agg(min("cnt").as("est_count"))
      .crossJoin(broadcast(total))
      .filter(col("est_count") >= lit(minShare) * col("n"))
      .select(col("term"), col("est_count"))
  }

  /** (event_type, kmv_users, exact_users): K-Minimum-Values distinct
    * cardinality estimate (Bar-Yossef et al. 2002) beside the exact
    * count — est = (k−1)/h_(k) where h_(k) is the k-th smallest
    * md5(user) mapped to [0,1). The fold is [[graft.functions.BottomK]]
    * (sorted-distinct, ≤ k strings of state per group, merged
    * per-partition — no distinct-user shuffle for the sketch itself),
    * and because lowercase fixed-width hex compares lexicographically
    * exactly as the 128-bit value compares numerically, the k-th
    * string IS the k-th hash. Unlike HLL ([[approxDistinct]]) the
    * estimator is hash-replayable: the DuckDB oracle re-derives the
    * same k-th hash and the same (k−1)/h_(k), so this key is
    * hash-checked. Groups with fewer than k distinct users report the
    * exact count (the sketch holds them all). exact_users is the
    * side-by-side verification baseline (as in [[approxDistinct]]);
    * at scale you would drop that column and keep the bounded fold. */
  def kmvDistinct(events: DataFrame, k: Int = 64): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val bottomK = udaf(new graft.functions.BottomK(k),
      org.apache.spark.sql.Encoders.STRING)
    val M = "1152921504606846976" // 16^15: first-15-hex-digits scale
    events
      .select(col("event_type"), md5(col("user_id").cast("string")).as("h"))
      .groupBy("event_type")
      .agg(bottomK(col("h")).as("bk"), countDistinct(col("h")).as("exact_users"))
      .select(col("event_type"),
        round(when(col("exact_users") < k, col("exact_users").cast("double"))
          .otherwise(lit((k - 1).toDouble) /
            (conv(substring(element_at(col("bk"), least(size(col("bk")), lit(k))), 1, 15), 16, 10)
              .cast("double") / lit(M).cast("double"))), 4).as("kmv_users"),
        col("exact_users"))
  }

  /** The top-`n` HEAVIEST sources judged from the sketch relation
    * itself — zero additional corpus work: an unfilled sketch's size
    * IS its exact distinct-shingle count, and among full sketches a
    * SMALLER k-th minimum hash means a larger set (the KMV estimator
    * itself), so (size desc, h_k asc, source asc) is a deterministic
    * heaviness rank computed from the ≤ #sources sketch rows alone.
    * One TakeOrdered over the already-aggregated relation. */
  private def topSketches(sk: DataFrame, n: Int): DataFrame =
    sk.orderBy(size(col("bk")).desc,
      element_at(col("bk"), size(col("bk"))).asc, col("source").asc)
      .limit(n)

  /** (src_a, src_b, k_used, n_both, est_jaccard): pairwise SOURCE
    * SIMILARITY from KMV SKETCHES — the cross-source content-overlap
    * matrix at sketch cost. Each source's word-3-gram shingle set
    * collapses to its k smallest md5 hashes (the [[graft.functions
    * .BottomK]] aggregator: bounded state, partial-merged map-side, so
    * at 100 TB each source ships k strings, never its shingle set);
    * Jaccard is then estimated on the sketch algebra alone: take the k
    * smallest of the UNION of two sketches and count how many sit in
    * both (Beyer et al. 2007's k-min-values sets). The pair join is
    * sketch×sketch — source-count-bounded rows of k hashes, nothing
    * corpus-sized — and the estimate divides two exact ints. md5 is
    * deterministic, so unlike RNG-seeded sketches the WHOLE estimator
    * replays in the oracle: hash-checked, not rows-only (the same
    * promotion the CMS heavy hitters and KMV distinct counts got).
    * Contrast with the exact [[Relational.audienceOverlap]]: that one
    * intersects full id sets; this one never materializes a set.
    *
    * The OUTPUT is the source×source matrix — quadratic in source
    * cardinality BY CONTRACT (the capability is the matrix), so like
    * [[TextAnalysis.segment]]'s dictionary the relation is bounded
    * rather than open-ended: only the top-`maxSources` HEAVIEST
    * sources enter the matrix, ranked from the sketch relation itself
    * (exact distinct-shingle count while a sketch is unfilled, the
    * KMV h_k estimator once full — one TakeOrdered over ≤ #sources
    * rows, zero additional corpus work). Curated source lists (the
    * common case) sit far under the default and see every pair; an
    * open-domain corpus (10⁶ domains → 10¹² unbounded pairs) degrades
    * gracefully to the pairs among its heaviest sources instead of
    * attempting an output no consumer could hold. Raise the cap
    * deliberately when the matrix is the product. */
  def kmvJaccard(docs: DataFrame, k: Int = 64, maxSources: Int = 1000): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    require(maxSources >= 2, s"a pair matrix needs maxSources >= 2, got $maxSources")
    val bottomK = udaf(new graft.functions.BottomK(k),
      org.apache.spark.sql.Encoders.STRING)
    val sh = docs
      .select(col("source"), graft.functions.Text.rawTokens(col("text")).as("words"))
      .filter(size(col("words")) >= 3)
      .select(col("source"),
        explode(graft.functions.Native.shingles(col("words"), 3)).as("shingle"))
      .select(col("source"), md5(col("shingle")).as("h"))
    // no distinct() before the UDAF: BottomK dedups internally, so the
    // only shuffle carries <= k hashes per (partition, source); the
    // self-join's two sides share the aggregation subtree, so the
    // corpus pass runs once (ReusedExchange)
    val sk = topSketches(
      sh.groupBy("source").agg(bottomK(col("h")).as("bk")), maxSources)
    val pairs = sk.as("a").join(broadcast(sk.as("b")),
      col("a.source") < col("b.source")) // sketch-bounded nested loop
    pairs
      .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
        col("a.bk").as("abk"), col("b.bk").as("bbk"))
      .withColumn("mg", slice(array_sort(array_distinct(concat(col("abk"), col("bbk")))), 1, k))
      .select(col("src_a"), col("src_b"),
        size(col("mg")).cast("long").as("k_used"),
        size(filter(col("mg"), h =>
          array_contains(col("abk"), h) && array_contains(col("bbk"), h)))
          .cast("long").as("n_both"))
      .withColumn("est_jaccard",
        round(col("n_both").cast("double") / col("k_used"), 6))
  }

  /** (src_a, src_b, k_used, est_union): UNION-CARDINALITY estimates
    * between source shingle sets from MERGED KMV sketches — the
    * mergeability property that makes KMV the scale tool for set
    * algebra: bottom-k(A∪B) = bottom-k(bottom-k(A) ∪ bottom-k(B)), so
    * per-source sketches built in ONE corpus pass answer any pair (or
    * ad-hoc group) by k-element array arithmetic — no re-scan, no
    * pairwise shingle join, and sketches union associatively across
    * partitions/batches (the distributed-combine property). Exact
    * when the merged sketch holds the whole union (k_used < k);
    * otherwise the standard (k−1)/h_k estimator on the merged k-th
    * smallest hash — same first-15-hex-digit grid as [[kmvDistinct]].
    * Completes the KMV algebra alongside [[kmvJaccard]] (intersection
    * ratio) and [[kmvDistinct]] (single-set cardinality). Shares
    * [[kmvJaccard]]'s top-`maxSources` bound on the pair matrix. */
  def kmvUnion(docs: DataFrame, k: Int = 64, maxSources: Int = 1000): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    require(maxSources >= 2, s"a pair matrix needs maxSources >= 2, got $maxSources")
    val bottomK = udaf(new graft.functions.BottomK(k),
      org.apache.spark.sql.Encoders.STRING)
    val sh = docs
      .select(col("source"), graft.functions.Text.rawTokens(col("text")).as("words"))
      .filter(size(col("words")) >= 3)
      .select(col("source"),
        explode(graft.functions.Native.shingles(col("words"), 3)).as("shingle"))
      .select(col("source"), md5(col("shingle")).as("h"))
    val sk = topSketches(
      sh.groupBy("source").agg(bottomK(col("h")).as("bk")), maxSources)
    val M = "1152921504606846976" // 16^15: first-15-hex-digits scale
    sk.as("a").join(broadcast(sk.as("b")), col("a.source") < col("b.source"))
      .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
        slice(array_sort(array_distinct(concat(col("a.bk"), col("b.bk")))), 1, k)
          .as("mg"))
      .select(col("src_a"), col("src_b"),
        size(col("mg")).cast("long").as("k_used"),
        round(when(size(col("mg")) < k, size(col("mg")).cast("double"))
          .otherwise(lit((k - 1).toDouble) /
            (conv(substring(element_at(col("mg"), k), 1, 15), 16, 10)
              .cast("double") / lit(M).cast("double"))), 4).as("est_union"))
  }
}
