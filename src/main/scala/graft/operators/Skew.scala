package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew-handling operators for the 100 TB contract.
  *
  * AQE's skew-join splitting (on everywhere, SURVEY.md §5) handles
  * sort-merge skew at runtime; these utilities cover the two cases AQE
  * does not: (a) a hot aggregation key whose single reducer saturates
  * (Zipf-headed term counts — the engine's own workload), and (b) an
  * equi-join against a dimension that is too big to broadcast but
  * small enough to replicate `salts` times, where one fact key is hot.
  *
  * Both are pure plan rewrites built from built-ins — the salt is
  * derived (hash mod k), never random, so results are deterministic
  * and replayable.
  */
object Skew {

  /** Two-phase salted aggregation: count/sum per `keyCols` where one
    * key may dominate. Phase 1 aggregates per (key, salt) — spreading
    * a hot key over `salts` reducers — phase 2 combines the per-salt
    * partials. Correct for any commutative-monoid aggregate; count and
    * sum are provided. `saltFrom` columns feed the derived salt (they
    * should vary within a key group, e.g. the doc_id of a tf row). */
  def saltedCounts(df: DataFrame, keyCols: Seq[String], saltFrom: Seq[String],
                   salts: Int = 16): DataFrame = {
    val salt = pmod(xxhash64(saltFrom.map(col): _*), lit(salts))
    df.withColumn("__salt", salt)
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum("__partial").as("n"))
  }

  /** Salted equi-join: every `large` row gets a derived salt in
    * [0, salts); `small` is replicated once per salt value. The join
    * key becomes (key, salt), so a hot key's rows land on `salts`
    * different reducers instead of one. Output equals the plain inner
    * equi-join, column order `large.* ++ small.*` minus the duplicate
    * key. */
  def saltedJoin(large: DataFrame, small: DataFrame,
                 largeKey: String, smallKey: String, salts: Int = 16): DataFrame = {
    val l = large.withColumn("__salt_l",
      pmod(xxhash64(large.columns.map(col): _*), lit(salts)).cast("int"))
    val s = small.withColumn("__salt_r", explode(sequence(lit(0), lit(salts - 1))))
    l.join(s, l(largeKey) === s(smallKey) && l("__salt_l") === s("__salt_r"))
      .drop("__salt_l", "__salt_r", smallKey)
  }

  /** The engine's own skew case as a ready query: corpus word counts
    * via salted two-phase aggregation — same result as the plain
    * groupBy, but a Zipf-headed term can no longer pin one reducer. */
  def saltedWordCount(docs: DataFrame, salts: Int = 16): DataFrame =
    saltedCounts(Bm25.tokenize(docs), keyCols = Seq("term"),
      saltFrom = Seq("doc_id", "term"), salts = salts)

  /** Bloom-filter runtime semi-join: a hand-rolled form of Spark's own
    * InjectRuntimeFilter. The SMALL side's join keys are folded into a
    * driver-built Bloom filter (fixed memory, one pass) that pre-
    * filters the LARGE side BEFORE its shuffle — at 100 TB, a 0.1 %-
    * selective dim cuts the fact shuffle by ~1000× while the final
    * exact semi-join removes the filter's false positives, so the
    * result equals the plain semi-join bit-for-bit.
    *
    * `expectedKeys`/`fpp` size the filter (n·ln(1/fpp)/ln²2 bits —
    * ~1.2 MB for 1 M keys at 1 % fpp; it ships once per executor as a
    * task-closure broadcast). */
  def bloomSemiJoin(large: DataFrame, small: DataFrame,
                    largeKey: String, smallKey: String,
                    expectedKeys: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.types._
    // probe EXACTLY the way stat.bloomFilter inserted: integral keys as
    // longs, strings as strings — a mismatched probe would produce
    // false NEGATIVES, which the exact semi-join below cannot repair
    val (keyType, smallType) =
      (large.schema(largeKey).dataType, small.schema(smallKey).dataType)
    require(keyType == smallType,
      s"bloomSemiJoin: key types differ ($keyType vs $smallType)")
    val bloom = small.stat.bloomFilter(smallKey, expectedKeys, fpp)
    val mightContain = keyType match {
      case ByteType | ShortType | IntegerType | LongType =>
        udf((k: Long) => bloom.mightContainLong(k)).apply(col(largeKey).cast("long"))
      case StringType =>
        udf((k: String) => bloom.mightContainString(k)).apply(col(largeKey))
      case t => throw new IllegalArgumentException(
        s"bloomSemiJoin: unsupported key type $t (integral or string)")
    }
    // alias the small side's key: with identical column names on both
    // sides col(largeKey) === col(smallKey) is ambiguous at analysis
    large.filter(mightContain)
      .join(small.select(col(smallKey).as("__bloom_key")).distinct(),
        col(largeKey) === col("__bloom_key"), "left_semi")
  }
}
