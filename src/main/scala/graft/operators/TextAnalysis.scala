package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Text-analysis operators for a training-data pipeline: language ID,
  * quality scoring, token counting and document fingerprinting. All
  * per-document map-side computations — no shuffle except the final
  * small aggregations — so they stream at 100 TB.
  */
object TextAnalysis {

  /** (doc_id, en_ratio, predicted_lang): stopword-hit-ratio language
    * heuristic. Ratios are exact rational divisions → deterministic. */
  def langId(docs: DataFrame, threshold: Double = 0.05): DataFrame = {
    val stop = Text.stopwordsSqlList
    docs
      .withColumn("toks", split(lower(col("text")), " "))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("n_stop", size(expr(s"filter(toks, t -> t IN ($stop))")))
      .select(col("doc_id"),
        round(col("n_stop").cast("double") / col("n_tokens"), 4).as("en_ratio"),
        when(col("n_stop").cast("double") / col("n_tokens") >= threshold, "en")
          .otherwise("und").as("predicted_lang"))
  }

  /** (doc_id, n_tokens, n_distinct, distinct_ratio, stop_ratio,
    * mean_token_len, rep_ratio, quality_ok): document quality metrics
    * — length, vocabulary diversity, stopword share, repetition. */
  def quality(docs: DataFrame): DataFrame = {
    val stop = Text.stopwordsSqlList
    docs
      .withColumn("toks", split(lower(col("text")), " "))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("toks"))).cast("long"))
      .withColumn("n_stop", size(expr(s"filter(toks, t -> t IN ($stop))")).cast("long"))
      // single-space separated: total token chars = len(text) - (n-1)
      .withColumn("mean_token_len",
        round((length(col("text")) - (col("n_tokens") - 1)).cast("double") / col("n_tokens"), 4))
      .withColumn("max_tf", expr(
        "array_max(transform(array_distinct(toks), d -> size(filter(toks, t -> t = d))))").cast("long"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        round(col("n_distinct").cast("double") / col("n_tokens"), 4).as("distinct_ratio"),
        round(col("n_stop").cast("double") / col("n_tokens"), 4).as("stop_ratio"),
        col("mean_token_len"),
        round(col("max_tf").cast("double") / col("n_tokens"), 4).as("rep_ratio"),
        (col("n_tokens") >= 10 && col("n_tokens") <= 10000 &&
          col("n_distinct").cast("double") / col("n_tokens") >= 0.2).as("quality_ok"))
  }

  /** (doc_id, n_ws, n_alnum, n_bpe_ish): whitespace tokens, alnum-run
    * tokens (regex) and a BPE-ish subword estimate (ceil len/4 per
    * token — quarters are exact binary, so ceil is deterministic). */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", split(lower(col("text")), " "))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_ws"),
        size(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))).cast("long").as("n_alnum"),
        expr("CAST(aggregate(toks, 0L, (acc, t) -> acc + CAST(ceil(length(t) / 4.0) AS LONG)) AS LONG)").as("n_bpe_ish"))

  /** (doc_id, fingerprint): content fingerprint = min md5 over word
    * 3-gram shingles (md5(text) fallback for tiny docs). Robust to
    * word order at the edges, cheap, and a pure map+min aggregation. */
  def fingerprint(docs: DataFrame): DataFrame = {
    val minShingle = Dedup.shingles(docs)
      .groupBy("doc_id").agg(min(md5(col("shingle"))).as("sh_fp"))
    docs.select(col("doc_id"), md5(col("text")).as("txt_fp"))
      .join(minShingle, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("sh_fp"), col("txt_fp")).as("fingerprint"))
  }
}
