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

  /** (doc_id, n_probes, n_shingles): benchmark decontamination — flag
    * every training document sharing at least one word n-gram with the
    * probe (benchmark/eval) set, with how many probes and how many
    * distinct shingles hit. The probe set is small by nature (eval
    * suites), so its shingles are BROADCAST into the corpus shingle
    * stream — at 100 TB the corpus-side pass stays map-local and only
    * flagged docs reach the final aggregation. */
  def contamination(docs: DataFrame, probes: DataFrame, n: Int = 3): DataFrame = {
    val docSh = Dedup.shingles(docs, n)
    val probeSh = Dedup.shingles(
        probes.select(col("probe_id").as("doc_id"), col("text")), n)
      .select(col("doc_id").as("probe_id"), col("shingle"))
    docSh.join(broadcast(probeSh), "shingle")
      .groupBy("doc_id")
      .agg(countDistinct(col("probe_id")).as("n_probes"),
        countDistinct(col("shingle")).as("n_shingles"))
  }

  /** (doc_id, en_ratio, predicted_lang): stopword-hit-ratio language
    * heuristic. Ratios are exact rational divisions → deterministic. */
  def langId(docs: DataFrame, threshold: Double = 0.05): DataFrame = {
    val stop = Text.stopwordsSqlList
    docs
      .withColumn("toks", graft.functions.Text.rawTokens(col("text")))
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
      .withColumn("toks", graft.functions.Text.rawTokens(col("text")))
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
      .withColumn("toks", graft.functions.Text.rawTokens(col("text")))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_ws"),
        size(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))).cast("long").as("n_alnum"),
        expr("CAST(aggregate(toks, 0L, (acc, t) -> acc + CAST(ceil(length(t) / 4.0) AS LONG)) AS LONG)").as("n_bpe_ish"))

  /** (doc_id, norm_text, n_chars_norm): canonical text normalization —
    * lowercase, collapse whitespace runs, trim. Pure map stage. */
  def normalize(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        trim(regexp_replace(lower(col("text")), "\\s+", " ")).as("norm_text"))
      .withColumn("n_chars_norm", length(col("norm_text")).cast("long"))

  /** (doc_id, redacted): PII masking — emails → <EMAIL>, long digit
    * runs → <NUM>. Regex passes are codegen'd; at scale this is the
    * shape any policy-driven scrubber takes. */
  def redact(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      regexp_replace(
        regexp_replace(col("text"),
          "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
        "[0-9]{7,}", "<NUM>").as("redacted"))

  /** (source, n_docs, avg_tokens, n_ok): corpus triage — quality
    * metrics rolled up per ingestion source (which feeds keep/drop
    * decisions in a training-data pipeline). */
  def qualityBySource(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", graft.functions.Text.rawTokens(col("text")))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("toks"))).cast("long"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("n_tokens")), 6).as("avg_tokens"),
        sum(when(col("n_tokens") >= 10 && col("n_tokens") <= 10000 &&
          col("n_distinct").cast("double") / col("n_tokens") >= 0.2, 1L).otherwise(0L)).as("n_ok"))

  /** (bigram, n): top corpus word-bigram counts (phrase statistics /
    * BPE-merge prep). All occurrences, not per-doc distinct. */
  def topBigrams(docs: DataFrame, k: Int = 20): DataFrame =
    docs.select(graft.functions.Text.rawTokens(col("text")).as("words"))
      .filter(size(col("words")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(words)-1), i -> concat_ws(' ', element_at(words, CAST(i AS INT)), element_at(words, CAST(i+1 AS INT))))")).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram").asc)
      .limit(k)

  /** (doc_id, source): deterministic mixture sampling — every doc gets
    * a reproducible uniform u from md5(doc_id:source) and survives iff
    * u < its source's mixture rate. This is how training mixes are
    * built at scale: no RNG state, re-runs and late-arriving partitions
    * sample identically, and rates are per-source weights. Pure map
    * stage. Demo rates: (source index mod 4 + 1) × 0.25. */
  def mixtureSample(docs: DataFrame): DataFrame =
    docs
      .withColumn("rate",
        ((expr("CAST(substring(source, 4, 10) AS INT)") % 4 + 1) * lit(0.25)))
      .withColumn("u", expr(
        "CAST(conv(substr(md5(concat(CAST(doc_id AS STRING), ':', source)), 1, 8), 16, 10) AS DOUBLE) / 4294967296.0"))
      .filter(col("u") < col("rate"))
      .select("doc_id", "source")

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
