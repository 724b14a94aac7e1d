package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.Lineage._

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
  def contamination(docs: DataFrame, probes: DataFrame, n: Int = 3): DataFrame =
    contaminationFromIndex(docs,
      Dedup.shingles(probes.select(col("probe_id").as("doc_id"), col("text")), n)
        .select(col("doc_id").as("probe_id"), col("shingle")), n)

  /** [[contamination]] against a PRE-SHINGLED probe index — the
    * staged-artifact form: benchmark suites shingle once, every
    * corpus (or arriving micro-batch) joins the same persisted
    * relation. Probe sets are benchmark-sized → broadcast. */
  def contaminationFromIndex(docs: DataFrame, probeSh: DataFrame, n: Int = 3): DataFrame =
    Dedup.shingles(docs, n).join(broadcast(probeSh), "shingle")
      .groupBy("doc_id")
      .agg(countDistinct(col("probe_id")).as("n_probes"),
        countDistinct(col("shingle")).as("n_shingles"))

  /** (probe_id, n_shingles, n_hit, rate): PROBE-side contamination —
    * for each eval/benchmark document, the fraction of its word
    * n-grams that appear anywhere in the training corpus (the
    * published-LM-report-style per-eval-doc "dirtiness" used to EXCLUDE probes,
    * where [[contamination]] flags TRAINING docs to drop). Exact
    * counts, one rounded ratio. Scale shape: the probe shingle SET is
    * broadcast into one corpus-side semi-join pass (map-local at
    * 100 TB); the distinct-hit aggregation is probe-bounded, and the
    * corpus is never re-keyed. */
  def contaminationRate(docs: DataFrame, probes: DataFrame, n: Int = 3): DataFrame = {
    val probeSh = Dedup.shingles(
      probes.select(col("probe_id").as("doc_id"), col("text")), n)
      .select(col("doc_id").as("probe_id"), col("shingle"))
    val hitShingles = Dedup.shingles(docs, n).select("shingle")
      .join(broadcast(probeSh.select("shingle").distinct()), Seq("shingle"), "left_semi")
      .distinct()
    val hits = probeSh.join(hitShingles, Seq("shingle"), "left_semi")
      .groupBy("probe_id").agg(count(lit(1)).as("n_hit"))
    probeSh.groupBy("probe_id").agg(count(lit(1)).as("n_shingles"))
      .join(hits, Seq("probe_id"), "left")
      .select(col("probe_id"), col("n_shingles"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        round(coalesce(col("n_hit"), lit(0L)).cast("double") / col("n_shingles"), 4)
          .as("rate"))
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

  /** (lang, predicted_lang, n, share): language-ID CONFUSION MATRIX —
    * [[langId]]'s predictions cross-tabulated against the corpus's
    * ground-truth lang column, with each cell's share of its true-lang
    * row (the per-class recall diagonal / leakage off-diagonal). This
    * is the evaluation query that turns the heuristic into a measured
    * component: a production pipeline runs it on every labeled sample
    * before trusting the filter. One doc-keyed join (prediction ←
    * truth), one (lang, predicted)-keyed aggregation; row totals are
    * a langs-cardinality broadcast. */
  def langConfusion(docs: DataFrame): DataFrame = {
    val cells = langId(docs)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy("lang", "predicted_lang").agg(count(lit(1)).as("n"))
    val totals = cells.groupBy(col("lang").as("tl")).agg(sum("n").as("row_n"))
    cells.join(broadcast(totals), col("lang") === col("tl"))
      .select(col("lang"), col("predicted_lang"), col("n"),
        round(col("n").cast("double") / col("row_n"), 4).as("share"))
  }

  /** Max term frequency within a token array, LINEARLY: run-length
    * max over the sorted array (one aggregate pass, O(n log n) for the
    * sort) — the naive transform(array_distinct, d -> count matches)
    * form is O(distinct × n) interpreted-lambda work per row, which a
    * 100k-token doc turns into ~5e9 comparisons. NULL on an empty
    * array (matching array_max-over-empty semantics and the oracle).
    * The VALUE is identical to the naive form; only the cost changed. */
  private def maxTfSql(toks: String): String =
    s"""IF(size($toks) = 0, CAST(NULL AS BIGINT), aggregate(
       |  array_sort($toks),
       |  named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'best', 0L),
       |  (a, t) -> named_struct(
       |    'prev', t,
       |    'run', IF(a.prev IS NOT NULL AND t = a.prev, a.run + 1L, 1L),
       |    'best', greatest(a.best, IF(a.prev IS NOT NULL AND t = a.prev, a.run + 1L, 1L))),
       |  a -> a.best))""".stripMargin

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
      .withColumn("max_tf", expr(maxTfSql("toks")).cast("long"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        round(col("n_distinct").cast("double") / col("n_tokens"), 4).as("distinct_ratio"),
        round(col("n_stop").cast("double") / col("n_tokens"), 4).as("stop_ratio"),
        col("mean_token_len"),
        round(col("max_tf").cast("double") / col("n_tokens"), 4).as("rep_ratio"),
        (col("n_tokens") >= 10 && col("n_tokens") <= 10000 &&
          col("n_distinct").cast("double") / col("n_tokens") >= 0.2).as("quality_ok"))
  }

  /** One row (n, n11, n10, n01, n00, po, kappa): Cohen's kappa
    * between the engine's two keep/drop raters — [[quality]]'s
    * heuristic gate (`quality_ok`) and [[gopherRules]]' `keep` — the
    * chance-corrected inter-rater agreement a curation pipeline
    * reports before trusting either gate alone (raw agreement po
    * overstates consensus when both raters keep almost everything).
    * Exact integer core: the 2×2 confusion counts are BIGINT sums,
    * and kappa's closed form clears denominators —
    * kappa = (n·(n11+n00) − (a1·b1 + a0·b0)) / (n² − (a1·b1 + a0·b0))
    * with a1/b1 the per-rater keep counts — so the ONLY float op is
    * one final division (round(·,6)); a degenerate chance-agreement
    * of 1 (both raters constant) yields NULL on both engines. Bound:
    * n² < 2⁶³ → n < 3e9 docs per scope. One corpus pass per rater,
    * one doc-keyed join, one global aggregate. */
  def qualityKappa(docs: DataFrame): DataFrame =
    quality(docs).select(col("doc_id"), col("quality_ok").as("a"))
      .join(gopherRules(docs).select(col("doc_id"), col("keep").as("b")), "doc_id")
      .agg(count(lit(1)).as("n"),
        sum(when(col("a") && col("b"), 1L).otherwise(0L)).as("n11"),
        sum(when(col("a") && !col("b"), 1L).otherwise(0L)).as("n10"),
        sum(when(!col("a") && col("b"), 1L).otherwise(0L)).as("n01"),
        sum(when(!col("a") && !col("b"), 1L).otherwise(0L)).as("n00"))
      .select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
        expr("round((n11 + n00) / CAST(n AS DOUBLE), 6)").as("po"),
        expr("CASE WHEN n * n = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00) " +
          "THEN CAST(NULL AS DOUBLE) " +
          "ELSE round((n * (n11 + n00) - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))) / " +
          "CAST(n * n - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) AS DOUBLE), 6) END")
          .as("kappa"))

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

  /** (w1, w2, n): top-k distance-2 SKIP-GRAM pairs over the raw
    * token stream — the word2vec-style co-occurrence statistic one
    * step beyond [[topBigrams]] (distance 1). Same explode + count
    * shape: corpus-pair cardinality shuffle on the pair key, global
    * top-k via TakeOrdered. */
  def skipgrams(docs: DataFrame, k: Int = 20): DataFrame =
    docs.select(graft.functions.Text.rawTokens(col("text")).as("words"))
      .filter(size(col("words")) >= 3)
      .select(explode(expr(
        """transform(sequence(1, size(words)-2),
          |  i -> struct(element_at(words, CAST(i AS INT)) AS w1,
          |              element_at(words, CAST(i+2 AS INT)) AS w2))""".stripMargin)).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w1").asc, col("w2").asc)
      .limit(k)

  /** (doc_id, source): deterministic mixture sampling — every doc gets
    * a reproducible uniform u from md5(doc_id:source) and survives iff
    * u < its source's mixture rate. This is how training mixes are
    * built at scale: no RNG state, re-runs and late-arriving partitions
    * sample identically, and rates are per-source weights. Pure map
    * stage. Demo rates: (source index mod 4 + 1) × 0.25. */
  def mixtureSample(docs: DataFrame, rate: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    // the DEFAULT rate parses the demo corpus's "src<digits>" source
    // names; any other label fails LOUDLY (try_cast + raise_error)
    // instead of Spark's opaque CAST_INVALID_INPUT (ANSI) or a silent
    // all-rows drop (non-ANSI NULL rate) — real mixes pass `rate`
    val demoRate = expr(
      "CASE WHEN try_cast(substring(source, 4, 10) AS INT) IS NULL THEN " +
        "CAST(raise_error('mixtureSample default rates require src<digits> source names; " +
        "pass an explicit rate column') AS DOUBLE) " +
        "ELSE (try_cast(substring(source, 4, 10) AS INT) % 4 + 1) * 0.25 END")
    docs
      .withColumn("rate", rate.getOrElse(demoRate))
      .withColumn("u", expr(hashU("concat(CAST(doc_id AS STRING), ':', source)")))
      .filter(col("u") < col("rate"))
      .select("doc_id", "source")
  }

  /** md5 → uniform [0,1) over an arbitrary SQL key expression — the
    * shared deterministic-sampling primitive of [[mixtureSample]] and
    * [[trainSplit]], written once so the two samplers (and their
    * DuckDB oracles) cannot drift. */
  private def hashU(keySql: String): String =
    s"CAST(conv(substr(md5($keySql), 1, 8), 16, 10) AS DOUBLE) / 4294967296.0"

  /** The PMI arithmetic, written once and shared verbatim with the
    * DuckDB oracle: ln(p(ab)/(p(a)p(b))) decomposed into a SUM of logs
    * of the exact integer counts — a product form (c_ab·N_u² etc.)
    * would overflow int64 once the corpus passes ~3e9 tokens. Each
    * count casts to double exactly below 2^53, and the identical
    * expression tree is IEEE-deterministic in both engines. */
  private[graft] val PmiExpr =
    "ln(CAST(n_ab AS DOUBLE)) + CAST(2 AS DOUBLE) * ln(CAST(n_uni AS DOUBLE)) " +
      "- ln(CAST(n_bi AS DOUBLE)) - ln(CAST(ca AS DOUBLE)) - ln(CAST(cb AS DOUBLE))"

  /** (w1, w2, n_ab, pmi): top-k collocations by pointwise mutual
    * information over adjacent word pairs ([[PmiExpr]]). Unigram and
    * bigram counts are two hash aggregations; the unigram side joins in
    * twice at word cardinality (broadcastable — vocabularies are tiny
    * next to corpora). The min-count floor kills the noisy tail before
    * the joins. */
  def bigramPmi(docs: DataFrame, minCount: Long = 5L, k: Int = 20): DataFrame = {
    val words = docs.select(graft.functions.Text.rawTokens(col("text")).as("words"))
    val uni = words.select(explode(col("words")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val nu = uni.agg(sum("c").as("n_uni"))
    val bi = words.filter(size(col("words")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(words)-1), i -> struct(element_at(words, CAST(i AS INT)) AS w1, element_at(words, CAST(i+1 AS INT)) AS w2))")).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n_ab"))
    val nb = bi.agg(sum("n_ab").as("n_bi"))
    bi.filter(col("n_ab") >= minCount)
      .join(broadcast(uni.select(col("w").as("w1"), col("c").as("ca"))), "w1")
      .join(broadcast(uni.select(col("w").as("w2"), col("c").as("cb"))), "w2")
      .crossJoin(broadcast(nu)).crossJoin(broadcast(nb))
      .select(col("w1"), col("w2"), col("n_ab"),
        round(expr(PmiExpr), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("w1").asc, col("w2").asc)
      .limit(k)
  }

  /** (k, n_tokens, vocab, beta): Heaps'-law vocabulary-growth curve
    * and exponent fit — V(N) ≈ K·N^β (Heaps 1978; β ≈ 0.4-0.6 for
    * natural text, the tokenizer/vocab-sizing law: it predicts how
    * vocabulary grows as the corpus scales to 100 TB). The curve
    * points are NESTED md5-uniform subsamples, not doc-order prefixes:
    * subset k = docs with u < 2^(k−6) for k = 0..6 (u = md5-uniform of
    * doc_id), so each point is a random sample of the corpus, every
    * subset contains the smaller ones by construction, and the whole
    * curve needs NO ordering, rank, or window — n_tokens(k) is seven
    * conditional sums over the per-doc length relation, vocab(k) seven
    * conditional counts over the per-term MIN-u relation (a term
    * enters the vocabulary at the tier of its earliest-sampled doc).
    * β is the log-log OLS slope over the (≤7)-point curve — all the
    * regression arithmetic runs on a broadcast scalar. Everything
    * md5-replayable, hash-checked. */
  def heapsLaw(docs: DataFrame): DataFrame = {
    val toks = Bm25.tokenize(docs)
    def u(c: org.apache.spark.sql.Column) =
      conv(substring(md5(concat(lit("heaps:"), c.cast("string"))), 1, 15), 16, 10)
        .cast("double") / lit(1.152921504606846976e18)
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      .select(u(col("doc_id")).as("u"), col("dl"))
    val tu = toks.groupBy("term").agg(min(u(col("doc_id"))).as("mu"))
    def tier(uCol: org.apache.spark.sql.Column, valCol: org.apache.spark.sql.Column) =
      (0 to 6).map(k => sum(when(uCol < math.pow(2.0, k - 6), valCol)
        .otherwise(lit(0L))).as(s"c$k"))
    val tok7 = dl.agg(tier(col("u"), col("dl")).head, tier(col("u"), col("dl")).tail: _*)
    val voc7 = tu.agg(tier(col("mu"), lit(1L)).head, tier(col("mu"), lit(1L)).tail: _*)
    val stackExpr = (0 to 6).map(k => s"$k, t.c$k, v.c$k").mkString(", ")
    val pts = tok7.as("t").crossJoin(voc7.as("v"))
      .select(expr(s"stack(7, $stackExpr)").as(Seq("k", "n_tokens", "vocab")))
      .filter(col("n_tokens") > 0 && col("vocab") > 0)
    val fit = pts.select(log(col("n_tokens").cast("double")).as("x"),
        log(col("vocab").cast("double")).as("y"))
      .agg(count(lit(1)).cast("double").as("m"), sum("x").as("sx"),
        sum("y").as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      // a one-point curve has sxx - sx²/m = 0 exactly → 0/0 NaN; emit
      // NULL for "no defined slope" instead (oracle mirrors the guard)
      .select(when(col("m") > 1,
        (col("sxy") - col("sx") * col("sy") / col("m")) /
          (col("sxx") - col("sx") * col("sx") / col("m"))).as("b"))
    pts.crossJoin(broadcast(fit))
      .select(col("k").cast("long").as("k"), col("n_tokens"), col("vocab"),
        round(col("b"), 4).as("beta"))
  }

  /** (term, n, term_rank, log10_rank, log10_n): the corpus rank-frequency
    * (Zipf) profile over the engine's kept tokens — the standard
    * corpus-health diagnostic (a healthy natural corpus is ~linear in
    * log-log; synthetic or template-heavy corpora bend).
    *
    * A web-scale vocabulary is 10⁸⁺ terms, so the exact global rank
    * cannot ride a partition-less `row_number` window (that moves the
    * whole vocabulary to ONE partition) and cannot be truncated (the
    * diagnostic needs the full curve). This is the engine's one RDD
    * drop: `zipWithIndex` is the canonical scalable exact-rank — a
    * range-partitioned global sort stays distributed, a first job
    * counts rows per partition, and a second assigns offset+local
    * index. Both jobs run over the SAME RDD, so the range partitioner
    * boundaries are identical and ranks are exact and deterministic
    * under the total order (n DESC, term ASC). */
  def zipfProfile(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val counts = Bm25.tokenize(docs)
      .groupBy("term").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term").asc)
    val schema = org.apache.spark.sql.types.StructType(counts.schema.fields :+
      org.apache.spark.sql.types.StructField("term_rank",
        org.apache.spark.sql.types.LongType, nullable = false))
    val ranked = spark.createDataFrame(
      counts.rdd.zipWithIndex().map { case (r, i) =>
        org.apache.spark.sql.Row(r.get(0), r.get(1), i + 1L)
      }, schema)
    ranked.select(col("term"), col("n"), col("term_rank"),
      round(log10(col("term_rank").cast("double")), 6).as("log10_rank"),
      round(log10(col("n").cast("double")), 6).as("log10_n"))
  }

  /** (lang, trigram, n, rk): top-k character trigrams per language —
    * the feature family real language-ID models (CLD/fastText) train
    * on; per-language profiles are also drift/contamination telemetry.
    * Pure explode + two-level aggregation, shuffled on (lang, trigram)
    * — high cardinality, even spread. */
  def charTrigrams(docs: DataFrame, k: Int = 10): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("lang")
      .orderBy(col("n").desc, col("trigram").asc)
    docs.select(col("lang"), lower(col("text")).as("t"))
      .filter(length(col("t")) >= 3)
      .select(col("lang"),
        explode(graft.functions.Native.charNgrams(col("t"), 3)).as("trigram"))
      .groupBy("lang", "trigram").agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** (doc_id, term, tfidf, rk): per-document top-k KEYWORDS by tf·idf
    * — extractive keyword tagging, the cheap summarization/routing
    * signal of a training-data pipeline. Rides [[Bm25.tfIdf]]'s plan
    * (df as a window over tf — no third corpus pass); the per-doc
    * rank is a WindowGroupLimit, so each group is bounded to k rows
    * BEFORE the shuffle. Ties (same rounded tfidf) break on term asc
    * — deterministic on both engines. */
  def keywords(docs: DataFrame, k: Int = 3): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("term").asc)
    Bm25.tfIdf(docs)
      .select(col("doc_id"), col("term"), col("tfidf"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** (doc_id, n_bigrams, avg_logprob): per-document mean bigram
    * log-probability under the CORPUS bigram model P(w2|w1) =
    * c(w1,w2)/c(w1·) — LM-score filtering, the classic
    * perplexity-style quality gate (docs whose word sequences are
    * improbable under the corpus LM are boilerplate/garbled). Raw
    * whitespace tokens (the LM sees function words). Two corpus-
    * bigram-cardinality aggregates; both probability factors join
    * back on bigram keys — even spread, no broadcast of the big
    * model. round(·,4): the per-doc mean sums FP logs, so the last
    * digits are association-order noise (same rule as BM25 scores). */
  def bigramLm(docs: DataFrame): DataFrame = {
    val bg = bigramRows(docs)
    val c12 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("n12"))
    val c1 = bg.groupBy(col("w1").as("cw1")).agg(count(lit(1)).as("n1"))
    bg.join(c12, Seq("w1", "w2"))
      .join(c1, col("w1") === col("cw1"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(log(col("n12").cast("double") / col("n1"))), 4).as("avg_logprob"))
  }

  /** (w1, w2, n12, pkn): interpolated Kneser-Ney bigram probabilities —
    * the standard LM smoothing (Kneser & Ney 1995; Chen & Goodman 1999)
    * the MLE model in [[bigramLm]] lacks. With absolute discount
    * D = 0.75:
    *   pkn(w2|w1) = max(n12 − D, 0)/c1 + D·T1/c1 · (T2/T)
    * where c1 = Σ_w n(w1,w) (left-context total), T1 = |{w : n(w1,w)>0}|
    * (distinct continuations of w1), T2 = |{w : n(w,w2)>0}| (distinct
    * left contexts of w2 — the continuation count that makes KN "KN"),
    * and T = total distinct bigram types. Everything derives from the
    * bigram-type relation c12 in three partial-aggregations (by w1, by
    * w2, and one scalar) joined back on their own keys — nothing
    * corpus-sized shuffles twice, and the scalar rides a broadcast.
    * At web scale the relation is bigram-type-sized (the model itself),
    * which is what an LM build materializes anyway. round(·,6) absorbs
    * FP division noise. */
  def knBigram(docs: DataFrame, discount: Double = 0.75): DataFrame = {
    val c12 = bigramRows(docs).groupBy("w1", "w2").agg(count(lit(1)).as("n12"))
    val left = c12.groupBy(col("w1").as("lw1"))
      .agg(sum("n12").as("c1"), count(lit(1)).as("t1"))
    val cont = c12.groupBy(col("w2").as("cw2")).agg(count(lit(1)).as("t2"))
    val tot = c12.agg(count(lit(1)).as("t"))
    c12.join(left, col("w1") === col("lw1"))
      .join(cont, col("w2") === col("cw2"))
      .crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), col("n12"),
        round(
          greatest(col("n12") - lit(discount), lit(0.0)) / col("c1") +
            lit(discount) * col("t1") / col("c1") *
              (col("t2").cast("double") / col("t")), 6).as("pkn"))
  }

  /** (source, term, y, z): per-source discriminative terms by weighted
    * log-odds-ratio with an informative Dirichlet prior (Monroe, Colaresi
    * & Quinn 2008 — "Fightin' Words"), the principled replacement for
    * raw per-class TF-IDF ([[classTfidf]]): rare terms get shrunk toward
    * the corpus prior instead of dominating. For each source i vs the
    * rest, with prior α_t = corpus count of t and α0 = Σα:
    *   δ = ln((y_i+α_t)/(n_i+α0−y_i−α_t)) − ln((y_r+α_t)/(n_r+α0−y_r−α_t))
    *   z = δ / sqrt(1/(y_i+α_t) + 1/(y_r+α_t))
    * Emits the top-`k` terms per source by |z| (rank over the ROUNDED
    * z with a term tiebreak, so the selection is engine-stable). One
    * term-keyed aggregation to (source, term) counts; corpus totals
    * come from re-aggregating that output (term-type-sized);
    * per-source scalars broadcast. The rank window partitions by
    * source over per-source vocabularies — the same bounded shape as
    * per-doc top-k terms. */
  def logOdds(docs: DataFrame, k: Int = 5): DataFrame = {
    val st = Bm25.tokenize(docs)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .groupBy("source", "term").agg(count(lit(1)).as("y"))
    val corpus = st.groupBy(col("term").as("ct")).agg(sum("y").as("alpha"))
    val bySrc = st.groupBy(col("source").as("cs")).agg(sum("y").as("n_i"))
    val totals = bySrc.agg(sum("n_i").as("n_all"))
    val a0 = corpus.agg(sum("alpha").as("a0"))
    st.join(corpus, col("term") === col("ct"))
      .join(bySrc, col("source") === col("cs"))
      .crossJoin(broadcast(totals))
      .crossJoin(broadcast(a0))
      .select(col("source"), col("term"), col("y"),
        col("alpha"), col("n_i"), col("a0"),
        (col("alpha") - col("y")).as("y_r"),
        (col("n_all") - col("n_i")).as("n_r"))
      .select(col("source"), col("term"), col("y"),
        round(
          (log((col("y") + col("alpha")) /
               (col("n_i") + col("a0") - col("y") - col("alpha"))) -
           log((col("y_r") + col("alpha")) /
               (col("n_r") + col("a0") - col("y_r") - col("alpha")))) /
          sqrt(lit(1.0) / (col("y") + col("alpha")) +
               lit(1.0) / (col("y_r") + col("alpha"))), 4).as("z"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy(abs(col("z")).desc, col("term").asc))
        .cast("long"))
      .filter(col("rk") <= k)
  }

  /** (source, n_docs, ks_d): two-sample Kolmogorov-Smirnov drift test —
    * for each source, D = max over observed lengths of
    * |F_source(v) − F_rest(v)| between that source's doc-length CDF and
    * the rest of the corpus (the standard distribution-shift detector
    * between corpus slices/snapshots). Both CDFs are step functions, so
    * the max is attained at a jump point of either — evaluated on the
    * full (source × distinct length) grid, with each per-source
    * cumulative a window PARTITIONED by source over the length domain
    * (value-cardinality bounded: distinct doc lengths, never doc
    * count). The corpus-wide cumulative is derived by re-aggregating
    * the per-source cumulatives at each grid point — no partition-less
    * window anywhere. The grid is |sources| × |lengths|, both bounded
    * at any corpus size. Divisions are written identically in the
    * oracle so the FP max picks the same jump point; round(·,6) at the
    * end absorbs representation noise. */
  def ksDrift(docs: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val h = docs.groupBy(col("source"), col("n_chars").as("v"))
      .agg(count(lit(1)).as("c"))
    val values = h.select("v").distinct()
    val sources = h.groupBy("source").agg(sum("c").as("n_s"))
    val grid = values.crossJoin(broadcast(sources))
    val cum = grid.join(h, Seq("source", "v"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .withColumn("cum_s", sum("c").over(
        w.partitionBy("source").orderBy(col("v").asc)
          .rowsBetween(w.unboundedPreceding, w.currentRow)))
    // Σ over sources of cum_s(v) = corpus-wide cumulative at v
    val gcum = cum.groupBy(col("v").as("gv"))
      .agg(sum("cum_s").as("cum_all"), sum("n_s").as("n_all"))
    cum.join(gcum, col("v") === col("gv"))
      .filter(col("n_all") > col("n_s")) // degenerate one-source corpus
      .select(col("source"), col("n_s"),
        abs(col("cum_s").cast("double") / col("n_s") -
          (col("cum_all") - col("cum_s")).cast("double") /
            (col("n_all") - col("n_s"))).as("gap"))
      .groupBy("source")
      .agg(min("n_s").as("n_docs"), round(max("gap"), 6).as("ks_d"))
  }

  /** (source, n1, u2, z): Mann-Whitney U rank-sum test of each
    * source's length distribution against the REST of the corpus —
    * the nonparametric sibling of [[ksDrift]] (KS finds the largest
    * CDF gap; U says whether one source's docs are systematically
    * longer/shorter, robust to outliers and shape). Exact integer
    * core: with midranks doubled onto an integer grid
    * (2·midrank = 2·cntLess + t + 1 per value group), the rank sum
    * and u2 = 2·U₁ = 2·R₁ − n₁(n₁+1) are exact BIGINTs — no FP until
    * the final tie-corrected z (round(·,6); the division order is
    * written identically in the oracle).
    *
    * Scale shape (the [[ksDrift]] discipline, the [[Relational.gini]]
    * prefix-sum pattern): NO doc-cardinality window and NO
    * partition-less window anywhere — value-group counts aggregate
    * first; the global count-below-v splits into a bucket-offset
    * scatter (explode over later buckets, then a plain groupBy) plus
    * a WITHIN-bucket prefix window PARTITIONED by bucket; docs join
    * the per-value rank table broadcast. Bound: rank sums need
    * 2n² < 2⁶³ → n < 2.1e9 docs per test scope; shard the test by
    * stratum above that. */
  def mannWhitneyLength(docs: DataFrame): DataFrame = {
    val d = docs.select(col("source"), col("n_chars").as("v"))
    val vg = doubledMidranks(d)
    val ties = vg.agg(sum(col("t") * col("t") * col("t") - col("t")).as("tsum"))
    val tot = d.agg(count(lit(1)).as("n"))
    d.join(broadcast(vg.select("v", "r2")), "v")
      .groupBy("source")
      .agg(count(lit(1)).as("n1"), sum("r2").as("rsum2"))
      .crossJoin(broadcast(tot)).crossJoin(broadcast(ties))
      .select(col("source"), col("n1"),
        expr("rsum2 - n1 * (n1 + 1)").as("u2"),
        // degenerate-variance guard (all values tied, or a one-doc
        // corpus): z is undefined — NULL on BOTH sides, and the CASE
        // keeps the divisions off the evaluated path (ANSI-safe)
        expr("CASE WHEN n < 2 THEN CAST(NULL AS DOUBLE) " +
          "WHEN n1 * (n - n1) * ((n + 1) - tsum / (n * (n - 1.0))) <= 0.0 " +
          "THEN CAST(NULL AS DOUBLE) " +
          "ELSE round((rsum2 - n1 * (n1 + 1) - n1 * (n - n1)) / " +
          "(2.0 * sqrt(n1 * (n - n1) * ((n + 1) - tsum / (n * (n - 1.0))) / 12.0)), 6) END")
          .as("z"))
  }

  /** Welch formula fragments, interpolated VERBATIM into both the
    * Spark plan (`expr`) and the DuckDB oracle — typographic sharing
    * is the strongest form of the mirrored-verbatim FP-parity
    * convention: one source text, two parsers, identical op order.
    * Operate over the relation (source, n1, s1, q1) × (n, s, q) of
    * exact BIGINT count/sum/sum-of-squares aggregates; all products
    * route through DOUBLE (the casts below) so the rest-side
    * subtraction stays exact in integers and nothing overflows at a
    * corpus where Σv² still fits BIGINT. */
  private def welchVa =
    "((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1) / (n1 - 1))"
  private def welchVb =
    "((CAST(q - q1 AS DOUBLE) - CAST(s - s1 AS DOUBLE) * (s - s1) / (n - n1)) / (n - n1 - 1))"
  private def welchSe = s"($welchVa / n1 + $welchVb / (n - n1))"
  private[graft] val welchTSql: String =
    s"CASE WHEN n1 < 2 OR n - n1 < 2 THEN CAST(NULL AS DOUBLE) " +
      s"WHEN $welchSe <= 0.0 THEN CAST(NULL AS DOUBLE) " +
      s"ELSE round((CAST(s1 AS DOUBLE) / n1 - CAST(s - s1 AS DOUBLE) / (n - n1)) / sqrt($welchSe), 6) END"
  private[graft] val welchDfSql: String =
    s"CASE WHEN n1 < 2 OR n - n1 < 2 THEN CAST(NULL AS DOUBLE) " +
      s"WHEN $welchSe <= 0.0 THEN CAST(NULL AS DOUBLE) " +
      s"ELSE round($welchSe * $welchSe / " +
      s"(($welchVa / n1) * ($welchVa / n1) / (n1 - 1) + " +
      s"($welchVb / (n - n1)) * ($welchVb / (n - n1)) / (n - n1 - 1)), 6) END"

  /** (source, n1, n2, t, df_w): WELCH's unequal-variance t-test of
    * each source's length distribution vs the rest — the PARAMETRIC
    * significance column beside [[mannWhitneyLength]]'s rank test
    * (the two disagree exactly when a source's lengths are skewed or
    * heavy-tailed, which is itself the reading a mixture audit
    * wants). Sufficient statistics are three exact BIGINT aggregates
    * per source (count, Σv, Σv²) with the rest side by SUBTRACTION
    * from the corpus totals (the q_qq_deciles discipline — one scan,
    * source-cardinality output, no second pass); t and the
    * Welch–Satterthwaite df are closed forms over them, evaluated
    * from one shared formula text ([[welchTSql]]) in both engines,
    * rounded last. NULL when either side has fewer than two docs or
    * the pooled standard error vanishes (both sides internally
    * constant). */
  def welchTTestLength(docs: DataFrame): DataFrame = {
    val d = docs.select(col("source"), col("n_chars").cast("long").as("v"))
    val per = d.groupBy("source").agg(count(lit(1)).as("n1"),
      sum("v").as("s1"), sum(expr("v * v")).as("q1"))
    val tot = d.agg(count(lit(1)).as("n"),
      sum("v").as("s"), sum(expr("v * v")).as("q"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n1"), (col("n") - col("n1")).as("n2"),
        expr(welchTSql).as("t"), expr(welchDfSql).as("df_w"))
  }

  /** (source, n_pairs, hl_shift): HODGES–LEHMANN shift estimator per
    * source vs rest over doc lengths — the MAGNITUDE member
    * completing the nonparametric location toolkit
    * ([[mannWhitneyLength]] answers "is the shift significant",
    * [[cliffsDeltaLength]] "how consistently one side dominates";
    * HL answers "BY HOW MANY CHARACTERS" — the median of all
    * pairwise differences v_source − v_rest, robust where the mean
    * difference is outlier-owned). Exact integers end to end: the
    * difference multiset lives on the (value_s × value_rest) GRID
    * with weight cnt_s·cnt_rest — value-cardinality-bounded (the
    * length DOMAIN, not the corpus, drives |V|; the Q-Q grid
    * argument squared, still metadata next to any corpus), with the
    * rest side by SUBTRACTION from global value counts; the LOWER
    * weighted median (first difference whose cumulative weight
    * reaches (N+1) div 2 — stated convention, exact for any N) is
    * picked by one value-grid window partitioned by source. Sources
    * with an empty rest side (single-source corpus) emit no row,
    * mirrored by the oracle. */
  def hlShiftLength(docs: DataFrame): DataFrame = {
    val d = docs.select(col("source"), col("n_chars").cast("long").as("v"))
    val vs = d.groupBy("source", "v").agg(count(lit(1)).as("cs"))
    val vg = d.groupBy("v").agg(count(lit(1)).as("cg"))
    val per = d.groupBy("source").agg(count(lit(1)).as("n1"))
    val tot = d.agg(count(lit(1)).as("n"))
    val grid = per.select("source").crossJoin(broadcast(vg))
      .join(vs, Seq("source", "v"), "left")
      .select(col("source"), col("v"),
        coalesce(col("cs"), lit(0L)).as("cs"),
        (col("cg") - coalesce(col("cs"), lit(0L))).as("cr"))
    val sVals = grid.filter(col("cs") > 0)
      .select(col("source"), col("v").as("va"), col("cs"))
    val rVals = grid.filter(col("cr") > 0)
      .select(col("source"), col("v").as("vb"), col("cr"))
    val diffs = sVals.join(rVals, "source")
      .select(col("source"), (col("va") - col("vb")).as("d"),
        (col("cs") * col("cr")).as("w"))
      .groupBy("source", "d").agg(sum("w").as("w"))
    val np = per.crossJoin(broadcast(tot))
      .select(col("source"), (col("n1") * (col("n") - col("n1"))).as("n_pairs"))
    val win = Window.partitionBy("source").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    diffs.withColumn("cum", sum("w").over(win))
      .join(np, "source")
      .filter(col("n_pairs") > 0)
      .withColumn("idx", expr("(n_pairs + 1) div 2"))
      .filter(col("cum") >= col("idx") && col("cum") - col("w") < col("idx"))
      .select(col("source"), col("n_pairs"), col("d").as("hl_shift"))
  }

  /** (doc_id, split): NEAR-DUP-AWARE train/eval split — the
    * [[trainSplit]] assignment with the LEAKAGE GUARD a real
    * pipeline adds before it trusts held-out numbers: a train doc
    * sharing a VERIFIED near-dup pair with any val/test doc is
    * QUARANTINED (excluded from train), so paraphrases and exact
    * copies of held-out items cannot leak into training — the
    * q_contamination reading applied pre-emptively at split time
    * instead of forensically afterwards. Val/test assignments are
    * never moved (the holdout must stay deterministic across
    * re-splits; only train loses members). Cost: the base split is a
    * map stage; the quarantine is one pair-scaled semi-join from the
    * staged pair substrate — never a corpus self-join. */
  def leakageSafeSplit(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val base = trainSplit(docs)
    val edges = pairs.select(col("doc_a").as("x"), col("doc_b").as("y"))
      .union(pairs.select(col("doc_b").as("x"), col("doc_a").as("y")))
    val holdout = base.filter(col("split") =!= "train")
      .select(col("doc_id").as("y"))
    val tainted = edges.join(holdout, "y")
      .select(col("x").as("doc_id")).distinct()
    base.join(tainted.withColumn("t", lit(true)), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("split") === "train" && col("t"), lit("quarantined"))
          .otherwise(col("split")).as("split"))
  }

  /** The shared doubled-midrank table (v, r2, t) over a (group, v)
    * relation: r2 = 2·midrank = 2·cntLess(v) + t + 1 per value group —
    * exact BIGINTs, the integer grid [[mannWhitneyLength]] and
    * [[kruskalWallisLength]] both rank on. Window-free at corpus
    * cardinality: value-group counts aggregate FIRST, the global
    * count-below-v splits into a bucket-offset scatter plus a
    * within-bucket prefix window partitioned by 1024-wide bucket. */
  private def doubledMidranks(d: DataFrame): DataFrame = {
    val g = d.groupBy("v").agg(count(lit(1)).as("t"))
      .withColumn("b", expr("v div 1024"))
    val bsum = g.groupBy("b").agg(sum("t").as("bc"))
    val maxB = bsum.agg(max("b").as("maxb"))
    val off = bsum.crossJoin(broadcast(maxB))
      .filter(col("b") < col("maxb"))
      .select(explode(sequence(col("b") + 1, col("maxb"))).as("b"),
        col("bc").as("cc"))
      .groupBy("b").agg(sum("cc").as("off"))
    val wIn = Window.partitionBy("b").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("pin", coalesce(sum("t").over(wIn), lit(0L)))
      .join(off, Seq("b"), "left")
      .select(col("v"),
        (lit(2L) * (coalesce(col("off"), lit(0L)) + col("pin")) +
          col("t") + 1L).as("r2"),
        col("t"))
  }

  /** One row (n, n_groups, f): BROWN-FORSYTHE test (the
    * median-centered Levene) of length-VARIANCE homogeneity across
    * sources — the spread-side omnibus beside
    * [[kruskalWallisLength]]'s location test (two sources can share a
    * median yet differ wildly in spread; a mixture audit wants both
    * answers). Robust by construction: deviations center on the
    * per-source LOWER MEDIAN (the ⌈n/2⌉-th order statistic — an
    * exact integer picked by the interval test, mirrored verbatim in
    * the oracle), so z = |v − med| is an exact BIGINT and the classic
    * F identity clears every group mean:
    * F = ((N−k)/(k−1)) · (Σ Sᵢ²/nᵢ − S²/N) / (Q − Σ Sᵢ²/nᵢ) with
    * Sᵢ = Σz, Q = Σz² — all exact integer sums; the one cross-group
    * FP (Σ Sᵢ²/nᵢ) rides the ordered-fold contract like the KW
    * statistic; NULL when the within-group deviation sum is zero
    * (every source internally constant) or k < 2. Scale shape: the
    * median table is source-cardinality and broadcasts; one map pass
    * for deviations, one rollup, one fold. */
  def leveneLength(docs: DataFrame): DataFrame = {
    val d = docs.select(col("source"), col("n_chars").as("v"))
    val g = d.groupBy("source", "v").agg(count(lit(1)).as("t"))
    val w = Window.partitionBy("source").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = g.withColumn("below", coalesce(sum("t").over(w), lit(0L)))
    val per = d.groupBy("source").agg(count(lit(1)).as("n1"))
    val med = cum.join(per, "source")
      .withColumn("idx", expr("(n1 + 1) div 2"))
      .filter(col("below") < col("idx") && col("idx") <= col("below") + col("t"))
      .select(col("source"), col("v").as("med"))
    val z = d.join(broadcast(med), "source")
      .select(col("source"), abs(col("v") - col("med")).as("z"))
    val perZ = z.groupBy("source")
      .agg(count(lit(1)).as("n1"), sum("z").as("si"),
        sum(col("z") * col("z")).as("qi"))
    perZ.agg(count(lit(1)).as("k"), sum("n1").as("n"),
        sum("si").as("s"), sum("qi").as("qq"),
        collect_list(struct(col("source").as("s0"),
          (col("si").cast("double") * col("si").cast("double") / col("n1"))
            .as("w"))).as("gs"))
      .select(col("n"), col("k").as("n_groups"),
        expr("CASE WHEN k < 2 THEN CAST(NULL AS DOUBLE) ELSE " +
          "CASE WHEN qq - aggregate(array_sort(gs), CAST(0.0 AS DOUBLE), " +
          "(acc, g) -> acc + g.w) <= 0.0 THEN CAST(NULL AS DOUBLE) " +
          "ELSE round(((n - k) / (k - 1.0)) * " +
          "(aggregate(array_sort(gs), CAST(0.0 AS DOUBLE), (acc, g) -> acc + g.w) " +
          "- CAST(s AS DOUBLE) * s / n) / " +
          "(qq - aggregate(array_sort(gs), CAST(0.0 AS DOUBLE), (acc, g) -> acc + g.w)), 6) " +
          "END END").as("f"))
  }

  /** (source, q, v_source, v_rest, gap): the QUANTILE-QUANTILE table
    * of each source's length distribution against the rest — exact
    * deciles q = 1..9 side by side, the distribution-SHAPE diagnostic
    * between [[ksDrift]]'s single max-gap scalar and the full CDF
    * (WHERE does the source run long or short, not just by how much
    * at the worst point). Deciles are exact order statistics — the
    * ⌈q·n/10⌉-th smallest — picked by integer interval tests over
    * value-group prefix sums, never a percentile sketch: the global
    * prefix rides [[doubledMidranks]]'s bucketed grid (below =
    * (r2 − t − 1)/2 — no partition-less window), the per-source
    * prefix a source-partitioned value-cardinality window, and the
    * REST side derives by subtraction (t_rest = t_all − t_src), so
    * the rest distribution is never re-aggregated per source. All
    * integer; a single-source corpus yields no rows (no rest to
    * compare). Grid cost: |sources| × |distinct lengths| × 9. */
  def qqDecilesLength(docs: DataFrame): DataFrame = {
    val d = docs.select(col("source"), col("n_chars").as("v"))
    val vgAll = doubledMidranks(d)
      .select(col("v"), expr("(r2 - t - 1) div 2").as("below_all"),
        col("t").as("t_all"))
    val gSrc = d.groupBy("source", "v").agg(count(lit(1)).as("t_src"))
    val grid = d.select("source").distinct().crossJoin(vgAll)
      .join(gSrc, Seq("source", "v"), "left")
      .withColumn("t_src", coalesce(col("t_src"), lit(0L)))
    val wSrc = Window.partitionBy("source").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = grid
      .withColumn("below_src", coalesce(sum("t_src").over(wSrc), lit(0L)))
      .withColumn("t_rest", col("t_all") - col("t_src"))
      .withColumn("below_rest", col("below_all") - col("below_src"))
    val per = d.groupBy("source").agg(count(lit(1)).as("n1"))
    val tot = d.agg(count(lit(1)).as("n"))
    val x = cum.join(per, "source").crossJoin(broadcast(tot))
      .select(col("*"), explode(sequence(lit(1L), lit(9L))).as("q"))
      .withColumn("idx_s", expr("(q * n1 + 9) div 10"))
      .withColumn("idx_r", expr("(q * (n - n1) + 9) div 10"))
    val vs = x.filter(col("below_src") < col("idx_s") &&
        col("idx_s") <= col("below_src") + col("t_src"))
      .select(col("source"), col("q"), col("v").as("v_source"))
    val vr = x.filter(col("below_rest") < col("idx_r") &&
        col("idx_r") <= col("below_rest") + col("t_rest"))
      .select(col("source"), col("q"), col("v").as("v_rest"))
    vs.join(vr, Seq("source", "q"))
      .select(col("source"), col("q"), col("v_source"), col("v_rest"),
        (col("v_source") - col("v_rest")).as("gap"))
  }

  /** (source, n_docs, k_trimmed, mean, trimmed_mean): 10%-TRIMMED
    * mean of doc length per source beside the plain mean — the
    * robust-location member of the robust-stats family
    * ([[Relational]]'s winsorized/MAD keys clip or rescore; trimming
    * DROPS the k = ⌊n/10⌋ smallest and largest before averaging, so
    * a crawl source's boilerplate stubs and mega-pages cannot move
    * its reported typical length). Exact end to end WITHOUT sorting
    * docs: per-(source, value) counts carry within-source prefix
    * sums (value-cardinality window, the [[ksDrift]] discipline), and
    * each value group contributes min(max(k − cumBelow, 0), t) rows
    * to the bottom cut (symmetrically for the top) — order
    * statistics as exact integer clipping, no row-cardinality
    * window, no percentile approximation. Two divisions of exact
    * BIGINTs, rounded last; n − 2k ≥ 1 always (k = n div 10). */
  def trimmedMeanLength(docs: DataFrame): DataFrame = {
    val d = docs.select(col("source"), col("n_chars").as("v"))
    val g = d.groupBy("source", "v").agg(count(lit(1)).as("t"))
    val w = Window.partitionBy("source").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = g.withColumn("below", coalesce(sum("t").over(w), lit(0L)))
    val per = d.groupBy("source")
      .agg(count(lit(1)).as("n1"), sum("v").as("tot"))
    cum.join(per, "source")
      .withColumn("k", expr("n1 div 10"))
      .groupBy("source")
      .agg(max("n1").as("n_docs"), max("tot").as("tot"), max("k").as("k_trimmed"),
        sum(expr("least(greatest(k - below, 0L), t) * v")).as("bs"),
        sum(expr("least(greatest(k - (n1 - below - t), 0L), t) * v")).as("ts"))
      .select(col("source"), col("n_docs"), col("k_trimmed"),
        round(col("tot").cast("double") / col("n_docs"), 4).as("mean"),
        round((col("tot") - col("bs") - col("ts")).cast("double") /
          (col("n_docs") - lit(2L) * col("k_trimmed")), 4).as("trimmed_mean"))
  }

  /** (source, n1, delta, magnitude): CLIFF'S DELTA of each source's
    * length distribution vs the rest — the EFFECT SIZE companion to
    * [[mannWhitneyLength]]'s significance z (a huge corpus makes any
    * shift "significant"; delta says whether it MATTERS: the
    * probability a random doc from the source is longer than a random
    * doc from the rest, minus the reverse). Exactly one more division
    * on the SAME doubled-midrank grid: with ties counted ½,
    * delta = (2U₁ − n₁m)/(n₁m) = (rsum2 − n₁(n₁+1) − n₁m)/(n₁m),
    * m = n − n₁ — numerator and denominator exact BIGINTs, so the
    * division is engine-identical IEEE; the magnitude label
    * (Romano et al. 2006 thresholds .147/.33/.474) reads off the
    * ROUNDED value, so the CASE can never straddle an ulp. NULL for
    * a single-source corpus (m = 0). Same scale shape as the U test:
    * value-cardinality rank table, broadcast join, group rollup. */
  def cliffsDeltaLength(docs: DataFrame): DataFrame = {
    val d = docs.select(col("source"), col("n_chars").as("v"))
    val vg = doubledMidranks(d)
    val tot = d.agg(count(lit(1)).as("n"))
    d.join(broadcast(vg.select("v", "r2")), "v")
      .groupBy("source")
      .agg(count(lit(1)).as("n1"), sum("r2").as("rsum2"))
      .crossJoin(broadcast(tot))
      .select(col("source"), col("n1"),
        expr("CASE WHEN n1 * (n - n1) = 0 THEN CAST(NULL AS DOUBLE) " +
          "ELSE round((rsum2 - n1 * (n1 + 1) - n1 * (n - n1)) / " +
          "CAST(n1 * (n - n1) AS DOUBLE), 6) END").as("delta"))
      .select(col("source"), col("n1"), col("delta"),
        expr("CASE WHEN delta IS NULL THEN CAST(NULL AS STRING) " +
          "WHEN abs(delta) < 0.147 THEN 'negligible' " +
          "WHEN abs(delta) < 0.33 THEN 'small' " +
          "WHEN abs(delta) < 0.474 THEN 'medium' " +
          "ELSE 'large' END").as("magnitude"))
  }

  /** One row (n, n_groups, tsum, h): KRUSKAL-WALLIS H test across ALL
    * sources' length distributions at once — the k-group extension of
    * [[mannWhitneyLength]] (U asks "is THIS source shifted vs the
    * rest", one test per source; H asks "do the sources differ AT
    * ALL", the single gate a mixture audit runs before k pairwise
    * tests). Same exact integer core: doubled midranks r2 make every
    * per-source rank sum an exact BIGINT; with R_i = rsum2_i/2,
    * H = 12/(N(N+1)) · Σ_i rsum2_i²/(4n_i) − 3(N+1), tie-corrected by
    * 1 − tsum/(N³−N). The Σ over sources is the ONLY cross-group FP
    * and rides the ordered-fold contract (source-sorted array, one
    * sequential fold — the cosine-scoring discipline), so both
    * engines associate identically; round(·,6) last. NULL when N < 2
    * or every value is tied (zero tie-correction denominator).
    *
    * Scale shape: identical to [[mannWhitneyLength]] — the rank table
    * is value-cardinality, docs join it broadcast, the per-source
    * relation is group-cardinality. Exactness bounds: rank sums need
    * 2N² < 2⁶³ (N < 2.1e9); the integer tie term and N³−N guard need
    * N < 2.1e6 — shard the test by stratum above that, or the guard
    * overflows before the statistic does. */
  def kruskalWallisLength(docs: DataFrame): DataFrame = {
    val d = docs.select(col("source"), col("n_chars").as("v"))
    val vg = doubledMidranks(d)
    val ties = vg.agg(sum(col("t") * col("t") * col("t") - col("t")).as("tsum"))
    val tot = d.agg(count(lit(1)).as("n"))
    d.join(broadcast(vg.select("v", "r2")), "v")
      .groupBy("source")
      .agg(count(lit(1)).as("n1"), sum("r2").as("rsum2"))
      .agg(count(lit(1)).as("n_groups"),
        collect_list(struct(col("source").as("s"),
          (col("rsum2").cast("double") * col("rsum2").cast("double") /
            (lit(4.0) * col("n1"))).as("w"))).as("gs"))
      .crossJoin(broadcast(tot)).crossJoin(broadcast(ties))
      .select(col("n"), col("n_groups"), col("tsum"),
        expr("CASE WHEN n < 2 OR tsum = n * n * n - n THEN CAST(NULL AS DOUBLE) " +
          "ELSE round(((12.0 * aggregate(array_sort(gs), CAST(0.0 AS DOUBLE), " +
          "(acc, g) -> acc + g.w)) / (n * (n + 1.0)) - 3.0 * (n + 1)) / " +
          "(1.0 - tsum / CAST(n * n * n - n AS DOUBLE)), 6) END").as("h"))
  }

  /** (source, n_docs, letters, words, sentences, cli): Coleman-Liau
    * readability per source — CLI = 0.0588·L − 0.296·S − 15.8 with
    * L = letters per 100 words and S = sentences per 100 words
    * (Coleman & Liau 1975; chosen over Flesch because it needs no
    * syllable model — every input is an exact regexp count). Letters,
    * words (whitespace tokens, matching the tokenizer's split) and
    * sentence marks ([.!?]+ runs, floor 1 per doc) aggregate as exact
    * integer sums per source; the formula runs ONCE on the aggregate
    * sums — one codegen'd map pass over the corpus, one tiny
    * source-keyed aggregation, no FP until the final expression
    * (round(·,4)). The corpus-health sibling of [[quality]]: quality
    * scores docs, this profiles a source's overall reading level. */
  def readability(docs: DataFrame): DataFrame =
    docs
      .select(col("source"),
        length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("long").as("l"),
        size(Text.rawTokens(col("text"))).cast("long").as("w"),
        greatest(size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0)))
          .cast("long"), lit(1L)).as("s"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("l").as("letters"),
        sum("w").as("words"), sum("s").as("sentences"))
      .select(col("source"), col("n_docs"), col("letters"), col("words"),
        col("sentences"),
        round(lit(0.0588) * (lit(100.0) * col("letters") / col("words")) -
          lit(0.296) * (lit(100.0) * col("sentences") / col("words")) -
          lit(15.8), 4).as("cli"))

  /** (doc_id, dl, n_types, ttr, entropy): token-distribution profile —
    * type-token ratio and Shannon entropy (nats) of each document's
    * kept-token histogram. Low entropy = repetitive/template text,
    * TTR = lexical diversity; both standard corpus-quality features.
    * H = ln(dl) − Σ tf·ln(tf)/dl, computed in ONE aggregate over the
    * tf relation (no per-token pass; ln over exact integer counts is
    * bit-identical across engines, and the Σ is a single FP sum —
    * round(·,4) absorbs its association order). */
  def tokenEntropy(docs: DataFrame): DataFrame =
    Bm25.tf(docs)
      .groupBy("doc_id")
      .agg(sum("tf").as("dl"), count(lit(1)).as("n_types"),
        sum(col("tf") * log(col("tf").cast("double"))).as("sum_tlnt"))
      .select(col("doc_id"), col("dl"), col("n_types"),
        round(col("n_types").cast("double") / col("dl"), 6).as("ttr"),
        round(log(col("dl").cast("double")) - col("sum_tlnt") / col("dl"), 4).as("entropy"))

  /** The suffix-stripping CASE, written once and shared verbatim with
    * the DuckDB oracle so both engines stem identically. Porter-style
    * step-1-ish rules with length guards against over-stripping. */
  private[graft] val StemCase =
    """CASE
      | WHEN length(term) > 4 AND term LIKE '%ies' THEN substr(term, 1, length(term)-3) || 'y'
      | WHEN length(term) > 5 AND term LIKE '%ing' THEN substr(term, 1, length(term)-3)
      | WHEN length(term) > 4 AND term LIKE '%ed' THEN substr(term, 1, length(term)-2)
      | WHEN length(term) > 4 AND term LIKE '%ly' THEN substr(term, 1, length(term)-2)
      | WHEN length(term) > 4 AND term LIKE '%es' THEN substr(term, 1, length(term)-2)
      | WHEN length(term) > 3 AND term LIKE '%s' AND term NOT LIKE '%ss' THEN substr(term, 1, length(term)-1)
      | ELSE term END""".stripMargin

  /** (stem, n_terms, n_total): vocabulary folded by a deterministic
    * suffix stemmer — the index-time normalization knob between raw
    * tokens and full lemmatization. Stemming happens AFTER the term
    * aggregation, so the expensive part runs at vocabulary cardinality,
    * not corpus cardinality. */
  def stemmedVocab(docs: DataFrame): DataFrame =
    Bm25.tokenize(docs)
      .groupBy("term").agg(count(lit(1)).as("n"))
      .withColumn("stem", expr(StemCase))
      .groupBy("stem")
      .agg(count(lit(1)).as("n_terms"), sum(col("n")).as("n_total"))

  /** (doc_id, n_orig, n_seg, exact): dictionary longest-match
    * segmentation round trip — the ansj plug-point of the reference
    * (BatchBM25PreMain.java:185-199) demonstrated end-to-end: strip
    * every space from the document, re-segment the delimiter-free
    * string with `graft_segment` against the corpus vocabulary, and
    * compare with the original token sequence. The vocabulary is
    * collected once on the driver (segmenter dictionaries are bounded
    * by design — this is how any dictionary tokenizer ships its model)
    * and broadcast as a literal; the segmentation itself is one native
    * pass per row. Greedy longest-match can mis-split genuinely
    * ambiguous concatenations, so `exact` is reported per doc and the
    * spec asserts a high round-trip rate rather than perfection. */
  def segmentRoundTrip(docs: DataFrame, maxVocab: Int = 100000): DataFrame = {
    // bounded-dictionary derivation: the top `maxVocab` terms by corpus
    // frequency (ties to the lexicographically smaller term) via one
    // distributed TakeOrdered — a corpus-derived vocabulary has no
    // intrinsic bound, and an unbounded literal dictionary would bloat
    // every serialized task (a web-scale vocab would OOM the driver).
    // Below the cap top-k == the full distinct vocabulary, so small
    // corpora keep their exact round-trip contract; above it the
    // segmenter degrades gracefully to the high-frequency dictionary
    // (exactly how a shipped segmenter model is curated) instead of
    // refusing. The require stays as the belt-and-suspenders guard on
    // the collected size.
    val vocab = docs.select(explode(graft.functions.Text.rawTokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc).limit(maxVocab)
      .collect().map(_.getString(0)).sorted
    require(vocab.length <= maxVocab,
      s"segmentation dictionary has ${vocab.length} entries (max $maxVocab)")
    val dictArr = array(vocab.map(lit): _*)
    docs
      .withColumn("orig", graft.functions.Text.rawTokens(col("text")))
      .withColumn("seg", graft.functions.Native.segment(
        regexp_replace(lower(col("text")), " ", ""), dictArr))
      .select(col("doc_id"),
        size(col("orig")).cast("long").as("n_orig"),
        size(col("seg")).cast("long").as("n_seg"),
        (col("seg") === col("orig")).as("exact"))
  }

  /** (doc_id, fingerprint): content fingerprint = min md5 over word
    * 3-gram shingles (md5(text) fallback for tiny docs). Robust to
    * word order at the edges, cheap, and a pure map+min aggregation. */
  def fingerprint(docs: DataFrame): DataFrame = {
    val minShingle = Dedup.shingles(docs)
      .groupBy("doc_id").agg(min(md5(col("shingle"))).as("sh_fp"))
    // fallback hashes the NORMALIZED (lowercased) text so tiny docs
    // get the same case-insensitivity as the shingle path (shingles
    // come from the lowercasing rawTokens) — dedup semantics must not
    // flip with document length
    docs.select(col("doc_id"), md5(lower(col("text"))).as("txt_fp"))
      .join(minShingle, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("sh_fp"), col("txt_fp")).as("fingerprint"))
  }

  /** (doc_id, split): deterministic 80/10/10 train/val/test
    * assignment by content-free id hash — no RNG state, stable under
    * corpus growth (a doc keeps its split forever), reproducible on
    * any engine (md5 → first 8 hex digits → uniform in [0,1)). The
    * split boundary is a pure map predicate: zero shuffle at any
    * scale, and downstream readers can push `split = 'train'` into
    * the scan when the assignment is materialized as a partition
    * column ([[graft.sources.Sinks.writePartitioned]]). */
  def trainSplit(docs: DataFrame): DataFrame =
    docs
      .withColumn("u", expr(hashU("CAST(doc_id AS STRING)")))
      .select(col("doc_id"),
        when(col("u") < 0.8, "train").when(col("u") < 0.9, "val").otherwise("test")
          .as("split"))

  /** (doc_id, source, n_chars, rk): per-domain document cap — domain
    * balancing, the Gopher/C4-style per-source quota: keep the `cap`
    * highest-ranked docs of every source so no single domain dominates
    * the training mixture. Rank = (n_chars desc, doc_id asc), a
    * deterministic quality proxy (swap in a quality score column for
    * real mixes). Scale: rank ≤ cap is a WindowGroupLimit — Spark
    * bounds every group to `cap` rows BEFORE the sort materializes
    * (the topK-per-group plan family, pinned in PlanSpec), so state
    * per domain is O(cap) however large the domain. */
  def sourceCap(docs: DataFrame, cap: Int = 10): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("n_chars").desc, col("doc_id").asc)
    docs.select("doc_id", "source", "n_chars")
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= cap)
  }

  /** (doc_id, shard, pos): reproducible global training-order shuffle
    * — the "shuffle the corpus before packing" step, derived entirely
    * from a content-stable hash (md5 of doc_id): shard = floor(u ×
    * nShards), pos = rank of u within the shard. No RNG state: every
    * engine/run derives the same order, and a re-run over a grown
    * corpus keeps every old doc's shard (only in-shard positions
    * shift). The window is PER-SHARD, never a global sort: at 100 TB
    * each shard's order materializes independently after one shuffle
    * on the shard key; u = k/2^32 is exactly representable, so
    * floor(u×nShards) has no fp boundary ambiguity across engines. */
  def shuffleOrder(docs: DataFrame, nShards: Int = 8): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("u").asc, col("doc_id").asc)
    docs
      .withColumn("u", expr(hashU("concat(CAST(doc_id AS STRING), ':shuf')")))
      .withColumn("shard", floor(col("u") * nShards).cast("long"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select("doc_id", "shard", "pos")
  }

  /** (doc_id, chunk_id, n_tokens, chunk_md5): context-window chunking
    * — every document's RAW token stream split into consecutive
    * `chunkSize`-token windows, the unit a training pipeline feeds a
    * fixed-context model (the md5 of the re-joined chunk text makes
    * the gate verify chunk CONTENT, not just counts). Pure map +
    * explode stage: chunk count per doc = ceil(len/chunkSize), zero
    * shuffles at any corpus size, and chunk rows carry no full-text
    * copy — just the hash. The raw (unfiltered) stream is
    * deliberate: training sequences keep stopwords. NULL-text contract:
    * NO chunk rows (there is no token stream to window — matching the
    * oracle's generate_series-over-NULL); without the filter,
    * size(NULL) = -1 under non-ANSI semantics and sequence(0, -1 div
    * chunkSize) would emit one garbage chunk with n_tokens = -1.
    * (packSequences differs deliberately: packing must place every DOC
    * in a bin, so a NULL-text doc packs as zero tokens there.) */
  def seqChunks(docs: DataFrame, chunkSize: Int = 16): DataFrame =
    docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), split(col("text"), " ").as("words"))
      .select(col("doc_id"), col("words"),
        explode(expr(s"sequence(0, (size(words) - 1) div $chunkSize)")).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        size(slice(col("words"), col("chunk_id") * chunkSize + 1, lit(chunkSize)))
          .cast("long").as("n_tokens"),
        md5(concat_ws(" ",
          slice(col("words"), col("chunk_id") * chunkSize + 1, lit(chunkSize))))
          .as("chunk_md5"))

  /** (doc_id, source, n_tokens, bin_id): greedy sequence PACKING —
    * within each source, docs in doc_id order are packed into bins of
    * ≤ `cap` raw tokens; a doc that would overflow starts the next
    * bin (an over-cap doc gets a bin of its own). The step after
    * [[seqChunks]] in a training pipeline: chunking splits long docs,
    * packing coalesces short ones so fixed-context batches waste no
    * tokens. The greedy fold is inherently SEQUENTIAL per group — the
    * one operator family where the imperative rung of the extension
    * ladder is honest: `flatMapSortedGroups` streams each source's
    * docs in order through O(1) state (never materializing the
    * group), and sources partition the corpus, so parallelism =
    * #sources. At 100 TB the pack key would be (source, day-shard) —
    * same code, finer groups; packing across ALL data in one sequence
    * is not a parallelizable spec, and no engine runs it that way. */
  def packSequences(docs: DataFrame, cap: Long = 256L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // NULL text packs as a zero-token doc (size(split(NULL)) is NULL,
    // and the non-null tuple encoder would abort the whole job on it —
    // the one degenerate row must not kill a corpus-wide pack)
    docs.select(col("doc_id"), col("source"),
        coalesce(size(split(col("text"), " ")).cast("long"), lit(0L)).as("n_tokens"))
      .as[(Long, String, Long)]
      .groupByKey(_._2)
      .flatMapSortedGroups(col("doc_id")) { (_: String, it: Iterator[(Long, String, Long)]) =>
        var bin = 0L
        var fill = -1L // sentinel: first doc seeds bin 0 whatever its size
        it.map { case (d, s, n) =>
          if (fill < 0L) fill = n
          else if (fill + n <= cap) fill += n
          else { bin += 1L; fill = n }
          (d, s, n, bin)
        }
      }
      .toDF("doc_id", "source", "n_tokens", "bin_id")
  }

  /** (cap, n_bins, n_overflow_bins, total_tokens, utilization): the
    * PACKING-EFFICIENCY CAP SWEEP — [[packSequences]] replayed across
    * a context-length grid, rolled up to the reading that DECIDES
    * max_len: how many fixed-size batches does the corpus fill, how
    * full are they (padding waste = 1 − utilization), and how many
    * docs overflow the cap outright (candidates for [[seqChunks]]
    * splitting first). Utilization can exceed 1.0 only when
    * overflow bins dominate — itself the cap-too-small signal. Each
    * cap is one independent greedy pack (the union-of-configs sweep
    * convention of bm25_tune/ivf_tune); output is caps-sized. */
  def packEfficiency(docs: DataFrame,
                     caps: Seq[Long] = Seq(64L, 128L, 256L, 512L)): DataFrame = {
    require(caps.nonEmpty, "caps must be non-empty")
    caps.map { cap =>
      packSequences(docs, cap)
        .groupBy("source", "bin_id")
        .agg(sum("n_tokens").as("btok"))
        .agg(count(lit(1)).as("n_bins"),
          sum(when(col("btok") > cap, 1L).otherwise(0L)).as("n_overflow_bins"),
          sum("btok").as("total_tokens"))
        .select(lit(cap).as("cap"), col("n_bins"), col("n_overflow_bins"),
          col("total_tokens"),
          round(col("total_tokens").cast("double") / (col("n_bins") * cap), 6)
            .as("utilization"))
    }.reduce(_ unionByName _)
  }

  /** The runs-test z formula text, interpolated VERBATIM into both
    * engines ([[welchTSql]]'s typographic-parity discipline) over a
    * relation carrying exact BIGINT (n1, n2, runs); the leading 2.0
    * promotes every product to DOUBLE so nothing overflows at any
    * corpus size. */
  private[graft] val runsZSql: String = {
    val sq = "(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)) / " +
      "((CAST(n1 + n2 AS DOUBLE) * (n1 + n2)) * (n1 + n2 - 1))"
    s"CASE WHEN n1 = 0 OR n2 = 0 THEN CAST(NULL AS DOUBLE) " +
      s"WHEN $sq <= 0.0 THEN CAST(NULL AS DOUBLE) " +
      s"ELSE round((runs - (2.0 * n1 * n2 / (n1 + n2) + 1.0)) / sqrt($sq), 6) END"
  }

  /** (source, n1, n2, runs, z): WALD–WOLFOWITZ runs test of each
    * source's INGEST-ORDER length sequence against its own median —
    * the BATCHY-INGEST detector the location/spread/shape suite
    * cannot see: a crawler interleaving hosts produces near-random
    * above/below-median runs (z ≈ 0); a dump concatenated
    * host-by-host produces few long runs (large negative z), and
    * training on it in doc order defeats the shuffle assumptions
    * downstream sampling makes. Mechanics: per-source LOWER median
    * as an exact order statistic (the [[leveneLength]] interval
    * pick), docs AT the median drop (the classical convention),
    * runs = 1 + sign changes over the doc_id-ordered kept sequence
    * (a per-source lag — the event keys' lead-by-user window
    * precedent: sequence questions need sequence order), and the
    * normal-approximation z evaluates from ONE shared formula text
    * ([[runsZSql]]); NULL when either side is empty or the variance
    * degenerates. */
  def runsTestLength(docs: DataFrame): DataFrame = {
    val d = docs.select(col("source"), col("doc_id"),
      col("n_chars").cast("long").as("v"))
    val g = d.groupBy("source", "v").agg(count(lit(1)).as("t"))
    val w = Window.partitionBy("source").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = g.withColumn("below", coalesce(sum("t").over(w), lit(0L)))
    val per = d.groupBy("source").agg(count(lit(1)).as("ntot"))
    val med = cum.join(per, "source")
      .withColumn("idx", expr("(ntot + 1) div 2"))
      .filter(col("below") < col("idx") && col("idx") <= col("below") + col("t"))
      .select(col("source"), col("v").as("med"))
    val signed = d.join(broadcast(med), "source")
      .filter(col("v") =!= col("med"))
      .select(col("source"), col("doc_id"), (col("v") > col("med")).cast("long").as("s"))
    val wo = Window.partitionBy("source").orderBy("doc_id")
    signed.withColumn("prev", lag("s", 1).over(wo))
      .groupBy("source")
      .agg(count(lit(1)).as("nkept"), sum("s").as("n1"),
        sum(when(col("prev").isNull || col("prev") =!= col("s"), 1L)
          .otherwise(0L)).as("runs"))
      .select(col("source"), col("n1"), (col("nkept") - col("n1")).as("n2"),
        col("runs"))
      .select(col("source"), col("n1"), col("n2"), col("runs"),
        expr(runsZSql).as("z"))
  }

  /** (doc_id, ok_words, ok_word_len, ok_repetition, ok_stopwords,
    * keep): Gopher-style rule filter (Rae et al. 2021, table A1
    * adapted to this corpus) — the standard pre-training quality gate.
    * Every rule is an EXACT integer comparison (ratios are
    * cross-multiplied), so the verdicts are engine-portable:
    *  - ok_words:       25 ≤ n_raw_tokens ≤ 100000
    *  - ok_word_len:    mean raw-token length in [2,10]
    *                    (2·n ≤ total_chars ≤ 10·n)
    *  - ok_repetition:  most frequent token ≤ 1/8 of the doc
    *                    (8·max_tf ≤ n)
    *  - ok_stopwords:   ≥ 2 DISTINCT engine stopwords present
    * All four are per-row array expressions over the raw token array —
    * a pure map stage, no shuffle at any scale. */
  def gopherRules(docs: DataFrame): DataFrame = {
    val stop = Text.stopwordsSqlList
    docs
      .withColumn("toks", graft.functions.Text.rawTokens(col("text")))
      .withColumn("nw", size(col("toks")).cast("long"))
      // single-space separated: total token chars = len(text) - (nw-1)
      .withColumn("tc", (length(col("text")) - (col("nw") - 1)).cast("long"))
      .withColumn("max_tf", expr(maxTfSql("toks")).cast("long"))
      .withColumn("n_stop_kinds",
        size(expr(s"array_distinct(filter(toks, t -> t IN ($stop)))")).cast("long"))
      .select(col("doc_id"),
        (col("nw") >= 25 && col("nw") <= 100000).as("ok_words"),
        (col("tc") >= col("nw") * 2 && col("tc") <= col("nw") * 10).as("ok_word_len"),
        (col("max_tf") * 8 <= col("nw")).as("ok_repetition"),
        (col("n_stop_kinds") >= 2).as("ok_stopwords"))
      .withColumn("keep",
        col("ok_words") && col("ok_word_len") && col("ok_repetition") && col("ok_stopwords"))
  }

  /** (doc_id, n, gram, cnt, glen): n-gram OCCURRENCE counts per doc
    * plus the gram's character length (word chars only — the n-1
    * joining spaces subtracted). Explode + per-doc hash aggregation;
    * the gram relation streams from the scan into map-side partials. */
  private def ngramCounts(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"), graft.functions.Text.rawTokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"), explode(graft.functions.Native.shingles(col("toks"), n)).as("gram"))
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("cnt"))
      .withColumn("glen", (length(col("gram")) - (n - 1)).cast("long"))

  /** (doc_id, top2_frac, top3_frac, dup5_frac, keep): Gopher
    * REPETITION signals (Rae et al. 2021, table A1's n-gram rows —
    * [[gopherRules]] covers the scalar rows): the fraction of a
    * document's characters covered by its highest-coverage 2-gram and
    * 3-gram (max over grams of count × chars — deterministic with no
    * tie-break, unlike "most frequent" which ties), and by all
    * duplicated (count ≥ 2) 5-grams. Character
    * coverage is count × word-chars of the gram over total token
    * chars (single-space contract, as in gopherRules); overlapping
    * occurrences double-count — the standard approximation, identical
    * in any engine since it is pure integer arithmetic until the one
    * final division. Too-short docs (fewer than n tokens, including
    * NULL text) score 0 and keep. Three explode→per-doc aggregations,
    * all map-side-partial friendly; nothing corpus-pairwise. */
  def gopherRepetition(docs: DataFrame): DataFrame = {
    val top2 = ngramCounts(docs, 2).groupBy("doc_id")
      .agg(max(col("cnt") * col("glen")).as("cov2"))
    val top3 = ngramCounts(docs, 3).groupBy("doc_id")
      .agg(max(col("cnt") * col("glen")).as("cov3"))
    val dup5 = ngramCounts(docs, 5).groupBy("doc_id")
      .agg(sum(when(col("cnt") >= 2, col("cnt") * col("glen")).otherwise(0L)).as("cov5"))
    docs
      .withColumn("nw", size(graft.functions.Text.rawTokens(col("text"))).cast("long"))
      .withColumn("tc", (length(col("text")) - (col("nw") - 1)).cast("long"))
      .select(col("doc_id"), col("tc"))
      .join(top2, Seq("doc_id"), "left")
      .join(top3, Seq("doc_id"), "left")
      .join(dup5, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(round(col("cov2").cast("double") / col("tc"), 4), lit(0.0)).as("top2_frac"),
        coalesce(round(col("cov3").cast("double") / col("tc"), 4), lit(0.0)).as("top3_frac"),
        coalesce(round(col("cov5").cast("double") / col("tc"), 4), lit(0.0)).as("dup5_frac"))
      // thresholds from the Gopher paper's repetition table; compared
      // on the ROUNDED values so both engines decide identically
      .withColumn("keep",
        col("top2_frac") <= 0.20 && col("top3_frac") <= 0.18 && col("dup5_frac") <= 0.15)
  }

  /** Raw-token bigram relation (doc_id, w1, w2) — the extraction step
    * shared by [[bigramLm]] and [[docPerplexity]] (and replayed
    * verbatim by their oracles' generate_series CTE). */
  private def bigramRows(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), graft.functions.Text.rawTokens(col("text")).as("words"))
      .filter(size(col("words")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(words)-1),
          |  i -> struct(element_at(words, CAST(i AS INT)) AS w1,
          |              element_at(words, CAST(i+1 AS INT)) AS w2))""".stripMargin)).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))

  /** (doc_id, n_bigrams, avg_logprob, ppl): per-document perplexity
    * under a HELD-OUT bigram language model — the classic
    * perplexity-filter quality signal (CCNet/Gopher use a KenLM; the
    * engine's model is the corpus's own bigram LM so the operator
    * stays self-contained and oracle-replayable). The LM trains on
    * the even-doc_id half, scores ALL docs, and add-one smoothing
    * over the LM's continuation vocabulary V handles unseen bigrams:
    * p(w2|w1) = (n12+1)/(n1+V). Scale shape: two aggregations over
    * the bigram relation (n12, n1 — shuffles on term keys), the
    * scored pass left-joins them on the same keys, and V rides in as
    * a broadcast scalar; nothing corpus-sized reaches the driver.
    * ppl is derived from the ROUNDED avg_logprob (exp amplifies
    * last-bit FP noise; rounding first makes both engines' exp see
    * identical inputs). */
  def docPerplexity(docs: DataFrame): DataFrame = {
    val bg = bigramRows(docs)
    val lmBg = bigramRows(docs.filter(col("doc_id") % 2 === 0))
    val c12 = lmBg.groupBy("w1", "w2").agg(count(lit(1)).as("n12"))
    val c1 = lmBg.groupBy(col("w1").as("cw1")).agg(count(lit(1)).as("n1"))
    val vocab = lmBg.agg(countDistinct(col("w2")).as("vocab"))
    val scored = bg
      .join(c12, Seq("w1", "w2"), "left")
      .join(c1, col("w1") === col("cw1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("lp",
        log((coalesce(col("n12"), lit(0L)) + 1).cast("double") /
          (coalesce(col("n1"), lit(0L)) + col("vocab")).cast("double")))
    scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("lp")), 4).as("avg_logprob"))
      .withColumn("ppl", round(exp(-col("avg_logprob")), 4))
  }

  /** (doc_id, n_tokens, log_ratio): DSIR-style importance weights
    * (Xie et al., "Data Selection for LMs via Importance Resampling")
    * — per-document log-likelihood ratio between a TARGET unigram
    * distribution (here: the lang='en' slice standing in for the
    * high-quality target corpus) and the RAW corpus distribution,
    * both add-one smoothed over the joint vocabulary:
    * log_ratio = Σ_tok ln[ (c_t+1)/(N_t+V) ÷ (c_r+1)/(N_r+V) ].
    * High ratio = looks like target → keep/upsample. Scale shape:
    * two vocabulary-sized count aggregations, the scoring pass joins
    * occurrences to the vocabulary relation on the token key (one
    * shuffle), scalars (N_t, N_r, V) broadcast; resampling itself is
    * [[trainSplit]]'s hash-threshold against these weights. */
  def importanceWeights(docs: DataFrame, targetLang: String = "en"): DataFrame = {
    val toks = docs.select(col("doc_id"), col("lang"),
        explode(graft.functions.Text.rawTokens(col("text"))).as("tok"))
    val raw = toks.groupBy("tok").agg(count(lit(1)).as("c_r"))
    val tgt = toks.filter(col("lang") === targetLang)
      .groupBy(col("tok").as("ttok")).agg(count(lit(1)).as("c_t"))
    // one vocabulary relation carrying both counts (absent-in-target → 0)
    val vocabRel = raw.join(tgt, col("tok") === col("ttok"), "left")
      .select(col("tok"), col("c_r"), coalesce(col("c_t"), lit(0L)).as("c_t"))
    val scalars = vocabRel.agg(sum("c_r").as("n_r"), sum("c_t").as("n_t"),
      count(lit(1)).as("vocab"))
    toks.join(vocabRel, "tok")
      .crossJoin(broadcast(scalars))
      .withColumn("lr",
        log((col("c_t") + 1).cast("double") / (col("n_t") + col("vocab")).cast("double")) -
          log((col("c_r") + 1).cast("double") / (col("n_r") + col("vocab")).cast("double")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), round(sum(col("lr")), 4).as("log_ratio"))
  }

  /** (doc_id, gkey, rk): DSIR importance RESAMPLING — the selection
    * step completing [[importanceWeights]]: draw the k docs with
    * probability ∝ exp(length-normalized log-ratio) via the
    * Gumbel-top-k trick, g_i = w_i − ln(−ln(u_i)) with u_i a
    * DETERMINISTIC md5-uniform per doc (same hash family as
    * [[trainSplit]]) — sampling that is reproducible run-over-run,
    * replayable in the oracle, and distributed (the top-k is a
    * window-free [[TopK.rankedTopN]] TakeOrdered, never a global rank
    * window). The Gumbel key rounds to 4 before ranking so libm ulps
    * can't flip a boundary; u clamps away from 0 with the same
    * literal in both engines. The hash key is SALTED ('dsir:' prefix)
    * so this draw is independent of [[trainSplit]]'s uniform — the
    * unsalted form would systematically overdraw the test split
    * (same u drives both decisions). */
  def dsirResample(docs: DataFrame, k: Int = 100,
                   targetLang: String = "en"): DataFrame = {
    val wts = importanceWeights(docs, targetLang)
    val keyed = wts
      .withColumn("u", greatest(
        expr(hashU("CONCAT('dsir:', CAST(doc_id AS STRING))")), lit(1e-12)))
      .withColumn("gkey",
        round(col("log_ratio") / col("n_tokens") - log(-log(col("u"))), 4))
    TopK.rankedTopN(keyed, "gkey", "doc_id", k, "rk")
  }

  /** (doc_id, source, n_tokens, bucket_id, batch_id): length-bucketed
    * batch assignment — docs grouped into fixed-width token-length
    * buckets (bucket = n_tokens div width) and, within each
    * (source, bucket), packed into deterministic `batchSize`-doc
    * batches in doc_id order. The batching step before padding-free
    * training: same-length docs batch together so a fixed-context
    * collator wastes no pad tokens. The window partitions on
    * (source, bucket_id) — at 100 TB the shard key grows a day/shard
    * component exactly like [[packSequences]]; a bucket-only window
    * would funnel each length class through one partition. */
  def lengthBuckets(docs: DataFrame, width: Int = 64, batchSize: Int = 8): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source", "bucket_id").orderBy(col("doc_id").asc)
    docs
      .withColumn("n_tokens", size(graft.functions.Text.rawTokens(col("text"))).cast("long"))
      .withColumn("bucket_id", (col("n_tokens") / lit(width)).cast("long"))
      .withColumn("batch_id",
        ((row_number().over(w) - 1) / lit(batchSize)).cast("long"))
      .select("doc_id", "source", "n_tokens", "bucket_id", "batch_id")
  }

  /** (doc_id, source): temperature-scaled mixture sampling — the
    * multilingual/multi-domain rebalancing standard (mBERT/XLM-R,
    * τ-sampling): a source with n_s docs gets sampled share
    * ∝ n_s^τ (τ<1 upsamples small sources), realized as a
    * deterministic hash-threshold keep with per-source rate
    * rate_s = min(1, targetFrac · N · share_s / n_s). Unlike
    * [[mixtureSample]] (caller-supplied rates), the rates here DERIVE
    * from corpus statistics: one tiny per-source count aggregation
    * (≤ #domains rows, broadcast back), then the same [[hashU]]
    * map-side filter — no RNG, replayable, one corpus pass. Rates
    * are rounded to 6 decimals BEFORE the compare so the pow(·,τ)
    * libm last bit can never flip a keep decision across engines. */
  def temperatureMix(docs: DataFrame, tau: Double = 0.7,
      targetFrac: Double = 0.5): DataFrame = {
    val counts = docs.groupBy(col("source").as("csource"))
      .agg(count(lit(1)).as("n_s"))
    val tot = counts.agg(sum("n_s").as("n_total"),
      sum(pow(col("n_s").cast("double"), tau)).as("sum_w"))
    val rates = counts.crossJoin(tot)
      .select(col("csource"),
        round(least(lit(1.0),
          lit(targetFrac) * col("n_total") *
            (pow(col("n_s").cast("double"), tau) / col("sum_w")) / col("n_s")), 6)
          .as("rate"))
    docs
      .join(broadcast(rates), col("source") === col("csource"))
      .withColumn("u", expr(hashU("concat(CAST(doc_id AS STRING), ':temp')")))
      .filter(col("u") < col("rate"))
      .select("doc_id", "source")
  }

  /** (source, n_tokens, weight, planned_tokens, epochs): DATA-
    * CONSTRAINED mixture planning — the token-budget allocation every
    * pretraining run fixes before sampling: per-source kept-token
    * counts ([[Bm25.tf]]'s tokenize rules, so the budget speaks the
    * same tokens the corpus stats do), temperature-flattened weights
    * w_s ∝ T_s^τ (the [[temperatureMix]] exponent applied to TOKENS,
    * not docs), planned tokens floor(budget·w_s), and the implied
    * epochs planned/T_s — epochs > 1 is the data-constrained regime
    * (that source repeats; Muennighoff et al. 2023's diminishing-
    * returns knob made visible per source). Metadata-sized: one
    * corpus aggregate → a sources-cardinality relation; the plan is
    * what a 100 TB run ships to its sampler, not a data movement. */
  def tokenBudget(docs: DataFrame, tau: Double = 0.7,
                  budget: Long = 2000000L): DataFrame = {
    val perDoc = Bm25.tf(docs).groupBy("doc_id").agg(sum("tf").as("n_tok"))
    val perSrc = docs.select(col("doc_id"), col("source")).join(perDoc, "doc_id")
      .groupBy("source").agg(sum("n_tok").as("n_tokens"))
    val tot = perSrc.agg(
      sum(pow(col("n_tokens").cast("double"), tau)).as("sum_w"))
    val w = pow(col("n_tokens").cast("double"), tau) / col("sum_w")
    perSrc.crossJoin(broadcast(tot))
      .select(col("source"), col("n_tokens"),
        round(w, 6).as("weight"),
        floor(lit(budget.toDouble) * w).cast("long").as("planned_tokens"),
        round(floor(lit(budget.toDouble) * w) / col("n_tokens"), 4).as("epochs"))
  }

  /** (doc_id, source): ONE EPOCH of the [[tokenBudget]] plan
    * materialized — each source sampled at rate min(1, epochs) by the
    * deterministic [[hashU]] uniform (sources whose plan demands
    * repetition keep every doc; the >1 remainder is the cross-epoch
    * repetition factor the sampler applies downstream). The plan is a
    * broadcast sources-cardinality relation; the sample is one
    * filterless map-side pass over the corpus. */
  def budgetSample(docs: DataFrame, tau: Double = 0.7,
                   budget: Long = 2000000L): DataFrame =
    budgetSampleFrom(docs, budgetPlan(docs, tau, budget))

  /** The per-source sampling rates of [[tokenBudget]]'s plan —
    * rate = min(1, rounded epochs), the sources-cardinality relation
    * a sampler broadcasts. */
  def budgetPlan(docs: DataFrame, tau: Double = 0.7,
                 budget: Long = 2000000L): DataFrame =
    tokenBudget(docs, tau, budget)
      .select(col("source"), least(lit(1.0), col("epochs")).as("rate"))

  /** [[budgetSample]]'s membership pass over an arbitrary doc slice
    * under a FIXED broadcast plan: a doc's membership depends only on
    * itself and the plan (deterministic md5 uniform) — the stateless
    * core that makes the streaming twin's union-over-batches equal
    * the batch sample by construction. */
  def budgetSampleFrom(rows: DataFrame, plan: DataFrame): DataFrame =
    rows.select(col("doc_id"), col("source"))
      .join(broadcast(plan), "source")
      .withColumn("u", expr(hashU("concat(CAST(doc_id AS STRING), ':budget')")))
      .filter(col("u") < col("rate"))
      .select("doc_id", "source")

  /** (source, n_docs, n_exact, n_fuzzy): the CONTAMINATION REPORT —
    * per-source rollup of the screening family's flag sets (exact
    * verbatim-overlap and fuzzy MinHash legs), the dashboard a
    * pipeline owner reads before pulling a source: which domains leak
    * eval content, and through which screen. Flag sets arrive as
    * (doc_id) relations from the existing screens; the rollup is two
    * semi-join-shaped aggregations against the doc→source map. */
  def contaminationReport(docs: DataFrame, exactFlagged: DataFrame,
                          fuzzyFlagged: DataFrame): DataFrame = {
    val src = docs.select(col("doc_id"), col("source"))
    val ns = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
    val ne = src.join(exactFlagged, "doc_id").groupBy("source")
      .agg(count(lit(1)).as("ne"))
    val nf = src.join(fuzzyFlagged, "doc_id").groupBy("source")
      .agg(count(lit(1)).as("nf"))
    ns.join(ne, Seq("source"), "left").join(nf, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("ne"), lit(0L)).as("n_exact"),
        coalesce(col("nf"), lit(0L)).as("n_fuzzy"))
  }

  /** (doc_id, lang, rk): stratified fixed-SIZE sample — exactly
    * min(perStratum, |stratum|) docs per language, picked by the
    * deterministic [[hashU]] uniform (so the pick is an unbiased
    * without-replacement sample, reproducible across reruns and
    * engines). Rank-`perStratum` cut via a per-stratum window:
    * WindowGroupLimit bounds every stratum's state to O(perStratum)
    * — no stratum ever sorts fully, no global window. The complement
    * of [[mixtureSample]]/[[temperatureMix]] (fractional rates): this
    * is the "give me exactly 10k eval docs per language" shape. */
  def stratifiedSample(docs: DataFrame, perStratum: Int = 50): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("u").asc, col("doc_id").asc)
    docs.select(col("doc_id"), col("lang"))
      .withColumn("u", expr(hashU("concat(CAST(doc_id AS STRING), ':', lang, ':strat')")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= perStratum)
      .select("doc_id", "lang", "rk")
  }

  /** (fold, source, n_docs): k-fold cross-validation assignment —
    * every doc lands in fold md5(doc_id:fold) mod k (content-stable:
    * re-runs, late partitions and corpus growth never move an
    * existing doc between folds, unlike zipWithIndex-mod or RNG
    * splits), summarized as per-(fold, source) counts. Pure map +
    * one k×sources-group aggregate; the doc-level assignment column
    * is the first select if a caller wants rows not counts. */
  def crossvalFolds(docs: DataFrame, k: Int = 5): DataFrame =
    docs
      .select(col("doc_id"), col("source"),
        expr("CAST(conv(substr(md5(concat(CAST(doc_id AS STRING), ':fold')), 1, 8), 16, 10) AS BIGINT)")
          .mod(k).as("fold"))
      .groupBy("fold", "source").agg(count(lit(1)).as("n_docs"))

  /** (doc_id, n_clean_chars, clean_md5): markup strip + whitespace
    * normalization — the first pass of any web-corpus cleaner: drop
    * `<...>` tags, collapse entity escapes, fold whitespace runs to
    * one space, trim. Pure codegen'd map stage (three regexp_replace
    * passes), zero shuffle; the md5 fingerprints the CLEANED text so
    * downstream exact-dedup ([[fingerprint]]) can run pre- or
    * post-strip and the difference is observable. */
  def stripMarkup(docs: DataFrame): DataFrame = {
    val clean = trim(regexp_replace(regexp_replace(regexp_replace(
      col("text"), "<[^>]*>", " "), "&[a-zA-Z]+;", " "), "\\s+", " "))
    docs.select(col("doc_id"),
      length(clean).cast("long").as("n_clean_chars"),
      md5(clean).as("clean_md5"))
  }

  /** (doc_id, n_toks, sum_len, max_len): per-document token-length
    * profile computed entirely with HIGHER-ORDER array functions —
    * transform/aggregate/array_max over the token array, no explode:
    * the row count never multiplies by token count, so the stage
    * stays a pure narrow map over the corpus (the explode form
    * shuffles |corpus|×|tokens| rows into a re-grouping aggregate —
    * strictly worse at every scale). Empty-token artifacts of the
    * space split count like the tokenizer emits them (parity with
    * [[graft.functions.Text.rawTokens]] everywhere else). */
  def tokenLengthStats(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        graft.functions.Text.rawTokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_toks"),
        expr("aggregate(transform(toks, t -> CAST(length(t) AS BIGINT)), 0L, (acc, x) -> acc + x)")
          .as("sum_len"),
        expr("CAST(array_max(transform(toks, t -> length(t))) AS BIGINT)").as("max_len"))

  /** (k, covered, total_tokens, coverage): vocabulary coverage curve —
    * what fraction of corpus TOKEN OCCURRENCES the top-k most frequent
    * kept terms cover, at k ∈ {100, 1000, 10000}. The tokenizer-sizing
    * and OOV-budget signal (how big must a vocab be before coverage
    * plateaus). One corpus aggregation builds the term-count relation;
    * each k is then a distributed TakeOrdered (orderBy().limit() —
    * never a global rank window) over the vocabulary-sized counts plus
    * a one-row sum, so the corpus is scanned once however many k
    * points the curve has. Deterministic tiebreak (count desc, term
    * asc) pins which boundary term is inside k in both engines. */
  def vocabCoverage(docs: DataFrame, ks: Seq[Int] = Seq(100, 1000, 10000)): DataFrame = {
    val counts = graft.operators.Bm25.tokenize(docs)
      .groupBy("term").agg(count(lit(1)).as("n"))
      .cutLineage() // reused by every k point and the total
    val total = counts.agg(sum("n").as("total_tokens"))
    ks.map { k =>
      counts.orderBy(col("n").desc, col("term").asc).limit(k)
        .agg(sum("n").as("covered"))
        .select(lit(k.toLong).as("k"), col("covered"))
    }.reduce(_ unionByName _)
      .crossJoin(broadcast(total))
      .select(col("k"), col("covered"), col("total_tokens"),
        round(col("covered").cast("double") / col("total_tokens"), 6).as("coverage"))
  }

  /** (source, doc_id, dr_micros, pr): RELATIVE quality gate — keep the
    * top `keep` fraction of each source's documents by vocabulary
    * diversity (distinct-token ratio), the per-source analogue of the
    * ABSOLUTE Gopher rules ([[gopherRules]] drops by fixed thresholds;
    * a mixture designer instead asks for "the best 20 % of every
    * source"). The rank signal is the exact integer
    * floor(n_distinct·10⁶ / n_tokens) so ordering and the DuckDB
    * replay never touch float division; percent_rank runs PARTITIONED
    * by source (bounded partitions — never the global-window
    * anti-pattern) with a (signal desc, doc_id asc) tiebreak pinning
    * boundary docs identically in both engines. Scale shape: one map,
    * one shuffle on source; skewed mega-sources would salt the window
    * by pre-bucketed rank the way [[shuffle_order]]'s shards do. */
  def qualityPercentile(docs: DataFrame, keep: Double = 0.2): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("dr_micros").desc, col("doc_id").asc)
    docs
      .withColumn("toks", graft.functions.Text.rawTokens(col("text")))
      .filter(size(col("toks")) > 0) // exact-integer rank signal needs a divisor
      .select(col("source"), col("doc_id"),
        expr("(CAST(size(array_distinct(toks)) AS BIGINT) * 1000000L) div size(toks)").as("dr_micros"))
      .withColumn("pr", round(percent_rank().over(w), 6))
      .filter(col("pr") <= keep)
  }

  /** (source, term, ctfidf, rk): class-based TF-IDF (the BERTopic
    * c-TF-IDF form) — which terms DISTINGUISH each source: term
    * frequency within the class × ln(1 + A / corpus term frequency),
    * A = average class token mass. Where [[keywords]] asks "what is
    * this DOCUMENT about", this asks "what is this SOURCE about" —
    * the per-domain signature a mixture designer reads. One corpus
    * tokenize into (source, term) counts (single shuffle, checkpointed
    * — the vocab×sources relation feeds three consumers without
    * rescanning the corpus); term totals and the scalar A derive from
    * it; top-k per source is a PARTITIONED rank window
    * (WindowGroupLimit). Ranking on the ROUNDED score with a term-asc
    * tiebreak pins boundary order in both engines even when two raw
    * scores differ only in libm ulps. */
  def classTfIdf(docs: DataFrame, k: Int = 5): DataFrame = {
    val toks = docs
      .select(col("source"), explode(Text.rawTokens(col("text"))).as("term"))
      .filter(Text.keepToken(col("term")))
    val byClass = toks.groupBy("source", "term").agg(count(lit(1)).as("tf_c"))
      .cutLineage()
    val termTotals = byClass.groupBy("term").agg(sum("tf_c").as("tf_all"))
    val a = byClass.agg(
      (sum("tf_c").cast("double") / countDistinct("source")).as("a"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("ctfidf").desc, col("term").asc)
    byClass.join(termTotals, "term")
      .crossJoin(broadcast(a))
      .withColumn("ctfidf",
        round(col("tf_c") * log(lit(1.0) + col("a") / col("tf_all")), 4))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select("source", "term", "ctfidf", "rk")
  }

  /** (source, n_raw, n_after_dedup, n_after_quality, tokens_kept):
    * the COMPOSED cleaning pipeline as ONE declarative plan — the
    * end-to-end funnel every corpus build runs (normalize → exact
    * dedup on the normalized hash → quality gate → per-source
    * accounting), expressed as a single DataFrame chain so Catalyst
    * plans the whole flow together (one shuffle on the content hash,
    * one on source — no materialization between "stages"; the stages
    * are columns, not jobs). The funnel numbers are what a pipeline
    * owner actually monitors: how much each gate costs per source.
    * Gate rules shared with [[quality]]/[[qualityBySource]]; keep
    * rule shared with [[Dedup.exact]] (min doc_id per hash). */
  def pipelineFunnel(docs: DataFrame): DataFrame = {
    val norm = docs.select(col("doc_id"), col("source"),
      trim(regexp_replace(lower(col("text")), "\\s+", " ")).as("norm"))
      .withColumn("h", md5(col("norm")))
    val reps = norm.groupBy("h").agg(min("doc_id").as("keep_id"))
    norm.join(reps, "h")
      .withColumn("is_canon", col("doc_id") === col("keep_id"))
      .withColumn("toks", Text.rawTokens(col("norm")))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("ok", col("n_tokens") >= 10 && col("n_tokens") <= 10000 &&
        size(array_distinct(col("toks"))).cast("double") / col("n_tokens") >= 0.2)
      .groupBy("source")
      .agg(count(lit(1)).as("n_raw"),
        sum(when(col("is_canon"), 1L).otherwise(0L)).as("n_after_dedup"),
        sum(when(col("is_canon") && col("ok"), 1L).otherwise(0L)).as("n_after_quality"),
        sum(when(col("is_canon") && col("ok"), col("n_tokens")).otherwise(0L)).as("tokens_kept"))
  }

  /** (doc_id, pos, fp): WINNOWING fingerprints (Schleimer, Wilkerson,
    * Aiken 2003 — the MOSS local fingerprinting scheme): hash every
    * k-token k-gram, slide a w-kgram window, select each window's
    * minimum (hash, position) pair, emit the distinct selections. The
    * guarantee winnowing adds over min-shingle fingerprints
    * ([[fingerprint]]) is POSITIONAL density: every w consecutive
    * kgrams contribute at least one fingerprint, so any shared run of
    * w+k-1 tokens between two documents shares at least one (fp, Δpos)
    * — the local substring-match index plagiarism/contamination
    * scanners build on. Per-document windows only (partitioned by
    * doc_id, w-row frames): embarrassingly parallel at any corpus
    * size, output ≈ 2·tokens/w rows. Ties break to the EARLIER
    * position via lexicographic (hash, pos) struct min — deterministic
    * and engine-replayable (md5 hex strings compare identically
    * everywhere). */
  def winnowing(docs: DataFrame, k: Int = 3, w: Int = 4): DataFrame = {
    val kg = docs
      .select(col("doc_id"), graft.functions.Text.rawTokens(col("text")).as("words"))
      .filter(size(col("words")) >= k)
      .select(col("doc_id"), size(col("words")).as("nw"),
        posexplode(graft.functions.Native.shingles(col("words"), k)))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        md5(col("col")).as("h"), (col("nw") - k + 1).cast("long").as("nk"))
    val win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    kg.withColumn("sel", min(struct(col("h"), col("pos"))).over(win))
      // only full windows select (window starts 1 .. nk-w+1); shorter
      // docs (k <= tokens < k+w-1) keep their single best kgram so no
      // shingleable doc is fingerprint-less
      .filter(col("pos") <= greatest(col("nk") - w + 1, lit(1)))
      .select(col("doc_id"), col("sel.pos").as("pos"), col("sel.h").as("fp"))
      .distinct()
  }

  /** (doc_a, doc_b, n_shared): MOSS-style OVERLAP PAIRS — document
    * pairs sharing at least `minShared` winnowing fingerprints, the
    * plagiarism/citation-overlap detector built on [[winnowing]]'s
    * guaranteed-coverage selection (any shared run ≥ w+k−1 tokens
    * surfaces at least one shared fingerprint, so the join can't miss
    * long overlaps the way random sampling can). Fingerprints shared
    * by more than `dfCap` documents are boilerplate and excluded
    * BEFORE the self-join — the same df-cap discipline as record
    * linkage: bucket sizes stay bounded at any catalog size. */
  def winnowingPairs(docs: DataFrame, k: Int = 3, w: Int = 4,
                     dfCap: Int = 100, minShared: Int = 3): DataFrame = {
    require(dfCap >= 2 && minShared >= 1,
      s"need dfCap >= 2, minShared >= 1; got $dfCap, $minShared")
    val fps = winnowing(docs, k, w).select("doc_id", "fp").distinct()
    val rare = fps.groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap).select("fp")
    val kept = fps.join(rare, Seq("fp"), "left_semi").cutLineage()
    kept.as("a").join(kept.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** (doc_id, lang, ppl, bucket): CCNet-style perplexity bucketing
    * (Wenzek et al. 2020) — every document lands in its language's
    * head/middle/tail perplexity tertile, the standard quality
    * stratification before mixing web data into a training corpus.
    * The tertile CUTS are exact order statistics computed without a
    * per-language global sort: (lang, ppl) collapse to value rows with
    * counts, the cross-bucket running count rides bounded
    * explode-contributions over integer ppl buckets, and the
    * within-bucket prefix is a window partitioned by (lang, bucket) —
    * the same bucket-split exact-percentile shape as
    * [[Relational.weightedPercentiles]]. cut = min(ppl | 3·cum ≥ m·tot)
    * in exact integer-count arithmetic over the ROUNDED ppl (both
    * engines see identical doubles, so grouping and comparison agree
    * bit-for-bit). */
  def ccnetBuckets(docs: DataFrame, bucketWidth: Long = 100L): DataFrame = {
    val pp = docPerplexity(docs)
      .join(docs.select("doc_id", "lang"), "doc_id")
      .select(col("doc_id"), col("lang"), col("ppl"))
    val gv = pp.groupBy("lang", "ppl").agg(count(lit(1)).as("n"))
      .withColumn("b", expr(s"CAST(floor(ppl) AS BIGINT) div $bucketWidth"))
    val bsum = gv.groupBy("lang", "b").agg(sum("n").as("bn"))
    val maxB = bsum.groupBy("lang").agg(max("b").as("maxb"))
    val off = bsum.join(maxB, "lang")
      .filter(col("b") < col("maxb"))
      .select(col("lang"), explode(sequence(col("b") + 1, col("maxb"))).as("b"),
        col("bn").as("c"))
      .groupBy("lang", "b").agg(sum("c").as("off"))
    val tot = bsum.groupBy("lang").agg(sum("bn").as("tot"))
    val wIn = Window.partitionBy("lang", "b").orderBy("ppl")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cuts = gv.withColumn("cin", sum("n").over(wIn))
      .join(off, Seq("lang", "b"), "left")
      .join(tot, "lang")
      .withColumn("cum", coalesce(col("off"), lit(0L)) + col("cin"))
      .groupBy("lang")
      .agg(min(when(col("cum") * 3 >= col("tot"), col("ppl"))).as("p33"),
        min(when(col("cum") * 3 >= col("tot") * 2, col("ppl"))).as("p66"))
    pp.join(broadcast(cuts), "lang")
      .select(col("doc_id"), col("lang"), col("ppl"),
        when(col("ppl") <= col("p33"), "head")
          .when(col("ppl") <= col("p66"), "middle")
          .otherwise("tail").as("bucket"))
  }

  /** (band, n_docs, n_dup, dup_rate, lift): QUALITY-vs-DUPLICATION
    * calibration — does the cheap quality heuristic actually separate
    * duplicated content? Documents band by lexical-diversity score
    * (floor(distinct_ratio·10), fixed-width bands — no global ranking
    * at any scale), each band reports its exact-duplicate incidence
    * and the lift over the corpus-wide rate. A lift ramp across bands
    * is the evidence that score-thresholding removes duplication
    * pressure; a flat profile says the heuristic and the dedup signal
    * are orthogonal. Two hash aggregations and a broadcast scalar. */
  def qualityCalibration(docs: DataFrame): DataFrame = {
    val m = docs.groupBy(md5(col("text")).as("h")).agg(count(lit(1)).as("m"))
    val banded = docs
      .withColumn("toks", Text.rawTokens(col("text")))
      .withColumn("ratio", round(size(array_distinct(col("toks"))).cast("double") /
        size(col("toks")), 4))
      .select(col("doc_id"), md5(col("text")).as("h"),
        floor(col("ratio") * 10).cast("long").as("band"))
      .join(m, "h")
    val perBand = banded.groupBy("band")
      .agg(count(lit(1)).as("n_docs"), sum(when(col("m") > 1, 1L).otherwise(0L)).as("n_dup"))
    val overall = perBand.agg(sum("n_docs").as("tn"), sum("n_dup").as("td"))
    perBand.crossJoin(broadcast(overall))
      .select(col("band"), col("n_docs"), col("n_dup"),
        round(col("n_dup").cast("double") / col("n_docs"), 6).as("dup_rate"),
        // a dup-free corpus has no base rate to lift against — NULL,
        // not a divide-by-zero (ANSI) or infinity
        when(col("td") > 0,
          round((col("n_dup").cast("double") / col("n_docs")) /
            (col("td").cast("double") / col("tn")), 6)).as("lift"))
  }

  /** (probe_id, n_shingles, n_novel, novelty): N-GRAM NOVELTY of the
    * eval slice vs the training corpus — per probe doc, how many of
    * its distinct word 3-grams NEVER occur in any training document
    * (the memorization/contamination EVAL metric: a probe whose
    * n-grams are mostly non-novel is answerable by regurgitation; the
    * complement of [[contamination]], which flags the TRAINING side).
    * Probe split is the contamination convention (doc_id % 97). The
    * training side collapses to DISTINCT shingle hashes once (one
    * corpus-token-scaled aggregation); probes anti-join it on the
    * hash — probe-sized rows through the join, no text movement.
    * Probes under 3 tokens have no shingles and do not appear. */
  def ngramNovelty(docs: DataFrame): DataFrame = {
    val probes = docs.filter(col("doc_id") % 97 === 0)
    val train = docs.filter(col("doc_id") % 97 =!= 0)
    val psh = Dedup.shingles(probes)
      .select(col("doc_id").as("probe_id"), md5(col("shingle")).as("h"))
    val tsh = Dedup.shingles(train).select(md5(col("shingle")).as("h")).distinct()
    val sizes = psh.groupBy("probe_id").agg(count(lit(1)).as("n_shingles"))
    val novel = psh.join(tsh, Seq("h"), "left_anti")
      .groupBy("probe_id").agg(count(lit(1)).as("n_novel"))
    sizes.join(novel, Seq("probe_id"), "left")
      .select(col("probe_id"), col("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        round(coalesce(col("n_novel"), lit(0L)).cast("double") /
          col("n_shingles"), 6).as("novelty"))
  }

  /** (source, n_docs, n_chars, n_emails, n_longnums, pii_per_10k):
    * PII AUDIT rolled up per ingestion source — total counts of the
    * two [[redact]] pattern families (emails, ≥7-digit number runs)
    * and their density per 10k chars: the release-gate dashboard that
    * decides which sources need scrubbing BEFORE training. Counting
    * is a pure map (regexp_extract_all size per doc); one
    * source-cardinality aggregation. */
  def piiAudit(docs: DataFrame): DataFrame =
    docs
      .withColumn("ne", size(regexp_extract_all(col("text"),
        lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"), lit(0))).cast("long"))
      .withColumn("nn", size(regexp_extract_all(col("text"),
        lit("[0-9]{7,}"), lit(0))).cast("long"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).cast("long").as("n_chars"),
        sum(col("ne")).as("n_emails"),
        sum(col("nn")).as("n_longnums"))
      .select(col("source"), col("n_docs"), col("n_chars"),
        col("n_emails"), col("n_longnums"),
        when(col("n_chars") > 0,
          round((col("n_emails") + col("n_longnums")).cast("double") *
            10000.0 / col("n_chars"), 6)).as("pii_per_10k"))

  /** The default blocklist for [[blocklistScreen]] — a deterministic
    * stand-in for a production badword list (C4 ships ~400 terms; the
    * MECHANISM — any-hit flagging + per-source rate — is what the
    * operator owns, the list is configuration). */
  val DefaultBlocklist: Seq[String] = Seq("slow", "broken", "spam")

  /** (source, n_docs, n_flagged, total_hits, flag_rate): BLOCKLIST
    * SCREEN per ingestion source — the C4-style cleaning rule (a doc
    * with ANY blocklist token is flagged) rolled up to the per-source
    * removal-rate dashboard. Hit counting is a pure per-row map: the
    * blocklist rides as an array LITERAL into a higher-order filter
    * over the raw token array (no explode, no join, no shuffle before
    * the one source-cardinality aggregation) — at 100 TB this is a
    * single scan with a codegen'd lambda. */
  def blocklistScreen(docs: DataFrame,
                      blocklist: Seq[String] = DefaultBlocklist): DataFrame = {
    val bl = array(blocklist.map(lit): _*)
    docs
      .withColumn("hits", size(filter(graft.functions.Text.rawTokens(col("text")),
        w => array_contains(bl, w))).cast("long"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("hits") >= 1, 1L).otherwise(0L)).as("n_flagged"),
        sum(col("hits")).as("total_hits"))
      .select(col("source"), col("n_docs"), col("n_flagged"), col("total_hits"),
        round(col("n_flagged").cast("double") / col("n_docs"), 6).as("flag_rate"))
  }

  /** (vocab_size, covered_tokens, total_tokens, oov_rate): OOV-RATE
    * CURVE across a vocabulary-size grid — the fraction of kept-token
    * OCCURRENCES falling outside the top-`N`-by-count vocabulary, for
    * each N of the grid (the tokenizer-budget question: how big must
    * the vocab be before <x% of the stream is UNK). ONE corpus term
    * aggregation serves the whole curve: the top-max(N) ranking is the
    * window-free [[TopK.rankedTopN]] (no global window chokepoint),
    * and every grid point is a cumulative sum over those ≤ max(N)
    * rows crossed with the literal grid — grid cost never touches the
    * corpus. Vocabularies smaller than N report oov 0. */
  def oovCurve(docs: DataFrame, grid: Seq[Int] = Seq(5, 10, 20, 40)): DataFrame = {
    require(grid.nonEmpty && grid.forall(_ >= 1), s"bad vocab grid: $grid")
    import docs.sparkSession.implicits._
    val tc = Bm25.tf(docs).groupBy("term").agg(sum("tf").as("cnt"))
    val total = tc.agg(sum("cnt").as("total_tokens"))
    val ranked = TopK.rankedTopN(tc, "cnt", "term", grid.max)
    val gridDf = grid.toDF("n")
    val covered = ranked.crossJoin(broadcast(gridDf))
      .filter(col("rk") <= col("n"))
      .groupBy("n").agg(sum("cnt").as("covered_tokens"))
    gridDf.join(covered, Seq("n"), "left")
      .crossJoin(broadcast(total))
      .select(col("n").cast("long").as("vocab_size"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        col("total_tokens"),
        round(lit(1.0) - coalesce(col("covered_tokens"), lit(0L)).cast("double") /
          col("total_tokens"), 6).as("oov_rate"))
  }

  /** (source, n_shingles, n_distinct, ttr): per-source N-GRAM
    * TYPE-TOKEN RATIO — distinct word-3-grams over total per-doc-
    * distinct occurrences: the diversity-collapse metric (a source
    * whose ttr craters is templated/boilerplate even when no two docs
    * are near-dups). The "total" side counts each shingle once per
    * DOC ([[Dedup.shingles]] is per-doc distinct), so within-doc
    * repetition — a different signal, [[gopherRepetition]]'s — cannot
    * deflate the ratio. Two source-cardinality aggregations over the
    * shingle relation. */
  def sourceDiversity(docs: DataFrame): DataFrame = {
    val sh = Dedup.shingles(docs)
      .join(docs.select("doc_id", "source"), "doc_id")
      .select(col("source"), md5(col("shingle")).as("h"))
    val tot = sh.groupBy("source").agg(count(lit(1)).as("n_shingles"))
    val dst = sh.distinct().groupBy("source").agg(count(lit(1)).as("n_distinct"))
    tot.join(dst, Seq("source"))
      .select(col("source"), col("n_shingles"), col("n_distinct"),
        round(col("n_distinct").cast("double") / col("n_shingles"), 6).as("ttr"))
  }

  /** (source_a, source_b, n_a, n_b, inter, jaccard): SOURCE-PAIR
    * VOCABULARY OVERLAP — exact Jaccard between the distinct word-
    * 3-gram shingle sets of every ingestion-source pair (which crawls
    * are near-copies of each other vs genuinely disjoint: the
    * source-level view the doc-level cross-source dup matrix can't
    * give when duplication is diffuse). Shingle sets collapse to
    * (source, hash) DISTINCT once (corpus-token-scaled); the
    * intersection is a hash equi-join between source-tagged shingle
    * relations (shingle-scaled, never doc-pairwise); the source-pair
    * frame is a tiny broadcast cross of per-source sizes, so
    * zero-overlap pairs still report. */
  def sourceJaccard(docs: DataFrame): DataFrame = {
    val sh = Dedup.shingles(docs)
      .join(docs.select("doc_id", "source"), "doc_id")
      .select(col("source"), md5(col("shingle")).as("h"))
      .distinct()
    val sizes = sh.groupBy("source").agg(count(lit(1)).as("n"))
    val inter = sh.as("x").join(sh.as("y"),
        col("x.h") === col("y.h") && col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("source_a"), col("y.source").as("source_b"))
      .agg(count(lit(1)).as("inter"))
    val frame = sizes.as("sa").join(sizes.as("sb"),
        col("sa.source") < col("sb.source"))
      .select(col("sa.source").as("source_a"), col("sb.source").as("source_b"),
        col("sa.n").as("n_a"), col("sb.n").as("n_b"))
    frame.join(inter, Seq("source_a", "source_b"), "left")
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        coalesce(col("inter"), lit(0L)).as("inter"),
        round(coalesce(col("inter"), lit(0L)).cast("double") /
          (col("n_a") + col("n_b") - coalesce(col("inter"), lit(0L))), 6)
          .as("jaccard"))
  }

  /** (source_a, source_b, n_shared_terms, jsd): pairwise JENSEN-
    * SHANNON divergence between per-source unigram distributions —
    * the symmetric, bounded ([0, ln 2]) distribution distance for the
    * mix dashboard (vocabulary-overlap Jaccard says WHICH terms are
    * shared; JSD says whether they're used at the same RATES). Terms
    * present in only one side contribute p·ln2 in closed form via the
    * shared-mass complement, so only the SHARED vocabulary is ever
    * joined — the pair join is term-keyed and source-pair-fanout
    * bounded (|sources|² pairs per hot term, sources are dozens). */
  def jsDivergence(docs: DataFrame): DataFrame = {
    val tf = docs.select(col("source"), explode(Text.rawTokens(col("text"))).as("term"))
      .filter(Text.keepToken(col("term")))
      .groupBy("source", "term").agg(count(lit(1)).as("tf"))
    val tot = tf.groupBy("source").agg(sum("tf").as("tot"))
    val p = tf.join(tot, "source")
      .select(col("source"), col("term"), (col("tf").cast("double") / col("tot")).as("p"))
    val shared = p.as("a").join(p.as("b"),
        col("a.term") === col("b.term") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared_terms"),
        sum(lit(0.5) * col("a.p") * log(lit(2.0) * col("a.p") / (col("a.p") + col("b.p"))) +
          lit(0.5) * col("b.p") * log(lit(2.0) * col("b.p") / (col("a.p") + col("b.p"))))
          .as("shared_term"),
        sum(col("a.p")).as("pa_shared"), sum(col("b.p")).as("pb_shared"))
    shared.select(col("source_a"), col("source_b"), col("n_shared_terms"),
      round(col("shared_term") +
        lit(0.5) * (lit(1.0) - col("pa_shared")) * log(lit(2.0)) +
        lit(0.5) * (lit(1.0) - col("pb_shared")) * log(lit(2.0)), 6).as("jsd"))
  }

  /** (term, df, mean_tf, fano): TERM BURSTINESS — for every term seen
    * in at least `minDf` docs, the mean within-document frequency and
    * the Fano factor (variance/mean over containing docs): bursty
    * content words repeat hard where they appear (fano ≫ 1), function
    * words sprinkle evenly (fano ≈ depressed) — the Church–Gale
    * screen that separates topical vocabulary from boilerplate
    * residue. Sums fold per term from exact tf integers (squares in
    * double — BIGINT would overflow at warehouse scale); top-k under
    * the rounded score with term tiebreak. */
  def burstiness(docs: DataFrame, minDf: Long = 5, topK: Int = 15): DataFrame = {
    val tf = docs.select(col("doc_id"), explode(Text.rawTokens(col("text"))).as("term"))
      .filter(Text.keepToken(col("term")))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    tf.groupBy("term")
      .agg(count(lit(1)).as("df"),
        sum(col("tf").cast("double")).as("s1"),
        sum(col("tf").cast("double") * col("tf")).as("s2"))
      .filter(col("df") >= minDf)
      .select(col("term"), col("df"),
        round(col("s1") / col("df"), 6).as("mean_tf"),
        round(((col("s2") - col("s1") * col("s1") / col("df")) / (col("df") - 1)) /
          (col("s1") / col("df")), 6).as("fano"))
      .orderBy(col("fano").desc, col("term").asc)
      .limit(topK)
  }

  /** (doc_a, doc_b, overlap, len_a, len_b, rouge1_f): ROUGE-1 F1
    * between the texts of each verified near-dup pair — the clipped
    * unigram-overlap score (Σ_term min(tf_a, tf_b), the summarization-
    * eval standard) that grades HOW textually close each surviving
    * pair is, beyond the shingle-Jaccard that surfaced it. The join is
    * PAIR-DRIVEN (pairs → tf(doc_a) → tf(doc_b) on (doc_b, term)), so
    * cost is Σ_pairs |terms(doc_a)| — candidate-scaled, never
    * co-token-quadratic (the DedupStore verify-join shape). */
  def rouge1Pairs(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(Text.rawTokens(col("text"))).as("term"))
      .filter(Text.keepToken(col("term")))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val ov = pairs.select("doc_a", "doc_b")
      .join(tf.select(col("doc_id").as("doc_a"), col("term"), col("tf").as("tfa")),
        Seq("doc_a"))
      .join(tf.select(col("doc_id").as("doc_b"), col("term"), col("tf").as("tfb")),
        Seq("doc_b", "term"))
      .groupBy("doc_a", "doc_b")
      .agg(sum(least(col("tfa"), col("tfb"))).as("overlap"))
    ov
      .join(dl.select(col("doc_id").as("doc_a"), col("dl").as("len_a")), "doc_a")
      .join(dl.select(col("doc_id").as("doc_b"), col("dl").as("len_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("overlap"), col("len_a"), col("len_b"),
        round(lit(2.0) * col("overlap") / (col("len_a") + col("len_b")), 6)
          .as("rouge1_f"))
  }

  /** (doc_a, doc_b, clip1, clip2, len_a, len_b, bleu): BLEU-2 over
    * the verified near-dup pairs — the PRECISION-side twin of
    * [[rouge1Pairs]] (ROUGE asks how much of BOTH docs the overlap
    * covers; BLEU asks how much of the CANDIDATE is licensed by the
    * reference, with the brevity penalty closing the
    * short-candidate loophole). Convention: doc_b is the candidate,
    * doc_a the reference (the canonical pair order puts the earlier
    * doc first). Clipped n-gram matches (n = 1, 2 over the
    * kept-token SEQUENCE — order preserved, so bigrams see the real
    * adjacency) are exact BIGINTs; BLEU = BP · exp(½·ln p₁ + ½·ln p₂)
    * with BP = 1 if len_b > len_a else exp(1 − len_a/len_b), zero
    * whenever any clip or total is zero (log-undefined ⇒ the
    * standard BLEU = 0), round(·,6) last — the exp/ln live on
    * single scalars per pair, sub-ulp across engines at 6 decimals.
    *
    * Plan shape: pair-driven like [[rouge1Pairs]] — two corpus
    * passes build the (doc, n, gram, count) relation (unigrams +
    * adjacent bigrams), every later join is keyed by the pair
    * relation; the pair×{1,2} grid left-joins so a bigram-disjoint
    * pair scores 0 instead of vanishing. */
  def bleuPairs(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val tk = docs.select(col("doc_id"),
      filter(Text.rawTokens(col("text")), t => Text.keepToken(t)).as("t2"))
    val uni = tk.select(col("doc_id"), explode(col("t2")).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .withColumn("n", lit(1L))
    val bi = tk.select(col("doc_id"), explode(expr(
        "CASE WHEN size(t2) >= 2 THEN transform(sequence(1, size(t2) - 1), " +
          "i -> concat(element_at(t2, i), ' ', element_at(t2, i + 1))) " +
          "ELSE array() END")).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .withColumn("n", lit(2L))
    val grams = uni.unionByName(bi)
    val tot = grams.groupBy("doc_id", "n").agg(sum("c").as("tot"))
    val pv = pairs.select("doc_a", "doc_b")
    val clip = pv
      .join(grams.select(col("doc_id").as("doc_a"), col("n"), col("g"),
        col("c").as("ca")), Seq("doc_a"))
      .join(grams.select(col("doc_id").as("doc_b"), col("n"), col("g"),
        col("c").as("cb")), Seq("doc_b", "n", "g"))
      .groupBy("doc_a", "doc_b", "n")
      .agg(sum(least(col("ca"), col("cb"))).as("clip"))
    val grid = pv.select(col("doc_a"), col("doc_b"),
      explode(array(lit(1L), lit(2L))).as("n"))
    val f = grid
      .join(clip, Seq("doc_a", "doc_b", "n"), "left")
      .join(tot.select(col("doc_id").as("doc_b"), col("n"),
        col("tot").as("tot_b")), Seq("doc_b", "n"), "left")
      .groupBy("doc_a", "doc_b")
      .agg(sum(when(col("n") === 1, coalesce(col("clip"), lit(0L)))
        .otherwise(0L)).as("clip1"),
        sum(when(col("n") === 2, coalesce(col("clip"), lit(0L)))
          .otherwise(0L)).as("clip2"),
        sum(when(col("n") === 1, coalesce(col("tot_b"), lit(0L)))
          .otherwise(0L)).as("tot1_b"),
        sum(when(col("n") === 2, coalesce(col("tot_b"), lit(0L)))
          .otherwise(0L)).as("tot2_b"))
    f.join(tot.filter(col("n") === 1)
        .select(col("doc_id").as("doc_a"), col("tot").as("len_a")),
        Seq("doc_a"), "left")
      .select(col("doc_a"), col("doc_b"), col("clip1"), col("clip2"),
        coalesce(col("len_a"), lit(0L)).as("len_a"),
        col("tot1_b").as("len_b"),
        expr("CASE WHEN clip1 = 0 OR clip2 = 0 OR tot1_b = 0 OR tot2_b = 0 " +
          "THEN 0.0 ELSE round(" +
          "(CASE WHEN tot1_b > coalesce(len_a, 0) THEN 1.0 " +
          "ELSE exp(1.0 - CAST(coalesce(len_a, 0) AS DOUBLE) / tot1_b) END) * " +
          "exp(0.5 * ln(CAST(clip1 AS DOUBLE) / tot1_b) + " +
          "0.5 * ln(CAST(clip2 AS DOUBLE) / tot2_b)), 6) END").as("bleu"))
  }

  /** (doc_a, doc_b, chrp, chrr, chrf): chrF (Popović 2015) over the
    * verified near-dup pairs — the CHARACTER-level member completing
    * the MT-metric trio ([[rouge1Pairs]] recall-side tokens,
    * [[bleuPairs]] precision-side tokens; chrF is the
    * tokenization-free one that survives morphology/spelling variants
    * whole-word metrics miss, which on a dedup review queue is
    * exactly the near-miss signal). Contract, stated precisely:
    * characters are the lowercased text with spaces removed; char
    * n-grams for n = 1..6 with CLIPPED multiset matches (exact
    * BIGINTs, the BLEU clip discipline); chrP/chrR macro-average the
    * per-n precisions/recalls over ALL six n (an n with an empty
    * denominator contributes 0 — a defined simplification of the
    * skip-empty variant, stated here so the number is reproducible);
    * chrF = 5·P·R/(4·P + R) (β = 2, recall-weighted), 0 when P+R = 0.
    * Engine parity: the six per-n terms fold in ASCENDING n through
    * one sorted-array aggregate (the ordered-fold contract), so the
    * FP average is bit-identical in both engines. Plan shape:
    * pair-driven like BLEU — one corpus pass builds the six-gram
    * relation, every later join is keyed by the pair relation. */
  def chrfPairs(docs: DataFrame, pairs: DataFrame, maxN: Int = 6): DataFrame = {
    val ch = docs.select(col("doc_id"),
      regexp_replace(lower(col("text")), " ", "").as("s"))
    val grams = (1 to maxN).map { n =>
      ch.select(col("doc_id"), explode(expr(
          s"CASE WHEN length(s) >= $n THEN transform(sequence(1, length(s) - $n + 1), " +
            s"i -> substring(s, CAST(i AS INT), $n)) ELSE array() END")).as("g"))
        .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .withColumn("n", lit(n.toLong))
    }.reduce(_ unionByName _)
    val tot = grams.groupBy("doc_id", "n").agg(sum("c").as("tot"))
    val pv = pairs.select("doc_a", "doc_b")
    val clip = pv
      .join(grams.select(col("doc_id").as("doc_a"), col("n"), col("g"),
        col("c").as("ca")), Seq("doc_a"))
      .join(grams.select(col("doc_id").as("doc_b"), col("n"), col("g"),
        col("c").as("cb")), Seq("doc_b", "n", "g"))
      .groupBy("doc_a", "doc_b", "n")
      .agg(sum(least(col("ca"), col("cb"))).as("clip"))
    val grid = pv.select(col("doc_a"), col("doc_b"),
      explode(array((1 to maxN).map(n => lit(n.toLong)): _*)).as("n"))
    val perN = grid
      .join(clip, Seq("doc_a", "doc_b", "n"), "left")
      .join(tot.select(col("doc_id").as("doc_a"), col("n"),
        col("tot").as("tot_a")), Seq("doc_a", "n"), "left")
      .join(tot.select(col("doc_id").as("doc_b"), col("n"),
        col("tot").as("tot_b")), Seq("doc_b", "n"), "left")
      .select(col("doc_a"), col("doc_b"), col("n"),
        coalesce(col("clip"), lit(0L)).as("clip"),
        coalesce(col("tot_a"), lit(0L)).as("tot_a"),
        coalesce(col("tot_b"), lit(0L)).as("tot_b"))
      .select(col("doc_a"), col("doc_b"), col("n"),
        expr("CASE WHEN tot_b = 0 THEN 0.0 ELSE CAST(clip AS DOUBLE) / tot_b END").as("pn"),
        expr("CASE WHEN tot_a = 0 THEN 0.0 ELSE CAST(clip AS DOUBLE) / tot_a END").as("rn"))
    perN.groupBy("doc_a", "doc_b")
      .agg(sort_array(collect_list(struct(col("n"), col("pn"), col("rn")))).as("arr"))
      .select(col("doc_a"), col("doc_b"),
        expr(s"aggregate(arr, CAST(0.0 AS DOUBLE), (a, x) -> a + x.pn) / $maxN.0").as("p_raw"),
        expr(s"aggregate(arr, CAST(0.0 AS DOUBLE), (a, x) -> a + x.rn) / $maxN.0").as("r_raw"))
      .select(col("doc_a"), col("doc_b"),
        round(col("p_raw"), 6).as("chrp"), round(col("r_raw"), 6).as("chrr"),
        expr("CASE WHEN p_raw + r_raw = 0.0 THEN 0.0 " +
          "ELSE round(5.0 * p_raw * r_raw / (4.0 * p_raw + r_raw), 6) END").as("chrf"))
  }

  /** (bin, n_ref, n_cur, p_ref, p_cur, psi_term): POPULATION STABILITY
    * INDEX of the distinct-token-ratio distribution between the even-
    * and odd-id halves of the corpus (the old-crawl / new-crawl drift
    * monitor at ingest granularity): ten fixed-width score bins,
    * add-one smoothing so empty bins stay finite, per-bin
    * (p_cur − p_ref)·ln(p_cur/p_ref) terms whose sum is the PSI. The
    * ratio is a single exact-integer division, so binning is engine-
    * portable; everything after the per-doc map is bins-sized. */
  def psiDistinctRatio(docs: DataFrame, bins: Int = 10): DataFrame = {
    val scored = docs
      .withColumn("toks", Text.rawTokens(col("text")))
      .select((col("doc_id") % 2).as("half"),
        least(floor(size(array_distinct(col("toks"))).cast("double") /
          size(col("toks")) * bins).cast("long"), lit(bins - 1L)).as("bin"))
    val counts = scored.groupBy("bin")
      .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).as("n_ref"),
        sum(when(col("half") === 1, 1L).otherwise(0L)).as("n_cur"))
    val grid = docs.sparkSession.range(0, bins).select(col("id").as("bin"))
    val totals = counts.agg(sum("n_ref").as("tr"), sum("n_cur").as("tc"))
    grid.join(counts, Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
      .crossJoin(broadcast(totals))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        round((col("n_ref") + 1).cast("double") / (col("tr") + bins), 6).as("p_ref"),
        round((col("n_cur") + 1).cast("double") / (col("tc") + bins), 6).as("p_cur"),
        round(((col("n_cur") + 1).cast("double") / (col("tc") + bins) -
            (col("n_ref") + 1).cast("double") / (col("tr") + bins)) *
          log(((col("n_cur") + 1).cast("double") / (col("tc") + bins)) /
            ((col("n_ref") + 1).cast("double") / (col("tr") + bins))), 6)
          .as("psi_term"))
  }

  /** (source, n_docs, mean_len, sd_len, skewness, kurtosis): LENGTH
    * DISTRIBUTION MOMENTS per source — mean, standard deviation,
    * skewness (m₃/m₂^1.5) and excess kurtosis (m₄/m₂² − 3) of the
    * character-length distribution, the one-look shape profile that
    * separates natural corpora (right-skewed, heavy tail) from
    * truncated or templated ones (symmetric, platykurtic). Explicit
    * central-moment formula from raw power sums so BOTH engines run
    * the same arithmetic (built-in skewness/kurtosis disagree on
    * sample-bias conventions across engines); power sums fold in
    * double — per-source magnitudes keep the round-6 output stable. */
  def lengthMoments(docs: DataFrame): DataFrame = {
    val x = col("n_chars").cast("double")
    docs.groupBy("source")
      .agg(count(lit(1)).as("n"), sum(x).as("s1"), sum(x * x).as("s2"),
        sum(x * x * x).as("s3"), sum(x * x * x * x).as("s4"))
      .select(col("source"), col("n").as("n_docs"),
        round(col("s1") / col("n"), 6).as("mean_len"),
        round(sqrt(col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n"))), 6)
          .as("sd_len"),
        // m2^1.5 as m2·sqrt(m2): sqrt is IEEE-correctly-rounded in
        // every engine, pow is not — the only bit-portable spelling
        round(mom3(col("n"), col("s1"), col("s2"), col("s3")) /
          (mom2(col("n"), col("s1"), col("s2")) *
            sqrt(mom2(col("n"), col("s1"), col("s2")))), 6).as("skewness"),
        round(mom4(col("n"), col("s1"), col("s2"), col("s3"), col("s4")) /
          (mom2(col("n"), col("s1"), col("s2")) * mom2(col("n"), col("s1"), col("s2"))) -
          lit(3.0), 6).as("kurtosis"))
  }

  // central moments from raw power sums: m2 = s2/n − μ², m3 = s3/n −
  // 3μ·s2/n + 2μ³, m4 = s4/n − 4μ·s3/n + 6μ²·s2/n − 3μ⁴ (population
  // convention, no bias correction — the engine-portable choice)
  private def mu(n: Column, s1: Column) = s1 / n
  private def mom2(n: Column, s1: Column, s2: Column) =
    s2 / n - mu(n, s1) * mu(n, s1)
  private def mom3(n: Column, s1: Column, s2: Column, s3: Column) = {
    val m = mu(n, s1)
    s3 / n - lit(3.0) * m * (s2 / n) + lit(2.0) * m * m * m
  }
  private def mom4(n: Column, s1: Column, s2: Column, s3: Column, s4: Column) = {
    val m = mu(n, s1)
    s4 / n - lit(4.0) * m * (s3 / n) + lit(6.0) * m * m * (s2 / n) -
      lit(3.0) * m * m * m * m
  }

  /** (source, n_tokens, n_types, n_hapax, ttr, hapax_rate): LEXICAL
    * RICHNESS profile per source — type-token ratio and hapax-legomena
    * rate, the two classic vocabulary-health stats (machine-generated
    * or templated corpora crater both; a healthy natural-language
    * source keeps a long hapax tail). Tokenization is the library
    * standard ([[graft.functions.Text.rawTokens]] + keepToken). One
    * shuffle on (source, term) with map-side combine, then a
    * sources-sized rollup — the Heaps-law shape at aggregate
    * granularity. */
  def lexicalRichness(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("source"), explode(Text.rawTokens(col("text"))).as("term"))
      .filter(Text.keepToken(col("term")))
    tok.groupBy("source", "term").agg(count(lit(1)).as("c"))
      .groupBy("source")
      .agg(sum("c").as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("source"), col("n_tokens"), col("n_types"), col("n_hapax"),
        round(col("n_types").cast("double") / col("n_tokens"), 6).as("ttr"),
        round(col("n_hapax").cast("double") / col("n_types"), 6).as("hapax_rate"))
  }

  /** (source, n_docs, min_chars, median_chars, max_chars): the
    * per-source LENGTH PROFILE — the one-look distribution summary
    * behind length-based quality gates (a source whose median
    * collapses is emitting stubs; one whose max explodes is emitting
    * concatenation artifacts). Median is the p=0.5 exact midpoint —
    * the one engine-portable quantile (SURVEY §6); other
    * percentiles stay with the sketch family. One source-cardinality
    * aggregation. */
  def sourceLengthProfile(docs: DataFrame): DataFrame =
    docs.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        min("n_chars").as("min_chars"),
        round(expr("percentile(n_chars, 0.5)"), 1).as("median_chars"),
        max("n_chars").as("max_chars"))
}
