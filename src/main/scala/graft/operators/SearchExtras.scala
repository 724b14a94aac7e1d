package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Search-serving extensions past the reference's Okapi surface: a
  * second classical ranking model (query-likelihood with Dirichlet
  * smoothing), result snippets/highlighting, prefix autocomplete, and
  * ranking-quality evaluation (NDCG) — the serving features a user of
  * a BM25 engine (reference BatchBM25PreMain.java / BMStream.java
  * scoring loop) reaches for next once ranked retrieval works.
  *
  * All operators compose [[Bm25]]'s tokenize/tf/docLengths so the
  * text pipeline (lowercase, space-split, stopword/length filter) has
  * exactly one definition on the Spark side and one mirrored CTE on
  * the oracle side.
  */
object SearchExtras {

  /** (doc_id, score): query-likelihood ranking with Dirichlet
    * smoothing (Zhai & Lafferty) — the standard LM alternative to
    * BM25. Over matched terms only, using the rank-equivalent
    * decomposition that never materializes (doc × absent-term) rows:
    *
    *   score(q,d) = Σ_{t∈q∩d} ln(1 + tf/(μ·cf_t/|C|)) + |q|·ln(μ/(dl+μ))
    *
    * cf_t = collection frequency, |C| = total corpus tokens. Same
    * plan shape as [[Bm25.bm25Score]]: query-term postings + one dl
    * aggregate; cf rides a window over the pruned postings (no third
    * corpus pass), corpus totals ride one broadcast. Docs matching no
    * query term are unscored, exactly like the BM25 routes. FP
    * association mirrors the oracle's textual form. */
  def lmDirichletScore(docs: DataFrame, queryTerms: Seq[String] = Bm25.QueryTerms,
                       mu: Double = 2000.0): DataFrame = {
    // the decomposition requires the matched-term sum and the |q|
    // penalty to range over the SAME term set: tf rows are per
    // DISTINCT term, so q must be deduped, and a term the tokenizer
    // can never produce would inflate only the penalty — reject it
    // loudly (same contract as phrase/boolean search)
    val terms = queryTerms.distinct
    val dropped = terms.filterNot(graft.functions.Text.producibleToken)
    require(dropped.isEmpty,
      s"query terms ${dropped.mkString("'", "', '", "'")} can never match: " +
        "stopword/min-length filtered, non-lowercase, or not a single token")
    val nq = terms.size.toDouble
    val tfq = Bm25.tf(docs).filter(col("term").isin(terms: _*))
    val dl = Bm25.docLengths(docs.filter(col("doc_id").isNotNull))
    val tot = dl.agg(sum(col("dl")).cast("double").as("total_tokens"))
    tfq
      .withColumn("cf", sum(col("tf")).over(Window.partitionBy("term")).cast("double"))
      .join(dl, "doc_id")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), col("dl"),
        log(lit(1.0) + col("tf") / (lit(mu) * col("cf") / col("total_tokens"))).as("c"))
      .groupBy("doc_id", "dl")
      .agg(round(sum(col("c")) + lit(nq) * log(lit(mu) / (col("dl") + lit(mu))), 4).as("score"))
      .select("doc_id", "score")
  }

  /** (doc_id, score): query-likelihood ranking under JELINEK-MERCER
    * smoothing — score = Σ_t log((1−λ)·tf_t/dl + λ·cf_t/|C|), the
    * fixed-interpolation sibling of [[lmDirichletScore]] (Zhai &
    * Lafferty 2001: JM favors verbose queries, Dirichlet short ones —
    * an engine serves both). Same decomposition trick: the
    * doc-independent background Σ_t log(λ·cf_t/|C|) is ONE broadcast
    * scalar and per-doc work ranges over matched postings only:
    * score = qconst + Σ_matched log(1 + (1−λ)·tf·|C| / (λ·cf·dl)).
    * Query terms absent from the corpus have no background probability
    * (cf = 0 would put −∞ in every score) and contribute nothing —
    * the oracle replays the same rule. Plan: query-term postings + one
    * dl aggregate + two broadcast scalars; no third corpus pass. */
  def lmJmScore(docs: DataFrame, queryTerms: Seq[String] = Bm25.QueryTerms,
                lambda: Double = 0.1): DataFrame = {
    val terms = queryTerms.distinct
    val dropped = terms.filterNot(graft.functions.Text.producibleToken)
    require(dropped.isEmpty,
      s"query terms ${dropped.mkString("'", "', '", "'")} can never match: " +
        "stopword/min-length filtered, non-lowercase, or not a single token")
    val oneMinus = 1.0 - lambda
    val tfq = Bm25.tf(docs).filter(col("term").isin(terms: _*))
    val dl = Bm25.docLengths(docs.filter(col("doc_id").isNotNull))
    val tot = dl.agg(sum(col("dl")).cast("double").as("total_tokens"))
    val qconst = tfq.groupBy("term").agg(sum("tf").cast("double").as("cf"))
      .crossJoin(broadcast(tot))
      .agg(sum(log(lit(lambda) * col("cf") / col("total_tokens"))).as("qc"))
    tfq
      .withColumn("cf", sum(col("tf")).over(Window.partitionBy("term")).cast("double"))
      .join(dl, "doc_id")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), col("dl"),
        log(lit(1.0) + (lit(oneMinus) * col("tf") * col("total_tokens")) /
          (lit(lambda) * col("cf") * col("dl"))).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("cs"))
      .crossJoin(broadcast(qconst))
      .select(col("doc_id"), round(col("cs") + col("qc"), 4).as("score"))
  }

  /** (doc_id, pos, snippet): result highlighting — for every document
    * matching ≥ 1 query term (case-insensitive substring), the 1-based
    * position of the EARLIEST match and a fixed window of the original
    * text around it. Pure map stage over the corpus (zero shuffles at
    * any scale); position arithmetic is identical in Spark and DuckDB
    * (both `locate`/`strpos` return 0 on miss → nullif, both `least`
    * skip NULLs, both substring by character). Terms are lowercased to
    * match the lowercased haystack (a mixed-case term would otherwise
    * never hit). Positions are computed on lower(text) and applied to
    * the original — exact whenever lowercasing is length-preserving,
    * which holds for ASCII and every common script (the İ/ẞ class of
    * length-changing mappings would shift the window by their delta). */
  def snippets(docs: DataFrame, queryTerms: Seq[String] = Bm25.QueryTerms,
               before: Int = 30, width: Int = 80): DataFrame = {
    require(queryTerms.nonEmpty, "snippets needs at least one query term")
    val hits = queryTerms.map(t =>
      nullif(locate(t.toLowerCase, lower(col("text"))), lit(0)))
    // least() requires arity > 1; a single-term query is its own min
    val firstPos = if (hits.size == 1) hits.head else least(hits: _*)
    docs.select(col("doc_id"), col("text"), firstPos.as("p"))
      .filter(col("p").isNotNull)
      .select(col("doc_id"), col("p").cast("long").as("pos"),
        col("text").substr(greatest(lit(1), col("p") - lit(before)), lit(width)).as("snippet"))
  }

  /** (prefix, term, n, rk): top-k query completions per 3-char prefix
    * ranked by corpus occurrence count — the search-box suggestion
    * index. One tokenize pass → per-term counts (map-side combined) →
    * per-prefix windowed top-k; at 100 TB the window runs on the
    * per-TERM aggregate (vocabulary-sized, not corpus-sized). */
  def autocomplete(docs: DataFrame, prefixLen: Int = 3, k: Int = 5): DataFrame = {
    val counts = Bm25.tokenize(docs)
      .filter(length(col("term")) >= prefixLen)
      .groupBy("term").agg(count(lit(1)).as("n"))
      .withColumn("prefix", col("term").substr(1, prefixLen))
    val w = Window.partitionBy("prefix").orderBy(col("n").desc, col("term").asc)
    counts.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("prefix"), col("term"), col("n"), col("rk").cast("long").as("rk"))
  }

  /** (doc_id, score): EXACT BM25 top-k via MaxScore-style upper-bound
    * pruning — identical rows to [[Bm25.searchTopN]] (shared oracle),
    * but the doc-length join + full Okapi evaluation run only over a
    * pruned candidate set:
    *
    *  1. ub(d) = Σ_{t∈q∩d} idf(t)·(k1+1) — an admissible per-doc bound
    *     (the tf-saturation factor is < k1+1 for every tf/dl), computed
    *     from the pruned postings alone, NO doclen join;
    *  2. exact-score the k highest-ub docs → θ = their minimum score
    *     (θ ≤ the true k-th best, since exact ≤ ub everywhere);
    *  3. exact-score only docs with ub ≥ θ — every true top-k doc
    *     satisfies this (its exact, hence its ub, is ≥ the true k-th
    *     best ≥ θ), so the final top-k is exact, not approximate.
    *
    * At scale this is the difference between joining doclen for every
    * doc matching ANY query term (common terms → huge posting lists)
    * and joining it for the few candidates that can still make the
    * top-k. */
  def maxScoreTopN(docs: DataFrame, queryTerms: Seq[String] = Bm25.QueryTerms,
                   k: Int = 10): DataFrame =
    maxScoreFrom(
      Bm25.tf(docs).filter(col("term").isin(queryTerms: _*)),
      Bm25.docLengths(docs.filter(col("doc_id").isNotNull)), k)

  /** The MaxScore prune/score core over an ALREADY-PRUNED postings
    * relation (term, doc_id, tf) + doc lengths — shared by the
    * corpus route above and the staged-index route
    * ([[Bm25Index.maxScoreTopN]]), so both return identical rows:
    * the bound arithmetic, θ seeding, slack and tie-breaks are
    * written once. Callers prune `tfq` to the query terms BEFORE
    * handing it over (a pushed-down scan predicate on the staged
    * postings; an isin filter on the corpus-derived tf). */
  def maxScoreFrom(tfq: DataFrame, dl: DataFrame, k: Int = 10): DataFrame = {
    val stats = dl.agg(count(col("doc_id")).as("n_docs"),
      avg(col("dl")).cast("double").as("avgdl"))
    val withDf = tfq.withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
    val ub = withDf.crossJoin(broadcast(stats))
      .select(col("doc_id"),
        (Bm25.robertsonIdf(col("df"), col("n_docs")) * lit(Bm25.K1 + 1.0)).as("u"))
      .groupBy("doc_id").agg(sum("u").as("ub"))
    // exact Okapi scoring of an arbitrary candidate set (doclen joins
    // only the candidates — the whole point of the prune)
    def exactScores(cand: DataFrame): DataFrame = withDf
      .join(cand.select("doc_id"), "doc_id", "left_semi")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        Bm25.okapiTerm(col("tf"), col("df"), col("dl"), col("avgdl"), col("n_docs")).as("c"))
      .groupBy("doc_id").agg(round(sum("c"), 4).as("score"))
    val seed = ub.orderBy(col("ub").desc, col("doc_id").asc).limit(k)
    val theta = exactScores(seed).agg(min("score").as("theta"))
    // -1e-4: exact scores are ROUNDED to 4 decimals before comparing
    // against the unrounded ub, and rounding can lift a score up to
    // 5e-5 above its true value — without the slack a doc sitting
    // exactly at its bound could be wrongly pruned
    val candidates = ub.crossJoin(broadcast(theta))
      .filter(col("ub") >= col("theta") - lit(1e-4))
    exactScores(candidates)
      .orderBy(col("score").desc, col("doc_id").asc).limit(k)
  }

  /** (doc_id): boolean retrieval — documents satisfying
    * (ALL `must` terms) AND (ANY `any` term) AND (NO `none` term) over
    * the kept-token set. The missing half of ranked retrieval: the
    * reference's index answers "score docs for these terms"; a search
    * UI also needs hard AND/OR/NOT filters. One tokenize pass pruned
    * to the query's terms BEFORE the per-doc aggregation, so only
    * query-term postings ever shuffle (same pruning contract as the
    * scoring routes); the aggregation key is doc_id — high
    * cardinality, even spread at any corpus size. NOT-semantics
    * subtlety: a doc with no kept query terms at all vanishes in the
    * pruned aggregation, which is correct — `must` is non-empty, so
    * such a doc can never match. */
  def booleanSearch(docs: DataFrame,
                    must: Seq[String] = Seq("spark", "query"),
                    any: Seq[String] = Seq("join", "merge"),
                    none: Seq[String] = Seq("slow")): DataFrame = {
    // dedupe: n_must counts DISTINCT matched terms, so a duplicated
    // must-term would make the must.size comparison unsatisfiable
    val (m, a, n) = (must.distinct, any.distinct, none.distinct)
    require(m.nonEmpty, "boolean search needs at least one must-term")
    // a term the tokenizer can never produce makes must/any silently
    // unsatisfiable and none silently vacuous — reject loudly (same
    // contract as phrase search)
    val dropped = (m ++ a ++ n).filterNot(graft.functions.Text.producibleToken)
    require(dropped.isEmpty,
      s"boolean terms ${dropped.mkString("'", "', '", "'")} can never match: " +
        "stopword/min-length filtered, non-lowercase, or not a single token")
    val all = m ++ a ++ n
    Bm25.tokenize(docs).filter(col("term").isin(all: _*))
      .groupBy("doc_id")
      .agg(
        countDistinct(when(col("term").isin(m: _*), col("term"))).as("n_must"),
        max(when(col("term").isin(a: _*), 1L).otherwise(0L)).as("has_any"),
        max(when(col("term").isin(n: _*), 1L).otherwise(0L)).as("has_none"))
      .filter(col("n_must") === m.size &&
        (if (a.isEmpty) lit(true) else col("has_any") === 1L) &&
        col("has_none") === 0L)
      .select("doc_id")
  }

  /** All strings reachable from column `name` by deleting up to
    * `maxDist` (≤ 2) characters, the term itself included. The SymSpell
    * candidate signature: lev(a, b) ≤ d implies an alignment whose
    * matched characters form a common subsequence reachable by ≤ d
    * deletes on EACH side (subs delete from both, ins/del from one), so
    * two strings within d edits always share a variant — the
    * neighborhood is a SOUND candidate filter, turning the edit-distance
    * join into an equi-join. (A first-char prune is NOT sound: a
    * substitution at position 0 — "jion"→"lion", dist 1 — changes the
    * first char.) */
  private def deleteNeighborhood(name: String, maxDist: Int): Column = {
    require(maxDist >= 0 && maxDist <= 2,
      s"delete-neighborhood signatures support maxDist 0..2, got $maxDist")
    val del1 =
      s"transform(sequence(1, length($name)), i -> " +
        s"concat(substring($name, 1, i-1), substring($name, i+1)))"
    val del2 =
      s"flatten(transform(sequence(1, length($name)-1), i -> " +
        s"transform(sequence(i+1, length($name)), j -> " +
        s"concat(substring($name, 1, i-1), substring($name, i+1, j-i-1), substring($name, j+1)))))"
    // sequence(1, 0) DESCENDS in Spark — guard every range to nonempty
    val parts = Seq(s"array($name)") ++
      (if (maxDist >= 1) Seq(s"if(length($name) >= 1, $del1, array())") else Nil) ++
      (if (maxDist >= 2) Seq(s"if(length($name) >= 2, $del2, array())") else Nil)
    expr(s"array_distinct(concat(${parts.mkString(", ")}))")
  }

  /** (q, suggestion, dist, n, rk): spell correction / did-you-mean —
    * top-k vocabulary terms within `maxDist` edits of each (possibly
    * misspelled) query term, ranked by (edit distance, corpus count
    * desc, term). Candidates come from a length band (|len(a)−len(b)|
    * ≤ d is a Levenshtein lower bound) plus a [[deleteNeighborhood]]
    * signature EQUI-join — the query side's variants are tiny and
    * broadcast, so the vocabulary streams through a hash join keyed on
    * the variant string instead of paying a nested-loop levenshtein
    * against every query; the exact edit distance then verifies
    * candidates only (candidate → verify, the repo-wide shape). The
    * corpus pass is still only the term-count aggregation, map-side
    * combined. */
  /** Synonym thesaurus — engine DATA, not code (the [[graft.functions
    * .Text.PosLexicon]] discipline): a real WordNet-scale table drops
    * in without changing the plan, because expansion is a broadcast
    * join, never a driver loop. Directed (term → expansion). */
  val Synonyms: Seq[(String, String)] = Seq(
    "fast" -> "quick", "fast" -> "slow", "query" -> "scan",
    "join" -> "merge", "agg" -> "group", "big" -> "small",
    "sort" -> "order", "stream" -> "batch")

  /** (query_id, doc_id, score, rk): SYNONYM-EXPANDED search — each
    * query's terms widen through the broadcast [[Synonyms]] relation
    * (original terms always kept), then the expanded term sets run
    * through the one-plan batch BM25 ([[Bm25.batchSearch]]), so recall
    * grows without touching the scoring contract. This is the query-
    * rewriting stage every production search front-end runs; the
    * engine's other rewriting primitive is [[spellCorrect]] (errors),
    * this one is vocabulary mismatch. Expansion work is query-table-
    * sized; the corpus sees exactly the batch-search plan. */
  def synonymSearch(docs: DataFrame, queries: DataFrame, k: Int = 10): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val syn = Synonyms.toDF("term", "syn")
    val qterms = queries
      .select(col("query_id"), explode(graft.functions.Text.rawTokens(col("qtext"))).as("term"))
      .filter(graft.functions.Text.keepToken(col("term")))
    val expanded = qterms
      .unionByName(qterms.join(broadcast(syn), "term")
        .select(col("query_id"), col("syn").as("term")))
    val rewritten = expanded.groupBy("query_id")
      .agg(array_join(array_sort(collect_set(col("term"))), " ").as("qtext"))
    Bm25.batchSearch(docs, rewritten, k)
  }

  /** (query_id, doc_id, chunk_id, score, rk): PASSAGE retrieval — the
    * batch BM25 ranking run at CHUNK granularity: documents split into
    * `chunkSize`-token windows ([[TextAnalysis.seqChunks]]'s chunking
    * contract) and each passage scored as its own retrieval unit (the
    * RAG-era granularity: a long doc's one relevant passage should
    * outrank a mediocre short doc, and the passage — not the doc — is
    * what a generator consumes). Passages key as doc_id·2¹⁶+chunk_id
    * through the shared scoring stage (decoded on output; documents
    * beyond 2¹⁶ chunks ≈ 1M words at the default width are out of
    * contract — split upstream). Plan shape is EXACTLY
    * [[Bm25.batchSearch]] over the chunk relation: chunking is a pure
    * map stage (explode + slice), the corpus pays the same two passes,
    * and k passages per query come from the same bounded rank. */
  def passageSearch(docs: DataFrame, queries: DataFrame,
                    chunkSize: Int = 16, k: Int = 10): DataFrame = {
    val passages = docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), split(col("text"), " ").as("words"))
      .select(col("doc_id"),
        explode(expr(s"sequence(0, (size(words) - 1) div $chunkSize)")).as("chunk_id"),
        col("words"))
      .select((col("doc_id") * 65536L + col("chunk_id")).as("doc_id"),
        concat_ws(" ",
          slice(col("words"), col("chunk_id") * chunkSize + 1, lit(chunkSize)))
          .as("text"))
    Bm25.batchSearch(passages, queries, k)
      .select(col("query_id"), expr("doc_id div 65536").as("doc_id"),
        (col("doc_id") % 65536L).as("chunk_id"), col("score"), col("rk"))
  }

  def spellCorrect(docs: DataFrame,
                   queries: Seq[String] = Seq("qery", "jion", "streem", "windoow"),
                   maxDist: Int = 2, k: Int = 3): DataFrame = {
    val vocab = Bm25.tokenize(docs).groupBy("term").agg(count(lit(1)).as("n"))
    val spark = docs.sparkSession
    // the vocabulary is all-lowercase (rawTokens lowercases), so a
    // capitalized typo would pay a spurious case-substitution edit —
    // normalize queries to the vocabulary's case before the join
    val qNorm = queries.map(_.toLowerCase).distinct
    require(qNorm.nonEmpty, "spellCorrect needs at least one query term")
    val q = spark.createDataFrame(qNorm.map(Tuple1(_))).toDF("q")
    val qSigs = q.select(col("q"), explode(deleteNeighborhood("q", maxDist)).as("sig"))
    val (lo, hi) = (qNorm.map(_.length).min - maxDist, qNorm.map(_.length).max + maxDist)
    val cand = vocab
      .filter(length(col("term")).between(lo, hi))
      .select(col("term"), col("n"), explode(deleteNeighborhood("term", maxDist)).as("sig"))
      .join(broadcast(qSigs), Seq("sig"))
      // a pair can share many variants — one candidate row per (q, term)
      .select("q", "term", "n").distinct()
    val w = Window.partitionBy("q")
      .orderBy(col("dist").asc, col("n").desc, col("suggestion").asc)
    cand
      .select(col("q"), col("term").as("suggestion"),
        levenshtein(col("q"), col("term")).cast("long").as("dist"), col("n"))
      .filter(col("dist") <= maxDist)
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("q"), col("suggestion"), col("dist"), col("n"),
        col("rk").cast("long").as("rk"))
  }

  /** (doc_id, min_gap): proximity search — for every document holding
    * ≥ 2 DISTINCT query terms, the minimum raw-token distance between
    * any two different query terms; the `k` tightest docs. This is the
    * query positional postings exist for (SURVEY §2 #12d/12e): phrase
    * search demands adjacency, proximity ranks by nearness. The
    * self-join runs on (doc_id) over positions of QUERY TERMS ONLY —
    * per-doc fanout is bounded by the query terms' occurrence counts,
    * never by document length, and the join key is the high-cardinality
    * doc_id. */
  def proximityTopN(docs: DataFrame, queryTerms: Seq[String] = Bm25.QueryTerms,
                    k: Int = 20): DataFrame = {
    val p = graft.operators.Positional.termPositions(docs)
      .filter(col("term").isin(queryTerms: _*))
    val a = p.select(col("doc_id"), col("term").as("ta"), col("pos").as("pa"))
    val b = p.select(col("doc_id"), col("term").as("tb"), col("pos").as("pb"))
    a.join(b, Seq("doc_id")).filter(col("ta") < col("tb"))
      .groupBy("doc_id")
      .agg(min(abs(col("pa") - col("pb"))).as("min_gap"))
      .orderBy(col("min_gap").asc, col("doc_id").asc).limit(k)
  }

  /** (facet, value, n): faceted search — result counts per facet
    * value (lang, source) over the documents matching ≥ 1 query term.
    * The refinement sidebar every search UI draws next to the ranked
    * list. Matching docs via a left-semi join on the pruned postings
    * (no score needed, no doclen join), then ONE aggregation over the
    * unpivoted facet pairs — facet cardinality is tiny, the map-side
    * combine collapses each partition to #facet-values rows before
    * the shuffle. */
  def facets(docs: DataFrame, queryTerms: Seq[String] = Bm25.QueryTerms): DataFrame = {
    val matched = Bm25.tokenize(docs).filter(col("term").isin(queryTerms: _*))
      .select("doc_id").distinct()
    docs.join(matched, Seq("doc_id"), "left_semi")
      .select(explode(map(
        lit("lang"), col("lang"),
        lit("source"), col("source"))).as(Seq("facet", "value")))
      .groupBy("facet", "value").agg(count(lit(1)).as("n"))
  }

  /** Single row (dcg, idcg, ndcg): NDCG@k of the BM25 ranking against
    * graded relevance rel(d) = #distinct query terms present in d —
    * the self-contained ranking-quality harness (swap `rel` for human
    * labels in production). Both ranked lists go through the
    * window-free [[TopK.rankedTopN]] (TakeOrderedAndProject bounds the
    * set to k rows, array positions assign ranks — a global row_number
    * over an unlimited set would single-partition the corpus). */
  def searchNdcg(docs: DataFrame, queryTerms: Seq[String] = Bm25.QueryTerms,
                 k: Int = 10): DataFrame = {
    val rel = Bm25.tf(docs).filter(col("term").isin(queryTerms: _*))
      .groupBy("doc_id").agg(countDistinct(col("term")).as("rel"))
    val gain = (pow(lit(2.0), col("rel")) - lit(1.0)) / log2(col("rk") + lit(1.0))
    val dcg = TopK.rankedTopN(Bm25.searchTopN(docs, queryTerms, k),
        "score", "doc_id", k, "rk")
      .join(rel, "doc_id")
      .agg(sum(gain).as("dcg"))
    val idcg = TopK.rankedTopN(rel, "rel", "doc_id", k, "rk")
      .agg(sum(gain).as("idcg"))
    dcg.crossJoin(idcg)
      .select(round(col("dcg"), 4).as("dcg"), round(col("idcg"), 4).as("idcg"),
        round(col("dcg") / col("idcg"), 6).as("ndcg"))
  }

  /** (k1, b, rk, doc_id, score): BM25 PARAMETER SWEEP — the ranking
    * under every (k1, b) of a literal grid, top-`k` per configuration
    * (the relevance-tuning decision an engine owner makes before
    * pinning constants, the [[Dedup.lshTune]] idea applied to the
    * scoring model). ONE corpus derivation (query-term postings + doc
    * lengths — [[Bm25.bm25Score]]'s two passes) serves every
    * configuration: the grid is a broadcast literal relation crossed
    * into the postings AFTER the heavy work, so sweep cost grows with
    * the grid only in the final per-config aggregation, never in
    * corpus passes. Ranking uses the ROUNDED score (ties to the lower
    * doc_id) — the libm-ulp-proof boundary rule. */
  def bm25Tune(docs: DataFrame, queryTerms: Seq[String] = Bm25.QueryTerms,
               k1s: Seq[Double] = Seq(0.9, 1.2, 1.5),
               bs: Seq[Double] = Seq(0.4, 0.75), k: Int = 3): DataFrame = {
    import docs.sparkSession.implicits._
    val tfq = Bm25.tf(docs).filter(col("term").isin(queryTerms: _*))
    val dl = Bm25.docLengths(docs.filter(col("doc_id").isNotNull))
    val stats = dl.agg(count(col("doc_id")).as("n_docs"),
      avg(col("dl")).cast("double").as("avgdl"))
    val grid = k1s.flatMap(k1 => bs.map(b => (k1, b))).toDF("k1", "b")
    val scored = tfq
      .withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .crossJoin(broadcast(grid))
      .select(col("k1"), col("b"), col("doc_id"),
        (Bm25.robertsonIdf(col("df"), col("n_docs")) *
          (col("tf") * (col("k1") + lit(1.0))) /
          (col("tf") + col("k1") *
            (lit(1.0) - col("b") + col("b") * col("dl") / col("avgdl")))).as("c"))
      .groupBy("k1", "b", "doc_id").agg(round(sum("c"), 4).as("score"))
    val w = Window.partitionBy("k1", "b").orderBy(col("score").desc, col("doc_id").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("k1"), col("b"), col("rk").cast("long").as("rk"),
        col("doc_id"), col("score"))
  }

  /** (query_id, first_rank, rr): MEAN-RECIPROCAL-RANK eval of the
    * batch BM25 run — per query, the rank of the first RELEVANT
    * result in the top-`k` and its reciprocal (0.0 when no relevant
    * doc ranks). Relevance is derived, deterministic and replayable
    * (the [[searchNdcg]] convention): a doc is relevant to a query iff
    * it contains ≥ 2 distinct kept query terms. The run is
    * [[Bm25.batchSearch]] (one distributed plan for the whole query
    * table); the relevance side rides the same broadcast-pruned
    * postings, so the eval adds no corpus pass. */
  /** (query_id, n_rel, n_hits, ap): AVERAGE PRECISION @ k of the batch
    * BM25 run — the third leg of the ranking-eval family
    * ([[searchNdcg]] grades the whole list, [[searchMrr]] the first
    * hit, AP the precision profile across every hit). Relevance is the
    * [[searchMrr]] derived contract (≥ 2 distinct kept query terms).
    * AP@k = Σ_i (i / rank_i) / min(R, k) over the run's relevant hits
    * in rank order, R = corpus-wide relevant count; queries with no
    * relevant docs report 0.0. Rides the same batch plan + postings
    * join; the per-query hit numbering is a window over ≤ k rows. */
  def searchMap(docs: DataFrame, queries: DataFrame, k: Int = 10): DataFrame = {
    val run = Bm25.batchSearch(docs, queries, k)
    val rel = relevanceOf(docs, queries)
    val totals = rel.groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    val w = Window.partitionBy("query_id").orderBy(col("rk").asc)
    val hits = run.join(rel, Seq("query_id", "doc_id"), "left_semi")
      .withColumn("i", row_number().over(w))
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_hits"),
        sum(col("i").cast("double") / col("rk")).as("psum"))
    queries.select("query_id")
      .join(totals, Seq("query_id"), "left")
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(round(col("psum") / least(col("n_rel"), lit(k.toLong)), 6),
          lit(0.0)).as("ap"))
  }

  /** (query_id, doc_id, rk, score, n_match, sum_tf, max_tf, dl,
    * overlap): LEARNING-TO-RANK FEATURE EXPORT for the batch run's
    * top-`k` — the (query, doc) feature matrix a reranker trains on
    * (BM25 score + term-overlap + tf aggregates + doc length + the
    * query-coverage ratio), emitted by ONE plan riding the batch
    * scoring pass: the feature aggregation reuses the same
    * broadcast-pruned postings join (corpus still scanned exactly
    * twice), and the top-k restriction keeps the export
    * run-sized, not corpus-sized. */
  def ltrFeatures(docs: DataFrame, queries: DataFrame, k: Int = 10): DataFrame = {
    val run = Bm25.batchSearch(docs, queries, k)
    val qterms = queries
      .select(col("query_id"), explode(graft.functions.Text.rawTokens(col("qtext"))).as("term"))
      .filter(graft.functions.Text.keepToken(col("term")))
      .distinct()
    val qsizes = qterms.groupBy("query_id").agg(count(lit(1)).as("n_qterms"))
    val feat = Bm25.tf(docs)
      .join(broadcast(qterms), "term")
      .groupBy("query_id", "doc_id")
      .agg(countDistinct(col("term")).as("n_match"),
        sum("tf").as("sum_tf"), max("tf").as("max_tf"))
    val dl = Bm25.docLengths(docs.filter(col("doc_id").isNotNull))
    run
      .join(feat, Seq("query_id", "doc_id"))
      .join(dl, "doc_id")
      .join(broadcast(qsizes), "query_id")
      .select(col("query_id"), col("doc_id"), col("rk").cast("long").as("rk"),
        col("score"), col("n_match"), col("sum_tf"), col("max_tf"), col("dl"),
        round(col("n_match").cast("double") / col("n_qterms"), 6).as("overlap"))
  }

  /** (query_id, doc_id, rk, rerank_score, rerank_rk): CROSS-ENCODER-
    * SHAPED re-ranking of the batch top-10 — the two-stage serving
    * architecture every neural retrieval stack uses (cheap first-stage
    * retrieval over the whole corpus, an expensive per-(query, doc)
    * model over the k survivors). The model slot is a deterministic
    * feature-linear scorer over [[ltrFeatures]]' columns (the exact
    * signature a cross-encoder would consume: per-pair overlap, tf
    * evidence, length prior, first-stage score) so the plumbing —
    * k-row model input, per-query re-sort, stable tiebreaks — is the
    * real, tested serving shape with the learned weights pluggable.
    * Cost: rides the ltrFeatures plan + one k-row-per-query window;
    * the corpus is never rescanned, which is WHY rerankers are
    * affordable at 100 TB (model cost scales with queries×k, not
    * corpus). Weights 2/1/0.5/0.25/0.1 are powers of two except the
    * last, every term left-associated and rounded once — replayable
    * in any IEEE engine. */
  def rerank(docs: DataFrame, queries: DataFrame, k: Int = 10): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("rerank_score").desc, col("doc_id").asc)
    ltrFeatures(docs, queries, k)
      .withColumn("rerank_score",
        round(lit(2.0) * col("overlap") +
          log(lit(1.0) + col("sum_tf")) +
          lit(0.5) * log(lit(1.0) + col("max_tf")) -
          lit(0.25) * log(lit(1.0) + col("dl")) +
          lit(0.1) * col("score"), 4))
      .withColumn("rerank_rk", row_number().over(w).cast("long"))
      .select("query_id", "doc_id", "rk", "rerank_score", "rerank_rk")
  }

  /** (query_id, footrule, n_moved, new_top1_old_rk): how much the
    * re-ranker actually moved each query's top-k — Spearman's footrule
    * (Σ|rk − rerank_rk|, the standard rank-displacement metric), the
    * count of displaced results, and where the new top hit sat in the
    * first stage. The monitoring readout a two-stage stack ships with:
    * footrule ≈ 0 means the reranker is dead weight; a new_top1_old_rk
    * near k means the first stage was burying the best answer. Pure
    * integer arithmetic over [[rerank]]'s k rows per query. */
  def rerankDelta(docs: DataFrame, queries: DataFrame, k: Int = 10): DataFrame =
    rerank(docs, queries, k)
      .groupBy("query_id")
      .agg(sum(abs(col("rk") - col("rerank_rk"))).as("footrule"),
        sum(when(col("rk") =!= col("rerank_rk"), 1L).otherwise(0L)).as("n_moved"),
        max(when(col("rerank_rk") === 1, col("rk"))).as("new_top1_old_rk"))

  /** (query_id, n_qterms, n_terms_hit, n_postings, n_candidates): the
    * per-query COST PROFILE of the batch run — kept query terms, terms
    * with non-empty postings, total (term, doc) postings scored, and
    * distinct candidate docs. This is the deterministic latency proxy
    * (scored-postings count is what MaxScore/WAND planning budgets
    * against and what per-query wall time tracks at any scale) — a
    * wall-clock percentile would not be engine-replayable, the work
    * profile is. One broadcast-pruned postings pass, no extra corpus
    * scan; queries whose terms miss the corpus report zeros. */
  def searchCost(docs: DataFrame, queries: DataFrame): DataFrame = {
    val qterms = queries
      .select(col("query_id"), explode(graft.functions.Text.rawTokens(col("qtext"))).as("term"))
      .filter(graft.functions.Text.keepToken(col("term")))
      .distinct()
    val hits = Bm25.tf(docs)
      .join(broadcast(qterms), "term")
      .groupBy("query_id")
      .agg(countDistinct(col("term")).as("n_terms_hit"),
        count(lit(1)).as("n_postings"),
        countDistinct(col("doc_id")).as("n_candidates"))
    qterms.groupBy("query_id").agg(count(lit(1)).as("n_qterms"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"), col("n_qterms"),
        coalesce(col("n_terms_hit"), lit(0L)).as("n_terms_hit"),
        coalesce(col("n_postings"), lit(0L)).as("n_postings"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"))
  }

  /** The shared derived-relevance relation of the eval family: a doc
    * is relevant to a query iff it contains ≥ 2 distinct kept query
    * terms — deterministic, replayable by the oracle, and computed off
    * the broadcast-pruned postings (no extra corpus pass). */
  private def relevanceOf(docs: DataFrame, queries: DataFrame): DataFrame = {
    val qterms = queries
      .select(col("query_id"), explode(graft.functions.Text.rawTokens(col("qtext"))).as("term"))
      .filter(graft.functions.Text.keepToken(col("term")))
      .distinct()
    Bm25.tf(docs)
      .join(broadcast(qterms), "term")
      .groupBy("query_id", "doc_id")
      .agg(countDistinct(col("term")).as("n_terms"))
      .filter(col("n_terms") >= 2)
      .select("query_id", "doc_id")
  }

  def searchMrr(docs: DataFrame, queries: DataFrame, k: Int = 10): DataFrame = {
    val run = Bm25.batchSearch(docs, queries, k)
    val rel = relevanceOf(docs, queries)
    val firsts = run.join(rel, Seq("query_id", "doc_id"), "left_semi")
      .groupBy("query_id").agg(min("rk").as("fr"))
    queries.select("query_id")
      .join(firsts, Seq("query_id"), "left")
      .select(col("query_id"), col("fr").cast("long").as("first_rank"),
        coalesce(round(lit(1.0) / col("fr"), 6), lit(0.0)).as("rr"))
  }
}
