package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Lineage._

/** Hybrid retrieval: reciprocal-rank fusion of the lexical (BM25) and
  * dense (embedding-cosine) rankings — the modern search stack the
  * reference's BM25-only pipeline feeds into. rrf(d) =
  * Σ_lists 1/(K + rank_list(d)), K = 60 (Cormack et al.'s robust
  * default); documents missing from a list simply contribute nothing.
  *
  * Plan shape: RRF is defined over RETRIEVED runs, so each side is a
  * depth-[[FusionDepth]] top-N list (TakeOrderedAndProject — the
  * distributed top-N [[TopK.rankedTopN]] plans), never a corpus-sized
  * global rank window. Truncation at depth N is exact for the fused
  * top-k: a document absent from a run contributes nothing, and any
  * document outside BOTH depth-N lists could score at most
  * 2/(K+N+1) = 2/1061 < 1/(K+N') for every in-list rank N' ≤ N, so it
  * can never displace a fused result that appears in either list. The
  * fusion itself joins two N-row rank lists on id — negligible.
  */
object Hybrid {

  /** Run depth for each fused ranking. 2/(K + FusionDepth + 1) ≈ 0.0019
    * bounds the score of anything truncated away — far below the
    * 1/(K+1…K+10) ≈ 0.014–0.016 band the top-10 lives in. */
  val FusionDepth = 1000

  /** (doc_id, rrf): top-k fused results for a lexical query + a query
    * vector. Ranks are computed on the ROUNDED scores with id
    * tiebreaks, so both rankings (and therefore the fusion) are
    * deterministic and engine-portable. */
  def rrfSearch(docs: DataFrame, embeddings: DataFrame,
                queryTerms: Seq[String] = Bm25.QueryTerms, queryVecId: Long = 0L,
                k: Int = 10, kConst: Int = 60, depth: Int = FusionDepth): DataFrame = {
    val bmRanks = TopK.rankedTopN(Bm25.bm25Score(docs, queryTerms),
        "score", "doc_id", depth, "rb")
      .select(col("doc_id").as("id"), col("rb"))
    val cosRanks = TopK.rankedTopN(Ann.cosineAll(embeddings, queryVecId),
        "cos", "vec_id", depth, "rc")
      .select(col("vec_id").as("id"), col("rc"))
    bmRanks.join(cosRanks, Seq("id"), "full_outer")
      .select(col("id").as("doc_id"),
        round(
          coalesce(lit(1.0) / (lit(kConst) + col("rb")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(kConst) + col("rc")), lit(0.0)), 6).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
      .limit(k)
  }

  /** (doc_id, combsum, combmnz): score-based fusion of the same two
    * runs (Fox & Shaw 1994) — the scale-sensitive complement of RRF:
    * each depth-N run is min-max normalized onto [0, 1] (on the
    * ROUNDED scores, so both engines normalize identical doubles),
    * CombSUM adds the normalized scores (absent → 0) and CombMNZ
    * multiplies by the number of runs that retrieved the document
    * (rewarding agreement). A degenerate constant run normalizes to
    * 1.0 everywhere rather than dividing by zero. Same plan economics
    * as [[rrfSearch]]: two distributed top-N lists, run-level min/max
    * as broadcast scalars, an N-row join — nothing corpus-sized
    * shuffles for the fusion itself. */
  def combSearch(docs: DataFrame, embeddings: DataFrame,
                 queryTerms: Seq[String] = Bm25.QueryTerms, queryVecId: Long = 0L,
                 k: Int = 10, depth: Int = FusionDepth): DataFrame = {
    def normalized(run: DataFrame, scoreCol: String, idCol: String,
                   out: String): DataFrame = {
      val top = TopK.rankedTopN(run, scoreCol, idCol, depth, "__r")
        .select(col(idCol).as("id"), col(scoreCol).as("s"))
      val mm = top.agg(min("s").as("mn"), max("s").as("mx"))
      top.crossJoin(broadcast(mm))
        .select(col("id"),
          when(col("mx") === col("mn"), lit(1.0))
            .otherwise((col("s") - col("mn")) / (col("mx") - col("mn"))).as(out))
    }
    val bn = normalized(Bm25.bm25Score(docs, queryTerms), "score", "doc_id", "ns")
    val cn = normalized(Ann.cosineAll(embeddings, queryVecId), "cos", "vec_id", "nc")
    bn.join(cn, Seq("id"), "full_outer")
      .select(col("id").as("doc_id"),
        round(coalesce(col("ns"), lit(0.0)) + coalesce(col("nc"), lit(0.0)), 6)
          .as("combsum"),
        round((coalesce(col("ns"), lit(0.0)) + coalesce(col("nc"), lit(0.0))) *
          (col("ns").isNotNull.cast("int") + col("nc").isNotNull.cast("int")), 6)
          .as("combmnz"))
      .orderBy(col("combsum").desc, col("doc_id").asc)
      .limit(k)
  }

  /** (doc_id, points_lex, points_dense, borda): BORDA-COUNT fusion of
    * the lexical + dense runs — the third member of the fusion family
    * (RRF weights by 1/(K+rank): top-heavy; CombSUM by normalized
    * score: scale-sensitive; Borda by LINEAR rank points
    * depth+1−rank: the positional-voting middle ground that ignores
    * score scales entirely yet keeps deep-list gradations RRF's
    * harmonic decay flattens). Docs absent from a run take 0 points —
    * pure BIGINT arithmetic end to end, no normalization, no FP until
    * nothing (the only doubles are the runs' own rounded scores used
    * for ranking). Same two-depth-N-lists plan economics as the
    * siblings: both runs collapse through the window-free
    * [[TopK.rankedTopN]] bound. */
  def bordaSearch(docs: DataFrame, embeddings: DataFrame,
                  queryTerms: Seq[String] = Bm25.QueryTerms, queryVecId: Long = 0L,
                  k: Int = 10, depth: Int = FusionDepth): DataFrame = {
    val bm = TopK.rankedTopN(Bm25.bm25Score(docs, queryTerms),
        "score", "doc_id", depth, "rb")
      .select(col("doc_id").as("id"), (lit(depth + 1L) - col("rb")).as("pb"))
    val cr = TopK.rankedTopN(Ann.cosineAll(embeddings, queryVecId),
        "cos", "vec_id", depth, "rc")
      .select(col("vec_id").as("id"), (lit(depth + 1L) - col("rc")).as("pc"))
    bm.join(cr, Seq("id"), "full_outer")
      .select(col("id").as("doc_id"),
        coalesce(col("pb"), lit(0L)).as("points_lex"),
        coalesce(col("pc"), lit(0L)).as("points_dense"),
        (coalesce(col("pb"), lit(0L)) + coalesce(col("pc"), lit(0L))).as("borda"))
      .orderBy(col("borda").desc, col("doc_id").asc)
      .limit(k)
  }

  /** (n_overlap, rho): SPEARMAN rank correlation between the lexical
    * and dense runs over their overlap — the run-agreement diagnostic
    * that says whether fusion can help at all (rho ≈ 1: the runs
    * agree, fusion adds nothing; rho ≈ 0: complementary evidence,
    * fusion shines). Docs in both depth-N lists are re-ranked 1..m
    * within the overlap on each side (window-free, via the same
    * bounded [[TopK.rankedTopN]] collapse), then
    * rho = 1 − 6·Σd² / (m(m²−1)) in exact BIGINT arithmetic; m < 2
    * has no defined correlation → NULL. */
  def runCorrelation(docs: DataFrame, embeddings: DataFrame,
                     queryTerms: Seq[String] = Bm25.QueryTerms, queryVecId: Long = 0L,
                     depth: Int = FusionDepth): DataFrame = {
    val bm = TopK.rankedTopN(Bm25.bm25Score(docs, queryTerms),
        "score", "doc_id", depth, "rb")
      .select(col("doc_id").as("id"), col("rb"))
    val cr = TopK.rankedTopN(Ann.cosineAll(embeddings, queryVecId),
        "cos", "vec_id", depth, "rc")
      .select(col("vec_id").as("id"), col("rc"))
    val both = bm.join(cr, "id").cutLineage()
    val ra = TopK.rankedTopN(both.withColumn("nr", -col("rb")), "nr", "id", depth, "ra")
      .select(col("id"), col("ra").cast("long").as("ra"))
    val rc2 = TopK.rankedTopN(both.withColumn("nr", -col("rc")), "nr", "id", depth, "rcc")
      .select(col("id"), col("rcc").cast("long").as("rcc"))
    ra.join(rc2, "id")
      .select(((col("ra") - col("rcc")) * (col("ra") - col("rcc"))).as("d2"))
      .agg(count(lit(1)).as("m"), coalesce(sum("d2"), lit(0L)).as("s"))
      .select(col("m").as("n_overlap"),
        when(col("m") >= 2,
          round(lit(1.0) - lit(6.0) * col("s") /
            (col("m") * (col("m") * col("m") - 1)), 6)).as("rho"))
  }

  /** (doc_id, pos, src): BALANCED INTERLEAVE of the lexical and dense
    * runs — the online-eval primitive (which system's results do
    * users click?) in its deterministic form: run A occupies odd
    * positions by rank, run B even ones, a document in both keeps its
    * earliest slot. Positions never collide across runs (parity), so
    * src falls out of pos parity — no window, no re-rank: two
    * depth-bounded TakeOrdered runs, a union, one min per doc. */
  /** One row (k, n_joint, rbo): truncated RANK-BIASED OVERLAP
    * (Webber, Moffat & Zobel 2010) between the lexical and dense
    * top-k runs at persistence p = 1/2 —
    * RBO@k = (1−p)·Σ_{d=1..k} p^{d−1}·X_d/d with X_d the overlap of
    * the two depth-d prefixes: the top-weighted list-similarity the
    * eval family lacked ([[runCorrelation]]'s Spearman weights every
    * displacement equally; RBO cares most about the head). Computed
    * WITHOUT a per-depth loop: a jointly-retrieved doc with ranks
    * (rb, rc) sits in every prefix overlap from m = max(rb, rc)
    * onward, so its total contribution is Σ_{d=m}^{k} (1−p)p^{d−1}/d
    * — one ≤k-term higher-order aggregate per joint row. p = 1/2
    * keeps every p^{d−1} an exact dyadic; the only representation
    * noise is the 1/d division (identical IEEE on any engine;
    * round(·,6) last). Two depth-bounded TopK runs + one ≤k-row
    * join — nothing corpus-sized shuffles for the comparison. */
  def rbo(docs: DataFrame, embeddings: DataFrame,
          queryTerms: Seq[String] = Bm25.QueryTerms, queryVecId: Long = 0L,
          k: Int = 10): DataFrame = {
    val a = TopK.rankedTopN(Bm25.bm25Score(docs, queryTerms),
        "score", "doc_id", k, "rb")
      .select(col("doc_id").as("id"), col("rb").cast("long").as("rb"))
    val b = TopK.rankedTopN(Ann.cosineAll(embeddings, queryVecId),
        "cos", "vec_id", k, "rc")
      .select(col("vec_id").as("id"), col("rc").cast("long").as("rc"))
    a.join(b, "id")
      .select(greatest(col("rb"), col("rc")).as("m"))
      .select(expr(s"aggregate(sequence(m, ${k}L), CAST(0.0 AS DOUBLE), " +
        "(acc, d) -> acc + 0.5 * pow(0.5, d - 1) / d)").as("w"))
      .agg(count(lit(1)).as("n_joint"), coalesce(sum("w"), lit(0.0)).as("s"))
      .select(lit(k.toLong).as("k"), col("n_joint"),
        round(col("s"), 6).as("rbo"))
  }

  /** One row (n_joint, n_pairs, concordant, discordant, tau): KENDALL
    * rank correlation between the lexical and dense top-k runs over
    * their JOINTLY retrieved documents — the pairwise-inversion member
    * of the run-similarity triple ([[runCorrelation]]'s Spearman
    * squares displacements, [[rbo]] weights the head; tau counts
    * exactly how many doc pairs the two systems ORDER differently,
    * the quantity an interleaving experiment measures). Ranks are
    * row_numbers (deterministic score-then-id order), so within a run
    * they are tie-free and tau-a = tau-b: tau = (C − D) / (m(m−1)/2)
    * over the m joint docs. C and D are exact BIGINTs from one
    * triangular self-join of the ≤k-row joint relation; the single
    * division is the only FP (round(·,6)). Nothing corpus-sized
    * shuffles: two depth-bounded TopK runs, a ≤k-row join, a ≤k²-row
    * local pair join. NULL tau when fewer than two joint docs. */
  def kendallTau(docs: DataFrame, embeddings: DataFrame,
                 queryTerms: Seq[String] = Bm25.QueryTerms, queryVecId: Long = 0L,
                 k: Int = 10): DataFrame = {
    val a = TopK.rankedTopN(Bm25.bm25Score(docs, queryTerms),
        "score", "doc_id", k, "rb")
      .select(col("doc_id").as("id"), col("rb").cast("long").as("rb"))
    val b = TopK.rankedTopN(Ann.cosineAll(embeddings, queryVecId),
        "cos", "vec_id", k, "rc")
      .select(col("vec_id").as("id"), col("rc").cast("long").as("rc"))
    val j = a.join(b, "id")
    val x = j.select(col("id").as("ida"), col("rb").as("rba"), col("rc").as("rca"))
    val y = j.select(col("id").as("idb"), col("rb").as("rbb"), col("rc").as("rcb"))
    val pairs = x.join(y, col("ida") < col("idb"))
      .select((((col("rba") - col("rbb")) * (col("rca") - col("rcb"))) > 0)
        .as("conc"))
      .agg(coalesce(sum(when(col("conc"), 1L).otherwise(0L)), lit(0L)).as("concordant"),
        coalesce(sum(when(!col("conc"), 1L).otherwise(0L)), lit(0L)).as("discordant"))
    j.agg(count(lit(1)).as("n_joint"))
      .crossJoin(pairs)
      .select(col("n_joint"),
        (col("concordant") + col("discordant")).as("n_pairs"),
        col("concordant"), col("discordant"),
        when(col("concordant") + col("discordant") === 0,
          lit(null).cast("double"))
          .otherwise(round((col("concordant") - col("discordant")).cast("double") /
            (col("concordant") + col("discordant")), 6)).as("tau"))
  }

  def interleave(docs: DataFrame, embeddings: DataFrame,
                 queryVecId: Long = 0L, k: Int = 10,
                 depth: Int = FusionDepth): DataFrame = {
    val a = TopK.rankedTopN(Bm25.bm25Score(docs), "score", "doc_id", depth, "rb")
      .select(col("doc_id").as("id"), (lit(2L) * col("rb") - 1).as("pos"))
    val b = TopK.rankedTopN(Ann.cosineAll(embeddings, queryVecId), "cos", "vec_id", depth, "rc")
      .select(col("vec_id").as("id"), (lit(2L) * col("rc")).as("pos"))
    a.union(b)
      .groupBy(col("id").as("doc_id"))
      .agg(min(col("pos")).cast("long").as("pos"))
      .select(col("doc_id"), col("pos"),
        when(col("pos") % 2 === 1, lit("lex")).otherwise(lit("dense")).as("src"))
      .orderBy(col("pos").asc, col("doc_id").asc)
      .limit(k)
  }

  /** (n_lexical, n_semantic, n_both, jaccard): MODALITY AGREEMENT
    * audit between the two near-dup detectors — the shingle-verified
    * lexical pairs vs the embedding-cosine semantic pairs (ids align
    * doc_id == vec_id). Low agreement is the expected, USEFUL reading:
    * the semantic detector's whole point is catching paraphrases the
    * lexical one can't — but a lexical pair the semantic side MISSES
    * flags an embedding-quality problem. One full-outer join of two
    * already-pair-sized relations; corpus never rescanned. */
  def modalityAgreement(lexPairs: DataFrame, semPairs: DataFrame): DataFrame = {
    val lx = lexPairs.select(col("doc_a"), col("doc_b")).distinct()
      .withColumn("l", lit(1L))
    val sm = semPairs.select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
      .distinct().withColumn("s", lit(1L))
    lx.join(sm, Seq("doc_a", "doc_b"), "full_outer")
      .agg(sum(coalesce(col("l"), lit(0L))).as("n_lexical"),
        sum(coalesce(col("s"), lit(0L))).as("n_semantic"),
        sum(when(col("l").isNotNull && col("s").isNotNull, 1L).otherwise(0L)).as("n_both"))
      .select(col("n_lexical"), col("n_semantic"), col("n_both"),
        round(col("n_both").cast("double") /
          (col("n_lexical") + col("n_semantic") - col("n_both")), 6).as("jaccard"))
  }

  /** (vec_id, cos, lang, source, n_chars): RETRIEVE-THEN-REHYDRATE —
    * the exact top-k dense neighbors joined back to their document
    * payloads (ids align doc_id == vec_id), the serving join every
    * retrieval stack ends with (a ranked id list is useless without
    * its text). The k-row ranked side drives the join, so the
    * documents side is probed, never scanned into the ranking. */
  def rehydratedSearch(docs: DataFrame, embeddings: DataFrame,
                       queryId: Long = 0L, k: Int = 10): DataFrame =
    Ann.bruteForceTopK(embeddings, queryId, k)
      .join(docs.select(col("doc_id").as("vec_id"), col("lang"), col("source"),
        col("n_chars")), "vec_id")
      .select(col("vec_id"), col("cos"), col("lang"), col("source"), col("n_chars"))

  /** (n_pairs, pearson): LEXICAL-SEMANTIC CORRELATION — Pearson r
    * between shingle Jaccard and embedding cosine over the verified
    * near-dup pairs: does surface overlap track embedding proximity
    * on the pairs both metrics can see? Cosines ride the scoring
    * contract (ordered fold, round 4); r folds through the explicit
    * closed form with a zero-variance guard (exact-copy-only pair
    * sets have no lexical spread — r is undefined, reported NULL,
    * not NaN). */
  def modalityCorr(lexPairs: DataFrame, embeddings: DataFrame): DataFrame = {
    val vn = Ann.withNorm(embeddings)
    val xy = lexPairs.select(col("doc_a"), col("doc_b"), col("jaccard"))
      .join(vn.select(col("vec_id").as("doc_a"), col("v").as("va"), col("nrm").as("na")),
        "doc_a")
      .join(vn.select(col("vec_id").as("doc_b"), col("v").as("vb"), col("nrm").as("nb")),
        "doc_b")
      .select(col("jaccard").as("x"),
        round(graft.functions.Native.dot(col("va"), col("vb")) /
          (col("na") * col("nb")), 4).as("y"))
    xy.agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("n").as("n_pairs"),
        when(col("n") >= 2 &&
            (col("n") * col("sxx") - col("sx") * col("sx")) > 0 &&
            (col("n") * col("syy") - col("sy") * col("sy")) > 0,
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
              sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 6))
          .as("pearson"))
  }
}
