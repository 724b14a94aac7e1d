package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
