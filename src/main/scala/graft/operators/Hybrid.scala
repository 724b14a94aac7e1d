package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: reciprocal-rank fusion of the lexical (BM25) and
  * dense (embedding-cosine) rankings — the modern search stack the
  * reference's BM25-only pipeline feeds into. rrf(d) =
  * Σ_lists 1/(K + rank_list(d)), K = 60 (Cormack et al.'s robust
  * default); documents missing from a list simply contribute nothing.
  *
  * Plan shape: both rankings are tiny relative to the corpus (BM25
  * ranks only query-term postings; at 100 TB the dense side would rank
  * an ANN candidate set, not the full corpus — the full scan here is
  * the small-scale exactness baseline). The fusion itself is a join of
  * two rank lists on id — negligible.
  */
object Hybrid {

  /** (doc_id, rrf): top-k fused results for a lexical query + a query
    * vector. Ranks are computed on the ROUNDED scores with id
    * tiebreaks, so both rankings (and therefore the fusion) are
    * deterministic and engine-portable. */
  def rrfSearch(docs: DataFrame, embeddings: DataFrame,
                queryTerms: Seq[String] = Bm25.QueryTerms, queryVecId: Long = 0L,
                k: Int = 10, kConst: Int = 60): DataFrame = {
    val wb = Window.orderBy(col("score").desc, col("doc_id").asc)
    val bmRanks = Bm25.bm25Score(docs, queryTerms)
      .withColumn("rb", row_number().over(wb))
      .select(col("doc_id").as("id"), col("rb"))
    val wc = Window.orderBy(col("cos").desc, col("vec_id").asc)
    val cosRanks = Ann.cosineAll(embeddings, queryVecId)
      .withColumn("rc", row_number().over(wc))
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
