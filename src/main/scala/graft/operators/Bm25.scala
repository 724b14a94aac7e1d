package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** The reference's whole surface — tokenize → filter → per-doc TF →
  * top-K terms → DF/IDF → TF-IDF → BM25 — re-expressed as single
  * distributed DataFrame plans.
  *
  * Reference semantics: BatchBM25PreMain.java:140-247 (tokenize,
  * filter, per-doc TF, top-30), util/TfIdfUtil.java:102-137 (IDF =
  * log(N/(df+1)), TF-IDF = tf*idf), backup/BMStream.java (same chain,
  * per-doc Flink job in a driver loop). The ref runs ONE Flink job per
  * document and folds IDF on the driver; here the whole corpus is one
  * plan: explode → two hash aggregations (doc_id,term) then (term) —
  * both high-cardinality keys, both with map-side partial aggregation,
  * so the design holds at 100 TB (SURVEY.md §5).
  */
object Bm25 {
  /** Okapi BM25 parameters (standard defaults). */
  val K1 = 1.2
  val B  = 0.75

  /** ref BatchBM25PreMain.MAX_WORD_COUNT = 30. */
  val MaxWordCount = 30

  /** Fixed demo query used by the scored-search entries. */
  val QueryTerms: Seq[String] = Seq("spark", "query", "join", "fast")

  /** (doc_id, term): tokenized + stopword/length-filtered corpus. */
  def tokenize(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(Text.rawTokens(col("text"))).as("term"))
      .filter(Text.keepToken(col("term")))

  /** (doc_id, term, tf): per-document term frequency. */
  def tf(docs: DataFrame): DataFrame =
    tokenize(docs).groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /** (doc_id, term, tf, rk): top-[[MaxWordCount]] terms per document,
    * ties broken by term so the result is a deterministic set. */
  def topKTerms(docs: DataFrame, k: Int = MaxWordCount): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy(col("tf").desc, col("term").asc)
    tf(docs).withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** (term, df): document frequency. */
  def df(docs: DataFrame): DataFrame =
    tf(docs).groupBy("term").agg(count(lit(1)).as("df"))

  /** Single-row (n_docs, total_tokens, avgdl) corpus statistics over
    * documents that have at least one kept token. */
  def corpusStats(docs: DataFrame): DataFrame =
    docLengths(docs).agg(
      count(lit(1)).as("n_docs"),
      sum("dl").as("total_tokens"),
      round(avg("dl"), 6).as("avgdl"))

  /** (doc_id, dl): kept-token document length. */
  def docLengths(docs: DataFrame): DataFrame =
    tf(docs).groupBy("doc_id").agg(sum("tf").as("dl"))

  /** (term, df, idf): the reference's IDF, idf = ln(N/(df+1)) with
    * real-valued division (TfIdfUtil.java:120 intends this; see
    * SURVEY.md §1 on its int-division bug). */
  def idf(docs: DataFrame): DataFrame = {
    val n = docLengths(docs).agg(count(lit(1)).as("n_docs"))
    df(docs)
      .crossJoin(broadcast(n))
      .select(col("term"), col("df"),
        round(log(col("n_docs").cast("double") / (col("df") + lit(1))), 6).as("idf"))
  }

  /** (doc_id, term, tf, tfidf): TF-IDF per document/term
    * (TfIdfUtil.java:126-137). */
  def tfIdf(docs: DataFrame): DataFrame =
    tf(docs)
      .join(idf(docs).select("term", "idf"), "term")
      .select(col("doc_id"), col("term"), col("tf"),
        round(col("tf") * col("idf"), 6).as("tfidf"))

  /** (doc_id, score): Okapi BM25 of every matching document against
    * `queryTerms`. The per-term IDF table for a fixed query is tiny →
    * broadcast; document stats are a single row → broadcast cross
    * join. One shuffle end-to-end (the tf aggregation). */
  def bm25Score(docs: DataFrame, queryTerms: Seq[String] = QueryTerms): DataFrame = {
    val tfq = tf(docs).filter(col("term").isin(queryTerms: _*))
    val n = docLengths(docs).agg(count(lit(1)).as("n_docs"))
    // Robertson idf: ln(1 + (N - df + 0.5)/(df + 0.5))
    val idfq = df(docs)
      .filter(col("term").isin(queryTerms: _*))
      .crossJoin(broadcast(n))
      .select(col("term"),
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))).as("idf"))
    val avgd = docLengths(docs).agg(avg(col("dl")).cast("double").as("avgdl"))
    val contrib =
      tfq.join(broadcast(idfq), "term")
        .join(docLengths(docs), "doc_id")
        .crossJoin(broadcast(avgd))
        .select(col("doc_id"),
          (col("idf") * (col("tf") * lit(K1 + 1.0)) /
            (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl")))).as("c"))
    contrib.groupBy("doc_id").agg(round(sum("c"), 4).as("score"))
  }

  /** Top-N ranked search results, deterministic on rounded-score ties. */
  def searchTopN(docs: DataFrame, queryTerms: Seq[String] = QueryTerms, n: Int = 10): DataFrame =
    bm25Score(docs, queryTerms).orderBy(col("score").desc, col("doc_id").asc).limit(n)

  /** (term, df, postings): inverted-index posting lists for rare terms
    * (df ≤ maxDf), doc ids ascending in a comma-joined string so the
    * oracle can reproduce it byte-for-byte. */
  def postings(docs: DataFrame, maxDf: Int = 100): DataFrame =
    tf(docs)
      .groupBy("term")
      .agg(count(lit(1)).as("df"),
        array_join(transform(sort_array(collect_list(col("doc_id"))), _.cast("string")), ",").as("postings"))
      .filter(col("df") <= maxDf)
}
