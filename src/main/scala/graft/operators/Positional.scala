package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Positional search surface: term positions, phrase matching, field-
  * weighted BM25F and pseudo-relevance-feedback query expansion.
  *
  * The reference's index keeps only (term → tf) per document
  * (MongoTFSink.java), so it cannot answer phrase or proximity
  * queries; positional postings are the standard index extension that
  * unlocks them. Positions are 0-based offsets into the RAW
  * (whitespace) token stream — adjacency means "adjacent words in the
  * original text" even when an intervening token is later dropped by
  * the keep-filter, and positions stay stable if the stopword list
  * changes.
  *
  * Scale shape: `posexplode` is a pure map stage; everything after is
  * the same (doc_id, term)-keyed hash aggregation as the TF chain, so
  * the 100 TB contract of [[Bm25]] carries over unchanged. Phrase
  * matching joins the positional relation to itself on (doc_id,
  * pos+i) — an equi-join on the document id, shuffle-partitionable,
  * never a nested loop.
  */
object Positional {

  /** (doc_id, term, pos): kept terms with their 0-based raw-stream
    * positions — the row form of a positional posting. */
  def termPositions(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), posexplode(Text.rawTokens(col("text"))).as(Seq("pos", "term")))
      .filter(Text.keepToken(col("term")))
      .select(col("doc_id"), col("term"), col("pos").cast("long").as("pos"))

  /** (doc_id, term, positions): positional postings — ascending raw
    * positions comma-joined so the oracle reproduces them
    * byte-for-byte (same contract as [[Bm25.postings]]). */
  def positionalPostings(docs: DataFrame): DataFrame =
    termPositions(docs)
      .groupBy("doc_id", "term")
      .agg(array_join(transform(sort_array(collect_list(col("pos"))), _.cast("string")), ",")
        .as("positions"))

  /** Demo phrase for the driver entry (both words frequent at every
    * test SF). */
  val DemoPhrase: Seq[String] = Seq("part", "filter")

  /** (doc_id, n_hits): documents containing `phrase` as consecutive
    * raw tokens, with occurrence counts. The first term's positions
    * anchor the match; each later term joins on (doc_id, pos+i), so
    * an n-term phrase is n-1 doc-local equi-joins — at scale each join
    * shuffles on doc_id (or reuses the previous shuffle's
    * partitioning) and touches only postings of the phrase's terms. */
  def phraseSearch(docs: DataFrame, phrase: Seq[String] = DemoPhrase): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    // a term the tokenizer could never produce (stopword, too short,
    // not lowercase, contains a space) has NO positions — the phrase
    // could never match and an empty result would be indistinguishable
    // from "phrase absent", so reject loudly instead
    val dropped = phrase.filterNot(Text.producibleToken)
    require(dropped.isEmpty,
      s"phrase terms ${dropped.mkString("'", "', '", "'")} can never match: " +
        "stopword/min-length filtered, non-lowercase, or not a single token")
    val p = termPositions(docs)
    val anchor = p.filter(col("term") === phrase.head)
      .select(col("doc_id"), col("pos"))
    phrase.zipWithIndex.drop(1).foldLeft(anchor) { case (acc, (t, i)) =>
      acc.join(
        p.filter(col("term") === t).select(col("doc_id"), (col("pos") - i).as("pos")),
        Seq("doc_id", "pos"))
    }
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
  }

  /** BM25F field weights: the head of a document (its first
    * [[HeadLen]] raw tokens — title/lead standin) counts [[HeadWeight]]×. */
  val HeadLen = 10
  val HeadWeight = 3

  /** (doc_id, score): simplified BM25F (Robertson et al., "Simple
    * BM25 extension to multiple weighted fields", CIKM 2004): term
    * frequencies and document length are field-weighted FIRST
    * (wtf = Σ_f w_f·tf_f, wdl = Σ_f w_f·len_f — both integers here),
    * then plugged into the unchanged Okapi formula with avgdl over
    * the weighted lengths. Two fields: head (first [[HeadLen]] raw
    * tokens, weight [[HeadWeight]]) and body (weight 1). */
  def bm25fScore(docs: DataFrame, queryTerms: Seq[String] = Bm25.QueryTerms): DataFrame = {
    // explicit isNotNull matches the join's inferred constraint and
    // count(doc_id) keeps the stats projection identical to the join
    // branch, so the wdl exchange canonicalizes ONCE and is REUSED
    // (same tricks as Bm25.bm25Score) — 2 corpus scans total,
    // asserted in PlanSpec
    val wtfAll = termPositions(docs.filter(col("doc_id").isNotNull))
      .withColumn("w", when(col("pos") < HeadLen, lit(HeadWeight)).otherwise(lit(1)))
      .groupBy("doc_id", "term").agg(sum("w").as("wtf"))
    val wdl = wtfAll.groupBy("doc_id").agg(sum("wtf").as("wdl"))
    val stats = wdl.agg(count(col("doc_id")).as("n_docs"), avg("wdl").cast("double").as("avgwdl"))
    val tfq = wtfAll.filter(col("term").isin(queryTerms: _*))
    tfq
      .withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
      .join(wdl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        Bm25.okapiTerm(col("wtf"), col("df"), col("wdl"), col("avgwdl"), col("n_docs")).as("c"))
      .groupBy("doc_id").agg(round(sum("c"), 4).as("score"))
  }

  /** Feedback depth / expansion width for [[expandedSearch]]. */
  val FeedbackDocs = 3
  val ExpansionTerms = 5

  /** (doc_id, score, rk): pseudo-relevance-feedback search (RM1-style
    * expansion): score `queryTerms`, take the top [[FeedbackDocs]]
    * documents, mine their top [[ExpansionTerms]] terms by TOTAL TF in
    * the feedback set (integer-exact, ties → term asc; excluding the
    * original query terms), then rescore with the expanded term set
    * and return the top `n`. Two corpus passes + one feedback-doc-only
    * pass; expansion terms ride a broadcast, never a driver collect.
    * All three top-N selections are `orderBy().limit()` plans
    * (TakeOrderedAndProject — distributed top-N): the feedback and
    * expansion stages only need the SET of survivors, and the final
    * ranked output goes through the window-free [[TopK.rankedTopN]] —
    * no global rank window ever sees an unbounded relation. */
  def expandedSearch(docs: DataFrame, queryTerms: Seq[String] = Bm25.QueryTerms,
                     n: Int = 10): DataFrame = {
    // NOT cached: a cached tf fragment would be substituted into every
    // other query sharing the subplan (plan-contract contamination);
    // the three passes re-scan, which AQE + pushdown keep cheap
    val tf = Bm25.tf(docs)
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val stats = dl.agg(count(col("doc_id")).as("n_docs"), avg("dl").cast("double").as("avgdl"))

    def score(queryTermsDf: DataFrame): DataFrame =
      tf.join(broadcast(queryTermsDf), "term")
        .withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
        .join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .select(col("doc_id"),
          Bm25.okapiTerm(col("tf"), col("df"), col("dl"), col("avgdl"), col("n_docs")).as("c"))
        .groupBy("doc_id").agg(round(sum("c"), 4).as("score"))

    val spark = docs.sparkSession
    import spark.implicits._
    val q0 = queryTerms.toDF("term")
    val feedback = score(q0)
      .orderBy(col("score").desc, col("doc_id").asc).limit(FeedbackDocs)
      .select("doc_id")
    val expansion = tf.join(broadcast(feedback), "doc_id")
      .filter(!col("term").isin(queryTerms: _*))
      .groupBy("term").agg(sum("tf").as("ttf"))
      .orderBy(col("ttf").desc, col("term").asc).limit(ExpansionTerms)
      .select("term")
    TopK.rankedTopN(score(q0.union(expansion)), "score", "doc_id", n, "rk")
  }
}
