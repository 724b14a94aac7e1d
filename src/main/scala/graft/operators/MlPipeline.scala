package graft.operators

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.{CountVectorizer, CountVectorizerModel, IDF, RegexTokenizer, StopWordsRemover}
import org.apache.spark.ml.linalg.{DenseVector, SparseVector, Vector}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One (idx, tf, tfidf) cell of a doc's term vector — top-level so
  * Spark codegen can construct it (nested case classes force the
  * interpreted fallback). */
case class TermCell(idx: Int, tf: Long, tfidf: Double)

/** tf-only cell (idx, tf) of a doc's count vector. */
case class TfCell(idx: Int, tf: Long)

/** The MLlib feature-extraction route to TF-IDF/BM25 — the same
  * tokenize → filter → vectorize → weight chain as [[Bm25]], expressed
  * as an `org.apache.spark.ml.Pipeline` (RegexTokenizer →
  * StopWordsRemover → CountVectorizer → IDF) instead of hand-built
  * aggregations. This is the interop surface: a user who already
  * carries ML Pipelines can drop the reference's job (tokenize/POS
  * -filter/TF/IDF, BatchBM25PreMain.java:140-247) straight onto it,
  * and the fitted vectors feed any downstream MLlib estimator.
  *
  * Differences from the hand-built chain, by design:
  *   - MLlib's IDF convention is ln((N+1)/(df+1)) (vs the reference's
  *     ln(N/(df+1)) replayed in [[Bm25.idf]]); we keep each route's
  *     own convention and verify each against its own oracle.
  *   - CountVectorizer holds the vocabulary on the driver (top
  *     `vocabSize` terms by corpus frequency). That is the standard
  *     MLlib contract and the documented scale bound of this route —
  *     the aggregation route in [[Bm25]] has no such bound and remains
  *     the 100 TB path; this one exists for pipeline compatibility.
  *
  * The un-vectorize step (sparse vector → (term, weight) rows) is a
  * UDF over the sparse indices — row-local, output-sized, and only on
  * this interop surface, never in the core chain.
  */
object MlPipeline {

  private def sparse(v: Vector): SparseVector = v match {
    case s: SparseVector => s
    case d: DenseVector  => d.toSparse
  }

  private val unpack = udf { (tfv: Vector, wv: Vector) =>
    val t = sparse(tfv); val w = sparse(wv)
    t.indices.indices.map { j =>
      TermCell(t.indices(j), t.values(j).toLong, w.values(j))
    }
  }

  private val unpackTf = udf { (tfv: Vector) =>
    val t = sparse(tfv)
    t.indices.indices.map(j => TfCell(t.indices(j), t.values(j).toLong))
  }

  /** The fitted pipeline + vectorized corpus: columns (doc_id, terms,
    * tfv, tfidfv). `vocabSize` bounds driver memory (MLlib contract);
    * at the test scale factors the vocabulary fits entirely. */
  def fit(docs: DataFrame, vocabSize: Int = 1 << 20): (org.apache.spark.ml.PipelineModel, DataFrame) = {
    val pipe = new Pipeline().setStages(Array(
      new RegexTokenizer().setInputCol("text").setOutputCol("raw_terms")
        .setPattern(" ").setGaps(true).setToLowercase(true)
        .setMinTokenLength(graft.functions.Text.MinTokenLength),
      new StopWordsRemover().setInputCol("raw_terms").setOutputCol("terms")
        .setStopWords(graft.functions.Text.Stopwords.toArray).setCaseSensitive(true),
      new CountVectorizer().setInputCol("terms").setOutputCol("tfv")
        .setVocabSize(vocabSize),
      new IDF().setInputCol("tfv").setOutputCol("tfidfv")))
    val model = pipe.fit(docs)
    (model, model.transform(docs))
  }

  /** (doc_id, score): Okapi BM25 scored straight off the ML-Pipeline
    * vector representation — "MLlib TF-IDF pipeline for BM25 scoring".
    * Semantics identical to [[Bm25.bm25Score]] (same k1/b, same
    * Robertson idf, same N = docs with ≥1 kept token), so it shares
    * that query's oracle. Plan shape: the doc length is a ROW-LOCAL
    * sum over the doc's own tf vector — the ML route needs no second
    * corpus aggregation for dl, only the scalar (N, avgdl) reduce that
    * rides back in one broadcast. */
  def bm25Score(docs: DataFrame, queryTerms: Seq[String] = Bm25.QueryTerms): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (model, vectorized) = fit(docs)
    val vocab = model.stages(2).asInstanceOf[CountVectorizerModel].vocabulary
    val qIdx = queryTerms.map(vocab.indexOf(_)).filter(_ >= 0)
    val cells = vectorized
      .select(col("doc_id"), unpackTf(col("tfv")).as("cells"))
      .filter(size(col("cells")) > 0)
      .withColumn("dl", expr("aggregate(cells, 0L, (acc, c) -> acc + c.tf)"))
    // scalar (N, avgdl): identical by construction on both routes
    // (MlPipelineSpec proves tf-cell equality), so compute it on the
    // cheap aggregation route instead of re-running the vectorize +
    // unpack pass a second time just to reduce it to one row
    val stats = Bm25.docLengths(docs)
      .agg(count(lit(1)).as("n_docs"), avg("dl").cast("double").as("avgdl"))
    val contrib = cells
      .select(col("doc_id"), col("dl"), explode(col("cells")).as("c"))
      .filter(col("c.idx").isin(qIdx.map(Integer.valueOf): _*))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("c.idx"))))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        Bm25.okapiTerm(col("c.tf"), col("df"), col("dl"), col("avgdl"), col("n_docs"))
          .as("contrib"))
    contrib.groupBy("doc_id").agg(round(sum("contrib"), 4).as("score"))
  }

  /** (doc_id, predicted_ok, heuristic_ok): an MLlib logistic-regression
    * quality classifier over the heuristic quality features — the
    * trainable upgrade path from [[TextAnalysis.quality]]'s fixed
    * thresholds (the standard corpus-triage evolution: heuristics
    * bootstrap labels, a model generalizes them; here the heuristic IS
    * the label source, so the spec checks agreement, not lift). Train
    * and score are both distributed; the model itself is a small
    * driver-side coefficient vector. Deterministic (fixed seed, lbfgs)
    * but not SQL-expressible → rows-only at the driver gate, agreement
    * asserted in MlPipelineSpec. */
  def qualityClassifier(docs: DataFrame): DataFrame = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.feature.VectorAssembler
    val feats = TextAnalysis.quality(docs)
    val assembled = new VectorAssembler()
      .setInputCols(Array("n_tokens", "n_distinct", "distinct_ratio",
        "stop_ratio", "mean_token_len", "rep_ratio"))
      .setOutputCol("features")
      .transform(feats)
      .withColumn("label", col("quality_ok").cast("double"))
    val model = new LogisticRegression()
      .setMaxIter(25).setRegParam(0.01).setStandardization(true)
      .fit(assembled)
    model.transform(assembled)
      .select(col("doc_id"), col("prediction").cast("int").as("predicted_ok"),
        col("label").cast("int").as("heuristic_ok"))
  }

  /** (doc_a, doc_b, jaccard): near-duplicate pairs via MLlib's
    * MinHashLSH `approxSimilarityJoin` over binarized shingle-set
    * vectors — the framework-native alternative to the hand-built
    * banding in [[Dedup.minhashCandidates]]. The reported jaccard is
    * EXACT (MLlib rescans the pair's vectors after candidate
    * generation), so every emitted pair is a true ≥ threshold pair;
    * only the candidate RECALL is probabilistic (hash-table count
    * trades recall for cost). Rows-only at the driver gate; the
    * subset + recall contract vs [[Dedup.ngramJaccard]] is asserted in
    * MlPipelineSpec. */
  def minhashLshPairs(docs: DataFrame, threshold: Double = 0.8,
                      numHashTables: Int = 6): DataFrame = {
    import org.apache.spark.ml.feature.MinHashLSH
    val sets = Dedup.shingles(docs)
      .groupBy("doc_id").agg(collect_list(col("shingle")).as("shingles"))
    val maxVocab = 1 << 20
    // fit with one slot of headroom so exactly-maxVocab distinct
    // shingles (nothing truncated) still passes the check below
    val cv = new CountVectorizer().setInputCol("shingles").setOutputCol("v")
      .setBinary(true).setVocabSize(maxVocab + 1).fit(sets)
    // a saturated vocabulary silently drops low-frequency shingles and
    // the "exact" jaccard would be computed over truncated sets —
    // breaking the subset-of-exact contract — so fail loudly instead
    // (the hand-built Dedup.minhashCandidates path has no such bound
    // and stays the 100 TB route)
    require(cv.vocabulary.length <= maxVocab,
      s"minhashLshPairs: CountVectorizer vocabulary saturated at $maxVocab distinct " +
        "shingles; jaccard over truncated sets would be inexact — use " +
        "Dedup.verifiedNearDups (unbounded, hash-based) at this corpus size")
    val vecs = cv.transform(sets).select("doc_id", "v")
    val model = new MinHashLSH().setInputCol("v").setOutputCol("hashes")
      .setNumHashTables(numHashTables).setSeed(42L).fit(vecs)
    model.approxSimilarityJoin(vecs, vecs, 1.0 - threshold, "dist")
      .select(col("datasetA.doc_id").as("doc_a"), col("datasetB.doc_id").as("doc_b"),
        round(lit(1.0) - col("dist"), 4).as("jaccard"))
      .filter(col("doc_a") < col("doc_b"))
  }

  /** (doc_id, term, tf, tfidf_ml): the ML-Pipeline TF-IDF exploded
    * back to relational rows. tfidf_ml = tf · ln((N+1)/(df+1)) where N
    * counts ALL fitted documents (MLlib's convention — token-less docs
    * still increment N). */
  def tfIdf(docs: DataFrame): DataFrame = {
    val (model, vectorized) = fit(docs)
    val vocab = model.stages(2).asInstanceOf[CountVectorizerModel].vocabulary
    val spark = docs.sparkSession
    import spark.implicits._
    val vocabDf = vocab.zipWithIndex.toSeq.toDF("term", "idx")
    vectorized
      .select(col("doc_id"), explode(unpack(col("tfv"), col("tfidfv"))).as("cell"))
      .select(col("doc_id"), col("cell.idx").as("idx"), col("cell.tf").as("tf"),
        col("cell.tfidf").as("tfidf"))
      .join(broadcast(vocabDf), "idx")
      .select(col("doc_id"), col("term"), col("tf"), round(col("tfidf"), 6).as("tfidf_ml"))
  }
}
