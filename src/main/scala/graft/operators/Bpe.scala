package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING — the step a training-data
  * pipeline runs before token counting is meaningful (the engine's
  * q_token_count BPE-ish regex is the heuristic stand-in; this is the
  * real learner). The industry-standard shape (Sennrich et al. 2016;
  * HF tokenizers / SentencePiece do the same): BPE never iterates
  * over the corpus — it iterates over the WORD-FREQUENCY DICTIONARY,
  * which is vocabulary-sized. So the corpus-scale part is exactly one
  * Spark aggregation (word counts, one shuffle on a uniform key), and
  * the merge loop runs driver-side over the capped vocabulary, the
  * same division of labor as [[TextAnalysis]]'s segmentation
  * dictionary (enforced `require` cap = the honesty guard: a 10⁸-term
  * web vocabulary must be pruned by min-count BEFORE the loop, which
  * is itself a relational filter).
  */
object Bpe {

  /** (word, wcount): the corpus's word-frequency dictionary — raw
    * whitespace tokens (BPE trains on raw words; stopwords carry
    * signal for subwording). ONE corpus pass, vocabulary-sized out. */
  def wordCounts(docs: DataFrame): DataFrame =
    docs.select(explode(graft.functions.Text.rawTokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("wcount"))

  /** (left, right, n): the FIRST BPE iteration's pair statistics —
    * adjacent single-character pairs of every vocabulary word,
    * weighted by word count and position multiplicity ("aaa" yields
    * (a,a) twice per occurrence). This is the relational primitive
    * the merge loop repeats; exposed as its own oracle-checked
    * operator because it is the corpus-shaped part of training (pure
    * map+explode over the vocabulary relation, one small agg). */
  def pairCounts(docs: DataFrame): DataFrame =
    wordCounts(docs)
      .filter(length(col("word")) >= 2)
      .select(col("wcount"), explode(expr(
        """transform(sequence(1, length(word) - 1),
          |  i -> struct(substr(word, CAST(i AS INT), 1) AS left,
          |              substr(word, CAST(i AS INT) + 1, 1) AS right))""".stripMargin)).as("p"))
      .groupBy(col("p.left").as("left"), col("p.right").as("right"))
      .agg(sum(col("wcount")).as("n"))

  /** (rank, left, right, n): the first `numMerges` learned BPE merges
    * in training order. Greedy: each step merges the highest-count
    * adjacent symbol pair (ties: lexicographic (left, right) asc —
    * fully deterministic, no RNG), rewriting the dictionary's symbol
    * sequences left-to-right non-overlapping. The dictionary is
    * collected under an enforced cap — the corpus never is. Not
    * SQL-expressible (the rewrite at step k depends on all k-1 prior
    * merges), so the key is rows-only, spec-gated on the invariants:
    * merge counts non-increasing, encode round-trips, rerun-identical. */
  def trainMerges(docs: DataFrame, numMerges: Int = 20,
      maxVocab: Int = 100000): DataFrame = {
    val spark = docs.sparkSession
    val vocabDf = wordCounts(docs)
    val n = vocabDf.count()
    require(n <= maxVocab,
      s"BPE dictionary has $n words > cap $maxVocab — prune by min-count " +
        "(a relational filter) before training; the driver loop is vocab-resident by design")
    val vocab: Array[(Array[String], Long)] = vocabDf.collect()
      .map(r => (r.getString(0).map(_.toString).toArray, r.getLong(1)))
    val merges = learn(vocab, numMerges)
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((l, r, c), i) => (i.toLong, l, r, c) }
      .toSeq.toDF("rank", "left", "right", "n")
  }

  /** (doc_id, n_words, n_bpe_tokens): the corpus tokenized under the
    * learned merges — the ACTUAL token count a trained tokenizer
    * yields (q_token_count's regex is the heuristic; this is the
    * real thing). Scale split, same as training: the iterative merge
    * application runs once per DISTINCT word (the capped vocabulary,
    * driver-side), producing a tiny (word → subword count) relation
    * that BROADCAST-joins back to the corpus's exploded tokens — the
    * corpus is never encoded row-by-row, and the join adds no
    * shuffle beyond the per-doc count aggregation. Not
    * SQL-expressible (inherits the merge loop) → rows-only,
    * spec-gated: counts bounded by [n_words, n_chars], monotone
    * non-increasing in numMerges, round-trip via [[encode]]. */
  def encodeCorpus(docs: DataFrame, numMerges: Int = 20,
      maxVocab: Int = 100000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vocabDf = wordCounts(docs)
    val n = vocabDf.count()
    require(n <= maxVocab,
      s"BPE dictionary has $n words > cap $maxVocab — prune by min-count " +
        "before encoding; the encode table is vocab-resident by design")
    val vocab = vocabDf.collect().map(r => (r.getString(0), r.getLong(1)))
    val merges = learn(
      vocab.map { case (w, c) => (w.map(_.toString).toArray, c) }, numMerges)
      .map { case (l, r, _) => (l, r) }
    val lens = vocab.toSeq
      .map { case (w, _) => (w, encode(w, merges).length.toLong) }
      .toDF("word", "n_sub")
    docs.select(col("doc_id"),
        explode(graft.functions.Text.rawTokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .join(broadcast(lens), Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("n_sub").as("n_bpe_tokens"))
  }

  /** (lang, n_words, n_bpe_tokens, fertility): tokenizer FERTILITY per
    * language — mean subword tokens emitted per word under the learned
    * BPE merges (the standard tokenizer-equity metric: a tokenizer
    * trained on skewed data over-segments under-represented languages,
    * inflating their effective sequence length and training cost;
    * cf. the multilingual-tokenizer fairness literature). Rides
    * [[encodeCorpus]]'s plan unchanged — encode once per DISTINCT
    * word on the capped driver vocab, broadcast the subword lengths,
    * aggregate by the doc's language instead of by doc. One division
    * on exact integer sums, rounded. */
  def fertility(docs: DataFrame, numMerges: Int = 20,
      maxVocab: Int = 100000): DataFrame =
    encodeCorpus(docs, numMerges, maxVocab)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy("lang")
      .agg(sum("n_words").as("n_words"), sum("n_bpe_tokens").as("n_bpe_tokens"))
      .select(col("lang"), col("n_words"), col("n_bpe_tokens"),
        round(col("n_bpe_tokens").cast("double") / col("n_words"), 4)
          .as("fertility"))

  /** (lang, n_words, n_wp_tokens, fertility): tokenizer fertility per
    * language under the learned WORDPIECE merges — the third column of
    * the trainer-equity comparison ([[fertility]] gives BPE's,
    * Unigram.fertility the unigram-LM's; a language's cost under all
    * three is the evidence a tokenizer bake-off actually needs).
    * Identical plan to [[fertility]]: encode once per DISTINCT word on
    * the capped driver vocab (training-order rewrite = the encode, the
    * family convention), broadcast the subword lengths, aggregate by
    * language. */
  def wordpieceFertility(docs: DataFrame, numMerges: Int = 20,
      maxVocab: Int = 100000): DataFrame =
    wordpieceEncodeCorpus(docs, numMerges, maxVocab)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy("lang")
      .agg(sum("n_words").as("n_words"), sum("n_wp_tokens").as("n_wp_tokens"))
      .select(col("lang"), col("n_words"), col("n_wp_tokens"),
        round(col("n_wp_tokens").cast("double") / col("n_words"), 4)
          .as("fertility"))

  /** (doc_id, n_words, n_wp_tokens): the corpus tokenized under the
    * learned WORDPIECE merges — the encode SERVING key that closes the
    * trainer family's symmetry (BPE and unigram both expose
    * train/encode/fertility; r16 shipped WordPiece train+fertility
    * only). Identical scale split to [[encodeCorpus]]: the
    * likelihood-scored merge chain applies once per DISTINCT word on
    * the capped driver vocabulary (training-order rewrite = the
    * encode, the family convention), the (word → subword count)
    * relation broadcast-joins back to the corpus tokens — the corpus
    * is never encoded row-by-row. The oracle replays the recursive
    * likelihood-scored chain's final vocab rewrite (the
    * q_wordpiece_train CTE ridden the way q_bpe_encode rides the BPE
    * chain). */
  def wordpieceEncodeCorpus(docs: DataFrame, numMerges: Int = 20,
      maxVocab: Int = 100000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vocabDf = wordCounts(docs)
    val n = vocabDf.count()
    require(n <= maxVocab,
      s"WordPiece dictionary has $n words > cap $maxVocab — prune by " +
        "min-count before encoding; the encode table is vocab-resident by design")
    val vocab = vocabDf.collect().map(r => (r.getString(0), r.getLong(1)))
    val merges = learnWordpiece(
      vocab.map { case (w, c) => (w.map(_.toString).toArray, c) }, numMerges)
      .map { case (l, r, _, _) => (l, r) }
    val lens = vocab.toSeq
      .map { case (w, _) => (w, encode(w, merges).length.toLong) }
      .toDF("word", "n_sub")
    docs.select(col("doc_id"),
        explode(graft.functions.Text.rawTokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .join(broadcast(lens), Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("n_sub").as("n_wp_tokens"))
  }

  /** The driver-side greedy loop over the (symbols, count) dictionary.
    * Returns (left, right, pairCount) in merge order. */
  private[graft] def learn(vocab0: Array[(Array[String], Long)],
      numMerges: Int): Seq[(String, String, Long)] = {
    var vocab = vocab0
    val out = Seq.newBuilder[(String, String, Long)]
    var k = 0
    var done = false
    while (k < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + c
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((l, r, c))
        vocab = applyMerge(vocab, l, r)
        k += 1
      }
    }
    out.result()
  }

  /** Rewrite every dictionary word under one merge — left-to-right,
    * non-overlapping (shared by the BPE and WordPiece loops, and the
    * contract the oracle's parenthesized string replace mirrors). */
  private def applyMerge(vocab: Array[(Array[String], Long)],
      l: String, r: String): Array[(Array[String], Long)] =
    vocab.map { case (syms, wc) =>
      val b = Array.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
          b += (l + r); i += 2
        } else { b += syms(i); i += 1 }
      }
      (b.result(), wc)
    }

  /** The WordPiece selection loop: same dictionary walk and rewrite
    * as [[learn]], but each step merges the pair maximizing the
    * LIKELIHOOD score count(pair) / (count(left)·count(right)) — the
    * published WordPiece criterion (Schuster & Nakajima 2012; the
    * merge that most raises a unigram LM's corpus likelihood) —
    * instead of the raw pair count. Symbol counts re-derive from the
    * CURRENT symbol sequences each step. The score is one IEEE
    * division of exact integers (products through double — exactly
    * rounded, engine-identical), ties break (left, right) asc.
    * Returns (left, right, pairCount, score) in merge order. */
  private[graft] def learnWordpiece(vocab0: Array[(Array[String], Long)],
      numMerges: Int): Seq[(String, String, Long, Double)] = {
    var vocab = vocab0
    val out = Seq.newBuilder[(String, String, Long, Double)]
    var k = 0
    var done = false
    while (k < numMerges && !done) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      val syms = scala.collection.mutable.Map.empty[String, Long]
      vocab.foreach { case (ss, c) =>
        var i = 0
        while (i < ss.length) {
          syms(ss(i)) = syms.getOrElse(ss(i), 0L) + c
          if (i < ss.length - 1) {
            val p = (ss(i), ss(i + 1))
            pairs(p) = pairs.getOrElse(p, 0L) + c
          }
          i += 1
        }
      }
      if (pairs.isEmpty) done = true
      else {
        val ((l, r), c) = pairs.minBy { case ((pl, pr), pc) =>
          (-(pc.toDouble / (syms(pl).toDouble * syms(pr))), pl, pr) }
        out += ((l, r, c, c.toDouble / (syms(l).toDouble * syms(r))))
        vocab = applyMerge(vocab, l, r)
        k += 1
      }
    }
    out.result()
  }

  /** (rank, left, right, n, score): the first `numMerges` WordPiece
    * merges in training order — the LIKELIHOOD-driven sibling of
    * [[trainMerges]] completing the trainer family (BPE merges the
    * most FREQUENT pair; WordPiece the pair whose fusion most raises
    * unigram-LM likelihood, so a frequent-but-expected pair loses to
    * a rarer-but-surprising one; the unigram trainer prunes top-down
    * instead). Same scale split as BPE: ONE corpus aggregation
    * (word counts), then the loop runs over the capped
    * vocabulary-sized dictionary driver-side — the corpus is never
    * iterated. `n` is the winning pair's count, `score` its
    * likelihood ratio (round 6; selection uses the unrounded IEEE
    * value, identical in the replay). */
  def trainWordpiece(docs: DataFrame, numMerges: Int = 20,
      maxVocab: Int = 100000): DataFrame = {
    val spark = docs.sparkSession
    val vocabDf = wordCounts(docs)
    val n = vocabDf.count()
    require(n <= maxVocab,
      s"WordPiece dictionary has $n words > cap $maxVocab — prune by " +
        "min-count (a relational filter) before training; the driver loop " +
        "is vocab-resident by design")
    val vocab: Array[(Array[String], Long)] = vocabDf.collect()
      .map(r => (r.getString(0).map(_.toString).toArray, r.getLong(1)))
    val merges = learnWordpiece(vocab, numMerges)
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((l, r, c, s), i) => (i.toLong, l, r, c, s) }
      .toDF("rank", "left", "right", "n", "score_raw")
      .select(col("rank"), col("left"), col("right"), col("n"),
        round(col("score_raw"), 6).as("score"))
  }

  /** Encode one word with a learned merge list (driver-side helper for
    * the spec's round-trip check — application order = training
    * order, exactly how BPE inference applies ranks). */
  private[graft] def encode(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms = word.map(_.toString).toArray
    merges.foreach { case (l, r) =>
      val b = Array.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
          b += (l + r); i += 2
        } else { b += syms(i); i += 1 }
      }
      syms = b.result()
    }
    syms.toSeq
  }
}
