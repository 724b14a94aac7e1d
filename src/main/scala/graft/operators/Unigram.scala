package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Lineage._

/** Unigram-LM tokenizer TRAINING (Kudo 2018's subword regularization
  * trainer, the SentencePiece default) — the missing rung of the
  * tokenizer ladder (regex → POS → dictionary → BPE → unigram):
  * seed a substring vocabulary, iterate EM (segment the word
  * dictionary under current piece scores, re-estimate scores from the
  * segmentation counts, prune unused pieces), ship the surviving
  * scored vocabulary.
  *
  * Exactness contract (the integer-Lloyd's discipline that promoted
  * PQ/IVF training to hash-checked): the E-step is HARD-EM — a
  * Viterbi best-segmentation per dictionary word — run on an INTEGER
  * SURROGATE COST grid: piece probability p̂ = count·G div total
  * (floor, G = 10⁹) and piece cost = G − p̂, so a segmentation's cost
  * is Σ(G − p̂) = |pieces|·G − Σp̂ — lexicographically "fewest pieces,
  * then most probable", the longest-match-biased objective a unigram
  * segmenter wants — and EVERY quantity in the recurrence is a
  * BIGINT: no logs, no floats, no ulp hazards. Ties break on the
  * smallest predecessor index (= the longest last piece), so the DP
  * is fully deterministic and the whole unrolled-EM recurrence
  * replays bit-exactly in the DuckDB oracle (which mirrors the same
  * integer DP as a recursive CTE carrying the cost/path lists). The
  * true −log p objective is traded for engine-portable exactness;
  * the trade is declared, not hidden.
  *
  * Scale shape (the [[Bpe]] division of labor): the corpus-scaled
  * part is ONE aggregation (the word-frequency dictionary, one
  * shuffle on a uniform key). Everything iterative runs at
  * DICTIONARY cardinality: candidate arcs are a per-word
  * explode+broadcast-join against the capped vocabulary (≤ maxVocab
  * pieces — the enforced `require` honesty guard), and the Viterbi
  * DP is ONE codegen'd higher-order `aggregate` per dictionary row —
  * no corpus re-scan, no driver loop over words, no UDF. Encode
  * broadcast-joins the per-word piece counts back to the corpus
  * exactly as [[Bpe.encodeCorpus]] does.
  *
  * Charset contract (shared with the BPE/segmenter oracles): ASCII /
  * BMP corpus — Spark `substr` walks UTF-16 code units while DuckDB
  * walks codepoints; the generated testdata is ASCII words. Words
  * longer than [[MaxWordLen]] are dropped from the dictionary (a
  * curated trainer prunes pathological tokens before training).
  */
object Unigram {

  /** Probability grid: p̂ = count·Grid div total ∈ [0, Grid]. A
    * 24-piece word costs ≤ 24·Grid ≪ 2⁶³. */
  val Grid = 1000000000L

  /** Longest candidate piece. Bounds the per-word arc fan-out
    * (≤ MaxPieceLen·|word|) and the seed explosion at corpus scale —
    * and sits BELOW the corpus's common word lengths on purpose: a
    * cap at or above them would let "fewest pieces" collapse every
    * word to itself and the trainer would learn a word list, not a
    * subword vocabulary. */
  val MaxPieceLen = 4

  /** Words above this length are dropped from the training dict. */
  val MaxWordLen = 64

  /** EM rounds — unrolled in the oracle, so the count is part of the
    * operator contract, not a convergence heuristic. */
  val EmRounds = 2

  private val unkCost = s"${Grid}L"

  /** (word, freq): the kept-token word-frequency dictionary — the
    * trainer speaks the same tokens the corpus stats do (the
    * [[TextAnalysis.tokenBudget]] convention); one corpus pass,
    * dictionary-sized out. */
  def wordDict(docs: DataFrame): DataFrame =
    Bm25.tokenize(docs)
      .filter(length(col("term")) <= MaxWordLen)
      .groupBy(col("term").as("word")).agg(count(lit(1)).as("freq"))

  /** All candidate substrings of `word` with start/end positions:
    * array of (j0 1-based start, i 1-based end, piece). */
  private val substrArcs = s"""
    flatten(transform(sequence(1, CAST(length(word) AS INT)), j0 ->
      transform(sequence(j0, CAST(least(length(word), j0 + ${MaxPieceLen - 1}) AS INT)), i ->
        named_struct('j0', j0, 'i', i,
          'piece', substr(word, j0, i - j0 + 1)))))"""

  /** (piece, cnt): seed statistics — every substring up to
    * [[MaxPieceLen]] of every dictionary word, weighted by word
    * frequency, capped to the `maxVocab` heaviest (count desc, piece
    * asc — deterministic). */
  def seedPieces(wc: DataFrame, maxVocab: Int): DataFrame =
    wc.select(col("freq"), explode(expr(substrArcs)).as("a"))
      .groupBy(col("a.piece").as("piece")).agg(sum("freq").as("cnt"))
      .orderBy(col("cnt").desc, col("piece").asc).limit(maxVocab)

  /** The grand count total, collected (counts are dictionary-sized —
    * ≤ maxVocab rows, already lineage-cut at every call site — so the
    * agg is a trivial job) WITH the overflow honesty guard: the grid
    * step computes `cnt · Grid` in BIGINT under non-ANSI Spark, which
    * wraps silently above 2⁶³; since cnt ≤ total, bounding
    * total ≤ Long.MaxValue / Grid (≈ 9.2e9 aggregate piece mass)
    * bounds every per-piece product. The SUM itself is detected too:
    * it would need ≥ 2⁶³ mass to wrap, 10⁹× the guarded bound
    * (ADVICE r15). */
  private def checkedTotal(counts: DataFrame): Long = {
    val row = counts.agg(sum("cnt")).head
    val total = if (row.isNullAt(0)) 0L else row.getLong(0)
    require(total >= 0 && total <= Long.MaxValue / Grid,
      s"aggregate piece count $total exceeds Long.MaxValue/Grid " +
        s"(${Long.MaxValue / Grid}) — the integer probability grid " +
        "would overflow; rescale counts (e.g. sample the training " +
        "dictionary) before gridding")
    total
  }

  /** (piece, cnt, cost): the M-step — floor-gridded probabilities
    * over the CURRENT counts, surrogate cost = Grid − p̂. The total is
    * a [[checkedTotal]] literal (same value the broadcast scalar
    * carried; the collect IS the overflow guard). */
  private[graft] def mStep(counts: DataFrame): DataFrame = {
    val total = checkedTotal(counts)
    counts.select(col("piece"), col("cnt"),
      (lit(Grid) - expr(s"cnt * ${Grid}L div ${total}L")).as("cost"))
  }

  /** Forward pass of the per-word integer Viterbi as ONE codegen'd
    * higher-order `aggregate`: state = array of (best cost, winning
    * predecessor j0) per prefix; at prefix i the candidates are
    * (predecessor j0, piece word[j0..i]) for the last ≤ MaxPieceLen
    * starts — a vocab arc at its gridded cost, or the UNK single-char
    * arc at cost Grid; `array_min` on the (cost, j0) struct IS the
    * deterministic tie-break (smallest predecessor = longest last
    * piece). */
  private val viterbiForward = s"""
    aggregate(
      sequence(1, CAST(length(word) AS INT)),
      array(named_struct('cost', 0L, 'j0', 0)),
      (acc, i) -> concat(acc, array(
        array_min(filter(transform(
          sequence(CAST(greatest(1, i - ${MaxPieceLen - 1}) AS INT), i),
          j0 -> named_struct(
            'cost', element_at(acc, j0).cost +
              CASE WHEN i = j0
                   THEN coalesce(element_at(arcs, concat(j0, '_', i)), $unkCost)
                   ELSE element_at(arcs, concat(j0, '_', i)) END,
            'j0', j0)),
          x -> x.cost IS NOT NULL)))))"""

  /** Backward pass: walk the winning predecessors from the full word
    * back to the empty prefix, prepending each piece — at most
    * length(word) steps, no-ops once the cursor reaches 0. */
  private val viterbiBackward = s"""
    aggregate(
      sequence(1, CAST(length(word) AS INT)),
      named_struct('pos', CAST(length(word) AS INT),
                   'pieces', CAST(array() AS ARRAY<STRING>)),
      (acc, x) -> CASE WHEN acc.pos <= 0 THEN acc ELSE named_struct(
        'pos', element_at(bp, acc.pos + 1).j0 - 1,
        'pieces', concat(
          array(substr(word, element_at(bp, acc.pos + 1).j0,
            acc.pos - element_at(bp, acc.pos + 1).j0 + 1)),
          acc.pieces)) END,
      acc -> acc.pieces)"""

  /** (word, freq, pieces): every dictionary word segmented under the
    * given vocab costs. */
  private[graft] def segmentDict(wc: DataFrame, vocab: DataFrame): DataFrame = {
    val arcs = wc
      .select(col("word"), explode(expr(substrArcs)).as("a"))
      .join(broadcast(vocab.select(col("piece"), col("cost"))),
        col("a.piece") === col("piece"))
      .groupBy("word")
      .agg(map_from_entries(collect_list(
        struct(concat(col("a.j0"), lit("_"), col("a.i")).as("k"),
          col("cost").as("v")))).as("arcs"))
    wc.join(arcs, Seq("word"), "left")
      .withColumn("arcs",
        coalesce(col("arcs"), expr("map('', CAST(NULL AS BIGINT))")))
      .withColumn("bp", expr(viterbiForward))
      .withColumn("pieces", expr(viterbiBackward))
      .select("word", "freq", "pieces")
  }

  /** One E-step: piece counts over the best segmentations, restricted
    * to the live vocab (UNK steps segment but never resurrect a
    * pruned piece — Kudo's prune direction). */
  private def eStep(wc: DataFrame, vocab: DataFrame): DataFrame =
    segmentDict(wc, vocab)
      .select(col("freq"), explode(col("pieces")).as("piece"))
      .groupBy("piece").agg(sum("freq").as("cnt"))
      .join(vocab.select("piece"), Seq("piece"), "left_semi")

  /** (piece, n, p): the trained unigram vocabulary after
    * [[EmRounds]] hard-EM rounds — surviving pieces with their final
    * segmentation counts and floor-gridded probabilities. */
  def train(docs: DataFrame, maxVocab: Int = 2048): DataFrame = {
    val (vocab, _) = trainedVocab(docs, maxVocab)
    val total = checkedTotal(vocab)
    vocab.select(col("piece"), col("cnt").as("n"),
      expr(s"cnt * ${Grid}L div ${total}L").as("p"))
  }

  /** The trained (piece, cnt, cost) vocab + the word dict it was
    * trained on (shared by [[train]] and [[encodeCorpus]]). Each EM
    * round's counts are lineage-cut: word-dictionary-sized. */
  private def trainedVocab(docs: DataFrame,
                           maxVocab: Int): (DataFrame, DataFrame) = {
    val wc = wordDict(docs).cutLineage()
    var vocab = mStep(seedPieces(wc, maxVocab).cutLineage())
    for (_ <- 1 to EmRounds)
      vocab = mStep(eStep(wc, vocab).cutLineage())
    (vocab, wc)
  }

  /** The trained (piece, cnt, cost) vocabulary as a relation — the
    * offline artifact an encode deployment stages (the trained-ANN
    * prestage convention: training is the one-off build, encoding is
    * the serve measurand). */
  def trainedVocabDf(docs: DataFrame, maxVocab: Int = 2048): DataFrame =
    trainedVocab(docs, maxVocab)._1

  /** (doc_id, n_words, n_unigram_tokens): the corpus tokenized under
    * the trained vocabulary — per-word Viterbi piece counts (UNK
    * steps count as one piece each) broadcast-joined back to the
    * corpus tokens, the [[Bpe.encodeCorpus]] shape. */
  def encodeCorpus(docs: DataFrame, maxVocab: Int = 2048): DataFrame =
    encodeFrom(docs, trainedVocab(docs, maxVocab)._1)

  /** (lang, n_words, n_unigram_tokens, fertility): tokenizer
    * fertility per language under the trained unigram vocab — the
    * [[Bpe.fertility]] equity metric on the ladder's top rung, so the
    * two learned tokenizers compare on the same table. */
  def fertilityFrom(docs: DataFrame, vocab: DataFrame): DataFrame =
    encodeFrom(docs, vocab)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy("lang")
      .agg(sum("n_words").as("n_words"),
        sum("n_unigram_tokens").as("n_unigram_tokens"))
      .select(col("lang"), col("n_words"), col("n_unigram_tokens"),
        round(col("n_unigram_tokens").cast("double") / col("n_words"), 4)
          .as("fertility"))

  /** [[encodeCorpus]] against an externally-staged trained vocab
    * (piece, cost, …): the corpus-scaled work here is the word dict +
    * the broadcast join — the training never reruns. */
  def encodeFrom(docs: DataFrame, vocab: DataFrame): DataFrame = {
    val lens = segmentDict(wordDict(docs).cutLineage(), vocab)
      .select(col("word"), size(col("pieces")).cast("long").as("n_sub"))
    Bm25.tokenize(docs)
      .filter(length(col("term")) <= MaxWordLen)
      .select(col("doc_id"), col("term").as("word"))
      .join(broadcast(lens), Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("n_sub").as("n_unigram_tokens"))
  }
}
