package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bm25, Dedup, TextAnalysis}

/** Degenerate-input behavior: operators must not throw on empty or
  * pathological corpora — at 100 TB a partition full of junk documents
  * is a certainty, not an edge case. */
class EdgeCaseSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private val junk = Seq(
    (1L, "the of and"),     // all stopwords
    (2L, "a b c"),          // all below min length
    (3L, ""),               // empty text
    (4L, "meaningful words here")).toDF("doc_id", "text")

  test("bm25 chain on an empty corpus returns empty, never throws") {
    assert(Bm25.tf(empty).count() == 0)
    assert(Bm25.bm25Score(empty).count() == 0)
    assert(Bm25.searchTopN(empty).count() == 0)
    assert(Dedup.minhashCandidates(empty).count() == 0)
    assert(Dedup.simhash(empty).count() == 0)
  }

  test("documents with no kept tokens vanish from token-based operators") {
    val tf = Bm25.tf(junk)
    assert(tf.select("doc_id").distinct().collect().map(_.getLong(0)).toSet == Set(4L))
    assert(Dedup.simhash(junk).collect().map(_.getLong(0)).toSet == Set(4L))
    // stats count only docs with kept tokens
    val stats = Bm25.corpusStats(junk).collect()(0)
    assert(stats.getLong(0) == 1L)
  }

  test("quality and langid handle empty and stopword-only docs without NaN surprises") {
    val q = TextAnalysis.langId(junk).collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(q(1L) == "en")  // pure stopwords = maximal stopword ratio
    assert(q.contains(3L)) // empty text still yields a row
  }

  test("scoring a query with no matching terms returns empty") {
    val docs = graft.sources.Tables.documents(spark, sf)
    assert(Bm25.bm25Score(docs, Seq("zzznonexistent")).count() == 0)
  }

  test("round-2 operators degrade gracefully on empty/degenerate input") {
    // clustering with no near-dup pairs → empty, no infinite iteration
    assert(Dedup.nearDupClusters(junk).count() == 0)
    // contamination with an empty probe set → empty
    val noProbes = Seq.empty[(Long, String)].toDF("probe_id", "text")
    assert(TextAnalysis.contamination(junk, noProbes).count() == 0)
    // batch search with an empty query table → empty
    val noQueries = Seq.empty[(Int, String)].toDF("query_id", "qtext")
    assert(Bm25.batchSearch(junk, noQueries).count() == 0)
    assert(Bm25.batchSearch(empty, noQueries).count() == 0)
    // table profile of an empty frame still describes every column
    val prof = graft.operators.Sketches.tableProfile(empty).collect()
    assert(prof.length == 2 && prof.forall(r => r.getLong(1) == 0 && r.getLong(2) == 0))
  }

  test("exact copies too short to shingle still cluster together") {
    val shortDups = Seq(
      (1L, "hello world"), (2L, "hello world"),   // 2 tokens: no 3-gram shingles
      (3L, "unique text entirely"),
      (10L, "x y"), (11L, "x y"), (12L, "x y")).toDF("doc_id", "text")
    val clusters = Dedup.nearDupClusters(shortDups).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("salted operators are safe with salts = 1 (degenerate salting)") {
    val wc1 = graft.operators.Skew.saltedWordCount(junk, salts = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = Bm25.tokenize(junk).groupBy("term").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wc1 == plain)
  }

  test("round-3 operators degrade gracefully on empty/degenerate input") {
    import graft.operators.Relational
    val noEvents = Seq.empty[(Long, Long, Long, String, Double)]
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    // funnel on no events: three steps, zero users each
    val f = Relational.funnel(noEvents).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(f == Map("1_signup" -> 0L, "2_click" -> 0L, "3_purchase" -> 0L))
    assert(Relational.retention(noEvents).count() == 0)
    assert(Relational.gapFill(noEvents).count() == 0)
    assert(Relational.valueOutliers(noEvents).count() == 0)
    assert(Relational.typeIntervals(noEvents).count() == 0)
    // single-event user: one interval, no outlier (no prior state)
    val one = Seq((1L, 5L, 9L, "click", 10.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(Relational.typeIntervals(one).count() == 1)
    assert(Relational.valueOutliers(one).count() == 0)
    // text ops on the junk corpus: no NaN/throw
    assert(TextAnalysis.zipfProfile(junk).count() > 0)
    assert(TextAnalysis.bigramPmi(junk, minCount = 1, k = 5).count() <= 5)
    assert(TextAnalysis.charTrigrams(
      Seq.empty[(Long, String, String)].toDF("doc_id", "text", "lang")).count() == 0)
    assert(TextAnalysis.stemmedVocab(empty).count() == 0)
    assert(TextAnalysis.segmentRoundTrip(junk).count() == junk.count())
  }

  test("round-4 operators degrade gracefully on empty/degenerate input") {
    import graft.operators.{Positional, Vectors}
    // positional chain: empty corpus and junk corpus never throw
    assert(Positional.positionalPostings(empty).count() == 0)
    assert(Positional.phraseSearch(empty).count() == 0)
    assert(Positional.bm25fScore(empty).count() == 0)
    // junk corpus: only doc 4 has kept tokens; positions survive
    assert(Positional.positionalPostings(junk).select("doc_id").distinct().count() == 1)
    // never-matchable phrase terms are rejected loudly, not empty-silently
    intercept[IllegalArgumentException](Positional.phraseSearch(junk, Seq("the", "part")))
    intercept[IllegalArgumentException](Positional.phraseSearch(junk, Seq("Part")))
    intercept[IllegalArgumentException](Positional.phraseSearch(junk, Seq("two words")))
    // gopher rules: every doc gets a verdict, empty text included
    assert(TextAnalysis.gopherRules(junk).count() == junk.count())
    assert(TextAnalysis.trainSplit(empty).count() == 0)
    // vectors: empty embeddings table
    val noVecs = Seq.empty[(Long, Int, Array[Float])].toDF("vec_id", "label", "embedding")
    assert(Vectors.centroidOutliers(noVecs).count() == 0)
    assert(Vectors.knnClassify(noVecs).count() == 0)
    // pagerank on an empty graph is rejected (rank of nothing is undefined)
    intercept[IllegalArgumentException](graft.operators.Graph.pagerank(empty))
  }

  test("segmentRoundTrip on a corpus with an empty-text doc") {
    // doc 3 has empty text: split('', ' ') yields [""] (1 token) while
    // segmenting the de-spaced empty string yields 0 segments, so the
    // doc reports non-exact rather than throwing — the honest outcome
    val r = TextAnalysis.segmentRoundTrip(junk).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getBoolean(3))).toMap
    assert(r(3L) == ((1L, 0L, false)), s"empty doc reported ${r(3L)}")
    assert(r(4L)._3, "normal doc must round-trip")
  }

  test("index update with all-NULL doc_ids takes the unranged path, not an NPE") {
    val path = "/tmp/graft-test-idx-nullids"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    graft.operators.Bm25Index.build(
      Seq((1L, "alpha beta gamma words")).toDF("doc_id", "text"), path)
    // a non-empty batch whose every doc_id is NULL: min/max are NULL —
    // must fall back to checking every delta (no range), never NPE
    val nullBatch = Seq((null.asInstanceOf[java.lang.Long], "delta epsilon words"))
      .toDF("doc_id", "text")
    graft.operators.Bm25Index.update(nullBatch, path, tag = "nullid-batch")
    // the one-doc batch must actually land in its delta's doclen
    assert(spark.read.parquet(s"$path/delta-nullid-batch/doclen").count() == 1)
  }

  test("bloom semi-join works when both sides share the SAME key column name") {
    val large = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val small = Seq(Tuple1(2L), Tuple1(3L)).toDF("k")
    val got = graft.operators.Skew.bloomSemiJoin(large, small, "k", "k")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(2L, 3L))
  }

  test("graft_bucket on a non-double child fails at analysis, not in eval") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(Tuple1("notadouble")).toDF("v")
        .select(graft.functions.Native.bucket(col("v"), Array(1.0, 2.0))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("double"), e.getMessage)
  }

  test("graft_segment keeps supplementary (surrogate-pair) chars whole on OOV") {
    // U+2000B occupies two UTF-16 units; the OOV fallback must emit it
    // as ONE token, never split surrogates
    val toks = spark.sql(
      "SELECT graft_segment('好𠀋吗', array('好', '吗')) AS t")
      .collect()(0).getSeq[String](0)
    assert(toks == Seq("好", "𠀋", "吗"), s"got $toks")
  }

  test("round-6 operators degrade gracefully on empty/degenerate input") {
    import graft.operators.SearchExtras
    // empty corpus: retrieval/ranking ops return empty, never throw
    assert(SearchExtras.booleanSearch(empty).count() == 0)
    assert(SearchExtras.proximityTopN(empty).count() == 0)
    assert(SearchExtras.spellCorrect(empty).count() == 0)
    assert(SearchExtras.lmDirichletScore(empty).count() == 0)
    assert(SearchExtras.maxScoreTopN(empty).count() == 0)
    // must-terms are required — an all-optional boolean query has no
    // defined NOT semantics under postings pruning
    intercept[IllegalArgumentException] {
      SearchExtras.booleanSearch(junk, must = Nil)
    }
    // never-producible terms (stopword / uppercase / too short) are
    // rejected loudly, not silently unsatisfiable — in every slot
    intercept[IllegalArgumentException] {
      SearchExtras.booleanSearch(junk, must = Seq("the", "meaningful"))
    }
    intercept[IllegalArgumentException] {
      SearchExtras.booleanSearch(junk, must = Seq("meaningful"), none = Seq("Spark"))
    }
    intercept[IllegalArgumentException] {
      SearchExtras.lmDirichletScore(junk, Seq("meaningful", "a"))
    }
    // duplicated LM query terms collapse (matched sum and |q| penalty
    // must range over the same set)
    val lmOnce = SearchExtras.lmDirichletScore(junk, Seq("meaningful")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val lmDup = SearchExtras.lmDirichletScore(junk, Seq("meaningful", "meaningful"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(lmDup == lmOnce, "duplicated query term changed LM-Dirichlet scores")
    // mixed-case inputs hit the lowercase corpus/vocabulary
    assert(SearchExtras.snippets(junk, Seq("MEANINGFUL")).count() == 1)
    val sc = SearchExtras.spellCorrect(junk, Seq("Meaningfull"), maxDist = 2, k = 1)
      .collect()
    assert(sc.length == 1 && sc.head.getString(1) == "meaningful" && sc.head.getLong(2) == 1L,
      s"capitalized typo mis-ranked: ${sc.toList}")
    // single-token and empty-text docs chunk to exactly one window
    val ch = TextAnalysis.seqChunks(junk).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(ch.filter(_._1 == 3L).toList == List((3L, 0L, 1L)),
      "empty text splits to one single-empty-token chunk (split semantics)")
    assert(ch.count(_._1 == 2L) == 1)
    // packing: a doc larger than the cap gets a bin of its own and
    // packing continues after it
    val wide = Seq(
      (1L, "w " * 9 + "w", "s"),     // 10 tokens
      (2L, "w " * 399 + "w", "s"),   // 400 tokens > cap
      (3L, "w " * 9 + "w", "s"))
      .toDF("doc_id", "text", "source")
    val packed = TextAnalysis.packSequences(wide, cap = 256L).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(packed == Map(1L -> 0L, 2L -> 1L, 3L -> 2L), s"got $packed")
  }
}
