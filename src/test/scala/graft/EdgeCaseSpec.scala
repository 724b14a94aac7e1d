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
}
