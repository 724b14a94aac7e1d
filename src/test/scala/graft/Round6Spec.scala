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

  test("boolean search: exact AND/OR/NOT set semantics vs a literal per-doc check") {
    val terms = Bm25.tokenize(docs).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).map { case (d, rs) => d -> rs.map(_._2).toSet }
    val expected = terms.filter { case (_, ts) =>
      ts("spark") && ts("query") && (ts("join") || ts("merge")) && !ts("slow")
    }.keySet
    val got = operators.SearchExtras.booleanSearch(docs).collect().map(_.getLong(0)).toSet
    assert(got == expected)
    assert(got.nonEmpty && got.size < terms.size, "boolean filter is vacuous at this sf")
  }

  test("spell correct: every suggestion within maxDist; best-ranked is a true nearest") {
    val rows = operators.SearchExtras.spellCorrect(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) => if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    rows.foreach { case (q, s, dist, _, _) =>
      assert(lev(q, s) == dist && dist <= 2, s"($q, $s): dist $dist != ${lev(q, s)}")
    }
    // 'qery' must correct to 'query' at rank 1 (distance 1, unique)
    val best = rows.filter(r => r._1 == "qery" && r._5 == 1L)
    assert(best.length == 1 && best.head._2 == "query", s"qery corrected to ${best.map(_._2).toList}")
  }

  test("proximity: min_gap is the true minimum pairwise distance of distinct query terms") {
    val pos = operators.Positional.termPositions(docs)
      .filter(col("term").isin(Bm25.QueryTerms: _*)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    val expected = pos.flatMap { case (d, rs) =>
      val gaps = for {
        (_, ta, pa) <- rs; (_, tb, pb) <- rs if ta < tb
      } yield math.abs(pa - pb)
      if (gaps.isEmpty) None else Some(d -> gaps.min)
    }
    val got = operators.SearchExtras.proximityTopN(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == math.min(20, expected.size))
    got.foreach { case (d, g) => assert(expected(d) == g, s"doc $d: $g != ${expected(d)}") }
    // returned docs are exactly the k smallest under (gap, doc_id)
    val want = expected.toSeq.sortBy { case (d, g) => (g, d) }.take(20).toSet
    assert(got.toSet == want)
  }

  test("facets: counts match per-facet-value matched-doc counts; only matching docs counted") {
    val matched = Bm25.tokenize(docs).filter(col("term").isin(Bm25.QueryTerms: _*))
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    val dims = docs.select("doc_id", "lang", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .filter(r => matched(r._1))
    val got = operators.SearchExtras.facets(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val expLang = dims.groupBy(_._2).map { case (v, rs) => ("lang", v) -> rs.length.toLong }
    val expSrc = dims.groupBy(_._3).map { case (v, rs) => ("source", v) -> rs.length.toLong }
    assert(got == expLang ++ expSrc)
  }

  test("seq pack: bins respect the cap, are contiguous in doc_id order, and match a literal greedy fold") {
    val cap = 256L
    val got = operators.TextAnalysis.packSequences(docs, cap).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val bySource = docs.select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ", -1).length.toLong))
      .groupBy(_._2)
    val expected = bySource.values.flatMap { rs =>
      var bin = 0L; var fill = -1L
      rs.sortBy(_._1).map { case (d, s, n) =>
        if (fill < 0L) fill = n
        else if (fill + n <= cap) fill += n
        else { bin += 1L; fill = n }
        (d, s, n, bin)
      }
    }.toSet
    assert(got.toSet == expected)
    // bins genuinely coalesce, and only single-doc bins may exceed cap
    val bins = got.groupBy(r => (r._2, r._4)).values
    assert(bins.exists(_.length > 1), "no bin packed 2+ docs")
    assert(bins.forall(b => b.length == 1 || b.map(_._3).sum <= cap),
      "a multi-doc bin exceeds the cap")
    assert(got.map(_._4).max > 0, "everything landed in one bin — cap never bound")
  }

  test("seq chunks: per-doc chunk count and sizes reconstruct the token stream") {
    val words = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
    val got = operators.TextAnalysis.seqChunks(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    words.foreach { case (d, ws) =>
      val chunks = got(d).sortBy(_._2)
      assert(chunks.length == (ws.length - 1) / 16 + 1, s"doc $d chunk count")
      assert(chunks.map(_._3).sum == ws.length, s"doc $d token total")
      chunks.foreach { case (_, c, n, h) =>
        val slice = ws.slice((c * 16).toInt, (c * 16).toInt + 16)
        assert(n == slice.length)
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(slice.mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        assert(h == hex, s"doc $d chunk $c content hash")
      }
    }
  }
}
