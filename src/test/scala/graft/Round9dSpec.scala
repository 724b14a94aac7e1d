package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bm25, Sketches, TextAnalysis}
import graft.sources.Tables

/** Round-9 batch 4: Kneser-Ney bigram smoothing, Monroe log-odds
  * discriminative terms, the md5-replayable CMS rebuild and the KMV
  * cardinality estimator. The DuckDB oracle is the exactness gate;
  * these pin the statistical invariants the hash can't express.
  */
class Round9dSpec extends AnyFunSuite {
  import SparkTestSession._

  lazy val docs = Tables.documents(spark, sf)
  lazy val events = Tables.events(spark, sf)

  test("kn bigram: pkn is a proper conditional distribution per left context") {
    val rows = TextAnalysis.knBigram(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, n12, pkn) =>
      assert(n12 >= 1L)
      assert(pkn > 0.0 && pkn < 1.0)
    }
    // KN only redistributes the discount mass WITHIN observed bigram
    // types; summing pkn over observed continuations of w1 stays <= 1
    // (the gap is the unseen-continuation mass) and, because every w2
    // here is observed somewhere, well above the discount floor.
    // each pkn is round(·,6) → up to 5e-7 absolute error per term
    // accumulates across the continuation set
    val perW1 = rows.groupBy(_._1).view.mapValues(v => (v.map(_._4).sum, v.size))
    perW1.foreach { case (w1, (s, n)) =>
      assert(s <= 1.0 + 5e-7 * n + 1e-9, s"pkn mass for '$w1' exceeds 1: $s")
      assert(s > 0.5, s"pkn mass for '$w1' implausibly low: $s")
    }
    // more-frequent continuation with the same context never scores
    // lower (same c1/t1, same D: pkn is monotone in n12 up to the
    // continuation term, which is bounded by D*t1/c1)
  }

  test("kn bigram: discounted MLE plus continuation mass reproduces one probe row") {
    val c12 = TextAnalysis.knBigram(docs)
    val probe = c12.orderBy(desc("n12"), asc("w1"), asc("w2")).head()
    val (w1, n12, pkn) = (probe.getString(0), probe.getLong(2), probe.getDouble(3))
    val all = c12.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val c1 = all.filter(_._1 == w1).map(_._3).sum
    val t1 = all.count(_._1 == w1)
    val w2 = probe.getString(1)
    val t2 = all.count(_._2 == w2)
    val t = all.length
    val expected = math.max(n12 - 0.75, 0.0) / c1 + 0.75 * t1 / c1 * (t2.toDouble / t)
    assert(math.abs(pkn - expected) < 1e-5, s"pkn $pkn vs recomputed $expected")
  }

  test("log odds: top-k per source, significant terms really are over-represented") {
    val rows = TextAnalysis.logOdds(docs).collect()
    val srcs = docs.select("source").distinct().count()
    assert(rows.length == srcs * 5)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(4)).sorted.toSeq == (1L to 5L))
      // ranks follow |z| descending
      val byRank = rs.sortBy(_.getLong(4)).map(r => math.abs(r.getDouble(3)))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b - 1e-9 })
    }
    // the rank-1 positive-z term per source has a higher in-source
    // share than its corpus share (that is what log-odds measures)
    val st = Bm25.tokenize(docs)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .groupBy("source", "term").agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val bySrc = st.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val byTerm = st.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val nAll = bySrc.values.sum.toDouble
    rows.filter(r => r.getLong(4) == 1L && r.getDouble(3) > 0).foreach { r =>
      val (s, t) = (r.getString(0), r.getString(1))
      val inShare = st((s, t)).toDouble / bySrc(s)
      val corpusShare = byTerm(t).toDouble / nAll
      assert(inShare > corpusShare,
        s"rank-1 term '$t' of $s not over-represented: $inShare vs $corpusShare")
    }
  }

  test("kmv distinct: exact below k, within 3 relative errors above k") {
    val k = 8
    val rows = Sketches.kmvDistinct(events, k = k).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (et, est, exact) =>
      if (exact < k) assert(est == exact.toDouble, s"$et below-k groups must be exact")
      else {
        // KMV standard error ~ 1/sqrt(k-2); allow 3 sigma
        val rel = math.abs(est - exact) / exact
        assert(rel <= 3.0 / math.sqrt(k - 2.0), s"$et estimate $est vs exact $exact (rel $rel)")
      }
    }
  }

  test("interval join: binned equi-join selects exactly the naive overlap pairs") {
    import graft.operators.Relational
    val got = Relational.intervalJoin(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // naive recomputation: every (session, hot hour) with ms overlap
    val sess = Relational.sessionize(events).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4))) // user, start, end
    val hourly = events.select(expr("ts div 3600000000000").as("h"))
      .groupBy("h").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val avg = hourly.values.sum.toDouble / hourly.size
    val hot = hourly.filter { case (_, c) => c >= 1.25 * avg }.keySet
    val expected = hot.toSeq.map { h =>
      val (ws, we) = (h * 3600000L, (h + 1) * 3600000L - 1)
      val overl = sess.filter { case (_, s, e) => s <= we && ws <= e }
      (h, overl.size.toLong, overl.map(_._1).distinct.size.toLong)
    }.filter(_._2 > 0).toSet
    assert(got == expected && got.nonEmpty)
  }

  test("cms heavy hitters: identical result under a re-run (deterministic sketch)") {
    val a = Sketches.heavyHitters(docs).collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val b = Sketches.heavyHitters(docs).collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a == b && a.nonEmpty)
  }
}
