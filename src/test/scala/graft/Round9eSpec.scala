package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bm25, Relational, TextAnalysis}
import graft.sources.Tables

/** Round-9 batch 5: corpus-health statistics — KS drift, Coleman-Liau
  * readability, MAD robust outliers, DP count release. The DuckDB
  * oracle pins exactness; these pin the statistical semantics (brute
  * replays, robustness, noise bounds) the hash can't express.
  */
class Round9eSpec extends AnyFunSuite {
  import SparkTestSession._

  lazy val docs = Tables.documents(spark, sf)
  lazy val events = Tables.events(spark, sf)

  test("ks drift: matches the brute-force two-sample statistic per source") {
    val got = TextAnalysis.ksDrift(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.nonEmpty)
    val lens = docs.select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val bySrc = lens.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    got.foreach { case (s, (nDocs, ksD)) =>
      val mine = bySrc(s).sorted
      val rest = lens.collect { case (o, v) if o != s => v }.sorted
      assert(nDocs == mine.length)
      val points = (mine ++ rest).distinct
      val d = points.map { v =>
        math.abs(mine.count(_ <= v).toDouble / mine.length -
          rest.count(_ <= v).toDouble / rest.length)
      }.max
      assert(math.abs(ksD - d) < 1e-6, s"$s: $ksD vs brute $d")
      assert(ksD >= 0.0 && ksD <= 1.0)
    }
  }

  test("readability: CLI reproduces from the emitted exact aggregates") {
    val rows = TextAnalysis.readability(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, l, w, s, cli) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(n > 0 && l > 0 && w >= n && s >= n) // >=1 word+sentence/doc
      val expect = 0.0588 * (100.0 * l / w) - 0.296 * (100.0 * s / w) - 15.8
      assert(math.abs(cli - expect) < 5e-5, s"${r.getString(0)}: $cli vs $expect")
    }
  }

  test("mad outliers: brute-replays, and huge injected outliers cannot mask") {
    val got = Relational.madOutliers(events).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got.nonEmpty)
    val vals = events.select(col("event_type"),
        floor(col("value") * 1000000.0).cast("long").as("v")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def nearestRankMedian(xs: Seq[Long]): Long = xs.sorted.apply((xs.size + 1) / 2 - 1)
    got.foreach { case (t, (n, med, mad, nOut)) =>
      val xs = vals(t)
      assert(n == xs.size)
      assert(med == nearestRankMedian(xs), s"$t median")
      assert(mad == nearestRankMedian(xs.map(v => math.abs(v - med))), s"$t mad")
      assert(nOut == xs.count(v => math.abs(v - med) * 6745L > mad * 35000L), s"$t flags")
    }
    // robustness: replacing 10% of one type's rows with a huge spike
    // must leave median and MAD unmoved (breakdown 0.5 — the spike
    // cannot mask itself the way it inflates q_outliers' stddev)
    val t0 = got.keys.min
    val spiked = events.withColumn("value",
      when(col("event_type") === t0 && col("event_id") % 10 === 0, lit(1.0e9))
        .otherwise(col("value")))
    val after = Relational.madOutliers(spiked).collect()
      .map(r => (r.getString(0), (r.getLong(2), r.getLong(3)))).toMap
    val (medB, madB) = (got(t0)._2, got(t0)._3)
    val (medA, madA) = after(t0)
    // nearest-rank position shifts by at most the injected fraction
    assert(math.abs(medA - medB).toDouble <= math.abs(medB) * 0.25 + 1,
      s"median moved $medB -> $medA under 10% spike")
    assert(madA <= madB * 2 + 1, s"MAD exploded $madB -> $madA under 10% spike")
  }

  test("minhash estimate: unbiased-family bounds — est within 1/numPerm grid, tracks exact") {
    val rows = graft.operators.Dedup.minhashEstimate(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, est, exact) =>
      assert(a < b)
      // candidates share >= one full band of 4 components
      assert(est >= 4.0 / 16 - 1e-9 && est <= 1.0)
      assert(exact >= 0.0 && exact <= 1.0)
      // identical texts must estimate 1.0 exactly
      if (exact == 1.0) assert(est == 1.0, s"($a,$b) exact=1 but est=$est")
    }
    // est lives on the 1/16 grid (it counts matching components)
    rows.foreach { case (a, b, est, _) =>
      assert(math.abs(est * 16 - math.round(est * 16)) < 1e-9,
        s"($a,$b) est $est off the signature grid")
    }
    // banding SELECTS on agreement, so the estimate is upward-biased
    // on the candidate set — the false-positive gap this monitor
    // exists to surface (tiny docs make it large at this sf)
    val meanEst = rows.map(_._3).sum / rows.length
    val meanExact = rows.map(_._4).sum / rows.length
    assert(meanEst >= meanExact - 1e-9,
      s"candidate-set estimate $meanEst below exact $meanExact")
  }

  test("heaps law: nested tiers are monotone and beta is a sublinear-growth exponent") {
    val pts = TextAnalysis.heapsLaw(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(pts.nonEmpty && pts.last._1 == 6L)
    // nested subsets: both coordinates monotone non-decreasing in k
    pts.sliding(2).foreach {
      case Array((_, t1, v1, _), (_, t2, v2, _)) =>
        assert(t2 >= t1 && v2 >= v1, "tiers not nested")
      case _ =>
    }
    // tier 6 is the whole corpus
    val full = Bm25.tokenize(docs)
    assert(pts.last._2 == full.count())
    assert(pts.last._3 == full.select("term").distinct().count())
    val beta = pts.head._4
    assert(pts.forall(_._4 == beta), "beta must be constant across rows")
    // sublinear growth; strictly positive only when the vocabulary
    // actually grows across tiers (the tiny synthetic vocab saturates
    // at the first tier, a legitimate beta ~ 0)
    assert(beta >= 0.0 && beta < 1.0, s"Heaps exponent $beta outside [0,1)")
    if (pts.last._3 > pts.head._3) assert(beta > 0.0, "vocab grew but beta = 0")
  }

  test("bpe fertility: language totals reconcile with the per-doc encode") {
    val perLang = graft.operators.Bpe.fertility(docs).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(perLang.nonEmpty)
    val perDoc = graft.operators.Bpe.encodeCorpus(docs)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy("lang").agg(sum("n_words").as("w"), sum("n_bpe_tokens").as("t"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(perLang.keySet == perDoc.keySet)
    perLang.foreach { case (l, (w, t, f)) =>
      assert((w, t) == perDoc(l), s"$l totals diverge")
      assert(f >= 1.0, s"$l fertility $f < 1 (a word is at least one subword)")
      assert(math.abs(f - t.toDouble / w) < 5e-5)
    }
  }

  test("cep match: every match is a valid ordered chain bound to earliest followers") {
    val ms = Relational.cepMatch(events, withinMs = 86400000L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(ms.nonEmpty)
    // nanos ground truth keyed by event id (the output carries ms)
    val ev = events.select(col("user_id"), col("event_id"), col("ts"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val ns = ev.map(e => e._2 -> e._3).toMap
    val byUser = ev.groupBy(_._1)
    ms.foreach { case (u, aId, aTs, bId, bTs, cId, cTs, span) =>
      assert(aTs <= bTs && bTs <= cTs && span <= 86400000L)
      val (aNs, bNs, cNs) = (ns(aId), ns(bId), ns(cId))
      assert(span == (cNs - aNs) / 1000000L, s"user $u span")
      val mine = byUser(u)
      def after(e: (Long, Long, Long, String), t: Long, id: Long) =
        e._3 > t || (e._3 == t && e._2 > id)
      val bBrute = mine.filter(e => e._4 == "click" && after(e, aNs, aId))
        .minBy(e => (e._3, e._2))
      assert(bBrute._2 == bId, s"user $u: b not earliest")
      val cBrute = mine.filter(e => e._4 == "purchase" && after(e, bNs, bId))
        .minBy(e => (e._3, e._2))
      assert(cBrute._2 == cId, s"user $u: c not earliest")
    }
    // one match attempt per qualifying signup: a_event_id unique
    assert(ms.map(_._2).distinct.length == ms.length)
  }

  test("interval union: coverage equals the brute sweep and bounds hold") {
    val got = Relational.intervalUnion(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    val starts = events.select(col("user_id"), expr("ts div 1000000").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    got.foreach { case (u, nBlocks, covered) =>
      val iv = starts(u).map(_._2).sorted.map(s => (s, s + 300000L))
      // brute merge sweep
      var blocks = List.empty[(Long, Long)]
      iv.foreach { case (s, e) =>
        blocks match {
          case (bs, be) :: rest if s <= be =>
            blocks = (bs, math.max(be, e)) :: rest
          case _ => blocks = (s, e) :: blocks
        }
      }
      assert(nBlocks == blocks.length, s"user $u blocks")
      assert(covered == blocks.map { case (s, e) => e - s }.sum, s"user $u coverage")
      assert(covered <= iv.length * 300000L && covered >= 300000L)
    }
  }

  test("triangles: every credited node closes, chain graphs credit nothing") {
    import spark.implicits._
    val tri = graft.operators.Graph.triangles(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // triangle total divides by 3 (each triangle credits 3 nodes)
    assert(tri.map(_._2).sum % 3 == 0)
    // brute check on the pair relation
    val edges = graft.operators.Dedup.verifiedNearDups(docs)
      .select(least(col("doc_a"), col("doc_b")), greatest(col("doc_a"), col("doc_b")))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val brute = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for (Seq(x, y, z) <- nodes.combinations(3)
         if edges((x, y)) && edges((y, z)) && edges((x, z))) {
      brute(x) += 1; brute(y) += 1; brute(z) += 1
    }
    assert(tri.toMap == brute.toMap, "triangle credits diverge from brute force")
  }

  test("stream psi: a window matching the reference mix scores near zero, skew scores high") {
    // pure-math invariant of the smoothed PSI the streaming key emits:
    // identical mixes -> 0; concentrated mix -> strictly larger
    def psi(w: Map[String, Long], r: Map[String, Long]): Double = {
      val t = r.size; val nw = w.values.sum; val nr = r.values.sum
      r.keys.map { k =>
        val pw = (w.getOrElse(k, 0L) + 1).toDouble / (nw + t)
        val pr = (r(k) + 1).toDouble / (nr + t)
        (pw - pr) * math.log(pw / pr)
      }.sum
    }
    val ref = Map("a" -> 100L, "b" -> 100L, "c" -> 100L)
    assert(math.abs(psi(ref, ref)) < 1e-12)
    assert(psi(Map("a" -> 300L), ref) > 0.5)
    assert(psi(Map("a" -> 90L, "b" -> 110L, "c" -> 100L), ref) <
      psi(Map("a" -> 10L, "b" -> 190L, "c" -> 100L), ref))
    // and PSI is non-negative for any mix pair (sum of (p-q)ln(p/q) terms,
    // each sign-aligned)
    assert(psi(Map("a" -> 1L, "b" -> 500L), ref) >= 0.0)
  }

  test("mips: norm-augmentation reduction preserves inner-product order") {
    val emb = Tables.embeddings(spark, sf)
    val mips = graft.operators.Ann.mipsTopK(emb).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(mips.length == 10)
    assert(mips.map(_._2).toSeq == mips.map(_._2).sorted.reverse.toSeq,
      "not score-sorted")
    // brute replay of the augmented-cosine ranking: cosine order over
    // augmented vectors == inner-product order (query aug component 0)
    val aug = graft.operators.Ann.normAugmented(emb).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toMap
    val q = aug(0L)
    def dot(a: Array[Double], b: Array[Double], n: Int) =
      (0 until n).map(i => a(i) * b(i)).sum
    val d = q.length - 1 // original dims; query's aug component is dropped
    val byAugCos = aug.toSeq.filter(_._1 != 0L).map { case (id, v) =>
      (id, dot(q, v, d) / (math.sqrt(dot(q, q, d)) * math.sqrt(dot(v, v, d + 1))))
    }.sortBy { case (id, c) => (-c, id) }.take(10).map(_._1)
    // same top-k membership and order as exact MIPS (rounded-score ties
    // can permute within a tie group; compare id sets per score tier)
    val mipsIds = mips.map(_._1).toSeq
    assert(byAugCos.toSet == mipsIds.toSet,
      s"augmented-cosine top-10 $byAugCos != mips $mipsIds")
  }

  test("lsh tune: narrower bands never lose candidates, midpoints descend") {
    val rows = graft.operators.Dedup.lshTune(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1) // by bands: 2, 4, 8
    assert(rows.map(t => (t._1, t._2)).toSeq == Seq((2L, 8L), (4L, 4L), (8L, 2L)))
    // more/narrower bands -> lower midpoint and >= candidate volume
    rows.sliding(2).foreach {
      case Array((_, _, m1, _), (_, _, m2, _)) => assert(m2 < m1)
      case _ =>
    }
    val byBands = rows.map(t => t._1 -> t._4).toMap
    assert(byBands(8L) >= byBands(4L) && byBands(4L) >= byBands(2L),
      s"candidate volume not monotone in bands: $byBands")
    // the 4x4 row must equal the production banding's candidate count
    assert(byBands(4L) ==
      graft.operators.Dedup.minhashCandidates(docs).count())
  }

  test("changepoint: splits a synthetic level shift at the true boundary") {
    import spark.implicits._
    // 20 days at ~10/day then 20 days at ~30/day (ns timestamps)
    val rows = (0 until 40).flatMap { d =>
      val n = if (d < 20) 10 else 30
      (0 until n).map(i => (d.toLong * 86400000000000L + i * 1000000L + 1L,
        d.toLong, i.toLong))
    }
    val ev = rows.toDF("ts", "d", "i")
    val got = Relational.changepoint(ev).collect().head
    assert(got.getLong(0) == 19L, s"split at ${got.getLong(0)}, want day 19")
    assert(got.getLong(1) == 20L && got.getLong(2) == 20L)
    assert(math.abs(got.getDouble(3) - 10.0) < 1e-9)
    assert(math.abs(got.getDouble(4) - 30.0) < 1e-9)
    // and on the real corpus it returns exactly one well-formed row
    val real = Relational.changepoint(events).collect()
    assert(real.length == 1 && real.head.getDouble(5) >= 0.0)
  }

  test("ab test: parity A/A split is balanced and not significant") {
    val r = Relational.abTest(events).collect().head
    val (nA, nB) = (r.getLong(0), r.getLong(1))
    assert(nA > 0 && nB > 0 && math.abs(nA - nB) <= 1) // parity split
    val conv = r.getLong(2) + r.getLong(3)
    assert(conv > 0 && conv < nA + nB, "conversion saturated — test degenerate")
    assert(!r.isNullAt(6), "z undefined on a non-saturated pool")
    // A/A: no real effect; allow generous slack (|z| < 3.29 ~ alpha 0.001)
    assert(math.abs(r.getDouble(6)) < 3.29, s"A/A split z=${r.getDouble(6)}")
  }

  test("stream cep: equals batch matcher with matches straddling micro-batch boundaries") {
    val streamed = graft.streaming.Streams.cepStream(spark, sf, nBatches = 3)
      .collect().map(_.toSeq).toSet
    val batch = Relational.cepMatch(events).collect().map(_.toSeq).toSet
    assert(streamed == batch && batch.nonEmpty,
      s"stream ${streamed.size} rows vs batch ${batch.size}")
    // cross-batch state proof: at least one match's a..c span must
    // cross a staging slice boundary (slices replicate cepStream's)
    import org.apache.spark.sql.functions._
    val typed = events.filter(col("event_type")
      .isin("signup", "click", "purchase"))
    val Array(lo, hi) = typed.agg(min("ts"), max("ts")).collect()
      .flatMap(r => Array(r.getLong(0), r.getLong(1)))
    val width = (hi - lo) / 3 + 1
    val bounds = Seq(lo + width, lo + 2 * width).map(_ / 1000000L)
    val straddling = batch.count { row =>
      val aMs = row(2).asInstanceOf[Long]; val cMs = row(6).asInstanceOf[Long]
      bounds.exists(b => aMs < b && b <= cMs)
    }
    assert(straddling > 0, "no match crosses a micro-batch boundary — state untested")
  }

  test("benford: digits 1-9 cover all orders, probabilities sum to 1, chi2 finite") {
    val rows = Relational.benford(Tables.orders(spark, sf)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.map(_._1).toSet.subsetOf((1L to 9L).toSet) && rows.nonEmpty)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-3) // freqs sum to ~1
    // Benford reference masses are the exact log10(1+1/d) values
    rows.foreach { case (d, _, _, p, chi2) =>
      assert(math.abs(p - math.log10(1.0 + 1.0 / d)) < 5e-5)
      assert(chi2 >= 0.0 && !chi2.isNaN)
    }
    val total = Tables.orders(spark, sf).filter(col("o_totalprice") > 0).count()
    assert(rows.map(_._2).sum == total)
  }

  test("common neighbors: planted chain predicts the missing link; corpus queue is honestly empty") {
    import spark.implicits._
    // path 1-2-3-4 plus hub 5 connected to {1,3}: top prediction must
    // be (1,3) (2 common: 2 and 5), then the 1-hop-apart path pairs
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 5L), (3L, 5L))
      .toDF("a", "b")
    val got = graft.operators.Graph.commonNeighborsFrom(e, 10).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    assert(got.head == ((1L, 3L), 2L), s"top prediction ${got.head}")
    val asMap = got.toMap
    assert(asMap((2L, 4L)) == 1L && asMap((2L, 5L)) == 2L && asMap((4L, 5L)) == 1L)
    assert(!asMap.contains((1L, 2L)), "existing edge leaked into predictions")
    // wired key: every prediction brute-verifies as a non-adjacent
    // pair with exactly that many shared candidate-graph neighbors
    // (same exact-collapse the operator applies)
    val canon = docs.join(
      docs.groupBy(md5(col("text")).as("h"))
        .agg(min("doc_id").as("doc_id")).select("doc_id"),
      Seq("doc_id"), "left_semi")
    val edges = graft.operators.Dedup.minhashCandidates(canon).collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))).toSet
    val adj = edges.foldLeft(Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)) {
      case (m, (a, b)) => m.updated(a, m(a) + b).updated(b, m(b) + a)
    }
    graft.operators.Graph.commonNeighbors(docs).collect().foreach { r =>
      val (a, b, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(!edges((a, b)), s"($a,$b) already an edge")
      assert((adj(a) intersect adj(b)).size == n, s"($a,$b) count wrong")
    }
  }

  test("session paths: capped journeys, session totals reconcile with sessionize") {
    val top = Relational.sessionPaths(events, k = 1000000).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(top.nonEmpty)
    top.foreach { case (p, n) =>
      assert(p.split(">").length <= 5 && n >= 1, s"malformed path row ($p, $n)")
    }
    val nSessions = Relational.sessionize(events).count()
    assert(top.map(_._2).sum == nSessions, "path multiset loses sessions")
  }

  test("langid confusion: cells partition the corpus, shares are per-truth-row") {
    val cells = TextAnalysis.langConfusion(docs).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
    assert(cells.nonEmpty)
    assert(cells.map(_._2._1).sum == docs.count(), "cells don't partition the corpus")
    cells.groupBy(_._1._1).foreach { case (lang, rows) =>
      assert(math.abs(rows.map(_._2._2).sum - 1.0) < 1e-3,
        s"$lang row shares don't sum to 1")
    }
    // predictions restricted to the heuristic's codomain
    assert(cells.map(_._1._2).forall(Set("en", "und")))
  }

  test("passage search: hits decode to real chunks, ranks are passage-level") {
    import spark.implicits._
    val qs = Bm25.DemoQueries.toDF("query_id", "qtext")
    val hits = graft.operators.SearchExtras.passageSearch(docs, qs).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4)))
    assert(hits.nonEmpty)
    // every hit's (doc_id, chunk_id) exists in the chunking contract
    val chunks = TextAnalysis.seqChunks(docs).select("doc_id", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    hits.foreach { case (_, d, c, s, _) =>
      assert(chunks((d, c)), s"hit ($d, $c) is not a real chunk")
      assert(s > 0.0)
    }
    // ranks dense 1..k per query, ordered by (score desc, passage key)
    hits.groupBy(_._1).foreach { case (q, rows) =>
      val rks = rows.map(_._5).sorted.toSeq
      assert(rks == (1 to rows.length), s"query $q ranks not dense: $rks")
    }
    // passage granularity is load-bearing: some doc contributes a hit
    // whose chunk is not chunk 0 (doc-level ranking could never say
    // WHICH window matched)
    assert(hits.exists(_._3 > 0L), "no non-leading chunk ever hit")
  }

  test("dp counts: deterministic, noise bounded by the Laplace inverse-CDF range") {
    val a = Relational.dpCounts(events).collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getDouble(2))).toMap
    val b = Relational.dpCounts(events).collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(a == b && a.nonEmpty) // replayable release
    val truth = events
      .groupBy(col("event_type"), expr("ts div 86400000000000").as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    assert(a.keySet == truth.keySet)
    // |noise| <= (1/eps)·ln(16^15) ≈ 41.6 at eps=1 (u resolution 16^-15)
    val bound = math.log(1.152921504606846976e18)
    var moved = 0
    a.foreach { case (k, noisy) =>
      assert(math.abs(noisy - truth(k)) <= bound, s"$k noise out of range")
      if (math.abs(noisy - truth(k)) > 1e-9) moved += 1
    }
    assert(moved > a.size / 2, "noise degenerate: most groups unperturbed")
  }
}
