package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.{Clustering, Graph, Relational, TextAnalysis}
import graft.sources.Tables

/** Round-11 batch 2: Jaccard link prediction, multi-source BFS,
  * association rules, rolling median, ACF, chi-square, time-weighted
  * average, lexical richness. Planted-topology and closed-form cases
  * prove the semantics the corpus oracles can't isolate (empty review
  * queues, multi-source min-hop, window gaps, independence nulls). */
class Round11bSpec extends AnyFunSuite {
  import SparkTestSession._

  // ---- Jaccard link prediction ----

  test("jaccardLinkPred scores the square's diagonals at 1.0") {
    import spark.implicits._
    // 4-cycle 1-2-3-4-1: the two non-edges (1,3) and (2,4) share both
    // neighbors, so common=2 and union=deg+deg-common=2 → jaccard 1.0
    val cands = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
      .toDF("doc_a", "doc_b")
    val got = Graph.jaccardLinkPred(cands).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got === Set((1L, 3L, 2L, 1.0), (2L, 4L, 2L, 1.0)))
  }

  test("jaccardLinkPred penalizes hub overlap that raw common-neighbors ranks equal") {
    import spark.implicits._
    // star center 10 with leaves 1..4, plus a tight pair 20-21 both
    // linked to 22: (20,21) is an edge (excluded); (1,2) vs (20,22)…
    // simplest check: leaves of the star share only the hub (common=1,
    // union=1+1-1=1 → 1.0); attach extra edges to leaf 1 so its
    // neighborhood grows and (1,2)'s jaccard drops below (3,4)'s
    val cands = Seq((10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L),
        (1L, 30L), (1L, 31L))
      .toDF("doc_a", "doc_b")
    val got = Graph.jaccardLinkPred(cands, k = 100).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    assert(got((3L, 4L)) === 1.0)      // N(3)=N(4)={10}
    assert(got((1L, 2L)) === 0.333333) // common 1, union 3+1-1
  }

  // ---- multi-source BFS ----

  test("bfsHops labels min-hop distance from the %7 seed set") {
    import spark.implicits._
    // chain 7-8-…-13 with a second seed 14 attached at 13: node 13 is
    // 6 hops from seed 7 but 1 hop from seed 14 — min wins; plus a
    // seedless component {31,32} that must be absent entirely
    val pairs = Seq((7L, 8L), (8L, 9L), (9L, 10L), (10L, 11L),
        (11L, 12L), (12L, 13L), (14L, 13L), (31L, 32L))
      .toDF("doc_a", "doc_b")
    val got = Graph.bfsHops(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(7L -> 0L, 14L -> 0L, 8L -> 1L, 13L -> 1L,
      9L -> 2L, 12L -> 2L, 10L -> 3L, 11L -> 3L))
  }

  test("bfsHops respects the hop cap") {
    import spark.implicits._
    // 10-node chain with exactly one seed (mod 100) at its head:
    // nodes beyond 6 hops stay unlabeled
    val pairs = (100L to 109L).sliding(2).map(s => (s(0), s(1))).toSeq
      .toDF("doc_a", "doc_b")
    val got = Graph.bfsHops(pairs, seedMod = 100).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === (100L to 106L).map(n => n -> (n - 100L)).toMap)
    // hops=0 degenerates to the seed set itself
    val seedsOnly = Graph.bfsHops(pairs, maxHops = 0, seedMod = 100).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(seedsOnly === Map(100L -> 0L))
  }

  // ---- association rules ----

  test("assocRules emits both directions with confidence and lift") {
    import spark.implicits._
    // baskets: {1,2} ×2, {1,3}, {2}: pair (1,2) qualifies (n_both=2),
    // (1,3) is under the support floor
    val li = Seq((101L, 1L), (101L, 2L), (102L, 1L), (102L, 2L),
        (103L, 1L), (103L, 3L), (104L, 2L))
      .toDF("l_orderkey", "l_partkey")
    val got = Relational.assocRules(li).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    // n1 = 3 orders, n2 = 3 orders, n_orders = 4
    assert(got.keySet === Set((1L, 2L), (2L, 1L)))
    assert(got((1L, 2L)) === ((2L, 3L, 0.666667, 0.888889)))
    assert(got((2L, 1L)) === ((2L, 3L, 0.666667, 0.888889)))
  }

  // ---- rolling median ----

  test("rollingMedian is calendar-ranged and exact at gap days") {
    import spark.implicits._
    val ts = (d: Long) => new java.sql.Timestamp(d * 86400000L)
    // days 0, 1, 8: day 8's trailing window spans days 2..8 → itself
    val orders = Seq((ts(0), 100.0), (ts(1), 200.0), (ts(8), 300.0))
      .toDF("o_orderdate", "o_totalprice")
    val got = Relational.rollingMedian(orders).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(got === Map(0L -> 1.0e8, 1L -> 1.5e8, 8L -> 3.0e8))
  }

  // ---- autocorrelation ----

  test("acf of a linear series is 1.0 at every lag") {
    import spark.implicits._
    val ts = (d: Long) => new java.sql.Timestamp(d * 86400000L)
    val orders = (0L to 9L).map(d => (ts(d), 100.0 + d)).toDF("o_orderdate", "o_totalprice")
    val got = Relational.acf(orders).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet === (1L to 7L).toSet)
    got.foreach { case (lag, (n, a)) =>
      assert(n === 10 - lag, s"lag $lag pair count")
      assert(a === 1.0, s"lag $lag acf")
    }
  }

  // ---- chi-square ----

  test("chi2LangSource is zero under exact independence") {
    import spark.implicits._
    val docs = (for { l <- Seq("en", "fr"); s <- Seq("web", "book"); _ <- 1 to 5 }
      yield (l, s)).toDF("lang", "source")
    val r = Relational.chi2LangSource(docs).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((2L, 2L, 1L)))
    assert(r.getDouble(3) === 0.0)
    assert(r.getDouble(4) === 0.0)
  }

  test("chi2LangSource detects a fully dependent layout") {
    import spark.implicits._
    // lang determines source exactly: chi2 = n, Cramér's V = 1
    val docs = (Seq.fill(6)(("en", "web")) ++ Seq.fill(4)(("fr", "book")))
      .toDF("lang", "source")
    val r = Relational.chi2LangSource(docs).collect()(0)
    assert(r.getDouble(3) === 10.0)
    assert(r.getDouble(4) === 1.0)
  }

  // ---- time-weighted average ----

  test("timeWeightedAvg weights by holding duration, drops single-event users") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, 0L, 1.0), (2L, 1L, 10000000000L, 4.0), (3L, 1L, 30000000000L, 99.0),
      (4L, 2L, 5000000000L, 7.0)) // single interval-less event → dropped
      .toDF("event_id", "user_id", "ts", "value")
    val got = Relational.timeWeightedAvg(ev).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // user 1: value 1.0 held 10 s, 4.0 held 20 s → (10 + 80) / 30 = 3.0
    assert(got === Map(1L -> ((3L, 30.0, 3.0))))
  }

  // ---- ROUGE-1 over pairs ----

  test("rouge1Pairs clips unigram overlap and is pair-driven") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta beta"), (2L, "alpha beta gamma"),
      (3L, "delta delta")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("doc_a", "doc_b")
    val got = TextAnalysis.rouge1Pairs(docs, pairs).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // overlap = min(1,1) + min(2,1) = 2; F1 = 2·2/(3+3)
    assert(got((1L, 2L)) === ((2L, 3L, 3L, 0.666667)))
    // disjoint vocab pair drops out entirely (inner term join)
    assert(!got.contains((1L, 3L)))
  }

  // ---- PSI ----

  test("psiDistinctRatio is zero when the halves are identical") {
    import spark.implicits._
    // same text on an even and an odd id → every bin has p_ref == p_cur
    val docs = Seq((0L, "alpha beta beta"), (1L, "alpha beta beta"),
      (2L, "gamma gamma gamma gamma"), (3L, "gamma gamma gamma gamma"))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.psiDistinctRatio(docs).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      assert(r.getDouble(3) === r.getDouble(4), s"bin ${r.getLong(0)} p mismatch")
      assert(r.getDouble(5) === 0.0, s"bin ${r.getLong(0)} psi term")
    }
  }

  test("psiDistinctRatio flags a shifted distribution with positive PSI") {
    import spark.implicits._
    // even half: repetitive (ratio 1/4 → bin 2); odd half: all-distinct
    // (ratio 1 → bin 9): both directional terms are positive
    val docs = Seq((0L, "x1 x1 x1 x1"), (2L, "y1 y1 y1 y1"),
      (1L, "a1 b1 c1 d1"), (3L, "e1 f1 g1 h1")).toDF("doc_id", "text")
    // closed form under add-one smoothing: 2 × (1/12 − 3/12)·ln(1/3)
    val psi = TextAnalysis.psiDistinctRatio(docs).agg(sum("psi_term")).collect()(0).getDouble(0)
    assert(math.abs(psi - 2 * (1.0 / 6) * math.log(3.0)) < 1e-5, s"psi $psi")
  }

  // ---- cluster purity / NMI ----

  test("clusterPurity and clusterNmi are perfect on separable labeled clusters") {
    import spark.implicits._
    val emb = Seq(
      (1L, Seq(0.0f, 0.0f), 0), (3L, Seq(0.1f, 0.0f), 0),
      (2L, Seq(10.0f, 10.0f), 1), (4L, Seq(10.1f, 10.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val pur = Clustering.clusterPurity(emb, k = 2, iters = 1).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(pur === Map(0L -> ((2L, 0L, 2L, 1.0)), 1L -> ((2L, 1L, 2L, 1.0))))
    val nmi = Clustering.clusterNmi(emb, k = 2, iters = 1).collect()(0)
    assert((nmi.getLong(0), nmi.getLong(1)) === ((2L, 2L)))
    assert(nmi.getDouble(3) === 1.0)
  }

  test("clusterNmi is zero when labels are independent of clusters") {
    import spark.implicits._
    // both labels appear equally in both spatial clusters
    val emb = Seq(
      (1L, Seq(0.0f, 0.0f), 0), (3L, Seq(0.1f, 0.0f), 1),
      (2L, Seq(10.0f, 10.0f), 0), (4L, Seq(10.1f, 10.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val nmi = Clustering.clusterNmi(emb, k = 2, iters = 1).collect()(0)
    assert(nmi.getDouble(2) === 0.0) // MI exactly 0 under independence
  }

  // ---- bridges & ego sizes ----

  test("bridgeEdges keeps only triangle-free edges") {
    import spark.implicits._
    // triangle 1-2-3 plus a pendant edge 3-4 and a lone edge 5-6
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (5L, 6L))
      .toDF("doc_a", "doc_b")
    val got = Graph.bridgeEdges(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((3L, 4L), (5L, 6L)))
  }

  test("egoSizes separates clique members from gateways") {
    import spark.implicits._
    // path 1-2-3: node 2 reaches both ends in 1 hop; 1 and 3 reach
    // the far end only at hop 2
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val got = Graph.egoSizes(pairs).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(1L -> ((1L, 2L)), 2L -> ((2L, 2L)), 3L -> ((1L, 2L))))
  }

  test("clusterDiameters tells cliques from chains") {
    import spark.implicits._
    // triangle {1,2,3} (diameter 1), 4-chain 10-11-12-13 (diameter 3)
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (12L, 13L)).toDF("doc_a", "doc_b")
    val got = Graph.clusterDiameters(pairs).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(1L -> ((3L, 1L)), 10L -> ((4L, 3L))))
  }

  test("rep-level ego profiles equal the doc-level wedge enumeration on the gate corpus") {
    val path = java.nio.file.Files.createTempDirectory("r11ego").toString + "/s"
    graft.operators.DedupStore.build(Tables.documents(spark, sf), path)
    val live = Graph.egoSizes(
      graft.operators.DedupStore.verifiedNearDups(spark, path)).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val staged = graft.operators.DedupStore.egoProfiles(spark, path).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(staged === live)
  }

  // ---- t-closeness ----

  test("tCloseness scores skewed classes higher than representative ones") {
    import spark.implicits._
    val day = 86400000000000L
    // global items: {1: 4, 2: 4}; class A mirrors it (tv 0), class B
    // holds only item 1 (tv = 0.5·(|1−0.5| + 0.5) = 0.5)
    val ev = Seq(
      (1L, 1L, 0L * day, "a", """{"k": 1}"""), (2L, 2L, 0L * day, "a", """{"k": 2}"""),
      (3L, 3L, 0L * day, "a", """{"k": 1}"""), (4L, 4L, 0L * day, "a", """{"k": 2}"""),
      (5L, 5L, 0L * day, "b", """{"k": 1}"""), (6L, 6L, 0L * day, "b", """{"k": 1}"""),
      (7L, 7L, 0L * day, "b", """{"k": 2}"""), (8L, 8L, 0L * day, "b", """{"k": 2}"""))
      .toDF("event_id", "user_id", "ts", "event_type", "props")
    val got = Relational.tCloseness(ev, k = 2).collect()
      .map(r => (r.getString(0), (r.getLong(2), r.getLong(3), r.getDouble(4), r.getBoolean(5))))
      .toMap
    assert(got("a") === ((4L, 2L, 0.0, true)))
    assert(got("b") === ((4L, 2L, 0.0, true)))
    // skew class c: only item 1, global becomes {1: 6, 2: 4}
    val ev2 = ev.union(Seq(
      (9L, 9L, 0L * day, "c", """{"k": 1}"""), (10L, 10L, 0L * day, "c", """{"k": 1}"""))
      .toDF("event_id", "user_id", "ts", "event_type", "props"))
    val got2 = Relational.tCloseness(ev2, k = 2).collect()
      .map(r => (r.getString(0), r.getDouble(4))).toMap
    // class c: p_cls(1)=1 vs p_g(1)=0.6 → tv = 0.5·(0.4 + 0.4) = 0.4
    assert(got2("c") === 0.4)
    assert(got2("a") < got2("c") && got2("b") < got2("c"))
  }

  // ---- balanced interleave ----

  test("interleave alternates runs, dedups to the earliest slot") {
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val got = graft.operators.Hybrid.interleave(docs, emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.length === 10)
    // positions strictly increase and parity matches src
    assert(got.map(_._2).toSeq === got.map(_._2).sorted.toSeq)
    got.foreach { case (_, pos, src) =>
      assert((pos % 2 == 1) == (src == "lex"), s"pos $pos src $src")
    }
    // no doc appears twice
    assert(got.map(_._1).distinct.length === 10)
  }

  // ---- knn metrics ----

  test("knnMetrics computes confusion margins with guards") {
    import spark.implicits._
    // preds: label 1 → 2 actual, 1 correct + 1 stolen by label 2;
    // label 3 predicted once, never actual
    val preds = Seq(
      (10L, 1L, 1L, 3L), (11L, 1L, 2L, 3L), (12L, 2L, 2L, 3L), (13L, 2L, 3L, 3L))
      .toDF("vec_id", "true_label", "predicted_label", "n_votes")
    val got = graft.operators.Vectors.knnMetrics(preds).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)), Option(r.get(5)), Option(r.get(6))))).toMap
    assert(got(1L) === ((2L, 1L, 1L, Some(1.0), Some(0.5), Some(0.666667))))
    assert(got(2L) === ((2L, 2L, 1L, Some(0.5), Some(0.5), Some(0.5))))
    // label 3: predicted once, zero actual → recall NULL, f1 0.0
    assert(got(3L) === ((0L, 1L, 0L, Some(0.0), None, None)))
  }

  // ---- rolling actives ----

  test("rollingActives counts trailing-window distinct users") {
    import spark.implicits._
    val day = 86400000000000L
    val ev = Seq(
      (1L, 1L, 0L * day), (2L, 2L, 0L * day),       // day 0: users 1,2
      (3L, 1L, 3L * day),                           // day 3: user 1
      (4L, 3L, 10L * day))                          // day 10: user 3
      .toDF("event_id", "user_id", "ts")
    val got = Relational.rollingActives(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // day 0: {1,2}; day 3 window (days -3..3 present: 0,3): {1,2};
    // day 10 is past day 3 + 6 → only {3}
    assert(got === Map(0L -> 2L, 3L -> 2L, 10L -> 1L))
  }

  // ---- cross-modal ops ----

  test("modalityAgreement counts exact pair overlap") {
    import spark.implicits._
    val lex = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("doc_a", "doc_b")
    val sem = Seq((1L, 2L), (7L, 8L)).toDF("vec_a", "vec_b")
    val r = graft.operators.Hybrid.modalityAgreement(lex, sem).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)) ===
      ((3L, 2L, 1L, 0.25)))
  }

  test("modalityCorr is +1 on aligned scores and NULL without spread") {
    import spark.implicits._
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)),   // cos(1,2) = 1
      (3L, Seq(1.0f, 0.0f)), (4L, Seq(0.0f, 1.0f)))   // cos(3,4) = 0
      .toDF("vec_id", "embedding")
    val pairs = Seq((1L, 2L, 1.0), (3L, 4L, 0.5)).toDF("doc_a", "doc_b", "jaccard")
    val r = graft.operators.Hybrid.modalityCorr(pairs, emb).collect()(0)
    assert(r.getLong(0) === 2L)
    assert(r.getDouble(1) === 1.0) // two points, both increasing → r = 1
    // all-identical jaccard → zero variance → NULL, never NaN
    val flat = Seq((1L, 2L, 1.0), (3L, 4L, 1.0)).toDF("doc_a", "doc_b", "jaccard")
    val r2 = graft.operators.Hybrid.modalityCorr(flat, emb).collect()(0)
    assert(r2.isNullAt(1))
  }

  test("rehydratedSearch attaches payloads without changing the ranking") {
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val ranked = graft.operators.Ann.bruteForceTopK(emb).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val re = graft.operators.Hybrid.rehydratedSearch(docs, emb).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(re === ranked.toSet)
  }

  // ---- filtered ANN ----

  test("filteredTopK scores only vectors passing the predicate") {
    import spark.implicits._
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f), 9),          // query
      (1L, Seq(1.0f, 0.0f), 3),          // perfect match, right label
      (2L, Seq(1.0f, 0.01f), 5),         // near match, WRONG label
      (3L, Seq(0.0f, 1.0f), 3))          // orthogonal, right label
      .toDF("vec_id", "embedding", "label")
    val got = graft.operators.Ann.filteredTopK(emb).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.map(_._1).toSeq === Seq(1L, 3L)) // 2 excluded by label
    assert(got(0)._2 === 1.0)
    assert(got(1)._2 === 0.0)
  }

  // ---- lambda handoff ----

  test("backfillHandoff composes a seam-free daily series") {
    val rows = graft.streaming.Streams.backfillHandoff(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val batchDays = rows.filter(_._3 == "batch").map(_._1).toSet
    val streamDays = rows.filter(_._3 == "stream").map(_._1).toSet
    assert(batchDays.nonEmpty && streamDays.nonEmpty)
    assert(batchDays.intersect(streamDays).isEmpty, "seam overlap")
    assert(batchDays.max < streamDays.min, "cut must separate the ranges")
    // the union re-aggregates to the plain batch daily counts
    val batch = Tables.events(spark, sf)
      .groupBy(expr("ts div 86400000000000").as("day"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows.map(r => (r._1, r._2)).toMap === batch)
  }

  // ---- staged basket substrate ----

  test("store-served basket pairs and rules equal the live self-join plans") {
    import spark.implicits._
    val li = Seq((101L, 1L), (101L, 2L), (102L, 1L), (102L, 2L),
      (103L, 1L), (103L, 3L), (104L, 2L), (101L, 1L)) // dup row: distinct matters
      .toDF("l_orderkey", "l_partkey")
    val p = java.nio.file.Files.createTempDirectory("r11basket").toString
    li.select(col("l_orderkey"), col("l_partkey")).distinct().localCheckpoint()
      .createOrReplaceTempView("it_tmp")
    val items = spark.table("it_tmp")
    items.groupBy("l_partkey").agg(count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(s"$p/supp")
    items.select("l_orderkey").distinct().agg(count(lit(1)).as("n_orders"))
      .write.mode("overwrite").parquet(s"$p/norders")
    items.as("a").join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
      .agg(count(lit(1)).as("n_both"))
      .write.mode("overwrite").parquet(s"$p/pairs")
    val livePairs = Relational.basketPairs(li).collect().map(_.toSeq).toSeq
    val storePairs = Relational.basketPairsFromStore(spark, p).collect().map(_.toSeq).toSeq
    assert(storePairs === livePairs)
    val liveRules = Relational.assocRules(li).collect().map(_.toSeq).toSeq
    val storeRules = Relational.assocRulesFromStore(spark, p).collect().map(_.toSeq).toSeq
    assert(storeRules === liveRules)
  }

  // ---- length moments ----

  test("lengthMoments matches closed-form shape stats") {
    import spark.implicits._
    // symmetric {1,2,3}: skewness 0, m2 = 2/3, m4 = 2/3·… kurt = m4/m2²−3
    val docs = Seq(("s", 1L), ("s", 2L), ("s", 3L)).toDF("source", "n_chars")
    val r = TextAnalysis.lengthMoments(docs).collect()(0)
    assert(r.getLong(1) === 3L)
    assert(r.getDouble(2) === 2.0)
    assert(r.getDouble(3) === math.rint(math.sqrt(2.0 / 3) * 1e6) / 1e6)
    assert(r.getDouble(4) === 0.0)
    // m4 = (1 + 0 + 1)/3 = 2/3; kurt = (2/3)/(4/9) − 3 = 1.5 − 3
    assert(r.getDouble(5) === -1.5)
  }

  // ---- stream-static enrichment ----

  test("enrichedNationRate equals the batch three-way rollup") {
    val live = graft.streaming.Streams.enrichedNationRate(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    val cust = spark.read.parquet(s"$sf/customer.parquet")
    val nat = spark.read.parquet(s"$sf/nation.parquet")
    val batch = Tables.events(spark, sf)
      .join(cust, col("user_id") === col("c_custkey"))
      .join(nat, col("c_nationkey") === col("n_nationkey"))
      .groupBy((expr("ts div 3600000000000") * 3600000L).as("w"), col("n_name"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 1000000.0).cast("long")).as("vm"))
      .collect().map(r => ((r.getLong(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(live === batch)
  }

  // ---- streaming distinct users ----

  test("streamDistinctUsers equals the batch per-hour distinct rollup") {
    val live = graft.streaming.Streams.streamDistinctUsers(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val batch = Tables.events(spark, sf)
      .groupBy((expr("ts div 3600000000000") * 3600000L).as("w"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(live === batch)
  }

  // ---- personalized pagerank ----

  test("personalizedPagerank starves non-seed components and feeds seed neighborhoods") {
    import spark.implicits._
    // seed 7 linked to 8; component {9,10} has no seed → decays to 0
    val docs = Seq(7L, 8L, 9L, 10L).toDF("doc_id")
    val pairs = Seq((7L, 8L), (9L, 10L)).toDF("doc_a", "doc_b")
    val got = Graph.personalizedPagerankFrom(pairs, docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(9L) === 0L)
    assert(got(10L) === 0L)
    // stationary on the 2-cycle: r7 = t + 0.85·r8, r8 = 0.85·r7
    assert(got(7L) > got(8L) && got(8L) > 0L)
    assert(got(7L) + got(8L) <= Graph.TotalMass)
  }

  test("personalizedPagerank teleports only to seeds") {
    import spark.implicits._
    // isolated seed keeps exactly the teleport floor; isolated
    // non-seeds get nothing
    val docs = Seq(7L, 8L, 9L).toDF("doc_id")
    val pairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val got = Graph.personalizedPagerankFrom(pairs, docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(7L -> (15L * Graph.TotalMass) / 100L, 8L -> 0L, 9L -> 0L))
  }

  // ---- modularity ----

  test("modularity rewards a two-clique partition and zeroes a random one") {
    import spark.implicits._
    // two disjoint triangles: LP labels each by its min node; Q =
    // 2 × (3/6 − (6/12)²) = 0.5 — the textbook two-community value
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L),
        (4L, 5L), (5L, 6L), (4L, 6L)).toDF("doc_a", "doc_b")
    val docs = (1L to 6L).toDF("doc_id")
    val got = Graph.modularity(pairs, docs).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got === Map(1L -> ((3L, 3L, 6L, 0.25)), 4L -> ((3L, 3L, 6L, 0.25))))
  }

  test("modularity of the whole-graph partition is zero") {
    import spark.implicits._
    // a single triangle → one community holding every edge:
    // Q = 3/3 − (6/6)² = 0 exactly
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("doc_a", "doc_b")
    val docs = (1L to 3L).toDF("doc_id")
    val got = Graph.modularity(pairs, docs).collect()
    assert(got.length === 1)
    assert(got(0).getDouble(4) === 0.0)
  }

  // ---- funnel latency ----

  test("funnelLatency takes first-occurrence deltas per converting user") {
    import spark.implicits._
    val ns = (s: Long) => s * 1000000000L
    val ev = Seq(
      // user 1 converts twice over each step; only FIRSTs count:
      // signup@0, click@10 (not 20), purchase@40
      (1L, 1L, ns(0), "signup"), (2L, 1L, ns(10), "click"),
      (3L, 1L, ns(20), "click"), (4L, 1L, ns(40), "purchase"),
      // user 2: signup@0, click@30, no purchase
      (5L, 2L, ns(0), "signup"), (6L, 2L, ns(30), "click"),
      // user 3: click before signup only → never enters step 2
      (7L, 3L, ns(5), "click"), (8L, 3L, ns(9), "signup"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = Relational.funnelLatency(ev).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // deltas: signup→click = [10s, 30s] → median 20s = 2.0e7 us
    assert(got("1_signup_to_click") === ((2L, 2.0e7, 2.0e7)))
    assert(got("2_click_to_purchase") === ((1L, 3.0e7, 3.0e7)))
  }

  // ---- Jensen-Shannon divergence ----

  test("jsDivergence is zero for identical mixes and closed-form for partial overlap") {
    import spark.implicits._
    val docs = Seq(
      ("s1", "alpha alpha beta"), ("s2", "alpha alpha beta"),
      ("s3", "alpha gamma gamma gamma"), ("s4", "zeta zeta"))
      .toDF("source", "text")
    val got = TextAnalysis.jsDivergence(docs).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(got(("s1", "s2")) === ((2L, 0.0)))
    // s1 vs s3 share only "alpha": p=2/3, q=1/4 + complements × ln 2
    val p = 2.0 / 3; val q = 1.0 / 4
    val exp = 0.5 * p * math.log(2 * p / (p + q)) + 0.5 * q * math.log(2 * q / (p + q)) +
      0.5 * (1 - p) * math.log(2.0) + 0.5 * (1 - q) * math.log(2.0)
    assert(got(("s1", "s3"))._2 === math.rint(exp * 1e6) / 1e6)
    // fully disjoint vocabularies never meet the shared join: the pair
    // is ABSENT by contract (jsd would be exactly ln 2)
    assert(!got.contains(("s1", "s4")) && !got.contains(("s3", "s4")))
  }

  // ---- burstiness ----

  test("burstiness ranks bursty terms above evenly-sprinkled ones") {
    import spark.implicits._
    val docs = ((1L to 4L).map(i => (i, "uu uu zz")) :+
      ((5L, "uu uu zz zz zz zz zz zz"))).toDF("doc_id", "text")
    val got = TextAnalysis.burstiness(docs).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2), r.getDouble(3))))
    // zz: tf [1,1,1,1,6] → mean 2, var (40−20)/4 = 5 → fano 2.5
    // uu: tf [2,2,2,2,2] → var 0 → fano 0
    assert(got === Seq(("zz", (5L, 2.0, 2.5)), ("uu", (5L, 2.0, 0.0))))
  }

  // ---- streaming EWMA ----

  test("emaRate equals the batch 6-bucket EWMA closed form") {
    val live = graft.streaming.Streams.emaRate(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))).toMap
    val w = Tables.events(spark, sf)
      .groupBy((expr("ts div 3600000000000") * 3600000L).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    assert(live.keySet === w.keySet)
    live.foreach { case ((win, et), (n, ema)) =>
      assert(n === w((win, et)))
      val terms = (0 to 5).flatMap(k => w.get((win - k * 3600000L, et)).map(x => (x, 1L << (5 - k))))
      val exp = terms.map(t => t._1 * t._2).sum.toDouble / terms.map(_._2).sum
      assert(ema === math.rint(exp * 1e6) / 1e6, s"win $win type $et")
    }
  }

  // ---- lexical richness ----

  test("lexicalRichness computes TTR and hapax rate per source") {
    import spark.implicits._
    val docs = Seq(
      ("s1", "alpha beta alpha"),  // tokens 3, types 2, hapax 1 (beta)
      ("s2", "gamma gamma gamma")) // tokens 3, types 1, hapax 0
      .toDF("source", "text")
    val got = TextAnalysis.lexicalRichness(docs).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    assert(got("s1") === ((3L, 2L, 1L, 0.666667, 0.5)))
    assert(got("s2") === ((3L, 1L, 0L, 0.333333, 0.0)))
  }
}
