package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Ann, Dedup, Relational, TextAnalysis}
import graft.sources.Tables

/** Round-9 batch 2: unpivot/listagg export shapes, first-touch
  * attribution, interval concurrency, stratified/k-fold sampling,
  * markup strip, higher-order array stats, containment dedup, ANN
  * range search. The DuckDB oracle is the exactness gate; these pin
  * the invariants the hash can't express.
  */
class Round9bSpec extends AnyFunSuite {
  import SparkTestSession._

  lazy val docs = Tables.documents(spark, sf)
  lazy val events = Tables.events(spark, sf)
  lazy val emb = Tables.embeddings(spark, sf)

  test("unpivot: every flag carries the 3 metrics and values replay the wide aggregate") {
    val li = Tables.lineitem(spark, sf)
    val rows = Relational.returnFlagUnpivot(li).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val flags = rows.keys.map(_._1).toSet
    flags.foreach { f =>
      assert(Set("price_micros", "qty_units", "n_rows").forall(m => rows.contains((f, m))))
    }
    val nRows = li.groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    flags.foreach(f => assert(rows((f, "n_rows")) == nRows(f)))
    assert(rows.size == flags.size * 3)
  }

  test("string agg: member list is ascending, capped, and n_docs counts ALL members") {
    val rows = Relational.docListBySource(docs, cap = 5).collect()
    val sizes = docs.groupBy("lang", "source").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    rows.foreach { r =>
      val ids = r.getString(2).split(",").map(_.toLong).toVector
      assert(ids == ids.sorted)
      assert(ids.length == math.min(5L, sizes((r.getString(0), r.getString(1)))))
      assert(r.getLong(3) == sizes((r.getString(0), r.getString(1))))
    }
  }

  test("first touch: user totals conserved and each user's first event wins") {
    val rows = Relational.firstTouch(events).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.values.sum == events.select("user_id").distinct().count())
    val want = events
      .groupBy("user_id")
      .agg(min_by(col("event_type"), struct(col("ts"), col("event_id"))).as("ft"))
      .groupBy("ft").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == want)
  }

  test("active intervals: bucket fan-out is 5..6 per event and totals conserve") {
    val total = Relational.activeIntervals(events).agg(sum("n_active")).collect()(0).getLong(0)
    val perEvent = events.select(
      (expr("(ts + 299999999999L) div 60000000000L") - expr("ts div 60000000000L") + 1L).as("nb"))
      .collect().map(_.getLong(0))
    assert(perEvent.forall(n => n == 5L || n == 6L))
    assert(total == perEvent.sum)
  }

  test("stratified sample: exactly min(perStratum, stratum size) per lang, deterministic") {
    val a = TextAnalysis.stratifiedSample(docs, perStratum = 7).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val sizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val byLang = a.groupBy(_._2)
    assert(byLang.keySet == sizes.keySet.filter(l => sizes(l) > 0))
    byLang.foreach { case (l, rs) =>
      assert(rs.length == math.min(7L, sizes(l)))
      assert(rs.map(_._3).sorted.toVector == (1L to rs.length.toLong).toVector)
    }
    val b = TextAnalysis.stratifiedSample(docs, perStratum = 7).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(a.sortBy(_._1).sameElements(b.sortBy(_._1)))
  }

  test("crossval folds: counts conserve the corpus and folds live in [0, k)") {
    val rows = TextAnalysis.crossvalFolds(docs, k = 5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.map(_._3).sum == docs.count())
    assert(rows.forall(r => r._1 >= 0 && r._1 < 5))
    // content-stable: a doc's fold never depends on the rest of the corpus
    val one = TextAnalysis.crossvalFolds(docs.limit(10), k = 5)
    val sub = one.agg(sum("n_docs")).collect()(0).getLong(0)
    assert(sub == 10L)
  }

  test("markup strip: tags and entities drop, whitespace folds, clean text is fingerprinted") {
    import spark.implicits._
    val synth = Seq(
      (1L, "<p>hello   <b>world</b></p> &amp; more"),
      (2L, "no markup here"),
      (3L, "  edge   spacing  ")).toDF("doc_id", "text")
    val got = TextAnalysis.stripMarkup(synth).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(got(1L)._1 == "hello world more".length)
    assert(got(2L)._2 == TextAnalysis.stripMarkup(
      Seq((9L, "no markup here")).toDF("doc_id", "text")).collect()(0).getString(2))
    assert(got(3L)._1 == "edge spacing".length)
    // corpus pass covers every non-null doc
    assert(TextAnalysis.stripMarkup(docs).count() ==
      docs.filter(col("text").isNotNull).count())
  }

  test("array stats: higher-order profile replays the exploded recompute") {
    val got = TextAnalysis.tokenLengthStats(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val want = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("t"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"), sum(length(col("t"))).as("s"), max(length(col("t"))).as("m"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(3).toLong)).toMap
    assert(got == want)
  }

  test("containment: copies collapse to one canonical; a contained doc scores ~1 one way") {
    import spark.implicits._
    val base = docs.filter(length(col("text")) > 200).limit(1)
      .select("doc_id", "text").as[(Long, String)].collect().head
    val words = base._2.split(" ")
    val sub = words.take(math.max(3, (words.length * 0.8).toInt)).mkString(" ")
    val corpus = Seq((1L, base._2), (2L, base._2), (3L, sub)).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(corpus, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getDouble(3))).toMap
    // exact-collapse-first: the (1, 2) copy pair is exact-dedup's job
    // and never reaches banding; doc 2 (non-canonical) appears in NO pair
    assert(!pairs.keySet.exists { case (a, b) => a == 2L || b == 2L })
    // the 80%-prefix doc is (near-)contained in its source: its own
    // direction reads ~1 even though Jaccard would read ~0.8
    val c = pairs.get((1L, 3L))
    assert(c.isDefined && c.get._2 >= 0.95)
  }

  test("ann range: exactly the vectors at cos >= threshold, consistent with brute-force top-k") {
    val got = Ann.rangeSearch(emb, minCos = 0.2).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val all = Ann.cosineAll(emb).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == all.filter(_._2 >= 0.2))
    val topInRange = Ann.bruteForceTopK(emb).collect()
      .filter(_.getDouble(1) >= 0.2).map(_.getLong(0))
    topInRange.foreach(v => assert(got.contains(v)))
  }

  test("stream cdc: incremental state equals the batch apply exactly") {
    val streamed = graft.streaming.Streams.cdcStream(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val batch = Relational.cdcApply(events).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(streamed == batch)
  }

  test("bpe encode: counts bounded, monotone in merges, and replayed by the driver encoder") {
    val got = graft.operators.Bpe.encodeCorpus(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val zero = graft.operators.Bpe.encodeCorpus(docs, numMerges = 0).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == zero.keySet)
    got.foreach { case (id, (nWords, nBpe)) =>
      assert(nBpe >= nWords) // a word is >= 1 subword
      assert(nBpe <= zero(id)._2) // merges only ever shrink
    }
    // zero merges = every word splits into its characters
    val charSum = docs
      .select(col("doc_id"),
        explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("doc_id").agg(sum(length(col("w"))).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    zero.foreach { case (id, (_, nBpe)) => assert(nBpe == charSum(id)) }
  }

  test("range frame: the hour window replays a driver-side recompute per user") {
    val got = Relational.slidingHourStats(events).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    val raw = events.select(col("event_id"), col("user_id"), col("ts"),
        floor(col("value") * 1000000.0).cast("long").as("vm")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val hourNs = 3600L * 1000000000L
    raw.foreach { case (eid, uid, ts, _) =>
      val inFrame = raw.filter(e => e._2 == uid && e._3 > ts - hourNs && e._3 <= ts)
      assert(got(eid) == ((inFrame.length.toLong, inFrame.map(_._4).sum)))
    }
  }

  test("percent rank: bounds, extremes, and monotonicity in order value") {
    val rows = Relational.priceStanding(Tables.orders(spark, sf)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
    rows.foreach { case (_, _, pr, cd) =>
      assert(pr >= 0.0 && pr <= 1.0 && cd > 0.0 && cd <= 1.0 && cd >= pr)
    }
    rows.groupBy(_._2).foreach { case (_, rs) =>
      assert(rs.exists(_._3 == 0.0)) // cheapest order anchors at 0
      assert(rs.exists(_._4 == 1.0)) // cume_dist tops out at 1
    }
  }

  test("event transitions: counts conserve lead pairs and probabilities sum to 1 per from") {
    val rows = Relational.eventTransitions(events).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val nPairs = rows.map(_._3).sum
    val nEvents = events.count()
    val nUsers = events.select("user_id").distinct().count()
    assert(nPairs == nEvents - nUsers) // each user contributes (n_i - 1) pairs
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(math.abs(rs.map(_._4).sum - 1.0) < 1e-4)
    }
  }

  test("index time travel: the pinned snapshot ignores the later delta and matches live LSH") {
    val path = sys.props("java.io.tmpdir") + "/graft_annidx_tt_spec"
    val v0 = emb.filter(col("vec_id") % 5 =!= 0)
    graft.operators.AnnIndex.build(v0, path)
    graft.operators.AnnIndex.update(emb.filter(col("vec_id") % 5 === 0), path, "00001")
    val snap = graft.operators.AnnIndex.searchTopKAt(spark, path, "00000", queryId = 1L)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val live = Ann.lshTopK(v0, queryId = 1L)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(snap == live)
    // the full (current-version) search CAN see version-00001 vectors
    val full = graft.operators.AnnIndex.searchTopK(spark, path, queryId = 1L)
      .collect().map(_.getLong(0)).toSet
    assert(snap.map(_._1).forall(v => v % 5 != 0))
    assert(full != snap.map(_._1).toSet || full.forall(v => v % 5 != 0))
  }

  test("graph cc: users sharing an item share a community; labels are component minima") {
    val comm = graft.operators.Graph.userCommunities(events).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byItem = events
      .select(col("user_id"), get_json_object(col("props"), "$.k").cast("long").as("k"))
      .filter(col("k").isNotNull)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    byItem.groupBy(_._2).values.foreach { us =>
      val cs = us.map(u => comm(u._1)).toSet
      assert(cs.size == 1) // co-acting users are one community
    }
    // each community's label is <= every member's encoded id
    comm.foreach { case (u, c) => assert(c <= u * 2) }
    assert(comm.keySet == byItem.map(_._1).toSet)
  }

  test("verified near-dups: collapse+expand equals the brute pipeline under copy skew") {
    import spark.implicits._
    // 4 real docs, each duplicated 3x, plus a 2-word doc duplicated
    // (too short to shingle — must yield NO pair even though copied)
    val base = docs.filter(length(col("text")) > 200).limit(4)
      .select("doc_id", "text").as[(Long, String)].collect()
    val corpus = (base.zipWithIndex.flatMap { case ((_, t), i) =>
      (0 until 3).map(c => ((i * 10 + c).toLong, t))
    } :+ (900L, "two words") :+ (901L, "two words")).toSeq.toDF("doc_id", "text")
    val got = Dedup.verifiedNearDups(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // brute reference: candidates over the RAW corpus + exact jaccard
    val cand = Dedup.minhashCandidates(corpus)
    val brute = Dedup.ngramJaccard(corpus, 0.8)
      .join(cand, Seq("doc_a", "doc_b"), "left_semi").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == brute)
    // every copy pair surfaced at jaccard 1.0; the unshingleable
    // copies (900, 901) surfaced nowhere
    assert(got.contains((0L, 1L, 1.0)) && got.contains((10L, 12L, 1.0)))
    assert(!got.exists(p => p._1 >= 900L || p._2 >= 900L))
  }

  test("drop contained: the excerpt drops, the source and unrelated docs stay") {
    import spark.implicits._
    val base = docs.filter(length(col("text")) > 300).limit(2)
      .select("doc_id", "text").as[(Long, String)].collect()
    val words = base(0)._2.split(" ")
    val excerpt = words.take(math.max(3, (words.length * 0.85).toInt)).mkString(" ")
    val corpus = Seq(
      (1L, base(0)._2), (2L, excerpt), (3L, base(1)._2),
      (4L, base(0)._2) // exact copy of 1 — collapses, never a loser
    ).toDF("doc_id", "text")
    val kept = Dedup.dropContained(corpus, threshold = 0.8).collect()
      .map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L)) // excerpt dropped, source + unrelated kept
    // on the real corpus the kept set is a subset of the canonical set
    val full = Dedup.dropContained(docs).collect().map(_.getLong(0)).toSet
    val nCanon = docs.select(md5(col("text"))).distinct().count()
    assert(full.size <= nCanon && full.nonEmpty)
  }

  test("winsorized mean: clip bounds are real order statistics and the mean replays") {
    val got = Relational.winsorizedMean(events).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val byType = events.select(col("event_type"),
        floor(col("value") * 1000000.0).cast("long").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
    got.foreach { case (t, (n, mean)) =>
      val vs = byType(t).map(_._2).sorted
      assert(n == vs.length)
      val lo = vs((5 * vs.length + 99) / 100 - 1)
      val hi = vs((95 * vs.length + 99) / 100 - 1)
      val clipped = vs.map(v => math.max(lo, math.min(hi, v)))
      val want = BigDecimal(clipped.map(BigDecimal(_)).sum.toDouble / vs.length)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(mean - want) < 1e-9, s"$t: $mean vs $want")
      // a winsorized mean is bounded by the clip points
      assert(mean >= lo && mean <= hi)
    }
    assert(got.keySet == byType.keySet)
  }

  test("vocab coverage: monotone in k, bounded by 1, and exact at vocab size") {
    val rows = TextAnalysis.vocabCoverage(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sortBy(_._1)
    val total = rows.head._3
    assert(rows.forall(_._3 == total))
    assert(rows.map(_._2).toVector == rows.map(_._2).toVector.sorted) // covered grows with k
    rows.foreach { case (_, cov, tot, c) =>
      assert(cov <= tot && c <= 1.0 && c > 0.0)
    }
    val vocabSize = graft.operators.Bm25.tokenize(docs).select("term").distinct().count()
    rows.filter(_._1 >= vocabSize).foreach { case (_, cov, tot, _) => assert(cov == tot) }
  }

  test("stream transitions: cross-batch state reproduces the batch transition matrix") {
    val streamed = graft.streaming.Streams.transitionsStream(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val batch = Relational.eventTransitions(events).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(streamed == batch)
  }
}
