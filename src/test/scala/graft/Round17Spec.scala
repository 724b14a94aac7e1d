package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-17: the store-family symmetry closures (WordPiece encode
  * serving, PQ pinned reads with codebook pinning, the vector-store
  * snapshot diff, the staged multiprobe serve) and the r16 ADVICE
  * fixes (derived harmonic-centrality clearing constant). Each new
  * key gets a planted exact case plus a real-corpus parity fold; the
  * multiprobe × merge interaction the r16 verdict named untested is
  * pinned here. */
class Round17Spec extends AnyFunSuite {
  import SparkTestSession._

  // ---- q_wordpiece_encode ----

  /** The planted dictionary where WordPiece and BPE DISAGREE (the
    * Round16Spec divergence corpus): likelihood picks (a,b) (score
    * 1/1) over the more frequent (x,y) (3/9), so "ab" merges to one
    * piece and the three "xy" stay at two — 7 WP subwords; count-max
    * BPE merges (x,y) instead — 5 BPE subwords. The encode key must
    * reproduce the WP side, not the BPE side. */
  test("wordpiece encode: planted divergence dictionary encodes under the LIKELIHOOD chain") {
    import spark.implicits._
    import graft.operators.Bpe
    val planted = Seq((1L, "xy xy xy ab")).toDF("doc_id", "text")
    val wp = Bpe.wordpieceEncodeCorpus(planted, numMerges = 1).head
    assert((wp.getLong(0), wp.getLong(1), wp.getLong(2)) === ((1L, 4L, 7L)))
    val bpe = Bpe.encodeCorpus(planted, numMerges = 1).head
    assert((bpe.getLong(0), bpe.getLong(1), bpe.getLong(2)) === ((1L, 4L, 5L)),
      "the BPE twin must diverge on this dictionary or the test proves nothing")
  }

  /** Real-corpus invariants + plan-sharing parity: per-doc counts are
    * bounded by [n_words, n_chars], and the language rollup of the
    * encode relation IS the fertility relation (fertility rides the
    * encode plan — a drift between them would mean two vocabularies). */
  test("wordpiece encode: corpus bounds hold; fertility rollup equals the encode rollup") {
    import graft.operators.Bpe
    val docs = graft.sources.Tables.documents(spark, sf)
    val enc = Bpe.wordpieceEncodeCorpus(docs)
    val chars = docs.select(col("doc_id"),
        expr("aggregate(transform(filter(split(lower(text), ' '), w -> length(w) > 0)," +
          " w -> CAST(length(w) AS BIGINT)), CAST(0 AS BIGINT), (a, b) -> a + b)").as("n_chars"))
    val joined = enc.join(chars, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (nw, nwp, nc) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nwp >= nw && nwp <= nc,
        s"doc ${r.getLong(0)}: n_wp_tokens $nwp outside [$nw, $nc]")
    }
    val viaEnc = enc.join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy("lang")
      .agg(sum("n_words").as("w"), sum("n_wp_tokens").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val fert = Bpe.wordpieceFertility(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(viaEnc === fert)
  }

  // ---- q_pq_asof: codebook-pinned snapshot reads ----

  /** The pin parity pair: a read pinned at the build version equals a
    * fresh build on the pinned corpus (codebooks trained there ARE
    * the pinned codebooks), and a pin at the ingest version equals
    * the live serve (frozen codebooks make the visible codes exactly
    * a rebuild-then-reingest's). */
  test("pq asof: pin at build == rebuild on pinned corpus; pin at head == live serve") {
    import graft.operators.PqIndex
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val tmp = java.nio.file.Files.createTempDirectory("r17pqasof").toString
    val cut = emb.agg(max(col("vec_id"))).head.getLong(0) * 4 / 5
    PqIndex.build(emb.filter(col("vec_id") <= cut), s"$tmp/two")
    PqIndex.update(emb.filter(col("vec_id") > cut), s"$tmp/two", "00001")
    PqIndex.build(emb.filter(col("vec_id") <= cut), s"$tmp/pinned")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows(PqIndex.searchTopKAt(spark, s"$tmp/two", "00000"))
      === rows(PqIndex.searchTopK(spark, s"$tmp/pinned")),
      "pin at the build version must serve the pinned-corpus rebuild")
    assert(rows(PqIndex.searchTopKAt(spark, s"$tmp/two", "00001"))
      === rows(PqIndex.searchTopK(spark, s"$tmp/two")),
      "pin at the newest version must equal the live serve")
  }

  /** The codebook-pinning loud failure: a visible set with no build
    * delta (here: the pq.params sidecar removed, the
    * trained-state-not-visible shape) must refuse the read naming the
    * codebook contract — never serve codes under absent/other
    * codebooks. */
  test("pq asof: a visible set without the build delta fails loudly on the codebook contract") {
    import graft.operators.PqIndex
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val tmp = java.nio.file.Files.createTempDirectory("r17pqdiv").toString
    PqIndex.build(emb, s"$tmp/s")
    val params = new java.io.File(s"$tmp/s/delta-00000/pq.params")
    assert(params.isFile && params.delete(), "fixture: remove the trained-state sidecar")
    val ex = intercept[IllegalArgumentException] {
      PqIndex.searchTopKAt(spark, s"$tmp/s", "00000").collect()
    }
    assert(ex.getMessage.contains("codebooks are trained state"))
  }

  // ---- q_ann_diff: vector-store snapshot diff ----

  /** Planted deltas: ids ≤ cut build (00000), > cut ingest (00001),
    * then a tombstone batch (00002). The ingest diff adds exactly
    * one bucket-mass unit per new vector per table and removes
    * nothing; the delete diff removes exactly the tombstoned count
    * per table; the self-diff is all-zero. */
  test("ann diff: planted ingest and delete deltas; self-diff zero") {
    import graft.operators.AnnIndex
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val tmp = java.nio.file.Files.createTempDirectory("r17anndiff").toString
    val mx = emb.agg(max(col("vec_id"))).head.getLong(0)
    val cut = mx / 2
    val nA = emb.filter(col("vec_id") <= cut).count()
    val nB = emb.count()
    AnnIndex.build(emb.filter(col("vec_id") <= cut), s"$tmp/s")
    AnnIndex.update(emb.filter(col("vec_id") > cut), s"$tmp/s", "00001")
    val self = AnnIndex.diffVersions(spark, s"$tmp/s", "00000", "00000").collect()
    assert(self.length === 8)
    self.foreach { r =>
      assert(r.getLong(3) === 0L && r.getLong(4) === 0L && r.getLong(5) === 0L,
        "self-diff must be all-zero")
      assert(r.getLong(6) === r.getLong(7))
    }
    val d = AnnIndex.diffVersions(spark, s"$tmp/s", "00000", "00001").collect()
    assert(d.length === 8)
    assert(d.map(_.getLong(0)).toSeq === (0L to 7L), "one ordered row per table")
    d.foreach { r =>
      assert(r.getLong(4) === nB - nA, s"table ${r.getLong(0)}: each new vector adds one bucket-mass unit")
      assert(r.getLong(5) === 0L, "a pure ingest removes nothing")
      assert(r.getLong(3) >= 1L && r.getLong(3) <= nB - nA)
      assert((r.getLong(6), r.getLong(7)) === ((nA, nB)))
    }
    val dead = emb.filter(col("vec_id") <= cut && col("vec_id") % 7 === 1).select("vec_id")
    val nDead = dead.count()
    assert(nDead > 0, "fixture needs a non-empty tombstone batch")
    AnnIndex.delete(dead, s"$tmp/s", "00002")
    val dd = AnnIndex.diffVersions(spark, s"$tmp/s", "00000", "00002").collect()
    dd.foreach { r =>
      // added/removed are PER-BUCKET clamped sums, so an ingested and
      // a tombstoned vector sharing a (t, bucket) cell cancel — only
      // the NET mass is corpus-derivable; the gross legs are bounded
      // by the batch sizes
      assert(r.getLong(4) - r.getLong(5) === (nB - nDead) - nA,
        s"table ${r.getLong(0)}: net bucket-mass must equal the live-count delta")
      assert(r.getLong(4) <= nB - nA && r.getLong(5) <= nDead)
      assert((r.getLong(6), r.getLong(7)) === ((nA, nB - nDead)))
    }
  }

  // ---- multiprobe × merge (r16 verdict task 6) + staged multiprobe ----

  /** The untested cross-product of r16's two new ANN legs: multiprobe
    * served over a MERGED store must equal multiprobe over a rebuild
    * on the union corpus (bucket determinism makes the merge a
    * verbatim union, so every probe resolves identically), and the
    * staged serve must equal the corpus-side multiprobe — the
    * q_ann_multiprobe_staged contract. */
  test("multiprobe: merged-store serve == rebuild serve == corpus-side serve") {
    import graft.operators.{Ann, AnnIndex}
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val tmp = java.nio.file.Files.createTempDirectory("r17mpmrg").toString
    val cut = emb.agg(max(col("vec_id"))).head.getLong(0) / 2
    AnnIndex.build(emb.filter(col("vec_id") <= cut), s"$tmp/a",
      numTables = 4, bitsPerTable = 4)
    AnnIndex.build(emb.filter(col("vec_id") > cut), s"$tmp/b",
      numTables = 4, bitsPerTable = 4)
    AnnIndex.mergeStores(spark, s"$tmp/a", s"$tmp/b", s"$tmp/m")
    AnnIndex.build(emb, s"$tmp/full", numTables = 4, bitsPerTable = 4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val merged = rows(AnnIndex.searchMultiprobeTopK(spark, s"$tmp/m"))
    val rebuilt = rows(AnnIndex.searchMultiprobeTopK(spark, s"$tmp/full"))
    val corpus = rows(Ann.lshMultiprobeTopK(emb))
    assert(merged === rebuilt, "multiprobe must be merge-stable")
    assert(rebuilt === corpus, "staged multiprobe must equal the corpus-side serve")
  }

  // ---- q_pq_diff: code-occupancy snapshot diff on the PQ store ----

  /** Planted parity on the two-version PQ store: the ingest diff
    * adds one code-mass unit per new vector per subspace (codes are
    * per-vector, one per j) and removes nothing; the self-diff is
    * all-zero; a delete leg nets out exactly (the clamped-cell
    * cancellation contract shared with the ANN diff). */
  test("pq diff: planted ingest and delete deltas; self-diff zero; cells bounded by ksub") {
    import graft.operators.PqIndex
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val tmp = java.nio.file.Files.createTempDirectory("r17pqdiff").toString
    val cut = emb.agg(max(col("vec_id"))).head.getLong(0) * 4 / 5
    val nA = emb.filter(col("vec_id") <= cut).count()
    val nB = emb.count()
    PqIndex.build(emb.filter(col("vec_id") <= cut), s"$tmp/s")
    PqIndex.update(emb.filter(col("vec_id") > cut), s"$tmp/s", "00001")
    val self = PqIndex.diffVersions(spark, s"$tmp/s", "00000", "00000").collect()
    assert(self.length === 8)
    self.foreach { r =>
      assert(r.getLong(3) === 0L && r.getLong(4) === 0L && r.getLong(5) === 0L)
      assert(r.getLong(6) === r.getLong(7))
    }
    val d = PqIndex.diffVersions(spark, s"$tmp/s", "00000", "00001").collect()
    assert(d.map(_.getLong(0)).toSeq === (0L to 7L))
    d.foreach { r =>
      assert(r.getLong(1) <= 16L && r.getLong(2) <= 16L, "cells bounded by ksub")
      assert(r.getLong(4) === nB - nA, "each new vector adds one code-mass unit per subspace")
      assert(r.getLong(5) === 0L)
      assert((r.getLong(6), r.getLong(7)) === ((nA, nB)))
    }
    val dead = emb.filter(col("vec_id") > cut && col("vec_id") % 3 === 0).select("vec_id")
    val nDead = dead.count()
    assert(nDead > 0)
    PqIndex.delete(dead, s"$tmp/s", "00002")
    PqIndex.diffVersions(spark, s"$tmp/s", "00000", "00002").collect().foreach { r =>
      assert(r.getLong(4) - r.getLong(5) === (nB - nDead) - nA,
        "net code-mass must equal the live-count delta")
      assert((r.getLong(6), r.getLong(7)) === ((nA, nB - nDead)))
    }
  }

  // ---- q_dedup_diff / q_semantic_diff: pair-substrate snapshot diffs ----

  /** The intrinsic-pair contract the oracle rides, checked from the
    * SERVE side: build→head added pairs equal the head serve
    * restricted to pairs touching the ingested range; the dropped leg
    * (which the gate store never exercises) appears when a delete
    * delta removes a pair member. */
  test("dedup diff: added == head pairs touching the new range; delete produces dropped rows") {
    import graft.operators.DedupStore
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf)
    val tmp = java.nio.file.Files.createTempDirectory("r17dddiff").toString
    val cut = docs.agg(max(col("doc_id"))).head.getLong(0) * 3 / 4
    DedupStore.build(docs.filter(col("doc_id") <= cut), s"$tmp/s")
    DedupStore.update(docs.filter(col("doc_id") > cut), s"$tmp/s", "00001")
    val diff = DedupStore.diffVersions(spark, s"$tmp/s", "00000", "00001").collect()
    assert(diff.forall(_.getString(3) == "added"), "a pure ingest drops nothing")
    val added = diff.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val headTouchingNew = DedupStore.verifiedNearDups(spark, s"$tmp/s")
      .filter(col("doc_a") > cut || col("doc_b") > cut).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(added === headTouchingNew,
      "added pairs must be exactly the head pairs touching the ingested id range")
    // dropped leg: a planted exact-duplicate trio, one member deleted
    val planted = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "totally different words here entirely")).toDF("doc_id", "text")
    DedupStore.build(planted, s"$tmp/p")
    DedupStore.delete(Seq(2L).toDF("doc_id"), s"$tmp/p", "00001")
    val pd = DedupStore.diffVersions(spark, s"$tmp/p", "00000", "00001").collect()
    assert(pd.length === 1)
    assert((pd.head.getLong(0), pd.head.getLong(1), pd.head.getString(3))
      === ((1L, 2L, "dropped")))
  }

  /** The semantic twin, planted end to end: identical vectors pair at
    * selfcos, the ingest adds the cross pair, the delete drops it. */
  test("semantic diff: ingest adds, delete drops, self-diff empty") {
    import graft.operators.SemanticStore
    import spark.implicits._
    val mkv = (seed: Int) => Array.tabulate(8)(i => (i + seed).toFloat / 10f)
    val base = Seq((1L, mkv(1).toSeq), (2L, mkv(50).toSeq)).toDF("vec_id", "embedding")
    val ing = Seq((5L, mkv(1).toSeq)).toDF("vec_id", "embedding") // near-parallel to vec 1
    val tmp = java.nio.file.Files.createTempDirectory("r17smdiff").toString
    SemanticStore.build(base, s"$tmp/s")
    SemanticStore.update(ing, s"$tmp/s", "00001")
    assert(SemanticStore.diffVersions(spark, s"$tmp/s", "00000", "00000").count() === 0L)
    val d = SemanticStore.diffVersions(spark, s"$tmp/s", "00000", "00001").collect()
    assert(d.nonEmpty && d.forall(_.getString(3) == "added"))
    assert(d.exists(r => r.getLong(0) === 1L && r.getLong(1) === 5L))
    SemanticStore.delete(Seq(5L).toDF("vec_id"), s"$tmp/s", "00002")
    val dd = SemanticStore.diffVersions(spark, s"$tmp/s", "00001", "00002").collect()
    assert(dd.nonEmpty && dd.forall(_.getString(3) == "dropped"))
    assert(dd.exists(r => r.getLong(0) === 1L && r.getLong(1) === 5L))
  }

  // ---- q_welch_ttest ----

  /** Hand-computed planted case (A = {1,2,3}, B = {4,6}):
    * va = 1, vb = 2, se = 4/3, t_A = −3/√(4/3) = −2.598076,
    * df = (16/9)/(1/18 + 1) = 1.684211; the B row mirrors with the
    * opposite sign and the same df; a single-doc source is NULL. */
  test("welch t-test: planted two-source exact; single-doc source NULL; per-source rows") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    val planted = Seq(
      (1L, "a", 1L), (2L, "a", 2L), (3L, "a", 3L),
      (4L, "b", 4L), (5L, "b", 6L)).toDF("doc_id", "source", "n_chars")
    val rows = TextAnalysis.welchTTestLength(planted).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(rows("a") === ((3L, 2L, -2.598076, 1.684211)))
    assert(rows("b") === ((2L, 3L, 2.598076, 1.684211)))
    val lone = Seq((1L, "a", 5L), (2L, "b", 6L), (3L, "b", 7L), (4L, "b", 9L))
      .toDF("doc_id", "source", "n_chars")
    val lr = TextAnalysis.welchTTestLength(lone).collect()
      .map(r => r.getString(0) -> (r.isNullAt(3), r.isNullAt(4))).toMap
    assert(lr("a") === ((true, true)), "a one-doc source has no variance — NULL t and df")
    val real = TextAnalysis.welchTTestLength(
      graft.sources.Tables.documents(spark, sf)).collect()
    assert(real.length ===
      graft.sources.Tables.documents(spark, sf).select("source").distinct().count())
  }

  // ---- q_search_explain ----

  /** The decomposition contract: explained docs are exactly the
    * top-10, each doc's score column matches q_search_topn's rounded
    * score, and the per-term contributions re-sum to it within
    * per-term rounding slack. */
  test("search explain: doc set and scores match topn; contributions re-sum") {
    import graft.operators.Bm25
    val docs = graft.sources.Tables.documents(spark, sf)
    val expl = Bm25.searchExplain(docs).collect()
    val topn = Bm25.searchTopN(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(expl.map(_.getLong(0)).toSet === topn.keySet)
    expl.foreach { r =>
      assert(r.getDouble(6) === topn(r.getLong(0)), "score column must equal the serve's")
      assert(r.getDouble(5) > 0.0 && r.getLong(2) >= 1L && r.getLong(3) >= 1L)
      assert(Bm25.QueryTerms.contains(r.getString(1)))
    }
    expl.groupBy(_.getLong(0)).foreach { case (doc, rs) =>
      val resum = rs.map(_.getDouble(5)).sum
      assert(math.abs(resum - topn(doc)) <= 0.0001 * rs.length + 1e-9,
        s"doc $doc: contributions must re-sum to the score within rounding slack")
    }
  }

  // ---- q_chrf_pairs ----

  /** The defined all-n contract, hand-computed: an identical 4-char
    * pair has P = R = 4/6 (n = 5, 6 have empty denominators and
    * contribute 0), so chrF = 5PR/(4P+R) = 2/3; char-disjoint texts
    * score 0; real-corpus pairs match the BLEU key's pair set and
    * stay in [0, 1]. */
  test("chrf pairs: planted identical and disjoint pairs exact; corpus pair parity with bleu") {
    import graft.operators.{DedupStore, TextAnalysis}
    import spark.implicits._
    val docs = Seq((1L, "abab"), (2L, "abab"), (3L, "cdcd")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("doc_a", "doc_b")
    val r = TextAnalysis.chrfPairs(docs, pairs).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> ((x.getDouble(2), x.getDouble(3), x.getDouble(4))))
      .toMap
    assert(r((1L, 2L)) === ((0.666667, 0.666667, 0.666667)))
    assert(r((1L, 3L)) === ((0.0, 0.0, 0.0)))
    val real = graft.sources.Tables.documents(spark, sf)
    val storePath = {
      val tmp = java.nio.file.Files.createTempDirectory("r17chrf").toString
      DedupStore.build(real, tmp); tmp
    }
    val vp = DedupStore.verifiedNearDups(spark, storePath)
    val chrf = TextAnalysis.chrfPairs(real, vp).collect()
    val bleuPairsSet = TextAnalysis.bleuPairs(real, vp).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(chrf.map(x => (x.getLong(0), x.getLong(1))).toSet === bleuPairsSet)
    chrf.foreach { x =>
      Seq(x.getDouble(2), x.getDouble(3), x.getDouble(4)).foreach(v =>
        assert(v >= 0.0 && v <= 1.0))
    }
  }

  // ---- q_fusion_borda ----

  /** Independent reference: collect both depth-N ranked runs, fold
    * the Borda points in Scala, and the operator's top-10 must match
    * point-for-point; the lexical winner carries exactly depth
    * points. */
  test("fusion borda: matches the Scala fold over both collected runs") {
    import graft.operators.{Ann, Bm25, Hybrid, TopK}
    val docs = graft.sources.Tables.documents(spark, sf)
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val depth = Hybrid.FusionDepth
    val bm = TopK.rankedTopN(Bm25.bm25Score(docs), "score", "doc_id", depth, "rb")
      .collect().map(r => r.getLong(0) -> (depth + 1L - r.getInt(2))).toMap
    val cr = TopK.rankedTopN(Ann.cosineAll(emb, 0L), "cos", "vec_id", depth, "rc")
      .collect().map(r => r.getLong(0) -> (depth + 1L - r.getInt(2))).toMap
    val expected = (bm.keySet ++ cr.keySet).toSeq
      .map(id => (id, bm.getOrElse(id, 0L), cr.getOrElse(id, 0L)))
      .map { case (id, p1, p2) => (id, p1, p2, p1 + p2) }
      .sortBy { case (id, _, _, b) => (-b, id) }
      .take(10)
    val got = Hybrid.bordaSearch(docs, emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
    assert(got.exists(_._2 === depth.toLong), "the lexical rank-1 doc carries depth points")
  }

  // ---- q_emb_whiten ----

  /** Planted two-vector case: the constant dimension whitens to 0.0,
    * the varying one to ±1; on the real corpus every dimension's
    * whitened mean is ~0 and variance ~1 (population convention). */
  test("emb whiten: planted exact; corpus dims mean~0 var~1") {
    import graft.operators.Vectors
    import spark.implicits._
    val planted = Seq(
      (1L, Seq(0.0f, 1.0f)), (2L, Seq(0.002f, 1.0f))).toDF("vec_id", "embedding")
    val w = Vectors.whiten(planted).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(w((1L, 0L)) === -1.0 && w((2L, 0L)) === 1.0)
    assert(w((1L, 1L)) === 0.0 && w((2L, 1L)) === 0.0)
    val real = Vectors.whiten(graft.sources.Tables.embeddings(spark, sf))
    val stats = real.groupBy("dim_idx")
      .agg(avg("w").as("m"), avg(expr("w * w")).as("m2")).collect()
    assert(stats.nonEmpty)
    stats.foreach { r =>
      assert(math.abs(r.getDouble(1)) < 1e-3, s"dim ${r.getLong(0)}: whitened mean must be ~0")
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-2, s"dim ${r.getLong(0)}: whitened variance must be ~1")
    }
  }

  // ---- q_hl_shift ----

  /** Hand-planted weighted medians: a = {1,2,3} vs rest {10} gives
    * differences {−9,−8,−7} → HL −8 (and b mirrors at +8); the tie
    * case a = {1,1,3} vs {2} weights −1 twice so the lower median at
    * (3+1) div 2 = 2 lands on −1; a single-source corpus emits no
    * rows. */
  test("hl shift: planted medians exact; tie weights; single-source empty") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    val p1 = Seq((1L, "a", 1L), (2L, "a", 2L), (3L, "a", 3L), (4L, "b", 10L))
      .toDF("doc_id", "source", "n_chars")
    val r1 = TextAnalysis.hlShiftLength(p1).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(r1("a") === ((3L, -8L)))
    assert(r1("b") === ((3L, 8L)))
    val p2 = Seq((1L, "a", 1L), (2L, "a", 1L), (3L, "a", 3L), (4L, "b", 2L))
      .toDF("doc_id", "source", "n_chars")
    val r2 = TextAnalysis.hlShiftLength(p2).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(r2("a") === -1L)
    val solo = Seq((1L, "a", 5L), (2L, "a", 9L)).toDF("doc_id", "source", "n_chars")
    assert(TextAnalysis.hlShiftLength(solo).count() === 0L)
    val real = TextAnalysis.hlShiftLength(
      graft.sources.Tables.documents(spark, sf)).collect()
    assert(real.length === 20, "one row per source on the gate corpus")
  }

  // ---- q_leakage_safe_split ----

  /** The guard's contract, checked against an independent Scala
    * reference: quarantined = base-train docs verified-paired to any
    * held-out doc; val/test assignments never move; everything else
    * keeps its base split. Planted duplicate pairs guarantee at
    * least one train↔holdout pair exists. */
  test("leakage-safe split: quarantine equals the reference tainted set; holdout unmoved") {
    import graft.operators.{DedupStore, TextAnalysis}
    import spark.implicits._
    val planted = (1L to 40L).map(i =>
      (i, s"shared duplicate text block number ${(i + 1) / 2} with enough words here"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("r17split").toString
    DedupStore.build(planted, tmp)
    val pairs = DedupStore.verifiedNearDups(spark, tmp)
    val base = TextAnalysis.trainSplit(planted).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val edges = pairs.collect().flatMap(r =>
      Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
    val holdout = base.filter(_._2 != "train").keySet
    val expectedQuarantine = edges.collect {
      case (x, y) if base(x) == "train" && holdout(y) => x
    }.toSet
    assert(expectedQuarantine.nonEmpty,
      "fixture must produce at least one train doc paired to a held-out twin")
    val got = TextAnalysis.leakageSafeSplit(planted, pairs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    got.foreach { case (id, s) =>
      val expect =
        if (expectedQuarantine(id)) "quarantined" else base(id)
      assert(s === expect, s"doc $id")
    }
  }

  // ---- q_stream_whiten ----

  /** The stateless-map theorem, checked literally: the drained union
    * over micro-batches equals the batch whitening row for row. */
  test("stream whiten: drained union equals the batch whitening") {
    import graft.operators.Vectors
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val batch = Vectors.whiten(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val streamed = graft.streaming.Streams.whitenStream(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed === batch)
  }

  // ---- q_pack_efficiency ----

  /** Planted single-source corpus with token counts {3,3,3,5}: cap 8
    * packs {3,3} {3,5}? — greedy in id order: bin0 = 3+3 = 6, +3
    * overflows → bin1 = 3+5 = 8 → 2 bins, util 14/16; cap 4 gives
    * one bin per doc with the 5-token doc overflowing → 4 bins, one
    * overflow, util 14/16 = 0.875; totals invariant across caps. */
  test("pack efficiency: planted caps exact; totals invariant; rides the pack fold") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    val planted = Seq(
      (1L, "s", "a b c"), (2L, "s", "d e f"), (3L, "s", "g h i"),
      (4L, "s", "j k l m n")).toDF("doc_id", "source", "text")
    val r = TextAnalysis.packEfficiency(planted, Seq(4L, 8L)).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4))))
      .toMap
    assert(r(8L) === ((2L, 0L, 14L, 0.875)))
    assert(r(4L) === ((4L, 1L, 14L, 0.875)))
    val real = TextAnalysis.packEfficiency(
      graft.sources.Tables.documents(spark, sf)).collect()
    assert(real.length === 4)
    val totals = real.map(_.getLong(3)).distinct
    assert(totals.length === 1, "total tokens must be cap-invariant")
  }

  // ---- q_runs_test ----

  /** Hand-planted sequences: a perfectly alternating above/below
    * sequence maximizes runs (positive z); a fully sorted one
    * minimizes them (runs = 2, negative z); an all-median source
    * keeps nothing and emits NO row (mirrored by the oracle). */
  test("runs test: alternating positive, sorted negative, constant absent, exact runs") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    def mk(vals: Seq[Long], src: String) =
      vals.zipWithIndex.map { case (v, i) => ((i + 1).toLong, src, v) }
    // median of {1..8} lower = 4; kept = values != 4
    val alt = mk(Seq(1L, 8L, 2L, 7L, 3L, 6L, 4L, 5L), "alt")
    val srt = mk(Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L), "srt")
    val cst = mk(Seq(5L, 5L, 5L, 5L), "cst")
    val df = (alt ++ srt ++ cst).toDF("doc_id", "source", "n_chars")
    val r = TextAnalysis.runsTestLength(df).collect()
      .map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3),
          if (x.isNullAt(4)) None else Some(x.getDouble(4))))).toMap
    // alt: kept 1,8,2,7,3,6,5 (4 dropped) signs 0,1,0,1,0,1,1 → runs 6
    assert(r("alt")._1 === 4L && r("alt")._2 === 3L && r("alt")._3 === 6L)
    assert(r("alt")._4.get > 0.0, "alternation reads as positive z")
    // srt: kept 1,2,3,5,6,7,8 signs 0,0,0,1,1,1,1 → runs 2
    assert(r("srt")._3 === 2L)
    assert(r("srt")._4.get < 0.0, "sortedness reads as negative z")
    assert(!r.contains("cst"),
      "an all-median source keeps nothing and emits no row")
  }

  // ---- q_absorbing_time ----

  /** Hand-planted deterministic chain a→b→c per user (three users):
    * occurrences a:3 (3 out), b:3 (3 out), c:3 (0 out) — p_cont
    * 1/1/0 and the truncated expectation converges inside the budget
    * to t(c)=0, t(b)=1, t(a)=2; a single-event-type corpus reads
    * p_cont 0 / t 0. */
  test("absorbing time: planted chain exact; expectation monotone from entry") {
    import graft.operators.Relational
    import spark.implicits._
    val ev = (0 until 3).flatMap { u =>
      Seq((u.toLong * 10 + 1, u.toLong, "a", 1000L + u * 100),
        (u.toLong * 10 + 2, u.toLong, "b", 2000L + u * 100),
        (u.toLong * 10 + 3, u.toLong, "c", 3000L + u * 100))
    }.toDF("event_id", "user_id", "event_type", "ts")
    val r = Relational.absorbingTime(ev).collect()
      .map(x => x.getString(0) -> ((x.getDouble(1), x.getDouble(2)))).toMap
    assert(r("a") === ((1.0, 2.0)))
    assert(r("b") === ((1.0, 1.0)))
    assert(r("c") === ((0.0, 0.0)))
    val real = Relational.absorbingTime(
      graft.sources.Tables.events(spark, sf)).collect()
    assert(real.nonEmpty)
    real.foreach { x =>
      assert(x.getDouble(1) >= 0.0 && x.getDouble(1) <= 1.0)
      assert(x.getDouble(2) >= 0.0)
    }
  }

  // ---- plan shapes ----

  /** The whitening claim "a pure map stage" held in the plan: with
    * the stats baked in as literals, whitenWith's physical plan
    * contains NO shuffle exchange — scan → explode → project. */
  test("whiten plan: the literal-stats transform stage has zero exchanges") {
    import graft.operators.Vectors
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val stats = Vectors.whitenStats(emb)
    val plan = Vectors.whitenWith(emb, stats)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"whitenWith must be shuffle-free:\n$plan")
  }

  // ---- harmonic centrality: derived clearing constant (ADVICE r16) ----

  /** maxHops beyond the old hard-wired lcm(1..6): a 7-deep path graph
    * from one seed must read the EXACT harmonic sum (60 div 7 = 8
    * would have truncated 1/7 to 8/60); a depth past the Long-safe
    * cap fails loudly instead of serving inexact sums. */
  test("harmonic centrality: depth-7 is exact under the derived lcm; depth > 20 fails loudly") {
    import spark.implicits._
    import graft.operators.Graph
    val path = (0L to 6L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val r = Graph.harmonicCentrality(path, seeds = 1, maxHops = 7).head
    assert(r.getLong(1) === 7L)
    // 1 + 1/2 + ... + 1/7 = 1089/420
    assert(r.getDouble(2) === math.rint(1089.0 / 420.0 * 1e6) / 1e6)
    val ex = intercept[IllegalArgumentException] {
      Graph.harmonicCentrality(path, seeds = 1, maxHops = 21)
    }
    assert(ex.getMessage.contains("lcm"))
    // the default depth keeps its r16-verified constant
    val d6 = Graph.harmonicCentrality(path, seeds = 1).head
    assert(d6.getLong(1) === 6L)
    assert(d6.getDouble(2) === math.rint((60 + 30 + 20 + 15 + 12 + 10) / 60.0 * 1e6) / 1e6)
  }
}
