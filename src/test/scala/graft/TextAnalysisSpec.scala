package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Multimodal, TextAnalysis}
import graft.sources.Tables

class TextAnalysisSpec extends AnyFunSuite {
  import SparkTestSession._

  lazy val docs = Tables.documents(spark, sf)

  test("lang id ratios in [0,1]; label consistent with threshold") {
    val rows = TextAnalysis.langId(docs).collect()
    assert(rows.length == docs.count())
    rows.foreach { r =>
      val ratio = r.getDouble(1)
      assert(ratio >= 0.0 && ratio <= 1.0)
      assert(r.getString(2) == (if (ratio >= 0.05) "en" else "und"))
    }
  }

  test("quality metrics are internally consistent") {
    TextAnalysis.quality(docs).collect().foreach { r =>
      val nTokens = r.getLong(1); val nDistinct = r.getLong(2)
      assert(nDistinct <= nTokens)
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0) // distinct_ratio
      assert(r.getDouble(6) > 0.0 && r.getDouble(6) <= 1.0) // rep_ratio
    }
  }

  test("token counts: alnum-run count equals whitespace count on this corpus") {
    // corpus is single-space-separated lowercase alnum words
    val bad = TextAnalysis.tokenCounts(docs)
      .filter(col("n_ws") =!= col("n_alnum")).count()
    assert(bad == 0)
    val sums = TextAnalysis.tokenCounts(docs)
      .agg(sum("n_ws"), sum("n_bpe_ish")).collect()(0)
    assert(sums.getLong(1) >= sums.getLong(0)) // >= 1 subword per token
  }

  test("fingerprint: one md5 per doc; near-dup docs may share, distinct docs don't all collide") {
    val fps = TextAnalysis.fingerprint(docs).collect()
    assert(fps.length == docs.count())
    assert(fps.forall(_.getString(1).matches("[0-9a-f]{32}")))
    assert(fps.map(_.getString(1)).distinct.length > fps.length / 2)
  }

  test("frame sampling: slices cover the payload exactly, per-frame md5s present") {
    val frames = Multimodal.frameSample(spark, docs)
    val cover = frames.groupBy("doc_id").agg(sum("frame_len").as("total"), count(lit(1)).as("nf"))
      .join(docs.select(col("doc_id"), length(col("text")).as("want"),
        (lit(1) + col("doc_id") % 8).as("want_nf")), "doc_id")
    assert(cover.filter(col("total") =!= col("want") || col("nf") =!= col("want_nf")).count() == 0)
    assert(frames.filter(!col("frame_md5").rlike("^[0-9a-f]{32}$")).count() == 0)
  }

  test("byte histogram: 16 normalized bins summing to ~1") {
    val h = Multimodal.byteHistogram(spark, Multimodal.asBlobs(docs)).collect()
    assert(h.length == docs.count())
    h.foreach { r =>
      val bins = r.getSeq[Double](1)
      assert(bins.length == 16)
      assert(math.abs(bins.sum - 1.0) < 0.01)
    }
  }

  test("multimodal metadata: fingerprint matches md5 of payload, schema typed") {
    val meta = Multimodal.mediaMeta(spark, docs)
    assert(meta.columns.toSeq ==
      Seq("doc_id", "media_type", "n_bytes", "fingerprint", "width", "height", "n_frames"))
    val joined = meta.join(docs.select(col("doc_id"), md5(col("text")).as("want")), "doc_id")
      .filter(col("fingerprint") =!= col("want")).count()
    assert(joined == 0)
    assert(meta.select("media_type").distinct().count() == 3)
  }

  test("pmi collocations: counts above floor, pmi descending, pairs really adjacent") {
    val rows = TextAnalysis.bigramPmi(docs).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.forall(_.getAs[Long]("n_ab") >= 5L))
    val pmis = rows.map(_.getAs[Double]("pmi"))
    assert(pmis.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    // the top pair occurs adjacently in some document
    val (w1, w2) = (rows.head.getString(0), rows.head.getString(1))
    assert(docs.filter(lower(col("text")).contains(s"$w1 $w2")).count() > 0)
  }

  test("zipf profile: ranks are a permutation and frequency is non-increasing") {
    val rows = TextAnalysis.zipfProfile(docs).collect()
      .sortBy(_.getAs[Long]("term_rank"))
    assert(rows.map(_.getAs[Long]("term_rank")).toSeq == (1L to rows.length).toSeq)
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    assert(ns.sum == operators.Bm25.tokenize(docs).count())
  }

  test("char trigrams: top-k per language, counts match a direct recount") {
    val rows = TextAnalysis.charTrigrams(docs).collect()
    val langs = rows.map(_.getString(0)).distinct
    langs.foreach { l =>
      val g = rows.filter(_.getString(0) == l)
      assert(g.length <= 10)
      assert(g.map(_.getAs[Long]("rk")).sorted.toSeq == (1L to g.length).toSeq)
    }
    // recount the global top trigram of the first language directly
    val top = rows.filter(r => r.getAs[Long]("rk") == 1L).head
    val direct = docs.filter(col("lang") === top.getString(0))
      .select(lower(col("text")).as("t")).collect()
      .map(r => { val t = r.getString(0)
        (0 to t.length - 3).count(i => t.substring(i, i + 3) == top.getString(1)) }).sum
    assert(direct == top.getAs[Long]("n"))
  }

  test("dictionary segmentation round-trips de-spaced docs at high rate") {
    val rows = TextAnalysis.segmentRoundTrip(docs).collect()
    assert(rows.length == docs.count())
    val exact = rows.count(_.getBoolean(3))
    // greedy longest-match may mis-split ambiguous concatenations, but
    // the corpus vocabulary should round-trip the vast majority
    assert(exact.toDouble / rows.length >= 0.9,
      s"only $exact/${rows.length} docs round-tripped")
    // exact round trips recover the token count too
    rows.filter(_.getBoolean(3)).foreach(r => assert(r.getLong(1) == r.getLong(2)))
  }

  test("gopher repetition: hand-built docs score exactly, corpus covered") {
    import spark.implicits._
    // 'a b a b a b': 2-grams = [a b, b a, a b, b a, a b] -> top 'a b'
    // cnt 3, glen 2 -> cov 6; tc = 11 - 5 = 6 -> top2 = 1.0
    // 5-grams: [a b a b a, b a b a b] each cnt 1 -> dup5 = 0
    val df = Seq(
      (1L, "a b a b a b"),
      (2L, "unique words only here today friend"),
      (3L, "x y z w v x y z w v")).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRepetition(df).collect()
      .map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(out(1L)._1 == 1.0 && !out(1L)._4)
    // doc 3: tc=10; top 2-gram 'x y' cnt 2 glen 2 -> 0.4; top 3-gram
    // 'x y z' cnt 2 glen 3 -> 0.6; dup 5-grams: 'x y z w v' cnt 2
    // glen 5 -> 1.0
    assert(out(3L) == ((0.4, 0.6, 1.0, false)))
    // doc 2 has no repeated grams: dup5 = 0, and top2 is the longest
    // count-1 pair ('unique words' = 11 chars over tc 30) — short docs
    // fail the top-gram thresholds by construction
    assert(out(2L)._1 == 0.3667 && out(2L)._3 == 0.0 && !out(2L)._4)
    val corpus = TextAnalysis.gopherRepetition(docs)
    assert(corpus.count() == docs.count())
    assert(corpus.filter(col("top2_frac") > 0).count() > 0)
  }

  test("stemmed vocab folds terms without losing token mass") {
    val vocab = TextAnalysis.stemmedVocab(docs).collect()
    val tokens = operators.Bm25.tokenize(docs).count()
    assert(vocab.map(_.getAs[Long]("n_total")).sum == tokens,
      "stemming must preserve total token count")
    assert(vocab.map(_.getAs[Long]("n_terms")).sum ==
      operators.Bm25.tokenize(docs).select("term").distinct().count())
  }

  test("source cap keeps the longest docs per domain, bounded by WindowGroupLimit") {
    val cap = 3
    val out = TextAnalysis.sourceCap(docs, cap).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // <= cap rows per source, rk dense from 1
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.length <= cap)
      assert(rows.map(_._4).sorted.sameElements(1L to rows.length.toLong))
    }
    // the kept docs ARE each source's top-cap by (n_chars desc, doc_id asc)
    val want = docs.select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._2).values.flatMap(
        _.sortBy(t => (-t._3, t._1)).take(cap)).map(_._1).toSet
    assert(out.map(_._1).toSet == want)
    // plan: the per-group limit runs BEFORE the full sort materializes
    val plan = TextAnalysis.sourceCap(docs, cap)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"per-source cap not bounded by WindowGroupLimit:\n$plan")
  }

  test("shuffle order: stable hash-derived shards with dense in-shard positions") {
    val n = docs.count()
    val a = TextAnalysis.shuffleOrder(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.length == n)
    assert(a.forall(t => t._2 >= 0 && t._2 < 8))
    // every shard's positions are dense 1..size (a total order per shard)
    a.groupBy(_._2).values.foreach { rows =>
      assert(rows.map(_._3).sorted.sameElements(1L to rows.length.toLong))
    }
    // reproducible: a second run derives the identical order
    val b = TextAnalysis.shuffleOrder(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.sortBy(_._1).sameElements(b.sortBy(_._1)))
    // growth stability: docs keep their shard when the corpus grows
    val half = TextAnalysis.shuffleOrder(docs.filter(col("doc_id") % 2 === 0))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = a.map(t => t._1 -> t._2).toMap
    assert(half.forall { case (id, s) => full(id) == s })
  }
}
