package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DedupStore, Relational, TextAnalysis}
import graft.sources.Tables

/** Round-10 operator batch: skyline, exact weighted percentiles,
  * engagement metrics, winnowing, CCNet buckets, quality calibration,
  * and the staged dedup threshold curve. Properties here are the
  * algorithmic guarantees the oracles can't see (dominance, density,
  * monotonicity); value parity is the DuckDB crosscheck's job. */
class Round10OpsSpec extends AnyFunSuite {
  import SparkTestSession._

  lazy val docs = Tables.documents(spark, sf)
  lazy val events = Tables.events(spark, sf)

  test("skyline members are mutually non-dominated and dominate everything else") {
    val part = Tables.part(spark, sf)
    val sky = Relational.skyline(part).collect()
      .map(r => (r.getDouble(1), r.getInt(2)))
    assert(sky.nonEmpty)
    for (a <- sky; b <- sky if a != b)
      assert(!(b._1 <= a._1 && b._2 >= a._2 && (b._1 < a._1 || b._2 > a._2)),
        s"$b dominates skyline member $a")
    // every non-member is dominated by some member
    val all = part.select("p_retailprice", "p_size").collect()
      .map(r => (r.getDouble(0), r.getInt(1)))
    val skySet = sky.toSet
    for (p <- all if !skySet.contains(p))
      assert(sky.exists(s => s._1 <= p._1 && s._2 >= p._2 && (s._1 < p._1 || s._2 > p._2)),
        s"non-member $p is undominated")
  }

  test("weighted percentiles are ordered and sit inside the value range") {
    val li = Tables.lineitem(spark, sf)
    val rows = Relational.weightedPercentiles(li).collect()
    assert(rows.length === li.select("l_returnflag").distinct().count())
    val (lo, hi) = {
      val r = li.agg(min(floor(col("l_extendedprice") * 1e6).cast("long")),
        max(floor(col("l_extendedprice") * 1e6).cast("long"))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    rows.foreach { r =>
      val (p25, p50, p75) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(p25 <= p50 && p50 <= p75, s"percentiles out of order: $r")
      assert(p25 >= lo && p75 <= hi, s"percentile outside value range: $r")
    }
  }

  test("stickiness is a ratio in (0, 1]; audience overlap jaccard in (0, 1]") {
    Relational.stickiness(events).collect().foreach { r =>
      val s = r.getDouble(4)
      assert(s > 0 && s <= 1.0 + 1e-9, s"stickiness out of range: $r")
    }
    val ov = Relational.audienceOverlap(events).collect()
    assert(ov.nonEmpty)
    ov.foreach { r =>
      val j = r.getDouble(5)
      assert(j > 0 && j <= 1.0 + 1e-9, s"jaccard out of range: $r")
      assert(r.getLong(2) <= math.min(r.getLong(3), r.getLong(4)),
        s"intersection exceeds a set size: $r")
    }
  }

  test("winnowing guarantees a fingerprint in every w-window (density)") {
    val w = 4
    val sel = TextAnalysis.winnowing(docs, 3, w)
      .groupBy("doc_id").agg(sort_array(collect_set("pos")).as("ps"),
        count(lit(1)).as("n"))
      .collect()
    assert(sel.nonEmpty)
    sel.foreach { r =>
      val ps = r.getSeq[Long](1)
      // consecutive selected positions can be at most w apart: a gap
      // of more than w would leave some window with no selection
      ps.sliding(2).foreach {
        case Seq(a, b) => assert(b - a <= w, s"doc ${r.getLong(0)}: gap $a -> $b exceeds $w")
        case _ =>
      }
    }
  }

  test("ccnet buckets cover every scored doc and cuts split ~evenly per lang") {
    val b = TextAnalysis.ccnetBuckets(docs)
    val total = TextAnalysis.docPerplexity(docs).count()
    assert(b.count() === total)
    val dist = b.groupBy("lang", "bucket").count().collect()
      .groupBy(_.getString(0))
    dist.foreach { case (lang, rs) =>
      val byBucket = rs.map(r => r.getString(1) -> r.getLong(2)).toMap
      val n = byBucket.values.sum
      // each tertile holds at least a fifth (ties can skew the exact
      // thirds, but a missing or degenerate bucket is a bug)
      Seq("head", "middle", "tail").foreach { k =>
        assert(byBucket.getOrElse(k, 0L) >= n / 5,
          s"$lang/$k degenerate: $byBucket")
      }
    }
  }

  test("quality calibration partitions the corpus; rates bounded") {
    val c = TextAnalysis.qualityCalibration(docs).collect()
    assert(c.map(_.getLong(1)).sum === docs.count())
    c.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), s"n_dup > n_docs: $r")
      assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1)
    }
  }

  test("combsum/combmnz are bounded and mnz = sum x lists-present") {
    val emb = Tables.embeddings(spark, sf)
    val rows = graft.operators.Hybrid.combSearch(docs, emb).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      val (cs, mnz) = (r.getDouble(1), r.getDouble(2))
      assert(cs >= 0 && cs <= 2.0 + 1e-9, s"combsum out of [0,2]: $r")
      // both fields round at 6dp independently — allow that slack
      assert(mnz >= cs - 3e-6 && mnz <= 2 * cs + 3e-6, s"mnz inconsistent: $r")
    }
  }

  test("lm-jm scores the same docs as lm-dirichlet (shared match set)") {
    import graft.operators.SearchExtras
    val jm = SearchExtras.lmJmScore(docs).select("doc_id").collect().map(_.getLong(0)).toSet
    val dir = SearchExtras.lmDirichletScore(docs).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(jm === dir, "JM and Dirichlet must score exactly the matched-doc set")
    assert(jm.nonEmpty)
  }

  test("basket pairs: co-occurrence bounded by either support") {
    val rows = Relational.basketPairs(Tables.lineitem(spark, sf)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= math.min(r.getLong(3), r.getLong(4)), s"n_ab > support: $r")
      assert(r.getDouble(5) > 0)
    }
  }

  test("gini is in [0, 1)") {
    val r = Relational.gini(Tables.orders(spark, sf)).collect()(0)
    val g = r.getDouble(2)
    assert(g >= 0 && g < 1, s"gini out of range: $g")
  }

  test("emb drift: one row per label, cosine bounded, self-consistent sizes") {
    val emb = Tables.embeddings(spark, sf)
    val rows = graft.operators.Vectors.embDrift(emb).collect()
    assert(rows.length === emb.select("label").distinct().count())
    val total = emb.count()
    assert(rows.map(_.getLong(1)).sum === total)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9, s"cos out of range: $r")
      assert(r.getDouble(3) >= 0)
    }
  }

  test("cross-source matrix accounts for every verified pair") {
    val store = {
      val p = java.nio.file.Files.createTempDirectory("xsrcstore").toString + "/store"
      DedupStore.build(docs, p)
      p
    }
    val m = DedupStore.crossSourceMatrix(docs, store).collect()
    assert(m.map(_.getLong(2)).sum ===
      DedupStore.verifiedNearDups(spark, store).count())
  }

  test("adamic-adar on a planted graph: chain wedge outranks star wedge") {
    import spark.implicits._
    // chain 1-2-3 (shared neighbor 2 has degree 2) plus star 10-{11,12,13}
    // (shared neighbor 10 has degree 3): chain prediction (1,3) scores
    // 1/ln2 > any star pair's 1/ln3
    val cands = Seq((1L, 2L), (2L, 3L), (10L, 11L), (10L, 12L), (10L, 13L))
      .toDF("doc_a", "doc_b")
    val out = graft.operators.Graph.adamicAdarFromCandidates(cands).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2), r.getDouble(3)))
    assert(out.length === 4, s"expected 4 predictions, got ${out.mkString(",")}")
    assert(out.head._1 === ((1L, 3L)), s"chain pair must rank first: ${out.head}")
    assert(math.abs(out.head._3 - 1.0 / math.log(2)) < 1e-6)
    out.tail.foreach { case (pair, nc, aa) =>
      assert(nc === 1L && math.abs(aa - 1.0 / math.log(3)) < 1e-6,
        s"star pair $pair wrong: $aa")
    }
  }

  test("degree distribution accounts for every document") {
    val store = {
      val p = java.nio.file.Files.createTempDirectory("degstore").toString + "/store"
      DedupStore.build(docs, p)
      p
    }
    val dd = graft.operators.Graph.degreeDistribution(
      DedupStore.verifiedNearDups(spark, store), docs).collect()
    assert(dd.map(_.getLong(1)).sum === docs.count())
    dd.foreach(r => assert(r.getLong(0) >= 0 && r.getLong(1) > 0))
  }

  test("run correlation is a valid spearman over a nonempty overlap") {
    val r = graft.operators.Hybrid.runCorrelation(docs, Tables.embeddings(spark, sf))
      .collect()(0)
    assert(r.getLong(0) > 0, "runs must overlap")
    if (!r.isNullAt(1))
      assert(r.getDouble(1) >= -1.0 - 1e-9 && r.getDouble(1) <= 1.0 + 1e-9)
  }

  test("frame near-dup: planted identical assets pair at jaccard 1.0") {
    import spark.implicits._
    // ids congruent mod 8 slice into the same frame grid; identical
    // payloads then share every frame
    val planted = Seq(
      (8L, "aaaa bbbb cccc dddd eeee ffff gggg hhhh"),
      (16L, "aaaa bbbb cccc dddd eeee ffff gggg hhhh"),
      (3L, "totally different payload content here xyz")
    ).toDF("doc_id", "text")
    val out = graft.operators.Multimodal.frameNearDups(spark, planted).collect()
    assert(out.length === 1)
    assert(out(0).getLong(0) === 8L && out(0).getLong(1) === 16L)
    assert(out(0).getDouble(3) === 1.0)
  }

  test("streaming contamination gate == batch screen row-for-row") {
    import graft.operators.TextAnalysis
    val stream = graft.streaming.Streams.contaminationStream(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val batch = TextAnalysis.contamination(
        docs.filter(org.apache.spark.sql.functions.col("doc_id") % 97 =!= 0),
        docs.filter(org.apache.spark.sql.functions.col("doc_id") % 97 === 0)
          .select(org.apache.spark.sql.functions.col("doc_id").as("probe_id"),
            org.apache.spark.sql.functions.col("text")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(stream.nonEmpty)
    assert(stream === batch, s"stream (${stream.size}) != batch (${batch.size})")
  }

  test("threshold curve is monotone and agrees with the fixed-threshold serves") {
    val store = {
      val p = java.nio.file.Files.createTempDirectory("curvestore").toString + "/store"
      DedupStore.build(docs, p)
      p
    }
    val curve = DedupStore.thresholdCurve(spark, store).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(curve.map(_._1).toSeq ==
      Seq(0.7, 0.75, 0.8, 0.85, 0.9, 0.95))
    curve.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._2 >= b._2 && a._3 >= b._3 && a._4 >= b._4,
          s"curve not monotone: $a -> $b")
      case _ =>
    }
    // the 0.8 row's expanded volume must equal the full verified serve
    val at08 = curve.find(_._1 == 0.8).get
    assert(at08._4 === DedupStore.verifiedNearDups(spark, store, 0.8).count(),
      "expanded pair volume at 0.8 != verifiedNearDups")
  }
}
