package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Ann, Graph}
import graft.sources.Tables

/** Round-14 batch 2: the SQ8 scalar-quantization rung (int8 cosine
  * serve + distortion dashboard), semantic (embedding-space) eval-set
  * decontamination, and bipartite HITS. */
class Round14bSpec extends AnyFunSuite {
  import SparkTestSession._

  lazy val emb = Tables.embeddings(spark, sf)

  // ---- SQ8 ----

  test("sqVecs: every coordinate clamps into [-127, 127] and qn2 is the exact square sum") {
    val bad = Ann.sqVecs(emb)
      .withColumn("mx", expr("array_max(transform(qv, x -> abs(x)))"))
      .withColumn("n2", expr("aggregate(qv, CAST(0 AS BIGINT), (a, x) -> a + x * x)"))
      .filter(col("mx") > 127L || col("n2") =!= col("qn2"))
    assert(bad.count() === 0L)
  }

  test("sqTopK: k rows, int8 ranking stays near-exact (recall@10 >= 0.8 vs brute force)") {
    val sq = Ann.sqTopK(emb)
    assert(sq.count() === 10L)
    val hits = sq.select("vec_id")
      .join(Ann.bruteForceTopK(emb).select("vec_id"), "vec_id").count()
    assert(hits >= 8L, s"SQ8 recall@10 degraded: $hits/10 vs exact")
  }

  test("sqDistortion: one row, int8-vs-exact cosine error stays within budget") {
    val r = Ann.sqDistortion(emb).collect()
    assert(r.length === 1)
    val row = r(0)
    assert(row.getAs[Long]("n_vecs") > 0L)
    assert(row.getAs[Double]("avg_err") < 0.02,
      s"avg SQ8 cosine error ${row.getAs[Double]("avg_err")} exceeds 0.02")
    assert(row.getAs[Long]("max_err_1e5") < 10000L,
      s"max SQ8 cosine error ${row.getAs[Long]("max_err_1e5")} x 1e-5 exceeds 0.1")
  }

  test("sqRerank: exact rerank of the SQ candidate cut recovers the exact top-10") {
    // with candK = full pool the cascade IS brute force; with the
    // default 50-candidate cut on this corpus recall must hold too
    val full = Ann.sqRerank(emb, candK = 1000)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val brute = Ann.bruteForceTopK(emb)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(full === brute)
    val cascaded = Ann.sqRerank(emb)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert((cascaded & brute).size >= 8,
      s"SQ8 cascade lost the exact top-10: ${(cascaded & brute).size}/10")
  }

  test("sqRerank rejects candK < k") {
    val ex = intercept[IllegalArgumentException] { Ann.sqRerank(emb, k = 10, candK = 5) }
    assert(ex.getMessage.contains("candK"))
  }

  // ---- semantic contamination ----

  private def crossBrute(threshold: Double): Set[(Long, Long, Double)] = {
    // all-pairs corpus x probe cosine — the recall contract the LSH
    // candidate path must close exactly (the oracle's shape, in Spark)
    val pairs = Ann.cosinePairs(emb, threshold)
    val aSide = pairs.filter(col("vec_a") % 5 =!= 0 && col("vec_b") % 5 === 0)
      .select(col("vec_a").as("vec_id"), col("vec_b").as("probe_id"), col("cos"))
    val bSide = pairs.filter(col("vec_b") % 5 =!= 0 && col("vec_a") % 5 === 0)
      .select(col("vec_b").as("vec_id"), col("vec_a").as("probe_id"), col("cos"))
    aSide.unionByName(bSide).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  test("semanticContamination equals the all-pairs corpus x probe relation") {
    val got = Ann.semanticContamination(
        emb.filter(col("vec_id") % 5 =!= 0),
        emb.filter(col("vec_id") % 5 === 0)
          .select(col("vec_id").as("probe_id"), col("embedding")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === crossBrute(0.45))
  }

  test("semanticContamination rejects configs whose boundary-pair miss probability breaches the bound") {
    val probes = emb.filter(col("vec_id") % 5 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding"))
    // 2 tables x 8 bits at threshold 0.05: p_bit ~ 0.52, p_table ~
    // 0.005, miss ~ 0.99 — hopeless recall, must be rejected (the r15
    // guard gates the MISS PROBABILITY the exactness contract needs,
    // not the vacuous S-curve midpoint of r14)
    val ex = intercept[IllegalArgumentException] {
      Ann.semanticContamination(
        emb.filter(col("vec_id") % 5 =!= 0), probes,
        threshold = 0.05, numTables = 2, bitsPerTable = 8)
    }
    assert(ex.getMessage.contains("misses a threshold"))
    // the default config sits just inside the declared 1% bound; a
    // tighter bound rejects it loudly instead of over-promising
    val ex2 = intercept[IllegalArgumentException] {
      Ann.semanticContamination(
        emb.filter(col("vec_id") % 5 =!= 0), probes, maxMissProb = 0.001)
    }
    assert(ex2.getMessage.contains("misses a threshold"))
  }

  test("streaming semantic screen: union over micro-batches equals the batch screen") {
    val got = graft.streaming.Streams.semanticContaminationStream(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === crossBrute(0.45))
  }

  // ---- snapshot read on the text index ----

  test("scoreAt pins the build snapshot: equals a rebuild on the 4/5 corpus") {
    import graft.operators.Bm25Index
    val docs = Tables.documents(spark, sf)
    val p = java.nio.file.Files.createTempDirectory("r14basof").toString + "/s"
    Bm25Index.build(docs.filter(col("doc_id") % 5 =!= 0), p)
    Bm25Index.update(docs.filter(col("doc_id") % 5 === 0), p, "00001")
    val asof = Bm25Index.scoreAt(spark, p, "00000")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val rebuilt = java.nio.file.Files.createTempDirectory("r14brb").toString + "/s"
    Bm25Index.build(docs.filter(col("doc_id") % 5 =!= 0), rebuilt)
    val expect = Bm25Index.score(spark, rebuilt)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(asof === expect)
    // the LIVE read sees the ingested slice too (supersets the snapshot)
    val live = Bm25Index.score(spark, p)
      .collect().map(r => r.getLong(0)).toSet
    assert(asof.map(_._1).subsetOf(live))
    // pinning a non-version fails loudly (numeric-tag guard, ADVICE
    // r15: tags compare numerically now, so a non-numeric probe is
    // rejected before any lexicographic ordering could lie)
    val ex = intercept[IllegalArgumentException] { Bm25Index.scoreAt(spark, p, "//") }
    assert(ex.getMessage.contains("not a numeric tag"))
  }

  test("pair-substrate snapshot reads equal fresh builds on the pinned corpus") {
    import graft.operators.{DedupStore, SemanticStore}
    val docs = Tables.documents(spark, sf)
    val dcut = docs.agg(max(col("doc_id"))).collect()(0).getLong(0) * 3 / 4
    val dp = java.nio.file.Files.createTempDirectory("r14bda").toString + "/s"
    DedupStore.build(docs.filter(col("doc_id") <= dcut), dp)
    DedupStore.update(docs.filter(col("doc_id") > dcut), dp, "00001")
    val asof = DedupStore.verifiedNearDupsAt(spark, dp, "00000")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val rp = java.nio.file.Files.createTempDirectory("r14bdr").toString + "/s"
    DedupStore.build(docs.filter(col("doc_id") <= dcut), rp)
    val expect = DedupStore.verifiedNearDups(spark, rp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(asof === expect)
    // live view supersets the snapshot (pure ingest, no deletes)
    val live = DedupStore.verifiedNearDups(spark, dp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(asof.subsetOf(live))

    val scut = emb.agg(max(col("vec_id"))).collect()(0).getLong(0) * 3 / 4
    val sp = java.nio.file.Files.createTempDirectory("r14bsa").toString + "/s"
    SemanticStore.build(emb.filter(col("vec_id") <= scut), sp)
    SemanticStore.update(emb.filter(col("vec_id") > scut), sp, "00001")
    val sAsof = SemanticStore.cosinePairsAt(spark, sp, "00000")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val sExpect = Ann.cosinePairs(emb.filter(col("vec_id") <= scut))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(sAsof === sExpect)
    // pinning a non-version fails loudly (numeric-tag guard, ADVICE r15)
    val ex = intercept[IllegalArgumentException] {
      SemanticStore.cosinePairsAt(spark, sp, "//")
    }
    assert(ex.getMessage.contains("not a numeric tag"))
  }

  // ---- token-budget mixture planning ----

  test("tokenBudget: weights sum to ~1, planned tokens stay under budget, epochs = planned/actual") {
    val rows = graft.operators.TextAnalysis.tokenBudget(Tables.documents(spark, sf)).collect()
    assert(rows.nonEmpty)
    val wsum = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wsum - 1.0) < 1e-4, s"weights sum to $wsum")
    val planned = rows.map(_.getAs[Long]("planned_tokens")).sum
    assert(planned <= 2000000L && planned > 2000000L - rows.length,
      s"planned total $planned off the floor-per-source budget")
    rows.foreach { r =>
      val e = r.getAs[Long]("planned_tokens").toDouble / r.getAs[Long]("n_tokens")
      assert(math.abs(r.getAs[Double]("epochs") - e) < 1e-3)
    }
  }

  test("budgetSample: every sampled doc's source rate is honored; repetition sources keep all docs") {
    import graft.operators.TextAnalysis
    val docs = Tables.documents(spark, sf)
    val plan = TextAnalysis.tokenBudget(docs).collect()
      .map(r => r.getString(0) -> math.min(1.0, r.getAs[Double]("epochs"))).toMap
    val sampled = TextAnalysis.budgetSample(docs)
      .groupBy("source").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("source").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((src, rate) <- plan if rate >= 1.0)
      assert(sampled.getOrElse(src, 0L) === totals(src),
        s"repetition source $src must keep every doc")
    for ((src, n) <- sampled) assert(n <= totals(src))
  }

  test("contaminationReport: counts reconcile with the screens' flag sets") {
    import graft.operators.{Dedup, TextAnalysis}
    val d = Tables.documents(spark, sf)
    val exact = TextAnalysis.contamination(
        d.filter(col("doc_id") % 97 =!= 0),
        d.filter(col("doc_id") % 97 === 0)
          .select(col("doc_id").as("probe_id"), col("text")))
      .select("doc_id").distinct()
    val fuzzy = Dedup.fuzzyContamination(
        d.filter(col("doc_id") % 5 =!= 0),
        d.filter(col("doc_id") % 5 === 0)
          .select(col("doc_id").as("probe_id"), col("text")))
      .select("doc_id").distinct()
    val rep = TextAnalysis.contaminationReport(d, exact, fuzzy).collect()
    assert(rep.map(_.getAs[Long]("n_docs")).sum === d.count())
    assert(rep.map(_.getAs[Long]("n_exact")).sum === exact.count())
    assert(rep.map(_.getAs[Long]("n_fuzzy")).sum === fuzzy.count())
  }

  test("index compaction purges tombstones and replays as a no-op on both stores") {
    import graft.operators.{AnnIndex, Bm25Index}
    val docs = Tables.documents(spark, sf)
    val p = java.nio.file.Files.createTempDirectory("r14bcmp").toString + "/s"
    Bm25Index.build(docs, p)
    Bm25Index.delete(docs.filter(col("doc_id") % 10 === 6).select("doc_id"), p, "d1")
    Bm25Index.compactDeltas(spark, p)
    val served = Bm25Index.score(spark, p)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val rb = java.nio.file.Files.createTempDirectory("r14bcmp2").toString + "/s"
    Bm25Index.build(docs.filter(col("doc_id") % 10 =!= 6), rb)
    val expect = Bm25Index.score(spark, rb)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(served === expect)
    Bm25Index.compactDeltas(spark, p) // replayed compaction: no-op
    assert(Bm25Index.score(spark, p)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet === expect)

    val ap = java.nio.file.Files.createTempDirectory("r14bacmp").toString + "/s"
    AnnIndex.build(emb, ap)
    AnnIndex.delete(emb.filter(col("vec_id") % 9 === 2).select("vec_id"), ap, "d1")
    AnnIndex.compactDeltas(spark, ap)
    val got = AnnIndex.searchTopK(spark, ap, queryId = 1L)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val arb = java.nio.file.Files.createTempDirectory("r14bacmp2").toString + "/s"
    AnnIndex.build(emb.filter(col("vec_id") % 9 =!= 2), arb)
    assert(got === AnnIndex.searchTopK(spark, arb, queryId = 1L)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet)
  }

  // ---- plan-shape contracts for the new serves ----

  private def planString(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("scoreAt: the snapshot read touches ONLY the pinned delta's files") {
    import graft.operators.Bm25Index
    val docs = Tables.documents(spark, sf)
    val p = java.nio.file.Files.createTempDirectory("r14bplan").toString + "/s"
    Bm25Index.build(docs.filter(col("doc_id") % 5 =!= 0), p)
    Bm25Index.update(docs.filter(col("doc_id") % 5 === 0), p, "00001")
    val files = Bm25Index.scoreAt(spark, p, "00000").inputFiles
    assert(files.nonEmpty)
    assert(files.forall(_.contains("delta-00000")),
      s"snapshot read leaked past the pinned version: ${files.filterNot(_.contains("delta-00000")).take(3).mkString(", ")}")
  }

  test("semanticContamination: candidates come from equi-joins — no cartesian product in the plan") {
    val p = planString(Ann.semanticContamination(
      emb.filter(col("vec_id") % 5 =!= 0),
      emb.filter(col("vec_id") % 5 === 0)
        .select(col("vec_id").as("probe_id"), col("embedding"))))
    assert(!p.contains("CartesianProduct"), "corpus x probe cartesian product in the plan")
    assert(!p.contains("BroadcastNestedLoopJoin"), "non-equi join in the candidate path")
  }

  test("sqTopK: exactly 2 corpus scans (pool + broadcast query row)") {
    val p = planString(Ann.sqTopK(emb))
    val scans = p.linesIterator.count(l => l.contains("FileScan") && l.contains("embeddings"))
    assert(scans == 2, s"expected 2 embedding scans, plan has $scans")
  }

  test("budgetSample: the plan joins by broadcast — no sort-merge join") {
    val p = planString(graft.operators.TextAnalysis.budgetSample(Tables.documents(spark, sf)))
    assert(!p.contains("SortMergeJoin"),
      "sources-cardinality plan relation must broadcast into the corpus pass")
  }

  // ---- HITS ----

  test("hits: planted bipartite graph — shared supplier out-ranks the exclusive one") {
    import spark.implicits._
    // supplier 100 sells to every customer; 200 only to customer 1
    val edges = Seq(
      (1L, 100L), (2L, 100L), (3L, 100L), (4L, 100L), (5L, 100L),
      (1L, 200L)).toDF("c", "s")
    val r = Graph.hitsFrom(edges)
    val auth = r.filter(col("side") === "auth").collect()
      .map(x => x.getLong(1) -> x.getLong(2)).toMap
    val hub = r.filter(col("side") === "hub").collect()
      .map(x => x.getLong(1) -> x.getLong(2)).toMap
    assert(auth(100L) > auth(200L))
    // customer 1 spans both suppliers — at least the hub mass of a
    // single-supplier customer
    assert(hub(1L) >= hub(2L))
    assert(hub.keySet === Set(1L, 2L, 3L, 4L, 5L) && auth.keySet === Set(100L, 200L))
  }

  test("hits: renormalization keeps per-side totals on the TotalMass grid") {
    val li = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_suppkey").as("s"))
    val o = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_custkey").as("c"))
    val r = Graph.hitsFrom(li.join(o, col("l_orderkey") === col("o_orderkey")).select("c", "s"))
      .localCheckpoint()
    val tot = r.groupBy("side").agg(sum("score").as("t")).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    // floor divisions only lose mass within one divisor per node; the
    // renorm scalar floor can leave up to ~2x before the next round
    for ((side, t) <- tot) {
      assert(t > Graph.TotalMass / 2 && t < 3 * Graph.TotalMass,
        s"$side total $t is off the ~TotalMass grid")
    }
    assert(r.filter(col("score") < 0L).count() === 0L)
  }
}
