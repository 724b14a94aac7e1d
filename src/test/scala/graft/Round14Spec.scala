package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bm25, Bm25Index, DedupStore, SearchExtras, SemanticStore, Sketches}
import graft.sources.Tables

/** Round-14: the DELETE leg on the pair substrates (tombstone +
  * re-elect — the maintenance QUAD completing on [[DedupStore]] /
  * [[SemanticStore]]), staged-index MaxScore, and the KMV pair-matrix
  * source bound. The delete contract under test everywhere: the LIVE
  * view after any delete sequence equals a REBUILD on the surviving
  * corpus, relation-for-relation — re-election is a rename because
  * exact copies are interchangeable. */
class Round14Spec extends AnyFunSuite {
  import SparkTestSession._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/s"

  /** Planted corpus: a 3-copy group (rep 1), a 2-copy group (rep 4),
    * a shingleable near-dup satellite of group A (id 6), a singleton
    * (8) and a short non-shingleable 2-copy group (9, 10). */
  private def plantedDocs = {
    import spark.implicits._
    val blobA = (1 to 12).map(i => s"alpha$i").mkString(" ")
    val blobB = (1 to 12).map(i => s"beta$i").mkString(" ")
    Seq(
      (1L, blobA), (2L, blobA), (3L, blobA),
      (4L, blobB), (5L, blobB),
      (6L, blobA + " alphaX"),
      (8L, "standalone words in this document"),
      (9L, "x y"), (10L, "x y"))
      .toDF("doc_id", "text")
  }

  private def pairSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  /** verifiedNearDups of a fresh store built on `docs` — the
    * corpus-minus-slice replay every delete result must equal. */
  private def rebuiltPairs(docs: DataFrame): Set[(Long, Long, Double)] = {
    val p = tmp("r14rb")
    DedupStore.build(docs, p)
    pairSet(DedupStore.verifiedNearDups(spark, p))
  }

  // ---- DedupStore.delete ----

  test("dedup delete: rep death re-elects min survivor; serving equals rebuild") {
    val p = tmp("r14a")
    DedupStore.build(plantedDocs, p)
    // 1 is group A's rep AND half of the verified pair with 6
    DedupStore.delete(plantedDocs.filter(col("doc_id") === 1).select("doc_id"), p, "d1")
    assert(pairSet(DedupStore.verifiedNearDups(spark, p)) ===
      rebuiltPairs(plantedDocs.filter(col("doc_id") =!= 1)))
    // the re-elected rep is materialized in the live reps relation
    val reps = DedupStore.reps(spark, p).select("rep").collect().map(_.getLong(0)).toSet
    assert(reps.contains(2L) && !reps.contains(1L), s"expected rep 1 re-keyed to 2, got $reps")
  }

  test("dedup delete: whole-group death drops every relation row; chain re-elects twice") {
    val p = tmp("r14b")
    DedupStore.build(plantedDocs, p)
    DedupStore.delete(plantedDocs.filter(col("doc_id").isin(4, 5)).select("doc_id"), p, "d1")
    assert(pairSet(DedupStore.verifiedNearDups(spark, p)) ===
      rebuiltPairs(plantedDocs.filter(!col("doc_id").isin(4, 5))))
    // chain: delete rep 1 (re-elect 2), then rep 2 (re-elect 3) — the
    // resolved rekey map must compose 1 -> 3
    DedupStore.delete(plantedDocs.filter(col("doc_id") === 1).select("doc_id"), p, "d2")
    DedupStore.delete(plantedDocs.filter(col("doc_id") === 2).select("doc_id"), p, "d3")
    val survivors = plantedDocs.filter(!col("doc_id").isin(1, 2, 4, 5))
    assert(pairSet(DedupStore.verifiedNearDups(spark, p)) === rebuiltPairs(survivors))
    val mem = DedupStore.members(spark, p).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mem(3L) === 3L && mem(6L) === 6L, s"chain rekey broken: $mem")
  }

  test("dedup delete: replayed tag is a no-op; non-live ids fail loudly") {
    val p = tmp("r14c")
    DedupStore.build(plantedDocs, p)
    DedupStore.delete(plantedDocs.filter(col("doc_id") === 9).select("doc_id"), p, "d1")
    val before = pairSet(DedupStore.verifiedNearDups(spark, p))
    DedupStore.delete(plantedDocs.filter(col("doc_id") === 9).select("doc_id"), p, "d1")
    assert(pairSet(DedupStore.verifiedNearDups(spark, p)) === before)
    // absent id
    import spark.implicits._
    intercept[IllegalArgumentException] {
      DedupStore.delete(Seq(999L).toDF("doc_id"), p, "d2")
    }
    // already-deleted id under a NEW tag
    intercept[IllegalArgumentException] {
      DedupStore.delete(Seq(9L).toDF("doc_id"), p, "d3")
    }
  }

  test("dedup delete: monotone + reserved-id contracts survive a delete") {
    import spark.implicits._
    val p = tmp("r14d")
    DedupStore.build(plantedDocs, p)
    DedupStore.delete(plantedDocs.filter(col("doc_id").isin(4, 5)).select("doc_id"), p, "d1")
    // a tombstoned id stays USED until compaction purges it
    intercept[IllegalArgumentException] {
      DedupStore.update(Seq((4L, "anything")).toDF("doc_id", "text"), p, "u1")
    }
    // ingest below the stored max stays refused
    intercept[IllegalArgumentException] {
      DedupStore.update(Seq((7L, "anything")).toDF("doc_id", "text"), p, "u2")
    }
    // re-ingesting a fully-deleted group's TEXT under a fresh id forms
    // a fresh rep (the dead group matches nothing)
    val blobB = (1 to 12).map(i => s"beta$i").mkString(" ")
    DedupStore.update(Seq((11L, blobB)).toDF("doc_id", "text"), p, "u3")
    val expected = rebuiltPairs(
      plantedDocs.filter(!col("doc_id").isin(4, 5))
        .unionByName(Seq((11L, blobB)).toDF("doc_id", "text")))
    assert(pairSet(DedupStore.verifiedNearDups(spark, p)) === expected)
    val mem = DedupStore.members(spark, p).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mem(11L) === 11L, s"re-ingested text should be a fresh rep, got $mem")
  }

  test("dedup delete: compaction purges tombstones and serves identically") {
    val p = tmp("r14e")
    DedupStore.build(plantedDocs, p)
    DedupStore.delete(plantedDocs.filter(col("doc_id").isin(1, 4, 5)).select("doc_id"), p, "d1")
    val before = pairSet(DedupStore.verifiedNearDups(spark, p))
    DedupStore.compactDeltas(spark, p)
    assert(pairSet(DedupStore.verifiedNearDups(spark, p)) === before)
    // physically purged: no tombstone relation left anywhere
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    val leftovers = fs.listStatus(new org.apache.hadoop.fs.Path(p))
      .filter(s => fs.exists(new org.apache.hadoop.fs.Path(s.getPath, "tombstones")))
    assert(leftovers.isEmpty, s"tombstones survived compaction: ${leftovers.mkString(",")}")
    // replayed delete tag stays a no-op THROUGH the compaction
    DedupStore.delete(plantedDocs.filter(col("doc_id").isin(1, 4, 5)).select("doc_id"), p, "d1")
    assert(pairSet(DedupStore.verifiedNearDups(spark, p)) === before)
  }

  test("dedup delete: gate corpus %10==7 slice equals corpus-minus-slice rebuild") {
    val docs = Tables.documents(spark, sf)
    val p = tmp("r14f")
    DedupStore.build(docs, p)
    DedupStore.delete(docs.filter(col("doc_id") % 10 === 7).select("doc_id"), p, "d1")
    assert(pairSet(DedupStore.verifiedNearDups(spark, p)) ===
      rebuiltPairs(docs.filter(col("doc_id") % 10 =!= 7)))
  }

  // ---- SemanticStore.delete ----

  private def plantedVecs = {
    import spark.implicits._
    val a = Array(1.0f, 0.0f, 0.2f)
    val c = Array(0.9f, 0.1f, 0.2f) // cos(a, c) ~ 0.97 >= 0.45
    val z = Array(0.0f, 1.0f, 0.0f) // cos(a, z) ~ 0.2 < 0.45
    Seq((1L, a), (2L, a), (3L, a), (4L, c), (5L, z), (6L, z))
      .toDF("vec_id", "embedding")
  }

  private def vecPairSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def rebuiltVecPairs(emb: DataFrame): Set[(Long, Long, Double)] = {
    val p = tmp("r14vr")
    SemanticStore.build(emb, p)
    vecPairSet(SemanticStore.cosinePairs(spark, p))
  }

  test("semantic delete: rep death re-elects; whole-group death drops; equals rebuild") {
    val p = tmp("r14g")
    SemanticStore.build(plantedVecs, p)
    // vec 1 is the value-group rep AND in cross pairs with 4
    SemanticStore.delete(plantedVecs.filter(col("vec_id") === 1).select("vec_id"), p, "d1")
    assert(vecPairSet(SemanticStore.cosinePairs(spark, p)) ===
      rebuiltVecPairs(plantedVecs.filter(col("vec_id") =!= 1)))
    // now kill the whole z group
    SemanticStore.delete(plantedVecs.filter(col("vec_id").isin(5, 6)).select("vec_id"), p, "d2")
    assert(vecPairSet(SemanticStore.cosinePairs(spark, p)) ===
      rebuiltVecPairs(plantedVecs.filter(!col("vec_id").isin(1, 5, 6))))
  }

  test("semantic delete: replay no-op, liveness, compaction purge") {
    import spark.implicits._
    val p = tmp("r14h")
    SemanticStore.build(plantedVecs, p)
    SemanticStore.delete(plantedVecs.filter(col("vec_id") === 2).select("vec_id"), p, "d1")
    val before = vecPairSet(SemanticStore.cosinePairs(spark, p))
    SemanticStore.delete(plantedVecs.filter(col("vec_id") === 2).select("vec_id"), p, "d1")
    assert(vecPairSet(SemanticStore.cosinePairs(spark, p)) === before)
    intercept[IllegalArgumentException] {
      SemanticStore.delete(Seq(2L).toDF("vec_id"), p, "d2") // already dead
    }
    SemanticStore.compactDeltas(spark, p)
    assert(vecPairSet(SemanticStore.cosinePairs(spark, p)) === before)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    val leftovers = fs.listStatus(new org.apache.hadoop.fs.Path(p))
      .filter(s => fs.exists(new org.apache.hadoop.fs.Path(s.getPath, "tombstones")))
    assert(leftovers.isEmpty, "tombstones survived compaction")
  }

  test("semantic delete: gate corpus %8==1 stored slice equals filtered rebuild") {
    val emb = Tables.embeddings(spark, sf)
    val p = tmp("r14i")
    SemanticStore.build(emb, p)
    SemanticStore.delete(
      SemanticStore.members(spark, p).filter(col("vec_id") % 8 === 1).select("vec_id"),
      p, "d1")
    assert(vecPairSet(SemanticStore.cosinePairs(spark, p)) ===
      rebuiltVecPairs(emb.filter(col("vec_id") % 8 =!= 1)))
  }

  // ---- staged-index MaxScore ----

  test("index maxscore: rows equal the corpus route and the staged linear route") {
    val docs = Tables.documents(spark, sf)
    val p = tmp("r14j")
    Bm25Index.build(docs, p)
    val staged = Bm25Index.maxScoreTopN(spark, p).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val corpus = SearchExtras.maxScoreTopN(docs).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val linear = Bm25Index.searchTopN(spark, p).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(staged === corpus)
    assert(staged === linear)
  }

  test("index maxscore: plan reads postings, never the corpus") {
    val p = tmp("r14k")
    Bm25Index.build(Tables.documents(spark, sf), p)
    val plan = Bm25Index.maxScoreTopN(spark, p).queryExecution.executedPlan.toString
    assert(!plan.contains("documents"), s"staged MaxScore scanned the corpus:\n$plan")
    assert(plan.linesIterator.exists(l => l.contains("FileScan") && l.contains("postings")),
      "staged MaxScore should scan the postings relation")
    // the term prune reaches the postings scan as a pushed filter
    assert(plan.contains("term"), "postings scan not term-pruned")
  }

  test("index maxscore: tombstone-aware (serves corpus-minus-slice after delete)") {
    val docs = Tables.documents(spark, sf)
    val p = tmp("r14l")
    Bm25Index.build(docs, p)
    Bm25Index.delete(docs.filter(col("doc_id") % 10 === 3).select("doc_id"), p, "d1")
    val staged = Bm25Index.maxScoreTopN(spark, p).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val expected = SearchExtras.maxScoreTopN(docs.filter(col("doc_id") % 10 =!= 3)).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(staged === expected)
  }

  // ---- KMV pair-matrix bound ----

  test("kmv pair matrix: capped to the top-maxSources heaviest sources") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s1", "one two three four five six"),
      (2L, "s1", "one two three four five seven"),
      (3L, "s1", "eight nine ten eleven twelve"),
      (4L, "s2", "one two three four five six"),
      (5L, "s2", "thirteen fourteen fifteen sixteen"),
      (6L, "s3", "one two three four five six"))
      .toDF("doc_id", "source", "text")
    // sketch-heaviness rank (exact distinct shingles while unfilled):
    // s1 (8 distinct) > s2 (6) > s3 (4) — top-2 keeps s1, s2
    val capped = Sketches.kmvJaccard(docs, maxSources = 2)
      .select("src_a", "src_b").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(capped === Set(("s1", "s2")), s"expected only the top-2 pair, got $capped")
    val cappedU = Sketches.kmvUnion(docs, maxSources = 2)
      .select("src_a", "src_b").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(cappedU === Set(("s1", "s2")))
    // under the cap the matrix is complete and values match the uncapped run
    val full = Sketches.kmvJaccard(docs).collect().map(_.toSeq).toSet
    val fullAgain = Sketches.kmvJaccard(docs, maxSources = 1000).collect().map(_.toSeq).toSet
    assert(full === fullAgain)
    assert(full.size === 3, "3 sources under the cap -> all 3 pairs")
    intercept[IllegalArgumentException] { Sketches.kmvJaccard(docs, maxSources = 1) }
  }
}
