package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bm25, Bm25Index}

/** Round-15: block-max MaxScore on the staged postings — the θ cut
  * prunes doc_id-range BLOCKS (I/O), not just the doclen join width.
  * Contracts under test: (1) admissible prune — rows equal the
  * corpus-derived exact top-k; (2) the block gate is a LITERAL
  * doc_id-range predicate pushed into the postings scan; (3) the
  * delete leg's `deaddf` sidecar keeps the sidecar-reconstructed df
  * exact, so serving equals a rebuild on the surviving corpus;
  * (4) compaction regenerates the `blockmax` sidecar from live rows;
  * (5) a store without sidecar coverage fails loudly. */
class Round15Spec extends AnyFunSuite {
  import SparkTestSession._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/s"

  /** Planted corpus spanning 4 blocks (width 1024): ids 0-11 (block 0)
    * are short, query-term-dense docs — the true top-k lives here and
    * seeds a high θ; ids 1030/2050/3080 hold ONE weak query term in a
    * long filler doc, one per later block, so blocks 1-3 carry a tiny
    * per-block bound sum and must be pruned by the θ cut. */
  private def plantedDocs = {
    import spark.implicits._
    val filler = (1 to 40).map(i => s"filler$i word$i").mkString(" ")
    val strong = (0 to 11).map { i =>
      (i.toLong,
        "spark spark spark spark query query query join join fast fast" +
          s" extra$i")
    }
    val weak = Seq(1030L, 2050L, 3080L).map(id => (id, s"fast $filler"))
    (strong ++ weak).toDF("doc_id", "text")
  }

  private def rows(df: DataFrame): Seq[(Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("blockmax: rows equal the exact corpus top-k; block ranges reach the scan as pushed literals") {
    val p = tmp("r15a")
    Bm25Index.build(plantedDocs, p)
    val served = Bm25Index.blockMaxTopN(spark, p)
    assert(rows(served) === rows(Bm25.searchTopN(plantedDocs)))
    // the survivor gate is a doc_id range literal ON the scan: block 0
    // survives (its range end 1024 appears as a pushed bound) and the
    // weak blocks 1-3 are pruned BEFORE any posting row is read (no
    // pushed bound reaches their ranges)
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("LessThan(doc_id,1024)"),
      s"expected the block-0 range pushed into the postings scan; plan:\n$plan")
    assert(!plan.contains("LessThan(doc_id,4096)") &&
      !plan.contains("GreaterThanOrEqual(doc_id,3072)"),
      "weak block 3 should be pruned from the scan predicate")
  }

  test("blockmax sidecar holds sound per-block bounds and exact row counts") {
    val p = tmp("r15b")
    Bm25Index.build(plantedDocs, p)
    val bm = spark.read.parquet(s"$p/delta-00000/blockmax")
    // exact physical df per term: 12 strong docs for 'spark', 12+3 for 'fast'
    val byTerm = bm.groupBy("term").agg(sum("n_rows").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byTerm("spark") === 12L && byTerm("fast") === 15L)
    // block 0's 'spark' bound carries max_tf=4 and the block-min doclen
    val b0 = bm.filter(col("term") === "spark" && col("block_id") === 0).head
    assert(b0.getAs[Long]("max_tf") === 4L)
  }

  test("blockmax combines across UPDATE deltas: sums/maxes/mins merge exactly; serving stays equal") {
    import spark.implicits._
    val p = tmp("r15u")
    // split the planted corpus id-monotonically (the store's ingest
    // contract): block-0 strong docs arrive in two batches, so the
    // (term, block) bounds must COMBINE (n_rows sums, max_tf maxes,
    // min_dl mins) across deltas for df and the gate to stay exact
    Bm25Index.build(plantedDocs.filter(col("doc_id") < 8), p)
    Bm25Index.update(plantedDocs.filter(col("doc_id") >= 8), p, "00001")
    assert(rows(Bm25Index.blockMaxTopN(spark, p)) ===
      rows(Bm25.searchTopN(plantedDocs)))
    val bm = spark.read.parquet(s"$p/delta-00000/blockmax", s"$p/delta-00001/blockmax")
    val spark0 = bm.filter(col("term") === "spark")
      .agg(sum("n_rows"), max("max_tf")).head
    assert(spark0.getLong(0) === 12L && spark0.getLong(1) === 4L)
  }

  test("delete leg: deaddf keeps sidecar df exact — serving equals rebuild on survivors") {
    val p = tmp("r15c")
    Bm25Index.build(plantedDocs, p)
    Bm25Index.delete(plantedDocs.filter(col("doc_id") < 2).select("doc_id"), p, "del-01")
    // the delete delta carries the per-term dead-row counts
    val dd = spark.read.parquet(s"$p/delta-del-01/deaddf").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dd("spark") === 2L && dd("fast") === 2L)
    val survivors = plantedDocs.filter(col("doc_id") >= 2)
    assert(rows(Bm25Index.blockMaxTopN(spark, p)) ===
      rows(Bm25.searchTopN(survivors)))
  }

  test("compact regenerates blockmax from live rows and folds deaddf away") {
    val p = tmp("r15d")
    Bm25Index.build(plantedDocs, p)
    Bm25Index.delete(plantedDocs.filter(col("doc_id") < 2).select("doc_id"), p, "del-01")
    Bm25Index.compactDeltas(spark, p)
    val folded = new java.io.File(p).listFiles.map(_.getName)
      .filter(_.startsWith("delta-"))
    assert(folded.length === 1)
    val d = s"$p/${folded.head}"
    assert(new java.io.File(s"$d/blockmax").exists)
    assert(!new java.io.File(s"$d/deaddf").exists)
    // purged rows dropped out of the counts: 10 live 'spark' docs
    val bm = spark.read.parquet(s"$d/blockmax")
    assert(bm.filter(col("term") === "spark").agg(sum("n_rows")).head.getLong(0) === 10L)
    assert(rows(Bm25Index.blockMaxTopN(spark, p)) ===
      rows(Bm25.searchTopN(plantedDocs.filter(col("doc_id") >= 2))))
  }

  test("store without sidecar coverage fails loudly") {
    val p = tmp("r15e")
    Bm25Index.build(plantedDocs, p)
    // simulate a store that predates the sidecars
    val bmDir = new java.io.File(s"$p/delta-00000/blockmax")
    bmDir.listFiles.foreach(_.delete()); bmDir.delete()
    val e = intercept[IllegalArgumentException] {
      Bm25Index.blockMaxTopN(spark, p)
    }
    assert(e.getMessage.contains("lacks full block-max sidecar coverage"))
  }

  test("hits: all three barrier rungs serve bit-identical rows") {
    import spark.implicits._
    import graft.operators.Graph
    val edges = Seq(
      (1L, 100L), (2L, 100L), (3L, 100L), (4L, 100L), (5L, 100L),
      (1L, 200L), (2L, 200L), (3L, 300L), (4L, 300L), (5L, 200L))
      .toDF("c", "s")
    def rows(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Long)] =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val driverRung = rows(Graph.hitsFrom(edges))
    val windowRung = rows(Graph.hitsFrom(edges, driverRankBound = 0L))
    val shuffleRung = rows(Graph.hitsFrom(edges,
      driverRankBound = 0L, broadcastNodeBound = 0L))
    assert(driverRung === windowRung)
    assert(driverRung === shuffleRung)
    assert(driverRung.nonEmpty)
  }

  test("unigram: planted corpus learns the shared stem as a piece; costs/grid invariants hold") {
    import spark.implicits._
    import graft.operators.Unigram
    // 'work' (4 chars = MaxPieceLen) is the shared stem of three
    // frequent 6-7 char words, so hard-EM must keep it as a piece
    val docs = (0 until 50).map { i =>
      (i.toLong, "worker working workload rare" + (if (i == 0) " uniquez" else ""))
    }.toDF("doc_id", "text")
    val v = Unigram.train(docs).collect()
    val pieces = v.map(_.getString(0)).toSet
    assert(pieces.contains("work"))
    assert(v.forall(r => r.getLong(1) > 0 && r.getString(0).length <= Unigram.MaxPieceLen))
    // floor-gridded probabilities sum to at most the grid
    assert(v.map(_.getLong(2)).sum <= Unigram.Grid)
    val e = Unigram.encodeCorpus(docs).collect()
    // every word yields >= 1 piece and 'worker' family needs >= 2
    assert(e.forall(r => r.getLong(2) >= r.getLong(1)))
  }

  test("unigram: UNK single-char arcs keep segmentation total for unseen characters") {
    import spark.implicits._
    import graft.operators.Unigram
    // train on a corpus, then encode a corpus containing a word whose
    // characters never reached the trained vocab ('zq' digraphs are
    // absent) — the UNK arc must still complete the DP, one piece per
    // unseen char
    val trainDocs = (0 until 20).map(i => (i.toLong, "alpha beta gamma")).toDF("doc_id", "text")
    val vocab = Unigram.trainedVocabDf(trainDocs)
    val probe = Seq((100L, "zqzq alpha")).toDF("doc_id", "text")
    val enc = Unigram.encodeFrom(probe, vocab).head
    // 'zqzq' -> 4 UNK single-char pieces; 'alpha' (5 chars, above the
    // 4-char piece cap) -> 1-2 trained pieces
    assert(enc.getLong(1) === 2L)   // n_words
    assert(enc.getLong(2) >= 5L && enc.getLong(2) <= 6L)
  }

  test("unigram fertility sits between 1 and chars-per-word, alongside BPE's") {
    import graft.operators.{Bpe, Unigram}
    val docs = graft.sources.Tables.documents(spark, SparkTestSession.sf)
    val ug = Unigram.encodeCorpus(docs)
      .agg(sum("n_words"), sum("n_unigram_tokens")).head
    val ugFert = ug.getLong(1).toDouble / ug.getLong(0)
    val bp = Bpe.encodeCorpus(docs)
      .agg(sum("n_words"), sum("n_bpe_tokens")).head
    val bpFert = bp.getLong(1).toDouble / bp.getLong(0)
    // both tokenizers emit at least one piece per word and never more
    // pieces than characters; the unigram cap (MaxPieceLen=4) forces
    // real subwording, so its fertility is strictly above 1
    assert(ugFert > 1.0 && ugFert < 8.0, s"unigram fertility $ugFert")
    assert(bpFert >= 1.0 && bpFert < 8.0, s"bpe fertility $bpFert")
  }

  test("streaming semantic delete: batches compose to the one-shot delete; replay no-ops") {
    import graft.operators.SemanticStore
    val emb = graft.sources.Tables.embeddings(spark, SparkTestSession.sf)
    val p = tmp("r15sd")
    SemanticStore.build(emb, p)
    val feed = tmp("r15sdf")
    SemanticStore.members(spark, p).filter(col("vec_id") % 8 === 1).select("vec_id")
      .repartition(2).write.mode("overwrite").parquet(feed)
    graft.streaming.Streams.semanticDeleteStream(spark, feed, p, Some(1))
    def pairs(path: String): Set[(Long, Long, Double)] =
      SemanticStore.cosinePairs(spark, path).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // one-shot twin on a fresh store
    val q = tmp("r15sdq")
    SemanticStore.build(emb, q)
    SemanticStore.delete(
      SemanticStore.members(spark, q).filter(col("vec_id") % 8 === 1).select("vec_id"),
      q, "del-oneshot")
    val streamed = pairs(p)
    assert(streamed === pairs(q))
    assert(streamed.nonEmpty)
    // replay: kept checkpoint re-forms zero new batches — state unchanged
    graft.streaming.Streams.semanticDeleteStream(spark, feed, p, Some(1))
    assert(pairs(p) === streamed)
  }

  test("reliable-checkpoint flag serves identical rows through the same cuts") {
    import graft.operators.{DedupStore, Graph}
    import spark.implicits._
    val edges = Seq((1L, 100L), (2L, 100L), (3L, 200L), (1L, 200L), (4L, 100L))
      .toDF("c", "s")
    def hitsRows() = Graph.hitsFrom(edges, driverRankBound = 0L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    def dedupRows(p: String) = DedupStore.verifiedNearDups(spark, p).collect()
      .map(_.toSeq).toSet
    val p = tmp("r15rc")
    DedupStore.build(plantedDocs, p)
    val localHits = hitsRows()
    val localPairs = dedupRows(p)
    spark.conf.set(graft.Lineage.ReliableFlag, "true")
    try {
      assert(hitsRows() === localHits)
      assert(dedupRows(p) === localPairs)
    } finally spark.conf.unset(graft.Lineage.ReliableFlag)
  }

  test("time travel rejects a store holding non-numeric (delete) tags") {
    val p = tmp("r15tt")
    Bm25Index.build(plantedDocs, p)
    Bm25Index.delete(plantedDocs.filter(col("doc_id") === 0).select("doc_id"), p, "del-01")
    // without the guard, 'del-01' sorts after '00000' and the snapshot
    // would silently resurrect the deleted doc
    val e = intercept[IllegalArgumentException](
      Bm25Index.scoreAt(spark, p, "00000"))
    assert(e.getMessage.contains("numeric-only version tags"))
  }

  test("streaming budget sampler: union over micro-batches equals the batch sample") {
    import graft.operators.TextAnalysis
    val docs = graft.sources.Tables.documents(spark, SparkTestSession.sf)
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "source").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
    val batch = keyed(TextAnalysis.budgetSample(docs))
    val streamed = keyed(
      graft.streaming.Streams.budgetSampleStream(spark, SparkTestSession.sf))
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("query terms absent from the corpus serve an empty result") {
    val p = tmp("r15f")
    Bm25Index.build(plantedDocs, p)
    assert(Bm25Index.blockMaxTopN(spark, p, Seq("zzzabsent")).isEmpty)
  }
}
