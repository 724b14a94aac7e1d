package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Lineage._

/** Materialized inverted index: the product shape of the reference
  * pipeline, which precomputes TF per document and global IDF into
  * MongoDB collections (MongoTFSink.java, BatchBM25PreMain.java:
  * 106-122) and serves queries from the store. Here the store is
  * parquet, laid out as ATOMICALLY-COMMITTED delta directories:
  *
  *   <path>/delta-<tag>/postings  (term, doc_id, tf) — term-clustered
  *   <path>/delta-<tag>/doclen    (doc_id, dl)
  *
  * Every ingest (the initial build included) stages its postings +
  * doc lengths under `<path>/.staging-<tag>` and commits with ONE
  * directory rename — the only mutation the store ever sees. A crash
  * before the rename leaves an ignored staging dir; after it, the
  * batch is fully visible. Replaying a batch with the same tag is a
  * no-op (the delta exists), which is what makes streaming ingest
  * ([[graft.streaming.Streams.indexIngest]]) exactly-once without a
  * transaction log: source-side replay is idempotent by tag.
  *
  * Build cost: ONE pass over the batch (postings); doclen derives
  * from the postings just written, never from the corpus again.
  * Query cost: NO corpus pass — a pushed-down postings scan for the
  * query terms across the delta glob, one join against doclen, and
  * corpus stats aggregated from doclen (doc-cardinality) at query
  * time. Delta dirs accumulate per batch; [[compactDeltas]] folds
  * them back into one (single-writer maintenance window).
  */
object Bm25Index {

  import graft.sources.DeltaStore

  /** Width (in doc_id units) of a block-max block. Blocks are FIXED
    * doc_id RANGES — `block_id = doc_id div BlockWidth` — shared by
    * every term, NOT per-term posting-list segments: a document's
    * entire query-term mass then lives inside its own block, so a
    * per-block sum of per-term bounds upper-bounds every document in
    * the block and an exact re-score of one block is self-contained.
    * (A per-term segmentation — classic BMW — needs document-at-a-time
    * list traversal to align blocks across terms; doc-range blocks
    * buy the same block-level pruning in one set-based plan.) */
  val BlockWidth = 1024L

  /** Cap on the number of merged doc_id RANGES pushed as a literal
    * scan predicate by [[blockMaxTopN]]; beyond it the serve degrades
    * gracefully to the unpruned (MaxScore-equivalent) scan rather
    * than building a pathological OR-tree. */
  val MaxSurvivorRanges = 256

  /** Write the `blockmax` sidecar for a staged (postings, doclen)
    * pair: per (term, block) row count, max tf and min doclen — the
    * three numbers a sound per-block Okapi upper bound needs
    * (okapiTerm is increasing in tf and decreasing in dl, so
    * okapiTerm(max_tf, df, min_dl, …) dominates every row). Skipped —
    * never wrong, just absent — when doc_id is non-integral or
    * negative (doc-range blocks need a non-negative integral key);
    * [[blockMaxTopN]] fails loudly on a store without full sidecar
    * coverage. */
  private def writeBlockmax(spark: SparkSession, staging: String): Unit = {
    val postings = spark.read.parquet(s"$staging/postings")
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val integral = postings.schema("doc_id").dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (!integral) return
    val minId = postings.agg(min(col("doc_id")).cast("long")).head
    if (!minId.isNullAt(0) && minId.getLong(0) >= 0L) {
      postings.join(spark.read.parquet(s"$staging/doclen"), "doc_id")
        .groupBy(col("term"),
          expr(s"doc_id div ${BlockWidth}L").as("block_id"))
        .agg(count(lit(1)).as("n_rows"), max("tf").as("max_tf"),
          min("dl").as("min_dl"))
        .write.mode(SaveMode.Overwrite).parquet(s"$staging/blockmax")
    }
  }
  private def committedDeltas(spark: SparkSession, path: String): Seq[String] =
    DeltaStore.committedDeltas(spark, path)

  /** Read one per-delta sub-relation across every delta that HAS it —
    * delete deltas carry only `tombstones`, update deltas only
    * `postings`/`doclen`, so every glob filters by existence. */
  private def readSub(spark: SparkSession, deltas: Seq[String],
                      sub: String): Option[DataFrame] = {
    require(deltas.nonEmpty, "no committed deltas")
    val fs = DeltaStore.fsOf(spark, deltas.head)
    val present = deltas.filter(d =>
      fs.exists(new org.apache.hadoop.fs.Path(s"$d/$sub")))
    if (present.isEmpty) None
    else Some(DeltaStore.readRelation(spark, present.map(d => s"$d/$sub")))
  }

  /** The LIVE (postings, doclen) pair: physical rows minus tombstoned
    * doc_ids. Corpus stats (n_docs, avgdl, per-term df) re-derive from
    * the live rows downstream, so every IDF shifts exactly as a full
    * rebuild without the deleted docs would — serving correctness
    * never waits for compaction. The anti-join's right side is the
    * tombstone set (delete-scaled, broadcast-sized in practice). */
  private def liveIndex(spark: SparkSession,
                        deltas: Seq[String]): (DataFrame, DataFrame) = {
    val postings = readSub(spark, deltas, "postings")
      .getOrElse(throw new IllegalStateException("store holds no postings"))
    val doclen = readSub(spark, deltas, "doclen")
      .getOrElse(throw new IllegalStateException("store holds no doclen"))
    readSub(spark, deltas, "tombstones") match {
      case None => (postings, doclen)
      case Some(ts) =>
        val dead = ts.select("doc_id")
        (postings.join(dead, Seq("doc_id"), "left_anti"),
          doclen.join(dead, Seq("doc_id"), "left_anti"))
    }
  }

  /** Full (re)build: reset the store and ingest the corpus as the
    * first delta. */
  def build(docs: DataFrame, path: String): Unit = {
    DeltaStore.reset(docs.sparkSession, path)
    update(docs, path, "00000")
  }

  /** Incrementally ingest a NEW document batch. Work scales with the
    * batch, not the store (the reference re-runs its whole pipeline
    * per corpus change; a per-doc Mongo upsert has the same
    * batch-scaled cost — this is its shared-nothing analogue).
    * Idempotent per `tag`: a committed tag is skipped, so replays
    * (streaming restarts) are exactly-once. Re-ingesting an existing
    * doc_id under a NEW tag is rejected — append-only maintenance
    * would double-count its postings; replace via rebuild or a keyed
    * upsert of the affected delta. The duplicate check range-prunes
    * via per-delta doc_id sidecars, so it stays batch-scaled (for
    * monotone-id ingest it touches O(1) deltas, not the store). */
  def update(newDocs: DataFrame, path: String,
             tag: String = java.util.UUID.randomUUID().toString): Unit = {
    val spark = newDocs.sparkSession
    if (DeltaStore.isCommitted(spark, path, tag)) return // replayed batch
    val deltas = committedDeltas(spark, path)
    // batch id range (integral doc_id only): one batch-scaled agg,
    // reused for range-pruning the duplicate check AND this delta's
    // own sidecar. Non-integral or all-NULL ids get NO range (lo > hi)
    // → the check falls back to scanning every delta, never silently
    // skipped; an empty batch cannot contain a duplicate
    val (batchEmpty, batchLo, batchHi) = DeltaStore.batchRange(newDocs, "doc_id")
    if (deltas.nonEmpty && !batchEmpty) {
      val fs = DeltaStore.fsOf(spark, path)
      // tombstone-only deltas carry no doclen — dedup-check candidates
      // are the update deltas whose id range can overlap. A DELETED id
      // stays rejected until compaction physically purges its rows:
      // tombstoning marks the doc dead, it does not free the id
      val candidates = DeltaStore
        .overlappingDeltas(fs, deltas, batchLo, batchHi)
        .filter(d => fs.exists(new org.apache.hadoop.fs.Path(s"$d/doclen")))
      DeltaStore.rejectDuplicateIds(spark, candidates,
        "doclen", "doc_id", newDocs, "postings")
    }
    val range = if (batchLo <= batchHi) Some((batchLo, batchHi)) else None
    DeltaStore.commit(spark, path, tag, range) { staging =>
      Bm25.tf(newDocs)
        .repartition(col("term")).sortWithinPartitions("term", "doc_id")
        .write.mode(SaveMode.Overwrite).parquet(s"$staging/postings")
      // doclen derives from the postings just written — ONE corpus pass
      spark.read.parquet(s"$staging/postings")
        .groupBy("doc_id").agg(sum("tf").as("dl"))
        .write.mode(SaveMode.Overwrite).parquet(s"$staging/doclen")
      // block-max sidecar: batch-scaled aggregation over the rows just
      // staged — build-time cost, so [[blockMaxTopN]] can gate blocks
      // before reading posting rows
      writeBlockmax(spark, staging)
    }
  }

  /** TOMBSTONE DELETE — the maintenance leg between update and
    * compact that completes the quad (build / update / delete /
    * compact). A delete commits one delta holding only a `tombstones`
    * (doc_id) relation: O(batch) work and crash-atomic like every
    * other ingest, idempotent per `tag` (which is REQUIRED — a
    * caller-owned tag is what makes a retried delete a no-op).
    * Serving anti-joins live rows against the tombstone set and
    * re-derives every corpus stat (n_docs, avgdl, df) from the LIVE
    * rows, so scores shift exactly as a rebuild-without-the-docs
    * would, immediately — the physical purge is deferred to
    * [[compactDeltas]] (the LSM discipline: deletes are writes,
    * reclamation is maintenance). Every id must be LIVE (present, not
    * already tombstoned) — a typo'd delete fails loudly instead of
    * no-op'ing; a deleted id stays reserved against re-ingest until
    * compaction purges it. */
  def delete(docIds: DataFrame, path: String, tag: String): Unit = {
    val spark = docIds.sparkSession
    if (DeltaStore.isCommitted(spark, path, tag)) return // replayed batch
    val deltas = committedDeltas(spark, path)
    require(deltas.nonEmpty, s"no committed deltas under $path")
    val ids = docIds.select(col("doc_id")).distinct().cutLineage()
    // liveness check stays BATCH-scaled on a long-running store: the
    // presence side range-prunes to the update deltas whose id-range
    // sidecar can overlap the batch (the rejectDuplicateIds
    // discipline); the tombstone side is delete-scaled by nature
    val (bEmpty, lo, hi) = DeltaStore.batchRange(ids, "doc_id")
    if (!bEmpty) {
      val fs = DeltaStore.fsOf(spark, path)
      val candidates = DeltaStore.overlappingDeltas(fs, deltas, lo, hi)
        .filter(d => fs.exists(new org.apache.hadoop.fs.Path(s"$d/doclen")))
      val present =
        if (candidates.isEmpty) ids.limit(0)
        else ids.join(DeltaStore.readRelation(spark, candidates.map(d => s"$d/doclen"))
          .select("doc_id"), Seq("doc_id"), "left_semi")
      val live = readSub(spark, deltas, "tombstones") match {
        case None => present
        case Some(ts) => present.join(ts.select("doc_id"), Seq("doc_id"), "left_anti")
      }
      val nMissing = ids.join(live, Seq("doc_id"), "left_anti").count()
      require(nMissing == 0,
        s"delete batch names $nMissing doc_ids that are not live in the store " +
          "(absent or already tombstoned) — refusing a partially-effective delete")
    }
    DeltaStore.commit(spark, path, tag, None) { staging =>
      // deaddf sidecar: per-term counts of the postings rows this
      // delete tombstones, so block-max serving can reconstruct the
      // LIVE df per term from sidecars alone (physical row counts
      // minus dead rows) without scanning posting rows. Delta-scaled:
      // the deleted docs' rows live only in the id-range-overlapping
      // update deltas (same range-pruning discipline as the liveness
      // check above); each physical row is counted at most once
      // across delete deltas because a delete requires its ids LIVE
      // and a tombstoned id stays reserved until compaction.
      val fs = DeltaStore.fsOf(spark, path)
      val candPost =
        if (bEmpty) Seq.empty
        else DeltaStore.overlappingDeltas(fs, deltas, lo, hi)
          .filter(d => fs.exists(new org.apache.hadoop.fs.Path(s"$d/postings")))
      val dead =
        if (candPost.isEmpty)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("term",
                org.apache.spark.sql.types.StringType),
              org.apache.spark.sql.types.StructField("n_dead",
                org.apache.spark.sql.types.LongType))))
        else DeltaStore.readRelation(spark, candPost.map(d => s"$d/postings"))
          .join(ids, Seq("doc_id"), "left_semi")
          .groupBy("term").agg(count(lit(1)).as("n_dead"))
      // the tombstone write and the deaddf aggregation are
      // independent — overlap them (guide §2.6)
      graft.Jobs.inParallel(Seq(
        () => ids.write.mode(SaveMode.Overwrite).parquet(s"$staging/tombstones"),
        () => dead.coalesce(1).write.mode(SaveMode.Overwrite)
          .parquet(s"$staging/deaddf")))
    }
  }

  /** Fold all committed deltas into ONE delta (small-files
    * maintenance: a long-running ingest accumulates a delta dir per
    * batch, and scan task scheduling degrades with file count) and
    * PHYSICALLY PURGE tombstoned rows — the fold anti-joins postings
    * and doclen against the accumulated tombstone set and drops the
    * tombstones themselves, so the compacted store is byte-equivalent
    * to one built without the deleted docs (replayed delete tags stay
    * no-ops through the cumulative tag history). The merged relations
    * are staged and committed with the same single-rename protocol;
    * the old deltas are then removed. Requires a single-writer
    * maintenance window (no concurrent update/score — the brief gap
    * between committing the merged delta and removing the old ones
    * would double-count for a concurrent reader). */
  def compactDeltas(spark: SparkSession, path: String): Unit =
    DeltaStore.compact(spark, path) { (deltas, staging) =>
      val (postings, doclen) = liveIndex(spark, deltas)
      // postings and doclen rewrites are independent — overlap them
      // (guide §2.6); the block-max sidecar READS the staged pair, so
      // it stays sequenced after both
      graft.Jobs.inParallel(Seq(
        () => postings
          .repartition(col("term")).sortWithinPartitions("term", "doc_id")
          .write.parquet(s"$staging/postings"),
        () => doclen.write.parquet(s"$staging/doclen")))
      // the folded delta's block-max sidecar re-derives from the LIVE
      // rows just staged (purged rows drop out of the bounds, the
      // deaddf history folds away with the tombstones)
      writeBlockmax(spark, staging)
    }

  /** SHARD MERGE — fold two independently built stores over DISJOINT
    * doc_id spaces into ONE fresh store at `dest`, serving identically
    * to a rebuild on the union of the two LIVE corpora. This is the
    * maintenance leg a sharded 100 TB deployment actually runs: each
    * executor group indexes its own id range shared-nothing, then
    * per-shard stores fold pairwise into serving stores — no
    * single-writer ingest ever sees the whole corpus.
    *
    * Disjointness is a GATE, not an assumption: overlapping ids would
    * double-count postings (the [[update]] duplicate-rejection rule
    * across stores). The check is O(1) when both sides carry integral
    * id ranges that don't overlap (the shard layout by construction);
    * only on range overlap does it pay one doc-cardinality semi-join.
    *
    * The block-max sidecar MERGES WITHOUT RESCANNING when it can:
    * blocks are fixed doc-ranges shared by every store (same
    * [[BlockWidth]] universe), so per-(term, block) row counts SUM,
    * tf bounds MAX and dl bounds MIN — exact, byte-equal to a
    * re-derivation, because each side's sidecar already describes its
    * own live rows and the doc sets are disjoint. Any tombstone on
    * either side (whose dead rows the sidecars still count) or a
    * coverage gap falls back to re-deriving the sidecar from the
    * live rows being staged anyway — never silently unsound. Corpus
    * stats (n_docs, avgdl, df) re-derive at query time like every
    * serve, so no stored stat needs reconciling. Requires a
    * single-writer window on `dest` (fresh store; the sources are
    * only read). */
  def mergeStores(spark: SparkSession, pathA: String, pathB: String,
                  dest: String): Unit = {
    val dA = committedDeltas(spark, pathA)
    require(dA.nonEmpty, s"no committed deltas under $pathA")
    val dB = committedDeltas(spark, pathB)
    require(dB.nonEmpty, s"no committed deltas under $pathB")
    val (pa, la) = liveIndex(spark, dA)
    val (pb, lb) = liveIndex(spark, dB)
    // two independent guard aggregations — overlapped (guide §2.6)
    val br = new Array[(Boolean, Long, Long)](2)
    graft.Jobs.inParallel(Seq(
      () => br(0) = DeltaStore.batchRange(la, "doc_id"),
      () => br(1) = DeltaStore.batchRange(lb, "doc_id")))
    val ((eA, loA, hiA), (eB, loB, hiB)) = (br(0), br(1))
    val rangesDisjoint = loA <= hiA && loB <= hiB && (hiA < loB || hiB < loA)
    if (!eA && !eB && !rangesDisjoint) {
      val nShared = la.select("doc_id")
        .join(lb.select("doc_id"), "doc_id").count()
      require(nShared == 0,
        s"stores share $nShared live doc_ids — shard merge requires " +
          "disjoint id spaces (re-key one side or delete the duplicates first)")
    }
    // FileSystems resolve PER SIDE: the two source stores can live on
    // different filesystems, and pathA's handle probing pathB's deltas
    // would throw wrong-FS (or silently probe the wrong store)
    val fsA = DeltaStore.fsOf(spark, pathA)
    val fsB = DeltaStore.fsOf(spark, pathB)
    def has(fs: org.apache.hadoop.fs.FileSystem)(d: String, sub: String) =
      fs.exists(new org.apache.hadoop.fs.Path(s"$d/$sub"))
    def hasEach(sub: String): Seq[String] =
      dA.filter(has(fsA)(_, sub)) ++ dB.filter(has(fsB)(_, sub))
    val noTombstones = hasEach("tombstones").isEmpty
    val upd = hasEach("postings")
    val sidecarsExact = noTombstones &&
      upd.forall(d => has(if (dA.contains(d)) fsA else fsB)(d, "blockmax"))
    val range =
      if (loA <= hiA && loB <= hiB) Some((math.min(loA, loB), math.max(hiA, hiB)))
      else None
    DeltaStore.reset(spark, dest)
    DeltaStore.commit(spark, dest, "00000", range) { staging =>
      val writePostings = () => pa.union(pb)
        .repartition(col("term")).sortWithinPartitions("term", "doc_id")
        .write.mode(SaveMode.Overwrite).parquet(s"$staging/postings")
      // doclen COPY-THROUGH (guide §6, the DedupStore.mergeStores
      // discipline): with no tombstones anywhere, doclen is the plain
      // union of both shards' files, doc-keyed with disjoint ranges —
      // copied files keep exactly the clustering a rewrite would.
      // Postings ALWAYS re-cluster on term: the serving relation's
      // term runs interleave across shards and the re-cluster is what
      // term-pruned scans row-group-skip on — never copied.
      val writeDoclen = () =>
        if (noTombstones)
          DeltaStore.copySubFiles(spark, upd, "doclen", staging, "s")
        else la.union(lb).write.mode(SaveMode.Overwrite).parquet(s"$staging/doclen")
      if (sidecarsExact)
        // the sidecar arithmetic reads the SOURCE stores' sidecars, so
        // all three staged writes are independent — overlap them
        // (guide §2.6)
        graft.Jobs.inParallel(Seq(writePostings, writeDoclen,
          () => DeltaStore.readRelation(spark, upd.map(d => s"$d/blockmax"))
            .groupBy("term", "block_id")
            .agg(sum("n_rows").as("n_rows"), max("max_tf").as("max_tf"),
              min("min_dl").as("min_dl"))
            .write.mode(SaveMode.Overwrite).parquet(s"$staging/blockmax")))
      else {
        // fallback re-derivation READS the staged pair — sequence it
        // after the (overlapped) postings/doclen writes
        graft.Jobs.inParallel(Seq(writePostings, writeDoclen))
        writeBlockmax(spark, staging)
      }
    }
  }

  /** (term, df_a, df_b, delta): SNAPSHOT DIFF between two pinned
    * versions of the store — the top-`k` terms by |df change| between
    * `tagA` and `tagB`, the audit read the time-travel family lacked
    * (scoreAt answers "what did version X serve"; this answers "WHAT
    * CHANGED between X and Y" — the vocabulary-shift fingerprint of
    * an ingest batch, read BEFORE promoting a new snapshot to
    * serving). Both sides resolve through `visibleAt` + the live
    * view, so tombstones and rekeys are respected exactly as the
    * serves respect them; dfs are exact row counts of the (doc,
    * term)-unique postings, the diff one full-outer join of two
    * term-cardinality rollups — postings are scanned once per side
    * and nothing doc-cardinality shuffles. Deterministic cut:
    * (|delta| desc, term asc). */
  def diffVersions(spark: SparkSession, path: String,
                   tagA: String, tagB: String, k: Int = 10): DataFrame = {
    val (pa, _) = liveIndex(spark, DeltaStore.visibleAt(spark, path, tagA))
    val (pb, _) = liveIndex(spark, DeltaStore.visibleAt(spark, path, tagB))
    val dfa = pa.groupBy("term").agg(count(lit(1)).as("df_a"))
    val dfb = pb.groupBy("term").agg(count(lit(1)).as("df_b"))
    dfa.join(dfb, Seq("term"), "full_outer")
      .select(col("term"), coalesce(col("df_a"), lit(0L)).as("df_a"),
        coalesce(col("df_b"), lit(0L)).as("df_b"))
      .withColumn("delta", col("df_b") - col("df_a"))
      .filter(col("delta") =!= 0)
      .orderBy(abs(col("delta")).desc, col("term").asc)
      .limit(k)
  }

  /** Okapi BM25 over the staged index — matches Bm25.bm25Score on the
    * same corpus exactly (same formula, rounding, tie-breaks). */
  def score(spark: SparkSession, path: String,
            queryTerms: Seq[String] = Bm25.QueryTerms): DataFrame = {
    val deltas = committedDeltas(spark, path)
    require(deltas.nonEmpty, s"no committed deltas under $path")
    scoreDeltas(spark, deltas, queryTerms)
  }

  /** TIME-TRAVEL scoring: the same per-doc BM25, but against the
    * store AS OF version `maxTag` — only deltas whose tag sorts
    * ≤ maxTag participate (the [[AnnIndex.searchTopKAt]] contract on
    * the TEXT index): a reader pins the exact snapshot a batch job
    * was validated against while ingest keeps committing; corpus
    * stats (df, n_docs, avgdl) re-derive from the visible deltas, so
    * the scores equal a rebuild on the snapshot corpus. Same
    * retention trade: [[compactDeltas]] collapses folded history, so
    * travel reaches only versions newer than the last compaction. */
  def scoreAt(spark: SparkSession, path: String, maxTag: String,
              queryTerms: Seq[String] = Bm25.QueryTerms): DataFrame = {
    // numeric-tag contract: DeltaStore.visibleAt fails loudly on a
    // store holding delete/compact tags (undefined lexicographic order)
    scoreDeltas(spark, DeltaStore.visibleAt(spark, path, maxTag), queryTerms)
  }

  private def scoreDeltas(spark: SparkSession, deltas: Seq[String],
                          queryTerms: Seq[String]): DataFrame = {
    val (postings, dl) = liveIndex(spark, deltas)
    val tfq = postings
      .filter(col("term").isin(queryTerms: _*)) // pushed to the scan
    // corpus stats aggregate doc-cardinality rows at query time — no
    // stored table to keep transactionally in step with the deltas
    val stats = dl.agg(count(col("doc_id")).as("n_docs"),
      avg(col("dl")).cast("double").as("avgdl"))
    val scored = tfq
      .withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        Bm25.okapiTerm(col("tf"), col("df"), col("dl"), col("avgdl"), col("n_docs")).as("c"))
    scored.groupBy("doc_id").agg(round(sum("c"), 4).as("score"))
  }

  def searchTopN(spark: SparkSession, path: String,
                 queryTerms: Seq[String] = Bm25.QueryTerms, n: Int = 10): DataFrame =
    score(spark, path, queryTerms).orderBy(col("score").desc, col("doc_id").asc).limit(n)

  /** [[SearchExtras.maxScoreTopN]] served from the STAGED index —
    * upper-bound pruning where it belongs at 100 TB: ON the stored
    * postings. The postings scan is pruned to the query terms
    * (pushed-down predicate — no corpus pass, no tokenize), the
    * per-doc idf·(k1+1) bounds derive from that scan alone, and the
    * doclen relation joins only for the few candidates that can
    * still make the top-k — the difference between reading doclen
    * for every doc on a common term's posting list and for the
    * survivors of the θ cut. Rows equal [[searchTopN]] /
    * [[Bm25.searchTopN]] exactly (MaxScore is an exact prune; shared
    * oracle); stats re-derive from LIVE doclen rows, so the route is
    * tombstone-aware like every other staged serve. */
  def maxScoreTopN(spark: SparkSession, path: String,
                   queryTerms: Seq[String] = Bm25.QueryTerms,
                   k: Int = 10): DataFrame = {
    val deltas = committedDeltas(spark, path)
    require(deltas.nonEmpty, s"no committed deltas under $path")
    val (postings, dl) = liveIndex(spark, deltas)
    SearchExtras.maxScoreFrom(
      postings.filter(col("term").isin(queryTerms: _*)), dl, k)
  }

  /** BLOCK-MAX MaxScore: the θ cut prunes postings I/O, not just join
    * width. [[maxScoreTopN]] bounds per TERM, so a common term's whole
    * posting list is still read to compute its per-doc bounds; this
    * route gates doc_id-range BLOCKS from the build-time `blockmax`
    * sidecar BEFORE any posting row is read:
    *
    *   1. per-(term, block) upper bound u = okapiTerm(max_tf, df_live,
    *      min_dl, avgdl, n_docs) — sound because okapiTerm is
    *      increasing in tf and decreasing in dl; df_live reconstructs
    *      EXACTLY from sidecars (per-term physical row counts minus
    *      the delete deltas' deaddf counts), never from a row scan;
    *   2. blocks are shared doc_id ranges, so Σ_terms u(t, b) bounds
    *      every document in block b (a doc's whole query-term mass
    *      lives in its own block) — the per-block sum is the gate;
    *   3. θ seeds from the top blocks by that sum (accumulated until
    *      the sidecar row counts guarantee ≥ k docs): ONLY those
    *      blocks' rows are read and scored exactly — self-contained,
    *      because blocks are doc ranges;
    *   4. surviving blocks (Σu ≥ θ − 1e-4, the shared rounding slack;
    *      a block holding any true top-k doc provably survives) merge
    *      into contiguous doc_id ranges pushed as a LITERAL scan
    *      predicate — parquet row-group pruning on the (term, doc_id)-
    *      sorted postings does the I/O skip. Above [[MaxSurvivorRanges]]
    *      the predicate is dropped (graceful degradation to the
    *      maxScore-shaped unpruned scan — correct, just unpruned).
    *
    * Rows equal [[searchTopN]] exactly (admissible prune, identical
    * okapiTerm arithmetic/rounding/tie-breaks — shared oracle with
    * q_search_topn). Driver syncs are bounded: ≤ 64 seed-block rows,
    * one θ scalar, ≤ MaxSurvivorRanges+1 survivor ids. Requires full
    * sidecar coverage (every update delta carries blockmax, every
    * delete delta deaddf) and fails loudly otherwise — compact or
    * rebuild a store that predates the sidecars. Tombstones only ever
    * RAISE the bounds (max over a superset), never break them. */
  /** Sidecar-coverage gate shared by the block-max serves: the
    * committed deltas split into update/delete legs, each leg
    * carrying its sidecar (blockmax / deaddf) — fails loudly
    * otherwise. */
  private def blockmaxDeltas(spark: SparkSession,
                             path: String): (Seq[String], Seq[String], Seq[String]) = {
    val deltas = committedDeltas(spark, path)
    require(deltas.nonEmpty, s"no committed deltas under $path")
    val (upd, del) = requireSidecars(spark, path, deltas)
    (deltas, upd, del)
  }

  /** The coverage assertion itself, over an EXPLICIT delta subset —
    * shared by the live serves (all committed deltas) and the pinned
    * snapshot serve (the `visibleAt` subset), so a snapshot at a
    * pre-sidecar version fails as loudly as a live read would (r15
    * verdict task 6), never silently diverging. */
  private def requireSidecars(spark: SparkSession, path: String,
                              deltas: Seq[String]): (Seq[String], Seq[String]) = {
    val fs = DeltaStore.fsOf(spark, deltas.head)
    def has(d: String, sub: String) =
      fs.exists(new org.apache.hadoop.fs.Path(s"$d/$sub"))
    val updDeltas = deltas.filter(has(_, "postings"))
    val delDeltas = deltas.filter(has(_, "tombstones"))
    val missingBm = updDeltas.filterNot(has(_, "blockmax"))
    val missingDd = delDeltas.filterNot(has(_, "deaddf"))
    require(missingBm.isEmpty && missingDd.isEmpty,
      s"store $path lacks full block-max sidecar coverage " +
        s"(${missingBm.size} update deltas without blockmax, " +
        s"${missingDd.size} delete deltas without deaddf). Either the " +
        "store predates the sidecars — compact or rebuild to serve " +
        "block-max — or its doc_id column is non-integral or holds " +
        "negative ids, in which case doc-range blocks are undefined and " +
        "the sidecar is never written (compaction will NOT help; serve " +
        "via indexMaxScore/searchTopN instead)")
    (updDeltas, delDeltas)
  }

  /** (blocks, dfLive) for `terms`: combined per-(term, block) bounds
    * across deltas (physical row counts sum, tf maxes, dl mins — all
    * term-pruned at the sidecar scan; the sidecar is
    * (terms x blocks)-sized, postings-free), plus the live per-term
    * df reconstructed from sidecars alone (blockmax sums minus
    * delete-delta deaddf) — provably equal to the live per-term
    * posting row count, so block-restricted scans still score with
    * GLOBAL stats. */
  private def blockBounds(spark: SparkSession, updDeltas: Seq[String],
                          delDeltas: Seq[String],
                          terms: Seq[String]): (DataFrame, DataFrame) = {
    val blocks = DeltaStore.readRelation(spark, updDeltas.map(d => s"$d/blockmax"))
      .filter(col("term").isin(terms: _*))
      .groupBy("term", "block_id")
      .agg(sum("n_rows").as("n_rows"), max("max_tf").as("max_tf"),
        min("min_dl").as("min_dl"))
    val dfLive = {
      val phys = blocks.groupBy("term").agg(sum("n_rows").as("df_phys"))
      if (delDeltas.isEmpty)
        phys.select(col("term"), col("df_phys").as("df"))
      else {
        val dd = DeltaStore.readRelation(spark, delDeltas.map(d => s"$d/deaddf"))
          .filter(col("term").isin(terms: _*))
          .groupBy("term").agg(sum("n_dead").as("n_dead"))
        phys.join(dd, Seq("term"), "left")
          .select(col("term"),
            (col("df_phys") - coalesce(col("n_dead"), lit(0L))).as("df"))
      }
    }
    (blocks, dfLive)
  }

  /** Merge sorted block ids into contiguous [lo, hi) block ranges. */
  private def mergedRanges(ids: Seq[Long]): List[(Long, Long)] =
    ids.sorted.foldLeft(List.empty[(Long, Long)]) {
      case ((lo, hi) :: tl, b) if b == hi => (lo, b + 1) :: tl
      case (acc, b) => (b, b + 1) :: acc
    }

  /** A short OR-of-doc_id-ranges LITERAL predicate over the merged
    * blocks — it reaches the parquet scan, and row-group stats on the
    * sorted doc_id do the skip. */
  private def rangePredicate(ids: Seq[Long]): org.apache.spark.sql.Column =
    mergedRanges(ids).map { case (lo, hi) =>
      col("doc_id") >= lit(lo * BlockWidth) &&
        col("doc_id") < lit(hi * BlockWidth)
    }.reduce(_ || _)

  def blockMaxTopN(spark: SparkSession, path: String,
                   queryTerms: Seq[String] = Bm25.QueryTerms,
                   k: Int = 10): DataFrame = {
    val (deltas, updDeltas, delDeltas) = blockmaxDeltas(spark, path)
    blockMaxServe(spark, deltas, updDeltas, delDeltas, queryTerms, k)
  }

  /** [[blockMaxTopN]] pinned at a store version — the [[scoreAt]]
    * time-travel contract on the block-max rung. Resolves the
    * `visibleAt` delta subset (numeric-only tags, update-only stores)
    * and asserts SIDECAR COVERAGE ON THAT SUBSET: a snapshot pinned
    * at a pre-sidecar version fails loudly exactly like the live
    * serve (r15 verdict task 6), instead of silently serving
    * unbounded blocks. Rows equal a [[Bm25.searchTopN]] rebuild on
    * the pinned corpus (spec-pinned). */
  def blockMaxTopNAt(spark: SparkSession, path: String, maxTag: String,
                     queryTerms: Seq[String] = Bm25.QueryTerms,
                     k: Int = 10): DataFrame = {
    val deltas = DeltaStore.visibleAt(spark, path, maxTag)
    val (updDeltas, delDeltas) = requireSidecars(spark, path, deltas)
    blockMaxServe(spark, deltas, updDeltas, delDeltas, queryTerms, k)
  }

  private def blockMaxServe(spark: SparkSession, deltas: Seq[String],
                            updDeltas: Seq[String], delDeltas: Seq[String],
                            queryTerms: Seq[String], k: Int): DataFrame = {
    val (postings, dlLive) = liveIndex(spark, deltas)
    val (blocks, dfLive0) = blockBounds(spark, updDeltas, delDeltas, queryTerms)
    // the θ protocol consumes dfLive / the corpus stats / the block
    // bound-sums in SEVERAL jobs (seed collect, seed exact pass, final
    // exact pass) — cut the query-terms-sized and 1-row relations once
    // so each later job reads blocks instead of re-running the sidecar
    // aggregation and the doclen scan (guide §1.2: don't recompute
    // what you already have; all three are ≤ |query terms| rows)
    val dfLive = dfLive0.cutLineage()
    val stats = dlLive.agg(count(col("doc_id")).as("n_docs"),
      avg(col("dl")).cast("double").as("avgdl")).cutLineage()
    val blockSum = blocks.join(broadcast(dfLive), "term")
      .crossJoin(broadcast(stats))
      .select(col("block_id"), col("n_rows"),
        Bm25.okapiTerm(col("max_tf"), col("df"), col("min_dl"),
          col("avgdl"), col("n_docs")).as("u"))
      .groupBy("block_id")
      .agg(sum("u").as("usum"), max("n_rows").as("docs_lb"))
      .cutLineage()
    // exact Okapi scoring of a doc_id-range-restricted candidate set;
    // df comes from the sidecar reconstruction (provably equal to the
    // live per-term row count), so a block-restricted scan still
    // scores with GLOBAL stats
    def exactIn(blockIds: Option[Seq[Long]]): DataFrame = {
      val pruned = blockIds match {
        case None => postings.filter(col("term").isin(queryTerms: _*))
        case Some(ids) if ids.isEmpty => postings.filter(lit(false))
        case Some(ids) =>
          postings.filter(col("term").isin(queryTerms: _*) &&
            rangePredicate(ids))
      }
      pruned
        .join(broadcast(dfLive), "term")
        .join(dlLive, "doc_id")
        .crossJoin(broadcast(stats))
        .select(col("doc_id"),
          Bm25.okapiTerm(col("tf"), col("df"), col("dl"),
            col("avgdl"), col("n_docs")).as("c"))
        .groupBy("doc_id").agg(round(sum("c"), 4).as("score"))
    }
    // θ seeding: top blocks by bound-sum until the sidecar row counts
    // guarantee >= k docs (n_rows for ONE term is exactly that many
    // distinct docs, so max_t n_rows lower-bounds the block's doc
    // count — tombstones can overcount, and the -inf fallback below
    // keeps an under-seeded θ sound)
    val top = blockSum
      .orderBy(col("usum").desc, col("block_id").asc).limit(64)
      .select("block_id", "usum", "docs_lb").collect()
    val seedIds = scala.collection.mutable.ArrayBuffer.empty[Long]
    var seen = 0L
    for (r <- top if seen < k) { seedIds += r.getLong(0); seen += r.getLong(2) }
    val candidates: Option[Seq[Long]] =
      if (seedIds.isEmpty) None // query terms absent: nothing to prune
      else {
        val seedAgg = exactIn(Some(seedIds.toSeq))
          .orderBy(col("score").desc, col("doc_id").asc).limit(k)
          .agg(count(lit(1)).as("n"), min("score").as("kth")).head
        if (seedAgg.getLong(0) < k) None // under-seeded θ: no prune
        else {
          val theta = seedAgg.getDouble(1)
          // bounded survivor sync: collect at most collectCap+1 block
          // ids; hitting the cap (or exceeding MaxSurvivorRanges after
          // merging adjacent blocks — a contiguous run collapses to
          // one clause) degrades to the unpruned scan
          val collectCap = MaxSurvivorRanges * 64
          val surv = blockSum.filter(col("usum") >= lit(theta - 1e-4))
            .select("block_id").limit(collectCap + 1)
            .collect().map(_.getLong(0)).toSeq
          if (surv.size > collectCap ||
            mergedRanges(surv).size > MaxSurvivorRanges) None
          else Some(surv)
        }
      }
    exactIn(candidates)
      .orderBy(col("score").desc, col("doc_id").asc).limit(k)
  }

  /** (query_id, doc_id, score, rk): BM25 top-k for a TABLE of queries
    * served from the staged index — the reference's serving loop
    * (query in, Mongo TF/IDF lookups, score) as one plan with NO
    * corpus pass: the postings scan is pruned to the queries' terms,
    * doclen joins once, and the scoring stage is shared with the
    * corpus-derived [[Bm25.batchSearch]] so both routes return
    * identical rows. */
  def batchSearch(spark: SparkSession, path: String,
                  queries: DataFrame, k: Int = 10): DataFrame = {
    val (tf, dl) = liveServe(spark, path)
    Bm25.batchScoreFrom(tf, dl, queries, k)
  }

  /** Resolve the live (postings, doclen) pair ONCE for a serving
    * session — the static side of per-batch scoring. A streaming
    * serving loop ([[graft.streaming.Streams.searchStream]]) scores
    * every micro-batch against the SAME snapshot (single-writer
    * contract: the index is static during serving), so re-listing
    * committed deltas and re-opening the parquet relations inside
    * every micro-batch plan is pure per-batch overhead — at scale,
    * one store listing round-trip per batch against the object
    * store. Relations are lazy scans: term pruning/pushdown still
    * happens per consuming plan exactly as in [[batchSearch]]. */
  def liveServe(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val deltas = committedDeltas(spark, path)
    require(deltas.nonEmpty, s"no committed deltas under $path")
    liveIndex(spark, deltas)
  }

  /** [[batchSearch]] against a pre-resolved static side — the
    * streaming serving loop's per-batch entry point. */
  def batchSearchFrom(tfDl: (DataFrame, DataFrame),
                      queries: DataFrame, k: Int = 10): DataFrame =
    Bm25.batchScoreFrom(tfDl._1, tfDl._2, queries, k)

  /** [[batchSearch]] with block-max gating (r15 verdict task 5 — the
    * shelved rung that made the serving ladder inconsistent: the
    * single-query path had [[blockMaxTopN]] while the batch path
    * scanned term-pruned but block-UNGATED postings). Per-QUERY θ over
    * the SHARED doc-range blocks, survivor ranges UNIONED into one
    * literal predicate:
    *
    *  1. per-(query, block) sound bound sums from the (term x block)
    *     sidecar joined to the tokenized query terms — one
    *     DISTRIBUTED relation, no per-query driver loop;
    *  2. per-query θ seeding as a WINDOW (blocks by bound-sum desc,
    *     cumulative sidecar row counts until ≥ k — exactly
    *     [[blockMaxTopN]]'s driver loop, made distributed), seed
    *     ranges unioned across queries for ONE exact pass whose
    *     per-query k-th score is θ_q (any scored superset only raises
    *     θ_q toward the true k-th, so the prune stays admissible);
    *  3. survivors per query = blocks with bound-sum ≥ θ_q − ε;
    *     under-seeded queries (< k docs reachable from seeds) keep
    *     ALL their blocks — per-query graceful degradation;
    *  4. the survivor UNION becomes the merged-range literal on the
    *     final exact scan, scored with the sidecar-reconstructed df
    *     (spec-pinned equal to the live count), so rows equal
    *     [[batchSearch]] exactly — shared oracle with q_search_batch.
    *
    * Driver syncs bounded: the distinct query-term list (the batch
    * contract already broadcasts the query table; above the cap it
    * serves unpruned), the seed-union ids, one θ relation
    * (query-table-sized, broadcast), the survivor-union ids — each
    * capped, every cap degrading to the unpruned scan. At the gate SF
    * the extra jobs dominate; at 100 TB the skipped postings
    * row-groups are the point (the reference serves its query loop
    * one Mongo lookup at a time — file:line cited on [[batchSearch]]). */
  def blockMaxBatchSearch(spark: SparkSession, path: String,
                          queries: DataFrame, k: Int = 10): DataFrame = {
    val (deltas, updDeltas, delDeltas) = blockmaxDeltas(spark, path)
    val (postings, dlLive) = liveIndex(spark, deltas)
    val qterms = Bm25.queryTermsOf(queries)
    val termCap = 4096
    val terms = qterms.select("term").distinct().limit(termCap + 1)
      .collect().map(_.getString(0)).toSeq
    if (terms.isEmpty || terms.size > termCap)
      return Bm25.batchScoreFrom(postings, dlLive, queries, k)
    val (blocks, dfLive0) = blockBounds(spark, updDeltas, delDeltas, terms)
    // cut the small protocol relations once (≤ |terms| rows / 1 row /
    // (queries × blocks) rows): the θ protocol re-reads each of them
    // in several jobs — seed collect, seed exact pass, survivor
    // filter, final exact pass — and without the cut every job re-runs
    // the sidecar aggregation and the doclen scan from parquet
    val dfLive = dfLive0.cutLineage()
    val stats = dlLive.agg(count(col("doc_id")).as("n_docs"),
      avg(col("dl")).cast("double").as("avgdl")).cutLineage()
    // per-(query, block) bound sums + per-block doc-count lower bound
    val qb = blocks.join(broadcast(dfLive), "term")
      .crossJoin(broadcast(stats))
      .select(col("term"), col("block_id"), col("n_rows"),
        Bm25.okapiTerm(col("max_tf"), col("df"), col("min_dl"),
          col("avgdl"), col("n_docs")).as("u"))
      .join(broadcast(qterms), "term")
      .groupBy(col("query_id"), col("block_id"))
      .agg(sum("u").as("usum"), max("n_rows").as("docs_lb"))
      .cutLineage()
    val wq = Window.partitionBy("query_id")
      .orderBy(col("usum").desc, col("block_id").asc)
    val seeds = qb
      .withColumn("rk", row_number().over(wq))
      .withColumn("cum_prev", coalesce(
        sum("docs_lb").over(wq.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .filter(col("rk") <= 64 && col("cum_prev") < k)
    val collectCap = MaxSurvivorRanges * 64
    val seedIds = seeds.select("block_id").distinct()
      .limit(collectCap + 1).collect().map(_.getLong(0)).toSeq
    def exactBatch(blockIds: Option[Seq[Long]]): DataFrame = {
      val base = postings.filter(col("term").isin(terms: _*))
      val pruned = blockIds match {
        case None => base
        case Some(ids) => base.filter(rangePredicate(ids))
      }
      Bm25.batchScoreFrom(pruned, dlLive, queries, k, Some(dfLive))
    }
    val candidates: Option[Seq[Long]] =
      if (seedIds.isEmpty) None // query terms absent: nothing to prune
      else if (seedIds.size > collectCap ||
        mergedRanges(seedIds).size > MaxSurvivorRanges) None
      else {
        // θ_q = the k-th best score among the seed-union docs for q;
        // a query with fewer than k scored docs stays unpruned (its
        // theta is NULL after the left join below)
        val thetas = exactBatch(Some(seedIds))
          .groupBy("query_id")
          .agg(count(lit(1)).as("n"), min("score").as("theta"))
          .filter(col("n") === k)
          .select("query_id", "theta")
        val surv = qb.join(broadcast(thetas), Seq("query_id"), "left")
          .filter(col("theta").isNull || col("usum") >= col("theta") - 1e-4)
          .select("block_id").distinct()
          .limit(collectCap + 1).collect().map(_.getLong(0)).toSeq
        if (surv.size > collectCap ||
          mergedRanges(surv).size > MaxSurvivorRanges) None
        else Some(surv)
      }
    exactBatch(candidates)
  }
}
