package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
    else Some(spark.read.parquet(present.map(d => s"$d/$sub"): _*))
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
    val ids = docIds.select(col("doc_id")).distinct().localCheckpoint()
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
        else ids.join(spark.read.parquet(candidates.map(d => s"$d/doclen"): _*)
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
      ids.write.mode(SaveMode.Overwrite).parquet(s"$staging/tombstones")
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
      postings
        .repartition(col("term")).sortWithinPartitions("term", "doc_id")
        .write.parquet(s"$staging/postings")
      doclen.write.parquet(s"$staging/doclen")
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
    val visible = committedDeltas(spark, path).filter { d =>
      new org.apache.hadoop.fs.Path(d).getName.stripPrefix("delta-") <= maxTag
    }
    require(visible.nonEmpty,
      s"no committed deltas at or before version $maxTag under $path " +
        "(compaction may have collapsed that history)")
    scoreDeltas(spark, visible, queryTerms)
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

  /** (query_id, doc_id, score, rk): BM25 top-k for a TABLE of queries
    * served from the staged index — the reference's serving loop
    * (query in, Mongo TF/IDF lookups, score) as one plan with NO
    * corpus pass: the postings scan is pruned to the queries' terms,
    * doclen joins once, and the scoring stage is shared with the
    * corpus-derived [[Bm25.batchSearch]] so both routes return
    * identical rows. */
  def batchSearch(spark: SparkSession, path: String,
                  queries: DataFrame, k: Int = 10): DataFrame = {
    val deltas = committedDeltas(spark, path)
    require(deltas.nonEmpty, s"no committed deltas under $path")
    val (tf, dl) = liveIndex(spark, deltas)
    Bm25.batchScoreFrom(tf, dl, queries, k)
  }
}
