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
    if (deltas.nonEmpty && !batchEmpty)
      DeltaStore.rejectDuplicateIds(spark,
        DeltaStore.overlappingDeltas(DeltaStore.fsOf(spark, path), deltas, batchLo, batchHi),
        "doclen", "doc_id", newDocs, "postings")
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

  /** Fold all committed deltas into ONE delta (small-files
    * maintenance: a long-running ingest accumulates a delta dir per
    * batch, and scan task scheduling degrades with file count). The
    * merged postings/doclen are staged and committed with the same
    * single-rename protocol; the old deltas are then removed. Requires
    * a single-writer maintenance window (no concurrent update/score —
    * the brief gap between committing the merged delta and removing
    * the old ones would double-count for a concurrent reader). */
  def compactDeltas(spark: SparkSession, path: String): Unit =
    DeltaStore.compact(spark, path) { (deltas, staging) =>
      spark.read.parquet(deltas.map(d => s"$d/postings"): _*)
        .repartition(col("term")).sortWithinPartitions("term", "doc_id")
        .write.parquet(s"$staging/postings")
      spark.read.parquet(deltas.map(d => s"$d/doclen"): _*)
        .write.parquet(s"$staging/doclen")
    }

  /** Okapi BM25 over the staged index — matches Bm25.bm25Score on the
    * same corpus exactly (same formula, rounding, tie-breaks). */
  def score(spark: SparkSession, path: String,
            queryTerms: Seq[String] = Bm25.QueryTerms): DataFrame = {
    val deltas = committedDeltas(spark, path)
    require(deltas.nonEmpty, s"no committed deltas under $path")
    val tfq = spark.read.parquet(deltas.map(d => s"$d/postings"): _*)
      .filter(col("term").isin(queryTerms: _*)) // pushed to the scan
    val dl = spark.read.parquet(deltas.map(d => s"$d/doclen"): _*)
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
    val tf = spark.read.parquet(deltas.map(d => s"$d/postings"): _*)
    val dl = spark.read.parquet(deltas.map(d => s"$d/doclen"): _*)
    Bm25.batchScoreFrom(tf, dl, queries, k)
  }
}
