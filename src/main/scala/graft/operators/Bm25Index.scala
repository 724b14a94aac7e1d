package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Materialized inverted index: the product shape of the reference
  * pipeline, which precomputes TF per document and global IDF into
  * MongoDB collections (MongoTFSink.java, BatchBM25PreMain.java:
  * 106-122) and serves queries from the store. Here the store is
  * parquet:
  *
  *   <path>/postings  (term, doc_id, tf)  — repartitioned + sorted by
  *                    term so a query's term predicate prunes row
  *                    groups (min/max stats) instead of scanning
  *   <path>/doclen    (doc_id, dl)
  *   <path>/stats     (n_docs, avgdl)     — one row
  *
  * Build cost: ONE corpus pass (postings), then doclen/stats derive
  * from the files just written, never from the raw corpus. Query cost:
  * NO corpus pass at all — a pushed-down postings scan for the query
  * terms, one shuffle join against doclen, a broadcast of (df, stats).
  * That asymmetry (build once, query cheap) is what an inverted index
  * is for, and it holds at 100 TB: postings are term-clustered, so a
  * 4-term query touches a handful of row groups per file.
  */
object Bm25Index {

  def build(docs: DataFrame, path: String): Unit = {
    val tf = Bm25.tf(docs)
    tf.repartition(col("term")).sortWithinPartitions("term", "doc_id")
      .write.mode(SaveMode.Overwrite).parquet(s"$path/postings")
    // doclen derives from the postings just written (no second corpus
    // pass), and stats from the written doclen (no third)
    val spark = docs.sparkSession
    spark.read.parquet(s"$path/postings")
      .groupBy("doc_id").agg(sum("tf").as("dl"))
      .write.mode(SaveMode.Overwrite).parquet(s"$path/doclen")
    spark.read.parquet(s"$path/doclen")
      .agg(count(col("doc_id")).as("n_docs"), avg(col("dl")).cast("double").as("avgdl"))
      .write.mode(SaveMode.Overwrite).parquet(s"$path/stats")
  }

  /** Incrementally ingest a NEW document batch into a staged index:
    * the batch's postings and doc lengths are computed from the batch
    * alone and APPENDED (delta files are term-clustered like the base
    * build, so query-term pruning still works); only the one-row stats
    * table is recomputed, from doclen — doc-cardinality, never the
    * corpus. Work scales with the batch, not the store — the property
    * that makes a 100 TB index maintainable (the reference re-runs its
    * whole pipeline per corpus change; a per-doc Mongo upsert has the
    * same batch-scaled cost, this is its shared-nothing analogue).
    * Re-ingesting an existing doc_id is REJECTED (appending would
    * double-count its postings); replacement requires a keyed upsert
    * of the doc's postings partition or a rebuild. Delta files
    * accumulate per batch; [[graft.sources.Sinks.compact]] is the
    * companion maintenance pass. */
  def update(newDocs: DataFrame, path: String): Unit = {
    val spark = newDocs.sparkSession
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // bootstrap: the first batch of a streaming ingest IS the build
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$path/doclen"))) {
      val existing = spark.read.parquet(s"$path/doclen").select(col("doc_id"))
      val nDup = newDocs.select("doc_id").join(existing, Seq("doc_id"), "left_semi").count()
      require(nDup == 0,
        s"update batch re-ingests $nDup existing doc_ids; append-only maintenance " +
          "would double-count their postings — upsert or rebuild instead")
    }
    val tf = Bm25.tf(newDocs)
    tf.repartition(col("term")).sortWithinPartitions("term", "doc_id")
      .write.mode(SaveMode.Append).parquet(s"$path/postings")
    tf.groupBy("doc_id").agg(sum("tf").as("dl"))
      .write.mode(SaveMode.Append).parquet(s"$path/doclen")
    spark.read.parquet(s"$path/doclen")
      .agg(count(col("doc_id")).as("n_docs"), avg(col("dl")).cast("double").as("avgdl"))
      .write.mode(SaveMode.Overwrite).parquet(s"$path/stats")
  }

  /** Okapi BM25 over the staged index — matches Bm25.bm25Score on the
    * same corpus exactly (same formula, rounding, tie-breaks). */
  def score(spark: SparkSession, path: String,
            queryTerms: Seq[String] = Bm25.QueryTerms): DataFrame = {
    val tfq = spark.read.parquet(s"$path/postings")
      .filter(col("term").isin(queryTerms: _*)) // pushed to the scan
    val dl = spark.read.parquet(s"$path/doclen")
    val stats = spark.read.parquet(s"$path/stats")
    val scored = tfq
      .withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        (log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * lit(Bm25.K1 + 1.0)) /
          (col("tf") + lit(Bm25.K1) * (lit(1.0 - Bm25.B) + lit(Bm25.B) * col("dl") / col("avgdl")))).as("c"))
    scored.groupBy("doc_id").agg(round(sum("c"), 4).as("score"))
  }

  def searchTopN(spark: SparkSession, path: String,
                 queryTerms: Seq[String] = Bm25.QueryTerms, n: Int = 10): DataFrame =
    score(spark, path, queryTerms).orderBy(col("score").desc, col("doc_id").asc).limit(n)
}
