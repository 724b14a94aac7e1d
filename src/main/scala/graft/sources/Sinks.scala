package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Engine sinks. The reference's sinks are MongoDB keyed upserts
  * (MongoTFSink.java; BatchBM25PreMain.java:106-122 for the global IDF
  * collection) and per-document text files (backup/BMStream.java:30-35).
  * In a shared-nothing engine a mutable-store upsert becomes a
  * merge-rewrite: union the update batch with the stored table, keep
  * the latest version per key, atomically swap the result in. One
  * shuffle on the key; at 100 TB the store would be key-partitioned so
  * the merge rewrites only touched partitions.
  */
object Sinks {

  /** Merge `updates` into the parquet table at `path`, last-wins per
    * `keyCols` ordered by `versionCol` (desc; then any `tieCols` desc,
    * then a stable row hash so replayed batches converge
    * deterministically) — the distributed analogue of
    * findOneAndUpdate(upsert=true). Pass the domain's own tiebreaker
    * (e.g. an event id) as `tieCols` when version collisions are
    * possible and the surviving row must match a declarative
    * last-wins query; the row hash is only the arbitrary-but-stable
    * last resort.
    *
    * Swap protocol: write staging → move current table aside → rename
    * staging in → drop the old copy. A crash mid-swap leaves either
    * the old table, or the old table under `.__old` (recoverable) —
    * never zero copies of the data. */
  def upsertParquet(spark: SparkSession, updates: DataFrame, path: String,
                    keyCols: Seq[String], versionCol: String,
                    tieCols: Seq[String] = Nil): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dest = new Path(path)
    val merged =
      if (fs.exists(dest)) spark.read.parquet(path).unionByName(updates) else updates
    val rowHash = xxhash64(merged.columns.map(col): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc +: tieCols.map(col(_).desc) :+ rowHash.asc: _*)
    val latest = merged
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val tmp = new Path(path + ".__staging")
    val old = new Path(path + ".__old")
    fs.delete(tmp, true)
    latest.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    fs.delete(old, true)
    if (fs.exists(dest) && !fs.rename(dest, old))
      throw new java.io.IOException(s"could not move current table aside for $path")
    if (!fs.rename(tmp, dest))
      throw new java.io.IOException(s"swap failed for $path; previous data at $old")
    fs.delete(old, true)
  }

  /** Keyed last-wins upsert into a PARTITIONED parquet store: the
    * 100 TB form of [[upsertParquet]]. Only partitions present in the
    * update batch are read, merged and rewritten (dynamic partition
    * overwrite); untouched partitions are never opened. The merge cost
    * scales with the touched partitions, not the store size — the
    * property the flat-table upsert lacks. `partitionCol` must be
    * functionally dependent on the key (same key → same partition) or
    * a key could survive in two partitions. */
  def upsertPartitionedParquet(spark: SparkSession, updates: DataFrame, path: String,
                               keyCols: Seq[String], versionCol: String,
                               partitionCol: String, tieCols: Seq[String] = Nil): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val touched = updates.select(col(partitionCol)).distinct().collect().map(_.get(0))
    // isin() never matches null, but dynamic overwrite still rewrites the
    // null partition when the batch touches it — so the null partition's
    // existing rows must join the merge explicitly or they are lost
    val touchedPred = {
      val nonNull = touched.filter(_ != null)
      val base = if (nonNull.isEmpty) lit(false) else col(partitionCol).isin(nonNull: _*)
      if (touched.contains(null)) base || col(partitionCol).isNull else base
    }
    val merged =
      if (fs.exists(new Path(path))) {
        val existing = spark.read.parquet(path)
          .filter(touchedPred)
        existing.unionByName(updates.select(existing.columns.map(col): _*))
      } else updates
    val rowHash = xxhash64(merged.columns.map(col): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc +: tieCols.map(col(_).desc) :+ rowHash.asc: _*)
    val latest = merged
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    try {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      latest.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(path)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Hive-style partitioned parquet layout (`path/col=value/...`).
    * The 100 TB ingest contract: partition by a low-cardinality scan
    * predicate (source, date) so downstream queries touch only
    * matching directories — partition PRUNING, stronger than row-group
    * filter pushdown because unmatched files are never opened. Proven
    * by IoSpec: a filtered read shows the predicate under
    * `PartitionFilters` and scans a subset of files. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  /** Compact a parquet directory in place: rewrite into
    * ceil(rows / rowsPerFile) files. The small-files problem is the
    * chronic failure mode of streaming/upsert sinks at scale (every
    * micro-batch appends files; a million 10 KB files kill any later
    * scan's task scheduling) — periodic compaction is part of the sink
    * contract, not an afterthought. Same swap protocol as
    * [[upsertParquet]]: never zero copies on disk. */
  def compact(spark: SparkSession, path: String, rowsPerFile: Long = 1000000L): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val df = spark.read.parquet(path)
    val nFiles = math.max(1L, (df.count() + rowsPerFile - 1) / rowsPerFile).toInt
    val tmp = new Path(path + ".__staging")
    val old = new Path(path + ".__old")
    fs.delete(tmp, true)
    df.repartition(nFiles).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    fs.delete(old, true)
    if (!fs.rename(new Path(path), old))
      throw new java.io.IOException(s"could not move current table aside for $path")
    if (!fs.rename(tmp, new Path(path)))
      throw new java.io.IOException(s"swap failed for $path; previous data at $old")
    fs.delete(old, true)
  }

  /** Per-document text export (the ref writes output/{pid}.txt; at
    * scale one-file-per-doc is an anti-pattern, so the engine writes
    * `doc_id \t payload` lines, splittable and partition-parallel).
    * String payloads are ESCAPED (backslash, tab, newline, CR) so a
    * document containing the delimiter or a line break still occupies
    * exactly one physical line — the reader ([[TsvDataSource]])
    * reverses the escaping. */
  def textExport(df: DataFrame, path: String): Unit = {
    val cols = df.schema.fields.map { f =>
      if (f.dataType == org.apache.spark.sql.types.StringType)
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          col(f.name), "\\\\", "\\\\\\\\"), "\t", "\\\\t"), "\n", "\\\\n"), "\r", "\\\\r")
      else col(f.name)
    }
    df.select(concat_ws("\t", cols: _*).as("value"))
      .write.mode(SaveMode.Overwrite).text(path)
  }

  /** Hive-style partitioned layout: one directory per `partitionCol`
    * value. At 100 TB this is the FIRST line of defense — a predicate
    * on the partition column prunes whole directories before any file
    * is opened (`PartitionFilters` in the scan, vs `PushedFilters`
    * which still reads footers). Choose a low-cardinality, frequently-
    * filtered column (language, source, date); high-cardinality
    * partition keys shatter the table into tiny files. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(path)
}
