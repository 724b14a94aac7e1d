package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window

import graft.Lineage._
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

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Last-wins dedup per `keyCols`, ordered by `versionCol` desc, then
    * `tieCols` desc, then a stable row hash (arbitrary-but-stable last
    * resort so replayed batches converge deterministically). Shared by
    * the flat and partitioned upserts — ONE definition of the merge
    * semantics. */
  private def latestPerKey(merged: DataFrame, keyCols: Seq[String],
                           versionCol: String, tieCols: Seq[String]): DataFrame = {
    val rowHash = xxhash64(merged.columns.map(col): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc +: tieCols.map(col(_).desc) :+ rowHash.asc: _*)
    merged
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Recover from a crash that happened mid-swap: the protocol's only
    * zero-`dest` window is between rename(dest → __old) and
    * rename(__staging → dest), so dest-missing + __old-present means
    * exactly that — restore the old table FIRST. Without this, a
    * retried upsert would see no destination, merge against nothing,
    * and then delete __old: silent total loss of the store. */
  private def recoverSwap(fs: FileSystem, path: String): Unit = {
    val dest = new Path(path)
    val old = new Path(path + ".__old")
    if (!fs.exists(dest) && fs.exists(old)) {
      if (!fs.rename(old, dest))
        throw new java.io.IOException(s"crash recovery failed: could not restore $old to $path")
    }
  }

  /** Never-zero-copies table swap: `write` the replacement into
    * `.__staging`, move the current table to `.__old`, rename staging
    * in, drop old. A crash leaves the old table either in place or
    * under `.__old` — [[recoverSwap]] (run on entry here AND by every
    * upsert before it reads) restores the latter. Shared by the flat
    * upsert and [[compact]]. */
  private def atomicSwap(fs: FileSystem, path: String)(write: String => Unit): Unit = {
    recoverSwap(fs, path)
    val dest = new Path(path)
    val tmp = new Path(path + ".__staging")
    val old = new Path(path + ".__old")
    fs.delete(tmp, true)
    write(tmp.toString)
    fs.delete(old, true)
    if (fs.exists(dest) && !fs.rename(dest, old))
      throw new java.io.IOException(s"could not move current table aside for $path")
    if (!fs.rename(tmp, dest))
      throw new java.io.IOException(s"swap failed for $path; previous data at $old")
    fs.delete(old, true)
    ()
  }

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
    * Swap protocol: [[atomicSwap]] — never zero copies on disk, and a
    * crash mid-swap is repaired before the next merge reads. */
  def upsertParquet(spark: SparkSession, updates: DataFrame, path: String,
                    keyCols: Seq[String], versionCol: String,
                    tieCols: Seq[String] = Nil): Unit = {
    val fs = fsOf(spark, path)
    recoverSwap(fs, path) // BEFORE the read below, or a retry merges against nothing
    val dest = new Path(path)
    val merged =
      if (fs.exists(dest)) spark.read.parquet(path).unionByName(updates) else updates
    val latest = latestPerKey(merged, keyCols, versionCol, tieCols)
    atomicSwap(fs, path)(tmp => latest.write.mode(SaveMode.Overwrite).parquet(tmp))
  }

  /** Keyed last-wins upsert into a PARTITIONED parquet store: the
    * 100 TB form of [[upsertParquet]]. Only partitions present in the
    * update batch are read, merged and rewritten (dynamic partition
    * overwrite); untouched partitions are never opened. The merge cost
    * scales with the touched partitions, not the store size — the
    * property the flat-table upsert lacks. `partitionCol` must be
    * functionally dependent on the key (same key → same partition) or
    * a key could survive in two partitions.
    *
    * Durability trade, stated plainly: dynamic overwrite commits
    * per-partition (delete dir, move staged dir in), so a crash inside
    * the commit can lose a touched partition's PRIOR rows — weaker
    * than the flat sink's never-zero-copies swap, and a batch replay
    * cannot restore them (the merge would read the emptied partition).
    * At 100 TB the full-table swap is not an option; the transactional
    * answer is a manifest/commit log over immutable files — the
    * [[DeltaStore]] protocol the search indexes use. */
  def upsertPartitionedParquet(spark: SparkSession, updates: DataFrame, path: String,
                               keyCols: Seq[String], versionCol: String,
                               partitionCol: String, tieCols: Seq[String] = Nil): Unit = {
    val fs = fsOf(spark, path)
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
        val existing = spark.read.parquet(path).filter(touchedPred)
        // loud on schema drift: silently projecting away an
        // updates-only column would discard its data on every batch
        // (the flat sink's unionByName throws on the same mismatch)
        val extra = updates.columns.toSet -- existing.columns.toSet
        require(extra.isEmpty,
          s"update batch carries columns ${extra.mkString(", ")} absent from the " +
            "store — merging would silently drop them; evolve the store first")
        existing.unionByName(updates.select(existing.columns.map(col): _*))
      } else updates
    val latest = latestPerKey(merged, keyCols, versionCol, tieCols)
    // per-write option, NOT session conf: mutating the session's
    // partitionOverwriteMode races concurrent writers — a static-mode
    // overwrite deletes every untouched partition
    latest.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol).parquet(path)
  }

  /** Hive-style partitioned parquet layout (`path/col=value/...`).
    * The 100 TB ingest contract: partition by a low-cardinality scan
    * predicate (source, date) so downstream queries touch only
    * matching directories — partition PRUNING, stronger than row-group
    * filter pushdown because unmatched files are never opened (the
    * predicate shows under `PartitionFilters`, proven by IoSpec).
    * High-cardinality partition keys shatter the table into tiny
    * files. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  /** Single-column convenience overload of [[writePartitioned]]. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    writePartitioned(df, path, Seq(partitionCol))

  /** Compact an UNPARTITIONED parquet directory in place: rewrite into
    * ceil(rows / rowsPerFile) files. The small-files problem is the
    * chronic failure mode of streaming/upsert sinks at scale (every
    * micro-batch appends files; a million 10 KB files kill any later
    * scan's task scheduling) — periodic compaction is part of the sink
    * contract, not an afterthought. Same swap protocol as
    * [[upsertParquet]]: never zero copies on disk. Hive-partitioned
    * stores are REJECTED: a naive read-rewrite would flatten the
    * `col=value` directories into data columns, destroying partition
    * pruning for every downstream reader (compact each partition
    * directory individually instead). */
  def compact(spark: SparkSession, path: String, rowsPerFile: Long = 1000000L): Unit = {
    val fs = fsOf(spark, path)
    // BEFORE the layout probe and the read: a predecessor that crashed
    // mid-swap left the table only under .__old, and atomicSwap's own
    // recovery runs too late to save the spark.read below from "path
    // does not exist" (no data loss, but compact would fail on every
    // retry until some upsert happened to repair the store)
    recoverSwap(fs, path)
    val partitioned = fs.exists(new Path(path)) &&
      fs.listStatus(new Path(path)).exists(s => s.isDirectory && s.getPath.getName.contains("="))
    require(!partitioned,
      s"$path holds a Hive-partitioned layout; compacting it flat would destroy " +
        "the partition directories — compact each partition dir instead")
    val df = spark.read.parquet(path)
    val nFiles = math.max(1L, (df.count() + rowsPerFile - 1) / rowsPerFile).toInt
    atomicSwap(fs, path)(tmp =>
      df.repartition(nFiles).write.mode(SaveMode.Overwrite).parquet(tmp))
  }

  /** Per-document text export (the ref writes output/{pid}.txt; at
    * scale one-file-per-doc is an anti-pattern, so the engine writes
    * `doc_id \t payload` lines, splittable and partition-parallel).
    * String payloads are ESCAPED (backslash, tab, newline, CR) so a
    * document containing the delimiter or a line break still occupies
    * exactly one physical line — the reader ([[TsvDataSource]])
    * reverses the escaping. Contract guards: columns must be atomic
    * (an array's elements would be joined UNESCAPED, breaking the
    * one-line invariant), and only the LAST column may hold NULLs —
    * concat_ws drops null fields, which round-trips for a trailing
    * field (the reader maps the missing field back to null) but would
    * silently shift every later field out of position anywhere else. */
  def textExport(df: DataFrame, path: String): Unit = {
    import org.apache.spark.sql.types.{ArrayType, MapType, StringType, StructType}
    df.schema.fields.foreach { f =>
      val bad = f.dataType.isInstanceOf[ArrayType] ||
        f.dataType.isInstanceOf[MapType] || f.dataType.isInstanceOf[StructType]
      require(!bad, s"textExport: column ${f.name} has non-atomic type " +
        s"${f.dataType.simpleString} — its elements would be joined unescaped")
    }
    val nonLast = df.columns.dropRight(1)
    if (nonLast.nonEmpty) {
      val nBad = df.filter(nonLast.map(c => col(c).isNull).reduce(_ || _)).limit(1).count()
      require(nBad == 0,
        s"textExport: NULL in a non-last column (${nonLast.mkString(", ")}) would " +
          "shift every following field out of position on the line")
    }
    val cols = df.schema.fields.map { f =>
      if (f.dataType == StringType)
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          col(f.name), "\\\\", "\\\\\\\\"), "\t", "\\\\t"), "\n", "\\\\n"), "\r", "\\\\r")
      else col(f.name)
    }
    df.select(concat_ws("\t", cols: _*).as("value"))
      .write.mode(SaveMode.Overwrite).text(path)
  }

  /** One-file-per-key sink — the literal layout of the reference's
    * per-document output (backup/BMStream.java:30-35 writes
    * `output/{pid}.txt` per doc; the 50 files in the reference repo's
    * output/ are its product). Each row lands as `<id>.txt` under
    * `path`, written task-parallel by `foreachPartition` with a
    * streaming iterator (bounded executor memory) and
    * `create(overwrite)` on a deterministic name+content — a retried
    * task rewrites identical files, so the sink is idempotent.
    *
    * SMALL-FILES HONESTY: one object per document is the classic
    * metadata pathology (the q_source_binary ingest measures it, the
    * compacted layouts cure it) — this sink exists for bounded
    * per-doc artifact handoffs, NOT corpus dumps, and REFUSES above
    * `maxFiles` rather than melting the namenode; export corpus-scale
    * text through [[textExport]]/parquet and compact instead.
    *
    * Guards (all single bounded jobs): row count ≤ maxFiles, ids
    * unique (a duplicate would silently last-write-win), ids
    * filename-safe (`[A-Za-z0-9._-]+`, no "."/".."; escaping or
    * hashing here would silently alias distinct keys — the caller
    * sanitizes explicitly or not at all). Returns the file count. */
  def perDocFiles(df: DataFrame, path: String, idCol: String = "doc_id",
                  textCol: String = "text", maxFiles: Long = 100000L): Long = {
    // cut once: the guard aggregation AND the write both consume this
    // relation, and its upstream is typically a full tokenize+profile
    // chain (Bm25.tfProfiles) — without the cut that chain runs twice
    // per call (and per micro-batch on the streaming path)
    val rows = df.select(col(idCol).cast("string").as("id"),
      col(textCol).cast("string").as("txt")).cutLineage()
    val stats = rows.agg(count(lit(1)).as("n"),
      countDistinct(col("id")).as("d"),
      sum(when(col("id").rlike("^[A-Za-z0-9._-]+$") &&
        !col("id").isin(".", ".."), 0).otherwise(1)).as("unsafe")).head()
    val (n, d, unsafe) = (stats.getLong(0), stats.getLong(1),
      if (stats.isNullAt(2)) 0L else stats.getLong(2))
    require(n <= maxFiles,
      s"perDocFiles: $n rows exceeds maxFiles=$maxFiles — a corpus-scale " +
        "per-doc dump is a small-files anti-pattern; use textExport/parquet + compact")
    require(n == d, s"perDocFiles: ids are not unique ($n rows, $d distinct) — " +
      "duplicates would silently last-write-win")
    require(unsafe == 0L,
      s"perDocFiles: $unsafe ids are not filename-safe ([A-Za-z0-9._-]+)")
    val dir = path
    rows.foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
      if (it.hasNext) {
        val root = new Path(dir)
        val fs = root.getFileSystem(new org.apache.hadoop.conf.Configuration())
        fs.mkdirs(root)
        it.foreach { r =>
          val out = fs.create(new Path(root, s"${r.getString(0)}.txt"), true)
          try out.write(Option(r.getString(1)).getOrElse("").getBytes("UTF-8"))
          finally out.close()
        }
      }
    }
    n
  }
}
