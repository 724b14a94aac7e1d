package graft.sources

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-tsv`: a DataSourceV2 batch source for the engine's own
  * per-document text export format (`doc_id \t text` lines with
  * backslash escaping of tab/newline/CR — see
  * [[Sinks.textExport]]; the scale-safe replacement for the
  * reference's one-file-per-doc output/{pid}.txt —
  * backup/BMStream.java:30-35). Demonstrates the engine's SOURCE and
  * SINK extension points end-to-end: TableProvider → ScanBuilder with
  * COLUMN-PRUNING pushdown → per-file input partitions → InternalRow
  * readers, and WriteBuilder (truncate-capable) → per-task hidden
  * temp files → driver-side rename commit.
  *
  * Scale shape: one InputPartition per file (the export writes many
  * splittable files, so parallelism = file count); column pruning is
  * honored at the reader, so `select(doc_id)` never materializes text.
  * The session's Hadoop configuration is captured at plan time and
  * shipped to the readers as entries, so object-store credentials and
  * endpoints (spark.hadoop.*) reach executor-side FileSystem
  * construction.
  *
  *   spark.read.format("graft-tsv").load(path)
  */
class TsvDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-tsv"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = TsvTable.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new TsvTable(properties.get("path"))
}

object TsvTable {
  val Schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = true)))

  /** [[Sinks.textExport]]'s escaping, writer-side: backslash first,
    * then tab/newline/CR — the exact inverse of [[unescape]]. */
  def escape(s: String): String = {
    var needs = false
    var i = 0
    while (i < s.length && !needs) {
      val c = s.charAt(i)
      needs = c == '\\' || c == '\t' || c == '\n' || c == '\r'
      i += 1
    }
    if (!needs) return s
    val sb = new java.lang.StringBuilder(s.length + 8)
    i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\\' => sb.append("\\\\")
        case '\t' => sb.append("\\t")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Reverse [[Sinks.textExport]]'s escaping in one linear scan. */
  def unescape(s: String): String = {
    if (s.indexOf('\\') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '\\' => sb.append('\\'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case _ => sb.append(c); i += 1
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** The active session's Hadoop conf as serializable entries. */
  def confEntries(): Seq[(String, String)] = {
    val it = SparkSession.active.sparkContext.hadoopConfiguration.iterator()
    val buf = Seq.newBuilder[(String, String)]
    while (it.hasNext) { val e = it.next(); buf += (e.getKey -> e.getValue) }
    buf.result()
  }

  def confFrom(entries: Seq[(String, String)]): Configuration = {
    val c = new Configuration(false)
    entries.foreach { case (k, v) => c.set(k, v) }
    c
  }
}

class TsvTable(path: String) extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-tsv($path)"
  override def schema(): StructType = TsvTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TsvScanBuilder(path)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new TsvWriteBuilder(path, info.schema())
}

/** Batch write through the connector — the sink side of the
  * extension point (the reference writes through connector sinks,
  * MongoTFSink.java:1-64; here the store is the engine's own escaped
  * TSV layout, so DSv2 write → DSv2 read round-trips losslessly).
  *
  * Commit protocol: every task writes a DOT-PREFIXED temp file (the
  * read path skips hidden files, so in-flight writes are invisible);
  * the driver-side commit renames the one winning attempt per
  * partition to its visible name — and, for truncate (SaveMode
  * .Overwrite), deletes the previous generation's visible files
  * first. Task retries/speculation are safe: only the attempt whose
  * commit message reaches BatchWrite.commit is renamed; losing
  * attempts of the SAME job are swept at the end of commit (by job
  * tag), and orphans of crashed earlier jobs (whose writers never
  * reached abort) are swept by the next truncate. */
class TsvWriteBuilder(path: String, schema: StructType)
  extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = {
    val names = schema.fields.map(f => f.name -> f.dataType).toSeq
    require(names == Seq("doc_id" -> LongType, "text" -> StringType),
      s"graft-tsv writes exactly (doc_id BIGINT, text STRING); got " +
        schema.fields.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", "))
    new TsvWrite(path, doTruncate)
  }
}

case class TsvCommitMessage(tmpFile: String, finalFile: String) extends WriterCommitMessage

class TsvWrite(path: String, doTruncate: Boolean) extends Write with BatchWrite {
  // job-unique suffix: APPEND generations must not collide on the
  // per-partition file name (same partition id, different job)
  private val jobTag = util.UUID.randomUUID().toString.take(8)
  override def toBatch: BatchWrite = this
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new TsvWriterFactory(path, jobTag, TsvTable.confEntries())
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(SparkSession.active.sparkContext.hadoopConfiguration)
    if (doTruncate && fs.exists(p))
      fs.listStatus(p).foreach { s =>
        val n = s.getPath.getName
        // truncate invalidates every prior generation — including
        // orphaned temp files of crashed earlier jobs (a killed
        // executor's writer never reaches abort, and its attempt never
        // delivers a commit message, so this is their only sweeper).
        // THIS job's temps are excluded: its tasks already wrote them
        // by the time commit runs, and the rename loop below needs them.
        if (s.isFile && ((!n.startsWith(".") && !n.startsWith("_")) ||
          (n.startsWith(".tmp-part-") && !n.startsWith(s".tmp-part-$jobTag-"))))
          fs.delete(s.getPath, false)
      }
    messages.foreach { case TsvCommitMessage(tmp, fin) =>
      val dst = new Path(fin)
      fs.delete(dst, false) // a stale same-name file must not block rename
      require(fs.rename(new Path(tmp), dst), s"commit rename failed: $tmp -> $fin")
    }
    // sweep THIS job's losing speculative/retried attempts (same tag;
    // other jobs' in-flight temps are left alone — appends may run
    // concurrently)
    if (fs.exists(p))
      fs.listStatus(p).foreach { s =>
        val n = s.getPath.getName
        if (s.isFile && n.startsWith(s".tmp-part-$jobTag-")) fs.delete(s.getPath, false)
      }
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(SparkSession.active.sparkContext.hadoopConfiguration)
    messages.foreach {
      case TsvCommitMessage(tmp, _) => fs.delete(new Path(tmp), false)
      case _ => ()
    }
  }
}

class TsvWriterFactory(path: String, jobTag: String, confEntries: Seq[(String, String)])
  extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      // hidden while in flight; the final name is (job, partition) —
      // one winner per partition per job reaches commit, and appended
      // generations never collide across jobs
      private val tmp = new Path(path, s".tmp-part-$jobTag-$partitionId-$taskId.tsv")
      private val fin = new Path(path, f"part-$jobTag-$partitionId%05d.tsv")
      private val fs = tmp.getFileSystem(TsvTable.confFrom(confEntries))
      private val out = fs.create(tmp, true)
      override def write(row: InternalRow): Unit = {
        // getLong on a NULL field returns 0 silently — fail loudly
        // like the rest of the connector's contract violations
        require(!row.isNullAt(0), "graft-tsv: doc_id must not be NULL " +
          "(the line format has no NULL representation for the key column)")
        val sb = new java.lang.StringBuilder
        sb.append(row.getLong(0))
        if (!row.isNullAt(1)) sb.append('\t').append(TsvTable.escape(row.getUTF8String(1).toString))
        sb.append('\n')
        out.write(sb.toString.getBytes("UTF-8"))
      }
      override def commit(): WriterCommitMessage = {
        out.close()
        TsvCommitMessage(tmp.toString, fin.toString)
      }
      override def abort(): Unit = { out.close(); fs.delete(tmp, false); () }
      override def close(): Unit = ()
    }
}

class TsvScanBuilder(path: String) extends ScanBuilder
  with SupportsPushDownRequiredColumns {
  private var required: StructType = TsvTable.Schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve source field order; an empty projection (count(*)) is legal
    required = StructType(TsvTable.Schema.fields.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))
  override def build(): Scan = new TsvScan(path, required)
}

class TsvScan(path: String, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(path)
    val fs = p.getFileSystem(SparkSession.active.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq
      .filter { s => // skip metadata/hidden/temp files, like Spark's own FileIndex
        val n = s.getPath.getName
        s.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
      .sortBy(_.getPath.toString)
      .map(s => TsvInputPartition(s.getPath.toString): InputPartition)
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new TsvReaderFactory(required, TsvTable.confEntries())
}

case class TsvInputPartition(file: String) extends InputPartition

class TsvReaderFactory(required: StructType, confEntries: Seq[(String, String)])
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[TsvInputPartition].file
    new PartitionReader[InternalRow] {
      private val p = new Path(file)
      private val in = p.getFileSystem(TsvTable.confFrom(confEntries)).open(p)
      private val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      private var row: InternalRow = _
      override def next(): Boolean = {
        if (!lines.hasNext) return false
        val line = lines.next()
        val tab = line.indexOf('\t')
        val (id, text) =
          if (tab < 0) (line.toLong, null)
          else (line.substring(0, tab).toLong, TsvTable.unescape(line.substring(tab + 1)))
        row = InternalRow.fromSeq(required.fields.toSeq.map(_.name match {
          case "doc_id" => id
          case "text" => if (text == null) null else UTF8String.fromString(text)
        }))
        true
      }
      override def get(): InternalRow = row
      override def close(): Unit = in.close()
    }
  }
}
