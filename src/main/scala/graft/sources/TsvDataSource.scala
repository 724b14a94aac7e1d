package graft.sources

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-tsv`: a DataSourceV2 batch source for the engine's own
  * per-document text export format (`doc_id \t text` lines with
  * backslash escaping of tab/newline/CR — see
  * [[Sinks.textExport]]; the scale-safe replacement for the
  * reference's one-file-per-doc output/{pid}.txt —
  * backup/BMStream.java:30-35). Demonstrates the engine's SOURCE
  * extension point end-to-end: TableProvider → ScanBuilder with
  * COLUMN-PRUNING pushdown → per-file input partitions → InternalRow
  * readers.
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

class TsvTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft-tsv($path)"
  override def schema(): StructType = TsvTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TsvScanBuilder(path)
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
