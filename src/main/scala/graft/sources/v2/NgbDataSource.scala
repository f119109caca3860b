package graft.sources.v2

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.sources.{NgbSource, PyJsonParser}

/** DataSource V2 for the Netzsch `.ngb` binary format — the scale
  * path for S7 (SURVEY.md §2.1, §4): `spark.read.format("ngb")
  * .load(dirOrFile)` fans one PartitionReader out per file on the
  * executors, and REQUIRED-COLUMN PUSHDOWN prunes undecoded channels
  * (mirroring the reference's column_map selection,
  * netzsch_sta_ngb_parser.py:19-34): a query selecting two channels
  * decodes two channels, not fourteen.
  *
  * Channels are named by their own header (NgbSource aligned mode) —
  * truthful names are a prerequisite for pruning; the bug-for-bug
  * reference parity mode stays available on the driver API.
  */
class NgbDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "ngb"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val files = NgbDataSource.resolveFiles(
      Option(options.get("path")), Option(options.get("paths")))
    // Schema comes from the FIRST file; all listed files must share a
    // channel layout (one instrument family per load). Readers null-pad
    // a file whose channel set is narrower, but a file with different
    // channel NAMES should be loaded separately.
    NgbDataSource.schemaOf(files.head)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new NgbTable(schema, NgbDataSource.resolveFiles(
      Option(properties.get("path")), Option(properties.get("paths"))))
}

object NgbDataSource {
  /** `load(p)` arrives as option "path"; `load()`/`load(p1, p2, …)`
    * arrive as option "paths", a JSON string array. The previous
    * path-only read NPE'd on multi-path loads. */
  private[v2] def resolveFiles(path: Option[String],
                               paths: Option[String]): Seq[String] = {
    val roots: Seq[String] = path.map(Seq(_)).getOrElse {
      val arr = paths.getOrElse(throw new IllegalArgumentException(
        "ngb: no path given — use spark.read.format(\"ngb\").load(<fileOrDir>)"))
      PyJsonParser.parse(arr) match {
        case graft.functions.JArr(items) => items.collect {
          case graft.functions.JStr(s) => s }
        case _ => throw new IllegalArgumentException(
          s"ngb: unparseable paths option: $arr")
      }
    }
    require(roots.nonEmpty,
      "ngb: no path given — use spark.read.format(\"ngb\").load(<fileOrDir>)")
    val files = roots.flatMap(listFiles)
    require(files.nonEmpty, "ngb: no .ngb-ss3/.ngb-bs3 files under path")
    files
  }

  private[v2] def listFiles(path: String): Seq[String] = {
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.isDirectory(p)) {
      val s = java.nio.file.Files.list(p)
      try s.iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
        .asScala.map(_.toString)
        .filter(f => f.endsWith(".ngb-ss3") || f.endsWith(".ngb-bs3"))
        .toSeq.sorted
      finally s.close()
    } else Seq(p.toString)
  }

  private implicit class IterOps[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }

  private[v2] def schemaOf(file: String): StructType =
    StructType(NgbSource.channelColumns(file).map(n =>
      StructField(n, DoubleType)))
}

class NgbTable(schema: StructType, files: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"ngb(${files.size} files)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new NgbScanBuilder(schema, files)
}

class NgbScanBuilder(fullSchema: StructType, files: Seq[String])
  extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new NgbScan(required, files)
}

class NgbScan(requiredSchema: StructType, files: Seq[String]) extends Scan with Batch {
  override def readSchema(): StructType = requiredSchema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    files.map(f => NgbInputPartition(f, requiredSchema.fieldNames): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new NgbReaderFactory
}

case class NgbInputPartition(file: String, columns: Array[String]) extends InputPartition

class NgbReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[NgbInputPartition]
    new NgbPartitionReader(p.file, p.columns)
  }
}

/** Per-file reader: decodes ONLY the requested channels. */
class NgbPartitionReader(file: String, columns: Array[String])
  extends PartitionReader[InternalRow] {

  private val cols: Map[String, Seq[Double]] =
    // empty required schema (e.g. count(*)) still needs the row count:
    // decode everything to establish the frame height
    (if (columns.isEmpty) NgbSource.channelData(file, (_: String) => true)
    else NgbSource.channelData(file, columns.toSet)).toMap
  private val height: Int = cols.values.headOption.map(_.length).getOrElse(0)
  private val ordered: Array[Seq[Double]] =
    columns.map(c => cols.getOrElse(c, Seq.empty))
  private var i = -1

  override def next(): Boolean = { i += 1; i < height }

  override def get(): InternalRow =
    new GenericInternalRow(ordered.map(col =>
      if (i < col.length) (col(i): Any) else null).toArray)

  override def close(): Unit = ()
}
