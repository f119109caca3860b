package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, RandomAccessFile}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import org.apache.parquet.format.{KeyValue, Util}

/** Post-write parquet footer surgery: add table-level key-value
  * metadata to finished parquet files.
  *
  * The reference embeds `file_metadata`/`type` in the Arrow schema's
  * key-value metadata, which pyarrow persists into the parquet footer
  * (util.py:56-71) — a consumer reading by footer key must find the
  * same entries in our output. Spark exposes no API for custom footer
  * key-value entries, so the sink rewrites the footer after the fact:
  * a parquet file ends with `[footer thrift][4-byte LE length][PAR1]`
  * and the footer only references row-group offsets EARLIER in the
  * file, so replacing the tail with a re-serialized footer (same row
  * groups, extended key_value_metadata) is a safe, data-free edit.
  */
object ParquetFooter {

  private val Magic = "PAR1".getBytes(StandardCharsets.US_ASCII)

  /** Add (or replace) key-value entries in one parquet file's footer. */
  def addKeyValue(file: String, entries: Seq[(String, String)]): Unit = {
    val raf = new RandomAccessFile(file, "rw")
    try {
      val len = raf.length()
      require(len > 12, s"$file: too short to be parquet")
      val tail = new Array[Byte](8)
      raf.seek(len - 8); raf.readFully(tail)
      require(tail.slice(4, 8).sameElements(Magic), s"$file: no PAR1 magic")
      val footerLen = ByteBuffer.wrap(tail, 0, 4)
        .order(ByteOrder.LITTLE_ENDIAN).getInt
      val footerStart = len - 8 - footerLen
      require(footerStart >= 4, s"$file: bad footer length $footerLen")
      val footer = new Array[Byte](footerLen)
      raf.seek(footerStart); raf.readFully(footer)
      val fmd = Util.readFileMetaData(new ByteArrayInputStream(footer))
      entries.foreach { case (k, v) =>
        if (fmd.isSetKey_value_metadata)
          fmd.getKey_value_metadata.removeIf(_.getKey == k)
        val kv = new KeyValue(k)
        kv.setValue(v)
        fmd.addToKey_value_metadata(kv)
      }
      val out = new ByteArrayOutputStream()
      Util.writeFileMetaData(fmd, out)
      val newFooter = out.toByteArray
      raf.seek(footerStart)
      raf.write(newFooter)
      val lenBuf = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(newFooter.length).array()
      raf.write(lenBuf)
      raf.write(Magic)
      raf.setLength(footerStart + newFooter.length + 8)
    } finally raf.close()
  }

  /** Read a parquet file's footer key-value metadata. */
  def readKeyValue(file: String): Map[String, String] = {
    val raf = new RandomAccessFile(file, "r")
    try {
      val len = raf.length()
      val tail = new Array[Byte](8)
      raf.seek(len - 8); raf.readFully(tail)
      require(tail.slice(4, 8).sameElements(Magic), s"$file: no PAR1 magic")
      val footerLen = ByteBuffer.wrap(tail, 0, 4)
        .order(ByteOrder.LITTLE_ENDIAN).getInt
      val footer = new Array[Byte](footerLen)
      raf.seek(len - 8 - footerLen); raf.readFully(footer)
      val fmd = Util.readFileMetaData(new ByteArrayInputStream(footer))
      if (!fmd.isSetKey_value_metadata) Map.empty
      else {
        import scala.jdk.CollectionConverters._
        fmd.getKey_value_metadata.asScala
          .map(kv => kv.getKey -> kv.getValue).toMap
      }
    } finally raf.close()
  }
}
