package graft.sources

import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable

/** Minimal XLSX/XLSM worksheet reader (SURVEY.md §2.1 S4-S6): no POI
  * on the classpath, so this walks the OOXML zip directly with JDK
  * StAX — workbook.xml for sheet order, the rels part for sheet
  * targets, sharedStrings.xml for interned text, then a streaming
  * parse of the sheet XML into sparse rows. Driver-side by design:
  * one workbook is ~MBs; a directory of them would fan out per-file
  * via binaryFile + this reader in a flatMap.
  */
object Xlsx {

  sealed trait Cell
  case class NumCell(v: Double) extends Cell
  case class StrCell(s: String) extends Cell
  case class BoolCell(b: Boolean) extends Cell

  /** Sparse grid: one Map[colIndex → Cell] per row (0-based), gaps
    * filled with empty rows. `sheetPos` is 1-based workbook order. */
  def readSheet(path: String, sheetPos: Int): Vector[Map[Int, Cell]] = {
    val zip = new ZipFile(path)
    try {
      val target = sheetTarget(zip, sheetPos)
      val shared = sharedStrings(zip)
      parseSheet(zip, target, shared)
    } finally zip.close()
  }

  private def entryBytes(zip: ZipFile, name: String): Array[Byte] = {
    val e = zip.getEntry(name)
    require(e != null, s"missing zip entry $name")
    zip.getInputStream(e).readAllBytes()
  }

  private def newReader(zip: ZipFile, name: String) = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.createXMLStreamReader(new java.io.ByteArrayInputStream(entryBytes(zip, name)))
  }

  /** sheetPos (1-based document order) → zip path of the sheet XML. */
  private def sheetTarget(zip: ZipFile, sheetPos: Int): String = {
    val rIds = mutable.ArrayBuffer[String]()
    val wb = newReader(zip, "xl/workbook.xml")
    while (wb.hasNext) {
      if (wb.next() == XMLStreamConstants.START_ELEMENT && wb.getLocalName == "sheet") {
        var rid: String = null
        for (i <- 0 until wb.getAttributeCount)
          if (wb.getAttributeLocalName(i) == "id") rid = wb.getAttributeValue(i)
        rIds += rid
      }
    }
    wb.close()
    val rels = mutable.Map[String, String]()
    val rl = newReader(zip, "xl/_rels/workbook.xml.rels")
    while (rl.hasNext) {
      if (rl.next() == XMLStreamConstants.START_ELEMENT && rl.getLocalName == "Relationship") {
        var id: String = null
        var tgt: String = null
        for (i <- 0 until rl.getAttributeCount) {
          if (rl.getAttributeLocalName(i) == "Id") id = rl.getAttributeValue(i)
          if (rl.getAttributeLocalName(i) == "Target") tgt = rl.getAttributeValue(i)
        }
        rels(id) = tgt
      }
    }
    rl.close()
    val t = rels(rIds(sheetPos - 1))
    if (t.startsWith("/")) t.drop(1) else s"xl/$t"
  }

  private def sharedStrings(zip: ZipFile, name: String = "xl/sharedStrings.xml"): Vector[String] = {
    if (zip.getEntry(name) == null) return Vector.empty
    val out = Vector.newBuilder[String]
    val r = newReader(zip, name)
    var inSi = false
    var inT = false
    val sb = new StringBuilder
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          if (r.getLocalName == "si") { inSi = true; sb.clear() }
          else if (r.getLocalName == "t" && inSi) inT = true
        case XMLStreamConstants.CHARACTERS if inT => sb.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          if (r.getLocalName == "t") inT = false
          else if (r.getLocalName == "si") { inSi = false; out += sb.toString }
        case _ =>
      }
    }
    r.close()
    out.result()
  }

  private def colIndex(ref: String): Int = {
    var i = 0
    var c = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      c = c * 26 + (ref.charAt(i) - 'A' + 1)
      i += 1
    }
    c - 1
  }

  private def parseSheet(zip: ZipFile, target: String,
                         shared: Vector[String]): Vector[Map[Int, Cell]] = {
    val rows = mutable.ArrayBuffer[Map[Int, Cell]]()
    val r = newReader(zip, target)
    var curRow: mutable.Map[Int, Cell] = null
    var curRowNum = 0
    var cellCol = -1
    var cellType = ""
    var inV = false
    var inIsT = false
    val text = new StringBuilder
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" =>
              var rn = rows.length + 1
              for (i <- 0 until r.getAttributeCount)
                if (r.getAttributeLocalName(i) == "r") rn = r.getAttributeValue(i).toInt
              while (rows.length < rn - 1) rows += Map.empty // gap rows
              curRow = mutable.Map.empty
              curRowNum = rn
            case "c" =>
              cellCol = -1
              cellType = ""
              for (i <- 0 until r.getAttributeCount) {
                if (r.getAttributeLocalName(i) == "r") cellCol = colIndex(r.getAttributeValue(i))
                if (r.getAttributeLocalName(i) == "t") cellType = r.getAttributeValue(i)
              }
              if (cellCol < 0) cellCol = if (curRow.isEmpty) 0 else curRow.keys.max + 1
            case "v" => inV = true; text.clear()
            case "t" if cellType == "inlineStr" => inIsT = true; text.clear()
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inV || inIsT => text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" =>
              inV = false
              val raw = text.toString
              val cell: Option[Cell] = cellType match {
                case "s" => Some(StrCell(shared(raw.trim.toInt)))
                case "str" => Some(StrCell(raw))
                case "b" => Some(BoolCell(raw.trim == "1"))
                case "e" => None
                case _ => raw.trim.toDoubleOption.map(NumCell)
              }
              cell.foreach(c => curRow(cellCol) = c)
            case "t" if inIsT =>
              inIsT = false
              curRow(cellCol) = StrCell(text.toString)
            case "row" =>
              rows += curRow.toMap
              curRow = null
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    rows.toVector
  }
}
