package graft.sources

/** Delimiter sniffing + marker-line header hunting for the text scans
  * (SURVEY.md §2.1 S1/S2). The reference uses csv.Sniffer
  * (netzsch_sta_parser.py:294-323, faa_mcc_parser.py:139-166); this
  * chooses the candidate delimiter appearing on the most non-empty
  * lines — which agrees with Sniffer on the fixture corpus (',' for
  * STA, '\t' for MCC).
  */
object HeaderSniff {

  val Candidates: Seq[Char] = Seq(',', '\t', ';', '|')

  def sniffDelimiter(lines: Iterable[String]): Char = {
    val nonEmpty = lines.filter(_.nonEmpty)
    Candidates.maxBy(c => nonEmpty.count(_.contains(c)))
  }

  /** Index (counting ALL lines, like csv.reader row enumeration) and
    * split fields of the first non-empty line whose first field
    * starts with `marker`; the marker prefix is cut from field 0. */
  def findMarkerHeader(lines: Array[String], delim: Char, marker: String): Option[(Int, Array[String])] = {
    lines.iterator.zipWithIndex
      .find { case (l, _) => l.nonEmpty && l.split(delim.toString, -1)(0).startsWith(marker) }
      .map { case (l, i) =>
        val fields = l.split(delim.toString, -1)
        fields(0) = fields(0).substring(marker.length)
        (i, fields)
      }
  }
}
