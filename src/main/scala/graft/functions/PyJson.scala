package graft.functions

/** Minimal JSON AST + a serializer that reproduces Python's
  * `json.dumps` defaults byte-for-byte (util.py:44-64 encodes all
  * metadata this way): ensure_ascii (non-ASCII → \\uXXXX), ", " and
  * ": " separators, ints without decimal point, floats in repr form.
  * Key order is preserved (Python dicts are insertion-ordered), so a
  * metadata dict built in the reference's order serializes to the
  * identical byte string.
  */
sealed trait JVal {
  def render: String = {
    val sb = new StringBuilder
    JVal.write(this, sb)
    sb.toString
  }
}
case class JStr(s: String) extends JVal
case class JInt(i: Long) extends JVal
case class JDbl(d: Double) extends JVal
case class JBool(b: Boolean) extends JVal
case object JNull extends JVal
case class JArr(items: Vector[JVal]) extends JVal
case class JObj(fields: Vector[(String, JVal)]) extends JVal {
  def +(kv: (String, JVal)): JObj = JObj(fields :+ kv)
  def get(k: String): Option[JVal] = fields.find(_._1 == k).map(_._2)
  /** Python dict semantics: existing key updates in place, new key appends. */
  def updated(k: String, v: JVal): JObj =
    if (fields.exists(_._1 == k)) JObj(fields.map(f => if (f._1 == k) (k, v) else f))
    else this + (k -> v)
}

object JVal {
  def obj(kvs: (String, JVal)*): JObj = JObj(kvs.toVector)

  private[functions] def write(v: JVal, sb: StringBuilder): Unit = v match {
    case JNull => sb.append("null")
    case JBool(b) => sb.append(if (b) "true" else "false")
    case JInt(i) => sb.append(i.toString)
    case JDbl(d) => sb.append(formatDouble(d))
    case JStr(s) => writeString(s, sb)
    case JArr(items) =>
      sb.append('[')
      var first = true
      items.foreach { it =>
        if (!first) sb.append(", ")
        first = false
        write(it, sb)
      }
      sb.append(']')
    case JObj(fields) =>
      sb.append('{')
      var first = true
      fields.foreach { case (k, fv) =>
        if (!first) sb.append(", ")
        first = false
        writeString(k, sb)
        sb.append(": ")
        write(fv, sb)
      }
      sb.append('}')
  }

  /** Python repr() of a float for the magnitudes that occur in lab
    * metadata (1e-4 ≤ |x| < 1e16): shortest round-trip decimal, no
    * exponent. Java's Double.toString already emits shortest
    * round-trip digits in plain form for |x| in [1e-3, 1e7); outside
    * that it uses E notation, which we re-expand. */
  def formatDouble(d: Double): String = {
    if (d.isNaN) return "NaN"
    if (d.isInfinity) return if (d > 0) "Infinity" else "-Infinity"
    val s = java.lang.Double.toString(d)
    if (!s.contains('E')) s
    else {
      val bd = new java.math.BigDecimal(s)
      val abs = math.abs(d)
      if (abs >= 1e16 || (abs < 1e-4 && abs > 0)) {
        // Python also uses exponent form here: e.g. 1e+16, 1e-05
        val p = bd.precision
        val unscaled = bd.unscaledValue.toString.replaceFirst("0+$", "")
        val digits = if (unscaled.isEmpty) "0" else unscaled
        val exp = p - bd.scale - 1
        val mant = if (digits.length == 1) digits else s"${digits.head}.${digits.tail}"
        val sign = if (d < 0) "-" else ""
        f"$sign$mant%se${if (exp >= 0) "+" else "-"}${math.abs(exp)}%02d"
      } else {
        // Python repr parity for the plain-form range: no trailing
        // zeros in the fraction ("0.0001", not "0.00010") but always
        // at least one fractional digit ("15000000000.0", not
        // "15000000000") — BigDecimal expansion loses both.
        var p = bd.toPlainString
        if (p.contains('.')) {
          p = p.reverse.dropWhile(_ == '0').reverse
          if (p.endsWith(".")) p += "0"
        } else p += ".0"
        p
      }
    }
  }

  private def writeString(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case c if c < ' ' || c > '~' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }
}
