package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BPE encode kernel shared by the interpreted and generated paths.
  *
  * Why a kernel and not the composed replace chain
  * ([[graft.operators.Bpe.encodeComposed]]): the chain carries one
  * `replace` node per merge — at a real vocabulary (tens of
  * thousands of merges) that blows plan size and janino's method
  * limits exactly the way the unrolled PQ distance tree did
  * ([[PqKernels]]), and it re-scans the document once per merge.
  * The kernel is one expression node at any merge count and each
  * word costs only its own merge cascade.
  *
  * Semantics are the reference encoder's (Sennrich `encode`):
  * per word, repeatedly merge every greedy left-to-right occurrence
  * of the lowest-rank adjacent pair until none applies. BpeSpec pins
  * kernel == composed on the corpus (equal unless a merge's output
  * string duplicates an existing symbol, which greedy training
  * cannot produce from a fixed corpus pass — see Bpe scaladoc). */
object BpeKernels {

  /** Ranks-map key separator between a pair's two symbols. NUL cannot
    * occur inside a symbol (documents are whitespace-split and this
    * corpus's strings never carry NUL), so `a + Sep + b` is
    * collision-free even as merged symbols grow arbitrarily long.
    * Written as the escape `"\u0000"`, NOT a literal NUL byte, so the
    * source stays a text file for git diff/grep tooling. */
  private final val Sep = "\u0000"

  /** ranks: (a + Sep + b) → merge priority (lower merges first).
    * Built once per plan by [[BpeEncodeExpr]], broadcast as a
    * reference object into generated code. */
  def buildRanks(merges: Array[Array[String]]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) {
      m.put(merges(i)(0) + Sep + merges(i)(1), Integer.valueOf(i))
      i += 1
    }
    m
  }

  private val HexDigits = "0123456789ABCDEF".toCharArray

  /** Initial symbols in BYTE mode: each UTF-8 byte as its 2-hex-digit
    * uppercase name — the representation both engines can derive from
    * a string (`hex()`), playing the role GPT-2's bytes-to-unicode
    * table plays: bytes become printable, merge-able string symbols. */
  private def byteSyms(word: String): ArrayBuffer[String] = {
    val bytes = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val syms = new ArrayBuffer[String](bytes.length)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      syms += new String(Array(HexDigits(b >> 4), HexDigits(b & 0xf)))
      i += 1
    }
    syms
  }

  private def encodeWord(word: String, ranks: java.util.HashMap[String, Integer],
                         byteLevel: Boolean, out: ArrayBuffer[Any]): Unit = {
    var syms =
      if (byteLevel) byteSyms(word)
      else {
        val s = new ArrayBuffer[String](word.length)
        var i = 0
        while (i < word.length) { s += String.valueOf(word.charAt(i)); i += 1 }
        s
      }
    var merging = syms.length >= 2
    while (merging) {
      var bestRank = Int.MaxValue
      var j = 0
      while (j < syms.length - 1) {
        val r = ranks.get(syms(j) + Sep + syms(j + 1))
        if (r != null && r.intValue() < bestRank) bestRank = r.intValue()
        j += 1
      }
      if (bestRank == Int.MaxValue) merging = false
      else {
        val merged = new ArrayBuffer[String](syms.length)
        var k = 0
        while (k < syms.length) {
          if (k < syms.length - 1 &&
              ranks.get(syms(k) + Sep + syms(k + 1)) != null &&
              ranks.get(syms(k) + Sep + syms(k + 1)).intValue() == bestRank) {
            merged += syms(k) + syms(k + 1)
            k += 2
          } else {
            merged += syms(k)
            k += 1
          }
        }
        syms = merged
        merging = syms.length >= 2
      }
    }
    var t = 0
    while (t < syms.length) { out += UTF8String.fromString(syms(t)); t += 1 }
  }

  /** One whitespace-delimited word, minus any embedded SPECIAL
    * tokens: specials are matched leftmost-first (ties to the longest
    * special), emitted verbatim as single tokens, and the byte/char
    * machinery only ever sees the text between them — the passthrough
    * every deployed tokenizer gives its control tokens. */
  private def encodeSegmented(word: String,
                              ranks: java.util.HashMap[String, Integer],
                              byteLevel: Boolean, specials: Array[String],
                              out: ArrayBuffer[Any]): Unit = {
    var start = 0
    var i = 0
    while (i < word.length) {
      var hit: String = null
      var s = 0
      while (s < specials.length) {
        val sp = specials(s)
        if ((hit == null || sp.length > hit.length) &&
            word.startsWith(sp, i)) hit = sp
        s += 1
      }
      if (hit != null) {
        if (i > start) encodeWord(word.substring(start, i), ranks, byteLevel, out)
        out += UTF8String.fromString(hit)
        i += hit.length
        start = i
      } else i += 1
    }
    if (word.length > start)
      encodeWord(word.substring(start), ranks, byteLevel, out)
  }

  /** Whitespace-split the document, BPE-encode each word, return the
    * flat token sequence in order.
    *
    * `preserveSpaces` (byte mode only): every space character emits
    * its own standalone `"20"` token, so the token stream captures
    * word boundaries — including runs of spaces — and
    * `unhex(concat(tokens))` reproduces the document byte-exactly
    * ([[graft.operators.Bpe.decodeBytes]]). Equivalent to
    * byte-expanding the WHOLE document through the merge chain,
    * because merges trained on per-word tables never contain the
    * space byte, so no merge can absorb a `"20"` — the equivalence
    * the oracle's composed form relies on. */
  def encode(doc: UTF8String, ranks: java.util.HashMap[String, Integer],
             byteLevel: Boolean, specials: Array[String],
             preserveSpaces: Boolean): ArrayData = {
    val text = doc.toString
    val out = new ArrayBuffer[Any]()
    var start = 0
    var i = 0
    while (i <= text.length) {
      if (i == text.length || text.charAt(i) == ' ') {
        if (i > start) {
          val w = text.substring(start, i)
          if (specials.length == 0) encodeWord(w, ranks, byteLevel, out)
          else encodeSegmented(w, ranks, byteLevel, specials, out)
        }
        if (preserveSpaces && i < text.length)
          out += UTF8String.fromString("20")
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Flat BPE token sequence for a document — one kernel call per row,
  * whole-stage-codegen friendly at any vocabulary size. `byteLevel`
  * switches initial symbols from UTF-16 units to 2-hex-digit UTF-8
  * byte names (the GPT-2/Llama-family norm); `specials` pass through
  * as verbatim single tokens, never decomposed. */
case class BpeEncodeExpr(child: Expression, merges: Array[Array[String]],
                         byteLevel: Boolean = false,
                         specials: Array[String] = Array.empty,
                         preserveSpaces: Boolean = false)
  extends UnaryExpression {

  require(!preserveSpaces || byteLevel,
    "preserveSpaces emits the space BYTE as a token and is only defined in byte mode")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode requires a string argument, got ${other.catalogString}")
  }

  @transient private lazy val ranks = BpeKernels.buildRanks(merges)

  override protected def nullSafeEval(input: Any): Any =
    BpeKernels.encode(input.asInstanceOf[UTF8String], ranks, byteLevel, specials,
      preserveSpaces)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rRef = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    val sRef = ctx.addReferenceObj("bpeSpecials", specials, "java.lang.String[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeKernels.encode($c, $rRef, $byteLevel, $sRef, $preserveSpaces)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)
}
