package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** BLAKE2b-512 (RFC 7693), pure Scala — the provenance hash the
  * reference stamps on every ingested file (util.py:83-93). The JDK
  * and /opt/spark/jars provide no BLAKE2 implementation, hence ~120
  * lines of the RFC here. Verified against the RFC test vector and
  * the reference's golden fixture digest
  * (tests/test_faa_mcc_parser.py:64-67).
  */
object Blake2b {

  private val IV = Array(
    0x6a09e667f3bcc908L, 0xbb67ae8584caa73bL, 0x3c6ef372fe94f82bL,
    0xa54ff53a5f1d36f1L, 0x510e527fade682d1L, 0x9b05688c2b3e6c1fL,
    0x1f83d9abfb41bd6bL, 0x5be0cd19137e2179L)

  private val Sigma = Array(
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15),
    Array(14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3),
    Array(11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4),
    Array(7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8),
    Array(9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13),
    Array(2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9),
    Array(12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11),
    Array(13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10),
    Array(6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5),
    Array(10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0))

  private def rotr(x: Long, n: Int): Long = (x >>> n) | (x << (64 - n))

  private def g(v: Array[Long], a: Int, b: Int, c: Int, d: Int, x: Long, y: Long): Unit = {
    v(a) = v(a) + v(b) + x
    v(d) = rotr(v(d) ^ v(a), 32)
    v(c) = v(c) + v(d)
    v(b) = rotr(v(b) ^ v(c), 24)
    v(a) = v(a) + v(b) + y
    v(d) = rotr(v(d) ^ v(a), 16)
    v(c) = v(c) + v(d)
    v(b) = rotr(v(b) ^ v(c), 63)
  }

  private def compress(h: Array[Long], block: Array[Byte], off: Int,
                       t: Long, last: Boolean): Unit = {
    val m = new Array[Long](16)
    var i = 0
    while (i < 16) {
      var w = 0L
      var j = 7
      while (j >= 0) { w = (w << 8) | (block(off + i * 8 + j) & 0xffL); j -= 1 }
      m(i) = w
      i += 1
    }
    val v = new Array[Long](16)
    System.arraycopy(h, 0, v, 0, 8)
    System.arraycopy(IV, 0, v, 8, 8)
    v(12) ^= t // low counter word (high word stays 0: < 2^64 bytes)
    if (last) v(14) = ~v(14)
    var r = 0
    while (r < 12) {
      val s = Sigma(r % 10)
      g(v, 0, 4, 8, 12, m(s(0)), m(s(1)))
      g(v, 1, 5, 9, 13, m(s(2)), m(s(3)))
      g(v, 2, 6, 10, 14, m(s(4)), m(s(5)))
      g(v, 3, 7, 11, 15, m(s(6)), m(s(7)))
      g(v, 0, 5, 10, 15, m(s(8)), m(s(9)))
      g(v, 1, 6, 11, 12, m(s(10)), m(s(11)))
      g(v, 2, 7, 8, 13, m(s(12)), m(s(13)))
      g(v, 3, 4, 9, 14, m(s(14)), m(s(15)))
      r += 1
    }
    i = 0
    while (i < 8) { h(i) ^= v(i) ^ v(i + 8); i += 1 }
  }

  /** BLAKE2b-512 digest of `data`, lowercase hex. */
  def hex(data: Array[Byte]): String = {
    val h = IV.clone()
    h(0) ^= 0x01010040L // digest_length=64, fanout=1, depth=1
    val n = data.length
    if (n > 128) {
      var off = 0
      while (off + 128 < n) { // all but the final (possibly full) block
        compress(h, data, off, off + 128L, last = false)
        off += 128
      }
      val lastBlock = new Array[Byte](128)
      System.arraycopy(data, off, lastBlock, 0, n - off)
      compress(h, lastBlock, 0, n.toLong, last = true)
    } else {
      val block = new Array[Byte](128)
      System.arraycopy(data, 0, block, 0, n)
      compress(h, block, 0, n.toLong, last = true)
    }
    val sb = new StringBuilder(128)
    var i = 0
    while (i < 8) {
      var j = 0
      while (j < 8) { sb.append(f"${(h(i) >>> (8 * j)) & 0xff}%02x"); j += 1 }
      i += 1
    }
    sb.toString
  }

  def hexOfFile(path: String): String =
    hex(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))

  /** Column form for distributed provenance hashing over
    * `spark.read.format("binaryFile")` content. */
  val blake2bUdf: Column => Column = {
    val f = udf((bytes: Array[Byte]) => if (bytes == null) null else hex(bytes))
    c => f(c)
  }

  /** Register the native expression as SQL function `blake2b` —
    * usable as `expr("blake2b(content)")`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "blake2b", exprs => Blake2bHash(exprs.head), "built-in")
}

/** Native Catalyst expression for BLAKE2b-512 over a binary column —
  * preferred over the Scala UDF in hot paths: it participates in
  * whole-stage codegen (the generated code calls the static digest,
  * the same shape as Spark's own md5/sha expressions) and avoids the
  * UDF's encoder round-trip. */
case class Blake2bHash(child: org.apache.spark.sql.catalyst.expressions.Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types.{BinaryType, DataType, StringType}

  override def dataType: DataType = StringType
  override def prettyName: String = "blake2b"

  // ExpectsInputTypes' AbstractDataType is private[sql] in Spark 4,
  // so the binary-input requirement is checked explicitly.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"blake2b requires a binary argument, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      Blake2b.hex(input.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.Blake2b.hex($c))")

  override protected def withNewChildInternal(newChild: Expression): Blake2bHash =
    copy(child = newChild)
}
