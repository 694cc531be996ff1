package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The DISTINCT, ASCENDING 60-bit md5 hashes of a document's word
  * 3-gram shingles, as one codegen'd scalar expression — the per-row
  * form of `DedupOps.hashedShingles`. Each hash equals
  * `conv(substring(md5(shingle), 1, 15), 16, 10)` (the leading 60 bits
  * of md5 as a non-negative BIGINT), the engine's shared oracle-exact
  * shingle key, so every consumer joining or counting on it is
  * unchanged bit-for-bit (law-tested in PropertySpec).
  *
  * Why this replaces explode -> md5 -> corpus-wide distinct: doc_id is
  * unique in `documents`, so that `distinct()`'s ONLY effect is
  * within-document dedup — yet it shuffles the corpus's entire shingle
  * volume to find out. Here dedup is an in-row sort of the document's
  * own hashes; the frame `explode(this)` produces is row-identical
  * with ZERO exchanges. The sorted output also composes directly with
  * graft_sorted_inter* on verification paths.
  *
  * Shingling is the zero-copy byte-slice scan of [[MinHashSignature]]:
  * split-on-single-space means a word 3-gram is exactly a slice of the
  * text's UTF-8 bytes (0x20 never occurs inside a multi-byte
  * sequence), so no word array or shingle string is ever built.
  * Documents with fewer than 3 words have no shingles -> NULL (explode
  * drops it, matching the aggregate path's absent rows). Null -> null.
  */
case class ShingleHashArray(child: Expression)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_shingle_hashes needs a STRING input, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ShingleHashes.compute($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(
    newChild: Expression): ShingleHashArray = copy(child = newChild)

  override def prettyName: String = "graft_shingle_hashes"
}

object ShingleHashes {

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** Sorted distinct 60-bit md5 hashes of the word-3-gram shingles of
    * s, or null if s has fewer than 3 words.
    */
  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val nb = bytes.length
    var spaces = 0
    var b = 0
    while (b < nb) { if (bytes(b) == 0x20) spaces += 1; b += 1 }
    val nWords = spaces + 1
    if (nWords < 3) return null
    val start = new Array[Int](nWords + 1)
    start(0) = 0
    var w = 1
    b = 0
    while (b < nb) {
      if (bytes(b) == 0x20) { start(w) = b + 1; w += 1 }
      b += 1
    }
    start(nWords) = nb + 1 // virtual space after the last word

    val md = digests.get()
    val out = new Array[Long](nWords - 2)
    var i = 0
    while (i <= nWords - 3) {
      val off = start(i)
      md.reset()
      md.update(bytes, off, start(i + 3) - 1 - off)
      val d = md.digest()
      // Leading 60 bits: 7 full bytes + the high nibble of byte 7 —
      // the value of md5's first 15 hex chars, always >= 0.
      out(i) = ((d(0) & 0xFFL) << 52) | ((d(1) & 0xFFL) << 44) |
        ((d(2) & 0xFFL) << 36) | ((d(3) & 0xFFL) << 28) |
        ((d(4) & 0xFFL) << 20) | ((d(5) & 0xFFL) << 12) |
        ((d(6) & 0xFFL) << 4) | ((d(7) & 0xF0L) >>> 4)
      i += 1
    }
    java.util.Arrays.sort(out)
    var wd = 0
    i = 0
    while (i < out.length) {
      if (wd == 0 || out(i) != out(wd - 1)) { out(wd) = out(i); wd += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (wd == out.length) out else java.util.Arrays.copyOf(out, wd))
  }

  /** Column form. */
  def hashesCol(text: Column): Column =
    Bridge.column(ShingleHashArray(Bridge.expression(text)))
}
