package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The whole term-frequency-weighted SimHash signature of a document as
  * ONE codegen'd scalar expression: per word (split on single space,
  * occurrences counted — duplicates weight the majority), hash = the
  * leading `bits` bits of md5(word) as a BIGINT; signature bit j is set
  * iff words with bit j set outnumber words with it clear (strict
  * majority). Bit-identical to the explode -> groupBy(doc_id) ->
  * 32/60-column bit-sum aggregate it replaces (law-tested in
  * PropertySpec), and to the DuckDB oracle's replay of the same md5
  * arithmetic — q26 (bits=32) / q163 (bits=60) oracles are unchanged.
  *
  * Why a scalar: doc_id is unique per input row, so the aggregate's
  * partial aggregation never combined anything — the explode
  * materialized one row per word occurrence and every doc paid a
  * `bits`-column aggregate buffer through an exchange for a value each
  * row determines alone. Per-row, the signature is a pure map: the
  * sketch frame that q163 checkpoints becomes fixed-width state
  * produced with ZERO shuffles.
  *
  * Words are byte-slices of the text between 0x20 bytes (0x20 never
  * occurs inside a multi-byte UTF-8 sequence), so no word array or
  * string is ever built; split's limit=-1 semantics are preserved —
  * consecutive/leading/trailing spaces yield empty words, and empty
  * text is one empty word, exactly as explode(split(text, ' ')) emits.
  * Null input -> null.
  */
case class SimHashSignature(child: Expression, bits: Int)
  extends UnaryExpression {

  require(bits >= 1 && bits <= 64,
    s"bits must be in [1, 64], got $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_simhash needs a STRING input, got ${other.simpleString}")
    }
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    SimHashSig.compute(input.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHashSig.compute($c, $bits)")

  override protected def withNewChildInternal(
    newChild: Expression): SimHashSignature = copy(child = newChild)

  override def prettyName: String = "graft_simhash"
}

object SimHashSig {

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** TF-weighted SimHash of s over the leading `bits` bits of md5. */
  def compute(s: UTF8String, bits: Int): Long = {
    val bytes = s.getBytes
    val nb = bytes.length
    val md = digests.get()
    val cnt = new Array[Int](bits)
    var start = 0
    var b = 0
    while (b <= nb) {
      if (b == nb || bytes(b) == 0x20) { // word = bytes [start, b)
        md.reset()
        md.update(bytes, start, b - start)
        val d = md.digest()
        // Leading `bits` bits of md5: first 8 bytes big-endian,
        // shifted down — equals the value of the first bits/4 hex
        // chars (head-32 for q26, the 60-bit key for q163).
        var v = 0L
        var k = 0
        while (k < 8) { v = (v << 8) | (d(k) & 0xFFL); k += 1 }
        val h = v >>> (64 - bits)
        var j = 0
        while (j < bits) {
          cnt(j) += (((h >>> j) & 1L).toInt << 1) - 1
          j += 1
        }
        start = b + 1
      }
      b += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) {
      if (cnt(j) > 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  /** Column form. */
  def sigCol(text: Column, bits: Int): Column =
    Bridge.column(SimHashSignature(Bridge.expression(text), bits))
}
