package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** The hashed <=2-deletion neighborhood of a string, as one codegen'd
  * expression: ARRAY<BIGINT> of DISTINCT xxhash64 values (seed 42 — the
  * builtin's, so values are bit-identical to
  * `xxhash64(<variant string>)`) over the string itself, every
  * one-character deletion, and every two-character deletion.
  *
  * Why not the explode pipeline it replaces
  * (`ExtendedOps.deletionVariants`'s original form): per name of n
  * chars, that path materializes ~1 + n + n(n-1)/2 variant STRINGS
  * through two explode+substring+concat stages and then pays a
  * corpus-wide `.distinct()` SHUFFLE whose only effect is within-entity
  * dedup (the carry includes the unique entity key, so cross-entity
  * rows are never equal). Here each variant is hashed straight out of
  * a reused byte scratch buffer — no variant string ever exists — and
  * dedup is an in-row sort of ~170 longs, so the shuffle disappears
  * entirely. Measured at sf0.1: the variant stage 2.2 s -> (see
  * PLANS.md A/B) on 15k names x ~172 variants.
  *
  * Deletions are at CHARACTER positions (UTF-8 aware, matching the
  * substring semantics of the replaced pipeline); equality of hash
  * values with the builtin xxhash64 over the equivalent variant string
  * is law-tested in PropertySpec, including non-ASCII and empty
  * strings. Null input -> null.
  */
case class DeletionVariantHashes(child: Expression)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_del_variants needs a STRING input, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    DeletionVariants.variantHashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DeletionVariants.variantHashes($c)")

  override protected def withNewChildInternal(
    newChild: Expression): DeletionVariantHashes = copy(child = newChild)

  override def prettyName: String = "graft_del_variants"
}

object DeletionVariants {

  private val Seed = 42L // xxhash64()'s default seed

  /** Distinct sorted xxhash64 values of s and its <=2-deletion variants. */
  def variantHashes(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val nb = bytes.length
    // Character byte-offsets (UTF-8 aware): off(i) = byte offset of
    // char i; off(n) = total bytes.
    var n = 0
    var b = 0
    while (b < nb) { b += UTF8String.numBytesForFirstByte(bytes(b)); n += 1 }
    val off = new Array[Int](n + 1)
    var i = 0
    b = 0
    while (i < n) {
      off(i) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      i += 1
    }
    off(n) = nb

    val out = new Array[Long](1 + n + n * (n - 1) / 2)
    val scratch = new Array[Byte](math.max(nb, 1))
    var c = 0
    def hashRanges(a0: Int, a1: Int, b0: Int, b1: Int, c0: Int, c1: Int): Long = {
      // copy up to three byte ranges into the scratch, hash once
      var len = 0
      var k = a0
      while (k < a1) { scratch(len) = bytes(k); len += 1; k += 1 }
      k = b0
      while (k < b1) { scratch(len) = bytes(k); len += 1; k += 1 }
      k = c0
      while (k < c1) { scratch(len) = bytes(k); len += 1; k += 1 }
      XXH64.hashUnsafeBytes(scratch, Platform.BYTE_ARRAY_OFFSET, len, Seed)
    }

    out(c) = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, nb, Seed)
    c += 1
    i = 0
    while (i < n) { // one deletion at char i
      out(c) = hashRanges(0, off(i), off(i + 1), nb, 0, 0)
      c += 1
      i += 1
    }
    i = 0
    while (i < n) { // two deletions at chars i < j
      var j = i + 1
      while (j < n) {
        out(c) = hashRanges(0, off(i), off(i + 1), off(j), off(j + 1), nb)
        c += 1
        j += 1
      }
      i += 1
    }
    java.util.Arrays.sort(out, 0, c)
    var w = 0
    i = 0
    while (i < c) {
      if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, w))
  }

  /** Column form. */
  def hashesCol(name: Column): Column =
    Bridge.column(DeletionVariantHashes(Bridge.expression(name)))
}
