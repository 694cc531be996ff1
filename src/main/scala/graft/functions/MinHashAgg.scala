package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signature aggregate: for each group, the element-wise
  * minimum of `numHashes` seeded xxhash64 values over the input strings
  * (shingles).
  *
  * The composable alternative — `numHashes` separate `min(xxhash64(...))`
  * aggregate columns — carries one agg buffer slot AND one concat
  * allocation per hash per row. This TypedImperativeAggregate keeps a
  * single primitive long-array buffer, hashes the shingle bytes once per
  * seed without materializing seed-prefixed strings, and shuffles one
  * fixed-width array per group — the shape that matters when the group
  * count is billions.
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int = 16,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      var j = 0
      while (j < numHashes) {
        val h = XxHash64Function.hash(s, org.apache.spark.sql.types.StringType, j.toLong)
        if (h < buf(j)) buf(j) = h
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < numHashes) { if (b(j) < a(j)) a(j) = b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numHashes)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(offset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinHashAgg =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "graft_minhash"
}

object MinHashAgg {
  /** MinHash signature Column over a string (shingle) column. */
  def minhashSig(shingle: Column, numHashes: Int = 16): Column =
    Bridge.column(MinHashAgg(Bridge.expression(shingle), numHashes)
      .toAggregateExpression())
}
