package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Bounded KMV (k-minimum-values) distinct-count sketch state: the k
  * smallest DISTINCT 48-bit hash values seen so far, kept in a sorted
  * set. ~k·8 B, independent of group size — the property that makes
  * per-cell distinct counts affordable at 10^12 rows where an exact
  * `count(distinct)` must shuffle every distinct key.
  */
final class KmvState(val k: Int) {
  val set = new java.util.TreeSet[java.lang.Long]()
  def insert(h: Long): Unit = {
    if (set.size < k) { set.add(h); () }
    else if (h < set.last()) {
      if (set.add(h)) { set.remove(set.last()); () }
    }
  }
  def mergeFrom(o: KmvState): Unit = {
    val it = o.set.iterator()
    while (it.hasNext) insert(it.next())
  }
}

/** Native Catalyst typed aggregate: KMV distinct-count estimate.
  *
  * Hash = the first 48 bits (12 hex chars) of md5 of the value's UTF-8
  * string — 48 bits so the k-th value converts to an EXACT double and
  * the estimate `((k−1) / kth) * 2^48` is one portable
  * division+multiplication, reproducible bit-for-bit by a DuckDB oracle
  * from `substr(md5(v), 1, 12)`. With fewer than k distinct hashes the
  * estimate IS the exact distinct count.
  *
  * Scale shape: a TypedImperativeAggregate runs inside
  * ObjectHashAggregate with map-side PARTIAL aggregation — each
  * partition reduces to ≤ k longs per group before the exchange, so the
  * shuffle carries ~k·8 B per (partition, group) instead of every
  * distinct key (`count(distinct)` rewrites to a two-phase expand that
  * shuffles all of them). Deterministic under ANY partitioning: the k
  * smallest of a union is the k smallest of the k-smallest subsets —
  * merge is exact, not approximate (the spec pins cross-partitioning
  * equality).
  */
case class KmvSketchAgg(child: Expression, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
  // ImplicitCastInputTypes (not bare ExpectsInputTypes): kmv_distinct
  // over a numeric/date column coerces to STRING at analysis instead of
  // failing, so call sites don't each need an explicit CAST (round-7
  // ADVICE). The hash value is computed over the cast's string image —
  // identical to what an explicit CAST would produce.
  extends TypedImperativeAggregate[KmvState] with ImplicitCastInputTypes {

  require(k >= 2, s"kmv sketch needs k >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_distinct"

  override def createAggregationBuffer(): KmvState = new KmvState(k)

  private def md = KmvSketchAgg.digest.get()

  override def update(buffer: KmvState, input: InternalRow): KmvState = {
    val v = child.eval(input)
    if (v != null) {
      val d = md
      d.reset()
      val bytes = d.digest(
        v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
      // first 6 md5 bytes = first 12 hex chars, as a 48-bit positive long
      val h = ((bytes(0) & 0xFFL) << 40) | ((bytes(1) & 0xFFL) << 32) |
        ((bytes(2) & 0xFFL) << 24) | ((bytes(3) & 0xFFL) << 16) |
        ((bytes(4) & 0xFFL) << 8) | (bytes(5) & 0xFFL)
      buffer.insert(h)
    }
    buffer
  }

  override def merge(buffer: KmvState, other: KmvState): KmvState = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: KmvState): Any = {
    val n = buffer.set.size
    if (n < k) n.toDouble
    else ((k - 1).toDouble / buffer.set.last().toDouble) * 281474976710656.0
  }

  override def serialize(buffer: KmvState): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buffer.set.size * 8)
    bb.putInt(buffer.set.size)
    val it = buffer.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvState = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val st = new KmvState(k)
    var i = 0
    while (i < n) { st.insert(bb.getLong); i += 1 }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object KmvSketchAgg {
  private val digest = ThreadLocal.withInitial(
    new java.util.function.Supplier[java.security.MessageDigest] {
      override def get(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    })
}
