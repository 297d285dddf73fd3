package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Bounded KMV (k-minimum-values) sketch state: the k smallest DISTINCT
  * hash values seen so far. A TreeSet gives dedup + ordered trim in
  * O(log k) per update with O(k) memory — the fixed-footprint shape a
  * distinct-count needs at 100 TB. Commutative and idempotent, so
  * partial-state merges across partitions (and across sketch instances
  * built on different machines) are order-independent.
  */
final class KmvState(val k: Int) {
  val set = new java.util.TreeSet[java.lang.Long]()
  def add(v: Long): Unit =
    if (set.size < k) { set.add(v); () }
    else if (v < set.last) { if (set.add(v)) { set.pollLast(); () } }
  def merge(o: KmvState): Unit = {
    val it = o.set.iterator()
    while (it.hasNext) add(it.next())
  }
}

/** `kmv_sketch(hash, k)` — mergeable KMV distinct-count estimate as a native
  * Catalyst [[TypedImperativeAggregate]]: map-side partial sketches, binary
  * (de)serialization across the exchange, merge on the reduce side — ONE
  * aggregation pass with no DISTINCT pre-shuffle (the dedup happens inside
  * the bounded state). Estimator and hash domain match the windowed
  * `kmv_distinct` query exactly: 52-bit md5-derived hashes, estimate
  * (k−1)·2⁵² / (h_k + 1), exact set size while fewer than k distinct hashes
  * have been seen — so the DuckDB oracle replays it symbolically and the
  * result hash-matches.
  *
  * The reference has no sketch surface (north star, SURVEY.md §2.7).
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvState] {

  require(k >= 2, s"kmv_sketch needs k >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch requires BIGINT hashes, got ${child.dataType.sql}")
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): KmvState = new KmvState(k)

  override def update(b: KmvState, row: InternalRow): KmvState = {
    val v = child.eval(row)
    if (v != null) b.add(v.asInstanceOf[Long])
    b
  }

  override def merge(b: KmvState, o: KmvState): KmvState = { b.merge(o); b }

  override def eval(b: KmvState): Any =
    if (b.set.size < k) b.set.size.toDouble
    else (k - 1).toDouble * KmvSketchAgg.TWO_52 / (b.set.last + 1L).toDouble

  override def serialize(b: KmvState): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * b.set.size)
    bb.putInt(b.set.size)
    val it = b.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvState = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new KmvState(k)
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
}

object KmvSketchAgg {
  val TWO_52: Double = 4503599627370496.0 // 2^52, exactly representable
}

/** Count-Min sketch state: a d×w matrix of counters, flat row-major. Update
  * adds 1 to one bucket per row; merge is elementwise addition — both
  * commutative and associative, so partial sketches built per partition (or
  * per machine) combine in any order. Fixed d·w·8-byte footprint regardless
  * of stream length — the frequency-estimation shape a 100 TB token stream
  * needs (point queries overestimate by at most the collision mass, never
  * undercount).
  */
final class CmsState(val d: Int, val w: Int) {
  val counts = new Array[Long](d * w)
  def add(buckets: Array[Long]): Unit = {
    var j = 0
    while (j < d) {
      counts(j * w + java.lang.Math.floorMod(buckets(j), w.toLong).toInt) += 1L
      j += 1
    }
  }
  def merge(o: CmsState): Unit = {
    var i = 0
    while (i < counts.length) { counts(i) += o.counts(i); i += 1 }
  }
}

/** `cms_sketch(buckets, d, w)` — mergeable Count-Min sketch as a native
  * Catalyst [[TypedImperativeAggregate]]. `buckets` is a length-d
  * ARRAY<BIGINT> of precomputed per-hash-row bucket indices (the query
  * derives them from disjoint 16-bit md5 slices, so the DuckDB oracle can
  * replay every counter exactly — CMS is deterministic given its hash
  * functions, unlike HLL's engine-private registers). Evaluates to the flat
  * row-major d·w counter array; point estimates are then
  * `min_j counts[j·w + h_j(x)]`, plain column math over the broadcast
  * sketch.
  *
  * The reference has no sketch surface (north star, SURVEY.md §2.7).
  */
case class CmsSketchAgg(
    child: Expression,
    d: Int,
    w: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsState] {

  require(d >= 1 && w >= 2, s"cms_sketch needs d >= 1, w >= 2, got ($d, $w)")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cms_sketch requires ARRAY<BIGINT> bucket indices, got ${other.sql}")
  }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cms_sketch"

  override def createAggregationBuffer(): CmsState = new CmsState(d, w)

  override def update(b: CmsState, row: InternalRow): CmsState = {
    val v = child.eval(row)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData].toLongArray()
      require(arr.length == d,
        s"cms_sketch expects $d bucket indices per row, got ${arr.length}")
      b.add(arr)
    }
    b
  }

  override def merge(b: CmsState, o: CmsState): CmsState = { b.merge(o); b }

  override def eval(b: CmsState): Any = new GenericArrayData(b.counts.clone())

  override def serialize(b: CmsState): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * b.counts.length)
    var i = 0
    while (i < b.counts.length) { bb.putLong(b.counts(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CmsState = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val s = new CmsState(d, w)
    var i = 0
    while (i < s.counts.length) { s.counts(i) = bb.getLong; i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = newOffset)
}

object SketchFunctions {
  /** Register kmv_sketch / cms_sketch for SQL + expr() use. Idempotent. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kmv_sketch",
      exprs => KmvSketchAgg(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue()),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cms_sketch",
      exprs => CmsSketchAgg(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue()),
      "built-in")
  }
}
