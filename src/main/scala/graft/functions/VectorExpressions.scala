package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity over ARRAY<FLOAT> —
  * the hot-path alternative to the higher-order-function formulation in
  * graft.operators.SimilarityOps (SURVEY.md §7.4: promote to a codegen
  * Expression when bench demands). Single pass, no per-element lambda
  * dispatch, participates in whole-stage codegen via doGenCode.
  *
  * Note: plain double accumulation (fast, sequential fold) — used for
  * benchmarking/production top-k where bit-level cross-engine equality is
  * not required; the oracle-checked queries use the quantized formulation.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType == ArrayType(FloatType)) ||
        Seq(left, right).forall(_.dataType == ArrayType(FloatType, containsNull = false)))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<FLOAT> arguments, " +
        s"got ${left.dataType.sql} / ${right.dataType.sql}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${ev.value} = ($nx == 0.0 || $ny == 0.0)
         |  ? 0.0 : $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Dot product twin of [[CosineSimilarity]] (same codegen shape). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(d => d.dataType == ArrayType(FloatType) ||
        d.dataType == ArrayType(FloatType, containsNull = false)))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<FLOAT> arguments, " +
        s"got ${left.dataType.sql} / ${right.dataType.sql}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Quantized dot product: Σ qround(xi·yi·1e16) as LONG — the codegen fast
  * path for the oracle-exact quantized formulation in SimilarityOps.dotQ.
  * qround = round-half-away-from-zero, matching both Spark's round()
  * (BigDecimal HALF_UP) and DuckDB's ROUND() on doubles, so results are
  * bit-identical to the HOF version and the SQL oracle.
  */
case class QuantizedDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(d => d.dataType.isInstanceOf[ArrayType] &&
        d.dataType.asInstanceOf[ArrayType].elementType == FloatType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<FLOAT> arguments, " +
        s"got ${left.dataType.sql} / ${right.dataType.sql}")
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "dot_q"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += QMath.qround(x.getFloat(i).toDouble * y.getFloat(i).toDouble * 1e16)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += graft.functions.QMath.qround(
         |    (double) $a.getFloat($i) * (double) $b.getFloat($i) * 1e16);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane LSH band keys for ARRAY<FLOAT>: returns ARRAY<LONG> of
  * `bands` keys, band k = the sign bits of `rowsPerBand` integer hyperplane
  * dots (planes k·r .. k·r+r-1). Same md5-derived weight family and
  * quantization (round(x·1e6) longs × integer weights in [-1000,1000]) as
  * SimilarityOps.lshBucket, so keys are bit-exact on any engine/partitioning.
  *
  * Used as the candidate-generation blocking key for banded similarity
  * self-joins (cosine_near_dup): pairs form only inside (band, key) buckets —
  * an equi-join — never as an all-pairs product.
  */
case class LshBandKeys(child: Expression, bands: Int, rowsPerBand: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[ArrayType] &&
        child.dataType.asInstanceOf[ArrayType].elementType == FloatType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an ARRAY<FLOAT> argument, got ${child.dataType.sql}")
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "lsh_band_keys"

  override def nullSafeEval(a: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      LshMath.bandKeys(a.asInstanceOf[ArrayData], bands, rowsPerBand))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.LshMath.bandKeys($a, $bands, $rowsPerBand));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** First-matching-band predicate for banded-LSH pair dedup: true iff NO
  * index i < n has a(i) == b(i) — i.e. the current band (index n) is the
  * earliest collision, so this candidate occurrence is the one to keep.
  * Codegen tight loop over ≤bands longs; the higher-order-function
  * formulation (exists(zip_with(slice, slice, =), id)) allocates two slices
  * + a zipped array per candidate pair, which dominated the banded self-join
  * (~30 s of the sf0.1 cosine_near_dup bench before this expression).
  */
case class NoEarlierBandCollision(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val longArr = (d: DataType) => d.isInstanceOf[ArrayType] &&
      d.asInstanceOf[ArrayType].elementType == org.apache.spark.sql.types.LongType
    if (longArr(first.dataType) && longArr(second.dataType) &&
        third.dataType == org.apache.spark.sql.types.IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<BIGINT>, ARRAY<BIGINT>, INT), got " +
        s"${first.dataType.sql} / ${second.dataType.sql} / ${third.dataType.sql}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "no_earlier_band_collision"

  override def nullSafeEval(a: Any, b: Any, n: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val upTo = n.asInstanceOf[Int]
    var i = 0
    while (i < upTo) {
      if (x.getLong(i) == y.getLong(i)) return java.lang.Boolean.FALSE
      i += 1
    }
    java.lang.Boolean.TRUE
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, n) => {
      val i = ctx.freshName("i")
      s"""
         |${ev.value} = true;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) { ${ev.value} = false; break; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Hyperplane weight table + band-key kernel callable from generated Java.
  * Weights are md5("plane:j:i")-derived integers in [-1000, 1000] — identical
  * to SimilarityOps.planeWeight, deterministic on every JVM, so the driver's
  * SQL oracle can replay them symbolically.
  */
object LshMath {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Long]]]()

  def weights(nPlanes: Int, dim: Int): Array[Array[Long]] =
    cache.computeIfAbsent((nPlanes, dim), { _ =>
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(nPlanes, dim) { (j, i) =>
        val hex = md.digest(s"plane:$j:$i".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 15)
        java.lang.Long.parseLong(hex, 16) % 2001 - 1000
      }
    })

  def bandKeys(x: ArrayData, bands: Int, rowsPerBand: Int): Array[Long] = {
    val dim = x.numElements()
    val w = weights(bands * rowsPerBand, dim)
    // quantize once per row, not once per plane
    val q = new Array[Long](dim)
    var i = 0
    while (i < dim) { q(i) = QMath.qround(x.getFloat(i).toDouble * 1e6); i += 1 }
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = 0L
      var k = 0
      while (k < rowsPerBand) {
        val wj = w(b * rowsPerBand + k)
        var dot = 0L
        var d = 0
        while (d < dim) { dot += q(d) * wj(d); d += 1 }
        key = key * 2 + (if (dot > 0) 1L else 0L)
        k += 1
      }
      keys(b) = key
      b += 1
    }
    keys
  }
}

/** Shared rounding helper callable from generated Java. */
object QMath {
  /** Round half away from zero (= BigDecimal HALF_UP on the double's exact
    * value for non-ties; matches DuckDB ROUND). */
  def qround(x: Double): Long = {
    val r = Math.rint(x)
    if (Math.abs(x - r) == 0.5) (if (x > 0) Math.ceil(x) else Math.floor(x)).toLong
    else r.toLong
  }
}

object VectorFunctions {
  /** Register cosine_sim / dot_product for SQL + expr() use. Idempotent. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_sim",
      exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("dot_product",
      exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("dot_q",
      exprs => QuantizedDot(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("lsh_band_keys",
      exprs => LshBandKeys(exprs(0),
        exprs(1).eval().asInstanceOf[Int], exprs(2).eval().asInstanceOf[Int]),
      "built-in")
    reg.createOrReplaceTempFunction("no_earlier_band_collision",
      exprs => NoEarlierBandCollision(exprs(0), exprs(1), exprs(2)), "built-in")
  }
}
