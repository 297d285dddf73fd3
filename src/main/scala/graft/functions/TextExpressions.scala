package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash over a string's utf-8 bytes (Rabin–Karp style):
  * h = Σ byte_i · B^(n-1-i)  mod  P,  B = 257, P = 2^61 - 1.
  * Document fingerprinting primitive (north star: rolling-hash
  * fingerprints); codegen'd, single pass, no allocation.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires STRING, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      // (h * B + b) mod P without overflow: P = 2^61-1, h < P, B = 257 →
      // h*B < 2^70 — use Math.multiplyHigh-free route via BigInt-free split:
      // h*257 = h*256 + h = (h<<8) + h; reduce mod P via 2^61 ≡ 1 (mod P)
      h = RollingHash.mulAddMod(h, bytes(i) & 0xff)
      i += 1
    }
    java.lang.Long.valueOf(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = graft.functions.RollingHash.mulAddMod($h, $bytes[$i] & 0xff);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  private val P = (1L << 61) - 1

  /** (h · 257 + b) mod (2^61-1), overflow-free: operands stay < 2^61 and all
    * intermediates < 2^63 after stepwise folding (2^61 ≡ 1 mod P). */
  def mulAddMod(h0: Long, b: Int): Long = {
    // h*257 mod P = (h*256 + h) mod P; h < P < 2^61 → h*256 overflows.
    // Split h = hi·2^53 + lo (lo < 2^53): h·256 = hi·2^61·2^(-53+61)... use
    // the simpler route: fold 8 doublings, each (x·2) mod P is safe.
    var h = h0
    var x = h
    var k = 0
    while (k < 8) { x <<= 1; if (x >= P) x -= P; k += 1 } // x = h·256 mod P
    h = x + h; if (h >= P) h -= P                          // h·257 mod P
    h += b; if (h >= P) h -= P
    h
  }
}

object TextFunctions {
  /** Register rolling_hash for SQL/expr() use. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", exprs => RollingHash(exprs.head), "built-in")
}
