package graft

import org.apache.spark.sql.functions._
import graft.functions.{CmsSketchAgg, KmvSketchAgg, TextFunctions, VectorFunctions}

/** Custom Catalyst expressions: codegen/eval agreement + reference values. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("rolling_hash matches an independent BigInt implementation") {
    TextFunctions.register(spark)
    val P = BigInt((1L << 61) - 1)
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(BigInt(0))((h, b) => (h * 257 + (b & 0xff)) mod P)
        .toLong
    val inputs = Seq("", "a", "hello world", "the fast key order sort",
      "éèê multi-byte utf8", "x" * 1000)
    val got = inputs.toDF("s")
      .select(expr("rolling_hash(s)").as[Long]).collect()
    assert(got.toSeq === inputs.map(ref))
  }

  test("levenshtein_bp equals builtin levenshtein on random + edge strings") {
    TextFunctions.register(spark)
    // deterministic pseudo-random ASCII corpus incl. empty / 1-char /
    // 64-char boundary / >64 fallback / non-ASCII fallback
    val rnd = new scala.util.Random(42)
    def randAscii(n: Int) =
      (0 until n).map(_ => (32 + rnd.nextInt(95)).toChar).mkString
    val pool = Seq("", "a", "ab", "x" * 64, "x" * 65,
      "caffé", "naïve café", "日本語テキスト") ++
      (0 until 60).map(_ => randAscii(rnd.nextInt(30))) ++
      (0 until 10).map(_ => randAscii(60 + rnd.nextInt(10)))
    val pairs = for (a <- pool; b <- pool) yield (a, b)
    val rows = pairs.toDF("a", "b")
      .select(expr("levenshtein_bp(a, b)").as[Int],
        levenshtein(col("a"), col("b")).as[Int]).collect()
    rows.foreach { case (bp, ref) => assert(bp === ref) }
    // interpreted (non-codegen) path agrees too
    import org.apache.spark.unsafe.types.UTF8String
    assert(graft.functions.LevenshteinBP.dist(
      UTF8String.fromString("kitten"), UTF8String.fromString("sitting")) === 3)
  }

  test("jaro_winkler reference values, properties, and codegen agreement") {
    TextFunctions.register(spark)
    // reference values verified against DuckDB's jaro_winkler_similarity
    // (byte-based, threshold 0.7, prefix cap 4) in the dev probe
    val refs = Seq(
      ("martha", "marhta", 0.9611111111111111),
      ("dixon", "dicksonx", 0.8133333333333332),
      ("jellyfish", "smellyfish", 0.8962962962962964),
      ("abc", "abc", 1.0),
      ("", "abc", 0.0),
      ("", "", 0.0),
      ("a", "b", 0.0),
      ("crate", "trace", 0.7333333333333334),
      ("dwayne", "duane", 0.8400000000000001),
      // multi-byte: DuckDB compares BYTES — é is 2 bytes, so 'éclair' vs
      // 'eclair' is a 7-vs-6-byte comparison, NOT a 1-char substitution
      ("éclair", "eclair", 0.8492063492063492),
      ("日本語", "日本誤", 0.9555555555555556))
    val got = refs.map(r => (r._1, r._2)).toDF("a", "b")
      .select(expr("jaro_winkler(a, b)").as[Double]).collect()
    got.zip(refs).foreach { case (g, (a, b, want)) =>
      assert(g === want, s"jw($a, $b)")
    }
    // interpreted path agrees with the codegen'd column values
    refs.foreach { case (a, b, want) =>
      assert(graft.functions.JaroWinkler.jw(
        a.getBytes("UTF-8"), b.getBytes("UTF-8")) === want)
    }
    // properties on a deterministic pseudo-random pool: symmetric,
    // bounded, 1 iff equal (non-empty)
    val rnd = new scala.util.Random(7)
    val pool = (0 until 40).map(_ =>
      (0 until 1 + rnd.nextInt(12)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString)
    for (x <- pool; y <- pool) {
      val f = graft.functions.JaroWinkler.jw(x.getBytes, y.getBytes)
      val r = graft.functions.JaroWinkler.jw(y.getBytes, x.getBytes)
      assert(f === r, s"symmetry $x $y")
      assert(f >= 0.0 && f <= 1.0)
      if (x == y) assert(f === 1.0)
    }
    // null propagation
    val n = Seq(("abc", null.asInstanceOf[String])).toDF("a", "b")
      .select(expr("jaro_winkler(a, b)")).collect()
    assert(n.head.isNullAt(0))
  }

  test("rolling_hash is order-sensitive (unlike bag-of-bytes hashes)") {
    TextFunctions.register(spark)
    val Seq(ab, ba) = Seq("ab", "ba").toDF("s")
      .select(expr("rolling_hash(s)").as[Long]).collect().toSeq
    assert(ab !== ba)
  }

  test("cosine_sim: self-similarity 1, orthogonal 0, codegen = expected") {
    VectorFunctions.register(spark)
    val df = Seq(
      (Array(1f, 0f, 0f), Array(1f, 0f, 0f)),
      (Array(1f, 0f, 0f), Array(0f, 1f, 0f)),
      (Array(1f, 1f, 0f), Array(1f, 0f, 0f))
    ).toDF("a", "b")
    val got = df.select(expr("cosine_sim(a, b)").as[Double]).collect()
    assert(math.abs(got(0) - 1.0) < 1e-15)
    assert(got(1) === 0.0)
    assert(math.abs(got(2) - 1.0 / math.sqrt(2)) < 1e-15)
  }

  test("dot_product agrees with the HOF formulation on real embeddings") {
    VectorFunctions.register(spark)
    val e = Tables.t(spark, sf001, "embeddings").limit(50)
      .select($"vec_id", $"embedding")
    val both = e.select(
      expr("dot_product(embedding, embedding)").as("fast"),
      aggregate(zip_with($"embedding", $"embedding",
        (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("hof"))
      .as[(Double, Double)].collect()
    both.foreach { case (fast, hof) =>
      assert(math.abs(fast - hof) < 1e-12)
    }
  }

  test("cosine_sim null propagation") {
    VectorFunctions.register(spark)
    val df = Seq((Some(Array(1f, 2f)), None: Option[Array[Float]]))
      .toDF("a", "b")
    val got = df.select(expr("cosine_sim(a, b)")).collect()
    assert(got(0).isNullAt(0))
  }

  test("lsh_band_keys matches an independent md5-hyperplane implementation") {
    VectorFunctions.register(spark)
    def weight(j: Int, i: Int): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"plane:$j:$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16) % 2001 - 1000
    }
    def ref(v: Array[Float], bands: Int, r: Int): Seq[Long] = {
      // same half-away-from-zero rounding as LshMath (math.rint rounds
      // half-to-even — diverges from the spec'd quantization on exact ties)
      val q = v.map(x => graft.functions.QMath.qround(x.toDouble * 1e6))
      (0 until bands).map { b =>
        (0 until r).foldLeft(0L) { (key, k) =>
          val dot = q.indices.map(i => q(i) * weight(b * r + k, i)).sum
          key * 2 + (if (dot > 0) 1L else 0L)
        }
      }
    }
    val vecs = Tables.t(spark, sf001, "embeddings").limit(20)
      .select($"embedding").as[Array[Float]].collect()
    val got = vecs.toSeq.toDF("embedding")
      .select(expr("lsh_band_keys(embedding, 20, 3)").as[Seq[Long]]).collect()
    vecs.zip(got).foreach { case (v, keys) =>
      assert(keys === ref(v, 20, 3))
    }
  }

  test("KmvSketchAgg: merge-of-partials equals one pass; serde roundtrips; bounded") {
    val agg = KmvSketchAgg(
      org.apache.spark.sql.catalyst.expressions.Literal(0L), k = 16)
    val rnd = new scala.util.Random(42)
    val values = Seq.fill(5000)(rnd.nextLong().abs % 100000L)
    // one-pass reference
    val whole = agg.createAggregationBuffer()
    values.foreach(whole.add)
    // arbitrary partition split, partial states, serde across the "wire"
    val merged = agg.createAggregationBuffer()
    values.grouped(700).foreach { slice =>
      val part = agg.createAggregationBuffer()
      slice.foreach(part.add)
      merged.merge(agg.deserialize(agg.serialize(part)))
    }
    assert(merged.set === whole.set)
    assert(whole.set.size === 16) // bounded, not corpus-sized
    assert(agg.eval(merged) === agg.eval(whole))
    // under-k exactness: fewer distinct inputs than k → exact count
    val small = agg.createAggregationBuffer()
    Seq(7L, 7L, 8L, 9L).foreach(small.add)
    assert(agg.eval(small) === 3.0)
  }

  test("CmsSketchAgg: merge-of-partials equals one pass; serde roundtrips; " +
      "never undercounts") {
    val agg = CmsSketchAgg(
      org.apache.spark.sql.catalyst.expressions.Literal(null), d = 4, w = 64)
    val rnd = new scala.util.Random(7)
    // 2000 draws over 50 distinct items, zipf-ish
    val items = Seq.fill(2000)(rnd.nextInt(rnd.nextInt(49) + 1).toLong)
    def buckets(x: Long): Array[Long] =
      Array.tabulate(4)(j => (x * (j * 2 + 3) + j * 17) % 64)
    // one-pass reference
    val whole = agg.createAggregationBuffer()
    items.foreach(x => whole.add(buckets(x)))
    // arbitrary partition split, partial states, serde across the "wire"
    val merged = agg.createAggregationBuffer()
    items.grouped(300).foreach { slice =>
      val part = agg.createAggregationBuffer()
      slice.foreach(x => part.add(buckets(x)))
      merged.merge(agg.deserialize(agg.serialize(part)))
    }
    assert(merged.counts === whole.counts)
    assert(whole.counts.sum === 2000L * 4) // each update touches d rows
    // point estimates: min over rows, >= true count for EVERY item
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong)
    truth.foreach { case (x, n) =>
      val est = buckets(x).zipWithIndex
        .map { case (b, j) => whole.counts(j * 64 + b.toInt) }.min
      assert(est >= n, s"CMS undercounted item $x: est $est < true $n")
    }
  }

  test("cms_heavy_hitters estimates bound true counts and stay within the " +
      "collision budget") {
    val rows = SparkEntry.queries("cms_heavy_hitters")(spark, sf001)
      .as[(String, Long, Long)].collect()
    assert(rows.length === 20)
    val total = rows.map(_._2).sum // heavy hitters dominate the stream
    rows.foreach { case (term, cnt, est) =>
      assert(est >= cnt, s"CMS undercounted '$term'")
      // collision mass per row is at most stream/w; with 4 rows and md5
      // slices the min is tight for heavy hitters at this SF
      assert(est - cnt <= total, s"implausible CMS inflation for '$term'")
    }
  }

  test("cms_heavy_hitters is one sketch pass: ObjectHashAggregate, no " +
      "per-term shuffle on the sketch side") {
    val plan = SparkEntry.queries("cms_heavy_hitters")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("cms_sketch"))
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"))
  }

  test("kmv_distinct_agg equals the windowed kmv_distinct estimate") {
    val viaAgg = SparkEntry.queries("kmv_distinct_agg")(spark, sf001)
      .as[(String, Double)].collect().toMap
    val viaWindow = SparkEntry.queries("kmv_distinct")(spark, sf001)
      .select($"event_type", $"kmv_est").as[(String, Double)].collect().toMap
    assert(viaAgg === viaWindow)
  }

  test("kmv_distinct_agg is one aggregation pass: a single hash exchange, no DISTINCT") {
    val plan = SparkEntry.queries("kmv_distinct_agg")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("kmv_sketch"))
    // object-typed buffer → ObjectHashAggregate (SortAggregate if spilled)
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"))
    // exactly one data shuffle (partial sketches → final merge); the
    // windowed kmv_distinct needs a distinct exchange before its window
    assert("hashpartitioning".r.findAllMatchIn(plan).length === 1)
  }

  test("cosine_near_dup plan is an equi-join, not a nested-loop product") {
    val df = SparkEntry.queries("cosine_near_dup")(spark, sf001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"))
  }
}
