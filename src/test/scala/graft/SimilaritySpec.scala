package graft

import org.apache.spark.sql.functions._

/** Embedding-pipeline operators added in round 5: JL random projection and
  * the mutual-kNN graph — exact recomputes plus the JL distance-preservation
  * property at sf0.001.
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 64
  private val JlK = 8
  private val KnnK = 10

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def jlSign(j: Int, i: Int): Long =
    if (Integer.parseInt(md5hex(s"jl:$j:$i").substring(0, 1), 16) % 2 == 0) 1L
    else -1L

  private lazy val raw: Map[Long, Array[Float]] =
    Tables.t(spark, sf001, "embeddings")
      .select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect().toMap

  // 1e6-quantized elements — what jl_projection sums
  private lazy val embs: Map[Long, Array[Long]] =
    raw.view.mapValues(_.map(x => math.round(x.toDouble * 1e6))).toMap

  test("jl_projection equals the baked sign-matrix sum, and preserves " +
      "pairwise distances within the JL band") {
    val got = SparkEntry.queries("jl_projection")(spark, sf001)
      .collect().map(r => r.getLong(0) -> (1 to JlK).map(r.getLong).toArray)
      .toMap
    assert(got.keySet === embs.keySet)
    // exact recompute
    got.foreach { case (id, ys) =>
      val q = embs(id)
      (0 until JlK).foreach { j =>
        val expect = (0 until Dim).map(i => jlSign(j, i) * q(i)).sum
        assert(ys(j) === expect, s"vec $id dim $j")
      }
    }
    // distance preservation: E[||ya−yb||²] = (k/1)·... with ±1 signs the
    // estimator is ||ya−yb||²/k ≈ ||qa−qb||²; check the mean ratio over a
    // deterministic pair sample sits in a loose band
    val ids = embs.keys.toSeq.sorted.take(40)
    val ratios = for {
      a <- ids; b <- ids if a < b
      d2 = (0 until Dim).map(i => BigInt(embs(a)(i) - embs(b)(i)).pow(2)).sum
      if d2 > 0
      p2 = (0 until JlK).map(j => BigInt(got(a)(j) - got(b)(j)).pow(2)).sum
    } yield (BigDecimal(p2) / BigDecimal(JlK) / BigDecimal(d2)).toDouble
    val mean = ratios.sum / ratios.size
    assert(mean > 0.5 && mean < 2.0, s"mean distance ratio $mean")
  }

  test("cluster_topterms equals a c-TF-IDF recount over the semantic cells") {
    def lnMilli(x: Double): Long = math.round(
      BigDecimal(math.log(x))
        .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble * 1000)
    // semantic_dedup exposes the SAME trained cell assignment
    val cells = SparkEntry.queries("semantic_dedup")(spark, sf001)
      .select($"vec_id", $"cell").as[(Long, Long)].collect().toMap
    val docTerms = Tables.t(spark, sf001, "documents")
      .select($"doc_id", split($"text", " ").as("toks"))
      .as[(Long, Array[String])].collect().toSeq
    val ct = docTerms.flatMap { case (d, toks) =>
      cells.get(d).toSeq.flatMap(c => toks.map(t => (c, t)))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nC = ct.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2).sum).toMap
    val dfC = ct.keys.toSeq.groupBy(_._2).view
      .mapValues(_.map(_._1).distinct.size.toLong).toMap
    val nCells = ct.keys.map(_._1).toSeq.distinct.size.toLong
    val expected = ct.toSeq.map { case ((c, t), tf) =>
      (c, t, tf,
        (tf * 1000000L / nC(c)) * lnMilli(nCells.toDouble / dfC(t).toDouble))
    }.groupBy(_._1).view.mapValues(_.sortBy(r => (-r._4, r._2)).take(5))
      .toMap
    val got = SparkEntry.queries("cluster_topterms")(spark, sf001)
      .as[(Long, Long, String, Long, Long)].collect().toSeq
    got.groupBy(_._1).foreach { case (c, rows) =>
      val exp = expected(c)
      assert(rows.sortBy(_._2).map(r => (r._3, r._4, r._5))
        === exp.map(r => (r._2, r._3, r._4)), s"cell $c")
    }
    assert(got.map(_._1).distinct.sorted === expected.keys.toSeq.sorted)
  }

  test("mutual_knn pairs are exactly the reciprocal top-10 neighbor pairs") {
    // the engine's quantized dot works on the RAW float values (cast to
    // double), not on the 1e6-quantized elements
    def dotQ(x: Array[Float], y: Array[Float]): Long =
      (0 until Dim).map(i =>
        math.round(x(i).toDouble * y(i).toDouble * 1e16)).sum
    def cosine(a: Long, b: Long): Double =
      dotQ(raw(a), raw(b)).toDouble /
        (math.sqrt(dotQ(raw(a), raw(a)).toDouble) *
          math.sqrt(dotQ(raw(b), raw(b)).toDouble))
    val qids = raw.keys.filter(_ < 100).toSeq.sorted
    val all = raw.keys.toSeq.sorted
    val nn: Map[Long, Seq[(Long, Long)]] = qids.map { q =>
      val ranked = all.filter(_ != q)
        .map(c => (c, cosine(q, c)))
        .sortBy { case (c, cos) => (-cos, c) }
        .take(KnnK).zipWithIndex
        .map { case ((c, _), idx) => (c, idx + 1L) }
      q -> ranked
    }.toMap
    val expected = (for {
      a <- qids; (b, rab) <- nn(a) if a < b && nn.contains(b)
      rba <- nn(b).collectFirst { case (`a`, r) => r }
    } yield (a, b, rab, rba)).toSet
    val got = SparkEntry.queries("mutual_knn")(spark, sf001)
      .select($"a_id", $"b_id", $"rank_ab", $"rank_ba")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === expected)
  }

  test("pca_projection captures the top eigenvalue: score variance matches " +
      "an unquantized power-iteration lambda1 and dominates every axis") {
    val d = 16
    val got = SparkEntry.queries("pca_projection")(spark, sf001)
      .select($"vec_id", $"pc1").as[(Long, Double)].collect().toMap
    assert(got.keySet === raw.keySet)
    // covariance of the first 16 dims in plain double (independent recompute)
    val xs = raw.toSeq.sortBy(_._1).map(_._2.take(d).map(_.toDouble))
    val n = xs.size.toDouble
    val mean = (0 until d).map(i => xs.map(_(i)).sum / n)
    val cov = Array.tabulate(d, d)((i, j) =>
      xs.map(x => (x(i) - mean(i)) * (x(j) - mean(j))).sum / n)
    // unquantized power iteration, far past the query's 30 steps
    var v = Array.fill(d)(1.0 / math.sqrt(d))
    for (_ <- 0 until 300) {
      val w = Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * v(j)).sum)
      val nm = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / nm)
    }
    val lambda1 =
      (0 until d).map(i => v(i) * (0 until d).map(j => cov(i)(j) * v(j)).sum).sum
    // variance of the projected scores (projection of raw x; the mean offset
    // cancels in the variance)
    val scores = raw.keys.toSeq.sorted.map(got)
    val sMean = scores.sum / n
    val sVar = scores.map(x => (x - sMean) * (x - sMean)).sum / n
    assert(math.abs(sVar - lambda1) / lambda1 < 0.02,
      s"var(pc1)=$sVar vs lambda1=$lambda1")
    val maxAxisVar = (0 until d).map(i => cov(i)(i)).max
    assert(sVar >= maxAxisVar * 0.999,
      s"var(pc1)=$sVar below best single axis $maxAxisVar")
  }

  test("int8_quantization_error equals the literal recompute and residuals " +
      "stay within half a quantization step") {
    val raw = Tables.t(spark, sf001, "embeddings")
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    val expected = raw.map { case (id, v) =>
      val xq = v.map(x => math.round(x.toDouble * 1e6))
      val (mnq, mxq) = (xq.min, xq.max)
      val rng = mxq - mnq
      val errs =
        if (rng == 0L) xq.map(_ => 0L)
        else xq.map { e =>
          val a = (e - mnq) * 255L
          a - ((2 * a + rng) / (2 * rng)) * rng
        }
      (id, xq.size.toLong, rng, errs.map(e => e * e).sum,
        errs.map(math.abs).foldLeft(0L)(math.max))
    }.sortBy(_._1).toSeq
    val got = SparkEntry.queries("int8_quantization_error")(spark, sf001)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === expected)
    // |err255| <= rng/2 + rounding slack: half a step in the x255 domain
    got.foreach { case (id, _, rng, _, mx) =>
      assert(mx <= rng / 2 + 1, s"vec $id residual $mx exceeds half-step")
    }
  }
}
