package graft

import org.apache.spark.sql.functions._

/** Round-5 training-prep additions: BPE pair counting, token entropy,
  * robust (MAD) outliers, daily exponential smoothing, temperature-scaled
  * source mixing. Each test recomputes the statistic independently in
  * plain Scala over the collected sf0.001 inputs.
  */
class TrainingPrepSpec extends SparkSpec {
  import spark.implicits._

  private def docRows: Seq[(Long, String)] =
    Tables.t(spark, sf001, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq

  test("lang_confusion cells partition the per-doc lang_id verdicts and " +
      "recall recounts") {
    val verdicts = SparkEntry.queries("lang_id")(spark, sf001)
      .select($"lang", $"detected_lang").as[(String, String)].collect()
    val got = SparkEntry.queries("lang_confusion")(spark, sf001)
      .select($"lang", $"detected_lang", $"n", $"recall")
      .as[(String, String, Long, Option[Double])].collect()
    val expected = verdicts.groupBy(identity).view.mapValues(_.length.toLong)
    assert(got.map(r => (r._1, r._2) -> r._3).toMap === expected.toMap)
    assert(got.map(_._3).sum === verdicts.length)
    val perLang = verdicts.groupBy(_._1).view.mapValues(_.length.toLong)
    got.foreach { case (l, d, n, rec) =>
      if (l == d) assert(rec.exists(r => math.abs(r - n.toDouble / perLang(l)) < 1e-12))
      else assert(rec.isEmpty)
    }
  }

  test("zipf_slope equals a plain-Scala quantized OLS over ln-rank/ln-freq") {
    val rows = Tables.t(spark, sf001, "documents")
      .select($"source", $"text").as[(String, String)].collect()
    val got = SparkEntry.queries("zipf_slope")(spark, sf001)
      .select($"source", $"n_terms", $"zipf_slope", $"ln_intercept")
      .as[(String, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    rows.groupBy(_._1).foreach { case (src, grp) =>
      val freq = grp.flatMap(_._2.split(" ", -1)).groupBy(identity)
        .view.mapValues(_.length.toLong).toSeq
        .sortBy { case (t, f) => (-f, t) }
      val xy = freq.zipWithIndex.map { case ((_, f), i) =>
        (math.round(math.log((i + 1).toDouble) * 1e6),
          math.round(math.log(f.toDouble) * 1e6))
      }
      val n = xy.length.toDouble
      val (sx, sy) = (xy.map(_._1).sum.toDouble, xy.map(_._2).sum.toDouble)
      val sxy = xy.map(p => p._1 * p._2).sum.toDouble
      val sxx = xy.map(p => p._1 * p._1).sum.toDouble
      val slope = (sxy - sx * sy / n) / (sxx - sx * sx / n)
      val (_, gn, gSlope, gInt) = got(src)
      assert(gn === xy.length)
      assert(math.abs(gSlope - slope) < 1e-9, s"slope $src")
      assert(math.abs(gInt - (sy / n - slope * (sx / n)) / 1e6) < 1e-9)
    }
  }

  test("moments_by_type matches a plain-Scala central-moment recompute") {
    val vals = Tables.t(spark, sf001, "events")
      .select($"event_type", $"value").as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val got = SparkEntry.queries("moments_by_type")(spark, sf001)
      .select($"event_type", $"n", $"mean", $"variance", $"skewness", $"kurtosis")
      .as[(String, Long, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    vals.foreach { case (et, xs) =>
      val n = xs.length.toDouble
      val mean = xs.sum / n
      def cm(k: Int) = xs.map(x => math.pow(x - mean, k)).sum / n
      val (m2, m3, m4) = (cm(2), cm(3), cm(4))
      val (_, gn, gMean, gVar, gSkew, gKurt) = got(et)
      assert(gn === xs.length)
      assert(math.abs(gMean - mean) < 1e-9)
      assert(math.abs(gVar - m2) < 1e-6)
      assert(math.abs(gSkew - m3 / (m2 * math.sqrt(m2))) < 1e-6, s"skew $et")
      assert(math.abs(gKurt - (m4 / (m2 * m2) - 3)) < 1e-6, s"kurt $et")
    }
  }

  test("benford_digits covers digits 1-9, fractions sum to 1, expectation " +
      "is Benford's law") {
    val rows = SparkEntry.queries("benford_digits")(spark, sf001)
      .select($"digit", $"n", $"obs_frac", $"benford_frac")
      .as[(String, Long, Double, Double)].collect()
    assert(rows.map(_._1).toSet === (1 to 9).map(_.toString).toSet)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-12)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-9) // Σ log10(1+1/d) = 1
    rows.foreach { case (d, _, _, bf) =>
      assert(math.abs(bf - math.log10(1.0 + 1.0 / d.toInt)) < 1e-9)
    }
    val total = Tables.t(spark, sf001, "lineitem").count()
    assert(rows.map(_._2).sum === total)
  }

  test("weighted_median matches a sequential weighted-rank scan per flag") {
    val rows = Tables.t(spark, sf001, "lineitem")
      .select($"l_returnflag", $"l_extendedprice", $"l_quantity")
      .as[(String, Double, Double)].collect()
    val got = SparkEntry.queries("weighted_median")(spark, sf001)
      .select($"l_returnflag", $"total_weight", $"wp25", $"w_median", $"wp75")
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    rows.groupBy(_._1).foreach { case (flag, grp) =>
      val sorted = grp.map(t => (t._2, t._3.toLong)).sortBy(_._1)
      val tot = sorted.map(_._2).sum
      def cut(num: Long, den: Long): Double = {
        var cum = 0L
        sorted.find { case (_, w) => cum += w; cum * den >= tot * num }.get._1
      }
      val (_, gTot, gP25, gMed, gP75) = got(flag)
      assert(gTot === tot)
      assert(gP25 === cut(1, 4) && gMed === cut(1, 2) && gP75 === cut(3, 4),
        s"flag $flag")
    }
  }

  test("bpe_pair_counts matches a plain-Scala adjacent-pair count") {
    val expected = docRows
      .flatMap { case (_, text) =>
        val toks = text.split(" ", -1)
        if (toks.length < 2) Nil
        else toks.sliding(2).map(p => p(0) + " " + p(1)).toSeq
      }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = SparkEntry.queries("bpe_pair_counts")(spark, sf001)
      .as[(String, Long)].collect()
    assert(got.length === math.min(50, expected.size))
    got.foreach { case (pair, freq) =>
      assert(expected(pair) === freq, s"pair '$pair'")
    }
    // top-50 really is the top: every returned freq >= every excluded freq
    val floor = got.map(_._2).min
    val excluded = expected.filter { case (p, _) => !got.exists(_._1 == p) }
    assert(excluded.values.forall(_ <= floor))
  }

  test("token_entropy: ln(n) for all-distinct docs, 0 for constant docs, within [0, ln n]") {
    val byDoc = docRows.toMap
    val got = SparkEntry.queries("token_entropy")(spark, sf001)
      .select($"doc_id", $"n_tokens", $"entropy").as[(Long, Long, Double)]
      .collect()
    assert(got.length === byDoc.size)
    got.foreach { case (id, n, h) =>
      val toks = byDoc(id).split(" ", -1)
      assert(n === toks.length.toLong)
      assert(h >= -1e-9 && h <= math.log(n.toDouble) + 1e-3, s"doc $id")
      if (toks.distinct.length == toks.length)
        assert(math.abs(h - math.log(n.toDouble)) < 2e-3, s"distinct doc $id")
      if (toks.distinct.length == 1)
        assert(math.abs(h) < 1e-9, s"constant doc $id")
    }
  }

  test("mad_outliers matches an independent lower-median/MAD computation") {
    val ev = Tables.t(spark, sf001, "events")
      .select($"event_type", round($"value" * 100).cast("long"))
      .as[(String, Long)].collect().toSeq
    def lowerMedian(xs: Seq[Long]): Long = {
      val sorted = xs.sorted
      sorted((math.ceil(xs.size / 2.0) - 1).toInt)
    }
    val got = SparkEntry.queries("mad_outliers")(spark, sf001)
      .select($"event_type", $"n", $"median", $"mad", $"n_outliers")
      .as[(String, Long, Double, Double, Long)].collect()
    val byType = ev.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(got.map(_._1).toSeq === byType.keys.toSeq.sorted)
    got.foreach { case (t, n, med, mad, nOut) =>
      val vs = byType(t)
      val m = lowerMedian(vs)
      val d = vs.map(v => math.abs(v - m))
      val md = lowerMedian(d)
      assert(n === vs.size.toLong)
      assert(med === m / 100.0)
      assert(mad === md / 100.0)
      assert(nOut === d.count(_ > 3 * md).toLong)
    }
  }

  test("winsorize_clip cut points are exact order statistics and the " +
      "winsorized mean is the clipped-sum division") {
    val ev = Tables.t(spark, sf001, "events")
      .select($"event_type", round($"value" * 100).cast("long"))
      .as[(String, Long)].collect().toSeq
    val got = SparkEntry.queries("winsorize_clip")(spark, sf001)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    val byType = ev.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(got.map(_._1).toSeq === byType.keys.toSeq.sorted)
    got.foreach { case (t, n, lo, hi, nClip, winMean) =>
      val vs = byType(t)
      val sorted = vs.sorted
      def orderStat(num: Long, den: Long): Long = // smallest v with cum ≥ ⌈num·n/den⌉
        sorted((((num * vs.size + den - 1) / den) - 1).toInt)
      assert(n === vs.size.toLong)
      assert(lo === orderStat(1, 20), s"$t p05")
      assert(hi === orderStat(19, 20), s"$t p95")
      assert(nClip === vs.count(v => v < lo || v > hi).toLong)
      val clippedSum = vs.map(v => math.min(math.max(v, lo), hi)).sum
      assert(winMean === clippedSum * 10000L / vs.size)
    }
  }

  test("bootstrap_ci replica means and order-statistic band recount") {
    val ev = Tables.t(spark, sf001, "events")
      .select($"event_type", $"event_id", round($"value" * 1e6).cast("long"))
      .as[(String, Long, Long)].collect().toSeq
    val thresholds = Seq(24109L, 48218L, 60273L, 64291L, 65296L, 65497L,
      65530L)
    def weight(id: Long, b: Int): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:${b / 8}".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val u = java.lang.Long.parseLong(
        hex.substring((b % 8) * 4, (b % 8) * 4 + 4), 16)
      thresholds.count(_ <= u).toLong
    }
    val got = SparkEntry.queries("bootstrap_ci")(spark, sf001)
      .as[(String, Long, Long, Long, Long)].collect()
    val byType = ev.groupBy(_._1)
    assert(got.map(_._1).toSeq === byType.keys.toSeq.sorted)
    got.foreach { case (t, n, mean, lo, hi) =>
      val rows = byType(t)
      assert(n === rows.size.toLong)
      assert(mean === rows.map(_._3).sum / rows.size)
      val means = (0 until 32).map { b =>
        val ws = rows.map(r => (weight(r._2, b), r._3))
        ws.map { case (w, x) => w * x }.sum / ws.map(_._1).sum
      }.sorted
      assert(lo === means(1) && hi === means(30), s"type $t")
    }
  }

  test("quantile_normalize maps each value to the pooled inverse CDF " +
      "position, monotone within type") {
    val ev = Tables.t(spark, sf001, "events")
      .select($"event_type", round($"value" * 100).cast("long"))
      .as[(String, Long)].collect().toSeq
    val pooledSorted = ev.map(_._2).sorted
    val nPool = pooledSorted.size.toLong
    val byType = ev.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val got = SparkEntry.queries("quantile_normalize")(spark, sf001)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val expectedRows = byType.toSeq.flatMap { case (t, vs) =>
      val n = vs.size.toLong
      vs.groupBy(identity).view.mapValues(_.size.toLong).toSeq.map {
        case (v, cnt) =>
          val r = vs.count(_ <= v).toLong
          val q = (r * nPool + n - 1) / n
          (t, v, cnt, q, pooledSorted((q - 1).toInt))
      }
    }.toSet
    assert(got.toSet === expectedRows)
    got.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a._5 <= b._5, s"non-monotone at $b")
        case _ =>
      }
    }
  }

  test("mutual_information recount: deciles, ln-milli assembly, and the " +
      "information inequalities") {
    def lnMilli(x: Double): Long = math.round(
      BigDecimal(math.log(x))
        .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble * 1000)
    val ev = Tables.t(spark, sf001, "events")
      .select($"event_type", round($"value" * 100).cast("long"))
      .as[(String, Long)].collect().toSeq
    val n = ev.size.toLong
    val sorted = ev.map(_._2).sorted
    val bl = (1 to 9).map(i =>
      sorted((math.ceil(n * i / 10.0) - 1).toInt))
    def bucket(v: Long): Long = bl.count(v >= _).toLong
    val cells = ev.groupBy(e => (e._1, bucket(e._2))).view
      .mapValues(_.size.toLong).toMap
    val nt = cells.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val nb = cells.toSeq.groupBy(_._1._2).view.mapValues(_.map(_._2).sum).toMap
    val miS = cells.map { case ((t, b), c) =>
      c * lnMilli(c.toDouble * n / (nt(t).toDouble * nb(b).toDouble))
    }.sum
    val htS = nt.values.map(c =>
      c * (lnMilli(n.toDouble) - lnMilli(c.toDouble))).sum
    val hbS = nb.values.map(c =>
      c * (lnMilli(n.toDouble) - lnMilli(c.toDouble))).sum
    val got = SparkEntry.queries("mutual_information")(spark, sf001)
      .as[(Long, Double, Double, Double, Double)].collect().head
    assert(got._1 === n)
    assert(got._2 === miS.toDouble / n / 1000.0)
    assert(got._3 === htS.toDouble / n / 1000.0)
    assert(got._4 === hbS.toDouble / n / 1000.0)
    assert(got._5 === miS.toDouble / math.min(htS, hbS).toDouble)
    // information inequalities (up to ln-milli rounding slack)
    assert(got._2 >= -0.001 && got._2 <= math.min(got._3, got._4) + 0.001)
  }

  test("ema_daily equals the sequential integer fold of daily means") {
    val daily = Tables.t(spark, sf001, "events")
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg((sum(round($"value" * 1e6).cast("long"))).as("s"), count(lit(1)).as("c"))
      .select($"event_type", $"day".cast("string"), expr("s div c"))
      .as[(String, String, Long)].collect().toSeq
    val got = SparkEntry.queries("ema_daily")(spark, sf001)
      .select($"event_type", $"day".cast("string"), $"mean_micro", $"ema_micro")
      .as[(String, String, Long, Long)].collect()
    val byType = daily.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(x => (x._2, x._3))).toMap
    byType.foreach { case (t, series) =>
      var ema = series.head._2
      val expected = series.zipWithIndex.map { case ((day, mean), i) =>
        if (i > 0) ema = Math.floorDiv(ema + mean, 2) // positives: = trunc div
        (day, mean, ema)
      }
      val gotT = got.filter(_._1 == t).map(r => (r._2, r._3, r._4)).toSeq
      assert(gotT === expected, s"type $t")
    }
  }

  test("psi_drift: zero on the baseline day, matches an independent recompute") {
    val ev = Tables.t(spark, sf001, "events")
      .select(to_date($"ts").cast("string"), round($"value" * 100).cast("long"))
      .as[(String, Long)].collect().toSeq
    val d1 = ev.filter(_._1 == "2024-01-01").map(_._2).sorted
    val n = d1.size
    val bnds = (1 to 9).map(i => d1((math.ceil(n * i / 10.0) - 1).toInt))
    def bucket(v: Long): Long = bnds.count(v >= _).toLong
    val byDay = ev.groupBy(_._1).view
      .mapValues(_.map(x => bucket(x._2)).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap).toMap
    val q = byDay("2024-01-01")
    val nq = q.values.sum
    val got = SparkEntry.queries("psi_drift")(spark, sf001)
      .select($"day".cast("string"), $"n_buckets", $"psi")
      .as[(String, Long, Double)].collect()
    assert(got.length === byDay.size)
    got.foreach { case (day, nb, psi) =>
      val p = byDay(day)
      val shared = p.keySet.intersect(q.keySet)
      assert(nb === shared.size.toLong)
      val nd = p.values.sum
      val s = shared.toSeq.map { b =>
        val lnMilli = math.round(
          BigDecimal(math.log(p(b).toDouble * nq / (q(b).toDouble * nd)))
            .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble * 1000)
        (p(b) * nq - q(b) * nd) * lnMilli
      }.sum
      val expected = s.toDouble / (nd.toDouble * nq.toDouble) / 1000.0
      assert(math.abs(psi - expected) < 1e-12, s"day $day")
      if (day == "2024-01-01") assert(psi === 0.0)
      assert(psi >= -1e-12) // PSI is a sum of (p-q)ln(p/q) terms, each >= 0
    }
  }

  test("temperature_mixture: sqrt quotas rebalance toward small sources, md5-first fill") {
    val counts = Tables.t(spark, sf001, "documents")
      .groupBy($"source").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val sMilli = counts.view.mapValues(n => math.floor(math.sqrt(n.toDouble) * 1000).toLong).toMap
    val tot = sMilli.values.sum
    val quotas = sMilli.view.mapValues(s => 120L * s / tot).toMap
    val got = SparkEntry.queries("temperature_mixture")(spark, sf001)
      .select($"source", $"rk", $"doc_id", $"quota")
      .as[(String, Long, Long, Long)].collect()
    // quota column matches the closed form; every source fills exactly quota rows
    got.groupBy(_._1).foreach { case (src, rows) =>
      assert(rows.head._4 === quotas(src))
      assert(rows.length.toLong === math.min(quotas(src), counts(src)))
      assert(rows.map(_._2).sorted.toSeq === (1L to rows.length).toSeq)
    }
    // temperature flattening: sampled share of the smallest source exceeds
    // its corpus share, and the largest source's is reduced
    val (minSrc, maxSrc) = (counts.minBy(_._2)._1, counts.maxBy(_._2)._1)
    if (minSrc != maxSrc && counts(minSrc) < counts(maxSrc)) {
      val totalDocs = counts.values.sum.toDouble
      val sampled = got.length.toDouble
      assert(quotas(minSrc) / sampled >= counts(minSrc) / totalDocs - 1e-9)
      assert(quotas(maxSrc) / sampled <= counts(maxSrc) / totalDocs + 1e-9)
    }
  }

  private def eventVals(types: String*): Map[String, Seq[Long]] =
    Tables.t(spark, sf001, "events")
      .filter($"value".isNotNull &&
        (if (types.isEmpty) lit(true) else $"event_type".isin(types: _*)))
      .select($"event_type", round($"value" * 1e6).cast("long"))
      .as[(String, Long)].collect().toSeq.groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap

  test("ks_test D equals the brute-force max CDF gap over the merged domain") {
    val vals = eventVals("click", "view")
    val (a, b) = (vals("click").sorted, vals("view").sorted)
    val domain = (a ++ b).distinct.sorted
    val dNum = domain.map { x =>
      math.abs(a.count(_ <= x).toLong * b.length - b.count(_ <= x).toLong * a.length)
    }.max
    val row = SparkEntry.queries("ks_test")(spark, sf001)
      .select($"n_a", $"n_b", $"d_num", $"d_micro", $"reject_05")
      .as[(Long, Long, Long, Long, Boolean)].collect().head
    assert(row._1 === a.length.toLong)
    assert(row._2 === b.length.toLong)
    assert(row._3 === dNum)
    assert(row._4 === math.round(dNum.toDouble / (a.length.toLong * b.length) * 1e6))
    val d = dNum.toDouble / (a.length.toLong * b.length)
    val crit = 1.3581015 * math.sqrt((a.length + b.length).toDouble /
      (a.length.toLong * b.length).toDouble)
    assert(row._5 === d > crit)
  }

  test("welch_ttest matches a plain-Scala one-vs-rest Welch computation") {
    val vals = eventVals()
    val all = vals.values.flatten.toSeq
    val got = SparkEntry.queries("welch_ttest")(spark, sf001)
      .select($"event_type", $"n_x", $"n_y", $"t_micro", $"df_milli")
      .as[(String, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    vals.foreach { case (et, xs) =>
      val ys = all.diff(xs)
      def mv(zs: Seq[Long]): (Double, Double) = {
        val n = zs.length.toDouble
        val s = zs.map(BigInt(_)).sum
        val q = zs.map(z => BigInt(z) * z).sum
        val m = s.toDouble / n
        (m, (q.toDouble - s.toDouble * s.toDouble / n) / (n - 1.0))
      }
      val ((mx, vx), (my, vy)) = (mv(xs), mv(ys))
      val sse = vx / xs.length + vy / ys.length
      val t = (mx - my) / math.sqrt(sse)
      val df = sse * sse / ((vx / xs.length) * (vx / xs.length) / (xs.length - 1.0) +
        (vy / ys.length) * (vy / ys.length) / (ys.length - 1.0))
      val (_, nx, ny, tMicro, dfMilli) = got(et)
      assert(nx === xs.length.toLong)
      assert(ny === ys.length.toLong)
      assert(math.abs(tMicro - t * 1e6) <= 1.0, s"t for $et")
      assert(math.abs(dfMilli - df * 1e3) <= 1.0, s"df for $et")
      // Welch df is bounded by min(nx,ny)-1 below and nx+ny-2 above
      assert(dfMilli >= (math.min(nx, ny) - 1) * 1000 - 1000)
      assert(dfMilli <= (nx + ny - 2) * 1000 + 1000)
    }
  }

  test("hellinger_drift: zero on the baseline day, [0,1]-bounded, recount") {
    val rows = Tables.t(spark, sf001, "events")
      .select(to_date($"ts").cast("string"), $"event_type")
      .as[(String, String)].collect().toSeq
    val byDay = rows.groupBy(_._1).view
      .mapValues(_.groupBy(_._2).view.mapValues(_.length.toLong).toMap).toMap
    val base = byDay("2024-01-01")
    val nq = base.values.sum.toDouble
    val types = rows.map(_._2).distinct
    val got = SparkEntry.queries("hellinger_drift")(spark, sf001)
      .select($"day".cast("string"), $"n_types", $"h2_pico", $"hellinger")
      .as[(String, Long, Long, Double)].collect()
    assert(got.map(_._1).toSet === byDay.keySet)
    got.foreach { case (day, nTypes, h2Pico, h) =>
      val counts = byDay(day)
      val nd = counts.values.sum.toDouble
      assert(nTypes === counts.size.toLong)
      val expected = types.map { t =>
        val d = math.sqrt(counts.getOrElse(t, 0L) / nd) -
          math.sqrt(base.getOrElse(t, 0L) / nq)
        math.round(d * d * 1e12)
      }.sum
      assert(h2Pico === expected, s"day $day")
      assert(h === math.sqrt(h2Pico.toDouble / 2e12))
      assert(h >= 0.0 && h <= 1.0 + 1e-12)
      if (day == "2024-01-01") assert(h === 0.0)
    }
  }

  test("changepoint_daily picks the brute-force best SSE-reduction split") {
    val daily = Tables.t(spark, sf001, "events")
      .groupBy($"event_type", to_date($"ts").cast("string").as("day"))
      .agg(sum(round($"value" * 1e6).cast("long")).as("sm"), count(lit(1)).as("c"))
      .select($"event_type", $"day", ($"sm" / $"c").cast("long"),
        expr("sm div c"))
      .as[(String, String, Long, Long)].collect()
    val got = SparkEntry.queries("changepoint_daily")(spark, sf001)
      .select($"event_type", $"chg_day".cast("string"), $"n_days",
        $"score_micro", $"mean_before_micro", $"mean_after_micro")
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    daily.groupBy(_._1).foreach { case (et, grp) =>
      val series = grp.sortBy(_._2).map(_._4) // sm div c, in day order
      val days = grp.sortBy(_._2).map(_._2)
      val n = series.length
      val s = series.sum
      val scored = (1 until n).map { k =>
        val sk = series.take(k).sum
        val score = math.round((sk.toDouble * sk / k +
          (s - sk).toDouble * (s - sk) / (n - k) - s.toDouble * s / n) / 1e6)
        (score, days(k - 1), sk / k, (s - sk) / (n - k))
      }
      val best = scored.maxBy(c => (c._1, -days.indexOf(c._2)))
      // tie-break: earliest day among equal scores
      val bestEarliest = scored.filter(_._1 == best._1).minBy(_._2)
      val (_, gDay, gN, gScore, gBefore, gAfter) = got(et)
      assert(gN === n.toLong)
      assert(gScore === bestEarliest._1, s"score for $et")
      assert(gDay === bestEarliest._2, s"day for $et")
      assert(gBefore === bestEarliest._3)
      assert(gAfter === bestEarliest._4)
    }
  }

  test("recsys_ndcg_eval: bounded by 1, consistent with the top-1 hit count") {
    val ndcg = SparkEntry.queries("recsys_ndcg_eval")(spark, sf001)
      .select($"n_test_baskets", $"n_evaluable", $"sum_ndcg_micro", $"mean_ndcg")
      .as[(Long, Long, Long, Double)].collect().head
    assert(ndcg._2 > 0)
    assert(ndcg._4 >= 0.0 && ndcg._4 <= 1.0)
    assert(ndcg._4 === ndcg._3.toDouble / ndcg._2.toDouble / 1e6)
    assert(ndcg._1 <= ndcg._2) // every basket contributes >= 1 evaluable part
  }

  test("bpe_learned_merges equals a plain-Scala greedy BPE trainer") {
    val words = Tables.t(spark, sf001, "documents")
      .select($"text").as[String].collect()
      .flatMap(_.split(" ", -1)).filter(_.matches("^[a-z]+$"))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    var vocab: Map[Vector[String], Long] =
      words.toSeq.map { case (w, c) => w.map(_.toString).toVector -> c }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val expected = (1 to 4).map { r =>
      val pc = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, c) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => pc((a, b)) = pc.getOrElse((a, b), 0L) + c
          case _ =>
        }
      }
      val ((a, b), c) = pc.toSeq.minBy { case ((x, y), n) => (-n, x, y) }
      vocab = vocab.toSeq.map { case (syms, cnt) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        out.result() -> cnt
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      (r.toLong, a, b, c, a + b)
    }
    val got = SparkEntry.queries("bpe_learned_merges")(spark, sf001)
      .select($"round", $"sym_a", $"sym_b", $"pair_count", $"merged")
      .as[(Long, String, String, Long, String)].collect().toSeq
    assert(got === expected)
  }

  test("wilson_ci equals the closed-form score interval and brackets the rate") {
    val got = SparkEntry.queries("wilson_ci")(spark, sf001)
      .select($"arm", $"n", $"x", $"rate", $"lo_micro", $"hi_micro")
      .as[(Long, Long, Long, Double, Long, Long)].collect()
    assert(got.map(_._1).toSeq === Seq(0L, 1L))
    val z = 1.959964
    got.foreach { case (_, n, x, rate, lo, hi) =>
      assert(rate === x.toDouble / n)
      val p = x.toDouble / n
      val denom = 1.0 + z * z / n
      val center = (p + z * z / n / 2.0) / denom
      val half = z * math.sqrt(p * (1.0 - p) / n + z * z / (4.0 * n.toDouble * n)) / denom
      assert(lo === math.round((center - half) * 1e6))
      assert(hi === math.round((center + half) * 1e6))
      // interval properties: inside [0,1], brackets the observed rate
      assert(lo >= 0L && hi <= 1000000L)
      assert(lo <= math.round(rate * 1e6) && math.round(rate * 1e6) <= hi)
    }
  }

  test("bpe_compression: per-source token counts equal the trainer's " +
      "final vocabulary applied to the corpus") {
    // reuse the plain-Scala trainer from the merges test to get the final
    // vocab's symbol count per word
    val rows = Tables.t(spark, sf001, "documents")
      .select($"source", $"text").as[(String, String)].collect()
    val words = rows.flatMap(_._2.split(" ", -1)).filter(_.matches("^[a-z]+$"))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    var vocab: Map[String, Vector[String]] =
      words.keys.map(w => w -> w.map(_.toString).toVector).toMap
    (1 to 4).foreach { _ =>
      val pc = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (w, syms) =>
        syms.sliding(2).foreach {
          case Vector(a, b) =>
            pc((a, b)) = pc.getOrElse((a, b), 0L) + words(w)
          case _ =>
        }
      }
      val ((a, b), _) = pc.toSeq.minBy { case ((x, y), n) => (-n, x, y) }
      vocab = vocab.view.mapValues { syms =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        out.result()
      }.toMap
    }
    val expected = rows.groupBy(_._1).view.mapValues { docs =>
      val ws = docs.flatMap(_._2.split(" ", -1)).filter(_.matches("^[a-z]+$"))
      val chars = ws.map(_.length.toLong).sum
      val toks = ws.map(w => vocab(w).length.toLong).sum
      (ws.length.toLong, chars, toks, toks * 1000000L / chars)
    }.toMap
    val got = SparkEntry.queries("bpe_compression")(spark, sf001)
      .select($"source", $"n_words", $"n_chars", $"n_tokens", $"compression_ppm")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.map(_._1).toSet === expected.keySet)
    got.foreach { case (src, nw, nc, nt, ppm) =>
      assert((nw, nc, nt, ppm) === expected(src), s"source $src")
      assert(nt <= nc) // merges only ever shrink the symbol count
    }
  }

  test("hits_scores equals a plain-Scala 2-round mutual reinforcement") {
    val edges = Tables.t(spark, sf001, "orders")
      .join(Tables.t(spark, sf001, "lineitem"),
        $"o_orderkey" === $"l_orderkey")
      .select($"o_custkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect().toSeq
    val hub1 = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val auth1 = edges.groupBy(_._2).view
      .mapValues(_.map(e => hub1(e._1)).sum).toMap
    val hub2 = edges.groupBy(_._1).view
      .mapValues(_.map(e => BigInt(auth1(e._2))).sum).toMap
    val auth2 = edges.groupBy(_._2).view
      .mapValues(_.map(e => hub2(e._1)).sum).toMap
    val maxA = auth2.values.max
    val got = SparkEntry.queries("hits_scores")(spark, sf001)
      .select($"part", $"n_buyers", $"auth_ppm", $"auth_score")
      .as[(Long, Long, Long, Double)].collect()
    assert(got.length === math.min(20, auth2.size))
    val expectedTop = auth2.toSeq
      .map { case (p, a) => (p, (a * 1000000 / maxA).toLong) }
      .sortBy { case (p, ppm) => (-ppm, p) }.take(got.length)
    assert(got.map(r => (r._1, r._3)).toSeq === expectedTop)
    got.foreach { case (p, nb, _, score) =>
      assert(nb === edges.count(_._2 == p).toLong)
      assert(score === auth2(p).toDouble)
    }
    // the top authority is at ppm 1000000 iff it is the argmax
    assert(got.map(_._3).max === 1000000L)
  }

  test("lift_by_decile: decile cuts, lift, and cumulative gain recount") {
    val users = Tables.t(spark, sf001, "events")
      .groupBy($"user_id").agg(
        sum(when($"event_type".isin("click", "view"), 1L).otherwise(0L))
          .as("score"),
        max(when($"event_type" === "purchase", 1L).otherwise(0L)).as("label"))
      .select($"user_id", $"score".cast("long"), $"label".cast("long"))
      .as[(Long, Long, Long)].collect().toSeq
    val ranked = users.sortBy { case (uid, sc, _) => (-sc, uid) }.zipWithIndex
    val n = users.length.toLong
    val byDecile = ranked.groupBy { case (_, i) => i.toLong * 10 / n + 1 }
    val ct = users.map(_._3).sum
    val got = SparkEntry.queries("lift_by_decile")(spark, sf001)
      .select($"decile", $"n_users", $"n_conv", $"min_score", $"max_score",
        $"conv_ppm", $"lift_micro", $"cum_gain_ppm")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.map(_._1).toSeq === got.map(_._1).toSeq.sorted)
    var cum = 0L
    got.foreach { case (d, nu, nc, mins, maxs, ppm, lift, gain) =>
      val grp = byDecile(d).map(_._1)
      assert(nu === grp.length.toLong, s"decile $d")
      assert(nc === grp.map(_._3).sum)
      assert(mins === grp.map(_._2).min)
      assert(maxs === grp.map(_._2).max)
      assert(ppm === nc * 1000000L / nu)
      assert(lift === nc * n * 1000000L / (nu * ct))
      cum += nc
      assert(gain === cum * 1000000L / ct)
    }
    assert(got.map(_._2).sum === n)
    // gain curve ends at 100%
    assert(got.last._8 === 1000000L)
  }

  test("winnowing_fingerprints equals the brute per-window rightmost-min") {
    // the operator uses the O(1)-per-position run-length formulation in
    // BOTH engines, so the oracle can't catch a shared derivation bug —
    // this recomputes fingerprints the literal way: every window of 4
    // consecutive gram hashes, rightmost minimum, union over windows
    def h64(s0: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s0.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val expected = Tables.t(spark, sf001, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
      .flatMap { case (id, text) =>
        val toks = text.split(" ", -1)
        if (toks.length < 7) Seq.empty
        else {
          val hs = (0 to toks.length - 4)
            .map(i => h64("wn:" + toks.slice(i, i + 4).mkString(" ")))
          val sel = scala.collection.mutable.Set[Int]()
          for (s0 <- 0 to hs.length - 4) {
            val win = (s0 until s0 + 4)
            val m = win.map(hs).min
            sel += win.filter(p => hs(p) == m).max // rightmost min
          }
          sel.toSeq.sorted.map(p => (id, (p + 1).toLong, hs(p)))
        }
      }.sorted
    val got = SparkEntry.queries("winnowing_fingerprints")(spark, sf001)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(got === expected)
  }

  test("crossdoc_dup_spans equals the brute per-pair diagonal scan") {
    // both engines derive spans via the same gaps-and-islands trick, so the
    // oracle can't catch a shared derivation bug — this recomputes maximal
    // spans the literal way: for every doc pair and every (pa, pb) offset
    // pair, extend matching 8-gram runs one step at a time
    def h64(s0: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s0.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val docsSeq = Tables.t(spark, sf001, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val grams: Map[Long, Vector[Long]] = docsSeq.map { case (id, text) =>
      val toks = text.split(" ", -1)
      id -> (0 to toks.length - 8).toVector
        .map(i => h64("sp:" + toks.slice(i, i + 8).mkString(" ")))
    }.toMap
    val df = grams.toSeq.flatMap { case (id, hs) => hs.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val kept: Map[Long, Vector[Option[Long]]] = grams.view.mapValues(
      _.map(h => if (df(h) <= 16) Some(h) else None)).toMap
    val ids = docsSeq.map(_._1).sorted
    val expected = (for {
      ai <- ids.indices; bi <- (ai + 1) until ids.size
      (a, b) = (ids(ai), ids(bi))
      ha = kept(a); hb = kept(b)
      pa <- ha.indices; pb <- hb.indices
      // run start: positions 0-based here; a run starts where no previous
      // position continues it
      if ha(pa).isDefined && ha(pa) == hb(pb)
      if pa == 0 || pb == 0 || ha(pa - 1).isEmpty || ha(pa - 1) != hb(pb - 1)
    } yield {
      var len = 0
      while (pa + len < ha.size && pb + len < hb.size &&
        ha(pa + len).isDefined && ha(pa + len) == hb(pb + len)) len += 1
      (a, b, (pa + 1).toLong, (pb + 1).toLong, (len + 7).toLong)
    }).filter(_._5 >= 15).sorted
    val got = SparkEntry.queries("crossdoc_dup_spans")(spark, sf001)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted
    assert(got === expected)
  }

  test("oov_rate: vocab cut is exact and per-source rates recount") {
    val rows = Tables.t(spark, sf001, "documents")
      .select($"source", $"text").as[(String, String)].collect().toSeq
    val toks = rows.flatMap { case (src, txt) => txt.split(" ", -1).map(src -> _) }
    val vocab = toks.groupBy(_._2).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(1000).map(_._1).toSet
    val got = SparkEntry.queries("oov_rate")(spark, sf001)
      .select($"source", $"n_tokens", $"n_oov", $"oov_ppm")
      .as[(String, Long, Long, Long)].collect()
    val expected = toks.groupBy(_._1).view.mapValues { ts =>
      (ts.length.toLong, ts.count(t => !vocab.contains(t._2)).toLong)
    }.toMap
    assert(got.map(_._1).toSet === expected.keySet)
    got.foreach { case (src, nTok, nOov, ppm) =>
      assert((nTok, nOov) === expected(src), s"source $src")
      assert(ppm === nOov * 1000000L / nTok)
    }
  }
}
