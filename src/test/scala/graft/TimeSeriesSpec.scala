package graft

import org.apache.spark.sql.functions._

/** Time-series diagnostics (round 5): ACF, linear-interpolation gap-fill,
  * CUSUM change detection — each against a plain-Scala sequential recompute
  * at sf0.001 (the oracle proves cross-engine agreement; these prove the
  * distributed formulations equal the textbook sequential definitions).
  */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private val usPerDay = 86400000000L

  private lazy val events: Seq[(Long, Long, String, Double)] =
    Tables.t(spark, sf001, "events")
      .select($"event_id", unix_micros($"ts"), $"event_type", $"value")
      .as[(Long, Long, String, Double)].collect().toSeq

  private lazy val dayBounds: (Long, Long) = {
    val ds = events.map(_._2 / usPerDay)
    (ds.min, ds.max)
  }

  test("acf_daily equals the sequential textbook ACF over the day spine") {
    val (lo, hi) = dayBounds
    val byDay = events.filter(_._3 == "purchase")
      .groupBy(_._2 / usPerDay).view.mapValues(_.size.toLong).toMap
    val xs = (lo to hi).map(d => byDay.getOrElse(d, 0L))
    val n = xs.size.toLong
    val sx = xs.sum
    val c = xs.map(x => BigInt(n * x - sx))
    val den = c.map(v => v * v).sum
    val got = SparkEntry.queries("acf_daily")(spark, sf001)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(_._1) === (1L to 7L))
    got.foreach { case (k, nPairs, acf) =>
      val ki = k.toInt
      assert(nPairs === n - k)
      val num = (0 until (xs.size - ki)).map(i => c(i) * c(i + ki)).sum
      assert(acf === num.toDouble / den.toDouble, s"lag $k")
    }
  }

  test("ccf_daily equals the sequential cross-correlation and is the ACF " +
      "shape at matching structure") {
    val (lo, hi) = dayBounds
    def series(et: String): IndexedSeq[Long] = {
      val byDay = events.filter(_._3 == et)
        .groupBy(_._2 / usPerDay).view.mapValues(_.size.toLong).toMap
      (lo to hi).map(d => byDay.getOrElse(d, 0L))
    }
    val (xs, ys) = (series("click"), series("purchase"))
    val n = xs.size.toLong
    val (sx, sy) = (xs.sum, ys.sum)
    val cx = xs.map(x => BigInt(n * x - sx))
    val cy = ys.map(y => BigInt(n * y - sy))
    val dx = cx.map(v => v * v).sum
    val dy = cy.map(v => v * v).sum
    val got = SparkEntry.queries("ccf_daily")(spark, sf001)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(_._1) === (-7L to 7L))
    got.foreach { case (k, nPairs, ccf) =>
      val ki = k.toInt
      assert(nPairs === n - math.abs(k))
      // num(k) = sum over t of cx(t) * cy(t + k)
      val idx = (0 until xs.size).filter(i => i + ki >= 0 && i + ki < xs.size)
      val num = idx.map(i => cx(i) * cy(i + ki)).sum
      val expected = num.toDouble /
        (math.sqrt(dx.toDouble) * math.sqrt(dy.toDouble))
      assert(ccf === expected, s"lag $k")
      assert(math.abs(ccf) <= 1.0 + 1e-12)
    }
  }

  test("segmented_trend fits OLS on each side of the brute-force best split") {
    val daily = events.groupBy(e => (e._3, e._2 / usPerDay)).toSeq
      .map { case ((et, d), g) =>
        val sm = g.map(e => math.round(e._4 * 1e6)).sum
        (et, d, sm / g.length) // integer div, matches `div`
      }
    val epoch = java.time.LocalDate.parse("2024-01-01").toEpochDay
    val got = SparkEntry.queries("segmented_trend")(spark, sf001)
      .select($"event_type", $"segment", $"n_days", $"slope_micro_per_day")
      .as[(String, String, Long, Option[Long])].collect()
      .map(r => (r._1, r._2) -> r).toMap
    daily.groupBy(_._1).foreach { case (et, grp) =>
      val series = grp.sortBy(_._2)
      val n = series.length
      val s = series.map(_._3).sum
      val scored = (1 until n).map { k =>
        val sk = series.take(k).map(_._3).sum
        (math.round((sk.toDouble * sk / k +
          (s - sk).toDouble * (s - sk) / (n - k) - s.toDouble * s / n) / 1e6),
          series(k - 1)._2)
      }
      val bestScore = scored.map(_._1).max
      val chgDay = scored.filter(_._1 == bestScore).map(_._2).min
      def ols(seg: Seq[(String, Long, Long)]): Option[Long] = {
        if (seg.length < 2) return None
        val xs = seg.map(p => p._2 - epoch)
        val ys = seg.map(_._3)
        val nn = seg.length.toLong
        val (sx, sy) = (xs.sum, ys.sum)
        val sxx = xs.map(x => x * x).sum
        val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
        Some(math.round(
          (nn * sxy - sx * sy).toDouble / (nn * sxx - sx * sx).toDouble * 1e6))
      }
      val (before, after) = series.partition(_._2 <= chgDay)
      assert(got((et, "1_before"))._3 === before.length.toLong)
      assert(got((et, "2_after"))._3 === after.length.toLong)
      assert(got((et, "1_before"))._4 === ols(before), s"before slope $et")
      assert(got((et, "2_after"))._4 === ols(after), s"after slope $et")
    }
  }

  test("daily_interp is exact on observed days and an integer lerp between") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val (lo, hi) = dayBounds
    val sampled = events.filter(e =>
      e._3 == "purchase" && md5hex(e._1.toString).startsWith("00"))
    val byDay = sampled.groupBy(_._2 / usPerDay).view
      .mapValues(_.map(e => math.round(e._4 * 100)).sum).toMap
    val known = byDay.keys.toSeq.sorted
    assert(known.nonEmpty, "fixture needs at least one sampled purchase")
    val got = SparkEntry.queries("daily_interp")(spark, sf001)
      .select($"day".cast("string"), $"cents", $"observed", $"interp_cents")
      .as[(String, Option[Long], Long, Option[Long])].collect().toSeq
    assert(got.size === (hi - lo + 1))
    got.foreach { case (dayStr, cents, observed, interp) =>
      val d = java.time.LocalDate.parse(dayStr).toEpochDay
      byDay.get(d) match {
        case Some(v) =>
          assert(observed === 1L && cents === Some(v) && interp === Some(v))
        case None =>
          assert(observed === 0L && cents.isEmpty)
          val prev = known.filter(_ < d).lastOption
          val next = known.find(_ > d)
          (prev, next) match {
            case (Some(p), Some(nx)) =>
              val expect =
                (byDay(p) * (nx - d) + byDay(nx) * (d - p)) / (nx - p)
              assert(interp === Some(expect), s"day $dayStr")
            case _ => assert(interp.isEmpty, s"day $dayStr outside hull")
          }
      }
    }
  }

  test("cusum_shift equals the sequential one-sided CUSUM recurrence") {
    val daily = events.groupBy(e => (e._3, e._2 / usPerDay)).view
      .mapValues { es =>
        val s = es.map(e => math.round(e._4 * 1e6)).sum
        s / es.size
      }.toMap
    val got = SparkEntry.queries("cusum_shift")(spark, sf001)
      .select($"event_type", $"day".cast("string"), $"mean_micro",
        $"cusum_micro", $"alarm")
      .as[(String, String, Long, Long, Boolean)].collect().toSeq
    got.groupBy(_._1).foreach { case (tpe, rows) =>
      val sorted = rows.sortBy(_._2)
      val means = sorted.map(_._3)
      val mu = means.sum / means.size
      val kap = mu / 20
      // the registered series must be exactly the per-(type, day) means
      val expectDays = daily.keys.filter(_._1 == tpe).map(_._2).toSeq.sorted
      assert(sorted.map(r => java.time.LocalDate.parse(r._2).toEpochDay)
        === expectDays)
      sorted.zip(expectDays).foreach { case (r, d) =>
        assert(r._3 === daily((tpe, d)), s"$tpe $d mean")
      }
      var acc = 0L
      sorted.foreach { r =>
        acc = math.max(0L, acc + r._3 - mu - kap)
        assert(r._4 === acc, s"$tpe ${r._2} cusum")
        assert(r._5 === (acc > mu), s"$tpe ${r._2} alarm")
      }
    }
  }
}
