package graft

import org.apache.spark.sql.functions._

/** Behavioral-sequence and phrase-mining queries (round 5): 3-step paths,
  * cohort LTV, PMI collocations — each against a plain-Scala recount at
  * sf0.001.
  */
class BehaviorOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events: Seq[(Long, Long, Long, String, Double)] =
    Tables.t(spark, sf001, "events")
      .select($"user_id", unix_micros($"ts"), $"event_id", $"event_type", $"value")
      .as[(Long, Long, Long, String, Double)].collect().toSeq

  test("top_paths_3 equals brute-force sliding-window counting") {
    val got = SparkEntry.queries("top_paths_3")(spark, sf001)
      .as[(String, String, String, Long)].collect().toSeq
    val paths = events.groupBy(_._1).values.flatMap { evs =>
      evs.sortBy(e => (e._2, e._3)).map(_._4).sliding(3).filter(_.size == 3)
        .map(p => (p(0), p(1), p(2))).toSeq
    }
    val expected = paths.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((a, b, c), n) => (a, b, c, n) }
      .sortBy { case (a, b, c, n) => (-n, a, b, c) }.take(20)
    assert(got === expected)
  }

  test("funnel_windowed equals the sequential 7-day-deadline replay and " +
      "never exceeds the unbounded funnel") {
    val week = 7L * 86400000000L
    val byUser = events.groupBy(_._1).view
      .mapValues(_.sortBy(e => (e._2, e._3))).toMap
    var (nSign, nClick, nPurch) = (0L, 0L, 0L)
    byUser.values.foreach { evs =>
      val t1 = evs.collectFirst { case e if e._4 == "signup" => e._2 }
      val t2 = t1.flatMap(t => evs.collect {
        case e if e._4 == "click" && e._2 > t && e._2 <= t + week => e._2
      }.minOption)
      val t3 = t2.flatMap(t => evs.collect {
        case e if e._4 == "purchase" && e._2 > t && e._2 <= t + week => e._2
      }.minOption)
      if (t1.isDefined) nSign += 1
      if (t2.isDefined) nClick += 1
      if (t3.isDefined) nPurch += 1
    }
    val got = SparkEntry.queries("funnel_windowed")(spark, sf001)
      .as[(Long, Long, Long, Long)].collect().head
    assert(got === ((byUser.size.toLong, nSign, nClick, nPurch)))
    val unbounded = SparkEntry.queries("funnel_conversion")(spark, sf001)
      .as[(Long, Long, Long, Long)].collect().head
    assert(got._2 === unbounded._2)
    assert(got._3 <= unbounded._3 && got._4 <= unbounded._4)
  }

  test("debounce_events keeps exactly the rows > 5 min past the previous " +
      "same-key event") {
    val got = SparkEntry.queries("debounce_events")(spark, sf001)
      .as[(String, Long, Long, Long)].collect().toSeq
    val byKey = events.groupBy(e => (e._1, e._4))
    val expected = byKey.toSeq.flatMap { case ((_, t), evs) =>
      val sorted = evs.sortBy(e => (e._2, e._3))
      val kept = sorted.zipWithIndex.count { case (e, i) =>
        i == 0 || e._2 - sorted(i - 1)._2 > 300000000L
      }
      Seq((t, sorted.size.toLong, kept.toLong))
    }.groupBy(_._1).view.mapValues(rs =>
      (rs.map(_._2).sum, rs.map(_._3).sum)).toMap
    got.foreach { case (t, total, keptN, dropped) =>
      assert((total, keptN) === expected(t), s"type $t")
      assert(dropped === total - keptN)
    }
    assert(got.map(_._1) === expected.keys.toSeq.sorted)
  }

  test("nearest_touch picks the closest click/view, ties to the earlier") {
    val byUser = events.groupBy(_._1).view
      .mapValues(_.sortBy(e => (e._2, e._3))).toMap
    val got = SparkEntry.queries("nearest_touch")(spark, sf001)
      .select($"user_id", $"event_id", $"touch_id", $"delta_us")
      .as[(Long, Long, Option[Long], Option[Long])].collect().toSeq
    val expected = byUser.toSeq.flatMap { case (u, evs) =>
      evs.zipWithIndex.collect { case ((_, us, id, "purchase", _), idx) =>
        val prev = evs.take(idx).reverse
          .find(e => e._4 == "click" || e._4 == "view")
        val next = evs.drop(idx + 1)
          .find(e => e._4 == "click" || e._4 == "view")
        val pick = (prev, next) match {
          case (Some(p), Some(n)) =>
            if (us - p._2 <= n._2 - us) Some(p) else Some(n)
          case (p, n) => p.orElse(n)
        }
        (u, id, pick.map(_._3), pick.map(_._2 - us))
      }
    }.toSet
    assert(got.toSet === expected)
  }

  test("cohort_ltv cumulative equals per-cohort running sum of exact cents") {
    val got = SparkEntry.queries("cohort_ltv")(spark, sf001)
      .select($"cohort_day".cast("string"), $"day_offset", $"cents", $"n_users",
        $"cum_cents")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // running sum is consistent within each cohort and starts at its first row
    got.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.foldLeft(0L) { (acc, r) =>
        val next = acc + r._3
        assert(r._5 === next, s"cum mismatch at $r")
        next
      }
    }
    // cents recount: purchases only, first 8 offset days per user cohort
    val us = 86400000000L // µs per day (events are well inside epoch days)
    val byUser = events.groupBy(_._1)
    val firstDay = byUser.view.mapValues(_.map(e => e._2 / us).min).toMap
    val expCents = events
      .map(e => (e._1, e._2 / us, if (e._4 == "purchase") math.round(e._5 * 100) else 0L))
      .map { case (u, d, c) => ((firstDay(u), d - firstDay(u)), c) }
      .filter(_._1._2 <= 7)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val gotCents = got.map(r => ((toEpochDay(r._1), r._2), r._3)).toMap
    assert(gotCents === expCents)
  }

  private def toEpochDay(date: String): Long =
    java.time.LocalDate.parse(date).toEpochDay

  test("shapley_attribution equals the exact 4-player Shapley sum and " +
      "satisfies efficiency when all coalitions are observed") {
    val bits = Map("click" -> 1, "view" -> 2, "signup" -> 4, "error" -> 8)
    val perUser = events.groupBy(_._1).values.map { evs =>
      val types = evs.map(_._4).toSet
      val mask = bits.collect { case (t, b) if types(t) => b }.sum
      (mask, if (types("purchase")) 1L else 0L)
    }.toSeq
    val obs = perUser.groupBy(_._1).view
      .mapValues(g => (g.length.toLong, g.map(_._2).sum)).toMap
    def v(mask: Int): Double = obs.get(mask) match {
      case Some((nu, nc)) if nu > 0 => nc.toDouble / nu
      case _ => 0.0
    }
    def w(s: Int): Double = if (s == 0 || s == 3) 0.25 else 1.0 / 12.0
    val got = SparkEntry.queries("shapley_attribution")(spark, sf001)
      .select($"channel", $"n_touched_users", $"phi_pico", $"phi")
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    bits.foreach { case (ch, bit) =>
      val phiPico = (0 until 16).filter(m => (m & bit) == 0).map { m =>
        math.round(w(Integer.bitCount(m)) * (v(m | bit) - v(m)) * 1e12)
      }.sum
      val (_, touched, gPico, gPhi) = got(ch)
      assert(gPico === phiPico, s"phi for $ch")
      assert(gPhi === gPico.toDouble / 1e12)
      assert(touched ===
        perUser.count { case (m, _) => (m & bit) != 0 }.toLong)
    }
    // efficiency: sum of credits = v(everything) - v(nothing), exact to
    // the per-term pico quantization, when every coalition is observed
    if ((0 until 16).forall(obs.contains)) {
      val sum = got.values.map(_._3).sum
      assert(math.abs(sum - math.round((v(15) - v(0)) * 1e12)) <= 32L)
    }
  }

  test("attribution_position credits sum to 1000 per attributed window " +
      "and match a sequential recount") {
    val got = SparkEntry.queries("attribution_position")(spark, sf001)
      .as[(String, Long, Long)].collect().toSeq
    // sequential replay: per user, walk events in time order, buffering
    // touches; each purchase closes a window and splits 1000 millis
    val credits = scala.collection.mutable.Map[String, Long]()
    val counts = scala.collection.mutable.Map[String, Long]()
    var windows = 0L
    events.groupBy(_._1).values.foreach { evs =>
      var buf = Vector.empty[String] // touch types in order
      evs.sortBy(e => (e._2, e._3)).foreach { e =>
        e._4 match {
          case "click" | "view" => buf :+= e._4
          case "purchase" =>
            val k = buf.size
            if (k > 0) windows += 1
            buf.zipWithIndex.foreach { case (t, i) =>
              val pos = i + 1L
              val c =
                if (k == 1) 1000L
                else if (k == 2) 500L
                else if (pos == 1 || pos == k) 400L
                else 200L / (k - 2) + (if (pos - 1 <= 200 % (k - 2)) 1L else 0L)
              credits(t) = credits.getOrElse(t, 0L) + c
              counts(t) = counts.getOrElse(t, 0L) + 1L
            }
            buf = Vector.empty
          case _ => ()
        }
      }
    }
    val expected = credits.keys.toSeq.sorted.map(t => (t, counts(t), credits(t)))
    assert(got === expected)
    assert(got.map(_._3).sum === 1000L * windows, "credit conservation")
  }

  test("ab_test_zscore matches an exact recount of the hash-split arms") {
    val got = SparkEntry.queries("ab_test_zscore")(spark, sf001)
      .as[(Long, Long, Long, Long, Double, Double, Double)].collect().head
    val perUser = events.groupBy(_._1).toSeq.map { case (u, evs) =>
      val arm = BigInt(
        java.security.MessageDigest.getInstance("MD5")
          .digest(u.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 15), 16).toLong % 2
      (arm, if (evs.exists(e => e._4 == "purchase" && e._5 > 95.0)) 1L else 0L)
    }.toSeq
    val (na, xa) = (perUser.count(_._1 == 0).toLong,
      perUser.filter(_._1 == 0).map(_._2).sum)
    val (nb, xb) = (perUser.count(_._1 == 1).toLong,
      perUser.filter(_._1 == 1).map(_._2).sum)
    assert((got._1, got._2, got._3, got._4) === ((na, xa, nb, xb)))
    val (ra, rb) = (xa.toDouble / na, xb.toDouble / nb)
    val p = (xa + xb).toDouble / (na + nb)
    val z = (ra - rb) / math.sqrt(p * (1.0 - p) * (1.0 / na + 1.0 / nb))
    assert(got._5 === ra && got._6 === rb)
    assert(got._7 === z)
  }

  test("bigram_collocations PMI ratio and margins recount") {
    val got = SparkEntry.queries("bigram_collocations")(spark, sf001)
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    val bigrams = Tables.t(spark, sf001, "documents")
      .select($"text").as[String].collect().toSeq
      .map(_.split(" ", -1).toSeq).filter(_.size >= 2)
      .flatMap(toks => toks.zip(toks.tail))
    val cab = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ca = bigrams.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val cb = bigrams.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = bigrams.size.toLong
    val expected = cab.toSeq.filter(_._2 >= 5)
      .map { case ((a, b), c) =>
        (a, b, c, ca(a), cb(b), (c * n).toDouble / (ca(a) * cb(b)).toDouble)
      }
      .sortBy { case (a, b, _, _, _, r) => (-r, a, b) }.take(50)
    assert(got === expected)
    assert(got.head._6 > 1.0, "top collocation should beat independence")
  }
}
