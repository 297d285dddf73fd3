package graft

import org.apache.spark.sql.functions._

/** Round-4 corpus-filter + semantic-dedup operators: internal-consistency
  * properties at sf0.001 (cross-engine value equality is the DuckDB oracle's
  * job; these pin the semantics the oracle can't see).
  */
class FilterOpsSpec extends SparkSpec {
  import spark.implicits._

  test("bloom_decontaminate equals the complement of contamination_check " +
      "hits, and the bloom probe admits every true benchmark shingle") {
    val clean = SparkEntry.queries("bloom_decontaminate")(spark, sf001)
      .select($"doc_id").as[Long].collect().toSet
    // independent implementation: contamination_check (broadcast exact set)
    // lists every shingled corpus doc with its benchmark-hit count; docs
    // absent from it have <3 tokens (no shingles) and are trivially clean
    val checked = SparkEntry.queries("contamination_check")(spark, sf001)
      .select($"doc_id", $"n_contaminated").as[(Long, Long)].collect().toMap
    val corpus = Tables.t(spark, sf001, "documents")
      .filter($"doc_id" >= 10).select($"doc_id").as[Long].collect().toSet
    val expected = corpus.filter(d => checked.getOrElse(d, 0L) == 0L)
    assert(clean === expected)
    // no-false-negative property of the registered bloom functions: every
    // value aggregated into the filter must probe positive
    graft.functions.BloomFunctions.register(spark)
    val vals = (1 to 500).map(i => s"shingle $i").toDF("v")
    val bf = vals.agg(call_function("bloom_agg", $"v", lit(1000L)))
      .head.getAs[Array[Byte]](0)
    val admitted = vals
      .filter(call_function("bloom_might_contain", lit(bf), $"v"))
      .count()
    assert(admitted === 500L)
  }

  test("repetition_score fractions are consistent and bounded") {
    val rows = SparkEntry.queries("repetition_score")(spark, sf001)
      .select($"n_tokens", $"frac_dup_tokens", $"frac_dup_bigrams",
        $"top_bigram_frac", $"flagged")
      .as[(Long, Double, Double, Double, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, fdt, fdb, top, flagged) =>
      assert(n >= 2)
      assert(fdt >= 0.0 && fdt <= 1.0)
      assert(fdb >= 0.0 && fdb <= 1.0)
      // the max bigram share is at least the uniform share
      assert(top >= 1.0 / (n - 1) - 1e-12 && top <= 1.0)
      assert(flagged === (if (fdt > 0.6 || top > 0.18) 1L else 0L))
    }
  }

  test("gopher_quality_filter keep is the conjunction of its four rules") {
    val rows = SparkEntry.queries("gopher_quality_filter")(spark, sf001)
      .select($"ok_len", $"ok_word_len", $"ok_stop", $"ok_alpha", $"keep")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, c, d, keep) =>
      Seq(a, b, c, d, keep).foreach(f => assert(f == 0L || f == 1L))
      assert(keep === (if (a + b + c + d == 4) 1L else 0L))
    }
    // the filter must actually discriminate on this corpus, not pass/drop all
    assert(rows.exists(_._5 == 1L))
  }

  test("boilerplate_shingles counts agree with an independent df>=5 count") {
    val got = SparkEntry.queries("boilerplate_shingles")(spark, sf001)
      .select($"doc_id", $"n_shingles", $"n_boiler", $"boiler_frac")
      .as[(Long, Long, Long, Double)].collect()
    got.foreach { case (_, n, b, f) =>
      assert(b >= 0 && b <= n)
      assert(math.abs(f - b.toDouble / n) < 1e-15)
    }
    // independent recompute from raw shingles
    val sh = operators.DedupOps.shingles(spark, sf001).cache()
    val boiler = sh.groupBy($"sh").count().filter($"count" >= 5)
      .select($"sh").as[String].collect().toSet
    val expected = sh.as[(Long, String)].collect()
      .groupBy(_._1).view
      .mapValues(g => (g.length.toLong, g.count(p => boiler(p._2)).toLong)).toMap
    assert(got.map(r => r._1 -> ((r._2, r._3))).toMap === expected)
  }

  test("pii_scrub masks exactly one email and one phone per profile") {
    val rows = SparkEntry.queries("pii_scrub")(spark, sf001)
      .select($"n_emails", $"n_phones", $"scrubbed").as[(Long, Long, String)]
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { case (ne, np, scrubbed) =>
      assert(ne === 1L && np === 1L)
      assert(scrubbed.contains("<EMAIL>") && scrubbed.contains("<PHONE>"))
      assert(!scrubbed.contains("@"))
      assert(!scrubbed.matches(".*\\d{3}-\\d{3}-\\d{4}.*"))
    }
  }

  test("source_mixture_weights rebalance to a uniform mixture") {
    val rows = SparkEntry.queries("source_mixture_weights")(spark, sf001)
      .select($"n_docs", $"weight").as[(Long, Double)].collect()
    val total = rows.map(_._1).sum
    // each source's weighted mass is total/n_sources -> weighted sum = total
    val weighted = rows.map { case (n, w) => n * w }.sum
    assert(math.abs(weighted - total) < 1e-6 * total)
  }

  test("semantic_dedup keeps every cell's minimum id and covers all vectors") {
    val rows = SparkEntry.queries("semantic_dedup")(spark, sf001)
      .as[(Long, Long, Long)].collect()
    val nVecs = Tables.t(spark, sf001, "embeddings").count()
    assert(rows.length.toLong === nVecs)
    rows.groupBy(_._2).foreach { case (_, members) =>
      val minId = members.map(_._1).min
      val keepOfMin = members.find(_._1 == minId).get._3
      // the lowest id in a cell has no lower-id cell-mate -> always kept
      assert(keepOfMin === 1L)
    }
  }

  test("sequence_packing intervals abut within each source and bins are consistent") {
    val rows = SparkEntry.queries("sequence_packing")(spark, sf001)
      .select($"source", $"doc_id", $"n_tokens", $"start_tok", $"bin_first",
        $"bin_last", $"n_bins_spanned")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    rows.groupBy(_._1).foreach { case (_, g) =>
      val sorted = g.sortBy(_._2)
      assert(sorted.head._4 === 0L) // first doc starts the stream
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._4 === a._4 + a._3) // next start = prev end
        case _ =>
      }
    }
    rows.foreach { case (_, _, n, start, bf, bl, span) =>
      assert(bf === start / 2048)
      assert(bl === (start + n - 1) / 2048)
      assert(span === bl - bf + 1)
    }
  }

  test("curriculum_phases partitions the ranked corpus into 4 contiguous " +
      "quality bands whose stats recount") {
    val q = SparkEntry.queries("quality_score")(spark, sf001)
      .select($"doc_id", $"n_tokens", $"quality")
      .as[(Long, Long, Double)].collect()
    val ranked = q.map { case (id, nt, qual) =>
      (math.round(qual * 1e9), id, nt)
    }.sortBy(t => (t._1, t._2))
    val n = ranked.length
    val expected = ranked.zipWithIndex.map { case ((qq, _, nt), i) =>
      (((i.toLong * 4) / n) + 1, qq, nt)
    }.groupBy(_._1).view.mapValues { rows =>
      (rows.length.toLong, rows.map(_._3).sum,
        rows.map(_._2).sum.toDouble / rows.length / 1e9)
    }.toMap
    val got = SparkEntry.queries("curriculum_phases")(spark, sf001)
      .select($"phase", $"n_docs", $"total_tokens", $"mean_quality")
      .as[(Long, Long, Long, Double)].collect()
    assert(got.map(_._1).toSet === Set(1L, 2L, 3L, 4L))
    got.foreach { case (p, nd, tt, mq) =>
      val (en, et, em) = expected(p)
      assert(nd === en && tt === et, s"phase $p counts")
      assert(math.abs(mq - em) < 1e-9, s"phase $p mean quality")
    }
  }

  test("epoch_plan integer arithmetic recounts and up/down-samples correctly") {
    val got = SparkEntry.queries("epoch_plan")(spark, sf001)
      .select($"source", $"n_tokens", $"target_tokens", $"full_epochs",
        $"frac_epoch_milli")
      .as[(String, Long, Long, Long, Long)].collect()
    val budget = 2000000L
    val nSources = got.length.toLong
    got.foreach { case (src, nt, target, fe, fm) =>
      assert(target === budget / nSources, src)
      assert(fe === target / nt, src)
      assert(fm === ((target % nt) * 1000) / nt, src)
      // planned tokens ≈ target within one milli-epoch of one source
      val planned = fe * nt + fm * nt / 1000
      assert(planned <= target && target - planned <= nt / 1000 + nt / 500 + 1, src)
    }
  }

  test("cdc_chunking tiles every document and matches a sequential " +
      "rolling-boundary recompute") {
    val got = SparkEntry.queries("cdc_chunking")(spark, sf001)
      .select($"doc_id", $"chunk_idx", $"n_toks", $"fp", $"n_copies")
      .as[(Long, Long, Long, String, Long)].collect()
    val texts = Tables.t(spark, sf001, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // independent sequential recompute of chunk fingerprints
    val expected = texts.flatMap { case (id, t) =>
      val toks = t.split(" ", -1)
      val chunks = scala.collection.mutable.ArrayBuffer(scala.collection.mutable.ArrayBuffer[String]())
      toks.zipWithIndex.foreach { case (tok, i0) =>
        chunks.last += tok
        val pos = i0 + 1
        if (pos >= 4 && md5hex(toks.slice(pos - 4, pos).mkString(" ")).last == '0'
            && pos < toks.length)
          chunks += scala.collection.mutable.ArrayBuffer[String]()
      }
      chunks.zipWithIndex.map { case (c, idx) =>
        (id, idx.toLong) -> (c.length.toLong, md5hex(c.mkString(" ")))
      }
    }
    assert(got.map(r => (r._1, r._2)).toSet === expected.keySet)
    got.foreach { case (id, idx, n, fp, _) =>
      assert(expected((id, idx)) === ((n, fp)), s"doc $id chunk $idx")
    }
    // copy counts recount across the corpus
    val byFp = expected.values.groupBy(_._2).view.mapValues(_.size.toLong)
    got.foreach { case (_, _, _, fp, copies) => assert(copies === byFp(fp)) }
  }

  test("doc_chunking tiles every document with stride-48 chunks of <=64 tokens") {
    val rows = SparkEntry.queries("doc_chunking")(spark, sf001)
      .select($"doc_id", $"chunk_idx", $"start_tok", $"n_chunk_toks", $"chunk_text")
      .as[(Long, Long, Long, Long, String)].collect()
    val nByDoc = Tables.t(spark, sf001, "documents")
      .select($"doc_id", size(split($"text", " ")).cast("long"))
      .as[(Long, Long)].collect().toMap
    rows.groupBy(_._1).foreach { case (doc, chunks) =>
      val n = nByDoc(doc)
      val sorted = chunks.sortBy(_._2)
      sorted.zipWithIndex.foreach { case ((_, idx, start, len, text), i) =>
        assert(idx === i + 1)
        assert(start === 1L + 48L * i)
        assert(len === math.min(64L, n - start + 1))
        assert(text.split(" ", -1).length.toLong === len)
      }
      // coverage: the final chunk reaches the last token
      val last = sorted.last
      assert(last._3 + last._4 - 1 === n)
    }
    assert(rows.map(_._1).distinct.length === nByDoc.size)
  }

  test("cluster_keep_best keeps the argmax-quality member of every cluster") {
    val best = SparkEntry.queries("cluster_keep_best")(spark, sf001)
      .select($"cluster", $"keep_doc_id", $"n_members")
      .as[(Long, Long, Long)].collect()
    val clusters = SparkEntry.queries("dedup_clusters")(spark, sf001)
      .as[(Long, Long)].collect()
    val quality = SparkEntry.queries("quality_score")(spark, sf001)
      .select($"doc_id", $"quality").as[(Long, Double)].collect().toMap
    val byCluster = clusters.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    assert(best.map(_._1).toSet === byCluster.keySet)
    best.foreach { case (cl, keep, n) =>
      val members = byCluster(cl)
      assert(n === members.length)
      val expect = members.minBy(d => (-quality(d), d))
      assert(keep === expect, s"cluster $cl kept $keep, expected $expect")
    }
  }

  test("triangle_count matches a brute-force count over the collected edges") {
    val n = SparkEntry.queries("triangle_count")(spark, sf001)
      .as[Long].head()
    // independent recompute: collect the same bounded subgraph and count
    val sig = SparkEntry.queries("simhash")(spark, sf001)
      .filter($"doc_id" < 500).as[(Long, Long)].collect()
    val edges = for {
      (a, ha) <- sig; (b, hb) <- sig
      if a < b && (ha >> 16) == (hb >> 16) &&
        java.lang.Long.bitCount(ha ^ hb) <= 4
    } yield (a, b)
    val eset = edges.toSet
    val brute = edges.flatMap { case (a, b) =>
      sig.map(_._1).filter(c => b < c && eset((b, c)) && eset((a, c)))
    }.length.toLong
    assert(n === brute)
  }

  test("event_type_islands runs cover every event exactly once and alternate") {
    val rows = SparkEntry.queries("event_type_islands")(spark, sf001)
      .select($"user_id", $"island", $"event_type", $"run_len")
      .as[(Long, Long, String, Long)].collect()
    val nEvents = Tables.t(spark, sf001, "events").filter($"user_id" < 50).count()
    assert(rows.map(_._4).sum === nEvents)
    rows.groupBy(_._1).foreach { case (_, g) =>
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1L to g.length).toSeq)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 !== b._3, "adjacent islands must differ")
        case _ =>
      }
    }
  }

  test("embedding_stats HOF norm agrees with the compiled QuantizedDot kernel") {
    graft.functions.VectorFunctions.register(spark)
    val hof = SparkEntry.queries("embedding_stats")(spark, sf001)
      .select($"vec_id", $"norm2_q")
    val kernel = Tables.t(spark, sf001, "embeddings")
      .select($"vec_id", expr("dot_q(embedding, embedding)").as("k_norm2"))
    val mismatches = hof.join(kernel, "vec_id")
      .filter($"norm2_q" =!= $"k_norm2").count()
    assert(mismatches === 0L)
    assert(hof.count() > 0)
  }

  test("funnel_conversion stages are monotonically non-increasing") {
    val Array((users, signup, click, purchase)) =
      SparkEntry.queries("funnel_conversion")(spark, sf001)
        .as[(Long, Long, Long, Long)].collect()
    assert(users >= signup && signup >= click && click >= purchase)
    assert(signup > 0) // the corpus exercises every stage
  }

  test("retention_cohorts offset-0 count equals the cohort's user count") {
    val rows = SparkEntry.queries("retention_cohorts")(spark, sf001)
      .as[(java.sql.Date, Long, Long)].collect()
    val byCohort = rows.groupBy(_._1)
    byCohort.foreach { case (_, g) =>
      val day0 = g.find(_._2 == 0L).map(_._3).getOrElse(0L)
      // every user is present on their own first day, and later offsets
      // can never exceed the cohort size
      assert(day0 > 0)
      g.foreach { case (_, _, n) => assert(n <= day0) }
    }
  }

  test("ols_by_type matches a direct least-squares fit of the raw data") {
    val got = SparkEntry.queries("ols_by_type")(spark, sf001)
      .select($"event_type", $"slope", $"intercept_units")
      .as[(String, Double, Double)].collect()
      .map { case (k, s, i) => k -> ((s, i)) }.toMap
    val raw = Tables.t(spark, sf001, "events")
      .select($"event_type",
        round(get_json_object($"props", "$.k").cast("double") * 100).cast("long"),
        round($"value" * 100).cast("long"))
      .as[(String, Long, Long)].collect()
    raw.groupBy(_._1).foreach { case (et, rows) =>
      val n = rows.length.toDouble
      val xs = rows.map(_._2.toDouble); val ys = rows.map(_._3.toDouble)
      val sx = xs.sum; val sy = ys.sum
      val sxy = rows.map(r => r._2.toDouble * r._3).sum
      val sxx = xs.map(x => x * x).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val intercept = ((sy * sxx - sx * sxy) / (n * sxx - sx * sx)) / 100.0
      val (gs, gi) = got(et)
      assert(math.abs(gs - slope) < 1e-9, s"$et slope")
      assert(math.abs(gi - intercept) < 1e-6, s"$et intercept")
    }
  }

  test("spearman_rho stays in [-1, 1] and agrees with a direct rank fit") {
    val got = SparkEntry.queries("spearman_corr")(spark, sf001)
      .select($"event_type", $"spearman_rho").as[(String, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (_, rho) => assert(rho >= -1.0 && rho <= 1.0) }
    // direct recompute: rank the raw points with the same total order and
    // run Pearson over the ranks independently of either engine's SQL
    val raw = Tables.t(spark, sf001, "events")
      .select($"event_type", $"event_id", $"value",
        get_json_object($"props", "$.k").cast("double").as("k"))
      .as[(String, Long, Double, Double)].collect()
    val expected = raw.groupBy(_._1).map { case (et, rows) =>
      def ranks(key: ((String, Long, Double, Double)) => Double): Map[Long, Double] =
        rows.sortBy(r => (key(r), r._2)).zipWithIndex
          .map { case (r, i) => r._2 -> (i + 1).toDouble }.toMap
      val rx = ranks(_._3); val ry = ranks(_._4)
      val n = rows.length.toDouble
      val xs = rows.map(r => rx(r._2)); val ys = rows.map(r => ry(r._2))
      val sx = xs.sum; val sy = ys.sum
      val sxy = rows.map(r => rx(r._2) * ry(r._2)).sum
      val sxx = xs.map(x => x * x).sum; val syy = ys.map(y => y * y).sum
      et -> (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    }
    got.foreach { case (et, rho) =>
      assert(math.abs(rho - expected(et)) < 1e-9, s"$et rank fit")
    }
  }

  test("kmv_distinct estimate lands near the exact distinct count") {
    val rows = SparkEntry.queries("kmv_distinct")(spark, sf001)
      .as[(String, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, exact, est) =>
      // k=32 -> relative standard error ~1/sqrt(30) ~ 18%; 2.5 sigma bound
      assert(est > 0.0)
      assert(math.abs(est - exact) <= 0.45 * exact + 1.0,
        s"estimate $est too far from exact $exact")
    }
  }

  test("l_diversity_report recounts distinct sensitive bands per QI class") {
    val rows = Tables.t(spark, sf001, "customer")
      .select($"c_mktsegment", $"c_nationkey".cast("long"),
        floor($"c_acctbal" / 1000).cast("long"))
      .as[(String, Long, Long)].collect().toSeq
    val classes = rows.groupBy(r => (r._1, r._2)).toSeq.map { case (_, g) =>
      (g.length.toLong, g.map(_._3).distinct.length.toLong)
    }
    val expected = classes.groupBy(_._2).map { case (l, g) =>
      l -> (g.length.toLong, g.map(_._1).sum, g.map(_._1).min)
    }
    val got = SparkEntry.queries("l_diversity_report")(spark, sf001)
      .select($"l", $"n_classes", $"n_rows", $"min_class_size", $"homogeneous")
      .as[(Long, Long, Long, Long, Boolean)].collect()
    assert(got.map(_._1).toSet === expected.keySet)
    got.foreach { case (l, nc, nr, mcs, homog) =>
      assert((nc, nr, mcs) === expected(l), s"l=$l")
      assert(homog === (l == 1L))
    }
    // every customer row is accounted for exactly once
    assert(got.map(_._3).sum === rows.length.toLong)
  }

  test("cluster_balanced_sample takes at most 3 distinct vectors per cell") {
    val rows = SparkEntry.queries("cluster_balanced_sample")(spark, sf001)
      .as[(Long, Long, Long)].collect()
    assert(rows.map(_._3).distinct.length === rows.length)
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(g.length <= 3)
      assert(g.map(_._2).sorted === (1L to g.length).toSeq)
    }
  }
}
