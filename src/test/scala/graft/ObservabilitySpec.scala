package graft

import org.apache.spark.sql.functions._

/** Pre-flight / audit operators (round 12 batch 7): structural
  * invariants of the skew, cardinality, autocorrelation, l-diversity,
  * readability, and vocabulary reports — value-level cross-engine
  * parity is the DuckDB oracle's job. */
class ObservabilitySpec extends SparkSuite {

  test("partition-key skew pre-flight: internally consistent stats") {
    val r = SparkEntry.queries("q_part_skew_stats")(spark, Sf)
      .collect().head
    val (nKeys, nRows, maxC, p99, _, skew, topShare) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))
    val actualKeys = Tables.events(spark, Sf)
      .select(col("user_id")).distinct().count()
    val actualRows = Tables.events(spark, Sf).count()
    assert(nKeys === actualKeys && nRows === actualRows)
    assert(p99 <= maxC && maxC <= nRows)
    // skew factor is max over mean, so always >= 1 and consistent
    // with top_share: skew = top_share * n_keys
    assert(skew >= 1.0 - 1e-12)
    assert(math.abs(skew - topShare * nKeys) < 1e-9)
  }

  test("skew pre-flight top key really is the most frequent key") {
    val top = SparkEntry.queries("q_part_skew_stats")(spark, Sf)
      .collect().head.getLong(4)
    val best = Tables.events(spark, Sf)
      .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("user_id").asc)
      .collect().head.getLong(0)
    assert(top === best)
  }

  test("join-cardinality pre-flight: exact pair count matches the real join") {
    val r = SparkEntry.queries("q_join_cardinality")(spark, Sf)
      .collect().head
    val exact = r.getAs[Long]("exact_pairs")
    val actual = Tables.lineitem(spark, Sf)
      .join(Tables.orders(spark, Sf),
        col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(exact === actual, s"decomposed $exact vs joined $actual")
    assert(r.getAs[Long]("max_key_pairs") <= exact)
    assert(r.getAs[Double]("amplification") >= 1.0 - 1e-12)
  }

  test("autocorrelation: lags 1-7 present, every r in [-1, 1]") {
    val rows = SparkEntry.queries("q_events_autocorr")(spark, Sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq === (1 to 7))
    rows.foreach { case (lag, n, acf) =>
      assert(n >= 2)
      assert(acf >= -1.0 - 1e-9 && acf <= 1.0 + 1e-9,
        s"lag $lag acf $acf out of range")
    }
  }

  test("autocorrelation matches a driver-side sequential reference") {
    val daily = Tables.events(spark, Sf)
      .groupBy(col("ts").cast("date").as("d")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .sortBy(_._1.toEpochDay).toSeq
    val byDay = daily.map { case (d, c) => d.toEpochDay -> c }.toMap
    val got = SparkEntry.queries("q_events_autocorr")(spark, Sf)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    for (lag <- 1 to 7) {
      val pairs = daily.flatMap { case (d, x) =>
        byDay.get(d.toEpochDay + lag).map(y => (x, y))
      }
      if (pairs.size >= 2) {
        val n = pairs.size.toLong
        val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
        val sxy = pairs.map(p => p._1 * p._2).sum
        val sxx = pairs.map(p => p._1 * p._1).sum
        val syy = pairs.map(p => p._2 * p._2).sum
        val ref = (n * sxy - sx * sy).toDouble /
          (math.sqrt((n * sxx - sx * sx).toDouble) *
            math.sqrt((n * syy - sy * sy).toDouble))
        assert(math.abs(got(lag) - ref) < 1e-12, s"lag $lag")
      }
    }
  }

  test("l-diversity: group counts reconcile and min diversity is sane") {
    val rows = SparkEntry.queries("q_anon_ldiversity")(spark, Sf)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    val nTypes = Tables.events(spark, Sf)
      .select(col("event_type")).distinct().count()
    rows.foreach { case (nGroups, nLow, exposed, minL) =>
      assert(nLow <= nGroups)
      assert(minL >= 1 && minL <= nTypes)
      // every low-diversity group has at least one row
      assert((nLow == 0 && exposed == 0) || exposed >= nLow)
    }
  }

  test("readability: sums reconcile per source; flesch falls with syllable load") {
    val rows = SparkEntry.queries("q_text_readability")(spark, Sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, w, s, y) = (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))
      assert(nDocs > 0 && w >= nDocs && s >= nDocs)
      val flesch = r.getDouble(5)
      val ref = 206.835 - 1.015 * (w.toDouble / s) - 84.6 * (y.toDouble / w)
      assert(math.abs(flesch - ref) < 1e-9)
      assert(r.getLong(6) <= nDocs)
    }
  }

  test("week-over-week growth reconciles with the weekly series") {
    val weekly = Tables.events(spark, Sf)
      .groupBy(col("event_type"),
        date_trunc("week", col("ts")).cast("date").as("wk"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
      .groupBy(_._1)
      .map { case (t, rows) =>
        t -> rows.map(r => (r._2, r._3)).sortBy(_._1.toEpochDay).toSeq }
    val got = SparkEntry.queries("q_events_wow")(spark, Sf)
      .collect().map(r => ((r.getString(0), r.getDate(1).toLocalDate),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    weekly.foreach { case (t, series) =>
      series.sliding(2).foreach {
        case Seq((_, prev), (wk, n)) =>
          val (gn, gprev, growth) = got((t, wk))
          assert(gn === n && gprev === prev)
          assert(math.abs(growth - (n - prev).toDouble / prev) < 1e-12)
        case _ =>
      }
      // first week of each series never appears (no prior week)
      assert(!got.contains((t, series.head._1)))
    }
    assert(got.size === weekly.values.map(s => s.size - 1).sum)
  }

  test("seasonal-naive accuracy matches a driver-side recompute") {
    val daily = Tables.events(spark, Sf)
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => ((r.getString(0), r.getDate(1).toLocalDate.toEpochDay), r.getLong(2)))
      .toMap
    val got = SparkEntry.queries("q_events_snaive")(spark, Sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val t = r.getString(0)
      // .toSeq BEFORE collect: collecting pairs out of a Map rebuilds
      // a Map, silently collapsing duplicate actual-count keys
      val pairs = daily.toSeq.collect {
        case ((`t`, ep), c) if daily.contains((t, ep - 7)) =>
          (c, daily((t, ep - 7)))
      }
      assert(r.getLong(1) === pairs.size.toLong)
      val absErr = pairs.map(p => math.abs(p._1 - p._2)).sum
      assert(math.abs(r.getDouble(2) - absErr.toDouble / pairs.size) < 1e-12)
      assert(math.abs(r.getDouble(3) - absErr.toDouble / pairs.map(_._1).sum) < 1e-12)
      assert(r.getLong(4) === pairs.map(p => p._2 - p._1).sum)
    }
  }

  test("robust scaling: ordered quartiles, iqr identity, outlier count exact") {
    val rows = SparkEntry.queries("q_feature_scale_robust")(spark, Sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (t, q1, med, q3, iqr) = (r.getString(0), r.getDouble(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(q1 <= med && med <= q3 && iqr === q3 - q1)
      val vals = Tables.events(spark, Sf)
        .filter(col("event_type") === t)
        .select(col("value")).collect().map(_.getDouble(0))
      assert(r.getLong(5) === vals.length.toLong)
      val out = vals.count(v => v < q1 - 1.5 * iqr || v > q3 + 1.5 * iqr)
      assert(r.getLong(6) === out.toLong, s"$t outliers")
      // exact-discrete quartiles are real data values
      assert(vals.contains(q1) && vals.contains(med) && vals.contains(q3))
    }
  }

  test("embedding health: 64 dims, moments match a driver recompute") {
    val rows = SparkEntry.queries("q_embed_health")(spark, Sf).collect()
    assert(rows.map(_.getAs[Int]("pos")).toSeq === (1 to 64))
    val vecs = Tables.embeddings(spark, Sf)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)
    rows.foreach { r =>
      val pos = r.getAs[Int]("pos")
      val vs = vecs.map(_(pos - 1))
      assert(r.getAs[Long]("n") === vs.length.toLong)
      // integer-scaled sums, mirrored
      val s1 = vs.map(v => math.round(v.toDouble * 1e7)).sum
      val s2 = vs.map(v => { val s = math.round(v.toDouble * 1e7); s * s }).sum
      val mean = s1.toDouble / 1e7 / vs.length
      val variance = s2.toDouble / 1e14 / vs.length - mean * mean
      assert(math.abs(r.getAs[Double]("mean") - mean) < 1e-12)
      assert(math.abs(r.getAs[Double]("variance") - variance) < 1e-12)
      assert(r.getAs[Double]("minv") === vs.min.toDouble)
      assert(r.getAs[Double]("maxv") === vs.max.toDouble)
      // random unit-ish embeddings: no dimension is dead
      assert(!r.getAs[Boolean]("dead"))
      assert(r.getAs[Double]("variance") >= 0.0)
    }
  }

  test("generalization ladder: levels partition the kanon cells, rows conserved") {
    val rows = SparkEntry.queries("q_anon_generalize")(spark, Sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n_cells"),
        r.getAs[Long]("n_rows")))
    assert(rows.nonEmpty)
    assert(rows.forall(r => Set("day", "week", "month", "suppress")(r._2)))
    // total rows across levels = total event rows; cells = kanon groups
    val totalRows = Tables.events(spark, Sf).count()
    assert(rows.map(_._4).sum === totalRows)
    val nCells = Tables.events(spark, Sf)
      .select(col("event_type"), col("ts").cast("date").as("d"),
        floor(col("value") / 100).cast("long").as("vb"))
      .distinct().count()
    assert(rows.map(_._3).sum === nCells)
    // every day-level cell must itself have k >= 5: day-level rows
    // count at least 5 per cell
    rows.filter(_._2 == "day").foreach { r => assert(r._4 >= 5 * r._3) }
  }

  test("dup-gram rate matches a driver-side shingle recompute") {
    val docs = Tables.documents(spark, Sf)
      .select(col("source"), split(col("text"), " ").as("t"))
      .collect().map(r => (r.getString(0), r.getSeq[String](1)))
    val grams = docs.flatMap { case (src, t) =>
      if (t.length < 8) Seq.empty
      else t.sliding(8).map(w => (src, w.mkString(" "))).toSet.toSeq
    }
    val bySrc = grams.groupBy(_._1)
    val got = SparkEntry.queries("q_text_dupgrams")(spark, Sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val src = r.getString(0)
      val occ = bySrc(src).size.toLong
      val dist = bySrc(src).map(_._2).distinct.size.toLong
      assert(r.getAs[Long]("n_occurrences") === occ)
      assert(r.getAs[Long]("n_distinct") === dist)
      assert(math.abs(r.getAs[Double]("dup_rate") -
        (occ - dist).toDouble / occ) < 1e-15)
    }
  }

  test("retention TTL: purge + kept partitions reconcile") {
    val rows = SparkEntry.queries("q_retention_ttl")(spark, Sf).collect()
    assert(rows.nonEmpty)
    val mx = Tables.events(spark, Sf)
      .agg(max(col("ts").cast("date"))).collect().head
      .getDate(0).toLocalDate
    val cutoff = mx.minusDays(14)
    rows.foreach { r =>
      val t = r.getString(0)
      val ds = Tables.events(spark, Sf)
        .filter(col("event_type") === t)
        .select(col("ts").cast("date"), length(col("props")).cast("long"))
        .collect().map(x => (x.getDate(0).toLocalDate, x.getLong(1)))
      assert(r.getAs[Long]("n_rows") === ds.length.toLong)
      val purged = ds.filter(_._1.isBefore(cutoff))
      assert(r.getAs[Long]("purge_rows") === purged.length.toLong)
      assert(r.getAs[Long]("purge_bytes") === purged.map(_._2).sum)
      val kept = ds.filterNot(_._1.isBefore(cutoff))
      assert(r.getAs[java.sql.Date]("oldest_kept").toLocalDate ===
        kept.map(_._1).min(Ordering.by((d: java.time.LocalDate) => d.toEpochDay)))
    }
  }

  test("langid confusion: rows conserved, shares sum to one per truth") {
    val rows = SparkEntry.queries("q_text_langid_eval")(spark, Sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n"),
        r.getAs[Double]("share")))
    assert(rows.nonEmpty)
    val total = Tables.documents(spark, Sf).count()
    assert(rows.map(_._3).sum === total)
    rows.groupBy(_._1).foreach { case (lang, g) =>
      assert(math.abs(g.map(_._4).sum - 1.0) < 1e-12, s"lang $lang")
    }
    // diagonal exists: at least one correct en prediction on the fixture
    assert(rows.exists(r => r._1 == "en" && r._2 == "en" && r._3 > 0))
  }

  test("Neyman allocation: shares sum to one, volatile-large strata get more") {
    val rows = SparkEntry.queries("q_sample_neyman")(spark, Sf)
      .collect()
      .map(r => (r.getString(0), r.getAs[Long]("n"), r.getAs[Double]("sd"),
        r.getAs[Double]("alloc_share"), r.getAs[Long]("n_alloc")))
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-12)
    rows.foreach { case (t, n, sd, share, alloc) =>
      assert(sd >= 0.0 && share > 0.0)
      assert(alloc === math.floor(1000.0 * share).toLong, t)
      // allocation ordering follows the N·S weight ordering
    }
    val byWeight = rows.sortBy(r => -(r._2.toDouble * r._3))
    assert(byWeight.head._4 === rows.map(_._4).max)
    assert(rows.map(_._5).sum <= 1000L)
  }

  test("DP noisy counts: bounded integer noise, count conservation modulo noise") {
    val rows = SparkEntry.queries("q_anon_dpcount")(spark, Sf)
      .collect()
      .map(r => (r.getString(0), r.getAs[Long]("true_n"),
        r.getAs[Long]("noise"), r.getAs[Long]("noisy_n"),
        r.getAs[Double]("epsilon")))
    assert(rows.nonEmpty)
    val trueCounts = Tables.events(spark, Sf)
      .groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { case (t, tn, nz, nn, eps) =>
      assert(tn === trueCounts(t))
      assert(nn === tn + nz)
      assert(math.abs(nz) <= 8, s"$t noise $nz outside mechanism support")
      assert(eps === 1.0)
    }
    // deterministic release: same key, same noise
    val again = SparkEntry.queries("q_anon_dpcount")(spark, Sf)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("noise")).toMap
    rows.foreach { case (t, _, nz, _, _) => assert(again(t) === nz) }
  }

  test("Lorenz curve: deciles partition users, cumulative share reaches one") {
    val rows = SparkEntry.queries("q_events_lorenz")(spark, Sf)
      .collect()
      .map(r => (r.getAs[Long]("decile"), r.getAs[Long]("n_users"),
        r.getAs[Double]("spend"), r.getAs[Double]("cum_share")))
    assert(rows.map(_._1).toSeq === (1L to 10L))
    val nUsers = Tables.events(spark, Sf)
      .select(col("user_id")).distinct().count()
    assert(rows.map(_._2).sum === nUsers)
    // cum_share strictly increasing, ends at exactly 1.0
    rows.sliding(2).foreach {
      case Array(a, b) => assert(b._4 > a._4)
      case _ =>
    }
    assert(math.abs(rows.last._4 - 1.0) < 1e-12)
    // ranked ascending: later deciles carry at least as much spend
    // per user on average (weak monotonicity of decile means)
    val means = rows.map(r => r._3 / r._2)
    means.sliding(2).foreach {
      case Array(a, b) => assert(b >= a - 1e-9)
      case _ =>
    }
  }

  test("time-to-convert matches a driver-side recompute") {
    val ev = Tables.events(spark, Sf)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    val firsts = byUser.map { case (u, es) =>
      (u, es.filter(_._2 == "click").map(_._3).minOption,
        es.filter(_._2 == "purchase").map(_._3).minOption)
    }
    val clicked = firsts.count(_._2.isDefined).toLong
    val deltas = firsts.collect {
      case (_, Some(c), Some(p)) if p >= c => p - c
    }.toSeq.sorted
    val r = SparkEntry.queries("q_events_ttc")(spark, Sf).collect().head
    assert(r.getAs[Long]("n_clicked") === clicked)
    assert(r.getAs[Long]("n_converted") === deltas.size.toLong)
    assert(r.getAs[Double]("cvr") === deltas.size.toDouble / clicked)
    assert(r.getAs[Double]("mean_s") ===
      deltas.sum.toDouble / deltas.size / 1e6)
    def pick(q: Double) = deltas(math.ceil(deltas.size * q).toInt - 1)
    assert(r.getAs[Double]("median_s") === pick(0.5).toDouble / 1e6)
    assert(r.getAs[Double]("p90_s") === pick(0.9).toDouble / 1e6)
  }

  test("rolling median: exact-discrete over the trailing window, smooths a spike") {
    val daily = Tables.events(spark, Sf)
      .groupBy(col("ts").cast("date").as("d")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .sortBy(_._1.toEpochDay)
    val got = SparkEntry.queries("q_events_rolling_median")(spark, Sf)
      .collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.map(d => (d._1, d._2)).toSeq === daily.toSeq)
    got.zipWithIndex.foreach { case ((_, _, med, winN), i) =>
      val win = daily.slice(math.max(0, i - 6), i + 1).map(_._2).sorted
      assert(winN === win.length.toLong)
      assert(med === win((math.ceil(win.length / 2.0) - 1).toInt))
    }
  }

  test("new vs returning: events conserved, first day all-new, users reconcile") {
    val rows = SparkEntry.queries("q_events_new_returning")(spark, Sf)
      .collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
      .sortBy(_._1.toEpochDay)
    assert(rows.nonEmpty)
    val total = Tables.events(spark, Sf).count()
    assert(rows.map(r => r._2 + r._3).sum === total)
    // the corpus's first day has no possible returners
    assert(rows.head._3 === 0L && rows.head._6 === 1.0)
    // new users across all days = distinct users
    val users = Tables.events(spark, Sf)
      .select(col("user_id")).distinct().count()
    assert(rows.map(_._4).sum === users)
    rows.foreach { r =>
      assert(r._4 <= r._5) // new users are a subset of active users
      assert(r._6 >= 0.0 && r._6 <= 1.0)
    }
  }

  test("MAD anomaly screen matches a driver-side robust recompute") {
    val rows = Tables.events(spark, Sf)
      .select(col("event_type"),
        (Tables.dec(col("value")) * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val got = SparkEntry.queries("q_events_mad")(spark, Sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val t = r.getString(0)
      val cents = rows.filter(_._1 == t).map(_._2).sorted
      val med = cents((cents.length + 1) / 2 - 1)
      val devs = cents.map(c => math.abs(c - med)).sorted
      val mad = devs((devs.length + 1) / 2 - 1)
      assert(r.getAs[Long]("n") === cents.length.toLong)
      assert(r.getAs[Double]("median") === med.toDouble / 100.0)
      assert(r.getAs[Double]("mad") === mad.toDouble / 100.0)
      val outliers = cents.count(c => math.abs(c - med) * 6745 > mad * 35000)
      assert(r.getAs[Long]("n_outliers") === outliers.toLong)
    }
  }

  test("vocabulary richness: types <= tokens, hapax <= types, shares in (0,1]") {
    val rows = SparkEntry.queries("q_text_vocab")(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tok, typ, hap) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(typ <= tok && hap <= typ && typ > 0)
      assert(math.abs(r.getDouble(4) - typ.toDouble / tok) < 1e-15)
      assert(math.abs(r.getDouble(5) - hap.toDouble / typ) < 1e-15)
    }
  }
}
