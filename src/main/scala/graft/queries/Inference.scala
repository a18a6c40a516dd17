package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.GlobalRank

/** Statistical inference over event data (round 12): the hypothesis
  * tests and survival/diversity summaries an analytics warehouse runs
  * after the descriptive reports (q_events_ab_test's z-test, the
  * autocorrelation/seasonality profiles) — chi-squared independence,
  * two-sample Kolmogorov–Smirnov, Kaplan–Meier survival, and Simpson
  * diversity. All four are oracle-checked: test statistics close over
  * exact integer sufficient statistics, and any float reduction with
  * more than a fixed handful of operands runs as an ORDERED fold
  * (the q_events_holt / q_events_cusum list-fold idiom) so both
  * engines accumulate in the same sequence.
  *
  * Reference scope: the reference exports event rows and lets the
  * warehouse analyze them (Unity_to_BigQuery.py:79-92); these are the
  * analyses.
  */
object Inference extends QueryPack {

  override def queries: Map[String, Query] = Map(
    // Chi-squared independence test of event_type × day-of-week: is
    // traffic mix independent of weekday? Observed counts are one
    // map-side-combinable groupBy (exact int64); margins are two
    // category-bounded aggregates broadcast back onto the 35-cell
    // frame; each cell's (O−E)²/E term is a fixed double chain; and
    // the 35-term sum runs as an ORDERED fold over the (type, dow)-
    // sorted term list — bit-identical on both engines where a plain
    // SUM(double) would drift with aggregation order. Cramér's V
    // normalizes by n·min(r−1, c−1) for an effect size alongside the
    // statistic. Row data is touched exactly once at any volume.
    "q_stats_chisq" -> ((spark, sfDir) => {
      val obs = Tables.events(spark, sfDir)
        .select(col("event_type").as("t"), dayofweek(col("ts")).as("dow"))
        .groupBy(col("t"), col("dow")).agg(count(lit(1)).as("o"))
      val rowT = obs.groupBy(col("t")).agg(sum(col("o")).as("rt"))
      val colT = obs.groupBy(col("dow")).agg(sum(col("o")).as("ct"))
      val n = obs.agg(sum(col("o")).as("n"), countDistinct(col("t")).as("r"),
        countDistinct(col("dow")).as("c"))
      val e = col("rt").cast("double") * col("ct").cast("double") /
        col("n").cast("double")
      val term = (col("o").cast("double") - e) * (col("o").cast("double") - e) / e
      // no broadcast hints on the margins: they're category-bounded in
      // reality but GROUPED aggregates to the plan audit (which can't
      // see the bound) — and the joins are margin-sized anyway, so AQE
      // picks the right strategy unhinted
      val cells = obs
        .join(rowT, "t").join(colT, "dow")
        .crossJoin(broadcast(n))
        .agg(array_sort(collect_list(struct(col("t"), col("dow"),
          term.as("term")))).as("terms"))
      val chisq = aggregate(
        transform(col("terms"), s => s.getField("term")),
        lit(0.0), (acc, x) => acc + x)
      cells.crossJoin(broadcast(n))
        .select(col("n"), ((col("r") - 1) * (col("c") - 1)).as("dof"),
          chisq.as("chisq"),
          sqrt(chisq / (col("n").cast("double") *
            least(col("r") - 1, col("c") - 1).cast("double")))
            .as("cramers_v"))
    }),

    // Two-sample Kolmogorov–Smirnov test: D = sup |F_click − F_purchase|
    // over the spend distributions. The empirical CDFs are built
    // DISTRIBUTED: one groupBy collapses rows to the distinct-value
    // frame with both samples' counts, then ONE GlobalRank.
    // withRunningSums range-pass produces both running counts with
    // guaranteed-consistent range boundaries (two separate passes
    // could disagree on boundaries when exchange reuse misses — the
    // documented nested-call hazard). No unpartitioned row-scale
    // window anywhere; per-row CDF gaps are fixed double chains of
    // exact int64s, and max/min closes are order-independent. d_at
    // reports the value where the sup is attained (min-value
    // tiebreak, engine-stable).
    "q_stats_ks" -> ((spark, sfDir) => {
      val byV = Tables.events(spark, sfDir)
        .filter(col("event_type").isin("click", "purchase"))
        .select(Tables.dec(col("value")).as("v"), col("event_type"))
        .groupBy(col("v"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("c1"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("c2"))
      val tot = byV.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
      val gaps = GlobalRank
        .withRunningSums(byV, Seq("r1" -> col("c1"), "r2" -> col("c2")), col("v"))
        .crossJoin(broadcast(tot))
        .select(col("v"),
          abs(col("r1").cast("double") / col("n1").cast("double") -
            col("r2").cast("double") / col("n2").cast("double")).as("gap"))
      val d = gaps.agg(max(col("gap")).as("d_stat"))
      val at = gaps.crossJoin(broadcast(d))
        .filter(col("gap") === col("d_stat"))
        .agg(min(col("v")).as("d_at"))
      tot.crossJoin(broadcast(d)).crossJoin(broadcast(at))
        // d_at leaves as DOUBLE: decimal output columns are
        // hash-unsafe in the driver compare (EntrySpec gate); a
        // 2-decimal money value converts exactly the same way in
        // both engines (the q_join_inner price precedent)
        .select(col("n1"), col("n2"), col("d_stat"),
          col("d_at").cast("double").as("d_at"))
    }),

    // Kaplan–Meier survival over user lifetimes with right-censoring:
    // duration = days between a user's first and last event; a user
    // still active in the final 7 days of the corpus is CENSORED (we
    // never saw them leave), not a churn event — the estimator's whole
    // point vs a naive churn histogram. Per-duration death/censor
    // counts collapse to a CALENDAR-BOUNDED life table (≤ observation
    // window in days — metadata-scale, the GlobalRank-offsets
    // precedent for its unpartitioned windows); at-risk counts are a
    // reverse running sum over that table; and S(t) = Π_{s≤t}
    // (1 − d_s/n_s) folds each row's PREFIX of the broadcast factor
    // list in ascending-duration order — same sequence on both
    // engines, so the product is bit-stable where pow/exp-log
    // formulations are not. Row-scale work is one user_id groupBy.
    "q_events_survival" -> ((spark, sfDir) => {
      val mx = Tables.events(spark, sfDir)
        .agg(max(col("ts").cast("date")).as("mx"))
      val life = Tables.events(spark, sfDir)
        .groupBy(col("user_id"))
        .agg(min(col("ts").cast("date")).as("first_d"),
          max(col("ts").cast("date")).as("last_d"))
        .crossJoin(broadcast(mx))
        // long: DuckDB date−date is BIGINT, Spark datediff is INT —
        // align for the schema compare (the levenshtein precedent)
        .select(datediff(col("last_d"), col("first_d")).cast("long").as("dur"),
          (datediff(col("mx"), col("last_d")) >= 7).as("churned"))
      val tbl = life.groupBy(col("dur"))
        .agg(sum(when(col("churned"), 1L).otherwise(0L)).as("deaths"),
          count(lit(1)).as("ending"))
      val wAtRisk = Window.orderBy(col("dur"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val withRisk = tbl.withColumn("at_risk", sum(col("ending")).over(wAtRisk))
      // factor list [dur, 1 − d/n] sorted ascending — one row per
      // distinct duration, calendar-bounded, broadcastable by
      // construction
      val factors = withRisk.agg(sort_array(collect_list(
        array(col("dur").cast("double"),
          lit(1.0) - col("deaths").cast("double") /
            col("at_risk").cast("double")))).as("fs"))
      withRisk.crossJoin(broadcast(factors))
        .select(col("dur"), col("deaths"), col("ending"), col("at_risk"),
          aggregate(
            transform(
              filter(col("fs"), f => element_at(f, 1) <= col("dur").cast("double")),
              f => element_at(f, 2)),
            lit(1.0), (acc, x) => acc * x).as("survival"))
        .orderBy(col("dur"))
    }),

    // Mann–Whitney U (Wilcoxon rank-sum) test, click vs purchase
    // spend: the non-parametric alternative to q_events_ab_test's
    // z-test when the distribution is heavy-tailed. The whole
    // computation runs on EXACT integers via the doubled-rank trick:
    // with p rows strictly below a tied value and c tied at it, the
    // tied rows' average rank is (2p + c + 1)/2, so 2·R₁ =
    // Σ c₁·(2p + c + 1) stays integral (DECIMAL(38,0) against n²
    // growth) and U₁ = (2R₁ − n₁(n₁+1))/2 is one double division at
    // the end. Running prefix counts come from the SAME
    // GlobalRank.withRunningSums pass as the KS test (consistent
    // range boundaries); the tie-correction term Σ(t³−t) is another
    // exact integer aggregate; the normal-approximation z closes in
    // one fixed double chain.
    "q_stats_mannwhitney" -> ((spark, sfDir) => {
      val d380 = org.apache.spark.sql.types.DecimalType(38, 0)
      val byV = Tables.events(spark, sfDir)
        .filter(col("event_type").isin("click", "purchase"))
        .select(Tables.dec(col("value")).as("v"), col("event_type"))
        .groupBy(col("v"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("c1"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("c2"))
      val run = GlobalRank
        .withRunningSums(byV, Seq("r1" -> col("c1"), "r2" -> col("c2")), col("v"))
      val c = col("c1") + col("c2")
      val p = (col("r1") - col("c1")) + (col("r2") - col("c2"))
      // each factor casts to decimal BEFORE multiplying (both engines):
      // in Long arithmetic a single value tied across >2^21 rows wraps
      // the cube silently in non-ANSI Spark while DuckDB raises —
      // breaking z AND the cross-engine hash (round-12 ADVICE; the
      // q_shuffle_shards overflow rule). Widths chosen so the products
      // stay inside DECIMAL(38,0) up to ~10^12 rows: (13)+(14)+1 = 28
      // for the rank product, 12·3 + 2 = 38 for the cube.
      val d130 = org.apache.spark.sql.types.DecimalType(13, 0)
      val d140 = org.apache.spark.sql.types.DecimalType(14, 0)
      val d120 = org.apache.spark.sql.types.DecimalType(12, 0)
      val c12 = c.cast(d120)
      val stats = run.agg(
        sum(col("c1")).as("n1"), sum(col("c2")).as("n2"),
        sum((col("c1").cast(d130) * (p * 2 + c + 1).cast(d140)).cast(d380))
          .as("rr1"),
        sum((c12 * c12 * c12 - c12).cast(d380)).as("ties"))
      val n1d = col("n1").cast("double")
      val n2d = col("n2").cast("double")
      val nd = n1d + n2d
      val u1 = (col("rr1").cast("double") - n1d * (n1d + 1)) / lit(2.0)
      val mu = n1d * n2d / lit(2.0)
      val sig = sqrt(n1d * n2d / lit(12.0) *
        ((nd + 1) - col("ties").cast("double") / (nd * (nd - 1))))
      stats.select(col("n1"), col("n2"), u1.as("u1"),
        (n1d * n2d - u1).as("u2"), ((u1 - mu) / sig).as("z"))
    }),

    // Poisson bootstrap confidence interval for the mean — the
    // bootstrap that actually runs at 100 TB: instead of
    // materializing B resamples (B full copies of the corpus), every
    // row draws B independent Poisson(1) weights and the B weighted
    // partial sums map-side-combine in ONE pass; the driver-scale
    // close is a 100-row percentile pick. Determinism: the "draw" is
    // the Knuth scramble of (event_id·101 + rep) compared against
    // PRECOMPUTED integer thresholds of the Poisson(1) CDF scaled by
    // 2³² — no float RNG, identical weights on any engine, rerun, or
    // partitioning (the q_sample_temperature doctrine). Weighted sums
    // are integer cents; each rep's mean is one double division; the
    // 95% CI is the exact-discrete rn = ceil(B·q) pick over the
    // B-row frame (unpartitioned window over 100 rows —
    // metadata-scale).
    "q_stats_bootstrap" -> ((spark, sfDir) => {
      val reps = 100
      val e = Tables.events(spark, sfDir)
        .select(col("event_id"),
          (Tables.dec(col("value")) * 100).cast("long").as("cents"))
      val drawn = e
        .select(col("event_id"), col("cents"),
          explode(sequence(lit(1), lit(reps))).as("rep"))
        .select(col("rep"), col("cents"),
          ((col("event_id") * 101 + col("rep")) % 1000003L * 2654435761L
            % 4294967296L).as("h"))
      val w = when(col("h") <= 1580030168L, 0L)
        .when(col("h") <= 3160060337L, 1L)
        .when(col("h") <= 3950075421L, 2L)
        .when(col("h") <= 4213413783L, 3L)
        .when(col("h") <= 4279248373L, 4L)
        .when(col("h") <= 4292415291L, 5L)
        .when(col("h") <= 4294609777L, 6L)
        .when(col("h") <= 4294923276L, 7L)
        .otherwise(8L)
      val means = drawn
        .select(col("rep"), w.as("w"), col("cents"))
        .groupBy(col("rep"))
        .agg(sum(col("w") * col("cents")).as("sw"), sum(col("w")).as("nw"))
        .select(col("rep"),
          (col("sw").cast("double") / col("nw").cast("double") / lit(100.0))
            .as("m"))
      val wrn = Window.orderBy(col("m"), col("rep"))
      val ranked = means.withColumn("rn", row_number().over(wrn))
      val full = e.agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
      val ci = ranked.agg(
        max(when(col("rn") === math.ceil(reps * 0.025).toLong, col("m")))
          .as("ci_lo"),
        max(when(col("rn") === math.ceil(reps * 0.975).toLong, col("m")))
          .as("ci_hi"), count(lit(1)).as("n_reps"))
      full.crossJoin(broadcast(ci))
        .select(col("n"),
          (col("cents").cast("double") / col("n").cast("double") / lit(100.0))
            .as("mean"),
          col("ci_lo"), col("ci_hi"), col("n_reps"))
    }),

    // Minimum detectable effect at current sample size (round 12):
    // the question every A/B test answers BEFORE launch — with n
    // observations per type and conversion rate p (value > 100, the
    // q_feature_odds target), what absolute/relative lift could a
    // two-sided α=5%, power-80% test even see?
    // mde = (z_{α/2} + z_β)·√(2p(1−p)/n). The z quantiles are
    // LITERAL constants (1.959963984540054, 0.8416212335729143) — no
    // engine erf/quantile function is consulted, so the double chain
    // is fixed; counts are exact int64. Category-bounded output.
    "q_events_mde" -> ((spark, sfDir) => {
      val z = lit(1.959963984540054 + 0.8416212335729143)
      val pd = col("pos").cast("double") / col("n").cast("double")
      val mde = z * sqrt(lit(2.0) * pd * (lit(1.0) - pd) /
        col("n").cast("double"))
      Tables.events(spark, sfDir)
        .select(col("event_type"),
          (Tables.dec(col("value")) > 100).as("pos"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("pos"), 1L).otherwise(0L)).as("pos"))
        .select(col("event_type"), col("n"), pd.as("p"),
          mde.as("mde_abs"), (mde / pd).as("mde_rel"))
        .orderBy(col("event_type"))
    }),

    // Difference-in-differences (round 12): the workhorse causal
    // estimate when randomization isn't available — treatment (odd
    // user_id, the q_split_train_test hash doctrine would apply to a
    // real rollout) vs control, before vs after a data-derived pivot
    // (min date + 15 days), on mean spend:
    // did = (μ_T,post − μ_T,pre) − (μ_C,post − μ_C,pre). The four
    // cells compute as conditional aggregates in ONE pass (exact
    // integer cents + counts); the pivot is a 1-row broadcast; the
    // close is a fixed chain of four divisions and three subtractions
    // identical on both engines.
    "q_events_did" -> ((spark, sfDir) => {
      val pivot = Tables.events(spark, sfDir)
        .agg(date_add(min(col("ts").cast("date")), 15).as("pivot"))
      def cellMean(t: Boolean, post: Boolean) = {
        val m = col("user_id") % 2 === (if (t) 1 else 0) &&
          (if (post) col("d") >= col("pivot") else col("d") < col("pivot"))
        (sum(when(m, col("cents")).otherwise(0L)).cast("double") /
          sum(when(m, 1L).otherwise(0L)).cast("double") / lit(100.0))
      }
      val cells = Tables.events(spark, sfDir)
        .select(col("user_id"), col("ts").cast("date").as("d"),
          (Tables.dec(col("value")) * 100).cast("long").as("cents"))
        .crossJoin(broadcast(pivot))
        .agg(cellMean(t = true, post = false).as("treat_pre"),
          cellMean(t = true, post = true).as("treat_post"),
          cellMean(t = false, post = false).as("ctrl_pre"),
          cellMean(t = false, post = true).as("ctrl_post"))
      cells.select(col("treat_pre"), col("treat_post"), col("ctrl_pre"),
        col("ctrl_post"),
        ((col("treat_post") - col("treat_pre")) -
          (col("ctrl_post") - col("ctrl_pre"))).as("did"))
    }),

    // 10%-trimmed mean per type (round 12): drop the bottom and top
    // decile BY RANK and average the middle 80% — the outlier-robust
    // location estimate between the mean (q_agg_stats) and the median
    // (q_agg_median_group), reported next to the raw mean so the gap
    // itself flags tail contamination. Ranks come from the two-pass
    // per-group GlobalRank (a 5-task Window.partitionBy ceiling is
    // exactly what that operator exists to avoid); the trim boundary
    // ceil(0.1·n) computes the same double→ceil on both engines;
    // kept-range sums are exact integer cents.
    "q_agg_trimmed_mean" -> ((spark, sfDir) => {
      val e = Tables.events(spark, sfDir)
        .select(col("event_type"), col("event_id"),
          (Tables.dec(col("value")) * 100).cast("long").as("cents"))
      val ranked = GlobalRank.withRowNumberAndCountPerGroup(
        e, "rn", "n", Seq("event_type"), col("cents"), col("event_id"))
      val lo = ceil(col("n") * 0.1)
      val kept = col("rn") > lo && col("rn") <= col("n") - lo
      ranked.groupBy(col("event_type"))
        .agg(max(col("n")).as("n"),
          sum(when(kept, 1L).otherwise(0L)).as("n_kept"),
          sum(when(kept, col("cents")).otherwise(0L)).as("s_kept"),
          sum(col("cents")).as("s_all"))
        .select(col("event_type"), col("n"), col("n_kept"),
          (col("s_kept").cast("double") / col("n_kept").cast("double")
            / lit(100.0)).as("trimmed_mean"),
          (col("s_all").cast("double") / col("n").cast("double")
            / lit(100.0)).as("raw_mean"))
        .orderBy(col("event_type"))
    }),

    // Welch's t-test (round 12): the workhorse two-sample mean
    // comparison, click vs purchase spend — unequal variances, so the
    // Welch–Satterthwaite degrees of freedom rather than pooled
    // (the version statisticians actually recommend as the default).
    // Sufficient statistics are exact: counts int64 and cents sums /
    // sums-of-squares DECIMAL(38,0); the close — two sample
    // variances, the t statistic, and the df — is one fixed double
    // chain identical on both engines. One row-scale pass,
    // category-bounded everything after.
    "q_stats_ttest" -> ((spark, sfDir) => {
      val d380 = org.apache.spark.sql.types.DecimalType(38, 0)
      def side(t: String, p: String) = Seq(
        sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"n$p"),
        sum(when(col("event_type") === t, col("cents")).otherwise(0L)
          .cast(d380)).as(s"s$p"),
        sum(when(col("event_type") === t, col("cents") * col("cents"))
          .otherwise(0L).cast(d380)).as(s"q$p"))
      val stats = Tables.events(spark, sfDir)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_type"),
          (Tables.dec(col("value")) * 100).cast("long").as("cents"))
        .agg(side("click", "1").head,
          (side("click", "1").tail ++ side("purchase", "2")): _*)
      def nd(p: String) = col(s"n$p").cast("double")
      // mean in dollars; sample variance via (q − s²/n)/(n−1), scaled
      // from cents² to dollars²
      def mean(p: String) = col(s"s$p").cast("double") / nd(p) / lit(100.0)
      def va(p: String) = (col(s"q$p").cast("double") -
        col(s"s$p").cast("double") * col(s"s$p").cast("double") / nd(p)) /
        (nd(p) - 1) / lit(10000.0)
      val se1 = va("1") / nd("1")
      val se2 = va("2") / nd("2")
      val t = (mean("1") - mean("2")) / sqrt(se1 + se2)
      val df = (se1 + se2) * (se1 + se2) /
        (se1 * se1 / (nd("1") - 1) + se2 * se2 / (nd("2") - 1))
      stats.select(col("n1"), col("n2"), mean("1").as("mean1"),
        mean("2").as("mean2"), va("1").as("var1"), va("2").as("var2"),
        t.as("t_stat"), df.as("df"))
    }),

    // Permutation test (round 12): is the treatment/control (odd/even
    // user_id) mean-spend gap explainable by chance? The observed
    // difference is compared against B = 100 label permutations —
    // and, like q_stats_bootstrap, the permutations never materialize:
    // every row draws its B permuted labels from the Knuth scramble
    // of (user_id·131 + rep) mod 2 — permuting the ASSIGNMENT UNIT
    // (the user), not the event: event-level shuffles would break
    // within-user clustering and understate the null spread, the
    // classic clustered-randomization-inference mistake (measured
    // here: event-level permutation drove p to 1/101 on a null
    // effect). The B×2 conditional sums
    // map-side-combine in ONE pass, and the close counts permuted
    // |diff|s at least as extreme as the observed. p = (1 + #extreme)
    // / (B + 1), the standard add-one estimate. Exact integer cents;
    // per-rep diffs are fixed double chains; the extreme-count
    // comparison is between identically-computed doubles.
    "q_stats_permutation" -> ((spark, sfDir) => {
      val reps = 100
      val e = Tables.events(spark, sfDir)
        .select(col("user_id"),
          (Tables.dec(col("value")) * 100).cast("long").as("cents"))
      def diff(s1: Column, n1: Column, s0: Column, n0: Column) =
        s1.cast("double") / n1.cast("double") / lit(100.0) -
          s0.cast("double") / n0.cast("double") / lit(100.0)
      val obs = e.agg(
        sum(when(col("user_id") % 2 === 1, col("cents")).otherwise(0L)).as("s1"),
        sum(when(col("user_id") % 2 === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("user_id") % 2 === 0, col("cents")).otherwise(0L)).as("s0"),
        sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L)).as("n0"))
        .select(diff(col("s1"), col("n1"), col("s0"), col("n0")).as("obs_diff"))
      val perm = e
        .select(col("cents"), explode(sequence(lit(1), lit(reps))).as("rep"),
          col("user_id"))
        .select(col("rep"), col("cents"),
          ((col("user_id") * 131 + col("rep")) % 1000003L * 2654435761L
            % 4294967296L % 2L).as("g"))
        .groupBy(col("rep"))
        .agg(sum(when(col("g") === 1, col("cents")).otherwise(0L)).as("s1"),
          sum(when(col("g") === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("g") === 0, col("cents")).otherwise(0L)).as("s0"),
          sum(when(col("g") === 0, 1L).otherwise(0L)).as("n0"))
        .select(diff(col("s1"), col("n1"), col("s0"), col("n0")).as("pd"))
      perm.crossJoin(broadcast(obs))
        .agg(count(lit(1)).as("n_reps"),
          sum(when(abs(col("pd")) >= abs(col("obs_diff")), 1L).otherwise(0L))
            .as("n_extreme"),
          max(col("obs_diff")).as("obs_diff"))
        .select(col("obs_diff"), col("n_reps"), col("n_extreme"),
          ((col("n_extreme") + 1).cast("double") /
            (col("n_reps") + 1).cast("double")).as("p_value"))
    }),

    // Simpson diversity of the daily event-type mix: the probability
    // two random same-day events share a type (Σp²), its complement,
    // and the effective number of types n²/Σc² — the
    // concentration/diversity screen behind traffic-mix monitoring
    // (log-free by design: Shannon entropy's ln() doubles are not
    // cross-engine bit-stable — the q_feature_odds precedent — while
    // Simpson carries the same ordering). Two bounded aggregates;
    // Σc² stays exact int64 up to ~3·10⁹ events/day/type; closes are
    // fixed double chains.
    "q_events_diversity" -> ((spark, sfDir) => {
      val byType = Tables.events(spark, sfDir)
        .groupBy(col("ts").cast("date").as("d"), col("event_type"))
        .agg(count(lit(1)).as("c"))
      val nn = col("n").cast("double") * col("n").cast("double")
      byType.groupBy(col("d"))
        .agg(sum(col("c")).as("n"), count(lit(1)).as("n_types"),
          sum(col("c") * col("c")).as("sumsq"))
        .select(col("d"), col("n"), col("n_types"),
          (col("sumsq").cast("double") / nn).as("simpson"),
          (lit(1.0) - col("sumsq").cast("double") / nn).as("diversity"),
          (nn / col("sumsq").cast("double")).as("effective_types"))
        .orderBy(col("d"))
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_stats_chisq" ->
      """WITH obs AS (
        |  SELECT event_type AS t, dayofweek(ts) + 1 AS dow, COUNT(*) AS o
        |  FROM events GROUP BY 1, 2),
        |rt AS (SELECT t, CAST(SUM(o) AS BIGINT) AS rt FROM obs GROUP BY t),
        |ct AS (SELECT dow, CAST(SUM(o) AS BIGINT) AS ct FROM obs GROUP BY dow),
        |n AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
        |        COUNT(DISTINCT t) AS r, COUNT(DISTINCT dow) AS c FROM obs),
        |cells AS (
        |  SELECT list(
        |    (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
        |       / CAST(n AS DOUBLE))
        |    * (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
        |       / CAST(n AS DOUBLE))
        |    / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
        |    ORDER BY t, dow) AS terms
        |  FROM obs JOIN rt USING (t) JOIN ct USING (dow) CROSS JOIN n),
        |f AS (
        |  SELECT list_reduce(list_prepend(0.0::DOUBLE, terms),
        |    (acc, x) -> acc + x) AS chisq
        |  FROM cells)
        |SELECT n, (r - 1) * (c - 1) AS dof, chisq,
        |  SQRT(chisq / (CAST(n AS DOUBLE)
        |    * CAST(LEAST(r - 1, c - 1) AS DOUBLE))) AS cramers_v
        |FROM n CROSS JOIN f""".stripMargin,

    "q_stats_ks" ->
      """WITH b AS (
        |  SELECT CAST(value AS DECIMAL(18,2)) AS v,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c1,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c2
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  GROUP BY 1),
        |t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
        |        CAST(SUM(c2) AS BIGINT) AS n2 FROM b),
        |g AS (
        |  SELECT v,
        |    ABS(CAST(CAST(SUM(c1) OVER w AS BIGINT) AS DOUBLE)
        |          / CAST(n1 AS DOUBLE)
        |        - CAST(CAST(SUM(c2) OVER w AS BIGINT) AS DOUBLE)
        |          / CAST(n2 AS DOUBLE)) AS gap
        |  FROM b CROSS JOIN t
        |  WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW)),
        |d AS (SELECT MAX(gap) AS d_stat FROM g),
        |a AS (SELECT MIN(v) AS d_at FROM g, d WHERE gap = d_stat)
        |SELECT n1, n2, d_stat, CAST(d_at AS DOUBLE) AS d_at
        |FROM t CROSS JOIN d CROSS JOIN a""".stripMargin,

    "q_events_survival" ->
      """WITH mx AS (SELECT MAX(CAST(ts AS DATE)) AS mx FROM events),
        |life AS (
        |  SELECT MAX(CAST(ts AS DATE)) - MIN(CAST(ts AS DATE)) AS dur,
        |    mx - MAX(CAST(ts AS DATE)) >= 7 AS churned
        |  FROM events CROSS JOIN mx GROUP BY user_id, mx),
        |tbl AS (
        |  SELECT dur,
        |    CAST(SUM(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT) AS deaths,
        |    COUNT(*) AS ending
        |  FROM life GROUP BY dur),
        |r AS (
        |  SELECT dur, deaths, ending,
        |    CAST(SUM(ending) OVER (ORDER BY dur ROWS BETWEEN CURRENT ROW
        |      AND UNBOUNDED FOLLOWING) AS BIGINT) AS at_risk
        |  FROM tbl),
        |fs AS (
        |  SELECT list([CAST(dur AS DOUBLE),
        |    1.0 - CAST(deaths AS DOUBLE) / CAST(at_risk AS DOUBLE)]
        |    ORDER BY dur) AS fs
        |  FROM r)
        |SELECT dur, deaths, ending, at_risk,
        |  list_reduce(list_prepend(1.0::DOUBLE,
        |    list_transform(
        |      list_filter(fs, f -> f[1] <= CAST(dur AS DOUBLE)),
        |      f -> f[2])),
        |    (acc, x) -> acc * x) AS survival
        |FROM r CROSS JOIN fs ORDER BY dur""".stripMargin,

    "q_agg_trimmed_mean" ->
      """WITH e AS (
        |  SELECT event_type, event_id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |r AS (
        |  SELECT event_type, cents,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY cents, event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM e),
        |k AS (
        |  SELECT event_type, cents, n,
        |    rn > CEIL(n * 0.1) AND rn <= n - CEIL(n * 0.1) AS kept
        |  FROM r)
        |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(CAST(SUM(CASE WHEN kept THEN cents ELSE 0 END) AS BIGINT)
        |    AS DOUBLE)
        |    / CAST(CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT)
        |      AS DOUBLE) / 100.0 AS trimmed_mean,
        |  CAST(CAST(SUM(cents) AS BIGINT) AS DOUBLE)
        |    / CAST(CAST(MAX(n) AS BIGINT) AS DOUBLE) / 100.0 AS raw_mean
        |FROM k GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_stats_ttest" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |s AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n1,
        |    CAST(SUM(CAST(CASE WHEN event_type = 'click' THEN cents
        |      ELSE 0 END AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s1,
        |    CAST(SUM(CAST(CASE WHEN event_type = 'click' THEN cents * cents
        |      ELSE 0 END AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS q1,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n2,
        |    CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN cents
        |      ELSE 0 END AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2,
        |    CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN cents * cents
        |      ELSE 0 END AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS q2
        |  FROM e),
        |m AS (
        |  SELECT n1, n2,
        |    CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 100.0 AS mean1,
        |    CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) / 100.0 AS mean2,
        |    (CAST(q1 AS DOUBLE)
        |       - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
        |      / (CAST(n1 AS DOUBLE) - 1) / 10000.0 AS var1,
        |    (CAST(q2 AS DOUBLE)
        |       - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
        |      / (CAST(n2 AS DOUBLE) - 1) / 10000.0 AS var2
        |  FROM s),
        |w AS (
        |  SELECT n1, n2, mean1, mean2, var1, var2,
        |    var1 / CAST(n1 AS DOUBLE) AS se1,
        |    var2 / CAST(n2 AS DOUBLE) AS se2
        |  FROM m)
        |SELECT n1, n2, mean1, mean2, var1, var2,
        |  (mean1 - mean2) / SQRT(se1 + se2) AS t_stat,
        |  (se1 + se2) * (se1 + se2)
        |    / (se1 * se1 / (CAST(n1 AS DOUBLE) - 1)
        |       + se2 * se2 / (CAST(n2 AS DOUBLE) - 1)) AS df
        |FROM w""".stripMargin,

    "q_stats_permutation" ->
      """WITH e AS (
        |  SELECT event_id, user_id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |obs AS (
        |  SELECT
        |    CAST(CAST(SUM(CASE WHEN user_id % 2 = 1 THEN cents ELSE 0 END)
        |      AS BIGINT) AS DOUBLE)
        |      / CAST(CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
        |        AS BIGINT) AS DOUBLE) / 100.0
        |    - CAST(CAST(SUM(CASE WHEN user_id % 2 = 0 THEN cents ELSE 0 END)
        |        AS BIGINT) AS DOUBLE)
        |      / CAST(CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
        |        AS BIGINT) AS DOUBLE) / 100.0 AS obs_diff
        |  FROM e),
        |perm AS (
        |  SELECT rep,
        |    CAST(CAST(SUM(CASE WHEN g = 1 THEN cents ELSE 0 END)
        |      AS BIGINT) AS DOUBLE)
        |      / CAST(CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END)
        |        AS BIGINT) AS DOUBLE) / 100.0
        |    - CAST(CAST(SUM(CASE WHEN g = 0 THEN cents ELSE 0 END)
        |        AS BIGINT) AS DOUBLE)
        |      / CAST(CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END)
        |        AS BIGINT) AS DOUBLE) / 100.0 AS pd
        |  FROM (
        |    SELECT rep, cents,
        |      (user_id * 131 + rep) % 1000003 * 2654435761
        |        % 4294967296 % 2 AS g
        |    FROM e CROSS JOIN (SELECT UNNEST(range(1, 101)) AS rep) reps)
        |  GROUP BY rep)
        |SELECT obs_diff, COUNT(*) AS n_reps,
        |  CAST(SUM(CASE WHEN ABS(pd) >= ABS(obs_diff) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_extreme,
        |  CAST(CAST(SUM(CASE WHEN ABS(pd) >= ABS(obs_diff) THEN 1 ELSE 0 END)
        |    AS BIGINT) + 1 AS DOUBLE) / CAST(COUNT(*) + 1 AS DOUBLE)
        |    AS p_value
        |FROM perm CROSS JOIN obs GROUP BY obs_diff""".stripMargin,

    "q_events_mde" ->
      """WITH c AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    CAST(SUM(CASE WHEN CAST(value AS DECIMAL(18,2)) > 100
        |      THEN 1 ELSE 0 END) AS BIGINT) AS pos
        |  FROM events GROUP BY event_type)
        |SELECT event_type, n,
        |  CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) AS p,
        |  2.8015852181129683
        |    * SQRT(2.0 * (CAST(pos AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (1.0 - CAST(pos AS DOUBLE) / CAST(n AS DOUBLE))
        |      / CAST(n AS DOUBLE)) AS mde_abs,
        |  2.8015852181129683
        |    * SQRT(2.0 * (CAST(pos AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (1.0 - CAST(pos AS DOUBLE) / CAST(n AS DOUBLE))
        |      / CAST(n AS DOUBLE))
        |    / (CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)) AS mde_rel
        |FROM c ORDER BY event_type""".stripMargin,

    "q_events_did" ->
      """WITH p AS (
        |  SELECT MIN(CAST(ts AS DATE)) + 15 AS pv FROM events),
        |e AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |cells AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN user_id % 2 = 1 AND d < pv
        |        THEN cents ELSE 0 END) AS BIGINT) AS tp_s,
        |    CAST(SUM(CASE WHEN user_id % 2 = 1 AND d < pv
        |        THEN 1 ELSE 0 END) AS BIGINT) AS tp_n,
        |    CAST(SUM(CASE WHEN user_id % 2 = 1 AND d >= pv
        |        THEN cents ELSE 0 END) AS BIGINT) AS tq_s,
        |    CAST(SUM(CASE WHEN user_id % 2 = 1 AND d >= pv
        |        THEN 1 ELSE 0 END) AS BIGINT) AS tq_n,
        |    CAST(SUM(CASE WHEN user_id % 2 = 0 AND d < pv
        |        THEN cents ELSE 0 END) AS BIGINT) AS cp_s,
        |    CAST(SUM(CASE WHEN user_id % 2 = 0 AND d < pv
        |        THEN 1 ELSE 0 END) AS BIGINT) AS cp_n,
        |    CAST(SUM(CASE WHEN user_id % 2 = 0 AND d >= pv
        |        THEN cents ELSE 0 END) AS BIGINT) AS cq_s,
        |    CAST(SUM(CASE WHEN user_id % 2 = 0 AND d >= pv
        |        THEN 1 ELSE 0 END) AS BIGINT) AS cq_n
        |  FROM e CROSS JOIN p)
        |SELECT
        |  CAST(tp_s AS DOUBLE) / CAST(tp_n AS DOUBLE) / 100.0 AS treat_pre,
        |  CAST(tq_s AS DOUBLE) / CAST(tq_n AS DOUBLE) / 100.0 AS treat_post,
        |  CAST(cp_s AS DOUBLE) / CAST(cp_n AS DOUBLE) / 100.0 AS ctrl_pre,
        |  CAST(cq_s AS DOUBLE) / CAST(cq_n AS DOUBLE) / 100.0 AS ctrl_post,
        |  (CAST(tq_s AS DOUBLE) / CAST(tq_n AS DOUBLE) / 100.0
        |    - CAST(tp_s AS DOUBLE) / CAST(tp_n AS DOUBLE) / 100.0)
        |  - (CAST(cq_s AS DOUBLE) / CAST(cq_n AS DOUBLE) / 100.0
        |    - CAST(cp_s AS DOUBLE) / CAST(cp_n AS DOUBLE) / 100.0) AS did
        |FROM cells""".stripMargin,

    "q_stats_mannwhitney" ->
      """WITH b AS (
        |  SELECT CAST(value AS DECIMAL(18,2)) AS v,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c1,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c2
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  GROUP BY 1),
        |r AS (
        |  SELECT v, c1, c2,
        |    CAST(SUM(c1) OVER w AS BIGINT) AS r1,
        |    CAST(SUM(c2) OVER w AS BIGINT) AS r2
        |  FROM b
        |  WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW)),
        |s AS (
        |  SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2,
        |    CAST(SUM(CAST(c1 AS DECIMAL(13,0))
        |      * CAST(((r1 - c1) + (r2 - c2)) * 2
        |        + (c1 + c2) + 1 AS DECIMAL(14,0))) AS DECIMAL(38,0)) AS rr1,
        |    CAST(SUM(CAST(c1 + c2 AS DECIMAL(12,0))
        |      * CAST(c1 + c2 AS DECIMAL(12,0))
        |      * CAST(c1 + c2 AS DECIMAL(12,0))
        |      - CAST(c1 + c2 AS DECIMAL(12,0))) AS DECIMAL(38,0)) AS ties
        |  FROM r)
        |SELECT n1, n2,
        |  (CAST(rr1 AS DOUBLE) - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1))
        |    / 2.0 AS u1,
        |  CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |    - (CAST(rr1 AS DOUBLE)
        |       - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1)) / 2.0 AS u2,
        |  ((CAST(rr1 AS DOUBLE) - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1))
        |     / 2.0
        |   - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
        |  / SQRT(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
        |    * (((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) + 1)
        |      - CAST(ties AS DOUBLE)
        |        / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
        |          * ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) - 1)))) AS z
        |FROM s""".stripMargin,

    "q_stats_bootstrap" ->
      """WITH e AS (
        |  SELECT event_id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |drawn AS (
        |  SELECT rep, cents,
        |    (event_id * 101 + rep) % 1000003 * 2654435761 % 4294967296 AS h
        |  FROM e CROSS JOIN (SELECT UNNEST(range(1, 101)) AS rep) reps),
        |wt AS (
        |  SELECT rep, cents,
        |    CASE WHEN h <= 1580030168 THEN 0
        |         WHEN h <= 3160060337 THEN 1
        |         WHEN h <= 3950075421 THEN 2
        |         WHEN h <= 4213413783 THEN 3
        |         WHEN h <= 4279248373 THEN 4
        |         WHEN h <= 4292415291 THEN 5
        |         WHEN h <= 4294609777 THEN 6
        |         WHEN h <= 4294923276 THEN 7
        |         ELSE 8 END AS w
        |  FROM drawn),
        |means AS (
        |  SELECT rep,
        |    CAST(CAST(SUM(w * cents) AS BIGINT) AS DOUBLE)
        |      / CAST(CAST(SUM(w) AS BIGINT) AS DOUBLE) / 100.0 AS m
        |  FROM wt GROUP BY rep),
        |ranked AS (
        |  SELECT m, ROW_NUMBER() OVER (ORDER BY m, rep) AS rn FROM means),
        |ci AS (
        |  SELECT MAX(CASE WHEN rn = 3 THEN m END) AS ci_lo,
        |    MAX(CASE WHEN rn = 98 THEN m END) AS ci_hi,
        |    COUNT(*) AS n_reps
        |  FROM ranked),
        |fl AS (
        |  SELECT COUNT(*) AS n,
        |    CAST(SUM(cents) AS BIGINT) AS cents FROM e)
        |SELECT n,
        |  CAST(cents AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS mean,
        |  ci_lo, ci_hi, n_reps
        |FROM fl CROSS JOIN ci""".stripMargin,

    "q_events_diversity" ->
      """WITH c AS (
        |  SELECT CAST(ts AS DATE) AS d, event_type, COUNT(*) AS c
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT d, CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS n_types,
        |    CAST(SUM(c * c) AS BIGINT) AS sumsq
        |  FROM c GROUP BY d)
        |SELECT d, n, n_types,
        |  CAST(sumsq AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
        |    AS simpson,
        |  1.0 - CAST(sumsq AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
        |    AS diversity,
        |  (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) / CAST(sumsq AS DOUBLE)
        |    AS effective_types
        |FROM s ORDER BY d""".stripMargin
  )
}
