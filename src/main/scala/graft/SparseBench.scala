package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** Sparse-corpus fixture + dedup A/B (round 17, VERDICT r16 missing
  * #5): the graded documents fixture has a ~30-word vocabulary and
  * ~88% of its pairs are true near-dups (BASELINE.md r12) — a corpus
  * shaped like no real crawl, so every prefix-vs-plain plan-choice
  * argument measured on it is suspect. This harness synthesizes a
  * REALISTIC corpus and re-runs the dedup A/B on it:
  *
  *  - vocabulary 8,000 words, Zipf(≈1)-distributed via a log-uniform
  *    inverse CDF (rank = ⌊V^u⌋ — P(rank r) ∝ 1/r, the shape crawl
  *    token frequencies actually have: a stopword head every doc
  *    shares and a long rare tail that makes prefixes selective);
  *  - doc lengths 60–179 tokens; everything derived from splitmix64
  *    of (doc, position) — deterministic, no rand(), engine-free;
  *  - planted near-dups at a ≈5% rate: doc d with d ≡ 27 (mod 40)
  *    copies doc d−20, and d ≡ 13 (mod 40) copies d−60 — both
  *    partners share d's source block (sources cycle mod 20, the
  *    graded fixture's granularity) and NEITHER partner residue is
  *    itself planted, so plants never chain into one giant cluster;
  *    a plant only happens when the partner carries ≥ 27 DISTINCT
  *    token types (round 18, ADVICE r17: dedup compares
  *    distinct-token SETS, so the floor must be argued on types, not
  *    token count — 3 replacements move ≤ 3 types out of the set and
  *    ≤ 3 in, hence set-Jaccard ≥ (t−3)/(t+3), which clears 0.8
  *    exactly when t ≥ 27), so every planted pair is PROVABLY in the
  *    truth set of both A/B members.
  *
  * Answer checks ride along: q_dedup_jaccard and q_dedup_prefix
  * compute the SAME pair set by contract (exact source-blocked
  * unigram Jaccard ≥ 0.8; the prefix filter is lossless by the
  * Bayardo theorem), so their pair counts must be EQUAL on the sparse
  * corpus, and both must contain every planted pair. Round 18
  * (VERDICT r17 next #7) adds GROUPED invariants for the e2e
  * consumers: dedupSurvivorsByLang / dedupRateBySource fed the prefix
  * pairs must be row-identical (symmetric set difference empty) to
  * the same consumers fed the plain-join reference pairs — and the
  * artifact carries an all_pass answer verdict.
  *
  * Env: SPARK_GRAFT_SPARSE_N (default 5000), SPARK_GRAFT_SCALE_K
  * (default 10 — the k× corpus holds N·k docs of NEW content, same
  * generator), SPARK_GRAFT_CPUS. Output: target/sparsecurve.json.
  */
object SparseBench {

  private def splitmix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }
  private def u01(h: Long): Double = (h >>> 11).toDouble / (1L << 53).toDouble

  val Vocab = 8000

  /** Zipf-ish token for (doc, pos): rank = ⌊V^u⌋ ∈ [1, V). */
  private def word(doc: Long, pos: Int): String = {
    val u = u01(splitmix(doc * 1315423911L + pos))
    val rank = math.max(1L, math.min(Vocab - 1L,
      math.floor(math.pow(Vocab.toDouble, u)).toLong))
    "w" + rank
  }

  private def lenOf(doc: Long): Int =
    60 + (splitmix(doc * 7L + 1L) & 0x7fffffffL).toInt % 120

  private def baseTokens(doc: Long): Array[String] =
    Array.tabulate(lenOf(doc))(j => word(doc, j))

  /** Minimum distinct-type count a partner must carry for the planted
    * pair's set-Jaccard floor (t−3)/(t+3) to clear the 0.8 threshold:
    * (27−3)/(27+3) = 0.8 exactly. */
  val MinPartnerTypes = 27

  private def typeCount(doc: Long): Int = baseTokens(doc).distinct.length

  /** Planted-dup partner for `doc`, if any: same source block
    * (offsets are multiples of 20), non-chaining residues. A partner
    * below [[MinPartnerTypes]] distinct types is skipped (the doc
    * stays unplanted) so recall over the planted set is a PROVABLE
    * invariant, not a probabilistic one — the old token-count bound
    * (n−3)/(n+3) argued the wrong quantity (ADVICE r17). */
  def partnerOf(doc: Long): Option[Long] = {
    val p =
      if (doc % 40 == 27 && doc >= 20) Some(doc - 20)
      else if (doc % 40 == 13 && doc >= 60) Some(doc - 60)
      else None
    p.filter(typeCount(_) >= MinPartnerTypes)
  }

  /** One document row: (doc_id, text, lang, source, n_chars). */
  def docRow(doc: Long): (Long, String, String, String, Long) = {
    val toks = partnerOf(doc) match {
      case Some(p) =>
        val t = baseTokens(p)
        for (i <- 0 until 3)
          t(((splitmix(doc * 31L + i) & 0x7fffffffL) % t.length).toInt) =
            word(doc, 100000 + i)
        t
      case None => baseTokens(doc)
    }
    val text = toks.mkString(" ")
    val lang = Seq("en", "de", "fr", "es", "zh")(
      ((splitmix(doc * 13L + 3L) & 0x7fffffffL) % 5).toInt)
    (doc, text, lang, s"src${doc % 20}", text.length.toLong)
  }

  /** Writes `outDir/documents.parquet` with `n` sparse docs (marker-
    * gated, same discipline as ScaleBench._SCALE_DONE). */
  def synthesize(spark: org.apache.spark.sql.SparkSession,
      outDir: String, n: Long): Unit = {
    val marker = Paths.get(outDir, "_SPARSE_DONE")
    val stamp = s"$n|zipf8000-r18"
    if (Files.exists(marker) &&
      new String(Files.readAllBytes(marker), StandardCharsets.UTF_8).trim == stamp)
      return
    import spark.implicits._
    // generation is pure per-id arithmetic — distribute it so the k×
    // corpus never funnels through the driver
    spark.range(n).as[Long].mapPartitions(_.map(docRow))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    Files.createDirectories(Paths.get(outDir))
    Files.write(marker, stamp.getBytes(StandardCharsets.UTF_8))
  }

  val Targets: Seq[String] = Seq(
    "q_dedup_jaccard",        // plain source-blocked token join (exact)
    "q_dedup_prefix",         // prefix-filtered AllPairs (exact, lossless)
    "q_dedup_ngram",          // shingle variant (prefix plan since r19)
    "q_dedup_e2e",            // minhash-LSH end-to-end consumer
    // the Jaccard e2e consumers, on the prefix plan since round 18
    // (VERDICT r17 next #1) — their rows ARE the prefix curve at
    // realistic density
    "q_dedup_pipeline",
    "q_dedup_rate_by_source",
    // the shingle family (round 19, VERDICT r18 next #3 — the r17→r18
    // lesson is that unprobed members hide quadratic plans):
    // containment rides the one-sided prefix filter since r19;
    // dupgrams is a map-side-combinable (source, gram) count and
    // winnow a pure per-doc map — their rows pin that they STAY
    // join-free as density drops
    "q_dedup_containment",
    "q_text_dupgrams",
    "q_text_winnow")

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_SPARSE_N", "5000").toLong
    val k = sys.env.getOrElse("SPARK_GRAFT_SCALE_K", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus)
    val d1 = "target/scale/sparse_x1"
    val dk = s"target/scale/sparse_x$k"
    synthesize(spark, d1, n)
    synthesize(spark, dk, n * k)

    def run(q: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val rows = Targets.map { q =>
      run(q, d1) // discard: JIT warm
      val t1 = math.min(run(q, d1), run(q, d1))
      val tk = run(q, dk)
      val r = tk / t1
      println(f"[sparse] $q%-20s t1=$t1%7.2fs t$k=$tk%7.2fs ratio=$r%5.2f")
      f"""\"$q\":{\"t1\":$t1%.3f,\"t$k\":$tk%.3f,\"ratio\":$r%.3f}"""
    }

    // answer checks: prefix == plain (losslessness on a REAL-shaped
    // corpus), and both recover every planted pair
    def answers(dir: String, docs: Long): String = {
      val jac = SparkEntry.queries("q_dedup_jaccard")(spark, dir)
      val pre = SparkEntry.queries("q_dedup_prefix")(spark, dir)
      val nJ = jac.count()
      val nP = pre.count()
      // built from partnerOf ITSELF (not a residue re-derivation) so
      // the expected set tracks the generator's type-count floor
      import spark.implicits._
      val planted = spark.range(docs).as[Long]
        .flatMap(d => partnerOf(d).map(p => (p, d)))
        .toDF("d1", "d2")
      val nPlanted = planted.count()
      val foundJ = jac.join(planted, Seq("d1", "d2"), "left_semi").count()
      val foundP = pre.join(planted, Seq("d1", "d2"), "left_semi").count()
      val dens = nJ.toDouble / (docs.toDouble * (docs - 1) / 2)
      // GROUPED answer invariants for the e2e consumers (round 18,
      // VERDICT r17 next #7): the registry consumers (prefix plan
      // since #1) must produce row-identical GROUP rows to the same
      // consumer fed the plain-join reference pairs — a strictly
      // stronger check than the pair-count equality above (a lost
      // group or a pair migrating between sources passes the count
      // check but fails here). symmetric difference must be empty.
      val docsDf = Tables.documents(spark, dir)
      def groupsDiffer(a: org.apache.spark.sql.DataFrame,
          b: org.apache.spark.sql.DataFrame): Long =
        a.exceptAll(b).count() + b.exceptAll(a).count()
      val plainPairs = graft.queries.TextOps.jaccardPairs(docsDf, 0.8)
      val prefPairs = graft.queries.TextOps.prefixJaccardPairs(docsDf, 4, 5)
      val dSurv = groupsDiffer(
        graft.queries.TextOps.dedupSurvivorsByLang(docsDf, prefPairs),
        graft.queries.TextOps.dedupSurvivorsByLang(docsDf, plainPairs))
      val dRate = groupsDiffer(
        graft.queries.TextOps.dedupRateBySource(docsDf, prefPairs),
        graft.queries.TextOps.dedupRateBySource(docsDf, plainPairs))
      // shingle-family A/B (round 19, VERDICT r18 next #3): the
      // prefix-filtered containment and ngram plans must be
      // ROW-IDENTICAL to their plain-join references on this
      // realistic-density corpus — the same losslessness evidence the
      // unigram family carries, now for the one-sided prefix theorem
      val dCont = groupsDiffer(
        graft.queries.TextOps.containmentPairs(docsDf, 4, 5),
        graft.queries.TextOps.containmentPairsPlain(docsDf, 0.8))
      val dNgram = groupsDiffer(
        graft.queries.TextOps.ngramJaccardPairs(docsDf, 1, 2),
        graft.queries.TextOps.ngramJaccardPairsPlain(docsDf, 0.5))
      val allPass = nJ == nP && foundJ == nPlanted && foundP == nPlanted &&
        dSurv == 0 && dRate == 0 && dCont == 0 && dNgram == 0
      println(f"[sparse] answers@$docs: jaccard=$nJ prefix=$nP equal=${nJ == nP} " +
        f"planted $foundJ/$nPlanted (prefix $foundP) density=$dens%.2e " +
        f"group_diff survivors=$dSurv rate=$dRate " +
        f"containment_diff=$dCont ngram_diff=$dNgram all_pass=$allPass")
      f"""{\"n_docs\":$docs,\"jaccard_pairs\":$nJ,\"prefix_pairs\":$nP,""" +
        f"""\"equal\":${nJ == nP},\"planted\":$nPlanted,""" +
        f"""\"planted_found_jaccard\":$foundJ,\"planted_found_prefix\":$foundP,""" +
        f"""\"pair_density\":$dens%.3e,""" +
        f"""\"survivors_group_diff\":$dSurv,\"rate_group_diff\":$dRate,""" +
        f"""\"containment_prefix_vs_plain_diff\":$dCont,""" +
        f"""\"ngram_prefix_vs_plain_diff\":$dNgram,""" +
        f"""\"all_pass\":$allPass}"""
    }
    val a1 = answers(d1, n)
    val ak = answers(dk, n * k)

    val doc = s"""{"vocab":$Vocab,"n1":$n,"k":$k,""" +
      s""""queries":${rows.mkString("{", ",", "}")},""" +
      s""""answers_1":$a1,"answers_$k":$ak}"""
    Files.createDirectories(Paths.get("target"))
    Files.write(Paths.get("target/sparsecurve.json"),
      doc.getBytes(StandardCharsets.UTF_8))
    println(doc)
    spark.stop()
  }
}
