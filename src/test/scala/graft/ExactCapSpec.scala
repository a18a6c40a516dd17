package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.BandGuard
import graft.queries.SimOps

/** Refusal guard for the EXACT all-pairs members (operators/BandGuard
  * .exactBlockGuard, wired into q_sim_join and q_dedup_embed): blocks
  * at or under the cap pass through byte-identically; a larger block
  * fails the job — never silently degrades — with a message carrying
  * [[BandGuard.ExactCapError]], because an EXACT member's contract is
  * the full pairwise answer and a degraded one would be WRONG. */
class ExactCapSpec extends SparkSuite {

  private def emb(n: Int, labels: Int): DataFrame = {
    import spark.implicits._
    (1 to n).map(i =>
      (i.toLong, (i % labels).toLong, noiseVec(i.toLong, 8).toArray))
      .toDF("vec_id", "label", "embedding")
  }

  private def chainMessages(t: Throwable): String = {
    val sb = new StringBuilder
    var c: Throwable = t
    while (c != null) { sb.append(c.getMessage).append('\n'); c = c.getCause }
    sb.toString
  }

  test("blocks at or under the cap pass through byte-identically") {
    val in = emb(60, 4) // blocks of 15
    val out = BandGuard.exactBlockGuard(in, "label", cap = 15)
    // the when/otherwise wrap may WIDEN the key to nullable (metadata
    // only); names, types, and every value must be untouched
    assert(out.schema.map(f => (f.name, f.dataType))
      === in.schema.map(f => (f.name, f.dataType)),
      "guard must not alter column names or types")
    val a = in.orderBy("vec_id").collect().map(_.toString).toSeq
    val b = out.orderBy("vec_id").collect().map(_.toString).toSeq
    assert(a === b, "under-cap rows must pass through unmodified")
  }

  test("an over-cap block refuses with the pinned marker, in O(n)") {
    val in = emb(40, 2) // blocks of 20 > cap 8
    val guarded = BandGuard.exactBlockGuard(in, "label", cap = 8)
    val joined = guarded.as("x").join(guarded.as("y"),
      col("x.label") === col("y.label") && col("x.vec_id") < col("y.vec_id"))
    val e = intercept[Throwable] { joined.count() }
    val msgs = chainMessages(e)
    assert(msgs.contains(BandGuard.ExactCapError),
      s"refusal must carry ${BandGuard.ExactCapError}; got: $msgs")
    assert(msgs.contains("q_dedup_embed_e2e"),
      "refusal must name the guarded twins to use instead")
  }

  test("a mixed corpus refuses on its oversized block when the key is " +
      "consumed (the guard rides the block-key projection)") {
    // the guard judges each block against ITS OWN membership: the
    // oversized block poisons the job (refusal is all-or-nothing by
    // design — a partial exact answer is still a wrong exact answer).
    // The key must be CONSUMED for the check to fire — exactly the
    // situation in the guarded self-joins, whose join condition reads
    // it; a plan that prunes the key entirely never pairs on it either.
    val in = emb(30, 3).withColumn("label",
      when(col("vec_id") <= 20, lit(99L)).otherwise(col("label")))
    val guarded = BandGuard.exactBlockGuard(in, "label", cap = 10)
    val e = intercept[Throwable] { guarded.collect() }
    assert(chainMessages(e).contains(BandGuard.ExactCapError))
  }

  test("registry q_sim_join is guard-wired and answer-preserving at sf0.001") {
    val guarded = SimOps.queries("q_sim_join")(spark, Sf).collect()
    assert(guarded.nonEmpty)
    // the unguarded form, inline — answers must be byte-identical on
    // fixture data (every label block sits far under ExactPairCap)
    val e = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("label"), col("embedding"))
    val joined = e.as("x").join(e.as("y"),
        col("x.label") === col("y.label") &&
        col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("vec_id"), col("y.vec_id").as("match_id"),
        SimOps.cosine(col("x.embedding"), col("y.embedding")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("cos").desc, col("match_id").asc)
    val unguarded = joined.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("match_id"), col("cos"))
      .orderBy(col("vec_id")).collect()
    assert(guarded.map(_.toString).toSeq === unguarded.map(_.toString).toSeq)
  }

  test("q_dedup_jaccard is guard-wired (round-20 symmetry): an " +
      "over-cap source block refuses naming the prefix twin") {
    import spark.implicits._
    import graft.queries.TextOps
    // one source block just past ExactPairCap — the viral-source
    // shape the plain token self-join would enumerate quadratically
    val docs = (1 to BandGuard.ExactPairCap + 1).map(i =>
      (i.toLong, s"tok$i shared words", "en", "hot", 17L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val e = intercept[Throwable] { TextOps.jaccardPairs(docs, 0.8).count() }
    val msgs = chainMessages(e)
    assert(msgs.contains(BandGuard.ExactCapError),
      s"refusal must carry ${BandGuard.ExactCapError}; got: $msgs")
    assert(msgs.contains("q_dedup_prefix"),
      "refusal must name the lossless prefix twin")
    // and under-cap corpora answer byte-identically: SimilaritySpec's
    // prefix-vs-plain equality and the 282-row oracle hash pin that
    // on every graded run (every fixture block sits far under cap)
  }

  test("registry q_dedup_embed is guard-wired and answer-preserving at sf0.001") {
    val guarded = SimOps.queries("q_dedup_embed")(spark, Sf).collect()
    val e = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("label"), col("embedding"))
    val unguarded = e.as("x").join(e.as("y"),
        col("x.label") === col("y.label") &&
        col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("d1"), col("y.vec_id").as("d2"),
        SimOps.cosine(col("x.embedding"), col("y.embedding")).as("cos"))
      .filter(col("cos") >= 0.4)
      .orderBy(col("d1"), col("d2")).collect()
    assert(guarded.map(_.toString).toSeq === unguarded.map(_.toString).toSeq)
  }
}
