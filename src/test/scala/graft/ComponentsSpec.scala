package graft

import org.apache.spark.sql.functions._

import graft.queries.TextOps

/** connectedComponents must converge on ANY graph shape within the
  * rounds cap — pointer doubling makes rounds logarithmic in diameter,
  * so a long path (the old min-label worst case: rounds = diameter)
  * must converge far under the cap, and results must match a
  * driver-side union-find on arbitrary graphs. */
class ComponentsSpec extends SparkSuite {

  private def components(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    TextOps.connectedComponents(pairs.toDF("d1", "d2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Reference union-find (path compression, driver-side). */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // normalize: every node maps to the min id of its component
    val roots = parent.keys.map(k => k -> find(k)).toMap
    val minOfRoot = roots.groupBy(_._2).map { case (r, m) => r -> m.keys.min }
    roots.map { case (k, r) => k -> minOfRoot(r) }
  }

  test("path graph with diameter far above the old 25-round cap converges") {
    val path = (0L until 60L).sliding(2).map(s => (s(0), s(1))).toSeq
    val got = components(path)
    assert(got.size == 60)
    assert(got.values.forall(_ == 0L), "path must collapse to component 0")
  }

  test("matches union-find on a random graph with several components") {
    val rng = new scala.util.Random(23)
    // 3 clusters of ids with sparse internal edges + isolated pairs
    val pairs =
      Seq.tabulate(40)(_ => { val a = rng.nextInt(30); (a.toLong, (a + 1 + rng.nextInt(5)).toLong) }) ++
      Seq.tabulate(20)(_ => { val a = 100 + rng.nextInt(20); (a.toLong, (a + 1 + rng.nextInt(3)).toLong) }) ++
      Seq((1000L, 1001L), (2000L, 2001L))
    assert(components(pairs) == unionFind(pairs))
  }

  test("star and clique shapes converge to the min id") {
    val star = (1L to 20L).map(i => (0L, i))
    assert(components(star).values.forall(_ == 0L))
    val clique = for (i <- 5L to 9L; j <- (i + 1) to 9L) yield (i, j)
    assert(components(clique).values.forall(_ == 5L))
  }

  test("reliable checkpoint mode: identical labels, no leaked snapshots") {
    import spark.implicits._
    import graft.operators.{Ckpt, CkptMode}
    val rng = new scala.util.Random(31)
    val pairs =
      Seq.tabulate(50)(_ => { val a = rng.nextInt(40); (a.toLong, (a + 1 + rng.nextInt(6)).toLong) }) ++
      (200L until 230L).sliding(2).map(s => (s(0), s(1))).toSeq
    val local = components(pairs)
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft-cc-ck").toString)
    val rel = TextOps.connectedComponents(pairs.toDF("d1", "d2"),
      ckpt = CkptMode.Reliable)
    val got = rel.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == local, "reliable mode must produce the same labels")
    // every superseded round released its files inside the loop; the
    // returned frame holds the ONLY live snapshot — after releasing it
    // the checkpoint dir must hold no rdd-* dirs (the storage bound a
    // multi-hour job needs from durable checkpointing)
    Ckpt.release(rel, CkptMode.Reliable)
    val root = new java.io.File(spark.sparkContext.getCheckpointDir.get)
    val leaked = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("rdd-"))
    assert(leaked.isEmpty, s"leaked checkpoint dirs: ${leaked.mkString(", ")}")
  }
}
