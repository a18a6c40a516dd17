package graft.operators

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Overlap INDEPENDENT driver job chains (optimization guide §2.6):
  * Spark's scheduler happily runs several jobs at once inside one
  * application — actions are only sequential because driver code
  * calls them sequentially. An index build is exactly the guide's
  * shape: the coarse-quantizer chain, the PQ chain, the payload write
  * and the margin measurement are mutually independent multi-job
  * chains that the build rounds had been running back to back, so
  * every chain's scheduling latency (and every stage tail) was paid
  * serially. Submitting them from a small pool lets FIFO scheduling
  * back-fill one chain's tail with the next chain's tasks.
  *
  * Measured motivation (round 20, StageCount at sf0.1): the ANN build
  * rows run 76–87 jobs with ONE task per stage — wall time ≈ job
  * count × scheduler latency, the calib2 cost class. On a cluster the
  * same serial chain is driver-scheduling dead time between tails.
  *
  * Semantics: each thunk's plan and its output are untouched — only
  * WHEN the driver submits it changes. Every thunk runs on its own
  * pool thread (daemon, bounded), results return in argument order,
  * and the first failure propagates after all thunks settle (writes
  * are overwrite-mode idempotent, so a failed sibling chain leaves
  * the same partial-fixture state a sequential failure did).
  * Determinism is per-chain: nothing here reorders rows, partitions
  * or commits within a chain. Job descriptions are thread-local in
  * Spark, so overlapped chains surface under the pool threads'
  * (empty) description — cosmetic, noted in OPTIMIZATION_r20.md.
  */
object Concur {

  // Bounded daemon pool, shared across calls: overlap width is the
  // number of independent CHAINS (≤ 4 at any call site), never a
  // per-row fanout, so a small fixed pool cannot deadlock nests —
  // call sites do not nest par() inside par().
  private lazy val pool: ExecutionContext =
    ExecutionContext.fromExecutorService(
      Executors.newFixedThreadPool(8, r => {
        val t = new Thread(r, "graft-concur")
        t.setDaemon(true)
        t
      }))

  /** Run the thunks concurrently; return in argument order. Awaits
    * every thunk (success or failure) before returning or throwing,
    * so no chain is left racing a caller that believed it finished. */
  def par[A, B](a: => A, b: => B): (A, B) = {
    val (fa, fb) = (Future(a)(pool), Future(b)(pool))
    awaitAll(fa, fb)
    (Await.result(fa, Duration.Inf), Await.result(fb, Duration.Inf))
  }

  def par[A, B, C](a: => A, b: => B, c: => C): (A, B, C) = {
    val (fa, fb, fc) = (Future(a)(pool), Future(b)(pool), Future(c)(pool))
    awaitAll(fa, fb, fc)
    (Await.result(fa, Duration.Inf), Await.result(fb, Duration.Inf),
      Await.result(fc, Duration.Inf))
  }

  def par[A, B, C, D](a: => A, b: => B, c: => C, d: => D): (A, B, C, D) = {
    val (fa, fb, fc, fd) =
      (Future(a)(pool), Future(b)(pool), Future(c)(pool), Future(d)(pool))
    awaitAll(fa, fb, fc, fd)
    (Await.result(fa, Duration.Inf), Await.result(fb, Duration.Inf),
      Await.result(fc, Duration.Inf), Await.result(fd, Duration.Inf))
  }

  /** Block until every future has SETTLED (either way) — a failing
    * chain must not leave its siblings' Spark jobs racing the caller's
    * error handling. */
  private def awaitAll(fs: Future[_]*): Unit =
    fs.foreach(f => Await.ready(f, Duration.Inf))
}
