package graft

import java.io.File

import org.scalatest.funsuite.AnyFunSuite

/** Runs the per-query perf-regression gate (tools/benchguard.py,
  * VERDICT r10 item 6) inside the test loop: whenever the current
  * session has produced a bench artifact (target/bench.json) AND a
  * prior round's same-box artifact is committed under tools/, the two
  * are diffed and any >30% isolated-sample regression without a
  * BASELINE.md `benchguard-ok: <query>` waiver fails the suite — the
  * perf analogue of SurveyInventorySpec's count gate. Skips (cancels)
  * when either artifact is absent, so plain dev runs without a bench
  * pass stay green.
  */
class BenchGuardSpec extends AnyFunSuite {

  /** Latest committed NOOP-series bench artifact
    * (tools/bench_r{N}{x}_noop.json), by round number — the canonical
    * series since round 17 (round 18 retired benchguard's count
    * bridge, so anchoring on the legacy count-action
    * bench_r{N}_driver artifacts would fail the action-mismatch
    * check by design). */
  private def priorArtifact: Option[File] = {
    val re = """bench_r(\d+)[a-z]?_noop\.json""".r
    Option(new File("tools").listFiles()).toSeq.flatten
      .flatMap(f => f.getName match {
        case re(n) => Some((n.toInt, f))
        case _ => None
      })
      // deterministic tiebreak within a round (round 19, ADVICE r18:
      // File.listFiles() order is unspecified, so same-round letter-
      // suffixed twins made the prior anchor nondeterministic): the
      // lexicographically LAST name of the highest round wins — the
      // letter suffix orders re-measures, so the latest one anchors
      .maxByOption(t => (t._1, t._2.getName)).map(_._2)
  }

  test("no unwaived >30% isolated regression vs the prior round artifact") {
    val cur = new File("target/bench.json")
    assume(cur.isFile, "no target/bench.json — run graft.Bench first")
    val prior = priorArtifact
    assume(prior.isDefined, "no committed tools/bench_r*_driver.json")
    val cmd = Seq("python3", "tools/benchguard.py",
      cur.getPath, prior.get.getPath)
    val out = new StringBuilder
    val rc = scala.sys.process.Process(cmd)
      .!(scala.sys.process.ProcessLogger(l => out.append(l).append('\n')))
    assert(rc === 0, s"benchguard flagged unwaived regressions:\n$out")
  }
}
