package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Pins the bench's cross-session prior-guard protocol (parse / flag /
  * self-heal — Bench.scala's readPrior machinery) the way PlanShapeSpec
  * pins plans: the logic otherwise runs only in live bench sessions, where
  * a regression would surface as a silently-clobbered or silently-ignored
  * committed reference rounds later.
  */
class BenchPriorSpec extends AnyFunSuite {

  private val good =
    """{"sf":"/root/testdata/sf0.1","medians":{"q01":0.35,"q94":2.14,"q163":12.80}}"""

  test("sf-tagged prior at the session's sf parses and stays writable") {
    val (m, w) = Bench.parsePriorText(good, "/root/testdata/sf0.1")
    assert(w, "matching sf must keep the prior writable")
    assert(m == Map("q01" -> 0.35, "q94" -> 2.14, "q163" -> 12.80))
  }

  test("prior from a DIFFERENT sf is ignored AND protected from overwrite") {
    val (m, w) = Bench.parsePriorText(good, "/root/testdata/sf0.001")
    assert(m.isEmpty, "cross-sf medians are not comparable")
    assert(!w, "a smoke run at another sf must not clobber the committed reference")
  }

  test("file level: absent -> writable; unreadable -> protected") {
    val dir = Files.createTempDirectory("graft_prior").toString
    val (mAbsent, wAbsent) = Bench.readPrior(s"$dir/nope.json", "/x")
    assert(mAbsent.isEmpty && wAbsent, "only a confirmed-absent file is writable")
    // a PRESENT path that cannot be read as a file (a directory here — the
    // stand-in for any IO failure) must stay protected: before the r12 fix
    // this returned writable=true and the next session clobbered the
    // committed reference
    val unreadable = s"$dir/as_dir"
    Files.createDirectory(java.nio.file.Paths.get(unreadable))
    val (mu, wu) = Bench.readPrior(unreadable, "/x")
    assert(mu.isEmpty && !wu,
      "present-but-unreadable prior must not be overwritten")
    // disabled entirely:
    val (md, wd) = Bench.readPrior("0", "/x")
    assert(md.isEmpty && !wd)
  }

  test("mandatory-retime flag: 2.5x ratio AND the 0.3 s absolute floor") {
    assert(Bench.priorFlag(2.0, 0.5), "4x with 1.5 s delta fires")
    assert(!Bench.priorFlag(0.35, 0.1),
      "3.5x but only 0.25 s over the prior is sub-second jitter, not evidence")
    assert(Bench.priorFlag(0.45, 0.1), "4.5x and 0.35 s over fires")
    assert(!Bench.priorFlag(1.2, 0.5), "2.4x is under the ratio gate")
    assert(!Bench.priorFlag(0.5, 0.5), "equal is quiet")
  }

  test("self-heal: retime wins only when valid and lower than the median") {
    assert(Bench.adjudicatedMedian(3.0, Some(0.4)) == 0.4,
      "a phantom re-times near the min and must not poison the next prior")
    assert(Bench.adjudicatedMedian(3.0, Some(3.2)) == 3.0,
      "a real regression re-times near its median; the median stands")
    assert(Bench.adjudicatedMedian(3.0, Some(-1.0)) == 3.0,
      "a failed retime (sentinel) never replaces the median")
    assert(Bench.adjudicatedMedian(3.0, None) == 3.0)
  }
}
