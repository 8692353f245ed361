package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The bench's contention guards (see [[BenchGuard]]). Three driver
  * rounds running, a loaded host produced BENCH records that read like
  * plan regressions (q29 "7.97s" vs a clean 0.33s) and cost a judge
  * session to adjudicate; these pins keep the wait-for-quiet and
  * self-labeling logic honest. */
class BenchGuardSpec extends AnyFunSuite with Matchers {

  test("hostContended: load above half the CPU budget or steal above 2%") {
    BenchGuard.hostContended(load1 = 0.5, cpus = 8, stealPct = 0.0) shouldBe false
    BenchGuard.hostContended(load1 = 4.1, cpus = 8, stealPct = 0.0) shouldBe true
    BenchGuard.hostContended(load1 = 0.1, cpus = 8, stealPct = 2.5) shouldBe true
    // the adjudicated incidents: load 5.80 on a 32-budget box flags;
    // 6.6% steal flags even at zero load
    BenchGuard.hostContended(5.80, 8, 0.0) shouldBe true
    BenchGuard.hostContended(0.37, 32, 6.6) shouldBe true
    BenchGuard.hostContended(0.86, 32, 1.3) shouldBe false
  }

  test("awaitQuietHost retries under forced load and stops when the host goes quiet") {
    // forced load: contended twice, then quiet — the run must sleep
    // exactly twice and proceed
    val probes = Iterator((9.0, 0.0), (6.0, 3.0), (0.3, 0.1))
    var slept = List.empty[Long]
    val waits = BenchGuard.awaitQuietHost(
      cpus = 8, maxWaits = 6, sleepMs = 20000L,
      probe = () => probes.next(),
      sleep = ms => slept ::= ms)
    waits shouldBe 2
    slept shouldBe List(20000L, 20000L)
  }

  test("awaitQuietHost gives up after maxWaits on a host that never goes quiet") {
    var slept = 0
    val waits = BenchGuard.awaitQuietHost(
      cpus = 8, maxWaits = 3, sleepMs = 1L,
      probe = () => (99.0, 50.0),
      sleep = _ => slept += 1)
    waits shouldBe 3 // recorded in the artifact: a run that waited out its budget
    slept shouldBe 3
  }

  test("spreadContended: 3x spread with a material gap, tiny queries exempt") {
    // the r12 burst shape: two samples at ~6s, a clean min would have
    // escaped — but all three inside the burst spread 5.8..7.9
    BenchGuard.spreadContended(Seq(0.33, 5.84, 7.97)) shouldBe true
    // steady state: tight spread
    BenchGuard.spreadContended(Seq(0.31, 0.33, 0.35)) shouldBe false
    // sub-50ms query tripled by a GC pause: noise, not contention
    BenchGuard.spreadContended(Seq(0.01, 0.02, 0.04)) shouldBe false
    // 3x but the absolute gap is immaterial (<0.2s)
    BenchGuard.spreadContended(Seq(0.06, 0.1, 0.19)) shouldBe false
    BenchGuard.spreadContended(Nil) shouldBe false
  }

  test("historyDrift: the r13 driver incident shape flags; noise and real small deltas do not") {
    // the adjudicated incident: q67 recorded 6.56s with a TIGHT spread
    // (spreadContended never fired) against a committed 0.35s min
    BenchGuard.spreadContended(Seq(6.41, 6.56, 6.60)) shouldBe false // the blind spot
    BenchGuard.historyDrift(freshMin = 6.56, historicalMin = 0.35) shouldBe true
    // a genuine 1.5x regression is NOT drift — it must show as a slower
    // min, not get adjudicated away
    BenchGuard.historyDrift(1.4, 1.0) shouldBe false
    // sub-50ms history: JIT jitter triples those meaninglessly
    BenchGuard.historyDrift(0.15, 0.04) shouldBe false
    // immaterial absolute gap
    BenchGuard.historyDrift(0.25, 0.06) shouldBe false
  }

  test("solosConfirm: the r16 q15_cube incident — a loaded-host solo can never move a committed min UP") {
    // the incident's exact numbers: committed min 0.326s, in-suite
    // samples ≥4.53s (history_drift fired), fresh-JVM solo 2.718s
    // spawned at load 2.88–5.56. The solo is still >3× history — under
    // the old rule that CONFIRMED the regression and the committed
    // record moved to 4.53s; the same code solo-measured 0.48s on a
    // drained box an hour later. A load-2.9 solo must not confirm:
    BenchGuard.historyDrift(freshMin = 4.534, historicalMin = 0.326) shouldBe true
    BenchGuard.solosConfirm(Seq((2.718, 2.9), (2.7, 2.9)), 0.326) shouldBe false
    // ...so mergedMin keeps the clean baseline; the solo having been
    // folded into the sample vector, 2.718 ships as fresh_min only
    BenchGuard.mergedMin(2.718, Some(0.326),
      soloConfirmedRegression = false) shouldBe 0.326
    // the q12_distinct sibling: historical 0.125, solo 2.086 at the
    // same loaded window — min stays 0.125
    BenchGuard.solosConfirm(Seq((2.086, 2.9), (2.0, 2.9)), 0.125) shouldBe false
    BenchGuard.mergedMin(2.086, Some(0.125),
      soloConfirmedRegression = false) shouldBe 0.125
    // TWO slow solos from a drained host ARE a real regression —
    // they confirm, and the new baseline is min(samples ∪ solos)
    BenchGuard.solosConfirm(Seq((2.718, 0.4), (2.5, 0.7)), 0.326) shouldBe true
    BenchGuard.mergedMin(2.718, Some(0.326),
      soloConfirmedRegression = true) shouldBe 2.718
    // a solo that collapses back near history never confirms — on any
    // host (a loaded box can only inflate, so a collapse is evidence)
    BenchGuard.solosConfirm(Seq((0.48, 5.6), (0.5, 0.3)), 0.326) shouldBe false
    // failed/unparseable solos never confirm
    BenchGuard.solosConfirm(Nil, 0.326) shouldBe false
    // the quiet threshold itself: the drained-host discipline
    BenchGuard.quietForConfirm(0.9) shouldBe true
    BenchGuard.quietForConfirm(2.0) shouldBe true
    BenchGuard.quietForConfirm(2.9) shouldBe false
  }

  test("solosConfirm: the r17 q48 incident — ONE quiet solo is not reproduction") {
    // the incident's exact numbers: committed min 0.378s, in-suite
    // samples 7.8–8.8s (history_drift fired), ONE fresh-JVM solo
    // measured 2.324s while stamping load 1.6 and clean steal — every
    // per-solo gate passed, yet the same binaries solo-measured 0.720s
    // when reproduced: a contention mode neither load1 nor steal sees
    // (page-cache eviction, CPU-frequency, memory-bandwidth neighbor)
    // polluted the single child. Confirmation now requires TWO
    // independently spawned quiet solos, BOTH above the drift
    // threshold:
    BenchGuard.historyDrift(freshMin = 7.797, historicalMin = 0.378) shouldBe true
    // one solo, however quiet, never confirms
    BenchGuard.solosConfirm(Seq((2.324, 1.6)), 0.378) shouldBe false
    // the incident pair: solo₁ 2.324@1.6, solo₂ 0.72@1.85 — the second
    // solo collapsed below the drift threshold (0.72 < 3×0.378), so no
    // confirmation, and the committed record stays 0.378 (0.72 ships
    // as fresh_min, the min over samples ∪ solos)
    BenchGuard.solosConfirm(Seq((2.324, 1.6), (0.72, 1.85)), 0.378) shouldBe false
    BenchGuard.mergedMin(0.72, Some(0.378),
      soloConfirmedRegression = false) shouldBe 0.378
    // a REAL regression reproduces: both quiet solos stay slow
    BenchGuard.solosConfirm(Seq((2.324, 1.6), (2.1, 1.2)), 0.378) shouldBe true
    BenchGuard.mergedMin(2.1, Some(0.378),
      soloConfirmedRegression = true) shouldBe 2.1
    // reproduction on a LOADED second host still proves nothing
    BenchGuard.solosConfirm(Seq((2.324, 1.6), (2.1, 3.2)), 0.378) shouldBe false
    // a steal-contended child stamps 999 and can never confirm
    BenchGuard.solosConfirm(Seq((2.324, 999.0), (2.1, 1.2)), 0.378) shouldBe false
  }

  test("driftUnadjudicated: open drifts are labeled, settled ones are not") {
    // spawn failure: no solo evidence at all — open
    BenchGuard.driftUnadjudicated(Nil, 0.378) shouldBe true
    // one slow quiet solo, second collapsed — open (signal present,
    // not reproduced; the record kept the historical min)
    BenchGuard.driftUnadjudicated(Seq((2.324, 1.6), (0.72, 1.85)), 0.378) shouldBe true
    // both solos slow but a loaded host — open
    BenchGuard.driftUnadjudicated(Seq((2.324, 1.6), (2.1, 3.2)), 0.378) shouldBe true
    // solo collapsed back to baseline: settled (self-healed), not open
    BenchGuard.driftUnadjudicated(Seq((0.42, 1.0)), 0.378) shouldBe false
    // confirmed regression: settled (the record moved), not open
    BenchGuard.driftUnadjudicated(Seq((2.324, 1.6), (2.1, 1.2)), 0.378) shouldBe false
  }

  test("driftSettledCollapsed: the explicit settled-by-collapse label (r18 q28b artifact nit)") {
    // the r18 q28b row: one solo, collapsed below the 3× threshold —
    // settled, and now labeled so in the artifact
    BenchGuard.driftSettledCollapsed(Seq((0.42, 1.0)), 0.378) shouldBe true
    // no solos (spawn failure or deferral): NOT settled — open
    BenchGuard.driftSettledCollapsed(Nil, 0.378) shouldBe false
    // any solo still above threshold: not collapsed
    BenchGuard.driftSettledCollapsed(Seq((2.324, 1.6), (0.72, 1.85)), 0.378) shouldBe false
    // confirmed regression (both slow): settled by confirmation, not
    // by collapse — the label stays off
    BenchGuard.driftSettledCollapsed(Seq((2.324, 1.6), (2.1, 1.2)), 0.378) shouldBe false
  }

  test("deferSolos: the r18 shape — a steal-flagged parent spawns ZERO solos and no min moves") {
    // the r18 driver re-run: whole-run steal 2.7%, load1 4.1 — six
    // drifted queries each spawned solos that all stamped 999 after
    // burning their drained-host waits (2008s wall vs 580s quiet).
    // The pre-spawn probe now defers instead:
    BenchGuard.deferSolos(2.7) shouldBe true
    // clean steal: solos spawn as before
    BenchGuard.deferSolos(0.0) shouldBe false
    BenchGuard.deferSolos(1.9) shouldBe false
    // boundary rides the hostContended steal threshold (strictly above)
    BenchGuard.deferSolos(2.0) shouldBe false
    // a deferred drift carries NO solos → labeled unadjudicated, never
    // settled, and the merge keeps the committed baseline: zero min
    // movement from a polluted window, by construction
    BenchGuard.driftUnadjudicated(Nil, 1.288) shouldBe true
    BenchGuard.solosConfirm(Nil, 1.288) shouldBe false
    BenchGuard.mergedMin(4.2, Some(1.288),
      soloConfirmedRegression = false) shouldBe 1.288
  }

  test("acquireRecordLock: exclusive while held, reacquirable after release, peer-held aborts") {
    val dir = java.nio.file.Files.createTempDirectory("bench-lock-")
    val p = dir.resolve("BENCH_FULL_sfx.lock")
    BenchGuard.acquireRecordLock(p, maxWaitMs = 0L, sleep = _ => ()) match {
      case BenchGuard.Locked(ch) =>
        // a second acquirer (same JVM = OverlappingFileLockException,
        // peer process = tryLock null — both mean "held") gives up
        // after its wait budget and reports LockHeld so the caller
        // aborts WITHOUT writing
        var slept = 0
        BenchGuard.acquireRecordLock(p, maxWaitMs = 4000L,
          sleep = _ => slept += 1) shouldBe BenchGuard.LockHeld
        slept shouldBe 2 // polled its whole budget before giving up
        ch.close() // releases the OS lock
        BenchGuard.acquireRecordLock(p, maxWaitMs = 0L, sleep = _ => ()) match {
          case BenchGuard.Locked(ch2) => ch2.close()
          case other => fail(s"expected reacquire after release, got $other")
        }
      case other => fail(s"expected Locked, got $other")
    }
    // an unopenable path = fs can't lock: proceed unlocked, never brick
    BenchGuard.acquireRecordLock(
      java.nio.file.Paths.get("/nonexistent-dir/x.lock"),
      maxWaitMs = 0L, sleep = _ => ()) shouldBe BenchGuard.LockUnsupported
  }

  test("mergedMin: a committed baseline only moves UP on a solo-confirmed regression (the r15 overwrite incident)") {
    // the r15 incident tier: driver benched at load 5.34; q59 recorded
    // 1.449s against a committed 0.610s — 2.4×, below the 3× drift
    // guard, so no solo ran. The merge must KEEP the clean baseline.
    BenchGuard.mergedMin(1.449, Some(0.610), soloConfirmedRegression = false) shouldBe 0.610
    BenchGuard.mergedMin(0.502, Some(0.300), soloConfirmedRegression = false) shouldBe 0.300
    // an improvement always records — safe on any host (a loaded box
    // can only make a query slower, never spuriously faster)
    BenchGuard.mergedMin(0.25, Some(0.300), soloConfirmedRegression = false) shouldBe 0.25
    // equal re-confirmation records the fresh number
    BenchGuard.mergedMin(0.300, Some(0.300), soloConfirmedRegression = false) shouldBe 0.300
    // a REAL regression — drift fired, the fresh-JVM solo stayed slow —
    // must become the new baseline (both numbers ship in the artifact)
    BenchGuard.mergedMin(1.30, Some(0.317), soloConfirmedRegression = true) shouldBe 1.30
    // a brand-new query has no history: fresh min records
    BenchGuard.mergedMin(0.9, None, soloConfirmedRegression = false) shouldBe 0.9
  }

  test("recordCpus/cpusComparable: a record is only mergeable at the core count it was measured at (the r19 c8-merge incident)") {
    // the incident: the driver's SPARK_GRAFT_CPUS=8 run wrote through
    // the same merge path as 32-core runs and its q37 measurement
    // (1.2576 s — an anti-scaling query, 3.56 s cold at 32 cores)
    // became the committed 32-core "min". The record carries
    // loadavg.cpus; a mismatched run must neither read nor write it.
    val tmp = java.nio.file.Files.createTempFile("bench-cpus-", ".json")
    java.nio.file.Files.writeString(tmp,
      """{"metric":"total","value":9.9,"unit":"sec","sf":"x","failed":[],
        |"loadavg":{"before":"0.1,0.1,0.1","after":"4,4,2","cpus":32},
        |"queries":{"q37_dedup_corpus":{"min":3.56,"med":3.6,"max":3.7}}}""".stripMargin)
    BenchGuard.recordCpus(tmp) shouldBe Some(32)
    BenchGuard.cpusComparable(BenchGuard.recordCpus(tmp), 32) shouldBe true
    BenchGuard.cpusComparable(BenchGuard.recordCpus(tmp), 8) shouldBe false
    // legacy record without the stamp: stays comparable (history is
    // not thrown away on the first run after the format change)
    java.nio.file.Files.writeString(tmp,
      """{"metric":"total","value":9.9,"queries":{}}""")
    BenchGuard.recordCpus(tmp) shouldBe None
    BenchGuard.cpusComparable(None, 8) shouldBe true
    // absent record: any core count may create it
    BenchGuard.recordCpus(
      java.nio.file.Paths.get("/nonexistent/BENCH_FULL.json")) shouldBe None
    java.nio.file.Files.delete(tmp)
  }

  test("historicalMins parses a committed BENCH_FULL artifact; absence disables the check") {
    val tmp = java.nio.file.Files.createTempFile("bench-hist-", ".json")
    java.nio.file.Files.writeString(tmp,
      """{"metric":"total","value":9.9,"unit":"sec","sf":"x","failed":[],
        |"queries":{"q01_scan":{"min":0.207,"med":0.3,"max":0.4},
        |"q67_x":{"min":0.35,"med":0.36,"max":0.37,"contended":true},
        |"q99_bad":{"err":"boom"}}}""".stripMargin)
    val h = BenchGuard.historicalMins(tmp)
    h("q01_scan") shouldBe 0.207 +- 1e-9
    h("q67_x") shouldBe 0.35 +- 1e-9
    h.contains("q99_bad") shouldBe false // failed queries carry no min
    BenchGuard.historicalMins(
      java.nio.file.Paths.get("/nonexistent/BENCH_FULL.json")) shouldBe empty
    java.nio.file.Files.delete(tmp)
  }
}
