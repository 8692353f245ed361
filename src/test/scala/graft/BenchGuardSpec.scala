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

  test("soloFolds distinguishes same-JVM drift from a real regression (the r14 q75 incident)") {
    // r14's actual numbers: the suite recorded q75 min 1.343s against a
    // committed 0.317s (history_drift fired). The fresh-JVM solo ran
    // 0.60s — within the drift threshold of history — so the drift was
    // JVM-state/contention, NOT a plan regression: the solo folds and
    // the record self-heals instead of anchoring next round's baseline
    // at 4x the true cost.
    BenchGuard.historyDrift(freshMin = 1.343, historicalMin = 0.317) shouldBe true
    BenchGuard.soloFolds(Some(0.60), historicalMin = 0.317) shouldBe true
    // a REAL regression stays slow in the fresh JVM too: the solo must
    // NOT fold — the slow min stands and the artifact shows both numbers
    BenchGuard.soloFolds(Some(1.30), historicalMin = 0.317) shouldBe false
    // a failed/unparseable solo never edits the record
    BenchGuard.soloFolds(None, historicalMin = 0.317) shouldBe false
    // border: a solo exactly at the historical cost trivially folds
    BenchGuard.soloFolds(Some(0.317), historicalMin = 0.317) shouldBe true
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
