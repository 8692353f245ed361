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
}
