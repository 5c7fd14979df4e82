package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench cpu-regime clamp (r19): the VM's 32 vCPUs are 16
  * HT-shared physical cores, invisible from inside the guest (lscpu
  * reports 1 thread/core), and oversubscribed sweeps measure scheduler
  * contention instead of plan cost (32-thread calib 1.9× slower,
  * iterative queries 2–3.4× inflated — ARCHITECTURE.md item 24). The
  * clamp is the tool-encoded regime rule; this spec keeps its table
  * from regressing silently.
  */
class BenchRegimeSpec extends AnyFunSuite {
  test("the measured physical-core constant is 16") {
    // deliberate double-entry: changing PhysicalCores means the HOST
    // changed — re-measure (calib at both widths, one iterative query)
    // before touching either side
    assert(Bench.PhysicalCores == 16)
  }

  test("requests at or below the physical cores pass through") {
    assert(Bench.resolveCpus(16, allowOversubscribe = false) == (16, 16))
    assert(Bench.resolveCpus(8, allowOversubscribe = false) == (8, 8))
    assert(Bench.resolveCpus(1, allowOversubscribe = false) == (1, 1))
  }

  test("oversubscribed requests clamp to the physical cores and keep " +
      "the requested value for the JSON record") {
    assert(Bench.resolveCpus(32, allowOversubscribe = false) == (16, 32))
    assert(Bench.resolveCpus(17, allowOversubscribe = false) == (16, 17))
  }

  test("the explicit oversubscribe escape hatch honors the literal value") {
    assert(Bench.resolveCpus(32, allowOversubscribe = true) == (32, 32))
  }

  test("zero or negative requests clamp to 1 (local[0] would fail " +
      "deep in Spark), even under the oversubscribe escape hatch") {
    assert(Bench.resolveCpus(0, allowOversubscribe = false) == (1, 0))
    assert(Bench.resolveCpus(-4, allowOversubscribe = false) == (1, -4))
    assert(Bench.resolveCpus(0, allowOversubscribe = true) == (1, 0))
  }
}
