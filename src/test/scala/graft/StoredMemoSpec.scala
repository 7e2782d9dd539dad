package graft

import org.scalatest.funsuite.AnyFunSuite

/** The stored-index memo overflow guard: under the bound the map is
  * untouched; over it, the guard clears (bounded memory over a silent
  * leak) — the failure mode it defends against is a caller keying a
  * memo on one-shot frames (the r9 e19 regression class).
  */
class StoredMemoSpec extends AnyFunSuite {

  private def mapOf(n: Int) = {
    val m = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    (1 to n).foreach(i => m.put(i, s"v$i"))
    m
  }

  test("guard leaves a within-bound memo untouched") {
    val m = mapOf(16)
    StoredMemo.guard(m, "t", bound = 16)
    assert(m.size === 16)
  }

  test("guard clears a flooded memo instead of letting it grow") {
    val m = mapOf(17)
    StoredMemo.guard(m, "t", bound = 16)
    assert(m.isEmpty, "over-bound memo must be cleared")
    // and the next computeIfAbsent simply rebuilds
    m.computeIfAbsent(1, _ => "rebuilt")
    assert(m.get(1) === "rebuilt")
  }
}
