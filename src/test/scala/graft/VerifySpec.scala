package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the demotion-aware oracle dump (round-12 fail-safe): a
  * query named in the demotions file must ship NO oracle SQL — the
  * driver then records the honest weaker rows-only check — while every
  * other gate is untouched. The end-to-end path (real margin audit →
  * apply_margin_demotions → Verify.main → check_oracle SKIP) is
  * exercised by `tools/test_margin_demotion.sh`; this spec pins the
  * Scala-side contract in isolation.
  */
class VerifySpec extends AnyFunSuite {

  test("loadDemotions: tool format, bare-string reasons, missing file") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-verify-demotions")
    val f = dir.resolve("demotions.json")
    // the exact shape tools/apply_margin_demotions.py writes, plus a
    // hand-added bare-string entry
    java.nio.file.Files.writeString(f,
      """{"q100b_dsir_select": {"source": "margin_audit",
        |  "reason": "ln scan AND gap margin failed"},
        | "q42_hand": "manually parked"}""".stripMargin)
    val d = Verify.loadDemotions(f.toString)
    assert(d === Map(
      "q100b_dsir_select" -> "ln scan AND gap margin failed",
      "q42_hand" -> "manually parked"))
    // a missing file means NO demotions — the shipped default
    assert(Verify.loadDemotions(dir.resolve("absent.json").toString)
      === Map.empty)
  }

  test("gatedOracles: demoted queries stripped, everything else verbatim") {
    val all = Map("q1" -> "SELECT 1", "q2" -> "SELECT 2", "q3" -> "SELECT 3")
    val out = Verify.gatedOracles(all, Map("q2" -> "why", "q9" -> "absent"))
    assert(out === Map("q1" -> "SELECT 1", "q3" -> "SELECT 3"))
    // no demotions = identity: the shipped default changes nothing
    assert(Verify.gatedOracles(all, Map.empty) === all)
  }

  test("the repo ships no standing demotions: every current gate is sound") {
    // demotions.json at the repo root is the file the driver's Verify
    // run reads; it must stay absent (or empty of margin entries) while
    // the margin audit passes — a committed demotion is a LOUD,
    // deliberate state, not a leftover
    val f = new java.io.File("demotions.json")
    if (f.isFile) {
      val d = Verify.loadDemotions(f.getPath)
      assert(d.isEmpty,
        s"standing demotions shipped: $d — re-run tools/gate_sf01.sh; " +
          "if the margins are genuinely eroded this assert documents it")
    }
  }
}
