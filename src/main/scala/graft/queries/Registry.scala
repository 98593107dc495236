package graft.queries

import graft.QueryDef

/** Flat registry of every query the engine exposes to the driver.
  * Each module contributes a `defs` seq; names must be unique.
  *
  * Oracle policy: every gate carries DuckDB oracle SQL unless the
  * operator family is oracled through a named hash-exact replay twin
  * (q25b/q43b/q47b/q60b/q62b/q63b convention). The ONE deliberate
  * exception is **q90** (`QualityParity.cgQuality`): it is the
  * end-to-end NDCG-parity BAND vehicle — it trains the full
  * candidate-generator stack and pins quality bands, while the NDCG
  * math itself is oracled hash-exactly by q26/q60b. Keep it banded;
  * do not re-litigate it into a replay gate (VERDICT r9 #6).
  *
  * Growth budget (VERDICT r9 #8): the quiet 3-pass bench total stays
  * ≤ 200 s (~1 s/gate at the r9 registry size of 167). New gates net
  * against retirements — when a rows-only vehicle is fully pinned by
  * a golden/replay twin, retire it (the q42/q45/q46/q70 precedent)
  * rather than letting the bench decay from signal into ceremony.
  * STATUS r11 end: 187 gates / 197.9 s quiet — the budget is spent.
  * From r12 on, additions REQUIRE a retirement or an equal measured
  * speedup; first candidates are q161/q162 (the bucketed-verify
  * alternative, ~7 s, kept one round as the rejection's evidence). */
object Registry {
  def all: Seq[QueryDef] =
    Relational.defs ++ Reco.defs ++ Llm.defs ++ Ml.defs ++ Extras.defs ++
      QualityParity.defs

  require(all.map(_.name).distinct.size == all.size, "duplicate query names")
}
