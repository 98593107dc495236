package graft.queries

import graft.QueryDef

/** Flat registry of every query the engine exposes to the driver.
  * Each module contributes a `defs` seq; names must be unique. */
object Registry {
  def all: Seq[QueryDef] =
    Relational.defs ++ Reco.defs ++ Llm.defs ++ Ml.defs ++ Extras.defs ++
      QualityParity.defs

  require(all.map(_.name).distinct.size == all.size, "duplicate query names")
}
