package graft.ml

import graft.QueryDef

/** Placeholder registry for the ML pipeline queries — populated as the
  * cluster/coherence/refine modules land. */
object MlQueries {
  def defs: Seq[QueryDef] = Seq.empty
}
