package graft.operators

import graft.QueryDef

/** ML operator family (SURVEY §2.9): K-means, LDA, coherence, cluster
  * split/merge/refresh. Filled in by the pipeline modules in graft.ml —
  * these are rows-only checks (no SQL oracle for iterative fits).
  */
object MlOps {
  def defs: Seq[QueryDef] = graft.ml.MlQueries.defs
}
