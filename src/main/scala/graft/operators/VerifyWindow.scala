package graft.operators

/** The shared all-pairs verification window: the exact O(n²) baseline
  * queries (d02 Jaccard pairs, d07/p02 near-dup components, e02/e08
  * embedding similarity) run over ids below this bound so they stay
  * exact-but-bounded at every SF, and their DuckDB oracles interpolate
  * the SAME value. One definition so a future SF bump changes the
  * window once, on both engines at once (it was previously hard-coded
  * in five places).
  */
object VerifyWindow {
  /** Exclusive upper id bound of the window. */
  val MaxId = 1000

  /** Structural round cap for [[GraphOps.connectedComponents]] over
    * graphs whose nodes all come from the window: hash-min label
    * propagation can never need more rounds than the node count
    * (graph diameter bound), so windowed callers pass this instead of
    * letting the default cap spend a count() action per collapse. */
  val CcMaxRounds: Int = MaxId + 2
}
