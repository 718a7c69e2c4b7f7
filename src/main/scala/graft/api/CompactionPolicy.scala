package graft.api

import graft.sources.ExportCommit

/** Compaction TRIGGER policy (r15 verdict ask #6) — the operational
  * half of the maintenance story: e20/e22/e23/d22/d25 witness the
  * FOLD, but a deployment also needs the janitor predicate that
  * decides WHEN to pay for it. The inputs are deliberately
  * manifest-sized (never data-sized): every store here publishes its
  * appends and tombstones through [[graft.sources.ExportCommit]]'s
  * atomic manifest, so "how much maintenance debt has accrued" is the
  * length of two manifests — a kilobyte read, safe to poll from a
  * janitor schedule at any corpus scale.
  *
  * Why these two thresholds:
  *   - `maxAppendBatches` bounds the probe-side plan: an uncompacted
  *     store is served as base ∪ one scan node per committed batch
  *     dir, and (for the census-guarded indexes — LSH bands, winnow
  *     fingerprints) the per-batch census can only see its own batch,
  *     so cross-increment degenerate growth is bounded by
  *     (batches × per-batch cap) until the fold's global re-census
  *     retires it (see [[LshIndexStore.appendBatch]]).
  *   - `maxTombstoneBatches` bounds takedown latency-to-physical: a
  *     tombstone is honored logically at serve time the moment it
  *     commits, but the bytes leave the artifact only at the next
  *     fold — an erasure-compliance clock a deployment must bound.
  *
  * The policy is a pure function of the two manifests; firing it is
  * the janitor's job (run the store's compactAppends, adopt the new
  * versioned dir, let gcStaging retire the folded batch dirs). */
object CompactionPolicy {

  /** One policy evaluation: whether a fold is due, and the measured
    * debt that decided it (for janitor logs / dashboards). */
  final case class Decision(due: Boolean, appendBatches: Int,
      tombstoneBatches: Int)

  /** Committed-batch count under one ExportCommit root (0 when no
    * manifest exists yet — a store with no appends has no debt). */
  private def batches(root: String): Int =
    ExportCommit.latest(root).map(_.entries.size).getOrElse(0)

  /** True (with the measured counts) when either manifest has reached
    * its threshold. Thresholds are INCLUSIVE lower bounds: a store at
    * exactly `maxAppendBatches` committed appends is due — the policy
    * fires at the threshold, not past it — and a store one below is
    * not. `tombstoneRoot = None` means the store keeps no delete log
    * (only append debt can accrue). */
  def due(appendRoot: String, tombstoneRoot: Option[String],
      maxAppendBatches: Int, maxTombstoneBatches: Int): Decision = {
    require(maxAppendBatches > 0 && maxTombstoneBatches > 0,
      "compaction thresholds must be positive — a zero threshold would " +
        "fire forever on an empty store")
    val a = batches(appendRoot)
    val t = tombstoneRoot.map(batches).getOrElse(0)
    Decision(a >= maxAppendBatches || t >= maxTombstoneBatches, a, t)
  }
}
