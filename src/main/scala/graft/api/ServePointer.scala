package graft.api

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{FileAlreadyExistsException, Files, Paths}

/** Atomic CURRENT pointer over versioned artifact directories — the
  * operational primitive every store here implied but nothing
  * provided: [[IvfStore.versionedDir]] / [[LshIndexStore]] /
  * [[PassageIndexStore]] / [[WinnowIndexStore]] write immutable
  * versioned dirs, compactions and rebuilds produce NEW dirs, and the
  * question "which version does the fleet serve RIGHT NOW" needs an
  * atomic, auditable answer. This is the staged-rollout / rollback
  * switch: adopting a new artifact is one CAS; rolling back is
  * adopting the previous dir again (a NEW pointer version — the
  * history is append-only, so the audit trail records the revert
  * instead of erasing the rollout).
  *
  * Protocol (the [[graft.sources.ExportCommit]] manifest recipe): each
  * adoption writes `current-v{N}.json` via temp-file + hard-link —
  * link creation is atomic and fails if version N exists, so two
  * racing adopters serialize (the loser re-reads and retries at N+1;
  * adoption order IS the CAS order). Readers resolve the highest
  * version — never a torn file, never a half-adopted pointer. An
  * object-store deployment swaps createLink for a conditional put.
  *
  * Re-adopting the dir that is already current is a no-op (returns the
  * current version) — replayed rollout steps must not churn the
  * pointer. The pointer stores the dir string verbatim; deployments
  * pass stable paths.
  *
  * 100 TB shape: the pointer is one kilobyte-scale file per adoption;
  * serves read it once per plan build. Immutable versioned dirs plus
  * an atomic pointer is the reader-isolation recipe (e25's witness):
  * a serve pinned to its loaded version is unaffected by a concurrent
  * adoption, and the janitor retires a dir only when no pointer
  * version inside the rollback retention window still names it
  * ([[retirable]]). */
object ServePointer {

  private val PointerName = "current-v(\\d+)\\.json".r
  private val DirRe = """\{"version":(\d+),"dir":"([^"]+)"\}""".r

  /** All adoptions, version order — the audit trail. LOUD on a
    * pointer file that exists but does not parse (the loud-load
    * discipline every store here follows): silently skipping a corrupt
    * `current-v{N}.json` would serve the PREVIOUS version — an
    * invisible rollback. The commit protocol cannot produce a torn
    * file (content is durable before the name appears), so a parse
    * failure is disk corruption or foreign writes and must stop the
    * serve, not redirect it. */
  def history(root: String): Seq[(Int, String)] = {
    val f = new java.io.File(root)
    Option(f.list()).toSeq.flatten
      .collect { case PointerName(v) => v.toInt }
      .sorted
      .map { v =>
        val s = Files.readString(Paths.get(root, s"current-v$v.json"), UTF_8)
        DirRe.findFirstMatchIn(s).map(m => (v, m.group(2)))
          .getOrElse(throw new IllegalStateException(
            s"corrupt serve pointer current-v$v.json under $root — " +
              "refusing to resolve a version (a skip would silently " +
              "serve the previous artifact)"))
      }
  }

  /** The currently adopted dir, if any pointer version exists. */
  def current(root: String): Option[String] =
    history(root).lastOption.map(_._2)

  /** The janitor's retirement predicate: of `candidates`, the dirs
    * named by NO pointer version in the retention window (the last
    * `keepLast` adoptions). The history is append-only, so without a
    * window nothing would ever retire; the window is the rollback
    * horizon — a dir inside it may be re-adopted by a revert and must
    * survive, one outside it has no pointer that can reach it short of
    * a fresh adoption (which would re-protect it). Deployments size
    * `keepLast` to their rollback policy and feed the survivors to the
    * artifact janitor ([[graft.sources.ExportCommit.retireRoot]]'s
    * ordering contract applies: retire only after the upstream
    * checkpoint passed the folded batches). */
  def retirable(root: String, candidates: Seq[String],
      keepLast: Int = 2): Seq[String] = {
    require(keepLast >= 1, "keepLast must retain at least the current dir")
    val protected_ = history(root).takeRight(keepLast).map(_._2).toSet
    candidates.filterNot(protected_.contains)
  }

  /** Atomically adopt `dir` as the serving version. Returns the
    * pointer version that names `dir` (the existing one when `dir` is
    * already current — replay no-op). Safe under concurrent adopters:
    * the createLink CAS serializes them; the last adoption wins. */
  def adopt(root: String, dir: String): Int = {
    val rootPath = Paths.get(root).toAbsolutePath.normalize()
    Files.createDirectories(rootPath)
    while (true) {
      val h = history(root)
      if (h.lastOption.exists(_._2 == dir)) return h.last._1
      val next = h.lastOption.map(_._1).getOrElse(0) + 1
      val tmp = Files.createTempFile(rootPath, ".current", ".tmp")
      try {
        Files.writeString(tmp, s"""{"version":$next,"dir":"$dir"}""", UTF_8)
        try {
          Files.createLink(rootPath.resolve(s"current-v$next.json"), tmp)
          return next
        } catch {
          case _: FileAlreadyExistsException => () // lost the race; retry
        }
      } finally Files.deleteIfExists(tmp)
    }
    -1 // unreachable
  }
}
