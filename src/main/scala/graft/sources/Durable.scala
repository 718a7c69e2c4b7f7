package graft.sources

import java.nio.channels.FileChannel
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Path, StandardOpenOption}

/** Crash-durability primitives for the two atomic-publish protocols
  * ([[ExportCommit]] manifests, [[graft.api.ServePointer]] pointer
  * files) — r16 ADVICE: both publish via temp-file + createLink, which
  * is atomic against CONCURRENT readers but not against POWER LOSS: on
  * a journaling filesystem the link name can be journaled before the
  * temp file's data blocks flush, so a crash between the two could
  * surface a visible `manifest-v{N}.json` / `current-v{N}.json` with
  * empty or partial content — which the loud-load discipline would
  * then report as corruption and stop the serve. Forcing the content
  * to media BEFORE the link, and the directory entry AFTER it, closes
  * that window: the name appears only once the bytes are durable, and
  * the name itself survives the crash once the publish returns.
  *
  * 100 TB shape: two fsyncs per COMMIT (not per row) — manifests and
  * pointers are kilobyte-scale and commit on janitor/adoption cadence,
  * so the cost is nanoscopic next to the batch write they publish. An
  * object-store deployment drops this entirely (conditional puts are
  * durable on acknowledge). */
private[graft] object Durable {

  /** Write `content` to `tmp` and force file content + metadata to
    * media before returning — after this, a crash cannot tear the
    * bytes a subsequent createLink makes visible. */
  def writeString(tmp: Path, content: String): Unit = {
    val ch = FileChannel.open(tmp, StandardOpenOption.WRITE,
      StandardOpenOption.TRUNCATE_EXISTING)
    try {
      val buf = java.nio.ByteBuffer.wrap(content.getBytes(UTF_8))
      while (buf.hasRemaining) ch.write(buf)
      ch.force(true)
    } finally ch.close()
  }

  /** Force a directory's entry table to media — makes a just-created
    * link name itself crash-durable. Best-effort where the platform
    * refuses a directory read channel (some filesystems); the content
    * fsync above already prevents the torn-file case, this one only
    * narrows "published but name lost on crash" to rename-durability
    * semantics the filesystem provides anyway. */
  def fsyncDir(dir: Path): Unit =
    try {
      val ch = FileChannel.open(dir, StandardOpenOption.READ)
      try ch.force(true) finally ch.close()
    } catch { case _: java.io.IOException => () }
}
