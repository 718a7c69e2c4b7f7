package graft

import graft.operators.DedupOps
import org.apache.spark.sql.functions._

/** d18 differential spec on raw planted text: the relational
  * island-detection run finder vs an INDEPENDENT driver-side reference
  * (explicit passage lists + brute diagonal scan), plus the boundary
  * behaviors the operator doc claims — single shared passages excluded,
  * scattered shares don't fuse into runs, the degenerate-fanout guard. */
class PassageRunsSpec extends SparkSpec {
  import spark.implicits._

  /** Build a doc text as `n` 20-token passages; passage `tag` yields 20
    * distinct tokens so two docs share a passage iff they share a tag. */
  private def passage(tag: String): String =
    (0 until 20).map(i => s"${tag}w$i").mkString(" ")
  private def doc(tags: String*): String = tags.map(passage).mkString(" ")

  private def docsDir(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("passageruns").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // ----- independent reference: brute diagonal scan over passage lists -----

  private def refRuns(rows: Seq[(Long, String)])
      : Set[(Long, Long, Long, Long, Long)] = {
    val ps = rows.map { case (id, t) =>
      id -> t.split(" ").grouped(20).map(_.mkString(" ")).toVector }.toMap
    val ids = rows.map(_._1).sorted
    val out = scala.collection.mutable.Set.empty[(Long, Long, Long, Long, Long)]
    for {
      a <- ids; b <- ids if a < b
      diag <- -(ps(b).length - 1) to (ps(a).length - 1)
    } {
      // walk the diagonal pa - pb = diag, collecting maximal match runs
      var run = 0L
      var start = -1L
      val paRange = math.max(0, diag) to math.min(ps(a).length - 1, ps(b).length - 1 + diag)
      for (pa <- paRange) {
        val pb = pa - diag
        if (ps(a)(pa.toInt) == ps(b)(pb.toInt)) {
          if (run == 0) start = pa
          run += 1
        } else {
          if (run >= 2) out += ((a, b, start, start - diag, run))
          run = 0
        }
      }
      if (run >= 2) out += ((a, b, start, start - diag, run))
    }
    out.toSet
  }

  private def engineRuns(dir: String): Set[(Long, Long, Long, Long, Long)] =
    DedupOps.passageRuns(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSet

  test("planted verbatim block is found as one maximal run; scattered shares are not runs") {
    val rows = Seq(
      1L -> doc("a", "b", "c", "d", "e", "f"),
      // shares a,b,c CONSECUTIVELY (offset +1) and f scattered
      2L -> doc("x", "a", "b", "c", "y", "f"),
      // shares d,e consecutively at its start (offset -3)
      3L -> doc("d", "e", "z1", "z2"))
    val dir = docsDir(rows)
    val got = engineRuns(dir)
    val want = refRuns(rows)
    assert(got === want)
    // the planted block: doc1 pos 0..2 = doc2 pos 1..3
    assert(got.contains((1L, 2L, 0L, 1L, 3L)))
    // the d,e block: doc1 pos 3..4 = doc3 pos 0..1
    assert(got.contains((1L, 3L, 3L, 0L, 2L)))
    // the scattered f (single passage) produced NO run
    assert(!got.exists { case (a, b, as_, bs, len) =>
      Set(a, b) == Set(1L, 2L) && len == 1L })
    assert(got.size === want.size)
  }

  test("adjacent runs on different diagonals stay separate") {
    // doc2 contains a,b twice: runs on two diagonals, both found
    val rows = Seq(
      1L -> doc("a", "b", "q1", "q2"),
      2L -> doc("a", "b", "r", "a", "b"))
    val dir = docsDir(rows)
    val got = engineRuns(dir)
    assert(got === refRuns(rows))
    assert(got.contains((1L, 2L, 0L, 0L, 2L))) // diag 0
    assert(got.contains((1L, 2L, 0L, 3L, 2L))) // diag -3
  }

  test("fuzzed corpora match the reference exactly") {
    val rng = new scala.util.Random(42)
    val tagPool = Vector("t0", "t1", "t2", "t3", "t4", "t5", "t6", "t7")
    (1 to 5).foreach { trial =>
      val rows = (1L to 6L).map { id =>
        id -> doc(Vector.fill(3 + rng.nextInt(4))(
          tagPool(rng.nextInt(tagPool.length))): _*)
      }
      val dir = docsDir(rows)
      assert(engineRuns(dir) === refRuns(rows), s"trial $trial rows $rows")
    }
  }

  // ----- d19: winnowing-fingerprint dedup (the MOSS composition) -----

  private def d19Runs(rows: Seq[(Long, String)])
      : Set[(Long, Long, Long, Long, Long, Long)] =
    DedupOps.winnowRunDedup(spark, docsDir(rows))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet

  /** Independent char-grain reference: brute diagonal walk over 5-gram
    * equality (direct substring compare — no hashing, so a shared
    * hash-collision bug cannot hide), maximal runs >= minRun. Models
    * stage 2 only — callers plant quotations long enough that stage
    * 1's candidate threshold provably passes (>= 48 shared chars =>
    * >= 5 window selections >= the 4-fingerprint threshold). */
  private def refCharRuns(rows: Seq[(Long, String)], minRun: Int)
      : Set[(Long, Long, Long, Long, Long, Long)] = {
    val k = 5
    val ids = rows.map(_._1).sorted
    val txt = rows.toMap
    val out = scala.collection.mutable.Set.empty[(Long, Long, Long, Long, Long, Long)]
    for {
      a <- ids; b <- ids if a < b
      ta = txt(a); tb = txt(b)
      na = ta.length - k + 1; nb = tb.length - k + 1
      diag <- -(nb - 1) to (na - 1)
    } {
      var run = 0L; var start = -1L
      val paRange = math.max(0, diag) to math.min(na - 1, nb - 1 + diag)
      for (pa <- paRange) {
        val pb = pa - diag
        if (ta.substring(pa.toInt, pa.toInt + k) ==
            tb.substring(pb.toInt, pb.toInt + k)) {
          if (run == 0) start = pa
          run += 1
        } else {
          if (run >= minRun) out += ((a, b, start + 1, start - diag + 1, run, run + k - 1))
          run = 0
        }
      }
      if (run >= minRun) out += ((a, b, start + 1, start - diag + 1, run, run + k - 1))
    }
    out.toSet
  }

  test("d19: planted shifted quotation recovered at substring grain with exact offsets") {
    val q = "the quick brown fox jumps over the lazy dog again and again"
    val rows = Seq(
      1L -> s"alpha beta gamma delta $q epsilon zeta",
      2L -> s"omega psi $q chi phi upsilon tau")
    val got = d19Runs(rows)
    val want = refCharRuns(rows, 16)
    assert(got === want)
    assert(got.size === 1)
    // the run covers the quotation plus its flanking shared spaces
    val (_, _, aPos, bPos, runLen, matchLen) = got.head
    assert(aPos === rows.head._2.indexOf(q).toLong) // 1-based pos of the leading space
    assert(bPos === rows(1)._2.indexOf(q).toLong)
    assert(matchLen === q.length + 2L && runLen === matchLen - 4L)
  }

  test("d19: a quotation that straddles passage boundaries is invisible to d18, found by d19") {
    // 25-token quote at token offsets 5 vs 12 — no aligned 20-token
    // passage is shared, so passage-grain dedup sees nothing
    // letter-only words: the engine fingerprints CLEANED text (digits
    // strip), the reference walks the raw string — they must coincide
    def w(tag: String, i: Int) =
      s"$tag${('a' + i % 26).toChar}${('a' + i / 26).toChar}"
    val quote = (0 until 25).map(i => w("qq", i)).mkString(" ")
    val rows = Seq(
      1L -> ((0 until 5).map(i => w("af", i)).mkString(" ") + " " + quote + " " +
        (0 until 15).map(i => w("am", i)).mkString(" ")),
      2L -> ((0 until 12).map(i => w("bf", i)).mkString(" ") + " " + quote + " " +
        (0 until 10).map(i => w("bm", i)).mkString(" ")))
    val dir = docsDir(rows)
    assert(DedupOps.passageRuns(spark, dir).count() === 0L)
    val got = DedupOps.winnowRunDedup(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(got === refCharRuns(rows, 16))
    assert(got.nonEmpty)
    // one maximal run spanning the whole quotation (plus flanking spaces)
    assert(got.exists { case (_, _, _, _, _, ml) => ml >= quote.length })
  }

  test("d19: a short shared string (< 20 chars) is below the verification grain") {
    val rows = Seq(
      1L -> "aaa bbb ccc shared here ddd eee",
      2L -> "fff ggg shared here hhh iii jjj")
    // "shared here" is 11 chars — winnowing may fingerprint it, but no
    // 16-gram run exists
    assert(d19Runs(rows) === Set.empty)
  }

  test("d19: fuzzed planted quotations match the char-grain reference exactly") {
    val rng = new scala.util.Random(7)
    (1 to 5).foreach { trial =>
      def w(tag: String, i: Int) =
        s"$tag${('a' + i % 26).toChar}${('a' + i / 26).toChar}"
      val quote = (0 until 10 + rng.nextInt(10)).map(i => w("qw", i)).mkString(" ")
      def filler(tag: String, n: Int) =
        (0 until n).map(i => w(tag, i)).mkString(" ")
      val rows = Seq(
        1L -> (filler("av", 2 + rng.nextInt(6)) + " " + quote + " " +
          filler("aw", 2 + rng.nextInt(6))),
        2L -> (filler("bv", 2 + rng.nextInt(6)) + " " + quote + " " +
          filler("bw", 2 + rng.nextInt(6))))
      assert(d19Runs(rows) === refCharRuns(rows, 16), s"trial $trial rows $rows")
    }
  }

  test("degenerate-fanout guard: a passage in >32 docs forms no pairs") {
    // 40 docs all sharing the same two consecutive passages — furniture,
    // not quotation; the guard suppresses the quadratic pair fanout
    val rows = (1L to 40L).map(id => id -> doc("common", "alsocommon", s"u$id"))
    val dir = docsDir(rows)
    assert(engineRuns(dir) === Set.empty)
    // at 3 docs the same shape IS reported (under the guard ceiling)
    val small = rows.take(3)
    val got = engineRuns(docsDir(small))
    assert(got === refRuns(small) && got.nonEmpty)
  }

  test("d23 planted quotations yield verified cross-doc runs on shipped data") {
    val docs = graft.sources.Tables.documents(spark, sfTiny)
    val off = 1000000L // plantOffset floor; corpus max id is far below it
    val rows = graft.operators.DedupOps.winnowPlantedDedup(spark, sfTiny)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    val planted = rows.filter(_._1 >= off)
    // doc 0 quotes re-appear in docs 1 and 2 — both pairs verified
    assert(planted.exists { case (a, b, len) =>
      a == off && b == off + 1 && len >= 16 },
      "quotation 1 run (doc 0 <-> doc 1) missing")
    assert(planted.exists { case (a, b, len) =>
      a == off && b == off + 2 && len >= 16 },
      "quotation 2 run (doc 0 <-> doc 2) missing")
    // no spurious planted-planted pair: docs 1 and 2 share no quotation
    assert(!planted.exists { case (a, b, _) => a == off + 1 && b == off + 2 })
  }

  test("d24 stored-index probe recalls both planted quotations asymmetrically") {
    val off = 1000000L
    val rows = graft.operators.DedupOps.winnowStoredProbe(spark, sfTiny)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(rows.exists { case (a, b, len) =>
      a == off && b == off + 1 && len >= 16 })
    assert(rows.exists { case (a, b, len) =>
      a == off && b == off + 2 && len >= 16 })
    // the probe answers from the ARCHIVE side only: every reported
    // doc_a is an archive doc, every doc_b an incoming one
    assert(rows.forall { case (a, b, _) => b >= off + 1 && (a < off || a == off) })
  }
}
