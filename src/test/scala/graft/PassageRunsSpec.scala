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
}
