package graft

import graft.expressions.WinnowFingerprints.winnowFingerprints
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Unit edges of the winnowing kernel plus full parity with the
  * relational formulation it replaced (explode → windowed min →
  * distinct) — on ASCII and on the non-ASCII code-point fallback the
  * corpus never exercises. */
class WinnowExpressionSpec extends SparkSpec {
  import spark.implicits._

  private def kernel(s: String, k: Int = 5, w: Int = 8): Seq[Long] =
    Seq(s).toDF("c").select(winnowFingerprints(col("c"), k, w)).as[Seq[Long]].head()

  /** The pre-r9 relational shape, inlined as the independent reference. */
  private def relational(s: String, k: Int = 5, w: Int = 8): Seq[Long] = {
    val poly = (1 until k).foldLeft((ascii(expr("substring(c, pos, 1)")) % 32)
        .cast("long")) { (acc, i) =>
      acc * 32L + (ascii(expr(s"substring(c, pos + $i, 1)")) % 32).cast("long")
    }
    val win = Window.partitionBy(lit(1)).orderBy(col("pos"))
      .rowsBetween(-(w - 1), Window.currentRow)
    Seq(s).toDF("c")
      .select(col("c"), explode(when(length(col("c")) >= k,
          sequence(lit(1), length(col("c")) - (k - 1)))
        .otherwise(array().cast("array<int>"))).as("pos"))
      .select(col("pos"), ((poly * 2654435761L) % 4294967296L).as("h"))
      .withColumn("mh", min(col("h")).over(win))
      .filter(col("h") === col("mh"))
      .select(col("h")).distinct().as[Long].collect().toSeq.sorted
  }

  test("shorter-than-k inputs (incl. empty) yield an empty fingerprint set") {
    assert(kernel("") === Seq.empty)
    assert(kernel("abcd") === Seq.empty)
  }

  test("an exactly-k-char input yields its single gram hash") {
    val out = kernel("abcde")
    assert(out.length === 1)
    // base-32 polynomial over codes 1..5, Knuth-scrambled mod 2^32
    val poly = Seq(1L, 2L, 3L, 4L, 5L).reduce(_ * 32L + _)
    assert(out.head === (poly * 2654435761L) % 4294967296L)
  }

  test("kernel matches the relational formulation on ASCII text") {
    val s = "the quick brown fox jumps over the lazy dog and runs on " * 4
    assert(kernel(s) === relational(s))
  }

  test("kernel matches the relational formulation on repeated text (duplicate grams)") {
    val s = "abcab " * 30
    assert(kernel(s) === relational(s))
  }

  test("non-ASCII input takes the code-point fallback and still matches") {
    // 'é'/'ü' force numBytes != numChars; ascii() yields the code point
    // in both formulations
    val s = "café brülot café au lait et café noir served here daily"
    assert(kernel(s) === relational(s))
  }
}
