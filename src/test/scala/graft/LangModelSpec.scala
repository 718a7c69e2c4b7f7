package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** t17 differential spec: the relational char-trigram Naive Bayes vs an
  * INDEPENDENT driver-side reference (explicit trigram maps + log-prob
  * sums — no shared Column code), plus argmax determinism and the t14
  * two-gate card invariants on sfTiny. Corpus text here is pre-cleaned
  * (lowercase a-z + spaces) so the reference needs no clean-chain twin. */
class LangModelSpec extends SparkSpec {
  import spark.implicits._

  /** Write a (doc_id, text, lang, source) docs table as parquet and
    * return its dir (langModelPred reads via Tables.documents). */
  private def docsDir(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("langmodel").toString
    rows.toDF("doc_id", "text", "lang")
      .withColumn("source", lit("src0"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // ----- independent reference NB -----

  private def tris(s: String): Seq[String] =
    if (s.length < 3) Seq.empty else (0 to s.length - 3).map(i => s.substring(i, i + 3))

  private def refPredict(rows: Seq[(Long, String, String)])
      : Map[Long, (String, Double)] = {
    val langs = rows.map(_._3).distinct.sorted
    val counts = scala.collection.mutable.Map.empty[(String, String), Long]
    rows.foreach { case (_, t, l) =>
      tris(t).foreach(g => counts((l, g)) = counts.getOrElse((l, g), 0L) + 1L) }
    val nInst = langs.map(l => l -> counts.collect { case ((`l`, _), c) => c }.sum).toMap
    val v = counts.keys.map(_._2).toSet.size.toLong
    val nAll = rows.size.toLong
    val nLang = rows.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    rows.flatMap { case (id, t, _) =>
      val g = tris(t)
      if (g.isEmpty) None
      else {
        val scores = langs.map { l =>
          val msum = g.map(tg => math.log(counts.getOrElse((l, tg), 0L) + 1.0)).sum
          val s = (msum + math.log(nLang(l).toDouble / nAll) -
            g.length * math.log((nInst(l) + v).toDouble)) / g.length
          (l, s)
        }
        val (bl, bs) = scores.minBy { case (l, s) => (-s, l) }
        Some(id -> (bl, bs))
      }
    }.toMap
  }

  private val corpus = Seq(
    (1L, "the cat sat on the mat and the dog ran", "en"),
    (2L, "the rain in spain stays mainly on the plain", "en"),
    (3L, "der hund lief durch den wald und der fuchs", "de"),
    (4L, "die katze sass auf der matte und schlief", "de"),
    (5L, "le chat est sur le tapis et le chien court", "fr"),
    (6L, "la pluie en france tombe sur la plaine", "fr"),
    (7L, "xy", "en")) // too short for one trigram — must drop

  test("langModelPred matches the independent reference prediction and score") {
    val dir = docsDir(corpus)
    val got = TextOps.langModelPred(spark, dir)
      .as[(Long, String, Double)].collect()
      .map { case (id, l, s) => id -> (l, s) }.toMap
    val want = refPredict(corpus)
    assert(got.keySet === want.keySet)
    assert(!got.contains(7L)) // no-trigram doc dropped
    got.foreach { case (id, (l, s)) =>
      assert(l === want(id)._1, s"doc $id lang")
      // engine publishes the 6dp-rounded mean — compare at that grain
      val wantRounded = BigDecimal(want(id)._2)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(s - wantRounded) < 1e-9, s"doc $id score")
    }
    // the signal is real on this corpus: every doc self-classifies
    corpus.filter(_._1 != 7L).foreach { case (id, _, trueLang) =>
      assert(got(id)._1 === trueLang, s"doc $id should recover its language")
    }
  }

  test("argmax tie-break is lang-ascending when scores tie exactly") {
    // two langs with IDENTICAL corpora → every score ties; 'aa' < 'bb'
    val dir = docsDir(Seq(
      (1L, "abcabc", "aa"), (2L, "abcabc", "bb"),
      (3L, "xyzxyz", "aa"), (4L, "xyzxyz", "bb")))
    val got = TextOps.langModelPred(spark, dir)
      .select(col("lang_model")).distinct().as[String].collect()
    assert(got.toSeq === Seq("aa"))
  }

  test("t14 card on sfTiny: both gates present, shares sum to 1 per (gate, lang)") {
    val card = TextOps.langConfusion(spark, sfTiny).cache()
    assert(card.select(col("gate")).distinct().as[String].collect().sorted
      === Array("heuristic", "model"))
    val sums = card.groupBy(col("gate"), col("lang"))
      .agg(sum(col("lang_share")).as("s"), sum(col("n_docs")).as("n"))
      .as[(String, String, Double, Long)].collect()
    sums.foreach { case (g, l, s, n) =>
      assert(math.abs(s - 1.0) < 1e-4, s"($g,$l) share sum $s")
      assert(n > 0)
    }
    // model-arm guesses live in the true-lang universe (it can only
    // predict langs it trained on)
    val langs = card.select(col("lang")).distinct().as[String].collect().toSet
    val guesses = card.filter(col("gate") === "model")
      .select(col("guess")).distinct().as[String].collect().toSet
    assert(guesses.subsetOf(langs))
    card.unpersist()
  }
}
