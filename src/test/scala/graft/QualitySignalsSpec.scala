package graft

import graft.operators.{DedupOps, TextOps}
import org.apache.spark.sql.functions._

/** Invariants for the r7 quality-signal additions: passage-level dedup
  * (d13), unigram cross-entropy scoring (t13), and the planted
  * quality-classifier path (m15). The harness oracle pins the exact
  * values; these specs pin the properties that make the values RIGHT. */
class QualitySignalsSpec extends SparkSpec {

  test("d13: every reported passage recurs, and a planted shared passage is found") {
    val rep = DedupOps.passageDedup(spark, sfTiny).collect()
    assert(rep.nonEmpty, "corpus near-dups should share at least one passage")
    rep.foreach { r =>
      val (n, nd) = (r.getLong(r.fieldIndex("n_copies")),
        r.getLong(r.fieldIndex("n_docs")))
      assert(n > 1, "reported passages must recur")
      assert(nd <= n && nd >= 1, "doc spread bounded by copy count")
    }
    // hashes are distinct (one report row per passage)
    val hs = rep.map(_.getString(0))
    assert(hs.distinct.length === hs.length)
  }

  test("t13: cross-entropy is positive, bounded by the uniform-model rate, and token counts agree") {
    val rows = TextOps.unigramCe(spark, sfTiny).collect()
    assert(rows.length > 0)
    // a unigram model's per-token code length is in (0, log2 corpus_tokens]:
    // p(term) >= 1/total ⇒ -log2 p <= log2 total; p <= 1 ⇒ -log2 p >= 0
    val totalTokens = rows.map(_.getLong(1)).sum.toDouble
    val maxBits = math.log(totalTokens) / math.log(2.0)
    rows.foreach { r =>
      val bits = r.getDouble(2)
      assert(bits > 0.0 && bits <= maxBits + 1e-6,
        s"doc ${r.getLong(0)}: ce=$bits outside (0, $maxBits]")
    }
    // n_tokens matches the tokenizer the score averaged over
    val mismatch = TextOps.unigramCe(spark, sfTiny).as("c")
      .join(graft.sources.Tables.documents(spark, sfTiny)
        .select(col("doc_id"),
          size(graft.functions.TextFunctions.tokens(col("text")))
            .cast("long").as("nt")), "doc_id")
      .filter(col("n_tokens") =!= col("nt")).count()
    assert(mismatch === 0L)
  }

  test("t14 confusion card cross-foots with t05 and the corpus") {
    import spark.implicits._
    // r12 schema: (gate, lang, guess, n_docs, lang_share) — the
    // heuristic arm must still cross-foot with t05 exactly
    val card = graft.operators.TextOps.langConfusion(spark, sfTiny)
      .as[(String, String, String, Long, Double)].collect()
    assert(card.map(_._1).toSet === Set("heuristic", "model"))
    val heur = card.filter(_._1 == "heuristic")
    // heuristic-arm counts partition the corpus (every doc gets a guess)
    val total = graft.sources.Tables.documents(spark, sfTiny).count()
    assert(heur.map(_._4).sum === total)
    // shares sum to 1 within each (gate, true language)
    card.groupBy(r => (r._1, r._2)).foreach { case (key, rows) =>
      assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-3,
        s"$key shares do not partition")
    }
    // the heuristic arm must agree with t05's per-doc guesses exactly
    val want = graft.operators.TextOps.langGuess(spark, sfTiny)
      .join(graft.sources.Tables.documents(spark, sfTiny)
        .select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("lang"), col("lang_guess")).count()
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    heur.foreach { case (_, lang, guess, n, _) =>
      assert(want((lang, guess)) === n, s"($lang,$guess) diverges from t05")
    }
  }

  test("t15 bigram CE matches a driver-side model rebuild") {
    import spark.implicits._
    val out = graft.operators.TextOps.bigramCe(spark, sfTiny)
      .as[(Long, Long, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, n, ce) =>
      assert(n >= 1 && ce >= 0.0, s"doc $id: n=$n ce=$ce")
    }
    // independent reference: rebuild the bigram model and CE driver-side
    // (only the shared tokenizer is reused — the counting joins and the
    // log arithmetic under test are re-derived from scratch)
    val docs = graft.sources.Tables.documents(spark, sfTiny)
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("t"))
      .as[(Long, Seq[String])].collect()
    val bigrams = docs.flatMap { case (id, t) =>
      t.sliding(2).filter(_.length == 2)
        .map(p => (id, p.head, p.head + " " + p(1))).toSeq
    }
    val c2 = bigrams.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val c1 = bigrams.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val want = bigrams.groupBy(_._1).map { case (id, bs) =>
      val ce = -bs.map(b =>
        math.log(c2(b._3).toDouble / c1(b._2)) / math.log(2.0)).sum / bs.length
      id -> ((bs.length.toLong, ce))
    }
    out.foreach { case (id, n, ce) =>
      val (wn, wce) = want(id)
      assert(n === wn, s"doc $id bigram count")
      assert(math.abs(ce - wce) < 1e-4, s"doc $id: engine $ce vs ref $wce")
    }
  }

  test("t15 randomized: bigram CE matches the reference on a collision-heavy corpus") {
    import spark.implicits._
    // tiny vocabulary => nearly every bigram recurs; lengths include the
    // degenerate 1-token doc (no bigrams => absent from output)
    val rnd = new scala.util.Random(4242L)
    val vocab = Vector("x", "y", "z")
    val docs = (0L until 40L).map { id =>
      val len = 1 + rnd.nextInt(12)
      (id, Vector.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val out = graft.operators.TextOps.bigramCeFrom(docs.toDF("doc_id", "text"))
      .as[(Long, Long, Double)].collect()
    val bigrams = docs.flatMap { case (id, t) =>
      val ts = t.split(" ").filter(_.nonEmpty)
      ts.sliding(2).filter(_.length == 2)
        .map(p => (id, p(0), p(0) + " " + p(1))).toSeq
    }
    val c2 = bigrams.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val c1 = bigrams.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val want = bigrams.groupBy(_._1).map { case (id, bs) =>
      val ce = -bs.map(b =>
        math.log(c2(b._3).toDouble / c1(b._2)) / math.log(2.0)).sum / bs.length
      id -> ((bs.length.toLong, ce))
    }
    assert(out.length === want.size,
      "1-token docs must be absent, all others present")
    out.foreach { case (id, n, ce) =>
      val (wn, wce) = want(id)
      assert(n === wn && math.abs(ce - wce) < 1e-4, s"doc $id diverges")
    }
  }

  test("p10 DSIR weights match a driver-side rebuild and rank the target up") {
    import spark.implicits._
    val out = graft.operators.TextOps.dsirWeights(spark, sfTiny)
      .as[(Long, Long, Double)].collect()
    assert(out.nonEmpty)
    // independent reference: rebuild both smoothed unigram models
    val docs = graft.sources.Tables.documents(spark, sfTiny)
      .select(col("doc_id"), col("source"),
        graft.functions.TextFunctions.tokens(col("text")).as("t"))
      .as[(Long, String, Seq[String])].collect()
    val all = docs.flatMap(d => d._3.map(d._2 -> _))
    val cc = all.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val ct = all.filter(_._1 == "src0").groupBy(_._2)
      .view.mapValues(_.length.toLong).toMap.withDefaultValue(0L)
    val nC = all.length.toLong
    val nT = all.count(_._1 == "src0").toLong
    val v = cc.size.toLong
    def lg(x: Long): Double = math.log(x.toDouble) / math.log(2.0)
    val want = docs.map { case (id, _, ts) =>
      val w = ts.map(t =>
        lg(ct(t) + 1) + lg(nC + v) - lg(cc(t) + 1) - lg(nT + v)).sum / ts.length
      id -> ((ts.length.toLong, w))
    }.toMap
    out.foreach { case (id, n, w) =>
      val (wn, ww) = want(id)
      assert(n === wn && math.abs(w - ww) < 1e-4, s"doc $id diverges")
    }
    // the importance weight must rank the target domain ABOVE the rest
    // on average — the property resampling relies on
    val bySrc = docs.map(d => d._1 -> d._2).toMap
    val target = out.filter(r => bySrc(r._1) == "src0").map(_._3)
    val rest = out.filter(r => bySrc(r._1) != "src0").map(_._3)
    assert(target.sum / target.length > rest.sum / rest.length,
      "target-domain docs must score higher than the rest on average")
  }

  test("e12 centroid matrix is the exact upper triangle of label cosines") {
    import spark.implicits._
    val out = graft.operators.EmbeddingOps.centroidMatrix(spark, sfTiny)
      .as[(Int, Int, Double)].collect()
    val k = graft.sources.Tables.embeddings(spark, sfTiny)
      .select(col("label")).distinct().count().toInt
    assert(out.length === k * (k - 1) / 2, "must emit C(k,2) pairs")
    out.foreach { case (a, b, c) =>
      assert(a < b && c >= -1.0 && c <= 1.0)
    }
    // reference cosines from raw floats
    val raw = graft.sources.Tables.embeddings(spark, sfTiny)
      .select(col("label"), col("embedding"))
      .as[(Int, Array[Float])].collect()
    val cent = raw.groupBy(_._1).view.mapValues { vs =>
      val dim = vs.head._2.length
      Array.tabulate(dim)(i => vs.map(_._2(i).toDouble).sum / vs.length)
    }.toMap
    out.foreach { case (a, b, c) =>
      val (x, y) = (cent(a), cent(b))
      val cos = x.zip(y).map(p => p._1 * p._2).sum /
        (math.sqrt(x.map(v => v * v).sum) * math.sqrt(y.map(v => v * v).sum))
      assert(math.abs(c - cos) < 1e-4, s"pair ($a,$b): $c vs $cos")
    }
  }

  test("m15: the fitted classifier recovers every planted class") {
    val pred = graft.ml.MlQueries.classifierPlanted(spark, sfTiny)
      .withColumn("expected", col("doc_id") % 2)
      .filter(col("pred_class") =!= col("expected"))
    assert(pred.count() === 0L,
      "wide-margin separable fit must classify every point to its class")
  }

  test("m17: eval report matches the closed-form confusion of the " +
      "noisy-label plant") {
    import spark.implicits._
    val Array((tp, fp, fn, tn, acc, prec, rec, f1)) =
      graft.ml.MlQueries.classifierEval(spark, sfTiny)
        .as[(Long, Long, Long, Long, Double, Double, Double, Double)]
        .collect()
    // closed form: predictions are doc_id % 2 (m15's proof); eval labels
    // flip exactly on multiples of 7
    val ids = graft.sources.Tables.documents(spark, sfTiny)
      .select(col("doc_id")).as[Long].collect()
    val wantTp = ids.count(i => i % 2 == 1 && i % 7 != 0).toLong
    val wantFp = ids.count(i => i % 2 == 1 && i % 7 == 0).toLong
    val wantFn = ids.count(i => i % 2 == 0 && i % 7 == 0).toLong
    val wantTn = ids.count(i => i % 2 == 0 && i % 7 != 0).toLong
    assert((tp, fp, fn, tn) === ((wantTp, wantFp, wantFn, wantTn)))
    // the noise plant makes every confusion cell non-trivial
    assert(fp > 0 && fn > 0 && tp > 0 && tn > 0)
    // metric identities hold against the counts
    val n = (tp + fp + fn + tn).toDouble
    assert(math.abs(acc - (tp + tn) / n) < 1e-6)
    assert(math.abs(prec - tp.toDouble / (tp + fp)) < 1e-6)
    assert(math.abs(rec - tp.toDouble / (tp + fn)) < 1e-6)
    assert(math.abs(f1 - 2.0 * tp / (2 * tp + fp + fn)) < 1e-6)
  }

  test("m16: cross-validated best model recovers every planted class") {
    val pred = graft.ml.MlQueries.crossValPlanted(spark, sfTiny)
      .withColumn("expected", col("doc_id") % 2)
      .filter(col("pred_class") =!= col("expected"))
    assert(pred.count() === 0L,
      "every grid point separates the planted frame; so must the winner")
  }
}
