package graft

import graft.operators.BpeOps
import org.apache.spark.sql.functions._

/** t16/t18 differential spec: the relational BPE merge loop vs an
  * INDEPENDENT driver-side reference implementation (symbol lists +
  * explicit greedy scan — no string replace, so a shared encoding bug
  * cannot hide). Plus the wrapped-encoding edge cases the object doc
  * claims, saturation, and the registered rows' invariants on sfTiny. */
class BpeOpsSpec extends SparkSpec {
  import spark.implicits._

  // ----- reference implementation: greedy BPE over symbol vectors -----

  private def refMergeWord(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2 // left-to-right, non-overlapping
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** (merge table, final segmentation) for word→freq under nMerges. */
  private def refTrain(freqs: Map[String, Long], nMerges: Int)
      : (Seq[(String, String, Long)], Map[String, Vector[String]]) = {
    var segs = freqs.keys.map(w => w -> w.map(_.toString).toVector).toMap
    val merges = Seq.newBuilder[(String, String, Long)]
    var step = 0
    var done = false
    while (step < nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, syms) <- segs; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + freqs(w)
      if (counts.isEmpty) done = true
      else {
        // count desc, pair lexicographic (on the space-joined pair — the
        // engine's sort key)
        val ((a, b), n) = counts.toSeq.minBy { case ((x, y), c) => (-c, s"$x $y") }
        merges += ((s"$a $b", a + b, n))
        segs = segs.map { case (w, s) => w -> refMergeWord(s, a, b) }
        step += 1
      }
    }
    (merges.result(), segs)
  }

  private def wordsDf(freqs: Map[String, Long]) =
    freqs.toSeq.toDF("word", "f")

  // ----- differential: engine loop vs reference on a Sennrich-style corpus -----

  test("trainBpe matches the independent reference merge-for-merge") {
    val freqs = Map("low" -> 5L, "lower" -> 2L, "lowest" -> 2L,
      "newer" -> 6L, "wider" -> 3L, "new" -> 2L)
    val got = BpeOps.trainBpe(wordsDf(freqs), nMerges = 12)
    val (want, _) = refTrain(freqs, 12)
    assert(got.map(m => (m.pair, m.merged, m.n)) === want)
    assert(got.map(_.step) === (1L to got.length.toLong))
  }

  test("trainBpeBatched: identical merge table to greedy, strictly fewer sweeps, on reference + corpus words") {
    // greedy fidelity on the Sennrich-style reference corpus
    val freqs = Map("low" -> 5L, "lower" -> 2L, "lowest" -> 2L,
      "newer" -> 6L, "wider" -> 3L, "new" -> 2L)
    val greedy = BpeOps.trainBpe(wordsDf(freqs), nMerges = 12)
    val (batched, sweeps) = BpeOps.trainBpeBatched(wordsDf(freqs),
      nMerges = 12)
    assert(batched === greedy,
      "the batched sweep deviated from greedy BPE semantics")
    assert(sweeps <= batched.size)
    // ...and on the real corpus slice, where the batching must PAY:
    // same table as the shipped trainer, in strictly fewer sweeps
    val words = BpeOps.sliceWords(
      graft.sources.Tables.documents(spark, sfTiny))
    val shipped = BpeOps.trainBpe(words, BpeOps.NMerges)
    val (fast, corpusSweeps) = BpeOps.trainBpeBatched(words, BpeOps.NMerges)
    assert(fast === shipped)
    assert(corpusSweeps < shipped.size,
      s"batching bought nothing: $corpusSweeps sweeps for " +
        s"${shipped.size} merges")
  }

  test("trainBpeBatched: saturation below nMerges does not over-count sweeps (r17 ADVICE)") {
    // one learnable merge, then the pair table is empty: the terminal
    // empty-window sweep must NOT count, or sweeps = merges + 1 and
    // bpeBatchedMerges' `sweeps <= m.size` guard fires on a correct
    // table whenever batching degenerates to one merge per sweep
    val (m, sweeps) = BpeOps.trainBpeBatched(
      wordsDf(Map("ab" -> 7L)), nMerges = 50)
    assert(m.map(x => (x.pair, x.merged, x.n)) === Seq(("a b", "ab", 7L)))
    assert(sweeps <= m.size,
      s"saturating corpus counted the empty terminal sweep: $sweeps sweeps" +
        s" for ${m.size} merges")
  }

  test("applyMerges reproduces the reference's final segmentation, including unseen words") {
    val freqs = Map("low" -> 5L, "lower" -> 2L, "newer" -> 6L, "wider" -> 3L)
    val merges = BpeOps.trainBpe(wordsDf(freqs), nMerges = 8)
    // score trained words AND words the training set never saw
    val apply = Map("low" -> 1L, "lower" -> 1L, "newest" -> 1L, "zap" -> 1L)
    val got = BpeOps.applyMerges(apply.keys.toSeq.toDF("word"), merges)
      .select(col("word"), BpeOps.symsOf(col("seg")).as("syms"))
      .as[(String, Seq[String])].collect().toMap
    val (refMerges, _) = refTrain(freqs, 8)
    var refSegs = apply.keys.map(w => w -> w.map(_.toString).toVector).toMap
    refMerges.foreach { case (pair, _, _) =>
      val Array(a, b) = pair.split(" ", 2)
      refSegs = refSegs.map { case (w, s) => w -> refMergeWord(s, a, b) }
    }
    assert(got.view.mapValues(_.toVector).toMap === refSegs)
    // a word sharing no merged pair stays fully char-split
    assert(got("zap") === Seq("z", "a", "p"))
  }

  // ----- wrapped-encoding edge cases (the object-doc claims) -----

  test("greedy non-overlap: aaa merges to (aa)(a), both ab occurrences merge in abab") {
    val merges = Seq(BpeOps.MergeRow(1L, "a a", "aa", 1L))
    val g1 = BpeOps.applyMerges(Seq("aaa").toDF("word"), merges)
      .select(BpeOps.symsOf(col("seg"))).as[Seq[String]].head()
    assert(g1 === Seq("aa", "a"))
    val m2 = Seq(BpeOps.MergeRow(1L, "a b", "ab", 1L))
    val g2 = BpeOps.applyMerges(Seq("abab").toDF("word"), m2)
      .select(BpeOps.symsOf(col("seg"))).as[Seq[String]].head()
    assert(g2 === Seq("ab", "ab"))
    // no false match across a symbol boundary: (ab)(c) does not contain (b)(c)
    val m3 = Seq(BpeOps.MergeRow(1L, "a b", "ab", 1L), BpeOps.MergeRow(2L, "b c", "bc", 1L))
    val g3 = BpeOps.applyMerges(Seq("abc").toDF("word"), m3)
      .select(BpeOps.symsOf(col("seg"))).as[Seq[String]].head()
    assert(g3 === Seq("ab", "c"))
  }

  test("tie-break is deterministic: count tie goes to the lexicographically smaller pair") {
    // "zx" and "ab" both appear exactly twice; "a b" < "z x"
    val freqs = Map("ab" -> 2L, "zx" -> 2L)
    val got = BpeOps.trainBpe(wordsDf(freqs), nMerges = 1)
    assert(got.head.pair === "a b")
  }

  test("saturation stops the loop early and the merge table is short") {
    val freqs = Map("ab" -> 3L)
    val got = BpeOps.trainBpe(wordsDf(freqs), nMerges = 50)
    assert(got.length === 1) // one merge exhausts every adjacent pair
    assert(got.head.merged === "ab")
  }

  // ----- full-alphabet coverage (r12 verdict ask #4) -----

  /** The spec-side twin of the engine's delimiter encoding. */
  private def enc(w: String): String =
    w.replace("(", BpeOps.SafeOpen).replace(")", BpeOps.SafeClose)
  private def dec(w: String): String =
    w.replace(BpeOps.SafeOpen, "(").replace(BpeOps.SafeClose, ")")

  test("full-alphabet training (digits/punct/parens/CJK/apostrophes) matches the reference") {
    // words the old [a-z]+ guard rejected outright — now first-class;
    // the reference runs over ENCODED words (the engine's tie-break
    // space), results compared decoded
    val freqs = Map("c3:p0" -> 4L, "(a1)" -> 3L, "a1+b2" -> 5L,
      "日本語" -> 4L, "日本" -> 3L, "don't" -> 2L,
      "((" -> 2L)
    val got = BpeOps.trainBpe(wordsDf(freqs), nMerges = 10)
    val (want, _) = refTrain(freqs.map { case (k, v) => enc(k) -> v }, 10)
    assert(got.map(m => (dec(m.pair), dec(m.merged), m.n)) ===
      want.map { case (p, m, n) => (dec(p), dec(m), n) })
    // and the apply path segments a paren-heavy unseen word correctly:
    // greedy left-to-right, no false match spanning the delimiters
    val parenMerge = Seq(BpeOps.MergeRow(1L, s"${enc("(")} ${enc("(")}",
      enc("(("), 1L))
    val segs = BpeOps.applyMerges(Seq("(((").toDF("word"), parenMerge)
      .select(BpeOps.symsOf(col("seg"))).as[Seq[String]].head()
    assert(segs.map(dec) === Seq("((", "("))
  }

  test("trainBpe rejects words containing the reserved PUA delimiters (encoding guard)") {
    val ex = intercept[Exception] {
      BpeOps.trainBpe(Seq(("a" + BpeOps.SafeOpen + "b", 2L))
        .toDF("word", "f"), nMerges = 1)
    }
    assert(ex.getMessage.contains("reserved codepoints"))
  }

  test("merge-table artifact stores TRUE symbol text (parens decoded at rest)") {
    val dir = java.nio.file.Files.createTempDirectory("bpe_art").toString
    val freqs = Map("((" -> 3L, "))" -> 2L)
    val merges = BpeOps.trainBpe(wordsDf(freqs), nMerges = 2)
    BpeOps.saveMerges(spark, merges, dir)
    val atRest = spark.read.parquet(dir).select("pair", "merged")
      .as[(String, String)].collect()
    assert(atRest.forall { case (p, m) =>
      !p.contains(BpeOps.SafeOpen) && !m.contains(BpeOps.SafeClose) })
    assert(atRest.exists { case (_, m) => m == "((" || m == "))" })
    // and the round-trip re-encodes: loaded == in-memory
    assert(BpeOps.loadMerges(spark, dir) === merges)
  }

  test("trainBpe leaves no persistent RDDs behind") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    BpeOps.trainBpe(wordsDf(Map("lower" -> 3L, "newer" -> 2L)), nMerges = 6)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert(after.diff(before).isEmpty)
  }

  // ----- registered rows on the sfTiny corpus -----

  test("t18 invariants on sfTiny: 1 <= pieces_per_word <= word length bound") {
    val df = BpeOps.bpeRetokenize(spark, sfTiny).cache()
    val n = df.count()
    assert(n > 0)
    // every word yields >= 1 piece and <= its char count; so per doc:
    // n_words <= n_bpe_tokens and ratio >= 1
    assert(df.filter(col("n_bpe_tokens") < col("n_words")).count() === 0)
    assert(df.filter(col("pieces_per_word") < 1.0).count() === 0)
    // the learned vocab compresses: overall ratio strictly below the
    // char-split ratio (sanity that merges actually applied)
    val meanPpw = df.agg(avg(col("pieces_per_word"))).as[Double].head()
    assert(meanPpw < 6.0 && meanPpw >= 1.0)
    df.unpersist()
  }

  test("t25: the pre-takedown tokenizer still serves inside the rollback window; the served table IS the shipped artifact") {
    import graft.api.ServePointer
    val out = BpeOps.bpeForget(spark, sfTiny).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(1) === 1L, "marker merge must be in the v1 table")
    assert(r.getLong(2) === 0L, "marker merge must leave the refit table")
    assert(r.getLong(3) === 1L, "served table must be the shipped artifact")
    assert(r.getLong(4) === 1L)
    assert(r.getLong(5) === 2L)
    val root = graft.sources.TmpDirs.artifactRoot(spark, sfTiny, "t25")
    val v1 = s"$root/tok_v1"; val v2 = s"$root/tok_v2"
    val ptr = s"$root/pointer"
    assert(ServePointer.history(ptr).map(_._1) === Seq(1, 2))
    // v1 protected in-window, offered for retirement only past it
    assert(ServePointer.retirable(ptr, Seq(v1, v2), keepLast = 2).isEmpty)
    assert(ServePointer.retirable(ptr, Seq(v1, v2), keepLast = 1) === Seq(v1))
    // the pre-takedown tokenizer still LOADS and APPLIES: its first
    // merges are the marker word's own collapse (the dominance proof),
    // and retokenizing under it still yields >= 1 piece per word
    val before = BpeOps.loadMerges(spark, v1)
    // the 4-symbol marker word collapses in exactly 3 merges, and the
    // dominance bound (R = C+1 > any organic pair count) makes all
    // three argmaxes marker pairs — so step 3's merged symbol IS the
    // whole marker word
    assert(before.take(3).map(_.merged).contains("zzqq"),
      "the plant must dominate the first argmaxes")
    // the served (current) table is merge-for-merge the shipped one
    val served = BpeOps.loadMerges(spark,
      ServePointer.current(ptr).get)
    assert(served === BpeOps.trainedMerges(spark, sfTiny))
    assert(served.forall(m => !m.merged.contains("zzqq")))
  }

  test("t20 card cross-foots with t18 and bounds its ratios") {
    val card = BpeOps.bpeCard(spark, sfTiny)
      .as[(String, Long, Long, Long, Double, Double)].collect()
    assert(card.nonEmpty)
    card.foreach { case (src, nd, nw, nb, ppw, clf) =>
      assert(nd > 0 && nw > 0, src)
      assert(nb >= nw, s"$src: a word yields >= 1 piece")
      assert(ppw >= 1.0, src)
      assert(clf >= 0.0 && clf <= 1.0, src)
    }
    // totals cross-foot with the per-doc t18 relation
    val t18 = BpeOps.bpeRetokenize(spark, sfTiny)
      .agg(sum(col("n_words")), sum(col("n_bpe_tokens")))
      .as[(Long, Long)].head()
    assert((card.map(_._3).sum, card.map(_._4).sum) === t18)
  }

  test("t21 fairness card: premiums anchored at 1.0, totals cross-foot with t20") {
    val card = BpeOps.bpeLangCard(spark, sfTiny)
      .as[(String, Long, Long, Long, Double, Double, Double)].collect()
    assert(card.nonEmpty)
    // exactly the best-compressed language sits at premium 1.0; all >= 1
    assert(card.map(_._7).min === 1.0)
    card.foreach { case (lang, _, _, _, ppw, _, prem) =>
      assert(prem >= 1.0, lang)
      assert(ppw >= 1.0, lang)
    }
    // the two cards partition the same token universe
    val t20Total = BpeOps.bpeCard(spark, sfTiny)
      .agg(sum(col("n_bpe_tokens"))).as[Long].head()
    assert(card.map(_._4).sum === t20Total)
  }

  test("saveMerges/loadMerges round-trips the table in training order") {
    val merges = BpeOps.trainBpe(
      Seq(("lower", 3L), ("newer", 2L)).toDF("word", "f"), nMerges = 6)
    val dir = java.nio.file.Files.createTempDirectory("bpe_rt").toString
    BpeOps.saveMerges(spark, merges, dir)
    assert(BpeOps.loadMerges(spark, dir) === merges)
    // loud on an empty store
    val empty = java.nio.file.Files.createTempDirectory("bpe_rt_e").toString
    BpeOps.saveMerges(spark, merges.take(0), empty)
    intercept[Exception] { BpeOps.loadMerges(spark, empty) }
    ()
  }

  test("t23 planted scripts observe non-trivial fairness values (closed form for zz_cjk)") {
    val rows = graft.operators.BpeOps.bpeScriptCard(spark, sfTiny)
      .collect().map(r => r.getString(0) -> r).toMap
    // every planted lang is present with exactly one doc
    Seq("zz_cjk", "zz_digit", "zz_punct", "zz_mixed").foreach { l =>
      assert(rows.contains(l), s"planted lang $l missing")
      assert(rows(l).getAs[Long]("n_docs") === 1L)
    }
    // The hard closed forms below are STRUCTURAL only while every
    // learned merge is pure [a-z] (today's corpus is [a-z ]-only at
    // every SF); a regenerated multi-script corpus could legitimately
    // learn digit/punct merges, so the guard keeps this spec from
    // failing a CORRECT engine there (the t23 ORACLE row stays valid
    // either way — both engines run the same relational computation).
    // zz_punct carries no hard value assertion at all: its words are
    // [a-z] bodies with punctuation, so merges CAN legitimately apply
    // (r14 review — the claim was corpus-dependent, not structural).
    // real-corpus rows unchanged by the plant: t21's card is a subset
    // projection of t23 on the shared langs (same tokenizer, same
    // words) except the premium denominator — compare ppw/frac
    val t21 = graft.operators.BpeOps.bpeLangCard(spark, sfTiny)
      .collect().map(r => r.getString(0) -> r).toMap
    t21.foreach { case (l, r) =>
      assert(rows(l).getAs[Double]("pieces_per_word") ===
        r.getAs[Double]("pieces_per_word"), s"$l ppw drifted")
      assert(rows(l).getAs[Double]("char_level_frac") ===
        r.getAs[Double]("char_level_frac"), s"$l frac drifted")
    }
    // (parity above runs regardless of the alphabet guard below)
    val latinOnly = graft.operators.BpeOps.trainedMerges(spark, sfTiny)
      .forall(_.merged.forall(c => c >= 'a' && c <= 'z'))
    // assume (not if): a non-latin-merge corpus CANCELS the closed-form
    // coverage visibly in the test report instead of silently shrinking
    // this test to presence checks (r14 review)
    assume(latinOnly,
      "corpus learned non-[a-z] merges — planted closed forms skipped; " +
        "re-derive the structural values for the new alphabet")
    // zz_cjk closed form: no [a-z]-only merge can apply inside a
    // CJK-only word, so its five 4-char words stay fully char-split
    val cjk = rows("zz_cjk")
    assert(cjk.getAs[Double]("pieces_per_word") === 4.0)
    assert(cjk.getAs[Double]("char_level_frac") === 1.0)
    assert(cjk.getAs[Double]("token_premium") > 1.0,
      "zz_cjk premium not > 1 — the fairness card is trivial again")
    // digit-only and no-adjacent-[a-z] words are merge-free too
    assert(rows("zz_digit").getAs[Double]("char_level_frac") === 1.0)
    assert(rows("zz_digit").getAs[Double]("token_premium") > 1.0)
    assert(rows("zz_mixed").getAs[Double]("char_level_frac") > 0.0)
  }

  test("t16 merge table on sfTiny is monotone in step with positive counts") {
    val m = BpeOps.bpeMerges(spark, sfTiny).as[(Long, String, String, Long)].collect()
    assert(m.nonEmpty && m.length <= BpeOps.NMerges)
    assert(m.map(_._1) === (1L to m.length.toLong).toArray)
    m.foreach { case (_, pair, merged, n) =>
      assert(n > 0); assert(pair.replace(" ", "") === merged)
    }
  }
}
