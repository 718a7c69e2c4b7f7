package graft

import graft.functions.TextFunctions
import graft.operators.DedupOps
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Quality invariants the rows-only MinHash check can't see: recall
  * against the exact 3-shingle Jaccard (every high-similarity pair must
  * be a candidate — the corpus has no exact duplicates, only near-dups)
  * and precision (candidates must actually be similar, not random
  * banding collisions). Deterministic: seeded hashes over fixed data. */
class DedupInvariantSpec extends SparkSpec {

  /** Exact 3-shingle Jaccard for all pairs at sf0.001 (500 docs — the
    * all-pairs join is test-scale only). */
  private lazy val shingleJaccard: Map[(Long, Long), Double] = {
    val sh = TextFunctions.withNgrams(
        Tables.documents(spark, sfTiny)
          .select(col("doc_id"), TextFunctions.tokens(col("text")).as("words")),
        "words", "shingles", 3)
      .select(col("doc_id"), explode(array_distinct(col("shingles"))).as("s"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("ni"))
      .join(sizes.select(col("doc_id").as("a_id"), col("n").as("na")), "a_id")
      .join(sizes.select(col("doc_id").as("b_id"), col("n").as("nb")), "b_id")
      .select(col("a_id"), col("b_id"),
        (col("ni") / (col("na") + col("nb") - col("ni"))).as("j"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
  }

  test("minhash recall: every pair with shingle-Jaccard ≥ 0.85 is a candidate") {
    val high = shingleJaccard.filter(_._2 >= 0.85).keySet
    assert(high.nonEmpty, "fixture should contain near-duplicate pairs")
    val candidates = DedupOps.minhashCandidates(spark, sfTiny)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = high -- candidates
    assert(missed.isEmpty, s"near-dup pairs missed by LSH: $missed")
  }

  test("minhash precision: candidates are genuinely similar pairs") {
    val candidates = DedupOps.minhashCandidates(spark, sfTiny)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(candidates.nonEmpty)
    val js = candidates.map(p => shingleJaccard.getOrElse(p, 0.0))
    assert(js.forall(_ >= 0.3),
      s"low-similarity candidate slipped through: min=${js.min}")
  }

  test("hyperplane LSH recalls planted near-twin embeddings") {
    import spark.implicits._
    // isotropic noise + 5 planted pairs at cos ≈ 0.99: with 4 bands × 8
    // planes, a 0.99-cosine pair matches at least one band with ~99%
    // probability — deterministic here (fixed planes, fixed data)
    val rnd = new scala.util.Random(11)
    val dim = graft.operators.EmbeddingOps.EmbeddingDim
    val noise = (0 until 200).map(i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val twins = (0 until 5).flatMap { p =>
      val v = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val w = v.map(x => x + 0.05f * rnd.nextGaussian().toFloat)
      Seq((1000L + 2 * p, v), (1001L + 2 * p, w))
    }
    val emb = (noise ++ twins).toDF("vec_id", "embedding")
    val got = graft.operators.EmbeddingOps.lshCandidates(emb)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = (0 until 5).count(p => got.contains((1000L + 2 * p, 1001L + 2 * p)))
    assert(found >= 4, s"LSH found only $found/5 planted twins: $got")
  }

  test("d11 incremental near-dup recalls every re-fetch through the stored index") {
    import spark.implicits._
    val got = DedupOps.incrementalNeardup(spark, sfTiny)
      .as[(Long, Long)].collect().toSeq
    // closed form: every even doc with id < 200 and >= 3 tokens
    val expectSrc = Tables.documents(spark, sfTiny)
      .filter(col("doc_id") % 2 === 0 && col("doc_id") < 200 &&
        size(filter(TextFunctions.tokens(col("text")), t => t =!= "")) >= 3)
      .select(col("doc_id")).as[Long].collect().sorted.toSeq
    assert(got.map(_._2).sorted === expectSrc)
    // every pair is (src + off, src) under one consistent offset
    assert(got.nonEmpty)
    val off = got.head._1 - got.head._2
    assert(got.forall { case (in, src) => in == src + off })
  }

  test("d12 containment is asymmetric: a quoted subset scores 1.0, its host scores fractionally") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma"),                                   // fully inside 2
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota"),
      (3L, "omicron sigma tau")                                   // disjoint
    ).toDF("doc_id", "text")
    val got = DedupOps.containmentPairsFrom(docs)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got((1L, 2L)) === 1.0, "subset doc must be fully contained in its host")
    assert(got((2L, 1L)) === 0.333333, "host containment is round(3/9, 6)")
    assert(!got.contains((3L, 1L)) && !got.contains((1L, 3L)),
      "disjoint docs share no terms, so no pair row")
  }

  test("exact dedup groups: keep_id is the min doc_id of each text group") {
    val got = DedupOps.exactDedup(spark, sfTiny)
    val agg = got.agg(sum(col("n_copies")).as("total")).collect().head.getLong(0)
    val nDocs = Tables.documents(spark, sfTiny).count()
    assert(agg === nDocs, "every doc belongs to exactly one hash group")
  }

  test("winnowing guarantee: a shared substring ≥ w+k-1 chars shares a fingerprint") {
    import spark.implicits._
    // Schleimer et al.: with k=5, w=8, any common substring of length
    // ≥ 12 must contribute at least one common selected fingerprint.
    // The shared span differs in position and surrounding text.
    val shared = "the quick brown fox jumps over the lazy dog"
    val docs = Seq(
      (1L, s"alpha beta gamma $shared delta epsilon"),
      (2L, s"unrelated prefix text here $shared and a different suffix"),
      (3L, "completely different content with no overlap at all whatsoever"))
      .toDF("doc_id", "text")
    val fps = graft.operators.TextOps.winnowFrom(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty,
      "docs sharing a 44-char substring must share a fingerprint")
    // and fingerprinting is selective: doc 3 shares nothing with doc 1
    assert((fps(1L) & fps(3L)).isEmpty)
  }

  test("simhash planted recall recovers every tokenized doc (d06 invariant)") {
    // same verification window as the production path — on a corpus with
    // ids past the window the full-corpus count would over-expect
    val expected = Tables.documents(spark, sfTiny)
      .filter(col("doc_id") < graft.operators.VerifyWindow.MaxId &&
        size(TextFunctions.tokens(col("text"))) >= 1).count()
    val got = DedupOps.simhashPlantedRecall(spark, sfTiny).count()
    assert(got === expected,
      s"d06 recovered $got of $expected planted simhash twins")
  }

  test("IVF planted recall lands every twin in its original's cell (e07 invariant)") {
    val expected = Tables.embeddings(spark, sfTiny).count()
    val got = graft.operators.EmbeddingOps.ivfPlantedRecall(spark, sfTiny).count()
    assert(got === expected,
      s"e07 recovered $got of $expected planted IVF twins")
  }

  test("d09 flags every planted eval leak (and anything else only via real overlap)") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfTiny)
      .select(col("doc_id"), size(TextFunctions.tokens(col("text"))).cast("long"))
      .as[(Long, Long)].collect()
    val maxId = docs.map(_._1).max
    val off = DedupOps.plantOffset(maxId)
    // eval docs with at least one 5-shingle MUST be recovered as leaks
    val leakable = docs.collect { case (id, n) if id % 97 == 0 && n >= 5 => id + off }.toSet
    val flagged = graft.operators.DedupOps.decontaminate(spark, sfTiny)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(leakable.subsetOf(flagged),
      s"missing planted leaks: ${leakable -- flagged}")
    // any flagged id beyond the real range must BE a planted leak
    assert(flagged.filter(_ > maxId).subsetOf(leakable))
  }

  test("e10 semantic dedup collapses each planted twin onto its original, keeps the rest") {
    import spark.implicits._
    val out = graft.operators.EmbeddingOps.semanticDedup(spark, sfTiny)
      .select(col("vec_id"), col("component"), col("keep"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val base = Tables.embeddings(spark, sfTiny)
      .select(col("vec_id")).as[Long].collect().toSet
    val maxId = base.max
    // every base vector is its own component representative
    out.filter { case (id, _, _) => id <= maxId }.foreach {
      case (id, comp, keep) =>
        assert(comp === id && keep === 1, s"base $id must keep itself")
    }
    // every planted copy collapsed onto a base id and was dropped
    out.filter { case (id, _, _) => id > maxId }.foreach {
      case (id, comp, keep) =>
        assert(base.contains(comp) && keep === 0,
          s"copy $id must collapse onto its original")
    }
    assert(out.count(_._3 == 1) === base.size)
  }

  test("d15 dup fraction matches an independent raw-text formulation") {
    import spark.implicits._
    val out = DedupOps.passageDupFraction(spark, sfTiny)
      .select(col("doc_id"), col("n_passages"), col("n_dup"))
      .as[(Long, Long, Long)]
      .collect()
    assert(out.nonEmpty)
    out.foreach { case (id, np, nd) =>
      assert(np >= 1 && nd >= 0 && nd <= np, s"doc $id: n_dup $nd of $np")
    }
    // independent reference: same slicing re-derived here, duplication
    // decided on the RAW passage text (no hashing) — an md5 bug or a
    // join/aggregation bug in the operator diverges from this
    val docs = Tables.documents(spark, sfTiny)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val inst = docs.flatMap { case (id, text) =>
      val ts = text.split(" ", -1)
      ts.grouped(20).map(g => id -> g.mkString(" ")).filter(_._2.nonEmpty)
    }
    val multi = inst.groupBy(_._2).filter(_._2.map(_._1).distinct.length >= 2)
      .keySet
    val want = inst.groupBy(_._1).map { case (id, ps) =>
      id -> (ps.length.toLong, ps.count(p => multi.contains(p._2)).toLong)
    }
    out.foreach { case (id, np, nd) =>
      assert(want(id) === ((np, nd)), s"doc $id: engine ($np,$nd) vs " +
        s"reference ${want(id)}")
    }
  }

  test("d16 boilerplate strip matches an independent raw-text formulation") {
    import spark.implicits._
    val out = DedupOps.boilerplateStrip(spark, sfTiny)
      .select(col("doc_id"), col("n_passages"), col("n_kept"),
        col("stripped_text"))
      .as[(Long, Long, Long, String)]
      .collect()
    assert(out.nonEmpty)
    // independent reference: same slicing re-derived here, boilerplate
    // decided on the RAW passage text (no hashing), docs reassembled in
    // passage order — an md5/join/sort bug in the operator diverges
    val docs = Tables.documents(spark, sfTiny)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val inst = docs.flatMap { case (id, text) =>
      text.split(" ", -1).grouped(20).zipWithIndex
        .map { case (g, i) => (id, i, g.mkString(" ")) }
        .filter(_._3.nonEmpty)
    }
    val boiler = inst.groupBy(_._3)
      .filter(_._2.map(_._1).distinct.length >= 3).keySet
    val want = inst.groupBy(_._1).map { case (id, ps) =>
      val kept = ps.sortBy(_._2).filterNot(p => boiler.contains(p._3))
      id -> ((ps.length.toLong, kept.length.toLong,
        kept.map(_._3).mkString(" ")))
    }
    out.foreach { case (id, np, nk, txt) =>
      assert(want(id) === ((np, nk, txt)),
        s"doc $id: engine ($np,$nk) diverges from the raw-text reference")
    }
    // the strip is a real transform on this corpus, not a no-op pass
    assert(out.exists { case (_, np, nk, _) => nk < np },
      "expected at least one document to lose a boilerplate passage")
  }

  test("d17 incremental passages: re-fetches fully known, novel docs mostly not") {
    import spark.implicits._
    val out = DedupOps.incrementalPassageDedup(spark, sfTiny)
      .select(col("doc_id"), col("n_passages"), col("n_known"),
        col("known_frac"))
      .as[(Long, Long, Long, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, np, nk, f) =>
      assert(np >= 1 && nk >= 0 && nk <= np, s"doc $id: $nk of $np")
      assert(f >= 0.0 && f <= 1.0)
    }
    val maxId = Tables.documents(spark, sfTiny)
      .agg(max(col("doc_id"))).head().getLong(0)
    // every planted re-fetch (shifted past the corpus ids) is FULLY
    // known — its passages are the stored doc's passages verbatim
    val refetch = out.filter(_._1 > maxId)
    assert(refetch.nonEmpty, "the scenario must contain re-fetches")
    refetch.foreach { case (id, _, _, f) =>
      assert(f === 1.0, s"re-fetched doc $id must be fully known, got $f")
    }
    // and the novel batch is NOT: organic passage overlap stays sparse
    val novel = out.filter(_._1 <= maxId)
    assert(novel.nonEmpty && novel.count(_._4 < 1.0) > novel.length / 2,
      "most novel docs must carry unseen passages")
  }

  test("e11 outlier flags agree with a driver-side cosine recomputation") {
    import spark.implicits._
    val out = graft.operators.EmbeddingOps.embeddingOutliers(spark, sfTiny)
      .select(col("vec_id"), col("label"), col("cos_centroid"),
        col("is_outlier"))
      .as[(Long, Int, Double, Int)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, _, c, o) =>
      assert(c >= -1.0 && c <= 1.0, s"vec $id cosine $c out of range")
      // the flag is a pure function of the rounded cosine
      assert(o === (if (c < -0.1) 1 else 0), s"vec $id flag inconsistent")
    }
    assert(out.exists(_._4 === 1), "corpus tail must flag some outliers")
    assert(out.count(_._4 === 1) < out.length / 4,
      "the gate must not flag a quarter of the corpus")
    // independent reference on raw floats for a sample of vectors
    val raw = graft.sources.Tables.embeddings(spark, sfTiny)
      .select(col("vec_id"), col("label"), col("embedding"))
      .as[(Long, Int, Array[Float])].collect()
    val byLabel = raw.groupBy(_._2)
    val centroids = byLabel.map { case (l, vs) =>
      val dim = vs.head._3.length
      l -> Array.tabulate(dim)(i => vs.map(_._3(i).toDouble).sum / vs.length)
    }
    raw.take(50).foreach { case (id, l, v) =>
      val m = centroids(l)
      val dot = v.zip(m).map { case (a, b) => a.toDouble * b }.sum
      val cos = dot / (math.sqrt(v.map(x => x.toDouble * x).sum) *
        math.sqrt(m.map(x => x * x).sum))
      val got = out.find(_._1 == id).get._3
      assert(math.abs(got - cos) < 1e-4,
        s"vec $id: engine $got vs reference $cos")
    }
  }

  test("d16 randomized: strip matches the raw reference on boundary-heavy corpora") {
    import spark.implicits._
    // seeded random corpus engineered around the 20-token slicing
    // boundaries: doc lengths cluster at 19/20/21/39/40/41 tokens, a
    // tiny vocabulary forces heavy passage collisions, and a planted
    // boilerplate block recurs verbatim in many docs
    val rnd = new scala.util.Random(20260814L)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    val block = Vector.fill(20)(vocab(0)).mkString(" ") // a whole passage
    val docs = (0L until 60L).map { id =>
      val len = Seq(19, 20, 21, 39, 40, 41)(rnd.nextInt(6))
      val body = Vector.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      // a third of the docs get the boilerplate block PREPENDED so it
      // aligns to passage 0 and recurs across >= 3 distinct docs
      val text = if (id % 3 == 0) block + " " + body else body
      (id, text)
    }
    val df = docs.toDF("doc_id", "text")
    val out = DedupOps.boilerplateStripFrom(df)
      .select(col("doc_id"), col("n_passages"), col("n_kept"),
        col("stripped_text"))
      .as[(Long, Long, Long, String)].collect()
    // raw-text reference, same slicing
    val inst = docs.flatMap { case (id, text) =>
      text.split(" ", -1).grouped(20).zipWithIndex
        .map { case (g, i) => (id, i, g.mkString(" ")) }
        .filter(_._3.nonEmpty)
    }
    val boiler = inst.groupBy(_._3)
      .filter(_._2.map(_._1).distinct.length >= 3).keySet
    val want = inst.groupBy(_._1).map { case (id, ps) =>
      val kept = ps.sortBy(_._2).filterNot(p => boiler.contains(p._3))
      id -> ((ps.length.toLong, kept.length.toLong,
        kept.map(_._3).mkString(" ")))
    }
    assert(out.length === want.size)
    out.foreach { case (id, np, nk, txt) =>
      assert(want(id) === ((np, nk, txt)), s"doc $id diverges")
    }
    // the planted block was actually stripped from every carrier
    assert(out.filter(_._1 % 3 == 0).forall { case (_, np, nk, _) => nk < np },
      "every planted-boilerplate carrier must lose its block")
  }

  test("q38 freqItems result is a superset of every true frequent item") {
    val out = graft.operators.Relational.freqItemsBound(spark, sfTiny)
    // the sketch's defining guarantee, asserted over the exact hitters
    val flags = out.select(col("in_sketch")).collect().map(_.getInt(0))
    assert(flags.nonEmpty && flags.forall(_ === 1))
  }

  test("d08 drops every re-submitted doc and keeps every novel one") {
    import spark.implicits._
    val kept = DedupOps.incrementalDedup(spark, sfTiny)
      .as[Long].collect().toSet
    val all = Tables.documents(spark, sfTiny)
      .select(col("doc_id")).as[Long].collect()
    val maxId = all.max
    // every re-submitted id (shifted beyond the real id range) is gone
    assert(kept.forall(_ <= maxId), "re-submitted content must be dropped")
    // every odd (novel) doc survives — the corpus has no exact dups (d01)
    val odd = all.filter(_ % 2 == 1).toSet
    assert(kept === odd, "novel incoming docs must all survive")
  }
}
