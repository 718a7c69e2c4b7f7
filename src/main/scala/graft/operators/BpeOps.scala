package graft.operators

import graft.QueryDef
import graft.functions.TextFunctions
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** t16/t18 — a LEARNED subword vocabulary (byte-pair encoding) and the
  * corpus retokenized with it (r11 verdict ask #1): until this round,
  * every token-denominated operator (t09 stats, p01/p06 packing, p09
  * budget draw, p11/p12 manifests) counted `bpePieces`, a fixed regex
  * approximation. A real pipeline TRAINS its tokenizer and bills every
  * budget decision in its units — t16 is that training loop, t18 the
  * unit of account it produces. Ref tie: the tokenize→DFM stage is the
  * reference engine's core (ref 02_build_models.R:161-170); the merge
  * loop itself is the Sennrich et al. 2016 BPE recipe in exact
  * relational form.
  *
  * Training (t16) is a DRIVER-ORCHESTRATED iteration — the M4/LdaSplitter
  * loop discipline: each step is one exact relational aggregation (pair
  * counts over the current segmentation, weighted by word frequency)
  * followed by a 1-row argmax collect (count desc, pair lexicographic —
  * deterministic tie-break) and one map-only re-segmentation of the
  * words table. Everything iterated over is VOCABULARY-scale — the
  * distinct-word relation, Heaps'-law sublinear in the corpus — so the
  * loop's cost is independent of corpus size once the single corpus
  * scan has built the word counts.
  *
  * Segmentation encoding: each symbol is individually wrapped,
  * `(s)(u)(b)`. Merging pair (a,b) is then the plain string replace
  * `(a)(b)` → `(ab)`, which both engines apply left-to-right
  * non-overlapping — EXACTLY greedy BPE merge semantics ("(a)(a)(a)"
  * merges to "(aa)(a)", never "(aa)(aa)"), with no false matches across
  * symbol boundaries ("(ab)(c)" does not contain "(b)(c)") and no
  * shared-delimiter misses ("(a)(b)(a)(b)" merges BOTH occurrences —
  * the classic space-separated encoding loses the second one to the
  * consumed boundary space).
  *
  * Alphabet (r12 verdict ask #4 — full coverage, not `[a-z]+`): words
  * are RAW whitespace tokens of the document text — digits,
  * punctuation, and non-Latin characters all reach the tokenizer (the
  * GPT-2-style posture: the tokenizer sees everything; nothing is
  * cleaned away before it). The parenthesis delimiters stay
  * unambiguous because segmentations live in a REMAPPED symbol space:
  * `'('`/`')'` translate 1:1 to the private-use chars U+E000/U+E001
  * on entry ([[segInit]]) and back on every user-facing surface (t16
  * rows, the saved artifact). Escaping instead of remapping would NOT
  * be safe — substring matching is context-free, so an escaped
  * pattern can false-match spanning an escape char (e.g. pattern
  * `(\()(\()` matches inside `(\(\()(\()` at offset 2) — while after
  * remapping the delimiters simply cannot occur in a symbol body and
  * the original proof holds verbatim. Input words containing the two
  * PUA chars themselves fail loudly (they are non-interchange
  * codepoints by definition; the guard names the restriction).
  * Tie-breaks order pairs in the ENCODED space — deterministic, and
  * the oracle computes in the same space so both engines agree.
  * `word` COLUMNS stay raw everywhere (join keys, output rows); only
  * `seg` is encoded. The whitespace split uses an EXPLICIT separator
  * class enumerated identically on both engines (Java `\s` and RE2
  * `\s` disagree on U+000B, and their `.` metachars disagree on the
  * line separators — see [[rawWords]]); after that split no
  * `.`-divergent codepoint can appear inside a word, so the per-char
  * wrap agrees too. Both regex engines treat `.`/`[^()]` as one BMP
  * codepoint over these strings; astral-plane symbols (surrogate
  * pairs) are outside the supported alphabet.
  *
  * The training corpus is a SEEDED SLICE (`doc_id % 5 == 0`): a 100 TB
  * deployment trains its tokenizer on a sample, then applies it
  * everywhere — which is why t18 retokenizes by REPLAYING the merge
  * table over the full corpus vocabulary (handles words the slice never
  * saw, the real BPE apply rule) instead of joining against the
  * training table's final state.
  *
  * Saturation: if no adjacent pair remains before `nMerges` steps, the
  * loop stops, the merge table is short, and the already-merged
  * segmentation still applies to the full vocabulary — and the ORACLE
  * degrades identically: each step joins its argmax CTE via
  * `LEFT JOIN ... ON TRUE` with a COALESCE back to the previous
  * segmentation, so an empty step-k argmax passes w{k}/a{k} through
  * UNCHANGED (every later argmax is then empty too — the merge-row
  * union ends at the same step, and the full-vocab segmentation arm
  * survives for every consumer oracle, exactly like the engine's
  * early stop + apply). A plain cross join here would instead EMPTY
  * every later CTE and hash-mismatch all eight consumer rows on any
  * corpus that saturates under `nMerges` (r12 ADVICE). The registered
  * row pins [[NMerges]] = 40, measured well under this corpus's
  * saturation point (~89 merges at every SF — the vocabulary is
  * SF-invariant); BpeOpsSpec pins the saturating case end-to-end.
  *
  * 100 TB shape: one corpus scan builds the sliced word counts (uniform
  * word-keyed hash agg, map-side combined); each merge step shuffles the
  * (pair, count) relation — VOCABULARY-scale, not corpus-scale — and
  * collects exactly one row (k-row model state, the allowed collect
  * class); t18's apply is a 40-deep codegen'd replace chain over the
  * distinct-word relation plus one size-guarded join
  * ([[graft.plans.SizeGuard.broadcastIfSmall]]) back to the token
  * stream. Nothing data-scale ever sits on the driver.
  */
object BpeOps {

  /** Registered merge count — well under the measured ~89-step
    * saturation of this corpus's 31-word vocabulary at every SF. */
  val NMerges = 40

  /** Training slice: every 5th document by id (seeded, SF-stable). */
  private val TrainMod = 5L

  /** `pair`/`merged` are in the ENCODED symbol space (see object doc);
    * [[decode]] / [[decodeStr]] translate back for user-facing rows and
    * the saved artifact. */
  final case class MergeRow(step: Long, pair: String, merged: String, n: Long)

  /** Encoded stand-ins for the two structural delimiters — private-use
    * codepoints, non-interchange by definition. */
  private[graft] val SafeOpen = "\uE000"
  private[graft] val SafeClose = "\uE001"

  /** Raw whitespace tokenization — the tokenizer's input surface (full
    * alphabet coverage; the clean chain does NOT gate what reaches BPE).
    * The separator class is EXPLICIT, not `\s`: Java `\s` includes
    * U+000B where RE2's does not, and Java `.` excludes the line
    * separators U+0085/U+2028/U+2029 where RE2's `.` excludes only
    * `\n` — enumerating the class on both engines makes the split
    * identical AND removes every `.`-divergent codepoint from word
    * bodies, so [[segInit]]'s per-char wrap cannot disagree either.
    * `array_remove` keeps the projection codegen'd (no lambda). */
  private[graft] def rawWords(text: Column): Column =
    array_remove(split(text, "[ \t\n\u000B\f\r\u0085\u2028\u2029]+"), "")

  /** Word → encoded symbol space: 1:1 translate of the delimiters, loud
    * failure on input that already contains the PUA stand-ins (the only
    * unsupported codepoints). Vocabulary-scale call sites only. */
  private def encodeWord(word: Column): Column =
    when(word.contains(SafeOpen) || word.contains(SafeClose),
      raise_error(concat(lit("bpe: word contains reserved codepoints " +
        "U+E000/U+E001 (the encoded delimiters): "), word)).cast("string"))
      .otherwise(translate(word, "()", SafeOpen + SafeClose))

  /** Encoded symbol text → true text (t16 rows, saved artifacts). */
  private def decode(c: Column): Column =
    translate(c, SafeOpen + SafeClose, "()")
  private def decodeStr(s: String): String =
    s.replace(SafeOpen, "(").replace(SafeClose, ")")
  private def encodeStr(s: String): String = {
    require(!s.contains(SafeOpen) && !s.contains(SafeClose),
      s"bpe: artifact symbol contains reserved codepoints U+E000/U+E001: $s")
    s.replace("(", SafeOpen).replace(")", SafeClose)
  }

  /** Initial segmentation: every character of the ENCODED word
    * individually wrapped — "scan" → "(s)(c)(a)(n)". */
  private def segInit(word: Column): Column =
    regexp_replace(encodeWord(word), "(.)", "($1)")

  /** Symbol list of a wrapped segmentation: strip the outer parens,
    * split on the ")(" boundaries. Pure string ops — no regex scan in
    * the hot path. */
  private[graft] def symsOf(seg: Column): Column =
    split(seg.substr(lit(2), length(seg) - 2), "\\)\\(")

  /** One merge applied to a segmentation column: the left-to-right
    * non-overlapping string replace IS the greedy BPE merge under the
    * wrapped encoding (see object doc). */
  private def mergeOnce(seg: Column, a: String, b: String): Column =
    replace(seg, lit(s"($a)($b)"), lit(s"($a$b)"))

  /** The sliced training word-frequency relation (word, f) — raw
    * whitespace words (full-alphabet coverage, see object doc).
    * `residue` selects the slice (doc_id % TrainMod): 0 is the shipped
    * tokenizer's slice, other residues are t22's retrain slices. */
  private[graft] def sliceWords(documents: DataFrame,
      residue: Long = 0L): DataFrame =
    documents
      .filter(col("doc_id") % TrainMod === residue)
      .select(explode(rawWords(col("text"))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("f"))

  /** localCheckpoint that releases the PREVIOUS iteration's checkpoint
    * blocks: the loop otherwise parks one (tiny) table per swap in the
    * block manager for the rest of the session (the SizeGuard advisory's
    * failure mode, preempted here). Returns the fresh RDD ids so the
    * next swap can release these. */
  private def swapCheckpoint(df: DataFrame,
      prev: Set[Int]): (DataFrame, Set[Int]) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet.toSet
    val out = df.localCheckpoint()
    val fresh = sc.getPersistentRDDs.keySet.toSet.diff(before)
    prev.foreach(id => sc.getPersistentRDDs.get(id)
      .foreach(_.unpersist(blocking = false)))
    (out, fresh)
  }

  /** Lineage-truncation cadence: the re-segmentation projections are
    * collapsed by Catalyst, so the only growth between swaps is plan
    * node count — 8 keeps both plan depth and checkpoint churn small. */
  private val SwapEvery = 8

  /** The BPE merge loop: `nMerges` iterations of exact relational pair
    * counting + deterministic argmax + map-only re-segmentation. Stops
    * early at saturation (no adjacent pair left). All intermediate
    * checkpoints are released before returning — the caller gets plain
    * driver-side model state (the merge table). */
  private[graft] def trainBpe(words0: DataFrame,
      nMerges: Int): Seq[MergeRow] = {
    var (words, live) = swapCheckpoint(
      words0.withColumn("seg", segInit(col("word"))), Set.empty)
    val merges = scala.collection.mutable.ArrayBuffer.empty[MergeRow]
    var step = 1
    var saturated = false
    while (step <= nMerges && !saturated) {
      val best = words
        .select(col("f"), symsOf(col("seg")).as("syms"))
        .filter(size(col("syms")) > 1)
        .select(col("f"),
          explode(TextFunctions.ngrams(col("syms"), 2)).as("pair"))
        .groupBy(col("pair"))
        .agg(sum(col("f")).as("n"))
        .orderBy(col("n").desc, col("pair"))
        .limit(1)
        .collect()
      if (best.isEmpty) saturated = true
      else {
        val pair = best(0).getString(0)
        val n = best(0).getLong(1)
        val Array(a, b) = pair.split(" ", 2)
        // the wrapped encoding is only unambiguous while symbol bodies
        // carry no structural delimiter and no ASCII space (the pair
        // string's own separator; [[rawWords]]' explicit split class
        // keeps it out of word bodies, and encodeWord keeps the
        // delimiters out) — fail loudly if the invariant is ever
        // broken upstream. The guard is exactly this TRUE ambiguity
        // set (r13 ADVICE): a broader isWhitespace check would reject
        // legitimate full-alphabet symbols containing Unicode spaces
        // the separator class deliberately leaves in word bodies
        // (U+1680, U+2000-U+200A, U+205F, U+3000, ...), crashing the
        // engine on input the oracle handles fine.
        require(!s"$a$b".exists(ch => ch == '(' || ch == ')' || ch == ' '),
          s"bpe: delimiter/separator inside encoded symbol pair '$pair'")
        merges += MergeRow(step.toLong, pair, a + b, n)
        words = words.withColumn("seg", mergeOnce(col("seg"), a, b))
        if (step % SwapEvery == 0) {
          val (w, l) = swapCheckpoint(words, live)
          words = w; live = l
        }
        step += 1
      }
    }
    // the merge table is the model; the training table's blocks are done
    val sc = words.sparkSession.sparkContext
    live.foreach(id => sc.getPersistentRDDs.get(id)
      .foreach(_.unpersist(blocking = false)))
    merges.toSeq
  }

  /** BATCHED-merge BPE training (r16 verdict ask #7 — the scale path
    * for the training LOOP itself): [[trainBpe]] pays one corpus-free
    * but cluster-round-trip aggregation PER MERGE; at a production
    * vocabulary (30-50k merges) that is 30-50k sweeps of
    * vocabulary-scale work whose cost is pure iteration latency. This
    * variant accepts SEVERAL merges per sweep from one ranked
    * pair-count window, with a guard that provably preserves greedy
    * semantics — the output merge table is IDENTICAL to
    * [[trainBpe]]'s, merge for merge, count for count:
    *
    *   - candidates are the top `window` pairs (count desc, pair lex —
    *     greedy's exact order); a candidate joins the batch when its
    *     two symbols AND its merged symbol are disjoint from every
    *     symbol a batch member touches (disjointness ⇒ applying the
    *     earlier batch merges cannot change its count, so it is still
    *     greedy's next pick among OLD pairs), it is not a self-pair
    *     (batch head excepted — see below), and its merged symbol is
    *     FRESH (not a previously learned symbol);
    *   - every scanned-but-rejected candidate's count feeds a bound D
    *     (together with the window-edge count, which dominates every
    *     pair below the window). A merge of (a,b) only creates or
    *     grows pairs touching a, b, or ab, and each such pair's count
    *     after the merge is bounded by the OLD count of a pair that
    *     overlaps {a, b, ab} — e.g. count(x,ab) ≤ old count(x,a),
    *     count(ab,y) ≤ old count(b,y) — and every such old pair was
    *     either rejected in the window (≤ D) or below it (≤ edge ≤ D).
    *     The two exceptions both get conservative handling: a SELF-pair
    *     (a,a) creates run pairs (aa,a) bounded only by its own count
    *     (so a self-pair may only lead the batch, never extend it),
    *     and a COLLIDING merged symbol (a+b equal to an earlier
    *     sweep's learned symbol) lets created occurrences stack on an
    *     existing pair's count (so a colliding head doubles the cut
    *     threshold to 2·D; colliding non-heads are rejected outright);
    *   - the batch prefix is then cut at counts ≤ D (≤ 2·D under a
    *     colliding head): everything kept strictly outranks anything
    *     greedy could newly prefer, ties included — an equal-count
    *     overlapping pair anywhere in the window feeds D and cuts the
    *     prefix below it. The sweep's top pair always survives (keeping
    *     only it IS plain greedy), so progress and saturation are
    *     unchanged.
    *
    * Within a sweep the kept pairs are applied in rank order (their
    * mutual disjointness makes the application order immaterial, and
    * rank order IS greedy's order among unchanged counts). Each sweep
    * costs ONE exact aggregation + a `window`-row collect instead of
    * one aggregation per merge.
    *
    * 100 TB shape: training input is the Heaps'-law distinct-word
    * relation either way; what this buys is sweep COUNT — the
    * driver-side iteration latency that dominates a large-vocabulary
    * train — while staying bit-identical to the greedy recipe (t24's
    * gate runs it against t16's own oracle). Returns (merges, sweeps
    * actually paid). */
  private[graft] def trainBpeBatched(words0: DataFrame, nMerges: Int,
      window: Int = 16): (Seq[MergeRow], Int) = {
    var (words, live) = swapCheckpoint(
      words0.withColumn("seg", segInit(col("word"))), Set.empty)
    val merges = scala.collection.mutable.ArrayBuffer.empty[MergeRow]
    var sweeps = 0
    var saturated = false
    while (merges.size < nMerges && !saturated) {
      val ranked = words
        .select(col("f"), symsOf(col("seg")).as("syms"))
        .filter(size(col("syms")) > 1)
        .select(col("f"),
          explode(TextFunctions.ngrams(col("syms"), 2)).as("pair"))
        .groupBy(col("pair"))
        .agg(sum(col("f")).as("n"))
        .orderBy(col("n").desc, col("pair"))
        .limit(window)
        .collect()
        .map(r => (r.getString(0), r.getLong(1)))
      // count only merge-PRODUCING sweeps (r17 ADVICE: on a saturating
      // corpus the final empty-window sweep would otherwise make
      // sweeps = merges + 1 when batching degenerates to one merge per
      // sweep, and the `sweeps <= m.size` guard would fire on a
      // correct merge table)
      if (ranked.isEmpty) saturated = true
      else {
        sweeps += 1
        val edge = if (ranked.length == window) ranked.last._2 else 0L
        val priorSymbols = merges.map(_.merged).toSet
        val used = scala.collection.mutable.Set.empty[String]
        val accepted =
          scala.collection.mutable.ArrayBuffer.empty[(String, String, String, Long)]
        var dBound = edge
        ranked.foreach { case (pair, n) =>
          val Array(a, b) = pair.split(" ", 2)
          require(!s"$a$b".exists(ch => ch == '(' || ch == ')' || ch == ' '),
            s"bpe: delimiter/separator inside encoded symbol pair '$pair'")
          val head = accepted.isEmpty
          val disjoint = !used.contains(a) && !used.contains(b) &&
            !used.contains(a + b)
          // non-head batch members must be non-self, fresh-symbol,
          // and symbol-disjoint (see the bound argument in the doc)
          if (head || (disjoint && a != b && !priorSymbols.contains(a + b)))
            { accepted += ((pair, a, b, n)); used ++= Seq(a, b, a + b) }
          else dBound = math.max(dBound, n)
        }
        // greedy-faithful prefix: the top pair always; the rest only
        // while STRICTLY above the bound on any grown/created pair
        // (doubled when the head's merged symbol collides with an
        // earlier learned symbol — created occurrences then stack on
        // an existing pair's count)
        val headSelf = accepted.head._2 == accepted.head._3
        val cut =
          if (priorSymbols.contains(accepted.head._2 + accepted.head._3))
            2 * dBound
          else dBound
        // a self-pair head creates run pairs bounded only by its own
        // count — it can never safely carry a batch behind it
        val kept =
          if (headSelf) accepted.take(1)
          else accepted.head +: accepted.tail.takeWhile(_._4 > cut)
        kept.take(nMerges - merges.size).foreach { case (pair, a, b, n) =>
          merges += MergeRow(merges.size + 1L, pair, a + b, n)
          words = words.withColumn("seg", mergeOnce(col("seg"), a, b))
        }
        if (sweeps % SwapEvery == 0) {
          val (w, l) = swapCheckpoint(words, live)
          words = w; live = l
        }
      }
    }
    val sc = words.sparkSession.sparkContext
    live.foreach(id => sc.getPersistentRDDs.get(id)
      .foreach(_.unpersist(blocking = false)))
    (merges.toSeq, sweeps)
  }

  /** Train once per (dataset, nMerges) and share across t16/t18/specs —
    * the merge table is k-row driver state, exactly what the
    * Intermediates memo exists for. SHIPS the batched trainer (r17
    * verdict ask #2): [[trainBpeBatched]] is greedy-PROVABLE —
    * bit-identical merge tables in strictly fewer sweeps — so every
    * learned-unit consumer (t16/t18–t23, p13/p14, s23, c05/c06) bills
    * through the scale path; t16's UNCHANGED DuckDB oracle recomputes
    * greedy independently, so the equality stays gated per run, and
    * the t24 spec additionally pins merge-for-merge equality against
    * [[trainBpe]] directly. */
  private[graft] def trainedMerges(s: SparkSession, d: String): Seq[MergeRow] =
    graft.api.Intermediates.memo(s, s"bpe_merges|$d|$NMerges") {
      trainBpeBatched(sliceWords(Tables.documents(s, d)), NMerges)._1
    }

  /** t22's RETRAIN-slice tokenizer (doc_id % TrainMod == `residue`) —
    * its own memo key, so the shipped tokenizer's materialization can
    * never stand in for it. Batched for the same reason as
    * [[trainedMerges]]. */
  private[graft] def retrainedMerges(s: SparkSession, d: String,
      residue: Long): Seq[MergeRow] =
    graft.api.Intermediates.memo(s, s"bpe_merges|$d|$NMerges|r$residue") {
      trainBpeBatched(sliceWords(Tables.documents(s, d), residue),
        NMerges)._1
    }

  /** Replay a merge table over any (word) relation — the BPE APPLY rule
    * (merges in training order), which handles words the training slice
    * never saw. A 40-deep replace chain collapses into one codegen'd
    * projection. */
  private[graft] def applyMerges(words: DataFrame,
      merges: Seq[MergeRow]): DataFrame =
    merges.foldLeft(words.withColumn("seg", segInit(col("word")))) {
      case (df, m) =>
        val Array(a, b) = m.pair.split(" ", 2)
        df.withColumn("seg", mergeOnce(col("seg"), a, b))
    }

  /** t24 — the BATCHED trainer under t16's own gate: the merge table
    * [[trainBpeBatched]] learns (several greedy-provable merges per
    * sweep) must be IDENTICAL to the one-merge-per-sweep table, so it
    * is registered against t16's unchanged oracle — a batching rule
    * that deviates from greedy semantics by one merge, one count, or
    * one tie-break breaks this hash. Its own memo key: the shipped
    * tokenizer's materialization can never stand in for it. */
  def bpeBatchedMerges(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (m, sweeps) = graft.api.Intermediates.memo(s,
      s"bpe_merges_batched|$d|$NMerges") {
      trainBpeBatched(sliceWords(Tables.documents(s, d)), NMerges)
    }
    require(sweeps <= m.size,
      "batched BPE training paid more sweeps than merges — the batch " +
        "guard degenerated below the one-merge-per-sweep baseline")
    m.toDF()
      .select(col("step"), decode(col("pair")).as("pair"),
        decode(col("merged")).as("merged"), col("n"))
      .orderBy(col("step"))
  }

  /** t16 — the learned merge table itself: (step, pair, merged, n),
    * decoded back to true symbol text. */
  def bpeMerges(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    trainedMerges(s, d).toDF()
      .select(col("step"), decode(col("pair")).as("pair"),
        decode(col("merged")).as("merged"), col("n"))
      .orderBy(col("step"))
  }

  /** Per-doc (n_words, n_bpe_tokens) under a given merge table — the
    * shared kernel of t18, t19, and p13's piece counts. `memoTag`
    * keys the SizeGuard materialization of the word→pieces relation:
    * t18 and t19 use DISTINCT tags even though their relations should
    * be content-identical, because sharing one would mask exactly the
    * save/load drift t19 exists to catch. */
  /** The size-guarded (word, n_sym) piece-count relation under a merge
    * table — the tokenizer's APPLY surface, shared by t18/t19/t20/p13
    * and the s23 stream-static join. */
  private[graft] def piecesFor(s: SparkSession, d: String,
      merges: Seq[MergeRow], memoTag: String): DataFrame =
    piecesForDocs(s, d, Tables.documents(s, d), merges, memoTag)

  /** As [[piecesFor]] over an ARBITRARY documents relation — t23 feeds
    * the planted multi-script union through the SAME apply surface the
    * shipped corpus uses (the BPE apply rule handles words the training
    * slice never saw; unseen-script words stay fully char-split, which
    * is exactly what the fairness card measures). */
  private[graft] def piecesForDocs(s: SparkSession, d: String,
      docs: DataFrame, merges: Seq[MergeRow], memoTag: String): DataFrame = {
    val words = docs
      .select(explode(rawWords(col("text"))).as("word"))
      .distinct()
    graft.plans.SizeGuard.broadcastIfSmall(
      applyMerges(words, merges)
        .select(col("word"),
          size(symsOf(col("seg"))).cast("long").as("n_sym")),
      s"${memoTag}_pieces|$d|$NMerges")
  }

  private def docPieceCounts(s: SparkSession, d: String,
      merges: Seq[MergeRow], memoTag: String): DataFrame =
    // session-shared materialization (optimization r19): the corpus
    // word-explode + pieces join + per-doc aggregation feeds t18, p13's
    // unit of account, AND c05's datasheet columns — it re-ran per
    // call. Keyed by the memoTag so t19's loaded-table twin keeps its
    // own relation (the save/load-drift isolation documented above).
    graft.api.Intermediates.memo(s, s"${memoTag}_doccounts|$d|$NMerges") {
      Tables.documents(s, d)
        .select(col("doc_id"),
          explode(rawWords(col("text"))).as("word"))
        .join(piecesFor(s, d, merges, memoTag), "word")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"),
          sum(col("n_sym")).as("n_bpe_tokens"))
        .localCheckpoint()
    }

  private def withRatio(counts: DataFrame): DataFrame =
    counts
      .select(col("doc_id"), col("n_words"), col("n_bpe_tokens"),
        round(col("n_bpe_tokens") / col("n_words"), 6).as("pieces_per_word"))
      .orderBy(col("doc_id"))

  /** t18 — the corpus retokenized under the learned vocabulary: per-doc
    * whitespace-word and BPE-piece counts plus the pieces-per-word
    * ratio (the compression the tokenizer actually achieves — the unit
    * of account the p-family would bill in). Zero-token docs drop on
    * both engines (t13's convention). */
  def bpeRetokenize(s: SparkSession, d: String): DataFrame =
    withRatio(docPieceCounts(s, d, trainedMerges(s, d), "t18"))

  /** (doc_id, n_tokens) in LEARNED-BPE units — p13's unit of account. */
  private[graft] def docBpeCounts(s: SparkSession, d: String): DataFrame =
    docPieceCounts(s, d, trainedMerges(s, d), "t18")
      .select(col("doc_id"), col("n_bpe_tokens").as("n_tokens"))

  // ---------------------------------------------------------------------
  // t19 — the tokenizer ARTIFACT round-trip: the merge table is what a
  // trainer actually ships next to its export shards (every worker
  // retokenizes with the SAME vocabulary, or token accounting drifts
  // between data and training). S7/S9's model-sink discipline applied
  // to the tokenizer: save the ordered merge table as parquet, load it
  // back, retokenize the corpus with the LOADED table, and emit t18's
  // exact relation — t18's oracle transfers verbatim, so a lossy save,
  // a step-order drift, or a dropped merge breaks the hash, not a
  // training run months later.
  // ---------------------------------------------------------------------

  /** Persist a merge table (ordered, one row per step). The artifact
    * stores TRUE symbol text (decoded) — the file a trainer ships must
    * read as the user's vocabulary, not the engine's internal
    * delimiter encoding; [[loadMerges]] re-encodes on the way in. */
  def saveMerges(s: SparkSession, merges: Seq[MergeRow], dir: String): Unit = {
    import s.implicits._
    merges.map(m => m.copy(pair = decodeStr(m.pair),
        merged = decodeStr(m.merged)))
      .toDF().coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** Load a merge table in training order. Loud on an empty/absent
    * store — applying zero merges would silently degrade every
    * consumer to char-level tokens. */
  def loadMerges(s: SparkSession, dir: String): Seq[MergeRow] = {
    import s.implicits._
    val rows = s.read.parquet(dir)
      .select(col("step"), col("pair"), col("merged"), col("n"))
      .orderBy(col("step"))
      .as[MergeRow].collect().toSeq
      .map(m => m.copy(pair = encodeStr(m.pair),
        merged = encodeStr(m.merged)))
    require(rows.nonEmpty, s"bpe: no merges under $dir")
    require(rows.map(_.step) == (1L to rows.length.toLong),
      s"bpe: merge table under $dir is not a dense 1..n step sequence")
    rows
  }

  def bpeRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dir = graft.sources.TmpDirs.registered(
      new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_t19_${s.sparkContext.applicationId}_" +
          Integer.toHexString(d.hashCode)).getAbsolutePath)
    saveMerges(s, trainedMerges(s, d), dir)
    withRatio(docPieceCounts(s, d, loadMerges(s, dir), "t19"))
  }

  // ---------------------------------------------------------------------
  // Oracle: the merge loop unrolled into generated CTEs — step k's argmax
  // (b{k}) is the exact relational twin of the engine's collect, and two
  // parallel segmentation chains advance per step: w{k} (the training
  // slice, feeds step k+1's pair counts) and a{k} (the FULL corpus
  // vocabulary, the t18 apply-replay). DuckDB's replace() is the same
  // left-to-right non-overlapping rule as Spark's, so the wrapped
  // encoding means both engines merge identically by construction.
  // Every CTE is AS MATERIALIZED: w{k} is referenced twice per step
  // (directly and via px/b), so inlining would expand the chain
  // EXPONENTIALLY (2^n scans of w0 — measured as an fd blow-up at
  // n=40); materialization makes the oracle the same linear loop the
  // engine runs.
  // ---------------------------------------------------------------------

  /** Raw whitespace token list ≙ [[rawWords]] (may contain '' entries —
    * filtered at use). */
  private val rawTokSql =
    "string_split_regex(text, " +
      "'[ \\t\\n\\x0B\\f\\r\\x{0085}\\x{2028}\\x{2029}]+')"

  /** Word → encoded-space initial segmentation ≙ [[segInit]]:
    * delimiters remapped to the PUA stand-ins (chr 57344/57345 =
    * U+E000/U+E001), then every codepoint wrapped. */
  private def segInitSql(word: String): String =
    s"regexp_replace(replace(replace($word, '(', chr(57344)), ')', " +
      s"chr(57345)), '(.)', '(\\1)', 'g')"

  /** Decode an encoded symbol string back to true text ≙ [[decode]]. */
  private def decodeSql(c: String): String =
    s"replace(replace($c, chr(57344), '('), chr(57345), ')')"

  /** CTE prefix w0..w{n}, a0..a{n}, b1..b{n} (no leading WITH).
    * Each step's w/a CTE takes its argmax via `LEFT JOIN b ON TRUE`
    * with COALESCE back to the unmerged seg, so saturation (empty b)
    * passes the chain through unchanged — see the object doc. */
  private def chainSql(n: Int): String = chainSql(n, "", 0L)

  /** As above, suffix-parametric (CTE names w{k}$sfx etc.) with a
    * selectable training-slice residue — t22 instantiates TWO chains
    * in one query (shipped tokenizer, "", residue 0; retrain slice,
    * "_b", residue 1). One generator: the merge recipe cannot drift
    * between the instantiations. `docsRel` selects the APPLY-side
    * vocabulary relation (a0) — training (w0) always reads the real
    * corpus; t23 applies the shipped tokenizer to its planted union. */
  private def chainSql(n: Int, sfx: String, residue: Long,
      docsRel: String = "documents"): String =
    chainSql(n, sfx, residue, docsRel, "documents")

  /** As above with a selectable TRAINING-side relation (w0) — t25
    * trains the pre-takedown tokenizer on the planted union, so the
    * oracle needs the one merge recipe instantiated over a corpus
    * other than `documents`. */
  private def chainSql(n: Int, sfx: String, residue: Long,
      docsRel: String, trainRel: String): String = {
    val base =
      s"""w0$sfx AS MATERIALIZED (
         |  SELECT word, CAST(count(*) AS BIGINT) AS f,
         |    ${segInitSql("word")} AS seg
         |  FROM (SELECT unnest($rawTokSql) AS word FROM $trainRel
         |        WHERE doc_id % $TrainMod = $residue) t
         |  WHERE word <> '' GROUP BY word),
         |a0$sfx AS MATERIALIZED (
         |  SELECT word, ${segInitSql("word")} AS seg
         |  FROM (SELECT DISTINCT unnest($rawTokSql) AS word
         |        FROM $docsRel) t
         |  WHERE word <> '')""".stripMargin
    val steps = (1 to n).map { k =>
      val p = k - 1
      s"""px$k$sfx AS (
         |  SELECT f, l, unnest(generate_series(1, len(l) - 1)) AS i
         |  FROM (SELECT f, regexp_extract_all(seg, '\\(([^()]+)\\)', 1) AS l
         |        FROM w$p$sfx)
         |  WHERE len(l) > 1),
         |b$k$sfx AS MATERIALIZED (
         |  SELECT l[i] || ' ' || l[i + 1] AS pair, CAST(sum(f) AS BIGINT) AS n
         |  FROM px$k$sfx GROUP BY 1 ORDER BY n DESC, pair LIMIT 1),
         |w$k$sfx AS MATERIALIZED (
         |  SELECT w.word, w.f, COALESCE(replace(w.seg,
         |    '(' || string_split(b.pair, ' ')[1] || ')(' ||
         |      string_split(b.pair, ' ')[2] || ')',
         |    '(' || replace(b.pair, ' ', '') || ')'), w.seg) AS seg
         |  FROM w$p$sfx w LEFT JOIN b$k$sfx b ON TRUE),
         |a$k$sfx AS MATERIALIZED (
         |  SELECT a.word, COALESCE(replace(a.seg,
         |    '(' || string_split(b.pair, ' ')[1] || ')(' ||
         |      string_split(b.pair, ' ')[2] || ')',
         |    '(' || replace(b.pair, ' ', '') || ')'), a.seg) AS seg
         |  FROM a$p$sfx a LEFT JOIN b$k$sfx b ON TRUE)""".stripMargin
    }
    (base +: steps).mkString(",\n")
  }

  private val bpeMergesSql = {
    val union = (1 to NMerges).map { k =>
      s"""SELECT CAST($k AS BIGINT) AS step, ${decodeSql("pair")} AS pair,
         |  ${decodeSql("replace(pair, ' ', '')")} AS merged, n
         |FROM b$k""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"WITH ${chainSql(NMerges)}\n$union\nORDER BY step"
  }

  /** t20 — the tokenizer AUDIT card (t14's audit discipline applied to
    * the tokenizer: every shipped model-ish artifact gets a card a
    * pipeline reads before trusting it): per SOURCE, doc/word/piece
    * counts, the achieved compression (pieces per word), and the
    * CHAR-LEVEL fraction — word instances whose segmentation is still
    * fully character-split, i.e. words the learned vocabulary knows
    * nothing about. A source whose char_level_frac is high is
    * out-of-domain for the tokenizer (its token budget is being
    * billed at the worst rate); that column is the signal a curation
    * pipeline uses to decide the tokenizer needs retraining before
    * the next export epoch.
    *
    * 100 TB shape: t18's token-stream ⋈ size-guarded pieces join plus
    * one sources-sized hash agg — nothing beyond shapes already
    * audited. */
  def bpeCard(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        explode(rawWords(col("text"))).as("word"))
      .join(piecesFor(s, d, trainedMerges(s, d), "t18"), "word")
      .groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_words"),
        sum(col("n_sym")).as("n_bpe_tokens"),
        sum(when(col("n_sym") === length(col("word")), 1L).otherwise(0L))
          .as("n_char_level"))
      .select(col("source"), col("n_docs"), col("n_words"),
        col("n_bpe_tokens"),
        round(col("n_bpe_tokens") / col("n_words"), 6).as("pieces_per_word"),
        round(col("n_char_level") / col("n_words"), 6).as("char_level_frac"))
      .orderBy(col("source"))

  /** t21 — tokenizer FAIRNESS card: t20's compression audit cut by the
    * ground-truth language instead of the source. Subword tokenizers
    * trained on one language's statistics bill other languages more
    * pieces per word — the widely-reported tokenizer-equity problem: a
    * language at 2× pieces_per_word pays 2× the per-document token
    * budget in every p-family decision (packing, quotas, manifests)
    * and gets half the effective context window. This card is the
    * audit a multilingual release publishes: per language, the
    * achieved compression, the char-level fraction, and the premium
    * relative to the best-compressed language (rounded ratio of
    * rounded ratios — deterministic cross-engine).
    *
    * 100 TB shape: identical to t20 (token stream ⋈ size-guarded
    * pieces, languages-sized agg) plus a 1-row broadcast of the best
    * compression — the m06 crossJoin pattern. */
  def bpeLangCard(s: SparkSession, d: String): DataFrame =
    langCardOver(Tables.documents(s, d),
      piecesFor(s, d, trainedMerges(s, d), "t18"))

  /** The t21 per-language roll-up over an arbitrary (doc_id, lang,
    * text) relation and pieces table — ONE kernel for t21 (shipped
    * corpus) and t23 (planted multi-script union), so the fairness
    * arithmetic cannot drift between them. */
  private def langCardOver(docs: DataFrame, pieces: DataFrame): DataFrame = {
    val per = docs
      .select(col("doc_id"), col("lang"),
        explode(rawWords(col("text"))).as("word"))
      .join(pieces, "word")
      .groupBy(col("lang"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_words"),
        sum(col("n_sym")).as("n_bpe_tokens"),
        sum(when(col("n_sym") === length(col("word")), 1L).otherwise(0L))
          .as("n_char_level"))
      .select(col("lang"), col("n_docs"), col("n_words"),
        col("n_bpe_tokens"),
        round(col("n_bpe_tokens") / col("n_words"), 6).as("pieces_per_word"),
        round(col("n_char_level") / col("n_words"), 6).as("char_level_frac"))
    val best = per.agg(min(col("pieces_per_word")).as("best_ppw"))
    per.crossJoin(broadcast(best))
      .select(col("lang"), col("n_docs"), col("n_words"),
        col("n_bpe_tokens"), col("pieces_per_word"), col("char_level_frac"),
        round(col("pieces_per_word") / col("best_ppw"), 6)
          .as("token_premium"))
      .orderBy(col("lang"))
  }

  /** The planted multi-script slice (r13 verdict ask #3): the shipped
    * corpus is `[a-z ]`-only at every SF, so t20/t21/t22 observe ~trivial
    * char-level fractions and premiums on real runs — the full-alphabet
    * machinery was proven only by spec fixtures. These deterministic
    * docs (CJK, digits, delimiter-bearing punctuation, mixed-script)
    * join the corpus IN-QUERY under fresh plantOffset ids and their own
    * lang codes, making the fairness family's numbers non-trivial at
    * every SF: no learned merge contains a non-[a-z] char, so zz_cjk's
    * words stay fully char-split — char_level_frac = 1, ppw = 4 (all
    * words are 4 chars), premium = 4/best > 1 structurally. ONE
    * definition feeds both the Scala literal relation and the oracle's
    * VALUES clause. */
  private[graft] val PlantedScriptDocs: Seq[(Long, String, String, String)] =
    Seq(
      (0L, "zz_cjk", "planted_script",
        "深度学习 自然语言 机器翻译 神经网络 模型训练"),
      (1L, "zz_digit", "planted_script", "2024 12345 678901 31415 99"),
      (2L, "zz_punct", "planted_script",
        "(alpha) beta, gamma! delta? (epsilon)"),
      (3L, "zz_mixed", "planted_script", "abc123 mixed2024 data-set v2.0"))

  /** documents ∪ the planted multi-script docs at plantOffset ids. */
  private def plantedUnionDocs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
    val off = DedupOps.plantOffset(DedupOps.maxIdOf(docs, "doc_id"))
    docs.unionByName(PlantedScriptDocs
      .map { case (i, lang, source, text) => (off + i, lang, source, text) }
      .toDF("doc_id", "lang", "source", "text"))
  }

  /** t23 — the fairness card over the planted multi-script union: t21's
    * exact roll-up (shared [[langCardOver]] kernel), fed by the SAME
    * shipped tokenizer applied to the union's vocabulary through
    * [[piecesForDocs]] (its own memo tag — the planted words must reach
    * the real apply chain, not t18's corpus-only materialization).
    * Training is untouched: the tokenizer is [[trainedMerges]] over the
    * real corpus slice, exactly the artifact t19 ships — t23 measures
    * how that artifact BILLS scripts it never saw, which is the
    * tokenizer-equity question.
    *
    * 100 TB shape: t21 plus four constant rows — nothing new. */
  def bpeScriptCard(s: SparkSession, d: String): DataFrame = {
    val union = plantedUnionDocs(s, d)
    langCardOver(union,
      piecesForDocs(s, d, union, trainedMerges(s, d), "t23"))
  }

  /** Chain + per-word piece counts + tokenized corpus, ending in
    * `t2 (doc_id, word)` ⋈ `pieces (word, n_sym)` — shared by the
    * t18/t19 oracle and p13's BPE-denominated budget draw. */
  private[graft] val docBpeCtesSql =
    s"""${chainSql(NMerges)},
       |pieces AS (
       |  SELECT word,
       |    CAST(len(regexp_extract_all(seg, '\\(([^()]+)\\)', 1)) AS BIGINT)
       |      AS n_sym
       |  FROM a$NMerges),
       |toks AS (SELECT doc_id, unnest($rawTokSql) AS word FROM documents),
       |t2 AS (SELECT doc_id, word FROM toks WHERE word <> '')""".stripMargin

  private val bpeRetokenizeSql =
    s"""WITH $docBpeCtesSql
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(n_sym) AS BIGINT) AS n_bpe_tokens,
       |  round(sum(n_sym) / count(*), 6) AS pieces_per_word
       |FROM t2 JOIN pieces USING (word)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  private val bpeCardSql =
    s"""WITH $docBpeCtesSql,
       |tw AS (SELECT d.source, t.doc_id, t.word, p.n_sym
       |       FROM t2 t JOIN pieces p USING (word)
       |       JOIN documents d ON d.doc_id = t.doc_id)
       |SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |  CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(n_sym) AS BIGINT) AS n_bpe_tokens,
       |  round(sum(n_sym) / count(*), 6) AS pieces_per_word,
       |  round(sum(CASE WHEN n_sym = length(word) THEN 1 ELSE 0 END)
       |        / count(*), 6) AS char_level_frac
       |FROM tw GROUP BY source ORDER BY source""".stripMargin

  private val bpeLangCardSql =
    s"""WITH $docBpeCtesSql,
       |tw AS (SELECT d.lang, t.doc_id, t.word, p.n_sym
       |       FROM t2 t JOIN pieces p USING (word)
       |       JOIN documents d ON d.doc_id = t.doc_id),
       |per AS (SELECT lang, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |          CAST(count(*) AS BIGINT) AS n_words,
       |          CAST(sum(n_sym) AS BIGINT) AS n_bpe_tokens,
       |          round(sum(n_sym) / count(*), 6) AS pieces_per_word,
       |          round(sum(CASE WHEN n_sym = length(word) THEN 1 ELSE 0 END)
       |                / count(*), 6) AS char_level_frac
       |        FROM tw GROUP BY lang),
       |best AS (SELECT min(pieces_per_word) AS best_ppw FROM per)
       |SELECT lang, n_docs, n_words, n_bpe_tokens, pieces_per_word,
       |  char_level_frac,
       |  round(pieces_per_word / best_ppw, 6) AS token_premium
       |FROM per, best ORDER BY lang""".stripMargin

  /** t22 — tokenizer RETRAIN-DRIFT card (closes the loop t20 opens:
    * t20's char_level_frac says "this tokenizer is going stale for
    * that source"; t22 quantifies what a retrain would actually
    * change BEFORE anyone re-bills historical budgets): a second
    * tokenizer is trained on a DIFFERENT seeded slice
    * (doc_id % 5 == 1 — a stand-in for "the next epoch's training
    * sample") and the full corpus is retokenized under both. Per
    * source: word count, token totals under the shipped and retrained
    * vocabularies, both compressions, and the retrain drift ratio —
    * the number that decides whether t19's shipped artifact can keep
    * billing the next export epoch (drift ≈ 1) or the unit itself
    * moved (c06's regex-vs-BPE audit, applied tokenizer-to-tokenizer).
    *
    * The shipped side shares t18's pieces materialization (same
    * tokenizer — sharing is correct); the retrain side gets its own
    * memo keys ([[retrainedMerges]], tag "t22b") so the shipped
    * materialization can never stand in for it (t19's lesson).
    *
    * 100 TB shape: one extra vocabulary-scale merge loop + one extra
    * size-guarded pieces relation; the corpus-scale token stream is
    * scanned once and joins two vocabulary-sized relations. */
  def bpeRetrainDrift(s: SparkSession, d: String): DataFrame = {
    val a = piecesFor(s, d, trainedMerges(s, d), "t18")
    val b = piecesFor(s, d, retrainedMerges(s, d, 1L), "t22b")
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        explode(rawWords(col("text"))).as("word"))
      .join(a.select(col("word"), col("n_sym").as("a_sym")), "word")
      .join(b.select(col("word"), col("n_sym").as("b_sym")), "word")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("a_sym")).as("tokens_shipped"),
        sum(col("b_sym")).as("tokens_retrain"))
      .select(col("source"), col("n_words"), col("tokens_shipped"),
        col("tokens_retrain"),
        round(col("tokens_shipped") / col("n_words"), 6).as("ppw_shipped"),
        round(col("tokens_retrain") / col("n_words"), 6).as("ppw_retrain"),
        round(col("tokens_retrain") / col("tokens_shipped"), 6)
          .as("retrain_drift"))
      .orderBy(col("source"))
  }

  private val bpeRetrainDriftSql =
    s"""WITH $docBpeCtesSql,
       |${chainSql(NMerges, "_b", 1L)},
       |pieces_b AS (
       |  SELECT word,
       |    CAST(len(regexp_extract_all(seg, '\\(([^()]+)\\)', 1)) AS BIGINT)
       |      AS n_sym
       |  FROM a${NMerges}_b),
       |tw AS (SELECT dd.source, t.word, pa.n_sym AS a_sym, pb.n_sym AS b_sym
       |       FROM t2 t JOIN pieces pa USING (word)
       |       JOIN pieces_b pb USING (word)
       |       JOIN documents dd ON dd.doc_id = t.doc_id)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(a_sym) AS BIGINT) AS tokens_shipped,
       |  CAST(sum(b_sym) AS BIGINT) AS tokens_retrain,
       |  round(sum(a_sym) / count(*), 6) AS ppw_shipped,
       |  round(sum(b_sym) / count(*), 6) AS ppw_retrain,
       |  round(sum(b_sym) / sum(a_sym), 6) AS retrain_drift
       |FROM tw GROUP BY source ORDER BY source""".stripMargin

  /** s43's oracle (built in here because [[chainSql]] is the private
    * merge-recipe generator): the per-source token metering PHASED
    * across the mid-drain tokenizer flip — phase 1 under the shipped
    * vocabulary (t16's chain), phase 2 under t22's retrained slice
    * (suffix `_b`, residue 1). Both chains come from the ONE
    * generator, so the oracle cannot drift from t16/t22; plain string
    * concatenation — the embedded fragments are already
    * margin-stripped. */
  private[graft] val tokenizerFlipPhasedSql: String =
    "WITH " + docBpeCtesSql + ",\n" +
      chainSql(NMerges, "_b", 1L) + ",\n" +
      "pieces_b AS (\n" +
      "  SELECT word,\n" +
      "    CAST(len(regexp_extract_all(seg, '\\(([^()]+)\\)', 1)) AS BIGINT)\n" +
      "      AS n_sym\n" +
      s"  FROM a${NMerges}_b),\n" +
      "tw1 AS (SELECT d.source, p.n_sym FROM t2 t JOIN pieces p USING (word)\n" +
      "        JOIN documents d ON d.doc_id = t.doc_id),\n" +
      "tw2 AS (SELECT d.source, p.n_sym FROM t2 t JOIN pieces_b p USING (word)\n" +
      "        JOIN documents d ON d.doc_id = t.doc_id),\n" +
      "p1 AS (SELECT CAST(1 AS BIGINT) AS phase, source,\n" +
      "  CAST(count(*) AS BIGINT) AS n_words,\n" +
      "  CAST(sum(n_sym) AS BIGINT) AS n_bpe_tokens,\n" +
      "  round(sum(n_sym) / count(*), 6) AS pieces_per_word\n" +
      "  FROM tw1 GROUP BY source),\n" +
      "p2 AS (SELECT CAST(2 AS BIGINT) AS phase, source,\n" +
      "  CAST(count(*) AS BIGINT) AS n_words,\n" +
      "  CAST(sum(n_sym) AS BIGINT) AS n_bpe_tokens,\n" +
      "  round(sum(n_sym) / count(*), 6) AS pieces_per_word\n" +
      "  FROM tw2 GROUP BY source)\n" +
      "SELECT * FROM p1 UNION ALL SELECT * FROM p2 ORDER BY phase, source"

  /** t25 — TOKENIZER-SURFACE right-to-be-forgotten (m18's refit loop
    * on the second fitted artifact the r18 verdict named: the merge
    * table was TRAINED on a corpus that included later-deleted docs,
    * and nothing witnessed a retrain): the pre-takedown tokenizer v1
    * is trained on documents ∪ one planted doc sitting ON the
    * training slice (doc_id = the plant offset — a power of ten,
    * divisible by [[TrainMod]]) whose text is the marker word `zzqq`
    * repeated C+1 times, C = the slice's total char count. Any
    * organic pair's weighted count is ≤ C (each adjacent-pair
    * instance consumes a character), so the marker word's pairs
    * dominate every argmax while any remain and the learned table
    * provably contains the merged symbol `zzqq` within 3 steps. The
    * takedown removes the doc; the retrain on survivors IS the
    * shipped [[trainedMerges]] artifact. Both tables are saved as
    * versioned dirs, adopted v1 → v2 through a [[graft.api
    * .ServePointer]] (s43's pointer-addressed tokenizer), and the
    * audit emits: marker membership in the LOADED v1 table vs the
    * pointer-resolved current table (both CLOSED-FORM — the oracle
    * re-runs the one [[chainSql]] recipe over the SQL-synthesized
    * union and over the survivors), merge-for-merge identity of the
    * served table with the shipped artifact, and v1 still protected
    * inside the rollback window.
    *
    * 100 TB shape: one extra vocabulary-scale merge loop (the refit's
    * cost floor — BPE statistics are corpus sums, exact unlearning
    * means retraining); the plant adds one doc whose token stream is
    * slice-sized; everything else is merge-table-sized pointer
    * arithmetic. */
  def bpeForget(s: SparkSession, d: String): DataFrame = {
    import graft.api.ServePointer
    import graft.operators.{DedupOps => DD}
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val off = DD.plantOffset(DD.maxIdOf(docs, "doc_id"))
    val c = docs.filter(col("doc_id") % TrainMod === 0)
      .agg(coalesce(sum(length(col("text"))), lit(0L))).head().getLong(0)
    val planted = s.range(1).select(lit(off).as("doc_id"),
      trim(repeat(lit("zzqq "), (c + 1).toInt)).as("text"))
    val vm1 = graft.api.Intermediates.memo(s, s"t25-merges|$d") {
      trainBpeBatched(sliceWords(docs.unionByName(planted)), NMerges)._1
    }
    val vm2 = trainedMerges(s, d) // survivors = the shipped artifact
    val root = graft.sources.TmpDirs.artifactRoot(s, d, "t25")
    val v1 = s"$root/tok_v1"
    val v2 = s"$root/tok_v2"
    val ptr = s"$root/pointer"
    if (!new java.io.File(s"$v1/_SUCCESS").isFile) saveMerges(s, vm1, v1)
    if (!new java.io.File(s"$v2/_SUCCESS").isFile) saveMerges(s, vm2, v2)
    val v2n = java.nio.file.Paths.get(v2).toAbsolutePath.normalize().toString
    if (!ServePointer.current(ptr).contains(v2n))
      ServePointer.adopt(ptr, v1) // replays keep the flip (s38 posture)
    ServePointer.adopt(ptr, v2)
    val served = loadMerges(s, ServePointer.current(ptr).getOrElse(
      sys.error(s"no adopted tokenizer under $ptr")))
    val before = loadMerges(s, v1)
    val inBefore = if (before.exists(_.merged == "zzqq")) 1L else 0L
    val inAfter = if (served.exists(_.merged == "zzqq")) 1L else 0L
    val servedIsRefit = if (served == vm2) 1L else 0L
    val priorProtected =
      if (ServePointer.retirable(ptr, Seq(v1, v2), keepLast = 2).isEmpty)
        1L else 0L
    val ptrVersion = ServePointer.history(ptr).last._1.toLong
    import s.implicits._
    Seq(("zzqq", inBefore, inAfter, servedIsRefit, priorProtected,
      ptrVersion)).toDF("term", "in_merges_before", "in_merges_after",
      "served_is_refit", "prior_protected", "ptr_version")
  }

  /** The merged-symbol projection of one generated chain's b-CTEs —
    * t25's membership probe surface. */
  private def mergedUnionSql(n: Int, sfx: String): String =
    (1 to n).map(k => s"SELECT replace(pair, ' ', '') AS m FROM b$k$sfx")
      .mkString("\n  UNION ALL ")

  /** t25's oracle: the union corpus synthesized in SQL (the same C+1
    * repeat arithmetic over the same slice census and plant-offset
    * id), the ONE merge recipe instantiated over it (suffix `_f`) and
    * over the survivors (the shipped chain), marker membership
    * computed from both tables' merged symbols; the pointer/serve
    * lifecycle stated as the bound frame (BpeOpsSpec pins the serve
    * identity). Plain concatenation — the fragments are already
    * margin-stripped. */
  private val bpeForgetSql: String =
    "WITH u_docs AS (\n" +
      "  SELECT doc_id, text FROM documents\n" +
      "  UNION ALL\n" +
      "  SELECT " + DedupOps.plantOffsetSql("doc_id", "documents") +
      " AS doc_id, trim(repeat('zzqq ', n)) AS text\n" +
      "  FROM (SELECT CAST(sum(length(text)) + 1 AS INT) AS n\n" +
      s"        FROM documents WHERE doc_id % $TrainMod = 0)),\n" +
      chainSql(NMerges, "_f", 0L, "u_docs", "u_docs") + ",\n" +
      chainSql(NMerges, "", 0L) + ",\n" +
      "m_f AS (" + mergedUnionSql(NMerges, "_f") + "),\n" +
      "m_s AS (" + mergedUnionSql(NMerges, "") + ")\n" +
      "SELECT 'zzqq' AS term,\n" +
      "  CAST(EXISTS(SELECT 1 FROM m_f WHERE m = 'zzqq') AS BIGINT)\n" +
      "    AS in_merges_before,\n" +
      "  CAST(EXISTS(SELECT 1 FROM m_s WHERE m = 'zzqq') AS BIGINT)\n" +
      "    AS in_merges_after,\n" +
      "  CAST(1 AS BIGINT) AS served_is_refit,\n" +
      "  CAST(1 AS BIGINT) AS prior_protected,\n" +
      "  CAST(2 AS BIGINT) AS ptr_version"

  /** t23's oracle: the planted union as a VALUES CTE (generated from
    * the SAME [[PlantedScriptDocs]] literal), the shipped tokenizer's
    * chain with the apply side reading the union, and t21's roll-up. */
  private val bpeScriptCardSql = {
    val values = PlantedScriptDocs.map { case (i, lang, source, text) =>
      s"($i, '$lang', '$source', '$text')"
    }.mkString(",\n         ")
    s"""WITH pl AS (
       |  SELECT ${DedupOps.plantOffsetSql("doc_id", "documents")} + v.i
       |      AS doc_id,
       |    v.lang, v.source, v.text
       |  FROM (VALUES $values) v(i, lang, source, text)),
       |pdocs AS (
       |  SELECT doc_id, lang, source, text FROM documents
       |  UNION ALL
       |  SELECT doc_id, lang, source, text FROM pl),
       |${chainSql(NMerges, "", 0L, "pdocs")},
       |pieces AS (
       |  SELECT word,
       |    CAST(len(regexp_extract_all(seg, '\\(([^()]+)\\)', 1)) AS BIGINT)
       |      AS n_sym
       |  FROM a$NMerges),
       |toks AS (SELECT doc_id, unnest($rawTokSql) AS word FROM pdocs),
       |t2 AS (SELECT doc_id, word FROM toks WHERE word <> ''),
       |tw AS (SELECT d.lang, t.doc_id, t.word, p.n_sym
       |       FROM t2 t JOIN pieces p USING (word)
       |       JOIN pdocs d ON d.doc_id = t.doc_id),
       |per AS (SELECT lang, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |          CAST(count(*) AS BIGINT) AS n_words,
       |          CAST(sum(n_sym) AS BIGINT) AS n_bpe_tokens,
       |          round(sum(n_sym) / count(*), 6) AS pieces_per_word,
       |          round(sum(CASE WHEN n_sym = length(word) THEN 1 ELSE 0 END)
       |                / count(*), 6) AS char_level_frac
       |        FROM tw GROUP BY lang),
       |best AS (SELECT min(pieces_per_word) AS best_ppw FROM per)
       |SELECT lang, n_docs, n_words, n_bpe_tokens, pieces_per_word,
       |  char_level_frac,
       |  round(pieces_per_word / best_ppw, 6) AS token_premium
       |FROM per, best ORDER BY lang""".stripMargin
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("t16_bpe_merges", bpeMerges, Some(bpeMergesSql)),
    // t24 learns the SAME table through the batched sweep — t16's
    // oracle verbatim, so greedy fidelity is hash-gated (see doc)
    QueryDef("t24_bpe_batched_merges", bpeBatchedMerges,
      Some(bpeMergesSql)),
    QueryDef("t18_bpe_retokenize", bpeRetokenize, Some(bpeRetokenizeSql)),
    // t19 emits t18's exact relation through the disk round-trip, so
    // the oracle transfers verbatim (the s22/p11 transfer discipline)
    QueryDef("t19_bpe_roundtrip", bpeRoundtrip, Some(bpeRetokenizeSql)),
    QueryDef("t20_bpe_card", bpeCard, Some(bpeCardSql)),
    QueryDef("t21_bpe_lang_card", bpeLangCard, Some(bpeLangCardSql)),
    QueryDef("t22_retrain_drift", bpeRetrainDrift, Some(bpeRetrainDriftSql)),
    QueryDef("t23_script_card", bpeScriptCard, Some(bpeScriptCardSql)),
    QueryDef("t25_bpe_forget", bpeForget, Some(bpeForgetSql)))
}
