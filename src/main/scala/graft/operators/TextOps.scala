package graft.operators

import graft.QueryDef
import graft.expressions.StringArrayExpressions
import graft.functions.TextFunctions
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-pipeline operators over the documents table (SURVEY §2.7-2.8 +
  * training-data-pipeline extensions: quality scoring, language ID, token
  * counting). All pure Column expressions — codegen'd, zero UDFs, so the
  * whole stage stays inside WholeStageCodegen and scales linearly with
  * input splits (no shuffle until the aggregations).
  */
object TextOps {

  // DuckDB fragments shared with every text-chain oracle (single source
  // of truth in graft.oracle.DuckFragments).
  private val cleanSql = graft.oracle.DuckFragments.cleanSql
  private val tokListSql = graft.oracle.DuckFragments.tokListSql
  private def sqlStringList(ws: Seq[String]): String =
    graft.oracle.DuckFragments.sqlStringList(ws)

  /** Reference clean_text chain (ref 02_build_models.R:25-41). */
  def cleanDocs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), TextFunctions.cleanText(col("text")).as("cleaned"))
      .orderBy(col("doc_id"))

  private val cleanDocsSql =
    s"SELECT doc_id, $cleanSql AS cleaned FROM documents ORDER BY doc_id"

  /** Corpus term frequencies: tokenize → explode → count (SURVEY A6). */
  def wordCounts(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(TextFunctions.tokens(col("text"))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(50)

  private val wordCountsSql =
    s"""SELECT word, count(*) AS n
       |FROM (SELECT unnest($tokListSql) AS word FROM documents) t
       |WHERE word <> '' GROUP BY word ORDER BY n DESC, word LIMIT 50""".stripMargin

  /** Per-document top-5 TF-IDF terms — tidytext-style tf·log10(N/df)
    * weighting (ref 02_build_models.R:146-155, SURVEY T4/V6). Ranked by the
    * rounded score so both engines see identical sort keys. */
  def tfidfTop5(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val toks = docs.select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, "term").crossJoin(broadcast(n))
      .withColumn("tfidf", round(col("tf") * log10(col("n_docs") / col("df")), 6))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5)
      .select(col("doc_id"), col("term"), col("tfidf"), col("rnk"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  private val tfidfTop5Sql =
    s"""WITH toks AS (SELECT doc_id, unnest($tokListSql) AS term FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks WHERE term <> '' GROUP BY doc_id, term),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |n AS (SELECT count(*) AS n_docs FROM documents),
       |scored AS (SELECT tf.doc_id, tf.term,
       |  round(tf.tf * log10(n.n_docs / df.df), 6) AS tfidf
       |  FROM tf JOIN df USING (term) CROSS JOIN n),
       |ranked AS (SELECT doc_id, term, tfidf,
       |  row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk
       |  FROM scored)
       |SELECT doc_id, term, tfidf, rnk FROM ranked WHERE rnk <= 5
       |ORDER BY doc_id, rnk""".stripMargin

  /** Document quality scoring: token counts, alphabetic ratio, stopword
    * ratio, composite score — the length/punct/stopword heuristics a
    * training-data pipeline gates corpus quality on. */
  /** The t04/t05 scoring expressions as shared Columns — ONE Spark-side
    * definition consumed by docQuality, langGuess, and
    * PackOps.corpusPrep (c01), mirroring how the oracle side shares
    * docQualityInnerSql/langGuessInnerSql. Rounding points are part of
    * the definition: both engines round the ratio BEFORE it enters the
    * quality blend. */
  private[graft] object Score {
    // Raw (empties included) token split: the counting paths below never
    // materialize the filtered array, so the tokenizer's interpreted
    // empty-filter HOF is skipped — every count here is a codegen'd
    // ArrayCountIn probe (see StringArrayExpressions; "" is in none of
    // the word lists, so counting over the raw split is identical to
    // counting over TextFunctions.tokens).
    private val rawToks = split(TextFunctions.cleanText(col("text")), " ")
    private def ratio(num: org.apache.spark.sql.Column,
                      den: org.apache.spark.sql.Column) =
      round(num / when(den === 0, null).otherwise(den), 6)
    val nTokens =
      StringArrayExpressions.arrayCountNotIn(rawToks, Seq("")).cast("long")
    val nStop =
      StringArrayExpressions.arrayCountIn(rawToks, TextFunctions.stopWords)
        .cast("long")
    val alphaRatio =
      round(length(regexp_replace(lower(col("text")), "[^a-z]", "")) /
        when(length(col("text")) === 0, null).otherwise(length(col("text"))), 6)
    val stopRatio = ratio(nStop, nTokens)
    val qualityScore =
      round(lit(0.6) * alphaRatio + lit(0.4) * (lit(1.0) - stopRatio), 6)
    val markers = Seq("the", "a", "and", "of", "is")
    val nMarker =
      StringArrayExpressions.arrayCountIn(rawToks, markers).cast("long")
    val markerRatio = ratio(nMarker, nTokens)
    val langGuess = when(markerRatio >= 0.08, "en").otherwise("und")
  }

  def docQuality(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), Score.nTokens.as("n_tokens"),
        Score.nStop.as("n_stop"), Score.alphaRatio.as("alpha_ratio"),
        Score.stopRatio.as("stop_ratio"),
        Score.qualityScore.as("quality_score"))
      .orderBy(col("doc_id"))

  /** t04's scoring query without the final ORDER BY — reused as a
    * subquery by PackOps.qualityBuckets' oracle (p03), so both rows
    * score documents with the exact same SQL text. */
  private[graft] val docQualityInnerSql = {
    val stop = sqlStringList(TextFunctions.stopWords)
    s"""WITH q AS (
       |  SELECT doc_id,
       |    len(list_filter($tokListSql, x -> x <> '')) AS n_tokens,
       |    len(list_filter($tokListSql, x -> x IN ($stop))) AS n_stop,
       |    round(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) /
       |          nullif(length(text), 0), 6) AS alpha_ratio
       |  FROM documents)
       |SELECT doc_id, n_tokens, n_stop, alpha_ratio,
       |  round(n_stop / nullif(n_tokens, 0), 6) AS stop_ratio,
       |  round(0.6 * alpha_ratio +
       |        0.4 * (1.0 - round(n_stop / nullif(n_tokens, 0), 6)), 6) AS quality_score
       |FROM q""".stripMargin
  }

  private val docQualitySql = s"$docQualityInnerSql ORDER BY doc_id"

  /** Deterministic marker-word language heuristic (n-gram-free language ID
    * — training-data-pipeline extension). Scores English function-word
    * density; the heuristic itself is the declared operator. */
  def langGuess(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), Score.markerRatio.as("marker_ratio"),
        Score.langGuess.as("lang_guess"))
      .orderBy(col("doc_id"))

  /** t05's scoring query without the final ORDER BY — reused by
    * PackOps.corpusPrep's oracle (c01). */
  private[graft] val langGuessInnerSql = {
    val markers = sqlStringList(Seq("the", "a", "and", "of", "is"))
    s"""WITH q AS (
       |  SELECT doc_id,
       |    len(list_filter($tokListSql, x -> x <> '')) AS n_tokens,
       |    len(list_filter($tokListSql, x -> x IN ($markers))) AS n_marker
       |  FROM documents)
       |SELECT doc_id,
       |  round(n_marker / nullif(n_tokens, 0), 6) AS marker_ratio,
       |  CASE WHEN round(n_marker / nullif(n_tokens, 0), 6) >= 0.08
       |       THEN 'en' ELSE 'und' END AS lang_guess
       |FROM q""".stripMargin
  }

  private val langGuessSql = s"$langGuessInnerSql ORDER BY doc_id"

  // --------------------------------------------------------------------
  // t17 — TRAINED language ID: char-trigram Naive Bayes (r11 verdict
  // ask #2 — the model the t14 confusion card exists to justify).
  // Train and score are EXACT relational algebra over the lang-labeled
  // corpus, so unlike the heuristic this gate gets a full hash oracle:
  //   p(tg|lang) = (c(lang,tg)+1) / (N_lang + V)   (add-1 smoothing)
  //   score(doc,lang) = [Σ_tg k·ln(c+1) + ln(prior) − n_tri·ln(N_lang+V)]
  //                     / n_tri
  // The add-1 form makes unmatched (doc,lang) trigram pairs contribute
  // ln(0+1) = 0, so the scoring join is an INNER join on matched
  // trigrams plus a closed-form correction — never a doc×vocab frame.
  // Published score is the per-trigram MEAN log-prob (p10/t15's
  // discipline: means keep the 6dp rounding far from summation-order
  // ulp; a raw sum of magnitude ~10³ would not be). Argmax tie-break:
  // score desc, lang asc — deterministic on both engines.
  //
  // 100 TB shape: one corpus scan → trigram instances; model table is
  // (langs × trigram-vocab) — VOCABULARY-scale, size-guarded broadcast
  // ([[graft.plans.SizeGuard.broadcastIfSmall]]); the per-doc frame
  // crossJoins a LANGS-sized (constant, ~10¹) broadcast; argmax window
  // partitions by doc_id over n_langs rows. Nothing pairwise, nothing
  // data-scale on the driver.
  // --------------------------------------------------------------------

  /** Char-trigram instance relation (doc_id, lang, tg): explode the
    * POSITIONS, then slice with a plain projection `substr`. The
    * tempting one-liner — `transform(sequence(...), i => c.substr(i,
    * 3))` — re-evaluates the captured expression per lambda element,
    * and `c` here is the ~20-pass cleanText regex chain: measured 26s
    * at sf0.1 for what this shape does in ~1s. Position-explode keeps
    * every expression a once-per-row codegen'd projection (the clean
    * chain runs once per doc in the pre-Generate project, the substr
    * once per instance), the t08-fanout lesson applied to char grain.
    * Docs too short for one trigram drop (t13's zero-token convention;
    * DuckDB's generate_series drops identically). */
  private def charTriInstances(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("lang"),
        TextFunctions.cleanText(col("text")).as("c"))
      .select(col("doc_id"), col("lang"), col("c"),
        explode(when(length(col("c")) >= 3,
            sequence(lit(1), length(col("c")) - 2))
          .otherwise(array().cast("array<int>"))).as("i"))
      .select(col("doc_id"), col("lang"),
        col("c").substr(col("i"), lit(3)).as("tg"))

  /** (doc_id, lang_model, nb_logp, with the argmax already applied) —
    * shared by t17 and the t14 model arm. */
  private[graft] def langModelPred(s: SparkSession, d: String): DataFrame =
    // the PREDICTIONS are a session-shared materialization like the
    // instance relation below: THREE registered rows consume them per
    // sweep (t17, t14's model arm, c05's en_share column), and the
    // scoring chain (two corpus-keyed aggregations + the scoring join +
    // the per-doc argmax) re-ran on every call — the pairAttributed
    // memo-scope discipline applied here (optimization r19)
    graft.api.Intermediates.memo(s, s"t17_pred|$d") {
      langModelPredBuild(s, d).localCheckpoint()
    }

  // private[graft]: PlanAuditSpec pins the BUILD's plan shape (the
  // registered row's plan is the memoized checkpoint after r19)
  private[graft] def langModelPredBuild(s: SparkSession, d: String)
      : DataFrame = {
    val docs = Tables.documents(s, d)
    // the instance relation feeds FIVE subtrees (model counts, per-doc
    // counts, totals, vocab size, scoring join) — materialize it once
    // per (session, dataset), the DFM-subtree discipline
    val ti = graft.api.Intermediates.memo(s, s"t17_tri|$d") {
      charTriInstances(docs).localCheckpoint()
    }
    val m = ti.groupBy(col("lang"), col("tg")).agg(count(lit(1)).as("c"))
    val dt = ti.groupBy(col("doc_id"), col("tg")).agg(count(lit(1)).as("k"))
    val perDoc = ti.groupBy(col("doc_id")).agg(count(lit(1)).as("n_tri"))
    val consts = ti.agg(countDistinct(col("tg")).as("v"))
      .crossJoin(broadcast(docs.agg(count(lit(1)).as("n_all"))))
    val li = m.groupBy(col("lang")).agg(sum(col("c")).as("n_inst"))
      .join(docs.groupBy(col("lang")).agg(count(lit(1)).as("n_lang")), "lang")
      .crossJoin(broadcast(consts))
      .select(col("lang"), log(col("n_lang") / col("n_all")).as("prior"),
        log(col("n_inst") + col("v")).as("denom"))
    val matched = dt.join(graft.plans.SizeGuard.broadcastIfSmall(m, s"t17_model|$d"), "tg")
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("k") * log(col("c") + 1)).as("msum"))
    val scored = perDoc.crossJoin(broadcast(li))
      .join(matched, Seq("doc_id", "lang"), "left")
      .select(col("doc_id"), col("lang"),
        ((coalesce(col("msum"), lit(0.0)) + col("prior") -
          col("n_tri") * col("denom")) / col("n_tri")).as("score"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("lang"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("doc_id"), col("lang").as("lang_model"),
        round(col("score"), 6).as("nb_logp"))
  }

  def langModel(s: SparkSession, d: String): DataFrame =
    langModelPred(s, d).orderBy(col("doc_id"))

  /** CTE prefix (no leading WITH) ending in `pred` (rn = 1 is the
    * argmax) — shared by the t17 oracle and t14's model arm, the
    * docQualityInnerSql discipline. */
  private[graft] val langModelChainSql =
    s"""cl AS (SELECT doc_id, lang, $cleanSql AS c FROM documents),
       |ti AS (SELECT doc_id, lang, substr(c, i, 3) AS tg
       |       FROM (SELECT doc_id, lang, c,
       |               unnest(generate_series(1, length(c) - 2)) AS i
       |             FROM cl)),
       |m AS (SELECT lang, tg, count(*) AS c FROM ti GROUP BY 1, 2),
       |dt AS (SELECT doc_id, tg, count(*) AS k FROM ti GROUP BY 1, 2),
       |perdoc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tri
       |           FROM ti GROUP BY 1),
       |consts AS (SELECT (SELECT count(DISTINCT tg) FROM ti) AS v,
       |             (SELECT count(*) FROM documents) AS n_all),
       |li AS (SELECT m.lang, ln(p.n_lang / k.n_all) AS prior,
       |         ln(sum(m.c) + k.v) AS denom
       |       FROM m CROSS JOIN consts k
       |       JOIN (SELECT lang, count(*) AS n_lang FROM documents
       |             GROUP BY 1) p USING (lang)
       |       GROUP BY m.lang, p.n_lang, k.n_all, k.v),
       |matched AS (SELECT dt.doc_id, m.lang, sum(dt.k * ln(m.c + 1)) AS msum
       |            FROM dt JOIN m USING (tg) GROUP BY 1, 2),
       |scored AS (SELECT f.doc_id, f.lang,
       |             (COALESCE(mt.msum, 0) + f.prior - f.n_tri * f.denom)
       |               / f.n_tri AS score
       |           FROM (SELECT p.doc_id, p.n_tri, li.lang, li.prior,
       |                   li.denom
       |                 FROM perdoc p CROSS JOIN li) f
       |           LEFT JOIN matched mt
       |             ON mt.doc_id = f.doc_id AND mt.lang = f.lang),
       |pred AS (SELECT doc_id, lang AS lang_model,
       |           round(score, 6) AS nb_logp,
       |           row_number() OVER (PARTITION BY doc_id
       |                              ORDER BY score DESC, lang) AS rn
       |         FROM scored)""".stripMargin

  private val langModelSql =
    s"""WITH $langModelChainSql
       |SELECT doc_id, lang_model, nb_logp FROM pred WHERE rn = 1
       |ORDER BY doc_id""".stripMargin

  /** t14 — language-ID CONFUSION card, now auditing BOTH gates side by
    * side (r11 verdict ask #2): one row per (gate, true lang, guess)
    * with counts and the within-language share, gate ∈ {heuristic,
    * model}. This is the audit table a curation pipeline publishes
    * before trusting a language gate (c01/s19 threshold on the
    * heuristic): per-language recall and the confusion structure of the
    * marker-word heuristic and the trained t17 Naive Bayes are read off
    * the SAME card — the comparison the card existed to enable. Each
    * arm evaluates the exact shared definition its gate runs ([[Score]]
    * for t05/c01/s19, [[langModelPred]] for t17), so the card audits
    * what actually gates. Docs too short for one trigram have no model
    * prediction and drop from the model arm only (per-gate denominators
    * — honest about the model's coverage gap).
    *
    * 100 TB shape: the heuristic arm is one corpus scan → one hash
    * aggregation on the tiny (lang, guess) key space; the model arm
    * rides t17's scoring shape; the final joins are (gates × langs)-
    * sized broadcasts. Nothing data-scale shuffles beyond t17's own
    * aggregations. */
  def langConfusion(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val heur = docs
      .select(lit("heuristic").as("gate"), col("lang"),
        Score.langGuess.as("guess"))
    val model = langModelPred(s, d)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .select(lit("model").as("gate"), col("lang"),
        col("lang_model").as("guess"))
    val per = heur.unionByName(model)
      .groupBy(col("gate"), col("lang"), col("guess"))
      .agg(count(lit(1)).as("n_docs"))
    val byLang = per.groupBy(col("gate"), col("lang"))
      .agg(sum(col("n_docs")).as("lt"))
    per.join(broadcast(byLang), Seq("gate", "lang"))
      .select(col("gate"), col("lang"), col("guess"), col("n_docs"),
        round(col("n_docs") / col("lt"), 6).as("lang_share"))
      .orderBy(col("gate"), col("lang"), col("guess"))
  }

  private val langConfusionSql =
    s"""WITH $langModelChainSql,
       |hg AS ($langGuessInnerSql),
       |arms AS (
       |  SELECT 'heuristic' AS gate, d.lang, h.lang_guess AS guess
       |  FROM documents d JOIN hg h ON h.doc_id = d.doc_id
       |  UNION ALL
       |  SELECT 'model' AS gate, d.lang, p.lang_model AS guess
       |  FROM pred p JOIN documents d ON d.doc_id = p.doc_id
       |  WHERE p.rn = 1),
       |per AS (SELECT gate, lang, guess, CAST(count(*) AS BIGINT) AS n_docs
       |        FROM arms GROUP BY 1, 2, 3),
       |tot AS (SELECT gate, lang, sum(n_docs) AS lt FROM per GROUP BY 1, 2)
       |SELECT per.gate, per.lang, per.guess, per.n_docs,
       |  round(per.n_docs / t.lt, 6) AS lang_share
       |FROM per JOIN tot t USING (gate, lang)
       |ORDER BY gate, lang, guess""".stripMargin

  /** Bigram counts (SURVEY V1/V2 n-gram family; Spark side built from a
    * pure expression n-gram generator, DuckDB side via lead()). */
  def bigramCounts(s: SparkSession, d: String): DataFrame =
    TextFunctions.withNgrams(
        Tables.documents(s, d).select(TextFunctions.tokens(col("text")).as("words")),
        "words", "bigrams", 2)
      .select(explode(col("bigrams")).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(30)

  private val bigramCountsSql =
    s"""WITH t AS (SELECT doc_id, $tokListSql AS l FROM documents),
       |w AS (SELECT doc_id, generate_subscripts(l, 1) AS pos, unnest(l) AS word FROM t),
       |b AS (SELECT word || ' ' || lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS bigram
       |      FROM w WHERE word <> '')
       |SELECT bigram, count(*) AS n FROM b WHERE bigram IS NOT NULL
       |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 30""".stripMargin

  /** POS-filtered keyword extraction (SURVEY V8/P3 — the reference's
    * cleaned_text_1 stage, ref 02_build_models.R:69-85): rule-tag tokens,
    * keep NOUN+VERB, first-occurrence-distinct, ", "-join. The rule
    * tagger's CASE chain is identical on both engines. */
  def posKeywords(s: SparkSession, d: String): DataFrame =
    graft.text.PosStage.posKeywords(Tables.documents(s, d))
      .orderBy(col("doc_id"))

  private val posKeywordsSql = {
    val tag = graft.text.RulePosTagger.tagSql("w")
    s"""WITH t AS (SELECT doc_id, $tokListSql AS l FROM documents),
       |w AS (SELECT doc_id, generate_subscripts(l, 1) AS pos, unnest(l) AS w FROM t),
       |nv AS (SELECT doc_id, pos, w,
       |         row_number() OVER (PARTITION BY doc_id, w ORDER BY pos) AS rn
       |       FROM w WHERE w <> '' AND ($tag) IN ('NOUN', 'VERB')),
       |agg AS (SELECT doc_id, string_agg(w, ', ' ORDER BY pos) AS pos_keywords
       |        FROM nv WHERE rn = 1 GROUP BY doc_id)
       |SELECT d.doc_id, coalesce(a.pos_keywords, '') AS pos_keywords
       |FROM documents d LEFT JOIN agg a USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  /** Winnowing document fingerprints (Schleimer et al. 2003 — the
    * rolling-hash fingerprinting a plagiarism/near-dup pipeline keeps
    * per shard): hash every 5-char gram of the cleaned text, keep the
    * window minimum over each 8-gram window, emit distinct selected
    * hashes. Guarantees any shared substring ≥ 12 chars yields a shared
    * fingerprint. The gram hash is a base-32 polynomial over the char
    * codes mod 32 (injective over the post-clean `[a-z ]` alphabet:
    * ' '→0, 'a'..'z'→1..26) scrambled by a Knuth multiplicative step —
    * the polynomial is < 2^25, so multiplying by an odd 32-bit constant
    * mod 2^32 is collision-free AND overflow-safe in both engines, and
    * the scramble removes the positional bias a raw polynomial gives the
    * window-min (grams starting with low codes would otherwise dominate
    * the selected fingerprints). A LONG hash: the window min compares
    * 8-byte integers instead of 32-char md5 strings, and the per-gram
    * cost is 5 codegen'd ascii ops with zero allocation (md5 pays a
    * digest + hex-encode per gram). */
  def winnowFingerprints(s: SparkSession, d: String): DataFrame =
    winnowFrom(Tables.documents(s, d))

  /** Winnowing parameters shared by t08 and d19's verification grain:
    * k-char grams, window w ⇒ any shared substring of ≥ w + k − 1 = 12
    * chars yields a shared fingerprint (Schleimer et al. 2003, Thm 1). */
  private[graft] val WinnowK = 5
  private[graft] val WinnowW = 8

  /** The per-position k-gram hash relation (doc_id, pos, h) — d19's
    * VERIFICATION grain: the exact same gram hash the winnow kernel
    * selects minima from (base-32 polynomial × Knuth step, injective
    * over post-clean text, so hash equality IS substring equality),
    * but at EVERY position. Corpus-scale: only ever joined scoped to
    * candidate pairs (d19), never self-joined globally. Shape per the
    * r12 lesson: position-explode FIRST, then a plain projection
    * computes the hash (a transform() lambda would re-run the captured
    * clean chain per element). */
  private[operators] def gramHashes(documents: DataFrame): DataFrame = {
    val k = WinnowK
    val poly = (1 until k).foldLeft(
        (ascii(col("c").substr(col("pos"), lit(1))) % 32).cast("long")) {
      (acc, i) =>
        acc * 32L + (ascii(col("c").substr(col("pos") + lit(i), lit(1))) % 32)
          .cast("long")
    }
    graft.sources.Scans
      .widenForFanout(documents.select(col("doc_id"), col("text")), col("doc_id"))
      .select(col("doc_id"), TextFunctions.cleanText(col("text")).as("c"))
      .filter(length(col("c")) >= k)
      .select(col("doc_id"), col("c"),
        explode(sequence(lit(1), length(col("c")) - (k - 1))).as("pos"))
      // long positions: the published run offsets are BIGINT (oracle
      // parity — generate_series is int64 in DuckDB)
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        ((poly * 2654435761L) % 4294967296L).as("h"))
  }

  private[graft] def winnowFrom(documents: DataFrame): DataFrame =
    winnowFromUnordered(documents).orderBy(col("doc_id"), col("fp"))

  /** [[winnowFrom]] without the final sort — the STREAM-side variant
    * (a sort is illegal on an unaggregated stream; the selection is a
    * set, so ordering is presentation only). */
  private[graft] def winnowFromUnordered(documents: DataFrame): DataFrame =
    // Whole-doc codegen'd kernel ([[graft.expressions.WinnowFingerprints]]):
    // clean → per-doc fingerprint SET in one map-only pass — no
    // per-position row explosion, no window sort, no distinct exchange
    // (r8's relational shape shuffled ~300 narrow rows per doc through a
    // window + distinct; the kernel emits the identical selection
    // directly). Still widened before the CPU-heavy clean+winnow
    // projection so a narrow scan can't serialize the per-doc work onto
    // a handful of input splits.
    graft.sources.Scans
      .widenForFanout(documents.select(col("doc_id"), col("text")), col("doc_id"))
      .select(col("doc_id"),
        explode(graft.expressions.WinnowFingerprints.winnowFingerprints(
          TextFunctions.cleanText(col("text")), WinnowK, WinnowW)).as("fp"))

  /** Shared CTE prefix c/p/h/m/fps ≙ [[gramHashes]] (h{sfx}) and
    * [[winnowFrom]] (fps{sfx}) — ONE definition of the gram hash and
    * the window-min selection, composed by the t08 oracle, d19's
    * candidate + verification stages, and (rel/suffix-parametric, the
    * passage-CTE discipline) d23's planted union and d24's two-relation
    * incremental probe — a slicing/hash change breaks them together. */
  private[operators] def winnowCtesSqlFor(rel: String,
      sfx: String): String = {
    val k = WinnowK
    val poly = (1 until k).foldLeft("(ascii(substr(c, pos, 1)) % 32)::BIGINT") {
      (acc, i) => s"($acc) * 32 + (ascii(substr(c, pos + $i, 1)) % 32)::BIGINT"
    }
    val gramHash = s"(($poly) * 2654435761) % 4294967296"
    s"""c$sfx AS (SELECT doc_id, $cleanSql AS c FROM $rel),
       |p$sfx AS (SELECT doc_id, c, unnest(generate_series(1, length(c) - ${k - 1})) AS pos
       |      FROM c$sfx WHERE length(c) >= $k),
       |h$sfx AS (SELECT doc_id, pos, $gramHash AS h FROM p$sfx),
       |m$sfx AS (SELECT doc_id, pos, h,
       |        min(h) OVER (PARTITION BY doc_id ORDER BY pos
       |                     ROWS BETWEEN ${WinnowW - 1} PRECEDING AND CURRENT ROW) AS mh
       |      FROM h$sfx),
       |fps$sfx AS (SELECT DISTINCT doc_id, h AS fp FROM m$sfx WHERE h = mh)""".stripMargin
  }

  private[operators] val winnowCtesSql = winnowCtesSqlFor("documents", "")

  private val winnowFingerprintsSql =
    s"""WITH $winnowCtesSql
       |SELECT doc_id, fp FROM fps
       |ORDER BY doc_id, fp""".stripMargin

  /** Token-count statistics: whitespace tokens, BPE-style pre-tokenizer
    * pieces (letter runs / digit runs / single punctuation — the GPT-2
    * pre-tokenization shape), and character length — the per-doc budget
    * numbers a training-data pipeline bills by. */
  def tokenStats(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        // codegen'd non-empty count over the raw split (no filter HOF)
        StringArrayExpressions.arrayCountNotIn(
          split(TextFunctions.cleanText(col("text")), " "), Seq(""))
          .cast("long").as("ws_tokens"),
        // regexp_count: counting must not materialize the match array
        regexp_count(lower(col("text")),
          lit("[a-z]+|[0-9]+|[^a-z0-9\\s]")).cast("long").as("bpe_pieces"),
        length(col("text")).cast("long").as("n_chars"))
      .orderBy(col("doc_id"))

  private val tokenStatsSql =
    s"""SELECT doc_id,
       |  len(list_filter($tokListSql, x -> x <> '')) AS ws_tokens,
       |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS bpe_pieces,
       |  length(text) AS n_chars
       |FROM documents ORDER BY doc_id""".stripMargin

  /** t10 — repetition statistics, the Gopher-style quality filters for
    * machine-generated/boilerplate text: fraction of duplicate tokens,
    * fraction of duplicate bigrams, and the most-frequent token's share.
    * One tokenize pass (checkpointed) feeds the array-side counts and
    * the relational mode computation; empty docs yield NULL fractions
    * (no tokens to judge), single-token docs NULL bigram fraction. */
  def repetitionStats(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("ts"))
      .localCheckpoint()
    val arrays = base
      .withColumn("bg", TextFunctions.ngrams(col("ts"), 2))
      .select(col("doc_id"),
        size(col("ts")).as("n"), size(array_distinct(col("ts"))).as("nd"),
        size(col("bg")).as("nb"), size(array_distinct(col("bg"))).as("nbd"))
    val top = base.select(col("doc_id"), explode(col("ts")).as("t"))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("maxc"), sum(col("c")).as("ntok"))
    arrays.join(top, Seq("doc_id"), "left")
      .select(col("doc_id"),
        round(lit(1.0) - col("nd") / expr("nullif(n, 0)"), 6).as("dup_token_frac"),
        round(lit(1.0) - col("nbd") / expr("nullif(nb, 0)"), 6).as("dup_bigram_frac"),
        round(col("maxc") / expr("nullif(ntok, 0)"), 6).as("top_token_frac"))
      .orderBy(col("doc_id"))
  }

  private val repetitionStatsSql =
    s"""WITH t AS (SELECT doc_id, list_filter($tokListSql, x -> x <> '') AS l
       |           FROM documents),
       |base AS (SELECT doc_id, len(l) AS n, len(list_distinct(l)) AS nd FROM t),
       |w AS (SELECT doc_id, generate_subscripts(l, 1) AS pos, unnest(l) AS word
       |      FROM t),
       |bg AS (SELECT doc_id,
       |         word || ' ' || lead(word) OVER (PARTITION BY doc_id ORDER BY pos)
       |           AS bigram
       |       FROM w),
       |bga AS (SELECT doc_id, count(bigram) AS nb,
       |          count(DISTINCT bigram) AS nbd
       |        FROM bg GROUP BY doc_id),
       |cnt AS (SELECT doc_id, word, count(*) AS c FROM w GROUP BY 1, 2),
       |top AS (SELECT doc_id, max(c) AS maxc, sum(c) AS ntok FROM cnt GROUP BY 1)
       |SELECT b.doc_id,
       |  round(1 - nd / nullif(n, 0), 6) AS dup_token_frac,
       |  round(1 - nbd / nullif(nb, 0), 6) AS dup_bigram_frac,
       |  round(maxc / nullif(ntok, 0), 6) AS top_token_frac
       |FROM base b LEFT JOIN bga USING (doc_id) LEFT JOIN top USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  // PII patterns shared by both engines: Java regex and DuckDB's RE2
  // agree on this subset (character classes, +, {n,}, alternation —
  // no lookaround, no \b).
  private val UrlRe = "https?://[^ ]+"
  private val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val PhoneRe = "555-[0-9]{3,4}"

  /** t11 — PII redaction (email/phone/URL → typed tags), the scrub pass
    * every published training corpus needs. The corpus is synthetic and
    * PII-free, so deterministic PII is planted INLINE from doc_id
    * (contact line with an address, a 555 number, and a URL) before
    * redaction — the oracle therefore exercises real replacements on
    * every row instead of hashing an identity transform. URL first
    * (addresses can appear inside query strings), then email, then
    * phone. Pure codegen'd Column regexps — no UDFs. */
  def redactPii(s: SparkSession, d: String): DataFrame = {
    // lpad keeps the phone ≥ 3 digits for low ids (PhoneRe needs {3,4})
    val pii = concat(col("text"),
      lit(" contact: user"), col("doc_id").cast("string"),
      lit("@mail.example.com"),
      lit(" phone 555-"), lpad((col("doc_id") % 1000).cast("string"), 3, "0"),
      lit(" via https://site"), (col("doc_id") % 7).cast("string"),
      lit(".example.org/u?user"), col("doc_id").cast("string"), lit("@x.co"))
    Tables.documents(s, d)
      .withColumn("pii_text", pii)
      .withColumn("redacted",
        regexp_replace(regexp_replace(regexp_replace(col("pii_text"),
          UrlRe, "<URL>"), EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>"))
      // count TAGS in the redacted output, not raw pattern hits: the
      // email inside the planted URL is consumed by the URL replacement,
      // so counting patterns independently double-counts it
      .select(col("doc_id"), col("redacted"),
        regexp_count(col("redacted"), lit("<URL>|<EMAIL>|<PHONE>"))
          .cast("long").as("n_pii"))
      .orderBy(col("doc_id"))
  }

  private val redactPiiSql =
    s"""WITH p AS (
       |  SELECT doc_id,
       |    text || ' contact: user' || CAST(doc_id AS VARCHAR) ||
       |    '@mail.example.com' ||
       |    ' phone 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') ||
       |    ' via https://site' || CAST(doc_id % 7 AS VARCHAR) ||
       |    '.example.org/u?user' || CAST(doc_id AS VARCHAR) || '@x.co' AS pii_text
       |  FROM documents),
       |r AS (
       |  SELECT doc_id,
       |    regexp_replace(regexp_replace(regexp_replace(pii_text,
       |      'https?://[^ ]+', '<URL>', 'g'),
       |      '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '<EMAIL>', 'g'),
       |      '555-[0-9]{3,4}', '<PHONE>', 'g') AS redacted
       |  FROM p)
       |SELECT doc_id, redacted,
       |  len(regexp_extract_all(redacted, '<URL>|<EMAIL>|<PHONE>')) AS n_pii
       |FROM r ORDER BY doc_id""".stripMargin

  /** t12 — overlapping document chunking (the context-window splitter
    * for RAG indexing / long-doc pretraining): fixed 200-char windows
    * every 150 chars (25% overlap), one row per chunk with its span and
    * digest. Chunk count = ceil(max(n-width,0)/stride)+1 — the last
    * window may be short, every char of a non-empty doc lands in ≥1
    * chunk, and an empty doc yields one zero-length chunk. Pure
    * generator fanout (sequence→explode) + substring, all codegen'd;
    * at corpus scale this is a map-only stage. */
  private val ChunkWidth = 200
  private val ChunkStride = 150

  def chunkDocs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"),
        length(col("text")).cast("long").as("n"))
      // integer `div`, not float divide+floor: mirrors the oracle's `//`
      // exactly (double-floor departs from int arithmetic at extreme
      // magnitudes even though realistic doc lengths agree)
      .withColumn("n_chunks",
        expr(s"(greatest(n - $ChunkWidth, 0L) + ${ChunkStride - 1})" +
          s" div $ChunkStride + 1"))
      .select(col("doc_id"), col("text"), col("n"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        (col("chunk_idx") * ChunkStride + 1).as("chunk_start"),
        least(col("n") - col("chunk_idx") * ChunkStride, lit(ChunkWidth.toLong))
          .as("chunk_len"),
        md5(col("text")
          .substr((col("chunk_idx") * ChunkStride + 1).cast("int"),
            lit(ChunkWidth))
          .cast("binary")).as("chunk_hash"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  private val chunkDocsSql =
    s"""WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
       |c AS (SELECT doc_id, text, n,
       |        (greatest(n - $ChunkWidth, 0) + $ChunkStride - 1)
       |          // $ChunkStride + 1 AS n_chunks
       |      FROM d),
       |u AS (SELECT doc_id, text, n,
       |        unnest(generate_series(0, n_chunks - 1)) AS chunk_idx
       |      FROM c)
       |SELECT doc_id, chunk_idx,
       |  chunk_idx * $ChunkStride + 1 AS chunk_start,
       |  least(n - chunk_idx * $ChunkStride, $ChunkWidth) AS chunk_len,
       |  md5(substr(text, CAST(chunk_idx * $ChunkStride + 1 AS BIGINT),
       |      $ChunkWidth)) AS chunk_hash
       |FROM u ORDER BY doc_id, chunk_idx""".stripMargin

  /** t13 — unigram cross-entropy quality score (the CCNet/Gopher
    * LM-perplexity filter in its simplest honest form): train a unigram
    * language model on the corpus itself (term frequency / total
    * tokens) and score each document by the mean negative log2
    * probability of its tokens — high surprisal flags gibberish,
    * low flags boilerplate. Unlike a real KenLM this needs no external
    * model artifact, so the WHOLE path (train + score) is exact and
    * relational — a full hash oracle, not a planted one.
    *
    * 100 TB shape: one corpus-wide term-frequency aggregation (uniform
    * hash shuffle), then tokens ⋈ term-probs through the size-guarded
    * [[graft.plans.SizeGuard.broadcastIfSmall]] (vocabulary is
    * Heaps'-law sublinear but not constant — broadcast below the row
    * ceiling, shuffle join on term above it, same relation either way),
    * then one per-doc aggregation. Documents with zero tokens drop on
    * both engines (no tokens, no score — the pipeline gate treats them
    * as P4's non-empty-doc filter's problem). */
  def unigramCe(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(TextFunctions.tokens(col("text"))).as("term"))
    val tf = toks.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    val total = tf.agg(sum(col("cnt")).as("total"))
    toks.join(graft.plans.SizeGuard.broadcastIfSmall(tf, s"t13_probs|$d"), "term")
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(-sum(log2(col("cnt") / col("total"))) / count(lit(1)), 6)
          .as("ce_bits"))
      .orderBy(col("doc_id"))
  }

  private val unigramCeSql =
    s"""WITH toks AS (SELECT doc_id, unnest($tokListSql) AS term
       |              FROM documents),
       |t2 AS (SELECT doc_id, term FROM toks WHERE term <> ''),
       |tf AS (SELECT term, count(*) AS cnt FROM t2 GROUP BY 1),
       |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM tf)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |  round(-sum(log2(cnt / total)) / count(*), 6) AS ce_bits
       |FROM t2 JOIN tf USING (term) CROSS JOIN tot
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** t15 — BIGRAM cross-entropy quality score (t13's unigram model, one
    * conditioning step up — the honest relational form of the
    * CCNet/KenLM perplexity filter): a corpus-trained bigram model
    * p(cur|prev) = c(prev,cur)/c(prev), per-doc mean −log₂ p over its
    * bigrams. Scoring the corpus on itself needs no smoothing (every
    * scored bigram contributed to its own count, so p > 0 always); the
    * bigram definition is t06's (MLlib NGram Spark-side, the lead()
    * window in the oracle). Low ce_bits = predictable/templated text,
    * high = unusual token transitions — a sharper signal than t13
    * exactly where repeated boilerplate hides behind common unigrams.
    *
    * 100 TB shape: one fanout pass builds the bigram relation, one
    * hash agg counts it; the scoring join is bigram-keyed and SHUFFLED
    * (the bigram table grows superlinearly in vocabulary — never
    * broadcast), while the prefix-count table is unigram-vocab-sized
    * and goes through t13's size guard
    * ([[graft.plans.SizeGuard.broadcastIfSmall]] — broadcast at any
    * corpus worth training on, shuffle join past the web-scale type
    * ceiling). */
  def bigramCe(s: SparkSession, d: String): DataFrame =
    bigramCeFrom(Tables.documents(s, d), Some(s"t15_prefix|$d"))

  /** Frame-parametric form of t15 — any (doc_id, text) relation.
    * `memoKey` (the registered row passes its dataset-scoped key)
    * memoizes the prefix-table materialization across re-runs; frame
    * callers whose relation varies per invocation (tests, micro-batch
    * shapes) leave it None and get a per-call checkpoint they own. */
  def bigramCeFrom(documents: DataFrame,
      memoKey: Option[String] = None): DataFrame = {
    val bg = TextFunctions.withNgrams(
        documents
          .select(col("doc_id"), TextFunctions.tokens(col("text")).as("words")),
        "words", "bigrams", 2)
      .select(col("doc_id"), explode(col("bigrams")).as("bg"))
    val bgf = bg.groupBy(col("bg")).agg(count(lit(1)).as("c2"))
    val pf = bgf
      .groupBy(split(col("bg"), " ").getItem(0).as("prev"))
      .agg(sum(col("c2")).as("c1"))
    bg.join(bgf, "bg")
      .withColumn("prev", split(col("bg"), " ").getItem(0))
      .join(graft.plans.SizeGuard.broadcastIfSmall(pf, memoKey), "prev")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(-sum(log2(col("c2") / col("c1"))) / count(lit(1)), 6)
          .as("ce_bits"))
      .orderBy(col("doc_id"))
  }

  private val bigramCeSql =
    s"""WITH t AS (SELECT doc_id, $tokListSql AS l FROM documents),
       |w AS (SELECT doc_id, generate_subscripts(l, 1) AS pos,
       |        unnest(l) AS word FROM t),
       |b0 AS (SELECT doc_id, word AS prev,
       |         word || ' ' || lead(word)
       |           OVER (PARTITION BY doc_id ORDER BY pos) AS bg
       |       FROM w WHERE word <> ''),
       |b AS (SELECT doc_id, prev, bg FROM b0 WHERE bg IS NOT NULL),
       |bf AS (SELECT bg, count(*) AS c2 FROM b GROUP BY bg),
       |pfx AS (SELECT string_split(bg, ' ')[1] AS prev,
       |          CAST(sum(c2) AS BIGINT) AS c1
       |        FROM bf GROUP BY 1)
       |SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |  round(-sum(log2(bf.c2 / p.c1)) / count(*), 6) AS ce_bits
       |FROM b JOIN bf USING (bg) JOIN pfx p ON p.prev = b.prev
       |GROUP BY b.doc_id ORDER BY doc_id""".stripMargin

  /** p10 — DSIR-style importance weights (data selection via importance
    * resampling, the Xie et al. 2023 recipe in its honest relational
    * form): score every document by how much more likely a TARGET-domain
    * unigram LM finds its tokens than the corpus-wide LM —
    * per-token mean of log₂ p_target(term)/p_corpus(term), both models
    * add-1 smoothed over the corpus vocabulary so unseen-in-target terms
    * score finitely. The target here is the `src0` slice (a domain
    * proxy); a deployment swaps in its curated in-domain seed set.
    * High weight = looks like the target — the ranking a pipeline
    * resamples from to tilt a general crawl toward a domain. The ratio
    * is evaluated as a SUM OF LOGS of integer-derived terms
    * (log(c_t+1) + log(N_c+V) − log(c_c+1) − log(N_t+V)), never a
    * product — the products overflow 64 bits at corpus scale, the logs
    * never do.
    *
    * 100 TB shape: two term-count aggregations (uniform hash keys), the
    * merged model table is vocabulary-sized — size-guarded like t13's
    * term probabilities ([[graft.plans.SizeGuard.broadcastIfSmall]]) —
    * and one per-doc roll-up. Nothing pairwise. */
  def dsirWeights(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        explode(TextFunctions.tokens(col("text"))).as("term"))
    val cc = toks.groupBy(col("term")).agg(count(lit(1)).as("c_c"))
    val ct = toks.filter(col("source") === "src0")
      .groupBy(col("term")).agg(count(lit(1)).as("c_t"))
    val model = cc.join(ct, Seq("term"), "left")
      .na.fill(0L, Seq("c_t"))
    val consts = cc.agg(sum(col("c_c")).as("n_c"),
        count(lit(1)).as("v"))
      .crossJoin(broadcast(
        toks.filter(col("source") === "src0")
          .agg(count(lit(1)).as("n_t"))))
    val termLogw = log2(col("c_t") + 1) + log2(col("n_c") + col("v")) -
      log2(col("c_c") + 1) - log2(col("n_t") + col("v"))
    toks.join(graft.plans.SizeGuard.broadcastIfSmall(model, s"p10_model|$d"), "term")
      .crossJoin(broadcast(consts))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(termLogw) / count(lit(1)), 6).as("dsir_logw"))
      .orderBy(col("doc_id"))
  }

  private val dsirWeightsSql =
    s"""WITH toks AS (SELECT doc_id, source, unnest($tokListSql) AS term
       |              FROM documents),
       |t2 AS (SELECT doc_id, source, term FROM toks WHERE term <> ''),
       |cc AS (SELECT term, count(*) AS c_c FROM t2 GROUP BY 1),
       |ct AS (SELECT term, count(*) AS c_t FROM t2
       |       WHERE source = 'src0' GROUP BY 1),
       |model AS (SELECT cc.term, cc.c_c, COALESCE(ct.c_t, 0) AS c_t
       |          FROM cc LEFT JOIN ct ON ct.term = cc.term),
       |k AS (SELECT (SELECT CAST(sum(c_c) AS BIGINT) FROM cc) AS n_c,
       |        (SELECT CAST(count(*) AS BIGINT) FROM cc) AS v,
       |        (SELECT CAST(count(*) AS BIGINT) FROM t2
       |         WHERE source = 'src0') AS n_t)
       |SELECT t2.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |  round(sum(log2(m.c_t + 1) + log2(k.n_c + k.v)
       |            - log2(m.c_c + 1) - log2(k.n_t + k.v)) / count(*), 6)
       |    AS dsir_logw
       |FROM t2 JOIN model m ON m.term = t2.term CROSS JOIN k
       |GROUP BY t2.doc_id ORDER BY t2.doc_id""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("t01_clean_docs", cleanDocs, Some(cleanDocsSql)),
    QueryDef("t02_word_counts", wordCounts, Some(wordCountsSql)),
    QueryDef("t03_tfidf_top5", tfidfTop5, Some(tfidfTop5Sql)),
    QueryDef("t04_doc_quality", docQuality, Some(docQualitySql)),
    QueryDef("t05_lang_guess", langGuess, Some(langGuessSql)),
    QueryDef("t06_bigram_counts", bigramCounts, Some(bigramCountsSql)),
    QueryDef("t07_pos_keywords", posKeywords, Some(posKeywordsSql)),
    QueryDef("t08_winnow_fingerprints", winnowFingerprints, Some(winnowFingerprintsSql)),
    QueryDef("t09_token_stats", tokenStats, Some(tokenStatsSql)),
    QueryDef("t10_repetition_stats", repetitionStats, Some(repetitionStatsSql)),
    QueryDef("t11_redact_pii", redactPii, Some(redactPiiSql)),
    QueryDef("t12_chunk_docs", chunkDocs, Some(chunkDocsSql)),
    QueryDef("t13_unigram_ce", unigramCe, Some(unigramCeSql)),
    QueryDef("t14_lang_confusion", langConfusion, Some(langConfusionSql)),
    QueryDef("t17_lang_model", langModel, Some(langModelSql)),
    QueryDef("t15_bigram_ce", bigramCe, Some(bigramCeSql)),
    QueryDef("p10_dsir_weights", dsirWeights, Some(dsirWeightsSql)))
}
