package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph operators for the dedup pipeline's final stage: near-dup
  * CANDIDATE PAIRS (d02/d03/d06 outputs) are edges of a similarity
  * graph, and collapsing a corpus keeps ONE representative per
  * connected component — pairs alone under-delete (A~B, B~C but the
  * A-C edge fell under threshold still means one kept doc, not two).
  * The reference has no graph stage (its corpus is pre-deduplicated);
  * this is a beyond-reference extension (SURVEY §2.14 X27) that any
  * 100 TB training-data dedup needs.
  */
object GraphOps {

  /** Connected components via iterative hash-min label propagation:
    * every node starts labeled with its own id; each round every node
    * takes the min of its label and its neighbors' labels; fixpoint =
    * components labeled by their min member id.
    *
    * Scale shape: each round is ONE shuffle (edge⋈label hash join +
    * min aggregate keyed on node id) and converges in O(graph
    * diameter) rounds — near-dup components are LSH-bucket cliques
    * with diameter 1-3, so 100 TB runs take a handful of shuffles.
    * (For adversarial long-chain graphs the two-phase large-star/
    * small-star variant [Kiveris et al., "Connected Components in
    * MapReduce and Beyond"] converges in O(log n) rounds; near-dup
    * graphs never need it, so the simpler one-join round is the
    * better plan here.) Each round's frontier is localCheckpoint'd:
    * lineage stays O(1) instead of growing by one join per round, and
    * the blocks release with the plan (no cross-query cache leak).
    *
    * @param nodes (id: long) — the universe; isolated nodes become
    *              their own singleton component.
    * @param edges (src: long, dst: long) — undirected (either
    *              orientation suffices); endpoints outside `nodes`
    *              propagate nothing.
    * @return (id, component) with component = min reachable id.
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
                          maxRounds: Int = -1): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = nodes.select(col("id"), col("id").as("component"))
      .localCheckpoint()
    // Default round cap = node count (graph diameter can never exceed
    // it, so the require below fires ONLY on a genuine propagation bug,
    // never on a legitimately long chain); callers pass an explicit cap
    // to assert a structural diameter bound instead. The count is one
    // cheap action against the already-checkpointed label frontier.
    val roundCap =
      if (maxRounds > 0) maxRounds
      else math.max(25L, labels.count()).min(Int.MaxValue).toInt
    var changed = 1L
    var round = 0
    while (changed > 0 && round < roundCap) {
      val nbrMin = sym
        .join(labels.select(col("id").as("dst"), col("component")), "dst")
        .groupBy(col("src").as("nid"))
        .agg(min(col("component")).as("nbr_min"))
      val next = labels
        .join(nbrMin, labels("id") === nbrMin("nid"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("nbr_min"), col("component")))
            .as("component"))
        .localCheckpoint()
      // one count action per round doubles as the convergence check and
      // the materialization barrier for the checkpoint above
      changed = next.as("n")
        .join(labels.select(col("id"), col("component").as("old")), "id")
        .filter(col("component") =!= col("old"))
        .count()
      labels = next
      round += 1
    }
    require(changed == 0,
      s"connectedComponents did not converge in $roundCap rounds — " +
        "with the node-count default this means a propagation bug; with " +
        "an explicit cap, the graph's diameter exceeds the asserted bound " +
        "(raise it or switch to large-star/small-star)")
    labels
  }

  /** d07 — near-dup cluster collapse over the verification window: the
    * d02 exact-Jaccard top-100 pairs ([[DedupOps.jaccardPairsFrom]],
    * same code) are the edges, every windowed doc is a node, and each
    * doc reports its component (min member id) plus whether it is the
    * kept representative. Full DuckDB oracle: the identical pair
    * definition (shared CTE text) under a recursive transitive-closure
    * CTE — the oracle checks the FIXPOINT, so a propagation bug that
    * stops one round early breaks the hash. */
  /** (doc_id, component) labels over the d02 verification window —
    * shared by d07 and p02, and Intermediates-memoized per dataset: the
    * label-propagation rounds (and the pair generation feeding them)
    * are one corpus-scale build whose result every dedup-collapse and
    * split query fans out from — same posture as the DFM (a deployment
    * stores the component table; recomputing it per consumer multiplies
    * the most iterative job in the engine). The final frontier is
    * already localCheckpoint'd by [[connectedComponents]], so memoizing
    * pins those blocks against the harness's between-query sweep. */
  private def componentLabels(s: SparkSession, d: String): DataFrame =
    graft.api.Intermediates.memo(s, s"neardup-components|$d") {
      val docs = Tables.documents(s, d)
      val edges = DedupOps.jaccardPairsFrom(docs, memoKey = Some(d))
        .select(col("a_id").as("src"), col("b_id").as("dst"))
      val nodes = docs.filter(col("doc_id") < VerifyWindow.MaxId)
        .select(col("doc_id").as("id"))
      // explicit structural round cap (node count bounds the diameter):
      // skips the default cap's labels.count() action per collapse
      connectedComponents(nodes, edges, maxRounds = VerifyWindow.CcMaxRounds)
    }

  def neardupComponents(s: SparkSession, d: String): DataFrame =
    componentLabels(s, d)
      .select(col("id").as("doc_id"), col("component"),
        (col("id") === col("component")).cast("int").as("keep"))
      .orderBy(col("doc_id"))

  /** DuckDB transitive-closure fixpoint over the same pair definition —
    * `SELECT id, min(r) AS component FROM reach GROUP BY id` after these
    * CTEs reproduces [[componentLabels]]. */
  private val componentCtesSql =
    s"""WITH RECURSIVE ${DedupOps.jaccardCtesSql},
      |pairs AS (SELECT a_id, b_id FROM (${DedupOps.jaccardSelectSql})),
      |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
      |          UNION SELECT b_id, a_id FROM pairs),
      |nodes AS (SELECT doc_id AS id FROM documents WHERE doc_id < ${VerifyWindow.MaxId}),
      |reach(id, r) AS (
      |  SELECT id, id FROM nodes
      |  UNION
      |  SELECT reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r)""".stripMargin

  private val neardupComponentsSql =
    s"""$componentCtesSql
      |SELECT id AS doc_id, min(r) AS component,
      |  CAST(id = min(r) AS INTEGER) AS keep
      |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin

  /** p02 — leakage-safe train/test split: hash the COMPONENT id, not the
    * doc id, so near-duplicate documents can never straddle the split
    * (train/test contamination is the canonical eval failure in LLM
    * corpus prep). Knuth multiplicative hash mod 10: buckets 0-7 train,
    * 8-9 test — closed-form in both engines' integer arithmetic, no
    * engine-specific hash function. The id is masked to 16 bits BEFORE
    * the multiply: 65535 · 2654435761 ≈ 1.7e14 stays far inside int64,
    * whereas the unmasked product overflows once component ids exceed
    * ~3.47e9 — Spark would wrap silently (negative remainder ⇒ every
    * row 'train') while DuckDB raises, breaking the identical-formula
    * contract. Identity for window-bounded ids, so outputs are
    * unchanged. */
  def leakageSplit(s: SparkSession, d: String): DataFrame =
    componentLabels(s, d)
      .select(col("id").as("doc_id"), col("component"),
        when(expr("component % 65536 * 2654435761 % 4294967296 % 10") < 8,
          "train").otherwise("test").as("split"))
      .orderBy(col("doc_id"))

  private val leakageSplitSql =
    s"""$componentCtesSql,
      |comp AS (SELECT id AS doc_id, min(r) AS component
      |         FROM reach GROUP BY id)
      |SELECT doc_id, component,
      |  CASE WHEN component % 65536 * 2654435761 % 4294967296 % 10 < 8
      |       THEN 'train' ELSE 'test' END AS split
      |FROM comp ORDER BY doc_id""".stripMargin

  /** d10 — the PRODUCTION dedup composition, uncapped: full-corpus
    * MinHash-LSH candidates ([[DedupOps.minhashCandidatesFrom]], d03's
    * real path, NO verification window) feed [[connectedComponents]]
    * (d07's real collapse). The claim that "at 100 TB the LSH
    * candidates are the edges" is executed here, not just documented.
    *
    * Oracle construction: the corpus is unioned with TWO id-shifted
    * copies of itself, so every doc with ≥ 1 shingle (≥ 3 tokens)
    * plants a 3-member near-dup clique {id, id+off, id+2·off}.
    * Identical text ⇒ identical signatures ⇒ the three copies share
    * every band bucket, so all three pairwise candidate edges exist and
    * the clique must collapse to ONE component — including when organic
    * near-dup chains merge several planted cliques (the copies of the
    * organic pair are also pairwise candidates, so the merged component
    * is still shared by all three labels). Docs with < 3 tokens have no
    * shingles, no signature, no edges: three singleton components.
    * Emitted: (doc_id, clique_ok) where clique_ok ⇔ the doc's three
    * copies share one component — closed-form on the oracle side as
    * `token count ≥ 3`, a full hash-match over the whole corpus.
    *
    * Scale shape: exactly d03 + d07's plans at 3× corpus size — banded
    * equi-join candidates (ids only ride the shuffle), then one
    * join+min-agg shuffle per propagation round. The default
    * node-count round cap stays (the merged-component diameter has no
    * small structural bound here — organic chains set it). */
  def productionDedup(s: SparkSession, d: String): DataFrame = {
    // memoized: the full-corpus LSH + propagation rounds are the most
    // expensive composition in the dedup family — build once per dataset
    val (labels, off) = graft.api.Intermediates.memo(s, s"d10-components|$d") {
      productionDedupLabels(
        Tables.documents(s, d).select(col("doc_id"), col("text")))
    }
    cliqueFlags(labels, off)
  }

  /** d10's composition core over any (doc_id, text) relation: plant the
    * two shifted copies, run the REAL LSH candidate path over the
    * union, collapse with [[connectedComponents]]. Returns the full
    * label frontier plus the derived offset. */
  private[graft] def productionDedupLabels(
      docs: DataFrame): (DataFrame, Long) = {
    val off = DedupOps.plantOffset(DedupOps.maxIdOf(docs, "doc_id"))
    val union = docs
      .unionByName(docs.withColumn("doc_id", col("doc_id") + lit(off)))
      .unionByName(docs.withColumn("doc_id", col("doc_id") + lit(2 * off)))
    // 3× union ⇒ 3× bucket cap: without it the tripled bucket loads
    // would narrow the degenerate-content safety margin to
    // MaxBucketSize/6 near-identical docs and could drop ALL of a
    // boilerplate group's planted edges while the oracle still expects
    // clique_ok = 1 (see DedupOps.minhashCandidatesFrom)
    val edges = DedupOps
      .minhashCandidatesFrom(union, bucketCap = 3L * DedupOps.MaxBucketSize)
      .select(col("a_id").as("src"), col("b_id").as("dst"))
    val nodes = union.select(col("doc_id").as("id"))
    (connectedComponents(nodes, edges), off)
  }

  /** (doc_id, clique_ok) over [[productionDedupLabels]] output:
    * clique_ok ⇔ the doc and both its planted copies share one
    * component. */
  private[graft] def cliqueFlags(labels: DataFrame, off: Long): DataFrame = {
    val orig = labels.filter(col("id") < off)
      .select(col("id"), col("component"))
    val copy1 = labels.filter(col("id") >= off && col("id") < 2 * off)
      .select((col("id") - off).as("id"), col("component").as("c1"))
    val copy2 = labels.filter(col("id") >= 2 * off)
      .select((col("id") - 2 * off).as("id"), col("component").as("c2"))
    orig.join(copy1, "id").join(copy2, "id")
      .select(col("id").as("doc_id"),
        (col("component") === col("c1") && col("component") === col("c2"))
          .cast("int").as("clique_ok"))
      .orderBy(col("doc_id"))
  }

  private val productionDedupSql =
    s"""SELECT doc_id,
      |  CAST(len(list_filter(${graft.oracle.DuckFragments.tokListSql},
      |                       x -> x <> '')) >= 3 AS INTEGER) AS clique_ok
      |FROM documents ORDER BY doc_id""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("d07_neardup_components", neardupComponents,
      Some(neardupComponentsSql)),
    QueryDef("d10_production_dedup", productionDedup,
      Some(productionDedupSql)),
    QueryDef("p02_leakage_split", leakageSplit, Some(leakageSplitSql)))
}
