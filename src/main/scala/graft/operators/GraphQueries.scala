package graft.operators

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.Tables._

/** Graph-shaped dedup (SURVEY §2.8 extension): fuzzy-dedup clustering.
  *
  * Pairwise near-dup detection (q_dedup_embed / q_sim_pairs_lsh) yields
  * EDGES; an actual training-data dedup pass needs the transitive closure —
  * "keep one document per connected component of the near-dup graph". This
  * is the canonical last stage of a MinHash dedup pipeline (the
  * union-find step of e.g. the C4/RefinedWeb recipes), run here on GraphX
  * Pregel (see [[dedupCc]] for the design and the measured alternative).
  *
  * Scale design (100 TB): only edge endpoints enter the graph — a few
  * percent of the corpus at dedup thresholds — and each Pregel superstep
  * exchanges labels along edges with indexed VertexRDD joins; the driver
  * never sees label data.
  */
object GraphQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_cc" -> dedupCc _,
    "q_dedup_cc_lsh" -> dedupCcLsh _,
    "q_graph_pagerank" -> graphPagerank _
  )

  val oracle: Map[String, String] = Map(
    // Transitive closure as a recursive CTE: labels flow along edges until
    // fixpoint (UNION dedups, so it terminates); component = min reachable
    // id — exactly what min-label propagation converges to.
    "q_dedup_cc" ->
      """WITH RECURSIVE pairs AS (
        |  SELECT a.vec_id AS v1, b.vec_id AS v2
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |  WHERE round(
        |      list_sum(list_transform(range(1, len(a.embedding) + 1),
        |        i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
        |      / (sqrt(list_sum(list_transform(a.embedding,
        |            x -> x::DOUBLE * x::DOUBLE)))
        |       * sqrt(list_sum(list_transform(b.embedding,
        |            x -> x::DOUBLE * x::DOUBLE)))), 4) >= 0.4),
        |und AS (SELECT v1, v2 FROM pairs
        |        UNION ALL SELECT v2, v1 FROM pairs),
        |reach(node, lbl) AS (
        |  SELECT vec_id, vec_id FROM embeddings
        |  UNION
        |  SELECT u.v1, r.lbl FROM reach r JOIN und u ON u.v2 = r.node)
        |SELECT node AS vec_id, min(lbl) AS component,
        |  CAST(node = min(lbl) AS BOOLEAN) AS keep
        |FROM reach GROUP BY node ORDER BY node""".stripMargin
  )

  /** Connected components of the embedding near-dup graph (cosine ≥ 0.4,
    * same edge set as q_dedup_embed); every vector labeled with its
    * component's min id, `keep` marking the canonical representative.
    *
    * The closure itself runs on GraphX's Pregel `connectedComponents` —
    * the §2.10 "compose existing ops" preference applied to graphs: its
    * label semantics (min reachable VertexId) are exactly this query's
    * contract, it iterates to true convergence (no round cap to tune),
    * and its indexed VertexRDD joins make each superstep far cheaper than
    * a Catalyst join+agg round-trip. Only edge ENDPOINTS enter the graph;
    * singletons (their own component by definition) left-join back at the
    * end — at dedup thresholds the edge set is a few percent of the
    * corpus, so the iterative part runs on a small fraction of the data
    * at any scale. A DataFrame-loop formulation (min-label propagation
    * with path compression per round) was benchmarked first: the min
    * label only travels one graph hop per materialized round, making it
    * O(diameter) rounds of fixed Catalyst/job overhead — 2.5x slower at
    * sf0.1 even with multi-hop fusion. */
  /** Target edges per GraphX partition. Pregel's per-superstep cost has a
    * fixed per-partition term (a task per partition per iteration across
    * several internal RDDs) — measured here: feeding the 32-partition,
    * 920-edge pair output straight in made CC 8× slower than one
    * right-sized partition. */
  private val EdgesPerPartition = 50000L

  def dedupCc(s: SparkSession, d: String): DataFrame = {
    // Unsorted pair pipeline (the declared q_dedup_embed adds a final
    // ORDER BY this consumer would discard), MATERIALIZED once: GraphX
    // evaluates its input RDD several times (vertex derivation + Pregel),
    // and without the checkpoint each evaluation re-runs the pair join.
    // The feed is the blocked exact pair equi-join (SimilarityQueries.
    // embedPairs): distributed, broadcast-free, no nested-loop plan —
    // PlanGuardSpec asserts this query stays BNLJ/cartesian-free. The
    // exact edge set is the oracle contract here (cos ≥ 0.4 slices the
    // bulk of the pair distribution, where LSH candidate recall is ~10%
    // — measured; see embedPairs doc); [[dedupCcLsh]] is the production
    // ≥0.9-threshold LSH feed, same Pregel stage.
    ccOverPairs(s,
      SimilarityQueries.embedPairs(s, d).select("v1", "v2"),
      embeddings(s, d).select("vec_id"), "vec_id")
  }

  /** The production fuzzy-dedup shape at corpus scale: connected
    * components over BANDED-MINHASH candidate pairs at a high-similarity
    * threshold, instead of the exact all-pairs edge set.
    *
    * [[dedupCc]]'s exact feed is the oracle contract but quadratic in
    * compute; at 100 TB nobody runs that. What every large MinHash dedup
    * deployment (the C4/RefinedWeb recipe family) runs is exactly this:
    * LSH candidate generation (`q_sim_pairs_lsh`: band self-join, pair
    * space exists only inside signature-collision buckets) → exact-Jaccard
    * verify → threshold at a regime where banding recall is HIGH → one
    * Pregel connected-components pass over the surviving edges. At the
    * declared ≥0.9 threshold the 4-band × 4-row family's per-pair recall
    * is 1−(1−0.9⁴)⁴ ≈ 0.986 (vs ~10% at q_dedup_cc's 0.4-cosine regime —
    * why THAT query must stay exact), and transitive closure repairs part
    * of the residual miss: a dropped edge inside a ≥3-doc cluster still
    * lands same-component through its neighbors. The Pregel stage
    * ([[ccOverPairs]]) is shared with q_dedup_cc verbatim; only the edge
    * feed differs. Rows-only by §2 design (banding recall probabilistic);
    * PropertySpec asserts every exact-Jaccard ≥0.9 pair of the fixture
    * lands in one component. */
  def dedupCcLsh(s: SparkSession, d: String): DataFrame = {
    // The ≥0.9 cut applies to simPairsLsh's exact-verified Jaccard
    // (rounded 4dp — a true 0.89996 rounds in; declared semantics), so the
    // edge set is "LSH-candidate AND verified ≥0.9". Its final ORDER BY is
    // discarded by the checkpoint below, like embedPairs' in dedupCc.
    ccOverPairs(s,
      SimilarityQueries.simPairsLsh(s, d)
        .filter(col("jaccard") >= 0.9).select("d1", "d2"),
      documents(s, d).select("doc_id"), "doc_id")
  }

  /** Link-analysis ranking over the near-dup graph: 10 synchronous
    * PageRank iterations (reset 0.15) on the same ≥0.9-Jaccard LSH edge
    * set as [[dedupCcLsh]], every document labeled with its rank.
    *
    * Why a dedup pipeline wants this: connected components says WHICH
    * docs are duplicates; rank says WHICH COPY to keep — the
    * best-connected member of a near-dup cluster is the most
    * "canonical" version (partial copies and mutilated variants sit on
    * the cluster's rim with fewer strong links), the same
    * centrality-as-quality idea behind Common Crawl's published harmonic
    * centrality rankings. Undirected graph → each pair feeds both
    * directions of the directed walk.
    *
    * Scale design mirrors [[ccOverPairs]]: edge feed materialized once,
    * partitions right-sized by edge count, only edge ENDPOINTS enter the
    * iterative stage (rim of the corpus at dedup thresholds); each
    * superstep is one indexed VertexRDD join — rank state is O(1) per
    * vertex and the driver sees no rank data. Singletons never enter the
    * graph and take the no-inlink fixed point 0.15 in the final join.
    * Rows-only by §2 design (iterative float accumulation has no SQL
    * twin); StatsGraphSpec replays the identical synchronous iteration
    * in plain Scala and pins every vertex's rank to 1e-6. */
  def graphPagerank(s: SparkSession, d: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val pairs = SimilarityQueries.simPairsLsh(s, d)
      .filter(col("jaccard") >= 0.9).select("d1", "d2")
      .toDF("src", "dst").localCheckpoint()
    val nEdges = pairs.count()
    val parts = math.max(1L, (2 * nEdges + EdgesPerPartition - 1) /
      EdgesPerPartition).toInt
    val edgeRdd = pairs.rdd.coalesce(parts).flatMap { r =>
      Iterator(Edge(r.getLong(0), r.getLong(1), ()),
        Edge(r.getLong(1), r.getLong(0), ()))
    }
    val graph = Graph.fromEdges(edgeRdd, (),
      edgeStorageLevel = StorageLevel.MEMORY_ONLY,
      vertexStorageLevel = StorageLevel.MEMORY_ONLY)
    val pr = graph.staticPageRank(numIter = 10, resetProb = 0.15)
    val ranks = pr.vertices.toDF("doc_id", "rank").localCheckpoint()
    pr.unpersist(blocking = false)
    graph.unpersist(blocking = false)
    documents(s, d).select("doc_id")
      .join(ranks, Seq("doc_id"), "left")
      .select(col("doc_id"),
        round(coalesce(col("rank"), lit(0.15)), 6).as("rank"))
      .orderBy("doc_id")
  }

  /** The shared Pregel stage: connected components over an undirected
    * pair list, labels joined back onto the full vertex universe (absent
    * vertices are their own singleton component), `keep` = is the
    * component's min-id representative.
    *
    * @param pairs    two LongType columns, one row per undirected edge
    * @param vertices one LongType id column, the full universe to label
    * @param idCol    the vertex id column name (also the output key) */
  private[operators] def ccOverPairs(s: SparkSession, pairs: DataFrame,
      vertices: DataFrame, idCol: String): DataFrame = {
    // Edge pipeline MATERIALIZED once: GraphX evaluates its input RDD
    // several times (vertex derivation + Pregel), and without the
    // checkpoint each evaluation re-runs the upstream candidate join.
    val edges = pairs.toDF("src", "dst").localCheckpoint()
    val nEdges = edges.count() // free on the checkpointed blocks
    val parts = math.max(1L, (nEdges + EdgesPerPartition - 1) /
      EdgesPerPartition).toInt
    // GraphX treats edges as undirected for CC (messages flow both ways);
    // each pair enters once. coalesce only ever reduces partitions.
    val edgeRdd = edges.rdd.coalesce(parts)
      .map(r => Edge(r.getLong(0), r.getLong(1), ()))
    val graph = Graph.fromEdges(edgeRdd, (),
      edgeStorageLevel = StorageLevel.MEMORY_ONLY,
      vertexStorageLevel = StorageLevel.MEMORY_ONLY)
    val spark = s
    import spark.implicits._
    val cc = graph.connectedComponents()
    // Materialize the labels, then release the Pregel caches eagerly —
    // ContextCleaner would get there eventually, but a long-lived session
    // (bench warm+timed, the test suites) shouldn't hold graph blocks.
    val labels = cc.vertices.toDF(idCol, "component").localCheckpoint()
    cc.unpersist(blocking = false)
    graph.unpersist(blocking = false)
    vertices
      .join(labels, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("component"))
      .select(col(idCol), col("component"),
        (col(idCol) === col("component")).as("keep"))
      .orderBy(idCol)
  }
}
