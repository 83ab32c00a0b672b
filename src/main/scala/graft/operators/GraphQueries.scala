package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Graph-shaped dedup (SURVEY §2.8 extension): fuzzy-dedup clustering.
  *
  * Pairwise near-dup detection (q_dedup_embed / q_sim_pairs_lsh) yields
  * EDGES; an actual training-data dedup pass needs the transitive closure —
  * "keep one document per connected component of the near-dup graph". This
  * is the canonical last stage of a MinHash dedup pipeline (the
  * union-find step of e.g. the C4/RefinedWeb recipes), expressed here as
  * distributed min-label propagation.
  *
  * Scale design (100 TB): each iteration is one equi-join (edges ⋈ labels,
  * shuffled on the node id) + one min-aggregation — label state never
  * leaves the executors and converges in O(diameter) rounds (near-dup
  * components are small cliques; diameter is 2-4 in practice). Lineage is
  * truncated per round with `localCheckpoint` so the plan does not grow
  * with the iteration count. The driver only sees a one-long convergence
  * counter per round, never the data.
  */
object GraphQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_cc" -> dedupCc _
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
    * component's min id, `keep` marking the canonical representative. */
  def dedupCc(s: SparkSession, d: String): DataFrame = {
    val pairs = SimilarityQueries.dedupEmbed(s, d).select("v1", "v2")
    // Undirected: propagate labels both ways along every edge.
    val edges = pairs
      .union(pairs.select(col("v2").as("v1"), col("v1").as("v2")))
      .toDF("src", "dst")
      .localCheckpoint() // the O(n²) pair scan runs once, not per round
    var labels = embeddings(s, d)
      .select(col("vec_id"), col("vec_id").as("component"))
      .localCheckpoint()
    var converged = false
    var round = 0
    while (!converged && round < 20) {
      val viaEdges = edges
        .join(labels, edges("dst") === labels("vec_id"))
        .select(edges("src").as("vec_id"), col("component"))
      val next = labels.union(viaEdges)
        .groupBy("vec_id")
        .agg(min("component").as("component"))
        .localCheckpoint()
      converged = next
        .join(labels.withColumnRenamed("component", "prev"), "vec_id")
        .filter(col("component") =!= col("prev"))
        .isEmpty
      labels = next
      round += 1
    }
    labels
      .select(col("vec_id"), col("component"),
        (col("vec_id") === col("component")).as("keep"))
      .orderBy("vec_id")
  }
}
