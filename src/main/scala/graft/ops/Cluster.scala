package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster construction: connected components over a
  * candidate-pair edge list by iterative min-label propagation.
  *
  * Near-dup detection (minhash bands, simhash bands, …) emits PAIRS;
  * an actual dedup pipeline needs CLUSTERS (every doc mapped to one
  * canonical representative, here the minimum doc id in its component).
  * Pairs → clusters is transitive closure, which no single SQL operator
  * expresses — this is the one genuinely iterative operator in the
  * engine.
  *
  * Algorithm: every node starts labeled with itself; each round a node
  * takes the minimum of its own label and its neighbors' labels; stop
  * when the (strictly decreasing) global label sum is unchanged. Each
  * round is one shuffle (join edges⋈labels + groupBy-min with map-side
  * combine), and `localCheckpoint` cuts the growing lineage so round N
  * doesn't replan rounds 1..N-1. Rounds = component diameter — small
  * for near-dup clusters (dups of a doc are dups of each other).
  * At 100 TB scale the same loop runs with the large-star/small-star
  * optimization (Kiveris et al., "Connected Components in MapReduce"),
  * which bounds rounds to O(log n); plain propagation keeps this
  * implementation a pure composition of joins and aggregations.
  */
object Cluster {

  /** Edge list (cols `a`, `b`) → (doc_id, cluster_id = min reachable id).
    * Nodes are the ids appearing in at least one edge. */
  def connectedComponents(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint()
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .localCheckpoint()
    var prevSum = Long.MinValue
    var curSum = labels.agg(sum("lbl")).head.getLong(0)
    while (curSum != prevSum) {
      prevSum = curSum
      val viaNeighbor = sym.join(labels, sym("b") === labels("id"))
        .select(sym("a").as("id"), col("lbl"))
      labels = viaNeighbor.union(labels)
        .groupBy("id").agg(min("lbl").as("lbl"))
        .localCheckpoint()
      curSum = labels.agg(sum("lbl")).head.getLong(0)
    }
    labels.select(col("id").as("doc_id"), col("lbl").as("cluster_id"))
  }
}
