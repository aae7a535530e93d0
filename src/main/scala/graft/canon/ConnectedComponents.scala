package graft.canon

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Catalyst-only connected components (SURVEY L5, §4.2 item 4).
  *
  * Iterative minimum-label propagation expressed purely with DataFrame ops
  * (no RDDs, no GraphX): every node starts labeled with itself; each round
  * every node takes the min of its own label and its neighbors' labels;
  * convergence in O(diameter) rounds. Alias/canonicalization graphs are
  * star-shaped (surface ↔ agency ↔ qid), so the diameter is tiny (≤ 4) and
  * min-propagation beats the log-round large-star/small-star contraction in
  * both simplicity and per-round cost at this shape.
  *
  * Scale notes:
  *  - the per-round aggregate is `min(label)` per node — partially
  *    aggregable, so Reuters-scale hub nodes (millions of incident edges)
  *    combine map-side before the shuffle; skew does not concentrate;
  *  - each round `localCheckpoint()`s the label table to cut lineage
  *    (unbounded plan growth is the classic failure of DataFrame loops);
  *  - the edge table is materialized once (symmetric, deduped) and reused
  *    every round — one shuffle per round on `node`.
  *
  * Input: edges with two long columns `src`, `dst`. Output: (`node`,
  * `component`) with `component` = min node id of the component.
  */
object ConnectedComponents {

  def run(edges: DataFrame, maxIter: Int = 30): DataFrame = {
    val sym = edges
      .select(col("src").cast("long"), col("dst").cast("long"))
      .where(col("src") =!= col("dst"))
      .select(col("src").as("a"), col("dst").as("b"))
      .unionAll(
        edges.select(col("dst").cast("long").as("a"), col("src").cast("long").as("b")))
      .distinct()
      .localCheckpoint()

    var labels = sym.select(col("a").as("node"))
      .distinct()
      .withColumn("component", col("node"))
      .localCheckpoint()

    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // each node's best incoming proposal: min label among its neighbors
      val proposals = sym
        .join(labels.withColumnRenamed("node", "b"), "b")
        .groupBy(col("a").as("node"))
        .agg(min(col("component")).as("nbrMin"))
      // carry the old label through the propagation select so convergence
      // detection is a narrow filter over the (eagerly materialized)
      // checkpoint — the round-1 form re-joined next⋈labels per round,
      // doubling the loop's shuffle count
      val next = labels
        .join(proposals, Seq("node"), "left")
        .select(
          col("node"),
          col("component").as("_old"),
          least(col("component"), coalesce(col("nbrMin"), col("component")))
            .as("component"))
        .localCheckpoint()
      val changed = next
        .where(col("component") =!= col("_old"))
        .limit(1)
        .count()
      labels = next.select(col("node"), col("component"))
      converged = changed == 0
      iter += 1
    }
    labels
  }
}
