package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the graph core
  * of dedup resolution ([[Dedup.resolveDuplicates]]), exposed as its own
  * operator: every vertex maps to the smallest vertex id reachable from
  * it (the component's canonical label).
  *
  * Graph-contraction algorithm, chosen over per-round label propagation
  * (O(diameter) full-edge-list joins) and over large-star/small-star
  * (two edge-list passes per round):
  *
  *   1. hook: `parent(v) = min(v, min neighbor)` — one aggregate over
  *      the (undirected view of the) edge list;
  *   2. pointer-jump `p := p(p)` until the parent forest is
  *      root-compressed — self-joins of the LABEL-SPACE table (≤ one
  *      row per active vertex, not per edge), depth halving each jump;
  *   3. contract: rewrite labels and edges through the root mapping,
  *      dropping intra-tree edges; surviving cross-tree edges carry the
  *      merge information into the next round.
  *
  * The full edge list is touched only while cross-tree edges remain and
  * shrinks geometrically — dense near-dup cliques collapse in round 1,
  * so the big list is usually scanned once. O(log n) rounds worst case
  * (`maxIter` is a backstop). `localCheckpoint` truncates lineage
  * between rounds; the label-space joins carry explicit broadcast hints
  * because checkpointed RDDs have no stats for Catalyst (AQE would
  * shuffle the full edge volume against a table thousands of times
  * smaller) — at a scale where the ACTIVE-label table itself outgrows
  * broadcast, drop the hints and the same plan degrades to shuffle
  * joins gracefully.
  */
object Graph {

  /** @param vertices one column, the vertex id (name taken from the DF)
    * @param edges    two columns (src, dst by position), undirected
    * @return (id, label) — label = min vertex id of the component */
  def connectedComponents(vertices: DataFrame, edges0: DataFrame,
      maxIter: Int = 20): DataFrame = {
    val idCol = vertices.columns.head
    var lbl = vertices.select(col(idCol).as("id"), col(idCol).as("lbl"))
      .localCheckpoint()
    val Array(srcC, dstC) = edges0.columns.take(2)
    var edges = edges0.select(col(srcC).as("src"), col(dstC).as("dst"))
      .filter(col("src") =!= col("dst"))
      .localCheckpoint()
    var iter = 0
    while (iter < maxIter && !edges.isEmpty) {
      // hook: parent(v) = min(v, min neighbor); roots satisfy p == v
      var parent = edges
        .union(edges.select(col("dst"), col("src")))
        .groupBy("src")
        .agg(least(col("src"), min(col("dst"))).as("p"))
        .select(col("src").as("v"), col("p"))
        .localCheckpoint()
      // pointer-jump p := p(p) until root-compressed; the `moved` flag
      // rides along in the same join, so each jump is ONE
      // materialization plus a checkpoint-local isEmpty
      var jumping = true
      while (jumping) {
        val jumped = parent.as("a")
          .join(parent.select(col("v").as("pv"), col("p").as("pp")),
            col("a.p") === col("pv"))
          .select(col("a.v").as("v"), col("pp").as("p"),
            (col("pp") =!= col("a.p")).as("moved"))
          .localCheckpoint()
        jumping = !jumped.filter(col("moved")).isEmpty
        parent = jumped.select("v", "p")
      }
      // rewrite labels through the root mapping (absent = already root)
      lbl = lbl
        .join(broadcast(parent.select(col("v").as("lbl"), col("p"))),
          Seq("lbl"), "left")
        .select(col("id"), coalesce(col("p"), col("lbl")).as("lbl"))
        .localCheckpoint()
      // contract: surviving edges connect different trees;
      // re-canonicalize orientation so the checkpoint stays deduplicated
      edges = edges
        .join(broadcast(parent.select(col("v").as("src"), col("p").as("ps"))), "src")
        .join(broadcast(parent.select(col("v").as("dst"), col("p").as("pd"))), "dst")
        .filter(col("ps") =!= col("pd"))
        .select(least(col("ps"), col("pd")).as("src"),
          greatest(col("ps"), col("pd")).as("dst"))
        .distinct()
        .localCheckpoint()
      iter += 1
    }
    lbl
  }
}
