package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed triangle counting over an undirected edge list — the
  * clustering-coefficient / community-density primitive that rounds out
  * the graph family (PageRank centrality, connected components): in a
  * near-dup similarity graph, triangle-dense neighborhoods are template
  * families (every variant close to every other), while triangle-free
  * stars are hub false-positives of a single over-shared shingle — the
  * two need different curation treatment, and edge/vertex counts alone
  * can't tell them apart.
  *
  * The naive plan (join the edge list with itself on a shared endpoint,
  * then close) enumerates every WEDGE — Σ deg(v)², which a single hot
  * hub turns into a quadratic blowup ("the curse of the last reducer",
  * Suri & Vassilvitskii, WWW 2011). This operator uses their
  * degree-ordered fix: orient each undirected edge from the endpoint
  * with the smaller (degree, id) to the larger, so every vertex's
  * OUT-degree is ≤ O(√m) and total wedge volume is O(m^1.5) regardless
  * of skew — each triangle is then generated exactly once, from its
  * minimum-(degree, id) apex. Every step is an equi-join or a grouped
  * count (edge canonicalization, degree agg, two degree-attach joins,
  * the apex-keyed wedge self-join, the (a,b)-keyed closing join);
  * nothing is ever keyed by a raw vertex alone after orientation, so a
  * hot hub costs what its √m out-degree allows, not its full degree.
  *
  * Ties are broken by vertex id, making the orientation a total order:
  * results are exact and partitioning-independent, so any engine
  * reproduces them bit-for-bit (the oracle enumerates the same
  * triangles with a plain id-ordered 3-way join — orientation changes
  * the PLAN's worst case, never the result set).
  */
object Graph {

  /** Per-vertex triangle participation counts: one row per vertex that
    * closes at least one triangle, `(idCol, tri)`. Input edges are
    * canonicalized first (undirected, self-loops dropped, duplicates
    * collapsed), so callers can pass raw directed/duplicated pairs.
    */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String,
      idCol: String = "id"): DataFrame = {
    // Materialized once (round-17 measured fix): `canon` is read by the
    // degree aggregation AND both sides of the degree-attach joins, and
    // `oriented` below by three join sides — unmaterialized, Catalyst
    // re-inlines the whole upstream pipeline (here: the caller's edge
    // self-join) into every reference, which planned to a 1015-operator
    // tree whose subtrees re-ran per reference. The checkpoint holds
    // one row per edge — the same O(m) executor-storage envelope as the
    // Components per-round materialization.
    val canon = edges
      .filter(col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .distinct()
      .localCheckpoint()

    // Undirected degree over the canonical edge set.
    val deg = canon.select(col("u").as("id"))
      .unionByName(canon.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))

    // (degree, id) lexicographic order — the total order that bounds
    // out-degree at O(sqrt(m)) after orientation.
    def lt(d1: Column, i1: Column, d2: Column, i2: Column): Column =
      d1 < d2 || (d1 === d2 && i1 < i2)

    // Orient low -> high; keep the head's (deg, id) for wedge ordering.
    val du = deg.select(col("id").as("u"), col("deg").as("du"))
    val dv = deg.select(col("id").as("v"), col("deg").as("dv"))
    val oriented = canon.join(du, "u").join(dv, "v")
      .select(
        when(lt(col("du"), col("u"), col("dv"), col("v")), col("u"))
          .otherwise(col("v")).as("src"),
        when(lt(col("du"), col("u"), col("dv"), col("v")), col("v"))
          .otherwise(col("u")).as("dst"),
        when(lt(col("du"), col("u"), col("dv"), col("v")), col("dv"))
          .otherwise(col("du")).as("ddst"))
      .localCheckpoint()

    // Wedges from each apex: unordered head pairs, emitted once with
    // heads in (deg, id) order — the closing edge, if present, is
    // oriented exactly a -> b under the same total order.
    val x = oriented.select(col("src"), col("dst").as("a"), col("ddst").as("da"))
    val y = oriented.select(col("src"), col("dst").as("b"), col("ddst").as("db"))
    val wedges = x.join(y, "src")
      .filter(lt(col("da"), col("a"), col("db"), col("b")))
    val closing = oriented.select(col("src").as("a"), col("dst").as("b"))
    val triangles = wedges.join(closing, Seq("a", "b"))
      .select(col("src").as("x"), col("a").as("y"), col("b").as("z"))

    // explode, not a 3-way union: a union re-evaluates the triangle
    // join once per branch (and triples the plan); the explode emits
    // the three corners from ONE evaluation — same rows, same counts
    triangles
      .select(explode(array(col("x"), col("y"), col("z"))).as(idCol))
      .groupBy(idCol).agg(count(lit(1)).as("tri"))
  }
}
