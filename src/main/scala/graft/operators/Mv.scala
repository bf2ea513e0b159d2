package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance over a weighted changelog
  * (the Z-set / DBSP formulation: every change is a row with an integer
  * multiplicity, +w inserts, −w retracts; see McSherry et al.,
  * "Differential Dataflow", CIDR 2013).
  *
  * The maintained view is a per-key bag of additive counters (COUNT and
  * SUMs — the self-maintainable aggregates). Refreshing it never touches
  * the base facts again:
  *
  *   1. the changelog is pre-aggregated per key (shuffle is DELTA-sized,
  *      map-side combined — at 100 TB the delta is hours of CDC, not the
  *      years-old base);
  *   2. one key-equi full-outer join merges delta partials into the
  *      view (view-sized, and shuffle-free on the view side when the
  *      view table is bucketed/partitioned by its key — the layout a
  *      long-lived MV store would use);
  *   3. keys whose multiplicity reaches zero DROP OUT — retraction of a
  *      group's last row deletes the group, exactly like the full
  *      recompute would.
  *
  * This is the maintenance shape `MERGE INTO` compiles to on table
  * formats, generalized to negative multiplicities so deletes don't
  * force a recompute. The oracle twin for the catalog query is the full
  * recompute over (base ∖ retracted) ∪ inserted — content equality with
  * the incremental path is the IVM correctness statement.
  */
object Mv {

  /** Per-key additive counters from a weighted changelog: multiplicity
    * `n` = Σw and, for each measure column m, `sum_m` = Σ w·m. The same
    * shape builds the initial view (all weights +1) and the delta
    * partial — IVM's "the aggregate of a union is the merge of the
    * aggregates".
    */
  def counters(changelog: DataFrame, keys: Seq[String], weight: String,
      measures: Seq[String]): DataFrame = {
    val aggs = sum(col(weight)).cast("long").as("n") +:
      measures.map(m => sum(col(weight) * col(m)).cast("long").as(s"sum_$m"))
    changelog.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Z-set equi-join: multiplicities MULTIPLY (the bag-join semantics
    * that makes join bilinear over ℤ-weighted bags). Both inputs carry
    * a `weight` column; sides must otherwise have disjoint column
    * names.
    */
  def zJoin(a: DataFrame, b: DataFrame, aKey: String, bKey: String,
      weight: String = "w"): DataFrame = {
    val l = a.withColumnRenamed(weight, "__wl")
    val r = b.withColumnRenamed(weight, "__wr")
    l.join(r, col(aKey) === col(bKey))
      .withColumn(weight, col("__wl") * col("__wr"))
      .drop("__wl", "__wr")
  }

  /** Delta of an equi-join under the BILINEAR rule:
    *
    *   Δ(A ⋈ B) = ΔA ⋈ B ∪ A ⋈ ΔB ∪ ΔA ⋈ ΔB
    *
    * (weights multiplying in each term). This is what makes join IVM
    * affordable at 100 TB: every term joins a DELTA (hours of CDC)
    * against a base or another delta — the quadratically large
    * base ⋈ base term is never recomputed. Retractions flow through as
    * negative multiplicities, so updates (retract + insert) on either
    * side maintain the view exactly; correctness is algebraic
    * (bilinearity over ℤ-bags), and the catalog oracle states it as
    * content equality with the full recompute.
    */
  def deltaJoin(aOld: DataFrame, aDelta: DataFrame,
      bOld: DataFrame, bDelta: DataFrame,
      aKey: String, bKey: String, weight: String = "w"): DataFrame =
    zJoin(aDelta, bOld, aKey, bKey, weight)
      .unionByName(zJoin(aOld, bDelta, aKey, bKey, weight))
      .unionByName(zJoin(aDelta, bDelta, aKey, bKey, weight))

  /** Merge delta counters into the view: coalesced sums per counter
    * column, then drop keys whose multiplicity hit zero. Both inputs
    * carry the `counters` schema (keys, n, sum_*).
    */
  def merge(view: DataFrame, delta: DataFrame, keys: Seq[String],
      measures: Seq[String]): DataFrame = {
    val counterCols = "n" +: measures.map(m => s"sum_$m")
    val v = counterCols.foldLeft(view)((df, c) => df.withColumnRenamed(c, s"_v_$c"))
    val d = counterCols.foldLeft(delta)((df, c) => df.withColumnRenamed(c, s"_d_$c"))
    val merged = v.join(d, keys, "full_outer")
      .select(keys.map(col) ++ counterCols.map(c =>
        (coalesce(col(s"_v_$c"), lit(0L)) + coalesce(col(s"_d_$c"), lit(0L))).as(c)): _*)
    merged.filter(col("n") > 0)
  }
}
