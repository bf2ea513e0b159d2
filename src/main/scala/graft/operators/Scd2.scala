package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension maintenance (Kimball SCD2): apply a
  * change batch to a versioned dimension in ONE key-equi full-outer
  * join — no MERGE loop, no driver state, no per-key lookups.
  *
  * Dimension rows carry `(valid_from, valid_to, is_current)`:
  * `valid_to` is null while a version is open. One batch application:
  *
  *  - history rows (`is_current = false`) pass through untouched;
  *  - a current row whose change batch row differs on any tracked
  *    column is CLOSED (`valid_to = batchVersion`) and a fresh open
  *    version of the incoming attributes is inserted;
  *  - a current row with no change, or a change identical on every
  *    tracked column (the no-op update), passes through;
  *  - a change key absent from the dimension inserts a first open
  *    version.
  *
  * Scale shape: the only wide operation is the full-outer join of the
  * CURRENT slice against the batch, both shuffled once on the key; the
  * history slice is a pass-through union that never shuffles. Null-safe
  * equality (`<=>`) decides "changed", so null attribute values
  * roundtrip without phantom versions.
  *
  * Reference scope note: the reference app persists analytics snapshots
  * without version history (`app.py` rewrites its cached collections
  * in place); SCD2 is the standard warehouse-grade upgrade of that
  * surface — the [[Upsert]] / [[Mv]] family's history-keeping sibling.
  */
object Scd2 {

  /** @param dim      dimension with `key`, the attribute columns, and
    *                  `valid_from: long`, `valid_to: long?`,
    *                  `is_current: boolean`
    * @param changes  one row per key — `key` plus the same attribute
    *                  columns (at least every `tracked` column)
    * @param key      business key column
    * @param tracked  columns whose change opens a new version
    * @param batchVersion version stamped on closes and inserts; must be
    *                  greater than every open `valid_from`
    */
  def apply(dim: DataFrame, changes: DataFrame, key: String,
      tracked: Seq[String], batchVersion: Long): DataFrame = {
    require(tracked.nonEmpty, "tracked columns must be non-empty")
    val attrs = dim.columns.filterNot(
      c => c == key || c == "valid_from" || c == "valid_to" || c == "is_current").toSeq
    require(tracked.forall(attrs.contains),
      s"tracked ${tracked.mkString(",")} not all in dim attrs ${attrs.mkString(",")}")
    require(tracked.forall(changes.columns.contains),
      s"changes is missing tracked columns")

    val hist = dim.filter(!col("is_current"))
    val cur = dim.filter(col("is_current"))

    val j = cur.as("c").join(changes.as("n"), col(s"c.$key") <=> col(s"n.$key"),
      "full_outer")
    val hasCur = col(s"c.$key").isNotNull
    val hasNew = col(s"n.$key").isNotNull
    val differs = tracked.map(t => !(col(s"c.$t") <=> col(s"n.$t"))).reduce(_ || _)

    // current rows that survive as-is: no incoming row, or a no-op change
    val kept = j.filter(hasCur && (!hasNew || !differs))
      .select(col(s"c.$key").as(key) +: attrs.map(a => col(s"c.$a").as(a)) :+
        col("c.valid_from").as("valid_from") :+
        col("c.valid_to").as("valid_to") :+
        col("c.is_current").as("is_current"): _*)
    // real changes close the open version at the batch stamp
    val closed = j.filter(hasCur && hasNew && differs)
      .select(col(s"c.$key").as(key) +: attrs.map(a => col(s"c.$a").as(a)) :+
        col("c.valid_from").as("valid_from") :+
        lit(batchVersion).as("valid_to") :+
        lit(false).as("is_current"): _*)
    // ... and open a fresh one; unseen keys insert their first version.
    // Untracked attributes come from the incoming row when it carries
    // them, else carry over from the closed version (null for inserts).
    val fresh = j.filter(hasNew && (!hasCur || differs))
      .select(col(s"n.$key").as(key) +: attrs.map { a =>
        (if (changes.columns.contains(a)) col(s"n.$a") else col(s"c.$a")).as(a)
      } :+
        lit(batchVersion).as("valid_from") :+
        lit(null).cast("long").as("valid_to") :+
        lit(true).as("is_current"): _*)

    hist.select(kept.columns.toIndexedSeq.map(col): _*)
      .unionByName(kept).unionByName(closed).unionByName(fresh)
  }

  /** Point-in-time read of a type-2 dimension: the version visible AT
    * `version` — `valid_from <= version < valid_to` (an open version
    * has null `valid_to`). This is why the history is kept at all: any
    * past training snapshot's dimension state reproduces exactly, the
    * [[Upsert.readAt]] contract for versioned dimensions. A pure
    * filter — no join, no window, trivially partition-prunable when the
    * dimension is stored partitioned on a `valid_from` range.
    */
  def asOf(dim: DataFrame, version: Long): DataFrame =
    dim.filter(col("valid_from") <= version &&
      (col("valid_to").isNull || col("valid_to") > version))
      .drop("is_current")
}
