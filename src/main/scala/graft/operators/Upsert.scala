package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Upsert (MERGE) as a plan: updates win by key, unmatched base rows
  * survive, brand-new keys insert — the incremental-refresh shape Spark
  * SQL lacks without a table format underneath (Delta/Iceberg MERGE
  * INTO compiles to exactly this join).
  *
  * One shuffle on the key. The result is a snapshot DataFrame — write it
  * back with any sink (parquet overwrite, [[Shards.writeShards]], …).
  */
object Upsert {

  /** `base` merged with `updates` on `key`: update rows replace matching
    * base rows wholesale (reference semantics of a keyed dict upsert —
    * the ingest path's last-writer-wins, TweetIngest.scala), others pass
    * through. Schemas must match.
    *
    * PRECONDITION: `key` must be UNIQUE within `base` and within
    * `updates`. A dict upsert has one slot per key; a relational
    * full-outer join does not — duplicate keys on either side fan out
    * into duplicated output rows silently. Callers with a multi-version
    * update feed must collapse it first: [[latestByKey]] (explicit
    * version order — what upsertSink does with its ts column), never an
    * arbitrary dropDuplicates (nondeterministic winner).
    */
  def apply(base: DataFrame, updates: DataFrame, key: String): DataFrame = {
    require(base.columns.sorted.sameElements(updates.columns.sorted),
      s"schema mismatch: ${base.columns.mkString(",")} vs ${updates.columns.mkString(",")}")
    // explicit aliases: `updates` is routinely derived from `base`
    // (incremental refresh), which makes unqualified self-join column
    // references ambiguous. Column order is aligned to `base` (the
    // result itself leads with the key, so chained upserts must not
    // depend on order).
    val b = base.alias("__b")
    val u = updates.select(base.columns.map(col).toSeq: _*)
      .withColumn("__upd", lit(1)).alias("__u")
    val cols = base.columns.filterNot(_ == key)
    b.join(u, col(s"__b.$key") === col(s"__u.$key"), "full_outer")
      .select(
        coalesce(col(s"__u.$key"), col(s"__b.$key")).as(key) +:
          cols.toSeq.map(c =>
            when(col("__u.__upd").isNotNull, col(s"__u.$c"))
              .otherwise(col(s"__b.$c")).as(c)): _*)
  }

  /** Collapse a multi-version update feed to one row per key: the row
    * with the greatest `orderCol` wins, ties broken by the remaining
    * ORDERABLE columns so the winner is deterministic (a bare
    * dropDuplicates picks whichever partition arrives first). Run this
    * before [[apply]] when the feed can carry several versions of a key.
    * Non-orderable columns (maps, structs containing them) are excluded
    * from the tie-break rather than failing analysis; rows identical on
    * every orderable column but differing in a map value would tie
    * arbitrarily — carry an explicit version/sequence column if the feed
    * can produce that.
    */
  def latestByKey(updates: DataFrame, key: String, orderCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // tie-break only on ORDERABLE column types: a map (or a struct
    // containing one) in the feed would fail the Window's orderBy
    // analysis even when orderCol alone is decisive
    def orderable(dt: org.apache.spark.sql.types.DataType): Boolean =
      org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(dt)
    val tieBreak = updates.schema.fields
      .filterNot(f => f.name == key || f.name == orderCol)
      .filter(f => orderable(f.dataType))
      .map(f => col(f.name)).toSeq
    val w = Window.partitionBy(col(key))
      .orderBy((col(orderCol).desc +: tieBreak.map(_.desc)): _*)
    updates.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** TIME TRAVEL over a versioned store: reconstruct the exact state AS
    * OF `version` from the v0 `base` snapshot plus the change `ledger`
    * (rows = [[applyChanges]] changesets stamped with a monotonically
    * increasing `versionCol`). For each key, the LATEST ledger change
    * with version ≤ v wins — a tombstone makes the key absent, an
    * upsert supplies its row (a key deleted then re-upserted at a later
    * version ≤ v is present again); keys the ledger never touched keep
    * their base row. The reproducibility contract a training run needs
    * ("which corpus trained checkpoint N?"): one window over the
    * ledger slice + one keyed merge — reconstruction cost is
    * ledger-proportional, never a batch-by-batch replay loop, and
    * readAt(latest) ≡ the current store by construction (spec-locked).
    */
  def readAt(base: DataFrame, ledger: DataFrame, key: String,
      deleteCol: String, versionCol: String, version: Long): DataFrame = {
    require(ledger.columns.contains(versionCol),
      s"ledger must carry the version column $versionCol")
    val latest = latestByKey(
      ledger.filter(col(versionCol) <= version), key, versionCol)
      .drop(versionCol)
    applyChanges(base, latest, key, deleteCol)
  }

  /** Ledger RETENTION (the VACUUM of the versioned store): fold every
    * change with version ≤ `cutoff` into a new CHECKPOINT base (=
    * [[readAt]] cutoff — the exact state at the cutoff) and truncate
    * the ledger to the tail (version > cutoff). Returns (checkpoint,
    * ledgerTail): persist both, then the old base and the folded ledger
    * slice are reclaimable.
    *
    * The retention contract: every version ≥ cutoff reconstructs
    * EXACTLY from the compacted pair (readAt over (checkpoint, tail) ≡
    * readAt over (base, ledger) — spec-locked), versions < cutoff
    * become unreadable by design. Cost is one [[readAt]] plus a ledger
    * filter — never a batch-by-batch replay, and the checkpoint write
    * is the same size as the store it supersedes.
    */
  def checkpointAt(base: DataFrame, ledger: DataFrame, key: String,
      deleteCol: String, versionCol: String,
      cutoff: Long): (DataFrame, DataFrame) =
    (readAt(base, ledger, key, deleteCol, versionCol, cutoff),
      ledger.filter(col(versionCol) > cutoff))

  /** Full CDC apply: `changes` carries a boolean tombstone column —
    * tombstoned keys are REMOVED from the snapshot (whether or not the
    * same batch also carried an upsert for them: delete wins, the
    * conventional CDC compaction rule), the rest upsert as in [[apply]].
    * Deleting an absent key is a no-op.
    */
  def applyChanges(base: DataFrame, changes: DataFrame, key: String,
      deleteCol: String): DataFrame = {
    require(changes.columns.contains(deleteCol),
      s"changes must carry the tombstone column $deleteCol")
    val upserts = changes
      .filter(!coalesce(col(deleteCol), lit(false)))
      .drop(deleteCol)
    val tombstones = changes
      .filter(coalesce(col(deleteCol), lit(false)))
      .select(col(key).as("__del_key")).distinct()
    apply(base, upserts, key)
      .join(tombstones, col(key) === col("__del_key"), "left_anti")
  }
}
