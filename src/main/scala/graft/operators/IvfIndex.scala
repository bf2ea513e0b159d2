package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Vectors
import graft.sources.Warehouse

/** PERSISTED IVF index — how a production vector index actually
  * deploys, vs the inline [[Ivf]] searches that re-run Lloyd rounds on
  * every query:
  *
  *  1. [[build]] trains the coarse quantizer ONCE and persists the
  *     whole index as managed tables: a k-row `centroids` model table
  *     and a `postings` table PARTITIONED BY `centroid_id` — at 100 TB
  *     the posting lists are directory-per-cell, so a probe is
  *     partition pruning (the scan never opens unprobed cells' files).
  *  2. [[search]] reads the model (k rows — bounded state), picks the
  *     probe set driver-side, and scans ONLY the probed partitions:
  *     zero Lloyd rounds, zero aggregates in the plan. Every query
  *     after the first amortizes the one-time training, the same
  *     pay-once economics as the bucketed fact layout (j12/j13).
  *  3. [[appendBatch]] grows the index without retraining: the new
  *     batch is ASSIGNED to the existing centroids (one map-side pass)
  *     and appended into the postings partitions — the incremental
  *     ingest path (`dedup_incremental`'s shape applied to ANN). The
  *     model goes stale as the distribution drifts; the recall ladder
  *     (`sim_recall_matrix`) prices that staleness.
  *
  * Determinism: the model is [[Ivf.train]]'s fixed-point Lloyd, and
  * centroid doubles round-trip parquet bit-exactly, so the DuckDB
  * oracle re-derives the identical persisted model from the corpus.
  */
object IvfIndex {

  /** Table-name pair for one persisted index. */
  final case class Names(centroids: String, postings: String)

  def names(prefix: String, fingerprint: String): Names =
    Names(s"${prefix}_cent_$fingerprint", s"${prefix}_post_$fingerprint")

  def exists(spark: SparkSession, n: Names): Boolean =
    spark.catalog.tableExists(n.centroids) && spark.catalog.tableExists(n.postings)

  /** Train on `emb` (k = max(8, ⌈n/512⌉) unless given, iters Lloyd
    * rounds) and persist model + assigned postings. The one-time cost a
    * production index pays at build; every [[search]] after it is
    * retrain-free. `payloadCols` ride along in the posting lists —
    * metadata a FILTERED search predicates on must live IN the index
    * (joining a side table per query would defeat the pruned scan).
    */
  def build(emb: DataFrame, idCol: String, vecCol: String, n: Names,
      k: Int, iters: Int = 2,
      payloadCols: Seq[String] = Nil): Array[Array[Double]] = {
    val spark = emb.sparkSession
    import spark.implicits._
    // a rebuild-by-name must not inherit a previous index's tombstones
    // (they would silently exclude re-indexed vectors from every read)
    Warehouse.dropWithLocation(spark, tombstoneTable(n))
    val cents = Ivf.train(emb, idCol, vecCol, k = k, iters = iters)
    Warehouse.writeTable(
      cents.zipWithIndex.toSeq.map { case (c, i) => (i, c.toSeq) }.toDF("cid", "c"),
      n.centroids)
    Warehouse.writePartitioned(
      Ivf.assignAny(emb, idCol, vecCol, cents)
        .select((Seq(idCol, vecCol) ++ payloadCols :+ "centroid_id").map(col): _*),
      n.postings, "centroid_id")
    cents
  }

  /** Load the persisted model: k rows off the centroids table — the
    * bounded driver-side state every IVF search starts from.
    */
  def loadCentroids(spark: SparkSession, n: Names): Array[Array[Double]] =
    spark.table(n.centroids).orderBy("cid").select("c")
      .collect().map(_.getSeq[Double](0).toArray)

  /** Grow the index WITHOUT retraining: assign `batch` to the existing
    * centroids (map-side — zero Lloyd rounds anywhere in the job) and
    * append into the postings partitions. At 100 TB this is the nightly
    * ingest: hours of new vectors, never a re-cluster of the corpus.
    *
    * Pass-through columns are derived from the POSTINGS schema (id +
    * vector + any payload columns the index was built with), so a
    * payload-built index (filtered search) grows exactly like a bare
    * one — the batch just has to carry the same columns.
    */
  def appendBatch(spark: SparkSession, n: Names, batch: DataFrame,
      idCol: String, vecCol: String,
      centroids: Option[Array[Array[Double]]] = None): Unit = {
    // callers appending many batches against one model (the streaming
    // drains) load the k-row model once and pass it in — per-batch
    // reloads were ~20% of each micro-batch's cost
    val cents = centroids.getOrElse(loadCentroids(spark, n))
    val passCols = spark.table(n.postings).columns.filterNot(_ == "centroid_id")
    val missing = passCols.filterNot(batch.columns.contains)
    require(missing.isEmpty,
      s"batch is missing index column(s) ${missing.mkString(", ")} — " +
        s"the ${n.postings} postings carry (${passCols.mkString(", ")})")
    Warehouse.appendInto(
      Ivf.assignAny(batch, idCol, vecCol, cents)
        .select((passCols :+ "centroid_id").map(col).toSeq: _*),
      n.postings)
    // re-ingest clears a tombstone: the appended version IS the live row
    // (a takedown blocks the old vector, never a future re-ingest — the
    // pipeline_incremental ledger rule applied to the vector index).
    // Rewrite only when some tombstone actually matches the batch: the
    // overlap probe is one limit-1 job on the bounded tombstone table,
    // the rewrite it usually skips is a checkpoint + drop + write +
    // refresh per appended batch (measured ~0.3 s each in the drains,
    // whose add/del sets are disjoint by construction).
    val tombT = tombstoneTable(n)
    if (spark.catalog.tableExists(tombT)) {
      val batchIds = batch.select(col(idCol)).distinct()
      val overlap = spark.table(tombT).join(batchIds, Seq(idCol), "left_semi")
      if (!overlap.isEmpty) {
        val remaining = spark.table(tombT)
          .join(batchIds, Seq(idCol), "left_anti")
          .localCheckpoint()
        // in-place data rewrite: the table exists (the guard above), so
        // skip writeTable's DROP + delete-location + CREATE churn
        Warehouse.overwriteInto(remaining, tombT)
      }
    }
  }

  // --------------------------------------------------------------------
  // Deletion lifecycle: tombstones → filtered reads → compaction
  // --------------------------------------------------------------------

  /** The index's tombstone side-table (created by the first [[delete]];
    * absent on an index that never deleted — zero plan overhead until
    * the feature is used). Keyed on the POSTINGS table, so the flat
    * ([[Names]]) and quantized ([[PqNames]]) layouts share one
    * lifecycle.
    */
  def tombstoneTable(postings: String): String = s"${postings}_tomb"
  def tombstoneTable(n: Names): String = tombstoneTable(n.postings)
  def tombstoneTable(n: PqNames): String = tombstoneTable(n.postings)

  /** Delete vectors by id — the PII-takedown / dedup-drop reality of a
    * curation pipeline: ids land in a bounded tombstone table (the
    * delete-bitmap design every production index uses — a takedown
    * list is driver-bounded by nature), every read path
    * ([[search]] / [[searchBatch]] / [[stats]] / [[health]]) anti-joins
    * it, and [[compact]] folds the tombstones into a physical rewrite
    * of ONLY the affected partitions. Idempotent (distinct ids).
    */
  def delete(spark: SparkSession, n: Names, idCol: String, ids: Seq[Long]): Unit =
    deleteFrom(spark, n.postings, idCol, ids)

  /** [[delete]] for the quantized layout — same tombstone semantics. */
  def delete(spark: SparkSession, n: PqNames, idCol: String, ids: Seq[Long]): Unit =
    deleteFrom(spark, n.postings, idCol, ids)

  /** [[delete]] at DELTA scale — the takedown ids arrive as a DataFrame
    * (first column, cast to long) and NEVER transit the driver: the
    * form a nightly publish or bulk dedup-drop uses when the removed
    * set is a corpus fraction, not a bounded takedown list (the
    * [[graft.operators.TextIndex.delete]] DataFrame-face twin). A
    * corpus-fraction delete should be followed by [[compact]] — the
    * read paths broadcast the tombstones on the premise that they stay
    * bounded between compactions. Idempotent (distinct ids).
    */
  def delete(spark: SparkSession, n: Names, idCol: String, ids: DataFrame): Unit =
    deleteFromDf(spark, n.postings, idCol, ids)

  /** DataFrame-face [[delete]] for the quantized layout. */
  def delete(spark: SparkSession, n: PqNames, idCol: String, ids: DataFrame): Unit =
    deleteFromDf(spark, n.postings, idCol, ids)

  private def deleteFrom(spark: SparkSession, postings: String,
      idCol: String, ids: Seq[Long]): Unit = {
    require(ids.nonEmpty, "delete needs at least one id")
    import spark.implicits._
    deleteFromDf(spark, postings, idCol, ids.toDF(idCol))
  }

  private def deleteFromDf(spark: SparkSession, postings: String,
      idCol: String, ids: DataFrame): Unit = {
    val tombT = tombstoneTable(postings)
    val add = ids.select(col(ids.columns.head).cast("long").as(idCol)).distinct()
    // APPEND only the genuinely new ids rather than read + union +
    // distinct + rewrite (round-17 drain measurement: the rewrite was
    // ~0.4 s per streamed delete — the extra cost is the table
    // drop/create/refresh churn). The anti-join keeps the table an exact
    // id SET (the documented idempotence contract); the checkpoint cuts
    // lineage so the append never reads the table it inserts into; a
    // fully-redundant delete skips the write outright.
    if (spark.catalog.tableExists(tombT)) {
      val fresh = add.join(spark.table(tombT), Seq(idCol), "left_anti")
        .localCheckpoint()
      if (!fresh.isEmpty) Warehouse.appendInto(fresh, tombT)
    } else Warehouse.writeTable(add, tombT)
  }

  /** Anti-join the tombstones onto a frame carrying `idCol` — the
    * read-path guard. The tombstone side is bounded and broadcasts; an
    * index that never deleted pays nothing (no table, no join).
    */
  private def excludeTombstones(spark: SparkSession, postings: String,
      idCol: String, df: DataFrame): DataFrame = {
    val tombT = tombstoneTable(postings)
    if (spark.catalog.tableExists(tombT))
      df.join(broadcast(spark.table(tombT)), Seq(idCol), "left_anti")
    else df
  }

  /** Fold the tombstones into the physical layout: rewrite ONLY the
    * partitions that contain tombstoned rows (dynamic partition
    * overwrite — untouched cells' files never move), drop any cell the
    * deletes emptied entirely, then drop the tombstone table. At 100 TB
    * this is the nightly compaction: IO proportional to the affected
    * cells, not the index.
    */
  def compact(spark: SparkSession, n: Names, idCol: String): Unit =
    compactPostings(spark, n.postings, idCol)

  /** [[compact]] for the quantized layout — the code postings fold
    * their tombstones exactly like the flat ones (same partition
    * scheme, same dynamic-overwrite rewrite of only affected cells).
    */
  def compact(spark: SparkSession, n: PqNames, idCol: String): Unit =
    compactPostings(spark, n.postings, idCol)

  private def compactPostings(spark: SparkSession, postings: String,
      idCol: String): Unit = {
    val tombT = tombstoneTable(postings)
    if (!spark.catalog.tableExists(tombT)) return
    val tomb = broadcast(spark.table(tombT))
    val post = spark.table(postings)
    val affected = post.join(tomb, Seq(idCol), "left_semi")
      .select(col("centroid_id")).distinct().collect().map(_.get(0))
    if (affected.nonEmpty) {
      // materialize the survivors BEFORE overwriting their own source
      // partitions (a lazy plan would read files the write deletes)
      val survivors = post
        .filter(col("centroid_id").isInCollection(affected))
        .join(tomb, Seq(idCol), "left_anti")
        .localCheckpoint()
      val keptCells = survivors.select(col("centroid_id"))
        .distinct().collect().map(_.get(0)).toSet
      // dynamic partition overwrite must be set on the SESSION for
      // insertInto (the writer-level option is ignored on this path —
      // static mode would truncate the whole table); scoped + restored
      val modeKey = "spark.sql.sources.partitionOverwriteMode"
      val prevMode = spark.conf.get(modeKey, "STATIC")
      spark.conf.set(modeKey, "dynamic")
      try survivors
        .select(post.columns.map(col).toSeq: _*)
        .repartition(col("centroid_id"))
        .write.mode("overwrite")
        .insertInto(postings)
      finally spark.conf.set(modeKey, prevMode)
      // a cell whose EVERY row was tombstoned has no survivor rows, so
      // dynamic overwrite never touches it — drop it explicitly or the
      // deleted rows resurrect
      affected.filterNot(keptCells).foreach { c =>
        spark.sql(
          s"ALTER TABLE $postings DROP IF EXISTS PARTITION (centroid_id=$c)")
      }
      spark.catalog.refreshTable(postings)
    }
    Warehouse.dropWithLocation(spark, tombT)
  }

  /** ACT on [[health]]'s rebuild signal — the one sanctioned time to
    * pay Lloyd again: retrain the coarse quantizer on the LIVE rows
    * (tombstones excluded — the takedowns that triggered the rebuild
    * never shape the new model), rewrite centroids + postings, and
    * fold the tombstone table away (the physical rows are gone, so the
    * read-path guard has nothing left to exclude). Payload columns are
    * carried from the old postings schema, so a filtered index rebuilds
    * intact. Flat layout only — the postings must carry `vecCol` (a
    * quantized index re-encodes from the source table instead).
    * Closes the lifecycle loop: build → search → grow → delete →
    * observe ([[stats]]) → decide ([[health]]) → act (this).
    */
  def rebuild(spark: SparkSession, n: Names, idCol: String, vecCol: String,
      iters: Int = 2): Array[Array[Double]] = {
    val post = spark.table(n.postings)
    val payload = post.columns
      .filterNot(Set(idCol, vecCol, "centroid_id")).toSeq
    // materialize the live rows BEFORE build overwrites their source
    val live = excludeTombstones(spark, n.postings, idCol,
      post.select((Seq(idCol, vecCol) ++ payload).map(col): _*))
      .localCheckpoint()
    val liveCount = live.count()
    // a FULLY tombstoned index has nothing to retrain on: Lloyd over
    // zero rows would write an empty model that health then calls
    // healthy (n_cells=0, rebuild_due=false) — the one index that most
    // needs attention silently passing. The takedown-everything case is
    // a DROP decision, not a retrain; refuse loudly.
    require(liveCount > 0,
      s"rebuild of ${n.postings}: zero live rows (fully tombstoned) — " +
        "drop the index instead of retraining on an empty corpus")
    val k = math.max(8L, (liveCount + 511) / 512).toInt
    val cents = build(live, idCol, vecCol, n, k = k, iters = iters,
      payloadCols = payload)
    Warehouse.dropWithLocation(spark, tombstoneTable(n))
    cents
  }

  /** [[rebuild]] for the QUANTIZED layout — closes the lifecycle
    * asymmetry where [[health]]'s rebuild signal pointed at an action
    * only the flat index could take: retrain the coarse quantizer AND
    * all m codebooks on the LIVE rows (tombstones excluded), re-encode
    * every live vector, rewrite all three tables, fold the tombstone
    * table away. The code postings don't carry vectors, so live vectors
    * are fetched from `source` by an id-keyed join (the searchPq
    * re-rank economics applied to the rebuild); payload columns carry
    * over from the old postings schema, so a filtered quantized index
    * rebuilds intact. Seeds follow [[Ivf.train]]'s first-k-by-id over
    * the live slice (rank-based — a deleted low id never seeds).
    */
  def rebuildPq(spark: SparkSession, n: PqNames, idCol: String, vecCol: String,
      source: DataFrame, dim: Int, m: Int, pqK: Int, iters: Int = 2): Unit = {
    val post = spark.table(n.postings)
    val codeCols = (0 until m).map(j => s"code$j").toSet
    val payload = post.columns
      .filterNot(c => c == idCol || c == "centroid_id" || codeCols(c)).toSeq
    // materialize the live rows (id + payload from the postings, vector
    // from the source table) BEFORE buildPq overwrites their source
    val live = excludeTombstones(spark, n.postings, idCol,
      post.select((idCol +: payload).map(col): _*))
      .join(source.select(col(idCol), col(vecCol)), Seq(idCol))
      .localCheckpoint()
    val liveCount = live.count()
    require(liveCount > 0,
      s"rebuildPq of ${n.postings}: zero live rows (fully tombstoned) — " +
        "drop the index instead of retraining on an empty corpus")
    val k = math.max(8L, (liveCount + 511) / 512).toInt
    buildPq(live, idCol, vecCol, n, k = k, dim = dim, m = m, pqK = pqK,
      iters = iters, payloadCols = payload)
    Warehouse.dropWithLocation(spark, tombstoneTable(n))
  }

  /** Index-health decision row — what [[stats]] observes, turned into
    * the operator's rebuild signal: live/tombstone volume, the
    * max-cell/mean-cell imbalance (a stale quantizer concentrates new
    * mass in few cells), and `rebuild_due` when tombstones are ≥ 10% of
    * the index or the hottest cell is ≥ 3× the mean. All-integer math
    * (truncating div), so the decision is hash-exact cross-engine.
    */
  def health(spark: SparkSession, n: Names, idCol: String): DataFrame =
    healthOf(spark, n.postings, idCol)

  /** [[health]] for the quantized layout — the decision reads only the
    * cell assignment and the tombstones, both of which the code
    * postings carry exactly like the flat ones.
    */
  def health(spark: SparkSession, n: PqNames, idCol: String): DataFrame =
    healthOf(spark, n.postings, idCol)

  private def healthOf(spark: SparkSession, postings: String,
      idCol: String): DataFrame = {
    val post = spark.table(postings).select(col(idCol), col("centroid_id"))
    val tombT = tombstoneTable(postings)
    val tombstoned =
      if (spark.catalog.tableExists(tombT))
        post.join(broadcast(spark.table(tombT)), Seq(idCol), "left_semi")
      else post.limit(0)
    val cells = excludeTombstones(spark, postings, idCol, post)
      .groupBy("centroid_id").agg(count(lit(1)).as("nc"))
    cells
      .agg(count(lit(1)).cast("long").as("n_cells"),
        // coalesce: a FULLY-tombstoned index has zero live cells — the
        // sums go null and the div-by-zero ratios would go null too,
        // silently un-flagging the one index that most needs a rebuild
        coalesce(sum("nc"), lit(0L)).cast("long").as("n_live"),
        coalesce(max("nc"), lit(0L)).cast("long").as("max_cell"))
      .crossJoin(broadcast(
        tombstoned.agg(count(lit(1)).cast("long").as("n_tombstones"))))
      .select(col("n_cells"), col("n_live"), col("n_tombstones"),
        when(col("n_live") + col("n_tombstones") === 0, lit(0L))
          .otherwise(expr("n_tombstones * 100 div (n_live + n_tombstones)"))
          .as("tomb_pct"),
        when(col("n_live") === 0, lit(0L))
          .otherwise(expr("max_cell * 100 * n_cells div n_live"))
          .as("imbalance_x100"))
      .withColumn("rebuild_due",
        col("tomb_pct") >= 10 || col("imbalance_x100") >= 300)
  }

  /** Search the persisted index: cosine top-`k` over the `nprobe`
    * probed cells, query = the indexed vector `queryId` (excluded from
    * results). The plan is scan(partition-pruned) → project(DotProduct)
    * → TakeOrderedAndProject: NO aggregate, NO Lloyd round — locked in
    * PlanSpec. Returns (idCol, centroid_id, score).
    *
    * `queryFrom` is where the query VECTOR is looked up — pass the
    * source table (one pushed-filter point read) when you have it; the
    * fallback reads the postings table, which at scale means opening
    * every cell's partition for one row (measured 3.9 s vs 0.6 s at
    * 100× on a 391-cell index). Production query vectors arrive from
    * the application anyway — the index is probed, not point-scanned.
    */
  def search(spark: SparkSession, n: Names, idCol: String, vecCol: String,
      queryId: Long, k: Int = 10, nprobe: Int = 2,
      queryFrom: Option[DataFrame] = None,
      payloadFilter: Column = lit(true)): DataFrame = {
    val post = spark.table(n.postings)
    val q = queryFrom.getOrElse(post).filter(col(idCol) === queryId)
      .select(Vectors.toDouble(col(vecCol)))
      .collect().head.getSeq[Double](0).toArray
    val cents = loadCentroids(spark, n)
    val probed = Ivf.probeSet(q, cents, nprobe)
    val v = col(vecCol)
    excludeTombstones(spark, n.postings, idCol, post
      // the payload predicate rides the SAME pruned scan (pushed to the
      // posting files' row groups) — a filtered search costs the same
      // probe as an unfiltered one, never a side-table join per query
      .filter(col("centroid_id").isin(probed.toSeq: _*)
        && col(idCol) =!= queryId && payloadFilter))
      .select(col(idCol), col("centroid_id"),
        (Vectors.dot(v, typedlit(q.toSeq)) / Vectors.norm(v)).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** BATCH search over the persisted index: top-`k` neighbors for every
    * query id in ONE pass — the nightly-scoring shape. The query set
    * (ids, vectors, probe cells) is driver-bounded and BROADCASTS; the
    * posting scan is pruned to the UNION of all probe cells and joins
    * on `centroid_id`, so each posting row is scored only against the
    * queries probing its cell; ranking is a per-qid window over the
    * probed slice. Retrain-free like [[search]] (no Lloyd, no corpus
    * aggregate — PlanSpec-locked). Returns (qid, idCol, centroid_id,
    * score) — [[search]]'s documented contract plus the query key.
    */
  def searchBatch(spark: SparkSession, n: Names, idCol: String, vecCol: String,
      queryIds: Seq[Long], k: Int = 3, nprobe: Int = 2,
      queryFrom: Option[DataFrame] = None): DataFrame = {
    import spark.implicits._
    val post = spark.table(n.postings)
    val qs = queryFrom.getOrElse(post)
      .filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol), Vectors.toDouble(col(vecCol)))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val cents = loadCentroids(spark, n)
    val probes = broadcast(qs.toSeq.flatMap { case (qid, qv) =>
      Ivf.probeSet(qv, cents, nprobe).toSeq.map(cid => (qid, cid, qv.toSeq))
    }.toDF("qid", "__pcid", "qv"))
    val allCells = qs.flatMap { case (_, qv) =>
      Ivf.probeSet(qv, cents, nprobe)
    }.distinct.toSeq
    val v = col(vecCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("score").desc, col(idCol))
    excludeTombstones(spark, n.postings, idCol,
        post.filter(col("centroid_id").isin(allCells: _*)))
      .join(probes,
        col("centroid_id") === col("__pcid") && col(idCol) =!= col("qid"))
      .select(col("qid"), col(idCol), col("centroid_id"),
        (Vectors.dot(v, col("qv")) / Vectors.norm(v)).as("score"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
  }

  // --------------------------------------------------------------------
  // Quantized persisted index (IVF-PQ): codes in the postings, not vectors
  // --------------------------------------------------------------------

  /** Table-name triple for one persisted QUANTIZED index: coarse
    * centroids + per-subspace PQ codebooks (both bounded model tables)
    * and code-only posting lists.
    */
  final case class PqNames(centroids: String, codebooks: String, postings: String)

  def pqNames(prefix: String, fingerprint: String): PqNames =
    PqNames(s"${prefix}_cent_$fingerprint", s"${prefix}_book_$fingerprint",
      s"${prefix}_post_$fingerprint")

  def pqExists(spark: SparkSession, n: PqNames): Boolean =
    spark.catalog.tableExists(n.centroids) &&
      spark.catalog.tableExists(n.codebooks) &&
      spark.catalog.tableExists(n.postings)

  /** Build the QUANTIZED persisted index — what [[build]] persists at
    * 100 TB, where the posting payload IS the memory/IO bill: the
    * posting lists carry m small integer CODES per vector (m bytes)
    * instead of the flat vector (dim × 4-8 B — a 64-dim float vector is
    * 256 B, its m=4 code row is 4 B: ~32-64× less probe IO), and the
    * full-precision vectors stay in the SOURCE table, read only for the
    * tiny re-rank pool. Coarse quantizer and PQ codebooks ([[Ivf.train]]
    * / [[Pq.train]] — callers may hand in session-cached models; both
    * are deterministic functions of the corpus) persist as bounded model
    * tables; postings partition by `centroid_id` exactly like the flat
    * layout, so a probe is still directory pruning.
    */
  def buildPq(emb: DataFrame, idCol: String, vecCol: String, n: PqNames,
      k: Int, dim: Int, m: Int, pqK: Int, iters: Int = 2,
      coarseModel: Option[Array[Array[Double]]] = None,
      books: Option[Array[Array[Array[Double]]]] = None,
      payloadCols: Seq[String] = Nil): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    // same stale-tombstone guard as the flat [[build]]
    Warehouse.dropWithLocation(spark, tombstoneTable(n))
    val cents = coarseModel.getOrElse(
      Ivf.train(emb, idCol, vecCol, k = k, iters = iters))
    val cbs = books.getOrElse(
      Pq.train(emb, idCol, vecCol, dim, m, pqK, iters))
    Warehouse.writeTable(
      cents.zipWithIndex.toSeq.map { case (c, i) => (i, c.toSeq) }.toDF("cid", "c"),
      n.centroids)
    Warehouse.writeTable(
      (for {
        (cb, j) <- cbs.zipWithIndex.toSeq
        (c, ci) <- cb.zipWithIndex
      } yield (j, ci, c.toSeq)).toDF("sub", "cid", "c"),
      n.codebooks)
    // encode BEFORE the coarse assignment: Pq.encode's per-subspace
    // argmax works through a scratch "centroid_id" column and would
    // clobber an already-present coarse cell id. Payload columns ride
    // the code postings exactly like the flat layout's — a filtered
    // quantized search predicates on the pruned code scan, never a
    // side-table join.
    Warehouse.writePartitioned(
      Ivf.assignAny(Pq.encode(emb, vecCol, cbs), idCol, vecCol, cents)
        .select((col(idCol) +: ((0 until m).map(j => col(s"code$j"))
          ++ payloadCols.map(col)) :+ col("centroid_id")): _*),
      n.postings, "centroid_id")
  }

  /** Grow the QUANTIZED index without retraining: the new batch is
    * encoded with the persisted codebooks and assigned to the persisted
    * coarse centroids — one map-side pass, zero Lloyd rounds anywhere —
    * then appended into the code postings. Re-ingest clears tombstones
    * exactly like the flat [[appendBatch]].
    */
  def appendBatchPq(spark: SparkSession, n: PqNames, batch: DataFrame,
      idCol: String, vecCol: String,
      models: Option[(Array[Array[Double]], Array[Array[Array[Double]]])] = None)
      : Unit = {
    // multi-batch callers (the streaming drains) load the bounded models
    // once and pass them in — the flat appendBatch rationale
    val (cents, books) = models.getOrElse(
      (loadCentroids(spark, Names(n.centroids, n.postings)),
        loadCodebooks(spark, n)))
    // pass-through = postings schema minus the partition column (id +
    // codes + any payload the index was built with); codes come from
    // the encode below, the rest must ride in on the batch
    val passCols = spark.table(n.postings).columns.filterNot(_ == "centroid_id")
    val codeCols = books.indices.map(j => s"code$j").toSet
    val missing = passCols.filterNot(codeCols).filterNot(batch.columns.contains)
    require(missing.isEmpty,
      s"batch is missing index column(s) ${missing.mkString(", ")} — " +
        s"the ${n.postings} postings carry (${passCols.mkString(", ")})")
    Warehouse.appendInto(
      Ivf.assignAny(Pq.encode(batch, vecCol, books), idCol, vecCol, cents)
        .select((passCols :+ "centroid_id").map(col).toSeq: _*),
      n.postings)
    // rewrite only on actual overlap — the flat appendBatch rationale
    val tombT = tombstoneTable(n)
    if (spark.catalog.tableExists(tombT)) {
      val batchIds = batch.select(col(idCol)).distinct()
      val overlap = spark.table(tombT).join(batchIds, Seq(idCol), "left_semi")
      if (!overlap.isEmpty) {
        val remaining = spark.table(tombT)
          .join(batchIds, Seq(idCol), "left_anti")
          .localCheckpoint()
        // in-place data rewrite — the flat appendBatch rationale
        Warehouse.overwriteInto(remaining, tombT)
      }
    }
  }

  /** Load the persisted PQ codebooks: m × pqK rows off the codebooks
    * table (bounded model state; doubles round-trip parquet bit-exactly,
    * so these ARE the trained [[Pq.train]] arrays).
    */
  def loadCodebooks(spark: SparkSession, n: PqNames): Array[Array[Array[Double]]] =
    spark.table(n.codebooks).orderBy("sub", "cid").collect()
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map(_._2.map(_.getSeq[Double](2).toArray).toArray).toArray

  /** Search the quantized index ADC-first: probe the `nprobe` nearest
    * cells (partition pruning, as in [[search]]), score the pruned
    * posting CODES with per-subspace lookup tables
    * ([[Pq.adcApproxCosine]] — m `element_at`s per row, zero arithmetic
    * on any original vector), keep the approximate top `k·poolFactor`
    * pool, then re-rank the pool at full precision by fetching ONLY its
    * vectors from the source table (`queryFrom`) through an id-keyed
    * broadcast join — the standard PQ two-pass. Retrain-free: zero Lloyd
    * rounds, zero corpus aggregates (PlanSpec-locked). Returns
    * (idCol, centroid_id, score).
    */
  def searchPq(spark: SparkSession, n: PqNames, idCol: String, vecCol: String,
      queryId: Long, k: Int = 10, nprobe: Int = 2, poolFactor: Int = 4,
      queryFrom: DataFrame,
      payloadFilter: Column = lit(true)): DataFrame = {
    val q = queryFrom.filter(col(idCol) === queryId)
      .select(Vectors.toDouble(col(vecCol)))
      .collect().head.getSeq[Double](0).toArray
    val cents = loadCentroids(spark, Names(n.centroids, n.postings))
    val books = loadCodebooks(spark, n)
    val probed = Ivf.probeSet(q, cents, nprobe)
    val pool = excludeTombstones(spark, n.postings, idCol, spark.table(n.postings)
        .filter(col("centroid_id").isin(probed.toSeq: _*)
          && col(idCol) =!= queryId && payloadFilter))
      .select(col(idCol), col("centroid_id"),
        Pq.adcApproxCosine(books, q).as("__as"))
      .orderBy(col("__as").desc, col(idCol))
      .limit(k * poolFactor)
    val v = col(vecCol)
    queryFrom.select(col(idCol), v)
      .join(broadcast(pool), Seq(idCol))
      .select(col(idCol), col("centroid_id"),
        (Vectors.dot(v, typedlit(q.toSeq)) / Vectors.norm(v)).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** BATCH search on the QUANTIZED index — [[searchBatch]]'s one-pass
    * nightly-scoring shape on the code postings: the query set is
    * driver-bounded and BROADCASTS carrying, per query, its probe cells
    * AND its m ADC dot-lookup tables (m·pqK doubles — the per-query
    * half of [[Pq.adcApproxCosine]]'s state; the codeword-norm table is
    * query-INDEPENDENT and rides as one literal). The pruned code scan
    * joins the probe rows on `centroid_id`, each posting row ADC-scores
    * only against the queries probing its cell (m nested `element_at`s
    * — zero arithmetic on any original vector), the per-qid approximate
    * top-(k·poolFactor) pools re-rank exactly from the source table
    * through ONE id-keyed broadcast join. Retrain-free (no Lloyd, no
    * corpus aggregate — PlanSpec-locked). Returns (qid, idCol,
    * centroid_id, score).
    */
  def searchBatchPq(spark: SparkSession, n: PqNames, idCol: String,
      vecCol: String, queryIds: Seq[Long], k: Int = 3, nprobe: Int = 2,
      poolFactor: Int = 4, queryFrom: DataFrame): DataFrame = {
    import spark.implicits._
    val qs = queryFrom.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol), Vectors.toDouble(col(vecCol)))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val cents = loadCentroids(spark, Names(n.centroids, n.postings))
    val books = loadCodebooks(spark, n)
    val m = books.length
    // per-query ADC dot tables (Pq.adcDotTables — the ONE definition of
    // the per-subspace sequential folds, shared with Pq.adcApproxCosine
    // so batch and single search can never drift by an ulp), attached
    // to each probe row
    val probes = broadcast(qs.toSeq.flatMap { case (qid, qv) =>
      val dt = Pq.adcDotTables(books, qv).map(_.toSeq).toSeq
      Ivf.probeSet(qv, cents, nprobe).toSeq.map(cid => (qid, cid, qv.toSeq, dt))
    }.toDF("qid", "__pcid", "qv", "dt"))
    val allCells = qs.flatMap { case (_, qv) =>
      Ivf.probeSet(qv, cents, nprobe)
    }.distinct.toSeq
    val n2T: Seq[Seq[Double]] = Pq.adcNormTables(books).map(_.toSeq).toSeq
    def codeAt(j: Int) = col(s"code$j").cast("int") + 1
    val approxDot = (0 until m)
      .map(j => element_at(element_at(col("dt"), j + 1), codeAt(j)))
      .reduce(_ + _)
    val approxN2 = (0 until m)
      .map(j => element_at(element_at(typedlit(n2T), j + 1), codeAt(j)))
      .reduce(_ + _)
    val wPool = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("__as").desc, col(idCol))
    val pool = excludeTombstones(spark, n.postings, idCol,
        spark.table(n.postings).filter(col("centroid_id").isin(allCells: _*)))
      .join(probes,
        col("centroid_id") === col("__pcid") && col(idCol) =!= col("qid"))
      .select(col("qid"), col(idCol), col("centroid_id"), col("qv"),
        (approxDot / sqrt(approxN2)).as("__as"))
      .withColumn("rn", row_number().over(wPool))
      .filter(col("rn") <= k * poolFactor)
      .select(col("qid"), col(idCol), col("centroid_id"), col("qv"))
    val v = col(vecCol)
    val wFin = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("score").desc, col(idCol))
    queryFrom.select(col(idCol), v)
      .join(broadcast(pool), Seq(idCol))
      .select(col("qid"), col(idCol), col("centroid_id"),
        (Vectors.dot(v, col("qv")) / Vectors.norm(v)).as("score"))
      .withColumn("rn", row_number().over(wFin))
      .filter(col("rn") <= k)
      .drop("rn")
  }

  /** Index-health report: per-cell posting-list volume and id envelope
    * — the balance view an index operator watches (a cell far above
    * the mean says the quantizer is stale for the current distribution
    * and a re-train/split is due). One pruned-free scan + one
    * cell-keyed aggregate; at 100 TB this reads parquet footers'
    * partition stats more than data.
    */
  def stats(spark: SparkSession, n: Names, idCol: String): DataFrame =
    excludeTombstones(spark, n.postings, idCol, spark.table(n.postings))
      .groupBy(col("centroid_id").cast("long").as("centroid_id"))
      .agg(count(lit(1)).as("n_vectors"),
        min(col(idCol)).as("min_id"), max(col(idCol)).as("max_id"))
      .orderBy("centroid_id")
}
