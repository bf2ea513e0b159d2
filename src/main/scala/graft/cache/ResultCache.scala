package graft.cache

import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Driver-side LRU result cache with TTL and parquet checkpointing.
  *
  * Re-implements the reference's `TwitterSearchApp` cache semantics
  * (/root/reference/cache.py:48-126) with its quirks fixed (SURVEY §7.4#6):
  *  - keys are the full normalized parameter tuple (the reference caches
  *    hashtag results under `keyword=None`, cache.py:121);
  *  - the checkpoint is periodic/explicit, not a whole-cache upsert on
  *    every query (cache.py:125);
  *  - TTL is configurable (reference: infinite, cache.py:55).
  *
  * Caches *collected* results (the reference caches ≤50-row lists), not
  * DataFrames — for hot *tables* use `df.persist()`, a different tool.
  */
final class ResultCache(
    maxSize: Int = 100,
    ttlSeconds: Double = Double.PositiveInfinity,
    clock: () => Long = () => System.currentTimeMillis()) {

  private case class Entry(rows: Seq[Row], schemaDDL: String, timestampMs: Long)

  private val entries = mutable.LinkedHashMap.empty[String, Entry]
  val hits = new AtomicLong(0)
  val misses = new AtomicLong(0)

  private def keyOf(namespace: String, params: Seq[(String, String)]): String =
    namespace + "|" + params.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("&")

  /** LRU probe: hit moves the key to most-recent (cache.py:86-90). */
  def get(namespace: String, params: Seq[(String, String)]): Option[Seq[Row]] =
    synchronized {
      val k = keyOf(namespace, params)
      entries.get(k) match {
        case Some(e) if (clock() - e.timestampMs) / 1000.0 <= ttlSeconds =>
          entries.remove(k); entries.put(k, e) // move_to_end
          hits.incrementAndGet()
          Some(e.rows)
        case Some(_) =>
          entries.remove(k); misses.incrementAndGet(); None
        case None =>
          misses.incrementAndGet(); None
      }
    }

  /** Insert with LRU eviction (cache.py:117-124). */
  def put(namespace: String, params: Seq[(String, String)], df: DataFrame): Seq[Row] = {
    val rows = df.collect().toSeq
    synchronized {
      if (entries.size >= maxSize) entries.headOption.foreach(h => entries.remove(h._1))
      entries.put(keyOf(namespace, params), Entry(rows, df.schema.toDDL, clock()))
    }
    rows
  }

  /** Memoizing wrapper: probe, else run + cache (cache.py:82-111). */
  def getOrElse(namespace: String, params: Seq[(String, String)])(run: => DataFrame): Seq[Row] =
    get(namespace, params).getOrElse(put(namespace, params, run))

  def size: Int = synchronized(entries.size)

  /** Checkpoint full cache state — keys, timestamps, AND payloads — to
    * parquet. Rows are JSON-serialized per entry (entries are
    * schema-heterogeneous, so each carries its own schema DDL), mirroring
    * the reference's serialization of result payloads into one Mongo doc
    * per write (cache.py:125, FIXTURES.md §4 `result: JSON-serialized
    * rows`). Cached results are ≤maxSize entries of ≤~50 rows, so the
    * per-entry local jobs are trivially cheap — this is driver-side cache
    * state, not a data path.
    */
  def checkpoint(spark: SparkSession, path: String): Unit = {
    val snap = synchronized(entries.toSeq)
    val recs = snap.map { case (k, e) =>
      val schema = org.apache.spark.sql.types.StructType.fromDDL(e.schemaDDL)
      val payload: Seq[String] =
        if (e.rows.isEmpty) Seq.empty
        else spark.createDataFrame(
          java.util.Arrays.asList(e.rows: _*), schema).toJSON.collect().toSeq
      (k, e.timestampMs, e.rows.size.toLong, e.schemaDDL, payload)
    }
    import spark.implicits._
    recs.toDF("key", "timestamp_ms", "n_rows", "schema_ddl", "payload")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Restore cache state from a checkpoint: repopulates entries (payloads
    * deserialized via each entry's own schema) in LRU order, so a restart
    * serves hits WITHOUT recomputation — the reference's
    * `load_cache_from_mongodb` behavior (cache.py:62-67). JSON round-trip
    * semantics (ISO timestamps, no distinction between missing and null)
    * match the reference's JSON-serialized Mongo payloads.
    */
  def restore(spark: SparkSession, path: String): Int = {
    import spark.implicits._
    val recs = spark.read.parquet(path)
      .orderBy("timestamp_ms")
      .collect()
    val rebuilt = recs.map { r =>
      val k = r.getAs[String]("key")
      val ts = r.getAs[Long]("timestamp_ms")
      val ddl = r.getAs[String]("schema_ddl")
      val payload = r.getAs[scala.collection.Seq[String]]("payload")
      val schema = org.apache.spark.sql.types.StructType.fromDDL(ddl)
      val rows: Seq[Row] =
        if (payload.isEmpty) Seq.empty
        else spark.read.schema(schema)
          .json(spark.createDataset(payload.toSeq)).collect().toSeq
      (k, Entry(rows, ddl, ts))
    }
    synchronized {
      rebuilt.foreach { case (k, e) =>
        if (!entries.contains(k)) {
          if (entries.size >= maxSize) entries.headOption.foreach(h => entries.remove(h._1))
          entries.put(k, e)
        }
      }
      entries.size
    }
  }

  /** Keys from a checkpoint, LRU-order (oldest first). */
  def checkpointedKeys(spark: SparkSession, path: String): Seq[String] =
    spark.read.parquet(path)
      .orderBy("timestamp_ms")
      .collect().map(_.getAs[String]("key")).toSeq
}
