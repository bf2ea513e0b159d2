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

  /** Checkpoint cache *state* (keys + timestamps) to parquet — enough to
    * warm-rank entries on restart. The reference serializes full result
    * payloads into one Mongo doc per write (cache.py:125); payloads here
    * are cheap to recompute and schema-heterogeneous, so we persist the
    * metadata only.
    */
  def checkpoint(spark: SparkSession, path: String): Unit = {
    val snap = synchronized(entries.toSeq.map { case (k, e) =>
      (k, e.timestampMs, e.rows.size.toLong)
    })
    import spark.implicits._
    snap.toDF("key", "timestamp_ms", "n_rows")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Keys from a checkpoint, LRU-order (oldest first) — the restart
    * warm-up list (reference reloads its serialized cache at startup,
    * cache.py:62-67; payloads here are recomputed by re-running the
    * queries for these keys, not deserialized).
    */
  def checkpointedKeys(spark: SparkSession, path: String): Seq[String] =
    spark.read.parquet(path)
      .orderBy("timestamp_ms")
      .collect().map(_.getAs[String]("key")).toSeq
}
