package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-hash diff between two corpus snapshots — the bookkeeping step
  * of an incremental ingestion pipeline: which documents were added,
  * removed, or changed since the last build decides what downstream work
  * (tokenize, embed, re-index, re-dedup) actually has to run.
  *
  * Scale shape: each side reduces to (key, content-hash) in its scan
  * stage — the hash is a fixed-width projection, so the full-outer
  * equi-join shuffles two narrow relations (16-byte hashes, not
  * documents) and AQE handles a small side with a broadcast. No window,
  * no skew hot spot beyond the join key itself (unique per side).
  */
object Snapshot {

  /** md5 over the concatenated content columns, U+0001-separated, with a
    * NULL-distinguishing per-column encoding: NULL → U+0002, non-null
    * value → U+0003 ++ value. The separator guards against
    * column-boundary ambiguity; the prefix distinguishes NULL from every
    * non-null value — ("a", NULL) vs (NULL, "a"), NULL vs '', and a
    * literal U+0002 value all hash differently (bare `concat_ws` silently
    * SKIPS null inputs, which would classify real content changes as
    * 'unchanged'). Residual assumption: content values themselves don't
    * contain U+0001–U+0003 — e.g. ("a<U+0001><U+0003>b", "c") and
    * ("a", "b<U+0001><U+0003>c") still encode identically. True injectivity
    * would need per-value escaping or length prefixes; for the text/binary
    * corpora here the control-character assumption is the cheaper, honest
    * contract. Any
    * engine with md5/concat_ws reproduces it byte-for-byte — DuckDB:
    * `md5(concat_ws(chr(1), CASE WHEN c IS NULL THEN chr(2) ELSE chr(3) ||
    * c END, …))`.
    */
  def contentHash(contentCols: Seq[String]): org.apache.spark.sql.Column =
    md5(concat_ws("\u0001", contentCols.map(c =>
      when(col(c).isNull, lit("\u0002"))
        .otherwise(concat(lit("\u0003"), col(c).cast("string")))): _*))

  /** Classify every key across two snapshots as added / removed /
    * changed / unchanged. Output: (key, status, old_hash, new_hash) —
    * hashes kept so a downstream stage can route work without re-reading
    * either snapshot.
    */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, key: String,
      contentCols: Seq[String]): DataFrame = {
    val oh = oldSnap.select(col(key), contentHash(contentCols).as("old_hash"))
    val nh = newSnap.select(col(key), contentHash(contentCols).as("new_hash"))
    oh.join(nh, Seq(key), "full_outer")
      .select(col(key),
        when(col("old_hash").isNull, "added")
          .when(col("new_hash").isNull, "removed")
          .when(col("old_hash") =!= col("new_hash"), "changed")
          .otherwise("unchanged").as("status"),
        col("old_hash"), col("new_hash"))
  }

  /** Per-status counts plus the key envelope (min/max) of each class —
    * the one-line build report.
    */
  def diffSummary(oldSnap: DataFrame, newSnap: DataFrame, key: String,
      contentCols: Seq[String]): DataFrame =
    diff(oldSnap, newSnap, key, contentCols)
      .groupBy("status")
      .agg(count(lit(1)).as("n"), min(key).as("key_min"), max(key).as("key_max"))
}
