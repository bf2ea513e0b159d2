package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding (BPE) vocabulary trainer (Sennrich et
  * al., ACL 2016) — learns subword merge rules from a corpus, replacing
  * the `bpeishTokenCount` heuristic with real learned merges.
  *
  * The trainer never iterates over the corpus: the corpus collapses ONCE
  * into the (word, freq) vocabulary relation (one grouped aggregation —
  * the only stage that scales with data volume), and every merge round
  * runs over that bounded vocab. Per round: one hash aggregation over
  * adjacent symbol pairs (map-side combined, weighted by word freq), a
  * top-1 with a total-order tie-break, and a map-side literal `replace`
  * to apply the merge — no shuffle grows with corpus size, so the same
  * plan holds at 100 TB where the vocab is still ~10^6 rows.
  *
  * Symbol sequences are encoded as a single string with every symbol
  * wrapped in U+0001 markers (`␁s1␁␁s2␁…`): applying a merge (L, R) is
  * then ONE literal string replace of `␁L␁␁R␁` with `␁LR␁` — engine
  * string `replace` is leftmost-first non-overlapping on both Spark and
  * DuckDB, which is exactly BPE's greedy left-to-right merge order, and
  * the markers make a match unable to cross symbol boundaries. Words are
  * restricted to `[a-z0-9]+` so the marker can never occur in a symbol.
  *
  * Mirrors the unrolled-rounds oracle pattern proven for k-means
  * ([[Ivf]]) and PageRank: the DuckDB twin unrolls the same k rounds as
  * CTEs and reproduces the merge table hash-exactly (pure integer counts
  * and binary string comparisons — nothing FP, nothing locale-sensitive).
  */
object Bpe {

  /** Symbol-boundary marker. Must never occur inside a symbol — callers
    * feed `[a-z0-9]+` words.
    */
  val Sep = "\u0001"

  /** One learned merge rule: in `round`, (lft, rgt) was the most frequent
    * adjacent pair with weight `cnt` (sum of owning-word frequencies per
    * occurrence).
    */
  final case class Merge(round: Int, lft: String, rgt: String, cnt: Long)

  /** Initial character-level wrapping: "abc" → ␁a␁␁b␁␁c␁. */
  def wrap(word: Column): Column =
    concat(lit(Sep),
      array_join(filter(split(word, ""), c => c =!= ""), Sep + Sep),
      lit(Sep))

  /** Wrapped string → symbol array (inverse of the joins in [[wrap]]). */
  def symbols(w: Column): Column =
    split(w.substr(lit(2), length(w) - 2), Sep + Sep)

  /** Wrapped string → the original word (segmentation is a partition). */
  def decode(w: Column): Column = regexp_replace(w, Sep, "")

  /** Adjacent symbol pairs of a wrapped string as structs (l, r); empty
    * for single-symbol words (slice of length 0 — no `sequence(1, 0)`
    * descending-range footgun).
    */
  def pairs(w: Column): Column = {
    val sy = symbols(w)
    zip_with(
      slice(sy, lit(1), size(sy) - 1),
      slice(sy, lit(2), size(sy) - 1),
      (l, r) => struct(l.as("l"), r.as("r")))
  }

  /** The single replace applying merge (lft, rgt) to a wrapped string. */
  def applyMerge(w: Column, lft: String, rgt: String): Column =
    replace(w, lit(Sep + lft + Sep + Sep + rgt + Sep), lit(Sep + lft + rgt + Sep))

  /** Train `rounds` merges over a (word, freq) vocabulary. Returns the
    * learned merge table and the final vocab with its segmentation
    * (`word`, `freq`, `w` wrapped). Ties break by (count desc, left asc,
    * right asc) — a total order, so the table is deterministic on any
    * engine. Stops early if no adjacent pair remains.
    *
    * The per-round top-1 is collected to the driver (ONE row per round —
    * bounded by construction, the k-means-centroid precedent) so the
    * merge is applied as a foldable literal replace, and `localCheckpoint`
    * keeps the per-round plan flat instead of stacking `rounds` replaces.
    */
  def train(vocab: DataFrame, wordCol: String, freqCol: String,
      rounds: Int): (Seq[Merge], DataFrame) = {
    require(rounds > 0, s"rounds must be positive, got $rounds")
    var words = vocab
      .select(col(wordCol).as("word"), col(freqCol).cast("long").as("freq"),
        wrap(col(wordCol)).as("w"))
      .localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val top = words
        .select(explode(pairs(col("w"))).as("p"), col("freq"))
        .groupBy(col("p.l").as("lft"), col("p.r").as("rgt"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("lft"), col("rgt"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, rt, c) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(r, l, rt, c)
        words = words
          .withColumn("w", applyMerge(col("w"), l, rt))
          .localCheckpoint()
        r += 1
      }
    }
    (merges.result(), words)
  }

  /** Segment new words with an already-learned merge list (applied in
    * training order — BPE inference). Adds `w` (wrapped segmentation).
    */
  def encode(df: DataFrame, wordCol: String, merges: Seq[Merge]): DataFrame =
    merges.foldLeft(df.withColumn("w", wrap(col(wordCol)))) { (d, m) =>
      d.withColumn("w", applyMerge(col("w"), m.lft, m.rgt))
    }

  /** Persist a trained merge list as a model table — how a tokenizer
    * actually deploys: train ONCE on the corpus, ship the (tiny,
    * vocab-bounded) merge table, encode everywhere retrain-free. The
    * same train-once/apply-many economics as the persisted vector index
    * ([[IvfIndex]]); the merge strings/counts round-trip parquet
    * exactly, so the loaded model IS the trained one.
    */
  def persistModel(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[Merge], table: String): Unit = {
    import spark.implicits._
    graft.sources.Warehouse.writeTable(merges.toDF(), table)
  }

  /** Load a persisted merge list in training order — the retrain-free
    * encode path: [[encode]] over the result touches no corpus
    * aggregate (the 8 pair-count rounds happened at train time).
    */
  def loadModel(spark: org.apache.spark.sql.SparkSession,
      table: String): Seq[Merge] =
    spark.table(table).orderBy("round").collect()
      .map(r => Merge(r.getAs[Int]("round"), r.getAs[String]("lft"),
        r.getAs[String]("rgt"), r.getAs[Long]("cnt"))).toSeq
}
