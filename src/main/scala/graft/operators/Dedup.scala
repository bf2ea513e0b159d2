package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Deduplication operators for large-scale corpus curation
  * (beyond-reference north star; see BASELINE.json).
  *
  * Scale design: every variant is a shuffle-bounded DataFrame plan —
  * signatures are computed map-side (pure column expressions, no UDFs),
  * candidate generation shuffles only on compact hash keys, and pairwise
  * verification happens only inside candidate buckets (never all-pairs).
  * At cluster scale, persist signature tables once (they are tiny relative
  * to the corpus) instead of recomputing per join side.
  */
object Dedup {

  /** Exact dedup: keep one row per distinct content hash. */
  def exact(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("__h", md5(col(textCol))).dropDuplicates("__h").drop("__h")

  /** Exact-dup groups: hash → multiplicity (diagnostics / dup reporting). */
  def exactGroups(df: DataFrame, textCol: String = "text"): DataFrame =
    df.groupBy(md5(col(textCol)).as("h")).agg(count(lit(1)).as("cnt"))

  /** One row per word-bigram shingle: (`idCol`, extraCols..., sh).
    *
    * posexplode + lead() window instead of nested array HOFs: the HOF
    * formulation (transform over sequence with element_at(split(...)))
    * gets its `split` inlined into every lambda by CollapseProject and
    * falls out of whole-stage codegen — measured 224ms/row interpreted.
    * This shape is codegen end-to-end, and the window's doc-id shuffle is
    * reused by downstream per-doc aggregation (same key, no extra
    * exchange). Docs with <2 tokens yield no rows.
    */
  def shingleRows(df: DataFrame, idCol: String, textCol: String,
      extraCols: Seq[String] = Nil): DataFrame = {
    val keep = (idCol +: extraCols).map(col)
    val tok = df.select(keep :+ posexplode(Text.tokens(col(textCol))).as(Seq("pos", "w")): _*)
    tok
      .withColumn("__nxt", lead("w", 1).over(Window.partitionBy(idCol).orderBy("pos")))
      .filter(col("__nxt").isNotNull)
      .select(keep :+ concat_ws(" ", col("w"), col("__nxt")).as("sh"): _*)
  }

  /** MinHash signature table: `idCol`, h0..h{k-1} over word-bigram
    * shingles. Portable md5-based hash family (seed-prefixed).
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 4): DataFrame = {
    val sigCols = (0 until numHashes).map(i =>
      min(md5(concat(lit(i.toString), col("sh")))).as(s"h$i"))
    shingleRows(df, idCol, textCol)
      .groupBy(idCol).agg(sigCols.head, sigCols.tail: _*)
  }

  /** LSH candidate pairs: ids whose signatures collide on at least one
    * band of `rowsPerBand` consecutive hashes. The signature table is
    * materialized (cached) before the self-joins — signatures are tiny
    * and recomputing the hash expressions per join side both doubles work
    * and blows up optimizer time on deep expression trees.
    */
  def lshCandidatePairs(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 4, rowsPerBand: Int = 2): DataFrame = {
    val sig = minhashSignatures(df, idCol, textCol, numHashes).cache()
    val bands = (0 until numHashes / rowsPerBand).map { b =>
      val keys = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => s"h$i")
      val a = sig.select(col(idCol).as("id_a") +: keys.map(col): _*)
      val bs = sig.select(col(idCol).as("id_b") +: keys.map(k => col(k).as(s"_$k")): _*)
      a.join(bs,
        keys.map(k => col(k) === col(s"_$k")).reduce(_ && _) && col("id_a") < col("id_b"))
        .select("id_a", "id_b")
    }
    bands.reduce(_ unionByName _).distinct()
  }

  /** Bigram-shingle Jaccard similarity for candidate pairs. `scopeCol`
    * bounds the pair space (e.g. a source/bucket column); at scale pass
    * the LSH band key instead of a broad scope.
    */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
      scopeCol: String): DataFrame = {
    // Materialized once: referenced by both self-join sides and both
    // per-doc-count joins (4 plan references → 4 recomputes otherwise).
    val w = shingleRows(df, idCol, textCol, Seq(scopeCol)).distinct().cache()
    val n = w.groupBy(idCol).agg(count(lit(1)).as("nd"))
    val p = w.as("a")
      .join(w.as("b"),
        col(s"a.sh") === col(s"b.sh") && col(s"a.$scopeCol") === col(s"b.$scopeCol")
          && col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .agg(count(lit(1)).as("shared"))
    p.join(broadcast(n).as("na"), col("id_a") === col(s"na.$idCol"))
      .join(broadcast(n).as("nb"), col("id_b") === col(s"nb.$idCol"))
      .select(col("id_a"), col("id_b"),
        (col("shared").cast("double") / (col("na.nd") + col("nb.nd") - col("shared")))
          .as("jaccard"))
  }

  /** SimHash: 64-bit locality-sensitive fingerprint — per-token hash bits
    * vote ±1 per position; the sign vector packs into a long. Near-dups
    * differ in few bits (hamming distance via bit_count(a ^ b)).
    * Single explode + one grouped aggregation; crc32-derived bits (the
    * portable-hash constraint only matters for oracle-checked queries).
    */
  def simhash(df: DataFrame, idCol: String, textCol: String,
      bits: Int = 16): DataFrame = {
    val t = df.select(col(idCol), explode(Text.tokens(col(textCol))).as("w"))
      .withColumn("h", crc32(col("w")))
    val votes = (0 until bits).map(b =>
      sum(when(col("h").bitwiseAND(1L << b) =!= 0, 1).otherwise(-1)).as(s"v$b"))
    t.groupBy(idCol).agg(votes.head, votes.tail: _*)
      .select(col(idCol),
        (0 until bits).map(b =>
          when(col(s"v$b") >= 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dup pairs within max hamming distance. Self-join on the
    * top half of the fingerprint as a blocking key would scale better; at
    * this size a bucket-free join on small hamming radius suffices.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, bits: Int = 16): DataFrame = {
    val s = simhash(df, idCol, textCol, bits).cache()
    val a = s.select(col(idCol).as("id_a"), col("simhash").as("sh_a"))
    val b = s.select(col(idCol).as("id_b"), col("simhash").as("sh_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
