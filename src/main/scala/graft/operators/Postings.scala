package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Segmented inverted-index build: token → positional posting lists,
  * sharded by document-id segment the way search engines shard posting
  * lists (one bounded list per (token, segment), Lucene-segment style —
  * never "the whole corpus's postings for 'the' in one row").
  *
  * Scale shape: two hash aggregations, both with map-side partial
  * combine — (token, segment, doc) → positions, then (token, segment) →
  * postings. List sizes are bounded by construction: positions by a
  * document's length, postings by segSize documents. A corpus-frequency
  * hot token therefore produces docs/segSize bounded rows, not one
  * unbounded row — the skew story is structural, not salted after the
  * fact. Token-level stats (global df) aggregate the already-small
  * (token, segment) relation.
  *
  * Postings render as deterministic strings ("doc:p1|p2,doc:…", docs
  * ascending, positions ascending) so the index is byte-comparable
  * across engines and stable for delta-diffing between builds.
  */
object Postings {

  /** Per-(token, segment) positional postings.
    *
    * @param docs    (idCol: bigint, textCol: string) relation
    * @param segSize documents per segment (posting-list shard bound)
    */
  def segmented(docs: DataFrame, idCol: String, textCol: String, segSize: Int): DataFrame = {
    require(segSize >= 1, s"segSize ($segSize) must be >= 1")
    val tok = docs
      .select(col(idCol).as("doc_id"),
        expr(s"$idCol div $segSize").as("seg"),
        posexplode(split(lower(col(textCol)), " ")).as(Seq("pos", "w")))
    val perDoc = tok
      .groupBy("w", "seg", "doc_id")
      .agg(expr("array_join(transform(array_sort(collect_list(pos)), x -> cast(x as string)), '|')")
        .as("pos_list"))
      .withColumn("posting", concat(col("doc_id").cast("string"), lit(":"), col("pos_list")))
    perDoc
      .groupBy("w", "seg")
      .agg(
        count(lit(1)).as("seg_df"),
        expr("array_join(transform(array_sort(collect_list(struct(doc_id, posting))), x -> x.posting), ',')")
          .as("postings"))
  }

  /** Global document frequency per token from the segmented index —
    * aggregates the (token, segment) relation, not the raw tokens.
    */
  def tokenDf(segmentedIndex: DataFrame): DataFrame =
    segmentedIndex.groupBy("w").agg(sum("seg_df").as("df"))

  /** Positional phrase query: start positions of every exact occurrence
    * of `phrase` (consecutive tokens, case-folded) — the positional-index
    * consumer a search engine runs for quoted queries.
    *
    * Scale shape: the token stream is pruned to the phrase's words BEFORE
    * any join (an `IN` filter at the scan/explode — the corpus's other
    * tokens never reach a shuffle), then each successive word equi-joins
    * on (doc, start): candidate volume is bounded by the rarest word's
    * postings, exactly like intersecting posting lists rarest-first.
    */
  def phraseMatches(docs: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one word")
    // fold BOTH sides: the token stream is lowered below, so a phrase
    // given as "Table part" must compare lowered too
    val ph = phrase.map(_.toLowerCase(java.util.Locale.ROOT))
    val tok = docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(lower(col(textCol)), " ")).as(Seq("pos", "w")))
      .filter(col("w").isin(ph.distinct: _*))
    val first = tok.filter(col("w") === ph.head)
      .select(col("doc_id"), col("pos"))
    ph.zipWithIndex.drop(1).foldLeft(first) { case (acc, (word, i)) =>
      val next = tok.filter(col("w") === word)
        .select(col("doc_id").as("d2"), (col("pos") - i).as("start"))
      acc.join(next,
          acc("doc_id") === next("d2") && acc("pos") === next("start"))
        .select(acc("doc_id"), acc("pos"))
    }
  }

  /** Lookup-side helper: the positions of one token inside one document,
    * decoded from the rendered posting string (driver/UDF-free — pure
    * column ops; used by specs to round-trip the encoding).
    */
  def positionsOf(index: DataFrame, token: String, docId: Long): DataFrame =
    index
      .filter(col("w") === token)
      .select(explode(split(col("postings"), ",")).as("p"))
      .filter(split(col("p"), ":").getItem(0) === docId.toString)
      .select(explode(split(split(col("p"), ":").getItem(1), "\\|")).as("pos_str"))
      .select(col("pos_str").cast("long").as("pos"))
}
