package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gopher-style repetition quality signals (Rae et al. 2021, "Scaling
  * Language Models: Methods, Analysis & Insights from Training Gopher",
  * Appendix A — repetitious-text filters), adapted to the whitespace
  * token model this corpus uses (the paper's line-based signals have no
  * analogue in single-line documents):
  *
  *  - `top2_chars` — characters covered by the most frequent word
  *    2-gram (occurrences × gram length; overlaps double-count, as in
  *    the paper's character-fraction definition);
  *  - `dup3_chars` — characters covered by ALL occurrences of word
  *    3-grams that appear at least twice;
  *  - `total_chars` — document length in characters;
  *  - `rep_flag` — the filter verdict: top-2-gram fraction > 1/8 OR
  *    duplicate-3-gram fraction > 1/10 (thresholds sit mid-distribution
  *    for this corpus: ~13% of documents flag at sf0.01/sf0.1; the
  *    paper's 0.20/0.18 web thresholds flag <3% here).
  *
  * Everything is integer: coverages are count × length products, and
  * the flag compares integer cross-products (`top2·8 > total` ⇔
  * fraction > 1/8) — no double ever materializes, so the verdict is
  * exact cross-engine.
  *
  * The most-frequent-2-gram tie is real (≈70% of docs tie on count):
  * broken by (count DESC, coverage DESC, gram ASC) — a total order both
  * engines evaluate identically on integers + binary string compare.
  *
  * Scale shape: two [[Dedup.ngramRows]] passes (each ONE exchange on
  * the doc id — the window and the per-doc aggregation share the key),
  * per-gram counts with map-side combine, and a per-doc top-1 window.
  * Cost is linear in corpus tokens; no pair joins, no driver state.
  */
object Repetition {

  def signals(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(idCol)
    val c2 = Dedup.ngramRows(df, idCol, textCol, 2)
      .groupBy(idCol, "gram").agg(count(lit(1)).as("cnt"))
    val top2 = c2
      .withColumn("cov", col("cnt") * length(col("gram")).cast("long"))
      .withColumn("__rn", row_number().over(Window.partitionBy(idCol)
        .orderBy(col("cnt").desc, col("cov").desc, col("gram"))))
      .filter(col("__rn") === 1)
      .select(id, col("cov").as("top2_chars"))
    val dup3 = Dedup.ngramRows(df, idCol, textCol, 3)
      .groupBy(idCol, "gram").agg(count(lit(1)).as("cnt"))
      .groupBy(idCol)
      .agg(coalesce(
        sum(when(col("cnt") >= 2, col("cnt") * length(col("gram")).cast("long"))),
        lit(0L)).as("dup3_chars"))
    df.select(id, length(col(textCol)).cast("long").as("total_chars"))
      .join(top2, Seq(idCol), "left")
      .join(dup3, Seq(idCol), "left")
      .select(id,
        coalesce(col("top2_chars"), lit(0L)).as("top2_chars"),
        coalesce(col("dup3_chars"), lit(0L)).as("dup3_chars"),
        col("total_chars"),
        (coalesce(col("top2_chars"), lit(0L)) * 8 > col("total_chars") ||
          coalesce(col("dup3_chars"), lit(0L)) * 10 > col("total_chars")).as("rep_flag"))
  }
}
