package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** T5-style span corruption (Raffel et al. 2020, "Exploring the Limits
  * of Transfer Learning with a Unified Text-to-Text Transformer" §3.1.4
  * + the denoising objectives of UL2): mask contiguous token spans and
  * emit the (input, target) pair seq2seq pretraining consumes — the
  * input keeps unmasked tokens with each masked RUN replaced by one
  * `<extra_id_k>` sentinel, the target lists each sentinel followed by
  * the tokens it hides.
  *
  * T5 samples span starts from an RNG; here a start is selected iff
  * `md5(doc_id:pos)` falls under a rate threshold — the house
  * deterministic-sampling trick ([[Sampling]]), so the corruption is a
  * pure function of the row: reproducible across runs, engines, and
  * partitionings, and the DuckDB twin recomputes the exact strings.
  * Each selected start masks `spanLen` tokens; overlapping or adjacent
  * selections merge into one maximal run (one sentinel), the same
  * coverage-union semantics T5's non-overlap resampling approximates.
  *
  * Scale shape: one token explode, then windows all keyed by (doc,
  * pos) — coverage (bounded RANGE frame), run starts (lag), run index
  * (running sum) — and one doc-keyed sort-within-group rebuild per
  * output string. One shuffle by doc; nothing pairs docs or grows
  * super-linearly.
  */
object SpanCorruption {

  /** (idCol, n_tokens, n_masked, input, target). `startRateHex` is the
    * 8-hex-digit md5-prefix threshold for span STARTS (the [[Sampling]]
    * convention — "10000000" selects ~6.25% of positions; with
    * spanLen=3 that masks ~17% of tokens, the T5 ballpark).
    */
  def t5SpanCorrupt(df: DataFrame, idCol: String, textCol: String,
      spanLen: Int = 3, startRateHex: String = "10000000"): DataFrame = {
    require(spanLen >= 1, s"spanLen ($spanLen) must be >= 1")
    val byPos = Window.partitionBy(idCol).orderBy("pos")
    val cover = byPos.rangeBetween(-(spanLen - 1), 0)
    val toks = df.select(col(idCol),
        posexplode(Text.tokens(col(textCol))).as(Seq("pos", "w")))
      .withColumn("sel",
        substring(md5(concat(col(idCol).cast("string"), lit(":"),
          col("pos").cast("string"))), 1, 8) < startRateHex)
      .withColumn("masked", max(when(col("sel"), 1).otherwise(0)).over(cover) === 1)
      .withColumn("run_start",
        col("masked") && !coalesce(lag(col("masked"), 1).over(byPos), lit(false)))
      .withColumn("k",
        sum(when(col("run_start"), 1L).otherwise(0L)).over(byPos) - 1)
    val pieces = toks.select(col(idCol), col("pos"), col("masked"),
      // input piece: unmasked token, or ONE sentinel at each run start
      when(!col("masked"), col("w"))
        .when(col("run_start"), concat(lit("<extra_id_"), col("k"), lit(">")))
        .otherwise(lit(null)).as("in_piece"),
      // target piece: masked tokens, run-leading ones prefixed by their sentinel
      when(col("masked") && col("run_start"),
          concat(lit("<extra_id_"), col("k"), lit("> "), col("w")))
        .when(col("masked"), col("w"))
        .otherwise(lit(null)).as("tg_piece"))
    def joined(piece: String) = array_join(
      transform(
        array_sort(collect_list(when(col(piece).isNotNull,
          struct(col("pos"), col(piece).as("p"))))),
        x => x.getField("p")), " ")
    pieces.groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("masked"), 1L).otherwise(0L)).as("n_masked"),
        joined("in_piece").as("input"),
        joined("tg_piece").as("target"))
  }
}
