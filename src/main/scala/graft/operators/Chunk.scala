package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Context-window chunking: split each document's token stream into
  * fixed-size overlapping windows — the packing step that turns a curated
  * corpus into training-context-sized pieces.
  *
  * Chunk i covers tokens [i·stride, i·stride + size); the last chunk is
  * short rather than padded. Pure map-side plan: `posexplode` a per-row
  * `sequence` of chunk ids into rows, then `slice` the carried token
  * array — no shuffle, no UDF, no per-element lambda over the text
  * (array ops on exploded rows stay in whole-stage codegen), scales
  * linearly with corpus size.
  */
object Chunk {

  /** (idCol, chunk_id, chunk) rows; `size` tokens per chunk, stride
    * `stride` (overlap = size − stride). `split` never yields an empty
    * array, so every document emits ≥1 chunk.
    */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride ($stride) <= size ($size)")
    val nTokens = org.apache.spark.sql.functions.size(col("__ws"))
    df.select(col(idCol), split(col(textCol), " ").as("__ws"))
      .select(col(idCol), col("__ws"),
        posexplode(sequence(lit(0L),
          floor((nTokens - 1) / lit(stride)).cast("long")))
          .as(Seq("__pos", "chunk_id")))
      .select(col(idCol), col("chunk_id"),
        array_join(
          slice(col("__ws"), (col("chunk_id") * stride + 1).cast("int"), lit(size)),
          " ").as("chunk"))
  }
}
