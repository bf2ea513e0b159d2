package graft.tools

import scala.collection.mutable

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Micro-benchmark: mutable in-place Misra-Gries buffer vs the previous
  * immutable-Map-per-row implementation, on a HIGH-CARDINALITY feed
  * (every row distinct → the decrement-all path fires constantly, the
  * worst case for per-row allocation). Test scope: not part of the
  * library surface.
  */
object FreqItemsBench {

  /** The round-4 implementation, verbatim semantics: rebuilds an
    * immutable Map per input row.
    */
  private class ImmutableFreqItems(capacity: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    override def zero: Map[String, Long] = Map.empty
    override def reduce(m: Map[String, Long], x: String): Map[String, Long] =
      if (x == null) m
      else if (m.contains(x)) m.updated(x, m(x) + 1)
      else if (m.size < capacity) m.updated(x, 1L)
      else m.view.mapValues(_ - 1).filter(_._2 > 0).toMap
    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val s = (a.keySet ++ b.keySet).iterator
        .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
      if (s.size <= capacity) s
      else {
        val cut = s.values.toSeq.sorted(Ordering[Long].reverse)(capacity)
        s.view.mapValues(_ - cut).filter(_._2 > 0).toMap
      }
    }
    override def finish(r: Map[String, Long]): Map[String, Long] = r
    override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // 20M rows, ~2M distinct keys, capacity 64: decrement-heavy regime
    val feed = spark.range(20L * 1000 * 1000)
      .select(concat(lit("k"), pmod(col("id") * 2654435761L, lit(2000000))).as("k"))
      .localCheckpoint()
    def time(label: String, agg: org.apache.spark.sql.expressions.UserDefinedFunction): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        feed.agg(agg(col("k"))).head()
        println(f"[freqitems-bench] $label run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    time("immutable (r4)", udaf(new ImmutableFreqItems(64)))
    time("mutable (r5)", udaf(graft.functions.FreqItems(64)))
    spark.stop()
  }
}
