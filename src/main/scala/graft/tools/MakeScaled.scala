package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesizes a larger scale factor from an existing one by stacking K
  * key-shifted copies — the 10×-scale bench input (`BASELINE.md` sf1
  * note). Usage:
  *
  *   runMain graft.tools.MakeScaled <srcSfDir> <outDir> [copies=10]
  *
  * Key-shift design (copy k of K, k=0 is the identity copy):
  *  - dimension tables (region/nation/customer/supplier/part) copy
  *    unchanged — at real scale dimensions grow far slower than facts,
  *    and keeping them broadcastable is the realistic join shape;
  *  - fact keys shift by k·OFFSET so copies never collide:
  *    orders/lineitem on orderkey, events on event_id + user_id,
  *    documents on doc_id, embeddings on vec_id;
  *  - `events.ts` shifts by k·(span rounded up to whole days): event
  *    streams grow time-EXTENSIVELY (a 100× corpus covers ~100× the
  *    wall-clock), not by density-stacking 100 copies onto the same
  *    instants. Density stacking makes every point-in-interval /
  *    windowed-join ANSWER quadratic in the scale factor by
  *    construction (100× incidents × 100× events inside each window =
  *    10,000× output — measured as a disk-full spill on j10 at sf10),
  *    which benchmarks an artifact, not the operator;
  *  - `documents.text` gets a per-copy SUFFIX on every token (copy
  *    k ≥ 1: "word" → "wordck"): the token bijection makes each copy's
  *    shingle graph exactly ISOMORPHIC to the original — bucket sizes
  *    and near-dup structure identical per copy, disjoint across copies
  *    — so the dedup family scales by doc count. (Interleaving a marker
  *    BETWEEN tokens instead puts the marker in every bigram, making any
  *    shared word a shared shingle: candidate pairs explode ~1000× —
  *    measured 68M pairs — which tests an artifact, not scaling. Ten
  *    exact copies would similarly square the pair volume.);
  *  - `embeddings.label` shifts by k·1000 for the same reason (same-label
  *    cosine pairs scale linearly, not quadratically);
  *  - point-read / fixed-slice queries (vec_id = 0, doc_id < 100,
  *    event_id < 1500) hit only the identity copy by construction —
  *    their cost should stay FLAT at 10×, which is itself a property
  *    worth measuring.
  */
object MakeScaled {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: MakeScaled <srcSfDir> <outDir> [copies]")
    val src = args(0)
    val out = args(1)
    val copies = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def stack(name: String)(shift: (DataFrame, Int) => DataFrame): Unit = {
      val base = graft.Tables(spark, src, name)
      val stacked = (0 until copies).map(k => shift(base, k)).reduce(_ unionByName _)
      stacked.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[make-scaled] $name: ${base.count()} -> ${spark.read.parquet(s"$out/$name.parquet").count()}")
    }

    // dimensions: one verbatim copy (they stay broadcastable by design)
    Seq("region", "nation", "customer", "supplier", "part").foreach { n =>
      graft.Tables(spark, src, n).write.mode("overwrite").parquet(s"$out/$n.parquet")
    }

    stack("orders") { (df, k) =>
      df.withColumn("o_orderkey", col("o_orderkey") + k * 100000000L)
    }
    stack("lineitem") { (df, k) =>
      df.withColumn("l_orderkey", col("l_orderkey") + k * 100000000L)
    }
    val evShiftSec = {
      val span = graft.Tables(spark, src, "events")
        .agg(expr("max(unix_timestamp(ts)) - min(unix_timestamp(ts))"))
        .collect().head.getLong(0)
      (span / 86400 + 1) * 86400
    }
    stack("events") { (df, k) =>
      df.withColumn("event_id", col("event_id") + k * 10000000L)
        .withColumn("user_id", col("user_id") + k * 1000000L)
        .withColumn("ts", col("ts") + expr(s"INTERVAL ${k * evShiftSec} SECONDS"))
    }
    stack("documents") { (df, k) =>
      val d = df.withColumn("doc_id", col("doc_id") + k * 1000000L)
      if (k == 0) d
      else d.withColumn("text", regexp_replace(col("text"), "([^ ]+)", s"$$1c$k"))
    }
    stack("embeddings") { (df, k) =>
      df.withColumn("vec_id", col("vec_id") + k * 1000000L)
        .withColumn("label", col("label") + k * 1000)
    }
    spark.stop()
  }
}
