package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Text, Vectors}

/** Training-pipeline assembly: sequence packing, graph centrality,
  * heavy hitters, robust stats, curriculum, tf-idf.
  */
private[queries] object TrainingQueries {
  import CatalogShared._

  // --------------------------------------------------------------------
  // Training-pipeline assembly ops: packing, graph centrality, tf-idf
  // --------------------------------------------------------------------

  private val training = Seq(
    // Concat-and-chunk sequence packing into 2048-token bins, 4 shards:
    // per-bin fill report. Shard-local running sums — no global window.
    Q("pack_sequences",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .withColumn("n_tokens", size(split(lower(col("text")), " ")).cast("long"))
        graft.operators.Pack.binStats(
          graft.operators.Pack.packSequences(docs, "doc_id", "n_tokens", 2048L, 4),
          "n_tokens")
          .orderBy("shard", "bin")
      },
      Some("SELECT shard, bin, CAST(count(*) AS BIGINT) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens FROM " +
        "(SELECT shard, doc_id, n_tokens, CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) // 2048 AS bin FROM " +
        "(SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 4 AS shard, doc_id, CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens FROM documents)) " +
        "GROUP BY shard, bin ORDER BY shard, bin")),

    // Integer-exact PageRank over the symmetrized LSH duplicate graph
    // (3 rounds, d=0.85, ppm units) — canonical-doc/boilerplate signal.
    // Edge input is the HUB-CAPPED band join (8 hubs/bucket): a hot
    // template bucket of b docs feeds O(8·b) edges into the iterative
    // job, never the O(b²) of the full pairwise join — the unbounded
    // variant upstream of a multi-round graph job is a scale-killer.
    // Oracle = the same three rounds unrolled; all-integer arithmetic,
    // so the two engines agree exactly.
    Q("graph_pagerank",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val sig = graft.operators.Dedup
          .minhashSignatures(docs, "doc_id", "text", 4).localCheckpoint()
        val pairs = graft.operators.Dedup
          .lshCandidatePairsBounded(sig, "doc_id", 4, 2, hubs = 8)
        val sym = pairs.select(col("id_a").as("s"), col("id_b").as("t"))
          .unionByName(pairs.select(col("id_b").as("s"), col("id_a").as("t")))
        graft.operators.PageRank.ranks(docs, "doc_id", sym, "s", "t", iters = 3)
          .orderBy("doc_id")
      },
      Some {
        def round(prev: String, name: String): String =
          s"$name AS (SELECT n.doc_id, CAST(150000 + (COALESCE(i.s, 0) * 85) // 100 AS BIGINT) AS pr FROM n LEFT JOIN " +
            s"(SELECT e.dst AS doc_id, SUM(p.pr // d.deg) AS s FROM $prev p JOIN deg d ON p.doc_id = d.src JOIN e ON e.src = d.src GROUP BY e.dst) i USING (doc_id))"
        s"WITH sig AS ($minhashSql), pairs AS ($lshBoundedPairsSql), " +
          "e AS (SELECT id_a AS src, id_b AS dst FROM pairs UNION ALL SELECT id_b, id_a FROM pairs), " +
          "deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src), " +
          "n AS (SELECT doc_id FROM documents), " +
          "p0 AS (SELECT doc_id, CAST(1000000 AS BIGINT) AS pr FROM n), " +
          round("p0", "p1") + ", " + round("p1", "p2") + ", " + round("p2", "p3") + " " +
          "SELECT doc_id, pr FROM p3 ORDER BY doc_id"
      }),

    // Misra-Gries heavy hitters over the event-type stream: O(capacity)
    // state per partition, mergeable partials — the one-pass way to FIND
    // hot keys (to decide salting/AQE skew hints) without the full
    // groupBy that would itself suffer the skew. The domain (5 event
    // types) fits capacity 8, where MG is provably EXACT and
    // order/partitioning-independent — so the oracle is plain GROUP BY.
    Q("hh_event_types",
      (s, d) => {
        val mg = udaf(graft.functions.FreqItems(8))
        Tables.events(s, d)
          .agg(mg(col("event_type")).as("m"))
          .select(explode(col("m")).as(Seq("event_type", "cnt")))
          .orderBy("event_type")
      },
      Some("SELECT event_type, CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY event_type ORDER BY event_type")),

    // Robust outlier stats for quality monitoring: per-group median and
    // median-absolute-deviation (the robust sigma — a 3.5·MAD clip is
    // the standard winsorization rule). Both passes are refinement-exact
    // percentiles ([[graft.operators.Percentiles.exactRefined]]):
    // Spark's `percentile()` would buffer every distinct value per
    // group in ONE aggregation buffer — with near-unique prices that is
    // an OOM at 100 TB — while the two-pass coarse-bucket refinement
    // shuffles ~170 bucket counts per group, rescans only the bucket
    // holding the median rank, and never sorts more than a sliver of a
    // group in one task. Interpolation is type-7, bit-identical to
    // `percentile` ≡ DuckDB `quantile_cont` (proven in a10).
    Q("a20_mad",
      (s, d) => {
        import graft.operators.Percentiles
        // persist the 2-column projection: med + mad together evaluate it
        // four times (two refinement passes each) — cached, that is ONE
        // parquet scan instead of four. No unpersist: the CacheManager
        // dedups by canonicalized plan, so re-invocations (bench passes)
        // reuse this entry instead of stacking new ones, and at 100 TB
        // the projection spills via MEMORY_AND_DISK rather than OOM.
        val li = Tables.lineitem(s, d).select("l_returnflag", "l_extendedprice")
          .persist()
        val med = Percentiles.exactRefined(li, Seq("l_returnflag"),
          "l_extendedprice", Seq(0.5 -> "med"))
        val ad = li.join(broadcast(med), "l_returnflag")
          .select(col("l_returnflag"), col("med"),
            abs(col("l_extendedprice") - col("med")).as("ad"))
        Percentiles.exactRefined(ad, Seq("l_returnflag", "med"),
          "ad", Seq(0.5 -> "mad"))
          .select("l_returnflag", "med", "mad")
          .orderBy("l_returnflag")
      },
      Some("WITH m AS (SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS med FROM lineitem GROUP BY 1) " +
        "SELECT l_returnflag, any_value(med) AS med, quantile_cont(abs(l_extendedprice - med), 0.5) AS mad " +
        "FROM lineitem JOIN m USING (l_returnflag) GROUP BY l_returnflag ORDER BY l_returnflag")),

    // Interleaved curriculum schedule: per-source hash rank, then the
    // global order is the SORT KEY (rank, source, id) — sources
    // round-robin without any materialized global index (a global
    // row_number would be a single-task window; the schedule head here
    // is a distributed TakeOrderedAndProject).
    Q("curriculum_order",
      (s, d) => {
        val w = Window.partitionBy("source")
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"))
          .withColumn("rn", row_number().over(w).cast("long"))
          .orderBy(col("rn"), col("source"), col("doc_id"))
          .limit(50)
      },
      Some("SELECT doc_id, source, CAST(row_number() OVER (PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rn " +
        "FROM documents ORDER BY rn, source, doc_id LIMIT 50")),

    // Tf-idf top-3 terms per document, idf as the exact rational N/df
    // (no log — a transcendental differs in the last ulp across libm
    // builds; the rational keeps the ranking and stays bit-portable).
    Q("text_tfidf",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val toks = docs.select(col("doc_id"),
          explode(split(lower(col("text")), " ")).as("term"))
        val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val idf = toks.groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
        val nDocs = docs.agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
        tf.join(idf, "term").crossJoin(broadcast(nDocs))
          .withColumn("score", (col("tf") * col("n")).cast("double") / col("df"))
          .withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= 3)
          .select("doc_id", "term", "rnk")
          .orderBy("doc_id", "rnk")
      },
      Some("WITH t AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents), " +
        "tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY doc_id, term), " +
        "df AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM t GROUP BY term), " +
        "n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents), " +
        "s AS (SELECT doc_id, term, CAST(tf * n AS DOUBLE) / df AS score FROM tf JOIN df USING (term) CROSS JOIN n), " +
        "r AS (SELECT doc_id, term, CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS BIGINT) AS rnk FROM s) " +
        "SELECT doc_id, term, rnk FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk")))


  val all: Seq[Q] = training
}
