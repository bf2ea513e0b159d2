package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Text, Vectors}

/** Dedup clustering + decontamination + sampling + skew pipeline stages
  * (candidate verify, connected components, splits, sharding).
  */
private[queries] object ClusterPipelineQueries {
  import CatalogShared._

  // --------------------------------------------------------------------
  // Dedup clustering + sampling + quantization (training-pipeline stages)
  // --------------------------------------------------------------------

  // Eval-set decontamination: corpus docs (doc_id ≥ 10) sharing ≥3
  // distinct bigram shingles with the stand-in benchmark (doc_id < 10).
  private val decontam = Seq(
    Q("dedup_decontaminate",
      (s, d) => {
        val docs = Tables.documents(s, d)
        graft.operators.Dedup.contaminated(
          docs.filter(col("doc_id") >= 10),
          docs.filter(col("doc_id") < 10),
          "doc_id", "text", minShared = 3)
          .orderBy("doc_id")
      },
      Some("WITH w AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] AS sh FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents), LATERAL unnest(generate_series(1, len(ws) - 1)) AS t(i)), b AS (SELECT DISTINCT sh FROM w WHERE doc_id < 10) SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared FROM (SELECT doc_id, sh FROM w WHERE doc_id >= 10) c JOIN b USING (sh) GROUP BY doc_id HAVING count(*) >= 3 ORDER BY doc_id")),

    // Bloom-gated decontamination: same exact semantics (the bloom is a
    // map-side pre-filter with no false negatives; the broadcast verify
    // join removes the fpp tail), so the oracle is the same closed-form
    // SQL — the bloom must be invisible in the answer. minShared=2
    // differentiates the row from dedup_decontaminate's 3.
    Q("decon_bloom",
      (s, d) => {
        val docs = Tables.documents(s, d)
        graft.operators.Dedup.bloomContaminated(
          docs.filter(col("doc_id") >= 10),
          docs.filter(col("doc_id") < 10),
          "doc_id", "text", minShared = 2)
          .orderBy("doc_id")
      },
      Some("WITH w AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] AS sh FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents), LATERAL unnest(generate_series(1, len(ws) - 1)) AS t(i)), b AS (SELECT DISTINCT sh FROM w WHERE doc_id < 10) SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared FROM (SELECT doc_id, sh FROM w WHERE doc_id >= 10) c JOIN b USING (sh) GROUP BY doc_id HAVING count(*) >= 2 ORDER BY doc_id")))

  // Asymmetric containment ratio per corpus doc vs the benchmark shingle
  // set — catches a short eval item quoted whole inside a long document
  // (near-zero Jaccard, containment ≈ 1). Ratio = one division of two
  // exact integers: cross-engine deterministic.
  private val containmentQ = Seq(
    Q("dedup_containment",
      (s, d) => {
        val docs = Tables.documents(s, d)
        graft.operators.Dedup.containment(
          docs.filter(col("doc_id") >= 10),
          docs.filter(col("doc_id") < 10),
          "doc_id", "text")
          .orderBy("doc_id")
      },
      Some("WITH w AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] AS sh FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents), LATERAL unnest(generate_series(1, len(ws) - 1)) AS t(i)), " +
        "b AS (SELECT DISTINCT sh FROM w WHERE doc_id < 10), " +
        "tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_total FROM w WHERE doc_id >= 10 GROUP BY doc_id), " +
        "shr AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared FROM (SELECT doc_id, sh FROM w WHERE doc_id >= 10) c JOIN b USING (sh) GROUP BY doc_id) " +
        "SELECT tot.doc_id, COALESCE(shr.n_shared, 0) AS n_shared, tot.n_total, CAST(COALESCE(shr.n_shared, 0) AS DOUBLE) / tot.n_total AS containment " +
        "FROM tot LEFT JOIN shr USING (doc_id) ORDER BY doc_id")),

    // Skew-resilient salted join: the small side replicates per salt so
    // a hot key's rows spread over `salts` tasks. Oracle is the plain
    // join it must equal row-for-row.
    Q("j9_salted_join",
      (s, d) => {
        val orders = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
        val cust = Tables.customer(s, d)
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").as("o_custkey"), col("c_name"))
        graft.operators.Skew.saltedJoin(orders, cust, "o_custkey", salts = 8)
          .select("o_orderkey", "o_custkey", "o_orderpriority", "c_name")
          .orderBy("o_orderkey")
      },
      Some("SELECT o_orderkey, o_custkey, o_orderpriority, c_name FROM orders JOIN customer ON o_custkey = c_custkey WHERE c_mktsegment = 'BUILDING' ORDER BY o_orderkey")),

    // Skew-resilient two-phase salted aggregation, verified against the
    // plain GROUP BY it must equal (integer cents — exact under any
    // partial/merge order, which is the whole point of salting).
    Q("skew_salted_agg",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .withColumn("qty_cents", cents(col("l_quantity")))
        graft.operators.Skew.saltedSumCount(li, "l_returnflag", "qty_cents")
          .orderBy("l_returnflag")
      },
      Some("SELECT l_returnflag, CAST(SUM(CAST(floor(l_quantity*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_cents, CAST(count(*) AS BIGINT) AS cnt FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")),

    // Adaptive composition — the reason the heavy-hitters sketch exists:
    // one bounded Misra-Gries probe detects the hot key, which routes
    // through the salted two-phase plan while the cold tail takes the
    // plain groupBy. The key is a catch-all bucket ('bulk' holds every
    // l_quantity > 10 — exactly 80% of rows at any sf; each remaining
    // quantity holds 2%), so the routing is PROVABLE even in MG's
    // approximate regime (11 distinct keys > capacity 8): the hot
    // estimate is ≥ 0.8n − n/9 ≈ 0.69n ≥ hotShare·n, and a cold
    // estimate never exceeds its true 0.02n — MG estimates are lower
    // bounds — so the split is deterministic across partitionings.
    // Equals the plain GROUP BY exactly: probe routing can only change
    // the PLAN, never the answer.
    Q("skew_adaptive_agg",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .withColumn("qkey", when(col("l_quantity") > 10, lit("bulk"))
            .otherwise(col("l_quantity").cast("int").cast("string")))
          .withColumn("qty_cents", cents(col("l_quantity")))
        graft.operators.Skew.adaptiveSumCount(li, "qkey", "qty_cents",
          salts = 8, capacity = 8, hotShare = 0.5)
          .orderBy("qkey")
      },
      Some("SELECT qkey, CAST(SUM(CAST(floor(l_quantity*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_cents, CAST(count(*) AS BIGINT) AS cnt " +
        "FROM (SELECT CASE WHEN l_quantity > 10 THEN 'bulk' ELSE CAST(CAST(l_quantity AS INTEGER) AS VARCHAR) END AS qkey, l_quantity FROM lineitem) " +
        "GROUP BY qkey ORDER BY qkey")))

  // Span-level boilerplate detection: exact 8-token spans shared by ≥3
  // distinct docs (template/boilerplate families that doc-level dedup
  // leaves behind — the span report drives a scrub pass at scale).
  private val spanQs = Seq(
    Q("text_boilerplate",
      (s, d) => graft.operators.Dedup
        .ngramRows(Tables.documents(s, d), "doc_id", "text", 8)
        .distinct()
        .groupBy("gram").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 3)
        .orderBy(col("df").desc, col("gram")),
      Some("WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents), " +
        "sh AS (SELECT DISTINCT doc_id, array_to_string(ws[i:i+7], ' ') AS gram FROM w, LATERAL unnest(generate_series(1, len(ws)-7)) AS t(i)), " +
        "d AS (SELECT gram, CAST(count(*) AS BIGINT) AS df FROM sh GROUP BY gram) " +
        "SELECT gram, df FROM d WHERE df >= 3 ORDER BY df DESC, gram")),

    // MinHash sketch-accuracy report: estimated Jaccard (matching
    // signature quarters) next to the exact shingle Jaccard, per LSH
    // candidate pair — the calibration check before trusting the sketch
    // at a scale where exact Jaccard is unaffordable corpus-wide.
    // jacc_millis = floor(j*1000 + 0.5) of a single exact division.
    Q("dedup_minhash_est",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val sig = graft.operators.Dedup
          .minhashSignatures(docs, "doc_id", "text", 4).localCheckpoint()
        // pairs feed BOTH the estimate and the candidate-id set below —
        // materialized once, or the band self-joins run twice
        val pairs = graft.operators.Dedup
          .lshCandidatePairsFromSignatures(sig, "doc_id", 4, 2).localCheckpoint()
        val est = pairs
          .join(sig.select(col("doc_id").as("id_a"),
            col("h0").as("a0"), col("h1").as("a1"), col("h2").as("a2"), col("h3").as("a3")), "id_a")
          .join(sig.select(col("doc_id").as("id_b"),
            col("h0").as("b0"), col("h1").as("b1"), col("h2").as("b2"), col("h3").as("b3")), "id_b")
          .select(col("id_a"), col("id_b"),
            (0 until 4).map(i =>
              when(col(s"a$i") === col(s"b$i"), 1L).otherwise(0L))
              .reduce(_ + _).as("est_quarters"))
        // exact Jaccard is routed THROUGH the candidate pair list, never
        // via a co-shingle self-join: a shingle shared by b docs fans a
        // self-join out b² ways (quadratic in popularity — the hot-key
        // trap), while the pair-routed join costs |pairs| × shingles-
        // per-doc, linear in what the report actually covers. The per-doc
        // totals are one linear partial-agg pass. The oracle computes the
        // unrestricted join — same values on candidate pairs, affordable
        // at oracle scale.
        // MEASURED round-17 non-change: riding the shingle as an
        // xxhash64 long through these joins (the repeatedNgramStats
        // treatment) regressed this query 1.6× at 100× scale (33.6 s →
        // 54.9 s, paired same-data runs) — the pair-attach joins'
        // cost is their fan-out volume, and the narrower rows dropped
        // the shuffle below AQE's skew-split thresholds (the
        // ngramJaccard finding). The string shingle stays.
        val w = graft.operators.Dedup.shingleRows(docs, "doc_id", "text")
          .distinct().localCheckpoint()
        val n = w.groupBy("doc_id").agg(count(lit(1)).as("nd"))
        val shared = pairs
          .join(w.select(col("doc_id").as("id_a"), col("sh")), "id_a")
          .join(w.select(col("doc_id").as("id_b"), col("sh")), Seq("id_b", "sh"))
          .groupBy("id_a", "id_b")
          .agg(count(lit(1)).as("shared"))
        est
          .join(shared, Seq("id_a", "id_b"), "left")
          .join(n.select(col("doc_id").as("id_a"), col("nd").as("na")), "id_a")
          .join(n.select(col("doc_id").as("id_b"), col("nd").as("nb")), "id_b")
          .select(col("id_a"), col("id_b"), col("est_quarters"),
            floor(coalesce(col("shared"), lit(0L)).cast("double")
              / (col("na") + col("nb") - coalesce(col("shared"), lit(0L))) * 1000 + 0.5)
              .cast("long").as("jacc_millis"))
          .orderBy("id_a", "id_b")
      },
      Some(s"WITH sig AS ($minhashSql), pairs AS ($lshPairsSql), " +
        "w AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] AS sh FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents), LATERAL unnest(generate_series(1, len(ws) - 1)) AS t(i)), " +
        "n AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nd FROM w GROUP BY doc_id), " +
        "shr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS shared FROM w a JOIN w b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2), " +
        "est AS (SELECT id_a, id_b, CAST((CASE WHEN a.h0 = b.h0 THEN 1 ELSE 0 END) + (CASE WHEN a.h1 = b.h1 THEN 1 ELSE 0 END) + (CASE WHEN a.h2 = b.h2 THEN 1 ELSE 0 END) + (CASE WHEN a.h3 = b.h3 THEN 1 ELSE 0 END) AS BIGINT) AS est_quarters FROM pairs JOIN sig a ON a.doc_id = id_a JOIN sig b ON b.doc_id = id_b) " +
        "SELECT est.id_a, est.id_b, est.est_quarters, CAST(floor(CAST(COALESCE(shr.shared, 0) AS DOUBLE) / (na.nd + nb.nd - COALESCE(shr.shared, 0)) * 1000 + 0.5) AS BIGINT) AS jacc_millis " +
        "FROM est LEFT JOIN shr ON est.id_a = shr.id_a AND est.id_b = shr.id_b " +
        "JOIN n na ON na.doc_id = est.id_a JOIN n nb ON nb.doc_id = est.id_b " +
        "ORDER BY est.id_a, est.id_b")))

  // Edit-distance verification of LSH candidates — the classic
  // candidate→verify dedup pattern: pairwise Levenshtein runs ONLY on
  // the banded candidates (exact integer cross-engine), never all-pairs.
  private val editVerify = Seq(
    Q("dedup_edit_verify",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val pairs = graft.operators.Dedup
          .lshCandidatePairs(docs, "doc_id", "text", 4, 2)
        val t = docs.select(col("doc_id"), col("text"))
        pairs
          .join(t.select(col("doc_id").as("id_a"), col("text").as("ta")), "id_a")
          .join(t.select(col("doc_id").as("id_b"), col("text").as("tb")), "id_b")
          // length gap is a lower bound on edit distance — prunes the
          // O(threshold·len) DP entirely for most candidate pairs; the
          // thresholded levenshtein bands the rest (returns -1 above 20,
          // never filling the full O(len²) matrix).
          .filter(abs(length(col("ta")) - length(col("tb"))) <= 20)
          .select(col("id_a"), col("id_b"),
            levenshtein(col("ta"), col("tb"), 20).cast("long").as("edit_dist"))
          .filter(col("edit_dist") >= 0)
          .orderBy("id_a", "id_b")
      },
      Some(s"WITH sig AS ($minhashSql), pairs AS ($lshPairsSql) " +
        "SELECT id_a, id_b, CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist " +
        "FROM pairs JOIN documents a ON a.doc_id = id_a JOIN documents b ON b.doc_id = id_b " +
        "WHERE levenshtein(a.text, b.text) <= 20 ORDER BY id_a, id_b")))

  // The clustering oracles are the semantic fixpoint definition
  // (recursive CTE: cluster id = min doc_id reachable); Spark runs
  // large-star/small-star ([[graft.operators.Components]]) — a hash-match
  // proves the contraction reaches the same fixpoint.
  //
  // The Spark-side edge list is the per-band STAR graph (doc → band
  // minimum, [[graft.operators.Dedup.lshStarEdges]]): identical
  // connectivity to the pairwise band graph the oracle walks — within a
  // bucket everything connects through the minimum — but linear, not
  // quadratic, in bucket size (the 100 TB shape; a hot template bucket
  // of 10^5 docs would otherwise emit 5·10^9 pairs).
  private def dupClusters(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val sig = graft.operators.Dedup
      .minhashSignatures(docs, "doc_id", "text", 4).localCheckpoint()
    graft.operators.Components.clusters(
      docs, "doc_id",
      graft.operators.Dedup.lshStarEdges(sig, "doc_id", 4, 2),
      "id_a", "id_b")
  }
  private val pipeline = Seq(
    Q("dedup_clusters",
      (s, d) => dupClusters(s, d).orderBy("doc_id"),
      Some(s"WITH RECURSIVE sig AS ($minhashSql), pairs AS ($lshPairsSql), " +
        "sym AS (SELECT id_a AS a, id_b AS b FROM pairs UNION SELECT id_b, id_a FROM pairs), " +
        "reach(id, r) AS (SELECT doc_id, doc_id FROM documents UNION SELECT reach.id, sym.b FROM reach JOIN sym ON reach.r = sym.a) " +
        "SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id FROM reach GROUP BY id ORDER BY doc_id")),

    // Canonical-doc selection: one row per duplicate cluster with its
    // size — the keep-list/drop-report stage after clustering.
    Q("dedup_canonical",
      (s, d) => dupClusters(s, d)
        .groupBy("cluster_id").agg(count(lit(1)).as("n_members"))
        .orderBy("cluster_id"),
      Some(s"WITH RECURSIVE sig AS ($minhashSql), pairs AS ($lshPairsSql), " +
        "sym AS (SELECT id_a AS a, id_b AS b FROM pairs UNION SELECT id_b, id_a FROM pairs), " +
        "reach(id, r) AS (SELECT doc_id, doc_id FROM documents UNION SELECT reach.id, sym.b FROM reach JOIN sym ON reach.r = sym.a), " +
        "lab AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id) " +
        "SELECT CAST(cluster_id AS BIGINT) AS cluster_id, CAST(count(*) AS BIGINT) AS n_members FROM lab GROUP BY cluster_id ORDER BY cluster_id")),

    // Leakage-free split: train/val/test assigned by DUPLICATE-CLUSTER
    // id, so near-dup docs never straddle splits (splitting by doc id
    // leaks paraphrases of training docs into test).
    Q("split_assign",
      (s, d) => graft.operators.Sampling
        .splitByGroup(dupClusters(s, d), "cluster_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy("split").agg(count(lit(1)).as("n"))
        .orderBy("split"),
      Some(s"WITH RECURSIVE sig AS ($minhashSql), pairs AS ($lshPairsSql), " +
        "sym AS (SELECT id_a AS a, id_b AS b FROM pairs UNION SELECT id_b, id_a FROM pairs), " +
        "reach(id, r) AS (SELECT doc_id, doc_id FROM documents UNION SELECT reach.id, sym.b FROM reach JOIN sym ON reach.r = sym.a), " +
        "lab AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id) " +
        "SELECT split, CAST(count(*) AS BIGINT) AS n FROM (SELECT CASE WHEN substr(md5(CAST(cluster_id AS VARCHAR)), 1, 8) < 'cccccccd' THEN 'train' WHEN substr(md5(CAST(cluster_id AS VARCHAR)), 1, 8) < 'e6666666' THEN 'val' ELSE 'test' END AS split FROM lab) GROUP BY split ORDER BY split")),

    // Deterministic Bernoulli sample: md5-prefix threshold (reproducible
    // across runs/engines/partitionings, unlike rand()-based sample()).
    Q("sample_bernoulli",
      (s, d) => graft.operators.Sampling
        .bernoulli(Tables.documents(s, d), "doc_id", 0.25)
        .select("doc_id").orderBy("doc_id"),
      Some("SELECT doc_id FROM documents WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '40000000' ORDER BY doc_id")),

    // Exact-k per-stratum sample by hash order.
    Q("sample_stratified",
      (s, d) => graft.operators.Sampling
        .stratified(Tables.events(s, d), "event_type", "event_id", 50)
        .select("event_id", "event_type").orderBy("event_type", "event_id"),
      Some("SELECT event_id, event_type FROM (SELECT event_id, event_type, row_number() OVER (PARTITION BY event_type ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn FROM events) WHERE rn <= 50 ORDER BY event_type, event_id")),

    // Per-row weighted (importance) sample: keep probability = a
    // quality proxy (token count / 60, capped at 1) — the standard
    // quality-weighted curation keep, decided by the same md5 threshold
    // as bernoulli but per row. floor (not round) builds the threshold:
    // HALF_UP vs HALF_EVEN differs between engines on exact .5 products.
    // Both engines guard on the FLOORED LONG reaching 2^32 (w within
    // 2^-33 of 1.0 rounds there; its 9-char hex would otherwise be
    // truncated by the 8-wide pad), mirroring Sampling.weighted.
    Q("sample_weighted",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .withColumn("w",
            size(split(lower(col("text")), " ")).cast("double") / 60.0)
        graft.operators.Sampling.weighted(docs, "doc_id", "w")
          .select("doc_id").orderBy("doc_id")
      },
      Some("SELECT doc_id FROM (SELECT doc_id, CAST(len(string_split(lower(text), ' ')) AS DOUBLE) / 60.0 AS w FROM documents) " +
        "WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < " +
        "(CASE WHEN floor(w * 4294967296.0) >= 4294967296 THEN 'g' ELSE printf('%08x', CAST(floor(w * 4294967296.0) AS BIGINT)) END) ORDER BY doc_id")),

    // Domain-mixture sample: per-source keep rates with a default.
    Q("sample_mixture",
      (s, d) => graft.operators.Sampling
        .mixture(Tables.documents(s, d), "source", "doc_id",
          Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25), defaultRate = 0.1)
        .select("doc_id", "source").orderBy("doc_id"),
      Some("SELECT doc_id, source FROM documents WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < " +
        "(CASE WHEN source = 'src0' THEN 'g' WHEN source = 'src1' THEN '80000000' WHEN source = 'src2' THEN '40000000' ELSE '1999999a' END) ORDER BY doc_id")),

    // Temperature-scaled source mixing (α = 1/2, the mT5/XLM-R
    // flattening; [[graft.operators.Sampling.temperatureMix]]): per-
    // source targets B·⌊√n_i⌋ div Σ⌊√n_j⌋ computed FROM the corpus,
    // selection by md5 rank. All-integer (correctly-rounded IEEE sqrt
    // + floor), so the kept set is bit-identical cross-engine.
    Q("mix_temperature",
      (s, d) => graft.operators.Sampling
        .temperatureMix(Tables.documents(s, d), "source", "doc_id")
        .select("doc_id", "source", "kept").orderBy("doc_id"),
      Some("WITH cnt AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY source), " +
        "w AS (SELECT source, n, CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS w FROM cnt), " +
        "tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(w) AS BIGINT) AS ww FROM w), " +
        "tgt AS (SELECT source, ((nn // 2) * w) // ww AS target FROM w, tot), " +
        "r AS (SELECT doc_id, source, row_number() OVER (PARTITION BY source ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id) AS rk FROM documents) " +
        "SELECT doc_id, source, rk <= target AS kept FROM r JOIN tgt USING (source) ORDER BY doc_id")),

    // Per-source dataset datasheet — the rollup report a curation run
    // ships with (Gebru et al. "Datasheets for Datasets" made
    // queryable): doc/token volumes, exact-dup count (docs minus
    // distinct md5), language spread, and the quality-gate keep rate,
    // one row per source. Composes verified signals (gate rules =
    // text_quality_gate's, punct via the translate scan); all integer
    // or integer-ratio permille — hash-exact cross-engine. One scan +
    // one source-keyed agg at any corpus size.
    Q("report_datacard",
      (s, d) => {
        val toks = size(split(lower(col("text")), " ")).cast("long")
        val punct = graft.functions.Text.punctCount(col("text"))
        val swRatio = graft.functions.Text.stopwordHits(col("text")).cast("double") / toks
        val cpt = length(col("text")).cast("double") / toks
        val keep = !(toks < 5 || toks > 1000 || swRatio < 0.05 ||
          punct.cast("double") / length(col("text")) > 0.3 || cpt > 12.0)
        Tables.documents(s, d)
          .select(col("source"), toks.as("t"), md5(col("text")).as("h"),
            col("lang"), keep.as("k"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("t")).as("n_tokens"),
            countDistinct(col("h")).as("n_uniq"),
            countDistinct(col("lang")).as("n_langs"),
            sum(when(col("k"), 1L).otherwise(0L)).as("n_keep"))
          .select(col("source"), col("n_docs"), col("n_tokens"),
            expr("n_tokens div n_docs").as("toks_per_doc"),
            (col("n_docs") - col("n_uniq")).as("n_exact_dup"),
            col("n_langs"), col("n_keep"),
            expr("n_keep * 1000 div n_docs").as("keep_permille"))
          .orderBy("source")
      },
      Some("WITH b AS (SELECT source, lang, md5(text) AS h, " +
        "CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS t, " +
        "NOT (len(string_split(lower(text), ' ')) < 5 OR len(string_split(lower(text), ' ')) > 1000 " +
        s"OR CAST(len(list_filter(string_split(lower(text), ' '), w -> w IN ${graft.functions.Text.StopWordsSql})) AS DOUBLE) / len(string_split(lower(text), ' ')) < 0.05 " +
        "OR CAST(len(regexp_extract_all(lower(text), '[^a-z0-9 ]')) AS DOUBLE) / length(text) > 0.3 " +
        "OR CAST(length(text) AS DOUBLE) / len(string_split(lower(text), ' ')) > 12.0) AS k FROM documents) " +
        "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, CAST(SUM(t) AS BIGINT) AS n_tokens, " +
        "CAST(SUM(t) AS BIGINT) // CAST(count(*) AS BIGINT) AS toks_per_doc, " +
        "CAST(count(*) - count(DISTINCT h) AS BIGINT) AS n_exact_dup, " +
        "CAST(count(DISTINCT lang) AS BIGINT) AS n_langs, " +
        "CAST(SUM(CASE WHEN k THEN 1 ELSE 0 END) AS BIGINT) AS n_keep, " +
        "CAST(SUM(CASE WHEN k THEN 1 ELSE 0 END) AS BIGINT) * 1000 // CAST(count(*) AS BIGINT) AS keep_permille " +
        "FROM b GROUP BY source ORDER BY source")),

    // Upsert/MERGE as a plan: keyed updates replace, new keys insert,
    // the rest passes through (what MERGE INTO compiles to on a table
    // format). Updates = doubled balances for custkey ≤ 100 plus
    // synthetic new keys; oracle is the CASE/UNION semantic twin.
    Q("k5_upsert",
      (s, d) => {
        val base = Tables.customer(s, d).select("c_custkey", "c_name", "c_acctbal")
        val modified = base.filter(col("c_custkey") <= 100)
          .withColumn("c_acctbal", col("c_acctbal") * 2)
        val inserted = base.filter(col("c_custkey") <= 5)
          .select((col("c_custkey") + 1000000).as("c_custkey"),
            col("c_name"), col("c_acctbal"))
        graft.operators.Upsert(base, modified.unionByName(inserted), "c_custkey")
          .orderBy("c_custkey")
      },
      Some("SELECT * FROM (SELECT c_custkey, c_name, CASE WHEN c_custkey <= 100 THEN c_acctbal * 2 ELSE c_acctbal END AS c_acctbal FROM customer UNION ALL SELECT c_custkey + 1000000 AS c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey <= 5) ORDER BY c_custkey")),

    // Type-2 SCD maintenance ([[graft.operators.Scd2]]): one change
    // batch versioned into a customer dimension — real changes close
    // the open version and insert a fresh one, no-op updates pass
    // through, unseen keys insert their first version, history rows are
    // untouched. One key-equi full-outer join of the current slice
    // against the batch (the history slice never shuffles); the oracle
    // is the CASE/UNION semantic twin of the same batch.
    Q("scd2_apply",
      (s, d) => graft.operators.Scd2(scd2Dim0(s, d), scd2Batch2(s, d),
          "c_custkey", tracked = Seq("cents", "c_mktsegment"),
          batchVersion = 2L)
        .orderBy("c_custkey", "valid_from"),
      scd2ApplyOracle),

    // Point-in-time dimension reads ([[graft.operators.Scd2.asOf]]) —
    // the payoff of keeping the history: the POST-batch dimension read
    // AS OF version 0 reproduces the pre-batch state exactly (closed
    // versions stay visible below their valid_to), and AS OF version 2
    // reads the post-batch current set. Both reads union into one
    // result tagged by as_of; a pure filter per read, no join.
    Q("scd2_as_of",
      (s, d) => {
        val merged = graft.operators.Scd2(scd2Dim0(s, d), scd2Batch2(s, d),
          "c_custkey", tracked = Seq("cents", "c_mktsegment"),
          batchVersion = 2L).localCheckpoint()
        val at0 = graft.operators.Scd2.asOf(merged, 0L)
          .withColumn("as_of", lit(0L))
        val at2 = graft.operators.Scd2.asOf(merged, 2L)
          .withColumn("as_of", lit(2L))
        at0.unionByName(at2).orderBy("as_of", "c_custkey", "valid_from")
      },
      Some(s"WITH $scd2MergedCtes, " +
        "r0 AS (SELECT c_custkey, c_name, c_nationkey, cents, c_mktsegment, valid_from, valid_to, " +
        "CAST(0 AS BIGINT) AS as_of FROM merged WHERE valid_from <= 0 AND (valid_to IS NULL OR valid_to > 0)), " +
        "r2 AS (SELECT c_custkey, c_name, c_nationkey, cents, c_mktsegment, valid_from, valid_to, " +
        "CAST(2 AS BIGINT) AS as_of FROM merged WHERE valid_from <= 2 AND (valid_to IS NULL OR valid_to > 2)) " +
        "SELECT * FROM (SELECT * FROM r0 UNION ALL SELECT * FROM r2) " +
        "ORDER BY as_of, c_custkey, valid_from")),

    // Incremental materialized-view maintenance ([[graft.operators.Mv]],
    // the Z-set/DBSP weighted-changelog formulation): a per-customer
    // (count, cents) view over pre-2001 orders is refreshed by a delta
    // changelog — every 2001+ order as a +1 insert, every 97th base
    // order as a −1 retraction — WITHOUT rescanning the base facts:
    // delta-sized partial agg, one key-equi full-outer merge, zeroed
    // keys drop out. The oracle is the FULL RECOMPUTE over
    // (base ∖ retracted) ∪ inserted — hash equality with the
    // incremental path is the IVM correctness statement.
    Q("mv_incremental",
      (s, d) => {
        val o = Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            cents(col("o_totalprice")).cast("long").as("c"))
        val base = o.filter(col("o_orderdate") < "2001-01-01")
        val view = graft.operators.Mv.counters(
          base.withColumn("w", lit(1L)), Seq("o_custkey"), "w", Seq("c"))
        val changelog = o.filter(col("o_orderdate") >= "2001-01-01")
          .withColumn("w", lit(1L))
          .unionByName(base.filter(col("o_orderkey") % 97 === 0)
            .withColumn("w", lit(-1L)))
        val delta = graft.operators.Mv.counters(
          changelog, Seq("o_custkey"), "w", Seq("c"))
        graft.operators.Mv.merge(view, delta, Seq("o_custkey"), Seq("c"))
          .orderBy("o_custkey")
      },
      Some("SELECT o_custkey, CAST(count(*) AS BIGINT) AS n, CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_c " +
        "FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00' OR o_orderkey % 97 <> 0 " +
        "GROUP BY o_custkey ORDER BY o_custkey")),

    // Incremental JOIN maintenance ([[graft.operators.Mv.deltaJoin]]):
    // the bilinear Z-set rule Δ(A⋈B) = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB with
    // multiplying multiplicities, applied to orders ⋈ customer with
    // BOTH sides changing — late orders + cancellations on the fact
    // side, segment reassignments (retract + insert) on the dim side —
    // then folded into the per-segment counter view through the same
    // counters/merge machinery as mv_incremental. The oracle is the
    // full recompute over the post-update tables: content equality IS
    // the join-IVM correctness statement. At 100 TB the three delta
    // terms each join hours of CDC against a base (or another delta);
    // base⋈base is never recomputed.
    Q("mv_join_delta",
      (s, d) => {
        import graft.operators.Mv
        val o = Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            cents(col("o_totalprice")).cast("long").as("c"))
        val aBase = o.filter(col("o_orderdate") < "2001-01-01")
          .withColumn("w", lit(1L)).drop("o_orderdate")
        val aDelta = o.filter(col("o_orderdate") >= "2001-01-01")
          .withColumn("w", lit(1L))
          .unionByName(o.filter(col("o_orderdate") < "2001-01-01" &&
            col("o_orderkey") % 97 === 0).withColumn("w", lit(-1L)))
          .drop("o_orderdate")
        val cust = Tables.customer(s, d).select("c_custkey", "c_mktsegment")
        val bBase = cust.withColumn("w", lit(1L))
        val moved = cust.filter(col("c_custkey") % 7 === 0)
        val bDelta = moved.withColumn("w", lit(-1L))
          .unionByName(moved.withColumn("c_mktsegment", lit("MOVED"))
            .withColumn("w", lit(1L)))
        val baseJoin = Mv.zJoin(aBase, bBase, "o_custkey", "c_custkey")
        val dj = Mv.deltaJoin(aBase, aDelta, bBase, bDelta,
          "o_custkey", "c_custkey")
        val view = Mv.counters(baseJoin, Seq("c_mktsegment"), "w", Seq("c"))
        val delta = Mv.counters(dj, Seq("c_mktsegment"), "w", Seq("c"))
        Mv.merge(view, delta, Seq("c_mktsegment"), Seq("c"))
          .orderBy("c_mktsegment")
      },
      Some("SELECT seg AS c_mktsegment, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_c " +
        "FROM (SELECT o_totalprice, CASE WHEN c_custkey % 7 = 0 THEN 'MOVED' ELSE c_mktsegment END AS seg " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00' OR o_orderkey % 97 <> 0) " +
        "GROUP BY 1 ORDER BY 1")),

    // Deterministic shard assignment: per-shard row counts (the training
    // shard-balance report; assignment is engine-portable md5, not
    // Spark-specific murmur hash).
    Q("shard_assign",
      (s, d) => Tables.documents(s, d)
        .groupBy(graft.operators.Shards.shardId(col("doc_id"), 8).as("shard"))
        .agg(count(lit(1)).as("n"))
        .orderBy("shard"),
      Some("SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 8 AS shard, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1 ORDER BY 1")),

    // Small-file compaction rewrite ([[graft.operators.Shards.compact]]):
    // the corpus is deliberately fragmented into 48 small parquet files,
    // then bin-packed (first-fit decreasing over file METADATA, Delta
    // OPTIMIZE granularity) into ~256 KiB pack partitions with one
    // shuffle, and read back. The oracle is row-level content
    // preservation against the ORIGINAL table — a compaction that drops,
    // duplicates, or mutates a single row hash-mismatches. Size envelope
    // and file-count reduction are pinned in ShardsSpec (disk-dependent,
    // not oracle-able cross-engine).
    Q("compact_roundtrip",
      (s, d) => {
        val tmp = java.nio.file.Files.createTempDirectory("graft_compact_")
        try {
          val in = tmp.resolve("small").toString
          val out = tmp.resolve("packed").toString
          Tables.documents(s, d).select(col("doc_id"), col("text"))
            .repartition(48).write.mode("overwrite").parquet(in)
          graft.operators.Shards.compact(s, in, out, targetBytes = 256 * 1024)
          s.read.parquet(out)
            .select(col("doc_id"), md5(col("text")).as("text_md5"))
            .orderBy("doc_id")
            .localCheckpoint() // pull rows off disk before the cleanup
        } finally graft.util.Paths.deleteRecursively(tmp)
      },
      Some("SELECT doc_id, md5(text) AS text_md5 FROM documents ORDER BY doc_id")),

    // Symmetric int8 scalar quantization of embeddings (4× ANN memory
    // cut). Fixed per-element IEEE tree — exact cross-engine.
    Q("emb_quantize",
      (s, d) => {
        val e = Tables.embeddings(s, d)
          .withColumn("mx", Vectors.maxAbs(col("embedding")))
        // serialized to a string: the driver's comparator sorts result
        // frames by every column, and raw array cells break that sort
        // (round-2 CORRECTNESS recorded a comparator crash, not a
        // mismatch — the values themselves hash-matched in the mimic).
        e.select(col("vec_id"),
          array_join(Vectors.quantizeInt8(col("embedding"), col("mx")), ",").as("q"))
          .orderBy("vec_id")
      },
      Some("SELECT vec_id, array_to_string([CAST(floor(CAST(x AS DOUBLE) * (127.0 / mx) + 0.5) AS BIGINT) for x in embedding], ',') AS q " +
        "FROM (SELECT vec_id, embedding, list_max([abs(CAST(x AS DOUBLE)) for x in embedding]) AS mx FROM embeddings) ORDER BY vec_id")),

    // Round-trip reconstruction error of the quantization, in exact
    // integer micro-units — the quantized-ANN quality gate.
    Q("emb_quant_error",
      (s, d) => {
        val e = Tables.embeddings(s, d)
          .withColumn("mx", Vectors.maxAbs(col("embedding")))
          .withColumn("q", Vectors.quantizeInt8(col("embedding"), col("mx")))
        e.select(col("vec_id"),
          Vectors.quantErrorMicros(col("embedding"), col("q"), col("mx")).as("err_micros"))
          .orderBy("vec_id")
      },
      Some("SELECT vec_id, CAST(floor(list_max([abs(CAST(q[i] AS DOUBLE) * (mx / 127.0) - CAST(embedding[i] AS DOUBLE)) for i in generate_series(1, len(embedding))]) * 1000000 + 0.5) AS BIGINT) AS err_micros " +
        "FROM (SELECT vec_id, embedding, mx, [CAST(floor(CAST(x AS DOUBLE) * (127.0 / mx) + 0.5) AS BIGINT) for x in embedding] AS q " +
        "FROM (SELECT vec_id, embedding, list_max([abs(CAST(x AS DOUBLE)) for x in embedding]) AS mx FROM embeddings)) ORDER BY vec_id")))


  val all: Seq[Q] = decontam ++ containmentQ ++ spanQs ++ editVerify ++ pipeline
}
