package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Text, Vectors}

/** One driver-verifiable query per operator in SURVEY.md §2 (names carry the
  * operator ids), plus the beyond-reference training-data-pipeline operators
  * (dedup / similarity / text analysis / multimodal plumbing).
  *
  * Every query is written twice: once as a Spark DataFrame plan and once as
  * DuckDB SQL for the driver's oracle diff. Cross-engine determinism rules
  * used throughout:
  *
  *  - every result has a total-order `ORDER BY` (ties broken by a key);
  *  - no raw timestamps in outputs (formatted to strings; engines disagree
  *    on ns-precision and tz-awareness in parquet round-trips);
  *  - no FP aggregation of non-integer-valued doubles: money-like sums go
  *    through the "cents trick" `floor(x*100 + 0.5)` — identical IEEE ops in
  *    both engines, then exact integer sums;
  *  - per-row double arithmetic (a fixed expression tree of IEEE ops) is
  *    deterministic and allowed;
  *  - FP thresholds are chosen inside empirically-verified wide gaps of the
  *    data's value distribution, so 1e-12 summation noise cannot flip a row.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Catalog {

  /** floor(x*100 + 0.5) — exact cross-engine integer cents. */
  private def cents(c: Column): Column = floor(c * 100 + lit(0.5))

  /** One ANSI string, run verbatim by BOTH Spark SQL and the DuckDB
    * oracle (s7_sql_exists).
    */
  private val SqlExists: String =
    "SELECT c_custkey FROM customer c WHERE EXISTS " +
      "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000) " +
      "ORDER BY c_custkey"

  // --------------------------------------------------------------------
  // Scans / sources / sinks (SURVEY §2.1)
  // --------------------------------------------------------------------

  private val scans = Seq(
    // S1: tolerant line-JSON scan (reference: json.loads-per-line with
    // except-continue, DataProcessing.ipynb c9). Here: JSON column extract.
    Q("s1_json_extract",
      (s, d) => Tables.events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy("event_id"),
      Some("SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events ORDER BY event_id")),

    // S2: scan with pushed filter + sort (cache.py:153).
    Q("s2_scan_filter_sort",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber"),
      Some("SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity > 45 ORDER BY l_orderkey, l_linenumber")),

    // S3: projection-only scan — column pruning (cache.py:224).
    Q("s3_projection_prune",
      (s, d) => Tables.orders(s, d)
        .select("o_orderkey", "o_orderpriority")
        .orderBy("o_orderkey"),
      Some("SELECT o_orderkey, o_orderpriority FROM orders ORDER BY o_orderkey")),

    // S4/F5: point read by key (cache.py:63,166).
    Q("s4_point_read",
      (s, d) => Tables.customer(s, d)
        .filter(col("c_custkey") === 42)
        .select("c_custkey", "c_name", "c_mktsegment"),
      Some("SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_custkey = 42")),

    // K4/A6: count (c26/c38).
    Q("k4_count",
      (s, d) => Tables.lineitem(s, d).agg(count(lit(1)).as("cnt")),
      Some("SELECT CAST(count(*) AS BIGINT) AS cnt FROM lineitem")),

    // S6: catalog listing (list_collection_names, c24/c25). Oracle = the
    // static registered-name list: SHOW TABLES must surface exactly the
    // views just registered.
    Q("s6_catalog_listing",
      (s, d) => {
        Tables.names.foreach(n =>
          Tables(s, d, n).createOrReplaceTempView(s"graft_$n"))
        s.sql("SHOW TABLES")
          .filter(col("tableName").startsWith("graft_"))
          .select("tableName").orderBy("tableName")
      },
      Some("SELECT tableName FROM (VALUES " +
        Tables.names.map(n => s"('graft_$n')").sorted.mkString(", ") +
        ") AS t(tableName) ORDER BY tableName")),

    // Reference golden end-to-end: the FULL ingest + search spine (§3.1)
    // over the synthetic raw capture — tolerant JSONL scan skipping
    // deletes/garbage, duplicate-delivery dedup, retweet assembly onto
    // canonical originals, the users branch across all four author
    // positions, lang-partitioned parquet sinks, then the F1 "house"
    // keyword search (the reference's 44-row golden check, cell 28) —
    // reduced to one row of counts. The fixture's structure follows
    // closed-form membership rules on the tweet index (GoldenFixture),
    // so the oracle computes every count arithmetically from
    // generate_series without parsing any JSON: a hash match checks the
    // whole pipeline's semantics, not a re-run of it.
    Q("ref_golden_search",
      (s, d) => {
        val base = java.nio.file.Files.createTempDirectory("graft_golden_")
        try {
          val rawPath = base.resolve("raw.jsonl").toString
          graft.ingest.GoldenFixture.writeRaw(rawPath, 150)
          val tweetsDir = base.resolve("tweets").toString
          val usersDir = base.resolve("users").toString
          graft.ingest.TweetIngest.run(s, rawPath, tweetsDir, usersDir)
          val tweets = s.read.parquet(tweetsDir)
          val users = s.read.parquet(usersDir)
          val raw = graft.ingest.TweetIngest.readRaw(s, rawPath)
          val tAgg = tweets.agg(
            count(lit(1)).as("n_tweets"),
            sum(when(graft.operators.Predicates.keywordMatch("house"), 1L)
              .otherwise(0L)).as("n_house"),
            coalesce(sum(size(col("retweets"))), lit(0)).cast("long")
              .as("n_retweet_elems"))
          val uAgg = users.agg(count(lit(1)).as("n_users"))
          val rAgg = raw.agg(
            (count(lit(1)) - countDistinct(col("id_str"))).as("n_dupes_removed"))
          // eager localCheckpoint: the one-row result must leave the temp
          // dir before the finally below deletes the fixture + sinks
          tAgg.crossJoin(uAgg).crossJoin(rAgg).localCheckpoint()
        } finally graft.util.Paths.deleteRecursively(base)
      },
      Some("WITH i AS (SELECT unnest(generate_series(0, 149)) AS i) " +
        "SELECT CAST((SELECT count(*) FROM i) AS BIGINT) AS n_tweets, " +
        "CAST((SELECT count(*) FROM i WHERE i % 7 = 0) AS BIGINT) AS n_house, " +
        "CAST((SELECT count(*) FROM i WHERE i % 4 = 0) AS BIGINT) AS n_retweet_elems, " +
        "CAST((SELECT count(DISTINCT 1000 + i % 50) FROM i) " +
        "+ (SELECT count(*) FROM i WHERE i % 4 = 0) " +
        "+ (SELECT count(DISTINCT 2000 + i % 10) FROM i WHERE i % 9 = 0) AS BIGINT) AS n_users, " +
        "CAST((SELECT count(*) FROM i WHERE i % 5 = 0) AS BIGINT) AS n_dupes_removed")),

    // K3: result-cache checkpoint/restore round trip (reference
    // cache.py:62-67,125): run a search, PUT it in a ResultCache,
    // checkpoint the cache to parquet, restore into a FRESH cache
    // instance, and serve the rows from the restored entry — the
    // restart-serves-hit path. The oracle is the direct query, so a hash
    // match proves the JSON-serialized payload round-trips bit-exact
    // through the parquet sink (schema DDL, row values, LRU key).
    Q("k3_cache_roundtrip",
      (s, d) => {
        val tmp = java.nio.file.Files.createTempDirectory("graft_cache_")
        val search = Tables.customer(s, d)
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"), col("c_name"),
            cents(col("c_acctbal")).as("bal_cents"))
          .orderBy(col("bal_cents").desc, col("c_custkey"))
          .limit(50)
        val rows =
          try {
            val path = tmp.resolve("ckpt").toString
            val live = new graft.cache.ResultCache()
            live.put("search", Seq("seg" -> "BUILDING"), search)
            live.checkpoint(s, path)
            val restored = new graft.cache.ResultCache()
            restored.restore(s, path)
            restored.get("search", Seq("seg" -> "BUILDING"))
              .getOrElse(sys.error("restored cache missed a checkpointed key"))
          } finally {
            // the restore already materialized the rows; drop the
            // checkpoint dir so bench loops don't litter /tmp
            graft.util.Paths.deleteRecursively(tmp)
          }
        s.createDataFrame(java.util.Arrays.asList(rows: _*), search.schema)
          .orderBy(col("bal_cents").desc, col("c_custkey"))
      },
      Some("SELECT c_custkey, c_name, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents FROM customer WHERE c_mktsegment = 'BUILDING' ORDER BY bal_cents DESC, c_custkey LIMIT 50")),

    // K6: LRU-eviction + TTL-expiry semantics through a checkpoint/restore
    // cycle (reference cache.py:55 TTL, :86-90 move_to_end, :117-124
    // eviction). Manual clock, capacity-2 cache: put A@0s, put B@5s,
    // GET A@6s (promotes A to most-recent — without move_to_end the next
    // put would evict A, flipping two output rows), put C@7s (evicts B),
    // checkpoint; restore into a FRESH capacity-2 cache and probe at 12s
    // with ttl=10s: A is IN the checkpoint but expired (age 12s), B was
    // evicted before the checkpoint, C serves a hit whose payload integers
    // the oracle recomputes from the base table. Every behavioral branch —
    // evicted vs expired vs hit — lands in a different output row, and
    // the DuckDB twin derives the survivor set closed-form.
    Q("k6_cache_evict",
      (s, d) => {
        import org.apache.spark.sql.types._
        val tmp = java.nio.file.Files.createTempDirectory("graft_cache_")
        def seg(m: String) = Tables.customer(s, d)
          .filter(col("c_mktsegment") === m)
          .select(col("c_custkey"), col("c_name"),
            cents(col("c_acctbal")).cast("long").as("bal_cents"))
          .orderBy(col("bal_cents").desc, col("c_custkey"))
          .limit(50)
        val segs = Seq("BUILDING", "AUTOMOBILE", "MACHINERY")
        val out =
          try {
            val path = tmp.resolve("ckpt").toString
            var now = 0L
            val live = new graft.cache.ResultCache(
              maxSize = 2, ttlSeconds = 10, clock = () => now)
            live.put("search", Seq("seg" -> "BUILDING"), seg("BUILDING"))
            now = 5000L
            live.put("search", Seq("seg" -> "AUTOMOBILE"), seg("AUTOMOBILE"))
            now = 6000L
            live.get("search", Seq("seg" -> "BUILDING")) // promote A
            now = 7000L
            live.put("search", Seq("seg" -> "MACHINERY"), seg("MACHINERY"))
            live.checkpoint(s, path)
            val restored = new graft.cache.ResultCache(
              maxSize = 2, ttlSeconds = 10, clock = () => now)
            restored.restore(s, path)
            val inCkpt = restored.checkpointedKeys(s, path).toSet
            now = 12000L
            segs.map { m =>
              val key = s"search|seg=$m"
              val hit = restored.get("search", Seq("seg" -> m))
              org.apache.spark.sql.Row(key, inCkpt.contains(key), hit.isDefined,
                hit.map(h => Long.box(h.size.toLong)).orNull,
                hit.map(h => Long.box(h.map(_.getLong(2)).sum)).orNull)
            }
          } finally {
            graft.util.Paths.deleteRecursively(tmp)
          }
        val schema = StructType(Seq(
          StructField("key", StringType),
          StructField("in_checkpoint", BooleanType),
          StructField("serves_hit", BooleanType),
          StructField("n_rows", LongType),
          StructField("bal_sum", LongType)))
        s.createDataFrame(java.util.Arrays.asList(out: _*), schema)
          .orderBy("key")
      },
      Some("WITH m AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(bal_cents) AS BIGINT) AS s FROM " +
        "(SELECT CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents, c_custkey FROM customer " +
        "WHERE c_mktsegment = 'MACHINERY' ORDER BY bal_cents DESC, c_custkey LIMIT 50)) " +
        "SELECT * FROM (" +
        "SELECT 'search|seg=AUTOMOBILE' AS key, FALSE AS in_checkpoint, FALSE AS serves_hit, CAST(NULL AS BIGINT) AS n_rows, CAST(NULL AS BIGINT) AS bal_sum " +
        "UNION ALL SELECT 'search|seg=BUILDING', TRUE, FALSE, NULL, NULL " +
        "UNION ALL SELECT 'search|seg=MACHINERY', TRUE, TRUE, (SELECT n FROM m), (SELECT s FROM m)" +
        ") ORDER BY key")))

  // --------------------------------------------------------------------
  // Projections / filters (SURVEY §2.2)
  // --------------------------------------------------------------------

  private val filters = Seq(
    // P1/P2: field whitelist + computed column (c16). Per-row double
    // arithmetic — deterministic (fixed IEEE expression tree).
    Q("p2_computed_project",
      (s, d) => Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("SELECT l_orderkey, l_linenumber, l_extendedprice * (1 - l_discount) AS revenue FROM lineitem ORDER BY l_orderkey, l_linenumber")),

    // F1: case-insensitive regex substring match on text (app.py:122).
    Q("f1_regex_search",
      (s, d) => Tables.documents(s, d)
        .filter(col("text").rlike("(?i)spark"))
        .select("doc_id").orderBy("doc_id"),
      Some("SELECT doc_id FROM documents WHERE regexp_matches(text, '(?i)spark') ORDER BY doc_id")),

    // F2: any-array-element-in-list membership (hashtag $in, app.py:126).
    Q("f2_any_token_in",
      (s, d) => Tables.documents(s, d)
        .filter(arrays_overlap(split(col("text"), " "),
          array(lit("vector"), lit("stream"))))
        .select("doc_id").orderBy("doc_id"),
      Some("SELECT doc_id FROM documents WHERE list_has_any(string_split(text, ' '), ['vector','stream']) ORDER BY doc_id")),

    // F3: language equality (app.py:128).
    Q("f3_lang_eq",
      (s, d) => Tables.documents(s, d)
        .filter(col("lang") === "en")
        .select("doc_id").orderBy("doc_id"),
      Some("SELECT doc_id FROM documents WHERE lang = 'en' ORDER BY doc_id")),

    // F6/F7: disjunction + conjunctive predicate accretion (cache.py:143-151)
    // — implementing the reference's *intended* OR (its hashtag branch
    // clobbers the keyword branch, SURVEY §2.2 F6).
    Q("f6_f7_compound_pred",
      (s, d) => Tables.events(s, d)
        .filter((col("event_type") === "error" || col("value") > 90)
          && col("user_id") < 25)
        .select("event_id").orderBy("event_id"),
      Some("SELECT event_id FROM events WHERE (event_type = 'error' OR value > 90) AND user_id < 25 ORDER BY event_id")),

    // F8: prefix classifier (startswith 'RT', c9).
    Q("f8_prefix_match",
      (s, d) => Tables.documents(s, d)
        .filter(col("text").startsWith("key"))
        .select("doc_id").orderBy("doc_id"),
      Some("SELECT doc_id FROM documents WHERE text LIKE 'key%' ORDER BY doc_id")),

    // F9: date-range predicate (declared-but-never-applied in the reference,
    // app.py:75-76 — implemented for real here).
    Q("f9_date_range",
      (s, d) => Tables.orders(s, d)
        .filter(col("o_orderdate").between("1995-06-01", "1996-06-01"))
        .select("o_orderkey").orderBy("o_orderkey"),
      Some("SELECT o_orderkey FROM orders WHERE o_orderdate BETWEEN TIMESTAMP '1995-06-01 00:00:00' AND TIMESTAMP '1996-06-01 00:00:00' ORDER BY o_orderkey")))

  // --------------------------------------------------------------------
  // Joins (SURVEY §2.3)
  // --------------------------------------------------------------------

  private val joins = Seq(
    // J1: tweet→user lookup join; reference does N+1 memoized point SELECTs
    // (app.py:205) — here a single broadcast hash left join.
    Q("j1_lookup_join",
      (s, d) => Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"), "left")
        .select("o_orderkey", "c_name", "c_mktsegment")
        .orderBy("o_orderkey"),
      Some("SELECT o_orderkey, c_name, c_mktsegment FROM orders LEFT JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey")),

    // J2/A7: child-group assembly joined back to the parent (c16
    // add_retweets): partial aggregation map-side, then join.
    Q("j2_group_assemble",
      (s, d) => {
        val li = Tables.lineitem(s, d).groupBy(col("l_orderkey")).agg(
          count(lit(1)).as("n_items"),
          sum(col("l_quantity")).as("sum_qty"),
          max(col("l_extendedprice")).as("max_price"))
        Tables.orders(s, d)
          .join(li, col("o_orderkey") === col("l_orderkey"))
          .select("o_orderkey", "o_orderstatus", "n_items", "sum_qty", "max_price")
          .orderBy("o_orderkey")
      },
      Some("SELECT o_orderkey, o_orderstatus, n_items, sum_qty, max_price FROM orders JOIN (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_items, SUM(l_quantity) AS sum_qty, MAX(l_extendedprice) AS max_price FROM lineitem GROUP BY l_orderkey) ON o_orderkey = l_orderkey ORDER BY o_orderkey")),

    // J3: existence semi-join (cache.py:200-206 dead code, done right).
    Q("j3_semi_exists",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 100000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey").orderBy("c_custkey"),
      Some("SELECT c_custkey FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000) ORDER BY c_custkey")),

    // F4 + anti join: null-check as "has no children" (app.py:120's
    // $exists:False, expressed as an anti join).
    Q("f4_anti_isnull",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey").orderBy("c_custkey"),
      Some("SELECT c_custkey FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT') ORDER BY c_custkey")),

    // Data-profiling report: one pass, one row — counts, distincts,
    // ranges. The pre-training stats check; every signal is exact
    // (cardinalities, integer cents, formatted timestamps), and the plan
    // is a single map-side-partial aggregation at any scale.
    Q("s8_profile_stats",
      (s, d) => Tables.events(s, d).agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(col("event_type")).as("n_event_types"),
        min(col("event_id")).as("min_event_id"),
        max(col("event_id")).as("max_event_id"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("min_ts"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("max_ts"),
        min(cents(col("value"))).as("min_value_cents"),
        max(cents(col("value"))).as("max_value_cents")),
      Some("SELECT CAST(count(*) AS BIGINT) AS n_rows, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users, " +
        "CAST(count(DISTINCT event_type) AS BIGINT) AS n_event_types, min(event_id) AS min_event_id, max(event_id) AS max_event_id, " +
        "strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS min_ts, strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS max_ts, " +
        "CAST(min(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS min_value_cents, " +
        "CAST(max(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS max_value_cents FROM events")),

    // Multi-join analytical query (TPC-H Q3 shape): selective dim filter →
    // two shuffle joins → grouped revenue → top-k. Exercises Catalyst join
    // planning (broadcast for customer, shuffle for orders⋈lineitem) and
    // exact cents revenue.
    Q("j5_multijoin_topk",
      (s, d) => Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < "1997-01-01")
        .join(Tables.lineitem(s, d).filter(col("l_shipdate") > "1997-01-01"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("l_orderkey"))
        .limit(10),
      Some("SELECT l_orderkey, odate, revenue_cents FROM (SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS odate, CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON o_orderkey = l_orderkey WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1997-01-01' AND l_shipdate > TIMESTAMP '1997-01-01' GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d')) ORDER BY revenue_cents DESC, l_orderkey LIMIT 10")),

    // As-of join (nearest prior view for each purchase) — composed from
    // union + running last() (operators.AsOf); DuckDB oracles it with its
    // native ASOF LEFT JOIN. Timestamps truncated to Spark's microsecond
    // parquet precision on the oracle side.
    Q("j6_asof_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts"), col("ts").as("prior_view_ts"))
        graft.operators.AsOf.asofJoin(purchases, views, "user_id", "ts", "prior_view_ts")
          .select(col("event_id"),
            date_format(col("prior_view_ts"), "yyyy-MM-dd HH:mm:ss").as("prior_view"))
          .orderBy("event_id")
      },
      Some("SELECT event_id, strftime(vts, '%Y-%m-%d %H:%M:%S') AS prior_view FROM (SELECT p.event_id, v.vts FROM (SELECT event_id, user_id, date_trunc('microseconds', ts) AS ts FROM events WHERE event_type = 'purchase') p ASOF LEFT JOIN (SELECT user_id, date_trunc('microseconds', ts) AS ts, date_trunc('microseconds', ts) AS vts FROM events WHERE event_type = 'view') v ON p.user_id = v.user_id AND v.ts <= p.ts) ORDER BY event_id")),

    // Full outer join: keep both unmatched sides (customers with no
    // orders AND order-side orphans) — the reconciliation join shape.
    Q("j7_full_outer",
      (s, d) => {
        val perCust = Tables.orders(s, d)
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
        Tables.customer(s, d)
          .join(perCust, col("c_custkey") === col("o_custkey"), "full_outer")
          .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
            col("c_name"), col("n_orders"))
          .orderBy("custkey")
      },
      Some("SELECT coalesce(c_custkey, o_custkey) AS custkey, c_name, n_orders FROM customer FULL OUTER JOIN (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders FROM orders GROUP BY o_custkey) o ON c_custkey = o_custkey ORDER BY custkey")),

    // Forward as-of: each purchase's NEXT view (nearest following).
    // Oracle: min-over-filtered left join — the semantic definition.
    Q("j8_asof_forward",
      (s, d) => {
        val ev = Tables.events(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts"), col("ts").as("next_view_ts"))
        graft.operators.AsOf.asofJoinForward(purchases, views, "user_id", "ts", "next_view_ts")
          .select(col("event_id"),
            date_format(col("next_view_ts"), "yyyy-MM-dd HH:mm:ss").as("next_view"))
          .orderBy("event_id")
      },
      Some("SELECT p.event_id, strftime(date_trunc('microseconds', min(v.ts)), '%Y-%m-%d %H:%M:%S') AS next_view FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'view') v ON v.user_id = p.user_id AND v.ts >= p.ts GROUP BY p.event_id ORDER BY p.event_id")),

    // J4: name→key→rows chain lookup (app.py:269-301).
    Q("j4_chain_lookup",
      (s, d) => Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)
            .filter(col("c_name") === "Customer#000000042")),
          col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey"),
      Some("SELECT o_orderkey, o_totalprice FROM orders JOIN customer ON o_custkey = c_custkey WHERE c_name = 'Customer#000000042' ORDER BY o_orderkey")))

  // --------------------------------------------------------------------
  // Aggregations / windows / sorts / set ops (SURVEY §2.4-2.7)
  // --------------------------------------------------------------------

  private val aggs = Seq(
    // A4/A6 + flagship agg: grouped metrics with exact cross-engine sums
    // (cents trick for money; l_quantity is integer-valued so FP-exact).
    Q("q1_agg",
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_cents"),
          (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty, CAST(SUM(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_cents, CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_cents, SUM(l_quantity)/count(*) AS avg_qty, CAST(count(*) AS BIGINT) AS cnt FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus")),

    // Distinct aggregation (exact; the approx_count_distinct variant is
    // engine-specific HLL and not oracle-comparable).
    Q("a11_count_distinct",
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("nd_parts"),
          countDistinct(col("l_suppkey")).as("nd_supps"))
        .orderBy("l_returnflag"),
      Some("SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT) AS nd_parts, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS nd_supps FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")),

    // Sketch-accuracy gate as a driver-checkable boolean: the HLL++
    // estimate (rsd 0.05 — the fixed-size sketch that replaces exact
    // COUNT DISTINCT's per-group hash set at 100 TB) must sit within
    // 3×rsd of the exact count, per group. The sketch VALUE is
    // engine-specific, so the BOUND is the cross-engine contract: the
    // oracle computes the exact side and asserts TRUE.
    Q("sketch_hll_bound",
      (s, d) => Tables.events(s, d)
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id"), 0.05).as("approx"),
          countDistinct(col("user_id")).as("nd"))
        .select(col("event_type"), col("nd"),
          (abs(col("approx") - col("nd")) <= col("nd") * 0.15).as("within_bound"))
        .orderBy("event_type"),
      Some("SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS nd, TRUE AS within_bound FROM events GROUP BY event_type ORDER BY event_type")),

    // approx_percentile's contract is a RANK bound: at accuracy 1000 the
    // returned value's rank is within 0.1% of the target, so the median
    // estimate must land between the exact 45th and 55th percentiles
    // (enormous slack — any container/interpolation bug still trips it).
    // The exact comparison side is refinement-exact
    // ([[graft.operators.Percentiles.exactRefined]]) — the gate
    // apparatus must itself survive the scale it validates the sketch
    // for; only the sketch is approximate.
    Q("sketch_pct_bound",
      (s, d) => {
        import graft.operators.Percentiles
        val li = Tables.lineitem(s, d).select("l_returnflag", "l_extendedprice")
        val bounds = Percentiles.exactRefined(li, Seq("l_returnflag"),
          "l_extendedprice", Seq(0.45 -> "lo", 0.55 -> "hi"))
        li.groupBy("l_returnflag")
          .agg(expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("ap"))
          .join(bounds, "l_returnflag")
          .select(col("l_returnflag"),
            (col("ap") >= col("lo") && col("ap") <= col("hi")).as("within_bound"))
          .orderBy("l_returnflag")
      },
      Some("SELECT l_returnflag, TRUE AS within_bound FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")),

    // A3: dedup by key (c12/c14/c16 unique_ones set).
    Q("a3_dedup_distinct",
      (s, d) => Tables.events(s, d)
        .select("user_id").distinct().orderBy("user_id"),
      Some("SELECT DISTINCT user_id FROM events ORDER BY user_id")),

    // A4: conditional counters tallied in one scan (c9's
    // num_tweets/num_retweets counters).
    Q("a4_conditional_agg",
      (s, d) => Tables.events(s, d).agg(
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "error", 1).otherwise(0)).as("n_errors"),
        sum(when(col("event_type") === "click", 1).otherwise(0)).as("n_clicks")),
      Some("SELECT CAST(count(*) AS BIGINT) AS n_events, CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors, CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_clicks FROM events")),

    // A5: array length (len(retweets), app.py:240).
    Q("a5_array_length",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .orderBy("doc_id"),
      Some("SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents ORDER BY doc_id")),

    // §2.5: pagination (app.py:200-201). Two-phase: a distributed top-20
    // (TakeOrderedAndProject — only pageEnd rows reach one task) bounds the
    // input, THEN a row_number window ranks the ≤20 survivors. A global
    // window over the unbounded table would move every row to a single
    // task — the round-1 scale-killer (regression-locked in PlanSpec).
    Q("w1_pagination",
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
        .select(col("o_orderkey"), col("o_totalprice"),
          row_number().over(
            Window.orderBy(col("o_totalprice").desc, col("o_orderkey")))
            .cast("long").as("rn"))
        .filter(col("rn").between(11, 20))
        .orderBy("rn"),
      Some("SELECT o_orderkey, o_totalprice, rn FROM (SELECT o_orderkey, o_totalprice, row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) WHERE rn BETWEEN 11 AND 20 ORDER BY rn")),

    // §2.5: per-group top-k generalization (per-user top tweets).
    Q("w2_topk_per_group",
      (s, d) => Tables.orders(s, d)
        .select(col("o_custkey").as("custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(
            Window.partitionBy(col("o_custkey"))
              .orderBy(col("o_totalprice").desc, col("o_orderkey")))
            .as("rn"))
        .filter(col("rn") <= 3)
        .select("custkey", "o_orderkey", "o_totalprice")
        .orderBy("custkey", "o_orderkey"),
      Some("SELECT custkey, o_orderkey, o_totalprice FROM (SELECT o_custkey AS custkey, o_orderkey, o_totalprice, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) WHERE rn <= 3 ORDER BY custkey, o_orderkey")),

    // T1/T2/T3: multi-key descending top-k — fused by Spark into
    // TakeOrderedAndProject (no full sort materialization).
    Q("t1_multikey_topk",
      (s, d) => Tables.events(s, d)
        .orderBy(col("value").desc, col("event_id"))
        .select("event_id", "user_id", "value")
        .limit(50),
      Some("SELECT event_id, user_id, value FROM events ORDER BY value DESC, event_id LIMIT 50")),

    // T4: top-5 sidebar (app.py:156 top users by followers).
    Q("t4_top5",
      (s, d) => Tables.customer(s, d)
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
        .select("c_custkey", "c_acctbal")
        .limit(5),
      Some("SELECT c_custkey, c_acctbal FROM customer ORDER BY c_acctbal DESC, c_custkey LIMIT 5")),

    // Hierarchical totals: ROLLUP over (returnflag, linestatus) — subtotal
    // and grand-total rows carry NULL group keys, so both engines order
    // with NULLS FIRST explicitly (DuckDB defaults to NULLS LAST).
    Q("a8_rollup",
      (s, d) => Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("cnt"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus")),
      Some("SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty, CAST(count(*) AS BIGINT) AS cnt FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST")),

    // ANSI null-handling scalars: NULLIF / COALESCE round trip.
    Q("c18_null_funcs",
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"),
          coalesce(nullif(col("o_orderpriority"), lit("1-URGENT")), lit("URGENT!"))
            .as("prio"))
        .orderBy("o_orderkey"),
      Some("SELECT o_orderkey, coalesce(nullif(o_orderpriority, '1-URGENT'), 'URGENT!') AS prio FROM orders ORDER BY o_orderkey")),

    // Date-part extraction + grouped counts. Spark dayofweek is 1-based
    // Sunday=1; DuckDB dow is 0-based Sunday=0 — normalized to DuckDB's.
    Q("c19_date_parts",
      (s, d) => Tables.orders(s, d)
        .groupBy(
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"),
          (dayofweek(col("o_orderdate")) - 1).cast("long").as("dow"))
        .agg(count(lit(1)).as("n"))
        .orderBy("y", "m", "dow"),
      Some("SELECT CAST(year(o_orderdate) AS BIGINT) AS y, CAST(month(o_orderdate) AS BIGINT) AS m, CAST(dayofweek(o_orderdate) AS BIGINT) AS dow, CAST(count(*) AS BIGINT) AS n FROM orders GROUP BY 1, 2, 3 ORDER BY 1, 2, 3")),

    // CUBE: all grouping combinations in one pass (rollup's superset);
    // NULL group keys ordered NULLS FIRST on both engines.
    Q("a12_cube",
      (s, d) => Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("cnt"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus")),
      Some("SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty, CAST(count(*) AS BIGINT) AS cnt FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus) ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST")),

    // Running total per group (cumulative window frame) — exact integer
    // cents, ROWS UNBOUNDED PRECEDING on a total order.
    Q("a13_running_sum",
      (s, d) => Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          sum(cents(col("o_totalprice")))
            .over(Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
              .rowsBetween(Window.unboundedPreceding, 0))
            .as("run_cents"))
        .orderBy("o_custkey", "o_orderkey"),
      Some("SELECT o_custkey, o_orderkey, CAST(SUM(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) OVER (PARTITION BY o_custkey ORDER BY o_orderkey ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_cents FROM orders ORDER BY o_custkey, o_orderkey")),

    // lag(): seconds since the user's previous event (NULL for the
    // first) — the inter-arrival-time building block.
    Q("a14_lag_delta",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
            (unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)))
              .as("delta_s"))
          .orderBy("user_id", "event_id")
      },
      Some("SELECT user_id, event_id, date_diff('second', lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) AS delta_s FROM events ORDER BY user_id, event_id")),

    // Grouped string aggregation (listagg): deterministic via DISTINCT +
    // explicit intra-group ORDER BY on both engines.
    Q("a19_string_agg",
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(array_join(sort_array(collect_set(col("l_linestatus"))), ",").as("statuses"))
        .orderBy("l_returnflag"),
      Some("SELECT l_returnflag, string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")),

    // Correlated EXISTS through the SQL front end — the Spark query IS
    // the oracle string (same ANSI text both engines), exercising
    // Catalyst's subquery decorrelation into a semi-join.
    Q("s7_sql_exists",
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("customer")
        Tables.orders(s, d).createOrReplaceTempView("orders")
        s.sql(SqlExists)
      },
      Some(SqlExists)),

    // RANGE window frame: peers-by-value, not rows — count of same-
    // customer orders within $1000 below the current price (frame
    // membership by value comparison: deterministic under ties, unlike a
    // ROWS frame on a non-total order).
    Q("a17_range_frame",
      (s, d) => Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          count(lit(1)).over(
            Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice"))
              .rangeBetween(-1000L, 0L))
            .as("n_close"))
        .orderBy("o_custkey", "o_orderkey"),
      Some("SELECT o_custkey, o_orderkey, CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_close FROM orders ORDER BY o_custkey, o_orderkey")),

    // first_value over a total per-group order — the "anchor row"
    // analytic (each event tagged with its user's first event).
    Q("a18_first_value",
      (s, d) => Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          first_value(col("event_id")).over(
            Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id")))
            .as("first_ev"))
        .orderBy("user_id", "event_id"),
      Some("SELECT user_id, event_id, first_value(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS first_ev FROM events ORDER BY user_id, event_id")),

    // ntile(): quartile assignment per nation — partitioned window (a
    // global ntile would single-task the table; per-key quartiles keep
    // the window distributed).
    Q("a15_ntile",
      (s, d) => Tables.customer(s, d)
        .select(col("c_custkey"),
          ntile(4).over(Window.partitionBy(col("c_nationkey"))
            .orderBy(col("c_acctbal").desc, col("c_custkey")))
            .cast("long").as("quartile"))
        .orderBy("c_custkey"),
      Some("SELECT c_custkey, CAST(ntile(4) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS quartile FROM customer ORDER BY c_custkey")),

    // Custom typed Aggregator: exact per-group top-k with O(k) state
    // (functions.TopK — the streaming-safe alternative to
    // collect_list+sort). Oracle is the semantic window-rank twin.
    Q("a16_topk_aggregator",
      (s, d) => {
        import s.implicits._
        import graft.functions.{Scored, TopK}
        Tables.events(s, d)
          .select(col("event_type"), col("value"), col("event_id"))
          .as[(String, Double, Long)]
          .groupByKey(_._1)
          .mapValues(t => Scored(t._2, t._3))
          .agg(TopK(3).toColumn.name("top"))
          .flatMap { case (et, top) => top.map(sc => (et, sc.id, sc.score)) }
          .toDF("event_type", "event_id", "value")
          .orderBy("event_type", "event_id")
      },
      Some("SELECT event_type, event_id, value FROM (SELECT event_type, event_id, value, row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rn FROM events) WHERE rn <= 3 ORDER BY event_type, event_id")),

    // Set ops beyond UNION: INTERSECT and EXCEPT (distinct semantics).
    Q("u2_intersect",
      (s, d) => {
        val docs = Tables.documents(s, d)
        docs.filter(col("text").rlike("(?i)spark")).select("doc_id")
          .intersect(docs.filter(col("lang") === "en").select("doc_id"))
          .orderBy("doc_id")
      },
      Some("SELECT doc_id FROM documents WHERE regexp_matches(text, '(?i)spark') INTERSECT SELECT doc_id FROM documents WHERE lang = 'en' ORDER BY doc_id")),
    Q("u3_except",
      (s, d) => {
        val docs = Tables.documents(s, d)
        docs.filter(col("text").rlike("(?i)spark")).select("doc_id")
          .except(docs.filter(col("lang") === "en").select("doc_id"))
          .orderBy("doc_id")
      },
      Some("SELECT doc_id FROM documents WHERE regexp_matches(text, '(?i)spark') EXCEPT SELECT doc_id FROM documents WHERE lang = 'en' ORDER BY doc_id")),

    // Wide-table reshaping: pivot event counts per user. Oracle twin uses
    // conditional aggregation (semantically identical); Spark's pivot
    // yields null for empty cells → na.fill(0) to match COUNT FILTER's 0.
    Q("a9_pivot",
      (s, d) => Tables.events(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("view", "click", "error", "purchase"))
        .count()
        .na.fill(0L)
        .orderBy("user_id"),
      Some("SELECT user_id, CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view, CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click, CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error, CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase FROM events GROUP BY user_id ORDER BY user_id")),

    // Exact interpolated percentiles (type-7 / linear): Spark percentile ≡
    // DuckDB quantile_cont; l_quantity is integer-valued so interpolation
    // arithmetic is deterministic cross-engine.
    Q("a10_percentiles",
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, 0.5)").as("med"),
          expr("percentile(l_quantity, 0.9)").as("p90"))
        .orderBy("l_returnflag"),
      Some("SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS med, quantile_cont(l_quantity, 0.9) AS p90 FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")),

    // §2.7: UNION ALL of keyword-results and token-results (app.py:141-144;
    // duplicates kept, as in the reference).
    Q("u1_union_all",
      (s, d) => {
        val docs = Tables.documents(s, d)
        docs.filter(col("text").rlike("(?i)vector")).select("doc_id")
          .unionByName(
            docs.filter(arrays_overlap(split(col("text"), " "),
              array(lit("stream"), lit("merge")))).select("doc_id"))
          .orderBy("doc_id")
      },
      Some("SELECT doc_id FROM (SELECT doc_id FROM documents WHERE regexp_matches(text, '(?i)vector') UNION ALL SELECT doc_id FROM documents WHERE list_has_any(string_split(text, ' '), ['stream','merge'])) ORDER BY doc_id")))

  // --------------------------------------------------------------------
  // Scalar functions (SURVEY §2.8)
  // --------------------------------------------------------------------

  private val scalars = Seq(
    // C1/C2/C4: timestamp parse/format round trips.
    Q("c1_date_format",
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "MM/dd/yyyy HH:mm").as("disp"))
        .orderBy("o_orderkey"),
      Some("SELECT o_orderkey, strftime(o_orderdate, '%m/%d/%Y %H:%M') AS disp FROM orders ORDER BY o_orderkey")),

    // C11: int↔string id casts.
    Q("c11_cast_str",
      (s, d) => Tables.events(s, d)
        .select(col("event_id"), col("user_id").cast("string").as("uid_str"))
        .orderBy("event_id"),
      Some("SELECT event_id, CAST(user_id AS VARCHAR) AS uid_str FROM events ORDER BY event_id")),

    // C13: string build/slice functions (display-string layer, app.py:165+).
    Q("c13_string_funcs",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          upper(substring(col("text"), 1, 10)).as("head10"),
          expr("replace(substr(text, 1, 20), ' ', '_')").as("packed"),
          concat(col("lang"), lit(":"), col("n_chars").cast("string")).as("tag"))
        .orderBy("doc_id"),
      Some("SELECT doc_id, upper(substr(text, 1, 10)) AS head10, replace(substr(text, 1, 20), ' ', '_') AS packed, lang || ':' || CAST(n_chars AS VARCHAR) AS tag FROM documents ORDER BY doc_id")),

    // C16: array functions — sort/distinct/slice/join over token arrays
    // (1-based slice on both engines).
    Q("c16_array_funcs",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          concat_ws("|", slice(array_sort(array_distinct(
            split(lower(col("text")), " "))), 1, 5)).as("first5"))
        .orderBy("doc_id"),
      Some("SELECT doc_id, array_to_string(list_sort(list_distinct(string_split(lower(text), ' ')))[1:5], '|') AS first5 FROM documents ORDER BY doc_id")),

    // C12: page-count arithmetic (math.ceil(len/10), app.py:146).
    Q("c12_ceil_pages",
      (s, d) => Tables.documents(s, d)
        .agg(ceil(count(lit(1)) / lit(10.0)).as("pages")),
      Some("SELECT CAST(ceil(count(*) / 10.0) AS BIGINT) AS pages FROM documents")))

  // --------------------------------------------------------------------
  // Keyword analytics + text pipeline (SURVEY §2.4 A1/A2, §2.8 C5-C8;
  // beyond-reference text analysis)
  // --------------------------------------------------------------------

  private val textual = Seq(
    // A1+A2+C5+C7+C8: tokenize → alnum filter → stopword drop → global
    // word-frequency top-k (cache.py:220-240 cache_top_10_keywords).
    Q("a1_word_topk",
      (s, d) => Tables.documents(s, d)
        .select(explode(split(lower(col("text")), " ")).as("word"))
        .filter(col("word").rlike("^[a-z0-9]+$") && !col("word").isin(Text.StopWords: _*))
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word"))
        .limit(20),
      Some(s"SELECT word, cnt FROM (SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents) WHERE regexp_matches(word, '^[a-z0-9]+$$') AND word NOT IN ${Text.StopWordsSql} GROUP BY word) ORDER BY cnt DESC, word LIMIT 20")),

    // Beyond-reference: heuristic language ID (stopword-hit ratio).
    Q("text_langid",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), Text.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id"),
      Some(s"SELECT doc_id, CASE WHEN CAST(len(list_filter(string_split(lower(text), ' '), w -> w IN ${Text.StopWordsSql})) AS BIGINT) * 10 >= CAST(len(string_split(lower(text), ' ')) AS BIGINT) THEN 'en' ELSE 'und' END AS lang_pred FROM documents ORDER BY doc_id")),

    // Beyond-reference: quality scoring — length / stopword / density
    // ratios. Single-division doubles: deterministic.
    Q("text_quality",
      (s, d) => {
        val toks = size(split(lower(col("text")), " ")).cast("long")
        val punct = size(regexp_extract_all(lower(col("text")),
          lit("[^a-z0-9 ]"), lit(0))).cast("long")
        Tables.documents(s, d).select(
          col("doc_id"),
          length(col("text")).cast("long").as("n_chars"),
          toks.as("n_tokens"),
          (Text.stopwordHits(col("text")).cast("double") / toks).as("stopword_ratio"),
          (punct.cast("double") / length(col("text"))).as("punct_ratio"),
          (length(col("text")).cast("double") / toks).as("chars_per_token"))
          .orderBy("doc_id")
      },
      // DuckDB length() = CHARACTERS, matching Spark length(); strlen
      // counts BYTES and would diverge on any non-ASCII document.
      Some(s"SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens, CAST(len(list_filter(string_split(lower(text), ' '), w -> w IN ${Text.StopWordsSql})) AS DOUBLE) / len(string_split(lower(text), ' ')) AS stopword_ratio, CAST(len(regexp_extract_all(lower(text), '[^a-z0-9 ]')) AS DOUBLE) / length(text) AS punct_ratio, CAST(length(text) AS DOUBLE) / len(string_split(lower(text), ' ')) AS chars_per_token FROM documents ORDER BY doc_id")),

    // Beyond-reference: BPE-ish token counting (alpha runs + digit runs).
    Q("text_tokens",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), Text.bpeishTokenCount(col("text")).as("n_bpeish"))
        .orderBy("doc_id"),
      Some("SELECT doc_id, CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+')) AS BIGINT) AS n_bpeish FROM documents ORDER BY doc_id")),

    // Beyond-reference: document fingerprint (md5 of sorted distinct
    // token set — canonical bag-of-words identity).
    Q("text_fingerprint",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), Text.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id"),
      Some("SELECT doc_id, md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ')) AS fp FROM documents ORDER BY doc_id")),

    // Composite quality gate: the keep/drop decision with the FIRST
    // failing rule as the reason (Gopher-style rule stack). All signals
    // are exact integers or single divisions of identical ints, so even
    // exact-boundary comparisons agree cross-engine.
    Q("text_quality_gate",
      (s, d) => {
        val toks = size(split(lower(col("text")), " ")).cast("long")
        val punct = size(regexp_extract_all(lower(col("text")),
          lit("[^a-z0-9 ]"), lit(0))).cast("long")
        val swRatio = Text.stopwordHits(col("text")).cast("double") / toks
        val cpt = length(col("text")).cast("double") / toks
        val reason =
          when(toks < 5, "too_short")
            .when(toks > 1000, "too_long")
            .when(swRatio < 0.05, "low_stopword")
            .when(punct.cast("double") / length(col("text")) > 0.3, "punct_heavy")
            .when(cpt > 12.0, "long_tokens")
            .otherwise("keep")
        Tables.documents(s, d)
          .select(col("doc_id"), (reason === "keep").as("keep"), reason.as("reason"))
          .orderBy("doc_id")
      },
      Some(s"SELECT doc_id, reason = 'keep' AS keep, reason FROM (SELECT doc_id, CASE " +
        "WHEN len(string_split(lower(text), ' ')) < 5 THEN 'too_short' " +
        "WHEN len(string_split(lower(text), ' ')) > 1000 THEN 'too_long' " +
        s"WHEN CAST(len(list_filter(string_split(lower(text), ' '), w -> w IN ${Text.StopWordsSql})) AS DOUBLE) / len(string_split(lower(text), ' ')) < 0.05 THEN 'low_stopword' " +
        "WHEN CAST(len(regexp_extract_all(lower(text), '[^a-z0-9 ]')) AS DOUBLE) / length(text) > 0.3 THEN 'punct_heavy' " +
        "WHEN CAST(length(text) AS DOUBLE) / len(string_split(lower(text), ' ')) > 12.0 THEN 'long_tokens' " +
        "ELSE 'keep' END AS reason FROM documents) ORDER BY doc_id")),

    // PII/URL scrubbing: mask URLs then long digit runs — the redaction
    // pass before training.
    Q("text_scrub",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), Text.scrub(col("text")).as("scrubbed"))
        .orderBy("doc_id"),
      Some("SELECT doc_id, regexp_replace(regexp_replace(text, 'https?://[^ ]+', '<URL>', 'g'), '[0-9]{4,}', '<NUM>', 'g') AS scrubbed FROM documents ORDER BY doc_id")),

    // Repeated-bigram ratio (Gopher-style repetition filter signal):
    // 1 − distinct/total bigrams via the codegen-safe shingle rows (a
    // per-row HOF over split() would fall into the CollapseProject
    // interpreted-lambda trap). Exact integer counts, one division.
    Q("text_rep_ngram",
      (s, d) => graft.operators.Dedup
        .shingleRows(Tables.documents(s, d), "doc_id", "text")
        .groupBy("doc_id")
        .agg((lit(1.0) - countDistinct(col("sh")).cast("double") / count(lit(1)))
          .as("rep_ratio"))
        .orderBy("doc_id"),
      Some("SELECT doc_id, 1.0 - CAST(count(DISTINCT sh) AS DOUBLE) / count(*) AS rep_ratio FROM (SELECT doc_id, unnest([ws[i] || ' ' || ws[i+1] for i in generate_series(1, len(ws)-1)]) AS sh FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents) WHERE len(ws) >= 2) GROUP BY doc_id ORDER BY doc_id")),

    // Context-window chunking: 50-token windows, stride 40 (10-token
    // overlap) — map-side posexplode+slice, no shuffle.
    Q("text_chunks",
      (s, d) => graft.operators.Chunk
        .chunkTokens(Tables.documents(s, d), "doc_id", "text", size = 50, stride = 40)
        .orderBy("doc_id", "chunk_id"),
      Some("SELECT doc_id, CAST(i AS BIGINT) AS chunk_id, array_to_string(ws[i*40+1 : i*40+50], ' ') AS chunk FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), LATERAL unnest(generate_series(0, CAST(floor((len(ws)-1)/40) AS BIGINT))) AS t(i) ORDER BY doc_id, chunk_id")),

    // Vocabulary construction: contiguous token ids by frequency rank.
    // Two-phase like w1: TakeOrderedAndProject bounds the top-200 BEFORE
    // the id-assigning window ranks ≤200 rows (never the whole vocab).
    Q("text_vocab",
      (s, d) => {
        val counts = Tables.documents(s, d)
          .select(explode(split(lower(col("text")), " ")).as("word"))
          .groupBy("word").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("word"))
          .limit(200)
        counts
          .select(col("word"), col("cnt"),
            row_number().over(Window.orderBy(col("cnt").desc, col("word")))
              .cast("long").as("token_id"))
          .orderBy("token_id")
      },
      Some("SELECT word, cnt, rn AS token_id FROM (SELECT word, CAST(count(*) AS BIGINT) AS cnt, row_number() OVER (ORDER BY count(*) DESC, word) AS rn FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents) GROUP BY word) WHERE rn <= 200 ORDER BY token_id")),

    // Document frequency (how many docs contain each word — the IDF
    // numerator, distinct from text_vocab's collection frequency).
    Q("text_df",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("word"))
        .distinct()
        .groupBy("word").agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("word"))
        .limit(100),
      Some("SELECT word, df FROM (SELECT word, CAST(count(*) AS BIGINT) AS df FROM (SELECT DISTINCT doc_id, unnest(string_split(lower(text), ' ')) AS word FROM documents) GROUP BY word) ORDER BY df DESC, word LIMIT 100")),

    // Skip-gram co-occurrence (window ±2): pairs come from lead() over
    // (doc, pos) — one shuffle, NO position self-join. Pairs normalized
    // (least, greatest) so (a,b) and (b,a) accumulate together.
    Q("text_cooccur",
      (s, d) => {
        val byDoc = Window.partitionBy("doc_id").orderBy("pos")
        val tok = Tables.documents(s, d)
          .select(col("doc_id"),
            posexplode(split(lower(col("text")), " ")).as(Seq("pos", "w")))
          .withColumn("w1", lead("w", 1).over(byDoc))
          .withColumn("w2", lead("w", 2).over(byDoc))
        tok.select(col("w").as("a"), col("w1").as("b"))
          .unionByName(tok.select(col("w").as("a"), col("w2").as("b")))
          .filter(col("b").isNotNull && col("a") =!= col("b"))
          .select(least(col("a"), col("b")).as("wa"), greatest(col("a"), col("b")).as("wb"))
          .groupBy("wa", "wb").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("wa"), col("wb"))
          .limit(100)
      },
      Some("SELECT wa, wb, cnt FROM (SELECT least(a, b) AS wa, greatest(a, b) AS wb, CAST(count(*) AS BIGINT) AS cnt FROM (SELECT ws[i] AS a, ws[i+k] AS b FROM (SELECT string_split(lower(text), ' ') AS ws FROM documents), LATERAL unnest(generate_series(1, len(ws))) AS t(i), LATERAL unnest([1, 2]) AS g(k) WHERE i + k <= len(ws)) WHERE a <> b GROUP BY 1, 2) ORDER BY cnt DESC, wa, wb LIMIT 100")),

    // Token-count histogram over the corpus (bucket = floor(tokens/10)) —
    // the length-distribution diagnostic a curation pipeline reports.
    Q("text_len_histogram",
      (s, d) => Tables.documents(s, d)
        .groupBy(floor(size(split(col("text"), " ")) / lit(10)).as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy("bucket"),
      Some("SELECT CAST(floor(len(string_split(text, ' ')) / 10) AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1 ORDER BY 1")),

    // posexplode: token stream with positions (the lateral-view /
    // flatten-with-ordinality shape).
    Q("c17_explode_pos",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("w"))
        .orderBy("doc_id", "pos"),
      Some("SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, ws[i] AS w FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), LATERAL unnest(generate_series(1, len(ws))) AS t(i) ORDER BY doc_id, pos")),

    // Beyond-reference: multimodal plumbing — opaque payload treated as
    // bytes + typed metadata derived without decoding.
    Q("mm_binary_meta",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          octet_length(col("text")).cast("long").as("n_bytes"),
          (octet_length(col("text")).cast("long") % 640).as("fake_width"))
        .orderBy("doc_id"),
      Some("SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes, CAST(strlen(text) AS BIGINT) % 640 AS fake_width FROM documents ORDER BY doc_id")),

    // REAL pixel decode: synthesize a deterministic 24-bit BMP per doc
    // (pixel (x,y) of doc i: r=(i+7x+13y)%256 g=(2i+11x+3y)%256
    // b=(3i+5x+17y)%256; odd ids stored top-down, even bottom-up),
    // round-trip it through the library-free encoder+decoder, and
    // aggregate the DECODED pixels: channel sums, a position-weighted
    // luminance sum (catches row-order/orientation bugs that plain sums
    // can't), and an 8-bin luminance histogram. The oracle computes the
    // same integers from the closed-form pixel function — it never sees a
    // BMP byte, so a hash match proves the decoder inverts the format.
    Q("mm_pixel_stats",
      (s, d) => graft.multimodal.Multimodal
        .syntheticBmpStats(
          Tables.documents(s, d).filter(col("doc_id") < 100).select("doc_id"),
          "doc_id")
        .orderBy("doc_id"),
      Some("WITH d AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents WHERE doc_id < 100), " +
        "px AS (SELECT doc_id, w, h, x, y FROM d, LATERAL unnest(generate_series(0, w - 1)) AS tx(x), LATERAL unnest(generate_series(0, h - 1)) AS ty(y)), " +
        "c AS (SELECT doc_id, w, h, x, y, (doc_id + 7*x + 13*y) % 256 AS r, (2*doc_id + 11*x + 3*y) % 256 AS g, (3*doc_id + 5*x + 17*y) % 256 AS b FROM px), " +
        "l AS (SELECT *, (r*299 + g*587 + b*114) // 1000 AS luma FROM c) " +
        "SELECT doc_id, CAST(any_value(w) AS BIGINT) AS w, CAST(any_value(h) AS BIGINT) AS h, CAST(count(*) AS BIGINT) AS n_px, " +
        "CAST(sum(r) AS BIGINT) AS sum_r, CAST(sum(g) AS BIGINT) AS sum_g, CAST(sum(b) AS BIGINT) AS sum_b, " +
        "CAST(sum((x + w*y) * luma) AS BIGINT) AS wluma, " +
        (0 until 8).map(i =>
          s"CAST(sum(CASE WHEN luma // 32 = $i THEN 1 ELSE 0 END) AS BIGINT) AS lb$i").mkString(", ") +
        " FROM l GROUP BY doc_id ORDER BY doc_id")),

    // REAL audio decode — the WAV twin of mm_pixel_stats: synthesize a
    // deterministic mono PCM16 waveform per doc (sample i of doc k is
    // (31k + 7i² + 13i) mod 65536 − 32768; n = 64 + k%37 samples at
    // 8000 + (k%3)·4000 Hz), round-trip it through the library-free
    // RIFF/WAVE encoder+decoder, and aggregate the DECODED samples:
    // sum, |s| sum, s² sum (the integer RMS proxy), and an 8-bin
    // amplitude histogram. The oracle computes the same integers from
    // the closed-form waveform — it never sees a WAV byte, so a hash
    // match proves the decoder inverts the container exactly (sign,
    // byte order, chunk offsets, fmt fields).
    Q("mm_audio_stats",
      (s, d) => graft.multimodal.Audio
        .syntheticWavStats(
          Tables.documents(s, d).filter(col("doc_id") < 100).select("doc_id"),
          "doc_id")
        .orderBy("doc_id"),
      Some("WITH d AS (SELECT doc_id, 64 + doc_id % 37 AS n, 8000 + (doc_id % 3) * 4000 AS rate FROM documents WHERE doc_id < 100), " +
        "sm AS (SELECT doc_id, rate, (31*doc_id + 7*i*i + 13*i) % 65536 - 32768 AS s FROM d, LATERAL unnest(generate_series(0, n - 1)) AS t(i)) " +
        "SELECT doc_id, CAST(any_value(rate) AS BIGINT) AS rate, CAST(count(*) AS BIGINT) AS n_samples, " +
        "CAST(sum(s) AS BIGINT) AS sum_s, CAST(sum(abs(s)) AS BIGINT) AS sum_abs, CAST(sum(s*s) AS BIGINT) AS sum_sq, " +
        (0 until 8).map(i =>
          s"CAST(sum(CASE WHEN (s + 32768) // 8192 = $i THEN 1 ELSE 0 END) AS BIGINT) AS ab$i").mkString(", ") +
        " FROM sm GROUP BY doc_id ORDER BY doc_id")),

    // REAL compressed-container metadata — the third modality leg: even
    // ids synthesize an MP4 (ISO BMFF box walk; ids % 4 == 0 take the
    // version-1 64-bit duration path past 2^32 ticks), odd ids an
    // Ogg-Opus stream (CRC-verified page walk + OpusHead). Every output
    // value comes from PARSING the encoded bytes; the oracle recomputes
    // them closed-form from the id without seeing a byte, so a hash match
    // proves both walks invert their layouts (box sizes, 16.16 fixed
    // point, version variants, lacing, CRC, granule math).
    Q("mm_container_meta",
      (s, d) => graft.multimodal.Container
        .syntheticContainerStats(
          Tables.documents(s, d).filter(col("doc_id") < 100).select("doc_id"),
          "doc_id")
        .orderBy("doc_id"),
      Some("SELECT doc_id, " +
        "CASE WHEN doc_id % 2 = 0 THEN 'mp4' ELSE 'ogg' END AS container, " +
        "CASE WHEN doc_id % 2 = 0 THEN 'isom' END AS brand, " +
        "CAST(CASE WHEN doc_id % 2 = 0 THEN 600 * (1 + doc_id % 5) ELSE 48000 END AS BIGINT) AS timescale, " +
        "CAST(CASE WHEN doc_id % 2 = 0 THEN (CASE WHEN doc_id % 4 = 0 THEN 4294967296 + 977 * doc_id ELSE 10000 + 977 * doc_id END) ELSE 960 * (50 + doc_id % 300) END AS BIGINT) AS duration_units, " +
        "CAST(CASE WHEN doc_id % 2 = 0 THEN (CASE WHEN doc_id % 4 = 0 THEN 4294967296 + 977 * doc_id ELSE 10000 + 977 * doc_id END) * 1000 // (600 * (1 + doc_id % 5)) ELSE (960 * (50 + doc_id % 300)) * 1000 // 48000 END AS BIGINT) AS duration_ms, " +
        "CAST(CASE WHEN doc_id % 2 = 0 THEN 16 * (4 + doc_id % 9) END AS BIGINT) AS width, " +
        "CAST(CASE WHEN doc_id % 2 = 0 THEN 16 * (3 + doc_id % 5) END AS BIGINT) AS height, " +
        "CAST(CASE WHEN doc_id % 2 = 1 THEN (CASE WHEN doc_id % 4 = 1 THEN 1 ELSE 2 END) END AS BIGINT) AS channels, " +
        "CAST(CASE WHEN doc_id % 2 = 1 THEN 312 + doc_id % 100 END AS BIGINT) AS preskip, " +
        "CAST(CASE WHEN doc_id % 2 = 1 THEN 8000 * (1 + doc_id % 6) END AS BIGINT) AS sample_rate, " +
        "CAST(CASE WHEN doc_id % 2 = 0 THEN 4 ELSE 3 + doc_id % 4 END AS BIGINT) AS n_parts " +
        "FROM documents WHERE doc_id < 100 ORDER BY doc_id")))

  // --------------------------------------------------------------------
  // Dedup family (beyond-reference north star)
  // --------------------------------------------------------------------

  private val dedup = Seq(
    // Exact dedup via content hash + group count.
    Q("dedup_exact",
      (s, d) => Tables.documents(s, d)
        .groupBy(md5(col("text")).as("h"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("h"),
      Some("SELECT md5(text) AS h, CAST(count(*) AS BIGINT) AS cnt FROM documents GROUP BY md5(text) ORDER BY h")),

    // MinHash signatures over word-bigram shingles (4 portable md5 hashes).
    Q("dedup_minhash",
      (s, d) => graft.operators.Dedup
        .minhashSignatures(Tables.documents(s, d), "doc_id", "text", 4)
        .orderBy("doc_id"),
      Some(minhashSql + " ORDER BY doc_id")),

    // LSH banding: candidate pairs sharing band (h0,h1) OR band (h2,h3).
    // The signature table is materialized before the self-joins — inlined
    // signature expressions would be re-evaluated inside the join
    // (measured 100×: 102s → <1s at sf0.001).
    Q("dedup_lsh_pairs",
      (s, d) => graft.operators.Dedup
        .lshCandidatePairs(Tables.documents(s, d), "doc_id", "text", 4, 2)
        .orderBy("id_a", "id_b"),
      Some(s"WITH sig AS ($minhashSql) SELECT id_a, id_b FROM (SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM sig a JOIN sig b ON a.h0 = b.h0 AND a.h1 = b.h1 AND a.doc_id < b.doc_id UNION SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM sig a JOIN sig b ON a.h2 = b.h2 AND a.h3 = b.h3 AND a.doc_id < b.doc_id) ORDER BY id_a, id_b")),

    // Incremental dedup: the new batch (doc_id >= 250) band-joins against
    // the already-ingested index (doc_id < 250) ∪ itself — old-vs-old,
    // the quadrant a 100 TB history makes quadratically unaffordable,
    // never joins (locked in DedupSpec/PlanSpec). Band collision is a
    // function of the two signatures alone, so the oracle is closed-form:
    // the FULL corpus pair set minus its old-old pairs, with
    // is_cross ⇔ id_a on the old side (id_a < id_b and ≥1 side new force
    // exactly that) — a hash match proves the incremental run loses
    // nothing vs the global one.
    Q("dedup_incremental",
      (s, d) => {
        val docs = Tables.documents(s, d)
        def sig(pred: Column) = graft.operators.Dedup
          .minhashSignatures(docs.filter(pred), "doc_id", "text", 4)
          .localCheckpoint()
        graft.operators.Dedup.incrementalLshPairs(
          sig(col("doc_id") >= 250), sig(col("doc_id") < 250), "doc_id", 4, 2)
          .orderBy("id_a", "id_b")
      },
      Some(s"WITH sig AS ($minhashSql), full_pairs AS ($lshPairsSql) " +
        "SELECT id_a, id_b, (id_a < 250) AS is_cross FROM full_pairs " +
        "WHERE NOT (id_a < 250 AND id_b < 250) ORDER BY id_a, id_b")),

    // N-gram (bigram-shingle) Jaccard similarity for same-source pairs.
    // jaccard = shared / (na + nb - shared): single double division of exact
    // integers — deterministic cross-engine.
    Q("dedup_ngram_jaccard",
      (s, d) => graft.operators.Dedup
        .ngramJaccard(Tables.documents(s, d), "doc_id", "text", "source")
        .orderBy("id_a", "id_b"),
      Some("WITH t AS (SELECT doc_id, source, string_split(lower(text), ' ') AS ws FROM documents), w AS (SELECT DISTINCT doc_id, source, unnest([ws[i] || ' ' || ws[i+1] for i in generate_series(1, len(ws)-1)]) AS sh FROM t), n AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nd FROM w GROUP BY doc_id), p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS shared FROM w a JOIN w b ON a.sh = b.sh AND a.source = b.source AND a.doc_id < b.doc_id GROUP BY a.doc_id, b.doc_id) SELECT id_a, id_b, CAST(shared AS DOUBLE) / (na.nd + nb.nd - shared) AS jaccard FROM p JOIN n na ON na.doc_id = id_a JOIN n nb ON nb.doc_id = id_b ORDER BY id_a, id_b")))

  /** SimHash fingerprints + segment-blocked near-dup pairs. md5-derived
    * bits (high bit of hex digit b+1) make both DuckDB-expressible; the
    * oracle's pair check is the semantic all-pairs form, so a hash-match
    * also proves the pigeonhole blocking loses no pair.
    */
  private val simhashQs = Seq(
    Q("dedup_simhash",
      (s, d) => graft.operators.Dedup
        .simhash(Tables.documents(s, d), "doc_id", "text", 16)
        .orderBy("doc_id"),
      Some(s"${simhashSql(16)} ORDER BY doc_id")),
    // 24 bits / radius 1: the synthetic docs share a small vocabulary, so
    // fingerprints cluster — wider fingerprints + tight radius keep the
    // pair set near-dup-sized (279k at sf0.1) instead of degenerate
    // (3.5M at 16 bits / radius 3).
    Q("dedup_simhash_pairs",
      (s, d) => graft.operators.Dedup
        .simhashPairs(Tables.documents(s, d), "doc_id", "text", maxHamming = 1, bits = 24)
        .orderBy("id_a", "id_b"),
      Some(s"WITH sig AS (${simhashSql(24)}) SELECT id_a, id_b, hamming FROM (SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming FROM sig a JOIN sig b ON a.doc_id < b.doc_id) WHERE hamming <= 1 ORDER BY id_a, id_b")))

  /** LSH projection against md5-parity hyperplane `p`
    * ([[graft.functions.Vectors.planeSign]]) — ±1 components, so the
    * sequential list_sum is the exact twin of the codegen DotProduct
    * fold. Min |projection| measured 4.9e-5 at sf0.01 — five orders
    * above FP noise; the sign (and thus the bucket) cannot flip.
    */
  private def lshProjSql(p: Int): String =
    s"list_sum([CAST(embedding[i+1] AS DOUBLE) * (CASE WHEN substr(md5('plane${p}_' || i), 1, 1) < '8' THEN 1.0 ELSE -1.0 END) for i in generate_series(0, len(embedding)-1)])"

  /** Full DuckDB twin of [[graft.operators.Similarity.topKLsh]] with
    * planes=2, probeHamming=1, query vec_id 0: bucket the corpus by the
    * two sign bits, probe the query's bucket plus its two 1-bit
    * neighbors (xor masks 0,1,2), rank candidates by exact cosine.
    */
  private lazy val lshAnnSql: String =
    s"WITH b AS (SELECT vec_id, embedding, ((CASE WHEN ${lshProjSql(0)} >= 0 THEN 1 ELSE 0 END) + (CASE WHEN ${lshProjSql(1)} >= 0 THEN 2 ELSE 0 END)) AS bucket FROM embeddings), " +
      "q AS (SELECT embedding AS qe, bucket AS qb FROM b WHERE vec_id = 0), " +
      "pr AS (SELECT xor(qb, m) AS pb, qe FROM q, unnest([0, 1, 2]) AS t(m)), " +
      "cand AS (SELECT b.vec_id, b.embedding, pr.qe FROM b JOIN pr ON b.bucket = pr.pb WHERE b.vec_id <> 0), " +
      "u AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x, CAST(unnest(qe) AS DOUBLE) AS y FROM cand), " +
      "dd AS (SELECT vec_id, SUM(x*y) AS dot, SUM(x*x) AS nx FROM u GROUP BY vec_id) " +
      "SELECT vec_id FROM dd ORDER BY dot / sqrt(nx) DESC, vec_id LIMIT 10"

  /** Full DuckDB twin of [[graft.operators.Ivf]] train(k=8, iters=2) +
    * search(nprobe=2, k=10, query vec_id 0): two unrolled Lloyd rounds.
    * Every cross-engine-sensitive number is exact — the centroid update
    * sums 2^24-scaled fixed-point longs (order-independent), the
    * centroid component is one division of two exact integers, and all
    * dot products are sequential list_sum folds matching the codegen
    * DotProduct's left-to-right loop.
    */
  private lazy val ivfAnnSql: String = {
    val dim = 64
    def dotL(a: String, b: String): String =
      s"list_sum([$a[i+1] * $b[i+1] for i in generate_series(0, ${dim - 1})])"
    // twin of Ivf.negSqDist: ((dot*2) - |v|²) - |c|²
    def negSqDist(v: String, c: String): String =
      s"((2 * ${dotL(v, c)} - ${dotL(v, v)}) - ${dotL(c, c)})"
    // twin of Ivf.assign: argmax by (score, cid) — array_max over structs
    // breaks score ties toward the LARGER centroid index
    def assignCte(name: String, cents: String): String =
      s"$name AS (SELECT vec_id, v, cid FROM (SELECT e.vec_id, e.v, c.cid, " +
        s"row_number() OVER (PARTITION BY e.vec_id ORDER BY ${negSqDist("e.v", "c.c")} DESC, c.cid DESC) AS rn " +
        s"FROM e CROSS JOIN $cents c) WHERE rn = 1)"
    // twin of the fixed-point update in Ivf.train; empty cells keep the
    // previous centroid (the coalesce)
    def updateCte(name: String, asg: String, prev: String): String =
      s"$name AS (SELECT $prev.cid, coalesce(nc.c, $prev.c) AS c FROM $prev LEFT JOIN " +
        s"(SELECT cid, list(m ORDER BY pos) AS c FROM " +
        s"(SELECT cid, i AS pos, CAST(SUM(CAST(floor(v[i+1] * 16777216.0 + 0.5) AS BIGINT)) AS DOUBLE) / CAST(count(*) * 16777216 AS DOUBLE) AS m " +
        s"FROM $asg, LATERAL unnest(generate_series(0, ${dim - 1})) AS t(i) GROUP BY cid, i) GROUP BY cid) nc USING (cid))"
    // twin of Ivf.queryAndProbes: -((|q|² - 2·c·q) + |c|²), ties toward
    // the SMALLER cid (Scala's stable sortBy keeps ascending-cid order)
    val probeScore = s"-((${dotL("q.qv", "q.qv")} - 2 * ${dotL("c.c", "q.qv")}) + ${dotL("c.c", "c.c")})"
    "WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v FROM embeddings), " +
      "c0 AS (SELECT vec_id AS cid, v AS c FROM e WHERE vec_id < 8), " +
      assignCte("asg1", "c0") + ", " + updateCte("c1", "asg1", "c0") + ", " +
      assignCte("asg2", "c1") + ", " + updateCte("c2", "asg2", "c1") + ", " +
      assignCte("asg3", "c2") + ", " +
      "q AS (SELECT v AS qv FROM e WHERE vec_id = 0), " +
      s"pr AS (SELECT cid FROM (SELECT c.cid, $probeScore AS s FROM c2 c, q) ORDER BY s DESC, cid LIMIT 2), " +
      "fin AS (SELECT a.vec_id, a.v FROM asg3 a JOIN pr ON a.cid = pr.cid WHERE a.vec_id <> 0), " +
      s"ds AS (SELECT f.vec_id, ${dotL("f.v", "q.qv")} AS dot, ${dotL("f.v", "f.v")} AS nx FROM fin f, q) " +
      "SELECT vec_id FROM ds ORDER BY dot / sqrt(nx) DESC, vec_id LIMIT 10"
  }

  /** The two bucketed ANN paths, oracled end-to-end (recall vs the exact
    * ground truth is additionally asserted in SimilaritySpec/IvfSpec).
    */
  private val dedupNoOracle = Seq(
    Q("sim_lsh_ann",
      (s, d) => graft.operators.Similarity
        .topKLsh(Tables.embeddings(s, d), "vec_id", "embedding", 0L, 10, planes = 2)
        .select("vec_id"),
      Some(lshAnnSql)),
    Q("sim_ivf_ann",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val centroids = graft.operators.Ivf.train(emb, "vec_id", "embedding", k = 8, iters = 2)
        graft.operators.Ivf.search(emb, "vec_id", "embedding", centroids, 0L, k = 10, nprobe = 2)
          .select("vec_id")
      },
      Some(ivfAnnSql)))

  /** SimHash fingerprint SQL: votes per bit from md5 hex digits, packed
    * into one BIGINT — the exact twin of [[graft.operators.Dedup.simhash]].
    */
  private def simhashSql(bits: Int): String = {
    val votes = (0 until bits).map(b =>
      s"SUM(CASE WHEN substr(h, ${b + 1}, 1) >= '8' THEN 1 ELSE -1 END) AS v$b").mkString(", ")
    val pack = (0 until bits).map(b =>
      s"CASE WHEN v$b >= 0 THEN ${1L << b} ELSE 0 END").mkString(" + ")
    s"SELECT doc_id, CAST($pack AS BIGINT) AS simhash FROM (SELECT doc_id, $votes FROM (SELECT doc_id, md5(w) AS h FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents)) GROUP BY doc_id)"
  }

  /** Shared minhash-signature SQL (DuckDB list comprehension = Spark
    * transform over 1-based element_at — verified aligned).
    */
  private lazy val minhashSql: String =
    "SELECT doc_id, list_aggregate([md5('0' || sh) for sh in shl], 'min') AS h0, " +
      "list_aggregate([md5('1' || sh) for sh in shl], 'min') AS h1, " +
      "list_aggregate([md5('2' || sh) for sh in shl], 'min') AS h2, " +
      "list_aggregate([md5('3' || sh) for sh in shl], 'min') AS h3 " +
      "FROM (SELECT doc_id, [ws[i] || ' ' || ws[i+1] for i in generate_series(1, len(ws)-1)] AS shl " +
      "FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents))"

  // --------------------------------------------------------------------
  // Vector similarity (beyond-reference north star)
  // --------------------------------------------------------------------

  private val vectors = Seq(
    // Embedding-cosine near-dup pairs within a label partition. Threshold
    // 0.3547 sits in an empirically-verified 7.5e-4-wide gap of the
    // same-label pair-cosine distribution at sf0.01 — 1e-12 FP summation
    // noise cannot flip membership.
    Q("dedup_embcos",
      (s, d) => {
        // Native codegen DotProduct on raw float arrays (no per-element
        // cast transform); values identical — elements widen to double
        // inside the loop.
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), col("label"), col("embedding").as("v"))
          .withColumn("nrm", Vectors.norm(col("v")))
        val a = e.select(col("vec_id").as("id_a"), col("label"), col("v").as("va"), col("nrm").as("na"))
        val b = e.select(col("vec_id").as("id_b"), col("label"), col("v").as("vb"), col("nrm").as("nb"))
        a.join(b, Seq("label"))
          .filter(col("id_a") < col("id_b"))
          .filter(Vectors.dot(col("va"), col("vb")) / (col("na") * col("nb")) > 0.3547)
          .select("id_a", "id_b")
          .orderBy("id_a", "id_b")
      },
      Some("WITH p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.embedding AS ea, b.embedding AS eb FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id), u AS (SELECT id_a, id_b, CAST(unnest(ea) AS DOUBLE) AS xa, CAST(unnest(eb) AS DOUBLE) AS xb FROM p), dd AS (SELECT id_a, id_b, SUM(xa*xb) AS dot, SUM(xa*xa) AS na, SUM(xb*xb) AS nb FROM u GROUP BY id_a, id_b) SELECT id_a, id_b FROM dd WHERE dot / (sqrt(na) * sqrt(nb)) > 0.3547 ORDER BY id_a, id_b")),

    // Brute-force cosine top-k ANN baseline (query = vec_id 0). Ranking
    // gaps ≥ 3e-4 at sf0.01 — stable under FP noise.
    Q("sim_topk_bruteforce",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val qv = emb.filter(col("vec_id") === 0)
          .select(col("embedding").as("qv"))
        emb.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(qv))
          .select(col("vec_id"),
            (Vectors.dot(col("embedding"), col("qv"))
              / Vectors.norm(col("embedding"))).as("score"))
          .orderBy(col("score").desc, col("vec_id"))
          .limit(10)
          .select("vec_id")
      },
      Some("WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0), u AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x, CAST(unnest(qe) AS DOUBLE) AS y FROM embeddings, q WHERE vec_id <> 0), dd AS (SELECT vec_id, SUM(x*y) AS dot, SUM(x*x) AS nx FROM u GROUP BY vec_id) SELECT vec_id FROM dd ORDER BY dot / sqrt(nx) DESC, vec_id LIMIT 10")))

  /** Filtered vector search + hybrid retrieval — the two capability
    * classes vector stores name as first-class features.
    */
  private val hybrid = Seq(
    // Filtered ANN: metadata predicate + top-k cosine. The label filter
    // is a scan-level pushed filter (locked in PlanSpec) — at 100 TB on
    // a label-partitioned corpus it becomes partition pruning, so the
    // vector scan only touches the filtered slice.
    Q("sim_filtered_ann",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
        emb.filter(col("label") <= 3 && col("vec_id") =!= 0)
          .crossJoin(broadcast(qv))
          .select(col("vec_id"),
            (Vectors.dot(col("embedding"), col("qv"))
              / Vectors.norm(col("embedding"))).as("score"))
          .orderBy(col("score").desc, col("vec_id"))
          .limit(10).select("vec_id")
      },
      Some("WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0), " +
        "u AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x, CAST(unnest(qe) AS DOUBLE) AS y FROM embeddings, q WHERE vec_id <> 0 AND label <= 3), " +
        "dd AS (SELECT vec_id, SUM(x*y) AS dot, SUM(x*x) AS nx FROM u GROUP BY vec_id) " +
        "SELECT vec_id FROM dd ORDER BY dot / sqrt(nx) DESC, vec_id LIMIT 10")),

    // Hybrid retrieval via reciprocal-rank fusion: fuse the TOP-50
    // candidate lists of a term-frequency text search and a cosine
    // vector search (1/(60+rank) each, the standard RRF constant). The
    // global windows rank ≤50 rows AFTER a distributed top-k — never the
    // corpus (the single-task-window trap); fusing bounded candidate
    // lists is also how hybrid search actually deploys.
    Q("sim_hybrid_rrf",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val emb = Tables.embeddings(s, d)
        val tf = docs.select(col("doc_id"),
            size(filter(split(lower(col("text")), " "), w => w === "spark"))
              .cast("long").as("tf"))
          .filter(col("tf") > 0)
          .orderBy(col("tf").desc, col("doc_id")).limit(50)
        val tRank = tf.select(col("doc_id"),
          row_number().over(Window.orderBy(col("tf").desc, col("doc_id")))
            .cast("long").as("rt"))
        val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
        val vs = emb.filter(col("vec_id") =!= 0).crossJoin(broadcast(qv))
          .select(col("vec_id").as("doc_id"),
            (Vectors.dot(col("embedding"), col("qv"))
              / Vectors.norm(col("embedding"))).as("score"))
          .orderBy(col("score").desc, col("doc_id")).limit(50)
        val vRank = vs.select(col("doc_id"),
          row_number().over(Window.orderBy(col("score").desc, col("doc_id")))
            .cast("long").as("rv"))
        tRank.join(vRank, Seq("doc_id"), "full_outer")
          .select(col("doc_id"),
            (coalesce(lit(1.0) / (lit(60) + col("rt")), lit(0.0)) +
              coalesce(lit(1.0) / (lit(60) + col("rv")), lit(0.0))).as("rrf"))
          .orderBy(col("rrf").desc, col("doc_id"))
          .limit(10).select("doc_id")
      },
      Some("WITH t AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY tf DESC, doc_id) AS BIGINT) AS rt FROM " +
        "(SELECT doc_id, tf FROM (SELECT doc_id, CAST(len(list_filter(string_split(lower(text), ' '), w -> w = 'spark')) AS BIGINT) AS tf FROM documents) WHERE tf > 0 ORDER BY tf DESC, doc_id LIMIT 50)), " +
        "q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0), " +
        "u AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x, CAST(unnest(qe) AS DOUBLE) AS y FROM embeddings, q WHERE vec_id <> 0), " +
        "dd AS (SELECT vec_id, SUM(x*y) AS dot, SUM(x*x) AS nx FROM u GROUP BY vec_id), " +
        "v AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS BIGINT) AS rv FROM " +
        "(SELECT vec_id AS doc_id, dot / sqrt(nx) AS s FROM dd ORDER BY s DESC, vec_id LIMIT 50)) " +
        "SELECT doc_id FROM (SELECT COALESCE(t.doc_id, v.doc_id) AS doc_id, " +
        "COALESCE(CAST(1 AS DOUBLE) / (60 + rt), 0) + COALESCE(CAST(1 AS DOUBLE) / (60 + rv), 0) AS rrf " +
        "FROM t FULL OUTER JOIN v ON t.doc_id = v.doc_id) ORDER BY rrf DESC, doc_id LIMIT 10")))

  /** Batch ANN: top-3 neighbors for each of 5 query vectors in ONE pass —
    * the query set broadcasts, the corpus is scanned once (never the
    * reverse). Ranking gaps verified ≥3e-4 at sf0.01, far above FP noise.
    */
  private val batchAnn = Seq(
    Q("sim_batch_ann",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val qs = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qv"))
        val w = Window.partitionBy(col("qid"))
          .orderBy(col("score").desc, col("vec_id"))
        emb.crossJoin(broadcast(qs))
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"),
            (Vectors.dot(col("embedding"), col("qv"))
              / Vectors.norm(col("embedding"))).as("score"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("qid", "vec_id")
          .orderBy("qid", "vec_id")
      },
      Some("WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5), u AS (SELECT qid, vec_id, CAST(unnest(embedding) AS DOUBLE) AS x, CAST(unnest(qe) AS DOUBLE) AS y FROM embeddings, q WHERE vec_id <> qid), dd AS (SELECT qid, vec_id, SUM(x*y) AS dot, SUM(x*x) AS nx FROM u GROUP BY qid, vec_id), r AS (SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY dot / sqrt(nx) DESC, vec_id) AS rn FROM dd) SELECT qid, vec_id FROM r WHERE rn <= 3 ORDER BY qid, vec_id")))

  // --------------------------------------------------------------------
  // Dedup clustering + sampling + quantization (training-pipeline stages)
  // --------------------------------------------------------------------

  /** LSH band-join pair SQL over [[minhashSql]] signatures (shared by the
    * pair query and the clustering oracle).
    */
  private lazy val lshPairsSql: String =
    "SELECT id_a, id_b FROM (" +
      "SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM sig a JOIN sig b ON a.h0 = b.h0 AND a.h1 = b.h1 AND a.doc_id < b.doc_id " +
      "UNION SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM sig a JOIN sig b ON a.h2 = b.h2 AND a.h3 = b.h3 AND a.doc_id < b.doc_id)"

  /** Hub-capped band-join pair SQL (8 hubs per bucket) — the DuckDB twin
    * of [[graft.operators.Dedup.lshCandidatePairsBounded]]: only the 8
    * smallest ids of a bucket pair with the rest, bounding a hot bucket's
    * edge emission at O(8·b).
    */
  private lazy val lshBoundedPairsSql: String = {
    def band(k1: String, k2: String): String =
      s"SELECT least(h.doc_id, s.doc_id) AS id_a, greatest(h.doc_id, s.doc_id) AS id_b " +
        s"FROM (SELECT doc_id, $k1, $k2, row_number() OVER (PARTITION BY $k1, $k2 ORDER BY doc_id) AS rn FROM sig) h " +
        s"JOIN sig s ON h.$k1 = s.$k1 AND h.$k2 = s.$k2 AND h.rn <= 8 AND h.doc_id <> s.doc_id"
    s"SELECT DISTINCT id_a, id_b FROM (${band("h0", "h1")} UNION ALL ${band("h2", "h3")})"
  }

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
      Some("WITH w AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] AS sh FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents), LATERAL unnest(generate_series(1, len(ws) - 1)) AS t(i)), b AS (SELECT DISTINCT sh FROM w WHERE doc_id < 10) SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared FROM (SELECT doc_id, sh FROM w WHERE doc_id >= 10) c JOIN b USING (sh) GROUP BY doc_id HAVING count(*) >= 3 ORDER BY doc_id")))

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

    // Deterministic shard assignment: per-shard row counts (the training
    // shard-balance report; assignment is engine-portable md5, not
    // Spark-specific murmur hash).
    Q("shard_assign",
      (s, d) => Tables.documents(s, d)
        .groupBy(graft.operators.Shards.shardId(col("doc_id"), 8).as("shard"))
        .agg(count(lit(1)).as("n"))
        .orderBy("shard"),
      Some("SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 8 AS shard, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1 ORDER BY 1")),

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

  // --------------------------------------------------------------------
  // Streaming batch-equivalent (SURVEY §2.9)
  // --------------------------------------------------------------------

  private val streaming = Seq(
    // Tumbling-window event aggregation — the batch twin of the Structured
    // Streaming pipeline in graft.streaming (same plan shape). Window start
    // formatted to string: engines disagree on timestamp tz-awareness.
    Q("stream_window_agg",
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(cents(col("value"))).as("sum_value_cents"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("window_start"),
          col("event_type"), col("cnt"), col("sum_value_cents"))
        .orderBy("window_start", "event_type"),
      Some("SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M') AS window_start, event_type, CAST(count(*) AS BIGINT) AS cnt, CAST(SUM(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents FROM events GROUP BY 1, 2 ORDER BY 1, 2")),

    // END-TO-END CDC sink: the change set (a bounded slice of events)
    // actually flows through Structured Streaming — JSONL feed files,
    // AvailableNow micro-batches (one file each), foreachBatch
    // version-aware MERGE into a parquet snapshot — and the SNAPSHOT is
    // what the oracle checks. The merge keeps the greatest-ts row per
    // key regardless of batch order, so the batch oracle is one window
    // over the change set. Slice is fixed-size (event_id < 1500) to keep
    // the real streaming machinery cheap at any sf.
    Q("stream_upsert_sink",
      (s, d) => graft.streaming.EventStream
        .drainUpsert(s, Tables.events(s, d).filter(col("event_id") < 1500),
          "user_id", nFiles = 3)
        .select(col("user_id"), col("event_id"), col("event_type"),
          cents(col("value")).as("value_cents"))
        .orderBy("user_id"),
      Some("SELECT user_id, event_id, event_type, CAST(floor(value*100 + 0.5) AS BIGINT) AS value_cents " +
        "FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn " +
        "FROM events WHERE event_id < 1500) WHERE rn = 1 ORDER BY user_id")),

    // END-TO-END streaming dedup + parquet append sink: the slice is fed
    // TWICE (simulating at-least-once re-delivery) through
    // dropDuplicatesWithinWatermark state and drained into the parquet
    // sink with AvailableNow; survivors must equal the slice exactly.
    // Covers the two remaining spec-only streaming ops in one drain.
    Q("stream_dedup_drain",
      (s, d) => {
        val slice = Tables.events(s, d).filter(col("event_id") < 1500)
        graft.streaming.EventStream
          .drainDedup(s, slice.unionByName(slice), Seq("event_id"))
          .select(col("event_id"), col("user_id"), col("event_type"),
            cents(col("value")).as("value_cents"))
          .orderBy("event_id")
      },
      Some("SELECT event_id, user_id, event_type, CAST(floor(value*100 + 0.5) AS BIGINT) AS value_cents " +
        "FROM events WHERE event_id < 1500 ORDER BY event_id")),

    // END-TO-END stateful counting: mapGroupsWithState accumulates
    // per-user counts across 3 AvailableNow micro-batches into an
    // update-mode memory sink; the final state must equal the batch
    // groupBy count — cross-batch state correctness, driver-verified.
    Q("stream_running_counts",
      (s, d) => graft.streaming.EventStream
        .drainRunningCounts(s,
          Tables.events(s, d).filter(col("event_id") < 1500), nFiles = 3)
        .orderBy("user_id"),
      Some("SELECT user_id, CAST(count(*) AS BIGINT) AS n_events FROM events " +
        "WHERE event_id < 1500 GROUP BY user_id ORDER BY user_id")),

    // Cohort retention: users grouped by first-seen week; how many are
    // active k weeks later. Pure date/int arithmetic (week truncation is
    // ISO Monday-start in both engines; offsets are integer day
    // differences div 7) — deterministic, and the shape is two grouped
    // aggregations plus one key join, shuffle-bounded at any scale.
    Q("stream_retention",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), date_trunc("week", col("ts")).as("w"))
        val cohort = ev.groupBy("user_id").agg(min(col("w")).as("cw"))
        ev.join(cohort, "user_id")
          .select(col("user_id"), col("cw"),
            expr("datediff(w, cw) div 7").cast("long").as("week_offset"))
          .distinct()
          .groupBy("cw", "week_offset")
          .agg(count(lit(1)).as("n_users"))
          .select(date_format(col("cw"), "yyyy-MM-dd").as("cohort_week"),
            col("week_offset"), col("n_users"))
          .orderBy("cohort_week", "week_offset")
      },
      Some("WITH e AS (SELECT user_id, date_trunc('week', ts) AS w FROM events), " +
        "c AS (SELECT user_id, min(w) AS cw FROM e GROUP BY user_id), " +
        "a AS (SELECT DISTINCT e.user_id, cw, date_diff('day', cw, w) // 7 AS k FROM e JOIN c USING (user_id)) " +
        "SELECT strftime(cw, '%Y-%m-%d') AS cohort_week, CAST(k AS BIGINT) AS week_offset, CAST(count(*) AS BIGINT) AS n_users " +
        "FROM a GROUP BY cw, k ORDER BY 1, 2")),

    // Event funnel: users whose first view precedes their first click
    // precedes their first purchase. Oracle truncates to microseconds to
    // match Spark's parquet timestamp precision before comparing.
    Q("stream_funnel",
      (s, d) => {
        val ev = Tables.events(s, d)
        val firsts = ev.groupBy(col("user_id")).agg(
          min(when(col("event_type") === "view", col("ts"))).as("tv"),
          min(when(col("event_type") === "click", col("ts"))).as("tc"),
          min(when(col("event_type") === "purchase", col("ts"))).as("tp"))
        firsts
          .filter(col("tv") < col("tc") && col("tc") < col("tp"))
          .agg(count(lit(1)).as("n_users"))
      },
      Some("SELECT CAST(count(*) AS BIGINT) AS n_users FROM (SELECT user_id, min(CASE WHEN event_type = 'view' THEN date_trunc('microseconds', ts) END) AS tv, min(CASE WHEN event_type = 'click' THEN date_trunc('microseconds', ts) END) AS tc, min(CASE WHEN event_type = 'purchase' THEN date_trunc('microseconds', ts) END) AS tp FROM events GROUP BY user_id) WHERE tv < tc AND tc < tp")),

    // First-touch per (user, event_type): batch twin of
    // EventStream.firstTouch (streaming: dropDuplicatesWithinWatermark —
    // arrival order = event order in a watermark-correct stream).
    Q("stream_first_touch",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_type"),
            col("event_id").as("first_event_id"))
          .orderBy("user_id", "event_type")
      },
      Some("SELECT user_id, event_type, event_id AS first_event_id FROM (SELECT user_id, event_type, event_id, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn FROM events) WHERE rn = 1 ORDER BY user_id, event_type")),

    // Interval join: views paired with same-user purchases ≤30 min later —
    // batch twin of EventStream.viewToPurchase (stream-stream join whose
    // time bound lets Spark expire buffered state).
    Q("stream_interval_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        // the literal streaming operator on batch inputs (withWatermark
        // is a no-op on batch plans)
        graft.streaming.EventStream.viewToPurchase(
          ev.filter(col("event_type") === "view"),
          ev.filter(col("event_type") === "purchase"), maxGapMinutes = 30)
          .orderBy("view_id", "purchase_id")
      },
      Some("SELECT v.event_id AS view_id, p.event_id AS purchase_id FROM events v JOIN events p ON v.user_id = p.user_id AND v.event_type = 'view' AND p.event_type = 'purchase' AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE ORDER BY view_id, purchase_id")),

    // Gap-based sessionization, batch form: a >30-min silence starts a new
    // session (streaming twin: EventStream.sessionCounts session_window).
    // lag + running-sum-of-flags — second-granularity gap arithmetic is
    // identical cross-engine (both floor to epoch seconds).
    Q("stream_sessionize",
      (s, d) => {
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          .withColumn("prev", lag(col("ts"), 1).over(byUser))
          .withColumn("new_s",
            when(col("prev").isNull ||
              unix_timestamp(col("ts")) - unix_timestamp(col("prev")) > 1800, 1L)
              .otherwise(0L))
          .withColumn("session_id",
            sum(col("new_s")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n_events"))
          .orderBy("user_id", "session_id")
      },
      Some("WITH e AS (SELECT user_id, event_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM events), f AS (SELECT user_id, event_id, ts, CASE WHEN prev IS NULL OR date_diff('second', prev, ts) > 1800 THEN 1 ELSE 0 END AS new_s FROM e), g AS (SELECT user_id, event_id, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id FROM f) SELECT user_id, CAST(session_id AS BIGINT) AS session_id, CAST(count(*) AS BIGINT) AS n_events FROM g GROUP BY user_id, session_id ORDER BY user_id, session_id")))

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

  val all: Seq[Q] =
    scans ++ filters ++ joins ++ aggs ++ scalars ++ textual ++
      dedup ++ simhashQs ++ dedupNoOracle ++ vectors ++ hybrid ++ batchAnn ++ decontam ++ containmentQ ++ spanQs ++ editVerify ++ pipeline ++ streaming ++ training

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
