package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Text, Vectors}

/** Aggregations / windows (SURVEY §2.5-2.6) and scalar/cast conversions
  * (§2.8).
  */
private[queries] object AggScalarQueries {
  import CatalogShared._

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

    // HDR-histogram quantile sketch ([[graft.functions.Hdr]]): per-group
    // p50/p90/p99 lower-bound estimates over exact price cents, subBits=7
    // (≤ 1/128 relative error by construction). Unlike the two bound-gate
    // queries above, the sketch ESTIMATE itself is hash-compared: the
    // bucket index is integer-exact (binary length, shifts, masks — no
    // transcendental log), so DuckDB reproduces every estimate
    // bit-for-bit from the same closed-form bucket math.
    Q("hdr_quantiles",
      (s, d) => {
        import graft.functions.Hdr
        Hdr.quantileEstimates(
          Tables.lineitem(s, d)
            .select(col("l_returnflag"), cents(col("l_extendedprice")).cast("long").as("c")),
          Seq("l_returnflag"), "c", 7,
          Seq((1L, 2L, "p50_lb"), (9L, 10L, "p90_lb"), (99L, 100L, "p99_lb")))
          .orderBy("l_returnflag")
      },
      Some {
        import graft.functions.Hdr
        val bexp = Hdr.bucketSqlDuck("c", 7)
        val lb = Hdr.lowerBoundSqlDuck("b", 7)
        def est(num: Int, den: Int, alias: String) =
          s"CAST(MIN(CASE WHEN cum >= (n * $num + ${den - 1}) // $den THEN $lb END) AS BIGINT) AS $alias"
        "WITH v AS (SELECT l_returnflag, CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) AS c FROM lineitem), " +
          s"bk AS (SELECT l_returnflag, $bexp AS b FROM v), " +
          "cnt AS (SELECT l_returnflag, b, count(*) AS cb FROM bk GROUP BY 1, 2), " +
          "w AS (SELECT l_returnflag, b, SUM(cb) OVER (PARTITION BY l_returnflag ORDER BY b) AS cum, SUM(cb) OVER (PARTITION BY l_returnflag) AS n FROM cnt) " +
          "SELECT l_returnflag, CAST(MAX(n) AS BIGINT) AS n, " +
          est(1, 2, "p50_lb") + ", " + est(9, 10, "p90_lb") + ", " + est(99, 100, "p99_lb") +
          " FROM w GROUP BY l_returnflag ORDER BY l_returnflag"
      }),

    // Percentile-trimmed robust aggregate: drop the tails outside
    // [p01, p99] (refinement-exact bounds — bit-identical to
    // quantile_cont on both engines, so the trim predicate cannot
    // disagree), then exact integer sums over the kept rows. The robust
    // alternative to mean when a feed has fat-tailed junk values.
    Q("a22_trimmed_agg",
      (s, d) => {
        import graft.operators.Percentiles
        val li = Tables.lineitem(s, d)
          .select(col("l_returnflag"), cents(col("l_extendedprice")).cast("long").as("c"))
        val bounds = Percentiles.exactRefined(
          li.select(col("l_returnflag"), col("c").cast("double").as("cd")),
          Seq("l_returnflag"), "cd", Seq(0.01 -> "lo", 0.99 -> "hi"))
        li.join(bounds, "l_returnflag")
          .filter(col("c") >= col("lo") && col("c") <= col("hi"))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n_kept"), sum(col("c")).as("sum_kept_cents"))
          .orderBy("l_returnflag")
      },
      Some("WITH v AS (SELECT l_returnflag, CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) AS c FROM lineitem), " +
        "b AS (SELECT l_returnflag, quantile_cont(CAST(c AS DOUBLE), 0.01) AS lo, quantile_cont(CAST(c AS DOUBLE), 0.99) AS hi FROM v GROUP BY 1) " +
        "SELECT v.l_returnflag, CAST(count(*) AS BIGINT) AS n_kept, CAST(SUM(c) AS BIGINT) AS sum_kept_cents " +
        "FROM v JOIN b ON v.l_returnflag = b.l_returnflag WHERE c >= lo AND c <= hi " +
        "GROUP BY v.l_returnflag ORDER BY v.l_returnflag")),

    // Time-series gap fill ([[graft.operators.Resample]]): regularize the
    // irregular event stream onto a daily spine (sequence + explode —
    // never driver-side) and forward-fill missing days with the last
    // observed daily aggregate. The fill window is bounded by spine
    // length (30 days), not event volume. Exact integer day-cents.
    Q("ts_gapfill",
      (s, d) => {
        import graft.operators.Resample
        Resample.gapFillDaily(
          Tables.events(s, d).filter(col("user_id") < 10),
          "user_id", "ts", cents(col("value")),
          v => sum(v).cast("long"),
          "2024-01-01", "2024-01-30")
          .select(col("user_id"),
            date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("observed"), col("day_agg").as("day_cents"), col("filled"))
          .orderBy("user_id", "day")
      },
      Some("WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day, CAST(floor(value*100 + 0.5) AS BIGINT) AS vc FROM events WHERE user_id < 10 AND CAST(ts AS DATE) <= DATE '2024-01-30'), " +
        "daily AS (SELECT user_id, day, CAST(SUM(vc) AS BIGINT) AS day_cents FROM ev GROUP BY 1, 2), " +
        "iw AS (SELECT * FROM daily WHERE day >= DATE '2024-01-01'), " +
        "sd AS (SELECT user_id, arg_max(day_cents, day) AS seed FROM daily WHERE day < DATE '2024-01-01' GROUP BY 1), " +
        "u AS (SELECT DISTINCT user_id FROM daily), " +
        "spine AS (SELECT user_id, CAST(unnest(generate_series(DATE '2024-01-01', DATE '2024-01-30', INTERVAL 1 DAY)) AS DATE) AS day FROM u), " +
        "j AS (SELECT s.user_id, s.day, d.day_cents FROM spine s LEFT JOIN iw d ON s.user_id = d.user_id AND s.day = d.day), " +
        "f AS (SELECT user_id, day, day_cents, last_value(day_cents IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ff FROM j) " +
        "SELECT f.user_id, strftime(f.day, '%Y-%m-%d') AS day, f.day_cents IS NOT NULL AS observed, f.day_cents, " +
        "COALESCE(f.ff, sd.seed) AS filled " +
        "FROM f LEFT JOIN sd USING (user_id) ORDER BY user_id, day")),

    // Weighted variant of the HDR sketch: buckets accumulate integer
    // WEIGHT (l_quantity) instead of row count, ranks run over total
    // weight — "which price does the median shipped UNIT sit at", not
    // "the median line item". Same integer-exact closed form, so the
    // weighted estimates hash-match DuckDB too.
    Q("hdr_weighted",
      (s, d) => {
        import graft.functions.Hdr
        Hdr.quantileEstimates(
          Tables.lineitem(s, d)
            .select(col("l_returnflag"),
              cents(col("l_extendedprice")).cast("long").as("c"),
              col("l_quantity").cast("long").as("w")),
          Seq("l_returnflag"), "c", 7,
          Seq((1L, 2L, "p50_lb"), (9L, 10L, "p90_lb")), Some("w"))
          .orderBy("l_returnflag")
      },
      Some {
        import graft.functions.Hdr
        val bexp = Hdr.bucketSqlDuck("c", 7)
        val lb = Hdr.lowerBoundSqlDuck("b", 7)
        def est(num: Int, den: Int, alias: String) =
          s"CAST(MIN(CASE WHEN cum >= (n * $num + ${den - 1}) // $den THEN $lb END) AS BIGINT) AS $alias"
        "WITH v AS (SELECT l_returnflag, CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) AS c, CAST(l_quantity AS BIGINT) AS w FROM lineitem), " +
          s"bk AS (SELECT l_returnflag, $bexp AS b, w FROM v), " +
          "cnt AS (SELECT l_returnflag, b, SUM(w) AS cb FROM bk GROUP BY 1, 2), " +
          "w AS (SELECT l_returnflag, b, SUM(cb) OVER (PARTITION BY l_returnflag ORDER BY b) AS cum, SUM(cb) OVER (PARTITION BY l_returnflag) AS n FROM cnt) " +
          "SELECT l_returnflag, CAST(MAX(n) AS BIGINT) AS n, " +
          est(1, 2, "p50_lb") + ", " + est(9, 10, "p90_lb") +
          " FROM w GROUP BY l_returnflag ORDER BY l_returnflag"
      }),

    // KMV distinct-count sketch ([[graft.functions.KmvSketch]]): like
    // hdr_quantiles, the ESTIMATE is the oracle target, not just a bound
    // boolean — u_k is the 52-bit md5 prefix of the k-th smallest
    // distinct hash, u_k/2^52 is an exact power-of-two-divisor double,
    // and (k-1)/u is ONE correctly-rounded IEEE division — so DuckDB
    // recomputes the estimate bit-for-bit from the same closed form.
    // The exact countDistinct rides along as the gate's comparison side.
    Q("sketch_kmv",
      (s, d) => {
        val k = 64
        val kmv = udaf(graft.functions.KmvSketch(k))
        val u52 = expr("cast(conv(substring(md5(cast(user_id as string)), 1, 13), 16, 10) as bigint)")
        Tables.events(s, d)
          .groupBy("event_type")
          .agg(kmv(u52).as("uk"),
            countDistinct(col("user_id")).as("nd"))
          .filter(col("uk") > 0)
          .select(col("event_type"), col("nd"),
            expr(s"cast(floor(${k - 1}.0 / (cast(uk as double) / 4503599627370496.0) * 1000000.0 + 0.5) as bigint)")
              .as("est_micro"))
          .withColumn("within_bound",
            abs(col("est_micro") - col("nd") * 1000000L) <= col("nd") * 500000L)
          .orderBy("event_type")
      },
      // The oracle dedups and ranks on the computed 52-bit PREFIX value
      // (as KmvSketch itself does), not on the full 32-hex md5 string —
      // two of the 64 smallest full hashes sharing a 13-hex prefix would
      // otherwise make rn=64 pick a different u_k than the sketch's 64th
      // distinct prefix (same convention as sketch_kmv_setops's ua/ub).
      Some("WITH h AS (SELECT DISTINCT event_type, md5(CAST(user_id AS VARCHAR)) AS h FROM events), " +
        "p AS (SELECT DISTINCT event_type, list_sum([(strpos('0123456789abcdef', substr(h, i, 1)) - 1) * 16.0 ^ (13 - i) for i in generate_series(1, 13)]) AS u FROM h), " +
        "r AS (SELECT event_type, u, row_number() OVER (PARTITION BY event_type ORDER BY u) AS rn FROM p), " +
        "u AS (SELECT event_type, u AS uk FROM r WHERE rn = 64), " +
        "x AS (SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS nd FROM events GROUP BY 1) " +
        "SELECT x.event_type, x.nd, " +
        "CAST(floor(63.0 / (CAST(u.uk AS DOUBLE) / 4503599627370496.0) * 1000000.0 + 0.5) AS BIGINT) AS est_micro, " +
        "(abs(CAST(floor(63.0 / (CAST(u.uk AS DOUBLE) / 4503599627370496.0) * 1000000.0 + 0.5) AS BIGINT) - x.nd * 1000000) <= x.nd * 500000) AS within_bound " +
        "FROM x JOIN u ON x.event_type = u.event_type ORDER BY x.event_type")),

    // KMV set algebra ([[graft.functions.KmvBuffer]]): union and
    // intersection cardinality of two user sets estimated from their
    // k-min sketches alone — merge the buffers for the union, count the
    // k-min survivors present in BOTH buffers for the ρ intersection
    // estimator (Beyer et al., SIGMOD 2007 §4). Buffers are k longs, so
    // the algebra itself is array expressions over two one-row frames;
    // exact counts ride along as the gate, and the estimates hash-match
    // DuckDB's identical closed form.
    Q("sketch_kmv_setops",
      (s, d) => {
        val k = 64
        val kb = udaf(graft.functions.KmvBuffer(k))
        val u52 = expr("cast(conv(substring(md5(cast(user_id as string)), 1, 13), 16, 10) as bigint)")
        val ev = Tables.events(s, d)
          .filter(col("event_type").isin("click", "view"))
        val bufs = ev.select(col("event_type").as("t"), u52.as("u"))
          .groupBy("t").agg(kb(col("u")).as("buf"))
        val a = bufs.filter(col("t") === "click").select(col("buf").as("a"))
        val b = bufs.filter(col("t") === "view").select(col("buf").as("b"))
        val exact = ev.select("event_type", "user_id").distinct()
          .groupBy("user_id").agg(count(lit(1)).as("nt"))
          .agg(count(lit(1)).as("n_union"),
            sum(when(col("nt") === 2, 1L).otherwise(0L)).as("n_inter"))
        val estU = s"(${k - 1}.0 / (cast(uk as double) / 4503599627370496.0))"
        a.crossJoin(b)
          .select(expr(s"slice(array_sort(array_distinct(concat(a, b))), 1, $k)").as("m"),
            col("a"), col("b"))
          .filter(size(col("m")) >= k)
          .select(expr(s"element_at(m, $k)").as("uk"),
            expr("size(filter(m, x -> array_contains(a, x) AND array_contains(b, x)))").as("rho"))
          .crossJoin(exact)
          .select(col("n_union"), col("n_inter"),
            expr(s"cast(floor($estU * 1000000.0 + 0.5) as bigint)").as("est_union_micro"),
            expr(s"cast(floor(cast(rho as double) / $k.0 * $estU * 1000000.0 + 0.5) as bigint)")
              .as("est_inter_micro"))
      },
      Some {
        val dig = "list_sum([(strpos('0123456789abcdef', substr(h, i, 1)) - 1) * 16.0 ^ (13 - i) for i in generate_series(1, 13)])"
        val estU = "(63.0 / (CAST(uk AS DOUBLE) / 4503599627370496.0))"
        "WITH hs AS (SELECT DISTINCT event_type AS t, md5(CAST(user_id AS VARCHAR)) AS h FROM events WHERE event_type IN ('click', 'view')), " +
          s"ua AS (SELECT DISTINCT $dig AS u FROM hs WHERE t = 'click' ORDER BY u LIMIT 64), " +
          s"ub AS (SELECT DISTINCT $dig AS u FROM hs WHERE t = 'view' ORDER BY u LIMIT 64), " +
          "ba AS (SELECT list(u ORDER BY u) AS a FROM ua), " +
          "bb AS (SELECT list(u ORDER BY u) AS b FROM ub), " +
          "m AS (SELECT (list_sort(list_distinct(a || b)))[1:64] AS m, a, b FROM ba, bb), " +
          "x AS (SELECT m[64] AS uk, len(list_filter(m, x -> list_contains(a, x) AND list_contains(b, x))) AS rho FROM m WHERE len(m) >= 64), " +
          "e AS (SELECT CAST(count(*) AS BIGINT) AS n_union, CAST(SUM(CASE WHEN nt = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_inter FROM (SELECT user_id, count(DISTINCT event_type) AS nt FROM events WHERE event_type IN ('click', 'view') GROUP BY 1)) " +
          s"SELECT e.n_union, e.n_inter, CAST(floor($estU * 1000000.0 + 0.5) AS BIGINT) AS est_union_micro, " +
          s"CAST(floor(CAST(x.rho AS DOUBLE) / 64.0 * $estU * 1000000.0 + 0.5) AS BIGINT) AS est_inter_micro " +
          "FROM e, x"
      }),

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

    // S8: the LLM-curation primitives on the SQL front end — a pure-SQL
    // user composes canonical_url / simhash16 / minhash_sig / qlog2_fp20
    // like built-ins ([[graft.functions.Registry.registerSql]], the
    // runtime twin of GraftExtensions). Every registered function
    // expands to the same codegen expression tree the Column API emits
    // (no UDFs — SQL ≡ DataFrame is additionally pinned in
    // FingerprintsSpec); the oracle re-derives all four values from
    // their proven cross-engine twins.
    Q("s8_sql_curation",
      (s, d) => {
        graft.functions.Registry.registerSql(s)
        Tables.documents(s, d).createOrReplaceTempView("documents")
        s.sql(SqlCuration)
      },
      Some(sqlCurationOracle)),

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

    // Exact percentiles of a CONTINUOUS value (unit price — 59,985
    // distinct ratios in 60k rows at sf0.01, so no quantization-aligned
    // single bucket exists): the two-level refinement chain subdivides
    // each group ~100×1024-fold before anything is ranked row-wise,
    // closing exactRefined's documented continuous-domain precondition.
    // percentile() ≡ quantile_cont (type-7) as proven by a10.
    Q("a21_pct_chain",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .withColumn("unit", col("l_extendedprice") / col("l_quantity"))
        graft.operators.Percentiles.exactRefinedChain(
          li, Seq("l_returnflag"), "unit",
          Seq(0.5 -> "med_unit", 0.95 -> "p95_unit"),
          buckets = Seq(graft.operators.Percentiles.widthBucket(1024),
            graft.operators.Percentiles.widthBucket(1)))
          .orderBy("l_returnflag")
      },
      Some("SELECT l_returnflag, quantile_cont(l_extendedprice / l_quantity, 0.5) AS med_unit, " +
        "quantile_cont(l_extendedprice / l_quantity, 0.95) AS p95_unit " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")),

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


  val all: Seq[Q] = aggs ++ scalars
}
