package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join-algorithm operators the built-in planner has no single node for:
  * as-of join (union + window, the Spark-native alternative to a range
  * join), binned interval×point range join (the keyless case), the
  * gaps-and-islands temporal grouping, and an AGMS (tug-of-war) sketch
  * estimating a join's output cardinality before running it — the
  * CBO-style guardrail a 100 TB pipeline wants before committing to a
  * shuffle that might explode. Every query is oracle-checked.
  */
object JoinQueries {

  private def rd(s: SparkSession, dir: String, t: String): DataFrame =
    s.read.parquet(s"$dir/$t.parquet")

  /** Portable deterministic sign hash for the AGMS sketch, identical
    * arithmetic on both engines (only the xor/shift SYNTAX differs —
    * `^`/shiftright() in Spark SQL, xor()/`>>` in DuckDB). Key is
    * range-reduced first so every intermediate stays far below 2^63
    * (DuckDB BIGINT errors on overflow; Spark ANSI mode too). Sign comes
    * from the low 16 bits after xor-folding the high bits down — raw
    * parity of a multiplicative hash is just parity of k. */
  private def agmsMix(k: String, j: String, spark: Boolean): String = {
    val a = s"(((($k % 1048573) * 2654435761 + CAST($j AS BIGINT) * 998244353)" +
      " % 2147483647) * 69069 + 907633385)"
    if (spark) s"($a ^ shiftright($a, 13) ^ shiftright($a, 29))"
    else s"xor(xor($a, $a >> 13), $a >> 29)"
  }

  private def agmsSign(k: String, j: String, spark: Boolean): String =
    s"(CASE WHEN ${agmsMix(k, j, spark)} % 65536 < 32768 THEN 1 ELSE -1 END)"

  /** Bucket hash for the Fast-AGMS sketch — a DIFFERENT mix round than the
    * sign (offset row id) so h and s are independent, as the estimator
    * requires. */
  private def agmsBucket(k: String, j: String, spark: Boolean): String =
    s"(${agmsMix(k, s"($j + 101)", spark)} % 1024)"

  val all: Seq[Q] = Seq(

    // AS-OF JOIN, the generic Spark-native shape: for every order, the
    // customer's most recent event at-or-before the order date. NOT a
    // per-row probe and NOT a range join: both sides are tagged and
    // UNIONED, one shuffle on the join key, one per-key window sort, and
    // `last(ignoreNulls)` carries the latest event forward onto each
    // order row. Cost is sort(|A|+|B|) per key — survives 100 TB because
    // there is no pair blow-up at all; skew is bounded by per-key row
    // counts. Direction: each EVENT is enriched with the user's most
    // recent ORDER at-or-before the event (last-order context on a
    // clickstream — the classic feature-attach). Tie-break is total:
    // (t, side orders-first, o_orderkey, event_id), so an order dated
    // exactly at the event counts and same-day orders resolve to the max
    // o_orderkey — the oracle's ORDER BY o_orderdate DESC, o_orderkey
    // DESC LIMIT 1 lateral probe.
    Q("asof_join_events",
      (s, dir) => {
        val o = rd(s, dir, "orders")
          .select(col("o_custkey").as("k"), col("o_orderdate").cast("timestamp").as("t"),
            lit(0).as("side"), col("o_orderkey"), col("o_totalprice"),
            lit(null).cast("long").as("event_id"))
        val e = rd(s, dir, "events")
          .select(col("user_id").as("k"), col("ts").cast("timestamp").as("t"),
            lit(1).as("side"), lit(null).cast("long").as("o_orderkey"),
            lit(null).cast("double").as("o_totalprice"), col("event_id"))
        val w = Window.partitionBy("k")
          .orderBy(col("t"), col("side"), col("o_orderkey"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        o.unionByName(e)
          .withColumn("asof_orderkey", last(col("o_orderkey"), ignoreNulls = true).over(w))
          .withColumn("asof_price",
            last(col("o_totalprice"), ignoreNulls = true).over(w))
          .withColumn("asof_t",
            last(when(col("side") === 0, col("t")), ignoreNulls = true).over(w))
          .filter(col("side") === 1)
          .select(col("event_id"), col("asof_orderkey"),
            round(col("asof_price"), 2).as("asof_price"),
            floor((col("t").cast("double") - col("asof_t").cast("double")) / 86400.0)
              .cast("long").as("days_since_order"))
      },
      Some("""SELECT e.event_id, o.o_orderkey AS asof_orderkey,
             |  round(o.o_totalprice, 2) AS asof_price,
             |  CAST(floor((epoch(e.ts) - epoch(o.o_orderdate)) / 86400.0) AS BIGINT)
             |    AS days_since_order
             |FROM events e LEFT JOIN LATERAL (
             |  SELECT od.o_orderkey, od.o_totalprice, od.o_orderdate FROM orders od
             |  WHERE od.o_custkey = e.user_id AND od.o_orderdate <= e.ts
             |  ORDER BY od.o_orderdate DESC, od.o_orderkey DESC LIMIT 1) o ON TRUE""".stripMargin)),

    // FORWARD AS-OF JOIN (pandas merge_asof direction='forward'): each
    // order is matched to the user's FIRST event at-or-after the order
    // date — same union+window machinery as the backward join, scanned
    // in DESCENDING time order so last(ignoreNulls) carries the nearest
    // FUTURE event backward onto each order row. Ties: an event exactly
    // at the order date counts; equal-timestamp events resolve to the
    // MIN event_id (they sort last in the descending scan) — the
    // oracle's ORDER BY ts ASC, event_id ASC LIMIT 1.
    Q("asof_join_forward",
      (s, dir) => {
        val e = rd(s, dir, "events")
          .select(col("user_id").as("k"), col("ts").cast("timestamp").as("t"),
            lit(0).as("side"), col("event_id"), col("event_type"),
            lit(null).cast("long").as("o_orderkey"))
        val o = rd(s, dir, "orders")
          .select(col("o_custkey").as("k"), col("o_orderdate").cast("timestamp").as("t"),
            lit(1).as("side"), lit(null).cast("long").as("event_id"),
            lit(null).cast("string").as("event_type"), col("o_orderkey"))
        val w = Window.partitionBy("k")
          .orderBy(col("t").desc, col("side"), col("event_id").desc,
            col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        e.unionByName(o)
          .withColumn("next_event_id", last(col("event_id"), ignoreNulls = true).over(w))
          .withColumn("next_event_type",
            last(col("event_type"), ignoreNulls = true).over(w))
          .withColumn("next_t",
            last(when(col("side") === 0, col("t")), ignoreNulls = true).over(w))
          .filter(col("side") === 1)
          .select(col("o_orderkey"), col("next_event_id"), col("next_event_type"),
            floor((col("next_t").cast("double") - col("t").cast("double")) / 86400.0)
              .cast("long").as("days_until_event"))
      },
      Some("""SELECT o.o_orderkey, e.event_id AS next_event_id,
             |  e.event_type AS next_event_type,
             |  CAST(floor((epoch(e.ts) - epoch(o.o_orderdate)) / 86400.0) AS BIGINT)
             |    AS days_until_event
             |FROM orders o LEFT JOIN LATERAL (
             |  SELECT ev.event_id, ev.event_type, ev.ts FROM events ev
             |  WHERE ev.user_id = o.o_custkey AND ev.ts >= o.o_orderdate
             |  ORDER BY ev.ts ASC, ev.event_id ASC LIMIT 1) e ON TRUE""".stripMargin)),

    // NEAREST AS-OF JOIN (pandas merge_asof direction='nearest'): each
    // order takes the user's CLOSEST event in either direction —
    // backward and forward candidates from the two existing window
    // scans in ONE union pipeline, then an absolute-microsecond
    // distance pick. Distance ties prefer the backward candidate
    // (pandas' rule); within a side, equal-timestamp events resolve
    // exactly as the backward/forward joins do (max event_id backward,
    // min forward) — the oracle's lateral ORDER BY mirrors all three
    // levels. Still sort(|A|+|B|) per key, no pair blow-up.
    Q("asof_join_nearest",
      (s, dir) => {
        val e = rd(s, dir, "events")
          .select(col("user_id").as("k"), col("ts").cast("timestamp").as("t"),
            lit(1).as("is_event"), col("event_id"),
            lit(null).cast("long").as("o_orderkey"))
        val o = rd(s, dir, "orders")
          .select(col("o_custkey").as("k"),
            col("o_orderdate").cast("timestamp").as("t"),
            lit(0).as("is_event"), lit(null).cast("long").as("event_id"),
            col("o_orderkey"))
        val u = e.unionByName(o)
        val wB = Window.partitionBy("k")
          .orderBy(col("t"), col("is_event").desc, col("event_id"),
            col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wF = Window.partitionBy("k")
          .orderBy(col("t").desc, col("is_event").desc, col("event_id").desc,
            col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val ev = when(col("is_event") === 1,
          struct(col("t"), col("event_id")))
        u.withColumn("prev", last(ev, ignoreNulls = true).over(wB))
          .withColumn("next", last(ev, ignoreNulls = true).over(wF))
          .filter(col("is_event") === 0)
          .withColumn("d_prev",
            unix_micros(col("t")) - unix_micros(col("prev.t")))
          .withColumn("d_next",
            unix_micros(col("next.t")) - unix_micros(col("t")))
          .select(col("o_orderkey"),
            when(col("prev").isNotNull &&
                (col("next").isNull || col("d_prev") <= col("d_next")),
                col("prev.event_id"))
              .otherwise(col("next.event_id")).as("nearest_event_id"),
            when(col("prev").isNotNull &&
                (col("next").isNull || col("d_prev") <= col("d_next")),
                col("d_prev"))
              .otherwise(col("d_next")).as("distance_us"))
      },
      Some("""SELECT o.o_orderkey, e.event_id AS nearest_event_id,
             |  abs(epoch_us(e.ts) - epoch_us(cast(o.o_orderdate AS TIMESTAMP)))
             |    AS distance_us
             |FROM orders o LEFT JOIN LATERAL (
             |  SELECT ev.event_id, ev.ts FROM events ev
             |  WHERE ev.user_id = o.o_custkey
             |  ORDER BY abs(epoch_us(ev.ts)
             |      - epoch_us(cast(o.o_orderdate AS TIMESTAMP))) ASC,
             |    (ev.ts <= o.o_orderdate) DESC,
             |    CASE WHEN ev.ts <= o.o_orderdate THEN -ev.event_id
             |         ELSE ev.event_id END ASC
             |  LIMIT 1) e ON TRUE""".stripMargin)),

    // BINNED RANGE JOIN — the KEYLESS interval×point case (as-of above
    // covers the keyed one). Promo windows (top-50 busiest order days,
    // each open for 4 days) × all events, no equi key at all. A naive
    // formulation is a cross join with a residual range predicate —
    // O(|intervals|·|points|), dead at scale. The binned plan explodes
    // each interval into its covered day-buckets (bounded fanout =
    // interval length / bucket width = 4) and equi-joins events on
    // to_date(ts) — both sides shuffle-partition by bucket, the residual
    // range check runs per bucket, and no broadcast is assumed (AQE may
    // still pick one when a side is small). Deterministic top-50 via
    // total-order sort+limit (count desc, day asc), not a global window.
    Q("range_join_binned",
      (s, dir) => {
        val ev = rd(s, dir, "events")
        val promos = ev
          .filter(col("event_type") === "purchase")
          .groupBy(to_date(col("ts")).as("promo_start"))
          .agg(count(lit(1)).as("n_purchases"))
          .orderBy(col("n_purchases").desc, col("promo_start"))
          .limit(10)
          .select(col("promo_start"))
        // bounded fanout: each 3-day window explodes into exactly 3 day
        // buckets; windows may overlap, so one event can hit several —
        // that multi-hit is the range-join semantics, not an artifact
        val bins = promos.withColumn("bucket",
          explode(expr("sequence(promo_start, date_add(promo_start, 2), interval 1 day)")))
        val e = ev
          .select(to_date(col("ts")).as("bucket"), col("event_id"), col("user_id"),
            round(col("value") * 100).cast("long").as("cents"))
        val hits = bins.join(e, Seq("bucket"))
          .filter(col("bucket") >= col("promo_start") &&
            col("bucket") < date_add(col("promo_start"), 3))
          .groupBy("promo_start")
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("user_id")).as("n_users"),
            sum(col("cents")).as("cents"))
        promos.join(hits, Seq("promo_start"), "left")
          .select(col("promo_start"),
            coalesce(col("n_events"), lit(0L)).as("n_events"),
            coalesce(col("n_users"), lit(0L)).as("n_users"),
            round(coalesce(col("cents"), lit(0L)).cast("double") / 100.0, 2)
              .as("total_value"))
      },
      Some("""WITH days AS (
             |  SELECT cast(ts AS DATE) AS promo_start, count(*) AS n
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
             |top AS (SELECT promo_start FROM days
             |        ORDER BY n DESC, promo_start LIMIT 10),
             |hits AS (
             |  SELECT t.promo_start,
             |    cast(count(e.event_id) AS BIGINT) AS n_events,
             |    cast(count(DISTINCT e.user_id) AS BIGINT) AS n_users,
             |    round(cast(coalesce(sum(cast(round(e.value * 100) AS BIGINT)), 0)
             |      AS double) / 100.0, 2) AS total_value
             |  FROM top t LEFT JOIN events e
             |    ON cast(e.ts AS DATE) >= t.promo_start
             |   AND cast(e.ts AS DATE) < t.promo_start + 3
             |  GROUP BY 1)
             |SELECT promo_start, n_events, n_users, total_value FROM hits""".stripMargin)),

    // INTERVAL × INTERVAL OVERLAP JOIN, keyless and binned — the general
    // case completing the family (asof = keyed point×interval, binned
    // range = keyless point×interval). User sessions (30-min gap
    // sessionization) against promo windows (top-10 purchase days, 2-day
    // windows): BOTH interval sets explode into covered day-buckets
    // (bounded fanout each), the equi-join runs on the bucket, duplicate
    // bucket-hits dedup on the pair key, and the exact overlap length is
    // the residual computation. No cross join at any size.
    Q("interval_overlap_join",
      (s, dir) => {
        val ev = rd(s, dir, "events")
          .select(col("user_id"), col("ts").cast("timestamp").as("ts"),
            col("event_id"))
        val sess = ev
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
          .agg(count(lit(1)).as("n"))
          .select(col("user_id"), col("sw.start").as("ss"), col("sw.end").as("se"))
        val promoWins = rd(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(to_date(col("ts")).as("pd")).agg(count(lit(1)).as("np"))
          .orderBy(col("np").desc, col("pd")).limit(10)
          .select(col("pd").as("promo_start"),
            date_add(col("pd"), 2).as("promo_end"))
        val sBins = sess.withColumn("bucket",
          explode(expr("sequence(to_date(ss), to_date(se), interval 1 day)")))
        val pBins = promoWins.withColumn("bucket",
          explode(expr("sequence(promo_start, date_add(promo_end, -1), interval 1 day)")))
        val pairs = sBins.join(pBins, Seq("bucket"))
          .select(col("user_id"), col("ss"), col("se"),
            col("promo_start"), col("promo_end"))
          .distinct()
          .withColumn("ov_s",
            least(col("se").cast("double"),
              col("promo_end").cast("timestamp").cast("double")) -
              greatest(col("ss").cast("double"),
                col("promo_start").cast("timestamp").cast("double")))
          .filter(col("ov_s") > 0.0)
        promoWins.join(pairs.groupBy("promo_start")
            .agg(count(lit(1)).as("n_sessions"),
              countDistinct("user_id").as("n_users"),
              round(sum("ov_s"), 1).as("overlap_seconds")),
            Seq("promo_start"), "left")
          .select(col("promo_start"),
            coalesce(col("n_sessions"), lit(0L)).as("n_sessions"),
            coalesce(col("n_users"), lit(0L)).as("n_users"),
            coalesce(col("overlap_seconds"), lit(0.0)).as("overlap_seconds"))
      },
      Some("""WITH o AS (
             |  SELECT user_id, ts, event_id,
             |    epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id)) AS gap
             |  FROM events),
             |sx AS (
             |  SELECT user_id, ts,
             |    sum(CASE WHEN gap IS NULL OR gap >= 1800 THEN 1 ELSE 0 END)
             |      OVER (PARTITION BY user_id ORDER BY ts, event_id
             |            ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM o),
             |sess AS (
             |  SELECT user_id, min(ts) AS ss,
             |    max(ts) + INTERVAL 30 MINUTE AS se
             |  FROM sx GROUP BY user_id, sid),
             |days AS (
             |  SELECT cast(ts AS DATE) AS pd, count(*) AS np
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
             |promos AS (
             |  SELECT pd AS promo_start, pd + 2 AS promo_end FROM days
             |  ORDER BY np DESC, pd LIMIT 10),
             |pairs AS (
             |  SELECT s.user_id, s.ss, s.se, p.promo_start, p.promo_end,
             |    least(epoch(s.se), epoch(cast(p.promo_end AS TIMESTAMP))) -
             |    greatest(epoch(s.ss), epoch(cast(p.promo_start AS TIMESTAMP)))
             |      AS ov_s
             |  FROM sess s JOIN promos p
             |    ON s.ss < cast(p.promo_end AS TIMESTAMP)
             |   AND cast(p.promo_start AS TIMESTAMP) < s.se),
             |agg AS (
             |  SELECT promo_start,
             |    cast(count(*) AS BIGINT) AS n_sessions,
             |    cast(count(DISTINCT user_id) AS BIGINT) AS n_users,
             |    round(sum(ov_s), 1) AS overlap_seconds
             |  FROM pairs WHERE ov_s > 0 GROUP BY 1)
             |SELECT p.promo_start,
             |  coalesce(a.n_sessions, 0) AS n_sessions,
             |  coalesce(a.n_users, 0) AS n_users,
             |  coalesce(a.overlap_seconds, 0.0) AS overlap_seconds
             |FROM promos p LEFT JOIN agg a USING (promo_start)""".stripMargin)),

    // GAPS AND ISLANDS: maximal runs of consecutive active months per
    // customer (an island = months with >=1 order, no gap), the classic
    // row_number-difference technique — month_index − rn is constant
    // within a run, one per-key window then one groupBy. Scale shape:
    // everything is partitioned by customer; the pre-aggregation to
    // (customer, month) bounds the window input to 12·years rows per key
    // no matter how many orders a month holds.
    Q("gaps_islands",
      (s, dir) => {
        val m = rd(s, dir, "orders")
          .select(col("o_custkey"),
            (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1).as("mi"))
          .groupBy("o_custkey", "mi").agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("o_custkey").orderBy("mi")
        m.withColumn("grp", col("mi") - row_number().over(w))
          .groupBy(col("o_custkey"), col("grp"))
          .agg(min("mi").as("mi_s"), max("mi").as("mi_e"),
            count(lit(1)).as("n_months"), sum("n").as("n_orders"))
          .filter(col("n_months") >= 3)
          .select(col("o_custkey"),
            make_date(expr("mi_s div 12"), expr("mi_s % 12 + 1"), lit(1)).as("start_month"),
            make_date(expr("mi_e div 12"), expr("mi_e % 12 + 1"), lit(1)).as("end_month"),
            col("n_months"), col("n_orders"))
      },
      Some("""WITH m AS (
             |  SELECT o_custkey,
             |    year(o_orderdate) * 12 + month(o_orderdate) - 1 AS mi,
             |    cast(count(*) AS BIGINT) AS n
             |  FROM orders GROUP BY 1, 2),
             |r AS (SELECT *, row_number() OVER
             |        (PARTITION BY o_custkey ORDER BY mi) AS rn FROM m)
             |SELECT o_custkey,
             |  make_date(cast(min(mi) // 12 AS INT), cast(min(mi) % 12 + 1 AS INT), 1)
             |    AS start_month,
             |  make_date(cast(max(mi) // 12 AS INT), cast(max(mi) % 12 + 1 AS INT), 1)
             |    AS end_month,
             |  cast(count(*) AS BIGINT) AS n_months,
             |  cast(sum(n) AS BIGINT) AS n_orders
             |FROM r GROUP BY o_custkey, mi - rn
             |HAVING count(*) >= 3""".stripMargin)),

    // JOIN-SIZE ESTIMATION via the Fast-AGMS sketch (Alon-Gilbert-
    // Matias-Szegedy counters bucketized per Cormode-Garofalakis):
    // |orders ⋈ events| on customer key, estimated WITHOUT running the
    // join. Each side folds to a 5-row × 1024-bucket table of signed
    // counters S_r[b] = Σ_{rows: h_r(key)=b} s_r(key) in ONE pass
    // (mergeable, map-side combined); per row r, Σ_b S^A_r[b]·S^B_r[b]
    // is an unbiased join-size estimate with variance F2(A)·F2(B)/1024 —
    // the bucketing, not repetition, buys the accuracy. Median across
    // the 5 rows tames outliers. At 100 TB this is the planner
    // guardrail: 5·1024 counters per side vs actually materializing the
    // join. The exact size (for the error column) is Σ_k cA(k)·cB(k)
    // from the two per-key count tables — never the raw pair set.
    Q("join_size_agms",
      (s, dir) => {
        val js = explode(expr("sequence(0, 4)")).as("r")
        def sketch(df: DataFrame, key: String, out: String): DataFrame =
          df.select(col(key).as("k")).select(col("k"), js)
            .groupBy(col("r"), expr(agmsBucket("k", "r", spark = true)).as("b"))
            .agg(sum(expr(agmsSign("k", "r", spark = true))).as(out))
        val sa = sketch(rd(s, dir, "orders"), "o_custkey", "sa")
        val sb = sketch(rd(s, dir, "events"), "user_id", "sb")
        // inner join on (r,b): a bucket absent from one side contributes
        // S_A·0 = 0 to the row's estimate, so dropping it is exact
        val est = sa.join(sb, Seq("r", "b"))
          .groupBy("r").agg(sum(col("sa") * col("sb")).as("row_est"))
          .agg(expr("percentile(row_est, 0.5)").as("agms_estimate"))
        val ca = rd(s, dir, "orders").groupBy(col("o_custkey").as("k"))
          .agg(count(lit(1)).as("ca"))
        val cb = rd(s, dir, "events").groupBy(col("user_id").as("k"))
          .agg(count(lit(1)).as("cb"))
        val exact = ca.join(cb, Seq("k"))
          .agg(sum(col("ca") * col("cb")).as("exact_size"))
        exact.crossJoin(broadcast(est))
          .select(col("exact_size"),
            round(col("agms_estimate"), 1).as("agms_estimate"),
            round(abs(col("agms_estimate") - col("exact_size")) /
              col("exact_size") * 100.0, 2).as("rel_err_pct"))
      },
      Some(s"""WITH ks AS (SELECT range AS r FROM range(0, 5)),
              |sa AS (SELECT r, ${agmsBucket("o.o_custkey", "r", spark = false)} AS b,
              |         cast(sum(${agmsSign("o.o_custkey", "r", spark = false)}) AS BIGINT)
              |         AS sa FROM orders o CROSS JOIN ks GROUP BY 1, 2),
              |sb AS (SELECT r, ${agmsBucket("e.user_id", "r", spark = false)} AS b,
              |         cast(sum(${agmsSign("e.user_id", "r", spark = false)}) AS BIGINT)
              |         AS sb FROM events e CROSS JOIN ks GROUP BY 1, 2),
              |rowest AS (SELECT r, cast(sum(sa.sa * sb.sb) AS double) AS row_est
              |           FROM sa JOIN sb USING (r, b) GROUP BY 1),
              |est AS (SELECT quantile_cont(row_est, 0.5) AS agms_estimate FROM rowest),
              |ca AS (SELECT o_custkey AS k, count(*) AS ca FROM orders GROUP BY 1),
              |cb AS (SELECT user_id AS k, count(*) AS cb FROM events GROUP BY 1),
              |ex AS (SELECT cast(sum(ca.ca * cb.cb) AS BIGINT) AS exact_size
              |       FROM ca JOIN cb USING (k))
              |SELECT ex.exact_size, round(est.agms_estimate, 1) AS agms_estimate,
              |  round(abs(est.agms_estimate - ex.exact_size) / ex.exact_size * 100.0, 2)
              |    AS rel_err_pct
              |FROM ex CROSS JOIN est""".stripMargin))
  )
}
