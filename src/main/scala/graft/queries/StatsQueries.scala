package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Profiling & reshaping operators: the CBO-style column statistics and
  * the wide↔long / resampling transforms an analytics platform serves
  * constantly — equi-depth histograms, pivot/unpivot, time-weighted
  * averages, and regular-grid forward-fill resampling. All oracle-checked.
  */
object StatsQueries {

  private def rd(s: SparkSession, dir: String, t: String): DataFrame =
    s.read.parquet(s"$dir/$t.parquet")

  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  val all: Seq[Q] = Seq(

    // EQUI-DEPTH HISTOGRAM over o_totalprice — the optimizer's column
    // statistic, built the distributed way: ONE exact-percentile
    // aggregate produces the 31 interior boundaries (at 100 TB this
    // becomes approx_percentile with a bounded error budget — same plan
    // shape, sketch instead of exact), the boundary ARRAY rides to every
    // row as a broadcast scalar, and bucket id = #boundaries below the
    // value via a codegen'd aggregate over the array — no second shuffle
    // besides the final 32-group count. Per-bucket ndv doubles as a
    // uniqueness profile.
    Q("equi_depth_histogram",
      (s, dir) => {
        val fracs = (1 until 32).map(i => i / 32.0)
        val v = rd(s, dir, "orders").select(col("o_totalprice").as("v"))
        val bounds = v.agg(
          expr(s"percentile(v, array(${fracs.mkString(", ")}))").as("bs"))
        v.crossJoin(broadcast(bounds))
          .select(col("v"),
            expr("aggregate(bs, 0, (acc, b) -> acc + CASE WHEN v > b THEN 1 ELSE 0 END)")
              .as("bucket"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_rows"),
            countDistinct(col("v")).as("ndv"),
            round(min("v"), 2).as("lo"),
            round(max("v"), 2).as("hi"))
      },
      Some(s"""WITH bounds AS (
              |  SELECT quantile_cont(o_totalprice,
              |    [${(1 until 32).map(i => s"$i/32.0").mkString(", ")}]) AS bs
              |  FROM orders),
              |b AS (
              |  SELECT o.o_totalprice AS v,
              |    len(list_filter(bounds.bs, x -> o.o_totalprice > x)) AS bucket
              |  FROM orders o CROSS JOIN bounds)
              |SELECT cast(bucket AS INT) AS bucket,
              |  cast(count(*) AS BIGINT) AS n_rows,
              |  cast(count(DISTINCT v) AS BIGINT) AS ndv,
              |  round(min(v), 2) AS lo, round(max(v), 2) AS hi
              |FROM b GROUP BY 1""".stripMargin)),

    // PIVOT (long → wide): the day × event_type count matrix via the
    // DataFrame pivot API with an EXPLICIT value list — never the
    // two-pass distinct-then-pivot, whose first pass is a full scan just
    // to learn the columns; at 100 TB the domain is declared, not
    // discovered. One shuffle on day; pivot folds to per-day conditional
    // counts (map-side combined like any other agg).
    Q("pivot_event_matrix",
      (s, dir) => {
        val wide = rd(s, dir, "events")
          .groupBy(to_date(col("ts")).as("day"))
          .pivot("event_type", EventTypes)
          .agg(count(lit(1)))
        EventTypes.foldLeft(wide) { (d, t) =>
          d.withColumn(t, coalesce(col(t), lit(0L)))
        }
      },
      Some(s"""SELECT cast(ts AS DATE) AS day,
              |${EventTypes.map(t =>
                 s"  cast(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS $t")
                 .mkString(",\n")}
              |FROM events GROUP BY 1""".stripMargin)),

    // UNPIVOT / MELT (wide → long): the inverse reshaping via
    // Dataset.unpivot — per-priority order metrics melted to
    // (priority, metric, value) rows. Stays narrow: the wide frame is
    // an aggregate (5 rows), the melt is a local expand — the pattern's
    // cost at scale is the aggregate, never the reshape.
    Q("unpivot_order_metrics",
      (s, dir) => {
        val wide = rd(s, dir, "orders")
          .groupBy(col("o_orderpriority").as("priority"))
          .agg(count(lit(1)).cast("double").as("n_orders"),
            round(avg("o_totalprice"), 2).as("avg_price"),
            round(max("o_totalprice"), 2).as("max_price"),
            countDistinct("o_custkey").cast("double").as("n_custs"))
        wide.unpivot(Array(col("priority")),
          Array(col("n_orders"), col("avg_price"), col("max_price"), col("n_custs")),
          "metric", "value")
      },
      Some("""WITH w AS (
             |  SELECT o_orderpriority AS priority,
             |    cast(count(*) AS double) AS n_orders,
             |    round(avg(o_totalprice), 2) AS avg_price,
             |    round(max(o_totalprice), 2) AS max_price,
             |    cast(count(DISTINCT o_custkey) AS double) AS n_custs
             |  FROM orders GROUP BY 1)
             |SELECT priority, 'n_orders' AS metric, n_orders AS value FROM w
             |UNION ALL SELECT priority, 'avg_price', avg_price FROM w
             |UNION ALL SELECT priority, 'max_price', max_price FROM w
             |UNION ALL SELECT priority, 'n_custs', n_custs FROM w""".stripMargin)),

    // TIME-WEIGHTED AVERAGE per user: each observation weighted by its
    // holding time (lead(ts) − ts), the irregular-sampling average that
    // plain avg() gets wrong. One per-user window (total order:
    // ts, event_id — simultaneous observations carry zero weight
    // deterministically), one groupBy. Partitioned by user throughout —
    // no global sort anywhere.
    Q("twap_user_value",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        rd(s, dir, "events")
          .select(col("user_id"), col("ts").cast("timestamp").as("ts"),
            col("event_id"), col("value"))
          .withColumn("dt",
            lead(col("ts"), 1).over(w).cast("double") - col("ts").cast("double"))
          .filter(col("dt").isNotNull)
          .groupBy("user_id")
          .agg(round(sum(col("value") * col("dt")) / sum(col("dt")), 4).as("twap"),
            // exact-cents truncating mean — round() of the exact rational
            // hits .00005 ties the engines break differently (churn_labels
            // note); the time-weighted twap stays a rounded double (its
            // weights are not integral)
            (expr("""(sum(cast(round(value * 100) AS BIGINT)) * 100)
                    | DIV count(*)""".stripMargin) / 10000.0)
              .as("plain_avg"),
            count(lit(1)).as("n_intervals"))
      },
      Some("""WITH d AS (
             |  SELECT user_id, value,
             |    epoch(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
             |      - epoch(ts) AS dt
             |  FROM events)
             |SELECT user_id,
             |  round(sum(value * dt) / sum(dt), 4) AS twap,
             |  ((sum(cast(round(value * 100) AS BIGINT)) * 100) // count(*))
             |    / 10000.0 AS plain_avg,
             |  cast(count(*) AS BIGINT) AS n_intervals
             |FROM d WHERE dt IS NOT NULL GROUP BY 1""".stripMargin)),

    // LEAKAGE-FREE TRAILING FEATURES: the training-data shape of a range
    // frame — per customer, the trailing-7-day spend EXCLUDING the label
    // day itself (RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING on the day
    // ordinal), beside the naive inclusive frame; `label_leaks` pins that
    // their difference is exactly the label day's own value — the
    // target-leakage bug this frame exists to prevent. Runs over the
    // per-(customer, day) pre-aggregate; partitioned windows, exact
    // cents.
    Q("leakage_free_features",
      (s, dir) => {
        val o = rd(s, dir, "orders")
          .select(col("o_custkey").as("k"),
            to_date(col("o_orderdate")).as("d"),
            round(col("o_totalprice") * 100).cast("long").as("cents"))
          .groupBy("k", "d")
          .agg(sum("cents").as("cents"), count(lit(1)).as("n_orders"))
          .withColumn("d_ord",
            datediff(col("d"), lit("1990-01-01")).cast("long"))
        val wExcl = Window.partitionBy("k").orderBy("d_ord")
          .rangeBetween(-7, -1)
        val wIncl = Window.partitionBy("k").orderBy("d_ord")
          .rangeBetween(-7, 0)
        o.select(col("k"), col("d"), col("n_orders"),
            coalesce(sum(col("cents")).over(wExcl), lit(0L))
              .as("trail7_excl_cents"),
            sum(col("cents")).over(wIncl).as("trail7_incl_cents"),
            col("cents"))
          .select(col("k"), col("d"), col("n_orders"),
            col("trail7_excl_cents"),
            (col("trail7_incl_cents") - col("trail7_excl_cents") ===
              col("cents")).as("label_leaks"))
      },
      Some("""WITH o AS (
             |  SELECT o_custkey AS k, cast(o_orderdate AS DATE) AS d,
             |    sum(cast(round(o_totalprice * 100) AS BIGINT)) AS cents,
             |    cast(count(*) AS BIGINT) AS n_orders
             |  FROM orders GROUP BY 1, 2),
             |w AS (
             |  SELECT k, d, n_orders, cents,
             |    date_diff('day', DATE '1990-01-01', d) AS d_ord
             |  FROM o)
             |SELECT k, d, n_orders,
             |  cast(coalesce(sum(cents) OVER (PARTITION BY k ORDER BY d_ord
             |    RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             |    AS trail7_excl_cents,
             |  cast(sum(cents) OVER (PARTITION BY k ORDER BY d_ord
             |    RANGE BETWEEN 7 PRECEDING AND CURRENT ROW) AS BIGINT)
             |    - cast(coalesce(sum(cents) OVER (PARTITION BY k ORDER BY d_ord
             |    RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             |    = cents AS label_leaks
             |FROM w""".stripMargin)),

    // REGULAR-GRID RESAMPLING with forward fill: each user's irregular
    // event stream resampled to a daily grid over the user's own active
    // span, gaps carrying the last observed value forward. The grid is
    // GENERATED per user (sequence over the min..max day — bounded
    // fanout, no calendar table shuffle), daily closing values come from
    // one per-(user, day) window, and the fill is last(ignoreNulls) over
    // the user partition — the Spark-native version of pandas
    // resample().ffill() that never leaves the user's partition.
    Q("time_grid_ffill",
      (s, dir) => {
        val e = rd(s, dir, "events")
          .select(col("user_id"), col("ts").cast("timestamp").as("ts"),
            col("event_id"), col("value"), to_date(col("ts")).as("day"))
        val wDay = Window.partitionBy("user_id", "day")
          .orderBy(col("ts").desc, col("event_id").desc)
        val daily = e.withColumn("rn", row_number().over(wDay))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("day"), col("value").as("close"))
        val grid = e.groupBy("user_id")
          .agg(min("day").as("d0"), max("day").as("d1"))
          .withColumn("day", explode(expr("sequence(d0, d1, interval 1 day)")))
          .select("user_id", "day")
        val wFill = Window.partitionBy("user_id").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(daily, Seq("user_id", "day"), "left")
          .select(col("user_id"), col("day"),
            round(last(col("close"), ignoreNulls = true).over(wFill), 4).as("value"),
            col("close").isNotNull.as("observed"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, ts, event_id, value, cast(ts AS DATE) AS day
             |  FROM events),
             |daily AS (
             |  SELECT user_id, day, value AS close FROM (
             |    SELECT *, row_number() OVER (PARTITION BY user_id, day
             |      ORDER BY ts DESC, event_id DESC) AS rn FROM e)
             |  WHERE rn = 1),
             |grid AS (
             |  SELECT user_id, cast(unnest(generate_series(
             |    cast(min(day) AS TIMESTAMP), cast(max(day) AS TIMESTAMP),
             |    INTERVAL 1 DAY)) AS DATE) AS day
             |  FROM e GROUP BY user_id)
             |SELECT g.user_id, g.day,
             |  round(last_value(d.close IGNORE NULLS) OVER (
             |    PARTITION BY g.user_id ORDER BY g.day
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS value,
             |  d.close IS NOT NULL AS observed
             |FROM grid g LEFT JOIN daily d
             |  ON d.user_id = g.user_id AND d.day = g.day""".stripMargin)),

    // REGULAR-GRID RESAMPLING with LINEAR INTERPOLATION — ffill's
    // sibling for continuous signals: a gap day takes
    // prev + (next − prev) · elapsed/gap_span between the surrounding
    // observed closes (pandas interpolate('time')). Same per-user grid
    // generation as time_grid_ffill; the surrounding observations come
    // from two ignore-nulls windows over the user's partition (last
    // before, first after — no self-join against observed rows). The
    // grid spans each user's own min..max observed day, so interior gaps
    // always have both neighbors; grid endpoints are observed rows.
    Q("time_grid_interpolate",
      (s, dir) => {
        val e = rd(s, dir, "events")
          .select(col("user_id"), col("ts").cast("timestamp").as("ts"),
            col("event_id"), col("value"), to_date(col("ts")).as("day"))
        val wDay = Window.partitionBy("user_id", "day")
          .orderBy(col("ts").desc, col("event_id").desc)
        val daily = e.withColumn("rn", row_number().over(wDay))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("day"), col("value").as("close"))
        val grid = e.groupBy("user_id")
          .agg(min("day").as("d0"), max("day").as("d1"))
          .withColumn("day", explode(expr("sequence(d0, d1, interval 1 day)")))
          .select("user_id", "day")
        val wPast = Window.partitionBy("user_id").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wFuture = Window.partitionBy("user_id").orderBy("day")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        grid.join(daily, Seq("user_id", "day"), "left")
          .select(col("user_id"), col("day"), col("close"),
            last(col("close"), ignoreNulls = true).over(wPast).as("pv"),
            last(when(col("close").isNotNull, col("day")), ignoreNulls = true)
              .over(wPast).as("pd"),
            first(col("close"), ignoreNulls = true).over(wFuture).as("nv"),
            first(when(col("close").isNotNull, col("day")), ignoreNulls = true)
              .over(wFuture).as("nd"))
          .select(col("user_id"), col("day"),
            round(when(col("close").isNotNull, col("close"))
              .otherwise(col("pv") + (col("nv") - col("pv")) *
                datediff(col("day"), col("pd")) /
                datediff(col("nd"), col("pd"))), 6).as("value"),
            col("close").isNotNull.as("observed"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, ts, event_id, value, cast(ts AS DATE) AS day
             |  FROM events),
             |daily AS (
             |  SELECT user_id, day, value AS close FROM (
             |    SELECT *, row_number() OVER (PARTITION BY user_id, day
             |      ORDER BY ts DESC, event_id DESC) AS rn FROM e)
             |  WHERE rn = 1),
             |grid AS (
             |  SELECT user_id, cast(unnest(generate_series(
             |    cast(min(day) AS TIMESTAMP), cast(max(day) AS TIMESTAMP),
             |    INTERVAL 1 DAY)) AS DATE) AS day
             |  FROM e GROUP BY user_id),
             |nb AS (
             |  SELECT g.user_id, g.day, d.close,
             |    last_value(d.close IGNORE NULLS) OVER (
             |      PARTITION BY g.user_id ORDER BY g.day
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             |    last_value(CASE WHEN d.close IS NOT NULL THEN g.day END
             |      IGNORE NULLS) OVER (
             |      PARTITION BY g.user_id ORDER BY g.day
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
             |    first_value(d.close IGNORE NULLS) OVER (
             |      PARTITION BY g.user_id ORDER BY g.day
             |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             |    first_value(CASE WHEN d.close IS NOT NULL THEN g.day END
             |      IGNORE NULLS) OVER (
             |      PARTITION BY g.user_id ORDER BY g.day
             |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
             |  FROM grid g LEFT JOIN daily d
             |    ON d.user_id = g.user_id AND d.day = g.day)
             |SELECT user_id, day,
             |  round(CASE WHEN close IS NOT NULL THEN close
             |    ELSE pv + (nv - pv) * date_diff('day', pd, day)
             |      / date_diff('day', pd, nd) END, 6) AS value,
             |  close IS NOT NULL AS observed
             |FROM nb""".stripMargin)),

    // YEAR-OVER-YEAR GROWTH: monthly revenue with the same-month-last-
    // year comparison via lag(1) over a window PARTITIONED BY CALENDAR
    // MONTH and ordered by year — 12 bounded partitions, never a global
    // sort; the classic YoY window stays shuffle-partitioned however
    // many years of history exist. Cents arithmetic keeps the sums
    // exact.
    Q("yoy_growth",
      (s, dir) => {
        val m = rd(s, dir, "orders")
          .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mon"))
          .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"),
            count(lit(1)).as("n_orders"))
        val w = Window.partitionBy("mon").orderBy("yr")
        m.withColumn("cents_prev", lag(col("cents"), 1).over(w))
          .select(col("yr"), col("mon"),
            round(col("cents").cast("double") / 100.0, 2).as("revenue"),
            col("n_orders"),
            round((col("cents") - col("cents_prev")).cast("double") /
              col("cents_prev") * 100.0, 2).as("yoy_pct"))
      },
      Some("""WITH m AS (
             |  SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mon,
             |    cast(sum(cast(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
             |    cast(count(*) AS BIGINT) AS n_orders
             |  FROM orders GROUP BY 1, 2)
             |SELECT yr, mon, round(cast(cents AS double) / 100.0, 2) AS revenue,
             |  n_orders,
             |  round(cast(cents - lag(cents) OVER (PARTITION BY mon ORDER BY yr)
             |    AS double) / lag(cents) OVER (PARTITION BY mon ORDER BY yr)
             |    * 100.0, 2) AS yoy_pct
             |FROM m""".stripMargin)),

    // INFORMATION-GAIN SPLIT SCAN — the decision-stump / feature-binning
    // primitive: which threshold on `value` best separates purchases
    // from the rest. Candidate thresholds are ONE percentile aggregate
    // (9 deciles), broadcast to the scan; per candidate the four split
    // counts fold in a single conditional aggregate — the whole scan is
    // one pass + a 9-group reduce regardless of data size, the shape a
    // 100 TB feature search needs (candidates grow, scans don't).
    Q("info_gain_split",
      (s, dir) => {
        val fracs = (1 to 9).map(i => i / 10.0)
        val e = rd(s, dir, "events")
          .select(col("value").as("x"),
            when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
        val cands = e.agg(
          expr(s"percentile(x, array(${fracs.mkString(", ")}))").as("ts"))
        def h(p: org.apache.spark.sql.Column) =
          when(p <= 0.0 || p >= 1.0, 0.0)
            .otherwise(-p * log2(p) - (lit(1.0) - p) * log2(lit(1.0) - p))
        val split = e.crossJoin(broadcast(cands))
          .select(col("x"), col("y"), posexplode(col("ts")).as(Seq("ci", "t")))
          .groupBy(col("ci"), col("t"))
          .agg(sum(when(col("x") <= col("t"), 1L).otherwise(0L)).as("nl"),
            sum(when(col("x") <= col("t"), col("y")).otherwise(0L)).as("pl"),
            sum(when(col("x") > col("t"), 1L).otherwise(0L)).as("nr"),
            sum(when(col("x") > col("t"), col("y")).otherwise(0L)).as("pr"))
        val n = col("nl") + col("nr")
        val gain =
          (h((col("pl") + col("pr")).cast("double") / n.cast("double"))
            - col("nl").cast("double") / n.cast("double") *
              h(col("pl").cast("double") / col("nl").cast("double"))
            - col("nr").cast("double") / n.cast("double") *
              h(col("pr").cast("double") / col("nr").cast("double")))
        val scored = split.select(col("ci"), round(col("t"), 4).as("threshold"),
          col("nl").as("n_left"), col("pl").as("pos_left"),
          round(gain, 5).as("info_gain"))
        scored.crossJoin(broadcast(
            scored.agg(max("info_gain").as("best_gain"))))
          .withColumn("is_best", col("info_gain") === col("best_gain"))
          .drop("best_gain")
      },
      Some(s"""WITH cands AS (
              |  SELECT quantile_cont(value,
              |    [${(1 to 9).map(i => s"$i/10.0").mkString(", ")}]) AS ts
              |  FROM events),
              |c AS (SELECT r.range AS ci, cands.ts[CAST(r.range + 1 AS INT)] AS t
              |      FROM cands CROSS JOIN range(0, 9) r),
              |s AS (
              |  SELECT c.ci, c.t,
              |    sum(CASE WHEN e.value <= c.t THEN 1 ELSE 0 END) AS nl,
              |    sum(CASE WHEN e.value <= c.t AND e.event_type = 'purchase'
              |        THEN 1 ELSE 0 END) AS pl,
              |    sum(CASE WHEN e.value > c.t THEN 1 ELSE 0 END) AS nr,
              |    sum(CASE WHEN e.value > c.t AND e.event_type = 'purchase'
              |        THEN 1 ELSE 0 END) AS pr
              |  FROM events e CROSS JOIN c GROUP BY 1, 2),
              |g AS (
              |  SELECT ci, round(t, 4) AS threshold,
              |    cast(nl AS BIGINT) AS n_left, cast(pl AS BIGINT) AS pos_left,
              |    round(
              |      (CASE WHEN (pl+pr) <= 0 OR (pl+pr) >= (nl+nr) THEN 0.0
              |        ELSE -((pl+pr)/cast(nl+nr AS double))*log2((pl+pr)/cast(nl+nr AS double))
              |          - (1.0-(pl+pr)/cast(nl+nr AS double))*log2(1.0-(pl+pr)/cast(nl+nr AS double)) END)
              |      - (nl/cast(nl+nr AS double)) *
              |        (CASE WHEN pl <= 0 OR pl >= nl THEN 0.0
              |          ELSE -(pl/cast(nl AS double))*log2(pl/cast(nl AS double))
              |            - (1.0-pl/cast(nl AS double))*log2(1.0-pl/cast(nl AS double)) END)
              |      - (nr/cast(nl+nr AS double)) *
              |        (CASE WHEN pr <= 0 OR pr >= nr THEN 0.0
              |          ELSE -(pr/cast(nr AS double))*log2(pr/cast(nr AS double))
              |            - (1.0-pr/cast(nr AS double))*log2(1.0-pr/cast(nr AS double)) END), 5)
              |      AS info_gain
              |  FROM s)
              |SELECT ci, threshold, n_left, pos_left, info_gain,
              |  info_gain = (SELECT max(info_gain) FROM g) AS is_best
              |FROM g""".stripMargin)),

    // PARETO FRONTIER (2D skyline) per market segment: orders not
    // dominated on (newer date, higher price). Never the O(n²) dominance
    // check: per segment, ONE window ordered by day with a
    // strictly-later range frame gives max(price) over all newer orders
    // — frontier = rows beating that and topping their own day. All
    // windows are segment-partitioned; the oracle is the independent
    // NOT EXISTS dominance formulation, stated against per-(segment,
    // day) maxima — dominance is decidable from day maxima alone, which
    // keeps the oracle O(segment·days) at any SF (the raw all-pairs
    // NOT EXISTS was still grinding after 6 CPU-hours at sf1).
    Q("pareto_frontier",
      (s, dir) => {
        val pts = rd(s, dir, "orders")
          .join(rd(s, dir, "customer")
            .select(col("c_custkey"), col("c_mktsegment").as("segment")),
            col("o_custkey") === col("c_custkey"))
          .select(col("segment"), col("o_orderkey"),
            to_date(col("o_orderdate")).as("day"),
            datediff(to_date(col("o_orderdate")), lit("1990-01-01")).as("di"),
            col("o_totalprice").as("price"))
        // two-level: collapse to per-(segment, day) maxima FIRST (bounded:
        // days × segments rows), run the strictly-later cumulative max as a
        // ROWS frame on that small frame, then join back. The direct
        // rangeBetween(1, unboundedFollowing) row-level window is
        // quadratic per partition (13.9s at sf0.1 vs 0.9s for this plan).
        val dayMax = pts.groupBy("segment", "di")
          .agg(max("price").as("max_same"))
        val wLater = Window.partitionBy("segment").orderBy(col("di").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val later = dayMax.withColumn("max_later", max(col("max_same")).over(wLater))
        pts.join(later, Seq("segment", "di"))
          .filter((col("max_later").isNull || col("price") > col("max_later")) &&
            col("price") === col("max_same"))
          .select(col("segment"), col("o_orderkey"), col("day"),
            round(col("price"), 2).as("price"))
      },
      Some("""WITH pts AS (
             |  SELECT c.c_mktsegment AS segment, o.o_orderkey,
             |    cast(o.o_orderdate AS DATE) AS day, o.o_totalprice AS price
             |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
             |dmax AS (
             |  SELECT segment, day, max(price) AS mp FROM pts GROUP BY 1, 2)
             |SELECT p.segment, p.o_orderkey, p.day, round(p.price, 2) AS price
             |FROM pts p
             |JOIN dmax d ON d.segment = p.segment AND d.day = p.day
             |           AND p.price = d.mp
             |WHERE NOT EXISTS (
             |  SELECT 1 FROM dmax d2
             |  WHERE d2.segment = p.segment AND d2.day >= p.day
             |    AND d2.mp >= p.price
             |    AND (d2.day > p.day OR d2.mp > p.price))""".stripMargin)),

    // ABC (Pareto) CLASSIFICATION of parts by revenue, WITHIN brand: the
    // cumulative-share scan runs per brand (bounded partitions — never
    // the tempting global ORDER BY revenue), classing each part A/B/C at
    // the 80%/95% cumulative boundaries. Ordering is total (revenue
    // desc, partkey) so the class assignment is reproducible. Output is
    // the per-brand class census an inventory policy consumes.
    Q("abc_classification",
      (s, dir) => {
        val rev = rd(s, dir, "lineitem")
          .groupBy(col("l_partkey"))
          .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("cents"))
          .join(rd(s, dir, "part").select(col("p_partkey"), col("p_brand")),
            col("l_partkey") === col("p_partkey"))
        val w = Window.partitionBy("p_brand")
          .orderBy(col("cents").desc, col("l_partkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = Window.partitionBy("p_brand")
        val classed = rev
          .withColumn("cum", sum("cents").over(w))
          .withColumn("share", col("cum").cast("double") /
            sum("cents").over(tot).cast("double"))
          .withColumn("abc", when(col("share") <= 0.8, "A")
            .when(col("share") <= 0.95, "B").otherwise("C"))
        classed.groupBy("p_brand", "abc")
          .agg(count(lit(1)).as("n_parts"),
            round(sum("cents").cast("double") / 100.0, 2).as("revenue"))
      },
      Some("""WITH rev AS (
             |  SELECT p.p_brand, l.l_partkey,
             |    cast(sum(cast(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             |      AS cents
             |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
             |  GROUP BY 1, 2),
             |c AS (
             |  SELECT p_brand, cents,
             |    cast(sum(cents) OVER (PARTITION BY p_brand
             |      ORDER BY cents DESC, l_partkey
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS double) /
             |    sum(cents) OVER (PARTITION BY p_brand) AS share
             |  FROM rev)
             |SELECT p_brand,
             |  CASE WHEN share <= 0.8 THEN 'A'
             |       WHEN share <= 0.95 THEN 'B' ELSE 'C' END AS abc,
             |  cast(count(*) AS BIGINT) AS n_parts,
             |  round(cast(sum(cents) AS double) / 100.0, 2) AS revenue
             |FROM c GROUP BY 1, 2""".stripMargin)),

    // HHI SUPPLY CONCENTRATION: Herfindahl-Hirschman index of supplier
    // revenue share per nation — the supply-chain-risk rollup. Two
    // bounded aggregations (supplier revenue, then Σ share² per nation);
    // shares square inside the nation group, so the whole thing is
    // shuffle-partitioned by nation with no window at all.
    Q("hhi_concentration",
      (s, dir) => {
        val srev = rd(s, dir, "lineitem")
          .groupBy(col("l_suppkey"))
          .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("cents"))
          .join(rd(s, dir, "supplier")
            .select(col("s_suppkey"), col("s_nationkey")),
            col("l_suppkey") === col("s_suppkey"))
          .join(rd(s, dir, "nation")
            .select(col("n_nationkey"), col("n_name")),
            col("s_nationkey") === col("n_nationkey"))
        val natTot = srev.groupBy("n_name")
          .agg(sum("cents").as("nat_cents"), count(lit(1)).as("n_suppliers"))
        srev.join(natTot, Seq("n_name"))
          .groupBy(col("n_name").as("nation"), col("n_suppliers"))
          .agg(round(sum(pow(col("cents").cast("double") /
              col("nat_cents").cast("double"), 2.0)) * 10000.0, 1).as("hhi"),
            round(max("cents").cast("double") /
              max("nat_cents").cast("double") * 100.0, 2).as("top_share_pct"))
      },
      Some("""WITH srev AS (
             |  SELECT n.n_name,
             |    cast(sum(cast(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             |      AS cents
             |  FROM lineitem l
             |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
             |  JOIN nation n ON n.n_nationkey = s.s_nationkey
             |  GROUP BY n.n_name, l.l_suppkey),
             |tot AS (SELECT n_name, cast(sum(cents) AS BIGINT) AS nat,
             |          cast(count(*) AS BIGINT) AS ns
             |        FROM srev GROUP BY 1)
             |SELECT t.n_name AS nation, t.ns AS n_suppliers,
             |  round(sum(pow(cast(s.cents AS double) / cast(t.nat AS double), 2))
             |    * 10000.0, 1) AS hhi,
             |  round(cast(max(s.cents) AS double) / cast(t.nat AS double) * 100.0, 2)
             |    AS top_share_pct
             |FROM srev s JOIN tot t USING (n_name)
             |GROUP BY t.n_name, t.ns, t.nat""".stripMargin)),

    // SHIP-LATENCY SLA REPORT: order→ship latency percentiles and the
    // beyond-90-days breach share, per order priority — the operational
    // SLA rollup. One equi-join on orderkey (both sides huge at scale —
    // plain shuffle join, AQE handles skew), one grouped aggregate with
    // exact percentiles (approx_percentile at real scale, same plan
    // shape).
    Q("ship_latency_sla",
      (s, dir) => {
        rd(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_shipdate").cast("timestamp").as("sd"))
          .join(rd(s, dir, "orders")
            .select(col("o_orderkey"), col("o_orderpriority"),
              col("o_orderdate").cast("timestamp").as("od")),
            col("l_orderkey") === col("o_orderkey"))
          .withColumn("lat_days", datediff(to_date(col("sd")), to_date(col("od"))))
          .groupBy(col("o_orderpriority").as("priority"))
          .agg(count(lit(1)).as("n_lines"),
            round(expr("percentile(lat_days, 0.5)"), 1).as("p50_days"),
            round(expr("percentile(lat_days, 0.95)"), 1).as("p95_days"),
            round(sum(when(col("lat_days") > 90, 1L).otherwise(0L)).cast("double") /
              count(lit(1)) * 100.0, 2).as("breach_pct"))
      },
      Some("""SELECT o.o_orderpriority AS priority,
             |  cast(count(*) AS BIGINT) AS n_lines,
             |  round(quantile_cont(datediff('day', cast(o.o_orderdate AS DATE),
             |    cast(l.l_shipdate AS DATE)), 0.5), 1) AS p50_days,
             |  round(quantile_cont(datediff('day', cast(o.o_orderdate AS DATE),
             |    cast(l.l_shipdate AS DATE)), 0.95), 1) AS p95_days,
             |  round(cast(sum(CASE WHEN datediff('day', cast(o.o_orderdate AS DATE),
             |    cast(l.l_shipdate AS DATE)) > 90 THEN 1 ELSE 0 END) AS double)
             |    / count(*) * 100.0, 2) AS breach_pct
             |FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
             |GROUP BY 1""".stripMargin)),

    // HIERARCHICAL SHARE-OF-PARENT rollup: revenue at nation grain with
    // each nation's share of its region and of the grand total — the
    // drill-down tree every BI tool renders. One grouped aggregate at
    // leaf grain, then two WINDOW sums over the (tiny) grouped result —
    // the re-aggregation never touches the fact again. Exact cents
    // throughout; shares are divisions of exact longs.
    Q("rollup_share_of_parent",
      (s, dir) => {
        val leaf = rd(s, dir, "orders")
          .join(rd(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(rd(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_regionkey").cast("long").as("region"),
            col("n_name").as("nation"))
          .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
        // region share via a PARTITIONED window; grand total via a 1-row
        // broadcast aggregate — a global window would funnel every group
        // into one task (and trips the PlanAuditSpec gate), while the
        // scalar cross join costs one bounded exchange at any group count
        val wR = Window.partitionBy("region")
        val tot = leaf.agg(sum(col("cents")).as("total_cents"))
        leaf
          .withColumn("region_cents", sum(col("cents")).over(wR))
          .crossJoin(broadcast(tot))
          .select(col("region"), col("nation"),
            round(col("cents").cast("double") / 100.0, 2).as("revenue"),
            round(col("cents").cast("double") / col("region_cents"), 6)
              .as("share_of_region"),
            round(col("cents").cast("double") / col("total_cents"), 6)
              .as("share_of_total"))
      },
      Some("""WITH leaf AS (
             |  SELECT cast(n.n_regionkey AS BIGINT) AS region,
             |    n.n_name AS nation,
             |    sum(cast(round(o.o_totalprice * 100) AS BIGINT)) AS cents
             |  FROM orders o
             |  JOIN customer c ON c.c_custkey = o.o_custkey
             |  JOIN nation n ON n.n_nationkey = c.c_nationkey
             |  GROUP BY 1, 2)
             |SELECT region, nation,
             |  round(cast(cents AS double) / 100.0, 2) AS revenue,
             |  round(cast(cents AS double) /
             |    sum(cents) OVER (PARTITION BY region), 6) AS share_of_region,
             |  round(cast(cents AS double) / sum(cents) OVER (), 6)
             |    AS share_of_total
             |FROM leaf""".stripMargin)),

    // EXACT WEIGHTED MEDIAN per segment: the order price at which
    // cumulative QUANTITY-weighted mass crosses half — computed by a
    // cumulative-sum window over the per-(segment, price) pre-aggregate,
    // keeping the first crossing row. Weights are exact integral sums,
    // so the crossing row is bit-deterministic (no percentile
    // interpolation ambiguity). The pre-aggregate bounds the window
    // partition to distinct prices per segment, never raw lineitems.
    Q("weighted_median",
      (s, dir) => {
        val pre = rd(s, dir, "lineitem")
          .join(rd(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(rd(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"),
            round(col("l_extendedprice") * 100).cast("long").as("price_cents"))
          .agg(sum(col("l_quantity").cast("long")).as("w"))
        val wCum = Window.partitionBy("c_mktsegment").orderBy("price_cents")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wTot = Window.partitionBy("c_mktsegment")
        val ranked = pre
          .withColumn("cum_w", sum(col("w")).over(wCum))
          .withColumn("tot_w", sum(col("w")).over(wTot))
          .filter(col("cum_w") * 2 >= col("tot_w"))
        ranked.groupBy(col("c_mktsegment"))
          .agg(min(col("price_cents")).as("median_cents"),
            min(col("tot_w")).as("total_weight"))
          .select(col("c_mktsegment"),
            round(col("median_cents").cast("double") / 100.0, 2)
              .as("weighted_median_price"),
            col("total_weight"))
      },
      Some("""WITH pre AS (
             |  SELECT c.c_mktsegment,
             |    cast(round(l.l_extendedprice * 100) AS BIGINT) AS price_cents,
             |    sum(cast(l.l_quantity AS BIGINT)) AS w
             |  FROM lineitem l
             |  JOIN orders o ON o.o_orderkey = l.l_orderkey
             |  JOIN customer c ON c.c_custkey = o.o_custkey
             |  GROUP BY 1, 2),
             |ranked AS (
             |  SELECT c_mktsegment, price_cents,
             |    sum(w) OVER (PARTITION BY c_mktsegment ORDER BY price_cents
             |      ROWS UNBOUNDED PRECEDING) AS cum_w,
             |    sum(w) OVER (PARTITION BY c_mktsegment) AS tot_w
             |  FROM pre)
             |SELECT c_mktsegment,
             |  round(cast(min(price_cents) AS double) / 100.0, 2)
             |    AS weighted_median_price,
             |  cast(min(tot_w) AS BIGINT) AS total_weight
             |FROM ranked WHERE cum_w * 2 >= tot_w
             |GROUP BY 1""".stripMargin)),

    // POPULATION STABILITY INDEX — the ML-ops drift metric beside the
    // KL/JS monitors: Σ (p_cur − p_ref)·ln(p_cur/p_ref) over fixed value
    // bins, reference = 1996 orders, current = 1999 orders. Deterministic
    // fixed-width price bins (no quantile fitting), Laplace-smoothed
    // proportions from exact counts; the per-bin terms are also emitted
    // so the report shows WHICH bins drifted. ln() runs on identical
    // smoothed ratios in both engines and rounds at 6 dp.
    Q("psi_drift",
      (s, dir) => {
        def yearly(y: Int) = rd(s, dir, "orders")
          .filter(year(col("o_orderdate")) === y)
          .groupBy(least(floor(col("o_totalprice") / 50000), lit(9L))
            .cast("long").as("bin"))
          .agg(count(lit(1)).as("n"))
        val ref = yearly(1996).select(col("bin"), col("n").as("n_ref"))
        val cur = yearly(1999).select(col("bin"), col("n").as("n_cur"))
        val j = ref.join(cur, Seq("bin"), "full_outer")
          .select(col("bin"),
            coalesce(col("n_ref"), lit(0L)).as("n_ref"),
            coalesce(col("n_cur"), lit(0L)).as("n_cur"))
        val tot = j.agg(sum(col("n_ref")).as("t_ref"), sum(col("n_cur")).as("t_cur"))
        j.crossJoin(broadcast(tot))
          .select(col("bin"), col("n_ref"), col("n_cur"),
            round((((col("n_cur") + 1).cast("double") / (col("t_cur") + 10)) -
              ((col("n_ref") + 1).cast("double") / (col("t_ref") + 10))) *
              log(((col("n_cur") + 1).cast("double") / (col("t_cur") + 10)) /
                ((col("n_ref") + 1).cast("double") / (col("t_ref") + 10))), 6)
              .as("psi_term"))
      },
      Some("""WITH yr AS (
             |  SELECT year(o_orderdate) AS y,
             |    cast(least(floor(o_totalprice / 50000), 9) AS BIGINT) AS bin,
             |    cast(count(*) AS BIGINT) AS n
             |  FROM orders WHERE year(o_orderdate) IN (1996, 1999)
             |  GROUP BY 1, 2),
             |j AS (
             |  SELECT coalesce(r.bin, c.bin) AS bin,
             |    coalesce(r.n, 0) AS n_ref, coalesce(c.n, 0) AS n_cur
             |  FROM (SELECT bin, n FROM yr WHERE y = 1996) r
             |  FULL OUTER JOIN (SELECT bin, n FROM yr WHERE y = 1999) c
             |    ON c.bin = r.bin),
             |tot AS (
             |  SELECT sum(n_ref) AS t_ref, sum(n_cur) AS t_cur FROM j)
             |SELECT bin, n_ref, n_cur,
             |  round((cast(n_cur + 1 AS double) / (t_cur + 10) -
             |         cast(n_ref + 1 AS double) / (t_ref + 10)) *
             |    ln((cast(n_cur + 1 AS double) / (t_cur + 10)) /
             |       (cast(n_ref + 1 AS double) / (t_ref + 10))), 6) AS psi_term
             |FROM j, tot""".stripMargin))
  )
}
