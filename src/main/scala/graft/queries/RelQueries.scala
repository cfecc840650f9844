package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational-analytics operators over the TPC-H tables — the
  * warehouse-side query patterns (market basket, storage-layout
  * diagnostics, master-data survivorship) that sit NEXT to the Data Vault
  * in the same platform. Every query is oracle-checked like the rest of
  * the registry.
  */
object RelQueries {

  private def rd(s: SparkSession, dir: String, t: String): DataFrame =
    s.read.parquet(s"$dir/$t.parquet")

  /** the z-value bit-interleave over two 16-bit keys, as N explicit
    * codegen-able terms: Σ_b ((x>>b)&1)<<2b | ((y>>b)&1)<<(2b+1).
    * The SAME term list is rendered into the DuckDB oracle so both
    * engines compute bit-identical longs. */
  private def zVal(x: Column, y: Column): Column =
    (0 until 16).map { b =>
      shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b) +
        shiftleft(shiftright(y, b).bitwiseAND(lit(1L)), 2 * b + 1)
    }.reduce(_ + _)

  private def zValDuck(x: String, y: String): String =
    (0 until 16).map { b =>
      s"((($x >> $b) & 1) << ${2 * b}) + ((($y >> $b) & 1) << ${2 * b + 1})"
    }.mkString(" + ")

  val all: Seq[Q] = Seq(

    // MARKET-BASKET association rules over lineitem: part pairs bought in
    // the same order, with support / confidence / lift against the item
    // marginals. Scale shape: the pair blow-up is a self EQUI-join on
    // l_orderkey — fanout bounded by basket size (C(items,2) per order,
    // never cross-order), then one groupBy(pair) with map-side combine;
    // marginals and the order count are broadcast scalars. min-support 3
    // prunes the long tail before the final join.
    Q("basket_lift",
      (s, dir) => {
        // the deduped basket table feeds FOUR consumers (order count, both
        // sides of the pair self-join, the marginals) — materialize it once
        // (localCheckpoint) instead of re-scanning and re-deduping lineitem
        // per consumer (guide §1.2 / §5: reuse beats recompute; the frame
        // is O(distinct basket items), far smaller than raw lineitem)
        val li = rd(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey")).distinct()
          .localCheckpoint()
        val nOrders = li.select("l_orderkey").distinct().count()
        val marg = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("n_item"))
        val b = li.select(col("l_orderkey"), col("l_partkey").as("part_b"))
        val pairs = li.join(b, Seq("l_orderkey"))
          .filter(col("l_partkey") < col("part_b"))
          .groupBy(col("l_partkey").as("part_a"), col("part_b"))
          .agg(count(lit(1)).as("n_both"))
          .filter(col("n_both") >= 3)
        // marginals join WITHOUT a broadcast hint: the item dimension is
        // unbounded at catalog scale — keep it an equi-join and let AQE
        // broadcast when the filtered side is actually small
        pairs
          .join(marg.select(col("l_partkey").as("part_a"),
            col("n_item").as("n_a")), Seq("part_a"))
          .join(marg.select(col("l_partkey").as("part_b"),
            col("n_item").as("n_b")), Seq("part_b"))
          .select(col("part_a"), col("part_b"), col("n_both"), col("n_a"),
            col("n_b"),
            round(col("n_both").cast("double") / nOrders, 6).as("support"),
            round(col("n_both").cast("double") / col("n_a"), 6).as("confidence"),
            round(col("n_both").cast("double") * nOrders /
              (col("n_a") * col("n_b")), 4).as("lift"))
      },
      Some("""WITH li AS (
             |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM li),
             |marg AS (
             |  SELECT l_partkey, cast(count(*) AS BIGINT) AS n_item
             |  FROM li GROUP BY 1),
             |pairs AS (
             |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             |    cast(count(*) AS BIGINT) AS n_both
             |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
             |    AND a.l_partkey < b.l_partkey
             |  GROUP BY 1, 2 HAVING count(*) >= 3)
             |SELECT p.part_a, p.part_b, p.n_both,
             |  ma.n_item AS n_a, mb.n_item AS n_b,
             |  round(cast(p.n_both AS double) / n.n_orders, 6) AS support,
             |  round(cast(p.n_both AS double) / ma.n_item, 6) AS confidence,
             |  round(cast(p.n_both AS double) * n.n_orders
             |    / (ma.n_item * mb.n_item), 4) AS lift
             |FROM pairs p
             |JOIN marg ma ON ma.l_partkey = p.part_a
             |JOIN marg mb ON mb.l_partkey = p.part_b, n""".stripMargin)),

    // Z-ORDER LAYOUT DIAGNOSTIC: interleave two query dimensions
    // (customer key × price) into one z-value, bucket the table by the
    // top 5 z bits (32 would-be files), and emit each bucket's min/max
    // range on BOTH dimensions — the per-file stats a lake format's
    // skipping consults. Tight ranges on both dims in one layout is
    // exactly the property z-order clustering buys at 100 TB (a filter
    // on EITHER dim prunes most buckets; a single-column sort gives one
    // tight dim and one full-range dim). Pure projection + one bounded
    // groupBy; the interleave is 32 codegen'd bit terms, identical in
    // the oracle.
    Q("zorder_layout",
      (s, dir) => {
        val o = rd(s, dir, "orders").select(
          (col("o_custkey") % 65536L).as("x"),
          (floor(col("o_totalprice")).cast("long") % 65536L).as("y"))
        o.withColumn("z", zVal(col("x"), col("y")))
          .withColumn("bucket", shiftright(col("z"), 27))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_rows"),
            min(col("x")).as("min_x"), max(col("x")).as("max_x"),
            min(col("y")).as("min_y"), max(col("y")).as("max_y"))
      },
      Some(s"""WITH d AS (
              |  SELECT o_custkey % 65536 AS x,
              |    cast(floor(o_totalprice) AS BIGINT) % 65536 AS y
              |  FROM orders),
              |z AS (
              |  SELECT x, y, ${zValDuck("x", "y")} AS z FROM d)
              |SELECT z >> 27 AS bucket, cast(count(*) AS BIGINT) AS n_rows,
              |  min(x) AS min_x, max(x) AS max_x,
              |  min(y) AS min_y, max(y) AS max_y
              |FROM z GROUP BY 1""".stripMargin)),

    // TPC-H Q1 (pricing summary) — the canonical scan-heavy warehouse
    // aggregate: one filtered pass over lineitem, 4-group output. Money
    // sums run as exact DECIMAL chains (price × (1−disc) × (1+tax) stays
    // exact through precision growth, one cast to double at the end);
    // averages are rounded against sub-rounding double jitter. At 100 TB
    // this is pure map-side partial aggregation behind a pushed-down
    // date filter.
    Q("tpch_q1_pricing",
      (s, dir) => {
        val li = rd(s, dir, "lineitem")
          .filter(to_date(col("l_shipdate")) <= lit("1998-09-02").cast("date"))
        val qty = col("l_quantity").cast("decimal(18,2)")
        val price = col("l_extendedprice").cast("decimal(18,2)")
        val disc = (lit(1.0) - col("l_discount")).cast("decimal(8,4)")
        val tax = (lit(1.0) + col("l_tax")).cast("decimal(8,4)")
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(qty).cast("double").as("sum_qty"),
            sum(price).cast("double").as("sum_base_price"),
            sum(price * disc).cast("double").as("sum_disc_price"),
            sum(price * disc * tax).cast("double").as("sum_charge"),
            round(avg(col("l_quantity")), 4).as("avg_qty"),
            round(avg(col("l_extendedprice")), 4).as("avg_price"),
            round(avg(col("l_discount")), 6).as("avg_disc"),
            count(lit(1)).as("count_order"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  cast(sum(cast(l_quantity AS DECIMAL(18,2))) AS double) AS sum_qty,
             |  cast(sum(cast(l_extendedprice AS DECIMAL(18,2))) AS double)
             |    AS sum_base_price,
             |  cast(sum(cast(l_extendedprice AS DECIMAL(18,2))
             |    * cast(1.0 - l_discount AS DECIMAL(8,4))) AS double)
             |    AS sum_disc_price,
             |  cast(sum(cast(l_extendedprice AS DECIMAL(18,2))
             |    * cast(1.0 - l_discount AS DECIMAL(8,4))
             |    * cast(1.0 + l_tax AS DECIMAL(8,4))) AS double) AS sum_charge,
             |  round(avg(l_quantity), 4) AS avg_qty,
             |  round(avg(l_extendedprice), 4) AS avg_price,
             |  round(avg(l_discount), 6) AS avg_disc,
             |  cast(count(*) AS BIGINT) AS count_order
             |FROM lineitem
             |WHERE cast(l_shipdate AS DATE) <= DATE '1998-09-02'
             |GROUP BY 1, 2""".stripMargin)),

    // TPC-H Q3 (shipping-priority top-k) — the canonical 3-way join +
    // top-k: segment-filtered customers × date-filtered orders ×
    // ship-date-filtered lineitems, revenue per order, top 10. No
    // broadcast hints: at this SF AQE broadcasts the small sides, at
    // 100 TB the same plan shuffles on the join keys — both correct.
    // ORDER BY + LIMIT plans as TakeOrderedAndProject (per-partition
    // top-k + merge), never a global sort; ranking uses the ROUNDED
    // revenue with an order-key tiebreak so it is bit-deterministic.
    Q("tpch_q3_topk",
      (s, dir) => {
        val cutoff = lit("1998-03-15").cast("date")
        val c = rd(s, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        val o = rd(s, dir, "orders")
          .filter(to_date(col("o_orderdate")) < cutoff)
          .select(col("o_orderkey"), col("o_custkey"),
            to_date(col("o_orderdate")).as("o_orderdate"), col("o_orderpriority"))
        val l = rd(s, dir, "lineitem")
          .filter(to_date(col("l_shipdate")) > cutoff)
          .select(col("l_orderkey"),
            (col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1.0) - col("l_discount")).cast("decimal(8,4)")).as("rev"))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(round(sum(col("rev")).cast("double"), 2).as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey").asc)
          .limit(10)
      },
      Some("""SELECT o_orderkey, cast(o_orderdate AS DATE) AS o_orderdate,
             |  o_orderpriority,
             |  round(cast(sum(cast(l_extendedprice AS DECIMAL(18,2))
             |    * cast(1.0 - l_discount AS DECIMAL(8,4))) AS double), 2)
             |    AS revenue
             |FROM customer, orders, lineitem
             |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
             |  AND l_orderkey = o_orderkey
             |  AND cast(o_orderdate AS DATE) < DATE '1998-03-15'
             |  AND cast(l_shipdate AS DATE) > DATE '1998-03-15'
             |GROUP BY 1, 2, 3
             |ORDER BY revenue DESC, o_orderkey ASC LIMIT 10""".stripMargin)),

    // TPC-H Q5 (local-supplier volume) — the 6-table join tree: region →
    // nation → customer → orders → lineitem → supplier, with the
    // LOCAL-supplier constraint (c_nationkey = s_nationkey) closing the
    // cycle. Exercises join ordering and filter pushdown at depth:
    // region/date filters reach the scans, the small dimension chain
    // broadcasts under AQE, and the revenue rolls up as exact decimals.
    Q("tpch_q5_local_supplier",
      (s, dir) => {
        val region = rd(s, dir, "region").filter(col("r_name") === "ASIA")
          .select("r_regionkey")
        val nation = rd(s, dir, "nation")
          .select("n_nationkey", "n_name", "n_regionkey")
        val cust = rd(s, dir, "customer").select("c_custkey", "c_nationkey")
        val ord = rd(s, dir, "orders")
          .filter(to_date(col("o_orderdate")) >= lit("1996-01-01").cast("date") &&
            to_date(col("o_orderdate")) < lit("1998-01-01").cast("date"))
          .select("o_orderkey", "o_custkey")
        val li = rd(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"),
            (col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1.0) - col("l_discount")).cast("decimal(8,4)")).as("rev"))
        val supp = rd(s, dir, "supplier").select("s_suppkey", "s_nationkey")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(supp, col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(nation, col("s_nationkey") === col("n_nationkey"))
          .join(region, col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(round(sum(col("rev")).cast("double"), 2).as("revenue"),
            count(lit(1)).as("n_lineitems"))
      },
      Some("""SELECT n_name,
             |  round(cast(sum(cast(l_extendedprice AS DECIMAL(18,2))
             |    * cast(1.0 - l_discount AS DECIMAL(8,4))) AS double), 2)
             |    AS revenue,
             |  cast(count(*) AS BIGINT) AS n_lineitems
             |FROM region, nation, customer, orders, lineitem, supplier
             |WHERE r_name = 'ASIA' AND n_regionkey = r_regionkey
             |  AND c_nationkey = n_nationkey AND o_custkey = c_custkey
             |  AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
             |  AND s_nationkey = c_nationkey
             |  AND cast(o_orderdate AS DATE) >= DATE '1996-01-01'
             |  AND cast(o_orderdate AS DATE) < DATE '1998-01-01'
             |GROUP BY n_name""".stripMargin)),

    // CUBE ROLLUP with grouping_id: the OLAP subtotal lattice over
    // status × priority (15 cells + 3 + 5 + 1 grand total). The money
    // sum aggregates EXACTLY as DECIMAL(18,2) — double addition is
    // order-dependent across partitions and a 2e10-magnitude sum's
    // jitter would straddle cent rounding — then casts once to double.
    // Spark's partial-aggregating cube expands grouping sets map-side;
    // output is bounded by the dimension cardinalities.
    Q("rollup_cube",
      (s, dir) => rd(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("total_price"),
          grouping_id().as("gid")),
      Some("""SELECT o_orderstatus, o_orderpriority,
             |  cast(count(*) AS BIGINT) AS n_orders,
             |  cast(sum(cast(o_totalprice AS DECIMAL(18,2))) AS double)
             |    AS total_price,
             |  cast(grouping(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
             |FROM orders
             |GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin)),

    // BENFORD FIRST-DIGIT AUDIT on order totals — the forensic
    // data-quality check for fabricated or truncated monetary columns.
    // The first digit comes from the EXACT integer-cents string (never
    // floor∘log10, whose 1-ulp jitter flips digits at powers of ten);
    // expected frequencies are log10(1+1/d); χ² contributions per digit.
    // One stateless projection + one 9-group aggregate.
    Q("benford_check",
      (s, dir) => {
        val cents = round(col("o_totalprice") * 100).cast("long")
        val digit = substring(cents.cast("string"), 1, 1).cast("long")
        val byDigit = rd(s, dir, "orders")
          .select(digit.as("digit"))
          .groupBy("digit").agg(count(lit(1)).as("n_obs"))
        val tot = byDigit.agg(sum(col("n_obs")).as("n"))
        byDigit.crossJoin(broadcast(tot))
          .withColumn("p_expected",
            round(log(10.0, lit(1.0) + lit(1.0) / col("digit")), 6))
          .select(col("digit"), col("n_obs"),
            col("p_expected"),
            round(col("n") * col("p_expected"), 4).as("n_expected"),
            round((col("n_obs") - col("n") * col("p_expected")) *
              (col("n_obs") - col("n") * col("p_expected")) /
              (col("n") * col("p_expected")), 4).as("chi2_contrib"))
      },
      Some("""WITH d AS (
             |  SELECT cast(substr(cast(cast(round(o_totalprice * 100) AS BIGINT)
             |    AS VARCHAR), 1, 1) AS BIGINT) AS digit
             |  FROM orders),
             |byd AS (
             |  SELECT digit, cast(count(*) AS BIGINT) AS n_obs
             |  FROM d GROUP BY 1),
             |tot AS (SELECT cast(sum(n_obs) AS BIGINT) AS n FROM byd)
             |SELECT digit, n_obs,
             |  round(log10(1.0 + 1.0 / digit), 6) AS p_expected,
             |  round(n * round(log10(1.0 + 1.0 / digit), 6), 4) AS n_expected,
             |  round((n_obs - n * round(log10(1.0 + 1.0 / digit), 6))
             |    * (n_obs - n * round(log10(1.0 + 1.0 / digit), 6))
             |    / (n * round(log10(1.0 + 1.0 / digit), 6)), 4) AS chi2_contrib
             |FROM byd, tot""".stripMargin)),

    // GENERIC TABLE PROFILE (the dataset-card stats block): per-column
    // null count, distinct count, and min/max — ONE aggregate pass
    // emitting a struct per column, exploded to (column, stats) rows.
    // Doubles are excluded from min/max stringification (cross-engine
    // float formatting is not contract-stable); keys/strings/dates are.
    Q("table_profile",
      (s, dir) => {
        val o = rd(s, dir, "orders")
        val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
          "o_orderpriority")
        val agg = o.agg(count(lit(1)).as("n_rows"),
          array(cols.map(c => struct(
            lit(c).as("column_name"),
            sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
            countDistinct(col(c)).as("n_distinct"),
            min(col(c)).cast("string").as("min_value"),
            max(col(c)).cast("string").as("max_value"))): _*).as("profile"))
        agg.select(col("n_rows"), explode(col("profile")).as("p"))
          .select(col("p.column_name"), col("n_rows"), col("p.n_null"),
            col("p.n_distinct"), col("p.min_value"), col("p.max_value"))
      },
      Some("""WITH n AS (SELECT cast(count(*) AS BIGINT) AS n_rows FROM orders)
             |SELECT 'o_orderkey' AS column_name, n.n_rows,
             |  (SELECT cast(count(*) AS BIGINT) FROM orders
             |   WHERE o_orderkey IS NULL) AS n_null,
             |  (SELECT cast(count(DISTINCT o_orderkey) AS BIGINT) FROM orders)
             |    AS n_distinct,
             |  (SELECT cast(min(o_orderkey) AS VARCHAR) FROM orders) AS min_value,
             |  (SELECT cast(max(o_orderkey) AS VARCHAR) FROM orders) AS max_value
             |FROM n
             |UNION ALL SELECT 'o_custkey', n.n_rows,
             |  (SELECT cast(count(*) AS BIGINT) FROM orders WHERE o_custkey IS NULL),
             |  (SELECT cast(count(DISTINCT o_custkey) AS BIGINT) FROM orders),
             |  (SELECT cast(min(o_custkey) AS VARCHAR) FROM orders),
             |  (SELECT cast(max(o_custkey) AS VARCHAR) FROM orders) FROM n
             |UNION ALL SELECT 'o_orderstatus', n.n_rows,
             |  (SELECT cast(count(*) AS BIGINT) FROM orders
             |   WHERE o_orderstatus IS NULL),
             |  (SELECT cast(count(DISTINCT o_orderstatus) AS BIGINT) FROM orders),
             |  (SELECT min(o_orderstatus) FROM orders),
             |  (SELECT max(o_orderstatus) FROM orders) FROM n
             |UNION ALL SELECT 'o_orderpriority', n.n_rows,
             |  (SELECT cast(count(*) AS BIGINT) FROM orders
             |   WHERE o_orderpriority IS NULL),
             |  (SELECT cast(count(DISTINCT o_orderpriority) AS BIGINT) FROM orders),
             |  (SELECT min(o_orderpriority) FROM orders),
             |  (SELECT max(o_orderpriority) FROM orders) FROM n""".stripMargin)),

    // CROSS-DATASET ENRICHMENT: event-stream purchases joined to the
    // warehouse's customer dimension (user_id ⋈ c_custkey) and rolled up
    // by market segment — the join that connects the behavioral and
    // relational worlds in one plan. Exact-cent money; one equi-join +
    // one bounded groupBy. The left join keeps purchases from users
    // OUTSIDE the dimension visible under segment 'UNKNOWN' instead of
    // silently dropping revenue.
    Q("event_customer_enrichment",
      (s, dir) => {
        val p = s.read.parquet(s"$dir/events.parquet")
          .filter(col("event_type") === "purchase")
          .select(col("user_id"),
            round(col("value") * 100).cast("long").as("cents"))
        val c = rd(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))
        p.join(c, p("user_id") === c("c_custkey"), "left")
          .groupBy(coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"))
          .agg(count(lit(1)).as("n_purchases"),
            countDistinct(col("user_id")).as("n_buyers"),
            round(sum(col("cents")).cast("double") / 100.0, 2).as("revenue"))
      },
      Some("""SELECT coalesce(c.c_mktsegment, 'UNKNOWN') AS segment,
             |  cast(count(*) AS BIGINT) AS n_purchases,
             |  cast(count(DISTINCT e.user_id) AS BIGINT) AS n_buyers,
             |  round(cast(sum(cast(round(e.value * 100) AS BIGINT)) AS double)
             |    / 100.0, 2) AS revenue
             |FROM events e LEFT JOIN customer c ON c.c_custkey = e.user_id
             |WHERE e.event_type = 'purchase'
             |GROUP BY 1""".stripMargin)),

    // FILTER-PUSHDOWN PROOF, driver-gated: the predicate and the 2-column
    // projection must reach the parquet scan — PushedFilters carries the
    // range predicate and ReadSchema is exactly the 2 columns — and both
    // facts are EMITTED AS COLUMNS the oracle pins to true (the
    // scan-efficiency analogue of bucketed_join_zero_shuffle: at 100 TB
    // an unpushed filter is a full-corpus read). The data result rides
    // along so the proof can't pass on a wrong plan shape.
    Q("filter_pushdown_proof",
      (s, dir) => {
        import s.implicits._
        val q = rd(s, dir, "orders")
          .filter(col("o_orderkey") > 1000L && col("o_orderkey") <= 2000L)
          .select(col("o_orderkey"), col("o_totalprice"))
        val plan = q.queryExecution.executedPlan.toString
        val scanLine = plan.linesIterator
          .find(_.contains("PushedFilters")).getOrElse("")
        val pushed = scanLine.contains("GreaterThan(o_orderkey,1000)") &&
          scanLine.contains("LessThanOrEqual(o_orderkey,2000)")
        val readSchema = plan.linesIterator
          .find(_.contains("ReadSchema")).getOrElse("")
        val pruned = readSchema.contains("o_orderkey") &&
          readSchema.contains("o_totalprice") &&
          !readSchema.contains("o_orderdate") && !readSchema.contains("o_custkey")
        val agg = q.agg(count(lit(1)).as("n_rows"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"))
        agg.withColumn("filter_pushed", lit(pushed))
          .withColumn("columns_pruned", lit(pruned))
      },
      Some("""SELECT cast(count(*) AS BIGINT) AS n_rows,
             |  cast(sum(cast(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |    AS total_cents,
             |  TRUE AS filter_pushed, TRUE AS columns_pruned
             |FROM orders
             |WHERE o_orderkey > 1000 AND o_orderkey <= 2000""".stripMargin)),

    // GENERIC DATA-QUALITY EXPECTATIONS (quality.Expectations): rules as
    // data over `orders` — null keys, status domain, price range, date
    // sanity, key uniqueness (with one violation INJECTED by unioning a
    // duplicated row, so the red path is exercised, not just asserted
    // green). All row-scan rules fold into ONE aggregate pass.
    Q("expectations_report",
      (s, dir) => {
        import graft.quality.Expectations._
        val o = rd(s, dir, "orders")
        val withDup = o.unionByName(o.filter(col("o_orderkey") === 1L))
        report(withDup, Seq(
          NotNull("o_orderkey"),
          NotNull("o_custkey"),
          AcceptedValues("o_orderstatus", Seq("F", "O", "P")),
          Holds("price_positive", "o_totalprice > 0"),
          Holds("date_in_window",
            "o_orderdate >= timestamp '1995-01-01 00:00:00'"),
          Unique(Seq("o_orderkey"))))
      },
      Some("""WITH t AS (
             |  SELECT * FROM orders
             |  UNION ALL SELECT * FROM orders WHERE o_orderkey = 1),
             |n AS (SELECT cast(count(*) AS BIGINT) AS n_rows FROM t),
             |dups AS (
             |  SELECT cast(coalesce(sum(c), 0) AS BIGINT) AS d FROM (
             |    SELECT count(*) AS c FROM t GROUP BY o_orderkey
             |    HAVING count(*) > 1))
             |SELECT 'not_null:o_orderkey' AS rule, n.n_rows,
             |  (SELECT cast(count(*) AS BIGINT) FROM t WHERE o_orderkey IS NULL)
             |    AS n_violations,
             |  (SELECT count(*) FROM t WHERE o_orderkey IS NULL) = 0 AS passed
             |FROM n
             |UNION ALL SELECT 'not_null:o_custkey', n.n_rows,
             |  (SELECT cast(count(*) AS BIGINT) FROM t WHERE o_custkey IS NULL),
             |  (SELECT count(*) FROM t WHERE o_custkey IS NULL) = 0 FROM n
             |UNION ALL SELECT 'accepted_values:o_orderstatus', n.n_rows,
             |  (SELECT cast(count(*) AS BIGINT) FROM t
             |   WHERE o_orderstatus NOT IN ('F', 'O', 'P')),
             |  (SELECT count(*) FROM t
             |   WHERE o_orderstatus NOT IN ('F', 'O', 'P')) = 0 FROM n
             |UNION ALL SELECT 'price_positive', n.n_rows,
             |  (SELECT cast(count(*) AS BIGINT) FROM t
             |   WHERE NOT coalesce(o_totalprice > 0, FALSE)),
             |  (SELECT count(*) FROM t
             |   WHERE NOT coalesce(o_totalprice > 0, FALSE)) = 0 FROM n
             |UNION ALL SELECT 'date_in_window', n.n_rows,
             |  (SELECT cast(count(*) AS BIGINT) FROM t
             |   WHERE NOT coalesce(o_orderdate >= TIMESTAMP '1995-01-01', FALSE)),
             |  (SELECT count(*) FROM t
             |   WHERE NOT coalesce(o_orderdate >= TIMESTAMP '1995-01-01', FALSE)) = 0
             |FROM n
             |UNION ALL SELECT 'unique:o_orderkey', n.n_rows, dups.d, dups.d = 0
             |FROM n, dups""".stripMargin)),

    // DECLARATIVE METRICS LAYER (meta.Metrics): three metric definitions
    // — revenue (filtered sum of exact cents), orders (count), and the
    // AOV ratio composed from both — compiled to plans and evaluated at
    // the o_orderpriority grain. The definitions are DATA; each compiles
    // to one partial-aggregating groupBy, the ratio to one grain join.
    Q("metric_layer",
      (s, dir) => {
        import graft.meta.Metrics
        import graft.meta.Metrics.MetricDef
        val revenue = MetricDef("revenue_cents", Metrics.Sum,
          "cast(round(o_totalprice * 100) AS BIGINT)",
          filter = Some("o_orderstatus <> 'F'"),
          dims = Seq("o_orderpriority"))
        val nOrders = MetricDef("n_orders", Metrics.Count, "o_orderkey",
          filter = Some("o_orderstatus <> 'F'"),
          dims = Seq("o_orderpriority"))
        Metrics.ratio(rd(s, dir, "orders"), "aov_cents",
            revenue, nOrders, by = Seq("o_orderpriority"), scale = 4)
      },
      Some("""SELECT o_orderpriority,
             |  cast(sum(CASE WHEN o_orderstatus <> 'F'
             |    THEN cast(round(o_totalprice * 100) AS BIGINT) END) AS BIGINT)
             |    AS revenue_cents,
             |  cast(count(CASE WHEN o_orderstatus <> 'F'
             |    THEN o_orderkey END) AS BIGINT) AS n_orders,
             |  round(cast(sum(CASE WHEN o_orderstatus <> 'F'
             |      THEN cast(round(o_totalprice * 100) AS BIGINT) END) AS double)
             |    / count(CASE WHEN o_orderstatus <> 'F' THEN o_orderkey END), 4)
             |    AS aov_cents
             |FROM orders GROUP BY 1""".stripMargin)),

    // K-ANONYMITY AUDIT: group the table by its quasi-identifiers
    // (segment × nation) and flag equivalence classes smaller than k=5 —
    // the re-identification check a privacy review runs before a dataset
    // leaves the house. One groupBy to the bounded class table; corpus
    // totals ride back on a broadcast.
    Q("k_anonymity",
      (s, dir) => {
        val k = 5
        val g = rd(s, dir, "customer")
          .groupBy(col("c_mktsegment"), col("c_nationkey"))
          .agg(count(lit(1)).as("group_size"))
        val tot = g.agg(
          sum(col("group_size")).as("n_total"),
          sum(when(col("group_size") < k, col("group_size")).otherwise(0L))
            .as("n_at_risk"))
        g.crossJoin(broadcast(tot))
          .select(col("c_mktsegment"), col("c_nationkey"), col("group_size"),
            (col("group_size") < k).as("at_risk"),
            round(col("n_at_risk").cast("double") / col("n_total"), 6)
              .as("frac_at_risk"))
      },
      Some("""WITH g AS (
             |  SELECT c_mktsegment, c_nationkey,
             |    cast(count(*) AS BIGINT) AS group_size
             |  FROM customer GROUP BY 1, 2),
             |tot AS (
             |  SELECT cast(sum(group_size) AS BIGINT) AS n_total,
             |    cast(sum(CASE WHEN group_size < 5 THEN group_size ELSE 0 END)
             |      AS BIGINT) AS n_at_risk
             |  FROM g)
             |SELECT g.c_mktsegment, g.c_nationkey, g.group_size,
             |  g.group_size < 5 AS at_risk,
             |  round(cast(t.n_at_risk AS double) / t.n_total, 6) AS frac_at_risk
             |FROM g, tot t""".stripMargin)),

    // TPC-H Q18 (large-volume customers): aggregate-HAVING as a join
    // filter — orders whose total lineitem quantity clears a threshold,
    // joined back to customer, top 10 by value. The HAVING side reduces
    // BEFORE joining (map-side combinable groupBy on the fact table),
    // so the join input is the filtered order set, not the fact table.
    Q("tpch_q18_topk",
      (s, dir) => {
        val big = rd(s, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(round(sum(col("l_quantity")), 2).as("sum_qty"))
          .filter(col("sum_qty") > 212.0)
        val o = rd(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            to_date(col("o_orderdate")).as("o_orderdate"), col("o_totalprice"))
        val c = rd(s, dir, "customer").select(col("c_custkey"), col("c_name"))
        big.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            col("o_orderdate"), round(col("o_totalprice"), 2).as("o_totalprice"),
            col("sum_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(10)
      },
      Some("""WITH big AS (
             |  SELECT l_orderkey, round(sum(l_quantity), 2) AS sum_qty
             |  FROM lineitem GROUP BY 1 HAVING round(sum(l_quantity), 2) > 212.0)
             |SELECT c_name, c_custkey, o_orderkey,
             |  cast(o_orderdate AS DATE) AS o_orderdate,
             |  round(o_totalprice, 2) AS o_totalprice, sum_qty
             |FROM big
             |JOIN orders ON o_orderkey = l_orderkey
             |JOIN customer ON c_custkey = o_custkey
             |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin)),

    // GOLDEN-RECORD SURVIVORSHIP (master data management): two source
    // systems disagree on the customer — source 1 carries the
    // authoritative name but no segment, source 2 a segment but a stale
    // balance. Field-level survivorship picks, PER FIELD, the value from
    // the highest-priority source that has one: min(struct(priority,
    // field)) over non-null fields — one groupBy, no window, map-side
    // combinable, the same shape at any scale. (The two variants are
    // derived deterministically from `customer` so the oracle can state
    // the expected golden record in closed form.)
    Q("golden_record",
      (s, dir) => {
        val c = rd(s, dir, "customer")
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"), col("c_acctbal"))
        val src1 = c.select(col("c_custkey"), lit(1L).as("prio"),
          upper(col("c_name")).as("name"),
          lit(null).cast("string").as("segment"),
          col("c_acctbal").as("acctbal"))
        val src2 = c.select(col("c_custkey"), lit(2L).as("prio"),
          lit(null).cast("string").as("name"),
          col("c_mktsegment").as("segment"),
          round(col("c_acctbal") + 100.0, 2).as("acctbal"))
        def survive(f: String): Column =
          min(when(col(f).isNotNull, struct(col("prio"), col(f).as("v"))))
            .getField("v").as(f)
        src1.unionByName(src2)
          .groupBy("c_custkey")
          .agg(survive("name"), survive("segment"), survive("acctbal"),
            count(when(col("name").isNotNull, 1)).as("n_name_sources"))
      },
      Some("""SELECT c_custkey, upper(c_name) AS name, c_mktsegment AS segment,
             |  c_acctbal AS acctbal, cast(1 AS BIGINT) AS n_name_sources
             |FROM customer""".stripMargin)),

    // TPC-H Q4 (order priority checking, adapted to this schema's
    // columns: "late" = shipped more than 60 days after ordering):
    // the EXISTS subquery decorrelates to a LEFT SEMI hash join —
    // lineitem is touched once, never per order. Exact-count semantics
    // (an order with five late lines counts once).
    Q("tpch_q4_priority",
      (s, dir) => {
        val late = rd(s, dir, "lineitem")
          .join(rd(s, dir, "orders"),
            col("l_orderkey") === col("o_orderkey"))
          .filter(to_date(col("l_shipdate")) >
            date_add(to_date(col("o_orderdate")), 60))
          .select(col("l_orderkey")).distinct()
        rd(s, dir, "orders")
          .join(late, col("o_orderkey") === col("l_orderkey"), "leftsemi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
      },
      Some("""SELECT o_orderpriority,
             |  cast(count(*) AS BIGINT) AS order_count
             |FROM orders o
             |WHERE EXISTS (
             |  SELECT 1 FROM lineitem l
             |  WHERE l.l_orderkey = o.o_orderkey
             |    AND cast(l.l_shipdate AS DATE) >
             |        cast(o.o_orderdate AS DATE) + 60)
             |GROUP BY 1""".stripMargin)),

    // TPC-H Q10 (returned-item reporting): revenue lost to returns per
    // customer, top 20 — the canonical 4-table star join ending in a
    // TakeOrdered top-k, exact decimal-cents arithmetic for the money.
    Q("tpch_q10_returns",
      (s, dir) => {
        rd(s, dir, "lineitem")
          .filter(col("l_returnflag") === "R")
          .join(rd(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(rd(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(rd(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
          .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * 100).cast("long")).as("rev_cents"))
          .select(col("c_custkey"), col("c_name"), col("n_name"),
            round(col("rev_cents").cast("double") / 100.0, 2).as("revenue"))
          .orderBy(col("rev_cents").desc, col("c_custkey"))
          .limit(20)
      },
      Some("""SELECT c.c_custkey, c.c_name, n.n_name,
             |  round(cast(sum(cast(round(l.l_extendedprice * (1.0 - l.l_discount)
             |    * 100) AS BIGINT)) AS double) / 100.0, 2) AS revenue
             |FROM lineitem l
             |JOIN orders o ON o.o_orderkey = l.l_orderkey
             |JOIN customer c ON c.c_custkey = o.o_custkey
             |JOIN nation n ON n.n_nationkey = c.c_nationkey
             |WHERE l.l_returnflag = 'R'
             |GROUP BY 1, 2, 3
             |ORDER BY sum(cast(round(l.l_extendedprice * (1.0 - l.l_discount)
             |  * 100) AS BIGINT)) DESC, c.c_custkey
             |LIMIT 20""".stripMargin)),

    // TPC-H Q14 (promotion effect): share of revenue from PROMO parts —
    // one join, one conditional aggregate, exact cents; the classic
    // numerator/denominator-in-one-pass shape (never two scans).
    Q("tpch_q14_promo",
      (s, dir) => {
        rd(s, dir, "lineitem")
          .join(rd(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .select((col("p_type") === "PROMO").as("is_promo"),
            round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
              .cast("long").as("cents"))
          .agg(
            round(sum(when(col("is_promo"), col("cents")).otherwise(0L))
              .cast("double") * 100.0 / sum(col("cents")), 4).as("promo_revenue_pct"),
            round(sum(col("cents")).cast("double") / 100.0, 2).as("total_revenue"))
      },
      Some("""SELECT
             |  round(cast(sum(CASE WHEN p.p_type = 'PROMO'
             |      THEN cast(round(l.l_extendedprice * (1.0 - l.l_discount) * 100)
             |        AS BIGINT) ELSE 0 END) AS double) * 100.0 /
             |    sum(cast(round(l.l_extendedprice * (1.0 - l.l_discount) * 100)
             |      AS BIGINT)), 4) AS promo_revenue_pct,
             |  round(cast(sum(cast(round(l.l_extendedprice * (1.0 - l.l_discount)
             |    * 100) AS BIGINT)) AS double) / 100.0, 2) AS total_revenue
             |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey""".stripMargin))
  )
}
