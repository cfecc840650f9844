package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The rest of the TPC-H suite (Q1/Q3/Q4/Q5/Q10/Q14/Q18 live in
  * RelQueries) — completing all 22 query *shapes* over the driver's
  * TPC-H-ish tables. The testdata schema is reduced (no partsupp table;
  * lineitem lacks shipmode/commitdate/receiptdate; customer lacks phone;
  * part lacks container/mfgr), so queries touching those columns are
  * ADAPTED: same plan shape, same operator semantics (correlated
  * EXISTS/NOT EXISTS, scalar-subquery thresholds, min-per-group
  * join-back, left-join-count distributions), with the missing column
  * replaced by a derivable stand-in, documented per query.
  *
  * Money arithmetic follows the suite convention (RelQueries Q10/Q14):
  * per-row cents = round(price·factor·100) as BIGINT, summed exactly —
  * double summation is partition-order-dependent and its jitter would
  * straddle cent rounding at warehouse magnitudes; one cast to double at
  * the very end. Quantity averages divide an exact integral-double sum
  * by an exact count, so threshold comparisons are bit-deterministic in
  * both engines.
  */
object TpchQueries {

  private def rd(s: SparkSession, dir: String, t: String): DataFrame =
    s.read.parquet(s"$dir/$t.parquet")

  /** exact money: per-row cents as BIGINT (see file doc). */
  private def cents(c: Column): Column = round(c * 100).cast("long")

  private def revCents: Column =
    cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))

  /** sum of cents → rounded double money column. */
  private def money(c: Column): Column =
    round(sum(c).cast("double") / 100.0, 2)

  val all: Seq[Q] = Seq(

    // TPC-H Q2 (minimum-cost supplier), adapted: there is no partsupp
    // table, so the (part, supplier) cost relation is derived from
    // lineitem as min observed unit price — cost(p,s) = min round(100 ·
    // extendedprice/quantity). Shape preserved: build the cost relation,
    // take the per-part MIN over suppliers in one region (EUROPE), keep
    // the (part, supplier) rows achieving it, join supplier/nation
    // dimensions, top-100 by account balance. The per-part min is a
    // groupBy + join-back (two shuffles on p_partkey, no window sort);
    // at 100 TB the cost relation aggregates map-side first.
    Q("tpch_q2_min_cost",
      (s, dir) => {
        val part = rd(s, dir, "part")
          .filter(col("p_size") === 15 && col("p_type") === "STANDARD")
          .select("p_partkey", "p_name")
        val supp = rd(s, dir, "supplier")
          .join(broadcast(rd(s, dir, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(rd(s, dir, "region")
            .filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
            col("n_name"))
        val cost = rd(s, dir, "lineitem")
          .join(part, col("l_partkey") === col("p_partkey"))
          .join(supp, col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("p_partkey"), col("p_name"), col("s_suppkey"),
            col("s_name"), col("s_acctbal"), col("n_name"))
          .agg(min(cents(col("l_extendedprice") / col("l_quantity")))
            .as("unit_cost_cents"))
        val best = cost.groupBy(col("p_partkey").as("bp"))
          .agg(min(col("unit_cost_cents")).as("best_cents"))
        cost.join(best, col("p_partkey") === col("bp") &&
            col("unit_cost_cents") === col("best_cents"))
          .select(col("s_acctbal"), col("s_name"), col("n_name"),
            col("p_partkey"), col("p_name"),
            round(col("unit_cost_cents").cast("double") / 100.0, 2)
              .as("unit_cost"))
          .orderBy(col("s_acctbal").desc, col("s_name"), col("p_partkey"))
          .limit(100)
      },
      Some("""WITH cost AS (
             |  SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name,
             |    s.s_acctbal, n.n_name,
             |    min(cast(round(l.l_extendedprice / l.l_quantity * 100)
             |      AS BIGINT)) AS unit_cost_cents
             |  FROM lineitem l
             |  JOIN part p ON p.p_partkey = l.l_partkey
             |    AND p.p_size = 15 AND p.p_type = 'STANDARD'
             |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
             |  JOIN nation n ON n.n_nationkey = s.s_nationkey
             |  JOIN region r ON r.r_regionkey = n.n_regionkey
             |    AND r.r_name = 'EUROPE'
             |  GROUP BY 1, 2, 3, 4, 5, 6)
             |SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
             |  round(cast(unit_cost_cents AS double) / 100.0, 2) AS unit_cost
             |FROM cost c
             |WHERE unit_cost_cents = (
             |  SELECT min(unit_cost_cents) FROM cost c2
             |  WHERE c2.p_partkey = c.p_partkey)
             |ORDER BY s_acctbal DESC, s_name, p_partkey
             |LIMIT 100""".stripMargin)),

    // TPC-H Q6 (forecasting revenue change) — faithful: the pure
    // scan-and-aggregate with three pushed-down range predicates and NO
    // join. At 100 TB this is the predicate-pushdown showcase: every
    // filter reaches the parquet scan (row-group min/max skipping on
    // l_shipdate), and the aggregate is one map-side partial + a 1-row
    // exchange.
    Q("tpch_q6_forecast",
      (s, dir) => {
        rd(s, dir, "lineitem")
          .filter(to_date(col("l_shipdate")) >= lit("1996-01-01").cast("date") &&
            to_date(col("l_shipdate")) < lit("1997-01-01").cast("date") &&
            col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
            col("l_quantity") < 24)
          .agg(money(cents(col("l_extendedprice") * col("l_discount")))
            .as("revenue"),
            count(lit(1)).as("n_lines"))
      },
      Some("""SELECT
             |  round(cast(sum(cast(round(l_extendedprice * l_discount * 100)
             |    AS BIGINT)) AS double) / 100.0, 2) AS revenue,
             |  cast(count(*) AS BIGINT) AS n_lines
             |FROM lineitem
             |WHERE cast(l_shipdate AS DATE) >= DATE '1996-01-01'
             |  AND cast(l_shipdate AS DATE) < DATE '1997-01-01'
             |  AND l_discount >= 0.05 AND l_discount <= 0.07
             |  AND l_quantity < 24""".stripMargin)),

    // TPC-H Q7 (volume shipping) — faithful: bilateral trade between two
    // nations by ship year. The two nation dimensions are pre-filtered
    // BEFORE joining (either endpoint nation) so the fact join fans in,
    // then the pair constraint keeps only the two directed combinations
    // — the reference's (n1, n2) OR predicate, pushed as far down as it
    // can go. Nation joins broadcast; the only shuffles are the
    // fact-fact equi-joins.
    Q("tpch_q7_volume",
      (s, dir) => {
        val nat = rd(s, dir, "nation")
          .filter(col("n_name").isin("NATION_1", "NATION_2"))
        val supp = rd(s, dir, "supplier")
          .join(broadcast(nat.select(col("n_nationkey"),
            col("n_name").as("supp_nation"))),
            col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey", "supp_nation")
        val cust = rd(s, dir, "customer")
          .join(broadcast(nat.select(col("n_nationkey").as("nk2"),
            col("n_name").as("cust_nation"))),
            col("c_nationkey") === col("nk2"))
          .select("c_custkey", "cust_nation")
        rd(s, dir, "lineitem")
          .filter(to_date(col("l_shipdate")) >= lit("1996-01-01").cast("date") &&
            to_date(col("l_shipdate")) <= lit("1997-12-31").cast("date"))
          .join(rd(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(supp, col("l_suppkey") === col("s_suppkey"))
          .filter(col("supp_nation") =!= col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg(money(revCents).as("revenue"), count(lit(1)).as("n_lines"))
      },
      Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             |  year(l.l_shipdate) AS l_year,
             |  round(cast(sum(cast(round(l.l_extendedprice * (1.0 - l.l_discount)
             |    * 100) AS BIGINT)) AS double) / 100.0, 2) AS revenue,
             |  cast(count(*) AS BIGINT) AS n_lines
             |FROM lineitem l
             |JOIN orders o ON o.o_orderkey = l.l_orderkey
             |JOIN customer c ON c.c_custkey = o.o_custkey
             |JOIN supplier s ON s.s_suppkey = l.l_suppkey
             |JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
             |JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
             |WHERE n1.n_name IN ('NATION_1', 'NATION_2')
             |  AND n2.n_name IN ('NATION_1', 'NATION_2')
             |  AND n1.n_name <> n2.n_name
             |  AND cast(l.l_shipdate AS DATE) >= DATE '1996-01-01'
             |  AND cast(l.l_shipdate AS DATE) <= DATE '1997-12-31'
             |GROUP BY 1, 2, 3""".stripMargin)),

    // TPC-H Q8 (national market share) — faithful: of all PROMO-part
    // revenue sold into EUROPE customers by anyone, what share came from
    // NATION_5 suppliers, per order year. The share is a conditional
    // aggregate over one joined stream (numerator and denominator in a
    // single pass, never two scans). Exact cents for both sums; the
    // division happens once per year-group at the end.
    Q("tpch_q8_market_share",
      (s, dir) => {
        val part = rd(s, dir, "part").filter(col("p_type") === "PROMO")
          .select("p_partkey")
        val custEu = rd(s, dir, "customer")
          .join(broadcast(rd(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(rd(s, dir, "region")
            .filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select("c_custkey")
        val supp = rd(s, dir, "supplier")
          .join(broadcast(rd(s, dir, "nation")
            .select(col("n_nationkey").as("snk"), col("n_name"))),
            col("s_nationkey") === col("snk"))
          .select(col("s_suppkey"), col("n_name").as("supp_nation"))
        rd(s, dir, "lineitem")
          .join(part, col("l_partkey") === col("p_partkey"), "leftsemi")
          .join(rd(s, dir, "orders")
            .filter(to_date(col("o_orderdate")) >= lit("1996-01-01").cast("date") &&
              to_date(col("o_orderdate")) <= lit("1997-12-31").cast("date")),
            col("l_orderkey") === col("o_orderkey"))
          .join(custEu, col("o_custkey") === col("c_custkey"), "leftsemi")
          .join(supp, col("l_suppkey") === col("s_suppkey"))
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg(
            round(sum(when(col("supp_nation") === "NATION_5", revCents)
              .otherwise(0L)).cast("double") /
              sum(revCents).cast("double"), 6).as("mkt_share"),
            money(revCents).as("total_revenue"))
      },
      Some("""SELECT year(o.o_orderdate) AS o_year,
             |  round(cast(sum(CASE WHEN n1.n_name = 'NATION_5'
             |      THEN cast(round(l.l_extendedprice * (1.0 - l.l_discount)
             |        * 100) AS BIGINT) ELSE 0 END) AS double) /
             |    cast(sum(cast(round(l.l_extendedprice * (1.0 - l.l_discount)
             |      * 100) AS BIGINT)) AS double), 6) AS mkt_share,
             |  round(cast(sum(cast(round(l.l_extendedprice * (1.0 - l.l_discount)
             |    * 100) AS BIGINT)) AS double) / 100.0, 2) AS total_revenue
             |FROM lineitem l
             |JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'PROMO'
             |JOIN orders o ON o.o_orderkey = l.l_orderkey
             |JOIN customer c ON c.c_custkey = o.o_custkey
             |JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
             |JOIN region r ON r.r_regionkey = n2.n_regionkey
             |  AND r.r_name = 'EUROPE'
             |JOIN supplier s ON s.s_suppkey = l.l_suppkey
             |JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
             |WHERE cast(o.o_orderdate AS DATE) >= DATE '1996-01-01'
             |  AND cast(o.o_orderdate AS DATE) <= DATE '1997-12-31'
             |GROUP BY 1""".stripMargin)),

    // TPC-H Q9 (product-type profit), adapted: no partsupp, so supply
    // cost is derived from the part dimension — cost(line) = 60% of
    // p_retailprice · quantity (a fixed margin stand-in for
    // ps_supplycost). Shape preserved: name-pattern part filter
    // ('%red%'), 5-table join, profit = revenue − cost grouped by
    // supplier nation × order year. Profit can go negative — exact cents
    // keep the sign stable.
    Q("tpch_q9_profit",
      (s, dir) => {
        val part = rd(s, dir, "part").filter(col("p_name").like("%red%"))
          .select("p_partkey", "p_retailprice")
        val supp = rd(s, dir, "supplier")
          .join(broadcast(rd(s, dir, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("nation"))
        rd(s, dir, "lineitem")
          .join(part, col("l_partkey") === col("p_partkey"))
          .join(supp, col("l_suppkey") === col("s_suppkey"))
          .join(rd(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("nation"), year(col("o_orderdate")).as("o_year"))
          .agg(money(revCents -
            cents(col("p_retailprice") * lit(0.6) * col("l_quantity")))
            .as("sum_profit"))
      },
      Some("""SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
             |  round(cast(sum(
             |    cast(round(l.l_extendedprice * (1.0 - l.l_discount) * 100)
             |      AS BIGINT) -
             |    cast(round(p.p_retailprice * 0.6 * l.l_quantity * 100)
             |      AS BIGINT)) AS double) / 100.0, 2) AS sum_profit
             |FROM lineitem l
             |JOIN part p ON p.p_partkey = l.l_partkey
             |  AND p.p_name LIKE '%red%'
             |JOIN supplier s ON s.s_suppkey = l.l_suppkey
             |JOIN nation n ON n.n_nationkey = s.s_nationkey
             |JOIN orders o ON o.o_orderkey = l.l_orderkey
             |GROUP BY 1, 2""".stripMargin)),

    // TPC-H Q11 (important stock), adapted: no partsupp, so "stock
    // value" per part is what NATION_3's suppliers actually shipped —
    // sum(quantity · retailprice) from lineitem. Shape preserved: the
    // scalar-subquery threshold (parts whose value exceeds 0.05% of the
    // TOTAL value) — the grouped aggregate is computed once and reused
    // for both sides via a 1-row cross join (Spark reuses the exchange;
    // never two scans of the fact).
    Q("tpch_q11_important_stock",
      (s, dir) => {
        val supp = rd(s, dir, "supplier")
          .join(broadcast(rd(s, dir, "nation")
            .filter(col("n_name") === "NATION_3")),
            col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey")
        val value = rd(s, dir, "lineitem")
          .join(supp, col("l_suppkey") === col("s_suppkey"), "leftsemi")
          .join(rd(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_partkey"))
          .agg(sum(cents(col("p_retailprice") * col("l_quantity")))
            .as("value_cents"))
        val total = value.agg(sum(col("value_cents")).as("total_cents"))
        value.crossJoin(broadcast(total))
          .filter(col("value_cents") >
            (col("total_cents").cast("double") * 0.0005).cast("long"))
          .select(col("p_partkey"),
            round(col("value_cents").cast("double") / 100.0, 2).as("value"))
      },
      Some("""WITH v AS (
             |  SELECT l.l_partkey AS p_partkey,
             |    sum(cast(round(p.p_retailprice * l.l_quantity * 100)
             |      AS BIGINT)) AS value_cents
             |  FROM lineitem l
             |  JOIN part p ON p.p_partkey = l.l_partkey
             |  WHERE l.l_suppkey IN (
             |    SELECT s_suppkey FROM supplier s
             |    JOIN nation n ON n.n_nationkey = s.s_nationkey
             |    WHERE n.n_name = 'NATION_3')
             |  GROUP BY 1)
             |SELECT p_partkey,
             |  round(cast(value_cents AS double) / 100.0, 2) AS value
             |FROM v
             |WHERE value_cents > cast(
             |  (SELECT cast(sum(value_cents) AS double) * 0.0005 FROM v)
             |  AS BIGINT)""".stripMargin)),

    // TPC-H Q12 (shipping modes / late lines), adapted: no l_shipmode or
    // receipt/commit dates, so lines are classed by ship LATENCY instead
    // (FAST ≤ 30 days from order to ship, else SLOW) — same pivoted
    // CASE-sum shape: per class, how many high-priority vs other orders'
    // lines. One join, one group, conditional counts.
    Q("tpch_q12_latency_class",
      (s, dir) => {
        rd(s, dir, "lineitem")
          .join(rd(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .select(
            when(datediff(to_date(col("l_shipdate")),
              to_date(col("o_orderdate"))) <= 30, "FAST").otherwise("SLOW")
              .as("latency_class"),
            col("o_orderpriority"))
          .groupBy(col("latency_class"))
          .agg(
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
              .otherwise(0L)).as("high_line_count"),
            sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
              .otherwise(0L)).as("low_line_count"))
      },
      Some("""SELECT
             |  CASE WHEN date_diff('day', cast(o.o_orderdate AS DATE),
             |      cast(l.l_shipdate AS DATE)) <= 30
             |    THEN 'FAST' ELSE 'SLOW' END AS latency_class,
             |  cast(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
             |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |  cast(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
             |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
             |FROM lineitem l
             |JOIN orders o ON o.o_orderkey = l.l_orderkey
             |GROUP BY 1""".stripMargin)),

    // TPC-H Q13 (customer order-count distribution) — faithful (minus
    // the o_comment NOT LIKE filter; no comment column): LEFT join so
    // zero-order customers land in the c_count=0 bucket, then the
    // distribution over the counts — the canonical two-level aggregation
    // with an outer-join null becoming a 0 via count(o_orderkey).
    Q("tpch_q13_custdist",
      (s, dir) => {
        rd(s, dir, "customer").select("c_custkey")
          .join(rd(s, dir, "orders").select("o_orderkey", "o_custkey"),
            col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
      },
      Some("""SELECT c_count, cast(count(*) AS BIGINT) AS custdist
             |FROM (
             |  SELECT c.c_custkey, cast(count(o.o_orderkey) AS BIGINT)
             |    AS c_count
             |  FROM customer c
             |  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
             |  GROUP BY 1) d
             |GROUP BY 1""".stripMargin)),

    // TPC-H Q15 (top supplier) — faithful: quarterly revenue per
    // supplier, keep the one(s) achieving the MAX. The reference's view
    // + scalar subquery becomes: aggregate once, 1-row max cross-joined
    // back (the grouped exchange is reused, the max side broadcasts).
    Q("tpch_q15_top_supplier",
      (s, dir) => {
        val rev = rd(s, dir, "lineitem")
          .filter(to_date(col("l_shipdate")) >= lit("1996-01-01").cast("date") &&
            to_date(col("l_shipdate")) < lit("1996-04-01").cast("date"))
          .groupBy(col("l_suppkey"))
          .agg(sum(revCents).as("rev_cents"))
        val top = rev.agg(max(col("rev_cents")).as("max_cents"))
        rev.crossJoin(broadcast(top))
          .filter(col("rev_cents") === col("max_cents"))
          .join(rd(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            round(col("rev_cents").cast("double") / 100.0, 2)
              .as("total_revenue"))
      },
      Some("""WITH rev AS (
             |  SELECT l_suppkey,
             |    sum(cast(round(l_extendedprice * (1.0 - l_discount) * 100)
             |      AS BIGINT)) AS rev_cents
             |  FROM lineitem
             |  WHERE cast(l_shipdate AS DATE) >= DATE '1996-01-01'
             |    AND cast(l_shipdate AS DATE) < DATE '1996-04-01'
             |  GROUP BY 1)
             |SELECT s.s_suppkey, s.s_name,
             |  round(cast(r.rev_cents AS double) / 100.0, 2) AS total_revenue
             |FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
             |WHERE r.rev_cents = (SELECT max(rev_cents) FROM rev)""".stripMargin)),

    // TPC-H Q16 (parts/supplier relationship), adapted: no partsupp —
    // the (part, supplier) pairs come from DISTINCT lineitem shipments.
    // Shape preserved: exclusion filters (brand, type prefix, size set)
    // then COUNT(DISTINCT supplier) per (brand, type, size) descriptor.
    // The distinct-count plans as two-phase partial aggregation on
    // (descriptor, suppkey) — no single reducer sees all suppliers.
    Q("tpch_q16_supplier_cnt",
      (s, dir) => {
        val part = rd(s, dir, "part")
          .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
          .select("p_partkey", "p_brand", "p_type", "p_size")
        rd(s, dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
          .join(part, col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"), col("p_type"), col("p_size"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      },
      Some("""SELECT p.p_brand, p.p_type, p.p_size,
             |  cast(count(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
             |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
             |JOIN part p ON p.p_partkey = ps.l_partkey
             |WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
             |  AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
             |GROUP BY 1, 2, 3""".stripMargin)),

    // TPC-H Q17 (small-quantity-order revenue) — faithful shape
    // (container filter → brand-only; no container column): lines whose
    // quantity is below 50% of their part's average quantity, summed and
    // divided by 7 years ("avg yearly revenue lost"). The correlated
    // scalar subquery decorrelates into a per-part aggregate joined
    // back. The threshold avg divides an EXACT integral-double quantity
    // sum by an exact count, so the `<` comparison cannot flip between
    // engines (see file doc).
    Q("tpch_q17_small_qty",
      (s, dir) => {
        val part = rd(s, dir, "part").filter(col("p_brand") === "Brand#13")
          .select("p_partkey")
        val li = rd(s, dir, "lineitem")
          .join(part, col("l_partkey") === col("p_partkey"), "leftsemi")
        val avgQty = li.groupBy(col("l_partkey").as("ap"))
          .agg((sum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
        li.join(avgQty, col("l_partkey") === col("ap"))
          .filter(col("l_quantity") < col("avg_qty") * 0.5)
          .agg(round(sum(cents(col("l_extendedprice"))).cast("double")
            / 100.0 / 7.0, 2).as("avg_yearly"),
            count(lit(1)).as("n_lines"))
      },
      Some("""WITH li AS (
             |  SELECT l.* FROM lineitem l
             |  WHERE l.l_partkey IN (
             |    SELECT p_partkey FROM part WHERE p_brand = 'Brand#13')),
             |a AS (
             |  SELECT l_partkey, sum(l_quantity) / count(*) AS avg_qty
             |  FROM li GROUP BY 1)
             |SELECT
             |  round(cast(sum(cast(round(li.l_extendedprice * 100) AS BIGINT))
             |    AS double) / 100.0 / 7.0, 2) AS avg_yearly,
             |  cast(count(*) AS BIGINT) AS n_lines
             |FROM li JOIN a ON a.l_partkey = li.l_partkey
             |WHERE li.l_quantity < a.avg_qty * 0.5""".stripMargin)),

    // TPC-H Q19 (discounted revenue) — faithful shape (container terms →
    // size ranges): the three OR'd (brand ∧ size-range ∧ quantity-range)
    // conjuncts. The disjunction sits ON the join output but each
    // conjunct's part-side half (brand, size) could prune the dimension;
    // Spark pushes the common `l_quantity <= 30` bound and the partkey
    // equi-join carries the rest — the classic "OR of conjuncts doesn't
    // break the equi-join" test.
    Q("tpch_q19_disc_revenue",
      (s, dir) => {
        val li = rd(s, dir, "lineitem")
        val part = rd(s, dir, "part")
        li.join(part, col("l_partkey") === col("p_partkey"))
          .filter(
            (col("p_brand") === "Brand#13" && col("p_size").between(1, 5) &&
              col("l_quantity").between(1, 11)) ||
            (col("p_brand") === "Brand#25" && col("p_size").between(1, 10) &&
              col("l_quantity").between(10, 20)) ||
            (col("p_brand") === "Brand#9" && col("p_size").between(1, 15) &&
              col("l_quantity").between(20, 30)))
          .agg(money(revCents).as("revenue"), count(lit(1)).as("n_lines"))
      },
      Some("""SELECT
             |  round(cast(sum(cast(round(l.l_extendedprice * (1.0 - l.l_discount)
             |    * 100) AS BIGINT)) AS double) / 100.0, 2) AS revenue,
             |  cast(count(*) AS BIGINT) AS n_lines
             |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
             |WHERE (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 5
             |    AND l.l_quantity BETWEEN 1 AND 11)
             |  OR (p.p_brand = 'Brand#25' AND p.p_size BETWEEN 1 AND 10
             |    AND l.l_quantity BETWEEN 10 AND 20)
             |  OR (p.p_brand = 'Brand#9' AND p.p_size BETWEEN 1 AND 15
             |    AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin)),

    // TPC-H Q20 (potential part promotion), adapted: no partsupp
    // availability, so "excess supply" is read off shipments — a
    // supplier qualifies if, for some PROMO part, their 1996 shipped
    // quantity exceeds 50% of that part's total 1996 shipped quantity.
    // Shape preserved: nested semi-join chain (suppliers ⊇ qualifying
    // (part,supp) ⊇ promo parts), supplier names from one nation.
    // Quantity sums are integral doubles — exact at any partition order.
    Q("tpch_q20_promotion",
      (s, dir) => {
        val promo = rd(s, dir, "part").filter(col("p_type") === "PROMO")
          .select("p_partkey")
        val li96 = rd(s, dir, "lineitem")
          .filter(to_date(col("l_shipdate")) >= lit("1996-01-01").cast("date") &&
            to_date(col("l_shipdate")) < lit("1997-01-01").cast("date"))
          .join(promo, col("l_partkey") === col("p_partkey"), "leftsemi")
        val perSupp = li96.groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(sum(col("l_quantity")).as("supp_qty"))
        val perPart = li96.groupBy(col("l_partkey").as("pp"))
          .agg(sum(col("l_quantity")).as("part_qty"))
        val qualifying = perSupp
          .join(perPart, col("l_partkey") === col("pp"))
          .filter(col("supp_qty") > col("part_qty") * 0.5)
          .select(col("l_suppkey")).distinct()
        rd(s, dir, "supplier")
          .join(broadcast(rd(s, dir, "nation")
            .filter(col("n_name") === "NATION_7")),
            col("s_nationkey") === col("n_nationkey"))
          .join(qualifying, col("s_suppkey") === col("l_suppkey"), "leftsemi")
          .select("s_suppkey", "s_name")
      },
      Some("""WITH li96 AS (
             |  SELECT l_partkey, l_suppkey, l_quantity FROM lineitem
             |  WHERE cast(l_shipdate AS DATE) >= DATE '1996-01-01'
             |    AND cast(l_shipdate AS DATE) < DATE '1997-01-01'
             |    AND l_partkey IN
             |      (SELECT p_partkey FROM part WHERE p_type = 'PROMO')),
             |per_supp AS (
             |  SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty
             |  FROM li96 GROUP BY 1, 2),
             |per_part AS (
             |  SELECT l_partkey, sum(l_quantity) AS part_qty
             |  FROM li96 GROUP BY 1)
             |SELECT s.s_suppkey, s.s_name
             |FROM supplier s
             |JOIN nation n ON n.n_nationkey = s.s_nationkey
             |  AND n.n_name = 'NATION_7'
             |WHERE s.s_suppkey IN (
             |  SELECT ps.l_suppkey FROM per_supp ps
             |  JOIN per_part pp ON pp.l_partkey = ps.l_partkey
             |  WHERE ps.supp_qty > pp.part_qty * 0.5)""".stripMargin)),

    // TPC-H Q21 (suppliers who kept orders waiting), adapted: lateness
    // is ship-latency (> 90 days after ordering; no receipt/commit
    // dates). Faithful decorrelation of the EXISTS + NOT EXISTS pair:
    // per finalized order compute distinct-supplier and late-supplier
    // counts ONCE (one groupBy, no correlated rescans), then keep late
    // lines in multi-supplier orders where their supplier was the ONLY
    // late one. Top 10 suppliers by wait count.
    Q("tpch_q21_waiting",
      (s, dir) => {
        val lo = rd(s, dir, "lineitem")
          .join(rd(s, dir, "orders").filter(col("o_orderstatus") === "F"),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey"), col("l_suppkey"),
            (to_date(col("l_shipdate")) >
              date_add(to_date(col("o_orderdate")), 90)).as("is_late"))
        val perOrder = lo.groupBy(col("l_orderkey").as("ok"))
          .agg(countDistinct(col("l_suppkey")).as("n_supp"),
            countDistinct(when(col("is_late"), col("l_suppkey")))
              .as("n_late_supp"))
        val waits = lo.filter(col("is_late"))
          .select("l_orderkey", "l_suppkey").distinct()
          .join(perOrder, col("l_orderkey") === col("ok"))
          .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
        waits.join(rd(s, dir, "supplier"),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_suppkey"), col("s_name"))
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(10)
      },
      Some("""WITH lo AS (
             |  SELECT l.l_orderkey, l.l_suppkey,
             |    cast(l.l_shipdate AS DATE) >
             |      cast(o.o_orderdate AS DATE) + 90 AS is_late
             |  FROM lineitem l
             |  JOIN orders o ON o.o_orderkey = l.l_orderkey
             |    AND o.o_orderstatus = 'F'),
             |per_order AS (
             |  SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_supp,
             |    count(DISTINCT CASE WHEN is_late THEN l_suppkey END)
             |      AS n_late_supp
             |  FROM lo GROUP BY 1)
             |SELECT s.s_suppkey, s.s_name,
             |  cast(count(*) AS BIGINT) AS numwait
             |FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lo
             |      WHERE is_late) w
             |JOIN per_order p ON p.l_orderkey = w.l_orderkey
             |  AND p.n_supp >= 2 AND p.n_late_supp = 1
             |JOIN supplier s ON s.s_suppkey = w.l_suppkey
             |GROUP BY 1, 2
             |ORDER BY numwait DESC, s.s_name
             |LIMIT 10""".stripMargin)),

    // TPC-H Q22 (global sales opportunity), adapted: no phone column, so
    // the "country code" is c_nationkey % 10 ∈ {0..4}; and since every
    // customer in this corpus has SOME order, "lapsed" means no order in
    // the trailing window (≥ 2000-07-01) — the anti-join's probe side is
    // a date-filtered scan instead of the full table, same shape.
    // Faithful otherwise: scalar-subquery threshold (avg positive
    // balance over the code set), NOT EXISTS → left-anti join, grouped
    // count + balance sum per code. Balances aggregate as exact cents.
    Q("tpch_q22_opportunity",
      (s, dir) => {
        val cust = rd(s, dir, "customer")
          .withColumn("cntrycode", (col("c_nationkey") % 10).cast("int"))
          .filter(col("cntrycode").isin(0, 1, 2, 3, 4))
          .select(col("c_custkey"), col("cntrycode"),
            cents(col("c_acctbal")).as("bal_cents"))
        val thresh = cust.filter(col("bal_cents") > 0)
          .agg((sum(col("bal_cents")) / count(lit(1))).as("avg_cents"))
        cust.crossJoin(broadcast(thresh))
          .filter(col("bal_cents").cast("double") > col("avg_cents"))
          .join(rd(s, dir, "orders")
            .filter(to_date(col("o_orderdate")) >= lit("2000-07-01").cast("date"))
            .select("o_custkey"),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("cntrycode"))
          .agg(count(lit(1)).as("numcust"),
            money(col("bal_cents")).as("totacctbal"))
      },
      Some("""WITH cust AS (
             |  SELECT c_custkey, cast(c_nationkey % 10 AS INT) AS cntrycode,
             |    cast(round(c_acctbal * 100) AS BIGINT) AS bal_cents
             |  FROM customer
             |  WHERE c_nationkey % 10 IN (0, 1, 2, 3, 4))
             |SELECT cntrycode, cast(count(*) AS BIGINT) AS numcust,
             |  round(cast(sum(bal_cents) AS double) / 100.0, 2) AS totacctbal
             |FROM cust c
             |WHERE cast(bal_cents AS double) > (
             |    SELECT cast(sum(bal_cents) AS double) / count(*)
             |    FROM cust WHERE bal_cents > 0)
             |  AND NOT EXISTS (
             |    SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
             |      AND cast(o.o_orderdate AS DATE) >= DATE '2000-07-01')
             |GROUP BY 1""".stripMargin))
  )
}
