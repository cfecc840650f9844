package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expr.Hashing
import graft.expr.SystemColumns.{LdtsAlias, RsrcAlias}
import graft.loaders.{ControlSnapV0Loader, PitLoader, PitSatellite, SatV0Loader, SatV1Loader}
import graft.queries.{OracleSql => O}

/** The INFORMATION-MART layer — what datavault4dbt users build ON TOP of
  * the Raw Vault (the reference ships the vault loaders and PITs;
  * `docs/...pit...` positions PITs explicitly as the query-assistance
  * layer for exactly these marts). Three canonical downstream shapes,
  * each fed from the same 3-batch customer fixture as the sat/PIT
  * queries so every mart is oracle-checked end-to-end THROUGH the vault:
  *
  *  - SCD2 dimension: sat v1 (virtual end-dating) + hub business key +
  *    a hash(hk, valid_from) surrogate key — the Kimball Type-2 dim
  *    derived from the vault, not loaded separately.
  *  - Fact with as-of surrogate-key resolution: each order event looks
  *    up the dimension version in effect at its event time (temporal
  *    join J6 re-used at mart grain), stamping the fact row with the
  *    dimension's surrogate key at load time — the "late-arriving
  *    dimension" discipline. After stamping, BI queries are pure
  *    EQUI-joins.
  *  - Star rollup: fact ⋈ dim on the surrogate key (broadcast dim),
  *    grouped measures — the query a BI tool actually emits.
  *
  * Scale: the dimension is dwarfed by the fact (1500 versions vs 60k
  * orders here; same ratio at 100 TB) so the stamping join broadcasts
  * the dimension; the rollup is one shuffle on the group keys.
  */
object MartQueries {

  private def rd(s: SparkSession, dir: String, t: String): DataFrame =
    s.read.parquet(s"$dir/$t.parquet")

  /** SCD2 customer dimension built from the vault: v0 → v1 (LEAD
    * end-dating) → + surrogate key + business key. */
  private def dimCustomer(s: SparkSession, dir: String): DataFrame = {
    val v0 = SatV0Loader.records(DvQueries.cust3Batch(s, dir),
      Seq("hk_customer_h"), Some("hd_customer_s"),
      Seq("c_custkey", "c_name", "c_acctbal_v", "c_mktsegment"), target = None)
    SatV1Loader.build(v0, "hk_customer_h", Some("hd_customer_s"),
        addIsCurrentFlag = true)
      .select(
        Hashing.hashkey(Seq(col("hk_customer_h"), col(LdtsAlias)))(
          graft.expr.HashConfig()).as("dim_key_customer"),
        col("hk_customer_h"), col("c_custkey"), col("c_name"),
        col("c_acctbal_v"), col("c_mktsegment"),
        col(LdtsAlias).as("valid_from"), col("ledts").as("valid_to"),
        col("is_current"))
  }

  /** Order events timed INSIDE the dimension's validity range
    * (2024-02-01 12:00 + (o_orderkey % 6)·12h spans all three versions). */
  private def orderEvents(s: SparkSession, dir: String): DataFrame =
    rd(s, dir, "orders")
      .withColumn("event_ts", expr(
        "timestampadd(HOUR, cast(o_orderkey % 6 as int) * 12, " +
          "timestamp'2024-02-01 12:00:00')"))
      .withColumn("hk_customer_h",
        Hashing.hashkey(Seq(col("o_custkey")))(graft.expr.HashConfig()))
      .select(col("o_orderkey"), col("hk_customer_h"), col("event_ts"),
        round(col("o_totalprice") * 100).cast("long").as("price_cents"))

  /** Fact stamped with the as-of dimension surrogate key. */
  private def factOrders(s: SparkSession, dir: String): DataFrame = {
    val dim = dimCustomer(s, dir)
      .select(col("dim_key_customer"), col("hk_customer_h").as("dim_hk"),
        col("valid_from"), col("valid_to"))
    orderEvents(s, dir)
      .join(broadcast(dim),
        col("hk_customer_h") === col("dim_hk") &&
          col("event_ts").between(col("valid_from"), col("valid_to")),
        "left")
      .select(col("o_orderkey"),
        coalesce(col("dim_key_customer"), lit(O.ZeroKey))
          .as("dim_key_customer"),
        col("event_ts"), col("price_cents"))
  }

  private val dimSql =
    s"""${DvQueries.satV0Sql},
       |sat_v1 AS (
       |  SELECT *, COALESCE(LEAD(ldts - INTERVAL 1 MICROSECOND)
       |    OVER (PARTITION BY hk_customer_h ORDER BY ldts),
       |    timestamp '8888-12-31 23:59:59') AS ledts FROM sat_v0),
       |bk AS (SELECT DISTINCT hk_customer_h, c_custkey FROM src),
       |dim AS (
       |  SELECT ${O.hashkey("v.hk_customer_h", "v.ldts")} AS dim_key_customer,
       |    v.hk_customer_h, b.c_custkey, v.c_name, v.c_acctbal_v,
       |    v.c_mktsegment,
       |    v.ldts AS valid_from, v.ledts AS valid_to,
       |    v.ledts = timestamp '8888-12-31 23:59:59' AS is_current
       |  FROM sat_v1 v JOIN bk b ON b.hk_customer_h = v.hk_customer_h)""".stripMargin

  private val factSql =
    s"""$dimSql,
       |events AS (
       |  SELECT o_orderkey,
       |    ${O.hashkey("o_custkey")} AS hk_customer_h,
       |    timestamp '2024-02-01 12:00:00'
       |      + (o_orderkey % 6) * 12 * INTERVAL 1 HOUR AS event_ts,
       |    cast(round(o_totalprice * 100) AS BIGINT) AS price_cents
       |  FROM orders),
       |fact AS (
       |  SELECT e.o_orderkey,
       |    COALESCE(d.dim_key_customer, '${O.ZeroKey}') AS dim_key_customer,
       |    e.event_ts, e.price_cents
       |  FROM events e
       |  LEFT JOIN dim d ON d.hk_customer_h = e.hk_customer_h
       |    AND e.event_ts BETWEEN d.valid_from AND d.valid_to)""".stripMargin

  val all: Seq[Q] = Seq(

    // The Type-2 dimension itself: every version of every customer with
    // surrogate key, business key, validity window, current flag —
    // derived from sat v1 (the reference's virtual end-dating, W4/W6)
    // with zero extra state: the vault IS the dimension's history.
    Q("mart_dim_customer_scd2",
      (s, dir) => dimCustomer(s, dir),
      Some(s"""WITH $dimSql SELECT * FROM dim""".stripMargin)),

    // Fact stamping: as-of (temporal-join) surrogate-key resolution at
    // load time. The dimension side broadcasts (versions ≪ facts); the
    // temporal predicate rides ON the hashkey equi-join, so no range
    // blow-up. Unresolvable events get the ghost zero key, keeping the
    // fact NOT NULL — the reference's ghost-record discipline applied
    // at mart grain.
    Q("mart_fact_orders",
      (s, dir) => factOrders(s, dir),
      Some(s"""WITH $factSql SELECT * FROM fact""".stripMargin)),

    // The BI query: star equi-join fact → dim on the surrogate key,
    // revenue by segment × dimension currency. After stamping, no
    // temporal logic remains — this is the payoff of the PIT/SCD2
    // machinery: repeated reporting queries are broadcast hash joins
    // + one grouped aggregate.
    Q("mart_star_rollup",
      (s, dir) => {
        val dim = dimCustomer(s, dir)
          .select(col("dim_key_customer").as("dk"), col("c_mktsegment"),
            col("is_current"))
        factOrders(s, dir)
          .join(broadcast(dim), col("dim_key_customer") === col("dk"))
          .groupBy(col("c_mktsegment"), col("is_current"))
          .agg(count(lit(1)).as("n_orders"),
            round(sum(col("price_cents")).cast("double") / 100.0, 2)
              .as("revenue"),
            countDistinct(col("dim_key_customer")).as("n_dim_versions"))
      },
      Some(s"""WITH $factSql
              |SELECT d.c_mktsegment, d.is_current,
              |  cast(count(*) AS BIGINT) AS n_orders,
              |  round(cast(sum(f.price_cents) AS double) / 100.0, 2)
              |    AS revenue,
              |  cast(count(DISTINCT f.dim_key_customer) AS BIGINT)
              |    AS n_dim_versions
              |FROM fact f JOIN dim d ON d.dim_key_customer = f.dim_key_customer
              |GROUP BY 1, 2""".stripMargin)),

    // PIT-backed snapshot reporting: the PIT's (hk, sdts) → satellite
    // pointer matrix joined BACK to the satellite payload on the exact
    // (hk, ldts) pointer — dimension-as-of-day materialized with pure
    // EQUI-joins (the whole point of the PIT: the temporal join ran
    // once at PIT build; every report after it is hash-joinable).
    // Daily balance sum per segment across the 7-day spine.
    Q("mart_snapshot_balance",
      (s, dir) => {
        val v0 = SatV0Loader.records(DvQueries.cust3Batch(s, dir),
          Seq("hk_customer_h"), Some("hd_customer_s"),
          Seq("c_name", "c_acctbal_v", "c_mktsegment"), target = None)
        val v1 = SatV1Loader.build(v0, "hk_customer_h", Some("hd_customer_s"))
        val hub = DvQueries.cust3Batch(s, dir)
          .select("hk_customer_h").distinct()
        val snaps = ControlSnapV0Loader
          .build(s, "2024-02-01", "12:00:00", Some("2024-02-07"))
          .withColumn("is_active", lit(true))
        val pit = PitLoader.records(hub, "hk_customer_h",
          Seq(PitSatellite("customer_s", v1)), snaps, "dim_key_customer")
        val payload = v0.select(col("hk_customer_h").as("p_hk"),
          col(LdtsAlias).as("p_ldts"), col("c_acctbal_v"),
          col("c_mktsegment"))
        pit.join(payload,
            col("hk_customer_s") === col("p_hk") &&
              col("ldts_customer_s") === col("p_ldts"))
          .groupBy(col("sdts"), col("c_mktsegment"))
          .agg(count(lit(1)).as("n_customers"),
            round(sum(round(col("c_acctbal_v") * 100).cast("long"))
              .cast("double") / 100.0, 2).as("total_balance"))
      },
      Some(s"""WITH ${DvQueries.satV0Sql},
              |sat_v1 AS (
              |  SELECT *, COALESCE(LEAD(ldts - INTERVAL 1 MICROSECOND)
              |    OVER (PARTITION BY hk_customer_h ORDER BY ldts),
              |    timestamp '8888-12-31 23:59:59') AS ledts FROM sat_v0),
              |hub AS (SELECT DISTINCT hk_customer_h FROM hashed),
              |snaps AS (
              |  SELECT unnest(generate_series(timestamp '2024-02-01 12:00:00',
              |    timestamp '2024-02-08 00:00:00' - INTERVAL 1 MICROSECOND,
              |    INTERVAL 1 DAY)) AS sdts),
              |pit AS (
              |  SELECT te.hk_customer_h, snap.sdts,
              |    COALESCE(s1.hk_customer_h, '${O.ZeroKey}') AS hk_customer_s,
              |    COALESCE(s1.ldts, timestamp '0001-01-01 00:00:01')
              |      AS ldts_customer_s
              |  FROM hub te CROSS JOIN snaps snap
              |  LEFT JOIN sat_v1 s1 ON s1.hk_customer_h = te.hk_customer_h
              |    AND snap.sdts BETWEEN s1.ldts AND s1.ledts)
              |SELECT p.sdts, s.c_mktsegment,
              |  cast(count(*) AS BIGINT) AS n_customers,
              |  round(cast(sum(cast(round(s.c_acctbal_v * 100) AS BIGINT))
              |    AS double) / 100.0, 2) AS total_balance
              |FROM pit p
              |JOIN sat_v0 s ON s.hk_customer_h = p.hk_customer_s
              |  AND s.ldts = p.ldts_customer_s
              |GROUP BY 1, 2""".stripMargin))
  )
}
