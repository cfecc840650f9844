package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Geospatial operators over grid-bucketed points — the missing spatial
  * family (hotspot density, radius join, kNN, nearest-facility
  * assignment, trajectory length).
  *
  * Points are synthesized DETERMINISTICALLY from the driver tables
  * (integer milli-degree coordinates derived from keys via LCG-style
  * multipliers), so both engines derive the identical point set at every
  * SF with pure int64 arithmetic — no float in any coordinate or any
  * join/selection decision:
  *
  *   lat_md = (key * 48271) % 10000        -- 0..10°N in milli-degrees
  *   lon_md = (key * 16807) % 20000        -- 0..20°E in milli-degrees
  *
  * Scale design (the part that survives 100 TB): every spatial join here
  * is GRID-BUCKETED — points carry a cell id (md DIV cellSize) and
  * candidates come from an equi-join on the 3×3 neighbor cells (probe
  * side exploded ×9), never a cross join — the same band/bucket shape as
  * the MinHash LSH family. Cell size ≥ radius, so the 3×3 ring is
  * exhaustive for the radius; proximity DECISIONS (within-radius, argmin)
  * use exact integer squared distance in md², so parity cannot hinge on
  * libm ulps. Haversine meters appear only in reported measures, where
  * the driver's float tolerance absorbs last-ulp engine differences.
  */
object GeoQueries {

  private def rd(s: SparkSession, dir: String, t: String): DataFrame =
    s.read.parquet(s"$dir/$t.parquet")

  /** Density-adaptive bucket size for the ring-join family (radius join,
    * kNN): the coordinate space is FIXED (10°×20°, 2e8 md²), so with a
    * fixed cell the per-cell occupancy — and with it the ring-join
    * fan-out — grows linearly with the point count and the candidate
    * relation grows quadratically (measured at sf10: 1.5M points over a
    * 50-cell grid put ~4.2e9 rows under geo_knn's window sort).
    *
    * The cell halves while expected occupancy n·cell²/2e8 exceeds 5000,
    * i.e. while n > 1e12/cell² — an UNSATURATED chain (2000, 1000, 500,
    * 250, 125, 62, 31, 15, 7, 3, 1) valid at any n, unlike the previous
    * five-tier table that stopped at 125 and went quadratic again past
    * ~64M points. Pure integer arithmetic (the bound is compared as
    * n ≤ 1e12 div cell², no n·cell² product to overflow), and the DuckDB
    * CASE below is GENERATED from the same chain, so both engines derive
    * the identical grid from their own count(*) by construction. The ring
    * radius is (3/4)·cell, always ≤ cell, so the 3×3 ring stays
    * exhaustive at every tier. All driver gate SFs (≤250k customers)
    * land in the first tier — identical grid to the original constants. */
  private[graft] val cellTiers: Seq[(Long, Long)] = {
    val cells = Iterator.iterate(2000L)(_ / 2L).takeWhile(_ >= 1L).toSeq
    cells.map(c => (1000000000000L / (c * c), c)) // (max n for this cell, cell)
  }

  private[graft] def adaptiveCell(n: Long): Long =
    cellTiers.collectFirst { case (maxN, c) if n <= maxN => c }
      .getOrElse(cellTiers.last._2)

  /** the same halving chain as [[adaptiveCell]], as a DuckDB scalar over
    * a count column named n — emitted FROM the chain, not hand-kept. */
  private val cellSqlCase = {
    val arms = cellTiers.init.map { case (maxN, c) => s"WHEN n <= $maxN THEN $c" }
    s"CASE ${arms.mkString(" ")} ELSE ${cellTiers.last._2} END"
  }

  // ---- shared point derivations (Spark + identical DuckDB SQL) --------

  private def withCoords(df: DataFrame, key: String): DataFrame =
    df.withColumn("lat_md", (col(key) * 48271L) % 10000L)
      .withColumn("lon_md", (col(key) * 16807L) % 20000L)

  private def coordsSql(key: String): String =
    s"($key * 48271) % 10000 AS lat_md, ($key * 16807) % 20000 AS lon_md"

  private def withCells(df: DataFrame, cell: Long): DataFrame =
    df.withColumn("cla", expr(s"lat_md div $cell"))
      .withColumn("clo", expr(s"lon_md div $cell"))

  /** exact haversine meters — IDENTICAL formula text on both engines;
    * only ever a reported measure, never a join/ordering key. */
  private def havExpr(la1: String, lo1: String, la2: String, lo2: String): String =
    s"""2.0 * 6371000.0 * asin(sqrt(
       |  pow(sin(radians(($la2 - $la1) / 1000.0) / 2), 2)
       |  + cos(radians($la1 / 1000.0)) * cos(radians($la2 / 1000.0))
       |    * pow(sin(radians(($lo2 - $lo1) / 1000.0) / 2), 2)))""".stripMargin

  private def d2(aLat: Column, aLon: Column, bLat: Column, bLon: Column): Column =
    (aLat - bLat) * (aLat - bLat) + (aLon - bLon) * (aLon - bLon)

  /** probe side exploded to its 3×3 neighbor cells. */
  private def explodeRing(probe: DataFrame): DataFrame =
    probe
      .withColumn("dla", explode(typedLit(Seq(-1L, 0L, 1L))))
      .withColumn("dlo", explode(typedLit(Seq(-1L, 0L, 1L))))
      .withColumn("jla", col("cla") + col("dla"))
      .withColumn("jlo", col("clo") + col("dlo"))

  private val ringSql =
    "CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dla) CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dlo)"

  val all: Seq[Q] = Seq(

    // Hotspot density: 1°×1° grid cells ranked by customer count —
    // single partial-aggregating groupBy, top-20 with deterministic
    // tiebreak. The canonical first pass of any spatial pipeline.
    Q("geo_grid_hotspots",
      (s, dir) => {
        withCoords(rd(s, dir, "customer"), "c_custkey")
          .groupBy(expr("lat_md div 1000").as("cell_lat"),
            expr("lon_md div 1000").as("cell_lon"))
          .agg(count(lit(1)).as("n_points"))
          .orderBy(col("n_points").desc, col("cell_lat"), col("cell_lon"))
          .limit(20)
      },
      Some(s"""WITH pts AS (SELECT ${coordsSql("c_custkey")} FROM customer)
              |SELECT lat_md // 1000 AS cell_lat, lon_md // 1000 AS cell_lon,
              |  cast(count(*) AS BIGINT) AS n_points
              |FROM pts GROUP BY 1, 2
              |ORDER BY n_points DESC, cell_lat, cell_lon LIMIT 20""".stripMargin)),

    // Radius join: for each probe point (1/97 sample), neighbors within
    // 1.5° — candidates from the 3×3 cell ring equi-join (probe side
    // exploded ×9), exact integer-d² filter, never a cross join. The
    // nearest neighbor is chosen by an integer-packed (d², key) argmin so
    // tie-break and parity are exact. The packing multiplier is
    // max(key)+1 DERIVED FROM THE TABLE (a fixed 1e8 lets key bits bleed
    // into the d² ordering once keys pass 1e8, ~sf667); headroom is
    // ample: d² ≤ 2·radius² ≤ 4.5e6 and shrinks with the adaptive cell,
    // so code = d²·m + key stays under 2^63 for max(key) up to ~2e12.
    Q("geo_radius_join",
      (s, dir) => {
        val stats = rd(s, dir, "customer")
          .agg(count(lit(1)), max(col("c_custkey"))).head()
        val (n, m) = (stats.getLong(0), stats.getLong(1) + 1L)
        val cell = adaptiveCell(n)
        val radius = cell * 3 / 4
        // the candidate fan-out is ~9·occupancy per point regardless of
        // source file layout, so decouple parallelism from the scan's
        // split count (a single-row-group file would otherwise funnel the
        // whole candidate relation through a couple of tasks)
        val pts = withCells(withCoords(rd(s, dir, "customer"), "c_custkey"), cell)
          .select(col("c_custkey").as("pk"), col("lat_md"), col("lon_md"),
            col("cla"), col("clo"))
          .repartition()
        val probes = explodeRing(pts.filter(col("pk") % 97 === 0)
          .select(col("pk").as("qk"), col("lat_md").as("qlat"),
            col("lon_md").as("qlon"), col("cla"), col("clo")))
          .select("qk", "qlat", "qlon", "jla", "jlo")
        probes.as("q")
          .join(pts.as("p"),
            col("q.jla") === col("p.cla") && col("q.jlo") === col("p.clo"))
          .filter(col("pk") =!= col("qk") &&
            d2(col("qlat"), col("qlon"), col("lat_md"), col("lon_md")) <= radius * radius)
          .groupBy(col("qk").as("probe_key"))
          .agg(count(lit(1)).as("n_neighbors"),
            min(d2(col("qlat"), col("qlon"), col("lat_md"), col("lon_md")) *
              m + col("pk")).as("code"))
          .select(col("probe_key"), col("n_neighbors"),
            expr(s"code div $m").as("min_d2"),
            (col("code") % m).as("nearest_key"))
          .orderBy("probe_key")
      },
      Some(s"""WITH g AS (
              |  SELECT $cellSqlCase AS cell,
              |         (($cellSqlCase) * 3) // 4 AS radius,
              |         m
              |  FROM (SELECT count(*) AS n, max(c_custkey) + 1 AS m FROM customer)),
              |pts AS (
              |  SELECT c_custkey AS pk, ${coordsSql("c_custkey")},
              |    (c_custkey * 48271) % 10000 // g.cell AS cla,
              |    (c_custkey * 16807) % 20000 // g.cell AS clo
              |  FROM customer, g),
              |probes AS (
              |  SELECT pk AS qk, lat_md AS qlat, lon_md AS qlon,
              |    cla + dla AS jla, clo + dlo AS jlo
              |  FROM pts $ringSql
              |  WHERE pk % 97 = 0),
              |hits AS (
              |  SELECT qk, pk,
              |    (qlat - lat_md) * (qlat - lat_md)
              |      + (qlon - lon_md) * (qlon - lon_md) AS dd
              |  FROM probes JOIN pts ON jla = cla AND jlo = clo
              |  WHERE pk <> qk)
              |SELECT qk AS probe_key, cast(count(*) AS BIGINT) AS n_neighbors,
              |  min(dd * g.m + pk) // g.m AS min_d2,
              |  min(dd * g.m + pk) % g.m AS nearest_key
              |FROM hits, g WHERE dd <= g.radius * g.radius
              |GROUP BY 1, g.m ORDER BY probe_key""".stripMargin)),

    // Grid-bounded kNN: 5 nearest neighbors per probe among the 3×3 cell
    // ring candidates, ranked by exact (d², key). The per-probe top-k is
    // a window over the ring candidates only — Catalyst's
    // WindowGroupLimit bounds the exchange, and with the density-adaptive
    // cell the candidate set is O(ring occupancy), not O(N).
    Q("geo_knn",
      (s, dir) => {
        // top-5 via graft.expr.TopKPairs (bounded-heap aggregate), NOT a
        // row_number window: the window plan shuffles AND sorts every
        // ring-join candidate (~590M rows at sf30 — the sort spilled and
        // the sf10→sf30 wall ratio drifted to 4.6× for 3× data). The
        // aggregate's partial step reduces each map task to ≤5 rows per
        // local probe key before the exchange, so the shuffle carries
        // O(probes × 5) rows regardless of candidate volume — the 100 TB
        // top-k shape. (ord, payload) = (dd, pk): exact integer md², ties
        // on pk — the identical (dd, pk) ordering the oracle's window uses.
        val cell = adaptiveCell(rd(s, dir, "customer").count())
        val pts = withCells(withCoords(rd(s, dir, "customer"), "c_custkey"), cell)
          .select(col("c_custkey").as("pk"), col("lat_md"), col("lon_md"),
            col("cla"), col("clo"))
          .repartition()
        val probes = explodeRing(pts.filter(col("pk") % 97 === 1)
          .select(col("pk").as("qk"), col("lat_md").as("qlat"),
            col("lon_md").as("qlon"), col("cla"), col("clo")))
          .select("qk", "qlat", "qlon", "jla", "jlo")
        probes.as("q")
          .join(pts.as("p"),
            col("q.jla") === col("p.cla") && col("q.jlo") === col("p.clo"))
          .filter(col("pk") =!= col("qk"))
          .withColumn("dd",
            d2(col("qlat"), col("qlon"), col("lat_md"), col("lon_md")))
          .groupBy(col("qk"))
          .agg(graft.expr.TopKPairs.topKPairs(
            struct(col("dd"), col("pk")), 5).as("top"))
          .select(col("qk"), posexplode(col("top")))
          .select(col("qk").as("probe_key"), (col("pos") + 1L).as("rn"),
            col("col.payload").as("neighbor_key"), col("col.ord").as("d2"))
          .orderBy("probe_key", "rn")
      },
      Some(s"""WITH g AS (
              |  SELECT $cellSqlCase AS cell
              |  FROM (SELECT count(*) AS n FROM customer)),
              |pts AS (
              |  SELECT c_custkey AS pk, ${coordsSql("c_custkey")},
              |    (c_custkey * 48271) % 10000 // g.cell AS cla,
              |    (c_custkey * 16807) % 20000 // g.cell AS clo
              |  FROM customer, g),
              |probes AS (
              |  SELECT pk AS qk, lat_md AS qlat, lon_md AS qlon,
              |    cla + dla AS jla, clo + dlo AS jlo
              |  FROM pts $ringSql
              |  WHERE pk % 97 = 1),
              |cand AS (
              |  SELECT qk, pk,
              |    (qlat - lat_md) * (qlat - lat_md)
              |      + (qlon - lon_md) * (qlon - lon_md) AS dd
              |  FROM probes JOIN pts ON jla = cla AND jlo = clo
              |  WHERE pk <> qk),
              |ranked AS (
              |  SELECT qk, pk, dd,
              |    row_number() OVER (PARTITION BY qk ORDER BY dd, pk) AS rn
              |  FROM cand)
              |SELECT qk AS probe_key, cast(rn AS BIGINT) AS rn,
              |  pk AS neighbor_key, dd AS d2
              |FROM ranked WHERE rn <= 5 ORDER BY probe_key, rn""".stripMargin)),

    // Nearest-facility assignment: every customer assigned to its
    // closest distribution center — the classic broadcast-NN: the DC
    // dimension is broadcast, per-customer argmin by exact integer
    // (d², key) packing, then a per-DC rollup. Haversine km appears only
    // as the reported mean. The DC SAMPLE is density-adaptive: a real
    // facility network is ~constant-size, and a rate fixed at 1/7 of
    // suppliers makes the broadcast-NN product quadratic in SF (measured
    // at sf10: 1.5M × 14.3k ≈ 2.1e10 pairs through a nested-loop join).
    // stride = greatest(7, |supplier| / 150) keeps |DCs| ≈ 150 at any
    // scale; both engines derive it from their own count(*), and all
    // driver gate SFs (≤1k suppliers) keep the original stride 7.
    // Argmin packing multiplier = max(s_suppkey)+1, derived from the
    // table on both engines (not a fixed 1e8 that keys outgrow). Here d²
    // is unbounded by a radius (max 10000²+20000² = 5e8), so the packed
    // code stays in int64 for max(key) up to ~1.8e10 — 18× past the
    // 100 TB supplier keyspace.
    Q("geo_nearest_dc",
      (s, dir) => {
        val stats = rd(s, dir, "supplier")
          .agg(count(lit(1)), max(col("s_suppkey"))).head()
        val (nSupp, m) = (stats.getLong(0), stats.getLong(1) + 1L)
        val stride = math.max(7L, nSupp / 150L)
        // parallelism decoupled from the scan layout (single-row-group
        // file ⇒ one task under the broadcast product otherwise)
        val cust = withCoords(rd(s, dir, "customer"), "c_custkey")
          .select(col("c_custkey").as("ck"),
            col("lat_md").as("clat"), col("lon_md").as("clon"))
          .repartition()
        val dcs = withCoords(
          rd(s, dir, "supplier").filter(col("s_suppkey") % stride === 0),
          "s_suppkey")
          .select(col("s_suppkey").as("dc"),
            col("lat_md").as("dlat"), col("lon_md").as("dlon"))
        cust.join(broadcast(dcs))
          .withColumn("code",
            d2(col("clat"), col("clon"), col("dlat"), col("dlon")) *
              m + col("dc"))
          .groupBy("ck", "clat", "clon")
          .agg(min(col("code")).as("mincode"))
          .withColumn("dc", col("mincode") % m)
          .join(broadcast(dcs), Seq("dc"))
          .groupBy(col("dc").as("dc_key"))
          .agg(count(lit(1)).as("n_customers"),
            (sum(expr(havExpr("clat", "clon", "dlat", "dlon"))) /
              count(lit(1)) / 1000.0).as("avg_km"))
          .orderBy("dc_key")
      },
      Some(s"""WITH st AS (
              |  SELECT greatest(7, count(*) // 150) AS stride,
              |         max(s_suppkey) + 1 AS m
              |  FROM supplier),
              |cust AS (
              |  SELECT c_custkey AS ck,
              |    (c_custkey * 48271) % 10000 AS clat,
              |    (c_custkey * 16807) % 20000 AS clon
              |  FROM customer),
              |dcs AS (
              |  SELECT s_suppkey AS dc,
              |    (s_suppkey * 48271) % 10000 AS dlat,
              |    (s_suppkey * 16807) % 20000 AS dlon
              |  FROM supplier, st WHERE s_suppkey % st.stride = 0),
              |assigned AS (
              |  SELECT ck, clat, clon,
              |    min(((clat - dlat) * (clat - dlat)
              |      + (clon - dlon) * (clon - dlon)) * st.m + dc)
              |      % st.m AS dc
              |  FROM cust CROSS JOIN dcs, st
              |  GROUP BY 1, 2, 3, st.m)
              |SELECT a.dc AS dc_key, cast(count(*) AS BIGINT) AS n_customers,
              |  sum(${havExpr("clat", "clon", "dlat", "dlon")})
              |    / count(*) / 1000.0 AS avg_km
              |FROM assigned a JOIN dcs ON dcs.dc = a.dc
              |GROUP BY 1 ORDER BY dc_key""".stripMargin)),

    // Trajectory length: per-user path over time-ordered events, one LAG
    // window per user partition. Per-segment length is round(sqrt(d²))
    // of the INTEGER squared milli-degree distance — sqrt is correctly
    // rounded per IEEE 754 on both engines (unlike asin/pow), so the
    // same int64 input yields the bit-identical double and the rounded
    // BIGINT segment length has exact cross-engine parity; totals/max
    // are exact integer aggregates and the TOP-50 ordering key. The
    // haversine total appears only as a double measure under the
    // driver's float tolerance (a rounded-to-whole-meters haversine
    // BIGINT, as previously written, let a half-ulp asin difference flip
    // an x.5 segment by ±1 m and fail the exact compare — the file's own
    // rule is that libm results never decide orderings or exact values).
    Q("geo_trajectory_stats",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = withCoords(rd(s, dir, "events"), "event_id")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("lat_md"), col("lon_md"))
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        ev.withColumn("plat", lag("lat_md", 1).over(w))
          .withColumn("plon", lag("lon_md", 1).over(w))
          .filter(col("plat").isNotNull)
          .withColumn("seg_md",
            expr("cast(round(sqrt((plat - lat_md) * (plat - lat_md) " +
              "+ (plon - lon_md) * (plon - lon_md))) AS BIGINT)"))
          .withColumn("seg_m", expr(havExpr("plat", "plon", "lat_md", "lon_md")))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_segments"),
            sum(col("seg_md")).as("total_md"),
            max(col("seg_md")).as("max_seg_md"),
            sum(col("seg_m")).as("total_m"))
          .orderBy(col("total_md").desc, col("user_id"))
          .limit(50)
      },
      Some(s"""WITH ev AS (
              |  SELECT user_id, ts, event_id, ${coordsSql("event_id")}
              |  FROM events),
              |seg AS (
              |  SELECT user_id,
              |    lag(lat_md) OVER w AS plat, lag(lon_md) OVER w AS plon,
              |    lat_md, lon_md
              |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
              |lens AS (
              |  SELECT user_id,
              |    cast(round(sqrt((plat - lat_md) * (plat - lat_md)
              |      + (plon - lon_md) * (plon - lon_md))) AS BIGINT) AS seg_md,
              |    ${havExpr("plat", "plon", "lat_md", "lon_md")} AS seg_m
              |  FROM seg WHERE plat IS NOT NULL)
              |SELECT user_id, cast(count(*) AS BIGINT) AS n_segments,
              |  cast(sum(seg_md) AS BIGINT) AS total_md,
              |  cast(max(seg_md) AS BIGINT) AS max_seg_md,
              |  sum(seg_m) AS total_m
              |FROM lens
              |GROUP BY 1 ORDER BY total_md DESC, user_id LIMIT 50""".stripMargin))
  )
}
