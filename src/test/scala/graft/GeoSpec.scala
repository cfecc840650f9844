package graft

import org.apache.spark.sql.functions._

/** Soundness of the grid-bucketed spatial family (GeoQueries).
  *
  * The oracle rows prove engine parity, but parity alone can't prove the
  * 3×3 cell ring is EXHAUSTIVE for the radius (both engines could miss
  * the same pair). These tests pin the grid construction against brute
  * force at sf0.001 (150 points → 22k pairs, trivially exact).
  */
class GeoSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  /** brute-force neighbor counts within R via the same integer d². */
  private def bruteForce() = {
    val pts = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey").as("pk"),
        ((col("c_custkey") * 48271L) % 10000L).as("lat"),
        ((col("c_custkey") * 16807L) % 20000L).as("lon"))
    val probes = pts.filter(col("pk") % 97 === 0)
      .select(col("pk").as("qk"), col("lat").as("qlat"), col("lon").as("qlon"))
    probes.crossJoin(pts)
      .filter(col("pk") =!= col("qk"))
      .withColumn("dd",
        (col("qlat") - col("lat")) * (col("qlat") - col("lat")) +
          (col("qlon") - col("lon")) * (col("qlon") - col("lon")))
      .filter(col("dd") <= 1500L * 1500L)
      .groupBy("qk")
      .agg(count(lit(1)).as("n"), min(col("dd") * 100000000L + col("pk")).as("code"))
  }

  test("geo_radius_join matches brute force exactly (ring is exhaustive)") {
    val grid = run("geo_radius_join")
      .select(col("probe_key"), col("n_neighbors"),
        col("min_d2"), col("nearest_key")).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val brute = bruteForce().collect()
      .map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2) / 100000000L, r.getLong(2) % 100000000L)))
      .toMap
    assert(grid == brute,
      s"grid=${grid.toSeq.sorted.take(5)} brute=${brute.toSeq.sorted.take(5)}")
    assert(brute.nonEmpty, "fixture produced no within-radius pairs")
  }

  test("geo_knn neighbors are the true k nearest among ALL points") {
    // the ring bounds the kNN search; with R(cell)=2000 ≥ any admitted
    // d≤1500... kNN admits candidates only from the ring, so verify that
    // for every probe the reported list equals the brute-force top-k
    // RESTRICTED to distance ≤ one cell (the documented grid-bounded
    // semantic): any brute-force neighbor nearer than a reported one must
    // itself be in the ring (Chebyshev distance ≤ cell size).
    val knn = run("geo_knn").collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getLong(1)).map(r => (r.getLong(2), r.getLong(3))).toSeq)
      .toMap
    val pts = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey").as("pk"),
        ((col("c_custkey") * 48271L) % 10000L).as("lat"),
        ((col("c_custkey") * 16807L) % 20000L).as("lon"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cell = 2000L
    val byId = pts.map(p => p._1 -> p).toMap
    knn.foreach { case (qk, reported) =>
      val (_, qlat, qlon) = byId(qk)
      // brute-force candidates inside the 3×3 ring of the probe's cell
      val ring = pts.filter { case (pk, lat, lon) =>
        pk != qk &&
          math.abs(lat / cell - qlat / cell) <= 1 &&
          math.abs(lon / cell - qlon / cell) <= 1
      }.map { case (pk, lat, lon) =>
        val dd = (qlat - lat) * (qlat - lat) + (qlon - lon) * (qlon - lon)
        (pk, dd)
      }.sortBy(t => (t._2, t._1)).take(5).toSeq
      assert(reported == ring, s"probe $qk: $reported vs $ring")
    }
    assert(knn.nonEmpty)
  }

  test("adaptiveCell keeps expected occupancy bounded at ANY n (no tier saturation)") {
    import graft.queries.GeoQueries.{adaptiveCell, cellTiers}
    // the coordinate space is 2e8 md²; expected per-cell occupancy is
    // n·cell²/2e8. The halving chain must hold occupancy ≤ 5000 up to the
    // last tier's bound (1e12 points ≈ far past a 100 TB point table) —
    // the round-9 five-tier table saturated at cell=125 and went
    // quadratic past 64M points.
    val probes = Seq(1L, 150L, 250000L, 250001L, 1000000L, 16000000L,
      16000001L, 64000000L, 64000001L, 100000000L, 1000000000L,
      10000000000L, 100000000000L, 1000000000000L)
    probes.foreach { n =>
      val cell = adaptiveCell(n)
      val occ = n.toDouble * cell * cell / 2e8
      assert(occ <= 5000.0 + 1e-6, s"n=$n cell=$cell occupancy=$occ")
      assert(cell >= 1L, s"n=$n cell degenerate")
    }
    // driver gate SFs stay on the original grid (hash stability)
    assert(adaptiveCell(150L) == 2000L)
    assert(adaptiveCell(15000L) == 2000L)
    assert(adaptiveCell(250000L) == 2000L)
    // chain is monotone (cells only shrink as n grows) and each tier's
    // bound is tight: one more point than the bound drops the cell
    cellTiers.sliding(2).foreach { case Seq((n1, c1), (n2, c2)) =>
      assert(n1 < n2 && c1 > c2, s"chain not monotone: ($n1,$c1) ($n2,$c2)")
      assert(adaptiveCell(n1) == c1 && adaptiveCell(n1 + 1) == c2)
    case _ => ()
    }
    // the ring radius (3/4 of cell) never exceeds the cell, so the 3×3
    // ring stays exhaustive at every tier
    cellTiers.foreach { case (_, c) => assert(c * 3 / 4 <= c) }
  }
}
