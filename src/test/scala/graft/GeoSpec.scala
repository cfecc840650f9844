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
}
