package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling harness for [[graft.ops.GraphOps.connectedComponents]] — the
  * evidence behind keeping min-label propagation with path halving over the
  * alternating large-star/small-star scheme (VERDICT r4 open question).
  *
  * Three graph shapes, all deterministic (seeded via hash arithmetic, no
  * RNG):
  *  - `clusters` — many small dense components: the shape an LSH candidate
  *    graph actually has (bucket cap bounds degree; near-dup clusters are
  *    dense and shallow).
  *  - `random`   — sparse Erdős–Rényi-ish: one giant component, diameter
  *    O(log n).
  *  - `chain`    — a single path: diameter = n, the adversarial worst case
  *    for label propagation (path halving must collapse it in O(log n)
  *    rounds).
  *
  * Usage: `sbt "runMain graft.tools.CcBench [nodes] [shape,shape,…]"`.
  * Prints per-shape wall seconds + rounds (rounds read from the
  * convergence loop via a side channel would complicate GraphOps; the
  * bound maxRounds=50 plus the wall clock is what matters here).
  */
object CcBench {
  def clusters(s: SparkSession, n: Long, size: Int): DataFrame =
    // node i belongs to clique i/size; edges i—(i+1 within the clique)
    // plus a chord to the clique head: diameter 2 per component
    s.range(n).toDF("a")
      .withColumn("b",
        when(col("a") % size === 0, col("a") + 1).otherwise(col("a") - col("a") % size))
      .filter(col("b") < lit(n) && col("a") =!= col("b"))

  def random(s: SparkSession, n: Long): DataFrame =
    // 2 pseudo-random edges per node: xxhash of the node id picks partners
    s.range(n).toDF("a")
      .select(col("a"), explode(array(
        pmod(xxhash64(col("a"), lit(1)), lit(n)).as("b1"),
        pmod(xxhash64(col("a"), lit(2)), lit(n)).as("b2"))).as("b"))
      .filter(col("a") =!= col("b"))

  def chain(s: SparkSession, n: Long): DataFrame =
    s.range(n - 1).toDF("a").withColumn("b", col("a") + 1)

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val shapes = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(Seq("clusters", "random", "chain"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    shapes.foreach { shape =>
      val edges = (shape match {
        case "clusters" => clusters(spark, n, 8)
        case "random"   => random(spark, n)
        case "chain"    => chain(spark, n)
        case other      => sys.error(s"unknown shape $other")
      }).localCheckpoint() // build cost out of the measurement
      val t0 = System.nanoTime()
      val labels = graft.ops.GraphOps.connectedComponents(edges, "a", "b")
      val nComp = labels.agg(countDistinct("component")).head().getLong(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"CCBENCH shape=$shape%-8s nodes=$n edges=${edges.count()} " +
        f"components=$nComp time=$sec%.2fs")
    }
    spark.stop()
  }
}
