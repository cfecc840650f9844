package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Literal}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** Pruning soundness over PARTITION SPEC EVOLUTION (foreign tables:
  * each manifest binds to the spec it was written under, so files from
  * an evolved-away spec LACK the current spec's tuple keys): a missing
  * key must mean "unprunable on that column", never "null tuple" — a
  * null tuple means a genuinely all-null source column and prunes
  * null-rejecting predicates exactly. */
class IcebergSpecEvolutionPruneSpec extends SparkSpec {
  import spark.implicits._

  test("old-spec files (missing tuple key) are never identity-pruned") {
    val dir = Files.createTempDirectory("graft_specevo")
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("par", StringType)))
    def file(name: String, rows: Seq[(Long, String)]): String = {
      val p = dir.resolve(name).toString
      rows.toDF("id", "par").coalesce(1).write.mode("overwrite").parquet(p)
      val part = Files.list(java.nio.file.Paths.get(p))
      val f = try {
        import scala.jdk.CollectionConverters._
        part.iterator().asScala.find(_.getFileName.toString.endsWith(".parquet")).get
      } finally part.close()
      f.toString
    }
    val fNew = file("new", Seq((1L, "a")))          // current spec: par=a
    val fOld = file("old", Seq((2L, "b")))          // old spec: NO tuple key
    val snap = IcebergRead.Snapshot(1L, schema, Seq("par"),
      Seq(
        IcebergRead.DataFile(fNew, Map("par" -> "a"), 10L, 1L),
        IcebergRead.DataFile(fOld, Map.empty, 10L, 1L)),
      fieldIdToName = Map(1 -> "id", 2 -> "par"),
      partitionFields = Seq(IcebergTransforms.PartField("par", "par",
        IcebergTransforms.Identity)))
    val idx = new IcebergFileIndex(spark, snap)
    val parAttr = AttributeReference("par", StringType)()
    def scheduled(filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =
      idx.listFiles(Nil, filters).flatMap(_.files).map(_.getPath.toString)
    // par = 'b': the new-spec 'a' file prunes; the old-spec file MUST
    // stay scheduled (its rows might match — and here they do)
    val kept = scheduled(Seq(EqualTo(parAttr,
      Literal(UTF8String.fromString("b"), StringType))))
    assert(kept.size == 1 && kept.head.contains("old"),
      s"old-spec file wrongly pruned (or new kept): $kept")
    // no filters: both scheduled
    assert(scheduled(Nil).size == 2)
    // candidateFiles (the oracle arithmetic) agrees
    assert(IcebergRead.candidateFiles(snap, Map("par" -> Set("b")))
      .map(_.path) == Seq(fOld))
    assert(IcebergRead.candidateFiles(snap, Map("par" -> Set("a", "b")))
      .map(_.path).toSet == Set(fNew, fOld))
  }
}
