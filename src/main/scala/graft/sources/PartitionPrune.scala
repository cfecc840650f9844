package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Cast, Expression, Literal, Predicate}
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared file-group pruning for the open-table-format read adapters
  * ([[DeltaFileIndex]], [[IcebergFileIndex]]): bind pushed predicates BY
  * NAME against a partition-tuple schema and keep only the groups whose
  * tuple can satisfy them.
  *
  * Soundness: a conjunct referencing anything outside `partSchema` cannot
  * be evaluated against a partition tuple and is DROPPED from the pruning
  * predicate (never prunes) — row-level semantics still apply it after the
  * scan. This matters for Iceberg, where partition source columns live in
  * the data files and pruning predicates arrive as ordinary dataFilters
  * mixed with non-partition conjuncts. */
object PartitionPrune {

  /** Raw partition-value strings → typed InternalRow under `partSchema`
    * (Cast gives date/int/… partition tuples native comparisons). */
  def partRow(partSchema: StructType, pv: Map[String, String], tz: String): InternalRow =
    InternalRow.fromSeq(partSchema.fields.toSeq.map { f =>
      pv.get(f.name).filter(v => v != null && v != "__HIVE_DEFAULT_PARTITION__") match {
        case None => null
        case Some(raw) =>
          Cast(Literal(UTF8String.fromString(raw), StringType), f.dataType,
            Some(tz)).eval(null)
      }
    })

  /** Keep the groups whose partition row can satisfy every EVALUABLE
    * conjunct of `filters`. */
  def prune[A](partSchema: StructType, groups: Seq[(InternalRow, A)],
               filters: Seq[Expression]): Seq[(InternalRow, A)] = {
    val names = partSchema.fieldNames.toSet
    val evaluable = filters.filter(_.references.forall(a => names.contains(a.name)))
    evaluable.reduceOption(And) match {
      case None => groups
      case Some(e) =>
        val bound = e.transform {
          case a: AttributeReference =>
            val i = partSchema.fieldIndex(a.name)
            BoundReference(i, partSchema(i).dataType, nullable = true)
        }
        val pred = Predicate.createInterpreted(bound)
        pred.initialize(0)
        groups.filter { case (row, _) => pred.eval(row) }
    }
  }
}
