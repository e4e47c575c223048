package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Span consolidation — the spanner algebra's conflict-resolution operator
 * (`consolidate`, reference: spanner/consolidate.py:29-83). The only policy
 * the reference implements is `left_to_right`: walk the spans of each
 * document in `(begin asc, end desc)` order, keep the longest match at each
 * position, and skip every span that begins before the kept span ends.
 *
 * The scan is inherently sequential *per document* (a running-max window is
 * not equivalent — chains of overlaps matter), so the plan is: one shuffle
 * to co-locate each document's spans (`repartition(doc_id)`), an in-partition
 * sort, then a streaming `mapPartitions` greedy scan. Documents are the unit
 * of parallelism, matching the reference's per-document model; at 100 TB
 * this is one exchange and a linear scan — no driver involvement.
 */
object Consolidate {

  def consolidate(df: DataFrame, on: String = "span"): DataFrame = {
    val schema: StructType = df.schema
    val onIdx = schema.fieldIndex(on)
    val spanSchema = schema(onIdx).dataType.asInstanceOf[StructType]
    val beginIdx = spanSchema.fieldIndex("begin")
    val endIdx = spanSchema.fieldIndex("end")
    val docIdx = schema.fieldIndex("doc_id")

    val sorted = df.repartition(col("doc_id"))
      .sortWithinPartitions(col("doc_id"), col(on)("begin"), col(on)("end").desc)

    sorted.mapPartitions { rows =>
      var curDoc: Any = null
      var started = false
      var curEnd = Int.MinValue
      rows.flatMap { row =>
        val doc = row.get(docIdx)
        if (!started || doc != curDoc) { started = true; curDoc = doc; curEnd = Int.MinValue }
        val s = row.getStruct(onIdx)
        if (s == null) None
        else {
          val begin = s.getInt(beginIdx)
          if (begin >= curEnd) { curEnd = s.getInt(endIdx); Some(row) }
          else None
        }
      }
    }(Encoders.row(schema))
  }
}
