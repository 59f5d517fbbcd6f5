package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.VectorColumns

/** Public face of the custom Catalyst vector expressions
  * (org.apache.spark.sql.graft.VectorExprs — placed there because the
  * Expression↔Column bridge is private[sql]).
  */
object vectors {
  /** Codegen'd cosine similarity over two Array[Float] columns. */
  def cosineSim(a: Column, b: Column): Column = VectorColumns.cosineSim(a, b)

  /** Codegen'd dot product over two Array[Float] columns. */
  def dot(a: Column, b: Column): Column = VectorColumns.dot(a, b)
}
