package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.ColumnShim

/** DataFrame-API entry points for the custom Catalyst expressions (usable
  * in any session; [[GraftExtensions]] additionally exposes them to SQL
  * text). */
package object functions {

  /** Fused-loop dot product over two `array<double>` columns. */
  def vector_dot(a: Column, b: Column): Column =
    ColumnShim.column(VectorDot(ColumnShim.expression(a), ColumnShim.expression(b)))
}
