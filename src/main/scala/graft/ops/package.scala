package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

/** `$"col"` syntax for the operator library without needing a
  * SparkSession's implicits in scope (ops are session-agnostic). */
package object ops {
  implicit class ColStr(private val sc: StringContext) extends AnyVal {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }
}
