package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Cluster-wide library entry point: registers every graft SQL
  * function on session build, so a deployment enables the whole
  * surface with one conf —
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * (or `.config("spark.sql.extensions", "graft.GraftExtensions")` on
  * the builder). Unlike [[graft.functions.GraftFunctions.register]]
  * (temp functions on one session), injected functions exist in every
  * session the cluster creates — thriftserver, notebooks, `CREATE
  * VIEW`s that outlive the registering session. The function list is
  * shared with `register` so the two paths cannot drift.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.GraftFunctions.sqlFunctions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }
  }
}
