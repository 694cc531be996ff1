package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook registering graft's custom expressions as
  * SQL functions (so `spark.sql("SELECT graft_dot(a, b)")` works next to
  * the Column API) and graft's optimizer rules
  * ([[graft.plans.BinnedRangeJoinRule]]). Install with:
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  * or spark.sql.extensions=graft.functions.GraftExtensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_dot takes exactly 2 arguments")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_lev_leq"),
      new ExpressionInfo(classOf[LevWithin].getName, "graft_lev_leq"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "graft_lev_leq takes exactly 3 arguments")
        LevWithin(children.head, children(1), children(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerSim].getName, "graft_jaro_winkler"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_jaro_winkler takes exactly 2 arguments")
        JaroWinklerSim(children.head, children(1))
      }))
    ext.injectOptimizerRule(_ => graft.plans.BinnedRangeJoinRule)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
  }
}
