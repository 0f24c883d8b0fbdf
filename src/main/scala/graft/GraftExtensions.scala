package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.CosineSimExpr

/** Session extensions: registers graft's native expressions for SQL use.
  *
  * Install with `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * (or programmatically via `SparkSession.builder.withExtensions`); after
  * that `SELECT cosine_sim(a.embedding, b.embedding) ...` runs the
  * codegen'd [[CosineSimExpr]] in plain SQL, the same operator the
  * DataFrame API reaches through `VectorFunctions.cosineFast`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimExpr].getName, "cosine_sim"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_sim expects exactly 2 arguments")
        CosineSimExpr(args.head, args(1))
      }))
    // declarative aggregate(zip_with(...)) cosine -> fused native expression
    ext.injectOptimizerRule(_ => graft.plans.CosineRewrite())
  }
}
