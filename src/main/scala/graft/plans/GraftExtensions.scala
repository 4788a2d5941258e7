package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: injects the engine's native
  * Catalyst expressions as SQL functions, so a session started with
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions` exposes
  * them to pure-SQL clients with full codegen (no UDF boundary).
  *
  * This is the registration half of preference tier (b)/(c) from
  * SURVEY.md §2C; no custom optimizer Rule or SparkStrategy is needed
  * for this engine (Catalyst covers §4), so none is injected.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.minhashSignatureDescriptor)
  }
}

object GraftExtensions {

  private[plans] def buildMinhash(args: Seq[Expression]): Expression = {
    require(args.size == 2, "minhash_signature(hashes, numHashes)")
    val n = args(1) match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"numHashes must be an integer literal, got $other")
    }
    MinHashSignatureExpr(args.head, n)
  }

  val minhashSignatureDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_signature"),
    new ExpressionInfo(classOf[MinHashSignatureExpr].getName, "minhash_signature"),
    buildMinhash _)

  /** Direct registration into an existing session (tests, notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_signature", buildMinhash _, "scala_udf")
}
