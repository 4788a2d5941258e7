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
    e.injectFunction(GraftExtensions.minhashBandKeysDescriptor)
  }
}

object GraftExtensions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private[plans] def buildMinhash(args: Seq[Expression]): Expression = {
    require(args.size == 2, "minhash_signature(hashes, numHashes)")
    MinHashSignatureExpr(args.head, intLit(args(1), "numHashes"))
  }

  private[plans] def buildBandKeys(args: Seq[Expression]): Expression = {
    require(args.size == 3 || args.size == 4,
      "minhash_band_keys(text, bands, rowsPerBand[, shingleSize])")
    ShingleMinHashBandKeysExpr(args.head,
      intLit(args(1), "bands"), intLit(args(2), "rowsPerBand"),
      if (args.size == 4) intLit(args(3), "shingleSize") else 3)
  }

  val minhashSignatureDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_signature"),
    new ExpressionInfo(classOf[MinHashSignatureExpr].getName, "minhash_signature"),
    buildMinhash _)

  val minhashBandKeysDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_band_keys"),
    new ExpressionInfo(classOf[ShingleMinHashBandKeysExpr].getName, "minhash_band_keys"),
    buildBandKeys _)

  /** Direct registration into an existing session (tests, notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_signature", buildMinhash _, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_band_keys", buildBandKeys _, "scala_udf")
  }
}
