package graft.expr

import org.apache.spark.sql.SparkSession

/** SQL-surface registration for the engine's custom expressions, so the
  * DataFrame API and `spark.sql` entry points stay in sync (SURVEY.md
  * §3.3): after `Functions.register(spark)`,
  * `SELECT human_count(follower_count) ...` parses and plans to the same
  * codegen'd expression as the Column API.
  */
object Functions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "human_count", exprs => HumanCountExpr(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_shingles", {
        case Seq(text) => WordShinglesExpr(text, 3)
        case Seq(text, org.apache.spark.sql.catalyst.expressions.Literal(n: Int,
          org.apache.spark.sql.types.IntegerType)) => WordShinglesExpr(text, n)
        case _ => throw new IllegalArgumentException(
          "word_shingles(text[, n constant int])")
      }, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sim_hash", exprs => SimHashExpr(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "min_hash_sig", {
        case Seq(text) => MinHashSigExpr(text, 3, 8)
        case Seq(text,
          org.apache.spark.sql.catalyst.expressions.Literal(n: Int,
            org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.catalyst.expressions.Literal(seeds: Int,
            org.apache.spark.sql.types.IntegerType)) =>
          MinHashSigExpr(text, n, seeds)
        case _ => throw new IllegalArgumentException(
          "min_hash_sig(text[, n constant int, seeds constant int])")
      }, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "md5_u60", {
        case Seq(s) => Md5U60Expr(s, 0)
        case Seq(s, org.apache.spark.sql.catalyst.expressions.Literal(off: Int,
          org.apache.spark.sql.types.IntegerType)) => Md5U60Expr(s, off)
        case _ => throw new IllegalArgumentException(
          "md5_u60(text[, off constant int in {0, 16}])")
      }, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProductExpr(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "quantized_dot", exprs => QuantizedDotExpr(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "quantized_l2", exprs => QuantizedL2Expr(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "long_dot", exprs => LongDotExpr(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "long_l1", exprs => LongL1Expr(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_fingerprint", exprs => RollingFingerprintExpr(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "repetition_profile", exprs => RepetitionProfileExpr(exprs.head), "scala_udf")
  }
}
