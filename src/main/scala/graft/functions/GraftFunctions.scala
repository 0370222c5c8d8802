package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftbridge.{CosineSimilarity, DotProduct, DotProductDD, ExpMicro, LnScaledMicro, SortedOverlap, WordNgrams}

/** Registration hook for the engine's custom functions — an embedding
  * application calls this from its SessionProvider (mirrors per-session
  * function registration, examples/bearer_auth_flight_sql.rs:95-114).
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine",
      exprs => CosineSimilarity(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot",
      exprs => DotProduct(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot_d",
      exprs => DotProductDD(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_overlap",
      exprs => SortedOverlap(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_ngrams",
      exprs => WordNgrams(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_ln_scaled",
      exprs => LnScaledMicro(exprs(0), exprs(1), exprs(2)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_exp_micro",
      exprs => ExpMicro(exprs(0)),
      "built-in")
  }
}
