package graft.functions

import org.apache.spark.sql.SparkSession

/** One-call registration of the engine's custom SQL functions, so
  * `spark.sql` users get the same surface as the Column API:
  *
  *  - `blake2b(binary) → string` — provenance hashing (native expr)
  *  - `cosine_sim(array, array) → double` — fused-loop cosine
  *  - `nfc_normalize(string) → string` — Unicode canonical composition
  *  - `lang_id(string) → string` — char-trigram language ID
  *
  * Also wired through [[graft.plans.GraftSparkExtensions]] so
  * `spark.sql.extensions=graft.plans.GraftSparkExtensions` brings
  * functions AND the native as-of strategy up with the session.
  */
object GraftFunctions {

  def registerAll(spark: SparkSession): Unit = {
    Blake2b.register(spark)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSim(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", exprs => NfcNormalize(exprs(0)), "built-in")
    spark.udf.register("lang_id", (s: String) => LangId.detect(s))
  }
}
