package graft

import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** Throwaway profiling main (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local("32")
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = Tables.documents(spark, d)
    t("warm") { docs.agg(sum(length(col("text")))).head() }

    t("baseline_current") {
      System.err.println("  " + docs.agg(sum(size(
        transform(array_distinct(TextAnalysis.wordNgrams(col("text"), 3)),
          x => xxhash64(x))))).head())
    }

    // two-step: tokens materialized in a projection, grams reference it
    def twoStep = {
      val n = 3
      val toks = docs.select(col("doc_id"),
        TextAnalysis.tokens(col("text")).as("ts"))
      val cnt = size(col("ts")) - (n - 1)
      toks.select(col("doc_id"),
        when(cnt > 0,
          transform(sequence(lit(0), cnt - 1),
            i => concat_ws(" ", slice(col("ts"), i + 1, lit(n)))))
          .otherwise(array().cast("array<string>")).as("gs"))
        .select(col("doc_id"),
          transform(array_distinct(col("gs")), x => xxhash64(x)).as("grams"))
    }
    t("two_step_projected") {
      System.err.println("  " + twoStep.agg(sum(size(col("grams")))).head())
    }
    t("two_step_projected2") {
      System.err.println("  " + twoStep.agg(sum(size(col("grams")))).head())
    }

    // zip_with shape: no sequence/slice — zip ts with itself shifted
    def zipShape = {
      val toks = docs.select(col("doc_id"),
        TextAnalysis.tokens(col("text")).as("ts"))
      toks
        .select(col("doc_id"),
          zip_with(
            zip_with(col("ts"),
              slice(col("ts"), lit(2), greatest(size(col("ts")) - 1, lit(0))),
              (a, b) => concat_ws(" ", a, b)),
            slice(col("ts"), lit(3), greatest(size(col("ts")) - 2, lit(0))),
            (ab, c) => when(c.isNotNull, concat_ws(" ", ab, c))).as("gs0"))
        .select(col("doc_id"),
          transform(array_distinct(filter(col("gs0"), g => g.isNotNull)),
            x => xxhash64(x)).as("grams"))
    }
    t("zip_with_shape") {
      System.err.println("  " + zipShape.agg(sum(size(col("grams")))).head())
    }
    t("zip_with_shape2") {
      System.err.println("  " + zipShape.agg(sum(size(col("grams")))).head())
    }

    // let-binding inside ONE expression: bind tokens to a lambda var
    def let(v: org.apache.spark.sql.Column)(
        body: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      element_at(transform(array(v), body), 1)
    val n3 = 3
    val letGrams = let(TextAnalysis.tokens(col("text"))) { ts =>
      when(size(ts) - (n3 - 1) > 0,
        transform(sequence(lit(0), size(ts) - n3),
          i => concat_ws(" ", slice(ts, i + 1, lit(n3)))))
        .otherwise(array().cast("array<string>"))
    }
    def letDf = docs.select(col("doc_id"),
      transform(array_distinct(letGrams), x => xxhash64(x)).as("grams"))
    t("let_binding_shape") {
      System.err.println("  " + letDf.agg(sum(size(col("grams")))).head())
    }
    t("let_binding_shape2") {
      System.err.println("  " + letDf.agg(sum(size(col("grams")))).head())
    }
    spark.stop()
  }
}
