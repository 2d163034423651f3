package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** AQE skew-join: the RUNTIME complement to the engine's explicit
  * salting (Salt.scala). When one join key dominates, adaptive
  * execution observes the oversized shuffle partition after the map
  * stage and splits it across tasks (OptimizeSkewedJoin) — no code
  * change, no pre-chosen salt fanout. The spec drives a skewed
  * sort-merge join with thresholds scaled down to local data sizes and
  * asserts the final adaptive plan actually took the skew path, with an
  * unskewed negative control.
  */
class SkewJoinSpec extends SparkSuite {

  private val tuned = Seq(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    // local-scale thresholds: a partition counts as skewed at >16KB and
    // 2x the median (production defaults: 256MB / 5x) — the factor must
    // stay >1 or evenly-sized partitions above the byte floor all count
    // as skewed and the negative control loses meaning
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
    // forbid broadcast so the join stays shuffle-based
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")

  private def withTunedConf[A](body: => A): A = {
    val prior = tuned.map { case (k, _) =>
      k -> spark.conf.getOption(k)
    }
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("a dominant key triggers the adaptive skew-join split; balanced data does not") {
    import spark.implicits._
    withTunedConf {
      // 40k rows on key 0 vs ~40 rows on every other key
      val skewed = spark.range(0, 44000)
        .select(when(col("id") < 40000, 0L).otherwise(col("id") % 100).as("k"),
          concat(lit("payload_"), col("id")).as("pay"))
      val dim = spark.range(0, 100).select(col("id").as("k"),
        concat(lit("name_"), col("id")).as("name"))

      val joined = skewed.join(dim, "k")
      // execute THIS query execution (count() would plan its own), so
      // the adaptive plan below is the final, runtime-replanned one
      assert(joined.collect().length === 44000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"adaptive plan did not take the skew path:\n$plan")

      val balanced = spark.range(0, 44000)
        .select((col("id") % 100).as("k"), col("id").as("pay"))
        .join(dim, "k")
      assert(balanced.collect().length === 44000)
      assert(!balanced.queryExecution.executedPlan.toString.contains("skew=true"),
        "negative control: balanced join must not be marked skewed")
    }
  }
}
