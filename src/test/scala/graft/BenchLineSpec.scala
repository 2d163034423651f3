package graft

/** Pins the bench metric-line degradation contract (Bench.lines): the
  * harness parses the LAST 2000 stdout chars, so the stdout line must
  * stay under the tail window at ANY registry size — the full per-query
  * map while it fits, an empty map (headline total intact) past that,
  * with the detail line always carrying everything. Both shapes must
  * stay machine-parseable JSON.
  */
class BenchLineSpec extends SparkSuite {

  private def parse(line: String): org.apache.spark.sql.Row = {
    import spark.implicits._
    val df = spark.read.json(Seq(line).toDS)
    assert(!df.columns.contains("_corrupt_record"), s"unparseable: $line")
    df.head()
  }

  test("small registry: stdout carries the map under short qNN keys; detail keeps full names") {
    val results = (1 to 5).map(i => (s"q${i}_some_name", i * 1.0, true))
    val (detail, out) = Bench.lines(results, Nil, "sf0.1")
    val row = parse(out)
    assert(row.getAs[Double]("value") === 15.0)
    assert(row.getAs[String]("sf") === "sf0.1")
    val qs = row.getAs[org.apache.spark.sql.Row]("queries")
    assert(qs.schema.fieldNames.toSet === (1 to 5).map(i => s"q$i").toSet)
    val dq = parse(detail).getAs[org.apache.spark.sql.Row]("queries")
    assert(dq.schema.fieldNames.toSet
      === (1 to 5).map(i => s"q${i}_some_name").toSet)
  }

  test("short-key collision falls back to full names (still window-guarded)") {
    val results = Seq(("q7_alpha", 1.0, true), ("q7_beta", 2.0, true))
    val (_, out) = Bench.lines(results, Nil, "sf0.1")
    assert(out.contains("\"q7_alpha\"") && out.contains("\"q7_beta\""))
  }

  test("oversized registry: stdout degrades to an empty map inside the window; detail keeps everything") {
    val results = (1 to 300).map(i => (f"q${i}%03d_some_long_query_name", i * 0.1, true))
    val (detail, out) = Bench.lines(results, Nil, "sf0.1")
    assert(out.length <= Bench.TailWindow, s"stdout line ${out.length} chars")
    assert(out.contains("\"queries\":{}"))
    val row = parse(out)
    assert(math.abs(row.getAs[Double]("value") - results.map(_._2).sum) < 0.01)
    // the detail file is the full record
    val dq = parse(detail).getAs[org.apache.spark.sql.Row]("queries")
    assert(dq.schema.fieldNames.length === 300)
  }

  test("failed queries: listed, and their time-to-failure excluded from the total") {
    val results = Seq(("q_ok", 2.0, true), ("q_boom", 9.0, false))
    val (_, out) = Bench.lines(results, Seq("q_boom"), "sf0.01")
    val row = parse(out)
    assert(row.getAs[Double]("value") === 2.0)
    assert(row.getAs[Seq[String]]("failed") === Seq("q_boom"))
  }

  test("extras (cold_total/warm_total) ride both lines and count " +
      "against the tail window (r13 ask #8)") {
    val results = (1 to 5).map(i => (s"q${i}_name", i * 1.0, true))
    val extras = ""","cold_total":21.50,"warm_total":14.20"""
    val (detail, out) = Bench.lines(results, Nil, "sf0.1", extras)
    for (l <- Seq(detail, out)) {
      val row = parse(l)
      assert(row.getAs[Double]("cold_total") === 21.5)
      assert(row.getAs[Double]("warm_total") === 14.2)
    }
    // the degradation stages account for the extra chars: a huge
    // registry + extras still fits the window
    val big = (1 to 300).map(i => (f"q${i}%03d_some_long_query_name", 1.0, true))
    val (_, out2) = Bench.lines(big, Nil, "sf0.1", extras)
    assert(out2.length <= Bench.TailWindow)
    assert(parse(out2).getAs[Double]("warm_total") === 14.2)
  }

  test("median: middle of odd samples, mean of middle two for even") {
    assert(Bench.median(Seq(3.0)) === 3.0)
    assert(Bench.median(Seq(9.0, 1.0, 2.0)) === 2.0) // robust to one spike
    assert(Bench.median(Seq(4.0, 1.0, 2.0, 3.0)) === 2.5)
  }

  test("the CURRENT registry's bench set keeps a per-query map even at worst-case widths") {
    // the real guard: if this fails, the next driver round would drop
    // the per-query map — shrink the format or trim names BEFORE that.
    // 99.9 forces the widest per-query times (a fully load-degraded
    // round); the coarse whole-second stage must still fit.
    val benched = SparkEntry.registry.filter(_.bench)
    // the short-key scheme requires distinct qNN prefixes — a registry
    // invariant worth its own failure message
    val prefixes = benched.map(_.name.takeWhile(_ != '_'))
    assert(prefixes.distinct.length === prefixes.length,
      s"duplicate qNN prefixes: ${prefixes.diff(prefixes.distinct)}")
    val (_, out) = Bench.lines(benched.map(q => (q.name, 99.9, true)), Nil, "sf0.1")
    assert(out.contains("\"q1\":"),
      "per-query map expected for the current registry")
    assert(out.length <= Bench.TailWindow,
      s"current registry's metric line is ${out.length} chars — " +
        "over the harness tail window")
    // and at typical (sub-10s) widths the full 0.1s-precision map fits
    val (_, typical) = Bench.lines(
      benched.map(q => (q.name, 9.9, true)), Nil, "sf0.1")
    assert(typical.contains("\"q1\":9.9"))
  }
}
