package graft.queries

import graft.SparkSuite

/** q153 end-to-end: the z-ordered layout must let the manifest zone
  * maps skip files a natural insert-order layout cannot — the
  * "manifest stats are consumed, not just audited" property (the
  * skip-vs-full VALUE equality is the DuckDB oracle's job; this pins
  * the file-count claim the oracle's layout arithmetic mirrors).
  */
class ManifestSkippingSpec extends SparkSuite {

  test("q153: z-ordered read opens strictly fewer files than insert order") {
    val rows = graft.SparkEntry.queries("q153_manifest_skipping")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (zTotal, zKept, zRows, zQty) = rows("zorder")
    val (iTotal, iKept, iRows, iQty) = rows("insert")
    // skipping power: strictly fewer files opened under the clustered
    // layout; insert order prunes ~nothing (every natural bucket spans
    // the partkey domain)
    assert(zKept < iKept, s"zorder kept $zKept vs insert $iKept")
    assert(zKept < zTotal, s"zorder must actually skip: $zKept/$zTotal")
    // both layouts hold the same data: the pruned reads agree exactly
    assert(zRows == iRows && zQty == iQty)
    assert(zRows > 0, "the selective slice must be non-empty")
  }
}
