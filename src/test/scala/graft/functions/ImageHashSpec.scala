package graft.functions

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Path}
import javax.imageio.ImageIO

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** U1 aHash + J2 dedup (SURVEY.md §5 item 2: determinism, re-encode
  * invariance) and the S1/S4 binaryFile ingest path.
  */
class ImageHashSpec extends SparkSuite {

  private def makeImage(seed: Long, w: Int = 64, h: Int = 96): BufferedImage =
    SyntheticImages.blockImage(seed, w, h)

  private def encode(img: BufferedImage, fmt: String): Array[Byte] =
    SyntheticImages.encode(img, fmt)

  test("aHash is deterministic and content-sensitive") {
    val a = ImageHash.averageHash(encode(makeImage(1), "png"))
    val a2 = ImageHash.averageHash(encode(makeImage(1), "png"))
    val b = ImageHash.averageHash(encode(makeImage(2), "png"))
    assert(a === a2)
    assert(a !== b)
  }

  test("aHash is invariant under lossless re-encode (png → bmp)") {
    val img = makeImage(7)
    assert(ImageHash.averageHash(encode(img, "png")) ===
           ImageHash.averageHash(encode(img, "bmp")))
  }

  test("aHash rejects undecodable bytes") {
    intercept[IllegalArgumentException] {
      ImageHash.averageHash(Array[Byte](1, 2, 3))
    }
  }

  test("aHash handles sub-8px images without NaN collapse") {
    // w<8 skips grid cells in the x*8/w mapping; empty cells sample
    // their nearest pixel instead of dividing by zero.
    val tiny1 = ImageHash.averageHash(encode(makeImage(1, 3, 5), "png"))
    val tiny2 = ImageHash.averageHash(encode(makeImage(2, 3, 5), "png"))
    assert(tiny1 !== tiny2, "distinct tiny images must not collapse to one hash")
    assert(ImageHash.averageHash(encode(makeImage(1, 3, 5), "png")) === tiny1)
  }

  test("q44_image_dedup registered query collapses re-scans") {
    val df = graft.SparkEntry.queries("q44_image_dedup")(spark, "unused")
    val rows = df.collect()
    assert(rows.length === 8) // 8 distinct scans
    assert(rows.map(_.getLong(1)).sum === 10) // 2 re-scans collapsed
  }

  test("S1/S4 ingest + U1 hash column + J2 dedup over a directory scan") {
    val dir: Path = Files.createTempDirectory("graft_images")
    try {
      // two distinct receipts; one re-scanned (same content, new file)
      Files.write(dir.resolve("Scan_001.png"), encode(makeImage(1), "png"))
      Files.write(dir.resolve("Scan_002.png"), encode(makeImage(2), "png"))
      Files.write(dir.resolve("Scan_003.png"), encode(makeImage(1), "png"))
      Files.write(dir.resolve("notes.txt"), "not an image".getBytes) // S4 filter drops
      // .png extension but garbage bytes: must be skipped, not fatal
      Files.write(dir.resolve("Scan_corrupt.png"), Array[Byte](9, 9, 9))

      val (scanned, dropped) =
        ImageSource.withHashCounted(ImageSource.images(spark, dir.toString))
      assert(scanned.count() === 3) // pathGlobFilter excluded the .txt
      // corrupt .png was skipped OBSERVABLY (log-and-skip parity)
      assert(dropped.value === 1)

      val deduped = ImageSource.dedupByHash(scanned)
      assert(deduped.count() === 2) // re-scan collapsed onto its content address

      // img_id is a 16-char hex content address
      val ids = deduped.select("img_id").collect().map(_.getString(0))
      assert(ids.forall(_.matches("[0-9a-f]{16}")))

      // SQL registration
      ImageHash.register(spark)
      scanned.createOrReplaceTempView("scans")
      val n = spark.sql("SELECT COUNT(DISTINCT ahash(content)) AS n FROM scans")
        .head().getLong(0)
      assert(n === 2)
    } finally {
      dir.toFile.listFiles().foreach(_.delete())
      Files.deleteIfExists(dir)
    }
  }

  test("S2: reader behaves identically through a scheme'd object-store URI") {
    // No S3 in the sandbox; the contract under test is that the SAME
    // reader + glob resolves scheme'd URIs through the Hadoop FileSystem
    // API (s3a:// differs from file:// only in the FS implementation
    // behind that API — reference `anarcptlib.py:126-133` takes either).
    val dir: Path = Files.createTempDirectory("graft_images_s2")
    try {
      Files.write(dir.resolve("Scan_001.png"), encode(makeImage(1), "png"))
      Files.write(dir.resolve("Scan_002.png"), encode(makeImage(2), "png"))
      Files.write(dir.resolve("notes.txt"), "not an image".getBytes)

      val viaPath = ImageSource.withHash(ImageSource.images(spark, dir.toString))
      val viaUri = ImageSource.withHash(
        ImageSource.images(spark, dir.toUri.toString)) // file:///abs/path
      val byPath = viaPath.select("img_id").collect().map(_.getString(0)).sorted
      val byUri = viaUri.select("img_id").collect().map(_.getString(0)).sorted
      assert(byPath.length === 2) // glob applied on both routes
      assert(byPath.toSeq === byUri.toSeq)
    } finally {
      dir.toFile.listFiles().foreach(_.delete())
      Files.deleteIfExists(dir)
    }
  }
}
