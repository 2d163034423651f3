package graft.functions

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Path, Paths}

/** Deterministic synthetic "receipt scans" for the image-path queries
  * and specs (no real image corpus ships with the testdata; the
  * reference's own dev fixtures are two Textract JSONs). Content is a
  * seeded 8×8 block pattern — structurally distinct per seed, identical
  * per (seed, size) across runs, so aHashes are stable.
  */
object SyntheticImages {

  def blockImage(seed: Long, w: Int = 64, h: Int = 96): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val rnd = new java.util.Random(seed)
    val blocks = Array.fill(8, 8)(rnd.nextInt(256))
    for (y <- 0 until h; x <- 0 until w) {
      val v = blocks(y * 8 / h)(x * 8 / w)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, out)
    out.toByteArray
  }

  /** Idempotent fixture dir: `distinct` unique scans, the first `dups`
    * of them re-scanned (same pixels, new file), plus one non-image
    * decoy the S4 glob must drop. Returns the directory path.
    *
    * The directory name embeds a content token (the encoded bytes' hash
    * for seed 1) so a change to blockImage/encode invalidates the dir —
    * a bare file-count check would silently reuse stale fixtures from a
    * previous build and make results machine-state-dependent.
    */
  def fixtureDir(distinct: Int = 8, dups: Int = 2): String = {
    val token = java.lang.Long.toHexString(
      java.util.Arrays.hashCode(encode(blockImage(1), "png")).toLong & 0xffffffffL)
    val dir: Path = Paths.get(sys.props("java.io.tmpdir"),
      s"graft_image_fixture_${distinct}_${dups}_$token")
    val expected = distinct + dups + 1
    if (!Files.isDirectory(dir) || dir.toFile.list().length != expected) {
      Files.createDirectories(dir)
      for (i <- 1 to distinct)
        Files.write(dir.resolve(f"Scan_$i%03d.png"), encode(blockImage(i), "png"))
      for (i <- 1 to dups)
        Files.write(dir.resolve(f"Rescan_$i%03d.png"), encode(blockImage(i), "png"))
      Files.write(dir.resolve("notes.txt"), "not an image".getBytes)
    }
    dir.toString
  }
}
