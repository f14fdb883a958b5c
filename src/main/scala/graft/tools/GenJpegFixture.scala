package graft.tools

/** One-time generator for the committed JPEG content-pin fixture
  * (src/test/resources/fixtures/pinned_6.jpg + the constants in
  * MultimodalSpec's "JPEG content pin" test).
  *
  * Why a committed fixture: q30/q88 mask JPEG pixel sums NULL on both
  * engines (DCT quantization is not SQL-replayable), so the oracle only
  * verifies JPEG geometry/container. The decode CONTENT path is pinned
  * instead by committing one tiny JPEG whose decoded channel sums were
  * computed once (by this tool, through the same ImageIO decode the
  * operators use) and asserting `decodeMedia` reproduces them bit-exactly
  * on the committed bytes. Re-run only to regenerate the fixture; if a
  * JDK upgrade ever changes libjpeg rounding, the spec fails loudly and
  * THAT is the signal to investigate, not to silently regenerate.
  *
  * Usage: runMain graft.tools.GenJpegFixture <outPath>
  */
object GenJpegFixture {
  def main(args: Array[String]): Unit = {
    val out = java.nio.file.Paths.get(
      if (args.nonEmpty) args(0) else "src/test/resources/fixtures/pinned_6.jpg")
    val id = 6L // id ≡ 6 (mod 8) → the JPEG container class
    val bytes = graft.multimodal.Multimodal.imagePayload(id)
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out, bytes)
    // decode back through the SAME ImageIO path decodeMedia uses and print
    // the constants to pin
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var (sr, sg, sb) = (0L, 0L, 0L)
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val rgb = img.getRGB(x, y)
      sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
    }
    println(s"[jpegfixture] wrote ${bytes.length} bytes to $out")
    println(s"[jpegfixture] width=${img.getWidth} height=${img.getHeight} " +
      s"sum_r=$sr sum_g=$sg sum_b=$sb")
  }
}
