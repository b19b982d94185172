package graft.multimodal

/** Shared builder for dHash test fixtures: a 9x8 RGB image whose horizontal
  * gradient signs encode `sig` — bit (y*8+x) set -> gray rises from column x
  * to x+1 (start 128, ±10 steps, so grays stay in [48, 208] and r=g=b pixels
  * roundtrip exactly through PNG/BMP). At 9x8 no resample runs, so
  * `Multimodal.dhash64` must recover `sig` bit-for-bit. ONE definition for
  * the specs; the graded q115 plants the same construction inline
  * (SparkEntry closures stay self-contained) — keep them in sync. */
object PlantedImages {
  def planted(sig: Long, fmt: String = "png"): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8) {
      var g = 128
      img.setRGB(0, y, g * 0x010101)
      for (x <- 0 until 8) {
        g += (if (((sig >>> (y * 8 + x)) & 1L) == 1L) 10 else -10)
        img.setRGB(x + 1, y, g * 0x010101)
      }
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }
}
