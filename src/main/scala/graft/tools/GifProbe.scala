package graft.tools
object GifProbe {
  def main(args: Array[String]): Unit = {
    // identity gray palette: index == gray level
    val comps = Array.tabulate(256)(_.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256, comps, comps, comps)
    def frame(f: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(9, 8,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
      val r = img.getRaster
      for (y <- 0 until 8; x <- 0 until 9) r.setSample(x, y, 0, (y * 9 + x + f * 7) % 256)
      img
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    w.setOutput(ios)
    w.prepareWriteSequence(null)
    for (f <- 0 until 4) w.writeToSequence(new javax.imageio.IIOImage(frame(f), null, null), null)
    w.endWriteSequence(); w.dispose(); ios.close()
    val bytes = bos.toByteArray
    println(s"gif bytes: ${bytes.length}")
    val iis = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(bytes))
    val r = javax.imageio.ImageIO.getImageReaders(iis).next()
    r.setInput(iis)
    val n = r.getNumImages(true)
    println(s"frames: $n")
    var ok = true
    for (f <- 0 until n) {
      val img = r.read(f)
      println(s"frame $f type=${img.getType} w=${img.getWidth} h=${img.getHeight}")
      for (y <- 0 until 8; x <- 0 until 9) {
        val got = img.getRaster.getSample(x, y, 0)
        val want = (y * 9 + x + f * 7) % 256
        if (got != want) { ok = false; if (x < 2 && y == 0) println(s"  mismatch f=$f ($x,$y): $got vs $want") }
      }
    }
    println(s"pixel-exact round trip: $ok")
    r.dispose(); iis.close()
  }
}
