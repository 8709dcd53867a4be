package graft

/** Shared media-fixture builders: ONE copy of the ImageIO JPEG writer
  * (the independent encoder every media spec/oracle leans on) so the
  * bit-exact quality-1.0 regime cannot drift between suites.
  */
object MediaFixtures {

  /** Encode a BufferedImage as JPEG at `quality`; `restartInterval > 0`
    * injects a DRI marker through IIOMetadata (RSTn coverage).
    */
  def writeJpeg(img: java.awt.image.BufferedImage, quality: Float,
                restartInterval: Int = 0): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val bo = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bo)
    writer.setOutput(ios)
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val meta =
      if (restartInterval <= 0) null
      else {
        val m = writer.getDefaultImageMetadata(
          new javax.imageio.ImageTypeSpecifier(img), param)
        val fmt = "javax_imageio_jpeg_image_1.0"
        val tree = m.getAsTree(fmt).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        val ms = tree.getElementsByTagName("markerSequence").item(0)
        val dri = new javax.imageio.metadata.IIOMetadataNode("dri")
        dri.setAttribute("interval", restartInterval.toString)
        ms.insertBefore(dri, ms.getFirstChild)
        m.setFromTree(fmt, tree)
        m
      }
    writer.write(null, new javax.imageio.IIOImage(img, null, meta), param)
    ios.close()
    writer.dispose()
    bo.toByteArray
  }

  def grayImage(w: Int, h: Int)(f: (Int, Int) => Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { r.setSample(x, y, 0, f(x, y)); x += 1 }
      y += 1
    }
    img
  }

  /** Grayscale JPEG frame in one call (the AVI fixtures' shape). */
  def grayJpeg(w: Int, h: Int, quality: Float)(f: (Int, Int) => Int): Array[Byte] =
    writeJpeg(grayImage(w, h)(f), quality)
}
