import graft.multimodal.ImageHash
object PhProbe {
  def main(args: Array[String]): Unit = {
    val k = 30L // id 60/61
    val w = (32 + (k * 13 % 48)).toInt; val h = (32 + (k * 7 % 48)).toInt
    def pooled(shift: Int, scale: Int) = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
        ImageHash.syntheticAffinePng(k, w, h, shift, scale)))
      ImageHash.pooledGrid(img, ImageHash.PH_N, ImageHash.PH_N)
    }
    val m = classOf[ImageHash.type]
    val ph = ImageHash.getClass.getDeclaredMethods.find(_.getName.contains("phash63")).get
    ph.setAccessible(true)
    val a = ph.invoke(ImageHash, pooled(0, 1)).asInstanceOf[Long]
    val b = ph.invoke(ImageHash, pooled(40, 1)).asInstanceOf[Long]
    println(s"dims ${w}x$h base=$a shifted=$b xor=${java.lang.Long.bitCount(a ^ b)}")
  }
}
