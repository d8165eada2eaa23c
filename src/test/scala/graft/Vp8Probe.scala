package graft

import java.nio.file.{Files, Paths}

/** Dev harness: diff graft.multimodal.Vp8 against the libwebp cross-pin
  * vectors (tools/gen_vp8_vectors.py). Not part of the driver contract. */
object Vp8Probe {
  def main(args: Array[String]): Unit = {
    val dir = Paths.get("src/test/resources/vp8")
    val files = Files.list(dir).iterator()
    val names = new scala.collection.mutable.ArrayBuffer[String]
    while (files.hasNext) {
      val f = files.next()
      if (f.getFileName.toString.endsWith(".bin")) names += f.toString
    }
    var pass = 0
    for (name <- names.sorted) {
      val raw = Files.readAllBytes(Paths.get(name))
      def u32(off: Int): Int = (raw(off) & 0xFF) | ((raw(off + 1) & 0xFF) << 8) |
        ((raw(off + 2) & 0xFF) << 16) | ((raw(off + 3) & 0xFF) << 24)
      require(new String(raw, 0, 4, "US-ASCII") == "VP8V")
      val w = u32(4); val h = u32(8); val n = u32(12)
      val webp = java.util.Arrays.copyOfRange(raw, 16, 16 + n)
      var off = 16 + n
      val uw = (w + 1) / 2; val uh = (h + 1) / 2
      val refY = java.util.Arrays.copyOfRange(raw, off, off + w * h); off += w * h
      val refU = java.util.Arrays.copyOfRange(raw, off, off + uw * uh); off += uw * uh
      val refV = java.util.Arrays.copyOfRange(raw, off, off + uw * uh); off += uw * uh
      val refRgba = java.util.Arrays.copyOfRange(raw, off, off + w * h * 4)
      // locate the VP8 chunk in the RIFF container
      var c = 12
      var vp8At = -1; var vp8End = -1
      while (vp8At < 0 && c + 8 <= webp.length) {
        val fourcc = new String(webp, c, 4, "US-ASCII")
        val sz = (webp(c + 4) & 0xFF) | ((webp(c + 5) & 0xFF) << 8) |
          ((webp(c + 6) & 0xFF) << 16) | ((webp(c + 7) & 0xFF) << 24)
        if (fourcc == "VP8 ") { vp8At = c + 8; vp8End = c + 8 + sz }
        c += 8 + sz + (sz & 1)
      }
      require(vp8At > 0, s"$name: no VP8 chunk")
      try {
        val (dw, dh, y, u, v) = graft.multimodal.Vp8.decodeYuv(1L, webp, vp8At, vp8End)
        require(dw == w && dh == h, s"dims $dw x $dh vs $w x $h")
        def diff(tag: String, got: Array[Byte], ref: Array[Byte],
                 rowW: Int): Option[String] = {
          var i = 0
          var worst = 0; var nbad = 0; var first = -1
          while (i < ref.length) {
            val d = math.abs((got(i) & 0xFF) - (ref(i) & 0xFF))
            if (d > 0) { nbad += 1; if (first < 0) first = i; if (d > worst) worst = d }
            i += 1
          }
          if (nbad == 0) None
          else Some(s"$tag: $nbad/${ref.length} differ, worst $worst, first at " +
            s"(${first % rowW}, ${first / rowW}) got ${got(first) & 0xFF} want ${ref(first) & 0xFF}")
        }
        if (sys.env.contains("VP8_MBDIFF")) {
          val mbw = (w + 15) / 16; val mbh = (h + 15) / 16
          val counts = Array.ofDim[Int](mbh, mbw)
          var i2 = 0
          while (i2 < w * h) {
            if (y(i2) != refY(i2)) counts((i2 / w) / 16)((i2 % w) / 16) += 1
            i2 += 1
          }
          println("Y diffs per MB: " + counts.map(_.mkString(",")).mkString(" / "))
          // 4x4-subblock diff grid of MB0
          val sb = Array.ofDim[Int](4, 4)
          var yy = 0
          while (yy < 16 && yy < h) {
            var xx = 0
            while (xx < 16 && xx < w) {
              if (y(yy * w + xx) != refY(yy * w + xx)) sb(yy / 4)(xx / 4) += 1
              xx += 1
            }
            yy += 1
          }
          println("MB0 4x4 grid: " + sb.map(_.mkString(",")).mkString(" / "))
        }
        val errs = diff("Y", y, refY, w).toSeq ++ diff("U", u, refU, uw) ++
          diff("V", v, refV, uw)
        val rgba = graft.multimodal.Webp.decodeWebpRgba(1L, webp)._3
        val errs2 = errs ++ diff("RGBA", rgba, refRgba, w * 4)
        if (errs2.isEmpty) { pass += 1; println(s"OK   ${Paths.get(name).getFileName}") }
        else println(s"FAIL ${Paths.get(name).getFileName}: ${errs2.mkString(" | ")}")
      } catch {
        case e: Exception =>
          println(s"ERR  ${Paths.get(name).getFileName}: ${e.getMessage}")
      }
    }
    println(s"$pass/${names.size} vectors exact")
  }
}
