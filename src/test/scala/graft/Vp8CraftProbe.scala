package graft

import java.nio.file.{Files, Paths}
import graft.multimodal.{Vp8, Vp8Enc}
import graft.multimodal.Vp8Enc.MbSpec

/** Dev harness: craft VP8 streams with controlled token paths, write
  * them plus my decoder's YUV to /tmp/vp8craft; tools/vp8_craft_check.py
  * then decodes each with the system libwebp and diffs. Finds exactly
  * which token/mode path disagrees with the reference. */
object Vp8CraftProbe {
  def main(args: Array[String]): Unit = {
    val dir = Paths.get("/tmp/vp8craft")
    Files.createDirectories(dir)

    def zeros = Array.fill(16)(0)
    def lv(pairs: (Int, Int)*): Array[Int] = {
      val a = Array.fill(16)(0)
      pairs.foreach { case (pos, v) => a(pos) = v }
      a
    }
    def mbB(bmodes: Array[Int], y: Array[Array[Int]],
            u: Array[Array[Int]] = Array.fill(4)(zeros),
            v: Array[Array[Int]] = Array.fill(4)(zeros)): MbSpec =
      MbSpec(4, bmodes, 0, zeros, y, u, v)
    def mb16(ymode: Int, uvmode: Int, y2: Array[Int], y: Array[Array[Int]],
             u: Array[Array[Int]] = Array.fill(4)(zeros),
             v: Array[Array[Int]] = Array.fill(4)(zeros)): MbSpec =
      MbSpec(ymode, null, uvmode, y2, y, u, v)
    val allDc = Array.fill(16)(0)

    val cases = Seq[(String, Int, Int, Int, Array[MbSpec])](
      // c01: one DC token in block 0
      ("c01_dc1", 16, 16, 60,
        Array(mbB(allDc, Array.tabulate(16)(i => if (i == 0) lv(0 -> 1) else zeros)))),
      // c02: small literal tokens 1..4 in separate blocks
      ("c02_lit", 16, 16, 60,
        Array(mbB(allDc, Array.tabulate(16)(i =>
          if (i < 4) lv(0 -> (i + 1)) else zeros)))),
      // c03: cat1..cat6 values
      ("c03_cats", 16, 16, 60,
        Array(mbB(allDc, Array.tabulate(16)(i => i match {
          case 0 => lv(0 -> 5)
          case 1 => lv(0 -> 8)
          case 2 => lv(0 -> 12)
          case 3 => lv(0 -> 20)
          case 4 => lv(0 -> 40)
          case 5 => lv(0 -> 70)
          case 6 => lv(0 -> -100)
          case 7 => lv(0 -> 300)
          case _ => zeros
        })))),
      // c04: zero runs in scan order (leading, mid, multiple)
      ("c04_zruns", 16, 16, 60,
        Array(mbB(allDc, Array.tabulate(16)(i => i match {
          case 0 => lv(1 -> 2) // scan [0, v, ...]: leading zero
          case 1 => lv(0 -> 3, 4 -> 2) // scan 0 then zero-run to pos 2
          case 2 => lv(0 -> 1, 8 -> -2) // longer run (scan pos 3)
          case 3 => lv(2 -> 1, 3 -> 2) // zeros between values
          case 4 => lv(5 -> 1) // scan pos 5 after 5 zeros
          case _ => zeros
        })))),
      // c05: full block, value at scan position 15 (no EOB coded)
      ("c05_full", 16, 16, 60,
        Array(mbB(allDc, Array.tabulate(16)(i =>
          if (i == 0) Array.fill(16)(1)
          else if (i == 1) lv(15 -> 2) // natural 15 = scan 15
          else zeros)))),
      // c06: 16x16 DC mode with Y2 values (WHT path + y-after-y2 blocks)
      ("c06_y2", 16, 16, 60,
        Array(mb16(0, 0, lv(0 -> 2, 1 -> 1),
          Array.tabulate(16)(i => if (i < 2) lv(1 -> 1, 5 -> -1) else zeros)))),
      // c07: chroma tokens with context chains
      ("c07_uv", 16, 16, 60,
        Array(mbB(allDc, Array.fill(16)(zeros),
          u = Array.tabulate(4)(i => if (i != 3) lv(0 -> (i + 1)) else zeros),
          v = Array.tabulate(4)(i => lv(0 -> -1, 2 -> 1))))),
      // c08: 2x2 macroblocks, nz contexts crossing MB boundaries
      ("c08_mbctx", 32, 32, 60, {
        val m0 = mbB(allDc, Array.tabulate(16)(i => lv(0 -> ((i % 3) + 1))))
        val m1 = mbB(allDc, Array.tabulate(16)(i =>
          if (i % 2 == 0) lv(0 -> 2, 1 -> -1) else zeros))
        val m2 = mb16(2, 1, lv(0 -> 3),
          Array.fill(16)(lv(1 -> 2)),
          u = Array.fill(4)(lv(0 -> 1)))
        val m3 = mbB(allDc, Array.fill(16)(zeros))
        Array(m0, m1, m2, m3)
      }),
      // c09: all ten B_PRED modes (prediction parity with libwebp)
      ("c09_bmodes", 32, 32, 60, {
        val modes0 = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 0, 1, 2, 3, 4, 5)
        val modes1 = Array(9, 8, 7, 6, 5, 4, 3, 2, 1, 0, 9, 8, 7, 6, 5, 4)
        val y = Array.tabulate(16)(i => lv(0 -> ((i % 5) - 2)))
        Array(mbB(modes0, y), mbB(modes1, y),
          mb16(3, 3, lv(0 -> 1), Array.fill(16)(zeros)),
          mbB(modes0.reverse, y))
      }),
      // c10: every 16x16 mode + uv modes across a row (context memset)
      ("c10_modes16", 64, 16, 60,
        Array(
          mb16(0, 0, lv(0 -> 2), Array.fill(16)(zeros)),
          mb16(1, 1, lv(0 -> -2), Array.fill(16)(zeros)),
          mb16(2, 2, lv(1 -> 2), Array.fill(16)(zeros)),
          mb16(3, 3, lv(0 -> 1, 2 -> -1), Array.fill(16)(zeros)))),
      // c11: trailing explicit zeros reach scan 16 in the decoder
      ("c11_zto16", 16, 16, 60,
        Array(mbB(allDc, Array.tabulate(16)(i =>
          if (i == 0) lv(0 -> 1, 12 -> 1) else zeros))))) ++
      // bisect which b-mode/context pair diverges: one non-DC mode at
      // one subblock position per stream
      (for (m <- 1 to 9; pos <- Seq(1, 4, 5)) yield {
        val modes = Array.fill(16)(0); modes(pos) = m
        (f"cb_m${m}_p$pos", 16, 16, 60,
          Array(mbB(modes, Array.tabulate(16)(i => lv(0 -> 1)))))
      }) ++
      // pairs: mode m at sb0 then DC at sb1 (ctx row [0][m]), and
      // mode m at sb0 then m at sb4 (ctx row [m][0])
      (for (m <- 1 to 9) yield {
        val modes = Array.fill(16)(0); modes(0) = m; modes(1) = m
        modes(4) = m; modes(5) = m
        (f"cc_ctx$m", 16, 16, 60,
          Array(mbB(modes, Array.tabulate(16)(i => lv(0 -> 1)))))
      })

    // loop-filter matrix: the simple filter and sharpness > 0 are never
    // emitted by libwebp's ENCODER, so the vectors can't pin them —
    // crafted streams with those header fields cross-pin libwebp's
    // DECODE of them instead. Strong block edges (big alternating DCs)
    // make every filter branch (hev, mb-edge, subblock) fire.
    val filterCases =
      for ((ft, lvl, sh) <- Seq((0, 10, 0), (0, 35, 0), (0, 63, 7),
                                (0, 25, 3), (1, 12, 0), (1, 40, 0),
                                (1, 63, 5)))
      yield {
        val mbsF: Array[MbSpec] = Array.tabulate(4) { mi =>
          mbB(Array.tabulate(16)(i => (i + mi) % 10),
            Array.tabulate(16)(i => lv(0 -> (if ((i + mi) % 2 == 0) 40 else -40),
              1 -> (if (i % 3 == 0) 7 else 0))))
        }
        (f"cf_f${ft}_l${lvl}_s$sh", 32, 32, 60, mbsF)
      }

    val allCases = cases.map { case (n, w, h, qi, m) => (n, w, h, qi, m, 0, 0, 0) } ++
      filterCases.map { case (n, w, h, qi, m) =>
        val parts = n.split("_")
        (n, w, h, qi, m, parts(1).drop(1).toInt, parts(2).drop(1).toInt,
          parts(3).drop(1).toInt)
      }

    for ((name, w, h, qi, mbs, ft, lvl, sh) <- allCases) {
      val vp8 = Vp8Enc.encodeFrame(w, h, qi, mbs, filterType = ft,
        filterLevel = lvl, sharpness = sh)
      val webp = Vp8Enc.wrapWebp(vp8)
      Files.write(dir.resolve(s"$name.webp"), webp)
      try {
        val (dw, dh, y, u, v) = Vp8.decodeYuv(1L, webp, 20, 20 + vp8.length)
        require(dw == w && dh == h)
        val out = new java.io.ByteArrayOutputStream()
        out.write(y, 0, y.length); out.write(u, 0, u.length)
        out.write(v, 0, v.length)
        Files.write(dir.resolve(s"$name.mine"), out.toByteArray)
        println(s"GEN  $name (${vp8.length} bytes)")
      } catch {
        case e: Exception => println(s"DECFAIL $name: ${e.getMessage}")
      }
    }
  }
}
