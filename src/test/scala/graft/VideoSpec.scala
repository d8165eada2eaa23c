package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{MediaDedup, Multimodal}
import graft.multimodal.Multimodal.{Containers, MediaRow}

/** REAL AVI video decode + perceptual video dedup: the RIFF/DIB walk
  * ([[Multimodal.decodeAviRgb]]), frame sampling, per-frame dHash, the
  * shared-frame containment near-dup, clusters, and the temporal
  * descriptor. */
class VideoSpec extends SparkSpec {

  private lazy val docs =
    graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")

  // planted per-channel formula: frame f's channel c at (x, y)
  private def plant(id: Long)(f: Int, x: Int, y: Int, c: Int): Int =
    ((id * 31 + f * 19 + x * 7 + y * 13 + c * 91) % 256).toInt

  test("aviFull round-trips through decodeAviRgb, including row padding") {
    // w = 5 → rowSize 16 with 1 pad byte per row; bottom-up flip exercised
    for (w <- Seq(5, 8); h <- Seq(4, 9); nf <- Seq(1, 3)) {
      val payload = Containers.aviFull(w, h, nf, plant(7L))
      val (dw, dh, frames) = Multimodal.decodeAviRgb(7L, payload)
      assert(dw === w && dh === h && frames.length === nf)
      for (f <- 0 until nf; y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        assert((frames(f)(3 * (y * w + x) + c) & 0xFF) === plant(7L)(f, x, y, c),
          s"w=$w h=$h f=$f x=$x y=$y c=$c")
    }
  }

  test("compressed frame chunks and frame-count mismatches fail fast by name") {
    val payload = Containers.aviFull(6, 5, 2, plant(1L))
    // patch the first movi frame chunk's fourcc '00db' -> '00dc'
    val compressed = payload.clone()
    val moviData = 212 + 8 + 4 // LIST hdr + 'movi'
    assert(new String(compressed, moviData, 4, "US-ASCII") === "00db")
    compressed(moviData + 3) = 'c'.toByte
    val e1 = intercept[IllegalArgumentException](
      Multimodal.decodeAviRgb(1L, compressed))
    assert(e1.getMessage.contains("compressed"))
    // patch dwTotalFrames (offset 48) to disagree with the movi chunks
    val mismatched = payload.clone()
    mismatched(48) = 9
    val e2 = intercept[IllegalArgumentException](
      Multimodal.decodeAviRgb(1L, mismatched))
    assert(e2.getMessage.contains("declares"))
  }

  test("MJPEG AVI decodes identically to its uncompressed twin (one " +
    "baseline JPEG per '00dc' chunk), and codec mismatches fail by name") {
    import graft.multimodal.Jpeg
    val w = 24; val h = 16; val nf = 3
    def blockVal(f: Int, bx: Int, by: Int): Int =
      (f * 29 + bx * bx * 9 + by * by * 5 + bx * by * 3 + 40) % 256
    val dib = Containers.aviFull(w, h, nf,
      (f, x, y, _) => blockVal(f, x / 8, y / 8))
    val jpegs = Array.tabulate(nf)(f => Jpeg.encodeGrayBlocks(w, h,
      Array.tabulate((w / 8) * (h / 8))(k =>
        blockVal(f, k % (w / 8), k / (w / 8)))))
    val mjpeg = Containers.aviMjpeg(w, h, jpegs)
    val (dw, dh, dFrames) = Multimodal.decodeAviRgb(60L, dib)
    val (mw, mh, mFrames) = Multimodal.decodeAviRgb(61L, mjpeg)
    assert((dw, dh) === ((mw, mh)) && dFrames.length === mFrames.length)
    for (f <- 0 until nf)
      assert(dFrames(f).toSeq === mFrames(f).toSeq, s"frame $f")
    // a '00db' chunk inside an MJPG-declared stream fails by name
    val wrongCodec = mjpeg.clone()
    val moviData = 212 + 8 + 4
    assert(new String(wrongCodec, moviData, 4, "US-ASCII") === "00dc")
    wrongCodec(moviData + 3) = 'b'.toByte
    val e1 = intercept[IllegalArgumentException](
      Multimodal.decodeAviRgb(62L, wrongCodec))
    assert(e1.getMessage.contains("MJPG stream"), e1.getMessage)
    // an MJPG frame whose JPEG dims disagree with avih fails by name
    val e2 = intercept[IllegalArgumentException](
      Multimodal.decodeAviRgb(63L, Containers.aviMjpeg(w + 8, h, jpegs)))
    assert(e2.getMessage.contains("avih declares"), e2.getMessage)
  }

  test("aviFrameStats: census matches the planted formula; everyN samples") {
    import spark.implicits._
    val media = spark.createDataset(Seq(
      MediaRow(3L, "video", Containers.aviFull(6, 5, 4, plant(3L)), 6, 5, 4)))
    val all = Multimodal.aviFrameStats(media).collect().sortBy(_.frame_idx)
    assert(all.map(_.frame_idx).toSeq === Seq(0, 1, 2, 3))
    all.foreach { st =>
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until 5; x <- 0 until 6) {
        sr += plant(3L)(st.frame_idx, x, y, 0)
        sg += plant(3L)(st.frame_idx, x, y, 1)
        sb += plant(3L)(st.frame_idx, x, y, 2)
      }
      assert((st.width, st.height, st.n_pixels) === (6, 5, 30L))
      assert((st.sum_r, st.sum_g, st.sum_b) === (sr, sg, sb))
    }
    val sampled = Multimodal.aviFrameStats(media, everyN = 2).collect()
    assert(sampled.map(_.frame_idx).sorted.toSeq === Seq(0, 2))
  }

  test("a video frame and a PNG of the same content share one dHash") {
    import spark.implicits._
    val w = 16; val h = 12
    def gray(x: Int, y: Int): Int = ((x * 37 + y * 11) % 256 + 256) % 256
    val avi = Containers.aviFull(w, h, 1, (_, x, y, _) => gray(x, y))
    val png = Containers.pngFull(w, h,
      i => if (i % 4 == 3) 255 else gray((i / 4) % w, (i / 4) / w))
    val (dw, dh, frames) = Multimodal.decodeAviRgb(5L, avi)
    val frameHash = MediaDedup.dhashOneFrame(5L, dw, dh, frames(0))
    assert(frameHash === MediaDedup.dhashOneImage(6L, png))
  }

  test("videoNearDups equals brute force over the frame hashes") {
    val media = MediaDedup.syntheticNearDupVideos(
      docs.filter(col("doc_id") < 60)).cache()
    val fh = MediaDedup.videoFrameHashes(media, everyN = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byMedia = fh.groupBy(_._1).view.mapValues(_.map(v => (v._2, v._3))).toMap
    val ids = byMedia.keys.toSeq.sorted
    val expected = (for {
      a <- ids; b <- ids if a < b
      fa = byMedia(a); fb = byMedia(b)
      matchedA = fa.count(x => fb.exists(y =>
        java.lang.Long.bitCount(x._2 ^ y._2) <= 3))
      matchedB = fb.count(y => fa.exists(x =>
        java.lang.Long.bitCount(x._2 ^ y._2) <= 3))
      frac = math.min(matchedA.toDouble / fa.length,
        matchedB.toDouble / fb.length)
      if frac >= 0.5
    } yield (a, b, matchedA.toLong, matchedB.toLong, frac)).toSet
    val got = MediaDedup.videoNearDups(media, everyN = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    assert(got === expected)
    // every planted (base, near-dup) pair surfaces at full containment
    (0L until 20L).foreach { g =>
      assert(got.exists(p => p._1 == 3 * g && p._2 == 3 * g + 1 && p._5 == 1.0),
        s"group $g: base/near-dup pair missing or below full match")
    }
    media.unpersist()
  }

  test("videoClusters partitions the corpus with min-id labels") {
    val media = MediaDedup.syntheticNearDupVideos(
      docs.filter(col("doc_id") < 60)).cache()
    val pairs = MediaDedup.videoNearDups(media, everyN = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val labels = MediaDedup.videoClusters(media, everyN = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(labels.map(_._1).toSet === (0L until 60L).toSet)
    val byCluster = labels.groupBy(_._2)
    // min-id labeling + window-consistent sizes
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_._1).min === cid)
      members.foreach(m => assert(m._3 === members.length.toLong))
    }
    // edges never straddle clusters
    val labelOf = labels.map(m => m._1 -> m._2).toMap
    pairs.foreach { case (a, b) => assert(labelOf(a) === labelOf(b)) }
    media.unpersist()
  }

  test("shotLabels matches a brute-force replay; keyframes are shot minima") {
    val media = MediaDedup.syntheticShotVideos(
      docs.filter(col("doc_id") < 40)).cache()
    val fh = MediaDedup.videoFrameHashes(media, everyN = 1).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val expected = fh.groupBy(_._1).toSeq.flatMap { case (id, rows) =>
      val byF = rows.sortBy(_._2)
      var shot = 0L
      byF.toSeq.map { case (_, f, h) =>
        if (f > 0) {
          val prev = byF(f - 1)._3
          if (java.lang.Long.bitCount(prev ^ h) > 10) shot += 1
        }
        (id, f, shot)
      }
    }.toSet
    val got = MediaDedup.shotLabels(media).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got === expected)
    // every video has >= 2 shots (a planted cut every 3 frames) and the
    // keyframe of each shot is its first frame
    val shotsPerVideo = got.groupBy(_._1).view.mapValues(_.map(_._3).max + 1)
    assert(shotsPerVideo.forall(_._2 >= 2), "planted cuts missing")
    val kf = MediaDedup.shotKeyframes(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val expectedKf = got.groupBy(x => (x._1, x._3)).map { case ((id, s), ms) =>
      (id, s, ms.map(_._2).min)
    }.toSet
    assert(kf === expectedKf)
    media.unpersist()
  }

  test("videoImageMatches: a probe hits its source video across modality") {
    val vids = MediaDedup.syntheticNearDupVideos(
      docs.filter(col("doc_id") < 45)).cache()
    val imgs = MediaDedup.syntheticProbeImages(
      docs.filter(col("doc_id") < 45)).cache()
    val got = MediaDedup.videoImageMatches(vids, imgs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSet
    // brute force from the component hashes
    val vf = MediaDedup.videoFrameHashes(vids, everyN = 1).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val ih = MediaDedup.imageDHash(imgs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = (for {
      (vid, f, vh) <- vf; (iid, h) <- ih
      d = java.lang.Long.bitCount(vh ^ h) if d <= 3
    } yield (vid, f, iid, d)).toSet
    assert(got === expected)
    // planted contract: probe 3g hits video 3g at frame 1, Hamming 0
    (0L until 15L).foreach { g =>
      assert(got.contains((3 * g, 1, 3 * g, 0)), s"group $g probe miss")
    }
    vids.unpersist(); imgs.unpersist()
  }

  test("videoDescriptors: doubled self-concatenation scores cosine 1") {
    import spark.implicits._
    val w = 10; val h = 9
    def px(f: Int, x: Int, y: Int, c: Int): Int =
      ((f * 23 + x * 13 + y * 5 + c * 7) % 256 + 256) % 256
    val base = Containers.aviFull(w, h, 2, px)
    // frames [0, 1, 0, 1]: with everyN = 1 the descriptor is exactly 2x
    val doubled = Containers.aviFull(w, h, 4, (f, x, y, c) => px(f % 2, x, y, c))
    val distinct = Containers.aviFull(w, h, 2,
      (f, x, y, c) => ((f * 31 + x * 29 + y * 17 + c * 3 + 128) % 256))
    val media = spark.createDataset(Seq(
      MediaRow(0L, "video", base, w, h, 2),
      MediaRow(1L, "video", doubled, w, h, 4),
      MediaRow(2L, "video", distinct, w, h, 2)))
    val desc = MediaDedup.videoDescriptors(media, everyN = 1)
    val d = desc.collect().map(r =>
      r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    assert(d(1L).toSeq === d(0L).map(_ * 2).toSeq)
    val top = graft.sim.Similarity.bruteForceTopK(desc,
        desc.filter(col("vec_id") === 0L), 1).collect()
    assert(top.length === 1)
    assert(top(0).getAs[Long]("neighbor_id") === 1L)
    assert(math.abs(top(0).getAs[Double]("cos_sim") - 1.0) < 1e-12)
  }

  test("animated GIF: all frames decode through per-frame LZW; an AVI " +
    "and its animated-GIF re-encode collide frame-for-frame; " +
    "partial frames stay outside the index-census contract by name") {
    val w = 10; val h = 9; val nf = 3
    def v(f: Int, x: Int, y: Int): Int = (f * 31 + x * 7 + y * 13) % 256
    val grayPalette = Array.tabulate(256 * 3)(b => (b / 3).toByte)
    val gif = Containers.gifAnimated(w, h, nf,
      (f, k) => v(f, k % w, k / w), grayPalette, minCodeSize = 8)
    val (gw, gh, idxFrames, pal, _) = Multimodal.decodeGifFrames(7L, gif)
    assert(gw === w && gh === h && idxFrames.length === nf)
    for (f <- 0 until nf; k <- 0 until w * h)
      assert(idxFrames(f)(k) === v(f, k % w, k / w), s"f=$f k=$k")
    assert((pal(0)(3 * 5) & 0xFF) === 5)
    // the format-blind video decode maps the identity palette to r=g=b
    val avi = Containers.aviFull(w, h, nf, (f, x, y, _) => v(f, x, y))
    val (aw, ah, aviFrames) = Multimodal.decodeVideoRgb(8L, avi)
    val (bw, bh, gifFrames) = Multimodal.decodeVideoRgb(9L, gif)
    assert((aw, ah) === ((bw, bh)))
    for (f <- 0 until nf)
      assert(aviFrames(f).toSeq === gifFrames(f).toSeq, s"frame $f")
    // a REAL partial-frame animation stays outside the index-census
    // contract by name — while the composited RGB decode handles it
    val partial = Containers.gifAnimatedPartial(4, 4, Seq(
      Containers.GifFrameSpec(0, 0, 4, 4, k => k % 4),
      Containers.GifFrameSpec(1, 1, 2, 2, _ => 3)),
      Array.tabulate(4 * 3)(b => (b / 3).toByte), minCodeSize = 2)
    val e = intercept[IllegalArgumentException](
      Multimodal.decodeGifFrames(10L, partial))
    assert(e.getMessage.contains("full-frame"), e.getMessage)
    assert(Multimodal.decodeVideoRgb(11L, partial)._3.length === 2)
  }

  test("composited animated GIF: partial rects, transparency, and the " +
    "disposal methods replay the canvas algebra exactly") {
    import Containers.GifFrameSpec
    val pal = Array.tabulate(8 * 3)(b => ((b / 3) * 30).toByte) // gray j*30
    // screen 6x4, background index 1 (gray 30):
    // f0 full at index 2 (gray 60), disposal 2 (restore to bg after);
    // f1 rect (2,1,3,2) at index 3 (gray 90) with local (0,0) transparent,
    //    disposal 3 (restore to previous after);
    // f2 rect (0,0,2,2) at index 4 (gray 120)
    val gif = Containers.gifAnimatedPartial(6, 4, Seq(
      GifFrameSpec(0, 0, 6, 4, _ => 2, disposal = 2),
      GifFrameSpec(2, 1, 3, 2, k => if (k == 0) 7 else 3, disposal = 3,
        transparentIdx = 7),
      GifFrameSpec(0, 0, 2, 2, _ => 4)), pal, bgIndex = 1)
    val (w, h, frames) = Multimodal.decodeVideoRgb(90L, gif)
    assert((w, h) === ((6, 4)) && frames.length === 3)
    def at(f: Int, x: Int, y: Int) = frames(f)(3 * (y * 6 + x)) & 0xFF
    for (y <- 0 until 4; x <- 0 until 6) assert(at(0, x, y) === 60, s"f0 ($x,$y)")
    // f0's disposal 2 restored the full-screen rect to bg before f1: the
    // transparent pixel shows BACKGROUND, not f0's content
    for (y <- 0 until 4; x <- 0 until 6) {
      val in = x >= 2 && x <= 4 && y >= 1 && y <= 2
      val expect = if (in && !(x == 2 && y == 1)) 90 else 30
      assert(at(1, x, y) === expect, s"f1 ($x,$y)")
    }
    // f1's disposal 3 restored the pre-f1 canvas (all bg) before f2
    for (y <- 0 until 4; x <- 0 until 6) {
      val expect = if (x < 2 && y < 2) 120 else 30
      assert(at(2, x, y) === expect, s"f2 ($x,$y)")
    }
    // disposal 1 (keep): the f1 content persists under f2 instead
    val keep = Containers.gifAnimatedPartial(6, 4, Seq(
      GifFrameSpec(0, 0, 6, 4, _ => 2, disposal = 1),
      GifFrameSpec(2, 1, 3, 2, k => if (k == 0) 7 else 3, disposal = 1,
        transparentIdx = 7),
      GifFrameSpec(0, 0, 2, 2, _ => 4)), pal, bgIndex = 1)
    val (_, _, kf) = Multimodal.decodeVideoRgb(92L, keep)
    def kat(f: Int, x: Int, y: Int) = kf(f)(3 * (y * 6 + x)) & 0xFF
    // transparent pixel now shows f0's 60; f2 overlays the kept canvas
    assert(kat(1, 2, 1) === 60 && kat(1, 3, 1) === 90)
    assert(kat(2, 3, 1) === 90 && kat(2, 0, 0) === 120 && kat(2, 5, 3) === 60)
    // a frame rect exceeding the screen fails by name (patched bytes —
    // the builder refuses to construct one)
    val bad = Containers.gifAnimatedPartial(6, 4,
      Seq(GifFrameSpec(0, 0, 3, 2, _ => 1)), pal).clone()
    val imgOff = bad.indexOf(0x2C.toByte)
    bad(imgOff + 1) = 5 // left 0 -> 5: rect 5+3 > 6
    val e = intercept[IllegalArgumentException](
      Multimodal.decodeVideoRgb(93L, bad))
    assert(e.getMessage.contains("exceeds the"), e.getMessage)
  }

  test("animated GIF with per-frame LOCAL palettes + interlacing decodes " +
    "to the same frames as its AVI twin (no global table at all)") {
    val w = 10; val h = 9; val nf = 3
    def v(f: Int, x: Int, y: Int): Int = (f * 31 + x * 7 + y * 13) % 256
    // frame f's local palette maps index i -> gray (i + f) mod 256, so the
    // INDEX streams differ per frame while the displayed pixels match the
    // twin — a decoder that applied one shared palette would mismatch
    val gif = Containers.gifAnimated(w, h, nf,
      (f, k) => (v(f, k % w, k / w) - f + 256) % 256,
      null, minCodeSize = 8, interlaced = true,
      localPalette = f =>
        Array.tabulate(256 * 3)(b => ((b / 3 + f) % 256).toByte))
    val avi = Containers.aviFull(w, h, nf, (f, x, y, _) => v(f, x, y))
    val (aw, ah, aviFrames) = Multimodal.decodeVideoRgb(70L, avi)
    val (gw, gh, gifFrames) = Multimodal.decodeVideoRgb(71L, gif)
    assert((aw, ah) === ((gw, gh)) && aviFrames.length === gifFrames.length)
    for (f <- 0 until nf)
      assert(aviFrames(f).toSeq === gifFrames(f).toSeq, s"frame $f")
  }

  test("videoClipMatches: a frame-decimated clip hits its source at " +
    "clip_frac 1, which two-sided containment structurally misses") {
    val media = MediaDedup.syntheticNearDupVideos(
      docs.filter(col("doc_id") < 60)).cache()
    val clips = MediaDedup.syntheticVideoClips(
      docs.filter(col("doc_id") < 60)).cache()
    val got = MediaDedup.videoClipMatches(clips, media, everyN = 2)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // every role-0 clip fully matches its group's role-0 source video
    val role0Clips = (0L until 60L).filter(id => id % 2 == 0 && id % 4 == 0)
    role0Clips.foreach { c =>
      val src = c - c % 3
      assert(got.get((c, src)).exists(_._3 == 1.0),
        s"clip $c missing full match against source $src in $got")
    }
    // ...and the same pairs are invisible to two-sided containment when
    // the source has > 4 frames (clip covers <= 2 of >= 3 sampled frames,
    // so least() < 1; at exactly 4 source frames both sample to 2 and the
    // pair legitimately surfaces two-sided). Clip ids shift by 1000 in
    // the union — they share the id domain with their source videos.
    val spark2 = spark
    import spark2.implicits._
    val shifted = clips.toDF()
      .withColumn("media_id", col("media_id") + lit(1000L))
      .as[Multimodal.MediaRow]
    val twoSided = MediaDedup.videoNearDups(
        media.unionByName(shifted), everyN = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute one-sided check: got == brute force over the frame hashes
    val cf = MediaDedup.videoFrameHashes(clips, everyN = 1).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val vf = MediaDedup.videoFrameHashes(media, everyN = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byClip = cf.groupBy(_._1)
    val byVid = vf.groupBy(_._1)
    val brute = (for {
      (c, cfs) <- byClip.toSeq
      (v, vfs) <- byVid.toSeq
      matched = cfs.count(x => vfs.exists(y =>
        java.lang.Long.bitCount(x._3 ^ y._3) <= 3))
      frac = matched.toDouble / cfs.length
      if frac >= 0.5
    } yield ((c, v), (matched.toLong, cfs.length.toLong, frac))).toMap
    assert(got === brute)
    // the structural-miss claim, asserted not narrated: a clip of a
    // 5-or-6-frame source never surfaces in the two-sided pair set
    role0Clips.filter(c => (4 + (c / 3) % 3) > 4).foreach { c =>
      val src = c - c % 3
      assert(!twoSided.contains((src, c + 1000L)),
        s"two-sided containment unexpectedly found clip $c in source $src")
    }
    media.unpersist(); clips.unpersist()
  }

  test("MJPEG AVI total decoded volume is bounded by name: a few-KB " +
    "DC-only chunk at large declared dims cannot amplify into an OOM") {
    import graft.multimodal.Jpeg
    // 8192x4104 = 33.6M px > MaxDecodePixels/2: frame 1 decodes (33.6M
    // <= 67.1M), frame 2's pre-decode volume check (67.2M) fails by name
    // BEFORE the second decode allocates anything
    val w = 8192; val h = 4104
    // constant blocks: every DC diff after the first is 0, so the
    // payload stays tiny while the declared decode volume is huge
    val grays = Array.fill((w / 8) * (h / 8))(128)
    val big = Jpeg.encodeGrayBlocks(w, h, grays)
    // ~1.5 bytes/block is the entropy-coded floor for 525k blocks; the
    // decode this payload declares is 2 frames x 100 MB of RGB — >250x
    assert(big.length < 1000000, s"DC-only JPEG is ${big.length} B — the " +
      "amplification premise (small payload, huge decode) must hold")
    val hostile = Containers.aviMjpeg(w, h, Array(big, big))
    val e = intercept[IllegalArgumentException](
      Multimodal.decodeAviRgb(95L, hostile))
    assert(e.getMessage.contains("decoded volume exceeds"), e.getMessage)
  }

  test("decode-health census uses the OPERATOR-SURFACE decoders: a " +
    "partial-frame animated GIF counts as decoded, not partial_frame_gif") {
    import Containers.GifFrameSpec
    val spark2 = spark
    import spark2.implicits._
    val pal = Array.tabulate(16 * 3)(b => ((b / 3) * 16).toByte)
    val partial = Containers.gifAnimatedPartial(10, 8, Seq(
      GifFrameSpec(0, 0, 10, 8, k => k % 16),
      GifFrameSpec(2, 3, 5, 4, k => (k * 3) % 16, disposal = 2,
        transparentIdx = 1)), pal)
    val fullFrame = Containers.gifFull(8, 8, k => k % 16, pal,
      minCodeSize = 4)
    val rows = Seq(
      MediaRow(0L, "image", partial, 10, 8, 2),
      MediaRow(1L, "image", fullFrame, 8, 8, 1),
      MediaRow(2L, "image", Array.tabulate[Byte](8)(_.toByte), 0, 0, 1))
    val got = Multimodal.mediaDecodeHealth(rows.toDS())
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet
    assert(got === Set(
      ("gif", "decoded", "none", 2L),
      ("unknown", "skipped", "unknown_magic", 1L)), got.toString)
  }
}
