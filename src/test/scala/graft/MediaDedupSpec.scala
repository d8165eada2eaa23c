package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{MediaDedup, Multimodal}
import graft.multimodal.Multimodal.{Containers, MediaRow}

class MediaDedupSpec extends SparkSpec {

  private lazy val docs =
    graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")

  // 16x16 image whose grayscale is planted PER 2x2 GRID BLOCK: block
  // (bx, by) has every pixel at gray(bx, by), so the 8x8 block means ARE
  // the planted values and the dHash is readable off the formula.
  private def blockImage(id: Long, gray: (Int, Int) => Int,
                         filterType: Int = 0): MediaRow = {
    val w = 16; val h = 16
    val px: Int => Int = { i =>
      if (i % 4 == 3) 255
      else {
        val k = i / 4
        gray((k % w) / 2, (k / w) / 2)
      }
    }
    MediaRow(id, "image", Containers.pngFull(w, h, px, filterType), w, h, 1)
  }

  // 570-sample PCM16 clip: window j (57 windows of 10 samples) has every
  // sample at amp(j), so window energies are 10*amp(j) exactly.
  private def windowClip(id: Long, amp: Int => Int): MediaRow = {
    val n = 570
    val body = new Array[Byte](n * 2)
    var p = 0
    while (p < n) {
      val s = amp(p / 10)
      body(2 * p) = (s & 0xFF).toByte
      body(2 * p + 1) = ((s >> 8) & 0xFF).toByte
      p += 1
    }
    MediaRow(id, "audio", Containers.wav(1, 16000, body), 0, 0, 1)
  }

  test("dHash: monotone gradient sets all 56 bits; reverse gradient none") {
    val up = blockImage(1L, (bx, _) => bx * 10)
    val down = blockImage(2L, (bx, _) => (7 - bx) * 10)
    assert(MediaDedup.dhashOneImage(1L, up.payload) === (1L << 56) - 1L)
    assert(MediaDedup.dhashOneImage(2L, down.payload) === 0L)
  }

  test("dHash is invariant to the PNG scanline filter and to brightness") {
    val base = blockImage(1L, (bx, by) => bx * 10 + by, filterType = 0)
    (1 to 4).foreach { f =>
      val refiltered = blockImage(1L, (bx, by) => bx * 10 + by, filterType = f)
      assert(MediaDedup.dhashOneImage(1L, refiltered.payload) ===
        MediaDedup.dhashOneImage(1L, base.payload), s"filter $f")
    }
    // uniform brightness shift preserves every gradient direction
    val brighter = blockImage(1L, (bx, by) => bx * 10 + by + 50)
    assert(MediaDedup.dhashOneImage(1L, brighter.payload) ===
      MediaDedup.dhashOneImage(1L, base.payload))
  }

  test("planted duplicate / 1-bit near-duplicate / distinct image triple") {
    // base: all 56 gradient bits set; near: last row's last block darkened
    // flips exactly bit 55; distinct: reverse gradient, Hamming 56
    val a = blockImage(10L, (bx, _) => bx * 10)
    val b = blockImage(11L, (bx, by) => if (bx == 7 && by == 7) 0 else bx * 10,
      filterType = 4)
    val c = blockImage(12L, (bx, _) => (7 - bx) * 10)
    val fa = MediaDedup.dhashOneImage(10L, a.payload)
    val fb = MediaDedup.dhashOneImage(11L, b.payload)
    val fc = MediaDedup.dhashOneImage(12L, c.payload)
    assert(java.lang.Long.bitCount(fa ^ fb) === 1)
    assert(java.lang.Long.bitCount(fa ^ fc) === 56)
    import spark.implicits._
    val media = Seq(a, b, c).toDS()
    val pairs = MediaDedup.imageNearDups(media, maxHamming = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2) + 0))
    assert(pairs.toSet === Set((10L, 11L, 1)))
  }

  test("audio fingerprint: planted contour triple behaves like the image one") {
    val a = windowClip(20L, j => j * 10)                        // rising: all bits
    val b = windowClip(21L, j => if (j == 56) 0 else j * 10)    // one flip
    val c = windowClip(22L, j => (56 - j) * 10)                 // falling: none
    val fa = MediaDedup.audioFingerprintOne(20L, a.payload)
    val fb = MediaDedup.audioFingerprintOne(21L, b.payload)
    val fc = MediaDedup.audioFingerprintOne(22L, c.payload)
    assert(fa === (1L << 56) - 1L)
    assert(fc === 0L)
    assert(java.lang.Long.bitCount(fa ^ fb) === 1)
    import spark.implicits._
    val media = Seq(a, b, c).toDS()
    val pairs = MediaDedup.audioNearDups(media, maxHamming = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2) + 0))
    assert(pairs.toSet === Set((20L, 21L, 1)))
  }

  test("banded image near-dups equal brute-force all-pairs on the fixtures") {
    val media = MediaDedup.syntheticNearDupImages(docs.filter(col("doc_id") < 120))
    val fps = MediaDedup.imageDHash(media).persist()
    val brute = fps.as("x").join(fps.as("y"),
        col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("media_a"), col("y.media_id").as("media_b"),
        bit_count(col("x.dhash").bitwiseXOR(col("y.dhash"))).as("hamming"))
      .filter(col("hamming") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = MediaDedup.imageNearDups(media, maxHamming = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded === brute)
    assert(banded.nonEmpty, "fixtures should plant at least one near-dup pair")
    fps.unpersist()
  }

  test("banded audio near-dups equal brute-force all-pairs on the fixtures") {
    val media = MediaDedup.syntheticNearDupAudio(docs.filter(col("doc_id") < 120))
    val fps = MediaDedup.audioFingerprint(media).persist()
    val brute = fps.as("x").join(fps.as("y"),
        col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("media_a"), col("y.media_id").as("media_b"),
        bit_count(col("x.afp").bitwiseXOR(col("y.afp"))).as("hamming"))
      .filter(col("hamming") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = MediaDedup.audioNearDups(media, maxHamming = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded === brute)
    assert(banded.nonEmpty, "fixtures should plant at least one near-dup pair")
    fps.unpersist()
  }

  test("cross-format: a PNG and its GIF re-encode collide on dHash exactly") {
    // identical grayscale content through two entirely different codecs
    val w = 16; val h = 16
    def v(k: Int): Int = ((k % w) * 9 + (k / w) * 5) % 256
    val png = Containers.pngFull(w, h,
      i => if (i % 4 == 3) 255 else v(i / 4), filterType = 3)
    val gif = Containers.gifFull(w, h, v,
      Array.tabulate(256 * 3)(b => (b / 3).toByte), minCodeSize = 8)
    assert(MediaDedup.dhashOneImage(1L, png) ===
      MediaDedup.dhashOneImage(2L, gif))
    // and the banded pair surfaces at Hamming 0 in a mixed-format corpus
    val media = MediaDedup.syntheticCrossFormatImages(docs.filter(col("doc_id") < 40))
    val pairs = MediaDedup.imageNearDups(media, maxHamming = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val planted = (0 until 20).map(g => (2L * g, 2L * g + 1, 0)).toSet
    assert(planted.subsetOf(pairs),
      s"missing cross-format pairs: ${planted.diff(pairs)}")
  }

  test("perceptual clusters partition the corpus; cross-format pairs co-cluster") {
    val media = MediaDedup.syntheticCrossFormatImages(docs.filter(col("doc_id") < 40))
    val lab = MediaDedup.imageClusters(media).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // every planted PNG/GIF pair shares a cluster
    (0 until 20).foreach { g =>
      assert(lab(2L * g)._1 === lab(2L * g + 1)._1, s"group $g")
    }
    // min-id labeling and a well-defined partition (sizes sum to |corpus|)
    lab.foreach { case (id, (cid, sz)) => assert(cid <= id && sz >= 2) }
    assert(lab.values.groupBy(_._1).map(_._2.head._2).sum === 40L)
    // audio twin: a duplicate contour co-clusters, a distinct one self-labels
    import spark.implicits._
    val clips = Seq(windowClip(1L, j => j * 10), windowClip(2L, j => j * 10),
      windowClip(3L, j => (56 - j) * 10)).toDS()
    val alab = MediaDedup.audioClusters(clips).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(alab(1L) === 1L && alab(2L) === 1L && alab(3L) === 3L)
  }

  test("content descriptors replay the planted formula and match across codecs") {
    val w = 16; val h = 16
    def v(k: Int): Int = ((k % w) * 9 + (k / w) * 5) % 256
    val png = Containers.pngFull(w, h, i => if (i % 4 == 3) 255 else v(i / 4))
    val gif = Containers.gifFull(w, h, v,
      Array.tabulate(256 * 3)(b => (b / 3).toByte), minCodeSize = 8)
    val dp = MediaDedup.descriptorOneImage(1L, png)
    assert(dp.toSeq === MediaDedup.descriptorOneImage(2L, gif).toSeq)
    // hand replay: per-channel histograms (identical — r=g=b) + grid means
    val hist = new Array[Long](8)
    val sums = new Array[Long](64); val cnts = new Array[Long](64)
    for (k <- 0 until w * h) {
      hist(v(k) / 32) += 1
      val b = ((k / w) / 2) * 8 + (k % w) / 2
      sums(b) += v(k); cnts(b) += 1
    }
    val expected = (0 until 3).flatMap(_ => hist.map(_.toDouble)) ++
      (0 until 64).map(b => (sums(b) / cnts(b)).toDouble)
    assert(dp.toSeq === expected)
    // the nearest neighbor of a probe is its cross-format twin at cosine 1
    import spark.implicits._
    val media = MediaDedup.syntheticCrossFormatImages(docs.filter(col("doc_id") < 30))
    val desc = MediaDedup.imageDescriptors(media).persist()
    val top = graft.sim.Similarity.bruteForceTopK(desc,
      desc.filter(col("vec_id") === 0L), 3).collect().sortBy(_.getInt(3))
    assert(top.head.getLong(1) === 1L)
    assert(top.head.getDouble(2) === 1.0)
    desc.unpersist()
  }

  test("audio descriptors: volume-scaled copy at cosine 1; energies replayed") {
    import spark.implicits._
    // clip 2 = clip 1 at half volume (same contour), clip 3 distinct
    val a = windowClip(1L, j => j * 20)
    val b = windowClip(2L, j => j * 10)
    val c = windowClip(3L, j => (56 - j) * 10)
    val desc = MediaDedup.audioDescriptors(Seq(a, b, c).toDS()).persist()
    val byId = desc.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(byId(1L) === (0 until 57).map(j => j * 20.0 * 10))
    val top = graft.sim.Similarity.bruteForceTopK(desc,
      desc.filter(col("vec_id") === 1L), 2).collect().sortBy(_.getInt(3))
    assert(top.head.getLong(1) === 2L)
    // scalar-multiple cosine is 1 up to one ulp of sqrt rounding (the
    // IDENTICAL-vector case of the image test is exactly 1.0)
    assert(math.abs(top.head.getDouble(2) - 1.0) < 1e-12)
    desc.unpersist()
  }

  test("decodePngRgba refactor preserves the q217 pixel census exactly") {
    val media = Multimodal.syntheticPixelMedia(
      docs.filter(col("doc_id") % 2 === 0 && col("doc_id") < 80))
    Multimodal.pngPixelStats(media).collect().foreach { st =>
      // replay the planting formula (media_id*31 + i) mod 256 per channel
      var sr = 0L; var sg = 0L; var sb = 0L; var sa = 0L
      val n = st.width * st.height * 4
      var i = 0
      while (i < n) {
        val v = ((st.media_id * 31 + i) % 256).toInt
        (i % 4) match {
          case 0 => sr += v; case 1 => sg += v; case 2 => sb += v
          case _ => sa += v
        }
        i += 1
      }
      assert((st.sum_r, st.sum_g, st.sum_b, st.sum_a) === ((sr, sg, sb, sa)),
        s"media ${st.media_id}")
    }
  }

  test("joint multimodal dedup: per-modality provenance flags; text+image " +
    "edges chain one cluster; a two-modality match is one flagged row") {
    import spark.implicits._
    // image i: first r grid rows ascend, the rest descend -> pairwise
    // Hamming 7*|r_i - r_j| (>= 14 for distinct, 0 for the planted pair)
    def img(id: Long, r: Int) = blockImage(id,
      (bx, by) => if (by < r) bx * 10 else (7 - bx) * 10)
    // clip t: energies rise through window t then plateau -> fingerprint
    // = t prefix ones; volume scale preserves the contour exactly
    def clip(id: Long, t: Int, scale: Int = 1) =
      windowClip(id, j => math.min(j, t) * 10 * scale)
    val capA = "the quick brown fox jumps over the lazy dog again and again"
    val capB = "another caption entirely about ships and harbors at dawn light"
    val jd = Seq(
      (1L, capA), (2L, capA),
      (3L, "three green bottles standing quietly on the wall"),
      (4L, capB), (5L, capB),
      (6L, "six silver spoons rattle inside the wooden drawer"))
      .toDF("doc_id", "text")
    val images = Seq(img(1, 0), img(2, 2), img(3, 2), img(4, 4),
      img(5, 6), img(6, 8)).toDS()
    val audio = Seq(clip(1, 10), clip(2, 20), clip(3, 30), clip(4, 50),
      clip(5, 50, scale = 2), clip(6, 40)).toDS()
    // planted: (1,2) caption-only, (2,3) image-only, (4,5) caption AND
    // audio (the two-modality case must surface as ONE row, two flags)
    val pairs = MediaDedup.multimodalNearDups(jd, images, audio)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getBoolean(2), r.getBoolean(3), r.getBoolean(4)))).toMap
    assert(pairs.keySet === Set((1L, 2L), (2L, 3L), (4L, 5L)))
    assert(pairs((1L, 2L)) === ((true, false, false)))
    assert(pairs((2L, 3L)) === ((false, true, false)))
    assert(pairs((4L, 5L)) === ((true, false, true)))
    // cross-modal chaining: caption(1,2) + image(2,3) merge {1,2,3} even
    // though no single modality links 1 and 3; singleton 6 self-labels
    val clusters = MediaDedup.multimodalClusters(jd, images, audio)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(clusters === Set(
      (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (4L, 4L, 2L), (5L, 4L, 2L), (6L, 6L, 1L)))
  }

  test("audio clip-in-track: a volume-scaled window-aligned excerpt hits " +
    "its source offset; trailing partial window dropped; banded == brute") {
    import spark.implicits._
    def pcm(id: Long, n: Int, f: Int => Int): MediaRow = {
      val body = new Array[Byte](n * 2)
      var p = 0
      while (p < n) {
        val s = f(p)
        body(2 * p) = (s & 0xFF).toByte
        body(2 * p + 1) = ((s >> 8) & 0xFF).toByte
        p += 1
      }
      MediaRow(id, "audio", Containers.wav(1, 16000, body), 0, 0, 1)
    }
    // three tracks with per-track quadratic coefficients (the fixture
    // degeneracy rule), 1000 samples = 100 absolute 10-sample windows
    def trackF(g: Int)(p: Int): Int =
      ((p.toLong * p * (29 + g * 7) + p.toLong * (11 + g * 5) + g * 53)
        % 4096).toInt - 2048
    val tracks = Seq(
      pcm(1, 1000, trackF(1)), pcm(2, 1000, trackF(2)),
      pcm(3, 1000, trackF(3))).toDS()
    // clip 10: track 2's windows [7, 64) DOUBLED in volume, plus 3 stray
    // samples (the trailing partial window must be dropped, or the last
    // window's energy — and its contour bit — would disagree)
    val clips = Seq(
      pcm(10, 573, q => 2 * trackF(2)(70 + q)),
      pcm(11, 570, q => ((q.toLong * q * 97 + q * 41 + 500) % 4096).toInt - 2048))
      .toDS()
    val got = MediaDedup.audioClipMatches(clips, tracks)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    assert(got.exists(m => m._1 == 10L && m._2 == 2L && m._3 == 7 && m._4 == 0),
      s"planted hit missing from ${got.toSeq}")
    // banded == brute force over the span prints
    val spans = MediaDedup.audioSpanFingerprints(tracks)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val cps = MediaDedup.audioSpanFingerprints(clips)
      .filter(col("offset") === 0)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val brute = (for {
      (cid, cfp) <- cps
      (tid, o, tfp) <- spans
      h = java.lang.Long.bitCount(cfp ^ tfp)
      if h <= 3
    } yield (cid, tid, o, h)).toSet
    assert(got.toSet === brute)
    // each 1000-sample track has exactly 100 - 57 + 1 = 44 spans
    assert(spans.count(_._1 == 1L) === 44)
  }

  test("image crop containment: a brightness-shifted block-aligned crop " +
    "hits its source offset at Hamming 0; whole-image dHash misses it; " +
    "banded == brute; partial edge blocks dropped") {
    import spark.implicits._
    // 24x20 source (12x10 blocks of 2x2 px), per-block quadratic values
    def v(bx: Int, by: Int): Int = (bx * bx * 13 + by * by * 7 + bx * by * 3) % 226
    def png(id: Long, gw: Int, gh: Int, f: (Int, Int) => Int): MediaRow = {
      val w = 2 * gw; val h = 2 * gh
      val px: Int => Int = i =>
        if (i % 4 == 3) 255 else { val k = i / 4; f((k % w) / 2, (k / w) / 2) }
      MediaRow(id, "image", Containers.pngFull(w, h, px), w, h, 1)
    }
    val source = png(1, 12, 10, v)
    val other = png(2, 12, 10, (bx, by) => (bx * 31 + by * 17 + 200) % 226)
    // crop = blocks [3, 11) x [2, 10), +30 brightness (different bytes!)
    val crop = png(10, 8, 8, (c, r) => v(3 + c, 2 + r) + 30)
    val images = Seq(source, other).toDS()
    val crops = Seq(crop).toDS()
    val got = MediaDedup.imageCropMatches(crops, images)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getInt(4)))
    assert(got.exists(m => m == ((10L, 1L, 3, 2, 0))),
      s"planted crop hit missing from ${got.toSeq}")
    // whole-image dHash misses the same pair: cropping changes the
    // normalized 8x8 grid entirely
    val wholeCrop = MediaDedup.dhashOneImage(10L, crop.payload)
    val wholeSrc = MediaDedup.dhashOneImage(1L, source.payload)
    assert(java.lang.Long.bitCount(wholeCrop ^ wholeSrc) > 3)
    // banded == brute over the patch-hash tables
    val cp = MediaDedup.imagePatchHashes(crops).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    val ip = MediaDedup.imagePatchHashes(images).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    val lead = cp.filter(p => p._2 == 0 && p._3 == 0)
    val brute = (for {
      (cid, _, _, cph) <- lead
      (iid, ox, oy, iph) <- ip
      h = java.lang.Long.bitCount(cph ^ iph)
      if h <= 3
    } yield (cid, iid, ox, oy, h)).toSet
    assert(got.toSet === brute)
    // a 25x20 image has the same 12x10 FULL-block grid (the trailing
    // 1px column is dropped), so its patch hashes match the 24x20 twin's
    val odd = MediaRow(3, "image", Containers.pngFull(25, 20, { i =>
      if (i % 4 == 3) 255
      else { val k = i / 4; val x = k % 25; val y = k / 25
        if (x == 24) 0 else v(x / 2, y / 2) }
    }), 25, 20, 1)
    val oddHashes = MediaDedup.imagePatchHashes(Seq(odd).toDS()).collect()
      .map(r => ((r.getInt(1), r.getInt(2)), r.getLong(3))).toMap
    val srcHashes = ip.filter(_._1 == 1L)
      .map(p => ((p._2, p._3), p._4)).toMap
    assert(oddHashes === srcHashes)
  }

  test("imageQualityStats: exact integer stats through the real decode; " +
    "a flat image has var_num 0; PNG and GIF of one content agree") {
    import spark.implicits._
    val w = 9; val h = 7
    // channel-varied RGBA so gray = floor((r+g+b)/3) is exercised
    def ch(i: Int): Int = if (i % 4 == 3) 255 else (i * 37 + i / 4) % 256
    val varied = MediaRow(1, "image", Containers.pngFull(w, h, ch), w, h, 1)
    val flat = MediaRow(2, "image",
      Containers.pngFull(w, h, i => if (i % 4 == 3) 255 else 77), w, h, 1)
    // GIF twin of a gray ramp PNG: identity palette, index == gray
    def ramp(k: Int): Int = (k * 11) % 256
    val rampPng = MediaRow(3, "image",
      Containers.pngFull(w, h, i => if (i % 4 == 3) 255 else ramp(i / 4)),
      w, h, 1)
    val grayPalette = Array.tabulate(256 * 3)(b => (b / 3).toByte)
    val rampGif = MediaRow(4, "image",
      Containers.gifFull(w, h, ramp, grayPalette, minCodeSize = 8), w, h, 1)
    val stats = MediaDedup.imageQualityStats(
        Seq(varied, flat, rampPng, rampGif).toDS())
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    // replay the varied image's stats from the planting formula
    val grays = (0 until w * h).map(k =>
      (ch(4 * k) + ch(4 * k + 1) + ch(4 * k + 2)) / 3)
    val n = grays.length.toLong
    val s = grays.map(_.toLong).sum
    val s2 = grays.map(g => g.toLong * g).sum
    assert(stats(1L) === ((n, s, n * s2 - s * s,
      grays.count(_ < 16).toLong, grays.count(_ > 239).toLong)))
    // flat: variance numerator exactly zero, no clipped pixels
    assert(stats(2L) === ((n, 77L * n, 0L, 0L, 0L)))
    // format-blind: the GIF re-encode reports the identical stats row
    assert(stats(3L) === stats(4L))
  }

  test("imageBoilerplateBlocks surfaces exactly the stamped logo cells " +
    "and nothing from the per-image content") {
    val media = MediaDedup.syntheticWatermarkImages(
      docs.filter(col("doc_id") < 120))
    val got = MediaDedup.imageBoilerplateBlocks(media, minImages = 30L)
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1), r.getLong(2)), r.getLong(3)))
      .toMap
    // ids 0,3,...,117 -> 40 stamped images; logo = 4x2 cells at top-left.
    // Exactly those cells cross the threshold (an unstamped image's
    // quadratic may coincide at a cell ONCE — hence >= 40, not == 40 —
    // but never 30 times)
    val logoCells = (for (by <- 0 until 2; bx <- 0 until 4)
      yield (bx, by, (bx * 50 + by * 30 + 7).toLong)).toSet
    assert(got.keySet === logoCells)
    got.values.foreach(n => assert(n >= 40L))
  }

  test("EXIF-oriented crop search: a crop of the DISPLAYED form hits its " +
    "rotated-source JPEG at Hamming 0 — and misses when the tag is stripped") {
    import graft.multimodal.Jpeg
    // displayed content: 8x9 blocks of 8px, stored under orientation 6
    val gw = 8; val gh = 9
    def v(dx: Int, dy: Int): Int = (dx * dx * 13 + dy * dy * 7 + dx * dy * 3 + 20) % 196
    val grays = new Array[Int](gh * gw) // stored grid is gh x gw (swap)
    for (dy <- 0 until gh; dx <- 0 until gw) {
      // o=6: displayed (x, y) reads stored (y, sh-1-x); stored dims (gh, gw)
      val sx = dy; val sy = gw - 1 - dx
      grays(sy * gh + sx) = v(dx, dy)
    }
    val stored = Jpeg.encodeGrayBlocks(8 * gh, 8 * gw, grays)
    val tagged = Jpeg.withExif(stored, 6)
    // crop: displayed blocks [0,8) x [1,9), +30 brightness, as a PNG
    val crop = Containers.pngFull(64, 64, { i =>
      if (i % 4 == 3) 255
      else { val k = i / 4; v((k % 64) / 8, 1 + (k / 64) / 8) + 30 }
    })
    val crops = spark.createDataset(Seq(MediaRow(100L, "image", crop, 64, 64, 1)))(
      org.apache.spark.sql.Encoders.product[MediaRow])
    def imgs(p: Array[Byte]) = spark.createDataset(
      Seq(MediaRow(1L, "image", p, 64, 72, 1)))(
      org.apache.spark.sql.Encoders.product[MediaRow])
    val hit = MediaDedup.imageCropMatches(crops, imgs(tagged), blockPx = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getInt(3), r.getInt(4)))
    assert(hit.toSeq === Seq((100L, 1L, 0, 1, 0)))
    // the SAME stored bytes without the tag hash stored-orientation
    // pixels and the crop misses — the tag is what makes the pair meet
    assert(MediaDedup.imageCropMatches(crops, imgs(stored), blockPx = 8)
      .count() === 0L)
  }

  test("orientation-invariant dedup: every planted rotated/mirrored copy " +
    "collides at canonical Hamming 0 while the plain dHash misses it") {
    val media = MediaDedup.syntheticRotatedImages(
      docs.filter(col("doc_id") < 32)).persist()
    val planted = (0 until 16).map(g => (2L * g, 2L * g + 1)).toSet
    val canon = MediaDedup.imageNearDupsOrientationInvariant(media, 3, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(planted.subsetOf(canon.map(p => (p._1, p._2)).toSet))
    canon.filter(p => planted((p._1, p._2)))
      .foreach(p => assert(p._3 === 0, s"pair $p"))
    // the PLAIN dHash sees unrelated fingerprints for every planted pair
    val plain = MediaDedup.imageNearDups(media, 3, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(planted.intersect(plain).isEmpty,
      s"plain dHash should miss all orientations, found ${planted.intersect(plain)}")
    media.unpersist(): Unit
  }

  test("an ALPHA-BLENDED watermark escapes the verbatim census and is " +
    "caught by the quantized one") {
    val media = MediaDedup.syntheticBlendedWatermarkImages(
      docs.filter(col("doc_id") < 120)).persist()
    // 40 stamped images, bleed (id/3) % 3 splits each logo cell's means
    // across THREE verbatim values (~13-14 images each) — all below a
    // 30-image threshold, so the verbatim census sees nothing
    val verbatim = MediaDedup.imageBoilerplateBlocks(media, minImages = 30L)
      .collect()
    assert(verbatim.isEmpty,
      s"verbatim census should miss the blended stamp, got ${verbatim.length}")
    // the /4 quantized census concentrates each cell in one bucket of 40
    val tolerant = MediaDedup.imageBoilerplateBlocks(media, minImages = 30L,
        quant = 4)
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1), r.getLong(2)), r.getLong(3)))
      .toMap
    val logoCells = (for (by <- 0 until 2; bx <- 0 until 4)
      yield (bx, by, ((bx * 48 + by * 32 + 8) / 4).toLong)).toSet
    assert(tolerant.keySet === logoCells)
    tolerant.values.foreach(n => assert(n >= 40L))
    media.unpersist(): Unit
  }
}
