package graft.ops

import graft.{SparkSpec, Tables}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media schema carries binary payload + typed metadata end-to-end") {
    val media = Multimodal.mediaFromDocuments(spark, Tables.documents(spark, sfDir))
    val firstId = media.head().media_id
    val row = media.filter(_.media_id == firstId).head()
    assert(row.payload.nonEmpty)
    assert(row.width >= 1 && row.height >= 1)
  }

  test("resize stub scales payload with area; frame sampling fans out") {
    val media = Multimodal.mediaFromDocuments(spark, Tables.documents(spark, sfDir))
    val row = media.head()
    val resized = Multimodal.resizeStub(row, row.width * 2, row.height * 2)
    assert(resized.payload.length === row.payload.length * 4)
    assert(resized.width === row.width * 2)

    val frames = Multimodal.sampleFramesStub(spark, media, frameBytes = 16, everyK = 2)
      .collect()
    assert(frames.length > media.count()) // fan-out happened
    assert(frames.forall(_.payload.length <= 16))
  }

  test("png media decodes for REAL: dimensions and stats from the raster") {
    import spark.implicits._
    val ids = Seq(5L, 17L, 30L).toDF("media_id")
    val media = Multimodal.pngMediaFromIds(spark, ids)
    val feats = Multimodal.featurize(spark, media).collect()
      .map(f => f.media_id -> f).toMap
    Seq(5L, 17L, 30L).foreach { id =>
      val w = (id % 16 + 1).toInt; val h = (id % 12 + 1).toInt
      val px = Array.tabulate(w * h)(i => ((id + i) % 256).toInt)
      val f = feats(id)
      assert(f.width === w && f.height === h) // from the decoded raster
      assert(math.abs(f.mean_byte - px.sum.toDouble / px.length) < 1e-9)
      assert(f.histogram.sum === w.toLong * h) // pixel stats, not byte stats
      assert(f.n_bytes > 0 && f.n_bytes != (w * h).toLong) // compressed payload
    }
    // a stage-1 PNG decodes directly through decodePng
    val png = graft.Pipeline.pngBytes(Array.tabulate(64)(i => (i * 4).toShort), 8, 8)
    val d = Multimodal.decodePng(Multimodal.MediaRow(1L, png, "image/png", 8, 8))
    assert(d.width === 8 && d.height === 8)
    assert(math.abs(d.mean_byte - (0 until 64).map(_ * 4).sum / 64.0) < 1e-9)
    // corrupt payload degrades to the stub, not an exception
    val bad = Multimodal.decodePng(Multimodal.MediaRow(2L, Array[Byte](1, 2, 3), "image/png", 1, 1))
    assert(bad.n_bytes === 3L)
  }

  test("decode dispatch honesty: real codec per decodable mime, labeled " +
      "stub for JVM-absent codecs, never fabricated features") {
    import Multimodal.{MediaFeatures, MediaRow, decode, decodeStub, decodePng}
    // MediaFeatures carries an Array field (reference equality) — compare
    // through a value tuple
    def v(f: MediaFeatures) = (f.media_id, f.n_bytes, f.sha256, f.width,
      f.height, f.mean_byte, f.histogram.toSeq)
    val png = graft.Pipeline.pngBytes(Array.tabulate(48)(i => (i * 5).toShort), 8, 6)
    val fakeBytes = Array.tabulate[Byte](64)(i => (i * 7).toByte)

    // image/png with a real payload: the REAL decoder answers — raster
    // dimensions and pixel (not byte) statistics
    val real = decode(MediaRow(1L, png, "image/png", 8, 6))
    assert(v(real) === v(decodePng(MediaRow(1L, png, "image/png", 8, 6))))
    assert(real.histogram.sum === 48L) // pixels counted, not payload bytes
    assert(v(real) !== v(decodeStub(MediaRow(1L, png, "image/png", 8, 6))))

    // image mimes whose codec the JVM lacks (ImageIO has no WebP/AVIF
    // reader): decode must DEGRADE to the stub's byte stats — mime says
    // image, but features must never be fabricated from a failed parse
    Seq("image/webp", "image/avif").foreach { mime =>
      val r = MediaRow(2L, fakeBytes, mime, 16, 16)
      val f = decode(r)
      assert(v(f) === v(decodeStub(r)), s"$mime must fall back to the stub")
      assert(f.histogram.sum === fakeBytes.length.toLong) // byte stats
      assert(f.width === 16 && f.height === 16) // metadata passthrough
    }

    // non-image mimes route straight to the stub by dispatch, not by a
    // failed decode attempt
    Seq("audio/wav", "video/mp4", "application/octet-stream").foreach { mime =>
      val r = MediaRow(3L, fakeBytes, mime, 4, 4)
      assert(v(decode(r)) === v(decodeStub(r)), s"$mime must use the stub")
    }
    // null mime: stub, no NPE
    val nullMime = MediaRow(4L, fakeBytes, null, 4, 4)
    assert(v(decode(nullMime)) === v(decodeStub(nullMime)))
  }

  test("featurize runs partition-parallel and matches a local decode") {
    val media = Multimodal.mediaFromDocuments(spark, Tables.documents(spark, sfDir))
      .repartition(3) // prove multi-partition batch shape
    val feats = Multimodal.featurize(spark, media).collect()
    assert(feats.length === media.count())
    val local = media.collect().map(Multimodal.decodeStub).map(f => f.media_id -> f).toMap
    feats.foreach { f =>
      val l = local(f.media_id)
      assert(f.sha256 === l.sha256)
      assert(f.n_bytes === l.n_bytes)
      assert(math.abs(f.mean_byte - l.mean_byte) < 1e-12)
      assert(f.histogram.toSeq === l.histogram.toSeq)
      assert(f.histogram.sum === f.n_bytes) // histogram partitions the bytes
    }
  }

  test("aHash: decoded-PNG hash equals the closed-form pixel math") {
    import spark.implicits._
    val ids = Seq(0L, 7L, 23L, 47L, 95L).toDF("media_id")
    val media = Multimodal.pngMediaFromIds(spark, ids)
    val got = Multimodal.imageHashes(spark, media).collect()
      .map(x => x.media_id -> x).toMap
    got.keySet.foreach { id =>
      val w = (id % 16 + 1).toInt; val h = (id % 12 + 1).toInt
      val v = Array.tabulate(64) { bit =>
        val gx = bit % 8; val gy = bit / 8
        ((id + (gy * h / 8) * w + (gx * w / 8)) % 256).toInt
      }
      val mean = v.sum / 64.0
      val bands = new Array[Long](4)
      for (i <- 0 until 64 if v(i) > mean) bands(i >> 4) |= 1L << (i & 15)
      val x = got(id)
      assert(Seq(x.b0, x.b1, x.b2, x.b3) === bands.toSeq,
        s"hash mismatch for gradient image $id ($w x $h)")
      assert(Seq(x.b0, x.b1, x.b2, x.b3).forall(b => b >= 0 && b <= 0xffffL))
    }
  }

  test("nearDupSummary: group-collapsed pairing == brute-force all-pairs") {
    import spark.implicits._
    // 300 gradient images: geometry repeats every 48 ids and pixels every
    // 768, so the set has deep exact-duplicate hash groups AND cross-group
    // near-misses — both paths of the group formulation are exercised
    val ids = (0L until 300L).toDF("media_id")
    val hashes = Multimodal
      .imageHashes(spark, Multimodal.pngMediaFromIds(spark, ids)).collect()
    val local = hashes.map(h => h.media_id -> Array(h.b0, h.b1, h.b2, h.b3)).toMap
    // brute force: every unordered pair sharing >= 1 exact band value
    val expected = scala.collection.mutable.Map
      .empty[Long, (Long, Long, Long)] // id -> (n_cand, n_dup, nn)
    val idsArr = local.keys.toArray.sorted
    for {
      i <- idsArr.indices; j <- (i + 1) until idsArr.length
      a = local(idsArr(i)); b = local(idsArr(j))
      if a.indices.exists(k => a(k) == b(k))
    } {
      val d = a.indices.map(k => java.lang.Long.bitCount(a(k) ^ b(k))).sum.toLong
      Seq(idsArr(i), idsArr(j)).foreach { id =>
        val (c, dup, nn) = expected.getOrElse(id, (0L, 0L, Long.MaxValue))
        expected(id) = (c + 1, dup + (if (d <= 6) 1L else 0L), math.min(nn, d))
      }
    }
    val got = Multimodal.nearDupSummary(
        spark.createDataFrame(hashes.toSeq), maxHamming = 6)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (id, v) =>
      assert(v === expected(id), s"summary mismatch for image $id")
    }
    assert(got.nonEmpty)
  }

  test("aHash: brightness shift without wraparound preserves the hash; " +
      "non-decodable payloads degrade to deterministic byte sampling") {
    def gray(px: Array[Short], w: Int, h: Int) = Multimodal.aHash(
      Multimodal.MediaRow(0L, graft.Pipeline.pngBytes(px, w, h), "image/png", w, h))
    val base = Array.tabulate(12 * 10)(i => ((i * 7) % 100).toShort)
    val brighter = base.map(v => (v + 50).toShort) // still < 256: no wrap
    val a = gray(base, 12, 10); val b = gray(brighter, 12, 10)
    assert((a.b0, a.b1, a.b2, a.b3) === ((b.b0, b.b1, b.b2, b.b3)),
      "aHash must be invariant to a uniform brightness shift")
    // a genuinely different image lands at a different hash
    val other = gray(base.reverse, 12, 10)
    assert((a.b0, a.b1, a.b2, a.b3) !== ((other.b0, other.b1, other.b2, other.b3)))
    // corrupt payload: stub path, deterministic, no exception
    val junk = Array[Byte](9, 8, 7, 6, 5)
    val s1 = Multimodal.aHash(Multimodal.MediaRow(1L, junk, "image/png", 1, 1))
    val s2 = Multimodal.aHash(Multimodal.MediaRow(1L, junk, "image/png", 1, 1))
    assert((s1.b0, s1.b1, s1.b2, s1.b3) === ((s2.b0, s2.b1, s2.b2, s2.b3)))
  }

  test("WAV codec: encode→decode round-trips header fields and features") {
    val samples = Array[Short](0, 100, -100, 200, -200, 300, 0, -1)
    val bytes = Multimodal.encodeWavPcm16(samples, 44100)
    assert(bytes.length === 44 + samples.length * 2)
    val f = Multimodal.decodeWav(7L, bytes).get
    assert(f.media_id === 7L)
    assert(f.sample_rate === 44100 && f.n_channels === 1 &&
      f.bits_per_sample === 16)
    assert(f.n_samples === samples.length.toLong)
    assert(f.n_bytes === bytes.length.toLong)
    assert(f.peak === 300L)
    val expSs = samples.map(s => s.toLong * s).sum
    assert(f.mean_square === expSs.toDouble / samples.length)
    // sign changes ((prev<0) != (cur<0)), zero non-negative:
    // 0,100 no; 100,-100 yes; -100,200 yes; 200,-200 yes; -200,300 yes;
    // 300,0 no; 0,-1 yes => 5
    assert(f.n_zero_cross === 5L)
  }

  test("WAV decoder walks unknown chunks and word-aligned padding") {
    val samples = Array[Short](10, -20, 30)
    val plain = Multimodal.encodeWavPcm16(samples, 8000)
    // splice a 5-byte junk chunk (odd size => 1 pad byte) between
    // fmt and data: RIFF(12) + fmt(8+16) = 36 bytes prefix
    val junkChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ Array[Byte](1, 2, 3, 4, 5) ++ Array[Byte](0)
    val spliced = plain.take(36) ++ junkChunk ++ plain.drop(36)
    // fix the RIFF size field (bytes 4..7, little-endian)
    val total = spliced.length - 8
    spliced(4) = (total & 0xff).toByte
    spliced(5) = ((total >> 8) & 0xff).toByte
    spliced(6) = ((total >> 16) & 0xff).toByte
    spliced(7) = ((total >> 24) & 0xff).toByte
    val f = Multimodal.decodeWav(1L, spliced).get
    assert(f.n_samples === 3L && f.peak === 30L)
    assert(f.n_zero_cross === 2L)
  }

  test("WAV decoder honesty: corrupt, truncated and non-PCM payloads " +
      "return None, never throw") {
    assert(Multimodal.decodeWav(1L, Array[Byte](1, 2, 3)) === None)
    assert(Multimodal.decodeWav(1L,
      "RIFFxxxxJUNK".getBytes("US-ASCII")) === None)
    val good = Multimodal.encodeWavPcm16(Array[Short](1, 2, 3), 8000)
    // truncate mid-data: chunk size now exceeds payload
    assert(Multimodal.decodeWav(1L, good.take(good.length - 2)) === None)
    // flip the format code to 3 (IEEE float) — not 16-bit PCM
    val nonPcm = good.clone(); nonPcm(20) = 3
    assert(Multimodal.decodeWav(1L, nonPcm) === None)
  }

  test("audioFeatures runs partition-parallel and drops non-WAV rows") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L,
        Multimodal.encodeWavPcm16(Array[Short](5, -5, 5), 16000),
        "audio/wav", 0, 0),
      Multimodal.MediaRow(2L, Array[Byte](1, 2, 3), "audio/wav", 0, 0))
    val out = Multimodal.audioFeatures(spark,
        rows.toDS().repartition(3))
      .collect().sortBy(_.media_id)
    assert(out.map(_.media_id).toSeq === Seq(1L))
    assert(out.head.sample_rate === 16000 && out.head.n_zero_cross === 2L)
  }
}
