package graft

import org.apache.spark.sql.functions._

/** Round-16 additions: the IndexIngest sink-side batch ledger (the r15
  * ADVICE medium — foreachBatch replays must not double-append), and the
  * ImageIO decode tier — real PNG/JPEG codecs behind the multimodal seam
  * plus the mixed-format sniff dispatch. */
class Round16Spec extends SparkSpec {

  import graft.operators.Multimodal

  test("PNG tier is pixel-exact: ImageIO decode of built PNGs equals the PPM decode, cell for cell") {
    // PNG is lossless, so the compressed container must decode to the
    // SAME channel sums the uncompressed P6 container carries for the
    // same rule — a cross-codec equality no single-format gate can give.
    val docs = graft.sources.Tables.documents(spark, sf)
    val png = Multimodal.extractImageIoFeatures(Multimodal.asPngPayloads(docs))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val ppm = Multimodal.extractPpmFeatures(Multimodal.asPpmPayloads(docs))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(png.keySet === ppm.keySet)
    var decoded = 0
    for ((id, p) <- ppm) {
      if (p._2 > 0) { // complete rows exist: PNG must match exactly
        assert(png(id) === p, s"doc $id: PNG decode diverged from PPM")
        decoded += 1
      } else {
        // sub-row docs: P6 encodes 8x0 validly; PNG ships empty → reject
        assert(png(id)._1 === -1L, s"doc $id: empty PNG payload must reject")
      }
    }
    assert(decoded > 100, s"only $decoded docs decoded — the parity claim needs coverage")
  }

  test("JPEG tier: dims exact, decoded gray mass within tolerance; measured drift reported") {
    val docs = graft.sources.Tables.documents(spark, sf)
    // measure the ACTUAL per-pixel gray drift of the JDK codec on random
    // text-byte images (worst case for a DCT codec) — the gate tolerance
    // must dominate it with real margin, not by tuning
    val media = Multimodal.asJpegPayloads(docs)
    val drift = media.collect().flatMap { r =>
      Multimodal.decodeImageIo(r.getAs[Array[Byte]](1)).map { img =>
        var g = 0L; var p = 0
        while (p < img.pixels.length) { g += img.pixels(p) & 0xff; p += 1 }
        math.abs(g - r.getLong(2)).toDouble / (img.width.toLong * img.height)
      }
    }
    assert(drift.length > 100, "JPEG decode coverage too thin")
    val worst = drift.max
    info(f"JPEG gray drift per pixel: max $worst%.2f over ${drift.length} images " +
      f"(gate tolerance ${Multimodal.JpegGrayTolPerPixel})")
    assert(worst <= Multimodal.JpegGrayTolPerPixel / 2.0,
      f"measured drift $worst%.2f leaves <2x margin against the gate tolerance")
    // and the gate itself: all buildable docs in tolerance, dims exact
    val gate = Multimodal.jpegGateFromDir(spark, sf).collect()
    for (r <- gate if r.getLong(1) >= 0)
      assert(r.getBoolean(4), s"doc ${r.getLong(0)} escaped the gray tolerance")
  }

  test("ImageIO decode rejects corrupt and oversized payloads") {
    assert(Multimodal.decodeImageIo(null).isEmpty)
    assert(Multimodal.decodeImageIo(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodeImageIo("not an image".getBytes).isEmpty)
    // a real PNG truncated mid-stream must reject, not mis-sum
    val whole = {
      val img = new java.awt.image.BufferedImage(8, 4,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    assert(Multimodal.decodeImageIo(whole).isDefined)
    assert(Multimodal.decodeImageIo(whole.take(whole.length / 2)).isEmpty,
      "truncated PNG must reject")
    // a crafted header claiming giant dims must reject BEFORE decoding
    // pixels (the allocation, not the parse, is the attack)
    val bigDims = whole.clone()
    // PNG IHDR: width at offset 16, height at 20 (big-endian u32)
    for (i <- 0 until 4) { bigDims(16 + i) = 0x7f.toByte; bigDims(20 + i) = 0x7f.toByte }
    assert(Multimodal.decodeImageIo(bigDims).isEmpty,
      "a 2e9x2e9 header must reject at the dimension guard")
  }

  test("mixed-format corpus: sniff routes every container to its codec") {
    assert(Multimodal.sniffImageFormat("P6\n8 0\n255\n".getBytes) === "ppm")
    assert(Multimodal.sniffImageFormat(Multimodal.buildBmp(new Array[Byte](30))) === "bmp")
    assert(Multimodal.sniffImageFormat(
      Array[Int](0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)) === "png")
    assert(Multimodal.sniffImageFormat(Array(0xff.toByte, 0xd8.toByte, 0xff.toByte)) === "jpeg")
    assert(Multimodal.sniffImageFormat("garbage".getBytes) === "unknown")

    val mixed = Multimodal.mixedGateFromDir(spark, sf).collect()
    assert(mixed.nonEmpty)
    val byFmt = mixed.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    // all four codecs must actually fire on the corpus
    for (f <- Seq("ppm", "bmp", "png", "jpeg"))
      assert(byFmt.getOrElse(f, 0) > 10, s"$f fired only ${byFmt.getOrElse(f, 0)} times")
    // dims agree with each builder's rule for every decoded row
    for (r <- mixed if r.getLong(2) > 0) {
      val w = r.getLong(2)
      r.getString(1) match {
        case "bmp" => assert(w === 5L)
        case _ => assert(w === 8L)
      }
      assert(r.getLong(4) === w * r.getLong(3))
    }
    // BMP decode through the dispatch normalizes BGR → RGB: spot-check
    // against the PPM decode of the same bytes
    val data = Array.tabulate[Byte](30)(i => (i * 7 + 3).toByte) // 2 BMP rows @ w=5
    val viaBmp = Multimodal.decodeAnyImage(Multimodal.buildBmp(data)).get
    assert(viaBmp.width === 5 && viaBmp.height === 2)
    // image row 0 = input bytes [0,15): first pixel's B,G,R were bytes
    // 0,1,2 → RGB order flips to (byte2, byte1, byte0)
    assert((viaBmp.pixels(0) & 0xff) === (data(2) & 0xff))
    assert((viaBmp.pixels(1) & 0xff) === (data(1) & 0xff))
    assert((viaBmp.pixels(2) & 0xff) === (data(0) & 0xff))
  }

  test("guardedAppend: a replayed batchId is skipped; new batchIds append") {
    import spark.implicits._
    val stateDir = java.nio.file.Files.createTempDirectory("graft_ingest_ledger")
    try {
      var calls = 0
      var rows = 0L
      val guarded = graft.streaming.IndexIngest.guardedAppend(
        stateDir.toString, b => { calls += 1; rows += b.count() })
      val batch = Seq((1L, Seq(0.1f, 0.2f)), (2L, Seq(0.3f, 0.4f)))
        .toDF("vec_id", "embedding")
      guarded(batch, 0L)
      assert(calls === 1 && rows === 2)
      // restart replay of the SAME uncommitted-at-source batchId: the
      // ledger marker must swallow it — a second append would land
      // duplicate vec_ids in cells (duplicate neighbors in every probe)
      guarded(batch, 0L)
      assert(calls === 1 && rows === 2, "replayed batchId must be skipped")
      // the next batchId is new work and must go through
      guarded(batch, 1L)
      assert(calls === 2 && rows === 4)
      // markers are per-batch files under <stateDir>/commits
      assert(java.nio.file.Files.exists(stateDir.resolve("commits").resolve("batch-0")))
      assert(java.nio.file.Files.exists(stateDir.resolve("commits").resolve("batch-1")))
    } finally {
      java.nio.file.Files.walk(stateDir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("guardedAppend: a failed append leaves no marker, so the retry lands") {
    import spark.implicits._
    val stateDir = java.nio.file.Files.createTempDirectory("graft_ingest_ledger2")
    try {
      var calls = 0
      var fail = true
      val guarded = graft.streaming.IndexIngest.guardedAppend(
        stateDir.toString,
        _ => { calls += 1; if (fail) sys.error("transient store failure") })
      val batch = Seq((1L, Seq(0.1f))).toDF("vec_id", "embedding")
      intercept[RuntimeException] { guarded(batch, 0L) }
      assert(!java.nio.file.Files.exists(stateDir.resolve("commits").resolve("batch-0")),
        "a marker for a FAILED append would permanently drop the batch")
      fail = false
      guarded(batch, 0L) // the streaming engine's retry of the same batch
      assert(calls === 2)
      assert(java.nio.file.Files.exists(stateDir.resolve("commits").resolve("batch-0")))
    } finally {
      java.nio.file.Files.walk(stateDir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
