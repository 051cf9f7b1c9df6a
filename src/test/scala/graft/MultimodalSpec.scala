package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal

/** Multimodal plumbing: the typed header written by the synthesizer is
  * recovered exactly by the extractor from the binary payload.
  */
class MultimodalSpec extends AnyFunSuite with SparkFixture {

  test("mm_extract_meta parses the real BMP container header for every doc") {
    val out = Multimodal.mmExtractMeta(spark, sf).cache()
    assert(out.count() == Tables.documents(spark, sf).count())
    // byte-level witnesses: magic present, header's own file-size
    // field equals the actual blob length
    assert(out.filter(!col("header_ok") || !col("size_field_ok")).count() == 0)
    // spec-fixed 24-bit BITMAPINFOHEADER layout
    assert(out.filter(col("bit_depth") =!= 24 || col("data_offset") =!= 54).count() == 0)
    assert(out.filter(col("width") < 8 || col("width") > 32
                   || col("height") < 8 || col("height") > 32).count() == 0)
    // total size = 54-byte headers + 4-padded 24bpp rows
    assert(out.filter(col("n_bytes") =!=
      lit(54) + floor((col("width") * 3 + 3) / 4) * 4 * col("height")).count() == 0)
    out.unpersist()
  }

  test("extractMeta recovers the synthesized GFT0 header (frame-sample substrate)") {
    val out = Multimodal.extractMeta(Multimodal.synthesizePayloads(spark, sf)).cache()
    assert(out.count() == Tables.documents(spark, sf).count())
    assert(out.filter(!col("header_ok")).count() == 0)
    assert(out.filter(!col("media_kind").isin("I", "A", "V")).count() == 0)
    assert(out.filter(col("width") < 16 || col("width") > 1936
                   || col("height") < 16 || col("height") > 1096).count() == 0)
    // images are single-frame by construction
    assert(out.filter(col("media_kind") === "I" && col("n_frames") =!= 1).count() == 0)
    out.unpersist()
  }

  test("batch decode (real ImageIO codec) agrees with the binary-function header parse") {
    // two independent roads to the BMP dims: a genuine ImageIO decode
    // per blob (mapPartitions codec boundary) vs mm_extract_meta's
    // pure-SQL little-endian header arithmetic
    val payloads = Multimodal.buildBmpPayloads(spark, sf)
    val batch = Multimodal.decodeBatched(spark, payloads)
      .select(col("doc_id"), col("content_feature"))
    val expr = Multimodal.mmExtractMeta(spark, sf)
      .select(col("doc_id"),
        (shiftleft(col("width"), 20) + col("height")).as("content_feature"))
    assert(batch.exceptAll(expr).count() == 0 && expr.exceptAll(batch).count() == 0)
  }

  test("a swapped-in codec changes only the features, never the plan shape") {
    val payloads = Multimodal.synthesizePayloads(spark, sf)
    // the "real decoder" a codec-equipped container would inject
    object FakePixelCodec extends Multimodal.MediaCodec {
      override def open(): Array[Byte] => Long = bytes => bytes.length * 7L + bytes.head
    }
    val custom = Multimodal.decodeBatched(spark, payloads, FakePixelCodec)
    val expected = payloads.select(col("doc_id"),
      (length(col("payload")).cast("long") * 7L +
        ascii(decode(substring(col("payload"), 1, 1), "UTF-8")).cast("long"))
        .as("content_feature"))
    assert(custom.select("doc_id", "content_feature").exceptAll(expected).count() == 0)
    // the operator's plan is codec-independent: same node sequence
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.collect { case n => n.nodeName }
    assert(shape(custom) == shape(Multimodal.decodeBatched(spark, payloads)))
  }

  test("frame sampling: video-only, in-range, sorted-distinct, short clips covered") {
    val k = 8
    val out = Multimodal.mmFrameSample(spark, sf, k).cache()
    val meta = Multimodal.extractMeta(Multimodal.synthesizePayloads(spark, sf))
      .select("doc_id", "media_kind", "n_frames")
    // only videos, never an index outside [0, n_frames)
    assert(out.join(meta, Seq("doc_id")).filter(col("media_kind") =!= "V").count() == 0)
    assert(out.filter(col("frame_idx") < 0 || col("frame_idx") >= col("n_frames")).count() == 0)
    // per video: <= k indices, exactly min(k, n_frames) of them, distinct
    val per = out.groupBy("doc_id").agg(
      count(lit(1)).as("n"), countDistinct(col("frame_idx")).as("nd"),
      first(col("n_frames")).as("nf"))
    assert(per.filter(col("n") =!= col("nd")).count() == 0)
    assert(per.filter(col("n") =!= least(lit(k.toLong), col("nf"))).count() == 0)
    // a clip shorter than k samples every frame
    assert(per.filter(col("nf") < k && col("n") =!= col("nf")).count() == 0)
    out.unpersist()
  }

  test("chunk manifest: chunks tile each body exactly, keys differ across distinct chunks") {
    import org.apache.spark.sql.functions._
    val out = graft.multimodal.Multimodal.mmChunkText(spark, sf).cache()
    // chunk lengths per doc sum to the body length; all but the last are full
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), length(col("text")).cast("long").as("body_len"))
    val sums = out.groupBy("doc_id").agg(
      sum("n_chars").as("total"), max("chunk_idx").as("last_idx"),
      count(lit(1)).as("n"))
    val bad = sums.join(docs, "doc_id")
      .filter(col("total") =!= col("body_len") || col("n") =!= col("last_idx") + 1)
    assert(bad.count() == 0)
    assert(out.filter(col("n_chars") > 256).count() == 0)
    // content keys must actually distinguish distinct chunk content:
    // full-width chunks are (distinct-per-doc) text slices, so key
    // cardinality must be in the same order as chunk count
    val full = out.filter(col("n_chars") === 256)
    val fullN = full.count()
    if (fullN > 10) {
      val distinctKeys = full.select("chunk_key").distinct().count()
      assert(distinctKeys > fullN / 2,
        s"only $distinctKeys distinct keys for $fullN full chunks — key derivation degenerate")
    }
    // non-final chunks are exactly the window width
    val nonFinal = out.join(sums.select(col("doc_id"), col("last_idx")), "doc_id")
      .filter(col("chunk_idx") < col("last_idx"))
    assert(nonFinal.filter(col("n_chars") =!= 256).count() == 0)
    out.unpersist()
  }

  test("GFT0 n_bytes = 21-byte header + UTF-8 body length") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), (lit(21) + length(encode(col("text"), "UTF-8"))).as("expect"))
    val out = Multimodal.extractMeta(Multimodal.synthesizePayloads(spark, sf))
      .select("doc_id", "n_bytes")
    assert(out.join(docs, "doc_id").filter(col("n_bytes") =!= col("expect")).count() == 0)
  }

  test("chunk roundtrip reassembles crafted bodies byte-exactly at window 4") {
    import spark.implicits._
    val docs = Seq(
      (1L, ""),                       // empty → one empty chunk
      (2L, "abcd"),                   // exactly one window
      (3L, "abcdefgh"),               // exact multiple
      (4L, "abcdefghi"),              // multiple + remainder
      (5L, "héllo wörld 🌍🌍 ütf"),   // multibyte: char windows must not split
      (6L, "x"))
      .toDF("doc_id", "text")
    val out = Multimodal.chunkRoundtripOver(docs, window = 4)
    val expect = docs.select(col("doc_id"),
      greatest(lit(1L), expr("(char_length(text) + 3) div 4")).as("want_chunks"),
      md5(encode(col("text"), "UTF-8")).as("want_md5"))
    val bad = out.join(expect, "doc_id")
      .filter(col("n_chunks") =!= col("want_chunks") || col("body_md5") =!= col("want_md5"))
    assert(bad.count() == 0)
    // and over the real corpus: every reassembly hash matches the source
    val corpus = Multimodal.mmChunkRoundtrip(spark, sf)
    val src = Tables.documents(spark, sf)
      .select(col("doc_id"), md5(encode(col("text"), "UTF-8")).as("want_md5"))
    assert(corpus.join(src, "doc_id")
      .filter(col("body_md5") =!= col("want_md5")).count() == 0)
  }

  // ---- real-codec loop (JDK PNG / WAV) -------------------------------
  // The expected features below are INDEPENDENT re-implementations of
  // the deterministic pixel/sample arithmetic (not calls into the
  // operator's own helpers), so a match certifies the full
  // encode→decode→extract loop against a second implementation.

  private def expChan(id: Long, j: Long): Long = (id * 7919L + j * 104729L) % 256L

  test("mm_image_decode: decoded channel stats equal the pixel arithmetic; payloads are real PNG") {
    val out = Multimodal.mmImageDecode(spark, sf).cache()
    val rows = out.orderBy("doc_id").limit(40).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val w = 8L + id % 25L; val h = 8L + (id * 7L) % 25L
      assert(r.getLong(1) == w && r.getLong(2) == h && r.getLong(3) == w * h)
      var sr = 0L; var sg = 0L; var sb = 0L
      var p = 0L
      while (p < w * h) {
        sr += expChan(id, 3 * p); sg += expChan(id, 3 * p + 1); sb += expChan(id, 3 * p + 2)
        p += 1
      }
      assert(r.getLong(4) == sr && r.getLong(5) == sg && r.getLong(6) == sb,
        s"doc $id channel sums diverge from pixel arithmetic")
      assert(r.getLong(7) == 1000L * (sr + sg + sb) / (3L * w * h))
    }
    assert(out.count() == Tables.documents(spark, sf).count())
    out.unpersist()
    // the wire bytes are genuine PNG: 8-byte signature on every payload
    val sigBad = Multimodal.buildPngPayloads(spark, sf)
      .filter(!substring(col("payload"), 1, 8)
        .eqNullSafe(lit(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))))
    assert(sigBad.count() == 0, "a payload is not a PNG")
  }

  test("mm_jpeg_decode: real lossy JPEG round trip — dims exact, means in tolerance, bytes genuinely JPEG") {
    val out = Multimodal.mmJpegDecode(spark, sf).cache()
    val rows = out.orderBy("doc_id").limit(40).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val w = 8L + id % 25L; val h = 8L + (id * 7L) % 25L
      assert(r.getLong(1) == w && r.getLong(2) == h && r.getLong(3) == w * h,
        s"doc $id decoder dims diverge from the source arithmetic")
      assert(r.getBoolean(4), s"doc $id payload lacks the JPEG SOI marker")
      assert(r.getBoolean(5), s"doc $id decoded channel mean outside tolerance")
    }
    assert(out.count() == Tables.documents(spark, sf).count())
    out.unpersist()
    // and it IS lossy — a decoded grid differs from the source pixels
    // somewhere (else "jpg" silently wrote a lossless format and the
    // tolerance witness proves nothing)
    import spark.implicits._
    val lossy = Multimodal.buildJpegPayloads(spark, sf)
      .as[Multimodal.MediaPayload].limit(20).collect().exists { mp =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(mp.payload))
        val w = img.getWidth; val h = img.getHeight
        (0 until h).exists { y => (0 until w).exists { x =>
          val rgb = img.getRGB(x, y); val p = y.toLong * w + x
          ((rgb >> 16) & 0xff) != expChan(mp.doc_id, 3 * p) ||
          ((rgb >> 8) & 0xff) != expChan(mp.doc_id, 3 * p + 1) ||
          (rgb & 0xff) != expChan(mp.doc_id, 3 * p + 2)
        }}
      }
    assert(lossy, "every JPEG decoded bit-exact — the writer is not actually lossy?")
  }

  test("mm_image_resize: NN thumbnail stats equal the floor-index arithmetic") {
    val rows = Multimodal.mmImageResize(spark, sf).orderBy("doc_id").limit(40).collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      val w = 8L + id % 25L; val h = 8L + (id * 7L) % 25L
      assert(r.getLong(1) == w && r.getLong(2) == h)
      assert(r.getLong(3) == 8L && r.getLong(4) == 8L)
      var sr = 0L; var sg = 0L; var sb = 0L
      var y = 0L
      while (y < 8) {
        val sy = y * h / 8
        var x = 0L
        while (x < 8) {
          val p = sy * w + x * w / 8
          sr += expChan(id, 3 * p); sg += expChan(id, 3 * p + 1); sb += expChan(id, 3 * p + 2)
          x += 1
        }
        y += 1
      }
      assert(r.getLong(5) == sr && r.getLong(6) == sg && r.getLong(7) == sb,
        s"doc $id resize sums diverge from NN index arithmetic")
    }
  }

  test("mm_audio_decode: decoded PCM features equal the sample arithmetic; payloads are real RIFF/WAVE") {
    val out = Multimodal.mmAudioDecode(spark, sf).cache()
    val rows = out.orderBy("doc_id").limit(40).collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      val n = 400L + (id * 13L) % 1600L
      assert(r.getLong(1) == n && r.getLong(2) == 8000L)
      assert(r.getLong(3) == n * 1000000L / 8000L)
      var sumAbs = 0L; var peak = 0L; var energy = 0L
      var i = 0L
      while (i < n) {
        val v = ((id * 31L + i * 7L) % 2048L) - 1024L
        val a = math.abs(v)
        sumAbs += a; if (a > peak) peak = a; energy += v * v
        i += 1
      }
      assert(r.getLong(4) == sumAbs && r.getLong(5) == peak && r.getLong(6) == energy,
        s"doc $id audio features diverge from sample arithmetic")
    }
    assert(out.count() == Tables.documents(spark, sf).count())
    out.unpersist()
    val sigBad = Multimodal.buildWavPayloads(spark, sf)
      .filter(substring(col("payload"), 1, 4) =!= lit("RIFF".getBytes("US-ASCII")) ||
              substring(col("payload"), 9, 4) =!= lit("WAVE".getBytes("US-ASCII")))
    assert(sigBad.count() == 0, "a payload is not RIFF/WAVE")
  }

  test("mm_image_phash: decoded aHash equals an independent arithmetic recompute") {
    // independent re-implementation (thumbnail index map, grayscale,
    // mean threshold) — no calls into the operator's helpers
    def expPhash(id: Long): (Long, Long) = {
      val src = if (id % 5 == 0 && id > 0) id - 1 else id
      val variant = id % 5 == 0 && id > 0
      val w = 8L + src % 25L; val h = 8L + (src * 7L) % 25L
      val gray = (0 until 64).map { q =>
        val p = ((q / 8) * h / 8) * w + (q % 8) * w / 8
        val r = math.min(255L, expChan(src, 3 * p) + (if (variant && p % 2 == 0) 32L else 0L))
        (r + expChan(src, 3 * p + 1) + expChan(src, 3 * p + 2)) / 3L
      }
      val mean = gray.sum / 64L
      var hi = 0L; var lo = 0L
      for (q <- 0 until 64; if gray(q) > mean)
        if (q < 32) hi |= 1L << q else lo |= 1L << (q - 32)
      (hi, lo)
    }
    val got = Multimodal.mmImagePhash(spark, sf).orderBy("doc_id").limit(60).collect()
    got.foreach { r =>
      val (hi, lo) = expPhash(r.getLong(0))
      assert(r.getLong(1) == hi && r.getLong(2) == lo,
        s"doc ${r.getLong(0)} phash diverges from the arithmetic recompute")
    }
    // a variant sits within a few bits of its base — the property byte
    // digests cannot see (the payloads differ everywhere)
    val sigs = Multimodal.mmImagePhash(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val variantGaps = sigs.keys.filter(id => id % 5 == 0 && id > 0 && sigs.contains(id - 1))
      .map { id =>
        val (h1, l1) = sigs(id); val (h0, l0) = sigs(id - 1)
        java.lang.Long.bitCount(h1 ^ h0) + java.lang.Long.bitCount(l1 ^ l0)
      }
    assert(variantGaps.nonEmpty && variantGaps.max <= 8,
      s"a brightness edit must move the phash only a few bits, got max ${variantGaps.max}")
  }

  test("mm_phash_pairs: banded+verified equals all-pairs hamming<=3 exactly") {
    val sigs = Multimodal.mmImagePhash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = (for {
      (a, ha, la) <- sigs; (b, hb, lb) <- sigs; if a < b
      d = java.lang.Long.bitCount(ha ^ hb) + java.lang.Long.bitCount(la ^ lb)
      if d <= 3
    } yield (a, b, d.toLong)).toSet
    val got = Multimodal.mmPhashPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want,
      s"banded pairs must equal the exact d<=3 set: got ${got.size}, want ${want.size}")
    graft.Caches.clear()
  }

  test("mm_audio_segments: frames tile each clip, silent frames are exactly the gapped ones") {
    val out = Multimodal.mmAudioSegments(spark, sf).cache()
    val rows = out.collect()
    // frames tile: per doc, n_in_frame sums to the clip length and
    // only the LAST frame may be partial
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (id, fr) =>
      val n = 400L + (id * 13L) % 1600L
      assert(fr.map(_.getLong(2)).sum == n, s"doc $id frames must tile the clip")
      val sorted = fr.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (0L until sorted.length.toLong),
        s"doc $id frame indices must be dense")
      assert(sorted.dropRight(1).forall(_.getLong(2) == 100L),
        s"doc $id: only the last frame may be partial")
      // the gapped rule: frame % 7 == 3 is silent (energy 0), all
      // other FULL frames are loud (a partial tail frame of a gapped
      // index is also silent)
      sorted.foreach { r =>
        val silent = r.getBoolean(5)
        if (r.getLong(1) % 7 == 3) assert(silent && r.getLong(3) == 0L)
        else if (r.getLong(2) == 100L)
          assert(!silent && r.getLong(3) > 100000L, s"doc $id frame ${r.getLong(1)} should be loud")
      }
    }
    assert(rows.count(_.getBoolean(5)) > 0, "the corpus must contain silent frames")
    out.unpersist()
  }

  test("mm_payload_dedup groups exactly the byte-identical bodies") {
    val out = Multimodal.mmPayloadDedup(spark, sf).cache()
    val docs = Tables.documents(spark, sf)
    assert(out.count() == docs.count(), "every payload verdicted once")
    // the digest groups are exactly the raw-text equality groups
    val byText = docs.groupBy("text")
      .agg(min("doc_id").as("want_rep"), count(lit(1)).as("want_copies"))
    val joined = out.join(docs.select("doc_id", "text"), "doc_id")
      .join(byText, "text")
    assert(joined.filter(col("rep_doc_id") =!= col("want_rep") ||
                         col("n_copies") =!= col("want_copies")).count() == 0)
    // representatives are never dups; dup flags match the group size
    assert(out.filter(col("doc_id") === col("rep_doc_id") && col("is_dup")).count() == 0)
    assert(out.filter(col("is_dup")).count() ==
           out.count() - out.select("body_digest").distinct().count())
    out.unpersist()
  }
}
