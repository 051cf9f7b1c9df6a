package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing (SURVEY.md §2 `mm_extract_meta`): media
  * payloads as opaque `binary` columns + typed metadata extraction.
  *
  * The container has no image/audio codecs, so the pixel/sample decode
  * is a deterministic STUB (see [[decodeStub]]) — but everything
  * Spark-side is real: the binary column, the self-describing header
  * layout, header parsing with native binary/string functions (stays
  * inside whole-stage codegen), and the schema a downstream
  * feature-extract stage would consume. At 100 TB this is a pure map
  * stage: metadata extraction reads only the first 21 bytes of each
  * payload and never shuffles blob bytes.
  *
  * Header layout (ASCII, fixed-width so `substring` parses it):
  * bytes 1-4 magic "GFT0" | 5 media kind I/A/V | 6-11 width/samples |
  * 12-17 height/channels | 18-21 frame count. Body follows.
  */
object Multimodal {

  /** Synthesize a deterministic media payload per document: a typed
    * header + the document text as stand-in body bytes. Stands in for
    * reading real blobs (parquet binary columns work identically).
    */
  def synthesizePayloads(s: SparkSession, dir: String): DataFrame = {
    // Engine-neutral arithmetic (mirrors the DuckDB oracle exactly) —
    // a real deployment reads blobs; the header is what's under test.
    val kind = element_at(array(lit("I"), lit("A"), lit("V")),
      (pmod(col("doc_id"), lit(3L)) + 1).cast("int"))
    val width  = pmod(col("doc_id") * 7919L, lit(1920L)) + 16L
    val height = pmod(col("doc_id") * 104729L, lit(1080L)) + 16L
    val frames = when(kind === "I", 1L)
      .otherwise(pmod(col("doc_id") * 31L, lit(9000L)) + 1L)
    val header = concat(
      lit("GFT0"), kind,
      lpad(width.cast("string"), 6, "0"),
      lpad(height.cast("string"), 6, "0"),
      lpad(frames.cast("string"), 4, "0"))
    Tables.documents(s, dir)
      .select(col("doc_id"), encode(concat(header, col("text")), "UTF-8").as("payload"))
  }

  /** STUB for the codec stage. A real deployment would decode pixels /
    * samples here via `mapInPandas`/`mapPartitions` batches against an
    * image or audio library; this container has none, so the "content
    * feature" is a deterministic digest of the payload bytes (md5 —
    * engine-neutral, so the oracle can verify the plumbing). The
    * signature (binary in, fixed-width feature out, row-local) is what
    * the real decoder would have.
    */
  def decodeStub(payload: Column): Column =
    conv(substring(md5(payload), 1, 6), 16, 10).cast("long").as("content_feature")

  /** Typed metadata extraction from the binary payload: parse the
    * fixed-width header (first 21 bytes only — column-pruned reads
    * never touch blob bodies), validate magic, emit typed columns plus
    * the stubbed content feature.
    */
  def extractMeta(payloads: DataFrame): DataFrame = {
    val head = decode(substring(col("payload"), 1, 21), "UTF-8")
    payloads
      .select(
        col("doc_id"),
        (substring(head, 1, 4) === "GFT0").as("header_ok"),
        substring(head, 5, 1).as("media_kind"),
        substring(head, 6, 6).cast("long").as("width"),
        substring(head, 12, 6).cast("long").as("height"),
        substring(head, 18, 4).cast("long").as("n_frames"),
        length(col("payload")).cast("long").as("n_bytes"),
        decodeStub(col("payload")).as("content_feature"))
      .orderBy("doc_id")
  }

  /** SURVEY §2 `mm_extract_meta`: synthesize then extract. */
  def mmExtractMeta(s: SparkSession, dir: String): DataFrame =
    extractMeta(synthesizePayloads(s, dir))

  /** SURVEY §2 `mm_frame_sample`: uniform frame sampling for the video
    * rows — the standard video-training prep step (a frame decoder
    * consumes (payload, frame_idx) pairs; this computes WHICH frames).
    * For each video, k uniformly-spaced indices idx_i = (i·n_frames)
    * div k, deduplicated and sorted (short clips with n_frames < k
    * yield each frame once, never an out-of-range index). Pure
    * row-local metadata arithmetic on the parsed header — blob bodies
    * are untouched, nothing shuffles; the explode multiplies rows ≤ k×
    * BEFORE the decoder, which is the point: sampling 8 of ~4500
    * frames drops 99.8% of decode work at the plan level.
    */
  def mmFrameSample(s: SparkSession, dir: String, k: Int = 8): DataFrame = {
    require(k > 0, "k must be positive")
    val meta = extractMeta(synthesizePayloads(s, dir))
    meta.filter(col("media_kind") === "V")
      .select(col("doc_id"), col("n_frames"),
        // floor(i·n/k) over doubles is exact here: i·n_frames is
        // bounded by k × frame-count-per-video (video length, not
        // corpus size) — far below 2^53 for any real clip.
        explode(array_sort(array_distinct(transform(
          sequence(lit(0L), lit(k - 1L)),
          i => floor(i * col("n_frames") / lit(k)))))).as("frame_idx"))
      .orderBy("doc_id", "frame_idx")
  }

  /** SURVEY §2 `mm_chunk_text`: fixed-window chunk manifest over each
    * payload's decoded BODY (everything after the 21-byte header) —
    * the chunking step a retrieval/embedding ingest runs so downstream
    * stages address stable (doc, chunk) units instead of whole blobs.
    * Character windows (not bytes) so multibyte text never splits
    * mid-codepoint — the usual contract for text chunking; per chunk:
    * ordinal, length, and an md5-derived content key (both engines
    * hash the chunk's UTF-8 bytes, so the key is engine-neutral).
    * Row-local explode ≤ ceil(len/window) per doc; header parsing and
    * slicing stay inside codegen; blob bytes never shuffle — only the
    * manifest rows do.
    */
  def mmChunkText(s: SparkSession, dir: String, window: Int = 256): DataFrame = {
    require(window > 0, "window must be positive")
    val body = decode(substring(col("payload"), 22, Int.MaxValue), "UTF-8")
    synthesizePayloads(s, dir)
      .select(col("doc_id"), body.as("body"))
      .select(col("doc_id"), col("body"),
        // n chunks = ceil(len/window), min 1 (empty body -> one empty chunk)
        greatest(lit(1L),
          expr(s"(char_length(body) + ${window - 1}) div $window")).as("n_chunks"))
      .select(col("doc_id"), col("n_chunks"),
        posexplode(transform(
          sequence(lit(0L), col("n_chunks") - 1),
          i => col("body").substr((i * window + 1).cast("int"), lit(window)))))
      .select(
        col("doc_id"),
        col("pos").cast("long").as("chunk_idx"),
        length(col("col")).cast("long").as("n_chars"),
        conv(substring(md5(col("col")), 1, 12), 16, 10).cast("long").as("chunk_key"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** SURVEY §2 `mm_payload_dedup`: exact dedup over the binary BODY
    * bytes (everything after the 21-byte header) — the "same media
    * file uploaded twice under different ids" cut, the binary-column
    * member of the dedup family (its text siblings normalize before
    * hashing; media dedup is BYTE-exact by definition: one changed
    * byte is a different asset). Digest computed map-side on the
    * binary slice (`md5` over the raw bytes — no decode, stays in
    * codegen), so only 32-char digests ever shuffle, never blob
    * bodies — at 100 TB the shuffle is ~fifty bytes per asset
    * regardless of asset size. Keeper = min doc_id per digest via one
    * digest-keyed partial agg joined back on the digest (the
    * dedup_exact_hash shape on a binary source).
    */
  def mmPayloadDedup(s: SparkSession, dir: String): DataFrame = {
    val body = expr("substring(payload, 22, 2147483647)")
    val digests = synthesizePayloads(s, dir)
      .select(col("doc_id"), md5(body).as("body_digest"),
              length(body).cast("long").as("body_bytes"))
    val reps = digests.groupBy("body_digest")
      .agg(min("doc_id").as("rep_doc_id"), count(lit(1)).as("n_copies"))
    digests.join(reps, Seq("body_digest"))
      .select(col("doc_id"), col("body_digest"), col("body_bytes"),
              col("rep_doc_id"), col("n_copies"),
              (col("doc_id") =!= col("rep_doc_id")).as("is_dup"))
      .orderBy("doc_id")
  }

  /** SURVEY §2 `mm_chunk_roundtrip`: the INVERSE of [[mmChunkText]],
    * proving chunking is lossless — each document's fixed-window
    * chunks are scattered by the shuffle, regrouped by doc, sorted by
    * ordinal and re-joined, and the output carries md5(reassembled
    * body). The oracle computes md5 straight from the source text, so
    * a hash match certifies byte-exact reconstruction through the full
    * chunk→shuffle→reassemble path (the property every retrieval
    * ingest silently relies on, and the step that breaks first with
    * byte-windowed chunking of multibyte text).
    *
    * Scale shape: ordered reassembly is `array_sort(collect_list(
    * struct(ordinal, chunk)))` — collect_list is partial-aggregated
    * and per-key state is bounded by the DOCUMENT'S OWN SIZE, the
    * irreducible state of any reassembler; the sort is row-local over
    * that doc's chunks. Nothing global: no window over the corpus, one
    * shuffle on doc_id.
    */
  def mmChunkRoundtrip(s: SparkSession, dir: String, window: Int = 256): DataFrame =
    chunkRoundtripOver(
      Tables.documents(s, dir).select(col("doc_id"), col("text")), window)
      .orderBy("doc_id")

  /** [[mmChunkRoundtrip]]'s core over any (doc_id, text) frame —
    * factored so MultimodalSpec can drive crafted multibyte / empty /
    * exact-multiple bodies through it.
    */
  def chunkRoundtripOver(docs: DataFrame, window: Int): DataFrame = {
    require(window > 0, "window must be positive")
    val chunks = docs
      .select(col("doc_id"), col("text").as("body"),
        greatest(lit(1L),
          expr(s"(char_length(text) + ${window - 1}) div $window")).as("n_chunks"))
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0L), col("n_chunks") - 1),
          i => col("body").substr((i * window + 1).cast("int"), lit(window)))))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"), col("col").as("chunk"))
    chunks.groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        md5(encode(
          array_join(
            transform(
              array_sort(collect_list(struct(col("chunk_idx"), col("chunk")))),
              x => x.getField("chunk")),
            ""),
          "UTF-8")).as("body_md5"))
  }

  /** Decoded-content row produced by the batch decoder. */
  case class DecodedMeta(doc_id: Long, n_bytes: Long, content_feature: Long)

  /** Codec contract for [[decodeBatched]] — the injection point a
    * container WITH real image/audio libraries fills, leaving the
    * operator (and its plan) unmodified. `open()` runs ONCE PER
    * PARTITION on the executor (amortized codec/model init — the
    * expensive part of real decoders); the function it returns decodes
    * each blob to its content feature. Serializable: the codec object
    * ships in the task closure, its `open()`ed state never does.
    */
  trait MediaCodec extends Serializable {
    def open(): Array[Byte] => Long
  }

  /** Default codec: the same deterministic md5 digest as
    * [[decodeStub]] (no codecs in this container — declared stub).
    * MultimodalSpec asserts the batched and expression paths agree
    * byte-for-byte.
    */
  object Md5StubCodec extends MediaCodec {
    override def open(): Array[Byte] => Long = {
      // per-partition "codec" init happens once, here
      val md = java.security.MessageDigest.getInstance("MD5")
      bytes => {
        md.reset()
        java.lang.Long.parseLong(
          md.digest(bytes).take(3).map(b => f"$b%02x").mkString, 16)
      }
    }
  }

  /** The BATCH decode path a real codec plugs into: `mapPartitions`
    * over (id, payload) rows, so a partition's blobs stream through one
    * decoder instance (the shape `mapInPandas` gives Python codecs —
    * amortized init, batch-friendly). The codec is injected (see
    * [[MediaCodec]]); the default is the md5 stub. The signature
    * (Iterator[bytes] in, typed rows out, row-local, no shuffle) is
    * exactly what a pixel/sample decoder has, and the PLAN is codec-
    * independent — MultimodalSpec pins that swapping codecs leaves the
    * physical plan shape unchanged.
    */
  def decodeBatched(s: SparkSession, payloads: DataFrame,
                    codec: MediaCodec = Md5StubCodec): DataFrame = {
    import s.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val decode = codec.open()
        it.map { case (id, bytes) => DecodedMeta(id, bytes.length.toLong, decode(bytes)) }
      }
      .toDF()
  }
}
