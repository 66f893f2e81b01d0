package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** A multimodal asset row: opaque binary payload + typed metadata. */
case class MediaAsset(
    media_id: Long,
    kind: String,            // "image" | "audio" | "video"
    payload: Array[Byte],    // opaque — decoded only behind the stub
    source: String)

/** Decoded-asset features (shape of a real decoder's output). */
case class MediaFeatures(
    media_id: Long,
    kind: String,
    byte_len: Long,
    width: Int,              // STUB values — see decodeStub
    height: Int,
    n_channels: Int,
    mean_intensity: Double)

/**
 * Multimodal column handling for a training-data pipeline: image/audio/
 * video as opaque `binary` columns with typed metadata. The Spark-side
 * plumbing — schema, batch shape, partition-parallel decode, frame
 * sampling — is real and tested. Image DECODE is real for the formats
 * the JDK ships codecs for (PNG/BMP/GIF/JPEG via javax.imageio, see
 * [[decodeReal]]); audio/video and exotic image codecs remain STUBBED
 * with a deterministic fake (this container has no such libraries), at
 * the clearly-marked points in [[decodeStub]] / [[resizeStub]].
 */
object Multimodal {

  /**
   * ===== STUB =====
   * A real implementation calls an image/audio codec here (e.g. javax
   * ImageIO / ffmpeg bindings) inside mapPartitions so the library is
   * initialized once per partition, not per row. The deterministic fake
   * derives "decoded" properties purely from the payload bytes, so tests
   * and oracles are stable.
   */
  def decodeStub(a: MediaAsset): MediaFeatures = {
    val len = a.payload.length.toLong
    val sum = { var s = 0L; var i = 0; while (i < a.payload.length) { s += (a.payload(i) & 0xff); i += 1 }; s }
    MediaFeatures(
      media_id = a.media_id,
      kind = a.kind,
      byte_len = len,
      width = (len % 640).toInt + 1,
      height = (len % 480).toInt + 1,
      n_channels = if (a.kind == "image") 3 else 1,
      mean_intensity = if (len > 0) sum.toDouble / len else 0.0)
  }

  /** Deterministic magic-byte gate for the real decoder: only payloads
    * that START like one of the JDK-decodable formats reach ImageIO —
    * anything else (this repo's synthetic text fixtures, audio, video)
    * takes [[decodeStub]] without ever touching a codec. BMP's "BM" can
    * occur in text, so BMP additionally requires the header's
    * little-endian file-size field to equal the payload length (every
    * real encoder writes it). */
  private[graft] def looksLikeImage(p: Array[Byte]): Boolean = {
    def u(i: Int) = p(i) & 0xff
    if (p.length >= 8 && u(0) == 0x89 && u(1) == 'P' && u(2) == 'N' &&
      u(3) == 'G' && u(4) == 0x0d && u(5) == 0x0a && u(6) == 0x1a &&
      u(7) == 0x0a) true // PNG
    else if (p.length >= 3 && u(0) == 0xff && u(1) == 0xd8 && u(2) == 0xff)
      true // JPEG SOI
    else if (p.length >= 4 && u(0) == 'G' && u(1) == 'I' && u(2) == 'F' &&
      u(3) == '8') true // GIF87a/89a
    else if (p.length >= 6 && u(0) == 'B' && u(1) == 'M' &&
      (u(2) | (u(3) << 8) | (u(4) << 16) | (u(5).toLong << 24)) == p.length)
      true // BMP with consistent size field
    else false
  }

  /**
   * REAL image decode (round 12): `javax.imageio` ships with the JDK, so
   * PNG/BMP/GIF/JPEG payloads decode for real — width/height/bands from
   * the decoded raster, mean_intensity = mean sample value over all
   * bands. Non-image payloads (and the exotic-codec kinds this container
   * has no libraries for) keep the clearly-marked [[decodeStub]]
   * fallback; a payload that passes the magic gate but fails to parse
   * falls back too (same bytes, same path — deterministic either way).
   */
  def decodeReal(a: MediaAsset): MediaFeatures =
    if (a.kind != "image" || a.payload == null || !looksLikeImage(a.payload))
      decodeStub(a)
    else {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a.payload))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) decodeStub(a)
      else {
        val raster = img.getRaster
        val (w, h, bands) = (img.getWidth, img.getHeight, raster.getNumBands)
        var s = 0.0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var b = 0
            while (b < bands) { s += raster.getSample(x, y, b); b += 1 }
            x += 1
          }
          y += 1
        }
        MediaFeatures(a.media_id, a.kind, a.payload.length.toLong, w, h,
          bands, s / (w.toDouble * h * bands))
      }
    }

  /**
   * Partition-parallel decode: one codec init per partition, streaming
   * iterator (no materialization of the partition in memory) — the Scala
   * analogue of a batched mapInPandas decode UDF. Real ImageIO decode
   * for JDK-supported image payloads, [[decodeStub]] for the rest.
   */
  def decodeAll(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    assets.mapPartitions { it =>
      // codec init once per partition: no ImageIO disk cache (temp-file
      // churn per decode otherwise)
      javax.imageio.ImageIO.setUseCache(false)
      it.map(decodeReal)
    }
  }

  /**
   * ===== STUB =====
   * Resize: a real implementation decodes, scales to (targetW, targetH)
   * and re-encodes inside the per-partition codec context. The
   * deterministic fake keeps the byte budget proportional to the target
   * area (payload truncated to ceil(len * area / VGA-area)), so the
   * Spark-side contract — payload in, smaller payload + new dimensions
   * out — is real and oracle-stable.
   */
  def resizeStub(a: MediaAsset, targetW: Int, targetH: Int): MediaAsset = {
    val keep = math.min(a.payload.length.toLong,
      math.ceil(a.payload.length.toLong * (targetW.toLong * targetH) /
        (640.0 * 480.0)).toLong).toInt
    a.copy(payload = java.util.Arrays.copyOfRange(a.payload, 0, keep))
  }

  /** Partition-parallel resize — same once-per-partition codec-init shape
    * as [[decodeAll]]; streams, never materializes a partition. */
  def resizeAll(assets: Dataset[MediaAsset], targetW: Int,
      targetH: Int): Dataset[MediaAsset] = {
    implicit val enc = Encoders.product[MediaAsset]
    assets.mapPartitions { it =>
      // (real impl: initialize the codec HERE, once per partition)
      it.map(resizeStub(_, targetW, targetH))
    }
  }

  /** Expression-only twin of [[resizeStub]]'s byte-budget contract for
    * DataFrame pipelines: (out_len, out_md5) of the resized payload
    * without leaving codegen. */
  def resizedMeta(payload: Column, targetW: Int, targetH: Int): Seq[Column] = {
    val keep = least(length(payload).cast("long"),
      ceil(length(payload).cast("long") * (targetW.toLong * targetH) /
        lit(640.0 * 480.0)).cast("long"))
    val out = call_function("substring", payload, lit(1), keep.cast("int"))
    Seq(keep.as("out_len"), md5(out).as("out_md5"))
  }

  /** Binary metadata as pure expressions — no decode needed; pushes down
    * to a column scan of just the payload. */
  def payloadMeta(payload: Column): Seq[Column] = Seq(
    length(payload).as("byte_len"),
    sha2(payload, 256).as("sha256"),
    md5(payload).as("payload_md5"))

  /**
   * Deterministic frame sampling: `nFrames` fixed-stride byte slices of
   * the payload (a real video pipeline samples frames; the byte-slice
   * shape exercises the same explode/partition behavior). Returns one row
   * per (asset, frame_idx) with the frame's digest — the classic
   * fan-out-then-process shape, fully codegen/pushdown friendly.
   */
  def sampleFrames(assets: DataFrame, payloadCol: String, idCol: String,
      nFrames: Int, frameLen: Int): DataFrame = {
    val p = col(payloadCol)
    val total = length(p)
    // stride floor(total/nFrames), first nFrames offsets; payload shorter
    // than nFrames bytes yields fewer frames (sequence guard).
    val stride = greatest(floor(total / nFrames).cast("int"), lit(1))
    assets
      .select(col(idCol), p.as("__p"), stride.as("__stride"), total.as("__total"))
      .filter(col("__total") >= 1) // sequence(0, -1) would count DOWN
      .select(col(idCol),
        // outer: avoids InferFiltersFromGenerate pushing the inlined frame
        // expression below the exchange (see Dedup.minhashNearDupPairs)
        posexplode_outer(transform(
          sequence(lit(0), least(lit(nFrames - 1), col("__total") - 1)),
          i => substring_index_safe(col("__p"), i * col("__stride") + 1, frameLen)))
          .as(Seq("frame_idx", "frame")))
      .select(col(idCol), col("frame_idx"), md5(col("frame")).as("frame_md5"))
  }

  /**
   * Video near-dup via sampled-frame fingerprints (round 18 — the
   * temporal-media sibling of the pHash family): two assets pair when
   * at least `minMatches` of their `nFrames` deterministic frame
   * digests agree AT THE SAME FRAME INDEX — the re-encode /
   * local-edit / overlay shape, where most sampled frames survive
   * byte-identical (a global re-cut shifts every frame and belongs to
   * the perceptual-hash family instead). Scale shape: the inverted
   * join on (frame_idx, digest) touches only colliding frames — never
   * all pairs — the shingle-bucket discipline with frames as the
   * keys; a hot frame (shared intro/black frame) is a skewed join key
   * AQE's skew split handles, and the per-pair state is one count.
   * Returns (id_a, id_b, matches), smaller id first.
   */
  def frameNearDupPairs(assets: DataFrame, payloadCol: String,
      idCol: String, nFrames: Int = 8, frameLen: Int = 16,
      minMatches: Int = 6): DataFrame = {
    val frames = sampleFrames(assets, payloadCol, idCol, nFrames,
      frameLen)
    val a = frames.select(col(idCol).as("id_a"), col("frame_idx"),
      col("frame_md5"))
    val b = frames.select(col(idCol).as("id_b"), col("frame_idx"),
      col("frame_md5"))
    a.join(b, Seq("frame_idx", "frame_md5"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("matches"))
      .filter(col("matches") >= minMatches)
  }

  // ---------------------------------------------- audio fingerprint

  /** HK fingerprint geometry: 8 analysis windows x 16 fingerprint bits;
    * each window carries bands+1 = 17 band energies, so the analysis
    * excerpt is the payload's FIRST 8*17 = 136 bytes (fixed-duration,
    * like the real scheme — see [[hkSubFingerprints]] on why
    * length-normalized grids are structurally biased). Windows 1..7
    * emit a 16-bit sub-fingerprint each (window 0 is the derivative's
    * left edge). */
  final val AudioWindows = 8
  final val AudioBands = 16

  /**
   * ===== STUB (deterministic fake, oracle-replayable) =====
   * Per-window audio sub-fingerprints, the Haitsma-Kalker derivation
   * (ISMIR 2002, "A Highly Robust Audio Fingerprinting System"): bit
   * (w, b) is the SIGN of the time-derivative of the band-energy
   * difference — (E(w,b) - E(w,b+1)) - (E(w-1,b) - E(w-1,b+1)) > 0.
   * A real implementation computes E from an FFT filter bank over
   * decoded PCM frames; this container has no audio codecs, so the
   * STUB band energy E(w, b) is the byte at offset w*(bands+1)+b of a
   * FIXED-LENGTH excerpt (the first nWindows*(bands+1) bytes) — pure
   * integer arithmetic a SQL engine replays exactly, while the bit
   * derivation itself is the real algorithm. The FIXED excerpt is
   * load-bearing, exactly as in the real scheme (HK fingerprints a
   * fixed-duration block, never the whole length-normalized signal):
   * a dHashBytes-style length-normalized grid (blocks = len/G) gives
   * every payload a block-size pattern determined by its LENGTH, and
   * those structural sum steps dominate the content — measured on a
   * 300k probe corpus as 4.5x the independent-bit candidate model
   * with dozens of near-threshold false pairs between unrelated
   * same-shape payloads. Byte-local corruption inside the excerpt
   * (re-encode jitter's stand-in) moves one energy and flips at most
   * 4 bits of the (nWindows-1)*bands total; corruption PAST the
   * excerpt leaves the fingerprint identical (the excerpt contract);
   * unrelated payloads disagree on ~half. Requires len >= G (the
   * minimum-duration contract); callers gate, see
   * [[audioFingerprint]]. Returns nWindows-1 bit-vector strings,
   * index i = window i+1, char b+1 = band b's bit.
   */
  def hkSubFingerprints(payload: Array[Byte], nWindows: Int = AudioWindows,
      bands: Int = AudioBands): Array[String] = {
    // the codegen'd verify parses one sub-fingerprint with a single
    // signed-long conv — past 62 bits it would null out and silently
    // UNDERCOUNT bit errors (flooding the output with false pairs),
    // so refuse loudly here, the leaf every entry point runs through
    require(nWindows >= 2 && bands >= 1 && bands <= 62,
      s"hkSubFingerprints: need nWindows >= 2 and 1 <= bands <= 62 " +
        s"(got nWindows=$nWindows, bands=$bands)")
    val slices = bands + 1
    val g = nWindows * slices
    val e = new Array[Long](g)
    var i = 0
    while (i < g) {
      e(i) = payload(i) & 0xff
      i += 1
    }
    val out = new Array[String](nWindows - 1)
    var w = 1
    while (w < nWindows) {
      val sb = new java.lang.StringBuilder(bands)
      var b = 0
      while (b < bands) {
        val cur = e(w * slices + b) - e(w * slices + b + 1)
        val prev = e((w - 1) * slices + b) - e((w - 1) * slices + b + 1)
        sb.append(if (cur - prev > 0) '1' else '0')
        b += 1
      }
      out(w - 1) = sb.toString
      w += 1
    }
    out
  }

  /**
   * Per-asset audio fingerprints: one row per (asset, window) with the
   * window's [[hkSubFingerprints]] bit-vector — the lookup keys of the
   * HK scheme (a candidate needs ONE window's sub-fingerprint to
   * survive corruption exactly; the full-sequence bit-error rate then
   * verifies). Payloads shorter than the nWindows*(bands+1)-block
   * analysis grid emit no rows (the minimum-duration gate — replayed
   * by the oracles as `len >= G`). Same partition-parallel shape as
   * [[perceptualHash]]. Returns (idCol, window_idx, subfp).
   */
  def audioFingerprint(assets: DataFrame, payloadCol: String,
      idCol: String, nWindows: Int = AudioWindows,
      bands: Int = AudioBands): DataFrame = {
    // fail on the driver, not per-row in the executors — same bound
    // as the hkSubFingerprints leaf (62-bit conv limit in the verify)
    require(nWindows >= 2 && bands >= 1 && bands <= 62,
      s"audioFingerprint: need nWindows >= 2 and 1 <= bands <= 62 " +
        s"(got nWindows=$nWindows, bands=$bands)")
    val spark = assets.sparkSession
    import spark.implicits._
    val g = nWindows * (bands + 1)
    assets
      .select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .filter(length(col(payloadCol)) >= g)
      .as[(Long, Array[Byte])]
      .flatMap { case (id, p) =>
        val fps = hkSubFingerprints(p, nWindows, bands)
        Iterator.tabulate(fps.length)(i => (id, i + 1, fps(i)))
      }
      .toDF(idCol, "window_idx", "subfp")
  }

  /**
   * Per-modality near-dup ROUTER — the single user-facing entry point
   * over a mixed media table (round 18 continuation): each kind
   * partition takes its own family — `image` -> perceptual-hash
   * banding ([[perceptualHash]] +
   * [[graft.operators.PhashDedup.phashNearDupPairs]]), `audio` ->
   * Haitsma-Kalker sub-fingerprints
   * ([[graft.operators.AudioDedup.audioNearDupPairs]]), everything
   * else (video) -> sampled-frame matching ([[frameNearDupPairs]]).
   * Pairs are within-kind by construction (a cross-modal near-dup is
   * a different question — embeddings, not signatures). Returns
   * (method, id_a, id_b, score) with method in
   * {phash, hk_audio, frames} and score the family's own metric
   * (hamming / bit_errors / matches) — each family's scale shape is
   * its own (banded, inverted-index, never all-pairs); the router
   * adds ONE narrow kind filter per leg on top.
   */
  def nearDupPairsByKind(assets: DataFrame, payloadCol: String,
      idCol: String, kindCol: String = "kind", maxHamming: Int = 6,
      maxBitErrors: Int = 28, nFrames: Int = 8, frameLen: Int = 16,
      minMatches: Int = 6): DataFrame = {
    import graft.operators.{AudioDedup, PhashDedup}
    implicit val enc: org.apache.spark.sql.Encoder[MediaAsset] =
      Encoders.product[MediaAsset]
    // all three legs key pairs by a LONG id (the image/audio legs
    // cast; a silent cast of string/UUID ids would null out and die
    // deep inside an encoder) — refuse non-numeric ids loudly here
    val idType = assets.schema(idCol).dataType
    require(idType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"nearDupPairsByKind needs a numeric id column, got $idType " +
        s"for '$idCol' — map string/UUID ids to longs first")
    // null/unknown kinds take the frame leg (the scaladoc's
    // "everything else") — a routing operator must not silently drop
    // rows it doesn't recognize
    val k = coalesce(col(kindCol), lit("video"))
    val img = perceptualHash(assets.filter(k === "image")
      .select(col(idCol).cast("long").as("media_id"),
        lit("image").as("kind"),
        col(payloadCol).cast("binary").as("payload"),
        lit("router").as("source")).as[MediaAsset])
    val imgPairs = PhashDedup
      .phashNearDupPairs(img, "media_id", "phash", maxHamming)
      .select(lit("phash").as("method"), col("id_a"), col("id_b"),
        col("hamming").cast("long").as("score"))
    val audPairs = AudioDedup
      .audioNearDupPairs(assets.filter(k === "audio"),
        payloadCol, idCol, maxBitErrors = maxBitErrors)
      .select(lit("hk_audio").as("method"), col("id_a"), col("id_b"),
        col("bit_errors").cast("long").as("score"))
    val vidPairs = frameNearDupPairs(
      assets.filter(!k.isin("image", "audio"))
        .withColumn(idCol, col(idCol).cast("long")),
      payloadCol, idCol, nFrames, frameLen, minMatches)
      .select(lit("frames").as("method"), col("id_a"), col("id_b"),
        col("matches").cast("long").as("score"))
    imgPairs.unionByName(audPairs).unionByName(vidPairs)
  }

  /** Byte-substring helper (Spark's substring Column API takes Int pos;
    * the expr form accepts a Column position). */
  private def substring_index_safe(bin: Column, pos: Column, len: Int): Column =
    expr_substr(bin, pos, lit(len))

  private def expr_substr(bin: Column, pos: Column, len: Column): Column =
    call_function("substring", bin, pos, len)

  // ------------------------------------------------- perceptual hash

  /** The dHash grid: 9 columns x 8 rows of cells; each row's 8 adjacent
    * comparisons contribute one bit -> 64 bits total (the standard
    * difference-hash layout). */
  private final val HashCols = 9
  private final val HashRows = 8
  final val HashBits = 64

  /**
   * Gradient perceptual hash (dHash) of a DECODED image: the raster is
   * block-averaged onto a 9x8 grid (mean sample value over the block's
   * pixels and bands — the downsample step real pHash pipelines run as
   * a bicubic resize), and bit (row, col) is set iff the cell right of
   * (row, col) is brighter. Two encodings of the same picture (PNG vs
   * BMP, mild resize/requantization) keep almost every gradient sign,
   * so their hashes sit within a few bits of hamming distance, while
   * distinct pictures land ~32 bits apart — the classic near-dup
   * geometry MinHash gives text. Returns a 64-char '0'/'1' string
   * (bit-vector form: band keys are substrings, hamming is a per-char
   * compare, and stored hashes replay in any SQL engine).
   */
  def dHashImage(img: java.awt.image.BufferedImage): String = {
    val raster = img.getRaster
    val (w, h, bands) = (img.getWidth, img.getHeight, raster.getNumBands)
    val cells = new Array[Double](HashCols * HashRows)
    var r = 0
    while (r < HashRows) {
      val y0 = (r.toLong * h / HashRows).toInt
      val y1 = math.max(((r + 1).toLong * h / HashRows).toInt, y0 + 1)
      var c = 0
      while (c < HashCols) {
        val x0 = (c.toLong * w / HashCols).toInt
        val x1 = math.max(((c + 1).toLong * w / HashCols).toInt, x0 + 1)
        var s = 0.0
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) {
            var b = 0
            while (b < bands) { s += raster.getSample(x, y, b); b += 1 }
            x += 1
          }
          y += 1
        }
        val px = (math.min(y1, h) - y0).toLong * (math.min(x1, w) - x0) * bands
        cells(r * HashCols + c) = if (px > 0) s / px else 0.0
        c += 1
      }
      r += 1
    }
    dHashBitsOf(cells)
  }

  /**
   * ===== STUB (deterministic fake, oracle-replayable) =====
   * The non-image arm of [[perceptualHash]]: the same 9x8 dHash grid
   * computed over byte-block SUMS of the raw payload (block g spans
   * bytes [g*len/72, (g+1)*len/72)) instead of decoded pixels. Pure
   * integer arithmetic over the bytes, so a SQL engine replays it
   * exactly (the mm_phash_* oracles do); small byte-local edits
   * (re-encode jitter's stand-in) move one or two block sums and flip
   * at most a few bits, preserving the near-dup geometry the banded
   * join needs.
   *
   * Discrimination caveat (documented, not load-bearing): the
   * length-normalized grid means the block-size pattern is a function
   * of len alone, and on homogeneous same-source payloads (e.g. a
   * text corpus standing in for media bytes) those structural sum
   * steps plus shared byte statistics pull unrelated payloads well
   * inside the hamming-6 operating point — this arm OVER-pairs there.
   * The family's discrimination contract lives on the decoded-raster
   * path ([[dHashImage]] — cross-picture separation is spec-proved on
   * real rasters); this arm only keeps non-decodable payloads
   * deterministic. For codec-less fingerprinting done right, see the
   * audio family's FIXED-excerpt design ([[hkSubFingerprints]]),
   * whose standing probe caught exactly this bias.
   */
  def dHashBytes(payload: Array[Byte]): String = {
    val len = payload.length
    val cells = new Array[Double](HashCols * HashRows)
    var g = 0
    while (g < HashCols * HashRows) {
      var i = (g.toLong * len / (HashCols * HashRows)).toInt
      val end = ((g + 1).toLong * len / (HashCols * HashRows)).toInt
      var s = 0L
      while (i < end) { s += (payload(i) & 0xff); i += 1 }
      cells(g) = s.toDouble
      g += 1
    }
    dHashBitsOf(cells)
  }

  /** Row-major adjacent-cell comparisons -> the 64-char bit vector.
    * Strict `>` so ties (empty blocks of a short payload) are stable. */
  private def dHashBitsOf(cells: Array[Double]): String = {
    val sb = new java.lang.StringBuilder(HashBits)
    var r = 0
    while (r < HashRows) {
      var c = 0
      while (c < HashCols - 1) {
        sb.append(
          if (cells(r * HashCols + c + 1) > cells(r * HashCols + c)) '1'
          else '0')
        c += 1
      }
      r += 1
    }
    sb.toString
  }

  /**
   * Per-asset perceptual hash — the multimodal near-dup signature
   * ([[decodeAll]]'s partition-parallel shape: one codec init per
   * partition, streaming iterator). Image payloads that pass the
   * magic-byte gate hash their DECODED raster ([[dHashImage]] — two
   * encodings of one picture collide); everything else takes the
   * deterministic byte-block arm ([[dHashBytes]]). Returns
   * (media_id, phash) — feed to
   * [[graft.operators.PhashDedup.phashNearDupPairs]] or a persisted
   * [[graft.operators.PhashDedup.buildPhashIndex]].
   */
  def perceptualHash(assets: Dataset[MediaAsset]): DataFrame = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { a =>
        val h =
          if (a.kind == "image" && a.payload != null &&
            looksLikeImage(a.payload)) {
            val img =
              try javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(a.payload))
              catch { case scala.util.control.NonFatal(_) => null }
            if (img == null) dHashBytes(a.payload) else dHashImage(img)
          } else dHashBytes(if (a.payload == null) Array.emptyByteArray
            else a.payload)
        (a.media_id, h)
      }
    }.toDF("media_id", "phash")
  }
}
