package graft.operators

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Schemas.MediaRecord

/** Multimodal column plumbing: opaque `binary` payloads with typed metadata
  * and a batched per-partition decode.
  *
  * The container has no native image/audio codecs, but container FORMAT
  * headers are pure bytes — so the decode step is a real pure-JVM header
  * parse: PNG IHDR width/height, a JPEG marker walk to SOF0-3, and a WAV
  * RIFF chunk walk to fmt/data (frame count). The decoder sniffs the
  * payload bytes (it does NOT trust the `kind` column — same as a real
  * codec), and unparseable payloads (here: the mp4 stand-in, which would
  * need a box parser + codec) come back `parsed = 0` instead of failing the
  * partition. Payload construction plants deterministic dimensions so the
  * decode is oracle-checkable end to end: Spark builds real format bytes,
  * parses them back, and DuckDB recomputes the expectation from the
  * planting formulas.
  *
  * Scale posture: `mapPartitions` with one decoder context per partition
  * (the expensive part for real codecs), constant memory, no driver
  * involvement — swapping the header parsers for JNI codec calls changes no
  * plumbing.
  */
object Multimodal {

  /** Deterministic planted image dimensions for doc id. */
  def plantedDims(id: Long): (Int, Int) =
    ((16 + id % 500).toInt, (16 + (id * 7) % 400).toInt)

  /** WAV sample rate used by the planted audio payloads. */
  val WavSampleRate = 8000

  // ---- payload builders (planting side) ----

  /** Minimal PNG: 8-byte signature + IHDR chunk (length, type, w, h,
    * bit-depth/color/compression/filter/interlace, CRC placeholder), body
    * appended raw. 33 header bytes; the IHDR layout is the real format. */
  def pngPayload(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(33 + body.length) // big-endian (PNG order)
    bb.put(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    bb.putInt(13).put("IHDR".getBytes(UTF_8))
    bb.putInt(w).putInt(h)
    bb.put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    bb.putInt(0) // CRC not verified by the dimension parse
    bb.put(body)
    bb.array()
  }

  /** Minimal JPEG: SOI + APP0/JFIF segment + SOF0 frame header (precision,
    * height, width, 3 components), body appended raw. 39 header bytes. */
  def jpegPayload(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(39 + body.length)
    bb.put(0xFF.toByte).put(0xD8.toByte)                    // SOI
    bb.put(0xFF.toByte).put(0xE0.toByte).putShort(16)       // APP0, len 16
    bb.put("JFIF".getBytes(UTF_8)).put(0.toByte)
    bb.put(1.toByte).put(1.toByte)                          // version 1.1
    bb.put(0.toByte).putShort(1).putShort(1)                // units, density
    bb.put(0.toByte).put(0.toByte)                          // no thumbnail
    bb.put(0xFF.toByte).put(0xC0.toByte).putShort(17)       // SOF0, len 17
    bb.put(8.toByte).putShort(h.toShort).putShort(w.toShort)
    bb.put(3.toByte)                                        // 3 components
    (1 to 3).foreach { c =>
      bb.put(c.toByte).put(0x11.toByte).put(0.toByte)
    }
    bb.put(body)
    bb.array()
  }

  /** Minimal PCM WAV: RIFF/WAVE + fmt chunk (mono, 16-bit, `WavSampleRate`)
    * + data chunk holding the body. 44 header bytes (little-endian). */
  def wavPayload(body: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(44 + body.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(UTF_8)).putInt(36 + body.length)
    bb.put("WAVE".getBytes(UTF_8))
    bb.put("fmt ".getBytes(UTF_8)).putInt(16)
    bb.putShort(1).putShort(1)                 // PCM, mono
    bb.putInt(WavSampleRate).putInt(WavSampleRate * 2)
    bb.putShort(2).putShort(16)                // block align, bits/sample
    bb.put("data".getBytes(UTF_8)).putInt(body.length)
    bb.put(body)
    bb.array()
  }

  // ---- parsers (decode side; each sniffs its own magic) ----

  /** PNG dimensions from the IHDR chunk (bytes 16..23 after the 8-byte
    * signature + chunk length/type). */
  def parsePngDims(p: Array[Byte]): Option[(Int, Int)] =
    if (p.length >= 24 && (p(0) & 0xff) == 0x89 &&
        p(1) == 'P'.toByte && p(2) == 'N'.toByte && p(3) == 'G'.toByte) {
      val bb = ByteBuffer.wrap(p, 16, 8)
      Some((bb.getInt, bb.getInt))
    } else None

  /** JPEG dimensions: walk the marker stream from SOI, skipping segments by
    * their declared length, until a SOF0-SOF3 frame header. */
  def parseJpegDims(p: Array[Byte]): Option[(Int, Int)] = {
    if (p.length < 4 || (p(0) & 0xff) != 0xFF || (p(1) & 0xff) != 0xD8)
      return None
    var i = 2
    while (i + 8 < p.length && (p(i) & 0xff) == 0xFF) {
      val marker = p(i + 1) & 0xff
      if (marker >= 0xC0 && marker <= 0xC3) {
        val h = ((p(i + 5) & 0xff) << 8) | (p(i + 6) & 0xff)
        val w = ((p(i + 7) & 0xff) << 8) | (p(i + 8) & 0xff)
        return Some((w, h))
      }
      val len = ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)
      if (len < 2) return None
      i += 2 + len
    }
    None
  }

  /** WAV data-chunk LAYOUT: verify RIFF/WAVE, walk chunks to `fmt ` (block
    * align) and `data`; returns (data byte offset, block align, frame
    * count) — everything a chunked feature extractor needs to SEEK each
    * window sample-accurately instead of decoding the whole file. */
  def parseWavLayout(p: Array[Byte]): Option[(Long, Int, Long)] = {
    def tag(off: Int) = new String(p, off, 4, UTF_8)
    if (p.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    val bb = ByteBuffer.wrap(p).order(ByteOrder.LITTLE_ENDIAN)
    var i = 12
    var blockAlign = -1
    while (i + 8 <= p.length) {
      val id = tag(i)
      val size = bb.getInt(i + 4)
      if (size < 0) return None
      if (id == "fmt " && i + 8 + 16 <= p.length)
        blockAlign = bb.getShort(i + 8 + 12).toInt
      else if (id == "data" && blockAlign > 0)
        // return BEFORE the advancement bound: a truncated recording whose
        // declared data size exceeds the remaining bytes still reports its
        // declared frame count
        return Some((i.toLong + 8L, blockAlign, size.toLong / blockAlign))
      // the advancement must never wrap Int (a crafted ~2^31 chunk size
      // would turn i negative and throw instead of degrading to None) — a
      // non-final chunk claiming more than the remaining payload is
      // corruption
      if (size > p.length - i - 8) return None
      i += 8 + size + (size & 1) // RIFF chunks are 2-byte aligned
    }
    None
  }

  /** WAV frame count — [[parseWavLayout]]'s frame leg. */
  def parseWavFrames(p: Array[Byte]): Option[Long] =
    parseWavLayout(p).map(_._3)

  /** Planted MP4 movie duration (ticks at timescale 1000) for doc id. */
  def plantedDuration(id: Long): Long = (id % 997) + 100

  /** Minimal MP4: `ftyp` (isom) + `moov` holding a version-0 `mvhd`
    * (timescale 1000, planted duration) + `mdat` wrapping the body —
    * the real ISO-BMFF box layout, parseable by any demuxer. */
  def mp4Payload(durationTicks: Long, body: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(16 + 116 + 8 + body.length) // big-endian
    bb.putInt(16); bb.put("ftyp".getBytes(UTF_8))
    bb.put("isom".getBytes(UTF_8)); bb.putInt(0)
    bb.putInt(116); bb.put("moov".getBytes(UTF_8))
    bb.putInt(108); bb.put("mvhd".getBytes(UTF_8))
    bb.putInt(0)                    // version + flags
    bb.putInt(0); bb.putInt(0)      // creation, modification
    bb.putInt(1000)                 // timescale
    bb.putInt(durationTicks.toInt)  // duration
    bb.put(new Array[Byte](108 - 8 - 20)) // rate..next_track, zeroed
    bb.putInt(8 + body.length); bb.put("mdat".getBytes(UTF_8)); bb.put(body)
    bb.array()
  }

  /** MP4 duration: verify `ftyp`, walk top-level boxes to `moov`, walk its
    * children to `mvhd`, read (timescale, duration). Size fields are
    * bounds-checked; truncated or lying boxes return None. */
  def parseMp4Duration(p: Array[Byte]): Option[Long] = {
    def tag(off: Int) = new String(p, off, 4, UTF_8)
    def be32(off: Int) = ByteBuffer.wrap(p, off, 4).getInt
    if (p.length < 16 || tag(4) != "ftyp") return None
    var i = 0
    while (i + 8 <= p.length) {
      val size = be32(i)
      if (size < 8 || size > p.length - i) return None
      if (tag(i + 4) == "moov") {
        var j = i + 8
        while (j + 8 <= i + size) {
          val cs = be32(j)
          if (cs < 8 || cs > i + size - j) return None
          if (tag(j + 4) == "mvhd" && cs >= 32) {
            val timescale = be32(j + 20)
            val duration = be32(j + 24)
            return if (timescale > 0) Some(duration.toLong) else None
          }
          j += cs
        }
        return None
      }
      i += size
    }
    None
  }

  /** Feature row produced by the decoder. Unparsed payloads (unsupported
    * container, truncated header) carry `parsed = 0` and -1 dimensions. */
  final case class MediaFeatures(media_id: Long, kind: String, mime: String,
                                 n_bytes: Long, parsed: Long,
                                 width: Int, height: Int, n_frames: Long)

  /** Decode one record by sniffing the payload bytes. */
  def decodeOne(r: MediaRecord): MediaFeatures = {
    val n = r.payload.length.toLong
    parsePngDims(r.payload).orElse(parseJpegDims(r.payload)) match {
      case Some((w, h)) =>
        MediaFeatures(r.media_id, r.kind, r.mime, n, 1L, w, h, 1L)
      case None => parseWavFrames(r.payload) match {
        case Some(frames) =>
          MediaFeatures(r.media_id, r.kind, r.mime, n, 1L, -1, -1, frames)
        case None => parseMp4Duration(r.payload) match {
          case Some(ticks) =>
            MediaFeatures(r.media_id, r.kind, r.mime, n, 1L, -1, -1, ticks)
          case None =>
            MediaFeatures(r.media_id, r.kind, r.mime, n, 0L, -1, -1, -1L)
        }
      }
    }
  }

  /** Build the media table from the documents corpus: payload = a REAL
    * format container (PNG for doc_id ≡ 0 mod 6, JPEG for ≡ 3, WAV for
    * ≡ 1 mod 3, ISO-BMFF MP4 for ≡ 2) wrapping the text bytes.
    * Dimensions/durations are planted via [[plantedDims]] /
    * [[plantedDuration]] so the decode is checkable. */
  def toMediaTable(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select("doc_id", "text").as[(Long, String)].map { case (id, text) =>
      val body = text.getBytes(UTF_8)
      val (w, h) = plantedDims(id)
      val (kind, mime, payload) =
        if (id % 3 == 0) {
          if (id % 6 == 0) ("image", "image/png", pngPayload(w, h, body))
          else ("image", "image/jpeg", jpegPayload(w, h, body))
        } else if (id % 3 == 1) ("audio", "audio/wav", wavPayload(body))
        else ("video", "video/mp4", mp4Payload(plantedDuration(id), body))
      MediaRecord(id, kind, payload, mime, payload.length.toLong)
    }
  }

  /** Partition-batched decode: the decoder context is initialized once per
    * partition (the expensive part for real codecs), then streamed over the
    * iterator — constant memory, no driver involvement. */
  def decodeFeatures(spark: SparkSession, media: Dataset[MediaRecord]): DataFrame = {
    import spark.implicits._
    media.mapPartitions { it =>
      // real pipelines: init codec/native handle here, once per partition
      it.map(decodeOne)
    }.toDF()
  }

  /** plant → decode, end to end: the oracle-checkable contract (DuckDB
    * recomputes every field from the planting formulas while Spark actually
    * round-trips the bytes). */
  def mediaFeatures(spark: SparkSession, docs: DataFrame): DataFrame =
    decodeFeatures(spark, toMediaTable(spark, docs))

  /** Aspect-preserving fit-inside target dimensions in pure integer math
    * (identical on any engine): no upscaling; otherwise the binding axis
    * hits the bound and the other scales by the same integer-floored
    * ratio. */
  def fitInside(w: Int, h: Int, maxW: Int, maxH: Int): (Int, Int) =
    if (w <= maxW && h <= maxH) (w, h)
    else if (w.toLong * maxH <= h.toLong * maxW) // height is the binding axis
      (((w.toLong * maxH) / h).toInt, maxH)
    else (maxW, ((h.toLong * maxW) / w).toInt)

  final case class ResizedMedia(media_id: Long, width: Int, height: Int,
                                out_w: Int, out_h: Int, resized: Long,
                                parsed: Long)

  /** Image resize over the binary column: parse the real container header,
    * compute the fit-inside plan, RE-ENCODE a real container at the target
    * dimensions, and re-parse the produced bytes to prove the round trip
    * (`parsed`). The pixel transform itself is the deterministic stand-in
    * the environment allows (the body bytes pass through unscaled — a real
    * deployment swaps `resampleBody` for a raster library); everything
    * Spark-side — schema, per-partition batching, constant memory, binary
    * in/binary out — is the real 100 TB plumbing. Non-image payloads are
    * dropped (audio/video do not resize). */
  def resizeImages(spark: SparkSession, media: Dataset[MediaRecord],
                   maxW: Int, maxH: Int): DataFrame = {
    import spark.implicits._
    def resampleBody(b: Array[Byte]): Array[Byte] = b // stand-in, see doc
    media.mapPartitions { it =>
      // real pipelines: init the raster codec here, once per partition
      it.flatMap { r =>
        val png = parsePngDims(r.payload).map(d => ("png", d))
        val dims = png.orElse(parseJpegDims(r.payload).map(d => ("jpeg", d)))
        dims.map { case (fmt, (w, h)) =>
          val (ow, oh) = fitInside(w, h, maxW, maxH)
          val headerLen = if (fmt == "png") 33 else 39
          val body = resampleBody(r.payload.drop(headerLen))
          val out = if (fmt == "png") pngPayload(ow, oh, body)
                    else jpegPayload(ow, oh, body)
          val back = parsePngDims(out).orElse(parseJpegDims(out))
          ResizedMedia(r.media_id, w, h, ow, oh,
            if (ow != w || oh != h) 1L else 0L,
            if (back.contains((ow, oh))) 1L else 0L)
        }
      }
    }.toDF()
  }

  final case class AudioChunk(media_id: Long, chunk_no: Long,
                              start_frame: Long, n_frames: Long,
                              start_byte: Long)

  /** Sample-accurate audio chunking over the WAV payloads — the audio twin
    * of [[sampleFrames]]: parse the real data-chunk layout from the bytes
    * ([[parseWavLayout]]), then emit the non-overlapping `chunkFrames`-frame
    * window schedule per recording, each row carrying the BYTE offset a
    * feature extractor seeks to (`data_off + start_frame·block_align`) —
    * the plan a real featurizer executes per partition (seek + read per
    * window; the last partial window keeps its true frame count). Pure
    * integer arithmetic over parsed layout fields, so the schedule is
    * engine-exact; non-audio payloads are dropped. Output rows are bounded
    * at ⌈frames/chunkFrames⌉ per recording — the explode is capped by the
    * payload's own size. */
  def audioChunks(spark: SparkSession, media: Dataset[MediaRecord],
                  chunkFrames: Long = 256L): DataFrame = {
    require(chunkFrames >= 1, "chunkFrames must be positive")
    import spark.implicits._
    media.mapPartitions { it =>
      // real pipelines: init the audio demuxer here, once per partition
      it.filter(_.kind == "audio").flatMap { r =>
        parseWavLayout(r.payload).iterator.flatMap {
          case (dataOff, blockAlign, frames) =>
            val n = (frames + chunkFrames - 1) / chunkFrames
            (0L until n).iterator.map { c =>
              val start = c * chunkFrames
              AudioChunk(r.media_id, c, start,
                math.min(chunkFrames, frames - start),
                dataOff + start * blockAlign)
            }
        }
      }
    }.toDF()
  }

  final case class FrameSample(media_id: Long, frame_idx: Long, tick: Long)

  /** Uniform frame sampling over the video payloads: parse the real
    * ISO-BMFF duration from the bytes, then emit k sample timestamps
    * `tick_i = ⌊i·duration/k⌋` per video — the frame-extraction plan a
    * real decoder executes per partition (seek + decode per tick). Pure
    * integer arithmetic, so the schedule is engine-exact; non-video
    * payloads are dropped. Output is (media_id, frame_idx, tick), bounded
    * at k rows per video — the explode is capped by construction. */
  def sampleFrames(spark: SparkSession, media: Dataset[MediaRecord],
                   k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    import spark.implicits._
    media.mapPartitions { it =>
      // real pipelines: init the video demuxer here, once per partition
      it.flatMap { r =>
        parseMp4Duration(r.payload).iterator.flatMap { dur =>
          (0 until k).iterator.map(i =>
            FrameSample(r.media_id, i.toLong, i.toLong * dur / k))
        }
      }
    }.toDF()
  }

  // ---- perceptual image dedup (average-hash fingerprints) ----

  /** Pixel value of the PLANTED near-dup bitmap corpus at (x, y) for
    * image group `g` (4 consecutive image ids share dims + base pattern)
    * and group member `m = id % 4`: a deterministic gradient pattern plus
    * a sparse per-member perturbation — members of one group are NEAR
    * duplicates (identical bitmaps except where the member's sparse mask
    * hits), different groups are unrelated patterns. Closed-form in
    * (g, m, x, y), so the DuckDB oracle replays every byte. */
  def phashPixel(g: Long, m: Long, x: Int, y: Int): Int =
    (((x * 31 + y * 17 + g * 13) % 251
      + (if (x % 37 == m && y % 23 == m) 7 else 0)) % 256).toInt

  /** Planted bitmap dims for pHash group g (shared by the group — near
    * duplicates must agree on geometry). */
  def phashDims(g: Long): (Int, Int) =
    ((16 + g % 50).toInt, (16 + (g * 7) % 40).toInt)

  /** The planted image corpus for perceptual dedup: one REAL container
    * (PNG for even ids, JPEG for odd) per image-stripe doc (doc_id ≡ 0
    * mod 3), wrapping a full row-major grayscale bitmap built from
    * [[phashPixel]]. Unlike [[toMediaTable]] (whose bodies are text
    * bytes), these bodies are format-true rasters — the pHash below reads
    * actual pixel bytes back out of the container. */
  def phashImageTable(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    docs.select(col("doc_id")).where(col("doc_id") % 3 === 0).as[Long]
      .map { id =>
        val g = id / 4
        val m = id % 4
        val (w, h) = phashDims(g)
        val body = Array.tabulate(w * h) { i =>
          phashPixel(g, m, i % w, i / w).toByte
        }
        val (mime, payload) =
          if (id % 2 == 0) ("image/png", pngPayload(w, h, body))
          else ("image/jpeg", jpegPayload(w, h, body))
        MediaRecord(id, "image", payload, mime, payload.length.toLong)
      }
  }

  final case class PHashBands(media_id: Long, b0: Long, b1: Long,
                              b2: Long, b3: Long)

  /** AVERAGE-HASH perceptual fingerprint of each image payload — the
    * classic aHash (8×8 grid, bit = cell brighter than the image mean),
    * integer-exact: parse the container header for (w, h), sample the
    * 64-cell grid at `(⌊c·w/8⌋, ⌊r·h/8⌋)` from the REAL body bytes, and
    * set bit k iff `64·v_k > Σv` (the cross-multiplied mean comparison —
    * no division, engine-exact). The 64 bits are emitted as four 16-bit
    * BAND values instead of one 64-bit integer: bands are exactly what
    * the pair probe buckets on ([[phashPairs]]), and bit 63 would
    * overflow a signed BIGINT in either engine. Map-only typed pass (the
    * multimodal family's per-partition decode convention); unparseable
    * payloads drop. */
  def imagePHash(spark: SparkSession, media: Dataset[MediaRecord]): DataFrame = {
    import spark.implicits._
    media.mapPartitions { it =>
      // real pipelines: init the raster decoder here, once per partition
      it.flatMap { r =>
        val png = parsePngDims(r.payload).map(d => (33, d))
        val parsed = png.orElse(parseJpegDims(r.payload).map(d => (39, d)))
        parsed.flatMap { case (headerLen, (w, h)) =>
          if (r.payload.length < headerLen + w * h) None
          else {
            val v = Array.tabulate(64) { k =>
              val cx = (k % 8) * w / 8
              val cy = (k / 8) * h / 8
              (r.payload(headerLen + cy * w + cx) & 0xff).toLong
            }
            val s = v.sum
            val bands = Array.tabulate(4) { j =>
              (0 until 16).foldLeft(0L) { (acc, i) =>
                if (64L * v(16 * j + i) > s) acc | (1L << i) else acc
              }
            }
            Some(PHashBands(r.media_id, bands(0), bands(1), bands(2), bands(3)))
          }
        }
      }
    }.toDF()
  }

  /** Near-duplicate image pairs from [[imagePHash]] fingerprints — the
    * dedup signal the multimodal family was missing, wired through the
    * banded-signature machinery every text dedup here uses
    * ([[Dedup.simhashPairs60]]'s shape): a pair is a CANDIDATE iff some
    * 16-bit band matches exactly (Hamming ≤ 3·16/64 guarantees a clean
    * band by pigeonhole over 4 bands; in practice near-dup images share
    * several), then exact Hamming over the four bands keeps pairs at
    * `maxHamming` or below. Never all-pairs: one explode (4 rows/image) +
    * one equi-join on (band index, band value) + one bounded re-join for
    * the exact distance — the plan that survives a 100 TB image corpus,
    * where brute-force pairing is quadratic in billions.
    *
    * `minBandMatches` is the VOLUME knob for huge image corpora (the
    * multi-index-hashing trade): with n images over 2^16-value bands,
    * single-band random collisions creep toward n²/2^16 candidates (the
    * measured 1.6×-over-linear term in the sf10-syn row); requiring k
    * matching bands cuts that to ~n²/2^(16k) while near-dup pairs
    * (Hamming ≤ 6 of 64) still share several bands. Default 1 keeps the
    * single-band guarantee and the committed oracle semantics. */
  def phashPairs(bands: DataFrame, maxHamming: Long = 6L,
                 minBandMatches: Int = 1): DataFrame = {
    require(minBandMatches >= 1 && minBandMatches <= 4,
      "minBandMatches in [1, 4]")
    val keyed = bandKeyed(bands)
    val hits = keyed.select(col("media_id").as("doc_a"), col("j"), col("bv"))
      .join(keyed.select(col("media_id").as("doc_b"), col("j"), col("bv")),
        Seq("j", "bv"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
    val cand =
      if (minBandMatches <= 1) hits.distinct()
      else hits.groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("nb"))
        .where(col("nb") >= minBandMatches)
        .select(col("doc_a"), col("doc_b"))
    hammingRank(cand, bands, maxHamming)
  }

  /** One (media_id, band index, band value) row per fingerprint band —
    * the bucket key both the batch self-join and the incremental probe
    * collide on. */
  private def bandKeyed(bands: DataFrame): DataFrame =
    bands.select(col("media_id"),
      explode(array(
        struct(lit(0).as("j"), col("b0").as("bv")),
        struct(lit(1).as("j"), col("b1").as("bv")),
        struct(lit(2).as("j"), col("b2").as("bv")),
        struct(lit(3).as("j"), col("b3").as("bv")))).as("kb"))
      .select(col("media_id"), col("kb.j").as("j"), col("kb.bv").as("bv"))

  /** Exact Hamming over the four bands for a candidate pair set; keeps
    * pairs at `maxHamming` or below. */
  private def hammingRank(cand: DataFrame, bands: DataFrame,
                          maxHamming: Long): DataFrame = {
    val a = bands.select(col("media_id").as("doc_a"), col("b0").as("a0"),
      col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3"))
    val b = bands.select(col("media_id").as("doc_b"), col("b0").as("c0"),
      col("b1").as("c1"), col("b2").as("c2"), col("b3").as("c3"))
    cand.join(a, Seq("doc_a")).join(b, Seq("doc_b"))
      .withColumn("hamming",
        expr("bit_count(a0 ^ c0) + bit_count(a1 ^ c1) + " +
          "bit_count(a2 ^ c2) + bit_count(a3 ^ c3)").cast("long"))
      .where(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Incremental image dedup — [[phashPairs]]' index-probe path, closing
    * the incremental tier for the image modality (minhash/spans/
    * containment/BM25/ANN each have one): given the PERSISTED fingerprint
    * index of the existing images (`imagePHash` output read back from
    * parquet) and the fingerprints of a NEW batch (ids disjoint — the
    * standing incremental contract), produce exactly the near-dup pairs
    * involving a new image. New fingerprints probe the merged band table
    * at O(new × collisions) — the existing corpus is never self-joined
    * again; new-new pairs come from the batch side colliding with itself
    * in the same probe. Equals the batch [[phashPairs]] restricted to
    * new-member pairs (the oracle asserts exactly that). */
  def phashPairsIncremental(existingBands: DataFrame, newBands: DataFrame,
                            maxHamming: Long = 6L,
                            minBandMatches: Int = 1): DataFrame = {
    require(minBandMatches >= 1 && minBandMatches <= 4,
      "minBandMatches in [1, 4]")
    val all = existingBands.unionByName(newBands)
    val hits = bandKeyed(newBands)
      .select(col("media_id").as("new_id"), col("j"), col("bv"))
      .join(bandKeyed(all).select(col("media_id").as("any_id"),
        col("j"), col("bv")), Seq("j", "bv"))
      .where(col("new_id") =!= col("any_id"))
      .select(least(col("new_id"), col("any_id")).as("doc_a"),
        greatest(col("new_id"), col("any_id")).as("doc_b"), col("j"))
    // A new-new pair appears TWICE per matching band (once per probe
    // orientation), so band counts must be over DISTINCT (pair, band) —
    // otherwise minBandMatches is effectively halved for new-new pairs
    // and the batch-equality pin breaks exactly at the k=2 schedule.
    val cand =
      if (minBandMatches <= 1) hits.select(col("doc_a"), col("doc_b")).distinct()
      else hits.distinct()
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("nb"))
        .where(col("nb") >= minBandMatches)
        .select(col("doc_a"), col("doc_b"))
    hammingRank(cand, all, maxHamming)
  }

  /** Dedup edges with EXACT-FINGERPRINT PRE-COLLAPSE — the measured scale
    * path for image dedup, and the fix for the suite's one super-linear
    * scale row: real corpora (and the sf10-syn replica, acutely) carry
    * large groups of byte-identical or identically-hashed images, and
    * enumerating every within-group pair is inherently quadratic in group
    * size (sf10-syn measured 166,667 images collapsing to 8,020 distinct
    * fingerprints → 10.4M true Hamming ≤ 6 pairs; the banded join itself
    * was never the term — `minBandMatches` prunes TRUE pairs there, not
    * noise). The collapse: group identical fingerprints, elect the min
    * media_id REPRESENTATIVE, run the banded near-dup join over the
    * distinct-fingerprint table only, and emit (rep near-dup pairs) ∪
    * (member → rep edges). Connected components over these edges equal
    * components over the full [[phashPairs]] graph — identical
    * fingerprints are Hamming-0 pairs, so a group is one component
    * connected through its rep, and any cross-group near-dup pair is
    * represented by its reps' pair (the spec pins component equality; the
    * e2e flagship's funnel is bit-identical through either). Edge count
    * is O(n + rep-pairs) instead of O(Σ group²) — decode-bound at
    * sf10-syn. */
  def phashCollapsedEdges(bands: DataFrame, maxHamming: Long = 6L,
                          minBandMatches: Int = 1): DataFrame = {
    val fp = Seq("b0", "b1", "b2", "b3")
    val reps = bands.groupBy(fp.map(col): _*)
      .agg(min(col("media_id")).as("media_id"))
    // rep_id = the group's min id, so (rep, member) is already ordered
    val memberEdges = bands
      .join(reps.select((fp.map(col) :+ col("media_id").as("rep_id")): _*),
        fp)
      .where(col("media_id") =!= col("rep_id"))
      .select(col("rep_id").as("doc_a"), col("media_id").as("doc_b"))
    phashPairs(reps, maxHamming, minBandMatches)
      .select(col("doc_a"), col("doc_b"))
      .unionByName(memberEdges)
  }

  /** The size-scaled [[phashPairs]] `minBandMatches` default — the
    * multi-index-hashing schedule, derived from the candidate-volume
    * model the sf10-syn sweep measured: requiring k matching 16-bit
    * bands (of 4) puts RANDOM pair collisions at ~C(4,k)·n²/2^(16k), so
    * the knob must rise when that term outgrows ~n. k=1 holds to ~10⁵
    * images (n²/2¹⁶ ≈ n at n = 65k — exactly where the measured
    * super-linear row began), k=2 to ~10⁸ (6·n²/2³² ≈ n at n ≈ 7·10⁸,
    * with headroom), k=3 beyond. Recall: a planted Hamming ≤ 6 near-dup
    * shares ≥ 2 bands unless its 6 differing bits spread 2+2+1+1 — the
    * measured planted families share 3–4 (the sf10-syn rows and the
    * sf0.001 spec both pin recall unchanged at k=2). */
  def minBandMatchesFor(nImages: Long): Int =
    if (nImages < 100000L) 1
    else if (nImages < 100000000L) 2
    else 3

  /** DELETE images from a persisted fingerprint index — the image
    * modality's takedown leg ([[graft.operators.Dedup.removeFromMinhashIndex]]'s
    * shape): a takedown that only removed the image bytes would leave its
    * bands in the index, so every future [[phashPairsIncremental]] probe
    * keeps pairing new images against the deleted one. Fingerprints are
    * per-image independent (no global statistic), so deletion is one
    * index-sized anti-join, EXACT against [[imagePHash]] over the
    * survivors, and idempotent by construction. */
  def removeFromPhashIndex(bands: DataFrame, removeIds: DataFrame): DataFrame =
    bands.join(broadcast(removeIds.select(col("media_id")).distinct()),
      Seq("media_id"), "left_anti")

  /** plant → decode → fingerprint → pair, end to end (the mm_phash_pairs
    * query): Spark round-trips real container bytes; the oracle replays
    * the closed-form planting formulas. */
  def phashPairsFromDocs(spark: SparkSession, docs: DataFrame,
                         maxHamming: Long = 6L,
                         minBandMatches: Int = 1): DataFrame =
    phashPairs(imagePHash(spark, phashImageTable(spark, docs)), maxHamming,
      minBandMatches)
}
