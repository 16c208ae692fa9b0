package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** REAL video container metadata — the header-parse tier for media the
  * JDK ships no codec for. Retires `Multimodal.decodeStub` as the
  * video story: dimensions, duration, and track codec come from a
  * BOUNDED byte scan of the container structure itself (RIFF/AVI
  * chunk walk, Matroska/EBML element walk, ISO-BMFF/MP4 box walk),
  * no frame is ever decoded — O(header) per payload regardless of
  * media size, which is the pass a 100 TB video corpus can actually
  * afford (a production pipeline hangs its frame decoder off these
  * fields; the Spark-side batch shape is identical).
  *
  * Same corrupt-safety contract as the image/audio decoders
  * (`Multimodal.decodeImages/decodeAudio`): malformed, truncated, or
  * alien payloads NEVER throw — they surface as null fields with a
  * deterministic reason in `error`, so one bad object in a billion
  * cannot fail a stage. All multi-byte reads are bounds-checked; the
  * walkers carry explicit depth and element budgets so a hostile
  * payload cannot loop or recurse unboundedly.
  *
  * No reference analog (the reference ships no media handling);
  * extension tier per SURVEY §7.5, same pattern as q61/q64.
  */
object VideoMeta {

  val VideoMetaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("format", StringType),     // magic-number sniff (pass-through)
    StructField("container", StringType),  // parsed: avi | matroska | mp4
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("codec", StringType),
    StructField("error", StringType)))

  /** Container metadata over media rows (`media_id, payload, format`).
    * `maxHeaderBytes` bounds how deep into a payload the walkers look —
    * headers live at the front; a payload whose metadata is not found
    * within the budget reports `error = "header_not_found"` rather
    * than scanning gigabytes.
    */
  def parseVideoMeta(media: DataFrame, maxHeaderBytes: Int = 1 << 20): DataFrame = {
    val enc = RowEncoder.encoderFor(VideoMetaSchema)
    Dedup.rebalance(media.select("media_id", "payload", "format"),
        Seq(col("media_id")))
      .mapPartitions { rows =>
        rows.map { r =>
          parseOne(r.getLong(0), r.getAs[Array[Byte]](1), r.getString(2),
            maxHeaderBytes)
        }
      }(enc)
  }

  /** Raised by bounds-checked reads; always caught inside [[parseOne]]. */
  private final class Truncated extends RuntimeException

  private def parseOne(
      id: Long, payload: Array[Byte], fmt: String, maxHeader: Int): Row = {
    def nullRow(container: String, err: String) =
      Row(id, fmt, container, null, null, null, null, err)
    if (payload == null || payload.length == 0) return nullRow(null, "empty_payload")
    val limit = math.min(payload.length, maxHeader)
    try {
      if (matches(payload, 0, "RIFF")) parseAvi(id, payload, fmt, limit)
      else if (limit >= 4 && (payload(0) & 0xff) == 0x1a && (payload(1) & 0xff) == 0x45 &&
        (payload(2) & 0xff) == 0xdf && (payload(3) & 0xff) == 0xa3)
        parseMkv(id, payload, fmt, limit)
      else if (limit >= 8 && matches(payload, 4, "ftyp")) parseMp4(id, payload, fmt, limit)
      else nullRow(null, "unsupported_container")
    } catch {
      case _: Truncated => nullRow(null, "truncated")
      case _: Exception => nullRow(null, "parse_failed")
    }
  }

  // ---- bounds-checked primitive reads -------------------------------------

  private def need(b: Array[Byte], pos: Long, n: Int, limit: Int): Unit =
    if (pos < 0 || pos + n > limit) throw new Truncated

  private def leU32(b: Array[Byte], pos: Long, limit: Int): Long = {
    need(b, pos, 4, limit); val p = pos.toInt
    (b(p) & 0xffL) | (b(p + 1) & 0xffL) << 8 | (b(p + 2) & 0xffL) << 16 |
      (b(p + 3) & 0xffL) << 24
  }

  private def beU32(b: Array[Byte], pos: Long, limit: Int): Long = {
    need(b, pos, 4, limit); val p = pos.toInt
    (b(p) & 0xffL) << 24 | (b(p + 1) & 0xffL) << 16 | (b(p + 2) & 0xffL) << 8 |
      (b(p + 3) & 0xffL)
  }

  private def str(b: Array[Byte], pos: Long, n: Int, limit: Int): String = {
    need(b, pos, n, limit)
    new String(b, pos.toInt, n, java.nio.charset.StandardCharsets.US_ASCII)
  }

  private def matches(b: Array[Byte], pos: Int, s: String): Boolean =
    b.length >= pos + s.length &&
      s.indices.forall(i => (b(pos + i) & 0xff) == s.charAt(i).toInt)

  // ---- RIFF / AVI ---------------------------------------------------------
  //
  // 'RIFF' size 'AVI ' then chunks; 'LIST' chunks nest. The fields
  // live in hdrl → avih (dims, frame count, frame duration) and
  // hdrl → strl → strh with fccType 'vids' (codec fourcc).

  private def parseAvi(id: Long, b: Array[Byte], fmt: String, limit: Int): Row = {
    if (str(b, 8, 4, limit) != "AVI ")
      return Row(id, fmt, null, null, null, null, null, "not_avi")
    var w = -1; var h = -1; var usPerFrame = -1L; var frames = -1L
    var codec: String = null

    def walk(from: Long, to: Long, depth: Int): Unit = {
      if (depth > 6) return
      var pos = from
      var elems = 0
      while (pos + 8 <= to && elems < 1000) {
        val fourcc = str(b, pos, 4, limit)
        val size = leU32(b, pos + 4, limit)
        if (fourcc == "LIST") {
          val listType = str(b, pos + 8, 4, limit)
          if (listType == "hdrl" || listType == "strl")
            walk(pos + 12, math.min(pos + 8 + size, to), depth + 1)
        } else if (fourcc == "avih") {
          usPerFrame = leU32(b, pos + 8, limit)
          frames = leU32(b, pos + 8 + 16, limit)
          w = leU32(b, pos + 8 + 32, limit).toInt
          h = leU32(b, pos + 8 + 36, limit).toInt
        } else if (fourcc == "strh" && str(b, pos + 8, 4, limit) == "vids") {
          if (codec == null) codec = str(b, pos + 12, 4, limit)
        }
        pos += 8 + size + (size & 1) // chunks are word-aligned
        elems += 1
      }
    }
    // RIFF chunk ends at 8 + riffSize (header + payload); trailing
    // bytes after it are NOT chunk data and must not be walked
    walk(12, math.min(8 + leU32(b, 4, limit), limit.toLong), 0)
    if (w < 0) return Row(id, fmt, "avi", null, null, null, codec, "header_not_found")
    val dur: java.lang.Long =
      if (usPerFrame >= 0 && frames >= 0) java.lang.Long.valueOf(frames * usPerFrame / 1000L)
      else null
    Row(id, fmt, "avi", w, h, dur, codec, null)
  }

  // ---- Matroska / EBML ----------------------------------------------------
  //
  // Variable-length element ids and sizes (VINTs). Needed elements:
  // Segment → Info → (TimestampScale, Duration) and Segment → Tracks →
  // TrackEntry(type=video) → (CodecID, Video → PixelWidth/PixelHeight).

  private def vintLen(first: Int): Int = {
    var mask = 0x80; var len = 1
    while (len <= 8 && (first & mask) == 0) { mask >>= 1; len += 1 }
    if (len > 8) throw new Truncated
    len
  }

  /** (value, length); `keepMarker` for element IDs (raw bytes),
    * cleared for sizes.
    */
  private def readVint(
      b: Array[Byte], pos: Long, keepMarker: Boolean, limit: Int): (Long, Int) = {
    need(b, pos, 1, limit)
    val first = b(pos.toInt) & 0xff
    val len = vintLen(first)
    need(b, pos, len, limit)
    var v: Long = if (keepMarker) first else first & ((1 << (8 - len)) - 1)
    var i = 1
    while (i < len) { v = v << 8 | (b(pos.toInt + i) & 0xffL); i += 1 }
    (v, len)
  }

  private def parseMkv(id: Long, b: Array[Byte], fmt: String, limit: Int): Row = {
    var tsScale = 1000000L // EBML default: 1 ms ticks
    var durTicks = -1.0
    var w = -1; var h = -1
    var codec: String = null

    def walk(from: Long, to: Long, inVideoTrack: Boolean, depth: Int): Unit = {
      if (depth > 8) return
      var pos = from
      var elems = 0
      var videoTrack = inVideoTrack
      while (pos < to && elems < 2000) {
        val (eid, idLen) = readVint(b, pos, keepMarker = true, limit)
        val (size, szLen) = readVint(b, pos + idLen, keepMarker = false, limit)
        val dataPos = pos + idLen + szLen
        val dataEnd = math.min(dataPos + size, to)
        eid match {
          case 0x18538067 | 0x1549A966 | 0x1654AE6B => // Segment, Info, Tracks
            walk(dataPos, dataEnd, videoTrack, depth + 1)
          case 0xAE => // TrackEntry: scan it twice — type gates codec/dims
            var isVideo = false
            var p = dataPos; var k = 0
            while (p < dataEnd && k < 200) {
              val (ceid, cIdLen) = readVint(b, p, keepMarker = true, limit)
              val (cSize, cSzLen) = readVint(b, p + cIdLen, keepMarker = false, limit)
              if (ceid == 0x83 && cSize >= 1) {
                need(b, p + cIdLen + cSzLen, 1, limit)
                isVideo = (b((p + cIdLen + cSzLen).toInt) & 0xff) == 1
              }
              p += cIdLen + cSzLen + cSize; k += 1
            }
            if (isVideo) walk(dataPos, dataEnd, inVideoTrack = true, depth + 1)
          case 0xE0 if videoTrack => // Video settings
            walk(dataPos, dataEnd, videoTrack, depth + 1)
          case 0x2AD7B1 => // TimestampScale (uint, ns per tick)
            var v = 0L; var i = 0L
            while (i < size) { need(b, dataPos + i, 1, limit); v = v << 8 | (b((dataPos + i).toInt) & 0xffL); i += 1 }
            tsScale = v
          case 0x4489 => // Duration (float, ticks)
            if (size == 4) durTicks = java.lang.Float.intBitsToFloat(beU32(b, dataPos, limit).toInt).toDouble
            else if (size == 8) {
              val hi = beU32(b, dataPos, limit); val lo = beU32(b, dataPos + 4, limit)
              durTicks = java.lang.Double.longBitsToDouble(hi << 32 | lo)
            }
          case 0x86 if videoTrack => // CodecID
            if (codec == null) codec = str(b, dataPos, size.toInt, limit)
          case 0xB0 if videoTrack => w = readUintN(b, dataPos, size, limit).toInt
          case 0xBA if videoTrack => h = readUintN(b, dataPos, size, limit).toInt
          case _ => () // skip
        }
        pos = dataPos + size
        elems += 1
      }
    }
    // skip the EBML header element, then walk from the Segment on
    val (ebmlId, idLen) = readVint(b, 0, keepMarker = true, limit)
    val (ebmlSize, szLen) = readVint(b, idLen, keepMarker = false, limit)
    if (ebmlId != 0x1A45DFA3L) return Row(id, fmt, null, null, null, null, null, "not_matroska")
    walk(idLen + szLen + ebmlSize, limit.toLong, inVideoTrack = false, 0)
    if (w < 0 && durTicks < 0)
      return Row(id, fmt, "matroska", null, null, null, codec, "header_not_found")
    val dur: java.lang.Long =
      if (durTicks >= 0) java.lang.Long.valueOf(math.round(durTicks * tsScale / 1e6))
      else null
    Row(id, fmt, "matroska", if (w < 0) null else w, if (h < 0) null else h, dur, codec, null)
  }

  private def readUintN(b: Array[Byte], pos: Long, n: Long, limit: Int): Long = {
    var v = 0L; var i = 0L
    while (i < n) { need(b, pos + i, 1, limit); v = v << 8 | (b((pos + i).toInt) & 0xffL); i += 1 }
    v
  }

  // ---- ISO-BMFF / MP4 -----------------------------------------------------
  //
  // size(u32 BE) + type boxes; moov → mvhd (timescale, duration),
  // moov → trak → tkhd (16.16 fixed dims), … → stbl → stsd (codec
  // fourcc of the first sample entry).

  private def parseMp4(id: Long, b: Array[Byte], fmt: String, limit: Int): Row = {
    var w = -1; var h = -1; var dur = -1L
    var codec: String = null

    def walk(from: Long, to: Long, depth: Int): Unit = {
      if (depth > 8) return
      var pos = from
      var boxes = 0
      while (pos + 8 <= to && boxes < 500) {
        var size = beU32(b, pos, limit)
        val btype = str(b, pos + 4, 4, limit)
        if (size == 0) {
          // "box extends to end of file" (last box only, per ISO-BMFF);
          // the metadata boxes we want are never open-ended — skip to
          // the end rather than looping on a zero advance
          pos = to; boxes += 1
        } else if (size == 1) {
          // 64-bit largesize (common on a leading mdat of >4 GB
          // progressive files): skip the whole box so a later moov is
          // still reached; a largesize below its own header is hostile
          val large = beU32(b, pos + 8, limit) << 32 | beU32(b, pos + 12, limit)
          if (large < 16) throw new Truncated
          pos += large; boxes += 1
        } else if (size < 8) throw new Truncated
        else {
        btype match {
          case "moov" | "trak" | "mdia" | "minf" | "stbl" =>
            walk(pos + 8, math.min(pos + size, to), depth + 1)
          case "mvhd" =>
            need(b, pos + 8, 1, limit)
            val version = b((pos + 8).toInt) & 0xff
            if (version == 0) {
              val timescale = beU32(b, pos + 8 + 12, limit)
              val duration = beU32(b, pos + 8 + 16, limit)
              if (timescale > 0) dur = duration * 1000L / timescale
            } else {
              val timescale = beU32(b, pos + 8 + 20, limit)
              val duration = beU32(b, pos + 8 + 24, limit) << 32 | beU32(b, pos + 8 + 28, limit)
              if (timescale > 0) dur = duration * 1000L / timescale
            }
          case "tkhd" =>
            need(b, pos + 8, 1, limit)
            val version = b((pos + 8).toInt) & 0xff
            val base = if (version == 0) pos + 8 + 76 else pos + 8 + 88
            val tw = (beU32(b, base, limit) >> 16).toInt     // 16.16 fixed
            val th = (beU32(b, base + 4, limit) >> 16).toInt
            if (tw > 0 && w < 0) { w = tw; h = th } // first video track wins
          case "stsd" =>
            // version/flags(4) + entry_count(4), then first entry:
            // size(4) + format fourcc
            if (codec == null && beU32(b, pos + 8 + 4, limit) > 0)
              codec = str(b, pos + 8 + 8 + 4, 4, limit)
          case _ => ()
        }
        pos += size
        boxes += 1
        }
      }
    }
    walk(0, limit.toLong, 0)
    if (w < 0 && dur < 0)
      return Row(id, fmt, "mp4", null, null, null, codec, "header_not_found")
    Row(id, fmt, "mp4", if (w < 0) null else w, if (h < 0) null else h,
      if (dur < 0) null else java.lang.Long.valueOf(dur), codec, null)
  }

  // ---- deterministic synthetic containers (test-data adapters) ------------
  //
  // The corpus ships no video; these render REAL container structures
  // whose every field is a pure integer function of the id, so a SQL
  // oracle replays the arithmetic while the Spark side genuinely
  // round-trips build → sniff → chunk/element/box walk. One residue
  // class (id % 97 == 0) emits only the 4 magic bytes — the
  // deterministic corrupt case that pins the never-throw contract
  // under the hash gate.

  def synthKind(id: Long): Int = (id % 3).toInt // 0=avi 1=mkv 2=mp4
  def synthWidth(id: Long): Int = (16 + id % 320).toInt
  def synthHeight(id: Long): Int = (9 + id % 240).toInt
  def synthFrames(id: Long): Long = 10 + id % 90
  val AviUsPerFrame = 40000L // 25 fps → duration = frames * 40 ms exactly
  def synthMkvDurMs(id: Long): Long = 1000 + id % 9000
  def synthMp4DurMs(id: Long): Long = 500 + id % 7500
  def synthCorrupt(id: Long): Boolean = id % 97 == 0

  def renderSyntheticVideos(ids: DataFrame, idCol: String): DataFrame = {
    val enc = RowEncoder.encoderFor(Multimodal.MediaSchema)
    val render = (id: Long) => synthKind(id) match {
      case 0 => renderAvi(id)
      case 1 => renderMkv(id)
      case 2 => renderMp4(id)
    }
    Dedup.rebalance(ids.select(col(idCol).cast("long").as("media_id")),
        Seq(col("media_id")))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val full = render(id)
          val bytes = if (synthCorrupt(id)) full.take(4) else full
          Row(id, bytes, null, bytes.length.toLong)
        }
      }(enc)
      .withColumn("format", Multimodal.sniffFormat(col("payload")))
      .select("media_id", "payload", "format", "n_bytes")
  }

  private def renderAvi(id: Long): Array[Byte] = {
    val avih = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    avih.putInt(AviUsPerFrame.toInt).putInt(0).putInt(0).putInt(0)
      .putInt(synthFrames(id).toInt).putInt(0).putInt(1).putInt(0)
      .putInt(synthWidth(id)).putInt(synthHeight(id))
    val strh = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    strh.put("vids".getBytes("US-ASCII")).put("MJPG".getBytes("US-ASCII"))
    val strlLen = 4 + 8 + 56            // 'strl' + strh chunk
    val hdrlLen = 4 + 8 + 56 + 8 + strlLen // 'hdrl' + avih chunk + strl LIST
    val riffLen = 4 + 8 + hdrlLen       // 'AVI ' + hdrl LIST
    val bb = java.nio.ByteBuffer.allocate(8 + riffLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(riffLen)
      .put("AVI ".getBytes("US-ASCII"))
      .put("LIST".getBytes("US-ASCII")).putInt(hdrlLen)
      .put("hdrl".getBytes("US-ASCII"))
      .put("avih".getBytes("US-ASCII")).putInt(56).put(avih.array())
      .put("LIST".getBytes("US-ASCII")).putInt(strlLen)
      .put("strl".getBytes("US-ASCII"))
      .put("strh".getBytes("US-ASCII")).putInt(56).put(strh.array())
    bb.array()
  }

  private def renderMkv(id: Long): Array[Byte] = {
    def el(eid: Array[Byte], data: Array[Byte]): Array[Byte] = {
      require(data.length < 127)
      eid ++ Array((0x80 | data.length).toByte) ++ data
    }
    def be16(v: Int) = Array((v >> 8).toByte, v.toByte)
    def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    val ebml = Array(0x1a, 0x45, 0xdf, 0xa3, 0x80).map(_.toByte) // empty header
    val info = el(Array(0x15, 0x49, 0xa9, 0x66).map(_.toByte),
      el(Array(0x2a, 0xd7, 0xb1).map(_.toByte), be32(1000000)) ++
        el(Array(0x44, 0x89).map(_.toByte),
          be32(java.lang.Float.floatToIntBits(synthMkvDurMs(id).toFloat))))
    val video = el(Array(0xe0.toByte),
      el(Array(0xb0.toByte), be16(synthWidth(id))) ++
        el(Array(0xba.toByte), be16(synthHeight(id))))
    val track = el(Array(0xae.toByte),
      el(Array(0x83.toByte), Array(1.toByte)) ++
        el(Array(0x86.toByte), "V_VP9".getBytes("US-ASCII")) ++ video)
    val tracks = el(Array(0x16, 0x54, 0xae, 0x6b).map(_.toByte), track)
    val segData = info ++ tracks
    require(segData.length < 127)
    val segment = Array(0x18, 0x53, 0x80, 0x67).map(_.toByte) ++
      Array((0x80 | segData.length).toByte) ++ segData
    ebml ++ segment
  }

  private def renderMp4(id: Long): Array[Byte] = {
    def box(btype: String, data: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + data.length)
      bb.putInt(8 + data.length).put(btype.getBytes("US-ASCII")).put(data)
      bb.array()
    }
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ new Array[Byte](4))
    val mvhd = {
      val d = java.nio.ByteBuffer.allocate(100)
      d.putInt(0)              // version 0 + flags
      d.putInt(0).putInt(0)    // creation, modification
      d.putInt(1000)           // timescale: ms ticks
      d.putInt(synthMp4DurMs(id).toInt)
      box("mvhd", d.array())
    }
    val tkhd = {
      val d = java.nio.ByteBuffer.allocate(84)
      d.putInt(0)
      d.position(76)
      d.putInt(synthWidth(id) << 16).putInt(synthHeight(id) << 16)
      box("tkhd", d.array())
    }
    val stsd = {
      val d = java.nio.ByteBuffer.allocate(16)
      d.putInt(0).putInt(1)    // version/flags, entry_count = 1
      d.putInt(8).put("avc1".getBytes("US-ASCII"))
      box("stsd", d.array())
    }
    val moov = box("moov", mvhd ++
      box("trak", tkhd ++ box("mdia", box("minf", box("stbl", stsd)))))
    ftyp ++ moov
  }
}
