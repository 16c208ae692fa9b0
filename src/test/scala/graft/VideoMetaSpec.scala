package graft

import graft.operators.VideoMeta
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial inputs for the container walkers — the hostile shapes
  * the parsers were designed to survive (explicit depth + element
  * budgets, bounds-checked reads). The contract under test is the same
  * one q61/q64/q65 pin for the happy path: a malformed payload NEVER
  * throws — it yields a row with null fields and a deterministic
  * `error` — and a structurally valid payload with hostile padding
  * still parses.
  */
class VideoMetaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Runs one payload through the real Spark path and returns the row. */
  private def parse(bytes: Array[Byte]): org.apache.spark.sql.Row = {
    val df = Seq((1L, bytes, "video/x-test")).toDF("media_id", "payload", "format")
    val out = VideoMeta.parseVideoMeta(df).collect()
    assert(out.length == 1)
    out.head
  }

  private def err(r: org.apache.spark.sql.Row): String = r.getAs[String]("error")

  // ---- byte builders ------------------------------------------------------

  private def beU32(v: Long): Array[Byte] =
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def leU32(v: Long): Array[Byte] =
    Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  private def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")
  private def box(btype: String, data: Array[Byte]): Array[Byte] =
    beU32(8L + data.length) ++ ascii(btype) ++ data
  private val MkvMagic = Array(0x1a, 0x45, 0xdf, 0xa3).map(_.toByte)

  // ---- EBML / Matroska ----------------------------------------------------

  test("mkv: 9-byte VINT (leading 0x00) reports truncated, never throws") {
    // magic + minimal header, then a 0x00 first byte where an element
    // id must start — vintLen would need 9 bytes, which EBML forbids
    val r = parse(MkvMagic ++ Array(0x80.toByte) ++ Array(0x00, 0x01, 0x02).map(_.toByte))
    assert(err(r) == "truncated")
    assert(r.isNullAt(r.fieldIndex("width")))
  }

  test("mkv: element size overflowing the segment is clamped, not chased") {
    // Segment declaring a huge size, then an Info element whose size
    // vint claims ~2^49 bytes — dataEnd clamps to the walk bound and
    // the loop terminates on pos > to
    val hugeSize = Array(0x02, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff).map(_.toByte)
    val payload = MkvMagic ++ Array(0x80.toByte) ++
      Array(0x18, 0x53, 0x80, 0x67).map(_.toByte) ++ Array(0xff.toByte) ++ // Segment, unknown size
      Array(0x15, 0x49, 0xa9, 0x66).map(_.toByte) ++ hugeSize // Info, hostile size
    val r = parse(payload)
    assert(err(r) != null) // header_not_found or truncated — never a throw
  }

  test("mkv: zero-size elements make progress (no infinite loop)") {
    // a run of zero-size Info elements — each advances by id+size
    // lengths only; the element budget bounds the walk
    val zeroInfo = Array(0x15, 0x49, 0xa9, 0x66).map(_.toByte) ++ Array(0x80.toByte)
    val body = Array.fill(500)(zeroInfo).flatten
    val seg = Array(0x18, 0x53, 0x80, 0x67).map(_.toByte) ++ Array(0xff.toByte)
    val r = parse(MkvMagic ++ Array(0x80.toByte) ++ seg ++ body)
    assert(err(r) == "header_not_found")
  }

  test("mkv: nesting bomb stops at the depth budget") {
    // Info-in-Info 20 levels deep; walk recurses on Info ids and must
    // stop at depth 8 without a stack overflow or a throw
    def nest(depth: Int): Array[Byte] =
      if (depth == 0) Array.empty
      else {
        val inner = nest(depth - 1)
        require(inner.length < 127)
        Array(0x15, 0x49, 0xa9, 0x66).map(_.toByte) ++
          Array((0x80 | inner.length).toByte) ++ inner
      }
    val seg0 = nest(20)
    val seg = Array(0x18, 0x53, 0x80, 0x67).map(_.toByte) ++
      Array((0x80 | seg0.length).toByte) ++ seg0
    val r = parse(MkvMagic ++ Array(0x80.toByte) ++ seg)
    assert(err(r) == "header_not_found")
  }

  // ---- RIFF / AVI ---------------------------------------------------------

  test("avi: chunk size past the buffer terminates cleanly") {
    val payload = ascii("RIFF") ++ leU32(0xfffffff0L) ++ ascii("AVI ") ++
      ascii("LIST") ++ leU32(0xffffff00L) ++ ascii("hdrl")
    val r = parse(payload)
    assert(r.getAs[String]("container") == "avi")
    assert(err(r) != null)
  }

  test("avi: trailing garbage after the RIFF chunk is not walked") {
    // a well-formed AVI followed by bytes that LOOK like a chunk header
    // ('avih' + size) — the walk bound is 8 + riffSize, so the fake
    // chunk must not override the real fields
    val ids = Seq(6L).toDF("media_id")
    val good = VideoMeta.renderSyntheticVideos(ids, "media_id")
      .collect().head.getAs[Array[Byte]]("payload")
    assert(VideoMeta.synthKind(6L) == 0) // AVI
    val garbage = ascii("avih") ++ leU32(56) ++ Array.fill(56)(0x7f.toByte)
    val r = parse(good ++ garbage)
    assert(err(r) == null)
    assert(r.getAs[Int]("width") == VideoMeta.synthWidth(6L))
    assert(r.getAs[Int]("height") == VideoMeta.synthHeight(6L))
  }

  test("avi: zero-size chunks advance under the element budget") {
    val chunks = Array.fill(2000)(ascii("JUNK") ++ leU32(0)).flatten
    val payload = ascii("RIFF") ++ leU32(4L + chunks.length) ++ ascii("AVI ") ++ chunks
    val r = parse(payload)
    assert(r.getAs[String]("container") == "avi")
    assert(err(r) == "header_not_found")
  }

  // ---- ISO-BMFF / MP4 -----------------------------------------------------

  private def validMoov(w: Int, h: Int, durMs: Int): Array[Byte] = {
    val mvhd = {
      val d = java.nio.ByteBuffer.allocate(100)
      d.putInt(0); d.putInt(0); d.putInt(0); d.putInt(1000); d.putInt(durMs)
      box("mvhd", d.array())
    }
    val tkhd = {
      val d = java.nio.ByteBuffer.allocate(84)
      d.putInt(0); d.position(76); d.putInt(w << 16).putInt(h << 16)
      box("tkhd", d.array())
    }
    box("moov", mvhd ++ box("trak", tkhd))
  }

  test("mp4: 64-bit (size==1) leading box is skipped, later moov still parsed") {
    val mdatPayload = Array.fill(32)(0x11.toByte)
    val largeMdat = beU32(1L) ++ ascii("mdat") ++
      Array[Byte](0, 0, 0, 0) ++ beU32(16L + mdatPayload.length) ++ mdatPayload
    val payload = box("ftyp", ascii("isom") ++ new Array[Byte](4)) ++
      largeMdat ++ validMoov(640, 360, 2500)
    val r = parse(payload)
    assert(err(r) == null, s"error=${err(r)}")
    assert(r.getAs[Int]("width") == 640)
    assert(r.getAs[Int]("height") == 360)
    assert(r.getAs[Long]("duration_ms") == 2500L)
  }

  test("mp4: hostile negative largesize reports truncated, never loops") {
    val evil = beU32(1L) ++ ascii("mdat") ++ Array.fill(8)(0xff.toByte)
    val payload = box("ftyp", ascii("isom") ++ new Array[Byte](4)) ++ evil
    val r = parse(payload)
    assert(err(r) == "truncated")
  }

  test("mp4: size==0 final box (extends to EOF) terminates cleanly") {
    val payload = box("ftyp", ascii("isom") ++ new Array[Byte](4)) ++
      validMoov(320, 240, 1000) ++
      beU32(0L) ++ ascii("free") ++ Array.fill(64)(0x00.toByte)
    val r = parse(payload)
    assert(err(r) == null)
    assert(r.getAs[Int]("width") == 320)
    // size==0 FIRST box: skip-to-end, metadata never found, no throw
    val r2 = parse(box("ftyp", ascii("isom") ++ new Array[Byte](4)) ++
      beU32(0L) ++ ascii("mdat") ++ validMoov(320, 240, 1000))
    assert(err(r2) == "header_not_found")
  }

  test("mp4: nesting bomb stops at the depth budget") {
    def nest(depth: Int): Array[Byte] =
      if (depth == 0) Array.empty else box("moov", nest(depth - 1))
    val payload = box("ftyp", ascii("isom") ++ new Array[Byte](4)) ++ nest(30)
    val r = parse(payload)
    assert(err(r) == "header_not_found")
  }

  test("fuzz: random mutations of valid containers never throw") {
    val ids = spark.range(0, 30).toDF("media_id")
    val base = VideoMeta.renderSyntheticVideos(ids, "media_id")
      .collect().map(_.getAs[Array[Byte]]("payload"))
    val rng = new scala.util.Random(20260814L)
    val mutated = base.flatMap { b =>
      (0 until 8).map { _ =>
        val m = b.clone()
        val flips = 1 + rng.nextInt(6)
        (0 until flips).foreach { _ =>
          m(rng.nextInt(m.length)) = rng.nextInt(256).toByte
        }
        m
      }
    }
    val df = mutated.zipWithIndex
      .map { case (b, i) => (i.toLong, b, "video/x-fuzz") }.toSeq
      .toDF("media_id", "payload", "format")
    // the assertion IS the absence of a task failure, plus row count
    val rows = VideoMeta.parseVideoMeta(df).collect()
    assert(rows.length == mutated.length)
  }
}
