package graft.ops

/** Multimodal asset plumbing: builds REAL container bytes (BMP /
  * APNG / GIF headers with format-correct magics, endianness and
  * fixed-offset dimension fields) for the opaque binary column the
  * testdata lacks, and the DuckDB-side decode of those bytes by hex
  * offset arithmetic. The generator emits hex in a dialect common to
  * Spark SQL and DuckDB (hex/lpad/substr/||/CASE behave identically),
  * so both engines materialize bit-identical blobs via unhex; the
  * Spark-side decode is the codegen'd
  * [[graft.expressions.ImageHeaderDecode]] expression reading the raw
  * bytes, the oracle re-derives the same fields from hex(blob) — the
  * two sides agree only if the byte layout is genuinely correct.
  *
  * PNG/acTL CRC fields are placeholder bytes (computing CRC32 in
  * portable SQL buys nothing for a metadata scan and no decoder
  * consulted here checks them); everything else is to-spec layout.
  */
object Media {

  /** Little-endian hex of a 32-bit value (byte-swapped lpad'd hex). */
  private def le32(x: String): String = {
    def h = s"lpad(hex($x), 8, '0')"
    s"(substr($h, 7, 2) || substr($h, 5, 2) || substr($h, 3, 2) || substr($h, 1, 2))"
  }

  /** Little-endian hex of a 16-bit value. */
  private def le16(x: String): String = {
    def h = s"lpad(hex($x), 4, '0')"
    s"(substr($h, 3, 2) || substr($h, 1, 2))"
  }

  /** Big-endian hex of a 32-bit value (PNG chunk integers). */
  private def be32(x: String): String = s"lpad(hex($x), 8, '0')"

  /** Deterministic per-doc asset parameters — width/height keep the
    * byte-length formulas the resize planner always used (so the
    * decoded dims equal the planned dims by construction), frames is
    * the per-doc rotation.
    */
  def widthExpr(blen: String): String = s"(16 + $blen % 624)"
  def heightExpr(blen: String): String = s"(16 + ($blen * 7) % 464)"
  def framesExpr(docId: String): String = s"(1 + $docId % 30)"

  /** Hex string of the complete container for one doc: doc_id % 3
    * rotates the format (0 = BMP, 1 = animated PNG, 2 = GIF). Common
    * Spark/DuckDB dialect; wrap in unhex(...) on either engine.
    */
  def assetHexExpr(docId: String, blen: String): String = {
    val w = widthExpr(blen)
    val h = heightExpr(blen)
    val f = framesExpr(docId)
    // BMP: 'BM' + file size 54 + reserved + data offset 54 + DIB size 40
    // + w/h le32 + planes 1 + bpp 24 + compression/size 0 + 2835 ppm
    // densities + color counts 0 (54-byte BITMAPINFOHEADER file)
    val bmp = "'424D' || '36000000' || '00000000' || '36000000' || '28000000' || " +
      s"${le32(w)} || ${le32(h)} || '0100' || '1800' || " +
      "'00000000' || '00000000' || '130B0000' || '130B0000' || '00000000' || '00000000'"
    // PNG: signature + IHDR(len 13, w/h be32, depth 8, color 6, std
    // comp/filter/interlace, placeholder CRC) + acTL(len 8, num_frames,
    // num_plays 0, placeholder CRC) — APNG frame count at byte 41
    val png = "'89504E470D0A1A0A' || '0000000D' || '49484452' || " +
      s"${be32(w)} || ${be32(h)} || '0806000000' || 'DEADBEEF' || " +
      s"'00000008' || '6163544C' || ${be32(f)} || '00000000' || 'DEADBEEF'"
    // GIF89a: magic + logical screen w/h le16 + no-GCT packed byte,
    // background 0, aspect 0 + trailer
    val gif = s"'474946383961' || ${le16(w)} || ${le16(h)} || '000000' || '3B'"
    s"(CASE WHEN $docId % 3 = 0 THEN $bmp WHEN $docId % 3 = 1 THEN $png ELSE $gif END)"
  }

  /** Big-endian hex of a 16-bit value (JPEG segment integers). */
  private def be16(x: String): String = s"lpad(hex($x), 4, '0')"

  /** Hex of a canonical JFIF JPEG header whose SOF position is only
    * reachable by a real MARKER WALK: SOI, the fixed 16-byte APP0, a
    * VARIABLE-length COM segment (3–31 bytes of payload derived from
    * the doc), a second COM for every doc_id % 4 = 3 (so the segment
    * COUNT varies too), then SOF0/SOF2 rotating on doc parity with
    * precision 8, height/width be16, 3 component specs. Segment
    * lengths include their own two bytes, per spec.
    */
  def jpegHexExpr(docId: String, blen: String): String = {
    val w = widthExpr(blen)
    val h = heightExpr(blen)
    val n1 = s"(3 + $blen % 29)"
    val n2 = s"(2 + $docId % 13)"
    val app0 = "'FFE0' || '0010' || '4A46494600' || '0101' || '00' || " +
      "'0048' || '0048' || '00' || '00'"
    // APP1/EXIF for every 5th doc: 'Exif\0\0' identifier + 8 filler
    // bytes (len 16 including the length field itself)
    val app1 = s"(CASE WHEN $docId % 5 = 0 THEN " +
      "'FFE1' || '0010' || '45786966' || '0000' || '1122334455667788' " +
      "ELSE '' END)"
    val com1 = s"'FFFE' || ${be16(s"(2 + $n1)")} || repeat('41', $n1)"
    val com2 = s"(CASE WHEN $docId % 4 = 3 THEN 'FFFE' || " +
      s"${be16(s"(2 + $n2)")} || repeat('42', $n2) ELSE '' END)"
    val sofm = s"(CASE WHEN $docId % 2 = 0 THEN 'FFC0' ELSE 'FFC2' END)"
    val sof = s"$sofm || '0011' || '08' || ${be16(h)} || ${be16(w)} || " +
      "'03' || '012200' || '021101' || '031101'"
    s"('FFD8' || $app0 || $app1 || $com1 || $com2 || $sof)"
  }

  /** The DuckDB twin of [[graft.expressions.JpegHeaderDecode]]'s marker
    * walk: an unrolled hex-offset CTE chain over `hcol` (uppercase hex)
    * in `src`, one stage per segment up to the expression's
    * `MaxSegments` bound (the two walks are identical by construction).
    * Emits `o{K}` (cursor), `f{K}` (segments skipped before SOF, NULL
    * if not found) and `s{K}` (SOF byte offset). Returns (CTE text,
    * last CTE name).
    */
  def duckJpegWalkCtes(src: String, hcol: String,
      prefix: String = "jw"): (String, String) = {
    val k = graft.expressions.JpegHeaderDecode.MaxSegments
    val c0 = s"${prefix}0 AS (SELECT *, CAST(2 AS BIGINT) AS o0, " +
      s"CAST(NULL AS BIGINT) AS f0, CAST(NULL AS BIGINT) AS s0, FALSE AS e0 FROM $src)"
    val cs = (1 to k).map { i =>
      val (po, pf, ps) = (s"o${i - 1}", s"f${i - 1}", s"s${i - 1}")
      val m = s"substr($hcol, $po * 2 + 1, 4)"
      s"""${prefix}$i AS (SELECT *,
      CASE WHEN $pf IS NULL AND $m IN ('FFC0', 'FFC2')
        THEN CAST(${i - 1} AS BIGINT) ELSE $pf END AS f$i,
      CASE WHEN $pf IS NULL AND $m IN ('FFC0', 'FFC2') THEN $po ELSE $ps END AS s$i,
      CASE WHEN $pf IS NULL AND $m = 'FFE1'
          AND substr($hcol, ($po + 4) * 2 + 1, 8) = '45786966'
        THEN TRUE ELSE e${i - 1} END AS e$i,
      CASE WHEN $pf IS NULL AND NOT ($m IN ('FFC0', 'FFC2'))
        THEN $po + 2 + CAST('0x' || substr($hcol, $po * 2 + 5, 4) AS BIGINT)
        ELSE $po END AS o$i
      FROM ${prefix}${i - 1})"""
    }
    ((c0 +: cs).mkString(",\n    "), s"$prefix$k")
  }

  /** MP4 timescale rotation (movie units per second). */
  def mp4TimescaleExpr(docId: String): String =
    s"(CASE WHEN $docId % 3 = 0 THEN 600 WHEN $docId % 3 = 1 THEN 1000 ELSE 90000 END)"

  /** MP4 duration in timescale units, derived from the doc. */
  def mp4DurationExpr(docId: String, blen: String): String =
    s"($blen * 3 + $docId % 101 + 1)"

  /** Hex of a canonical ISO-BMFF (MP4) header whose `mvhd` position is
    * only reachable by a real BOX WALK: `ftyp` (brand rotating
    * isom/mp42/avc1), a VARIABLE-length `free` box on every 4th doc, a
    * `skip` box on every doc_id % 5 = 2 (box COUNT varies too), then
    * `moov` holding a full spec-shaped version-0 `mvhd` (108 bytes:
    * version/flags, times, timescale, duration, rate 1.0, volume 1.0,
    * identity matrix, next-track). Box sizes include their own 8-byte
    * header, per spec.
    */
  def mp4HexExpr(docId: String, blen: String): String = {
    val ts = mp4TimescaleExpr(docId)
    val dur = mp4DurationExpr(docId, blen)
    val nFree = s"($blen % 23 + 1)"
    val nSkip = s"($docId % 17 + 2)"
    val brand = s"(CASE WHEN $docId % 3 = 0 THEN '69736F6D' " +
      s"WHEN $docId % 3 = 1 THEN '6D703432' ELSE '61766331' END)"
    val ftyp = s"'00000014' || '66747970' || $brand || '00000200' || '69736F6D'"
    val free = s"(CASE WHEN $docId % 4 = 3 THEN ${be32(s"(8 + $nFree)")} || " +
      s"'66726565' || repeat('00', $nFree) ELSE '' END)"
    val skip = s"(CASE WHEN $docId % 5 = 2 THEN ${be32(s"(8 + $nSkip)")} || " +
      s"'736B6970' || repeat('AB', $nSkip) ELSE '' END)"
    val mvhd = s"'0000006C' || '6D766864' || '00000000' || ${be32("3600")} || " +
      s"${be32("7200")} || ${be32(ts)} || ${be32(dur)} || '00010000' || " +
      "'0100' || '0000' || repeat('00', 8) || " +
      "'00010000' || repeat('00', 12) || '00010000' || repeat('00', 12) || " +
      "'40000000' || repeat('00', 24) || '00000002'"
    val moov = s"'00000074' || '6D6F6F76' || $mvhd"
    s"($ftyp || $free || $skip || $moov)"
  }

  /** The DuckDB twin of [[graft.expressions.Mp4HeaderDecode]]'s box
    * walk: an unrolled hex-offset CTE chain over `hcol` (uppercase hex)
    * in `src`, one stage per box up to the expression's `MaxBoxes`
    * bound (the two walks are identical by construction). Emits `o{K}`
    * (cursor), `m{K}` (moov byte offset, NULL if not found), `n{K}`
    * (boxes skipped before moov), `br{K}` (major-brand hex), `fr{K}`
    * (free box seen). Returns (CTE text, last CTE name).
    */
  def duckMp4WalkCtes(src: String, hcol: String,
      prefix: String = "bw"): (String, String) = {
    val k = graft.expressions.Mp4HeaderDecode.MaxBoxes
    val c0 = s"${prefix}0 AS (SELECT *, CAST(0 AS BIGINT) AS o0, " +
      s"CAST(NULL AS BIGINT) AS m0, CAST(NULL AS BIGINT) AS n0, " +
      s"CAST(NULL AS VARCHAR) AS br0, FALSE AS fr0 FROM $src)"
    val cs = (1 to k).map { i =>
      val (po, pm, pn, pbr, pfr) =
        (s"o${i - 1}", s"m${i - 1}", s"n${i - 1}", s"br${i - 1}", s"fr${i - 1}")
      val ty = s"substr($hcol, $po * 2 + 9, 8)"
      val sz = s"CAST('0x' || substr($hcol, $po * 2 + 1, 8) AS BIGINT)"
      s"""${prefix}$i AS (SELECT *,
      CASE WHEN $pm IS NULL AND $ty = '6D6F6F76' THEN $po ELSE $pm END AS m$i,
      CASE WHEN $pm IS NULL AND $ty = '6D6F6F76'
        THEN CAST(${i - 1} AS BIGINT) ELSE $pn END AS n$i,
      CASE WHEN $pbr IS NULL AND $ty = '66747970'
        THEN substr($hcol, $po * 2 + 17, 8) ELSE $pbr END AS br$i,
      CASE WHEN $pm IS NULL AND $ty = '66726565' THEN TRUE ELSE $pfr END AS fr$i,
      CASE WHEN $pm IS NULL AND NOT ($ty = '6D6F6F76')
        THEN $po + $sz ELSE $po END AS o$i
      FROM ${prefix}${i - 1})"""
    }
    ((c0 +: cs).mkString(",\n    "), s"$prefix$k")
  }

  /** Audio asset parameters: PCM-16 WAV, sample-rate rotation, mono/
    * stereo alternation, declared data size derived from byte length.
    */
  def sampleRateExpr(docId: String): String =
    s"(CASE WHEN $docId % 3 = 0 THEN 8000 WHEN $docId % 3 = 1 THEN 16000 ELSE 44100 END)"
  def channelsExpr(docId: String): String = s"(1 + $docId % 2)"
  def dataSizeExpr(blen: String): String = s"($blen * 4)"

  /** Hex of a canonical 44-byte PCM WAV header (header-only asset: the
    * metadata scan this feeds never reads PCM frames, exactly like the
    * image containers carry no pixel data). All little-endian to spec:
    * RIFF size 36+data, fmt chunk 16/PCM/channels/rate/byte-rate/
    * block-align/16-bit, data chunk size.
    */
  def wavHexExpr(docId: String, blen: String): String = {
    val sr = sampleRateExpr(docId)
    val ch = channelsExpr(docId)
    val ds = dataSizeExpr(blen)
    "'52494646' || " + le32(s"(36 + $ds)") + " || '57415645' || '666D7420' || " +
      "'10000000' || '0100' || " + le16(ch) + " || " + le32(sr) + " || " +
      le32(s"($sr * $ch * 2)") + " || " + le16(s"($ch * 2)") + " || '1000' || " +
      s"'64617461' || ${le32(ds)}"
  }

  // ---- DuckDB-side decode: hex(blob) offset arithmetic ----
  // byte i (0-based) of blob b lives at substr(hex(b), 2*i+1, 2)

  private def duckLe32(h: String, off: Int): String =
    s"CAST('0x' || substr($h, ${2 * off + 7}, 2) || substr($h, ${2 * off + 5}, 2) || " +
      s"substr($h, ${2 * off + 3}, 2) || substr($h, ${2 * off + 1}, 2) AS BIGINT)"
  private def duckLe16(h: String, off: Int): String =
    s"CAST('0x' || substr($h, ${2 * off + 3}, 2) || substr($h, ${2 * off + 1}, 2) AS BIGINT)"
  private def duckBe32(h: String, off: Int): String =
    s"CAST('0x' || substr($h, ${2 * off + 1}, 8) AS BIGINT)"

  /** DuckDB format sniff over a hex(blob) column named `h`. */
  def duckFormatExpr(h: String): String =
    s"""CASE WHEN substr($h, 1, 4) = '424D' THEN 'bmp'
      WHEN substr($h, 1, 16) = '89504E470D0A1A0A' THEN 'png'
      WHEN substr($h, 1, 12) IN ('474946383961', '474946383761') THEN 'gif' END"""

  /** DuckDB width decode (format-dispatched, same offsets as the
    * Spark-side expression).
    */
  def duckWidthExpr(h: String): String =
    s"""CASE WHEN substr($h, 1, 4) = '424D' THEN ${duckLe32(h, 18)}
      WHEN substr($h, 1, 16) = '89504E470D0A1A0A' THEN ${duckBe32(h, 16)}
      ELSE ${duckLe16(h, 6)} END"""

  def duckHeightExpr(h: String): String =
    s"""CASE WHEN substr($h, 1, 4) = '424D' THEN abs(${duckLe32(h, 22)})
      WHEN substr($h, 1, 16) = '89504E470D0A1A0A' THEN ${duckBe32(h, 20)}
      ELSE ${duckLe16(h, 8)} END"""

  /** DuckDB frame-count decode: APNG acTL num_frames when the chunk
    * type at byte 37 reads 'acTL', else 1.
    */
  def duckFramesExpr(h: String): String =
    s"""CASE WHEN substr($h, 1, 16) = '89504E470D0A1A0A'
        AND substr($h, 75, 8) = '6163544C' THEN ${duckBe32(h, 41)}
      ELSE 1 END"""

  // ---- AVI (RIFF) video container: canonical 88-byte header ----

  /** µs-per-frame for the synthetic fps ∈ {24, 25, 30} — written as
    * CASE literals (41666/40000/33333) so the builder stays in the
    * division-free shared dialect.
    */
  def usecPerFrameExpr(docId: String): String =
    s"(CASE WHEN $docId % 3 = 0 THEN 41666 WHEN $docId % 3 = 1 THEN 40000 ELSE 33333 END)"
  def videoFramesExpr(docId: String): String = s"(24 + $docId % 240)"
  def videoWidthExpr(docId: String): String = s"(160 + 16 * ($docId % 20))"
  def videoHeightExpr(docId: String): String = s"(120 + 8 * ($docId % 30))"
  def videoStreamsExpr(docId: String): String = s"(1 + $docId % 2)"

  /** Hex of a canonical 88-byte AVI header (header-only asset, like the
    * other containers): RIFF size 80 / `AVI ` / LIST 68 `hdrl` / `avih`
    * 56, then the MainAVIHeader at byte 32 — µs-per-frame, max-bytes 0,
    * padding 0, flags 0x10 (HASINDEX), total frames, initial 0,
    * streams, buffer 0, width, height, 16 reserved zero bytes.
    */
  def aviHexExpr(docId: String): String = {
    val usec = usecPerFrameExpr(docId)
    val tf = videoFramesExpr(docId)
    val st = videoStreamsExpr(docId)
    val w = videoWidthExpr(docId)
    val hh = videoHeightExpr(docId)
    "'52494646' || " + le32("80") + " || '41564920' || '4C495354' || " +
      le32("68") + " || '6864726C' || '61766968' || " + le32("56") + " || " +
      le32(usec) + " || '00000000' || '00000000' || '10000000' || " +
      le32(tf) + " || '00000000' || " + le32(st) + " || '00000000' || " +
      le32(w) + " || " + le32(hh) + " || '00000000000000000000000000000000'"
  }

  // ---- AVI decode twins (offsets per the canonical layout) ----

  /** RIFF/`AVI `/`avih` magic check over hex(blob) `h`. */
  def duckAviOk(h: String): String =
    s"""(substr($h, 1, 8) = '52494646' AND substr($h, 17, 8) = '41564920'
      AND substr($h, 49, 8) = '61766968')"""

  def duckAviUsec(h: String): String = duckLe32(h, 32)
  def duckAviFrames(h: String): String = duckLe32(h, 48)
  def duckAviStreams(h: String): String = duckLe32(h, 56)
  def duckAviWidth(h: String): String = duckLe32(h, 64)
  def duckAviHeight(h: String): String = duckLe32(h, 68)

  // ---- WAV decode twins (offsets per the canonical RIFF layout) ----

  /** RIFF/WAVE/fmt_/data magic check over hex(blob) `h`. */
  def duckWavOk(h: String): String =
    s"""(substr($h, 1, 8) = '52494646' AND substr($h, 17, 8) = '57415645'
      AND substr($h, 25, 8) = '666D7420' AND substr($h, 73, 8) = '64617461')"""

  def duckWavChannels(h: String): String = duckLe16(h, 22)
  def duckWavSampleRate(h: String): String = duckLe32(h, 24)
  def duckWavBits(h: String): String = duckLe16(h, 34)
  def duckWavSamples(h: String): String =
    s"(${duckLe32(h, 40)} // ${duckLe16(h, 32)})"

  // ---- 8×8 thumbnail BMP with REAL pixel data (perceptual hashing) ----

  /** BMP pixel-array layout constants for the 8×8 24bpp thumbnail:
    * 54-byte header + 8 rows × 8 px × 3 bytes (24 B/row — already a
    * 4-byte multiple, so no row padding), stored BOTTOM-UP per the BMP
    * spec. File pixel index j (0..63) maps to image-order index
    * (0 = top-left, row-major) k = (7 - j/8)*8 + j%8.
    */
  val ThumbDim = 8
  val ThumbHeaderLen = 54
  val ThumbPixelBytes: Int = ThumbDim * ThumbDim * 3
  val ThumbFileLen: Int = ThumbHeaderLen + ThumbPixelBytes

  /** Image-order pixel index k for file-order pixel j (bottom-up rows). */
  def thumbFileToImage(j: Int): Int = (ThumbDim - 1 - j / ThumbDim) * ThumbDim + j % ThumbDim

  /** Hex of a complete 8×8 24bpp grayscale BMP whose image-order pixel
    * k carries the luminance byte produced by `pixelHex(k)` (a 2-hex-
    * digit expression; the three BGR bytes repeat it). `pixelHex` is
    * caller-supplied so each engine can bind its own word-array
    * accessor; the container layout itself (magic, le32 sizes, 24bpp,
    * bottom-up row order) is common and to-spec.
    */
  def thumbBmpHexExpr(pixelHex: Int => String): String = {
    // header: 'BM' + file size 246 + reserved + data offset 54 + DIB 40
    // + w/h 8 le32 + planes 1 + bpp 24 + compression 0 + image size 192
    // + 2835 ppm densities + color counts 0
    val header = "'424D' || 'F6000000' || '00000000' || '36000000' || '28000000' || " +
      "'08000000' || '08000000' || '0100' || '1800' || " +
      "'00000000' || 'C0000000' || '130B0000' || '130B0000' || '00000000' || '00000000'"
    val pixels = (0 until ThumbDim * ThumbDim)
      .map(j => s"repeat(${pixelHex(thumbFileToImage(j))}, 3)")
      .mkString(" || ")
    s"($header || $pixels)"
  }

  /** DuckDB byte extract: unsigned byte i (0-based) of hex(blob) `h`. */
  private def duckU8(h: String, off: Int): String =
    s"CAST('0x' || substr($h, ${2 * off + 1}, 2) AS BIGINT)"

  /** DuckDB twin of [[graft.expressions.ImageAHash]] over hex(blob)
    * `h`: per image-order pixel k the mean-of-BGR luminance (exact
    * integer floor), then the 64-bit average-hash — bit k (MSB-first)
    * set iff 64·lum_k ≥ Σ lum. The sign bit's weight is the BIGINT
    * min-value literal (two's complement), every other bit a positive
    * power of two, so the sum reproduces the JVM long bit-for-bit.
    */
  def duckAHashSql(h: String, lumsName: String): String = {
    val lums = (0 until ThumbDim * ThumbDim).map { k =>
      val j = thumbFileToImage(k) // row-flip is an involution: j ↔ k
      val off = ThumbHeaderLen + 3 * j
      s"((${duckU8(h, off)} + ${duckU8(h, off + 1)} + ${duckU8(h, off + 2)}) // 3)"
    }
    s"[${lums.mkString(", ")}] AS $lumsName"
  }

  /** The exact list-sum of the lum list as a BIGINT (for a CTE column). */
  def duckLumSum(l: String): String = s"CAST(list_sum($l) AS BIGINT)"

  /** The hash sum over the 64-element lum list `l` (1-based index) and
    * its precomputed total `t` — both plain columns of the same CTE.
    */
  def duckAHashFold(l: String, t: String): String = {
    val terms = (0 until 64).map { k =>
      // the sign-bit weight is written subtraction-style: the bare
      // min-value literal would parse as HUGEINT in DuckDB
      val w = if (k == 0) "(-9223372036854775807 - 1)" else s"${1L << (63 - k)}"
      s"CASE WHEN 64 * $l[${k + 1}] >= $t THEN CAST($w AS BIGINT) ELSE 0 END"
    }
    s"(${terms.mkString(" + ")})"
  }

  // ---- DCT pHash twin (graft.expressions.ImageDctHash) ----

  /** The row-pass of the separable fixed-point DCT over the 64-element
    * lum list `l` (1-based): g[8u+m+1] = Σ_n C[u][n]·l[8n+m+1], with
    * the cosine table interpolated as the SAME integer literals the
    * Spark expression multiplies ([[graft.expressions.ImageDctHash.cosTable]]).
    */
  def duckDctG(l: String, name: String): String = {
    val c = graft.expressions.ImageDctHash.cosTable
    val terms = for (u <- 0 until 8; m <- 0 until 8) yield
      (0 until 8).map(n => s"(${c(u)(n)})*$l[${8 * n + m + 1}]").mkString(" + ")
    s"[${terms.mkString(", ")}] AS $name"
  }

  /** The column-pass: f[8u+v+1] = Σ_m g[8u+m+1]·C[v][m]. */
  def duckDctF(g: String, name: String): String = {
    val c = graft.expressions.ImageDctHash.cosTable
    val terms = for (u <- 0 until 8; v <- 0 until 8) yield
      (0 until 8).map(m => s"$g[${8 * u + m + 1}]*(${c(v)(m)})").mkString(" + ")
    s"[${terms.mkString(", ")}] AS $name"
  }

  /** The pHash fold over the 64-coefficient list `f` and its list-sum
    * `t`: bit k (MSB-first, k = 8u+v) set iff 63·f[k+1] > t − f[1],
    * except the DC bit (k = 0) which is always 0 — so unlike
    * [[duckAHashFold]] no sign-weight term exists and the hash is
    * non-negative by construction.
    */
  def duckDctFold(f: String, t: String): String = {
    val terms = (1 until 64).map { k =>
      s"CASE WHEN 63 * $f[${k + 1}] > ($t - $f[1]) THEN CAST(${1L << (63 - k)} AS BIGINT) ELSE 0 END"
    }
    s"(${terms.mkString(" + ")})"
  }

  // ---- PCM WAV with REAL sample data (audio fingerprinting) ----

  /** 65 mono PCM-16 samples → 64 delta-sign fingerprint bits (the
    * 1-band simplification of the Haitsma–Kalker '02 sign-of-energy-
    * difference fingerprint — public). 44-byte canonical header +
    * 130 data bytes.
    */
  val AudioFpSamples = 65
  val AudioFpFileLen: Int = 44 + 2 * AudioFpSamples

  /** Hex of the complete mono 8 kHz PCM-16 WAV whose sample k carries
    * the 16-bit value produced by `sampleHex(k)` (4 hex digits,
    * LITTLE-ENDIAN byte order — the caller swaps). Header is to-spec:
    * RIFF size 36+130, fmt 16/PCM/1ch/8000/16000 B/s/align 2/16 bit,
    * data size 130.
    */
  def pcmWavHexExpr(sampleHex: Int => String): String = {
    val header = "'52494646' || 'A6000000' || '57415645' || '666D7420' || " +
      "'10000000' || '0100' || '0100' || '401F0000' || '803E0000' || " +
      "'0200' || '1000' || '64617461' || '82000000'"
    val samples = (0 until AudioFpSamples).map(sampleHex).mkString(" || ")
    s"($header || $samples)"
  }

  /** DuckDB signed-int16 sample list (1-based) from hex(blob) `h` at
    * the canonical 44-byte data offset, little-endian per PCM spec.
    */
  def duckPcmSamples(h: String, name: String): String = {
    val vals = (0 until AudioFpSamples).map { i =>
      val off = 44 + 2 * i
      val raw = s"CAST('0x' || substr($h, ${2 * off + 3}, 2) || " +
        s"substr($h, ${2 * off + 1}, 2) AS BIGINT)"
      s"(CASE WHEN $raw >= 32768 THEN $raw - 65536 ELSE $raw END)"
    }
    s"[${vals.mkString(", ")}] AS $name"
  }

  /** The fingerprint sum over the 65-element sample list `s` (1-based):
    * bit i (MSB-first) set iff sample i+1 > sample i — same signed
    * weight trick as [[duckAHashFold]].
    */
  def duckDeltaFold(s: String): String = {
    val terms = (0 until 64).map { i =>
      val w = if (i == 0) "(-9223372036854775807 - 1)" else s"${1L << (63 - i)}"
      s"CASE WHEN $s[${i + 2}] > $s[${i + 1}] THEN CAST($w AS BIGINT) ELSE 0 END"
    }
    s"(${terms.mkString(" + ")})"
  }
}
