package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Multimodal-column support: media payloads travel as opaque
  * `BinaryType` columns alongside a typed metadata struct, and
  * decode/feature-extraction runs as a partition-at-a-time typed
  * transform.
  *
  * `q_multimodal` proves the storage/query side end-to-end: build a
  * binary payload (utf-8 bytes of the text — the container has no image
  * codecs, so text bytes stand in for media bytes), attach a
  * `struct(lang, source, n_chars)` metadata column, filter ON THE
  * METADATA ONLY (the payload is never touched until after the filter —
  * at 100 TB, parquet row-group pruning + column projection mean
  * filtered-out payload bytes are never read), then compute
  * byte-length and digest of the surviving payloads.
  *
  * [[extractFeatures]] is the decode path: a `mapPartitions` over a
  * typed Dataset — the Scala-side equivalent of the mapInPandas batch
  * contract (one iterator per partition in, one iterator out, schema
  * fixed by the Encoder, partitioning preserved — no shuffle). Image
  * payloads (jpeg/png/gif/bmp) decode FOR REAL through `javax.imageio`
  * — in the JDK, no external library — yielding true width/height/
  * channel-count/mean-luma; payloads no JDK codec accepts (audio,
  * video — their codecs aren't in the JDK) fall back to a documented
  * deterministic byte-derived fake with `decoded = false`, so the
  * plumbing stays testable end-to-end either way.
  */
object Multimodal {

  /** The media-bearing view: payload bytes + typed metadata. */
  def mediaView(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").select(
      $"doc_id",
      encode($"text", "UTF-8").as("payload"),
      struct($"lang", $"source", $"n_chars").as("meta"))
  }

  /** Folder-of-files ingestion — the OTHER way media arrives: not rows
    * in a table but a directory tree of image/audio files. Spark's
    * `binaryFile` source turns it into (path, modificationTime, length,
    * content) rows; `pathGlobFilter` prunes by extension at LISTING
    * time (non-matching files are never opened), and the source prunes
    * the `content` column when a query reads only metadata — so "how
    * many files / total bytes per extension" touches no payload. At
    * 100 TB this is the entry point that turns an object-store prefix
    * into a DataFrame with the same (payload, metadata) shape as
    * [[mediaView]]; listing parallelizes across executors via
    * InMemoryFileIndex. Spec-verified (no oracle: DuckDB has no
    * directory source). */
  def ingestFolder(s: SparkSession, folder: String, glob: String = "*"): DataFrame = {
    import s.implicits._
    s.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(folder)
      .select(
        regexp_extract(input_file_name(), "([^/]+)$", 1).as("file_name"),
        $"length".as("n_bytes"),
        $"modificationTime",
        $"content".as("payload"))
  }

  /** Metadata-filtered payload digest: filter on meta fields, then
    * length/md5 over the binary payload of survivors. */
  def multimodal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaView(s, dir)
      .filter($"meta.lang" === "en" && $"meta.n_chars" > 200)
      .select($"doc_id",
        length($"payload").cast("long").as("n_bytes"),
        md5($"payload").as("payload_md5"),
        $"meta.source".as("source"))
      .orderBy($"doc_id")
  }

  /** DuckDB 1.0 has no md5(BLOB); md5 of the VARCHAR hashes the same
    * utf-8 bytes the Spark side digests from the BinaryType column. */
  val multimodalSql: String =
    """WITH m AS (
      |  SELECT doc_id, encode(text) AS payload, text,
      |    {'lang': lang, 'source': source, 'n_chars': n_chars} AS meta
      |  FROM documents)
      |SELECT doc_id,
      |  octet_length(payload) AS n_bytes,
      |  md5(text) AS payload_md5,
      |  meta.source AS source
      |FROM m WHERE meta.lang = 'en' AND meta.n_chars > 200
      |ORDER BY doc_id""".stripMargin

  /** One decoded media item. For `decoded = true` rows the fields are
    * the real image properties (ITU-R BT.601 luma, normalized to [0,1]);
    * for `decoded = false` they are the documented deterministic fake
    * (channels = 0 marks them unambiguously). */
  final case class MediaFeatures(
    doc_id: Long, n_bytes: Long, width: Int, height: Int, channels: Int,
    mean_luma: Double, decoded: Boolean)

  object MediaFeatures {
    /** Real decode for any payload a JDK `ImageIO` reader accepts
      * (jpeg/png/gif/bmp); the deterministic byte-derived fake only for
      * container formats the JDK can't decode (audio/video). `ImageIO`
      * is pure-Java and headless-safe — each task decodes its own rows,
      * no shared state. */
    def decode(docId: Long, payload: Array[Byte]): MediaFeatures = {
      val img =
        try Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload)))
        catch { case _: java.io.IOException => None }
      img match {
        case Some(im) =>
          val w = im.getWidth
          val h = im.getHeight
          var sum = 0.0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = im.getRGB(x, y) // sRGB regardless of storage model
              val r = (rgb >> 16) & 0xff
              val g = (rgb >> 8) & 0xff
              val b = rgb & 0xff
              sum += 0.299 * r + 0.587 * g + 0.114 * b
              x += 1
            }
            y += 1
          }
          MediaFeatures(docId, payload.length.toLong, w, h,
            channels = im.getColorModel.getNumComponents,
            mean_luma = sum / (w.toLong * h) / 255.0, decoded = true)
        case None =>
          val hc = java.util.Arrays.hashCode(payload)
          MediaFeatures(docId, payload.length.toLong,
            width = 16 + math.floorMod(hc, 1905),
            height = 16 + math.floorMod(hc >> 11, 1065),
            channels = 0,
            mean_luma = math.floorMod(hc, 256) / 255.0, decoded = false)
      }
    }
  }

  /** Partition-at-a-time feature extraction over the media view: the
    * batch contract a real decoder plugs into. Narrow (no shuffle); at
    * scale each task decodes its own parquet split. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val s = media.sparkSession
    import s.implicits._
    media.select($"doc_id".as[Long], $"payload".as[Array[Byte]])
      .mapPartitions(_.map { case (id, bytes) => MediaFeatures.decode(id, bytes) })
  }

  /** One sampled frame of a media payload. */
  final case class Frame(doc_id: Long, frame_idx: Int, offset: Long,
                         frame_hash: Long)

  /** Frame sampling: the one-in/many-out decode contract (video → N
    * frames, audio → N windows). Every `stride` bytes of the payload
    * yields one frame row; the frame content hash is the stubbed
    * decode (a real codec seeks + decodes at the offset instead).
    * Narrow flatMap — output cardinality is per-row data-dependent,
    * which is exactly what distinguishes this contract from
    * [[extractFeatures]]'s 1:1 map. */
  def frameSample(media: DataFrame, stride: Int = 64): Dataset[Frame] = {
    val s = media.sparkSession
    import s.implicits._
    media.select($"doc_id".as[Long], $"payload".as[Array[Byte]])
      .mapPartitions(_.flatMap { case (id, bytes) =>
        (0 until math.max(1, bytes.length / stride)).iterator.map { i =>
          val off = i.toLong * stride
          val end = math.min(bytes.length, off.toInt + stride)
          var h = 0L
          var p = off.toInt
          while (p < end) { h = h * 31 + (bytes(p) & 0xff); p += 1 }
          Frame(id, i, off, h)
        }
      })
  }

  /** One resized media payload (binary → binary); `decoded` records
    * whether a real codec round-trip happened. */
  final case class Resized(doc_id: Long, payload: Array[Byte], target_w: Int,
                           target_h: Int, decoded: Boolean)

  /** Resize: the binary→binary transform contract. Image payloads take
    * the REAL path — `ImageIO` decode, bilinear resample to (w, h) on a
    * `BufferedImage`, PNG re-encode (all JDK, headless-safe). Payloads
    * no JDK codec accepts fall back to a deterministic byte slice of
    * length min(len, w·h/64) so output-size semantics stay testable for
    * the audio/video case. Narrow 1:1 map over partitions, like
    * [[extractFeatures]]. */
  def resize(media: DataFrame, w: Int, h: Int): Dataset[Resized] = {
    val s = media.sparkSession
    import s.implicits._
    val fallbackLen = math.max(1, w * h / 64)
    media.select($"doc_id".as[Long], $"payload".as[Array[Byte]])
      .mapPartitions(_.map { case (id, bytes) =>
        val img =
          try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes)))
          catch { case _: java.io.IOException => None }
        img match {
          case Some(im) =>
            val out = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(im, 0, 0, w, h, null)
            g.dispose()
            val buf = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", buf)
            Resized(id, buf.toByteArray, w, h, decoded = true)
          case None =>
            Resized(id, bytes.take(fallbackLen), w, h, decoded = false)
        }
      })
  }

  // --- registry -------------------------------------------------------------

  /** Container-format sniffing over binary payloads — the ingest-time
    * check that claimed media types match the actual bytes (mislabeled
    * media poisons a decode stage downstream; at 100 TB you reject it
    * at the scanner, not in the codec). Magic prefixes are compared on
    * `substring(hex(payload), ...)` — the one binary-prefix idiom that
    * evaluates identically in Spark and the DuckDB oracle (DuckDB has
    * no BLOB substring). The fixture plants jpeg/png/wav magics by
    * doc_id residue and MISLABELS every 7th payload, so the mismatch
    * accounting is exercised, not vacuous. Pure map + a ≤16-group
    * aggregate: scan-speed at any scale. */
  def sniffQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val magic = Map(
      "jpeg" -> Array(0xFF, 0xD8, 0xFF).map(_.toByte),
      "png" -> Array(0x89, 0x50, 0x4E, 0x47).map(_.toByte),
      "wav" -> Array(0x52, 0x49, 0x46, 0x46).map(_.toByte))
    // actual bytes follow doc_id % 4; the CLAIM follows (doc_id + (doc_id % 7 == 0)) % 4
    val actualKind = $"doc_id" % 4
    val claimKind = ($"doc_id" + when($"doc_id" % 7 === 0, 1).otherwise(0)) % 4
    def kindName(k: Column): Column =
      when(k === 0, "jpeg").when(k === 1, "png")
        .when(k === 2, "wav").otherwise("text")
    val payload = concat(
      when(actualKind === 0, lit(magic("jpeg")))
        .when(actualKind === 1, lit(magic("png")))
        .when(actualKind === 2, lit(magic("wav")))
        .otherwise(lit(Array.empty[Byte])),
      encode($"text", "UTF-8"))
    val hexHead = substring(hex(payload), 1, 8)
    val sniffed =
      when(substring(hexHead, 1, 6) === "FFD8FF", "jpeg")
        .when(hexHead === "89504E47", "png")
        .when(hexHead === "52494646", "wav")
        .otherwise("text")
    t(s, dir, "documents")
      .select($"doc_id", kindName(claimKind).as("claimed"), sniffed.as("sniffed"))
      .groupBy($"claimed", $"sniffed")
      .agg(count(lit(1)).as("n"))
      .orderBy($"claimed", $"sniffed")
  }

  val sniffSql: String =
    """WITH m AS (
      |  SELECT doc_id,
      |    CASE doc_id % 4 WHEN 0 THEN '\xFF\xD8\xFF'::BLOB
      |                    WHEN 1 THEN '\x89\x50\x4E\x47'::BLOB
      |                    WHEN 2 THEN '\x52\x49\x46\x46'::BLOB
      |                    ELSE ''::BLOB END || encode(text) AS payload,
      |    CASE (doc_id + CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END) % 4
      |         WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png'
      |         WHEN 2 THEN 'wav' ELSE 'text' END AS claimed
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, claimed,
      |    CASE WHEN substring(hex(payload), 1, 6) = 'FFD8FF' THEN 'jpeg'
      |         WHEN substring(hex(payload), 1, 8) = '89504E47' THEN 'png'
      |         WHEN substring(hex(payload), 1, 8) = '52494646' THEN 'wav'
      |         ELSE 'text' END AS sniffed
      |  FROM m)
      |SELECT claimed, sniffed, CAST(count(*) AS BIGINT) AS n
      |FROM s GROUP BY claimed, sniffed ORDER BY claimed, sniffed""".stripMargin

  // --- WAV header metadata --------------------------------------------------

  /** Little-endian construction: integer SQL expr `v` → `n`-byte LE hex
    * string (pure integer/byte builtins — codegen'd end to end). */
  private[ops] def leHexExpr(v: String, n: Int): String =
    (0 until n).map(i => s"lpad(hex((($v) div ${1L << (8 * i)}) % 256), 2, '0')")
      .mkString("concat(", ", ", ")")

  /** Little-endian parse: `n` bytes at 1-based byte offset `off` of
    * `hex(payload)` → BIGINT. */
  private[ops] def leValExpr(hexCol: String, off: Int, n: Int): String =
    (0 until n).reverse.map(i => s"substring($hexCol, ${(off - 1 + i) * 2 + 1}, 2)")
      .mkString("cast(conv(concat(", ", ", "), 16, 10) as bigint)")

  /** The canonical 44-byte PCM WAV header for the given parameters, as
    * a Column of BinaryType — real RIFF bytes, built from integer
    * expressions (the fixture generator for [[wavQ]] and the spec's
    * golden-byte cross-check). */
  private[ops] def wavHeader(channels: String, rate: String,
      bits: String, nSamples: String): Column = {
    val blockAlign = s"(($channels) * (($bits) div 8))"
    val byteRate = s"(($rate) * $blockAlign)"
    val dataSize = s"(($nSamples) * $blockAlign)"
    expr(s"""unhex(concat(
      |  '52494646', ${leHexExpr(s"(36 + $dataSize)", 4)},
      |  '57415645', '666D7420', ${leHexExpr("16", 4)},
      |  ${leHexExpr("1", 2)}, ${leHexExpr(channels, 2)},
      |  ${leHexExpr(rate, 4)}, ${leHexExpr(byteRate, 4)},
      |  ${leHexExpr(blockAlign, 2)}, ${leHexExpr(bits, 2)},
      |  '64617461', ${leHexExpr(dataSize, 4)}))""".stripMargin)
  }

  /** q_multimodal_wav entry: audio metadata extraction from REAL RIFF
    * bytes — the audio analog of the imageio decode path, pure header
    * math, no codec needed. The fixture synthesizes a true 44-byte PCM
    * WAV header per audio doc (parameters derived from doc_id); the
    * query then PARSES the binary back field by field (LE shorts/ints
    * out of `hex(payload)` — the sniff idiom extended to whole fields)
    * and derives sample count and duration. The oracle recomputes the
    * expected metadata from the doc_id formulas WITHOUT touching
    * binary, so a parser that misreads any byte fails the compare; the
    * construct/parse pair is additionally pinned against hand-written
    * golden bytes in the spec (a symmetric endianness bug would pass
    * round-trip but not the golden header).
    *
    * Scale shape: pure map stage over the audio partition of the
    * corpus — scan speed, zero exchange, no decode library in the hot
    * path. */
  def wavQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val withWav = t(s, dir, "documents")
      .filter($"doc_id" % 4 === 2) // the sniff fixture's wav partition
      .withColumn("payload", wavHeader(
        "1 + doc_id % 2", "8000 + (doc_id % 5) * 2000",
        "16", "1000 + doc_id % 100"))
      .withColumn("hx", hex($"payload"))
    withWav
      .select($"doc_id",
        expr(leValExpr("hx", 23, 2)).as("n_channels"),
        expr(leValExpr("hx", 25, 4)).as("sample_rate"),
        expr(leValExpr("hx", 35, 2)).as("bits"),
        (expr(leValExpr("hx", 41, 4)) /
          (expr(leValExpr("hx", 23, 2)) * lit(2L))).cast("long").as("n_samples"))
      .withColumn("duration_ms",
        expr("(n_samples * 1000) div sample_rate"))
      .orderBy($"doc_id")
      .limit(300)
  }

  val wavSql: String =
    """SELECT doc_id,
      |  CAST(1 + doc_id % 2 AS BIGINT) AS n_channels,
      |  CAST(8000 + (doc_id % 5) * 2000 AS BIGINT) AS sample_rate,
      |  CAST(16 AS BIGINT) AS bits,
      |  CAST(1000 + doc_id % 100 AS BIGINT) AS n_samples,
      |  CAST(((1000 + doc_id % 100) * 1000)
      |    // (8000 + (doc_id % 5) * 2000) AS BIGINT) AS duration_ms
      |FROM documents WHERE doc_id % 4 = 2 ORDER BY doc_id LIMIT 300""".stripMargin

  /** Deterministic planted PNG per sampled doc: solid-color
    * `(8 + id%13) × (8 + id%11)` image, RGB derived from doc_id —
    * real codec bytes via the JDK encoder, shared by [[decodeQ]] and
    * the decode specs. */
  private[ops] def plantedPngs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").filter($"doc_id" % 20 === 1)
      .select($"doc_id".as[Long])
      .mapPartitions(_.map { id =>
        val w = (8 + id % 13).toInt
        val h = (8 + id % 11).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = img.createGraphics()
        g.setColor(new java.awt.Color(((id * 37) % 256).toInt,
          ((id * 59) % 256).toInt, ((id * 83) % 256).toInt))
        g.fillRect(0, 0, w, h)
        g.dispose()
        val buf = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", buf)
        (id, buf.toByteArray)
      }).toDF("doc_id", "payload")
  }

  /** q_multimodal_decode entry: REAL image decode, oracle-verified —
    * the round-trip proof that [[extractFeatures]]'s decode path runs
    * an actual codec, not header math. The fixture plants a genuine
    * PNG per sampled doc (JDK `ImageIO` encoder, dimensions and color
    * pure functions of doc_id), the query decodes the binary back
    * through [[extractFeatures]], and the oracle recomputes the
    * expected width/height/channels ARITHMETICALLY from doc_id without
    * touching binary — a decoder that misreads any dimension field or
    * fails to decode diverges immediately. Solid-color mean-luma
    * recovery is pinned in the spec (the oracle cannot assert doubles
    * from a codec). Scale shape: narrow 1:1 mapPartitions encode +
    * decode over a pruned doc_id scan — no shuffle, each task decodes
    * its own rows. */
  def decodeQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    extractFeatures(plantedPngs(s, dir)).toDF()
      .select($"doc_id",
        $"width".cast("long").as("width"),
        $"height".cast("long").as("height"),
        $"channels".cast("long").as("n_channels"),
        $"decoded".cast("long").as("decoded"))
      .orderBy($"doc_id")
  }

  val decodeSql: String =
    """SELECT doc_id,
      |  CAST(8 + doc_id % 13 AS BIGINT) AS width,
      |  CAST(8 + doc_id % 11 AS BIGINT) AS height,
      |  CAST(3 AS BIGINT) AS n_channels,
      |  CAST(1 AS BIGINT) AS decoded
      |FROM documents WHERE doc_id % 20 = 1 ORDER BY doc_id""".stripMargin

  /** Deterministic planted image in a doc_id-chosen CONTAINER format —
    * jpeg, gif, or bmp by `doc_id % 3` (the JDK ships writers and
    * readers for all three; PNG has its own query). Same solid-color
    * dimension formulas as [[plantedPngs]], distinct doc sample. */
  private[ops] def plantedImages(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").filter($"doc_id" % 20 === 3)
      .select($"doc_id".as[Long])
      .mapPartitions(_.map { id =>
        val w = (8 + id % 13).toInt
        val h = (8 + id % 11).toInt
        val fmt = (id % 3) match {
          case 0 => "jpeg"; case 1 => "gif"; case _ => "bmp"
        }
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = img.createGraphics()
        g.setColor(new java.awt.Color(((id * 37) % 256).toInt,
          ((id * 59) % 256).toInt, ((id * 83) % 256).toInt))
        g.fillRect(0, 0, w, h)
        g.dispose()
        val buf = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, fmt, buf)
        (id, fmt, buf.toByteArray)
      }).toDF("doc_id", "format", "payload")
  }

  /** q_multimodal_decode_multi entry (VERDICT r9 item 4): the
    * [[decodeQ]] proof extended to every container format the JDK can
    * both write and read — JPEG (lossy: dimensions/channels exact by
    * spec even though samples aren't), GIF (palette-indexed: the
    * reader's color model still reports 3 components for an opaque
    * image), BMP (uncompressed). One codec-dispatching decode path —
    * [[MediaFeatures.decode]] never branches on format, `ImageIO`'s
    * reader registry does — so a regression in any format's real
    * decode diverges from the arithmetic oracle immediately. Scale
    * shape identical to [[decodeQ]]: narrow 1:1 encode+decode over a
    * pruned scan, zero exchange. */
  def decodeMultiQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val planted = plantedImages(s, dir)
    extractFeatures(planted).toDF()
      .join(planted.select($"doc_id", $"format"), "doc_id")
      .select($"doc_id", $"format",
        $"width".cast("long").as("width"),
        $"height".cast("long").as("height"),
        $"channels".cast("long").as("n_channels"),
        $"decoded".cast("long").as("decoded"))
      .orderBy($"doc_id")
  }

  val decodeMultiSql: String =
    """SELECT doc_id,
      |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'jpeg' WHEN 1 THEN 'gif'
      |       ELSE 'bmp' END AS format,
      |  CAST(8 + doc_id % 13 AS BIGINT) AS width,
      |  CAST(8 + doc_id % 11 AS BIGINT) AS height,
      |  CAST(3 AS BIGINT) AS n_channels,
      |  CAST(1 AS BIGINT) AS decoded
      |FROM documents WHERE doc_id % 20 = 3 ORDER BY doc_id""".stripMargin

  /** The planted PCM sample formula, shared by the [[pcmQ]] fixture,
    * its oracle, and the spec: sample k of doc `id` is
    * ((id·31 + 7k²) mod 2048) − 1024 — a deterministic full-swing
    * signed-16-bit-range waveform. */
  private val PcmN = 64
  private def pcmSample(k: String): String =
    s"((doc_id * 31 + 7 * $k * $k) % 2048) - 1024"

  /** q_multimodal_pcm entry: real SIGNAL statistics from raw PCM audio
    * bytes — each audio doc carries a true 44-byte WAV header plus a
    * 64-sample 16-bit LE data chunk (planted from the [[pcmSample]]
    * formula), and the query PARSES the samples back out of the binary
    * (LE signed shorts from `hex(payload)` — the [[wavQ]] field idiom
    * extended to the data section) and computes sum-of-squares energy,
    * RMS, peak amplitude, and zero-crossing count — the loudness /
    * clipping / silence screen an audio-curation pass runs before any
    * codec-level work. The oracle recomputes every statistic from the
    * generative formula WITHOUT touching binary, so one flipped byte,
    * a wrong offset, or a sign-extension bug fails the compare.
    *
    * Scale shape: pure map stage over the audio partition — sample
    * extraction and all four statistics are higher-order expressions
    * over a 64-element array inside one projection; scan speed, zero
    * exchange, integers exact until the single shared RMS sqrt. */
  def pcmQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dataHex = s"""concat_ws('', transform(sequence(0, ${PcmN - 1}), k ->
      |  concat(lpad(hex(((${pcmSample("k")} + 65536) % 65536) % 256), 2, '0'),
      |         lpad(hex(((${pcmSample("k")} + 65536) % 65536) div 256), 2, '0'))))""".stripMargin
    val withPcm = t(s, dir, "documents")
      .filter($"doc_id" % 4 === 2) // the sniff fixture's audio partition
      .withColumn("payload",
        concat(wavHeader("1", "8000", "16", PcmN.toString), unhex(expr(dataHex))))
      .withColumn("hx", hex($"payload"))
    // LE signed int16 at data byte 45+2k (1-based): hi·256+lo, sign-fold
    val smp = s"""transform(sequence(0, ${PcmN - 1}), k ->
      |  if(cast(conv(concat(substring(hx, (45 + 2 * k) * 2 + 1, 2),
      |                      substring(hx, (44 + 2 * k) * 2 + 1, 2)), 16, 10)
      |          as bigint) >= 32768,
      |     cast(conv(concat(substring(hx, (45 + 2 * k) * 2 + 1, 2),
      |                      substring(hx, (44 + 2 * k) * 2 + 1, 2)), 16, 10)
      |          as bigint) - 65536,
      |     cast(conv(concat(substring(hx, (45 + 2 * k) * 2 + 1, 2),
      |                      substring(hx, (44 + 2 * k) * 2 + 1, 2)), 16, 10)
      |          as bigint)))""".stripMargin
    withPcm
      .withColumn("smp", expr(smp))
      .select($"doc_id",
        expr(leValExpr("hx", 41, 4)).as("data_bytes"),
        expr("aggregate(smp, 0L, (a, x) -> a + x * x)").as("sum_sq"),
        expr("array_max(transform(smp, x -> abs(x)))").as("peak_abs"),
        expr(s"""size(filter(sequence(1, ${PcmN - 1}), k ->
          |  (element_at(smp, k + 1) >= 0) != (element_at(smp, k) >= 0)))""".stripMargin)
          .cast("long").as("zero_cross"))
      .withColumn("rms",
        round(sqrt($"sum_sq".cast("double") / PcmN), 6))
      .orderBy($"doc_id")
      .limit(200)
  }

  val pcmSql: String = {
    val smp = s"list_transform(range(0, $PcmN), k -> ${pcmSample("k")})"
    s"""WITH d AS (
      |  SELECT doc_id, $smp AS smp
      |  FROM documents WHERE doc_id % 4 = 2 ORDER BY doc_id LIMIT 200)
      |SELECT doc_id,
      |  CAST(2 * $PcmN AS BIGINT) AS data_bytes,
      |  CAST(list_reduce(list_transform(smp, x -> x * x),
      |    (a, b) -> a + b) AS BIGINT) AS sum_sq,
      |  CAST(list_max(list_transform(smp, x -> abs(x))) AS BIGINT) AS peak_abs,
      |  CAST(len(list_filter(range(1, $PcmN),
      |    k -> (smp[k + 1] >= 0) <> (smp[k] >= 0))) AS BIGINT) AS zero_cross,
      |  ROUND(sqrt(CAST(list_reduce(list_transform(smp, x -> x * x),
      |    (a, b) -> a + b) AS DOUBLE) / $PcmN), 6) AS rms
      |FROM d ORDER BY doc_id""".stripMargin
  }

  /** The planted VAD waveform: 128 samples in four 32-sample frames;
    * frames alternate QUIET/LOUD by ((frame + doc_id) mod 2) — quiet
    * frames carry a tiny ±4 noise floor, loud frames the full-swing
    * [[pcmSample]]-style signal — so every doc has exactly two active
    * and two silent frames at deterministic positions. */
  private val VadN = 128
  private val VadFrame = 32
  private def vadSample(k: String): String =
    s"""if (((($k div $VadFrame) + doc_id) % 2) = 0,
       |  ((doc_id + $k) % 9) - 4,
       |  ((doc_id * 31 + 7 * $k * $k) % 2048) - 1024)""".stripMargin

  /** q_multimodal_vad entry: frame-energy VOICE-ACTIVITY DETECTION —
    * the silence-trimming screen an audio-curation pass runs to drop
    * dead air before paying for transcription: parse the 16-bit PCM
    * samples back out of real WAV bytes (the [[pcmQ]] hex idiom),
    * compute per-32-sample-frame energy, and gate each frame at the
    * INTEGER threshold Σx² ≥ 32·64² (≡ frame RMS ≥ 64, with no FP
    * compare anywhere). Per doc: active-frame count and ratio, the
    * first/last active frame (the trim points), and the peak frame
    * energy. The planted waveform alternates quiet/loud frames, so
    * the expected activity pattern is closed-form and the oracle
    * recomputes it without touching binary.
    *
    * Scale shape: pure map stage over the pruned audio partition; all
    * integers. r15: the doc-set limit moves BEFORE the decode (the
    * [[snrQ]] CTE-order argument — stats never affect the doc_id
    * order, so the candidate row set is unchanged) and the sample
    * parse runs in ONE mapPartitions pass over the WAV bytes instead
    * of the layered hex/conv expression tree, which re-expanded three
    * conv(concat(substring)) chains per sample per alias — 5.5 s of
    * single-task expression evaluation at sf0.1 → 0.2 s. Same parsed
    * integers, same gates, same output. */
  final case class VadStats(doc_id: Long, n_frames: Long, n_active: Long,
      active_bp: Long, first_active: Option[Long], last_active: Long,
      peak_frame_energy: Long)

  def vadQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nf = VadN / VadFrame
    val gate = VadFrame.toLong * 64 * 64
    val dataHex = s"""concat_ws('', transform(sequence(0, ${VadN - 1}), k ->
      |  concat(lpad(hex(((${vadSample("k")} + 65536) % 65536) % 256), 2, '0'),
      |         lpad(hex(((${vadSample("k")} + 65536) % 65536) div 256), 2, '0'))))""".stripMargin
    val withPcm = t(s, dir, "documents")
      .filter($"doc_id" % 4 === 2) // the sniff fixture's audio partition
      .orderBy($"doc_id")
      .limit(200)
      .withColumn("payload",
        concat(wavHeader("1", "8000", "16", VadN.toString), unhex(expr(dataHex))))
    withPcm
      .select($"doc_id".as[Long], $"payload".as[Array[Byte]])
      .mapPartitions(_.map { case (id, bytes) =>
        val smp = new Array[Long](VadN)
        var k = 0
        while (k < VadN) {
          val lo = bytes(44 + 2 * k) & 0xff
          val hi = bytes(45 + 2 * k) & 0xff
          val v = hi * 256 + lo
          smp(k) = if (v >= 32768) v - 65536 else v
          k += 1
        }
        var na = 0L; var first = -1L; var last = -1L; var peak = Long.MinValue
        var f = 0
        while (f < nf) {
          var e = 0L
          var i = 0
          while (i < VadFrame) {
            val x = smp(f * VadFrame + i)
            e += x * x
            i += 1
          }
          if (e > peak) peak = e
          if (e >= gate) {
            na += 1
            if (first < 0) first = f
            last = f
          }
          f += 1
        }
        VadStats(id, nf.toLong, na, 10000L * na / nf,
          if (first < 0) None else Some(first), last, peak)
      }).toDF()
      .orderBy($"doc_id")
  }

  /** q_multimodal_snr entry: SIGNAL-TO-NOISE RATIO + clipping screen
    * over the [[vadQ]] waveform parsed from REAL WAV bytes — classify
    * frames with the same integer energy gate, then SNR_dB =
    * 10·log₁₀(mean active-frame energy / mean quiet-frame energy) and
    * a near-full-scale sample count (|x| ≥ 1000 of ±1024 swing). The
    * audio-curation quality gate that drops low-SNR or clipped clips
    * before transcription spend — computed from parsed samples so any
    * header/offset/sign bug diverges from the formula oracle.
    *
    * Scale shape: pure map over the pruned audio partition (parse,
    * frame energies, gates, log — one projection, zero exchange).
    * Determinism: energies exact integers; the single log/division
    * chain rounds to 6. */
  final case class SnrStats(doc_id: Long, p_signal: Long, p_noise: Long,
      n_active_frames: Long, n_quiet_frames: Long, n_near_clip: Long)

  def snrQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nf = VadN / VadFrame
    val gate = VadFrame.toLong * 64 * 64
    val dataHex = s"""concat_ws('', transform(sequence(0, ${VadN - 1}), k ->
      |  concat(lpad(hex(((${vadSample("k")} + 65536) % 65536) % 256), 2, '0'),
      |         lpad(hex(((${vadSample("k")} + 65536) % 65536) div 256), 2, '0'))))""".stripMargin
    // Doc-set limit BEFORE the quality gate, mirroring the oracle's CTE
    // order (d LIMIT 200, then WHERE na/nq/pn): if a doc ever failed the
    // gate the two engines must still agree on the candidate row set —
    // and decoding only the limited docs is cheaper anyway.
    val withPcm = t(s, dir, "documents")
      .filter($"doc_id" % 4 === 2)
      .orderBy($"doc_id")
      .limit(200)
      .withColumn("payload",
        concat(wavHeader("1", "8000", "16", VadN.toString), unhex(expr(dataHex))))
    // First build routed the sample parse through layered SQL hex
    // expressions; downstream refs (ps/na/pn/nq/clip/snr) re-expanded the
    // 128-sample tree per alias — measured 777 s at sf0.1. Parsing the
    // bytes in ONE mapPartitions pass (the pixelsQ idiom: the decode is
    // real binary work, the right place is JVM code) is 0.5 s.
    val stats = withPcm
      .select($"doc_id".as[Long], $"payload".as[Array[Byte]])
      .mapPartitions(_.map { case (id, bytes) =>
        val n = VadN
        val smp = new Array[Long](n)
        var k = 0
        while (k < n) {
          val lo = bytes(44 + 2 * k) & 0xff
          val hi = bytes(45 + 2 * k) & 0xff
          val v = hi * 256 + lo
          smp(k) = if (v >= 32768) v - 65536 else v
          k += 1
        }
        var ps = 0L; var pn = 0L; var na = 0L; var nq = 0L; var clip = 0L
        var f = 0
        while (f < nf) {
          var e = 0L
          var i = 0
          while (i < VadFrame) {
            val x = smp(f * VadFrame + i)
            e += x * x
            if (math.abs(x) >= 1000) clip += 1
            i += 1
          }
          if (e >= gate) { ps += e; na += 1 } else { pn += e; nq += 1 }
          f += 1
        }
        SnrStats(id, ps, pn, na, nq, clip)
      }).toDF()
    stats
      .filter($"n_active_frames" > 0 && $"n_quiet_frames" > 0 &&
        $"p_noise" > 0)
      .select($"doc_id",
        $"p_signal", $"p_noise", $"n_active_frames", $"n_quiet_frames",
        round(lit(10.0) *
          log(($"p_signal".cast("double") / $"n_active_frames") /
            ($"p_noise".cast("double") / $"n_quiet_frames")) /
          log(lit(10.0)), 6).as("snr_db"),
        $"n_near_clip")
      .orderBy($"doc_id")
  }

  val snrSql: String = {
    val nf = VadN / VadFrame
    val gate = VadFrame.toLong * 64 * 64
    val sample = s"""CASE WHEN ((k // $VadFrame) + doc_id) % 2 = 0
       | THEN (doc_id + k) % 9 - 4
       | ELSE (doc_id * 31 + 7 * k * k) % 2048 - 1024 END""".stripMargin
    s"""WITH d AS (
      |  SELECT doc_id,
      |    list_transform(range(0, $VadN), k -> $sample) AS smp
      |  FROM documents WHERE doc_id % 4 = 2 ORDER BY doc_id LIMIT 200),
      |f AS (
      |  SELECT doc_id, smp,
      |    list_transform(range(0, $nf), f ->
      |      list_reduce(list_transform(smp[f * $VadFrame + 1 :
      |          f * $VadFrame + $VadFrame], x -> x * x),
      |        (a, b) -> a + b)) AS fsq
      |  FROM d),
      |g AS (
      |  SELECT doc_id, smp,
      |    list_reduce(list_filter(fsq, e -> e >= $gate) || [0],
      |      (a, b) -> a + b) AS ps,
      |    len(list_filter(fsq, e -> e >= $gate)) AS na,
      |    list_reduce(list_filter(fsq, e -> e < $gate) || [0],
      |      (a, b) -> a + b) AS pn,
      |    len(list_filter(fsq, e -> e < $gate)) AS nq
      |  FROM f)
      |SELECT doc_id,
      |  CAST(ps AS BIGINT) AS p_signal, CAST(pn AS BIGINT) AS p_noise,
      |  CAST(na AS BIGINT) AS n_active_frames,
      |  CAST(nq AS BIGINT) AS n_quiet_frames,
      |  ROUND(10.0 * LN((CAST(ps AS DOUBLE) / na)
      |    / (CAST(pn AS DOUBLE) / nq)) / LN(10.0), 6) AS snr_db,
      |  CAST(len(list_filter(smp, x -> abs(x) >= 1000)) AS BIGINT)
      |    AS n_near_clip
      |FROM g WHERE na > 0 AND nq > 0 AND pn > 0
      |ORDER BY doc_id""".stripMargin
  }

  val vadSql: String = {
    val nf = VadN / VadFrame
    val gate = VadFrame.toLong * 64 * 64
    val sample = s"""CASE WHEN ((k // $VadFrame) + doc_id) % 2 = 0
       | THEN (doc_id + k) % 9 - 4
       | ELSE (doc_id * 31 + 7 * k * k) % 2048 - 1024 END""".stripMargin
    s"""WITH d AS (
      |  SELECT doc_id,
      |    list_transform(range(0, $VadN), k -> $sample) AS smp
      |  FROM documents WHERE doc_id % 4 = 2 ORDER BY doc_id LIMIT 200),
      |f AS (
      |  SELECT doc_id,
      |    list_transform(range(0, $nf), f ->
      |      list_reduce(list_transform(smp[f * $VadFrame + 1 :
      |          f * $VadFrame + $VadFrame], x -> x * x),
      |        (a, b) -> a + b)) AS fsq
      |  FROM d)
      |SELECT doc_id,
      |  CAST($nf AS BIGINT) AS n_frames,
      |  CAST(len(list_filter(fsq, e -> e >= $gate)) AS BIGINT) AS n_active,
      |  (10000 * len(list_filter(fsq, e -> e >= $gate))) // $nf AS active_bp,
      |  CAST(list_min(list_filter(list_transform(range(0, $nf),
      |    f -> CASE WHEN fsq[f + 1] >= $gate THEN f ELSE -1 END),
      |    x -> x >= 0)) AS BIGINT) AS first_active,
      |  CAST(list_max(list_transform(range(0, $nf),
      |    f -> CASE WHEN fsq[f + 1] >= $gate THEN f ELSE -1 END))
      |    AS BIGINT) AS last_active,
      |  CAST(list_max(fsq) AS BIGINT) AS peak_frame_energy
      |FROM f ORDER BY doc_id""".stripMargin
  }

  /** Per-image decoded-pixel statistics row: exact channel sums + a
    * 4-bin red-channel histogram — everything integer. */
  final case class LumaHist(doc_id: Long, n_px: Long,
      h0: Long, h1: Long, h2: Long, h3: Long,
      h4: Long, h5: Long, h6: Long, h7: Long)

  final case class PixelStats(doc_id: Long, n_px: Long,
      sum_r: Long, sum_g: Long, sum_b: Long,
      h0: Long, h1: Long, h2: Long, h3: Long)

  final case class ThumbBlock(doc_id: Long, by: Long, bx: Long,
      n_px: Long, mean_luma: Long)

  final case class SharpStats(doc_id: Long, n_px: Long, n_pairs: Long,
      grad_sum: Long, edge_count: Long)

  final case class FrameStats(doc_id: Long, n_frames: Long, w: Long, h: Long,
      first_luma: Long, last_luma: Long, sum_luma: Long)

  /** Deterministic planted GRADIENT PNG per sampled doc: pixel (x, y)
    * of doc `id` has r = (37·id + 5x + 3y) % 256, g = (59·id + 7x + y)
    * % 256, b = (83·id + x + 11y) % 256 — every pixel distinct, so a
    * decoder that transposes axes, flips rows, drops a channel, or
    * misreads stride diverges (a solid fill, as in [[plantedPngs]],
    * can't catch any of those). PNG is lossless: decoded samples ARE
    * the formula. */
  private[ops] def plantedGradientPngs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").filter($"doc_id" % 20 === 7)
      .select($"doc_id".as[Long])
      .mapPartitions(_.map { id =>
        val w = (8 + id % 13).toInt
        val h = (8 + id % 11).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val r = ((37 * id + 5 * x + 3 * y) % 256).toInt
            val g = ((59 * id + 7 * x + y) % 256).toInt
            val b = ((83 * id + x + 11 * y) % 256).toInt
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
            x += 1
          }
          y += 1
        }
        val buf = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", buf)
        (id, buf.toByteArray)
      }).toDF("doc_id", "payload")
  }

  /** q_multimodal_histcmp entry: COLOR-SIGNATURE COMPARISON between
    * consecutive decoded images — 8-bin luma histograms from REAL
    * decoded pixels (luma = (r+g+b) div 3, bin = luma div 32), then
    * per consecutive image pair (doc_id order) the two standard
    * histogram measures: INTERSECTION Σ min(pₐ, p_b) (the similarity
    * image-dedup prefilters bucket on) and the χ² distance
    * Σ (pₐ−p_b)²/(pₐ+p_b). This is the decode→signature→compare
    * pipeline of visual near-dup detection, with the decode step real
    * and the signature oracle-verified arithmetically from the planted
    * gradient formula (any codec/stride error diverges).
    *
    * Scale shape: narrow 1:1 mapPartitions decode (zero exchange); the
    * consecutive pairing is a distributed [[Rank]] pass plus an equi
    * self-join on rank+1 (the signature frame scales with the corpus,
    * so no single-task lead window), and a pure-map measure
    * computation. Determinism: histogram counts exact integers;
    * normalized measures are one shared IEEE chain per pair,
    * rounded 6. */
  def histcmpQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val hist = plantedGradientPngs(s, dir)
      .select($"doc_id".as[Long], $"payload".as[Array[Byte]])
      .mapPartitions(_.map { case (id, bytes) =>
        val im = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        val (w, h) = (im.getWidth, im.getHeight)
        val bins = new Array[Long](8)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = im.getRGB(x, y)
            val luma = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
              (rgb & 0xff)) / 3
            bins(luma / 32) += 1
            x += 1
          }
          y += 1
        }
        LumaHist(id, w.toLong * h, bins(0), bins(1), bins(2), bins(3),
          bins(4), bins(5), bins(6), bins(7))
      }).toDF()
    // consecutive pairing without a global lead window OR a
    // rank-self-join: the Rank pass's global lead (r15) carries the
    // next image's whole signature struct — in-bucket window lead +
    // broadcast bucket-head patch; filtering the null lead drops the
    // last image exactly as the inner join did — the signature frame
    // is image-count-sized, which scales with the corpus
    val nextSig = struct(Seq($"doc_id".as("doc_b"),
      $"n_px".as("n_b")) ++ (0 to 7).map(i => col(s"h$i").as(s"g$i")): _*)
    val pairedH = Rank.orderedPrefix(hist, order = Seq($"doc_id"),
        leads = Seq(Rank.Lead(nextSig, "nx")))
      .filter($"nx".isNotNull)
      .select(Seq(col("*"), $"nx.doc_b".as("doc_b"),
        $"nx.n_b".as("n_b")) ++
        (0 to 7).map(i => col(s"nx.g$i").as(s"g$i")): _*)
      .drop("nx")
    val inter = (0 to 7).map(i =>
      least(col(s"h$i").cast("double") / $"n_px",
        col(s"g$i").cast("double") / $"n_b")).reduce(_ + _)
    val chi2 = (0 to 7).map { i =>
      val pa = col(s"h$i").cast("double") / $"n_px"
      val pb = col(s"g$i").cast("double") / $"n_b"
      when(col(s"h$i") + col(s"g$i") === 0, lit(0.0))
        .otherwise((pa - pb) * (pa - pb) / (pa + pb))
    }.reduce(_ + _)
    pairedH.select(
      $"doc_id".as("doc_a"), $"doc_b".cast("long").as("doc_b"),
      $"n_px".as("n_px_a"), $"n_b".cast("long").as("n_px_b"),
      round(inter, 6).as("intersection"),
      round(chi2, 6).as("chi2_dist"))
      .orderBy($"doc_a")
  }

  val histcmpSql: String = {
    val hs = (0 to 7).map(i =>
      s"CAST(SUM(CASE WHEN ((r + g + b) // 3) // 32 = $i THEN 1 ELSE 0 END) AS BIGINT) AS h$i")
      .mkString(",\n      |    ")
    val leads = (0 to 7).map(i =>
      s"lead(h$i) OVER w AS g$i").mkString(",\n      |    ")
    val inter = (0 to 7).map(i =>
      s"LEAST(CAST(h$i AS DOUBLE) / n_px, CAST(g$i AS DOUBLE) / n_b)")
      .mkString(" + ")
    val chi2 = (0 to 7).map(i =>
      s"""(CASE WHEN h$i + g$i = 0 THEN 0.0
         | ELSE (CAST(h$i AS DOUBLE) / n_px - CAST(g$i AS DOUBLE) / n_b)
         |   * (CAST(h$i AS DOUBLE) / n_px - CAST(g$i AS DOUBLE) / n_b)
         |   / (CAST(h$i AS DOUBLE) / n_px + CAST(g$i AS DOUBLE) / n_b) END)"""
        .stripMargin.replace("\n", " ")).mkString(" + ")
    s"""WITH d AS (
      |  SELECT doc_id, 8 + doc_id % 13 AS w, 8 + doc_id % 11 AS h
      |  FROM documents WHERE doc_id % 20 = 7),
      |px AS (
      |  SELECT doc_id, w, h,
      |    (37 * doc_id + 5 * x.i + 3 * y.j) % 256 AS r,
      |    (59 * doc_id + 7 * x.i + y.j) % 256 AS g,
      |    (83 * doc_id + x.i + 11 * y.j) % 256 AS b
      |  FROM d CROSS JOIN range(0, 21) x(i) CROSS JOIN range(0, 19) y(j)
      |  WHERE x.i < w AND y.j < h),
      |hist AS (
      |  SELECT doc_id, CAST(w * h AS BIGINT) AS n_px,
      |    $hs
      |  FROM px GROUP BY doc_id, w, h),
      |paired AS (
      |  SELECT *, lead(doc_id) OVER w AS doc_b, lead(n_px) OVER w AS n_b,
      |    $leads
      |  FROM hist
      |  WINDOW w AS (ORDER BY doc_id))
      |SELECT doc_id AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
      |  n_px AS n_px_a, CAST(n_b AS BIGINT) AS n_px_b,
      |  ROUND($inter, 6) AS intersection,
      |  ROUND($chi2, 6) AS chi2_dist
      |FROM paired WHERE doc_b IS NOT NULL
      |ORDER BY doc_a""".stripMargin
  }

  /** q_multimodal_pixels entry: REAL pixel-level statistics from
    * decoded image content — per-channel sums (exact integers) and a
    * 4-bin red histogram over a planted gradient PNG, the
    * channel-mean / color-histogram feature pass an image-curation
    * pipeline runs after decode (dedup by color signature, filter
    * near-black/blown-out captures). The oracle recomputes every
    * statistic ARITHMETICALLY from the gradient formula over a
    * (width × height) index grid without touching binary, so the
    * compare certifies actual decoded sample values, not just header
    * fields — strictly stronger than [[decodeQ]]'s dimension check.
    * Scale shape: narrow 1:1 encode+decode+fold over a pruned doc_id
    * scan; zero exchange; integers end-to-end (means divide exact
    * sums). */
  def pixelsQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    plantedGradientPngs(s, dir)
      .select($"doc_id".as[Long], $"payload".as[Array[Byte]])
      .mapPartitions(_.map { case (id, bytes) =>
        val im = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        val (w, h) = (im.getWidth, im.getHeight)
        var (sr, sg, sb) = (0L, 0L, 0L)
        val hist = new Array[Long](4)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = im.getRGB(x, y)
            val r = (rgb >> 16) & 0xff
            sr += r; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
            hist(r / 64) += 1
            x += 1
          }
          y += 1
        }
        PixelStats(id, w.toLong * h, sr, sg, sb,
          hist(0), hist(1), hist(2), hist(3))
      }).toDF()
      .select($"doc_id", $"n_px", $"sum_r", $"sum_g", $"sum_b",
        round($"sum_r".cast("double") / $"n_px", 6).as("mean_r"),
        $"h0", $"h1", $"h2", $"h3")
      .orderBy($"doc_id")
  }

  val pixelsSql: String =
    """WITH d AS (
      |  SELECT doc_id, 8 + doc_id % 13 AS w, 8 + doc_id % 11 AS h
      |  FROM documents WHERE doc_id % 20 = 7),
      |px AS (
      |  SELECT doc_id, w, h,
      |    (37 * doc_id + 5 * x.i + 3 * y.j) % 256 AS r,
      |    (59 * doc_id + 7 * x.i + y.j) % 256 AS g,
      |    (83 * doc_id + x.i + 11 * y.j) % 256 AS b
      |  FROM d CROSS JOIN range(0, 21) x(i) CROSS JOIN range(0, 19) y(j)
      |  WHERE x.i < w AND y.j < h)
      |SELECT doc_id, CAST(w * h AS BIGINT) AS n_px,
      |  CAST(SUM(r) AS BIGINT) AS sum_r,
      |  CAST(SUM(g) AS BIGINT) AS sum_g,
      |  CAST(SUM(b) AS BIGINT) AS sum_b,
      |  ROUND(CAST(CAST(SUM(r) AS BIGINT) AS DOUBLE) / (w * h), 6) AS mean_r,
      |  CAST(SUM(CASE WHEN r // 64 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS h0,
      |  CAST(SUM(CASE WHEN r // 64 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS h1,
      |  CAST(SUM(CASE WHEN r // 64 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS h2,
      |  CAST(SUM(CASE WHEN r // 64 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS h3
      |FROM px GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin

  /** q_multimodal_sharpness entry: the BLUR / FLAT-IMAGE SCREEN — mean
    * absolute horizontal luma gradient plus an edge-pixel count over
    * REAL decoded pixels; the cheap sharpness signal an image-curation
    * pipeline gates on before paying for any vision model (a blank,
    * blurred, or single-color image has near-zero gradient mass).
    * ENTIRELY integer arithmetic: luma = (r+g+b) div 3, gradient =
    * |luma(x+1,y) − luma(x,y)|, means as basis points by integer
    * division — so the DuckDB oracle recomputes every gradient pair
    * ARITHMETICALLY from the planted per-pixel formula without
    * decoding (the [[resizeQ]] proof shape: any codec/stride/axis
    * error diverges). Scale shape: narrow 1:1 mapPartitions decode,
    * zero exchange — the screen runs at scan speed. */
  def sharpnessQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    plantedGradientPngs(s, dir)
      .select($"doc_id".as[Long], $"payload".as[Array[Byte]])
      .mapPartitions(_.map { case (id, bytes) =>
        val im = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        val (w, h) = (im.getWidth, im.getHeight)
        def luma(x: Int, y: Int): Int = {
          val rgb = im.getRGB(x, y)
          (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
        }
        var gradSum = 0L
        var edges = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w - 1) {
            val d = math.abs(luma(x + 1, y) - luma(x, y))
            gradSum += d
            if (d >= 32) edges += 1
            x += 1
          }
          y += 1
        }
        SharpStats(id, w.toLong * h, (w - 1).toLong * h, gradSum, edges)
      }).toDF()
      .select($"doc_id", $"n_px", $"n_pairs", $"grad_sum",
        expr("(10000 * grad_sum) div n_pairs").as("grad_mean_bp"),
        $"edge_count",
        expr("(10000 * edge_count) div n_pairs").as("edge_bp"))
      .orderBy($"doc_id")
  }

  val sharpnessSql: String =
    """WITH d AS (
      |  SELECT doc_id, 8 + doc_id % 13 AS w, 8 + doc_id % 11 AS h
      |  FROM documents WHERE doc_id % 20 = 7),
      |px AS (
      |  SELECT doc_id, w, h,
      |    (((37 * doc_id + 5 * x.i + 3 * y.j) % 256)
      |     + ((59 * doc_id + 7 * x.i + y.j) % 256)
      |     + ((83 * doc_id + x.i + 11 * y.j) % 256)) // 3 AS luma,
      |    (((37 * doc_id + 5 * (x.i + 1) + 3 * y.j) % 256)
      |     + ((59 * doc_id + 7 * (x.i + 1) + y.j) % 256)
      |     + ((83 * doc_id + (x.i + 1) + 11 * y.j) % 256)) // 3 AS luma_next
      |  FROM d CROSS JOIN range(0, 21) x(i) CROSS JOIN range(0, 19) y(j)
      |  WHERE x.i < w - 1 AND y.j < h),
      |g AS (
      |  SELECT doc_id, MAX(w * h) AS n_px, COUNT(*) AS n_pairs,
      |    SUM(ABS(luma_next - luma)) AS grad_sum,
      |    SUM(CASE WHEN ABS(luma_next - luma) >= 32 THEN 1 ELSE 0 END)
      |      AS edge_count
      |  FROM px GROUP BY doc_id)
      |SELECT doc_id, CAST(n_px AS BIGINT) AS n_px,
      |  CAST(n_pairs AS BIGINT) AS n_pairs,
      |  CAST(grad_sum AS BIGINT) AS grad_sum,
      |  CAST((10000 * grad_sum) // n_pairs AS BIGINT) AS grad_mean_bp,
      |  CAST(edge_count AS BIGINT) AS edge_count,
      |  CAST((10000 * edge_count) // n_pairs AS BIGINT) AS edge_bp
      |FROM g ORDER BY doc_id""".stripMargin

  /** Deterministic planted ANIMATED GIF per sampled doc: 2 + id%3
    * solid-color frames, frame f colored (r,g,b) = ((37·id + 11f) %
    * 256, (59·id + 7f) % 256, (83·id + 3f) % 256) at (4 + id%5) ×
    * (4 + id%3) px — solid frames round-trip GIF's palette
    * losslessly, so decoded samples ARE the formula. */
  private[ops] def plantedGifs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").filter($"doc_id" % 20 === 3)
      .select($"doc_id".as[Long])
      .mapPartitions(_.map { id =>
        val (w, h) = ((4 + id % 5).toInt, (4 + id % 3).toInt)
        val n = (2 + id % 3).toInt
        val buf = new java.io.ByteArrayOutputStream()
        val ios = javax.imageio.ImageIO.createImageOutputStream(buf)
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("gif").next()
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        (0 until n).foreach { f =>
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val r = ((37 * id + 11 * f) % 256).toInt
          val g = ((59 * id + 7 * f) % 256).toInt
          val b = ((83 * id + 3 * f) % 256).toInt
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, (r << 16) | (g << 8) | b); x += 1 }
            y += 1
          }
          writer.writeToSequence(
            new javax.imageio.IIOImage(img, null, null), null)
        }
        writer.endWriteSequence()
        ios.close()
        writer.dispose()
        (id, buf.toByteArray)
      }).toDF("doc_id", "payload")
  }

  /** q_multimodal_frames entry: REAL MULTI-FRAME decode — the brief's
    * video frame-sampling contract exercised end-to-end on the one
    * multi-frame container the JDK actually decodes (animated GIF;
    * true video stays env-blocked, see [[frameSample]]'s documented
    * byte-stride stub): each planted animation is read frame-BY-frame
    * through the ImageIO sequence reader, and per-doc frame count,
    * first/last frame luma, and the all-frames luma sum are emitted —
    * all exact integers the oracle recomputes from the planting
    * formula WITHOUT any codec. A reader that drops a frame, reorders
    * the sequence, or composites deltas wrongly diverges.
    *
    * Scale shape: narrow 1:1 mapPartitions decode, zero exchange —
    * frame extraction streams at scan speed, exactly how a video
    * pipeline's keyframe sampler runs. */
  def framesQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    plantedGifs(s, dir)
      .select($"doc_id".as[Long], $"payload".as[Array[Byte]])
      .mapPartitions(_.map { case (id, bytes) =>
        val reader = javax.imageio.ImageIO
          .getImageReadersByFormatName("gif").next()
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        def luma(i: Int): Long = {
          val rgb = reader.read(i).getRGB(0, 0)
          ((((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3)
            .toLong
        }
        val lumas = (0 until n).map(luma)
        val im0 = reader.read(0)
        val out = FrameStats(id, n.toLong, im0.getWidth.toLong,
          im0.getHeight.toLong, lumas.head, lumas.last, lumas.sum)
        reader.dispose(); iis.close()
        out
      }).toDF()
      .orderBy($"doc_id")
  }

  val framesSql: String =
    """WITH d AS (
      |  SELECT doc_id, 2 + doc_id % 3 AS n, 4 + doc_id % 5 AS w,
      |    4 + doc_id % 3 AS h
      |  FROM documents WHERE doc_id % 20 = 3),
      |fl AS (
      |  SELECT doc_id, n, w, h, f.f AS f,
      |    (((37 * doc_id + 11 * f.f) % 256)
      |     + ((59 * doc_id + 7 * f.f) % 256)
      |     + ((83 * doc_id + 3 * f.f) % 256)) // 3 AS luma
      |  FROM d CROSS JOIN range(0, 5) f(f)
      |  WHERE f.f < n)
      |SELECT doc_id, CAST(MAX(n) AS BIGINT) AS n_frames,
      |  CAST(MAX(w) AS BIGINT) AS w, CAST(MAX(h) AS BIGINT) AS h,
      |  CAST(MAX(CASE WHEN f = 0 THEN luma END) AS BIGINT) AS first_luma,
      |  CAST(MAX(CASE WHEN f = n - 1 THEN luma END) AS BIGINT) AS last_luma,
      |  CAST(SUM(luma) AS BIGINT) AS sum_luma
      |FROM fl GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** q_multimodal_resize entry: the brief's RESIZE / feature-extract
    * step made real and oracle-exact — decode each planted gradient
    * PNG and block-mean downsample it to a 4×4 luma thumbnail (each
    * target cell averages its source block, the box-filter resize
    * every thumbnail/preprocessing pipeline runs before a vision
    * model). All arithmetic is integer — luma = (r+g+b) div 3, cell
    * mean = floor(Σluma / n) — so the oracle recomputes every cell
    * ARITHMETICALLY from the planted per-pixel formula without
    * decoding: a codec that misdecodes ANY pixel, or a resampler that
    * mis-assigns a block boundary (bx = x·4 div w), diverges on some
    * cell. Scale shape: narrow 1:1 mapPartitions decode+downsample,
    * zero exchange — thumbnails stream out at scan speed. */
  def resizeQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    plantedGradientPngs(s, dir)
      .select($"doc_id".as[Long], $"payload".as[Array[Byte]])
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val im = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        val (w, h) = (im.getWidth, im.getHeight)
        val sums = Array.ofDim[Long](4, 4)
        val cnts = Array.ofDim[Long](4, 4)
        var y = 0
        while (y < h) {
          val by = y * 4 / h
          var x = 0
          while (x < w) {
            val bx = x * 4 / w
            val rgb = im.getRGB(x, y)
            val luma = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
              (rgb & 0xff)) / 3
            sums(by)(bx) += luma
            cnts(by)(bx) += 1
            x += 1
          }
          y += 1
        }
        for (by <- 0 until 4; bx <- 0 until 4)
          yield ThumbBlock(id, by, bx, cnts(by)(bx),
            sums(by)(bx) / cnts(by)(bx))
      }).toDF()
      .orderBy($"doc_id", $"by", $"bx")
  }

  val resizeSql: String =
    """WITH d AS (
      |  SELECT doc_id, 8 + doc_id % 13 AS w, 8 + doc_id % 11 AS h
      |  FROM documents WHERE doc_id % 20 = 7),
      |px AS (
      |  SELECT doc_id, w, h, x.i AS x, y.j AS y,
      |    ((37 * doc_id + 5 * x.i + 3 * y.j) % 256
      |     + (59 * doc_id + 7 * x.i + y.j) % 256
      |     + (83 * doc_id + x.i + 11 * y.j) % 256) // 3 AS luma
      |  FROM d CROSS JOIN range(0, 21) x(i) CROSS JOIN range(0, 19) y(j)
      |  WHERE x.i < w AND y.j < h)
      |SELECT doc_id, CAST(y * 4 // h AS BIGINT) AS by,
      |  CAST(x * 4 // w AS BIGINT) AS bx,
      |  CAST(COUNT(*) AS BIGINT) AS n_px,
      |  CAST(SUM(luma) // COUNT(*) AS BIGINT) AS mean_luma
      |FROM px GROUP BY doc_id, y * 4 // h, x * 4 // w
      |ORDER BY doc_id, by, bx""".stripMargin

  /** q_multimodal_pitch entry: autocorrelation periodicity analysis of
    * the [[pcmQ]] PCM signal — for each candidate lag 1..16, the raw
    * autocorrelation Σₖ x[k]·x[k−lag] over the parsed samples, keeping
    * the lag with the maximum (tie → smallest lag): the classic
    * pitch-detection / periodicity screen, run here ENTIRELY in exact
    * integer arithmetic (products ≤ 2²⁰·64 per doc — no FP anywhere,
    * so Spark and the oracle agree bit-for-bit including argmax
    * ties). Samples come from the real WAV binary exactly as [[pcmQ]]
    * parses it; the oracle regenerates them from the planted formula.
    * Scale shape: one projection with a 16-lag higher-order fold per
    * row; scan speed, zero exchange. */
  def pitchQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dataHex = s"""concat_ws('', transform(sequence(0, ${PcmN - 1}), k ->
      |  concat(lpad(hex(((${pcmSample("k")} + 65536) % 65536) % 256), 2, '0'),
      |         lpad(hex(((${pcmSample("k")} + 65536) % 65536) div 256), 2, '0'))))""".stripMargin
    val smp = s"""transform(sequence(0, ${PcmN - 1}), k ->
      |  if(cast(conv(concat(substring(hx, (45 + 2 * k) * 2 + 1, 2),
      |                      substring(hx, (44 + 2 * k) * 2 + 1, 2)), 16, 10)
      |          as bigint) >= 32768,
      |     cast(conv(concat(substring(hx, (45 + 2 * k) * 2 + 1, 2),
      |                      substring(hx, (44 + 2 * k) * 2 + 1, 2)), 16, 10)
      |          as bigint) - 65536,
      |     cast(conv(concat(substring(hx, (45 + 2 * k) * 2 + 1, 2),
      |                      substring(hx, (44 + 2 * k) * 2 + 1, 2)), 16, 10)
      |          as bigint)))""".stripMargin
    t(s, dir, "documents")
      .filter($"doc_id" % 4 === 2)
      .withColumn("payload",
        concat(wavHeader("1", "8000", "16", PcmN.toString), unhex(expr(dataHex))))
      .withColumn("hx", hex($"payload"))
      .withColumn("smp", expr(smp))
      .withColumn("ac", expr(s"""transform(sequence(1, 16), lg ->
        |  aggregate(sequence(lg, ${PcmN - 1}), 0L,
        |    (a, k) -> a + element_at(smp, k + 1) * element_at(smp, k - lg + 1)))"""
        .stripMargin))
      .withColumn("energy",
        expr("aggregate(smp, 0L, (a, x) -> a + x * x)"))
      .select($"doc_id",
        expr("""aggregate(sequence(1, 16), named_struct('lg', 0L, 'v', -1000000000000000L),
          |  (best, lg) -> if(element_at(ac, cast(lg as int)) > best.v,
          |    named_struct('lg', cast(lg as bigint), 'v', element_at(ac, cast(lg as int))),
          |    best)).lg""".stripMargin).as("best_lag"),
        expr("array_max(ac)").as("ac_peak"),
        $"energy",
        round(expr("array_max(ac)").cast("double") /
          $"energy".cast("double"), 6).as("ac_norm"))
      .orderBy($"doc_id")
      .limit(200)
  }

  val pitchSql: String = {
    val smp = s"list_transform(range(0, $PcmN), k -> ${pcmSample("k")})"
    s"""WITH d AS (
      |  SELECT doc_id, $smp AS smp
      |  FROM documents WHERE doc_id % 4 = 2 ORDER BY doc_id LIMIT 200),
      |ac AS (
      |  SELECT doc_id, smp, lg.lag,
      |    CAST(list_reduce(list_transform(range(lag, $PcmN),
      |      k -> smp[k + 1] * smp[k - lag + 1]), (a, b) -> a + b) AS BIGINT) AS acv
      |  FROM d CROSS JOIN range(1, 17) lg(lag)),
      |best AS (
      |  SELECT doc_id, smp, lag, acv,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY acv DESC, lag) AS rn
      |  FROM ac)
      |SELECT doc_id, CAST(lag AS BIGINT) AS best_lag, acv AS ac_peak,
      |  CAST(list_reduce(list_transform(smp, x -> x * x),
      |    (a, b) -> a + b) AS BIGINT) AS energy,
      |  ROUND(CAST(acv AS DOUBLE) / CAST(list_reduce(list_transform(smp,
      |    x -> x * x), (a, b) -> a + b) AS DOUBLE), 6) AS ac_norm
      |FROM best WHERE rn = 1 ORDER BY doc_id""".stripMargin
  }

  /** Big-endian field read from a hex column: bytes `off..off+n-1`
    * (0-based) as an unsigned integer — MP4/ISO-BMFF is big-endian, so
    * the hex digits are already in place-value order. */
  private[ops] def beValExpr(hexCol: String, off: Int, n: Int): String =
    s"cast(conv(substring($hexCol, ${off * 2 + 1}, ${n * 2}), 16, 10) as bigint)"

  /** q_multimodal_mp4 entry: VIDEO CONTAINER metadata via a real
    * ISO-BMFF box walk — the piece of the video story that needs no
    * codec: the fixture synthesizes a genuine `ftyp` + `moov`/`mvhd`
    * box structure per video doc (variable-length compatible-brands
    * list, timescale/duration from doc_id formulas), and the query
    * WALKS the boxes from the binary — reads the ftyp box SIZE field
    * to locate `moov` (a fixed-offset parser would break the moment
    * the brand list length changes), verifies each 4CC tag, then
    * extracts mvhd timescale/duration and derives the duration in
    * seconds. This is exactly what ffprobe-style listing does before
    * any decoder opens; TRUE-video frame decode remains env-blocked
    * (no JDK video codec — the byte-stride stub in [[frameSample]]
    * keeps that contract testable), while the multi-frame decode path
    * itself is REAL and oracle-checked on animated GIF ([[framesQ]]).
    *
    * The oracle recomputes every field arithmetically from doc_id —
    * one wrong size read, endianness slip, or off-by-one in the walk
    * diverges. Scale: pure map over the video partition; scan speed,
    * zero exchange. */
  def mp4Q(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def be(v: String, n: Int): String =
      s"lpad(hex($v), ${n * 2}, '0')"
    // brands: 1 + id%3 of [isom, mp41, mp42]
    val brandsHex = """CASE cast(doc_id % 3 as int)
      |  WHEN 0 THEN '69736F6D'
      |  WHEN 1 THEN concat('69736F6D', '6D703431')
      |  ELSE concat('69736F6D', '6D703431', '6D703432') END""".stripMargin
    val ftypSize = "(16 + 4 * (1 + doc_id % 3))"
    val ts = "(600 + doc_id % 1000)"
    val dur = "(600 + (doc_id * 13) % 90000)"
    val payload = s"""unhex(concat(
      |  ${be(ftypSize, 4)}, '66747970', '69736F6D', ${be("512", 4)},
      |  $brandsHex,
      |  ${be("116", 4)}, '6D6F6F76',
      |  ${be("108", 4)}, '6D766864', '00000000',
      |  '00000000', '00000000',
      |  ${be(ts, 4)}, ${be(dur, 4)},
      |  repeat('00', 80)))""".stripMargin
    val withHx = t(s, dir, "documents")
      .filter($"doc_id" % 4 === 3)
      .withColumn("hx", hex(expr(payload)))
    // the walk: ftyp size at 0 locates moov; every 4CC verified
    val fsz = beValExpr("hx", 0, 4)
    val moovOff = s"cast($fsz as int)"
    withHx
      .withColumn("ftyp_size", expr(fsz))
      .withColumn("parsed",
        expr(s"substring(hx, 9, 8) = '66747970'") &&
          expr(s"substring(hx, $moovOff * 2 + 9, 8) = '6D6F6F76'") &&
          expr(s"substring(hx, ($moovOff + 8) * 2 + 9, 8) = '6D766864'"))
      .withColumn("timescale", expr(
        s"cast(conv(substring(hx, ($moovOff + 8 + 20) * 2 + 1, 8), 16, 10) as bigint)"))
      .withColumn("duration", expr(
        s"cast(conv(substring(hx, ($moovOff + 8 + 24) * 2 + 1, 8), 16, 10) as bigint)"))
      .select($"doc_id", $"ftyp_size",
        expr("(ftyp_size - 16) div 4").as("n_brands"),
        when($"parsed", 1L).otherwise(0L).as("parsed"),
        $"timescale", $"duration",
        round($"duration".cast("double") / $"timescale", 6).as("duration_s"))
      .orderBy($"doc_id")
      .limit(200)
  }

  val mp4Sql: String =
    """SELECT doc_id,
      |  CAST(16 + 4 * (1 + doc_id % 3) AS BIGINT) AS ftyp_size,
      |  CAST(1 + doc_id % 3 AS BIGINT) AS n_brands,
      |  CAST(1 AS BIGINT) AS parsed,
      |  CAST(600 + doc_id % 1000 AS BIGINT) AS timescale,
      |  CAST(600 + (doc_id * 13) % 90000 AS BIGINT) AS duration,
      |  ROUND(CAST(600 + (doc_id * 13) % 90000 AS DOUBLE)
      |    / (600 + doc_id % 1000), 6) AS duration_s
      |FROM documents WHERE doc_id % 4 = 3 ORDER BY doc_id LIMIT 200""".stripMargin

  /** Deterministic planted 9×8 GRADIENT PNGs for the perceptual-hash
    * query: pixel gray value is the closed form
    * v = (grp·31 + x·17 + y·7 + x·y) mod 200 (+3 for the odd variant),
    * where grp pairs consecutive sampled docs. PNG is lossless, so the
    * decoded pixels equal the formula exactly — which lets the DuckDB
    * oracle recompute the hash ARITHMETICALLY, with no image codec. */
  private[ops] def plantedGradients(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").filter($"doc_id" % 10 === 2)
      .select($"doc_id".as[Long])
      .mapPartitions(_.map { id =>
        val grp = id / 20
        val vr = (id / 10) % 2
        val img = new java.awt.image.BufferedImage(
          9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 9) {
            val v = ((grp * 31 + x * 17 + y * 7 + x * y) % 200 + vr * 3).toInt
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        val buf = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", buf)
        (id, buf.toByteArray)
      }).toDF("doc_id", "payload")
  }

  /** One perceptually-hashed image: the 64-bit dHash packed as four
    * 16-bit bands (the SimHash-style LSH-band layout). */
  final case class DHashed(doc_id: Long, b0: Long, b1: Long, b2: Long,
                           b3: Long, decoded: Boolean)

  /** q_dedup_image entry: PERCEPTUAL near-dup detection over image
    * CONTENT — the difference hash (dHash): decode each payload for
    * real (ImageIO), compare horizontally adjacent pixel lumas into a
    * 64-bit fingerprint, and cluster by fingerprint. The fixture
    * plants gradient pairs that differ by a +3 global brightness shift
    * — different BYTES (sha/exact dedup misses them; the spec pins
    * that) but identical dHash, because adding a constant preserves
    * every adjacent-pixel inequality. That invariance to brightness /
    * contrast / re-encode is why production image dedup hashes pixels,
    * not bytes.
    *
    * Scale shape: decode + hash is a narrow 1:1 mapPartitions (each
    * task decodes its own parquet split; a thumbnail decode is
    * KB-bounded work per row); the only exchange is the groupBy of
    * 4×16-bit fingerprints — pixels never shuffle. At 100 TB the same
    * four band columns feed the [[Dedup]] LSH band-join for
    * Hamming ≤ k (not just = 0) candidate generation. The oracle
    * recomputes the hash arithmetically from the planted closed form,
    * so a decoder that misreads any pixel, row stride, or color
    * channel diverges immediately. */
  def dedupImageQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hashed = plantedGradients(s, dir)
      .select($"doc_id".as[Long], $"payload".as[Array[Byte]])
      .mapPartitions(_.map { case (id, bytes) =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        if (img == null) DHashed(id, -1L, -1L, -1L, -1L, decoded = false)
        else {
          def luma(x: Int, y: Int): Int = img.getRGB(x, y) & 0xff // gray
          val bands = new Array[Long](4)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth - 1) {
              if (luma(x + 1, y) > luma(x, y)) {
                val i = y * 8 + x
                bands(i / 16) |= 1L << (i % 16)
              }
              x += 1
            }
            y += 1
          }
          DHashed(id, bands(0), bands(1), bands(2), bands(3),
            decoded = true)
        }
      }).toDF()
    hashed.groupBy($"b0", $"b1", $"b2", $"b3")
      .agg(count(lit(1)).as("n_docs"),
        min($"doc_id").as("lo_doc"), max($"doc_id").as("hi_doc"))
      .filter($"n_docs" >= 2)
      .orderBy($"lo_doc")
  }

  val dedupImageSql: String =
    """WITH d AS (
      |  SELECT doc_id, doc_id // 20 AS grp, (doc_id // 10) % 2 AS vr
      |  FROM documents WHERE doc_id % 10 = 2),
      |px AS (
      |  SELECT doc_id, xx.x AS x, yy.y AS y,
      |    (grp * 31 + xx.x * 17 + yy.y * 7 + xx.x * yy.y) % 200
      |      + vr * 3 AS v
      |  FROM d
      |  CROSS JOIN (SELECT unnest(range(9)) AS x) xx
      |  CROSS JOIN (SELECT unnest(range(8)) AS y) yy),
      |bits AS (
      |  SELECT a.doc_id, a.y * 8 + a.x AS i,
      |    CAST(b.v > a.v AS BIGINT) AS bit
      |  FROM px a JOIN px b ON b.doc_id = a.doc_id AND b.y = a.y
      |    AND b.x = a.x + 1
      |  WHERE a.x < 8),
      |h AS (
      |  SELECT doc_id,
      |    CAST(SUM(CASE WHEN i // 16 = 0 THEN bit << (i % 16) END)
      |      AS BIGINT) AS b0,
      |    CAST(SUM(CASE WHEN i // 16 = 1 THEN bit << (i % 16) END)
      |      AS BIGINT) AS b1,
      |    CAST(SUM(CASE WHEN i // 16 = 2 THEN bit << (i % 16) END)
      |      AS BIGINT) AS b2,
      |    CAST(SUM(CASE WHEN i // 16 = 3 THEN bit << (i % 16) END)
      |      AS BIGINT) AS b3
      |  FROM bits GROUP BY doc_id)
      |SELECT b0, b1, b2, b3, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  MIN(doc_id) AS lo_doc, MAX(doc_id) AS hi_doc
      |FROM h GROUP BY 1, 2, 3, 4
      |HAVING COUNT(*) >= 2
      |ORDER BY lo_doc""".stripMargin

  /** Planted 9×8 gradients for the HAMMING near-dup query — three
    * variants per group: base, +3 brightness (dHash-identical), and a
    * 3-pixel perturbation that flips ≤ 6 dHash bits. Group patterns
    * differ structurally (grp modulates the x/y coefficients), so
    * cross-group fingerprints are far apart and the below-threshold
    * pairs are the planted ones. Closed-form pixels, as with
    * [[plantedGradients]], so the oracle recomputes everything
    * arithmetically. */
  private[ops] def plantedGradients3(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").filter($"doc_id" % 10 === 3)
      .select($"doc_id".as[Long])
      .mapPartitions(_.map { id =>
        val grp = id / 30
        val vr = (id / 10) % 3
        val img = new java.awt.image.BufferedImage(
          9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 9) {
            var v = ((grp * 31 + x * (17 + grp % 5) + y * (7 + grp % 3)
              + x * y) % 200).toInt
            if (vr == 1) v += 3
            if (vr == 2 && x == (grp % 7) && y % 3 == (grp % 3)) v += 37
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        val buf = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", buf)
        (id, buf.toByteArray)
      }).toDF("doc_id", "payload")
  }

  /** One hashed image for the Hamming query: full 64-bit dHash plus
    * its 8 × 8-bit LSH bands. */
  final case class DHashBands(doc_id: Long, h: Long, bands: Seq[Int])

  /** q_dedup_image_hamming entry: image near-dup at Hamming DISTANCE —
    * the [[dedupImageQ]] exact-fingerprint match generalized to
    * Hamming ≤ 8, which is what catches re-encodes and small edits
    * that flip a few bits. LSH layout: the 64-bit dHash splits into
    * EIGHT 8-bit bands; by pigeonhole any pair within Hamming ≤ 7
    * agrees on at least one band, so band-collision candidate
    * generation has GUARANTEED recall at the ≤ 6-bit planted
    * perturbation (the q_dedup_prefix exact-recall argument, in
    * Hamming space); candidates then verify by popcount of the XOR.
    *
    * Scale shape: pixels hash once (narrow mapPartitions decode);
    * the self-join is keyed by (band_idx, band_value) — candidates ∝
    * Σ bucket-occupancy², never all-pairs; verification touches two
    * 64-bit words per candidate. */
  def dedupImageHammingQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hashed = plantedGradients3(s, dir)
      .select($"doc_id".as[Long], $"payload".as[Array[Byte]])
      .mapPartitions(_.map { case (id, bytes) =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        var h = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth - 1) {
            if ((img.getRGB(x + 1, y) & 0xff) > (img.getRGB(x, y) & 0xff))
              h |= 1L << (y * 8 + x)
            x += 1
          }
          y += 1
        }
        DHashBands(id, h,
          (0 until 8).map(b => ((h >>> (b * 8)) & 0xffL).toInt))
      }).toDF()
    val bands = hashed.select($"doc_id", $"h",
      posexplode($"bands").as(Seq("bidx", "bval")))
    val cand = bands.as("a").join(bands.as("b"),
        $"a.bidx" === $"b.bidx" && $"a.bval" === $"b.bval" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"a.h".as("ha"),
        $"b.doc_id".as("doc_b"), $"b.h".as("hb"))
      .distinct()
    cand
      .withColumn("hamming", expr("bit_count(ha ^ hb)").cast("int"))
      .filter($"hamming" <= 8)
      .select($"doc_a", $"doc_b", $"hamming")
      .orderBy($"doc_a", $"doc_b")
      .limit(400)
  }

  val dedupImageHammingSql: String =
    """WITH d AS (
      |  SELECT doc_id, doc_id // 30 AS grp, (doc_id // 10) % 3 AS vr
      |  FROM documents WHERE doc_id % 10 = 3),
      |px AS (
      |  SELECT doc_id, xx.x AS x, yy.y AS y,
      |    (grp * 31 + xx.x * (17 + grp % 5) + yy.y * (7 + grp % 3)
      |      + xx.x * yy.y) % 200
      |    + CASE WHEN vr = 1 THEN 3 ELSE 0 END
      |    + CASE WHEN vr = 2 AND xx.x = grp % 7 AND yy.y % 3 = grp % 3
      |           THEN 37 ELSE 0 END AS v
      |  FROM d
      |  CROSS JOIN (SELECT unnest(range(9)) AS x) xx
      |  CROSS JOIN (SELECT unnest(range(8)) AS y) yy),
      |bits AS (
      |  SELECT a.doc_id, a.y * 8 + a.x AS i,
      |    CAST(b.v > a.v AS BIGINT) AS bit
      |  FROM px a JOIN px b ON b.doc_id = a.doc_id AND b.y = a.y
      |    AND b.x = a.x + 1
      |  WHERE a.x < 8),
      |bands AS (
      |  SELECT doc_id, i // 8 AS bidx,
      |    CAST(SUM(bit << (i % 8)) AS BIGINT) AS bval
      |  FROM bits GROUP BY 1, 2),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM bands a JOIN bands b ON a.bidx = b.bidx AND a.bval = b.bval
      |    AND a.doc_id < b.doc_id),
      |ham AS (
      |  SELECT c.doc_a, c.doc_b,
      |    CAST(SUM(CASE WHEN x.bit <> y.bit THEN 1 ELSE 0 END) AS INT)
      |      AS hamming
      |  FROM cand c
      |  JOIN bits x ON x.doc_id = c.doc_a
      |  JOIN bits y ON y.doc_id = c.doc_b AND y.i = x.i
      |  GROUP BY 1, 2)
      |SELECT doc_a, doc_b, hamming FROM ham
      |WHERE hamming <= 8
      |ORDER BY doc_a, doc_b LIMIT 400""".stripMargin

  /** q_multimodal_png_header entry: codec-free PNG metadata extraction
    * as PURE Catalyst expressions over the binary column — the 100 TB
    * multimodal pattern that matters most in practice: a metadata
    * sweep (dimensions, bit depth, color model) over billions of
    * images must NOT decode pixels. PNG pins the IHDR chunk to a fixed
    * offset (8-byte signature, 4-byte length, "IHDR", then big-endian
    * width/height and depth/color bytes — ISO 15948 §5.3/11.2.2), so
    * the parse is `substring`/`hex`/`conv` column arithmetic: fully
    * codegen'd, scan-speed, zero per-row JVM object churn — vs the
    * [[decodeQ]] family's deliberate full-codec path.
    *
    * Payloads are the SAME real ImageIO-encoded PNGs as [[decodeQ]],
    * so the oracle's arithmetic truth (dimensions are functions of
    * doc_id; JDK writes TYPE_INT_RGB as 8-bit truecolor, color type
    * 2) certifies the byte-offset parse against a genuine encoder. */
  def pngHeaderQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    plantedPngs(s, dir)
      .select($"doc_id",
        (hex(expr("substring(payload, 1, 8)")) === "89504E470D0A1A0A")
          .as("sig_ok"),
        expr("cast(conv(hex(substring(payload, 17, 4)), 16, 10) as bigint)")
          .as("width"),
        expr("cast(conv(hex(substring(payload, 21, 4)), 16, 10) as bigint)")
          .as("height"),
        expr("cast(conv(hex(substring(payload, 25, 1)), 16, 10) as bigint)")
          .as("bit_depth"),
        expr("cast(conv(hex(substring(payload, 26, 1)), 16, 10) as bigint)")
          .as("color_type"))
      .orderBy($"doc_id")
  }

  val pngHeaderSql: String =
    """SELECT doc_id, TRUE AS sig_ok,
      |  CAST(8 + doc_id % 13 AS BIGINT) AS width,
      |  CAST(8 + doc_id % 11 AS BIGINT) AS height,
      |  CAST(8 AS BIGINT) AS bit_depth,
      |  CAST(2 AS BIGINT) AS color_type
      |FROM documents WHERE doc_id % 20 = 1 ORDER BY doc_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_png_header" -> pngHeaderQ,
    "q_dedup_image" -> dedupImageQ,
    "q_dedup_image_hamming" -> dedupImageHammingQ,
    "q_multimodal_mp4" -> mp4Q,
    "q_multimodal" -> multimodal,
    "q_multimodal_wav" -> wavQ,
    "q_multimodal_sniff" -> sniffQ,
    "q_multimodal_decode" -> decodeQ,
    "q_multimodal_decode_multi" -> decodeMultiQ,
    "q_multimodal_pcm" -> pcmQ,
    "q_multimodal_vad" -> vadQ,
    "q_multimodal_histcmp" -> histcmpQ,
    "q_multimodal_snr" -> snrQ,
    "q_multimodal_pixels" -> pixelsQ,
    "q_multimodal_sharpness" -> sharpnessQ,
    "q_multimodal_frames" -> framesQ,
    "q_multimodal_resize" -> resizeQ,
    "q_multimodal_pitch" -> pitchQ)

  def oracle: Map[String, String] = Map(
    "q_multimodal_png_header" -> pngHeaderSql,
    "q_dedup_image" -> dedupImageSql,
    "q_dedup_image_hamming" -> dedupImageHammingSql,
    "q_multimodal_mp4" -> mp4Sql,
    "q_multimodal" -> multimodalSql,
    "q_multimodal_wav" -> wavSql,
    "q_multimodal_sniff" -> sniffSql,
    "q_multimodal_decode" -> decodeSql,
    "q_multimodal_decode_multi" -> decodeMultiSql,
    "q_multimodal_pcm" -> pcmSql,
    "q_multimodal_vad" -> vadSql,
    "q_multimodal_histcmp" -> histcmpSql,
    "q_multimodal_snr" -> snrSql,
    "q_multimodal_pixels" -> pixelsSql,
    "q_multimodal_sharpness" -> sharpnessSql,
    "q_multimodal_frames" -> framesSql,
    "q_multimodal_resize" -> resizeSql,
    "q_multimodal_pitch" -> pitchSql)
}
