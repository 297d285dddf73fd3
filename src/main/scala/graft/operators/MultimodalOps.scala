package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A multimodal record: opaque binary payload + typed metadata (north star —
  * image/audio/video as BinaryType columns). Text-payload rows use the utf-8
  * bytes of documents.text; REAL image payloads are the javax.imageio PNGs
  * of [[MultimodalOps.pngTable]], decoded for real in
  * [[MultimodalOps.decodeImageBatch]].
  */
case class MediaRecord(
    doc_id: Long,
    payload: Array[Byte],
    mime: String,
    lang: String,
    n_chars: Long)

/** Byte-level features of an opaque payload (any binary column — computed
  * without decoding). The REAL decoded-image complement is
  * [[MediaDecoded]] via [[MultimodalOps.decodeImageBatch]].
  */
case class MediaFeatures(
    doc_id: Long,
    n_bytes: Long,
    head_byte: Long,
    checksum: Long,
    n_frames: Long)

/** A real PNG payload (encoded with javax.imageio on the executors). */
case class PngRecord(doc_id: Long, png: Array[Byte])

/** Perceptual average-hash of a REAL decoded image: 8×8 nearest-neighbor
  * downsample thresholded at the integer mean, 64 bits split into two
  * unsigned-32 halves so no value touches the long sign bit. */
case class AHashRecord(
    doc_id: Long,
    width: Long,
    height: Long,
    mean_px: Long,
    ahash_hi: Long,
    ahash_lo: Long)

/** REAL decoded-image features: produced by an actual `javax.imageio` PNG
  * decode on the executors ([[MultimodalOps.decodeImageBatch]]) —
  * dimensions and raster stats read from the decoded pixels, not from the
  * byte stream.
  */
case class MediaDecoded(
    doc_id: Long,
    width: Long,
    height: Long,
    channels: Long,
    pixel_sum: Long,
    px00: Long)

/** Multimodal-column operators: binary payload modeling, metadata projection,
  * batched "decode"/feature extraction via mapPartitions, frame sampling via
  * binary slicing.
  *
  * Scale posture: payloads never leave their partition — decode is a narrow
  * mapPartitions (one decoder init per partition, amortized like the
  * reference's foreachPartition connections, KafkaStreamerToHbase.scala:88);
  * metadata-only queries prune the payload column at the parquet scan.
  */
object MultimodalOps extends QueryModule {

  /** documents → multimodal table: binary payload + metadata struct. */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "documents")
      .select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        lit("text/plain").as("mime"),
        col("lang"),
        col("n_chars"))

  /** Byte-level payload features — the decode-free half of the multimodal
    * pair (length/head/checksum are meaningful for ANY opaque binary
    * column; no codec involved). The REAL decode path with the same
    * batched mapPartitions shape is [[decodeImageBatch]] below.
    */
  def decodeBatch(s: SparkSession, dir: String): Dataset[MediaFeatures] = {
    import s.implicits._
    mediaTable(s, dir).as[MediaRecord].mapPartitions { it =>
      // one "decoder" per partition (amortized init, like a real codec)
      it.map { r =>
        val bytes = r.payload
        var sum = 0L
        var i = 0
        while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
        MediaFeatures(
          doc_id = r.doc_id,
          n_bytes = bytes.length.toLong,
          head_byte = if (bytes.nonEmpty) (bytes(0) & 0xff).toLong else -1L,
          checksum = sum,
          n_frames = (bytes.length.toLong + 255L) / 256L)
      }
    }
  }

  /** One tiny REAL grayscale PNG per document: width = 4 + doc_id % 13,
    * height = 3 + doc_id % 7, pixel(x, y) = (doc_id·31 + x·7 + y·13) mod
    * 256 — a deterministic ramp, encoded with `javax.imageio` in a
    * mapPartitions (one encoder context per partition; payloads never
    * leave their partition, exactly the at-scale media-ingest shape). The
    * closed-form pixel function is what lets the DuckDB oracle verify the
    * decode without any image library.
    */
  def pngTable(s: SparkSession, dir: String): Dataset[PngRecord] = {
    import s.implicits._
    Tables.t(s, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        // stream cache off: keep the encoder purely in-memory per task
        javax.imageio.ImageIO.setUseCache(false)
        ids.map { id =>
          val w = (4 + id % 13).toInt
          val h = (3 + id % 7).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              raster.setSample(x, y, 0, ((id * 31 + x * 7 + y * 13) % 256).toInt)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          PngRecord(id, bos.toByteArray)
        }
      }
  }

  /** REAL image decode — `javax.imageio.ImageIO.read` on the executors,
    * batched mapPartitions (one decoder init per partition, the JNI/FFI
    * codec shape): dimensions, band count, and raster stats come from the
    * DECODED pixels. PNG is lossless, so the oracle recomputes the same
    * stats from [[pngTable]]'s closed-form ramp — the full
    * encode→bytes→decode round-trip is hash-checked end-to-end.
    */
  def decodeImageBatch(pngs: Dataset[PngRecord]): Dataset[MediaDecoded] = {
    import pngs.sparkSession.implicits._
    pngs.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.png))
        val raster = img.getRaster
        val (w, h, bands) = (img.getWidth, img.getHeight, raster.getNumBands)
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var b = 0
            while (b < bands) { sum += raster.getSample(x, y, b); b += 1 }
            x += 1
          }
          y += 1
        }
        MediaDecoded(r.doc_id, w.toLong, h.toLong, bands.toLong, sum,
          raster.getSample(0, 0, 0).toLong)
      }
    }
  }

  private def mediaDecodeReal(s: SparkSession, dir: String): DataFrame =
    decodeImageBatch(pngTable(s, dir)).toDF().orderBy(col("doc_id"))

  /** Perceptual average-hash (aHash) over the REAL decoded PNGs: decode
    * with `javax.imageio`, nearest-neighbor-sample an 8×8 grid
    * (x = ⌊i·w/8⌋, y = ⌊j·h/8⌋), threshold each sample STRICTLY above the
    * integer mean of the 64 samples, pack the 64 bits (k = j·8 + i) into
    * two unsigned-32 longs. The decode and sampling run in the same
    * batched mapPartitions as [[decodeImageBatch]] (payloads never leave
    * their partition); the oracle replays the closed-form ramp — so the
    * full encode→decode→downsample→threshold pipeline is hash-checked.
    */
  def ahashTable(pngs: Dataset[PngRecord]): Dataset[AHashRecord] = {
    import pngs.sparkSession.implicits._
    pngs.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.png))
        val raster = img.getRaster
        val (w, h) = (img.getWidth, img.getHeight)
        val samples = new Array[Long](64)
        var sum = 0L
        var j = 0
        while (j < 8) {
          var i = 0
          while (i < 8) {
            val v = raster.getSample(i * w / 8, j * h / 8, 0).toLong
            samples(j * 8 + i) = v
            sum += v
            i += 1
          }
          j += 1
        }
        val mean = sum / 64
        var hi = 0L
        var lo = 0L
        var k = 0
        while (k < 64) {
          if (samples(k) > mean) {
            if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
          }
          k += 1
        }
        AHashRecord(r.doc_id, w.toLong, h.toLong, mean, hi, lo)
      }
    }
  }

  private def imageAhash(s: SparkSession, dir: String): DataFrame =
    ahashTable(pngTable(s, dir)).toDF().orderBy(col("doc_id"))

  private val ahashCtes: String =
    """g AS (
      |  SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h
      |  FROM documents
      |), sm AS (
      |  SELECT doc_id, w, h,
      |    flatten(list_transform(generate_series(0, 7), j ->
      |      list_transform(generate_series(0, 7), i ->
      |        (doc_id * 31 + ((i * w) // 8) * 7 + ((j * h) // 8) * 13) % 256)))
      |      AS sv
      |  FROM g
      |), mm AS (
      |  SELECT doc_id, w, h, sv,
      |    CAST(list_sum(sv) // 64 AS BIGINT) AS mean_px
      |  FROM sm
      |), ah AS (
      |  SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
      |    mean_px,
      |    CAST(COALESCE(list_sum(list_transform(generate_series(33, 64), k ->
      |      CASE WHEN sv[k] > mean_px THEN (CAST(1 AS BIGINT) << (k - 33))
      |           ELSE 0 END)), 0) AS BIGINT) AS ahash_hi,
      |    CAST(COALESCE(list_sum(list_transform(generate_series(1, 32), k ->
      |      CASE WHEN sv[k] > mean_px THEN (CAST(1 AS BIGINT) << (k - 1))
      |           ELSE 0 END)), 0) AS BIGINT) AS ahash_lo
      |  FROM mm
      |)""".stripMargin

  private val imageAhashSql: String =
    s"""WITH $ahashCtes
       |SELECT doc_id, width, height, mean_px, ahash_hi, ahash_lo
       |FROM ah ORDER BY doc_id""".stripMargin

  /** Perceptual-duplicate groups: documents whose decoded images share the
    * EXACT 64-bit aHash (the "same image up to resize/re-encode" dedup
    * key). One hash aggregate over the decoded table — no pair space at
    * any scale; the banded-hamming relaxation for near-miss hashes is the
    * simhash_pairs machinery applied to this column.
    */
  private def imageAhashDups(s: SparkSession, dir: String): DataFrame =
    ahashTable(pngTable(s, dir)).toDF()
      .groupBy(col("ahash_hi"), col("ahash_lo"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        min(col("doc_id")).as("rep_doc"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("ahash_hi"), col("ahash_lo"))

  private val imageAhashDupsSql: String =
    s"""WITH $ahashCtes
       |SELECT ahash_hi, ahash_lo, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  MIN(doc_id) AS rep_doc
       |FROM ah GROUP BY 1, 2 HAVING COUNT(*) >= 2
       |ORDER BY ahash_hi, ahash_lo""".stripMargin

  /** Perceptual NEAR-duplicates: aHash-GROUP pairs within hamming ≤ 3 —
    * the "same image up to a few flipped threshold bits" relaxation
    * exact-hash grouping ([[imageAhashDups]]) cannot see. Candidate
    * generation is the simhash_pairs banded-LSH shape applied to the
    * 64-bit aHash: 4 bands of 16 bits over the DISTINCT-hash group table,
    * candidates from the band EQUI-join — by pigeonhole any pair within
    * hamming ≤ 3 agrees exactly on ≥ 1 of the 4 bands, so banding is
    * LOSSLESS and the pair space never materializes (PlanShapeSpec pins
    * the equi-join). Exact 64-bit hamming filters the candidates;
    * DISTINCT collapses multi-band matches. Emitting hash GROUPS
    * (rep_doc, n_docs per side) rather than doc pairs keeps the output
    * linear in distinct hashes on duplicate-heavy corpora — doc pairs are
    * the groups' cross products, quadratic in group size and never needed
    * materialized by downstream clustering. */
  private def imageAhashNearDups(s: SparkSession, dir: String): DataFrame = {
    // GROUP-level near-dup pairs, not doc-level: duplicate-heavy corpora
    // make doc pairs quadratic in group size (the native sf1.0 run
    // measured 360M band candidates over 50k docs / 1 861 distinct
    // hashes — a heap OOM as doc pairs, a 1 861-row self-join as hash
    // groups). One hash aggregate collapses docs to (hash, n_docs,
    // rep_doc); the banded-hamming join runs over DISTINCT hashes only,
    // and each emitted row carries both groups' sizes — the doc-level
    // pair set is exactly the n_a×n_b cross products downstream CC/dedup
    // never needs materialized. Equal hashes are [[imageAhashDups]]'s
    // domain; this emits hamming 1..3 between different hashes.
    // cache: one decode+group pass feeds both sides of the band self-join
    val ah = ahashTable(pngTable(s, dir)).toDF()
      .groupBy(col("ahash_hi"), col("ahash_lo"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        min(col("doc_id")).as("rep_doc"))
      .cache()
    val bands = ah.select(col("rep_doc"), col("n_docs"),
      col("ahash_hi"), col("ahash_lo"),
      posexplode(array(
        col("ahash_lo").bitwiseAND(lit(65535L)),
        shiftright(col("ahash_lo"), 16).bitwiseAND(lit(65535L)),
        col("ahash_hi").bitwiseAND(lit(65535L)),
        shiftright(col("ahash_hi"), 16).bitwiseAND(lit(65535L)))))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_val")
    graft.QOps.ordered1(
      bands.as("x").join(bands.as("y"),
          col("x.band_idx") === col("y.band_idx") &&
            col("x.band_val") === col("y.band_val") &&
            col("x.rep_doc") < col("y.rep_doc"))
        .select(col("x.rep_doc").as("rep_a"), col("y.rep_doc").as("rep_b"),
          col("x.n_docs").as("n_a"), col("y.n_docs").as("n_b"),
          (bit_count(col("x.ahash_hi").bitwiseXOR(col("y.ahash_hi"))) +
            bit_count(col("x.ahash_lo").bitwiseXOR(col("y.ahash_lo"))))
            .cast("long").as("hamming"))
        .filter(col("hamming") <= 3)
        .distinct(),
      col("rep_a"), col("rep_b"))
  }

  private val imageAhashNearDupsSql: String =
    s"""WITH $ahashCtes,
       |grp AS (
       |  SELECT ahash_hi, ahash_lo, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    MIN(doc_id) AS rep_doc
       |  FROM ah GROUP BY 1, 2
       |),
       |bands AS (
       |  SELECT rep_doc, n_docs, ahash_hi, ahash_lo, b.band_idx,
       |    CASE b.band_idx
       |      WHEN 0 THEN ahash_lo & 65535
       |      WHEN 1 THEN (ahash_lo >> 16) & 65535
       |      WHEN 2 THEN ahash_hi & 65535
       |      ELSE (ahash_hi >> 16) & 65535 END AS band_val
       |  FROM grp CROSS JOIN (SELECT UNNEST(generate_series(0, 3)) AS band_idx) b
       |)
       |SELECT DISTINCT x.rep_doc AS rep_a, y.rep_doc AS rep_b,
       |  x.n_docs AS n_a, y.n_docs AS n_b,
       |  CAST(bit_count(xor(x.ahash_hi, y.ahash_hi)) +
       |       bit_count(xor(x.ahash_lo, y.ahash_lo)) AS BIGINT) AS hamming
       |FROM bands x JOIN bands y
       |  ON x.band_idx = y.band_idx AND x.band_val = y.band_val
       | AND x.rep_doc < y.rep_doc
       |WHERE bit_count(xor(x.ahash_hi, y.ahash_hi)) +
       |      bit_count(xor(x.ahash_lo, y.ahash_lo)) <= 3
       |ORDER BY rep_a, rep_b""".stripMargin

  private val mediaDecodeRealSql =
    """WITH dims AS (
      |  SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h
      |  FROM documents
      |)
      |SELECT doc_id,
      |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
      |  CAST(1 AS BIGINT) AS channels,
      |  CAST(list_sum(flatten(list_transform(generate_series(0, w - 1), x ->
      |         list_transform(generate_series(0, h - 1), y ->
      |           (doc_id * 31 + x * 7 + y * 13) % 256)))) AS BIGINT)
      |    AS pixel_sum,
      |  CAST(doc_id * 31 % 256 AS BIGINT) AS px00
      |FROM dims ORDER BY doc_id""".stripMargin

  /** Metadata + payload stats — relational only, payload length/hash pushed
    * into codegen'd expressions. The head hash goes through hex before md5:
    * a raw 16-BYTE slice can split a multi-byte char, and this DuckDB build
    * has no md5(BLOB)/substring(BLOB), so hex is the canonical byte-slice
    * representation both engines can hash identically (hostile-fixture
    * finding — the old md5(substr(text,1,16)) oracle counted CHARS). */
  private def mediaMeta(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir)
      .select(
        col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        col("mime"), col("lang"), col("n_chars"),
        md5(hex(substring(col("payload"), 1, 16))).as("head16_md5"),
        expr("(length(payload) + 255) div 256").cast("long").as("n_frames"))
      .orderBy(col("doc_id"))

  private def mediaFeatures(s: SparkSession, dir: String): DataFrame = {
    val df = decodeBatch(s, dir).toDF()
    df.orderBy(col("doc_id"))
  }

  /** Frame sampling: every 256-byte "frame", keep its first 8 bytes (as hex)
    * — binary slicing stays columnar; one output row per (doc, frame). */
  private def frameSample(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir)
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), col("payload"),
        explode(sequence(lit(0),
          expr("(length(payload) + 255) div 256 - 1").cast("int"))).as("frame_id"))
      .select(
        col("doc_id"),
        col("frame_id").cast("long").as("frame_id"),
        // hex-canonical byte slice, same reason as mediaMeta's head16_md5
        expr("md5(hex(substring(payload, frame_id * 256 + 1, 8)))").as("frame_head_md5"))
      .orderBy(col("doc_id"), col("frame_id"))

  /** "Resize": stride-4 decimation of the payload — the downsample analog
    * for opaque bytes (a real image resize replaces the kernel; the
    * columnar shape — HOF over the payload, no UDF, no shuffle — stays).
    * Emits the resized size and content hash so the transform is
    * value-checked, not just schema-checked.
    */
  private def mediaResize(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir)
      .withColumn("txt", decode(col("payload"), "UTF-8"))
      // empty-payload guard: Spark's sequence(1, 0, 4) THROWS (start > stop
      // with positive step) while DuckDB's generate_series(1, 0, 4) is empty
      // — same divergence class as DedupOps.shingles, same guard
      .withColumn("arr",
        expr("IF(length(txt) = 0, array(), " +
          "transform(sequence(1, length(txt), 4), i -> substring(txt, i, 1)))"))
      .select(
        col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        size(col("arr")).cast("long").as("resized_bytes"),
        md5(array_join(col("arr"), "")).as("resized_md5"))
      .orderBy(col("doc_id"))

  /** Payload near-dup by frame fingerprints: chunk every payload into fixed
    * 64-byte frames, fingerprint each frame (md5 over the hex byte-slice —
    * the canonical byte representation both engines hash identically), and
    * pair documents through an equi-join on the fingerprint — the video/
    * audio analog of shingle blocking (two clips sharing a chunk collide;
    * the quadratic pair space never materializes). Ubiquitous frames
    * (df > 50 docs) are dropped before the join, the boilerplate guard that
    * bounds any hot chunk's pair fan-out. Score = shared distinct frames /
    * frames of the smaller payload (containment, robust to length skew).
    */
  private def payloadFrameDup(s: SparkSession, dir: String): DataFrame = {
    val frames = mediaTable(s, dir)
      // empty-payload guard: Spark's sequence(0, -1) yields a DESCENDING
      // [0, -1] (step defaults to sign(stop-start)) while DuckDB's
      // generate_series(0, -1) is empty — same divergence class as
      // multimodal_resize, same explicit-empty guard
      .select(col("doc_id"), col("payload"),
        explode(expr("IF(length(payload) = 0, array(), " +
          "sequence(0, (length(payload) + 63) div 64 - 1))")).as("f"))
      .select(col("doc_id"),
        expr("md5(hex(substring(payload, f * 64 + 1, 64)))").as("fh"))
      .distinct()
      .cache()
    val perDoc = frames.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("nf"))
    val rare = frames.groupBy(col("fh"))
      .agg(count(lit(1)).cast("long").as("df"))
      .filter(col("df") <= 50 && col("df") >= 2)
      .select(col("fh"))
    val blocked = frames.join(rare, "fh")
    val shared = blocked.as("x").join(blocked.as("y"),
        col("x.fh") === col("y.fh") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .agg(count(lit(1)).cast("long").as("shared"))
    val out = shared
      .join(perDoc.select(col("doc_id").as("a_id"), col("nf").as("nf_a")), "a_id")
      .join(perDoc.select(col("doc_id").as("b_id"), col("nf").as("nf_b")), "b_id")
      .withColumn("containment",
        col("shared").cast("double") / least(col("nf_a"), col("nf_b")).cast("double"))
      .filter(col("containment") >= 0.5)
      .select(col("a_id"), col("b_id"), col("shared"), col("nf_a"),
        col("nf_b"), col("containment"))
    graft.QOps.ordered1(out, col("a_id"), col("b_id"))
  }

  private val payloadFrameDupSql: String =
    """WITH frames AS (
      |  SELECT DISTINCT doc_id,
      |    md5(substr(hex(encode(text)), f.f * 128 + 1, 128)) AS fh
      |  FROM documents,
      |    LATERAL (SELECT unnest(generate_series(0,
      |       (octet_length(encode(text)) + 63) // 64 - 1)) AS f) f
      |), per_doc AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nf FROM frames GROUP BY 1
      |), rare AS (
      |  SELECT fh FROM frames GROUP BY fh
      |  HAVING COUNT(*) <= 50 AND COUNT(*) >= 2
      |), blocked AS (
      |  SELECT f.doc_id, f.fh FROM frames f JOIN rare USING (fh)
      |), shared AS (
      |  SELECT x.doc_id AS a_id, y.doc_id AS b_id,
      |    CAST(COUNT(*) AS BIGINT) AS shared
      |  FROM blocked x JOIN blocked y
      |    ON x.fh = y.fh AND x.doc_id < y.doc_id
      |  GROUP BY 1, 2
      |)
      |SELECT s.a_id, s.b_id, s.shared, a.nf AS nf_a, b.nf AS nf_b,
      |  CAST(s.shared AS DOUBLE) / CAST(LEAST(a.nf, b.nf) AS DOUBLE)
      |    AS containment
      |FROM shared s
      |JOIN per_doc a ON s.a_id = a.doc_id
      |JOIN per_doc b ON s.b_id = b.doc_id
      |WHERE CAST(s.shared AS DOUBLE) / CAST(LEAST(a.nf, b.nf) AS DOUBLE) >= 0.5
      |ORDER BY s.a_id, s.b_id""".stripMargin

  override def queries: Seq[Q] = Seq(
    Q("media_decode_real", mediaDecodeReal, Some(mediaDecodeRealSql)),
    Q("image_ahash", imageAhash, Some(imageAhashSql)),
    Q("image_ahash_dups", imageAhashDups, Some(imageAhashDupsSql)),
    Q("image_ahash_near_dups", imageAhashNearDups, Some(imageAhashNearDupsSql)),
    Q("payload_frame_dup", payloadFrameDup, Some(payloadFrameDupSql)),
    Q("multimodal_resize", mediaResize, Some(
      // COALESCE: DuckDB's array_to_string over an empty list yields NULL
      // (not ''), so an empty payload would md5 to NULL while Spark hashes
      // the empty string — hostile-fixture finding
      """WITH t AS (
        |  SELECT doc_id, text,
        |         list_transform(generate_series(1, length(text), 4),
        |                        i -> substr(text, i, 1)) AS arr
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(len(arr) AS BIGINT) AS resized_bytes,
        |  md5(COALESCE(array_to_string(arr, ''), '')) AS resized_md5
        |FROM t ORDER BY doc_id""".stripMargin)),
    Q("multimodal_meta", mediaMeta, Some(
      // byte slice via hex: substr(text,...) counts CHARS and this DuckDB
      // has no substring(BLOB); substr of the hex blob IS the byte slice
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  'text/plain' AS mime, lang, n_chars,
        |  md5(substr(hex(encode(text)), 1, 32)) AS head16_md5,
        |  CAST((octet_length(encode(text)) + 255) // 256 AS BIGINT) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin)),
    // Byte-feature extraction over opaque payloads (no codec): the oracle
    // replays the byte loop over the UTF-8 BYTES (hex-pair extraction) —
    // the previous chars/codepoints form silently assumed an ASCII-only
    // corpus (caught by the hostile unicode fixture). The codec-backed
    // sibling is media_decode_real above.
    Q("multimodal_features", mediaFeatures, Some(
      """WITH h AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents)
        |SELECT doc_id,
        |  CAST(length(hx) // 2 AS BIGINT) AS n_bytes,
        |  CAST(CASE WHEN length(hx) > 0
        |            THEN CAST(concat('0x', substr(hx, 1, 2)) AS BIGINT)
        |            ELSE -1 END AS BIGINT) AS head_byte,
        |  CAST(COALESCE(list_sum(list_transform(
        |         generate_series(1, length(hx) // 2),
        |         i -> CAST(concat('0x', substr(hx, 2 * i - 1, 2)) AS BIGINT))),
        |       0) AS BIGINT) AS checksum,
        |  CAST((length(hx) // 2 + 255) // 256 AS BIGINT) AS n_frames
        |FROM h ORDER BY doc_id""".stripMargin)),
    Q("multimodal_frame_sample", frameSample, Some(
      // frame content sliced from the hex blob (2 hex chars per byte) so
      // frame boundaries count bytes in both engines even mid-codepoint
      """SELECT doc_id, CAST(f.frame_id AS BIGINT) AS frame_id,
        |  md5(substr(hex(encode(text)),
        |      CAST(f.frame_id * 512 + 1 AS INT), 16)) AS frame_head_md5
        |FROM documents,
        |  LATERAL (SELECT unnest(generate_series(0,
        |     (octet_length(encode(text)) + 255) // 256 - 1)) AS frame_id) f
        |WHERE doc_id < 50
        |ORDER BY doc_id, frame_id""".stripMargin))
  )
}
