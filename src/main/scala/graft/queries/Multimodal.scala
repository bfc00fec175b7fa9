package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing (driver north star; SURVEY.md §7 M4).
  *
  * The container has no image/audio codecs and the fixtures carry no media,
  * so the corpus is derived: `blob = utf8-bytes(text)` stands in for an
  * opaque media payload. What is REAL and judged here is the Spark-side
  * plumbing a media pipeline needs at 100 TB:
  *   - `BinaryType` columns flowing through scans/joins/aggregations,
  *   - a typed `Dataset` + `mapPartitions` decode stage (q50) — the Scala
  *     equivalent of a batched Python `mapInPandas` decoder: one iterator
  *     pass per partition, byte-level access, no per-row driver calls
  *     (the pixel decode itself is the clearly-marked stub),
  *   - deterministic frame sampling by byte offset (q51) — schema and
  *     fan-out identical to real video frame extraction.
  *
  * The oracle never sees the binary path: it recomputes the same metadata
  * from the TEXT side (ascii/substr arithmetic), so the byte-level Spark
  * pipeline is verified against an independent derivation.
  */
object Multimodal {
  type QFn = (SparkSession, String) => DataFrame

  /** Simulated media table: doc_id, opaque payload, declared kind. */
  private def media(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("blob"),
      when(pmod(col("doc_id"), lit(3)) === 0, "image")
        .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
        .otherwise("video").as("kind"))

  /** Decoded record produced by the stubbed per-partition decoder. */
  final case class Decoded(doc_id: Long, kind: String, byte_len: Long, header: Long, checksum: Long)

  /** Audio feature record from the REAL javax.sound WAV decode (q159). */
  final case class AudioStats(doc_id: Long, n_samples: Long, sum_sq: Long,
      peak: Long, n_silent_win: Long)

  /** Image feature record from the REAL javax.imageio decode (q128):
    * native dimensions, channel sums, and channel sums AFTER the
    * nearest-neighbor resize to the fixed 8x8 thumbnail (src pixel =
    * floor(t*w/8), floor(t*h/8) — pure integer sampling, so the oracle
    * recomputes the resized sums arithmetically).
    */
  final case class ImgStats(doc_id: Long, width: Int, height: Int,
      sum_r: Long, sum_g: Long, rs_r: Long, rs_g: Long)

  /** Perceptual-hash record from the REAL decode (q205): the 64-bit aHash
    * split into two 32-bit halves (hi/lo) so neither engine touches the
    * sign bit of an int64 during bit assembly.
    */
  final case class PHash(doc_id: Long, hi: Long, lo: Long)

  val queries: Seq[(String, QFn)] = Seq(
    // Typed mapPartitions "decode": byte length, 4-byte big-endian header
    // word, checksum over the first 64 bytes. Pixel/sample decode is the
    // stub — everything around it (encoders, batching, schema) is real.
    "q50_media_decode_stats" -> { (s, dir) =>
      import s.implicits._
      val decoded = media(s, dir)
        .select(col("doc_id"), col("kind"), col("blob"))
        .as[(Long, String, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (id, kind, bytes) =>
            // STUB: a real decoder would parse the container format here.
            val header = bytes.take(4).foldLeft(0L)((acc, b) => acc * 256 + (b & 0xffL))
            val checksum = bytes.take(64).foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xffL)) % 1000003L)
            Decoded(id, kind, bytes.length.toLong, header, checksum)
          }
        }
      decoded.toDF()
        .groupBy("kind")
        .agg(count(lit(1)).as("n_media"),
          sum("byte_len").as("total_bytes"),
          min("header").as("min_header"), max("header").as("max_header"),
          (sum("checksum") / count(lit(1))).as("avg_checksum"))
        .orderBy("kind")
    },

    // REAL image decode through javax.imageio (the JDK's actual PNG codec
    // — no stub): per doc a deterministic RGB image is rendered from
    // doc_id's pixel formula, ENCODED to real PNG bytes on the executors
    // (ImageIO.write → the opaque BinaryType media column), then a second
    // typed mapPartitions stage DECODES those bytes back (ImageIO.read)
    // and extracts features (dimensions, per-channel sums). The oracle
    // never sees a PNG: it recomputes the features arithmetically from
    // the same pixel formula — so a hash match proves the full
    // encode→bytes→decode roundtrip through the real codec is lossless
    // and the decode stage reads exactly what was written. This is the
    // q50 plumbing with the codec made real; at 100 TB the decode stage
    // is the same batched per-partition iterator, just behind a scan of
    // stored media instead of a render.
    "q128_image_decode" -> { (s, dir) =>
      import s.implicits._
      val pngs = Tables.documents(s, dir)
        .filter(col("doc_id") < 40).select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val w = 8 + (id % 9).toInt
            val h = 8 + (id % 7).toInt
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val r = ((id * 31 + x * 7 + y * 13) % 256).toInt
                val g = ((id * 17 + x * 3 + y * 11) % 256).toInt
                val b = ((id * 23 + x * 5 + y * 19) % 256).toInt
                img.setRGB(x, y, (r << 16) | (g << 8) | b)
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            (id, bos.toByteArray)
          }
        }.toDF("doc_id", "blob")
      pngs.as[(Long, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (id, bytes) =>
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            val (w, h) = (img.getWidth, img.getHeight)
            var sr = 0L; var sg = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val p = img.getRGB(x, y)
                sr += (p >> 16) & 0xff
                sg += (p >> 8) & 0xff
                x += 1
              }
              y += 1
            }
            // resize stage: nearest-neighbor 8x8 thumbnail over the REAL
            // decoded pixels (integer source sampling — floor(t*dim/8))
            var rsr = 0L; var rsg = 0L
            var ty = 0
            while (ty < 8) {
              var tx = 0
              while (tx < 8) {
                val p = img.getRGB(tx * w / 8, ty * h / 8)
                rsr += (p >> 16) & 0xff
                rsg += (p >> 8) & 0xff
                tx += 1
              }
              ty += 1
            }
            ImgStats(id, w, h, sr, sg, rsr, rsg)
          }
        }.toDF()
        .orderBy("doc_id")
    },

    // Perceptual-hash image dedup over the REAL codec path — the image
    // twin of text near-dup: aHash (mean-threshold 8x8 average hash,
    // public) computed from ACTUALLY DECODED PNG pixels, then pairs
    // within Hamming distance 8. Images come in near-duplicate families
    // (three ids share a base image; each member shifts every channel by
    // id%3 — the brightness-nudged re-encode a crawler sees), so the
    // judged pairs are REAL near-dups the hash must survive, and family
    // boundaries are real negatives. The 64 hash bits assemble into two
    // 32-bit halves (no int64 sign games); Hamming distance is
    // bit_count(xor) per half — codegen'd integer ops. The oracle
    // recomputes hash bits arithmetically from the generating formulas —
    // decode, resize sampling, thresholding, and pairing all judged
    // against an independent derivation. Pairing here is the exact
    // all-pairs join over a bounded image set; at corpus scale the
    // banding tier is q43's SimHash prefix blocking, unchanged.
    "q205_image_phash_dedup" -> { (s, dir) =>
      import s.implicits._
      val hashes = Tables.documents(s, dir)
        .filter(col("doc_id") < 40).select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val bid = id / 3
            val sh = (id % 3).toInt
            val w = 8 + (bid % 9).toInt
            val h = 8 + (bid % 7).toInt
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                // gradient SLOPES depend on the base id: aHash is
                // brightness-invariant by design, so families must differ
                // structurally (a constant-offset-only difference hashes
                // identically — measured before this fix)
                val r = ((bid * 31 + x * (7 + (bid % 5) * 2) + y * (13 + (bid % 3) * 4)) % 256 + sh).toInt % 256
                val g = ((bid * 17 + x * (3 + (bid % 4) * 2) + y * (11 + (bid % 5) * 2)) % 256 + sh).toInt % 256
                val b = ((bid * 23 + x * (5 + (bid % 3) * 2) + y * (19 + (bid % 4) * 4)) % 256 + sh).toInt % 256
                img.setRGB(x, y, (r << 16) | (g << 8) | b)
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            (id, bos.toByteArray)
          }
        }
        .mapPartitions { it =>
          it.map { case (id, bytes) =>
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            val (w, h) = (img.getWidth, img.getHeight)
            val gray = new Array[Long](64)
            var i = 0
            var sum = 0L
            while (i < 64) {
              val p = img.getRGB((i % 8) * w / 8, (i / 8) * h / 8)
              val g = (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
              gray(i) = g.toLong
              sum += g
              i += 1
            }
            val mean = sum / 64
            var hi = 0L
            var lo = 0L
            i = 0
            while (i < 64) {
              if (gray(i) >= mean) {
                if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
              }
              i += 1
            }
            PHash(id, hi, lo)
          }
        }.toDF()
      val a = hashes.select(col("doc_id").as("d1"), col("hi").as("h1"), col("lo").as("l1"))
      val b = hashes.select(col("doc_id").as("d2"), col("hi").as("h2"), col("lo").as("l2"))
      a.join(b, col("d1") < col("d2"))
        .withColumn("hamming",
          (expr("bit_count(h1 ^ h2)") + expr("bit_count(l1 ^ l2)")).cast("int"))
        .filter(col("hamming") <= 8)
        .withColumn("same_family", (expr("d1 div 3") === expr("d2 div 3")).cast("int"))
        .select("d1", "d2", "hamming", "same_family")
        .orderBy("d1", "d2")
    },

    // Frame sampling: one row per 256-byte frame, md5 fingerprint per frame —
    // the fan-out/schema shape of video frame extraction (bounded output:
    // docs with doc_id < 40).
    "q51_frame_sampling" -> { (s, dir) =>
      media(s, dir)
        .filter(col("doc_id") < 40)
        .withColumn("byte_len", octet_length(col("blob")).cast("long"))
        .withColumn("frame_id", expr("explode(sequence(0, cast((byte_len - 1) div 256 as int)))"))
        .withColumn("offset", col("frame_id").cast("long") * 256)
        .withColumn("frame_fp", md5(expr("substring(blob, cast(offset + 1 as int), 256)")))
        .select("doc_id", "kind", "frame_id", "offset", "frame_fp")
        .orderBy("doc_id", "frame_id")
    },

    // REAL audio decode through javax.sound.sampled (the JDK's actual WAV
    // codec — q128's discipline for the audio modality): per 'audio' doc a
    // deterministic 16-bit mono PCM clip renders from doc_id's sample
    // formula (windows with index % 3 == 2 are attenuated — the "silence"),
    // ENCODEs to real WAVE bytes on the executors (AudioSystem.write),
    // then a second stage DECODEs those bytes back (getAudioInputStream)
    // and extracts features: sample count, energy (sum of squares), peak
    // amplitude, and silence-gated window count (max |s| < 200 per
    // 64-sample window — the VAD/silence-trim primitive). The oracle
    // recomputes every feature arithmetically from the formula, so a hash
    // match proves the container roundtrip is lossless and the feature
    // pass reads exactly the written samples. All-integer features — no
    // float parity risk.
    "q159_audio_decode" -> { (s, dir) =>
      import s.implicits._
      val ids = media(s, dir).filter(col("kind") === "audio")
        .select(col("doc_id")).as[Long]
      val stats = ids.mapPartitions { it =>
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
        it.map { id =>
          val n = 256 + (id % 64).toInt * 4
          val samples = Array.tabulate(n) { t =>
            val base = ((id * 31 + t.toLong * 17) % 2001).toInt
            val quiet = (t / 64) % 3 == 2
            (if (quiet) (base % 256) - 128 else base - 1000).toShort
          }
          val pcm = java.nio.ByteBuffer.allocate(n * 2)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          samples.foreach(pcm.putShort)
          val in = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm.array()), fmt, n.toLong)
          val out = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(in,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
          // decode the real container back; features come from the
          // DECODED samples only
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(out.toByteArray))
          val raw = ais.readAllBytes()
          val bb = java.nio.ByteBuffer.wrap(raw)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val dec = Array.fill(raw.length / 2)(bb.getShort)
          var ss = 0L
          var peak = 0L
          dec.foreach { v =>
            ss += v.toLong * v
            if (math.abs(v.toLong) > peak) peak = math.abs(v.toLong)
          }
          val nSil = dec.indices.groupBy(_ / 64)
            .count { case (_, idx) => idx.forall(i => math.abs(dec(i).toInt) < 200) }
          AudioStats(id, dec.length.toLong, ss, peak, nSil.toLong)
        }
      }
      stats.toDF().orderBy("doc_id")
    })

  val oracles: Seq[(String, String)] = Seq(
    // Independent text-side derivation: byte i of blob == ascii(text[i]).
    "q50_media_decode_stats" ->
      """WITH m AS (
        | SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |  length(text) AS byte_len,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(range(1, 5), i -> CAST(ascii(text[i]) AS BIGINT))),
        |   (acc, b) -> acc * 256 + b) AS header,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(range(1, least(65, length(text) + 1)), i -> CAST(ascii(text[i]) AS BIGINT))),
        |   (acc, b) -> (acc * 31 + b) % 1000003) AS checksum
        | FROM documents)
        |SELECT kind, count(*) AS n_media, CAST(sum(byte_len) AS BIGINT) AS total_bytes,
        | min(header) AS min_header, max(header) AS max_header,
        | CAST(sum(checksum) AS BIGINT) / count(*) AS avg_checksum
        |FROM m
        |GROUP BY kind
        |ORDER BY kind""".stripMargin,

    // Arithmetic oracle: hash bits re-derived from the generating pixel
    // formulas (sampling, gray, mean threshold, bit packing) — decode,
    // resize, thresholding, and pairing all judged independently.
    "q205_image_phash_dedup" ->
      """WITH ids AS (SELECT doc_id AS id, doc_id // 3 AS bid, doc_id % 3 AS sh
        |             FROM documents WHERE doc_id < 40),
        |dim AS (SELECT id, bid, sh, 8 + bid % 9 AS w, 8 + bid % 7 AS h FROM ids),
        |cells AS (
        | SELECT d.id, t.i,
        |  ((d.bid * 31 + ((t.i % 8) * d.w // 8) * (7 + (d.bid % 5) * 2) + ((t.i // 8) * d.h // 8) * (13 + (d.bid % 3) * 4)) % 256 + d.sh) % 256 AS r,
        |  ((d.bid * 17 + ((t.i % 8) * d.w // 8) * (3 + (d.bid % 4) * 2) + ((t.i // 8) * d.h // 8) * (11 + (d.bid % 5) * 2)) % 256 + d.sh) % 256 AS g,
        |  ((d.bid * 23 + ((t.i % 8) * d.w // 8) * (5 + (d.bid % 3) * 2) + ((t.i // 8) * d.h // 8) * (19 + (d.bid % 4) * 4)) % 256 + d.sh) % 256 AS b
        | FROM dim d, range(0, 64) t(i)),
        |gr AS (SELECT id, i, (r + g + b) // 3 AS gray FROM cells),
        |mn AS (SELECT id, CAST(sum(gray) AS BIGINT) // 64 AS mean FROM gr GROUP BY id),
        |bits AS (SELECT g.id, g.i, CASE WHEN g.gray >= m.mean THEN 1 ELSE 0 END AS bit
        |         FROM gr g JOIN mn m ON m.id = g.id),
        |hs AS (
        | SELECT id,
        |  CAST(sum(CASE WHEN i >= 32 AND bit = 1 THEN (CAST(1 AS BIGINT) << (i - 32)) ELSE 0 END) AS BIGINT) AS hi,
        |  CAST(sum(CASE WHEN i < 32 AND bit = 1 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS lo
        | FROM bits GROUP BY id)
        |SELECT a.id AS d1, b.id AS d2,
        | CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS INTEGER) AS hamming,
        | CAST(CASE WHEN a.id // 3 = b.id // 3 THEN 1 ELSE 0 END AS INTEGER) AS same_family
        |FROM hs a JOIN hs b ON a.id < b.id
        |WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 8
        |ORDER BY d1, d2""".stripMargin,

    // Arithmetic oracle: the decode output must equal the generating pixel
    // formula — the PNG roundtrip itself is what's under test.
    "q128_image_decode" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 40),
        |px AS (
        | SELECT doc_id, CAST(8 + doc_id % 9 AS INTEGER) AS width,
        |  CAST(8 + doc_id % 7 AS INTEGER) AS height
        | FROM d),
        |s AS (
        | SELECT p.doc_id, p.width, p.height,
        |  CAST(sum((p.doc_id * 31 + x.x * 7 + y.y * 13) % 256) AS BIGINT) AS sum_r,
        |  CAST(sum((p.doc_id * 17 + x.x * 3 + y.y * 11) % 256) AS BIGINT) AS sum_g
        | FROM px p, range(0, 17) x(x), range(0, 15) y(y)
        | WHERE x.x < p.width AND y.y < p.height
        | GROUP BY 1, 2, 3),
        |rs AS (
        | SELECT p.doc_id,
        |  CAST(sum((p.doc_id * 31 + ((t.tx * p.width) // 8) * 7 + ((t2.ty * p.height) // 8) * 13) % 256) AS BIGINT) AS rs_r,
        |  CAST(sum((p.doc_id * 17 + ((t.tx * p.width) // 8) * 3 + ((t2.ty * p.height) // 8) * 11) % 256) AS BIGINT) AS rs_g
        | FROM px p, range(0, 8) t(tx), range(0, 8) t2(ty)
        | GROUP BY 1)
        |SELECT s.doc_id, s.width, s.height, s.sum_r, s.sum_g, rs.rs_r, rs.rs_g
        |FROM s JOIN rs USING (doc_id)
        |ORDER BY s.doc_id""".stripMargin,

    "q51_frame_sampling" ->
      """WITH m AS (
        | SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |  text, CAST(length(text) AS BIGINT) AS byte_len
        | FROM documents WHERE doc_id < 40),
        |f AS (
        | SELECT doc_id, kind, text,
        |  unnest(range(0, (byte_len - 1) // 256 + 1)) AS fid
        | FROM m)
        |SELECT doc_id, kind, CAST(fid AS INTEGER) AS frame_id, fid * 256 AS offset,
        | md5(substr(text, CAST(fid * 256 + 1 AS INTEGER), 256)) AS frame_fp
        |FROM f
        |ORDER BY doc_id, frame_id""".stripMargin,

    // Arithmetic oracle: the decoded-feature output must equal the
    // generating sample formula — the WAV roundtrip itself is under test.
    "q159_audio_decode" ->
      """WITH a AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 1),
        |t AS (SELECT doc_id, CAST(256 + (doc_id % 64) * 4 AS INTEGER) AS n FROM a),
        |smp AS (
        | SELECT doc_id, i AS t,
        |  CASE WHEN ((i // 64) % 3) = 2
        |   THEN ((doc_id * 31 + i * 17) % 2001) % 256 - 128
        |   ELSE (doc_id * 31 + i * 17) % 2001 - 1000 END AS s
        | FROM t, unnest(generate_series(0, n - 1)) AS u(i)),
        |w AS (SELECT doc_id, t // 64 AS win, max(abs(s)) AS mx FROM smp GROUP BY 1, 2),
        |ws AS (SELECT doc_id, count(*) FILTER (WHERE mx < 200) AS n_sil FROM w GROUP BY doc_id)
        |SELECT smp.doc_id,
        | CAST(count(*) AS BIGINT) AS n_samples,
        | CAST(sum(s * s) AS BIGINT) AS sum_sq,
        | CAST(max(abs(s)) AS BIGINT) AS peak,
        | CAST(any_value(ws.n_sil) AS BIGINT) AS n_silent_win
        |FROM smp JOIN ws USING (doc_id)
        |GROUP BY smp.doc_id
        |ORDER BY smp.doc_id""".stripMargin)
}
