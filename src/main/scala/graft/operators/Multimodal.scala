package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A record carrying an opaque media payload (the multimodal column). */
case class MediaIn(doc_id: Long, media: Array[Byte])

/** Typed metadata produced by decoding a media payload. */
case class MediaMeta(doc_id: Long, byte_len: Int, width: Int, height: Int, format: String)

/** Stubbed media codec: the image/audio libraries are not in this
  * environment, so `decode` derives metadata deterministically from the
  * bytes. The Spark-side plumbing around it — binary column, typed Dataset,
  * batched partition-wise decode — is the real, tested part; swapping this
  * object for a JNI/image-lib decoder changes nothing upstream.
  */
object FakeCodec {
  val BatchSize = 64
  def decode(m: MediaIn): MediaMeta = {
    val n = m.media.length
    MediaMeta(m.doc_id, n, n % 640 + 16, (n * 7) % 480 + 16,
      (n % 3: @unchecked) match { case 0 => "jpeg"; case 1 => "png"; case 2 => "webp" })
  }
}

/** Multimodal-column operators: opaque binary payloads + typed metadata.
  *
  * Scale notes: payload bytes stay partition-local — the decode runs as a
  * batched `mapPartitions` (the one deliberate codegen break in the library,
  * mirroring how a real vectorized decoder consumes row batches) and only the
  * small metadata columns flow onward to shuffles/aggregations. Nothing ever
  * groups or joins on the payload itself.
  */
object Multimodal {

  /** documents.text encoded as a binary media column (UTF-8 bytes stand in
    * for image bytes in this environment). */
  private def mediaTable(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(col("doc_id"), col("text").cast("binary").as("media"))

  /** Batched partition-wise "decode" of the media column → typed metadata. */
  def decodeMeta(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, d).as[MediaIn]
      .mapPartitions(_.grouped(FakeCodec.BatchSize).flatMap(_.map(FakeCodec.decode)))
      .toDF()
      .orderBy(col("doc_id"))
  }

  val decodeMetaOracle: String =
    """SELECT doc_id,
      |  cast(length(text) AS int) AS byte_len,
      |  cast(length(text) % 640 + 16 AS int) AS width,
      |  cast((length(text) * 7) % 480 + 16 AS int) AS height,
      |  CASE length(text) % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png'
      |    ELSE 'webp' END AS format
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Audio-style metadata over the fake payload: sample count, rate,
    * duration — derived deterministically from the bytes (decode stub),
    * with the Spark-side plumbing (binary column → typed metadata) real. */
  def audioMeta(spark: SparkSession, d: String): DataFrame =
    mediaTable(spark, d)
      .select(col("doc_id"),
        (length(col("media")) * 4).as("n_samples"),
        (pmod(length(col("media")), lit(3)) * 8000 + lit(16000)).cast("int").as("sample_rate"))
      .withColumn("duration_ms",
        (col("n_samples") * 1000L / col("sample_rate")).cast("long"))
      .orderBy(col("doc_id"))

  val audioMetaOracle: String =
    """SELECT doc_id,
      |  cast(length(text) * 4 AS int) AS n_samples,
      |  cast((length(text) % 3) * 8000 + 16000 AS int) AS sample_rate,
      |  (cast(length(text) * 4 AS bigint) * 1000)
      |    // ((length(text) % 3) * 8000 + 16000) AS duration_ms
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Feature extraction from the media payload: a deterministic numeric
    * feature vector in long format (doc_id, feature, value) — the stand-in
    * for an embedding model over decoded media, with real partition-wise
    * batch plumbing downstream systems would join on. */
  def features(spark: SparkSession, d: String): DataFrame = {
    val text = col("text")
    Tables.documents(spark, d)
      .select(col("doc_id"), array(
        length(text).cast("double"),
        size(split(text, " ")).cast("double"),
        length(regexp_replace(text, "[^aeiou]", "")).cast("double"),
        length(regexp_replace(text, "[^a-m]", "")).cast("double")).as("f"))
      .select(col("doc_id"), posexplode(col("f")).as(Seq("feature", "value")))
      .orderBy(col("doc_id"), col("feature"))
  }

  val featuresOracle: String =
    """SELECT doc_id, cast(i - 1 AS int) AS feature, f[i] AS value
      |FROM (
      |  SELECT doc_id,
      |    [cast(length(text) AS double),
      |     cast(len(string_split(text, ' ')) AS double),
      |     cast(length(regexp_replace(text, '[^aeiou]', '', 'g')) AS double),
      |     cast(length(regexp_replace(text, '[^a-m]', '', 'g')) AS double)] AS f,
      |    unnest(generate_series(1, 4)) AS i
      |  FROM documents)
      |ORDER BY doc_id, feature""".stripMargin

  /** REAL decode path: build spec-correct BMP/WAV payloads (deterministic
    * dimensions derived from each doc), then parse the metadata back out of
    * the actual header bytes with [[MediaCodec.decode]] — magic sniffing +
    * little-endian field extraction, no fakes. The oracle recomputes the
    * same metadata arithmetically, so a hash match proves the encode →
    * parse round trip is lossless at every row. Runs as the same batched
    * partition-local mapPartitions as the stub path: payload bytes never
    * shuffle. */
  def decodeReal(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, d)
      .select(col("doc_id"), length(col("text")).as("nc"))
      .as[(Long, Int)]
      .mapPartitions(_.grouped(FakeCodec.BatchSize).flatMap(_.map { case (id, nc) =>
        val bytes =
          if (id % 2 == 0) MediaCodec.encodeBmp(nc % 32 + 1, nc % 24 + 1, id)
          else MediaCodec.encodeWav(nc * 4, (nc % 3) * 8000 + 16000, id)
        val m = MediaCodec.decode(bytes)
        (id, bytes.length, m.format, m.width, m.height, m.sampleRate, m.nSamples)
      }))
      .toDF("doc_id", "byte_len", "format", "width", "height", "sample_rate", "n_samples")
      .orderBy(col("doc_id"))
  }

  val decodeRealOracle: String =
    """SELECT doc_id,
      |  cast(CASE WHEN doc_id % 2 = 0
      |    THEN 54 + ((((length(text) % 32 + 1) * 3 + 3) // 4) * 4)
      |           * (length(text) % 24 + 1)
      |    ELSE 44 + length(text) * 8 END AS int) AS byte_len,
      |  CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'wav' END AS format,
      |  cast(CASE WHEN doc_id % 2 = 0 THEN length(text) % 32 + 1 ELSE 0 END AS int) AS width,
      |  cast(CASE WHEN doc_id % 2 = 0 THEN length(text) % 24 + 1 ELSE 0 END AS int) AS height,
      |  cast(CASE WHEN doc_id % 2 = 0 THEN 0
      |    ELSE (length(text) % 3) * 8000 + 16000 END AS int) AS sample_rate,
      |  cast(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE length(text) * 4 END AS int) AS n_samples
      |FROM documents ORDER BY doc_id""".stripMargin

  /** REAL resize path: encode each doc's BMP, nearest-neighbor downscale
    * it ×2 with genuine pixel resampling ([[MediaCodec.resizeBmp]]), parse
    * the result back, and emit old/new dims + the re-encoded byte length.
    * The oracle recomputes the expected header metadata arithmetically, so
    * the hash match proves the full encode → resample → re-encode → parse
    * chain preserves the spec at every row. Partition-local like every
    * payload operator. */
  def resize(spark: SparkSession, d: String, factor: Int = 2): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, d)
      .select(col("doc_id"), length(col("text")).as("nc"))
      .as[(Long, Int)]
      .mapPartitions(_.grouped(FakeCodec.BatchSize).flatMap(_.map { case (id, nc) =>
        val bmp = MediaCodec.encodeBmp(nc % 32 + 1, nc % 24 + 1, id)
        val small = MediaCodec.resizeBmp(bmp, factor)
        val m = MediaCodec.decode(small)
        (id, nc % 32 + 1, nc % 24 + 1, m.width, m.height, small.length)
      }))
      .toDF("doc_id", "width", "height", "new_width", "new_height", "new_byte_len")
      .orderBy(col("doc_id"))
  }

  val resizeOracle: String =
    """SELECT doc_id,
      |  cast(length(text) % 32 + 1 AS int) AS width,
      |  cast(length(text) % 24 + 1 AS int) AS height,
      |  cast((length(text) % 32 + 1 + 1) // 2 AS int) AS new_width,
      |  cast((length(text) % 24 + 1 + 1) // 2 AS int) AS new_height,
      |  cast(54 + ((((length(text) % 32 + 1 + 1) // 2) * 3 + 3) // 4 * 4)
      |    * ((length(text) % 24 + 1 + 1) // 2) AS int) AS new_byte_len
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Frame-offset sampling over a fake video payload: every `stride`-th
    * frame index with its byte offset and timestamp. */
  def frameSample(spark: SparkSession, d: String, frameBytes: Int = 100, stride: Int = 5): DataFrame = {
    val nFrames = (length(col("media")) / frameBytes).cast("long")
    mediaTable(spark, d)
      .filter(length(col("media")) >= frameBytes)
      .select(col("doc_id"),
        explode(sequence(lit(0L), nFrames - 1, lit(stride.toLong))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        (col("frame_idx") * frameBytes).as("byte_offset"),
        round(col("frame_idx") / 25.0, 3).as("ts_sec"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  val frameSampleOracle: String =
    """SELECT doc_id, i AS frame_idx, i * 100 AS byte_offset,
      |  round(i / 25.0, 3) AS ts_sec
      |FROM (
      |  SELECT doc_id, unnest(generate_series(0, length(text) // 100 - 1, 5)) AS i
      |  FROM documents WHERE length(text) >= 100)
      |ORDER BY doc_id, frame_idx""".stripMargin

  /** WebDataset-style shard plan (`mm_shard_plan`): group media payloads
    * into ~64 KiB shards per writer task — the tar-sharding step every
    * multimodal corpus runs before training (sequential readers want
    * few-MB archives, not millions of small objects). Writer = doc_id
    * mod 8 models the independent parallel writer (the `docs_shard_skew`
    * convention), so the running-byte window partitions by writer — NO
    * global window at any corpus size — and shard = exclusive-prefix
    * bytes div target, the greedy in-order packing a streaming tar writer
    * actually performs. Payload sizes come from [[decodeReal]]'s real
    * encode→parse round trip; the oracle recomputes them arithmetically
    * from the same spec. */
  def shardPlan(spark: SparkSession, d: String, nWriters: Int = 8,
      targetBytes: Long = 65536L): DataFrame = {
    val sized = decodeReal(spark, d).select(col("doc_id"), col("byte_len"))
      .withColumn("writer", pmod(col("doc_id"), lit(nWriters.toLong)))
    val w = Window.partitionBy(col("writer")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sized
      .withColumn("cum", sum(col("byte_len")).over(w))
      .withColumn("shard", expr(s"(cum - byte_len) div $targetBytes"))
      .groupBy(col("writer"), col("shard"))
      .agg(count(lit(1)).as("n_items"), sum(col("byte_len")).as("bytes"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("writer"), col("shard"))
  }

  val shardPlanOracle: String =
    """WITH sized AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 2 = 0
      |      THEN 54 + ((((length(text) % 32 + 1) * 3 + 3) // 4) * 4)
      |             * (length(text) % 24 + 1)
      |      ELSE 44 + length(text) * 8 END AS byte_len,
      |    doc_id % 8 AS writer
      |  FROM documents),
      |c AS (
      |  SELECT *, sum(byte_len) OVER (PARTITION BY writer ORDER BY doc_id
      |    ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM sized)
      |SELECT writer, cast((cum - byte_len) // 65536 AS bigint) AS shard,
      |  count(*) AS n_items, cast(sum(byte_len) AS bigint) AS bytes,
      |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Perceptual-hash near-dup detection over the media column
    * (`mm_phash_dedup`) — the image-dedup stage of a multimodal pipeline
    * (pHash/aHash → banded index → Hamming verify). The DCT step is
    * stubbed like the rest of [[FakeCodec]]: phash = the payload's 60-bit
    * md5 digest, with every 3rd document re-entering as a PLANTED
    * "slightly edited" variant whose phash flips exactly one
    * content-chosen bit — ground truth with Hamming distance 1. The
    * INDEX is the real part and is the simhash shape: 4 bands of 15
    * bits; any pair within Hamming ≤ 3 shares an intact band
    * (pigeonhole), so candidates come from 4 equi-joins on (band_id,
    * band) — never an all-pairs scan — and the verify is one codegen'd
    * `bit_count(xor)`. Emits verified pairs with their distance and the
    * planted flag, so the report separates recall (planted found —
    * guaranteed by the band math) from organic collisions.
    *
    * The band self-join runs on the [[Dedup.MaxBandDf]]-capped bucket set:
    * on real media the common case — a family of byte-identical popular
    * images — drops the ENTIRE family into the same four buckets, making
    * Σ\|bucket\|² quadratic in family size (the exact blowup the shingle
    * df-cap prevents). [[phashBandStats]] publishes what the cap dropped;
    * at the synthetic corpus's md5-uniform band values it drops nothing. */
  private def phashBands(spark: SparkSession, d: String): DataFrame = {
    // r15: the digest rides the native md5-prefix kernel (same long as the
    // previous conv(substring(md5(...))) chain — see graft.functions.
    // Md5Prefix), and the band index is pinned: phashDedup reads it three
    // times (occupancy pass + both self-join sides) and phashRecall twice
    // more — unpinned, each read replayed the md5 pass over the corpus
    val base = Tables.documents(spark, d)
      .select(col("doc_id"),
        graft.functions.Kernels.hash60(col("text")).as("phash"))
    val planted = base.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 5000000L).as("doc_id"),
        expr("phash ^ shiftleft(1L, cast(doc_id % 60 AS int))").as("phash"))
    base.unionAll(planted)
      .select(col("doc_id"), col("phash"),
        explode(sequence(lit(0), lit(3))).as("b"))
      .select(col("doc_id"), col("phash"), col("b"),
        expr("(phash div shiftleft(1L, cast(b * 15 AS int))) % 32768").as("bv"))
      .localCheckpoint()
  }

  def phashDedup(spark: SparkSession, d: String, maxHam: Int = 3): DataFrame = {
    val bands = phashBands(spark, d)
    val keep = bands.groupBy(col("b"), col("bv"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= Dedup.MaxBandDf)
      .select(col("b"), col("bv"))
    val capped = bands.join(keep, Seq("b", "bv"))
    val cand = capped.as("x")
      .join(capped.as("y"), col("x.b") === col("y.b") &&
        col("x.bv") === col("y.bv") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.phash").as("ph_a"), col("y.phash").as("ph_b"))
      .distinct()
    cand
      .select(col("doc_a"), col("doc_b"),
        bit_count(expr("ph_a ^ ph_b")).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHam)
      .withColumn("planted", (col("doc_b") === col("doc_a") + 5000000L).cast("long"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Banded-index recall vs exact Hamming truth (`mm_phash_recall`) — the
    * recall eval every other index family publishes, closed for the media
    * family with a PIGEONHOLE GUARANTEE: a 60-bit pHash in 4×15-bit bands
    * can lose at most 3 bands to ≤3 bit flips, so every true pair shares
    * ≥1 band and the ONLY possible loss is the [[Dedup.MaxBandDf]]
    * occupancy cap — this row is the band ledger re-expressed in recall
    * units (n_dropped counts exactly the cap's casualties).
    *
    * The exact truth side is the library's ONLY all-pairs scan, so it is
    * SAMPLED BY DEFAULT (unlike the query-anchored recall rows, whose
    * truth is \|queries\|×corpus linear): the pair universe is restricted
    * to pairs whose smaller-id doc falls in a deterministic 1/`pairMod`
    * md5-hash bucket — the engine-shared [[graft.functions.Kernels.hash31]]
    * kernel, so the ORACLE applies the identical restriction and the gate
    * stays bit-exact (the xxhash64 `truthSample` convention can't be
    * mirrored in DuckDB; this row's sample rides the md5 kernel instead).
    * The recall estimand is per-pair and the sample is independent of
    * band membership, so it is unbiased; cost drops pairMod× (measured
    * 29.2 s → ~3.6 s at sf1), and pairMod is the knob that grows with the
    * corpus at 100 TB — including per-executor MEMORY: the broadcast side
    * of the theta join is the sampled subset (O(corpus/pairMod) 16-byte
    * rows), never the whole corpus. */
  def phashRecall(spark: SparkSession, d: String, maxHam: Int = 3,
      pairMod: Int = 8): DataFrame = {
    import graft.functions.Kernels.hash31
    val corpus = phashBands(spark, d).select(col("doc_id"), col("phash")).distinct()
      .localCheckpoint() // both truth sides read it
    val left = corpus
      .filter(pmod(hash31(col("doc_id").cast("string")), lit(pairMod.toLong)) === 0L)
    val right = corpus.select(col("doc_id").as("doc_b"), col("phash").as("ph_b"))
    // broadcast the SAMPLED side, never the corpus: a theta join needs one
    // broadcast side (else CartesianProduct), and building on `left` makes
    // per-executor memory O(corpus/pairMod) — governed by the same knob as
    // the pair count, so growing pairMod at 100 TB bounds BOTH
    val truth = broadcast(left)
      .join(right, col("doc_id") < col("doc_b") &&
        bit_count(expr("phash ^ ph_b")) <= maxHam)
      .agg(count(lit(1)).as("n_true_pairs"))
    val cand = phashDedup(spark, d, maxHam)
      .filter(pmod(hash31(col("doc_a").cast("string")), lit(pairMod.toLong)) === 0L)
      .agg(count(lit(1)).as("n_candidates"))
    // n_true_pairs = 0 (nothing sampled) divides by zero: Spark div → NULL,
    // DuckDB // → error; an empty truth set is vacuously 10000 bp on both
    truth.crossJoin(broadcast(cand))
      .select(col("n_true_pairs"), col("n_candidates"),
        expr("CASE WHEN n_true_pairs = 0 THEN 10000 " +
          "ELSE n_candidates * 10000 div n_true_pairs END").as("recall_bp"),
        (col("n_true_pairs") - col("n_candidates")).as("n_dropped"))
  }

  // lazy: sqlPhashBands is declared further down the file (beside the
  // dedup oracle it was factored for) and vals initialize in order
  lazy val phashRecallOracle: String = {
    import graft.functions.Kernels.sqlHash31
    val sampleA = (e: String) => s"${sqlHash31(s"cast($e AS varchar)")} % 8 = 0"
    s"""WITH $sqlPhashBands,
       |corpus2 AS (SELECT DISTINCT doc_id, phash FROM bands),
       |truth AS (
       |  SELECT count(*) AS n_true_pairs
       |  FROM corpus2 x JOIN corpus2 y
       |    ON x.doc_id < y.doc_id
       |    AND bit_count(xor(x.phash, y.phash)) <= 3
       |  WHERE ${sampleA("x.doc_id")}),
       |keep AS (SELECT b, bv FROM bands GROUP BY 1, 2
       |         HAVING count(*) <= ${Dedup.MaxBandDf}),
       |cbands AS (SELECT bands.* FROM bands JOIN keep USING (b, bv)),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM cbands x JOIN cbands y
       |    ON x.b = y.b AND x.bv = y.bv AND x.doc_id < y.doc_id
       |    AND bit_count(xor(x.phash, y.phash)) <= 3),
       |cm AS (SELECT count(*) AS n_candidates FROM cand
       |       WHERE ${sampleA("doc_a")})
       |SELECT n_true_pairs, n_candidates,
       |  CASE WHEN n_true_pairs = 0 THEN 10000
       |       ELSE n_candidates * 10000 // n_true_pairs END AS recall_bp,
       |  n_true_pairs - n_candidates AS n_dropped
       |FROM truth, cm""".stripMargin
  }

  /** Band-occupancy accounting for [[phashDedup]]'s index
    * (`mm_phash_band_stats`) — the [[Dedup.MaxBandDf]] ceiling's honest
    * ledger for the media family. */
  def phashBandStats(spark: SparkSession, d: String): DataFrame =
    Dedup.bandStatsOver(phashBands(spark, d), Seq("b", "bv"), Dedup.MaxBandDf)

  /** The band CTE chain shared by [[phashDedupOracle]] and the accounting
    * oracle. */
  private val sqlPhashBands: String =
    """base AS (
      |  SELECT doc_id,
      |    cast(('0x' || substr(md5(text), 1, 15)) AS bigint) AS phash
      |  FROM documents),
      |corpus AS (
      |  SELECT doc_id, phash FROM base
      |  UNION ALL
      |  SELECT doc_id + 5000000,
      |    xor(phash, 1::bigint << cast(doc_id % 60 AS int))
      |  FROM base WHERE doc_id % 3 = 0),
      |bands AS (
      |  SELECT doc_id, phash, b,
      |    (phash // (1::bigint << cast(b * 15 AS int))) % 32768 AS bv
      |  FROM corpus CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b) g)""".stripMargin

  val phashDedupOracle: String =
    s"""WITH $sqlPhashBands,
       |keep AS (SELECT b, bv FROM bands GROUP BY 1, 2
       |         HAVING count(*) <= ${Dedup.MaxBandDf}),
       |cbands AS (SELECT bands.* FROM bands JOIN keep USING (b, bv)),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |    x.phash AS ph_a, y.phash AS ph_b
       |  FROM cbands x JOIN cbands y
       |    ON x.b = y.b AND x.bv = y.bv AND x.doc_id < y.doc_id)
       |SELECT doc_a, doc_b,
       |  cast(bit_count(xor(ph_a, ph_b)) AS bigint) AS hamming,
       |  cast(CASE WHEN doc_b = doc_a + 5000000 THEN 1 ELSE 0 END AS bigint)
       |    AS planted
       |FROM cand WHERE bit_count(xor(ph_a, ph_b)) <= 3
       |ORDER BY doc_a, doc_b""".stripMargin

  val phashBandStatsOracle: String =
    s"""WITH $sqlPhashBands,
       |${Dedup.sqlBandStats("bands", Seq("b", "bv"), Dedup.MaxBandDf)}""".stripMargin
}
