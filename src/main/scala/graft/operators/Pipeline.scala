package graft.operators

import graft.Tables
import graft.functions.Kernels._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-pipeline operators: the selection / shaping stages a large-scale
  * training-data pipeline runs between raw crawl and tokenizer — stratified
  * downsampling, quality filtering with per-rule accounting, boilerplate
  * (shared-prefix) detection, and corpus shape histograms.
  *
  * Scale notes:
  *  - sampling and filtering decide per row from hash/column arithmetic — a
  *    single codegen'd map pass, no shuffle of document bodies; only the
  *    per-stratum/per-rule counters aggregate (shuffle volume = #groups).
  *  - boilerplate detection groups by an 128-bit prefix digest, never by
  *    text (same digest-shuffle rule as exact dedup).
  */
object Pipeline {

  /** Deterministic stratified sampling: each language stratum keeps a
    * different fraction (dominant `en` downsampled to 25%, the long tail
    * kept whole — the standard rebalancing move before training). The
    * keep/drop decision is `hash(doc_id) mod 100 < rate`: reproducible,
    * seedable, and requires no shuffle or count-first pass — at 100 TB this
    * is one map over the corpus. Emits per-stratum accounting. */
  def sampleStratified(spark: SparkSession, d: String): DataFrame = {
    val bucket = pmod(hash31(col("doc_id").cast("string")), lit(100L))
    val rate = when(col("lang") === "en", lit(25L)).otherwise(lit(100L))
    Tables.documents(spark, d)
      .select(col("lang"), length(col("text")).as("nc"),
        bucket.as("b"), rate.as("r"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("b") < col("r"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("b") < col("r"), col("nc").cast("long")).otherwise(0L)).as("kept_chars"))
      .orderBy(col("lang"))
  }

  val sampleStratifiedOracle: String = {
    val b = s"(${sqlHash31("cast(doc_id AS varchar)")}) % 100"
    """WITH m AS (
      |  SELECT lang, length(text) AS nc,
      |    BUCKET AS b,
      |    CASE WHEN lang = 'en' THEN 25 ELSE 100 END AS r
      |  FROM documents)
      |SELECT lang, count(*) AS n_total,
      |  cast(sum(CASE WHEN b < r THEN 1 ELSE 0 END) AS bigint) AS n_kept,
      |  cast(sum(CASE WHEN b < r THEN nc ELSE 0 END) AS bigint) AS kept_chars
      |FROM m GROUP BY lang ORDER BY lang""".stripMargin.replace("BUCKET", b)
  }

  /** C4-style quality filter with per-rule accounting: each doc is assigned
    * the FIRST failing rule (too_short < 30 words, too_long > 80 words,
    * low lexical diversity: distinct/total tokens < 0.45) or `kept`.
    * Emits (source, reason) counts so the pipeline's selectivity per rule
    * is observable — the metadata a real cleaning run must publish. */
  def filterClean(spark: SparkSession, d: String): DataFrame = {
    val stats = Tables.documents(spark, d)
      .select(col("doc_id"), col("source"), explode(tokens(col("text"))).as("t"))
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("nw"), countDistinct(col("t")).as("nd"))
    val reason = when(col("nw") < 30, "too_short")
      .when(col("nw") > 80, "too_long")
      .when(col("nd").cast("double") / col("nw") < 0.45, "low_diversity")
      .otherwise("kept")
    stats.select(col("source"), reason.as("reason"), col("nw"))
      .groupBy(col("source"), col("reason"))
      .agg(count(lit(1)).as("n_docs"), round(avg(col("nw")), 4).as("avg_words"))
      .orderBy(col("source"), col("reason"))
  }

  val filterCleanOracle: String =
    """WITH st AS (
      |  SELECT doc_id, source,
      |    cast(len(string_split(text, ' ')) AS bigint) AS nw,
      |    cast(len(list_distinct(string_split(text, ' '))) AS bigint) AS nd
      |  FROM documents),
      |r AS (
      |  SELECT source, nw,
      |    CASE WHEN nw < 30 THEN 'too_short'
      |         WHEN nw > 80 THEN 'too_long'
      |         WHEN cast(nd AS double) / nw < 0.45 THEN 'low_diversity'
      |         ELSE 'kept' END AS reason
      |  FROM st)
      |SELECT source, reason, count(*) AS n_docs, round(avg(nw), 4) AS avg_words
      |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Boilerplate detection: documents sharing the same leading-5-token
    * prefix (template openers). The corpus is augmented with a
    * tail-perturbed copy of every doc — same prefix, different body — the
    * construction the oracle mirrors, so every original/variant pair is a
    * planted boilerplate group. Groups by the md5 prefix digest: the
    * shuffle carries 32-byte keys, never text. */
  def prefixDups(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d).select(col("doc_id"), col("text"))
    val all = docs.unionAll(docs.select((col("doc_id") + 1000000L).as("doc_id"),
      concat(col("text"), lit(" tailx taily")).as("text")))
    all
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 5)
      .select(col("doc_id"),
        md5(concat_ws(" ", slice(col("t"), 1, 5))).as("prefix_md5"))
      .groupBy(col("prefix_md5"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"))
      .filter(col("n_docs") > 1)
      .orderBy(col("prefix_md5"))
  }

  val prefixDupsOracle: String =
    """WITH docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id+1000000, text || ' tailx taily' FROM documents),
      |p AS (
      |  SELECT doc_id,
      |    md5(array_to_string(string_split(text, ' ')[1:5], ' ')) AS prefix_md5
      |  FROM docs WHERE len(string_split(text, ' ')) >= 5)
      |SELECT prefix_md5, count(*) AS n_docs, min(doc_id) AS min_doc
      |FROM p GROUP BY 1 HAVING count(*) > 1 ORDER BY 1""".stripMargin

  /** Unigram language-model score per doc: mean ln(corpus_freq/total) over
    * the doc's tokens — the KenLM-perplexity stand-in quality filters rank
    * docs by. The corpus unigram table broadcasts (|vocabulary| entries);
    * scoring is then a map-side join + per-doc aggregate. ln of an
    * identical integer ratio is bit-identical cross-engine; the per-doc
    * mean rounds at 4dp (accumulation noise ~1e-14 ≪ half-step). */
  def unigramLogProb(spark: SparkSession, d: String): DataFrame = {
    val tok = Tables.documents(spark, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
    val freqs = tok.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val total = tok.groupBy().agg(count(lit(1)).as("total"))
    // freqs is the full vocabulary — shuffled per the no-corpus-broadcast
    // rule; the 1-row total stays a broadcast
    tok.join(freqs.hint("shuffle_hash"), "token")
      .join(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(round(avg(log(col("cnt").cast("double") / col("total"))), 4).as("avg_logprob"),
        count(lit(1)).as("n_tokens"))
      .orderBy(col("doc_id"))
  }

  val unigramLogProbOracle: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
      |freqs AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1),
      |total AS (SELECT count(*) AS total FROM tok)
      |SELECT doc_id,
      |  round(avg(ln(cast(cnt AS double) / total)), 4) AS avg_logprob,
      |  count(*) AS n_tokens
      |FROM tok JOIN freqs ON tok.token = freqs.token, total
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** PII scrubbing accounting: per source, how many docs contain
    * email-like / phone-like / IPv4-like spans and the total span count —
    * the audit record a scrub stage publishes. The corpus is augmented with
    * deterministic planted PII (every 3rd doc gains an email, every 5th a
    * phone, every 7th an IP), mirrored exactly in the oracle, so detection
    * is verified against known ground truth. Pure regex column work —
    * single codegen'd map pass. */
  def piiScrub(spark: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(spark, d).select(col("doc_id"), col("source"), col("text"))
    val planted = base.select(col("doc_id"), col("source"),
      concat(col("text"),
        when(col("doc_id") % 3 === 0, lit(" contact bob@example.com")).otherwise(lit("")),
        when(col("doc_id") % 5 === 0, lit(" call 555-867-5309")).otherwise(lit("")),
        when(col("doc_id") % 7 === 0, lit(" from 192.168.1.77")).otherwise(lit(""))).as("text"))
    val emails = size(regexp_extract_all(col("text"),
      lit("[a-z0-9.]+@[a-z0-9.]+\\.[a-z]+"), lit(0)))
    val phones = size(regexp_extract_all(col("text"),
      lit("[0-9]{3}-[0-9]{3}-[0-9]{4}"), lit(0)))
    val ips = size(regexp_extract_all(col("text"),
      lit("[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"), lit(0)))
    planted
      .select(col("source"), emails.as("ne"), phones.as("np"), ips.as("ni"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("ne") > 0, 1L).otherwise(0L)).as("docs_with_email"),
        sum(when(col("np") > 0, 1L).otherwise(0L)).as("docs_with_phone"),
        sum(when(col("ni") > 0, 1L).otherwise(0L)).as("docs_with_ip"),
        sum(col("ne") + col("np") + col("ni")).cast("long").as("total_spans"))
      .orderBy(col("source"))
  }

  val piiScrubOracle: String =
    """WITH planted AS (
      |  SELECT doc_id, source,
      |    text
      |      || CASE WHEN doc_id % 3 = 0 THEN ' contact bob@example.com' ELSE '' END
      |      || CASE WHEN doc_id % 5 = 0 THEN ' call 555-867-5309' ELSE '' END
      |      || CASE WHEN doc_id % 7 = 0 THEN ' from 192.168.1.77' ELSE '' END AS text
      |  FROM documents),
      |m AS (
      |  SELECT source,
      |    len(regexp_extract_all(text, '[a-z0-9.]+@[a-z0-9.]+\.[a-z]+')) AS ne,
      |    len(regexp_extract_all(text, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS np,
      |    len(regexp_extract_all(text, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS ni
      |  FROM planted)
      |SELECT source, count(*) AS n_docs,
      |  cast(sum(CASE WHEN ne > 0 THEN 1 ELSE 0 END) AS bigint) AS docs_with_email,
      |  cast(sum(CASE WHEN np > 0 THEN 1 ELSE 0 END) AS bigint) AS docs_with_phone,
      |  cast(sum(CASE WHEN ni > 0 THEN 1 ELSE 0 END) AS bigint) AS docs_with_ip,
      |  cast(sum(ne + np + ni) AS bigint) AS total_spans
      |FROM m GROUP BY 1 ORDER BY 1""".stripMargin

  /** Gopher-style repetition signal: the duplicate-shingle fraction per doc
    * (1 − distinct/total word-3-grams). Highly repetitive machine text
    * scores high; the filter threshold is corpus policy. Explode +
    * count/countDistinct per doc — partial-agg friendly. */
  def repetition(spark: SparkSession, d: String): DataFrame = {
    val sh = Tables.documents(spark, d)
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"),
        explode(sequence(lit(1), size(col("t")) - 2)).as("i"), col("t"))
      .select(col("doc_id"), concat_ws(" ", element_at(col("t"), col("i")),
        element_at(col("t"), col("i") + 1), element_at(col("t"), col("i") + 2)).as("s"))
    sh.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        countDistinct(col("s")).as("n_distinct"))
      .select(col("doc_id"), col("n_shingles"), col("n_distinct"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_shingles"), 4)
          .as("dup_fraction"))
      .orderBy(col("doc_id"))
  }

  val repetitionOracle: String =
    """WITH sh AS (
      |  SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
      |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i
      |        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents))
      |  WHERE len(t) >= 3)
      |SELECT doc_id, count(*) AS n_shingles,
      |  count(DISTINCT s) AS n_distinct,
      |  round(1.0 - cast(count(DISTINCT s) AS double) / count(*), 4) AS dup_fraction
      |FROM sh GROUP BY 1 ORDER BY 1""".stripMargin

  /** Gopher-style compressibility signal, redefined (r8) so it carries a
    * FULL SQL oracle: a word-dictionary compression ESTIMATE in exact
    * integer arithmetic. Model: an LZW-ish coder over whitespace tokens —
    * the first occurrence of a word costs its literal bytes plus a
    * separator (`len+1`), every repeat costs a fixed 2-byte dictionary
    * reference. `ratio_bp` = estimated/raw size in basis points; templated
    * or repetitive text (many repeated words) lands far below natural
    * prose, the same ranking the zlib ratio gives (the JVM Deflater
    * variant that shipped r2–r7 stays KAT-pinned in PipelineSpec via
    * [[deflateLen]]; zlib itself has no DuckDB analogue, which kept this
    * row rows-only through r7). Integer outputs only — no float rounding
    * at the oracle boundary. Pure per-row map via array higher-order
    * functions (no explode, no shuffle before the presentation sort):
    * linear in corpus at 100 TB. */
  def compressionRatio(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(col("doc_id"),
        length(col("text")).cast("long").as("chars"),
        split(col("text"), " ").as("toks"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("dw", array_distinct(col("toks")))
      .withColumn("n_distinct", size(col("dw")).cast("long"))
      .withColumn("dict_bytes",
        aggregate(col("dw"), lit(0L), (acc, w) => acc + length(w) + lit(1)))
      .withColumn("est_bytes",
        col("dict_bytes") + (col("n_tokens") - col("n_distinct")) * 2)
      .withColumn("ratio_bp",
        when(col("chars") === 0, lit(10000L))
          .otherwise(expr("est_bytes * 10000 div chars")))
      .select("doc_id", "chars", "n_tokens", "n_distinct", "est_bytes", "ratio_bp")
      .orderBy("doc_id")

  val compressionOracle: String =
    """WITH b AS (
      |  SELECT doc_id,
      |    CAST(length(text) AS BIGINT) AS chars,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
      |    CAST(list_sum([length(w) + 1 for w in list_distinct(string_split(text, ' '))]) AS BIGINT) AS dict_bytes
      |  FROM documents
      |)
      |SELECT doc_id, chars, n_tokens, n_distinct,
      |  dict_bytes + 2*(n_tokens - n_distinct) AS est_bytes,
      |  CAST(CASE WHEN chars = 0 THEN 10000
      |       ELSE (dict_bytes + 2*(n_tokens - n_distinct)) * 10000 // chars END AS BIGINT) AS ratio_bp
      |FROM b ORDER BY doc_id""".stripMargin

  /** Deterministic train/val/test split audit (`docs_split`): the
    * hash-bucket assignment every corpus build needs — membership decided
    * by `md5("split:" + doc_id) mod 100` (80/10/10), so it is stable
    * under corpus growth (a doc's split never changes when neighbors
    * arrive), engine-independent (the same md5 arithmetic as the shared
    * hash kernels — NOT xxhash64, which DuckDB can't reproduce), and
    * needs no global shuffle: assignment is a pure map, the audit is a
    * (source × split) partial agg plus a broadcast-back of per-source
    * totals for the share-in-basis-points column that exposes skew. */
  def splitAudit(spark: SparkSession, d: String): DataFrame = {
    import graft.functions.Kernels.hash31
    val assigned = Tables.documents(spark, d)
      .select(col("source"),
        pmod(hash31(concat(lit("split:"), col("doc_id").cast("string"))), lit(100L))
          .as("bucket"))
      .withColumn("split",
        when(col("bucket") < 80, "train").when(col("bucket") < 90, "val")
          .otherwise("test"))
    val counts = assigned.groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"))
    val totals = counts.groupBy(col("source")).agg(sum(col("n_docs")).as("total"))
    counts.join(broadcast(totals), Seq("source"))
      .withColumn("share_bp", expr("n_docs * 10000 div total"))
      .select("source", "split", "n_docs", "share_bp")
      .orderBy("source", "split")
  }

  val splitOracle: String = {
    import graft.functions.Kernels.sqlHash31
    val h = sqlHash31("concat('split:', cast(doc_id AS varchar))")
    s"""WITH a AS (
       |  SELECT source,
       |    CASE WHEN $h % 100 < 80 THEN 'train'
       |         WHEN $h % 100 < 90 THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM documents),
       |c AS (SELECT source, split, count(*) AS n_docs FROM a GROUP BY 1, 2),
       |t AS (SELECT source, sum(n_docs) AS total FROM c GROUP BY 1)
       |SELECT c.source, c.split, c.n_docs,
       |  cast(c.n_docs * 10000 // t.total AS bigint) AS share_bp
       |FROM c JOIN t ON c.source = t.source
       |ORDER BY 1, 2""".stripMargin
  }

  /** Deterministic zlib-deflate length (level 6, single stream). */
  private[graft] def deflateLen(in: Array[Byte]): Int = {
    val d = new java.util.zip.Deflater(6)
    try {
      d.setInput(in)
      d.finish()
      val buf = new Array[Byte](in.length + 64)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  /** Token-count histogram: corpus shape at a glance (decade buckets).
    * Pure map + tiny aggregate — the `n_docs × mean length` sanity numbers
    * every corpus build publishes. */
  def tokenHist(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(floor(size(tokens(col("text"))) / 10).cast("long").as("bucket"),
        size(tokens(col("text"))).cast("long").as("nw"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nw")).as("total_tokens"))
      .orderBy(col("bucket"))

  val tokenHistOracle: String =
    """SELECT len(string_split(text, ' ')) // 10 AS bucket,
      |  count(*) AS n_docs,
      |  cast(sum(len(string_split(text, ' '))) AS bigint) AS total_tokens
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  /** End-to-end pipeline accounting — the capstone composition: raw corpus
    * → C4-style quality filter (word count in [30, 80], lexical diversity
    * ≥ 0.45) → exact dedup (canonical = min doc id per md5 digest) — with
    * per-language survivor counts at every stage, the funnel table a real
    * corpus build publishes. Exact copies are PLANTED (every 5th doc
    * re-enters under a shifted id) so the dedup stage provably drops them:
    * a planted copy passes quality iff its original does, then loses the
    * canonical race. Quality is a single map pass (array functions, no
    * explode); dedup groups by the 128-bit digest via a window over
    * md5(text) — high-cardinality partitions, 32-byte keys, bodies never
    * shuffle beyond the digest grouping. */
  def pipelineE2e(spark: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(spark, d).select(col("doc_id"), col("lang"), col("text"))
    val corpus = base.unionAll(base.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 9000000L).as("doc_id"), col("lang"), col("text")))
    val t = tokens(col("text"))
    val staged = corpus.select(col("doc_id"), col("lang"), col("text"),
        size(t).cast("long").as("nw"), size(array_distinct(t)).cast("long").as("nd"))
      .withColumn("kept_q", col("nw") >= 30 && col("nw") <= 80 &&
        col("nd").cast("double") / col("nw") >= 0.45)
    val uniq = staged.filter(col("kept_q"))
      .withColumn("canon",
        min(col("doc_id")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(md5(col("text")))))
      .filter(col("doc_id") === col("canon"))
      .groupBy(col("lang")).agg(count(lit(1)).as("u"))
    staged.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_raw"),
        sum(when(col("kept_q"), 1L).otherwise(0L)).as("n_quality"))
      .join(uniq, Seq("lang"), "left")
      .select(col("lang"), col("n_raw"), col("n_quality"),
        coalesce(col("u"), lit(0L)).as("n_unique"))
      .orderBy(col("lang"))
  }

  val pipelineE2eOracle: String =
    """WITH base AS (SELECT doc_id, lang, text FROM documents),
      |corpus AS (
      |  SELECT doc_id, lang, text FROM base
      |  UNION ALL
      |  SELECT doc_id + 9000000, lang, text FROM base WHERE doc_id % 5 = 0),
      |st AS (
      |  SELECT doc_id, lang, text,
      |    cast(len(string_split(text, ' ')) AS bigint) AS nw,
      |    cast(len(list_distinct(string_split(text, ' '))) AS bigint) AS nd
      |  FROM corpus),
      |flag AS (
      |  SELECT *, (nw >= 30 AND nw <= 80 AND cast(nd AS double) / nw >= 0.45)
      |    AS kept_q FROM st),
      |kq AS (
      |  SELECT lang, doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS canon
      |  FROM flag WHERE kept_q),
      |uniq AS (SELECT lang, count(*) AS u FROM kq WHERE doc_id = canon GROUP BY 1),
      |g AS (
      |  SELECT lang, count(*) AS n_raw,
      |    cast(sum(CASE WHEN kept_q THEN 1 ELSE 0 END) AS bigint) AS n_quality
      |  FROM flag GROUP BY 1)
      |SELECT g.lang, n_raw, n_quality,
      |  cast(coalesce(u, 0) AS bigint) AS n_unique
      |FROM g LEFT JOIN uniq ON g.lang = uniq.lang
      |ORDER BY 1""".stripMargin

  /** Mixture balancing: downsample each source toward a UNIFORM target mix
    * — the data-mixing step that stops one over-crawled source from
    * dominating a training corpus. Per source s: keep rate = min(1,
    * (N/k)/n_s) expressed as an integer per-10000 threshold
    * (`min(10000, N·10000 div (k·n_s))` — exact in both engines), and a doc
    * survives when its hash bucket falls under the threshold — the same
    * deterministic hash(doc_id) decision as [[sampleStratified]], so the
    * sample is stable across runs and engines. Publishes per source the
    * before/after counts and the applied rate: one map pass + a tiny
    * per-source aggregate broadcast back; document bodies never shuffle.
    *
    * The raw table is perfectly source-balanced, so the imbalance is
    * PLANTED (src0 re-enters 4 extra times under shifted ids — an
    * over-crawled source) and mirrored in the oracle: src0's threshold
    * drops to ~1/5 while every other source keeps rate 10000/10000. */
  def mixUniform(spark: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(spark, d).select(col("source"), col("doc_id"))
    val planted = base.filter(col("source") === "src0")
      .select(col("source"), col("doc_id"),
        explode(sequence(lit(1L), lit(4L))).as("i"))
      .select(col("source"), (col("doc_id") + col("i") * 7000000L).as("doc_id"))
    val docs = base.unionAll(planted)
      .select(col("source"), pmod(hash31(col("doc_id").cast("string")), lit(10000L)).as("b"))
    val perSource = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val totals = perSource.groupBy()
      .agg(sum(col("n_docs")).as("n_total"), count(lit(1)).as("k"))
    val thresholds = perSource.join(broadcast(totals))
      .withColumn("thresh",
        least(lit(10000L), expr("n_total * 10000 div (k * n_docs)")))
      .select(col("source"), col("n_docs"), col("thresh"))
    docs.join(broadcast(thresholds), "source")
      .groupBy(col("source"))
      .agg(first(col("n_docs")).as("n_docs"),
        first(col("thresh")).as("keep_per_10k"),
        sum(when(col("b") < col("thresh"), 1L).otherwise(0L)).as("n_kept"))
      .orderBy(col("source"))
  }

  val mixUniformOracle: String = {
    val b = s"(${sqlHash31("cast(doc_id AS varchar)")}) % 10000"
    """WITH corpus AS (
      |  SELECT source, doc_id FROM documents
      |  UNION ALL
      |  SELECT source, doc_id + i * 7000000 AS doc_id
      |  FROM documents, generate_series(1, 4) g(i)
      |  WHERE source = 'src0'),
      |m AS (SELECT source, BUCKET AS b FROM corpus),
      |ps AS (SELECT source, count(*) AS n_docs FROM m GROUP BY 1),
      |tot AS (SELECT cast(sum(n_docs) AS bigint) AS n_total,
      |  count(*) AS k FROM ps),
      |th AS (
      |  SELECT source, n_docs,
      |    least(10000, n_total * 10000 // (k * n_docs)) AS thresh
      |  FROM ps, tot)
      |SELECT source, cast(max(n_docs) AS bigint) AS n_docs,
      |  cast(max(thresh) AS bigint) AS keep_per_10k,
      |  cast(sum(CASE WHEN b < thresh THEN 1 ELSE 0 END) AS bigint) AS n_kept
      |FROM m JOIN th USING (source)
      |GROUP BY 1 ORDER BY 1""".stripMargin.replace("BUCKET", b)
  }

  /** Token-budget allocation under temperature sampling — the epoch
    * planner on top of [[mixTemperature]]: given a total training budget B
    * (= the corpus's own token count here), each source's target is its
    * α=0.5 share of B; a source whose target EXCEEDS its stock must repeat
    * tokens (multi-epoch — exactly what sqrt-upweighting does to
    * low-resource sources), one whose target falls short contributes fresh
    * tokens only. Reports stock / target / fresh / repeat per source — the
    * table a data-mixing plan is reviewed on.
    *
    * All integer: stocks are exact token counts, sqrt weights are scaled
    * to bigints (the [[mixTemperature]] pattern), targets come from bigint
    * multiply-then-div, and fresh/repeat are least/greatest of bigints. */
  def tokenBudget(spark: SparkSession, d: String): DataFrame = {
    val perSource = Tables.documents(spark, d)
      .select(col("source"), size(tokens(col("text"))).cast("long").as("tok"))
      .groupBy(col("source")).agg(sum(col("tok")).as("tokens_available"))
    val scaled = perSource
      .withColumn("sq",
        floor(sqrt(col("tokens_available")) * lit(1000000.0) + lit(0.5)).cast("long"))
    val tot = scaled.groupBy()
      .agg(sum(col("sq")).as("sq_total"), sum(col("tokens_available")).as("budget"))
    scaled.join(broadcast(tot))
      .select(col("source"), col("tokens_available"),
        expr("sq * budget div sq_total").as("target_tokens"))
      .withColumn("fresh_tokens", least(col("target_tokens"), col("tokens_available")))
      .withColumn("repeat_tokens",
        greatest(col("target_tokens") - col("tokens_available"), lit(0L)))
      .orderBy(col("source"))
  }

  val tokenBudgetOracle: String =
    """WITH ps AS (
      |  SELECT source,
      |    cast(sum(len(string_split(text, ' '))) AS bigint) AS tokens_available
      |  FROM documents GROUP BY 1),
      |sc AS (
      |  SELECT source, tokens_available,
      |    cast(floor(sqrt(tokens_available) * 1000000 + 0.5) AS bigint) AS sq
      |  FROM ps),
      |tot AS (
      |  SELECT cast(sum(sq) AS bigint) AS sq_total,
      |    cast(sum(tokens_available) AS bigint) AS budget
      |  FROM sc)
      |SELECT source, tokens_available,
      |  sq * budget // sq_total AS target_tokens,
      |  least(sq * budget // sq_total, tokens_available) AS fresh_tokens,
      |  greatest(sq * budget // sq_total - tokens_available, 0) AS repeat_tokens
      |FROM sc, tot ORDER BY 1""".stripMargin

  /** Gopher-style rule audit (Rae et al. 2021, MassiveText heuristics,
    * reduced to the signals this corpus exercises): per source, how many
    * docs fail each gate — word count in [20,100], mean word length in
    * [3,10], ≥2 stopwords — plus how many pass all. A real pipeline
    * publishes exactly this rejection-reason histogram before deleting
    * anything. (On this synthetic corpus the word-length gate never fires;
    * the column stays because the audit's value is showing WHICH rules do.)
    *
    * Determinism: the mean-word-length bounds are integer
    * cross-multiplications (3·nw ≤ wordchars ≤ 10·nw) — no division
    * anywhere; word chars = n_chars − (nw−1) separators, exact. Scale:
    * one map pass over bodies, per-source integer aggregate — bodies
    * never shuffle. */
  def gopherAudit(spark: SparkSession, d: String): DataFrame = {
    val m = Tables.documents(spark, d)
      .select(col("source"), split(col("text"), " ").as("w"), col("n_chars"))
      .select(col("source"), size(col("w")).cast("long").as("nw"),
        (col("n_chars") - (size(col("w")) - 1)).as("wchars"),
        size(expr("filter(w, x -> x IN ('the', 'a'))")).cast("long").as("nstop"))
      .withColumn("ok_wc", col("nw") >= 20 && col("nw") <= 100)
      .withColumn("ok_mwl",
        col("wchars") >= lit(3L) * col("nw") && col("wchars") <= lit(10L) * col("nw"))
      .withColumn("ok_stop", col("nstop") >= 2)
    m.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("ok_wc"), 0L).otherwise(1L)).as("n_fail_wordcount"),
        sum(when(col("ok_mwl"), 0L).otherwise(1L)).as("n_fail_wordlen"),
        sum(when(col("ok_stop"), 0L).otherwise(1L)).as("n_fail_stopwords"),
        sum(when(col("ok_wc") && col("ok_mwl") && col("ok_stop"), 1L).otherwise(0L))
          .as("n_pass"))
      .orderBy(col("source"))
  }

  val gopherAuditOracle: String =
    """WITH t AS (
      |  SELECT source, string_split(text, ' ') AS w, n_chars FROM documents),
      |m AS (
      |  SELECT source, len(w) AS nw,
      |    n_chars - (len(w) - 1) AS wchars,
      |    len(list_filter(w, x -> x IN ('the', 'a'))) AS nstop
      |  FROM t),
      |f AS (
      |  SELECT source,
      |    (nw >= 20 AND nw <= 100) AS ok_wc,
      |    (wchars >= 3 * nw AND wchars <= 10 * nw) AS ok_mwl,
      |    (nstop >= 2) AS ok_stop
      |  FROM m)
      |SELECT source, count(*) AS n_docs,
      |  cast(sum(CASE WHEN ok_wc THEN 0 ELSE 1 END) AS bigint) AS n_fail_wordcount,
      |  cast(sum(CASE WHEN ok_mwl THEN 0 ELSE 1 END) AS bigint) AS n_fail_wordlen,
      |  cast(sum(CASE WHEN ok_stop THEN 0 ELSE 1 END) AS bigint) AS n_fail_stopwords,
      |  cast(sum(CASE WHEN ok_wc AND ok_mwl AND ok_stop THEN 1 ELSE 0 END) AS bigint)
      |    AS n_pass
      |FROM f GROUP BY 1 ORDER BY 1""".stripMargin

  /** Temperature-based mixture weights: w_s = n_s^α / Σ_t n_t^α with
    * α = 0.5 — the multinomial sampling rule multilingual/multi-source
    * pretraining uses to lift low-resource sources without letting the
    * over-crawled head dominate (α→1 is proportional, α→0 uniform;
    * [[mixUniform]] is the α=0 endpoint of the same knob). α is FIXED at
    * 0.5 because n^0.5 = sqrt(n) is IEEE-correctly-rounded in both
    * engines, where a general pow() is not contracted to the last ulp.
    *
    * Determinism: each sqrt is scaled to an integer (floor-form round-6),
    * so the denominator is an exact order-independent BIGINT sum — a float
    * Σ sqrt(n_t) would round differently per aggregation order. The only
    * float step is the final per-source division. Expected draws per 10k
    * samples come out of integer division — exact.
    *
    * Scale shape: one per-source count (map-side partial agg), a one-row
    * broadcast total; nothing corpus-sized moves. */
  def mixTemperature(spark: SparkSession, d: String): DataFrame = {
    val planted = Tables.documents(spark, d).select(col("source"), col("doc_id"))
      .filter(col("source") === "src0")
      .select(col("source"), col("doc_id"),
        explode(sequence(lit(1L), lit(4L))).as("i"))
      .select(col("source"), (col("doc_id") + col("i") * 7000000L).as("doc_id"))
    val perSource = Tables.documents(spark, d).select(col("source"), col("doc_id"))
      .unionAll(planted) // same over-crawled src0 as mixUniform: α must damp it
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val scaled = perSource
      .withColumn("sq", floor(sqrt(col("n_docs")) * lit(1000000.0) + lit(0.5)).cast("long"))
    val tot = scaled.groupBy().agg(sum(col("sq")).as("sq_total"))
    scaled.join(broadcast(tot))
      .select(col("source"), col("n_docs"),
        round(col("sq").cast("double") / col("sq_total"), 6).as("weight"),
        expr("sq * 10000 div sq_total").as("expected_per_10k"))
      .orderBy(col("source"))
  }

  val mixTemperatureOracle: String =
    """WITH corpus AS (
      |  SELECT source, doc_id FROM documents
      |  UNION ALL
      |  SELECT source, doc_id + i * 7000000 AS doc_id
      |  FROM documents, generate_series(1, 4) g(i)
      |  WHERE source = 'src0'),
      |ps AS (SELECT source, count(*) AS n_docs FROM corpus GROUP BY 1),
      |sc AS (
      |  SELECT source, n_docs,
      |    cast(floor(sqrt(n_docs) * 1000000 + 0.5) AS bigint) AS sq
      |  FROM ps),
      |tot AS (SELECT cast(sum(sq) AS bigint) AS sq_total FROM sc)
      |SELECT source, cast(n_docs AS bigint) AS n_docs,
      |  round(sq::DOUBLE / sq_total, 6) AS weight,
      |  sq * 10000 // sq_total AS expected_per_10k
      |FROM sc, tot ORDER BY 1""".stripMargin

  /** Sequence packing: concatenate each shard's token stream in doc order
    * and chunk it into fixed token-budget training sequences — the
    * tokenizer-feed step of an LLM pretraining pipeline. A doc belongs to
    * the sequence its FIRST token lands in (concat-then-chunk semantics:
    * docs can straddle a boundary; the report keys on starting offsets,
    * which is what the packer writes).
    *
    * Scale shape: shard = doc_id mod nShards models the independent writer
    * task (thousands at 100 TB — a parameter, not a vocabulary), so the
    * running-offset window partitions by shard and no single reducer sees
    * the corpus. All integer arithmetic → exact oracle hash. */
  def pack(spark: SparkSession, d: String, budget: Int = 2048,
      nShards: Int = 64): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    Tables.documents(spark, d)
      .select(col("doc_id"), pmod(col("doc_id"), lit(nShards.toLong)).as("shard"),
        size(tokens(col("text"))).cast("long").as("tok"))
      .withColumn("cum", sum(col("tok")).over(w))
      .withColumn("seq_id", expr(s"(cum - tok) div $budget"))
      .groupBy(col("shard"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"))
      .orderBy(col("shard"), col("seq_id"))
  }

  val packOracle: String =
    """WITH d AS (
      |  SELECT doc_id, doc_id % 64 AS shard,
      |    cast(len(string_split(text, ' ')) AS bigint) AS tok
      |  FROM documents),
      |c AS (
      |  SELECT shard, tok,
      |    sum(tok) OVER (PARTITION BY shard ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM d)
      |SELECT shard, cast((cum - tok) // 2048 AS bigint) AS seq_id,
      |  count(*) AS n_docs, cast(sum(tok) AS bigint) AS n_tokens
      |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Whole-document greedy packing (`docs_pack_greedy`) — the OTHER
    * packing discipline beside [[pack]]'s concat-then-chunk: documents are
    * never split (attention masks stay per-document — the T5/LLaMA-style
    * packer), so each training sequence holds whole docs in doc_id order
    * and closes when the next doc doesn't fit; the leftover budget is
    * PADDING, and this operator's whole point is the per-shard padding
    * ledger (`padding_bp`) a pipeline reads to choose between the two
    * disciplines. Docs longer than the budget are truncated to it
    * (occupying a full sequence).
    *
    * The fold is inherently sequential per output stream, so it runs as
    * ONE integer `aggregate` over the shard's doc-ordered token list —
    * state packed into a single long (closed_bins·10⁶ + used) — and the
    * shard is the parallelism unit exactly as in [[pack]]: a shard is one
    * writer task's worth of corpus (thousands of shards at 100 TB), so
    * the per-shard list is task-sized by construction, never corpus-sized.
    * All integer arithmetic; the oracle folds the same encoded state with
    * DuckDB's `list_reduce` (first element seeds the accumulator, which
    * equals zero closed bins + that doc). */
  def packGreedy(spark: SparkSession, d: String, budget: Int = 2048,
      nShards: Int = 64): DataFrame =
    packGreedyOver(Tables.documents(spark, d).select(col("doc_id"), col("text")),
      budget, nShards)

  /** [[packGreedy]] over an explicit (doc_id, text) frame (spec hook). */
  def packGreedyOver(docsIn: DataFrame, budget: Int = 2048,
      nShards: Int = 64): DataFrame = {
    val B = 1000000L
    val docs = docsIn
      .select(col("doc_id"), pmod(col("doc_id"), lit(nShards.toLong)).as("shard"),
        least(size(tokens(col("text"))).cast("long"), lit(budget.toLong)).as("tok"))
    docs.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tok")).as("tokens_packed"),
        array_sort(collect_list(struct(col("doc_id"), col("tok")))).as("dt"))
      .withColumn("acc", aggregate(
        transform(col("dt"), x => x.getField("tok")),
        lit(-1L),
        (acc, x) => when(acc === -1L, x)
          .when(pmod(acc, lit(B)) + x <= budget, acc + x)
          .otherwise(acc - pmod(acc, lit(B)) + lit(B) + x)))
      .withColumn("n_bins", expr(s"acc div $B") + 1L)
      .select(col("shard"), col("n_docs"), col("n_bins"), col("tokens_packed"),
        expr(s"(n_bins * $budget - tokens_packed) * 10000 " +
          s"div (n_bins * $budget)").as("padding_bp"))
      .orderBy(col("shard"))
  }

  val packGreedyOracle: String =
    """WITH d AS (
      |  SELECT doc_id, doc_id % 64 AS shard,
      |    least(cast(len(string_split(text, ' ')) AS bigint), 2048) AS tok
      |  FROM documents),
      |g AS (
      |  SELECT shard, count(*) AS n_docs,
      |    cast(sum(tok) AS bigint) AS tokens_packed,
      |    list(tok ORDER BY doc_id) AS toks
      |  FROM d GROUP BY 1),
      |f AS (
      |  SELECT shard, n_docs, tokens_packed,
      |    list_reduce(toks, (acc, x) ->
      |      CASE WHEN acc % 1000000 + x <= 2048 THEN acc + x
      |           ELSE (acc // 1000000) * 1000000 + 1000000 + x END)
      |      // 1000000 + 1 AS n_bins
      |  FROM g)
      |SELECT shard, n_docs, cast(n_bins AS bigint) AS n_bins, tokens_packed,
      |  (n_bins * 2048 - tokens_packed) * 10000 // (n_bins * 2048)
      |    AS padding_bp
      |FROM f ORDER BY shard""".stripMargin

  /** Writer-shard balance audit: when the corpus fans out to nShards
    * parallel writers by hashed doc id, how even is the split? Per shard:
    * docs, tokens, and the token load relative to a perfectly uniform
    * share (load_ratio = shard_tokens · nShards / total_tokens — 1.0 is
    * perfect). The audit that catches a skewed partitioner BEFORE a 100 TB
    * write ships 90% of the data through 3 writers. Hashing the id (not
    * `id mod n`) is the point: sequential ids mod n are uniform by
    * accident of the generator, hashed ids are uniform by construction.
    * One map pass + an \|nShards\|-row aggregate; the total broadcasts
    * back — nothing corpus-sized moves. */
  def shardSkew(spark: SparkSession, d: String, nShards: Int = 32): DataFrame = {
    import graft.functions.Kernels.hash60
    val docs = Tables.documents(spark, d)
      .select(pmod(hash60(col("doc_id").cast("string")), lit(nShards.toLong)).as("shard"),
        size(tokens(col("text"))).cast("long").as("tok"))
    val perShard = docs.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"))
    val total = perShard.groupBy().agg(sum(col("n_tokens")).as("total_tokens"))
    perShard.join(broadcast(total))
      .select(col("shard"), col("n_docs"), col("n_tokens"),
        round((col("n_tokens") * nShards).cast("double") / col("total_tokens"), 4)
          .as("load_ratio"))
      .orderBy(col("shard"))
  }

  val shardSkewOracle: String = {
    import graft.functions.Kernels.sqlHash60
    s"""WITH d AS (
       |  SELECT (${sqlHash60("cast(doc_id AS varchar)")} % 32) AS shard,
       |    cast(len(string_split(text, ' ')) AS bigint) AS tok
       |  FROM documents),
       |ps AS (
       |  SELECT shard, count(*) AS n_docs, cast(sum(tok) AS bigint) AS n_tokens
       |  FROM d GROUP BY 1),
       |t AS (SELECT cast(sum(n_tokens) AS bigint) AS total_tokens FROM ps)
       |SELECT shard, n_docs, n_tokens,
       |  round(cast(n_tokens * 32 AS double) / total_tokens, 4) AS load_ratio
       |FROM ps, t ORDER BY shard""".stripMargin
  }

  /** DSIR importance weights (`docs_dsir_weights`) — Xie et al., "Data
    * Selection for Language Models via Importance Resampling": score every
    * raw document by how target-like its HASHED n-gram feature counts are
    * under a bag-of-buckets model, log w(doc) = Σ_b c_b·(ln p̂_tgt(b) −
    * ln p̂_raw(b)), with 128 md5 unigram buckets, add-one smoothing, and
    * the `en` stratum standing in for the target corpus. The two bucket
    * distributions are 128-row aggregates (broadcast back); scoring is a
    * per-(doc,bucket) partial agg joined to those 128 rows — one corpus
    * pass, shuffle volume bounded by docs×buckets, never tokens. Per the
    * family float rule the only non-integer step is one ln per bucket of a
    * ratio of exact integer products, summed per doc and rounded to 4;
    * selection accounting (docs above the raw-vs-target break-even 0) is
    * pure integer. */
  /** The 128-row DSIR bucket-weight model — built once, consumed by the
    * per-doc scorer below and PUBLISHED to the streaming scorer
    * ([[dsirModelLocal]]). */
  private def dsirModel(spark: SparkSession, d: String, nBuckets: Int): DataFrame = {
    val toks = Tables.documents(spark, d)
      .select(col("lang"), explode(tokens(col("text"))).as("w"))
      .withColumn("b", pmod(hash31(col("w")), lit(nBuckets.toLong)))
    val raw = toks.groupBy(col("b")).agg(count(lit(1)).as("rc"))
    val tgt = toks.filter(col("lang") === "en")
      .groupBy(col("b")).agg(count(lit(1)).as("tc"))
    val model = raw.join(tgt, Seq("b"), "left")
      .select(col("b"), col("rc"), coalesce(col("tc"), lit(0L)).as("tc"))
    val totals = model.groupBy()
      .agg(sum(col("rc")).as("rn"), sum(col("tc")).as("tn"))
    model.crossJoin(broadcast(totals))
      .select(col("b"),
        log(((col("tc") + 1) * (col("rn") + nBuckets)).cast("double") /
          ((col("rc") + 1) * (col("tn") + nBuckets)).cast("double")).as("lw"))
  }

  /** Per-doc DSIR log-weights (doc_id, source, score). */
  private[graft] def dsirDocScores(spark: SparkSession, d: String,
      nBuckets: Int = 128): DataFrame = {
    val toks = Tables.documents(spark, d)
      .select(col("doc_id"), col("source"), explode(tokens(col("text"))).as("w"))
      .withColumn("b", pmod(hash31(col("w")), lit(nBuckets.toLong)))
    toks.groupBy(col("doc_id"), col("source"), col("b"))
      .agg(count(lit(1)).as("c"))
      .join(broadcast(dsirModel(spark, d, nBuckets)), "b")
      .groupBy(col("doc_id"), col("source"))
      .agg((round(sum(col("c") * col("lw")), 4) + lit(0.0)).as("score"))
  }

  /** The DSIR model as a local artifact for the streaming scorer: bucket →
    * log-weight, dense over the nBuckets range (missing buckets carry 0 —
    * a bucket unseen in the raw corpus contributes no evidence). 128
    * doubles ≈ 1 KiB whatever the corpus size; the collect IS the
    * documented model publish (the `bloomFilterWords`/`centroidMatrixLocal`
    * pattern), not a query hot path. */
  def dsirModelLocal(spark: SparkSession, d: String, nBuckets: Int = 128): Seq[Double] = {
    val m = dsirModel(spark, d, nBuckets).collect()
      .map(r => r.getLong(0).toInt -> r.getDouble(1)).toMap
    Seq.tabulate(nBuckets)(b => m.getOrElse(b, 0.0))
  }

  def dsirWeights(spark: SparkSession, d: String, nBuckets: Int = 128): DataFrame = {
    dsirDocScores(spark, d, nBuckets).groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("score") > 0, 1L).otherwise(0L)).as("n_target_like"),
        (round(avg(col("score")), 4) + lit(0.0)).as("avg_log_weight"))
      .orderBy(col("source"))
  }

  val dsirWeightsOracle: String = {
    import graft.functions.Kernels.sqlHash31
    s"""WITH toks AS (
       |  SELECT doc_id, source, lang, unnest(string_split(text, ' ')) AS w
       |  FROM documents),
       |tb AS (SELECT doc_id, source, lang, ${sqlHash31("w")} % 128 AS b FROM toks),
       |raw AS (SELECT b, count(*) AS rc FROM tb GROUP BY 1),
       |tgt AS (SELECT b, count(*) AS tc FROM tb WHERE lang = 'en' GROUP BY 1),
       |model AS (
       |  SELECT raw.b, rc, coalesce(tc, 0) AS tc
       |  FROM raw LEFT JOIN tgt ON raw.b = tgt.b),
       |tot AS (SELECT sum(rc) AS rn, sum(tc) AS tn FROM model),
       |wt AS (
       |  SELECT b, ln(cast((tc + 1) * (rn + 128) AS double) /
       |              cast((rc + 1) * (tn + 128) AS double)) AS lw
       |  FROM model, tot),
       |db AS (
       |  SELECT doc_id, source, b, count(*) AS c
       |  FROM tb GROUP BY 1, 2, 3),
       |pd AS (
       |  SELECT doc_id, source, round(sum(c * lw), 4) + 0.0 AS score
       |  FROM db JOIN wt USING (b) GROUP BY 1, 2)
       |SELECT source, count(*) AS n_docs,
       |  cast(sum(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS bigint) AS n_target_like,
       |  round(avg(score), 4) + 0.0 AS avg_log_weight
       |FROM pd GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** CCNet head/middle/tail bucketing (`docs_ccnet_buckets`) — Wenzek et
    * al.'s per-language perplexity tertiles, the split CCNet uses to keep
    * `head` (+ often `middle`) and drop `tail`: docs score under the
    * corpus bigram LM (the KenLM proxy, shared with `text_bigram_lm`),
    * and each LANGUAGE's docs split at the exact integer ranks n/3 and
    * n−n/3 of the score order (higher log-prob = less perplexed = head).
    * NO per-doc rank window: scores aggregate to a (lang, score)
    * HISTOGRAM first — round-4 score keys bound the histogram by the
    * VALUE RANGE (≈10^5 buckets), not the corpus, the same boundedness
    * argument as the quantile sketch — and the cumulative walk runs over
    * those histogram rows only. A score bucket straddling a cut keeps one
    * tier (ties share fate in both engines). Integer share accounting. */
  def ccnetBuckets(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // pinned (r15): the value-range-bounded histogram feeds the per-lang
    // totals AND the cumulative walk — unpinned, each replayed the whole
    // bigram-LM scoring pass
    val hist = TextAnalysis.bigramDocScores(spark, d)
      .groupBy(col("lang"), col("avg_logprob").as("score"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val totals = hist.groupBy(col("lang")).agg(sum(col("n")).as("n_total"))
    val w = Window.partitionBy(col("lang")).orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("cum", sum(col("n")).over(w))
      .join(broadcast(totals), "lang")
      .withColumn("cum_before", col("cum") - col("n"))
      .withColumn("tier",
        when(col("cum_before") < expr("n_total div 3"), "head")
          .when(col("cum_before") < col("n_total") - expr("n_total div 3"), "middle")
          .otherwise("tail"))
      .groupBy(col("lang"), col("tier"))
      .agg(sum(col("n")).as("n_docs"),
        max(col("score")).as("best_score"),
        min(col("score")).as("worst_score"))
      .join(broadcast(totals), "lang")
      .select(col("lang"), col("tier"), col("n_docs"),
        expr("n_docs * 10000 div n_total").as("share_bp"),
        col("best_score"), col("worst_score"))
      .orderBy(col("lang"), col("tier"))
  }

  /** Two-phase data-annealing schedule (`docs_anneal_schedule`) — the
    * midtraining anneal real pretraining runs plan from exactly these
    * inputs: phase 1 (bulk) samples every (lang, perplexity-tier) bucket
    * in proportion to its documents; phase 2 (anneal) RESTRICTS to the
    * CCNet head+middle tiers and temperature-damps the mixture at α = ½
    * (the [[mixTemperature]] convention — weight ∝ √n, micro-quantized
    * before the ratio so both engines emit identical integers). One table:
    * (phase, lang, tier, n_docs, share_bp) — the sampling plan a training
    * job executes per phase. Everything rides the shared
    * [[ccnetBuckets]] aggregation (histogram-bounded, no per-doc rank
    * window) plus two one-row broadcast totals — model-sized end to end
    * after the scorer's corpus pass. */
  def annealSchedule(spark: SparkSession, d: String): DataFrame = {
    // pin the |langs|×|tiers| bucket table (r15): unpinned, each of the four
    // branches below (two totals, two phase projections) replayed the WHOLE
    // ccnetBuckets bigram-LM scoring pipeline — 96 corpus scans for a
    // two-phase projection over a handful of rows
    val tiers = ccnetBuckets(spark, d).select(col("lang"), col("tier"), col("n_docs"))
      .localCheckpoint()
    val t1 = tiers.groupBy().agg(sum(col("n_docs")).as("tot"))
    val p1 = tiers.crossJoin(broadcast(t1))
      .select(lit(1L).as("phase"), col("lang"), col("tier"), col("n_docs"),
        expr("n_docs * 10000 div tot").as("share_bp"))
    val h = tiers.filter(col("tier") =!= "tail")
      .withColumn("sq",
        floor(sqrt(col("n_docs")) * lit(1000000.0) + lit(0.5)).cast("long"))
    val t2 = h.groupBy().agg(sum(col("sq")).as("tot2"))
    val p2 = h.crossJoin(broadcast(t2))
      .select(lit(2L).as("phase"), col("lang"), col("tier"), col("n_docs"),
        expr("sq * 10000 div tot2").as("share_bp"))
    p1.unionAll(p2).orderBy(col("phase"), col("lang"), col("tier"))
  }

  lazy val annealScheduleOracle: String =
    s"""WITH b AS (
       |  SELECT lang, tier, n_docs FROM ($ccnetBucketsOracle)),
       |t1 AS (SELECT cast(sum(n_docs) AS bigint) AS tot FROM b),
       |p1 AS (
       |  SELECT cast(1 AS bigint) AS phase, lang, tier,
       |    cast(n_docs AS bigint) AS n_docs,
       |    cast(n_docs * 10000 // tot AS bigint) AS share_bp
       |  FROM b, t1),
       |h AS (
       |  SELECT lang, tier, n_docs,
       |    cast(floor(sqrt(n_docs) * 1000000 + 0.5) AS bigint) AS sq
       |  FROM b WHERE tier != 'tail'),
       |t2 AS (SELECT cast(sum(sq) AS bigint) AS tot2 FROM h),
       |p2 AS (
       |  SELECT cast(2 AS bigint) AS phase, lang, tier,
       |    cast(n_docs AS bigint) AS n_docs,
       |    cast(sq * 10000 // tot2 AS bigint) AS share_bp
       |  FROM h, t2)
       |SELECT * FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2)
       |ORDER BY phase, lang, tier""".stripMargin

  val ccnetBucketsOracle: String =
    """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS a FROM documents),
      |uni AS (SELECT unnest(a) AS w FROM t),
      |uf AS (SELECT w, count(*) AS c1 FROM uni GROUP BY 1),
      |voc AS (SELECT count(*) AS v FROM uf),
      |bg0 AS (SELECT doc_id, lang, a, unnest(range(1, len(a))) AS i
      |        FROM t WHERE len(a) >= 2),
      |bg AS (SELECT doc_id, lang, a[i] AS w1, a[i+1] AS w2 FROM bg0),
      |bf AS (SELECT w1, w2, count(*) AS c_xy FROM bg GROUP BY 1, 2),
      |pd AS (
      |  SELECT doc_id, lang,
      |    round(avg(ln(cast(c_xy + 1 AS double) / (c1 + v))), 4) + 0.0 AS score
      |  FROM bg JOIN bf USING (w1, w2) JOIN uf ON bg.w1 = uf.w, voc
      |  GROUP BY 1, 2),
      |hist AS (SELECT lang, score, count(*) AS n FROM pd GROUP BY 1, 2),
      |tot AS (SELECT lang, sum(n) AS n_total FROM hist GROUP BY 1),
      |c AS (
      |  SELECT h.lang, score, n, n_total,
      |    sum(n) OVER (PARTITION BY h.lang ORDER BY score DESC
      |                 ROWS UNBOUNDED PRECEDING) - n AS cum_before
      |  FROM hist h JOIN tot USING (lang)),
      |tiers AS (
      |  SELECT lang, score, n, n_total,
      |    CASE WHEN cum_before < n_total // 3 THEN 'head'
      |         WHEN cum_before < n_total - n_total // 3 THEN 'middle'
      |         ELSE 'tail' END AS tier
      |  FROM c)
      |SELECT lang, tier, cast(sum(n) AS bigint) AS n_docs,
      |  cast(sum(n) * 10000 // min(n_total) AS bigint) AS share_bp,
      |  max(score) AS best_score, min(score) AS worst_score
      |FROM tiers GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Deterministic per-stratum reservoir (`docs_reservoir`): exactly k
    * docs per source, drawn uniformly by ordering each stratum on the md5
    * hash of its doc ids and keeping the k smallest — the fixed-size
    * sample an eval/debug harness wants where [[sampleStratified]]'s
    * rate-based sampler gives a fixed FRACTION. Reproducible on any
    * engine, stable under re-runs, and one-pass: the per-source rank is a
    * WindowGroupLimit (map-side bounded heaps, k rows per source reach
    * the shuffle — never a full per-stratum sort materialized). */
  def reservoir(spark: SparkSession, d: String, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"))
      .orderBy(hash31(col("doc_id").cast("string")), col("doc_id"))
    Tables.documents(spark, d)
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("pick", row_number().over(w))
      .filter(col("pick") <= k)
      .orderBy(col("source"), col("pick"))
  }

  val reservoirOracle: String = {
    import graft.functions.Kernels.sqlHash31
    s"""WITH r AS (
       |  SELECT source, doc_id, n_chars,
       |    cast(row_number() OVER (PARTITION BY source
       |      ORDER BY ${sqlHash31("cast(doc_id AS varchar)")}, doc_id) AS int) AS pick
       |  FROM documents)
       |SELECT source, doc_id, n_chars, pick
       |FROM r WHERE pick <= 5 ORDER BY source, pick""".stripMargin
  }

  /** Robust length-outlier audit (`docs_mad_outliers`) — median/MAD document
    * screening per source: the robust-statistics alternative to the 3-sigma
    * rule (`ev_anomalies`) that a curation pipeline prefers on heavy-tailed
    * length distributions, where a handful of giant documents drag the mean
    * and variance but leave the median untouched. A doc is flagged when
    * \|len − median\| > 3·MAD (MAD = median absolute deviation).
    *
    * Exactness: medians ride DOUBLED integers — `median_x2 = 2·median` is
    * always integral (exact `percentile` of ints interpolates at most a
    * half), `mad_x4 = 2·median(2·dev)`, and the flag `2·dev_x2 > 3·mad_x4`
    * is the original inequality scaled by 4 — every comparison is bigint,
    * no float threshold anywhere. Plan: two per-source exact-percentile
    * aggs (the \|sources\|-row models broadcast back onto the scan) + one
    * counting agg; at 100 TB the percentile passes swap for the log-linear
    * quantile sketch, same report schema. */
  def madOutliers(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d).select(col("source"), col("n_chars"))
    val med = docs.groupBy(col("source"))
      .agg((percentile(col("n_chars"), lit(0.5)) * 2).cast("long").as("median_x2"))
    val dev = docs.join(broadcast(med), "source")
      .select(col("source"), col("median_x2"),
        abs(col("n_chars") * 2 - col("median_x2")).as("dev_x2"))
    val mad = dev.groupBy(col("source"))
      .agg((percentile(col("dev_x2"), lit(0.5)) * 2).cast("long").as("mad_x4"))
    dev.join(broadcast(mad), "source")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("median_x2")).as("median_x2"),
        max(col("mad_x4")).as("mad_x4"),
        sum(when(col("dev_x2") * 2 > col("mad_x4") * 3, 1L).otherwise(0L))
          .as("n_outliers"))
      .select(col("source"), col("n_docs"), col("median_x2"), col("mad_x4"),
        col("n_outliers"),
        expr("n_outliers * 10000 div n_docs").as("outlier_bp"))
      .orderBy(col("source"))
  }

  /** Per-doc stage attribution for the FULL training-data funnel —
    * quality filter → exact dedup → near-dup clusters → eval-set
    * decontamination — the composition a corpus build actually runs
    * (`docs_pipeline_e2e` chains the first two stages; this threads all
    * four through ONE corpus so the stage interfaces — digest
    * conventions, id spaces, survivor sets — are exercised together).
    * Returns (doc_id, source, stage) where stage ∈ quality / exact /
    * neardup / contam / kept = the FIRST stage that drops the doc;
    * [[pipelineFull]] publishes the per-source funnel table and
    * Round10Spec pins planted docs dropping at exactly their stage.
    *
    * The corpus plants one family per stage: every 5th non-eval doc
    * re-enters verbatim (+9 000 000 — loses the exact-canonical race
    * iff its original passes quality), every 7th re-enters with a
    * `zqdup` token PREPENDED (+7 000 000 — not an exact copy, but
    * 3-shingle Jaccard n/(n+2) ≥ 0.5, so it pairs with its original and
    * loses the cluster-canonical race), and every eval doc (doc_id
    * % 97 = 0, HELD OUT of the corpus) re-enters verbatim (+5 000 000 —
    * unique in-corpus, survives both dedups, then every shingle hits
    * the eval Bloom filter).
    *
    * Scale shape per stage: quality is one map pass; exact dedup groups
    * 128-bit digests (bodies never shuffle); near-dup pairs ride the
    * df-capped inverted index (Σdf² ≤ maxDf·|index|, lang-blocked) into
    * BSP connected components over edge endpoints only; decontamination
    * probes a BROADCAST m-bit Bloom filter built from the held-out eval
    * shingles (k=2 from one md5), so the surviving corpus is never
    * joined against the eval set row-for-row. */
  /** The planted-family corpus [[pipelineFullStages]] runs over — public so
    * the streaming ingest-funnel parity spec can feed the SAME corpus
    * through [[graft.streaming.StreamOps.ingestFunnelStream]]. */
  def fullCorpus(spark: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(spark, d)
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
    val evalDocs = base.filter(pmod(col("doc_id"), lit(97L)) === 0)
    val nonEval = base.filter(pmod(col("doc_id"), lit(97L)) =!= 0)
    nonEval
      .unionAll(nonEval.filter(col("doc_id") % 5 === 0).select(
        (col("doc_id") + 9000000L).as("doc_id"), col("source"), col("lang"), col("text")))
      .unionAll(nonEval.filter(col("doc_id") % 7 === 0).select(
        (col("doc_id") + 7000000L).as("doc_id"), col("source"), col("lang"),
        concat(lit("zqdup "), col("text")).as("text")))
      .unionAll(evalDocs.select((col("doc_id") + 5000000L).as("doc_id"),
        col("source"), col("lang"), col("text")))
  }

  def pipelineFullStages(spark: SparkSession, d: String,
      maxDf: Int = Dedup.MaxShingleDf): DataFrame = {
    val mBits = 65536L
    val base = Tables.documents(spark, d)
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
    val evalDocs = base.filter(pmod(col("doc_id"), lit(97L)) === 0)
    val corpus = fullCorpus(spark, d)
    val t = tokens(col("text"))
    // stage 1: quality (same rule as docs_pipeline_e2e)
    val staged = corpus.select(col("doc_id"), col("source"), col("lang"), col("text"),
        size(t).cast("long").as("nw"), size(array_distinct(t)).cast("long").as("nd"))
      .withColumn("kept_q", col("nw") >= 30 && col("nw") <= 80 &&
        col("nd").cast("double") / col("nw") >= 0.45)
      .localCheckpoint()
    // stage 2: exact dedup (canonical = min doc id per md5 digest)
    val canon = staged.filter(col("kept_q"))
      .withColumn("canon", min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(md5(col("text")))))
      .select(col("doc_id"), col("source"), col("lang"), col("text"), col("canon"))
      .localCheckpoint()
    val e = canon.filter(col("doc_id") === col("canon"))
    // stage 3: near-dup clusters over the exact survivors — df-capped
    // inverted index, lang-blocked, integer-count Jaccard ≥ 0.5, BSP
    // components labeled by component-minimum id
    val sh0 = e.select(col("doc_id"), col("lang"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), col("lang"), col("t"),
        explode(sequence(lit(1), size(col("t")) - 2)).as("i"))
      .select(col("doc_id"), col("lang"), concat_ws(" ",
        element_at(col("t"), col("i")), element_at(col("t"), col("i") + 1),
        element_at(col("t"), col("i") + 2)).as("s"))
      .distinct()
    val keepSh = sh0.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select(col("s"))
    // shuffle_hash on every corpus-derived side (shingle postings, sizes,
    // component labels) — the no-corpus-broadcast family rule (see
    // Dedup.jaccardConfirm)
    val sh = sh0.join(keepSh.hint("shuffle_hash"), "s").localCheckpoint()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val pairs = sh.select(col("doc_id").as("doc_a"), col("s"), col("lang"))
      .hint("shuffle_hash")
      .join(sh.select(col("doc_id").as("doc_b"), col("s"), col("lang"))
        .hint("shuffle_hash"), Seq("s", "lang"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n_common"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("n_a"))
        .hint("shuffle_hash"), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("n_b"))
        .hint("shuffle_hash"), "doc_b")
      .filter(round(col("n_common").cast("double") /
        (col("n_a") + col("n_b") - col("n_common")), 4) >= 0.5)
      .select(col("doc_a"), col("doc_b"))
    val labels = Dedup.connectedComponentsOfEdges(pairs)
    val nd = e.join(labels.hint("shuffle_hash"), Seq("doc_id"), "left")
      .filter(col("label").isNull || col("doc_id") === col("label"))
      .select(col("doc_id"), col("text"))
    // stage 4: decontamination — broadcast Bloom filter over the held-out
    // eval set's distinct shingles; a doc drops when ≥ half its shingles hit
    val es = evalDocs.select(tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("t"), explode(sequence(lit(1), size(col("t")) - 2)).as("i"))
      .select(concat_ws(" ", element_at(col("t"), col("i")),
        element_at(col("t"), col("i") + 1), element_at(col("t"), col("i") + 2)).as("s"))
      .distinct()
    val eh = es.select(pmod(hash60(col("s")), lit(mBits)).as("p"))
      .unionAll(es.select(pmod(hash60b(col("s")), lit(mBits)).as("p")))
    val filt = eh.select(expr("p div 62").as("word"),
        expr("shiftleft(cast(1 AS bigint), cast(p % 62 AS int))").as("mask"))
      .groupBy(col("word")).agg(expr("bit_or(mask)").as("bits"))
    val probe = nd.select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(1), size(col("t")) - 2)).as("i"))
      .select(col("doc_id"), concat_ws(" ", element_at(col("t"), col("i")),
        element_at(col("t"), col("i") + 1), element_at(col("t"), col("i") + 2)).as("s"))
      .distinct()
      .select(col("doc_id"),
        pmod(hash60(col("s")), lit(mBits)).as("p1"),
        pmod(hash60b(col("s")), lit(mBits)).as("p2"))
    val contam = probe
      .join(broadcast(filt.select(col("word").as("w1"), col("bits").as("b1"))),
        expr("p1 div 62") === col("w1"), "left")
      .join(broadcast(filt.select(col("word").as("w2"), col("bits").as("b2"))),
        expr("p2 div 62") === col("w2"), "left")
      .select(col("doc_id"),
        when(col("b1").isNotNull &&
          expr("b1 & shiftleft(cast(1 AS bigint), cast(p1 % 62 AS int))") =!= 0L &&
          col("b2").isNotNull &&
          expr("b2 & shiftleft(cast(1 AS bigint), cast(p2 % 62 AS int))") =!= 0L,
          1L).otherwise(0L).as("hit"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sh"), sum(col("hit")).as("n_flagged"))
      .filter(col("n_flagged") * 2 >= col("n_sh"))
      .select(col("doc_id"), lit(true).as("contaminated"))
    // every verdict frame (canon, labels, contam) is corpus-cardinality —
    // shuffle_hash, never broadcast
    staged.select(col("doc_id"), col("source"), col("kept_q"))
      .join(canon.select(col("doc_id"), col("canon")).hint("shuffle_hash"),
        Seq("doc_id"), "left")
      .join(labels.withColumnRenamed("label", "ndlabel").hint("shuffle_hash"),
        Seq("doc_id"), "left")
      .join(contam.hint("shuffle_hash"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        when(!col("kept_q"), "quality")
          .when(col("doc_id") =!= col("canon"), "exact")
          .when(col("ndlabel").isNotNull && col("doc_id") =!= col("ndlabel"), "neardup")
          .when(coalesce(col("contaminated"), lit(false)), "contam")
          .otherwise("kept").as("stage"))
  }

  /** The per-source funnel table over [[pipelineFullStages]]
    * (`docs_pipeline_full`): raw docs and survivors after each of the
    * four stages — the table a real corpus build publishes, with every
    * planted family provably dropping at its own stage (oracle-pinned
    * per source; Round10Spec pins individual planted docs). Columns are
    * cumulative survivor counts, so each is ≤ its predecessor. */
  def pipelineFull(spark: SparkSession, d: String): DataFrame =
    pipelineFullStages(spark, d)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_raw"),
        sum(when(col("stage") =!= "quality", 1L).otherwise(0L)).as("n_quality"),
        sum(when(!col("stage").isin("quality", "exact"), 1L).otherwise(0L)).as("n_exact"),
        sum(when(col("stage").isin("contam", "kept"), 1L).otherwise(0L)).as("n_neardup"),
        sum(when(col("stage") === "kept", 1L).otherwise(0L)).as("n_clean"))
      .orderBy(col("source"))

  val pipelineFullOracle: String =
    s"""WITH RECURSIVE base AS (SELECT doc_id, source, lang, text FROM documents),
       |ev AS (SELECT doc_id, source, lang, text FROM base WHERE doc_id % 97 = 0),
       |ne AS (SELECT doc_id, source, lang, text FROM base WHERE doc_id % 97 != 0),
       |corpus AS (
       |  SELECT doc_id, source, lang, text FROM ne
       |  UNION ALL
       |  SELECT doc_id + 9000000, source, lang, text FROM ne WHERE doc_id % 5 = 0
       |  UNION ALL
       |  SELECT doc_id + 7000000, source, lang, 'zqdup ' || text FROM ne WHERE doc_id % 7 = 0
       |  UNION ALL
       |  SELECT doc_id + 5000000, source, lang, text FROM ev),
       |st AS (
       |  SELECT doc_id, source, lang, text,
       |    cast(len(string_split(text, ' ')) AS bigint) AS nw,
       |    cast(len(list_distinct(string_split(text, ' '))) AS bigint) AS nd
       |  FROM corpus),
       |flag AS (
       |  SELECT *, (nw >= 30 AND nw <= 80 AND cast(nd AS double) / nw >= 0.45)
       |    AS kept_q FROM st),
       |canon AS (
       |  SELECT doc_id, source, lang, text,
       |    min(doc_id) OVER (PARTITION BY md5(text)) AS canon
       |  FROM flag WHERE kept_q),
       |e AS (SELECT * FROM canon WHERE doc_id = canon),
       |sh0 AS (
       |  SELECT DISTINCT doc_id, lang, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
       |  FROM (SELECT doc_id, lang, t, unnest(generate_series(1, len(t)-2)) AS i
       |        FROM (SELECT doc_id, lang, string_split(text, ' ') AS t FROM e)) tok),
       |keep AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) <= ${Dedup.MaxShingleDf}),
       |sh AS (SELECT sh0.* FROM sh0 JOIN keep USING (s)),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |prs AS (
       |  SELECT p.doc_id AS doc_a, q.doc_id AS doc_b, count(*) AS n_common
       |  FROM sh p JOIN sh q ON p.s = q.s AND p.lang = q.lang AND p.doc_id < q.doc_id
       |  GROUP BY 1, 2),
       |jp AS (
       |  SELECT doc_a, doc_b FROM prs
       |  JOIN sizes sa ON sa.doc_id = doc_a
       |  JOIN sizes sb ON sb.doc_id = doc_b
       |  WHERE round(cast(n_common AS double) / (sa.n + sb.n - n_common), 4) >= 0.5),
       |edges AS (SELECT doc_a AS u, doc_b AS v FROM jp
       |  UNION SELECT doc_b, doc_a FROM jp),
       |reach(u, v) AS (
       |  SELECT u, v FROM edges
       |  UNION SELECT r.u, g.v FROM reach r JOIN edges g ON r.v = g.u),
       |comp AS (SELECT u, least(u, min(v)) AS label FROM reach GROUP BY u),
       |ndkeep AS (
       |  SELECT e.doc_id, e.text FROM e
       |  LEFT JOIN comp ON comp.u = e.doc_id
       |  WHERE comp.label IS NULL OR comp.label = e.doc_id),
       |es AS (
       |  SELECT DISTINCT t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
       |  FROM (SELECT t, unnest(generate_series(1, len(t)-2)) AS i
       |        FROM (SELECT string_split(text, ' ') AS t FROM ev))),
       |eh AS (
       |  SELECT (${sqlHash60("s")} % 65536) AS p FROM es
       |  UNION ALL
       |  SELECT (${sqlHash60b("s")} % 65536) AS p FROM es),
       |filt AS (
       |  SELECT p // 62 AS word,
       |    bit_or(cast(1 AS bigint) << cast(p % 62 AS int)) AS bits
       |  FROM eh GROUP BY 1),
       |ts AS (
       |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
       |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i
       |        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM ndkeep))),
       |probe AS (
       |  SELECT doc_id,
       |    (${sqlHash60("s")} % 65536) AS p1,
       |    (${sqlHash60b("s")} % 65536) AS p2
       |  FROM ts),
       |fl AS (
       |  SELECT doc_id,
       |    CASE WHEN f1.bits IS NOT NULL
       |      AND (f1.bits & (cast(1 AS bigint) << cast(p1 % 62 AS int))) != 0
       |      AND f2.bits IS NOT NULL
       |      AND (f2.bits & (cast(1 AS bigint) << cast(p2 % 62 AS int))) != 0
       |    THEN 1 ELSE 0 END AS hit
       |  FROM probe
       |  LEFT JOIN filt f1 ON f1.word = p1 // 62
       |  LEFT JOIN filt f2 ON f2.word = p2 // 62),
       |contam AS (SELECT doc_id FROM fl GROUP BY 1 HAVING 2 * sum(hit) >= count(*)),
       |stagecol AS (
       |  SELECT f.doc_id, f.source,
       |    CASE WHEN NOT f.kept_q THEN 'quality'
       |         WHEN f.doc_id != c.canon THEN 'exact'
       |         WHEN cm.label IS NOT NULL AND cm.label != f.doc_id THEN 'neardup'
       |         WHEN ct.doc_id IS NOT NULL THEN 'contam'
       |         ELSE 'kept' END AS stage
       |  FROM flag f
       |  LEFT JOIN canon c ON c.doc_id = f.doc_id
       |  LEFT JOIN comp cm ON cm.u = f.doc_id
       |  LEFT JOIN contam ct ON ct.doc_id = f.doc_id)
       |SELECT source, count(*) AS n_raw,
       |  cast(sum(CASE WHEN stage != 'quality' THEN 1 ELSE 0 END) AS bigint) AS n_quality,
       |  cast(sum(CASE WHEN stage NOT IN ('quality', 'exact') THEN 1 ELSE 0 END) AS bigint) AS n_exact,
       |  cast(sum(CASE WHEN stage IN ('contam', 'kept') THEN 1 ELSE 0 END) AS bigint) AS n_neardup,
       |  cast(sum(CASE WHEN stage = 'kept' THEN 1 ELSE 0 END) AS bigint) AS n_clean
       |FROM stagecol GROUP BY 1 ORDER BY 1""".stripMargin

  val madOutliersOracle: String =
    """WITH med AS (
      |  SELECT source,
      |    cast(quantile_cont(n_chars, 0.5) * 2 AS bigint) AS median_x2
      |  FROM documents GROUP BY 1),
      |dev AS (
      |  SELECT d.source, abs(n_chars * 2 - median_x2) AS dev_x2, median_x2
      |  FROM documents d JOIN med ON d.source = med.source),
      |mad AS (
      |  SELECT source, cast(quantile_cont(dev_x2, 0.5) * 2 AS bigint) AS mad_x4
      |  FROM dev GROUP BY 1)
      |SELECT dev.source, count(*) AS n_docs,
      |  max(median_x2) AS median_x2, max(mad.mad_x4) AS mad_x4,
      |  cast(sum(CASE WHEN dev_x2 * 2 > mad.mad_x4 * 3 THEN 1 ELSE 0 END)
      |    AS bigint) AS n_outliers,
      |  cast(sum(CASE WHEN dev_x2 * 2 > mad.mad_x4 * 3 THEN 1 ELSE 0 END)
      |    * 10000 // count(*) AS bigint) AS outlier_bp
      |FROM dev JOIN mad ON dev.source = mad.source
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Duplicate down-weighting (`docs_softdedup`) — the soft alternative to
    * dropping duplicates: every document in an exact-duplicate group of
    * size g keeps training weight 1/g (so each distinct text contributes
    * exactly one document's worth of gradient no matter how many copies
    * the crawl found), published per source as integer ×10 000 effective
    * sizes (`10000 div g` — exact on both engines, no float weights). The
    * table a corpus build reads to decide between hard dedup and
    * down-weighting: n_docs vs eff_docs_x10k is the duplication tax, and
    * eff_chars_x10k re-prices the token budget under soft weights.
    *
    * Scale: groups ride the md5 digest window (digest-shuffle discipline —
    * text bodies never shuffle, the window partitions by the 128-bit
    * digest), then one per-source counting agg. */
  def softDedup(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Tables.documents(spark, d)
      .select(col("doc_id"), col("source"), col("n_chars"), col("text"))
    // the corpus re-entry plant the dedup family uses: docs with id ≡ 3
    // (mod 7) come back verbatim and id ≡ 10 (mod 91) twice, so weight
    // groups of size 2 and 3 exist at every SF — moduli coprime to the
    // 20-way source assignment, so every source carries weighted groups
    val corpus = base
      .unionAll(base.filter(col("doc_id") % 7 === 3))
      .unionAll(base.filter(col("doc_id") % 91 === 10))
    val g = corpus
      .select(col("source"), col("n_chars"),
        count(lit(1)).over(Window.partitionBy(md5(col("text")))).as("g"))
    g.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("g") > 1, 1L).otherwise(0L)).as("n_dup_docs"),
        sum(expr("10000 div g")).as("eff_docs_x10k"),
        sum(col("n_chars")).as("chars"),
        sum(col("n_chars") * expr("10000 div g")).as("eff_chars_x10k"))
      .orderBy(col("source"))
  }

  val softDedupOracle: String =
    """WITH corpus AS (
      |  SELECT source, n_chars, text FROM documents
      |  UNION ALL
      |  SELECT source, n_chars, text FROM documents WHERE doc_id % 7 = 3
      |  UNION ALL
      |  SELECT source, n_chars, text FROM documents WHERE doc_id % 91 = 10),
      |g AS (
      |  SELECT source, n_chars,
      |    count(*) OVER (PARTITION BY md5(text)) AS g
      |  FROM corpus)
      |SELECT source, count(*) AS n_docs,
      |  cast(sum(CASE WHEN g > 1 THEN 1 ELSE 0 END) AS bigint) AS n_dup_docs,
      |  cast(sum(10000 // g) AS bigint) AS eff_docs_x10k,
      |  cast(sum(n_chars) AS bigint) AS chars,
      |  cast(sum(n_chars * (10000 // g)) AS bigint) AS eff_chars_x10k
      |FROM g GROUP BY 1 ORDER BY 1""".stripMargin

  /** Hashed linear quality classifier (`docs_quality_classifier`) — the
    * fastText-style model-based filter stage (FineWeb-Edu / DCLM style:
    * score every document with a cheap linear classifier, keep the top
    * bands). Feature hashing: token → md5 → bucket (mod [[ClassifierBuckets]]);
    * the per-bucket weight here is derived arithmetically from the bucket id
    * (Knuth multiplicative hash mod 2048 — a deterministic stand-in the
    * oracle can recompute; a trained model would broadcast a
    * [[ClassifierBuckets]]-long weight array instead, changing nothing in
    * the plan shape). Doc score = mean bucket weight, reported as the
    * integer band `(10·Σw) div (2048·n)` ∈ [0,9] so the keep decision
    * (band ≥ 5) is exact integer arithmetic on both engines — no float
    * threshold to diverge over.
    *
    * Scale: one codegen'd map pass per token (hash + weight, no vocab
    * table), partial-agg to (doc, source) then to (source, band) — shuffle
    * volume is per-doc counters then |sources|·10 rows; document bodies
    * never shuffle. The published table is the per-source score histogram a
    * corpus build reads to pick its keep threshold. */
  val ClassifierBuckets = 1024

  def qualityClassifier(spark: SparkSession, d: String): DataFrame = {
    val w = Tables.documents(spark, d)
      .select(col("doc_id"), col("source"),
        explode(tokens(col("text"))).as("t"))
      // first 8 md5 hex digits == the top 32 bits of the 60-bit prefix, so
      // the bucket rides the native md5prefix kernel (r16; was the per-token
      // conv(substring(md5)) hex-string chain — the r15 straggler sweep)
      .select(col("doc_id"), col("source"),
        (shiftright(graft.functions.Kernels.hash60(col("t")), 28)
          % ClassifierBuckets).as("bucket"))
      .select(col("doc_id"), col("source"),
        ((col("bucket") * lit(2654435761L)) % 2048).as("w"))
    w.groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_tok"), sum(col("w")).as("s"))
      .select(col("source"),
        expr("(10 * s) div (2048 * n_tok)").as("score_band"), col("n_tok"))
      .groupBy(col("source"), col("score_band"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .select(col("source"), col("score_band"), col("n_docs"),
        col("n_tokens"), (col("score_band") >= 5).cast("long").as("kept"))
      .orderBy(col("source"), col("score_band"))
  }

  val qualityClassifierOracle: String =
    s"""WITH tok AS (
       |  SELECT doc_id, source,
       |    cast(('0x' || substr(md5(t), 1, 8)) AS bigint) % $ClassifierBuckets
       |      AS bucket
       |  FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS t
       |        FROM documents)),
       |scored AS (
       |  SELECT doc_id, source, count(*) AS n_tok,
       |    sum((bucket * 2654435761) % 2048) AS s
       |  FROM tok GROUP BY 1, 2),
       |banded AS (
       |  SELECT source, (10 * s) // (2048 * n_tok) AS score_band, n_tok
       |  FROM scored)
       |SELECT source, cast(score_band AS bigint) AS score_band,
       |  count(*) AS n_docs, cast(sum(n_tok) AS bigint) AS n_tokens,
       |  cast(score_band >= 5 AS bigint) AS kept
       |FROM banded GROUP BY source, score_band ORDER BY 1, 2""".stripMargin
}
