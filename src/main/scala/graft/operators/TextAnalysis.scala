package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.{Q, Tables}
import graft.functions.Kernels
import graft.functions.Portable._

/** Text-analysis operators for a large-scale training-data pipeline, over
  * the `documents` table: token statistics, quality scoring + the
  * composite Gopher filter, language-ID (marker-token heuristic), content
  * fingerprinting, mixture sampling, sequence packing, the per-source
  * funnel report, vocabulary statistics, token-rarity scoring,
  * integer-exact lexical diversity (t12), per-source top-K capping
  * (t15) and integer-exact importance resampling to a target mixture
  * (t16, the DSIR shape).
  *
  * Scale design: the per-document operators (t01–t07, t12) are single
  * narrow projections or one-pass typed kernels — no shuffle, no driver
  * state —
  * running at parquet-scan speed; the corpus-level ones shuffle only
  * what their semantics require (t08 one window per shard, t09 a dedup
  * window + rollup over kernel output, t10/t11 a map-side-partial
  * frequency aggregation and a shuffle-hash frequency join). Pruning
  * reaches the scan: each query reads only the columns it names.
  */
object TextAnalysis {

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)

  /** Fixture root for the planted blocklist (the CompendiumQueries
    * convention). */
  private val fixtures =
    sys.env.getOrElse("GRAFT_FIXTURES_DIR", "/root/repo/fixtures")

  /** Shared SQL fragment for the oracle: whitespace tokens sans empties. */
  private val sqlToks = "list_filter(string_split(text, ' '), t -> t <> '')"

  /** t17's chunk geometry — ONE definition for the Catalyst form, the
    * streaming kernel ([[graft.streaming.DocumentStreams.chunked]]) and
    * the oracle SQL, so turning the knob can't desynchronize them.
    * S < C is load-bearing: it guarantees the last chunk start < n,
    * hence every chunk non-empty.
    */
  private[graft] val ChunkC = 64
  private[graft] val ChunkS = 48

  // Language marker tokens. The scores are plain multiset counts so the
  // heuristic is expressible identically in both engines; ties break by the
  // fixed en > es > fr > de > zh priority, zero marker hits → 'und'.
  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "is", "of", "and"),
    "es" -> Seq("el", "la", "de", "es", "y"),
    "fr" -> Seq("le", "la", "de", "est", "et"),
    "de" -> Seq("der", "die", "das", "ist", "und"),
    "zh" -> Seq("的", "是", "在", "了", "和"))

  /** Quality-signal + rule-chain SQL (CTE `v`) — the oracle twin of
    * [[qualityFilterOf]], shared by t06 (the per-doc verdicts) and t09
    * (the per-source funnel that consumes them).
    */
  private val sqlQualityChain =
    s"""t AS (SELECT doc_id, lang, source, text, $sqlToks AS toks FROM documents),
      |s AS (SELECT doc_id, lang, source, text,
      |  len(toks)::BIGINT AS n_words,
      |  CASE WHEN len(toks) > 0 THEN
      |    list_aggregate(list_transform(toks, x -> len(x)), 'sum') * 1.0 / len(toks)
      |  END AS mean_word_len,
      |  CASE WHEN length(text) > 0 THEN
      |    length(regexp_replace(text, '[^a-z]', '', 'g')) * 1.0 / length(text)
      |  END AS alpha_ratio,
      |  CASE WHEN len(toks) > 0 THEN
      |    len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','it'))) * 1.0 / len(toks)
      |  END AS stop_frac,
      |  CASE WHEN len(toks) >= 2 THEN
      |    1 - len(list_distinct(list_transform(range(1, len(toks)),
      |      i -> toks[i] || ' ' || toks[i+1]))) * 1.0 / (len(toks) - 1)
      |  END AS dup_bigram_frac
      |FROM t),
      |v AS (SELECT *,
      |  CASE WHEN n_words < 20 THEN 'too_short'
      |       WHEN n_words > 10000 THEN 'too_long'
      |       WHEN mean_word_len < 2 OR mean_word_len > 12 THEN 'word_length'
      |       WHEN alpha_ratio < 0.55 THEN 'symbol_heavy'
      |       WHEN stop_frac < 0.01 THEN 'no_stopwords'
      |       WHEN dup_bigram_frac > 0.1 THEN 'repetitive'
      |       ELSE NULL END AS drop_reason
      |  FROM s)""".stripMargin

  /** The mixture policy — md5 slot per document and per-language rate
    * threshold (slots of 1000) — defined ONCE and shared by t07 (the
    * sampler) and t09 (the funnel's mixture stage), so the two can never
    * silently diverge on a rate edit.
    */
  private val mixSlot: Column =
    h60(concat(lit("mix_"), col("doc_id").cast("string"))) % 1000

  private val mixThreshold: Column =
    when(col("lang") === "en", 1000L)
      .when(col("lang") === "es", 500L)
      .when(col("lang") === "fr", 500L)
      .when(col("lang") === "de", 250L)
      .when(col("lang") === "zh", 100L)
      .otherwise(50L)

  /** t20's redaction classes — ONE definition for both engines. Word-
    * boundary alternations (RE2 and java.util.regex agree on `\b`);
    * production replaces these with email/phone/ID patterns unchanged.
    * Defined BEFORE the registry val: the oracle SQL interpolates them at
    * registry construction time.
    */
  private[graft] val RedactEntityPat = "\\b(customer|supplier)\\b"
  private[graft] val RedactTermPat = "\\b(spark|vector)\\b"

  val registry: Seq[Q] = Seq(

    Q("t01_token_stats",
      "per-document token counts, type/token ratio, BPE-ish subtoken count",
      (s, d) => {
        val t = tokens(col("text"))
        // BPE-ish pre-tokenizer: letter runs | digit runs | single
        // non-alnum glyph — the split a byte-pair tokenizer starts from.
        val subtok = "[a-z]+|[0-9]+|[^a-z0-9 ]"
        docs(s, d).select(
          col("doc_id"),
          size(t).cast("long").as("n_tokens"),
          size(array_distinct(t)).cast("long").as("n_types"),
          size(regexp_extract_all(lower(col("text")), lit(subtok), lit(0)))
            .cast("long").as("n_subtokens"),
          when(size(t) > 0,
            aggregate(t, lit(0L), (a, x) => a + length(x)) * lit(1.0) / size(t))
            .as("avg_token_len"),
          when(size(t) > 0, size(array_distinct(t)) * lit(1.0) / size(t))
            .as("ttr"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, text, $sqlToks AS toks FROM documents)
             |SELECT doc_id,
             |  len(toks)::BIGINT AS n_tokens,
             |  len(list_distinct(toks))::BIGINT AS n_types,
             |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))::BIGINT AS n_subtokens,
             |  CASE WHEN len(toks) > 0 THEN
             |    list_aggregate(list_transform(toks, x -> len(x)), 'sum') * 1.0 / len(toks)
             |  END AS avg_token_len,
             |  CASE WHEN len(toks) > 0 THEN
             |    len(list_distinct(toks)) * 1.0 / len(toks)
             |  END AS ttr
             |FROM t ORDER BY doc_id""".stripMargin)),

    Q("t02_quality_score",
      "heuristic document quality: alpha/digit ratios, stopword fraction",
      (s, d) => {
        val t = tokens(col("text"))
        val stops = Seq("the", "a", "of", "and", "to", "in", "is", "it")
        docs(s, d).select(
          col("doc_id"),
          length(col("text")).cast("long").as("n_chars_m"),
          size(t).cast("long").as("n_tokens"),
          (length(regexp_replace(col("text"), "[^a-z]", "")) * lit(1.0)
            / length(col("text"))).as("alpha_ratio"),
          (length(regexp_replace(col("text"), "[^0-9]", "")) * lit(1.0)
            / length(col("text"))).as("digit_ratio"),
          when(size(t) > 0,
            size(filter(t, x => x.isin(stops: _*))) * lit(1.0) / size(t))
            .as("stop_frac"))
          .withColumn("quality_ok",
            col("n_tokens") >= 10 && col("alpha_ratio") >= 0.6 &&
              col("digit_ratio") <= 0.3)
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, text, $sqlToks AS toks FROM documents)
             |SELECT doc_id,
             |  length(text)::BIGINT AS n_chars_m,
             |  len(toks)::BIGINT AS n_tokens,
             |  length(regexp_replace(text, '[^a-z]', '', 'g')) * 1.0 / length(text) AS alpha_ratio,
             |  length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / length(text) AS digit_ratio,
             |  CASE WHEN len(toks) > 0 THEN
             |    len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','it'))) * 1.0 / len(toks)
             |  END AS stop_frac,
             |  (len(toks) >= 10
             |    AND length(regexp_replace(text, '[^a-z]', '', 'g')) * 1.0 / length(text) >= 0.6
             |    AND length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / length(text) <= 0.3) AS quality_ok
             |FROM t ORDER BY doc_id""".stripMargin)),

    Q("t03_langid",
      "marker-token language ID with fixed-priority argmax and accuracy flag",
      (s, d) => {
        val t = tokens(col("text"))
        val scored = docs(s, d).select(
          (col("doc_id") +: col("lang").as("lang_label") +:
            markers.map { case (l, ms) =>
              size(filter(t, x => x.isin(ms: _*))).cast("long").as(s"s_$l")
            }): _*)
        val total = markers.map { case (l, _) => col(s"s_$l") }.reduce(_ + _)
        val best = markers.map { case (l, _) => col(s"s_$l") }
          .reduce((a, b) => greatest(a, b))
        val pred = markers.foldRight(lit("und")) { case ((l, _), els) =>
          when(total > 0 && col(s"s_$l") === best, l).otherwise(els)
        }
        // foldRight builds en-first WHEN chain → fixed-priority tiebreak
        scored.withColumn("predicted", pred)
          .withColumn("is_correct", col("predicted") === col("lang_label"))
          .orderBy("doc_id")
      },
      Some {
        val scoreSql = markers.map { case (l, ms) =>
          val in = ms.map(m => s"'$m'").mkString(",")
          s"len(list_filter(toks, x -> x IN ($in)))::BIGINT AS s_$l"
        }.mkString(",\n             |  ")
        val tot = markers.map { case (l, _) => s"s_$l" }.mkString(" + ")
        val best = s"greatest(${markers.map { case (l, _) => s"s_$l" }.mkString(", ")})"
        val chain = markers.map { case (l, _) =>
          s"WHEN $tot > 0 AND s_$l = $best THEN '$l'"
        }.mkString(" ")
        s"""WITH t AS (SELECT doc_id, lang AS lang_label, $sqlToks AS toks FROM documents),
           |s AS (SELECT doc_id, lang_label,
           |  $scoreSql
           |FROM t)
           |SELECT doc_id, lang_label, s_en, s_es, s_fr, s_de, s_zh,
           |  CASE $chain ELSE 'und' END AS predicted,
           |  (CASE $chain ELSE 'und' END = lang_label) AS is_correct
           |FROM s ORDER BY doc_id""".stripMargin
      }),

    // The min-shingle print runs in the typed shingle kernel
    // (graft.functions.Kernels): `array_min(transform(wordNgrams(...),
    // g -> h60(g)))` evaluated an INTERPRETED md5 per shingle per row
    // (21.6 s at sf0.1 — the CollapseProject×HOF trap); the kernel hashes
    // each distinct trigram once in JVM code (<2 s). It also rebuilds the
    // normalized string (tokens joined by single spaces ≡ normText's
    // collapse+trim — d01/d02's hash-green results pin the equivalence),
    // so normalization runs once and the other three fingerprints stay
    // codegen'd column expressions over it.
    Q("t04_fingerprint",
      "content fingerprints: full, prefix, min-shingle, polynomial rolling hash",
      (s, d) => {
        graft.plans.VectorExpressions.register(s)
        import s.implicits._
        docs(s, d).select(col("doc_id"), col("text")).as[(Long, String)]
          .mapPartitions(_.map { case (id, tx) =>
            val toks = Kernels.lowerTokens(tx)
            (id, toks.mkString(" "), Kernels.minShingle(toks))
          })
          .toDF("doc_id", "norm", "fp_min_shingle")
          .select(
            col("doc_id"),
            h60(col("norm")).as("fp_full"),
            h60(substring(col("norm"), 1, 64)).as("fp_prefix"),
            col("fp_min_shingle"),
            // Rabin-Karp style left-to-right polynomial hash (base 31,
            // Mersenne-31 modulus) — the incremental form a streaming
            // ingest would maintain per chunk. Native codegen expression
            // pinned to unicode CODEPOINTS so the oracle's unicode()
            // matches on non-ASCII text (Spark's ascii() would not).
            call_function("graft_rolling_hash", col("norm")).as("fp_rolling"))
          .orderBy("doc_id")
      },
      Some("""WITH n AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm FROM documents),
             |t AS (SELECT doc_id, norm, list_filter(string_split(norm, ' '), t -> t <> '') AS toks FROM n),
             |g AS (SELECT doc_id, norm, toks,
             |  CASE WHEN len(toks) >= 3 THEN
             |    list_distinct(list_transform(range(1, len(toks) - 1),
             |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
             |  ELSE [] END AS sh FROM t)
             |SELECT doc_id,
             |  ('0x' || substr(md5(norm), 1, 15))::BIGINT AS fp_full,
             |  ('0x' || substr(md5(substr(norm, 1, 64)), 1, 15))::BIGINT AS fp_prefix,
             |  list_aggregate(list_transform(sh,
             |    x -> ('0x' || substr(md5(x), 1, 15))::BIGINT), 'min') AS fp_min_shingle,
             |  list_reduce(list_prepend(0::BIGINT,
             |    list_transform(list_filter(string_split(norm, ''), c -> c <> ''),
             |      c -> unicode(c)::BIGINT)),
             |    (h, c) -> (h * 31 + c) % 2147483647) AS fp_rolling
             |FROM g ORDER BY doc_id""".stripMargin)),

    // Gopher-style repetition metrics (Rae et al. 2021 §A1.1 use duplicate
    // n-gram and top-n-gram character fractions as boilerplate signals).
    // Spark side is a single-pass typed kernel: per-row hash-map counting
    // is O(|doc|), needs no shuffle, and avoids the CollapseProject×HOF
    // re-evaluation trap — the shape that survives a 100 TB corpus (the
    // metric is embarrassingly parallel; cost is one parquet scan). The
    // oracle recomputes with list functions plus a per-doc group-by for
    // the arg-max bigram; ties break by (count DESC, bigram ASC) in both
    // engines (kernel compares UTF-8 bytes = DuckDB binary collation).
    Q("t05_repetition",
      "repetition/boilerplate: duplicate n-gram fractions, top token/bigram mass",
      (s, d) => {
        import s.implicits._
        docs(s, d).select(col("doc_id"), col("text")).as[(Long, String)]
          .mapPartitions(_.map { case (id, tx) => repetitionOf(id, tx) })
          .toDF()
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, text, list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM documents),
             |g AS (SELECT doc_id, text, toks, len(toks) AS n,
             |  list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) AS bg,
             |  list_transform(range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS tg
             |  FROM t),
             |bx AS (SELECT doc_id, unnest(bg) AS b FROM g),
             |bc AS (SELECT doc_id, b, count(*) AS c FROM bx GROUP BY 1, 2),
             |top AS (SELECT doc_id, b, c,
             |  row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, b) AS rn FROM bc)
             |SELECT g.doc_id,
             |  len(bg)::BIGINT AS n_bigrams,
             |  CASE WHEN len(bg) > 0 THEN 1 - len(list_distinct(bg)) * 1.0 / len(bg) END AS dup_bigram_frac,
             |  CASE WHEN len(tg) > 0 THEN 1 - len(list_distinct(tg)) * 1.0 / len(tg) END AS dup_trigram_frac,
             |  CASE WHEN n > 0 THEN list_max(list_transform(list_distinct(toks), u -> len(list_filter(toks, x -> x = u)))) * 1.0 / n END AS top_token_frac,
             |  top.b AS top_bigram,
             |  CASE WHEN top.b IS NOT NULL THEN len(top.b) * top.c * 1.0 / len(text) END AS top_bigram_char_frac
             |FROM g LEFT JOIN top ON g.doc_id = top.doc_id AND top.rn = 1
             |ORDER BY g.doc_id""".stripMargin)),

    // The composite quality FILTER a pipeline actually runs (the
    // Gopher-rule battery, Rae et al. 2021 §A1.1): a fixed-order rule
    // chain over the t01/t02/t05 signal families — word count in
    // [20, 10000], mean word length in [2, 12], a-z character ratio
    // >= 0.55, stopword fraction >= 0.01, duplicate-bigram fraction
    // <= 0.1 — with the FIRST failing rule recorded, so a pipeline can
    // report per-rule attrition, not just a keep bit. One typed kernel
    // pass per document (all signals from one token-array scan), zero
    // shuffle; on this fixture the chain exercises too_short,
    // no_stopwords and repetitive (423 keep / 77 drop at sf0.01) while
    // word_length/symbol_heavy guard inputs this synthetic corpus
    // doesn't contain.
    Q("t06_quality_filter",
      "Gopher-style composite quality filter: keep/drop with first failing rule",
      (s, d) => {
        import s.implicits._
        docs(s, d).select(col("doc_id"), col("text")).as[(Long, String)]
          .mapPartitions(_.map { case (id, tx) => qualityFilterOf(id, tx) })
          .toDF()
          .orderBy("doc_id")
      },
      Some(s"""WITH $sqlQualityChain
             |SELECT doc_id, n_words, mean_word_len, alpha_ratio, stop_frac,
             |  dup_bigram_frac, drop_reason, drop_reason IS NULL AS keep
             |FROM v ORDER BY doc_id""".stripMargin)),

    // Data mixing — the per-domain up/down-sampling step that sets a
    // training mixture (e.g. Pile/ROOTS-style language weights). The
    // sampling decision is a DETERMINISTIC md5 hash slot per document
    // (h60("mix_" || doc_id) mod 1000 vs the language's rate threshold):
    // reproducible across runs and engines (the oracle re-derives every
    // verdict, where rand() could never be gated), stable under
    // re-partitioning, and zero-shuffle — the filter rides the scan, so
    // at 100 TB mixing costs one pass and prunes before any downstream
    // work. Rates here: en 100%, es/fr 50%, de 25%, zh 10%, other 5%.
    Q("t07_mixture_sample",
      "deterministic per-language mixture sampling (md5 slot vs rate threshold)",
      (s, d) => {
        docs(s, d).select(col("doc_id"), col("lang"))
          .withColumn("mix_slot", mixSlot)
          .filter(col("mix_slot") < mixThreshold)
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, lang,
             |  ('0x' || substr(md5('mix_' || doc_id), 1, 15))::BIGINT % 1000 AS mix_slot
             |FROM documents
             |WHERE ('0x' || substr(md5('mix_' || doc_id), 1, 15))::BIGINT % 1000 <
             |  CASE lang WHEN 'en' THEN 1000 WHEN 'es' THEN 500 WHEN 'fr' THEN 500
             |            WHEN 'de' THEN 250 WHEN 'zh' THEN 100 ELSE 50 END
             |ORDER BY doc_id""".stripMargin)),

    // Greedy sequence packing — assign documents to fixed-token-budget
    // training chunks (2048 here): a running token count per shard maps
    // each doc to the sequence it starts in and its offset within it (the
    // standard pre-tokenization packing approximation; exact packing
    // splits/pads at sequence boundaries downstream). The shard key here
    // is `lang` — the per-corpus-slice packing a mixture-aware loader
    // wants, kept as the SMALL-cardinality gate; its ~6 distinct values
    // cap parallelism at 6 and sort each language's whole corpus in one
    // partition, so it is NOT the 100 TB shape. The scale form is
    // t13_sequence_pack_sharded below: the shard is a 256-way hash bucket
    // of doc_id and lang rides along as metadata — same integer-exact
    // arithmetic, parallelism bounded by the bucket count, not the
    // language count.
    Q("t08_sequence_pack",
      "greedy token-budget sequence packing per language shard (2048-token chunks)",
      (s, d) => {
        val t = tokens(col("text"))
        val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        docs(s, d)
          .select(col("doc_id"), col("lang"), size(t).cast("long").as("n_tokens"))
          .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
          .withColumn("seq_id",
            expr("(cum_tokens - n_tokens) div 2048"))
          .withColumn("seq_offset",
            (col("cum_tokens") - col("n_tokens")) % 2048)
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, lang, len($sqlToks)::BIGINT AS n_tokens FROM documents),
             |c AS (SELECT doc_id, lang, n_tokens,
             |  (sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS cum_tokens
             |FROM t)
             |SELECT doc_id, lang, n_tokens, cum_tokens,
             |  ((cum_tokens - n_tokens) // 2048)::BIGINT AS seq_id,
             |  (cum_tokens - n_tokens) % 2048 AS seq_offset
             |FROM c ORDER BY doc_id""".stripMargin)),

    // t08's 100 TB form: the packing shard is a 256-way HASH BUCKET of
    // doc_id (md5-derived h60, so the oracle computes the identical
    // bucket), not a natural attribute. Parallelism is then bounded by
    // the bucket count — a knob, not the data's language skew: the window
    // sort runs per bucket (~n/256 rows each), every bucket packs
    // independently, and at 100 TB the bucket IS the output shard a
    // training-data writer wants (one packed file per bucket). `lang`
    // stays a metadata column; a sequence id is (shard, seq_id). A
    // mixture-aware loader that needs language purity runs t08 per
    // language SLICE instead — the point here is that the ENGINE's
    // parallelism never keys on a ~6-value column. Integer arithmetic
    // only, so both engines agree exactly.
    Q("t13_sequence_pack_sharded",
      "greedy token-budget sequence packing within 256-way hash-bucket shards (the 100 TB shard key)",
      (s, d) => {
        val t = tokens(col("text"))
        val shard = h60(concat(lit("shard_"), col("doc_id").cast("string"))) % 256
        val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        docs(s, d)
          .select(col("doc_id"), col("lang"), shard.as("shard"),
            size(t).cast("long").as("n_tokens"))
          .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
          .withColumn("seq_id",
            expr("(cum_tokens - n_tokens) div 2048"))
          .withColumn("seq_offset",
            (col("cum_tokens") - col("n_tokens")) % 2048)
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, lang,
             |  ('0x' || substr(md5('shard_' || doc_id), 1, 15))::BIGINT % 256 AS shard,
             |  len($sqlToks)::BIGINT AS n_tokens FROM documents),
             |c AS (SELECT doc_id, lang, shard, n_tokens,
             |  (sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS cum_tokens
             |FROM t)
             |SELECT doc_id, lang, shard, n_tokens, cum_tokens,
             |  ((cum_tokens - n_tokens) // 2048)::BIGINT AS seq_id,
             |  (cum_tokens - n_tokens) % 2048 AS seq_offset
             |FROM c ORDER BY doc_id""".stripMargin)),

    // Distribution-RELATIVE quality gating — the production complement
    // to t06's absolute rules: corpora differ by language, so "drop the
    // worst quarter PER LANGUAGE" (CCNet's perplexity-bucket idea, here
    // on the t02 alpha-ratio) needs each language's own p25. The exact
    // PERCENTILE_DISC is computed SCALABLY: never percentile_disc over
    // raw rows (its aggregation state buffers every group value — an
    // executor memory bomb on a 100 TB language), but a (lang, score)
    // count rollup (map-side partial, state = distinct scores) + one
    // cumulative window over those counts + the ceil(q·n) position rule
    // — the same answer, proven by the oracle's native quantile_disc.
    // Thresholds re-attach by BROADCAST (k languages); the corpus never
    // shuffles for the verdict.
    Q("t14_quality_gate",
      "per-language relative quality gate: keep docs at/above their language's p25 alpha-ratio (exact disc percentile, rollup-computed)",
      (s, d) => {
        val scored = docs(s, d).select(col("doc_id"), col("lang"),
          (length(regexp_replace(col("text"), "[^a-z]", "")) * lit(1.0)
            / length(col("text"))).as("score"))
        val counts = scored.groupBy("lang", "score").agg(count(lit(1)).as("c"))
        val wCum = Window.partitionBy(col("lang")).orderBy(col("score"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wTot = Window.partitionBy(col("lang"))
        val thresh = counts
          .withColumn("cum", sum(col("c")).over(wCum))
          .withColumn("n", sum(col("c")).over(wTot))
          .filter(col("cum") >= ceil(col("n") * lit(0.25)))
          .groupBy("lang").agg(min(col("score")).as("lang_p25"))
        scored.join(broadcast(thresh), Seq("lang"))
          .withColumn("keep", col("score") >= col("lang_p25"))
          .select("doc_id", "lang", "score", "lang_p25", "keep")
          .orderBy("doc_id")
      },
      Some("""WITH s AS (SELECT doc_id, lang,
             |    length(regexp_replace(text, '[^a-z]', '', 'g')) * 1.0 / length(text) AS score
             |  FROM documents),
             |q AS (SELECT lang, quantile_disc(score, 0.25) AS lang_p25
             |  FROM s GROUP BY lang)
             |SELECT doc_id, lang, score, lang_p25, score >= lang_p25 AS keep
             |FROM s JOIN q USING (lang)
             |ORDER BY doc_id""".stripMargin)),

    // The end-to-end attrition report — what a data-curation team actually
    // reads: per (source, lang), how many documents each pipeline stage
    // removed, in funnel order (quality rules → exact dedup among quality
    // survivors → mixture downsampling), plus the surviving token mass.
    // Each document is charged to the FIRST stage that drops it, so the
    // four counts partition n_docs exactly. One kernel pass computes the
    // quality verdict AND the normalized string for the content hash
    // (eagerly localCheckpointed — the frame forks into survivor/dropped
    // branches); the dedup window and the final rollup are the only
    // shuffles, both on corpus-reduced frames.
    Q("t09_pipeline_funnel",
      "per-(source, lang) funnel: quality -> exact-dedup -> mixture, with kept-token mass",
      (s, d) => {
        import s.implicits._
        val base = docs(s, d)
          .select(col("doc_id"), col("lang"), col("source"), col("text"))
          .as[(Long, String, String, String)]
          .mapPartitions(_.map { case (id, lang, source, tx) =>
            val f = qualityFilterOf(id, tx)
            val norm = Kernels.lowerTokens(tx).mkString(" ")
            (id, lang, source, f.n_words, f.keep, norm)
          })
          .toDF("doc_id", "lang", "source", "n_words", "quality_keep", "norm")
          .localCheckpoint(true)
        val w = Window.partitionBy(col("content_hash"))
        val surv = base.filter(col("quality_keep"))
          .withColumn("content_hash", md5(col("norm")))
          .withColumn("canonical", min(col("doc_id")).over(w))
          .withColumn("stage",
            when(col("doc_id") =!= col("canonical"), "duplicate")
              .when(mixSlot >= mixThreshold, "mixture")
              .otherwise("kept"))
          .select(col("source"), col("lang"), col("n_words"), col("stage"))
        val dropped = base.filter(!col("quality_keep"))
          .select(col("source"), col("lang"), col("n_words"),
            lit("quality").as("stage"))
        surv.union(dropped)
          .groupBy("source", "lang")
          .agg(
            count(lit(1)).as("n_docs"),
            count(when(col("stage") === "quality", 1)).as("n_quality_drop"),
            count(when(col("stage") === "duplicate", 1)).as("n_dup_drop"),
            count(when(col("stage") === "mixture", 1)).as("n_mix_drop"),
            count(when(col("stage") === "kept", 1)).as("n_kept"),
            sum(when(col("stage") === "kept", col("n_words")).otherwise(0L))
              .as("tokens_kept"))
          .orderBy("source", "lang")
      },
      Some(s"""WITH $sqlQualityChain,
             |qd AS (SELECT source, lang, n_words, 'quality' AS stage
             |  FROM v WHERE drop_reason IS NOT NULL),
             |qp AS (SELECT doc_id, lang, source, n_words,
             |    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS ch
             |  FROM v WHERE drop_reason IS NULL),
             |w AS (SELECT *, min(doc_id) OVER (PARTITION BY ch) AS canonical FROM qp),
             |m AS (SELECT source, lang, n_words,
             |  CASE WHEN doc_id <> canonical THEN 'duplicate'
             |       WHEN ('0x' || substr(md5('mix_' || doc_id), 1, 15))::BIGINT % 1000 >=
             |         CASE lang WHEN 'en' THEN 1000 WHEN 'es' THEN 500 WHEN 'fr' THEN 500
             |                   WHEN 'de' THEN 250 WHEN 'zh' THEN 100 ELSE 50 END
             |         THEN 'mixture'
             |       ELSE 'kept' END AS stage
             |  FROM w),
             |u AS (SELECT * FROM qd UNION ALL SELECT * FROM m)
             |SELECT source, lang, count(*)::BIGINT AS n_docs,
             |  count(CASE WHEN stage = 'quality' THEN 1 END)::BIGINT AS n_quality_drop,
             |  count(CASE WHEN stage = 'duplicate' THEN 1 END)::BIGINT AS n_dup_drop,
             |  count(CASE WHEN stage = 'mixture' THEN 1 END)::BIGINT AS n_mix_drop,
             |  count(CASE WHEN stage = 'kept' THEN 1 END)::BIGINT AS n_kept,
             |  sum(CASE WHEN stage = 'kept' THEN n_words ELSE 0 END)::BIGINT AS tokens_kept
             |FROM u GROUP BY source, lang ORDER BY source, lang""".stripMargin)),

    // Corpus vocabulary statistics — the input to tokenizer/BPE training
    // and the first corpus-health report: global term and document
    // frequency per token, top-100 by tf. THE wordcount at scale: the
    // kernel pre-aggregates per-document counts (so the shuffle carries
    // one row per (doc, type), not per token occurrence), the groupBy
    // partial-aggregates map-side, and top-100 is TakeOrderedAndProject —
    // no global sort of the vocabulary.
    Q("t10_vocab_stats",
      "corpus vocabulary: top-100 tokens by term frequency, with document frequency",
      (s, d) => {
        import s.implicits._
        docs(s, d).select(col("doc_id"), col("text")).as[(Long, String)]
          .mapPartitions(_.flatMap { case (_, tx) =>
            val counts = new java.util.HashMap[String, Int]()
            Kernels.lowerTokens(tx).foreach(t => counts.merge(t, 1, Integer.sum))
            val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
            counts.forEach((t, c) => out += ((t, c.toLong)))
            out
          })
          .toDF("token", "tf_doc")
          .groupBy("token")
          .agg(sum(col("tf_doc")).as("tf"), count(lit(1)).as("df"))
          .orderBy(col("tf").desc, col("token").asc)
          .limit(100)
          .orderBy(col("tf").desc, col("token").asc)
      },
      Some("""WITH n AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm FROM documents),
             |tk AS (SELECT doc_id, list_filter(string_split(norm, ' '), t -> t <> '') AS toks FROM n),
             |e AS (SELECT doc_id, unnest(toks) AS token FROM tk),
             |g AS (SELECT token, count(*)::BIGINT AS tf,
             |    count(DISTINCT doc_id)::BIGINT AS df
             |  FROM e GROUP BY 1)
             |SELECT token, tf, df FROM g
             |ORDER BY tf DESC, token LIMIT 100""".stripMargin)),

    // Token-rarity document scoring — the frequency-table-based quality
    // signal (the CCNet/KenLM idea: score each document against corpus
    // statistics). Kept INTEGER-exact where CCNet uses log-probabilities:
    // ln() is not bit-identical across engines/libms, so the score is the
    // mean GLOBAL term frequency of the document's tokens (low = rare
    // vocabulary) plus the rare-token fraction, where "rare" is an
    // integer-exact document-frequency cap (df·20 <= ndocs, i.e. <= 5 %
    // of token-bearing docs — the d07 cap inverted). Integer sums with
    // one final division, which both engines compute identically. Plan:
    // the exploded token stream joins the frequency table with a
    // shuffle-HASH join (the vocabulary is NOT broadcastable at 100 TB),
    // per-doc sums partial-aggregate map-side.
    Q("t11_token_rarity",
      "per-document rarity vs corpus frequencies: mean token tf, rare-token (df <= 5%) fraction",
      (s, d) => {
        import s.implicits._
        val ex = docs(s, d).select(col("doc_id"), col("text")).as[(Long, String)]
          .mapPartitions(_.flatMap { case (id, tx) =>
            Kernels.lowerTokens(tx).iterator.map(t => (id, t))
          })
          .toDF("doc_id", "token")
          .localCheckpoint(true)
        val nd = ex.agg(countDistinct(col("doc_id")).as("ndocs"))
        val freq = ex.groupBy("token")
          .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
        ex.join(freq.hint("shuffle_hash"), Seq("token"))
          .crossJoin(broadcast(nd))
          .groupBy("doc_id")
          .agg(
            count(lit(1)).as("n_tokens"),
            sum(col("tf")).as("sum_tf"),
            count(when(col("df") * 20 <= col("ndocs"), 1)).as("n_rare"))
          .select(col("doc_id"), col("n_tokens"), col("sum_tf"),
            (col("sum_tf") * lit(1.0) / col("n_tokens")).as("mean_tf"),
            (col("n_rare") * lit(1.0) / col("n_tokens")).as("rare_frac"))
          .orderBy("doc_id")
      },
      Some("""WITH n AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm FROM documents),
             |tk AS (SELECT doc_id, list_filter(string_split(norm, ' '), t -> t <> '') AS toks FROM n),
             |e AS (SELECT doc_id, unnest(toks) AS token FROM tk),
             |nd AS (SELECT count(DISTINCT doc_id) AS ndocs FROM e),
             |g AS (SELECT token, count(*)::BIGINT AS tf,
             |    count(DISTINCT doc_id)::BIGINT AS df
             |  FROM e GROUP BY 1),
             |j AS (SELECT e.doc_id, g.tf, g.df FROM e JOIN g USING (token)),
             |s AS (SELECT doc_id, count(*)::BIGINT AS n_tokens,
             |    sum(tf)::BIGINT AS sum_tf,
             |    count(CASE WHEN df * 20 <= ndocs THEN 1 END)::BIGINT AS n_rare
             |  FROM j CROSS JOIN nd GROUP BY doc_id)
             |SELECT doc_id, n_tokens, sum_tf,
             |  sum_tf * 1.0 / n_tokens AS mean_tf,
             |  n_rare * 1.0 / n_tokens AS rare_frac
             |FROM s ORDER BY doc_id""".stripMargin)),

    // Lexical diversity, integer-exact. Shannon entropy is the textbook
    // diversity score but ln() is not bit-stable across engines, so the
    // score here is the Gini–Simpson numerator n² − Σc² (the pairwise-
    // unequal count: how many ordered token pairs differ — 0 for a
    // one-word doc, maximal for all-distinct), plus repeat mass n − types
    // and the hapax count — all from one O(|doc|) hash-map kernel pass
    // (the d04/t05 discipline; the HOF recount would be O(types·tokens)
    // interpreted). Zero shuffle: rides the parquet scan at any scale.
    // The final `* 1.0 /` divisions are single IEEE ops, portable.
    Q("t12_lexical_diversity",
      "integer-exact lexical diversity: Gini-Simpson numerator, repeat mass, hapax count",
      (s, d) => {
        import s.implicits._
        docs(s, d).select(col("doc_id"), col("text")).as[(Long, String)]
          .mapPartitions(_.map { case (id, tx) =>
            val (n, types, sq, hapax) = Kernels.diversityMoments(
              Kernels.spaceTokens(tx))
            (id, n, types, sq, n * n - sq, n - types, hapax)
          })
          .toDF("doc_id", "n_tokens", "n_types", "sq_counts", "gini_num",
            "repeat_mass", "hapax")
          .withColumn("gini_simpson",
            when(col("n_tokens") > 1,
              col("gini_num") * lit(1.0) /
                (col("n_tokens") * (col("n_tokens") - 1))))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, $sqlToks AS toks FROM documents),
             |c AS (SELECT doc_id, len(toks)::BIGINT AS n_tokens,
             |    list_transform(list_distinct(toks),
             |      x -> len(list_filter(toks, t -> t = x))::BIGINT) AS cnts
             |  FROM t),
             |m AS (SELECT doc_id, n_tokens,
             |    len(cnts)::BIGINT AS n_types,
             |    coalesce(list_aggregate(list_transform(cnts, c -> c * c), 'sum'), 0)::BIGINT AS sq_counts,
             |    len(list_filter(cnts, c -> c = 1))::BIGINT AS hapax
             |  FROM c)
             |SELECT doc_id, n_tokens, n_types, sq_counts,
             |  (n_tokens * n_tokens - sq_counts)::BIGINT AS gini_num,
             |  (n_tokens - n_types)::BIGINT AS repeat_mass, hapax,
             |  CASE WHEN n_tokens > 1 THEN
             |    (n_tokens * n_tokens - sq_counts) * 1.0 / (n_tokens * (n_tokens - 1))
             |  END AS gini_simpson
             |FROM m ORDER BY doc_id""".stripMargin)),

    // Per-source document capping — the domain-cap step of crawl
    // pipelines (RefinedWeb/C4 bound any single domain's share so one
    // hot site can't dominate the mixture): keep each source's top-K
    // documents by quality (the t02/t14 alpha-ratio; per-row IEEE, so
    // both engines rank identically), ties broken by doc_id. The scale
    // point is HOW the rank is computed: the `row_number() <= K` filter
    // compiles to WindowGroupLimit (plan-asserted), so every input
    // partition forwards at most K rows per source to the shuffle — a
    // hot domain with 10^9 pages costs K·|partitions touching it| rows,
    // not a 10^9-row single-partition sort. Output is the kept corpus.
    Q("t15_source_cap",
      "per-source top-20 cap by quality score (WindowGroupLimit partial top-k, ties by doc_id)",
      (s, d) => {
        val w = Window.partitionBy(col("source"))
          .orderBy(col("score").desc, col("doc_id"))
        docs(s, d)
          .select(col("doc_id"), col("source"),
            (length(regexp_replace(col("text"), "[^a-z]", "")) * lit(1.0)
              / length(col("text"))).as("score"))
          .withColumn("src_rank", row_number().over(w))
          .filter(col("src_rank") <= 20)
          .orderBy("doc_id")
      },
      Some("""WITH s AS (SELECT doc_id, source,
             |    length(regexp_replace(text, '[^a-z]', '', 'g')) * 1.0 / length(text) AS score
             |  FROM documents),
             |r AS (SELECT doc_id, source, score,
             |    row_number() OVER (PARTITION BY source ORDER BY score DESC, doc_id) AS src_rank
             |  FROM s)
             |SELECT doc_id, source, score, src_rank::BIGINT AS src_rank
             |FROM r WHERE src_rank <= 20 ORDER BY doc_id""".stripMargin)),

    // Importance resampling to a TARGET mixture (the DSIR shape, Xie et
    // al. 2023: select pretraining data so a feature's distribution
    // matches a target's — here the feature is `lang` and the target is
    // a fixed per-mille mixture). Acceptance rate per bucket ∝
    // target_share / corpus_share, normalized so the most under-
    // represented bucket keeps everything; the verdict is the t07 md5
    // slot against that rate, made INTEGER-exact by cross-multiplying:
    // keep iff slot·t_m·n_l < 1000·t_l·n_m, where (t_m, n_m) is the
    // max-weight bucket — no float thresholds, so both engines decide
    // every row identically, reproducible under re-partitioning. Plan:
    // one tiny lang rollup (map-side partial), the 1-row argmax and the
    // k-row rate table broadcast back; the corpus itself never shuffles
    // for the verdict — at 100 TB this costs one scan, like t07.
    Q("t16_dsir_resample",
      "distribution-matched importance resampling to a target lang mixture (integer cross-multiplied rates)",
      (s, d) => {
        val tgt = when(col("lang") === "en", 300L)
          .when(col("lang") === "es", 150L)
          .when(col("lang") === "fr", 150L)
          .when(col("lang") === "de", 150L)
          .when(col("lang") === "zh", 250L)
          .otherwise(0L)
        val counts = docs(s, d).groupBy("lang")
          .agg(count(lit(1)).as("n_lang"))
          .withColumn("tgt", tgt)
        // the argmax-weight bucket: maximal t_l/n_l (each a single IEEE
        // division — identical doubles in both engines), ties by lang
        val best = counts
          .orderBy((col("tgt") * lit(1.0) / col("n_lang")).desc, col("lang"))
          .limit(1)
          .select(col("n_lang").as("m_n"), col("tgt").as("m_tgt"))
        val slot = h60(concat(lit("dsir_"), col("doc_id").cast("string"))) % 1000
        docs(s, d).select(col("doc_id"), col("lang"))
          .join(broadcast(counts.crossJoin(best)), Seq("lang"))
          .withColumn("slot", slot)
          .select(col("doc_id"), col("lang"), col("slot"), col("n_lang"),
            (col("slot") * col("m_tgt") * col("n_lang") <
              lit(1000L) * col("tgt") * col("m_n")).as("keep"))
          .orderBy("doc_id")
      },
      Some("""WITH c AS (SELECT lang, count(*)::BIGINT AS n_lang FROM documents GROUP BY lang),
             |t AS (SELECT lang, n_lang,
             |    (CASE lang WHEN 'en' THEN 300 WHEN 'es' THEN 150 WHEN 'fr' THEN 150
             |               WHEN 'de' THEN 150 WHEN 'zh' THEN 250 ELSE 0 END)::BIGINT AS tgt
             |  FROM c),
             |m AS (SELECT n_lang AS m_n, tgt AS m_tgt FROM t
             |  ORDER BY tgt * 1.0 / n_lang DESC, lang LIMIT 1),
             |v AS (SELECT d.doc_id, d.lang,
             |    ('0x' || substr(md5('dsir_' || d.doc_id), 1, 15))::BIGINT % 1000 AS slot,
             |    t.n_lang, t.tgt, m.m_n, m.m_tgt
             |  FROM documents d JOIN t USING (lang) CROSS JOIN m)
             |SELECT doc_id, lang, slot, n_lang,
             |  slot * m_tgt * n_lang < 1000 * tgt * m_n AS keep
             |FROM v ORDER BY doc_id""".stripMargin)),

    // Fixed-size token chunking with stride — the context-window prep
    // step every pretraining/RAG pipeline runs (split each document
    // into C-token windows every S tokens, trailing window flush to the
    // end). Chunk count and offsets are INTEGER-exact (ceil by integer
    // add-divide, never float), the chunk text itself is gated by md5 —
    // hash-compact like d17's rewrite. Chunk geometry (C=64, S=48,
    // overlap 16) is a knob; the last chunk always ends at the final
    // token, and every chunk is non-empty by construction (the last
    // start is < n because S < C). Plan: pure per-row projection +
    // explode riding the parquet scan — zero shuffle at any corpus
    // size (the final global sort is the gate's determinism, not the
    // operator); output rows ≈ corpus_tokens / S, the operator's
    // irreducible output volume.
    Q("t17_chunking",
      "fixed-size token chunks with stride (C=64, S=48): integer-exact offsets + per-chunk md5",
      (s, d) => chunksOf(docs(s, d)),
      Some(s"""WITH t AS (SELECT doc_id,
             |    list_filter(string_split(coalesce(text, ''), ' '), t -> t <> '') AS toks
             |  FROM documents),
             |n AS (SELECT doc_id, toks, len(toks)::BIGINT AS n FROM t),
             |c AS (SELECT doc_id, toks, n,
             |    CASE WHEN n = 0 THEN 0
             |         ELSE 1 + (greatest(n - ${ChunkC}, 0) + ${ChunkS - 1}) // ${ChunkS} END AS nchunks
             |  FROM n)
             |SELECT doc_id, i AS chunk_idx,
             |  (i*${ChunkS} + 1)::BIGINT AS chunk_start,
             |  (least(i*${ChunkS} + ${ChunkC}, n) - i*${ChunkS})::BIGINT AS n_chunk_tokens,
             |  md5(array_to_string(
             |    list_slice(toks, i*${ChunkS} + 1, least(i*${ChunkS} + ${ChunkC}, n)), ' ')) AS chunk_md5
             |FROM c, unnest(range(0, nchunks)) AS u(i)
             |ORDER BY doc_id, chunk_idx""".stripMargin)),

    // Pruned bigram-LM familiarity scoring — the perplexity-filter shape
    // (CCNet/KenLM: score new text against a reference language model)
    // with the LM pruned to a FIXED SIZE (top-500 bigrams by reference
    // count) instead of log-probabilities: ln() is not bit-stable across
    // engines (the t11/t12 rationale), so the score is integer-exact
    // occurrence/count sums with one final IEEE division. The boundary
    // tiebreak is md5(bigram) — count ties at the K-th rank are real
    // (the probe found 60+ at sf0.01) and byte-order ties via raw
    // strings would diverge on supplementary codepoints (UTF-16 vs
    // UTF-8 collation), while md5 hex is pure ASCII in both engines.
    // The FIXED LM size is the scale story: a production LM is pruned
    // to fit memory by construction, so the LM side always BROADCASTS —
    // the batch's bigram stream joins it without shuffling, the only
    // corpus-scale exchange is the reference slice's count aggregation
    // (map-side partial) + its global top-K (TakeOrderedAndProject,
    // K rows per partition, never a full sort).
    Q("t18_lm_familiarity",
      "new-batch bigram familiarity vs a fixed-size (top-500) reference LM: known fraction + count mass",
      (s, d) => {
        val lm = bigramOcc(docs(s, d).filter(col("doc_id") % 5 =!= 4))
          .groupBy("bg").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, md5(col("bg")))
          .limit(500)
        val scored = bigramOcc(docs(s, d).filter(col("doc_id") % 5 === 4))
          .join(broadcast(lm), Seq("bg"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("nb"), count(col("cnt")).as("nk"),
            coalesce(sum(col("cnt")), lit(0L)).as("fam"))
        // docs too short for a bigram still get a scored row (zeroes)
        docs(s, d).filter(col("doc_id") % 5 === 4).select("doc_id")
          .join(scored, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("nb"), lit(0L)).as("n_bigrams"),
            coalesce(col("nk"), lit(0L)).as("n_known"),
            coalesce(col("fam"), lit(0L)).as("familiarity"),
            when(coalesce(col("nb"), lit(0L)) > 0,
              col("nk") * lit(1.0) / col("nb")).as("coverage"))
          .orderBy("doc_id")
      },
      Some(sqlFamiliarity)),

    // t18's INCREMENTAL twin, extending the warehouse-sidecar family
    // (d15 signatures, d16 hashes, d18 bloom bits, s09/s10 centroids)
    // to the reference LM: the daily familiarity pass reads a PERSISTED
    // bigram-count sidecar — the table an ingest pipeline maintains,
    // one (bg, cnt) row per distinct stored-slice bigram — and never
    // re-reads the corpus text to build its LM. Counts are a pure
    // additive fold (the bloom/centroid-statistics rule, SURVEY §7.4
    // rule 9): per-batch count tables SUM into the corpus table, so the
    // consumer folds across batch subdirs at read (map-side partial),
    // takes the same top-500 (same md5 tiebreak — equal counts fold to
    // equal counts), and proceeds exactly as t18. Scale: the sidecar is
    // vocabulary-sized (≪ corpus tokens); the fold + top-K touch it
    // once; the oracle (t18's, verbatim) proves the persisted path
    // loses nothing vs re-deriving the LM from text.
    Q("t19_incremental_familiarity",
      "t18's scorer against the persisted bigram-count sidecar — corpus text never re-read for the LM",
      (s, d) => familiarityOf(
        docs(s, d).filter(col("doc_id") % 5 === 4).select("doc_id", "text"),
        lmStorePath(s, d)),
      Some(sqlFamiliarity)),

    // Pattern redaction — the PII-scrub plumbing (mask entity classes,
    // count hits, fingerprint the scrubbed text so downstream dedup keys
    // on the REDACTED form). The class list is configuration: production
    // swaps in email/phone/SSN regexes; here two classes that are LIVE on
    // the synthetic vocabulary stand in, so the gate is non-vacuous
    // (394/500 docs carry an entity hit at sf0.01). Scale shape: a pure
    // narrow projection — regexp count + nested replace, all codegen'd
    // built-ins, zero shuffle, zero kernel; the scan reads (doc_id, text)
    // only. Replacement order is pinned (entity first, then term) and the
    // classes are disjoint by construction, so the nested replace is
    // order-independent anyway; md5 of the scrubbed text gives both
    // engines the same 32-hex fingerprint.
    Q("t20_redaction",
      "multi-class pattern redaction: per-class hit counts + md5 of the scrubbed text",
      (s, d) => {
        val t = coalesce(col("text"), lit(""))
        val scrubbed = regexp_replace(
          regexp_replace(t, RedactEntityPat, "[ENT]"),
          RedactTermPat, "[TERM]")
        docs(s, d).select(
          col("doc_id"),
          size(regexp_extract_all(t, lit(RedactEntityPat), lit(0)))
            .cast("long").as("n_entity"),
          size(regexp_extract_all(t, lit(RedactTermPat), lit(0)))
            .cast("long").as("n_term"),
          md5(scrubbed).as("redacted_md5"))
          .withColumn("already_clean",
            col("n_entity") + col("n_term") === 0)
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, coalesce(text, '') AS tx FROM documents)
             |SELECT doc_id,
             |  len(regexp_extract_all(tx, '$RedactEntityPat'))::BIGINT AS n_entity,
             |  len(regexp_extract_all(tx, '$RedactTermPat'))::BIGINT AS n_term,
             |  md5(regexp_replace(regexp_replace(tx, '$RedactEntityPat', '[ENT]', 'g'),
             |    '$RedactTermPat', '[TERM]', 'g')) AS redacted_md5,
             |  (len(regexp_extract_all(tx, '$RedactEntityPat'))
             |    + len(regexp_extract_all(tx, '$RedactTermPat'))) = 0 AS already_clean
             |FROM t ORDER BY doc_id""".stripMargin)),

    // TF-IDF keyword extraction — each document's top-5 most
    // REPRESENTATIVE tokens (high in-doc frequency, low corpus
    // document-frequency): the search-indexing / topic-labeling /
    // "why did dedup flag these two" explanation primitive. The score
    // is the raw tf/df ratio: tf and df are exact integers and the
    // score one IEEE division (the t11/t12 discipline — idf's log() is
    // monotone in 1/df, so the RANKING is identical and the
    // transcendental adds nothing but cross-engine risk). Ties at the
    // rank boundary break on the token itself. Scale shape: the
    // (doc, token) tf rollup and the vocab-sized df rollup both
    // partial-aggregate map-side; the df table re-attaches
    // shuffle-HASH (t11's rationale: a 100 TB corpus's vocabulary is
    // not broadcastable); the top-5 filter compiles to
    // WindowGroupLimit (t15's rationale: each partition forwards ≤ 5
    // rows per doc to the rank shuffle, so the output side is
    // output-bound, never corpus-bound).
    Q("t21_tfidf_keywords",
      "per-document top-5 tokens by tf/df: exact integer tf and df, one IEEE division for the score",
      (s, d) => {
        import s.implicits._
        val ex = docs(s, d).select(col("doc_id"), col("text")).as[(Long, String)]
          .mapPartitions(_.flatMap { case (id, tx) =>
            Kernels.lowerTokens(tx).iterator.map(t => (id, t))
          })
          .toDF("doc_id", "token")
          .localCheckpoint(true)
        val tf = ex.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
        val dfT = ex.groupBy("token")
          .agg(countDistinct(col("doc_id")).as("df"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("token").asc)
        tf.join(dfT.hint("shuffle_hash"), Seq("token"))
          .withColumn("score", col("tf") * lit(1.0) / col("df"))
          .withColumn("kw_rank", row_number().over(w))
          .filter(col("kw_rank") <= 5)
          .select(col("doc_id"), col("kw_rank"), col("token"),
            col("tf"), col("df"), col("score"))
          .orderBy("doc_id", "kw_rank")
      },
      Some("""WITH n AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm FROM documents),
             |tk AS (SELECT doc_id, list_filter(string_split(norm, ' '), t -> t <> '') AS toks FROM n),
             |e AS (SELECT doc_id, unnest(toks) AS token FROM tk),
             |tf AS (SELECT doc_id, token, count(*)::BIGINT AS tf FROM e GROUP BY 1, 2),
             |df AS (SELECT token, count(DISTINCT doc_id)::BIGINT AS df FROM e GROUP BY 1),
             |j AS (SELECT tf.doc_id, tf.token, tf.tf, df.df,
             |    tf.tf * 1.0 / df.df AS score
             |  FROM tf JOIN df USING (token)),
             |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
             |    ORDER BY score DESC, token) AS kw_rank FROM j)
             |SELECT doc_id, kw_rank, token, tf, df, score
             |FROM r WHERE kw_rank <= 5 ORDER BY doc_id, kw_rank""".stripMargin)),

    // BPE merge-candidate statistics — the FIRST merge step of
    // byte-pair-encoding tokenizer training: count every adjacent
    // character pair inside every word across the corpus and rank the
    // top-20 (the pair a BPE trainer would merge first, plus its
    // runners-up). Complements t01 (which COUNTS BPE-ish pre-tokens)
    // and t10 (unigram vocab) with the pair-statistics leg a tokenizer
    // trainer actually iterates on. Boundary tiebreak is t18's md5
    // discipline (count ties at K are real; raw-string order would
    // diverge on supplementary codepoints). Pairing is over CODEPOINTS
    // on both engines (Kernels.codepointPairs ↔ the oracle's
    // codepoint-based substr/len), so supplementary characters pair
    // whole, never as surrogate halves.
    // Scale shape: one kernel pass rides the scan; the pair key
    // space is ALPHABET-bounded (not corpus-bounded), so the count
    // collapses map-side to |alphabet|² cells and the top-20 is
    // TakeOrderedAndProject (K rows per partition forwarded, never a
    // full sort); the rank window runs over the 20 survivors only.
    Q("t22_bpe_pairs",
      "top-20 corpus-wide adjacent-char pair counts inside words — the first BPE merge step",
      (s, d) => {
        import s.implicits._
        val pairs = docs(s, d).select(col("doc_id"), col("text"))
          .as[(Long, String)]
          .mapPartitions(_.flatMap { case (_, tx) =>
            Kernels.lowerTokens(tx).iterator.flatMap(Kernels.codepointPairs)
          })
          .toDF("pair")
        val top = pairs.groupBy("pair").agg(count(lit(1)).as("pair_count"))
          .orderBy(col("pair_count").desc, md5(col("pair")))
          .limit(20)
        val w = Window.orderBy(col("pair_count").desc, md5(col("pair")))
        top.withColumn("rank", row_number().over(w))
          .select(col("rank").cast("long").as("rank"),
            col("pair"), col("pair_count"))
          .orderBy("rank")
      },
      Some("""WITH n AS (SELECT trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
             |  FROM documents WHERE text IS NOT NULL),
             |w AS (SELECT unnest(list_filter(string_split(norm, ' '), t -> t <> '')) AS word FROM n),
             |p AS (SELECT substr(word, i, 2) AS pair
             |  FROM w, unnest(range(1, len(word))) AS u(i)
             |  WHERE len(word) >= 2),
             |c AS (SELECT pair, count(*)::BIGINT AS pair_count FROM p GROUP BY pair),
             |r AS (SELECT pair, pair_count, row_number() OVER (
             |    ORDER BY pair_count DESC, md5(pair)) AS rank FROM c)
             |SELECT rank, pair, pair_count FROM r
             |WHERE rank <= 20 ORDER BY rank""".stripMargin)),

    // Token-budget epoch scheduling — the step BETWEEN mixture design
    // (t16 decides which docs survive) and the loader (t08/t13 pack
    // sequences): given a target mixture weight per language and a global
    // training-token budget, how many PASSES (epochs) over each
    // language's available tokens does the trainer schedule? The
    // repeat-count question is what data-constrained scaling actually
    // plans around (Muennighoff et al. 2023 — value decays past ~4
    // epochs; a scheduler needs the per-slice repeat factor, not just
    // fractions). Arithmetic is cross-multiplied-integer end to end —
    // target tokens by integer div, the ceil'd repeat count by
    // (a + b − 1) div b — with ONE IEEE division for the fractional
    // epochs column, so both engines agree bit-exactly. Shape: per-doc
    // token counts collapse map-side into a ~|langs|-row frame; the
    // budget split is a broadcast cross join against a one-row total.
    // At 100 TB the only corpus-scale stage is the first projection —
    // everything after runs on rows-per-language.
    Q("t23_epoch_schedule",
      "per-language epoch schedule for a 1M-token budget under the t16 target mixture (integer-exact)",
      (s, d) => {
        val budget = 1000000L
        val tgt = when(col("lang") === "en", 300L)
          .when(col("lang") === "es", 150L)
          .when(col("lang") === "fr", 150L)
          .when(col("lang") === "de", 150L)
          .when(col("lang") === "zh", 250L)
          .otherwise(0L)
        val counts = docs(s, d)
          .select(col("lang"), size(tokens(col("text"))).cast("long").as("n_tok"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
          .withColumn("weight", tgt)
        val tot = counts.agg(sum(col("weight")).as("w_total"))
        // a zero-token language slice (all-empty text) yields NULL epochs
        // and n_repeats: Spark's non-ANSI /-and-div already return null
        // on a zero divisor, and the oracle mirrors it with explicit
        // CASEs (DuckDB's // would otherwise ABORT on division by zero —
        // a whole-gate failure, not a row mismatch)
        counts.crossJoin(broadcast(tot))
          .withColumn("target_tokens",
            expr(s"($budget * weight) div w_total"))
          .select(col("lang"), col("n_docs"), col("n_tokens"), col("weight"),
            col("target_tokens"),
            (col("target_tokens") * lit(1.0) / col("n_tokens")).as("epochs"),
            expr("(target_tokens + n_tokens - 1) div n_tokens").as("n_repeats"))
          .orderBy("lang")
      },
      Some(s"""WITH t AS (SELECT lang, len($sqlToks)::BIGINT AS n_tok FROM documents),
             |c AS (SELECT lang, count(*)::BIGINT AS n_docs, sum(n_tok)::BIGINT AS n_tokens
             |  FROM t GROUP BY lang),
             |w AS (SELECT lang, n_docs, n_tokens,
             |    (CASE lang WHEN 'en' THEN 300 WHEN 'es' THEN 150 WHEN 'fr' THEN 150
             |               WHEN 'de' THEN 150 WHEN 'zh' THEN 250 ELSE 0 END)::BIGINT AS weight
             |  FROM c),
             |tot AS (SELECT sum(weight)::BIGINT AS w_total FROM w),
             |s AS (SELECT w.*,
             |    CASE WHEN w_total = 0 THEN NULL
             |         ELSE (1000000 * weight) // w_total END AS target_tokens
             |  FROM w CROSS JOIN tot)
             |SELECT lang, n_docs, n_tokens, weight, target_tokens,
             |  CASE WHEN n_tokens = 0 THEN NULL
             |       ELSE target_tokens * 1.0 / n_tokens END AS epochs,
             |  CASE WHEN n_tokens = 0 THEN NULL
             |       ELSE (target_tokens + n_tokens - 1) // n_tokens END AS n_repeats
             |FROM s ORDER BY lang""".stripMargin)),

    // Dataset card — the per-(source, lang) summary grid a curator
    // actually publishes with a released corpus (the Dolma/C4 dataset-card
    // numbers): document and token counts, corpus share, and the
    // exact-duplicate rate under d01's normalized-content-hash definition
    // (a doc is a duplicate iff it is not its hash group's min id — the
    // same docs d01 would drop, so the card's dup_rate IS the dedup
    // pressure the release notes quote). Counts are integers; shares are
    // one IEEE division each, bit-equal cross-engine. Shape: the dup flag
    // is ONE corpus-keyed window exchange (content_hash —
    // high-cardinality), the grid rollup collapses map-side to
    // |sources|×|langs| rows, and the 1-row total broadcasts back; at
    // 100 TB nothing after the first two exchanges touches corpus-sized
    // data.
    Q("t24_dataset_card",
      "per-(source, lang) dataset card: doc/token counts, corpus share, exact-dup rate",
      (s, d) => {
        val w = Window.partitionBy(col("content_hash"))
        val flagged = docs(s, d)
          .select(col("doc_id"), col("source"), col("lang"),
            size(tokens(col("text"))).cast("long").as("n_tok"),
            md5(normText(col("text"))).as("content_hash"))
          .withColumn("is_dup",
            col("doc_id") =!= min(col("doc_id")).over(w))
        val per = flagged.groupBy("source", "lang").agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("n_tokens"),
          sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup_docs"))
        // corpus total via an EMPTY-partition window over the grid — the
        // grid is |sources|×|langs| rows by construction, so the single
        // partition is bounded; a separate agg branch would re-scan and
        // re-shuffle the corpus a second time (Catalyst can't share the
        // un-materialized rollup between the two consumers)
        val wAll = Window.partitionBy()
        per.withColumn("total_docs", sum(col("n_docs")).over(wAll))
          .select(col("source"), col("lang"), col("n_docs"), col("n_tokens"),
            col("n_dup_docs"),
            (col("n_docs") * lit(1.0) / col("total_docs")).as("doc_share"),
            (col("n_dup_docs") * lit(1.0) / col("n_docs")).as("dup_rate"))
          .orderBy("source", "lang")
      },
      Some(s"""WITH f AS (SELECT doc_id, source, lang,
             |    len($sqlToks)::BIGINT AS n_tok,
             |    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_hash
             |  FROM documents),
             |fl AS (SELECT *, doc_id <> min(doc_id) OVER (PARTITION BY content_hash) AS is_dup
             |  FROM f),
             |per AS (SELECT source, lang, count(*)::BIGINT AS n_docs,
             |    sum(n_tok)::BIGINT AS n_tokens,
             |    sum(CASE WHEN is_dup THEN 1 ELSE 0 END)::BIGINT AS n_dup_docs
             |  FROM fl GROUP BY source, lang),
             |t AS (SELECT *, sum(n_docs) OVER ()::BIGINT AS total_docs FROM per)
             |SELECT source, lang, n_docs, n_tokens, n_dup_docs,
             |  n_docs * 1.0 / total_docs AS doc_share,
             |  n_dup_docs * 1.0 / n_docs AS dup_rate
             |FROM t ORDER BY source, lang""".stripMargin)),

    // BPE merge APPLICATION — the leg that closes the tokenizer loop
    // t01 (pre-token counts) → t10 (vocab) → t22 (pair statistics) →
    // HERE: segment every document with t22's top-20 merges applied in
    // rank order and fingerprint the result, i.e. what a tokenizer
    // build actually does with the statistics it trained. Segmentation
    // is [[Kernels.bpeApply]]: per word, greedy left-to-right passes
    // over the char tokens, one pass per merge in rank order (the
    // honest first-round-statistics scope — true BPE recounts pairs
    // between merges; the doc comment there details the equivalence
    // with the oracle's sequential delimiter-replace). Output per doc:
    // the post-merge token count and an md5 fingerprint of the full
    // segmented form (tokens joined by US within words, words by
    // space), so the gate pins every token boundary of every document
    // without shipping corpus-sized text. Shape (§7.4 rule 12): the
    // merge table is FIXED-SIZE by construction (top-20) — it folds
    // map-side through TakeOrderedAndProject, collapses to ONE ordered
    // array row, and broadcasts into the segmentation kernel's cross
    // join; the corpus is scanned once, segment + count + md5 ride the
    // scan, and the only corpus exchange is the output sort. At 100 TB
    // nothing here shuffles or buffers beyond the 20-row sidecar.
    Q("t25_bpe_apply",
      "segment every doc with t22's top-20 merges in rank order: per-doc token count + md5 of the segmented form",
      (s, d) => {
        import s.implicits._
        val merges = bpeMergesTop20(s, d)
        docs(s, d).select(col("doc_id"), col("text"))
          .crossJoin(broadcast(merges))
          .as[(Long, String, Seq[String])]
          .mapPartitions { it =>
            var mArr: Array[String] = null
            it.map { case (id, text, ms) =>
              if (mArr == null) mArr = ms.toArray
              val words = Kernels.lowerTokens(text)
              var n = 0L
              val sb = new StringBuilder
              var wi = 0
              while (wi < words.length) {
                if (wi > 0) sb.append(' ')
                val toks = Kernels.bpeApply(words(wi), mArr)
                n += toks.length
                var ti = 0
                while (ti < toks.length) {
                  if (ti > 0) sb.append('\u001f')
                  sb.append(toks(ti))
                  ti += 1
                }
                wi += 1
              }
              (id, n, md5HexScala(sb.toString))
            }
          }
          .toDF("doc_id", "n_tokens", "seg_md5")
          .orderBy("doc_id")
      },
      Some("""WITH n AS (SELECT doc_id,
             |    coalesce(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '') AS norm
             |  FROM documents),
             |w AS (SELECT unnest(list_filter(string_split(norm, ' '), t -> t <> '')) AS word FROM n),
             |p AS (SELECT substr(word, i, 2) AS pair
             |  FROM w, unnest(range(1, len(word))) AS u(i)
             |  WHERE len(word) >= 2),
             |c AS (SELECT pair, count(*)::BIGINT AS pair_count FROM p GROUP BY pair),
             |r AS (SELECT pair, row_number() OVER (ORDER BY pair_count DESC, md5(pair)) AS rank FROM c),
             |m AS (SELECT list(pair ORDER BY rank) AS merges FROM r WHERE rank <= 20),
             |tw AS (SELECT doc_id, list_filter(string_split(norm, ' '), t -> t <> '') AS toks FROM n),
             |seg AS (SELECT doc_id, list_transform(toks, wd ->
             |    replace(trim(
             |      list_reduce(
             |        list_prepend(
             |          list_aggregate(list_transform(string_split(wd, ''),
             |            ch -> chr(30) || ch || chr(30)), 'string_agg', ''),
             |          merges),
             |        (acc, mm) -> replace(acc,
             |          chr(30) || substr(mm, 1, 1) || chr(30) || chr(30) || substr(mm, 2, 1) || chr(30),
             |          chr(30) || mm || chr(30))),
             |      chr(30)), chr(30) || chr(30), chr(31))) AS word_forms
             |  FROM tw CROSS JOIN m)
             |SELECT doc_id,
             |  coalesce(list_aggregate(list_transform(word_forms,
             |    f -> len(string_split(f, chr(31)))), 'sum'), 0)::BIGINT AS n_tokens,
             |  md5(coalesce(list_aggregate(word_forms, 'string_agg', ' '), '')) AS seg_md5
             |FROM seg ORDER BY doc_id""".stripMargin)),

    // Leak-proof split assignment — the curation step every training run
    // does LAST: partition the corpus into train/val/test. The correct
    // key is a CONTENT hash (exact duplicates must co-locate in one
    // split, or val/test scores are contaminated by memorized training
    // rows); the tempting key — doc_id, "just mod the primary key" — is
    // the classic leak, because duplicated content carries distinct ids
    // that scatter across splits. This query runs BOTH strategies over
    // one scan and emits, per (strategy, split): docs, distinct
    // contents, and how many of those contents also appear in some
    // OTHER split of the same strategy. The content-hash rows are the
    // proof (n_leaked = 0 by construction); the doc_id rows price the
    // leak on your corpus. Split math is the q16 trick: h60 of a salted
    // content key mod 10 → 0-7 train, 8 val, 9 test — deterministic,
    // engine-portable, and independent of the d01 dedup hash (different
    // salt) so split choice never correlates with dedup bucketing.
    // Shape: one corpus scan, ONE content-keyed exchange (the exact
    // leak count per content is irreducibly a groupBy content_hash —
    // d01's key; both strategies ride it via a pre-shuffle 2× unpivot),
    // then a map-side-collapsing rollup to the 2×3 report rows. The
    // per-content collect_list is bounded by the duplicate-group size —
    // the same bound d01's window carries.
    Q("t26_hash_split",
      "train/val/test split audit: content-hash vs doc_id assignment, per-split doc/content counts + cross-split content leaks",
      (s, d) => {
        val splitName = (b: Column) => when(b < 8, "train")
          .when(b === 8, "val").otherwise("test")
        // unpivot to (strategy, content_hash, split) BEFORE the exchange:
        // both strategies ride the same shuffle, keyed by the content
        // hash (d01's key), and the per-content split multiset is bounded
        // by the content's duplicate-group size
        val u = docs(s, d)
          .select(col("doc_id"), md5(normText(col("text"))).as("content_hash"))
          .select(col("content_hash"), explode(array(
            struct(lit("content_hash").as("strategy"),
              splitName(pmod(h60(concat(lit("split_"), col("content_hash"))),
                lit(10L))).as("split")),
            struct(lit("doc_id").as("strategy"),
              splitName(pmod(col("doc_id"), lit(10L))).as("split")))).as("x"))
          .select(col("x.strategy").as("strategy"), col("content_hash"),
            col("x.split").as("split"))
        u.groupBy("strategy", "content_hash")
          .agg(collect_list(col("split")).as("ss"))
          .withColumn("ds", array_distinct(col("ss")))
          .withColumn("leaked", size(col("ds")) > 1)
          .select(col("strategy"), col("leaked"), col("ss"),
            explode(col("ds")).as("split"))
          .withColumn("n_docs",
            size(filter(col("ss"), z => z === col("split"))).cast("long"))
          .groupBy("strategy", "split")
          .agg(sum(col("n_docs")).as("n_docs"),
            count(lit(1)).as("n_contents"),
            sum(when(col("leaked"), 1L).otherwise(0L)).as("n_leaked"))
          .orderBy("strategy", "split")
      },
      Some("""WITH b AS (SELECT doc_id,
             |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS content_hash
             |  FROM documents),
             |sp AS (SELECT doc_id, content_hash,
             |    CASE WHEN m < 8 THEN 'train' WHEN m = 8 THEN 'val' ELSE 'test' END AS split_c,
             |    CASE WHEN doc_id % 10 < 8 THEN 'train'
             |         WHEN doc_id % 10 = 8 THEN 'val' ELSE 'test' END AS split_i
             |  FROM (SELECT *,
             |      ('0x' || substr(md5('split_' || content_hash), 1, 15))::BIGINT % 10 AS m
             |    FROM b)),
             |u AS (SELECT content_hash, 'content_hash' AS strategy, split_c AS split FROM sp
             |  UNION ALL
             |  SELECT content_hash, 'doc_id' AS strategy, split_i AS split FROM sp),
             |pc AS (SELECT strategy, content_hash, split, count(*)::BIGINT AS n_docs
             |  FROM u GROUP BY strategy, content_hash, split),
             |lk AS (SELECT strategy, content_hash,
             |    count(*) > 1 AS leaked FROM pc GROUP BY strategy, content_hash)
             |SELECT pc.strategy, pc.split,
             |  sum(pc.n_docs)::BIGINT AS n_docs,
             |  count(*)::BIGINT AS n_contents,
             |  sum(CASE WHEN lk.leaked THEN 1 ELSE 0 END)::BIGINT AS n_leaked
             |FROM pc JOIN lk ON pc.strategy = lk.strategy
             |  AND pc.content_hash IS NOT DISTINCT FROM lk.content_hash
             |GROUP BY pc.strategy, pc.split
             |ORDER BY pc.strategy, pc.split""".stripMargin)),

    // Mixture drift monitor — the operational twin of t24's dataset
    // card: compare TODAY's batch (an md5-derived 1-in-5 hash of
    // doc_id — see driftBatchCol for why NOT the gates' doc_id%5
    // convention here) against the persisted card sidecar (per-(source,
    // lang) doc counts the ingest pipeline maintains; built once per
    // JVM via StoreFixture like the d16/t19 stores) and flag every
    // grid cell whose corpus share moved more than 2× in either
    // direction — plus 'new' (unseen cell) and 'vanished' (cell with
    // no arrivals), the two states a ratio can't express. Pipelines
    // page on this, not on the card itself: an upstream crawler change
    // shows up as a drifted source share long before any quality
    // metric moves. The 2× test is CROSS-MULTIPLIED INTEGERS
    // (batch·N_stored vs 2·stored·N_batch), so verdicts are exact at
    // any scale; the two share columns are one IEEE division each,
    // bit-equal cross-engine. Shape: batch counts collapse map-side to
    // grid size; the store enters as a scan (rule 8); everything after
    // the two aggregations — full-outer grid join, two broadcast 1-row
    // totals, the CASE — runs on |sources|×|langs| rows. At 100 TB the
    // only corpus-scale stage is the batch scan.
    Q("t27_mixture_drift",
      "per-(source, lang) share drift of today's batch vs the stored dataset card: new/vanished/over/under/stable",
      (s, d) => driftOf(docs(s, d).filter(driftBatchCol),
        cardStorePath(s, d)),
      Some("""WITH m AS (SELECT source, lang,
             |    ('0x' || substr(md5('drift_' || doc_id), 1, 15))::BIGINT % 5 = 4 AS in_batch
             |  FROM documents),
             |st AS (SELECT source, lang, count(*)::BIGINT AS stored_docs
             |  FROM m WHERE NOT in_batch GROUP BY 1, 2),
             |ba AS (SELECT source, lang, count(*)::BIGINT AS batch_docs
             |  FROM m WHERE in_batch GROUP BY 1, 2),
             |g AS (SELECT coalesce(st.source, ba.source) AS source,
             |    coalesce(st.lang, ba.lang) AS lang,
             |    coalesce(stored_docs, 0)::BIGINT AS stored_docs,
             |    coalesce(batch_docs, 0)::BIGINT AS batch_docs
             |  FROM st FULL OUTER JOIN ba
             |    ON st.source = ba.source AND st.lang = ba.lang),
             |t AS (SELECT (SELECT sum(stored_docs) FROM g)::BIGINT AS n_s,
             |    (SELECT sum(batch_docs) FROM g)::BIGINT AS n_b)
             |SELECT source, lang, stored_docs, batch_docs,
             |  stored_docs * 1.0 / n_s AS stored_share,
             |  batch_docs * 1.0 / n_b AS batch_share,
             |  CASE WHEN stored_docs = 0 THEN 'new'
             |       WHEN batch_docs = 0 THEN 'vanished'
             |       WHEN batch_docs::HUGEINT * n_s > stored_docs::HUGEINT * n_b * 2 THEN 'over'
             |       WHEN batch_docs::HUGEINT * n_s * 2 < stored_docs::HUGEINT * n_b THEN 'under'
             |       ELSE 'stable' END AS status
             |FROM g CROSS JOIN t ORDER BY source, lang""".stripMargin)),

    // N-gram-profile language ID (Cavnar & Trenkle 1994) — the trained
    // upgrade of t03's marker screen, and the langid that gates every
    // multilingual mixture decision (t07/t16/t23 key on `lang`):
    // per-language top-200 character-trigram profiles build from the
    // labeled train slice (doc_id%5<>4); each held-out doc's top-50
    // trigram profile scores against every language by OUT-OF-PLACE
    // distance — sum over the doc's ranked trigrams of |doc rank −
    // language rank|, missing trigram = the profile size 200 — and the
    // argmin (t03's en-first priority chain) predicts. Every rank and
    // distance is an exact integer; ties inside a profile break on
    // md5(trigram) (t18's tiebreak), so both engines rank identically.
    // On THIS corpus the labels carry no character signal (one shared
    // vocabulary — accuracy is chance, same caveat as t03); the planted
    // fixture spec is where the capability shows. See [[ngramLangId]]
    // for the scale shape.
    Q("t28_ngram_langid",
      "character-trigram profile language ID: out-of-place distance to top-200 per-language profiles",
      (s, d) => ngramLangId(docs(s, d)),
      Some(sqlNgramLangId)),

    // URL/domain-level gating — the axis real crawls key quality on
    // (C4/RefinedWeb blocklists, per-domain caps): registrable-domain
    // (eTLD+1) extraction, a planted blocklist gate, and t24's
    // dedup-pressure card re-cut at domain grain, so "which domains are
    // blocked / template-heavy" is one report. The corpus has no URL
    // column, so a deterministic synthetic URL stands in (md5-derived
    // subdomain + source-derived host + md5-derived public suffix +
    // path — the t20/m01 stand-in discipline: the DERIVATION is
    // throwaway, the extraction/gate/report plumbing is what
    // transfers). Extraction handles multi-label public suffixes
    // (co.uk/ac.uk — longest-suffix-first CASE chain over the PSL
    // subset; the full list is configuration, t20's class-list
    // rationale) and strips arbitrary subdomains. Scale: URL build,
    // host parse and registrable-domain extraction are codegen'd
    // regex/string expressions riding the scan; the content-hash dup
    // window and domain rollup are t24's two corpus exchanges; the
    // blocklist is a broadcast fixture table; shares run on the
    // |domains|-row grid.
    Q("t29_domain_gate",
      "registrable-domain blocklist gate + per-domain dedup-pressure card (docs/tokens/dup-rate/share)",
      (s, d) => {
        val sub = element_at(typedlit(Seq("www.", "cdn.", "blog.", "")),
          (h60(concat(lit("sub_"), col("doc_id").cast("string"))) % 4 + 1)
            .cast("int"))
        val sfx = element_at(typedlit(Seq("com", "org", "net", "co.uk", "ac.uk")),
          (h60(concat(lit("tld_"), col("source"))) % 5 + 1).cast("int"))
        val url = concat(lit("https://"), sub, col("source"), lit("."),
          sfx, lit("/doc/"), col("doc_id").cast("string"))
        val w = Window.partitionBy(col("content_hash"))
        val flagged = docs(s, d)
          .select(col("doc_id"), col("source"),
            size(tokens(col("text"))).cast("long").as("n_tok"),
            md5(normText(col("text"))).as("content_hash"),
            registrableOf(
              regexp_extract(url, "^[a-z]+://([^/]+)", 1)).as("domain"))
          .withColumn("is_dup",
            col("doc_id") =!= min(col("doc_id")).over(w))
        val per = flagged.groupBy("domain").agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("n_tokens"),
          sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup_docs"))
        val block = s.read.text(s"$fixtures/blocklist.txt")
          .select(trim(col("value")).as("domain"))
          .withColumn("in_blocklist", lit(true))
        val wAll = Window.partitionBy()
        per.join(broadcast(block), Seq("domain"), "left")
          .withColumn("blocked", coalesce(col("in_blocklist"), lit(false)))
          .withColumn("total_docs", sum(col("n_docs")).over(wAll))
          .select(col("domain"), col("blocked"),
            when(col("blocked"), "toss_blocklist").otherwise("keep")
              .as("verdict"),
            col("n_docs"), col("n_tokens"), col("n_dup_docs"),
            (col("n_docs") * lit(1.0) / col("total_docs")).as("doc_share"),
            (col("n_dup_docs") * lit(1.0) / col("n_docs")).as("dup_rate"))
          .orderBy("domain")
      },
      Some(s"""WITH u AS (SELECT doc_id, source, text,
             |    'https://' ||
             |    ['www.', 'cdn.', 'blog.', ''][(('0x' || substr(md5('sub_' || doc_id), 1, 15))::BIGINT % 4) + 1] ||
             |    source || '.' ||
             |    ['com', 'org', 'net', 'co.uk', 'ac.uk'][(('0x' || substr(md5('tld_' || source), 1, 15))::BIGINT % 5) + 1] ||
             |    '/doc/' || doc_id AS url
             |  FROM documents),
             |h AS (SELECT doc_id, text, regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host FROM u),
             |rd AS (SELECT doc_id, text,
             |    CASE WHEN regexp_matches(host, '(^|\\.)[^.]+\\.co\\.uk$$')
             |           THEN regexp_extract(host, '([^.]+\\.co\\.uk)$$', 1)
             |         WHEN regexp_matches(host, '(^|\\.)[^.]+\\.ac\\.uk$$')
             |           THEN regexp_extract(host, '([^.]+\\.ac\\.uk)$$', 1)
             |         ELSE regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) END AS domain
             |  FROM h),
             |f AS (SELECT doc_id, domain,
             |    len($sqlToks)::BIGINT AS n_tok,
             |    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_hash
             |  FROM rd),
             |fl AS (SELECT *, doc_id <> min(doc_id) OVER (PARTITION BY content_hash) AS is_dup
             |  FROM f),
             |per AS (SELECT domain, count(*)::BIGINT AS n_docs,
             |    sum(n_tok)::BIGINT AS n_tokens,
             |    sum(CASE WHEN is_dup THEN 1 ELSE 0 END)::BIGINT AS n_dup_docs
             |  FROM fl GROUP BY 1),
             |bl AS (SELECT trim(bd) AS domain
             |  FROM read_csv('$fixtures/blocklist.txt', delim='', header=false, columns={'bd': 'VARCHAR'})),
             |t AS (SELECT *, sum(n_docs) OVER ()::BIGINT AS total_docs FROM per)
             |SELECT t.domain, (bl.domain IS NOT NULL) AS blocked,
             |  CASE WHEN bl.domain IS NOT NULL THEN 'toss_blocklist' ELSE 'keep' END AS verdict,
             |  n_docs, n_tokens, n_dup_docs,
             |  n_docs * 1.0 / total_docs AS doc_share,
             |  n_dup_docs * 1.0 / n_docs AS dup_rate
             |FROM t LEFT JOIN bl ON t.domain = bl.domain
             |ORDER BY t.domain""".stripMargin)),

    // Count-min sketch phrase-frequency estimation (Cormode &
    // Muthukrishnan '05) — the bounded-state frequency summary for keys
    // too numerous to count exactly. The exact 3-gram frequency table
    // is VOCABULARY-sized (the t10/t21 shuffle); the CMS is d×W cells
    // (3×1024 here) REGARDLESS of how many distinct phrases exist:
    // shards merge by cell-wise addition (the q45 mergeability
    // discipline, here as a plain groupBy), and probing is d cell
    // lookups. Estimates only ever OVERCOUNT (each cell is a superset
    // sum), and min-over-rows is the estimator — both properties
    // hash-gated exactly because the row hashes are md5-derived h60
    // (deterministic in both engines; this is why CMS is gate-able
    // bit-for-bit where a sampled sketch wouldn't be). The probe set is
    // a fixed 100-phrase hash-ranked sample (TakeOrderedAndProject —
    // no full-vocab sort materializes); W = 1024 against ~15k distinct
    // fixture trigrams so collisions genuinely engage the min estimator
    // (production widths are 2^20+; accuracy tunes with W at the same
    // plan shape). no_underestimate is the CMS guarantee and must be
    // uniformly true.
    Q("t30_cms_ngram_freq",
      "count-min sketch (3x1024, md5 rows) over token 3-grams: exact vs min-over-rows estimate for a fixed 100-phrase probe set",
      (s, d) => {
        val Depth = 3
        val W = 1024L
        // every 3-gram OCCURRENCE (not distinct — frequency semantics).
        // toks is MATERIALIZED as a projection first: inlining the
        // split+filter expression into the transform lambda re-evaluates
        // it per element_at (no CSE inside HOF lambdas) — measured 14.8 s
        // vs 1.7 s at sf0.1 for the same logical result.
        val t3 = col("toks")
        val grams = docs(s, d)
          .select(filter(split(normText(col("text")), " "),
            t => t =!= lit("")).as("toks"))
          .select(explode(when(size(t3) >= 3,
            transform(sequence(lit(1), size(t3) - 2), i =>
              concat_ws(" ", element_at(t3, i), element_at(t3, i + 1),
                element_at(t3, i + 2))))
            .otherwise(array().cast("array<string>"))).as("gram"))
        val tf = grams.groupBy("gram").agg(count(lit(1)).as("tf_exact"))
        def bucket(j: Int, g: Column): Column =
          h60(concat(lit(s"cms${j}_"), g)) % W
        val cells = grams
          .select(posexplode(array((0 until Depth).map(j =>
            bucket(j, col("gram"))): _*)).as(Seq("j", "bucket")))
          .groupBy("j", "bucket").agg(count(lit(1)).as("cnt"))
        val probes = tf
          .orderBy(h60(concat(lit("cmsq_"), col("gram"))).asc, col("gram").asc)
          .limit(100)
        probes
          .select(col("gram"), col("tf_exact"),
            posexplode(array((0 until Depth).map(j =>
              bucket(j, col("gram"))): _*)).as(Seq("j", "bucket")))
          .join(broadcast(cells), Seq("j", "bucket"))
          .groupBy("gram", "tf_exact")
          .agg(min(col("cnt")).as("est"))
          .select(col("gram"), col("tf_exact"), col("est"),
            (col("est") >= col("tf_exact")).as("no_underestimate"))
          .orderBy("gram")
      },
      Some("""WITH n AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS text FROM documents),
             |tk AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks FROM n),
             |e AS (SELECT unnest(CASE WHEN len(toks) >= 3
             |    THEN list_transform(range(1, len(toks) - 1),
             |      i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])
             |    ELSE [] END) AS gram
             |  FROM tk),
             |tf AS (SELECT gram, count(*)::BIGINT AS tf_exact FROM e GROUP BY 1),
             |js AS (SELECT unnest(range(0, 3)) AS j),
             |cells AS (SELECT j,
             |    ('0x' || substr(md5('cms' || j || '_' || gram), 1, 15))::BIGINT % 1024 AS bucket,
             |    count(*)::BIGINT AS cnt
             |  FROM e CROSS JOIN js GROUP BY 1, 2),
             |probes AS (SELECT gram, tf_exact FROM tf
             |  ORDER BY ('0x' || substr(md5('cmsq_' || gram), 1, 15))::BIGINT, gram LIMIT 100),
             |pj AS (SELECT p.gram, p.tf_exact, js.j,
             |    ('0x' || substr(md5('cms' || js.j || '_' || p.gram), 1, 15))::BIGINT % 1024 AS bucket
             |  FROM probes p CROSS JOIN js)
             |SELECT pj.gram, pj.tf_exact, min(c.cnt) AS est,
             |  min(c.cnt) >= pj.tf_exact AS no_underestimate
             |FROM pj JOIN cells c ON pj.j = c.j AND pj.bucket = c.bucket
             |GROUP BY 1, 2 ORDER BY gram""".stripMargin)),

    // BM25 lexical retrieval (Robertson & Spärck Jones's probabilistic
    // ranking, the Okapi form) — the LEXICAL leg the similarity family
    // was missing: s01–s18 rank by embedding cosine; production
    // retrieval (and every hybrid-search stack) pairs that with an
    // inverted-index keyword ranker. Scoring is integer-exact end to
    // end (see [[bm25Scored]]): k1 = 6/5 and b = 3/4 are exact
    // rationals, avgdl is the floored integer mean, and idf is the
    // rational surrogate (N+1)/(df+0.5) WITHOUT the log — t21's
    // monotone-transform discipline. The log matters only when
    // CROSS-term sums must trade off frequent vs rare terms on a
    // damped scale; the divergence from textbook BM25 is a documented
    // constant-shape choice, not an approximation error, and it buys a
    // bit-exact oracle in any engine with 64-bit integer division.
    // Workload is the pinned id-window query-doc set (the s01
    // convention): each query doc contributes its 4 md5-ranked distinct
    // long tokens (≥ 7 chars — the rare-ish content words), so the
    // workload is fixed-size at every SF.
    Q("t31_bm25_topk",
      "inverted-index BM25 top-10 per query doc: integer-exact Okapi scoring (rational idf), pinned 4-term queries",
      (s, d) => bm25Top10(bm25Scored(s, d)),
      Some(sqlBm25Top10)),

    // t31's INCREMENTAL twin — the segment-merge discipline every
    // production search engine runs (Lucene segments, ES/OpenSearch
    // shards): the inverted index is a PERSISTED store of aggregated
    // postings (doc_id, token, tf, dl) appended per ingest batch under
    // `batch_id=K`; query time reads the STORE and never re-tokenizes
    // the corpus (the d15/d16/d18/t19 warehouse-sidecar family, now
    // for retrieval). Because each document lives wholly in one batch,
    // the multi-batch merge is a pure union-at-read (partition
    // discovery over batch subdirs — not even an additive fold): df is
    // a count over merged postings, totals re-derive from per-doc dl,
    // and the scoring tail is t31's verbatim. The gate runs against a
    // TWO-batch store (docs split doc_id % 2) and is hash-gated by
    // t31's oracle — stored-index scoring must be bit-identical to the
    // full recompute, the "incremental ≡ rebuild" contract every store
    // in the family pins. Scale: the store is postings-sized and
    // pre-aggregated (the tf groupBy is the PRODUCER's amortized
    // cost); the consumer's only corpus-scale work is the store scan +
    // broadcast-semi probe — strictly cheaper than t31, measured and
    // plan-asserted (no documents.parquet scan anywhere in the plan).
    Q("t32_bm25_store_topk",
      "BM25 top-10 from the persisted two-batch postings store: corpus text never re-read, bit-equal to t31",
      (s, d) => bm25StoreTopK(s, bm25StorePath(s, d)),
      Some(sqlBm25Top10)),

    // MODEL-BASED quality filtering (the fastText-classifier shape that
    // DCLM/RefinedWeb/FineWeb-Edu use in place of pure heuristics):
    // distill a labeling rule into a TOKEN-LINEAR model — naive-Bayes
    // style per-token weights w = f_pos − f_neg in ppm (integer
    // fixed-point: (cnt·10⁶) div class_total, exact in both engines) —
    // then score the whole corpus with one narrow pass against the
    // BROADCAST model. Training is SAMPLE-BOUNDED by construction: the
    // labeled slice is the pinned id-window (doc_id % 5 = 4 AND
    // doc_id < 2000 — the s01/m05 workload convention: covers the whole
    // corpus at gate SFs, fixed-size at scale), so vocab build (top-256
    // by slice frequency, md5 tiebreak — the t18 fixed-model rule) and
    // threshold calibration are O(1) in corpus size. The decision
    // threshold is LEARNED, not assumed (fastText's bias): candidate
    // cuts = the train docs' length-normalized scores (snorm =
    // score/n_tokens, ONE IEEE double division per doc — portable, the
    // q45 pinned-operand-order discipline); argmax train accuracy, ties
    // to the smallest cut — a deterministic integer-comparison argmax
    // over a sample-sized grid. Scale shape: the corpus-side cost is a
    // (doc_id, text) scan, a broadcast-hash join of exploded tokens
    // against 256 weights, one map-side-partial doc rollup, and the
    // output sort; everything else is sample-sized. Held-out agreement
    // with the teacher rule is ~0.81 at sf0.01 — the audit column the
    // spec gates (vs 0.52 majority baseline).
    Q("t33_quality_classifier",
      "distilled token-linear quality classifier: ppm weights + calibrated threshold from a pinned train sample, corpus scored via broadcast model",
      (s, d) => {
        val lab = clfLabeled(docs(s, d))
        val (w, best) = clfModelOf(
          lab.filter(col("doc_id") % 5 === 4 && col("doc_id") < 2000))
        clfScoreOf(
          lab.filter(col("doc_id") % 5 =!= 4 || col("doc_id") >= 2000),
          w, best)
      },
      Some(sqlQualityClassifier)),

    // t33's SERVING twin, extending the warehouse-sidecar family
    // (d15/d16/d18 stores, t19's LM sidecar, t32's postings store) to
    // the distilled model: production classifiers train ONCE and score
    // every subsequent batch from the PERSISTED model — a (token,
    // weight) table plus the calibrated threshold row — never
    // re-deriving weights from the labeled slice. The consumer's plan
    // contains no train-slice derivation at all (no pinned-window scan,
    // no calibration grid — plan-asserted): its corpus-scale work is
    // exactly t33's scoring pass, a narrow scan + broadcast model join
    // + per-doc rollup; the model store scan is 256+1 rows. Gated by
    // t33's oracle VERBATIM — stored-model scoring must be bit-identical
    // to the retrain, the family's "incremental ≡ rebuild" contract.
    Q("t35_classifier_store",
      "t33's scorer against the persisted (token, weight) + threshold model store — train path never re-run",
      (s, d) => {
        val p = clfStorePath(s, d)
        val lab = clfLabeled(docs(s, d))
        clfScoreOf(
          lab.filter(col("doc_id") % 5 =!= 4 || col("doc_id") >= 2000),
          s.read.parquet(s"$p/weights"),
          s.read.parquet(s"$p/threshold"))
      },
      Some(sqlQualityClassifier)),

    // JSONL corpus ingest — the interchange format LLM corpora actually
    // ship in (The Pile, C4, RefinedWeb, FineWeb are all
    // newline-delimited JSON): schema-PROJECTED parse (the reader
    // Jackson-streams past fields the schema doesn't name — extra_field
    // in the fixture is ignored, not an error), missing optional fields
    // land as NULL and are defaulted downstream (lang → 'und', the
    // BCP-47 undetermined tag), and malformed lines follow the
    // DEAD-LETTER flow: PERMISSIVE mode parses them to an all-null row
    // carrying the raw line in _corrupt_record — the pipeline counts
    // them (attached as a 1-row broadcast total) instead of failing the
    // job, and the spec pins the quarantined payloads verbatim. Scale:
    // JSONL is line-splittable, so the parse parallelizes like any text
    // scan and the projection prunes at the tokenizer, not after.
    // Oracle: DuckDB's read_json with ignore_errors lands the SAME
    // all-null rows for the two planted corrupt lines, so valid-row
    // selection, null-field defaults and the quarantine count are all
    // engine-portable.
    Q("t37_jsonl_ingest",
      "JSONL corpus ingest: schema-projected parse, missing-field defaults, corrupt-line quarantine count",
      (s, d) => {
        val raw = s.read
          .schema("doc_id LONG, text STRING, lang STRING, source STRING, " +
            "_corrupt_record STRING")
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .json(s"$fixtures/docs.jsonl")
        // quarantine = failed full parse OR missing PK — the disjunction
        // is load-bearing: with partial-results parsing (default since
        // Spark 3.4) a doc_id-only pruned scan SALVAGES the id from a
        // line whose tail is malformed, so a doc_id-IS-NULL test alone
        // is projection-DEPENDENT (this query's two legs would disagree
        // with each other); referencing _corrupt_record pins the
        // full-parse verdict in both legs
        val quar = raw
          .filter(col("_corrupt_record").isNotNull || col("doc_id").isNull)
          .agg(count(lit(1)).as("n_quarantined"))
        raw.filter(col("_corrupt_record").isNull && col("doc_id").isNotNull)
          .select(col("doc_id"),
            size(tokens(col("text"))).cast("long").as("n_tokens"),
            coalesce(col("lang"), lit("und")).as("lang"), col("source"))
          .crossJoin(broadcast(quar))
          .orderBy("doc_id")
      },
      Some(s"""WITH r AS (SELECT doc_id, text, lang, source
             |  FROM read_json('$fixtures/docs.jsonl',
             |    format='newline_delimited',
             |    columns={'doc_id': 'BIGINT', 'text': 'VARCHAR',
             |      'lang': 'VARCHAR', 'source': 'VARCHAR'},
             |    ignore_errors=true)),
             |q AS (SELECT count(*)::BIGINT AS n_quarantined FROM r
             |  WHERE doc_id IS NULL)
             |SELECT doc_id, len($sqlToks)::BIGINT AS n_tokens,
             |  coalesce(lang, 'und') AS lang, source, n_quarantined
             |FROM r, q WHERE doc_id IS NOT NULL ORDER BY doc_id""".stripMargin)),

    // VALIDATED PII detection — the checksum pass that separates
    // production PII scrubbing from t20's pattern matching: a 13-19
    // digit run that LOOKS like a payment card is only treated as one
    // if its Luhn mod-10 checksum holds (ISO/IEC 7812 — the test every
    // real DLP pipeline applies, because digit-run regexes alone drown
    // in false positives: the fixture's planted invalid-checksum and
    // wrong-length runs are exactly the rows the validator must
    // reject). Candidates come from one regexp_extract_all riding the
    // scan; the Luhn fold is a higher-order `aggregate` over the
    // reversed digit string — all codegen'd builtins, integer-exact,
    // with the identical list_transform fold in the oracle. Output is
    // candidate-grain (doc, ordinal BEFORE the length filter — so both
    // engines number identically — digits length, PCI-display last4,
    // verdict) and therefore bound by candidate density, not corpus
    // size; the digit-free driver corpus unions with a planted fixture
    // (the t29 blocklist / c11 amplicon discipline) so the gate is
    // non-vacuous: valid cards plain/space/dash-grouped at 13/15/16/19
    // digits, checksum-flipped twins, too-short/too-long runs, and
    // multi-candidate docs mixing verdicts.
    Q("t36_pii_luhn",
      "Luhn-validated card-number detection: regex candidates, mod-10 checksum verdicts, PCI last4 at candidate grain",
      (s, d) => {
        val fix = s.read.option("sep", "\t").option("header", "true")
          .schema("doc_id LONG, text STRING")
          .csv(s"$fixtures/pii_docs.tsv")
        docs(s, d).select("doc_id", "text").unionByName(fix)
          .select(col("doc_id"), posexplode(
            expr("regexp_extract_all(text, '[0-9][0-9 -]{11,22}[0-9]', 0)")))
          .select(col("doc_id"), (col("pos") + 1).cast("long").as("cand_idx"),
            regexp_replace(col("col"), "[ -]", "").as("ds"))
          .filter(length(col("ds")).between(13, 19))
          .withColumn("rev", reverse(col("ds")))
          .select(col("doc_id"), col("cand_idx"),
            length(col("ds")).cast("long").as("n_digits"),
            expr("right(ds, 4)").as("last4"),
            (expr("""aggregate(sequence(1, length(rev)), 0L, (acc, i) ->
              acc + CASE WHEN i % 2 = 1
                THEN cast(substring(rev, i, 1) AS LONG)
                ELSE CASE WHEN cast(substring(rev, i, 1) AS LONG) > 4
                  THEN cast(substring(rev, i, 1) AS LONG) * 2 - 9
                  ELSE cast(substring(rev, i, 1) AS LONG) * 2 END END)""")
              % 10 === 0).as("luhn_valid"))
          .orderBy("doc_id", "cand_idx")
      },
      Some(s"""WITH a AS (SELECT doc_id, text FROM documents
             |  UNION ALL SELECT doc_id, text FROM read_csv(
             |    '$fixtures/pii_docs.tsv', delim='\\t', header=true,
             |    columns={'doc_id': 'BIGINT', 'text': 'VARCHAR'})),
             |x AS (SELECT doc_id,
             |    regexp_extract_all(text, '[0-9][0-9 -]{11,22}[0-9]') AS l
             |  FROM a),
             |e AS (SELECT doc_id, unnest(l) AS cand,
             |    unnest(range(1, len(l) + 1)) AS cand_idx FROM x),
             |n AS (SELECT doc_id, cand_idx,
             |    regexp_replace(cand, '[ -]', '', 'g') AS ds FROM e),
             |f AS (SELECT doc_id, cand_idx, ds, reverse(ds) AS rev FROM n
             |  WHERE length(ds) BETWEEN 13 AND 19)
             |SELECT doc_id, cand_idx, length(ds)::BIGINT AS n_digits,
             |  right(ds, 4) AS last4,
             |  list_sum(list_transform(range(1, length(rev) + 1), i ->
             |    CASE WHEN i % 2 = 1 THEN substr(rev, i::INT, 1)::BIGINT
             |      ELSE CASE WHEN substr(rev, i::INT, 1)::BIGINT > 4
             |        THEN substr(rev, i::INT, 1)::BIGINT * 2 - 9
             |        ELSE substr(rev, i::INT, 1)::BIGINT * 2 END END))
             |    % 10 = 0 AS luhn_valid
             |FROM f ORDER BY doc_id, cand_idx""".stripMargin)),

    // Domain-authority ranking — PageRank over the host link graph, the
    // signal CommonCrawl derives for every crawl (host/domain-level
    // ranks from harmonic centrality / PageRank) and quality pipelines
    // join as a per-domain weight. Power iteration in INTEGER
    // fixed-point so the gate is hash-exact: ranks are micro-units of
    // 10¹² total mass, one round is r' = (15·10¹²) div (100·N) +
    // Σ_in cnt·((r_src·85) div (100·outdeg_src)) — floor at every
    // step, sums of integers are order-free, both engines agree
    // bit-for-bit. Five fixed rounds (the d09 bounded-loop discipline,
    // minus convergence detection — power iteration is paced by round
    // count, not a fixpoint test), each round = one edge⋈rank join +
    // one map-side-partial target rollup + one node left-join,
    // localCheckpoint-ed to bound lineage: the Pregel superstep shape,
    // everything at GRAPH grain (hosts ≪ corpus). The corpus is
    // touched exactly once, to derive edges. Dangling nodes lose their
    // mass (no redistribution — documented divergence from textbook
    // PageRank; the teleport term keeps every rank positive), and the
    // fixture graph plants one on purpose (idx 0 only ever links to
    // itself, and self-edges drop). The corpus has no link column, so
    // a deterministic synthetic graph stands in (the t29 URL
    // discipline): domains are t29's registrable domains by
    // construction, each doc emits 3 outlinks whose target ordinal is
    // h60 % (src_ordinal + 1) — md5-skewed toward low-ordinal domains,
    // so the rank vector is genuinely non-uniform (hubs + dangling).
    // The ordinal index exists only for this synthetic derivation
    // (real crawls ship edge lists); its global row_number runs once
    // at host grain.
    Q("t34_domain_pagerank",
      "integer fixed-point PageRank over the synthetic domain link graph: 5 Pregel rounds, hubs + dangling node, micro-unit ranks",
      (s, d) => {
        val M = 1000000000000L
        val (nodes, edges) = domainGraph(s, d)
        // Rounds keep the per-round eager checkpoint DELIBERATELY: the
        // t42-style chained form was tried this round and measured
        // SLOWER (1.31 → 1.44 s best-of-3 at sf0.1/32c) — five chained
        // join+agg stages make one deep AQE plan whose per-stage
        // re-optimization costs more than the five small cache jobs it
        // removes. Chaining wins where rounds are narrow maps (t42's
        // MapElements); it loses where each round is a join+shuffle.
        var ranks = nodes.select(col("idx"), expr(s"$M div n").as("r"))
          .localCheckpoint(true)
        for (_ <- 1 to 5) {
          val contrib = edges
            .join(ranks.withColumnRenamed("idx", "src"), Seq("src"))
            .select(col("tgt"),
              (col("cnt") * expr("(r * 85) div (100 * outdeg)")).as("m"))
            .groupBy("tgt").agg(sum(col("m")).as("m"))
          ranks = nodes.select(col("idx"), col("n"))
            .join(contrib.withColumnRenamed("tgt", "idx"), Seq("idx"), "left")
            .select(col("idx"),
              (expr(s"(15 * $M) div (100 * n)") +
                coalesce(col("m"), lit(0L))).as("r"))
            .localCheckpoint(true)
        }
        nodes.select("domain", "n_docs", "idx")
          .join(edges.select(col("src").as("idx"), col("outdeg")).distinct(),
            Seq("idx"), "left")
          .join(ranks, Seq("idx"))
          .select(col("domain"), col("n_docs"),
            coalesce(col("outdeg"), lit(0L)).as("outdeg"),
            col("r").as("rank_micro"),
            (col("r").cast("double") / lit(M.toDouble)).as("rank_share"))
          .orderBy("domain")
      },
      Some("""WITH dom AS (SELECT doc_id, source || '.' ||
             |    ['com','org','net','co.uk','ac.uk'][
             |      (('0x' || substr(md5('tld_' || source), 1, 15))::BIGINT % 5) + 1]
             |    AS domain
             |  FROM documents),
             |nodes AS (SELECT domain, count(*)::BIGINT AS n_docs,
             |    (row_number() OVER (ORDER BY domain) - 1)::BIGINT AS idx
             |  FROM dom GROUP BY domain),
             |nn AS (SELECT count(*)::BIGINT AS n FROM nodes),
             |e1 AS (SELECT src, tgt, count(*)::BIGINT AS cnt FROM (
             |    SELECT nd.idx AS src,
             |      ('0x' || substr(md5('lnk_' || d.doc_id || '_' || j.j), 1, 15))::BIGINT
             |        % (nd.idx + 1) AS tgt
             |    FROM dom d JOIN nodes nd ON d.domain = nd.domain
             |    CROSS JOIN (SELECT unnest(range(0, 3)) AS j) j)
             |  WHERE src <> tgt GROUP BY 1, 2),
             |e AS (SELECT e1.src, e1.tgt, e1.cnt, od.outdeg
             |  FROM e1 JOIN (SELECT src, sum(cnt)::BIGINT AS outdeg
             |    FROM e1 GROUP BY 1) od USING (src)),
             |r0 AS (SELECT idx, 1000000000000 // n AS r FROM nodes, nn),
             |c1 AS (SELECT e.tgt AS idx,
             |    sum(e.cnt * ((p.r * 85) // (100 * e.outdeg)))::BIGINT AS m
             |  FROM e JOIN r0 p ON e.src = p.idx GROUP BY 1),
             |r1 AS (SELECT nodes.idx,
             |    (15 * 1000000000000) // (100 * n) + coalesce(c1.m, 0) AS r
             |  FROM nodes CROSS JOIN nn LEFT JOIN c1 ON nodes.idx = c1.idx),
             |c2 AS (SELECT e.tgt AS idx,
             |    sum(e.cnt * ((p.r * 85) // (100 * e.outdeg)))::BIGINT AS m
             |  FROM e JOIN r1 p ON e.src = p.idx GROUP BY 1),
             |r2 AS (SELECT nodes.idx,
             |    (15 * 1000000000000) // (100 * n) + coalesce(c2.m, 0) AS r
             |  FROM nodes CROSS JOIN nn LEFT JOIN c2 ON nodes.idx = c2.idx),
             |c3 AS (SELECT e.tgt AS idx,
             |    sum(e.cnt * ((p.r * 85) // (100 * e.outdeg)))::BIGINT AS m
             |  FROM e JOIN r2 p ON e.src = p.idx GROUP BY 1),
             |r3 AS (SELECT nodes.idx,
             |    (15 * 1000000000000) // (100 * n) + coalesce(c3.m, 0) AS r
             |  FROM nodes CROSS JOIN nn LEFT JOIN c3 ON nodes.idx = c3.idx),
             |c4 AS (SELECT e.tgt AS idx,
             |    sum(e.cnt * ((p.r * 85) // (100 * e.outdeg)))::BIGINT AS m
             |  FROM e JOIN r3 p ON e.src = p.idx GROUP BY 1),
             |r4 AS (SELECT nodes.idx,
             |    (15 * 1000000000000) // (100 * n) + coalesce(c4.m, 0) AS r
             |  FROM nodes CROSS JOIN nn LEFT JOIN c4 ON nodes.idx = c4.idx),
             |c5 AS (SELECT e.tgt AS idx,
             |    sum(e.cnt * ((p.r * 85) // (100 * e.outdeg)))::BIGINT AS m
             |  FROM e JOIN r4 p ON e.src = p.idx GROUP BY 1),
             |r5 AS (SELECT nodes.idx,
             |    (15 * 1000000000000) // (100 * n) + coalesce(c5.m, 0) AS r
             |  FROM nodes CROSS JOIN nn LEFT JOIN c5 ON nodes.idx = c5.idx)
             |SELECT nodes.domain, nodes.n_docs,
             |  coalesce(od.outdeg, 0)::BIGINT AS outdeg,
             |  r5.r AS rank_micro,
             |  r5.r::DOUBLE / 1000000000000.0 AS rank_share
             |FROM nodes
             |LEFT JOIN (SELECT src, sum(cnt)::BIGINT AS outdeg FROM e1 GROUP BY 1) od
             |  ON nodes.idx = od.src
             |JOIN r5 ON nodes.idx = r5.idx
             |ORDER BY nodes.domain""".stripMargin)),

    // Hop-bounded multi-source reachability over the same host graph —
    // the crawl-frontier / link-spam-neighborhood question ("which
    // domains sit within k hops of the trusted seed set") and the one
    // relational shape the registry lacked: the RECURSIVE CTE. The
    // oracle IS that shape (DuckDB WITH RECURSIVE, UNION-deduped path
    // enumeration); the Spark side is its scale-correct physical form —
    // BFS with an explicit frontier: per round one frontier⋈edges hash
    // join at GRAPH grain, a distinct on the candidate set, and an
    // anti-join against the settled set so each node is expanded
    // exactly once (first touch = min hops, the BFS invariant the
    // oracle recovers with min(hops) over all enumerated paths).
    // Rounds are hop-capped (production runs until the frontier
    // empties — the d09 convergence discipline); localCheckpoint per
    // round bounds lineage exactly like t34's power iteration. At
    // 100 TB the corpus is touched once (edge derivation); every BFS
    // round moves only the frontier — fixed-width rows at host grain.
    Q("t38_domain_reachability",
      "multi-source BFS over the domain link graph: min-hop distance from the seeded trust set, 4 hops, frontier-expanded once per node",
      (s, d) => {
        val (nodes, edges) = domainGraph(s, d)
        val seedCond =
          (h60(concat(lit("seed_"), col("domain"))) % 5 === 0) ||
            col("idx") === 0L
        var settled = nodes.filter(seedCond)
          .select(col("idx"), lit(0L).as("hops")).localCheckpoint(true)
        var frontier = settled
        for (h <- 1 to 4) {
          val next = frontier
            .join(edges.select(col("src").as("idx"), col("tgt")), Seq("idx"))
            .select(col("tgt").as("idx")).distinct()
            .join(settled.select("idx"), Seq("idx"), "left_anti")
            .select(col("idx"), lit(h.toLong).as("hops"))
            .localCheckpoint(true)
          // `next` stays checkpointed (two consumers per round: the
          // union and the next frontier join); the union itself is a
          // cheap concat of ≤ h cached frames — checkpointing IT too
          // paid one eager cache job per round for nothing (t42/t34
          // discipline)
          settled = settled.unionByName(next)
          frontier = next
        }
        nodes.join(settled, Seq("idx"), "left")
          .select(col("domain"), col("n_docs"),
            (col("hops") <=> lit(0L)).as("is_seed"),
            col("hops"),
            col("hops").isNotNull.as("reached"))
          .orderBy("domain")
      },
      Some("""WITH RECURSIVE dom AS (SELECT doc_id, source || '.' ||
             |    ['com','org','net','co.uk','ac.uk'][
             |      (('0x' || substr(md5('tld_' || source), 1, 15))::BIGINT % 5) + 1]
             |    AS domain
             |  FROM documents),
             |nodes AS (SELECT domain, count(*)::BIGINT AS n_docs,
             |    (row_number() OVER (ORDER BY domain) - 1)::BIGINT AS idx
             |  FROM dom GROUP BY domain),
             |e1 AS (SELECT src, tgt FROM (
             |    SELECT nd.idx AS src,
             |      ('0x' || substr(md5('lnk_' || d.doc_id || '_' || j.j), 1, 15))::BIGINT
             |        % (nd.idx + 1) AS tgt
             |    FROM dom d JOIN nodes nd ON d.domain = nd.domain
             |    CROSS JOIN (SELECT unnest(range(0, 3)) AS j) j)
             |  WHERE src <> tgt GROUP BY 1, 2),
             |rr(idx, hops) AS (
             |  SELECT idx, 0::BIGINT AS hops FROM nodes
             |  WHERE ('0x' || substr(md5('seed_' || domain), 1, 15))::BIGINT % 5 = 0
             |     OR idx = 0
             |  UNION
             |  SELECT e1.tgt, rr.hops + 1 FROM rr JOIN e1 ON e1.src = rr.idx
             |  WHERE rr.hops < 4),
             |reach AS (SELECT idx, min(hops)::BIGINT AS hops
             |  FROM rr GROUP BY 1)
             |SELECT n.domain, n.n_docs,
             |  r.hops IS NOT DISTINCT FROM 0 AS is_seed,
             |  r.hops, r.hops IS NOT NULL AS reached
             |FROM nodes n LEFT JOIN reach r USING (idx)
             |ORDER BY n.domain""".stripMargin)),

    // Tokenizer FERTILITY per language — the tokenizer-fairness audit
    // (Ács 2019's fertility metric; Petrov et al. 2023's premium): how
    // many subword tokens the t22/t25 tokenizer spends per whitespace
    // word, and how many characters each token carries, cut by the
    // corpus `lang` column. A tokenizer trained on a skewed mixture
    // segments under-represented languages into more, shorter pieces —
    // this report is how that premium is priced before training (it
    // inflates their effective sequence length and cost per byte).
    // Counts are exact integers from the SAME segmentation t25
    // fingerprints (one shared merge sidecar, [[bpeMergesTop20]]);
    // the two ratios are one IEEE division each. Shape: merge table
    // folds map-side and broadcasts; ONE corpus scan segments, counts
    // words/chars/tokens per doc, and collapses map-side to the
    // |langs|-row grid — no corpus exchange at all beyond that rollup.
    Q("t39_fertility",
      "tokenizer fertility per language: words, chars, BPE tokens, tokens-per-word and chars-per-token from t22's merges",
      (s, d) => {
        import s.implicits._
        docs(s, d).select(col("lang"), col("text"))
          .crossJoin(broadcast(bpeMergesTop20(s, d)))
          .as[(String, String, Seq[String])]
          .mapPartitions { it =>
            var mArr: Array[String] = null
            it.map { case (lang, text, ms) =>
              if (mArr == null) mArr = ms.toArray
              val words = Kernels.lowerTokens(text)
              var nT = 0L
              var nC = 0L
              var wi = 0
              while (wi < words.length) {
                val w = words(wi)
                nT += Kernels.bpeApply(w, mArr).length
                // CODEPOINTS, matching the oracle's len() — String.length
                // would count a supplementary character as 2 (UTF-16
                // units) and drift n_chars/chars_per_token on non-BMP text
                nC += w.codePointCount(0, w.length)
                wi += 1
              }
              (lang, words.length.toLong, nC, nT)
            }
          }
          .toDF("lang", "w", "c", "t")
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"), sum("w").as("n_words"),
            sum("c").as("n_chars"), sum("t").as("n_bpe_tokens"))
          .select(col("lang"), col("n_docs"), col("n_words"),
            col("n_chars"), col("n_bpe_tokens"),
            when(col("n_words") > 0,
              col("n_bpe_tokens") * lit(1.0) / col("n_words"))
              .as("fertility"),
            when(col("n_bpe_tokens") > 0,
              col("n_chars") * lit(1.0) / col("n_bpe_tokens"))
              .as("chars_per_token"))
          .orderBy("lang")
      },
      Some("""WITH n AS (SELECT doc_id, lang,
             |    coalesce(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '') AS norm
             |  FROM documents),
             |w AS (SELECT unnest(list_filter(string_split(norm, ' '), t -> t <> '')) AS word FROM n),
             |p AS (SELECT substr(word, i, 2) AS pair
             |  FROM w, unnest(range(1, len(word))) AS u(i)
             |  WHERE len(word) >= 2),
             |c AS (SELECT pair, count(*)::BIGINT AS pair_count FROM p GROUP BY pair),
             |r AS (SELECT pair, row_number() OVER (ORDER BY pair_count DESC, md5(pair)) AS rank FROM c),
             |m AS (SELECT list(pair ORDER BY rank) AS merges FROM r WHERE rank <= 20),
             |tw AS (SELECT doc_id, lang, list_filter(string_split(norm, ' '), t -> t <> '') AS toks FROM n),
             |seg AS (SELECT doc_id, lang, list_transform(toks, wd ->
             |    replace(trim(
             |      list_reduce(
             |        list_prepend(
             |          list_aggregate(list_transform(string_split(wd, ''),
             |            ch -> chr(30) || ch || chr(30)), 'string_agg', ''),
             |          merges),
             |        (acc, mm) -> replace(acc,
             |          chr(30) || substr(mm, 1, 1) || chr(30) || chr(30) || substr(mm, 2, 1) || chr(30),
             |          chr(30) || mm || chr(30))),
             |      chr(30)), chr(30) || chr(30), chr(31))) AS word_forms
             |  FROM tw CROSS JOIN m),
             |per AS (SELECT lang,
             |    coalesce(len(word_forms), 0)::BIGINT AS w,
             |    coalesce(list_aggregate(list_transform(word_forms,
             |      f -> len(replace(f, chr(31), ''))), 'sum'), 0)::BIGINT AS c,
             |    coalesce(list_aggregate(list_transform(word_forms,
             |      f -> len(string_split(f, chr(31)))), 'sum'), 0)::BIGINT AS t
             |  FROM seg)
             |SELECT lang, count(*)::BIGINT AS n_docs,
             |  sum(w)::BIGINT AS n_words, sum(c)::BIGINT AS n_chars,
             |  sum(t)::BIGINT AS n_bpe_tokens,
             |  CASE WHEN sum(w) > 0 THEN sum(t) * 1.0 / sum(w) END AS fertility,
             |  CASE WHEN sum(t) > 0 THEN sum(c) * 1.0 / sum(t) END AS chars_per_token
             |FROM per GROUP BY lang ORDER BY lang""".stripMargin)),

    // POSTINGS-store drift audit — d30's ops check extended to the
    // retrieval sidecar (t32's persisted inverted index): the store is
    // only correct while the corpus it indexed doesn't move under it.
    // Reconciliation runs at the store's own grain, (doc_id, token):
    // a deleted doc's postings become ORPHANED (the index vouches for
    // text that no longer exists), an edited doc's new tokens are
    // MISSING (a query term the index can't find), postings whose
    // (tf, dl) still match are CONSISTENT — and, richer than d30's
    // hash grain, a posting present on both sides with drifted counts
    // is STALE (the token survives the edit but its score inputs are
    // wrong — BM25 would rank with the old tf/dl). The drift stands in
    // deterministically (docs ≡ 11 mod 13 deleted; docs ≡ 7 mod 11
    // gain one ' zz9q' token, shifting every dl — the m01/t29 stand-in
    // discipline: the simulation is throwaway, the four-way full-outer
    // reconciliation is the operator). Scale shape: the store enters
    // as a SCAN (d15's rule, never broadcast), the fresh side is one
    // exploded-postings rollup riding the corpus scan, and the single
    // wide op is the full-outer join keyed (doc_id, token) — both
    // sides shuffle on the same key, posting grain end to end.
    Q("t40_postings_consistency",
      "postings-store drift audit: consistent / stale / orphaned / missing verdicts from a full-outer reconciliation at (doc, token) grain",
      (s, d) => {
        val store = s.read.parquet(bm25StorePath(s, d))
          .select(col("doc_id"), col("token"),
            col("tf").as("stored_tf"), col("dl").as("stored_dl"))
        val current = bm25PostingsOf(
          docs(s, d).filter(col("doc_id") % 13 =!= 11)
            .select(col("doc_id"),
              concat(col("text"),
                when(col("doc_id") % 11 === 7, " zz9q").otherwise(""))
                .as("text")))
          .select(col("doc_id"), col("token"),
            col("tf").as("current_tf"), col("dl").as("current_dl"))
        store.join(current, Seq("doc_id", "token"), "full_outer")
          .select(col("doc_id"), col("token"),
            when(col("stored_tf").isNull, "missing")
              .when(col("current_tf").isNull, "orphaned")
              .when(col("stored_tf") === col("current_tf") &&
                col("stored_dl") === col("current_dl"), "consistent")
              .otherwise("stale").as("status"),
            col("stored_tf"), col("stored_dl"),
            col("current_tf"), col("current_dl"))
          .orderBy("doc_id", "token")
      },
      Some("""WITH sn AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm FROM documents),
             |stk AS (SELECT doc_id, list_filter(string_split(norm, ' '), t -> t <> '') AS toks FROM sn),
             |sx AS (SELECT doc_id, unnest(toks) AS token, len(toks)::BIGINT AS dl FROM stk),
             |store AS (SELECT doc_id, token, count(*)::BIGINT AS stored_tf,
             |    max(dl) AS stored_dl FROM sx GROUP BY 1, 2),
             |cn AS (SELECT doc_id, trim(regexp_replace(lower(
             |      text || CASE WHEN doc_id % 11 = 7 THEN ' zz9q' ELSE '' END),
             |      '\s+', ' ', 'g')) AS norm
             |  FROM documents WHERE doc_id % 13 <> 11),
             |ctk AS (SELECT doc_id, list_filter(string_split(norm, ' '), t -> t <> '') AS toks FROM cn),
             |cx AS (SELECT doc_id, unnest(toks) AS token, len(toks)::BIGINT AS dl FROM ctk),
             |cur AS (SELECT doc_id, token, count(*)::BIGINT AS current_tf,
             |    max(dl) AS current_dl FROM cx GROUP BY 1, 2)
             |SELECT coalesce(s.doc_id, c.doc_id) AS doc_id,
             |  coalesce(s.token, c.token) AS token,
             |  CASE WHEN s.stored_tf IS NULL THEN 'missing'
             |       WHEN c.current_tf IS NULL THEN 'orphaned'
             |       WHEN s.stored_tf = c.current_tf
             |        AND s.stored_dl = c.current_dl THEN 'consistent'
             |       ELSE 'stale' END AS status,
             |  s.stored_tf, s.stored_dl, c.current_tf, c.current_dl
             |FROM store s FULL OUTER JOIN cur c
             |  ON s.doc_id = c.doc_id AND s.token = c.token
             |ORDER BY doc_id, token""".stripMargin)),

    // TEMPERATURE-smoothed mixture weights — the α-sampling table
    // multilingual/multi-source LM training uses between the raw corpus
    // proportions and the loader (mC4/XLM-R: sample source s with
    // probability ∝ p_s^α; α = 1/2 here): low-resource sources are
    // upsampled (epochs > 1 — data repeated), heads are downsampled,
    // and this report prices exactly that per source: raw share vs
    // temperature share, the token allocation from a fixed budget, and
    // the implied epoch count. Complements t07 (mixture SAMPLING
    // executes a design), t16 (importance resampling to a TARGET mix)
    // and t23 (epoch scheduling from given weights) with the step that
    // DERIVES the weights. Determinism discipline: w_s = sqrt(n_tokens)
    // is a single correctly-rounded IEEE op, and the normalizer W = Σw
    // — the one float SUM — folds LEFT-TO-RIGHT over the
    // source-name-ordered list on both engines (Spark sort_array +
    // aggregate HOF, DuckDB list_reduce over list(... ORDER BY source))
    // because a plain float sum() is partition-order-dependent and
    // would hash-split the engines; every downstream value is one more
    // pinned op on (w, W). Scale shape: ONE corpus pass collapses
    // map-side to the |sources| grid; the fold and all shares run on
    // that grid; the grid re-joins itself via one broadcast of the
    // 1-row totals. The budget is config (1M tokens here).
    Q("t41_temperature_mix",
      "temperature-smoothed (alpha = 1/2) source mixture: raw vs smoothed shares, token allocation from a 1M budget, implied epochs",
      (s, d) => {
        // the |sources| grid feeds TWO consumers (the output rows and
        // the totals fold) — eager-checkpointed (§7.4 rule 3) so the
        // corpus is tokenized ONCE; without it, column pruning gives
        // each consumer a differently-pruned scan subtree and
        // ReuseExchange can't dedupe them (the q47 canonicalization
        // lesson), doubling the corpus pass. Plan-asserted.
        val per = docs(s, d)
          .select(col("source"),
            size(tokens(normText(coalesce(col("text"), lit("")))))
              .cast("long").as("n"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("n").as("n_tokens"))
          .withColumn("weight", sqrt(col("n_tokens").cast("double")))
          .localCheckpoint(true)
        val tot = per.agg(
          sum(col("n_tokens")).as("tot_tokens"),
          expr("aggregate(transform(sort_array(collect_list(" +
            "struct(source, weight))), x -> x.weight), " +
            "cast(0.0 as double), (a, x) -> a + x)").as("wsum"))
        per.crossJoin(broadcast(tot))
          .select(col("source"), col("n_docs"), col("n_tokens"),
            when(col("tot_tokens") > 0,
              col("n_tokens") * lit(1.0) / col("tot_tokens"))
              .as("raw_share"),
            col("weight"),
            when(col("wsum") > 0, col("weight") / col("wsum"))
              .as("temp_share"),
            when(col("wsum") > 0,
              floor(col("weight") / col("wsum") * lit(1000000.0))
                .cast("long")).as("alloc_tokens"),
            when(col("wsum") > 0 && col("n_tokens") > 0,
              floor(col("weight") / col("wsum") * lit(1000000.0))
                / col("n_tokens").cast("double")).as("epochs"))
          .orderBy("source")
      },
      Some("""WITH n AS (SELECT source,
             |    coalesce(trim(regexp_replace(lower(coalesce(text, '')), '\s+', ' ', 'g')), '') AS norm
             |  FROM documents),
             |per AS (SELECT source, count(*)::BIGINT AS n_docs,
             |    sum(len(list_filter(string_split(norm, ' '), t -> t <> '')))::BIGINT AS n_tokens
             |  FROM n GROUP BY source),
             |w AS (SELECT source, n_docs, n_tokens,
             |    sqrt(n_tokens::DOUBLE) AS weight FROM per),
             |tot AS (SELECT sum(n_tokens)::BIGINT AS tot_tokens,
             |    list_reduce(list_prepend(0.0::DOUBLE,
             |      list(weight ORDER BY source)), (a, x) -> a + x) AS wsum
             |  FROM w)
             |SELECT source, n_docs, n_tokens,
             |  CASE WHEN tot_tokens > 0
             |    THEN n_tokens * 1.0 / tot_tokens END AS raw_share,
             |  weight,
             |  CASE WHEN wsum > 0 THEN weight / wsum END AS temp_share,
             |  CASE WHEN wsum > 0
             |    THEN floor(weight / wsum * 1000000.0)::BIGINT END AS alloc_tokens,
             |  CASE WHEN wsum > 0 AND n_tokens > 0
             |    THEN floor(weight / wsum * 1000000.0) / n_tokens::DOUBLE END AS epochs
             |FROM w CROSS JOIN tot ORDER BY source""".stripMargin),
      // the eager localCheckpoint makes even `.schema` execute the corpus
      // pass — declared so schema-only consumers never pay it
      staticSchema = Some(org.apache.spark.sql.types.StructType.fromDDL(
        "source STRING, n_docs BIGINT, n_tokens BIGINT, raw_share DOUBLE, " +
          "weight DOUBLE, temp_share DOUBLE, alloc_tokens BIGINT, " +
          "epochs DOUBLE"))),

    // ITERATED BPE training — the real Sennrich algorithm t22/t25
    // deliberately scope away from: merge k depends on merges 1..k-1,
    // because each adopted merge CONSUMES pair occurrences (after
    // merging 'th', every 'the' stops contributing a ('h','e') pair),
    // so ranking all K merges off one raw count pass (t22) diverges
    // from the trained tokenizer at merge 2 onward — demonstrated
    // non-vacuously on the fixture by BpeIteratedSpec. This query runs
    // K = 5 true rounds: count adjacent TOKEN pairs weighted by word
    // frequency, adopt the argmax (count desc, md5 tiebreak — t18's
    // boundary discipline over the chr(31)-keyed pair so ('ab','c')
    // never collides with ('a','bc')), apply one greedy
    // left-to-right merge pass ([[Kernels.mergePass]] ↔ the oracle's
    // sequential replace(), the t25-pinned equivalence), recount.
    // The oracle recomputes the identical K rounds as unrolled CTE
    // stages over the chr(30)-delimited token-string form.
    //
    // Scale shape — the d09 bounded-loop discipline on the BPE
    // trainer's standard working set: training runs at WORD-FREQUENCY
    // grain (one corpus tokenize + groupBy, after which the corpus is
    // never touched again), so each round is one flatMap+partial-agg
    // over the vocab grid plus a 1-row TakeOrdered collect, and the
    // adopted pair ships back as a closure constant (broadcast-sized
    // by construction). Per-round eager localCheckpoint truncates the
    // k-deep lineage exactly as d09/t38 do. At 100 TB the vocab grid
    // is millions of rows against the corpus's billions — the whole
    // loop runs on ~0.1% of the data after pass one.
    Q("t42_bpe_iterated_train",
      "8 true BPE training rounds at word-frequency grain: recount adjacent token pairs after every adopted merge (merge k depends on 1..k-1)",
      (s, d) => {
        import s.implicits._
        // 8 rounds crosses the first one-shot/iterated divergence on the
        // committed corpus (round 6: adopted merges have consumed enough
        // ('r','t') adjacencies to demote it) and adopts multi-token
        // merges ('p'+'ar') no single raw-count pass can even express —
        // BpeIteratedSpec pins both, non-vacuously
        val (merges, _, _) = bpeTrain(s, d, 8)
        merges
          .toDF("round", "merge_left", "merge_right", "pair_count")
          .orderBy("round")
      },
      Some(sqlBpeIterated(8)),
      // the per-round collect makes `.schema` execute the whole loop
      staticSchema = Some(org.apache.spark.sql.types.StructType.fromDDL(
        "round BIGINT, merge_left STRING, merge_right STRING, " +
          "pair_count BIGINT"))),

    // The BPE TRAINING CURVE — what a tokenizer build actually watches
    // while t42's loop runs: corpus token count (word-frequency
    // weighted) after every merge round, i.e. compression as a function
    // of merge-table size. Round 0 is the codepoint floor
    // (total_tokens = total_chars, chars_per_token = 1.0 exactly); each
    // adopted merge with pair-count c removes AT MOST c tokens (greedy
    // overlap can replace fewer — BpeIteratedSpec pins both bounds), so
    // the curve strictly decreases while merges adopt and goes flat
    // after exhaustion — exactly where a production build stops growing
    // the vocabulary (the s25/s14 whole-knob-range discipline, here for
    // merge count). Shares [[bpeTrain]] with t42, so the curve can
    // never diverge from the adopted merges; per-round cost is one tiny
    // sum over the checkpointed vocab grid. Oracle: the identical
    // rounds unrolled, one aggregate per stage.
    Q("t43_bpe_compression_curve",
      "per-round corpus token counts under t42's training loop: the compression-vs-merge-count curve, round 0 = codepoint floor",
      (s, d) => {
        import s.implicits._
        val (_, stats, chars) = bpeTrain(s, d, 8, withStats = true)
        stats.map { case (r, t) => (r, t, chars) }
          .toDF("round", "total_tokens", "total_chars")
          .withColumn("chars_per_token",
            col("total_chars") * lit(1.0) / col("total_tokens"))
          .orderBy("round")
      },
      Some(sqlBpeCompression(8)),
      // shares t42's loop — `.schema` would execute it
      staticSchema = Some(org.apache.spark.sql.types.StructType.fromDDL(
        "round BIGINT, total_tokens BIGINT, total_chars BIGINT, " +
          "chars_per_token DOUBLE"))),

    // DELETION PROPAGATION through the retrieval store — the
    // right-to-be-forgotten / takedown path a production corpus must
    // run (GDPR erasure, poisoned-document removal): forgetting a
    // document is NOT just dropping its rows, because the store's
    // derived statistics embed it — N, avgdl and every df shift, so
    // EVERY query's BM25 scores change. t44 applies a tombstone list
    // (doc_id ≡ 3 mod 25, disjoint from the pinned query window by
    // arithmetic) to the t32 postings store as one BROADCAST anti-join
    // on the store scan, re-derives all statistics from the surviving
    // postings (the shared bm25TopKOverPostings tail — deletion and
    // the live path CANNOT diverge on derivation), and must be
    // bit-equal to t31's integer-exact recompute on the corpus MINUS
    // the forgotten set. The postings store can honor erasure this way
    // BECAUSE it persists member grain (doc_id rows); contrast the
    // hash-grain dedup sidecar, whose min()-canonical is not
    // decrementable without member lists — the store-design lesson
    // ForgetSpec pins (with s29's group-property counterpart on the
    // centroid store). Scale: tombstones broadcast; the store scans
    // once, never shuffles; everything downstream is t32's plan.
    Q("t44_forget_postings",
      "right-to-be-forgotten on the BM25 postings store: broadcast tombstone anti-join, stats re-derived from survivors — bit-equal to the recompute on the reduced corpus",
      (s, d) => {
        val st = s.read.parquet(bm25StorePath(s, d))
          .select("doc_id", "token", "tf", "dl")
        val tombstones = st.select("doc_id").distinct()
          .filter(col("doc_id") % 25 === 3)
        bm25TopKOverPostings(
          st.join(broadcast(tombstones), Seq("doc_id"), "left_anti"))
      },
      Some(s"""WITH ${sqlBm25AgOver("(SELECT * FROM documents WHERE doc_id % 25 <> 3)")},
             |br AS (SELECT query_id, doc_id, score, n_terms, row_number() OVER (
             |    PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank FROM bag)
             |SELECT query_id, rank, doc_id, score, n_terms FROM br
             |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin)),

    // HTML → TEXT EXTRACTION — the stage every web-scale corpus starts
    // with (trafilatura/jusText/resiliparse class) and the registry's
    // one missing pipeline step between "crawl bytes" and the t01+
    // text surface. Regex-grammar extraction, deliberately: a real
    // extractor is a DOM parser with boilerplate heuristics, but the
    // container has no parser lib and the PIPELINE properties — drop
    // script/style/comment content, strip tags, decode entities
    // (NUMERIC references &#NNNN;/&#xHHHH; first via the codegen'd
    // NcrDecode grammar pass — valid scalar codepoints only, invalid
    // forms stay literal — then the named table with &amp; decoded
    // LAST so &amp;lt; yields literal-angle text, not a tag), collapse
    // whitespace, surface title/link-count metadata —
    // are deterministic, engine-portable (RE2 ∩ Java regex: lazy
    // quantifiers, inline (?is), no backreferences — script and style
    // get separate patterns for exactly that reason), and therefore
    // hash-gateable; the documented stray-'<' semantics (swallow to
    // the next '>', a trailing unmatched '<' survives) are the honest
    // limits of the grammar, pinned on the fixture
    // (fixtures/html_docs.tsv: script/style/comment leakage, entity
    // battery, link counting with and without href, case-insensitive
    // tags, self-closing tags, unclosed tags, empty body, no-markup
    // passthrough). The corpus rides along (the t36 union discipline):
    // markup-free text flows through as a whitespace-normalizing
    // no-op, so the scale shape is measured on real volume — one
    // narrow scan, every transform a codegen'd regexp riding it, zero
    // joins, zero exchanges before the output sort.
    Q("t45_html_extract",
      "HTML-to-text extraction: script/style/comment removal, tag strip, entity decode, title + link-count metadata — regex-grammar, hash-gated on a planted fixture + the corpus",
      (s, d) => {
        val fix = s.read.option("sep", "\t").option("header", "true")
          .schema("doc_id LONG, html STRING")
          .csv(s"$fixtures/html_docs.tsv")
        htmlExtract(docs(s, d).select(col("doc_id"), col("text").as("html"))
          .unionByName(fix))
          .orderBy("doc_id")
      },
      Some(s"""WITH a AS (SELECT doc_id, text AS html FROM documents
             |  UNION ALL SELECT doc_id, html FROM read_csv(
             |    '$fixtures/html_docs.tsv', delim='\\t', header=true,
             |    columns={'doc_id': 'BIGINT', 'html': 'VARCHAR'})),
             |c AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(
             |    html,
             |    '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
             |    '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
             |    '(?s)<!--.*?-->', ' ', 'g') AS clean FROM a),
             |st AS (SELECT doc_id, clean,
             |    regexp_replace(regexp_replace(clean,
             |      '(?is)<head[^>]*>.*?</head>', ' ', 'g'),
             |      '(?s)<[^>]*>', ' ', 'g') AS stripped FROM c),
             |nx AS (SELECT doc_id, clean, stripped,
             |    regexp_split_to_array(stripped,
             |      '&#(?:[0-9]{1,7}|[xX][0-9a-fA-F]{1,6});') AS segs,
             |    list_transform(regexp_extract_all(stripped,
             |      '&#([0-9]{1,7}|[xX][0-9a-fA-F]{1,6});', 1), e ->
             |      struct_pack(raw := e, cp := CASE WHEN lower(e) LIKE 'x%'
             |        THEN ('0x' || substr(e, 2))::BIGINT
             |        ELSE e::BIGINT END)) AS ents
             |  FROM st),
             |nd AS (SELECT doc_id, clean,
             |    CASE WHEN len(ents) = 0 THEN stripped
             |    ELSE segs[1] || array_to_string(
             |      list_transform(range(1, len(ents) + 1), i ->
             |        coalesce(CASE WHEN ents[i].cp BETWEEN 1 AND 1114111
             |            AND NOT (ents[i].cp BETWEEN 55296 AND 57343)
             |          THEN chr(ents[i].cp::INT) END,
             |          '&#' || ents[i].raw || ';') || segs[i + 1]), '')
             |    END AS dtext
             |  FROM nx),
             |t AS (SELECT doc_id,
             |    trim(regexp_replace(coalesce(
             |      regexp_extract(clean, '(?is)<title[^>]*>(.*?)</title>', 1),
             |      ''), '\\s+', ' ', 'g')) AS title,
             |    len(regexp_extract_all(clean, '(?is)<a\\s[^>]*href\\s*='))::BIGINT AS n_links,
             |    trim(regexp_replace(replace(replace(replace(replace(replace(replace(
             |      dtext,
             |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
             |      '&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&'),
             |      '\\s+', ' ', 'g')) AS text
             |  FROM nd)
             |SELECT doc_id, title, n_links,
             |  length(text)::BIGINT AS n_chars,
             |  (CASE WHEN length(text) = 0 THEN 0
             |    ELSE len(string_split(text, ' ')) END)::BIGINT AS n_tokens,
             |  text
             |FROM t ORDER BY doc_id""".stripMargin)),

    // URL EXTRACTION + CANONICALIZATION + registrable-domain rollup —
    // the crawl-frontier stage between t45's page text and the next
    // fetch round, and the URL-level dedup key every web pipeline
    // groups on (two fetches of ...?utm_source=x and ...#frag are ONE
    // page). Regex-grammar like t45 (RE2 ∩ Java: char classes, no
    // lookaround), deliberately staged so each rule is hash-gateable:
    // extract `https?://` spans (trailing sentence punctuation
    // stripped — the documented grammar limit: a real URL ending '.'
    // loses it), drop the fragment, lowercase scheme and host only,
    // strip the scheme's DEFAULT port (:80/:443 — a non-default port
    // stays in the canonical form but never in the domain), empty path
    // → '/', and filter query params by NAME against the tracking set
    // (utm_*, gclid, fbclid, ref) preserving order — value 'utm_x'
    // under another name survives. Registrable domain is the
    // public-suffix rule reduced to a config-class list (the multi-label
    // suffixes the fixture exercises; IPv4 hosts and single-label hosts
    // are their own domain). Scale shape: one narrow scan, explode at
    // URL grain (bounded by text length), one partial-agg rollup at
    // domain grain — zero joins; at 100 TB the frontier dedup this
    // feeds is d16's incremental hash-store shape keyed on `canon`.
    Q("t46_url_canonicalize",
      "crawl-frontier URL stage: extract, canonicalize (fragment/default-port/tracking-param rules), registrable-domain rollup — n_urls + distinct canonical forms per domain",
      (s, d) => {
        val fix = s.read.option("sep", "\t").option("header", "true")
          .schema("doc_id LONG, text STRING")
          .csv(s"$fixtures/url_docs.tsv")
        urlCanonical(docs(s, d).select(col("doc_id"), col("text"))
          .unionByName(fix))
          .groupBy("domain")
          .agg(count(lit(1)).as("n_urls"),
            countDistinct(col("canon")).as("n_canon"))
          .orderBy("domain")
      },
      Some(s"""WITH a AS (SELECT doc_id, text FROM documents
             |  UNION ALL SELECT doc_id, text FROM read_csv(
             |    '$fixtures/url_docs.tsv', delim='\\t', header=true,
             |    columns={'doc_id': 'BIGINT', 'text': 'VARCHAR'})),
             |$sqlUrlCanon
             |SELECT domain, count(*)::BIGINT AS n_urls,
             |  count(DISTINCT canon)::BIGINT AS n_canon
             |FROM dm GROUP BY domain ORDER BY domain""".stripMargin))
  )

  /** The t46/d33 URL fixture battery. */
  private[operators] lazy val urlFixturePath: String =
    s"$fixtures/url_docs.tsv"

  /** Oracle twin of [[urlCanonical]] — the staged URL grammar as a CTE
    * chain `u0→u1→p→h→h2→pq→c→dm`; `dm` is (doc_id, canon, domain) over
    * relation `a(doc_id, text)`. Shared VERBATIM by t46 and the d33
    * frontier store (the t31/t32 shared-text discipline: the two gates
    * must agree on what a canonical URL is). No leading WITH.
    */
  private[operators] lazy val sqlUrlCanon: String =
    """u0 AS (SELECT doc_id, unnest(regexp_extract_all(text,
      |    '[hH][tT][tT][pP][sS]?://[^\s"''<>]+')) AS raw FROM a),
      |u1 AS (SELECT doc_id,
      |    regexp_replace(raw, '[.,;:!?)\]]+$', '') AS u FROM u0),
      |p AS (SELECT doc_id,
      |    lower(regexp_extract(u, '^([A-Za-z]+)://', 1)) AS scheme,
      |    regexp_replace(regexp_replace(u, '^[A-Za-z]+://', ''),
      |      '#.*$', '') AS rest
      |  FROM u1),
      |h AS (SELECT doc_id, scheme, rest,
      |    lower(regexp_extract(rest, '^([^/?]+)', 1)) AS hostport
      |  FROM p),
      |h2 AS (SELECT doc_id, scheme,
      |    CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '')
      |         WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
      |         ELSE hostport END AS hp,
      |    substr(rest, length(hostport) + 1) AS tail
      |  FROM h),
      |pq AS (SELECT doc_id, scheme, hp,
      |    CASE WHEN regexp_extract(tail, '^([^?]*)', 1) = '' THEN '/'
      |         ELSE regexp_extract(tail, '^([^?]*)', 1) END AS path,
      |    coalesce(array_to_string(list_filter(
      |      string_split(regexp_extract(tail, '\?(.*)$', 1), '&'),
      |      x -> x <> '' AND NOT regexp_matches(x,
      |        '^(utm_[^=]*|gclid|fbclid|ref)(=|$)')), '&'), '') AS q
      |  FROM h2),
      |c AS (SELECT doc_id,
      |    scheme || '://' || hp || path ||
      |      CASE WHEN q = '' THEN '' ELSE '?' || q END AS canon,
      |    regexp_replace(hp, ':[0-9]+$', '') AS hn FROM pq),
      |dm AS (SELECT doc_id, canon,
      |    CASE WHEN regexp_matches(hn, '^[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+$') THEN hn
      |         WHEN regexp_extract(hn, '([^.]+\.[^.]+)$', 1) IN
      |             ('co.uk','ac.uk','org.uk','gov.uk','com.au','net.au','co.jp','or.jp','com.br','co.in','co.nz')
      |           THEN coalesce(nullif(regexp_extract(hn,
      |             '([^.]+\.[^.]+\.[^.]+)$', 1), ''), hn)
      |         WHEN hn NOT LIKE '%.%' THEN hn
      |         ELSE regexp_extract(hn, '([^.]+\.[^.]+)$', 1) END AS domain
      |  FROM c)""".stripMargin

  /** The ONE t42/t43 trainer: k true BPE rounds at word-frequency grain
    * (corpus tokenized once into (word, freq); every round is a
    * flatMap+partial-agg over that vocab grid, a 1-row TakeOrdered
    * collect, one [[graft.functions.Kernels.mergePass]] map, and an
    * eager localCheckpoint — the d09 loop discipline). Returns the
    * adopted merges, the per-round weighted token totals for rounds
    * 0..k (`None` on an empty corpus; stagnant after early exhaustion,
    * matching the carried-through oracle stages — only computed
    * when `withStats`, so t42 skips the t43-only aggregates), and
    * the weighted codepoint total.
    */
  private def bpeTrain(s: SparkSession, d: String, k: Int,
      withStats: Boolean = false)
      : (Seq[(Long, String, String, Long)], Seq[(Long, Option[Long])],
        Option[Long]) = {
    import s.implicits._
    val wf = docs(s, d).select(col("text")).as[String]
      .mapPartitions(_.flatMap(tx => Kernels.lowerTokens(tx).iterator))
      .toDF("word")
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .as[(String, Long)]
    // ONE eager checkpoint: everything corpus-derived (the word-frequency
    // rollup) materializes here, and the ≤k merge rounds chain as plain
    // MapElements on top of it. Per-round re-checkpointing (the old form)
    // bought nothing — the chained passes are vocab-grain CPU (≤k·|vocab|
    // token-array walks, trivial next to one corpus scan) — and cost one
    // eager cache job + unpersist churn per round, ~40% of t42/t43's
    // wall at sf0.1 (guide §1.2: the job moved no data).
    val state0 = wf
      .map { case (w, f) => (f, Kernels.codepointAtoms(w)) }
      .localCheckpoint(true)
    var state = state0
    def total(st: org.apache.spark.sql.Dataset[(Long, Array[String])])
        : Option[Long] = {
      val row = st.map { case (f, t) => f * t.length }.toDF("n")
        .agg(sum(col("n"))).head()
      if (row.isNullAt(0)) None else Some(row.getLong(0))
    }
    val chars = if (withStats) total(state) else None
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    val stats = Seq.newBuilder[(Long, Option[Long])]
    stats += ((0L, chars))
    var lastTotal = chars
    var exhausted = false
    (1 to k).foreach { r =>
      if (!exhausted) {
        val top = state
          .flatMap { case (f, toks) =>
            (0 until toks.length - 1).iterator
              .map(i => (toks(i) + "\u001F" + toks(i + 1), f))
          }
          .toDF("pair", "freq")
          .groupBy("pair").agg(sum("freq").as("cnt"))
          .orderBy(col("cnt").desc, md5(col("pair")))
          .limit(1).collect()
        if (top.isEmpty) exhausted = true
        else {
          val pair = top(0).getString(0)
          val cnt = top(0).getLong(1)
          val cut = pair.indexOf('\u001F')
          val lft = pair.substring(0, cut)
          val rgt = pair.substring(cut + 1)
          merges += ((r.toLong, lft, rgt, cnt))
          state = state
            .map { case (f, toks) => (f, Kernels.mergePass(toks, lft, rgt)) }
          if (withStats) lastTotal = total(state)
        }
      }
      stats += ((r.toLong, lastTotal))
    }
    state0.unpersist(blocking = false)
    (merges.result(), stats.result(), chars)
  }

  /** The unrolled-CTE oracle of t42: K true BPE rounds over the
    * chr(30)-delimited token-string form of the word-frequency table —
    * per round, pair counts from the current segmentation, argmax by
    * (count DESC, md5(pair)), one sequential replace() applying the
    * merge (≡ [[graft.functions.Kernels.mergePass]], the t25-pinned
    * equivalence). A round with no pairs left yields an empty m_k and
    * the LEFT JOIN carries the segmentation through unchanged, matching
    * the Spark loop's early exhaustion.
    */
  private def sqlBpeIterated(k: Int): String = {
    val unions = (1 to k).map(r =>
      s"SELECT $r::BIGINT AS round, lft AS merge_left, rgt AS merge_right, " +
        s"cnt AS pair_count FROM m$r").mkString("\n  UNION ALL\n  ")
    s"${sqlBpeStages(k)}\nSELECT * FROM (\n  $unions\n) ORDER BY round"
  }

  /** t43's oracle: the SAME unrolled training stages, one weighted token
    * count per stage (round 0 = the codepoint floor), total chars from
    * the word-frequency grid, and the chars-per-token compression
    * column. Aggregates over an empty corpus yield single NULL rows —
    * the Spark loop's None totals, row for row.
    */
  private def sqlBpeCompression(k: Int): String = {
    val sts = (0 to k).map { r =>
      s""",
         |st$r AS (SELECT $r::BIGINT AS round,
         |  sum(freq * len(string_split(trim(seq, chr(30)), chr(30) || chr(30))))::BIGINT AS total_tokens
         |  FROM s$r)""".stripMargin
    }.mkString
    val unions = (0 to k).map(r => s"SELECT * FROM st$r")
      .mkString("\n  UNION ALL\n  ")
    // the stages are already margin-stripped — an outer stripMargin over
    // the interpolated whole would eat the leading '||' of their concat
    // continuation lines (a single '|' is DuckDB's bitwise-or: binder error)
    val tail = s""",
       |ch AS (SELECT sum(freq * len(string_split(word, '')))::BIGINT AS total_chars FROM wf)
       |SELECT round, total_tokens, total_chars,
       |  total_chars * 1.0 / total_tokens AS chars_per_token
       |FROM (
       |  $unions
       |) CROSS JOIN ch ORDER BY round""".stripMargin
    s"${sqlBpeStages(k)}$sts$tail"
  }

  private def sqlBpeStages(k: Int): String = {
    val head =
      """WITH n AS (SELECT trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
        |  FROM documents WHERE text IS NOT NULL),
        |w AS (SELECT unnest(list_filter(string_split(norm, ' '), t -> t <> '')) AS word FROM n),
        |wf AS (SELECT word, count(*)::BIGINT AS freq FROM w GROUP BY word),
        |s0 AS (SELECT freq, chr(30) ||
        |    list_aggregate(string_split(word, ''), 'string_agg', chr(30) || chr(30))
        |    || chr(30) AS seq FROM wf)""".stripMargin
    val rounds = (1 to k).map { r =>
      s""",
         |tk$r AS (SELECT freq,
         |    string_split(trim(seq, chr(30)), chr(30) || chr(30)) AS toks
         |  FROM s${r - 1}),
         |p$r AS (SELECT u.pair, sum(freq)::BIGINT AS cnt
         |  FROM tk$r, unnest(list_transform(range(1, len(toks)),
         |    i -> toks[i] || chr(31) || toks[i + 1])) AS u(pair)
         |  GROUP BY u.pair),
         |m$r AS (SELECT pair, cnt, split_part(pair, chr(31), 1) AS lft,
         |    split_part(pair, chr(31), 2) AS rgt
         |  FROM p$r ORDER BY cnt DESC, md5(pair) LIMIT 1),
         |s$r AS (SELECT freq, CASE WHEN m.pair IS NULL THEN s.seq
         |    ELSE replace(s.seq,
         |      chr(30) || m.lft || chr(30) || chr(30) || m.rgt || chr(30),
         |      chr(30) || m.lft || m.rgt || chr(30)) END AS seq
         |  FROM s${r - 1} s LEFT JOIN m$r m ON TRUE)""".stripMargin
    }.mkString
    s"$head$rounds"
  }

  /** t32's consumer over ANY postings store (the gate's two-batch
    * fixture or the [[graft.streaming.DocumentStreams.postingsIngest]]
    * streamed store — documents live wholly in one batch, so the
    * multi-batch merge is pure partition-discovery union and the
    * result depends only on the union of batches).
    */
  /** t22's top-20 BPE merge table as ONE rank-ordered array row — the
    * shared sidecar of t25 (segmentation) and t39 (fertility): a
    * rank-ordered merge array via sort_array over (-count, md5, pair)
    * structs = t22's exact (count desc, md5 tiebreak) order, fully
    * deterministic where a bare collect_list is not; the transform HOF
    * runs once over one 20-element row (rule 11 does not apply). Folds
    * map-side through TakeOrderedAndProject and broadcasts (§7.4 rule
    * 12: fixed-size by construction).
    */
  private def bpeMergesTop20(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pairs = docs(s, d).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (_, tx) =>
        Kernels.lowerTokens(tx).iterator.flatMap(Kernels.codepointPairs)
      })
      .toDF("pair")
    pairs.groupBy("pair")
      .agg(count(lit(1)).as("pair_count"))
      .orderBy(col("pair_count").desc, md5(col("pair")))
      .limit(20)
      .agg(sort_array(collect_list(struct(
        (-col("pair_count")).as("nc"), md5(col("pair")).as("tb"),
        col("pair").as("p")))).as("ms"))
      .select(expr("transform(ms, x -> x.p)").as("merges"))
  }

  private[graft] def bm25StoreTopK(s: SparkSession,
      storePath: String): DataFrame =
    bm25TopKOverPostings(s.read.parquet(storePath)
      .select("doc_id", "token", "tf", "dl"))

  /** The t32 consumer tail over ANY aggregated-postings frame — shared
    * with t44's tombstoned store so deletion can never diverge from the
    * live path on stats derivation (n_docs, avgdl, df all re-derive
    * from whatever postings survive).
    */
  private[graft] def bm25TopKOverPostings(st: DataFrame): DataFrame = {
    val tot = st.groupBy("doc_id").agg(max(col("dl")).as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("l_tokens"))
      .withColumn("avg_dl", expr("l_tokens div n_docs"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(md5(col("token")).asc)
    val qt = st
      .filter(col("doc_id") % 50 === 0 && col("doc_id") < 2000 &&
        length(col("token")) >= 7)
      .select(col("doc_id").as("query_id"), col("token"))
      .withColumn("trm", row_number().over(wq))
      .filter(col("trm") <= 4).drop("trm")
    val tf = st
      .join(broadcast(qt.select("token").distinct()), Seq("token"), "left_semi")
    bm25Top10(bm25ScoreTail(tf, qt, tot))
  }

  /** Aggregated postings (doc_id, token, tf, dl) of a (doc_id, text)
    * frame — [[bm25Scored]]'s tokenization verbatim, shared by the t32
    * fixture builder and the streaming producer so stored-index scoring
    * can never diverge from the recompute on tokenization.
    */
  private[graft] def bm25PostingsOf(docsDF: DataFrame): DataFrame =
    docsDF
      .select(col("doc_id"), tokens(normText(col("text"))).as("toks"))
      .select(col("doc_id"), explode(col("toks")).as("token"),
        size(col("toks")).cast("long").as("dl"))
      .groupBy("doc_id", "token")
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))

  /** Shared BM25 scaffold for t31 (and s19's lexical leg): per
    * (query_id, doc_id) integer lexical relevance over the `documents`
    * corpus. One frame, `(query_id, doc_id, score, n_terms)`.
    *
    * Integer-exact Okapi arithmetic — with k1 = 6/5, b = 3/4 and
    * avgdl := L div N (L = total tokens, N = docs with ≥ 1 token), the
    * per-term saturation tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) times
    * the rational idf (N+1)/(df+0.5) clears all denominators at ×20·avgdl
    * and ×(2·df+1)·1e-3:
    *
    *   idf_i    = ((N+1)·1000) div (2·df+1)
    *   score_i  = (idf_i·44·avgdl·tf) div (20·avgdl·tf + 6·avgdl + 18·dl)
    *
    * so every engine with 64-bit floor division produces identical
    * scores, and the per-doc SUM over matched terms is an integer sum —
    * order-free, map-side-partial. Overflow headroom: idf_i ≤ (N+1)·334,
    * so the numerator stays under 2^63 while N·avgdl·tf_max < 6e14 —
    * twelve decades above the sf1 fixture, and at real corpus sizes the
    * idf scale (1000) is configuration.
    *
    * Scale shape: ONE exploded-postings pass rides the corpus scan
    * (checkpointed — reused by the totals rollup, the query-term pick
    * and the postings probe); the probe is a broadcast SEMI join on the
    * workload-bounded term set (≤ 4·|queries| tokens — this is the
    * inverted-index lookup: only postings of query terms survive, so
    * everything downstream is candidate-sized, never corpus-sized);
    * df / query-terms / totals all re-attach as broadcast dims. The
    * corpus is never reshuffled — the only wide exchange is the
    * tf groupBy over the PROBED postings.
    */
  private[operators] def bm25Scored(s: SparkSession, d: String): DataFrame =
    bm25Scored(s, d, reuse = true)

  /** `reuse = false` skips the two localCheckpoints so the WHOLE shape —
    * including the broadcast-semi postings probe the checkpoints would
    * hide behind `Scan ExistingRDD` — is visible in one executed plan.
    * Test hook only: production callers always want the reused frames
    * (the corpus explode feeds three consumers, the probed postings two).
    */
  private[operators] def bm25Scored(
      s: SparkSession, d: String, reuse: Boolean): DataFrame = {
    def keep(df: DataFrame): DataFrame =
      if (reuse) df.localCheckpoint(true) else df
    val ex = keep(docs(s, d)
      .select(col("doc_id"), tokens(normText(col("text"))).as("toks"))
      .select(col("doc_id"), explode(col("toks")).as("token"),
        size(col("toks")).cast("long").as("dl")))
    val tot = ex.groupBy("doc_id").agg(max(col("dl")).as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("l_tokens"))
      .withColumn("avg_dl", expr("l_tokens div n_docs"))
    val wq = Window.partitionBy(col("query_id")).orderBy(md5(col("token")).asc)
    val qt = ex
      .filter(col("doc_id") % 50 === 0 && col("doc_id") < 2000 &&
        length(col("token")) >= 7)
      .select(col("doc_id").as("query_id"), col("token")).distinct()
      .withColumn("trm", row_number().over(wq))
      .filter(col("trm") <= 4).drop("trm")
    // candidate-postings frame (workload-bounded): checkpointed because
    // BOTH the df rollup and the score join consume it — without the
    // checkpoint each consumer replays the corpus semi-join + groupBy
    // (measured: the duplicate subtree shows as a second
    // (doc_id, token) exchange in the executed plan)
    val tf = keep(ex
      .join(broadcast(qt.select("token").distinct()), Seq("token"), "left_semi")
      .groupBy("doc_id", "token")
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl")))
    bm25ScoreTail(tf, qt, tot)
  }

  /** Okapi scoring tail shared by t31/s19 (probed exploded postings) and
    * t32 (probed STORED postings): df rollup over the candidate set,
    * broadcast dim attaches, the integer score, and the per-(query, doc)
    * sum. `tf` must be candidate postings (doc_id, token, tf, dl) already
    * restricted to query terms — df computed here is per-token document
    * frequency over the FULL corpus precisely because the semi-join probe
    * keeps every posting of a query term.
    */
  private def bm25ScoreTail(tf: DataFrame, qt: DataFrame,
      tot: DataFrame): DataFrame = {
    val dfT = tf.groupBy("token").agg(count(lit(1)).as("df"))
    tf.join(broadcast(qt), Seq("token"))
      .filter(col("doc_id") =!= col("query_id"))
      .join(broadcast(dfT), Seq("token"))
      .crossJoin(broadcast(tot))
      .withColumn("idf_i", expr("((n_docs + 1) * 1000) div (2 * df + 1)"))
      .withColumn("score_i", expr(
        "(idf_i * 44 * avg_dl * tf) div (20 * avg_dl * tf + 6 * avg_dl + 18 * dl)"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("score_i")).as("score"), count(lit(1)).as("n_terms"))
  }

  /** Per-query top-10 over a (query_id, doc_id, score, n_terms) frame —
    * t31/t32's shared presentation (WindowGroupLimit, doc_id tiebreak). */
  private def bm25Top10(scored: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("doc_id"), col("score"), col("n_terms"))
      .orderBy("query_id", "rank")
  }

  /** The persisted inverted-index store (the t32 fixture): aggregated
    * postings (doc_id, token, tf, dl), TWO ingest batches split
    * doc_id % 2 under `batch_id=K` — each document wholly in one batch,
    * so the merge at read is pure partition-discovery union. Tokenization
    * is [[bm25Scored]]'s verbatim (same normText+tokens kernel), which is
    * what makes stored-index scoring bit-equal to the recompute.
    */
  private def bm25StorePath(s: SparkSession, d: String): String =
    graft.core.StoreFixture("graft_bm25store", d) { p =>
      (0 to 1).foreach { b =>
        bm25PostingsOf(docs(s, d).filter(col("doc_id") % 2 === b))
          .write.mode("overwrite").parquet(s"$p/batch_id=$b")
      }
    }

  /** t45's engine over any (doc_id, html) frame — public so
    * HtmlExtractSpec's generative tag-soup properties can drive it on
    * arbitrary strings. The whole chain is codegen'd regexps riding
    * one narrow scan; see the registry entry for the grammar contract
    * (script/style/comment and head removal, tag strip, entity decode
    * with &amp; LAST, whitespace collapse, title + href-link
    * metadata). A structural consequence the property tests pin: after
    * the global tag strip, every surviving '<' has NO later '>' in its
    * document (else the pair would have matched), so entity-free
    * output can never contain a complete `<...>` span.
    */
  private[graft] def htmlExtract(htmlDocs: DataFrame): DataFrame = {
    graft.plans.VectorExpressions.register(htmlDocs.sparkSession)
    htmlDocs
      .withColumn("clean", regexp_replace(regexp_replace(regexp_replace(
        col("html"),
        "(?is)<script[^>]*>.*?</script>", " "),
        "(?is)<style[^>]*>.*?</style>", " "),
        "(?s)<!--.*?-->", " "))
      .withColumn("title", trim(regexp_replace(
        regexp_extract(col("clean"), "(?is)<title[^>]*>(.*?)</title>", 1),
        "\\s+", " ")))
      .withColumn("n_links",
        expr("size(regexp_extract_all(clean, '(?is)<a\\\\s[^>]*href\\\\s*=', 0))")
          .cast("long"))
      .withColumn("text", {
        // head removal (title/meta must not leak into body text), tag
        // strip, then entity decode — NUMERIC references first (grammar:
        // the codegen'd NcrDecode pass, so `&amp;#60;` stays literal
        // `&#60;` and `&#38;lt;` yields literal `&lt;` — single-pass,
        // replacements never rescanned), then the named table with
        // &amp; LAST, then whitespace collapse — the oracle's chain in
        // the same order
        val entities = Seq("&lt;" -> "<", "&gt;" -> ">",
          "&quot;" -> "\"", "&#39;" -> "'", "&nbsp;" -> " ",
          "&amp;" -> "&")
        val decoded = entities.foldLeft(
          graft.functions.Portable.ncrDecode(
            regexp_replace(regexp_replace(col("clean"),
              "(?is)<head[^>]*>.*?</head>", " "),
              "(?s)<[^>]*>", " "))) {
          case (c, (from, to)) => regexp_replace(c, from, to)
        }
        trim(regexp_replace(decoded, "\\s+", " "))
      })
      .select(col("doc_id"), col("title"), col("n_links"),
        length(col("text")).cast("long").as("n_chars"),
        when(length(col("text")) === 0, 0L)
          .otherwise(size(split(col("text"), " ")).cast("long"))
          .as("n_tokens"),
        col("text"))
  }

  /** t46's engine over any (doc_id, text) frame — public to the package
    * so UrlCanonicalizeSpec can pin per-URL rules the domain-grain hash
    * gate only sees in aggregate. Emits one row per extracted URL:
    * (doc_id, url — the raw match after trailing-punctuation strip,
    * canon, domain). Every stage is a codegen'd regexp/HOF riding the
    * scan; see the registry entry for the grammar contract.
    */
  private[graft] def urlCanonical(docsDf: DataFrame): DataFrame = {
    val multiSuffix = Seq("co.uk", "ac.uk", "org.uk", "gov.uk", "com.au",
      "net.au", "co.jp", "or.jp", "com.br", "co.in", "co.nz")
    docsDf
      .select(col("doc_id"), explode(expr(
        """regexp_extract_all(text, '[hH][tT][tT][pP][sS]?://[^\\s"\'<>]+', 0)"""))
        .as("raw"))
      .withColumn("url", regexp_replace(col("raw"), "[.,;:!?)\\]]+$", ""))
      .withColumn("scheme",
        lower(regexp_extract(col("url"), "^([A-Za-z]+)://", 1)))
      .withColumn("rest", regexp_replace(
        regexp_replace(col("url"), "^[A-Za-z]+://", ""), "#.*$", ""))
      .withColumn("hostport",
        lower(regexp_extract(col("rest"), "^([^/?]+)", 1)))
      .withColumn("hp",
        when(col("scheme") === "http",
          regexp_replace(col("hostport"), ":80$", ""))
          .when(col("scheme") === "https",
            regexp_replace(col("hostport"), ":443$", ""))
          .otherwise(col("hostport")))
      .withColumn("tail",
        col("rest").substr(length(col("hostport")) + 1, lit(1 << 24)))
      .withColumn("path", {
        val p = regexp_extract(col("tail"), "^([^?]*)", 1)
        when(p === "", "/").otherwise(p)
      })
      .withColumn("q", array_join(filter(
        split(regexp_extract(col("tail"), "\\?(.*)$", 1), "&"),
        x => x =!= "" &&
          !x.rlike("^(utm_[^=]*|gclid|fbclid|ref)(=|$)")), "&"))
      .withColumn("canon", concat(col("scheme"), lit("://"), col("hp"),
        col("path"),
        when(col("q") === "", "").otherwise(concat(lit("?"), col("q")))))
      .withColumn("hn", regexp_replace(col("hp"), ":[0-9]+$", ""))
      .withColumn("domain",
        when(col("hn").rlike("^[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+$"),
          col("hn"))
          .when(regexp_extract(col("hn"), "([^.]+\\.[^.]+)$", 1)
              .isin(multiSuffix: _*),
            coalesce(
              when(regexp_extract(col("hn"),
                "([^.]+\\.[^.]+\\.[^.]+)$", 1) === "", null)
                .otherwise(regexp_extract(col("hn"),
                  "([^.]+\\.[^.]+\\.[^.]+)$", 1)),
              col("hn")))
          .when(!col("hn").contains("."), col("hn"))
          .otherwise(regexp_extract(col("hn"), "([^.]+\\.[^.]+)$", 1)))
      .select("doc_id", "url", "canon", "domain")
  }

  /** Oracle twin of [[bm25Scored]] — CTE chain `bx→btot→bqt0→bqt→btf→
    * bdf→bsc→bag`; `bag` is (query_id, doc_id, score, n_terms). Shared
    * by the t31 and s19 oracles so tokenization, the query-term pick
    * and the integer scoring can never diverge between them. No leading
    * WITH: callers embed it in their own chain.
    */
  // lazy: declared below `registry`, which interpolates it at object init
  private[operators] lazy val sqlBm25Ag: String = sqlBm25AgOver("documents")

  /** [[sqlBm25Ag]] over an arbitrary document relation — t44 passes the
    * tombstone-filtered corpus; the default keeps t31/t32's text
    * byte-identical.
    */
  private[operators] def sqlBm25AgOver(rel: String): String =
    s"""bn AS (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm FROM $rel),
      |btk AS (SELECT doc_id, list_filter(string_split(norm, ' '), t -> t <> '') AS toks FROM bn),
      |bx AS (SELECT doc_id, unnest(toks) AS token, len(toks)::BIGINT AS dl FROM btk),
      |btot AS (SELECT count(DISTINCT doc_id)::BIGINT AS n_docs, count(*)::BIGINT AS l_tokens FROM bx),
      |btot2 AS (SELECT n_docs, l_tokens // n_docs AS avg_dl FROM btot),
      |bqt0 AS (SELECT DISTINCT doc_id AS query_id, token FROM bx
      |  WHERE doc_id % 50 = 0 AND doc_id < 2000 AND len(token) >= 7),
      |bqt AS (SELECT query_id, token FROM (SELECT *, row_number() OVER (
      |    PARTITION BY query_id ORDER BY md5(token)) AS trm FROM bqt0) WHERE trm <= 4),
      |btf AS (SELECT doc_id, token, count(*)::BIGINT AS tf, max(dl) AS dl FROM bx
      |  WHERE token IN (SELECT token FROM bqt) GROUP BY 1, 2),
      |bdf AS (SELECT token, count(*)::BIGINT AS df FROM btf GROUP BY 1),
      |bsc AS (SELECT q.query_id, t.doc_id,
      |    ((((btot2.n_docs + 1) * 1000) // (2 * bdf.df + 1)) * 44 * btot2.avg_dl * t.tf)
      |      // (20 * btot2.avg_dl * t.tf + 6 * btot2.avg_dl + 18 * t.dl) AS score_i
      |  FROM btf t JOIN bqt q USING (token) JOIN bdf USING (token) CROSS JOIN btot2
      |  WHERE t.doc_id <> q.query_id),
      |bag AS (SELECT query_id, doc_id, sum(score_i)::BIGINT AS score,
      |    count(*)::BIGINT AS n_terms FROM bsc GROUP BY 1, 2)""".stripMargin

  /** The t31 oracle, shared VERBATIM by t32 — the stored-index scorer's
    * contract is bit-equality with the full recompute, so the two gates
    * must share one SQL text (the sqlBm25Ag rationale, one level up).
    */
  private lazy val sqlBm25Top10: String =
    s"""WITH $sqlBm25Ag,
       |br AS (SELECT query_id, doc_id, score, n_terms, row_number() OVER (
       |    PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank FROM bag)
       |SELECT query_id, rank, doc_id, score, n_terms FROM br
       |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** The synthetic host link graph shared by t34 (PageRank) and t38
    * (reachability): the corpus is touched exactly once to derive
    * edges; everything downstream runs at GRAPH grain (hosts ≪
    * corpus). Domains are t29's registrable-domain discipline (source
    * + md5-picked TLD); each doc emits 3 outlinks whose target ordinal
    * is h60 % (src_ordinal + 1) — md5-skewed toward low-ordinal
    * domains so the graph has genuine hubs, and idx 0 is dangling by
    * construction (it only ever links to itself, and self-edges drop).
    * Returns (nodes, edges): nodes (domain, n_docs, idx, n) and edges
    * (src, tgt, cnt, outdeg), both localCheckpoint-ed so iterative
    * consumers (power iteration, BFS) don't re-derive the corpus scan
    * per round. The ordinal index exists only for this synthetic
    * derivation (real crawls ship edge lists); its global row_number
    * runs once at host grain.
    */
  private[graft] def domainGraph(
      s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val sfx = element_at(typedlit(Seq("com", "org", "net", "co.uk", "ac.uk")),
      (h60(concat(lit("tld_"), col("source"))) % 5 + 1).cast("int"))
    val dom = docs(s, d).select(col("doc_id"),
      concat(col("source"), lit("."), sfx).as("domain"))
    val nodes = dom.groupBy("domain").agg(count(lit(1)).as("n_docs"))
      .withColumn("idx",
        (row_number().over(Window.orderBy("domain")) - 1).cast("long"))
      .crossJoin(broadcast(
        dom.select("domain").distinct().agg(count(lit(1)).as("n"))))
      .localCheckpoint(true)
    val e1 = dom.join(nodes.select("domain", "idx"), Seq("domain"))
      .select(col("doc_id"), col("idx").as("src"),
        explode(sequence(lit(0), lit(2))).as("j"))
      .select(col("src"),
        (h60(concat(lit("lnk_"), col("doc_id").cast("string"), lit("_"),
          col("j").cast("string"))) % (col("src") + 1)).as("tgt"))
      .filter(col("src") =!= col("tgt"))
      .groupBy("src", "tgt").agg(count(lit(1)).as("cnt"))
    val edges = e1
      .join(e1.groupBy("src").agg(sum("cnt").as("outdeg")), Seq("src"))
      .localCheckpoint(true)
    (nodes, edges)
  }

  /** Registrable domain (eTLD+1) of a hostname: longest matching
    * public suffix from the configured multi-label subset plus one
    * label, falling back to the last two labels. The PSL subset is
    * configuration (t20's class-list rationale) — production swaps in
    * the full public-suffix list.
    */
  private[graft] def registrableOf(host: Column): Column =
    Seq("co.uk", "ac.uk").foldRight(
      regexp_extract(host, "([^.]+\\.[^.]+)$", 1)) { case (sfx, els) =>
      val esc = sfx.replace(".", "\\.")
      when(host.rlike(s"(^|\\.)[^.]+\\.$esc$$"),
        regexp_extract(host, s"([^.]+\\.$esc)$$", 1)).otherwise(els)
    }

  /** t28's engine over an arbitrary (doc_id, lang, text) frame.
    *
    * Scale shape: both sides count trigrams INSIDE the scan
    * ([[Kernels.charTrigramCounts]] — one local hash map per doc, no
    * corpus-scale trigram explode ever shuffles). The train rollup
    * partial-aggregates pre-counted (lang, tg, cnt) rows to the
    * vocabulary-sized (lang, trigram) space; its rank window partitions
    * by `lang` (|langs| groups over vocab-sized input — bounded, never
    * corpus-bound). The pruned profile pivots to ≤ |langs|·profileN
    * rows and BROADCASTS (the t18/t25 fixed-size-reference discipline).
    * The batch side emits ≤ docM ranked rows per doc straight from the
    * kernel (top-M selection is per-doc-local), so the distance join
    * touches docM·|batch| rows against a broadcast, and the per-doc
    * rollup ships only those. The corpus never shuffles on trigram.
    */
  def ngramLangId(docFrame: DataFrame, profileN: Int = 200,
      docM: Int = 50): DataFrame = {
    val langs = markers.map(_._1)
    val train = docFrame.filter(col("doc_id") % 5 =!= 4)
    val test = docFrame.filter(col("doc_id") % 5 === 4)
    val wp = Window.partitionBy("lang")
      .orderBy(col("cnt").desc, md5(col("tg")))
    val prof = langTrigramCounts(train)
      .groupBy("lang", "tg").agg(sum("cnt").as("cnt"))
      .withColumn("rk", row_number().over(wp))
      .filter(col("rk") <= profileN)
    val pivotCols = langs.map(l =>
      max(when(col("lang") === l, col("rk"))).as(s"r_$l"))
    val pivoted = prof.groupBy("tg").agg(pivotCols.head, pivotCols.tail: _*)
    val distCols = langs.map(l =>
      sum(coalesce(abs(col("drk") - col(s"r_$l")), lit(profileN.toLong)))
        .as(s"dist_$l"))
    val scored = docTrigramProfile(test, docM)
      .join(broadcast(pivoted), Seq("tg"), "left")
      .groupBy("doc_id", "lang_label")
      .agg(count(lit(1)).as("n_profile"), distCols: _*)
    val full = test.select(col("doc_id"), col("lang").as("lang_label"))
      .join(scored, Seq("doc_id", "lang_label"), "left")
      .select(col("doc_id") +: col("lang_label") +:
        coalesce(col("n_profile"), lit(0L)).as("n_profile") +:
        langs.map(l => coalesce(col(s"dist_$l"), lit(0L)).as(s"dist_$l")): _*)
    val best = langs.map(l => col(s"dist_$l")).reduce(least(_, _))
    val pred = langs.foldRight(lit("und")) { case (l, els) =>
      when(col("n_profile") > 0 && col(s"dist_$l") === best, l).otherwise(els)
    }
    full.withColumn("predicted", pred)
      .withColumn("is_correct", col("predicted") === col("lang_label"))
      .orderBy("doc_id")
  }

  /** Per-doc ranked top-M trigram profile, computed entirely inside the
    * scan: (doc_id, lang_label, tg, drk) with drk = rank by (count desc,
    * md5 asc) — the oracle's row_number twin, selected doc-locally so no
    * corpus-scale trigram frame ever exists. Docs with no trigram emit
    * nothing (the caller's left join restores them).
    */
  private[graft] def docTrigramProfile(docFrame: DataFrame,
      m: Int): DataFrame = {
    import docFrame.sparkSession.implicits._
    docFrame.select(col("doc_id"), col("lang"),
        coalesce(col("text"), lit("")))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, lang, text) =>
          Kernels.charTrigramCounts(text).toSeq
            .sortBy { case (tg, c) => (-c, md5HexScala(tg)) }
            .take(m).iterator.zipWithIndex
            .map { case ((tg, _), r) => (id, lang, tg, (r + 1).toLong) }
        }
      }
      .toDF("doc_id", "lang_label", "tg", "drk")
  }

  /** Flat (lang, tg, cnt) rows — per-doc trigram counts from the same
    * kernel, pre-counted so the global (lang, trigram) rollup
    * partial-aggregates map-side over ≤ |doc trigram set| rows per doc.
    */
  private[graft] def langTrigramCounts(docFrame: DataFrame): DataFrame = {
    import docFrame.sparkSession.implicits._
    docFrame.select(col("lang"), coalesce(col("text"), lit("")))
      .as[(String, String)]
      .mapPartitions { it =>
        it.flatMap { case (lang, text) =>
          Kernels.charTrigramCounts(text).map { case (tg, c) => (lang, tg, c) }
        }
      }
      .toDF("lang", "tg", "cnt")
  }

  /** Oracle twin of [[ngramLangId]] at (profileN=200, docM=50): the same
    * trigram extraction, md5-tiebroken ranks, out-of-place distances and
    * priority-chain argmin, recomputed relationally.
    */
  private lazy val sqlNgramLangId: String = {
    val langs = markers.map(_._1)
    val pivots = langs
      .map(l => s"max(CASE WHEN lang = '$l' THEN rk END) AS r_$l")
      .mkString(", ")
    val contribs = langs
      .map(l => s"sum(coalesce(abs(drk - r_$l), 200))::BIGINT AS dist_$l")
      .mkString(",\n       |    ")
    val dcols = langs
      .map(l => s"coalesce(dist_$l, 0)::BIGINT AS dist_$l")
      .mkString(", ")
    val bestSql = s"least(${langs.map(l => s"dist_$l").mkString(", ")})"
    val chain = langs
      .map(l => s"WHEN n_profile > 0 AND dist_$l = $bestSql THEN '$l'")
      .mkString(" ")
    s"""WITH nt AS (SELECT doc_id, lang,
       |    trim(regexp_replace(lower(coalesce(text, '')), '\\s+', ' ', 'g')) AS norm FROM documents),
       |tg AS (SELECT doc_id, lang, unnest(list_transform(range(1, length(norm) - 1),
       |    i -> norm[i:i+2])) AS tg FROM nt WHERE length(norm) >= 3),
       |tr AS (SELECT lang, tg, count(*)::BIGINT AS cnt FROM tg WHERE doc_id % 5 <> 4 GROUP BY 1, 2),
       |pr AS (SELECT lang, tg, row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, md5(tg)) AS rk FROM tr),
       |pv AS (SELECT tg, $pivots FROM pr WHERE rk <= 200 GROUP BY tg),
       |bc AS (SELECT doc_id, lang AS lang_label, tg, count(*)::BIGINT AS cnt
       |  FROM tg WHERE doc_id % 5 = 4 GROUP BY 1, 2, 3),
       |br AS (SELECT doc_id, lang_label, tg,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, md5(tg)) AS drk FROM bc),
       |dj AS (SELECT doc_id, lang_label, count(*)::BIGINT AS n_profile,
       |    $contribs
       |  FROM (SELECT doc_id, lang_label, tg, drk FROM br WHERE drk <= 50) b
       |  LEFT JOIN pv USING (tg)
       |  GROUP BY 1, 2),
       |f AS (SELECT d.doc_id, d.lang AS lang_label,
       |    coalesce(n_profile, 0)::BIGINT AS n_profile, $dcols
       |  FROM documents d LEFT JOIN dj ON d.doc_id = dj.doc_id AND d.lang = dj.lang_label
       |  WHERE d.doc_id % 5 = 4)
       |SELECT doc_id, lang_label, n_profile, ${langs.map(l => s"dist_$l").mkString(", ")},
       |  CASE $chain ELSE 'und' END AS predicted,
       |  (CASE $chain ELSE 'und' END = lang_label) AS is_correct
       |FROM f ORDER BY doc_id""".stripMargin
  }

  /** t18/t19's shared oracle: the LM re-derived from the stored slice's
    * text — for t19 this is the INDEPENDENT recomputation proving the
    * persisted count sidecar is lossless.
    */
  private lazy val sqlFamiliarity =
    s"""WITH t AS (SELECT doc_id, $sqlToks AS toks FROM documents),
      |b AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] AS bg
      |  FROM t, unnest(range(1, len(toks))) AS u(i)),
      |lm AS (SELECT bg, count(*)::BIGINT AS cnt FROM b
      |  WHERE doc_id % 5 <> 4 GROUP BY bg
      |  ORDER BY cnt DESC, md5(bg) LIMIT 500),
      |sc AS (SELECT b.doc_id, count(*)::BIGINT AS n_bigrams,
      |    count(lm.bg)::BIGINT AS n_known,
      |    coalesce(sum(lm.cnt), 0)::BIGINT AS familiarity
      |  FROM b LEFT JOIN lm USING (bg)
      |  WHERE b.doc_id % 5 = 4 GROUP BY b.doc_id)
      |SELECT d.doc_id,
      |  coalesce(sc.n_bigrams, 0) AS n_bigrams,
      |  coalesce(sc.n_known, 0) AS n_known,
      |  coalesce(sc.familiarity, 0) AS familiarity,
      |  CASE WHEN coalesce(sc.n_bigrams, 0) > 0
      |       THEN sc.n_known * 1.0 / sc.n_bigrams END AS coverage
      |FROM documents d LEFT JOIN sc USING (doc_id)
      |WHERE d.doc_id % 5 = 4 ORDER BY d.doc_id""".stripMargin

  /** Per-process LM count sidecar (the t19 fixture) — the stored
    * slice's bigram counts at the same per-batch layout the streaming
    * [[graft.streaming.DocumentStreams.lmIngest]] producer writes, so
    * the gate's store is structurally a one-batch instance of the
    * streamed store.
    */
  /** t33/t35's labeled token frame: (doc_id, toks, pos) with the
    * stopword-ratio teacher label. One definition so the distilled model
    * and its stored-model twin can never diverge on labeling.
    */
  private[graft] def clfLabeled(df: DataFrame): DataFrame = {
    val stops = Seq("the", "a", "of", "and", "to", "in", "is", "it")
    df.select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("pos",
        size(filter(col("toks"), x => x.isin(stops: _*))) * 20 >=
          size(col("toks")))
  }

  /** The labeled per-token class-occurrence counts (tok, cp, cn) of a
    * labeled frame — the model's ADDITIVE sufficient statistics (counts
    * sum across batches, the SURVEY §7.4 rule-9 fold), shared by the
    * inline trainer and the clfIngest streaming sidecar producer.
    */
  private[graft] def clfCountsOf(train: DataFrame): DataFrame =
    train.select(col("pos"), explode(col("toks")).as("tok"))
      .groupBy("tok")
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("cp"),
        sum(when(!col("pos"), 1L).otherwise(0L)).as("cn"))

  /** Weights from a (tok, cp, cn) counts frame: class totals over ALL
    * tokens, top-256 vocabulary by occurrence count (md5 tiebreak), ppm
    * fixed-point log-odds surrogate. One definition for the inline
    * retrain (t33), the stored model build (t35) and the streamed
    * sidecar consumer, so they cannot diverge.
    */
  private[graft] def clfWeightsOfCounts(counts: DataFrame): DataFrame = {
    val tot = counts.agg(sum(col("cp")).as("tp"), sum(col("cn")).as("tn"))
    counts
      .orderBy((col("cp") + col("cn")).desc, md5(col("tok")))
      .limit(256)
      .crossJoin(broadcast(tot))
      .select(col("tok"),
        (expr("(cp * 1000000) div tp") -
          expr("(cn * 1000000) div tn")).as("wt"))
  }

  /** Weights from the clfIngest count sidecar: fold per-batch counts by
    * sum (additive statistics), then [[clfWeightsOfCounts]]. The
    * threshold deliberately stays a sample-side rebuild: calibration
    * needs per-DOC train scores under the final weights, which no
    * token-grain additive store can supply — the train sample is small
    * and persisted by definition, so re-scoring it is O(sample).
    */
  private[graft] def clfWeightsFromStore(s: SparkSession,
      store: String): DataFrame =
    clfWeightsOfCounts(s.read.parquet(store).groupBy("tok")
      .agg(sum(col("cp")).as("cp"), sum(col("cn")).as("cn")))

  /** Train the t33 model on a labeled (sample-bounded) frame: returns
    * (weights (tok, wt) — 256 rows, calibrated threshold (thr) — 1 row).
    */
  private[graft] def clfModelOf(train: DataFrame): (DataFrame, DataFrame) = {
    val w = clfWeightsOfCounts(clfCountsOf(train))
    val trainScored = clfScoredRaw(train, w)
    val best = trainScored
      .select(col("snorm").as("thr")).distinct()
      .crossJoin(broadcast(trainScored.select(col("snorm"), col("pos"))))
      .groupBy("thr")
      .agg(sum(when((col("snorm") > col("thr")) === col("pos"), 1L)
        .otherwise(0L)).as("acc"))
      .orderBy(col("acc").desc, col("thr").asc)
      .limit(1)
      .select("thr")
    (w, best)
  }

  /** Per-doc classifier bookkeeping over a labeled frame: (doc_id,
    * n_tokens, n_known, score, snorm, pos) via the broadcast model.
    */
  private def clfScoredRaw(df: DataFrame, w: DataFrame): DataFrame = {
    val sc = df.select(col("doc_id"), explode(col("toks")).as("tok"))
      .join(broadcast(w), Seq("tok"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("nk"), sum(col("wt")).as("sc"))
    df.select(col("doc_id"),
      size(col("toks")).cast("long").as("n_tokens"), col("pos"))
      .join(sc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("nk"), lit(0L)).as("n_known"),
        coalesce(col("sc"), lit(0L)).as("score"),
        when(col("n_tokens") > 0,
          coalesce(col("sc"), lit(0L)).cast("double") / col("n_tokens"))
          .otherwise(lit(0.0)).as("snorm"),
        col("pos"))
  }

  /** The t33/t35 output: score a labeled frame against a model + the
    * 1-row threshold frame, with keep/agree decision columns.
    */
  private def clfScoreOf(df: DataFrame, w: DataFrame,
      thr: DataFrame): DataFrame =
    clfScoredRaw(df, w)
      .crossJoin(broadcast(thr))
      .select(col("doc_id"), col("n_tokens"), col("n_known"),
        col("score"), col("snorm"), col("thr"),
        (col("snorm") > col("thr")).as("keep"),
        col("pos").as("label_heuristic"),
        ((col("snorm") > col("thr")) === col("pos")).as("agree"))
      .orderBy("doc_id")

  /** Persisted model store for t35: `weights/` (tok, wt) and
    * `threshold/` (thr), built once per JVM from the t33 train slice.
    */
  private def clfStorePath(s: SparkSession, d: String): String =
    graft.core.StoreFixture("graft_clfstore", d) { p =>
      val (w, best) = clfModelOf(clfLabeled(docs(s, d))
        .filter(col("doc_id") % 5 === 4 && col("doc_id") < 2000))
      w.coalesce(1).write.mode("overwrite").parquet(s"$p/weights")
      best.coalesce(1).write.mode("overwrite").parquet(s"$p/threshold")
    }

  /** Shared t33/t35 oracle: retrain + score in DuckDB — the stored-model
    * consumer must be bit-identical to this recompute.
    */
  private lazy val sqlQualityClassifier: String =
    s"""WITH l2 AS (SELECT doc_id, $sqlToks AS toks,
       |    len(list_filter($sqlToks, x -> x IN
       |      ('the','a','of','and','to','in','is','it'))) * 20
       |      >= len($sqlToks) AS pos
       |  FROM documents),
       |occ AS (SELECT pos, unnest(toks) AS tok FROM l2
       |  WHERE doc_id % 5 = 4 AND doc_id < 2000),
       |tot AS (SELECT sum(CASE WHEN pos THEN 1 ELSE 0 END)::BIGINT AS tp,
       |    sum(CASE WHEN NOT pos THEN 1 ELSE 0 END)::BIGINT AS tn FROM occ),
       |w AS (SELECT tok,
       |    (cp * 1000000) // tp - (cn * 1000000) // tn AS wt
       |  FROM (SELECT tok,
       |      sum(CASE WHEN pos THEN 1 ELSE 0 END)::BIGINT AS cp,
       |      sum(CASE WHEN NOT pos THEN 1 ELSE 0 END)::BIGINT AS cn,
       |      count(*)::BIGINT AS c
       |    FROM occ GROUP BY 1 ORDER BY c DESC, md5(tok) LIMIT 256), tot),
       |sco AS (SELECT l.doc_id, len(l.toks)::BIGINT AS n_tokens,
       |    coalesce(s.nk, 0)::BIGINT AS n_known,
       |    coalesce(s.sc, 0)::BIGINT AS score, l.pos
       |  FROM l2 l LEFT JOIN (
       |    SELECT o.doc_id, count(*)::BIGINT AS nk, sum(w.wt)::BIGINT AS sc
       |    FROM (SELECT doc_id, unnest(toks) AS tok FROM l2) o
       |    JOIN w ON o.tok = w.tok GROUP BY 1) s ON l.doc_id = s.doc_id),
       |sn AS (SELECT *, CASE WHEN n_tokens > 0
       |    THEN score::DOUBLE / n_tokens ELSE 0.0 END AS snorm FROM sco),
       |cal AS (SELECT c.thr,
       |    sum(CASE WHEN (s.snorm > c.thr) = s.pos THEN 1 ELSE 0 END) AS acc
       |  FROM (SELECT DISTINCT snorm AS thr FROM sn
       |    WHERE doc_id % 5 = 4 AND doc_id < 2000) c
       |  CROSS JOIN (SELECT snorm, pos FROM sn
       |    WHERE doc_id % 5 = 4 AND doc_id < 2000) s GROUP BY 1),
       |best AS (SELECT thr FROM cal ORDER BY acc DESC, thr LIMIT 1)
       |SELECT doc_id, n_tokens, n_known, score, snorm, thr,
       |  snorm > thr AS keep, pos AS label_heuristic,
       |  (snorm > thr) = pos AS agree
       |FROM sn, best WHERE doc_id % 5 <> 4 OR doc_id >= 2000
       |ORDER BY doc_id""".stripMargin

  private def lmStorePath(s: SparkSession, d: String): String =
    graft.core.StoreFixture("graft_lmstore", d) { p =>
      bigramOcc(docs(s, d).filter(col("doc_id") % 5 =!= 4))
        .groupBy("bg").agg(count(lit(1)).as("cnt"))
        .write.mode("overwrite").parquet(s"$p/batch_id=0")
    }

  /** t27's batch membership: an md5-derived 1-in-5 hash of doc_id, NOT
    * the incremental gates' doc_id%5 — the synthetic generator assigns
    * source = src(doc_id % 20), so ANY modular id split is perfectly
    * correlated with source and every grid cell would read as
    * new/vanished; the hash split decorrelates while staying
    * deterministic and oracle-reproducible.
    * DuckDB twin: `('0x' || substr(md5('drift_' || doc_id), 1, 15))
    * ::BIGINT % 5 = 4`.
    */
  private def driftBatchCol: Column =
    h60(concat(lit("drift_"), col("doc_id").cast("string"))) % 5 === 4

  /** The t27 card sidecar — per-(source, lang) doc counts over
    * everything OUTSIDE the gate batch, the stored half of the drift
    * comparison; grid-sized (|sources|×|langs| rows), built once per
    * JVM (StoreFixture discipline), maintained per batch in production
    * by the same additive fold as every count sidecar here.
    */
  private def cardStorePath(s: SparkSession, d: String): String =
    graft.core.StoreFixture("graft_cardstore", d) { p =>
      docs(s, d).filter(!driftBatchCol)
        .groupBy("source", "lang").agg(count(lit(1)).as("stored_docs"))
        .write.mode("overwrite").parquet(s"$p/batch_id=0")
    }

  /** Force-build the TextAnalysis sidecars (LM counts, dataset card)
    * for input `d` — Bench warmup hook; see Dedup.warmStores for why a
    * best-of-1 sweep must not charge the once-per-JVM store build to
    * the first gated consumer.
    */
  private[graft] def warmStores(s: SparkSession, d: String): Unit = {
    lmStorePath(s, d); cardStorePath(s, d); bm25StorePath(s, d); ()
  }

  /** The t27 consumer over an arbitrary batch frame and ANY producer's
    * card sidecar (the gate's one-batch fixture or the streamed
    * multi-batch store — per-batch cell counts SUM at read, the
    * familiarityOf additive-fold discipline).
    */
  private[graft] def driftOf(batchDocs: DataFrame,
      storePath: String): DataFrame = {
    val s = batchDocs.sparkSession
    val stored = s.read.parquet(storePath)
      .groupBy("source", "lang")
      .agg(sum(col("stored_docs")).as("stored_docs"))
    val batch = batchDocs
      .groupBy("source", "lang").agg(count(lit(1)).as("batch_docs"))
    val grid = stored.join(batch, Seq("source", "lang"), "full_outer")
      .na.fill(0L, Seq("stored_docs", "batch_docs"))
    val totS = stored.agg(sum(col("stored_docs")).as("n_stored_total"))
    val totB = batch.agg(sum(col("batch_docs")).as("n_batch_total"))
    // cross products in decimal(38,0): counts can reach ~1e10 at the
    // 100 TB corpus this monitor narrates, and 1e9-count cells times a
    // 1e10 total overflow a long — exactly the hazard MinHashP
    // documents (DuckDB aborts on bigint overflow, the JVM silently
    // wraps). Decimal keeps the verdicts exact; the oracle's twin is
    // HUGEINT.
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    grid.crossJoin(broadcast(totS)).crossJoin(broadcast(totB))
      .withColumn("status",
        when(col("stored_docs") === 0, "new")
          .when(col("batch_docs") === 0, "vanished")
          .when(dec(col("batch_docs")) * dec(col("n_stored_total")) >
            dec(col("stored_docs")) * dec(col("n_batch_total")) * 2, "over")
          .when(dec(col("batch_docs")) * dec(col("n_stored_total")) * 2 <
            dec(col("stored_docs")) * dec(col("n_batch_total")), "under")
          .otherwise("stable"))
      .select(col("source"), col("lang"),
        col("stored_docs"), col("batch_docs"),
        (col("stored_docs") * lit(1.0) / col("n_stored_total"))
          .as("stored_share"),
        (col("batch_docs") * lit(1.0) / col("n_batch_total"))
          .as("batch_share"),
        col("status"))
      .orderBy("source", "lang")
  }

  /** The t19 consumer over an arbitrary (doc_id, text) batch frame and
    * ANY producer's count sidecar (the gate's one-batch fixture or the
    * streamed multi-batch store) — per-batch counts SUM at read (the
    * additive fold), then t18's exact scoring path.
    */
  private[graft] def familiarityOf(batchDocs: DataFrame,
      storePath: String): DataFrame = {
    val s = batchDocs.sparkSession
    val lm = s.read.parquet(storePath)
      .groupBy("bg").agg(sum(col("cnt")).as("cnt"))
      .orderBy(col("cnt").desc, md5(col("bg")))
      .limit(500)
    val scored = bigramOcc(batchDocs)
      .join(broadcast(lm), Seq("bg"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("nb"), count(col("cnt")).as("nk"),
        coalesce(sum(col("cnt")), lit(0L)).as("fam"))
    batchDocs.select("doc_id")
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("nb"), lit(0L)).as("n_bigrams"),
        coalesce(col("nk"), lit(0L)).as("n_known"),
        coalesce(col("fam"), lit(0L)).as("familiarity"),
        when(coalesce(col("nb"), lit(0L)) > 0,
          col("nk") * lit(1.0) / col("nb")).as("coverage"))
      .orderBy("doc_id")
  }

  /** t18's bigram-occurrence stream over an arbitrary (doc_id, text)
    * frame — one row per ADJACENT token pair, occurrences not distinct.
    * A one-pass kernel (the t11/t12 discipline: array HOFs are
    * CodegenFallback — interpreted per row — a measured 3.4× tax on a
    * corpus-wide extraction); space-only split = the oracle's
    * string_split(text, ' ') exactly, null ≡ empty doc
    * ([[graft.functions.Kernels.spaceTokens]]). Callers filter BEFORE
    * invoking so the predicate pushes to the parquet scan.
    */
  private[graft] def bigramOcc(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, tx) =>
        val toks = Kernels.spaceTokens(tx)
        (0 until toks.length - 1).iterator
          .map(i => (id, toks(i) + " " + toks(i + 1)))
      })
      .toDF("doc_id", "bg")
  }

  /** The t17 chunker over an arbitrary (doc_id, text) frame — the form
    * the null-robustness spec drives. Geometry: C=64-token chunks every
    * S=48 tokens, trailing chunk flushed to the last token; all offsets
    * integer-exact, chunk text gated by md5.
    */
  private[graft] def chunksOf(docFrame: DataFrame): DataFrame = {
    val C = ChunkC.toLong
    val S = ChunkS.toLong
    // null ≡ empty doc (the kernel contract), and BOTH engines need the
    // guard: Spark's size(tokens(null)) = -1 slips past the n === 0
    // test, and DuckDB 1.0's greatest()/least() IGNORE null operands
    // (greatest(NULL - 64, 0) = 0), so each side would emit one phantom
    // chunk for a null doc without its coalesce — the oracle carries
    // the matching coalesce(text, '')
    val t = tokens(coalesce(col("text"), lit("")))
    // ceil((n-C)/S) via integer add-divide: Column./ is IEEE double
    // division, exact here (operands < 2^53) — truncating cast =
    // floor for the non-negative numerator
    val nchunks = when(col("n") === 0, lit(0L)).otherwise(
      lit(1L) + ((greatest(col("n") - C, lit(0L)) + (S - 1)) / S)
        .cast("long"))
    val start0 = col("chunk_idx") * S // 0-based first token
    docFrame
      .select(col("doc_id"), t.as("toks"),
        size(t).cast("long").as("n"))
      .withColumn("nchunks", nchunks)
      // sequence(0, -1) would DESCEND ([0, -1]) for empty docs —
      // guard to an empty array so explode drops them (= the
      // oracle's empty range(0, 0))
      .withColumn("chunk_idx", explode(when(col("nchunks") > 0,
        sequence(lit(0L), col("nchunks") - 1))
        .otherwise(array().cast("array<long>"))))
      .select(col("doc_id"), col("chunk_idx"),
        (start0 + 1).as("chunk_start"),
        (least(start0 + C, col("n")) - start0).as("n_chunk_tokens"),
        md5(concat_ws(" ", slice(col("toks"),
          (start0 + 1).cast("int"),
          (least(start0 + C, col("n")) - start0).cast("int"))))
          .as("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** Row shape of t06 — signal fractions are None where the denominator
    * is 0 (unreachable by the rule chain: the too_short rule fires first).
    */
  private[graft] final case class T06(doc_id: Long, n_words: Long,
      mean_word_len: Option[Double], alpha_ratio: Option[Double],
      stop_frac: Option[Double], dup_bigram_frac: Option[Double],
      drop_reason: Option[String], keep: Boolean)

  private val stopSet: java.util.Set[String] =
    java.util.Set.of("the", "a", "of", "and", "to", "in", "is", "it")

  /** Single-pass quality-filter kernel for one document: every signal the
    * rule chain needs (word count, mean word length in CODEPOINTS, a-z
    * ratio, stopword fraction, duplicate-bigram fraction) from one scan of
    * the token array — the t05 discipline. Signal formulas are the exact
    * twins of the t01/t02/t05 oracle SQL (integer counts, one final
    * `* 1.0 / n` IEEE division), so the threshold comparisons decide
    * identically in both engines.
    */
  private[graft] def qualityFilterOf(id: Long, rawText: String): T06 = {
    // null text ≡ empty document (the Kernels.lowerTokens contract): a
    // kernel NPE inside mapPartitions fails the whole task on real
    // crawl data; an empty doc just fails the min-words rule
    val text = if (rawText == null) "" else rawText
    val toks = Kernels.spaceTokens(text)
    val n = toks.length
    def cp(s: String): Int = s.codePointCount(0, s.length)
    val mwl =
      if (n > 0) Some(toks.iterator.map(cp(_).toLong).sum * 1.0 / n) else None
    val textCp = cp(text)
    var alphaCnt = 0L
    var i = 0
    while (i < text.length) {
      val c = text.codePointAt(i)
      if (c >= 'a' && c <= 'z') alphaCnt += 1
      i += Character.charCount(c)
    }
    val alpha = if (textCp > 0) Some(alphaCnt * 1.0 / textCp) else None
    val stopf =
      if (n > 0) Some(toks.count(stopSet.contains) * 1.0 / n) else None
    val bigrams = new java.util.HashSet[String]()
    i = 0
    while (i < n - 1) { bigrams.add(toks(i) + " " + toks(i + 1)); i += 1 }
    val nb = math.max(n - 1, 0)
    val dupbg = if (nb > 0) Some(1.0 - bigrams.size * 1.0 / nb) else None
    val reason =
      if (n < 20) Some("too_short")
      else if (n > 10000) Some("too_long")
      else if (mwl.get < 2.0 || mwl.get > 12.0) Some("word_length")
      else if (alpha.get < 0.55) Some("symbol_heavy")
      else if (stopf.get < 0.01) Some("no_stopwords")
      else if (dupbg.get > 0.1) Some("repetitive")
      else None
    T06(id, n.toLong, mwl, alpha, stopf, dupbg, reason, reason.isEmpty)
  }

  /** Row shape of t05 — fractions are None where the denominator is 0. */
  private[operators] final case class T05(doc_id: Long, n_bigrams: Long,
      dup_bigram_frac: Option[Double], dup_trigram_frac: Option[Double],
      top_token_frac: Option[Double], top_bigram: Option[String],
      top_bigram_char_frac: Option[Double])

  /** Single-pass repetition kernel for one document. Tokenization matches
    * the oracle's `string_split(text, ' ')` + drop-empties exactly (split
    * on the space character only); all character counts are unicode
    * codepoints (= DuckDB `len`), not UTF-16 units, so non-ASCII text
    * hashes identically.
    */
  private[operators] def repetitionOf(docId: Long, rawText: String): T05 = {
    val text = if (rawText == null) "" else rawText // null ≡ empty doc
    val toks = Kernels.spaceTokens(text)
    val n = toks.length
    def cp(s: String): Int = s.codePointCount(0, s.length)
    // UTF-8 byte order == codepoint order == DuckDB's binary collation;
    // Scala's String ordering is UTF-16 code-unit order, which differs
    // for supplementary characters.
    def utf8Lt(a: String, b: String): Boolean =
      java.util.Arrays.compareUnsigned(
        a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        b.getBytes(java.nio.charset.StandardCharsets.UTF_8)) < 0
    val bigrams = new java.util.HashMap[String, Int]()
    var i = 0
    while (i < n - 1) {
      bigrams.merge(toks(i) + " " + toks(i + 1), 1, Integer.sum)
      i += 1
    }
    val trigrams = new java.util.HashSet[String]()
    i = 0
    while (i < n - 2) {
      trigrams.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
      i += 1
    }
    val tokCounts = new java.util.HashMap[String, Int]()
    toks.foreach(t => tokCounts.merge(t, 1, Integer.sum))
    var maxTok = 0
    tokCounts.values.forEach(v => if (v > maxTok) maxTok = v)
    var topB: String = null
    var topC = 0
    bigrams.forEach { (k, v) =>
      if (v > topC || (v == topC && topC > 0 && utf8Lt(k, topB))) {
        topB = k; topC = v
      }
    }
    val nb = math.max(n - 1, 0)
    val nt = math.max(n - 2, 0)
    T05(docId, nb.toLong,
      if (nb > 0) Some(1.0 - bigrams.size * 1.0 / nb) else None,
      if (nt > 0) Some(1.0 - trigrams.size * 1.0 / nt) else None,
      if (n > 0) Some(maxTok * 1.0 / n) else None,
      Option(topB),
      if (topB != null) Some(cp(topB) * topC * 1.0 / cp(text)) else None)
  }
}
