package graft

import graft.EntrySupport.ccKeeperCtes

/** DuckDB oracle SQL for the declared queries (batches 18-21) — same tables,
  * same column names, same row order as the Spark bodies in the
  * EntryQueries files; split from SparkEntry behind the same
  * `oracleSql` map.
  */
private[graft] object EntryOraclesC {

  val map: Map[String, String] = Map(
    // ---- batch 18 ----

    "q_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS toks
        |  FROM documents),
        |base AS (
        |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks,
        |         round(len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE), 4)
        |           AS distinct_ratio
        |  FROM t),
        |pos AS (
        |  SELECT doc_id, toks, i
        |  FROM t, unnest(generate_series(1, len(toks))) AS u(i)),
        |runs AS (
        |  SELECT doc_id, toks[i] AS tok,
        |         i - row_number() OVER (PARTITION BY doc_id, toks[i] ORDER BY i) AS g
        |  FROM pos),
        |rl AS (SELECT doc_id, count(*) AS r FROM runs GROUP BY doc_id, tok, g),
        |mr AS (SELECT doc_id, CAST(max(r) AS BIGINT) AS max_run FROM rl GROUP BY doc_id),
        |bg AS (SELECT doc_id, toks[i] AS p, toks[i + 1] AS n
        |       FROM pos WHERE i < len(toks)),
        |bgc AS (SELECT doc_id, count(*) AS c FROM bg GROUP BY doc_id, p, n),
        |bgm AS (SELECT doc_id, max(c) AS mc FROM bgc GROUP BY doc_id)
        |SELECT b.doc_id, b.n_toks, b.distinct_ratio, mr.max_run,
        |       coalesce(round(2.0 * bgm.mc / b.n_toks, 4), 0.0) AS top_bigram_frac
        |FROM base b JOIN mr USING (doc_id) LEFT JOIN bgm USING (doc_id)
        |ORDER BY b.doc_id""".stripMargin,

    "q_lm_interp" ->
      """WITH dt AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS toks
        |  FROM documents),
        |pos AS (
        |  SELECT doc_id, toks[i] AS prev, toks[i + 1] AS next
        |  FROM dt, unnest(generate_series(1, len(toks) - 1)) AS u(i)
        |  WHERE len(toks) >= 2),
        |db AS (SELECT doc_id, prev, next, count(*) AS c FROM pos GROUP BY 1, 2, 3),
        |lk AS (SELECT prev, next, CAST(sum(c) AS BIGINT) AS bc FROM db GROUP BY 1, 2),
        |lk2 AS (SELECT prev, next, bc,
        |        CAST(sum(bc) OVER (PARTITION BY prev) AS BIGINT) AS cc FROM lk),
        |uni AS (SELECT next, CAST(sum(c) AS BIGINT) AS uc FROM db GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS tt FROM db)
        |SELECT db.doc_id, CAST(sum(db.c) AS BIGINT) AS n_bigrams,
        |       round(sum(db.c * ln(0.7 * bc / cc + (1 - 0.7) * uc / tt)) / sum(db.c), 4)
        |         AS interp_logprob
        |FROM db JOIN lk2 USING (prev, next) JOIN uni USING (next), tot
        |GROUP BY db.doc_id ORDER BY db.doc_id""".stripMargin,

    // CCNet perplexity terciles over the SAME interp-LM chain: band by
    // (4dp score DESC, doc_id) through SQL ntile — the exact
    // rank-arithmetic bandedNtile reproduces — then per-band stats
    "q_ppl_band" ->
      """WITH dt AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS toks
        |  FROM documents),
        |pos AS (
        |  SELECT doc_id, toks[i] AS prev, toks[i + 1] AS next
        |  FROM dt, unnest(generate_series(1, len(toks) - 1)) AS u(i)
        |  WHERE len(toks) >= 2),
        |db AS (SELECT doc_id, prev, next, count(*) AS c FROM pos GROUP BY 1, 2, 3),
        |lk AS (SELECT prev, next, CAST(sum(c) AS BIGINT) AS bc FROM db GROUP BY 1, 2),
        |lk2 AS (SELECT prev, next, bc,
        |        CAST(sum(bc) OVER (PARTITION BY prev) AS BIGINT) AS cc FROM lk),
        |uni AS (SELECT next, CAST(sum(c) AS BIGINT) AS uc FROM db GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS tt FROM db),
        |sc AS (
        |  SELECT db.doc_id,
        |         round(sum(db.c * ln(0.7 * bc / cc + (1 - 0.7) * uc / tt)) / sum(db.c), 4)
        |           AS lp
        |  FROM db JOIN lk2 USING (prev, next) JOIN uni USING (next), tot
        |  GROUP BY db.doc_id),
        |b AS (
        |  SELECT doc_id, lp,
        |         CAST(ntile(3) OVER (ORDER BY lp DESC, doc_id) AS BIGINT) AS band
        |  FROM sc)
        |SELECT band, CAST(count(*) AS BIGINT) AS n_docs,
        |       round(min(lp), 4) AS lo, round(max(lp), 4) AS hi,
        |       round(avg(lp), 4) AS mean_r
        |FROM b GROUP BY band ORDER BY band""".stripMargin,

    // derivation oracle: the Spark side ENCODES and DECODES real PPM
    // bytes; the oracle restates the channel statistics the solid-color
    // construction implies, including the corrupt-every-10th quarantine
    "q_media_decode" ->
      """SELECT doc_id AS media_id,
        |       CAST(CASE WHEN doc_id % 10 = 0 THEN 0 ELSE 1 END AS BIGINT) AS n_frames,
        |       CASE WHEN doc_id % 10 = 0 THEN NULL ELSE 2.0 END AS w,
        |       CASE WHEN doc_id % 10 = 0 THEN NULL ELSE 2.0 END AS h,
        |       CASE WHEN doc_id % 10 = 0 THEN NULL
        |            ELSE CAST(doc_id % 256 AS DOUBLE) END AS mean_r,
        |       CASE WHEN doc_id % 10 = 0 THEN NULL
        |            ELSE CAST((doc_id * 7) % 256 AS DOUBLE) END AS mean_g,
        |       CASE WHEN doc_id % 10 = 0 THEN NULL
        |            ELSE CAST((doc_id * 13) % 256 AS DOUBLE) END AS mean_b,
        |       CASE WHEN doc_id % 10 = 0 THEN NULL
        |            ELSE round(0.299 * (doc_id % 256) + 0.587 * ((doc_id * 7) % 256)
        |                       + 0.114 * ((doc_id * 13) % 256), 4) END AS luma_mean_r,
        |       CASE WHEN doc_id % 10 = 0 THEN NULL ELSE 0.0 END AS luma_std_r
        |FROM documents ORDER BY media_id""".stripMargin,

    // JPEG derivation oracle: wb×hb grid of 8×8 constant blocks, block
    // k = base+2k (even offsets from 128 ⇒ DC quantization exact and
    // decode lossless); mean = base+nb−1 (arithmetic-sequence mean,
    // integer), per-pixel std = √((nb²−1)/3); every 9th payload
    // truncated ⇒ quarantined row
    "q_media_jpeg" ->
      """WITH d AS (
        |  SELECT doc_id, 2 + doc_id % 3 AS wb, 2 + doc_id % 2 AS hb,
        |         60 + (doc_id % 80) * 2 AS base
        |  FROM documents)
        |SELECT doc_id AS media_id,
        |       CAST(CASE WHEN doc_id % 9 = 0 THEN 0 ELSE 1 END AS BIGINT) AS n_frames,
        |       CASE WHEN doc_id % 9 = 0 THEN NULL ELSE CAST(wb * 8 AS DOUBLE) END AS w,
        |       CASE WHEN doc_id % 9 = 0 THEN NULL ELSE CAST(hb * 8 AS DOUBLE) END AS h,
        |       CASE WHEN doc_id % 9 = 0 THEN NULL
        |            ELSE CAST(base + wb * hb - 1 AS DOUBLE) END AS mean_gray,
        |       CASE WHEN doc_id % 9 = 0 THEN NULL
        |            ELSE round(sqrt((wb * hb * wb * hb - 1) / 3.0), 4) END AS luma_std_r
        |FROM d ORDER BY media_id""".stripMargin,

    // PNG derivation oracle: pixel = base + x%4 + 2·(y%2) with w a
    // multiple of 4 and h even ⇒ offsets balance exactly; lossless
    // decode ⇒ mean = base+2.5 and std = √(1.25+1.0) = 1.5 hold
    // bit-exactly; every 11th payload truncated, every 13th CRC-flipped
    // ⇒ quarantined rows
    "q_media_png" ->
      """WITH d AS (
        |  SELECT doc_id, 12 + (doc_id % 7) * 4 AS w, 10 + (doc_id % 5) * 6 AS h,
        |         40 + doc_id % 150 AS base,
        |         (doc_id % 11 = 0 OR doc_id % 13 = 0) AS bad
        |  FROM documents)
        |SELECT doc_id AS media_id,
        |       CAST(CASE WHEN bad THEN 0 ELSE 1 END AS BIGINT) AS n_frames,
        |       CASE WHEN bad THEN NULL ELSE CAST(w AS DOUBLE) END AS w,
        |       CASE WHEN bad THEN NULL ELSE CAST(h AS DOUBLE) END AS h,
        |       CASE WHEN bad THEN NULL ELSE CAST(base AS DOUBLE) + 2.5 END AS mean_gray,
        |       CASE WHEN bad THEN NULL ELSE CAST(1.5 AS DOUBLE) END AS luma_std_r
        |FROM d ORDER BY media_id""".stripMargin,

    // square-wave derivation oracle: n samples at 8 kHz, period 8 →
    // duration n/8000, rms amp/2^15 (exact), flips floor((n-1)/4)
    "q_audio_decode" ->
      """WITH d AS (
        |  SELECT doc_id, 800 + (doc_id % 5) * 400 AS n,
        |         500 + (doc_id % 100) * 100 AS amp
        |  FROM documents)
        |SELECT doc_id AS media_id,
        |       CAST(CASE WHEN doc_id % 7 = 0 THEN 0 ELSE 1 END AS BIGINT) AS n_frames,
        |       CASE WHEN doc_id % 7 = 0 THEN NULL
        |            ELSE CAST(n AS DOUBLE) / 8000 END AS dur_sec,
        |       CASE WHEN doc_id % 7 = 0 THEN NULL
        |            ELSE CAST(amp AS DOUBLE) / 32768 END AS rms,
        |       CASE WHEN doc_id % 7 = 0 THEN NULL
        |            ELSE CAST((n - 1) // 4 AS DOUBLE) / (CAST(n AS DOUBLE) / 8000) END AS zcr
        |FROM d ORDER BY media_id""".stripMargin,

    "q_ngram_novelty" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text || ' zz9 zz9' FROM documents),
        |tok AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS toks
        |  FROM corpus),
        |shx AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, greatest(len(toks) - 2, 1)),
        |    i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2])))) AS shingle
        |  FROM tok),
        |hx AS (
        |  SELECT doc_id,
        |         ('0x' || substr(md5(shingle), 1, 8))::BIGINT % 2147483647 AS h
        |  FROM shx),
        |first AS (SELECT h, min(doc_id) AS first_id FROM hx GROUP BY h)
        |SELECT hx.doc_id,
        |       count(*) AS n_shingles,
        |       CAST(sum(CASE WHEN f.first_id = hx.doc_id THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_novel,
        |       round(sum(CASE WHEN f.first_id = hx.doc_id THEN 1 ELSE 0 END)
        |             / CAST(count(*) AS DOUBLE), 6) AS novelty_r
        |FROM hx JOIN first f USING (h)
        |GROUP BY hx.doc_id ORDER BY hx.doc_id""".stripMargin,

    "q_recency_score" ->
      """SELECT user_id,
        |       count(*) AS n_events,
        |       max(epoch_us(ts)) AS last_seen_us,
        |       round(sum(value / power(2, floor(
        |         ((1705708800000000 - epoch_us(ts)) / 86400000000.0) / 2.0))), 4)
        |         AS recency_score_r
        |FROM events
        |WHERE user_id IS NOT NULL AND epoch_us(ts) <= 1705708800000000
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    // ---- batch 19 ----

    // occurrence key doc_id*1e6 + (line-1)*1e3 + chunk matches the
    // Spark side's packed (doc, line, chunk) total order (Spark lines
    // are 0-based posexplode; generate_series here is 1-based)
    "q_dedup_lines" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text || ' zz9 zz9' FROM documents),
        |ln AS (
        |  SELECT doc_id, li,
        |         list_filter(string_split(lines[li], ' '), t -> t != '') AS toks
        |  FROM (SELECT doc_id, string_split(text, chr(10)) AS lines FROM corpus),
        |       unnest(generate_series(1, len(lines))) AS u(li)),
        |seg AS (
        |  SELECT doc_id, li, si,
        |         array_to_string(list_slice(toks, si * 8 + 1, si * 8 + 8), ' ') AS seg
        |  FROM ln, unnest(generate_series(0, (len(toks) - 1) // 8)) AS v(si)
        |  WHERE len(toks) >= 1),
        |keyed AS (
        |  SELECT doc_id, seg,
        |         doc_id * 1000000 + (li - 1) * 1000 + si AS k
        |  FROM seg),
        |firsts AS (
        |  SELECT doc_id, k, min(k) OVER (PARTITION BY seg) AS first_k FROM keyed)
        |SELECT doc_id,
        |       count(*) AS n_segs,
        |       CAST(sum(CASE WHEN k <> first_k THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
        |       round(sum(CASE WHEN k <> first_k THEN 1 ELSE 0 END)
        |             / CAST(count(*) AS DOUBLE), 4) AS dup_frac
        |FROM firsts GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // full ExactSubstr: duplicated-8-gram runs merged into maximal
    // covered-token intervals; pk packing mirrors the engine
    // (doc_id·2^20 + i)
    "q_dedup_substr_spans" -> substrSpansOracleSql(8),

    // the L-knob at the Lee et al. 2022 operating point: the paper
    // deduplicates repeats of length >= 50 tokens; same template, L=50
    "q_dedup_substr_spans50" -> substrSpansOracleSql(50),

    // the trim twin: non-first occurrences of duplicated spans cut,
    // kept tokens reassembled in position order
    "q_dedup_substr_trim" -> substrTrimOracleSql(8),
    "q_dedup_substr_trim50" -> substrTrimOracleSql(50)
  ) ++ dsirAndHtmlOracles

  /** The ExactSubstr oracle chain parameterized by the gram/min-repeat
    * length L — ONE template for both declared operating points (L=8,
    * the sub-doc boilerplate scale; L=50, the Lee et al. 2022 default)
    * so the knob cannot drift between them. Mirrors
    * [[graft.ops.Dedup.exactSubstrSpans]] stage for stage.
    */
  private def substrSpansOracleSql(l: Int): String = {
    val g = l - 1
    s"""WITH corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 2000
        |  UNION ALL
        |  SELECT doc_id + 100000, text || ' zz9 zz9' FROM documents WHERE doc_id < 2000),
        |base AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS toks
        |  FROM corpus),
        |pos AS (
        |  SELECT doc_id, i, array_to_string(list_slice(toks, i, i + $g), ' ') AS gram
        |  FROM base, unnest(generate_series(1, len(toks) - $g)) AS u(i)
        |  WHERE len(toks) >= $l),
        |gs AS (
        |  SELECT doc_id, i, count(*) OVER (PARTITION BY gram) AS total FROM pos),
        |dup AS (SELECT doc_id, i FROM gs WHERE total >= 2),
        |m AS (
        |  SELECT doc_id, i,
        |         max(i + $g) OVER (PARTITION BY doc_id ORDER BY i
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        |  FROM dup),
        |segd AS (
        |  SELECT doc_id, i,
        |         sum(CASE WHEN prev_end IS NULL OR i > prev_end + 1 THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY doc_id ORDER BY i) AS sid
        |  FROM m),
        |spans AS (SELECT doc_id, sid, min(i) AS s, max(i) + $g AS e
        |          FROM segd GROUP BY 1, 2),
        |st AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
        |         CAST(sum(e - s + 1) AS BIGINT) AS covered_tokens,
        |         CAST(max(e - s + 1) AS BIGINT) AS longest_span
        |  FROM spans GROUP BY 1)
        |SELECT b.doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        |       coalesce(n_spans, 0) AS n_spans,
        |       coalesce(covered_tokens, 0) AS covered_tokens,
        |       coalesce(longest_span, 0) AS longest_span,
        |       round(coalesce(covered_tokens, 0)
        |             / CAST(greatest(len(toks), 1) AS DOUBLE), 4) AS covered_frac
        |FROM base b LEFT JOIN st USING (doc_id) ORDER BY doc_id""".stripMargin
  }

  private def substrTrimOracleSql(l: Int): String = {
    val g = l - 1
    s"""WITH corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 2000
        |  UNION ALL
        |  SELECT doc_id + 100000, text || ' zz9 zz9' FROM documents WHERE doc_id < 2000),
        |base AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS toks
        |  FROM corpus),
        |pos AS (
        |  SELECT doc_id, i, array_to_string(list_slice(toks, i, i + $g), ' ') AS gram,
        |         doc_id * 1048576 + i AS pk
        |  FROM base, unnest(generate_series(1, len(toks) - $g)) AS u(i)
        |  WHERE len(toks) >= $l),
        |gs AS (
        |  SELECT doc_id, i, pk,
        |         count(*) OVER (PARTITION BY gram) AS total,
        |         min(pk) OVER (PARTITION BY gram) AS first_pk
        |  FROM pos),
        |dup AS (SELECT doc_id, i FROM gs WHERE total >= 2 AND pk <> first_pk),
        |m AS (
        |  SELECT doc_id, i,
        |         max(i + $g) OVER (PARTITION BY doc_id ORDER BY i
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        |  FROM dup),
        |segd AS (
        |  SELECT doc_id, i,
        |         sum(CASE WHEN prev_end IS NULL OR i > prev_end + 1 THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY doc_id ORDER BY i) AS sid
        |  FROM m),
        |spans AS (SELECT doc_id, sid, min(i) AS s, max(i) + $g AS e
        |          FROM segd GROUP BY 1, 2),
        |tok AS (
        |  SELECT doc_id, j, toks[j] AS tok
        |  FROM base, unnest(generate_series(1, len(toks))) AS u(j)),
        |cut AS (
        |  SELECT DISTINCT t.doc_id, t.j
        |  FROM tok t JOIN spans sp
        |    ON sp.doc_id = t.doc_id AND t.j BETWEEN sp.s AND sp.e),
        |keptagg AS (
        |  SELECT t.doc_id,
        |         CAST(count(CASE WHEN c.j IS NULL THEN 1 END) AS BIGINT) AS n_kept,
        |         coalesce(string_agg(CASE WHEN c.j IS NULL THEN t.tok END,
        |                             ' ' ORDER BY t.j), '') AS kept_text
        |  FROM tok t LEFT JOIN cut c ON c.doc_id = t.doc_id AND c.j = t.j
        |  GROUP BY t.doc_id)
        |SELECT b.doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        |       coalesce(n_kept, 0) AS n_kept,
        |       coalesce(kept_text, '') AS kept_text
        |FROM base b LEFT JOIN keptagg USING (doc_id) ORDER BY doc_id""".stripMargin
  }

  /** The remainder of the batch 18-21+ oracle inventory (split behind
    * the same `map` — the ExactSubstr templates above needed defs, and
    * a Scala Map literal cannot interleave them). A `def`, not a val:
    * `map` concatenates it during object init, before a later-declared
    * val would be assigned (the dsirDocCte rule).
    */
  private def dsirAndHtmlOracles: Map[String, String] = Map(
    "q_sparse_cosine" ->
      """WITH tf AS (
        |  SELECT doc_id, tok AS token, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id,
        |               unnest(list_filter(string_split(text, ' '), t -> t != '')) AS tok
        |        FROM documents)
        |  GROUP BY 1, 2),
        |df AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |nd AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM documents),
        |wt AS (
        |  SELECT doc_id, token, tf * ln(n / df) AS w
        |  FROM tf JOIN df USING (token), nd
        |  WHERE df <= n * 0.85),
        |nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM wt GROUP BY 1),
        |unitv AS (
        |  SELECT wt.doc_id, token, w / nrm AS wn
        |  FROM wt JOIN nrm USING (doc_id)),
        |scored AS (
        |  SELECT q.doc_id AS q_id, c.doc_id AS c_id,
        |         CAST(count(*) AS BIGINT) AS n_common,
        |         round(sum(q.wn * c.wn), 4) AS cos_r
        |  FROM unitv q JOIN unitv c USING (token)
        |  WHERE q.doc_id < 20 AND c.doc_id <> q.doc_id
        |  GROUP BY 1, 2)
        |SELECT q_id, c_id, n_common, cos_r, rnk FROM (
        |  SELECT q_id, c_id, n_common, cos_r,
        |         CAST(row_number() OVER (PARTITION BY q_id
        |                                 ORDER BY cos_r DESC, c_id) AS BIGINT) AS rnk
        |  FROM scored)
        |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,

    "q_kn_bigram" ->
      """WITH dt AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS toks
        |  FROM documents),
        |pos AS (
        |  SELECT doc_id, toks[i] AS prev, toks[i + 1] AS next
        |  FROM dt, unnest(generate_series(1, len(toks) - 1)) AS u(i)
        |  WHERE len(toks) >= 2),
        |db AS (SELECT doc_id, prev, next, count(*) AS c FROM pos GROUP BY 1, 2, 3),
        |lk AS (SELECT prev, next, CAST(sum(c) AS BIGINT) AS bc FROM db GROUP BY 1, 2),
        |lk2 AS (SELECT prev, next, bc,
        |        CAST(sum(bc) OVER (PARTITION BY prev) AS BIGINT) AS cc,
        |        CAST(count(*) OVER (PARTITION BY prev) AS BIGINT) AS n1p
        |        FROM lk),
        |cont AS (SELECT next, CAST(count(*) AS BIGINT) AS ncont FROM lk GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS ttypes FROM lk)
        |SELECT db.doc_id, CAST(sum(db.c) AS BIGINT) AS n_bigrams,
        |       round(sum(db.c * ln(greatest(bc - 0.75, 0) / cc
        |             + (0.75 * n1p / cc) * (ncont / CAST(ttypes AS DOUBLE))))
        |             / sum(db.c), 4) AS kn_logprob
        |FROM db JOIN lk2 USING (prev, next) JOIN cont USING (next), tot
        |GROUP BY db.doc_id ORDER BY db.doc_id""".stripMargin,

    "q_l_diversity" ->
      """WITH g AS (
        |  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        |         count(*) AS n_rows,
        |         count(DISTINCT user_id) AS n_subjects,
        |         count(DISTINCT CAST(floor(value / 100) AS BIGINT)) AS n_sensitive,
        |         round(sum(value), 4) AS sum_v
        |  FROM events WHERE user_id IS NOT NULL
        |  GROUP BY 1, 2)
        |SELECT event_type, day, n_rows, n_subjects, n_sensitive,
        |       CASE WHEN n_subjects >= 50 AND n_sensitive >= 3
        |            THEN sum_v END AS sum_v_released,
        |       CAST(CASE WHEN n_subjects >= 50 AND n_sensitive >= 3
        |            THEN 0 ELSE 1 END AS BIGINT) AS suppressed
        |FROM g ORDER BY event_type, day""".stripMargin,

    // SQ8 shortlist in the QUANTIZED domain: both sides become
    // round(x/scale) int8 codes from the same per-vector max-abs
    // scale the Spark index stores; scales cancel out of the cosine,
    // so the shortlist score is the pure integer-code cosine (every
    // dot term |c| <= 127^2, the sum is an exact integer in a double,
    // so the 6dp rank boundary is engine-independent)
    "q_sim_sq" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |sq AS (
        |  SELECT vec_id, v,
        |         CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0 THEN 1.0
        |              ELSE list_max(list_transform(v, x -> abs(x))) / 127 END AS scale
        |  FROM e),
        |cd AS (
        |  SELECT vec_id, v,
        |         list_transform(v, x -> round(x / scale)) AS codes
        |  FROM sq),
        |n AS (
        |  SELECT vec_id, v, codes,
        |         sqrt(list_dot_product(v, v)) AS nrm,
        |         sqrt(list_dot_product(codes, codes)) AS cn
        |  FROM cd),
        |adc AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        |         round(list_dot_product(q.codes, c.codes) / (q.cn * c.cn), 6) AS adc_r
        |  FROM n q, n c WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
        |short AS (
        |  SELECT q_id, c_id FROM (
        |    SELECT q_id, c_id,
        |           row_number() OVER (PARTITION BY q_id
        |                              ORDER BY adc_r DESC, c_id) AS srnk
        |    FROM adc) WHERE srnk <= 20),
        |re AS (
        |  SELECT s.q_id, s.c_id,
        |         round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 4) AS cos_r
        |  FROM short s JOIN n q ON q.vec_id = s.q_id JOIN n c ON c.vec_id = s.c_id)
        |SELECT q_id, c_id, cos_r, rnk FROM (
        |  SELECT q_id, c_id, cos_r,
        |         CAST(row_number() OVER (PARTITION BY q_id
        |                                 ORDER BY cos_r DESC, c_id) AS BIGINT) AS rnk
        |  FROM re) WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,

    // derivation oracle: the Spark side ENCODES 16x16 PPMs, DECODES,
    // resizes to 8x8 and thresholds luma; the oracle restates the
    // bijective bit pattern ((i*31 + seed) % 64 < 32) from doc_id
    "q_media_phash" ->
      """WITH hx AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 9 = 0 THEN NULL
        |              ELSE array_to_string(list_transform(generate_series(0, 63),
        |                     i -> CASE WHEN (i * 31 + (doc_id % 5) * 13) % 64 < 32
        |                               THEN '1' ELSE '0' END), '')
        |         END AS ahash
        |  FROM documents)
        |SELECT doc_id AS media_id,
        |       CAST(CASE WHEN doc_id % 9 = 0 THEN 0 ELSE 1 END AS BIGINT) AS decoded,
        |       ahash,
        |       CAST(CASE WHEN doc_id % 9 = 0 THEN 0
        |            ELSE count(*) OVER (PARTITION BY ahash) END AS BIGINT) AS group_n,
        |       CAST(CASE WHEN doc_id % 9 = 0 THEN 0
        |            WHEN doc_id = min(doc_id) OVER (PARTITION BY ahash) THEN 1
        |            ELSE 0 END AS BIGINT) AS keep
        |FROM hx ORDER BY media_id""".stripMargin,

    // ---- batch 20 ----

    "q_bm25" ->
      """WITH tf AS (
        |  SELECT doc_id, tok AS token, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id,
        |               unnest(list_filter(string_split(text, ' '), t -> t != '')) AS tok
        |        FROM documents)
        |  GROUP BY 1, 2),
        |df AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
        |st AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl),
        |q AS (SELECT doc_id AS q_id, token FROM tf WHERE doc_id < 20),
        |scored AS (
        |  SELECT q.q_id, tf.doc_id AS c_id,
        |         CAST(count(*) AS BIGINT) AS n_common,
        |         round(sum(ln(1.0 + (n - df + 0.5) / (df + 0.5))
        |               * (tf.tf * (1.2 + 1.0)
        |                  / (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl.dl / avgdl)))), 4)
        |           AS bm25_r
        |  FROM tf JOIN dl USING (doc_id) JOIN df USING (token)
        |       JOIN q USING (token), st
        |  WHERE q.q_id <> tf.doc_id
        |  GROUP BY 1, 2)
        |SELECT q_id, c_id, n_common, bm25_r, rnk FROM (
        |  SELECT q_id, c_id, n_common, bm25_r,
        |         CAST(row_number() OVER (PARTITION BY q_id
        |                                 ORDER BY bm25_r DESC, c_id) AS BIGINT) AS rnk
        |  FROM scored)
        |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,

    "q_rrf" ->
      """WITH tf AS (
        |  SELECT doc_id, tok AS token, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id,
        |               unnest(list_filter(string_split(text, ' '), t -> t != '')) AS tok
        |        FROM documents)
        |  GROUP BY 1, 2),
        |df AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |nd AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM documents),
        |wt AS (
        |  SELECT doc_id, token, tf * ln(n / df) AS w
        |  FROM tf JOIN df USING (token), nd
        |  WHERE df <= n * 0.85),
        |nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM wt GROUP BY 1),
        |unitv AS (
        |  SELECT wt.doc_id, token, w / nrm AS wn
        |  FROM wt JOIN nrm USING (doc_id)),
        |s1 AS (
        |  SELECT q.doc_id AS q_id, c.doc_id AS c_id,
        |         round(sum(q.wn * c.wn), 4) AS s
        |  FROM unitv q JOIN unitv c USING (token)
        |  WHERE q.doc_id < 10 AND c.doc_id <> q.doc_id
        |  GROUP BY 1, 2),
        |r1 AS (
        |  SELECT q_id, c_id, rnk FROM (
        |    SELECT q_id, c_id,
        |           row_number() OVER (PARTITION BY q_id ORDER BY s DESC, c_id) AS rnk
        |    FROM s1) WHERE rnk <= 20),
        |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
        |st AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl),
        |q2 AS (SELECT doc_id AS q_id, token FROM tf WHERE doc_id < 10),
        |s2 AS (
        |  SELECT q2.q_id, tf.doc_id AS c_id,
        |         round(sum(ln(1.0 + (st.n - df + 0.5) / (df + 0.5))
        |               * (tf.tf * (1.2 + 1.0)
        |                  / (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl.dl / avgdl)))), 4)
        |           AS s
        |  FROM tf JOIN dl USING (doc_id) JOIN df USING (token)
        |       JOIN q2 USING (token), st
        |  WHERE q2.q_id <> tf.doc_id
        |  GROUP BY 1, 2),
        |r2 AS (
        |  SELECT q_id, c_id, rnk FROM (
        |    SELECT q_id, c_id,
        |           row_number() OVER (PARTITION BY q_id ORDER BY s DESC, c_id) AS rnk
        |    FROM s2) WHERE rnk <= 20),
        |u AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2),
        |f AS (
        |  SELECT q_id, c_id, CAST(count(*) AS BIGINT) AS n_lists,
        |         round(sum(1.0 / (60.0 + rnk)), 6) AS rrf_r
        |  FROM u GROUP BY 1, 2)
        |SELECT q_id, c_id, n_lists, rrf_r, fused_rnk FROM (
        |  SELECT q_id, c_id, n_lists, rrf_r,
        |         CAST(row_number() OVER (PARTITION BY q_id
        |                                 ORDER BY rrf_r DESC, c_id) AS BIGINT)
        |           AS fused_rnk
        |  FROM f)
        |WHERE fused_rnk <= 5 ORDER BY q_id, fused_rnk""".stripMargin,

    // the salted plan's contract: result set IDENTICAL to the plain
    // unsalted join — so the oracle IS the plain join
    "q_salted_join" ->
      """WITH dim AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_t,
        |         round(sum(value), 4) AS sum_v_r
        |  FROM events GROUP BY 1)
        |SELECT e.event_id, e.event_type, d.n_t, d.sum_v_r
        |FROM events e JOIN dim d USING (event_type)
        |ORDER BY e.event_id""".stripMargin,

    "q_maxsim" ->
      """WITH t AS (
        |  SELECT vec_id // 4 AS did, vec_id AS tid,
        |         CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |n AS (SELECT did, tid, v, sqrt(list_dot_product(v, v)) AS nrm FROM t),
        |pt AS (
        |  SELECT q.did AS q_doc, c.did AS c_doc, q.tid AS q_idx,
        |         max(round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6)) AS best
        |  FROM n q JOIN n c ON q.did < 5 AND c.did >= 5
        |  GROUP BY 1, 2, 3),
        |sc AS (
        |  SELECT q_doc, c_doc, round(sum(best), 4) AS maxsim_r
        |  FROM pt GROUP BY 1, 2)
        |SELECT q_doc, c_doc, maxsim_r, rnk FROM (
        |  SELECT q_doc, c_doc, maxsim_r,
        |         CAST(row_number() OVER (PARTITION BY q_doc
        |                                 ORDER BY maxsim_r DESC, c_doc) AS BIGINT) AS rnk
        |  FROM sc)
        |WHERE rnk <= 5 ORDER BY q_doc, rnk""".stripMargin,

    // derivation oracle: hashes restated from doc_id (base pattern +
    // odd-id single-bit flip), then the SAME band-bucket candidate
    // join and bit-level hamming verify DuckDB-side
    "q_media_phash_band" ->
      """WITH hx AS (
        |  SELECT doc_id,
        |         array_to_string(list_transform(generate_series(0, 63), i ->
        |           CASE WHEN (xor(i * 144115188075855881,
        |                          (doc_id % 64) * 2654435761) % 97 < 48)
        |                     != (doc_id % 2 = 1 AND i = (doc_id // 64) % 64)
        |                THEN '1' ELSE '0' END), '') AS ahash
        |  FROM documents WHERE doc_id % 9 != 0 AND doc_id < 2000),
        |bx AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 3), bi ->
        |           list_sum(list_transform(generate_series(0, 15), j ->
        |             CASE WHEN substr(ahash, bi * 16 + j + 1, 1) = '1'
        |                  THEN 1 << (15 - j) ELSE 0 END))) AS bints
        |  FROM hx),
        |banded AS (
        |  SELECT doc_id, bints, bi, bints[bi] AS bv
        |  FROM bx, unnest(generate_series(1, 4)) AS u(bi)),
        |cand AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b, x.bints AS ba, y.bints AS bb,
        |         CAST(count(*) AS BIGINT) AS n_bands
        |  FROM banded x JOIN banded y
        |    ON x.bi = y.bi AND x.bv = y.bv AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2, 3, 4),
        |ham AS (
        |  SELECT a, b, n_bands,
        |         CAST(list_sum(list_transform(generate_series(1, 4), i ->
        |           bit_count(xor(CAST(ba[i] AS BIGINT), CAST(bb[i] AS BIGINT)))))
        |           AS BIGINT) AS hamming
        |  FROM cand)
        |SELECT a, b, n_bands, hamming FROM ham
        |WHERE hamming <= 2 ORDER BY a, b""".stripMargin,

    // the media tier's nightly form: both sides' 64-bit aHashes derived
    // arithmetically from doc_id (standing = the q_media_phash_band
    // corpus; batch = exact copies +1M, one-extra-bit near-dups +2M,
    // fresh out-of-base-space +3M, corrupt where orig % 9 = 5), then
    // the union dedup restated from first principles restricted to
    // batch ids — a hash match proves increment ≡ union cross-engine
    "q_media_dedup_incremental" ->
      """WITH sx AS (
        |  SELECT doc_id AS media_id,
        |         array_to_string(list_transform(generate_series(0, 63), i ->
        |           CASE WHEN (xor(i * 144115188075855881,
        |                          (doc_id % 64) * 2654435761) % 97 < 48)
        |                     != (doc_id % 2 = 1 AND i = (doc_id // 64) % 64)
        |                THEN '1' ELSE '0' END), '') AS ahash
        |  FROM documents WHERE doc_id % 9 != 0 AND doc_id < 2000),
        |bh AS (
        |  SELECT doc_id + 1000000 * (doc_id % 4) AS media_id,
        |         array_to_string(list_transform(generate_series(0, 63), i ->
        |           CASE WHEN (CASE WHEN doc_id % 4 = 3
        |             THEN (xor(i * 144115188075855881,
        |                       (doc_id % 64 + 64) * 2654435761) % 97 < 48)
        |             ELSE ((xor(i * 144115188075855881,
        |                        (doc_id % 64) * 2654435761) % 97 < 48)
        |                   != (doc_id % 2 = 1 AND i = (doc_id // 64) % 64))
        |                  != (doc_id % 4 = 2 AND i = (doc_id * 7) % 64)
        |             END)
        |           THEN '1' ELSE '0' END), '') AS ahash
        |  FROM documents
        |  WHERE doc_id < 2000 AND doc_id % 4 != 0 AND doc_id % 9 != 5),
        |sb AS (
        |  SELECT media_id,
        |         list_transform(generate_series(0, 3), bi ->
        |           list_sum(list_transform(generate_series(0, 15), j ->
        |             CASE WHEN substr(ahash, bi * 16 + j + 1, 1) = '1'
        |                  THEN 1 << (15 - j) ELSE 0 END))) AS bints
        |  FROM sx),
        |bb AS (
        |  SELECT media_id,
        |         list_transform(generate_series(0, 3), bi ->
        |           list_sum(list_transform(generate_series(0, 15), j ->
        |             CASE WHEN substr(ahash, bi * 16 + j + 1, 1) = '1'
        |                  THEN 1 << (15 - j) ELSE 0 END))) AS bints
        |  FROM bh),
        |sband AS (
        |  SELECT media_id, bints, bi, bints[bi] AS bv
        |  FROM sb, unnest(generate_series(1, 4)) AS u(bi)),
        |bband AS (
        |  SELECT media_id, bints, bi, bints[bi] AS bv
        |  FROM bb, unnest(generate_series(1, 4)) AS u(bi)),
        |scand AS (
        |  SELECT y.media_id AS m, x.media_id AS s_id,
        |         y.bints AS ba, x.bints AS b2
        |  FROM bband y JOIN sband x ON y.bi = x.bi AND y.bv = x.bv
        |  GROUP BY 1, 2, 3, 4),
        |sdup AS (
        |  SELECT m AS media_id,
        |         CAST(count(DISTINCT s_id) AS BIGINT) AS n_standing_dups
        |  FROM scand
        |  WHERE list_sum(list_transform(generate_series(1, 4), i ->
        |          bit_count(xor(CAST(ba[i] AS BIGINT),
        |                        CAST(b2[i] AS BIGINT))))) <= 2
        |  GROUP BY m),
        |bpair AS (
        |  SELECT y.media_id AS m, x.media_id AS e,
        |         y.bints AS ba, x.bints AS b2
        |  FROM bband x JOIN bband y
        |    ON x.bi = y.bi AND x.bv = y.bv AND x.media_id < y.media_id
        |  GROUP BY 1, 2, 3, 4),
        |bdup AS (
        |  SELECT DISTINCT m AS media_id FROM bpair
        |  WHERE list_sum(list_transform(generate_series(1, 4), i ->
        |          bit_count(xor(CAST(ba[i] AS BIGINT),
        |                        CAST(b2[i] AS BIGINT))))) <= 2),
        |allb AS (
        |  SELECT doc_id + 1000000 * (doc_id % 4) AS media_id,
        |         CASE WHEN doc_id % 9 != 5 THEN 1 ELSE 0 END AS decoded
        |  FROM documents WHERE doc_id < 2000 AND doc_id % 4 != 0)
        |SELECT a.media_id,
        |       CAST(a.decoded AS BIGINT) AS decoded,
        |       CAST(coalesce(s.n_standing_dups, 0) AS BIGINT) AS n_standing_dups,
        |       CAST(CASE WHEN d.media_id IS NOT NULL THEN 1 ELSE 0 END
        |            AS BIGINT) AS dup_in_batch,
        |       CAST(CASE WHEN a.decoded = 1 AND s.media_id IS NULL
        |                  AND d.media_id IS NULL
        |            THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM allb a
        |LEFT JOIN sdup s USING (media_id)
        |LEFT JOIN bdup d USING (media_id)
        |ORDER BY a.media_id""".stripMargin,

    // ---- batch 21 ----

    "q_dedup_lines_trim" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text || ' zz9 zz9' FROM documents),
        |ln AS (
        |  SELECT doc_id, li,
        |         list_filter(string_split(lines[li], ' '), t -> t != '') AS toks
        |  FROM (SELECT doc_id, string_split(text, chr(10)) AS lines FROM corpus),
        |       unnest(generate_series(1, len(lines))) AS u(li)),
        |seg AS (
        |  SELECT doc_id, li, si,
        |         array_to_string(list_slice(toks, si * 8 + 1, si * 8 + 8), ' ') AS seg
        |  FROM ln, unnest(generate_series(0, (len(toks) - 1) // 8)) AS v(si)
        |  WHERE len(toks) >= 1),
        |keyed AS (
        |  SELECT doc_id, seg,
        |         doc_id * 1000000 + (li - 1) * 1000 + si AS k
        |  FROM seg),
        |firsts AS (
        |  SELECT doc_id, seg, k, min(k) OVER (PARTITION BY seg) AS first_k
        |  FROM keyed),
        |kept AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |         string_agg(seg, ' ' ORDER BY k) AS kept_text
        |  FROM firsts WHERE k = first_k GROUP BY doc_id)
        |SELECT c.doc_id,
        |       coalesce(k.n_kept, 0) AS n_kept,
        |       coalesce(k.kept_text, '') AS kept_text
        |FROM corpus c LEFT JOIN kept k USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // estimate side = the q_dedup_minhash_est machinery; exact side =
    // the q_dedup_ngram inverted-index join WITH its df>1000 skew cap
    // (mirrors the operator); collision-only candidates get true J = 0
    "q_minhash_error" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 2000
        |  UNION ALL
        |  SELECT doc_id + 100000, text || ' zz9 zz9' FROM documents
        |  WHERE doc_id < 2000),
        |tok AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS toks
        |  FROM corpus),
        |shx AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, greatest(len(toks) - 2, 1)),
        |    i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2])))) AS shingle
        |  FROM tok),
        |hx AS (
        |  SELECT doc_id,
        |         ('0x' || substr(md5(shingle), 1, 8))::BIGINT % 2147483647 AS h
        |  FROM shx),
        |mh AS (
        |  SELECT doc_id, seeds.seed,
        |         min(((37 + 101 * seeds.seed) * h + 13 + 97 * seeds.seed) % 2147483647) AS mh
        |  FROM hx, (SELECT unnest(generate_series(0, 15)) AS seed) seeds
        |  GROUP BY doc_id, seeds.seed),
        |bands AS (
        |  SELECT doc_id, seed // 4 AS band_id,
        |         string_agg(CAST(mh AS VARCHAR), ',' ORDER BY seed) AS sig
        |  FROM mh GROUP BY doc_id, seed // 4),
        |cands AS (
        |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        |  FROM bands x JOIN bands y
        |    ON x.band_id = y.band_id AND x.sig = y.sig AND x.doc_id < y.doc_id),
        |est AS (
        |  SELECT c.a, c.b,
        |         round(CAST(sum(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END) AS DOUBLE) / 16, 4)
        |           AS j_est
        |  FROM cands c
        |  JOIN mh ma ON ma.doc_id = c.a
        |  JOIN mh mb ON mb.doc_id = c.b AND mb.seed = ma.seed
        |  GROUP BY c.a, c.b),
        |hot AS (
        |  SELECT h FROM (SELECT h, count(*) AS df FROM hx GROUP BY h)
        |  WHERE df > 1000),
        |rare AS (SELECT * FROM hx WHERE h NOT IN (SELECT h FROM hot)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM hx GROUP BY doc_id),
        |common AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
        |  FROM rare x JOIN rare y ON x.h = y.h AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2),
        |exact AS (
        |  SELECT c.a, c.b, round(c.c / (sa.sz + sb.sz - c.c), 4) AS jt
        |  FROM common c
        |  JOIN sizes sa ON sa.doc_id = c.a
        |  JOIN sizes sb ON sb.doc_id = c.b),
        |joined AS (
        |  SELECT e.j_est, coalesce(x.jt, 0) AS jt
        |  FROM est e LEFT JOIN exact x USING (a, b))
        |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |       round(avg(j_est), 4) AS mean_est,
        |       round(avg(jt), 4) AS mean_true,
        |       round(avg(abs(j_est - jt)), 4) AS mae,
        |       round(max(abs(j_est - jt)), 4) AS max_abs_err
        |FROM joined""".stripMargin,

    // derivation oracle: frame count / truncation / frame-order mean
    // luma / shot boundaries restated arithmetically from doc_id (the
    // alternating-gray construction makes every consecutive-frame luma
    // step exactly delta, far from the 64 threshold)
    "q_video_decode" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         3 + doc_id % 4 AS nf,
        |         doc_id % 120 AS base,
        |         30 + (doc_id % 10) * 10 AS delta,
        |         CASE WHEN doc_id % 8 = 0 THEN 1 ELSE 0 END AS trunc
        |  FROM documents),
        |m AS (SELECT doc_id, base, delta, trunc, nf - trunc AS mf FROM d),
        |lum AS (
        |  SELECT doc_id, mf, trunc, delta,
        |         list_transform(generate_series(0, mf - 1), f ->
        |           0.299 * (base + (f % 2) * delta)
        |             + 0.587 * (base + (f % 2) * delta)
        |             + 0.114 * (base + (f % 2) * delta)) AS ls
        |  FROM m)
        |SELECT doc_id AS media_id,
        |       CAST(mf AS BIGINT) AS n_frames,
        |       CAST(trunc AS BIGINT) AS truncated,
        |       round(list_sum(ls) / mf, 4) AS mean_luma_r,
        |       CAST(CASE WHEN delta > 64 THEN mf - 1 ELSE 0 END AS BIGINT) AS n_scenes
        |FROM lum ORDER BY media_id""".stripMargin,

    // derivation oracle: alternating speech/silence blocks aligned to
    // the VAD window — every odd window is silent, every even window
    // is one isolated speech segment of 0.05 s
    "q_audio_vad" ->
      """WITH d AS (
        |  SELECT doc_id, 4 + doc_id % 5 AS nb,
        |         CASE WHEN doc_id % 6 = 0 THEN 0 ELSE 1 END AS dec
        |  FROM documents)
        |SELECT doc_id AS media_id,
        |       CAST(dec AS BIGINT) AS decoded,
        |       CAST(CASE WHEN dec = 0 THEN 0 ELSE nb END AS BIGINT) AS n_windows,
        |       CAST(CASE WHEN dec = 0 THEN 0 ELSE (nb + 1) // 2 END AS BIGINT)
        |         AS n_speech,
        |       CAST(CASE WHEN dec = 0 THEN 0 ELSE (nb + 1) // 2 END AS BIGINT)
        |         AS n_segments,
        |       CASE WHEN dec = 0 THEN NULL
        |            ELSE round(((nb + 1) // 2) * 0.05, 4) END AS speech_sec_r
        |FROM d ORDER BY media_id""".stripMargin,

    // components = base groups exactly (every same-base pair is a
    // hamming ≤ 2 edge; the XOR-mixed patterns exclude cross-base
    // edges), so the transitive keeper is the group min over decoded ids
    "q_media_dedup_cc" ->
      """SELECT doc_id AS media_id,
        |       min(doc_id) OVER (PARTITION BY doc_id % 64) AS keep_id
        |FROM documents
        |WHERE doc_id % 9 != 0 AND doc_id < 2000
        |ORDER BY media_id""".stripMargin,

    "q_rfm" ->
      """WITH pu AS (
        |  SELECT user_id,
        |         CAST(floor((1705708800000000 - max(epoch_us(ts))) / 86400000000.0)
        |              AS BIGINT) AS recency_days,
        |         count(*) AS frequency,
        |         round(sum(value), 4) AS monetary_r
        |  FROM events
        |  WHERE user_id IS NOT NULL AND epoch_us(ts) <= 1705708800000000
        |  GROUP BY user_id)
        |SELECT user_id, recency_days, frequency, monetary_r,
        |       CAST(ntile(5) OVER (ORDER BY recency_days, user_id) AS BIGINT)
        |         AS r_band,
        |       CAST(ntile(5) OVER (ORDER BY frequency DESC, user_id) AS BIGINT)
        |         AS f_band,
        |       CAST(ntile(5) OVER (ORDER BY monetary_r DESC, user_id) AS BIGINT)
        |         AS m_band,
        |       concat_ws('-',
        |         ntile(5) OVER (ORDER BY recency_days, user_id),
        |         ntile(5) OVER (ORDER BY frequency DESC, user_id),
        |         ntile(5) OVER (ORDER BY monetary_r DESC, user_id)) AS segment
        |FROM pu ORDER BY user_id""".stripMargin,

    // bit-band LSH has 100% recall at hamming <= k (pigeonhole over
    // k+1 bands), so the oracle can state the TRUE hamming-<=2
    // neighborhood directly from an all-pairs popcount — band
    // bucketing is an execution strategy, not a semantic
    "q_dedup_simhash_band" ->
      """WITH tok AS (
        |  SELECT DISTINCT doc_id,
        |         unnest(list_filter(string_split(text, ' '), t -> t != '')) AS token
        |  FROM documents WHERE doc_id < 1000),
        |hx AS (
        |  SELECT doc_id, ('0x' || substr(md5(token), 1, 8))::BIGINT AS h FROM tok),
        |bits AS (
        |  SELECT doc_id, b.b,
        |         CASE WHEN sum(2 * ((h >> b.b) & 1) - 1) > 0
        |              THEN CAST(1 AS BIGINT) << b.b ELSE 0 END AS bit
        |  FROM hx, (SELECT unnest(generate_series(0, 31)) AS b) b
        |  GROUP BY doc_id, b.b),
        |fp AS (SELECT doc_id, CAST(sum(bit) AS BIGINT) AS fp FROM bits GROUP BY doc_id),
        |pairs AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b
        |  FROM fp x JOIN fp y ON x.doc_id < y.doc_id
        |  WHERE bit_count(xor(x.fp, y.fp)) <= 2),
        |nbrs AS (
        |  SELECT doc_id, count(*) AS n_near, min(nbr) AS min_nbr FROM (
        |    SELECT a AS doc_id, b AS nbr FROM pairs
        |    UNION ALL SELECT b, a FROM pairs)
        |  GROUP BY doc_id)
        |SELECT f.doc_id, f.fp,
        |       CAST(coalesce(n.n_near, 0) AS BIGINT) AS n_near,
        |       least(f.doc_id, coalesce(n.min_nbr, f.doc_id)) AS keep_id
        |FROM fp f LEFT JOIN nbrs n ON n.doc_id = f.doc_id
        |ORDER BY f.doc_id""".stripMargin,

    // the EXACT brute-force top-k (same text as q_sim_cosine_topk's
    // oracle): the HNSW query saturates its segment graphs at verify
    // scale (efSearch ≥ segment size), so matching this oracle IS the
    // proof that graph build + scatter-gather merge lose nothing
    "q_sim_hnsw" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (
        |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |pairs AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        |         round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 4) AS cos_r
        |  FROM n q, n c
        |  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
        |ranked AS (
        |  SELECT q_id, c_id, cos_r,
        |         CAST(row_number() OVER (PARTITION BY q_id
        |                                 ORDER BY cos_r DESC, c_id) AS BIGINT) AS rnk
        |  FROM pairs)
        |SELECT q_id, c_id, cos_r, rnk FROM ranked
        |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,

    // The Spark side pushes each row's fields through a constructed
    // XML payload and back out via xpath_*/from_xml; the oracle
    // recomputes the same answers from the raw table through DuckDB's
    // JSON parser — same data, two parsers. first-match = the props
    // `k` value when present else the derived param; last-match and
    // the typed from_xml extraction are always the derived param;
    // n_params counts the conditionally-present elements.
    "q_xpath_extract" ->
      """SELECT event_id,
        |       COALESCE(json_extract_string(props, '$.k'),
        |                CAST(event_id % 3 AS VARCHAR)) AS k_first,
        |       event_id % 3 AS k_last,
        |       CAST(2
        |            + CASE WHEN json_extract_string(props, '$.k') IS NULL
        |                   THEN 0 ELSE 1 END
        |            - CASE WHEN user_id IS NULL THEN 1 ELSE 0 END
        |         AS BIGINT) AS n_params,
        |       event_id % 3 AS k_last_typed
        |FROM events ORDER BY event_id""".stripMargin,

    // ---- batch 25: mergeable sketches (HLL / CMS / Bloom / HDR) ----
    // every register, counter, bit, and bucket restated from first
    // principles: md5-prefix hashes, integer binary log via
    // length(bin(x)), doubles forced with CAST(... AS DOUBLE) so no
    // DuckDB DECIMAL arithmetic sneaks in

    "q_sketch_hll" ->
      """WITH dk AS (
        |  SELECT DISTINCT event_type AS g, CAST(user_id AS VARCHAR) AS k
        |  FROM events WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
        |hx AS (
        |  SELECT g,
        |         ('0x' || substr(md5(k), 1, 8))::BIGINT % 64 AS idx,
        |         ('0x' || substr(md5(k), 9, 8))::BIGINT AS w2
        |  FROM dk),
        |regs AS (
        |  SELECT g, idx,
        |         max(CASE WHEN w2 = 0 THEN 33 ELSE 33 - length(bin(w2)) END) AS mj,
        |         CAST(count(*) AS BIGINT) AS nk
        |  FROM hx GROUP BY 1, 2),
        |est AS (
        |  SELECT g, CAST(sum(nk) AS BIGINT) AS n_exact,
        |         CAST(0.709 AS DOUBLE) * 64 * 64
        |           / ((CAST(64 AS DOUBLE) - count(*))
        |              + sum(power(CAST(2 AS DOUBLE), -mj))) AS e,
        |         CAST(64 AS DOUBLE) - count(*) AS v
        |  FROM regs GROUP BY 1),
        |fin AS (
        |  SELECT g, n_exact,
        |         round(CASE WHEN e <= 160 AND v > 0
        |                    THEN CAST(64 AS DOUBLE) * ln(CAST(64 AS DOUBLE) / v)
        |                    ELSE e END, 4) AS hll_est_r
        |  FROM est)
        |SELECT g AS event_type, n_exact, hll_est_r,
        |       round(abs(hll_est_r - n_exact) / n_exact, 4) AS rel_err_r
        |FROM fin ORDER BY event_type""".stripMargin,

    "q_sketch_cms" ->
      """WITH tc AS (
        |  SELECT CAST(user_id AS VARCHAR) AS k, CAST(count(*) AS BIGINT) AS cnt
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |hx AS (
        |  SELECT k, cnt, u.j,
        |         ('0x' || substr(md5(CAST(u.j AS VARCHAR) || '|' || k), 1, 8))::BIGINT % 64 AS b
        |  FROM tc, (SELECT unnest(generate_series(0, 3)) AS j) u),
        |counters AS (SELECT j, b, CAST(sum(cnt) AS BIGINT) AS c FROM hx GROUP BY 1, 2),
        |est AS (
        |  SELECT k, max(cnt) AS cnt, min(c) AS cms_est
        |  FROM hx JOIN counters USING (j, b) GROUP BY 1),
        |top AS (
        |  SELECT *, CAST(row_number() OVER (ORDER BY cms_est DESC, k) AS BIGINT) AS rnk
        |  FROM est)
        |SELECT k AS user_id, cnt, cms_est, cms_est - cnt AS overshoot, rnk
        |FROM top WHERE rnk <= 20 ORDER BY rnk""".stripMargin,

    "q_bloom_dedup" ->
      """WITH ev AS (
        |  SELECT event_id, epoch_us(ts) AS ts_us,
        |         CAST(user_id AS VARCHAR) || '|' || coalesce(event_type, '') AS bk
        |  FROM events WHERE user_id IS NOT NULL),
        |hist AS (SELECT DISTINCT bk FROM ev WHERE ts_us < 1705276800000000),
        |bits AS (
        |  SELECT DISTINCT
        |         ('0x' || substr(md5(CAST(u.i AS VARCHAR) || '|' || bk), 1, 8))::BIGINT % 98914 AS pos
        |  FROM hist, (SELECT unnest(generate_series(0, 2)) AS i) u),
        |batch AS (SELECT event_id, bk FROM ev WHERE ts_us >= 1705276800000000),
        |bpos AS (
        |  SELECT event_id, bk,
        |         ('0x' || substr(md5(CAST(u.i AS VARCHAR) || '|' || bk), 1, 8))::BIGINT % 98914 AS pos
        |  FROM batch, (SELECT unnest(generate_series(0, 2)) AS i) u),
        |mb AS (
        |  SELECT event_id, bk, count(h.hit) = 3 AS maybe_seen
        |  FROM bpos LEFT JOIN (SELECT pos, 1 AS hit FROM bits) h USING (pos)
        |  GROUP BY 1, 2),
        |fin AS (
        |  SELECT m.event_id, m.maybe_seen, coalesce(hk.seen, false) AS actually_seen
        |  FROM mb m LEFT JOIN (SELECT bk, true AS seen FROM hist) hk USING (bk))
        |SELECT event_id, maybe_seen, actually_seen,
        |       maybe_seen AND NOT actually_seen AS is_fp
        |FROM fin ORDER BY event_id""".stripMargin,

    "q_sketch_overlap" ->
      """WITH dk AS (
        |  SELECT DISTINCT event_type AS g, CAST(user_id AS VARCHAR) AS k
        |  FROM events WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
        |hx AS (
        |  SELECT g, k,
        |         ('0x' || substr(md5(k), 1, 8))::BIGINT % 64 AS idx,
        |         CASE WHEN ('0x' || substr(md5(k), 9, 8))::BIGINT = 0 THEN 33
        |              ELSE 33 - length(bin(('0x' || substr(md5(k), 9, 8))::BIGINT))
        |         END AS rho
        |  FROM dk),
        |sregs AS (SELECT g, idx, max(rho) AS mj FROM hx GROUP BY 1, 2),
        |sest0 AS (
        |  SELECT g,
        |         CAST(0.709 AS DOUBLE) * 64 * 64
        |           / ((CAST(64 AS DOUBLE) - count(*))
        |              + sum(power(CAST(2 AS DOUBLE), -mj))) AS e,
        |         CAST(64 AS DOUBLE) - count(*) AS v
        |  FROM sregs GROUP BY 1),
        |sest AS (
        |  SELECT g, CASE WHEN e <= 160 AND v > 0
        |                 THEN CAST(64 AS DOUBLE) * ln(CAST(64 AS DOUBLE) / v)
        |                 ELSE e END AS est
        |  FROM sest0),
        |gs AS (SELECT DISTINCT g FROM dk),
        |pr AS (SELECT a.g AS ga, b.g AS gb FROM gs a JOIN gs b ON a.g < b.g),
        |tg AS (
        |  SELECT pr.ga, pr.gb, hx.idx, hx.rho
        |  FROM pr JOIN hx ON hx.g = pr.ga OR hx.g = pr.gb),
        |pregs AS (SELECT ga, gb, idx, max(rho) AS mj FROM tg GROUP BY 1, 2, 3),
        |pest0 AS (
        |  SELECT ga, gb,
        |         CAST(0.709 AS DOUBLE) * 64 * 64
        |           / ((CAST(64 AS DOUBLE) - count(*))
        |              + sum(power(CAST(2 AS DOUBLE), -mj))) AS e,
        |         CAST(64 AS DOUBLE) - count(*) AS v
        |  FROM pregs GROUP BY 1, 2),
        |pest AS (
        |  SELECT ga, gb, CASE WHEN e <= 160 AND v > 0
        |                      THEN CAST(64 AS DOUBLE) * ln(CAST(64 AS DOUBLE) / v)
        |                      ELSE e END AS est_ab
        |  FROM pest0),
        |ex AS (
        |  SELECT x.g AS ga, y.g AS gb, CAST(count(*) AS BIGINT) AS n
        |  FROM dk x JOIN dk y ON x.k = y.k AND x.g < y.g GROUP BY 1, 2)
        |SELECT pr.ga AS type_a, pr.gb AS type_b,
        |       coalesce(ex.n, 0) AS n_exact_overlap,
        |       round(sa.est + sb.est - pest.est_ab, 4) AS hll_overlap_r
        |FROM pr
        |JOIN sest sa ON sa.g = pr.ga
        |JOIN sest sb ON sb.g = pr.gb
        |JOIN pest USING (ga, gb)
        |LEFT JOIN ex USING (ga, gb)
        |ORDER BY type_a, type_b""".stripMargin,

    "q_sketch_quantile" ->
      """WITH b0 AS (
        |  SELECT event_type AS g, CAST(floor(value * 100) AS BIGINT) AS vc
        |  FROM events
        |  WHERE event_type IS NOT NULL AND value IS NOT NULL AND value >= 0),
        |b1 AS (
        |  SELECT g, vc, CAST(length(bin(vc)) AS BIGINT) AS blen,
        |         CASE WHEN vc >= 16
        |              THEN vc >> CAST(length(bin(vc)) - 4 AS INT) ELSE 0 END AS mant
        |  FROM b0),
        |b2 AS (
        |  SELECT g,
        |         CASE WHEN vc < 16 THEN vc ELSE blen * 8 + (mant - 8) END AS bucket,
        |         CASE WHEN vc < 16 THEN CAST(vc AS DOUBLE) / 100
        |              ELSE (CAST(mant << CAST(blen - 4 AS INT) AS DOUBLE)
        |                    + CAST((mant + 1) << CAST(blen - 4 AS INT) AS DOUBLE))
        |                   / 2 / 100 END AS rep
        |  FROM b1),
        |bk AS (SELECT g, bucket, CAST(count(*) AS BIGINT) AS c, max(rep) AS rep
        |       FROM b2 GROUP BY 1, 2),
        |cm AS (
        |  SELECT g, rep, cum, n FROM (
        |    SELECT g, bucket, rep, c,
        |           sum(c) OVER (PARTITION BY g ORDER BY bucket
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |           sum(c) OVER (PARTITION BY g) AS n
        |    FROM bk))
        |SELECT g AS event_type, CAST(max(n) AS BIGINT) AS n,
        |       round(min(CASE WHEN cum >= ceil(CAST(0.5 AS DOUBLE) * n) THEN rep END), 4) AS p50_est_r,
        |       round(min(CASE WHEN cum >= ceil(CAST(0.9 AS DOUBLE) * n) THEN rep END), 4) AS p90_est_r,
        |       round(min(CASE WHEN cum >= ceil(CAST(0.99 AS DOUBLE) * n) THEN rep END), 4) AS p99_est_r
        |FROM cm GROUP BY g ORDER BY event_type""".stripMargin,

    // register-only HLL: same register math as q_sketch_hll but folded
    // from RAW rows (no DISTINCT — max(rho) is duplicate-insensitive),
    // output is the honest sketch estimate alone
    "q_sketch_hll_raw" ->
      """WITH hx AS (
        |  SELECT event_type AS g,
        |         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 64 AS idx,
        |         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 9, 8))::BIGINT AS w2
        |  FROM events WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
        |regs AS (
        |  SELECT g, idx,
        |         max(CASE WHEN w2 = 0 THEN 33 ELSE 33 - length(bin(w2)) END) AS mj
        |  FROM hx GROUP BY 1, 2),
        |est AS (
        |  SELECT g,
        |         CAST(0.709 AS DOUBLE) * 64 * 64
        |           / ((CAST(64 AS DOUBLE) - count(*))
        |              + sum(power(CAST(2 AS DOUBLE), -mj))) AS e,
        |         CAST(64 AS DOUBLE) - count(*) AS v
        |  FROM regs GROUP BY 1)
        |SELECT g AS event_type,
        |       round(CASE WHEN e <= 160 AND v > 0
        |                  THEN CAST(64 AS DOUBLE) * ln(CAST(64 AS DOUBLE) / v)
        |                  ELSE e END, 4) AS hll_est_r
        |FROM est ORDER BY event_type""".stripMargin,

    // DP count release: deterministic seeded Laplace noise restated
    // from the same md5 seed — u strictly inside (-0.5, 0.5) via the
    // +0.5 offset, so ln(1-2|u|) is always finite
    "q_dp_counts" ->
      """WITH g AS (
        |  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        |         CAST(count(*) AS BIGINT) AS n_true
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |n AS (
        |  SELECT event_type, day, n_true,
        |         (CAST(('0x' || substr(md5('dp|' || event_type || '|' || day), 1, 8))::BIGINT AS DOUBLE)
        |            + CAST(0.5 AS DOUBLE)) / CAST(4294967296 AS DOUBLE)
        |           - CAST(0.5 AS DOUBLE) AS u
        |  FROM g)
        |SELECT event_type, day, n_true,
        |       round(n_true
        |             - (CASE WHEN u >= 0 THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END)
        |               * ln(CAST(1 AS DOUBLE) - 2 * abs(u)), 4) AS dp_n_r
        |FROM n ORDER BY event_type, day""".stripMargin,

    // Theta/KMV set algebra: bottom-64 distinct hashes per group
    // restated, pairwise union/intersect/difference estimates below
    // the common theta, exact set sizes as audit. Every arithmetic
    // step CAST to DOUBLE (the DuckDB DECIMAL-literal trap).
    "q_sketch_theta" ->
      """WITH dk AS (
        |  SELECT DISTINCT event_type AS g, CAST(user_id AS VARCHAR) AS k
        |  FROM events WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
        |hx AS (
        |  SELECT DISTINCT g, ('0x' || substr(md5(k), 1, 8))::BIGINT AS h FROM dk),
        |skr AS (
        |  SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rnk FROM hx),
        |skk AS (SELECT g, h FROM skr WHERE rnk <= 64),
        |meta AS (
        |  SELECT g,
        |         CASE WHEN count(*) < 64 THEN CAST(4294967296 AS DOUBLE)
        |              ELSE CAST(max(h) AS DOUBLE) END AS th
        |  FROM skk GROUP BY 1),
        |pairs AS (
        |  SELECT a.g AS ga, b.g AS gb, least(a.th, b.th) AS thp
        |  FROM meta a, meta b WHERE a.g < b.g),
        |ra AS (
        |  SELECT p.ga, p.gb, CAST(count(*) AS BIGINT) AS na2
        |  FROM pairs p JOIN skk s ON s.g = p.ga AND CAST(s.h AS DOUBLE) < p.thp
        |  GROUP BY 1, 2),
        |rb AS (
        |  SELECT p.ga, p.gb, CAST(count(*) AS BIGINT) AS nb2
        |  FROM pairs p JOIN skk s ON s.g = p.gb AND CAST(s.h AS DOUBLE) < p.thp
        |  GROUP BY 1, 2),
        |ri AS (
        |  SELECT p.ga, p.gb, CAST(count(*) AS BIGINT) AS n_i
        |  FROM pairs p
        |  JOIN skk sa ON sa.g = p.ga AND CAST(sa.h AS DOUBLE) < p.thp
        |  JOIN skk sb ON sb.g = p.gb AND sb.h = sa.h
        |  GROUP BY 1, 2),
        |ex AS (
        |  SELECT a.g AS ga, b.g AS gb, CAST(count(*) AS BIGINT) AS n_ex_i
        |  FROM dk a JOIN dk b ON a.k = b.k AND a.g < b.g
        |  GROUP BY 1, 2),
        |sz AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM dk GROUP BY 1)
        |SELECT p.ga AS type_a, p.gb AS type_b,
        |       CAST(sza.n + szb.n - coalesce(ex.n_ex_i, 0) AS BIGINT) AS n_exact_union,
        |       CAST(coalesce(ex.n_ex_i, 0) AS BIGINT) AS n_exact_inter,
        |       round(CAST(coalesce(ra.na2, 0) + coalesce(rb.nb2, 0)
        |                  - coalesce(ri.n_i, 0) AS DOUBLE)
        |             * CAST(4294967296 AS DOUBLE) / p.thp, 4) AS union_est_r,
        |       round(CAST(coalesce(ri.n_i, 0) AS DOUBLE)
        |             * CAST(4294967296 AS DOUBLE) / p.thp, 4) AS inter_est_r,
        |       round(CAST(coalesce(ra.na2, 0) - coalesce(ri.n_i, 0) AS DOUBLE)
        |             * CAST(4294967296 AS DOUBLE) / p.thp, 4) AS diff_ab_est_r
        |FROM pairs p
        |JOIN sz sza ON sza.g = p.ga
        |JOIN sz szb ON szb.g = p.gb
        |LEFT JOIN ex ON ex.ga = p.ga AND ex.gb = p.gb
        |LEFT JOIN ra ON ra.ga = p.ga AND ra.gb = p.gb
        |LEFT JOIN rb ON rb.ga = p.ga AND rb.gb = p.gb
        |LEFT JOIN ri ON ri.ga = p.ga AND ri.gb = p.gb
        |ORDER BY type_a, type_b""".stripMargin,

    // production theta form: the same sketch chain with the exact
    // audit CTEs (ex, sz) dropped — the oracle restates only the
    // bottom-k-derived estimates, like the engine
    "q_sketch_theta_raw" ->
      """WITH dk AS (
        |  SELECT DISTINCT event_type AS g, CAST(user_id AS VARCHAR) AS k
        |  FROM events WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
        |hx AS (
        |  SELECT DISTINCT g, ('0x' || substr(md5(k), 1, 8))::BIGINT AS h FROM dk),
        |skr AS (
        |  SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rnk FROM hx),
        |skk AS (SELECT g, h FROM skr WHERE rnk <= 64),
        |meta AS (
        |  SELECT g,
        |         CASE WHEN count(*) < 64 THEN CAST(4294967296 AS DOUBLE)
        |              ELSE CAST(max(h) AS DOUBLE) END AS th
        |  FROM skk GROUP BY 1),
        |pairs AS (
        |  SELECT a.g AS ga, b.g AS gb, least(a.th, b.th) AS thp
        |  FROM meta a, meta b WHERE a.g < b.g),
        |ra AS (
        |  SELECT p.ga, p.gb, CAST(count(*) AS BIGINT) AS na2
        |  FROM pairs p JOIN skk s ON s.g = p.ga AND CAST(s.h AS DOUBLE) < p.thp
        |  GROUP BY 1, 2),
        |rb AS (
        |  SELECT p.ga, p.gb, CAST(count(*) AS BIGINT) AS nb2
        |  FROM pairs p JOIN skk s ON s.g = p.gb AND CAST(s.h AS DOUBLE) < p.thp
        |  GROUP BY 1, 2),
        |ri AS (
        |  SELECT p.ga, p.gb, CAST(count(*) AS BIGINT) AS n_i
        |  FROM pairs p
        |  JOIN skk sa ON sa.g = p.ga AND CAST(sa.h AS DOUBLE) < p.thp
        |  JOIN skk sb ON sb.g = p.gb AND sb.h = sa.h
        |  GROUP BY 1, 2)
        |SELECT p.ga AS type_a, p.gb AS type_b,
        |       CAST(p.thp AS BIGINT) AS theta_common,
        |       CAST(coalesce(ra.na2, 0) AS BIGINT) AS n_retained_a,
        |       CAST(coalesce(rb.nb2, 0) AS BIGINT) AS n_retained_b,
        |       round(CAST(coalesce(ra.na2, 0) + coalesce(rb.nb2, 0)
        |                  - coalesce(ri.n_i, 0) AS DOUBLE)
        |             * CAST(4294967296 AS DOUBLE) / p.thp, 4) AS union_est_r,
        |       round(CAST(coalesce(ri.n_i, 0) AS DOUBLE)
        |             * CAST(4294967296 AS DOUBLE) / p.thp, 4) AS inter_est_r,
        |       round(CAST(coalesce(ra.na2, 0) - coalesce(ri.n_i, 0) AS DOUBLE)
        |             * CAST(4294967296 AS DOUBLE) / p.thp, 4) AS diff_ab_est_r
        |FROM pairs p
        |LEFT JOIN ra ON ra.ga = p.ga AND ra.gb = p.gb
        |LEFT JOIN rb ON rb.ga = p.ga AND rb.gb = p.gb
        |LEFT JOIN ri ON ri.ga = p.ga AND ri.gb = p.gb
        |ORDER BY type_a, type_b""".stripMargin,

    // group-level MinHash: 16-perm signatures restated, Jaccard
    // estimate = fraction of equal components, exact Jaccard audit
    "q_minhash_union" ->
      """WITH dk AS (
        |  SELECT DISTINCT event_type AS g, CAST(user_id AS VARCHAR) AS k
        |  FROM events WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
        |sig AS (
        |  SELECT g, u.p,
        |         min(('0x' || substr(md5(CAST(u.p AS VARCHAR) || '|' || k), 1, 8))::BIGINT) AS mh
        |  FROM dk, (SELECT unnest(generate_series(0, 15)) AS p) u
        |  GROUP BY 1, 2),
        |est AS (
        |  SELECT a.g AS ga, b.g AS gb,
        |         CAST(sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS BIGINT) AS n_eq,
        |         round(avg(CASE WHEN a.mh = b.mh THEN CAST(1 AS DOUBLE)
        |                        ELSE CAST(0 AS DOUBLE) END), 4) AS jac_est_r
        |  FROM sig a JOIN sig b ON a.p = b.p AND a.g < b.g
        |  GROUP BY 1, 2),
        |sz AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM dk GROUP BY 1),
        |ex AS (
        |  SELECT x.g AS ga, y.g AS gb, CAST(count(*) AS BIGINT) AS n_inter
        |  FROM dk x JOIN dk y ON x.k = y.k AND x.g < y.g GROUP BY 1, 2)
        |SELECT est.ga AS type_a, est.gb AS type_b, est.n_eq, est.jac_est_r,
        |       round(CAST(coalesce(ex.n_inter, 0) AS DOUBLE)
        |             / (sa.n + sb.n - coalesce(ex.n_inter, 0)), 4) AS jac_exact_r
        |FROM est
        |JOIN sz sa ON sa.g = est.ga
        |JOIN sz sb ON sb.g = est.gb
        |LEFT JOIN ex ON ex.ga = est.ga AND ex.gb = est.gb
        |ORDER BY type_a, type_b""".stripMargin,

    // JL random projection: the ±1 sign matrix restated from the same
    // md5 parity, per-vector components and norms re-derived
    "q_random_projection" ->
      """WITH s AS (
        |  SELECT i.i, j.j,
        |         CASE WHEN ('0x' || substr(md5('rp|' || i.i || '|' || j.j), 1, 1))::BIGINT % 2 = 0
        |              THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END AS sg
        |  FROM (SELECT unnest(generate_series(0, 15)) AS i) i,
        |       (SELECT unnest(generate_series(0, 63)) AS j) j),
        |e AS (
        |  SELECT vec_id, j.j, CAST(embedding[j.j + 1] AS DOUBLE) AS x
        |  FROM embeddings, (SELECT unnest(generate_series(0, 63)) AS j) j),
        |p AS (
        |  SELECT e.vec_id, s.i, sum(e.x * s.sg) / CAST(4 AS DOUBLE) AS pv
        |  FROM e JOIN s ON e.j = s.j
        |  GROUP BY 1, 2),
        |comp AS (
        |  SELECT vec_id,
        |         round(max(CASE WHEN i = 0 THEN pv END), 4) AS p0_r,
        |         round(max(CASE WHEN i = 1 THEN pv END), 4) AS p1_r,
        |         round(max(CASE WHEN i = 2 THEN pv END), 4) AS p2_r,
        |         round(max(CASE WHEN i = 3 THEN pv END), 4) AS p3_r,
        |         sqrt(sum(pv * pv)) AS pn
        |  FROM p GROUP BY 1),
        |onorm AS (SELECT vec_id, sqrt(sum(x * x)) AS onr FROM e GROUP BY 1)
        |SELECT c.vec_id, p0_r, p1_r, p2_r, p3_r,
        |       round(c.pn, 4) AS pnorm_r, round(o.onr, 4) AS onorm_r,
        |       round(c.pn / o.onr, 4) AS ratio_r
        |FROM comp c JOIN onorm o USING (vec_id)
        |ORDER BY vec_id""".stripMargin,

    // DP sum release: clamp to [0, 100] bounds the sensitivity; same
    // seeded inverse-CDF noise as q_dp_counts with b = clampHi/epsilon
    "q_dp_sum" ->
      """WITH g AS (
        |  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        |         round(sum(least(greatest(CAST(value AS DOUBLE), CAST(0 AS DOUBLE)),
        |                         CAST(100 AS DOUBLE))), 4) AS sum_clamped_r
        |  FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
        |  GROUP BY 1, 2),
        |n AS (
        |  SELECT event_type, day, sum_clamped_r,
        |         (CAST(('0x' || substr(md5('dps|' || event_type || '|' || day), 1, 8))::BIGINT AS DOUBLE)
        |            + CAST(0.5 AS DOUBLE)) / CAST(4294967296 AS DOUBLE)
        |           - CAST(0.5 AS DOUBLE) AS u
        |  FROM g)
        |SELECT event_type, day, sum_clamped_r,
        |       round(sum_clamped_r
        |             - (CASE WHEN u >= 0 THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END)
        |               * CAST(100 AS DOUBLE) * ln(CAST(1 AS DOUBLE) - 2 * abs(u)), 4) AS dp_sum_r
        |FROM n ORDER BY event_type, day""".stripMargin,

    // HDR merge: the merged-bucket answer is restated as DIRECT global
    // bucketing — bit-identical because bucketing is group-independent
    "q_sketch_hdr_merge" ->
      """WITH b0 AS (
        |  SELECT CAST(floor(value * 100) AS BIGINT) AS vc
        |  FROM events
        |  WHERE event_type IS NOT NULL AND value IS NOT NULL AND value >= 0),
        |b1 AS (
        |  SELECT vc, CAST(length(bin(vc)) AS BIGINT) AS blen,
        |         CASE WHEN vc >= 16
        |              THEN vc >> CAST(length(bin(vc)) - 4 AS INT) ELSE 0 END AS mant
        |  FROM b0),
        |b2 AS (
        |  SELECT CASE WHEN vc < 16 THEN vc ELSE blen * 8 + (mant - 8) END AS bucket,
        |         CASE WHEN vc < 16 THEN CAST(vc AS DOUBLE) / 100
        |              ELSE (CAST(mant << CAST(blen - 4 AS INT) AS DOUBLE)
        |                    + CAST((mant + 1) << CAST(blen - 4 AS INT) AS DOUBLE))
        |                   / 2 / 100 END AS rep
        |  FROM b1),
        |bk AS (SELECT bucket, CAST(count(*) AS BIGINT) AS c, max(rep) AS rep
        |       FROM b2 GROUP BY 1),
        |cm AS (
        |  SELECT rep, cum, n FROM (
        |    SELECT bucket, rep, c,
        |           sum(c) OVER (ORDER BY bucket
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |           sum(c) OVER () AS n
        |    FROM bk))
        |SELECT CAST(max(n) AS BIGINT) AS n,
        |       round(min(CASE WHEN cum >= ceil(CAST(0.5 AS DOUBLE) * n) THEN rep END), 4) AS p50_est_r,
        |       round(min(CASE WHEN cum >= ceil(CAST(0.9 AS DOUBLE) * n) THEN rep END), 4) AS p90_est_r,
        |       round(min(CASE WHEN cum >= ceil(CAST(0.99 AS DOUBLE) * n) THEN rep END), 4) AS p99_est_r
        |FROM cm""".stripMargin,

    // two-stage RP ANN: projection + projected-cosine shortlist +
    // exact refine, every stage restated; ranks on ROUNDED scores with
    // id tiebreak (repo convention), so both engines rank identically
    "q_sim_rp_ann" ->
      """WITH s AS (
        |  SELECT i.i, j.j,
        |         CASE WHEN ('0x' || substr(md5('rp|' || i.i || '|' || j.j), 1, 1))::BIGINT % 2 = 0
        |              THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END AS sg
        |  FROM (SELECT unnest(generate_series(0, 15)) AS i) i,
        |       (SELECT unnest(generate_series(0, 63)) AS j) j),
        |e AS (
        |  SELECT vec_id, j.j, CAST(embedding[j.j + 1] AS DOUBLE) AS x
        |  FROM embeddings, (SELECT unnest(generate_series(0, 63)) AS j) j),
        |p AS (
        |  SELECT e.vec_id, s.i, sum(e.x * s.sg) / CAST(4 AS DOUBLE) AS pv
        |  FROM e JOIN s ON e.j = s.j
        |  GROUP BY 1, 2),
        |pn AS (SELECT vec_id, sqrt(sum(pv * pv)) AS n FROM p GROUP BY 1),
        |onr AS (SELECT vec_id, sqrt(sum(x * x)) AS n FROM e GROUP BY 1),
        |pc AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        |         round(sum(q.pv * c.pv) / (qn.n * cn.n), 4) AS pcos_r
        |  FROM p q
        |  JOIN p c ON q.i = c.i AND c.vec_id <> q.vec_id
        |  JOIN pn qn ON qn.vec_id = q.vec_id
        |  JOIN pn cn ON cn.vec_id = c.vec_id
        |  WHERE q.vec_id < 10
        |  GROUP BY q.vec_id, c.vec_id, qn.n, cn.n),
        |short AS (
        |  SELECT q_id, c_id, pcos_r FROM (
        |    SELECT q_id, c_id, pcos_r,
        |           row_number() OVER (PARTITION BY q_id
        |                              ORDER BY pcos_r DESC, c_id) AS srnk
        |    FROM pc)
        |  WHERE srnk <= 40),
        |ref AS (
        |  SELECT sh.q_id, sh.c_id, sh.pcos_r,
        |         round(sum(eq.x * ec.x) / (qn.n * cn.n), 4) AS cos_r
        |  FROM short sh
        |  JOIN e eq ON eq.vec_id = sh.q_id
        |  JOIN e ec ON ec.vec_id = sh.c_id AND ec.j = eq.j
        |  JOIN onr qn ON qn.vec_id = sh.q_id
        |  JOIN onr cn ON cn.vec_id = sh.c_id
        |  GROUP BY sh.q_id, sh.c_id, sh.pcos_r, qn.n, cn.n)
        |SELECT q_id, c_id, pcos_r, cos_r, rnk FROM (
        |  SELECT q_id, c_id, pcos_r, cos_r,
        |         CAST(row_number() OVER (PARTITION BY q_id
        |                                 ORDER BY cos_r DESC, c_id) AS BIGINT) AS rnk
        |  FROM ref)
        |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,

    // bucketed co-located join: the LAYOUT differs (bucketed files vs
    // raw parquet), the relational answer must not — per-customer
    // collapse, customer join, nation fold
    "q_bucket_join" ->
      """WITH pc AS (
        |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
        |         sum(o_totalprice) AS tp
        |  FROM orders GROUP BY 1)
        |SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
        |       CAST(sum(n_orders) AS BIGINT) AS n_orders,
        |       CAST(count(*) AS BIGINT) AS n_customers,
        |       round(CAST(sum(tp) AS DOUBLE), 2) AS total_r
        |FROM pc JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY nationkey""".stripMargin,

    // register-only CMS: the 4×64 counter frame from raw increments —
    // integer-exact, restated bucket for bucket
    "q_sketch_cms_raw" ->
      """WITH hx AS (
        |  SELECT u.j,
        |         ('0x' || substr(md5(CAST(u.j AS VARCHAR) || '|' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 64 AS b
        |  FROM events, (SELECT unnest(generate_series(0, 3)) AS j) u
        |  WHERE user_id IS NOT NULL)
        |SELECT j, b, CAST(count(*) AS BIGINT) AS c
        |FROM hx GROUP BY 1, 2 ORDER BY j, b""".stripMargin,

    // DSIR importance weights: hashed uni+bigram log-likelihood ratio
    // of the en-target bucket distribution vs the raw corpus, add-1
    // smoothed over 256 md5 buckets; per-bucket ratio quantized to
    // integer micro-nats BEFORE the per-doc sum (exact long
    // arithmetic — order-independent). Deliberately NOT rounded at the
    // end: logw_r = u6/1e6 is one IEEE division of identical exact
    // integers (bit-identical across engines), while a 4dp round
    // re-opens the boundary (Spark rounds the shortest-decimal repr,
    // DuckDB the exact binary value — a …50-micro sum splits them).
    "q_dsir_weights" ->
      s"""$dsirDocCte
        |SELECT h.doc_id, h.lang, count(*) AS n_grams,
        |       sum(lr.loglr_u6) / 1e6 AS logw_r
        |FROM h JOIN lr USING (bucket)
        |GROUP BY h.doc_id, h.lang
        |ORDER BY doc_id""".stripMargin,

    // the resampling step: top-100 by (weight DESC, doc_id) — logw_r
    // is integer-derived and bit-identical across engines (see the
    // q_dsir_weights note), so the selected SET is engine-independent
    "q_dsir_select" ->
      s"""$dsirDocCte,
        |d AS (
        |  SELECT h.doc_id, h.lang, count(*) AS n_grams,
        |         sum(lr.loglr_u6) / 1e6 AS logw_r
        |  FROM h JOIN lr USING (bucket)
        |  GROUP BY h.doc_id, h.lang)
        |SELECT doc_id, lang, n_grams, logw_r FROM d
        |ORDER BY logw_r DESC, doc_id LIMIT 100""".stripMargin,

    // HTML extraction: the oracle rebuilds the SAME constructed page
    // (shared farm literal interpolated from EntrySupport.htmlLinkFarm)
    // and restates every extraction step — script/style strip, anchor
    // stats, tag strip, entity decode (&amp; LAST), whitespace
    // normalize, integer-compared chrome gate, quarantine on the
    // unbalanced <script> count. link_density is the same unrounded
    // long/long IEEE division as the engine's (see Corpus.htmlExtract).
    "q_html_extract" ->
      s"""WITH page AS (
        |  SELECT doc_id,
        |    '<html><head><title>doc ' || CAST(doc_id AS VARCHAR) ||
        |    '</title><style>p { margin: 0; }</style></head><body>' ||
        |    '<nav><a href="/">home</a> <a href="/about">about</a>' ||
        |    ' <a href="/contact">contact</a></nav>' ||
        |    CASE WHEN doc_id % 13 = 0 THEN '<script>var broken = trackers['
        |         ELSE '<script>track(' || CAST(doc_id AS VARCHAR) ||
        |              ');</script>' END ||
        |    CASE WHEN doc_id % 7 = 3 THEN '${EntrySupport.htmlLinkFarm}'
        |         ELSE '' END ||
        |    '<p>R&amp;D says x &lt; y &amp;&amp; y &gt; 0' ||
        |    ' &quot;q&quot;&nbsp;end</p><p>' || text || '</p></body></html>'
        |      AS html
        |  FROM documents),
        |x AS (
        |  SELECT doc_id, html,
        |         len(regexp_extract_all(html, '<script')) <>
        |         len(regexp_extract_all(html, '</script>')) AS bad
        |  FROM page),
        |s AS (
        |  SELECT doc_id, bad,
        |         regexp_replace(
        |           regexp_replace(html, '(?s)<script[^>]*>.*?</script>',
        |                          ' ', 'g'),
        |           '(?s)<style[^>]*>.*?</style>', ' ', 'g') AS nos
        |  FROM x),
        |a AS (
        |  SELECT doc_id, bad,
        |         regexp_extract_all(nos, '(?s)<a[^>]*>(.*?)</a>', 1) AS anch,
        |         trim(regexp_replace(
        |           replace(replace(replace(replace(replace(
        |             regexp_replace(nos, '<[^>]*>', ' ', 'g'),
        |             '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |             '&nbsp;', ' '), '&amp;', '&'),
        |           '\\s+', ' ', 'g')) AS txt
        |  FROM s),
        |c AS (
        |  SELECT doc_id, bad, txt,
        |         CAST(len(anch) AS BIGINT) AS n_links,
        |         CAST(coalesce(list_sum(list_transform(anch, t -> len(t))), 0)
        |              AS BIGINT) AS link_chars,
        |         CAST(len(txt) AS BIGINT) AS n_chars
        |  FROM a)
        |SELECT doc_id,
        |       CASE WHEN bad THEN 'quarantined'
        |            WHEN link_chars * 100 > n_chars * 30 THEN 'chrome'
        |            ELSE 'ok' END AS status,
        |       CASE WHEN bad THEN NULL ELSE n_links END AS n_links,
        |       CASE WHEN bad THEN NULL ELSE link_chars END AS link_chars,
        |       CASE WHEN bad THEN NULL ELSE n_chars END AS n_chars,
        |       CASE WHEN bad OR n_chars = 0 THEN NULL
        |            ELSE CAST(link_chars AS DOUBLE) / CAST(n_chars AS DOUBLE)
        |       END AS link_density,
        |       CASE WHEN bad THEN NULL WHEN txt = '' THEN 0
        |            ELSE CAST(len(string_split(txt, ' ')) AS BIGINT)
        |       END AS n_toks,
        |       CASE WHEN bad THEN NULL ELSE substr(txt, 1, 50) END AS head_50
        |FROM c ORDER BY doc_id""".stripMargin,

    // the composed crawl front door: one superset page construction,
    // the extraction chain (script/style strip, tag strip, density
    // gate, quarantine) + the metadata chain (robots, canonical) +
    // the canonical-keeper window over gate-survivors
    "q_crawl_pipeline" ->
      s"""WITH page AS (
        |  SELECT doc_id,
        |    '<html><head><title>doc ' || CAST(doc_id AS VARCHAR) ||
        |    '</title>' ||
        |    CASE WHEN doc_id % 5 = 0
        |           THEN '<meta name="robots" content="noindex, nofollow">'
        |         ELSE '' END ||
        |    CASE WHEN doc_id % 3 = 0
        |           THEN '<link rel="canonical" href="https://example.com/c/'
        |                || CAST(doc_id // 9 AS VARCHAR) || '">'
        |         ELSE '' END ||
        |    '<style>p { margin: 0; }</style></head><body>' ||
        |    CASE WHEN doc_id % 13 = 0 THEN '<script>var broken = trackers['
        |         ELSE '<script>track();</script>' END ||
        |    CASE WHEN doc_id % 7 = 3 THEN '${EntrySupport.htmlLinkFarm}'
        |         ELSE '' END ||
        |    '<p>R&amp;D says x &lt; y</p><p>' || text || '</p></body></html>'
        |      AS html
        |  FROM documents),
        |x AS (
        |  SELECT doc_id, html,
        |         len(regexp_extract_all(html, '<script')) <>
        |         len(regexp_extract_all(html, '</script>')) AS bad,
        |         nullif(regexp_extract(html,
        |                  '<link rel="canonical" href="([^"]*)"', 1),
        |                '') AS canonical,
        |         CASE WHEN regexp_extract(html,
        |                '<meta name="robots" content="([^"]*)"', 1)
        |                LIKE '%noindex%' THEN 'drop' ELSE 'index' END AS verdict
        |  FROM page),
        |s AS (
        |  SELECT doc_id, bad, canonical, verdict,
        |         regexp_replace(
        |           regexp_replace(html, '(?s)<script[^>]*>.*?</script>',
        |                          ' ', 'g'),
        |           '(?s)<style[^>]*>.*?</style>', ' ', 'g') AS nos
        |  FROM x),
        |a AS (
        |  SELECT doc_id, bad, canonical, verdict,
        |         regexp_extract_all(nos, '(?s)<a[^>]*>(.*?)</a>', 1) AS anch,
        |         trim(regexp_replace(
        |           replace(replace(replace(replace(replace(
        |             regexp_replace(nos, '<[^>]*>', ' ', 'g'),
        |             '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |             '&nbsp;', ' '), '&amp;', '&'),
        |           '\\s+', ' ', 'g')) AS txt
        |  FROM s),
        |c AS (
        |  SELECT doc_id, bad, canonical, verdict, txt,
        |         CAST(coalesce(list_sum(list_transform(anch, t -> len(t))), 0)
        |              AS BIGINT) AS link_chars,
        |         CAST(len(txt) AS BIGINT) AS n_chars
        |  FROM a),
        |j AS (
        |  SELECT doc_id, canonical, verdict,
        |         CASE WHEN bad THEN 'quarantined'
        |              WHEN link_chars * 100 > n_chars * 30 THEN 'chrome'
        |              ELSE 'ok' END AS status,
        |         CASE WHEN bad THEN NULL WHEN txt = '' THEN 0
        |              ELSE CAST(len(string_split(txt, ' ')) AS BIGINT)
        |         END AS n_toks
        |  FROM c),
        |p AS (
        |  SELECT *, CASE WHEN status = 'ok' AND verdict = 'index'
        |                 THEN 1 ELSE 0 END AS passes
        |  FROM j),
        |r AS (
        |  SELECT doc_id,
        |         CASE WHEN row_number() OVER (PARTITION BY canonical
        |                ORDER BY doc_id) = 1 THEN 1 ELSE 0 END AS is_keeper
        |  FROM p WHERE passes = 1 AND canonical IS NOT NULL)
        |SELECT p.doc_id, p.status, p.verdict,
        |       CAST(CASE WHEN p.passes = 0 THEN 0
        |                 ELSE coalesce(r.is_keeper, 1) END AS BIGINT) AS kept,
        |       p.n_toks
        |FROM p LEFT JOIN r USING (doc_id)
        |ORDER BY p.doc_id""".stripMargin,

    // the end-to-end web-corpus capstone: the q_crawl_pipeline CTEs
    // (page construction + both extraction chains) extended by the
    // corpus build — synthetic-key canonical keeper, exact-text dedup,
    // the Gopher gate (q_corpus_pipeline's exact expressions), and the
    // per-shard packing running sum; per-doc stage verdict restated
    "q_web_corpus" ->
      s"""WITH page AS (
        |  SELECT doc_id,
        |    '<html><head><title>doc ' || CAST(doc_id AS VARCHAR) ||
        |    '</title>' ||
        |    CASE WHEN doc_id % 5 = 0
        |           THEN '<meta name="robots" content="noindex, nofollow">'
        |         ELSE '' END ||
        |    CASE WHEN doc_id % 3 = 0
        |           THEN '<link rel="canonical" href="https://example.com/c/'
        |                || CAST(doc_id // 9 AS VARCHAR) || '">'
        |         ELSE '' END ||
        |    '<style>p { margin: 0; }</style></head><body>' ||
        |    CASE WHEN doc_id % 13 = 0 THEN '<script>var broken = trackers['
        |         ELSE '<script>track();</script>' END ||
        |    CASE WHEN doc_id % 7 = 3 THEN '${EntrySupport.htmlLinkFarm}'
        |         ELSE '' END ||
        |    '<p>R&amp;D says x &lt; y</p><p>' || text || '</p></body></html>'
        |      AS html
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |    '<html><head><title>dup ' || CAST(doc_id AS VARCHAR) ||
        |    '</title></head><body><script>track();</script><p>' ||
        |    'R&amp;D says x &lt; y</p><p>' || text || '</p></body></html>'
        |  FROM documents WHERE doc_id % 50 = 1
        |  UNION ALL
        |  SELECT doc_id + 2000000,
        |    '<html><head><title>dup ' || CAST(doc_id AS VARCHAR) ||
        |    '</title></head><body><script>track();</script><p>' ||
        |    'R&amp;D says x &lt; y</p><p>' || text || '</p></body></html>'
        |  FROM documents WHERE doc_id % 50 = 1
        |  UNION ALL
        |  SELECT doc_id + 3000000,
        |    '<html><head><title>dup ' || CAST(doc_id AS VARCHAR) ||
        |    '</title></head><body><script>track();</script><p>' ||
        |    'low quality</p></body></html>'
        |  FROM documents WHERE doc_id % 50 = 1),
        |x AS (
        |  SELECT doc_id, html,
        |         len(regexp_extract_all(html, '<script')) <>
        |         len(regexp_extract_all(html, '</script>')) AS bad,
        |         nullif(regexp_extract(html,
        |                  '<link rel="canonical" href="([^"]*)"', 1),
        |                '') AS canonical,
        |         CASE WHEN regexp_extract(html,
        |                '<meta name="robots" content="([^"]*)"', 1)
        |                LIKE '%noindex%' THEN 'drop' ELSE 'index' END AS verdict
        |  FROM page),
        |s AS (
        |  SELECT doc_id, bad, canonical, verdict,
        |         regexp_replace(
        |           regexp_replace(html, '(?s)<script[^>]*>.*?</script>',
        |                          ' ', 'g'),
        |           '(?s)<style[^>]*>.*?</style>', ' ', 'g') AS nos
        |  FROM x),
        |a AS (
        |  SELECT doc_id, bad, canonical, verdict,
        |         regexp_extract_all(nos, '(?s)<a[^>]*>(.*?)</a>', 1) AS anch,
        |         trim(regexp_replace(
        |           replace(replace(replace(replace(replace(
        |             regexp_replace(nos, '<[^>]*>', ' ', 'g'),
        |             '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |             '&nbsp;', ' '), '&amp;', '&'),
        |           '\\s+', ' ', 'g')) AS txt
        |  FROM s),
        |c AS (
        |  SELECT doc_id, bad, canonical, verdict, txt,
        |         CAST(coalesce(list_sum(list_transform(anch, t -> len(t))), 0)
        |              AS BIGINT) AS link_chars,
        |         CAST(len(txt) AS BIGINT) AS n_chars
        |  FROM a),
        |j AS (
        |  SELECT doc_id, canonical, verdict,
        |         CASE WHEN bad THEN NULL ELSE txt END AS txt,
        |         CASE WHEN bad THEN 'quarantined'
        |              WHEN link_chars * 100 > n_chars * 30 THEN 'chrome'
        |              ELSE 'ok' END AS status,
        |         CASE WHEN bad THEN NULL WHEN txt = '' THEN 0
        |              ELSE CAST(len(string_split(txt, ' ')) AS BIGINT)
        |         END AS n_toks
        |  FROM c),
        |p AS (
        |  SELECT *, CASE WHEN status = 'ok' AND verdict = 'index'
        |                 THEN 1 ELSE 0 END AS passes
        |  FROM j),
        |r1 AS (
        |  SELECT *, row_number() OVER (PARTITION BY
        |      CASE WHEN passes = 1 AND canonical IS NOT NULL
        |           THEN 'c:' || canonical
        |           ELSE 'd:' || CAST(doc_id AS VARCHAR) END
        |      ORDER BY doc_id) AS rn1
        |  FROM p),
        |a1 AS (SELECT *, (passes = 1 AND rn1 = 1) AS alive1 FROM r1),
        |r2 AS (
        |  SELECT *, row_number() OVER (PARTITION BY
        |      CASE WHEN alive1 THEN 't:' || txt
        |           ELSE 'd:' || CAST(doc_id AS VARCHAR) END
        |      ORDER BY doc_id) AS rn2
        |  FROM a1),
        |a2 AS (SELECT *, (alive1 AND rn2 = 1) AS alive2 FROM r2),
        |gt AS (
        |  SELECT *, list_filter(string_split(txt, ' '), t -> t != '') AS toks
        |  FROM a2),
        |gs AS (
        |  SELECT *, len(toks) AS n_words,
        |         CASE WHEN len(toks) >= 2 THEN
        |           list_transform(generate_series(1, len(toks) - 1),
        |             i -> toks[i] || ' ' || toks[i + 1])
        |         ELSE []::VARCHAR[] END AS bg
        |  FROM gt),
        |g2 AS (
        |  SELECT *, CASE WHEN n_words BETWEEN 10 AND 100000
        |    AND (CASE WHEN n_words > 0
        |          THEN round(CAST(length(array_to_string(toks, '')) AS DOUBLE) / n_words, 4)
        |          ELSE 0.0 END) BETWEEN 2.0 AND 12.0
        |    AND (CASE WHEN len(bg) > 0
        |          THEN round(1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg), 4)
        |          ELSE 0.0 END) < 0.3
        |    THEN 1 ELSE 0 END AS gopher_ok
        |  FROM gs),
        |a3 AS (SELECT *, (alive2 AND gopher_ok = 1) AS alive3 FROM g2),
        |cm AS (
        |  SELECT *, sum(CASE WHEN alive3 THEN n_toks ELSE 0 END) OVER (
        |      PARTITION BY CASE WHEN alive3
        |                        THEN 's:' || CAST(doc_id // 64 AS VARCHAR)
        |                        ELSE 'd:' || CAST(doc_id AS VARCHAR) END
        |      ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM a3)
        |SELECT doc_id,
        |       CASE WHEN status = 'quarantined' THEN 'quarantined'
        |            WHEN status = 'chrome' THEN 'chrome'
        |            WHEN verdict = 'drop' THEN 'noindex'
        |            WHEN rn1 <> 1 THEN 'canonical_dup'
        |            WHEN rn2 <> 1 THEN 'text_dup'
        |            WHEN coalesce(gopher_ok, 0) <> 1 THEN 'low_quality'
        |            ELSE 'kept' END AS stage,
        |       CAST(CASE WHEN alive3 THEN n_toks END AS BIGINT) AS tok_cnt,
        |       CAST(CASE WHEN alive3 THEN doc_id // 64 END AS BIGINT) AS shard,
        |       CAST(CASE WHEN alive3 THEN (cum - n_toks) // 2048 END AS BIGINT)
        |         AS seq_id,
        |       CAST(CASE WHEN alive3 THEN (cum - n_toks) % 2048 END AS BIGINT)
        |         AS offset_in
        |FROM cm ORDER BY doc_id""".stripMargin,

    // incremental web-corpus ingest: the ORACLE is the union capstone
    // restricted to batch ids — a hash match verifies the
    // increment ≡ union-rerun law cross-engine (standing ids all
    // below batch ids, so standing docs win every canonical/text race)
    "q_web_corpus_incremental" -> webCorpusIncOracle(copyMod = 1, freshMod = 2),

    // the store-fed form probes MATERIALIZED indexes; the oracle
    // re-derives them from the standing corpus inside the same
    // union-rerun law, so a hash match additionally proves the
    // parquet round-trip of the two indexes lost nothing
    "q_web_corpus_store" -> webCorpusIncOracle(copyMod = 3, freshMod = 0),

    // the index write-back half of the nightly cycle: the oracle
    // states (from-scratch union indexes) MINUS (from-scratch standing
    // indexes) from first principles — a hash match proves the
    // engine's append deltas ≡ a full rebuild's additions
    "q_web_corpus_index_delta" ->
      webCorpusIndexDeltaOracle(copyMod = 3, freshMod = 0),

    // the bucketed-store twins (round 17): SAME oracle templates on
    // their own mod classes — the physical probe (pre-bucketed
    // sort-merge vs broadcast) must be invisible to the verdicts and
    // deltas, and a hash match proves exactly that cross-engine
    "q_web_corpus_store_bucketed" ->
      webCorpusIncOracle(copyMod = 2, freshMod = 1),
    "q_web_corpus_index_delta_bucketed" ->
      webCorpusIndexDeltaOracle(copyMod = 2, freshMod = 1),

    // the composed cycle (round 17): both halves' laws in one SQL
    // over the shared CTE chain — the verdict subselect is
    // q_web_corpus_store's verbatim, the delta subselect is
    // q_web_corpus_index_delta's verbatim
    "q_nightly_cycle" ->
      webCorpusNightlyCycleOracle(copyMod = 3, freshMod = 0),
    // the bucketed composition: same template on the bucketed twins'
    // mod classes — the probe swap must be invisible to both halves
    "q_nightly_cycle_bucketed" ->
      webCorpusNightlyCycleOracle(copyMod = 2, freshMod = 1),

    // retention / GC of the claims store: the same planted standing
    // corpus split into four daily waves, rank-free claims per day,
    // max-day fold, horizon filter — all restated from first
    // principles over the shared gate chain
    "q_corpus_index_retention" ->
      ("WITH page AS (" + wcStandingPageSql + ")," + webCorpusGateCtes + """,
        |cl AS (
        |  SELECT kind, key, doc_id % 4 + 1 AS day FROM (
        |    SELECT 'canon' AS kind, canonical AS key, doc_id
        |    FROM p WHERE passes = 1 AND canonical IS NOT NULL
        |    UNION ALL
        |    SELECT 'text', md5(txt), doc_id
        |    FROM p WHERE passes = 1))
        |SELECT kind, key, CAST(max(day) AS BIGINT) AS last_day
        |FROM cl GROUP BY kind, key HAVING max(day) >= 3
        |ORDER BY kind, key""".stripMargin),


    // majority-of-signals quality ensemble: four single-division
    // signals, exact interpolated medians, strict median votes
    "q_quality_votes" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         list_filter(string_split(text, ' '), x -> x != '') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |         CAST(len(toks) AS BIGINT) AS n_toks,
        |         CAST(len(list_distinct(toks)) AS DOUBLE)
        |           / CAST(len(toks) AS DOUBLE) AS ttr,
        |         CAST(len(list_filter(toks, x -> x IN ('the', 'a'))) AS DOUBLE)
        |           / CAST(len(toks) AS DOUBLE) AS stop_ratio,
        |         CASE WHEN len(toks) >= 2 THEN
        |           1.0 - CAST(len(list_distinct(list_transform(
        |                   generate_series(1, len(toks) - 1),
        |                   i -> toks[i] || ' ' || toks[i + 1]))) AS DOUBLE)
        |                 / CAST(len(toks) - 1 AS DOUBLE)
        |         ELSE 0.0 END AS dup_frac
        |  FROM t WHERE len(toks) >= 1),
        |m AS (
        |  SELECT quantile_cont(n_toks, 0.5) AS m_len,
        |         quantile_cont(ttr, 0.5) AS m_ttr,
        |         quantile_cont(stop_ratio, 0.5) AS m_stop,
        |         quantile_cont(dup_frac, 0.5) AS m_dup
        |  FROM s)
        |SELECT doc_id, n_toks, ttr, stop_ratio, dup_frac,
        |       CAST(CASE WHEN n_toks > m_len THEN 1 ELSE 0 END
        |          + CASE WHEN ttr > m_ttr THEN 1 ELSE 0 END
        |          + CASE WHEN stop_ratio > m_stop THEN 1 ELSE 0 END
        |          + CASE WHEN dup_frac < m_dup THEN 1 ELSE 0 END AS BIGINT)
        |         AS votes,
        |       CAST(CASE WHEN (CASE WHEN n_toks > m_len THEN 1 ELSE 0 END
        |          + CASE WHEN ttr > m_ttr THEN 1 ELSE 0 END
        |          + CASE WHEN stop_ratio > m_stop THEN 1 ELSE 0 END
        |          + CASE WHEN dup_frac < m_dup THEN 1 ELSE 0 END) >= 3
        |         THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM s, m ORDER BY doc_id""".stripMargin,

    // segment-level language ID + run collapse: 8-token windows, the
    // q_lang_id marker scoring per window, gaps-and-islands collapse;
    // planted multilingual docs mirrored as literals
    "q_lang_segments" ->
      ("""WITH t AS (
        |  SELECT doc_id,
        |         list_filter(string_split(text, ' '), x -> x != '') AS toks
        |  FROM documents""" +
        EntrySupport.langSegPlantedDocs.map { case (id, txt) =>
          s"\n  UNION ALL SELECT $id, list_filter(string_split('$txt', ' '), x -> x != '')"
        }.mkString + """),
        |c0 AS (
        |  SELECT doc_id, toks,
        |         unnest(generate_series(0, CAST((len(toks) - 1) // 8 AS INT))) AS i
        |  FROM t WHERE len(toks) >= 1),
        |c AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS seg_idx,
        |         list_distinct(toks[i * 8 + 1 : i * 8 + 8]) AS dchunk
        |  FROM c0),
        |s AS (
        |  SELECT doc_id, seg_idx,
        |    CAST(len(list_distinct(list_intersect(dchunk, ['the','a','order','key']))) AS BIGINT)
        |      AS score_p_article,
        |    CAST(len(list_distinct(list_intersect(dchunk, ['spark','query','table','row']))) AS BIGINT)
        |      AS score_p_query,
        |    CAST(len(list_distinct(list_intersect(dchunk, ['batch','stream','window','merge']))) AS BIGINT)
        |      AS score_p_stream
        |  FROM c),
        |p AS (
        |  SELECT doc_id, seg_idx,
        |    CASE WHEN score_p_stream >= score_p_query AND score_p_stream >= score_p_article
        |           THEN 'p_stream'
        |         WHEN score_p_query >= score_p_article THEN 'p_query'
        |         ELSE 'p_article' END AS lang
        |  FROM s),
        |r AS (
        |  SELECT *, seg_idx - row_number() OVER (PARTITION BY doc_id, lang
        |                                         ORDER BY seg_idx) AS grp
        |  FROM p)
        |SELECT doc_id, lang,
        |       CAST(min(seg_idx) AS BIGINT) AS seg_start,
        |       CAST(max(seg_idx) AS BIGINT) AS seg_end,
        |       CAST(count(*) AS BIGINT) AS n_chunks
        |FROM r GROUP BY doc_id, lang, grp
        |ORDER BY doc_id, seg_start""").stripMargin,

    // HEAD-metadata gate: same constructed pages, regexp extraction of
    // title / canonical / robots restated, canonical-group sizes via
    // one aggregate — exact integer arithmetic only
    "q_html_meta" ->
      """WITH page AS (
        |  SELECT doc_id,
        |    '<html><head><title>doc ' || CAST(doc_id AS VARCHAR) ||
        |    '</title>' ||
        |    CASE WHEN doc_id % 5 = 0
        |           THEN '<meta name="robots" content="noindex, nofollow">'
        |         WHEN doc_id % 5 = 1
        |           THEN '<meta name="robots" content="index, follow">'
        |         ELSE '' END ||
        |    CASE WHEN doc_id % 3 = 0
        |           THEN '<link rel="canonical" href="https://example.com/c/'
        |                || CAST(doc_id // 9 AS VARCHAR) || '">'
        |         ELSE '' END ||
        |    '</head><body><p>' || text || '</p></body></html>' AS html
        |  FROM documents),
        |x AS (
        |  SELECT doc_id,
        |         nullif(regexp_extract(html, '(?s)<title>(.*?)</title>', 1),
        |                '') AS title,
        |         nullif(regexp_extract(html,
        |                  '<link rel="canonical" href="([^"]*)"', 1),
        |                '') AS canonical,
        |         regexp_extract(html,
        |                  '<meta name="robots" content="([^"]*)"', 1) AS robots
        |  FROM page),
        |f AS (
        |  SELECT doc_id, title, canonical,
        |         CAST(CASE WHEN robots LIKE '%noindex%' THEN 1 ELSE 0 END
        |              AS BIGINT) AS noindex,
        |         CAST(CASE WHEN robots LIKE '%nofollow%' THEN 1 ELSE 0 END
        |              AS BIGINT) AS nofollow
        |  FROM x),
        |g AS (
        |  SELECT canonical, CAST(count(*) AS BIGINT) AS n_same_canonical
        |  FROM f WHERE canonical IS NOT NULL GROUP BY 1)
        |SELECT f.doc_id, f.title, f.canonical, f.noindex, f.nofollow,
        |       CASE WHEN f.noindex = 1 THEN 'drop' ELSE 'index' END AS verdict,
        |       coalesce(g.n_same_canonical, 1) AS n_same_canonical
        |FROM f LEFT JOIN g USING (canonical)
        |ORDER BY f.doc_id""".stripMargin
  )

  /** Shared DSIR CTE chain: tokenize → uni+bigram stream → md5 bucket
    * → target/source histograms → smoothed 6dp log-ratio table.
    * Mirrors [[graft.ops.Text.dsirWeights]] stage for stage. A `def`,
    * not a val: the oracle map above interpolates it during object
    * init, before a later-declared val would be assigned.
    */
  private def dsirDocCte: String =
    """WITH t AS (
      |  SELECT doc_id, lang, lang = 'en' AS tgt,
      |         list_filter(string_split(text, ' '), x -> x != '') AS toks
      |  FROM documents),
      |uni AS (SELECT doc_id, lang, tgt, unnest(toks) AS gram FROM t),
      |bi AS (
      |  SELECT doc_id, lang, tgt, toks[i] || ' ' || toks[i + 1] AS gram
      |  FROM t, unnest(generate_series(1, len(toks) - 1)) AS u(i)
      |  WHERE len(toks) >= 2),
      |h AS (
      |  SELECT doc_id, lang, tgt,
      |         ('0x' || substr(md5(gram), 1, 8))::BIGINT % 256 AS bucket
      |  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
      |tb AS (SELECT bucket, count(*) AS tc FROM h WHERE tgt GROUP BY bucket),
      |sb AS (SELECT bucket, count(*) AS sc FROM h GROUP BY bucket),
      |tot AS (SELECT (SELECT sum(sc) FROM sb) AS s_tot,
      |               (SELECT coalesce(sum(tc), 0) FROM tb) AS t_tot),
      |lr AS (
      |  SELECT sb.bucket,
      |         CAST(round((ln((coalesce(tb.tc, 0) + 1) / (tot.t_tot + 256))
      |                   - ln((sb.sc + 1) / (tot.s_tot + 256))) * 1e6)
      |           AS BIGINT) AS loglr_u6
      |  FROM sb LEFT JOIN tb USING (bucket), tot)""".stripMargin

  /** The union-rerun oracle TEMPLATE behind q_web_corpus_incremental
    * (in-plan standing indexes) and q_web_corpus_store (materialized
    * standing indexes): the full capstone re-run over
    * standing ∪ batch, restricted to batch ids (>= 5M) — a hash match
    * IS the increment ≡ union law verified cross-engine. The two
    * queries differ only in which documents mod-4 classes feed the
    * impersonating-copy and fresh-page batch branches, so ONE template
    * serves both and the planted-page construction cannot drift.
    */
  /** The STANDING planted-page branch (wcStandingPages in SQL) —
    * shared by the increment-family prefix and the retention oracle.
    */
  private lazy val wcStandingPageSql: String =
    s"""
        |  SELECT doc_id,
        |    '<html><head><title>doc ' || CAST(doc_id AS VARCHAR) ||
        |    '</title>' ||
        |    CASE WHEN doc_id % 5 = 0
        |           THEN '<meta name="robots" content="noindex, nofollow">'
        |         ELSE '' END ||
        |    CASE WHEN doc_id % 3 = 0
        |           THEN '<link rel="canonical" href="https://example.com/c/'
        |                || CAST(doc_id // 9 AS VARCHAR) || '">'
        |         ELSE '' END ||
        |    '<style>p { margin: 0; }</style></head><body>' ||
        |    CASE WHEN doc_id % 13 = 0 THEN '<script>var broken = trackers['
        |         ELSE '<script>track();</script>' END ||
        |    CASE WHEN doc_id % 7 = 3 THEN '${EntrySupport.htmlLinkFarm}'
        |         ELSE '' END ||
        |    '<p>R&amp;D says x &lt; y</p><p>' || text || '</p></body></html>'
        |      AS html
        |  FROM documents""".stripMargin

  private def webCorpusIncPrefix(copyMod: Int, freshMod: Int): String =
    "WITH page AS (" + wcStandingPageSql + s"""
        |  UNION ALL
        |  SELECT doc_id + 5000000,
        |    '<html><head><title>doc ' || CAST(doc_id AS VARCHAR) ||
        |    '</title>' ||
        |    CASE WHEN doc_id % 3 = 0
        |           THEN '<link rel="canonical" href="https://example.com/c/'
        |                || CAST(doc_id // 9 AS VARCHAR) || '">'
        |         ELSE '' END ||
        |    '</head><body><script>track();</script>' ||
        |    '<p>R&amp;D says x &lt; y</p><p>' || text || '</p></body></html>'
        |  FROM documents WHERE doc_id % 4 = $copyMod
        |  UNION ALL
        |  SELECT doc_id + 6000000,
        |    '<html><head><title>new ' || CAST(doc_id AS VARCHAR) ||
        |    '</title></head><body><script>track();</script><p>' ||
        |    text || ' fresh9</p></body></html>'
        |  FROM documents WHERE doc_id % 4 = $freshMod
        |  UNION ALL
        |  SELECT 7000000 + u.i,
        |    '<html><head><title>pair</title></head><body>' ||
        |    '<script>track();</script><p>k1 k2 k3 k4 k5 k6 k7 k8 k9 k10 k11 k12' ||
        |    '</p></body></html>'
        |  FROM (SELECT unnest(generate_series(0, 1)) AS i) u),""".stripMargin +
      webCorpusGateCtes

  /** The gate + canonical-race chain (crawlGate → passes → rn1 →
    * alive1) over whatever `page` CTE precedes it — shared by the
    * increment family and the retention oracle.
    */
  private lazy val webCorpusGateCtes: String = s"""
        |x AS (
        |  SELECT doc_id, html,
        |         len(regexp_extract_all(html, '<script')) <>
        |         len(regexp_extract_all(html, '</script>')) AS bad,
        |         nullif(regexp_extract(html,
        |                  '<link rel="canonical" href="([^"]*)"', 1),
        |                '') AS canonical,
        |         CASE WHEN regexp_extract(html,
        |                '<meta name="robots" content="([^"]*)"', 1)
        |                LIKE '%noindex%' THEN 'drop' ELSE 'index' END AS verdict
        |  FROM page),
        |s AS (
        |  SELECT doc_id, bad, canonical, verdict,
        |         regexp_replace(
        |           regexp_replace(html, '(?s)<script[^>]*>.*?</script>',
        |                          ' ', 'g'),
        |           '(?s)<style[^>]*>.*?</style>', ' ', 'g') AS nos
        |  FROM x),
        |a AS (
        |  SELECT doc_id, bad, canonical, verdict,
        |         regexp_extract_all(nos, '(?s)<a[^>]*>(.*?)</a>', 1) AS anch,
        |         trim(regexp_replace(
        |           replace(replace(replace(replace(replace(
        |             regexp_replace(nos, '<[^>]*>', ' ', 'g'),
        |             '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |             '&nbsp;', ' '), '&amp;', '&'),
        |           '\\s+', ' ', 'g')) AS txt
        |  FROM s),
        |c AS (
        |  SELECT doc_id, bad, canonical, verdict, txt,
        |         CAST(coalesce(list_sum(list_transform(anch, t -> len(t))), 0)
        |              AS BIGINT) AS link_chars,
        |         CAST(len(txt) AS BIGINT) AS n_chars
        |  FROM a),
        |j AS (
        |  SELECT doc_id, canonical, verdict,
        |         CASE WHEN bad THEN NULL ELSE txt END AS txt,
        |         CASE WHEN bad THEN 'quarantined'
        |              WHEN link_chars * 100 > n_chars * 30 THEN 'chrome'
        |              ELSE 'ok' END AS status,
        |         CASE WHEN bad THEN NULL WHEN txt = '' THEN 0
        |              ELSE CAST(len(string_split(txt, ' ')) AS BIGINT)
        |         END AS n_toks
        |  FROM c),
        |p AS (
        |  SELECT *, CASE WHEN status = 'ok' AND verdict = 'index'
        |                 THEN 1 ELSE 0 END AS passes
        |  FROM j),
        |r1 AS (
        |  SELECT *, row_number() OVER (PARTITION BY
        |      CASE WHEN passes = 1 AND canonical IS NOT NULL
        |           THEN 'c:' || canonical
        |           ELSE 'd:' || CAST(doc_id AS VARCHAR) END
        |      ORDER BY doc_id) AS rn1
        |  FROM p),
        |a1 AS (SELECT *, (passes = 1 AND rn1 = 1) AS alive1 FROM r1)""".stripMargin

  /** The index WRITE-BACK oracle (q_web_corpus_index_delta):
    * [[webCorpusIncPrefix]] re-runs the union's gate + canonical
    * stage, then states the delta law from first principles — the
    * from-scratch union indexes minus the from-scratch standing
    * indexes (standing = ids < 5M). A hash match proves the engine's
    * append-maintenance deltas reproduce exactly what a full index
    * rebuild over standing ∪ batch would add.
    */
  /** The delta law's SELECT body, shared verbatim by the standalone
    * write-back oracle and the composed nightly-cycle oracle.
    */
  private lazy val webCorpusDeltaSelect: String = """
        |SELECT kind, key FROM (
        |  SELECT 'canon' AS kind, canonical AS key
        |  FROM p WHERE passes = 1 AND canonical IS NOT NULL
        |    AND doc_id >= 5000000
        |    AND canonical NOT IN (
        |      SELECT canonical FROM p
        |      WHERE passes = 1 AND canonical IS NOT NULL
        |        AND doc_id < 5000000)
        |  GROUP BY canonical
        |  UNION ALL
        |  SELECT 'text', md5(txt)
        |  FROM a1 WHERE alive1 AND doc_id >= 5000000
        |    AND md5(txt) NOT IN (
        |      SELECT md5(txt) FROM a1
        |      WHERE alive1 AND doc_id < 5000000)
        |  GROUP BY md5(txt))""".stripMargin

  private def webCorpusIndexDeltaOracle(copyMod: Int, freshMod: Int): String =
    webCorpusIncPrefix(copyMod, freshMod) + webCorpusDeltaSelect + """
        |ORDER BY kind, key""".stripMargin

  /** The union-rerun verdict oracle (q_web_corpus_incremental /
    * q_web_corpus_store): [[webCorpusIncPrefix]] + the text race,
    * Gopher gate, and per-doc stage verdict, restricted to batch ids.
    */
  private def webCorpusIncOracle(copyMod: Int, freshMod: Int): String =
    webCorpusIncPrefix(copyMod, freshMod) + "," + webCorpusStageCtes +
      webCorpusVerdictSelect + """
        |ORDER BY doc_id""".stripMargin

  /** The text race, Gopher gate, and alive3 CTE chain — shared by the
    * verdict oracle and the composed nightly-cycle oracle.
    */
  private lazy val webCorpusStageCtes: String = s"""
        |r2 AS (
        |  SELECT *, row_number() OVER (PARTITION BY
        |      CASE WHEN alive1 THEN 't:' || txt
        |           ELSE 'd:' || CAST(doc_id AS VARCHAR) END
        |      ORDER BY doc_id) AS rn2
        |  FROM a1),
        |a2 AS (SELECT *, (alive1 AND rn2 = 1) AS alive2 FROM r2),
        |gt AS (
        |  SELECT *, list_filter(string_split(txt, ' '), t -> t != '') AS toks
        |  FROM a2),
        |gs AS (
        |  SELECT *, len(toks) AS n_words,
        |         CASE WHEN len(toks) >= 2 THEN
        |           list_transform(generate_series(1, len(toks) - 1),
        |             i -> toks[i] || ' ' || toks[i + 1])
        |         ELSE []::VARCHAR[] END AS bg
        |  FROM gt),
        |g2 AS (
        |  SELECT *, CASE WHEN n_words BETWEEN 10 AND 100000
        |    AND (CASE WHEN n_words > 0
        |          THEN round(CAST(length(array_to_string(toks, '')) AS DOUBLE) / n_words, 4)
        |          ELSE 0.0 END) BETWEEN 2.0 AND 12.0
        |    AND (CASE WHEN len(bg) > 0
        |          THEN round(1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg), 4)
        |          ELSE 0.0 END) < 0.3
        |    THEN 1 ELSE 0 END AS gopher_ok
        |  FROM gs),
        |a3 AS (SELECT *, (alive2 AND gopher_ok = 1) AS alive3 FROM g2)""".stripMargin

  private lazy val webCorpusVerdictSelect: String = """
        |SELECT doc_id,
        |       CASE WHEN status = 'quarantined' THEN 'quarantined'
        |            WHEN status = 'chrome' THEN 'chrome'
        |            WHEN verdict = 'drop' THEN 'noindex'
        |            WHEN rn1 <> 1 THEN 'canonical_dup'
        |            WHEN rn2 <> 1 THEN 'text_dup'
        |            WHEN coalesce(gopher_ok, 0) <> 1 THEN 'low_quality'
        |            ELSE 'kept' END AS stage,
        |       CAST(CASE WHEN alive3 THEN n_toks END AS BIGINT) AS tok_cnt
        |FROM a3 WHERE doc_id >= 5000000""".stripMargin

  /** The composed nightly-cycle oracle (q_nightly_cycle): BOTH halves
    * of the cycle stated from first principles in ONE SQL over the
    * shared CTE chain — the verdict half is [[webCorpusVerdictSelect]]
    * verbatim (so it hash-matches q_web_corpus_store's law) and the
    * delta half is [[webCorpusDeltaSelect]] verbatim (so it
    * hash-matches q_web_corpus_index_delta's). NULL-padding both
    * halves into one (part, doc_id, stage, tok_cnt, kind, key) schema
    * is the only composition the oracle adds.
    */
  private def webCorpusNightlyCycleOracle(copyMod: Int, freshMod: Int): String =
    webCorpusIncPrefix(copyMod, freshMod) + "," + webCorpusStageCtes + """
        |SELECT part, doc_id, stage, tok_cnt, kind, key FROM (
        |  SELECT 'verdict' AS part, doc_id, stage, tok_cnt,
        |         CAST(NULL AS VARCHAR) AS kind, CAST(NULL AS VARCHAR) AS key
        |  FROM (""".stripMargin + webCorpusVerdictSelect + """
        |  )
        |  UNION ALL
        |  SELECT 'delta' AS part, CAST(NULL AS BIGINT) AS doc_id,
        |         CAST(NULL AS VARCHAR) AS stage, CAST(NULL AS BIGINT) AS tok_cnt,
        |         kind, key
        |  FROM (""".stripMargin + webCorpusDeltaSelect + """
        |  ))
        |ORDER BY part, doc_id, kind, key""".stripMargin
}
