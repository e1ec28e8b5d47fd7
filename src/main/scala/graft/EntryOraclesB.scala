package graft

import graft.EntrySupport.ccKeeperCtes

/** DuckDB oracle SQL for the declared queries (batches 7-17) — same tables,
  * same column names, same row order as the Spark bodies in the
  * EntryQueries files; split from SparkEntry behind the same
  * `oracleSql` map.
  */
private[graft] object EntryOraclesB {

  val map: Map[String, String] = Map(
    // ---- batch 7 (round 5) --------------------------------------------------
    "q_bigram_lm" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS toks
        |  FROM documents),
        |bi AS (
        |  SELECT doc_id, toks[i] AS prev, toks[i + 1] AS next
        |  FROM t, unnest(generate_series(1, len(toks) - 1)) AS u(i)
        |  WHERE len(toks) >= 2),
        |bc AS (SELECT prev, next, count(*) AS bc FROM bi GROUP BY prev, next),
        |cc AS (SELECT prev, sum(bc) AS cc FROM bc GROUP BY prev)
        |SELECT bi.doc_id,
        |       count(*) AS n_bigrams,
        |       round(avg(ln(bc.bc / CAST(cc.cc AS DOUBLE))), 4) AS bigram_logprob
        |FROM bi JOIN bc USING (prev, next) JOIN cc USING (prev)
        |GROUP BY bi.doc_id ORDER BY bi.doc_id""".stripMargin,

    "q_bpe_pairs" ->
      """WITH w AS (
        |  SELECT unnest(list_filter(string_split(text, ' '), x -> x != '')) AS word
        |  FROM documents),
        |p AS (
        |  SELECT substr(word, i, 2) AS pair
        |  FROM w, unnest(generate_series(1, length(word) - 1)) AS u(i)
        |  WHERE length(word) >= 2)
        |SELECT pair, count(*) AS cnt FROM p GROUP BY pair
        |ORDER BY cnt DESC, pair LIMIT 30""".stripMargin,

    "q_chunk_docs" ->
      """SELECT doc_id,
        |       CAST((off - 1) // 150 AS BIGINT) AS chunk_id,
        |       CAST(off AS BIGINT) AS off,
        |       CAST(length(substr(text, off, 200)) AS BIGINT) AS chunk_len,
        |       substr(substr(text, off, 200), 1, 16) AS chunk_head
        |FROM documents,
        |     unnest(generate_series(1, greatest(length(text) - 50, 1), 150)) AS u(off)
        |ORDER BY doc_id, chunk_id""".stripMargin,

    "q_domain_cap" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |         list_filter(string_split(text, ' '), x -> x != '') AS toks
        |  FROM documents),
        |q AS (
        |  SELECT doc_id, source,
        |         round(least(len(toks) / 100.0, 1.0) *
        |               (1.0 - len(list_filter(toks, x -> x = 'the' OR x = 'a')) / len(toks)),
        |               4) AS quality
        |  FROM t),
        |r AS (
        |  SELECT doc_id, source, quality,
        |         CAST(row_number() OVER (PARTITION BY source
        |                                 ORDER BY quality DESC, doc_id ASC) AS BIGINT) AS rnk
        |  FROM q)
        |SELECT doc_id, source, quality, rnk FROM r
        |WHERE rnk <= 100 ORDER BY doc_id""".stripMargin,

    "q_attribution" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
        |  FROM events WHERE user_id IS NOT NULL),
        |w AS (
        |  SELECT event_id, user_id, ts_us, event_type,
        |         max(CASE WHEN event_type = 'click' THEN ts_us END)
        |           OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |           AS last_touch_ts
        |  FROM e)
        |SELECT event_id, user_id, ts_us, last_touch_ts,
        |       ts_us - last_touch_ts AS gap_us
        |FROM w WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,

    "q_media_chunks" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |         CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes
        |  FROM documents)
        |SELECT media_id,
        |       CAST(i AS BIGINT) AS chunk_idx,
        |       CAST(i * 100 AS BIGINT) AS offset,
        |       CAST(least(100, n_bytes - i * 100) AS BIGINT) AS chunk_bytes
        |FROM m,
        |     unnest(generate_series(0, greatest(CAST(ceil(n_bytes / 100.0) AS BIGINT) - 1, 0)))
        |       AS u(i)
        |ORDER BY media_id, chunk_idx""".stripMargin,

    "q_ntile" ->
      """WITH t AS (
        |  SELECT o_totalprice,
        |         CAST(ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS tile
        |  FROM orders)
        |SELECT tile, count(*) AS n_rows,
        |       round(min(o_totalprice), 4) AS lo,
        |       round(max(o_totalprice), 4) AS hi,
        |       round(avg(o_totalprice), 4) AS mean
        |FROM t GROUP BY tile ORDER BY tile""".stripMargin,

    "q_split" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 8))::BIGINT
        |           / 4294967296.0 AS u
        |  FROM documents)
        |SELECT doc_id, lang,
        |       CASE WHEN u < 0.9 THEN 'train'
        |            WHEN u < 0.95 THEN 'val'
        |            ELSE 'test' END AS split,
        |       round(u, 6) AS u_r
        |FROM d ORDER BY doc_id""".stripMargin,

    "q_window_pct" ->
      """SELECT event_id, event_type,
        |       round(value, 4) AS value_r,
        |       round(percent_rank() OVER (PARTITION BY event_type
        |                                  ORDER BY value, event_id), 6) AS pct_rank,
        |       round(cume_dist() OVER (PARTITION BY event_type
        |                               ORDER BY value, event_id), 6) AS cume
        |FROM events ORDER BY event_id""".stripMargin,

    "q_stratified_n" ->
      """WITH r AS (
        |  SELECT doc_id, lang,
        |         CAST(row_number() OVER (PARTITION BY lang
        |                                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
        |              AS BIGINT) AS rnk
        |  FROM documents)
        |SELECT doc_id, lang, rnk FROM r WHERE rnk <= 40 ORDER BY doc_id""".stripMargin,

    "q_join_right" ->
      """SELECT c_custkey, c_name, o_orderkey,
        |       round(o_totalprice, 4) AS price_r
        |FROM (SELECT * FROM orders
        |      WHERE o_orderdate >= TIMESTAMP '2000-06-01') o
        |RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY c_custkey, o_orderkey ASC NULLS FIRST""".stripMargin,

    "q_intersect" ->
      """SELECT user_id FROM events WHERE event_type = 'purchase'
        |INTERSECT
        |SELECT user_id FROM events WHERE event_type = 'error'
        |ORDER BY user_id NULLS FIRST""".stripMargin,

    "q_except" ->
      """SELECT user_id FROM events WHERE event_type = 'signup'
        |EXCEPT
        |SELECT user_id FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id NULLS FIRST""".stripMargin,

    "q_cross_join" ->
      """SELECT r_regionkey, r_name, n_nationkey, n_name
        |FROM region CROSS JOIN nation
        |ORDER BY r_regionkey, n_nationkey""".stripMargin,

    "q_window_firstlast" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |  first_value(event_type) OVER w_grow AS first_type,
        |  last_value(event_type) OVER w_grow AS latest_type,
        |  nth_value(event_type, 2) OVER w_full AS second_type
        |FROM events WHERE user_id IS NOT NULL
        |WINDOW
        |  w_grow AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  w_full AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY event_id""".stripMargin,

    "q_gap_fill" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS n
        |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
        |span AS (
        |  SELECT event_type, min(d) AS lo, max(d) AS hi
        |  FROM daily GROUP BY 1),
        |spine AS (
        |  SELECT event_type,
        |         CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
        |  FROM span)
        |SELECT s.event_type, strftime(s.d, '%Y-%m-%d') AS day,
        |       coalesce(n, 0) AS n
        |FROM spine s LEFT JOIN daily USING (event_type, d)
        |ORDER BY event_type, day""".stripMargin,

    "q_locf" ->
      """WITH g AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |         CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS v_gap
        |  FROM events WHERE user_id IS NOT NULL)
        |SELECT event_id, user_id, ts_us,
        |  round(v_gap, 4) AS v_gap_r,
        |  round(last_value(v_gap IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS v_fill_r
        |FROM g ORDER BY event_id""".stripMargin,

    "q_entropy" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         unnest(list_filter(string_split(text, ' '), x -> x != '')) AS tok
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS c
        |  FROM t GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_toks,
        |       round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 4) AS entropy_r
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_dedup_substring" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         list_filter(string_split(text, ' '), x -> x != '') AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, array_to_string(toks[i:i+7], ' ') AS gram
        |  FROM t, unnest(generate_series(1, len(toks) - 7)) AS u(i)
        |  WHERE len(toks) >= 8),
        |c AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY 1, 2),
        |w AS (SELECT doc_id, cnt,
        |             sum(cnt) OVER (PARTITION BY gram) AS total
        |      FROM c)
        |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_pos,
        |       CAST(sum(CASE WHEN total >= 2 THEN cnt ELSE 0 END) AS BIGINT) AS n_dup,
        |       round(sum(CASE WHEN total >= 2 THEN cnt ELSE 0 END)
        |             / CAST(sum(cnt) AS DOUBLE), 4) AS dup_frac
        |FROM w GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_rolling_distinct" ->
      """WITH ud AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id
        |  FROM events WHERE user_id IS NOT NULL),
        |exp AS (
        |  SELECT user_id,
        |         CAST(unnest(generate_series(d, d + INTERVAL 6 DAY,
        |                                     INTERVAL 1 DAY)) AS DATE) AS rd
        |  FROM ud),
        |b AS (SELECT min(d) AS lo, max(d) AS hi FROM ud),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS rd
        |  FROM b)
        |SELECT strftime(s.rd, '%Y-%m-%d') AS day,
        |       count(DISTINCT e.user_id) AS n_ids
        |FROM spine s LEFT JOIN exp e USING (rd)
        |GROUP BY s.rd ORDER BY day""".stripMargin,

    "q_regex_extract" ->
      """SELECT event_id,
        |  nullif(coalesce(regexp_extract(props, '[0-9]+'), ''), '') AS first_num,
        |  list_aggregate(regexp_extract_all(props, '[0-9]+'), 'string_agg', ',')
        |    AS all_nums,
        |  CAST(len(regexp_extract_all(props, '[0-9]+')) AS BIGINT) AS n_nums
        |FROM events ORDER BY event_id""".stripMargin,

    "q_merge_update" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, value
        |  FROM events WHERE user_id IS NOT NULL),
        |b AS (
        |  SELECT user_id, count(*) AS n_events, max(ts_us) AS last_ts_us,
        |         round(sum(value), 4) AS sum_v_r
        |  FROM e WHERE ts_us < 1705276800000000 GROUP BY 1),
        |u AS (
        |  SELECT user_id, count(*) AS n_events, max(ts_us) AS last_ts_us,
        |         round(sum(value), 4) AS sum_v_r
        |  FROM e WHERE ts_us >= 1705276800000000 GROUP BY 1)
        |SELECT b.user_id,
        |       CASE WHEN u.user_id IS NOT NULL THEN u.n_events ELSE b.n_events END AS n_events,
        |       CASE WHEN u.user_id IS NOT NULL THEN u.last_ts_us ELSE b.last_ts_us END AS last_ts_us,
        |       CASE WHEN u.user_id IS NOT NULL THEN u.sum_v_r ELSE b.sum_v_r END AS sum_v_r,
        |       CASE WHEN u.user_id IS NOT NULL THEN 'update' ELSE 'keep' END AS merge_action
        |FROM b LEFT JOIN u ON b.user_id = u.user_id
        |UNION ALL
        |SELECT u.user_id, u.n_events, u.last_ts_us, u.sum_v_r, 'insert' AS merge_action
        |FROM u LEFT JOIN b ON u.user_id = b.user_id WHERE b.user_id IS NULL
        |ORDER BY user_id""".stripMargin,

    "q_scd2" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type
        |  FROM events WHERE user_id IS NOT NULL),
        |t AS (
        |  SELECT *, lag(event_type) OVER (
        |    PARTITION BY user_id ORDER BY ts_us, event_id) AS prev
        |  FROM e),
        |c AS (
        |  SELECT user_id, ts_us, event_id, event_type
        |  FROM t WHERE prev IS NULL OR prev <> event_type)
        |SELECT user_id, CAST(row_number() OVER w AS BIGINT) AS version, event_type,
        |       ts_us AS valid_from, lead(ts_us) OVER w AS valid_to,
        |       (lead(ts_us) OVER w IS NULL) AS is_current
        |FROM c
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |ORDER BY user_id, version""".stripMargin,

    "q_window_median" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |       round(value, 4) AS value_r,
        |       round(quantile_cont(value, 0.5) OVER (
        |         PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS med_r
        |FROM events WHERE user_id IS NOT NULL
        |ORDER BY event_id""".stripMargin,

    "q_safe_cast" ->
      """WITH d AS (
        |  SELECT event_type,
        |         CASE WHEN event_id % 7 = 0 THEN 'N/A'
        |              WHEN event_id % 11 = 0 THEN ''
        |              ELSE CAST(value AS VARCHAR) END AS raw
        |  FROM events)
        |SELECT event_type, count(*) AS n_rows,
        |       CAST(sum(CASE WHEN try_cast(raw AS DOUBLE) IS NULL
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
        |       round(avg(try_cast(raw AS DOUBLE)), 4) AS avg_ok_r
        |FROM d GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_text_normalize" ->
      """WITH n AS (
        |  SELECT doc_id, text,
        |         trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm
        |  FROM documents)
        |SELECT doc_id,
        |       CAST(length(text) AS BIGINT) AS n_raw,
        |       CAST(length(norm) AS BIGINT) AS n_norm,
        |       md5(norm) AS norm_hash,
        |       substring(norm, 1, 32) AS norm_prefix
        |FROM n ORDER BY doc_id""".stripMargin,

    "q_inverted_index" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |         unnest(list_filter(string_split(text, ' '), x -> x != '')) AS token
        |  FROM documents),
        |dt AS (SELECT DISTINCT doc_id, token FROM tok)
        |SELECT token, count(*) AS df,
        |       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
        |FROM dt GROUP BY token HAVING count(*) >= 2
        |ORDER BY token""".stripMargin,

    "q_pmi" ->
      """WITH t AS (
        |  SELECT list_filter(string_split(text, ' '), x -> x != '') AS toks
        |  FROM documents),
        |bi AS (
        |  SELECT toks[i] AS w1, toks[i + 1] AS w2
        |  FROM t, unnest(generate_series(1, len(toks) - 1)) AS u(i)
        |  WHERE len(toks) >= 2),
        |bc AS (SELECT w1, w2, count(*) AS c_xy FROM bi GROUP BY 1, 2),
        |l AS (SELECT w1, sum(c_xy) AS c_x FROM bc GROUP BY 1),
        |r AS (SELECT w2, sum(c_xy) AS c_y FROM bc GROUP BY 1),
        |n AS (SELECT CAST(sum(c_xy) AS DOUBLE) AS nn FROM bc)
        |SELECT w1, w2, c_xy,
        |       round(ln(c_xy * nn / (c_x * c_y)), 4) AS pmi
        |FROM bc JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN n
        |WHERE c_xy >= 5
        |ORDER BY w1, w2""".stripMargin,

    "q_url_parse" ->
      """WITH u AS (
        |  SELECT doc_id,
        |         'https://' || source || '.example.com/docs/' ||
        |         CAST(doc_id AS VARCHAR) || '?lang=' || lang AS url
        |  FROM documents)
        |SELECT doc_id, url,
        |       regexp_extract(url, 'https?://([^/]+)', 1) AS host,
        |       regexp_extract(url, 'https?://[^/]+(/[^?]*)', 1) AS path,
        |       regexp_extract(url, '[?&]lang=([^&]*)', 1) AS q_lang
        |FROM u ORDER BY doc_id""".stripMargin,

    // ---- batch 10 ------------------------------------------------------------
    "q_regression" ->
      """WITH e AS (
        |  SELECT event_type,
        |         (epoch_us(ts) - 1704844800000000) / 86400000000.0 AS x,
        |         value AS y
        |  FROM events)
        |SELECT event_type, count(*) AS n,
        |       round(regr_slope(y, x), 4) AS slope_r,
        |       round(regr_intercept(y, x), 4) AS intercept_r,
        |       round(regr_r2(y, x), 4) AS r2_r
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_markov" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type
        |  FROM events WHERE user_id IS NOT NULL),
        |p AS (
        |  SELECT event_type AS state,
        |         lead(event_type) OVER (
        |           PARTITION BY user_id ORDER BY ts_us, event_id) AS next_state
        |  FROM e),
        |c AS (
        |  SELECT state, next_state, count(*) AS n
        |  FROM p WHERE next_state IS NOT NULL GROUP BY 1, 2)
        |SELECT state, next_state, n,
        |       round(n / sum(n) OVER (PARTITION BY state), 4) AS p_r
        |FROM c ORDER BY state, next_state""".stripMargin,

    "q_cooccur" ->
      """WITH e AS (
        |  SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day, event_type
        |  FROM events WHERE user_id IS NOT NULL),
        |s AS (SELECT event_type AS t, count(*) AS n_t FROM e GROUP BY 1),
        |tot AS (SELECT count(*) AS n_c FROM (SELECT DISTINCT user_id, day FROM e)),
        |p AS (
        |  SELECT a.event_type AS t_a, b.event_type AS t_b, count(*) AS n_ab
        |  FROM e a JOIN e b
        |    ON a.user_id = b.user_id AND a.day = b.day
        |   AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT t_a, t_b, n_ab,
        |       round(n_ab * n_c / (sa.n_t * sb.n_t), 4) AS lift_r
        |FROM p JOIN s sa ON sa.t = p.t_a JOIN s sb ON sb.t = p.t_b
        |CROSS JOIN tot
        |ORDER BY t_a, t_b""".stripMargin,

    "q_mad_outliers" ->
      """WITH e AS (SELECT event_id, event_type, value FROM events),
        |m AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM e GROUP BY 1),
        |d AS (
        |  SELECT event_type, quantile_cont(abs(value - med), 0.5) AS mad
        |  FROM e JOIN m USING (event_type) GROUP BY event_type)
        |SELECT event_id, event_type, round(value, 4) AS value_r,
        |       round(CASE WHEN mad > 0
        |                  THEN (value - med) / (1.4826 * mad) END, 4) AS robust_z_r
        |FROM e JOIN m USING (event_type) JOIN d USING (event_type)
        |WHERE abs(CASE WHEN mad > 0
        |               THEN (value - med) / (1.4826 * mad) END) > 3
        |ORDER BY event_id""".stripMargin,

    "q_key_skew" ->
      """WITH k AS (
        |  SELECT user_id, count(*) AS n
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |t AS (SELECT sum(n) AS total_n, count(*) AS n_keys FROM k)
        |SELECT user_id, n,
        |       round(n / total_n, 6) AS share_r,
        |       round(n * n_keys / total_n, 4) AS x_avg_r
        |FROM k CROSS JOIN t
        |ORDER BY n DESC, user_id ASC LIMIT 20""".stripMargin,

    "q_reconcile" ->
      """WITH src AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS src_n,
        |         round(sum(value), 4) AS src_sum_r
        |  FROM events GROUP BY 1),
        |dst AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS dst_n,
        |         round(sum(value), 4) AS dst_sum_r
        |  FROM events WHERE event_id % 101 <> 0 GROUP BY 1)
        |SELECT day,
        |       coalesce(src_n, 0) AS src_n,
        |       coalesce(dst_n, 0) AS dst_n,
        |       coalesce(src_n, 0) - coalesce(dst_n, 0) AS missing_n,
        |       coalesce(src_sum_r, 0) AS src_sum_r,
        |       coalesce(dst_sum_r, 0) AS dst_sum_r
        |FROM src FULL OUTER JOIN dst USING (day)
        |ORDER BY day""".stripMargin,

    "q_ewma" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
        |  FROM events WHERE user_id IS NOT NULL),
        |r AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY user_id ORDER BY ts_us, event_id) AS rn
        |  FROM e)
        |SELECT a.event_id, a.user_id, a.ts_us,
        |       round(a.value, 4) AS value_r,
        |       round(sum(b.value * power(0.5, a.rn - b.rn)) /
        |             sum(power(0.5, a.rn - b.rn)), 4) AS ewma_r
        |FROM r a JOIN r b
        |  ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - 7 AND a.rn
        |GROUP BY a.event_id, a.user_id, a.ts_us, a.value
        |ORDER BY a.event_id""".stripMargin,

    "q_length_band" ->
      """WITH d AS (
        |  SELECT doc_id, lang, n_chars,
        |         round(percent_rank() OVER (
        |           PARTITION BY lang ORDER BY n_chars, doc_id), 6) AS len_pr
        |  FROM documents)
        |SELECT doc_id, lang, n_chars, len_pr,
        |       (len_pr >= 0.05 AND len_pr <= 0.95) AS keep
        |FROM d ORDER BY doc_id""".stripMargin,

    "q_winsorize" ->
      """WITH b AS (
        |  SELECT event_type,
        |         quantile_cont(value, 0.05) AS lo,
        |         quantile_cont(value, 0.95) AS hi
        |  FROM events GROUP BY 1)
        |SELECT event_id, event_type, round(value, 4) AS value_r,
        |       round(least(greatest(value, lo), hi), 4) AS clipped_r
        |FROM events JOIN b USING (event_type)
        |ORDER BY event_id""".stripMargin,

    "q_boilerplate" ->
      """WITH c AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 2 = 0
        |              THEN 'cookie banner terms apply here ' || text
        |              ELSE text END AS text
        |  FROM documents),
        |t AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS toks
        |  FROM c),
        |s AS (
        |  SELECT doc_id,
        |         hash(array_to_string(list_slice(toks, i * 5 + 1, i * 5 + 5), ' ')) AS seg
        |  FROM t, unnest(generate_series(0, CAST(len(toks) // 5 AS INT) - 1)) AS u(i)
        |  WHERE len(toks) >= 5),
        |df AS (SELECT seg, count(DISTINCT doc_id) AS n_docs FROM s GROUP BY 1)
        |SELECT doc_id, count(*) AS n_segs,
        |       CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
        |       round(avg(CASE WHEN n_docs >= 2 THEN 1.0 ELSE 0.0 END), 4) AS boiler_frac_r
        |FROM s JOIN df USING (seg)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // ---- batch 11 ------------------------------------------------------------
    "q_ab_test" ->
      """WITH u AS (
        |  SELECT user_id,
        |         max(CASE WHEN event_type = 'purchase' AND value > 150
        |                  THEN 1 ELSE 0 END) AS conv,
        |         CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS bucket
        |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
        |c AS (
        |  SELECT
        |    CAST(sum(CASE WHEN bucket = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN bucket = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN bucket = 'A' THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
        |    CAST(sum(CASE WHEN bucket = 'B' THEN conv ELSE 0 END) AS BIGINT) AS conv_b
        |  FROM u)
        |SELECT n_a, n_b, conv_a, conv_b,
        |       round(conv_a / n_a, 4) AS rate_a_r,
        |       round(conv_b / n_b, 4) AS rate_b_r,
        |       CASE WHEN (conv_a + conv_b) > 0 AND (conv_a + conv_b) < (n_a + n_b)
        |            THEN round((conv_a / n_a - conv_b / n_b) /
        |                 sqrt(((conv_a + conv_b) / (n_a + n_b)) *
        |                      (1 - (conv_a + conv_b) / (n_a + n_b)) *
        |                      (1.0 / n_a + 1.0 / n_b)), 4)
        |            END AS z_r
        |FROM c""".stripMargin,

    "q_snapshot_diff" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, value
        |  FROM events WHERE user_id IS NOT NULL),
        |o AS (
        |  SELECT user_id, count(*) AS n_events, round(sum(value), 4) AS sum_v_r
        |  FROM e WHERE ts_us < 1705276800000000 GROUP BY 1),
        |n AS (
        |  SELECT user_id, count(*) AS n_events, round(sum(value), 4) AS sum_v_r
        |  FROM e WHERE user_id % 53 <> 0 GROUP BY 1)
        |SELECT user_id,
        |       o.n_events AS old_n_events, o.sum_v_r AS old_sum_v_r,
        |       n.n_events AS new_n_events, n.sum_v_r AS new_sum_v_r,
        |       CASE WHEN o.user_id IS NULL THEN 'added'
        |            WHEN n.user_id IS NULL THEN 'removed'
        |            WHEN o.n_events IS NOT DISTINCT FROM n.n_events
        |             AND o.sum_v_r IS NOT DISTINCT FROM n.sum_v_r THEN 'same'
        |            ELSE 'changed' END AS status
        |FROM o FULL OUTER JOIN n USING (user_id)
        |ORDER BY user_id""".stripMargin,

    "q_seasonality" ->
      """WITH c AS (
        |  SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
        |         CAST(extract(hour FROM ts) AS BIGINT) AS hod,
        |         count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT dow, hod, n,
        |       round(n / sum(n) OVER (PARTITION BY dow), 4) AS share_r
        |FROM c ORDER BY dow, hod""".stripMargin,

    "q_json_intake" ->
      """SELECT CASE WHEN event_id % 13 = 0 THEN 'corrupt'
        |            ELSE event_type END AS bucket,
        |       count(*) AS n
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin,

    // Same derivation as q_json_intake: the oracle knows every 13th
    // record carries the poisoned event_id cell, so it restates the
    // bucket counts straight from the clean table.
    "q_xml_intake" ->
      """SELECT CASE WHEN event_id % 13 = 0 THEN 'corrupt'
        |            ELSE event_type END AS bucket,
        |       count(*) AS n
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin,

    // Same derivation again for the CSV member of the trio.
    "q_csv_intake" ->
      """SELECT CASE WHEN event_id % 13 = 0 THEN 'corrupt'
        |            ELSE event_type END AS bucket,
        |       count(*) AS n
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q_sink_zorder" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us
        |FROM events WHERE user_id IS NOT NULL
        |ORDER BY event_id""".stripMargin,

    "q_sim_lsh" -> {
      // generated, not hand-written: the plane matrix must be the
      // SAME doubles the Spark query uses (Scala's toString is the
      // shortest round-trip representation, so DuckDB parses back the
      // identical binary double)
      val planes = graft.ops.Sim.gaussianPlanes(dim = 64, nPlanes = 8)
      val terms = planes.zipWithIndex.map { case (p, i) =>
        val lits = p.mkString("[", ", ", "]")
        s"(CASE WHEN list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)), $lits) > 0 THEN ${1L << i} ELSE 0 END)"
      }.mkString(" + ")
      s"""SELECT vec_id, CAST($terms AS BIGINT) AS bucket
         |FROM embeddings ORDER BY vec_id""".stripMargin
    },

    "q_topk_groups" ->
      """WITH r AS (
        |  SELECT event_type, value, event_id,
        |         CAST(row_number() OVER (
        |           PARTITION BY event_type
        |           ORDER BY value DESC, event_id ASC) AS BIGINT) AS rnk
        |  FROM events)
        |SELECT event_type, rnk, round(value, 4) AS value_r, event_id
        |FROM r WHERE rnk <= 5
        |ORDER BY event_type, rnk""".stripMargin,

    "q_json_keys" ->
      """WITH r AS (
        |  SELECT CASE WHEN event_id % 11 = 0 THEN '{not json'
        |              WHEN event_id % 5 = 0 THEN '{"tag": "' || event_type ||
        |                   '", "n": ' || CAST(event_id % 7 AS VARCHAR) || '}'
        |              ELSE props END AS raw
        |  FROM events),
        |t AS (SELECT count(*) AS total FROM r),
        |kv AS (
        |  SELECT k AS key,
        |         json_extract_string(raw, '$.' || k) AS val
        |  FROM r, unnest(json_keys(
        |         CASE WHEN json_valid(raw) THEN raw ELSE '{}' END)) AS u(k))
        |SELECT key, count(*) AS n_rows,
        |       CAST(count(DISTINCT val) AS BIGINT) AS n_vals,
        |       round(count(*) / max(total), 4) AS share_r
        |FROM kv CROSS JOIN t
        |GROUP BY key ORDER BY key""".stripMargin,

    // ---- batch 12 ----

    "q_mix_temperature" ->
      """WITH per AS (
        |  SELECT source,
        |         count(*) AS n_docs,
        |         CAST(sum(len(list_filter(string_split(text, ' '), t -> t != ''))) AS BIGINT)
        |           AS n_tokens
        |  FROM documents GROUP BY source),
        |tot AS (
        |  SELECT CAST(sum(n_tokens) AS DOUBLE) AS tot_tokens,
        |         sum(pow(CAST(n_tokens AS DOUBLE), 0.5)) AS tot_pow
        |  FROM per)
        |SELECT source, n_docs, n_tokens,
        |       round(n_tokens / tot_tokens, 6) AS raw_share_r,
        |       round(pow(CAST(n_tokens AS DOUBLE), 0.5) / tot_pow, 6) AS temp_weight_r,
        |       round(pow(CAST(n_tokens AS DOUBLE), 0.5) / tot_pow
        |             * tot_tokens / n_tokens, 4) AS epochs_r
        |FROM per, tot ORDER BY source""".stripMargin,

    "q_quality_norm" ->
      """WITH med AS (
        |  SELECT source, quantile_cont(n_chars, 0.5) AS m
        |  FROM documents GROUP BY source)
        |SELECT d.doc_id, d.source, d.n_chars,
        |       round(percent_rank() OVER (PARTITION BY d.source ORDER BY d.n_chars), 6)
        |         AS pr_r,
        |       CAST(CASE WHEN d.n_chars >= med.m THEN 1 ELSE 0 END AS BIGINT)
        |         AS above_median,
        |       round(med.m, 4) AS grp_median_r
        |FROM documents d JOIN med USING (source)
        |ORDER BY d.doc_id""".stripMargin,

    "q_k_anonymity" ->
      """WITH g AS (
        |  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        |         count(*) AS n_rows,
        |         CAST(count(DISTINCT user_id) AS BIGINT) AS n_subjects,
        |         round(sum(value), 4) AS sum_v
        |  FROM events WHERE user_id IS NOT NULL
        |  GROUP BY 1, 2)
        |SELECT event_type, day, n_rows, n_subjects,
        |       CASE WHEN n_subjects >= 55 THEN sum_v END AS sum_v_released,
        |       CAST(CASE WHEN n_subjects >= 55 THEN 0 ELSE 1 END AS BIGINT)
        |         AS suppressed
        |FROM g ORDER BY event_type, day""".stripMargin,

    "q_oov_rate" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t != ''))
        |    AS token
        |  FROM documents),
        |vocab AS (
        |  SELECT token FROM (
        |    SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token)
        |  WHERE df >= 100)
        |SELECT t.doc_id,
        |       count(*) AS n_tok,
        |       CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_oov,
        |       round(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
        |             / CAST(count(*) AS DOUBLE), 6) AS oov_rate_r
        |FROM tok t LEFT JOIN vocab v USING (token)
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,

    "q_dedup_incremental" ->
      """WITH corpus AS (SELECT doc_id, text FROM documents),
        |batch AS (
        |  SELECT doc_id + 100000 AS doc_id, text FROM corpus WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id + 200000 AS doc_id, text || ' zz8 zz8' FROM corpus
        |  WHERE doc_id % 3 = 1
        |  UNION ALL
        |  SELECT doc_id + 300000 AS doc_id, text || ' zz8 zz8' FROM corpus
        |  WHERE doc_id % 3 = 1),
        |hashed AS (
        |  SELECT doc_id, md5(text) AS h,
        |         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |  FROM batch),
        |idx AS (SELECT DISTINCT md5(text) AS h FROM corpus)
        |SELECT b.doc_id,
        |       CAST(CASE WHEN i.h IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
        |         AS dup_of_corpus,
        |       CAST(CASE WHEN b.rn > 1 THEN 1 ELSE 0 END AS BIGINT) AS dup_in_batch,
        |       CAST(CASE WHEN i.h IS NULL AND b.rn = 1 THEN 1 ELSE 0 END AS BIGINT)
        |         AS keep
        |FROM hashed b LEFT JOIN idx i USING (h)
        |ORDER BY b.doc_id""".stripMargin,

    "q_overlap_matrix" ->
      """WITH tok AS (
        |  SELECT source, list_filter(string_split(text, ' '), t -> t != '') AS toks
        |  FROM documents),
        |shx AS (
        |  SELECT source, unnest(list_distinct(list_transform(
        |    generate_series(1, greatest(len(toks) - 2, 1)),
        |    i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2])))) AS shingle
        |  FROM tok),
        |ss AS (
        |  SELECT DISTINCT source, hash(shingle) AS h
        |  FROM shx),
        |sz AS (SELECT source, count(*) AS n FROM ss GROUP BY source),
        |inter AS (
        |  SELECT x.source AS src_a, y.source AS src_b, count(*) AS n_shared
        |  FROM ss x JOIN ss y ON x.h = y.h AND x.source < y.source
        |  GROUP BY 1, 2)
        |SELECT i.src_a, i.src_b, i.n_shared,
        |       a.n AS n_a, b.n AS n_b,
        |       round(i.n_shared / CAST(a.n + b.n - i.n_shared AS DOUBLE), 6)
        |         AS jaccard_r
        |FROM inter i
        |JOIN sz a ON a.source = i.src_a
        |JOIN sz b ON b.source = i.src_b
        |ORDER BY src_a, src_b""".stripMargin,

    // ---- batch 17 ----

    "q_dedup_url" ->
      """WITH d AS (SELECT doc_id, doc_id // 3 AS page FROM documents),
        |c AS (
        |  SELECT doc_id,
        |         'src' || CAST(page % 20 AS VARCHAR) || '.example.com/page/'
        |           || CAST(page AS VARCHAR) AS canon
        |  FROM d),
        |g AS (
        |  SELECT canon, min(doc_id) AS keep_id, count(*) AS n_variants
        |  FROM c GROUP BY canon)
        |SELECT c.doc_id, c.canon, g.keep_id,
        |       CAST(g.n_variants AS BIGINT) AS n_variants,
        |       CAST(CASE WHEN c.doc_id = g.keep_id THEN 1 ELSE 0 END AS BIGINT)
        |         AS keep
        |FROM c JOIN g USING (canon) ORDER BY c.doc_id""".stripMargin,

    "q_anomaly_days" ->
      """WITH daily AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
        |  FROM events GROUP BY 1),
        |m AS (SELECT quantile_cont(n, 0.5) AS med FROM daily),
        |md AS (SELECT quantile_cont(abs(n - m.med), 0.5) AS mad FROM daily, m)
        |SELECT day, n, round(m.med, 4) AS med_r, round(md.mad, 4) AS mad_r,
        |       CASE WHEN md.mad > 0
        |            THEN round((n - m.med) / (1.4826 * md.mad), 4) END
        |         AS robust_z_r,
        |       CAST(CASE WHEN abs(CASE WHEN md.mad > 0
        |                  THEN round((n - m.med) / (1.4826 * md.mad), 4) END) > 3.0
        |            THEN 1 ELSE 0 END AS BIGINT) AS anomaly
        |FROM daily, m, md ORDER BY day""".stripMargin,

    "q_ppl_buckets" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t != ''))
        |    AS token
        |  FROM documents),
        |tf AS (SELECT token, count(*) AS freq FROM tok GROUP BY token),
        |tot AS (SELECT CAST(sum(freq) AS DOUBLE) AS total FROM tf),
        |scored AS (
        |  SELECT t.doc_id, count(*) AS n_toks,
        |         round(avg(ln(tf.freq / tot.total)), 4) AS logprob
        |  FROM tok t JOIN tf USING (token), tot
        |  GROUP BY t.doc_id),
        |b AS (
        |  SELECT s.doc_id, d.source, s.n_toks, s.logprob,
        |         ntile(3) OVER (PARTITION BY d.source
        |           ORDER BY s.logprob DESC, s.doc_id) AS b
        |  FROM scored s JOIN documents d USING (doc_id))
        |SELECT doc_id, source, n_toks, logprob,
        |       CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
        |              ELSE 'tail' END AS bucket
        |FROM b ORDER BY doc_id""".stripMargin,

    "q_cdc_apply" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, value
        |  FROM events WHERE user_id IS NOT NULL),
        |base AS (
        |  SELECT user_id, count(*) AS n_events, round(sum(value), 4) AS sum_v_r
        |  FROM e WHERE ts_us < 1704844800000000 GROUP BY 1),
        |c1 AS (
        |  SELECT user_id, count(*) AS n_events, round(sum(value), 4) AS sum_v_r
        |  FROM e WHERE ts_us < 1705276800000000 GROUP BY 1),
        |c1k AS (SELECT DISTINCT user_id FROM e
        |        WHERE ts_us >= 1704844800000000 AND ts_us < 1705276800000000),
        |c2 AS (
        |  SELECT user_id, count(*) AS n_events, round(sum(value), 4) AS sum_v_r
        |  FROM e GROUP BY 1),
        |c2k AS (SELECT DISTINCT user_id FROM e WHERE ts_us >= 1705276800000000),
        |winner AS (
        |  -- last writer per key: seq 2 (late update) beats seq 1; the
        |  -- delete (seq 3) beats both
        |  SELECT coalesce(c2.user_id, c1.user_id) AS user_id,
        |         CASE WHEN c2.user_id IS NOT NULL THEN c2.n_events
        |              ELSE c1.n_events END AS n_events,
        |         CASE WHEN c2.user_id IS NOT NULL THEN c2.sum_v_r
        |              ELSE c1.sum_v_r END AS sum_v_r
        |  FROM (SELECT c1.* FROM c1 JOIN c1k USING (user_id)) c1
        |  FULL OUTER JOIN (SELECT c2.* FROM c2 JOIN c2k USING (user_id)) c2
        |    ON c1.user_id = c2.user_id)
        |SELECT coalesce(w.user_id, b.user_id) AS user_id,
        |       CASE WHEN w.user_id IS NOT NULL THEN w.n_events
        |            ELSE b.n_events END AS n_events,
        |       CASE WHEN w.user_id IS NOT NULL THEN w.sum_v_r
        |            ELSE b.sum_v_r END AS sum_v_r
        |FROM base b FULL OUTER JOIN winner w ON b.user_id = w.user_id
        |-- every key in play has events, so the delete batch covers all
        |-- user_id % 7 = 0 keys exactly
        |WHERE coalesce(w.user_id, b.user_id) % 7 != 0
        |ORDER BY user_id""".stripMargin,

    // ---- batch 16 ----

    "q_kl_sources" ->
      """WITH tok AS (
        |  SELECT source, unnest(list_filter(string_split(text, ' '), t -> t != ''))
        |    AS token
        |  FROM documents),
        |st AS (SELECT source, token, count(*) AS c FROM tok GROUP BY 1, 2),
        |stot AS (SELECT source, sum(c) AS s_tot FROM st GROUP BY 1),
        |ctok AS (SELECT token, sum(c) AS t_tot FROM st GROUP BY 1),
        |g AS (SELECT CAST(sum(c) AS DOUBLE) AS g_tot FROM st)
        |SELECT st.source,
        |       CAST(max(stot.s_tot) AS BIGINT) AS n_tokens,
        |       round(sum(st.c / stot.s_tot
        |             * ln(st.c / stot.s_tot / (ctok.t_tot / g.g_tot))), 6) AS kl_r
        |FROM st
        |JOIN ctok USING (token) JOIN stot USING (source) CROSS JOIN g
        |GROUP BY st.source ORDER BY st.source""".stripMargin,

    "q_zipf" ->
      """WITH freq AS (
        |  SELECT token, count(*) AS freq FROM (
        |    SELECT unnest(list_filter(string_split(text, ' '), t -> t != ''))
        |      AS token
        |    FROM documents) GROUP BY token),
        |ranked AS (
        |  SELECT ln(CAST(row_number() OVER (ORDER BY freq DESC, token ASC)
        |            AS DOUBLE)) AS lr,
        |         ln(CAST(freq AS DOUBLE)) AS lf
        |  FROM freq)
        |SELECT count(*) AS n_vocab,
        |       round(regr_slope(lf, lr), 4) AS slope_r,
        |       round(regr_r2(lf, lr), 4) AS r2_r
        |FROM ranked""".stripMargin,

    "q_burstiness" ->
      """WITH dt AS (
        |  SELECT doc_id, token, count(*) AS c FROM (
        |    SELECT doc_id,
        |           unnest(list_filter(string_split(text, ' '), t -> t != ''))
        |             AS token
        |    FROM documents) GROUP BY doc_id, token)
        |SELECT token, count(*) AS df, CAST(sum(c) AS BIGINT) AS cf,
        |       round(avg(c), 4) AS mean_r,
        |       round(var_samp(c) / avg(c), 4) AS dispersion_r
        |FROM dt GROUP BY token ORDER BY token""".stripMargin,

    // ---- batch 15 ----

    "q_hash_embed" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t != ''))
        |    AS token
        |  FROM documents),
        |hashed AS (
        |  SELECT doc_id,
        |         ('0x' || substr(md5(token), 1, 8))::BIGINT % 64 AS bucket,
        |         ('0x' || substr(md5(token), 9, 1))::BIGINT % 2 * 2 - 1 AS sign
        |  FROM tok)
        |SELECT doc_id, bucket, CAST(sum(sign) AS BIGINT) AS v
        |FROM hashed GROUP BY doc_id, bucket
        |HAVING sum(sign) != 0
        |ORDER BY doc_id, bucket""".stripMargin,

    "q_skipgrams" ->
      """WITH t AS (
        |  SELECT list_filter(string_split(text, ' '), x -> x != '') AS toks
        |  FROM documents),
        |pos AS (
        |  SELECT toks, i FROM t, unnest(generate_series(1, len(toks))) AS u(i)
        |  WHERE len(toks) >= 2),
        |pairs AS (
        |  SELECT toks[i] AS center, toks[i + o.o] AS context
        |  FROM pos, (SELECT unnest([-2, -1, 1, 2]) AS o) o
        |  WHERE i + o.o >= 1 AND i + o.o <= len(toks))
        |SELECT center, context, count(*) AS n_pairs
        |FROM pairs GROUP BY center, context
        |ORDER BY center, context""".stripMargin,

    "q_reservoir" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |         row_number() OVER (
        |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 100 ORDER BY doc_id""".stripMargin,

    // ---- batch 14 ----

    "q_winnow" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, i AS pos,
        |         concat_ws(' ', toks[i], toks[i + 1], toks[i + 2]) AS gram,
        |         len(toks) - 2 AS m
        |  FROM t, unnest(generate_series(1, len(toks) - 2)) AS u(i)
        |  WHERE len(toks) >= 3),
        |h AS (
        |  SELECT doc_id, pos, m,
        |         ('0x' || substr(md5(gram), 1, 8))::BIGINT % 2147483647 AS hh
        |  FROM g),
        |sel AS (
        |  SELECT doc_id, pos, m,
        |         min({'h': hh, 'p': pos}) OVER (
        |           PARTITION BY doc_id ORDER BY pos
        |           ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS s
        |  FROM h)
        |SELECT DISTINCT doc_id, s.p AS fp_pos, s.h AS fp_h
        |FROM sel WHERE pos <= m - 3
        |ORDER BY doc_id, fp_pos""".stripMargin,

    "q_pit_join" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type
        |  FROM events WHERE user_id IS NOT NULL),
        |trans AS (
        |  SELECT user_id, ts_us, event_id, event_type,
        |         lag(event_type) OVER (PARTITION BY user_id
        |           ORDER BY ts_us, event_id) AS prev
        |  FROM e),
        |vers AS (
        |  SELECT user_id, ts_us AS valid_from, event_type,
        |         CAST(row_number() OVER (PARTITION BY user_id
        |           ORDER BY valid_from, event_id) AS BIGINT) AS version
        |  FROM trans WHERE prev IS NULL OR prev != event_type),
        |facts AS (
        |  SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'purchase'),
        |m AS (
        |  SELECT f.event_id, f.user_id, f.ts_us, v.version, v.event_type,
        |         row_number() OVER (PARTITION BY f.event_id
        |           ORDER BY v.valid_from DESC, v.version DESC) AS rn
        |  FROM facts f LEFT JOIN vers v
        |    ON v.user_id = f.user_id AND v.valid_from <= f.ts_us)
        |SELECT event_id, user_id, ts_us, version AS dim_version,
        |       event_type AS dim_event_type
        |FROM m WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "q_length_buckets" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         CAST(len(list_filter(string_split(text, ' '), x -> x != ''))
        |           AS BIGINT) AS n_tok
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, n_tok,
        |         CAST(ntile(8) OVER (ORDER BY n_tok, doc_id) AS BIGINT) AS bucket
        |  FROM t)
        |SELECT bucket, count(*) AS n_docs,
        |       min(n_tok) AS min_tok, max(n_tok) AS max_tok,
        |       round(avg(n_tok), 4) AS avg_tok_r,
        |       round(1.0 - round(avg(n_tok), 4) / max(n_tok), 4) AS pad_waste_r
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q_interleave" ->
      """WITH r AS (
        |  SELECT doc_id, source,
        |         CAST(row_number() OVER (PARTITION BY source
        |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rnk
        |  FROM documents)
        |SELECT doc_id, source, rnk FROM r
        |ORDER BY rnk, source, doc_id LIMIT 100""".stripMargin,

    "q_split_leakage" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text FROM documents),
        |s AS (
        |  SELECT doc_id, md5(text) AS h,
        |         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 8))::BIGINT
        |           / 4294967296.0 AS u
        |  FROM corpus),
        |sp AS (
        |  SELECT doc_id, h,
        |         CASE WHEN u < 0.9 THEN 'train'
        |              WHEN u < 0.95 THEN 'val'
        |              ELSE 'test' END AS split
        |  FROM s)
        |SELECT a.doc_id AS a, b.doc_id AS b,
        |       a.split AS split_a, b.split AS split_b
        |FROM sp a JOIN sp b
        |  ON a.h = b.h AND a.doc_id < b.doc_id AND a.split != b.split
        |ORDER BY a, b""".stripMargin,

    // ---- batch 13 ----

    "q_textrank" ->
      """WITH t AS (
        |  SELECT list_filter(string_split(text, ' '), x -> x != '') AS toks
        |  FROM documents),
        |bi AS (
        |  SELECT toks[i] AS w1, toks[i + 1] AS w2
        |  FROM t, unnest(generate_series(1, len(toks) - 1)) AS u(i)
        |  WHERE len(toks) >= 2),
        |bc AS (SELECT w1, w2, count(*) AS c FROM bi WHERE w1 != w2 GROUP BY 1, 2),
        |edges AS (
        |  SELECT src, dst, sum(c) AS w FROM (
        |    SELECT w1 AS src, w2 AS dst, c FROM bc
        |    UNION ALL
        |    SELECT w2 AS src, w1 AS dst, c FROM bc)
        |  GROUP BY 1, 2),
        |ow AS (SELECT src, sum(w) AS w_out FROM edges GROUP BY 1),
        |contrib AS (
        |  SELECT e.src, e.dst, e.w / o.w_out AS frac
        |  FROM edges e JOIN ow o USING (src)),
        |nodes AS (SELECT DISTINCT src AS token FROM contrib),
        |s0 AS (SELECT token, CAST(1.0 AS DOUBLE) AS s FROM nodes),
        |i1 AS (SELECT c.dst, sum(c.frac * p.s) AS in_s
        |       FROM contrib c JOIN s0 p ON p.token = c.src GROUP BY c.dst),
        |s1 AS (SELECT n.token, 0.15 + 0.85 * coalesce(i.in_s, 0) AS s
        |       FROM nodes n LEFT JOIN i1 i ON i.dst = n.token),
        |i2 AS (SELECT c.dst, sum(c.frac * p.s) AS in_s
        |       FROM contrib c JOIN s1 p ON p.token = c.src GROUP BY c.dst),
        |s2 AS (SELECT n.token, 0.15 + 0.85 * coalesce(i.in_s, 0) AS s
        |       FROM nodes n LEFT JOIN i2 i ON i.dst = n.token),
        |i3 AS (SELECT c.dst, sum(c.frac * p.s) AS in_s
        |       FROM contrib c JOIN s2 p ON p.token = c.src GROUP BY c.dst),
        |s3 AS (SELECT n.token, 0.15 + 0.85 * coalesce(i.in_s, 0) AS s
        |       FROM nodes n LEFT JOIN i3 i ON i.dst = n.token),
        |i4 AS (SELECT c.dst, sum(c.frac * p.s) AS in_s
        |       FROM contrib c JOIN s3 p ON p.token = c.src GROUP BY c.dst),
        |s4 AS (SELECT n.token, 0.15 + 0.85 * coalesce(i.in_s, 0) AS s
        |       FROM nodes n LEFT JOIN i4 i ON i.dst = n.token),
        |i5 AS (SELECT c.dst, sum(c.frac * p.s) AS in_s
        |       FROM contrib c JOIN s4 p ON p.token = c.src GROUP BY c.dst),
        |s5 AS (SELECT n.token, 0.15 + 0.85 * coalesce(i.in_s, 0) AS s
        |       FROM nodes n LEFT JOIN i5 i ON i.dst = n.token)
        |SELECT token, round(s, 4) AS score_r FROM s5
        |ORDER BY token""".stripMargin,

    "q_hard_negatives" ->
      """WITH e AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |q AS (SELECT vec_id AS q_id, label AS q_label, v AS qv, nrm AS qn
        |      FROM n WHERE vec_id < 10),
        |sc AS (
        |  SELECT q.q_id, c.vec_id AS c_id, c.label AS c_label,
        |         round(list_dot_product(q.qv, c.v) / (q.qn * c.nrm), 4) AS cos_r
        |  FROM q JOIN n c ON c.label != q.q_label),
        |ranked AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id
        |                    ORDER BY cos_r DESC, c_id ASC) AS BIGINT) AS rnk
        |  FROM sc)
        |SELECT q_id, c_id, c_label, cos_r, rnk FROM ranked
        |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,

    "q_knn_vote" ->
      """WITH e AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |q AS (SELECT vec_id AS q_id, label AS q_label, v AS qv, nrm AS qn
        |      FROM n WHERE vec_id % 10 = 0),
        |c AS (SELECT vec_id AS c_id, label AS c_label, v AS cv, nrm AS cn
        |      FROM n WHERE vec_id % 10 != 0),
        |sc AS (
        |  SELECT q_id, q_label, c_id, c_label,
        |         round(list_dot_product(qv, cv) / (qn * cn), 4) AS cos_r
        |  FROM q, c),
        |top AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY q_id
        |                ORDER BY cos_r DESC, c_id ASC) AS rnk
        |    FROM sc) WHERE rnk <= 5),
        |votes AS (
        |  SELECT q_id, q_label, c_label, count(*) AS votes
        |  FROM top GROUP BY 1, 2, 3),
        |best AS (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |              ORDER BY votes DESC, c_label ASC) AS vr
        |  FROM votes)
        |SELECT q_id AS vec_id, q_label AS label, c_label AS pred_label, votes,
        |       CAST(CASE WHEN c_label = q_label THEN 1 ELSE 0 END AS BIGINT)
        |         AS correct
        |FROM best WHERE vr = 1 ORDER BY vec_id""".stripMargin,

    "q_embed_proto" ->
      """WITH e AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |d AS (
        |  SELECT label, unnest(v) AS x, generate_subscripts(v, 1) AS i FROM e),
        |cd AS (SELECT label, i, avg(x) AS cx FROM d GROUP BY label, i),
        |cl AS (SELECT label, list(cx ORDER BY i) AS cv FROM cd GROUP BY label),
        |scored AS (
        |  SELECT e.vec_id, e.label,
        |         round(list_dot_product(e.v, cl.cv)
        |               / (sqrt(list_dot_product(e.v, e.v))
        |                  * sqrt(list_dot_product(cl.cv, cl.cv))), 4) AS cos_r
        |  FROM e JOIN cl USING (label))
        |SELECT vec_id, label, cos_r,
        |       CAST(row_number() OVER (PARTITION BY label
        |              ORDER BY cos_r DESC, vec_id ASC) AS BIGINT) AS proto_rnk
        |FROM scored ORDER BY vec_id""".stripMargin,
  )
}
