package graft

import graft.EntrySupport.ccKeeperCtes

/** DuckDB oracle SQL for the declared queries (batches 1-6) — same tables,
  * same column names, same row order as the Spark bodies in the
  * EntryQueries files; split from SparkEntry behind the same
  * `oracleSql` map.
  */
private[graft] object EntryOraclesA {

  val map: Map[String, String] = Map(
    "q_scan_events" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type,
        |       round(value, 4) AS value_r, props
        |FROM events ORDER BY event_id""".stripMargin,

    "q_prune_dates" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, strftime(ts, '%Y-%m-%d') AS event_date
        |FROM events
        |WHERE epoch_us(ts) >= 1704844800000000 AND epoch_us(ts) < 1705708800000000
        |ORDER BY event_id""".stripMargin,

    "q_project" ->
      """SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us, props,
        |       strftime(ts, '%Y-%m-%d') AS event_date
        |FROM events ORDER BY event_id""".stripMargin,

    "q_filter_nonnull" ->
      """SELECT event_id, user_id, event_type FROM events
        |WHERE user_id IS NOT NULL AND event_type IS NOT NULL AND event_type <> ''
        |ORDER BY event_id""".stripMargin,

    "q_filter_in" ->
      """SELECT event_id, event_type FROM events
        |WHERE event_type IN ('click', 'view', 'purchase')
        |ORDER BY event_id""".stripMargin,

    "q_filter_gt_watermark" ->
      """SELECT event_id, epoch_us(ts) AS ts_us FROM events
        |WHERE epoch_us(ts) > 1705276800000000
        |ORDER BY event_id""".stripMargin,

    "q_params_extract" ->
      """SELECT event_id, user_id,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS param_k
        |FROM events ORDER BY event_id""".stripMargin,

    "q_sort_desc" ->
      """SELECT event_id, epoch_us(ts) AS ts_us FROM events
        |ORDER BY ts_us DESC, event_id DESC""".stripMargin,

    "q_sort_asc" ->
      """SELECT event_id, epoch_us(ts) AS ts_us FROM events
        |ORDER BY ts_us ASC, event_id ASC""".stripMargin,

    "q_topk" ->
      """SELECT event_id, round(value, 4) AS value_r FROM events
        |ORDER BY value DESC, event_id ASC LIMIT 100""".stripMargin,

    "q_agg_max" ->
      "SELECT max(epoch_us(ts)) AS max_ts_us FROM events",

    "q_agg_count" ->
      "SELECT count(*) AS n_rows FROM events",

    "q_agg_group" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_value,
        |       round(avg(value), 4) AS avg_value
        |FROM events GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin,

    "q_agg_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin,

    "q_rollup" ->
      """SELECT event_type, strftime(ts, '%Y-%m-%d') AS event_date, count(*) AS n
        |FROM events
        |GROUP BY ROLLUP(event_type, strftime(ts, '%Y-%m-%d'))
        |ORDER BY event_type NULLS FIRST, event_date NULLS FIRST""".stripMargin,

    "q_dedup_key" ->
      """SELECT user_id, event_type, event_id, ts_us FROM (
        |  SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us,
        |         row_number() OVER (PARTITION BY user_id, event_type
        |                            ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events) t
        |WHERE rn = 1 ORDER BY user_id NULLS FIRST, event_type NULLS FIRST""".stripMargin,

    "q_upsert_anti" ->
      """WITH existing AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events
        |  WHERE event_id % 3 = 0),
        |incoming AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type FROM events
        |  WHERE epoch_us(ts) > 1705276800000000)
        |SELECT i.event_id, i.user_id, i.ts_us, i.event_type FROM incoming i
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM existing e
        |  WHERE e.user_id = i.user_id AND e.ts_us = i.ts_us
        |    AND e.event_type = i.event_type)
        |ORDER BY i.event_id""".stripMargin,

    "q_union" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type FROM events)
        |SELECT * FROM (
        |  SELECT * FROM ev WHERE ts_us < 1704844800000000
        |  UNION ALL
        |  SELECT * FROM ev WHERE ts_us >= 1704844800000000 AND ts_us < 1705708800000000
        |) ORDER BY event_id""".stripMargin,

    "q_incremental" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type FROM events),
        |batch1 AS (SELECT * FROM ev WHERE ts_us <= 1705276800000000),
        |wm AS (SELECT max(ts_us) AS m FROM batch1),
        |batch2 AS (SELECT * FROM ev WHERE ts_us > (SELECT m FROM wm))
        |SELECT * FROM (
        |  SELECT * FROM batch1 UNION ALL SELECT * FROM batch2
        |) ORDER BY event_id""".stripMargin,

    "q_sink_csv" ->
      """SELECT event_id, user_id, strftime(ts, '%Y-%m-%d') AS event_date,
        |       epoch_us(ts) AS ts_us, event_type,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS param_k
        |FROM events ORDER BY event_id""".stripMargin,

    "q_sink_append" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
        |FROM events ORDER BY event_id""".stripMargin,

    "q_join_inner" ->
      """SELECT o_orderkey, c_name, round(o_totalprice, 4) AS total_r
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "q_join_left" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, p_name
        |FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
        |ORDER BY l_orderkey, l_linenumber, l_partkey""".stripMargin,

    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders)
        |ORDER BY c_custkey""".stripMargin,

    "q_window_rank" ->
      """SELECT user_id, event_id,
        |       CAST(row_number() OVER (PARTITION BY user_id
        |                               ORDER BY epoch_us(ts), event_id) AS BIGINT) AS rn
        |FROM events ORDER BY user_id NULLS FIRST, rn""".stripMargin,

    "q_window_lag" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |       epoch_us(ts) - lag(epoch_us(ts), 1) OVER (
        |         PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap_us
        |FROM events ORDER BY user_id NULLS FIRST, ts_us, event_id""".stripMargin,

    "q_window_tumbling" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
        |       event_type, count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type NULLS FIRST""".stripMargin,

    "q_date_parse" ->
      """WITH raw AS (
        |  SELECT event_id,
        |         CASE CAST(event_id % 4 AS INTEGER)
        |           WHEN 0 THEN strftime(ts, '%Y-%m-%d')
        |           WHEN 1 THEN strftime(ts, '%Y/%m/%d')
        |           WHEN 2 THEN strftime(ts, '%d-%m-%Y')
        |           ELSE strftime(ts, '%d/%m/%Y') END AS raw
        |  FROM events)
        |SELECT event_id, raw,
        |       strftime(coalesce(
        |         try_strptime(raw, '%Y-%m-%d'), try_strptime(raw, '%Y/%m/%d'),
        |         try_strptime(raw, '%d-%m-%Y'), try_strptime(raw, '%d/%m/%Y')),
        |         '%Y-%m-%d') AS parsed
        |FROM raw ORDER BY event_id""".stripMargin,

    "q_date_format" ->
      """SELECT event_id, strftime(ts, '%Y%m%d') AS ymd,
        |       strftime(ts, '%Y-%m-%dT%H:%M:%S') AS iso
        |FROM events ORDER BY event_id""".stripMargin,

    "q_date_arith" ->
      """SELECT event_id,
        |       strftime(ts - INTERVAL 7 DAY, '%Y-%m-%d %H:%M:%S') AS minus_7d,
        |       strftime(ts + INTERVAL 36 HOUR, '%Y-%m-%d %H:%M:%S') AS plus_36h,
        |       CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT)
        |         AS days_since
        |FROM events ORDER BY event_id""".stripMargin,

    "q_epoch_micros" ->
      """SELECT event_id, epoch_us(ts) AS ts_us,
        |       strftime(make_timestamp(epoch_us(ts)), '%Y-%m-%d %H:%M:%S') AS ts_str,
        |       epoch_us(make_timestamp(epoch_us(ts))) AS roundtrip_us
        |FROM events ORDER BY event_id""".stripMargin,

    "q_string_fns" ->
      """SELECT doc_id, upper(lang) AS lang_u, concat_ws('-', lang, source) AS tag,
        |       CAST(length(text) AS BIGINT) AS n_len,
        |       substr(text, 1, 20) AS prefix
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,

    "q_text_tokens" ->
      """SELECT token, count(*) AS freq FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
        |WHERE token <> ''
        |GROUP BY token ORDER BY freq DESC, token""".stripMargin,

    "q_heavy_hitters" ->
      """WITH f AS (
        |  SELECT token, count(*) AS freq FROM (
        |    SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
        |  WHERE token <> '' GROUP BY token),
        |tot AS (SELECT CAST(sum(freq) AS BIGINT) AS total FROM f)
        |SELECT f.token, f.freq,
        |       round(f.freq / CAST(tot.total AS DOUBLE), 4) AS share
        |FROM f, tot
        |WHERE f.freq >= 0.02 * tot.total
        |ORDER BY f.token""".stripMargin,

    "q_text_stats" ->
      """SELECT lang, source, count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |       round(avg(n_chars), 4) AS avg_chars,
        |       min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,

    "q_sim_cosine_topk" ->
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

    "q_dedup_ngram" ->
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
        |sizes AS (SELECT doc_id, count(*) AS sz FROM hx GROUP BY doc_id),
        |common AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
        |  FROM hx x JOIN hx y ON x.h = y.h AND x.doc_id < y.doc_id
        |  GROUP BY x.doc_id, y.doc_id)
        |SELECT c.a, c.b, round(c.c / (sa.sz + sb.sz - c.c), 4) AS jaccard
        |FROM common c
        |JOIN sizes sa ON sa.doc_id = c.a
        |JOIN sizes sb ON sb.doc_id = c.b
        |WHERE round(c.c / (sa.sz + sb.sz - c.c), 4) >= 0.7
        |ORDER BY c.a, c.b""".stripMargin,

    "q_dedup_minhash" ->
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
        |mh AS (
        |  SELECT doc_id, seeds.seed,
        |         min(((37 + 101 * seeds.seed) * h + 13 + 97 * seeds.seed) % 2147483647) AS mh
        |  FROM hx, (SELECT unnest(generate_series(0, 15)) AS seed) seeds
        |  GROUP BY doc_id, seeds.seed),
        |bands AS (
        |  SELECT doc_id, seed // 4 AS band_id,
        |         string_agg(CAST(mh AS VARCHAR), ',' ORDER BY seed) AS sig
        |  FROM mh GROUP BY doc_id, seed // 4)
        |SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        |FROM bands x JOIN bands y
        |  ON x.band_id = y.band_id AND x.sig = y.sig AND x.doc_id < y.doc_id
        |ORDER BY a, b""".stripMargin,

    "q_dedup_minhash_est" ->
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
        |    ON x.band_id = y.band_id AND x.sig = y.sig AND x.doc_id < y.doc_id)
        |SELECT c.a, c.b,
        |       round(CAST(sum(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END) AS DOUBLE) / 16, 4)
        |         AS j_est
        |FROM cands c
        |JOIN mh ma ON ma.doc_id = c.a
        |JOIN mh mb ON mb.doc_id = c.b AND mb.seed = ma.seed
        |GROUP BY c.a, c.b
        |ORDER BY c.a, c.b""".stripMargin,

    "q_dedup_pipeline" ->
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
        |sizes AS (SELECT doc_id, count(*) AS sz FROM hx GROUP BY doc_id),
        |common AS (
        |  SELECT c.a, c.b, count(*) AS cnt FROM cands c
        |  JOIN hx xa ON xa.doc_id = c.a
        |  JOIN hx xb ON xb.doc_id = c.b AND xb.h = xa.h
        |  GROUP BY c.a, c.b),
        |verified AS (
        |  SELECT m.a, m.b FROM common m
        |  JOIN sizes sa ON sa.doc_id = m.a
        |  JOIN sizes sb ON sb.doc_id = m.b
        |  WHERE round(m.cnt / (sa.sz + sb.sz - m.cnt), 4) >= 0.7),
        |neighbors AS (
        |  SELECT a AS doc_id, b AS nb FROM verified
        |  UNION ALL SELECT b, a FROM verified)
        |SELECT c.doc_id, least(c.doc_id, coalesce(min(n.nb), c.doc_id)) AS keep_id
        |FROM (SELECT doc_id FROM corpus) c
        |LEFT JOIN neighbors n ON n.doc_id = c.doc_id
        |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin,

    "q_dedup_simhash" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text FROM documents),
        |tok AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    list_filter(string_split(text, ' '), t -> t != ''))) AS token
        |  FROM corpus),
        |h AS (
        |  SELECT doc_id, ('0x' || substr(md5(token), 1, 8))::BIGINT AS h FROM tok),
        |bits AS (
        |  SELECT doc_id, bs.b, sum(2 * ((h >> bs.b) & 1) - 1) AS s
        |  FROM h, (SELECT unnest(generate_series(0, 31)) AS b) bs
        |  GROUP BY doc_id, bs.b),
        |fps AS (
        |  SELECT doc_id,
        |         CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS fp
        |  FROM bits GROUP BY doc_id)
        |SELECT f.doc_id, f.fp, m.keep_id
        |FROM fps f
        |JOIN (SELECT fp, min(doc_id) AS keep_id FROM fps GROUP BY fp) m
        |  ON f.fp = m.fp
        |ORDER BY f.doc_id""".stripMargin,

    "q_dedup_embed" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |  WHERE vec_id < 500),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)
        |SELECT x.vec_id AS a, y.vec_id AS b,
        |       round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 4) AS cos_r
        |FROM n x JOIN n y ON x.vec_id < y.vec_id
        |ORDER BY cos_r DESC, a, b LIMIT 50""".stripMargin,

    "q_sim_ann" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |cent AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM n WHERE vec_id < 8),
        |assign AS (
        |  SELECT vec_id, v, nrm, cent_id AS cell FROM (
        |    SELECT n.vec_id, n.v, n.nrm, c.cent_id,
        |           row_number() OVER (
        |             PARTITION BY n.vec_id
        |             ORDER BY round(list_dot_product(n.v, c.cv) / (n.nrm * c.cn), 6) DESC,
        |                      c.cent_id) AS rn
        |    FROM n, cent c) t WHERE rn = 1),
        |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn, cell FROM assign
        |      WHERE vec_id < 10),
        |scored AS (
        |  SELECT q.q_id, a.vec_id AS c_id,
        |         round(list_dot_product(q.qv, a.v) / (q.qn * a.nrm), 4) AS cos_r
        |  FROM assign a JOIN q ON a.cell = q.cell AND a.vec_id <> q.q_id),
        |ranked AS (
        |  SELECT q_id, c_id, cos_r,
        |         CAST(row_number() OVER (PARTITION BY q_id
        |                                 ORDER BY cos_r DESC, c_id) AS BIGINT) AS rnk
        |  FROM scored)
        |SELECT q_id, c_id, cos_r, rnk FROM ranked
        |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,

    "q_lang_id" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         list_distinct(list_filter(string_split(text, ' '), x -> x != '')) AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    CAST(len(list_distinct(list_intersect(toks, ['the','a','order','key']))) AS BIGINT)
        |      AS score_p_article,
        |    CAST(len(list_distinct(list_intersect(toks, ['spark','query','table','row']))) AS BIGINT)
        |      AS score_p_query,
        |    CAST(len(list_distinct(list_intersect(toks, ['batch','stream','window','merge']))) AS BIGINT)
        |      AS score_p_stream
        |  FROM t)
        |SELECT doc_id, score_p_article, score_p_query, score_p_stream,
        |  CASE WHEN score_p_stream >= score_p_query AND score_p_stream >= score_p_article
        |         THEN 'p_stream'
        |       WHEN score_p_query >= score_p_article THEN 'p_query'
        |       ELSE 'p_article' END AS predicted
        |FROM s ORDER BY doc_id""".stripMargin,

    "q_lang_id_ngram" ->
      """WITH t AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    generate_series(1, greatest(length(text) - 2, 1)),
        |    i -> substr(text, i, 3))) AS grams
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    CAST(len(list_distinct(list_intersect(grams, ['the','he ',' th','e t']))) AS BIGINT)
        |      AS score_c_the,
        |    CAST(len(list_distinct(list_intersect(grams, ['spa','par','ark','rk ']))) AS BIGINT)
        |      AS score_c_spk,
        |    CAST(len(list_distinct(list_intersect(grams, ['que','uer','ery','ry ']))) AS BIGINT)
        |      AS score_c_qry
        |  FROM t)
        |SELECT doc_id, score_c_the, score_c_spk, score_c_qry,
        |  CASE WHEN score_c_the >= score_c_spk AND score_c_the >= score_c_qry
        |         THEN 'c_the'
        |       WHEN score_c_spk >= score_c_qry THEN 'c_spk'
        |       ELSE 'c_qry' END AS predicted
        |FROM s ORDER BY doc_id""".stripMargin,

    "q_quality_score" ->
      """WITH t AS (
        |  SELECT doc_id, n_chars,
        |         list_filter(string_split(text, ' '), x -> x != '') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, n_chars, len(toks) AS n_tok,
        |         len(list_filter(toks, x -> x = 'the' OR x = 'a')) AS n_stop
        |  FROM t)
        |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
        |       round(n_chars / n_tok, 4) AS avg_tok_len,
        |       round(n_stop / n_tok, 4) AS stop_ratio,
        |       round(least(n_tok / 100.0, 1.0) * (1.0 - n_stop / n_tok), 4) AS quality
        |FROM s ORDER BY doc_id""".stripMargin,

    "q_token_count" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split(text, ' '), t -> t != '')) AS BIGINT) AS n_ws,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_bpe
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_fingerprint" ->
      """SELECT doc_id,
        |  array_to_string(list_sort(list_transform(
        |    list_distinct(list_filter(string_split(text, ' '), t -> t != '')),
        |    t -> md5(t)))[1:4], '-') AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_agg_stats" ->
      """SELECT event_type,
        |       round(stddev_samp(value), 4) AS sd_value,
        |       round(var_samp(value), 4) AS var_value,
        |       round(min(value), 4) AS min_value,
        |       round(max(value), 4) AS max_value
        |FROM events GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin,

    "q_percentile" ->
      """SELECT event_type,
        |       round(quantile_cont(value, 0.5), 4) AS p50,
        |       round(quantile_cont(value, 0.9), 4) AS p90
        |FROM events GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin,

    "q_above_avg" ->
      """SELECT event_id, round(value, 4) AS value_r FROM events
        |WHERE value > (SELECT avg(value) FROM events)
        |ORDER BY event_id""".stripMargin,

    "q_cube" ->
      """SELECT event_type, strftime(ts, '%Y-%m-%d') AS event_date, count(*) AS n
        |FROM events
        |GROUP BY CUBE(event_type, strftime(ts, '%Y-%m-%d'))
        |ORDER BY event_type NULLS FIRST, event_date NULLS FIRST""".stripMargin,

    "q_join_full" ->
      """WITH a AS (
        |  SELECT c_custkey, c_name FROM customer WHERE c_custkey <= 700),
        |b AS (
        |  SELECT o_custkey, count(*) AS n_orders FROM orders
        |  WHERE o_custkey >= 300 GROUP BY o_custkey)
        |SELECT coalesce(c_custkey, o_custkey) AS custkey, c_name, n_orders
        |FROM a FULL OUTER JOIN b ON c_custkey = o_custkey
        |ORDER BY custkey""".stripMargin,

    "q_window_moving" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |       round(avg(value) OVER (
        |         PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS mov_avg
        |FROM events ORDER BY user_id NULLS FIRST, ts_us, event_id""".stripMargin,

    "q_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |         lag(epoch_us(ts), 1) OVER (
        |           PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_ts
        |  FROM events),
        |f AS (
        |  SELECT user_id, event_id, ts_us,
        |         CASE WHEN prev_ts IS NULL OR ts_us - prev_ts > 1800000000
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM g)
        |SELECT user_id, event_id, ts_us,
        |       CAST(sum(new_session) OVER (
        |         PARTITION BY user_id ORDER BY ts_us, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |         AS session_idx
        |FROM f ORDER BY user_id NULLS FIRST, ts_us, event_id""".stripMargin,

    "q_profile" ->
      """SELECT count(*) AS n_rows,
        |  CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_user,
        |  CAST(sum(CASE WHEN props IS NULL OR props = '' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS empty_props,
        |  count(DISTINCT user_id) AS n_users,
        |  count(DISTINCT event_type) AS n_types,
        |  min(epoch_us(ts)) AS min_ts_us, max(epoch_us(ts)) AS max_ts_us,
        |  round(min(value), 4) AS min_value, round(max(value), 4) AS max_value
        |FROM events""".stripMargin,

    "q_pivot" ->
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'error') AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY user_id ORDER BY user_id NULLS FIRST""".stripMargin,

    "q_grouping_sets" ->
      """SELECT event_type, strftime(ts, '%Y-%m-%d') AS event_date, count(*) AS n
        |FROM events
        |GROUP BY GROUPING SETS ((event_type), (strftime(ts, '%Y-%m-%d')))
        |ORDER BY event_type NULLS FIRST, event_date NULLS FIRST""".stripMargin,

    "q_session_window" ->
      """WITH g AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us,
        |         lag(epoch_us(ts), 1) OVER (
        |           PARTITION BY user_id ORDER BY epoch_us(ts)) AS prev_ts
        |  FROM events),
        |f AS (
        |  SELECT user_id, ts_us,
        |         CASE WHEN prev_ts IS NULL OR ts_us - prev_ts >= 1800000000
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM g),
        |s AS (
        |  SELECT user_id, ts_us,
        |         sum(new_session) OVER (
        |           PARTITION BY user_id ORDER BY ts_us
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM f)
        |SELECT user_id,
        |       strftime(make_timestamp(min(ts_us)), '%Y-%m-%d %H:%M:%S') AS sess_start,
        |       strftime(make_timestamp(max(ts_us) + 1800000000), '%Y-%m-%d %H:%M:%S')
        |         AS sess_end,
        |       count(*) AS n
        |FROM s GROUP BY user_id, sess
        |ORDER BY user_id NULLS FIRST, sess_start""".stripMargin,

    "q_media_meta" ->
      """SELECT doc_id AS media_id,
        |  ['image','audio','video'][CAST(doc_id % 3 AS INTEGER) + 1] AS kind,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |  substr(hex(CAST(text AS BLOB)), 1, 16) AS head_hex,
        |  array_to_string(list_transform(generate_series(0, 2),
        |    i -> md5(substr(text, 1 + i * (length(text) // 3), (length(text) // 3)))), '-')
        |    AS frames_sig
        |FROM documents ORDER BY media_id""".stripMargin,

    // Transitive keeper: same LSH→verify pipeline as q_dedup_pipeline but
    // over the prefix-truncated CHAIN corpus, then a recursive CTE for
    // reachability — keep_id = min doc_id in the connected component.
    "q_dedup_cc" ->
      s"""WITH RECURSIVE $ccKeeperCtes
        |SELECT c.doc_id,
        |       least(c.doc_id, coalesce(min(rc.r), c.doc_id)) AS keep_id
        |FROM (SELECT doc_id FROM corpus) c
        |LEFT JOIN reach rc ON rc.doc_id = c.doc_id
        |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin,
    "q_dup_cluster_stats" ->
      s"""WITH RECURSIVE $ccKeeperCtes,
        |keep AS (
        |  SELECT c.doc_id,
        |         least(c.doc_id, coalesce(min(rc.r), c.doc_id)) AS keep_id
        |  FROM (SELECT doc_id FROM corpus) c
        |  LEFT JOIN reach rc ON rc.doc_id = c.doc_id
        |  GROUP BY c.doc_id),
        |sz AS (SELECT keep_id, count(*) AS cluster_size FROM keep GROUP BY keep_id)
        |SELECT cluster_size,
        |       CAST(count(*) AS BIGINT) AS n_clusters,
        |       CAST(cluster_size * count(*) AS BIGINT) AS n_docs
        |FROM sz GROUP BY cluster_size ORDER BY cluster_size""".stripMargin,


    // First-principles expectation for the GA4 nested extraction: the
    // oracle never touches event_params — it re-states, per event_id % 5
    // shape, what last-match-wins extraction over the derived
    // ARRAY<STRUCT> must return (see ga4Frame's shape table).
    "q_ga4_extract" ->
      """SELECT event_id,
        |  CASE
        |    WHEN event_id % 5 IN (1, 4) THEN json_extract_string(props, '$.k')
        |    WHEN event_id % 5 = 2
        |      THEN CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) * 2 AS VARCHAR)
        |    ELSE NULL END AS param_k,
        |  CASE event_id % 5
        |    WHEN 1 THEN 'home' WHEN 3 THEN 'search' WHEN 4 THEN 'cart'
        |    ELSE NULL END AS page
        |FROM events ORDER BY event_id""".stripMargin,

    // The oracle states as-of semantics the direct (quadratic) way:
    // expand all qualifying purchases per click, keep rank 1 by
    // (ts DESC, event_id DESC). The engine's union+window plan must
    // produce exactly this winner.
    "q_asof_join" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
        |  FROM events WHERE user_id IS NOT NULL),
        |c AS (SELECT event_id, user_id, ts_us FROM ev WHERE event_type = 'click'),
        |p AS (SELECT event_id, user_id, ts_us FROM ev WHERE event_type = 'purchase'),
        |j AS (
        |  SELECT c.event_id, c.user_id, c.ts_us,
        |         p.ts_us AS p_ts_us, p.event_id AS p_event_id,
        |         row_number() OVER (PARTITION BY c.event_id
        |                            ORDER BY p.ts_us DESC, p.event_id DESC) AS rn
        |  FROM c LEFT JOIN p ON p.user_id = c.user_id AND p.ts_us <= c.ts_us)
        |SELECT event_id, user_id, ts_us, p_ts_us, p_event_id
        |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "q_range_join" ->
      """WITH win AS (
        |  SELECT CAST(i AS BIGINT) AS win_id,
        |         1704412800000000 + i * 86400000000 AS lo,
        |         1704412800000000 + i * 86400000000 + 129600000000 AS hi
        |  FROM range(20) t(i))
        |SELECT e.event_id, w.win_id, epoch_us(e.ts) AS ts_us
        |FROM events e JOIN win w
        |  ON epoch_us(e.ts) >= w.lo AND epoch_us(e.ts) < w.hi
        |ORDER BY e.event_id, w.win_id""".stripMargin,

    "q_unpivot" ->
      """WITH m AS (
        |  SELECT l_orderkey, l_linenumber, l_partkey,
        |         'discount' AS metric, round(l_discount, 4) AS val
        |  FROM lineitem WHERE l_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, l_partkey,
        |         'extendedprice', round(l_extendedprice, 4)
        |  FROM lineitem WHERE l_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, l_partkey,
        |         'quantity', round(l_quantity, 4)
        |  FROM lineitem WHERE l_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, l_partkey,
        |         'tax', round(l_tax, 4)
        |  FROM lineitem WHERE l_orderkey % 10 = 0)
        |SELECT l_orderkey, l_linenumber, l_partkey, metric, val
        |FROM m ORDER BY l_orderkey, l_linenumber, l_partkey, metric, val""".stripMargin,

    "q_user_paths" ->
      """SELECT user_id, count(*) AS n_events,
        |       string_agg(event_type, '>' ORDER BY epoch_us(ts), event_id) AS path
        |FROM events WHERE user_id IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_pii_mask" ->
      """SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(
        |      substr(text, 1, 120) || ' contact user' || CAST(doc_id AS VARCHAR)
        |        || '@mail.example.com or +1-555-'
        |        || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now',
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+?[0-9][0-9-]{6,}[0-9]', '<PHONE>', 'g') AS masked
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_quality_gopher" ->
      """WITH d AS (
        |  SELECT doc_id, text,
        |         list_filter(string_split(text, ' '), t -> t != '') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, text, toks, len(toks) AS n_words,
        |         CASE WHEN len(toks) >= 2 THEN
        |           list_transform(generate_series(1, len(toks) - 1),
        |             i -> toks[i] || ' ' || toks[i + 1])
        |         ELSE []::VARCHAR[] END AS bg
        |  FROM d),
        |sig AS (
        |  SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
        |    CASE WHEN n_words > 0
        |      THEN round(CAST(length(array_to_string(toks, '')) AS DOUBLE) / n_words, 4)
        |      ELSE 0.0 END AS mean_wlen,
        |    CASE WHEN length(text) > 0
        |      THEN round(CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
        |                 / length(text), 4)
        |      ELSE 0.0 END AS digit_frac,
        |    CASE WHEN len(bg) > 0
        |      THEN round(1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg), 4)
        |      ELSE 0.0 END AS dup_bigram_frac
        |  FROM s)
        |SELECT doc_id, n_words, mean_wlen, digit_frac, dup_bigram_frac,
        |  CAST(CASE WHEN n_words BETWEEN 10 AND 100000
        |             AND mean_wlen BETWEEN 2.0 AND 12.0
        |             AND dup_bigram_frac < 0.3
        |            THEN 1 ELSE 0 END AS BIGINT) AS gopher_ok
        |FROM sig ORDER BY doc_id""".stripMargin,

    "q_pack_sequences" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id // 64 AS shard,
        |         CAST(len(list_filter(string_split(text, ' '), t -> t != '')) AS BIGINT) AS tok_cnt
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, shard, tok_cnt,
        |         sum(tok_cnt) OVER (PARTITION BY shard ORDER BY doc_id
        |                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM d)
        |SELECT doc_id, shard, tok_cnt,
        |       CAST((cum - tok_cnt) // 2048 AS BIGINT) AS seq_id,
        |       CAST((cum - tok_cnt) % 2048 AS BIGINT) AS offset_in
        |FROM c ORDER BY doc_id""".stripMargin,

    "q_shuffle_shard" ->
      """WITH d AS (
        |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS skey FROM documents),
        |s AS (
        |  SELECT doc_id, skey,
        |         ('0x' || substr(skey, 1, 8))::BIGINT % 8 AS shard
        |  FROM d)
        |SELECT doc_id, skey, shard,
        |       CAST(row_number() OVER (PARTITION BY shard ORDER BY skey, doc_id) AS BIGINT) AS rnk
        |FROM s ORDER BY doc_id""".stripMargin,

    "q_levenshtein" ->
      """WITH d AS (SELECT doc_id, substr(text, 1, 40) AS s40 FROM documents)
        |SELECT a.doc_id AS doc_id, CAST(levenshtein(a.s40, b.s40) AS BIGINT) AS dist
        |FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
        |ORDER BY doc_id""".stripMargin,

    "q_dedup_contain" ->
      """WITH base AS (
        |  SELECT doc_id,
        |         list_filter(string_split(text, ' '), t -> t != '') AS toks
        |  FROM documents WHERE doc_id < 500),
        |corpus AS (
        |  SELECT doc_id, array_to_string(toks, ' ') AS text FROM base
        |  UNION ALL
        |  SELECT doc_id + 100000,
        |         array_to_string(toks[1:CAST(ceil(len(toks) * CAST(0.80 AS DOUBLE)) AS INT)], ' ')
        |  FROM base
        |  UNION ALL
        |  SELECT doc_id + 200000,
        |         array_to_string(toks[1:CAST(ceil(len(toks) * CAST(0.64 AS DOUBLE)) AS INT)], ' ')
        |  FROM base),
        |tok AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS toks
        |  FROM corpus),
        |shx AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, greatest(len(toks) - 2, 1)),
        |    i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2])))) AS shingle
        |  FROM tok),
        |hx AS (
        |  SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT % 2147483647 AS h
        |  FROM shx),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM hx GROUP BY doc_id),
        |common AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
        |  FROM hx x JOIN hx y ON x.h = y.h AND x.doc_id < y.doc_id
        |  GROUP BY x.doc_id, y.doc_id)
        |SELECT c.a, c.b,
        |       round(c.c / sa.sz, 4) AS cont_a,
        |       round(c.c / sb.sz, 4) AS cont_b
        |FROM common c
        |JOIN sizes sa ON sa.doc_id = c.a
        |JOIN sizes sb ON sb.doc_id = c.b
        |WHERE round(c.c / sa.sz, 4) >= 0.9 OR round(c.c / sb.sz, 4) >= 0.9
        |ORDER BY c.a, c.b""".stripMargin,

    "q_outliers" ->
      """WITH st AS (
        |  SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sd
        |  FROM events GROUP BY event_type)
        |SELECT e.event_id, e.event_type, round(e.value, 4) AS value_r,
        |       round((e.value - st.mu) / st.sd, 4) AS z_r
        |FROM events e JOIN st USING (event_type)
        |WHERE abs((e.value - st.mu) / st.sd) > 2.5
        |ORDER BY e.event_id""".stripMargin,

    "q_corr" ->
      """WITH d AS (
        |  SELECT event_type, value,
        |         CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k
        |  FROM events)
        |SELECT event_type, count(*) AS n,
        |       round(corr(value, k), 4) AS corr_vk,
        |       round(covar_samp(value, k), 4) AS covar_vk
        |FROM d WHERE k IS NOT NULL
        |GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin,

    "q_retention" ->
      """WITH ev AS (
        |  SELECT user_id,
        |         CAST(floor((epoch_us(ts) - 1704067200000000) / 604800000000.0) AS BIGINT) AS wk
        |  FROM events WHERE user_id IS NOT NULL),
        |cohorts AS (SELECT user_id, min(wk) AS cohort FROM ev GROUP BY user_id),
        |active AS (SELECT DISTINCT user_id, wk FROM ev)
        |SELECT c.cohort, a.wk - c.cohort AS wk_offset,
        |       count(DISTINCT a.user_id) AS n_users
        |FROM active a JOIN cohorts c USING (user_id)
        |GROUP BY c.cohort, a.wk - c.cohort
        |ORDER BY cohort, wk_offset""".stripMargin,

    "q_histogram" ->
      """SELECT CAST(floor(value / 25.0) AS BIGINT) AS bin, count(*) AS n,
        |       round(CAST(floor(value / 25.0) AS BIGINT) * 25.0, 4) AS lo
        |FROM events GROUP BY 1 ORDER BY bin""".stripMargin,

    "q_drift" ->
      """WITH tagged AS (
        |  SELECT event_type,
        |         CASE WHEN epoch_us(ts) < 1704844800000000 THEN 'a'
        |              WHEN epoch_us(ts) < 1705708800000000 THEN 'b' END AS side
        |  FROM events),
        |per_type AS (
        |  SELECT event_type,
        |         CAST(sum(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |         CAST(sum(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |  FROM tagged WHERE side IS NOT NULL GROUP BY event_type),
        |tot AS (
        |  SELECT CAST(sum(n_a) AS DOUBLE) AS ta, CAST(sum(n_b) AS DOUBLE) AS tb
        |  FROM per_type)
        |SELECT event_type, n_a, n_b,
        |       round(n_a / tot.ta, 4) AS share_a,
        |       round(n_b / tot.tb, 4) AS share_b,
        |       round(abs(n_a / tot.ta - n_b / tot.tb), 4) AS drift
        |FROM per_type, tot
        |ORDER BY event_type NULLS FIRST""".stripMargin,

    "q_tfidf" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t != '')) AS token
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
        |idf AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
        |n AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.token, tf.tf, idf.df,
        |         round(tf.tf * ln(n.n_docs / idf.df), 4) AS tfidf
        |  FROM tf JOIN idf USING (token), n),
        |ranked AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
        |                    ORDER BY tfidf DESC, token ASC) AS BIGINT) AS rnk
        |  FROM scored)
        |SELECT doc_id, token, tf, df, tfidf, rnk FROM ranked
        |WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,

    "q_unigram_logprob" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t != '')) AS token
        |  FROM documents),
        |tf AS (SELECT token, count(*) AS freq FROM tok GROUP BY token),
        |tot AS (SELECT CAST(sum(freq) AS DOUBLE) AS total FROM tf)
        |SELECT t.doc_id,
        |       count(*) AS n_toks,
        |       round(avg(ln(tf.freq / tot.total)), 4) AS logprob
        |FROM tok t JOIN tf USING (token), tot
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,

    // The relational funnel definition: min eligible timestamp per
    // step, each step restricted to strictly-after the previous — one
    // aggregation per step (the form whose equivalence with the
    // engine's single-pass fold is the point of the check).
    "q_funnel" ->
      """WITH u AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_type
        |  FROM events WHERE user_id IS NOT NULL),
        |s1 AS (
        |  SELECT user_id, min(ts_us) AS t1 FROM u
        |  WHERE event_type = 'click' GROUP BY user_id),
        |s2 AS (
        |  SELECT u.user_id, min(u.ts_us) AS t2 FROM u
        |  JOIN s1 USING (user_id)
        |  WHERE u.event_type = 'view' AND u.ts_us > s1.t1 GROUP BY u.user_id),
        |s3 AS (
        |  SELECT u.user_id, min(u.ts_us) AS t3 FROM u
        |  JOIN s2 USING (user_id)
        |  WHERE u.event_type = 'purchase' AND u.ts_us > s2.t2 GROUP BY u.user_id)
        |SELECT b.user_id, s1.t1, s2.t2, s3.t3,
        |       CAST(CASE WHEN s1.user_id IS NULL THEN 0 ELSE 1 END
        |          + CASE WHEN s2.user_id IS NULL THEN 0 ELSE 1 END
        |          + CASE WHEN s3.user_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS stages
        |FROM (SELECT DISTINCT user_id FROM u) b
        |LEFT JOIN s1 USING (user_id)
        |LEFT JOIN s2 USING (user_id)
        |LEFT JOIN s3 USING (user_id)
        |ORDER BY user_id""".stripMargin,

    // Every stage restated: dedup window, the Gopher expressions, the
    // hash-threshold draw, and the per-shard packing sums.
    "q_corpus_pipeline" ->
      """WITH dedup AS (
        |  SELECT doc_id, text, lang FROM (
        |    SELECT doc_id, text, lang,
        |           row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |    FROM documents) t WHERE rn = 1),
        |tok AS (
        |  SELECT doc_id, text, lang,
        |         list_filter(string_split(text, ' '), t -> t != '') AS toks
        |  FROM dedup),
        |sig AS (
        |  SELECT doc_id, lang, toks, len(toks) AS n_words,
        |         CASE WHEN len(toks) >= 2 THEN
        |           list_transform(generate_series(1, len(toks) - 1),
        |             i -> toks[i] || ' ' || toks[i + 1])
        |         ELSE []::VARCHAR[] END AS bg,
        |         text
        |  FROM tok),
        |gate AS (
        |  SELECT doc_id, lang, toks FROM sig
        |  WHERE n_words BETWEEN 10 AND 100000
        |    AND (CASE WHEN n_words > 0
        |          THEN round(CAST(length(array_to_string(toks, '')) AS DOUBLE) / n_words, 4)
        |          ELSE 0.0 END) BETWEEN 2.0 AND 12.0
        |    AND (CASE WHEN len(bg) > 0
        |          THEN round(1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg), 4)
        |          ELSE 0.0 END) < 0.3),
        |samp AS (
        |  SELECT doc_id, lang, toks FROM gate
        |  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 8))::BIGINT
        |          / 4294967296.0
        |        < CAST(CASE lang WHEN 'en' THEN 1.0 WHEN 'de' THEN 0.5
        |                         WHEN 'fr' THEN 0.25 WHEN 'es' THEN 0.1
        |                         ELSE 0.0 END AS DOUBLE)),
        |cnt AS (
        |  SELECT doc_id, lang, doc_id // 64 AS shard,
        |         CAST(len(toks) AS BIGINT) AS tok_cnt
        |  FROM samp),
        |cum AS (
        |  SELECT *, sum(tok_cnt) OVER (PARTITION BY shard ORDER BY doc_id
        |                               ROWS UNBOUNDED PRECEDING) AS c
        |  FROM cnt)
        |SELECT doc_id, shard, tok_cnt,
        |       CAST((c - tok_cnt) // 2048 AS BIGINT) AS seq_id,
        |       CAST((c - tok_cnt) % 2048 AS BIGINT) AS offset_in,
        |       lang
        |FROM cum ORDER BY doc_id""".stripMargin,

    "q_decontaminate" ->
      """WITH bench AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
        |train AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text || ' zz9 zz9' FROM bench),
        |ttok AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS toks
        |  FROM train),
        |tsh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, greatest(len(toks) - 2, 1)),
        |    i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2])))) AS shingle
        |  FROM ttok),
        |th AS (
        |  SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT % 2147483647 AS h
        |  FROM tsh),
        |btok AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS toks
        |  FROM bench),
        |bsh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, greatest(len(toks) - 2, 1)),
        |    i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2])))) AS shingle
        |  FROM btok),
        |bh AS (
        |  SELECT DISTINCT ('0x' || substr(md5(shingle), 1, 8))::BIGINT % 2147483647 AS h
        |  FROM bsh),
        |shared AS (
        |  SELECT t.doc_id, count(*) AS n_shared
        |  FROM th t JOIN bh USING (h) GROUP BY t.doc_id)
        |SELECT tr.doc_id,
        |       CAST(coalesce(s.n_shared, 0) AS BIGINT) AS n_shared,
        |       CAST(CASE WHEN coalesce(s.n_shared, 0) >= 5 THEN 1 ELSE 0 END AS BIGINT)
        |         AS contaminated
        |FROM train tr LEFT JOIN shared s USING (doc_id)
        |ORDER BY tr.doc_id""".stripMargin,

    "q_sample_weighted" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 8))::BIGINT
        |           / 4294967296.0 AS u,
        |         CAST(CASE lang WHEN 'en' THEN 1.0 WHEN 'de' THEN 0.5
        |                        WHEN 'fr' THEN 0.25 WHEN 'es' THEN 0.1
        |                        ELSE 0.0 END AS DOUBLE) AS w
        |  FROM documents)
        |SELECT doc_id, lang, round(u, 6) AS u_r
        |FROM d WHERE u < w ORDER BY doc_id""".stripMargin,

    "q_window_range" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |       round(sum(value) OVER (
        |         PARTITION BY user_id ORDER BY epoch_us(ts)
        |         RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW), 4) AS hour_sum
        |FROM events
        |ORDER BY user_id NULLS FIRST, ts_us, event_id""".stripMargin,

    // arg-extrema stated via rank windows (portable form of
    // max_by/min_by with the same lexicographic tie-break)
    "q_argmax" ->
      """WITH r AS (
        |  SELECT event_type, event_id, value,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY value DESC, event_id DESC) AS rmax,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY value ASC, event_id ASC) AS rmin
        |  FROM events)
        |SELECT event_type,
        |       max(CASE WHEN rmax = 1 THEN event_id END) AS max_event_id,
        |       min(CASE WHEN rmin = 1 THEN event_id END) AS min_event_id,
        |       round(max(value), 4) AS max_value
        |FROM r GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin,

    // Like q_sink_csv, the oracle restates the EXPECTED round-trip
    // content from the source table — an independent check that the
    // JSON write+read is lossless.
    "q_sink_json" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type,
        |       round(value, 4) AS value_r
        |FROM events ORDER BY event_id""".stripMargin,

    "q_sink_orc" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type,
        |       round(value, 4) AS value_r
        |FROM events ORDER BY event_id""".stripMargin,

    "q_sink_xml" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type,
        |       round(value, 4) AS value_r
        |FROM events ORDER BY event_id""".stripMargin,
  )
}
