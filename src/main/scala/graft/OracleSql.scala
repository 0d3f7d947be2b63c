package graft

/**
 * DuckDB parity SQL for every entry in [[SparkEntry.queries]] (driver runs
 * these over views named after the parquet tables). Column names, types,
 * ordering, and rounding are aligned with the Spark plans.
 */
object OracleSql {

  // Shared fragments. Tokenization mirrors the JVM kernels exactly: split
  // on RUNS of whitespace and drop empty tokens, so multi-space/tab/empty
  // documents produce the same token stream as Spark's `\s+` split (a
  // single-space string_split would vote phantom '' tokens into hashes).
  // The whitespace class is spelled out rather than written `\s` because
  // the two regex engines disagree on it: Java's `\s` (the Spark side) is
  // exactly [ \t\n\x0B\f\r], DuckDB's RE2 `\s` excludes vertical tab
  // 0x0B — a document containing a vertical tab would tokenize
  // differently engine-vs-oracle under `\s+` on both sides.
  private val words =
    """list_filter(regexp_split_to_array(lower(trim(text)), '[ \t\n\x0b\f\r]+'), t -> t <> '')"""
  private val stops = "('the','a','an','of','and','to','in','is','it','for')"

  /** Shared by x_boilerplate_scrub (full corpus) and
    * x_boilerplate_incremental (the SAME global semantics restricted to
    * the batch slice — the LineStore incremental-equality law): df over
    * the WHOLE corpus either way. */
  private def boilerplateScrubSql(finalWhere: String): String =
    s"""WITH t AS (SELECT doc_id,
       |    'home | about | ' || source || chr(10) ||
       |    regexp_replace(text, ' value ', '.' || chr(10), 'g') || chr(10) ||
       |    '(c) 2024 ' || source || ' all rights reserved' AS text FROM documents),
       |l AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM t),
       |d AS (SELECT DISTINCT doc_id, trim(line) kl FROM l WHERE trim(line) <> ''),
       |f AS (SELECT kl FROM d GROUP BY kl HAVING count(*) >= 5),
       |fl AS (SELECT coalesce(list(kl), []) ks FROM f)
       |SELECT t.doc_id,
       |  CAST(len(list_filter(string_split(t.text, chr(10)),
       |    x -> trim(x) <> '')) AS INTEGER) AS n_lines,
       |  CAST(len(list_filter(string_split(t.text, chr(10)),
       |    x -> trim(x) <> '' AND NOT list_contains(fl.ks, trim(x)))) AS INTEGER) AS n_kept,
       |  array_to_string(list_filter(string_split(t.text, chr(10)),
       |    x -> trim(x) = '' OR NOT list_contains(fl.ks, trim(x))), chr(10)) AS text
       |FROM t CROSS JOIN fl $finalWhere ORDER BY doc_id""".stripMargin

  /** Shared by x_bigram_ppl and x_bigram_ppl_store (the stored model
    * must be indistinguishable from the in-memory one). */
  private lazy val bigramPplSql =
    s"""WITH w AS (SELECT doc_id, $words t FROM documents),
        |ref AS (SELECT t FROM w WHERE doc_id % 2 = 0),
        |uc AS (SELECT token, count(*) c FROM
        |  (SELECT unnest(t) token FROM ref) GROUP BY 1),
        |tot AS (SELECT sum(c) n, count(*) v FROM uc),
        |bc AS (SELECT w1, w2, count(*) c2 FROM
        |  (SELECT z[1] w1, z[2] w2 FROM
        |    (SELECT unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) z FROM ref))
        |  GROUP BY 1, 2),
        |dpp AS (SELECT doc_id, z[1] w1, z[2] w2 FROM
        |  (SELECT doc_id, unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) z FROM w)),
        |sc AS (SELECT dpp.doc_id, count(*) n_pairs,
        |  -sum(ln(0.7 * (CASE WHEN u1.c IS NULL THEN 0.0
        |                 ELSE coalesce(bc.c2, 0)::DOUBLE / u1.c END)
        |        + 0.3 * (coalesce(u2.c, 0) + 1)::DOUBLE /
        |          ((SELECT n + v FROM tot)))) / count(*) ce
        |  FROM dpp LEFT JOIN bc USING (w1, w2)
        |  LEFT JOIN uc u1 ON u1.token = dpp.w1
        |  LEFT JOIN uc u2 ON u2.token = dpp.w2
        |  GROUP BY dpp.doc_id)
        |SELECT w.doc_id, coalesce(sc.n_pairs, 0) AS n_pairs,
        |  round(coalesce(sc.ce, 0.0), 6) AS cross_entropy,
        |  coalesce(round(sc.ce, 6) < 3.41, false) AS keep
        |FROM w LEFT JOIN sc USING (doc_id)
        |ORDER BY w.doc_id""".stripMargin

  /** Unrolled BPE training chain, shared by x_bpe_merges / x_bpe_encode:
    * d0 = word dict as DOUBLE-space-delimited char sequences (the merge
    * pattern keeps one delimiter space per side, so adjacent occurrences
    * never share a consumed character — plain `replace` is exactly the
    * token-level greedy merge); stage i counts adjacent symbol pairs
    * (frequency-weighted), argmaxes (count desc, pair asc) into b{i},
    * and applies the merge into d{i}. `wrd` (the original word) rides
    * every stage so the final dict doubles as the encode map. */
  private def bpeCtes(m: Int): String = {
    def stage(i: Int) =
      s"""p$i AS (SELECT l, r, sum(f) cnt FROM (
         |   SELECT syms[j] l, syms[j+1] r, f FROM
         |     (SELECT list_filter(string_split(trim(w), ' '), x -> x <> '') syms, f
         |      FROM d${i - 1}) s,
         |     unnest(generate_series(1, len(s.syms) - 1)) t(j)) GROUP BY 1, 2),
         |b$i AS (SELECT l, r, CAST(cnt AS BIGINT) cnt FROM p$i
         |  ORDER BY cnt DESC, l, r LIMIT 1),
         |d$i AS (SELECT d.wrd,
         |  CASE WHEN b.l IS NULL THEN d.w
         |       ELSE replace(d.w, ' '||b.l||'  '||b.r||' ', ' '||b.l||b.r||' ') END w, d.f
         |  FROM d${i - 1} d LEFT JOIN b$i b ON TRUE)""".stripMargin
    s"""w0 AS (SELECT doc_id, $words wds FROM documents),
       |dict AS (SELECT w2 wrd, count(*) f FROM (SELECT unnest(wds) w2 FROM w0) GROUP BY 1),
       |d0 AS (SELECT wrd, '  ' || array_to_string(string_split_regex(wrd, ''), '  ') || '  ' w, f
       |  FROM dict),
       |${(1 to m).map(stage).mkString(",\n")}""".stripMargin
  }

  /** Shared by x_bpe_encode and x_bpe_encode_stored (train-store-encode
    * over the training corpus is pointwise identical to direct encode). */
  private val bpeEncodeSql =
    s"""WITH ${bpeCtes(8)},
       |nt AS (SELECT wrd, len(list_filter(string_split(trim(w), ' '), x -> x <> '')) n
       |  FROM d8),
       |t AS (SELECT doc_id, unnest(wds) wrd FROM w0)
       |SELECT d.doc_id, CAST(count(t.wrd) AS BIGINT) n_words,
       |  CAST(coalesce(sum(nt.n), 0) AS BIGINT) n_bpe_tokens
       |FROM documents d
       |LEFT JOIN t ON t.doc_id = d.doc_id
       |LEFT JOIN nt ON nt.wrd = t.wrd
       |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin

  /** Per-language fertility under the same 8-merge chain: the
    * multilingual tokenizer-eval metric (BPE tokens per word — a vocab
    * trained on mixed text over-segments the languages it under-saw). */
  private val tokenizerFertilitySql =
    s"""WITH ${bpeCtes(8)},
       |nt AS (SELECT wrd, len(list_filter(string_split(trim(w), ' '), x -> x <> '')) n
       |  FROM d8),
       |t AS (SELECT doc_id, unnest(wds) wrd FROM w0),
       |per AS (SELECT d.doc_id, count(t.wrd) nw, coalesce(sum(nt.n), 0) nb
       |  FROM documents d
       |  LEFT JOIN t ON t.doc_id = d.doc_id
       |  LEFT JOIN nt ON nt.wrd = t.wrd
       |  GROUP BY d.doc_id)
       |SELECT dd.lang, CAST(sum(per.nw) AS BIGINT) AS n_words,
       |  CAST(sum(per.nb) AS BIGINT) AS n_bpe_tokens,
       |  round(sum(per.nb)::DOUBLE / sum(per.nw), 6) AS fertility
       |FROM per JOIN documents dd ON dd.doc_id = per.doc_id
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // Shared Gopher CTE chain over a source relation exposing
  // (doc_id, text, wds): per-doc line/paragraph repetition + char
  // fractions, bullet/ellipsis/symbol/mean-word-length signals (`gst`)
  // and the modal 2/3/4-gram fractions (`gp`). One definition for every
  // oracle that replays CurationOps.gopherStats, so the operating points
  // cannot drift between them.
  private def gopherCtes(src: String): String =
    s"""gl AS (SELECT doc_id, text,
      |    list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)), x -> x <> '') ls,
      |    list_filter(list_transform(regexp_split_to_array(text, '\\n[ \\t]*\\n'), x -> trim(x)), x -> x <> '') ps,
      |    wds FROM $src),
      |gst AS (SELECT doc_id, wds,
      |    length(array_to_string(wds, ' ')) dl,
      |    CASE WHEN len(ls) > 0 THEN 1.0 - len(list_distinct(ls))::DOUBLE / len(ls) ELSE 0.0 END dlf,
      |    CASE WHEN len(ps) > 0 THEN 1.0 - len(list_distinct(ps))::DOUBLE / len(ps) ELSE 0.0 END dpf,
      |    CASE WHEN coalesce(list_sum(list_transform(ls, x -> len(x))), 0) > 0
      |         THEN 1.0 - list_sum(list_transform(list_distinct(ls), x -> len(x)))::DOUBLE / list_sum(list_transform(ls, x -> len(x)))
      |         ELSE 0.0 END dlcf,
      |    CASE WHEN coalesce(list_sum(list_transform(ps, x -> len(x))), 0) > 0
      |         THEN 1.0 - list_sum(list_transform(list_distinct(ps), x -> len(x)))::DOUBLE / list_sum(list_transform(ps, x -> len(x)))
      |         ELSE 0.0 END dpcf,
      |    CASE WHEN len(ls) > 0 THEN len(list_filter(ls, x -> regexp_matches(x, '^[-*•]')))::DOUBLE / len(ls) ELSE 0.0 END blf,
      |    CASE WHEN len(ls) > 0 THEN len(list_filter(ls, x -> regexp_matches(x, '(\\.\\.\\.|…)$$')))::DOUBLE / len(ls) ELSE 0.0 END elf,
      |    CASE WHEN len(wds) > 0 THEN list_sum(list_transform(wds, x -> len(x)))::DOUBLE / len(wds) ELSE 0.0 END mwl,
      |    CASE WHEN len(wds) > 0 THEN (len(regexp_extract_all(text, '#')) + len(regexp_extract_all(text, '\\.\\.\\.')) + len(regexp_extract_all(text, '…')))::DOUBLE / len(wds) ELSE 0.0 END swr,
      |    CAST(len(wds) AS INTEGER) nw,
      |    CASE WHEN len(wds) > 0 THEN len(list_filter(wds, x -> regexp_matches(x, '[a-z]')))::DOUBLE / len(wds) ELSE 0.0 END awf,
      |    CAST(len(list_filter(wds, x -> x IN $stops)) AS INTEGER) nsh
      |  FROM gl),
      |ge AS (SELECT doc_id, 2 AS n, unnest(list_transform(generate_series(1, greatest(len(wds) - 1, 0)), i -> array_to_string(wds[i:i+1], ' '))) g FROM gst
      |  UNION ALL SELECT doc_id, 3, unnest(list_transform(generate_series(1, greatest(len(wds) - 2, 0)), i -> array_to_string(wds[i:i+2], ' '))) FROM gst
      |  UNION ALL SELECT doc_id, 4, unnest(list_transform(generate_series(1, greatest(len(wds) - 3, 0)), i -> array_to_string(wds[i:i+3], ' '))) FROM gst),
      |gc AS (SELECT doc_id, n, g, count(*) cnt FROM ge GROUP BY 1, 2, 3),
      |gm AS (SELECT gc.doc_id, gc.n,
      |    CASE WHEN gs.dl > 0
      |         THEN coalesce(max(CASE WHEN gc.cnt >= 2
      |                THEN gc.cnt * length(gc.g) END), 0)::DOUBLE / gs.dl
      |         ELSE 0.0 END f
      |  FROM gc JOIN gst gs ON gs.doc_id = gc.doc_id
      |  GROUP BY gc.doc_id, gc.n, gs.dl),
      |gp AS (SELECT doc_id,
      |    coalesce(max(CASE WHEN n = 2 THEN f END), 0.0) t2,
      |    coalesce(max(CASE WHEN n = 3 THEN f END), 0.0) t3,
      |    coalesce(max(CASE WHEN n = 4 THEN f END), 0.0) t4
      |  FROM gm GROUP BY doc_id)""".stripMargin

  private val gopherKeepSql =
    """(dlf < 0.30 AND dpf < 0.30 AND dlcf < 0.20 AND dpcf < 0.20
      |   AND coalesce(t2, 0.0) < 0.20 AND coalesce(t3, 0.0) < 0.18
      |   AND coalesce(t4, 0.0) < 0.16 AND swr < 0.10 AND blf < 0.90
      |   AND elf < 0.30 AND mwl >= 3.0 AND mwl <= 10.0
      |   AND nw >= 50 AND nw <= 100000 AND awf >= 0.8 AND nsh >= 2)""".stripMargin

  // Shared MinHash/LSH candidate chain over `documents` (shingle width 3,
  // k = 4 salted-md5 mins, 4 bands of one hash): signatures (`lsig`),
  // candidate pairs (`cand`), distinct-shingle memberships (`lm`), sizes
  // (`lsz`) and pair intersections (`li`) — one definition for every
  // oracle that replays the LSH stack.
  private val lshCandCtes: String =
    s"""lw AS (SELECT doc_id, $words wds FROM documents),
      |lsh0 AS (SELECT doc_id, CASE WHEN len(wds) < 3 THEN CAST([] AS VARCHAR[])
      |  ELSE list_transform(generate_series(1, len(wds) - 2), i -> array_to_string(wds[i:i+2], ' ')) END s
      |  FROM lw),
      |lsig AS (SELECT doc_id, [
      |  list_min(list_transform(s, x -> md5('0|' || x))),
      |  list_min(list_transform(s, x -> md5('1|' || x))),
      |  list_min(list_transform(s, x -> md5('2|' || x))),
      |  list_min(list_transform(s, x -> md5('3|' || x)))] sg FROM lsh0),
      |lb AS (SELECT doc_id, generate_subscripts(sg, 1) band, unnest(sg) bv FROM lsig),
      |cand AS (SELECT DISTINCT a.doc_id ia, c.doc_id ib
      |  FROM lb a JOIN lb c ON a.band = c.band AND a.bv = c.bv AND a.doc_id < c.doc_id),
      |lm AS (SELECT doc_id, unnest(list_distinct(s)) sh FROM lsh0),
      |lsz AS (SELECT doc_id, count(*) n FROM lm GROUP BY doc_id),
      |li AS (SELECT a.doc_id ia, b2.doc_id ib, count(*) inter
      |  FROM lm a JOIN lm b2 ON a.sh = b2.sh AND a.doc_id < b2.doc_id GROUP BY 1, 2)""".stripMargin

  // Shared CDC boundary pipeline (window 8, mask 31, B=257, M=1048573):
  // per-window closed-form hash == the JVM kernel's rolling recurrence.
  // Exposes `b(doc_id, text, n, ends BIGINT[])` with the final chunk
  // always closed at n.
  private val cdcCtes = {
    val powers = Iterator.iterate(1L)(p => p * 257L % 1048573L).take(8).toSeq
    s"""WITH base AS (SELECT doc_id, text, length(text) AS n FROM documents),
       |cp AS (SELECT bb.doc_id, CAST(t.i AS BIGINT) AS i,
       |         unicode(substring(bb.text, CAST(t.i AS INT), 1)) AS c
       |       FROM base bb, unnest(generate_series(1, bb.n)) AS t(i)),
       |hits AS (
       |  SELECT e.doc_id, e.i AS pos
       |  FROM cp e JOIN cp s ON s.doc_id = e.doc_id AND s.i BETWEEN e.i - 7 AND e.i
       |  WHERE e.i >= 8
       |  GROUP BY e.doc_id, e.i
       |  HAVING CAST(sum(s.c * ([${powers.mkString(",")}])[CAST(e.i - s.i + 1 AS INT)]) % 1048573 AS BIGINT) & 31 = 0),
       |agg AS (SELECT doc_id, list(pos ORDER BY pos) AS hs FROM hits GROUP BY doc_id),
       |b AS (SELECT b0.doc_id, b0.text, b0.n,
       |        CASE WHEN b0.n = 0 THEN CAST([] AS BIGINT[])
       |             WHEN a.hs IS NULL THEN [b0.n]
       |             WHEN a.hs[-1] = b0.n THEN a.hs
       |             ELSE list_append(a.hs, b0.n) END AS ends
       |      FROM base b0 LEFT JOIN agg a ON a.doc_id = b0.doc_id)""".stripMargin
  }

  /** The 3-gram-Jaccard duplicate-component closure — shared by
    * x_dup_components (min-id component labels) and x_dup_rep_quality
    * (quality-argmax representative over the same components). Exposes
    * `c(id, component)`; docs in no pair are absent (callers coalesce
    * to the doc's own id). */
  /** The UniMax(cap 3 epochs, budget 1.5x tokens) plan + per-doc
    * expansion counts — shared by x_epoch_expand and pipe_mix_e2e.
    * Exposes `cnt(doc_id, lang, ntok, n)`: n = floor(e) + fractional
    * digest draw ('ee|' salt), ntok = the doc's token count. */
  private lazy val epochExpandCtes: String =
    s"""WITH w AS (SELECT lang, CAST(sum(len($words)) AS DOUBLE) nt
      |      FROM documents GROUP BY 1),
      |tot AS (SELECT 1.5 * sum(nt) b, count(*) n FROM w),
      |s AS (SELECT lang, nt, nt * 3.0 cap,
      |        row_number() OVER (ORDER BY nt * 3.0, lang) i,
      |        coalesce(sum(nt * 3.0) OVER (ORDER BY nt * 3.0, lang
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) p
      |      FROM w),
      |lv AS (SELECT s.*, (tot.b - s.p) / (tot.n - s.i + 1) lvl FROM s, tot),
      |el AS (SELECT coalesce(max(lvl) FILTER (WHERE cap > lvl), 1e308) ell FROM lv),
      |r AS (SELECT lang, round(least(cap, ell) / nt, 6) e FROM lv, el),
      |docn AS (SELECT doc_id, lang, CAST(len($words) AS BIGINT) ntok FROM documents),
      |cnt AS (SELECT d.doc_id, d.lang, d.ntok,
      |          CAST(floor(e) AS BIGINT) +
      |          (CASE WHEN md5_number_lower('ee|' || CAST(d.doc_id AS VARCHAR)) % 1000000
      |                  < CAST(floor((e - floor(e)) * 1000000) AS BIGINT)
      |            THEN 1 ELSE 0 END) n
      |        FROM docn d JOIN r ON d.lang = r.lang)""".stripMargin

  private lazy val dupComponentCtes: String =
    s"""WITH RECURSIVE w AS (SELECT doc_id, $words wds FROM documents),
       |sh AS (SELECT doc_id, list_distinct(CASE WHEN len(wds) < 3 THEN CAST([] AS VARCHAR[])
       |  ELSE list_transform(generate_series(1, len(wds) - 2), i -> array_to_string(wds[i:i+2], ' ')) END) s
       |  FROM w),
       |m AS (SELECT doc_id, unnest(s) sh FROM sh),
       |sz AS (SELECT doc_id, count(*) n FROM m GROUP BY doc_id),
       |i AS (SELECT a.doc_id ia, b.doc_id ib, count(*) inter
       |        FROM m a JOIN m b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
       |p AS (SELECT ia, ib FROM i JOIN sz x ON x.doc_id = ia JOIN sz y ON y.doc_id = ib
       |        WHERE inter::DOUBLE / (x.n + y.n - inter) >= 0.02),
       |e AS (SELECT ia s, ib d FROM p UNION SELECT ib, ia FROM p),
       |r AS (SELECT s AS id, s AS lbl FROM e
       |      UNION
       |      SELECT e.d, r.lbl FROM r JOIN e ON e.s = r.id),
       |c AS (SELECT id, min(lbl) component FROM r GROUP BY id)""".stripMargin

  /** The RRF hybrid replay chain — shared by x_hybrid_rrf (in-memory
    * fusion) and x_hybrid_stored (persisted Hybrid.search at
    * nprobe = nlist, spec-pinned equal). */
  private lazy val hybridRrfSql: String =
    s"""WITH tokd AS (SELECT doc_id, $words AS t FROM documents),
        |tf AS (SELECT doc_id, dl, term, count(*) tf FROM
        |         (SELECT doc_id, len(t) dl, unnest(t) term FROM tokd)
        |       GROUP BY 1, 2, 3),
        |dfr AS (SELECT term, count(*) df FROM tf GROUP BY 1),
        |st AS (SELECT count(*) n_docs, avg(len(t)) avgdl FROM tokd),
        |qt AS (SELECT DISTINCT qid, term FROM
        |         (SELECT doc_id qid, unnest(t[1:5]) term FROM tokd
        |          WHERE doc_id % 97 = 0)),
        |sc AS (SELECT qt.qid query_id, tf.doc_id,
        |         sum(ln(1 + (st.n_docs - dfr.df + 0.5) / (dfr.df + 0.5))
        |             * tf.tf * 2.2
        |             / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / st.avgdl))) score
        |       FROM qt JOIN tf ON tf.term = qt.term
        |         JOIN dfr ON dfr.term = qt.term CROSS JOIN st
        |       GROUP BY 1, 2),
        |bm AS (SELECT query_id, doc_id, rn rank FROM
        |         (SELECT query_id, doc_id,
        |            row_number() OVER (PARTITION BY query_id
        |              ORDER BY round(score, 6) DESC, doc_id) rn FROM sc)
        |       WHERE rn <= 20),
        |q AS (SELECT vec_id qid, embedding qe FROM embeddings WHERE vec_id % 97 = 0),
        |p AS (SELECT qid, c.vec_id nid, qe, c.embedding ce FROM q CROSS JOIN embeddings c),
        |u AS (SELECT qid, nid, unnest(qe)::DOUBLE x, unnest(ce)::DOUBLE y FROM p),
        |s2 AS (SELECT qid, nid, sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))) sim
        |         FROM u GROUP BY qid, nid),
        |kn AS (SELECT qid query_id, nid doc_id, rn rank FROM
        |         (SELECT qid, nid,
        |            row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) rn
        |          FROM s2)
        |       WHERE rn <= 20),
        |allr AS (SELECT * FROM bm UNION ALL SELECT * FROM kn),
        |f AS (SELECT query_id, doc_id, sum(1.0 / (60 + rank)) score
        |      FROM allr GROUP BY 1, 2),
        |fr AS (SELECT query_id, doc_id, round(score, 6) score,
        |         row_number() OVER (PARTITION BY query_id
        |           ORDER BY round(score, 6) DESC, doc_id) rn FROM f)
        |SELECT query_id, doc_id, score, CAST(rn AS INTEGER) AS rank
        |FROM fr WHERE rn <= 10 ORDER BY query_id, rank""".stripMargin

  /** The incremental-SemDeDup replay chain — shared by
    * x_semdedup_incremental (in-memory corpus) and x_semdedup_store
    * (persisted cluster-laid-out corpus, bucket-pruned probe): same
    * deterministic per-label centroids, spec-pinned probe ≡
    * incremental. */
  private lazy val semDedupIncSql: String =
    """WITH u AS (SELECT label, generate_subscripts(embedding, 1) pos, unnest(embedding)::DOUBLE x
        |             FROM embeddings WHERE vec_id % 5 <> 0),
        |cent AS (SELECT label clabel, pos, avg(x) m FROM u GROUP BY 1, 2),
        |ev AS (SELECT vec_id, generate_subscripts(embedding, 1) pos, unnest(embedding)::DOUBLE x
        |         FROM embeddings),
        |s AS (SELECT vec_id, clabel,
        |        sum(ev.x * cent.m) / (sqrt(sum(ev.x * ev.x)) * sqrt(sum(cent.m * cent.m))) sim
        |      FROM ev JOIN cent ON ev.pos = cent.pos GROUP BY vec_id, clabel),
        |r AS (SELECT vec_id, clabel, sim,
        |        row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, clabel) rn FROM s),
        |asg AS (SELECT vec_id, clabel cl, sim csim, round(sim, 6) ord FROM r WHERE rn = 1),
        |p AS (SELECT xa.vec_id ia, xb.vec_id ib, ea.embedding va, eb.embedding vb
        |        FROM asg xa JOIN asg xb ON xa.cl = xb.cl
        |         AND xb.vec_id % 5 = 0
        |         AND (xa.vec_id % 5 <> 0
        |              OR xa.ord < xb.ord
        |              OR (xa.ord = xb.ord AND xa.vec_id < xb.vec_id))
        |        JOIN embeddings ea ON ea.vec_id = xa.vec_id
        |        JOIN embeddings eb ON eb.vec_id = xb.vec_id),
        |pu AS (SELECT ia, ib, unnest(va)::DOUBLE x, unnest(vb)::DOUBLE y FROM p),
        |ps AS (SELECT ia, ib, sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))) sim
        |         FROM pu GROUP BY ia, ib),
        |drp AS (SELECT DISTINCT ib vec_id FROM ps WHERE sim >= 0.3)
        |SELECT a.vec_id, CAST(a.cl AS BIGINT) AS cluster_id,
        |  round(a.csim, 6) AS centroid_sim, (d.vec_id IS NULL) AS kept
        |FROM asg a LEFT JOIN drp d USING (vec_id)
        |WHERE a.vec_id % 5 = 0
        |ORDER BY a.vec_id""".stripMargin

  val all: Map[String, String] = Map(
    // The RSS round-trip: escape → build feed → split → XPath-extract
    // inverts construction, so the expected output is the raw fields.
    "s1_rss_parse" ->
      """SELECT source, 'd' || doc_id AS title,
        |  'https://' || source || '/' || doc_id AS link,
        |  coalesce(text, '') AS description
        |FROM documents ORDER BY source, title""".stripMargin,

    "p10_event_score" ->
      """SELECT event_id, event_type,
        |  CAST(CASE event_type WHEN 'purchase' THEN 1.0 WHEN 'click' THEN 0.1
        |    WHEN 'view' THEN 0.01 WHEN 'signup' THEN 0.5 WHEN 'error' THEN 0.0
        |    ELSE 0.0 END AS DOUBLE) AS score
        |FROM events ORDER BY event_id""".stripMargin,

    "p11_freshness" ->
      """SELECT event_id,
        |  round(exp(-0.1 * (epoch_ms(TIMESTAMP '2024-02-01 00:00:00') - epoch_ms(ts)) / 3600000.0), 6) AS freshness
        |FROM events ORDER BY event_id""".stripMargin,

    "p12_minmax_norm" ->
      """SELECT user_id, event_id,
        |  round(CASE WHEN mx - mn > 0 THEN value / (mx - mn) ELSE 0.0 END, 6) AS norm
        |FROM (SELECT user_id, event_id, value,
        |        max(value) OVER (PARTITION BY user_id) mx,
        |        min(value) OVER (PARTITION BY user_id) mn FROM events)
        |ORDER BY user_id, event_id""".stripMargin,

    "p13_time_parse" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS yr,
        |  CAST(month(o_orderdate) AS INTEGER) AS mo,
        |  strftime(o_orderdate, '%Y-%m') AS ym,
        |  epoch_ms(o_orderdate) AS epoch_ms
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "p15_json_extract" ->
      """SELECT event_id, CAST(regexp_extract(props, '"k": (\d+)', 1) AS INTEGER) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "p19_map_metadata" ->
      """SELECT event_id,
        |  CAST(regexp_extract(props, '"k": (\d+)', 1) AS INTEGER) AS time_spent,
        |  regexp_extract(props, '"([a-z_]+)"', 1) AS keys
        |FROM events ORDER BY event_id""".stripMargin,

    "m10_summarize" ->
      """WITH s AS (SELECT doc_id, text,
        |    regexp_extract(text, '^(?:[^.!?]*[.!?]+){1,2}', 0) p FROM documents)
        |SELECT doc_id, substr(CASE WHEN p = '' THEN text ELSE p END, 1, 80) AS summary
        |FROM s ORDER BY doc_id""".stripMargin,

    "x_mm_decode" ->
      """SELECT doc_id,
        |  CAST(md5_number_lower(text) % 1920 + 1 AS INTEGER) AS width,
        |  CAST(md5_number_lower(md5(text)) % 1080 + 1 AS INTEGER) AS height,
        |  3 AS channels,
        |  array_to_string(list_transform(generate_series(0, 3),
        |    i -> CAST(floor(i * octet_length(encode(text)) / 4.0) AS BIGINT)), ',') AS offsets
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Batch-decode parity: dims re-derive decodeStub's md5_number_lower
    // math; the mean byte folds the payload's hex dump two nibbles at a
    // time (DuckDB has no direct blob-byte accessor).
    "x_mm_batch_decode" ->
      """WITH h AS (SELECT doc_id AS id, lower(hex(CAST(text AS BLOB))) hx,
        |    octet_length(encode(text)) n, text FROM documents)
        |SELECT id,
        |  CAST(md5_number_lower(text) % 1920 + 1 AS INTEGER) AS width,
        |  CAST(md5_number_lower(md5(text)) % 1080 + 1 AS INTEGER) AS height,
        |  3 AS channels,
        |  round(CASE WHEN n = 0 THEN 0.0 ELSE
        |    list_sum(list_transform(generate_series(1, n), i ->
        |      (strpos('0123456789abcdef', substr(hx, 2*i-1, 1)) - 1) * 16 +
        |      strpos('0123456789abcdef', substr(hx, 2*i, 1)) - 1)) / n END, 6) AS mean_byte
        |FROM h ORDER BY id""".stripMargin,

    "x_mm_resize" ->
      """WITH m AS (SELECT doc_id,
        |    CAST(md5_number_lower(text) % 1920 + 1 AS INTEGER) w,
        |    CAST(md5_number_lower(md5(text)) % 1080 + 1 AS INTEGER) h
        |  FROM documents),
        |s AS (SELECT doc_id, w, h, least(224.0 / w, 224.0 / h) sc FROM m)
        |SELECT doc_id,
        |  CAST(greatest(1, floor(w * sc)) AS INTEGER) AS out_w,
        |  CAST(greatest(1, floor(h * sc)) AS INTEGER) AS out_h,
        |  round(sc, 6) AS scale
        |FROM s ORDER BY doc_id""".stripMargin,

    "p16_cosine_pairs" ->
      """WITH p AS (SELECT a.vec_id ida, b.vec_id idb, a.embedding ea, b.embedding eb
        |             FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1),
        |u AS (SELECT ida, idb, unnest(ea)::DOUBLE x, unnest(eb)::DOUBLE y FROM p)
        |SELECT ida, idb, round(sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))), 6) AS sim
        |FROM u GROUP BY ida, idb ORDER BY ida""".stripMargin,

    "j_star_revenue" ->
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "j3_semi_join" ->
      """SELECT o_orderkey, o_totalprice FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45)
        |ORDER BY o_orderkey""".stripMargin,

    "j7_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "j5_hybrid_full_outer" ->
      """WITH c AS (SELECT user_id, sum(value) cs FROM events WHERE event_type = 'click' GROUP BY user_id),
        |b AS (SELECT user_id, sum(value) bs FROM events WHERE event_type = 'purchase' GROUP BY user_id)
        |SELECT COALESCE(c.user_id, b.user_id) AS user_id,
        |  round(COALESCE(cs, 0), 4) AS click_score,
        |  round(COALESCE(bs, 0), 4) AS buy_score,
        |  round(COALESCE(cs, 0) * 0.5 + COALESCE(bs, 0) * 0.5, 4) AS score
        |FROM c FULL OUTER JOIN b ON c.user_id = b.user_id
        |ORDER BY user_id""".stripMargin,

    "j6_jaccard_sets" ->
      """WITH m AS (SELECT DISTINCT l_orderkey g, l_partkey p FROM lineitem),
        |sz AS (SELECT g, count(*) n FROM m GROUP BY g),
        |i AS (SELECT a.g ga, b.g gb, count(*) inter FROM m a JOIN m b ON a.p = b.p GROUP BY 1, 2),
        |j AS (SELECT ga id_a, gb id_b, inter,
        |        inter::DOUBLE / (x.n + y.n - inter) jac
        |      FROM i JOIN sz x ON x.g = ga JOIN sz y ON y.g = gb)
        |SELECT id_a, id_b, inter, round(jac, 6) AS jaccard
        |FROM j WHERE jac >= 0.5 AND id_a < id_b ORDER BY id_a, id_b""".stripMargin,

    // Greedy 1-to-1 matching is sequential by nature; the oracle replays
    // it as a recursive CTE — each step accepts the best remaining pair
    // in the same (jaccard DESC, id_a, id_b) string order the Spark scan
    // uses, then drops the pairs that share an endpoint with it. One
    // iteration per accepted match (~1.2k at sf0.01, ~3 s in DuckDB).
    "j6_greedy_match" ->
      """WITH RECURSIVE cand AS (
        |  WITH m AS (SELECT DISTINCT l_orderkey g, l_partkey p FROM lineitem),
        |  sz AS (SELECT g, count(*) n FROM m GROUP BY g),
        |  i AS (SELECT a.g ga, b.g gb, count(*) inter FROM m a JOIN m b ON a.p = b.p GROUP BY 1, 2),
        |  j AS (SELECT ga id_a, gb id_b, inter::DOUBLE / (x.n + y.n - inter) jac
        |        FROM i JOIN sz x ON x.g = ga JOIN sz y ON y.g = gb)
        |  SELECT CAST(id_a AS VARCHAR) a, CAST(id_b AS VARCHAR) b, jac j
        |  FROM j WHERE jac >= 0.5 AND id_a < id_b
        |),
        |g AS (
        |  SELECT a, b, j, false AS accepted FROM cand
        |  UNION ALL
        |  SELECT id_a, id_b, jj, is_best FROM (
        |    SELECT w.a AS id_a, w.b AS id_b, w.j AS jj,
        |      row_number() OVER (ORDER BY w.j DESC, w.a, w.b) = 1 AS is_best,
        |      first_value(w.a) OVER (ORDER BY w.j DESC, w.a, w.b) AS ba,
        |      first_value(w.b) OVER (ORDER BY w.j DESC, w.a, w.b) AS bb
        |    FROM g w WHERE NOT w.accepted
        |  ) WHERE is_best OR (id_a <> ba AND id_b <> bb)
        |)
        |SELECT a AS id_a, b AS id_b, round(j, 6) AS jaccard
        |FROM g WHERE accepted ORDER BY id_a, id_b""".stripMargin,

    "j8_knn_cosine" ->
      """WITH q AS (SELECT vec_id qid, embedding qe FROM embeddings WHERE vec_id < 20),
        |p AS (SELECT qid, c.vec_id nid, qe, c.embedding ce
        |        FROM q CROSS JOIN embeddings c WHERE c.vec_id <> qid),
        |u AS (SELECT qid, nid, unnest(qe)::DOUBLE x, unnest(ce)::DOUBLE y FROM p),
        |s AS (SELECT qid, nid, sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))) sim
        |        FROM u GROUP BY qid, nid),
        |r AS (SELECT qid, nid, sim,
        |        row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) rn FROM s)
        |SELECT qid AS query_id, nid AS neighbor_id, round(sim, 6) AS sim,
        |  CAST(rn AS INTEGER) AS rank
        |FROM r WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin,

    "j1_centroid_assign" ->
      """WITH u AS (SELECT label, generate_subscripts(embedding, 1) pos, unnest(embedding)::DOUBLE x
        |             FROM embeddings),
        |cent AS (SELECT label clabel, pos, avg(x) m FROM u GROUP BY 1, 2),
        |ev AS (SELECT vec_id, generate_subscripts(embedding, 1) pos, unnest(embedding)::DOUBLE x
        |         FROM embeddings),
        |s AS (SELECT vec_id, clabel,
        |        sum(ev.x * cent.m) / (sqrt(sum(ev.x * ev.x)) * sqrt(sum(cent.m * cent.m))) sim
        |      FROM ev JOIN cent ON ev.pos = cent.pos GROUP BY vec_id, clabel),
        |r AS (SELECT vec_id, clabel, sim,
        |        row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, clabel) rn FROM s)
        |SELECT vec_id, CAST(CASE WHEN sim >= 0.3 THEN clabel ELSE -1 END AS BIGINT) AS assigned_id,
        |  round(sim, 6) AS sim
        |FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin,

    "a1_popularity" ->
      """SELECT user_id, count(*) AS cnt FROM events
        |GROUP BY user_id ORDER BY cnt DESC, user_id LIMIT 50""".stripMargin,

    "a2_drift" ->
      """SELECT round(CASE WHEN hist IS NULL OR hist = 0 THEN 0.0
        |  ELSE abs(COALESCE(rec, 0) - hist) / hist END, 6) AS drift_score
        |FROM (SELECT avg(CASE WHEN ts >= TIMESTAMP '2024-01-24 00:00:00' THEN value END) rec,
        |             avg(value) hist FROM events)""".stripMargin,

    "a3_vector_mean" ->
      """SELECT label, string_agg(printf('%.6f', round(m, 6)), ',' ORDER BY pos) AS centroid
        |FROM (SELECT label, pos, avg(x) m
        |      FROM (SELECT label, generate_subscripts(embedding, 1) pos, unnest(embedding)::DOUBLE x
        |            FROM embeddings) GROUP BY label, pos)
        |GROUP BY label ORDER BY label""".stripMargin,

    "a5_set_union" ->
      """SELECT l_orderkey,
        |  array_to_string(list_sort(list(DISTINCT l_partkey)), ',') AS parts,
        |  CAST(len(list(DISTINCT l_partkey)) AS INTEGER) AS n_parts
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,

    "a7_string_agg" ->
      """SELECT lang, string_agg(substr(text, 1, 20), ' | ' ORDER BY doc_id) AS txt
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "a8_diversity" ->
      """SELECT lang, count(DISTINCT source) AS n_sources, count(*) AS n_docs,
        |  round(count(DISTINCT source)::DOUBLE / count(*), 6) AS diversity
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "a9_sentiment" ->
      s"""WITH w AS (SELECT lang, $words wds FROM documents),
         |s AS (SELECT lang,
         |  (len(list_filter(wds, t -> t IN ('fast','big','win','good','great'))) -
         |   len(list_filter(wds, t -> t IN ('slow','small','error','bad','fail'))))::DOUBLE
         |   / len(wds) sent FROM w)
         |SELECT lang, round(avg(sent), 6) AS avg_sentiment FROM s GROUP BY lang ORDER BY lang""".stripMargin,

    "t1_topk_per_key" ->
      """SELECT user_id, event_id, value FROM (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) rn
        |  FROM events) WHERE rn <= 10
        |ORDER BY user_id, value DESC, event_id""".stripMargin,

    "t2_latest_n" ->
      """SELECT o_orderkey, o_orderdate FROM orders
        |ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 10""".stripMargin,

    "d2_keep_first" ->
      """SELECT user_id, event_type, event_id FROM (
        |  SELECT user_id, event_type, event_id,
        |    row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) rn
        |  FROM events) WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin,

    "d5_distinct" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,

    "x_token_stats" ->
      s"""WITH w AS (SELECT doc_id, text, length(text) nc, $words wds FROM documents)
         |SELECT doc_id, CAST(len(wds) AS INTEGER) AS n_tokens,
         |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\x0b\\f\\r]+')) AS INTEGER) AS n_bpe_tokens,
         |  CAST(nc AS INTEGER) AS n_chars2,
         |  round(list_sum(list_transform(wds, t -> length(t)))::DOUBLE / len(wds), 6) AS avg_word_len,
         |  round(len(list_filter(wds, t -> t IN $stops))::DOUBLE / len(wds), 6) AS stopword_ratio
         |FROM w ORDER BY doc_id""".stripMargin,

    "x_quality" ->
      s"""WITH w AS (SELECT doc_id, $words wds FROM documents),
         |m AS (SELECT doc_id, len(wds) nt,
         |  len(list_filter(wds, t -> t IN $stops))::DOUBLE / len(wds) stop_ratio,
         |  list_sum(list_transform(wds, t -> length(t)))::DOUBLE / len(wds) awl FROM w)
         |SELECT doc_id, round(
         |  least(nt / 50.0, 1.0) * 0.5 +
         |  (CASE WHEN stop_ratio > 0.01 THEN 1.0 ELSE 0.5 END) * 0.25 +
         |  (CASE WHEN awl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.5 END) * 0.25, 6) AS quality
         |FROM m ORDER BY doc_id""".stripMargin,

    // Script-detect replay: same 1:1 transliteration, same literal
    // code-point classes (RE2 and Java agree on explicit ranges), same
    // argmax tie order.
    "x_script_detect" ->
      """WITH t AS (SELECT doc_id, CASE
        |    WHEN doc_id % 4 = 1 THEN translate(text,
        |      'abcdefghijklmnopqrstuvwxyz', 'абвгдежзийклмнопрстуфхцчшщ')
        |    WHEN doc_id % 4 = 2 THEN translate(text,
        |      'abcdefghijklmnopqrstuvwxyz', 'αβγδεζηθικλμνξοπρστυφχψωάέ')
        |    WHEN doc_id % 4 = 3 THEN translate(text,
        |      'abcdefghijklmnopqrstuvwxyz', '数据模型训练语言文本分析处理系统网络算法机器学习深度')
        |    ELSE text END AS t FROM documents),
        |c AS (SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '[A-Za-z]')) AS INTEGER) n_latin,
        |  CAST(len(regexp_extract_all(t, '[Ѐ-ӿ]')) AS INTEGER) n_cyrillic,
        |  CAST(len(regexp_extract_all(t, '[Ͱ-Ͽ]')) AS INTEGER) n_greek,
        |  CAST(len(regexp_extract_all(t, '[一-鿿]')) AS INTEGER) n_han FROM t)
        |SELECT doc_id, n_latin, n_cyrillic, n_greek, n_han,
        |  CASE WHEN greatest(n_latin, n_cyrillic, n_greek, n_han) = 0 THEN 'und'
        |       WHEN n_latin = greatest(n_latin, n_cyrillic, n_greek, n_han) THEN 'latin'
        |       WHEN n_cyrillic = greatest(n_latin, n_cyrillic, n_greek, n_han) THEN 'cyrillic'
        |       WHEN n_greek = greatest(n_latin, n_cyrillic, n_greek, n_han) THEN 'greek'
        |       ELSE 'han' END AS script
        |FROM c ORDER BY doc_id""".stripMargin,

    // Language-confidence replay: same profile scores, margin via the
    // same sorted-array positions, same confidence rule.
    "x_langid_confidence" ->
      s"""WITH w AS (SELECT doc_id, $words wds FROM documents),
         |s AS (SELECT doc_id,
         |  CAST(len(list_filter(wds, t -> t IN ('the','and','of','is','a'))) AS INTEGER) s_en,
         |  CAST(len(list_filter(wds, t -> t IN ('der','die','und','ist','das'))) AS INTEGER) s_de,
         |  CAST(len(list_filter(wds, t -> t IN ('el','los','y','es','una'))) AS INTEGER) s_es,
         |  CAST(len(list_filter(wds, t -> t IN ('le','la','et','est','une'))) AS INTEGER) s_fr FROM w),
         |m AS (SELECT doc_id, s_en, s_de, s_es, s_fr,
         |  list_sort([s_en, s_de, s_es, s_fr]) srt FROM s)
         |SELECT doc_id, s_en, s_de, s_es, s_fr,
         |  srt[4] - srt[3] AS margin,
         |  (srt[4] > 0 AND srt[4] - srt[3] >= 2) AS confident
         |FROM m ORDER BY doc_id""".stripMargin,

    "x_langid" ->
      s"""WITH w AS (SELECT doc_id, $words wds FROM documents),
         |s AS (SELECT doc_id,
         |  len(list_filter(wds, t -> t IN ('the','and','of','is','a'))) s_en,
         |  len(list_filter(wds, t -> t IN ('der','die','und','ist','das'))) s_de,
         |  len(list_filter(wds, t -> t IN ('el','los','y','es','una'))) s_es,
         |  len(list_filter(wds, t -> t IN ('le','la','et','est','une'))) s_fr FROM w)
         |SELECT doc_id, CASE WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
         |  WHEN s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
         |  WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
         |  WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
         |  ELSE 'fr' END AS lang_pred
         |FROM s ORDER BY doc_id""".stripMargin,

    "x_fingerprint" ->
      """SELECT doc_id, md5(lower(trim(text))) AS fp FROM documents ORDER BY doc_id""".stripMargin,

    // Content-defined chunking parity: the closed-form window hash
    // Σ cp(i)·B^(e−i) mod M over each 8-codepoint window equals the JVM
    // kernel's O(n) rolling recurrence, so boundary sets match exactly.
    "x_cdc_chunks" ->
      s"""$cdcCtes
         |SELECT doc_id, array_to_string(ends, ',') AS chunk_ends
         |FROM b ORDER BY doc_id""".stripMargin,

    // Chunk-level dedup: cut each document at the CDC ends, md5 every
    // chunk, group fingerprints seen more than once.
    "x_cdc_dedup" ->
      s"""$cdcCtes,
         |ch AS (SELECT doc_id, CAST(i.i AS INTEGER) AS pos,
         |        substring(text,
         |          CASE WHEN i.i = 1 THEN 1 ELSE CAST(ends[CAST(i.i AS INT) - 1] + 1 AS INT) END,
         |          CAST(ends[CAST(i.i AS INT)] - CASE WHEN i.i = 1 THEN 0 ELSE ends[CAST(i.i AS INT) - 1] END AS INT)) AS chunk
         |       FROM b, unnest(generate_series(1, len(ends))) AS i(i)),
         |f AS (SELECT md5(chunk) fp, doc_id, pos FROM ch)
         |SELECT fp, count(*) AS n,
         |  string_agg(doc_id || ':' || pos, ',' ORDER BY doc_id, pos) AS ids
         |FROM f GROUP BY fp HAVING count(*) > 1 ORDER BY fp""".stripMargin,

    // The sampling decision is a pure function of (salt, key, stratum
    // fraction) — the oracle replays it with md5_number_lower.
    "x_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE md5_number_lower('s1|' || CAST(doc_id AS VARCHAR)) % 1000000 <
        |  CAST(floor(CASE lang WHEN 'en' THEN 0.25 WHEN 'zh' THEN 0.5
        |             ELSE 0.8 END * 1000000) AS BIGINT)
        |ORDER BY doc_id""".stripMargin,

    // The salted join/agg must equal their unsalted forms — the oracle
    // IS the unsalted form.
    "x_salted_join" ->
      """SELECT p_brand, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    // Adaptive salted join: the oracle is the PLAIN join — hot-key
    // detection and selective salting must be invisible in the result.
    "x_adaptive_salted_join" ->
      """WITH dim AS (SELECT l_returnflag rf, round(avg(l_tax), 6) avg_tax
        |  FROM lineitem GROUP BY 1)
        |SELECT l_linestatus,
        |  round(sum(l_extendedprice * (1 + avg_tax)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN dim ON l_returnflag = rf
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "x_salted_set_union" ->
      """SELECT l_orderkey,
        |  array_to_string(list_sort(list(DISTINCT l_partkey)), ',') AS parts,
        |  CAST(len(list(DISTINCT l_partkey)) AS INTEGER) AS n_parts
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,

    // As-of join replayed by DuckDB's native ASOF LEFT JOIN (greatest
    // view_ts <= click ts per user, inclusive — identical tie rule to the
    // engine's right-before-left sort at equal timestamps). The view side
    // is deduped per (user, ts) on both sides so the match is pinned.
    "x_asof_join" ->
      """WITH v AS (SELECT user_id, ts AS view_ts, max(value) AS view_value
        |           FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        |     c AS (SELECT event_id, user_id, ts FROM events
        |           WHERE event_type = 'click')
        |SELECT c.event_id, c.user_id, c.ts, v.view_ts, v.view_value
        |FROM c ASOF LEFT JOIN v
        |  ON c.user_id = v.user_id AND c.ts >= v.view_ts
        |ORDER BY c.event_id""".stripMargin,

    // Interval join as a plain inequality join (DuckDB plans IEJoin);
    // the engine's grid-bucketed equi-join must produce the identical
    // pair set. count(p.ts) counts matched rows only, so windows whose
    // sole content is their opening event still replay exactly.
    "x_range_join" ->
      """WITH w AS (SELECT event_id AS win_id, user_id, ts AS w_start,
        |                  ts + INTERVAL 30 MINUTE AS w_end
        |           FROM events WHERE event_type = 'error'),
        |     p AS (SELECT user_id, ts, value FROM events)
        |SELECT w.win_id, CAST(count(p.ts) AS BIGINT) AS n_events,
        |       round(coalesce(sum(p.value), 0), 4) AS sum_value
        |FROM w LEFT JOIN p ON p.user_id = w.user_id
        |  AND p.ts >= w.w_start AND p.ts < w.w_end
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Gap sessions: break when the gap to the previous event exceeds 30
    // minutes (strict, microsecond-exact on both engines), running-sum
    // the breaks into a per-user session sequence, then summarize.
    "x_sessionize" ->
      """WITH o AS (SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |              > INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |     s AS (SELECT user_id, ts, value,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o)
        |SELECT user_id, CAST(sid AS BIGINT) AS session_seq,
        |       min(ts) AS session_start, max(ts) AS session_end,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       round(sum(value), 4) AS sum_value
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Substring-level dedup (Lee et al. 2022, shingle form): 8-token
    // windows over the shared tokenization, duplicated when seen in >= 2
    // distinct docs. t[i:i+7] is DuckDB's 1-based INCLUSIVE slice = the
    // engine's slice(toks, i, 8); generate_series(1, n) is empty for
    // n < 1, matching the engine's guarded short-doc branch.
    "x_dup_spans" ->
      s"""WITH toks AS (SELECT doc_id, $words AS t FROM documents),
        |     win AS (SELECT doc_id, i, array_to_string(t[i:i+7], ' ') AS span
        |             FROM (SELECT doc_id, t,
        |                     unnest(generate_series(1, len(t) - 7)) AS i FROM toks))
        |SELECT span, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |       CAST(count(*) AS BIGINT) AS n_occ
        |FROM win GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
        |ORDER BY 1""".stripMargin,

    // Span removal: coverage = distinct (doc, pos) under any duplicated
    // window (overlaps merge via DISTINCT), kept tokens re-join in
    // position order; docs shorter than the window (or empty) fall out
    // of tok_pos and re-enter via the documents left join with zeros.
    "x_substring_scrub" ->
      s"""WITH toks AS (SELECT doc_id, $words AS t FROM documents),
        |     win AS (SELECT doc_id, i, array_to_string(t[i:i+7], ' ') AS span
        |             FROM (SELECT doc_id, t,
        |                     unnest(generate_series(1, len(t) - 7)) AS i FROM toks)),
        |     dup AS (SELECT span FROM win GROUP BY 1
        |             HAVING count(DISTINCT doc_id) >= 2),
        |     cover AS (SELECT DISTINCT w.doc_id, u.pos
        |               FROM win w JOIN dup USING (span),
        |                    unnest(generate_series(w.i, w.i + 7)) AS u(pos)),
        |     tok_pos AS (SELECT doc_id, i AS pos, t[i] AS tok
        |                 FROM (SELECT doc_id, t,
        |                         unnest(generate_series(1, len(t))) AS i FROM toks)),
        |     agg AS (SELECT tp.doc_id, count(*) AS n_tokens,
        |               count(c.pos) AS n_removed,
        |               coalesce(string_agg(CASE WHEN c.pos IS NULL THEN tp.tok END,
        |                 ' ' ORDER BY tp.pos), '') AS clean_text
        |             FROM tok_pos tp LEFT JOIN cover c
        |               ON c.doc_id = tp.doc_id AND c.pos = tp.pos
        |             GROUP BY 1)
        |SELECT d.doc_id, CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
        |       CAST(coalesce(a.n_removed, 0) AS BIGINT) AS n_removed,
        |       coalesce(a.clean_text, '') AS clean_text
        |FROM documents d LEFT JOIN agg a USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // The engine's inventory keys spans by a 128-bit digest; the
    // doc-frequency histogram is digest-free and replayable from the
    // string spans — a hash match proves the digest grouping merged
    // exactly the spans the strings would (collision-free).
    "x_span_index_stats" ->
      s"""WITH toks AS (SELECT doc_id, $words AS t FROM documents),
        |     win AS (SELECT doc_id, i, array_to_string(t[i:i+7], ' ') AS span
        |             FROM (SELECT doc_id, t,
        |                     unnest(generate_series(1, len(t) - 7)) AS i FROM toks)),
        |     g AS (SELECT span, count(DISTINCT doc_id) nd, count(*) nocc
        |           FROM win GROUP BY 1)
        |SELECT CAST(nd AS BIGINT) AS n_docs, CAST(count(*) AS BIGINT) AS n_spans,
        |       CAST(sum(nocc) AS BIGINT) AS n_occ
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,

    // Incremental admission scrub = the full-corpus scrub (duplication
    // counted over corpus ∪ batch = all documents) restricted to the
    // batch's rows — the invariant scrubAgainstIndex is built to hold.
    "x_span_scrub_incremental" ->
      s"""WITH toks AS (SELECT doc_id, $words AS t FROM documents),
        |     win AS (SELECT doc_id, i, array_to_string(t[i:i+7], ' ') AS span
        |             FROM (SELECT doc_id, t,
        |                     unnest(generate_series(1, len(t) - 7)) AS i FROM toks)),
        |     dup AS (SELECT span FROM win GROUP BY 1
        |             HAVING count(DISTINCT doc_id) >= 2),
        |     cover AS (SELECT DISTINCT w.doc_id, u.pos
        |               FROM win w JOIN dup USING (span),
        |                    unnest(generate_series(w.i, w.i + 7)) AS u(pos)),
        |     tok_pos AS (SELECT doc_id, i AS pos, t[i] AS tok
        |                 FROM (SELECT doc_id, t,
        |                         unnest(generate_series(1, len(t))) AS i FROM toks)),
        |     agg AS (SELECT tp.doc_id, count(*) AS n_tokens,
        |               count(c.pos) AS n_removed,
        |               coalesce(string_agg(CASE WHEN c.pos IS NULL THEN tp.tok END,
        |                 ' ' ORDER BY tp.pos), '') AS clean_text
        |             FROM tok_pos tp LEFT JOIN cover c
        |               ON c.doc_id = tp.doc_id AND c.pos = tp.pos
        |             GROUP BY 1)
        |SELECT d.doc_id, CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
        |       CAST(coalesce(a.n_removed, 0) AS BIGINT) AS n_removed,
        |       coalesce(a.clean_text, '') AS clean_text
        |FROM documents d LEFT JOIN agg a USING (doc_id)
        |WHERE d.doc_id % 5 = 0
        |ORDER BY d.doc_id""".stripMargin,

    // The bloom prefilter is exact end-to-end (suspects get verified),
    // so the oracle is the plain fingerprint anti-join.
    "x_bloom_incremental" ->
      """SELECT i.doc_id FROM documents i
        |WHERE i.doc_id % 5 = 0 AND NOT EXISTS (
        |  SELECT 1 FROM documents c WHERE c.doc_id % 5 <> 0
        |  AND md5(lower(trim(c.text))) = md5(lower(trim(i.text))))
        |ORDER BY i.doc_id""".stripMargin,

    "x_exact_dup_groups" ->
      """SELECT md5(lower(trim(text))) AS fp, count(*) AS n,
        |  array_to_string(list_sort(list(doc_id)), ',') AS ids
        |FROM documents GROUP BY fp HAVING count(*) > 1 ORDER BY fp""".stripMargin,

    // Incremental near-dup admission: batch (doc_id % 10 >= 8) bands
    // probe the corpus (doc_id % 10 < 8) band index, candidates verify by
    // exact shingle Jaccard, one verdict row per batch doc. Same
    // signature chain as x_lsh_pairs, split across the two sides.
    "x_neardup_incremental" ->
      s"""WITH w AS (SELECT doc_id, $words wds FROM documents),
         |sh AS (SELECT doc_id, CASE WHEN len(wds) < 3 THEN CAST([] AS VARCHAR[])
         |  ELSE list_transform(generate_series(1, len(wds) - 2), i -> array_to_string(wds[i:i+2], ' ')) END s
         |  FROM w),
         |sig AS (SELECT doc_id, [
         |  list_min(list_transform(s, x -> md5('0|' || x))),
         |  list_min(list_transform(s, x -> md5('1|' || x))),
         |  list_min(list_transform(s, x -> md5('2|' || x))),
         |  list_min(list_transform(s, x -> md5('3|' || x)))] sg FROM sh),
         |bnd AS (SELECT doc_id, generate_subscripts(sg, 1) band, unnest(sg) bv FROM sig),
         |cand AS (SELECT DISTINCT b.doc_id batch_id, c.doc_id corpus_id
         |  FROM bnd b JOIN bnd c ON b.band = c.band AND b.bv = c.bv
         |  WHERE b.doc_id % 10 >= 8 AND c.doc_id % 10 < 8),
         |m AS (SELECT doc_id, unnest(list_distinct(s)) sh FROM sh),
         |sz AS (SELECT doc_id, count(*) n FROM m GROUP BY doc_id),
         |i AS (SELECT cd.batch_id, cd.corpus_id, count(*) inter
         |  FROM cand cd JOIN m a ON a.doc_id = cd.batch_id
         |  JOIN m b2 ON b2.doc_id = cd.corpus_id AND b2.sh = a.sh GROUP BY 1, 2),
         |mt AS (SELECT i.batch_id, i.corpus_id,
         |    i.inter::DOUBLE / (x.n + y.n - i.inter) jac
         |  FROM i JOIN sz x ON x.doc_id = i.batch_id
         |  JOIN sz y ON y.doc_id = i.corpus_id
         |  WHERE i.inter::DOUBLE / (x.n + y.n - i.inter) >= 0.05),
         |st AS (SELECT batch_id, count(*) nm FROM mt GROUP BY 1),
         |bst AS (SELECT batch_id, corpus_id, jac FROM (
         |  SELECT mt.*, row_number() OVER (PARTITION BY batch_id
         |    ORDER BY jac DESC, corpus_id) rn FROM mt) WHERE rn = 1)
         |SELECT d.doc_id, CAST(coalesce(st.nm, 0) AS BIGINT) AS n_matches,
         |  bst.corpus_id AS match_id, round(bst.jac, 6) AS match_jaccard,
         |  (st.nm IS NULL) AS admit
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 >= 8) d
         |LEFT JOIN st ON st.batch_id = d.doc_id
         |LEFT JOIN bst ON bst.batch_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "x_minhash_sig" ->
      s"""WITH w AS (SELECT doc_id, $words wds FROM documents),
         |sh AS (SELECT doc_id, CASE WHEN len(wds) < 3 THEN CAST([] AS VARCHAR[])
         |  ELSE list_transform(generate_series(1, len(wds) - 2), i -> array_to_string(wds[i:i+2], ' ')) END s
         |  FROM w)
         |SELECT doc_id, array_to_string(list_transform([
         |  list_min(list_transform(s, x -> md5('0|' || x))),
         |  list_min(list_transform(s, x -> md5('1|' || x))),
         |  list_min(list_transform(s, x -> md5('2|' || x))),
         |  list_min(list_transform(s, x -> md5('3|' || x)))],
         |  h -> coalesce(h, 'null')), ',') AS sig
         |FROM sh ORDER BY doc_id""".stripMargin,

    // LSH evaluation replay: the shared candidate chain vs the exact
    // ≥ 0.05 ground truth — two counts and their rounded ratios.
    "x_lsh_eval" ->
      s"""WITH $lshCandCtes,
         |ex AS (SELECT li.ia, li.ib FROM li
         |  JOIN lsz x ON x.doc_id = li.ia JOIN lsz y ON y.doc_id = li.ib
         |  WHERE li.inter::DOUBLE / (x.n + y.n - li.inter) >= 0.05),
         |tp AS (SELECT c.ia, c.ib FROM cand c JOIN ex ON ex.ia = c.ia AND ex.ib = c.ib),
         |n AS (SELECT (SELECT count(*) FROM cand) nc,
         |             (SELECT count(*) FROM ex) ne,
         |             (SELECT count(*) FROM tp) nh)
         |SELECT nc AS n_candidates, ne AS n_true_pairs, nh AS n_hits,
         |  CASE WHEN nc = 0 THEN 0.0 ELSE round(nh::DOUBLE / nc, 6) END AS precision,
         |  CASE WHEN ne = 0 THEN 0.0 ELSE round(nh::DOUBLE / ne, 6) END AS recall
         |FROM n""".stripMargin,

    "x_lsh_pairs" ->
      s"""WITH w AS (SELECT doc_id, $words wds FROM documents),
         |sh AS (SELECT doc_id, CASE WHEN len(wds) < 3 THEN CAST([] AS VARCHAR[])
         |  ELSE list_transform(generate_series(1, len(wds) - 2), i -> array_to_string(wds[i:i+2], ' ')) END s
         |  FROM w),
         |sig AS (SELECT doc_id, [
         |  list_min(list_transform(s, x -> md5('0|' || x))),
         |  list_min(list_transform(s, x -> md5('1|' || x))),
         |  list_min(list_transform(s, x -> md5('2|' || x))),
         |  list_min(list_transform(s, x -> md5('3|' || x)))] sg FROM sh),
         |b AS (SELECT doc_id, generate_subscripts(sg, 1) band, unnest(sg) bv FROM sig)
         |SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
         |FROM b a JOIN b c ON a.band = c.band AND a.bv = c.bv AND a.doc_id < c.doc_id
         |ORDER BY id_a, id_b""".stripMargin,

    "x_ngram_jaccard" ->
      s"""WITH w AS (SELECT doc_id, $words wds FROM documents),
         |sh AS (SELECT doc_id, list_distinct(CASE WHEN len(wds) < 3 THEN CAST([] AS VARCHAR[])
         |  ELSE list_transform(generate_series(1, len(wds) - 2), i -> array_to_string(wds[i:i+2], ' ')) END) s
         |  FROM w),
         |m AS (SELECT doc_id, unnest(s) sh FROM sh),
         |sz AS (SELECT doc_id, count(*) n FROM m GROUP BY doc_id),
         |i AS (SELECT a.doc_id ia, b.doc_id ib, count(*) inter
         |        FROM m a JOIN m b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |j AS (SELECT ia, ib, inter, inter::DOUBLE / (x.n + y.n - inter) jac
         |        FROM i JOIN sz x ON x.doc_id = ia JOIN sz y ON y.doc_id = ib)
         |SELECT ia AS id_a, ib AS id_b, round(jac, 6) AS jaccard
         |FROM j WHERE jac >= 0.02 ORDER BY id_a, id_b""".stripMargin,

    // Containment replay: same 3-shingle sets, both direction ratios,
    // keep where either ROUNDED direction reaches 0.4 (the rounded
    // value is the shared decision key).
    "x_containment_pairs" ->
      s"""WITH w AS (SELECT doc_id, $words wds FROM documents),
         |sh AS (SELECT doc_id, list_distinct(CASE WHEN len(wds) < 3 THEN CAST([] AS VARCHAR[])
         |  ELSE list_transform(generate_series(1, len(wds) - 2), i -> array_to_string(wds[i:i+2], ' ')) END) s
         |  FROM w),
         |m AS (SELECT doc_id, unnest(s) sh FROM sh),
         |sz AS (SELECT doc_id, count(*) n FROM m GROUP BY doc_id),
         |i AS (SELECT a.doc_id ia, b.doc_id ib, count(*) inter
         |        FROM m a JOIN m b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |c AS (SELECT ia, ib, round(inter::DOUBLE / x.n, 6) ca, round(inter::DOUBLE / y.n, 6) cb
         |        FROM i JOIN sz x ON x.doc_id = ia JOIN sz y ON y.doc_id = ib)
         |SELECT ia AS id_a, ib AS id_b, ca AS cont_a_in_b, cb AS cont_b_in_a
         |FROM c WHERE greatest(ca, cb) >= 0.4 ORDER BY id_a, id_b""".stripMargin,

    // SimHash: per-token 64-bit hash = md5_number_lower (same byte order as
    // the JVM kernel), ±1 votes per bit, majority sign; built as HUGEINT
    // then wrapped to signed 64-bit to match Spark's LongType. The final
    // LEFT JOIN back to documents keeps zero-token docs (empty/whitespace
    // text): the JVM kernel votes nothing and emits fingerprint 0, so the
    // oracle coalesces the missing aggregate row to 0 instead of dropping
    // the document.
    // Okapi BM25 replay: idf = ln(1 + (N - df + ½)/(df + ½)), score =
    // Σ idf·tf·(k1+1)/(tf + k1(1 − b + b·dl/avgdl)) with k1=1.2 b=0.75;
    // rank on the 6-decimal-rounded score (the engine's TopK heap keys
    // on the same rounded value), doc_id tie-break.
    // SFT-export replay: the x_loss_mask span chain + the pack
    // placement over the chat token counts, absolute offsets =
    // start-of-doc (seq_first·64 + tok_offset ≡ the running total) +
    // span − 1.
    "pipe_sft_e2e" ->
      s"""WITH w AS (SELECT doc_id, $words t FROM documents),
         |c AS (SELECT doc_id,
         |  'user: ' || coalesce(array_to_string(t[1:5], ' '), '') || ' assistant: ' ||
         |  coalesce(array_to_string(t[6:10], ' '), '') || ' user: ' ||
         |  coalesce(array_to_string(t[11:15], ' '), '') || ' assistant: ' ||
         |  coalesce(array_to_string(t[16:], ' '), '') AS text FROM w),
         |tt AS (SELECT doc_id, $words t FROM c),
         |mk AS (SELECT doc_id, len(t) n,
         |  list_filter(list_zip(t, generate_series(1, len(t))),
         |    z -> z[1] IN ('user:', 'assistant:')) m FROM tt),
         |sp AS (SELECT doc_id, n, unnest(list_filter(
         |  list_transform(generate_series(1, len(m)), i ->
         |    CASE WHEN m[i][1] = 'assistant:'
         |         THEN [m[i][2] + 1,
         |               CASE WHEN i < len(m) THEN m[i+1][2] - 1 ELSE n END]
         |         ELSE NULL END),
         |  x -> x IS NOT NULL AND x[1] <= x[2])) s2 FROM mk),
         |b AS (SELECT doc_id, CAST(len(t) AS INTEGER) nt2,
         |  CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) % 8 AS BIGINT) shard
         |  FROM tt),
         |f AS (SELECT * FROM b WHERE nt2 > 0),
         |pc AS (SELECT doc_id, shard,
         |  CAST(sum(nt2) OVER (PARTITION BY shard ORDER BY doc_id) - nt2
         |    AS BIGINT) strt FROM f)
         |SELECT sp.doc_id, pc.shard,
         |  strt + s2[1] - 1 AS abs_s, strt + s2[2] - 1 AS abs_e
         |FROM sp JOIN pc USING (doc_id) ORDER BY doc_id, abs_s""".stripMargin,

    // Shard-export replay: quality gate over w0's token stream, BPE
    // counts from the shared d8 chain restricted to kept docs, then the
    // x_pack_sequences placement arithmetic over BPE lengths.
    "pipe_shard_export_e2e" ->
      s"""WITH ${bpeCtes(8)},
         |nt AS (SELECT wrd, len(list_filter(string_split(trim(w), ' '), x -> x <> '')) n
         |  FROM d8),
         |qs AS (SELECT doc_id, len(wds) nt2,
         |  len(list_filter(wds, t2 -> t2 IN $stops))::DOUBLE / len(wds) stop_ratio,
         |  list_sum(list_transform(wds, t2 -> length(t2)))::DOUBLE / len(wds) awl
         |  FROM w0),
         |qq AS (SELECT doc_id, round(least(nt2 / 50.0, 1.0) * 0.5 +
         |  (CASE WHEN stop_ratio > 0.01 THEN 1.0 ELSE 0.5 END) * 0.25 +
         |  (CASE WHEN awl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.5 END) * 0.25, 6) q
         |  FROM qs),
         |k AS (SELECT doc_id FROM qq WHERE q >= 0.5),
         |tkn AS (SELECT w0.doc_id, unnest(wds) wrd FROM w0 JOIN k USING (doc_id)),
         |e AS (SELECT k.doc_id, CAST(coalesce(sum(nt.n), 0) AS BIGINT) nb
         |  FROM k LEFT JOIN tkn ON tkn.doc_id = k.doc_id
         |  LEFT JOIN nt ON nt.wrd = tkn.wrd GROUP BY k.doc_id),
         |b AS (SELECT doc_id, nb n_tokens,
         |  CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) % 8 AS BIGINT) shard
         |  FROM e WHERE nb > 0),
         |c AS (SELECT doc_id, shard, n_tokens,
         |  CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) - n_tokens
         |    AS BIGINT) strt FROM b)
         |SELECT doc_id, shard, n_tokens,
         |  CAST(strt // 64 AS BIGINT) AS seq_first,
         |  CAST((strt + n_tokens - 1) // 64 AS BIGINT) AS seq_last,
         |  CAST(strt % 64 AS BIGINT) AS tok_offset
         |FROM c ORDER BY doc_id""".stripMargin,

    // RAG pipe replay: the x_chunk_tokens windows (16/12) carry their
    // token slices straight into the x_bm25_topk scoring chain keyed by
    // cid, then best-chunk-per-doc attribution and the top-3 rank.
    "pipe_rag_e2e" ->
      s"""WITH w AS (SELECT doc_id, $words t FROM documents),
        |cd AS (SELECT doc_id * 1000 + CAST((s - 1) / 12 AS INTEGER) cid,
        |         doc_id src_doc, t[s:s+15] ct
        |       FROM (SELECT doc_id, t,
        |               unnest(generate_series(1, greatest(1, len(t) - 16 + 12), 12)) s
        |             FROM w WHERE len(t) > 0)),
        |tf AS (SELECT cid, dl, term, count(*) tf FROM
        |         (SELECT cid, len(ct) dl, unnest(ct) term FROM cd)
        |       GROUP BY 1, 2, 3),
        |df AS (SELECT term, count(*) df FROM tf GROUP BY 1),
        |st AS (SELECT count(*) n_docs, avg(len(ct)) avgdl FROM cd),
        |qt AS (SELECT DISTINCT qid, term FROM
        |         (SELECT doc_id qid, unnest(t[1:5]) term FROM w
        |          WHERE doc_id % 97 = 0)),
        |sc AS (SELECT qt.qid query_id, tf.cid,
        |         sum(ln(1 + (st.n_docs - df.df + 0.5) / (df.df + 0.5))
        |             * tf.tf * 2.2
        |             / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / st.avgdl))) score
        |       FROM qt JOIN tf ON tf.term = qt.term
        |         JOIN df ON df.term = qt.term CROSS JOIN st
        |       WHERE df.df::DOUBLE / st.n_docs <= 1.0
        |       GROUP BY 1, 2),
        |r AS (SELECT query_id, cid, round(score, 6) score,
        |        row_number() OVER (PARTITION BY query_id
        |          ORDER BY round(score, 6) DESC, cid) rn FROM sc),
        |h AS (SELECT query_id, cid, score FROM r WHERE rn <= 20),
        |a AS (SELECT h.query_id, cd.src_doc doc_id, max(h.score) doc_score
        |      FROM h JOIN cd USING (cid) GROUP BY 1, 2),
        |r2 AS (SELECT query_id, doc_id, doc_score,
        |        row_number() OVER (PARTITION BY query_id
        |          ORDER BY doc_score DESC, doc_id) rk FROM a)
        |SELECT query_id, doc_id, doc_score, CAST(rk AS INTEGER) AS rank
        |FROM r2 WHERE rk <= 3 ORDER BY query_id, rank""".stripMargin,

    "x_bm25_topk" ->
      s"""WITH tokd AS (SELECT doc_id, $words AS t FROM documents),
        |tf AS (SELECT doc_id, dl, term, count(*) tf FROM
        |         (SELECT doc_id, len(t) dl, unnest(t) term FROM tokd)
        |       GROUP BY 1, 2, 3),
        |df AS (SELECT term, count(*) df FROM tf GROUP BY 1),
        |st AS (SELECT count(*) n_docs, avg(len(t)) avgdl FROM tokd),
        |qt AS (SELECT DISTINCT qid, term FROM
        |         (SELECT doc_id qid, unnest(t[1:5]) term FROM tokd
        |          WHERE doc_id % 97 = 0)),
        |sc AS (SELECT qt.qid query_id, tf.doc_id,
        |         sum(ln(1 + (st.n_docs - df.df + 0.5) / (df.df + 0.5))
        |             * tf.tf * 2.2
        |             / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / st.avgdl))) score
        |       FROM qt JOIN tf ON tf.term = qt.term
        |         JOIN df ON df.term = qt.term CROSS JOIN st
        |       WHERE df.df::DOUBLE / st.n_docs <= 1.0
        |       GROUP BY 1, 2),
        |r AS (SELECT query_id, doc_id, round(score, 6) score,
        |        row_number() OVER (PARTITION BY query_id
        |          ORDER BY round(score, 6) DESC, doc_id) rn FROM sc)
        |SELECT query_id, doc_id, score, CAST(rn AS INTEGER) AS rank
        |FROM r WHERE rn <= 10 ORDER BY query_id, rank""".stripMargin,

    // Expectation-report replay: each check is a plain conditional
    // count; uniqueness = count - count(DISTINCT); FK = anti-join count.
    "x_data_quality" ->
      """WITH checks AS (
        |  SELECT 'orderkey_not_null' chk,
        |    count(*) FILTER (WHERE o_orderkey IS NULL) v FROM orders
        |  UNION ALL SELECT 'totalprice_positive',
        |    count(*) FILTER (WHERE NOT coalesce(o_totalprice > 0.0, false)) FROM orders
        |  UNION ALL SELECT 'status_in_domain',
        |    count(*) FILTER (WHERE NOT coalesce(o_orderstatus IN ('O','F','P'), false)) FROM orders
        |  UNION ALL SELECT 'orderdate_in_range',
        |    count(*) FILTER (WHERE NOT coalesce(o_orderdate BETWEEN
        |      TIMESTAMP '1992-01-01' AND TIMESTAMP '1998-12-31 23:59:59', false)) FROM orders
        |  UNION ALL SELECT 'priority_not_blank',
        |    count(*) FILTER (WHERE NOT coalesce(length(trim(o_orderpriority)) > 0, false)) FROM orders
        |  UNION ALL SELECT 'orderkey_unique',
        |    count(o_orderkey) - count(DISTINCT o_orderkey) FROM orders
        |  UNION ALL SELECT 'custkey_fk',
        |    (SELECT count(*) FROM orders o LEFT JOIN customer c
        |       ON o.o_custkey = c.c_custkey
        |     WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL))
        |SELECT chk AS check, CAST(v AS BIGINT) AS n_violations, v = 0 AS pass
        |FROM checks ORDER BY 1""".stripMargin,

    // Data card: one grouped replay of the per-(source, lang) summary.
    // Quality rounds to 6 per-doc then converts to integer MILLIONTHS
    // before averaging — a double mean of 6-decimal values lands on
    // decimal-half rounding boundaries where the engines disagree, so
    // the mean is exact-integer-sum / identical-double-division with no
    // rounding at all; the median replays the documented "smallest x
    // with cdf >= ceil(q*n)" sketch semantic; the exact fingerprint
    // distinct carries the HLL contract boolean (±max(10%, 10) — no
    // sparse mode in Spark's HLL++, so tiny cells can miss by ±1-2).
    "x_data_card" ->
      s"""WITH w AS (SELECT source, lang, n_chars, $words wds,
        |        md5(lower(trim(text))) fp FROM documents),
        |m AS (SELECT source, lang, n_chars, fp, len(wds) nt,
        |  len(list_filter(wds, t -> t IN $stops))::DOUBLE / len(wds) stop_ratio,
        |  list_sum(list_transform(wds, t -> length(t)))::DOUBLE / len(wds) awl FROM w),
        |q AS (SELECT source, lang, n_chars, fp, nt, CAST(round(round(
        |  least(nt / 50.0, 1.0) * 0.5 +
        |  (CASE WHEN stop_ratio > 0.01 THEN 1.0 ELSE 0.5 END) * 0.25 +
        |  (CASE WHEN awl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.5 END) * 0.25, 6)
        |  * 1000000.0) AS BIGINT) qu FROM m),
        |n AS (SELECT source, lang, count(*) nd FROM q GROUP BY 1, 2),
        |r AS (SELECT source, lang, n_chars,
        |        count(*) OVER (PARTITION BY source, lang ORDER BY n_chars) cum FROM q),
        |p AS (SELECT r.source, r.lang, min(n_chars) p50
        |      FROM r JOIN n USING (source, lang)
        |      WHERE cum >= ceil(0.5 * nd) GROUP BY 1, 2)
        |SELECT q.source, q.lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(nt) AS BIGINT) AS n_tokens,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(sum(qu) AS DOUBLE) / CAST(count(*) * 1000000 AS DOUBLE) AS avg_quality,
        |  CAST(count(DISTINCT fp) AS BIGINT) AS n_unique,
        |  round(1.0 - count(DISTINCT fp)::DOUBLE / count(*), 6) AS dup_rate,
        |  round(CAST(max(p.p50) AS DOUBLE), 2) AS p50_chars,
        |  true AS distinct_ok
        |FROM q JOIN p USING (source, lang)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // NFC replay: DuckDB's nfc_normalize is the same Unicode TR15
    // canonical composition as java.text.Normalizer — byte-for-byte.
    "x_text_normalize" ->
      """WITH raw AS (SELECT doc_id,
        |    CASE WHEN doc_id % 13 = 0 THEN text || ' cafe' || chr(769)
        |         ELSE text END r
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(length(r) - length(nfc_normalize(r)) AS INTEGER) AS n_composed,
        |  nfc_normalize(r) <> r AS changed,
        |  substring(nfc_normalize(r), -6, 6) AS tail
        |FROM raw ORDER BY doc_id""".stripMargin,

    // Cross-document boilerplate scrub replay: same synthetic
    // header/footer lines, df over DISTINCT docs per trimmed line
    // (string-keyed — proving the Spark side's md5 digest grouping
    // collision-free), same ≥ 5 cutoff, same in-place keep filter
    // (whitespace-only lines structural, never counted, never removed).
    "x_boilerplate_scrub" -> boilerplateScrubSql(""),
    "x_boilerplate_incremental" -> boilerplateScrubSql("WHERE t.doc_id % 5 = 0"),

    // Line-dedup replay: same synthetic duplicate (first line
    // re-appended), keep-first via DuckDB's indexed list lambda
    // (list_position = first occurrence, exactly Spark's
    // array_position).
    "x_line_dedup" ->
      """WITH w AS (SELECT doc_id,
        |        regexp_replace(text, ' value ', '.' || chr(10), 'g') t0 FROM documents),
        |w2 AS (SELECT doc_id,
        |        t0 || chr(10) || string_split(t0, chr(10))[1] t FROM w),
        |d AS (SELECT doc_id,
        |        list_filter(string_split(t, chr(10)), l -> trim(l) <> '') lines FROM w2),
        |k AS (SELECT doc_id, lines,
        |        list_filter(lines, (l, i) -> list_position(lines, l) = i) kept FROM d)
        |SELECT doc_id, CAST(len(lines) AS INTEGER) AS n_lines,
        |  CAST(len(kept) AS INTEGER) AS n_kept,
        |  substring(array_to_string(kept, chr(10)), 1, 60) AS head
        |FROM k ORDER BY doc_id""".stripMargin,

    // Corpus diff replay: identical synthetic v1 (drop %7, stale text
    // on %11), fingerprint full-outer, per-source status counts.
    "x_corpus_diff" ->
      """WITH v1 AS (SELECT doc_id, source s1, md5(lower(trim(
        |        CASE WHEN doc_id % 11 = 0 THEN text || ' stale' ELSE text END))) fp1
        |      FROM documents WHERE doc_id % 7 <> 0),
        |v2 AS (SELECT doc_id, source s2, md5(lower(trim(text))) fp2 FROM documents),
        |j AS (SELECT coalesce(s2, s1) source,
        |        CASE WHEN fp1 IS NULL THEN 'added'
        |             WHEN fp2 IS NULL THEN 'removed'
        |             WHEN fp1 <> fp2 THEN 'changed'
        |             ELSE 'same' END st
        |      FROM v1 FULL OUTER JOIN v2 USING (doc_id))
        |SELECT source,
        |  CAST(count(*) FILTER (WHERE st = 'added') AS BIGINT) AS n_added,
        |  CAST(count(*) FILTER (WHERE st = 'removed') AS BIGINT) AS n_removed,
        |  CAST(count(*) FILTER (WHERE st = 'changed') AS BIGINT) AS n_changed,
        |  CAST(count(*) FILTER (WHERE st = 'same') AS BIGINT) AS n_same
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    // Token-divergence replay: same unigram KL over the shared token
    // stream; ln differences across libms sit at ulp scale, absorbed by
    // the 6-decimal round.
    "x_token_divergence" ->
      s"""WITH t AS (SELECT source, unnest($words) token FROM documents),
        |cst AS (SELECT source, token, count(*) c_st FROM t GROUP BY 1, 2),
        |ct AS (SELECT token, sum(c_st) c_t FROM cst GROUP BY 1),
        |ns AS (SELECT source, sum(c_st) n_s FROM cst GROUP BY 1),
        |n AS (SELECT sum(c_st) n FROM cst)
        |SELECT cst.source, CAST(max(ns.n_s) AS BIGINT) AS n_tokens,
        |  round(sum((c_st::DOUBLE / n_s) * ln((c_st::DOUBLE / n_s) / (c_t::DOUBLE / n.n))), 6)
        |    AS kl_vs_corpus
        |FROM cst JOIN ct USING (token) JOIN ns ON cst.source = ns.source, n
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Sliding-chunk replay: identical start arithmetic (inclusive
    // stepped series to greatest(1, n - size + stride)) and DuckDB's
    // inclusive 1-based list slice == Spark's slice(start, length).
    "x_chunk_tokens" ->
      s"""WITH w AS (SELECT doc_id, $words t FROM documents),
        |c AS (SELECT doc_id, len(t) n, t,
        |        unnest(generate_series(1, greatest(1, len(t) - 64 + 48), 48)) s
        |      FROM w WHERE len(t) > 0)
        |SELECT doc_id, CAST((s - 1) / 48 AS INTEGER) AS chunk_id,
        |  array_to_string(t[s:s+63], ' ') AS chunk_text,
        |  CAST(least(64, n - s + 1) AS INTEGER) AS n_tokens
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

    // Outlier trim replay: the threshold is Spark percentile_approx's
    // documented semantic — the SMALLEST value whose cumulative count
    // reaches ceil(q*n) — spelled out as a window cumsum + min, so the
    // two engines' differing quantile conventions never meet.
    "x_outlier_trim" ->
      """WITH n AS (SELECT source, count(*) n_total FROM documents GROUP BY 1),
        |r AS (SELECT source, n_chars,
        |        count(*) OVER (PARTITION BY source ORDER BY n_chars) cum
        |      FROM documents),
        |thr AS (SELECT r.source, min(n_chars) thr FROM r JOIN n USING (source)
        |        WHERE cum >= ceil(0.99 * n_total) GROUP BY 1)
        |SELECT d.source, CAST(n.n_total AS BIGINT) AS n_total,
        |  CAST(count(*) FILTER (WHERE d.n_chars <= thr.thr) AS BIGINT) AS n_kept
        |FROM documents d JOIN n USING (source) JOIN thr ON thr.source = d.source
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    // Model-output invariant oracle (the m7 idiom): the classifier's
    // contract — probability range, beats-majority, calibration — is
    // checked in-plan; DuckDB confirms the count and the booleans.
    "x_quality_model" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs, true AS probs_ok,
        |  true AS beats_majority, true AS calibrated
        |FROM documents""".stripMargin,

    // Model-output invariant oracle (the x_quality_model idiom) for the
    // multiclass tagger: count + the three contract booleans.
    "x_domain_model" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs, true AS probs_ok,
        |  true AS beats_majority, true AS preds_known
        |FROM documents""".stripMargin,

    // The incremental store assembles the exact monolithic index over
    // the union corpus, so its oracle IS the x_bm25_topk replay: equal
    // answers prove the appended df/n_docs/avgdl statistics are current.
    "x_bm25_incremental" ->
      s"""WITH tokd AS (SELECT doc_id, $words AS t FROM documents),
        |tf AS (SELECT doc_id, dl, term, count(*) tf FROM
        |         (SELECT doc_id, len(t) dl, unnest(t) term FROM tokd)
        |       GROUP BY 1, 2, 3),
        |df AS (SELECT term, count(*) df FROM tf GROUP BY 1),
        |st AS (SELECT count(*) n_docs, avg(len(t)) avgdl FROM tokd),
        |qt AS (SELECT DISTINCT qid, term FROM
        |         (SELECT doc_id qid, unnest(t[1:5]) term FROM tokd
        |          WHERE doc_id % 97 = 0)),
        |sc AS (SELECT qt.qid query_id, tf.doc_id,
        |         sum(ln(1 + (st.n_docs - df.df + 0.5) / (df.df + 0.5))
        |             * tf.tf * 2.2
        |             / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / st.avgdl))) score
        |       FROM qt JOIN tf ON tf.term = qt.term
        |         JOIN df ON df.term = qt.term CROSS JOIN st
        |       WHERE df.df::DOUBLE / st.n_docs <= 1.0
        |       GROUP BY 1, 2),
        |r AS (SELECT query_id, doc_id, round(score, 6) score,
        |        row_number() OVER (PARTITION BY query_id
        |          ORDER BY round(score, 6) DESC, doc_id) rn FROM sc)
        |SELECT query_id, doc_id, score, CAST(rn AS INTEGER) AS rank
        |FROM r WHERE rn <= 10 ORDER BY query_id, rank""".stripMargin,

    // BM25-after-delete replay: the index CTEs run over the SURVIVORS
    // only (the %5 slice is tombstoned and compacted away); queries
    // still come from the full corpus — a deleted doc's query text is
    // still a query. Equality proves decremented stats + rebuilt df.
    "x_bm25_delete" ->
      s"""WITH tokd AS (SELECT doc_id, $words AS t FROM documents
        |               WHERE doc_id % 5 <> 0),
        |tf AS (SELECT doc_id, dl, term, count(*) tf FROM
        |         (SELECT doc_id, len(t) dl, unnest(t) term FROM tokd)
        |       GROUP BY 1, 2, 3),
        |df AS (SELECT term, count(*) df FROM tf GROUP BY 1),
        |st AS (SELECT count(*) n_docs, avg(len(t)) avgdl FROM tokd),
        |qt AS (SELECT DISTINCT qid, term FROM
        |         (SELECT doc_id qid, unnest(($words)[1:5]) term FROM documents
        |          WHERE doc_id % 97 = 0)),
        |sc AS (SELECT qt.qid query_id, tf.doc_id,
        |         sum(ln(1 + (st.n_docs - df.df + 0.5) / (df.df + 0.5))
        |             * tf.tf * 2.2
        |             / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / st.avgdl))) score
        |       FROM qt JOIN tf ON tf.term = qt.term
        |         JOIN df ON df.term = qt.term CROSS JOIN st
        |       WHERE df.df::DOUBLE / st.n_docs <= 1.0
        |       GROUP BY 1, 2),
        |r AS (SELECT query_id, doc_id, round(score, 6) score,
        |        row_number() OVER (PARTITION BY query_id
        |          ORDER BY round(score, 6) DESC, doc_id) rn FROM sc)
        |SELECT query_id, doc_id, score, CAST(rn AS INTEGER) AS rank
        |FROM r WHERE rn <= 10 ORDER BY query_id, rank""".stripMargin,

    // Z-order key replay: same exact integer bucketization (// is
    // DuckDB integer division — the engine's pmod construction computes
    // the identical exact quotient) and an explicit bit-interleave sum.
    "x_zorder_key" ->
      """WITH st AS (SELECT min(o_custkey) mina, max(o_custkey) maxa,
        |                   min(o_orderkey) minb, max(o_orderkey) maxb FROM orders),
        |b AS (SELECT o_orderkey,
        |        ((o_custkey - mina) * 256) // (maxa - mina + 1) AS ba,
        |        ((o_orderkey - minb) * 256) // (maxb - minb + 1) AS bb
        |      FROM orders CROSS JOIN st)
        |SELECT o_orderkey, ba AS bucket_a, bb AS bucket_b,
        |  CAST(sum(((ba >> i) & 1) * (1::BIGINT << (2 * i))
        |         + ((bb >> i) & 1) * (1::BIGINT << (2 * i + 1))) AS BIGINT) AS zval
        |FROM b, unnest(generate_series(0, 7)) t(i)
        |GROUP BY 1, 2, 3 ORDER BY o_orderkey""".stripMargin,

    // RRF hybrid replay: the x_bm25_topk chain at k=20 plus the j8-style
    // cosine kNN chain (same query ids, no self-exclusion), fused by
    // score = Σ 1/(60 + rank) and re-ranked on the rounded fused score.
    // The SAME SQL also oracles x_hybrid_stored (below): the persisted
    // Hybrid.search at nprobe = nlist is spec-pinned equal to this
    // in-memory fusion, so one replay covers both plans.
    "x_hybrid_rrf" -> hybridRrfSql,

    // Retrieve-then-rerank: the x_bm25_topk chain at k=20 nominates the
    // candidates, exact cosine against the query doc's vector re-ranks
    // ONLY those, top-5 on the rounded score with doc-id tie-break.
    "x_rerank" ->
      s"""WITH tokd AS (SELECT doc_id, $words AS t FROM documents),
        |tf AS (SELECT doc_id, dl, term, count(*) tf FROM
        |         (SELECT doc_id, len(t) dl, unnest(t) term FROM tokd)
        |       GROUP BY 1, 2, 3),
        |dfr AS (SELECT term, count(*) df FROM tf GROUP BY 1),
        |st AS (SELECT count(*) n_docs, avg(len(t)) avgdl FROM tokd),
        |qt AS (SELECT DISTINCT qid, term FROM
        |         (SELECT doc_id qid, unnest(t[1:5]) term FROM tokd
        |          WHERE doc_id % 97 = 0)),
        |sc AS (SELECT qt.qid query_id, tf.doc_id,
        |         sum(ln(1 + (st.n_docs - dfr.df + 0.5) / (dfr.df + 0.5))
        |             * tf.tf * 2.2
        |             / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / st.avgdl))) score
        |       FROM qt JOIN tf ON tf.term = qt.term
        |         JOIN dfr ON dfr.term = qt.term CROSS JOIN st
        |       GROUP BY 1, 2),
        |bm AS (SELECT query_id, doc_id FROM
        |         (SELECT query_id, doc_id,
        |            row_number() OVER (PARTITION BY query_id
        |              ORDER BY round(score, 6) DESC, doc_id) rn FROM sc)
        |       WHERE rn <= 20),
        |q AS (SELECT vec_id qid, embedding qe FROM embeddings WHERE vec_id % 97 = 0),
        |cd AS (SELECT bm.query_id, bm.doc_id, q.qe, e.embedding ce
        |       FROM bm JOIN embeddings e ON e.vec_id = bm.doc_id
        |         JOIN q ON q.qid = bm.query_id),
        |u AS (SELECT query_id, doc_id, unnest(qe)::DOUBLE x,
        |        unnest(ce)::DOUBLE y FROM cd),
        |s2 AS (SELECT query_id, doc_id,
        |         round(sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))), 6) sim
        |       FROM u GROUP BY 1, 2),
        |fr AS (SELECT query_id, doc_id, sim,
        |         row_number() OVER (PARTITION BY query_id
        |           ORDER BY sim DESC, doc_id) rn FROM s2)
        |SELECT query_id, doc_id, sim AS score, CAST(rn AS INTEGER) AS rank
        |FROM fr WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin,

    // Hard-negative mining: per-anchor top-5 cosine among
    // DIFFERENT-label vectors, rounded score, id tie-break.
    // MMR replay: the greedy is re-run as a recursive CTE — base case
    // argmax relevance, each recursive step carries the selected ids AND
    // vectors, scores every remaining candidate, and keeps the winner
    // via the no-better-candidate NOT EXISTS (argmax without aggregates
    // — the recursive term allows neither grouping nor a second
    // recursive reference). Parity contract: every comparison is in
    // exact INTEGER millionths (7·relµ − 3·maxSimµ; a double-rounded
    // score would straddle decimal-half boundaries where the engines'
    // round() implementations disagree — mmr_select's Scaladoc); the
    // max-then-round order is equivalent to the engine's round-then-max
    // because rounding is monotone. Cosine is dot/(sqrt·sqrt) like the
    // engine kernel.
    "x_mmr_rerank" -> {
      def cosd(a: String, b: String) =
        s"list_dot_product($a, $b)/(sqrt(list_dot_product($a, $a))*sqrt(list_dot_product($b, $b)))"
      def score(relu: String, vecs: String, cv: String) =
        s"(7 * $relu - 3 * CAST(round(list_max(list_transform($vecs, " +
          s"pv -> ${cosd(cv, "pv")})) * 1000000.0) AS BIGINT))"
      s"""WITH RECURSIVE
        |q AS (SELECT vec_id qid, list_transform(embedding, x -> x::DOUBLE) qv
        |      FROM embeddings WHERE vec_id % 25 = 0),
        |p AS (SELECT qid, c.vec_id nid, qv, list_transform(c.embedding, x -> x::DOUBLE) cv
        |      FROM q CROSS JOIN embeddings c WHERE c.vec_id <> qid),
        |s AS (SELECT qid, nid, cv, ${cosd("qv", "cv")} sim FROM p),
        |cand AS (SELECT qid, nid, CAST(round(sim * 1000000.0) AS BIGINT) relu, cv FROM (
        |    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) rn FROM s)
        |  WHERE rn <= 20),
        |sel AS (
        |  SELECT c.qid, 1 step, [c.nid] picked, [c.cv] pvecs, c.nid out_nid,
        |         10 * c.relu score_u
        |  FROM cand c WHERE NOT EXISTS (SELECT 1 FROM cand c2 WHERE c2.qid = c.qid
        |    AND (c2.relu > c.relu OR (c2.relu = c.relu AND c2.nid < c.nid)))
        |  UNION ALL
        |  SELECT x.qid, x.step, x.picked, x.pvecs, x.nid, x.score_u FROM (
        |    SELECT s.qid, s.step + 1 step, list_append(s.picked, c.nid) picked,
        |           list_append(s.pvecs, c.cv) pvecs, c.nid,
        |           ${score("c.relu", "s.pvecs", "c.cv")} score_u,
        |           s.picked opicked, s.pvecs opvecs
        |    FROM sel s JOIN cand c ON c.qid = s.qid AND NOT list_contains(s.picked, c.nid)
        |    WHERE s.step < 5
        |  ) x
        |  WHERE NOT EXISTS (SELECT 1 FROM cand c2 WHERE c2.qid = x.qid
        |    AND NOT list_contains(x.opicked, c2.nid) AND c2.nid <> x.nid
        |    AND ((${score("c2.relu", "x.opvecs", "c2.cv")} > x.score_u)
        |      OR (${score("c2.relu", "x.opvecs", "c2.cv")} = x.score_u AND c2.nid < x.nid))))
        |SELECT qid AS query_id, out_nid AS neighbor_id, CAST(step AS INTEGER) AS rank,
        |  score_u / 10000000.0 AS mmr_score
        |FROM sel ORDER BY 1, 3""".stripMargin
    },

    "x_hard_negatives" ->
      """WITH a AS (SELECT vec_id aid, embedding av, label al
        |       FROM embeddings WHERE vec_id % 83 = 0),
        |p AS (SELECT aid, c.vec_id nid, av, c.embedding cv
        |      FROM a JOIN embeddings c ON c.label <> a.al),
        |u AS (SELECT aid, nid, unnest(av)::DOUBLE x, unnest(cv)::DOUBLE y FROM p),
        |s AS (SELECT aid, nid,
        |        round(sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))), 6) sim
        |      FROM u GROUP BY 1, 2),
        |r AS (SELECT aid, nid, sim, row_number() OVER (PARTITION BY aid
        |        ORDER BY sim DESC, nid) rn FROM s)
        |SELECT aid AS anchor_id, nid AS negative_id, sim,
        |  CAST(rn AS INTEGER) AS rank
        |FROM r WHERE rn <= 5 ORDER BY anchor_id, rank""".stripMargin,

    // Contrastive export replay: the x_hard_negatives chain for both
    // legs — same-label (self excluded) top-1 as 'pos', diff-label
    // top-5 as 'neg'.
    "x_contrastive_pairs" ->
      """WITH a AS (SELECT vec_id aid, embedding av, label al
        |       FROM embeddings WHERE vec_id % 83 = 0),
        |p AS (SELECT aid, c.vec_id nid, av, c.embedding cv, 'neg' rl
        |      FROM a JOIN embeddings c ON c.label <> a.al
        |      UNION ALL
        |      SELECT aid, c.vec_id nid, av, c.embedding cv, 'pos' rl
        |      FROM a JOIN embeddings c ON c.label = a.al AND c.vec_id <> a.aid),
        |u AS (SELECT aid, nid, rl, unnest(av)::DOUBLE x, unnest(cv)::DOUBLE y FROM p),
        |s AS (SELECT aid, nid, rl,
        |        round(sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))), 6) sim
        |      FROM u GROUP BY 1, 2, 3),
        |r AS (SELECT aid, nid, rl, sim, row_number() OVER (PARTITION BY aid, rl
        |        ORDER BY sim DESC, nid) rn FROM s)
        |SELECT aid AS anchor_id, rl AS "role", nid AS pair_id, sim,
        |  CAST(rn AS INTEGER) AS rank
        |FROM r WHERE (rl = 'neg' AND rn <= 5) OR (rl = 'pos' AND rn <= 1)
        |ORDER BY anchor_id, rl, rank""".stripMargin,

    "x_hybrid_stored" -> hybridRrfSql,


    "x_simhash" ->
      s"""WITH w AS (SELECT doc_id, $words wds FROM documents),
        |t AS (SELECT doc_id, md5_number_lower(unnest(wds)) h FROM w),
        |v AS (SELECT doc_id, b, sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) vote
        |      FROM t CROSS JOIN range(64) r(b) GROUP BY doc_id, b),
        |u AS (SELECT doc_id, sum(CASE WHEN vote > 0 THEN 1::HUGEINT << b ELSE 0 END) sh FROM v GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CASE WHEN d.text IS NULL THEN NULL
        |       ELSE coalesce((CASE WHEN u.sh >= 9223372036854775808 THEN u.sh - 18446744073709551616
        |                           ELSE u.sh END)::BIGINT, 0) END AS simhash
        |FROM documents d LEFT JOIN u ON u.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "x_simhash_pairs" ->
      s"""WITH w AS (SELECT doc_id, $words wds FROM documents),
        |t AS (SELECT doc_id, md5_number_lower(unnest(wds)) h FROM w),
        |v AS (SELECT doc_id, b, sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) vote
        |      FROM t CROSS JOIN range(64) r(b) GROUP BY doc_id, b),
        |u AS (SELECT doc_id, sum(CASE WHEN vote > 0 THEN 1::HUGEINT << b ELSE 0 END) sh FROM v GROUP BY doc_id),
        |s AS (SELECT d.doc_id,
        |        coalesce((CASE WHEN u.sh >= 9223372036854775808 THEN u.sh - 18446744073709551616
        |                       ELSE u.sh END)::BIGINT, 0) sh
        |      FROM documents d LEFT JOIN u ON u.doc_id = d.doc_id
        |      WHERE d.text IS NOT NULL)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
        |FROM s a JOIN s b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sh, b.sh)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    // Cosine LSH: hyperplane component (j,i) = ±1 from bit 0 of
    // md5_number_lower('j|i') — identical to the kernel's sign table.
    "x_cosine_lsh_pairs" ->
      """WITH u AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 i, unnest(embedding)::DOUBLE x
        |      FROM embeddings),
        |hp AS (SELECT j, i,
        |    CASE WHEN md5_number_lower(j || '|' || i) & 1 = 0 THEN 1.0 ELSE -1.0 END h
        |  FROM range(8) a(j) CROSS JOIN (SELECT DISTINCT i FROM u) b),
        |d AS (SELECT vec_id, j, sum(x * h ORDER BY i) dot FROM u JOIN hp USING (i) GROUP BY vec_id, j),
        |sk AS (SELECT vec_id, CAST(sum(CASE WHEN dot >= 0 THEN (1 << j) ELSE 0 END) AS INTEGER) sk
        |       FROM d GROUP BY vec_id)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |FROM sk a JOIN sk b ON a.sk = b.sk AND a.vec_id < b.vec_id
        |ORDER BY id_a, id_b""".stripMargin,

    "x_neardup_cosine" ->
      """WITH p AS (SELECT a.vec_id ia, b.vec_id ib, a.embedding ea, b.embedding eb
        |             FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id),
        |u AS (SELECT ia, ib, unnest(ea)::DOUBLE x, unnest(eb)::DOUBLE y FROM p),
        |s AS (SELECT ia, ib, sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))) sim FROM u GROUP BY ia, ib)
        |SELECT ia AS id_a, ib AS id_b, round(sim, 6) AS sim
        |FROM s WHERE sim >= 0.3 ORDER BY id_a, id_b""".stripMargin,

    // SemDeDup replay: per-label mean centroids, argmax-cosine assignment
    // (lowest-label tie-break = the engine's max(struct(sim, -cid))),
    // then the paper's upper-triangular drop test — b is dropped iff some
    // same-cluster a ordered earlier (centroid-sim ASC, id ASC) has
    // cosine(a, b) >= eps. Pure joins, no recursion: the drop predicate
    // is ∃-earlier-neighbor, not a greedy chain. The order key rounds to
    // 6 decimals on BOTH sides: raw parallel-summed doubles differ in
    // their last ulps between evaluations (DuckDB re-evaluates the
    // inlined CTE per reference — a raw-keyed strict < even self-pairs
    // half the corpus), so a reproducible order needs a rounded key.
    "x_semdedup" ->
      """WITH u AS (SELECT label, generate_subscripts(embedding, 1) pos, unnest(embedding)::DOUBLE x
        |             FROM embeddings),
        |cent AS (SELECT label clabel, pos, avg(x) m FROM u GROUP BY 1, 2),
        |ev AS (SELECT vec_id, generate_subscripts(embedding, 1) pos, unnest(embedding)::DOUBLE x
        |         FROM embeddings),
        |s AS (SELECT vec_id, clabel,
        |        sum(ev.x * cent.m) / (sqrt(sum(ev.x * ev.x)) * sqrt(sum(cent.m * cent.m))) sim
        |      FROM ev JOIN cent ON ev.pos = cent.pos GROUP BY vec_id, clabel),
        |r AS (SELECT vec_id, clabel, sim,
        |        row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, clabel) rn FROM s),
        |asg AS (SELECT vec_id, clabel cl, sim csim, round(sim, 6) ord FROM r WHERE rn = 1),
        |p AS (SELECT xa.vec_id ia, xb.vec_id ib, ea.embedding va, eb.embedding vb
        |        FROM asg xa JOIN asg xb ON xa.cl = xb.cl
        |         AND (xa.ord < xb.ord OR (xa.ord = xb.ord AND xa.vec_id < xb.vec_id))
        |        JOIN embeddings ea ON ea.vec_id = xa.vec_id
        |        JOIN embeddings eb ON eb.vec_id = xb.vec_id),
        |pu AS (SELECT ia, ib, unnest(va)::DOUBLE x, unnest(vb)::DOUBLE y FROM p),
        |ps AS (SELECT ia, ib, sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))) sim
        |         FROM pu GROUP BY ia, ib),
        |drp AS (SELECT DISTINCT ib vec_id FROM ps WHERE sim >= 0.3)
        |SELECT a.vec_id, CAST(a.cl AS BIGINT) AS cluster_id,
        |  round(a.csim, 6) AS centroid_sim, (d.vec_id IS NULL) AS kept
        |FROM asg a LEFT JOIN drp d USING (vec_id)
        |ORDER BY a.vec_id""".stripMargin,

    // Incremental SemDeDup replay: centroids fitted on the CORPUS split
    // (vec_id % 5 <> 0) only; everything assigns to those fixed
    // centroids; pairs (a earlier, b in batch) where earlier = any
    // corpus member, or a batch member under the paper order. Verdicts
    // for the batch split only.
    "x_semdedup_incremental" -> semDedupIncSql,

    "x_semdedup_store" -> semDedupIncSql,

    // Embedding-dedup cascade: the x_neardup_cosine pair set closed
    // under connectivity by the same recursive-CTE fixpoint as
    // x_dup_components, min reachable id as the representative.
    "pipe_embed_dedup_e2e" ->
      """WITH RECURSIVE p0 AS (SELECT a.vec_id ia, b.vec_id ib, a.embedding ea, b.embedding eb
        |             FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id),
        |u AS (SELECT ia, ib, unnest(ea)::DOUBLE x, unnest(eb)::DOUBLE y FROM p0),
        |sp AS (SELECT ia, ib FROM (
        |    SELECT ia, ib, sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))) sim
        |    FROM u GROUP BY ia, ib) WHERE sim >= 0.3),
        |e AS (SELECT ia s, ib d FROM sp UNION SELECT ib, ia FROM sp),
        |r AS (SELECT s AS id, s AS lbl FROM e
        |      UNION
        |      SELECT e.d, r.lbl FROM r JOIN e ON e.s = r.id),
        |c AS (SELECT id, min(lbl) component FROM r GROUP BY id)
        |SELECT em.vec_id, coalesce(c.component, em.vec_id) AS component,
        |  (coalesce(c.component, em.vec_id) = em.vec_id) AS kept
        |FROM embeddings em LEFT JOIN c ON c.id = em.vec_id
        |ORDER BY em.vec_id""".stripMargin,

    // ──────────── wave 2 ────────────
    "p1_projection" ->
      """SELECT o_orderkey, COALESCE(o_orderpriority, 'NONE') AS priority,
        |  concat_ws('-', o_orderstatus, o_orderpriority) AS tag
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "p2_filter_notnull" ->
      """SELECT event_id FROM events WHERE props IS NOT NULL ORDER BY event_id""".stripMargin,

    "p3_filter_nonempty" ->
      """SELECT doc_id FROM documents WHERE length(trim(text)) > 0 ORDER BY doc_id""".stripMargin,

    "p4_needs_summary" ->
      """WITH s AS (SELECT user_id, max(ts) lu,
        |             max(CASE WHEN event_type = 'signup' THEN ts END) ls
        |           FROM events GROUP BY user_id)
        |SELECT user_id FROM s WHERE ls IS NULL OR lu > ls ORDER BY user_id""".stripMargin,

    "p5_recent_filter" ->
      """SELECT event_id FROM events WHERE ts >= TIMESTAMP '2024-01-24 00:00:00'
        |ORDER BY event_id""".stripMargin,

    "p6_score_filter" ->
      """SELECT event_id, value FROM events
        |WHERE value IS NOT NULL AND value >= 100.0 ORDER BY event_id""".stripMargin,

    "p7_noise_filter" ->
      """SELECT vec_id, cluster FROM (
        |  SELECT vec_id, CASE WHEN vec_id % 7 = 0 THEN -1 ELSE label END AS cluster
        |  FROM embeddings) WHERE cluster != -1 ORDER BY vec_id""".stripMargin,

    "p8_unprocessed" ->
      """SELECT event_id FROM events WHERE NOT (value > 100.0) ORDER BY event_id""".stripMargin,

    "p9_nonempty_vec" ->
      """SELECT vec_id FROM embeddings WHERE len(embedding) > 0 ORDER BY vec_id""".stripMargin,

    "p14_concat" ->
      """SELECT doc_id, concat_ws(' ', lang, substr(text, 1, 10)) AS headline
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Name-based (v3) UUID re-derived from the same md5: version nibble
    // '3', variant from hex digit 17 mapped into 8..b.
    "p17_idgen" ->
      """WITH h AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':' || text) m FROM documents)
        |SELECT doc_id,
        |  substr(m,1,8) || '-' || substr(m,9,4) || '-3' || substr(m,14,3) || '-' ||
        |  (['8','9','a','b'])[(strpos('0123456789abcdef', substr(m,17,1)) - 1) % 4 + 1] ||
        |  substr(m,18,3) || '-' || substr(m,21,12) AS content_id,
        |  row_number() OVER (ORDER BY doc_id) AS seq_id
        |FROM h ORDER BY doc_id""".stripMargin,

    "p18_cast_project" ->
      """SELECT CAST(o_orderkey AS VARCHAR) AS id_str, CAST(o_custkey AS INTEGER) AS cust_int
        |FROM orders ORDER BY id_str""".stripMargin,

    "j2_explode_join" ->
      """SELECT o_custkey AS story_id, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY o_custkey ORDER BY story_id""".stripMargin,

    "a6_member_list" ->
      """SELECT label, array_to_string(list_sort(list(vec_id)), ',') AS members,
        |  count(*) AS n_members
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin,

    "a10_minmax_agg" ->
      """SELECT user_id, max(value) AS mx, min(value) AS mn,
        |  round(max(value) - min(value), 4) AS rng
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "a11_counts" ->
      """SELECT event_type, count(*) AS n FROM events
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "t5_order_limit" ->
      """SELECT event_id, epoch_ms(ts) AS ts_ms FROM events
        |ORDER BY ts DESC, event_id LIMIT 20""".stripMargin,

    "t6_argmax" ->
      """SELECT user_id, value, event_id FROM (
        |  SELECT user_id, value, event_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "d1_ttl_dedup" ->
      """SELECT user_id, event_type, CAST(date_trunc('day', ts) AS DATE) AS day, event_id
        |FROM (SELECT user_id, event_type, ts, event_id,
        |        row_number() OVER (PARTITION BY user_id, event_type, date_trunc('day', ts)
        |                           ORDER BY ts, event_id) rn
        |      FROM events) WHERE rn = 1
        |ORDER BY user_id, event_type, day""".stripMargin,

    "d3_jaccard_scalar" ->
      """WITH p AS (SELECT l_orderkey k, list_sort(list(DISTINCT l_partkey)) parts
        |           FROM lineitem GROUP BY l_orderkey)
        |SELECT a.k AS ka, b.k AS kb,
        |  CAST(len(list_intersect(a.parts, b.parts)) AS INTEGER) AS inter,
        |  CAST(len(list_distinct(a.parts || b.parts)) AS INTEGER) AS uni,
        |  round(len(list_intersect(a.parts, b.parts))::DOUBLE /
        |        len(list_distinct(a.parts || b.parts)), 6) AS jaccard
        |FROM p a JOIN p b ON b.k = a.k + 1 ORDER BY ka""".stripMargin,

    "m4_l2_normalize" ->
      """SELECT vec_id,
        |  array_to_string(list_transform(embedding, x -> printf('%.6f', round(x::DOUBLE /
        |    sqrt(list_sum(list_transform(embedding, y -> y::DOUBLE * y::DOUBLE))), 6))), ',') AS unit
        |FROM embeddings WHERE vec_id < 50 ORDER BY vec_id""".stripMargin,

    "a8a9_bias_reports" ->
      """WITH r AS (SELECT doc_id % 50 log_id, source, substr(text, 1, 50) headline FROM documents),
        |s AS (SELECT log_id, source,
        |  (len(list_filter(w, t -> t IN ('fast','big','win','good','great'))) -
        |   len(list_filter(w, t -> t IN ('slow','small','error','bad','fail'))))::DOUBLE / len(w) sent
        |  FROM (SELECT log_id, source,
        |        list_filter(regexp_split_to_array(lower(trim(headline)), '[ \t\n\x0b\f\r]+'), t -> t <> '') w FROM r)),
        |g AS (SELECT log_id, count(DISTINCT source)::DOUBLE / count(*) d, avg(sent) m
        |      FROM s GROUP BY log_id)
        |SELECT log_id, round(d, 6) AS diversity_score, round(m, 6) AS average_sentiment,
        |  (d < 0.5 OR m < 0.0) AS bias_flag
        |FROM g ORDER BY log_id""".stripMargin,

    "x_mm_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS payload_bytes,
        |  sha256(text) AS payload_sha256
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Exact media dedup replay: same shared-asset synthesis, same
    // sha256 grouping, min-id survivor.
    "x_mm_exact_dedup" ->
      """WITH p AS (SELECT doc_id,
        |  CASE WHEN doc_id % 9 = 0 THEN 'shared banner asset' ELSE text END pl
        |  FROM documents)
        |SELECT min(doc_id) AS doc_id, sha256(pl) AS payload_sha256,
        |  count(*) AS n_copies, count(*) > 1 AS had_dups
        |FROM p GROUP BY 2 ORDER BY doc_id""".stripMargin,

    // Real codec round-trip: PNG is lossless and the fixture images are
    // solid-colour with doc_id-derived dims, so the decoded dims and
    // exact integer pixel sum are pure arithmetic — (r+g+b) · w · h.
    "x_mm_real_decode" ->
      """SELECT doc_id,
        |  CAST(doc_id % 29 + 8 AS INTEGER) AS width,
        |  CAST(doc_id % 13 + 8 AS INTEGER) AS height,
        |  CAST(3 AS INTEGER) AS channels,
        |  ((doc_id*7) % 251 + (doc_id*13) % 251 + (doc_id*31) % 251)
        |    * (doc_id % 29 + 8) * (doc_id % 13 + 8) AS luma3_sum,
        |  true AS ok
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Perceptual-hash contract: the oracle predicts the CLUSTERS (one
    // per doc_id % 40 source image — dHash is invariant under the
    // brightness shifts, distinct across patterns) and the byte-variant
    // count (one distinct payload per shift), never the hash value.
    "x_mm_phash_dedup" ->
      """SELECT min(doc_id) AS rep_id, count(*) AS n_members,
        |  count(DISTINCT (doc_id // 40) % 3) AS n_byte_variants
        |FROM documents GROUP BY doc_id % 40 ORDER BY rep_id""".stripMargin,

    // Gopher repetition rules: line structure synthesized identically,
    // then duplicate-line fraction + modal-bigram coverage.
    "x_repetition" ->
      s"""WITH t AS (SELECT doc_id, regexp_replace(text, ' value ', chr(10), 'g') AS text
        |           FROM documents),
        |l AS (SELECT doc_id,
        |        list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)), x -> x <> '') ls,
        |        $words wds
        |      FROM t),
        |d AS (SELECT doc_id,
        |        CASE WHEN len(ls) > 0 THEN 1.0 - len(list_distinct(ls))::DOUBLE / len(ls)
        |             ELSE 0.0 END dlf,
        |        list_transform(generate_series(1, greatest(len(wds) - 1, 0)),
        |          i -> wds[i] || ' ' || wds[i + 1]) bg
        |      FROM l),
        |e AS (SELECT doc_id, unnest(bg) g FROM d),
        |m AS (SELECT doc_id, max(c) top, sum(c) tot
        |      FROM (SELECT doc_id, g, count(*) c FROM e GROUP BY 1, 2) GROUP BY 1)
        |SELECT d.doc_id, round(dlf, 6) AS dup_line_frac,
        |  round(coalesce(top::DOUBLE / tot, 0.0), 6) AS top_bigram_frac,
        |  (dlf < 0.3 AND coalesce(top::DOUBLE / tot, 0.0) < 0.2) AS keep
        |FROM d LEFT JOIN m ON m.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // Full Gopher rules: same deterministic structure synthesis, same
    // modal-n-gram coverage per n ∈ {2,3,4}, same line/word signals.
    "x_gopher_full" ->
      s"""WITH t AS (SELECT doc_id,
        |    (CASE WHEN doc_id % 5 = 0 THEN '- item one' || chr(10) || '- item two' || chr(10) ELSE '' END) ||
        |    regexp_replace(text, ' value ', chr(10), 'g') ||
        |    (CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'wait for it...' ELSE '' END) ||
        |    (CASE WHEN doc_id % 11 = 0 THEN ' ## #' ELSE '' END) ||
        |    (CASE WHEN doc_id % 3 = 0 THEN chr(10) || chr(10) || 'repeated closing paragraph' ||
        |      chr(10) || chr(10) || 'repeated closing paragraph' ELSE '' END) AS text
        |  FROM documents),
        |tw AS (SELECT doc_id, text, $words wds FROM t),
        |${gopherCtes("tw")}
        |SELECT gst.doc_id, round(dlf, 6) AS dup_line_frac,
        |  round(dpf, 6) AS dup_paragraph_frac,
        |  round(dlcf, 6) AS dup_line_char_frac,
        |  round(dpcf, 6) AS dup_paragraph_char_frac,
        |  round(coalesce(t2, 0.0), 6) AS top_2gram_frac,
        |  round(coalesce(t3, 0.0), 6) AS top_3gram_frac,
        |  round(coalesce(t4, 0.0), 6) AS top_4gram_frac,
        |  round(swr, 6) AS symbol_word_ratio,
        |  round(blf, 6) AS bullet_line_frac,
        |  round(elf, 6) AS ellipsis_line_frac,
        |  round(mwl, 6) AS mean_word_len,
        |  nw AS n_words, round(awf, 6) AS alpha_word_frac,
        |  nsh AS n_stop_hits,
        |  $gopherKeepSql AS keep
        |FROM gst LEFT JOIN gp USING (doc_id)
        |ORDER BY gst.doc_id""".stripMargin,

    // Decontamination: distinct 3-gram digests of the eval slice probed
    // by every training doc.
    "x_decontaminate" ->
      s"""WITH w AS (SELECT doc_id, $words wds FROM documents),
        |g AS (SELECT doc_id,
        |        list_distinct(list_transform(generate_series(1, greatest(len(wds) - 2, 0)),
        |          i -> md5(array_to_string(wds[i:i+2], ' ')))) gs
        |      FROM w),
        |ev AS (SELECT DISTINCT unnest(gs) g FROM g WHERE doc_id % 13 = 0),
        |tr AS (SELECT doc_id, unnest(gs) g FROM g WHERE doc_id % 13 <> 0),
        |c AS (SELECT t.doc_id, count(ev.g) n FROM tr t LEFT JOIN ev ON ev.g = t.g GROUP BY 1)
        |SELECT tb.doc_id, coalesce(c.n, 0) AS n_overlap,
        |  coalesce(c.n, 0) > 0 AS contaminated
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 13 <> 0) tb
        |LEFT JOIN c ON c.doc_id = tb.doc_id
        |ORDER BY tb.doc_id""".stripMargin,

    // PII redaction replay: same synthetic PII, same RE2-safe patterns,
    // same replacement order (emails → IPs → spaced phones → contiguous
    // phones). DuckDB backreferences are \1-style where Spark's are $1.
    "x_pii_redact" ->
      """WITH t AS (SELECT doc_id,
        |    text || ' contact user' || doc_id || '@mail.example.com or +1 (555) 010-' ||
        |    doc_id || ' at 192.168.' || (doc_id % 256) || '.17' AS text FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INTEGER) AS n_ips,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '(^|[^\d])((\+?\d{1,3}[\s.-])?\(?\d{3}\)?[\s.-]\d{3}[\s.-]\d{4})([^\d]|$)', '\1<PHONE>\4', 'g'),
        |    '\+?\d[\d().-]{6,}\d', '<PHONE>', 'g') AS redacted
        |FROM t ORDER BY doc_id""".stripMargin,

    // Duplicate components: the same Jaccard pairs as x_ngram_jaccard,
    // closed under connectivity by a recursive reachability CTE — the
    // min reachable id IS the min-label-propagation fixpoint.
    "x_dup_components" ->
      s"""$dupComponentCtes
         |SELECT doc.doc_id, coalesce(c.component, doc.doc_id) AS component
         |FROM documents doc LEFT JOIN c ON c.id = doc.doc_id
         |ORDER BY doc.doc_id""".stripMargin,

    // Dedup loss-weight replay: same closure, survivor = min-id (= the
    // component label), weight = member count.
    "x_dedup_weight" ->
      s"""$dupComponentCtes
         |SELECT coalesce(c.component, doc.doc_id) AS doc_id,
         |  count(*) AS weight
         |FROM documents doc LEFT JOIN c ON c.id = doc.doc_id
         |GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // Cluster-size histogram: same closure, two grouped counts.
    "x_dup_histogram" ->
      s"""$dupComponentCtes,
         |hmemb AS (SELECT coalesce(c.component, doc.doc_id) component
         |      FROM documents doc LEFT JOIN c ON c.id = doc.doc_id),
         |hsz AS (SELECT component, count(*) csz FROM hmemb GROUP BY 1)
         |SELECT CAST(csz AS BIGINT) AS cluster_size,
         |  CAST(count(*) AS BIGINT) AS n_components,
         |  CAST(sum(csz) AS BIGINT) AS n_docs
         |FROM hsz GROUP BY 1 ORDER BY 1""".stripMargin,

    // Quality-aware representative: same closure, survivor = n_chars
    // argmax with doc-id tie-break (row_number replay of max_by).
    "x_dup_rep_quality" ->
      s"""$dupComponentCtes,
         |q AS (SELECT doc.doc_id, coalesce(c.component, doc.doc_id) component,
         |        doc.n_chars
         |      FROM documents doc LEFT JOIN c ON c.id = doc.doc_id),
         |rk AS (SELECT doc_id, component,
         |         row_number() OVER (PARTITION BY component
         |           ORDER BY n_chars DESC, doc_id ASC) rn FROM q),
         |r1 AS (SELECT component, doc_id rep_id FROM rk WHERE rn = 1)
         |SELECT q.doc_id, q.component, r1.rep_id,
         |  (q.doc_id = r1.rep_id) AS keep
         |FROM q JOIN r1 ON r1.component = q.component
         |ORDER BY q.doc_id""".stripMargin,

    // Quantized-kNN invariant: shape + recall vs the float-exact top-k
    // are computed in-plan on the Spark side; the oracle states the
    // query count from the raw table and the contract as truths.
    "x_ann_quant" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_queries, CAST(5 AS INTEGER) AS k,
        |  true AS rows_ok, true AS recall_ok
        |FROM embeddings WHERE vec_id < 20""".stripMargin,

    // Stored-PQ invariants (stored ≡ memory, recall band, shape) are
    // computed Spark-side — the oracle pins the query count and the
    // expected all-true verdicts.
    "x_ann_pq_stored" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_queries, CAST(5 AS INTEGER) AS k,
        |  true AS rows_ok, true AS stored_eq_memory, true AS recall_ok
        |FROM embeddings WHERE vec_id < 20""".stripMargin,

    // IVF-PQ invariants (recall band, code range, exact shape) are
    // computed Spark-side — the oracle pins the query count and the
    // expected all-true verdicts.
    "x_ann_ivf_pq" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_queries, CAST(5 AS INTEGER) AS k,
        |  true AS rows_ok, true AS codes_ok, true AS recall_ok
        |FROM embeddings WHERE vec_id < 20""".stripMargin,

    // PQ invariants (recall band, code range, exact shape) are computed
    // Spark-side — the oracle pins the query count and the expected
    // all-true verdicts.
    "x_ann_pq" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_queries, CAST(5 AS INTEGER) AS k,
        |  true AS rows_ok, true AS codes_ok, true AS recall_ok
        |FROM embeddings WHERE vec_id < 20""".stripMargin,

    // Curation funnel replay: the x_langid, x_quality, x_gopher_full
    // (raw text, no synthesis) and PII-count fragments composed into the
    // one admission verdict.
    "x_curation_verdict" ->
      s"""WITH w AS (SELECT doc_id, text, $words wds FROM documents),
         |lg AS (SELECT doc_id,
         |  len(list_filter(wds, t -> t IN ('the','and','of','is','a'))) s_en,
         |  len(list_filter(wds, t -> t IN ('der','die','und','ist','das'))) s_de,
         |  len(list_filter(wds, t -> t IN ('el','los','y','es','una'))) s_es,
         |  len(list_filter(wds, t -> t IN ('le','la','et','est','une'))) s_fr FROM w),
         |lang AS (SELECT doc_id, CASE WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
         |  WHEN s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
         |  WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
         |  WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
         |  ELSE 'fr' END AS lang_pred FROM lg),
         |qm AS (SELECT doc_id, len(wds) nt,
         |  len(list_filter(wds, t -> t IN $stops))::DOUBLE / len(wds) stop_ratio,
         |  list_sum(list_transform(wds, t -> length(t)))::DOUBLE / len(wds) awl FROM w),
         |q AS (SELECT doc_id, round(
         |  least(nt / 50.0, 1.0) * 0.5 +
         |  (CASE WHEN stop_ratio > 0.01 THEN 1.0 ELSE 0.5 END) * 0.25 +
         |  (CASE WHEN awl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.5 END) * 0.25, 6) AS quality
         |  FROM qm),
         |pii AS (SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) +
         |       len(regexp_extract_all(text, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS INTEGER) n_pii
         |  FROM w),
         |${gopherCtes("w")},
         |g AS (SELECT gst.doc_id, $gopherKeepSql AS gopher_keep
         |  FROM gst LEFT JOIN gp USING (doc_id))
         |SELECT w.doc_id, lang.lang_pred, q.quality, pii.n_pii, g.gopher_keep,
         |  (lang.lang_pred <> 'und' AND q.quality >= 0.5 AND g.gopher_keep
         |   AND pii.n_pii = 0) AS admit
         |FROM w JOIN lang USING (doc_id) JOIN q USING (doc_id)
         |JOIN pii USING (doc_id) JOIN g USING (doc_id)
         |ORDER BY w.doc_id""".stripMargin,

    // MinHash estimate replay: same signatures (salted-md5 mins), same
    // candidate pairs, agreement fraction over the 4 slots vs the exact
    // Jaccard of the same pair.
    "x_minhash_est" ->
      s"""WITH $lshCandCtes
         |SELECT c.ia AS id_a, c.ib AS id_b,
         |  len(list_filter([1, 2, 3, 4], k -> coalesce(x.sg[k] = y.sg[k], false)))::DOUBLE / 4.0 AS est,
         |  round(li.inter::DOUBLE / (sx.n + sy.n - li.inter), 6) AS jaccard
         |FROM cand c
         |JOIN lsig x ON x.doc_id = c.ia JOIN lsig y ON y.doc_id = c.ib
         |JOIN li ON li.ia = c.ia AND li.ib = c.ib
         |JOIN lsz sx ON sx.doc_id = c.ia JOIN lsz sy ON sy.doc_id = c.ib
         |ORDER BY id_a, id_b""".stripMargin,

    // Int8 quantization replay: same scale formula, same floor-based
    // rounding, same clamp — codes compare as exact integers, the scale
    // as the identical double, the error contract as the same boolean.
    "x_embed_quant" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
        |  FROM embeddings),
        |s AS (SELECT vec_id, v,
        |    coalesce(list_max(list_transform(v, x -> abs(x))), 0.0) / 127.0 scale FROM e),
        |q AS (SELECT vec_id, scale, v,
        |    CASE WHEN scale = 0 THEN list_transform(v, x -> 0)
        |         ELSE list_transform(v, x ->
        |           CAST(greatest(-127.0, least(127.0, floor(x / scale + 0.5))) AS INTEGER)) END qs
        |  FROM s)
        |SELECT vec_id, scale, array_to_string(qs, ',') AS q,
        |  coalesce(list_max(list_transform(generate_series(1, len(v)),
        |    i -> abs(v[i] - qs[i] * scale))), 0.0) <= scale / 2 * 1.000000001 AS err_ok
        |FROM q ORDER BY vec_id""".stripMargin,

    // Dedup cascade: LSH candidates (as x_lsh_pairs) intersected with
    // the ≥-threshold Jaccard pairs (as x_ngram_jaccard), closed by the
    // recursive reachability CTE (as x_dup_components); kept = the doc
    // IS its component's min-id label.
    "pipe_dedup_e2e" ->
      s"""WITH RECURSIVE $lshCandCtes,
         |p AS (SELECT li.ia, li.ib FROM li JOIN cand USING (ia, ib)
         |  JOIN lsz x ON x.doc_id = li.ia JOIN lsz y ON y.doc_id = li.ib
         |  WHERE inter::DOUBLE / (x.n + y.n - inter) >= 0.02),
         |e AS (SELECT ia s, ib d FROM p UNION SELECT ib, ia FROM p),
         |r AS (SELECT s AS id, s AS lbl FROM e
         |      UNION
         |      SELECT e.d, r.lbl FROM r JOIN e ON e.s = r.id),
         |cc AS (SELECT id, min(lbl) component FROM r GROUP BY id)
         |SELECT doc.doc_id, coalesce(cc.component, doc.doc_id) AS component,
         |  (coalesce(cc.component, doc.doc_id) = doc.doc_id) AS kept
         |FROM documents doc LEFT JOIN cc ON cc.id = doc.doc_id
         |ORDER BY doc.doc_id""".stripMargin,

    // Corpus report card: one aggregation over the same token stream.
    "x_corpus_stats" ->
      s"""WITH w AS (SELECT doc_id, lang, text, $words wds FROM documents)
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(wds)) AS BIGINT) AS n_tokens,
        |  round(avg(len(wds)), 6) AS avg_tokens,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |  CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique_texts,
        |  round(1.0 - count(DISTINCT md5(text))::DOUBLE / count(*), 6) AS dup_frac
        |FROM w""".stripMargin,

    // OOV rate vs the corpus top-100 vocabulary (same deterministic
    // tie-break as x_vocab_topk), per document.
    // Split assignment: same salted digest, contiguous bucket ranges.
    "x_split_assign" ->
      """SELECT doc_id,
        |  CASE WHEN md5_number_lower('sp|' || CAST(doc_id AS VARCHAR)) % 1000000 < 800000 THEN 'train'
        |       WHEN md5_number_lower('sp|' || CAST(doc_id AS VARCHAR)) % 1000000 < 900000 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Stratified split replay: same per-stratum digest rank, same
    // ceil(f·n) cuts — the FP product (0.8·n can land a hair above the
    // integer) is computed identically by both engines, so the cut
    // points agree even at the wobble.
    "x_split_stratified" ->
      """WITH r AS (SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5_number_lower('ss|' || CAST(doc_id AS VARCHAR)) % 1000000,
        |        CAST(doc_id AS VARCHAR)) rk,
        |    count(*) OVER (PARTITION BY lang) n
        |  FROM documents)
        |SELECT doc_id, lang,
        |  CASE WHEN rk <= ceil(0.8 * n) THEN 'train'
        |       WHEN rk <= ceil(0.9 * n) THEN 'val'
        |       ELSE 'test' END AS split
        |FROM r ORDER BY doc_id""".stripMargin,

    // Exact-size sample: same salted-digest order, k-row prefix.
    "x_fixed_sample" ->
      """SELECT doc_id FROM (
        |  SELECT doc_id FROM documents
        |  ORDER BY md5_number_lower('fx|' || CAST(doc_id AS VARCHAR)) % 1000000, doc_id
        |  LIMIT 50)
        |ORDER BY doc_id""".stripMargin,

    // UniMax waterfill replay: identical closed form — sort by capacity
    // ascending, per-position uniform level over the remaining budget,
    // water level = max level among unsaturated positions. Every number
    // is integer-valued-in-double or an exact half (cap = nt * 0.5), so
    // the window sums are bit-exact across engines; rounding is
    // cosmetic.
    "x_unimax_mix" ->
      s"""WITH w AS (SELECT lang, CAST(sum(len($words)) AS DOUBLE) nt
        |      FROM documents GROUP BY 1),
        |tot AS (SELECT 0.4 * sum(nt) b, count(*) n FROM w),
        |s AS (SELECT lang, nt, nt * 0.5 cap,
        |        row_number() OVER (ORDER BY nt * 0.5, lang) i,
        |        coalesce(sum(nt * 0.5) OVER (ORDER BY nt * 0.5, lang
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) p
        |      FROM w),
        |lv AS (SELECT s.*, (tot.b - s.p) / (tot.n - s.i + 1) lvl FROM s, tot),
        |el AS (SELECT coalesce(max(lvl) FILTER (WHERE cap > lvl), 1e308) ell FROM lv)
        |SELECT lang, CAST(nt AS BIGINT) AS n_tokens,
        |  round(cap, 4) AS capacity,
        |  round(least(cap, ell), 4) AS alloc,
        |  round(least(cap, ell) / nt, 6) AS epochs,
        |  cap <= ell AS saturated
        |FROM lv, el ORDER BY lang""".stripMargin,

    // Global-shuffle replay: same salted digest (unsigned lower-64 md5
    // mod 2^62), same (digest, key-as-STRING) order — both engines
    // string-order the tie-break — same round-robin deal.
    // Banned-words replay: same token stream, same literal lexicon.
    "x_badwords_filter" ->
      s"""WITH w AS (SELECT doc_id, $words wds FROM documents)
         |SELECT doc_id,
         |  CAST(len(list_filter(wds, t -> t IN ('spill', 'crash', 'corrupt')))
         |    AS INTEGER) AS n_banned,
         |  len(list_filter(wds, t -> t IN ('spill', 'crash', 'corrupt'))) = 0 AS keep
         |FROM w ORDER BY doc_id""".stripMargin,

    // Compression-ratio invariants are Spark-computed (no deflate in
    // DuckDB) — the oracle pins the doc count and all-true verdicts.
    "x_compress_ratio" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs, true AS sizes_positive,
        |  true AS bounded_overhead, true AS repetition_detected
        |FROM documents""".stripMargin,

    // Opt-out replay: the canonical host of this synthesis reduces to
    // www.<source>.com — deriving it directly re-asserts the
    // canonicalization chain's output; same blocklist regex.
    "x_optout_filter" ->
      """WITH h AS (SELECT doc_id, 'www.' || lower(source) || '.com' host
        |           FROM documents)
        |SELECT doc_id, host,
        |  regexp_matches(host, '^www\.src[0-3]\.') AS opted_out
        |FROM h ORDER BY doc_id""".stripMargin,

    // Sequence-length histogram replay: bucket = bit-length − 1
    // (integer-exact floor(log2); %b printf), token-less docs in their
    // own -1 bucket.
    "x_seqlen_histogram" ->
      s"""WITH w AS (SELECT $words wds FROM documents),
        |b AS (SELECT CASE WHEN len(wds) = 0 THEN -1
        |        ELSE CAST(length(printf('%b', len(wds))) - 1 AS INTEGER) END bucket,
        |        len(wds) n FROM w)
        |SELECT bucket, count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS n_tokens
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,

    // Novelty replay: same shingle stream (string-keyed — proving the
    // digest join collision-free), same reference slice, same ratio.
    "x_ngram_novelty" ->
      s"""WITH w AS (SELECT doc_id, $words wds FROM documents),
         |sh AS (SELECT doc_id, unnest(list_distinct(
         |  CASE WHEN len(wds) < 3 THEN CAST([] AS VARCHAR[])
         |  ELSE list_transform(generate_series(1, len(wds) - 2),
         |    i -> array_to_string(wds[i:i+2], ' ')) END)) m FROM w),
         |ref AS (SELECT DISTINCT m FROM sh WHERE doc_id % 2 = 0),
         |j AS (SELECT sh.doc_id, count(*) ns, count(ref.m) seen
         |      FROM sh LEFT JOIN ref ON ref.m = sh.m GROUP BY 1)
         |SELECT doc_id, ns AS n_shingles, ns - seen AS n_novel,
         |  round((ns - seen)::DOUBLE / ns, 6) AS novelty
         |FROM j ORDER BY doc_id""".stripMargin,

    // FIM replay: same digest cuts (modulus n−1 per doc), same slice
    // boundaries, same PSM sentinel concatenation (coalesce guards
    // DuckDB's NULL array_to_string on empty slices).
    "x_fim_transform" ->
      s"""WITH w AS (SELECT doc_id, $words t FROM documents),
         |c AS (SELECT doc_id, t, len(t) n,
         |  CAST(md5_number_lower('fim1|' || CAST(doc_id AS VARCHAR))
         |    % (len(t) - 1) AS INTEGER) + 1 lo,
         |  CAST(md5_number_lower('fim2|' || CAST(doc_id AS VARCHAR))
         |    % (len(t) - 1) AS INTEGER) + 1 hi
         |  FROM w WHERE len(t) >= 3),
         |s AS (SELECT doc_id, n, t, least(lo, hi) a, greatest(lo, hi) b FROM c)
         |SELECT doc_id, CAST(n AS INTEGER) AS n_tokens,
         |  a AS cut_a, b AS cut_b,
         |  '<fim_prefix> ' || coalesce(array_to_string(t[1:a], ' '), '') ||
         |  ' <fim_suffix> ' || coalesce(array_to_string(t[b+1:n], ' '), '') ||
         |  ' <fim_middle> ' || coalesce(array_to_string(t[a+1:b], ' '), '') AS fim_text
         |FROM s ORDER BY doc_id""".stripMargin,

    // Char-entropy replay: same char stream, same p·ln p fold over the
    // distinct chars (fp association differences sit ~1e-16, absorbed
    // by round 6).
    "x_char_entropy" ->
      """WITH c AS (SELECT doc_id,
        |  list_filter(string_split_regex(text, ''), x -> x <> '') ch FROM documents),
        |e AS (SELECT doc_id, len(ch) n,
        |  -list_sum(list_transform(list_distinct(ch), d2 ->
        |    (len(list_filter(ch, x -> x = d2))::DOUBLE / len(ch)) *
        |    ln(len(list_filter(ch, x -> x = d2))::DOUBLE / len(ch)))) ent
        |  FROM c)
        |SELECT doc_id, CAST(n AS INTEGER) AS n_chars,
        |  CASE WHEN n = 0 THEN 0.0 ELSE round(ent, 6) END AS entropy,
        |  (CASE WHEN n = 0 THEN 0.0 ELSE round(ent, 6) END) >= 1.5 AS keep
        |FROM e ORDER BY doc_id""".stripMargin,

    // Loss-mask replay: same chat synthesis, same marker positions,
    // same span arithmetic (successor marker − 1, end-capped at n),
    // empty spans dropped.
    "x_loss_mask" ->
      s"""WITH w AS (SELECT doc_id, $words t FROM documents),
         |c AS (SELECT doc_id,
         |  'user: ' || coalesce(array_to_string(t[1:5], ' '), '') || ' assistant: ' ||
         |  coalesce(array_to_string(t[6:10], ' '), '') || ' user: ' ||
         |  coalesce(array_to_string(t[11:15], ' '), '') || ' assistant: ' ||
         |  coalesce(array_to_string(t[16:], ' '), '') AS text FROM w),
         |tt AS (SELECT doc_id, $words t FROM c),
         |mk AS (SELECT doc_id, len(t) n,
         |  list_filter(list_zip(t, generate_series(1, len(t))),
         |    z -> z[1] IN ('user:', 'assistant:')) m FROM tt),
         |sp AS (SELECT doc_id, n, unnest(list_filter(
         |  list_transform(generate_series(1, len(m)), i ->
         |    CASE WHEN m[i][1] = 'assistant:'
         |         THEN [m[i][2] + 1,
         |               CASE WHEN i < len(m) THEN m[i+1][2] - 1 ELSE n END]
         |         ELSE NULL END),
         |  x -> x IS NOT NULL AND x[1] <= x[2])) s2 FROM mk)
         |SELECT doc_id, CAST(n AS INTEGER) AS n_tokens,
         |  CAST(s2[1] AS INTEGER) AS s, CAST(s2[2] AS INTEGER) AS e
         |FROM sp ORDER BY doc_id, s""".stripMargin,

    // Annealing replay: quality terciles (cumulative-count window),
    // tier epochs 2.0/1.0/0.25, floor copies + the 'an|' digest draw
    // (frac·10⁶ = 250000 exactly), series unnest.
    "x_anneal_mix" ->
      s"""WITH w AS (SELECT doc_id, $words wds FROM documents),
         |m AS (SELECT doc_id, len(wds) nt,
         |  len(list_filter(wds, t -> t IN $stops))::DOUBLE / len(wds) stop_ratio,
         |  list_sum(list_transform(wds, t -> length(t)))::DOUBLE / len(wds) awl FROM w),
         |q AS (SELECT doc_id, round(
         |  least(nt / 50.0, 1.0) * 0.5 +
         |  (CASE WHEN stop_ratio > 0.01 THEN 1.0 ELSE 0.5 END) * 0.25 +
         |  (CASE WHEN awl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.5 END) * 0.25, 6) AS q
         |  FROM m),
         |nn AS (SELECT count(*) n FROM q),
         |r AS (SELECT q, count(*) OVER (ORDER BY q) cum FROM q),
         |t1 AS (SELECT min(q) t1 FROM r, nn WHERE cum >= ceil(nn.n / 3.0)),
         |t2 AS (SELECT min(q) t2 FROM r, nn WHERE cum >= ceil(2 * nn.n / 3.0)),
         |p AS (SELECT doc_id, q.q,
         |  CASE WHEN q.q <= t1.t1 THEN 't2' WHEN q.q <= t2.t2 THEN 't1'
         |       ELSE 't0' END tier FROM q, t1, t2),
         |cnt AS (SELECT doc_id, q, tier,
         |  CAST(CASE tier WHEN 't0' THEN 2 WHEN 't1' THEN 1 ELSE 0 END AS BIGINT)
         |  + (CASE WHEN tier = 't2' AND
         |       md5_number_lower('an|' || CAST(doc_id AS VARCHAR)) % 1000000 < 250000
         |     THEN 1 ELSE 0 END) n2 FROM p)
         |SELECT doc_id, q, tier, CAST(t.copy AS INTEGER) AS copy
         |FROM cnt, unnest(generate_series(1, n2)) t(copy)
         |WHERE n2 > 0 ORDER BY doc_id, copy""".stripMargin,

    // Quality-weighted sampling replay: x_quality's score, the same
    // md5 draw, the same squared-ratio acceptance arithmetic.
    "x_quality_sample" ->
      s"""WITH w AS (SELECT doc_id, $words wds FROM documents),
         |m AS (SELECT doc_id, len(wds) nt,
         |  len(list_filter(wds, t -> t IN $stops))::DOUBLE / len(wds) stop_ratio,
         |  list_sum(list_transform(wds, t -> length(t)))::DOUBLE / len(wds) awl FROM w),
         |q AS (SELECT doc_id, round(
         |  least(nt / 50.0, 1.0) * 0.5 +
         |  (CASE WHEN stop_ratio > 0.01 THEN 1.0 ELSE 0.5 END) * 0.25 +
         |  (CASE WHEN awl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.5 END) * 0.25, 6) AS q
         |  FROM m),
         |qm AS (SELECT max(q) qm FROM q)
         |SELECT doc_id, q,
         |  (md5_number_lower('qs|' || CAST(doc_id AS VARCHAR)) % 1000000 + 0.5)
         |    / 1000000.0 < q * q / (qm.qm * qm.qm) AS keep
         |FROM q, qm ORDER BY doc_id""".stripMargin,

    // Curriculum replay: x_quality's score, tercile thresholds via the
    // cumulative-count window (Spark's documented percentile semantic),
    // then the x_global_shuffle rank replay with phase as the leading
    // sort key.
    "x_curriculum" ->
      s"""WITH w AS (SELECT doc_id, $words wds FROM documents),
         |m AS (SELECT doc_id, len(wds) nt,
         |  len(list_filter(wds, t -> t IN $stops))::DOUBLE / len(wds) stop_ratio,
         |  list_sum(list_transform(wds, t -> length(t)))::DOUBLE / len(wds) awl FROM w),
         |q AS (SELECT doc_id, round(
         |  least(nt / 50.0, 1.0) * 0.5 +
         |  (CASE WHEN stop_ratio > 0.01 THEN 1.0 ELSE 0.5 END) * 0.25 +
         |  (CASE WHEN awl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.5 END) * 0.25, 6) AS q
         |  FROM m),
         |n AS (SELECT count(*) n FROM q),
         |r AS (SELECT q, count(*) OVER (ORDER BY q) cum FROM q),
         |t1 AS (SELECT min(q) t1 FROM r, n WHERE cum >= ceil(n.n / 3.0)),
         |t2 AS (SELECT min(q) t2 FROM r, n WHERE cum >= ceil(2 * n.n / 3.0)),
         |p AS (SELECT doc_id, q.q,
         |  CASE WHEN q.q <= t1.t1 THEN 2 WHEN q.q <= t2.t2 THEN 1 ELSE 0 END ph
         |  FROM q, t1, t2),
         |b AS (SELECT doc_id, q, ph,
         |  md5_number_lower('cur|' || CAST(doc_id AS VARCHAR))
         |    % 4611686018427387904 d FROM p),
         |r2 AS (SELECT doc_id, q, ph,
         |  row_number() OVER (ORDER BY ph, d, CAST(doc_id AS VARCHAR)) - 1 rk FROM b)
         |SELECT doc_id, q, CAST(ph AS INTEGER) AS phase,
         |  CAST(rk % 4 AS INTEGER) AS shard, CAST(rk // 4 AS BIGINT) AS pos
         |FROM r2 ORDER BY doc_id""".stripMargin,

    "x_global_shuffle" ->
      """WITH b AS (SELECT doc_id, lang,
        |        md5_number_lower('gs|' || CAST(doc_id AS VARCHAR))
        |          % 4611686018427387904 d
        |      FROM documents),
        |r AS (SELECT doc_id, lang,
        |        row_number() OVER (ORDER BY d, CAST(doc_id AS VARCHAR)) - 1 rk
        |      FROM b)
        |SELECT doc_id, lang, CAST(rk % 8 AS INTEGER) AS shard,
        |  CAST(rk // 8 AS BIGINT) AS pos
        |FROM r ORDER BY doc_id""".stripMargin,

    // Epoch-expansion replay: the x_unimax_mix waterfill (3-epoch cap,
    // 1.5× token budget), epochs rounded to 6 exactly as unimaxAlloc
    // outputs them — the rounded value IS the plan both engines
    // execute — then floor + fractional digest draw + series unnest.
    "x_epoch_expand" ->
      s"""$epochExpandCtes
        |SELECT doc_id, lang, CAST(t.copy AS INTEGER) AS copy
        |FROM cnt, unnest(generate_series(1, n)) t(copy)
        |WHERE n > 0 ORDER BY doc_id, copy""".stripMargin,

    // The full mixture materialization in ONE plan, stitched from the
    // stages' own proven replays: the x_epoch_expand waterfill +
    // expansion, the x_global_shuffle digest permutation over
    // (doc_id, copy) keys, and the x_pack_sequences running-sum pack
    // per shard. Every number is integer or rounded-6 — exact.
    "pipe_mix_e2e" ->
      s"""$epochExpandCtes,
        |exp AS (SELECT doc_id, lang, ntok, CAST(t.copy AS BIGINT) AS copy
        |        FROM cnt, unnest(generate_series(1, n)) t(copy) WHERE n > 0),
        |b2 AS (SELECT *, md5_number_lower('ms|' || CAST(doc_id AS VARCHAR) || '#'
        |          || CAST(copy AS VARCHAR)) % 4611686018427387904 dd FROM exp),
        |r2 AS (SELECT *, row_number() OVER (ORDER BY dd,
        |          CAST(doc_id AS VARCHAR) || '#' || CAST(copy AS VARCHAR)) - 1 rk
        |       FROM b2),
        |shf AS (SELECT doc_id, ntok, copy, CAST(rk % 8 AS INTEGER) shard,
        |          CAST(rk // 8 AS BIGINT) pos FROM r2),
        |c3 AS (SELECT *, CAST(sum(ntok) OVER (PARTITION BY shard ORDER BY pos)
        |          - ntok AS BIGINT) strt FROM shf)
        |SELECT doc_id, CAST(copy AS INTEGER) AS copy, shard, pos,
        |  ntok AS n_tokens,
        |  CAST(strt // 64 AS BIGINT) AS seq_first,
        |  CAST(strt % 64 AS BIGINT) AS tok_offset
        |FROM c3 ORDER BY doc_id, copy""".stripMargin,

    // Mix-to-target replay: same feasibility bound N* = min(n/p), same
    // per-domain acceptance rate, same salted-digest draw. Proportions
    // forced to DOUBLE so the rate arithmetic runs in the same IEEE
    // ops as the engine (a DECIMAL literal would divide differently).
    "x_mix_to_target" ->
      """WITH c AS (SELECT lang, count(*) n FROM documents
        |           WHERE lang IN ('en','de','es','fr') GROUP BY 1),
        |p AS (SELECT lang, n, CAST(CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.2
        |        WHEN 'es' THEN 0.2 ELSE 0.1 END AS DOUBLE) p FROM c),
        |ns AS (SELECT min(n::DOUBLE / p) nstar FROM p),
        |r AS (SELECT lang, least(CAST(1.0 AS DOUBLE), p * ns.nstar / n::DOUBLE) rate
        |      FROM p, ns)
        |SELECT d.doc_id, d.lang FROM documents d JOIN r ON d.lang = r.lang
        |WHERE md5_number_lower('mt|' || CAST(doc_id AS VARCHAR)) % 1000000 <
        |  CAST(floor(rate * 1000000) AS BIGINT)
        |ORDER BY doc_id""".stripMargin,

    // Weighted sample: Efraimidis–Spirakis exponential keys from the
    // same salted digest, rounded to 9 decimals (libm ln ulp parity),
    // digest-then-key tie-break — replays the engine's draw exactly.
    "x_weighted_sample" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source, row_number() OVER (PARTITION BY source
        |    ORDER BY round(-ln((md5_number_lower('ws|' || CAST(doc_id AS VARCHAR)) % 1000000 + 0.5)
        |      / 1000000.0) / CAST(n_chars AS DOUBLE), 9), doc_id) rk
        |  FROM documents WHERE n_chars > 0)
        |WHERE rk <= 5 ORDER BY doc_id""".stripMargin,

    // Per-domain cap: digest-ranked row_number per language, <= 20.
    "x_domain_cap" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
        |    ORDER BY md5_number_lower('dc|' || CAST(doc_id AS VARCHAR)) % 1000000, doc_id) rk
        |  FROM documents)
        |WHERE rk <= 20 ORDER BY doc_id""".stripMargin,

    // The stitched recipe replay: x_quality's gate formula, keep-first
    // over md5(lower(trim(text))) fingerprints, x_token_budget's
    // (segment, id)-ordered cumsum at budget 400, x_split_assign's CASE
    // chain — each fragment identical to its standalone oracle.
    "pipe_recipe_e2e" ->
      s"""WITH w AS (SELECT doc_id, lang, text, $words wds FROM documents),
        |m AS (SELECT doc_id, lang, text, len(wds) nt,
        |  len(list_filter(wds, t -> t IN $stops))::DOUBLE / len(wds) stop_ratio,
        |  list_sum(list_transform(wds, t -> length(t)))::DOUBLE / len(wds) awl FROM w),
        |g AS (SELECT doc_id, lang, text, nt FROM m
        |  WHERE round(least(nt / 50.0, 1.0) * 0.5 +
        |    (CASE WHEN stop_ratio > 0.01 THEN 1.0 ELSE 0.5 END) * 0.25 +
        |    (CASE WHEN awl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.5 END) * 0.25, 6) >= 0.5),
        |dd AS (SELECT doc_id, lang, nt FROM (
        |    SELECT doc_id, lang, nt, row_number() OVER (
        |      PARTITION BY md5(lower(trim(text))) ORDER BY doc_id) rn FROM g)
        |  WHERE rn = 1),
        |b AS (SELECT doc_id, lang, nt,
        |    md5_number_lower('rc|' || CAST(doc_id AS VARCHAR)) % 256 seg FROM dd),
        |c AS (SELECT doc_id, lang, nt,
        |    sum(nt) OVER (PARTITION BY lang ORDER BY seg, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cum FROM b)
        |SELECT doc_id, lang, CAST(nt AS BIGINT) AS n_tokens,
        |  CASE WHEN md5_number_lower('rcs|' || CAST(doc_id AS VARCHAR)) % 1000000 < 800000 THEN 'train'
        |       WHEN md5_number_lower('rcs|' || CAST(doc_id AS VARCHAR)) % 1000000 < 900000 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM c WHERE cum <= 400 ORDER BY doc_id""".stripMargin,

    // Token-budget cap replay: the oracle computes the per-domain
    // running sum directly (one window — fine at oracle scale); the
    // engine's segment-decomposed cumsum reproduces the identical
    // prefix sums because the global order is (segment, doc_id) on both
    // sides. Prefix rule: keep while the INCLUSIVE cumsum stays within
    // budget; null-token docs cost 0 mid-stream and drop in an all-null
    // prefix (null cum fails the filter) — both engines agree.
    "x_token_budget" ->
      s"""WITH w AS (SELECT doc_id, lang, len($words) nt FROM documents),
        |b AS (SELECT doc_id, lang, nt,
        |        md5_number_lower('tb|' || CAST(doc_id AS VARCHAR)) % 256 seg FROM w),
        |c AS (SELECT doc_id, lang, nt,
        |        sum(nt) OVER (PARTITION BY lang ORDER BY seg, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cum FROM b)
        |SELECT doc_id, lang, CAST(nt AS BIGINT) AS n_tokens FROM c
        |WHERE cum <= 500 ORDER BY doc_id""".stripMargin,

    // HLL cardinality: exact vocab size from the raw table; the Spark
    // side's sketch estimate must sit within the ±10% contract.
    "x_approx_distinct" ->
      s"""WITH w AS (SELECT doc_id, $words wds FROM documents)
        |SELECT CAST(count(DISTINCT token) AS BIGINT) AS n_exact,
        |  true AS approx_ok
        |FROM (SELECT unnest(wds) token FROM w)""".stripMargin,

    // Heavy hitters: exact per-source token counts + the n/(m+1)
    // threshold (m=24 matches the engine); the two MG-guarantee booleans
    // are identically true when the sketch honors its bound — the
    // x_approx_distinct idiom. Top-token tie-break (count desc, token
    // desc) mirrors Spark's max(struct(c, token)) field ordering.
    "x_heavy_hitters" ->
      s"""WITH t AS (SELECT source, unnest($words) token FROM documents),
         |c AS (SELECT source, token, count(*) c FROM t GROUP BY 1, 2),
         |n AS (SELECT source, count(*) n FROM t GROUP BY 1)
         |SELECT c.source, n.n AS n_tokens,
         |  CAST(count(*) FILTER (WHERE c > n.n / 25.0) AS BIGINT) AS n_hh,
         |  (array_agg(token ORDER BY c DESC, token DESC))[1] AS top_token,
         |  max(c) AS top_count,
         |  true AS hh_in_sketch, true AS mg_bounds_ok
         |FROM c JOIN n ON c.source = n.source
         |GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    // Incremental heavy hitters: exact counts over the union (the split
    // and the stored-summary fold must be invisible); guarantee booleans
    // identically true when the merged sketch honors the MG bound.
    "x_hh_incremental" ->
      s"""WITH t AS (SELECT source, unnest($words) token FROM documents),
         |c AS (SELECT source, token, count(*) c FROM t GROUP BY 1, 2),
         |n AS (SELECT source, count(*) n FROM t GROUP BY 1)
         |SELECT c.source, n.n AS n_tokens,
         |  CAST(count(*) FILTER (WHERE c > n.n / 25.0) AS BIGINT) AS n_hh,
         |  true AS hh_in_sketch, true AS mg_bounds_ok
         |FROM c JOIN n ON c.source = n.source
         |GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    // Incremental quantile sketch: the merged stored sketches are
    // rank-exact at the query's accuracy, so the oracle replays the
    // documented "smallest x with cdf >= ceil(q*n)" semantic over the
    // UNION as a cumulative-count window (the x_outlier_trim idiom) —
    // the batch split and the stored-sketch fold must be invisible.
    "x_quantile_incremental" ->
      """WITH n AS (SELECT source, count(*) n_total FROM documents GROUP BY 1),
        |r AS (SELECT source, n_chars,
        |        count(*) OVER (PARTITION BY source ORDER BY n_chars) cum
        |      FROM documents),
        |q AS (SELECT r.source,
        |        min(n_chars) FILTER (WHERE cum >= ceil(0.5 * n_total)) p50,
        |        min(n_chars) FILTER (WHERE cum >= ceil(0.9 * n_total)) p90,
        |        min(n_chars) FILTER (WHERE cum >= ceil(0.99 * n_total)) p99
        |      FROM r JOIN n USING (source) GROUP BY 1)
        |SELECT n.source, CAST(n.n_total AS BIGINT) AS n_total,
        |  round(CAST(p50 AS DOUBLE), 2) AS p50,
        |  round(CAST(p90 AS DOUBLE), 2) AS p90,
        |  round(CAST(p99 AS DOUBLE), 2) AS p99
        |FROM n JOIN q USING (source) ORDER BY 1""".stripMargin,

    // Persisted stats store: identical replay to x_quantile_incremental
    // — the store's batch split, ledger fold, and compaction must all be
    // invisible against the union.
    "x_quantile_store" ->
      """WITH n AS (SELECT source, count(*) n_total FROM documents GROUP BY 1),
        |r AS (SELECT source, n_chars,
        |        count(*) OVER (PARTITION BY source ORDER BY n_chars) cum
        |      FROM documents),
        |q AS (SELECT r.source,
        |        min(n_chars) FILTER (WHERE cum >= ceil(0.5 * n_total)) p50,
        |        min(n_chars) FILTER (WHERE cum >= ceil(0.9 * n_total)) p90,
        |        min(n_chars) FILTER (WHERE cum >= ceil(0.99 * n_total)) p99
        |      FROM r JOIN n USING (source) GROUP BY 1)
        |SELECT n.source, CAST(n.n_total AS BIGINT) AS n_total,
        |  round(CAST(p50 AS DOUBLE), 2) AS p50,
        |  round(CAST(p90 AS DOUBLE), 2) AS p90,
        |  round(CAST(p99 AS DOUBLE), 2) AS p99
        |FROM n JOIN q USING (source) ORDER BY 1""".stripMargin,

    // Admission pipeline replay: the x_curation_verdict funnel restricted
    // to the batch slice, the exact-fingerprint anti-join over its
    // admitted docs, and the span scrub with duplication counted over
    // corpus ∪ survivors — stage precedence mirrored by the CASE order.
    "pipe_admission_e2e" ->
      s"""WITH w AS (SELECT doc_id, text, $words wds FROM documents WHERE doc_id % 5 = 0),
         |lg AS (SELECT doc_id,
         |  len(list_filter(wds, t -> t IN ('the','and','of','is','a'))) s_en,
         |  len(list_filter(wds, t -> t IN ('der','die','und','ist','das'))) s_de,
         |  len(list_filter(wds, t -> t IN ('el','los','y','es','una'))) s_es,
         |  len(list_filter(wds, t -> t IN ('le','la','et','est','une'))) s_fr FROM w),
         |lang AS (SELECT doc_id, CASE WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
         |  WHEN s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
         |  WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
         |  WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
         |  ELSE 'fr' END AS lang_pred FROM lg),
         |qm AS (SELECT doc_id, len(wds) nt,
         |  len(list_filter(wds, t -> t IN $stops))::DOUBLE / len(wds) stop_ratio,
         |  list_sum(list_transform(wds, t -> length(t)))::DOUBLE / len(wds) awl FROM w),
         |q AS (SELECT doc_id, round(
         |  least(nt / 50.0, 1.0) * 0.5 +
         |  (CASE WHEN stop_ratio > 0.01 THEN 1.0 ELSE 0.5 END) * 0.25 +
         |  (CASE WHEN awl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.5 END) * 0.25, 6) AS quality
         |  FROM qm),
         |pii AS (SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) +
         |       len(regexp_extract_all(text, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS INTEGER) n_pii
         |  FROM w),
         |${gopherCtes("w")},
         |g AS (SELECT gst.doc_id, $gopherKeepSql AS gopher_keep
         |  FROM gst LEFT JOIN gp USING (doc_id)),
         |cur AS (SELECT w.doc_id, (lang.lang_pred <> 'und' AND q.quality >= 0.5
         |          AND g.gopher_keep AND pii.n_pii = 0) AS admit
         |  FROM w JOIN lang USING (doc_id) JOIN q USING (doc_id)
         |  JOIN pii USING (doc_id) JOIN g USING (doc_id)),
         |novel AS (SELECT c1.doc_id FROM cur c1 JOIN documents i USING (doc_id)
         |  WHERE c1.admit AND NOT EXISTS (
         |    SELECT 1 FROM documents c WHERE c.doc_id % 5 <> 0
         |    AND md5(lower(trim(c.text))) = md5(lower(trim(i.text))))),
         |toksall AS (SELECT doc_id, $words t FROM documents
         |  WHERE doc_id % 5 <> 0 OR doc_id IN (SELECT doc_id FROM novel)),
         |win AS (SELECT doc_id, i, array_to_string(t[i:i+7], ' ') AS span
         |        FROM (SELECT doc_id, t,
         |                unnest(generate_series(1, len(t) - 7)) AS i FROM toksall)),
         |dup AS (SELECT span FROM win GROUP BY 1
         |        HAVING count(DISTINCT doc_id) >= 2),
         |cover AS (SELECT DISTINCT w2.doc_id, u.pos
         |          FROM win w2 JOIN dup USING (span),
         |               unnest(generate_series(w2.i, w2.i + 7)) AS u(pos)
         |          WHERE w2.doc_id IN (SELECT doc_id FROM novel)),
         |tok_pos AS (SELECT doc_id, i AS pos, t[i] AS tok
         |            FROM (SELECT doc_id, t,
         |                    unnest(generate_series(1, len(t))) AS i FROM toksall)
         |            WHERE doc_id IN (SELECT doc_id FROM novel)),
         |agg AS (SELECT tp.doc_id, count(*) AS n_tokens,
         |          count(c.pos) AS n_removed,
         |          coalesce(string_agg(CASE WHEN c.pos IS NULL THEN tp.tok END,
         |            ' ' ORDER BY tp.pos), '') AS clean_text
         |        FROM tok_pos tp LEFT JOIN cover c
         |          ON c.doc_id = tp.doc_id AND c.pos = tp.pos
         |        GROUP BY 1)
         |SELECT cur.doc_id,
         |  CASE WHEN NOT cur.admit THEN 'rejected'
         |       WHEN cur.doc_id NOT IN (SELECT doc_id FROM novel) THEN 'duplicate'
         |       ELSE 'admitted' END AS verdict,
         |  CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(a.n_removed, 0) AS BIGINT) AS n_removed,
         |  coalesce(a.clean_text, '') AS clean_text
         |FROM cur LEFT JOIN agg a USING (doc_id)
         |ORDER BY cur.doc_id""".stripMargin,

    // Admission with the semantic stage on: pipe_admission_e2e's funnel
    // + exact-dup stages, then the x_semdedup_incremental probe of the
    // exact-novel survivors (corpus-fitted per-label centroids; every
    // corpus vector earlier, paper order within the batch) — dropped
    // ids verdict 'semantic_duplicate' and leave the span scrub.
    "pipe_admission_sem_e2e" ->
      s"""WITH w AS (SELECT doc_id, text, $words wds FROM documents WHERE doc_id % 5 = 0),
         |lg AS (SELECT doc_id,
         |  len(list_filter(wds, t -> t IN ('the','and','of','is','a'))) s_en,
         |  len(list_filter(wds, t -> t IN ('der','die','und','ist','das'))) s_de,
         |  len(list_filter(wds, t -> t IN ('el','los','y','es','una'))) s_es,
         |  len(list_filter(wds, t -> t IN ('le','la','et','est','une'))) s_fr FROM w),
         |lang AS (SELECT doc_id, CASE WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
         |  WHEN s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
         |  WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
         |  WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
         |  ELSE 'fr' END AS lang_pred FROM lg),
         |qm AS (SELECT doc_id, len(wds) nt,
         |  len(list_filter(wds, t -> t IN $stops))::DOUBLE / len(wds) stop_ratio,
         |  list_sum(list_transform(wds, t -> length(t)))::DOUBLE / len(wds) awl FROM w),
         |q AS (SELECT doc_id, round(
         |  least(nt / 50.0, 1.0) * 0.5 +
         |  (CASE WHEN stop_ratio > 0.01 THEN 1.0 ELSE 0.5 END) * 0.25 +
         |  (CASE WHEN awl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.5 END) * 0.25, 6) AS quality
         |  FROM qm),
         |pii AS (SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) +
         |       len(regexp_extract_all(text, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS INTEGER) n_pii
         |  FROM w),
         |${gopherCtes("w")},
         |g AS (SELECT gst.doc_id, $gopherKeepSql AS gopher_keep
         |  FROM gst LEFT JOIN gp USING (doc_id)),
         |cur AS (SELECT w.doc_id, (lang.lang_pred <> 'und' AND q.quality >= 0.5
         |          AND g.gopher_keep AND pii.n_pii = 0) AS admit
         |  FROM w JOIN lang USING (doc_id) JOIN q USING (doc_id)
         |  JOIN pii USING (doc_id) JOIN g USING (doc_id)),
         |novel AS (SELECT c1.doc_id FROM cur c1 JOIN documents i USING (doc_id)
         |  WHERE c1.admit AND NOT EXISTS (
         |    SELECT 1 FROM documents c WHERE c.doc_id % 5 <> 0
         |    AND md5(lower(trim(c.text))) = md5(lower(trim(i.text))))),
         |semcent AS (SELECT label clabel, pos, avg(x) m FROM (
         |    SELECT label, generate_subscripts(embedding, 1) pos, unnest(embedding)::DOUBLE x
         |    FROM embeddings WHERE vec_id % 5 <> 0) GROUP BY 1, 2),
         |semev AS (SELECT vec_id, generate_subscripts(embedding, 1) pos, unnest(embedding)::DOUBLE x
         |    FROM embeddings
         |    WHERE vec_id % 5 <> 0 OR vec_id IN (SELECT doc_id FROM novel)),
         |sems AS (SELECT vec_id, clabel,
         |    sum(semev.x * semcent.m) / (sqrt(sum(semev.x * semev.x)) * sqrt(sum(semcent.m * semcent.m))) sim
         |  FROM semev JOIN semcent ON semev.pos = semcent.pos GROUP BY vec_id, clabel),
         |semr AS (SELECT vec_id, clabel, sim,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, clabel) rn FROM sems),
         |semasg AS (SELECT vec_id, clabel cl, sim csim, round(sim, 6) ord FROM semr WHERE rn = 1),
         |semp AS (SELECT xa.vec_id ia, xb.vec_id ib, ea.embedding va, eb.embedding vb
         |    FROM semasg xa JOIN semasg xb ON xa.cl = xb.cl
         |     AND xb.vec_id IN (SELECT doc_id FROM novel)
         |     AND (xa.vec_id % 5 <> 0
         |          OR xa.ord < xb.ord
         |          OR (xa.ord = xb.ord AND xa.vec_id < xb.vec_id))
         |    JOIN embeddings ea ON ea.vec_id = xa.vec_id
         |    JOIN embeddings eb ON eb.vec_id = xb.vec_id),
         |sempu AS (SELECT ia, ib, unnest(va)::DOUBLE x, unnest(vb)::DOUBLE y FROM semp),
         |semps AS (SELECT ia, ib, sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))) sim
         |    FROM sempu GROUP BY ia, ib),
         |semdrop AS (SELECT DISTINCT ib doc_id FROM semps WHERE sim >= 0.3),
         |semnovel AS (SELECT doc_id FROM novel
         |    WHERE doc_id NOT IN (SELECT doc_id FROM semdrop)),
         |toksall AS (SELECT doc_id, $words t FROM documents
         |  WHERE doc_id % 5 <> 0 OR doc_id IN (SELECT doc_id FROM semnovel)),
         |win AS (SELECT doc_id, i, array_to_string(t[i:i+7], ' ') AS span
         |        FROM (SELECT doc_id, t,
         |                unnest(generate_series(1, len(t) - 7)) AS i FROM toksall)),
         |dup AS (SELECT span FROM win GROUP BY 1
         |        HAVING count(DISTINCT doc_id) >= 2),
         |cover AS (SELECT DISTINCT w2.doc_id, u.pos
         |          FROM win w2 JOIN dup USING (span),
         |               unnest(generate_series(w2.i, w2.i + 7)) AS u(pos)
         |          WHERE w2.doc_id IN (SELECT doc_id FROM semnovel)),
         |tok_pos AS (SELECT doc_id, i AS pos, t[i] AS tok
         |            FROM (SELECT doc_id, t,
         |                    unnest(generate_series(1, len(t))) AS i FROM toksall)
         |            WHERE doc_id IN (SELECT doc_id FROM semnovel)),
         |agg AS (SELECT tp.doc_id, count(*) AS n_tokens,
         |          count(c.pos) AS n_removed,
         |          coalesce(string_agg(CASE WHEN c.pos IS NULL THEN tp.tok END,
         |            ' ' ORDER BY tp.pos), '') AS clean_text
         |        FROM tok_pos tp LEFT JOIN cover c
         |          ON c.doc_id = tp.doc_id AND c.pos = tp.pos
         |        GROUP BY 1)
         |SELECT cur.doc_id,
         |  CASE WHEN NOT cur.admit THEN 'rejected'
         |       WHEN cur.doc_id NOT IN (SELECT doc_id FROM novel) THEN 'duplicate'
         |       WHEN cur.doc_id IN (SELECT doc_id FROM semdrop) THEN 'semantic_duplicate'
         |       ELSE 'admitted' END AS verdict,
         |  CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(a.n_removed, 0) AS BIGINT) AS n_removed,
         |  coalesce(a.clean_text, '') AS clean_text
         |FROM cur LEFT JOIN agg a USING (doc_id)
         |ORDER BY cur.doc_id""".stripMargin,

    // Quantile sketch: exact per-group quantiles from the raw table
    // (DuckDB quantile_cont = Spark's exact `percentile` linear
    // interpolation); the sketch values must sit inside the stated
    // ±1-percentile rank windows.
    "x_quantile_sketch" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  round(quantile_cont(o_totalprice, 0.5), 2) AS p50_exact,
        |  round(quantile_cont(o_totalprice, 0.9), 2) AS p90_exact,
        |  true AS ok40, true AS ok50, true AS ok90, true AS ok99
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    // C4 line/page filters: same synthesized structure, same line
    // predicate (terminal punctuation, >= 5 words, no "javascript"),
    // same page flags and >= 3-retained-lines keep.
    "x_c4_clean" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_replace(text, ' value ', '.' || chr(10), 'g') ||
        |    (CASE WHEN doc_id % 17 = 0 THEN chr(10) || 'lorem ipsum dolor sit amet.' ELSE '' END) ||
        |    (CASE WHEN doc_id % 19 = 0 THEN chr(10) || 'if (x) { return y; }' ELSE '' END) AS text
        |  FROM documents),
        |c AS (SELECT doc_id, text,
        |    list_filter(string_split(text, chr(10)), l ->
        |      regexp_matches(trim(l), '[.!?"'']$')
        |      AND len(list_filter(regexp_split_to_array(trim(l), '[ \t\n\x0b\f\r]+'), w -> w <> '')) >= 5
        |      AND NOT contains(lower(l), 'javascript')) kept
        |  FROM t)
        |SELECT doc_id,
        |  CAST(len(list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)), x -> x <> '')) AS INTEGER) AS n_lines,
        |  CAST(len(kept) AS INTEGER) AS n_kept,
        |  substring(coalesce(array_to_string(kept, chr(10)), ''), 1, 80) AS cleaned_head,
        |  contains(lower(text), 'lorem ipsum') AS has_lorem,
        |  contains(text, '{') AS has_brace,
        |  (NOT contains(lower(text), 'lorem ipsum') AND NOT contains(text, '{')
        |    AND len(kept) >= 3) AS keep
        |FROM c ORDER BY doc_id""".stripMargin,

    // BPE pair counts: adjacent 2-char substrings of each distinct word,
    // weighted by the word's corpus frequency.
    "x_bpe_pairs" ->
      s"""WITH w AS (SELECT doc_id, $words wds FROM documents),
        |d AS (SELECT w2 w, count(*) f FROM (SELECT unnest(wds) w2 FROM w) GROUP BY 1),
        |p AS (SELECT substring(d.w, CAST(t.i AS INT), 2) pair, d.f
        |      FROM d, unnest(generate_series(1, length(d.w) - 1)) t(i)
        |      WHERE length(d.w) >= 2),
        |c AS (SELECT pair, sum(f) cnt FROM p GROUP BY 1)
        |SELECT pair, CAST(cnt AS BIGINT) AS cnt FROM c
        |ORDER BY cnt DESC, pair LIMIT 30""".stripMargin,

    // Append-only index refresh: standing corpus band rows UNION the
    // admitted batch docs' band rows (admit = no verified corpus match,
    // the x_neardup_incremental chain). Band is 0-based to match the
    // engine's posexplode; null band values (shingle-less docs) stay out.
    "x_index_refresh" ->
      s"""WITH w AS (SELECT doc_id, $words wds FROM documents),
         |sh AS (SELECT doc_id, CASE WHEN len(wds) < 3 THEN CAST([] AS VARCHAR[])
         |  ELSE list_transform(generate_series(1, len(wds) - 2), i -> array_to_string(wds[i:i+2], ' ')) END s
         |  FROM w),
         |sig AS (SELECT doc_id, [
         |  list_min(list_transform(s, x -> md5('0|' || x))),
         |  list_min(list_transform(s, x -> md5('1|' || x))),
         |  list_min(list_transform(s, x -> md5('2|' || x))),
         |  list_min(list_transform(s, x -> md5('3|' || x)))] sg FROM sh),
         |bnd AS (SELECT doc_id, generate_subscripts(sg, 1) band, unnest(sg) bv FROM sig),
         |cand AS (SELECT DISTINCT b.doc_id batch_id, c.doc_id corpus_id
         |  FROM bnd b JOIN bnd c ON b.band = c.band AND b.bv = c.bv
         |  WHERE b.doc_id % 10 >= 8 AND c.doc_id % 10 < 8),
         |m AS (SELECT doc_id, unnest(list_distinct(s)) sh FROM sh),
         |sz AS (SELECT doc_id, count(*) n FROM m GROUP BY doc_id),
         |i AS (SELECT cd.batch_id, cd.corpus_id, count(*) inter
         |  FROM cand cd JOIN m a ON a.doc_id = cd.batch_id
         |  JOIN m b2 ON b2.doc_id = cd.corpus_id AND b2.sh = a.sh GROUP BY 1, 2),
         |blocked AS (SELECT DISTINCT i.batch_id FROM i
         |  JOIN sz x ON x.doc_id = i.batch_id JOIN sz y ON y.doc_id = i.corpus_id
         |  WHERE i.inter::DOUBLE / (x.n + y.n - i.inter) >= 0.05)
         |SELECT doc_id, CAST(band - 1 AS INT) AS band, bv FROM bnd
         |WHERE bv IS NOT NULL AND (doc_id % 10 < 8
         |  OR doc_id NOT IN (SELECT batch_id FROM blocked))
         |ORDER BY doc_id, band""".stripMargin,

    // BPE merge loop, unrolled (the merge count is a fixed parameter, so
    // the loop is M chained CTE stages): per stage, count adjacent
    // symbol pairs weighted by word frequency, argmax with count-desc /
    // pair-asc ties, apply the merge via non-overlapping left-to-right
    // replace — the exact greedy semantics of the Spark loop.
    "x_bpe_merges" ->
      s"""WITH ${bpeCtes(8)}
         |${(1 to 8).map(i =>
             s"SELECT $i merge_rank, l l_sym, r r_sym, cnt FROM b$i")
           .mkString("\nUNION ALL\n")}
         |ORDER BY merge_rank""".stripMargin,

    // BPE encode: per document, word count and token count under the
    // 8-merge vocabulary — each word contributes the length of its final
    // segmentation in the trained dict (d8 of the same unrolled chain).
    "x_bpe_encode" -> bpeEncodeSql,

    // Store-then-encode over the SAME corpus is the identical function
    // (the stored dict IS d8; replay only fires on unseen words, of
    // which the training corpus has none) — same parity SQL.
    "x_bpe_encode_stored" -> bpeEncodeSql,

    "x_tokenizer_fertility" -> tokenizerFertilitySql,

    // Complete incremental admission: within-batch components over the
    // LSH-candidate verified pairs restricted to batch docs (banding is
    // per-doc deterministic, so the all-docs candidate chain filtered to
    // batch pairs equals a batch-only run), plus the batch↔corpus
    // verified-pair check — admit = own-component representative AND no
    // member of the component has a corpus match (component-wide block).
    "x_admit_incremental" ->
      s"""WITH RECURSIVE $lshCandCtes,
         |bp AS (SELECT li.ia, li.ib FROM li JOIN cand USING (ia, ib)
         |  JOIN lsz x ON x.doc_id = li.ia JOIN lsz y ON y.doc_id = li.ib
         |  WHERE li.ia % 10 >= 8 AND li.ib % 10 >= 8
         |    AND inter::DOUBLE / (x.n + y.n - inter) >= 0.05),
         |e AS (SELECT ia s, ib d FROM bp UNION SELECT ib, ia FROM bp),
         |r AS (SELECT s AS id, s AS lbl FROM e
         |      UNION
         |      SELECT e.d, r.lbl FROM r JOIN e ON e.s = r.id),
         |cc AS (SELECT id, min(lbl) component FROM r GROUP BY id),
         |xp AS (SELECT CASE WHEN cand.ia % 10 >= 8 THEN cand.ia ELSE cand.ib END batch_id
         |  FROM cand JOIN li USING (ia, ib)
         |  JOIN lsz x ON x.doc_id = cand.ia JOIN lsz y ON y.doc_id = cand.ib
         |  WHERE (cand.ia % 10 >= 8) <> (cand.ib % 10 >= 8)
         |    AND li.inter::DOUBLE / (x.n + y.n - li.inter) >= 0.05),
         |blocked AS (SELECT DISTINCT batch_id FROM xp),
         |bcomp AS (SELECT DISTINCT coalesce(cc.component, b.batch_id) AS component
         |  FROM blocked b LEFT JOIN cc ON cc.id = b.batch_id)
         |SELECT d.doc_id, coalesce(cc.component, d.doc_id) AS component,
         |  (coalesce(cc.component, d.doc_id) = d.doc_id
         |    AND bcomp.component IS NULL) AS admit
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 >= 8) d
         |LEFT JOIN cc ON cc.id = d.doc_id
         |LEFT JOIN bcomp ON bcomp.component = coalesce(cc.component, d.doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    // Unigram cross-entropy: H = ln(N+V) − mean ln(c(w)+1), summed in
    // the same sum/count form as the Spark agg; keep gated on the
    // rounded value and on n_tokens > 0 (token-less docs never keep).
    "x_unigram_ppl" ->
      s"""WITH w AS (SELECT doc_id, $words wds FROM documents),
        |e AS (SELECT doc_id, unnest(wds) token FROM w),
        |c AS (SELECT token, count(*) c FROM e GROUP BY 1),
        |t AS (SELECT sum(c) n, count(*) v FROM c),
        |h AS (SELECT e.doc_id, count(*) n_tokens,
        |        ln((SELECT n + v FROM t)) - sum(ln(c.c + 1)) / count(*) ce
        |      FROM e JOIN c ON c.token = e.token GROUP BY e.doc_id)
        |SELECT w.doc_id, coalesce(h.n_tokens, 0) AS n_tokens,
        |  round(coalesce(h.ce, 0.0), 6) AS cross_entropy,
        |  coalesce(round(h.ce, 6) < 3.41, false) AS keep
        |FROM w LEFT JOIN h ON h.doc_id = w.doc_id
        |ORDER BY w.doc_id""".stripMargin,

    // Interpolated-bigram cross-entropy replay: same even-slice
    // reference, same pair extraction (list_zip of the shifted lists),
    // same 0.7/0.3 decimal weights, unseen context zeroing the bigram
    // leg, add-1 unigram leg over (N+V). The SAME oracle also gates
    // x_bigram_ppl_store: the persisted-ledger model over init ∪ append
    // must be indistinguishable from the in-memory model of the union.
    "x_bigram_ppl" -> bigramPplSql,
    "x_bigram_ppl_store" -> bigramPplSql,

    // CCNet perplexity buckets: same cross-entropy chain, then
    // per-language tercile thresholds replayed with Spark's documented
    // percentile semantic — smallest x with cdf >= q at rank
    // ceil(q * n) — as a cumulative count window (the x_outlier_trim
    // idiom), never DuckDB's own quantile convention.
    "x_ppl_buckets" ->
      s"""WITH w AS (SELECT doc_id, lang, $words wds FROM documents),
        |e AS (SELECT doc_id, unnest(wds) token FROM w),
        |c AS (SELECT token, count(*) c FROM e GROUP BY 1),
        |t AS (SELECT sum(c) n, count(*) v FROM c),
        |h AS (SELECT e.doc_id, count(*) n_tokens,
        |        ln((SELECT n + v FROM t)) - sum(ln(c.c + 1)) / count(*) ce
        |      FROM e JOIN c ON c.token = e.token GROUP BY e.doc_id),
        |d AS (SELECT w.doc_id, w.lang, coalesce(h.n_tokens, 0) nt,
        |        round(coalesce(h.ce, 0.0), 6) ce
        |      FROM w LEFT JOIN h ON h.doc_id = w.doc_id),
        |nz AS (SELECT * FROM d WHERE nt > 0),
        |n AS (SELECT lang, count(*) n FROM nz GROUP BY 1),
        |r AS (SELECT lang, ce,
        |        count(*) OVER (PARTITION BY lang ORDER BY ce) cum FROM nz),
        |t1 AS (SELECT r.lang, min(ce) t1 FROM r JOIN n USING (lang)
        |       WHERE cum >= ceil(n.n / 3.0) GROUP BY 1),
        |t2 AS (SELECT r.lang, min(ce) t2 FROM r JOIN n USING (lang)
        |       WHERE cum >= ceil(2 * n.n / 3.0) GROUP BY 1)
        |SELECT d.doc_id, d.lang, d.ce AS cross_entropy,
        |  CASE WHEN d.nt = 0 THEN 'empty'
        |       WHEN d.ce <= t1.t1 THEN 'head'
        |       WHEN d.ce <= t2.t2 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM d LEFT JOIN t1 ON t1.lang = d.lang
        |  LEFT JOIN t2 ON t2.lang = d.lang
        |ORDER BY d.doc_id""".stripMargin,

    // DSIR: identical hashed unigram+bigram feature stream (md5 bucket,
    // u|/b| prefixes), add-1 models of target (%7 slice) and raw pool,
    // per-raw-doc lambda sum, then the same deterministic Gumbel top-64.
    "x_dsir_sample" ->
      s"""WITH w AS (SELECT doc_id, $words t FROM documents),
        |uf AS (SELECT doc_id, 'u|' || unnest(t) f FROM w),
        |bf AS (SELECT w.doc_id,
        |         'b|' || t[CAST(s.i AS INT)] || ' ' || t[CAST(s.i + 1 AS INT)] f
        |       FROM w, unnest(generate_series(1, len(t) - 1)) AS s(i)),
        |feats AS (SELECT doc_id, md5_number_lower(f) % 1024 b
        |          FROM (SELECT * FROM uf UNION ALL SELECT * FROM bf)),
        |rf AS (SELECT * FROM feats WHERE doc_id % 7 <> 0),
        |tf AS (SELECT * FROM feats WHERE doc_id % 7 = 0),
        |rc AS (SELECT b, count(*) cr FROM rf GROUP BY 1),
        |tc AS (SELECT b, count(*) ct FROM tf GROUP BY 1),
        |tot AS (SELECT (SELECT coalesce(sum(cr), 0) FROM rc) nr,
        |               (SELECT coalesce(sum(ct), 0) FROM tc) nt),
        |lam AS (SELECT rc.b,
        |          ln((coalesce(tc.ct, 0) + 1) / (tot.nt + 1024))
        |            - ln((rc.cr + 1) / (tot.nr + 1024)) l
        |        FROM rc LEFT JOIN tc ON tc.b = rc.b CROSS JOIN tot),
        |pd AS (SELECT rf.doc_id, sum(lam.l) lw
        |       FROM rf JOIN lam ON lam.b = rf.b GROUP BY 1),
        |base AS (SELECT d.doc_id, round(coalesce(pd.lw, 0.0), 6) lw
        |         FROM (SELECT doc_id FROM documents WHERE doc_id % 7 <> 0) d
        |         LEFT JOIN pd ON pd.doc_id = d.doc_id),
        |g AS (SELECT doc_id, lw,
        |        round(lw - ln(-ln((md5_number_lower('dsir|' || CAST(doc_id AS VARCHAR))
        |          % 1000000 + 0.5) / 1000000)), 6) k
        |      FROM base),
        |sel AS (SELECT doc_id FROM g ORDER BY k DESC, doc_id LIMIT 64)
        |SELECT g.doc_id, g.lw AS log_weight,
        |  (sel.doc_id IS NOT NULL) AS selected
        |FROM g LEFT JOIN sel ON sel.doc_id = g.doc_id
        |ORDER BY g.doc_id""".stripMargin,

    // Embedding decontamination: per-train max cosine vs the eval slice,
    // flag on the rounded value.
    "x_decontaminate_embed" ->
      """WITH tr AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 13 <> 0),
        |ev AS (SELECT vec_id eid, embedding ee FROM embeddings WHERE vec_id % 13 = 0),
        |u AS (SELECT t.vec_id, e.eid, unnest(t.embedding)::DOUBLE x,
        |        unnest(e.ee)::DOUBLE y FROM tr t, ev e),
        |s AS (SELECT vec_id, eid,
        |        sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))) sim
        |      FROM u GROUP BY 1, 2),
        |m AS (SELECT vec_id, max(sim) ms FROM s GROUP BY 1)
        |SELECT t.vec_id, round(coalesce(m.ms, 0.0), 6) AS max_sim,
        |  coalesce(round(m.ms, 6) >= 0.35, false) AS contaminated
        |FROM tr t LEFT JOIN m ON m.vec_id = t.vec_id
        |ORDER BY t.vec_id""".stripMargin,

    "x_oov_rate" ->
      s"""WITH w AS (SELECT doc_id, $words wds FROM documents),
        |v AS (SELECT token FROM (
        |    SELECT unnest(wds) token FROM w) GROUP BY token
        |  ORDER BY count(*) DESC, token LIMIT 100),
        |e AS (SELECT doc_id, unnest(wds) token FROM w),
        |c AS (SELECT e.doc_id, count(*) n_tokens,
        |    count(CASE WHEN v.token IS NULL THEN 1 END) n_oov
        |  FROM e LEFT JOIN v ON v.token = e.token GROUP BY e.doc_id)
        |SELECT w.doc_id, coalesce(c.n_tokens, 0) AS n_tokens,
        |  coalesce(c.n_oov, 0) AS n_oov,
        |  CASE WHEN coalesce(c.n_tokens, 0) > 0
        |       THEN round(c.n_oov::DOUBLE / c.n_tokens, 6) ELSE 0.0 END AS oov_rate
        |FROM w LEFT JOIN c ON c.doc_id = w.doc_id
        |ORDER BY w.doc_id""".stripMargin,

    // Vocabulary head: same token stream, same deterministic tie-break.
    "x_vocab_topk" ->
      s"""WITH w AS (SELECT unnest($words) token FROM documents)
        |SELECT token, count(*) AS cnt FROM w GROUP BY token
        |ORDER BY cnt DESC, token LIMIT 50""".stripMargin,

    // Per-source tf-idf replay: same tokenization, each source one
    // pseudo-document, gf = sources containing the term, idf over the
    // source count, same round-6 score and (score desc, token) ties.
    "x_tfidf_terms" ->
      s"""WITH w AS (SELECT source, unnest($words) token FROM documents),
         |tf AS (SELECT source, token, count(*) cnt FROM w GROUP BY 1, 2),
         |gf AS (SELECT token, count(*) gf FROM tf GROUP BY 1),
         |ns AS (SELECT count(DISTINCT source) n FROM tf),
         |sc AS (SELECT tf.source, tf.token, tf.cnt,
         |  round(tf.cnt * ln(ns.n::DOUBLE / gf.gf), 6) AS tfidf
         |  FROM tf JOIN gf USING (token) CROSS JOIN ns),
         |r AS (SELECT *, row_number() OVER
         |  (PARTITION BY source ORDER BY tfidf DESC, token) rn FROM sc)
         |SELECT source, token, cnt, tfidf FROM r WHERE rn <= 5
         |ORDER BY source, tfidf DESC, token""".stripMargin,

    // URL canonicalization: identical synthesis, identical replace
    // chain (fragment → utm + repair → default port → lowercase prefix
    // → trailing slash); RE2 backrefs are \n where Java's are $n.
    "x_url_canon" ->
      """WITH t AS (SELECT doc_id,
        |    'HTTPS://WWW.' || upper(source) || '.COM:443/Docs/' || (doc_id % 100) ||
        |    '/?utm_source=feed&utm_campaign=x' ||
        |    CASE WHEN doc_id % 2 = 0 THEN '&ref=a' ELSE '' END ||
        |    '#section-' || doc_id AS url FROM documents),
        |s1 AS (SELECT doc_id, url, regexp_replace(url, '#.*', '', 'g') u FROM t),
        |s2 AS (SELECT doc_id, url, regexp_replace(u, '[?&]utm_[A-Za-z_]*=[^&#]*', '', 'g') u FROM s1),
        |s3 AS (SELECT doc_id, url, regexp_replace(u, '^([^?]*)&', '\1?') u FROM s2),
        |s4 AS (SELECT doc_id, url, regexp_replace(u, '^([^/?#]*//(?:[^/?#@]*@)?(?:\[[^\]]*\]|[^/?#:@]*)):(80|443)([/?#]|$)', '\1\3') u FROM s3),
        |s5 AS (SELECT doc_id, url, u, regexp_extract(u, '^([^/?#]*//[^/?#]*)', 1) p FROM s4),
        |s6 AS (SELECT doc_id, url, lower(p) || substr(u, len(p) + 1) u FROM s5)
        |SELECT doc_id, url, regexp_replace(u, '/$', '') AS canonical
        |FROM s6 ORDER BY doc_id""".stripMargin,

    // Sequence packing: same shard hash, same per-shard running total,
    // same integer-division chunking.
    "x_pack_sequences" ->
      s"""WITH b AS (SELECT doc_id, CAST(len($words) AS INTEGER) n_tokens,
        |      CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) % 8 AS BIGINT) shard
        |    FROM documents),
        |f AS (SELECT * FROM b WHERE n_tokens > 0),
        |c AS (SELECT doc_id, shard, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) - n_tokens AS BIGINT) strt
        |  FROM f)
        |SELECT doc_id, shard, n_tokens,
        |  CAST(strt // 64 AS BIGINT) AS seq_first,
        |  CAST((strt + n_tokens - 1) // 64 AS BIGINT) AS seq_last,
        |  CAST(strt % 64 AS BIGINT) AS tok_offset
        |FROM c ORDER BY doc_id""".stripMargin,

    // FFD packing replay: the placement loop as a LINEAR recursive CTE
    // (one row per shard per step — the next item is determined, no
    // argmax needed) carrying the bin-load list; list_position returns
    // 0 for not-found in this DuckDB, hence the `> 0` fit test. Pure
    // integer arithmetic — exact.
    "x_pack_ffd" -> {
      val fit = "list_position(list_transform(r.bins, b -> b + c.nt <= 64), true)"
      s"""WITH RECURSIVE
        |b AS (SELECT doc_id, CAST(len($words) AS BIGINT) nt,
        |        CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) % 8 AS BIGINT) shard
        |      FROM documents),
        |f AS (SELECT doc_id, nt, shard,
        |        row_number() OVER (PARTITION BY shard ORDER BY nt DESC, doc_id) i
        |      FROM b WHERE nt > 0),
        |rec AS (
        |  SELECT shard, 0 AS i, []::BIGINT[] bins,
        |         NULL::BIGINT doc_id, NULL::BIGINT nt, NULL::INTEGER bin
        |  FROM (SELECT DISTINCT shard FROM f)
        |  UNION ALL
        |  SELECT r.shard, r.i + 1,
        |    CASE WHEN c.nt > 64 THEN r.bins
        |         WHEN $fit > 0 THEN
        |           list_transform(r.bins, (b, j) -> CASE WHEN j = $fit THEN b + c.nt ELSE b END)
        |         ELSE list_append(r.bins, c.nt) END,
        |    c.doc_id, c.nt,
        |    CASE WHEN c.nt > 64 THEN -1
        |         WHEN $fit > 0 THEN CAST($fit AS INTEGER)
        |         ELSE CAST(len(r.bins) + 1 AS INTEGER) END
        |  FROM rec r JOIN f c ON c.shard = r.shard AND c.i = r.i + 1
        |)
        |SELECT doc_id, shard, nt AS n_tokens, CAST(bin AS INTEGER) AS bin
        |FROM rec WHERE doc_id IS NOT NULL ORDER BY doc_id""".stripMargin
    },

    // Global-order packing: one running total over the whole corpus in
    // doc_id order — the single-stream form of x_pack_sequences.
    "x_pack_global" ->
      s"""WITH b AS (SELECT doc_id, CAST(len($words) AS INTEGER) n_tokens FROM documents),
        |f AS (SELECT * FROM b WHERE n_tokens > 0),
        |c AS (SELECT doc_id, n_tokens,
        |    CAST(sum(n_tokens) OVER (ORDER BY doc_id) - n_tokens AS BIGINT) strt
        |  FROM f)
        |SELECT doc_id, n_tokens,
        |  CAST(strt // 64 AS BIGINT) AS seq_first,
        |  CAST((strt + n_tokens - 1) // 64 AS BIGINT) AS seq_last,
        |  CAST(strt % 64 AS BIGINT) AS tok_offset
        |FROM c ORDER BY doc_id""".stripMargin,

    // Temperature mixture: identical rate formula (same operation order,
    // rounded to 6), then the md5 keep-decision replay. Every 17th doc
    // gets a NULL domain in both engines: the join is null-SAFE, so the
    // null shard is a domain of its own, sampled at its tempered rate.
    "x_temperature_mix" ->
      """WITH d0 AS (SELECT doc_id,
        |    CASE WHEN doc_id % 17 = 0 THEN NULL ELSE lang END AS lang FROM documents),
        |c AS (SELECT lang, count(*)::DOUBLE c FROM d0 GROUP BY lang),
        |t AS (SELECT sum(power(c, 0.5)) z, sum(c) n FROM c),
        |r AS (SELECT lang, round(least(1.0, 0.5 * t.n * (power(c.c, 0.5) / t.z) / c.c), 6) keep_frac
        |      FROM c, t)
        |SELECT d.doc_id, d.lang, r.keep_frac
        |FROM d0 d JOIN r ON d.lang IS NOT DISTINCT FROM r.lang
        |WHERE md5_number_lower('mix1|' || CAST(d.doc_id AS VARCHAR)) % 1000000 <
        |  CAST(floor(r.keep_frac * 1000000) AS BIGINT)
        |ORDER BY d.doc_id""".stripMargin,

    // ── Invariant oracles ────────────────────────────────────────────
    // For queries whose exact values are model outputs (ALS/KMeans/ANN),
    // hash equality against SQL is impossible — but their CONTRACTS are
    // not. Each oracle below computes the deterministic part (counts from
    // the raw tables) and states every invariant as a literal `true`; the
    // Spark side computes the same columns from its own output, so the
    // driver's hash compare passes iff every invariant actually holds.

    // ANN: 20 fixed queries, exactly k rows each, recall ≥ 0.6 vs the
    // exact top-k computed in the same Spark plan.
    "x_ann_ivf" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_queries, CAST(5 AS INTEGER) AS k,
        |  true AS rows_ok, true AS recall_ok
        |FROM embeddings WHERE vec_id < 20""".stripMargin,

    // IVF-SQ8: same ANN contract over the int8-quantized cell store,
    // plus the in-plan code-range invariant.
    "x_ann_ivf_quant" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_queries, CAST(5 AS INTEGER) AS k,
        |  true AS rows_ok, true AS recall_ok, true AS codes_ok
        |FROM embeddings WHERE vec_id < 20""".stripMargin,

    // ANN deletion contract (the x_ann_ivf_quant idiom): query count
    // from the raw table, the no-removed / shape / recall booleans
    // checked in-plan.
    "x_ann_delete" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_queries, CAST(5 AS INTEGER) AS k,
        |  true AS rows_ok, true AS no_removed_served, true AS recall_ok
        |FROM embeddings WHERE vec_id < 20""".stripMargin,

    // ALS: every user with events gets exactly k recs, dense ranks,
    // rank-monotone scores.
    "m7_als_recommend" ->
      """SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(5 AS INTEGER) AS k,
        |  true AS per_user_k_ok, true AS monotone_ok
        |FROM events""".stripMargin,

    // Cluster refinement: one label per vector, labels in {-1} ∪ [0, 10),
    // surviving clusters ≥ min size 5.
    "m5m6_cluster_refine" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows, true AS one_row_per_id,
        |  true AS labels_ok, true AS min_size_ok
        |FROM embeddings""".stripMargin,

    // Ingest pipeline cold start: every article with usable text opens a
    // singleton story whose id is content-addressed from its link.
    "pipe_ingest_cluster" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_stories,
        |  CAST(count(*) AS BIGINT) AS total_members,
        |  true AS singletons_ok, true AS ids_ok
        |FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0""".stripMargin,

    // Hybrid recommendation serving contract: every user with events gets
    // exactly topN rows, dense ranks, existing story ids, rank-monotone
    // scores.
    "pipe_hybrid_e2e" ->
      """SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(10 AS INTEGER) AS topn,
        |  true AS per_user_n_ok, true AS fk_ok, true AS monotone_ok
        |FROM events""".stripMargin,
  )
}
