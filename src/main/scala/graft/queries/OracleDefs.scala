package graft

/** Shared DuckDB SQL fragments for the per-family oracle maps —
 * moved verbatim from the pre-split OracleSql header; one
 * definition per replayed kernel so operating points cannot
 * drift between the oracles that share them. */
private[graft] object OracleDefs {

  // Shared fragments. Tokenization mirrors the JVM kernels exactly: split
  // on RUNS of whitespace and drop empty tokens, so multi-space/tab/empty
  // documents produce the same token stream as Spark's `\s+` split (a
  // single-space string_split would vote phantom '' tokens into hashes).
  // The whitespace class is spelled out rather than written `\s` because
  // the two regex engines disagree on it: Java's `\s` (the Spark side) is
  // exactly [ \t\n\x0B\f\r], DuckDB's RE2 `\s` excludes vertical tab
  // 0x0B — a document containing a vertical tab would tokenize
  // differently engine-vs-oracle under `\s+` on both sides.
  private[graft] val words =
    """list_filter(regexp_split_to_array(lower(trim(text)), '[ \t\n\x0b\f\r]+'), t -> t <> '')"""
  private[graft] val stops = "('the','a','an','of','and','to','in','is','it','for')"

  /** Shared by x_boilerplate_scrub (full corpus) and
    * x_boilerplate_incremental (the SAME global semantics restricted to
    * the batch slice — the LineStore incremental-equality law): df over
    * the WHOLE corpus either way. */
  private[graft] def boilerplateScrubSql(finalWhere: String): String =
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
  private[graft] lazy val bigramPplSql =
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
  private[graft] def bpeCtes(m: Int): String = {
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
  private[graft] val bpeEncodeSql =
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
  private[graft] val tokenizerFertilitySql =
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
  private[graft] def gopherCtes(src: String): String =
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

  private[graft] val gopherKeepSql =
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
  private[graft] val lshCandCtes: String =
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
  private[graft] val cdcCtes = {
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
  private[graft] lazy val epochExpandCtes: String =
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

  private[graft] lazy val dupComponentCtes: String =
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
  private[graft] lazy val hybridRrfSql: String =
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

  /** The media-admission replay — shared by x_mm_admit_incremental
    * (all-image fixtures) and x_mm_mixed_admit (payload modality
    * dispatched per pattern: image / audio / video through the
    * modality-sniffed perceptual key), because BOTH fixtures keep the
    * same invariants: payload bytes ≡ (pattern g, shift sh), perceptual
    * key ≡ g. The corpus split (g < 30 ∧ sh < 2 ∧ even id÷120 epoch) is
    * chosen so EVERY verdict branch is live against the standing store:
    * batch docs exact-hit stored shas (odd-epoch copies), perceptual-hit
    * stored patterns at a new shift, and fold batch-internally for the
    * ten store-missing patterns (g ≥ 30). The whole fold is group
    * arithmetic — never a hash value. */
  private[graft] lazy val mmAdmitSql: String =
    """WITH a AS (SELECT doc_id, (doc_id // 3) % 40 AS g, doc_id % 3 AS sh,
        |            ((doc_id // 3) % 40 < 30 AND doc_id % 3 < 2
        |              AND (doc_id // 120) % 2 = 0) AS in_c
        |          FROM documents),
        |c AS (SELECT * FROM a WHERE in_c),
        |b AS (SELECT * FROM a WHERE NOT in_c),
        |cg AS (SELECT g, min(doc_id) rep FROM c GROUP BY g),
        |cs AS (SELECT g, sh, min(doc_id) rep FROM c GROUP BY g, sh),
        |bm AS (SELECT g, min(doc_id) m FROM b
        |       WHERE g NOT IN (SELECT g FROM cg) GROUP BY g),
        |bmo AS (SELECT bm.g, bm.m, bb.sh AS msh
        |        FROM bm JOIN b bb ON bb.doc_id = bm.m)
        |SELECT b.doc_id,
        |  CASE WHEN cs.rep IS NOT NULL THEN 'duplicate'
        |       WHEN cg.rep IS NOT NULL THEN 'near_duplicate'
        |       WHEN b.doc_id = bmo.m THEN 'novel'
        |       WHEN b.sh = bmo.msh THEN 'duplicate'
        |       ELSE 'near_duplicate' END AS verdict,
        |  CAST(CASE WHEN cs.rep IS NOT NULL THEN cs.rep
        |            WHEN cg.rep IS NOT NULL THEN cg.rep
        |            WHEN b.doc_id = bmo.m THEN -1
        |            ELSE bmo.m END AS BIGINT) AS rep_id
        |FROM b
        |LEFT JOIN cs ON cs.g = b.g AND cs.sh = b.sh
        |LEFT JOIN cg ON cg.g = b.g
        |LEFT JOIN bmo ON bmo.g = b.g
        |ORDER BY b.doc_id""".stripMargin

  /** The incremental-SemDeDup replay chain — shared by
    * x_semdedup_incremental (in-memory corpus) and x_semdedup_store
    * (persisted cluster-laid-out corpus, bucket-pruned probe): same
    * deterministic per-label centroids, spec-pinned probe ≡
    * incremental. */
  private[graft] lazy val semDedupIncSql: String =
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

}
