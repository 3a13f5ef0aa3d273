"""DuckDB oracle twins for the extension queries.

Each SQL mirrors the Spark pipeline step-for-step with exact integer
arithmetic (see ``functions.texthash`` / ``functions.vectors`` for the
shared determinism contract).  DuckDB syntax deltas handled here:
1-based list indexing, ``regexp_replace`` needs the ``'g'`` flag,
``xor()`` instead of ``^`` (power in DuckDB), no ``conv()`` (h15
re-parses nibbles with shifts).
"""

from __future__ import annotations

from astra_perseverance_spark.extensions.similarity import (
    ANN_QUERY_COUNT,
    DUP_COSINE_MIN,
    IVF_MAX_LISTS,
    IVF_NPROBE,
)
from astra_perseverance_spark.extensions.pipeline import (
    GROWTH_BUCKETS,
    NGRAM_TOP_K,
    QF_MAX_PUNCT,
    QF_MIN_TOKENS,
    QF_MIN_TTR,
    SAMPLE_MOD,
    SAMPLE_PER_STRATUM,
    TFIDF_TOP_K,
    VOCAB_TOP_K,
)
from astra_perseverance_spark.extensions.text_stats import LANG_PROFILES
from astra_perseverance_spark.functions.texthash import (
    FP_BASE,
    FP_GRAM,
    FP_MOD,
    FP_WINDOW,
    MINHASH_BUCKET_CAP,
    MINHASH_JACCARD_MIN,
    MINHASH_P,
    MINHASH_ROWS,
    NGRAM_DF_CAP,
    SIMHASH_BLOCKS,
    SIMHASH_MAX_HAMMING,
    h15_sql,
    minhash_coeffs,
    simhash_block_bits_sql,
    word_shingles_sql,
)
from astra_perseverance_spark.functions.vectors import (
    ANN_DIM,
    ANN_TOPK,
    dot_q_sql,
    hyperplane_bucket_sql,
    plane_count_sql,
    quantize_sql,
)

_TOKS = "regexp_extract_all(lower(text), '[a-z0-9]+')"

# Stop-shingle-capped similarity universe (the exact-Jaccard path's
# declared semantics — see ``texthash.NGRAM_DF_CAP``): shingles with
# per-language document frequency above the cap are excluded, and each
# doc's set is the surviving shingles.  Row-based df + re-aggregated
# lists here vs the Spark side's windowed postings — independent
# formulations of the same sets.
_CAPPED_SH = f"""
sh0 AS (
  SELECT doc_id, lang, unnest({word_shingles_sql(_TOKS)}) AS g FROM documents
),
shdf AS (
  SELECT lang, g, COUNT(*) AS df FROM sh0 GROUP BY lang, g
),
sh AS (
  SELECT sh0.doc_id, sh0.lang, list(sh0.g) AS sh
  FROM sh0 JOIN shdf ON shdf.lang = sh0.lang AND shdf.g = sh0.g
  WHERE shdf.df <= {NGRAM_DF_CAP}
  GROUP BY sh0.doc_id, sh0.lang
)"""

EXT_ORACLE_SQL: dict[str, str] = {}

EXT_ORACLE_SQL["dedup_exact"] = """
WITH d AS (
  SELECT doc_id,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS content_md5
  FROM documents
)
SELECT content_md5, MIN(doc_id) AS rep_doc, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM d GROUP BY content_md5 ORDER BY rep_doc
"""

EXT_ORACLE_SQL["doc_digest_join"] = """
SELECT doc_id, lang, source,
       md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS content_md5
FROM documents ORDER BY doc_id
"""

EXT_ORACLE_SQL["dedup_incremental"] = f"""
WITH d AS (
  SELECT doc_id,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS content_md5
  FROM documents
),
old AS (
  -- every existing member of the digest group, not just its minimum:
  -- an exact duplicate of a non-representative existing doc is still
  -- kind='exact'
  SELECT content_md5, doc_id AS dup_of
  FROM d WHERE doc_id % 2 = 0
),
exact AS (
  SELECT d.doc_id, old.dup_of, 'exact' AS kind
  FROM d JOIN old USING (content_md5)
  WHERE d.doc_id % 2 = 1
),
{_CAPPED_SH.lstrip()},
np AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM sh x JOIN sh y ON x.lang = y.lang AND x.doc_id < y.doc_id
  WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
          / len(list_distinct(list_concat(x.sh, y.sh))) >= {MINHASH_JACCARD_MIN}
),
near AS (
  SELECT doc_b AS doc_id, doc_a AS dup_of, 'near' AS kind
  FROM np WHERE doc_a % 2 = 0 AND doc_b % 2 = 1
  UNION ALL
  SELECT doc_a AS doc_id, doc_b AS dup_of, 'near' AS kind
  FROM np WHERE doc_a % 2 = 1 AND doc_b % 2 = 0
)
SELECT doc_id, dup_of, kind FROM exact
UNION ALL
-- a pair reported exact never repeats under near (mirrors the
-- Spark side's left_anti)
SELECT n.doc_id, n.dup_of, n.kind FROM near n
WHERE NOT EXISTS (
  SELECT 1 FROM exact e
  WHERE e.doc_id = n.doc_id AND e.dup_of = n.dup_of
)
ORDER BY doc_id, dup_of
"""

EXT_ORACLE_SQL["dedup_tokenset"] = f"""
WITH d AS (
  SELECT doc_id,
         md5(array_to_string(list_sort(list_distinct({_TOKS})), ' ')) AS bag_md5
  FROM documents
)
SELECT bag_md5, MIN(doc_id) AS rep_doc, CAST(COUNT(*) AS BIGINT) AS n_docs,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS members
FROM d GROUP BY bag_md5 HAVING COUNT(*) >= 2 ORDER BY rep_doc
"""

_MH_SIG = ", ".join(
    f"list_min(list_transform(hm, h -> ({a}::BIGINT * h + {b}) % {MINHASH_P}))"
    for a, b in minhash_coeffs()
)
_MH_BANDS = ", ".join(
    "("
    + " || ':' || ".join(
        f"CAST(mh[{b * MINHASH_ROWS + r + 1}] AS VARCHAR)" for r in range(MINHASH_ROWS)
    )
    + f") AS k{b}"
    for b in range(8)
)
_MH_BAND_UNION = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, k{b} AS key FROM sig_bands" for b in range(8)
)

EXT_ORACLE_SQL["dedup_minhash_lsh"] = f"""
WITH sh AS (
  SELECT doc_id, {word_shingles_sql(_TOKS)} AS sh
  FROM documents
  WHERE len({word_shingles_sql(_TOKS)}) > 0
),
hm AS (
  SELECT doc_id, sh,
         list_transform(sh, s -> {h15_sql('s')} % {MINHASH_P}) AS hm
  FROM sh
),
sig AS (
  SELECT doc_id, sh, [{_MH_SIG}] AS mh FROM hm
),
sig_bands AS (
  SELECT doc_id, {_MH_BANDS} FROM sig
),
bands AS ({_MH_BAND_UNION}),
sized AS (
  SELECT doc_id, band, key,
         COUNT(*) OVER (PARTITION BY band, key) AS bucket_n
  FROM bands
),
capped AS (SELECT * FROM sized WHERE bucket_n <= {MINHASH_BUCKET_CAP}),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM capped x JOIN capped y
    ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
FROM cand c
JOIN sh a ON a.doc_id = c.doc_a
JOIN sh b ON b.doc_id = c.doc_b
WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         / len(list_distinct(list_concat(a.sh, b.sh))) >= {MINHASH_JACCARD_MIN}
ORDER BY doc_a, doc_b
"""

# Corpus-scaled block width (mirrors ``texthash.simhash_block_bits``):
# 4 blocks × bb bits, bb from the document count — the Spark side
# computes the same integer from a driver-side count job.
_SIM_CHUNKS = ", ".join(
    f"((simhash >> CAST({c} * sp.bb AS INT)) & "
    f"((1::BIGINT << CAST(sp.bb AS INT)) - 1)) AS c{c}"
    for c in range(SIMHASH_BLOCKS)
)
_SIM_BLOCK_UNION = " UNION ALL ".join(
    f"SELECT doc_id, simhash, {c} AS blk, c{c} AS chunk FROM chunked"
    for c in range(SIMHASH_BLOCKS)
)

EXT_ORACLE_SQL["dedup_simhash"] = f"""
WITH sp AS (
  SELECT {simhash_block_bits_sql('(SELECT COUNT(*) FROM documents)')} AS bb
),
tok AS (
  SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
),
tc AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS cnt,
         {h15_sql('tok')} AS th
  FROM tok GROUP BY doc_id, tok
),
contrib AS (
  SELECT doc_id, u.i AS i,
         cnt * (((th >> CAST(u.i AS INT)) & 1) * 2 - 1) AS c
  FROM tc, sp, unnest(range({SIMHASH_BLOCKS} * sp.bb)) AS u(i)
),
bits AS (
  SELECT doc_id, i, SUM(c) AS s FROM contrib GROUP BY doc_id, i
),
sim AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN s >= 0 THEN (1::BIGINT << CAST(i AS INT)) ELSE 0 END) AS BIGINT)
           AS simhash
  FROM bits GROUP BY doc_id
),
chunked AS (SELECT doc_id, simhash, {_SIM_CHUNKS} FROM sim, sp),
blocks AS ({_SIM_BLOCK_UNION})
SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
       bit_count(xor(x.simhash, y.simhash)) AS hamming
FROM blocks x JOIN blocks y
  ON x.blk = y.blk AND x.chunk = y.chunk AND x.doc_id < y.doc_id
WHERE bit_count(xor(x.simhash, y.simhash)) <= {SIMHASH_MAX_HAMMING}
ORDER BY doc_a, doc_b
"""

EXT_ORACLE_SQL["ngram_jaccard"] = f"""
WITH {_CAPPED_SH}
SELECT x.lang, x.doc_id AS doc_a, y.doc_id AS doc_b,
       CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
         / len(list_distinct(list_concat(x.sh, y.sh))) AS jaccard
FROM sh x JOIN sh y ON x.lang = y.lang AND x.doc_id < y.doc_id
WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
         / len(list_distinct(list_concat(x.sh, y.sh))) >= {MINHASH_JACCARD_MIN}
ORDER BY doc_a, doc_b
"""

EXT_ORACLE_SQL["vocab_top_terms"] = f"""
WITH dt AS (
  SELECT doc_id, lang, unnest(list_distinct({_TOKS})) AS term
  FROM documents
),
dfc AS (
  SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS df_docs
  FROM dt GROUP BY lang, term
)
SELECT lang, rank, term, df_docs FROM (
  SELECT lang, term, df_docs,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY df_docs DESC, term) AS rank
  FROM dfc
) WHERE rank <= {VOCAB_TOP_K} ORDER BY lang, rank
"""

# Twin of extensions/pipeline.py::q_vocab_growth (round 11): hash-
# random corpus increments, per-increment new-term counts via the
# term-grain MIN(bucket), and running totals over the bucket grain.
EXT_ORACLE_SQL["vocab_growth"] = f"""
WITH d AS (
  SELECT CAST({h15_sql("CAST(doc_id AS VARCHAR)")} % {GROWTH_BUCKETS}
              AS INT) AS bucket,
         {_TOKS} AS t
  FROM documents
),
dp AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs FROM d GROUP BY bucket
),
frst AS (
  SELECT term, MIN(bucket) AS bucket
  FROM (SELECT bucket, unnest(list_distinct(t)) AS term FROM d)
  GROUP BY term
),
nt AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS new_terms
  FROM frst GROUP BY bucket
),
j AS (
  SELECT dp.bucket, dp.n_docs,
         COALESCE(nt.new_terms, CAST(0 AS BIGINT)) AS new_terms
  FROM dp LEFT JOIN nt USING (bucket)
)
SELECT bucket, n_docs, new_terms,
       CAST(SUM(n_docs) OVER (ORDER BY bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_docs,
       CAST(SUM(new_terms) OVER (ORDER BY bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS vocab_size
FROM j ORDER BY bucket
"""

EXT_ORACLE_SQL["tfidf_top_terms"] = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS}) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, term
),
dfc AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df_docs
  FROM tf GROUP BY term
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfc.df_docs,
         CAST(tf.tf AS DOUBLE) * n.n_docs / dfc.df_docs AS score
  FROM tf JOIN dfc USING (term) CROSS JOIN n
)
SELECT doc_id, rank, term, tf, df_docs, score FROM (
  SELECT doc_id, term, tf, df_docs, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, term) AS rank
  FROM scored
) WHERE rank <= {TFIDF_TOP_K} ORDER BY doc_id, rank
"""

EXT_ORACLE_SQL["ngram_counts"] = f"""
WITH toks AS (
  SELECT doc_id, lang, {_TOKS} AS t FROM documents
),
grams AS (
  SELECT lang, t[CAST(i + 1 AS INT)] || ' ' || t[CAST(i + 2 AS INT)] AS bigram
  FROM toks, unnest(range(greatest(len(t) - 1, 0))) AS u(i)
),
counts AS (
  SELECT lang, bigram, CAST(COUNT(*) AS BIGINT) AS n
  FROM grams GROUP BY lang, bigram
)
SELECT lang, rank, bigram, n FROM (
  SELECT lang, bigram, n,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, bigram) AS rank
  FROM counts
) WHERE rank <= {NGRAM_TOP_K} ORDER BY lang, rank
"""

EXT_ORACLE_SQL["corpus_sample_fixed"] = f"""
SELECT lang, pick, doc_id FROM (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY {h15_sql("CAST(doc_id AS VARCHAR)")}, doc_id
         ) AS pick
  FROM documents
) WHERE pick <= {SAMPLE_PER_STRATUM} ORDER BY lang, pick
"""

EXT_ORACLE_SQL["corpus_sample"] = f"""
SELECT doc_id, lang, source, n_chars FROM documents
WHERE {h15_sql("CAST(doc_id AS VARCHAR)")} % {SAMPLE_MOD} = 0
ORDER BY doc_id
"""

EXT_ORACLE_SQL["quality_filter"] = f"""
WITH d AS (
  SELECT doc_id,
         {_TOKS} AS toks,
         CASE WHEN n_chars <> 0 THEN
           CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
           / n_chars ELSE 0.0 END AS punct_ratio,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS h
  FROM documents
),
s AS (
  SELECT doc_id, h,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CASE WHEN len(toks) <> 0 THEN
           CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
           ELSE 0.0 END AS ttr,
         punct_ratio
  FROM d
),
rep AS (SELECT h, MIN(doc_id) AS rep_doc FROM d GROUP BY h),
flagged AS (
  SELECT s.doc_id,
         concat_ws(';',
           CASE WHEN s.n_tokens < {QF_MIN_TOKENS} THEN 'too_short' END,
           CASE WHEN s.ttr < {QF_MIN_TTR} THEN 'low_ttr' END,
           CASE WHEN s.punct_ratio > {QF_MAX_PUNCT} THEN 'high_punct' END,
           CASE WHEN s.doc_id > rep.rep_doc THEN 'exact_dup' END
         ) AS reasons
  FROM s JOIN rep USING (h)
)
SELECT doc_id, reasons FROM flagged WHERE reasons <> '' ORDER BY doc_id
"""

EXT_ORACLE_SQL["dedup_clusters"] = f"""
WITH RECURSIVE
d AS (
  SELECT doc_id,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS h
  FROM documents
),
grp AS (SELECT h, MIN(doc_id) AS m, COUNT(*) AS c FROM d GROUP BY h),
exact_e AS (
  SELECT grp.m AS a, d.doc_id AS b
  FROM d JOIN grp USING (h)
  WHERE grp.c >= 2 AND d.doc_id > grp.m
),
{_CAPPED_SH.lstrip()},
near_e AS (
  SELECT x.doc_id AS a, y.doc_id AS b
  FROM sh x JOIN sh y ON x.lang = y.lang AND x.doc_id < y.doc_id
  WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
          / len(list_distinct(list_concat(x.sh, y.sh))) >= {MINHASH_JACCARD_MIN}
),
edges AS (SELECT a, b FROM exact_e UNION SELECT a, b FROM near_e),
sym AS (SELECT a AS s, b AS t FROM edges
        UNION ALL SELECT b AS s, a AS t FROM edges),
nodes AS (SELECT DISTINCT s AS doc FROM sym),
reach(doc, m) AS (
  SELECT doc, doc FROM nodes
  UNION
  SELECT r.doc, s.t FROM reach r JOIN sym s ON s.s = r.m
),
cl AS (SELECT doc AS doc_id, MIN(m) AS cluster_id FROM reach GROUP BY doc)
SELECT cluster_id, doc_id,
       CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
FROM cl ORDER BY cluster_id, doc_id
"""

_VEC = f"""
v AS (
  SELECT vec_id, label, {quantize_sql('embedding')} AS eq FROM embeddings
),
vn AS (
  SELECT vec_id, label, eq, {dot_q_sql('eq', 'eq', ANN_DIM)} AS n2 FROM v
),
pl AS (
  SELECT {plane_count_sql('(SELECT COUNT(*) FROM embeddings)')} AS p
),
strd AS (
  SELECT greatest(1, n // greatest(
           least(CAST(FLOOR(SQRT(CAST(n AS DOUBLE))) AS BIGINT),
                 {IVF_MAX_LISTS}), 1)) AS stride
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings)
),
qsel AS (
  SELECT vec_id FROM embeddings
  ORDER BY {h15_sql('CAST(vec_id AS VARCHAR)')}, vec_id
  LIMIT {ANN_QUERY_COUNT}
)
"""

_COS = (
    f"CAST({dot_q_sql('q.eq', 'c.eq', ANN_DIM)} AS DOUBLE)"
    " / (sqrt(CAST(q.n2 AS DOUBLE)) * sqrt(CAST(c.n2 AS DOUBLE)))"
)

EXT_ORACLE_SQL["embedding_topk"] = f"""
WITH {_VEC},
q AS (SELECT * FROM vn WHERE vec_id IN (SELECT vec_id FROM qsel)),
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_COS} AS cosine
  FROM q JOIN vn c ON c.vec_id <> q.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM pairs
)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cosine
FROM ranked WHERE rank <= {ANN_TOPK} ORDER BY query_id, rank
"""

EXT_ORACLE_SQL["ann_lsh_bucket"] = f"""
WITH {_VEC},
vb AS (SELECT vec_id, label, eq, n2, {hyperplane_bucket_sql('eq')} AS bucket
       FROM vn CROSS JOIN pl),
q AS (SELECT * FROM vb WHERE vec_id IN (SELECT vec_id FROM qsel)),
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_COS} AS cosine
  FROM q JOIN vb c ON c.bucket = q.bucket AND c.vec_id <> q.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM pairs
)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cosine
FROM ranked WHERE rank <= {ANN_TOPK} ORDER BY query_id, rank
"""

EXT_ORACLE_SQL["ann_recall_audit"] = f"""
WITH {_VEC},
vb AS (SELECT vec_id, label, eq, n2, {hyperplane_bucket_sql('eq')} AS bucket
       FROM vn CROSS JOIN pl),
q AS (SELECT * FROM vb WHERE vec_id IN (SELECT vec_id FROM qsel)),
exact_pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_COS} AS cosine
  FROM q JOIN vn c ON c.vec_id <> q.vec_id
),
exact_ranked AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM exact_pairs
),
exact_k AS (SELECT query_id, neighbor_id FROM exact_ranked WHERE rank <= {ANN_TOPK}),
ann_pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_COS} AS cosine
  FROM q JOIN vb c ON c.bucket = q.bucket AND c.vec_id <> q.vec_id
),
ann_ranked AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM ann_pairs
),
ann_k AS (SELECT query_id, neighbor_id FROM ann_ranked WHERE rank <= {ANN_TOPK}),
hits AS (
  SELECT e.query_id,
         CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS hit
  FROM exact_k e LEFT JOIN ann_k a
    ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
)
SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_exact,
       CAST(SUM(hit) AS BIGINT) AS n_hit,
       CAST(SUM(hit) AS DOUBLE) / COUNT(*) AS recall
FROM hits GROUP BY query_id ORDER BY query_id
"""

EXT_ORACLE_SQL["ann_ivf"] = f"""
WITH {_VEC},
cent AS (SELECT vec_id AS cid, eq AS c_eq, n2 AS c_n2 FROM vn
         WHERE vec_id % (SELECT stride FROM strd) = 0),
aff AS (
  SELECT v.vec_id, v.eq, v.n2, c.cid,
         CAST({dot_q_sql('v.eq', 'c.c_eq', ANN_DIM)} AS DOUBLE)
           / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.c_n2 AS DOUBLE)))
           AS ccos
  FROM vn v CROSS JOIN cent c
),
ranked_aff AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                               ORDER BY ccos DESC, cid) AS crank
  FROM aff
),
assign AS (SELECT vec_id, eq, n2, cid FROM ranked_aff WHERE crank = 1),
probes AS (
  SELECT vec_id AS query_id, eq AS q_eq, n2 AS q_n2, cid
  FROM ranked_aff
  WHERE vec_id IN (SELECT vec_id FROM qsel) AND crank <= {IVF_NPROBE}
),
pairs AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         CAST({dot_q_sql('p.q_eq', 'a.eq', ANN_DIM)} AS DOUBLE)
           / (sqrt(CAST(p.q_n2 AS DOUBLE)) * sqrt(CAST(a.n2 AS DOUBLE)))
           AS cosine
  FROM probes p JOIN assign a ON a.cid = p.cid AND a.vec_id <> p.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM pairs
)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cosine
FROM ranked WHERE rank <= {ANN_TOPK} ORDER BY query_id, rank
"""

EXT_ORACLE_SQL["embedding_cosine_dups"] = f"""
WITH {_VEC},
vb AS (SELECT vec_id, eq, n2, {hyperplane_bucket_sql('eq')} AS bucket
       FROM vn CROSS JOIN pl)
SELECT q.vec_id AS vec_a, c.vec_id AS vec_b, {_COS} AS cosine
FROM vb q JOIN vb c ON c.bucket = q.bucket AND q.vec_id < c.vec_id
WHERE {_COS} >= {DUP_COSINE_MIN}
ORDER BY vec_a, vec_b
"""

_STOP_EN = ", ".join(f"'{s}'" for s in LANG_PROFILES[0][1])

EXT_ORACLE_SQL["embedding_dup_clusters"] = f"""
WITH RECURSIVE
{_VEC},
vb AS (SELECT vec_id, eq, n2, {hyperplane_bucket_sql('eq')} AS bucket
       FROM vn CROSS JOIN pl),
e AS (
  SELECT q.vec_id AS a, c.vec_id AS b
  FROM vb q JOIN vb c ON c.bucket = q.bucket AND q.vec_id < c.vec_id
  WHERE {_COS} >= {DUP_COSINE_MIN}
),
sym AS (SELECT a AS s, b AS t FROM e UNION ALL SELECT b AS s, a AS t FROM e),
nodes AS (SELECT DISTINCT s AS v FROM sym),
reach(v, m) AS (
  SELECT v, v FROM nodes
  UNION
  SELECT r.v, s.t FROM reach r JOIN sym s ON s.s = r.m
),
cl AS (SELECT v AS vec_id, MIN(m) AS cluster_id FROM reach GROUP BY v)
SELECT cluster_id, vec_id,
       CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
FROM cl ORDER BY cluster_id, vec_id
"""

EXT_ORACLE_SQL["text_stats"] = f"""
WITH d AS (
  SELECT doc_id, lang, source, CAST(n_chars AS BIGINT) AS n_chars,
         {_TOKS} AS toks,
         CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS BIGINT)
           AS n_punct
  FROM documents
),
s AS (
  -- zero-denominator ratios are a DECLARED 0.0 (docs with no
  -- [a-z0-9] tokens / empty text), mirroring text_stats._sdiv
  SELECT doc_id, lang, source, n_chars,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
         CASE WHEN len(toks) <> 0 THEN
           CAST(COALESCE(list_sum(list_transform(toks, t -> length(t))), 0)
                AS DOUBLE) / len(toks) ELSE 0.0 END AS avg_token_len,
         CASE WHEN len(list_distinct(toks)) <> 0 THEN
           CAST(len(list_intersect(list_distinct(toks), [{_STOP_EN}])) AS DOUBLE)
           / len(list_distinct(toks)) ELSE 0.0 END AS stopword_ratio,
         CASE WHEN n_chars <> 0 THEN CAST(n_punct AS DOUBLE) / n_chars
           ELSE 0.0 END AS punct_ratio,
         CASE WHEN len(toks) <> 0 THEN
           CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
           ELSE 0.0 END AS ttr
  FROM d
)
SELECT *, least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * (1.0 - punct_ratio) * ttr
         AS quality
FROM s ORDER BY doc_id
"""


def _lang_id_sql() -> str:
    scores = ", ".join(
        f"CAST(len(list_intersect(dt, [{', '.join(repr(s) for s in prof)}])) AS BIGINT)"
        f" AS s_{lang}"
        for lang, prof in LANG_PROFILES
    )
    # Mirror the Spark fold: strictly-greater beats the running best.
    pred = f"'{LANG_PROFILES[0][0]}'"
    best = f"s_{LANG_PROFILES[0][0]}"
    for lang, _ in LANG_PROFILES[1:]:
        pred = f"CASE WHEN s_{lang} > {best} THEN '{lang}' ELSE {pred} END"
        best = f"CASE WHEN s_{lang} > {best} THEN s_{lang} ELSE {best} END"
    return f"""
WITH d AS (
  SELECT doc_id, lang, list_distinct({_TOKS}) AS dt FROM documents
),
s AS (SELECT doc_id, lang, {scores} FROM d)
SELECT doc_id, lang, {pred} AS pred_lang, {best} AS score,
       CAST({pred} = lang AS INT) AS is_match
FROM s ORDER BY doc_id
"""


EXT_ORACLE_SQL["lang_id"] = _lang_id_sql()

EXT_ORACLE_SQL["token_count"] = f"""
SELECT doc_id,
       CAST(len({_TOKS}) AS BIGINT) AS n_ws_tokens,
       CAST(COALESCE(list_sum(list_transform({_TOKS},
              t -> (length(t) + 3) // 4)), 0) AS BIGINT)
         AS n_bpe_units,
       CASE WHEN len({_TOKS}) <> 0
         THEN CAST(n_chars AS DOUBLE) / len({_TOKS}) ELSE 0.0 END
         AS chars_per_token
FROM documents ORDER BY doc_id
"""

_FP_POWERS = [FP_BASE ** (FP_GRAM - 1 - k) % FP_MOD for k in range(FP_GRAM)]
_FP_GRAM_TERMS = " + ".join(
    f"ascii(substr(nt, CAST(p + {k + 1} AS INT), 1)) * {_FP_POWERS[k]}::BIGINT"
    for k in range(FP_GRAM)
)

EXT_ORACLE_SQL["doc_fingerprint"] = f"""
WITH d AS (
  SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS nt
  FROM documents
),
g AS (
  SELECT doc_id,
         list_transform(range(length(nt) - {FP_GRAM - 1}),
                        p -> ({_FP_GRAM_TERMS}) % {FP_MOD}) AS gh
  FROM d WHERE length(nt) - {FP_GRAM - 1} >= {FP_WINDOW}
),
f AS (
  SELECT doc_id,
         list_distinct(list_transform(range(len(gh) - {FP_WINDOW - 1}),
           w -> list_min(list_slice(gh, CAST(w + 1 AS INT), CAST(w + {FP_WINDOW} AS INT)))))
           AS fps
  FROM g
)
SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fps, list_min(fps) AS min_fp,
       CAST(list_sum(fps) % {FP_MOD} AS BIGINT) AS fp_digest
FROM f ORDER BY doc_id
"""

EXT_ORACLE_SQL["multimodal_features"] = f"""
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
       CAST(64 + doc_id % 960 AS INT) AS width,
       CAST(64 + (doc_id * 7) % 540 AS INT) AS height,
       CAST(1 + doc_id % 8 AS INT) AS n_frames,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       {h15_sql('text')} AS content_h15
FROM documents ORDER BY doc_id
"""

EXT_ORACLE_SQL["multimodal_frame_sample"] = """
WITH video AS (
  SELECT doc_id, CAST(1 + doc_id % 8 AS BIGINT) AS n_frames,
         CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
  FROM documents WHERE doc_id % 3 = 2
)
SELECT doc_id, CAST(unnest(range(0, n_frames, 2)) AS INT) AS frame_no,
       CAST(n_frames AS INT) AS n_frames, byte_len // n_frames AS est_bytes
FROM video ORDER BY doc_id, frame_no
"""

# ---------------------------------------------------------------------------
# Curation family (extensions/curation.py)

from astra_perseverance_spark.extensions.curation import (  # noqa: E402
    DECON_MIN_SHARED,
    DECON_PANEL_K,
    GOPHER_MAX_BULLET_FRAC,
    GOPHER_MAX_DUP_LINE_FRAC,
    GOPHER_MAX_ELLIPSIS_FRAC,
    GOPHER_MAX_MEAN_WORD_LEN,
    GOPHER_MAX_SYMBOL_RATIO,
    GOPHER_MAX_WORDS,
    GOPHER_MIN_ALPHA_FRAC,
    GOPHER_MIN_MEAN_WORD_LEN,
    GOPHER_MIN_WORDS,
    MIX_BUDGET,
    PII_EMAIL,
    PII_IPV4,
    PII_PHONE,
)

# --- Gopher fragments shared by quality_signals + quality_report ----
# One source for the raw-column CTE, the metric expressions, and the
# pass predicate: a threshold or expression change edits exactly one
# place per engine (curation.py constants are the shared thresholds).
_GOPHER_RAW_COLS = """regexp_split_to_array(trim(text), '\\s+') AS words,
         string_split(text, chr(10)) AS lines,
         CAST(len(regexp_extract_all(text, '#')) AS BIGINT) AS n_hash,
         CAST(len(regexp_extract_all(text, '\\.\\.\\.')) AS BIGINT) AS n_ell"""

_GOPHER_METRICS: dict[str, str] = {
    "n_words": "CAST(len(words) AS BIGINT)",
    "mean_word_len": ("CAST(list_sum(list_transform(words, w -> length(w)))"
                      " AS DOUBLE) / len(words)"),
    "symbol_word_ratio": "CAST(n_hash + n_ell AS DOUBLE) / len(words)",
    "alpha_word_frac": ("CAST(len(list_filter(words, "
                        "w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)"
                        " / len(words)"),
    "bullet_line_frac": ("CAST(len(list_filter(lines, "
                         "l -> regexp_matches(ltrim(l), '^[-*•]')))"
                         " AS DOUBLE) / len(lines)"),
    "ellipsis_line_frac": ("CAST(len(list_filter(lines, "
                           "l -> regexp_matches(rtrim(l), '\\.\\.\\.$')))"
                           " AS DOUBLE) / len(lines)"),
    "dup_line_frac": ("CAST(len(lines) - len(list_distinct(lines))"
                      " AS DOUBLE) / len(lines)"),
}


def _gopher_pass_sql(m: dict[str, str]) -> str:
    """The pass predicate over metric SQL expressions — pass the
    metric-name identity map when the metrics are already named
    columns (quality_signals), or ``_GOPHER_METRICS`` to inline them
    (quality_report)."""
    return (
        f"({m['n_words']} BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}\n"
        f"        AND {m['mean_word_len']}\n"
        f"            BETWEEN {GOPHER_MIN_MEAN_WORD_LEN}"
        f" AND {GOPHER_MAX_MEAN_WORD_LEN}\n"
        f"        AND {m['symbol_word_ratio']} < {GOPHER_MAX_SYMBOL_RATIO}\n"
        f"        AND {m['bullet_line_frac']} < {GOPHER_MAX_BULLET_FRAC}\n"
        f"        AND {m['ellipsis_line_frac']} < {GOPHER_MAX_ELLIPSIS_FRAC}\n"
        f"        AND {m['alpha_word_frac']} > {GOPHER_MIN_ALPHA_FRAC}\n"
        f"        AND {m['dup_line_frac']} < {GOPHER_MAX_DUP_LINE_FRAC})"
    )


_GOPHER_METRIC_COLS = ",\n         ".join(
    f"{expr} AS {name}" for name, expr in _GOPHER_METRICS.items()
)

EXT_ORACLE_SQL["quality_signals"] = f"""
WITH d AS (
  SELECT doc_id,
         {_GOPHER_RAW_COLS}
  FROM documents
),
m AS (
  SELECT doc_id,
         {_GOPHER_METRIC_COLS}
  FROM d
)
SELECT *,
       {_gopher_pass_sql({k: k for k in _GOPHER_METRICS})} AS gopher_pass
FROM m ORDER BY doc_id
"""

EXT_ORACLE_SQL["pii_scan"] = f"""
WITH d AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '{PII_EMAIL}')) AS BIGINT)
           AS n_email,
         CAST(len(regexp_extract_all(text, '{PII_IPV4}')) AS BIGINT)
           AS n_ipv4,
         CAST(len(regexp_extract_all(text, '{PII_PHONE}')) AS BIGINT)
           AS n_phone,
         md5(regexp_replace(regexp_replace(regexp_replace(text,
               '{PII_EMAIL}', '<EMAIL>', 'g'),
               '{PII_IPV4}', '<IP>', 'g'),
               '{PII_PHONE}', '<PHONE>', 'g')) AS redacted_md5
  FROM documents
)
SELECT doc_id, n_email, n_ipv4, n_phone, redacted_md5,
       CAST(n_email + n_ipv4 + n_phone AS BIGINT) AS pii_total
FROM d ORDER BY doc_id
"""

# Decontamination CTE chain (needs _CAPPED_SH's sh0/shdf in scope) —
# shared by the decontaminate twin and corpus_curate's `contaminated`
# reason, so the panel/threshold semantics live in one place.
_DECON_CTES = f"""cap AS (
  SELECT sh0.doc_id, sh0.lang, sh0.g
  FROM sh0 JOIN shdf ON shdf.lang = sh0.lang AND shdf.g = sh0.g
  WHERE shdf.df <= {NGRAM_DF_CAP}
),
panel AS (
  SELECT doc_id AS bench_doc FROM documents
  ORDER BY {h15_sql("CAST(doc_id AS VARCHAR)")}, doc_id
  LIMIT {DECON_PANEL_K}
),
bsh AS (
  SELECT p.bench_doc, c.lang, c.g
  FROM cap c JOIN panel p ON c.doc_id = p.bench_doc
),
tr AS (
  SELECT c.* FROM cap c
  WHERE c.doc_id NOT IN (SELECT bench_doc FROM panel)
),
decon_hits AS (
  SELECT tr.doc_id, bsh.bench_doc, CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM tr JOIN bsh ON tr.lang = bsh.lang AND tr.g = bsh.g
  GROUP BY tr.doc_id, bsh.bench_doc
  HAVING COUNT(*) >= {DECON_MIN_SHARED}
)"""

EXT_ORACLE_SQL["decontaminate"] = f"""
WITH {_CAPPED_SH.lstrip()},
{_DECON_CTES}
SELECT doc_id, bench_doc, n_shared FROM decon_hits
ORDER BY doc_id, bench_doc
"""

EXT_ORACLE_SQL["source_cross_dup"] = f"""
WITH {_CAPPED_SH},
d AS (
  SELECT doc_id, source,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
           AS content_md5
  FROM documents
),
comp AS (
  SELECT content_md5, source, CAST(COUNT(*) AS BIGINT) AS c
  FROM d GROUP BY content_md5, source
),
exact AS (
  SELECT source_a, source_b, CAST(SUM(p) AS BIGINT) AS exact_pairs
  FROM (
    SELECT source AS source_a, source AS source_b, c * (c - 1) // 2 AS p
    FROM comp
    UNION ALL
    SELECT x.source AS source_a, y.source AS source_b, x.c * y.c AS p
    FROM comp x JOIN comp y USING (content_md5) WHERE x.source < y.source
  ) GROUP BY source_a, source_b HAVING SUM(p) > 0
),
np AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM sh x JOIN sh y ON x.lang = y.lang AND x.doc_id < y.doc_id
  WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
        / len(list_distinct(list_concat(x.sh, y.sh)))
        >= {MINHASH_JACCARD_MIN}
),
near AS (
  SELECT least(sa.source, sb.source) AS source_a,
         greatest(sa.source, sb.source) AS source_b,
         CAST(COUNT(*) AS BIGINT) AS near_pairs
  FROM np JOIN documents sa ON np.doc_a = sa.doc_id
          JOIN documents sb ON np.doc_b = sb.doc_id
  GROUP BY 1, 2
)
SELECT source_a, source_b,
       CAST(coalesce(exact_pairs, 0) AS BIGINT) AS exact_pairs,
       CAST(coalesce(near_pairs, 0) AS BIGINT) AS near_pairs
FROM exact FULL JOIN near USING (source_a, source_b)
ORDER BY source_a, source_b
"""

EXT_ORACLE_SQL["source_mix"] = f"""
WITH c AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_src FROM documents
  GROUP BY source
),
w AS (
  SELECT source, n_src,
         CAST(FLOOR(SQRT(CAST(n_src AS DOUBLE))) AS BIGINT) AS w
  FROM c
),
t AS (SELECT CAST(SUM(w) AS BIGINT) AS tot FROM w),
q AS (
  SELECT source, n_src,
         CAST(({MIX_BUDGET} * w) // tot AS BIGINT) AS quota
  FROM w, t
),
r AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY {h15_sql("CAST(doc_id AS VARCHAR)")}, doc_id
         ) AS pick
  FROM documents
)
SELECT r.source, r.pick, r.doc_id, q.quota
FROM r JOIN q USING (source)
WHERE r.pick <= q.quota
ORDER BY source, pick
"""

# dedup_keep_list reuses the clusters oracle's independent recursive
# transitive-closure formulation; only the final projection differs.
EXT_ORACLE_SQL["dedup_keep_list"] = (
    "SELECT doc_id, doc_id = cluster_id AS keep, "
    "cluster_id AS rep_doc, cluster_size FROM ("
    + EXT_ORACLE_SQL["dedup_clusters"].replace(
        "ORDER BY cluster_id, doc_id", "")
    + ") ORDER BY doc_id"
)

EXT_ORACLE_SQL["corpus_rollup"] = """
WITH d AS (
  SELECT lang, source, CAST(n_chars AS BIGINT) AS nc,
         CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS nw
  FROM documents
),
a AS (
  SELECT lang, source,
         CAST(GROUPING(lang) AS INT) AS g_lang,
         CAST(GROUPING(source) AS INT) AS g_source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(nc) AS BIGINT) AS total_chars,
         CAST(SUM(nw) AS BIGINT) AS total_ws_tokens
  FROM d GROUP BY CUBE (lang, source)
)
SELECT CAST(g_lang * 2 + g_source AS INT) AS lvl,
       CASE WHEN g_lang = 1 THEN 'ALL' ELSE lang END AS lang,
       CASE WHEN g_source = 1 THEN 'ALL' ELSE source END AS source,
       n_docs, total_chars, total_ws_tokens
FROM a ORDER BY lvl, lang, source
"""

from astra_perseverance_spark.streaming.doc_stream import (  # noqa: E402
    BASE_EPOCH as _DOC_BASE_EPOCH,
)

EXT_ORACLE_SQL["doc_minute_tokens"] = f"""
SELECT make_timestamp(((doc_id + {_DOC_BASE_EPOCH}) // 60) * 60 * 1000000)
         AS window_start,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT)
         AS total_ws_tokens
FROM documents
GROUP BY 1 ORDER BY window_start
"""

# ---------------------------------------------------------------------------
# Trained IVF (extensions/similarity.py::q_ann_ivf_kmeans): the Lloyd
# iterations are integer-exact (BIGINT d² assignment metric, truncating
# integer mean — DuckDB // and Spark DIV both truncate toward zero), so
# the unrolled iterations below converge to bit-identical centroids.

from astra_perseverance_spark.extensions.similarity import (  # noqa: E402
    KMEANS_ITERS,
)


def _kmeans_iter_sql(cin: str, tag: str) -> tuple[str, str]:
    """One Lloyd iteration as CTE text: assign vn to ``cin``, emit
    updated centroids ``k<tag>``.  Returns (sql, out_name)."""
    a, s, ce, co = f"a{tag}", f"s{tag}", f"ke{tag}", f"k{tag}"
    sql = f"""
{a} AS (
  SELECT v.vec_id, v.eq, c.cid,
         ROW_NUMBER() OVER (PARTITION BY v.vec_id
           ORDER BY v.n2 + c.c_n2 - 2*{dot_q_sql('v.eq', 'c.c_eq', ANN_DIM)},
                    c.cid) AS r
  FROM vn v CROSS JOIN {cin} c
),
{s} AS (
  SELECT x.cid, t.i,
         CAST(SUM(x.eq[CAST(t.i+1 AS INT)]) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM {a} x CROSS JOIN (SELECT unnest(range({ANN_DIM})) AS i) t
  WHERE x.r = 1
  GROUP BY x.cid, t.i
),
{ce} AS (
  SELECT cid, list(s // cnt ORDER BY i) AS c_eq FROM {s} GROUP BY cid
),
{co} AS (
  SELECT cid, c_eq, {dot_q_sql('c_eq', 'c_eq', ANN_DIM)} AS c_n2 FROM {ce}
)"""
    return sql, co


_KM_CTES = []
_km_prev = "c0"
for _it in range(KMEANS_ITERS):
    _sql, _km_prev = _kmeans_iter_sql(_km_prev, str(_it + 1))
    _KM_CTES.append(_sql)

EXT_ORACLE_SQL["ann_ivf_kmeans"] = f"""
WITH {_VEC},
c0 AS (SELECT vec_id AS cid, eq AS c_eq, n2 AS c_n2 FROM vn
       WHERE vec_id % (SELECT stride FROM strd) = 0),
{",".join(_KM_CTES)},
af AS (
  SELECT v.vec_id, v.eq, v.n2, c.cid,
         ROW_NUMBER() OVER (PARTITION BY v.vec_id
           ORDER BY v.n2 + c.c_n2 - 2*{dot_q_sql('v.eq', 'c.c_eq', ANN_DIM)},
                    c.cid) AS crank
  FROM vn v CROSS JOIN {_km_prev} c
),
assign AS (SELECT vec_id, eq, n2, cid FROM af WHERE crank = 1),
probes AS (
  SELECT vec_id AS query_id, eq AS q_eq, n2 AS q_n2, cid
  FROM af
  WHERE vec_id IN (SELECT vec_id FROM qsel) AND crank <= {IVF_NPROBE}
),
pairs AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         CAST({dot_q_sql('p.q_eq', 'a.eq', ANN_DIM)} AS DOUBLE)
           / (sqrt(CAST(p.q_n2 AS DOUBLE)) * sqrt(CAST(a.n2 AS DOUBLE)))
           AS cosine
  FROM probes p JOIN assign a ON a.cid = p.cid AND a.vec_id <> p.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM pairs
)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cosine
FROM ranked WHERE rank <= {ANN_TOPK} ORDER BY query_id, rank
"""

EXT_ORACLE_SQL["ann_recall_ivf_kmeans"] = f"""
WITH {_VEC},
c0 AS (SELECT vec_id AS cid, eq AS c_eq, n2 AS c_n2 FROM vn
       WHERE vec_id % (SELECT stride FROM strd) = 0),
{",".join(_KM_CTES)},
af AS (
  SELECT v.vec_id, v.eq, v.n2, c.cid,
         ROW_NUMBER() OVER (PARTITION BY v.vec_id
           ORDER BY v.n2 + c.c_n2 - 2*{dot_q_sql('v.eq', 'c.c_eq', ANN_DIM)},
                    c.cid) AS crank
  FROM vn v CROSS JOIN {_km_prev} c
),
assign AS (SELECT vec_id, eq, n2, cid FROM af WHERE crank = 1),
probes AS (
  SELECT vec_id AS query_id, eq AS q_eq, n2 AS q_n2, cid
  FROM af
  WHERE vec_id IN (SELECT vec_id FROM qsel) AND crank <= {IVF_NPROBE}
),
ann_pairs AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         CAST({dot_q_sql('p.q_eq', 'a.eq', ANN_DIM)} AS DOUBLE)
           / (sqrt(CAST(p.q_n2 AS DOUBLE)) * sqrt(CAST(a.n2 AS DOUBLE)))
           AS cosine
  FROM probes p JOIN assign a ON a.cid = p.cid AND a.vec_id <> p.query_id
),
ann_ranked AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM ann_pairs
),
ann_k AS (SELECT query_id, neighbor_id FROM ann_ranked WHERE rank <= {ANN_TOPK}),
q AS (SELECT * FROM vn WHERE vec_id IN (SELECT vec_id FROM qsel)),
exact_pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_COS} AS cosine
  FROM q JOIN vn c ON c.vec_id <> q.vec_id
),
exact_ranked AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM exact_pairs
),
exact_k AS (SELECT query_id, neighbor_id FROM exact_ranked WHERE rank <= {ANN_TOPK}),
hits AS (
  SELECT e.query_id,
         CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS hit
  FROM exact_k e LEFT JOIN ann_k a
    ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
)
SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_exact,
       CAST(SUM(hit) AS BIGINT) AS n_hit,
       CAST(SUM(hit) AS DOUBLE) / COUNT(*) AS recall
FROM hits GROUP BY query_id ORDER BY query_id
"""

# Twin of extensions/similarity.py::q_semdedup (registered round 9;
# staged + parity-proven in tests/test_semdedup.py since round 8).
# Same trained-kmeans assignment CTEs as ann_ivf_kmeans (shared
# verbatim), then a cid-local dominance prune.
from astra_perseverance_spark.extensions.similarity import (  # noqa: E402
    SEMDEDUP_COSINE_MIN,
)

EXT_ORACLE_SQL["semdedup"] = f"""
WITH {_VEC},
c0 AS (SELECT vec_id AS cid, eq AS c_eq, n2 AS c_n2 FROM vn
       WHERE vec_id % (SELECT stride FROM strd) = 0),
{",".join(_KM_CTES)},
af AS (
  SELECT v.vec_id, v.eq, v.n2, c.cid,
         ROW_NUMBER() OVER (PARTITION BY v.vec_id
           ORDER BY v.n2 + c.c_n2 - 2*{dot_q_sql('v.eq', 'c.c_eq', ANN_DIM)},
                    c.cid) AS crank
  FROM vn v CROSS JOIN {_km_prev} c
),
assign AS (SELECT vec_id, eq, n2, cid FROM af WHERE crank = 1),
p AS (
  SELECT x.vec_id, x.cid, y.vec_id AS kept_by,
         CAST({dot_q_sql('x.eq', 'y.eq', ANN_DIM)} AS DOUBLE)
           / (sqrt(CAST(x.n2 AS DOUBLE)) * sqrt(CAST(y.n2 AS DOUBLE)))
           AS cosine
  FROM assign x JOIN assign y ON y.cid = x.cid AND y.vec_id < x.vec_id
),
r AS (
  SELECT vec_id, cid, kept_by, cosine,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY cosine DESC, kept_by) AS rn
  FROM p WHERE cosine >= {SEMDEDUP_COSINE_MIN}
)
SELECT vec_id, cid, kept_by, cosine FROM r WHERE rn = 1 ORDER BY vec_id
"""

# Twin of extensions/similarity.py::q_cluster_purity (round 11) —
# the SAME trained-kmeans assignment CTEs as ann_ivf_kmeans/semdedup
# (shared verbatim), then per-cluster label histograms: majority
# label by (n DESC, label) and purity = n_top / n_vecs.
EXT_ORACLE_SQL["cluster_purity"] = f"""
WITH {_VEC},
c0 AS (SELECT vec_id AS cid, eq AS c_eq, n2 AS c_n2 FROM vn
       WHERE vec_id % (SELECT stride FROM strd) = 0),
{",".join(_KM_CTES)},
af AS (
  SELECT v.vec_id, v.label, c.cid,
         ROW_NUMBER() OVER (PARTITION BY v.vec_id
           ORDER BY v.n2 + c.c_n2 - 2*{dot_q_sql('v.eq', 'c.c_eq', ANN_DIM)},
                    c.cid) AS crank
  FROM vn v CROSS JOIN {_km_prev} c
),
cl AS (
  SELECT cid, label, CAST(COUNT(*) AS BIGINT) AS n
  FROM af WHERE crank = 1 GROUP BY cid, label
),
tot AS (
  SELECT cid, CAST(SUM(n) AS BIGINT) AS n_vecs,
         CAST(COUNT(*) AS BIGINT) AS n_labels
  FROM cl GROUP BY cid
),
top AS (
  SELECT cid, label AS top_label, n AS n_top,
         ROW_NUMBER() OVER (PARTITION BY cid ORDER BY n DESC, label) AS r
  FROM cl
)
SELECT t.cid, tt.n_vecs, tt.n_labels, t.top_label, t.n_top,
       CAST(t.n_top AS DOUBLE) / tt.n_vecs AS purity
FROM top t JOIN tot tt USING (cid) WHERE t.r = 1 ORDER BY t.cid
"""

# Twin of extensions/qa.py::q_corpus_validate (registered round 9;
# staged + parity-proven in tests/test_qa.py since round 8).  Plain
# string, not f-string — the lang regex needs literal {2,3}.
EXT_ORACLE_SQL["corpus_validate"] = """
WITH flags AS (
  SELECT
    COALESCE(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END), 0)
      AS null_doc_id,
    COALESCE(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END), 0)
      AS null_text,
    COALESCE(SUM(CASE WHEN text IS NOT NULL AND length(text) = 0
        THEN 1 ELSE 0 END), 0) AS empty_text,
    COALESCE(SUM(CASE WHEN text IS NOT NULL
        AND COALESCE(n_chars, -1) != length(text)
        THEN 1 ELSE 0 END), 0) AS n_chars_mismatch,
    COALESCE(SUM(CASE WHEN NOT regexp_matches(
        COALESCE(lang, ''), '^[a-z]{2,3}$')
        THEN 1 ELSE 0 END), 0) AS lang_not_iso
  FROM documents
), dups AS (
  SELECT COALESCE(SUM(CASE WHEN cnt > 1 THEN cnt END), 0)
         AS duplicate_doc_id
  FROM (SELECT doc_id, COUNT(*) AS cnt FROM documents
        WHERE doc_id IS NOT NULL GROUP BY doc_id)
)
SELECT "check", CAST(n_violations AS BIGINT) AS n_violations FROM (
  SELECT 'null_doc_id' AS "check", null_doc_id AS n_violations,
         1 AS ord FROM flags
  UNION ALL SELECT 'duplicate_doc_id', duplicate_doc_id, 2 FROM dups
  UNION ALL SELECT 'null_text', null_text, 3 FROM flags
  UNION ALL SELECT 'empty_text', empty_text, 4 FROM flags
  UNION ALL SELECT 'n_chars_mismatch', n_chars_mismatch, 5 FROM flags
  UNION ALL SELECT 'lang_not_iso', lang_not_iso, 6 FROM flags
) ORDER BY ord
"""

EXT_ORACLE_SQL["embedding_label_probe"] = f"""
WITH {_VEC},
sums AS (
  SELECT v.label, t.i,
         CAST(SUM(v.eq[CAST(t.i+1 AS INT)]) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM vn v CROSS JOIN (SELECT unnest(range({ANN_DIM})) AS i) t
  GROUP BY v.label, t.i
),
ce AS (
  SELECT label AS c_label, list(s // cnt ORDER BY i) AS c_eq
  FROM sums GROUP BY label
),
cent AS (
  SELECT c_label, c_eq, {dot_q_sql('c_eq', 'c_eq', ANN_DIM)} AS c_n2 FROM ce
),
aff AS (
  SELECT v.vec_id, v.label, c.c_label,
         ROW_NUMBER() OVER (PARTITION BY v.vec_id
           ORDER BY v.n2 + c.c_n2 - 2*{dot_q_sql('v.eq', 'c.c_eq', ANN_DIM)},
                    c.c_label) AS r
  FROM vn v CROSS JOIN cent c
)
SELECT label AS true_label, c_label AS pred_label,
       CAST(COUNT(*) AS BIGINT) AS n,
       label = c_label AS hit
FROM aff WHERE r = 1
GROUP BY 1, 2 ORDER BY true_label, pred_label
"""

EXT_ORACLE_SQL["ngram_novelty"] = f"""
WITH {_CAPPED_SH.lstrip()},
cap AS (
  SELECT sh0.doc_id, sh0.lang, sh0.g, shdf.df
  FROM sh0 JOIN shdf ON shdf.lang = sh0.lang AND shdf.g = sh0.g
  WHERE shdf.df <= {NGRAM_DF_CAP}
)
SELECT doc_id, lang,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
         AS novelty
FROM cap GROUP BY doc_id, lang ORDER BY doc_id
"""

EXT_ORACLE_SQL["quality_report"] = f"""
WITH d AS (
  SELECT doc_id, lang, source,
         {_GOPHER_RAW_COLS},
         (len(regexp_extract_all(text, '{PII_EMAIL}'))
          + len(regexp_extract_all(text, '{PII_IPV4}'))
          + len(regexp_extract_all(text, '{PII_PHONE}'))) > 0 AS has_pii
  FROM documents
),
m AS (
  SELECT doc_id, lang, source, has_pii,
         {_gopher_pass_sql(_GOPHER_METRICS)} AS gopher_pass
  FROM d
)
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN gopher_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       CAST(SUM(CASE WHEN has_pii THEN 1 ELSE 0 END) AS BIGINT) AS n_pii,
       CAST(SUM(CASE WHEN gopher_pass THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS pass_rate
FROM m GROUP BY lang, source ORDER BY lang, source
"""

# --- Training-prep twins (extensions.prep) --------------------------

from astra_perseverance_spark.extensions.prep import (  # noqa: E402
    CHUNK_LEN,
    CHUNK_STRIDE,
    SCRIPT_CLASSES,
    _HTML_DECODE,
)

EXT_ORACLE_SQL["doc_chunks"] = f"""
WITH d AS (
  SELECT doc_id, {_TOKS} AS toks, CAST(len({_TOKS}) AS BIGINT) AS n
  FROM documents WHERE len({_TOKS}) > 0
),
k AS (
  SELECT doc_id, toks, n, u.k AS k
  FROM d, unnest(range((n + {CHUNK_STRIDE - 1}) // {CHUNK_STRIDE})) AS u(k)
)
SELECT doc_id, CAST(k AS INT) AS chunk_id,
       CAST(k * {CHUNK_STRIDE} AS BIGINT) AS start_tok,
       CAST(least({CHUNK_LEN}, n - k * {CHUNK_STRIDE}) AS BIGINT) AS n_tok,
       md5(array_to_string(list_slice(toks,
             CAST(k * {CHUNK_STRIDE} + 1 AS INT),
             CAST(k * {CHUNK_STRIDE} + {CHUNK_LEN} AS INT)), ' '))
         AS chunk_md5
FROM k ORDER BY doc_id, chunk_id
"""

_HTML_WRAP = (
    "'<html lang=\"en\"><body data-doc=\"' || CAST(doc_id AS VARCHAR) || '\">'"
    " || '<!-- id:' || CAST(doc_id AS VARCHAR) || ' -->'"
    " || '<p class=\"main\">' || "
    "regexp_replace(regexp_replace(regexp_replace(text,"
    " '&', '&amp;', 'g'), '<', '&lt;', 'g'), '>', '&gt;', 'g')"
    " || '</p>'"
    " || '<script type=\"text/javascript\">if (1 &lt; 2) { x = \"&amp;\"; }"
    "</script>' || '</body></html>'"
)

_HTML_CLEAN = (
    "regexp_replace(regexp_replace(regexp_replace(html,"
    " '(?s)<script[^>]*>.*?</script>', ' ', 'g'),"
    " '(?s)<!--.*?-->', ' ', 'g'),"
    " '<[^>]*>', ' ', 'g')"
)
for _ent, _ch in _HTML_DECODE:
    _rep = _ch.replace("'", "''")
    _HTML_CLEAN = f"regexp_replace({_HTML_CLEAN}, '{_ent}', '{_rep}', 'g')"
_HTML_CLEAN = f"trim(regexp_replace({_HTML_CLEAN}, '\\s+', ' ', 'g'))"

EXT_ORACLE_SQL["html_extract"] = f"""
WITH d AS (
  SELECT doc_id, text, {_HTML_WRAP} AS html FROM documents
),
c AS (
  SELECT doc_id, html,
         {_HTML_CLEAN} AS clean,
         trim(regexp_replace(text, '\\s+', ' ', 'g')) AS norm_orig
  FROM d
)
SELECT doc_id,
       CAST(length(html) AS BIGINT) AS n_chars_html,
       CAST(length(clean) AS BIGINT) AS n_chars_clean,
       md5(clean) AS clean_md5,
       md5(clean) = md5(norm_orig) AS roundtrip_ok,
       1.0 - CAST(length(clean) AS DOUBLE) / length(html) AS removed_frac
FROM c ORDER BY doc_id
"""

_SCRIPT_ORDER = [name for name, _ in SCRIPT_CLASSES] + ["other"]
_SCRIPT_COUNTS = ",\n         ".join(
    f"n - length(regexp_replace(text, '{pat}', '', 'g')) AS c_{name}"
    for name, pat in SCRIPT_CLASSES
)
# Dominant class: strictly-greater fold in declared order (ties keep
# the earlier class) — c_k wins iff it beats the max of all earlier
# counts, which mirrors the Spark fold exactly.
_SCRIPT_DOM = f"'{_SCRIPT_ORDER[0]}'"
for _i, _name in enumerate(_SCRIPT_ORDER[1:], start=1):
    _prev = ", ".join(f"c_{n}" for n in _SCRIPT_ORDER[:_i])
    _g = _prev if _i == 1 else f"greatest({_prev})"
    _SCRIPT_DOM = (f"CASE WHEN c_{_name} > {_g} THEN '{_name}' "
                   f"ELSE {_SCRIPT_DOM} END")
_SCRIPT_FRACS = ",\n       ".join(
    f"CAST(c_{name} AS DOUBLE) / n AS {name}_frac" for name in _SCRIPT_ORDER
)

EXT_ORACLE_SQL["script_profile"] = f"""
WITH d AS (
  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n
  FROM documents WHERE length(text) > 0
),
c AS (
  SELECT doc_id, n,
         {_SCRIPT_COUNTS}
  FROM d
),
c2 AS (
  SELECT *, n - ({' + '.join('c_' + n for n, _ in SCRIPT_CLASSES)}) AS c_other
  FROM c
)
SELECT doc_id, n,
       {_SCRIPT_FRACS},
       {_SCRIPT_DOM} AS dominant
FROM c2 ORDER BY doc_id
"""

EXT_ORACLE_SQL["corpus_curate"] = f"""
WITH d AS (
  SELECT doc_id,
         {_TOKS} AS toks,
         CASE WHEN n_chars <> 0 THEN
           CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
           / n_chars ELSE 0.0 END AS punct_ratio,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS h
  FROM documents
),
s AS (
  SELECT doc_id, h,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CASE WHEN len(toks) <> 0 THEN
           CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
           ELSE 0.0 END AS ttr,
         punct_ratio
  FROM d
),
rep AS (SELECT h, MIN(doc_id) AS rep_doc FROM d GROUP BY h),
{_CAPPED_SH.lstrip()},
{_DECON_CTES},
near AS (
  SELECT DISTINCT y.doc_id AS doc_id
  FROM sh x JOIN sh y ON x.lang = y.lang AND x.doc_id < y.doc_id
  WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
          / len(list_distinct(list_concat(x.sh, y.sh)))
        >= {MINHASH_JACCARD_MIN}
),
contam AS (SELECT DISTINCT doc_id FROM decon_hits),
flagged AS (
  SELECT s.doc_id,
         concat_ws(';',
           CASE WHEN s.n_tokens < {QF_MIN_TOKENS} THEN 'too_short' END,
           CASE WHEN s.ttr < {QF_MIN_TTR} THEN 'low_ttr' END,
           CASE WHEN s.punct_ratio > {QF_MAX_PUNCT} THEN 'high_punct' END,
           CASE WHEN s.doc_id > rep.rep_doc THEN 'exact_dup' END,
           CASE WHEN near.doc_id IS NOT NULL THEN 'near_dup' END,
           CASE WHEN contam.doc_id IS NOT NULL THEN 'contaminated' END
         ) AS reasons
  FROM s JOIN rep USING (h)
  LEFT JOIN near ON near.doc_id = s.doc_id
  LEFT JOIN contam ON contam.doc_id = s.doc_id
)
SELECT doc_id, reasons = '' AS keep, reasons
FROM flagged ORDER BY doc_id
"""

_INCR_COS_QC = (
    f"CAST({dot_q_sql('q.eq', 'c.c_eq', ANN_DIM)} AS DOUBLE)"
    " / (sqrt(CAST(q.n2 AS DOUBLE)) * sqrt(CAST(c.c_n2 AS DOUBLE)))"
)
_INCR_COS_QA = (
    f"CAST({dot_q_sql('p.q_eq', 'a.eq', ANN_DIM)} AS DOUBLE)"
    " / (sqrt(CAST(p.q_n2 AS DOUBLE)) * sqrt(CAST(a.n2 AS DOUBLE)))"
)

EXT_ORACLE_SQL["ann_incremental"] = f"""
WITH v AS (
  SELECT vec_id, {quantize_sql('embedding')} AS eq FROM embeddings
),
vn AS (
  SELECT vec_id, eq, {dot_q_sql('eq', 'eq', ANN_DIM)} AS n2 FROM v
),
old AS (SELECT * FROM vn WHERE vec_id % 2 = 0),
new AS (SELECT * FROM vn WHERE vec_id % 2 = 1),
st AS (
  SELECT greatest(1, n // greatest(
           least(CAST(FLOOR(SQRT(CAST(n AS DOUBLE))) AS BIGINT),
                 {IVF_MAX_LISTS}), 1)) AS stride
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM old)
),
cent AS (
  SELECT vec_id AS cid, eq AS c_eq, n2 AS c_n2
  FROM old, st WHERE (vec_id // 2) % st.stride = 0
),
assign AS (
  SELECT cid, vec_id, eq, n2 FROM (
    SELECT c.cid, q.vec_id, q.eq, q.n2,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {_INCR_COS_QC} DESC, c.cid) AS crank
    FROM old q CROSS JOIN cent c
  ) WHERE crank = 1
),
probes AS (
  SELECT query_id, q_eq, q_n2, cid FROM (
    SELECT q.vec_id AS query_id, q.eq AS q_eq, q.n2 AS q_n2, c.cid,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {_INCR_COS_QC} DESC, c.cid) AS crank
    FROM new q CROSS JOIN cent c
  ) WHERE crank <= {IVF_NPROBE}
),
pairs AS (
  SELECT p.query_id, a.vec_id AS neighbor_id, {_INCR_COS_QA} AS cosine
  FROM probes p JOIN assign a USING (cid)
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM pairs
)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cosine
FROM ranked WHERE rank <= {ANN_TOPK} ORDER BY query_id, rank
"""

from astra_perseverance_spark.extensions.prep import (  # noqa: E402
    BOILERPLATE_MIN_DOCS,
)

EXT_ORACLE_SQL["repeated_lines"] = f"""
WITH l AS (
  SELECT doc_id, trim(u.line) AS line
  FROM documents, unnest(string_split(text, chr(10))) AS u(line)
),
f AS (SELECT * FROM l WHERE length(line) > 0),
g AS (
  SELECT line, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(COUNT(*) AS BIGINT) AS n_occ, MIN(doc_id) AS rep_doc
  FROM f GROUP BY line
)
SELECT md5(line) AS line_md5, CAST(length(line) AS BIGINT) AS line_len,
       n_docs, n_occ, rep_doc
FROM g WHERE n_docs >= {BOILERPLATE_MIN_DOCS}
ORDER BY rep_doc, line_md5
"""

EXT_ORACLE_SQL["token_rarity"] = f"""
WITH t AS (
  SELECT doc_id, unnest(list_distinct({_TOKS})) AS tok FROM documents
),
df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM t GROUP BY tok)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(SUM(df.df) AS DOUBLE) / COUNT(*) AS mean_token_df,
       MIN(df.df) AS min_token_df,
       CAST(SUM(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unique_tokens
FROM t JOIN df USING (tok)
GROUP BY t.doc_id ORDER BY doc_id
"""

# --- Training-assembly twins (extensions.training) ------------------

from astra_perseverance_spark.extensions.training import (  # noqa: E402
    DUP_SPAN_MIN_DOCS,
    DUP_SPAN_W,
    SEQ_BUDGET,
    SEQ_SHARD_DOCS,
    SQ_LEVELS,
)

EXT_ORACLE_SQL["dup_spans"] = f"""
WITH d AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
),
g AS (
  SELECT doc_id, CAST(u.p AS BIGINT) AS p,
         array_to_string(list_slice(toks, CAST(u.p + 1 AS INT),
                                    CAST(u.p + {DUP_SPAN_W} AS INT)), ' ') AS g
  FROM d, unnest(range(len(toks) - {DUP_SPAN_W - 1})) AS u(p)
),
dupg AS (
  SELECT g FROM g GROUP BY g
  HAVING COUNT(DISTINCT doc_id) >= {DUP_SPAN_MIN_DOCS}
),
dp AS (SELECT g.doc_id, g.p FROM g JOIN dupg USING (g)),
m AS (
  SELECT doc_id, p,
         CASE WHEN lag(p) OVER w IS NULL
                   OR p - lag(p) OVER w > {DUP_SPAN_W}
              THEN 1 ELSE 0 END AS new_span
  FROM dp WINDOW w AS (PARTITION BY doc_id ORDER BY p)
),
s AS (
  SELECT doc_id, p,
         CAST(SUM(new_span) OVER (PARTITION BY doc_id ORDER BY p
              ROWS UNBOUNDED PRECEDING) AS INT) AS span_id
  FROM m
)
SELECT doc_id, span_id,
       MIN(p) AS start_tok,
       MAX(p) + {DUP_SPAN_W - 1} AS end_tok,
       MAX(p) + {DUP_SPAN_W - 1} - MIN(p) + 1 AS n_tok,
       CAST(COUNT(*) AS BIGINT) AS n_windows
FROM s GROUP BY doc_id, span_id ORDER BY doc_id, start_tok
"""

EXT_ORACLE_SQL["dedup_span_trim"] = f"""
WITH d AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
),
g AS (
  SELECT doc_id, CAST(u.p AS BIGINT) AS p,
         array_to_string(list_slice(toks, CAST(u.p + 1 AS INT),
                                    CAST(u.p + {DUP_SPAN_W} AS INT)), ' ') AS g
  FROM d, unnest(range(len(toks) - {DUP_SPAN_W - 1})) AS u(p)
),
gs AS (
  SELECT g, MIN(doc_id) AS rep FROM g GROUP BY g
  HAVING COUNT(DISTINCT doc_id) >= {DUP_SPAN_MIN_DOCS}
),
m AS (
  SELECT g.doc_id, g.p FROM g JOIN gs USING (g)
  WHERE g.doc_id <> gs.rep
),
cov AS (
  SELECT DISTINCT doc_id, p + CAST(u.o AS BIGINT) AS q
  FROM m, unnest(range({DUP_SPAN_W})) AS u(o)
),
t AS (
  SELECT doc_id, CAST(u.p AS BIGINT) AS q,
         toks[CAST(u.p + 1 AS INT)] AS tok
  FROM d, unnest(range(len(toks))) AS u(p)
),
k AS (
  SELECT t.doc_id, t.q, t.tok FROM t
  ANTI JOIN cov ON t.doc_id = cov.doc_id AND t.q = cov.q
),
ka AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS kept_tokens,
         array_to_string(list(tok ORDER BY q), ' ') AS trimmed_text
  FROM k GROUP BY doc_id
)
SELECT d.doc_id, CAST(len(toks) AS BIGINT) AS n_tok,
       CAST(len(toks) - coalesce(kept_tokens, 0) AS BIGINT)
         AS removed_tokens,
       CAST(coalesce(kept_tokens, 0) AS BIGINT) AS kept_tokens,
       coalesce(trimmed_text, '') AS trimmed_text
FROM d LEFT JOIN ka USING (doc_id) ORDER BY doc_id
"""

EXT_ORACLE_SQL["seq_pack"] = f"""
WITH params AS (
  SELECT greatest(1, (COUNT(*) + {SEQ_SHARD_DOCS - 1}) // {SEQ_SHARD_DOCS})
           AS shards
  FROM documents
),
d AS (
  SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tok,
         {h15_sql("CAST(doc_id AS VARCHAR)")} AS hkey
  FROM documents
),
s AS (
  SELECT doc_id, n_tok, hkey,
         CAST(hkey % (SELECT shards FROM params) AS INT) AS shard_id
  FROM d WHERE n_tok > 0
),
w AS (
  SELECT doc_id, shard_id, n_tok,
         SUM(n_tok) OVER win AS cum,
         CAST(ROW_NUMBER() OVER win AS BIGINT) AS pack_pos
  FROM s WINDOW win AS (PARTITION BY shard_id ORDER BY hkey, doc_id
                        ROWS UNBOUNDED PRECEDING)
)
SELECT doc_id, shard_id, pack_pos, n_tok,
       CAST(cum - n_tok AS BIGINT) AS tok_offset,
       CAST((cum - n_tok) // {SEQ_BUDGET} AS BIGINT) AS seq_first,
       CAST((cum - 1) // {SEQ_BUDGET} AS BIGINT) AS seq_last,
       CAST((cum - 1) // {SEQ_BUDGET}
            - (cum - n_tok) // {SEQ_BUDGET} + 1 AS BIGINT) AS n_seqs
FROM w ORDER BY shard_id, pack_pos
"""

EXT_ORACLE_SQL["embedding_quantize"] = f"""
WITH v AS (
  SELECT vec_id, label, {quantize_sql('embedding')} AS eq FROM embeddings
),
dims AS (
  SELECT CAST(u.d AS INT) AS d,
         MIN(eq[CAST(u.d + 1 AS INT)]) AS lo,
         MAX(eq[CAST(u.d + 1 AS INT)]) AS hi
  FROM v, unnest(range({ANN_DIM})) AS u(d)
  GROUP BY u.d
),
st AS (
  SELECT (SELECT list(lo ORDER BY d) FROM dims) AS lo_a,
         (SELECT list(hi ORDER BY d) FROM dims) AS hi_a
),
c AS (
  SELECT vec_id, label, eq, lo_a, hi_a,
         list_transform(range({ANN_DIM}), i -> CASE
           WHEN hi_a[CAST(i + 1 AS INT)] > lo_a[CAST(i + 1 AS INT)]
           THEN CAST((eq[CAST(i + 1 AS INT)] - lo_a[CAST(i + 1 AS INT)])
                     * {SQ_LEVELS}
                     // (hi_a[CAST(i + 1 AS INT)] - lo_a[CAST(i + 1 AS INT)])
                AS BIGINT)
           ELSE CAST(0 AS BIGINT) END) AS codes
  FROM v, st
),
e AS (
  SELECT vec_id, label, codes,
         list_transform(range({ANN_DIM}), i ->
           eq[CAST(i + 1 AS INT)] - (lo_a[CAST(i + 1 AS INT)]
             + CAST(codes[CAST(i + 1 AS INT)]
                    * (hi_a[CAST(i + 1 AS INT)] - lo_a[CAST(i + 1 AS INT)])
                    // {SQ_LEVELS} AS BIGINT))) AS err,
         {dot_q_sql('eq', 'eq')} AS n2
  FROM c
)
SELECT vec_id, label,
       md5(array_to_string(list_transform(codes, x -> CAST(x AS VARCHAR)),
                           ' ')) AS code_md5,
       CAST(list_sum(list_transform(err, x -> x * x)) AS BIGINT) AS err2,
       CAST(list_max(list_transform(err, x -> abs(x))) AS BIGINT)
         AS max_abs_err,
       CASE WHEN n2 > 0
            THEN CAST(list_sum(list_transform(err, x -> x * x)) AS DOUBLE)
                 / CAST(n2 AS DOUBLE)
            ELSE 0.0 END AS rel_err
FROM e ORDER BY vec_id
"""

# Incremental-index drift audit (similarity.py::q_ann_index_health):
# the ann_incremental CTEs for centroids + even assignment, the same
# crank-1 rule for the appended (odd) half, nearest-rank p99 over the
# post-append list sizes (empty lists included via the LEFT JOIN from
# cent), and the raw-SQ-code clamp count under the FROZEN even-corpus
# bounds — `//` truncates toward zero exactly like Spark's `div`, so
# the clamped set is bit-identical.
EXT_ORACLE_SQL["ann_index_health"] = f"""
WITH v AS (
  SELECT vec_id, {quantize_sql('embedding')} AS eq FROM embeddings
),
vn AS (
  SELECT vec_id, eq, {dot_q_sql('eq', 'eq', ANN_DIM)} AS n2 FROM v
),
old AS (SELECT * FROM vn WHERE vec_id % 2 = 0),
new AS (SELECT * FROM vn WHERE vec_id % 2 = 1),
st AS (
  SELECT greatest(1, n // greatest(
           least(CAST(FLOOR(SQRT(CAST(n AS DOUBLE))) AS BIGINT),
                 {IVF_MAX_LISTS}), 1)) AS stride
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM old)
),
cent AS (
  SELECT vec_id AS cid, eq AS c_eq, n2 AS c_n2
  FROM old, st WHERE (vec_id // 2) % st.stride = 0
),
assign AS (
  SELECT cid FROM (
    SELECT c.cid,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {_INCR_COS_QC} DESC, c.cid) AS crank
    FROM old q CROSS JOIN cent c
  ) WHERE crank = 1
),
app AS (
  SELECT cid FROM (
    SELECT c.cid,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {_INCR_COS_QC} DESC, c.cid) AS crank
    FROM new q CROSS JOIN cent c
  ) WHERE crank = 1
),
mem AS (SELECT cid FROM assign UNION ALL SELECT cid FROM app),
sizes AS (
  SELECT c.cid, CAST(COUNT(m.cid) AS BIGINT) AS sz
  FROM cent c LEFT JOIN mem m ON m.cid = c.cid
  GROUP BY c.cid
),
stats AS (
  SELECT sz AS p99, n_lists, mx, n_total FROM (
    SELECT sz, cid,
           ROW_NUMBER() OVER (ORDER BY sz, cid) AS r,
           CAST(COUNT(*) OVER () AS BIGINT) AS n_lists,
           MAX(sz) OVER () AS mx,
           CAST(SUM(sz) OVER () AS BIGINT) AS n_total
    FROM sizes
  ) WHERE r = CEIL(0.99 * n_lists)
),
dims AS (
  SELECT CAST(u.d AS INT) AS d,
         MIN(eq[CAST(u.d + 1 AS INT)]) AS lo,
         MAX(eq[CAST(u.d + 1 AS INT)]) AS hi
  FROM old, unnest(range({ANN_DIM})) AS u(d)
  GROUP BY u.d
),
b AS (
  SELECT (SELECT list(lo ORDER BY d) FROM dims) AS lo_a,
         (SELECT list(hi ORDER BY d) FROM dims) AS hi_a
),
cl AS (
  SELECT CAST(SUM(nc) AS BIGINT) AS clamped,
         CAST(COUNT(*) AS BIGINT) AS n_app
  FROM (
    SELECT list_sum(list_transform(range({ANN_DIM}), i -> CASE
      WHEN hi_a[CAST(i + 1 AS INT)] > lo_a[CAST(i + 1 AS INT)] THEN
        CASE WHEN (eq[CAST(i + 1 AS INT)] - lo_a[CAST(i + 1 AS INT)])
                    * {SQ_LEVELS}
                    // (hi_a[CAST(i + 1 AS INT)] - lo_a[CAST(i + 1 AS INT)])
                  < 0
               OR (eq[CAST(i + 1 AS INT)] - lo_a[CAST(i + 1 AS INT)])
                    * {SQ_LEVELS}
                    // (hi_a[CAST(i + 1 AS INT)] - lo_a[CAST(i + 1 AS INT)])
                  > {SQ_LEVELS}
        THEN 1 ELSE 0 END
      ELSE 0 END)) AS nc
    FROM new, b
  )
),
one AS (SELECT * FROM stats, cl)
SELECT metric, value FROM (
  SELECT 'appended_codes' AS metric,
         CAST(n_app * {ANN_DIM} AS DOUBLE) AS value FROM one
  UNION ALL SELECT 'clamped_codes', CAST(clamped AS DOUBLE) FROM one
  UNION ALL SELECT 'list_size_max', CAST(mx AS DOUBLE) FROM one
  UNION ALL SELECT 'list_size_mean',
                   CAST(n_total AS DOUBLE) / n_lists FROM one
  UNION ALL SELECT 'list_size_p99', CAST(p99 AS DOUBLE) FROM one
  UNION ALL SELECT 'max_over_target',
                   mx / SQRT(CAST(n_total AS DOUBLE)) FROM one
  UNION ALL SELECT 'n_appended', CAST(n_app AS DOUBLE) FROM one
  UNION ALL SELECT 'n_indexed', CAST(n_total - n_app AS DOUBLE) FROM one
  UNION ALL SELECT 'n_lists', CAST(n_lists AS DOUBLE) FROM one
  UNION ALL SELECT 'p99_over_target',
                   p99 / SQRT(CAST(n_total AS DOUBLE)) FROM one
  UNION ALL SELECT 'sq_clamp_rate',
                   CAST(clamped AS DOUBLE) / (n_app * {ANN_DIM}) FROM one
  UNION ALL SELECT 'target_list_size',
                   SQRT(CAST(n_total AS DOUBLE)) FROM one
) ORDER BY metric
"""

# Postings drift audit (dedup.py::q_postings_health): per-shingle
# document frequencies, nearest-rank p99 via the df histogram (the
# same order statistic as the Spark side's histogram-cumulative
# window), and the capped-out mass under NGRAM_DF_CAP.
EXT_ORACLE_SQL["postings_health"] = f"""
WITH sh0 AS (
  SELECT doc_id, lang, unnest({word_shingles_sql(_TOKS)}) AS g
  FROM documents
),
dfs AS (
  SELECT lang, g, CAST(COUNT(*) AS BIGINT) AS df
  FROM sh0 GROUP BY lang, g
),
hist AS (
  SELECT df, CAST(COUNT(*) AS BIGINT) AS cnt FROM dfs GROUP BY df
),
cum AS (
  SELECT df, SUM(cnt) OVER (ORDER BY df) AS cum,
         CAST(SUM(cnt) OVER () AS BIGINT) AS n_sh
  FROM hist
),
p99 AS (
  SELECT CAST(MIN(df) AS BIGINT) AS p99_df
  FROM cum WHERE cum >= CEIL(0.99 * n_sh)
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_shingles,
         MAX(df) AS max_df,
         CAST(SUM(df) AS BIGINT) AS n_postings,
         CAST(SUM(CASE WHEN df > {NGRAM_DF_CAP} THEN 1 ELSE 0 END)
              AS BIGINT) AS capped_shingles,
         CAST(SUM(CASE WHEN df > {NGRAM_DF_CAP} THEN df ELSE 0 END)
              AS BIGINT) AS capped_postings
  FROM dfs
),
docs AS (
  SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS shingled_docs
  FROM sh0
),
one AS (SELECT * FROM stats, p99, docs)
SELECT metric, value FROM (
  SELECT 'capped_postings' AS metric,
         CAST(capped_postings AS DOUBLE) AS value FROM one
  UNION ALL SELECT 'capped_postings_rate',
                   CAST(capped_postings AS DOUBLE) / n_postings FROM one
  UNION ALL SELECT 'capped_shingles',
                   CAST(capped_shingles AS DOUBLE) FROM one
  UNION ALL SELECT 'df_cap', CAST({NGRAM_DF_CAP} AS DOUBLE) FROM one
  UNION ALL SELECT 'max_df', CAST(max_df AS DOUBLE) FROM one
  UNION ALL SELECT 'n_postings', CAST(n_postings AS DOUBLE) FROM one
  UNION ALL SELECT 'n_shingles', CAST(n_shingles AS DOUBLE) FROM one
  UNION ALL SELECT 'p99_df', CAST(p99_df AS DOUBLE) FROM one
  UNION ALL SELECT 'shingled_docs',
                   CAST(shingled_docs AS DOUBLE) FROM one
  UNION ALL SELECT 'surviving_mean_per_doc',
                   CAST(n_postings - capped_postings AS DOUBLE)
                   / shingled_docs FROM one
) ORDER BY metric
"""

# Intra-doc n-gram repetition (curation.py::q_repetition_signals):
# modal-n-gram token mass for n=2..4, duplicated-n-gram coverage
# union for n=5,10, Gopher table-A1 pass flag.  DuckDB list slices
# are 1-based inclusive: toks[p+1 : p+n] is the n-gram starting at
# 0-based position p, matching Spark's posexplode + lead build.
from astra_perseverance_spark.extensions.curation import (  # noqa: E402
    REP_MAX_DUP_FRAC,
    REP_MAX_TOP_FRAC,
    REP_NS_DUP,
    REP_NS_TOP,
)

_REP_NS = ", ".join(f"({n})" for n in (*REP_NS_TOP, *REP_NS_DUP))
_REP_PASS = " AND ".join(
    [f"top{n}_frac < {REP_MAX_TOP_FRAC[n]}" for n in REP_NS_TOP]
    + [f"dup{n}_frac < {REP_MAX_DUP_FRAC[n]}" for n in REP_NS_DUP])

EXT_ORACLE_SQL["repetition_signals"] = f"""
WITH base AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
),
nt AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM base
),
long AS (
  SELECT b.doc_id, CAST(u.p AS BIGINT) AS p, ns.n,
         array_to_string(
           b.toks[CAST(u.p + 1 AS INT):CAST(u.p + ns.n AS INT)],
           ' ') AS g
  FROM base b
  CROSS JOIN (VALUES {_REP_NS}) ns(n),
       unnest(range(greatest(len(b.toks) - ns.n + 1, 0))) AS u(p)
),
cnted AS (
  SELECT doc_id, p, n, g,
         COUNT(*) OVER (PARTITION BY doc_id, n, g) AS cnt
  FROM long
),
tops AS (
  SELECT doc_id,
         {", ".join(f"MAX(CASE WHEN n = {n} THEN top_cnt END) "
                    f"AS top{n}_cnt" for n in REP_NS_TOP)}
  FROM (
    SELECT doc_id, n, MAX(cnt) AS top_cnt
    FROM cnted WHERE n <= {max(REP_NS_TOP)} GROUP BY doc_id, n
  ) GROUP BY doc_id
),
cov AS (
  SELECT doc_id,
         {", ".join(f"MAX(CASE WHEN n = {n} THEN cv END) "
                    f"AS dup{n}_tok" for n in REP_NS_DUP)}
  FROM (
    SELECT doc_id, n, CAST(COUNT(*) AS BIGINT) AS cv
    FROM (
      SELECT DISTINCT doc_id, n, p + CAST(u2.q AS BIGINT) AS pos
      FROM cnted, unnest(range(n)) AS u2(q)
      WHERE n >= {min(REP_NS_DUP)} AND cnt >= 2
    ) GROUP BY doc_id, n
  ) GROUP BY doc_id
),
wide AS (
  SELECT nt.doc_id, nt.n_tokens,
         {", ".join(
             f"CASE WHEN nt.n_tokens > 0 THEN "
             f"CAST(coalesce(top{n}_cnt, 0) * {n} AS DOUBLE)"
             f" / nt.n_tokens ELSE 0.0 END AS top{n}_frac"
             for n in REP_NS_TOP)},
         {", ".join(
             f"CASE WHEN nt.n_tokens > 0 THEN "
             f"CAST(coalesce(dup{n}_tok, 0) AS DOUBLE)"
             f" / nt.n_tokens ELSE 0.0 END AS dup{n}_frac"
             for n in REP_NS_DUP)}
  FROM nt
  LEFT JOIN tops ON tops.doc_id = nt.doc_id
  LEFT JOIN cov ON cov.doc_id = nt.doc_id
)
SELECT doc_id, n_tokens,
       {", ".join(f"top{n}_frac" for n in REP_NS_TOP)},
       {", ".join(f"dup{n}_frac" for n in REP_NS_DUP)},
       ({_REP_PASS}) AS repetition_pass
FROM wide ORDER BY doc_id
"""

# BPE merge learning (extensions/training.py::q_bpe_merges): the
# rounds are unrolled as CTEs (the ann_ivf_kmeans pattern).  Each
# round mirrors the Spark windows literally: argmax pair (count DESC,
# pair ASC), eligibility vs the 1-row best, greedy leftmost
# non-overlap via the last-non-eligible-position running max and the
# even-offset rule, consumed = lag(keep), then re-rank.

from astra_perseverance_spark.extensions.training import (  # noqa: E402
    BPE_MAX_WORDS,
    BPE_MERGES,
    RECALL_PANEL_K,
)


def _bpe_round_sql(rin: str, r: int) -> tuple[str, str, str]:
    """One BPE round as CTE text over symbol rows ``rin``; returns
    (sql, best_cte, rows_cte)."""
    x, b, y, z, k, c, ro = (f"bx{r}", f"bb{r}", f"by{r}", f"bz{r}",
                            f"bk{r}", f"bc{r}", f"br{r}")
    sql = f"""
{x} AS MATERIALIZED (
  SELECT word, n, p, sym,
         lead(sym) OVER (PARTITION BY word ORDER BY p) AS nxt
  FROM {rin}
),
{b} AS MATERIALIZED (
  SELECT sym AS lsym, nxt AS rsym, CAST(SUM(n) AS BIGINT) AS cnt
  FROM {x} WHERE nxt IS NOT NULL GROUP BY sym, nxt
  ORDER BY cnt DESC, sym, nxt LIMIT 1
),
{y} AS MATERIALIZED (
  SELECT word, n, p, sym,
         coalesce(sym = (SELECT lsym FROM {b})
                  AND nxt = (SELECT rsym FROM {b}), FALSE) AS el
  FROM {x}
),
{z} AS MATERIALIZED (
  SELECT *, MAX(CASE WHEN NOT el THEN p END)
              OVER (PARTITION BY word ORDER BY p
                    ROWS UNBOUNDED PRECEDING) AS lnep
  FROM {y}
),
{k} AS MATERIALIZED (
  SELECT *, el AND ((p - coalesce(lnep, -1) - 1) % 2 = 0) AS kk
  FROM {z}
),
{c} AS MATERIALIZED (
  SELECT *, lag(kk) OVER (PARTITION BY word ORDER BY p) AS consumed
  FROM {k}
),
{ro} AS MATERIALIZED (
  SELECT word, n,
         CAST(ROW_NUMBER() OVER (PARTITION BY word ORDER BY p) - 1
              AS BIGINT) AS p,
         CASE WHEN kk THEN (SELECT lsym || rsym FROM {b}) ELSE sym END AS sym
  FROM {c} WHERE NOT coalesce(consumed, FALSE)
)"""
    return sql, b, ro


_BPE_CTES = []
_BPE_BESTS = []
_bpe_prev = "br0"
for _it in range(1, BPE_MERGES + 1):
    _sql, _b, _bpe_prev = _bpe_round_sql(_bpe_prev, _it)
    _BPE_CTES.append(_sql)
    _BPE_BESTS.append(_b)

_BPE_UNION = "\nUNION ALL\n".join(
    f"SELECT CAST({i} AS INT) AS merge_rank, lsym AS left_sym,"
    f" rsym AS right_sym, lsym || rsym AS new_sym,"
    f" cnt AS pair_count FROM {b}"
    for i, b in enumerate(_BPE_BESTS, start=1)
)

EXT_ORACLE_SQL["bpe_merges"] = f"""
WITH wc AS MATERIALIZED (
  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT unnest({_TOKS}) AS w FROM documents)
  GROUP BY w ORDER BY n DESC, word LIMIT {BPE_MAX_WORDS}
),
br0 AS MATERIALIZED (
  SELECT word, n, CAST(u.p AS BIGINT) AS p,
         substr(word, CAST(u.p + 1 AS INT), 1) AS sym
  FROM wc, unnest(range(length(word))) AS u(p)
),
{",".join(_BPE_CTES)}
SELECT * FROM (
{_BPE_UNION}
) ORDER BY merge_rank
"""

# Quantized-store recall audit (training.py::q_ann_quantized_recall):
# asymmetric distance — exact query vector vs int8-reconstructed
# database — with the same exact-baseline recall shape as
# ann_recall_audit.  Encode/decode fused, exact BIGINT.

EXT_ORACLE_SQL["ann_quantized_recall"] = f"""
WITH {_VEC},
dims AS MATERIALIZED (
  SELECT CAST(u.d AS INT) AS d,
         MIN(eq[CAST(u.d + 1 AS INT)]) AS lo,
         MAX(eq[CAST(u.d + 1 AS INT)]) AS hi
  FROM vn, unnest(range({ANN_DIM})) AS u(d)
  GROUP BY u.d
),
st AS MATERIALIZED (
  SELECT (SELECT list(lo ORDER BY d) FROM dims) AS lo_a,
         (SELECT list(hi ORDER BY d) FROM dims) AS hi_a
),
rv AS MATERIALIZED (
  SELECT vec_id,
         list_transform(range({ANN_DIM}), i -> CASE
           WHEN hi_a[CAST(i + 1 AS INT)] > lo_a[CAST(i + 1 AS INT)]
           THEN CAST(lo_a[CAST(i + 1 AS INT)]
                + ((eq[CAST(i + 1 AS INT)] - lo_a[CAST(i + 1 AS INT)])
                   * {SQ_LEVELS}
                   // (hi_a[CAST(i + 1 AS INT)] - lo_a[CAST(i + 1 AS INT)]))
                  * (hi_a[CAST(i + 1 AS INT)] - lo_a[CAST(i + 1 AS INT)])
                  // {SQ_LEVELS} AS BIGINT)
           ELSE lo_a[CAST(i + 1 AS INT)] END) AS rq
  FROM vn, st
),
rn AS MATERIALIZED (
  SELECT vec_id, rq, {dot_q_sql('rq', 'rq')} AS rn2 FROM rv
),
q AS (SELECT * FROM vn WHERE vec_id IN (SELECT vec_id FROM qsel)),
exact_pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_COS} AS cosine
  FROM q JOIN vn c ON c.vec_id <> q.vec_id
),
exact_ranked AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM exact_pairs
),
exact_k AS (SELECT query_id, neighbor_id FROM exact_ranked
            WHERE rank <= {ANN_TOPK}),
quant_pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST({dot_q_sql('q.eq', 'c.rq', ANN_DIM)} AS DOUBLE)
           / (sqrt(CAST(q.n2 AS DOUBLE)) * sqrt(CAST(c.rn2 AS DOUBLE)))
           AS cosine
  FROM q JOIN rn c ON c.vec_id <> q.vec_id
),
quant_ranked AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM quant_pairs
),
quant_k AS (SELECT query_id, neighbor_id FROM quant_ranked
            WHERE rank <= {ANN_TOPK}),
hits AS (
  SELECT e.query_id,
         CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS hit
  FROM exact_k e LEFT JOIN quant_k a
    ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
)
SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_exact,
       CAST(SUM(hit) AS BIGINT) AS n_hit,
       CAST(SUM(hit) AS DOUBLE) / COUNT(*) AS recall
FROM hits GROUP BY query_id ORDER BY query_id
"""

# BPE application (training.py::q_bpe_token_count): per-word BPE
# lengths from the final unrolled round's symbol table, joined to the
# exploded corpus token stream; uncapped words fall back to their
# character count.

EXT_ORACLE_SQL["bpe_token_count"] = f"""
WITH wc AS MATERIALIZED (
  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT unnest({_TOKS}) AS w FROM documents)
  GROUP BY w ORDER BY n DESC, word LIMIT {BPE_MAX_WORDS}
),
br0 AS MATERIALIZED (
  SELECT word, n, CAST(u.p AS BIGINT) AS p,
         substr(word, CAST(u.p + 1 AS INT), 1) AS sym
  FROM wc, unnest(range(length(word))) AS u(p)
),
{",".join(_BPE_CTES)},
wl AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS n_bpe
  FROM {_bpe_prev} GROUP BY word
),
t AS (
  SELECT doc_id, unnest({_TOKS}) AS word FROM documents
),
j AS (
  SELECT t.doc_id,
         CAST(length(t.word) AS BIGINT) AS n_chars,
         coalesce(wl.n_bpe, CAST(length(t.word) AS BIGINT)) AS n_sym
  FROM t LEFT JOIN wl USING (word)
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(n_sym) AS BIGINT) AS n_bpe_tok,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars_tok,
       CAST(SUM(n_sym) AS DOUBLE) / SUM(n_chars) AS bpe_ratio
FROM j GROUP BY doc_id ORDER BY doc_id
"""

# Derived audits (training.py) — each wraps the already-verified twin
# of its source query as a materialized subquery, so the audit layer
# is checked against the same independent formulation.

EXT_ORACLE_SQL["shard_manifest"] = f"""
WITH sp AS MATERIALIZED (
  SELECT * FROM ({EXT_ORACLE_SQL['seq_pack']})
)
SELECT shard_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       CAST(MAX(seq_last) + 1 AS BIGINT) AS n_seqs
FROM sp GROUP BY shard_id ORDER BY shard_id
"""

# Panel-restricted (training.RECALL_PANEL_K hash-selected docs):
# recall is measured on the stratum of exact pairs touching a panel
# document, so the audit is bounded by the panel's pair neighborhood
# rather than the corpus's true-pair universe.
EXT_ORACLE_SQL["dedup_recall_audit"] = f"""
WITH e AS MATERIALIZED (
  SELECT * FROM ({EXT_ORACLE_SQL['ngram_jaccard']})
),
l AS MATERIALIZED (
  SELECT * FROM ({EXT_ORACLE_SQL['dedup_minhash_lsh']})
),
rpanel AS (
  SELECT doc_id FROM documents
  ORDER BY {h15_sql("CAST(doc_id AS VARCHAR)")}, doc_id
  LIMIT {RECALL_PANEL_K}
),
ep AS (
  SELECT e.* FROM e
  WHERE e.doc_a IN (SELECT doc_id FROM rpanel)
     OR e.doc_b IN (SELECT doc_id FROM rpanel)
),
m AS (
  SELECT ep.lang, ep.doc_a, ep.doc_b,
         CASE WHEN l.doc_a IS NOT NULL THEN 1 ELSE 0 END AS in_lsh
  FROM ep LEFT JOIN l ON l.doc_a = ep.doc_a AND l.doc_b = ep.doc_b
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_exact,
       CAST(SUM(in_lsh) AS BIGINT) AS n_hit,
       CAST(SUM(in_lsh) AS DOUBLE) / COUNT(*) AS recall
FROM m GROUP BY lang ORDER BY lang
"""

# Leakage-safe splits (training.q_split_assign): the split comes from
# the near-dup cluster representative's hash, so whole clusters land
# in one split; the cluster CTE is the independently-written
# recursive-CTE components above.
from astra_perseverance_spark.extensions.training import (  # noqa: E402
    SPLIT_TRAIN_PCT,
    SPLIT_VAL_PCT,
)

EXT_ORACLE_SQL["split_assign"] = f"""
WITH cl AS MATERIALIZED (
  SELECT * FROM ({EXT_ORACLE_SQL['dedup_clusters']})
),
a AS (
  SELECT d.doc_id, COALESCE(cl.cluster_id, d.doc_id) AS rep_doc
  FROM documents d LEFT JOIN cl ON cl.doc_id = d.doc_id
),
b AS (
  SELECT doc_id, rep_doc,
         {h15_sql("CAST(rep_doc AS VARCHAR)")} % 100 AS bucket
  FROM a
)
SELECT doc_id, rep_doc, bucket,
       CASE WHEN bucket < {SPLIT_TRAIN_PCT} THEN 'train'
            WHEN bucket < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT} THEN 'val'
            ELSE 'test' END AS split
FROM b ORDER BY doc_id
"""

# Incremental leakage-safe splits (training.q_split_assign_incremental):
# existing-corpus (even doc_id) splits via recursive-CTE components of
# the EVEN-ONLY duplicate subgraph; new (odd) docs inherit their
# minimum-id anchor's split through the dedup_incremental match set,
# else hash their own id.


def _split_case(bucket_expr: str) -> str:
    return (
        f"CASE WHEN ({bucket_expr}) < {SPLIT_TRAIN_PCT} THEN 'train' "
        f"WHEN ({bucket_expr}) < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT} "
        f"THEN 'val' ELSE 'test' END"
    )


EXT_ORACLE_SQL["split_assign_incremental"] = f"""
WITH RECURSIVE
de AS (
  SELECT doc_id,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS h
  FROM documents WHERE doc_id % 2 = 0
),
grpe AS (SELECT h, MIN(doc_id) AS m, COUNT(*) AS c FROM de GROUP BY h),
exact_e AS (
  SELECT grpe.m AS a, de.doc_id AS b
  FROM de JOIN grpe USING (h)
  WHERE grpe.c >= 2 AND de.doc_id > grpe.m
),
{_CAPPED_SH.lstrip()},
near_e AS (
  SELECT x.doc_id AS a, y.doc_id AS b
  FROM sh x JOIN sh y ON x.lang = y.lang AND x.doc_id < y.doc_id
  WHERE x.doc_id % 2 = 0 AND y.doc_id % 2 = 0
    AND CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
          / len(list_distinct(list_concat(x.sh, y.sh)))
        >= {MINHASH_JACCARD_MIN}
),
edges AS (SELECT a, b FROM exact_e UNION SELECT a, b FROM near_e),
sym AS (SELECT a AS s, b AS t FROM edges
        UNION ALL SELECT b AS s, a AS t FROM edges),
nodes AS (SELECT DISTINCT s AS doc FROM sym),
reach(doc, m) AS (
  SELECT doc, doc FROM nodes
  UNION
  SELECT r.doc, s.t FROM reach r JOIN sym s ON s.s = r.m
),
cl AS (SELECT doc AS doc_id, MIN(m) AS rep FROM reach GROUP BY doc),
ex AS (
  SELECT d2.doc_id AS dup_of,
         {_split_case(
             h15_sql("CAST(COALESCE(cl.rep, d2.doc_id) AS VARCHAR)")
             + " % 100")} AS ex_split
  FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 0) d2
  LEFT JOIN cl ON cl.doc_id = d2.doc_id
),
matches AS (
  SELECT doc_id, dup_of
  FROM ({EXT_ORACLE_SQL['dedup_incremental']})
),
agg AS (
  SELECT ma.doc_id, MIN(ma.dup_of) AS anchor_doc,
         CAST(COUNT(DISTINCT ma.dup_of) AS BIGINT) AS n_anchors,
         arg_min(ex.ex_split, ma.dup_of) AS anchor_split,
         COUNT(DISTINCT ex.ex_split) > 1 AS split_conflict
  FROM matches ma JOIN ex ON ex.dup_of = ma.dup_of
  GROUP BY ma.doc_id
)
SELECT n.doc_id, agg.anchor_doc,
       COALESCE(agg.n_anchors, 0) AS n_anchors,
       COALESCE(agg.anchor_split,
                {_split_case(
                    h15_sql("CAST(n.doc_id AS VARCHAR)") + " % 100")})
         AS split,
       COALESCE(agg.split_conflict, FALSE) AS split_conflict
FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) n
LEFT JOIN agg ON agg.doc_id = n.doc_id
ORDER BY n.doc_id
"""

EXT_ORACLE_SQL["curation_funnel"] = f"""
WITH led AS MATERIALIZED (
  SELECT * FROM ({EXT_ORACLE_SQL['corpus_curate']})
),
r AS (
  SELECT u.reason AS reason
  FROM led, unnest(string_split(reasons, ';')) AS u(reason)
  WHERE NOT keep AND length(u.reason) > 0
)
SELECT reason, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS DOUBLE)
         / (SELECT COUNT(*) FROM documents) AS frac
FROM r GROUP BY reason ORDER BY reason
"""

from astra_perseverance_spark.extensions.timeseries import (  # noqa: E402
    ATTR_WINDOW_NS,
)

# As-of attribution (extensions/timeseries.py::q_events_asof): the
# oracle uses DuckDB's NATIVE ASOF JOIN — a genuinely independent
# engine implementation of the same inclusive backward-match
# semantics as the Spark union-and-carry formulation.  DuckDB's pick
# among several right rows with the SAME (user_id, ns) is
# unspecified, while the Spark side deterministically takes the max
# (ns, event_id) struct — so the right side is pre-aggregated to
# MAX(event_id) per (user_id, ns) before the ASOF JOIN, making the
# oracle total-order deterministic under any future fixture.

EXT_ORACLE_SQL["events_asof"] = """
WITH ev AS (
  SELECT CAST(event_id AS BIGINT) AS event_id,
         CAST(user_id AS BIGINT) AS user_id, event_type,
         CAST(epoch_ns(ts) AS BIGINT) AS ns
  FROM events
),
p AS (SELECT event_id, user_id, ns FROM ev WHERE event_type = 'purchase'),
c AS (SELECT user_id, ns, MAX(event_id) AS event_id
      FROM ev WHERE event_type = 'click' GROUP BY user_id, ns)
SELECT p.event_id, p.user_id, p.ns AS purchase_ns,
       c.ns AS asof_ns, c.event_id AS asof_event_id,
       p.ns - c.ns AS gap_ns
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.ns <= p.ns
ORDER BY p.event_id
"""

# Tolerance-bounded as-of (timeseries.py::q_events_asof_1h): the same
# native ASOF JOIN with the one-hour bound applied POST-join — i.e.
# match-then-null, exactly the semantics of the Spark ``tolerance``
# gate on the carried struct (NOT "match the next older click inside
# the window": if the latest click is too old, there is no match).

EXT_ORACLE_SQL["events_asof_1h"] = f"""
WITH ev AS (
  SELECT CAST(event_id AS BIGINT) AS event_id,
         CAST(user_id AS BIGINT) AS user_id, event_type,
         CAST(epoch_ns(ts) AS BIGINT) AS ns
  FROM events
),
p AS (SELECT event_id, user_id, ns FROM ev WHERE event_type = 'purchase'),
c AS (SELECT user_id, ns, MAX(event_id) AS event_id
      FROM ev WHERE event_type = 'click' GROUP BY user_id, ns)
SELECT p.event_id, p.user_id, p.ns AS purchase_ns,
       CASE WHEN p.ns - c.ns <= {ATTR_WINDOW_NS} THEN c.ns END
         AS asof_ns,
       CASE WHEN p.ns - c.ns <= {ATTR_WINDOW_NS} THEN c.event_id END
         AS asof_event_id,
       CASE WHEN p.ns - c.ns <= {ATTR_WINDOW_NS} THEN p.ns - c.ns END
         AS gap_ns
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.ns <= p.ns
ORDER BY p.event_id
"""

# Banded range join (timeseries.py::q_events_window_attr): the oracle
# states the semantics directly as an inequality join — fine at
# oracle scale, the thing the banded form avoids at corpus scale.

EXT_ORACLE_SQL["events_window_attr"] = f"""
WITH ev AS (
  SELECT CAST(event_id AS BIGINT) AS event_id,
         CAST(user_id AS BIGINT) AS user_id, event_type,
         CAST(epoch_ns(ts) AS BIGINT) AS ns
  FROM events
),
p AS (SELECT event_id, user_id, ns FROM ev WHERE event_type = 'purchase'),
c AS (SELECT event_id, user_id, ns FROM ev WHERE event_type = 'click')
SELECT p.event_id, p.user_id, p.ns AS purchase_ns,
       CAST(COUNT(c.event_id) AS BIGINT) AS n_clicks_1h,
       MAX(c.ns) AS last_click_ns
FROM p LEFT JOIN c
  ON c.user_id = p.user_id
 AND c.ns >= p.ns - {ATTR_WINDOW_NS} AND c.ns <= p.ns
GROUP BY p.event_id, p.user_id, p.ns
ORDER BY p.event_id
"""

# Ordered conversion funnel (timeseries.py::q_events_funnel): the
# identical sequential conditional-MIN window formulation — each CTE
# stage's MIN can reference the previous stage's column.

EXT_ORACLE_SQL["events_funnel"] = """
WITH ev AS (
  SELECT CAST(user_id AS BIGINT) AS user_id, event_type,
         CAST(epoch_ns(ts) AS BIGINT) AS ns
  FROM events
),
s1 AS (
  SELECT user_id, event_type, ns,
         MIN(CASE WHEN event_type = 'view' THEN ns END)
           OVER (PARTITION BY user_id) AS view_ns
  FROM ev
),
s2 AS (
  SELECT *, MIN(CASE WHEN event_type = 'click' AND ns >= view_ns
                     THEN ns END)
              OVER (PARTITION BY user_id) AS click_ns
  FROM s1
),
s3 AS (
  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ns >= click_ns
                     THEN ns END)
              OVER (PARTITION BY user_id) AS purchase_ns
  FROM s2
)
SELECT user_id, MAX(view_ns) AS view_ns, MAX(click_ns) AS click_ns,
       MAX(purchase_ns) AS purchase_ns,
       CAST(1 + CASE WHEN MAX(click_ns) IS NOT NULL THEN 1 ELSE 0 END
              + CASE WHEN MAX(purchase_ns) IS NOT NULL THEN 1 ELSE 0 END
            AS INT) AS reached
FROM s3 WHERE view_ns IS NOT NULL
GROUP BY user_id ORDER BY user_id
"""

# Gap-based sessionization (timeseries.py::q_events_sessionize): the
# identical lag-flag-cumsum idiom in DuckDB window SQL — equal-ns
# ties broken by event_id on both engines, so session boundaries are
# total-order deterministic.
from astra_perseverance_spark.extensions.timeseries import (  # noqa: E402
    SESSION_GAP_NS,
)

EXT_ORACLE_SQL["events_sessionize"] = f"""
WITH ev AS (
  SELECT CAST(event_id AS BIGINT) AS event_id,
         CAST(user_id AS BIGINT) AS user_id,
         CAST(epoch_ns(ts) AS BIGINT) AS ns
  FROM events
),
flagged AS (
  SELECT user_id, event_id, ns,
         CASE WHEN lag(ns) OVER w IS NULL
                OR ns - lag(ns) OVER w > {SESSION_GAP_NS}
              THEN 1 ELSE 0 END AS new_s
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ns, event_id)
),
indexed AS (
  SELECT user_id, ns,
         CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ns, event_id
                               ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT)
           AS session_idx
  FROM flagged
)
SELECT user_id, session_idx,
       MIN(ns) AS start_ns, MAX(ns) AS end_ns,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MAX(ns) - MIN(ns) AS duration_ns
FROM indexed GROUP BY user_id, session_idx
ORDER BY user_id, session_idx
"""

# Forward as-of (timeseries.py::q_events_next_error): DuckDB's native
# ASOF JOIN with the forward inequality picks the EARLIEST matching
# right row — the independent twin of the descending union-and-carry.
# Right side pre-aggregated to MIN(event_id) per (user_id, ns) for
# the same determinism reason as events_asof (Spark picks the min
# (ns, event_id) struct on the forward walk).

EXT_ORACLE_SQL["events_next_error"] = """
WITH ev AS (
  SELECT CAST(event_id AS BIGINT) AS event_id,
         CAST(user_id AS BIGINT) AS user_id, event_type,
         CAST(epoch_ns(ts) AS BIGINT) AS ns
  FROM events
),
p AS (SELECT event_id, user_id, ns FROM ev WHERE event_type = 'purchase'),
e AS (SELECT user_id, ns, MIN(event_id) AS event_id
      FROM ev WHERE event_type = 'error' GROUP BY user_id, ns)
SELECT p.event_id, p.user_id, p.ns AS purchase_ns,
       e.ns AS next_ns, e.event_id AS next_event_id,
       e.ns - p.ns AS wait_ns
FROM p ASOF LEFT JOIN e ON p.user_id = e.user_id AND e.ns >= p.ns
ORDER BY p.event_id
"""

# Hot-user skew audit (timeseries.py::q_user_skew_audit): per-user
# event counts, top-10 heavy hitters against the exact nearest-rank
# p50/p99 of the count distribution.  The rank pick reuses
# nearest_rank_sql so both engines share the integer half-even
# arithmetic; rn over the unique-per-user counts (ordered by
# n_events, user_id) is the discrete sorted index.
from astra_perseverance_spark.functions.percentiles import (  # noqa: E402
    nearest_rank_sql,
)
from astra_perseverance_spark.extensions.timeseries import (  # noqa: E402
    SKEW_TOP_K,
)

EXT_ORACLE_SQL["user_skew_audit"] = f"""
WITH c AS (
  SELECT CAST(user_id AS BIGINT) AS user_id,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id
),
g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(n_events) AS BIGINT) AS total_events,
         MAX(n_events) AS max_n
  FROM c
),
sorted AS (
  SELECT n_events,
         ROW_NUMBER() OVER (ORDER BY n_events, user_id) AS rn
  FROM c
),
p AS (
  SELECT
    MIN(CASE WHEN s.rn >= {nearest_rank_sql('g.n_users', 50)}
             THEN s.n_events END) AS p50_n,
    MIN(CASE WHEN s.rn >= {nearest_rank_sql('g.n_users', 99)}
             THEN s.n_events END) AS p99_n
  FROM sorted s, g
),
t AS (
  SELECT user_id, n_events,
         CAST(ROW_NUMBER() OVER (ORDER BY n_events DESC, user_id)
              AS INT) AS rank
  FROM c
  ORDER BY n_events DESC, user_id LIMIT {SKEW_TOP_K}
)
SELECT t.rank, t.user_id, t.n_events,
       CAST(t.n_events AS DOUBLE) / g.total_events AS share,
       p.p50_n, p.p99_n, g.max_n,
       CAST(g.max_n AS DOUBLE) / p.p99_n AS skew_ratio
FROM t, g, p
ORDER BY t.rank
"""

# Composed IVF + quantized serving (similarity.py::q_ann_ivf_pq):
# the trained-IVF probe CTEs (c0 + unrolled Lloyd rounds + af/assign/
# probes, shared verbatim with ann_ivf_kmeans) scored against the
# int8-reconstructed store CTEs (dims/st/rv/rn, shared verbatim with
# ann_quantized_recall) — ADC: exact query vector, reconstructed
# database side.

_RECON_CTES = f"""
dims AS MATERIALIZED (
  SELECT CAST(u.d AS INT) AS d,
         MIN(eq[CAST(u.d + 1 AS INT)]) AS lo,
         MAX(eq[CAST(u.d + 1 AS INT)]) AS hi
  FROM vn, unnest(range({ANN_DIM})) AS u(d)
  GROUP BY u.d
),
st AS MATERIALIZED (
  SELECT (SELECT list(lo ORDER BY d) FROM dims) AS lo_a,
         (SELECT list(hi ORDER BY d) FROM dims) AS hi_a
),
rv AS MATERIALIZED (
  SELECT vec_id,
         list_transform(range({ANN_DIM}), i -> CASE
           WHEN hi_a[CAST(i + 1 AS INT)] > lo_a[CAST(i + 1 AS INT)]
           THEN CAST(lo_a[CAST(i + 1 AS INT)]
                + ((eq[CAST(i + 1 AS INT)] - lo_a[CAST(i + 1 AS INT)])
                   * {SQ_LEVELS}
                   // (hi_a[CAST(i + 1 AS INT)] - lo_a[CAST(i + 1 AS INT)]))
                  * (hi_a[CAST(i + 1 AS INT)] - lo_a[CAST(i + 1 AS INT)])
                  // {SQ_LEVELS} AS BIGINT)
           ELSE lo_a[CAST(i + 1 AS INT)] END) AS rq
  FROM vn, st
),
rn AS MATERIALIZED (
  SELECT vec_id, rq, {dot_q_sql('rq', 'rq')} AS rn2 FROM rv
)"""

_IVF_PQ_PROBE_CTES = f"""
c0 AS (SELECT vec_id AS cid, eq AS c_eq, n2 AS c_n2 FROM vn
       WHERE vec_id % (SELECT stride FROM strd) = 0),
{",".join(_KM_CTES)},
af AS (
  SELECT v.vec_id, v.eq, v.n2, c.cid,
         ROW_NUMBER() OVER (PARTITION BY v.vec_id
           ORDER BY v.n2 + c.c_n2 - 2*{dot_q_sql('v.eq', 'c.c_eq', ANN_DIM)},
                    c.cid) AS crank
  FROM vn v CROSS JOIN {_km_prev} c
),
assign AS (SELECT a.vec_id, a.cid, r.rq, r.rn2
           FROM af a JOIN rn r ON r.vec_id = a.vec_id
           WHERE a.crank = 1),
probes AS (
  SELECT vec_id AS query_id, eq AS q_eq, n2 AS q_n2, cid
  FROM af
  WHERE vec_id IN (SELECT vec_id FROM qsel) AND crank <= {IVF_NPROBE}
),
pq_pairs AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         CAST({dot_q_sql('p.q_eq', 'a.rq', ANN_DIM)} AS DOUBLE)
           / (sqrt(CAST(p.q_n2 AS DOUBLE)) * sqrt(CAST(a.rn2 AS DOUBLE)))
           AS cosine
  FROM probes p JOIN assign a ON a.cid = p.cid AND a.vec_id <> p.query_id
)"""

EXT_ORACLE_SQL["ann_ivf_pq"] = f"""
WITH {_VEC},
{_RECON_CTES.lstrip()},
{_IVF_PQ_PROBE_CTES.lstrip()},
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM pq_pairs
)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cosine
FROM ranked WHERE rank <= {ANN_TOPK} ORDER BY query_id, rank
"""

EXT_ORACLE_SQL["ann_recall_ivf_pq"] = f"""
WITH {_VEC},
{_RECON_CTES.lstrip()},
{_IVF_PQ_PROBE_CTES.lstrip()},
ann_ranked AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM pq_pairs
),
ann_k AS (SELECT query_id, neighbor_id FROM ann_ranked
          WHERE rank <= {ANN_TOPK}),
q AS (SELECT * FROM vn WHERE vec_id IN (SELECT vec_id FROM qsel)),
exact_pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_COS} AS cosine
  FROM q JOIN vn c ON c.vec_id <> q.vec_id
),
exact_ranked AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM exact_pairs
),
exact_k AS (SELECT query_id, neighbor_id FROM exact_ranked
            WHERE rank <= {ANN_TOPK}),
hits AS (
  SELECT e.query_id,
         CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS hit
  FROM exact_k e LEFT JOIN ann_k a
    ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
)
SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_exact,
       CAST(SUM(hit) AS BIGINT) AS n_hit,
       CAST(SUM(hit) AS DOUBLE) / COUNT(*) AS recall
FROM hits GROUP BY query_id ORDER BY query_id
"""

# Whale-capped sessionization (timeseries.py::q_events_sessionize_capped):
# the cap_user_events guard — per-user counts, exact integer ceil-div
# stride, h15(event_id) hash selection for users over the cap — feeding
# the identical lag-flag-cumsum sessionization.  The hash is the
# cross-engine md5-prefix h15 (the corpus_sample pattern), so the twin
# reproduces the IDENTICAL downsampled subset bit-for-bit.
from astra_perseverance_spark.extensions.timeseries import (  # noqa: E402
    SESSION_CAP_DEMO,
)

EXT_ORACLE_SQL["events_sessionize_capped"] = f"""
WITH ev0 AS (
  SELECT CAST(event_id AS BIGINT) AS event_id,
         CAST(user_id AS BIGINT) AS user_id,
         CAST(epoch_ns(ts) AS BIGINT) AS ns
  FROM events
),
cnt AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM ev0 GROUP BY user_id
),
wh AS (
  SELECT user_id,
         (n + {SESSION_CAP_DEMO - 1}) // {SESSION_CAP_DEMO} AS stride
  FROM cnt WHERE n > {SESSION_CAP_DEMO}
),
ev AS (
  SELECT e.event_id, e.user_id, e.ns
  FROM ev0 e LEFT JOIN wh ON wh.user_id = e.user_id
  WHERE wh.stride IS NULL
     OR {h15_sql("CAST(e.event_id AS VARCHAR)")} % wh.stride = 0
),
flagged AS (
  SELECT user_id, event_id, ns,
         CASE WHEN lag(ns) OVER w IS NULL
                OR ns - lag(ns) OVER w > {SESSION_GAP_NS}
              THEN 1 ELSE 0 END AS new_s
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ns, event_id)
),
indexed AS (
  SELECT user_id, ns,
         CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ns, event_id
                               ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT)
           AS session_idx
  FROM flagged
)
SELECT user_id, session_idx,
       MIN(ns) AS start_ns, MAX(ns) AS end_ns,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MAX(ns) - MIN(ns) AS duration_ns
FROM indexed GROUP BY user_id, session_idx
ORDER BY user_id, session_idx
"""

# Incremental ANN over the quantized store
# (similarity.py::q_ann_incremental_pq): the ann_incremental CTEs
# (parity split, even-corpus stride centroids, crank-1 list
# assignment, nprobe probe routing) with the candidate payload swapped
# for the int8-reconstructed EVEN store — bounds computed over the
# indexed half only (frozen at index build, before the new batch
# exists), encode∘decode fused exact-BIGINT as in ann_quantized_recall.

_INCR_RECON_CTES = f"""
sdim AS MATERIALIZED (
  SELECT CAST(u.d AS INT) AS d,
         MIN(eq[CAST(u.d + 1 AS INT)]) AS lo,
         MAX(eq[CAST(u.d + 1 AS INT)]) AS hi
  FROM old, unnest(range({ANN_DIM})) AS u(d)
  GROUP BY u.d
),
sb AS MATERIALIZED (
  SELECT (SELECT list(lo ORDER BY d) FROM sdim) AS lo_a,
         (SELECT list(hi ORDER BY d) FROM sdim) AS hi_a
),
srv AS MATERIALIZED (
  SELECT vec_id,
         list_transform(range({ANN_DIM}), i -> CASE
           WHEN hi_a[CAST(i + 1 AS INT)] > lo_a[CAST(i + 1 AS INT)]
           THEN CAST(lo_a[CAST(i + 1 AS INT)]
                + ((eq[CAST(i + 1 AS INT)] - lo_a[CAST(i + 1 AS INT)])
                   * {SQ_LEVELS}
                   // (hi_a[CAST(i + 1 AS INT)] - lo_a[CAST(i + 1 AS INT)]))
                  * (hi_a[CAST(i + 1 AS INT)] - lo_a[CAST(i + 1 AS INT)])
                  // {SQ_LEVELS} AS BIGINT)
           ELSE lo_a[CAST(i + 1 AS INT)] END) AS rq
  FROM old, sb
),
srn AS MATERIALIZED (
  SELECT vec_id, rq, {dot_q_sql('rq', 'rq')} AS rn2 FROM srv
)"""

EXT_ORACLE_SQL["ann_incremental_pq"] = f"""
WITH v AS (
  SELECT vec_id, {quantize_sql('embedding')} AS eq FROM embeddings
),
vn AS (
  SELECT vec_id, eq, {dot_q_sql('eq', 'eq', ANN_DIM)} AS n2 FROM v
),
old AS (SELECT * FROM vn WHERE vec_id % 2 = 0),
new AS (SELECT * FROM vn WHERE vec_id % 2 = 1),
st AS (
  SELECT greatest(1, n // greatest(
           least(CAST(FLOOR(SQRT(CAST(n AS DOUBLE))) AS BIGINT),
                 {IVF_MAX_LISTS}), 1)) AS stride
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM old)
),
cent AS (
  SELECT vec_id AS cid, eq AS c_eq, n2 AS c_n2
  FROM old, st WHERE (vec_id // 2) % st.stride = 0
),
{_INCR_RECON_CTES.lstrip()},
assign AS (
  SELECT a.cid, a.vec_id, r.rq, r.rn2 FROM (
    SELECT c.cid, q.vec_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {_INCR_COS_QC} DESC, c.cid) AS crank
    FROM old q CROSS JOIN cent c
  ) a JOIN srn r ON r.vec_id = a.vec_id
  WHERE a.crank = 1
),
probes AS (
  SELECT query_id, q_eq, q_n2, cid FROM (
    SELECT q.vec_id AS query_id, q.eq AS q_eq, q.n2 AS q_n2, c.cid,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {_INCR_COS_QC} DESC, c.cid) AS crank
    FROM new q CROSS JOIN cent c
  ) WHERE crank <= {IVF_NPROBE}
),
pairs AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         CAST({dot_q_sql('p.q_eq', 'a.rq', ANN_DIM)} AS DOUBLE)
           / (sqrt(CAST(p.q_n2 AS DOUBLE)) * sqrt(CAST(a.rn2 AS DOUBLE)))
           AS cosine
  FROM probes p JOIN assign a ON a.cid = p.cid
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM pairs
)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cosine
FROM ranked WHERE rank <= {ANN_TOPK} ORDER BY query_id, rank
"""
