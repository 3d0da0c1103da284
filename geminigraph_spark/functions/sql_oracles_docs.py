"""DuckDB oracle SQL for the training-data pipeline operators — built
from the SAME constants as functions/docpipe.py so the two engines pin
identical semantics (token regex, stopword sets, hash families,
thresholds). Float comparisons are quantized to exact integers (ppm /
1e-9 quanta) before they reach the driver's value hash.
"""

from __future__ import annotations

from .docpipe import (
    FP_MOD,
    LSH_JACCARD_MIN_PPM,
    MINHASH_P,
    MINHASH_PARAMS,
    NEARDUP_SAMPLE_MOD,
    NEARDUP_THRESHOLD_PPM,
    SIMHASH64_BITS,
    SIMHASH_BITS,
    SIMHASH_MAX_HAMMING,
    SIMHASH_MULT,
    SIMHASH_MULT2,
    STOP_DE,
    STOP_EN,
    STOP_ES,
    STOP_FR,
    TOKEN_RE,
)

_WORDS = f"regexp_extract_all(lower(text), '{TOKEN_RE}')"

_TOKS = f"""toks AS MATERIALIZED (
  SELECT doc_id,
         unnest({_WORDS}) AS tok,
         unnest(generate_series(1, len({_WORDS}))) AS p
  FROM documents)"""

_VOCAB = """vocab AS MATERIALIZED (
  SELECT tok, ROW_NUMBER() OVER (ORDER BY tok) - 1 AS vid
  FROM (SELECT DISTINCT tok FROM toks))"""

_DTOKS = """dtoks AS MATERIALIZED (SELECT DISTINCT doc_id, tok FROM toks)"""

# token 3-gram shingles (NULL-propagating concat matches Spark F.concat)
_SHINGLES = """sh AS MATERIALIZED (
  SELECT DISTINCT doc_id, s AS tok FROM (
    SELECT doc_id,
           tok || '_' || lead(tok, 1) OVER w || '_' || lead(tok, 2) OVER w AS s
    FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY p)) t
  WHERE s IS NOT NULL)"""

_SH_VOCAB = """shvocab AS MATERIALIZED (
  SELECT tok, ROW_NUMBER() OVER (ORDER BY tok) - 1 AS vid
  FROM (SELECT DISTINCT tok FROM sh))"""


def token_stats_sql() -> str:
    return f"""
SELECT doc_id,
  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS n_ws_tokens,
  CAST(len({_WORDS}) AS BIGINT) AS n_words,
  CAST(len(list_distinct({_WORDS})) AS BIGINT) AS n_distinct_words
FROM documents
"""


def quality_score_sql() -> str:
    return f"""
WITH base AS MATERIALIZED (
  SELECT doc_id,
    CAST(length(text) AS BIGINT) AS n_chars_m,
    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha,
    CAST(len(regexp_extract_all(lower(text), '\\b({STOP_EN})\\b')) AS BIGINT) AS n_stop,
    CAST(len({_WORDS}) AS BIGINT) AS n_words
  FROM documents)
SELECT doc_id, n_chars_m, n_alpha, n_stop, n_words,
  CAST(ROUND((
    (CASE WHEN n_chars_m > 0 THEN n_alpha * 1.0 / n_chars_m ELSE 0.0 END) * 0.4
    + LEAST(1.0, CASE WHEN n_words > 0 THEN n_stop * 10.0 / n_words ELSE 0.0 END) * 0.3
    + LEAST(1.0, n_words / 200.0) * 0.3) * 1000000) AS BIGINT) AS score_ppm
FROM base
"""


def lang_id_sql() -> str:
    def hits(words: str) -> str:
        return f"CAST(len(regexp_extract_all(lower(text), '\\b({words})\\b')) AS BIGINT)"

    return f"""
WITH h AS MATERIALIZED (
  SELECT doc_id,
    {hits(STOP_EN)} AS en_hits,
    {hits(STOP_DE)} AS de_hits,
    {hits(STOP_FR)} AS fr_hits,
    {hits(STOP_ES)} AS es_hits
  FROM documents)
SELECT doc_id, en_hits, de_hits, fr_hits, es_hits,
  CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits >= es_hits THEN 'en'
       WHEN de_hits >= fr_hits AND de_hits >= es_hits THEN 'de'
       WHEN fr_hits >= es_hits THEN 'fr'
       ELSE 'es' END AS lang_pred
FROM h
"""


def doc_fingerprint_sql() -> str:
    return f"""
WITH {_TOKS},
{_VOCAB}
SELECT t.doc_id,
  CAST(SUM(((v.vid + 1) * (((t.p - 1) % 31) + 7)) % {FP_MOD}) % {FP_MOD} AS BIGINT) AS fingerprint
FROM toks t JOIN vocab v USING (tok)
GROUP BY t.doc_id
"""


def dedup_exact_sql() -> str:
    return """
SELECT CAST(MIN(doc_id) AS BIGINT) AS keep_id, CAST(COUNT(*) AS BIGINT) AS n_copies
FROM documents GROUP BY text
"""


def _params_values() -> str:
    return ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(MINHASH_PARAMS))


def _sigs_ctes() -> str:
    return f"""{_TOKS},
{_SHINGLES},
{_SH_VOCAB},
params(i, a, b) AS (VALUES {_params_values()}),
sigs AS MATERIALIZED (
  SELECT t.doc_id, p.i,
         CAST(MIN((CAST(p.a AS BIGINT) * v.vid + p.b) % {MINHASH_P}) AS BIGINT) AS sig
  FROM sh t JOIN shvocab v USING (tok) CROSS JOIN params p
  GROUP BY t.doc_id, p.i)"""


def minhash_signatures_sql() -> str:
    return f"WITH {_sigs_ctes()}\nSELECT doc_id, i, sig FROM sigs"


def dedup_minhash_lsh_sql() -> str:
    return f"""
WITH {_sigs_ctes()},
bands AS MATERIALIZED (
  SELECT doc_id, CAST(i // 2 AS INT) AS band,
         SUM(CASE WHEN i % 2 = 0 THEN sig * {MINHASH_P} ELSE sig END) AS bval
  FROM sigs GROUP BY doc_id, band),
cands AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id),
sizes AS MATERIALIZED (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS MATERIALIZED (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
  FROM cands c
  JOIN sh ta ON ta.doc_id = c.doc_a
  JOIN sh tb ON tb.doc_id = c.doc_b AND tb.tok = ta.tok
  GROUP BY c.doc_a, c.doc_b)
SELECT i.doc_a, i.doc_b,
  CAST(ROUND(i.inter * 1000000.0 / (sa.sz + sb.sz - i.inter)) AS BIGINT) AS jac_ppm
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE CAST(ROUND(i.inter * 1000000.0 / (sa.sz + sb.sz - i.inter)) AS BIGINT) >= {LSH_JACCARD_MIN_PPM}
"""


def dedup_clusters_sql() -> str:
    """Oracle twin of docpipe.dedup_clusters: the same verified LSH pairs
    (CTE chain identical to dedup_minhash_lsh_sql), then components by
    recursive-CTE transitive closure with MIN-label — exact because the
    fixture's near-dup components are tiny, where the Spark side runs the
    distributed HashMin fixpoint."""
    return f"""
WITH RECURSIVE {_sigs_ctes()},
bands AS MATERIALIZED (
  SELECT doc_id, CAST(i // 2 AS INT) AS band,
         SUM(CASE WHEN i % 2 = 0 THEN sig * {MINHASH_P} ELSE sig END) AS bval
  FROM sigs GROUP BY doc_id, band),
cands AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id),
sizes AS MATERIALIZED (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS MATERIALIZED (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
  FROM cands c
  JOIN sh ta ON ta.doc_id = c.doc_a
  JOIN sh tb ON tb.doc_id = c.doc_b AND tb.tok = ta.tok
  GROUP BY c.doc_a, c.doc_b),
pairs AS MATERIALIZED (
  SELECT i.doc_a, i.doc_b
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.doc_a
  JOIN sizes sb ON sb.doc_id = i.doc_b
  WHERE CAST(ROUND(i.inter * 1000000.0 / (sa.sz + sb.sz - i.inter)) AS BIGINT) >= {LSH_JACCARD_MIN_PPM}),
uedges AS MATERIALIZED (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs),
reach(id, r) AS (
  SELECT s, s FROM (SELECT DISTINCT s FROM uedges)
  UNION
  SELECT reach.id, e.d FROM reach JOIN uedges e ON e.s = reach.r),
labels AS MATERIALIZED (SELECT id, MIN(r) AS lbl FROM reach GROUP BY id)
SELECT d.doc_id,
       COALESCE(l.lbl, d.doc_id) AS cluster_id,
       CAST(CASE WHEN COALESCE(l.lbl, d.doc_id) = d.doc_id THEN 1 ELSE 0 END AS BIGINT) AS is_canonical
FROM documents d LEFT JOIN labels l ON l.id = d.doc_id
"""


def simhash_sql() -> str:
    return f"""
WITH {_TOKS},
{_VOCAB},
h AS MATERIALIZED (
  SELECT t.doc_id, (v.vid * {SIMHASH_MULT}) % {MINHASH_P} AS h
  FROM toks t JOIN vocab v USING (tok)),
bits AS MATERIALIZED (
  SELECT doc_id, b.b, SUM(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM h CROSS JOIN (SELECT unnest(generate_series(0, {SIMHASH_BITS - 1})) AS b) b
  GROUP BY doc_id, b.b)
SELECT doc_id,
  CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
FROM bits GROUP BY doc_id
"""


def dedup_simhash_sql(max_hamming: int = SIMHASH_MAX_HAMMING) -> str:
    """Brute-force twin of docpipe.dedup_simhash: every doc pair's exact
    Hamming distance over the 60-bit fingerprint (no banding — the oracle
    proves the banded candidate generation is lossless under the
    pigeonhole threshold). The fingerprint hash is the two-multiplier
    30+30-bit concatenation (docpipe.SIMHASH_MULT2): all 60 bit positions
    are live, so no band key is constant across the corpus."""
    return f"""
WITH {_TOKS},
{_VOCAB},
h AS MATERIALIZED (
  SELECT t.doc_id,
    (((v.vid * {SIMHASH_MULT}) % {MINHASH_P}) % {1 << 30}) * {1 << 30}
      + (((v.vid * {SIMHASH_MULT2}) % {MINHASH_P}) % {1 << 30}) AS h
  FROM toks t JOIN vocab v USING (tok)),
bits AS MATERIALIZED (
  SELECT doc_id, b.b, SUM(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM h CROSS JOIN (SELECT unnest(generate_series(0, {SIMHASH64_BITS - 1})) AS b) b
  GROUP BY doc_id, b.b),
sh AS MATERIALIZED (
  SELECT doc_id,
    CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
  FROM bits GROUP BY doc_id)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


def cosine_topk_sql(n_queries: int = 20, k: int = 3) -> str:
    return f"""
WITH e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
q AS MATERIALIZED (SELECT vec_id AS query_id, emb AS qe FROM e WHERE vec_id < {n_queries}),
sims AS MATERIALIZED (
  SELECT q.query_id, c.vec_id AS neighbor_id,
    CAST(ROUND(list_dot_product(q.qe, c.emb)
      / (sqrt(list_dot_product(q.qe, q.qe)) * sqrt(list_dot_product(c.emb, c.emb)))
      * 1000000000) AS BIGINT) AS sim_q
  FROM q CROSS JOIN e c WHERE c.vec_id <> q.query_id),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim_q DESC, neighbor_id ASC) AS rnk
  FROM sims)
SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk,
       CAST(ROUND(sim_q / 1000.0) AS BIGINT) AS sim_ppm
FROM ranked WHERE rnk <= {k}
"""


def embedding_neardup_sql() -> str:
    return f"""
WITH e AS MATERIALIZED (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
  FROM embeddings WHERE vec_id % {NEARDUP_SAMPLE_MOD} = 0)
SELECT a.vec_id AS va, b.vec_id AS vb,
  CAST(ROUND(list_dot_product(a.emb, b.emb)
    / (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb)))
    * 1000000) AS BIGINT) AS sim_ppm
FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE CAST(ROUND(list_dot_product(a.emb, b.emb)
    / (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb)))
    * 1000000) AS BIGINT) >= {NEARDUP_THRESHOLD_PPM}
"""


# ---- multimodal gate oracles (constants shared with functions/multimodal) --


def image_features_sql() -> str:
    """Twin of multimodal.image_features_query over synth_image_assets:
    dimensions + exact-integer-sum mean/std of the arithmetic pixels.
    Mean/std use SUM/COUNT (exact int sum, one double division) in the
    SAME op order as the numpy segment reduction, so ppm quanta agree."""
    from .multimodal import (
        IMG_CHANNELS,
        IMG_H_BASE,
        IMG_H_MOD,
        IMG_PX_A,
        IMG_PX_B,
        IMG_W_BASE,
        IMG_W_MOD,
    )

    return f"""
WITH p AS MATERIALIZED (
  SELECT doc_id,
         {IMG_W_BASE} + doc_id % {IMG_W_MOD} AS w,
         {IMG_H_BASE} + doc_id % {IMG_H_MOD} AS h
  FROM documents),
px AS MATERIALIZED (
  SELECT doc_id, w, h, (doc_id*{IMG_PX_A} + i*{IMG_PX_B}) % 256 AS v
  FROM (SELECT doc_id, w, h,
               unnest(generate_series(0, w*h*{IMG_CHANNELS} - 1)) AS i
        FROM p))
SELECT doc_id AS id,
       CAST(w AS BIGINT) AS width,
       CAST(h AS BIGINT) AS height,
       CAST({IMG_CHANNELS} AS BIGINT) AS channels,
       CAST(ROUND(CAST(SUM(v) AS DOUBLE)/COUNT(*) * 1000000) AS BIGINT) AS mean_ppm,
       CAST(ROUND(SQRT(CAST(SUM(v*v) AS DOUBLE)/COUNT(*)
            - (CAST(SUM(v) AS DOUBLE)/COUNT(*)) * (CAST(SUM(v) AS DOUBLE)/COUNT(*)))
            * 1000000) AS BIGINT) AS std_ppm
FROM px GROUP BY doc_id, w, h
"""


def audio_features_sql() -> str:
    from .multimodal import (
        AUD_N_BASE,
        AUD_N_MOD,
        AUD_S_A,
        AUD_S_B,
        AUD_S_MOD,
        AUD_S_OFF,
        AUD_SR_BASE,
        AUD_SR_MOD,
        AUD_SR_STEP,
    )

    return f"""
WITH p AS MATERIALIZED (
  SELECT doc_id,
         {AUD_SR_BASE} + (doc_id % {AUD_SR_MOD}) * {AUD_SR_STEP} AS sr,
         {AUD_N_BASE} + doc_id % {AUD_N_MOD} AS n
  FROM documents),
sx AS MATERIALIZED (
  SELECT doc_id, sr, n,
         (doc_id*{AUD_S_A} + i*{AUD_S_B}) % {AUD_S_MOD} - {AUD_S_OFF} AS x
  FROM (SELECT doc_id, sr, n, unnest(generate_series(0, n - 1)) AS i FROM p))
SELECT doc_id AS id,
       CAST(sr AS BIGINT) AS sample_rate,
       CAST(n AS BIGINT) AS n_samples,
       CAST(ROUND(SQRT(CAST(SUM(x*x) AS DOUBLE)/COUNT(*)) * 1000000) AS BIGINT) AS rms_ppm
FROM sx GROUP BY doc_id, sr, n
"""


def frame_sample_sql() -> str:
    from .multimodal import (
        VID_B_A,
        VID_B_B,
        VID_EVERY_K,
        VID_FRAME_BYTES,
        VID_NF_MOD,
    )

    return f"""
WITH p AS MATERIALIZED (
  SELECT doc_id, 1 + doc_id % {VID_NF_MOD} AS nf FROM documents),
k AS MATERIALIZED (
  SELECT doc_id, f FROM (
    SELECT doc_id, unnest(generate_series(0, nf - 1)) AS f FROM p)
  WHERE f % {VID_EVERY_K} = 0)
SELECT doc_id AS id,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(f) AS BIGINT) AS frame_no_sum,
       CAST(SUM((doc_id*{VID_B_A} + f*{VID_FRAME_BYTES}*{VID_B_B}) % 256) AS BIGINT) AS head_byte_sum
FROM k GROUP BY doc_id
"""


def jaccard_ngram_sql() -> str:
    from .docpipe import JACCARD_PAIR_STRIDE as S

    return f"""
WITH {_TOKS},
{_SHINGLES},
sz AS MATERIALIZED (SELECT doc_id, COUNT(*) AS c FROM sh GROUP BY doc_id),
inter AS MATERIALIZED (
  SELECT x.doc_id AS a, COUNT(*) AS i
  FROM sh x JOIN sh y ON y.doc_id = x.doc_id + {S} AND y.tok = x.tok
  GROUP BY x.doc_id)
SELECT sa.doc_id AS a, sb.doc_id AS b,
       CAST(ROUND(COALESCE(i, 0)/(sa.c + sb.c - COALESCE(i, 0)) * 1000000) AS BIGINT) AS jaccard_ppm
FROM sz sa JOIN sz sb ON sb.doc_id = sa.doc_id + {S}
LEFT JOIN inter ON inter.a = sa.doc_id
"""
