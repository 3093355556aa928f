"""DuckDB oracle SQL for the pipeline operators.

Each builder returns ANSI/DuckDB SQL computing EXACTLY what the Spark
operator computes, sharing constants (minhash (a,b) params, primes,
thresholds) from the same Python source of truth. Hashes are the
cross-engine md5-prefix (``functions.hash32/hash64``); float folds are
left-to-right over doubles in both engines, so even cosine values match
bit-for-bit before rounding.
"""

from __future__ import annotations

from deep_query_optimization_spark.functions import MINHASH_PRIME
from deep_query_optimization_spark.operators.dedup import minhash_params
from deep_query_optimization_spark.operators.text import LANG_MARKERS, STOPWORDS

H32 = "('0x' || substr(md5({s}),1,8))::BIGINT"
H64 = "('0x' || substr(md5({s}),1,15))::BIGINT"

SHINGLES_CTE = """
words AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id, {h} AS hv FROM (
    SELECT doc_id,
           unnest([array_to_string(w[i:i+{nm1}], ' ') for i in generate_series(1, len(w)-{nm1})]) AS s
    FROM words) u
  WHERE s <> '')
""".strip()


def _shingles(n: int = 3) -> str:
    return SHINGLES_CTE.format(h=H32.format(s="s"), nm1=n - 1)


def dedup_exact() -> str:
    return (
        "SELECT md5(text) AS digest, CAST(MIN(doc_id) AS BIGINT) AS keep_id, "
        "CAST(COUNT(*) AS BIGINT) AS dup_cnt FROM documents GROUP BY 1"
    )


def dedup_ngram_jaccard(n: int = 3, threshold: float = 0.5, max_shingle_df: int | None = None) -> str:
    """Mirrors ``dedup.jaccard_pairs`` including its document-frequency
    guard: shingles with df > ``max_shingle_df`` are dropped before BOTH
    the size and intersection counts (pass the operator's value, or None
    when the operator runs unguarded)."""
    if max_shingle_df is None:
        shf = "shf AS (SELECT * FROM sh)"
    else:
        shf = (
            "freq AS (SELECT hv, COUNT(*) AS df_cnt FROM sh GROUP BY 1),\n"
            f"shf AS (SELECT sh.doc_id, sh.hv FROM sh JOIN freq USING (hv) WHERE df_cnt <= {max_shingle_df})"
        )
    return f"""
WITH {_shingles(n)},
{shf},
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shf GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
  FROM shf a JOIN shf b ON a.hv = b.hv AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT id_a, id_b, jaccard FROM (
  SELECT id_a, id_b, ROUND(i * 1.0 / (sa.sz + sb.sz - i), 6) AS jaccard
  FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b) j
WHERE jaccard >= {threshold}
""".strip()


def dedup_minhash_lsh(
    k: int = 16, bands: int = 4, n: int = 3, seed: int = 7, max_bucket_size: int | None = None
) -> str:
    """Mirrors ``dedup.minhash_lsh_candidates`` including its band-bucket
    size guard (buckets with > ``max_bucket_size`` docs are excluded from
    the candidate join; pass the operator's value, or None when the
    operator runs unguarded)."""
    r = k // bands
    params = minhash_params(k, seed)
    mins = ",\n  ".join(
        f"MIN(({a} * hv + {b}) % {MINHASH_PRIME}) AS m{i}" for i, (a, b) in enumerate(params)
    )
    band_selects = []
    for bi in range(bands):
        key = " || '-' || ".join(f"m{bi * r + j}::VARCHAR" for j in range(r))
        band_selects.append(f"SELECT doc_id, {bi} AS band, {key} AS key FROM sig")
    bands_sql = "\nUNION ALL\n".join(band_selects)
    if max_bucket_size is None:
        joinable = "joinable AS (SELECT * FROM bands)"
    else:
        joinable = (
            "bsizes AS (SELECT band, key, COUNT(*) AS bsz FROM bands GROUP BY 1, 2),\n"
            "joinable AS (SELECT bands.* FROM bands JOIN bsizes USING (band, key) "
            f"WHERE bsz <= {max_bucket_size})"
        )
    return f"""
WITH {_shingles(n)},
sig AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
bands AS ({bands_sql}),
{joinable}
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM joinable a JOIN joinable b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
""".strip()


def dedup_simhash(bits: int = 16) -> str:
    votes = ",\n  ".join(
        f"SUM(CASE WHEN (hv >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}" for j in range(bits)
    )
    sig = " + ".join(f"CASE WHEN v{j} > 0 THEN CAST({2**j} AS BIGINT) ELSE 0 END" for j in range(bits))
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok FROM documents),
h AS (SELECT doc_id, {H32.format(s="tok")} AS hv FROM toks WHERE tok <> ''),
v AS (SELECT doc_id, {votes} FROM h GROUP BY doc_id)
SELECT doc_id AS id, CAST({sig} AS BIGINT) AS simhash FROM v
""".strip()


_DOT = (
    "list_reduce([{a}[i]::DOUBLE * {b}[i]::DOUBLE for i in generate_series(1, len({a}))], (x, y) -> x + y)"
)
_NORM = "sqrt(list_reduce([{v}[i]::DOUBLE * {v}[i]::DOUBLE for i in generate_series(1, len({v}))], (x, y) -> x + y))"


def _cos(a: str, b: str) -> str:
    return f"{_DOT.format(a=a, b=b)} / ({_NORM.format(v=a)} * {_NORM.format(v=b)})"


def embedding_near_dup(threshold: float = 0.4, probe_max_id: int = 100) -> str:
    cos = _cos("a.embedding", "b.embedding")
    return f"""
SELECT id_a, id_b, cos FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, ROUND({cos}, 4) AS cos
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE a.vec_id < {probe_max_id}) p
WHERE cos >= {threshold}
""".strip()


def sim_topk(k: int = 5, probe_max_id: int = 5) -> str:
    cos = _cos("p.embedding", "c.embedding")
    return f"""
SELECT probe_id, nn_id, ROUND(cos_raw, 4) AS cos, rnk FROM (
  SELECT p.vec_id AS probe_id, c.vec_id AS nn_id, {cos} AS cos_raw,
         CAST(ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY {cos} DESC, c.vec_id) AS BIGINT) AS rnk
  FROM embeddings p JOIN embeddings c ON p.vec_id != c.vec_id
  WHERE p.vec_id < {probe_max_id}) t
WHERE rnk <= {k}
""".strip()


def _vec_lit(v) -> str:
    """A python float list as an exact DuckDB DOUBLE[] literal
    (``repr`` emits the shortest round-tripping decimal)."""
    return "[" + ", ".join(repr(float(x)) for x in v) + "]::DOUBLE[]"


def sim_topk_lsh(
    k: int = 5,
    probe_max_id: int = 5,
    dim: int = 64,
    n_planes: int = 12,
    seed: int = 13,
    n_tables: int = 8,
    probe_dist: int = 1,
) -> str:
    """Exact oracle for ``similarity.hyperplane_lsh_topk``: the
    hyperplanes are seeded constants (``similarity.hyperplanes``), so
    the WHOLE approximate pipeline — sign-bit signatures per table,
    multi-probe Hamming-1 bucket expansion, bucket-local candidate
    join, exact-cosine top-k over the candidates — is reproducible in
    SQL with the plane vectors embedded as literals. Signature dots on
    the Spark side come from a float64 numpy matmul and here from a
    float64 left fold; a sign can only differ for |dot| within
    accumulated rounding (~1e-13) of zero, which the gauss-random
    planes make vanishingly unlikely — and the gate data is fixed, so
    a local pass is a driver pass."""
    from deep_query_optimization_spark.operators.similarity import hyperplanes

    if probe_dist != 1:
        raise NotImplementedError("oracle mirrors the gate's probe_dist=1")
    plane_sets = [hyperplanes(dim, n_planes, seed + 1000 * l) for l in range(n_tables)]
    rows = ",\n  ".join(
        f"({l}, {j}, {_vec_lit(p)})"
        for l, planes in enumerate(plane_sets)
        for j, p in enumerate(planes)
    )
    dot = _DOT.format(a="e.embedding", b="pl.vec")
    cos = _cos("p.embedding", "c.embedding")
    return f"""
WITH planes(tbl, pj, vec) AS (VALUES
  {rows}),
sigs AS (
  SELECT e.vec_id, pl.tbl,
         CAST(SUM(CASE WHEN {dot} > 0 THEN (1::BIGINT << pl.pj) ELSE 0::BIGINT END) AS BIGINT) AS bucket
  FROM embeddings e CROSS JOIN planes pl
  GROUP BY 1, 2),
bits AS (SELECT unnest(generate_series(-1, {n_planes - 1})) AS b),
pb AS (
  SELECT s.vec_id AS probe_id, s.tbl,
         CASE WHEN bits.b < 0 THEN s.bucket
              ELSE xor(s.bucket, (1::BIGINT << bits.b)) END AS bucket
  FROM sigs s CROSS JOIN bits WHERE s.vec_id < {probe_max_id}),
cand AS (
  SELECT DISTINCT pb.probe_id, s.vec_id AS nn_id
  FROM pb JOIN sigs s ON s.tbl = pb.tbl AND s.bucket = pb.bucket
  WHERE s.vec_id != pb.probe_id),
scored AS (
  SELECT cand.probe_id, cand.nn_id, {cos} AS cos_raw
  FROM cand JOIN embeddings p ON p.vec_id = cand.probe_id
            JOIN embeddings c ON c.vec_id = cand.nn_id)
SELECT probe_id, nn_id, ROUND(cos_raw, 4) AS cos, rnk FROM (
  SELECT probe_id, nn_id, cos_raw,
         CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos_raw DESC, nn_id) AS BIGINT) AS rnk
  FROM scored) t
WHERE rnk <= {k}
""".strip()


def sim_topk_ivf(
    k: int = 5,
    probe_max_id: int = 5,
    nlist: int = 64,
    nprobe: int = 6,
    sample_n: int = 2048,
    seed: int = 13,
    sf_dir: str = "/root/testdata/sf0.01",
) -> str:
    """Exact oracle for ``similarity.ivf_topk``: the coarse quantizer is
    a deterministic function of the data (seeded numpy Lloyd on the
    lowest-``sample_n`` vectors), so the builder derives the IDENTICAL
    centroids with the shared ``lloyd_centroids`` code (sample read via
    DuckDB, same order/limit as the operator's bounded collect) and
    embeds them as literals; cell assignment (argmin of ‖c‖²−2v·c),
    nprobe expansion and the cell-local exact-cosine top-k then mirror
    the operator in SQL. Built lazily (``workload.oracle_sql`` resolves
    callables) because it reads the gate parquet."""
    import duckdb
    import numpy as np

    from deep_query_optimization_spark.operators.similarity import lloyd_centroids

    sample = duckdb.sql(
        f"SELECT embedding FROM read_parquet('{sf_dir}/embeddings.parquet') "
        f"ORDER BY vec_id LIMIT {sample_n}"
    ).fetchall()
    X = np.array([list(r[0]) for r in sample], dtype=np.float64)
    cents = lloyd_centroids(X, nlist, iters=8, seed=seed)
    rows = ",\n  ".join(f"({ci}, {_vec_lit(cv)})" for ci, cv in enumerate(cents))
    dot = _DOT.format(a="e.embedding", b="cent.cvec")
    c2 = _DOT.format(a="cent.cvec", b="cent.cvec")
    cos = _cos("p.embedding", "c.embedding")
    return f"""
WITH cent(cell, cvec) AS (VALUES
  {rows}),
scored_cells AS (
  SELECT e.vec_id, cent.cell, {c2} - 2 * {dot} AS score
  FROM embeddings e CROSS JOIN cent),
corpus_cell AS (
  SELECT vec_id AS nn_id, cell FROM (
    SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score, cell) AS rn
    FROM scored_cells) t WHERE rn = 1),
probe_cell AS (
  SELECT vec_id AS probe_id, cell FROM (
    SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score, cell) AS rn
    FROM scored_cells WHERE vec_id < {probe_max_id}) t WHERE rn <= {nprobe}),
cand AS (
  SELECT probe_cell.probe_id, corpus_cell.nn_id
  FROM probe_cell JOIN corpus_cell USING (cell)
  WHERE corpus_cell.nn_id != probe_cell.probe_id),
scored AS (
  SELECT cand.probe_id, cand.nn_id, {cos} AS cos_raw
  FROM cand JOIN embeddings p ON p.vec_id = cand.probe_id
            JOIN embeddings c ON c.vec_id = cand.nn_id)
SELECT probe_id, nn_id, ROUND(cos_raw, 4) AS cos, rnk FROM (
  SELECT probe_id, nn_id, cos_raw,
         CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos_raw DESC, nn_id) AS BIGINT) AS rnk
  FROM scored) t
WHERE rnk <= {k}
""".strip()


def _in_list(vals: tuple[str, ...]) -> str:
    return "[" + ", ".join(f"'{v}'" for v in vals) + "]"


def text_quality() -> str:
    stop = _in_list(STOPWORDS)
    return f"""
WITH base AS (
  SELECT doc_id,
    CAST(length(text) AS BIGINT) AS n_chars_m,
    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS n_tokens,
    CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         t -> list_contains({stop}, t))) AS BIGINT) AS n_stop,
    CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS BIGINT) AS n_punct,
    CAST(length(regexp_replace(text, ' ', '', 'g')) AS BIGINT) AS n_nospace
  FROM documents)
SELECT doc_id, n_chars_m, n_tokens,
  ROUND(n_stop * 1.0 / greatest(n_tokens, 1), 6) AS stop_ratio,
  ROUND(n_punct * 1.0 / greatest(n_chars_m, 1), 6) AS punct_ratio,
  ROUND(n_nospace * 1.0 / greatest(n_tokens, 1), 6) AS mean_tok_len,
  score AS quality_score,
  CASE WHEN score >= 0.7 THEN 'high' WHEN score >= 0.4 THEN 'mid' ELSE 'low' END AS quality_band
FROM (
  SELECT *, ROUND(
    (CASE WHEN n_tokens >= 5 AND n_tokens <= 1000 THEN 0.4::DOUBLE ELSE 0.0::DOUBLE END)
    + (CASE WHEN ROUND(n_punct * 1.0 / greatest(n_chars_m, 1), 6) < 0.1 THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END)
    + (CASE WHEN ROUND(n_stop * 1.0 / greatest(n_tokens, 1), 6) > 0.05
             AND ROUND(n_stop * 1.0 / greatest(n_tokens, 1), 6) < 0.6 THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END), 2) AS score
  FROM base) s
""".strip()


def text_langid() -> str:
    hits = ",\n    ".join(
        f"CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'), "
        f"t -> list_contains({_in_list(markers)}, t))) AS BIGINT) AS hits_{lang}"
        for lang, markers in sorted(LANG_MARKERS.items())
    )
    langs = sorted(LANG_MARKERS)
    g = "greatest(" + ", ".join(f"hits_{lang}" for lang in langs) + ")"
    case = " ".join(f"WHEN hits_{lang} > 0 AND hits_{lang} = {g} THEN '{lang}'" for lang in langs)
    cols = ", ".join(f"hits_{lang}" for lang in langs)
    return f"""
WITH h AS (SELECT doc_id, {hits} FROM documents)
SELECT doc_id, CASE {case} ELSE 'und' END AS pred_lang, {cols} FROM h
""".strip()


def text_fingerprint() -> str:
    return f"SELECT doc_id, {H64.format(s='text')} AS fp FROM documents"


def text_quality_langid() -> str:
    """Quality features + language ID in one per-doc row (join of the
    two single-operator oracles on doc_id)."""
    hit_cols = ", ".join(f"l.hits_{lang}" for lang in sorted(LANG_MARKERS))
    return f"""
WITH q AS ({text_quality()}),
l AS ({text_langid()})
SELECT q.*, l.pred_lang, {hit_cols}
FROM q JOIN l USING (doc_id)
""".strip()


def text_fingerprint_tokens() -> str:
    """Content fingerprint + token accounting in one per-doc row."""
    return f"""
WITH f AS ({text_fingerprint()}),
c AS ({text_token_counts()})
SELECT f.doc_id, f.fp, c.n_ws_tokens, c.n_subword_tokens, c.subword_ratio
FROM f JOIN c USING (doc_id)
""".strip()


def text_token_counts() -> str:
    """Mirrors ``text.token_count`` + ``text.subword_token_count``
    (same regex — ASCII-simplified so Java regex and DuckDB's RE2
    tokenize identically)."""
    from deep_query_optimization_spark.operators.text import BPE_PRETOKEN_RE

    # DuckDB string literals are not C-escaped: the pattern goes in
    # verbatim (doubling the backslash would put a literal '\' inside
    # the character class and break it)
    pat = BPE_PRETOKEN_RE
    return f"""
SELECT doc_id,
  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
       ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS n_ws_tokens,
  CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_subword_tokens,
  ROUND(len(regexp_extract_all(text, '{pat}')) * 1.0 /
        greatest(CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END, 1), 6) AS subword_ratio
FROM documents
""".strip()


def multimodal_meta() -> str:
    return """
SELECT doc_id,
  (['image', 'audio', 'video'])[(doc_id % 3 + 1)::INT] AS modality,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
FROM documents
""".strip()


def multimodal_decode() -> str:
    """Oracle for the decode-STUB pipeline: the stub derives dimensions
    from md5(payload) bytes, and payload = utf-8(text), so the digest
    is md5(text) — reproducible in SQL. Validates the whole mapInPandas
    plumbing end-to-end."""
    b = "('0x' || substr(md5(text), {off}, 2))::BIGINT"
    b0, b1, b2 = b.format(off=1), b.format(off=3), b.format(off=5)
    return f"""
SELECT doc_id,
  (['image', 'audio', 'video'])[(doc_id % 3 + 1)::INT] AS modality,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  CAST(CASE WHEN (doc_id % 3 + 1) IN (1, 3) THEN 64 + {b0} % 192 ELSE 0 END AS INT) AS width,
  CAST(CASE WHEN (doc_id % 3 + 1) IN (1, 3) THEN 64 + {b1} % 192 ELSE 0 END AS INT) AS height,
  CAST(CASE WHEN (doc_id % 3 + 1) = 1 THEN 1 ELSE 1 + {b2} % 64 END AS INT) AS n_frames
FROM documents
""".strip()
