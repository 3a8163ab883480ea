"""Text-analysis SQL, written as exact Spark/DuckDB pairs.

Training-pipeline operators over the `documents` table: quality scoring,
whitespace + BPE-ish token counting, document fingerprinting, stopword-based
language heuristic, word-3-gram shingles and MinHash signatures. Every pair
must stay value-identical — the driver hash-compares against the DuckDB
oracle. Ratios are computed from exact integer sums (one final rounded
division), never from per-row float averages, so both engines see identical
arithmetic.

MinHash here is the md5-string variant: signature_k = lexicographic min of
md5('sK_' || shingle) — string comparison is dialect-identical, avoiding
cross-engine integer-hash mismatches (Spark xxhash64 has no DuckDB twin).
"""

from __future__ import annotations

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "value", "row", "data")


def _stoplist() -> str:
    return ", ".join(f"'{w}'" for w in STOPWORDS)


# words CTE: w = whitespace-split tokens (split semantics identical: both
# keep empty strings on consecutive separators)
_WORDS_SPARK = "split(text, ' ')"
_WORDS_DUCK = "string_split(text, ' ')"

# 3-gram shingles with clamped tail (short docs degrade deterministically)
_SHINGLES_SPARK = (
    "transform(sequence(1, greatest(size(w) - 2, 1)), i -> concat_ws('_', "
    "element_at(w, i), element_at(w, least(i + 1, size(w))), "
    "element_at(w, least(i + 2, size(w)))))"
)
_SHINGLES_DUCK = (
    "list_transform(range(1, greatest(len(w) - 2, 1) + 1), i -> concat_ws('_', "
    "w[i], w[least(i + 1, len(w))], w[least(i + 2, len(w))]))"
)


def _minhash_sigs(n_seeds: int, dialect: str) -> str:
    amin = "array_min" if dialect == "spark" else "list_min"
    tx = "transform" if dialect == "spark" else "list_transform"
    return ", ".join(
        f"{amin}({tx}(sh, x -> md5(concat('s{k}_', x)))) AS s{k}"
        for k in range(n_seeds)
    )


def text_quality_sql(dialect: str) -> str:
    words = _WORDS_SPARK if dialect == "spark" else _WORDS_DUCK
    ln = "size" if dialect == "spark" else "len"
    flt = "filter" if dialect == "spark" else "list_filter"
    return f"""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS total_words,
           CAST(sum(tok_est) AS BIGINT) AS total_tok_est,
           round(CAST(sum(n_chars) AS DOUBLE) / sum(n_words), 4) AS avg_word_len_proxy,
           round(CAST(sum(stop_hits) AS DOUBLE) / sum(n_words), 4) AS stopword_ratio
    FROM (
      SELECT source, n_chars,
             {ln}(w) AS n_words,
             CAST(ceil(CAST(n_chars AS DOUBLE) / 4) AS INTEGER) AS tok_est,
             {ln}({flt}(w, x -> x IN ({_stoplist()}))) AS stop_hits
      FROM (SELECT source, n_chars, {words} AS w FROM documents)
    )
    GROUP BY source
    """


def token_count_sql(dialect: str) -> str:
    words = _WORDS_SPARK if dialect == "spark" else _WORDS_DUCK
    ln = "size" if dialect == "spark" else "len"
    return f"""
    SELECT doc_id,
           CAST({ln}({words}) AS INTEGER) AS n_ws_tokens,
           CAST(ceil(CAST(n_chars AS DOUBLE) / 4) AS INTEGER) AS n_bpe_est
    FROM documents
    """


def fingerprint_sql(dialect: str) -> str:
    # rolling/document fingerprint: stable 64-bit-equivalent hex prefix
    return """
    SELECT doc_id, substr(md5(lower(text)), 1, 16) AS fp
    FROM documents
    """


def lang_guess_sql(dialect: str) -> str:
    words = _WORDS_SPARK if dialect == "spark" else _WORDS_DUCK
    ln = "size" if dialect == "spark" else "len"
    flt = "filter" if dialect == "spark" else "list_filter"
    return f"""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN stop_hits > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_guessed_en
    FROM (
      SELECT lang,
             {ln}({flt}(w, x -> x IN ({_stoplist()}))) AS stop_hits
      FROM (SELECT lang, {words} AS w FROM documents)
    )
    GROUP BY lang
    """


def minhash_bands_sql(dialect: str) -> str:
    """2 bands × 4 MinHash seeds; per band: buckets, collisions, candidate
    pairs (the shingle->minhash->band->bucket pipeline of MinHash-LSH)."""
    words = _WORDS_SPARK if dialect == "spark" else _WORDS_DUCK
    sh = _SHINGLES_SPARK if dialect == "spark" else _SHINGLES_DUCK
    sigs = _minhash_sigs(8, dialect)
    return f"""
    WITH base AS (
      SELECT doc_id, {sh} AS sh
      FROM (SELECT doc_id, {words} AS w FROM documents)
    ),
    sigs AS (SELECT doc_id, {sigs} FROM base),
    bands AS (
      SELECT 0 AS band_idx, md5(concat(s0, s1, s2, s3)) AS bucket FROM sigs
      UNION ALL
      SELECT 1 AS band_idx, md5(concat(s4, s5, s6, s7)) AS bucket FROM sigs
    ),
    buckets AS (
      SELECT band_idx, bucket, count(*) AS c FROM bands GROUP BY band_idx, bucket
    )
    SELECT band_idx,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_collision_buckets,
           CAST(sum(c * (c - 1) / 2) AS BIGINT) AS n_candidate_pairs
    FROM buckets
    GROUP BY band_idx
    """


def _pairs_cte(dialect: str) -> str:
    """Shared WITH-block producing pairs(id_a, id_b, jacc): band-0 LSH
    candidates verified with exact shingle-set Jaccard. Used by
    near_dup_pairs_sql (pair stats) and dedup_near (clustering)."""
    words = _WORDS_SPARK if dialect == "spark" else _WORDS_DUCK
    sh = _SHINGLES_SPARK if dialect == "spark" else _SHINGLES_DUCK
    if dialect == "spark":
        dedup, inter, ln = "array_distinct", "array_intersect", "size"
    else:
        dedup, inter, ln = "list_distinct", "list_intersect", "len"
    sigs = _minhash_sigs(4, dialect)
    union_expr = (
        f"{ln}(array_union(a.shd, b.shd))"
        if dialect == "spark"
        else "len(list_distinct(list_concat(a.shd, b.shd)))"
    )
    return f"""
    base AS (
      SELECT doc_id, {dedup}(sh) AS shd, sh
      FROM (
        SELECT doc_id, {sh} AS sh
        FROM (SELECT doc_id, {words} AS w FROM documents)
      )
    ),
    sigs AS (SELECT doc_id, shd, {sigs} FROM base),
    keyed AS (SELECT doc_id, shd, md5(concat(s0, s1, s2, s3)) AS bucket FROM sigs),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST({ln}({inter}(a.shd, b.shd)) AS DOUBLE) / {union_expr} AS jacc
      FROM keyed a JOIN keyed b
        ON a.bucket = b.bucket AND a.doc_id < b.doc_id
    )"""


def near_dup_pairs_sql(dialect: str) -> str:
    """Candidate pairs from band 0, verified with exact shingle-set Jaccard
    (MinHash-LSH candidate -> exact verify, per-source counts)."""
    return f"""
    WITH {_pairs_cte(dialect)}
    SELECT CAST(count(*) AS BIGINT) AS n_candidate_pairs,
           CAST(sum(CASE WHEN jacc >= 0.8 THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dups,
           round(coalesce(avg(jacc), 0), 4) AS avg_jaccard
    FROM pairs
    """


def verified_pairs_sql(dialect: str, threshold: float = 0.8) -> str:
    """pairs (id_a, id_b) with exact shingle Jaccard >= threshold — the
    edge set the near-dup clustering consumes."""
    return f"""
    WITH {_pairs_cte(dialect)}
    SELECT id_a, id_b FROM pairs WHERE jacc >= {threshold}
    """


def dedup_near_oracle_sql(threshold: float = 0.8) -> str:
    """DuckDB-only oracle for the clustering operator: transitive closure
    over the verified pair set via a recursive CTE, component label =
    min reachable doc_id, representative kept per cluster. Single summary
    row mirroring the Spark-side aggregate in __spark_entry__."""
    return f"""
    WITH RECURSIVE {_pairs_cte("duckdb")},
    vp AS (SELECT id_a, id_b FROM pairs WHERE jacc >= {threshold}),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM vp
      UNION
      SELECT id_b, id_a FROM vp
    ),
    reach(node, comp) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.node
    ),
    comps AS (SELECT node AS doc_id, min(comp) AS cluster_id FROM reach GROUP BY node),
    losers AS (SELECT doc_id FROM comps WHERE doc_id != cluster_id)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
           (SELECT CAST(count(*) AS BIGINT) FROM vp) AS n_pairs,
           (SELECT CAST(count(*) AS BIGINT) FROM comps) AS n_clustered,
           (SELECT CAST(count(DISTINCT cluster_id) AS BIGINT) FROM comps) AS n_clusters,
           (SELECT CAST(count(*) AS BIGINT) FROM documents
             WHERE doc_id NOT IN (SELECT doc_id FROM losers)) AS n_kept,
           (SELECT CAST(coalesce(sum(doc_id), 0) AS BIGINT) FROM documents
             WHERE doc_id NOT IN (SELECT doc_id FROM losers)) AS kept_checksum
    """


def ann_cosine_topk_sql(dialect: str, k: int = 10) -> str:
    """Brute-force cosine top-k against the min(vec_id) query vector.
    Dot products computed in DOUBLE with identical sequential fold order in
    both engines, rounded to 4 decimals in-query."""
    if dialect == "spark":
        dot = (
            "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
            "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        )
    else:
        dot = (
            "list_sum(list_transform(range(1, len({a}) + 1), "
            "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
        )
    d_eq = dot.format(a="e.embedding", b="q.qv")
    d_ee = dot.format(a="e.embedding", b="e.embedding")
    d_qq = dot.format(a="q.qv", b="q.qv")
    return f"""
    SELECT e.vec_id,
           round({d_eq} / (sqrt({d_ee}) * sqrt({d_qq})), 4) AS cos_sim
    FROM embeddings e
    CROSS JOIN (
      SELECT embedding AS qv FROM embeddings
      WHERE vec_id = (SELECT min(vec_id) FROM embeddings)
    ) q
    ORDER BY cos_sim DESC, e.vec_id ASC
    LIMIT {k}
    """


def embedding_dedup_oracle_sql(threshold: float = 0.4) -> str:
    """DuckDB-only oracle for embedding-cosine dedup: brute-force all-pairs
    cosine (the exact twin of operators/similarity.py:embedding_pairs_exact,
    identical sequential double fold) + recursive-CTE transitive closure +
    min-vec_id representative. Summary row mirrors the Spark aggregate."""
    dot = (
        "list_sum(list_transform(range(1, len(a.embedding) + 1), "
        "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))"
    )
    na = (
        "sqrt(list_sum(list_transform(range(1, len(a.embedding) + 1), "
        "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))"
    )
    nb = (
        "sqrt(list_sum(list_transform(range(1, len(b.embedding) + 1), "
        "i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))"
    )
    sq = (
        "list_sum(list_transform({v}.embedding, "
        "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    )
    return f"""
    WITH RECURSIVE pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE {sq.format(v="a")} > 0 AND {sq.format(v="b")} > 0
        AND {dot} / ({na} * {nb}) >= {threshold}
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach(node, comp) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.node
    ),
    comps AS (SELECT node AS vec_id, min(comp) AS cluster_id FROM reach GROUP BY node),
    losers AS (SELECT vec_id FROM comps WHERE vec_id != cluster_id)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM embeddings) AS n_vecs,
           (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS n_pairs,
           (SELECT CAST(count(*) AS BIGINT) FROM comps) AS n_clustered,
           (SELECT CAST(count(DISTINCT cluster_id) AS BIGINT) FROM comps) AS n_clusters,
           (SELECT CAST(count(*) AS BIGINT) FROM embeddings
             WHERE vec_id NOT IN (SELECT vec_id FROM losers)) AS n_kept,
           (SELECT CAST(coalesce(sum(vec_id), 0) AS BIGINT) FROM embeddings
             WHERE vec_id NOT IN (SELECT vec_id FROM losers)) AS kept_checksum
    """
