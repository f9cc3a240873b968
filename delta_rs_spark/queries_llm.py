"""LLM-data-pipeline query suite: dedup / similarity / text analysis /
multimodal over the ``documents`` and ``embeddings`` tables.

Same registry + oracle conventions as queries.py. Every query here is
fully oracle-checked: the hash-based operators (MinHash/SimHash) run
with hash_fn='md5' (cross-engine reproducible, dedup.hash64) plus
arithmetic permutations, and the ANN paths (LSH/IVF) are deterministic
(seeded hyperplanes / first-n centroid seeds) so the oracle replays
bucket assignment in SQL. tests/test_llm_ops.py additionally pins the
approximate operators' recall against the exact ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_rs_spark.functions import dedup as D
from delta_rs_spark.functions import sampling as SA
from delta_rs_spark.functions import similarity as S
from delta_rs_spark.functions import text as X
from delta_rs_spark.functions.multimodal import extract_image_features, pack_media
from delta_rs_spark.queries import query
from delta_rs_spark.sources.tpch import load_table

_FP_SQL = "md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))"
_TOKENS_SQL = "string_split_regex(trim(text), '\\s+')"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents table spread across cores, sized by input bytes — the
    driver tables are single parquet files (one scan task otherwise);
    per-row regex/hash work needs the cores, but tiny inputs should not
    pay 32-task scheduling overhead."""
    import os

    # 16 KB per task, not 128 KB: compressed text is ~10x smaller than the
    # per-row CPU cost it carries (hashing/shingling/regex are the hot
    # path here, unlike scan-bound relational queries) — sf0.1's 580 KB
    # file was getting 4 of 32 cores
    size = os.path.getsize(os.path.join(sf_dir, "documents.parquet"))
    n = min(max(1, size // (16 * 1024)), spark.sparkContext.defaultParallelism)
    df = load_table(spark, sf_dir, "documents")
    return df.repartition(int(n)) if n > 1 else df


# --------------------------------------------------------------------------
# Text analysis
# --------------------------------------------------------------------------

@query(
    "llm_doc_token_stats",
    f"""
    SELECT doc_id,
           len({_TOKENS_SQL}) AS n_tokens,
           length(text) AS n_chars_m,
           len(regexp_extract_all(lower(text), '{X.STOPWORD_RE}')) AS n_stopwords,
           len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
           {_FP_SQL} AS fp
    FROM documents
    """,
)
def llm_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        X.token_count("text").alias("n_tokens"),
        X.char_count("text").alias("n_chars_m"),
        X.stopword_count("text").alias("n_stopwords"),
        X.punct_count("text").alias("n_punct"),
        X.fingerprint("text").alias("fp"),
    )


@query(
    "llm_doc_quality",
    f"""
    WITH m AS (
      SELECT doc_id,
             len({_TOKENS_SQL})::DOUBLE AS n_tok,
             length(text)::DOUBLE AS n_char,
             len(regexp_extract_all(lower(text), '{X.STOPWORD_RE}'))::DOUBLE AS sw,
             len(regexp_extract_all(text, '[.,;:!?]'))::DOUBLE AS pn
      FROM documents)
    SELECT doc_id,
           round(0.5 * least(n_tok / 64.0, 1.0)
               + 0.5 * least(sw / greatest(n_tok, 1.0) * 4.0, 1.0)
               - 0.25 * least(pn / greatest(n_char, 1.0) * 10.0, 1.0), 6) AS quality
    FROM m
    """,
)
def llm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select("doc_id", X.quality_score("text").alias("quality"))


def _lang_oracle() -> str:
    count_exprs = []
    for lang, markers in X.LANG_MARKER_TOKENS.items():
        lits = ", ".join(f"'{m}'" for m in markers)
        count_exprs.append(
            f"len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> t IN ({lits}))) AS c_{lang}"
        )
    count_exprs.append(
        f"len(regexp_extract_all(text, '{X.ZH_CHAR_RE}')) AS c_zh"
    )
    counts = ",\n             ".join(count_exprs)
    langs = sorted([*X.LANG_MARKER_TOKENS, "zh"])
    best = "greatest(" + ", ".join(f"c_{lang}" for lang in langs) + ")"
    whens = "\n             ".join(
        f"WHEN c_{lang} > 0 AND c_{lang} = {best} THEN '{lang}'" for lang in langs
    )
    return f"""
    WITH m AS (
      SELECT doc_id,
             {counts}
      FROM documents)
    SELECT doc_id,
           CASE {whens}
                ELSE 'und' END AS lang_pred
    FROM m
    """


@query("llm_lang_id", _lang_oracle())
def llm_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select("doc_id", X.lang_id("text").alias("lang_pred"))


# --------------------------------------------------------------------------
# Deduplication
# --------------------------------------------------------------------------

@query(
    "llm_dedup_exact",
    # keep-first per fingerprint over the doubled corpus == min ORIGINAL
    # doc_id per fp (shifted-copy ids are always larger). Grouping
    # matters: sf0.1 has intra-corpus duplicate texts (8 fps), so the
    # naive per-doc projection diverges there (caught by the sf0.1
    # mirror sweep, r05).
    f"""
    SELECT min(doc_id) AS doc_id, fp
    FROM (SELECT doc_id, {_FP_SQL} AS fp FROM documents)
    GROUP BY fp
    """,
)
def llm_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over the corpus unioned with a shifted copy of itself
    (ids + 1e6): the survivors must be exactly the original ids."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    doubled = docs.union(docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text"))
    kept = D.dedup_exact(doubled, "text", "doc_id")
    return kept.select("doc_id", X.fingerprint("text").alias("fp"))


@query(
    "llm_duplicate_groups",
    # every original doc appears twice in the doubled corpus, so a
    # fingerprint shared by c originals forms ONE group of 2c copies
    # (c > 1 exists at sf0.1 — same divergence class as llm_dedup_exact)
    f"""
    SELECT fp, CAST(2 * count(*) AS BIGINT) AS n_copies,
           min(doc_id) AS keep_id
    FROM (SELECT doc_id, {_FP_SQL} AS fp FROM documents)
    GROUP BY fp
    """,
)
def llm_duplicate_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    doubled = docs.union(docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text"))
    return D.duplicate_groups(doubled, "text", "doc_id").select(
        "fp", "n_copies", "keep_id"
    )


@query(
    "llm_ngram_jaccard_pairs",
    f"""
    WITH w AS (SELECT doc_id, {_TOKENS_SQL} AS ws FROM documents),
    sh AS (SELECT doc_id,
      CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
           ELSE list_transform(range(1, len(ws)-1), i -> array_to_string(ws[i:i+2], ' ')) END AS shingles
      FROM w),
    toks AS (SELECT doc_id, unnest(list_distinct(shingles)) AS tok FROM sh),
    sizes AS (SELECT doc_id, count(*) n FROM toks GROUP BY 1),
    ov AS (SELECT a.doc_id ia, b.doc_id ib, count(*) nc
           FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id GROUP BY 1, 2)
    SELECT ia AS id_a, ib AS id_b,
           round(nc * 1.0 / (sa.n + sb.n - nc), 4) AS jaccard
    FROM ov JOIN sizes sa ON ia = sa.doc_id JOIN sizes sb ON ib = sb.doc_id
    WHERE nc * 1.0 / (sa.n + sb.n - nc) >= 0.2
    """,
)
def llm_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return D.ngram_jaccard_pairs(docs, threshold=0.2, shingle_size=3)


_JACCARD_EDGES_SQL = f"""
    w AS (SELECT doc_id, {_TOKENS_SQL} AS ws FROM documents),
    sh AS (SELECT doc_id,
      CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
           ELSE list_transform(range(1, len(ws)-1), i -> array_to_string(ws[i:i+2], ' ')) END AS shingles
      FROM w),
    toks AS (SELECT doc_id, unnest(list_distinct(shingles)) AS tok FROM sh),
    sizes AS (SELECT doc_id, count(*) n FROM toks GROUP BY 1),
    ov AS (SELECT a.doc_id ia, b.doc_id ib, count(*) nc
           FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id GROUP BY 1, 2),
    edges AS (SELECT ia AS id_a, ib AS id_b
              FROM ov JOIN sizes sa ON ia = sa.doc_id JOIN sizes sb ON ib = sb.doc_id
              WHERE nc * 1.0 / (sa.n + sb.n - nc) >= 0.2)
"""


@query(
    "llm_duplicate_clusters",
    f"""
    WITH RECURSIVE {_JACCARD_EDGES_SQL},
    sym AS (SELECT id_a AS u, id_b AS v FROM edges
            UNION SELECT id_b, id_a FROM edges),
    reach AS (SELECT u, v FROM sym
              UNION SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
    comp AS (SELECT u, min(v) AS mv FROM reach GROUP BY u)
    SELECT d.doc_id,
           least(d.doc_id, coalesce(c.mv, d.doc_id)) AS cluster_id
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.u
    """,
)
def llm_duplicate_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pair resolution: n-gram Jaccard edges -> connected
    components (iterated min-label propagation + pointer jumping) ->
    every doc labeled with the min id of its duplicate cluster
    (singletons label themselves). The oracle walks the same edge set
    with a recursive CTE — a full cross-engine check of a distributed
    iterative graph algorithm."""
    docs = _docs(spark, sf_dir)
    pairs = D.ngram_jaccard_pairs(docs, threshold=0.2, shingle_size=3)
    comp = D.connected_components(pairs)
    return docs.join(comp, docs["doc_id"] == comp["id"], "left").select(
        "doc_id",
        F.coalesce(comp["cluster_id"], F.col("doc_id")).alias("cluster_id"),
    )


_LINES_SQL = "list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)), l -> l != '')"
_NE_TOKENS_SQL = f"list_filter({_TOKENS_SQL}, t -> t != '')"


@query(
    "llm_doc_repetition",
    f"""
    WITH m AS (
      SELECT doc_id,
             {_NE_TOKENS_SQL} AS toks,
             {_LINES_SQL} AS lns,
             length(text)::DOUBLE AS n_char,
             len(regexp_extract_all(text, '[#{{}}<>|\\\\]'))::DOUBLE AS n_sym
      FROM documents),
    c AS (
      SELECT doc_id,
             len(toks) AS n_tokens,
             len(toks)::DOUBLE AS n_tok,
             len(lns) AS n_lines,
             CASE WHEN len(lns) > 0
                  THEN 1.0 - len(list_distinct(lns))::DOUBLE / len(lns)
                  ELSE 0.0 END AS dup_line_frac,
             CASE WHEN len(toks) > 0
                  THEN list_aggregate(list_transform(toks, t -> length(t)), 'sum')::DOUBLE / len(toks)
                  ELSE 0.0 END AS mean_word_len,
             CASE WHEN len(toks) > 0
                  THEN len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]')))::DOUBLE / len(toks)
                  ELSE 0.0 END AS alpha_word_frac,
             CASE WHEN n_char > 0 THEN n_sym / n_char ELSE 0.0 END AS symbol_ratio
      FROM m)
    SELECT doc_id, n_tokens, n_lines,
           round(dup_line_frac, 6) AS dup_line_frac,
           round(mean_word_len, 6) AS mean_word_len,
           round(alpha_word_frac, 6) AS alpha_word_frac,
           round(symbol_ratio, 6) AS symbol_ratio,
           (n_tok >= 5 AND dup_line_frac <= 0.3
            AND mean_word_len >= 2 AND mean_word_len <= 12
            AND alpha_word_frac >= 0.6 AND symbol_ratio <= 0.05) AS passes_gopher
    FROM c
    """,
)
def llm_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return X.repetition_stats(docs)


@query(
    "llm_pii_scrub",
    f"""
    WITH p AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 7 = 0
                     THEN ' contact user' || doc_id || '@example.com' ELSE '' END
             || CASE WHEN doc_id % 11 = 0
                     THEN ' call +1 555 0100' ELSE '' END AS text
      FROM documents)
    SELECT doc_id,
           len(regexp_extract_all(text, '{X.EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(text, '\\+[0-9][0-9 ]{{6,}}[0-9]')) AS n_phones,
           md5(regexp_replace(regexp_replace(text, '{X.EMAIL_RE}', '<EMAIL>', 'g'),
                              '\\+[0-9][0-9 ]{{6,}}[0-9]', '<PHONE>', 'g')) AS scrub_fp
    FROM p
    """,
)
def llm_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + masking over the corpus with deterministically
    planted emails/phones (the raw synthetic docs contain none, so the
    plant makes the scrub path actually fire). Pure regexp_replace in
    both engines; patterns restricted to the Java-regex ∩ RE2 dialect."""
    docs = _docs(spark, sf_dir)
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 11 == 0, F.lit(" call +1 555 0100")).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )
    n_emails, n_phones = X.pii_counts("text")
    return planted.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        F.md5(X.scrub_pii("text")).alias("scrub_fp"),
    )


# cross-engine 64-bit hash (see dedup.hash64 'md5'): DuckDB twin of
# Spark's conv(substr(md5(x),1,15),16,10)::long — 60 bits of md5
_H64_SQL = "('0x' || substr(md5({x}),1,15))::BIGINT"
# DuckDB twin of functions.text.shingles(text, 3): word trigrams, with the
# whole-doc fallback for docs shorter than 3 tokens (same as the
# llm_ngram_jaccard_pairs oracle)
_SHINGLES_SQL = f"""
    w AS (SELECT doc_id, {_TOKENS_SQL} AS ws FROM documents),
    sh AS (SELECT doc_id,
      CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
           ELSE list_transform(range(1, len(ws)-1), i -> array_to_string(ws[i:i+2], ' ')) END AS shingles
      FROM w)
"""
# MinHash signature pipeline shared by the candidates oracle: explode
# shingle hashes (md5-derived, masked to 31 bits), take min over the 64
# arithmetic permutations (a*h + b mod 2^61-1 — same literals as the
# Spark plan, see dedup.perm_consts)
_PERM_VALUES = ", ".join(
    f"({i}, {a}, {b})" for i, (a, b) in enumerate(D.perm_consts(64))
)
_MINHASH_SIG_SQL = f"""
    {_SHINGLES_SQL},
    e AS (SELECT doc_id, {_H64_SQL.format(x='s')} & 2147483647 AS h
          FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)),
    perms(i, a, b) AS (SELECT * FROM (VALUES {_PERM_VALUES})),
    m AS (SELECT doc_id, i, min((a * h + b) % {D.PERM_MOD}) AS mh
          FROM e CROSS JOIN perms GROUP BY doc_id, i),
    sig AS (SELECT doc_id, list(mh ORDER BY i) AS sig FROM m GROUP BY doc_id)
"""


@query(
    "llm_minhash_lsh_candidates",
    f"""
    WITH {_MINHASH_SIG_SQL},
    banded AS (SELECT doc_id, b, sig[4*b+1:4*b+4] AS bsig
               FROM sig CROSS JOIN range(16) r(b)),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
             FROM banded a JOIN banded c
               ON a.b = c.b AND a.bsig = c.bsig AND a.doc_id < c.doc_id),
    est AS (SELECT id_a, id_b,
                   round(len(list_filter(range(1, 65), i -> sa.sig[i] = sb.sig[i])) / 64.0, 4) AS est_jaccard
            FROM cand
            JOIN sig sa ON id_a = sa.doc_id
            JOIN sig sb ON id_b = sb.doc_id)
    SELECT id_a, id_b, est_jaccard FROM est WHERE est_jaccard >= 0.2
    """,
)
def llm_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hash_fn='md5' gives the full cross-engine oracle; the operator
    defaults to xxhash64 in production (same pipeline, faster hash)."""
    docs = _docs(spark, sf_dir)
    return D.minhash_lsh_candidates(docs, hash_fn="md5").filter(
        F.col("est_jaccard") >= 0.2
    )


# SimHash signature pipeline shared by both simhash oracles: majority
# vote per bit over distinct-token hashes (60-bit md5 hash -> bits 60-63
# are 0 in both engines)
_SIMHASH_SIG_SQL = f"""
    tok AS (SELECT doc_id, unnest(list_distinct({_TOKENS_SQL})) AS t FROM documents),
    th AS (SELECT doc_id, {_H64_SQL.format(x='t')} AS h FROM tok),
    bits AS (SELECT doc_id, i,
                    count(*) FILTER ((h >> i) & 1 = 1) AS cnt,
                    count(*) AS n
             FROM th CROSS JOIN range(60) r(i) GROUP BY doc_id, i),
    s AS (SELECT doc_id,
                 CAST(sum(CASE WHEN 2 * cnt > n THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS simhash
          FROM bits GROUP BY doc_id)
"""


@query(
    "llm_simhash_signatures",
    f"""
    WITH {_SIMHASH_SIG_SQL}
    SELECT doc_id AS id, simhash FROM s
    """,
)
def llm_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hash_fn='md5' -> full oracle; production default is xxhash64."""
    docs = _docs(spark, sf_dir)
    return D.simhash(docs, hash_fn="md5")


@query(
    "llm_simhash_near_dup",
    f"""
    WITH {_SIMHASH_SIG_SQL},
    banded AS (SELECT doc_id, simhash, b, (simhash >> (16 * b)) & 65535 AS bval
               FROM s CROSS JOIN range(4) r(b)),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
                    bit_count(xor(a.simhash, c.simhash)) AS ham
             FROM banded a JOIN banded c
               ON a.b = c.b AND a.bval = c.bval AND a.doc_id < c.doc_id
             WHERE bit_count(xor(a.simhash, c.simhash)) <= 3)
    SELECT id_a, id_b, CAST(ham AS INT) AS hamming FROM cand
    """,
)
def llm_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash candidate pairs at Hamming <= 3: 4-band blocking (recall
    1.0 by pigeonhole since bands > max_hamming) + exact bit_count
    verify; equality to a brute-force Hamming scan pinned in
    test_llm_ops. hash_fn='md5' -> full oracle."""
    docs = _docs(spark, sf_dir)
    return D.simhash_near_dup_pairs(docs, max_hamming=3, bands=4, hash_fn="md5")


@query(
    "llm_tfidf_top_terms",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKENS_SQL}) AS term FROM documents),
    t2 AS (SELECT doc_id, term FROM toks WHERE term != ''),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM t2 GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    ranked AS (
      SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
             row_number() OVER (PARTITION BY tf.doc_id
                                ORDER BY tf.tf DESC, tf.term ASC) AS rank
      FROM tf JOIN dfreq USING (term))
    SELECT doc_id, rank, term, tf,
           round(tf * (ln((n_docs + 1.0) / (df + 1)) + 1), 6) AS tfidf
    FROM ranked, n WHERE rank <= 3
    """,
)
def llm_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return X.tfidf_top_terms(docs, k=3)


@query(
    "llm_vocabulary_stats",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKENS_SQL}) AS term FROM documents),
    t2 AS (SELECT doc_id, term FROM toks WHERE term != '')
    SELECT term, count(DISTINCT doc_id) AS doc_freq, count(*) AS coll_freq
    FROM t2 GROUP BY term
    ORDER BY doc_freq DESC, term ASC
    LIMIT 100
    """,
)
def llm_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return X.vocabulary_stats(docs, top=100)


@query(
    "llm_embedding_near_dup",
    """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cos
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
    """,
)
def llm_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return D.embedding_near_dup_pairs(emb, threshold=0.4)


# --------------------------------------------------------------------------
# Similarity search
# --------------------------------------------------------------------------

_QUERY_VEC_CACHE: dict[str, list[float]] = {}


def _query_vector(spark: SparkSession, sf_dir: str) -> list[float]:
    """1-row probe vector for the ANN queries. Cached per sf_dir: at real
    scale re-scanning the embeddings table per query call for one row is
    wasted I/O (the scan itself prunes to the vec_id predicate, but the
    footer/row-group work repeats)."""
    if sf_dir not in _QUERY_VEC_CACHE:
        emb = load_table(spark, sf_dir, "embeddings")
        _QUERY_VEC_CACHE[sf_dir] = list(
            emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
        )
    return _QUERY_VEC_CACHE[sf_dir]


@query(
    "llm_cosine_topk",
    """
    SELECT vec_id AS id,
           round(list_cosine_similarity(embedding::DOUBLE[],
                 (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 4) AS score
    FROM embeddings
    ORDER BY score DESC, id ASC
    LIMIT 10
    """,
)
def llm_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.cosine_topk(emb, _query_vector(spark, sf_dir), k=10)


def _ann_index_path(sf_dir: str, kind: str, source: str = "embeddings.parquet") -> str:
    """Session-stable cache location for a materialized ANN/dedup index
    over a driver testdata dir. The index is a real Delta table
    partitioned by bucket/list/band; queries read it through log-based
    partition pruning. (At production scale the index lives next to the
    corpus and is refreshed by the ingest pipeline, not per query.)"""
    import hashlib
    import os
    import tempfile

    # key by the corpus file's identity (absolute path + mtime + size),
    # not just the dir name — regenerated or differently-rooted testdata
    # must never silently reuse a stale index
    src = os.path.join(sf_dir, source)
    st = os.stat(src)
    tag = hashlib.sha256(
        f"{os.path.abspath(src)}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:16]
    base = os.path.join(tempfile.gettempdir(), "spark_graft_ann", tag)
    os.makedirs(base, exist_ok=True)
    return os.path.join(base, kind)


def _lsh_oracle() -> str:
    """The LSH index is fully deterministic (LCG hyperplanes, seed 42,
    dim 64 — similarity._hyperplanes), so the oracle regenerates the SAME
    plane literals at SQL-build time and replays bucket assignment +
    hamming<=1 probing in DuckDB."""
    planes = S._hyperplanes(64, 8, 42)
    rows = ", ".join(f"({i}, {p!r}::DOUBLE[])" for i, p in enumerate(planes))
    return f"""
    WITH planes(i, p) AS (SELECT * FROM (VALUES {rows})),
    q AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0),
    qb AS (SELECT CAST(sum(CASE WHEN list_dot_product(q.v, planes.p) >= 0
                               THEN (1::BIGINT << i) ELSE 0::BIGINT END) AS BIGINT) AS b
           FROM planes, q),
    probe AS (SELECT b FROM qb
              UNION ALL
              SELECT xor(qb.b, (1::BIGINT << r.i)) FROM qb CROSS JOIN range(8) r(i)),
    bucketed AS (
      SELECT e.vec_id, e.embedding::DOUBLE[] AS v,
             CAST(sum(CASE WHEN list_dot_product(e.embedding::DOUBLE[], planes.p) >= 0
                           THEN (1::BIGINT << planes.i) ELSE 0::BIGINT END) AS BIGINT) AS bucket
      FROM embeddings e CROSS JOIN planes GROUP BY e.vec_id, e.embedding)
    SELECT b.vec_id AS id, round(list_cosine_similarity(b.v, q.v), 4) AS score
    FROM bucketed b, q
    WHERE b.bucket IN (SELECT b FROM probe)
    ORDER BY score DESC, id ASC LIMIT 10
    """


@query("llm_lsh_topk", _lsh_oracle())
def llm_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_rs_spark.table import DeltaTable

    idx = _ann_index_path(sf_dir, "lsh_p8_s42")
    if not DeltaTable.is_deltatable(idx):
        S.build_lsh_index(
            load_table(spark, sf_dir, "embeddings"), idx, n_planes=8, seed=42
        )
    return S.lsh_topk_indexed(spark, idx, _query_vector(spark, sf_dir), k=10)


_IVF_ORACLE = """
    WITH q AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0),
    cents AS (SELECT row_number() OVER (ORDER BY vec_id ASC) - 1 AS i,
                     embedding::DOUBLE[] AS c
              FROM embeddings ORDER BY vec_id ASC LIMIT 16),
    -- probe ranking uses the ROUND-8 centroids stored in the index
    -- table's configuration (build_ivf_index), assignment the raw ones
    rcents AS (SELECT i, list_transform(c, x -> round(x, 8)) AS c FROM cents),
    scored AS (SELECT e.vec_id, c.i,
                      list_cosine_similarity(e.embedding::DOUBLE[], c.c) AS s
               FROM embeddings e CROSS JOIN cents c),
    assign AS (SELECT vec_id, i AS lst FROM (
        SELECT vec_id, i,
               row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, i DESC) AS rn
        FROM scored) WHERE rn = 1),
    probe AS (SELECT i FROM (
        SELECT c.i,
               row_number() OVER (
                 ORDER BY list_dot_product(q.v, c.c) / sqrt(list_dot_product(c.c, c.c)) DESC,
                          c.i ASC) AS rn
        FROM rcents c, q) WHERE rn <= 4)
    SELECT e.vec_id AS id,
           round(list_cosine_similarity(e.embedding::DOUBLE[], q.v), 4) AS score
    FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id, q
    WHERE a.lst IN (SELECT i FROM probe)
    ORDER BY score DESC, id ASC LIMIT 10
    """


@query("llm_ivf_topk", _IVF_ORACLE)
def llm_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_rs_spark.table import DeltaTable

    idx = _ann_index_path(sf_dir, "ivf_l16")
    if not DeltaTable.is_deltatable(idx):
        S.build_ivf_index(load_table(spark, sf_dir, "embeddings"), idx, n_lists=16)
    return S.ivf_topk_indexed(spark, idx, _query_vector(spark, sf_dir), k=10, n_probe=4)


# --------------------------------------------------------------------------
# Multimodal (deterministic fake decode -> rows-only)
# --------------------------------------------------------------------------

def _mm_oracle() -> str:
    """The fake feature extractor is sha256-derived (multimodal.py:66-77),
    so DuckDB can reproduce it byte-for-byte: h[i] is the i-th byte of
    the digest, recovered from the hex string."""
    def hbyte(i: int) -> str:
        c1, c2 = 2 * i + 1, 2 * i + 2
        return (
            f"(strpos('0123456789abcdef', substr(hx,{c1},1))-1)*16"
            f" + strpos('0123456789abcdef', substr(hx,{c2},1))-1"
        )

    return f"""
    WITH s AS (SELECT doc_id, sha256(text) AS hx FROM documents),
    b AS (SELECT doc_id, hx,
                 {hbyte(0)} AS h0, {hbyte(1)} AS h1, {hbyte(2)} AS h2,
                 {hbyte(3)} AS h3, {hbyte(4)} AS h4
          FROM s)
    SELECT doc_id,
           CAST(64 + h0 % 192 AS INT) AS width,
           CAST(64 + h1 % 192 AS INT) AS height,
           round(h2 / 255.0, 6) AS mean_r,
           round(h3 / 255.0, 6) AS mean_g,
           round(h4 / 255.0, 6) AS mean_b,
           substr(hx, 1, 16) AS sha
    FROM b
    """


@query("llm_multimodal_features", _mm_oracle())
def llm_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    media = docs.select(
        "doc_id",
        pack_media(
            F.encode("text", "utf-8"), "image/fake", F.create_map(F.lit("src"), F.col("source"))
        ).alias("media"),
    )
    return extract_image_features(media, media_col="media", id_col="doc_id", fake=True)


@query(
    "llm_embedding_array_stats",
    """
    SELECT vec_id,
           len(embedding) AS dim,
           round(embedding[1]::DOUBLE, 4) AS first_val,
           round(list_aggregate(list_transform(embedding::DOUBLE[], x -> x * x), 'sum'), 4) AS sq_norm,
           round(list_aggregate(embedding::DOUBLE[], 'max'), 4) AS max_val
    FROM embeddings
    """,
)
def llm_embedding_array_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function coverage over the vector column (size/element_at/
    aggregate/array_max), all JVM-side expressions."""
    emb = load_table(spark, sf_dir, "embeddings")
    sq = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return emb.select(
        "vec_id",
        F.size("embedding").cast("int").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 4).alias("first_val"),
        F.round(sq, 4).alias("sq_norm"),
        F.round(F.array_max(F.transform("embedding", lambda x: x.cast("double"))), 4).alias("max_val"),
    )


# --------------------------------------------------------------------------
# Token-budget accounting + winnowing fingerprints
# --------------------------------------------------------------------------

# same alternation, RE2/Java-shared dialect; '' escapes the quote in SQL
_BPE_RE_SQL = "''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s'']+"


@query(
    "llm_bpe_token_stats",
    f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{_BPE_RE_SQL}')) AS n_bpe_tokens,
           round(length(text)::DOUBLE
                 / greatest(len(regexp_extract_all(text, '{_BPE_RE_SQL}')), 1), 4)
             AS chars_per_token
    FROM documents
    """,
)
def llm_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting (GPT-2-style pre-tokenizer regex without
    lookahead — text.BPE_TOKEN_RE): the deterministic plan-level stand-in
    for corpus token-budget accounting; a trained BPE vocab would slot in
    as a pandas_udf over the same column."""
    docs = _docs(spark, sf_dir)
    n = X.bpe_token_count("text")
    return docs.select(
        "doc_id",
        n.alias("n_bpe_tokens"),
        F.round(
            F.length("text").cast("double") / F.greatest(n, F.lit(1)).cast("double"), 4
        ).alias("chars_per_token"),
    )


@query(
    "llm_winnowing_fingerprints",
    f"""
    WITH n AS (SELECT doc_id,
                      regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
               FROM documents),
    g AS (SELECT doc_id,
                 list_transform(range(1, greatest(length(t) - 7, 1) + 1),
                                i -> ('0x' || substr(md5(substr(t, i, 8)), 1, 15))::BIGINT) AS hs
          FROM n),
    w AS (SELECT doc_id,
                 list_distinct(
                   list_transform(range(1, greatest(len(hs) - 3, 1) + 1),
                                  j -> list_aggregate(hs[j:j+3], 'min'))) AS fps
          FROM g)
    SELECT doc_id AS id, unnest(fps) AS fp FROM w
    """,
)
def llm_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) fingerprints, k=8 char-grams, window 4: the
    containment/plagiarism-detection primitive (join docs on fp for
    candidate pairs). hash_fn='md5' -> fully oracle-checked."""
    docs = _docs(spark, sf_dir)
    return X.winnowing_fingerprints(docs, k=8, window=4, hash_fn="md5")


@query(
    "llm_stratified_sample",
    f"""
    WITH r AS (
      SELECT doc_id, source,
             CASE WHEN source IN ('src0','src1','src2') THEN 0.8
                  WHEN source IN ('src3','src4') THEN 0.3
                  ELSE 0.05 END AS rate,
             ('0x' || substr(md5('mix-v1:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               % 1000000 AS bucket
      FROM documents),
    sampled AS (SELECT doc_id, source FROM r
                WHERE bucket < CAST(rate * 1000000 AS BIGINT)),
    split AS (SELECT doc_id, source,
                     CASE WHEN ('0x' || substr(md5('split-v1:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                               % 1000000 < 100000
                          THEN 'holdout' ELSE 'train' END AS split
              FROM sampled)
    SELECT doc_id, source, split FROM split
    """,
)
def llm_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic data mixing + leakage-safe split: hash-bucket
    sampling per source (functions/sampling.py), then a 10% holdout tag
    — both pure functions of (doc_id, salt), so the oracle replays them
    exactly and reruns at any scale select identical rows."""
    from delta_rs_spark.functions.sampling import (
        stratified_sample,
        train_holdout_split,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "source")
    sampled = stratified_sample(
        docs,
        rates={"src0": 0.8, "src1": 0.8, "src2": 0.8, "src3": 0.3, "src4": 0.3},
        default_rate=0.05,
    )
    return train_holdout_split(sampled, holdout_frac=0.1).select(
        "doc_id", "source", "split"
    )


@query(
    "llm_sequence_packing",
    f"""
    WITH toks AS (
      SELECT doc_id, source,
             len(list_filter({_TOKENS_SQL}, t -> t != '')) AS n_tokens
      FROM documents),
    packed AS (
      SELECT doc_id, source, n_tokens,
             sum(n_tokens + 1) OVER (PARTITION BY source ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING) AS cum_incl
      FROM toks)
    SELECT doc_id, source, n_tokens,
           CAST(cum_incl - n_tokens - 1 AS BIGINT) AS tok_offset,
           CAST(floor((cum_incl - n_tokens - 1) / 512) AS BIGINT) AS chunk_id,
           CAST(floor((cum_incl - 2) / 512)
                - floor((cum_incl - n_tokens - 1) / 512) + 1 AS BIGINT) AS n_chunks
    FROM packed
    """,
)
def llm_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing bookkeeping (functions/packing.py):
    per-shard running token offsets and 512-token chunk spans — one
    window-sort per shard, no global ordering bottleneck."""
    from delta_rs_spark.functions.packing import pack_sequences

    docs = _docs(spark, sf_dir).select(
        "doc_id", "source", X.token_count("text").alias("n_tokens")
    )
    return pack_sequences(docs, budget=512)


@query(
    "llm_doc_chunks",
    """
    WITH w AS (
      SELECT doc_id, text, length(text) AS n,
             greatest(CAST(ceil((length(text) - 200) / 150.0) AS BIGINT) + 1, 1) AS nw
      FROM documents),
    e AS (SELECT doc_id, text, unnest(range(0, nw)) AS i FROM w),
    c AS (
      SELECT doc_id, CAST(i AS INT) AS chunk_no,
             CAST(i * 150 + 1 AS INT) AS start,
             substr(text, i * 150 + 1, 200) AS chunk
      FROM e)
    SELECT doc_id, chunk_no, start, md5(chunk) AS chunk_fp FROM c
    """,
)
def llm_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-prep chunking through the JVM expression path
    (chunk_spans) — the 100 TB shape, so the gate times the plan a
    cluster would run. The Python-UDTF twin chunk_documents stays the
    API-parity surface; UDTF==expression equality is pinned in
    test_llm_ops, which keeps the UDTF plane witnessed."""
    from delta_rs_spark.functions.chunking import chunk_spans

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    chunks = chunk_spans(docs)
    return chunks.select(
        "doc_id", "chunk_no", "start", F.md5("chunk").alias("chunk_fp")
    )


# Winnowing fingerprint rows (doc_id, fp), shared by the contamination
# oracle — identical pipeline to the llm_winnowing_fingerprints oracle.
_WINNOW_FPS_SQL = """
    wn AS (SELECT doc_id,
                  regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
           FROM documents),
    wg AS (SELECT doc_id,
                  list_transform(range(1, greatest(length(t) - 7, 1) + 1),
                                 i -> ('0x' || substr(md5(substr(t, i, 8)), 1, 15))::BIGINT) AS hs
           FROM wn),
    ww AS (SELECT doc_id,
                  list_distinct(
                    list_transform(range(1, greatest(len(hs) - 3, 1) + 1),
                                   j -> list_aggregate(hs[j:j+3], 'min'))) AS fps
           FROM wg),
    wf AS (SELECT doc_id, unnest(fps) AS fp FROM ww)
"""


@query(
    "llm_benchmark_contamination",
    f"""
    WITH {_WINNOW_FPS_SQL},
    b AS (SELECT doc_id AS bench_id, fp FROM wf WHERE doc_id % 20 = 0),
    bs AS (SELECT bench_id, count(*) AS bn FROM b GROUP BY 1),
    sh AS (SELECT wf.doc_id AS corpus_id, b.bench_id, count(*) AS n_shared
           FROM wf JOIN b USING (fp) GROUP BY 1, 2)
    SELECT corpus_id, bench_id, n_shared,
           round(n_shared * 1.0 / bn, 4) AS containment
    FROM sh JOIN bs USING (bench_id)
    WHERE round(n_shared * 1.0 / bn, 4) >= 0.5
    """,
)
def llm_benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination via winnowing containment: benchmark
    stand-in = every 20th doc (deterministic), report corpus docs whose
    fingerprints cover >= 50% of a benchmark doc's fingerprint set. The
    benchmark side is broadcast — the corpus side's only shuffle is the
    fingerprint window (text.containment_scores docstring has the 100 TB
    argument). hash_fn='md5' -> full cross-engine oracle."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    return X.containment_scores(
        docs, bench, threshold=0.5, hash_fn="md5"
    )


@query(
    "llm_unigram_logprob",
    f"""
    WITH tk AS (SELECT doc_id, unnest({_NE_TOKENS_SQL}) AS term FROM documents),
    c AS (SELECT term, count(*) AS cnt FROM tk GROUP BY 1),
    tot AS (SELECT sum(cnt) AS total FROM c)
    SELECT doc_id, count(*) AS n_tokens,
           round(avg(ln(cnt / total)), 4) AS mean_logprob
    FROM tk JOIN c USING (term) CROSS JOIN tot
    GROUP BY doc_id
    """,
)
def llm_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheap LM-quality signal: mean ln p(token) under the corpus's own
    MLE unigram model (text.unigram_logprob). Vocab count table is the
    only corpus-global state; broadcast back onto the token stream."""
    docs = _docs(spark, sf_dir)
    return X.unigram_logprob(docs)


@query(
    "llm_source_mix",
    f"""
    WITH s AS (SELECT source, count(*) AS n_docs,
                      CAST(sum(len({_NE_TOKENS_SQL})) AS BIGINT) AS n_tokens,
                      CAST(sum(length(text)) AS BIGINT) AS n_chars
               FROM documents GROUP BY 1),
    t AS (SELECT sum(n_tokens) AS tot FROM s)
    SELECT source, n_docs, n_tokens, n_chars,
           round(n_tokens * 1.0 / tot, 6) AS token_share,
           round(n_tokens * 1.0 / n_docs, 2) AS tokens_per_doc
    FROM s CROSS JOIN t
    """,
)
def llm_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition report per source — the data-mix table
    (text.source_mix): corpus reduces to |sources| rows in one partial
    agg; token share is a second |sources|-sized pass."""
    docs = _docs(spark, sf_dir)
    return X.source_mix(docs)


@query(
    "llm_semantic_dedup",
    """
    WITH cents AS (SELECT row_number() OVER (ORDER BY vec_id ASC) - 1 AS i,
                          embedding::DOUBLE[] AS c
                   FROM embeddings ORDER BY vec_id ASC LIMIT 16),
    scored AS (SELECT e.vec_id, c.i,
                      list_cosine_similarity(e.embedding::DOUBLE[], c.c) AS s
               FROM embeddings e CROSS JOIN cents c),
    assign AS (SELECT vec_id, i AS list_id FROM (
        SELECT vec_id, i,
               row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, i DESC) AS rn
        FROM scored) WHERE rn = 1),
    p AS (SELECT b.vec_id AS id_b
          FROM assign a JOIN assign b ON a.list_id = b.list_id AND a.vec_id < b.vec_id
          JOIN embeddings ea ON ea.vec_id = a.vec_id
          JOIN embeddings eb ON eb.vec_id = b.vec_id
          WHERE round(list_cosine_similarity(ea.embedding::DOUBLE[],
                                             eb.embedding::DOUBLE[]), 4) >= 0.4),
    d AS (SELECT DISTINCT id_b FROM p)
    SELECT a.vec_id, a.list_id, (d.id_b IS NULL) AS keep
    FROM assign a LEFT JOIN d ON a.vec_id = d.id_b
    """,
)
def llm_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table: IVF coarse clusters bound the
    within-cluster quadratic; drop any vector with a lower-id clustermate
    at cosine >= 0.4 (similarity.semantic_dedup docstring has the scale
    argument). Deterministic centroid seeds -> the oracle replays
    assignment, pairing, and the keep rule exactly."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.semantic_dedup(emb, threshold=0.4, n_lists=16)


# Re-line the synthetic token-stream docs (newline every 8 tokens) so the
# line plane has structure to work on: same rewrite in both engines, so
# the oracle sees the identical corpus. $1/\1 are the engines' respective
# backref spellings of the same group.
_RELINE_SPARK = (r"((\S+ ){7}\S+) ", "$1\n")
_RELINE_SQL = r"regexp_replace(text, '((\S+ ){7}\S+) ', '\1' || chr(10), 'g')"


@query(
    "llm_line_dedup",
    f"""
    WITH relined AS (SELECT doc_id, {_RELINE_SQL} AS text FROM documents),
    l0 AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM relined),
    l AS (SELECT doc_id, unnest(ls) AS line, unnest(range(1, len(ls) + 1)) AS i FROM l0),
    n AS (SELECT doc_id, i, line,
                 regexp_replace(lower(trim(line)), '\\s+', ' ', 'g') AS norm
          FROM l),
    d AS (SELECT norm, TRUE AS is_dup FROM n WHERE length(norm) >= 10
          GROUP BY norm HAVING count(DISTINCT doc_id) >= 2)
    SELECT n.doc_id,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CASE WHEN d.is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
           coalesce(string_agg(CASE WHEN d.is_dup IS NULL THEN n.line END,
                               chr(10) ORDER BY n.i), '') AS clean_text
    FROM n LEFT JOIN d USING (norm)
    GROUP BY n.doc_id
    """,
)
def llm_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide line-level dedup (text.line_dedup): boilerplate lines
    appearing in >= 2 docs are stripped from every doc, survivors
    rejoined in order. The oracle replays normalization, the dup-line
    table, and reassembly exactly."""
    docs = _docs(spark, sf_dir).withColumn(
        "text", F.regexp_replace(F.col("text"), *_RELINE_SPARK)
    )
    return X.line_dedup(docs, min_docs=2, min_chars=10)


@query(
    "llm_temperature_mix",
    """
    WITH s AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
    t AS (SELECT sum(n) AS tot FROM s),
    r AS (SELECT lang, pow(n * 1.0 / tot, -0.5) AS raw FROM s CROSS JOIN t),
    c AS (SELECT lang, CAST(round(raw * 1000000.0 / max(raw) OVER ()) AS BIGINT)
                   AS rate_ppm FROM r)
    SELECT d.doc_id, d.lang, c.rate_ppm
    FROM documents d JOIN c USING (lang)
    WHERE ('0x' || substr(md5('tmix-v1:' || CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
          % 1000000 < c.rate_ppm
    """,
)
def llm_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based language rebalancing at alpha=0.5
    (sampling.temperature_sample): the dominant language is downsampled
    toward uniform, rarest keeps rate 1.0. Rates are derived from corpus
    counts and membership from the md5 id-hash, so the oracle recomputes
    both from scratch and must select the identical rows."""
    from delta_rs_spark.functions.sampling import temperature_sample

    docs = _docs(spark, sf_dir).select("doc_id", "lang")
    out, _cuts = temperature_sample(docs, alpha=0.5, source_col="lang")
    return out


def _projection_oracle() -> str:
    planes = S._hyperplanes(64, 16, 7)
    rows = ", ".join(f"({j}, {p!r}::DOUBLE[])" for j, p in enumerate(planes))
    return f"""
    WITH planes(j, p) AS (SELECT * FROM (VALUES {rows}))
    SELECT e.vec_id, planes.j,
           round(list_dot_product(e.embedding::DOUBLE[], planes.p), 4) AS val
    FROM embeddings e CROSS JOIN planes
    """


@query("llm_random_projection", _projection_oracle())
def llm_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss 64d -> 16d compression
    (similarity.random_projection): deterministic LCG planes regenerated
    as SQL literals by the oracle, long-form (vec_id, j, val) output."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.random_projection(emb, dim=64, out_dim=16, seed=7)


_PQ_CB_SQL = r"""
    seeds AS (SELECT * FROM (SELECT row_number() OVER (ORDER BY vec_id ASC) - 1 AS cidx,
                        embedding::DOUBLE[] AS v
                 FROM embeddings ORDER BY vec_id ASC LIMIT 16)),
    subs AS (SELECT unnest(range(0, 8)) AS sub),
    cb AS (SELECT s.sub, seeds.cidx, seeds.v[s.sub*8 + 1 : s.sub*8 + 8] AS c
           FROM seeds CROSS JOIN subs s),
    ev AS (SELECT vec_id, s.sub, (embedding::DOUBLE[])[s.sub*8 + 1 : s.sub*8 + 8] AS vs
           FROM embeddings CROSS JOIN subs s),
    d AS (SELECT ev.vec_id, ev.sub, cb.cidx,
                 list_sum(list_transform(range(1, 9),
                          i -> (ev.vs[i] - cb.c[i]) * (ev.vs[i] - cb.c[i]))) AS d
          FROM ev JOIN cb USING (sub)),
    enc AS (SELECT vec_id, sub, cidx AS code FROM (
              SELECT vec_id, sub, cidx,
                     row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, cidx) AS rn
              FROM d) WHERE rn = 1)
"""


@query(
    "llm_pq_encode",
    f"WITH {_PQ_CB_SQL} SELECT vec_id, sub, code FROM enc",
)
def llm_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization encode (similarity.pq_encode): 64d float ->
    8 codes from per-subspace codebooks seeded by the first 16 vectors
    (deterministic, so the oracle regenerates codebooks, slices, and the
    argmin - ties to lowest code - entirely in SQL)."""
    emb = load_table(spark, sf_dir, "embeddings")
    cbs = S.pq_codebooks(emb, m=8, n_codes=16)
    return S.pq_encode(emb, cbs)


@query(
    "llm_pq_topk",
    f"""
    WITH {_PQ_CB_SQL},
    q AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0),
    qs AS (SELECT s.sub, (SELECT v FROM q)[s.sub*8 + 1 : s.sub*8 + 8] AS vs FROM subs s),
    qd AS (SELECT cb.sub, cb.cidx,
                  list_sum(list_transform(range(1, 9),
                           i -> (qs.vs[i] - cb.c[i]) * (qs.vs[i] - cb.c[i]))) AS d
           FROM cb JOIN qs USING (sub))
    SELECT enc.vec_id AS id, round(sum(qd.d), 4) AS approx_dist
    FROM enc JOIN qd ON enc.sub = qd.sub AND enc.code = qd.cidx
    GROUP BY enc.vec_id
    ORDER BY approx_dist ASC, id ASC
    LIMIT 10
    """,
)
def llm_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes (similarity.pq_topk):
    the query's (subspace, code) distance table is inlined as plan
    literals; per-vector distance is 8 lookups + adds in codegen.
    Deterministic seeding lets the oracle replay encode, the lookup
    table, and the ranked sum exactly."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.pq_topk(emb, _query_vector(spark, sf_dir), k=10, m=8, n_codes=16)


def _pipeline_oracle() -> str:
    count_exprs = []
    for lg, markers in X.LANG_MARKER_TOKENS.items():
        lits = ", ".join(f"'{mk}'" for mk in markers)
        count_exprs.append(
            f"len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> t IN ({lits}))) AS c_{lg}"
        )
    count_exprs.append(f"len(regexp_extract_all(text, '{X.ZH_CHAR_RE}')) AS c_zh")
    counts = ",\n             ".join(count_exprs)
    langs = sorted([*X.LANG_MARKER_TOKENS, "zh"])
    best = "greatest(" + ", ".join(f"c_{lg}" for lg in langs) + ")"
    whens = " ".join(
        f"WHEN c_{lg} > 0 AND c_{lg} = {best} THEN '{lg}'" for lg in langs
    )
    return f"""
    WITH m AS (
      SELECT doc_id,
             {counts},
             len({_TOKENS_SQL})::DOUBLE AS n_tok,
             length(text)::DOUBLE AS n_char,
             len(regexp_extract_all(lower(text), '{X.STOPWORD_RE}'))::DOUBLE AS sw,
             len(regexp_extract_all(text, '[.,;:!?]'))::DOUBLE AS pn,
             {_FP_SQL} AS fp
      FROM documents),
    s AS (SELECT doc_id,
                 CASE {whens} ELSE 'und' END AS lang_pred,
                 round(0.5 * least(n_tok / 64.0, 1.0)
                     + 0.5 * least(sw / greatest(n_tok, 1.0) * 4.0, 1.0)
                     - 0.25 * least(pn / greatest(n_char, 1.0) * 10.0, 1.0), 6) AS quality,
                 CAST(n_tok AS BIGINT) AS n_tokens, fp
          FROM m),
    c AS (SELECT fp, min(doc_id) AS keep_id FROM s GROUP BY fp)
    SELECT s.doc_id, s.lang_pred, s.quality, s.n_tokens,
           (s.doc_id = c.keep_id) AS is_canonical,
           CASE WHEN s.doc_id != c.keep_id THEN 'duplicate'
                WHEN s.lang_pred != 'en' THEN 'lang'
                WHEN s.quality < 0.5 THEN 'low_quality'
                WHEN s.n_tokens < 20 THEN 'too_short'
                WHEN s.n_tokens > 100000 THEN 'too_long'
                ELSE 'kept' END AS reason
    FROM s JOIN c USING (fp)
    """


@query("llm_corpus_pipeline", _pipeline_oracle())
def llm_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed ingest gate (text.corpus_filter_report): dedup
    canonical election -> lang filter -> quality floor -> length bounds,
    one row per doc with the first failing reason. All signals are one
    codegen scan; the only shuffle is the min-id window on the
    fingerprint."""
    docs = _docs(spark, sf_dir)
    return X.corpus_filter_report(
        docs, lang="en", min_quality=0.5, min_tokens=20, max_tokens=100_000
    )


@query(
    "llm_shard_stats",
    f"""
    WITH a AS (SELECT doc_id,
                      CAST(('0x' || substr(md5('shard-v1:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                           % 1000000 % 16 AS INTEGER) AS shard,
                      len({_TOKENS_SQL}) AS n_tok
               FROM documents)
    SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens
    FROM a GROUP BY shard
    """,
)
def llm_shard_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-export shard assignment (sampling.assign_shards): md5
    id-hash mod n_shards, reported as per-shard doc/token totals. The
    mapping is a pure function of (id, salt, n_shards) so the oracle
    recomputes it; write_training_shards materializes the same
    assignment as a shard-partitioned Delta table (pytest-covered:
    partition pruning + determinism)."""
    from delta_rs_spark.functions.sampling import assign_shards

    docs = _docs(spark, sf_dir)
    return (
        assign_shards(docs, n_shards=16)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(X.token_count("text")).cast("long").alias("n_tokens"),
        )
    )


@query(
    "llm_bigram_logprob",
    f"""
    WITH tk AS (SELECT doc_id, {_NE_TOKENS_SQL} AS a FROM documents),
    bg AS (SELECT doc_id,
                  unnest(list_transform(range(1, greatest(len(a), 1)), i -> a[i])) AS w1,
                  unnest(list_transform(range(1, greatest(len(a), 1)), i -> a[i + 1])) AS w2
           FROM tk),
    c2 AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY 1, 2),
    c1 AS (SELECT w1, sum(c) AS cc FROM c2 GROUP BY 1)
    SELECT doc_id, count(*) AS n_bigrams,
           round(avg(ln(c * 1.0 / cc)), 4) AS mean_logprob
    FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
    GROUP BY doc_id
    """,
)
def llm_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM quality scoring (text.bigram_logprob): p(w2|w1) MLE fit
    on the corpus itself, bigrams off the token array (no positional
    self-join), broadcast count tables. Catches scrambled word salads
    that unigram scoring cannot."""
    docs = _docs(spark, sf_dir)
    return X.bigram_logprob(docs)


# --------------------------------------------------------------------------
# r05: gate queries for the previously pytest-only operators
# --------------------------------------------------------------------------

@query(
    "llm_pq_topk_rerank",
    f"""
    WITH {_PQ_CB_SQL},
    q AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0),
    qs AS (SELECT s.sub, (SELECT v FROM q)[s.sub*8 + 1 : s.sub*8 + 8] AS vs FROM subs s),
    qd AS (SELECT cb.sub, cb.cidx,
                  list_sum(list_transform(range(1, 9),
                           i -> (qs.vs[i] - cb.c[i]) * (qs.vs[i] - cb.c[i]))) AS d
           FROM cb JOIN qs USING (sub)),
    shortlist AS (
      SELECT enc.vec_id AS id, round(sum(qd.d), 4) AS approx_dist
      FROM enc JOIN qd ON enc.sub = qd.sub AND enc.code = qd.cidx
      GROUP BY enc.vec_id
      ORDER BY approx_dist ASC, id ASC
      LIMIT 40)
    SELECT e.vec_id AS id,
           round(list_cosine_similarity(e.embedding::DOUBLE[],
                 (SELECT v FROM q)), 4) AS score
    FROM embeddings e JOIN shortlist s ON e.vec_id = s.id
    ORDER BY score DESC, id ASC
    LIMIT 10
    """,
)
def llm_pq_topk_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ shortlist + exact cosine rerank (similarity.pq_topk_rerank):
    ADC over the encoded corpus yields a 40-candidate shortlist, then
    only those rows' raw vectors are re-scored with exact cosine. The
    oracle replays codebooks, encode, the ADC ranking (rounded exactly
    like the operator), and the cosine re-score in SQL."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.pq_topk_rerank(
        emb, _query_vector(spark, sf_dir), k=10, shortlist=40, m=8, n_codes=16
    )


@query(
    "llm_corpus_profile",
    f"""
    WITH m AS (
      SELECT doc_id,
             len({_TOKENS_SQL})::DOUBLE AS n_tok,
             length(text)::DOUBLE AS n_char,
             len(regexp_extract_all(lower(text), '{X.STOPWORD_RE}'))::DOUBLE AS sw,
             len(regexp_extract_all(text, '[.,;:!?]'))::DOUBLE AS pn,
             {_FP_SQL} AS fp
      FROM documents),
    d AS (SELECT n_tok, n_char, fp,
                 round(0.5 * least(n_tok / 64.0, 1.0)
                     + 0.5 * least(sw / greatest(n_tok, 1.0) * 4.0, 1.0)
                     - 0.25 * least(pn / greatest(n_char, 1.0) * 10.0, 1.0), 6) AS q
          FROM m),
    agg AS (SELECT count(*)::DOUBLE AS n_docs,
                   sum(n_tok) AS total_tokens,
                   sum(n_char) AS total_chars,
                   quantile_disc(n_tok, 0.5) AS tokens_p50,
                   quantile_disc(n_tok, 0.9) AS tokens_p90,
                   quantile_disc(n_tok, 0.99) AS tokens_p99,
                   round(avg(q), 6) AS mean_quality,
                   count(DISTINCT fp)::DOUBLE AS n_unique
            FROM d)
    SELECT 'n_docs' AS metric, n_docs AS value FROM agg
    UNION ALL SELECT 'total_tokens', total_tokens FROM agg
    UNION ALL SELECT 'total_chars', total_chars FROM agg
    UNION ALL SELECT 'tokens_p50', tokens_p50 FROM agg
    UNION ALL SELECT 'tokens_p90', tokens_p90 FROM agg
    UNION ALL SELECT 'tokens_p99', tokens_p99 FROM agg
    UNION ALL SELECT 'mean_quality', mean_quality FROM agg
    UNION ALL SELECT 'dup_rate', round((n_docs - n_unique) / n_docs, 6) FROM agg
    """,
)
def llm_corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card summary table (text.corpus_profile): doc/token/char
    totals, token-count quantiles, mean quality, exact-dup rate as
    (metric, value) rows. percentile_approx is exact below its accuracy
    threshold (10k docs >> sf0.01/sf0.1 corpus) and matches DuckDB's
    quantile_disc there, which is what the oracle uses."""
    docs = _docs(spark, sf_dir)
    return X.corpus_profile(docs)


@query(
    "llm_fp_index_probe",
    f"""
    WITH f AS (SELECT doc_id, lang, source, {_FP_SQL} AS fp FROM documents),
    hist AS (SELECT DISTINCT fp FROM f WHERE doc_id % 2 = 0),
    batch AS (SELECT * FROM f WHERE doc_id % 3 = 0),
    fresh AS (SELECT b.* FROM batch b LEFT JOIN hist h USING (fp)
              WHERE h.fp IS NULL),
    keep AS (SELECT doc_id, lang, source,
                    min(doc_id) OVER (PARTITION BY fp) AS k
             FROM fresh)
    SELECT doc_id, lang, source FROM keep WHERE doc_id = k
    """,
)
def llm_fp_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact-dedup: build the fingerprint index over the
    even-doc_id history as a real Delta table, then probe an overlapping
    batch (doc_id % 3 = 0) through dedup_against_fingerprint_index —
    drops batch docs whose fp is already indexed (incl. the % 6 overlap)
    plus within-batch dups (keep-min-id). The oracle replays both the
    anti-join and the keep-first window in SQL."""
    from delta_rs_spark.table import DeltaTable

    docs = _docs(spark, sf_dir).select("doc_id", "lang", "source", "text")
    # the history index is maintained by ingest, not rebuilt per probe:
    # cache it per corpus identity like the ANN indexes above
    path = _ann_index_path(sf_dir, "fp_even", source="documents.parquet")
    if not DeltaTable.is_deltatable(path):
        D.build_fingerprint_index(docs.filter(F.col("doc_id") % 2 == 0), path)
    surv = D.dedup_against_fingerprint_index(
        spark, path, docs.filter(F.col("doc_id") % 3 == 0)
    )
    return surv.select("doc_id", "lang", "source")


@query(
    "llm_band_index_probe",
    f"""
    WITH {_MINHASH_SIG_SQL},
    banded AS (SELECT doc_id, b, sig[4*b+1:4*b+4] AS bsig
               FROM sig CROSS JOIN range(16) r(b)),
    probe AS (SELECT doc_id AS new_id, b, bsig FROM banded WHERE doc_id % 3 = 0),
    hist AS (SELECT doc_id AS index_id, b, bsig FROM banded WHERE doc_id % 2 = 0)
    SELECT DISTINCT new_id, index_id
    FROM probe JOIN hist ON probe.b = hist.b AND probe.bsig = hist.bsig
    WHERE new_id != index_id
    """,
)
def llm_band_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup: build the MinHash band index (64 perms, 16
    bands, md5 hash for the cross-engine oracle) over the even-doc_id
    history, then probe the doc_id % 3 batch through
    near_dup_candidates_against_index — one (band, bucket) join against
    the compact index, never a rescan of historical text. The Spark side
    buckets by xxhash64 over the band's signature slice; the oracle
    joins on the raw slice (identical semantics modulo 64-bit hash
    collisions)."""
    from delta_rs_spark.table import DeltaTable

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    # history index cached per corpus identity (ingest maintains it at
    # production scale); the probe side is recomputed every call
    path = _ann_index_path(sf_dir, "band_even_md5", source="documents.parquet")
    if not DeltaTable.is_deltatable(path):
        D.build_band_index(
            docs.filter(F.col("doc_id") % 2 == 0), path, hash_fn="md5"
        )
    return D.near_dup_candidates_against_index(
        spark, path, docs.filter(F.col("doc_id") % 3 == 0)
    )


def _kmeans_iter_sql(k: int = 8) -> str:
    """Two full Lloyd iterations (assign -> mean -> assign) as CTEs,
    parameterized by k — k=8 is the llm_kmeans_* gates' config, k=16
    replays the IVF recluster refit (sync_ivf_index recluster='auto')."""
    return f"""
    seeds AS (SELECT * FROM (SELECT row_number() OVER (ORDER BY vec_id ASC) - 1 AS ci,
                        embedding::DOUBLE[] AS c
                 FROM embeddings ORDER BY vec_id ASC LIMIT {k})),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    d0 AS (SELECT e.vec_id, s.ci,
                  round(list_sum(list_transform(range(1, 65),
                        i -> (e.v[i] - s.c[i]) * (e.v[i] - s.c[i]))), 4) AS d
           FROM e CROSS JOIN seeds s),
    a0 AS (SELECT vec_id, ci AS cl FROM (
             SELECT vec_id, ci,
                    row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, ci ASC) AS rn
             FROM d0) WHERE rn = 1),
    m1 AS (SELECT a0.cl, r.i, round(avg(e.v[r.i]), 8) AS mv
           FROM a0 JOIN e USING (vec_id) CROSS JOIN range(1, 65) r(i)
           GROUP BY a0.cl, r.i),
    c1l AS (SELECT cl AS ci, list(mv ORDER BY i) AS c FROM m1 GROUP BY cl),
    c1 AS (SELECT s.ci, coalesce(c1l.c, list_transform(s.c, x -> round(x, 8))) AS c
           FROM seeds s LEFT JOIN c1l ON s.ci = c1l.ci),
    d1 AS (SELECT e.vec_id, s.ci,
                  round(list_sum(list_transform(range(1, 65),
                        i -> (e.v[i] - s.c[i]) * (e.v[i] - s.c[i]))), 4) AS d
           FROM e CROSS JOIN c1 s),
    a1 AS (SELECT vec_id, ci AS cl FROM (
             SELECT vec_id, ci,
                    row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, ci ASC) AS rn
             FROM d1) WHERE rn = 1)
"""


_KMEANS_ITER_SQL = _kmeans_iter_sql()


@query(
    "llm_kmeans_clusters",
    f"WITH {_KMEANS_ITER_SQL} SELECT vec_id, cl AS cluster FROM a1",
)
def llm_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means (similarity.kmeans, k=8, 2
    iterations): deterministic first-k seeding, 4dp distance grid with
    lowest-index tie-break, 8dp centroid grid — the oracle replays both
    full iterations (assign -> mean -> assign) in SQL, making this a
    cross-engine check of a distributed ITERATIVE algorithm (like
    llm_duplicate_clusters for graphs)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out, _cents = S.kmeans(emb, k=8, n_iter=2)
    return out


@query(
    "llm_domain_cap",
    f"""
    WITH m AS (
      SELECT doc_id, source,
             len({_TOKENS_SQL})::DOUBLE AS n_tok,
             length(text)::DOUBLE AS n_char,
             len(regexp_extract_all(lower(text), '{X.STOPWORD_RE}'))::DOUBLE AS sw,
             len(regexp_extract_all(text, '[.,;:!?]'))::DOUBLE AS pn
      FROM documents),
    q AS (SELECT doc_id, source,
                 round(0.5 * least(n_tok / 64.0, 1.0)
                     + 0.5 * least(sw / greatest(n_tok, 1.0) * 4.0, 1.0)
                     - 0.25 * least(pn / greatest(n_char, 1.0) * 10.0, 1.0), 6) AS q
          FROM m),
    r AS (SELECT doc_id, source,
                 row_number() OVER (PARTITION BY source ORDER BY q DESC, doc_id ASC) AS rank_in_domain
          FROM q)
    SELECT doc_id, source, CAST(rank_in_domain AS INT) AS rank_in_domain
    FROM r WHERE rank_in_domain <= 20
    """,
)
def llm_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain cap (sampling.domain_cap): keep at most 20 docs per
    source, ranked quality-desc / id-asc. One window shuffle keyed on
    the domain; the oracle replays the quality formula and the rank."""
    docs = _docs(spark, sf_dir)
    capped = SA.domain_cap(docs, cap=20)
    return capped.select(
        "doc_id", "source", F.col("rank_in_domain").cast("int").alias("rank_in_domain")
    )


@query(
    "llm_dedup_keep_best",
    f"""
    WITH RECURSIVE {_JACCARD_EDGES_SQL},
    sym AS (SELECT id_a AS u, id_b AS v FROM edges
            UNION SELECT id_b, id_a FROM edges),
    reach AS (SELECT u, v FROM sym
              UNION SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
    comp AS (SELECT u, min(v) AS mv FROM reach GROUP BY u),
    lab AS (SELECT d.doc_id,
                   least(d.doc_id, coalesce(c.mv, d.doc_id)) AS cluster_id
            FROM documents d LEFT JOIN comp c ON d.doc_id = c.u),
    m AS (SELECT doc_id,
                 len({_TOKENS_SQL})::DOUBLE AS n_tok,
                 length(text)::DOUBLE AS n_char,
                 len(regexp_extract_all(lower(text), '{X.STOPWORD_RE}'))::DOUBLE AS sw,
                 len(regexp_extract_all(text, '[.,;:!?]'))::DOUBLE AS pn
          FROM documents),
    q AS (SELECT doc_id,
                 round(0.5 * least(n_tok / 64.0, 1.0)
                     + 0.5 * least(sw / greatest(n_tok, 1.0) * 4.0, 1.0)
                     - 0.25 * least(pn / greatest(n_char, 1.0) * 10.0, 1.0), 6) AS q
          FROM m),
    r AS (SELECT l.doc_id, l.cluster_id,
                 row_number() OVER (PARTITION BY l.cluster_id ORDER BY q.q DESC, l.doc_id ASC) AS rn
          FROM lab l JOIN q USING (doc_id))
    SELECT doc_id, cluster_id FROM r WHERE rn = 1
    """,
)
def llm_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware duplicate resolution (dedup.resolve_duplicates):
    Jaccard edges -> connected components -> the HIGHEST-quality member
    of each cluster survives (id tie-break), singletons survive as
    themselves. The oracle chains the recursive-CTE components with the
    quality formula and the survivor window."""
    docs = _docs(spark, sf_dir)
    pairs = D.ngram_jaccard_pairs(docs, threshold=0.2, shingle_size=3)
    return D.resolve_duplicates(docs, pairs).select("doc_id", "cluster_id")


@query(
    "llm_kmeans_exemplars",
    f"""
    WITH {_KMEANS_ITER_SQL},
    own AS (SELECT a1.vec_id, a1.cl, d1.d
            FROM a1 JOIN d1 ON a1.vec_id = d1.vec_id AND a1.cl = d1.ci),
    r AS (SELECT vec_id, cl,
                 row_number() OVER (PARTITION BY cl ORDER BY d ASC, vec_id ASC) AS rank_in_cluster
          FROM own)
    SELECT vec_id, CAST(cl AS INT) AS cluster,
           CAST(rank_in_cluster AS INT) AS rank_in_cluster
    FROM r WHERE rank_in_cluster <= 25
    """,
)
def llm_kmeans_exemplars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced sampling (similarity.kmeans_exemplars): the 25
    most central members per kmeans cluster — topic-balanced subset
    selection. The oracle extends the 2-iteration kmeans replay with the
    own-cluster distance rank."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.kmeans_exemplars(emb, k=8, n_iter=2, per_cluster=25)


@query(
    "llm_hard_negatives",
    """
    WITH a AS (SELECT vec_id AS anchor_id, embedding::DOUBLE[] AS av, label AS alabel
               FROM embeddings WHERE vec_id < 20),
    s AS (SELECT a.anchor_id, c.vec_id AS neighbor_id, c.label AS neighbor_label,
                 round(list_cosine_similarity(av, c.embedding::DOUBLE[]), 4) AS score
          FROM a JOIN embeddings c
            ON c.label != a.alabel AND c.vec_id != a.anchor_id),
    r AS (SELECT *, row_number() OVER (PARTITION BY anchor_id
                                       ORDER BY score DESC, neighbor_id ASC) AS rn
          FROM s)
    SELECT anchor_id, neighbor_id, neighbor_label, score FROM r WHERE rn <= 3
    """,
)
def llm_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining (similarity.hard_negatives): top-3 cosine
    neighbors with a DIFFERENT label per anchor — contrastive-training
    data prep. Broadcast anchors, one corpus scan, per-anchor rank."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.hard_negatives(emb, n_anchors=20, k=3)


@query(
    "llm_embedding_outliers",
    f"""
    WITH {_KMEANS_ITER_SQL},
    own AS (SELECT a1.vec_id, a1.cl, d1.d
            FROM a1 JOIN d1 ON a1.vec_id = d1.vec_id AND a1.cl = d1.ci),
    thr AS (SELECT cl, quantile_disc(d, 0.95) AS t FROM own GROUP BY cl)
    SELECT vec_id, CAST(cl AS INT) AS cluster, d AS dist,
           (d > t) AS is_outlier
    FROM own JOIN thr USING (cl)
    """,
)
def llm_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier filter (similarity.embedding_outliers):
    vectors whose own-centroid distance exceeds the cluster's p95 —
    the garbage-embedding screen a pipeline runs before trusting the
    space. percentile_approx is exact at gate group sizes (<=2000 rows
    per cluster << 10k accuracy) and matches DuckDB quantile_disc; the
    oracle replays the 2-iteration kmeans (shared CTE), the own-cluster
    4dp distance, and the per-cluster discrete quantile fence."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.embedding_outliers(emb, k=8, n_iter=2, quantile=0.95)


def _lr_z(w: str) -> str:
    # mirrors the Spark association order exactly:
    # ((w0 + w1*x1) + w2*x2) + w3*x3
    return f"({w}.a0 + {w}.a1 * x1 + {w}.a2 * x2 + {w}.a3 * x3)"


def _lr_grad(z: str) -> str:
    p = f"round(1.0/(1.0+exp(-{z})) * 1000000.0)/1000000.0"
    return f"""count(*)::DOUBLE AS n,
        sum(CAST(round(({p} - y) * 1000000000.0) AS BIGINT)) AS s0,
        sum(CAST(round((({p} - y) * x1) * 1000000000.0) AS BIGINT)) AS s1,
        sum(CAST(round((({p} - y) * x2) * 1000000000.0) AS BIGINT)) AS s2,
        sum(CAST(round((({p} - y) * x3) * 1000000000.0) AS BIGINT)) AS s3"""


@query(
    "llm_quality_classifier",
    f"""
    WITH m AS (
      SELECT doc_id, lang,
             len({_TOKENS_SQL})::DOUBLE AS n_tok,
             length(text)::DOUBLE AS n_char,
             len(regexp_extract_all(lower(text), '{X.STOPWORD_RE}'))::DOUBLE AS sw,
             len(regexp_extract_all(text, '[.,;:!?]'))::DOUBLE AS pn
      FROM documents),
    f AS (SELECT doc_id,
             CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
             least(n_tok / 64.0, 1.0) AS x1,
             least(sw / greatest(n_tok, 1.0) * 4.0, 1.0) AS x2,
             least(pn / greatest(n_char, 1.0) * 10.0, 1.0) AS x3
          FROM m),
    w0 AS (SELECT 0.0 AS a0, 0.0 AS a1, 0.0 AS a2, 0.0 AS a3),
    g1 AS (SELECT {_lr_grad(_lr_z('w0'))} FROM f CROSS JOIN w0),
    w1 AS (SELECT w0.a0 - 0.5 * (CAST(g1.s0 AS DOUBLE)/1000000000.0/g1.n) AS a0,
                  w0.a1 - 0.5 * (CAST(g1.s1 AS DOUBLE)/1000000000.0/g1.n) AS a1,
                  w0.a2 - 0.5 * (CAST(g1.s2 AS DOUBLE)/1000000000.0/g1.n) AS a2,
                  w0.a3 - 0.5 * (CAST(g1.s3 AS DOUBLE)/1000000000.0/g1.n) AS a3
           FROM g1 CROSS JOIN w0),
    g2 AS (SELECT {_lr_grad(_lr_z('w1'))} FROM f CROSS JOIN w1),
    w2 AS (SELECT w1.a0 - 0.5 * (CAST(g2.s0 AS DOUBLE)/1000000000.0/g2.n) AS a0,
                  w1.a1 - 0.5 * (CAST(g2.s1 AS DOUBLE)/1000000000.0/g2.n) AS a1,
                  w1.a2 - 0.5 * (CAST(g2.s2 AS DOUBLE)/1000000000.0/g2.n) AS a2,
                  w1.a3 - 0.5 * (CAST(g2.s3 AS DOUBLE)/1000000000.0/g2.n) AS a3
           FROM g2 CROSS JOIN w1),
    scored AS (SELECT doc_id,
                      round(1.0/(1.0+exp(-{_lr_z('w2')})), 6) AS score
               FROM f CROSS JOIN w2)
    SELECT doc_id, score, score >= 0.5 AS is_quality FROM scored
    """,
)
def llm_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed logistic-regression quality classifier
    (text.train_quality_classifier + score): 2 full-batch GD iterations
    over (bias, length, stopword, punctuation) features with lang='en'
    as the stand-in label, then a scoring pass. The oracle replays BOTH
    iterations in SQL — per-row gradients quantized to BIGINT on a 1e9
    grid (order-independent sums), the sigmoid snapped to a 1e-6 grid
    (the only non-IEEE op), weight updates as the identical IEEE
    expression chain — making this the text-plane sibling of the
    llm_kmeans_clusters iterative-algorithm check."""
    docs = _docs(spark, sf_dir)
    # one regex feature pass instead of three (2 GD iterations + score):
    # the persisted frame is 3 doubles + label + id per doc
    feats = X.quality_feature_frame(docs, F.col("lang") == "en").persist()
    w = X.train_quality_classifier(docs, F.col("lang") == "en", features=feats)
    return X.score_quality_classifier(docs, w, features=feats)


@query(
    "llm_ann_recall",
    """
    WITH cents AS (SELECT row_number() OVER (ORDER BY vec_id ASC) - 1 AS i,
                          embedding::DOUBLE[] AS c
                   FROM embeddings ORDER BY vec_id ASC LIMIT 16),
    scored AS (SELECT e.vec_id, c.i,
                      list_cosine_similarity(e.embedding::DOUBLE[], c.c) AS s
               FROM embeddings e CROSS JOIN cents c),
    assign AS (SELECT vec_id, i AS lst FROM (
        SELECT vec_id, i,
               row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, i DESC) AS rn
        FROM scored) WHERE rn = 1),
    anch AS (SELECT vec_id AS anchor_id, embedding::DOUBLE[] AS av
             FROM embeddings WHERE vec_id < 20),
    aprobe AS (SELECT anchor_id, i AS lst FROM (
        SELECT a.anchor_id, c.i,
               row_number() OVER (PARTITION BY a.anchor_id
                 ORDER BY list_dot_product(a.av, c.c) / sqrt(list_dot_product(c.c, c.c)) DESC,
                          c.i ASC) AS rn
        FROM anch a CROSS JOIN cents c) WHERE rn <= 4),
    ex AS (SELECT a.anchor_id, e.vec_id AS nb,
                  round(list_cosine_similarity(e.embedding::DOUBLE[], a.av), 4) AS s
           FROM anch a JOIN embeddings e ON e.vec_id != a.anchor_id),
    exk AS (SELECT anchor_id, nb FROM (
        SELECT anchor_id, nb,
               row_number() OVER (PARTITION BY anchor_id ORDER BY s DESC, nb ASC) AS rn
        FROM ex) WHERE rn <= 10),
    annc AS (SELECT p.anchor_id, ag.vec_id AS nb,
                    round(list_cosine_similarity(e.embedding::DOUBLE[], a.av), 4) AS s
             FROM aprobe p
             JOIN assign ag ON ag.lst = p.lst
             JOIN embeddings e ON e.vec_id = ag.vec_id
             JOIN anch a ON a.anchor_id = p.anchor_id
             WHERE ag.vec_id != p.anchor_id),
    annk AS (SELECT anchor_id, nb FROM (
        SELECT anchor_id, nb,
               row_number() OVER (PARTITION BY anchor_id ORDER BY s DESC, nb ASC) AS rn
        FROM annc) WHERE rn <= 10),
    hits AS (SELECT anchor_id, count(*) AS n_hits
             FROM exk JOIN annk USING (anchor_id, nb) GROUP BY anchor_id)
    SELECT a.anchor_id,
           CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
           round(CAST(coalesce(h.n_hits, 0) AS DOUBLE) / 10.0, 4) AS recall
    FROM (SELECT anchor_id FROM anch) a LEFT JOIN hits h USING (anchor_id)
    """,
)
def llm_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index-quality eval (similarity.ann_recall): recall@10 of the
    IVF probe path vs exact cosine over the first 20 anchors — the
    check a pipeline runs before trusting an approximate index for
    dedup/retrieval. The oracle replays BOTH pipelines (assignment,
    probe ranking, the two top-k rankings, the intersection) in SQL."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.ann_recall(emb, n_anchors=20, k=10, n_lists=16, n_probe=4)


@query(
    "llm_span_dedup",
    f"""
    WITH corpus AS (SELECT doc_id, text FROM documents
                    UNION ALL
                    SELECT doc_id + 1000000 AS doc_id, text FROM documents),
    w AS (SELECT doc_id, list_filter({_TOKENS_SQL}, t -> t != '') AS ws FROM corpus),
    g AS (SELECT doc_id, ws, len(ws) AS n FROM w),
    wl AS (SELECT doc_id,
                  list_transform(range(1, n - 6),
                                 i -> array_to_string(ws[i:i+7], ' ')) AS grams
           FROM g WHERE n >= 8),
    wins AS (SELECT doc_id, unnest(grams) AS gram,
                    unnest(range(0, len(grams))) AS pos
             FROM wl),
    fl0 AS (SELECT doc_id, pos,
                   count(*) OVER (PARTITION BY gram) AS c,
                   row_number() OVER (PARTITION BY gram
                                      ORDER BY doc_id, pos) AS rn
            FROM wins),
    fl AS (SELECT doc_id, pos FROM fl0 WHERE c >= 2 AND rn >= 2),
    isl AS (SELECT doc_id, pos,
                   sum(CASE WHEN prev IS NULL OR pos - prev > 8
                            THEN 1 ELSE 0 END)
                     OVER (PARTITION BY doc_id ORDER BY pos) AS island
            FROM (SELECT doc_id, pos,
                         lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
                  FROM fl)),
    spans AS (SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e
              FROM isl GROUP BY doc_id, island),
    rmd AS (SELECT DISTINCT doc_id, unnest(range(s, e + 1)) AS p FROM spans),
    t AS (SELECT doc_id, unnest(ws) AS tok, unnest(range(0, len(ws))) AS pos
          FROM w),
    per AS (SELECT t.doc_id,
                   CAST(count(*) AS BIGINT) AS n_tokens,
                   CAST(sum(CASE WHEN rmd.p IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_removed,
                   coalesce(string_agg(CASE WHEN rmd.p IS NULL THEN t.tok END,
                                       ' ' ORDER BY t.pos), '') AS clean_text
            FROM t LEFT JOIN rmd ON t.doc_id = rmd.doc_id AND t.pos = rmd.p
            GROUP BY t.doc_id)
    SELECT w.doc_id,
           coalesce(per.n_tokens, 0) AS n_tokens,
           coalesce(per.n_removed, 0) AS n_removed,
           coalesce(per.clean_text, '') AS clean_text
    FROM w LEFT JOIN per USING (doc_id)
    """,
)
def llm_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup (dedup.strip_duplicate_spans): every 8-token
    window occurring >= 2 times corpus-wide is flagged, flagged windows
    merge into maximal spans, and all-but-the-first occurrence is
    stripped from the rebuilt text — the suffix-array substring pass of
    Lee et al. 2021 as rolling-window fingerprint matching. Run over the
    corpus unioned with an id-shifted copy: every copy must strip to
    empty while originals keep their text (modulo natural intra-corpus
    duplicates). The oracle replays windowing, the global
    count/first-occurrence rank, island merging, and token-level removal
    in SQL."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    doubled = docs.union(
        docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    )
    return D.strip_duplicate_spans(
        doubled, window=8, min_count=2, keep_first=True
    )


@query(
    "llm_sq8_topk",
    """
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    d AS (SELECT vec_id, unnest(e) AS x, unnest(range(1, len(e) + 1)) AS i FROM v),
    b AS (SELECT i, min(x) AS mn, max(x) AS mx FROM d GROUP BY i),
    c AS (SELECT d.vec_id, d.i,
                 CASE WHEN b.mx = b.mn THEN 0
                      ELSE floor((d.x - b.mn) / (b.mx - b.mn) * 255.0 + 0.5) END
                   AS code,
                 b.mn, b.mx
          FROM d JOIN b USING (i)),
    dq AS (SELECT vec_id, i, mn + code * (mx - mn) / 255.0 AS y FROM c),
    q AS (SELECT unnest(e) AS qx, unnest(range(1, len(e) + 1)) AS i
          FROM v WHERE vec_id = 0),
    s AS (SELECT dq.vec_id, sum(dq.y * q.qx) AS dp, sum(dq.y * dq.y) AS n2
          FROM dq JOIN q USING (i) GROUP BY dq.vec_id),
    qn AS (SELECT sqrt(sum(qx * qx)) AS qn FROM q)
    SELECT vec_id AS id,
           round(dp / (sqrt(n2) * (SELECT qn FROM qn)), 4) AS score
    FROM s
    ORDER BY score DESC, id ASC
    LIMIT 10
    """,
)
def llm_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantized (int8) approximate top-k (similarity.sq8_topk):
    per-dimension min/max bounds aggregate -> 0..255 codes -> asymmetric
    cosine of dequantized vectors vs the full-precision query. The
    oracle replays bounds, the half-up quantization grid, dequantization
    and the ranked cosine in SQL."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.sq8_topk(emb, _query_vector(spark, sf_dir), k=10)


_HASH_BUCKET_SQL = "('0x' || substr(md5(g), 1, 15))::BIGINT % 64"


@query(
    "llm_hashed_classifier",
    f"""
    WITH tk AS (SELECT doc_id, lang, list_filter({_TOKENS_SQL}, t -> t != '') AS ws
                FROM documents),
    gr AS (SELECT doc_id,
                  list_concat(ws,
                    CASE WHEN len(ws) >= 2
                         THEN list_transform(range(1, len(ws)),
                                             i -> ws[i] || ' ' || ws[i+1])
                         ELSE []::VARCHAR[] END) AS gs
           FROM tk),
    ex AS (SELECT doc_id, len(gs) AS tot, unnest(gs) AS g FROM gr),
    sp0 AS (SELECT doc_id, {_HASH_BUCKET_SQL} AS bucket,
                   count(*)::DOUBLE / max(tot)::DOUBLE AS x
            FROM ex GROUP BY 1, 2),
    -- intercept row per doc: the bias is feature bucket -1 with x = 1
    spb AS (SELECT doc_id, bucket, x FROM sp0
            UNION ALL
            SELECT doc_id, -1 AS bucket, 1.0 AS x FROM documents),
    ydoc AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
             FROM documents),
    n0 AS (SELECT count(*)::DOUBLE AS n FROM documents),
    -- iteration 1: all weights 0 -> z = 0 -> p = 0.5 exactly
    g1 AS (SELECT spb.bucket,
                  sum(CAST(round(((0.5 - y) * x) * 1000000000.0) AS BIGINT)) AS s
           FROM spb JOIN ydoc USING (doc_id) GROUP BY 1),
    w1 AS (SELECT bucket,
                  0.0 - 0.5 * (CAST(g1.s AS DOUBLE) / 1000000000.0 / n0.n) AS w
           FROM g1 CROSS JOIN n0),
    -- iteration 2
    zq2 AS (SELECT spb.doc_id,
                   sum(CAST(round(w1.w * spb.x * 1000000000.0) AS BIGINT)) AS zq
            FROM spb JOIN w1 USING (bucket) GROUP BY 1),
    d2 AS (SELECT ydoc.doc_id,
                  round((1.0 / (1.0 + exp(-(CAST(zq2.zq AS DOUBLE) / 1000000000.0)))) * 1000000.0) / 1000000.0 - ydoc.y AS d
           FROM ydoc JOIN zq2 USING (doc_id)),
    g2 AS (SELECT spb.bucket,
                  sum(CAST(round((d2.d * spb.x) * 1000000000.0) AS BIGINT)) AS s
           FROM spb JOIN d2 USING (doc_id) GROUP BY 1),
    w2 AS (SELECT w1.bucket,
                  w1.w - 0.5 * (CAST(g2.s AS DOUBLE) / 1000000000.0 / n0.n) AS w
           FROM w1 JOIN g2 USING (bucket) CROSS JOIN n0),
    -- scoring pass with the trained model
    zq3 AS (SELECT spb.doc_id,
                   sum(CAST(round(w2.w * spb.x * 1000000000.0) AS BIGINT)) AS zq
            FROM spb JOIN w2 USING (bucket) GROUP BY 1)
    SELECT doc_id,
           round(1.0 / (1.0 + exp(-(CAST(zq AS DOUBLE) / 1000000000.0))), 6)
             AS score,
           round(1.0 / (1.0 + exp(-(CAST(zq AS DOUBLE) / 1000000000.0))), 6) >= 0.5
             AS is_match
    FROM zq3
    """,
)
def llm_hashed_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashed n-gram classifier (text.train_hashed_classifier +
    score): fastText-shaped hashing trick — unigram+bigram md5 buckets
    (D=64), normalized counts, 2 full-batch GD iterations with lang='en'
    as the stand-in label, then a scoring pass. The intercept is feature
    bucket -1 (x=1 on every doc), making logit and gradient single
    uniform aggregations — one job per training iteration — and BOTH are
    quantized to BIGINT on a 1e9 grid (order-independent partial
    aggregation). The hashed feature frame is built once, persisted, and
    shared by training and scoring. The oracle replays hashing, both
    iterations, and scoring entirely in SQL."""
    docs = _docs(spark, sf_dir)
    sp = X.hashed_ngram_features(docs, n_buckets=64).persist()
    bias, w = X.train_hashed_classifier(
        docs, F.col("lang") == "en", n_buckets=64, features=sp
    )
    return X.score_hashed_classifier(docs, bias, w, features=sp)


def _bpe_oracle(n_merges: int) -> str:
    """BPE replay: per round, count adjacent pairs (freq-weighted), pick
    the argmax (tie -> space-joined pair string, == tuple order since
    symbols are space-free), then apply the left-to-right
    non-overlapping merge via the candidate-run parity rewrite (within
    each run of consecutive candidate starts, the scan merges offsets
    0, 2, 4, ...)."""
    blocks = [
        f"""
    w0 AS (SELECT w, count(*)::BIGINT AS freq FROM
             (SELECT unnest(list_filter({_TOKENS_SQL}, t -> t != '')) AS w
              FROM documents)
           GROUP BY w),
    s0 AS (SELECT w, freq, unnest(regexp_extract_all(w, '.')) AS sym,
                  unnest(range(0, len(regexp_extract_all(w, '.')))) AS pos
           FROM w0)"""
    ]
    for i in range(n_merges):
        blocks.append(f"""
    p{i} AS (SELECT pair, sum(freq) AS n FROM (
               SELECT freq,
                      sym || ' ' || lead(sym) OVER (PARTITION BY w ORDER BY pos)
                        AS pair
               FROM s{i})
             WHERE pair IS NOT NULL GROUP BY pair),
    t{i} AS (SELECT split_part(pair, ' ', 1) AS a, split_part(pair, ' ', 2) AS b
             FROM p{i} ORDER BY n DESC, pair ASC LIMIT 1),
    c{i} AS (SELECT s.w, s.pos
             FROM s{i} s
             JOIN s{i} s2 ON s.w = s2.w AND s2.pos = s.pos + 1
             CROSS JOIN t{i} t
             WHERE s.sym = t.a AND s2.sym = t.b),
    r{i} AS (SELECT w, pos,
                    pos - row_number() OVER (PARTITION BY w ORDER BY pos) AS rid
             FROM c{i}),
    v{i} AS (SELECT w, pos FROM
               (SELECT w, pos, min(pos) OVER (PARTITION BY w, rid) AS p0
                FROM r{i})
             WHERE (pos - p0) % 2 = 0),
    s{i + 1} AS (SELECT w, freq,
                        row_number() OVER (PARTITION BY w ORDER BY pos) - 1 AS pos,
                        sym
                 FROM (SELECT s.w, s.freq, s.pos,
                              CASE WHEN v.pos IS NOT NULL THEN t.a || t.b
                                   ELSE s.sym END AS sym
                       FROM s{i} s
                       CROSS JOIN t{i} t
                       LEFT JOIN v{i} v ON s.w = v.w AND s.pos = v.pos
                       LEFT JOIN v{i} v2 ON s.w = v2.w AND s.pos = v2.pos + 1
                       WHERE v2.pos IS NULL))""")
    return (
        "WITH" + ",".join(blocks) + f"""
    SELECT sym AS symbol, CAST(sum(freq) AS BIGINT) AS n
    FROM s{n_merges} GROUP BY sym
    """
    )


@query("llm_bpe_vocab", _bpe_oracle(3))
def llm_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE vocabulary induction (vocab.bpe_learn +
    bpe_vocab): 3 merge rounds over the corpus word-frequency table —
    pair counting is an explode + integer-sum aggregation over DISTINCT
    words (vocabulary-sized, not corpus-sized), only the winning pair
    crosses the driver per round, and the merge scan is a JVM array
    fold. The oracle replays every round: pair counts, the
    deterministically tie-broken argmax, and the non-overlapping merge
    via the candidate-run parity rewrite. Output = the final subword
    vocabulary with corpus frequencies."""
    from delta_rs_spark.functions.vocab import bpe_learn, bpe_vocab, word_table

    docs = _docs(spark, sf_dir)
    # ONE corpus tokenize pass: learner and vocabulary reporter share
    # the persisted (vocabulary-sized) word-frequency table
    words = word_table(docs).persist()
    merges = bpe_learn(docs, n_merges=3, words=words)
    return bpe_vocab(docs, merges, words=words)


@query(
    "llm_quality_calibration",
    f"""
    WITH m AS (
      SELECT doc_id, source,
             len({_TOKENS_SQL})::DOUBLE AS n_tok,
             length(text)::DOUBLE AS n_char,
             len(regexp_extract_all(lower(text), '{X.STOPWORD_RE}'))::DOUBLE AS sw,
             len(regexp_extract_all(text, '[.,;:!?]'))::DOUBLE AS pn
      FROM documents),
    s AS (SELECT doc_id, source,
                 round(0.5 * least(n_tok / 64.0, 1.0)
                     + 0.5 * least(sw / greatest(n_tok, 1.0) * 4.0, 1.0)
                     - 0.25 * least(pn / greatest(n_char, 1.0) * 10.0, 1.0), 6)
                   AS score
          FROM m),
    r AS (SELECT doc_id, source, score,
                 round(percent_rank() OVER (PARTITION BY source
                                            ORDER BY score ASC, doc_id ASC), 6)
                   AS pct
          FROM s)
    SELECT doc_id, source, score, pct, pct >= 0.5 AS keep FROM r
    """,
)
def llm_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quality calibration (sampling.calibrate_quality_per_
    source): raw quality scores replaced by their percentile rank WITHIN
    each source, top half of every source kept — the mix-preserving
    quality cut (global raw-score filtering would skew the mix toward
    the domain whose score distribution sits highest). Oracle replays
    scoring, the per-source percent_rank with the deterministic
    (score, id) ordering, and the fence."""
    docs = _docs(spark, sf_dir)
    return SA.calibrate_quality_per_source(docs, keep_frac=0.5)


_CLEAN_TOKENS_SQL = f"list_filter({_TOKENS_SQL}, t -> t != '')"


@query(
    "llm_bm25_topk",
    f"""
    WITH post AS (
      SELECT doc_id, term, count(*)::BIGINT AS tf, max(dl)::BIGINT AS dl FROM (
        SELECT doc_id,
               len({_CLEAN_TOKENS_SQL})::BIGINT AS dl,
               unnest({_CLEAN_TOKENS_SQL}) AS term
        FROM documents)
      GROUP BY doc_id, term),
    scal AS (SELECT count(*)::DOUBLE AS n,
                    (sum(len({_CLEAN_TOKENS_SQL}))::DOUBLE)
                      / (count(*)::DOUBLE) AS avgdl
             FROM documents),
    q AS (SELECT DISTINCT query_id, term FROM (
            SELECT doc_id AS query_id,
                   unnest(list_slice({_CLEAN_TOKENS_SQL}, 1, 6)) AS term
            FROM (SELECT doc_id, text FROM documents
                  ORDER BY doc_id ASC LIMIT 4))),
    dfreq AS (SELECT p.term, count(*)::BIGINT AS df
              FROM post p GROUP BY p.term),
    idf AS (SELECT d.term,
                   round(ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
                         * 1000000.0) / 1000000.0 AS idf
            FROM dfreq d CROSS JOIN scal s
            WHERE d.term IN (SELECT term FROM q)),
    contrib AS (
      SELECT q.query_id, p.doc_id,
             round(i.idf * ((p.tf::DOUBLE * 2.2)
                   / (p.tf::DOUBLE
                      + 1.2 * (0.25 + 0.75 * (p.dl::DOUBLE / s.avgdl))))
                   * 1000000000.0)::BIGINT AS c
      FROM post p
      JOIN q ON p.term = q.term
      JOIN idf i ON p.term = i.term
      CROSS JOIN scal s),
    sc AS (SELECT query_id, doc_id, sum(c)::BIGINT AS score_q
           FROM contrib GROUP BY query_id, doc_id),
    r AS (SELECT query_id, doc_id, score_q,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY score_q DESC, doc_id ASC)
                   AS rank
          FROM sc)
    SELECT query_id, rank::BIGINT AS rank, doc_id,
           round(score_q::DOUBLE / 1000000000.0, 6) AS score
    FROM r WHERE rank <= 10
    """,
)
def llm_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 retrieval (retrieval.bm25_topk): the 4 lowest-id
    docs' first 6 tokens form the query set; one inverted-index pass
    over the corpus scores all queries at once (queries broadcast into
    the postings scan — the corpus is never rescanned per query). IDF
    is snapped to a 1e-6 grid, per-(query,doc,term) contributions are
    BIGINT-quantized on a 1e9 grid, and ranking is (score_q DESC,
    doc_id ASC) — the oracle replays postings, scalars, IDF, scoring
    and the cut exactly."""
    from delta_rs_spark.functions.retrieval import bm25_topk, head_term_queries

    docs = _docs(spark, sf_dir)
    return bm25_topk(docs, head_term_queries(docs, n_queries=4, n_terms=6), k=10)


@query(
    "llm_importance_resampling",
    f"""
    WITH tr AS (SELECT doc_id, source = 'src0' AS is_tgt,
                       unnest({_CLEAN_TOKENS_SQL}) AS term
                FROM documents),
    cnt AS (SELECT term, count(*)::BIGINT AS n_raw,
                   sum(CASE WHEN is_tgt THEN 1 ELSE 0 END)::BIGINT AS n_tgt
            FROM tr GROUP BY term),
    vocab AS (SELECT term, n_raw, n_tgt FROM cnt
              ORDER BY n_raw DESC, term ASC LIMIT 128),
    tot AS (SELECT sum(n_raw)::DOUBLE AS traw, sum(n_tgt)::DOUBLE AS ttgt
            FROM vocab),
    lam AS (SELECT v.term,
                   round(ln(((v.n_tgt::DOUBLE + 1.0) / (t.ttgt + 128.0))
                            / ((v.n_raw::DOUBLE + 1.0) / (t.traw + 128.0)))
                         * 1000000.0) / 1000000.0 AS lam
            FROM vocab v CROSS JOIN tot t),
    dt AS (SELECT doc_id, term, count(*)::BIGINT AS tf
           FROM tr GROUP BY doc_id, term),
    pd AS (SELECT dt.doc_id,
                  sum(round(dt.tf::DOUBLE * l.lam * 1000000000.0)::BIGINT)::BIGINT
                    AS sum_q,
                  sum(dt.tf)::BIGINT AS n_vocab_tokens
           FROM dt JOIN lam l ON dt.term = l.term
           GROUP BY dt.doc_id),
    j AS (SELECT d.doc_id,
                 coalesce(pd.n_vocab_tokens, 0)::BIGINT AS n_vocab_tokens,
                 coalesce(round(pd.sum_q::DOUBLE
                                / (pd.n_vocab_tokens::DOUBLE * 1000.0))::BIGINT
                          / 1000000.0, 0.0) AS weight
          FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id),
    r AS (SELECT doc_id, n_vocab_tokens, weight,
                 round(percent_rank() OVER (ORDER BY weight ASC, doc_id ASC), 6)
                   AS pct
          FROM j)
    SELECT doc_id, n_vocab_tokens, weight, pct, pct >= 0.5 AS keep FROM r
    """,
)
def llm_importance_resampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance resampling (sampling.importance_resampling):
    target domain = source 'src0'; vocabulary = top-128 corpus terms;
    per-doc weight = mean in-vocab ln(p_tgt/p_raw), top half kept. The
    log-ratio is 1e-6-grid snapped per term and contributions are
    BIGINT-quantized, so the oracle replays vocabulary selection,
    smoothing, scoring and the percentile cut bit-for-bit."""
    docs = _docs(spark, sf_dir)
    return SA.importance_resampling(
        docs, F.col("source") == "src0", vocab_size=128, keep_frac=0.5
    )


@query(
    "llm_length_buckets",
    f"""
    WITH d AS (SELECT doc_id,
                      len({_CLEAN_TOKENS_SQL})::BIGINT AS n_tok
               FROM documents),
    r AS (SELECT (n_tok // 32)::BIGINT AS bucket, n_tok,
                 row_number() OVER (PARTITION BY (n_tok // 32)
                                    ORDER BY n_tok DESC, doc_id ASC) AS rn
          FROM d)
    SELECT bucket, ((rn - 1) // 8)::BIGINT AS batch_id,
           count(*)::BIGINT AS n_docs,
           max(n_tok)::BIGINT AS max_tok,
           sum(n_tok)::BIGINT AS sum_tok,
           (count(*) * max(n_tok) - sum(n_tok))::BIGINT AS padding
    FROM r GROUP BY bucket, ((rn - 1) // 8)
    """,
)
def llm_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch assembly (packing.length_bucket_batches):
    32-token buckets, 8-doc batches filled longest-first with id
    tie-break, per-batch padding-waste accounting. All-integer
    arithmetic; the oracle replays bucketing, the in-bucket window and
    the batch aggregation."""
    from delta_rs_spark.functions.packing import length_bucket_batches

    docs = _docs(spark, sf_dir).select(
        "doc_id", X.token_count("text").cast("long").alias("n_tokens")
    )
    return length_bucket_batches(docs, bucket_width=32, batch_size=8)


@query(
    "llm_perplexity_buckets",
    f"""
    WITH tk AS (SELECT doc_id, {_NE_TOKENS_SQL} AS a FROM documents),
    bg AS (SELECT doc_id,
                  unnest(list_transform(range(1, greatest(len(a), 1)), i -> a[i])) AS w1,
                  unnest(list_transform(range(1, greatest(len(a), 1)), i -> a[i + 1])) AS w2
           FROM tk),
    c2 AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY 1, 2),
    c1 AS (SELECT w1, sum(c) AS cc FROM c2 GROUP BY 1),
    sc AS (SELECT doc_id, round(avg(ln(c * 1.0 / cc)), 4) AS mean_logprob
           FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
           GROUP BY doc_id),
    lb AS (SELECT s.doc_id, d.source, s.mean_logprob,
                  round(percent_rank() OVER (
                          PARTITION BY d.source
                          ORDER BY s.mean_logprob DESC, s.doc_id ASC), 6)
                    AS pct
           FROM sc s JOIN documents d USING (doc_id))
    SELECT doc_id, source, mean_logprob, pct,
           CASE WHEN pct < 1.0 / 3.0 THEN 'head'
                WHEN pct < 2.0 / 3.0 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM lb
    """,
)
def llm_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style head/middle/tail perplexity tiers (text.perplexity_
    buckets): corpus-fit bigram-LM score per doc, percent_rank WITHIN
    source (best score first), thirds labeled. The oracle replays the
    LM fit, scoring, per-source ranking and the fences."""
    docs = _docs(spark, sf_dir)
    return X.perplexity_buckets(docs)


@query(
    "llm_token_budget_cap",
    f"""
    WITH m AS (
      SELECT doc_id, source,
             len({_TOKENS_SQL})::DOUBLE AS n_tok,
             length(text)::DOUBLE AS n_char,
             len(regexp_extract_all(lower(text), '{X.STOPWORD_RE}'))::DOUBLE AS sw,
             len(regexp_extract_all(text, '[.,;:!?]'))::DOUBLE AS pn
      FROM documents),
    s AS (SELECT doc_id, source, n_tok::BIGINT AS n_tokens,
                 round(0.5 * least(n_tok / 64.0, 1.0)
                     + 0.5 * least(sw / greatest(n_tok, 1.0) * 4.0, 1.0)
                     - 0.25 * least(pn / greatest(n_char, 1.0) * 10.0, 1.0), 6)
                   AS score
          FROM m),
    r AS (SELECT doc_id, source, n_tokens,
                 sum(n_tokens) OVER (PARTITION BY source
                                     ORDER BY score DESC, doc_id ASC
                                     ROWS UNBOUNDED PRECEDING)::BIGINT
                   AS cum_tokens
          FROM s)
    SELECT doc_id, source, n_tokens, cum_tokens,
           cum_tokens <= (CASE source WHEN 'src0' THEN 5000
                                      WHEN 'src1' THEN 3000
                                      ELSE 2000 END) AS keep
    FROM r
    """,
)
def llm_token_budget_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token budgets (sampling.token_budget_cap): quality-
    ranked greedy prefix per source until the source's token budget is
    hit — the token-denominated mixing primitive (domain_cap bounds
    documents; mixes are specified in tokens). All-integer cumsum; the
    oracle replays scoring, the running total, and the budget fence."""
    docs = _docs(spark, sf_dir)
    return SA.token_budget_cap(
        docs, {"src0": 5000, "src1": 3000}, default_budget=2000
    )


@query(
    "llm_epoch_permutation",
    f"""
    WITH a AS (SELECT doc_id,
                      ('0x' || substr(md5('epoch-0:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                        % 1000000 AS h
               FROM documents)
    SELECT doc_id,
           CAST(h % 16 AS INTEGER) AS shard,
           (row_number() OVER (PARTITION BY h % 16
                               ORDER BY h ASC, doc_id ASC) - 1)::BIGINT AS pos
    FROM a
    """,
)
def llm_epoch_permutation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch ordering (sampling.epoch_permutation):
    (shard, pos) from the id's md5 bucket — reproducible training order
    with no RNG state, re-shuffled per epoch by changing the salt. The
    oracle recomputes the hash, the shard split, and the within-shard
    rank."""
    docs = _docs(spark, sf_dir)
    return SA.epoch_permutation(docs, n_shards=16, salt="epoch-0")


@query(
    "llm_source_divergence",
    f"""
    WITH tr AS (SELECT source, unnest({_NE_TOKENS_SQL}) AS term FROM documents),
    st AS (SELECT source, term, count(*)::BIGINT AS n_st FROM tr GROUP BY 1, 2),
    corpus AS (SELECT term, sum(n_st)::BIGINT AS n_t FROM st GROUP BY 1),
    vocab AS (SELECT term, n_t FROM corpus ORDER BY n_t DESC, term ASC LIMIT 128),
    tc AS (SELECT sum(n_t)::DOUBLE AS tot FROM vocab),
    sv AS (SELECT st.source, st.term, st.n_st FROM st JOIN vocab USING (term)),
    -- driven from the docs table: a fully out-of-vocab source keeps a
    -- row with n_s = 0 (pure-smoothing KL) instead of vanishing
    stot AS (SELECT d.source, coalesce(s.n_s, 0)::BIGINT AS n_s
             FROM (SELECT DISTINCT source FROM documents) d
             LEFT JOIN (SELECT source, sum(n_st)::BIGINT AS n_s
                        FROM sv GROUP BY 1) s USING (source)),
    grid AS (SELECT s.source, s.n_s, v.term, v.n_t,
                    coalesce(x.n_st, 0)::BIGINT AS n_st
             FROM stot s CROSS JOIN vocab v
             LEFT JOIN sv x ON x.source = s.source AND x.term = v.term),
    c AS (SELECT source, n_s,
                 round(((n_st::DOUBLE + 1.0) / (n_s::DOUBLE + 128.0))
                       * (round(ln(((n_st::DOUBLE + 1.0) / (n_s::DOUBLE + 128.0))
                                   / ((n_t::DOUBLE + 1.0)
                                      / ((SELECT tot FROM tc) + 128.0)))
                                * 1000000.0) / 1000000.0)
                       * 1000000000.0)::BIGINT AS cq
          FROM grid),
    ps AS (SELECT source, max(n_s)::BIGINT AS n_vocab_tokens,
                  sum(cq)::BIGINT AS kl_q
           FROM c GROUP BY 1),
    d AS (SELECT source, count(*)::BIGINT AS n_docs FROM documents GROUP BY 1)
    SELECT ps.source, d.n_docs, ps.n_vocab_tokens,
           round(ps.kl_q::DOUBLE / 1000.0)::BIGINT / 1000000.0 AS kl
    FROM ps JOIN d USING (source)
    """,
)
def llm_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distribution drift (text.source_divergence):
    KL(p_source || p_corpus) over the top-128 corpus vocabulary with
    add-one smoothing — the data-mix drift diagnostic. Log-ratios on a
    1e-6 grid, contributions BIGINT-quantized, kl derived on the
    integer micro-grid; the oracle replays vocabulary selection,
    smoothing, the source x vocab grid, and the quantized sum."""
    docs = _docs(spark, sf_dir)
    return X.source_divergence(docs, vocab_size=128)


@query(
    "llm_fp_index_sync",
    f"""
    WITH base AS (SELECT doc_id, text FROM documents),
    after_del AS (SELECT * FROM base WHERE NOT coalesce(doc_id % 7 = 0, false)),
    after_upd AS (SELECT doc_id,
                         CASE WHEN doc_id % 5 = 0 THEN text || ' syncmark'
                              ELSE text END AS text
                  FROM after_del),
    appended AS (SELECT doc_id + 100000 AS doc_id, text FROM base
                 WHERE doc_id % 3 = 0),
    final AS (SELECT * FROM after_upd UNION ALL SELECT * FROM appended)
    SELECT doc_id AS id, {_FP_SQL} AS fp FROM final
    """,
)
def llm_fp_index_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDF-driven dedup-index sync (operators/index_sync.py): initialize
    the exact-fingerprint index from a CDF-enabled corpus snapshot, run
    a delete (takedown) + update (re-extraction) + append (new crawl),
    then sync — load_cdf from the watermark, per-document final states,
    one MERGE (delete -> row removed, update -> fp rewritten, insert ->
    row added) with the watermark in the same commit. The oracle
    recomputes the index from the replayed mutation sequence, proving
    the O(changes) path lands exactly where an O(corpus) rebuild does."""
    from delta_rs_spark import DeltaTable, write_deltalake
    from delta_rs_spark.operators.index_sync import sync_fingerprint_index
    from delta_rs_spark.queries_delta import _scratch

    src = _scratch("fp_sync_src", sf_dir)
    idx = _scratch("fp_sync_idx", sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    write_deltalake(
        src, docs, configuration={"delta.enableChangeDataFeed": "true"}
    )
    sync_fingerprint_index(spark, src, idx)
    dt = DeltaTable(src, spark=spark)
    dt.delete("doc_id % 7 = 0")
    dt.update({"text": "concat(text, ' syncmark')"}, predicate="doc_id % 5 = 0")
    write_deltalake(
        src,
        docs.filter("doc_id % 3 = 0").select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        ),
        mode="append",
    )
    sync_fingerprint_index(spark, src, idx)
    return DeltaTable(idx, spark=spark).to_df()


@query(
    "llm_fp_index_sync_nocdf",
    f"""
    WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 600),
    after_del AS (SELECT * FROM base WHERE NOT coalesce(doc_id % 7 = 0, false)),
    after_upd AS (SELECT doc_id,
                         CASE WHEN doc_id % 5 = 0 THEN text || ' syncmark'
                              ELSE text END AS text
                  FROM after_del),
    appended AS (SELECT doc_id + 100000 AS doc_id, text FROM base
                 WHERE doc_id % 3 = 0),
    final AS (SELECT * FROM after_upd UNION ALL SELECT * FROM appended)
    SELECT doc_id AS id, {_FP_SQL} AS fp FROM final
    """,
)
def llm_fp_index_sync_nocdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETROACTIVE dedup-index sync (r09, operators/index_sync.py
    change_source='diff'): the migration story — the source corpus
    NEVER enabled CDF, yet its fingerprint index is brought up to date
    after the same delete (takedown) + update (re-extraction) + append
    (new crawl) sequence as llm_fp_index_sync. change_source='auto'
    detects the missing CDF property and reconstructs the change set
    via table_diff (operators/diff.py): the add-action diff prunes
    unchurned files before IO, so the no-CDF path is O(churn) like the
    CDF one, never O(table). The oracle recomputes the index from the
    replayed mutation sequence — a from-scratch rebuild the O(churn)
    sync must land on exactly."""
    from delta_rs_spark import DeltaTable, write_deltalake
    from delta_rs_spark.operators.index_sync import sync_fingerprint_index
    from delta_rs_spark.queries_delta import _scratch

    src = _scratch("fp_sync_nocdf_src", sf_dir)
    idx = _scratch("fp_sync_nocdf_idx", sf_dir)
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter("doc_id < 600")
    )
    write_deltalake(src, docs)  # NO CDF property — the whole point
    sync_fingerprint_index(spark, src, idx)
    dt = DeltaTable(src, spark=spark)
    dt.delete("doc_id % 7 = 0")
    dt.update({"text": "concat(text, ' syncmark')"}, predicate="doc_id % 5 = 0")
    write_deltalake(
        src,
        docs.filter("doc_id % 3 = 0").select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        ),
        mode="append",
    )
    sync_fingerprint_index(spark, src, idx)  # auto -> diff reconstruction
    return DeltaTable(idx, spark=spark).to_df()


_FINAL_STATE_SQL = """
    base AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
    after_del AS (SELECT * FROM base WHERE NOT coalesce(doc_id % 7 = 0, false)),
    after_upd AS (SELECT doc_id,
                         CASE WHEN doc_id % 5 = 0 THEN text || ' syncmark'
                              ELSE text END AS text
                  FROM after_del),
    appended AS (SELECT doc_id + 100000 AS doc_id, text FROM base
                 WHERE doc_id % 3 = 0),
    final AS (SELECT * FROM after_upd UNION ALL SELECT * FROM appended)
"""


@query(
    "llm_band_index_sync",
    f"""
    WITH {_FINAL_STATE_SQL},
    {_MINHASH_SIG_SQL.replace("FROM documents", "FROM final")
                     .replace("CROSS JOIN perms", "CROSS JOIN perms WHERE i < 16")},
    banded AS (SELECT doc_id, b, sig[4*b+1:4*b+4] AS bsig
               FROM sig CROSS JOIN range(4) r(b)),
    probe AS (SELECT doc_id AS new_id, b, bsig FROM banded WHERE doc_id % 3 = 0),
    hist AS (SELECT doc_id AS index_id, b, bsig FROM banded)
    SELECT DISTINCT new_id, index_id
    FROM probe JOIN hist ON probe.b = hist.b AND probe.bsig = hist.bsig
    WHERE new_id != index_id
    """,
)
def llm_band_index_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDF-driven near-dup index sync (operators/index_sync.py
    sync_band_index): initialize the MinHash band index from a
    CDF-enabled corpus, replay the same delete + update + append as the
    fp-sync gate, sync (rewritten docs re-derive ALL band rows, deleted
    docs emit per-band delete rows, one MERGE + watermark), then PROBE
    the current doc_id%3 batch through it. The oracle re-derives the
    index from the final corpus state and joins on raw signature slices
    (the probe-gate convention: identical semantics modulo 64-bit
    bucket-hash collisions) — so a stale row (a deleted doc still
    vetoing, an updated doc's old buckets) breaks the hash compare."""
    from delta_rs_spark import DeltaTable, write_deltalake
    from delta_rs_spark.functions.dedup import near_dup_candidates_against_index
    from delta_rs_spark.operators.index_sync import sync_band_index
    from delta_rs_spark.queries_delta import _scratch

    src = _scratch("band_sync_src", sf_dir)
    idx = _scratch("band_sync_idx", sf_dir)
    # 200-doc subset and 16 perms x 4 bands: sync semantics are
    # independent of corpus size AND of the LSH parameter choice (the
    # full 64x16 config's banding correctness is llm_band_index_probe's
    # job; the dedup curves own its scale story) — the gate cost is
    # commit/partition-bound, and 16 band partitions in every write and
    # merge measured 11-12s warm vs the ~5s gate budget
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").filter(
        "doc_id < 200"
    )
    write_deltalake(
        src, docs, configuration={"delta.enableChangeDataFeed": "true"}
    )
    sync_band_index(
        spark, src, idx, hash_fn="md5", num_perm=16, bands=4
    )
    dt = DeltaTable(src, spark=spark)
    dt.delete("doc_id % 7 = 0")
    dt.update({"text": "concat(text, ' syncmark')"}, predicate="doc_id % 5 = 0")
    write_deltalake(
        src,
        docs.filter("doc_id % 3 = 0").select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        ),
        mode="append",
    )
    sync_band_index(spark, src, idx)
    probe = DeltaTable(src, spark=spark).to_df().filter(F.col("doc_id") % 3 == 0)
    return near_dup_candidates_against_index(spark, idx, probe)


@query(
    "llm_ivf_index_sync",
    """
    WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    after_del AS (SELECT * FROM base WHERE NOT vec_id % 7 = 0),
    after_upd AS (SELECT vec_id,
                         CASE WHEN vec_id % 5 = 0 THEN list_reverse(v)
                              ELSE v END AS v
                  FROM after_del),
    appended AS (SELECT vec_id + 100000 AS vec_id, list_reverse(v) AS v
                 FROM base WHERE vec_id % 3 = 0),
    final AS (SELECT * FROM after_upd UNION ALL SELECT * FROM appended),
    -- centroids FROZE at index init (first 16 ids of the PRE-churn
    -- corpus): assignment replays vs the raw values, probe ranking vs
    -- the ROUND-8 config spellings (the llm_ivf_topk conventions)
    cents AS (SELECT row_number() OVER (ORDER BY vec_id ASC) - 1 AS i,
                     embedding::DOUBLE[] AS c
              FROM embeddings ORDER BY vec_id ASC LIMIT 16),
    rcents AS (SELECT i, list_transform(c, x -> round(x, 8)) AS c FROM cents),
    ascored AS (SELECT f.vec_id, c.i, list_cosine_similarity(f.v, c.c) AS s
                FROM final f CROSS JOIN cents c),
    assign AS (SELECT vec_id, i AS lst FROM (
        SELECT vec_id, i,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY s DESC, i DESC) AS rn
        FROM ascored) WHERE rn = 1),
    dq AS (SELECT vec_id AS query_id, v AS qv FROM final
           WHERE vec_id IN (1, 2, 3, 5)),
    probe AS (SELECT query_id, qv, i FROM (
        SELECT d.query_id, d.qv, c.i,
               row_number() OVER (PARTITION BY d.query_id
                                  ORDER BY round(list_cosine_similarity(d.qv, c.c), 4)
                                             DESC,
                                           c.i DESC) AS rn
        FROM dq d CROSS JOIN rcents c) WHERE rn <= 4),
    dsc AS (SELECT p.query_id, f.vec_id AS doc_id,
                   round(list_cosine_similarity(f.v, p.qv), 4) AS score
            FROM final f
            JOIN assign a ON f.vec_id = a.vec_id
            JOIN probe p ON a.lst = p.i),
    rk AS (SELECT query_id, doc_id, score,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id ASC) AS rank
           FROM dsc)
    SELECT query_id, rank::INTEGER AS rank, doc_id, score
    FROM rk WHERE rank <= 10
    """,
)
def llm_ivf_index_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF/ANN index maintenance (r11, operators/index_sync
    sync_ivf_index — the r10 verdict's one remaining 100 TB gap):
    initialize the 16-list IVF index from a CDF-enabled embedding
    corpus, run a delete (takedown) + update (re-embed: reversed
    vectors) + append (new crawl), sync — CDF final states, changed
    vectors re-assigned against the FROZEN config centroids, one MERGE
    (a migrated vector moves to its new list's partition) with the
    watermark in the same commit — then serve per-query dense top-10
    THROUGH the synced index via the hybrid lineage's indexed backend
    (``hybrid_topk(dense='ivf', source_path=...)`` routes here). The
    oracle replays the mutation sequence, frozen-centroid assignment
    over the post-churn corpus, 4dp probe selection, and the pruned
    rank — so a stale index row (deleted doc still served, an updated
    doc ranked under its old vector or probed in its old list) breaks
    the hash compare."""
    from delta_rs_spark import DeltaTable, write_deltalake
    from delta_rs_spark.functions.similarity import ivf_topk_indexed_multi
    from delta_rs_spark.operators.index_sync import sync_ivf_index
    from delta_rs_spark.queries_delta import _scratch

    src = _scratch("ivf_sync_src", sf_dir)
    idx = _scratch("ivf_sync_idx", sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    write_deltalake(
        src, emb, configuration={"delta.enableChangeDataFeed": "true"}
    )
    sync_ivf_index(spark, src, idx, n_lists=16)
    dt = DeltaTable(src, spark=spark)
    dt.delete("vec_id % 7 = 0")
    dt.update({"embedding": "reverse(embedding)"}, predicate="vec_id % 5 = 0")
    write_deltalake(
        src,
        emb.filter("vec_id % 3 = 0").select(
            (F.col("vec_id") + 100000).alias("vec_id"),
            F.reverse("embedding").alias("embedding"),
        ),
        mode="append",
    )
    sync_ivf_index(spark, src, idx)  # O(changes): CDF range + one MERGE
    queries = (
        DeltaTable(src, spark=spark).to_df().filter("vec_id IN (1, 2, 3, 5)")
    )
    return ivf_topk_indexed_multi(
        spark, idx, queries, k=10, n_probe=4, q_id_col="vec_id"
    )


@query(
    "llm_ivf_recluster",
    f"""
    WITH {_kmeans_iter_sql(16)},
    -- the k-means refit's centroids (c1, 8dp grid) become the IVF
    -- config; replay cosine assignment (higher-index ties), 4dp probe
    -- selection, and the pruned per-query rank over them
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 4),
    ascored AS (SELECT e.vec_id, c.ci AS i,
                       list_cosine_similarity(e.v, c.c) AS s
                FROM e CROSS JOIN c1 c),
    assign AS (SELECT vec_id, i AS lst FROM (
        SELECT vec_id, i,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY s DESC, i DESC) AS rn
        FROM ascored) WHERE rn = 1),
    probe AS (SELECT query_id, qv, i FROM (
        SELECT qq.query_id, qq.qv, c.ci AS i,
               row_number() OVER (PARTITION BY qq.query_id
                                  ORDER BY round(list_cosine_similarity(qq.qv, c.c), 4)
                                             DESC,
                                           c.ci DESC) AS rn
        FROM q qq CROSS JOIN c1 c) WHERE rn <= 4),
    dsc AS (SELECT p.query_id, e.vec_id AS doc_id,
                   round(list_cosine_similarity(e.v, p.qv), 4) AS score
            FROM e
            JOIN assign a ON e.vec_id = a.vec_id
            JOIN probe p ON a.lst = p.i),
    rk AS (SELECT query_id, doc_id, score,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id ASC) AS rank
           FROM dsc)
    SELECT query_id, rank::INTEGER AS rank, doc_id, score
    FROM rk WHERE rank <= 10
    """,
)
def llm_ivf_recluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drift-triggered IVF RECLUSTER (r11, sync_ivf_index
    recluster='auto'): when ivf_index_balance's add-action-stats
    imbalance crosses the threshold, the index is re-TRAINED — k-means
    (similarity.kmeans: deterministic first-k seeding, 2 Lloyd
    iterations, 4dp L2 grid / lowest-index ties, 8dp centroid grid)
    refits the centroids toward the current mass, and build_ivf_index
    commits the retrained centroids WITH their matching cosine
    assignments atomically (one overwrite that also merges the config
    key). A sub-1.0 threshold forces the path deterministically. The
    oracle replays the ENTIRE pipeline cross-engine: both Lloyd
    iterations, the refit centroids, cosine re-assignment (higher-index
    ties — the IVF convention, distinct from k-means' own L2 argmin),
    4dp probe selection, and the pruned per-query top-10 — so a
    recluster that kept stale centroids, mixed conventions, or lost
    rows breaks the hash."""
    from delta_rs_spark import write_deltalake
    from delta_rs_spark.functions.similarity import ivf_topk_indexed_multi
    from delta_rs_spark.operators.index_sync import sync_ivf_index
    from delta_rs_spark.queries_delta import _scratch

    src = _scratch("ivf_recl_src", sf_dir)
    idx = _scratch("ivf_recl_idx", sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    write_deltalake(src, emb)
    r = sync_ivf_index(
        spark, src, idx, n_lists=16, imbalance_threshold=0.5, recluster="auto"
    )
    if not r["reclustered"]:  # engine-side sanity; the oracle owns values
        raise AssertionError("imbalance 1.0+ must exceed a 0.5 threshold")
    queries = emb.filter("vec_id < 4")
    return ivf_topk_indexed_multi(
        spark, idx, queries, k=10, n_probe=4, q_id_col="vec_id"
    )


@query(
    "llm_classifier_auc",
    f"""
    WITH m AS (
      SELECT doc_id, lang,
             len({_TOKENS_SQL})::DOUBLE AS n_tok,
             length(text)::DOUBLE AS n_char,
             len(regexp_extract_all(lower(text), '{X.STOPWORD_RE}'))::DOUBLE AS sw,
             len(regexp_extract_all(text, '[.,;:!?]'))::DOUBLE AS pn
      FROM documents),
    f AS (SELECT doc_id,
             CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
             least(n_tok / 64.0, 1.0) AS x1,
             least(sw / greatest(n_tok, 1.0) * 4.0, 1.0) AS x2,
             least(pn / greatest(n_char, 1.0) * 10.0, 1.0) AS x3
          FROM m),
    w0 AS (SELECT 0.0 AS a0, 0.0 AS a1, 0.0 AS a2, 0.0 AS a3),
    g1 AS (SELECT {_lr_grad(_lr_z('w0'))} FROM f CROSS JOIN w0),
    w1 AS (SELECT w0.a0 - 0.5 * (CAST(g1.s0 AS DOUBLE)/1000000000.0/g1.n) AS a0,
                  w0.a1 - 0.5 * (CAST(g1.s1 AS DOUBLE)/1000000000.0/g1.n) AS a1,
                  w0.a2 - 0.5 * (CAST(g1.s2 AS DOUBLE)/1000000000.0/g1.n) AS a2,
                  w0.a3 - 0.5 * (CAST(g1.s3 AS DOUBLE)/1000000000.0/g1.n) AS a3
           FROM g1 CROSS JOIN w0),
    g2 AS (SELECT {_lr_grad(_lr_z('w1'))} FROM f CROSS JOIN w1),
    w2 AS (SELECT w1.a0 - 0.5 * (CAST(g2.s0 AS DOUBLE)/1000000000.0/g2.n) AS a0,
                  w1.a1 - 0.5 * (CAST(g2.s1 AS DOUBLE)/1000000000.0/g2.n) AS a1,
                  w1.a2 - 0.5 * (CAST(g2.s2 AS DOUBLE)/1000000000.0/g2.n) AS a2,
                  w1.a3 - 0.5 * (CAST(g2.s3 AS DOUBLE)/1000000000.0/g2.n) AS a3
           FROM g2 CROSS JOIN w1),
    scored AS (SELECT doc_id, y,
                      round(1.0/(1.0+exp(-{_lr_z('w2')})), 6) AS score
               FROM f CROSS JOIN w2),
    g AS (SELECT score AS s, count(*)::BIGINT AS n, sum(y)::BIGINT AS n_pos
          FROM scored GROUP BY score),
    r AS (SELECT n, n_pos,
                 n_pos * (2 * coalesce(sum(n) OVER (ORDER BY s ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                          + n + 1) AS pos_rank2
          FROM g),
    a AS (SELECT sum(n_pos)::BIGINT AS p,
                 (sum(n) - sum(n_pos))::BIGINT AS nneg,
                 sum(pos_rank2)::BIGINT AS spr FROM r)
    SELECT p AS n_pos, nneg AS n_neg,
           CASE WHEN p > 0 AND nneg > 0 THEN
             round((spr - p * (p + 1))::DOUBLE * 1000000.0
                   / (2 * p * nneg)::DOUBLE)::BIGINT / 1000000.0
           END AS auc
    FROM a
    """,
)
def llm_classifier_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed exact ROC-AUC (text.classifier_auc) of the logistic
    quality classifier against the lang='en' label it was trained on —
    the eval step before trusting a learned filter. Tie-aware rank-sum
    in doubled-rank integer form; ONE groupBy(score) + a window over
    DISTINCT grid scores, single-row output. The oracle replays the
    classifier (both GD iterations) AND the AUC arithmetic."""
    docs = _docs(spark, sf_dir)
    # one regex feature pass instead of four (2 GD iterations + score +
    # label re-join): the persisted narrow frame carries y alongside the
    # features, so the label never re-reads the docs table either
    feats = X.quality_feature_frame(docs, F.col("lang") == "en").persist()
    w = X.train_quality_classifier(docs, F.col("lang") == "en", features=feats)
    scored = X.score_quality_classifier(
        docs, w, features=feats, id_cols=["doc_id", "y"]
    ).withColumn("y", F.col("y").cast("long"))
    return X.classifier_auc(scored, score_col="score", label_col="y")


def _ingest_replay_oracle() -> str:
    """SQL twin of replay_corpus_ingest over documents split into 3
    batches by doc_id % 3 (batch order 0,1,2), empty initial index,
    gate = lang 'en' / quality >= 0.5 / 20 <= tokens <= 100000 (the
    llm_corpus_pipeline thresholds, whose SQL replay is long-proven).

    Semantics replayed exactly: within a batch the min-id doc per
    fingerprint is the only candidate (the probe's keep-first window);
    a fingerprint enters the index ONLY when a batch's candidate passes
    the gate (rejected docs are never indexed, so later copies get a
    fresh chance); the corpus holds the candidate of the FIRST batch
    whose candidate passed."""
    count_exprs = []
    for lg, markers in X.LANG_MARKER_TOKENS.items():
        lits = ", ".join(f"'{mk}'" for mk in markers)
        count_exprs.append(
            f"len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> t IN ({lits}))) AS c_{lg}"
        )
    count_exprs.append(f"len(regexp_extract_all(text, '{X.ZH_CHAR_RE}')) AS c_zh")
    counts = ",\n             ".join(count_exprs)
    langs = sorted([*X.LANG_MARKER_TOKENS, "zh"])
    best = "greatest(" + ", ".join(f"c_{lg}" for lg in langs) + ")"
    whens = " ".join(
        f"WHEN c_{lg} > 0 AND c_{lg} = {best} THEN '{lg}'" for lg in langs
    )
    return f"""
    WITH m AS (
      SELECT doc_id, doc_id % 3 AS b,
             {counts},
             len({_TOKENS_SQL})::DOUBLE AS n_tok,
             length(text)::DOUBLE AS n_char,
             len(regexp_extract_all(lower(text), '{X.STOPWORD_RE}'))::DOUBLE AS sw,
             len(regexp_extract_all(text, '[.,;:!?]'))::DOUBLE AS pn,
             {_FP_SQL} AS fp
      FROM documents),
    s AS (SELECT doc_id, b, fp,
                 CASE {whens} ELSE 'und' END AS lang_pred,
                 round(0.5 * least(n_tok / 64.0, 1.0)
                     + 0.5 * least(sw / greatest(n_tok, 1.0) * 4.0, 1.0)
                     - 0.25 * least(pn / greatest(n_char, 1.0) * 10.0, 1.0), 6) AS quality,
                 CAST(n_tok AS BIGINT) AS n_tokens
          FROM m),
    cand AS (SELECT fp, b, min(doc_id) AS keep_id FROM s GROUP BY fp, b),
    pass AS (SELECT c.fp, c.b, c.keep_id
             FROM cand c JOIN s ON s.doc_id = c.keep_id AND s.b = c.b
             WHERE s.lang_pred = 'en' AND s.quality >= 0.5
               AND s.n_tokens >= 20 AND s.n_tokens <= 100000),
    first AS (SELECT fp, min(b) AS b0 FROM pass GROUP BY fp)
    SELECT d.doc_id, d.source, d.text
    FROM pass p
    JOIN first f ON p.fp = f.fp AND p.b = f.b0
    JOIN documents d ON d.doc_id = p.keep_id
    """


@query("llm_stream_ingest_replay", _ingest_replay_oracle())
def llm_stream_ingest_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed streaming corpus ingest (streaming/ingest.py) at
    fixed micro-batch boundaries: documents split into 3 batches by
    doc_id % 3, replayed through the SAME per-batch processor the live
    foreachBatch stream runs (process_corpus_batch — index probe +
    within-batch keep-first + lang/quality/length gate + exactly-once
    corpus append + index advance), from an empty fingerprint index.
    Returns the final corpus Delta table; the oracle derives the same
    survivor set in pure SQL. The r06 verdict's 'oracle the live-stream
    pair' item: stream-vs-replay equivalence is pinned separately by
    test_streaming.py's differential (same processor, availableNow
    file-source stream)."""
    import os as _os
    import shutil as _shutil

    from delta_rs_spark import DeltaTable
    from delta_rs_spark.functions.dedup import build_fingerprint_index
    from delta_rs_spark.streaming.ingest import replay_corpus_ingest

    docs = _docs(spark, sf_dir).select("doc_id", "source", "text")
    tag = _os.path.basename(sf_dir.rstrip("/"))
    root = f"/tmp/delta_rs_spark_oracle/{tag}/stream_ingest_replay_{_os.getpid()}"
    _shutil.rmtree(root, ignore_errors=True)
    _os.makedirs(root, exist_ok=True)
    corpus, index = f"{root}/corpus", f"{root}/fp_index"

    build_fingerprint_index(docs.limit(0), index)  # empty initial index
    batches = [docs.filter(F.col("doc_id") % 3 == b) for b in (0, 1, 2)]
    replay_corpus_ingest(
        batches, corpus, index, lang="en", min_quality=0.5, min_tokens=20
    )
    return DeltaTable(corpus, spark=spark).to_df(
        columns=["doc_id", "source", "text"]
    )


@query(
    "llm_gopher_rules",
    """
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'), x -> x != '') AS toks,
             list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)),
                         l -> l != '') AS lines,
             len(regexp_extract_all(text, '#|\\.\\.\\.|…'))::BIGINT AS n_symbols
      FROM documents),
    m AS (
      SELECT doc_id,
             len(toks)::BIGINT AS n_words,
             coalesce(list_sum(list_transform(toks, x -> length(x))), 0)::BIGINT AS char_sum,
             n_symbols,
             len(lines)::BIGINT AS n_lines,
             len(list_filter(lines, l -> left(l, 1) IN ('-', '*', '•')))::BIGINT AS bullet_lines,
             len(list_filter(lines, l -> l LIKE '%...' OR l LIKE '%…'))::BIGINT AS ellipsis_lines,
             len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))::BIGINT AS alpha_words,
             len(list_filter(['the','be','to','of','and','that','have','with'],
                             s -> list_contains(list_transform(toks, x -> lower(x)), s)))::BIGINT
               AS n_req_stopwords
      FROM t)
    SELECT doc_id, n_words,
           CASE WHEN n_words > 0
                THEN round(char_sum * 10000.0 / n_words)::BIGINT / 10000.0 END AS mean_word_len,
           n_symbols, n_lines, bullet_lines, ellipsis_lines, alpha_words, n_req_stopwords,
           (n_words >= 50 AND n_words <= 100000) AS r_word_count,
           (3 * n_words <= char_sum AND char_sum <= 10 * n_words) AS r_mean_word_len,
           (10 * n_symbols <= n_words) AS r_symbol_ratio,
           (10 * bullet_lines <= 9 * n_lines) AS r_bullet_lines,
           (10 * ellipsis_lines <= 3 * n_lines) AS r_ellipsis_lines,
           (10 * alpha_words >= 8 * n_words) AS r_alpha_words,
           (n_req_stopwords >= 2) AS r_stopwords,
           ((n_words >= 50 AND n_words <= 100000)
            AND (3 * n_words <= char_sum AND char_sum <= 10 * n_words)
            AND (10 * n_symbols <= n_words)
            AND (10 * bullet_lines <= 9 * n_lines)
            AND (10 * ellipsis_lines <= 3 * n_lines)
            AND (10 * alpha_words >= 8 * n_words)
            AND (n_req_stopwords >= 2)) AS keep
    FROM m
    """,
)
def llm_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality-rule battery (text.gopher_quality_report, Rae et
    al. 2021 §A1.1.2): word-count bounds, mean-word-length band,
    symbol ratio, bullet/ellipsis line fractions, alphabetic-word
    fraction, required-stopword presence — one codegen projection, no
    shuffle, every threshold in integer arithmetic. The oracle replays
    all seven rules and the conjunction in SQL."""
    docs = _docs(spark, sf_dir)
    return X.gopher_quality_report(docs)


@query(
    "llm_rrf_hybrid_retrieval",
    f"""
    WITH post AS (
      SELECT doc_id, term, count(*)::BIGINT AS tf, max(dl)::BIGINT AS dl FROM (
        SELECT doc_id,
               len({_CLEAN_TOKENS_SQL})::BIGINT AS dl,
               unnest({_CLEAN_TOKENS_SQL}) AS term
        FROM documents)
      GROUP BY doc_id, term),
    scal AS (SELECT count(*)::DOUBLE AS n,
                    (sum(len({_CLEAN_TOKENS_SQL}))::DOUBLE)
                      / (count(*)::DOUBLE) AS avgdl,
                    sum(len({_CLEAN_TOKENS_SQL}))::DOUBLE AS total
             FROM documents),
    q AS (SELECT DISTINCT query_id, term FROM (
            SELECT doc_id AS query_id,
                   unnest(list_slice({_CLEAN_TOKENS_SQL}, 1, 6)) AS term
            FROM (SELECT doc_id, text FROM documents
                  ORDER BY doc_id ASC LIMIT 4))),
    -- BM25 side (identical arithmetic to the llm_bm25_topk oracle)
    dfreq AS (SELECT p.term, count(*)::BIGINT AS df
              FROM post p GROUP BY p.term),
    idf AS (SELECT d.term,
                   round(ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
                         * 1000000.0) / 1000000.0 AS idf
            FROM dfreq d CROSS JOIN scal s
            WHERE d.term IN (SELECT term FROM q)),
    bcontrib AS (
      SELECT q.query_id, p.doc_id,
             round(i.idf * ((p.tf::DOUBLE * 2.2)
                   / (p.tf::DOUBLE
                      + 1.2 * (0.25 + 0.75 * (p.dl::DOUBLE / s.avgdl))))
                   * 1000000000.0)::BIGINT AS c
      FROM post p
      JOIN q ON p.term = q.term
      JOIN idf i ON p.term = i.term
      CROSS JOIN scal s),
    bsc AS (SELECT query_id, doc_id, sum(c)::BIGINT AS score_q
            FROM bcontrib GROUP BY query_id, doc_id),
    brank AS (SELECT query_id, doc_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score_q DESC, doc_id ASC)
                       AS rank
              FROM bsc),
    -- Dirichlet query-likelihood side (mu = 300)
    ctf AS (SELECT p.term, sum(p.tf)::BIGINT AS ctf
            FROM post p GROUP BY p.term),
    qcontrib AS (
      SELECT q.query_id, p.doc_id, p.dl,
             round(ln(1.0 + p.tf::DOUBLE
                            / (300.0 * c.ctf::DOUBLE / s.total))
                   * 1000000.0)::BIGINT AS cq
      FROM post p
      JOIN q ON p.term = q.term
      JOIN ctf c ON p.term = c.term
      CROSS JOIN scal s),
    nq AS (SELECT query_id, count(*)::BIGINT AS nq FROM q GROUP BY query_id),
    qsc AS (SELECT m.query_id, m.doc_id,
                   (m.mq + n.nq * round(ln(300.0 / (m.dl::DOUBLE + 300.0))
                                        * 1000000.0)::BIGINT)::BIGINT AS score_q
            FROM (SELECT query_id, doc_id, sum(cq)::BIGINT AS mq,
                         max(dl)::BIGINT AS dl
                  FROM qcontrib GROUP BY query_id, doc_id) m
            JOIN nq n USING (query_id)),
    qrank AS (SELECT query_id, doc_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score_q DESC, doc_id ASC)
                       AS rank
              FROM qsc),
    -- reciprocal-rank fusion of the two top-20 lists (k = 60)
    u AS (SELECT query_id, doc_id, rank FROM brank WHERE rank <= 20
          UNION ALL
          SELECT query_id, doc_id, rank FROM qrank WHERE rank <= 20),
    fused AS (SELECT query_id, doc_id,
                     sum(round(1000000000.0 / (60.0 + rank::DOUBLE))::BIGINT)
                       ::BIGINT AS rrf_q
              FROM u GROUP BY query_id, doc_id),
    fr AS (SELECT query_id, doc_id, rrf_q,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY rrf_q DESC, doc_id ASC) AS rank
           FROM fused)
    SELECT query_id, rank::INTEGER AS rank, doc_id,
           round(rrf_q::DOUBLE / 1000.0)::BIGINT / 1000000.0 AS rrf_score
    FROM fr WHERE rank <= 10
    """,
)
def llm_rrf_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval (retrieval.ql_topk + retrieval.rrf_fuse): BM25
    and Dirichlet-smoothed query likelihood (mu=300, Zhai & Lafferty
    2004) each rank the corpus top-20 for the 4-query head-term set,
    then reciprocal-rank fusion (Cormack et al. 2009, k=60) merges the
    lists into a final top-10 — the lexical/LM hybrid every RAG-style
    data pipeline runs. Both rankers share ONE postings build; fusion
    inputs are top-k-bounded (never corpus-scaled). The oracle replays
    postings, both scorers' grid-snapped transcendentals, both
    rankings, and the quantized fusion."""
    from delta_rs_spark.functions.retrieval import (
        bm25_topk,
        build_postings,
        head_term_queries,
        ql_topk,
        rrf_fuse,
    )

    docs = _docs(spark, sf_dir)
    qs = head_term_queries(docs, n_queries=4, n_terms=6)
    # ONE corpus tokenization/shuffle feeds both rankers (pinned so the
    # two consumers don't recompute it)
    postings = build_postings(docs).localCheckpoint(eager=True)
    b = bm25_topk(docs, qs, k=20, postings=postings)
    l = ql_topk(docs, qs, k=20, mu=300.0, postings=postings)
    return rrf_fuse([b, l], k=60, topk=10)


@query(
    "llm_dense_hybrid_retrieval",
    f"""
    WITH post AS (
      SELECT doc_id, term, count(*)::BIGINT AS tf, max(dl)::BIGINT AS dl FROM (
        SELECT doc_id,
               len({_CLEAN_TOKENS_SQL})::BIGINT AS dl,
               unnest({_CLEAN_TOKENS_SQL}) AS term
        FROM documents)
      GROUP BY doc_id, term),
    scal AS (SELECT count(*)::DOUBLE AS n,
                    (sum(len({_CLEAN_TOKENS_SQL}))::DOUBLE)
                      / (count(*)::DOUBLE) AS avgdl
             FROM documents),
    q AS (SELECT DISTINCT query_id, term FROM (
            SELECT doc_id AS query_id,
                   unnest(list_slice({_CLEAN_TOKENS_SQL}, 1, 6)) AS term
            FROM (SELECT doc_id, text FROM documents
                  ORDER BY doc_id ASC LIMIT 4))),
    -- BM25 side (identical arithmetic to the llm_bm25_topk oracle)
    dfreq AS (SELECT p.term, count(*)::BIGINT AS df
              FROM post p GROUP BY p.term),
    idf AS (SELECT d.term,
                   round(ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
                         * 1000000.0) / 1000000.0 AS idf
            FROM dfreq d CROSS JOIN scal s
            WHERE d.term IN (SELECT term FROM q)),
    bcontrib AS (
      SELECT q.query_id, p.doc_id,
             round(i.idf * ((p.tf::DOUBLE * 2.2)
                   / (p.tf::DOUBLE
                      + 1.2 * (0.25 + 0.75 * (p.dl::DOUBLE / s.avgdl))))
                   * 1000000000.0)::BIGINT AS c
      FROM post p
      JOIN q ON p.term = q.term
      JOIN idf i ON p.term = i.term
      CROSS JOIN scal s),
    bsc AS (SELECT query_id, doc_id, sum(c)::BIGINT AS score_q
            FROM bcontrib GROUP BY query_id, doc_id),
    brank AS (SELECT query_id, doc_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score_q DESC, doc_id ASC)
                       AS rank
              FROM bsc),
    -- dense side: exact cosine of the 4 query vectors against every
    -- corpus vector, 4dp grid, doc-id tiebreak (replays dense_topk's
    -- two-phase top-k, whose global result equals the flat ranking)
    dq AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < 4),
    dsc AS (SELECT dq.query_id, e.vec_id AS doc_id,
                   round(list_cosine_similarity(e.embedding::DOUBLE[], dq.qv),
                         4) AS score
            FROM embeddings e CROSS JOIN dq),
    drank AS (SELECT query_id, doc_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score DESC, doc_id ASC)
                       AS rank
              FROM dsc),
    -- reciprocal-rank fusion of the two top-20 lists (k = 60)
    u AS (SELECT query_id, doc_id, rank FROM brank WHERE rank <= 20
          UNION ALL
          SELECT query_id, doc_id, rank FROM drank WHERE rank <= 20),
    fused AS (SELECT query_id, doc_id,
                     sum(round(1000000000.0 / (60.0 + rank::DOUBLE))::BIGINT)
                       ::BIGINT AS rrf_q
              FROM u GROUP BY query_id, doc_id),
    fr AS (SELECT query_id, doc_id, rrf_q,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY rrf_q DESC, doc_id ASC) AS rank
           FROM fused)
    SELECT query_id, rank::INTEGER AS rank, doc_id,
           round(rrf_q::DOUBLE / 1000.0)::BIGINT / 1000000.0 AS rrf_score
    FROM fr WHERE rank <= 10
    """,
)
def llm_dense_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense+lexical hybrid retrieval (similarity.dense_topk +
    retrieval.bm25_topk + retrieval.rrf_fuse) — the actual production
    hybrid: BM25 ranks the document corpus top-20 for the 4-query
    head-term set while exact cosine over the embeddings table ranks
    the same ids dense-side (query vectors = the query docs' own
    embeddings), and reciprocal-rank fusion (k=60) merges the lists
    into a final top-10. Coverage is naturally partial per ranker (at
    sf0.1 only a subset of docs carries an embedding) — RRF's sum over
    available lists handles that by construction. Dense side is a
    broadcast of 4 query vectors over ONE corpus scan with a two-phase
    sharded top-k (no task ever sorts the whole corpus); lexical side
    is posting-bounded; fusion inputs are top-k-bounded. The oracle
    replays postings, BM25's grid-snapped arithmetic, the 4dp cosine
    grid, both rankings, and the quantized fusion."""
    from delta_rs_spark.functions.retrieval import (
        head_term_queries,
        hybrid_topk,
    )

    docs = _docs(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    qs = head_term_queries(docs, n_queries=4, n_terms=6)
    qvecs = emb.filter(F.col("vec_id") < 4)
    # dense="exact": this gate IS the recall yardstick backend of the
    # hybrid lineage (see retrieval.hybrid_topk — the ivf backend is
    # the scale default, benched by llm_dense_hybrid_indexed)
    return hybrid_topk(docs, emb, qs, qvecs, dense="exact")


@query(
    "llm_dense_hybrid_indexed",
    f"""
    WITH post AS (
      SELECT doc_id, term, count(*)::BIGINT AS tf, max(dl)::BIGINT AS dl FROM (
        SELECT doc_id,
               len({_CLEAN_TOKENS_SQL})::BIGINT AS dl,
               unnest({_CLEAN_TOKENS_SQL}) AS term
        FROM documents)
      GROUP BY doc_id, term),
    scal AS (SELECT count(*)::DOUBLE AS n,
                    (sum(len({_CLEAN_TOKENS_SQL}))::DOUBLE)
                      / (count(*)::DOUBLE) AS avgdl
             FROM documents),
    q AS (SELECT DISTINCT query_id, term FROM (
            SELECT doc_id AS query_id,
                   unnest(list_slice({_CLEAN_TOKENS_SQL}, 1, 6)) AS term
            FROM (SELECT doc_id, text FROM documents
                  ORDER BY doc_id ASC LIMIT 4))),
    -- BM25 side (identical arithmetic to the llm_bm25_topk oracle)
    dfreq AS (SELECT p.term, count(*)::BIGINT AS df
              FROM post p GROUP BY p.term),
    idf AS (SELECT d.term,
                   round(ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
                         * 1000000.0) / 1000000.0 AS idf
            FROM dfreq d CROSS JOIN scal s
            WHERE d.term IN (SELECT term FROM q)),
    bcontrib AS (
      SELECT q.query_id, p.doc_id,
             round(i.idf * ((p.tf::DOUBLE * 2.2)
                   / (p.tf::DOUBLE
                      + 1.2 * (0.25 + 0.75 * (p.dl::DOUBLE / s.avgdl))))
                   * 1000000000.0)::BIGINT AS c
      FROM post p
      JOIN q ON p.term = q.term
      JOIN idf i ON p.term = i.term
      CROSS JOIN scal s),
    bsc AS (SELECT query_id, doc_id, sum(c)::BIGINT AS score_q
            FROM bcontrib GROUP BY query_id, doc_id),
    brank AS (SELECT query_id, doc_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score_q DESC, doc_id ASC)
                       AS rank
              FROM bsc),
    -- dense side over the MATERIALIZED 16-list IVF index: replay the
    -- centroid assignment (raw centroids, higher-list ties), the
    -- 4dp-snapped probe selection (ROUND-8 config centroids, top-4
    -- lists per query), and the rank over probed candidates only
    dq AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < 4),
    cents AS (SELECT row_number() OVER (ORDER BY vec_id ASC) - 1 AS i,
                     embedding::DOUBLE[] AS c
              FROM embeddings ORDER BY vec_id ASC LIMIT 16),
    rcents AS (SELECT i, list_transform(c, x -> round(x, 8)) AS c FROM cents),
    ascored AS (SELECT e.vec_id, c.i,
                       list_cosine_similarity(e.embedding::DOUBLE[], c.c) AS s
                FROM embeddings e CROSS JOIN cents c),
    assign AS (SELECT vec_id, i AS lst FROM (
        SELECT vec_id, i,
               row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, i DESC) AS rn
        FROM ascored) WHERE rn = 1),
    probe AS (SELECT query_id, qv, i FROM (
        SELECT d.query_id, d.qv, c.i,
               row_number() OVER (PARTITION BY d.query_id
                                  ORDER BY round(list_cosine_similarity(d.qv, c.c), 4)
                                             DESC,
                                           c.i DESC) AS rn
        FROM dq d CROSS JOIN rcents c) WHERE rn <= 4),
    dsc AS (SELECT p.query_id, e.vec_id AS doc_id,
                   round(list_cosine_similarity(e.embedding::DOUBLE[], p.qv),
                         4) AS score
            FROM embeddings e
            JOIN assign a ON e.vec_id = a.vec_id
            JOIN probe p ON a.lst = p.i),
    drank AS (SELECT query_id, doc_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score DESC, doc_id ASC)
                       AS rank
              FROM dsc),
    -- reciprocal-rank fusion of the two top-20 lists (k = 60)
    u AS (SELECT query_id, doc_id, rank FROM brank WHERE rank <= 20
          UNION ALL
          SELECT query_id, doc_id, rank FROM drank WHERE rank <= 20),
    fused AS (SELECT query_id, doc_id,
                     sum(round(1000000000.0 / (60.0 + rank::DOUBLE))::BIGINT)
                       ::BIGINT AS rrf_q
              FROM u GROUP BY query_id, doc_id),
    fr AS (SELECT query_id, doc_id, rrf_q,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY rrf_q DESC, doc_id ASC) AS rank
           FROM fused)
    SELECT query_id, rank::INTEGER AS rank, doc_id,
           round(rrf_q::DOUBLE / 1000.0)::BIGINT / 1000000.0 AS rrf_score
    FROM fr WHERE rank <= 10
    """,
)
def llm_dense_hybrid_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INDEX-backed dense+lexical hybrid retrieval (r09 verdict #8:
    similarity.ivf_topk_indexed_multi composed into retrieval.rrf_fuse)
    — the corpus-scale completion of llm_dense_hybrid_retrieval: the
    dense half probes the MATERIALIZED 16-list IVF index (the same
    Delta table llm_ivf_topk and the pruned decontamination query —
    one index serves all three workloads) instead of broadcasting the
    queries over a full corpus scan, so each query's candidates come
    from 4 of 16 list partitions via log file-skipping. BM25 ranks the
    lexical side as before; RRF (k=60) fuses the two top-20 lists into
    a final top-10. The oracle replays centroid assignment, 4dp probe
    selection, the pruned dense rank, BM25's grid-snapped arithmetic,
    and the quantized fusion."""
    from delta_rs_spark.functions.retrieval import (
        head_term_queries,
        hybrid_topk,
    )

    docs = _docs(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    qs = head_term_queries(docs, n_queries=4, n_terms=6)
    qvecs = emb.filter(F.col("vec_id") < 4)
    # hybrid_topk's DEFAULT backend (r10): the indexed dense path is
    # the scale default of the hybrid lineage
    return hybrid_topk(
        docs, emb, qs, qvecs, index_path=_ann_index_path(sf_dir, "ivf_l16")
    )


def _mmr_oracle(k: int = 12, m: int = 6, mu: int = 7, nu: int = 3) -> str:
    """Unrolled greedy MMR replay (the llm_bpe_vocab / session-gate
    technique: m sequential argmax steps as generated CTEs — windows
    and aggregates are unrestricted outside recursion). Selection
    state selN grows by one pick per step; step N's candidate value is
    mu*rel - nu*max(sim to selN-1), all BIGINT on the 1e4 grid."""
    steps = []
    prev = "sel1"
    steps.append(f"""
    pick1 AS MATERIALIZED (SELECT query_id, doc_id, val FROM (
        SELECT query_id, doc_id, {mu} * rel AS val,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY {mu} * rel DESC, doc_id ASC) AS rn
        FROM cand) WHERE rn = 1),
    sel1 AS MATERIALIZED (SELECT query_id, doc_id FROM pick1)""")
    for j in range(2, m + 1):
        steps.append(f"""
    pick{j} AS MATERIALIZED (SELECT query_id, doc_id, val FROM (
        SELECT query_id, doc_id, val,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY val DESC, doc_id ASC) AS rn
        FROM (
          SELECT c.query_id, c.doc_id,
                 {mu} * c.rel - {nu} * max(s.sim) AS val
          FROM cand c
          JOIN {prev} p ON p.query_id = c.query_id
          JOIN sims s ON s.query_id = c.query_id
                     AND s.a = c.doc_id AND s.b = p.doc_id
          LEFT JOIN {prev} x ON x.query_id = c.query_id
                            AND x.doc_id = c.doc_id
          WHERE x.doc_id IS NULL
          GROUP BY c.query_id, c.doc_id, c.rel)) WHERE rn = 1),
    sel{j} AS MATERIALIZED (SELECT query_id, doc_id FROM {prev}
               UNION ALL SELECT query_id, doc_id FROM pick{j})""")
        prev = f"sel{j}"
    unions = "\n          UNION ALL ".join(
        f"SELECT query_id, {j} AS mmr_rank, doc_id, val FROM pick{j}"
        for j in range(1, m + 1)
    )
    return f"""
    WITH dq AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                FROM embeddings WHERE vec_id < 4),
    dsc AS (SELECT dq.query_id, e.vec_id AS doc_id,
                   round(list_cosine_similarity(e.embedding::DOUBLE[], dq.qv),
                         4) AS score,
                   e.embedding::DOUBLE[] AS vec
            FROM embeddings e CROSS JOIN dq),
    topk AS (SELECT query_id, doc_id, score, vec FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id ASC) AS rn
        FROM dsc) WHERE rn <= {k}),
    cand AS MATERIALIZED (SELECT query_id, doc_id,
                    CAST(round(score * 10000) AS BIGINT) AS rel, vec
             FROM topk),
    sims AS MATERIALIZED (SELECT c1.query_id, c1.doc_id AS a, c2.doc_id AS b,
                    CAST(round(list_cosine_similarity(c1.vec, c2.vec)
                               * 10000) AS BIGINT) AS sim
             FROM cand c1 JOIN cand c2 ON c1.query_id = c2.query_id),
    {','.join(steps)}
    SELECT query_id, mmr_rank, doc_id,
           val::DOUBLE / 100000.0 AS mmr_score
    FROM ({unions})
    """


@query("llm_mmr_rerank", _mmr_oracle())
def llm_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversity re-rank (retrieval.mmr_rerank, Carbonell &
    Goldstein 1998): dense top-12 per query, then 6 greedy
    maximal-marginal-relevance picks at lambda = 7/10 — the standard
    post-retrieval diversification that keeps near-duplicate passages
    from filling a RAG training context. Everything after the ranker
    is integer arithmetic on the 1e4 grid (exact rational lambda,
    half-away quantized relevance and pairwise cosines, doc-id ties),
    so the oracle replays ALL SIX sequential greedy steps as unrolled
    SQL CTEs — per-step selection state, max-sim-to-selected, argmax —
    and the hash compare pins every pick, not just the final set."""
    from delta_rs_spark.functions.retrieval import mmr_rerank
    from delta_rs_spark.functions.similarity import dense_topk

    emb = load_table(spark, sf_dir, "embeddings")
    qvecs = emb.filter(F.col("vec_id") < 4)
    den = dense_topk(emb, qvecs, k=12, q_id_col="vec_id")
    return mmr_rerank(den, emb, m=6, lam_num=7, lam_den=10)


@query(
    "llm_ngram_diversity",
    f"""
    WITH tk AS (SELECT source, {_NE_TOKENS_SQL} AS a FROM documents),
    uni AS (SELECT source, unnest(a) AS gram FROM tk),
    bi AS (SELECT source,
                  unnest(list_transform(range(1, greatest(len(a), 1)),
                                        i -> a[i] || ' ' || a[i + 1])) AS gram
           FROM tk),
    u AS (SELECT source, count(*)::BIGINT AS n_tokens,
                 count(DISTINCT gram)::BIGINT AS distinct_tokens
          FROM uni GROUP BY source),
    b AS (SELECT source, count(*)::BIGINT AS n_bigrams,
                 count(DISTINCT gram)::BIGINT AS distinct_bigrams
          FROM bi GROUP BY source),
    d AS (SELECT source, count(*)::BIGINT AS n_docs FROM documents GROUP BY source)
    SELECT d.source, d.n_docs,
           coalesce(u.n_tokens, 0) AS n_tokens,
           coalesce(u.distinct_tokens, 0) AS distinct_tokens,
           CASE WHEN coalesce(u.n_tokens, 0) > 0
                THEN round(u.distinct_tokens * 1000000.0 / u.n_tokens)::BIGINT
                     / 1000000.0 END AS ttr,
           coalesce(b.n_bigrams, 0) AS n_bigrams,
           coalesce(b.distinct_bigrams, 0) AS distinct_bigrams,
           CASE WHEN coalesce(b.n_bigrams, 0) > 0
                THEN round(b.distinct_bigrams * 1000000.0 / b.n_bigrams)::BIGINT
                     / 1000000.0 END AS bigram_diversity
    FROM d LEFT JOIN u USING (source) LEFT JOIN b USING (source)
    """,
)
def llm_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source lexical diversity (text.ngram_diversity): unigram
    type-token ratio + bigram distinct ratio — the mode-collapse /
    templated-text screen for a data mix. One tagged-union groupBy
    carries both gram streams; ratios on the 1e-6 micro-grid. The
    oracle replays tokenization, bigram assembly, both distinct counts
    and the ratios in SQL."""
    docs = _docs(spark, sf_dir)
    return X.ngram_diversity(docs)


@query(
    "llm_zipf_fit",
    f"""
    WITH f AS (SELECT term, count(*)::BIGINT AS freq
               FROM (SELECT unnest({_NE_TOKENS_SQL}) AS term FROM documents)
               GROUP BY term ORDER BY freq DESC, term ASC LIMIT 256),
    p AS (SELECT round(ln((row_number() OVER (ORDER BY freq DESC, term ASC))::DOUBLE)
                       * 1000000.0)::BIGINT AS xq,
                 round(ln(freq::DOUBLE) * 1000000.0)::BIGINT AS yq
          FROM f),
    s AS (SELECT count(*)::BIGINT AS v, sum(xq)::BIGINT AS sx,
                 sum(yq)::BIGINT AS sy, sum(xq * yq)::BIGINT AS sxy,
                 sum(xq * xq)::BIGINT AS sxx, sum(yq * yq)::BIGINT AS syy
          FROM p),
    -- every sum cast to DOUBLE BEFORE the products: v*syy and sy*sy
    -- overflow int64 once top-term freqs reach ~2e5 (mirrors zipf_fit)
    d AS (SELECT v, v::DOUBLE AS vd, sx::DOUBLE AS sxd, sy::DOUBLE AS syd,
                 sxy::DOUBLE AS sxyd, sxx::DOUBLE AS sxxd, syy::DOUBLE AS syyd
          FROM s)
    SELECT v AS n_terms,
           round(((vd * sxyd - sxd * syd) / (vd * sxxd - sxd * sxd))
                 * 1000000.0)::BIGINT / 1000000.0 AS slope,
           round(((syd / 1000000.0
                   - ((vd * sxyd - sxd * syd) / (vd * sxxd - sxd * sxd))
                     * (sxd / 1000000.0)) / vd)
                 * 1000000.0)::BIGINT / 1000000.0 AS intercept,
           round((((vd * sxyd - sxd * syd) * (vd * sxyd - sxd * syd))
                  / ((vd * sxxd - sxd * sxd) * (vd * syyd - syd * syd)))
                 * 1000000.0)::BIGINT / 1000000.0 AS r2
    FROM d
    """,
)
def llm_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit (text.zipf_fit): least-squares slope/intercept/r2
    of ln(freq) vs ln(rank) over the top-256 corpus terms — natural
    text sits near slope -1; synthetic or looped corpora bend the
    curve. All five regression sums are exact BIGINT aggregations of
    1e-6-grid log values; the oracle replays the frequency table, the
    grid, and the closed form."""
    docs = _docs(spark, sf_dir)
    return X.zipf_fit(docs, vocab_size=256)


@query(
    "llm_semantic_contamination",
    """
    WITH bench AS (SELECT vec_id AS bench_id, embedding FROM embeddings
                   WHERE vec_id < 8),
    sc AS (SELECT c.vec_id, b.bench_id,
                  round(list_cosine_similarity(c.embedding::DOUBLE[],
                                               b.embedding::DOUBLE[]), 4) AS cos
           FROM embeddings c CROSS JOIN bench b),
    r AS (SELECT vec_id, bench_id, cos,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY cos DESC, bench_id ASC) AS rn
          FROM sc)
    SELECT vec_id, bench_id, cos AS max_cos,
           cos >= 0.92 AS contaminated
    FROM r WHERE rn = 1
    """,
)
def llm_semantic_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space benchmark decontamination
    (similarity.semantic_contamination): max cosine of every corpus
    vector against the 8-vector benchmark set (vec_id < 8), argmax id
    with lowest-id tie-break, threshold flag at 0.92 — the semantic
    complement of the n-gram containment pass, catching paraphrased
    test items. Bench side broadcast; the reduction is a
    partial-aggregated max(struct), one row per corpus vector through
    the shuffle. The oracle replays the cross scoring and the argmax."""
    emb = load_table(spark, sf_dir, "embeddings")
    bench = emb.filter(F.col("vec_id") < 8)
    return S.semantic_contamination(emb, bench, threshold=0.92)


@query(
    "llm_semantic_contamination_pruned",
    """
    WITH bench AS (SELECT vec_id AS bench_id, embedding::DOUBLE[] AS bv
                   FROM embeddings WHERE vec_id < 8),
    cents AS (SELECT row_number() OVER (ORDER BY vec_id ASC) - 1 AS i,
                     embedding::DOUBLE[] AS c
              FROM embeddings ORDER BY vec_id ASC LIMIT 16),
    -- probe ranking uses the ROUND-8 centroids stored in the index
    -- configuration; assignment replay uses the raw ones (same split
    -- the llm_ivf_topk oracle pins)
    rcents AS (SELECT i, list_transform(c, x -> round(x, 8)) AS c FROM cents),
    scored AS (SELECT e.vec_id, c.i,
                      list_cosine_similarity(e.embedding::DOUBLE[], c.c) AS s
               FROM embeddings e CROSS JOIN cents c),
    assign AS (SELECT vec_id, i AS lst FROM (
        SELECT vec_id, i,
               row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, i DESC) AS rn
        FROM scored) WHERE rn = 1),
    probe AS (SELECT bench_id, bv, i FROM (
        SELECT b.bench_id, b.bv, c.i,
               row_number() OVER (PARTITION BY b.bench_id
                                  ORDER BY round(list_cosine_similarity(b.bv, c.c), 4)
                                             DESC,
                                           c.i DESC) AS rn
        FROM bench b CROSS JOIN rcents c) WHERE rn <= 4),
    cand AS (SELECT e.vec_id, p.bench_id,
                    round(list_cosine_similarity(e.embedding::DOUBLE[], p.bv),
                          4) AS cos
             FROM embeddings e
             JOIN assign a ON e.vec_id = a.vec_id
             JOIN probe p ON a.lst = p.i),
    best AS (SELECT vec_id, bench_id, cos FROM (
        SELECT vec_id, bench_id, cos,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, bench_id ASC) AS rn
        FROM cand) WHERE rn = 1)
    SELECT e.vec_id, b.bench_id, b.cos AS max_cos,
           coalesce(b.cos >= 0.92, FALSE) AS contaminated
    FROM embeddings e LEFT JOIN best b ON e.vec_id = b.vec_id
    """,
)
def llm_semantic_contamination_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-pruned benchmark decontamination
    (similarity.semantic_contamination_indexed): each bench vector
    probes its 4 nearest inverted lists of the materialized 16-list
    IVF index (the same Delta table llm_ivf_topk queries — one index
    serves both workloads), so the scan reads only probed partitions
    through log file-skipping instead of scoring |corpus| x |bench|.
    The CONTAMINATED set equals the brute-force scan's (near-dups
    co-assign; llm_semantic_contamination pins the exact variant on
    the same data); below threshold the report is a probed-pairs lower
    bound with NULLs for never-probed vectors. The oracle replays the
    centroid assignment, the 4dp-snapped probe selection, the pruned
    scoring, and the per-vector argmax."""
    from delta_rs_spark.table import DeltaTable

    emb = load_table(spark, sf_dir, "embeddings")
    bench = emb.filter(F.col("vec_id") < 8)
    idx = _ann_index_path(sf_dir, "ivf_l16")
    if not DeltaTable.is_deltatable(idx):
        S.build_ivf_index(emb, idx, n_lists=16)
    return S.semantic_contamination_indexed(
        spark, idx, bench, threshold=0.92, n_probe=4
    )


@query(
    "llm_bm25_hard_negatives",
    f"""
    WITH post AS (
      SELECT doc_id, term, count(*)::BIGINT AS tf, max(dl)::BIGINT AS dl FROM (
        SELECT doc_id,
               len({_CLEAN_TOKENS_SQL})::BIGINT AS dl,
               unnest({_CLEAN_TOKENS_SQL}) AS term
        FROM documents)
      GROUP BY doc_id, term),
    scal AS (SELECT count(*)::DOUBLE AS n,
                    (sum(len({_CLEAN_TOKENS_SQL}))::DOUBLE)
                      / (count(*)::DOUBLE) AS avgdl
             FROM documents),
    q AS (SELECT DISTINCT query_id, term FROM (
            SELECT doc_id AS query_id,
                   unnest(list_slice({_CLEAN_TOKENS_SQL}, 1, 6)) AS term
            FROM (SELECT doc_id, text FROM documents
                  ORDER BY doc_id ASC LIMIT 4))),
    dfreq AS (SELECT p.term, count(*)::BIGINT AS df
              FROM post p GROUP BY p.term),
    idf AS (SELECT d.term,
                   round(ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
                         * 1000000.0) / 1000000.0 AS idf
            FROM dfreq d CROSS JOIN scal s
            WHERE d.term IN (SELECT term FROM q)),
    contrib AS (
      SELECT q.query_id, p.doc_id,
             round(i.idf * ((p.tf::DOUBLE * 2.2)
                   / (p.tf::DOUBLE
                      + 1.2 * (0.25 + 0.75 * (p.dl::DOUBLE / s.avgdl))))
                   * 1000000000.0)::BIGINT AS c
      FROM post p
      JOIN q ON p.term = q.term
      JOIN idf i ON p.term = i.term
      CROSS JOIN scal s),
    sc AS (SELECT query_id, doc_id, sum(c)::BIGINT AS score_q
           FROM contrib GROUP BY query_id, doc_id),
    r AS (SELECT query_id, doc_id, score_q,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY score_q DESC, doc_id ASC)
                   AS rank
          FROM sc),
    -- the query's own source doc is the positive (the DPR in-batch
    -- setup); fetch k+1 candidates, exclude, re-rank
    negs AS (SELECT query_id, doc_id, score_q, rank FROM r
             WHERE rank <= 11 AND doc_id != query_id),
    rr AS (SELECT query_id, doc_id, score_q,
                  (row_number() OVER (PARTITION BY query_id
                                      ORDER BY rank ASC))::INTEGER AS nrank
           FROM negs)
    SELECT query_id, nrank AS rank, doc_id,
           round(score_q::DOUBLE / 1000000000.0, 6) AS score
    FROM rr WHERE nrank <= 10
    """,
)
def llm_bm25_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical hard-negative mining (retrieval.bm25_hard_negatives, the
    DPR recipe): top BM25 candidates per query minus the query's known
    positive (its own source document) — the standard negatives source
    for training dense retrievers. Fetches k + max-positives candidates,
    broadcast anti-joins the label frame, re-ranks. The oracle replays
    bm25, the exclusion and the re-rank."""
    from delta_rs_spark.functions.retrieval import (
        bm25_hard_negatives,
        head_term_queries,
    )

    docs = _docs(spark, sf_dir)
    qs = head_term_queries(docs, n_queries=4, n_terms=6)
    positives = qs.select("query_id").distinct().select(
        "query_id", F.col("query_id").alias("doc_id")
    )
    return bm25_hard_negatives(docs, qs, positives, k=10)


@query(
    "llm_corpus_datacard",
    f"""
    WITH m AS (SELECT source, lang,
                      len({_NE_TOKENS_SQL}) AS tok, length(text) AS ch
               FROM documents)
    SELECT CASE WHEN GROUPING(source) = 1 THEN '<ALL>' ELSE source END AS source,
           CASE WHEN GROUPING(lang) = 1 THEN '<ALL>' ELSE lang END AS lang,
           count(*)::BIGINT AS n_docs,
           sum(tok)::BIGINT AS total_tokens,
           sum(ch)::BIGINT AS total_chars,
           sum(CASE WHEN ch = 0 THEN 1 ELSE 0 END)::BIGINT AS empty_docs,
           sum(CASE WHEN tok < 16 THEN 1 ELSE 0 END)::BIGINT AS short_docs,
           count(DISTINCT lang)::BIGINT AS distinct_langs,
           (sum(tok)::BIGINT // count(*)::BIGINT) * 1000000
             + ((sum(tok)::BIGINT % count(*)::BIGINT) * 1000000)
               // count(*)::BIGINT AS mean_tokens_ppm
    FROM m GROUP BY ROLLUP(source, lang)
    """,
)
def llm_corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus data card (text.corpus_datacard): docs / tokens / chars /
    empty / short / language-spread / mean-length at (source, lang),
    (source), and grand-total grain — ONE scan, ONE map-side-combined
    ROLLUP shuffle carrying only |sources| x |langs| x3 partial rows,
    grouping()-labeled subtotals, BIGINT-exact mean."""
    return X.corpus_datacard(_docs(spark, sf_dir))


@query(
    "llm_frequent_ngrams",
    f"""
    WITH tk AS (SELECT source, {_NE_TOKENS_SQL} AS a FROM documents),
    g AS (SELECT source,
                 unnest(CASE WHEN len(a) < 2 THEN []::VARCHAR[]
                        ELSE list_transform(range(1, len(a)),
                                            i -> array_to_string(a[i:i+1], ' '))
                        END) AS gram
          FROM tk),
    c AS (SELECT source, gram, count(*)::BIGINT AS cnt
          FROM g GROUP BY source, gram),
    r AS (SELECT source, gram, cnt,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY cnt DESC, gram ASC) AS rank
          FROM c)
    SELECT source, rank::BIGINT AS rank, gram, cnt FROM r WHERE rank <= 5
    """,
)
def llm_frequent_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source top-5 bigrams (text.frequent_ngrams): boilerplate
    discovery — one map-side-combined (source, gram) count shuffle,
    then a sharded two-phase rank so a hot source's gram table never
    runs through a single window task. Oracle replays counts + rank in
    SQL (the oracle may rank globally; the engine's shard phase is an
    exact refinement, not an approximation)."""
    docs = _docs(spark, sf_dir)
    return X.frequent_ngrams(docs, n=2, k=5).withColumn(
        "rank", F.col("rank").cast("long")
    )


# --------------------------------------------------------------------------
# KMV sketches: cross-source overlap estimation (functions/sketches.py)
# --------------------------------------------------------------------------

# Per-source distinct (source, shingle-hash) pairs + exact bottom-64:
# the DuckDB twin of sketches.kmv_sketch with hash_fn='md5' (60-bit
# md5 hash, so the Spark side's 2^60-1 mask is the identity).
_KMV_K = 64
_KMV_SKETCH_SQL = f"""
    w AS (SELECT source, {_TOKENS_SQL} AS ws FROM documents),
    sh AS (SELECT source,
      CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
           ELSE list_transform(range(1, len(ws)-1), i -> array_to_string(ws[i:i+2], ' ')) END AS shingles
      FROM w),
    d AS (SELECT DISTINCT source, {_H64_SQL.format(x='s')} AS h
          FROM (SELECT source, unnest(shingles) AS s FROM sh)),
    rk AS (SELECT source, h,
                  row_number() OVER (PARTITION BY source ORDER BY h) AS rank,
                  count(*) OVER (PARTITION BY source) AS nd
           FROM d),
    sk AS (SELECT source, rank::BIGINT AS rank, h,
                  least({_KMV_K}, nd)::BIGINT AS sketch_size
           FROM rk WHERE rank <= {_KMV_K})
"""
# (k-1) * 2^60 as ONE exact double literal shared by both engines
_KMV_NUM = repr(float((_KMV_K - 1) * (1 << 60)))


@query(
    "llm_kmv_sketch",
    f"""
    WITH {_KMV_SKETCH_SQL}
    SELECT source, rank, h, sketch_size FROM sk
    """,
)
def llm_kmv_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KMV sketch (sketches.kmv_sketch): the k=64 smallest
    distinct shingle hashes per source from ONE corpus pass — distinct
    shuffle, then a threshold-pruned exact bottom-k (the window sorts
    ~8k survivors per source, never the full distinct set; a verified
    fallback keeps the result exact if the prune ever under-keeps).
    hash_fn='md5' for the cross-engine oracle; production uses
    xxhash64 on the same pipeline."""
    from delta_rs_spark.functions import sketches as K

    docs = _docs(spark, sf_dir)
    return K.kmv_sketch(docs, "source", "text", k=_KMV_K, hash_fn="md5")


@query(
    "llm_source_overlap_kmv",
    f"""
    WITH {_KMV_SKETCH_SQL},
    side AS (SELECT source, max(sketch_size) AS ss, max(h) AS hmax
             FROM sk GROUP BY source),
    est AS (SELECT source,
                   round(CASE WHEN ss < {_KMV_K} THEN ss::DOUBLE
                         ELSE {_KMV_NUM} / hmax END, 4) AS est_distinct
            FROM side),
    pairs AS (SELECT a.source AS src_a, b.source AS src_b
              FROM (SELECT DISTINCT source FROM sk) a
              JOIN (SELECT DISTINCT source FROM sk) b ON a.source < b.source),
    fan AS (SELECT p.src_a, p.src_b, s.h, 1 AS fa, 0 AS fb
            FROM pairs p JOIN sk s ON s.source = p.src_a
            UNION ALL
            SELECT p.src_a, p.src_b, s.h, 0 AS fa, 1 AS fb
            FROM pairs p JOIN sk s ON s.source = p.src_b),
    uni AS (SELECT src_a, src_b, h, max(fa) AS in_a, max(fb) AS in_b
            FROM fan GROUP BY 1, 2, 3),
    topu AS (SELECT *, row_number() OVER (PARTITION BY src_a, src_b ORDER BY h) AS r
             FROM uni),
    st AS (SELECT src_a, src_b, count(*) AS ku, max(h) AS humax,
                  sum(in_a * in_b) AS matched
           FROM topu WHERE r <= {_KMV_K} GROUP BY 1, 2),
    o AS (SELECT src_a, src_b,
                 CASE WHEN ku < {_KMV_K} THEN ku::DOUBLE
                      ELSE {_KMV_NUM} / humax END AS eu,
                 matched::DOUBLE / ku AS jac
          FROM st)
    SELECT o.src_a, o.src_b,
           ea.est_distinct AS est_a, eb.est_distinct AS est_b,
           round(eu, 4) AS est_union,
           round(jac, 4) AS est_jaccard,
           round(jac * eu, 4) AS est_intersection
    FROM o
    JOIN est ea ON ea.source = o.src_a
    JOIN est eb ON eb.source = o.src_b
    """,
)
def llm_source_overlap_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-overlap matrix from KMV sketches alone
    (sketches.kmv_overlap): distinct / union / Jaccard / intersection
    estimates per source pair with the corpus touched ONCE (the sketch
    pass) — the all-pairs work runs on G²·k sketch rows, independent of
    corpus size. The exact alternative is a pairwise distinct-shingle
    intersection over the full corpus: O(G²·corpus)."""
    from delta_rs_spark.functions import sketches as K

    docs = _docs(spark, sf_dir)
    sk = K.kmv_sketch(docs, "source", "text", k=_KMV_K, hash_fn="md5")
    return K.kmv_overlap(sk, "source", k=_KMV_K)
