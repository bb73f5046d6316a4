"""DuckDB oracle SQL mirrors for the driver contract.

Every checked entry in :mod:`.contract` (``queries()`` +
``extra_queries()``) has its ANSI-SQL twin here: same tables, same
arithmetic (sequential float folds, md5-derived portable hashes, the
exact rounding discipline), aliased to the same column names, so the
driver's row-count + schema + value-hash compare is byte-meaningful.

Layout mirrors the operator families: ``_sq_*`` are reusable SQL
fragment builders (dot/norm/cosine, tokenization, shingles, MinHash,
PQ/SQ/BM25 CTEs); ``_oracle_*`` build one query's SQL; ``oracle_sql()``
is the registry the driver reads (re-exported by
``contract.oracle_sql``). Constants are imported from
:mod:`.contract` — the single source of truth for workload parameters —
which never imports this module at top level, so there is no cycle.
"""

from __future__ import annotations

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.functions import text as TX
from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators import (
    dedup as D,
    pq as PQ,
    textstats as T,
)

from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.contract import (  # noqa: E501
    BM25_B,
    BM25_K1,
    BM25Q_MOD,
    BM25Q_TOKENS,
    BQ_SHORTLIST,
    BUDGET_TOKENS,
    BULK_DIM,
    BULK_N,
    CHUNK_STRIDE,
    CHUNK_WORDS,
    CONTAM_N,
    CONTAM_PROBE_MOD,
    CONTAM_PROBE_TOKENS,
    CONTAM_THRESHOLD,
    CURATE_LANGS,
    CURATE_MAX_DUP,
    CURATE_MIN_QUALITY,
    DSIR_ALPHA,
    DSIR_BUCKETS,
    DUP_SPAN_N,
    EMB_NEAR_DUP_TAU,
    FILTER_LABEL,
    GRAPH_BEAM,
    GRAPH_DEG,
    GRAPH_ENTRIES,
    GRAPH_K,
    GRAPH_ROUNDS,
    GROUP_TOPK_K,
    HYBRID_K_EACH,
    HYBRID_W_DENSE,
    IVF_NPROBE,
    IVF_N_CENTROIDS,
    JACCARD_MIN,
    KMEANS_K,
    KNN_K,
    KNN_QUERIES,
    KFOLD_K,
    PORTABLE_SQL_FORECAST_REVENUE,
    PORTABLE_SQL_HOT_KEYS,
    PORTABLE_SQL_KNN_JOIN,
    PORTABLE_SQL_RANGE_SEARCH,
    PORTABLE_SQL_TOPK_COSINE,
    PORTABLE_SQL_PRIORITY_ORDERS,
    PQ_BEAM_RERANK,
    RANGE_COS_T,
    RANGE_L2_RADIUS,
    LANG_HEAD_DIM,
    LM_ALPHA,
    MAXSIM_K,
    MRL_M,
    MRL_SHORTLIST,
    LSH_PLANES,
    MINHASH_BANDS,
    MINHASH_N,
    MIX_TARGET,
    MIXPIPE_MIN_PCTL,
    MIXPIPE_TARGET,
    MULTIPROBE_BUCKETS,
    NEAR_DUP_THRESHOLD,
    N_SHARDS,
    PACK_SEQ_LEN,
    POOL_DOC_LIMIT,
    PPM_HEADER,
    PPM_W,
    PPM_H,
    PQ_KSUB,
    PQ_M,
    PROFILE_COLS,
    PQ_RERANK,
    PRICE_BANDS,
    RAG_DIM,
    RAG_K,
    RAG_QUESTION,
    RANK_EVAL_M,
    REPEAT_N,
    RRF_C,
    SAMPLE_RATES,
    SESSION_GAP_MIN,
    SHARD_PROBE,
    SHINGLE_N,
    SIMHASH_BITS,
    SIMHASH_BLOCKS,
    SIMHASH_MAX_HAMMING,
    SQ_RERANK,
    RP_OUT,
    TOPK_K,
    TOPNG_N,
    TOPNG_TOP,
    VIEW_CLICK_WINDOW_MIN,
    WAV_CH,
    WAV_FRAMES,
    WAV_RATE,
    WAV_SPEC_FRAME,
    _PERMS,
    _lang_head_artifact,
)


def _sq_dot(a: str, b: str) -> str:
    """Sequential-fold double dot product (mirrors functions.vector.dot)."""
    return (
        f"list_sum(list_transform({a}, (x, i) ->"
        f" CAST(x AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )

def _sq_norm(a: str) -> str:
    return f"sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"

def _sq_cosine(a: str, b: str) -> str:
    # per-side zero-only ε guard, mirroring functions.vector.cosine_sim
    return (
        f"({_sq_dot(a, b)} / (coalesce(nullif({_sq_norm(a)}, 0), 1e-12)"
        f" * coalesce(nullif({_sq_norm(b)}, 0), 1e-12)))"
    )

def _sq_l2sq(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform({a}, (x, i) ->"
        f" (CAST(x AS DOUBLE) - CAST({b}[i] AS DOUBLE))"
        f" * (CAST(x AS DOUBLE) - CAST({b}[i] AS DOUBLE))))"
    )

def _sq_score(a: str, b: str, metric: str) -> str:
    if metric == "cosine":
        return _sq_cosine(a, b)
    return f"(- {_sq_l2sq(a, b)})"

def _sq_vec(vec) -> str:
    return "([" + ", ".join(repr(float(x)) for x in vec) + "]::DOUBLE[])"

#: whitespace tokenization of trimmed text (mirrors functions.text.tokens)
_SQ_TOKS = r"regexp_split_to_array(trim(text), '\s+')"

#: portable 60-bit token hash (mirrors functions.text.portable_token_hash)
def _sq_tok_hash(t: str) -> str:
    return f"CAST(concat('0x', substr(md5({t}), 1, 15)) AS BIGINT)"

def _sq_shingles(toks: str, n: int) -> str:
    """Word n-gram shingles (mirrors functions.text.shingles)."""
    return (
        f"list_transform(range(1, greatest(len({toks}) - {n - 1}, 1) + 1),"
        f" i -> array_to_string(list_slice({toks}, i, i + {n - 1}), ' '))"
    )

def _sq_minhash_sig() -> str:
    """MinHash signature list literal over column ``tids`` (mirrors
    operators.dedup.minhash_signature with the shared perms)."""
    mins = ", ".join(
        f"list_min(list_transform(tids, x -> ({a} * x + {b}) % {D.MINHASH_PRIME}))"
        for a, b in _PERMS
    )
    return f"[{mins}]"

def _sq_tids_ctes_from(src: str) -> str:
    """shingle → dense-vocab tids CTEs over ``src`` (mirrors
    operators.dedup.shingle_tids_vocab — the vocabulary is built over
    exactly the rows the Spark side sees); exposes ``tids(doc_id, tids)``."""
    return f"""
__toks AS (SELECT doc_id, {_SQ_TOKS} AS t FROM {src}),
__sh AS (SELECT doc_id, unnest(list_distinct({_sq_shingles('t', SHINGLE_N)})) AS shingle FROM __toks),
__vocab AS (SELECT shingle, CAST(row_number() OVER (ORDER BY shingle) AS BIGINT) AS tid
            FROM (SELECT DISTINCT shingle FROM __sh)),
tids AS (SELECT doc_id, list(tid) AS tids FROM __sh JOIN __vocab USING (shingle) GROUP BY doc_id)
"""

_SQ_TIDS_CTES = _sq_tids_ctes_from("documents")

#: near-dup candidate+verify CTEs on top of ``tids``; exposes
#: ``near_pairs(id_a, id_b, jaccard)`` (unrounded jaccard, thresholded)
_SQ_NEAR_DUP_CTES = f"""
__sig AS (SELECT doc_id, tids, {_sq_minhash_sig()} AS sig FROM tids),
__bands AS (SELECT doc_id, j AS band,
                   array_to_string(list_transform(list_slice(sig, j * {MINHASH_N // MINHASH_BANDS} + 1,
                        (j + 1) * {MINHASH_N // MINHASH_BANDS}), x -> CAST(x AS VARCHAR)), '-') AS key
            FROM __sig, (SELECT unnest(range(0, {MINHASH_BANDS})) AS j)),
__cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           FROM __bands a JOIN __bands b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
near_pairs AS (
  SELECT id_a, id_b,
         CAST(len(list_intersect(ta.tids, tb.tids)) AS DOUBLE)
           / (len(ta.tids) + len(tb.tids) - len(list_intersect(ta.tids, tb.tids))) AS jaccard
  FROM __cand JOIN tids ta ON ta.doc_id = id_a JOIN tids tb ON tb.doc_id = id_b
  WHERE CAST(len(list_intersect(ta.tids, tb.tids)) AS DOUBLE)
           / (len(ta.tids) + len(tb.tids) - len(list_intersect(ta.tids, tb.tids))) >= {NEAR_DUP_THRESHOLD}
)
"""

#: simhash CTE; exposes ``sim(doc_id, simhash)`` (mirrors operators.dedup.simhash)
_SQ_SIMHASH_CTES = f"""
__h AS (SELECT doc_id, list_transform({_SQ_TOKS}, t -> {_sq_tok_hash('t')}) AS hs FROM documents),
__c AS (SELECT doc_id, list_transform(range(0, {SIMHASH_BITS}),
             j -> list_sum(list_transform(hs, h -> ((h >> j) & 1) * 2 - 1))) AS counts FROM __h),
sim AS (SELECT doc_id, CAST(list_sum(list_transform(range(0, {SIMHASH_BITS}),
             j -> CASE WHEN counts[j + 1] >= 0 THEN (1::BIGINT << j) ELSE 0::BIGINT END)) AS BIGINT) AS simhash
        FROM __c)
"""

def _r6(expr: str, name: str) -> str:
    return f"round({expr}, 6) + 0.0 AS {name}"

def _seq_dot(a, b) -> float:
    """Sequential double fold — the exact arithmetic both engines run."""
    s = 0.0
    for x, y in zip(a, b):
        s += float(x) * float(y)
    return s

def _oracle_model_lang_id() -> str:
    """Mirror of the trained head: hash-embed each doc in SQL, dot with
    the LITERAL weight columns from the same artifact, argmax with
    numpy's first-max tie rule (CASE chain in class order)."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.functions.embed import (
        NumpyLogisticHead,
    )

    head = NumpyLogisticHead(_lang_head_artifact(), dim=LANG_HEAD_DIM)
    d = LANG_HEAD_DIM
    th = _sq_tok_hash("t")
    scores = []
    for ci, cls in enumerate(head.classes):
        wc = _sq_vec(head.W[:, ci])
        scores.append(f"({_sq_dot('e', wc)} + {float(head.b[ci])!r}) AS s{ci}")
    # numpy argmax = first index attaining the max
    case = "CASE "
    for ci, cls in enumerate(head.classes):
        conds = [f"s{ci} >= s{cj}" for cj in range(len(head.classes)) if cj != ci]
        case += f"WHEN {' AND '.join(conds)} THEN '{cls}' " if conds else ""
    case += f"ELSE '{head.classes[-1]}' END"
    return f"""
WITH w AS (SELECT doc_id,
  CASE WHEN trim(text) = '' THEN []::VARCHAR[] ELSE {_SQ_TOKS} END AS w
  FROM documents),
raw AS (SELECT doc_id,
  list_transform(range(0, {d}), j -> CAST(coalesce(list_sum(
    list_transform(w, t -> CASE WHEN {th} % {d} = j
      THEN (CASE WHEN {th} % {2 * d} >= {d} THEN 1.0 ELSE -1.0 END)
      ELSE 0.0 END)), 0.0) AS DOUBLE)) AS rawv
  FROM w),
emb AS (SELECT doc_id,
  list_transform(rawv, x -> x / coalesce(nullif({_sq_norm('rawv')}, 0), 1e-12)) AS e
  FROM raw),
sc AS (SELECT doc_id, {', '.join(scores)} FROM emb)
SELECT doc_id, {case} AS model_lang FROM sc
"""

def _oracle_ppm_image_features() -> str:
    w, h = PPM_W, PPM_H
    n_bytes = len(PPM_HEADER) + w * h * 3
    pix = f"CAST((doc_id * 31 + y * {w} + x + 7 * c) % 256 AS DOUBLE)"
    lum_c = lambda c: f"CAST((doc_id * 31 + y * {w} + x + {7 * c}) % 256 AS DOUBLE)"  # noqa: E731
    luma = f"((0.299 * {lum_c(0)} + 0.587 * {lum_c(1)}) + 0.114 * {lum_c(2)})"
    return f"""
WITH px AS (
  SELECT doc_id, x, y, c, {pix} AS v
  FROM documents, range(0, {w}) tx(x), range(0, {h}) ty(y), range(0, 3) tc(c)
),
chan AS (SELECT doc_id, c, avg(v) AS m FROM px GROUP BY 1, 2),
chansd AS (
  SELECT px.doc_id, px.c, sqrt(avg(pow(px.v - chan.m, 2))) AS sd
  FROM px JOIN chan ON px.doc_id = chan.doc_id AND px.c = chan.c
  GROUP BY 1, 2
),
lum AS (
  SELECT doc_id, x, y, {luma} AS l
  FROM documents, range(0, {w}) tx(x), range(0, {h}) ty(y)
),
lstats AS (
  SELECT doc_id, avg(l) AS ml,
         avg(CASE WHEN floor(l / 64.0) = 0 THEN 1.0 ELSE 0.0 END) AS h0,
         avg(CASE WHEN floor(l / 64.0) = 1 THEN 1.0 ELSE 0.0 END) AS h1,
         avg(CASE WHEN floor(l / 64.0) = 2 THEN 1.0 ELSE 0.0 END) AS h2,
         avg(CASE WHEN floor(l / 64.0) = 3 THEN 1.0 ELSE 0.0 END) AS h3
  FROM lum GROUP BY 1
),
mm AS (SELECT doc_id, min(v) AS mn, max(v) AS mx FROM px GROUP BY 1),
fv AS (
  SELECT c0.doc_id, [
    {float(w)!r}, {float(h)!r}, {float(w) / float(h)!r},
    c0.m / 255.0, c1.m / 255.0, c2.m / 255.0,
    s0.sd / 255.0, s1.sd / 255.0, s2.sd / 255.0,
    l.ml / 255.0, l.h0, l.h1, l.h2, l.h3,
    mm.mn / 255.0, mm.mx / 255.0
  ]::DOUBLE[] AS f
  FROM chan c0
  JOIN chan c1 ON c0.doc_id = c1.doc_id AND c1.c = 1
  JOIN chan c2 ON c0.doc_id = c2.doc_id AND c2.c = 2
  JOIN chansd s0 ON c0.doc_id = s0.doc_id AND s0.c = 0
  JOIN chansd s1 ON c0.doc_id = s1.doc_id AND s1.c = 1
  JOIN chansd s2 ON c0.doc_id = s2.doc_id AND s2.c = 2
  JOIN lstats l ON c0.doc_id = l.doc_id
  JOIN mm ON c0.doc_id = mm.doc_id
  WHERE c0.c = 0
)
SELECT doc_id, {n_bytes} AS n_bytes, CAST(j AS INT) AS pos,
       {_r6('f[CAST(j + 1 AS BIGINT)]', 'val')}
FROM fv, range(0, 16) tj(j)
"""

def _oracle_jpeg_image_features() -> str:
    """Analytic mirror of the baseline-JPEG REAL-decode entry: the
    constant-block fixture round-trips the DCT exactly (DC quant 8 —
    see contract.JPEG_W), so the expected pixels are pure formulas of
    (doc_id, x, y): per-8x8-block luma, per-MCU chroma, then the SAME
    JFIF YCbCr->RGB arithmetic the decoder runs (floor(x+0.5), clamp)
    — the oracle never parses a single entropy-coded bit, so Huffman /
    DC-prediction / IDCT / upsample / color bugs all break the hash."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.contract import (
        JPEG_H,
        JPEG_W,
    )

    w, h = JPEG_W, JPEG_H
    yv = "CAST((doc_id * 37 + (y // 8) * 59 + (x // 8) * 17) % 256 AS DOUBLE)"
    cb = "CAST((doc_id * 7 + (x // 16) * 29 + 64) % 256 AS DOUBLE)"
    cr = "CAST((doc_id * 13 + (x // 16) * 53 + 192) % 256 AS DOUBLE)"
    clamp = lambda e: f"least(255.0, greatest(0.0, floor({e} + 0.5)))"  # noqa: E731
    return f"""
WITH ycc AS (
  SELECT doc_id, x, y, {yv} AS yv, {cb} AS cbv, {cr} AS crv
  FROM documents, range(0, {w}) tx(x), range(0, {h}) ty(y)
),
rgbpx AS (
  SELECT doc_id, x, y,
         {clamp('yv + 1.402 * (crv - 128)')} AS r,
         {clamp('yv - 0.344136 * (cbv - 128) - 0.714136 * (crv - 128)')} AS g,
         {clamp('yv + 1.772 * (cbv - 128)')} AS b
  FROM ycc
),
px AS (
  SELECT doc_id, x, y, c,
         CASE WHEN c = 0 THEN r WHEN c = 1 THEN g ELSE b END AS v
  FROM rgbpx, range(0, 3) tc(c)
),
chan AS (SELECT doc_id, c, avg(v) AS m FROM px GROUP BY 1, 2),
chansd AS (
  SELECT px.doc_id, px.c, sqrt(avg(pow(px.v - chan.m, 2))) AS sd
  FROM px JOIN chan ON px.doc_id = chan.doc_id AND px.c = chan.c
  GROUP BY 1, 2
),
lum AS (
  SELECT doc_id, x, y, ((0.299 * r + 0.587 * g) + 0.114 * b) AS l
  FROM rgbpx
),
lstats AS (
  SELECT doc_id, avg(l) AS ml,
         avg(CASE WHEN floor(l / 64.0) = 0 THEN 1.0 ELSE 0.0 END) AS h0,
         avg(CASE WHEN floor(l / 64.0) = 1 THEN 1.0 ELSE 0.0 END) AS h1,
         avg(CASE WHEN floor(l / 64.0) = 2 THEN 1.0 ELSE 0.0 END) AS h2,
         avg(CASE WHEN floor(l / 64.0) = 3 THEN 1.0 ELSE 0.0 END) AS h3
  FROM lum GROUP BY 1
),
mm AS (SELECT doc_id, min(v) AS mn, max(v) AS mx FROM px GROUP BY 1),
fv AS (
  SELECT c0.doc_id, [
    {float(w)!r}, {float(h)!r}, {float(w) / float(h)!r},
    c0.m / 255.0, c1.m / 255.0, c2.m / 255.0,
    s0.sd / 255.0, s1.sd / 255.0, s2.sd / 255.0,
    l.ml / 255.0, l.h0, l.h1, l.h2, l.h3,
    mm.mn / 255.0, mm.mx / 255.0
  ]::DOUBLE[] AS f
  FROM chan c0
  JOIN chan c1 ON c0.doc_id = c1.doc_id AND c1.c = 1
  JOIN chan c2 ON c0.doc_id = c2.doc_id AND c2.c = 2
  JOIN chansd s0 ON c0.doc_id = s0.doc_id AND s0.c = 0
  JOIN chansd s1 ON c0.doc_id = s1.doc_id AND s1.c = 1
  JOIN chansd s2 ON c0.doc_id = s2.doc_id AND s2.c = 2
  JOIN lstats l ON c0.doc_id = l.doc_id
  JOIN mm ON c0.doc_id = mm.doc_id
  WHERE c0.c = 0
)
SELECT doc_id, CAST(j AS INT) AS pos, {_r6('f[CAST(j + 1 AS BIGINT)]', 'val')}
FROM fv, range(0, 16) tj(j)
"""


def _oracle_png_image_features() -> str:
    """Analytic mirror of the PNG REAL-decode entry: the SAME pixel
    formula as the PPM oracle at the PNG geometry — the oracle never
    inflates the payload, so the decoder's zlib + filter
    reconstruction is independently checked; n_bytes excluded (deflate
    encoding detail, not decode contract)."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.contract import (
        PNG_H,
        PNG_W,
    )

    w, h = PNG_W, PNG_H
    pix = f"CAST((doc_id * 31 + y * {w} + x + 7 * c) % 256 AS DOUBLE)"
    lum_c = lambda c: f"CAST((doc_id * 31 + y * {w} + x + {7 * c}) % 256 AS DOUBLE)"  # noqa: E731
    luma = f"((0.299 * {lum_c(0)} + 0.587 * {lum_c(1)}) + 0.114 * {lum_c(2)})"
    return f"""
WITH px AS (
  SELECT doc_id, x, y, c, {pix} AS v
  FROM documents, range(0, {w}) tx(x), range(0, {h}) ty(y), range(0, 3) tc(c)
),
chan AS (SELECT doc_id, c, avg(v) AS m FROM px GROUP BY 1, 2),
chansd AS (
  SELECT px.doc_id, px.c, sqrt(avg(pow(px.v - chan.m, 2))) AS sd
  FROM px JOIN chan ON px.doc_id = chan.doc_id AND px.c = chan.c
  GROUP BY 1, 2
),
lum AS (
  SELECT doc_id, x, y, {luma} AS l
  FROM documents, range(0, {w}) tx(x), range(0, {h}) ty(y)
),
lstats AS (
  SELECT doc_id, avg(l) AS ml,
         avg(CASE WHEN floor(l / 64.0) = 0 THEN 1.0 ELSE 0.0 END) AS h0,
         avg(CASE WHEN floor(l / 64.0) = 1 THEN 1.0 ELSE 0.0 END) AS h1,
         avg(CASE WHEN floor(l / 64.0) = 2 THEN 1.0 ELSE 0.0 END) AS h2,
         avg(CASE WHEN floor(l / 64.0) = 3 THEN 1.0 ELSE 0.0 END) AS h3
  FROM lum GROUP BY 1
),
mm AS (SELECT doc_id, min(v) AS mn, max(v) AS mx FROM px GROUP BY 1),
fv AS (
  SELECT c0.doc_id, [
    {float(w)!r}, {float(h)!r}, {float(w) / float(h)!r},
    c0.m / 255.0, c1.m / 255.0, c2.m / 255.0,
    s0.sd / 255.0, s1.sd / 255.0, s2.sd / 255.0,
    l.ml / 255.0, l.h0, l.h1, l.h2, l.h3,
    mm.mn / 255.0, mm.mx / 255.0
  ]::DOUBLE[] AS f
  FROM chan c0
  JOIN chan c1 ON c0.doc_id = c1.doc_id AND c1.c = 1
  JOIN chan c2 ON c0.doc_id = c2.doc_id AND c2.c = 2
  JOIN chansd s0 ON c0.doc_id = s0.doc_id AND s0.c = 0
  JOIN chansd s1 ON c0.doc_id = s1.doc_id AND s1.c = 1
  JOIN chansd s2 ON c0.doc_id = s2.doc_id AND s2.c = 2
  JOIN lstats l ON c0.doc_id = l.doc_id
  JOIN mm ON c0.doc_id = mm.doc_id
  WHERE c0.c = 0
)
SELECT doc_id, CAST(j AS INT) AS pos,
       {_r6('f[CAST(j + 1 AS BIGINT)]', 'val')}
FROM fv, range(0, 16) tj(j)
"""

def _oracle_y4m_video_features() -> str:
    """Analytic mirror of the Y4M REAL-decode entry: every statistic
    recomputed from the luma formula (doc_id*7 + i*13 + y*W + x) mod
    256 over DuckDB ranges — the oracle never parses the stream."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.contract import (
        Y4M_FRAMES,
        Y4M_H,
        Y4M_W,
    )

    w, h, nf = Y4M_W, Y4M_H, Y4M_FRAMES
    hdr_len = len(b"YUV4MPEG2 W%d H%d F25:1 Cmono\n" % (w, h))
    n_bytes = hdr_len + nf * (6 + w * h)
    lum = f"CAST((doc_id * 7 + i * 13 + y * {w} + x) % 256 AS DOUBLE)"
    lum_prev = f"CAST((doc_id * 7 + (i - 1) * 13 + y * {w} + x) % 256 AS DOUBLE)"
    return f"""
WITH px AS (
  SELECT doc_id, i, y, x, {lum} AS v
  FROM documents, range(0, {nf}) ti(i), range(0, {h}) ty(y), range(0, {w}) tx(x)
),
m AS (SELECT doc_id, avg(v) AS mean_l, sqrt(avg(v * v) - avg(v) * avg(v)) AS std_l
      FROM px GROUP BY 1),
mo AS (
  SELECT doc_id, avg(abs({lum} - {lum_prev})) AS motion
  FROM documents, range(1, {nf}) ti(i), range(0, {h}) ty(y), range(0, {w}) tx(x)
  GROUP BY 1
)
SELECT m.doc_id, {w} AS width, {h} AS height, {nf} AS n_frames,
       25 AS fps_num, 1 AS fps_den,
       {_r6('m.mean_l', 'mean_luma')}, {_r6('m.std_l', 'std_luma')},
       {_r6('mo.motion', 'motion')},
       {n_bytes} AS n_bytes, TRUE AS is_real
FROM m JOIN mo ON m.doc_id = mo.doc_id
"""


def _oracle_wav_audio_features() -> str:
    frames, rate, ch = WAV_FRAMES, WAV_RATE, WAV_CH
    n_bytes = 44 + frames * ch * 2
    v = "CAST((doc_id * 13 + i * 5 + 911 * c + 17) % 60001 - 30000 AS DOUBLE)"
    return f"""
WITH s AS (
  SELECT doc_id, i, c, {v} AS v
  FROM documents, range(0, {frames}) ti(i), range(0, {ch}) tc(c)
),
allst AS (
  SELECT doc_id, avg(v) AS mean_v, sqrt(avg(v * v)) AS rms_v,
         max(abs(v)) AS peak_v, min(v) AS mn, max(v) AS mx,
         avg(CASE WHEN least(floor(abs(v) / 8192.0), 3) = 0 THEN 1.0 ELSE 0.0 END) AS b0,
         avg(CASE WHEN least(floor(abs(v) / 8192.0), 3) = 1 THEN 1.0 ELSE 0.0 END) AS b1,
         avg(CASE WHEN least(floor(abs(v) / 8192.0), 3) = 2 THEN 1.0 ELSE 0.0 END) AS b2,
         avg(CASE WHEN least(floor(abs(v) / 8192.0), 3) = 3 THEN 1.0 ELSE 0.0 END) AS b3
  FROM s GROUP BY 1
),
chrms AS (SELECT doc_id, c, sqrt(avg(v * v)) AS rmsc FROM s GROUP BY 1, 2),
z AS (
  SELECT doc_id, avg(CASE WHEN v * pv < 0 THEN 1.0 ELSE 0.0 END) AS zcr
  FROM (SELECT doc_id, v,
               lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
        FROM s WHERE c = 0) t
  WHERE pv IS NOT NULL GROUP BY 1
),
fv AS (
  SELECT a.doc_id, [
    {float(frames)!r}, {float(rate)!r}, {float(ch)!r}, {frames / rate!r},
    a.mean_v / 32768.0, a.rms_v / 32768.0, a.peak_v / 32768.0,
    z.zcr, r0.rmsc / 32768.0, r1.rmsc / 32768.0,
    a.b0, a.b1, a.b2, a.b3,
    a.mn / 32768.0, a.mx / 32768.0
  ]::DOUBLE[] AS f
  FROM allst a
  JOIN z ON a.doc_id = z.doc_id
  JOIN chrms r0 ON a.doc_id = r0.doc_id AND r0.c = 0
  JOIN chrms r1 ON a.doc_id = r1.doc_id AND r1.c = 1
)
SELECT doc_id, {n_bytes} AS n_bytes, CAST(j AS INT) AS pos,
       {_r6('f[CAST(j + 1 AS BIGINT)]', 'val')}
FROM fv, range(0, 16) tj(j)
"""


def _oracle_wav_spectral_features() -> str:
    """Whole DSP chain restated in SQL from the analytic sample
    formula (never parsing a byte): DFT by GROUP BY over a
    range(K)·range(N) lattice with the float sequence
    ``(2·pi())·(k·n)/N`` matching the Spark matmul's operand order,
    then centroid/bandwidth/rolloff/flatness/band fractions.  Sum
    ORDER differs from numpy only at ~1e-15 relative (pairwise vs
    sequential) — absorbed by round(6); the one threshold compare
    (rolloff's cum >= 0.85·total) has a MEASURED minimum relative
    margin of 0.15·total on the sf0.01 fixture (the DFT of the
    near-sawtooth sample formula concentrates power, so the crossing
    bin jumps past the threshold) — ~14 orders above any sum-order
    drift."""
    n_fr = WAV_FRAMES // WAV_SPEC_FRAME
    N = WAV_SPEC_FRAME
    K = N // 2 + 1
    return f"""
WITH s AS (
  SELECT doc_id, CAST(i // {N} AS INT) AS f, i % {N} AS n,
         CAST((doc_id * 13 + i * 5 + 17) % 60001 - 30000 AS DOUBLE) AS v
  FROM documents, range(0, {n_fr * N}) ti(i)
),
kt AS (SELECT unnest(range(0, {K})) AS k),
spec AS (
  SELECT doc_id, f, k,
         sum(v * cos((2 * pi()) * (k * n) / {float(N)!r})) AS re,
         sum(-(v * sin((2 * pi()) * (k * n) / {float(N)!r}))) AS im
  FROM s, kt GROUP BY 1, 2, 3
),
pw AS (SELECT doc_id, f, k, re * re + im * im AS p,
              sqrt(re * re + im * im) AS m,
              k * {float(WAV_RATE)!r} / {float(N)!r} AS fk
       FROM spec),
agg AS (SELECT doc_id, f, sum(m) AS msum, sum(p) AS psum, sum(m * fk) AS mfk
        FROM pw GROUP BY 1, 2),
cen AS (SELECT doc_id, f, msum, psum,
               CASE WHEN msum > 0 THEN mfk / msum ELSE 0.0 END AS c
        FROM agg),
bw AS (SELECT p.doc_id, p.f,
              CASE WHEN c.msum > 0
                   THEN sqrt(sum(p.m * (p.fk - c.c) * (p.fk - c.c)) / c.msum)
                   ELSE 0.0 END AS bwv
       FROM pw p JOIN cen c ON p.doc_id = c.doc_id AND p.f = c.f
       GROUP BY p.doc_id, p.f, c.msum, c.c),
flat AS (SELECT doc_id, f,
                exp(avg(ln(p + 1e-12))) / (avg(p) + 1e-12) AS fl
         FROM pw WHERE k >= 1 GROUP BY 1, 2),
roll AS (
  SELECT doc_id, f, min(fk) AS rl FROM (
    SELECT doc_id, f, fk,
           sum(p) OVER (PARTITION BY doc_id, f ORDER BY k
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           sum(p) OVER (PARTITION BY doc_id, f) AS tot
    FROM pw) t
  WHERE cum >= 0.85 * tot GROUP BY 1, 2),
bd AS (SELECT doc_id, f, least(k // 4, 3) AS b, sum(p) AS pb
       FROM pw GROUP BY 1, 2, 3),
bfr AS (SELECT doc_id, f,
               sum(CASE WHEN b = 0 THEN pb END) AS e0,
               sum(CASE WHEN b = 1 THEN pb END) AS e1,
               sum(CASE WHEN b = 2 THEN pb END) AS e2,
               sum(CASE WHEN b = 3 THEN pb END) AS e3
        FROM bd GROUP BY 1, 2),
tstats AS (SELECT doc_id, f, sqrt(avg(v * v)) / 32768.0 AS rms,
                  avg(v) / 32768.0 AS dc
           FROM s GROUP BY 1, 2),
z AS (SELECT doc_id, f,
             avg(CASE WHEN v * pv < 0 THEN 1.0 ELSE 0.0 END) AS zcr
      FROM (SELECT doc_id, f, v,
                   lag(v) OVER (PARTITION BY doc_id, f ORDER BY n) AS pv
            FROM s) t
      WHERE pv IS NOT NULL GROUP BY 1, 2)
SELECT t.doc_id, t.f AS frame_idx,
       {_r6('t.rms', 'rms')}, {_r6('t.dc', 'dc')}, {_r6('z.zcr', 'zcr')},
       {_r6('c.c', 'centroid_hz')}, {_r6('bw.bwv', 'bandwidth_hz')},
       {_r6('CASE WHEN c.psum > 0 THEN roll.rl ELSE 0.0 END', 'rolloff_hz')},
       {_r6('flat.fl', 'flatness')},
       {_r6('CASE WHEN c.psum > 0 THEN bfr.e0 / c.psum ELSE 0.0 END', 'b0')},
       {_r6('CASE WHEN c.psum > 0 THEN bfr.e1 / c.psum ELSE 0.0 END', 'b1')},
       {_r6('CASE WHEN c.psum > 0 THEN bfr.e2 / c.psum ELSE 0.0 END', 'b2')},
       {_r6('CASE WHEN c.psum > 0 THEN bfr.e3 / c.psum ELSE 0.0 END', 'b3')}
FROM tstats t
JOIN z ON t.doc_id = z.doc_id AND t.f = z.f
JOIN cen c ON t.doc_id = c.doc_id AND t.f = c.f
JOIN bw ON t.doc_id = bw.doc_id AND t.f = bw.f
JOIN flat ON t.doc_id = flat.doc_id AND t.f = flat.f
JOIN roll ON t.doc_id = roll.doc_id AND t.f = roll.f
JOIN bfr ON t.doc_id = bfr.doc_id AND t.f = bfr.f
"""


def _oracle_video_frames() -> str:
    # stub strides: frame_bytes=64, every_n=10 → stride 640; one frame
    # per stride offset over max(len, 1) bytes (ASCII corpus: VARCHAR
    # slicing == byte slicing)
    stride, fb = 64 * 10, 64
    return f"""
WITH p AS (SELECT doc_id, text AS s, greatest(octet_length(encode(text)), 1) AS n FROM documents),
idx AS (SELECT doc_id, s, unnest(range(0, CAST(ceil(n / {float(stride)}) AS BIGINT))) AS i FROM p)
SELECT doc_id, CAST(i AS INT) AS frame_idx,
       octet_length(encode(substring(s, CAST(i * {stride} + 1 AS BIGINT), {fb}))) AS n_frame_bytes,
       md5(substring(s, CAST(i * {stride} + 1 AS BIGINT), {fb})) AS frame_md5
FROM idx
"""

def _oracle_image_features() -> str:
    # stub decode: feature j = sha256 digest byte j scaled to [-1, 1];
    # digest byte j = hex pair (2j+1, 2j+2) of the hex digest.
    # Exploded to scalar rows to mirror the Spark side's posexplode.
    d = 16
    byte_j = (
        "CAST(CAST(concat('0x', substr(sha256(text), CAST(j * 2 + 1 AS BIGINT), 2))"
        " AS BIGINT) AS DOUBLE)"
    )
    return f"""
WITH j AS (SELECT unnest(range(0, {d})) AS j)
SELECT doc_id,
  octet_length(encode(text)) AS n_bytes,
  CAST(j AS INT) AS pos,
  {_r6(f'({byte_j} / 255.0) * 2.0 - 1.0', 'val')}
FROM documents, j
"""

def _oracle_binary_meta() -> str:
    return """
SELECT doc_id, octet_length(encode(text)) AS n_bytes, sha256(text) AS content_id
FROM documents
"""

def _oracle_bulk_random_load() -> str:
    # Exploded to scalar (pos, val) rows to mirror the Spark side's
    # posexplode (driver canon cannot hash array cells).
    n, d = BULK_N, BULK_DIM
    h = "CAST(concat('0x', substr(md5(concat_ws('-', '42', CAST(vec_id AS VARCHAR), CAST(j AS VARCHAR))), 1, 15)) AS BIGINT)"
    return f"""
WITH ids AS (SELECT unnest(range(0, {n})) AS vec_id),
raw AS (SELECT vec_id,
  list_transform(range(0, {d}), j ->
    (CAST({h} AS DOUBLE) / 1152921504606846976.0) * 2.0 - 1.0) AS c
  FROM ids),
norm AS (SELECT vec_id,
  list_transform(c, x -> x / coalesce(nullif({_sq_norm('c')}, 0), 1e-12)) AS e
  FROM raw),
expl AS (SELECT vec_id, unnest(range(0, {d})) AS pos FROM norm),
j AS (SELECT e.vec_id, x.pos, e.e[x.pos + 1] AS v
      FROM norm e JOIN expl x ON e.vec_id = x.vec_id)
SELECT vec_id, CAST(pos AS INT) AS pos, {_r6('v', 'val')}
FROM j
"""

def _oracle_collection_stats() -> str:
    return """
SELECT count(*) AS n_vectors,
       min(len(embedding)) AS dim_min,
       max(len(embedding)) AS dim_max
FROM embeddings
"""

def _oracle_topk(metric: str) -> str:
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
scored AS (SELECT vec_id, {_sq_score('embedding', 'qv', metric)} AS s FROM embeddings, q)
SELECT vec_id, {_r6('s', 'score')} FROM scored ORDER BY s DESC, vec_id LIMIT {TOPK_K}
"""

def _oracle_shard_pruned_topk() -> str:
    # stored vectors are NORMALIZED at write (prepare: normalize-on-write),
    # so the mirror scores the normalized list against the raw query
    norm_e = (
        f"list_transform(embedding, x -> CAST(x AS DOUBLE)"
        f" / coalesce(nullif({_sq_norm('embedding')}, 0), 1e-12))"
    )
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
n AS (SELECT vec_id, {norm_e} AS e FROM embeddings
      WHERE len(embedding) = 64 AND vec_id % {N_SHARDS} = {SHARD_PROBE}),
scored AS (SELECT vec_id, {_sq_cosine('e', 'qv')} AS s FROM n, q)
SELECT vec_id, {_r6('s', 'score')} FROM scored ORDER BY s DESC, vec_id LIMIT {TOPK_K}
"""

def _oracle_sharded_topk() -> str:
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
scored AS (SELECT vec_id, CAST(vec_id % {N_SHARDS} AS INT) AS shard,
                  {_sq_cosine('embedding', 'qv')} AS s FROM embeddings, q),
ranked AS (SELECT *, row_number() OVER (PARTITION BY shard ORDER BY s DESC, vec_id) AS rn FROM scored)
SELECT vec_id, shard, {_r6('s', 'score')} FROM ranked
WHERE rn <= {TOPK_K} ORDER BY s DESC, vec_id LIMIT {TOPK_K}
"""

def _oracle_knn() -> str:
    return f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < {KNN_QUERIES}),
scored AS (SELECT qid, e.vec_id AS neighbor_id, {_sq_cosine('e.embedding', 'qv')} AS s
           FROM embeddings e, q),
ranked AS (SELECT qid, neighbor_id, s,
                  CAST(row_number() OVER (PARTITION BY qid ORDER BY s DESC, neighbor_id) AS INT) AS rank
           FROM scored)
SELECT qid, neighbor_id, {_r6('s', 'score')}, rank FROM ranked WHERE rank <= {KNN_K}
"""

def _oracle_knn_grouped() -> str:
    return f"""
WITH q AS (SELECT label, vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < {KNN_QUERIES}),
scored AS (SELECT q.label, qid, e.vec_id AS neighbor_id, {_sq_cosine('e.embedding', 'qv')} AS s
           FROM embeddings e JOIN q ON e.label = q.label),
ranked AS (SELECT label, qid, neighbor_id, s,
                  CAST(row_number() OVER (PARTITION BY qid ORDER BY s DESC, neighbor_id) AS INT) AS rank
           FROM scored)
SELECT label, qid, neighbor_id, {_r6('s', 'score')}, rank FROM ranked WHERE rank <= {KNN_K}
"""

def _sq_bucket(vec_expr: str) -> str:
    terms = [
        f"(CASE WHEN {_sq_dot(vec_expr, _sq_vec(p))} > 0 THEN {1 << j}::BIGINT ELSE 0::BIGINT END)"
        for j, p in enumerate(LSH_PLANES)
    ]
    return "(" + " + ".join(terms) + ")"

def _oracle_lsh_topk() -> str:
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
qb AS (SELECT {_sq_bucket('qv')} AS qbucket FROM q),
cand AS (SELECT vec_id, embedding FROM embeddings, qb WHERE {_sq_bucket('embedding')} = qb.qbucket),
scored AS (SELECT vec_id, {_sq_cosine('embedding', 'qv')} AS s FROM cand, q)
SELECT vec_id, {_r6('s', 'score')} FROM scored ORDER BY s DESC, vec_id LIMIT {TOPK_K}
"""

def _oracle_lsh_topk_filtered() -> str:
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
qb AS (SELECT {_sq_bucket('qv')} AS qbucket FROM q),
cand AS (SELECT vec_id, embedding FROM embeddings, qb
         WHERE {_sq_bucket('embedding')} = qb.qbucket AND label = {FILTER_LABEL}),
scored AS (SELECT vec_id, {_sq_cosine('embedding', 'qv')} AS s FROM cand, q)
SELECT vec_id, {_r6('s', 'score')} FROM scored ORDER BY s DESC, vec_id LIMIT {TOPK_K}
"""

def _oracle_ivf_topk() -> str:
    return f"""
WITH cent AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < {IVF_N_CENTROIDS}),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
assign AS (SELECT e.vec_id, e.embedding,
                  c.cid,
                  row_number() OVER (PARTITION BY e.vec_id ORDER BY {_sq_l2sq('e.embedding', 'c.cv')}, c.cid) AS rn
           FROM embeddings e, cent c),
cells AS (SELECT vec_id, embedding, cid AS ivf_cell FROM assign WHERE rn = 1),
probe AS (SELECT cid FROM (SELECT c.cid, row_number() OVER (ORDER BY {_sq_l2sq('qv', 'c.cv')}, c.cid) AS rn
                           FROM cent c, q) WHERE rn <= {IVF_NPROBE}),
cand AS (SELECT vec_id, embedding FROM cells WHERE ivf_cell IN (SELECT cid FROM probe)),
scored AS (SELECT vec_id, {_sq_cosine('embedding', 'qv')} AS s FROM cand, q)
SELECT vec_id, {_r6('s', 'score')} FROM scored ORDER BY s DESC, vec_id LIMIT {TOPK_K}
"""

def _oracle_ivf_knn_join() -> str:
    return f"""
WITH cent AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < {IVF_N_CENTROIDS}),
qs AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < {KNN_QUERIES}),
assign AS (SELECT e.vec_id, e.embedding, c.cid,
                  row_number() OVER (PARTITION BY e.vec_id ORDER BY {_sq_l2sq('e.embedding', 'c.cv')}, c.cid) AS rn
           FROM embeddings e, cent c),
cells AS (SELECT vec_id, embedding, cid AS ivf_cell FROM assign WHERE rn = 1),
probe AS (SELECT qid, cid FROM
            (SELECT qs.qid, c.cid,
                    row_number() OVER (PARTITION BY qs.qid ORDER BY {_sq_l2sq('qs.qv', 'c.cv')}, c.cid) AS rn
             FROM qs, cent c)
          WHERE rn <= {IVF_NPROBE}),
cand AS (SELECT p.qid, cl.vec_id, cl.embedding, qs.qv
         FROM probe p JOIN cells cl ON cl.ivf_cell = p.cid
                      JOIN qs ON qs.qid = p.qid),
scored AS (SELECT qid, vec_id, {_sq_cosine('embedding', 'qv')} AS s FROM cand),
ranked AS (SELECT qid, vec_id, s,
                  CAST(row_number() OVER (PARTITION BY qid ORDER BY s DESC, vec_id) AS INT) AS rank
           FROM scored)
SELECT qid, vec_id, {_r6('s', 'score')}, rank FROM ranked WHERE rank <= {KNN_K}
"""

def _oracle_topk_filtered() -> str:
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
scored AS (SELECT vec_id, {_sq_cosine('embedding', 'qv')} AS s
           FROM embeddings, q WHERE label = {FILTER_LABEL})
SELECT vec_id, {_r6('s', 'score')} FROM scored ORDER BY s DESC, vec_id LIMIT {TOPK_K}
"""

def _oracle_recall_ivf() -> str:
    return f"""
WITH cent AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < {IVF_N_CENTROIDS}),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
exact AS (SELECT vec_id FROM (SELECT vec_id, {_sq_cosine('embedding', 'qv')} AS s FROM embeddings, q)
          ORDER BY s DESC, vec_id LIMIT {TOPK_K}),
assign AS (SELECT e.vec_id, e.embedding, c.cid,
                  row_number() OVER (PARTITION BY e.vec_id ORDER BY {_sq_l2sq('e.embedding', 'c.cv')}, c.cid) AS rn
           FROM embeddings e, cent c),
cells AS (SELECT vec_id, embedding, cid AS ivf_cell FROM assign WHERE rn = 1),
probe AS (SELECT cid FROM (SELECT c.cid, row_number() OVER (ORDER BY {_sq_l2sq('q.qv', 'c.cv')}, c.cid) AS rn
                           FROM cent c, q) WHERE rn <= {IVF_NPROBE}),
approx AS (SELECT vec_id FROM (SELECT vec_id, {_sq_cosine('embedding', 'qv')} AS s
                               FROM cells, q WHERE ivf_cell IN (SELECT cid FROM probe))
           ORDER BY s DESC, vec_id LIMIT {TOPK_K})
SELECT count(*) / {float(TOPK_K)} AS recall FROM approx JOIN exact USING (vec_id)
"""

def _sq_rp_list(src_vec: str = "embedding") -> str:
    """DuckDB list expression for the sign-random-projection of a
    64-dim vector — SAME md5-parity matrix, SAME left-to-right signed
    summation order as operators.projection.project_expr, re-derived
    here (no artifact exchange: the matrix is a function of the dims
    alone)."""
    import math

    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.projection import (
        sign_matrix,
    )

    signs = sign_matrix(64, RP_OUT)
    scale = repr(1.0 / math.sqrt(RP_OUT))
    dims = []
    for row in signs:
        terms = []
        for d, sgn in enumerate(row):
            op = "+" if sgn > 0 else "-"
            terms.append(f"{op} CAST({src_vec}[{d + 1}] AS DOUBLE)")
        expr = " ".join(terms)
        if expr.startswith("+ "):
            expr = expr[2:]
        dims.append(f"({expr}) * {scale}")
    return "[" + ", ".join(dims) + "]"


def _oracle_more_like_these() -> str:
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.contract import (
        MLT_SEEDS,
    )

    ids = ", ".join(str(i) for i in MLT_SEEDS)
    return f"""
WITH cm AS (SELECT i, avg(CAST(embedding[i] AS DOUBLE)) AS v
            FROM embeddings, unnest(range(1, 65)) AS u(i)
            WHERE vec_id IN ({ids}) GROUP BY i),
c AS (SELECT list(v ORDER BY i) AS cv FROM cm),
scored AS (SELECT vec_id, {_sq_cosine('embedding', 'cv')} AS s
           FROM embeddings, c WHERE vec_id NOT IN ({ids}))
SELECT vec_id, {_r6('s', 'score')} FROM scored ORDER BY s DESC, vec_id LIMIT {TOPK_K}
"""


def _oracle_grep_many() -> str:
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.contract import (
        GREP_PATTERNS,
    )

    vals = ", ".join(f"('{p}')" for p in GREP_PATTERNS)
    return f"""
SELECT p.pattern, d.doc_id
FROM documents d JOIN (VALUES {vals}) p(pattern)
  ON contains(d.text, p.pattern)
ORDER BY p.pattern, d.doc_id
"""


def _oracle_grep_like() -> str:
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.contract import (
        GREP_LIKE_PATTERN,
    )

    return f"""
SELECT doc_id FROM documents WHERE text LIKE '{GREP_LIKE_PATTERN}'
ORDER BY doc_id
"""


def _oracle_grep_corpus() -> str:
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.contract import (
        GREP_PATTERN,
    )

    return f"""
SELECT doc_id FROM documents WHERE contains(text, '{GREP_PATTERN}')
ORDER BY doc_id
"""


def _oracle_hot_keys() -> str:
    return f"""
WITH c AS (SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS n_rows
           FROM events GROUP BY 1),
t AS (SELECT sum(n_rows) AS tt, count(*) AS kk FROM c),
topn AS (SELECT key, n_rows FROM c ORDER BY n_rows DESC, key ASC NULLS FIRST LIMIT 20)
SELECT key, CAST(n_rows AS BIGINT) AS n_rows,
       {_r6('n_rows / t.tt', 'share')},
       {_r6('sum(n_rows) OVER (ORDER BY n_rows DESC, key ASC NULLS FIRST ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / t.tt', 'cum_share')},
       {_r6('n_rows * t.kk / t.tt', 'skew')}
FROM topn, t
"""


def _oracle_rp_topk() -> str:
    return f"""
WITH pe AS (SELECT vec_id, {_sq_rp_list()} AS rp FROM embeddings),
q AS (SELECT rp AS qv FROM pe WHERE vec_id = 0),
scored AS (SELECT vec_id, {_sq_cosine('rp', 'qv')} AS s FROM pe, q)
SELECT vec_id, {_r6('s', 'score')} FROM scored ORDER BY s DESC, vec_id LIMIT {TOPK_K}
"""


def _oracle_rp_knn_join() -> str:
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.contract import (
        KNN_K,
        KNN_QUERIES,
        RP_SHORTLIST,
    )

    return f"""
WITH pe AS (SELECT vec_id, embedding, {_sq_rp_list()} AS rp FROM embeddings),
pq AS (SELECT vec_id AS qid, embedding AS qv, rp AS rq FROM pe WHERE vec_id < {KNN_QUERIES}),
sl AS (SELECT qid, pe.vec_id AS neighbor_id,
              row_number() OVER (PARTITION BY qid
                                 ORDER BY {_sq_cosine('pe.rp', 'rq')} DESC, pe.vec_id) AS rn
       FROM pe, pq),
cand AS (SELECT qid, neighbor_id FROM sl WHERE rn <= {RP_SHORTLIST}),
rer AS (SELECT cand.qid, cand.neighbor_id,
               {_sq_cosine('e.embedding', 'q.qv')} AS s
        FROM cand
        JOIN embeddings e ON e.vec_id = cand.neighbor_id
        JOIN pq q ON q.qid = cand.qid),
ranked AS (SELECT qid, neighbor_id, s,
                  CAST(row_number() OVER (PARTITION BY qid ORDER BY s DESC, neighbor_id) AS INT) AS rank
           FROM rer)
SELECT qid, neighbor_id, {_r6('s', 'score')}, rank FROM ranked WHERE rank <= {KNN_K}
"""


def _oracle_recall_rp() -> str:
    return f"""
WITH qe AS (SELECT embedding AS qv64 FROM embeddings WHERE vec_id = 0),
exact AS (SELECT vec_id FROM (SELECT vec_id, {_sq_cosine('embedding', 'qv64')} AS s FROM embeddings, qe)
          ORDER BY s DESC, vec_id LIMIT {TOPK_K}),
pe AS (SELECT vec_id, {_sq_rp_list()} AS rp FROM embeddings),
q AS (SELECT rp AS qv FROM pe WHERE vec_id = 0),
approx AS (SELECT vec_id FROM (SELECT vec_id, {_sq_cosine('rp', 'qv')} AS s FROM pe, q)
           ORDER BY s DESC, vec_id LIMIT {TOPK_K})
SELECT count(*) / {float(TOPK_K)} AS recall FROM approx JOIN exact USING (vec_id)
"""


def _oracle_recall_lsh() -> str:
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
exact AS (SELECT vec_id FROM (SELECT vec_id, {_sq_cosine('embedding', 'qv')} AS s FROM embeddings, q)
          ORDER BY s DESC, vec_id LIMIT {TOPK_K}),
qb AS (SELECT {_sq_bucket('qv')} AS qbucket FROM q),
cand AS (SELECT vec_id, embedding FROM embeddings, qb WHERE {_sq_bucket('embedding')} = qb.qbucket),
approx AS (SELECT vec_id FROM (SELECT vec_id, {_sq_cosine('embedding', 'qv')} AS s FROM cand, q)
           ORDER BY s DESC, vec_id LIMIT {TOPK_K})
SELECT count(*) / {float(TOPK_K)} AS recall FROM approx JOIN exact USING (vec_id)
"""

def _sq_graph_beam_adc_ctes() -> str:
    """Compressed-domain scoring feed for the beam mirror: the PQ
    encode CTEs (the _sq_pq_ctes recipe: codebooks = subspace slices
    of the first PQ_KSUB rows, per-subspace argmin codes), a LUT PER
    QUERY (gq instead of the single-query q), and ``adcall(qid, node,
    s)`` MATERIALIZED — every (query, node) ADC score, which the
    unrolled rounds then just equi-join (the Spark side computes ADC
    only for traversed candidates; values agree wherever evaluated
    because both are the same list_sum/aggregate fold over the same
    LUT doubles, the hash-green pq_topk precedent)."""
    dsub = 64 // PQ_M
    sl_e = f"list_slice(e.embedding, s.j * {dsub} + 1, (s.j + 1) * {dsub})"
    sl_c = f"list_slice(c.cv, s.j * {dsub} + 1, (s.j + 1) * {dsub})"
    sl_q = f"list_slice(gq.qv, s.j * {dsub} + 1, (s.j + 1) * {dsub})"
    return f"""
gcb AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < {PQ_KSUB}),
gsub AS (SELECT unnest(range(0, {PQ_M})) AS j),
__gpqd AS (SELECT e.vec_id, s.j, c.cid, {_sq_l2sq(sl_e, sl_c)} AS d
          FROM embeddings e, gsub s, gcb c),
__gpqc AS (SELECT vec_id, j, cid FROM (
            SELECT vec_id, j, cid, row_number() OVER (PARTITION BY vec_id, j ORDER BY d, cid) AS rn
            FROM __gpqd) WHERE rn = 1),
__gpqcode AS (SELECT vec_id, list(cid ORDER BY j) AS code FROM __gpqc GROUP BY vec_id),
__glutv AS (SELECT gq.qid, s.j, c.cid, {_sq_dot(sl_q, sl_c)} AS v FROM gsub s, gcb c, gq),
__glut AS (SELECT qid, list(l ORDER BY j) AS lut FROM (
              SELECT qid, j, list(v ORDER BY cid) AS l FROM __glutv GROUP BY qid, j) GROUP BY qid),
adcall AS MATERIALIZED (SELECT q.qid, e.vec_id AS node,
                     list_sum(list_transform(range(0, {PQ_M}),
                              j -> q.lut[j + 1][e.code[j + 1] + 1])) AS s
              FROM __gpqcode e, __glut q)"""


def _sq_graph_beam_ctes(
    score: str = "cosine",
    entries_sql: str | None = None,
    pre_sql: str | None = None,
    sc0_sql: str | None = None,
) -> str:
    """Graph-ANN serving mirror (operators/graph_ann.graph_beam_search
    with explicit entries): the exact deg-GRAPH_DEG cosine kNN graph
    (self excluded before ranking — same pair frame both engines),
    then every fixed beam round unrolled as MATERIALIZED CTEs (the
    part_pagerank/part_communities precedent — DuckDB inlines CTEs by
    default and an un-pinned unrolled iteration goes combinatorial).
    Per round, exactly the Spark dataflow: frontier = unexpanded beam
    rows, neighbor expansion via the edge equi-join (DISTINCT), the
    seen anti-join (NOT EXISTS), the sequential-double-fold cosine
    score, then the (score DESC, node ASC) top-GRAPH_BEAM window with
    all prior beam rows flipped to expanded.  Exposes ``bfin(qid,
    node, s)`` = the final beam and ``scall`` = every scored pair.

    ``score='adc'`` swaps the cosine for the compressed-domain PQ
    lookup (the graph_beam_search_pq tier): the materialized
    ``adcall`` all-pairs feed (:func:`_sq_graph_beam_adc_ctes`)
    replaces the inline fold, every other CTE identical."""
    if score == "adc":
        adc = _sq_graph_beam_adc_ctes() + ","
        sc0 = f"""sc0 AS MATERIALIZED (SELECT a.qid, a.node, a.s
      FROM adcall a JOIN gent ON gent.node = a.node)"""
    else:
        adc = ""
        sc0 = f"""sc0 AS MATERIALIZED (SELECT gq.qid, gent.node, {_sq_cosine('gq.qv', 'e.embedding')} AS s
      FROM gq CROSS JOIN gent JOIN embeddings e ON e.vec_id = gent.node)"""
    if sc0_sql is not None:
        # per-query entry feed (the hnsw descent): sc0 comes from the
        # caller's CTE chain (inserted via pre_sql); gent goes unused
        sc0 = f"sc0 AS MATERIALIZED ({sc0_sql})"
    head = f"""gq AS MATERIALIZED (SELECT vec_id AS qid, embedding AS qv FROM embeddings
       WHERE vec_id < {KNN_QUERIES}),
gpair AS MATERIALIZED (SELECT a.vec_id AS node, b.vec_id AS nbr,
         {_sq_cosine('a.embedding', 'b.embedding')} AS gs
         FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
gedges AS MATERIALIZED (SELECT node, nbr FROM (
         SELECT node, nbr, row_number() OVER (PARTITION BY node ORDER BY gs DESC, nbr) AS rn
         FROM gpair) WHERE rn <= {GRAPH_DEG}),
{entries_sql or f"gent AS (SELECT vec_id AS node FROM embeddings WHERE vec_id < {GRAPH_ENTRIES})"},
{(pre_sql.strip() + ",") if pre_sql else ""}
{adc}
{sc0},
b0 AS MATERIALIZED (SELECT qid, node, s, FALSE AS exp FROM (
      SELECT qid, node, s, row_number() OVER (PARTITION BY qid ORDER BY s DESC, node) AS rn
      FROM sc0) WHERE rn <= {GRAPH_BEAM}),
seen0 AS MATERIALIZED (SELECT qid, node FROM sc0)"""
    if score == "adc":
        sci = """SELECT n.qid, n.node, a.s
      FROM n{i} n JOIN adcall a ON a.qid = n.qid AND a.node = n.node"""
    else:
        sci = (
            "SELECT n.qid, n.node, "
            + _sq_cosine("gq.qv", "e.embedding")
            + """ AS s
      FROM n{i} n JOIN embeddings e ON e.vec_id = n.node JOIN gq ON gq.qid = n.qid"""
        )
    rounds = [head]
    for i in range(1, GRAPH_ROUNDS + 1):
        p = i - 1
        rounds.append(f"""n{i} AS (SELECT DISTINCT f.qid, g.nbr AS node
      FROM (SELECT qid, node FROM b{p} WHERE NOT exp) f
      JOIN gedges g ON g.node = f.node),
sc{i} AS MATERIALIZED ({sci.format(i=i)}
      WHERE NOT EXISTS (SELECT 1 FROM seen{p} sn WHERE sn.qid = n.qid AND sn.node = n.node)),
b{i} AS MATERIALIZED (SELECT qid, node, s, exp FROM (
      SELECT qid, node, s, exp, row_number() OVER (PARTITION BY qid ORDER BY s DESC, node) AS rn
      FROM (SELECT qid, node, s, TRUE AS exp FROM b{p}
            UNION ALL SELECT qid, node, s, FALSE AS exp FROM sc{i})) WHERE rn <= {GRAPH_BEAM}),
seen{i} AS MATERIALIZED (SELECT qid, node FROM seen{p}
      UNION ALL SELECT qid, node FROM sc{i})""")
    body = ",\n".join(rounds)
    scall = " UNION ALL ".join(
        f"SELECT qid, node, s FROM sc{i}" for i in range(GRAPH_ROUNDS + 1)
    )
    return f"""{body},
bfin AS (SELECT qid, node, s FROM b{GRAPH_ROUNDS}),
scall AS ({scall})"""


def _sq_hnsw_ctes() -> tuple[str, str]:
    """HNSW coarse-to-fine mirror (operators/hnsw.py): portable
    integer-geometric layer assignment over the 60-bit hash of the id
    STRING, exact deg-HNSW_DEG kNN graph per upper layer, the static
    entry fallback chain (highest occupied layer's lowest ids), then
    every fixed descent hop unrolled — entry scoring → per-hop
    neighbor expansion → DISTINCT-deduped top-HNSW_WIDTH merge (a
    re-reached node re-scores to the identical value, so DISTINCT on
    (qid, node, s) is exact). Returns ``(cte_block, final_cte_name)``;
    the final CTE holds the per-query base-layer entries and plugs
    into :func:`_sq_graph_beam_ctes` as ``sc0_sql``. Requires ``gq``
    (defined by the beam head before this block is inserted)."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.contract import (
        HNSW_DEG,
        HNSW_ENTRY_CAP,
        HNSW_HOPS,
        HNSW_MAX_LAYER,
        HNSW_SCALE_C,
        HNSW_WIDTH,
    )

    cosab = _sq_cosine("a.embedding", "b.embedding")
    th = _sq_tok_hash("CAST(vec_id AS VARCHAR)")
    lvl = " + ".join(
        f"(CASE WHEN ({th}) % {HNSW_SCALE_C**l} = 0 THEN 1 ELSE 0 END)"
        for l in range(1, HNSW_MAX_LAYER + 1)
    )
    parts = [f"hlv AS MATERIALIZED (SELECT vec_id, {lvl} AS lvl FROM embeddings)"]
    for l in range(1, HNSW_MAX_LAYER + 1):
        parts.append(
            f"""hp{l} AS MATERIALIZED (SELECT a.vec_id AS node, b.vec_id AS nbr, {cosab} AS gs
      FROM embeddings a JOIN hlv xa ON xa.vec_id = a.vec_id AND xa.lvl >= {l}
      JOIN embeddings b ON b.vec_id <> a.vec_id
      JOIN hlv xb ON xb.vec_id = b.vec_id AND xb.lvl >= {l})"""
        )
        parts.append(
            f"""he{l} AS MATERIALIZED (SELECT node, nbr FROM (
      SELECT node, nbr, row_number() OVER (PARTITION BY node ORDER BY gs DESC, nbr) AS rn
      FROM hp{l}) WHERE rn <= {HNSW_DEG})"""
        )
    tiers = " UNION ALL ".join(
        f"SELECT vec_id, {i} AS tier FROM (SELECT vec_id FROM hlv WHERE lvl >= {l}"
        f" ORDER BY vec_id LIMIT {HNSW_ENTRY_CAP})"
        for i, l in enumerate(range(HNSW_MAX_LAYER, -1, -1))
    )
    parts.append(f"htier AS ({tiers})")
    parts.append(
        "hent AS (SELECT vec_id AS node FROM htier"
        " WHERE tier = (SELECT min(tier) FROM htier))"
    )
    cosq = _sq_cosine("gq.qv", "e.embedding")
    parts.append(
        f"""hs0 AS MATERIALIZED (SELECT gq.qid, hent.node, {cosq} AS s
      FROM gq CROSS JOIN hent JOIN embeddings e ON e.vec_id = hent.node)"""
    )
    parts.append(
        f"""hc0 AS MATERIALIZED (SELECT qid, node, s FROM (
      SELECT qid, node, s, row_number() OVER (PARTITION BY qid ORDER BY s DESC, node) AS rn
      FROM hs0) WHERE rn <= {HNSW_WIDTH})"""
    )
    step, prev = 0, "hc0"
    for l in range(HNSW_MAX_LAYER, 0, -1):
        for _ in range(HNSW_HOPS):
            step += 1
            parts.append(
                f"""hn{step} AS (SELECT DISTINCT c.qid, g.nbr AS node
      FROM {prev} c JOIN he{l} g ON g.node = c.node)"""
            )
            parts.append(
                f"""hs{step} AS MATERIALIZED (SELECT n.qid, n.node, {cosq} AS s
      FROM hn{step} n JOIN embeddings e ON e.vec_id = n.node JOIN gq ON gq.qid = n.qid)"""
            )
            parts.append(
                f"""hc{step} AS MATERIALIZED (SELECT qid, node, s FROM (
      SELECT qid, node, s, row_number() OVER (PARTITION BY qid ORDER BY s DESC, node) AS rn
      FROM (SELECT DISTINCT qid, node, s FROM (
            SELECT qid, node, s FROM {prev}
            UNION ALL SELECT qid, node, s FROM hs{step}))) WHERE rn <= {HNSW_WIDTH})"""
            )
            prev = f"hc{step}"
    return ",\n".join(parts), prev


def _oracle_hnsw_topk() -> str:
    pre, fin = _sq_hnsw_ctes()
    beam = _sq_graph_beam_ctes(
        pre_sql=pre, sc0_sql=f"SELECT qid, node, s FROM {fin}"
    )
    return f"""
WITH {beam}
SELECT qid, node AS neighbor_id, {_r6('s', 'score')},
       CAST(rn AS INT) AS rank
FROM (SELECT qid, node, s, row_number() OVER (PARTITION BY qid ORDER BY s DESC, node) AS rn
      FROM bfin)
WHERE rn <= {GRAPH_K}
"""


def _oracle_recall_hnsw() -> str:
    pre, fin = _sq_hnsw_ctes()
    beam = _sq_graph_beam_ctes(
        pre_sql=pre, sc0_sql=f"SELECT qid, node, s FROM {fin}"
    )
    return f"""
WITH {beam},
approx AS (SELECT qid, node AS neighbor_id FROM (
      SELECT qid, node, row_number() OVER (PARTITION BY qid ORDER BY s DESC, node) AS rn
      FROM bfin) WHERE rn <= {GRAPH_K}),
exact AS (SELECT qid, neighbor_id FROM (
      SELECT gq.qid, e.vec_id AS neighbor_id,
             row_number() OVER (PARTITION BY gq.qid ORDER BY {_sq_cosine('e.embedding', 'gq.qv')} DESC, e.vec_id) AS rn
      FROM embeddings e, gq) WHERE rn <= {GRAPH_K})
SELECT qid, count(*) / {float(GRAPH_K)} AS recall
FROM approx JOIN exact USING (qid, neighbor_id) GROUP BY qid
"""


def _sq_medoid_entries_ctes() -> str:
    """One-Lloyd-iteration medoid entries (graph_ann.medoid_entries
    with kmeans_iters=1): seed E-step (the _sq_kmeans_ctes fold), M-step
    per-dim means with empty-cluster fallback to the seed
    (clustering.kmeans_update's keep-previous rule), second E-step
    against the updated centroids, per-cluster argmin (dist asc, id
    asc).  Ends defining ``gent`` for the beam CTEs.  Centroid means
    differ from Spark's partial-agg sums at ~1 ulp — argmin decisions
    ride gaps 6+ orders larger on the testdata (the kmeans_assign /
    kmeans_one_iter hash-green precedent)."""
    dim = 64
    fold = (
        "list_sum(list_transform(e.embedding, (x, i) -> "
        "(CAST(x AS DOUBLE) - CAST(c[i] AS DOUBLE)) * "
        "(CAST(x AS DOUBLE) - CAST(c[i] AS DOUBLE))))"
    )
    return f"""mseed AS (SELECT list(embedding ORDER BY vec_id) AS cs
          FROM embeddings WHERE vec_id < {KMEANS_K}),
me1 AS (SELECT e.vec_id, e.embedding,
               list_transform(mseed.cs, c -> {fold}) AS ds
        FROM embeddings e, mseed),
ma1 AS (SELECT vec_id, embedding,
               CAST(list_position(ds, list_min(ds)) - 1 AS INT) AS cluster
        FROM me1),
mex AS (SELECT cluster, unnest(range(1, {dim + 1})) AS i, embedding FROM ma1),
mg AS (SELECT cluster, i, avg(CAST(embedding[i] AS DOUBLE)) AS v
       FROM mex GROUP BY 1, 2),
mkk AS (SELECT unnest(range(0, {KMEANS_K})) AS cl),
mnc AS (SELECT mkk.cl,
               COALESCE((SELECT list(v ORDER BY i) FROM mg WHERE mg.cluster = mkk.cl),
                        list_transform(mseed.cs[mkk.cl + 1], x -> CAST(x AS DOUBLE))) AS cv
        FROM mkk, mseed),
mcs AS (SELECT list(cv ORDER BY cl) AS cs2 FROM mnc),
me2 AS (SELECT e.vec_id,
               list_transform(mcs.cs2, c -> list_sum(list_transform(e.embedding,
                 (x, i) -> (CAST(x AS DOUBLE) - c[i]) * (CAST(x AS DOUBLE) - c[i])))) AS ds
        FROM embeddings e, mcs),
ma2 AS (SELECT vec_id,
               CAST(list_position(ds, list_min(ds)) - 1 AS INT) AS cluster,
               list_min(ds) AS dist
        FROM me2),
gent AS (SELECT vec_id AS node FROM (
          SELECT vec_id, cluster, dist,
                 row_number() OVER (PARTITION BY cluster ORDER BY dist, vec_id) AS rn
          FROM ma2) WHERE rn = 1)"""


def _oracle_graph_beam_medoid_topk() -> str:
    """Beam search seeded by the one-iteration k-means MEDOIDS — the
    data-aware entry selection oracle-paired end-to-end (selection +
    traversal in one hash)."""
    return f"""
WITH {_sq_graph_beam_ctes(entries_sql=_sq_medoid_entries_ctes())}
SELECT qid, node AS neighbor_id, {_r6('s', 'score')}, CAST(rn AS INT) AS rank
FROM (SELECT qid, node, s, row_number() OVER (PARTITION BY qid ORDER BY s DESC, node) AS rn
      FROM bfin)
WHERE rn <= {GRAPH_K}
"""


def _oracle_graph_beam_pq_topk() -> str:
    """DiskANN-proper mirror: the unrolled beam rounds fed by the
    materialized all-pairs ADC CTE instead of the inline cosine —
    same traversal, compressed-domain scores."""
    return f"""
WITH {_sq_graph_beam_ctes(score='adc')}
SELECT qid, node AS neighbor_id, {_r6('s', 'score')}, CAST(rn AS INT) AS rank
FROM (SELECT qid, node, s, row_number() OVER (PARTITION BY qid ORDER BY s DESC, node) AS rn
      FROM bfin)
WHERE rn <= {GRAPH_K}
"""


def _oracle_recall_graph_pq() -> str:
    """Production graph-PQ read path quantified: top-PQ_BEAM_RERANK of
    the ADC beam exactly rescored (cosine over the full vectors),
    top-GRAPH_K, recall vs the exact kNN."""
    return f"""
WITH {_sq_graph_beam_ctes(score='adc')},
rr AS (SELECT qid, node FROM (
      SELECT qid, node, row_number() OVER (PARTITION BY qid ORDER BY s DESC, node) AS rn FROM bfin)
      WHERE rn <= {PQ_BEAM_RERANK}),
rscored AS (SELECT rr.qid, rr.node, {_sq_cosine('e.embedding', 'gq.qv')} AS s
      FROM rr JOIN embeddings e ON e.vec_id = rr.node JOIN gq ON gq.qid = rr.qid),
approx AS (SELECT qid, node AS neighbor_id FROM (
      SELECT qid, node, row_number() OVER (PARTITION BY qid ORDER BY s DESC, node) AS rn FROM rscored)
      WHERE rn <= {GRAPH_K}),
exact AS (SELECT qid, neighbor_id FROM (
      SELECT gq.qid, e.vec_id AS neighbor_id,
             row_number() OVER (PARTITION BY gq.qid ORDER BY {_sq_cosine('e.embedding', 'gq.qv')} DESC, e.vec_id) AS rn
      FROM embeddings e, gq) WHERE rn <= {GRAPH_K})
SELECT qid, count(*) / {float(GRAPH_K)} AS recall
FROM approx JOIN exact USING (qid, neighbor_id) GROUP BY qid
"""


def _oracle_graph_beam_pq_filtered_topk() -> str:
    """ADC traversal + answer predicate composed: the adc-fed rounds'
    scored union windowed under node % 3 = 0."""
    return f"""
WITH {_sq_graph_beam_ctes(score='adc')}
SELECT qid, node AS neighbor_id, {_r6('s', 'score')}, CAST(rn AS INT) AS rank
FROM (SELECT qid, node, s, row_number() OVER (PARTITION BY qid ORDER BY s DESC, node) AS rn
      FROM scall WHERE node % 3 = 0)
WHERE rn <= {GRAPH_K}
"""


def _oracle_graph_beam_filtered_topk() -> str:
    """Filtered beam search mirror: the SAME unrolled traversal (the
    routing beam ignores the predicate), answers = top-GRAPH_K of the
    union of every round's scored frame restricted to the allowed set
    (node % 3 = 0) — each (qid, node) is scored at most once (the seen
    anti-join), so the union needs no dedup, and a per-round running
    top-k equals this global window."""
    return f"""
WITH {_sq_graph_beam_ctes()}
SELECT qid, node AS neighbor_id, {_r6('s', 'score')}, CAST(rn AS INT) AS rank
FROM (SELECT qid, node, s, row_number() OVER (PARTITION BY qid ORDER BY s DESC, node) AS rn
      FROM scall WHERE node % 3 = 0)
WHERE rn <= {GRAPH_K}
"""


def _oracle_recall_graph_filtered() -> str:
    return f"""
WITH {_sq_graph_beam_ctes()},
approx AS (SELECT qid, node AS neighbor_id FROM (
      SELECT qid, node, row_number() OVER (PARTITION BY qid ORDER BY s DESC, node) AS rn
      FROM scall WHERE node % 3 = 0) WHERE rn <= {GRAPH_K}),
exact AS (SELECT qid, neighbor_id FROM (
      SELECT gq.qid, e.vec_id AS neighbor_id,
             row_number() OVER (PARTITION BY gq.qid ORDER BY {_sq_cosine('e.embedding', 'gq.qv')} DESC, e.vec_id) AS rn
      FROM embeddings e, gq WHERE e.vec_id % 3 = 0) WHERE rn <= {GRAPH_K})
SELECT qid, count(*) / {float(GRAPH_K)} AS recall
FROM approx JOIN exact USING (qid, neighbor_id) GROUP BY qid
"""


def _oracle_range_search_cosine() -> str:
    """Radius search mirror: the same sequential-fold cosine, a WHERE
    instead of a LIMIT — nearest corpus score sits >= 3e-4 from the
    cutoff (measured at both SFs), so membership is float-safe."""
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id, {_r6('s', 'score')} FROM (
  SELECT e.vec_id, {_sq_cosine('e.embedding', 'q.qv')} AS s FROM embeddings e, q)
WHERE s >= {RANGE_COS_T}
"""


def _oracle_range_join_l2() -> str:
    cut = -(RANGE_L2_RADIUS * RANGE_L2_RADIUS)
    return f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < {KNN_QUERIES})
SELECT qid, neighbor_id, {_r6('s', 'score')} FROM (
  SELECT q.qid, e.vec_id AS neighbor_id, -({_sq_l2sq('e.embedding', 'q.qv')}) AS s
  FROM embeddings e, q)
WHERE s >= {cut!r}
"""


def _sq_ivf_range_cand() -> str:
    """IVF assign + probe (the _oracle_ivfpq_topk mirror pattern)
    exposing ``rcand(vec_id, embedding)`` = rows in the probed cells,
    and ``q(qv)``."""
    return f"""
cent AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < {IVF_N_CENTROIDS}),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
__iassign AS (SELECT e.vec_id, e.embedding, c.cid,
                  row_number() OVER (PARTITION BY e.vec_id ORDER BY {_sq_l2sq('e.embedding', 'c.cv')}, c.cid) AS rn
           FROM embeddings e, cent c),
__icells AS (SELECT vec_id, embedding, cid AS ivf_cell FROM __iassign WHERE rn = 1),
__iprobe AS (SELECT cid FROM (SELECT c.cid, row_number() OVER (ORDER BY {_sq_l2sq('qv', 'c.cv')}, c.cid) AS rn
                           FROM cent c, q) WHERE rn <= {IVF_NPROBE}),
rcand AS (SELECT vec_id, embedding FROM __icells WHERE ivf_cell IN (SELECT cid FROM __iprobe))"""


def _oracle_ivf_range_search() -> str:
    return f"""
WITH {_sq_ivf_range_cand()}
SELECT vec_id, {_r6('s', 'score')} FROM (
  SELECT e.vec_id, {_sq_cosine('e.embedding', 'q.qv')} AS s FROM rcand e, q)
WHERE s >= {RANGE_COS_T}
"""


def _oracle_range_recall_ivf() -> str:
    return f"""
WITH {_sq_ivf_range_cand()},
truth AS (SELECT e.vec_id FROM embeddings e, q WHERE {_sq_cosine('e.embedding', 'q.qv')} >= {RANGE_COS_T}),
found AS (SELECT e.vec_id FROM rcand e, q WHERE {_sq_cosine('e.embedding', 'q.qv')} >= {RANGE_COS_T})
SELECT (SELECT count(*) FROM found JOIN truth USING (vec_id)) * 1.0
       / (SELECT count(*) FROM truth) AS recall
"""


def _oracle_range_count() -> str:
    return f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < {KNN_QUERIES})
SELECT qid, count(*) AS n_in_range FROM (
  SELECT q.qid, {_sq_cosine('e.embedding', 'q.qv')} AS s FROM embeddings e, q)
WHERE s >= {RANGE_COS_T}
GROUP BY qid
"""


def _oracle_graph_beam_topk() -> str:
    return f"""
WITH {_sq_graph_beam_ctes()}
SELECT qid, node AS neighbor_id, {_r6('s', 'score')},
       CAST(rn AS INT) AS rank
FROM (SELECT qid, node, s, row_number() OVER (PARTITION BY qid ORDER BY s DESC, node) AS rn
      FROM bfin)
WHERE rn <= {GRAPH_K}
"""


def _oracle_recall_graph() -> str:
    return f"""
WITH {_sq_graph_beam_ctes()},
approx AS (SELECT qid, node AS neighbor_id FROM (
      SELECT qid, node, row_number() OVER (PARTITION BY qid ORDER BY s DESC, node) AS rn
      FROM bfin) WHERE rn <= {GRAPH_K}),
exact AS (SELECT qid, neighbor_id FROM (
      SELECT gq.qid, e.vec_id AS neighbor_id,
             row_number() OVER (PARTITION BY gq.qid ORDER BY {_sq_cosine('e.embedding', 'gq.qv')} DESC, e.vec_id) AS rn
      FROM embeddings e, gq) WHERE rn <= {GRAPH_K})
SELECT qid, count(*) / {float(GRAPH_K)} AS recall
FROM approx JOIN exact USING (qid, neighbor_id) GROUP BY qid
"""


def _sq_pq_ctes(src: str = "embeddings") -> str:
    """PQ CTEs mirroring operators.pq: codebooks = subspace slices of
    the first PQ_KSUB corpus rows; codes = per-subspace argmin (ties →
    lowest centroid id); LUT = subspace dot products against the query;
    exposes ``pq_scored(vec_id, s)`` with the ADC score — the same
    double-precision folds, in the same order, as the Spark side.
    ``src`` is the (vec_id, embedding) relation to encode — the full
    corpus by default, a pre-pruned candidate CTE for IVF-PQ."""
    dsub = 64 // PQ_M
    sl_e = f"list_slice(e.embedding, s.j * {dsub} + 1, (s.j + 1) * {dsub})"
    sl_c = f"list_slice(c.cv, s.j * {dsub} + 1, (s.j + 1) * {dsub})"
    sl_q = f"list_slice(q.qv, s.j * {dsub} + 1, (s.j + 1) * {dsub})"
    return f"""
cb AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < {PQ_KSUB}),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
sub AS (SELECT unnest(range(0, {PQ_M})) AS j),
__pqd AS (SELECT e.vec_id, s.j, c.cid, {_sq_l2sq(sl_e, sl_c)} AS d
          FROM {src} e, sub s, cb c),
__pqc AS (SELECT vec_id, j, cid FROM (
            SELECT vec_id, j, cid, row_number() OVER (PARTITION BY vec_id, j ORDER BY d, cid) AS rn
            FROM __pqd) WHERE rn = 1),
__pqcode AS (SELECT vec_id, list(cid ORDER BY j) AS code FROM __pqc GROUP BY vec_id),
__pqlutv AS (SELECT s.j, c.cid, {_sq_dot(sl_q, sl_c)} AS v FROM sub s, cb c, q),
__pqlut AS (SELECT list(l ORDER BY j) AS lut FROM (
              SELECT j, list(v ORDER BY cid) AS l FROM __pqlutv GROUP BY j) ),
pq_scored AS (SELECT vec_id,
                     list_sum(list_transform(range(0, {PQ_M}),
                              j -> lut[j + 1][code[j + 1] + 1])) AS s
              FROM __pqcode, __pqlut)
"""

def _oracle_pq_topk() -> str:
    return f"""
WITH {_sq_pq_ctes()}
SELECT vec_id, {_r6('s', 'score')} FROM pq_scored ORDER BY s DESC, vec_id LIMIT {TOPK_K}
"""

def _oracle_ivfpq_topk() -> str:
    """IVF mirror (assign + probe) restricted to the probed cells, then
    the PQ mirror encoding/scoring only those candidates — encoding is
    per-row independent, so encode-then-filter ≡ filter-then-encode."""
    return f"""
WITH cent AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < {IVF_N_CENTROIDS}),
iq AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
__iassign AS (SELECT e.vec_id, e.embedding, c.cid,
                  row_number() OVER (PARTITION BY e.vec_id ORDER BY {_sq_l2sq('e.embedding', 'c.cv')}, c.cid) AS rn
           FROM embeddings e, cent c),
__icells AS (SELECT vec_id, embedding, cid AS ivf_cell FROM __iassign WHERE rn = 1),
__iprobe AS (SELECT cid FROM (SELECT c.cid, row_number() OVER (ORDER BY {_sq_l2sq('qv', 'c.cv')}, c.cid) AS rn
                           FROM cent c, iq) WHERE rn <= {IVF_NPROBE}),
cand AS (SELECT vec_id, embedding FROM __icells WHERE ivf_cell IN (SELECT cid FROM __iprobe)),
{_sq_pq_ctes('cand').strip()}
SELECT vec_id, {_r6('s', 'score')} FROM pq_scored ORDER BY s DESC, vec_id LIMIT {TOPK_K}
"""

def _oracle_recall_ivfpq() -> str:
    return f"""
WITH cent AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < {IVF_N_CENTROIDS}),
iq AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
__iassign AS (SELECT e.vec_id, e.embedding, c.cid,
                  row_number() OVER (PARTITION BY e.vec_id ORDER BY {_sq_l2sq('e.embedding', 'c.cv')}, c.cid) AS rn
           FROM embeddings e, cent c),
__icells AS (SELECT vec_id, embedding, cid AS ivf_cell FROM __iassign WHERE rn = 1),
__iprobe AS (SELECT cid FROM (SELECT c.cid, row_number() OVER (ORDER BY {_sq_l2sq('qv', 'c.cv')}, c.cid) AS rn
                           FROM cent c, iq) WHERE rn <= {IVF_NPROBE}),
cand AS (SELECT vec_id, embedding FROM __icells WHERE ivf_cell IN (SELECT cid FROM __iprobe)),
{_sq_pq_ctes('cand').strip()},
exact AS (SELECT vec_id FROM (SELECT e.vec_id, {_sq_cosine('e.embedding', 'q.qv')} AS s FROM embeddings e, q)
          ORDER BY s DESC, vec_id LIMIT {TOPK_K}),
approx AS (SELECT vec_id FROM pq_scored ORDER BY s DESC, vec_id LIMIT {TOPK_K})
SELECT count(*) / {float(TOPK_K)} AS recall FROM approx JOIN exact USING (vec_id)
"""

def _sq_ivfpq_res_ctes() -> str:
    """Residual-IVFPQ CTEs (operators/pq.ivfpq_residual_topk): cells,
    probe, residual candidates, residual-domain codebooks from the
    first PQ_KSUB rows' residuals, ADC + per-cell ⟨q,c⟩ constant.
    Exposes ``res_scored(vec_id, s)``."""
    dsub = 64 // PQ_M
    res = "list_transform(i.embedding, (x, ii) -> CAST(x AS DOUBLE) - c.cv[ii])"
    sl_e = f"list_slice(e.embedding, s.j * {dsub} + 1, (s.j + 1) * {dsub})"
    sl_c = f"list_slice(c.cv, s.j * {dsub} + 1, (s.j + 1) * {dsub})"
    sl_q = f"list_slice(q.qv, s.j * {dsub} + 1, (s.j + 1) * {dsub})"
    return f"""
cent AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < {IVF_N_CENTROIDS}),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
__iassign AS (SELECT e.vec_id, e.embedding, c.cid,
                  row_number() OVER (PARTITION BY e.vec_id ORDER BY {_sq_l2sq('e.embedding', 'c.cv')}, c.cid) AS rn
           FROM embeddings e, cent c),
__icells AS (SELECT vec_id, embedding, cid AS ivf_cell FROM __iassign WHERE rn = 1),
__iprobe AS (SELECT cid FROM (SELECT c.cid, row_number() OVER (ORDER BY {_sq_l2sq('qv', 'c.cv')}, c.cid) AS rn
                           FROM cent c, q) WHERE rn <= {IVF_NPROBE}),
cand AS (SELECT i.vec_id, {res} AS embedding, i.ivf_cell
         FROM __icells i JOIN cent c ON c.cid = i.ivf_cell
         WHERE i.ivf_cell IN (SELECT cid FROM __iprobe)),
rcb AS (SELECT i.vec_id AS cid, {res} AS cv
        FROM __icells i JOIN cent c ON c.cid = i.ivf_cell
        WHERE i.vec_id < {PQ_KSUB}),
sub AS (SELECT unnest(range(0, {PQ_M})) AS j),
__pqd AS (SELECT e.vec_id, s.j, c.cid, {_sq_l2sq(sl_e, sl_c)} AS d
          FROM cand e, sub s, rcb c),
__pqc AS (SELECT vec_id, j, cid FROM (
            SELECT vec_id, j, cid, row_number() OVER (PARTITION BY vec_id, j ORDER BY d, cid) AS rn
            FROM __pqd) WHERE rn = 1),
__pqcode AS (SELECT vec_id, list(cid ORDER BY j) AS code FROM __pqc GROUP BY vec_id),
__pqlutv AS (SELECT s.j, c.cid, {_sq_dot(sl_q, sl_c)} AS v FROM sub s, rcb c, q),
__pqlut AS (SELECT list(l ORDER BY j) AS lut FROM (
              SELECT j, list(v ORDER BY cid) AS l FROM __pqlutv GROUP BY j) ),
qd AS (SELECT cid, {_sq_dot('qv', 'cv')} AS qc FROM cent, q),
res_scored AS (SELECT cc.vec_id,
                      qd.qc + list_sum(list_transform(range(0, {PQ_M}),
                               j -> lut[j + 1][code[j + 1] + 1])) AS s
               FROM __pqcode pc JOIN cand cc ON pc.vec_id = cc.vec_id
               JOIN qd ON qd.cid = cc.ivf_cell, __pqlut)
"""


def _oracle_ivfpq_res_topk() -> str:
    return f"""
WITH {_sq_ivfpq_res_ctes()}
SELECT vec_id, {_r6('s', 'score')} FROM res_scored ORDER BY s DESC, vec_id LIMIT {TOPK_K}
"""


def _oracle_recall_ivfpq_res() -> str:
    return f"""
WITH {_sq_ivfpq_res_ctes()},
exact AS (SELECT vec_id FROM (SELECT e.vec_id, {_sq_cosine('e.embedding', 'q.qv')} AS s FROM embeddings e, q)
          ORDER BY s DESC, vec_id LIMIT {TOPK_K}),
approx AS (SELECT vec_id FROM res_scored ORDER BY s DESC, vec_id LIMIT {TOPK_K})
SELECT count(*) / {float(TOPK_K)} AS recall FROM approx JOIN exact USING (vec_id)
"""


def _oracle_pq_rerank_topk() -> str:
    return f"""
WITH {_sq_pq_ctes()},
shortlist AS (SELECT vec_id FROM pq_scored ORDER BY s DESC, vec_id LIMIT {PQ_RERANK}),
exact AS (SELECT e.vec_id, {_sq_cosine('e.embedding', 'q.qv')} AS s
          FROM embeddings e JOIN shortlist USING (vec_id), q)
SELECT vec_id, {_r6('s', 'score')} FROM exact ORDER BY s DESC, vec_id LIMIT {TOPK_K}
"""

def _oracle_recall_pq() -> str:
    return f"""
WITH {_sq_pq_ctes()},
exact AS (SELECT vec_id FROM (SELECT e.vec_id, {_sq_cosine('e.embedding', 'q.qv')} AS s FROM embeddings e, q)
          ORDER BY s DESC, vec_id LIMIT {TOPK_K}),
approx AS (SELECT vec_id FROM pq_scored ORDER BY s DESC, vec_id LIMIT {TOPK_K})
SELECT count(*) / {float(TOPK_K)} AS recall FROM approx JOIN exact USING (vec_id)
"""

def _sq_sq_ctes() -> str:
    """Scalar-quantization CTEs mirroring operators.sq: per-dimension
    exact min/max ranges from the corpus; codes = HALF_UP-rounded
    offsets against (hi−lo)/255 steps (constant dims → 0); the score is
    the affine fold c0 + Σ a_d·code_d with a_d = q_d·step_d — the same
    double arithmetic, in the same sequential order, as the Spark side.
    Exposes ``sq_scored(vec_id, s)``."""
    return """
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
__sqdims AS (SELECT unnest(range(1, 65)) AS i),
__sqrng AS (SELECT i, CAST(min(e.embedding[i]) AS DOUBLE) AS lo,
                   CAST(max(e.embedding[i]) AS DOUBLE) AS hi
            FROM embeddings e, __sqdims GROUP BY i),
__sqrl AS (SELECT list(lo ORDER BY i) AS los,
                  list((hi - lo) / 255.0 ORDER BY i) AS steps
           FROM __sqrng),
__sqcodes AS (SELECT e.vec_id,
                list_transform(e.embedding, (x, i) ->
                  least(255, greatest(0, CAST(CASE WHEN steps[i] = 0 THEN 0.0
                    ELSE round((CAST(x AS DOUBLE) - los[i]) / steps[i]) END AS INT)))) AS code
              FROM embeddings e, __sqrl),
__sqcoef AS (SELECT list_transform(qv, (x, i) -> CAST(x AS DOUBLE) * steps[i]) AS a,
                    list_sum(list_transform(qv, (x, i) -> CAST(x AS DOUBLE) * los[i])) AS c0
             FROM q, __sqrl),
sq_scored AS (SELECT vec_id,
                     c0 + list_sum(list_transform(code, (c, i) -> CAST(c AS DOUBLE) * a[i])) AS s
              FROM __sqcodes, __sqcoef)
"""

def _oracle_sq_topk() -> str:
    return f"""
WITH {_sq_sq_ctes()}
SELECT vec_id, {_r6('s', 'score')} FROM sq_scored ORDER BY s DESC, vec_id LIMIT {TOPK_K}
"""

def _oracle_sq_rerank_topk() -> str:
    return f"""
WITH {_sq_sq_ctes()},
shortlist AS (SELECT vec_id FROM sq_scored ORDER BY s DESC, vec_id LIMIT {SQ_RERANK}),
exact AS (SELECT e.vec_id, {_sq_dot('e.embedding', 'q.qv')} AS s
          FROM embeddings e JOIN shortlist USING (vec_id), q)
SELECT vec_id, {_r6('s', 'score')} FROM exact ORDER BY s DESC, vec_id LIMIT {TOPK_K}
"""

def _oracle_recall_sq() -> str:
    return f"""
WITH {_sq_sq_ctes()},
exact AS (SELECT vec_id FROM (SELECT e.vec_id, {_sq_dot('e.embedding', 'q.qv')} AS s FROM embeddings e, q)
          ORDER BY s DESC, vec_id LIMIT {TOPK_K}),
approx AS (SELECT vec_id FROM sq_scored ORDER BY s DESC, vec_id LIMIT {TOPK_K})
SELECT count(*) / {float(TOPK_K)} AS recall FROM approx JOIN exact USING (vec_id)
"""

def _sq_kmeans_ctes() -> str:
    """Shared CTEs for the k-means mirrors: deterministic seeds = the
    KMEANS_K lowest-id vectors, E-step = first-match argmin of the
    sequential-fold squared L2 (mirrors clustering.assign_clusters)."""
    return f"""cents AS (SELECT list(embedding ORDER BY vec_id) AS cs
          FROM embeddings WHERE vec_id < {KMEANS_K}),
km_ds AS (SELECT e.vec_id, e.embedding,
                 list_transform(cents.cs, c -> list_sum(list_transform(e.embedding,
                   (x, i) -> (CAST(x AS DOUBLE) - CAST(c[i] AS DOUBLE))
                           * (CAST(x AS DOUBLE) - CAST(c[i] AS DOUBLE))))) AS ds
          FROM embeddings e, cents),
km_asg AS (SELECT vec_id, embedding,
                  CAST(list_position(ds, list_min(ds)) - 1 AS INT) AS cluster,
                  list_min(ds) AS dist
           FROM km_ds)"""

def _oracle_kmeans_assign() -> str:
    return f"""
WITH {_sq_kmeans_ctes()}
SELECT vec_id, cluster, {_r6('dist', 'dist')} FROM km_asg
"""

def _oracle_kmeans_one_iter() -> str:
    return f"""
WITH {_sq_kmeans_ctes()},
ex AS (SELECT cluster, unnest(range(1, 65)) AS i, embedding FROM km_asg),
g AS (SELECT cluster, i, avg(CAST(embedding[i] AS DOUBLE)) AS v FROM ex GROUP BY 1, 2),
n AS (SELECT cluster, count(*) AS n FROM km_asg GROUP BY 1)
SELECT g.cluster, n.n, CAST(g.i - 1 AS INT) AS pos, {_r6('g.v', 'centroid')}
FROM g JOIN n USING (cluster)
"""

def _oracle_semantic_dedup() -> str:
    return f"""
WITH {_sq_kmeans_ctes()},
p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cluster,
             {_sq_cosine('a.embedding', 'b.embedding')} AS c
      FROM km_asg a JOIN km_asg b
        ON a.cluster = b.cluster AND a.vec_id < b.vec_id)
SELECT id_a, id_b, cluster, {_r6('c', 'cos')} FROM p WHERE c >= {EMB_NEAR_DUP_TAU}
"""

def _oracle_chunk_overlap() -> str:
    size, stride = CHUNK_WORDS, CHUNK_STRIDE
    return f"""
WITH t AS (SELECT doc_id, {_SQ_TOKS} AS toks, trim(text) AS tt FROM documents),
w AS (SELECT doc_id, toks,
             CASE WHEN len(toks) <= {size} THEN 1
                  ELSE CAST(ceil((len(toks) - {size}) / CAST({stride} AS DOUBLE)) AS INT) + 1
             END AS nw
      FROM t WHERE tt IS NOT NULL AND tt != ''),
ex AS (SELECT doc_id, unnest(range(0, nw)) AS i, toks FROM w)
SELECT doc_id, CAST(i AS INT) AS chunk_idx,
       array_to_string(list_slice(toks, i * {stride} + 1, i * {stride} + {size}), ' ') AS chunk_text
FROM ex
"""

def _sq_mrl_ctes() -> str:
    """MRL mirrors: prefix-dim dot shortlist + exact rerank (mirrors
    search.mrl_topk — list_slice is 1-based inclusive like F.slice)."""
    return f"""q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
qp AS (SELECT list_slice(qv, 1, {MRL_M}) AS qpv FROM q),
pref AS (SELECT e.vec_id,
                {_sq_dot(f'list_slice(e.embedding, 1, {MRL_M})', 'qp.qpv')} AS ps
         FROM embeddings e, qp),
mrl_short AS (SELECT vec_id, ps FROM pref ORDER BY ps DESC, vec_id LIMIT {MRL_SHORTLIST}),
mrl_rr AS (SELECT e.vec_id, s.ps, {_sq_dot('e.embedding', 'q.qv')} AS sc
           FROM embeddings e JOIN mrl_short s USING (vec_id), q)"""

def _oracle_mrl_topk() -> str:
    return f"""
WITH {_sq_mrl_ctes()}
SELECT vec_id, {_r6('ps', 'prefix_score')}, {_r6('sc', 'score')} FROM mrl_rr
ORDER BY sc DESC, vec_id LIMIT {TOPK_K}
"""

def _oracle_recall_mrl() -> str:
    return f"""
WITH {_sq_mrl_ctes()},
exact AS (SELECT vec_id FROM
            (SELECT e.vec_id, {_sq_dot('e.embedding', 'q.qv')} AS s
             FROM embeddings e, q)
          ORDER BY s DESC, vec_id LIMIT {TOPK_K}),
approx AS (SELECT vec_id FROM mrl_rr ORDER BY sc DESC, vec_id LIMIT {TOPK_K})
SELECT count(*) / {float(TOPK_K)} AS recall FROM approx JOIN exact USING (vec_id)
"""

def _sq_bq_ctes() -> str:
    """Shared CTEs for the BQ mirrors: midrange thresholds (exact
    min/max copies, same training as operators.bq.train_bq_thresholds),
    per-row Hamming = count of sign mismatches vs the query — the
    packed-XOR+popcount the Spark side runs is bit-for-bit this count."""
    thr_terms = ", ".join(
        f"(min(embedding[{d + 1}]) + max(embedding[{d + 1}])) / 2.0"
        for d in range(64)
    )
    return f"""thr AS (SELECT [{thr_terms}] AS t FROM embeddings),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
ham AS (SELECT e.vec_id,
               CAST(list_sum(list_transform(range(1, 65), i ->
                 CASE WHEN (CAST(e.embedding[i] AS DOUBLE) > thr.t[i])
                        != (CAST(q.qv[i] AS DOUBLE) > thr.t[i])
                      THEN 1 ELSE 0 END)) AS INT) AS hamming
        FROM embeddings e, thr, q),
bq_short AS (SELECT vec_id, hamming FROM ham
             ORDER BY hamming ASC, vec_id LIMIT {BQ_SHORTLIST}),
bq_rr AS (SELECT e.vec_id, s.hamming, {_sq_dot('e.embedding', 'q.qv')} AS sc
          FROM embeddings e JOIN bq_short s USING (vec_id), q)"""

def _oracle_bq_topk() -> str:
    return f"""
WITH {_sq_bq_ctes()}
SELECT vec_id, hamming, {_r6('sc', 'score')} FROM bq_rr
ORDER BY sc DESC, vec_id LIMIT {TOPK_K}
"""

def _oracle_recall_bq() -> str:
    return f"""
WITH {_sq_bq_ctes()},
exact AS (SELECT vec_id FROM
            (SELECT e.vec_id, {_sq_dot('e.embedding', 'q.qv')} AS s
             FROM embeddings e, q)
          ORDER BY s DESC, vec_id LIMIT {TOPK_K}),
approx AS (SELECT vec_id FROM bq_rr ORDER BY sc DESC, vec_id LIMIT {TOPK_K})
SELECT count(*) / {float(TOPK_K)} AS recall FROM approx JOIN exact USING (vec_id)
"""

def _oracle_topk_per_label() -> str:
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
scored AS (SELECT label, vec_id, {_sq_cosine('embedding', 'qv')} AS s FROM embeddings, q),
ranked AS (SELECT label, vec_id, s,
                  CAST(row_number() OVER (PARTITION BY label ORDER BY s DESC, vec_id) AS INT) AS rank
           FROM scored)
SELECT label, vec_id, {_r6('s', 'score')}, rank FROM ranked WHERE rank <= {GROUP_TOPK_K}
"""

def _oracle_doc_mean_pool() -> str:
    d = RAG_DIM
    th = _sq_tok_hash("t")
    chunk_sql = _oracle_chunk_documents().strip()
    return f"""
WITH chunked AS ({chunk_sql}),
ct AS (SELECT doc_id, chunk_id, regexp_split_to_array(trim(chunk_text), '\\s+') AS w
       FROM chunked WHERE doc_id < {POOL_DOC_LIMIT}),
raw AS (SELECT doc_id, chunk_id,
  list_transform(range(0, {d}), j -> CAST(coalesce(list_sum(
    list_transform(w, t -> CASE WHEN {th} % {d} = j
      THEN (CASE WHEN {th} % {2 * d} >= {d} THEN 1.0 ELSE -1.0 END)
      ELSE 0.0 END)), 0.0) AS DOUBLE)) AS rawv
  FROM ct),
emb AS (SELECT doc_id, chunk_id,
  list_transform(rawv, x -> x / coalesce(nullif({_sq_norm('rawv')}, 0), 1e-12)) AS e
  FROM raw),
g AS (SELECT doc_id, list(e ORDER BY chunk_id) AS es, count(*) AS n FROM emb GROUP BY doc_id),
pool AS (SELECT doc_id,
  list_transform(range(0, {d}), j -> list_sum(list_transform(es, v -> v[j + 1])) / n) AS de
  FROM g)
SELECT doc_id, CAST(i - 1 AS INT) AS pos, round(de[i], 6) + 0.0 AS val
FROM pool, (SELECT unnest(range(1, {d + 1})) AS i)
"""

def _oracle_recall_lsh_multiprobe() -> str:
    # mirror of search.lsh_probe_buckets: rank planes by |⟨q, p_j⟩|
    # ascending (ties by j), flip the weakest MULTIPROBE_BUCKETS-1 bits
    margin_rows = " UNION ALL ".join(
        f"SELECT {j} AS j, abs({_sq_dot('qv', _sq_vec(p))}) AS m FROM q"
        for j, p in enumerate(LSH_PLANES)
    )
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
exact AS (SELECT vec_id FROM (SELECT vec_id, {_sq_cosine('embedding', 'qv')} AS s FROM embeddings, q)
          ORDER BY s DESC, vec_id LIMIT {TOPK_K}),
qb AS (SELECT {_sq_bucket('qv')} AS qbucket FROM q),
margins AS ({margin_rows}),
flips AS (SELECT j FROM (SELECT j, row_number() OVER (ORDER BY m ASC, j) AS rn FROM margins)
          WHERE rn <= {MULTIPROBE_BUCKETS - 1}),
probes AS (SELECT qbucket AS b FROM qb
           UNION ALL SELECT xor(qbucket, (1::BIGINT << j)) AS b FROM qb, flips),
cand AS (SELECT vec_id, embedding FROM embeddings
         WHERE {_sq_bucket('embedding')} IN (SELECT b FROM probes)),
approx AS (SELECT vec_id FROM (SELECT vec_id, {_sq_cosine('embedding', 'qv')} AS s FROM cand, q)
           ORDER BY s DESC, vec_id LIMIT {TOPK_K})
SELECT count(*) / {float(TOPK_K)} AS recall FROM approx JOIN exact USING (vec_id)
"""

def _oracle_prepare_vectors() -> str:
    return f"""
SELECT vec_id, label, CAST(vec_id % {N_SHARDS} AS INT) AS shard
FROM embeddings WHERE len(embedding) = 64
"""

def _oracle_normalized_vectors() -> str:
    return f"""
WITH n AS (SELECT vec_id, embedding, coalesce(nullif({_sq_norm('embedding')}, 0), 1e-12) AS nrm
           FROM embeddings WHERE vec_id < 50)
SELECT vec_id, CAST(i - 1 AS INT) AS pos,
       round(CAST(embedding[i] AS DOUBLE) / nrm, 6) + 0.0 AS val
FROM n, (SELECT unnest(range(1, 65)) AS i)
"""

def _oracle_chunk_documents() -> str:
    w = CHUNK_WORDS
    return f"""
WITH toks AS (SELECT doc_id, {_SQ_TOKS} AS t FROM documents),
idx AS (SELECT doc_id, t, unnest(range(0, greatest(CAST(ceil(len(t) / {float(w)}) AS BIGINT), 1))) AS i FROM toks),
chunks AS (SELECT doc_id, CAST(i AS INT) AS chunk_idx,
                  array_to_string(list_slice(t, i * {w} + 1, i * {w} + {w}), ' ') AS chunk_text
           FROM idx)
SELECT doc_id, chunk_idx,
       concat(CAST(doc_id AS VARCHAR), '::chunk', CAST(chunk_idx AS VARCHAR), '::',
              substr(md5(chunk_text), 1, 8)) AS chunk_id,
       chunk_text
FROM chunks
"""

def _oracle_rag_context() -> str:
    """DuckDB mirror of the full RAG retrieval tail. The hash embedding
    is re-derived in SQL (same md5-derived bucket/sign, same ε-guarded
    normalization); the question vector is the same Python-computed
    literal the Spark side closes over."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.functions.embed import (
        hash_embed_py,
    )
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.rag import (
        PROMPT_TEMPLATE,
    )

    d = RAG_DIM
    qv = _sq_vec(hash_embed_py(RAG_QUESTION, dim=d))
    th = _sq_tok_hash("t")
    chunk_sql = _oracle_chunk_documents().strip()
    prompt = PROMPT_TEMPLATE.replace("'", "''")
    # raw[j] = Σ_tokens ±1[bucket==j]; emb = raw / max(‖raw‖, 1e-12)
    return f"""
WITH chunked AS ({chunk_sql}),
ct AS (SELECT chunk_id, chunk_text, regexp_split_to_array(trim(chunk_text), '\\s+') AS w FROM chunked),
raw AS (SELECT chunk_id, chunk_text,
  list_transform(range(0, {d}), j -> CAST(coalesce(list_sum(
    list_transform(w, t -> CASE WHEN {th} % {d} = j
      THEN (CASE WHEN {th} % {2 * d} >= {d} THEN 1.0 ELSE -1.0 END)
      ELSE 0.0 END)), 0.0) AS DOUBLE)) AS rawv
  FROM ct),
emb AS (SELECT chunk_id, chunk_text,
  list_transform(rawv, x -> x / coalesce(nullif({_sq_norm('rawv')}, 0), 1e-12)) AS e
  FROM raw),
hits AS (SELECT chunk_id, chunk_text, {_sq_cosine('e', qv)} AS score
  FROM emb ORDER BY score DESC, chunk_id LIMIT {RAG_K}),
ctx AS (SELECT 0 AS qid,
  string_agg('- ' || chunk_text, chr(10) || chr(10) ORDER BY score DESC, chunk_text) AS context
  FROM hits)
SELECT qid, context,
       printf('{prompt}', context, '{RAG_QUESTION}') AS prompt
FROM ctx
"""

def _oracle_maxsim_topk() -> str:
    """MaxSim mirror: the chunk hash-embedding CTEs from the RAG
    mirror, then per-query-token max over each doc's chunks, summed in
    a fixed literal order (deterministic float arithmetic both
    engines)."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.functions.embed import (
        hash_embed_py,
    )

    d = RAG_DIM
    q_vecs = [hash_embed_py(t, dim=d) for t in RAG_QUESTION.split()]
    th = _sq_tok_hash("t")
    chunk_sql = _oracle_chunk_documents().strip()
    dots = ", ".join(
        f"{_sq_dot('e', _sq_vec(qv))} AS d{i}" for i, qv in enumerate(q_vecs)
    )
    maxes = ", ".join(f"max(d{i}) AS m{i}" for i in range(len(q_vecs)))
    tot = " + ".join(f"m{i}" for i in range(len(q_vecs)))
    return f"""
WITH chunked AS ({chunk_sql}),
ct AS (SELECT doc_id, regexp_split_to_array(trim(chunk_text), '\\s+') AS w FROM chunked),
raw AS (SELECT doc_id,
  list_transform(range(0, {d}), j -> CAST(coalesce(list_sum(
    list_transform(w, t -> CASE WHEN {th} % {d} = j
      THEN (CASE WHEN {th} % {2 * d} >= {d} THEN 1.0 ELSE -1.0 END)
      ELSE 0.0 END)), 0.0) AS DOUBLE)) AS rawv
  FROM ct),
emb AS (SELECT doc_id,
  list_transform(rawv, x -> x / coalesce(nullif({_sq_norm('rawv')}, 0), 1e-12)) AS e
  FROM raw),
scored AS (SELECT doc_id, {dots} FROM emb),
agg AS (SELECT doc_id, {maxes} FROM scored GROUP BY doc_id)
SELECT doc_id, {_r6(f'({tot})', 'score')} FROM agg
ORDER BY ({tot}) DESC, doc_id LIMIT {MAXSIM_K}
"""

def _sq_bm25_ctes() -> str:
    """BM25 CTEs over ``documents``; exposes ``bm25(doc_id, score)``.
    Mirrors operators.lexical.bm25_topk: same left-associated double
    arithmetic, same term-ordered sequential score fold (list_sum over
    ``list(s ORDER BY term)`` ≡ sort_array + F.aggregate)."""
    terms = sorted(set(RAG_QUESTION.split()))
    term_list = ", ".join(f"'{t}'" for t in terms)
    k1, b = BM25_K1, BM25_B
    return f"""
__bl AS (SELECT doc_id, len({_SQ_TOKS}) AS dl, {_SQ_TOKS} AS t FROM documents),
__const AS (SELECT count(*) AS n, sum(dl) AS sdl FROM __bl),
__terms AS (SELECT doc_id, dl, unnest(t) AS term FROM __bl),
__tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM __terms
         WHERE term IN ({term_list}) GROUP BY 1, 2, 3),
__dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM __tf GROUP BY 1),
__sc AS (SELECT doc_id, term,
           ln(1.0 + (CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5))
           * (tf * ({k1} + 1.0))
           / (tf + {k1} * (1.0 - {b} + {b} * dl / (CAST(sdl AS DOUBLE) / n))) AS s
         FROM __tf JOIN __dfreq USING (term), __const),
bm25 AS (SELECT doc_id, list_sum(list(s ORDER BY term)) AS score FROM __sc GROUP BY doc_id)
"""

def _oracle_bm25_topk() -> str:
    return f"""
WITH {_sq_bm25_ctes().strip()}
SELECT doc_id, {_r6('score', 'score')} FROM bm25
ORDER BY score DESC, doc_id LIMIT {TOPK_K}
"""

_ORACLE_SHIPPING_VOLUME = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS ship_year,
       round(sum(l_extendedprice * (1 - l_discount)), 6) + 0.0 AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
WHERE sn.n_name != cn.n_name
GROUP BY 1, 2, 3
"""

_ORACLE_PROMO_SHARE = """
WITH j AS (SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
                  l_extendedprice * (1 - l_discount) AS rev,
                  CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount)
                       ELSE 0.0 END AS promo
           FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
a AS (SELECT ship_month, sum(promo) AS pr, sum(rev) AS tot FROM j GROUP BY 1)
SELECT ship_month, round(pr, 6) + 0.0 AS promo_revenue, round(tot, 6) + 0.0 AS total_revenue,
       round(100.0 * pr / tot, 6) + 0.0 AS promo_share_pct
FROM a
"""

def _oracle_table_profile() -> str:
    aggs = ["count(*) AS n"]
    sels = []
    for i, c in enumerate(PROFILE_COLS):
        aggs += [
            f"count({c}) AS c{i}",
            f"count(DISTINCT {c}) AS d{i}",
            f"CAST(min({c}) AS VARCHAR) AS lo{i}",
            f"CAST(max({c}) AS VARCHAR) AS hi{i}",
        ]
        sels.append(
            f"SELECT '{c}' AS col_name, n - c{i} AS n_nulls, d{i} AS n_distinct,"
            f" lo{i} AS min_str, hi{i} AS max_str FROM a"
        )
    return f"""
WITH a AS (SELECT {', '.join(aggs)} FROM orders)
{' UNION ALL '.join(sels)}
"""

def _oracle_bm25_knn_join() -> str:
    k1, b = BM25_K1, BM25_B
    return f"""
WITH __qs AS (SELECT doc_id AS qid, list_slice({_SQ_TOKS}, 1, {BM25Q_TOKENS}) AS qt
              FROM documents WHERE doc_id % {BM25Q_MOD} = 0),
__qterms AS (SELECT qid, unnest(list_distinct(qt)) AS term FROM __qs),
__bl AS (SELECT doc_id, len({_SQ_TOKS}) AS dl, {_SQ_TOKS} AS t FROM documents),
__const AS (SELECT count(*) AS n, sum(dl) AS sdl FROM __bl),
__terms AS (SELECT doc_id, dl, unnest(t) AS term FROM __bl),
__tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM __terms
         WHERE term IN (SELECT DISTINCT term FROM __qterms) GROUP BY 1, 2, 3),
__dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM __tf GROUP BY 1),
__sc AS (SELECT q.qid, t.doc_id, t.term,
           ln(1.0 + (CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5))
           * (tf * ({k1} + 1.0))
           / (tf + {k1} * (1.0 - {b} + {b} * dl / (CAST(sdl AS DOUBLE) / n))) AS s
         FROM __tf t JOIN __dfreq USING (term) JOIN __qterms q USING (term), __const),
__sum AS (SELECT qid, doc_id, list_sum(list(s ORDER BY term)) AS score
          FROM __sc GROUP BY 1, 2),
ranked AS (SELECT qid, doc_id, score,
                  CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS INT) AS rank
           FROM __sum)
SELECT qid, doc_id, {_r6('score', 'score')}, rank FROM ranked WHERE rank <= {KNN_K}
"""

def _sq_sparse_ctes(src: str = "documents") -> str:
    """Sparse sqrt-TF postings over ``src``; exposes
    ``__sppost(doc_id, term, w)``. Mirrors operators.sparse
    (sparse_from_text → sparse_postings): portable 60-bit term hash,
    hash-then-group (so 60-bit collisions merge identically),
    ``w = sqrt(tf)`` (IEEE-exact cross-engine, unlike ln)."""
    th = _sq_tok_hash("t")
    return f"""
__sptoks AS (SELECT doc_id, t FROM (SELECT doc_id, unnest({_SQ_TOKS}) AS t FROM {src}) WHERE t <> ''),
__sptf AS (SELECT doc_id, {th} AS term, count(*) AS tf FROM __sptoks GROUP BY 1, 2),
__sppost AS (SELECT doc_id, term, sqrt(CAST(tf AS DOUBLE)) AS w FROM __sptf)
"""

def _oracle_sparse_topk() -> str:
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.sparse import (
        sparse_query_py,
    )

    qi, qv = sparse_query_py(RAG_QUESTION)
    qvals = ", ".join(f"({h}, {w!r})" for h, w in zip(qi, qv))
    return f"""
WITH {_sq_sparse_ctes().strip()},
__spq(term, qw) AS (VALUES {qvals}),
__spsc AS (SELECT p.doc_id, p.term, p.w * q.qw AS s
           FROM __sppost p JOIN __spq q USING (term)),
__spsum AS (SELECT doc_id, list_sum(list(s ORDER BY term)) AS score
            FROM __spsc GROUP BY doc_id)
SELECT doc_id, {_r6('score', 'score')} FROM __spsum
ORDER BY score DESC, doc_id LIMIT {TOPK_K}
"""

def _oracle_sparse_topk_filtered() -> str:
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.contract import (
        SPARSE_FILTER_LANG,
    )
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.sparse import (
        sparse_query_py,
    )

    qi, qv = sparse_query_py(RAG_QUESTION)
    qvals = ", ".join(f"({h}, {w!r})" for h, w in zip(qi, qv))
    src = f"(SELECT * FROM documents WHERE lang = '{SPARSE_FILTER_LANG}')"
    return f"""
WITH {_sq_sparse_ctes(src).strip()},
__spq(term, qw) AS (VALUES {qvals}),
__spsc AS (SELECT p.doc_id, p.term, p.w * q.qw AS s
           FROM __sppost p JOIN __spq q USING (term)),
__spsum AS (SELECT doc_id, list_sum(list(s ORDER BY term)) AS score
            FROM __spsc GROUP BY doc_id)
SELECT doc_id, {_r6('score', 'score')} FROM __spsum
ORDER BY score DESC, doc_id LIMIT {TOPK_K}
"""

def _oracle_sparse_knn_join() -> str:
    th = _sq_tok_hash("t")
    return f"""
WITH {_sq_sparse_ctes().strip()},
__spqs AS (SELECT qid, t FROM (
           SELECT doc_id AS qid, unnest(list_slice({_SQ_TOKS}, 1, {BM25Q_TOKENS})) AS t
           FROM documents WHERE doc_id % {BM25Q_MOD} = 0) WHERE t <> ''),
__spqtf AS (SELECT qid, {th} AS term, count(*) AS tf FROM __spqs GROUP BY 1, 2),
__spqpost AS (SELECT qid, term, sqrt(CAST(tf AS DOUBLE)) AS qw FROM __spqtf),
__spsc AS (SELECT q.qid, p.doc_id, p.term, p.w * q.qw AS s
           FROM __sppost p JOIN __spqpost q USING (term)),
__spsum AS (SELECT qid, doc_id, list_sum(list(s ORDER BY term)) AS score
            FROM __spsc GROUP BY 1, 2),
__spranked AS (SELECT qid, doc_id, score,
       CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS INT) AS rank
       FROM __spsum)
SELECT qid, doc_id, {_r6('score', 'score')}, rank FROM __spranked WHERE rank <= {KNN_K}
"""

def _oracle_hybrid_topk_rrf() -> str:
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.functions.embed import (
        hash_embed_py,
    )

    d = RAG_DIM
    qv = _sq_vec(hash_embed_py(RAG_QUESTION, dim=d))
    th = _sq_tok_hash("t")
    return f"""
WITH {_sq_bm25_ctes().strip()},
__w AS (SELECT doc_id, {_SQ_TOKS} AS w FROM documents),
__raw AS (SELECT doc_id,
  list_transform(range(0, {d}), j -> CAST(coalesce(list_sum(
    list_transform(w, t -> CASE WHEN {th} % {d} = j
      THEN (CASE WHEN {th} % {2 * d} >= {d} THEN 1.0 ELSE -1.0 END)
      ELSE 0.0 END)), 0.0) AS DOUBLE)) AS rawv
  FROM __w),
__emb AS (SELECT doc_id,
  list_transform(rawv, x -> x / coalesce(nullif({_sq_norm('rawv')}, 0), 1e-12)) AS e
  FROM __raw),
__dense AS (SELECT doc_id, {_sq_cosine('e', qv)} AS score FROM __emb
            ORDER BY score DESC, doc_id LIMIT {HYBRID_K_EACH}),
__dr AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r FROM __dense),
__lex AS (SELECT doc_id, score FROM bm25 ORDER BY score DESC, doc_id LIMIT {HYBRID_K_EACH}),
__lr AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r FROM __lex),
__fused AS (SELECT coalesce(__dr.doc_id, __lr.doc_id) AS doc_id,
              coalesce(1.0 / ({RRF_C} + __dr.r), 0.0)
              + coalesce(1.0 / ({RRF_C} + __lr.r), 0.0) AS rrf_score
            FROM __dr FULL OUTER JOIN __lr ON __dr.doc_id = __lr.doc_id)
SELECT doc_id, {_r6('rrf_score', 'rrf_score')} FROM __fused
ORDER BY rrf_score DESC, doc_id LIMIT {TOPK_K}
"""

def _sq_sparse_trunc_cte() -> str:
    """Per-doc top-SPARSE_TRUNC_M truncation of ``__sppost`` (weight
    desc, term asc — mirrors operators.sparse.sparse_truncate);
    exposes ``__sptr(doc_id, term, w)``."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.contract import (
        SPARSE_TRUNC_M,
    )

    return f"""
__sptr AS (SELECT doc_id, term, w FROM (
      SELECT doc_id, term, w, row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, term) AS rn
      FROM __sppost) WHERE rn <= {SPARSE_TRUNC_M})
"""

def _oracle_sparse_topk_trunc() -> str:
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.sparse import (
        sparse_query_py,
    )

    qi, qv = sparse_query_py(RAG_QUESTION)
    qvals = ", ".join(f"({h}, {w!r})" for h, w in zip(qi, qv))
    return f"""
WITH {_sq_sparse_ctes().strip()},
{_sq_sparse_trunc_cte().strip()},
__spq(term, qw) AS (VALUES {qvals}),
__spsc AS (SELECT p.doc_id, p.term, p.w * q.qw AS s
           FROM __sptr p JOIN __spq q USING (term)),
__spsum AS (SELECT doc_id, list_sum(list(s ORDER BY term)) AS score
            FROM __spsc GROUP BY doc_id)
SELECT doc_id, {_r6('score', 'score')} FROM __spsum
ORDER BY score DESC, doc_id LIMIT {TOPK_K}
"""

def _sq_sparse_sq8_cte() -> str:
    """8-bit quantize→dequantize of ``__sppost`` (mirrors
    operators.sparse.sparse_quantize/sparse_dequantize: per-doc max,
    ``floor(w/max·255 + 0.5)·max/255`` — floor, never a
    dialect-divergent round); exposes ``__spq8(doc_id, term, w)``."""
    return """
__spmax AS (SELECT doc_id, max(w) AS mw FROM __sppost GROUP BY 1),
__spq8 AS (SELECT p.doc_id, p.term,
             floor(p.w / m.mw * 255.0 + 0.5) * m.mw / 255.0 AS w
           FROM __sppost p JOIN __spmax m USING (doc_id))
"""

def _oracle_sparse_topk_sq8() -> str:
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.sparse import (
        sparse_query_py,
    )

    qi, qv = sparse_query_py(RAG_QUESTION)
    qvals = ", ".join(f"({h}, {w!r})" for h, w in zip(qi, qv))
    return f"""
WITH {_sq_sparse_ctes().strip()},
{_sq_sparse_sq8_cte().strip()},
__spq(term, qw) AS (VALUES {qvals}),
__spsc AS (SELECT p.doc_id, p.term, p.w * q.qw AS s
           FROM __spq8 p JOIN __spq q USING (term)),
__spsum AS (SELECT doc_id, list_sum(list(s ORDER BY term)) AS score
            FROM __spsc GROUP BY doc_id)
SELECT doc_id, {_r6('score', 'score')} FROM __spsum
ORDER BY score DESC, doc_id LIMIT {TOPK_K}
"""

def _sq_sparse_recall_sql(extra_cte: str, approx_post: str) -> str:
    """Shared recall@KNN_K mirror for the sparse approximate tiers:
    BM25Q-set query encoding + the exact branch from ``__sppost`` +
    the approx branch from ``approx_post`` (a CTE provided via
    ``extra_cte``), inner-joined per query — one source of truth so
    the query rule can never drift between the tiers' oracles."""
    th = _sq_tok_hash("t")
    return f"""
WITH {_sq_sparse_ctes().strip()},
{extra_cte.strip()},
__spqs AS (SELECT qid, t FROM (
           SELECT doc_id AS qid, unnest(list_slice({_SQ_TOKS}, 1, {BM25Q_TOKENS})) AS t
           FROM documents WHERE doc_id % {BM25Q_MOD} = 0) WHERE t <> \'\'),
__spqtf AS (SELECT qid, {th} AS term, count(*) AS tf FROM __spqs GROUP BY 1, 2),
__spqpost AS (SELECT qid, term, sqrt(CAST(tf AS DOUBLE)) AS qw FROM __spqtf),
__exsc AS (SELECT q.qid, p.doc_id, p.term, p.w * q.qw AS s
           FROM __sppost p JOIN __spqpost q USING (term)),
__exsum AS (SELECT qid, doc_id, list_sum(list(s ORDER BY term)) AS score
            FROM __exsc GROUP BY 1, 2),
__exk AS (SELECT qid, doc_id FROM (SELECT qid, doc_id,
            row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rn
          FROM __exsum) WHERE rn <= {KNN_K}),
__apsc AS (SELECT q.qid, p.doc_id, p.term, p.w * q.qw AS s
           FROM {approx_post} p JOIN __spqpost q USING (term)),
__apsum AS (SELECT qid, doc_id, list_sum(list(s ORDER BY term)) AS score
            FROM __apsc GROUP BY 1, 2),
__apk AS (SELECT qid, doc_id FROM (SELECT qid, doc_id,
            row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rn
          FROM __apsum) WHERE rn <= {KNN_K})
SELECT qid, count(*) / {float(KNN_K)} AS recall
FROM __apk JOIN __exk USING (qid, doc_id) GROUP BY qid
"""

def _oracle_recall_sparse_trunc() -> str:
    return _sq_sparse_recall_sql(_sq_sparse_trunc_cte(), "__sptr")

def _oracle_recall_sparse_sq8() -> str:
    return _sq_sparse_recall_sql(_sq_sparse_sq8_cte(), "__spq8")

def _oracle_hybrid_tri_rrf() -> str:
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.functions.embed import (
        hash_embed_py,
    )
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.sparse import (
        sparse_query_py,
    )

    d = RAG_DIM
    qv = _sq_vec(hash_embed_py(RAG_QUESTION, dim=d))
    th = _sq_tok_hash("t")
    qi, qsv = sparse_query_py(RAG_QUESTION)
    qvals = ", ".join(f"({h}, {w!r})" for h, w in zip(qi, qsv))
    return f"""
WITH {_sq_bm25_ctes().strip()},
{_sq_sparse_ctes().strip()},
__w AS (SELECT doc_id, {_SQ_TOKS} AS w FROM documents),
__raw AS (SELECT doc_id,
  list_transform(range(0, {d}), j -> CAST(coalesce(list_sum(
    list_transform(w, t -> CASE WHEN {th} % {d} = j
      THEN (CASE WHEN {th} % {2 * d} >= {d} THEN 1.0 ELSE -1.0 END)
      ELSE 0.0 END)), 0.0) AS DOUBLE)) AS rawv
  FROM __w),
__emb AS (SELECT doc_id,
  list_transform(rawv, x -> x / coalesce(nullif({_sq_norm('rawv')}, 0), 1e-12)) AS e
  FROM __raw),
__dense AS (SELECT doc_id, {_sq_cosine('e', qv)} AS score FROM __emb
            ORDER BY score DESC, doc_id LIMIT {HYBRID_K_EACH}),
__dr AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r FROM __dense),
__lex AS (SELECT doc_id, score FROM bm25 ORDER BY score DESC, doc_id LIMIT {HYBRID_K_EACH}),
__lr AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r FROM __lex),
__spq(term, qw) AS (VALUES {qvals}),
__spsc AS (SELECT p.doc_id, p.term, p.w * q.qw AS s
           FROM __sppost p JOIN __spq q USING (term)),
__spsum AS (SELECT doc_id, list_sum(list(s ORDER BY term)) AS score
            FROM __spsc GROUP BY doc_id),
__sparse AS (SELECT doc_id, score FROM __spsum ORDER BY score DESC, doc_id LIMIT {HYBRID_K_EACH}),
__sr AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r FROM __sparse),
__ab AS (SELECT coalesce(__dr.doc_id, __lr.doc_id) AS doc_id,
           coalesce(1.0 / ({RRF_C} + __dr.r), 0.0)
           + coalesce(1.0 / ({RRF_C} + __lr.r), 0.0) AS ab
         FROM __dr FULL OUTER JOIN __lr ON __dr.doc_id = __lr.doc_id),
__tri AS (SELECT coalesce(__ab.doc_id, __sr.doc_id) AS doc_id,
            coalesce(ab, 0.0) + coalesce(1.0 / ({RRF_C} + __sr.r), 0.0) AS rrf_score
          FROM __ab FULL OUTER JOIN __sr ON __ab.doc_id = __sr.doc_id)
SELECT doc_id, {_r6('rrf_score', 'rrf_score')} FROM __tri
ORDER BY rrf_score DESC, doc_id LIMIT {TOPK_K}
"""

def _oracle_hybrid_topk_linear() -> str:
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.functions.embed import (
        hash_embed_py,
    )

    d = RAG_DIM
    qv = _sq_vec(hash_embed_py(RAG_QUESTION, dim=d))
    th = _sq_tok_hash("t")
    w = repr(float(HYBRID_W_DENSE))
    w2 = repr(1.0 - float(HYBRID_W_DENSE))
    return f"""
WITH {_sq_bm25_ctes().strip()},
__w AS (SELECT doc_id, {_SQ_TOKS} AS w FROM documents),
__raw AS (SELECT doc_id,
  list_transform(range(0, {d}), j -> CAST(coalesce(list_sum(
    list_transform(w, t -> CASE WHEN {th} % {d} = j
      THEN (CASE WHEN {th} % {2 * d} >= {d} THEN 1.0 ELSE -1.0 END)
      ELSE 0.0 END)), 0.0) AS DOUBLE)) AS rawv
  FROM __w),
__emb AS (SELECT doc_id,
  list_transform(rawv, x -> x / coalesce(nullif({_sq_norm('rawv')}, 0), 1e-12)) AS e
  FROM __raw),
__dense AS (SELECT doc_id, {_sq_cosine('e', qv)} AS score FROM __emb
            ORDER BY score DESC, doc_id LIMIT {HYBRID_K_EACH}),
__lex AS (SELECT doc_id, score FROM bm25 ORDER BY score DESC, doc_id LIMIT {HYBRID_K_EACH}),
__dmm AS (SELECT min(score) AS lo, max(score) AS hi FROM __dense),
__lmm AS (SELECT min(score) AS lo, max(score) AS hi FROM __lex),
__dn AS (SELECT doc_id, CASE WHEN __dmm.hi - __dmm.lo = 0.0 THEN 1.0
                             ELSE (score - __dmm.lo) / (__dmm.hi - __dmm.lo) END AS n
         FROM __dense, __dmm),
__ln AS (SELECT doc_id, CASE WHEN __lmm.hi - __lmm.lo = 0.0 THEN 1.0
                             ELSE (score - __lmm.lo) / (__lmm.hi - __lmm.lo) END AS n
         FROM __lex, __lmm),
__f AS (SELECT coalesce(__dn.doc_id, __ln.doc_id) AS doc_id,
               coalesce(__dn.n, 0.0) * {w} + coalesce(__ln.n, 0.0) * {w2} AS fs
        FROM __dn FULL OUTER JOIN __ln ON __dn.doc_id = __ln.doc_id)
SELECT doc_id, {_r6('fs', 'fused_score')} FROM __f
ORDER BY fs DESC, doc_id LIMIT {TOPK_K}
"""

def _oracle_exact_dedup() -> str:
    return """
SELECT doc_id, lang FROM (
  SELECT doc_id, lang, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn FROM documents
) WHERE rn = 1
"""

def _oracle_near_dup_pairs() -> str:
    return f"""
WITH {_SQ_TIDS_CTES.strip()},
{_SQ_NEAR_DUP_CTES.strip()}
SELECT id_a, id_b, {_r6('jaccard', 'jaccard')} FROM near_pairs
"""

def _sq_mixture_ctes() -> str:
    vals = ", ".join(f"('{s}', {float(p)!r})" for s, p in MIX_TARGET.items())
    return f"""tgt(lang, p) AS (VALUES {vals}),
mn AS (SELECT lang, count(*) AS n_avail FROM documents GROUP BY 1),
mj AS (SELECT mn.lang, mn.n_avail, tgt.p FROM mn JOIN tgt USING (lang)),
lam AS (SELECT min(n_avail / p) AS lam FROM mj),
mplan AS (SELECT mj.lang, mj.n_avail,
                 (lam.lam * mj.p) / mj.n_avail AS rate,
                 lam.lam * mj.p AS n_target
          FROM mj, lam)"""

def _oracle_mixture_plan() -> str:
    return f"""
WITH {_sq_mixture_ctes()}
SELECT lang, n_avail, {_r6('rate', 'rate')}, {_r6('n_target', 'n_target')} FROM mplan
"""

def _oracle_mixture_sample() -> str:
    mod = 1_000_000
    h = _sq_tok_hash("CAST(doc_id AS VARCHAR)")
    return f"""
WITH {_sq_mixture_ctes()}
SELECT d.doc_id, d.lang FROM documents d JOIN mplan USING (lang)
WHERE {h} % {mod} < CAST(mplan.rate * {mod} AS BIGINT)
"""

def _oracle_mixture_pipeline() -> str:
    """Curation-to-packing composite mirror (r8): RAW (unrounded)
    quality feeds the within-pred-lang percent_rank (ties impossible —
    the window orders by (quality, doc_id)), the gate keeps
    pctl ≥ floor, the mixture plan/rates rebuild over the SURVIVOR
    set, the portable-hash filter resamples, and the packer's
    per-stratum cumsum bins what remains — the same arithmetic chain,
    same operand order, as the Spark composite."""
    mod = 1_000_000
    h = _sq_tok_hash("CAST(doc_id AS VARCHAR)")
    vals = ", ".join(f"('{s}', {float(p)!r})" for s, p in MIXPIPE_TARGET.items())
    quality = (
        "(CASE WHEN n_tok BETWEEN 20 AND 10000 THEN 0.25 ELSE 0.0 END"
        " + CASE WHEN sw_ratio > 0.01 THEN 0.25 ELSE 0.0 END"
        " + 0.25 * alpha_ratio + 0.25 * distinct_ratio)"
    )
    return f"""
WITH __mt AS (SELECT doc_id, text, {_SQ_TOKS} AS toks FROM documents),
__mm AS (SELECT doc_id,
             CAST(len(list_filter(toks, tk -> list_contains({_SQ_SW}, lower(tk)))) AS DOUBLE)
               / greatest(len(toks), 1) AS sw_ratio,
             CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
               / greatest(length(text), 1) AS alpha_ratio,
             CAST(len(list_distinct(toks)) AS DOUBLE) / greatest(len(toks), 1) AS distinct_ratio,
             len(toks) AS n_tok
      FROM __mt),
__mq AS (SELECT doc_id, {quality} AS quality FROM __mm),
__ml AS (SELECT doc_id, pred_lang FROM ({_oracle_lang_id()})),
__ms AS (SELECT q.doc_id, q.quality, l.pred_lang
         FROM __mq q JOIN __ml l USING (doc_id)),
__mp AS (SELECT doc_id, pred_lang,
                percent_rank() OVER (PARTITION BY pred_lang
                                     ORDER BY quality ASC, doc_id ASC) AS pctl
         FROM __ms),
__mk AS (SELECT doc_id, pred_lang FROM __mp WHERE pctl >= {MIXPIPE_MIN_PCTL}),
__mtgt(pred_lang, p) AS (VALUES {vals}),
__mn AS (SELECT pred_lang, count(*) AS n_avail FROM __mk GROUP BY 1),
__mj AS (SELECT n.pred_lang, n.n_avail, t.p FROM __mn n JOIN __mtgt t USING (pred_lang)),
__mlam AS (SELECT min(n_avail / p) AS lam FROM __mj),
__mrate AS (SELECT pred_lang, (lam * p) / n_avail AS rate FROM __mj, __mlam),
__mx AS (SELECT k.doc_id, k.pred_lang FROM __mk k JOIN __mrate r USING (pred_lang)
         WHERE {h} % {mod} < CAST(r.rate * {mod} AS BIGINT)),
__pt AS (SELECT m.pred_lang, m.doc_id,
                CASE WHEN trim(d.text) = '' THEN 0 ELSE len({_SQ_TOKS}) END AS n_tokens
         FROM __mx m JOIN documents d USING (doc_id)),
__pc AS (SELECT *, sum(n_tokens) OVER (PARTITION BY pred_lang ORDER BY doc_id
                    ROWS UNBOUNDED PRECEDING) AS cum FROM __pt)
SELECT pred_lang, doc_id, CAST(n_tokens AS INT) AS n_tokens,
       CAST(floor((cum - n_tokens) / {PACK_SEQ_LEN}) AS BIGINT) AS bin_id,
       CAST(cum - n_tokens - floor((cum - n_tokens) / {PACK_SEQ_LEN}) * {PACK_SEQ_LEN} AS BIGINT) AS bin_offset
FROM __pc
"""


def _oracle_stratified_sample() -> str:
    mod = 1_000_000
    rate = "0.0"
    for s, r in SAMPLE_RATES.items():
        rate = f"CASE WHEN lang = '{s}' THEN {float(r)} ELSE {rate} END"
    h = _sq_tok_hash("CAST(doc_id AS VARCHAR)")
    return f"""
SELECT doc_id, lang FROM documents
WHERE {h} % {mod} < CAST(({rate}) * {mod} AS BIGINT)
"""

def _oracle_pack_sequences() -> str:
    return f"""
WITH t AS (SELECT lang, doc_id,
                  CASE WHEN trim(text) = '' THEN 0 ELSE len({_SQ_TOKS}) END AS n_tokens
           FROM documents),
c AS (SELECT *, sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                 ROWS UNBOUNDED PRECEDING) AS cum FROM t)
SELECT lang, doc_id, CAST(n_tokens AS INT) AS n_tokens,
       CAST(floor((cum - n_tokens) / {PACK_SEQ_LEN}) AS BIGINT) AS bin_id,
       CAST(cum - n_tokens - floor((cum - n_tokens) / {PACK_SEQ_LEN}) * {PACK_SEQ_LEN} AS BIGINT) AS bin_offset
FROM c
"""

def _oracle_embedding_near_dup_lsh() -> str:
    return f"""
WITH b AS (SELECT vec_id, embedding, {_sq_bucket('embedding')} AS bk FROM embeddings),
pairs AS (SELECT x.vec_id AS id_a, y.vec_id AS id_b,
                 {_sq_cosine('x.embedding', 'y.embedding')} AS c
          FROM b x JOIN b y ON x.bk = y.bk AND x.vec_id < y.vec_id)
SELECT id_a, id_b, {_r6('c', 'cosine')} FROM pairs WHERE c >= {EMB_NEAR_DUP_TAU}
"""

def _oracle_curate_corpus() -> str:
    """Curation composite mirror: quality + lang over documents, gate,
    exact dedup, then the near-dup CTEs rebuilt over the SURVIVOR set
    (the vocabulary is rebuilt over the same rows the Spark pipeline
    hashes)."""
    langs = ", ".join(f"'{x}'" for x in CURATE_LANGS)
    quality = (
        "(CASE WHEN n_tok BETWEEN 20 AND 10000 THEN 0.25 ELSE 0.0 END"
        " + CASE WHEN sw_ratio > 0.01 THEN 0.25 ELSE 0.0 END"
        " + 0.25 * alpha_ratio + 0.25 * distinct_ratio)"
    )
    return f"""
WITH __qt AS (SELECT doc_id, text, {_SQ_TOKS} AS toks FROM documents),
__qm AS (SELECT doc_id,
             CAST(len(list_filter(toks, tk -> list_contains({_SQ_SW}, lower(tk)))) AS DOUBLE)
               / greatest(len(toks), 1) AS sw_ratio,
             CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
               / greatest(length(text), 1) AS alpha_ratio,
             CAST(len(list_distinct(toks)) AS DOUBLE) / greatest(len(toks), 1) AS distinct_ratio,
             len(toks) AS n_tok
      FROM __qt),
__q AS (SELECT doc_id, round({quality}, 6) AS quality FROM __qm),
__lt AS (SELECT doc_id, list_distinct(list_transform({_SQ_TOKS}, tk -> lower(tk))) AS lt FROM documents),
__lh AS (SELECT doc_id, l.lang, len(list_filter(lt, tk -> list_contains(l.words, tk))) AS h
         FROM __lt, (SELECT * FROM (VALUES {_SQ_LANG_VALUES}) AS v(lang, words)) l),
__lb AS (SELECT doc_id, lang, h,
                row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, lang DESC) AS rn
         FROM __lh),
__l AS (SELECT doc_id, CASE WHEN h > 0 THEN lang ELSE 'und' END AS pred_lang FROM __lb WHERE rn = 1),
__gated AS (SELECT d.doc_id, d.text, q.quality, l.pred_lang
            FROM documents d JOIN __q q USING (doc_id) JOIN __l l USING (doc_id)
            WHERE q.quality >= {CURATE_MIN_QUALITY} AND l.pred_lang IN ({langs})),
curated0 AS (SELECT doc_id, text, quality, pred_lang FROM (
               SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn FROM __gated
             ) WHERE rn = 1),
{_sq_tids_ctes_from('curated0').strip()},
{_SQ_NEAR_DUP_CTES.strip()},
__losers AS (SELECT DISTINCT id_b FROM near_pairs)
SELECT doc_id, quality + 0.0 AS quality, pred_lang
FROM curated0
WHERE NOT EXISTS (SELECT 1 FROM __losers WHERE __losers.id_b = curated0.doc_id)
"""

def _oracle_curate_corpus_full() -> str:
    """Full-hygiene composite mirror: the curate mirror plus a
    repetition-gate CTE, the PII regexp_replace chain (identity on this
    corpus — the md5 pins that), and decontamination CTEs over the
    survivor set."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.pii import (
        EMAIL_RE,
        IPV4_RE,
        PHONE_RE,
    )

    langs = ", ".join(f"'{x}'" for x in CURATE_LANGS)
    quality = (
        "(CASE WHEN n_tok BETWEEN 20 AND 10000 THEN 0.25 ELSE 0.0 END"
        " + CASE WHEN sw_ratio > 0.01 THEN 0.25 ELSE 0.0 END"
        " + 0.25 * alpha_ratio + 0.25 * distinct_ratio)"
    )
    redact = (
        "regexp_replace(regexp_replace(regexp_replace(text, '"
        + EMAIL_RE
        + "', '[EMAIL]', 'g'), '"
        + PHONE_RE
        + "', '[PHONE]', 'g'), '"
        + IPV4_RE
        + "', '[IP]', 'g')"
    )
    probe_text = (
        f"array_to_string(list_slice({_SQ_TOKS}, 1, {CONTAM_PROBE_TOKENS}), ' ')"
    )
    return f"""
WITH __qt AS (SELECT doc_id, text, {_SQ_TOKS} AS toks FROM documents),
__qm AS (SELECT doc_id,
             CAST(len(list_filter(toks, tk -> list_contains({_SQ_SW}, lower(tk)))) AS DOUBLE)
               / greatest(len(toks), 1) AS sw_ratio,
             CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
               / greatest(length(text), 1) AS alpha_ratio,
             CAST(len(list_distinct(toks)) AS DOUBLE) / greatest(len(toks), 1) AS distinct_ratio,
             len(toks) AS n_tok
      FROM __qt),
__q AS (SELECT doc_id, round({quality}, 6) AS quality FROM __qm),
__lt AS (SELECT doc_id, list_distinct(list_transform({_SQ_TOKS}, tk -> lower(tk))) AS lt FROM documents),
__lh AS (SELECT doc_id, l.lang, len(list_filter(lt, tk -> list_contains(l.words, tk))) AS h
         FROM __lt, (SELECT * FROM (VALUES {_SQ_LANG_VALUES}) AS v(lang, words)) l),
__lb AS (SELECT doc_id, lang, h,
                row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, lang DESC) AS rn
         FROM __lh),
__l AS (SELECT doc_id, CASE WHEN h > 0 THEN lang ELSE 'und' END AS pred_lang FROM __lb WHERE rn = 1),
__rt AS (SELECT doc_id, {_SQ_TOKS} AS t FROM documents),
__rsh AS (SELECT doc_id, unnest({_sq_shingles('t', REPEAT_N)}) AS ngram FROM __rt),
__rc AS (SELECT doc_id, ngram, count(*) AS cnt FROM __rsh GROUP BY 1, 2),
__rp AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_ng, count(*) AS n_d FROM __rc GROUP BY 1),
__rep AS (SELECT doc_id, round(1.0 - n_d / CAST(n_ng AS DOUBLE), 6) AS dup_ngram_ratio FROM __rp),
__gated AS (SELECT d.doc_id, {redact} AS text, q.quality, l.pred_lang, r.dup_ngram_ratio
            FROM documents d JOIN __q q USING (doc_id) JOIN __l l USING (doc_id)
                 JOIN __rep r USING (doc_id)
            WHERE q.quality >= {CURATE_MIN_QUALITY} AND l.pred_lang IN ({langs})
              AND r.dup_ngram_ratio <= {CURATE_MAX_DUP}),
curated0 AS (SELECT doc_id, text, quality, pred_lang, dup_ngram_ratio FROM (
               SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn FROM __gated
             ) WHERE rn = 1),
{_sq_tids_ctes_from('curated0').strip()},
{_SQ_NEAR_DUP_CTES.strip()},
__losers AS (SELECT DISTINCT id_b FROM near_pairs),
__surv AS (SELECT * FROM curated0
           WHERE NOT EXISTS (SELECT 1 FROM __losers WHERE __losers.id_b = curated0.doc_id)),
__pb AS (SELECT doc_id, {probe_text} AS text FROM documents WHERE doc_id % {CONTAM_PROBE_MOD} = 0),
__pt AS (SELECT doc_id AS probe_id, {_SQ_TOKS} AS t FROM __pb),
__png AS (SELECT probe_id, unnest(list_distinct({_sq_shingles('t', CONTAM_N)})) AS ngram FROM __pt),
__pden AS (SELECT probe_id, count(*) AS n_probe FROM __png GROUP BY 1),
__tt AS (SELECT doc_id AS train_id, {_SQ_TOKS} AS t FROM __surv),
__tng AS (SELECT train_id, unnest(list_distinct({_sq_shingles('t', CONTAM_N)})) AS ngram FROM __tt),
__hits AS (SELECT train_id, probe_id, count(*) AS c FROM __tng JOIN __png USING (ngram) GROUP BY 1, 2),
__flag AS (SELECT DISTINCT train_id FROM __hits JOIN __pden USING (probe_id)
           WHERE round(c / CAST(n_probe AS DOUBLE), 6) + 0.0 >= {CONTAM_THRESHOLD})
SELECT doc_id, quality + 0.0 AS quality, pred_lang,
       dup_ngram_ratio + 0.0 AS dup_ngram_ratio, md5(text) AS redacted_md5
FROM __surv
WHERE NOT EXISTS (SELECT 1 FROM __flag WHERE __flag.train_id = __surv.doc_id)
"""

def _oracle_jaccard_pairs() -> str:
    return f"""
WITH {_SQ_TIDS_CTES.strip()},
ex AS (SELECT doc_id, len(tids) AS n, unnest(tids) AS tid FROM tids),
agg AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb, count(*) AS inter
        FROM ex a JOIN ex b ON a.tid = b.tid AND a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4)
SELECT id_a, id_b, {_r6('CAST(inter AS DOUBLE) / (na + nb - inter)', 'jaccard')}
FROM agg WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= {JACCARD_MIN}
"""

def _oracle_simhash() -> str:
    return f"""
WITH {_SQ_SIMHASH_CTES.strip()}
SELECT doc_id, simhash FROM sim
"""

def _oracle_simhash_near_dups() -> str:
    bb = SIMHASH_BITS // SIMHASH_BLOCKS
    mask = (1 << bb) - 1
    return f"""
WITH {_SQ_SIMHASH_CTES.strip()},
blocks AS (SELECT doc_id, simhash, j AS blk, (simhash >> (j * {bb})) & {mask} AS key
           FROM sim, (SELECT unnest(range(0, {SIMHASH_BLOCKS})) AS j)),
pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.simhash AS sa, b.simhash AS sb
          FROM blocks a JOIN blocks b ON a.blk = b.blk AND a.key = b.key AND a.doc_id < b.doc_id)
SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
FROM pairs WHERE bit_count(xor(sa, sb)) <= {SIMHASH_MAX_HAMMING}
"""

def _oracle_embedding_near_dup() -> str:
    return f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {_r6(_sq_cosine('a.embedding', 'b.embedding'), 'cosine')}
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {_sq_cosine('a.embedding', 'b.embedding')} >= {EMB_NEAR_DUP_TAU}
"""

def _oracle_dedup_clusters() -> str:
    return f"""
WITH RECURSIVE {_SQ_TIDS_CTES.strip()},
{_SQ_NEAR_DUP_CTES.strip()},
edges AS (SELECT id_a AS s, id_b AS d FROM near_pairs
          UNION SELECT id_b, id_a FROM near_pairs),
reach (s, d) AS (SELECT s, d FROM edges
                 UNION SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s)
SELECT s AS doc_id, least(min(d), s) AS canonical_id FROM reach GROUP BY s
"""

def _oracle_token_stats() -> str:
    return f"""
WITH t AS (SELECT doc_id, text, {_SQ_TOKS} AS toks FROM documents)
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(CASE WHEN trim(text) = '' THEN 0 ELSE len(toks) END AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_subword_tokens,
       {_r6("CAST(list_sum(list_transform(toks, tk -> length(tk))) AS DOUBLE) / greatest(len(toks), 1)", 'avg_token_len')}
FROM t
"""

_SQ_SW = "[" + ", ".join(f"'{w}'" for w in TX.EN_STOPWORDS) + "]"

#: language → wordlist VALUES rows (shared by lang_id + curation oracles);
#: must stay in sync with operators.textstats.lang_id's wordlists
_LANG_WORDLISTS = {
    "en": TX.EN_STOPWORDS,
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu", "mit"],
    "fr": ["le", "la", "les", "et", "est", "une", "un", "des", "du", "pour"],
    "es": ["el", "la", "los", "las", "es", "una", "uno", "para", "con", "por"],
}

_SQ_LANG_VALUES = ", ".join(
    "('" + lang + "', [" + ", ".join(f"'{w}'" for w in words) + "])"
    for lang, words in _LANG_WORDLISTS.items()
)

def _oracle_budget_select() -> str:
    quality = (
        "round(CASE WHEN n_tok BETWEEN 20 AND 10000 THEN 0.25 ELSE 0.0 END"
        " + CASE WHEN sw_ratio > 0.01 THEN 0.25 ELSE 0.0 END"
        " + 0.25 * alpha_ratio + 0.25 * distinct_ratio, 6)"
    )
    ws_tokens = f"CASE WHEN trim(text) = '' THEN 0 ELSE len({_SQ_TOKS}) END"
    return f"""
WITH t AS (SELECT doc_id, text, {_SQ_TOKS} AS toks FROM documents),
m AS (SELECT doc_id,
             CAST(len(list_filter(toks, tk -> list_contains({_SQ_SW}, lower(tk)))) AS DOUBLE)
               / greatest(len(toks), 1) AS sw_ratio,
             CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
               / greatest(length(text), 1) AS alpha_ratio,
             CAST(len(list_distinct(toks)) AS DOUBLE) / greatest(len(toks), 1) AS distinct_ratio,
             len(toks) AS n_tok
      FROM t),
j AS (SELECT d.doc_id, {quality} AS quality, {ws_tokens} AS ntk
      FROM documents d JOIN m USING (doc_id)),
c AS (SELECT doc_id, quality, ntk,
             sum(ntk) OVER (ORDER BY quality DESC, doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM j)
SELECT doc_id, quality + 0.0 AS quality, CAST(ntk AS BIGINT) AS n_tokens,
       CAST(cum AS BIGINT) AS cum_tokens
FROM c WHERE cum <= {BUDGET_TOKENS}
"""

def _oracle_budget_select_tokencol() -> str:
    """budget_select with the token_count seam: the cumsum runs over
    the surrogate count column (length(text) %% 97 + 1), never the
    tokenizer — mirrors q_budget_select_tokencol exactly."""
    quality = (
        "round(CASE WHEN n_tok BETWEEN 20 AND 10000 THEN 0.25 ELSE 0.0 END"
        " + CASE WHEN sw_ratio > 0.01 THEN 0.25 ELSE 0.0 END"
        " + 0.25 * alpha_ratio + 0.25 * distinct_ratio, 6)"
    )
    return f"""
WITH t AS (SELECT doc_id, text, {_SQ_TOKS} AS toks FROM documents),
m AS (SELECT doc_id,
             CAST(len(list_filter(toks, tk -> list_contains({_SQ_SW}, lower(tk)))) AS DOUBLE)
               / greatest(len(toks), 1) AS sw_ratio,
             CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
               / greatest(length(text), 1) AS alpha_ratio,
             CAST(len(list_distinct(toks)) AS DOUBLE) / greatest(len(toks), 1) AS distinct_ratio,
             len(toks) AS n_tok
      FROM t),
j AS (SELECT d.doc_id, {quality} AS quality,
             length(d.text) % 97 + 1 AS ntk
      FROM documents d JOIN m USING (doc_id)),
c AS (SELECT doc_id, quality, ntk,
             sum(ntk) OVER (ORDER BY quality DESC, doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM j)
SELECT doc_id, quality + 0.0 AS quality, CAST(ntk AS BIGINT) AS n_tokens,
       CAST(cum AS BIGINT) AS cum_tokens
FROM c WHERE cum <= {BUDGET_TOKENS}
"""

def _oracle_knn_classify() -> str:
    return f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < {KNN_QUERIES}),
scored AS (SELECT qid, e.vec_id AS neighbor_id, {_sq_cosine('e.embedding', 'qv')} AS s
           FROM embeddings e, q),
ranked AS (SELECT qid, neighbor_id, s,
                  row_number() OVER (PARTITION BY qid ORDER BY s DESC, neighbor_id) AS rank
           FROM scored),
nn AS (SELECT qid, neighbor_id, s FROM ranked WHERE rank <= {KNN_K}),
lv AS (SELECT qid, e.label, count(*) AS votes, sum(s) AS vote_score
       FROM nn JOIN embeddings e ON e.vec_id = nn.neighbor_id GROUP BY 1, 2),
best AS (SELECT *, row_number() OVER (PARTITION BY qid
                   ORDER BY votes DESC, vote_score DESC, label) AS rn FROM lv)
SELECT qid, CAST(label AS INT) AS pred_label, CAST(votes AS BIGINT) AS votes,
       {_r6('vote_score', 'vote_score')}
FROM best WHERE rn = 1
"""

def _oracle_quality_score() -> str:
    return f"""
WITH t AS (SELECT doc_id, text, {_SQ_TOKS} AS toks FROM documents),
m AS (SELECT doc_id,
             CAST(len(list_filter(toks, tk -> list_contains({_SQ_SW}, lower(tk)))) AS DOUBLE)
               / greatest(len(toks), 1) AS sw_ratio,
             CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
               / greatest(length(text), 1) AS alpha_ratio,
             CAST(len(list_distinct(toks)) AS DOUBLE) / greatest(len(toks), 1) AS distinct_ratio,
             len(toks) AS n_tok
      FROM t)
SELECT doc_id,
       {_r6('sw_ratio', 'stopword_ratio')},
       {_r6('alpha_ratio', 'alpha_ratio')},
       {_r6('distinct_ratio', 'distinct_token_ratio')},
       {_r6("(CASE WHEN n_tok BETWEEN 20 AND 10000 THEN 0.25 ELSE 0.0 END"
            " + CASE WHEN sw_ratio > 0.01 THEN 0.25 ELSE 0.0 END"
            " + 0.25 * alpha_ratio + 0.25 * distinct_ratio)", 'quality')}
FROM m
"""

def _oracle_lang_id() -> str:
    wordlists = {
        "en": TX.EN_STOPWORDS,
        "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu", "mit"],
        "fr": ["le", "la", "les", "et", "est", "une", "un", "des", "du", "pour"],
        "es": ["el", "la", "los", "las", "es", "una", "uno", "para", "con", "por"],
    }
    values = ", ".join(
        "('" + lang + "', [" + ", ".join(f"'{w}'" for w in words) + "])"
        for lang, words in wordlists.items()
    )
    return f"""
WITH t AS (SELECT doc_id, list_distinct(list_transform({_SQ_TOKS}, tk -> lower(tk))) AS lt FROM documents),
hits AS (SELECT doc_id, l.lang,
                len(list_filter(lt, tk -> list_contains(l.words, tk))) AS h
         FROM t, (SELECT * FROM (VALUES {values}) AS v(lang, words)) l),
best AS (SELECT doc_id, lang, h,
                row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, lang DESC) AS rn
         FROM hits)
SELECT doc_id, CASE WHEN h > 0 THEN lang ELSE 'und' END AS pred_lang, CAST(h AS INT) AS stopword_hits
FROM best WHERE rn = 1
"""

def _oracle_rolling_fingerprint() -> str:
    k, base, prime = SHINGLE_N, T.FP_BASE, T.FP_PRIME
    return f"""
WITH t AS (SELECT doc_id, list_transform({_SQ_TOKS}, tok -> {_sq_tok_hash('tok')} % {1 << 30}) AS tids
           FROM documents),
w AS (SELECT doc_id, list_transform(range(1, greatest(len(tids) - {k - 1}, 1) + 1),
             i -> list_reduce(list_prepend(0::BIGINT, list_slice(tids, i, i + {k - 1})),
                              (acc, x) -> (acc * {base} + x) % {prime})) AS wh
      FROM t)
SELECT doc_id, list_min(wh) AS fingerprint, CAST(len(list_distinct(wh)) AS BIGINT) AS n_distinct_windows
FROM w
"""

def _oracle_corpus_stats() -> str:
    return f"""
WITH t AS (SELECT lang, source, text,
                  CASE WHEN trim(text) = '' THEN 0 ELSE len({_SQ_TOKS}) END AS ntok
           FROM documents)
SELECT lang, source, count(*) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS total_chars,
       CAST(sum(ntok) AS BIGINT) AS total_tokens,
       {_r6('avg(length(text))', 'avg_chars')}
FROM t GROUP BY lang, source
"""

def _oracle_repetition_stats() -> str:
    return f"""
WITH t AS (SELECT doc_id, {_SQ_TOKS} AS t FROM documents),
sh AS (SELECT doc_id, unnest({_sq_shingles('t', REPEAT_N)}) AS ngram FROM t),
c AS (SELECT doc_id, ngram, count(*) AS cnt FROM sh GROUP BY 1, 2),
p AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_ngrams,
             count(*) AS n_distinct_ngrams, max(cnt) AS top FROM c GROUP BY 1)
SELECT doc_id, n_ngrams, n_distinct_ngrams,
       {_r6('1.0 - n_distinct_ngrams / CAST(n_ngrams AS DOUBLE)', 'dup_ngram_ratio')},
       {_r6('top / CAST(n_ngrams AS DOUBLE)', 'top_ngram_ratio')}
FROM p
"""

def _oracle_dup_span_stats() -> str:
    return f"""
WITH t AS (SELECT doc_id, {_SQ_TOKS} AS t FROM documents),
sh AS (SELECT doc_id, unnest({_sq_shingles('t', DUP_SPAN_N)}) AS ngram FROM t),
occ AS (SELECT doc_id, ngram, count(*) AS cnt FROM sh GROUP BY 1, 2),
dfq AS (SELECT ngram, count(*) AS doc_freq FROM occ GROUP BY 1),
shared AS (
  SELECT o.doc_id, sum(o.cnt) AS n_shared
  FROM occ o JOIN dfq ON o.ngram = dfq.ngram AND dfq.doc_freq >= 2
  GROUP BY 1
),
tot AS (SELECT doc_id, len({_sq_shingles('t', DUP_SPAN_N)}) AS n_spans FROM t)
SELECT tot.doc_id, tot.n_spans,
       CAST(coalesce(s.n_shared, 0) AS BIGINT) AS n_shared_spans,
       {_r6('coalesce(s.n_shared, 0) / CAST(tot.n_spans AS DOUBLE)', 'dup_span_frac')}
FROM tot LEFT JOIN shared s ON tot.doc_id = s.doc_id
"""


def _oracle_remove_dup_spans() -> str:
    """Span-removal mirror: rank each n-gram's occurrences by
    (doc, pos) — rank 1 is the corpus-wide first occurrence — then a
    token survives iff some first-occurrence span covers it. Groups by
    the n-gram STRING (the Spark side hashes to xxhash64 longs), so
    the md5-pinned rewritten bytes also certify collision-freeness."""
    n = DUP_SPAN_N
    sh = _sq_shingles("t", n)
    return f"""
WITH t AS (SELECT doc_id, {_SQ_TOKS} AS t FROM documents),
sp AS (SELECT doc_id, unnest({sh}) AS g,
              unnest(range(1, len({sh}) + 1)) AS pos
       FROM t),
rk AS (SELECT doc_id, pos,
              row_number() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn
       FROM sp),
ke AS (SELECT doc_id, list_sort(list(pos)) AS ks FROM rk WHERE rn = 1 GROUP BY doc_id),
kp AS (SELECT t.doc_id, t.t AS w,
              list_sort(list_distinct(flatten(list_transform(coalesce(ke.ks, []),
                p -> range(p, least(p + {n - 1}, len(t.t)) + 1))))) AS kpos
       FROM t LEFT JOIN ke ON t.doc_id = ke.doc_id)
SELECT doc_id,
       CAST(len(w) AS BIGINT) AS n_tokens,
       CAST(len(kpos) AS BIGINT) AS n_kept,
       md5(coalesce(array_to_string(list_transform(kpos, j -> w[j]), ' '), ''))
         AS clean_md5
FROM kp
"""


def _oracle_ranking_quality() -> str:
    import math

    idcg = sum(1.0 / math.log2(r + 1) for r in range(1, KNN_K + 1))
    pref_e = f"list_slice(e.embedding, 1, {RANK_EVAL_M})"
    pref_q = f"list_slice(qv, 1, {RANK_EVAL_M})"
    return f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < {KNN_QUERIES}),
ex_s AS (SELECT qid, e.vec_id AS nid, {_sq_cosine('e.embedding', 'qv')} AS s FROM embeddings e, q),
exact AS (SELECT qid, nid FROM (
  SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY s DESC, nid) AS r FROM ex_s
) WHERE r <= {KNN_K}),
ap_s AS (SELECT qid, e.vec_id AS nid, {_sq_cosine(pref_e, pref_q)} AS s FROM embeddings e, q),
approx AS (SELECT qid, nid, rank FROM (
  SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY s DESC, nid) AS rank FROM ap_s
) WHERE rank <= {KNN_K}),
hits AS (SELECT a.qid, a.rank FROM approx a JOIN exact USING (qid, nid)),
m AS (SELECT qid, sum(1.0 / log2(rank + 1.0)) / {idcg!r} AS ndcg,
             max(1.0 / rank) AS mrr
      FROM hits GROUP BY 1)
SELECT dq.qid, {_r6('coalesce(m.ndcg, 0.0)', 'ndcg')}, {_r6('coalesce(m.mrr, 0.0)', 'mrr')}
FROM (SELECT DISTINCT qid FROM q) dq LEFT JOIN m ON dq.qid = m.qid
"""


def _sq_dsir_ctes() -> str:
    """The DSIR weight CTE chain up to ``pd(doc_id, n_grams,
    log_weight)`` — shared by the weights and resample oracles.
    Mirrors operators.sampling.dsir_weights' featurization: each token
    hashed once (portable hash mod 2^31), unigram bucket = h mod K,
    bigram bucket = (h_i*31 + h_{i+1}) mod K — pure integer math, no
    bigram strings."""
    a, bkt = repr(float(DSIR_ALPHA)), DSIR_BUCKETS
    ab = repr(float(DSIR_ALPHA) * DSIR_BUCKETS)
    return f"""t AS (SELECT doc_id, lang, {_SQ_TOKS} AS toks FROM documents),
hb AS (SELECT doc_id, lang = 'en' AS is_t,
              list_transform(toks, x -> {_sq_tok_hash('x')} % 2147483648) AS hs
       FROM t),
feat AS (SELECT doc_id, is_t,
                list_concat(
                  list_transform(hs, h -> h % {bkt}),
                  list_transform(range(1, greatest(len(hs) - 1, 0) + 1),
                                 i -> (hs[i] * 31 + hs[i + 1]) % {bkt})
                ) AS bs
         FROM hb),
gb AS (SELECT doc_id, is_t, unnest(bs) AS b FROM feat),
raw AS (SELECT b, count(*) AS n_raw FROM gb GROUP BY 1),
tgt AS (SELECT b, count(*) AS n_tgt FROM gb WHERE is_t GROUP BY 1),
tots AS (SELECT (SELECT sum(n_raw) FROM raw) AS t_raw,
                (SELECT coalesce(sum(n_tgt), 0) FROM tgt) AS t_tgt),
lam AS (SELECT raw.b,
               ln((coalesce(tgt.n_tgt, 0) + {a}) / (tots.t_tgt + {ab}))
             - ln((raw.n_raw + {a}) / (tots.t_raw + {ab})) AS lam
        FROM raw LEFT JOIN tgt USING (b) CROSS JOIN tots),
pd AS (SELECT gb.doc_id, count(*) AS n_grams,
              sum(lam.lam) AS log_weight
       FROM gb JOIN lam USING (b) GROUP BY 1)"""


def _oracle_dsir_weights() -> str:
    return f"""
WITH {_sq_dsir_ctes()}
SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
       {_r6('log_weight', 'log_weight')},
       {_r6('log_weight / CAST(n_grams AS DOUBLE)', 'avg_log_weight')}
FROM pd
"""


def _oracle_normalized_dedup() -> str:
    return r"""
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, upper(text) || '!!!' FROM documents WHERE doc_id % 3 = 0
),
c AS (SELECT doc_id,
             md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS canon_md5
      FROM aug)
SELECT min(doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS n_copies, canon_md5
FROM c GROUP BY canon_md5
"""


def _oracle_gopher_rules() -> str:
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.contract import (
        GOPHER_MIN_WORDS,
    )
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.textstats import (
        GOPHER_STOPWORDS,
    )

    stops = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    return rf"""
WITH pg AS (
  SELECT doc_id, concat_ws('', text,
    CASE WHEN doc_id % 5 = 0 THEN chr(10) || '- bullet item one' || chr(10) || '- another bullet item' END,
    CASE WHEN doc_id % 4 = 0 THEN chr(10) || 'this line has to be continued...' END
  ) AS text FROM documents
),
b AS (
  SELECT doc_id, text, {_SQ_TOKS} AS t, string_split(text, chr(10)) AS lines
  FROM pg
),
m AS (
  SELECT doc_id, text, t, lines,
    len(t) AS n_words,
    greatest(len(t), 1) AS nw,
    greatest(len(lines), 1) AS nl,
    list_sum(list_transform(t, x -> CAST(length(x) AS DOUBLE))) / greatest(len(t), 1) AS mean_wl,
    (len(regexp_extract_all(text, '#')) + len(regexp_extract_all(text, '\.\.\.')))
      / CAST(greatest(len(t), 1) AS DOUBLE) AS symbol_ratio,
    len(list_filter(lines, l -> regexp_matches(trim(l), '^[-*•]')))
      / CAST(greatest(len(lines), 1) AS DOUBLE) AS bullet_frac,
    len(list_filter(lines, l -> regexp_matches(trim(l), '\.\.\.$')))
      / CAST(greatest(len(lines), 1) AS DOUBLE) AS ellipsis_frac,
    len(list_filter(t, x -> regexp_matches(x, '[A-Za-z]')))
      / CAST(greatest(len(t), 1) AS DOUBLE) AS alpha_frac,
    len(list_intersect(list_distinct(list_transform(t, x -> lower(x))), [{stops}])) AS stop_hits
  FROM b
)
SELECT doc_id,
  CAST(n_words AS INT) AS n_words,
  {_r6('mean_wl', 'mean_word_len')},
  {_r6('symbol_ratio', 'symbol_word_ratio')},
  {_r6('bullet_frac', 'bullet_line_frac')},
  {_r6('ellipsis_frac', 'ellipsis_line_frac')},
  {_r6('alpha_frac', 'alpha_word_frac')},
  CAST(stop_hits AS INT) AS n_stopword_kinds,
  (n_words >= {GOPHER_MIN_WORDS} AND n_words <= 100000) AS r_word_count,
  (mean_wl >= 3.0 AND mean_wl <= 10.0) AS r_mean_word_len,
  (symbol_ratio <= 0.1) AS r_symbol_ratio,
  (bullet_frac <= 0.9) AS r_bullet_lines,
  (ellipsis_frac <= 0.3) AS r_ellipsis_lines,
  (alpha_frac >= 0.8) AS r_alpha_words,
  (stop_hits >= 2) AS r_stopwords,
  ((n_words >= {GOPHER_MIN_WORDS} AND n_words <= 100000)
   AND (mean_wl >= 3.0 AND mean_wl <= 10.0)
   AND (symbol_ratio <= 0.1)
   AND (bullet_frac <= 0.9)
   AND (ellipsis_frac <= 0.3)
   AND (alpha_frac >= 0.8)
   AND (stop_hits >= 2)) AS gopher_pass
FROM m
"""


def _oracle_dsir_resample() -> str:
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.contract import (
        DSIR_SAMPLE_N,
        DSIR_TEMP,
    )

    t = repr(float(DSIR_TEMP))
    u = (
        "(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || ':17'), 1, 15)) AS BIGINT)"
        " % 1000000 + 1) / 1000001.0"
    )
    return f"""
WITH {_sq_dsir_ctes()},
alw AS (SELECT doc_id, log_weight / CAST(n_grams AS DOUBLE) AS a FROM pd),
keyed AS (SELECT doc_id, a / {t} + (-ln(-ln({u}))) AS gumbel_key FROM alw)
SELECT doc_id, {_r6('gumbel_key', 'gumbel_key')}
FROM keyed ORDER BY keyed.gumbel_key DESC, doc_id ASC LIMIT {DSIR_SAMPLE_N}
"""


def _oracle_c4_clean() -> str:
    return r"""
WITH pg AS (
  SELECT doc_id, concat_ws(chr(10),
    substr(text, 1, 60) || ' and the sentence ends here.',
    'Home | About | Contact',
    CASE WHEN doc_id % 3 = 0 THEN 'Short stub'
         ELSE 'Another valid prose line number ' || CAST(doc_id % 10 AS VARCHAR) || '.' END,
    CASE WHEN doc_id % 7 = 0 THEN 'This page contains lorem ipsum filler text.'
         ELSE 'Clean closing line with punctuation.' END,
    CASE WHEN doc_id % 11 = 0 THEN 'var x = { javascript: true };' ELSE NULL END
  ) AS text FROM documents
),
k AS (SELECT doc_id, text, string_split(text, chr(10)) AS lines,
        list_filter(string_split(text, chr(10)),
          x -> regexp_matches(trim(x), '[.!?"]$')
           AND len(regexp_split_to_array(trim(x), '\s+')) >= 5) AS kept
      FROM pg),
c AS (SELECT doc_id, text, lines, kept,
        array_to_string(list_transform(kept, x -> trim(x)), chr(10)) AS clean
      FROM k)
SELECT doc_id,
  CAST(len(lines) AS INT) AS n_lines,
  CAST(len(kept) AS INT) AS n_kept_lines,
  CAST(len(regexp_split_to_array(clean, '[.!?]+')) - 1 AS INT) AS n_sentences,
  md5(clean) AS clean_md5,
  (len(regexp_split_to_array(clean, '[.!?]+')) - 1 >= 3
   AND NOT (contains(lower(text), 'lorem ipsum')
            OR contains(text, '{')
            OR contains(lower(text), 'javascript'))
   AND len(kept) >= 1) AS keep
FROM c
"""


def _oracle_lm_doc_scores() -> str:
    a = repr(float(LM_ALPHA))
    return f"""
WITH toks AS (SELECT doc_id, list_concat(['<s>'], {_SQ_TOKS}) AS t
              FROM documents WHERE text IS NOT NULL AND trim(text) != ''),
idx AS (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks),
pairs AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2 FROM idx),
b AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY 1, 2),
c AS (SELECT w1, count(*) AS c1 FROM pairs GROUP BY 1),
v AS (SELECT count(DISTINCT w2) AS v FROM pairs),
s AS (SELECT p.doc_id,
             ln((coalesce(b.c12, 0) + {a}) / (coalesce(c.c1, 0) + {a} * v.v)) AS logp
      FROM pairs p LEFT JOIN b USING (w1, w2) LEFT JOIN c USING (w1) CROSS JOIN v)
SELECT doc_id, count(*) AS n_bigrams,
       {_r6('avg(logp)', 'avg_logp')},
       {_r6('exp(-avg(logp))', 'ppl')}
FROM s GROUP BY doc_id
"""

def _oracle_top_ngrams() -> str:
    return f"""
WITH t AS (SELECT doc_id, {_SQ_TOKS} AS t FROM documents),
sh AS (SELECT doc_id, unnest({_sq_shingles('t', TOPNG_N)}) AS ngram FROM t),
c AS (SELECT ngram, count(*) AS n_occurrences,
             count(DISTINCT doc_id) AS n_docs FROM sh GROUP BY 1)
SELECT ngram, n_occurrences, n_docs FROM c
ORDER BY n_occurrences DESC, ngram ASC LIMIT {TOPNG_TOP}
"""

def _oracle_doc_signals() -> str:
    """Composes the four signal mirrors as subqueries (DuckDB allows a
    WITH inside a parenthesized subquery) — the one-frame signals table
    joins them on doc_id exactly like curation.doc_signals."""
    return f"""
WITH q AS (SELECT doc_id, quality FROM ({_oracle_quality_score()})),
l AS (SELECT doc_id, pred_lang FROM ({_oracle_lang_id()})),
r AS (SELECT doc_id, dup_ngram_ratio FROM ({_oracle_repetition_stats()})),
lm AS (SELECT doc_id, n_bigrams, avg_logp, ppl FROM ({_oracle_lm_doc_scores()}))
SELECT q.doc_id, {_r6('q.quality', 'quality')}, l.pred_lang,
       {_r6('r.dup_ngram_ratio', 'dup_ngram_ratio')},
       lm.n_bigrams, {_r6('lm.avg_logp', 'avg_logp')}, {_r6('lm.ppl', 'ppl')}
FROM q JOIN l USING (doc_id)
LEFT JOIN r USING (doc_id) LEFT JOIN lm USING (doc_id)
"""

def _oracle_contamination_pairs() -> str:
    probe_text = (
        f"array_to_string(list_slice({_SQ_TOKS}, 1, {CONTAM_PROBE_TOKENS}), ' ')"
    )
    return f"""
WITH probes AS (SELECT doc_id, {probe_text} AS text
                FROM documents WHERE doc_id % {CONTAM_PROBE_MOD} = 0),
pt AS (SELECT doc_id AS probe_id, {_SQ_TOKS} AS t FROM probes),
png AS (SELECT probe_id, unnest(list_distinct({_sq_shingles('t', CONTAM_N)})) AS ngram FROM pt),
pden AS (SELECT probe_id, count(*) AS n_probe_ngrams FROM png GROUP BY 1),
tt AS (SELECT doc_id AS train_id, {_SQ_TOKS} AS t FROM documents),
tng AS (SELECT train_id, unnest(list_distinct({_sq_shingles('t', CONTAM_N)})) AS ngram FROM tt),
hits AS (SELECT train_id, probe_id, count(*) AS n_common
         FROM tng JOIN png USING (ngram) GROUP BY 1, 2),
j AS (SELECT train_id, probe_id, n_common,
             round(n_common / CAST(n_probe_ngrams AS DOUBLE), 6) + 0.0 AS containment
      FROM hits JOIN pden USING (probe_id))
SELECT train_id, probe_id, n_common, containment
FROM j WHERE containment >= {CONTAM_THRESHOLD}
"""

def _oracle_pii_scrub() -> str:
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.pii import (
        EMAIL_RE,
        IPV4_RE,
        PHONE_RE,
    )

    # the patterns contain regex braces — keep them OUT of f-string bodies
    aug = (
        "SELECT doc_id, concat(text,"
        " CASE WHEN doc_id % 5 = 0 THEN concat(' Contact user', CAST(doc_id AS VARCHAR), '@example.com now.') ELSE '' END,"
        " CASE WHEN doc_id % 7 = 0 THEN ' Call 555-123-4567.' ELSE '' END,"
        " CASE WHEN doc_id % 11 = 0 THEN ' Host 10.0.0.1 up.' ELSE '' END) AS text"
        " FROM documents"
    )
    red = (
        "regexp_replace(regexp_replace(regexp_replace(text, '"
        + EMAIL_RE
        + "', '[EMAIL]', 'g'), '"
        + PHONE_RE
        + "', '[PHONE]', 'g'), '"
        + IPV4_RE
        + "', '[IP]', 'g')"
    )
    n_em = "len(regexp_extract_all(text, '" + EMAIL_RE + "'))"
    n_ph = "len(regexp_extract_all(text, '" + PHONE_RE + "'))"
    n_ip = "len(regexp_extract_all(text, '" + IPV4_RE + "'))"
    return (
        "WITH aug AS (" + aug + ")\n"
        "SELECT doc_id,\n"
        "  CAST(" + n_em + " AS INT) AS n_emails,\n"
        "  CAST(" + n_ph + " AS INT) AS n_phones,\n"
        "  CAST(" + n_ip + " AS INT) AS n_ipv4,\n"
        "  (" + n_em + " + " + n_ph + " + " + n_ip + ") > 0 AS has_pii,\n"
        "  md5(" + red + ") AS redacted_md5\n"
        "FROM aug"
    )

def _oracle_pii_cards() -> str:
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.pii import (
        EMAIL_RE,
        IPV4_RE,
        PHONE_RE,
    )

    card_re = r"\b(?:[0-9]{4}[- ]){3}[0-9]{4}\b|\b[0-9]{16}\b"
    ds = "replace(replace(c, '-', ''), ' ', '')"
    dig = f"CAST(substr({ds}, i, 1) AS BIGINT)"
    luhn = (
        f"list_sum(list_transform(range(1, length({ds}) + 1), "
        f"i -> CASE WHEN (length({ds}) - i) % 2 = 1 "
        f"THEN (2 * {dig}) % 10 + (2 * {dig}) // 10 "
        f"ELSE {dig} END)) % 10 = 0"
    )
    valid = f"list_filter(regexp_extract_all(text, '{card_re}'), c -> {luhn})"
    scrub = (
        f"list_reduce(list_prepend(text, {valid}), "
        f"(acc, c) -> replace(acc, c, '[CARD]'))"
    )
    red = (
        "regexp_replace(regexp_replace(regexp_replace(" + scrub + ", '"
        + EMAIL_RE
        + "', '[EMAIL]', 'g'), '"
        + PHONE_RE
        + "', '[PHONE]', 'g'), '"
        + IPV4_RE
        + "', '[IP]', 'g')"
    )
    return (
        "WITH aug AS (SELECT doc_id, concat(text,"
        " CASE WHEN doc_id % 7 = 0 THEN ' pay 4111-1111-1111-1111 ok' ELSE '' END,"
        " CASE WHEN doc_id % 11 = 0 THEN ' ref 4111111111111112 x' ELSE '' END,"
        " CASE WHEN doc_id % 13 = 0 THEN ' card 5500005555555559 now' ELSE '' END) AS text"
        " FROM documents)\n"
        "SELECT doc_id,\n"
        "  CAST(len(" + valid + ") AS INT) AS n_cards,\n"
        "  md5(" + red + ") AS redacted_md5\n"
        "FROM aug"
    )


_ORACLE_PRICING = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

_ORACLE_REVENUE = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON c_nationkey = n_nationkey AND s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY n_name
"""

_ORACLE_TOP_ORDERS = """
SELECT c_mktsegment, CAST(rank AS INT) AS rank, o_orderkey, o_totalprice FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey) AS rank
  FROM orders JOIN customer ON o_custkey = c_custkey
) WHERE rank <= 3
"""

_ORACLE_CUST_ORDER_STATS = """
WITH per_cust AS (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey)
SELECT coalesce(n_orders, 0) AS n_orders, count(*) AS n_customers
FROM customer LEFT JOIN per_cust ON c_custkey = o_custkey
GROUP BY coalesce(n_orders, 0)
"""

_ORACLE_PARTS_ROLLUP = """
SELECT p_brand, p_type, count(*) AS n_parts, round(avg(p_retailprice), 6) AS avg_price
FROM part GROUP BY ROLLUP (p_brand, p_type)
"""

_ORACLE_SUPPLIER_SHARE = """
WITH rev AS (SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS rev
             FROM lineitem GROUP BY l_suppkey)
SELECT s_suppkey, n_name, round(rev, 2) AS revenue,
       round(rev / sum(rev) OVER (PARTITION BY n_name), 6) AS nation_share
FROM rev JOIN supplier ON l_suppkey = s_suppkey JOIN nation ON s_nationkey = n_nationkey
"""

_ORACLE_CUST_NO_ORDERS = """
SELECT c_custkey, c_mktsegment FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderdate >= '2001-01-01')
"""

_ORACLE_SEGMENT_CHURN = """
SELECT o_custkey FROM orders WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1996-01-01'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'
"""

_ORACLE_ORDER_PRIORITY_CUBE = """
SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""

_ORACLE_PRICE_PERCENTILES = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
       round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
       round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
FROM lineitem GROUP BY l_returnflag
"""

_ORACLE_EVENTS_HOURLY = """
SELECT epoch_ns(ts) // 3600000000000 AS hour_bucket, event_type,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value,
       round(avg(value), 6) AS avg_value
FROM events GROUP BY 1, 2
"""

def _oracle_incremental_near_dup() -> str:
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.contract import (
        NEW_BATCH_MOD,
        NEW_BATCH_OFFSET,
        NEW_BATCH_SUFFIX,
    )

    src = (
        f"(SELECT doc_id, text FROM documents"
        f" UNION ALL"
        f" SELECT doc_id + {NEW_BATCH_OFFSET}, text || '{NEW_BATCH_SUFFIX}'"
        f" FROM documents WHERE doc_id % {NEW_BATCH_MOD} = 0)"
    )
    return f"""
WITH {_sq_tids_ctes_from(src).strip()},
{_SQ_NEAR_DUP_CTES.strip()}
SELECT id_b AS new_id, id_a AS corpus_id, {_r6('jaccard', 'jaccard')}
FROM near_pairs
WHERE id_a < {NEW_BATCH_OFFSET} AND id_b >= {NEW_BATCH_OFFSET}
"""


def _oracle_tfidf_top_terms() -> str:
    toks = r"regexp_split_to_array(trim(lower(text)), '\s+')"
    return f"""
WITH terms AS (SELECT doc_id, unnest({toks}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM terms WHERE term <> '' GROUP BY 1, 2),
dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
s AS (SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
             tf.tf * (ln((1.0 + n_docs) / (1.0 + dfq.df)) + 1.0) AS tfidf
      FROM tf JOIN dfq USING (term) CROSS JOIN n),
r AS (SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY round(tfidf, 6) DESC, tf DESC, term ASC) AS rank
      FROM s)
SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       {_r6('tfidf', 'tfidf')}, CAST(rank AS INT) AS rank
FROM r WHERE rank <= 3
"""


def _oracle_leakage_split() -> str:
    gid = "coalesce(c.canonical_id, d.doc_id)"
    h = f"CAST(concat('0x', substr(md5(concat('split:', CAST({gid} AS VARCHAR))), 1, 15)) AS BIGINT) % 1000000"
    return f"""
WITH RECURSIVE {_SQ_TIDS_CTES.strip()},
{_SQ_NEAR_DUP_CTES.strip()},
edges AS (SELECT id_a AS s, id_b AS d FROM near_pairs
          UNION SELECT id_b, id_a FROM near_pairs),
reach (s, d) AS (SELECT s, d FROM edges
                 UNION SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
comp AS (SELECT s AS doc_id, least(min(d), s) AS canonical_id FROM reach GROUP BY s)
SELECT d.doc_id, CAST({gid} AS BIGINT) AS group_id,
       CASE WHEN {h} < 200000 THEN 'val' ELSE 'train' END AS split
FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
"""


_ORACLE_ROLLING_HOUR = """
SELECT event_id, user_id,
       CAST(count(*) OVER w AS BIGINT) AS n_window,
       round(sum(value) OVER w, 6) + 0.0 AS sum_window
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


_ORACLE_SCD2_HISTORY = """
WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events)
SELECT user_id, event_type, ts_us AS valid_from_us,
       lead(ts_us) OVER w AS valid_to_us,
       lead(ts_us) OVER w IS NULL AS is_current
FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC)
"""


_ORACLE_ITEM_COOCCURRENCE = """
WITH ui AS (SELECT DISTINCT user_id AS u,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
            FROM events
            WHERE json_extract_string(props, '$.k') IS NOT NULL),
c AS (SELECT u, item, row_number() OVER (PARTITION BY u ORDER BY item ASC) AS rn FROM ui),
k AS (SELECT u, item FROM c WHERE rn <= 50)
SELECT a.item AS item_a, b.item AS item_b, CAST(count(*) AS BIGINT) AS n_users
FROM k a JOIN k b ON a.u = b.u AND a.item < b.item
GROUP BY 1, 2 HAVING count(*) >= 2
"""


_ORACLE_VALUE_RANK = """
WITH r AS (SELECT event_id,
                  row_number() OVER (ORDER BY value ASC, event_id ASC) AS rank,
                  count(*) OVER () AS n
           FROM events)
SELECT event_id, CAST(rank AS BIGINT) AS rank,
       round(CASE WHEN n > 1 THEN (rank - 1) / CAST(n - 1 AS DOUBLE) ELSE 0.0 END, 6) + 0.0 AS pct
FROM r
"""


_ORACLE_LARGE_ORDERS = """
WITH q AS (SELECT l_orderkey, sum(l_quantity) AS total_qty
           FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 150.0)
SELECT c_name, o_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_totalprice, round(total_qty, 6) + 0.0 AS total_qty
FROM orders JOIN q ON o_orderkey = q.l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
"""


_ORACLE_IDLE_RICH = """
WITH a AS (SELECT avg(c_acctbal) AS av FROM customer WHERE c_acctbal > 0.0),
g AS (SELECT c.* FROM customer c, a WHERE c.c_acctbal > a.av),
i AS (SELECT * FROM g WHERE NOT EXISTS
        (SELECT 1 FROM orders o WHERE o.o_custkey = g.c_custkey
         AND o.o_orderdate >= DATE '2000-01-01'))
SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_custs,
       round(sum(c_acctbal), 6) + 0.0 AS total_bal
FROM i GROUP BY 1 ORDER BY 1
"""


_ORACLE_ORDERS_AUDIT = """
SELECT 'not_null(o_orderkey)' AS "constraint", 'not_null' AS kind,
       CAST(count(*) FILTER (WHERE o_orderkey IS NULL) AS BIGINT) AS n_violations
FROM orders
UNION ALL
SELECT 'check(totalprice_pos)', 'check',
       CAST(count(*) FILTER (WHERE NOT coalesce(o_totalprice > 0, FALSE)) AS BIGINT)
FROM orders
UNION ALL
SELECT 'unique(o_orderkey)', 'unique', CAST(coalesce(sum(n - 1), 0) AS BIGINT)
FROM (SELECT count(*) AS n FROM orders GROUP BY o_orderkey HAVING count(*) > 1)
UNION ALL
SELECT 'fk(o_custkey)', 'fk', CAST(count(*) AS BIGINT)
FROM orders o
WHERE o_custkey IS NOT NULL
  AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
"""


_ORACLE_RATE_LIMITED = """
WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
w AS (SELECT *, ts_us - ts_us % 86400000000 AS win_start_us FROM e),
r AS (SELECT *, row_number() OVER (
        PARTITION BY user_id, win_start_us ORDER BY ts_us, event_id) AS rn
      FROM w)
SELECT event_id, user_id, ts_us, win_start_us, rn <= 3 AS admitted FROM r
"""


_ORACLE_CDC_SNAPSHOT = """
WITH snap AS (SELECT c_custkey, c_acctbal, c_mktsegment FROM customer),
ch AS (SELECT o_custkey AS c_custkey, o_totalprice AS c_acctbal,
              'UPDATED' AS c_mktsegment,
              CAST(year(o_orderdate) * 10000 + month(o_orderdate) * 100
                   + day(o_orderdate) AS BIGINT) AS ts,
              o_orderkey AS seq,
              CASE WHEN o_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op
       FROM orders),
latest AS (SELECT * FROM (SELECT *, row_number() OVER (
             PARTITION BY c_custkey ORDER BY ts DESC, seq DESC) AS rn FROM ch)
           WHERE rn = 1),
untouched AS (SELECT s.* FROM snap s WHERE NOT EXISTS
                (SELECT 1 FROM latest l WHERE l.c_custkey = s.c_custkey))
SELECT c_custkey, round(c_acctbal, 6) + 0.0 AS c_acctbal, c_mktsegment FROM untouched
UNION ALL
SELECT c_custkey, round(c_acctbal, 6) + 0.0, c_mktsegment FROM latest WHERE op <> 'D'
"""


_ORACLE_PRICE_HISTOGRAM = """
WITH b AS (SELECT CAST(min(l_extendedprice) AS DOUBLE) AS lo,
                  CAST(max(l_extendedprice) AS DOUBLE) AS hi FROM lineitem),
x AS (SELECT CAST(least(floor((CAST(l_extendedprice AS DOUBLE) - lo) / ((hi - lo) / 20.0)), 19) AS INT) AS bin,
             lo, hi
      FROM lineitem, b WHERE l_extendedprice IS NOT NULL)
SELECT bin, round(lo + bin * (hi - lo) / 20.0, 6) + 0.0 AS bin_lo,
       round(lo + (bin + 1) * (hi - lo) / 20.0, 6) + 0.0 AS bin_hi,
       CAST(count(*) AS BIGINT) AS n_rows
FROM x GROUP BY bin, lo, hi ORDER BY bin
"""


_ORACLE_DECAYED_ENGAGEMENT = """
WITH e AS (SELECT event_id, user_id, value, epoch_us(ts) AS us FROM events),
m AS (SELECT *, min(us) OVER (PARTITION BY user_id) AS t0 FROM e),
r AS (SELECT *, (us - t0) / 604800000000.0 AS rel FROM m)
SELECT event_id, user_id,
       round(sum(value * pow(2.0, rel)) OVER (
               PARTITION BY user_id ORDER BY us ASC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             * pow(2.0, -rel), 6) + 0.0 AS decayed_sum
FROM r
"""


_ORACLE_WINSORIZED_PRICE = """
WITH b AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x FROM lineitem
           WHERE l_extendedprice IS NOT NULL),
r AS (SELECT x, row_number() OVER (ORDER BY x ASC) AS rn, count(*) OVER () AS n FROM b),
p AS (SELECT x, CASE WHEN n > 1 THEN (rn - 1) / CAST(n - 1 AS DOUBLE) ELSE 0.0 END AS pct FROM r),
c AS (SELECT min(CASE WHEN pct >= 0.01 THEN x END) AS lo,
             max(CASE WHEN pct <= 0.99 THEN x END) AS hi,
             CAST(count(*) AS BIGINT) AS n
      FROM p)
SELECT c.n AS n_rows, round(c.lo, 6) + 0.0 AS lo_cut, round(c.hi, 6) + 0.0 AS hi_cut,
       round(avg(least(greatest(p.x, c.lo), c.hi)), 6) + 0.0 AS winsorized_avg
FROM p, c GROUP BY c.n, c.lo, c.hi
"""


_ORACLE_SPEND_DECILES = """
WITH b AS (SELECT CAST(o_totalprice AS DOUBLE) AS x FROM orders
           WHERE o_totalprice IS NOT NULL),
r AS (SELECT x, row_number() OVER (ORDER BY x ASC) AS rn, count(*) OVER () AS n FROM b),
p AS (SELECT x, CASE WHEN n > 1 THEN (rn - 1) / CAST(n - 1 AS DOUBLE) ELSE 0.0 END AS pct FROM r),
x AS (SELECT CAST(least(floor(pct * 10), 9) AS INT) AS bin, x AS v FROM p)
SELECT bin, CAST(count(*) AS BIGINT) AS n_rows,
       round(min(v), 6) + 0.0 AS lo, round(max(v), 6) + 0.0 AS hi
FROM x GROUP BY bin ORDER BY bin
"""


_ORACLE_MONTHLY_GROWTH = """
WITH rev AS (SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
                    sum(l_extendedprice * (1 - l_discount)) AS r
             FROM lineitem GROUP BY 1)
SELECT ship_month, round(r, 6) + 0.0 AS revenue,
       round((r - lag(r) OVER (ORDER BY ship_month))
             / lag(r) OVER (ORDER BY ship_month) * 100.0, 6) + 0.0 AS mom_growth_pct
FROM rev ORDER BY ship_month
"""


_ORACLE_COHORT_MATRIX = """
WITH f AS (SELECT user_id, strftime(min(ts), '%Y-%m-%d') AS cm FROM events GROUP BY 1),
a AS (SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS am FROM events)
SELECT cm AS cohort_period,
       CAST(date_diff('day', CAST(cm AS DATE), CAST(am AS DATE)) AS INT) AS period_offset,
       CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
FROM a JOIN f USING (user_id) GROUP BY 1, 2 ORDER BY 1, 2
"""


def _oracle_lineitem_correlations() -> str:
    """Six pairwise Pearson correlations, generated from the pair list
    (one template, no hand-expanded copies) with the same constant-
    side NULL guard as operators.profiling.column_correlations."""
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    parts = []
    for a, b in pairs:
        both = f"({a} IS NOT NULL AND {b} IS NOT NULL)"
        xa, xb = f"CAST({a} AS DOUBLE)", f"CAST({b} AS DOUBLE)"
        parts.append(f"""SELECT col_a, col_b, n,
       round(CASE WHEN va > 0 AND vb > 0 THEN cov / sqrt(va * vb) END, 6) + 0.0 AS corr
FROM (SELECT '{a}' AS col_a, '{b}' AS col_b,
             CAST(count(CASE WHEN {both} THEN 1 END) AS BIGINT) AS n,
             sum(CASE WHEN {both} THEN {xa} * {xb} END)
               - sum(CASE WHEN {both} THEN {xa} END)
                 * sum(CASE WHEN {both} THEN {xb} END)
                 / count(CASE WHEN {both} THEN 1 END) AS cov,
             sum(CASE WHEN {both} THEN {xa} * {xa} END)
               - sum(CASE WHEN {both} THEN {xa} END)
                 * sum(CASE WHEN {both} THEN {xa} END)
                 / count(CASE WHEN {both} THEN 1 END) AS va,
             sum(CASE WHEN {both} THEN {xb} * {xb} END)
               - sum(CASE WHEN {both} THEN {xb} END)
                 * sum(CASE WHEN {both} THEN {xb} END)
                 / count(CASE WHEN {both} THEN 1 END) AS vb
      FROM lineitem)""")
    return "\nUNION ALL\n".join(parts)


_ORACLE_VALUE_BARS = """
WITH e AS (SELECT event_id, value, epoch_us(ts) AS us FROM events),
w AS (SELECT *, us - us % 3600000000 AS bar FROM e),
r AS (SELECT *, row_number() OVER (PARTITION BY bar ORDER BY us, event_id) AS rf,
             row_number() OVER (PARTITION BY bar ORDER BY us DESC, event_id DESC) AS rl
      FROM w)
SELECT bar AS bar_start_us,
       round(max(CASE WHEN rf = 1 THEN value END), 6) + 0.0 AS open,
       round(max(value), 6) + 0.0 AS high,
       round(min(value), 6) + 0.0 AS low,
       round(max(CASE WHEN rl = 1 THEN value END), 6) + 0.0 AS close,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 6) + 0.0 AS volume
FROM r GROUP BY bar
"""


_ORACLE_CUSTOMER_DIFF = """
WITH old AS (SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer),
new AS (
  SELECT c_custkey,
         c_name,
         CASE WHEN c_custkey % 13 = 0 THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal,
         c_mktsegment
  FROM old WHERE c_custkey % 97 <> 0
  UNION ALL
  SELECT c_custkey + 100000, c_name, c_acctbal, c_mktsegment
  FROM old WHERE c_custkey % 101 = 0
),
j AS (SELECT o.c_custkey AS ok, n.c_custkey AS nk,
             o.c_name AS on_, n.c_name AS nn,
             o.c_acctbal AS oa, n.c_acctbal AS na,
             o.c_mktsegment AS om, n.c_mktsegment AS nm
      FROM old o FULL OUTER JOIN new n ON o.c_custkey = n.c_custkey)
SELECT coalesce(ok, nk) AS c_custkey,
       CASE WHEN ok IS NULL THEN 'added'
            WHEN nk IS NULL THEN 'removed'
            WHEN (on_ IS DISTINCT FROM nn) OR (oa IS DISTINCT FROM na)
                 OR (om IS DISTINCT FROM nm) THEN 'changed'
            ELSE 'unchanged' END AS status,
       CASE WHEN ok IS NULL OR nk IS NULL THEN ''
            ELSE concat_ws(',',
                   CASE WHEN on_ IS DISTINCT FROM nn THEN 'c_name' END,
                   CASE WHEN oa IS DISTINCT FROM na THEN 'c_acctbal' END,
                   CASE WHEN om IS DISTINCT FROM nm THEN 'c_mktsegment' END)
       END AS changed_cols
FROM j
"""


_ORACLE_EVENT_TRANSITIONS = """
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events),
p AS (SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY us ASC, event_id ASC) AS to_type
      FROM e),
c AS (SELECT from_type, to_type, count(*) AS n FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2)
SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
       round(n / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE), 6) + 0.0 AS prob
FROM c
"""


_ORACLE_BIGRAM_PMI = f"""
WITH toks AS (SELECT doc_id, list_concat(['<s>'], {_SQ_TOKS}) AS t
              FROM documents WHERE text IS NOT NULL AND trim(text) != ''),
idx AS (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks),
pairs AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2 FROM idx),
b AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY 1, 2),
c1 AS (SELECT w1, sum(c12) AS c1 FROM b GROUP BY 1),
c2 AS (SELECT w2, sum(c12) AS c2 FROM b GROUP BY 1),
n AS (SELECT sum(c12) AS n FROM b)
SELECT w1, w2, CAST(c12 AS BIGINT) AS c12,
       round(ln((c12 * n.n) / (c1.c1 * c2.c2)), 6) + 0.0 AS pmi
FROM b JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN n
WHERE c12 >= 5
"""


_ORACLE_SCRIPT_MIX = """
WITH aug AS (SELECT doc_id,
                    concat(text,
                           CASE WHEN doc_id % 7 = 0 THEN ' привет мир' ELSE '' END,
                           CASE WHEN doc_id % 11 = 0 THEN ' 你好世界' ELSE '' END) AS text
             FROM documents),
m AS (SELECT doc_id,
             length(regexp_replace(text, '\\s', '', 'g')) AS ns,
             length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS lat,
             length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS dig,
             length(text) - length(regexp_replace(text, '[Ѐ-ӿ]', '', 'g')) AS cyr,
             length(text) - length(regexp_replace(text, '[一-鿿]', '', 'g')) AS cjk
      FROM aug)
SELECT doc_id, CAST(ns AS BIGINT) AS n_chars,
       round(lat / CAST(greatest(ns, 1) AS DOUBLE), 6) + 0.0 AS latin_ratio,
       round(dig / CAST(greatest(ns, 1) AS DOUBLE), 6) + 0.0 AS digit_ratio,
       round(cyr / CAST(greatest(ns, 1) AS DOUBLE), 6) + 0.0 AS cyrillic_ratio,
       round(cjk / CAST(greatest(ns, 1) AS DOUBLE), 6) + 0.0 AS cjk_ratio,
       round((ns - lat - dig - cyr - cjk) / CAST(greatest(ns, 1) AS DOUBLE), 6) + 0.0 AS other_ratio
FROM m
"""


_ORACLE_REVENUE_GINI = """
WITH b AS (SELECT CAST(o_totalprice AS DOUBLE) AS x FROM orders WHERE o_totalprice IS NOT NULL),
r AS (SELECT x, row_number() OVER (ORDER BY x ASC) AS rank FROM b)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       round(sum(x), 6) + 0.0 AS total,
       round(2.0 * sum(rank * x) / (count(*) * sum(x))
             - (count(*) + 1.0) / count(*), 6) + 0.0 AS gini
FROM r
"""


_ORACLE_NATION_SUPPLIER_HHI = """
WITH j AS (SELECT n_name, l_suppkey,
                  sum(l_extendedprice * (1 - l_discount)) AS v
           FROM lineitem
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
           GROUP BY 1, 2),
t AS (SELECT n_name, sum(v) AS tv FROM j GROUP BY 1)
SELECT j.n_name, CAST(count(*) AS BIGINT) AS n_entities,
       round(sum((j.v / t.tv) * (j.v / t.tv)), 6) + 0.0 AS hhi
FROM j JOIN t USING (n_name) GROUP BY j.n_name
"""


_ORACLE_CONVERSION_LATENCY = """
WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events),
w AS (SELECT *, max(CASE WHEN event_type = 'view' THEN us END) OVER (
         PARTITION BY user_id ORDER BY us ASC, event_id ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lf
      FROM e)
SELECT event_id, user_id,
       round((us - lf) / 1000000.0, 6) + 0.0 AS latency_sec
FROM w WHERE event_type = 'purchase'
"""


_ORACLE_SEGMENT_TARGET_ENC = """
WITH g AS (SELECT sum(c_acctbal) / count(c_acctbal) AS mu FROM customer),
pc AS (SELECT c_mktsegment, sum(c_acctbal) AS sy, count(c_acctbal) AS ny
       FROM customer GROUP BY 1)
SELECT c.c_custkey,
       round((pc.sy - coalesce(c.c_acctbal, 0)
              + 10.0 * g.mu)
             / (pc.ny - CASE WHEN c.c_acctbal IS NOT NULL THEN 1 ELSE 0 END
                + 10.0), 6) + 0.0 AS te
FROM customer c JOIN pc USING (c_mktsegment) CROSS JOIN g
"""


_ORACLE_PRICE_PSI = """
WITH refd AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x FROM lineitem
              WHERE l_shipdate < TIMESTAMP '1998-01-01' AND l_extendedprice IS NOT NULL),
curd AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_extendedprice IS NOT NULL),
b AS (SELECT min(x) AS lo, max(x) AS hi FROM refd),
rb AS (SELECT CASE WHEN hi > lo THEN CAST(greatest(least(floor((x - lo) / ((hi - lo) / 10.0)), 9), 0) AS INT) ELSE 0 END AS bin FROM refd, b),
cb AS (SELECT CASE WHEN hi > lo THEN CAST(greatest(least(floor((x - lo) / ((hi - lo) / 10.0)), 9), 0) AS INT) ELSE 0 END AS bin FROM curd, b),
rc AS (SELECT bin, count(*) AS nr FROM rb GROUP BY 1),
cc AS (SELECT bin, count(*) AS nc FROM cb GROUP BY 1),
rt AS (SELECT count(*) AS tr FROM refd),
ct AS (SELECT count(*) AS tc FROM curd),
bins AS (SELECT CAST(unnest(range(0, 10)) AS INT) AS bin),
t AS (SELECT bins.bin,
             coalesce(rc.nr, 0) / CAST(rt.tr AS DOUBLE) + 1e-6 AS p_ref,
             coalesce(cc.nc, 0) / CAST(ct.tc AS DOUBLE) + 1e-6 AS p_cur
      FROM bins LEFT JOIN rc USING (bin) LEFT JOIN cc USING (bin)
      CROSS JOIN rt CROSS JOIN ct),
w AS (SELECT bin, p_ref, p_cur, (p_cur - p_ref) * ln(p_cur / p_ref) AS psi_term FROM t)
SELECT bin, round(p_ref, 6) + 0.0 AS p_ref, round(p_cur, 6) + 0.0 AS p_cur,
       round(psi_term, 6) + 0.0 AS psi_term
FROM w
UNION ALL
SELECT -1, NULL, NULL, round((SELECT sum(psi_term) FROM w), 6) + 0.0
"""


_ORACLE_SESSION_PATHS = """
WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events),
l AS (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev FROM e),
f AS (SELECT *, CASE WHEN prev IS NULL OR (us - prev) / 1000000 > 30 * 60 THEN 1 ELSE 0 END AS brk FROM l),
s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM f),
p AS (SELECT array_to_string(list_slice(list(event_type ORDER BY us, event_id), 1, 5), '>') AS path
      FROM s GROUP BY user_id, sid)
SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
FROM p GROUP BY path ORDER BY n_sessions DESC, path ASC LIMIT 20
"""


_ORACLE_FUZZY_TITLES = """
WITH base AS (SELECT doc_id, substr(text, 1, 12) AS name FROM documents
              UNION ALL
              SELECT doc_id + 1000000,
                     concat(substr(text, 1, 4), 'z', substr(text, 6, 7))
              FROM documents WHERE doc_id % 5 = 0),
k AS (SELECT doc_id, name, lower(substr(name, 1, 3)) AS pfx FROM base)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(levenshtein(a.name, b.name) AS INT) AS dist
FROM k a JOIN k b ON a.pfx = b.pfx AND a.doc_id < b.doc_id
WHERE levenshtein(a.name, b.name) <= 2
"""


_ORACLE_DAU_WAU = """
WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
days AS (SELECT DISTINCT day FROM ud),
wau AS (SELECT d.day, count(DISTINCT u.user_id) AS wau
        FROM days d JOIN ud u
          ON u.day <= d.day AND u.day >= d.day - INTERVAL 6 DAY
        GROUP BY d.day),
dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM ud GROUP BY day)
SELECT strftime(dau.day, '%Y-%m-%d') AS day,
       CAST(dau.dau AS BIGINT) AS dau, CAST(wau.wau AS BIGINT) AS wau,
       round(dau.dau / CAST(wau.wau AS DOUBLE), 6) + 0.0 AS stickiness
FROM dau JOIN wau USING (day) ORDER BY day
"""


_ORACLE_RFM_SCORES = """
WITH pc AS (SELECT o_custkey,
                   date_diff('day', CAST(max(o_orderdate) AS DATE), DATE '2001-09-01') AS rec_days,
                   count(*) AS freq, sum(o_totalprice) AS monetary
            FROM orders GROUP BY 1),
n AS (SELECT count(*) AS n FROM pc),
r AS (SELECT pc.*,
             row_number() OVER (ORDER BY rec_days ASC, o_custkey ASC) AS rr,
             row_number() OVER (ORDER BY freq ASC, o_custkey ASC) AS rf,
             row_number() OVER (ORDER BY monetary ASC, o_custkey ASC) AS rm,
             n.n FROM pc CROSS JOIN n),
s AS (SELECT *,
        CASE WHEN n > 1 THEN (rr - 1) / CAST(n - 1 AS DOUBLE) ELSE 0.0 END AS pr,
        CASE WHEN n > 1 THEN (rf - 1) / CAST(n - 1 AS DOUBLE) ELSE 0.0 END AS pf,
        CASE WHEN n > 1 THEN (rm - 1) / CAST(n - 1 AS DOUBLE) ELSE 0.0 END AS pm
      FROM r)
SELECT o_custkey, CAST(rec_days AS INT) AS rec_days, CAST(freq AS BIGINT) AS freq,
       round(monetary, 6) + 0.0 AS monetary,
       CAST(6 - (least(floor(pr * 5), 4) + 1) AS INT) AS r_score,
       CAST(least(floor(pf * 5), 4) + 1 AS INT) AS f_score,
       CAST(least(floor(pm * 5), 4) + 1 AS INT) AS m_score
FROM s
"""


_ORACLE_VALUE_LIFT = """
WITH b AS (SELECT event_id, value AS s,
                  CAST(event_type = 'purchase' AS DOUBLE) AS y
           FROM events WHERE event_type IS NOT NULL),
r AS (SELECT *, row_number() OVER (ORDER BY s DESC, event_id ASC) AS rn,
             count(*) OVER () AS n FROM b),
p AS (SELECT y, CASE WHEN n > 1 THEN (rn - 1) / CAST(n - 1 AS DOUBLE) ELSE 0.0 END AS pct FROM r),
x AS (SELECT CAST(least(floor(pct * 10), 9) AS INT) AS bin, y FROM p),
pb AS (SELECT bin, count(*) AS n_rows, sum(y) AS sy FROM x GROUP BY 1),
t AS (SELECT sum(n_rows) AS tn, sum(sy) AS ty FROM pb)
SELECT bin, CAST(n_rows AS BIGINT) AS n_rows,
       round(sy / n_rows, 6) + 0.0 AS avg_label,
       round((sy / n_rows) / (t.ty / t.tn), 6) + 0.0 AS lift,
       round(sum(sy) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             / t.ty, 6) + 0.0 AS cum_capture
FROM pb, t ORDER BY bin
"""


_ORACLE_MIN_COST_SUPPLIER = """
WITH ps AS (SELECT l_partkey, l_suppkey,
                   round(min(l_extendedprice / l_quantity), 6) AS supply_cost
            FROM lineitem WHERE l_quantity > 0 GROUP BY 1, 2),
dim AS (SELECT s_suppkey, s_name, s_acctbal, n_name FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'),
scoped AS (SELECT ps.*, dim.s_name, dim.s_acctbal, dim.n_name, p.p_brand, p.p_partkey
           FROM ps JOIN dim ON ps.l_suppkey = dim.s_suppkey
           JOIN (SELECT p_partkey, p_brand FROM part WHERE p_size <= 15) p
             ON ps.l_partkey = p.p_partkey),
m AS (SELECT *, min(supply_cost) OVER (PARTITION BY p_partkey) AS mc FROM scoped)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
       round(supply_cost, 6) + 0.0 AS supply_cost
FROM m WHERE supply_cost = mc
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
"""


_ORACLE_UNSHIPPED_ORDERS = """
WITH g AS (SELECT l_orderkey, o_orderdate, o_orderpriority,
                  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
           FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey AND c_mktsegment = 'BUILDING'
           WHERE l_shipdate > TIMESTAMP '1998-06-01'
             AND o_orderdate < TIMESTAMP '1998-06-01'
           GROUP BY 1, 2, 3)
SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority, round(revenue, 6) + 0.0 AS revenue
FROM g ORDER BY g.revenue DESC, l_orderkey ASC LIMIT 10
"""


_ORACLE_RETURNED_REVENUE = """
WITH g AS (SELECT c_custkey, c_name, c_acctbal, n_name,
                  round(sum(l_extendedprice * (1 - l_discount)), 2) AS lost_revenue
           FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
            AND o_orderdate >= TIMESTAMP '1999-01-01'
            AND o_orderdate < TIMESTAMP '1999-01-01' + INTERVAL 90 DAY
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           WHERE l_returnflag = 'R'
           GROUP BY 1, 2, 3, 4)
SELECT c_custkey, c_name, c_acctbal, n_name,
       round(lost_revenue, 6) + 0.0 AS lost_revenue
FROM g ORDER BY g.lost_revenue DESC, c_custkey ASC LIMIT 20
"""


_ORACLE_TOP_SUPPLIER = """
WITH rev AS (SELECT l_suppkey,
                    round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
             FROM lineitem
             WHERE l_shipdate >= TIMESTAMP '1999-01-01'
               AND l_shipdate < TIMESTAMP '1999-01-01' + INTERVAL 90 DAY
             GROUP BY 1)
SELECT s_suppkey, s_name, round(total_revenue, 6) + 0.0 AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY s_suppkey
"""


_ORACLE_PART_SUPPLIER_COUNTS = """
WITH links AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM links JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#45'
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 50
"""


_ORACLE_SMALL_QTY_REVENUE = """
WITH scoped AS (SELECT l_partkey, l_quantity, l_extendedprice
                FROM lineitem JOIN part
                  ON l_partkey = p_partkey AND p_brand = 'Brand#23'),
a AS (SELECT l_partkey AS pk, avg(l_quantity) AS aq FROM scoped GROUP BY 1)
SELECT round(round(sum(l_extendedprice) / 7.0, 2), 6) + 0.0 AS avg_yearly
FROM scoped JOIN a ON l_partkey = pk
WHERE l_quantity < 0.5 * aq
"""


_ORACLE_DISJUNCTIVE_REVENUE = """
SELECT round(round(sum(l_extendedprice * (1 - l_discount)), 2), 6) + 0.0 AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


_ORACLE_ORDER_LAGGARDS = """
WITH per_os AS (SELECT l_orderkey, l_suppkey, max(l_shipdate) AS s_last
                FROM lineitem GROUP BY 1, 2),
w1 AS (SELECT *, count(*) OVER (PARTITION BY l_orderkey) AS n_supp,
              max(s_last) OVER (PARTITION BY l_orderkey) AS o_last
       FROM per_os),
w2 AS (SELECT *, sum(CASE WHEN s_last = o_last THEN 1 ELSE 0 END)
                 OVER (PARTITION BY l_orderkey) AS n_last
       FROM w1)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM w2 JOIN supplier ON l_suppkey = s_suppkey
WHERE n_supp >= 2 AND s_last = o_last AND n_last = 1
GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20
"""


_ORACLE_MARKET_SHARE = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(sum(CASE WHEN sn.n_name = 'NATION_3'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) + 0.0 AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'EUROPE'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
GROUP BY 1 ORDER BY 1
"""


_ORACLE_PRODUCT_PROFIT = """
SELECT n_name, CAST(year(l_shipdate) AS BIGINT) AS o_year,
       round(round(sum(l_extendedprice * (1 - l_discount)
                       - 0.5 * p_retailprice * l_quantity), 2), 6) + 0.0 AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY 1, 2 ORDER BY n_name, o_year DESC
"""


_ORACLE_IMPORTANT_PARTS = """
WITH pp AS (SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS v
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_1'
            GROUP BY 1)
SELECT l_partkey, round(round(v, 2), 6) + 0.0 AS part_value
FROM pp WHERE round(v, 2) > round(0.001 * (SELECT sum(v) FROM pp), 2)
ORDER BY round(v, 2) DESC, l_partkey
"""


_ORACLE_LATE_SHIP_PRIORITY = """
WITH j AS (SELECT o_orderpriority,
                  date_diff('day', CAST(o_orderdate AS DATE),
                            CAST(l_shipdate AS DATE)) > 60 AS late
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST(sum(CASE WHEN late AND o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS n_late_urgent,
       round(sum(CASE WHEN late THEN 1.0 ELSE 0.0 END) / count(*), 6) + 0.0 AS late_share
FROM j GROUP BY 1 ORDER BY 1
"""



_ORACLE_COPURCHASE_GRAPH = """
WITH oi AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS item
            FROM lineitem WHERE l_partkey IS NOT NULL),
capped AS (SELECT o, item FROM
             (SELECT o, item, row_number() OVER (PARTITION BY o ORDER BY item) AS rn
              FROM oi) WHERE rn <= 20),
e AS (SELECT a.item AS src, b.item AS dst, count(*) AS weight
      FROM capped a JOIN capped b ON a.o = b.o AND a.item < b.item
      GROUP BY 1, 2 HAVING count(*) >= 2)
SELECT src, dst, CAST(weight AS BIGINT) AS weight FROM e
"""


_ORACLE_INCREMENTAL_ROLLUP = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(round(sum(o_totalprice), 2), 6) + 0.0 AS total_price,
       round(min(o_totalprice), 6) + 0.0 AS min_price,
       round(max(o_totalprice), 6) + 0.0 AS max_price
FROM orders GROUP BY 1
"""


_ORACLE_ASSOC_RULES = """
WITH oi AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS item
            FROM lineitem WHERE l_partkey IS NOT NULL),
capped AS (SELECT o, item FROM
             (SELECT o, item, row_number() OVER (PARTITION BY o ORDER BY item) AS rn
              FROM oi) WHERE rn <= 20),
p AS (SELECT a.item AS src, b.item AS dst, count(*) AS n_co
      FROM capped a JOIN capped b ON a.o = b.o AND a.item < b.item
      GROUP BY 1, 2 HAVING count(*) >= 2),
d AS (SELECT src, dst, n_co FROM p
      UNION ALL SELECT dst AS src, src AS dst, n_co FROM p),
i AS (SELECT item, count(*) AS n FROM capped GROUP BY 1),
t AS (SELECT count(DISTINCT o) AS N FROM capped)
SELECT d.src, d.dst, CAST(d.n_co AS BIGINT) AS n_co,
       round(d.n_co / t.N, 6) + 0.0 AS support,
       round(d.n_co / s.n, 6) + 0.0 AS confidence,
       round((d.n_co / s.n) * t.N / e.n, 6) + 0.0 AS lift
FROM d JOIN i s ON d.src = s.item JOIN i e ON d.dst = e.item, t
"""


_ORACLE_PART_PAGERANK_WEIGHTED = """
WITH oi AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS item
            FROM lineitem WHERE l_partkey IS NOT NULL),
capped AS (SELECT o, item FROM
             (SELECT o, item, row_number() OVER (PARTITION BY o ORDER BY item) AS rn
              FROM oi) WHERE rn <= 20),
e AS (SELECT a.item AS src, b.item AS dst, count(*) AS weight
      FROM capped a JOIN capped b ON a.o = b.o AND a.item < b.item
      GROUP BY 1, 2 HAVING count(*) >= 2),
em AS (SELECT src, dst, CAST(weight AS DOUBLE) AS w FROM e
       UNION ALL SELECT dst AS src, src AS dst, CAST(weight AS DOUBLE) AS w FROM e),
deg AS (SELECT src, sum(w) AS dg FROM em GROUP BY 1),
nn AS (SELECT count(*) AS n FROM deg),
r0 AS (SELECT src AS node, 1.0 / nn.n AS r FROM deg CROSS JOIN nn),
c1 AS (SELECT em.dst AS node, sum(r0.r * em.w / deg.dg) AS s
        FROM r0 JOIN em ON r0.node = em.src
        JOIN deg ON em.src = deg.src GROUP BY 1),
r1 AS (SELECT deg.src AS node,
               (1 - 0.85) / nn.n + 0.85 * coalesce(c1.s, 0.0) AS r
        FROM deg CROSS JOIN nn LEFT JOIN c1 ON deg.src = c1.node),
c2 AS (SELECT em.dst AS node, sum(r1.r * em.w / deg.dg) AS s
        FROM r1 JOIN em ON r1.node = em.src
        JOIN deg ON em.src = deg.src GROUP BY 1),
r2 AS (SELECT deg.src AS node,
               (1 - 0.85) / nn.n + 0.85 * coalesce(c2.s, 0.0) AS r
        FROM deg CROSS JOIN nn LEFT JOIN c2 ON deg.src = c2.node),
c3 AS (SELECT em.dst AS node, sum(r2.r * em.w / deg.dg) AS s
        FROM r2 JOIN em ON r2.node = em.src
        JOIN deg ON em.src = deg.src GROUP BY 1),
r3 AS (SELECT deg.src AS node,
               (1 - 0.85) / nn.n + 0.85 * coalesce(c3.s, 0.0) AS r
        FROM deg CROSS JOIN nn LEFT JOIN c3 ON deg.src = c3.node)
SELECT node, round(r, 6) + 0.0 AS rank FROM r3
"""


_ORACLE_PART_COMPONENTS = """
WITH RECURSIVE oi AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS item
            FROM lineitem WHERE l_partkey IS NOT NULL),
capped AS (SELECT o, item FROM
             (SELECT o, item, row_number() OVER (PARTITION BY o ORDER BY item) AS rn
              FROM oi) WHERE rn <= 20),
e AS (SELECT a.item AS src, b.item AS dst, count(*) AS weight
      FROM capped a JOIN capped b ON a.o = b.o AND a.item < b.item
      GROUP BY 1, 2 HAVING count(*) >= 2),
edges AS (SELECT src AS s, dst AS d FROM e UNION SELECT dst, src FROM e),
reach (s, d) AS (SELECT s, d FROM edges
                 UNION SELECT r.s, x.d FROM reach r JOIN edges x ON r.d = x.s)
SELECT s AS node, least(min(d), s) AS component FROM reach GROUP BY s
"""


_ORACLE_PART_DEGREES = """
WITH oi AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS item
            FROM lineitem WHERE l_partkey IS NOT NULL),
capped AS (SELECT o, item FROM
             (SELECT o, item, row_number() OVER (PARTITION BY o ORDER BY item) AS rn
              FROM oi) WHERE rn <= 20),
e AS (SELECT a.item AS src, b.item AS dst, count(*) AS weight
      FROM capped a JOIN capped b ON a.o = b.o AND a.item < b.item
      GROUP BY 1, 2 HAVING count(*) >= 2),
deg AS (SELECT node, count(*) AS degree FROM
          (SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e)
        GROUP BY 1)
SELECT CAST(degree AS BIGINT) AS degree, CAST(count(*) AS BIGINT) AS n_nodes
FROM deg GROUP BY 1 ORDER BY 1
"""


_ORACLE_TRIANGLE_COUNT = """
WITH oi AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS item
            FROM lineitem WHERE l_partkey IS NOT NULL),
capped AS (SELECT o, item FROM
             (SELECT o, item, row_number() OVER (PARTITION BY o ORDER BY item) AS rn
              FROM oi) WHERE rn <= 20),
e AS (SELECT a.item AS src, b.item AS dst, count(*) AS weight
      FROM capped a JOIN capped b ON a.o = b.o AND a.item < b.item
      GROUP BY 1, 2 HAVING count(*) >= 2)
SELECT CAST(count(*) AS BIGINT) AS n_triangles
FROM e ab JOIN e bc ON ab.dst = bc.src
JOIN e ac ON ac.src = ab.src AND ac.dst = bc.dst
"""


_ORACLE_PART_PAGERANK = """
WITH oi AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS item
            FROM lineitem WHERE l_partkey IS NOT NULL),
capped AS (SELECT o, item FROM
             (SELECT o, item, row_number() OVER (PARTITION BY o ORDER BY item) AS rn
              FROM oi) WHERE rn <= 20),
e AS (SELECT a.item AS src, b.item AS dst, count(*) AS weight
      FROM capped a JOIN capped b ON a.o = b.o AND a.item < b.item
      GROUP BY 1, 2 HAVING count(*) >= 2),
em AS (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e),
deg AS (SELECT src, count(*) AS dg FROM em GROUP BY 1),
nn AS (SELECT count(*) AS n FROM deg),
r0 AS (SELECT src AS node, 1.0 / nn.n AS r FROM deg CROSS JOIN nn),
c1 AS (SELECT em.dst AS node, sum(r0.r / deg.dg) AS s
        FROM r0 JOIN em ON r0.node = em.src
        JOIN deg ON em.src = deg.src GROUP BY 1),
r1 AS (SELECT deg.src AS node,
               (1 - 0.85) / nn.n + 0.85 * coalesce(c1.s, 0.0) AS r
        FROM deg CROSS JOIN nn LEFT JOIN c1 ON deg.src = c1.node),
c2 AS (SELECT em.dst AS node, sum(r1.r / deg.dg) AS s
        FROM r1 JOIN em ON r1.node = em.src
        JOIN deg ON em.src = deg.src GROUP BY 1),
r2 AS (SELECT deg.src AS node,
               (1 - 0.85) / nn.n + 0.85 * coalesce(c2.s, 0.0) AS r
        FROM deg CROSS JOIN nn LEFT JOIN c2 ON deg.src = c2.node),
c3 AS (SELECT em.dst AS node, sum(r2.r / deg.dg) AS s
        FROM r2 JOIN em ON r2.node = em.src
        JOIN deg ON em.src = deg.src GROUP BY 1),
r3 AS (SELECT deg.src AS node,
               (1 - 0.85) / nn.n + 0.85 * coalesce(c3.s, 0.0) AS r
        FROM deg CROSS JOIN nn LEFT JOIN c3 ON deg.src = c3.node)
SELECT node, round(r, 6) + 0.0 AS rank FROM r3
"""



_ORACLE_LEXICAL_DIVERSITY = r"""
WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tk
             FROM documents),
tc AS (SELECT doc_id, tk, count(*) AS c FROM tok GROUP BY 1, 2)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
       round(count(*) / CAST(sum(c) AS DOUBLE), 6) + 0.0 AS ttr,
       round(log2(CAST(sum(c) AS DOUBLE))
             - sum(c * log2(CAST(c AS DOUBLE))) / sum(c), 6) + 0.0 AS entropy
FROM tc GROUP BY 1
"""


_ORACLE_ZIPF_SLOPE = r"""
WITH c AS (SELECT tk, count(*) AS c FROM
             (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tk
              FROM documents)
           GROUP BY 1 ORDER BY c DESC, tk ASC LIMIT 1000),
r AS (SELECT ln(CAST(row_number() OVER (ORDER BY c DESC, tk ASC) AS DOUBLE)) AS lr,
             ln(CAST(c AS DOUBLE)) AS lf FROM c)
SELECT round(regr_slope(lf, lr), 6) + 0.0 AS slope,
       round(regr_intercept(lf, lr), 6) + 0.0 AS intercept,
       CAST(count(*) AS BIGINT) AS n_terms
FROM r
"""


_ORACLE_READABILITY = r"""
WITH p AS (SELECT doc_id,
                  concat(substr(text, 1, 80), '. ', substr(text, 81, 60),
                         '! Is this text readable? Maybe.') AS text
           FROM documents),
m AS (SELECT doc_id,
             greatest(CASE WHEN trim(text) = '' THEN 0
                      ELSE len(regexp_split_to_array(trim(text), '\s+')) END, 1) AS n_words,
             greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sents,
             len(regexp_extract_all(lower(text), '[aeiouy]+')) AS vg
      FROM p)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(n_sents AS BIGINT) AS n_sentences,
       CAST(greatest(vg, n_words) AS BIGINT) AS n_syllables,
       round(206.835 - 1.015 * (n_words / CAST(n_sents AS DOUBLE))
             - 84.6 * (greatest(vg, n_words) / CAST(n_words AS DOUBLE)), 6) + 0.0 AS flesch
FROM m
"""


_ORACLE_DAILY_ANOMALY = """
WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events
               FROM events GROUP BY 1, 2),
st AS (SELECT event_type, avg(n_events) AS mu, stddev_samp(n_events) AS sd
       FROM daily GROUP BY 1)
SELECT daily.event_type, strftime(day, '%Y-%m-%d') AS day,
       CAST(n_events AS BIGINT) AS n_events,
       round((n_events - mu) / nullif(sd, 0), 6) + 0.0 AS z,
       coalesce(abs((n_events - mu) / nullif(sd, 0)) >= 2.0, FALSE) AS is_anomaly
FROM daily JOIN st USING (event_type)
"""


_ORACLE_SIMILAR_SERIES = """
WITH daily AS (SELECT event_type AS key, CAST(ts AS DATE) AS day, count(*) AS n
               FROM events GROUP BY 1, 2),
q AS (SELECT day, n AS qn FROM daily WHERE key = 'click'),
j AS (SELECT daily.key, CAST(daily.n AS DOUBLE) AS x, CAST(q.qn AS DOUBLE) AS y
      FROM daily JOIN q USING (day) WHERE daily.key <> 'click'),
a AS (SELECT key, count(*) AS n_days, sum(x) AS sx, sum(y) AS sy,
             sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy
      FROM j GROUP BY 1),
c AS (SELECT key, n_days,
             (n_days*sxy - sx*sy)
             / nullif(sqrt(n_days*sxx - sx*sx) * sqrt(n_days*syy - sy*sy), 0) AS corr
      FROM a)
SELECT key, CAST(n_days AS BIGINT) AS n_days, round(corr, 6) + 0.0 AS corr
FROM c WHERE n_days >= 3 AND corr IS NOT NULL
ORDER BY corr DESC, key LIMIT 4
"""


_ORACLE_MAD_ANOMALY = """
WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events
               FROM events GROUP BY 1, 2),
med AS (SELECT event_type, quantile_cont(n_events, 0.5) AS med FROM daily GROUP BY 1),
mad AS (SELECT daily.event_type, any_value(med) AS med,
               quantile_cont(abs(n_events - med), 0.5) AS mad
        FROM daily JOIN med USING (event_type) GROUP BY 1)
SELECT daily.event_type, strftime(day, '%Y-%m-%d') AS day,
       CAST(n_events AS BIGINT) AS n_events,
       round(0.6745 * (n_events - med) / nullif(mad, 0), 6) + 0.0 AS mz,
       coalesce(abs(0.6745 * (n_events - med) / nullif(mad, 0)) >= 3.5, FALSE) AS is_anomaly
FROM daily JOIN mad USING (event_type)
"""


def _oracle_negative_samples() -> str:
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.contract import (
        KNN_K,
        KNN_QUERIES,
    )

    h = ("CAST(concat('0x', substr(md5(concat(CAST(qid AS VARCHAR), ':', "
         "CAST(e.vec_id AS VARCHAR))), 1, 15)) AS BIGINT)")
    return f"""
WITH q AS (SELECT vec_id AS qid FROM embeddings WHERE vec_id < {KNN_QUERIES}),
cand AS (SELECT qid, e.vec_id, {h} AS h
         FROM embeddings e, q WHERE e.vec_id <> qid),
ranked AS (SELECT qid, vec_id,
                  CAST(row_number() OVER (PARTITION BY qid ORDER BY h, vec_id) AS INT) AS rank
           FROM cand)
SELECT qid, vec_id, rank FROM ranked WHERE rank <= {KNN_K}
"""


def _oracle_epoch_upsample() -> str:
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.contract import (
        EPOCH_MIX,
    )

    whole = " ".join(
        f"WHEN lang = '{s}' THEN {int(e)}" for s, e in EPOCH_MIX.items()
    )
    frac = " ".join(
        f"WHEN lang = '{s}' THEN {float(e) - int(e)!r}" for s, e in EPOCH_MIX.items()
    )
    u = ("CAST(concat('0x', substr(md5(concat('epoch', ':', "
         "CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) / " + repr(float(1 << 60)))
    return f"""
WITH r AS (SELECT doc_id, lang,
                  (CASE {whole} ELSE 1 END)
                  + (CASE WHEN {u} < (CASE {frac} ELSE 0.0 END) THEN 1 ELSE 0 END) AS rep
           FROM documents)
SELECT doc_id, lang, CAST(u.e AS INT) AS epoch
FROM r, unnest(range(1, rep + 1)) AS u(e)
WHERE rep >= 1
"""


_ORACLE_DOMAIN_PERCENTILE = """
SELECT doc_id, lang,
       round(CAST(n_chars AS DOUBLE), 6) + 0.0 AS score,
       round(percent_rank() OVER (PARTITION BY lang
                                  ORDER BY CAST(n_chars AS DOUBLE), doc_id), 6) + 0.0 AS pctl
FROM documents
"""


_ORACLE_CUMULATIVE_USERS = """
WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS day FROM events GROUP BY 1),
d AS (SELECT day, count(*) AS n_new FROM f GROUP BY 1)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(n_new AS BIGINT) AS n_new,
       CAST(sum(n_new) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_total
FROM d
"""


_ORACLE_WEEKDAY_ANOMALY = """
WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events
               FROM events GROUP BY 1, 2),
d2 AS (SELECT *, dayofweek(day) AS dow FROM daily),
st AS (SELECT event_type, dow, avg(n_events) AS mu, stddev_samp(n_events) AS sd
       FROM d2 GROUP BY 1, 2)
SELECT d2.event_type, strftime(day, '%Y-%m-%d') AS day,
       CAST(n_events AS BIGINT) AS n_events,
       round((n_events - mu) / nullif(sd, 0), 6) + 0.0 AS z,
       coalesce(abs((n_events - mu) / nullif(sd, 0)) >= 2.0, FALSE) AS is_anomaly
FROM d2 JOIN st USING (event_type, dow)
"""


_ORACLE_PROMO_ORDERS = """
WITH m AS (SELECT DISTINCT date_trunc('month', o_orderdate) AS m FROM orders),
promos AS (SELECT strftime(m, '%Y-%m') AS promo_id,
                  date_diff('day', DATE '1970-01-01', CAST(m AS DATE)) + 4 AS lo,
                  date_diff('day', DATE '1970-01-01', CAST(m AS DATE)) + 18 AS hi
           FROM m),
f AS (SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day,
             o_totalprice
      FROM orders)
SELECT promo_id, CAST(count(*) AS BIGINT) AS n_orders,
       round(round(sum(o_totalprice), 2), 6) + 0.0 AS revenue
FROM f JOIN promos ON day >= lo AND day < hi
GROUP BY 1 ORDER BY 1
"""



_ORACLE_KFOLD_ASSIGN = f"""
WITH f AS (SELECT lang, doc_id,
                  CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                  % {KFOLD_K} AS fold
           FROM documents)
SELECT CAST(fold AS BIGINT) AS fold, lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       min(doc_id) AS min_doc, max(doc_id) AS max_doc
FROM f GROUP BY 1, 2
"""


def _oracle_key_skew() -> str:
    return f"""
WITH c AS (SELECT l_suppkey, count(*) AS n_rows FROM lineitem GROUP BY 1),
t AS (SELECT sum(n_rows) AS total, count(*) AS n_keys FROM c)
SELECT l_suppkey, CAST(c.n_rows AS BIGINT) AS n_rows,
       {_r6('c.n_rows / CAST(t.total AS DOUBLE)', 'share')},
       {_r6('c.n_rows / (t.total / CAST(t.n_keys AS DOUBLE))', 'skew_ratio')}
FROM c, t ORDER BY c.n_rows DESC, l_suppkey ASC LIMIT 10
"""


def _oracle_event_funnel() -> str:
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.contract import (
        FUNNEL_STEPS,
    )

    s1, s2, s3 = FUNNEL_STEPS
    return f"""
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
st1 AS (SELECT user_id, min(ts_us) AS stage1_us FROM e
        WHERE event_type = '{s1}' GROUP BY 1),
st2 AS (SELECT e.user_id, min(e.ts_us) AS stage2_us
        FROM e JOIN st1 ON e.user_id = st1.user_id
        WHERE e.event_type = '{s2}' AND e.ts_us > st1.stage1_us GROUP BY 1),
st3 AS (SELECT e.user_id, min(e.ts_us) AS stage3_us
        FROM e JOIN st2 ON e.user_id = st2.user_id
        WHERE e.event_type = '{s3}' AND e.ts_us > st2.stage2_us GROUP BY 1)
SELECT st1.user_id, st1.stage1_us, st2.stage2_us, st3.stage3_us,
       CAST(1 + (st2.stage2_us IS NOT NULL)::INT
              + (st3.stage3_us IS NOT NULL)::INT AS INT) AS n_stages_reached
FROM st1
LEFT JOIN st2 ON st1.user_id = st2.user_id
LEFT JOIN st3 ON st1.user_id = st3.user_id
"""


_ORACLE_SEGMENT_RETENTION = """
SELECT o_custkey FROM orders WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1996-01-01'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'
"""

_ORACLE_MONTHLY_REVENUE = """
SELECT CAST(year(o_orderdate) AS INT) AS yr, CAST(month(o_orderdate) AS INT) AS mon,
       count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
FROM orders GROUP BY 1, 2
"""

_ORACLE_EVENTS_MOVING_AVG = """
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       round(avg(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS moving_avg
FROM events
"""

_ORACLE_STATUS_PIVOT = """
SELECT o_orderpriority,
       count(*) FILTER (o_orderstatus = 'F') AS "F",
       count(*) FILTER (o_orderstatus = 'O') AS "O",
       count(*) FILTER (o_orderstatus = 'P') AS "P"
FROM orders GROUP BY o_orderpriority
"""

_ORACLE_DISTINCT_USERS = """
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""

_ORACLE_USER_GAPS = """
WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
g AS (SELECT user_id, ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS gap
      FROM e),
s AS (SELECT user_id, count(*) + 1 AS n_events,
             quantile_cont(gap, 0.5) AS med, max(gap) AS max_gap_us
      FROM g WHERE gap IS NOT NULL GROUP BY user_id)
SELECT user_id, n_events, round(med, 6) + 0.0 AS median_gap_us, max_gap_us FROM s
"""

_ORACLE_EVENTS_ASOF = """
WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value FROM events),
c AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'click'),
p AS (SELECT user_id, ts_us, value FROM e WHERE event_type = 'purchase')
SELECT c.event_id, c.user_id, c.ts_us, round(p.value, 6) + 0.0 AS value_asof
FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts_us >= p.ts_us
"""

def _oracle_view_click_attrib() -> str:
    win_us = VIEW_CLICK_WINDOW_MIN * 60 * 1_000_000
    return f"""
WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type FROM events),
v AS (SELECT event_id AS view_id, user_id, ts_us AS vts FROM e WHERE event_type = 'view'),
c AS (SELECT event_id AS click_id, user_id, ts_us AS cts FROM e WHERE event_type = 'click')
SELECT user_id, view_id, click_id, cts - vts AS gap_us
FROM v JOIN c USING (user_id)
WHERE cts > vts AND cts <= vts + {win_us}
"""

def _oracle_orders_price_bands() -> str:
    cases = " ".join(
        f"WHEN o_totalprice >= {lo} AND o_totalprice < {hi} THEN '{b}'"
        for lo, hi, b in PRICE_BANDS
    )
    return f"""
SELECT CASE {cases} END AS band, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders GROUP BY 1
"""

#  sum/min/max pinned to BIGINT on both engines (Spark side casts to
#  long too): DuckDB sum(INT) is HUGEINT and min/max(INT) INT32, which
#  value-hash differently even when every value is equal.
_ORACLE_EVENTS_PROPS = """
SELECT event_type,
       count(CAST(json_extract(props, '$.k') AS INT)) AS n_with_k,
       CAST(sum(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       CAST(min(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS min_k,
       CAST(max(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS max_k
FROM events GROUP BY event_type
"""

# each event at hour h is in the two 2h-wide 1h-sliding windows starting
# at h-1 and h — mirrored by unnesting both starts per event
_ORACLE_EVENTS_SLIDING = """
WITH e AS (SELECT epoch_ns(ts) // 3600000000000 AS h, event_type, value FROM events),
x AS (SELECT h - o AS win_start_hr, event_type, value
      FROM e, (SELECT unnest([0, 1]) AS o))
SELECT win_start_hr, event_type, count(*) AS n_events, round(sum(value), 6) AS sum_value
FROM x GROUP BY 1, 2
"""

_ORACLE_EVENTS_SESSIONIZED = f"""
WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events),
g AS (SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
                       OR ts_us - lag(ts_us) OVER w > {SESSION_GAP_MIN * 60 * 1_000_000}
                     THEN 1 ELSE 0 END AS new_sess
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
s AS (SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM g)
SELECT user_id, session_id, count(*) AS n_events,
       min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
       round(sum(value), 6) AS session_value
FROM s GROUP BY user_id, session_id
"""

#: closed sessions only — the batch sessionization minus each user's
#: final (still-open-in-state) session; mirrors streaming.stateful
_ORACLE_EVENTS_SESSIONIZED_STREAM = (
    _ORACLE_EVENTS_SESSIONIZED.rstrip()
    + """
QUALIFY session_id <> max(session_id) OVER (PARTITION BY user_id)
"""
)



# ---------------------------------------------------------------------------
# round 8: sketches, skew join, exact all-pairs, IVM join views, z-order
# ---------------------------------------------------------------------------


def _oracle_hll_distinct() -> str:
    """Bit-identical classic-HLL mirror (operators/sketches.hll_distinct,
    p=8): same md5 60-bit hash, same exact CASE-chain rho, same integer
    register sum; the only floats are one IEEE division (deterministic)
    and the small-range ln (equal to well past 6 dp)."""
    pr, m, w = 8, 256, 52
    mask = (1 << w) - 1
    branches = f"WHEN rest = 0 THEN {w + 1} " + " ".join(
        f"WHEN rest >= {1 << (b - 1)} THEN {w + 1 - b}" for b in range(w, 0, -1)
    )
    num = 0.7213 / (1.0 + 1.079 / m) * m * m
    two_w1 = float(1 << (w + 1))
    raw = f"CAST({num!r} AS DOUBLE) * CAST({two_w1!r} AS DOUBLE) / z_scaled"
    return f"""
WITH h AS (SELECT {_sq_tok_hash("CAST(l_partkey AS VARCHAR)")} AS h FROM lineitem),
b AS (SELECT h >> {w} AS idx, h & {mask} AS rest FROM h),
r AS (SELECT idx, max(CASE {branches} END) AS rho FROM b GROUP BY idx),
s AS (SELECT count(*) AS nonzero, sum(CAST(power(2, {w + 1} - rho) AS BIGINT)) AS zf FROM r),
k AS (SELECT nonzero, zf + ({m} - nonzero) * {1 << (w + 1)} AS z_scaled FROM s),
e AS (SELECT nonzero, z_scaled, {raw} AS raw,
             CASE WHEN ({raw}) <= CAST({2.5 * m!r} AS DOUBLE) AND ({m} - nonzero) > 0
                  THEN CAST({float(m)!r} AS DOUBLE) * ln(CAST({float(m)!r} AS DOUBLE) / ({m} - nonzero))
                  ELSE {raw} END AS est
      FROM k),
x AS (SELECT count(DISTINCT l_partkey) AS exact_distinct FROM lineitem)
SELECT CAST({pr} AS BIGINT) AS p, CAST({m} AS BIGINT) AS m,
       CAST(nonzero AS BIGINT) AS nonzero, CAST(z_scaled AS BIGINT) AS z_scaled,
       {_r6('raw', 'raw_estimate')}, {_r6('est', 'estimate')},
       CAST(exact_distinct AS BIGINT) AS exact_distinct,
       {_r6('abs(est - exact_distinct) / exact_distinct', 'rel_err')}
FROM e, x
"""


def _oracle_frequent_items() -> str:
    """Plain GROUP BY/HAVING ≥ N/k over the deterministic Zipf key —
    legitimate because frequent_items' exact verify makes its OUTPUT
    exact (the Misra-Gries summaries only bound the candidate set)."""
    return f"""
WITH s AS (SELECT CASE WHEN event_id % 2 = 0
                       THEN concat('hot_', CAST(event_id % 3 AS VARCHAR))
                       ELSE concat('cold_', CAST(event_id % 5000 AS VARCHAR)) END AS item
           FROM events),
c AS (SELECT item, count(*) AS n_rows FROM s GROUP BY 1),
t AS (SELECT sum(n_rows) AS n FROM c)
SELECT item, CAST(n_rows AS BIGINT) AS n_rows, {_r6('n_rows / t.n', 'share')}
FROM c, t WHERE n_rows * 10 >= t.n
ORDER BY n_rows DESC, item ASC
"""


_ORACLE_SALTED_JOIN = f"""
SELECT p_brand, CAST(count(*) AS BIGINT) AS n_lines,
       {_r6('round(sum(l_extendedprice * (1 - l_discount)), 2)', 'revenue')}
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand ORDER BY p_brand
"""


def _oracle_prefix_jaccard_pairs() -> str:
    """BRUTE-FORCE all-pairs shingle Jaccard — deliberately not the
    prefix-filtered plan, so a hash match proves the Spark side's
    prefix pruning lossless."""
    sh = _sq_shingles('t', SHINGLE_N)
    return f"""
WITH tt AS (SELECT doc_id, {_SQ_TOKS} AS t FROM documents),
s AS (SELECT doc_id, list_distinct({sh}) AS sh FROM tt),
e AS (SELECT doc_id, unnest(sh) AS tok FROM s),
sz AS (SELECT doc_id, len(sh) AS n FROM s),
i AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS o
      FROM e a JOIN e b ON a.tok = b.tok AND a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT ia AS id_a, ib AS id_b, {_r6('o / (na.n + nb.n - o)', 'jaccard')}
FROM i JOIN sz na ON na.doc_id = i.ia JOIN sz nb ON nb.doc_id = i.ib
WHERE o / (na.n + nb.n - o) >= 0.7
ORDER BY id_a, id_b
"""


_ORACLE_IVM_JOIN_VIEW = f"""
SELECT c_mktsegment, {_r6('round(sum(o_totalprice), 2)', 'revenue')},
       CAST(count(o_orderkey) AS BIGINT) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def _oracle_zorder_stats() -> str:
    """Bit-identical Morton interleave of (l_partkey, l_suppkey) —
    mirrors operators/layout.zorder_value with pure integer shifts."""
    terms = " + ".join(
        f"(((x >> {i}) & 1) * {1 << (2 * i)}) + (((y >> {i}) & 1) * {1 << (2 * i + 1)})"
        for i in range(16)
    )
    return f"""
WITH n AS (SELECT (CAST(l_partkey AS BIGINT) * 33) % 65536 AS x,
                  (CAST(l_suppkey AS BIGINT) * 657) % 65536 AS y FROM lineitem),
z AS (SELECT x, y, {terms} AS z FROM n),
b AS (SELECT z >> 24 AS bucket, x, y FROM z)
SELECT CAST(bucket AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(x) AS BIGINT) AS x_min, CAST(max(x) AS BIGINT) AS x_max,
       CAST(min(y) AS BIGINT) AS y_min, CAST(max(y) AS BIGINT) AS y_max,
       CAST(max(x) - min(x) AS BIGINT) AS x_span,
       CAST(max(y) - min(y) AS BIGINT) AS y_span
FROM b GROUP BY bucket ORDER BY bucket
"""




_ORACLE_PARETO_FRONT = f"""
WITH d AS (SELECT DISTINCT p_retailprice AS price, p_size AS size FROM part)
SELECT {_r6('a.price', 'p_retailprice')}, CAST(a.size AS BIGINT) AS p_size
FROM d a
WHERE NOT EXISTS (SELECT 1 FROM d b
                  WHERE b.price <= a.price AND b.size >= a.size
                    AND (b.price < a.price OR b.size > a.size))
ORDER BY p_retailprice, p_size
"""


_ORACLE_CHANGELOG_COMPACT = f"""
WITH r AS (SELECT user_id, event_id, event_type, value,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
           FROM events)
SELECT CAST(user_id AS BIGINT) AS user_id, CAST(event_id AS BIGINT) AS event_id,
       event_type, {_r6('value', 'value')}
FROM r WHERE rn = 1 AND event_type <> 'error'
ORDER BY user_id
"""


_ORACLE_METRICS_LONG = f"""
WITH m AS (SELECT CAST(year(l_shipdate) AS INT) AS yr,
                  CAST(month(l_shipdate) AS INT) AS mon,
                  sum(l_quantity) AS sum_qty,
                  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
           FROM lineitem GROUP BY 1, 2)
SELECT yr, mon, 'sum_qty' AS metric, {_r6('round(sum_qty, 2)', 'value')} FROM m
UNION ALL
SELECT yr, mon, 'revenue' AS metric, {_r6('round(revenue, 2)', 'value')} FROM m
ORDER BY yr, mon, metric
"""




def _oracle_sql_grouping_sets() -> str:
    """Verbatim portable text (contract.PORTABLE_SQL_GROUPING_SETS)."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.contract import (
        PORTABLE_SQL_GROUPING_SETS,
    )

    return PORTABLE_SQL_GROUPING_SETS


_ORACLE_SEASONAL_DECOMPOSE = f"""
WITH d AS (SELECT CAST(ts AS DATE) AS day, sum(value) AS y FROM events GROUP BY 1),
t AS (SELECT day, y,
             avg(y) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS trend
      FROM d),
dt AS (SELECT day, y, trend, y - trend AS det FROM t),
s AS (SELECT day, y, trend, det,
             avg(det) OVER (PARTITION BY dayofweek(day)) - avg(det) OVER () AS seasonal
      FROM dt)
SELECT strftime(day, '%Y-%m-%d') AS day, {_r6('y', 'y')}, {_r6('trend', 'trend')},
       {_r6('seasonal', 'seasonal')}, {_r6('det - seasonal', 'resid')}
FROM s ORDER BY day
"""


_ORACLE_ATTRIBUTION_LAST_TOUCH = """
WITH e AS (SELECT user_id, epoch_ns(ts) AS tsn, event_id, event_type FROM events),
r AS (SELECT user_id, tsn, event_id, event_type,
             last_value(CASE WHEN event_type <> 'purchase' THEN tsn END IGNORE NULLS)
               OVER w AS touch_ts,
             last_value(CASE WHEN event_type <> 'purchase' THEN event_id END IGNORE NULLS)
               OVER w AS touch_id,
             last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
               OVER w AS touch_type
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY tsn, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
SELECT CAST(event_id AS BIGINT) AS conv_id, CAST(user_id AS BIGINT) AS user,
       CAST(tsn AS BIGINT) AS conv_ts, CAST(touch_id AS BIGINT) AS touch_id,
       touch_type, CAST(tsn - touch_ts AS BIGINT) AS gap_ns
FROM r WHERE event_type = 'purchase'
ORDER BY conv_id
"""




def _oracle_mmr_topk() -> str:
    """The MMR greedy unrolled into k SQL steps (selection state grows
    CTE by CTE) — same pool, same λ, same tie-breaks, same cosine fold
    as the Spark loop."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.contract import (
        MMR_K,
        MMR_LAM,
        MMR_POOL,
    )

    lam, om = MMR_LAM, 1.0 - MMR_LAM
    ctes = [
        f"""q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
cand AS MATERIALIZED (SELECT vec_id AS id, embedding AS v, {_sq_cosine('embedding', 'qv')} AS rel
         FROM embeddings, q ORDER BY rel DESC, vec_id LIMIT {MMR_POOL}),
s1 AS (SELECT id, v, rel, 1 AS rank, {lam!r} * rel AS mmr
       FROM cand ORDER BY rel DESC, id LIMIT 1),
sel1 AS (SELECT id, v FROM s1)"""
    ]
    for t in range(2, MMR_K + 1):
        ctes.append(
            f"""p{t} AS (SELECT c.id, c.v, c.rel, max({_sq_cosine('c.v', 'p.v')}) AS ms
       FROM cand c, sel{t - 1} p WHERE c.id NOT IN (SELECT id FROM sel{t - 1})
       GROUP BY c.id, c.v, c.rel),
s{t} AS (SELECT id, v, rel, {t} AS rank, {lam!r} * rel - {om!r} * ms AS mmr
       FROM p{t} ORDER BY mmr DESC, id LIMIT 1),
sel{t} AS (SELECT id, v FROM sel{t - 1} UNION ALL SELECT id, v FROM s{t})"""
        )
    union = " UNION ALL ".join(
        f"SELECT id, rank, rel, mmr FROM s{t}" for t in range(1, MMR_K + 1)
    )
    return f"""
WITH {','.join(ctes)}
SELECT CAST(id AS BIGINT) AS id, CAST(rank AS INT) AS rank,
       {_r6('rel', 'rel')}, {_r6('mmr', 'mmr')}
FROM ({union}) ORDER BY rank
"""




def _oracle_mmr_knn_join() -> str:
    """Batch MMR unrolled: per-qid pools, per-qid argmax per greedy
    step — same λ, same cosine fold, same tie-breaks as the Spark
    set-level passes."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.contract import (
        KNN_QUERIES,
        MMR_K,
        MMR_LAM,
        MMRJ_POOL,
    )

    lam, om = MMR_LAM, 1.0 - MMR_LAM
    head = f"""qs AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < {KNN_QUERIES}),
sc AS MATERIALIZED (SELECT q.qid, e.vec_id AS id, e.embedding AS v, {_sq_cosine('e.embedding', 'q.qv')} AS rel
       FROM embeddings e, qs q),
pool AS MATERIALIZED (SELECT qid, id, v, rel FROM (
           SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rel DESC, id) AS rn FROM sc)
         WHERE rn <= {MMRJ_POOL}),
s1 AS (SELECT qid, id, v, rel, 1 AS rank, {lam!r} * rel AS mmr FROM (
         SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rel DESC, id) AS rn FROM pool)
       WHERE rn = 1),
sel1 AS (SELECT qid, id, v FROM s1)"""
    steps = []
    for t in range(2, MMR_K + 1):
        steps.append(
            f"""p{t} AS (SELECT c.qid, c.id, c.v, c.rel, max({_sq_cosine('c.v', 'p.v')}) AS ms
       FROM pool c JOIN sel{t - 1} p ON c.qid = p.qid
       WHERE NOT EXISTS (SELECT 1 FROM sel{t - 1} x WHERE x.qid = c.qid AND x.id = c.id)
       GROUP BY c.qid, c.id, c.v, c.rel),
s{t} AS (SELECT qid, id, v, rel, {t} AS rank, mmr FROM (
           SELECT *, {lam!r} * rel - {om!r} * ms AS mmr,
                  row_number() OVER (PARTITION BY qid
                      ORDER BY ({lam!r} * rel - {om!r} * ms) DESC, id) AS rn
           FROM p{t}) WHERE rn = 1),
sel{t} AS (SELECT qid, id, v FROM sel{t - 1} UNION ALL SELECT qid, id, v FROM s{t})"""
        )
    union = " UNION ALL ".join(
        f"SELECT qid, id, rank, rel, mmr FROM s{t}" for t in range(1, MMR_K + 1)
    )
    return f"""
WITH {head},{','.join(steps)}
SELECT CAST(qid AS BIGINT) AS qid, CAST(id AS BIGINT) AS id,
       CAST(rank AS INT) AS rank, {_r6('rel', 'rel')}, {_r6('mmr', 'mmr')}
FROM ({union}) ORDER BY qid, rank
"""




def _oracle_kcenter_select() -> str:
    """Gonzalez greedy unrolled into k SQL steps — same seed, same
    min-L2² fold, same argmax tie-breaks."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.contract import (
        KCENTER_K,
    )

    ctes = [
        """src AS MATERIALIZED (SELECT vec_id AS id, embedding AS v FROM embeddings),
s1 AS (SELECT id, v, 1 AS rank, CAST(NULL AS DOUBLE) AS min_dist FROM src WHERE id = 0),
sel1 AS (SELECT id, v FROM s1)"""
    ]
    for t in range(2, KCENTER_K + 1):
        ctes.append(
            f"""p{t} AS (SELECT c.id, c.v, min({_sq_l2sq('c.v', 'p.v')}) AS d
       FROM src c, sel{t - 1} p WHERE c.id NOT IN (SELECT id FROM sel{t - 1})
       GROUP BY c.id, c.v),
s{t} AS (SELECT id, v, {t} AS rank, d AS min_dist FROM p{t} ORDER BY d DESC, id LIMIT 1),
sel{t} AS (SELECT id, v FROM sel{t - 1} UNION ALL SELECT id, v FROM s{t})"""
        )
    union = " UNION ALL ".join(
        f"SELECT id, rank, min_dist FROM s{t}" for t in range(1, KCENTER_K + 1)
    )
    return f"""
WITH {','.join(ctes)}
SELECT CAST(id AS BIGINT) AS id, CAST(rank AS INT) AS rank,
       {_r6('min_dist', 'min_dist')}
FROM ({union}) ORDER BY rank
"""




_ORACLE_ROBUST_SCALE = f"""
WITH st AS (SELECT l_returnflag AS g,
                   quantile_cont(l_extendedprice, 0.25) AS q1,
                   quantile_cont(l_extendedprice, 0.5) AS med,
                   quantile_cont(l_extendedprice, 0.75) AS q3
            FROM lineitem GROUP BY 1)
SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
       CAST(l_linenumber AS BIGINT) AS l_linenumber, l_returnflag,
       {_r6('(l_extendedprice - med) / nullif(q3 - q1, 0)', 'scaled')}
FROM lineitem JOIN st ON l_returnflag = st.g
ORDER BY l_orderkey, l_linenumber
"""


# ---------------------------------------------------------------------------
# round 9: portable quantile sketch (the third of the sketch trio)
# ---------------------------------------------------------------------------


def _sq_qbucket(v: str, m: int = 7) -> str:
    """Integer-exact quantile-sketch bucket id of BIGINT expr ``v`` —
    the SQL mirror of operators/sketches.qsketch_bucket: bit-length
    CASE chain (no float log), shift-based sub-bucket, sign-mirrored,
    monotone in ``v``."""
    blen = "CASE WHEN u >= 4611686018427387904 THEN 62 " + " ".join(
        f"WHEN u >= {1 << b} THEN {b}" for b in range(61, 0, -1)
    ) + " ELSE 0 END"
    tm = 1 << m
    return f"""
(SELECT CASE WHEN vv = 0 THEN 0
        ELSE (CASE WHEN vv > 0 THEN 1 ELSE -1 END)
             * ((e * {tm})
                + (CASE WHEN e >= {m} THEN (u >> (e - {m}))
                        ELSE (u << ({m} - e)) END - {tm}) + 1) END
 FROM (SELECT ({v}) AS vv, abs({v}) AS u) q0,
      LATERAL (SELECT {blen} AS e) q1)"""


def _sq_qbounds(m: int = 7, scale: int = 100) -> str:
    """SQL fragment decoding ``bucket`` → ``lo_i``/``hi_i`` integer
    bounds (use inside a FROM over a frame with a ``bucket`` column)."""
    tm = 1 << m
    return f"""
      LATERAL (SELECT abs(bucket) - 1 AS c) d0,
      LATERAL (SELECT c >> {m} AS e, (c & {tm - 1}) + {tm} AS base) d1,
      LATERAL (SELECT CASE WHEN e >= {m} THEN base << (e - {m})
                           ELSE base >> ({m} - e) END AS lo_pos,
                      CASE WHEN e >= {m}
                           THEN (base << (e - {m})) + (1 << (e - {m})) - 1
                           ELSE base >> ({m} - e) END AS hi_pos) d2,
      LATERAL (SELECT CASE WHEN bucket = 0 THEN 0
                           WHEN bucket > 0 THEN lo_pos ELSE -hi_pos END AS lo_i,
                      CASE WHEN bucket = 0 THEN 0
                           WHEN bucket > 0 THEN hi_pos ELSE -lo_pos END AS hi_i) d3"""


def _oracle_quantile_sketch() -> str:
    """Bit-identical quantile-sketch state mirror (operators/sketches.
    qsketch over l_extendedprice, m=7, scale=100): same
    floor(x·100 + 0.5) fixed-point step, same bit-length CASE chain,
    same shift sub-bucket — every (bucket, count) row must hash-match."""
    return f"""
WITH v AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v
           FROM lineitem WHERE l_extendedprice IS NOT NULL),
b AS (SELECT {_sq_qbucket('v')} AS bucket FROM v),
c AS (SELECT bucket, count(*) AS n_rows FROM b GROUP BY bucket)
SELECT CAST(bucket AS BIGINT) AS bucket, CAST(n_rows AS BIGINT) AS n_rows,
       {_r6('lo_i / 100.0', 'lo')}, {_r6('hi_i / 100.0', 'hi')}
FROM c, {_sq_qbounds()}
ORDER BY bucket
"""


def _oracle_quantile_estimate() -> str:
    """Quantile estimates read off the sketch state + the exact
    rank-r values for the error report — the same lower-empirical-rank
    rule (r = max(1, ceil(q·N))) on both sides, so bucket picks and
    estimates match exactly, and rel_err ≤ 2^-(m+1) is VERIFIED, not
    assumed."""
    return f"""
WITH v AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v
           FROM lineitem WHERE l_extendedprice IS NOT NULL),
b AS (SELECT {_sq_qbucket('v')} AS bucket FROM v),
c AS (SELECT bucket, count(*) AS n_rows FROM b GROUP BY bucket),
tot AS (SELECT sum(n_rows) AS n FROM c),
cum AS (SELECT bucket, sum(n_rows) OVER (ORDER BY bucket) AS cum FROM c),
qs AS (SELECT CAST(x AS DOUBLE) AS q
       FROM (VALUES (0.25), (0.5), (0.75), (0.9), (0.99)) t(x)),
rk AS (SELECT q, greatest(1, CAST(ceil(q * n) AS BIGINT)) AS rnk FROM qs, tot),
pick AS (SELECT q, rnk, min(bucket) AS bucket
         FROM rk JOIN cum ON cum.cum >= rk.rnk GROUP BY q, rnk),
sv AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM v),
ex AS (SELECT rk.q AS q, sv.v / 100.0 AS exact FROM rk JOIN sv ON sv.rn = rk.rnk)
SELECT pick.q AS q, CAST(rnk AS BIGINT) AS rank, CAST(bucket AS BIGINT) AS bucket,
       {_r6('lo_i / 100.0', 'lo')}, {_r6('hi_i / 100.0', 'hi')},
       {_r6('(lo_i / 100.0 + hi_i / 100.0) / 2.0', 'estimate')},
       {_r6('exact', 'exact')},
       {_r6('abs((lo_i / 100.0 + hi_i / 100.0) / 2.0 - exact) / abs(exact)', 'rel_err')}
FROM pick JOIN ex ON pick.q = ex.q, {_sq_qbounds()}
ORDER BY q
"""


def _oracle_part_communities(iters: int = 4) -> str:
    """Label propagation unrolled round for round (operators/graph.
    label_propagation): same sync update, same (count desc, label asc)
    argmax. Every round's CTE is MATERIALIZED — DuckDB inlines CTEs by
    default and an unrolled iteration re-evaluating the edge frame per
    round goes combinatorial (the batch-MMR mirror lesson)."""
    rounds = []
    for i in range(1, iters + 1):
        rounds.append(f"""l{i} AS MATERIALIZED (
  SELECT node, label FROM (
    SELECT g.s AS node, l.label AS label, count(*) AS cnt
    FROM edges g JOIN l{i - 1} l ON g.d = l.node GROUP BY 1, 2)
  QUALIFY row_number() OVER (PARTITION BY node ORDER BY cnt DESC, label ASC) = 1)""")
    body = ",\n".join(rounds)
    return f"""
WITH oi AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS item
            FROM lineitem WHERE l_partkey IS NOT NULL),
capped AS (SELECT o, item FROM
             (SELECT o, item, row_number() OVER (PARTITION BY o ORDER BY item) AS rn
              FROM oi) WHERE rn <= 20),
e AS (SELECT a.item AS src, b.item AS dst, count(*) AS weight
      FROM capped a JOIN capped b ON a.o = b.o AND a.item < b.item
      GROUP BY 1, 2 HAVING count(*) >= 2),
edges AS MATERIALIZED (SELECT src AS s, dst AS d FROM e
                       UNION ALL SELECT dst, src FROM e),
l0 AS MATERIALIZED (SELECT DISTINCT s AS node, s AS label FROM edges),
{body}
SELECT CAST(node AS BIGINT) AS node, CAST(label AS BIGINT) AS label
FROM l{iters} ORDER BY node
"""


def _oracle_quantile_grouped() -> str:
    """Per-group sketch quantiles (operators/sketches.qsketch_grouped
    over l_extendedprice by l_returnflag): the ungrouped mirror with
    every window/aggregate partitioned by the group key."""
    return f"""
WITH v AS (SELECT l_returnflag AS g,
                  CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v
           FROM lineitem WHERE l_extendedprice IS NOT NULL),
b AS (SELECT g, {_sq_qbucket('v')} AS bucket FROM v),
c AS (SELECT g, bucket, count(*) AS n_rows FROM b GROUP BY g, bucket),
tot AS (SELECT g, sum(n_rows) AS n FROM c GROUP BY g),
cum AS (SELECT g, bucket, sum(n_rows) OVER (PARTITION BY g ORDER BY bucket) AS cum
        FROM c),
qs AS (SELECT CAST(x AS DOUBLE) AS q
       FROM (VALUES (0.5), (0.95), (0.99)) t(x)),
rk AS (SELECT g, q, greatest(1, CAST(ceil(q * n) AS BIGINT)) AS rnk FROM qs, tot),
pick AS (SELECT rk.g AS g, q, rnk, min(bucket) AS bucket
         FROM rk JOIN cum ON cum.g = rk.g AND cum.cum >= rk.rnk
         GROUP BY rk.g, q, rnk)
SELECT g AS l_returnflag, q, CAST(rnk AS BIGINT) AS rank,
       CAST(bucket AS BIGINT) AS bucket,
       {_r6('lo_i / 100.0', 'lo')}, {_r6('hi_i / 100.0', 'hi')},
       {_r6('(lo_i / 100.0 + hi_i / 100.0) / 2.0', 'estimate')}
FROM pick, {_sq_qbounds()}
ORDER BY l_returnflag, q
"""


def _oracle_part_distances(iters: int = 6) -> str:
    """Bellman-Ford unrolled round for round (operators/graph.
    shortest_paths, cost = 1/weight): keep ∪ relax, per-node min —
    the identical single IEEE add per relaxation, so distances are
    bit-equal path for path. MATERIALIZED per round (the iterative-
    oracle rule)."""
    rounds = []
    for i in range(1, iters + 1):
        rounds.append(f"""d{i} AS MATERIALIZED (
  SELECT node, min(dist) AS dist FROM (
    SELECT node, dist FROM d{i - 1}
    UNION ALL
    SELECT g.d AS node, p.dist + g.w AS dist
    FROM d{i - 1} p JOIN edges g ON g.s = p.node) GROUP BY node)""")
    body = ",\n".join(rounds)
    return f"""
WITH oi AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS item
            FROM lineitem WHERE l_partkey IS NOT NULL),
capped AS (SELECT o, item FROM
             (SELECT o, item, row_number() OVER (PARTITION BY o ORDER BY item) AS rn
              FROM oi) WHERE rn <= 20),
e AS (SELECT a.item AS src, b.item AS dst, count(*) AS weight
      FROM capped a JOIN capped b ON a.o = b.o AND a.item < b.item
      GROUP BY 1, 2 HAVING count(*) >= 2),
edges AS MATERIALIZED (
  SELECT src AS s, dst AS d, 1.0 / CAST(weight AS DOUBLE) AS w FROM e
  UNION ALL
  SELECT dst, src, 1.0 / CAST(weight AS DOUBLE) AS w FROM e),
d0 AS MATERIALIZED (SELECT (SELECT min(s) FROM edges) AS node,
                           CAST(0 AS DOUBLE) AS dist),
{body}
SELECT CAST(node AS BIGINT) AS node, {_r6('dist', 'dist')}
FROM d{iters} ORDER BY node
"""


_ORACLE_PRIORITY_SAMPLE = f"""
WITH w AS (SELECT doc_id,
                  CAST(CASE WHEN trim(text) = '' THEN 0
                            ELSE len({_SQ_TOKS}) END AS DOUBLE) AS weight
           FROM documents),
p AS (SELECT doc_id, weight,
             weight * 4294967296.0 /
               CAST(({_sq_tok_hash('CAST(doc_id AS VARCHAR)')} & 4294967295) + 1
                    AS DOUBLE) AS priority
      FROM w WHERE weight > 0),
r AS (SELECT *, row_number() OVER (ORDER BY priority DESC, doc_id ASC) AS rn
      FROM p),
t AS (SELECT coalesce(max(CASE WHEN rn = 51 THEN priority END), 0) AS tau FROM r)
SELECT doc_id, {_r6('weight', 'weight')}, {_r6('priority', 'priority')},
       {_r6('greatest(weight, tau)', 'est_weight')}
FROM r, t WHERE rn <= 50
ORDER BY priority DESC, doc_id ASC
"""


def _oracle_hll_grouped() -> str:
    """Per-group bit-identical HLL mirror (operators/sketches.
    hll_grouped over user_id by event_type, p=8): the hll_distinct
    mirror with every aggregate keyed by the group."""
    pr, m, w = 8, 256, 52
    mask = (1 << w) - 1
    branches = f"WHEN rest = 0 THEN {w + 1} " + " ".join(
        f"WHEN rest >= {1 << (b - 1)} THEN {w + 1 - b}" for b in range(w, 0, -1)
    )
    num = 0.7213 / (1.0 + 1.079 / m) * m * m
    two_w1 = float(1 << (w + 1))
    raw = f"CAST({num!r} AS DOUBLE) * CAST({two_w1!r} AS DOUBLE) / z_scaled"
    return f"""
WITH h AS (SELECT event_type AS g,
                  {_sq_tok_hash("CAST(user_id AS VARCHAR)")} AS h FROM events),
b AS (SELECT g, h >> {w} AS idx, h & {mask} AS rest FROM h),
r AS (SELECT g, idx, max(CASE {branches} END) AS rho FROM b GROUP BY g, idx),
s AS (SELECT g, count(*) AS nonzero,
             sum(CAST(power(2, {w + 1} - rho) AS BIGINT)) AS zf
      FROM r GROUP BY g),
k AS (SELECT g, nonzero, zf + ({m} - nonzero) * {1 << (w + 1)} AS z_scaled FROM s)
SELECT g AS event_type, CAST(nonzero AS BIGINT) AS nonzero,
       CAST(z_scaled AS BIGINT) AS z_scaled,
       {_r6(raw, 'raw_estimate')},
       {_r6(f'''CASE WHEN ({raw}) <= CAST({2.5 * m!r} AS DOUBLE) AND ({m} - nonzero) > 0
                 THEN CAST({float(m)!r} AS DOUBLE) * ln(CAST({float(m)!r} AS DOUBLE) / ({m} - nonzero))
                 ELSE {raw} END''', 'estimate')}
FROM k ORDER BY event_type
"""


def _oracle_cm_frequencies(depth: int = 4, width: int = 8192) -> str:
    """Bit-identical Count-Min mirror (operators/sketches.cm_sketch
    over l_partkey): same per-row salted md5 cells, same per-(r,cell)
    integer sums, same min-over-rows lookup with absent cells = 0."""
    def cell(r, val):
        arg = f"concat('cm{r}:', {val})"
        return f"({_sq_tok_hash(arg)} % {width})"

    upd = " UNION ALL ".join(
        f"SELECT {r} AS r, {cell(r, 'CAST(l_partkey AS VARCHAR)')} AS cell "
        f"FROM lineitem WHERE l_partkey IS NOT NULL"
        for r in range(depth)
    )
    kcell = " UNION ALL ".join(
        f"SELECT k, {r} AS r, {cell(r, 'CAST(k AS VARCHAR)')} AS cell FROM ks"
        for r in range(depth)
    )
    return f"""
WITH sk AS MATERIALIZED (
  SELECT r, cell, count(*) AS n FROM ({upd}) GROUP BY r, cell),
ks AS (SELECT unnest(range(1, 11)) AS k),
kc AS ({kcell}),
est AS (SELECT k, min(coalesce(sk.n, 0)) AS cm_estimate
        FROM kc LEFT JOIN sk ON kc.r = sk.r AND kc.cell = sk.cell
        GROUP BY k),
ex AS (SELECT l_partkey AS k, count(*) AS exact_n FROM lineitem
       WHERE l_partkey BETWEEN 1 AND 10 GROUP BY 1)
SELECT CAST(est.k AS BIGINT) AS l_partkey,
       CAST(coalesce(exact_n, 0) AS BIGINT) AS exact_n,
       CAST(cm_estimate AS BIGINT) AS cm_estimate,
       CAST(cm_estimate - coalesce(exact_n, 0) AS BIGINT) AS overshoot
FROM est LEFT JOIN ex ON est.k = ex.k
ORDER BY l_partkey
"""


def _oracle_kmv_overlap(k: int = 64) -> str:
    """KMV overlap mirror (operators/sketches.kmv_overlap, click vs
    purchase users): bottom-k distinct md5 hashes per side, bottom-k of
    the union, ρ = union-sketch hashes present in BOTH side sketches;
    the same one-division estimates."""
    h = _sq_tok_hash("CAST(user_id AS VARCHAR)")
    two60 = float(1 << 60)
    return f"""
WITH ska AS MATERIALIZED (
  SELECT DISTINCT {h} AS h FROM events WHERE event_type = 'click'
  ORDER BY h LIMIT {k}),
skb AS MATERIALIZED (
  SELECT DISTINCT {h} AS h FROM events WHERE event_type = 'purchase'
  ORDER BY h LIMIT {k}),
uni AS MATERIALIZED (
  SELECT DISTINCT h FROM (SELECT h FROM ska UNION ALL SELECT h FROM skb)
  ORDER BY h LIMIT {k}),
ea AS (SELECT count(*) AS n_a,
              CASE WHEN count(*) < {k} THEN CAST(count(*) AS DOUBLE)
                   ELSE CAST({k - 1} AS DOUBLE) * CAST({two60!r} AS DOUBLE) / max(h)
              END AS est_a FROM ska),
eb AS (SELECT count(*) AS n_b,
              CASE WHEN count(*) < {k} THEN CAST(count(*) AS DOUBLE)
                   ELSE CAST({k - 1} AS DOUBLE) * CAST({two60!r} AS DOUBLE) / max(h)
              END AS est_b FROM skb),
eu AS (SELECT count(*) AS n_union,
              CASE WHEN count(*) < {k} THEN CAST(count(*) AS DOUBLE)
                   ELSE CAST({k - 1} AS DOUBLE) * CAST({two60!r} AS DOUBLE) / max(h)
              END AS est_union FROM uni),
rh AS (SELECT count(*) AS rho FROM uni
       WHERE h IN (SELECT h FROM ska) AND h IN (SELECT h FROM skb)),
ex AS (SELECT count(*) AS exact_intersection FROM
         (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
          INTERSECT
          SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'))
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       {_r6('est_a', 'est_a')}, {_r6('est_b', 'est_b')},
       CAST(n_union AS BIGINT) AS n_union, {_r6('est_union', 'est_union')},
       CAST(rho AS BIGINT) AS rho,
       {_r6(f'''CASE WHEN n_union < {k} THEN CAST(rho AS DOUBLE)
                ELSE rho / CAST({float(k)!r} AS DOUBLE) * est_union END''',
            'est_intersection')},
       CAST(exact_intersection AS BIGINT) AS exact_intersection
FROM ea, eb, eu, rh, ex
"""


def _oracle_cm_join_size(depth: int = 4, width: int = 8192) -> str:
    """CM inner-product join-size mirror (operators/sketches.
    cm_join_size on the events user_id self-join): same salted cells,
    same per-row dot products, min over rows."""
    def cell(r):
        arg = f"concat('cm{r}:', CAST(user_id AS VARCHAR))"
        return f"({_sq_tok_hash(arg)} % {width})"

    upd = " UNION ALL ".join(
        f"SELECT {r} AS r, {cell(r)} AS cell FROM events WHERE user_id IS NOT NULL"
        for r in range(depth)
    )
    return f"""
WITH sk AS MATERIALIZED (
  SELECT r, cell, count(*) AS n FROM ({upd}) GROUP BY r, cell),
dots AS (SELECT r, sum(n * n) AS dot FROM sk GROUP BY r),
est AS (SELECT min(dot) AS estimate FROM dots),
ex AS (SELECT sum(c * c) AS exact_size FROM
         (SELECT count(*) AS c FROM events GROUP BY user_id))
SELECT CAST(estimate AS BIGINT) AS estimate,
       CAST(exact_size AS BIGINT) AS exact_size,
       CAST(estimate - exact_size AS BIGINT) AS overshoot
FROM est, ex
"""


def _oracle_quantile_weighted() -> str:
    """Token-mass length percentile mirror (operators/sketches.
    qsketch_weighted over doc token counts, weight = the count): the
    sketch estimate SQL with per-bucket weight sums and weight-unit
    ranks."""
    return f"""
WITH v AS (SELECT CAST(CASE WHEN trim(text) = '' THEN 0
                            ELSE len({_SQ_TOKS}) END AS BIGINT) AS v
           FROM documents),
vw AS (SELECT v, v AS w FROM v WHERE v > 0),
b AS (SELECT {_sq_qbucket('v')} AS bucket, w FROM vw),
c AS (SELECT bucket, sum(w) AS n_rows FROM b GROUP BY bucket),
tot AS (SELECT sum(n_rows) AS n FROM c),
cum AS (SELECT bucket, sum(n_rows) OVER (ORDER BY bucket) AS cum FROM c),
qs AS (SELECT CAST(x AS DOUBLE) AS q
       FROM (VALUES (0.25), (0.5), (0.9)) t(x)),
rk AS (SELECT q, greatest(1, CAST(ceil(q * n) AS BIGINT)) AS rnk FROM qs, tot),
pick AS (SELECT q, rnk, min(bucket) AS bucket
         FROM rk JOIN cum ON cum.cum >= rk.rnk GROUP BY q, rnk)
SELECT q, CAST(rnk AS BIGINT) AS rank, CAST(bucket AS BIGINT) AS bucket,
       {_r6('lo_i / 1.0', 'lo')}, {_r6('hi_i / 1.0', 'hi')},
       {_r6('(lo_i / 1.0 + hi_i / 1.0) / 2.0', 'estimate')}
FROM pick, {_sq_qbounds(scale=1)}
ORDER BY q
"""


def _oracle_bloom_prune(n_bits: int = 4096, n_hashes: int = 5) -> str:
    """Portable-Bloom mirror (operators/sketches.bloom_build/
    bloom_prune over BUILDING customers → orders): same salted md5 bit
    positions, same bit_or word fold, same all-k-bits probe."""
    def pos(i, val):
        arg = f"concat('bf{i}:', {val})"
        return f"({_sq_tok_hash(arg)} % {n_bits})"

    build = " UNION ALL ".join(
        f"SELECT {pos(i, 'CAST(c_custkey AS VARCHAR)')} AS p FROM dim"
        for i in range(n_hashes)
    )
    probe = " UNION ALL ".join(
        f"SELECT o_orderkey, {pos(i, 'CAST(o_custkey AS VARCHAR)')} AS p FROM orders"
        for i in range(n_hashes)
    )
    return f"""
WITH dim AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
bf AS MATERIALIZED (
  SELECT p >> 5 AS word, bit_or(CAST(1 AS BIGINT) << (p & 31)) AS bits
  FROM ({build}) GROUP BY 1),
pr AS (SELECT o_orderkey, p >> 5 AS w, CAST(1 AS BIGINT) << (p & 31) AS m
       FROM ({probe})),
hits AS (SELECT o_orderkey, count(*) AS k
         FROM pr JOIN bf ON pr.w = bf.word AND (bf.bits & pr.m) = pr.m
         GROUP BY 1),
nb AS (SELECT count(*) AS n_bloom FROM hits WHERE k = {n_hashes}),
ne AS (SELECT count(*) AS n_exact FROM orders
       WHERE o_custkey IN (SELECT c_custkey FROM dim))
SELECT CAST(n_exact AS BIGINT) AS n_exact, CAST(n_bloom AS BIGINT) AS n_bloom,
       CAST(n_bloom - n_exact AS BIGINT) AS false_positives
FROM ne, nb
"""


def _oracle_embedding_drift() -> str:
    """Centroid-drift mirror (operators/profiling.centroid_drift over
    the 90/10 vec_id hash split): per-(label, dim) means via the
    __sqdims pattern, ordered list reassembly, the same ε-guarded
    cosine fold. Means are float sums in engine-specific order —
    agreement to ~1e-12, well inside the repo 6-dp rounding."""
    h = _sq_tok_hash("CAST(vec_id AS VARCHAR)")
    return f"""
WITH e AS (SELECT label, embedding, ({h}) % 10 AS sp FROM embeddings),
dims AS (SELECT unnest(range(1, 65)) AS i),
ra AS (SELECT label, i, avg(CAST(embedding[i] AS DOUBLE)) AS m,
              count(*) AS n
       FROM e, dims WHERE sp < 9 GROUP BY label, i),
rb AS (SELECT label, i, avg(CAST(embedding[i] AS DOUBLE)) AS m,
              count(*) AS n
       FROM e, dims WHERE sp >= 9 GROUP BY label, i),
ca AS (SELECT label, max(n) AS n_ref, list(m ORDER BY i) AS c FROM ra GROUP BY label),
cb AS (SELECT label, max(n) AS n_cur, list(m ORDER BY i) AS c FROM rb GROUP BY label)
SELECT CAST(ca.label AS BIGINT) AS label,
       CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
       {_r6(_sq_cosine('ca.c', 'cb.c'), 'cos_sim')},
       {_r6('1.0 - ' + _sq_cosine('ca.c', 'cb.c'), 'drift')}
FROM ca JOIN cb ON ca.label = cb.label
ORDER BY label
"""


_ORACLE_CUSUM = f"""
WITH daily AS (SELECT event_type AS key, CAST(ts AS DATE) AS day,
                      count(*) AS n_events
               FROM events GROUP BY 1, 2),
st AS (SELECT key, avg(n_events) AS mu,
              CASE WHEN stddev_samp(n_events) = 0 THEN NULL
                   ELSE stddev_samp(n_events) END AS sd
       FROM daily GROUP BY key),
d AS (SELECT daily.key, day, n_events,
             (n_events - mu) / sd AS dev FROM daily JOIN st USING (key)),
p AS (SELECT key, day, n_events,
             sum(dev - 0.25) OVER w AS pu,
             sum(-dev - 0.25) OVER w AS pd
      FROM d WINDOW w AS (PARTITION BY key ORDER BY day
                          ROWS UNBOUNDED PRECEDING)),
s AS (SELECT key, day, n_events,
             pu - least(0.0, min(pu) OVER w) AS s_up,
             pd - least(0.0, min(pd) OVER w) AS s_down
      FROM p WINDOW w AS (PARTITION BY key ORDER BY day
                          ROWS UNBOUNDED PRECEDING))
SELECT key AS event_type, strftime(day, '%Y-%m-%d') AS day,
       CAST(n_events AS BIGINT) AS n_events,
       {_r6('s_up', 's_up')}, {_r6('s_down', 's_down')},
       coalesce(s_up > 3.0 OR s_down > 3.0, false) AS is_change
FROM s ORDER BY event_type, day
"""


def _oracle_vocab_divergence(n_buckets: int = 1024) -> str:
    """JS-divergence mirror (operators/profiling.vocab_divergence over
    the 90/10 doc_id split): same hashed buckets, same 0·ln0 = 0
    guard; the ln sums agree to ~1e-13, far inside 6-dp rounding."""
    h = _sq_tok_hash("CAST(doc_id AS VARCHAR)")
    th = _sq_tok_hash("tok")
    return f"""
WITH sp AS (SELECT doc_id, text, ({h}) % 10 AS s FROM documents),
ta AS (SELECT unnest({_SQ_TOKS}) AS tok FROM sp WHERE s < 9),
tb AS (SELECT unnest({_SQ_TOKS}) AS tok FROM sp WHERE s >= 9),
ba AS (SELECT ({th}) % {n_buckets} AS bucket, count(*) AS na FROM ta GROUP BY 1),
bb AS (SELECT ({th}) % {n_buckets} AS bucket, count(*) AS nb FROM tb GROUP BY 1),
tot AS (SELECT (SELECT sum(na) FROM ba) AS tta, (SELECT sum(nb) FROM bb) AS ttb),
j AS (SELECT coalesce(na, 0) AS na, coalesce(nb, 0) AS nb
      FROM ba FULL JOIN bb USING (bucket)),
terms AS (SELECT na, nb,
                 na / CAST(tta AS DOUBLE) AS p, nb / CAST(ttb AS DOUBLE) AS q
          FROM j, tot)
SELECT CAST((SELECT tta FROM tot) AS BIGINT) AS n_ref_tokens,
       CAST((SELECT ttb FROM tot) AS BIGINT) AS n_cur_tokens,
       {_r6('''(sum(CASE WHEN p > 0 THEN p * ln(p / ((p + q) / 2.0)) ELSE 0.0 END)
         + sum(CASE WHEN q > 0 THEN q * ln(q / ((p + q) / 2.0)) ELSE 0.0 END)) / 2.0''',
            'js_divergence')}
FROM terms
"""


def _oracle_part_ppr(iters: int = 3, damping: float = 0.85) -> str:
    """Personalized-PageRank mirror (operators/graph.
    personalized_pagerank, seeds = two smallest parts): the identical
    rank·w/deg emission and (1−d)·seed + d·Σ update unrolled per
    round, MATERIALIZED (the iterative-oracle rule)."""
    rounds = []
    for i in range(1, iters + 1):
        rounds.append(f"""r{i} AS MATERIALIZED (
  SELECT coalesce(c.node, s.node) AS node,
         {1.0 - damping} * coalesce(s.seed, 0.0)
           + {damping} * coalesce(c.cin, 0.0) AS rank
  FROM (SELECT g.d AS node, sum(r.rank * g.w / dg.deg) AS cin
        FROM r{i - 1} r JOIN edges g ON g.s = r.node
        JOIN deg dg ON dg.s = r.node GROUP BY g.d) c
  FULL JOIN seeds s ON c.node = s.node)""")
    body = ",\n".join(rounds)
    return f"""
WITH oi AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS item
            FROM lineitem WHERE l_partkey IS NOT NULL),
capped AS (SELECT o, item FROM
             (SELECT o, item, row_number() OVER (PARTITION BY o ORDER BY item) AS rn
              FROM oi) WHERE rn <= 20),
e AS (SELECT a.item AS src, b.item AS dst, count(*) AS weight
      FROM capped a JOIN capped b ON a.o = b.o AND a.item < b.item
      GROUP BY 1, 2 HAVING count(*) >= 2),
edges AS MATERIALIZED (
  SELECT src AS s, dst AS d, CAST(weight AS DOUBLE) AS w FROM e
  UNION ALL SELECT dst, src, CAST(weight AS DOUBLE) FROM e),
deg AS MATERIALIZED (SELECT s, sum(w) AS deg FROM edges GROUP BY s),
seeds AS MATERIALIZED (
  SELECT src AS node, 0.5 AS seed FROM
    (SELECT DISTINCT src FROM e ORDER BY src LIMIT 2)),
r0 AS (SELECT node, seed AS rank FROM seeds),
{body}
SELECT CAST(node AS BIGINT) AS node, {_r6('rank', 'score')}
FROM r{iters} ORDER BY round(rank, 6) DESC, node ASC LIMIT 50
"""


def _oracle_hourly_value_p95() -> str:
    """Per-hour sketch-percentile mirror (operators/sketches.
    qsketch_grouped keyed by the time window over events.value)."""
    return f"""
WITH v AS (SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS g,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
           FROM events WHERE value IS NOT NULL),
b AS (SELECT g, {_sq_qbucket('v')} AS bucket FROM v),
c AS (SELECT g, bucket, count(*) AS n_rows FROM b GROUP BY g, bucket),
tot AS (SELECT g, sum(n_rows) AS n FROM c GROUP BY g),
cum AS (SELECT g, bucket, sum(n_rows) OVER (PARTITION BY g ORDER BY bucket) AS cum
        FROM c),
qs AS (SELECT CAST(x AS DOUBLE) AS q FROM (VALUES (0.5), (0.95)) t(x)),
rk AS (SELECT g, q, greatest(1, CAST(ceil(q * n) AS BIGINT)) AS rnk FROM qs, tot),
pick AS (SELECT rk.g AS g, q, rnk, min(bucket) AS bucket
         FROM rk JOIN cum ON cum.g = rk.g AND cum.cum >= rk.rnk
         GROUP BY rk.g, q, rnk)
SELECT g AS hour, q, CAST(rnk AS BIGINT) AS rank,
       CAST(bucket AS BIGINT) AS bucket,
       {_r6('lo_i / 100.0', 'lo')}, {_r6('hi_i / 100.0', 'hi')},
       {_r6('(lo_i / 100.0 + hi_i / 100.0) / 2.0', 'estimate')}
FROM pick, {_sq_qbounds()}
ORDER BY hour, q
"""


def _oracle_bootstrap_value_ci(b: int = 32) -> str:
    """The identical Poisson-bootstrap chain in SQL, generated by the
    same loop as operators/stats.poisson_bootstrap_ci: same md5
    uniforms, same Poisson(1) inverse-CDF cut points (shared literals
    via stats.POISSON1_CDF), same weighted means and percentiles."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.stats import (
        POISSON1_CDF,
    )

    def w_expr(r: int) -> str:
        salted = "sid || '" + f":{r}:0" + "'"
        u = (
            f"(({_sq_tok_hash(salted)}) % 1000000 + 1)"
            " / CAST(1000001 AS DOUBLE)"
        )
        whens = " ".join(
            f"WHEN {u} < CAST({c!r} AS DOUBLE) THEN {k}.0"
            for k, c in enumerate(POISSON1_CDF)
        )
        return f"(CASE {whens} ELSE {len(POISSON1_CDF)}.0 END)"

    wcols = ",\n             ".join(f"{w_expr(r)} AS w{r}" for r in range(b))
    sums = ",\n               ".join(
        f"sum(w{r} * value) AS wv{r}, sum(w{r}) AS ws{r}" for r in range(b)
    )
    means = ", ".join(
        f"wv{r} / (CASE WHEN ws{r} > 0 THEN ws{r} END)" for r in range(b)
    )
    return f"""
WITH base AS (SELECT event_type, value, CAST(event_id AS VARCHAR) AS sid
              FROM events WHERE value IS NOT NULL),
wts AS (SELECT event_type, value,
             {wcols}
        FROM base),
agg AS (SELECT event_type, count(*) AS n, sum(value) AS sv,
               {sums}
        FROM wts GROUP BY 1),
reps AS (SELECT event_type, n, sv / n AS mean,
                unnest([{means}]) AS m
         FROM agg)
SELECT event_type, CAST(n AS BIGINT) AS n, {_r6('mean', 'mean')},
       {_r6('quantile_cont(m, 0.025)', 'lo')},
       {_r6('quantile_cont(m, 0.975)', 'hi')},
       CAST({b} AS INT) AS b
FROM reps GROUP BY event_type, n, mean ORDER BY event_type
"""


def _oracle_bootstrap_lift_ci(b: int = 32) -> str:
    """Lift twin of _oracle_bootstrap_value_ci: same weights, both
    arms resampled per replicate, percentile of mean_a − mean_b."""
    from vector_database_with_gpu_acceleration_for_llm_retrieval_spark.operators.stats import (
        POISSON1_CDF,
    )

    def w_expr(r: int) -> str:
        salted = "sid || '" + f":{r}:0" + "'"
        u = (
            f"(({_sq_tok_hash(salted)}) % 1000000 + 1)"
            " / CAST(1000001 AS DOUBLE)"
        )
        whens = " ".join(
            f"WHEN {u} < CAST({c!r} AS DOUBLE) THEN {k}.0"
            for k, c in enumerate(POISSON1_CDF)
        )
        return f"(CASE {whens} ELSE {len(POISSON1_CDF)}.0 END)"

    wcols = ",\n             ".join(f"{w_expr(r)} AS w{r}" for r in range(b))
    sums = ",\n               ".join(
        f"sum(CASE WHEN is_a THEN w{r} * value ELSE 0.0 END) AS wva{r},"
        f" sum(CASE WHEN is_a THEN w{r} ELSE 0.0 END) AS wa{r},"
        f" sum(CASE WHEN NOT is_a THEN w{r} * value ELSE 0.0 END) AS wvb{r},"
        f" sum(CASE WHEN NOT is_a THEN w{r} ELSE 0.0 END) AS wb{r}"
        for r in range(b)
    )
    lifts = ", ".join(
        f"wva{r} / (CASE WHEN wa{r} > 0 THEN wa{r} END)"
        f" - wvb{r} / (CASE WHEN wb{r} > 0 THEN wb{r} END)"
        for r in range(b)
    )
    return f"""
WITH base AS (SELECT value, CAST(event_id AS VARCHAR) AS sid,
                     (user_id % 2 = 0) AS is_a
              FROM events WHERE value IS NOT NULL),
wts AS (SELECT value, is_a,
             {wcols}
        FROM base),
agg AS (SELECT sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS na,
               sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS nb,
               sum(CASE WHEN is_a THEN value ELSE 0.0 END) AS sva,
               sum(CASE WHEN is_a THEN 0.0 ELSE value END) AS svb,
               {sums}
        FROM wts),
reps AS (SELECT na, nb,
                sva / (CASE WHEN na > 0 THEN na END) AS mean_a,
                svb / (CASE WHEN nb > 0 THEN nb END) AS mean_b,
                unnest([{lifts}]) AS l
         FROM agg)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       {_r6('mean_a', 'mean_a')}, {_r6('mean_b', 'mean_b')},
       {_r6('mean_a - mean_b', 'lift')},
       {_r6('quantile_cont(l, 0.025)', 'lo')},
       {_r6('quantile_cont(l, 0.975)', 'hi')},
       CAST({b} AS INT) AS b
FROM reps GROUP BY na, nb, mean_a, mean_b
"""


def _oracle_survival_cindex(m: int = 5) -> str:
    """Grid-algebra mirror of operators/stats.concordance_index on the
    conversion cohort: same sketch buckets, same dense spine, same
    strictly-later suffix + lower/equal/higher splits — all integer."""
    return f"""
WITH per AS (SELECT user_id, min(ts) AS t0, max(ts) AS t_last,
                    min(CASE WHEN event_type = 'purchase' AND value > 90 THEN ts END) AS t_evt,
                    count(*) AS n_events
             FROM events GROUP BY 1),
dur AS (SELECT epoch_us(coalesce(t_evt, t_last)) - epoch_us(t0) AS t,
               CASE WHEN t_evt IS NOT NULL THEN 1 ELSE 0 END AS ev,
               n_events AS score
        FROM per),
src AS (SELECT {_sq_qbucket('t', m)} AS tb, {_sq_qbucket('score', m)} AS sb, ev
        FROM dur WHERE t > 0),
cell AS (SELECT tb, sb, count(*) AS n, sum(ev) AS de FROM src GROUP BY 1, 2),
spine AS (SELECT a.tb, b.sb FROM (SELECT DISTINCT tb FROM cell) a
          CROSS JOIN (SELECT DISTINCT sb FROM cell) b),
dense AS (SELECT spine.tb, spine.sb, coalesce(cell.n, 0) AS n, coalesce(cell.de, 0) AS de
          FROM spine LEFT JOIN cell ON cell.tb = spine.tb AND cell.sb = spine.sb),
lt AS (SELECT tb, sb, de,
              coalesce(sum(n) OVER (PARTITION BY sb ORDER BY tb
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0) AS later
       FROM dense),
sp AS (SELECT de, later,
              coalesce(sum(later) OVER (PARTITION BY tb ORDER BY sb
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lo,
              coalesce(sum(later) OVER (PARTITION BY tb ORDER BY sb
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0) AS hi
       FROM lt),
agg AS (SELECT CAST(sum(de * lo) AS BIGINT) AS concordant,
               CAST(sum(de * later) AS BIGINT) AS tied,
               CAST(sum(de * hi) AS BIGINT) AS discordant
        FROM sp)
SELECT concordant, tied, discordant,
       CAST(concordant + tied + discordant AS BIGINT) AS n_pairs,
       {_r6('''(CAST(concordant AS DOUBLE) + 0.5 * CAST(tied AS DOUBLE))
          / (CASE WHEN concordant + tied + discordant > 0
                  THEN CAST(concordant + tied + discordant AS DOUBLE) END)''', 'cindex')}
FROM agg
"""


def _oracle_ar_forecast7(p: int = 2, horizon: int = 7) -> str:
    """The identical AR(p) unroll in SQL, generated by the same loops
    as operators/temporal.ar_forecast / ar_fitted (the pacf_daily
    precedent): integer calendar-lag pair sums, the same
    left-associated c_j / Durbin-Levinson / forecast expression
    orders, residual quantile bands."""
    rho = ", ".join(
        f"(CAST(sab{j} AS DOUBLE) - mu * CAST(sa{j} AS DOUBLE)"
        f" - mu * CAST(sb{j} AS DOUBLE) + CAST(nj{j} AS DOUBLE) * mu * mu)"
        f" / (CASE WHEN c0 <> 0 THEN c0 END) AS r{j}"
        for j in range(1, p + 1)
    )
    levels = ["l1 AS (SELECT rr.*, r1 AS p1_1 FROM rr)"]
    for k in range(2, p + 1):
        num_terms = " + ".join(f"p{k - 1}_{j} * r{k - j}" for j in range(1, k))
        den_terms = " + ".join(f"p{k - 1}_{j} * r{j}" for j in range(1, k))
        levels.append(
            f"l{k}a AS (SELECT *, (r{k} - ({num_terms}))"
            f" / (CASE WHEN 1.0 - ({den_terms}) <> 0 THEN 1.0 - ({den_terms}) END)"
            f" AS p{k}_{k} FROM l{k - 1})"
        )
        coeffs = ", ".join(
            f"p{k - 1}_{j} - p{k}_{k} * p{k - 1}_{k - j} AS p{k}_{j}"
            for j in range(1, k)
        )
        levels.append(f"l{k} AS (SELECT *, {coeffs} FROM l{k}a)")
    wide = ", ".join(
        f"max(CASE WHEN lag = {j} THEN {c} END) AS {c}{j}"
        for j in range(1, p + 1)
        for c in ("nj", "sa", "sb", "sab")
    )
    lastv = ", ".join(
        f"max(CASE WHEN rn = {j} THEN y END) AS v{j}" for j in range(1, p + 1)
    )
    # recursive forecasts as chained CTEs (f_h references f_{h-1});
    # deviation of x_{n+i}: known v_{1-i} for i <= 0, forecast for i >= 1
    def dev(i: int) -> str:
        return f"(f{i} - mu)" if i >= 1 else f"(CAST(v{1 - i} AS DOUBLE) - mu)"

    fcs = []
    prev = "m"
    for h in range(1, horizon + 1):
        terms = " + ".join(
            f"p{p}_{j} * {dev(h - j)}" for j in range(1, p + 1)
        )
        fcs.append(f"fc{h} AS (SELECT *, mu + ({terms}) AS f{h} FROM {prev})")
        prev = f"fc{h}"
    fit_joins = " ".join(
        f"JOIN d lag{j} ON lag{j}.day = d.day - to_days({j})"
        for j in range(1, p + 1)
    )
    fit_terms = " + ".join(
        f"m.p{p}_{j} * (CAST(lag{j}.y AS DOUBLE) - m.mu)"
        for j in range(1, p + 1)
    )
    union = " UNION ALL ".join(
        f"SELECT {h} AS h, f{h} AS f FROM {prev}" for h in range(1, horizon + 1)
    )
    levels_sql = ",\n".join(levels)
    fcs_sql = ",\n".join(fcs)
    return f"""
WITH {_SQ_DAILY_CENTS},
base AS (SELECT count(*) AS n, sum(y) AS sy, sum(y * y) AS syy FROM d),
lags AS (SELECT unnest(generate_series(1, {p})) AS lag),
pr AS (SELECT l.lag, a.y AS ya, b.y AS yb
       FROM d a CROSS JOIN lags l
       JOIN d b ON b.day = a.day - to_days(CAST(l.lag AS INT))),
sums AS (SELECT lag, count(*) AS nj, sum(ya) AS sa, sum(yb) AS sb,
                sum(ya * yb) AS sab
         FROM pr GROUP BY 1),
wide AS (SELECT {wide} FROM sums),
one AS (SELECT *, CAST(sy AS DOUBLE) / n AS mu,
               CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n AS c0
        FROM base CROSS JOIN wide),
rr AS (SELECT *, {rho} FROM one),
{levels_sql},
lv AS (SELECT {lastv} FROM
         (SELECT y, row_number() OVER (ORDER BY day DESC) AS rn FROM d)
       WHERE rn <= {p}),
m AS (SELECT * FROM l{p} CROSS JOIN lv),
{fcs_sql},
fit AS (SELECT d.y, m.mu + ({fit_terms}) AS fitted
        FROM d {fit_joins} CROSS JOIN m),
qs AS (SELECT quantile_cont(CAST(y AS DOUBLE) - fitted, 0.1) AS q10,
              quantile_cont(CAST(y AS DOUBLE) - fitted, 0.9) AS q90
       FROM fit),
u AS ({union})
SELECT CAST(h AS INT) AS h, {_r6('f', 'forecast')},
       {_r6('f + q10', 'lo')}, {_r6('f + q90', 'hi')}
FROM u CROSS JOIN qs ORDER BY h
"""


def _oracle_value_p95_sliding(trailing: int = 6) -> str:
    """Trailing-window sketch-percentile mirror (operators/sketches.
    qsketch_sliding_quantiles): dense hour×bucket spine, RANGE-frame
    trailing sum per sketch bucket, same rank rule."""
    return f"""
WITH v AS (SELECT epoch_us(ts) // 3600000000 AS tb,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
           FROM events WHERE value IS NOT NULL),
b AS (SELECT tb, {_sq_qbucket('v')} AS bucket FROM v),
c AS (SELECT tb, bucket, count(*) AS cnt FROM b GROUP BY tb, bucket),
spine AS (SELECT DISTINCT tb FROM c), bks AS (SELECT DISTINCT bucket FROM c),
dense AS (SELECT sk.tb, sk.bucket, coalesce(c.cnt, 0) AS cnt
          FROM (SELECT s.tb, k.bucket FROM spine s CROSS JOIN bks k) sk
          LEFT JOIN c ON c.tb = sk.tb AND c.bucket = sk.bucket),
merged AS (SELECT tb, bucket,
                  sum(cnt) OVER (PARTITION BY bucket ORDER BY tb
                    RANGE BETWEEN {trailing - 1} PRECEDING AND CURRENT ROW) AS n_rows
           FROM dense),
st AS (SELECT * FROM merged WHERE n_rows > 0),
tot AS (SELECT tb, sum(n_rows) AS n FROM st GROUP BY tb),
cum AS (SELECT tb, bucket, sum(n_rows) OVER (PARTITION BY tb ORDER BY bucket) AS cum
        FROM st),
qs AS (SELECT CAST(x AS DOUBLE) AS q FROM (VALUES (0.5), (0.95)) t(x)),
rk AS (SELECT tb, q, greatest(1, CAST(ceil(q * n) AS BIGINT)) AS rnk FROM qs, tot),
pick AS (SELECT rk.tb AS tb, q, rnk, min(bucket) AS bucket
         FROM rk JOIN cum ON cum.tb = rk.tb AND cum.cum >= rk.rnk
         GROUP BY rk.tb, q, rnk)
SELECT CAST(tb AS BIGINT) AS ehour, q, CAST(rnk AS BIGINT) AS rank,
       CAST(bucket AS BIGINT) AS bucket,
       {_r6('lo_i / 100.0', 'lo')}, {_r6('hi_i / 100.0', 'hi')},
       {_r6('(lo_i / 100.0 + hi_i / 100.0) / 2.0', 'estimate')}
FROM pick, {_sq_qbounds()}
ORDER BY ehour, q
"""


def oracle_sql() -> dict[str, str]:
    # every queries() entry has a mirror: the multimodal decode stub was
    # made digest-derived precisely so the full pipeline value-checks.
    return {
        "topk_cosine": _oracle_topk("cosine"),
        "topk_l2": _oracle_topk("l2"),
        "sharded_topk": _oracle_sharded_topk(),
        "shard_pruned_topk": _oracle_shard_pruned_topk(),
        "knn_join": _oracle_knn(),
        "knn_join_expr": _oracle_knn(),
        "knn_join_grouped": _oracle_knn_grouped(),
        "lsh_topk": _oracle_lsh_topk(),
        "lsh_topk_indexed": _oracle_lsh_topk(),
        "lsh_topk_filtered_indexed": _oracle_lsh_topk_filtered(),
        "ivf_topk": _oracle_ivf_topk(),
        "ivf_topk_indexed": _oracle_ivf_topk(),
        "pq_topk": _oracle_pq_topk(),
        "pq_topk_indexed": _oracle_pq_topk(),
        "pq_rerank_topk": _oracle_pq_rerank_topk(),
        "ivfpq_topk": _oracle_ivfpq_topk(),
        "recall_ivfpq": _oracle_recall_ivfpq(),
        "recall_pq": _oracle_recall_pq(),
        "sq_topk": _oracle_sq_topk(),
        "sq_rerank_topk": _oracle_sq_rerank_topk(),
        "recall_sq": _oracle_recall_sq(),
        "recall_lsh": _oracle_recall_lsh(),
        "rp_topk": _oracle_rp_topk(),
        "hot_keys": _oracle_hot_keys(),
        "grep_corpus": _oracle_grep_corpus(),
        "more_like_these": _oracle_more_like_these(),
        "grep_corpus_indexed": _oracle_grep_corpus(),
        "grep_many": _oracle_grep_many(),
        "grep_like": _oracle_grep_like(),
        "recall_rp": _oracle_recall_rp(),
        "rp_knn_join": _oracle_rp_knn_join(),
        "recall_ivf": _oracle_recall_ivf(),
        "recall_lsh_multiprobe": _oracle_recall_lsh_multiprobe(),
        "graph_beam_topk": _oracle_graph_beam_topk(),
        "recall_graph": _oracle_recall_graph(),
        "graph_beam_medoid_topk": _oracle_graph_beam_medoid_topk(),
        "graph_beam_pq_topk": _oracle_graph_beam_pq_topk(),
        "recall_graph_pq": _oracle_recall_graph_pq(),
        "graph_beam_pq_filtered_topk": _oracle_graph_beam_pq_filtered_topk(),
        # provably identical to the in-memory entry (codes/edges exact
        # through parquet) — shares its mirror, the pq_topk_indexed rule
        "graph_pq_topk_indexed": _oracle_graph_beam_pq_topk(),
        "graph_beam_filtered_topk": _oracle_graph_beam_filtered_topk(),
        "recall_graph_filtered": _oracle_recall_graph_filtered(),
        "range_search_cosine": _oracle_range_search_cosine(),
        "range_join_l2": _oracle_range_join_l2(),
        "range_count": _oracle_range_count(),
        "ivf_range_search": _oracle_ivf_range_search(),
        "range_recall_ivf": _oracle_range_recall_ivf(),
        "topk_per_label": _oracle_topk_per_label(),
        "doc_mean_pool": _oracle_doc_mean_pool(),
        "model_lang_id": _oracle_model_lang_id(),
        "ppm_image_features": _oracle_ppm_image_features(),
        "png_image_features": _oracle_png_image_features(),
        "jpeg_image_features": _oracle_jpeg_image_features(),
        "y4m_video_features": _oracle_y4m_video_features(),
        "wav_audio_features": _oracle_wav_audio_features(),
        "wav_spectral_features": _oracle_wav_spectral_features(),
        "dup_span_stats": _oracle_dup_span_stats(),
        "remove_dup_spans": _oracle_remove_dup_spans(),
        "ranking_quality": _oracle_ranking_quality(),
        "dsir_weights": _oracle_dsir_weights(),
        "c4_clean": _oracle_c4_clean(),
        "gopher_rules": _oracle_gopher_rules(),
        "normalized_dedup": _oracle_normalized_dedup(),
        "dsir_resample": _oracle_dsir_resample(),
        "event_funnel": _oracle_event_funnel(),
        "incremental_near_dup": _oracle_incremental_near_dup(),
        "key_skew": _oracle_key_skew(),
        "value_lift": _ORACLE_VALUE_LIFT,
        "rfm_scores": _ORACLE_RFM_SCORES,
        "dau_wau": _ORACLE_DAU_WAU,
        "session_paths": _ORACLE_SESSION_PATHS,
        "fuzzy_titles": _ORACLE_FUZZY_TITLES,
        "segment_target_enc": _ORACLE_SEGMENT_TARGET_ENC,
        "price_psi": _ORACLE_PRICE_PSI,
        "conversion_latency": _ORACLE_CONVERSION_LATENCY,
        "revenue_gini": _ORACLE_REVENUE_GINI,
        "nation_supplier_hhi": _ORACLE_NATION_SUPPLIER_HHI,
        "script_mix": _ORACLE_SCRIPT_MIX,
        "bigram_pmi": _ORACLE_BIGRAM_PMI,
        "event_transitions": _ORACLE_EVENT_TRANSITIONS,
        "value_bars": _ORACLE_VALUE_BARS,
        "customer_diff": _ORACLE_CUSTOMER_DIFF,
        "lineitem_correlations": _oracle_lineitem_correlations(),
        "monthly_growth": _ORACLE_MONTHLY_GROWTH,
        "cohort_matrix": _ORACLE_COHORT_MATRIX,
        "winsorized_price": _ORACLE_WINSORIZED_PRICE,
        "spend_deciles": _ORACLE_SPEND_DECILES,
        "decayed_engagement": _ORACLE_DECAYED_ENGAGEMENT,
        "cdc_snapshot": _ORACLE_CDC_SNAPSHOT,
        "price_histogram": _ORACLE_PRICE_HISTOGRAM,
        "rate_limited": _ORACLE_RATE_LIMITED,
        "orders_audit": _ORACLE_ORDERS_AUDIT,
        "large_orders": _ORACLE_LARGE_ORDERS,
        "min_cost_supplier": _ORACLE_MIN_COST_SUPPLIER,
        "unshipped_orders": _ORACLE_UNSHIPPED_ORDERS,
        "returned_revenue": _ORACLE_RETURNED_REVENUE,
        "top_supplier": _ORACLE_TOP_SUPPLIER,
        "part_supplier_counts": _ORACLE_PART_SUPPLIER_COUNTS,
        "small_qty_revenue": _ORACLE_SMALL_QTY_REVENUE,
        "disjunctive_revenue": _ORACLE_DISJUNCTIVE_REVENUE,
        "order_laggards": _ORACLE_ORDER_LAGGARDS,
        "market_share": _ORACLE_MARKET_SHARE,
        "product_profit": _ORACLE_PRODUCT_PROFIT,
        "important_parts": _ORACLE_IMPORTANT_PARTS,
        "late_ship_priority": _ORACLE_LATE_SHIP_PRIORITY,
        "copurchase_graph": _ORACLE_COPURCHASE_GRAPH,
        "part_degrees": _ORACLE_PART_DEGREES,
        "triangle_count": _ORACLE_TRIANGLE_COUNT,
        "part_pagerank": _ORACLE_PART_PAGERANK,
        "lexical_diversity": _ORACLE_LEXICAL_DIVERSITY,
        "zipf_slope": _ORACLE_ZIPF_SLOPE,
        "readability": _ORACLE_READABILITY,
        "daily_anomaly": _ORACLE_DAILY_ANOMALY,
        "assoc_rules": _ORACLE_ASSOC_RULES,
        "part_components": _ORACLE_PART_COMPONENTS,
        "part_pagerank_weighted": _ORACLE_PART_PAGERANK_WEIGHTED,
        "incremental_rollup": _ORACLE_INCREMENTAL_ROLLUP,
        "pii_cards": _oracle_pii_cards(),
        "weekday_anomaly": _ORACLE_WEEKDAY_ANOMALY,
        "cumulative_users": _ORACLE_CUMULATIVE_USERS,
        "mad_anomaly": _ORACLE_MAD_ANOMALY,
        "negative_samples": _oracle_negative_samples(),
        "epoch_upsample": _oracle_epoch_upsample(),
        "domain_percentile": _ORACLE_DOMAIN_PERCENTILE,
        "similar_series": _ORACLE_SIMILAR_SERIES,
        "sql_hot_keys": PORTABLE_SQL_HOT_KEYS,
        "sql_topk_cosine": PORTABLE_SQL_TOPK_COSINE,
        "sql_range_search": PORTABLE_SQL_RANGE_SEARCH,
        "sql_knn_join": PORTABLE_SQL_KNN_JOIN,
        "promo_orders": _ORACLE_PROMO_ORDERS,
        "sql_forecast_revenue": PORTABLE_SQL_FORECAST_REVENUE,
        "sql_priority_orders": PORTABLE_SQL_PRIORITY_ORDERS,
        "kfold_assign": _ORACLE_KFOLD_ASSIGN,
        "idle_rich_customers": _ORACLE_IDLE_RICH,
        "value_rank": _ORACLE_VALUE_RANK,
        "rolling_hour": _ORACLE_ROLLING_HOUR,
        "scd2_history": _ORACLE_SCD2_HISTORY,
        "item_cooccurrence": _ORACLE_ITEM_COOCCURRENCE,
        "tfidf_top_terms": _oracle_tfidf_top_terms(),
        "leakage_split": _oracle_leakage_split(),
        "topk_filtered": _oracle_topk_filtered(),
        "prepare_vectors": _oracle_prepare_vectors(),
        "normalized_vectors": _oracle_normalized_vectors(),
        "chunk_documents": _oracle_chunk_documents(),
        "rag_context": _oracle_rag_context(),
        "bm25_topk": _oracle_bm25_topk(),
        "bm25_topk_indexed": _oracle_bm25_topk(),
        "sparse_topk": _oracle_sparse_topk(),
        "sparse_topk_indexed": _oracle_sparse_topk(),
        "sparse_knn_join": _oracle_sparse_knn_join(),
        "hybrid_tri_rrf": _oracle_hybrid_tri_rrf(),
        "hnsw_topk": _oracle_hnsw_topk(),
        "recall_hnsw": _oracle_recall_hnsw(),
        "planned_filtered_topk": _oracle_topk_filtered(),
        "sparse_topk_trunc": _oracle_sparse_topk_trunc(),
        "hnsw_topk_indexed": _oracle_hnsw_topk(),
        "sparse_topk_sq8": _oracle_sparse_topk_sq8(),
        "sparse_topk_filtered": _oracle_sparse_topk_filtered(),
        "recall_sparse_sq8": _oracle_recall_sparse_sq8(),
        "recall_sparse_trunc": _oracle_recall_sparse_trunc(),
        "hybrid_topk_rrf": _oracle_hybrid_topk_rrf(),
        "exact_dedup_docs": _oracle_exact_dedup(),
        "curate_corpus": _oracle_curate_corpus(),
        "curate_corpus_full": _oracle_curate_corpus_full(),
        "stratified_sample": _oracle_stratified_sample(),
        "budget_select": _oracle_budget_select(),
        "budget_select_tokencol": _oracle_budget_select_tokencol(),
        "knn_classify": _oracle_knn_classify(),
        "pack_sequences": _oracle_pack_sequences(),
        "near_dup_pairs_minhash": _oracle_near_dup_pairs(),
        "jaccard_pairs": _oracle_jaccard_pairs(),
        "simhash_fingerprints": _oracle_simhash(),
        "simhash_near_dups": _oracle_simhash_near_dups(),
        "embedding_near_dup": _oracle_embedding_near_dup(),
        "embedding_near_dup_lsh": _oracle_embedding_near_dup_lsh(),
        "dedup_clusters": _oracle_dedup_clusters(),
        "token_stats": _oracle_token_stats(),
        "quality_score": _oracle_quality_score(),
        "lang_id": _oracle_lang_id(),
        "repetition_stats": _oracle_repetition_stats(),
        "lm_doc_scores": _oracle_lm_doc_scores(),
        "top_ngrams": _oracle_top_ngrams(),
        "doc_signals": _oracle_doc_signals(),
        "bq_topk": _oracle_bq_topk(),
        "bq_topk_indexed": _oracle_bq_topk(),
        "recall_bq": _oracle_recall_bq(),
        "mrl_topk": _oracle_mrl_topk(),
        "recall_mrl": _oracle_recall_mrl(),
        "chunk_overlap": _oracle_chunk_overlap(),
        "ivf_knn_join": _oracle_ivf_knn_join(),
        "bm25_knn_join": _oracle_bm25_knn_join(),
        "table_profile": _oracle_table_profile(),
        "shipping_volume": _ORACLE_SHIPPING_VOLUME,
        "promo_share": _ORACLE_PROMO_SHARE,
        "kmeans_assign": _oracle_kmeans_assign(),
        "kmeans_one_iter": _oracle_kmeans_one_iter(),
        "semantic_dedup": _oracle_semantic_dedup(),
        "mixture_plan": _oracle_mixture_plan(),
        "mixture_sample": _oracle_mixture_sample(),
        "mixture_pipeline": _oracle_mixture_pipeline(),
        "maxsim_topk": _oracle_maxsim_topk(),
        "maxsim_topk_indexed": _oracle_maxsim_topk(),
        "hybrid_topk_linear": _oracle_hybrid_topk_linear(),
        "contamination_pairs": _oracle_contamination_pairs(),
        "pii_scrub": _oracle_pii_scrub(),
        "rolling_fingerprint": _oracle_rolling_fingerprint(),
        "corpus_stats": _oracle_corpus_stats(),
        "pricing_summary": _ORACLE_PRICING,
        "revenue_by_nation": _ORACLE_REVENUE,
        "top_orders_per_segment": _ORACLE_TOP_ORDERS,
        "customer_order_stats": _ORACLE_CUST_ORDER_STATS,
        "parts_rollup": _ORACLE_PARTS_ROLLUP,
        "supplier_share": _ORACLE_SUPPLIER_SHARE,
        "customers_without_orders": _ORACLE_CUST_NO_ORDERS,
        "segment_churn": _ORACLE_SEGMENT_CHURN,
        "order_priority_cube": _ORACLE_ORDER_PRIORITY_CUBE,
        "price_percentiles": _ORACLE_PRICE_PERCENTILES,
        "events_hourly": _ORACLE_EVENTS_HOURLY,
        "events_sliding": _ORACLE_EVENTS_SLIDING,
        "events_props": _ORACLE_EVENTS_PROPS,
        "events_asof": _ORACLE_EVENTS_ASOF,
        "view_click_attrib": _oracle_view_click_attrib(),
        "orders_price_bands": _oracle_orders_price_bands(),
        "status_priority_pivot": _ORACLE_STATUS_PIVOT,
        "distinct_user_counts": _ORACLE_DISTINCT_USERS,
        "segment_retention": _ORACLE_SEGMENT_RETENTION,
        "monthly_revenue": _ORACLE_MONTHLY_REVENUE,
        "events_moving_avg": _ORACLE_EVENTS_MOVING_AVG,
        "user_gap_stats": _ORACLE_USER_GAPS,
        "events_sessionized": _ORACLE_EVENTS_SESSIONIZED,
        "events_sessionized_stream": _ORACLE_EVENTS_SESSIONIZED_STREAM,
        "image_features": _oracle_image_features(),
        "video_frames": _oracle_video_frames(),
        "binary_meta": _oracle_binary_meta(),
        "bulk_random_load": _oracle_bulk_random_load(),
        "collection_stats": _oracle_collection_stats(),
        "hll_distinct": _oracle_hll_distinct(),
        "frequent_items": _oracle_frequent_items(),
        "salted_join": _ORACLE_SALTED_JOIN,
        "prefix_jaccard_pairs": _oracle_prefix_jaccard_pairs(),
        "ivm_join_view": _ORACLE_IVM_JOIN_VIEW,
        "zorder_stats": _oracle_zorder_stats(),
        "pareto_front": _ORACLE_PARETO_FRONT,
        "changelog_compact": _ORACLE_CHANGELOG_COMPACT,
        "metrics_long": _ORACLE_METRICS_LONG,
        "sql_grouping_sets": _oracle_sql_grouping_sets(),
        "seasonal_decompose": _ORACLE_SEASONAL_DECOMPOSE,
        "attribution_last_touch": _ORACLE_ATTRIBUTION_LAST_TOUCH,
        "mmr_topk": _oracle_mmr_topk(),
        "mmr_knn_join": _oracle_mmr_knn_join(),
        "kcenter_select": _oracle_kcenter_select(),
        "robust_scale": _ORACLE_ROBUST_SCALE,
        "hll_incremental": _oracle_hll_distinct(),
        "quantile_sketch": _oracle_quantile_sketch(),
        "quantile_estimate": _oracle_quantile_estimate(),
        # the incremental fold is provably bucket-equal to the one-shot
        # sketch, so it shares the estimate mirror (the hll pattern)
        "quantile_incremental": _oracle_quantile_estimate(),
        "part_communities": _oracle_part_communities(),
        "quantile_grouped": _oracle_quantile_grouped(),
        "part_distances": _oracle_part_distances(),
        "priority_sample": _ORACLE_PRIORITY_SAMPLE,
        "hll_grouped": _oracle_hll_grouped(),
        "cm_frequencies": _oracle_cm_frequencies(),
        "kmv_overlap": _oracle_kmv_overlap(),
        "cm_join_size": _oracle_cm_join_size(),
        "quantile_weighted": _oracle_quantile_weighted(),
        "bloom_prune": _oracle_bloom_prune(),
        "embedding_drift": _oracle_embedding_drift(),
        "cusum_changepoints": _ORACLE_CUSUM,
        "vocab_divergence": _oracle_vocab_divergence(),
        "part_ppr": _oracle_part_ppr(),
        "ivfpq_res_topk": _oracle_ivfpq_res_topk(),
        "recall_ivfpq_res": _oracle_recall_ivfpq_res(),
        "hourly_value_p95": _oracle_hourly_value_p95(),
        "value_p95_sliding": _oracle_value_p95_sliding(),
        "ar_forecast7": _oracle_ar_forecast7(),
        "survival_cindex": _oracle_survival_cindex(),
        "bootstrap_value_ci": _oracle_bootstrap_value_ci(),
        "bootstrap_lift_ci": _oracle_bootstrap_lift_ci(),
        "ks_price_test": _ORACLE_KS_PRICE_TEST,
        "chi2_flag_status": _ORACLE_CHI2_FLAG_STATUS,
        "benford_prices": _ORACLE_BENFORD_PRICES,
        "ab_conversion": _ORACLE_AB_CONVERSION,
        "gap_filled_users": _ORACLE_GAP_FILLED_USERS,
        "ewma_daily": _ORACLE_EWMA_DAILY,
        "holt_forecast7": _ORACLE_HOLT_FORECAST7,
        "part_kcore": _oracle_part_kcore(),
        "mutual_knn": _oracle_mutual_knn(),
        "compaction_plan": _ORACLE_COMPACTION_PLAN,
        "containment_pairs": _oracle_containment_pairs(),
        "rolling_corr": _ORACLE_ROLLING_CORR,
        "lead_lag": _ORACLE_LEAD_LAG,
        "rollup_answer": _ORACLE_ROLLUP_ANSWER,
        "snm_pairs": _ORACLE_SNM_PAIRS,
        "sampled_groupby": _oracle_sampled_groupby(),
        "sliding_distinct_users": _oracle_sliding_distinct_users(),
        "trend_test": _ORACLE_TREND_TEST,
        "trend_slope": _ORACLE_TREND_SLOPE,
        "fd_profile": _oracle_fd_profile(),
        "er_clusters": _ORACLE_ER_CLUSTERS,
        "burn_rate": _ORACLE_BURN_RATE,
        "ks_sketch_drift": _oracle_ks_sketch_drift(),
        "hot_items_by_type": _ORACLE_HOT_ITEMS_BY_TYPE,
        "welch_value_test": _ORACLE_WELCH_VALUE_TEST,
        "anova_value_type": _ORACLE_ANOVA_VALUE_TYPE,
        "ks_source_matrix": _ORACLE_KS_SOURCE_MATRIX,
        "seasonality_strength": _ORACLE_SEASONALITY_STRENGTH,
        "acf_daily": _ORACLE_ACF_DAILY,
        "trend_slope_by_type": _ORACLE_TREND_SLOPE_BY_TYPE,
        "pacf_daily": _oracle_pacf_daily(),
        "dedup_recall": _oracle_dedup_recall(),
        "forecast_bands": _ORACLE_FORECAST_BANDS,
        "power_sample_size": _oracle_power_sample_size(),
        "cuped_engagement": _ORACLE_CUPED_ENGAGEMENT,
        "woe_iv": _ORACLE_WOE_IV,
        "ols_price_model": _ORACLE_OLS_PRICE_MODEL,
        "ols_fit_price": _ORACLE_OLS_PRICE_MODEL,
        "model_auc": _ORACLE_MODEL_AUC,
        "model_auc_by_arm": _ORACLE_MODEL_AUC_BY_ARM,
        "feature_mi": _ORACLE_FEATURE_MI,
        "km_ci": _ORACLE_KM_CI,
        "rmst_conversion": _oracle_rmst(1_500_000_000_000),
        "ks_drift_adjusted": _ORACLE_KS_DRIFT_ADJUSTED,
        "model_pr_auc": _ORACLE_MODEL_PR_AUC,
        "rater_kappa": _oracle_rater_kappa(),
        "cmh_strata": _ORACLE_CMH_STRATA,
        "value_wasserstein": _ORACLE_VALUE_WASSERSTEIN,
        "conformal_qhat": _ORACLE_CONFORMAL_QHAT,
        "conformal_coverage": _ORACLE_CONFORMAL_COVERAGE,
        "conformal_group_qhat": _ORACLE_CONFORMAL_GROUP_QHAT,
        "conformal_group_coverage": _ORACLE_CONFORMAL_GROUP_COVERAGE,
        "score_psi": _ORACLE_SCORE_PSI,
        "source_token_js": _ORACLE_SOURCE_TOKEN_JS,
        "calibration_error": _ORACLE_CALIBRATION_ERROR,
        "rank_sum_test": _ORACLE_RANK_SUM_TEST,
        "spearman_qty_price": _ORACLE_SPEARMAN_QTY_PRICE,
        "km_conversion": _ORACLE_KM_CONVERSION,
        "logrank_arms": _ORACLE_LOGRANK_ARMS,
        # the high-cardinality (distributed-prefix) path computes the
        # SAME statistics — integer rank sums bit-identical, KM
        # survival within last-ulps — so the mirrors are shared
        "rank_sum_distributed": _ORACLE_RANK_SUM_TEST,
        "km_distributed": _ORACLE_KM_CONVERSION,
        "events_session_native": _ORACLE_EVENTS_SESSION_NATIVE,
        "km_by_arm": _ORACLE_KM_BY_ARM,
    }


_ORACLE_KS_PRICE_TEST = f"""
WITH src AS (SELECT o_totalprice AS v,
                    CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'hi' ELSE 'lo' END AS arm
             FROM orders WHERE o_totalprice IS NOT NULL),
cnt AS (SELECT v, sum(CASE WHEN arm = 'hi' THEN 1 ELSE 0 END) AS da,
               sum(CASE WHEN arm = 'lo' THEN 1 ELSE 0 END) AS db
        FROM src GROUP BY 1),
cdf AS (SELECT v,
  sum(da) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
  sum(db) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb
 FROM cnt),
st AS (SELECT ca, cb, max(ca) OVER () AS na, max(cb) OVER () AS nb FROM cdf),
r AS (SELECT CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
             max(abs(ca / (CASE WHEN na > 0 THEN na END) - cb / (CASE WHEN nb > 0 THEN nb END))) AS d_stat FROM st),
z AS (SELECT n_a, n_b, d_stat,
             d_stat * sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / (n_a + n_b)) AS ks_z FROM r)
SELECT n_a, n_b, {_r6('d_stat', 'd_stat')}, {_r6('ks_z', 'ks_z')},
       {_r6('least(CAST(1.0 AS DOUBLE), 2.0 * exp(-2.0 * ks_z * ks_z))', 'p_approx')}
FROM z
"""


_ORACLE_CHI2_FLAG_STATUS = f"""
WITH cells AS (SELECT l_returnflag AS a, l_linestatus AS b, count(*) AS o
               FROM lineitem GROUP BY 1, 2),
e AS (SELECT a, b, o,
             sum(o) OVER (PARTITION BY a) * sum(o) OVER (PARTITION BY b) / sum(o) OVER () AS ex
      FROM cells),
agg AS (SELECT CAST(sum(o) AS BIGINT) AS n, count(DISTINCT a) AS r, count(DISTINCT b) AS c,
               sum((o - ex) * (o - ex) / ex) AS chi2
        FROM e)
SELECT n, CAST((r - 1) * (c - 1) AS BIGINT) AS dof, {_r6('chi2', 'chi2')},
       {_r6('sqrt(chi2 / (CASE WHEN n * least(r - 1, c - 1) > 0 THEN n * least(r - 1, c - 1) END))', 'cramers_v')}
FROM agg
"""


_ORACLE_BENFORD_PRICES = f"""
WITH x AS (SELECT greatest(1, least(9,
             CAST(floor(o_totalprice / power(10.0, floor(log10(o_totalprice)))) AS INT))) AS digit
           FROM orders WHERE o_totalprice > 0),
c AS (SELECT digit, count(*) AS n FROM x GROUP BY 1),
t AS (SELECT digit, n, sum(n) OVER () AS total FROM c)
SELECT digit, CAST(n AS BIGINT) AS n, {_r6('n / total', 'obs_share')},
       {_r6('log10(1.0 + 1.0 / digit)', 'exp_share')},
       {_r6('total * (n / total - log10(1.0 + 1.0 / digit)) * (n / total - log10(1.0 + 1.0 / digit)) / log10(1.0 + 1.0 / digit)', 'chi2_term')}
FROM t ORDER BY digit
"""


_ORACLE_AB_CONVERSION = f"""
WITH src AS (SELECT CAST(user_id AS VARCHAR) || '#' || CAST(CAST(ts AS DATE) AS VARCHAR) AS unit,
                    CASE WHEN (user_id + date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))) % 2 = 0
                         THEN 'a' ELSE 'b' END AS arm,
                    event_type = 'purchase' AS conv
             FROM events WHERE event_type IS NOT NULL),
units AS (SELECT unit, max(arm) AS g, max(CAST(conv AS INT)) AS s FROM src GROUP BY 1),
arms AS (SELECT g, count(*) AS n, sum(s) AS x FROM units GROUP BY 1),
lo AS (SELECT min(g) AS g_lo FROM arms),
wide AS (SELECT CAST(sum(CASE WHEN g = g_lo THEN n END) AS BIGINT) AS n_a,
                CAST(sum(CASE WHEN g = g_lo THEN x END) AS BIGINT) AS x_a,
                CAST(sum(CASE WHEN g <> g_lo THEN n END) AS BIGINT) AS n_b,
                CAST(sum(CASE WHEN g <> g_lo THEN x END) AS BIGINT) AS x_b
         FROM arms, lo),
d AS (SELECT n_a, x_a, n_b, x_b,
             sqrt((x_a + x_b) / (n_a + n_b) * (1.0 - (x_a + x_b) / (n_a + n_b))
                  * (1.0 / n_a + 1.0 / n_b)) AS denom
      FROM wide)
SELECT n_a, x_a, {_r6('x_a / n_a', 'rate_a')}, n_b, x_b, {_r6('x_b / n_b', 'rate_b')},
       {_r6('x_a / n_a - x_b / n_b', 'lift')},
       {_r6('CASE WHEN denom <> 0 THEN (x_a / n_a - x_b / n_b) / denom END', 'z')}
FROM d
"""


_ORACLE_GAP_FILLED_USERS = f"""
WITH d AS (SELECT user_id, CAST(ts AS DATE) AS day, sum(value) AS y
           FROM events WHERE user_id < 20 GROUP BY 1, 2),
sp AS (SELECT user_id AS k, unnest(generate_series(min(day), max(day), INTERVAL 1 DAY)) AS day
       FROM d GROUP BY 1),
j AS (SELECT sp.k, CAST(sp.day AS DATE) AS day, d.y
      FROM sp LEFT JOIN d ON d.user_id = sp.k AND d.day = CAST(sp.day AS DATE))
SELECT CAST(k AS BIGINT) AS user_id, strftime(day, '%Y-%m-%d') AS day,
       {_r6('y', 'y')},
       {_r6("last_value(y IGNORE NULLS) OVER (PARTITION BY k ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)", 'y_filled')},
       y IS NULL AS is_gap
FROM j ORDER BY user_id, day
"""


_ORACLE_EWMA_DAILY = f"""
WITH RECURSIVE d0 AS MATERIALIZED (
  SELECT event_type AS k, CAST(ts AS DATE) AS day, sum(value) AS y FROM events GROUP BY 1, 2),
d AS MATERIALIZED (
  SELECT k, day, y, row_number() OVER (PARTITION BY k ORDER BY day) AS t FROM d0),
r AS (
  SELECT k, t, day, y, y AS s FROM d WHERE t = 1
  UNION ALL
  SELECT d.k, d.t, d.day, d.y, d.y * 0.25 + r.s * 0.75
  FROM r JOIN d ON d.k = r.k AND d.t = r.t + 1
)
SELECT k AS event_type, strftime(day, '%Y-%m-%d') AS day,
       {_r6('y', 'y')}, {_r6('s', 'ewma')}
FROM r ORDER BY event_type, day
"""


_ORACLE_HOLT_FORECAST7 = f"""
WITH RECURSIVE d0 AS MATERIALIZED (
  SELECT event_type AS k, CAST(ts AS DATE) AS day, sum(value) AS y FROM events GROUP BY 1, 2),
d AS MATERIALIZED (
  SELECT k, y, row_number() OVER (PARTITION BY k ORDER BY day) AS t,
         count(*) OVER (PARTITION BY k) AS n FROM d0),
r AS (
  SELECT k, 1 AS t, y AS l, (SELECT y FROM d d2 WHERE d2.k = d.k AND d2.t = 2) - y AS b
  FROM d WHERE t = 1 AND n >= 2
  UNION ALL
  SELECT d.k, d.t, d.y * 0.5 + (r.l + r.b) * 0.5 AS l,
         (d.y * 0.5 + (r.l + r.b) * 0.5 - r.l) * 0.25 + r.b * 0.75 AS b
  FROM r JOIN d ON d.k = r.k AND d.t = r.t + 1
),
fin AS (SELECT k, l, b FROM r QUALIFY row_number() OVER (PARTITION BY k ORDER BY t DESC) = 1)
SELECT k AS event_type, CAST(h AS INT) AS h,
       {_r6('l + h * b', 'forecast')}, {_r6('l', 'level')}, {_r6('b', 'trend')}
FROM fin, unnest(generate_series(1, 7)) AS u(h) ORDER BY event_type, h
"""


def _oracle_part_kcore(k: int = 2, iters: int = 6) -> str:
    """k-core peeling unrolled round for round (operators/graph.kcore):
    per round the surviving-degree filter + both-endpoint semi-join,
    every round MATERIALIZED (the unrolled-iteration rule)."""
    rounds = []
    for i in range(1, iters + 1):
        rounds.append(f"""k{i} AS MATERIALIZED (
  SELECT s AS node FROM e{i - 1} GROUP BY 1 HAVING count(*) >= {k}),
e{i} AS MATERIALIZED (
  SELECT s, d FROM e{i - 1}
  WHERE s IN (SELECT node FROM k{i}) AND d IN (SELECT node FROM k{i}))""")
    body = ",\n".join(rounds)
    return f"""
WITH oi AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS item
            FROM lineitem WHERE l_partkey IS NOT NULL),
capped AS (SELECT o, item FROM
             (SELECT o, item, row_number() OVER (PARTITION BY o ORDER BY item) AS rn
              FROM oi) WHERE rn <= 20),
e AS (SELECT a.item AS src, b.item AS dst, count(*) AS weight
      FROM capped a JOIN capped b ON a.o = b.o AND a.item < b.item
      GROUP BY 1, 2 HAVING count(*) >= 2),
e0 AS MATERIALIZED (SELECT src AS s, dst AS d FROM e
                    UNION ALL SELECT dst, src FROM e),
{body}
SELECT CAST(s AS BIGINT) AS node, CAST(count(*) AS BIGINT) AS core_deg
FROM e{iters} GROUP BY 1 HAVING count(*) >= {k} ORDER BY node
"""


def _oracle_mutual_knn(k: int = 5) -> str:
    """Mutual kNN mirror: the same rank-per-qid (score desc, id asc)
    over all non-self pairs, top-k both directions, reciprocated edges
    once in canonical orientation."""
    return f"""
WITH scored AS (SELECT a.vec_id AS qid, b.vec_id AS nid,
                       {_sq_cosine('b.embedding', 'a.embedding')} AS s
                FROM embeddings a, embeddings b WHERE a.vec_id <> b.vec_id),
topk AS (SELECT qid, nid, s FROM (
           SELECT qid, nid, s,
                  row_number() OVER (PARTITION BY qid ORDER BY s DESC, nid) AS r
           FROM scored) WHERE r <= {k})
SELECT CAST(t.qid AS BIGINT) AS id_a, CAST(t.nid AS BIGINT) AS id_b, {_r6('t.s', 'score')}
FROM topk t JOIN topk u ON u.qid = t.nid AND u.nid = t.qid
WHERE t.qid < t.nid ORDER BY id_a, id_b
"""


_ORACLE_COMPACTION_PLAN = """
WITH inv AS (SELECT lang, doc_id, n_chars, n_chars < 500 AS small FROM documents),
st AS (SELECT lang, doc_id, n_chars, small,
              coalesce(sum(CASE WHEN small THEN n_chars END)
                OVER (PARTITION BY lang ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
       FROM inv),
planned AS (SELECT lang, doc_id, n_chars,
                   CASE WHEN small THEN 'compact' ELSE 'keep' END AS action,
                   CASE WHEN small THEN CAST(floor(start / 2000) AS BIGINT) END AS grp,
                   small
            FROM st)
SELECT lang, CAST(doc_id AS BIGINT) AS doc_id, CAST(n_chars AS BIGINT) AS n_chars, action, grp,
       CASE WHEN small THEN CAST(sum(n_chars) OVER (PARTITION BY lang, grp) AS BIGINT) END AS grp_bytes,
       CASE WHEN small THEN CAST(count(*) OVER (PARTITION BY lang, grp) AS BIGINT) END AS grp_files
FROM planned ORDER BY lang, doc_id
"""


def _oracle_containment_pairs() -> str:
    """BRUTE-FORCE all-pairs directed shingle containment — not the
    prefix-filtered plan, so a hash match proves the Spark side's
    asymmetric pruning lossless."""
    sh = _sq_shingles('t', SHINGLE_N)
    return f"""
WITH src AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000,
         array_to_string(list_slice(string_split(text, ' '), 1, 20), ' ')
  FROM documents WHERE doc_id % 7 = 0),
tt AS (SELECT doc_id, {_SQ_TOKS} AS t FROM src),
s AS (SELECT doc_id, list_distinct({sh}) AS sh FROM tt),
e AS (SELECT doc_id, unnest(sh) AS tok FROM s),
sz AS (SELECT doc_id, len(sh) AS n FROM s),
i AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS o
      FROM e a JOIN e b ON a.tok = b.tok AND a.doc_id <> b.doc_id GROUP BY 1, 2)
SELECT CAST(ia AS BIGINT) AS id_a, CAST(ib AS BIGINT) AS id_b,
       {_r6('CAST(o AS DOUBLE) / CAST(na.n AS DOUBLE)', 'containment')}
FROM i JOIN sz na ON na.doc_id = i.ia JOIN sz nb ON nb.doc_id = i.ib
WHERE CAST(o AS DOUBLE) / CAST(na.n AS DOUBLE) >= 0.8
ORDER BY id_a, id_b
"""


_SQ_PC_DAILY = """
d AS (SELECT CAST(ts AS DATE) AS day,
             CAST(floor(coalesce(sum(CASE WHEN event_type = 'purchase' THEN value END), 0.0) * 100 + 0.5) AS BIGINT) AS x,
             CAST(floor(coalesce(sum(CASE WHEN event_type = 'click' THEN value END), 0.0) * 100 + 0.5) AS BIGINT) AS y
      FROM events GROUP BY 1)
"""

_SQ_PEARSON = (
    "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / CASE WHEN sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    "          * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) = 0"
    "        THEN NULL"
    "        ELSE sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    "           * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) END"
)

_ORACLE_ROLLING_CORR = f"""
WITH {_SQ_PC_DAILY},
s AS (SELECT day, x, y,
             count(*) OVER w AS n,
             sum(x) OVER w AS sx, sum(y) OVER w AS sy,
             sum(x * x) OVER w AS sxx, sum(y * y) OVER w AS syy,
             sum(x * y) OVER w AS sxy
      FROM d
      WINDOW w AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
SELECT strftime(day, '%Y-%m-%d') AS day, x, y, CAST(n AS BIGINT) AS n_window,
       {_r6(_SQ_PEARSON, 'corr')}
FROM s ORDER BY day
"""

_ORACLE_LEAD_LAG = f"""
WITH {_SQ_PC_DAILY},
lags AS (SELECT unnest(generate_series(-7, 7)) AS lag),
p AS (SELECT l.lag, a.x, b.y
      FROM d a CROSS JOIN lags l
      JOIN d b ON b.day = a.day + to_days(CAST(l.lag AS INT))),
agg AS (SELECT lag, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
               sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
        FROM p GROUP BY 1),
sc AS (SELECT lag, n, {_SQ_PEARSON} AS corr FROM agg)
SELECT CAST(lag AS INT) AS lag, CAST(n AS BIGINT) AS n_days, {_r6('corr', 'corr')},
       (row_number() OVER (ORDER BY abs(corr) DESC NULLS LAST, lag ASC) = 1
        AND corr IS NOT NULL) AS is_best
FROM sc ORDER BY lag
"""


_ORACLE_ROLLUP_ANSWER = f"""
SELECT event_type, CAST(count(event_id) AS BIGINT) AS n_events,
       {_r6('round(sum(value), 2)', 'sum_value')},
       {_r6('max(value)', 'max_value')}
FROM events GROUP BY 1 ORDER BY 1
"""


_ORACLE_SNM_PAIRS = """
WITH src AS (
  SELECT doc_id, substring(text, 1, 12) AS name FROM documents
  UNION ALL
  SELECT doc_id + 1000000,
         substring(text, 1, 4) || 'z' || substring(text, 6, 7)
  FROM documents WHERE doc_id % 5 = 0),
ranked AS (SELECT doc_id AS id, name AS key,
                  row_number() OVER (ORDER BY name, doc_id) AS pos FROM src),
pairs AS (SELECT a.id AS id_a, b.id AS id_b, a.key AS key_a, b.key AS key_b
          FROM ranked a JOIN ranked b
            ON b.pos BETWEEN a.pos + 1 AND a.pos + 4)
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b, key_a, key_b,
       CAST(levenshtein(key_a, key_b) AS INT) AS dist
FROM pairs WHERE levenshtein(key_a, key_b) <= 2
ORDER BY id_a, id_b
"""


def _oracle_sampled_groupby(denom: int = 8) -> str:
    """The identical portable-hash 1/denom sample + Horvitz-Thompson
    estimators, exact truth joined in."""
    h = _sq_tok_hash("CAST(event_id AS VARCHAR)")
    p = 1.0 / denom
    factor = (1.0 - p) / (p * p)
    return f"""
WITH s AS (SELECT event_type, value FROM events WHERE {h} % {denom} = 0),
agg AS (SELECT event_type, count(*) AS n_sample, sum(value) AS sv, sum(value * value) AS svv
        FROM s GROUP BY 1),
ex AS (SELECT event_type, count(*) AS n_true, sum(value) AS st FROM events GROUP BY 1)
SELECT agg.event_type, CAST(n_sample AS BIGINT) AS n_sample,
       CAST(n_sample * {denom} AS BIGINT) AS n_est,
       {_r6(f'sv * CAST({denom} AS DOUBLE)', 'sum_est')},
       {_r6(f'sqrt({factor!r} * svv)', 'se_sum')},
       {_r6(f'sqrt({factor!r} * svv) / (CASE WHEN sv * CAST({denom} AS DOUBLE) <> 0 THEN abs(sv * CAST({denom} AS DOUBLE)) END)', 'rel_err')},
       CAST(n_true AS BIGINT) AS n_true, {_r6('st', 'sum_true')}
FROM agg JOIN ex ON ex.event_type = agg.event_type
ORDER BY 1
"""


def _oracle_sliding_distinct_users(trailing: int = 6) -> str:
    """Sliding-HLL mirror: identical register math (the hll_grouped
    fragments) with the dense bucket×idx spine and the same RANGE
    max-merge, plus the exact contribute-forward evidence join."""
    pr, m, w = 8, 256, 52
    mask = (1 << w) - 1
    branches = f"WHEN rest = 0 THEN {w + 1} " + " ".join(
        f"WHEN rest >= {1 << (b - 1)} THEN {w + 1 - b}" for b in range(w, 0, -1)
    )
    num = 0.7213 / (1.0 + 1.079 / m) * m * m
    two_w1 = float(1 << (w + 1))
    raw = f"CAST({num!r} AS DOUBLE) * CAST({two_w1!r} AS DOUBLE) / z_scaled"
    return f"""
WITH ev AS (SELECT user_id, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS bucket FROM events),
h AS (SELECT bucket, {_sq_tok_hash("CAST(user_id AS VARCHAR)")} AS h FROM ev),
b AS (SELECT bucket, h >> {w} AS idx, h & {mask} AS rest FROM h),
r AS (SELECT bucket, idx, max(CASE {branches} END) AS rho FROM b GROUP BY 1, 2),
spine AS (SELECT DISTINCT bucket FROM r),
grid AS (SELECT spine.bucket, u.idx FROM spine,
               (SELECT unnest(generate_series(0, {m - 1})) AS idx) u),
dense AS (SELECT g.bucket, g.idx, r.rho FROM grid g
          LEFT JOIN r ON r.bucket = g.bucket AND r.idx = g.idx),
mg AS (SELECT bucket, idx,
              max(rho) OVER (PARTITION BY idx ORDER BY bucket
                             RANGE BETWEEN {trailing - 1} PRECEDING AND CURRENT ROW) AS rho
       FROM dense),
s AS (SELECT bucket, count(rho) AS nonzero,
             coalesce(sum(CAST(power(2, {w + 1} - rho) AS BIGINT)), 0) AS zf
      FROM mg GROUP BY 1),
k AS (SELECT bucket, nonzero, zf + ({m} - nonzero) * {1 << (w + 1)} AS z_scaled FROM s),
contrib AS (SELECT e.user_id, e.bucket + u.o AS bucket
            FROM ev e, (SELECT unnest(generate_series(0, {trailing - 1})) AS o) u),
ex AS (SELECT c.bucket, count(DISTINCT c.user_id) AS exact_distinct
       FROM contrib c JOIN spine sp ON sp.bucket = c.bucket GROUP BY 1)
SELECT k.bucket, CAST(nonzero AS BIGINT) AS nonzero,
       CAST(z_scaled AS BIGINT) AS z_scaled,
       {_r6(f'''CASE WHEN ({raw}) <= CAST({2.5 * m!r} AS DOUBLE) AND ({m} - nonzero) > 0
                 THEN CAST({float(m)!r} AS DOUBLE) * ln(CAST({float(m)!r} AS DOUBLE) / ({m} - nonzero))
                 ELSE {raw} END''', 'estimate')},
       CAST(exact_distinct AS BIGINT) AS exact_distinct
FROM k JOIN ex ON ex.bucket = k.bucket
ORDER BY 1
"""


_SQ_DAILY_CENTS = """
d AS (SELECT CAST(ts AS DATE) AS day,
             CAST(floor(sum(value) * 100 + 0.5) AS BIGINT) AS y
      FROM events GROUP BY 1)
"""

_ORACLE_TREND_TEST = f"""
WITH {_SQ_DAILY_CENTS},
s AS (SELECT CAST(sum(CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s
      FROM d a JOIN d b ON a.day < b.day),
base AS (SELECT count(*) AS n FROM d),
ties AS (SELECT coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS tie_term
         FROM (SELECT count(*) AS t FROM d GROUP BY y HAVING count(*) > 1)),
j AS (SELECT s, n, tie_term,
             CAST(n * (n - 1) * (2 * n + 5) - tie_term AS DOUBLE) / 18.0 AS var_s
      FROM s, base, ties)
SELECT CAST(n AS BIGINT) AS n, s, {_r6('var_s', 'var_s')},
       {_r6('''CASE WHEN var_s > 0 THEN
                 CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE) / sqrt(var_s)
                      WHEN s < 0 THEN CAST(s + 1 AS DOUBLE) / sqrt(var_s)
                      ELSE 0.0 END END''', 'z')}
FROM j
"""

_ORACLE_TREND_SLOPE = f"""
WITH {_SQ_DAILY_CENTS},
d0 AS (SELECT min(day) AS dmin FROM d),
dx AS (SELECT CAST(date_diff('day', dmin, day) AS DOUBLE) AS x, CAST(y AS DOUBLE) AS y
       FROM d, d0),
sl AS (SELECT (b.y - a.y) / (b.x - a.x) AS m
       FROM dx a JOIN dx b ON a.x < b.x),
med AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs, quantile_cont(m, 0.5) AS slope FROM sl),
resid AS (SELECT n_pairs, slope, y - slope * x AS r FROM dx, med)
SELECT CAST(count(*) AS BIGINT) AS n, n_pairs, {_r6('slope', 'slope')},
       {_r6('quantile_cont(r, 0.5)', 'intercept')}
FROM resid GROUP BY n_pairs, slope
"""


def _oracle_fd_profile() -> str:
    """Per-candidate g3 FD check: cells → per-A keep-max → rollup,
    one block per dependency, unioned."""
    def block(a, b):
        return f"""
SELECT '{a}' AS lhs, '{b}' AS rhs,
       CAST(sum(rows_) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT) AS violating_groups,
       CAST(sum(rows_) - sum(keep_) AS BIGINT) AS g3_rows,
       (sum(rows_) - sum(keep_)) = 0 AS holds
FROM (SELECT {a} AS a, sum(n) AS rows_, max(n) AS keep_, count(*) AS nb
      FROM (SELECT {a}, {b}, count(*) AS n FROM orders GROUP BY 1, 2)
      GROUP BY 1)"""
    blocks = " UNION ALL ".join(
        block(a, b)
        for a, b in [
            ("o_orderkey", "o_custkey"),
            ("o_custkey", "o_orderpriority"),
            ("o_orderdate", "o_orderstatus"),
        ]
    )
    return f"SELECT * FROM ({blocks}) ORDER BY lhs, rhs"


_ORACLE_ER_CLUSTERS = """
WITH RECURSIVE base AS (
  SELECT doc_id, substr(text, 1, 12) AS name FROM documents
  UNION ALL
  SELECT doc_id + 1000000,
         concat(substr(text, 1, 4), 'z', substr(text, 6, 7))
  FROM documents WHERE doc_id % 5 = 0),
k AS (SELECT doc_id, name, lower(substr(name, 1, 3)) AS pfx FROM base),
p AS (SELECT a.doc_id AS ia, b.doc_id AS ib
      FROM k a JOIN k b ON a.pfx = b.pfx AND a.doc_id < b.doc_id
      WHERE levenshtein(a.name, b.name) <= 2),
edges AS (SELECT ia AS s, ib AS d FROM p UNION SELECT ib, ia FROM p),
reach (s, d) AS (SELECT s, d FROM edges
                 UNION SELECT r.s, x.d FROM reach r JOIN edges x ON r.d = x.s),
comp AS (SELECT s AS node, least(min(d), s) AS component FROM reach GROUP BY s)
SELECT CAST(b.doc_id AS BIGINT) AS doc_id,
       CAST(coalesce(c.component, b.doc_id) AS BIGINT) AS cluster,
       c.component IS NOT NULL AS is_matched
FROM base b LEFT JOIN comp c ON c.node = b.doc_id
ORDER BY doc_id
"""


_ORACLE_BURN_RATE = f"""
WITH hourly AS (SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour,
                       sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS errs,
                       count(*) AS total
                FROM events GROUP BY 1),
w AS (SELECT hour, errs, total,
             sum(errs) OVER ws AS es, sum(total) OVER ws AS ts_,
             sum(errs) OVER wl AS el, sum(total) OVER wl AS tl
      FROM hourly
      WINDOW ws AS (ORDER BY hour RANGE BETWEEN 0 PRECEDING AND CURRENT ROW),
             wl AS (ORDER BY hour RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)),
b AS (SELECT hour, errs, total,
             (CAST(es AS DOUBLE) / (CASE WHEN ts_ > 0 THEN ts_ END)) / 0.25 AS burn_short,
             (CAST(el AS DOUBLE) / (CASE WHEN tl > 0 THEN tl END)) / 0.25 AS burn_long
      FROM w)
SELECT hour, CAST(errs AS BIGINT) AS errs, CAST(total AS BIGINT) AS total,
       {_r6('burn_short', 'burn_short')}, {_r6('burn_long', 'burn_long')},
       (burn_short > 1.1 AND burn_long > 1.1) AS alert
FROM b ORDER BY hour
"""


def _oracle_ks_sketch_drift() -> str:
    """KS over sketch buckets: the ks_price_test mirror with the
    integer qsketch bucket id as the ordered domain."""
    return f"""
WITH src AS (SELECT {_sq_qbucket("CAST(floor(value * 100 + 0.5) AS BIGINT)")} AS v,
                    CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16' THEN 'h1' ELSE 'h2' END AS arm
             FROM events),
cnt AS (SELECT v, sum(CASE WHEN arm = 'h1' THEN 1 ELSE 0 END) AS da,
               sum(CASE WHEN arm = 'h2' THEN 1 ELSE 0 END) AS db
        FROM src GROUP BY 1),
cdf AS (SELECT v,
  sum(da) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
  sum(db) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb
 FROM cnt),
st AS (SELECT ca, cb, max(ca) OVER () AS na, max(cb) OVER () AS nb FROM cdf),
r AS (SELECT CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
             max(abs(ca / (CASE WHEN na > 0 THEN na END) - cb / (CASE WHEN nb > 0 THEN nb END))) AS d_stat FROM st),
z AS (SELECT n_a, n_b, d_stat,
             d_stat * sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / (n_a + n_b)) AS ks_z FROM r)
SELECT n_a, n_b, {{r6_d}}, {{r6_z}}, {{r6_p}}
FROM z
""".replace("{r6_d}", _r6('d_stat', 'd_stat')).replace(
        "{r6_z}", _r6('ks_z', 'ks_z')
    ).replace(
        "{r6_p}",
        _r6('least(CAST(1.0 AS DOUBLE), 2.0 * exp(-2.0 * ks_z * ks_z))', 'p_approx'),
    )


_ORACLE_HOT_ITEMS_BY_TYPE = f"""
WITH src AS (SELECT event_type,
                    CASE WHEN event_id % 3 = 0 THEN 'hot'
                         ELSE 'u' || CAST(event_id % 500 AS VARCHAR) END AS item
             FROM events),
tot AS (SELECT event_type, count(*) AS n FROM src GROUP BY 1),
c AS (SELECT s.event_type, s.item, count(*) AS n_rows, max(t.n) AS n
      FROM src s JOIN tot t ON t.event_type = s.event_type
      GROUP BY 1, 2 HAVING count(*) * 8 >= max(t.n))
SELECT event_type, item, CAST(n_rows AS BIGINT) AS n_rows,
       {_r6('round(n_rows / CAST(n AS DOUBLE), 6)', 'share')}
FROM c ORDER BY event_type, item
"""


_ORACLE_WELCH_VALUE_TEST = f"""
WITH src AS (SELECT value AS v,
                    CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS arm
             FROM events),
agg AS (SELECT CAST(sum(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               sum(CASE WHEN arm = 'a' THEN v END) AS sa,
               sum(CASE WHEN arm = 'a' THEN v * v END) AS qa,
               CAST(sum(CASE WHEN arm = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
               sum(CASE WHEN arm = 'b' THEN v END) AS sb,
               sum(CASE WHEN arm = 'b' THEN v * v END) AS qb
        FROM src),
m AS (SELECT n_a, sa / (CASE WHEN n_a > 0 THEN n_a END) AS mean_a,
             (qa - sa * sa / n_a) / (CASE WHEN n_a > 1 THEN n_a - 1 END) AS var_a,
             n_b, sb / (CASE WHEN n_b > 0 THEN n_b END) AS mean_b,
             (qb - sb * sb / n_b) / (CASE WHEN n_b > 1 THEN n_b - 1 END) AS var_b
      FROM agg),
s AS (SELECT m.*, var_a / n_a + var_b / n_b AS se2 FROM m)
SELECT n_a, {_r6('mean_a', 'mean_a')}, {_r6('var_a', 'var_a')},
       n_b, {_r6('mean_b', 'mean_b')}, {_r6('var_b', 'var_b')},
       {_r6('(mean_a - mean_b) / sqrt(CASE WHEN se2 > 0 THEN se2 END)', 't')},
       {_r6('''se2 * se2 / (CASE WHEN (var_a / n_a) * (var_a / n_a) / (CASE WHEN n_a > 1 THEN n_a - 1 END)
                     + (var_b / n_b) * (var_b / n_b) / (CASE WHEN n_b > 1 THEN n_b - 1 END) > 0
                THEN (var_a / n_a) * (var_a / n_a) / (CASE WHEN n_a > 1 THEN n_a - 1 END)
                     + (var_b / n_b) * (var_b / n_b) / (CASE WHEN n_b > 1 THEN n_b - 1 END) END)''', 'dof')}
FROM s
"""


_ORACLE_ANOVA_VALUE_TYPE = f"""
WITH per AS (SELECT event_type AS g, count(*) AS ng, sum(value) AS sg,
                    sum(value * value) AS qg
             FROM events GROUP BY 1),
agg AS (SELECT CAST(sum(ng) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k,
               sum(sg) AS s, sum(qg) AS q, sum(sg * sg / ng) AS sb
        FROM per),
d AS (SELECT n, k, sb - s * s / n AS ss_b, q - sb AS ss_w, q - s * s / n AS ss_t FROM agg)
SELECT n, k, {_r6('ss_b', 'ss_between')}, {_r6('ss_w', 'ss_within')},
       {_r6('(ss_b / (CASE WHEN k > 1 THEN k - 1 END)) / (CASE WHEN n > k AND ss_w > 0 THEN ss_w / (n - k) END)', 'f_stat')},
       {_r6('ss_b / (CASE WHEN ss_t > 0 THEN ss_t END)', 'eta_sq')}
FROM d
"""


_ORACLE_KS_SOURCE_MATRIX = f"""
WITH cnt AS (SELECT n_chars AS v, source AS g, count(*) AS c FROM documents
             WHERE n_chars IS NOT NULL GROUP BY 1, 2),
vals AS (SELECT DISTINCT v FROM cnt),
grps AS (SELECT DISTINCT g FROM cnt),
spine AS (SELECT v, g FROM vals, grps),
cdf0 AS (SELECT s.v, s.g,
                sum(coalesce(c.c, 0)) OVER (PARTITION BY s.g ORDER BY s.v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         FROM spine s LEFT JOIN cnt c ON c.v = s.v AND c.g = s.g),
cdf AS (SELECT v, g, cum, max(cum) OVER (PARTITION BY g) AS n FROM cdf0),
agg AS (SELECT a.g AS group_a, b.g AS group_b,
               CAST(max(a.n) AS BIGINT) AS n_a, CAST(max(b.n) AS BIGINT) AS n_b,
               max(abs(a.cum / (CASE WHEN a.n > 0 THEN a.n END)
                       - b.cum / (CASE WHEN b.n > 0 THEN b.n END))) AS d_stat
        FROM cdf a JOIN cdf b ON a.v = b.v AND a.g < b.g
        GROUP BY 1, 2),
z AS (SELECT agg.*, d_stat * sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / (n_a + n_b)) AS ks_z
      FROM agg)
SELECT group_a, group_b, n_a, n_b, {_r6('d_stat', 'd_stat')}, {_r6('ks_z', 'ks_z')},
       {_r6('least(CAST(1.0 AS DOUBLE), 2.0 * exp(-2.0 * ks_z * ks_z))', 'p_approx')}
FROM z ORDER BY group_a, group_b
"""


_ORACLE_SEASONALITY_STRENGTH = f"""
WITH d AS (SELECT CAST(ts AS DATE) AS day, sum(value) AS y FROM events GROUP BY 1),
t AS (SELECT day, y,
             avg(y) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS trend
      FROM d),
dt AS (SELECT day, y, trend, y - trend AS det FROM t),
s AS (SELECT day, y, trend, det,
             avg(det) OVER (PARTITION BY dayofweek(day)) - avg(det) OVER () AS seasonal
      FROM dt),
c AS (SELECT y, seasonal, det - seasonal AS resid FROM s),
agg AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
               var_samp(y) AS vy, var_samp(seasonal) AS vs,
               var_samp(resid) AS vr, var_samp(seasonal + resid) AS vsr
        FROM c)
SELECT n_days, {_r6('vy', 'var_y')}, {_r6('vs', 'var_seasonal')}, {_r6('vr', 'var_resid')},
       {_r6('greatest(CAST(0.0 AS DOUBLE), 1.0 - vr / (CASE WHEN vsr > 0 THEN vsr END))', 'strength_seasonal')}
FROM agg
"""


_ORACLE_ACF_DAILY = f"""
WITH {_SQ_DAILY_CENTS},
lags AS (SELECT unnest(generate_series(-10, 10)) AS lag),
p AS (SELECT l.lag, a.y AS x, b.y AS y
      FROM d a CROSS JOIN lags l
      JOIN d b ON b.day = a.day + to_days(CAST(l.lag AS INT))),
agg AS (SELECT lag, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
               sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
        FROM p GROUP BY 1),
sc AS (SELECT lag, n, {_SQ_PEARSON} AS corr FROM agg)
SELECT CAST(lag AS INT) AS lag, CAST(n AS BIGINT) AS n_days, {_r6('corr', 'acf')}
FROM sc WHERE lag >= 0 ORDER BY lag
"""


_ORACLE_TREND_SLOPE_BY_TYPE = f"""
WITH d0 AS (SELECT event_type AS g, CAST(ts AS DATE) AS day,
                   CAST(floor(sum(value) * 100 + 0.5) AS BIGINT) AS y
            FROM events GROUP BY 1, 2),
mn AS (SELECT g, min(day) AS dmin FROM d0 GROUP BY 1),
dx AS (SELECT d0.g, CAST(date_diff('day', mn.dmin, d0.day) AS DOUBLE) AS x,
              CAST(y AS DOUBLE) AS y
       FROM d0 JOIN mn ON mn.g = d0.g),
sl AS (SELECT a.g, (b.y - a.y) / (b.x - a.x) AS m
       FROM dx a JOIN dx b ON a.g = b.g AND a.x < b.x),
med AS (SELECT g, CAST(count(*) AS BIGINT) AS n_pairs, quantile_cont(m, 0.5) AS slope
        FROM sl GROUP BY 1),
resid AS (SELECT dx.g, n_pairs, slope, y - slope * x AS r
          FROM dx JOIN med ON med.g = dx.g)
SELECT g AS event_type, CAST(count(*) AS BIGINT) AS n, n_pairs,
       {_r6('slope', 'slope')}, {_r6('quantile_cont(r, 0.5)', 'intercept')}
FROM resid GROUP BY g, n_pairs, slope ORDER BY event_type
"""


def _oracle_pacf_daily(max_lag: int = 4) -> str:
    """The identical Durbin-Levinson unroll in SQL: same pivoted rho
    frame, same left-associated sum order per level (generated by the
    same loop structure as operators/temporal.pacf_from_acf)."""
    levels = ["l1 AS (SELECT w.*, r1 AS p1_1 FROM w)"]
    for k in range(2, max_lag + 1):
        num_terms = " + ".join(
            f"p{k - 1}_{j} * r{k - j}" for j in range(1, k)
        )
        den_terms = " + ".join(f"p{k - 1}_{j} * r{j}" for j in range(1, k))
        levels.append(
            f"l{k}a AS (SELECT *, (r{k} - ({num_terms}))"
            f" / (CASE WHEN 1.0 - ({den_terms}) <> 0 THEN 1.0 - ({den_terms}) END)"
            f" AS p{k}_{k} FROM l{k - 1})"
        )
        coeffs = ", ".join(
            f"p{k - 1}_{j} - p{k}_{k} * p{k - 1}_{k - j} AS p{k}_{j}"
            for j in range(1, k)
        )
        levels.append(f"l{k} AS (SELECT *, {coeffs} FROM l{k}a)")
    sel = " UNION ALL ".join(
        f"SELECT {k} AS lag, p{k}_{k} AS pacf FROM l{max_lag}"
        for k in range(1, max_lag + 1)
    )
    pivots = ", ".join(
        f"max(CASE WHEN lag = {k} THEN corr END) AS r{k}"
        for k in range(1, max_lag + 1)
    )
    levels_sql = ",\n".join(levels)
    return f"""
WITH {_SQ_DAILY_CENTS},
lags AS (SELECT unnest(generate_series(-{max_lag}, {max_lag})) AS lag),
p AS (SELECT l.lag, a.y AS x, b.y AS y
      FROM d a CROSS JOIN lags l
      JOIN d b ON b.day = a.day + to_days(CAST(l.lag AS INT))),
agg AS (SELECT lag, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
               sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
        FROM p GROUP BY 1),
sc AS (SELECT lag, {_SQ_PEARSON} AS corr FROM agg),
w AS (SELECT {pivots} FROM sc WHERE lag BETWEEN 1 AND {max_lag}),
{levels_sql}
SELECT CAST(lag AS INT) AS lag, {_r6('pacf', 'pacf')} FROM ({sel}) ORDER BY lag
"""


def _oracle_dedup_recall() -> str:
    """Exact truth via brute force, found via the minhash mirror's own
    CTEs, counts joined — recall measured the same way both engines."""
    sh = _sq_shingles('t', SHINGLE_N)
    return f"""
WITH {_SQ_TIDS_CTES.strip()},
{_SQ_NEAR_DUP_CTES.strip()},
tt AS (SELECT doc_id, {_SQ_TOKS} AS t FROM documents),
s2 AS (SELECT doc_id, list_distinct({sh}) AS sh FROM tt),
e2 AS (SELECT doc_id, unnest(sh) AS tok FROM s2),
sz AS (SELECT doc_id, len(sh) AS n FROM s2),
i2 AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS o
       FROM e2 a JOIN e2 b ON a.tok = b.tok AND a.doc_id < b.doc_id GROUP BY 1, 2),
ex AS (SELECT ia AS id_a, ib AS id_b
       FROM i2 JOIN sz na ON na.doc_id = i2.ia JOIN sz nb ON nb.doc_id = i2.ib
       WHERE o / (na.n + nb.n - o) >= {NEAR_DUP_THRESHOLD}),
hit AS (SELECT ex.id_a FROM ex SEMI JOIN near_pairs np
        ON np.id_a = ex.id_a AND np.id_b = ex.id_b),
c AS (SELECT (SELECT count(*) FROM ex) AS n_exact,
             (SELECT count(*) FROM hit) AS n_found)
SELECT CAST(n_exact AS BIGINT) AS n_exact, CAST(n_found AS BIGINT) AS n_found,
       CAST(n_exact - n_found AS BIGINT) AS n_missed,
       {_r6('n_found / (CASE WHEN n_exact > 0 THEN CAST(n_exact AS DOUBLE) END)', 'recall')}
FROM c
"""


_ORACLE_FORECAST_BANDS = f"""
WITH RECURSIVE d0 AS MATERIALIZED (
  SELECT event_type AS k, CAST(ts AS DATE) AS day, sum(value) AS y FROM events GROUP BY 1, 2),
d AS MATERIALIZED (
  SELECT k, y, row_number() OVER (PARTITION BY k ORDER BY day) AS t,
         count(*) OVER (PARTITION BY k) AS n FROM d0),
r AS (
  SELECT k, 1 AS t, y AS l, (SELECT y FROM d d2 WHERE d2.k = d.k AND d2.t = 2) - y AS b
  FROM d WHERE t = 1 AND n >= 2
  UNION ALL
  SELECT d.k, d.t, d.y * 0.5 + (r.l + r.b) * 0.5 AS l,
         (d.y * 0.5 + (r.l + r.b) * 0.5 - r.l) * 0.25 + r.b * 0.75 AS b
  FROM r JOIN d ON d.k = r.k AND d.t = r.t + 1
),
fitted AS (SELECT d.k, d.t, d.y, p.l + p.b AS f
           FROM d JOIN r p ON p.k = d.k AND p.t = d.t - 1),
q AS (SELECT k, quantile_cont(y - f, 0.1) AS q10, quantile_cont(y - f, 0.9) AS q90
      FROM fitted GROUP BY 1),
fin AS (SELECT k, l, b FROM r QUALIFY row_number() OVER (PARTITION BY k ORDER BY t DESC) = 1)
SELECT fin.k AS event_type, CAST(h AS INT) AS h,
       {_r6('l + h * b', 'forecast')},
       {_r6('l + h * b + q10', 'lo')},
       {_r6('l + h * b + q90', 'hi')}
FROM fin JOIN q ON q.k = fin.k, unnest(generate_series(1, 7)) AS u(h)
ORDER BY event_type, h
"""


def _oracle_power_sample_size(
    z_alpha: float = 1.959964, z_beta: float = 0.841621
) -> str:
    return f"""
WITH src AS (SELECT CAST(user_id AS VARCHAR) || '#' || CAST(CAST(ts AS DATE) AS VARCHAR) AS unit,
                    event_type = 'purchase' AS conv FROM events
             WHERE event_type IS NOT NULL),
units AS (SELECT unit, max(CAST(conv AS INT)) AS s FROM src GROUP BY 1),
base AS (SELECT CAST(count(*) AS BIGINT) AS n_units, sum(s) / count(*) AS p1 FROM units),
lifts AS (SELECT unnest([0.05, 0.10, 0.20]) AS rel_lift),
j AS (SELECT rel_lift, p1, n_units, p1 * (1.0 + rel_lift) AS p2 FROM base, lifts),
c AS (SELECT rel_lift, p1, n_units, p2, (p1 + p2) / 2 AS pbar FROM j),
d AS (SELECT rel_lift, p1, n_units, p2,
             {z_alpha!r} * sqrt(2.0 * pbar * (1.0 - pbar))
               + {z_beta!r} * sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2)) AS num
      FROM c)
SELECT {_r6('rel_lift', 'rel_lift')}, {_r6('p1', 'base_rate')}, n_units,
       CAST(CASE WHEN p2 > 0 AND p2 < 1 AND p2 <> p1
                 THEN ceil(num * num / ((p2 - p1) * (p2 - p1))) END AS BIGINT) AS n_per_arm
FROM d ORDER BY rel_lift
"""


_ORACLE_CUPED_ENGAGEMENT = f"""
WITH pu AS (SELECT user_id AS u,
                   coalesce(sum(CASE WHEN NOT (CAST(ts AS DATE) < DATE '2024-01-16') THEN value END), 0.0) AS y,
                   coalesce(sum(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16' THEN value END), 0.0) AS x
            FROM events GROUP BY 1),
m AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
      FROM pu),
s AS (SELECT (CAST(n AS DOUBLE) * sxy - sx * sy)
               / (CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx <> 0
                       THEN CAST(n AS DOUBLE) * sxx - sx * sx END) AS theta,
             sx / CAST(n AS DOUBLE) AS xbar,
             ((CAST(n AS DOUBLE) * sxy - sx * sy) * (CAST(n AS DOUBLE) * sxy - sx * sy))
               / (CASE WHEN (CAST(n AS DOUBLE) * sxx - sx * sx) <> 0
                            AND (CAST(n AS DOUBLE) * syy - sy * sy) <> 0
                       THEN (CAST(n AS DOUBLE) * sxx - sx * sx)
                            * (CAST(n AS DOUBLE) * syy - sy * sy) END) AS var_reduction
      FROM m)
SELECT CAST(u AS BIGINT) AS u, {_r6('y', 'y')}, {_r6('x', 'x')},
       {_r6('CASE WHEN theta IS NOT NULL THEN y - theta * (x - xbar) ELSE y END', 'y_adj')},
       {_r6('theta', 'theta')}, {_r6('var_reduction', 'var_reduction')}
FROM pu, s ORDER BY u
"""


_ORACLE_WOE_IV = f"""
WITH src AS (SELECT CASE WHEN value < 5 THEN 'lo' WHEN value < 20 THEN 'mid' ELSE 'hi' END AS bin,
                    CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS lbl
             FROM events WHERE event_type IS NOT NULL),
cells AS (SELECT bin, count(*) AS n, sum(lbl) AS g0, sum(1.0 - lbl) AS b0 FROM src GROUP BY 1),
t AS (SELECT bin, n, g0, b0, g0 + 0.5 AS g, b0 + 0.5 AS b,
             sum(g0 + 0.5) OVER () AS tg, sum(b0 + 0.5) OVER () AS tb
      FROM cells)
SELECT bin AS band, CAST(n AS BIGINT) AS n, CAST(g0 AS BIGINT) AS n_good,
       CAST(b0 AS BIGINT) AS n_bad,
       {_r6('ln(g / tg / (b / tb))', 'woe')},
       {_r6('(g / tg - b / tb) * ln(g / tg / (b / tb))', 'iv_term')}
FROM t ORDER BY band
"""


_ORACLE_OLS_PRICE_MODEL = f"""
WITH m AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                  sum(CAST(l_quantity AS DOUBLE)) AS su,
                  sum(CAST(l_discount AS DOUBLE)) AS sv,
                  sum(CAST(l_extendedprice AS DOUBLE)) AS st,
                  sum(CAST(l_quantity AS DOUBLE) * CAST(l_quantity AS DOUBLE)) AS suu,
                  sum(CAST(l_discount AS DOUBLE) * CAST(l_discount AS DOUBLE)) AS svv,
                  sum(CAST(l_quantity AS DOUBLE) * CAST(l_discount AS DOUBLE)) AS suv,
                  sum(CAST(l_quantity AS DOUBLE) * CAST(l_extendedprice AS DOUBLE)) AS sut,
                  sum(CAST(l_discount AS DOUBLE) * CAST(l_extendedprice AS DOUBLE)) AS svt,
                  sum(CAST(l_extendedprice AS DOUBLE) * CAST(l_extendedprice AS DOUBLE)) AS stt
           FROM lineitem),
d AS (SELECT m.*,
  suu * (svv * n - sv * sv) - suv * (suv * n - sv * su) + su * (suv * sv - svv * su) AS det,
  sut * (svv * n - sv * sv) - suv * (svt * n - sv * st) + su * (svt * sv - svv * st) AS det_u,
  suu * (svt * n - sv * st) - sut * (suv * n - sv * su) + su * (suv * st - svt * su) AS det_v,
  suu * (svv * st - svt * sv) - suv * (suv * st - svt * su) + sut * (suv * sv - svv * su) AS det_0
  FROM m),
b AS (SELECT d.*,
             det_u / (CASE WHEN det <> 0 THEN det END) AS bu,
             det_v / (CASE WHEN det <> 0 THEN det END) AS bv,
             det_0 / (CASE WHEN det <> 0 THEN det END) AS b0
      FROM d)
SELECT CAST(n AS BIGINT) AS n, {_r6('bu', 'beta_qty')}, {_r6('bv', 'beta_disc')},
       {_r6('b0', 'beta0')},
       {_r6('1.0 - (stt - (bu * sut + bv * svt + b0 * st)) / (CASE WHEN stt - st * st / n <> 0 THEN stt - st * st / n END)', 'r2')}
FROM b
"""


_ORACLE_CALIBRATION_ERROR = f"""
WITH src AS (SELECT least(0.999, greatest(0.0, value / 100.0)) AS p,
                    CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y
             FROM events WHERE event_type IS NOT NULL),
per AS (SELECT least(9, CAST(floor(p * 10) AS INT)) AS bin,
               count(*) AS nb, avg(p) AS conf, avg(y) AS rate,
               sum((p - y) * (p - y)) AS sq
        FROM src GROUP BY 1),
tot AS (SELECT CAST(sum(nb) AS BIGINT) AS n,
               sum(nb * abs(rate - conf)) / sum(nb) AS ece,
               sum(sq) / sum(nb) AS brier
        FROM per)
SELECT n, {_r6('ece', 'ece')}, {_r6('brier', 'brier')},
       CAST(bin AS INT) AS bin, CAST(nb AS BIGINT) AS n_bin,
       {_r6('conf', 'conf')}, {_r6('rate', 'rate')}
FROM tot, per ORDER BY bin
"""


_ORACLE_RANK_SUM_TEST = f"""
WITH src AS (SELECT o_totalprice AS v,
                    CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'hi' ELSE 'lo' END AS arm
             FROM orders WHERE o_totalprice IS NOT NULL),
cnt AS (SELECT v, sum(CASE WHEN arm = 'hi' THEN 1 ELSE 0 END) AS da,
               sum(CASE WHEN arm = 'lo' THEN 1 ELSE 0 END) AS db
        FROM src GROUP BY 1),
rk AS (SELECT v, da, db, da + db AS c,
              sum(da + db) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       FROM cnt),
agg AS (SELECT CAST(sum(da) AS BIGINT) AS n_a, CAST(sum(db) AS BIGINT) AS n_b,
               CAST(sum(CAST(da AS DECIMAL(19,0)) * CAST(cum AS DECIMAL(19,0))) AS DOUBLE)
                 - CAST(sum(CAST(da AS DECIMAL(19,0)) * CAST(c - 1 AS DECIMAL(19,0))) AS DOUBLE) / 2.0 AS r_a,
               CAST(sum(CAST(c AS DECIMAL(13,0)) * CAST(c - 1 AS DECIMAL(13,0)) * CAST(c + 1 AS DECIMAL(13,0))) AS DOUBLE) AS tie_term
        FROM rk),
s AS (SELECT n_a, n_b, r_a, tie_term,
             CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb FROM agg),
u AS (SELECT n_a, n_b, na, nb, tie_term,
             r_a - na * (na + 1.0) / 2.0 AS u_a,
             na * nb / 2.0 AS mu,
             na * nb / 12.0 * ((na + nb + 1.0) - tie_term / ((na + nb) * (na + nb - 1.0))) AS var_u
      FROM s)
SELECT n_a, n_b, {_r6('u_a', 'u_a')},
       {_r6('''CASE WHEN na > 0 AND nb > 0 AND na + nb > 1
                 THEN (u_a - mu) / sqrt(CASE WHEN var_u > 0 THEN var_u END) END''', 'z')}
FROM u
"""


_ORACLE_SPEARMAN_QTY_PRICE = f"""
WITH src AS (SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem
             WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
rx AS (SELECT v, CAST(cum AS DOUBLE) - CAST(c - 1 AS DOUBLE) / 2.0 AS r FROM
              (SELECT v, c, sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
               FROM (SELECT x AS v, count(*) AS c FROM src GROUP BY 1))),
ry AS (SELECT v, CAST(cum AS DOUBLE) - CAST(c - 1 AS DOUBLE) / 2.0 AS r FROM
              (SELECT v, c, sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
               FROM (SELECT y AS v, count(*) AS c FROM src GROUP BY 1))),
j AS (SELECT rx.r AS rxr, ry.r AS ryr
      FROM src l JOIN rx ON rx.v = l.x JOIN ry ON ry.v = l.y),
agg AS (SELECT count(*) AS n, sum(rxr) AS sx, sum(ryr) AS sy,
               sum(rxr * rxr) AS sxx, sum(ryr * ryr) AS syy, sum(rxr * ryr) AS sxy
        FROM j)
SELECT CAST(n AS BIGINT) AS n,
       {_r6('''(CAST(n AS DOUBLE) * sxy - sx * sy)
          / (CASE WHEN sqrt(CAST(n AS DOUBLE) * sxx - sx * sx) * sqrt(CAST(n AS DOUBLE) * syy - sy * sy) = 0
                  THEN NULL
                  ELSE sqrt(CAST(n AS DOUBLE) * sxx - sx * sx) * sqrt(CAST(n AS DOUBLE) * syy - sy * sy) END)''', 'rho')}
FROM agg
"""


_ORACLE_KM_CONVERSION = f"""
WITH per AS (SELECT user_id, min(ts) AS t0, max(ts) AS t_last,
                    min(CASE WHEN event_type = 'purchase' AND value > 90 THEN ts END) AS t_evt
             FROM events GROUP BY 1),
dur AS (SELECT epoch_us(coalesce(t_evt, t_last)) - epoch_us(t0) AS t,
               CASE WHEN t_evt IS NOT NULL THEN 1 ELSE 0 END AS ev
        FROM per),
pt AS (SELECT t, sum(ev) AS d, sum(1 - ev) AS c FROM dur WHERE t IS NOT NULL GROUP BY 1),
rk AS (SELECT t, d, c,
              sum(d + c) OVER () - coalesce(sum(d + c) OVER (ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
       FROM pt),
st AS (SELECT t, d, c, n_risk,
              CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS hazard,
              sum(CASE WHEN d > 0 AND d < n_risk
                       THEN ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))
                       ELSE 0.0 END) OVER w AS lnS,
              max(CASE WHEN d = n_risk AND d > 0 THEN 1 ELSE 0 END) OVER w AS zero_seen
       FROM rk
       WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT t, CAST(n_risk AS BIGINT) AS n_risk, CAST(d AS BIGINT) AS d,
       CAST(c AS BIGINT) AS censored, {_r6('hazard', 'hazard')},
       {_r6('CASE WHEN zero_seen = 1 THEN 0.0 ELSE exp(lnS) END', 'survival')}
FROM st ORDER BY t
"""


_ORACLE_LOGRANK_ARMS = f"""
WITH per AS (SELECT user_id, min(ts) AS t0, max(ts) AS t_last,
                    min(CASE WHEN event_type = 'purchase' AND value > 90 THEN ts END) AS t_evt
             FROM events GROUP BY 1),
dur AS (SELECT epoch_us(coalesce(t_evt, t_last)) - epoch_us(t0) AS t,
               CASE WHEN t_evt IS NOT NULL THEN 1 ELSE 0 END AS ev,
               CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS g
        FROM per),
pt AS (SELECT t, sum(CASE WHEN g = 'a' THEN ev ELSE 0 END) AS d1, sum(ev) AS d,
              sum(CASE WHEN g = 'a' THEN 1 ELSE 0 END) AS m1, count(*) AS m
       FROM dur WHERE t IS NOT NULL GROUP BY 1),
rk AS (SELECT t, d1, d,
              sum(m1) OVER () - coalesce(sum(m1) OVER wp, 0) AS n1,
              sum(m) OVER () - coalesce(sum(m) OVER wp, 0) AS n,
              sum(m1) OVER () AS tot1, sum(m) OVER () AS tot
       FROM pt
       WINDOW wp AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
terms AS (SELECT d1, d, n1, n, tot1, tot,
                 CAST(d AS DOUBLE) * (CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE)) AS e1,
                 CASE WHEN n > 1
                      THEN CAST(d AS DOUBLE) * (CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE))
                           * (1.0 - CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE))
                           * CAST(n - d AS DOUBLE) / (CAST(n AS DOUBLE) - 1.0)
                      ELSE 0.0 END AS v
          FROM rk),
agg AS (SELECT CAST(max(tot1) AS BIGINT) AS n_a,
               CAST(max(tot) - max(tot1) AS BIGINT) AS n_b,
               CAST(sum(d1) AS DOUBLE) AS observed_a,
               sum(e1) AS expected_a,
               sum(CAST(d1 AS DOUBLE) - e1) AS ome, sum(v) AS vv
        FROM terms)
SELECT n_a, n_b, {_r6('observed_a', 'observed_a')}, {_r6('expected_a', 'expected_a')},
       {_r6('ome * ome / (CASE WHEN vv > 0 THEN vv END)', 'chi2')}
FROM agg
"""


_ORACLE_EVENTS_SESSION_NATIVE = f"""
WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events),
g AS (SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
                       OR ts_us - lag(ts_us) OVER w >= {30 * 60 * 1_000_000}
                     THEN 1 ELSE 0 END AS new_sess
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
s AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                     ROWS UNBOUNDED PRECEDING) AS session_id
      FROM g)
SELECT CAST(user_id AS BIGINT) AS user_id, CAST(count(*) AS BIGINT) AS n_events,
       min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
       {_r6('round(sum(value), 6)', 'session_value')}
FROM s GROUP BY user_id, session_id
ORDER BY user_id, session_start_us
"""


_ORACLE_KM_BY_ARM = f"""
WITH per AS (SELECT user_id, min(ts) AS t0, max(ts) AS t_last,
                    min(CASE WHEN event_type = 'purchase' AND value > 90 THEN ts END) AS t_evt
             FROM events GROUP BY 1),
dur AS (SELECT epoch_us(coalesce(t_evt, t_last)) - epoch_us(t0) AS t,
               CASE WHEN t_evt IS NOT NULL THEN 1 ELSE 0 END AS ev,
               CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS g
        FROM per),
pt AS (SELECT g, t, sum(ev) AS d, sum(1 - ev) AS c FROM dur WHERE t IS NOT NULL GROUP BY 1, 2),
rk AS (SELECT g, t, d, c,
              sum(d + c) OVER (PARTITION BY g)
                - coalesce(sum(d + c) OVER (PARTITION BY g ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
       FROM pt),
st AS (SELECT g, t, d, c, n_risk,
              CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS hazard,
              sum(CASE WHEN d > 0 AND d < n_risk
                       THEN ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))
                       ELSE 0.0 END) OVER w AS lnS,
              max(CASE WHEN d = n_risk AND d > 0 THEN 1 ELSE 0 END) OVER w AS zero_seen
       FROM rk
       WINDOW w AS (PARTITION BY g ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT g AS arm, t, CAST(n_risk AS BIGINT) AS n_risk, CAST(d AS BIGINT) AS d,
       CAST(c AS BIGINT) AS censored, {_r6('hazard', 'hazard')},
       {_r6('CASE WHEN zero_seen = 1 THEN 0.0 ELSE exp(lnS) END', 'survival')}
FROM st ORDER BY arm, t
"""


_ORACLE_MODEL_AUC = f"""
WITH src AS (SELECT value AS v,
                    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
             FROM events WHERE value IS NOT NULL
               AND event_type IS NOT NULL),
cnt AS (SELECT v, sum(y) AS dp, count(*) AS c FROM src GROUP BY 1),
rk AS (SELECT v, dp, c,
              sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       FROM cnt),
agg AS (SELECT CAST(sum(dp) AS BIGINT) AS np,
               CAST(sum(c) - sum(dp) AS BIGINT) AS nn,
               CAST(sum(CAST(dp AS DECIMAL(19,0))
                        * (2 * CAST(cum AS DECIMAL(19,0))
                           - CAST(c - 1 AS DECIMAL(19,0)))) AS DOUBLE) AS r2
        FROM rk),
res AS (SELECT np, nn,
               (r2 / 2.0 - np * (np + 1.0) / 2.0)
                 / (CASE WHEN np > 0 AND nn > 0
                         THEN CAST(np AS DOUBLE) * nn END) AS auc
        FROM agg)
SELECT np AS n_pos, nn AS n_neg, {_r6('auc', 'auc')},
       {_r6('2.0 * auc - 1.0', 'gini')}
FROM res
"""


_ORACLE_MODEL_AUC_BY_ARM = f"""
WITH src AS (SELECT CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS arm,
                    value AS v,
                    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
             FROM events WHERE value IS NOT NULL
               AND event_type IS NOT NULL),
cnt AS (SELECT arm, v, sum(y) AS dp, count(*) AS c FROM src GROUP BY 1, 2),
rk AS (SELECT arm, v, dp, c,
              sum(c) OVER (PARTITION BY arm ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       FROM cnt),
agg AS (SELECT arm, CAST(sum(dp) AS BIGINT) AS np,
               CAST(sum(c) - sum(dp) AS BIGINT) AS nn,
               CAST(sum(CAST(dp AS DECIMAL(19,0))
                        * (2 * CAST(cum AS DECIMAL(19,0))
                           - CAST(c - 1 AS DECIMAL(19,0)))) AS DOUBLE) AS r2
        FROM rk GROUP BY arm),
res AS (SELECT arm, np, nn,
               (r2 / 2.0 - np * (np + 1.0) / 2.0)
                 / (CASE WHEN np > 0 AND nn > 0
                         THEN CAST(np AS DOUBLE) * nn END) AS auc
        FROM agg)
SELECT arm, np AS n_pos, nn AS n_neg, {_r6('auc', 'auc')},
       {_r6('2.0 * auc - 1.0', 'gini')}
FROM res ORDER BY arm
"""


_ORACLE_FEATURE_MI = f"""
WITH src AS (SELECT o_orderpriority AS x, o_orderstatus AS y
             FROM orders
             WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL),
cells AS (SELECT x, y, count(*) AS c FROM src GROUP BY 1, 2),
mx AS (SELECT x, sum(c) AS cx FROM cells GROUP BY 1),
my AS (SELECT y, sum(c) AS cy FROM cells GROUP BY 1),
tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM cells),
mi AS (SELECT CAST(max(tot.n) AS BIGINT) AS n,
              sum((c / tot.n) * ln(c * tot.n / (CAST(cx AS DOUBLE) * cy))) AS mi
       FROM cells JOIN mx USING (x) JOIN my USING (y) CROSS JOIN tot),
hx AS (SELECT -sum((cx / tot.n) * ln(cx / tot.n)) AS h_x FROM mx CROSS JOIN tot),
hy AS (SELECT -sum((cy / tot.n) * ln(cy / tot.n)) AS h_y FROM my CROSS JOIN tot)
SELECT n, {_r6('mi', 'mi')}, {_r6('h_x', 'h_x')}, {_r6('h_y', 'h_y')},
       {_r6('mi / (CASE WHEN sqrt(h_x * h_y) > 0 THEN sqrt(h_x * h_y) END)', 'nmi')}
FROM mi CROSS JOIN hx CROSS JOIN hy
"""


_ORACLE_KM_CI = f"""
WITH per AS (SELECT user_id, min(ts) AS t0, max(ts) AS t_last,
                    min(CASE WHEN event_type = 'purchase' AND value > 90 THEN ts END) AS t_evt
             FROM events GROUP BY 1),
dur AS (SELECT epoch_us(coalesce(t_evt, t_last)) - epoch_us(t0) AS t,
               CASE WHEN t_evt IS NOT NULL THEN 1 ELSE 0 END AS ev
        FROM per),
pt AS (SELECT t, sum(ev) AS d, sum(1 - ev) AS c FROM dur WHERE t IS NOT NULL GROUP BY 1),
rk AS (SELECT t, d, c,
              sum(d + c) OVER () - coalesce(sum(d + c) OVER (ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
       FROM pt),
st AS (SELECT t, d, c, n_risk,
              sum(CASE WHEN d > 0 AND d < n_risk
                       THEN ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))
                       ELSE 0.0 END) OVER w AS lnS,
              max(CASE WHEN d = n_risk AND d > 0 THEN 1 ELSE 0 END) OVER w AS zero_seen,
              sum(CASE WHEN d < n_risk
                       THEN CAST(d AS DOUBLE)
                            / (CAST(n_risk AS DOUBLE) * CAST(n_risk - d AS DOUBLE))
                       ELSE 0.0 END) OVER w AS g
       FROM rk
       WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
sv AS (SELECT t, d, c, n_risk, g,
              CASE WHEN zero_seen = 1 THEN 0.0 ELSE exp(lnS) END AS s
       FROM st),
ci AS (SELECT sv.*,
              CASE WHEN s = 0 THEN 0.0 ELSE s * sqrt(g) END AS se,
              CASE WHEN s > 0 AND s < 1 THEN sqrt(g) / abs(ln(s)) END AS sell
       FROM sv)
SELECT t, CAST(n_risk AS BIGINT) AS n_risk, CAST(d AS BIGINT) AS d,
       CAST(c AS BIGINT) AS censored, {_r6('s', 'survival')}, {_r6('se', 'se')},
       {_r6("CASE WHEN s = 0 THEN 0.0 ELSE pow(s, exp(1.959964 * sell)) END", 'lo')},
       {_r6("CASE WHEN s = 0 THEN 0.0 ELSE pow(s, exp(-1.959964 * sell)) END", 'hi')}
FROM ci ORDER BY t
"""


def _oracle_rmst(tau: int) -> str:
    return f"""
WITH per AS (SELECT user_id, min(ts) AS t0, max(ts) AS t_last,
                    min(CASE WHEN event_type = 'purchase' AND value > 90 THEN ts END) AS t_evt
             FROM events GROUP BY 1),
dur AS (SELECT epoch_us(coalesce(t_evt, t_last)) - epoch_us(t0) AS t,
               CASE WHEN t_evt IS NOT NULL THEN 1 ELSE 0 END AS ev
        FROM per),
pt AS (SELECT t, sum(ev) AS d, sum(1 - ev) AS c FROM dur WHERE t IS NOT NULL GROUP BY 1),
rk AS (SELECT t, d, c,
              sum(d + c) OVER () - coalesce(sum(d + c) OVER (ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
       FROM pt),
st AS (SELECT t, d, n_risk,
              sum(CASE WHEN d > 0 AND d < n_risk
                       THEN ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))
                       ELSE 0.0 END) OVER w AS lnS,
              max(CASE WHEN d = n_risk AND d > 0 THEN 1 ELSE 0 END) OVER w AS zero_seen,
              row_number() OVER (ORDER BY t) AS rn
       FROM rk
       WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
step AS (SELECT rn, d, n_risk,
                CASE WHEN zero_seen = 1 THEN 0.0 ELSE exp(lnS) END AS s,
                least(t, {tau}) AS ct,
                coalesce(least(lead(t) OVER (ORDER BY t), {tau}), {tau}) AS nxt
         FROM st),
agg AS (SELECT sum(CASE WHEN rn = 1 THEN CAST(ct AS DOUBLE) ELSE 0.0 END
                  + s * greatest(CAST(0.0 AS DOUBLE), CAST(nxt AS DOUBLE) - ct)) AS rmst,
               CAST(sum(CASE WHEN rn = 1 THEN n_risk ELSE 0 END) AS BIGINT) AS n,
               CAST(sum(d) AS BIGINT) AS n_events
        FROM step)
SELECT CAST({tau} AS BIGINT) AS tau, {_r6('rmst / 1e12', 'rmst_e12')}, n, n_events
FROM agg
"""


_ORACLE_KS_DRIFT_ADJUSTED = f"""
WITH cnt AS (SELECT n_chars AS v, source AS g, count(*) AS c FROM documents
             WHERE n_chars IS NOT NULL GROUP BY 1, 2),
vals AS (SELECT DISTINCT v FROM cnt),
grps AS (SELECT DISTINCT g FROM cnt),
spine AS (SELECT v, g FROM vals, grps),
cdf0 AS (SELECT s.v, s.g,
                sum(coalesce(c.c, 0)) OVER (PARTITION BY s.g ORDER BY s.v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         FROM spine s LEFT JOIN cnt c ON c.v = s.v AND c.g = s.g),
cdf AS (SELECT v, g, cum, max(cum) OVER (PARTITION BY g) AS n FROM cdf0),
agg AS (SELECT a.g AS group_a, b.g AS group_b,
               CAST(max(a.n) AS BIGINT) AS n_a, CAST(max(b.n) AS BIGINT) AS n_b,
               max(abs(a.cum / (CASE WHEN a.n > 0 THEN a.n END)
                       - b.cum / (CASE WHEN b.n > 0 THEN b.n END))) AS d_stat
        FROM cdf a JOIN cdf b ON a.v = b.v AND a.g < b.g
        GROUP BY 1, 2),
z AS (SELECT agg.*, d_stat * sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / (n_a + n_b)) AS ks_z
      FROM agg),
pv AS (SELECT group_a, group_b, n_a, n_b, d_stat,
              least(CAST(1.0 AS DOUBLE), 2.0 * exp(-2.0 * ks_z * ks_z)) AS p
       FROM z),
bh AS (SELECT pv.*, count(*) OVER () AS m,
              row_number() OVER (ORDER BY p) AS i
       FROM pv),
adj AS (SELECT bh.*,
               least(CAST(1.0 AS DOUBLE),
                     min(p * m / i) OVER (ORDER BY p DESC
                       RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS p_adj
        FROM bh)
SELECT group_a, group_b, n_a, n_b, {_r6('d_stat', 'd_stat')},
       {_r6('p', 'p_approx')}, {_r6('p_adj', 'p_adj')}
FROM adj ORDER BY group_a, group_b
"""


_ORACLE_MODEL_PR_AUC = f"""
WITH src AS (SELECT value AS v,
                    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
             FROM events WHERE value IS NOT NULL
               AND event_type IS NOT NULL),
cnt AS (SELECT v, sum(y) AS dp, count(*) AS c FROM src GROUP BY 1),
rk AS (SELECT v, dp, c,
              sum(dp) OVER () - (sum(dp) OVER w - dp) AS tp,
              sum(c) OVER () - (sum(c) OVER w - c) AS pp,
              sum(dp) OVER () AS np, sum(c) OVER () AS nt
       FROM cnt
       WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
agg AS (SELECT CAST(max(np) AS BIGINT) AS n_pos,
               CAST(max(nt) - max(np) AS BIGINT) AS n_neg,
               sum(CAST(dp AS DOUBLE) * CAST(tp AS DOUBLE) / CAST(pp AS DOUBLE)) AS s
        FROM rk)
SELECT n_pos, n_neg,
       {_r6('s / (CASE WHEN n_pos > 0 THEN CAST(n_pos AS DOUBLE) END)', 'ap')},
       {_r6('CAST(n_pos AS DOUBLE) / (CASE WHEN n_pos + n_neg > 0 THEN CAST(n_pos + n_neg AS DOUBLE) END)', 'baseline')}
FROM agg
"""


def _oracle_rater_kappa() -> str:
    """Kappa over the SAME lang_id prediction SQL (nested CTE), joined
    to the stored gold label — the mutual_information cell/marginal
    skeleton with the diagonal/chance-agreement arithmetic."""
    return f"""
WITH pred AS ({_oracle_lang_id()}),
src AS (SELECT d.lang AS a, p.pred_lang AS b
        FROM documents d JOIN pred p USING (doc_id)
        WHERE d.lang IS NOT NULL AND p.pred_lang IS NOT NULL),
cells AS (SELECT a, b, count(*) AS c FROM src GROUP BY 1, 2),
tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM cells),
po AS (SELECT CAST(max(tot.n) AS BIGINT) AS n,
              sum(CASE WHEN a = b THEN c ELSE 0 END) / max(tot.n) AS p_observed
       FROM cells CROSS JOIN tot),
ma AS (SELECT a, sum(c) AS ca FROM cells GROUP BY 1),
mb AS (SELECT b, sum(c) AS cb FROM cells GROUP BY 1),
pe AS (SELECT coalesce(sum((ca / tot.n) * (cb / tot.n)), 0.0) AS p_expected
       FROM ma JOIN mb ON ma.a = mb.b CROSS JOIN tot)
SELECT n, {_r6('p_observed', 'p_observed')}, {_r6('p_expected', 'p_expected')},
       {_r6('(p_observed - p_expected) / (CASE WHEN p_expected <> 1.0 THEN 1.0 - p_expected END)', 'kappa')}
FROM po CROSS JOIN pe
"""


_ORACLE_CMH_STRATA = f"""
WITH src AS (SELECT event_type AS k,
                    CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS arm,
                    CASE WHEN value > 50 THEN 1 ELSE 0 END AS hit
             FROM events
             WHERE event_type IS NOT NULL AND value IS NOT NULL),
per AS (SELECT k,
               CAST(sum(CASE WHEN arm = 'a' THEN hit ELSE 0 END) AS DOUBLE) AS a,
               CAST(sum(CASE WHEN arm = 'a' THEN 1 - hit ELSE 0 END) AS DOUBLE) AS b,
               CAST(sum(CASE WHEN arm = 'b' THEN hit ELSE 0 END) AS DOUBLE) AS c,
               CAST(sum(CASE WHEN arm = 'b' THEN 1 - hit ELSE 0 END) AS DOUBLE) AS d
        FROM src GROUP BY 1),
terms AS (SELECT a, b, c, d, a + b + c + d AS n,
                 (a + b) * (a + c) / (a + b + c + d) AS e,
                 CASE WHEN a + b + c + d > 1
                      THEN (a + b) * (c + d) * (a + c) * (b + d)
                           / ((a + b + c + d) * (a + b + c + d) * (a + b + c + d - 1))
                      ELSE 0.0 END AS v
          FROM per),
agg AS (SELECT CAST(sum(n) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS n_strata,
               sum(a) AS sa, sum(e) AS se, sum(v) AS sv,
               sum(a * d / n) AS ad, sum(b * c / n) AS bc
        FROM terms)
SELECT n, n_strata,
       {_r6('(sa - se) * (sa - se) / (CASE WHEN sv > 0 THEN sv END)', 'chi2')},
       {_r6('ad / (CASE WHEN bc > 0 THEN bc END)', 'or_mh')}
FROM agg
"""


_ORACLE_VALUE_WASSERSTEIN = f"""
WITH src AS (SELECT o_totalprice AS v,
                    CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'hi' ELSE 'lo' END AS arm
             FROM orders WHERE o_totalprice IS NOT NULL),
cnt AS (SELECT CAST(v AS DOUBLE) AS v,
               sum(CASE WHEN arm = 'hi' THEN 1 ELSE 0 END) AS da,
               sum(CASE WHEN arm = 'lo' THEN 1 ELSE 0 END) AS db
        FROM src GROUP BY 1),
c AS (SELECT v, sum(da) OVER w AS cda, sum(db) OVER w AS cdb,
             sum(da) OVER () AS ta, sum(db) OVER () AS tb,
             lead(v) OVER (ORDER BY v) AS nv
      FROM cnt
      WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT CAST(max(ta) AS BIGINT) AS n_a, CAST(max(tb) AS BIGINT) AS n_b,
       {_r6("sum(abs(cda * 1.0 / (CASE WHEN ta > 0 THEN ta END) - cdb * 1.0 / (CASE WHEN tb > 0 THEN tb END)) * (nv - v))", 'w1')}
FROM c
"""


_ORACLE_CONFORMAL_QHAT = f"""
WITH s AS (SELECT CAST(value AS DOUBLE) AS v FROM events
           WHERE value IS NOT NULL AND user_id %% 2 = 0),
nn AS (SELECT count(*) AS n FROM s),
kk AS (SELECT n, CAST(ceil((n + 1) * (1 - CAST(0.1 AS DOUBLE))) AS BIGINT) AS k
       FROM nn),
r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM s)
SELECT kk.n, kk.k, {_r6('CAST(0.1 AS DOUBLE)', 'alpha')},
       {_r6('min(CASE WHEN r.rn >= kk.k THEN r.v END)', 'qhat')}
FROM kk LEFT JOIN r ON TRUE GROUP BY kk.n, kk.k
""".replace("%%", "%")

_ORACLE_CONFORMAL_COVERAGE = f"""
WITH cal AS (SELECT CAST(value AS DOUBLE) AS v FROM events
             WHERE value IS NOT NULL AND user_id %% 2 = 0),
nn AS (SELECT count(*) AS n FROM cal),
kk AS (SELECT n, CAST(ceil((n + 1) * (1 - CAST(0.1 AS DOUBLE))) AS BIGINT) AS k
       FROM nn),
r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM cal),
q AS (SELECT kk.n AS n_cal, min(CASE WHEN r.rn >= kk.k THEN r.v END) AS qhat
      FROM kk LEFT JOIN r ON TRUE GROUP BY kk.n),
t AS (SELECT CAST(value AS DOUBLE) AS tv FROM events
      WHERE value IS NOT NULL AND user_id %% 2 = 1),
a AS (SELECT count(*) AS n_test,
             avg(CASE WHEN q.qhat IS NULL THEN 1
                      WHEN t.tv <= q.qhat THEN 1 ELSE 0 END) AS cov
      FROM t CROSS JOIN q)
SELECT q.n_cal, a.n_test, {_r6('CAST(0.1 AS DOUBLE)', 'alpha')},
       {_r6('q.qhat', 'qhat')},
       {_r6('CASE WHEN q.n_cal = 0 THEN NULL ELSE a.cov END', 'coverage')},
       {_r6('1 - CAST(0.1 AS DOUBLE)', 'target')}
FROM a CROSS JOIN q
""".replace("%%", "%")

_ORACLE_CONFORMAL_GROUP_QHAT = f"""
WITH s AS (SELECT event_type AS g, CAST(value AS DOUBLE) AS v FROM events
           WHERE value IS NOT NULL),
r AS (SELECT g, v,
             row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
             count(*) OVER (PARTITION BY g) AS n
      FROM s)
SELECT g AS "group", CAST(max(n) AS BIGINT) AS n,
       CAST(max(ceil((n + 1) * (1 - CAST(0.2 AS DOUBLE)))) AS BIGINT) AS k,
       {_r6('CAST(0.2 AS DOUBLE)', 'alpha')},
       {_r6('min(CASE WHEN rn >= CAST(ceil((n + 1) * (1 - CAST(0.2 AS DOUBLE))) AS BIGINT) THEN v END)', 'qhat')}
FROM r GROUP BY g
"""

_ORACLE_CONFORMAL_GROUP_COVERAGE = f"""
WITH cal AS (SELECT event_type AS g, CAST(value AS DOUBLE) AS v FROM events
             WHERE value IS NOT NULL AND user_id %% 2 = 0),
r AS (SELECT g, v,
             row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
             count(*) OVER (PARTITION BY g) AS n
      FROM cal),
q AS (SELECT g, CAST(max(n) AS BIGINT) AS n_cal,
             min(CASE WHEN rn >= CAST(ceil((n + 1) * (1 - CAST(0.2 AS DOUBLE))) AS BIGINT)
                      THEN v END) AS qhat
      FROM r GROUP BY g),
t AS (SELECT event_type AS g, CAST(value AS DOUBLE) AS tv FROM events
      WHERE value IS NOT NULL AND user_id %% 2 = 1)
SELECT t.g AS "group", max(q.n_cal) AS n_cal, count(*) AS n_test,
       {_r6('CAST(0.2 AS DOUBLE)', 'alpha')},
       {_r6('max(q.qhat)', 'qhat')},
       {_r6("avg(CASE WHEN q.n_cal IS NULL THEN NULL WHEN q.qhat IS NULL THEN 1 WHEN t.tv <= q.qhat THEN 1 ELSE 0 END)", 'coverage')},
       {_r6('1 - CAST(0.2 AS DOUBLE)', 'target')}
FROM t LEFT JOIN q ON t.g IS NOT DISTINCT FROM q.g
GROUP BY t.g
""".replace("%%", "%")

_ORACLE_SCORE_PSI = f"""
WITH ev AS (SELECT user_id,
                   least(9, CAST(floor(value / 50) AS INT)) AS bucket
            FROM events),
rc AS (SELECT bucket AS b, count(*) AS cr FROM ev WHERE user_id % 2 = 0 GROUP BY 1),
lc AS (SELECT bucket AS b, count(*) AS cl FROM ev WHERE user_id % 2 = 1 GROUP BY 1),
j AS (SELECT coalesce(cr, 0) AS cr, coalesce(cl, 0) AS cl
      FROM rc FULL OUTER JOIN lc ON rc.b IS NOT DISTINCT FROM lc.b),
tot AS (SELECT sum(cr) AS nr, sum(cl) AS nl FROM j),
terms AS (SELECT CASE WHEN tot.nr > 0
                      THEN greatest(cr * 1.0 / tot.nr, 1e-6) END AS p,
                 CASE WHEN tot.nl > 0
                      THEN greatest(cl * 1.0 / tot.nl, 1e-6) END AS q,
                 tot.nr, tot.nl
          FROM j CROSS JOIN tot)
SELECT CAST(max(nr) AS BIGINT) AS n_ref, CAST(max(nl) AS BIGINT) AS n_live,
       {_r6('sum((p - q) * ln(p / q))', 'psi_value')}
FROM terms
"""


_ORACLE_SOURCE_TOKEN_JS = f"""
WITH toks AS (SELECT source, unnest({_SQ_TOKS}) AS tok
              FROM documents WHERE source IN ('src2', 'src3')),
cnt AS (SELECT tok,
               sum(CASE WHEN source = 'src2' THEN 1 ELSE 0 END) AS ca,
               sum(CASE WHEN source = 'src3' THEN 1 ELSE 0 END) AS cb
        FROM toks WHERE tok IS NOT NULL GROUP BY 1),
tot AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM cnt),
terms AS (SELECT ca * 1.0 / (CASE WHEN tot.na > 0 THEN tot.na END) AS p,
                 cb * 1.0 / (CASE WHEN tot.nb > 0 THEN tot.nb END) AS q,
                 tot.na, tot.nb
          FROM cnt CROSS JOIN tot),
agg AS (SELECT CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
               CAST(count(*) AS BIGINT) AS n_items,
               sum(CASE WHEN p > 0 THEN p * ln(p / ((p + q) / 2)) / 2 ELSE 0.0 END
                   + CASE WHEN q > 0 THEN q * ln(q / ((p + q) / 2)) / 2 ELSE 0.0 END) AS js
        FROM terms)
SELECT n_a, n_b, n_items, {_r6('js', 'js')}, {_r6('js / ln(2)', 'js_norm')}
FROM agg
"""
