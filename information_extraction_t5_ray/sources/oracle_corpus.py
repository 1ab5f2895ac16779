"""DuckDB oracle SQL for the corpus-curation pipelines.

Each function returns the ANSI-SQL equivalent of the matching
``pipelines/corpus.q_*`` query (the driver runs both sides at sf=0.01
and hash-compares).  Constants are imported FROM the pipeline module so
the two sides cannot drift.

Float discipline: every oracle-checked output column is integral, a
string, or a timestamp; threshold tests are kept in integer arithmetic
(e.g. Jaccard >= 1/2 as ``3*inter >= |A|+|B|``), except cosine
similarities where the threshold sits far from the data's float noise
(copies at cos=1.0 vs a background max of ~0.51).
"""

from __future__ import annotations

from ..pipelines.corpus import (
    ANN_K,
    ANN_NUM_QUERIES,
    COSINE_THRESHOLD,
    EMB_OFF,
    EXACT_OFF,
    JACCARD_K,
    JACCARD_MAX_DF,
    NEAR_OFF,
)
from ..stages.textstats import LANG_MARKERS, LANG_ORDER

# corpus with injected duplicates — mirror of pipelines/corpus.dup_corpus
DUP_CORPUS_CTE = f"""
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {EXACT_OFF}, text FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id + {NEAR_OFF},
         array_to_string(
           list_slice(regexp_extract_all(text, '\\S+'), 1,
                      greatest(1, 3 * len(regexp_extract_all(text, '\\S+')) // 4)),
           ' ')
  FROM documents WHERE doc_id % 4 = 0
)"""

EMB_CORPUS_CTE = f"""
corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + {EMB_OFF}, embedding FROM embeddings WHERE vec_id % 5 = 0
)"""


def exact_dedup_sql() -> str:
    return f"""WITH {DUP_CORPUS_CTE}
SELECT min(doc_id) AS doc_id, count(*) AS n_dups
FROM corpus GROUP BY md5(text)"""


def streaming_dedup_sql() -> str:
    """Survivor CONTENT set of the second streaming ingest: the index
    already holds every base-document text, so the admissions are
    exactly the distinct dup-corpus texts absent from ``documents``
    (one row per distinct new content; the carrying doc_id is arrival
    order and deliberately not projected).  NOT EXISTS, not NOT IN: a
    single NULL base text would make NOT IN yield zero rows while the
    engine's index still admits new texts (ADVICE r4)."""
    return f"""WITH {DUP_CORPUS_CTE}
SELECT DISTINCT text FROM corpus c
WHERE NOT EXISTS (SELECT 1 FROM documents d WHERE d.text = c.text)"""


def _jaccard_pair_ctes(
    max_df: int | None = JACCARD_MAX_DF,
    corpus_cte: str | None = DUP_CORPUS_CTE,
) -> str:
    """CTE chain ``corpus .. jpairs`` — the exact Jaccard pair set with
    an optional df cap (shared by the pair, cluster and transitive-apply
    oracles; ``max_df=None`` = TRUE uncapped Jaccard, the ground truth
    for the verified pair path).  ``corpus_cte=None`` emits only the
    ``toks .. jpairs`` tail for callers that define ``corpus``
    themselves (the composed curation oracle)."""
    k = JACCARD_K
    df_filter = f"HAVING count(*) <= {max_df}" if max_df is not None else ""
    prefix = f"{corpus_cte},\n" if corpus_cte is not None else ""
    return f"""{prefix}toks AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM corpus
),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, greatest(len(w) - {k - 2}, 1)),
           i -> {" || ' ' || ".join(f"w[i+{j}]" if j else "w[i]" for j in range(k))}
         ))) AS s
  FROM toks WHERE len(w) >= {k}
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
df AS (SELECT s FROM sh GROUP BY s {df_filter}),
sh2 AS (SELECT sh.doc_id, sh.s FROM sh JOIN df USING (s)),
pairs AS (
  SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS inter
  FROM sh2 a JOIN sh2 b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jpairs AS (
  SELECT i, j
  FROM pairs
  JOIN sizes si ON si.doc_id = pairs.i
  JOIN sizes sj ON sj.doc_id = pairs.j
  WHERE 3 * inter >= si.sz + sj.sz
)"""


def jaccard_dupes_sql() -> str:
    return f"WITH {_jaccard_pair_ctes()}\nSELECT i, j FROM jpairs"


def jaccard_dupes_verified_sql() -> str:
    """TRUE (uncapped) Jaccard pairs — the verified pair path must match
    this even though it runs with a deliberately tiny df cap."""
    return f"WITH {_jaccard_pair_ctes(max_df=None)}\nSELECT i, j FROM jpairs"


_CC_CTES = """edges AS (
  SELECT i AS u, j AS v FROM jpairs UNION SELECT j, i FROM jpairs
),
cc AS (
  SELECT u AS node, u AS label FROM edges
  UNION
  SELECT e.u, cc.label FROM edges e JOIN cc ON cc.node = e.v
),
labels AS (SELECT node, min(label) AS cluster FROM cc GROUP BY node)"""


def dedup_clusters_sql() -> str:
    """Min-reachable label per pair-graph node (transitive closure of
    the exact-Jaccard pairs) — ground truth for the large-star /
    small-star contraction in ``stages/dedup.connected_components``."""
    return f"""WITH RECURSIVE {_jaccard_pair_ctes()},
{_CC_CTES}
SELECT node AS doc_id, cluster AS cluster_id FROM labels"""


def dedup_apply_tc_sql() -> str:
    """Transitive keep-first survivors: every corpus doc that is either
    pairless or its component's minimum id."""
    return f"""WITH RECURSIVE {_jaccard_pair_ctes()},
{_CC_CTES}
SELECT c.doc_id
FROM corpus c LEFT JOIN labels l ON l.node = c.doc_id
WHERE l.node IS NULL OR l.cluster = c.doc_id"""


def curate_corpus_sql() -> str:
    """Composed curation funnel: quality gate -> exact keep-first dedup
    -> transitive near-dedup over the dup corpus.  One recursive-CTE
    oracle for ``q_curate_corpus``'s three chained stages."""
    from ..stages.textstats import (
        QL_MAX_TOKENS,
        QL_MIN_STOPWORDS,
        QL_MIN_TOKENS,
        QL_STOPWORDS,
    )

    stop_sum = " + ".join(_marker_count_sql(m) for m in QL_STOPWORDS)
    corpus0 = DUP_CORPUS_CTE.replace("corpus AS (", "corpus0 AS (", 1)
    curated = f"""{corpus0},
padded AS (
  SELECT doc_id, text, ' ' || lower(text) || ' ' AS p FROM corpus0
),
sig AS (
  SELECT doc_id, text,
    len(regexp_extract_all(text, '\\S+')) AS n_tokens,
    len(regexp_extract_all(text, '\\S')) AS n_word_chars,
    {stop_sum} AS n_stop,
    len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct
  FROM padded
),
quality AS (
  SELECT doc_id, text FROM sig
  WHERE n_tokens >= {QL_MIN_TOKENS} AND n_tokens <= {QL_MAX_TOKENS}
    AND 3 * n_tokens <= n_word_chars AND n_word_chars <= 10 * n_tokens
    AND n_stop >= {QL_MIN_STOPWORDS} AND n_punct <= n_tokens
),
exact AS (
  SELECT min(doc_id) AS doc_id, count(*) AS n_exact_dups
  FROM quality GROUP BY md5(text)
),
corpus AS (
  SELECT e.doc_id, q.text, e.n_exact_dups
  FROM exact e JOIN quality q USING (doc_id)
)"""
    return f"""WITH RECURSIVE {curated},
{_jaccard_pair_ctes(corpus_cte=None)},
{_CC_CTES}
SELECT c.doc_id, CAST(c.n_exact_dups AS BIGINT) AS n_exact_dups
FROM corpus c LEFT JOIN labels l ON l.node = c.doc_id
WHERE l.node IS NULL OR l.cluster = c.doc_id"""


def line_dedup_sql() -> str:
    """Corpus-level keep-first line dedup + per-doc reassembly — the
    SQL mirror of ``dedup.line_dedup`` over the dup corpus."""
    return f"""WITH {DUP_CORPUS_CTE},
ls AS (SELECT doc_id, string_split(text, chr(10)) AS parts FROM corpus),
lines AS (
  SELECT doc_id, unnest(parts) AS line,
         unnest(range(1, len(parts) + 1)) AS line_no
  FROM ls
),
ne AS (SELECT * FROM lines WHERE line <> ''),
kept AS (
  SELECT doc_id, line_no, line FROM ne
  QUALIFY row_number() OVER (PARTITION BY line ORDER BY doc_id, line_no) = 1
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
       string_agg(line, chr(10) ORDER BY line_no) AS text
FROM kept GROUP BY doc_id"""


def boilerplate_strip_sql() -> str:
    """Frequency-filtered line removal — mirrors
    ``dedup.boilerplate_strip`` (document frequency = distinct docs)."""
    return f"""WITH {DUP_CORPUS_CTE},
ls AS (SELECT doc_id, string_split(text, chr(10)) AS parts FROM corpus),
lines AS (
  SELECT doc_id, unnest(parts) AS line,
         unnest(range(1, len(parts) + 1)) AS line_no
  FROM ls
),
ne AS (SELECT * FROM lines WHERE line <> ''),
freq AS (SELECT line, count(DISTINCT doc_id) AS dfreq FROM ne GROUP BY line),
kept AS (
  SELECT ne.doc_id, ne.line_no, ne.line
  FROM ne JOIN freq ON freq.line = ne.line
  WHERE freq.dfreq <= 2
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
       string_agg(line, chr(10) ORDER BY line_no) AS text
FROM kept GROUP BY doc_id"""


def decontaminate_sql() -> str:
    """Eval-set decontamination flags — word n-gram overlap of every
    training doc (doc_id % DECONTAM_MOD != 0) against the benchmark docs
    (doc_id % DECONTAM_MOD == 0)."""
    from ..pipelines.corpus import DECONTAM_MOD, DECONTAM_N

    n = DECONTAM_N
    gram = " || ' ' || ".join(
        f"w[i+{j}]" if j else "w[i]" for j in range(n)
    )
    return f"""WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents
),
ng AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, greatest(len(w) - {n - 2}, 1)), i -> {gram}
         ))) AS g
  FROM toks WHERE len(w) >= {n}
),
bench AS (SELECT DISTINCT g FROM ng WHERE doc_id % {DECONTAM_MOD} = 0),
hits AS (
  SELECT DISTINCT ng.doc_id FROM ng JOIN bench USING (g)
  WHERE ng.doc_id % {DECONTAM_MOD} <> 0
)
SELECT d.doc_id,
       CAST(CASE WHEN h.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
         AS contaminated
FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
WHERE d.doc_id % {DECONTAM_MOD} <> 0"""


def incremental_dedup_sql() -> str:
    """Incremental ingest dedup — mirrors ``dedup.incremental_dedup``:
    incoming (dup corpus) LEFT ANTI snapshot (documents) on md5(text)."""
    return f"""WITH {DUP_CORPUS_CTE},
snap AS (SELECT DISTINCT md5(text) AS key FROM documents)
SELECT c.doc_id, md5(c.text) AS key
FROM corpus c LEFT JOIN snap s ON s.key = md5(c.text)
WHERE s.key IS NULL"""


def media_meta_sql() -> str:
    """Predicts what the FIMG decoder must parse out of the payload
    bytes — closed-form in doc_id (multimodal.attach_varied_payload):
    n_bytes = 9-byte header + h*w*c."""
    return """SELECT doc_id,
  CAST(16 + (doc_id % 5) * 8 AS BIGINT) AS height,
  CAST(16 + (doc_id % 7) * 8 AS BIGINT) AS width,
  CAST(1 + doc_id % 3 AS BIGINT) AS channels,
  CAST(9 + (16 + (doc_id % 5) * 8) * (16 + (doc_id % 7) * 8)
         * (1 + doc_id % 3) AS BIGINT) AS n_bytes
FROM documents"""


def web_curation_sql() -> str:
    """The composed web-curation showcase — one assembled oracle for
    plant-PII -> redact -> quality gate -> line dedup -> exact dedup ->
    pack, each CTE the same SQL fragment that checks the stage alone."""
    from ..pipelines.corpus import PII_MOD
    from ..stages.textstats import (
        PII_PATTERNS,
        QL_MAX_TOKENS,
        QL_MIN_STOPWORDS,
        QL_MIN_TOKENS,
        QL_STOPWORDS,
    )

    red_expr = "text"
    for _, pat, repl in PII_PATTERNS:
        red_expr = "regexp_replace({t}, '{p}', '{r}', 'g')".format(
            t=red_expr, p=pat.replace("'", "''"), r=repl
        )
    stop_sum = " + ".join(_marker_count_sql(m) for m in QL_STOPWORDS)
    corpus0 = DUP_CORPUS_CTE.replace("corpus AS (", "corpus0 AS (", 1)
    return f"""WITH {corpus0},
pl AS (
  SELECT doc_id,
         CASE WHEN doc_id % {PII_MOD} = 0
              THEN text || ' contact user' || doc_id ||
                   '@example.com or 10.0.0.1 or +1 (415) 555-0134'
              ELSE text END AS text
  FROM corpus0
),
red AS (SELECT doc_id, {red_expr} AS text FROM pl),
padded AS (SELECT doc_id, text, ' ' || lower(text) || ' ' AS p FROM red),
sig AS (
  SELECT doc_id, text,
    len(regexp_extract_all(text, '\\S+')) AS n_tokens,
    len(regexp_extract_all(text, '\\S')) AS n_word_chars,
    {stop_sum} AS n_stop,
    len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct
  FROM padded
),
quality AS (
  SELECT doc_id, text FROM sig
  WHERE n_tokens >= {QL_MIN_TOKENS} AND n_tokens <= {QL_MAX_TOKENS}
    AND 3 * n_tokens <= n_word_chars AND n_word_chars <= 10 * n_tokens
    AND n_stop >= {QL_MIN_STOPWORDS} AND n_punct <= n_tokens
),
ls AS (SELECT doc_id, string_split(text, chr(10)) AS parts FROM quality),
lines AS (
  SELECT doc_id, unnest(parts) AS line,
         unnest(range(1, len(parts) + 1)) AS line_no
  FROM ls
),
ne AS (SELECT * FROM lines WHERE line <> ''),
keptl AS (
  SELECT doc_id, line_no, line FROM ne
  QUALIFY row_number() OVER (PARTITION BY line ORDER BY doc_id, line_no) = 1
),
docs2 AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY line_no) AS text
  FROM keptl GROUP BY doc_id
),
exact AS (SELECT min(doc_id) AS doc_id FROM docs2 GROUP BY md5(text)),
uniq AS (SELECT d.doc_id, d.text FROM exact e JOIN docs2 d USING (doc_id)),
toks AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens
  FROM uniq
),
s AS (
  SELECT doc_id, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) AS BIGINT) AS strt
  FROM toks
)
SELECT doc_id, n_tokens,
       CAST(strt // 512 AS BIGINT) AS pack_id,
       CAST(strt % 512 AS BIGINT) AS pack_off
FROM s"""


def data_mixture_sql() -> str:
    """Token-budget mixture — mirrors ``sampling.data_mixture`` integer
    arithmetic and the LCG membership rule exactly."""
    from ..pipelines.corpus import MIX_WEIGHTS

    B = sum(MIX_WEIGHTS.values())
    vals = ", ".join(f"({t}, {w})" for t, w in MIX_WEIGHTS.items())
    return f"""WITH t AS (
  SELECT doc_id, source,
         CAST(substr(source, 4) AS BIGINT) % 3 AS tier,
         CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens
  FROM documents
),
w(tier, bp) AS (VALUES {vals}),
sums AS (SELECT tier, CAST(sum(n_tokens) AS BIGINT) AS tok
         FROM t GROUP BY tier),
caps AS (SELECT s.tier, s.tok, w.bp, s.tok * {B} // w.bp AS cap
         FROM sums s JOIN w ON w.tier = s.tier),
tmin AS (SELECT min(cap) AS tt FROM caps),
rates AS (SELECT tier, (tt * bp * 10000) // ({B} * tok) AS r
          FROM caps, tmin)
SELECT t.doc_id, t.source, t.tier, t.n_tokens
FROM t JOIN rates ON rates.tier = t.tier
WHERE ((t.doc_id * 1103515245 + 12345) % 2147483648) % 10000 < rates.r"""


def pii_redact_sql() -> str:
    """PII scrubbing — the SAME RE2 patterns as textstats.PII_PATTERNS,
    nested in the same order (DuckDB's regexp engine is RE2 too, so
    match sets coincide byte-for-byte)."""
    from ..stages.textstats import PII_PATTERNS
    from ..pipelines.corpus import PII_MOD

    planted = (
        "CASE WHEN doc_id % {m} = 0 THEN text || ' contact user' || doc_id"
        " || '@example.com or 10.0.0.1 or +1 (415) 555-0134'"
        " ELSE text END"
    ).format(m=PII_MOD)
    text_expr = "t.text"
    count_cols = []
    for name, pat, repl in PII_PATTERNS:
        # DuckDB '...' literals are standard-conforming: backslash is a
        # literal char, so the RE2 pattern goes in verbatim — only
        # quotes need doubling
        pat_sql = pat.replace("'", "''")
        count_cols.append(
            "CAST(len(regexp_extract_all({t}, '{p}')) AS BIGINT) AS {n}".format(
                t=text_expr, p=pat_sql, n=name
            )
        )
        text_expr = "regexp_replace({t}, '{p}', '{r}', 'g')".format(
            t=text_expr, p=pat_sql, r=repl
        )
    return (
        "WITH t AS (SELECT doc_id, {planted} AS text FROM documents) "
        "SELECT doc_id, {counts}, {t} AS redacted FROM t".format(
            planted=planted, counts=", ".join(count_cols), t=text_expr
        )
    )


def pack_sequences_sql() -> str:
    """Concat-then-chunk packing — mirrors ``packing.pack_sequences``:
    exclusive ordered prefix sum of token counts, integer div/mod by
    the 512-token budget."""
    return """WITH t AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens
  FROM documents
),
s AS (
  SELECT doc_id, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) AS BIGINT) AS strt
  FROM t
)
SELECT doc_id, n_tokens,
       CAST(strt // 512 AS BIGINT) AS pack_id,
       CAST(strt % 512 AS BIGINT) AS pack_off
FROM s"""


def ccnet_buckets_sql() -> str:
    """CCNet tercile buckets — mirrors ``q_ccnet_buckets``: floor-binned
    lm_score, quantile_disc terciles (same float q literals as the
    Python side), threshold comparisons."""
    from ..pipelines.corpus import CCNET_Q1, CCNET_Q2

    return f"""WITH b AS (
  SELECT doc_id, CAST(floor(lm_score) AS BIGINT) AS score_bin
  FROM ({lm_score_sql()})
),
t AS (
  SELECT quantile_disc(score_bin, {CCNET_Q1!r}) AS t1,
         quantile_disc(score_bin, {CCNET_Q2!r}) AS t2
  FROM b
)
SELECT doc_id, score_bin,
       CASE WHEN score_bin >= t2 THEN 'head'
            WHEN score_bin >= t1 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM b, t"""


def pack_texts_sql() -> str:
    """Materialized packed sequences — mirrors ``packing.pack_texts``:
    per-doc covered-pack explosion, 1-based inclusive list slicing,
    position-ordered assembly."""
    return """WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS w,
         CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n
  FROM documents
),
s AS (
  SELECT doc_id, w, n,
         CAST(coalesce(sum(n) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) AS BIGINT) AS strt
  FROM t
),
covered AS (
  SELECT w, n, strt,
         unnest(range(strt // 512, (strt + n - 1) // 512 + 1)) AS p
  FROM s WHERE n > 0
),
pieces AS (
  SELECT p AS pack_id,
         strt + greatest(0, p * 512 - strt) AS pos,
         least(n, (p + 1) * 512 - strt)
           - greatest(0, p * 512 - strt) AS cnt,
         array_to_string(
           w[greatest(0, p * 512 - strt) + 1
             : least(n, (p + 1) * 512 - strt)], ' ') AS piece
  FROM covered
)
SELECT CAST(pack_id AS BIGINT) AS pack_id,
       CAST(sum(cnt) AS BIGINT) AS n_tokens,
       string_agg(piece, ' ' ORDER BY pos) AS text
FROM pieces GROUP BY pack_id"""


def length_quantiles_sql() -> str:
    """Exact per-language token-length quantiles — mirrors
    ``aggregates.grouped_quantiles_counting`` (rank = ceil(q*n),
    DuckDB quantile_disc semantics)."""
    return """SELECT lang,
  CAST(quantile_disc(len(regexp_extract_all(text, '\\S+')), 0.5)
       AS BIGINT) AS p50,
  CAST(quantile_disc(len(regexp_extract_all(text, '\\S+')), 0.95)
       AS BIGINT) AS p95
FROM documents GROUP BY lang"""


def length_histogram_sql() -> str:
    """Token-length histogram, 64-token buckets."""
    return """SELECT
  CAST((len(regexp_extract_all(text, '\\S+')) // 64) * 64 AS BIGINT)
    AS bucket_lo,
  CAST(count(*) AS BIGINT) AS n_docs
FROM documents GROUP BY 1"""


def rep_signals_sql() -> str:
    """Gopher-style within-doc repetition fractions — mirrors
    ``textstats.rep_signals_batch`` exactly: every fraction is ONE
    division of two integer sums, so values are bit-identical across
    engines.  Docs with no lines / tokens / bigrams get 0.0."""
    return """WITH t AS (
  SELECT doc_id, text, regexp_extract_all(text, '\\S+') AS w FROM documents
),
words AS (SELECT doc_id, unnest(w) AS word FROM t),
wc AS (SELECT doc_id, word, count(*) AS c FROM words GROUP BY doc_id, word),
wagg AS (
  SELECT doc_id,
         CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS twf
  FROM wc GROUP BY doc_id
),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w)),
                               i -> w[i] || ' ' || w[i+1])) AS g
  FROM t WHERE len(w) >= 2
),
bc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g),
bagg AS (
  SELECT doc_id,
         CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS tbf
  FROM bc GROUP BY doc_id
),
ls AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM t),
ne AS (SELECT doc_id, line, length(line) AS l FROM ls WHERE line <> ''),
lc AS (
  SELECT doc_id, line, count(*) AS c, min(l) AS l
  FROM ne GROUP BY doc_id, line
),
lagg AS (
  SELECT doc_id,
         CAST(sum(c - 1) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS dlf,
         CAST(sum((c - 1) * l) AS DOUBLE) / CAST(sum(c * l) AS DOUBLE) AS dlcf
  FROM lc GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(lagg.dlf, 0.0) AS dup_line_frac,
       coalesce(lagg.dlcf, 0.0) AS dup_line_char_frac,
       coalesce(wagg.twf, 0.0) AS top_word_frac,
       coalesce(bagg.tbf, 0.0) AS top_bigram_frac
FROM documents d
LEFT JOIN lagg ON lagg.doc_id = d.doc_id
LEFT JOIN wagg ON wagg.doc_id = d.doc_id
LEFT JOIN bagg ON bagg.doc_id = d.doc_id"""


def lm_score_sql() -> str:
    """Count-LM fluency — mirrors ``textstats.frequent_ngrams`` (exact
    global bigram counts pruned by MIN COUNT, deterministic under ties
    unlike top-k) + ``textstats.lm_score`` (mean reference frequency,
    OOV = 0; single int64-sum division, no float accumulation)."""
    from ..stages.textstats import LM_MIN_COUNT

    return f"""WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents
),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w)),
                               i -> w[i] || ' ' || w[i+1])) AS g
  FROM t WHERE len(w) >= 2
),
cnt AS (SELECT g, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY g),
lm AS (SELECT g, c FROM cnt WHERE c >= {LM_MIN_COUNT}),
per AS (
  SELECT bg.doc_id,
         CAST(count(*) AS BIGINT) AS nb,
         CAST(sum(coalesce(lm.c, 0)) AS BIGINT) AS sumc,
         CAST(count(lm.g) AS BIGINT) AS known
  FROM bg LEFT JOIN lm ON bg.g = lm.g GROUP BY bg.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(per.nb, 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(per.sumc, 0) AS BIGINT) AS sum_freq,
       CASE WHEN per.nb IS NULL THEN 0.0
            ELSE CAST(per.sumc AS DOUBLE) / CAST(per.nb AS DOUBLE)
       END AS lm_score,
       CASE WHEN per.nb IS NULL THEN 0.0
            ELSE CAST(per.nb - per.known AS DOUBLE) / CAST(per.nb AS DOUBLE)
       END AS oov_frac
FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id"""


def doc_stats_sql() -> str:
    # BPE pattern must stay byte-identical to textstats.BPE_RE (both
    # engines are RE2, so match sets coincide)
    return """SELECT doc_id,
  length(text) AS n_chars,
  len(regexp_extract_all(text, '\\S+')) AS n_tokens,
  length(text) - length(replace(text, chr(10), '')) + 1 AS n_lines,
  len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
  len(regexp_extract_all(text,
    '''(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+'
  )) AS n_bpe_tokens
FROM documents"""


def quality_score_sql() -> str:
    from ..stages.textstats import (
        QL_MAX_TOKENS,
        QL_MIN_STOPWORDS,
        QL_MIN_TOKENS,
        QL_STOPWORDS,
    )

    stop_sum = " + ".join(_marker_count_sql(m) for m in QL_STOPWORDS)
    return f"""WITH padded AS (
  SELECT doc_id, text, ' ' || lower(text) || ' ' AS p FROM documents
),
sig AS (
  SELECT doc_id,
    len(regexp_extract_all(text, '\\S+')) AS n_tokens,
    len(regexp_extract_all(text, '\\S')) AS n_word_chars,
    {stop_sum} AS n_stop,
    len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct
  FROM padded
)
SELECT doc_id, n_tokens, n_word_chars, CAST(n_stop AS BIGINT) AS n_stop,
  n_punct,
  CAST(CASE WHEN n_tokens >= {QL_MIN_TOKENS} AND n_tokens <= {QL_MAX_TOKENS}
        AND 3 * n_tokens <= n_word_chars AND n_word_chars <= 10 * n_tokens
        AND n_stop >= {QL_MIN_STOPWORDS} AND n_punct <= n_tokens
       THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM sig"""


def tfidf_top_terms_sql(top_k: int = 3) -> str:
    """Per-doc top-k terms by (tf DESC, df ASC, term ASC) — the integral
    tf-idf ordering of ``textstats.tfidf_top_terms``."""
    return f"""WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\S+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
ranked AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY tf.tf DESC, df.df ASC, tf.term ASC
         ) AS rank
  FROM tf JOIN df USING (term)
)
SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {top_k}"""


def _marker_count_sql(marker: str) -> str:
    esc = marker.replace("'", "''")
    return f"(length(p) - length(replace(p, '{esc}', ''))) // {len(marker)}"


def lang_id_sql() -> str:
    score_cols = ",\n  ".join(
        " + ".join(_marker_count_sql(m) for m in LANG_MARKERS[lang])
        + f" AS s_{lang}"
        for lang in LANG_ORDER
    )
    cases = []
    for lang in LANG_ORDER:
        others = [o for o in LANG_ORDER if o != lang]
        cond = " AND ".join(f"s_{lang} > s_{o}" for o in others)
        cases.append(f"WHEN {cond} THEN '{lang}'")
    case_sql = "CASE " + " ".join(cases) + " ELSE 'und' END"
    return f"""WITH padded AS (
  SELECT doc_id, ' ' || lower(text) || ' ' AS p FROM documents
),
scored AS (
  SELECT doc_id,
  {score_cols}
  FROM padded
)
SELECT doc_id, s_en, s_pt, s_es, {case_sql} AS lang_pred FROM scored"""


def fingerprint_sql() -> str:
    return "SELECT doc_id, md5(text) AS fp FROM documents"


def ann_topk_sql() -> str:
    return f"""WITH q AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id < {ANN_NUM_QUERIES}
),
c AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id >= {ANN_NUM_QUERIES}
),
s AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_cosine_similarity(q.embedding, c.embedding) AS sim
  FROM q CROSS JOIN c
),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rank
  FROM s
)
SELECT query_id, rank, neighbor_id FROM ranked WHERE rank <= {ANN_K}"""


def embedding_dupes_sql() -> str:
    return f"""WITH {EMB_CORPUS_CTE}
SELECT a.vec_id AS i, b.vec_id AS j
FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= {COSINE_THRESHOLD}"""


def grouped_argmax_sql() -> str:
    return """SELECT l_orderkey, l_linenumber, l_partkey FROM (
  SELECT l_orderkey, l_linenumber, l_partkey,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY l_extendedprice DESC, l_linenumber) AS rn
  FROM lineitem
) WHERE rn = 1"""


def q1_counts_sql() -> str:
    return """SELECT l_returnflag, l_linestatus,
  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
  count(*) AS count_order,
  CAST(sum(l_quantity) AS BIGINT) / CAST(count(*) AS DOUBLE) AS avg_qty
FROM lineitem GROUP BY l_returnflag, l_linestatus"""


def balance_counts_sql() -> str:
    return """SELECT l_orderkey,
  CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
  CAST(sum(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_neg
FROM lineitem GROUP BY l_orderkey
HAVING n_pos > 0 AND n_neg > 0"""


def balanced_sample_sql() -> str:
    """Mirror of pipelines/corpus.q_balanced_sample: all positives plus
    per-key LCG-resampled negatives (stages/balance.py pick_indices)."""
    from ..stages.balance import DRAW_STEP, LCG_INC, LCG_MULT

    return f"""WITH pos AS (
  SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_returnflag = 'R'
),
neg AS (
  SELECT l_orderkey, l_linenumber,
         row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) - 1 AS r,
         count(*) OVER (PARTITION BY l_orderkey) AS n
  FROM lineitem WHERE l_returnflag <> 'R'
),
cnt AS (SELECT l_orderkey, count(*) AS n_pos FROM pos GROUP BY 1),
picks AS (
  SELECT l_orderkey,
         l_orderkey * {LCG_MULT} + {LCG_INC}
           + unnest(generate_series(0, n_pos - 1)) * {DRAW_STEP} AS draw
  FROM cnt
)
SELECT n.l_orderkey, n.l_linenumber
FROM picks p JOIN neg n
  ON n.l_orderkey = p.l_orderkey AND n.r = p.draw % n.n
UNION ALL
SELECT l_orderkey, l_linenumber FROM pos"""


def events_window_sql() -> str:
    return """SELECT date_trunc('hour', ts) AS hour, event_type,
  count(*) AS n_events, count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1, 2"""


def events_top100_sql() -> str:
    return """SELECT event_id FROM events
ORDER BY value DESC, event_id LIMIT 100"""


def hash_split_sql() -> str:
    return """SELECT doc_id,
  CASE WHEN ((doc_id * 1103515245 + 12345) % 2147483648) % 10 < 8
       THEN 'train' ELSE 'test' END AS split
FROM documents"""


def dedup_apply_sql() -> str:
    """Keep-first dedup oracle: corpus minus every doc appearing as the
    larger member of an exact-Jaccard duplicate pair."""
    return f"""WITH {DUP_CORPUS_CTE},
dropset AS (SELECT DISTINCT j FROM ({jaccard_dupes_sql()}))
SELECT c.doc_id FROM corpus c
WHERE c.doc_id NOT IN (SELECT j FROM dropset)"""


def orders_by_nation_sql() -> str:
    return """SELECT CAST(c.c_nationkey AS BIGINT) AS nationkey,
  count(*) AS n_orders,
  count(DISTINCT o.o_custkey) AS n_customers
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1"""


def lineitem_order_join_sql() -> str:
    return """SELECT o.o_orderpriority AS priority,
  count(*) AS n_items,
  CAST(sum(l.l_quantity) AS BIGINT) AS sum_qty
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1"""


def purchase_asof_signup_sql() -> str:
    return """SELECT l.event_id, l.user_id, r.event_id AS signup_event_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') l
ASOF JOIN (SELECT * FROM events WHERE event_type = 'signup') r
  ON l.user_id = r.user_id AND l.ts >= r.ts"""


def sessionize_sql() -> str:
    return """WITH g AS (
  SELECT event_id, user_id, ts,
    CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_id, user_id,
  CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
FROM g"""


def acctbal_range_join_sql() -> str:
    return """SELECT c.c_custkey, s.s_suppkey
FROM customer c JOIN supplier s
  ON c.c_acctbal BETWEEN s.s_acctbal - 50.0 AND s.s_acctbal + 50.0"""


def top_bigrams_sql() -> str:
    return """WITH toks AS (
  SELECT regexp_extract_all(text, '\\S+') AS w FROM documents
),
ng AS (
  SELECT unnest(list_transform(
    range(1, greatest(len(w), 1)),
    i -> w[i] || ' ' || w[i+1]
  )) AS ngram
  FROM toks WHERE len(w) >= 2
)
SELECT ngram, count(*) AS cnt FROM ng
GROUP BY 1 ORDER BY cnt DESC, ngram LIMIT 100"""


def heavy_hitters_sql(k: int = 150) -> str:
    """Exact 1/k-heavy hitters — ground truth for
    stages/textstats.heavy_hitters: tokens are \\S+ runs, keep tokens
    with count * k strictly greater than the total token count."""
    return f"""WITH toks AS (
  SELECT unnest(regexp_extract_all(text, '\\S+')) AS token FROM documents
),
tot AS (SELECT count(*) AS n FROM toks)
SELECT token, CAST(count(*) AS BIGINT) AS cnt
FROM toks CROSS JOIN tot
GROUP BY token, tot.n HAVING count(*) * {k} > tot.n"""


def embedding_quantize_sql(scale: int = 1_000_000) -> str:
    """Per-dim int8 affine quantization — ground truth for
    stages/similarity.quantize_embeddings (shared fixed-point floor,
    then pure BIGINT arithmetic on both engines)."""
    return f"""WITH q AS (
  SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * {scale}) AS BIGINT) AS qv
  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS u(i)
),
r AS (SELECT dim, min(qv) AS lo, max(qv) AS hi FROM q GROUP BY dim)
SELECT q.vec_id, q.dim,
       CAST((q.qv - r.lo) * 255 // GREATEST(r.hi - r.lo, 1) AS BIGINT)
         AS code
FROM q JOIN r USING (dim)"""


def token_counts_sql() -> str:
    """Whitespace + BPE-ish token counts — ground truth for
    stages/textstats.bpe_token_counts (both engines run the SAME RE2
    pattern, so the counts agree by construction)."""
    from ..stages.textstats import BPE_TOKEN_PATTERN

    pat = BPE_TOKEN_PATTERN.replace("'", "''")
    return f"""SELECT doc_id,
  CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_ws_tokens,
  CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_bpe_tokens
FROM documents"""


def cms_heavy_hitters_sql(k: int = 150) -> str:
    """Exact heavy hitters + the asserted sketch-tolerance flag —
    ground truth for stages/textstats.cms_heavy_hitters (the Count-Min
    estimate is a pure function of the token multiset, so the within
    boolean is deterministic; the SQL side asserts it TRUE)."""
    return (
        f"SELECT token, cnt, TRUE AS cms_within_tol "
        f"FROM ({heavy_hitters_sql(k)})"
    )


def events_pivot_sql() -> str:
    return """SELECT user_id,
  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
FROM events GROUP BY user_id"""


def distinct_user_events_sql() -> str:
    return "SELECT DISTINCT user_id, event_type FROM events"


def stratified_sample_sql() -> str:
    return """SELECT doc_id, lang FROM documents
WHERE ((doc_id * 1103515245 + 12345) % 2147483648) % 10000 <
  CASE lang WHEN 'es' THEN 10000 WHEN 'en' THEN 5000 ELSE 1000 END"""


def median_qty_sql() -> str:
    return """WITH ranked AS (
  SELECT l_returnflag, l_quantity,
    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rn,
    count(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
)
SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS median_qty
FROM ranked WHERE rn = (n + 1) // 2"""


def sample_per_lang_sql() -> str:
    return """WITH ranked AS (
  SELECT doc_id, lang,
    row_number() OVER (
      PARTITION BY lang
      ORDER BY ((doc_id * 1103515245 + 12345) % 2147483648), doc_id
    ) AS rn
  FROM documents
)
SELECT doc_id, lang FROM ranked WHERE rn <= 20"""


def events_of_purchasers_sql() -> str:
    return """SELECT event_id, user_id FROM events
WHERE user_id IN (SELECT DISTINCT user_id FROM events
                  WHERE event_type = 'purchase')"""


def rolling_value_sum_sql() -> str:
    return """SELECT event_id, user_id,
  CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS 2 PRECEDING) AS BIGINT) AS rolling_cents
FROM events"""


def top3_events_per_user_sql() -> str:
    return """WITH ranked AS (
  SELECT event_id, user_id, CAST(round(value * 100) AS BIGINT) AS cents,
    row_number() OVER (
      PARTITION BY user_id
      ORDER BY CAST(round(value * 100) AS BIGINT) DESC, event_id
    ) AS rn
  FROM events
)
SELECT event_id, user_id, cents FROM ranked WHERE rn <= 3"""


def session_stats_sql() -> str:
    return """WITH g AS (
  SELECT event_id, user_id, ts,
    CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT event_id, user_id, ts,
    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM g
)
SELECT user_id, session_id, count(*) AS n_events,
  CAST(date_diff('microsecond', min(ts), max(ts)) AS BIGINT) AS duration_us
FROM s GROUP BY 1, 2"""


def props_extract_sql() -> str:
    return """SELECT event_id,
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events"""


def shuffle_shards_sql() -> str:
    # shard = high bits of the 31-bit LCG state (low bits of an affine
    # LCG are periodic mod a power-of-two shard count)
    return """SELECT
  CAST(((doc_id * 1103515245 + 12345) % 2147483648) * 16 // 2147483648
       AS BIGINT) AS shard,
  count(*) AS n_docs
FROM documents GROUP BY 1"""


def approx_distinct_users_sql() -> str:
    """Tolerance oracle for the HLL cardinality (VERDICT r4 item 2):
    the register merge is order/partition-insensitive so the estimate
    is deterministic; the query emits the EXACT count (verified here)
    plus a within-2% boolean claim (p=12 -> ~1.6% std error, measured
    max 1.2% on the sf dirs — `true` is the reproducible expectation)."""
    return """SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
  true AS hll_within_2pct
FROM events"""


def approx_users_by_type_sql() -> str:
    """Per-group variant of :func:`approx_distinct_users_sql`."""
    return """SELECT event_type,
  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
  true AS hll_within_2pct
FROM events GROUP BY event_type"""


def minhash_dupes_sql() -> str:
    """Planted-pair recall oracle (VERDICT r4 item 3): the MinHash
    query projects its detected pairs onto the planted relation, and
    on this corpus recall is exactly 100% for both families (exact
    copies collide in all 32 bands; the 3/4-word truncations sit at
    shingle-Jaccard ~0.8, far above the >=2-of-32-band threshold; max
    band df measured 6 vs the 256 skew cap, so no order-dependent
    drops).  The oracle therefore IS the planted relation."""
    return f"""SELECT doc_id, doc_id + {EXACT_OFF} AS dup_id, 'exact' AS kind
FROM documents WHERE doc_id % 3 = 0
UNION ALL
SELECT doc_id, doc_id + {NEAR_OFF} AS dup_id, 'near' AS kind
FROM documents WHERE doc_id % 4 = 0"""


def simhash_dupes_sql() -> str:
    """Exact-copy recall oracle for SimHash: identical texts share a
    fingerprint, so hamming-0 detection is deterministic; truncations
    are intentionally NOT claimed (hamming >> 3)."""
    return f"""SELECT doc_id, doc_id + {EXACT_OFF} AS dup_id, 'exact' AS kind
FROM documents WHERE doc_id % 3 = 0"""


def semdedup_sql() -> str:
    """Survivor-set oracle: every planted +EMB_OFF copy is
    bit-identical to its original (same k-means cell, cosine exactly
    1.0 >= 0.999, min-id keep drops the copy) and no other pair
    reaches 0.999 (measured at sf0.001/0.01/0.1), so the survivors are
    exactly the original embeddings."""
    return "SELECT vec_id FROM embeddings"


def winnow_sketch_sql() -> str:
    """Winnowing is a pure per-doc function, so an exact copy must
    reproduce the identical canonical fingerprint set; the query emits
    one equality boolean per planted exact pair."""
    return """SELECT doc_id, true AS sketch_equal
FROM documents WHERE doc_id % 3 = 0"""


def weighted_sample_sql() -> str:
    """Weight-proportional Poisson sampling mirror — same LCG residue
    as the stratified sampler, threshold min(100000, n_chars * 200)."""
    from ..pipelines.corpus import (
        WEIGHTED_SAMPLE_DENOM,
        WEIGHTED_SAMPLE_MULT,
    )

    return f"""SELECT doc_id, n_chars FROM documents
WHERE ((doc_id * 1103515245 + 12345) % 2147483648) % {WEIGHTED_SAMPLE_DENOM}
  < LEAST({WEIGHTED_SAMPLE_DENOM}, n_chars * {WEIGHTED_SAMPLE_MULT})"""


def docs_rollup_sql() -> str:
    """GROUP BY ROLLUP mirror with the 'ALL' sentinel for rolled-up
    keys (the engine result is NULL-free by construction)."""
    return """SELECT COALESCE(lang, 'ALL') AS lang,
  COALESCE(source, 'ALL') AS source,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY ROLLUP(lang, source)"""


def squad_sample_sql() -> str:
    """Frozen-golden VALUES oracle for the E1 converter on the
    reference's own shipped sample corpus (the input is FIXED — sf_dir
    is unused by the query).  Provenance: the fixture was frozen from
    the pipeline output at a commit where
    ``tests/test_squad_e1_parity.py`` proves the SQuAD structure
    byte-equal to the REFERENCE converter executed in-process — so the
    pin is reference-anchored, and any later drift in either the
    converter or the flat projection turns this row red."""
    import json
    from pathlib import Path

    fix = json.load(
        open(Path(__file__).parent / "fixtures_squad_golden.json")
    )
    cols = fix["columns"]

    def lit(v):
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, int):
            return str(v)
        return "'" + str(v).replace("'", "''") + "'"

    rows = ",\n".join(
        "(" + ", ".join(lit(r[c]) for c in cols) + ")" for r in fix["rows"]
    )
    collist = ", ".join(cols)
    return (
        f"SELECT url, CAST(window_id AS INTEGER) AS window_id,\n"
        f"  qa_id, question, input_sentence, label_sentence,\n"
        f"  CAST(answer_start AS BIGINT) AS answer_start,\n"
        f"  CAST(is_negative AS BOOLEAN) AS is_negative,\n"
        f"  answer, context, CAST(qa_seq AS INTEGER) AS qa_seq\n"
        f"FROM (VALUES\n{rows}\n) AS t({collist})"
    )


def media_features_sql() -> str:
    """Decode-completeness oracle for the media feature stage: the
    48x48x3 FIMG payload must yield 3x16 = 48 histogram bins whose
    pre-normalization mass equals the 6912 decoded pixels.  (The
    feature VALUES are RNG-pixel-derived and stay engine-side.)"""
    return """SELECT doc_id,
  CAST(48 AS INTEGER) AS feature_dim,
  CAST(6912 AS BIGINT) AS hist_mass
FROM documents"""


def dup_spans_sql(w: int = 8) -> str:
    """Repeated-span detection — ground truth for
    stages/dedup.dup_spans: word w-grams occurring >= 2 times anywhere
    in the corpus; per doc, the duplicated-gram count and the
    interval-union word span via the min(gap, w) telescope."""
    gram = " || ' ' || ".join(f"w[i+{j}]" for j in range(w))
    gram = gram.replace("w[i+0]", "w[i]")
    return f"""WITH {DUP_CORPUS_CTE},
t AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM corpus
),
g AS (
  SELECT doc_id,
    unnest(range(1, len(w) - {w - 2})) AS pos,
    unnest(list_transform(range(1, len(w) - {w - 2}), i -> {gram})) AS gram
  FROM t WHERE len(w) >= {w}
),
d AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
cand AS (SELECT doc_id, pos FROM g WHERE gram IN (SELECT gram FROM d)),
m AS (
  SELECT doc_id, pos,
         lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM cand
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_dup_grams,
       CAST(SUM(CASE WHEN prev IS NULL THEN {w}
                     ELSE least(pos - prev, {w}) END) AS BIGINT)
         AS dup_span_words
FROM m GROUP BY doc_id"""


def dup_spans_apply_sql(w: int = 8) -> str:
    """Exact-substring removal — ground truth for
    stages/dedup.dup_spans_apply: every word covered by a duplicated
    w-gram span is stripped; one row per doc with the kept count and
    the space-joined surviving text ('' when fully covered)."""
    gram = " || ' ' || ".join(f"w[i+{j}]" for j in range(w))
    gram = gram.replace("w[i+0]", "w[i]")
    return f"""WITH {DUP_CORPUS_CTE},
t AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM corpus
),
g AS (
  SELECT doc_id,
    unnest(range(1, len(w) - {w - 2})) AS pos,
    unnest(list_transform(range(1, len(w) - {w - 2}), i -> {gram})) AS gram
  FROM t WHERE len(w) >= {w}
),
d AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
cand AS (SELECT doc_id, pos FROM g WHERE gram IN (SELECT gram FROM d)),
cov AS (SELECT DISTINCT doc_id, pos + u.j AS i
        FROM cand, unnest(range(0, {w})) AS u(j)),
words AS (
  SELECT doc_id, unnest(range(1, len(w) + 1)) AS i, unnest(w) AS word
  FROM t
),
kept AS (
  SELECT words.doc_id, words.i, words.word
  FROM words LEFT JOIN cov
    ON cov.doc_id = words.doc_id AND cov.i = words.i
  WHERE cov.doc_id IS NULL
)
SELECT t.doc_id,
       CAST(COALESCE(k.n, 0) AS BIGINT) AS n_kept,
       COALESCE(k.txt, '') AS text
FROM t LEFT JOIN (
  SELECT doc_id, count(*) AS n,
         string_agg(word, ' ' ORDER BY i) AS txt
  FROM kept GROUP BY doc_id
) k ON k.doc_id = t.doc_id"""


def funnel_sql(
    stages=("signup", "click", "purchase"),
    within_minutes: int | str = "default",
) -> str:
    """Ordered funnel conversion — ground truth for
    stages/temporal.funnel: stage k's earliest timestamp at or after
    the user's stage-(k-1) time (and within the conversion window when
    ``within_minutes`` is set), chained LEFT JOINs from the stage-1
    cohort."""
    if within_minutes == "default":
        from ..pipelines.corpus import FUNNEL_WINDOW_MINUTES

        within_minutes = FUNNEL_WINDOW_MINUTES
    stages = list(stages)
    parts = [
        f"""WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = '{stages[0]}' GROUP BY user_id)"""
    ]
    for k, st in enumerate(stages[1:], start=2):
        win = (
            f" AND e.ts <= p.t{k - 1} + INTERVAL {within_minutes} MINUTE"
            if within_minutes is not None else ""
        )
        parts.append(
            f""", s{k} AS (
  SELECT e.user_id, min(e.ts) AS t{k}
  FROM events e JOIN s{k - 1} p USING (user_id)
  WHERE e.event_type = '{st}' AND e.ts >= p.t{k - 1}{win}
  GROUP BY e.user_id)"""
        )
    n = len(stages)
    done = " + ".join(
        f"CASE WHEN s{k}.t{k} IS NULL THEN 0 ELSE 1 END"
        for k in range(2, n + 1)
    )
    tcols = ", ".join(f"s{k}.t{k}" for k in range(1, n + 1))
    joins = "".join(
        f" LEFT JOIN s{k} ON s{k}.user_id = s1.user_id"
        for k in range(2, n + 1)
    )
    return (
        f"{''.join(parts)}\nSELECT s1.user_id, "
        f"CAST(1 + {done} AS BIGINT) AS stages_completed, {tcols} "
        f"FROM s1{joins}"
    )


def cohort_retention_sql() -> str:
    """Weekly cohort retention — ground truth for
    stages/temporal.cohort_retention: epoch-day // 7 week indices
    (convention-free), users counted once per (cohort, offset)."""
    wk = "(date_diff('second', TIMESTAMP '1970-01-01', {c}) // 86400) // 7"
    return f"""WITH f AS (
  SELECT user_id, min(ts) AS t0 FROM events GROUP BY user_id
),
a AS (
  SELECT DISTINCT e.user_id,
    {wk.format(c='f.t0')} AS cohort_week,
    {wk.format(c='e.ts')} - {wk.format(c='f.t0')} AS week_offset
  FROM events e JOIN f USING (user_id)
)
SELECT CAST(cohort_week AS BIGINT) AS cohort_week,
       CAST(week_offset AS BIGINT) AS week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM a GROUP BY cohort_week, week_offset"""
