"""DuckDB oracle for the flagship KG pipeline.

The synthetic corpus' field model (sources/synth.py) is closed-form in
``doc_id``, so the EXPECTED canonical triples — after extraction,
window argmax, compound split, entity linking and
``normalize_answer`` canonicalization — are expressible as one SQL
query over the driver's ``documents`` view.  This makes the whole
pipeline oracle-checkable end-to-end: the driver runs
``queries()['kg_triples']`` and this SQL side-by-side and compares
row-counts + schema + value hashes.

The SQL is BUILT from the same constant tables the generator uses, so
generator and oracle cannot drift apart.
"""

from __future__ import annotations

from .synth import (
    BAIRROS,
    CITIES,
    FIRST_NAMES,
    LAST_NAMES,
    ORGAOS,
    STREETS,
    UF_CODES,
)


def _lst(values) -> str:
    inner = ",".join("'" + v.replace("'", "''") + "'" for v in values)
    return f"[{inner}]"


URL_SQL = "'https://example.org/'||lpad(CAST(doc_id AS VARCHAR),8,'0')"

# (qa leaf, normalized-obj SQL, presence predicate or None)
# The obj expression yields normalize_answer(linked surface form):
# digits lose punctuation, words lose accents+case; estado is linked to
# its UF code before normalization.
_FIELD_SQL = [
    ("etiqueta", "lpad(CAST((doc_id*17+3)%1000000 AS VARCHAR),6,'0')", "doc_id%7<>3"),
    ("agencia", "CAST((doc_id*31+7)%9000+1000 AS VARCHAR)", None),
    (
        "conta_corrente",
        "CAST((doc_id*97+13)%90000+10000 AS VARCHAR)||CAST(doc_id%10 AS VARCHAR)",
        None,
    ),
    (
        "cpf",
        "lpad(CAST((doc_id*7919+12345678901)%100000000000 AS VARCHAR),11,'0')",
        None,
    ),
    (
        "nome_completo",
        f"lower({_lst(FIRST_NAMES)}[doc_id%16+1]||' '||{_lst(LAST_NAMES)}[(doc_id//16)%16+1])",
        None,
    ),
    ("n_doc_serie", "CAST((doc_id*53+11)%10000000 AS VARCHAR)", None),
    ("orgao_emissor", f"lower({_lst(ORGAOS)}[doc_id%6+1])", None),
    (
        "data_emissao",
        "strftime(DATE '2015-01-01' + CAST((doc_id*13)%3650 AS INTEGER), '%d%m%Y')",
        None,
    ),
    (
        "data_nascimento",
        "strftime(DATE '1950-01-01' + CAST((doc_id*29)%18250 AS INTEGER), '%d%m%Y')",
        None,
    ),
    (
        "nome_mae",
        f"lower({_lst(FIRST_NAMES)}[(doc_id*3+1)%16+1]||' '||{_lst(LAST_NAMES)}[(doc_id*5+2)%16+1])",
        None,
    ),
    (
        "nome_pai",
        f"lower({_lst(FIRST_NAMES)}[(doc_id*7+2)%16+1]||' '||{_lst(LAST_NAMES)}[(doc_id*11+4)%16+1])",
        "doc_id%5<>0",
    ),
    (
        "endereco.logradouro",
        f"lower('RUA '||{_lst(STREETS)}[(doc_id*7)%12+1])",
        None,
    ),
    ("endereco.numero", "CAST(doc_id%2000+1 AS VARCHAR)", None),
    (
        "endereco.complemento",
        "lower('APTO '||CAST(doc_id%90+1 AS VARCHAR))",
        "doc_id%3<>0",
    ),
    ("endereco.bairro", f"lower({_lst(BAIRROS)}[doc_id%8+1])", None),
    ("endereco.cidade", f"lower({_lst(CITIES)}[doc_id%10+1])", None),
    ("endereco.estado", f"lower({_lst(UF_CODES)}[(doc_id*5)%27+1])", None),
    (
        "endereco.cep",
        "lpad(CAST((doc_id*811+9000000)%100000000 AS VARCHAR),8,'0')",
        None,
    ),
]


def oracle_eval_by_qaid_sql() -> str:
    """Expected per-group EM/F1 partial sums for the flagship pipeline
    evaluated against its own synthetic ground truth
    (pipelines/kg.kg_eval_metrics granularity='qa_id').

    Every (url, qa_id) best answer must match its label exactly — the
    extraction fidelity statement (P/R >= 0.95 target at EM=1.0 here) —
    so each of the schema's qa_id groups scores (n, n*1e6, n), plus the
    'form' project rollup and the 'all' overall group.
    """
    from ..pipelines.kg import KGConfig

    cfg = KGConfig()
    qa_ids = sorted(cfg.resolved_type_names())
    k = len(qa_ids)
    selects = [
        "WITH n AS (SELECT CAST(count(*) AS BIGINT) AS c FROM documents)"
    ]
    rows = [
        f"SELECT '{qa_id}' AS grp, c AS n_exact, "
        f"c * 1000000 AS f1_sum_x1e6, c AS total FROM n"
        for qa_id in qa_ids
    ]
    for grp, mult in (("form", k), ("all", k)):
        rows.append(
            f"SELECT '{grp}', c * {mult}, c * {mult} * 1000000, c * {mult} FROM n"
        )
    return selects[0] + " " + " UNION ALL ".join(rows)


def _split_group_universe():
    """Group keys of the split-stage variant rows (stages/postprocess.py
    compound explosion, reference features/postprocess.py:73-246) as seen
    by evalqa.groups_of_id: per simple field the original and ``*``-clean
    variants; the compound original; per compound member the ``~member``
    and ``~member*`` variants.  Returns (typename_groups, rows_per_doc,
    project_rows_per_doc)."""
    from ..registry import QuestionRegistry
    from ..stages.score import _QAPlan

    plan = _QAPlan(QuestionRegistry.default(), None, None, "first")
    groups = []
    n_rows = 0  # split rows per document
    n_form = 0  # rows contributing to the project rollup (no '~')
    for qa_id in plan.type_names:
        is_compound, _qs, leaf_or_sig = plan.plan[qa_id]
        if is_compound:
            groups.append(qa_id)  # original compound row
            n_rows += 1
            n_form += 1
            for member in leaf_or_sig:
                groups.append(f"{qa_id}~{member}")
                groups.append(f"{qa_id}~{member}*")
                n_rows += 2
        else:
            groups.append(qa_id)
            groups.append(f"{qa_id}*")
            n_rows += 2
            n_form += 2
    return groups, n_rows, n_form


def oracle_eval_by_typename_sql() -> str:
    """Expected metrics for granularity='typename' (split variant rows,
    reference metrics_by_typenames.json): perfect EM/F1, so every group
    scores (count, count*1e6, count) where count derives from the
    variant-row algebra of the compound explosion."""
    groups, n_rows, n_form = _split_group_universe()
    rows = [
        "WITH n AS (SELECT CAST(count(*) AS BIGINT) AS c FROM documents)"
    ]
    body = [
        f"SELECT 'all' AS grp, c * {n_rows} AS n_exact, "
        f"c * {n_rows} * 1000000 AS f1_sum_x1e6, c * {n_rows} AS total FROM n",
        f"SELECT 'form', c * {n_form}, c * {n_form} * 1000000, c * {n_form} FROM n",
    ]
    for g in groups:
        body.append(f"SELECT '{g}', c, c * 1000000, c FROM n")
    return rows[0] + " " + " UNION ALL ".join(body)


def oracle_eval_by_document_sql() -> str:
    """Expected metrics for granularity='document' (reference
    metrics_by_documents.json): one group per url scoring perfect EM/F1
    over its split variant rows, plus the 'all' rollup."""
    _groups, n_rows, _n_form = _split_group_universe()
    return f"""WITH n AS (SELECT CAST(count(*) AS BIGINT) AS c FROM documents)
SELECT 'all' AS grp, c * {n_rows} AS n_exact,
       c * {n_rows} * 1000000 AS f1_sum_x1e6, c * {n_rows} AS total FROM n
UNION ALL
SELECT {URL_SQL}, CAST({n_rows} AS BIGINT),
       CAST({n_rows} AS BIGINT) * 1000000, CAST({n_rows} AS BIGINT)
FROM documents"""


def oracle_triples_sql() -> str:
    """Expected (subj, pred, obj) set as one UNION ALL over documents."""
    selects = []
    for leaf, obj_sql, where in _FIELD_SQL:
        w = f" WHERE {where}" if where else ""
        selects.append(
            f"SELECT {URL_SQL} AS subj, 'form.{leaf}' AS pred, "
            f"{obj_sql} AS obj FROM documents{w}"
        )
    return " UNION ALL ".join(selects)


def _graph_cte() -> str:
    """Shared CTE prefix for the KG graph oracles: triples -> DISTINCT
    (subj, obj) over the graph predicates -> a<b co-mention edges ->
    symmetric edges -> per-node out-weights.  Mirrors
    stages/graph.cooccur_edges(symmetric=True) + the pagerank
    out-weight aggregate."""
    from ..stages.graph import GRAPH_PREDS

    preds = ",".join(f"'{p}'" for p in GRAPH_PREDS)
    return f"""WITH t AS ({oracle_triples_sql()}),
g AS (SELECT DISTINCT subj, obj FROM t WHERE pred IN ({preds})),
e0 AS (SELECT x.obj AS a, y.obj AS b, CAST(count(*) AS BIGINT) AS cnt
       FROM g x JOIN g y ON x.subj = y.subj AND x.obj < y.obj
       GROUP BY x.obj, y.obj),
e AS (SELECT a, b, cnt FROM e0 UNION ALL SELECT b, a, cnt FROM e0),
w AS (SELECT a AS node, CAST(SUM(cnt) AS BIGINT) AS w FROM e GROUP BY a)"""


def kg_degree_sql() -> str:
    """(node, out_degree, in_degree) over the full triples table."""
    return f"""WITH t AS ({oracle_triples_sql()}),
o AS (SELECT subj AS node, CAST(count(*) AS BIGINT) AS c FROM t GROUP BY subj),
i AS (SELECT obj AS node, CAST(count(*) AS BIGINT) AS c FROM t GROUP BY obj)
SELECT COALESCE(o.node, i.node) AS node,
       COALESCE(o.c, 0) AS out_degree,
       COALESCE(i.c, 0) AS in_degree
FROM o FULL OUTER JOIN i ON o.node = i.node"""


def kg_cooccur_sql() -> str:
    """a<b co-mention edge list with document counts."""
    return f"{_graph_cte()} SELECT a, b, cnt FROM e0"


def kg_pagerank_sql(n_iters: int = 5) -> str:
    """Integer-exact weighted PageRank, bit-identical to
    stages/graph.pagerank: r0 = SCALE; r_(k+1)(v) = TELEPORT +
    (85 * sum((r_k(u) * w_uv) // W(u))) // 100, all BIGINT."""
    from ..stages.graph import (
        PAGERANK_DAMP_DEN,
        PAGERANK_DAMP_NUM,
        PAGERANK_SCALE,
    )

    teleport = (
        PAGERANK_SCALE * (PAGERANK_DAMP_DEN - PAGERANK_DAMP_NUM)
    ) // PAGERANK_DAMP_DEN
    parts = [_graph_cte()]
    parts.append(
        f", r0 AS (SELECT node, CAST({PAGERANK_SCALE} AS BIGINT) AS rank FROM w)"
    )
    for k in range(1, n_iters + 1):
        prev = f"r{k - 1}"
        parts.append(
            f""", r{k} AS (
SELECT w.node,
       CAST({teleport} + ({PAGERANK_DAMP_NUM} * COALESCE(s.c, 0))
            // {PAGERANK_DAMP_DEN} AS BIGINT) AS rank
FROM w LEFT JOIN (
    SELECT e.b AS node, SUM((p.rank * e.cnt) // w2.w) AS c
    FROM e JOIN {prev} p ON e.a = p.node JOIN w w2 ON w2.node = e.a
    GROUP BY e.b
) s ON s.node = w.node)"""
        )
    parts.append(f" SELECT node, rank AS rank_int FROM r{n_iters}")
    return "".join(parts)


def kg_ppr_sql(n_iters: int = 5, n_seeds: int = 3) -> str:
    """Personalized PageRank — ground truth for
    stages/graph.pagerank(seeds=min_k_nodes(edges, n_seeds)): rank
    mass starts on, and teleports back to, the ``n_seeds``
    lexicographically smallest nodes; otherwise bit-identical to
    kg_pagerank_sql's iterated BIGINT scheme."""
    from ..stages.graph import (
        PAGERANK_DAMP_DEN,
        PAGERANK_DAMP_NUM,
        PAGERANK_SCALE,
    )

    teleport = (
        PAGERANK_SCALE * (PAGERANK_DAMP_DEN - PAGERANK_DAMP_NUM)
    ) // PAGERANK_DAMP_DEN
    parts = [_graph_cte()]
    parts.append(
        f""", sd AS (SELECT node FROM w ORDER BY node LIMIT {n_seeds}),
r0 AS (SELECT w.node,
       CAST(CASE WHEN w.node IN (SELECT node FROM sd)
            THEN {PAGERANK_SCALE} ELSE 0 END AS BIGINT) AS rank FROM w)"""
    )
    for k in range(1, n_iters + 1):
        prev = f"r{k - 1}"
        parts.append(
            f""", r{k} AS (
SELECT w.node,
       CAST(CASE WHEN w.node IN (SELECT node FROM sd)
                 THEN {teleport} ELSE 0 END
            + ({PAGERANK_DAMP_NUM} * COALESCE(s.c, 0))
            // {PAGERANK_DAMP_DEN} AS BIGINT) AS rank
FROM w LEFT JOIN (
    SELECT e.b AS node, SUM((p.rank * e.cnt) // w2.w) AS c
    FROM e JOIN {prev} p ON e.a = p.node JOIN w w2 ON w2.node = e.a
    GROUP BY e.b
) s ON s.node = w.node)"""
        )
    parts.append(f" SELECT node, rank AS rank_int FROM r{n_iters}")
    return "".join(parts)


def kg_sssp_sql(n_rounds: int = 8, n_seeds: int = 2) -> str:
    """Multi-source weighted shortest paths — ground truth for
    stages/graph.shortest_paths: unrolled Bellman-Ford rounds (edge
    cost = cnt) from the ``n_seeds`` smallest nodes; rounds past the
    fixpoint are no-ops, so the engine's early exit matches."""
    parts = [_graph_cte()]
    # em: MATERIALIZED — the unrolled rounds reference the edges 2x per
    # round; a lazy CTE would re-evaluate the whole triples derivation
    # (re-opening the parquet) per reference and exhaust file handles
    parts.append(
        f""", em AS MATERIALIZED (SELECT a, b, cnt FROM e),
sd AS (SELECT node FROM w ORDER BY node LIMIT {n_seeds}),
d0 AS (SELECT node, CAST(0 AS BIGINT) AS dist FROM sd)"""
    )
    for k in range(1, n_rounds + 1):
        prev = f"d{k - 1}"
        parts.append(
            f""", d{k} AS (
SELECT node, CAST(MIN(dist) AS BIGINT) AS dist FROM (
  SELECT node, dist FROM {prev}
  UNION ALL
  SELECT em.b AS node, p.dist + em.cnt AS dist
  FROM em JOIN {prev} p ON em.a = p.node
) u GROUP BY node)"""
        )
    parts.append(f" SELECT node, dist FROM d{n_rounds}")
    return "".join(parts)


def kg_walks_sql(n_steps: int = 4) -> str:
    """Deterministic random walks — ground truth for
    stages/graph.random_walks: node ids are row_number()-1 in string
    order; step ``s`` from node ``u`` moves to the neighbor ``v``
    minimizing ``((u*K1 + s*K2 + v) % 2^31 * LCG_MULT + LCG_INC) %
    2^31`` (ties: smallest v).  Inner mod BEFORE the multiply keeps
    every product < 2^62 — BIGINT-exact in both engines."""
    from ..stages.balance import LCG_INC, LCG_MULT
    from ..stages.graph import _WALK_MOD, WALK_K1, WALK_K2

    parts = [_graph_cte()]
    parts.append(
        """, v AS (SELECT node,
        CAST(row_number() OVER (ORDER BY node) - 1 AS BIGINT) AS id FROM w),
ei AS (SELECT va.id AS a, vb.id AS b
       FROM e JOIN v va ON va.node = e.a JOIN v vb ON vb.node = e.b),
s0 AS (SELECT id AS walk, id AS cur FROM v)"""
    )
    for s in range(1, n_steps + 1):
        prev = f"s{s - 1}"
        parts.append(
            f""", s{s} AS (
SELECT {prev}.walk, n.b AS cur FROM {prev} JOIN (
  SELECT a, b FROM (
    SELECT a, b, row_number() OVER (
      PARTITION BY a
      ORDER BY (((a * {WALK_K1} + {s} * {WALK_K2} + b) % {_WALK_MOD})
                * {LCG_MULT} + {LCG_INC}) % {_WALK_MOD}, b
    ) AS rn FROM ei) WHERE rn = 1
) n ON n.a = {prev}.cur)"""
        )
    selects = [
        f"SELECT walk, CAST({s} AS BIGINT) AS step, cur AS node_id FROM s{s}"
        for s in range(0, n_steps + 1)
    ]
    parts.append(" " + " UNION ALL ".join(selects))
    return "".join(parts)


def kg_neighbors_sql(k: int = 3) -> str:
    """Top-k co-mentioned neighbors per node, (cnt desc, neighbor asc)."""
    return f"""{_graph_cte()}
SELECT a AS node, rnk AS rank, b AS neighbor, cnt FROM (
    SELECT a, b, cnt,
           row_number() OVER (PARTITION BY a ORDER BY cnt DESC, b) AS rnk
    FROM e
) WHERE rnk <= {k}"""


def kg_degree_hist_sql() -> str:
    """Co-mention degree distribution — ground truth for
    stages/graph.degree_histogram."""
    return f"""{_graph_cte()},
d AS (SELECT a, CAST(count(*) AS BIGINT) AS degree FROM e GROUP BY a)
SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
FROM d GROUP BY degree"""


def kg_neighbor_sample_sql(k: int = 5) -> str:
    """Deterministic GNN fanout sample per node: k neighbors in
    (md5(node:neighbor), neighbor) order — ground truth for
    stages/graph.neighbor_sample (both engines hash the same string,
    so the draw is identical)."""
    return f"""{_graph_cte()}
SELECT a AS node, rnk AS rank, b AS neighbor FROM (
    SELECT a, b,
           row_number() OVER (
               PARTITION BY a ORDER BY md5(a || ':' || b), b
           ) AS rnk
    FROM e
) WHERE rnk <= {k}"""


def oracle_entities_sql() -> str:
    """Expected canonical entity table: mention counts per normalized
    object over the triples oracle (checks the SALTED two-phase
    aggregation end to end, incl. the deliberate 'ssp' head entity)."""
    return (
        f"SELECT obj AS entity_id, CAST(count(*) AS BIGINT) AS n_mentions "
        f"FROM ({oracle_triples_sql()}) GROUP BY obj"
    )


def kg_components_sql() -> str:
    """Min-string label per co-mention-graph node (transitive closure
    over the symmetric edge CTE) — ground truth for
    stages/graph.kg_components' hashed star contraction + relabel."""
    cte = _graph_cte().replace("WITH ", "WITH RECURSIVE ", 1)
    return f"""{cte},
cc AS (
  SELECT a AS node, a AS label FROM e
  UNION
  SELECT e.a, cc.label FROM e JOIN cc ON cc.node = e.b
)
SELECT node AS entity, min(label) AS component FROM cc GROUP BY node"""


def kg_triangles_sql() -> str:
    """Per-node triangle counts over the a<b edge CTE (each triangle
    x<y<z is the unique row pattern (x,y)+(y,z)+(x,z) in e0) — ground
    truth for stages/graph.triangle_counts' degree-ordered wedge join."""
    return f"""{_graph_cte()},
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e0 e1
  JOIN e0 e2 ON e2.a = e1.b
  JOIN e0 e3 ON e3.a = e1.a AND e3.b = e2.b
),
corners AS (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
)
SELECT n.node AS entity,
       CAST(COALESCE(t.c, 0) AS BIGINT) AS n_triangles
FROM w n LEFT JOIN (
  SELECT node, count(*) AS c FROM corners GROUP BY node
) t ON t.node = n.node"""


def kg_clustering_sql() -> str:
    """Per-node local clustering coefficient 2*T/(d*(d-1)) over the
    a<b edge CTE (0.0 below degree 2) — ground truth for
    stages/graph.clustering_coefficient."""
    return f"""{_graph_cte()},
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e0 e1
  JOIN e0 e2 ON e2.a = e1.b
  JOIN e0 e3 ON e3.a = e1.a AND e3.b = e2.b
),
corners AS (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
),
tc AS (SELECT node, count(*) AS c FROM corners GROUP BY node),
deg AS (SELECT node, CAST(count(*) AS BIGINT) AS d
        FROM (SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0)
        GROUP BY node)
SELECT deg.node AS entity,
       deg.d AS degree,
       CAST(COALESCE(tc.c, 0) AS BIGINT) AS n_triangles,
       CASE WHEN deg.d >= 2
            THEN CAST(2 * COALESCE(tc.c, 0) AS DOUBLE)
                 / (deg.d * (deg.d - 1))
            ELSE 0.0 END AS lcc
FROM deg LEFT JOIN tc ON tc.node = deg.node"""


def kg_merge_sql() -> str:
    """Latest-wins fusion of the base triples (src_ts=1) with the
    even-doc-shard re-extraction (src_ts=2) — ground truth for
    stages/triples.merge_triples."""
    return f"""WITH t AS ({oracle_triples_sql()}),
u AS (
  SELECT subj, pred, obj, CAST(1 AS BIGINT) AS src_ts FROM t
  UNION ALL
  SELECT subj, pred, obj, CAST(2 AS BIGINT) AS src_ts FROM t
  WHERE subj IN (SELECT {URL_SQL} FROM documents WHERE doc_id % 2 = 0)
)
SELECT subj, pred, obj, src_ts FROM (
  SELECT *, row_number() OVER (
      PARTITION BY subj, pred ORDER BY src_ts DESC, obj) AS rn
  FROM u
) WHERE rn = 1"""


def kg_from_crawl_sql() -> str:
    """Triples restricted to documents whose crawl host survives the
    blocklist — ground truth for the composed intake -> extraction
    query (_q_kg_from_crawl)."""
    from .oracle_crawl import BLOCKED_SOURCES

    blocked = ",".join(f"'{s}'" for s in BLOCKED_SOURCES)
    return f"""WITH t AS ({oracle_triples_sql()})
SELECT subj, pred, obj FROM t
WHERE subj IN (
  SELECT {URL_SQL} FROM documents WHERE source NOT IN ({blocked})
)"""


def kg_temporal_sql() -> str:
    """Triples joined with the per-url LATEST content-validity interval
    (SCD-2 gaps-and-islands over the closed-form crawl CTE, then the
    row_number argmax on valid_to) — ground truth for
    pipelines/kg.kg_temporal.  The crawl url and the page subject url
    both embed the zero-padded doc id, so the join key is derived by
    suffix remap exactly as the Ray side does."""
    from .oracle_crawl import _crawl_cte

    return f"""{_crawl_cte()},
iv AS (
  SELECT url,
         min(warc_ts) AS valid_from,
         max(warc_ts) AS valid_to
  FROM (
    SELECT url, content_id, warc_ts,
           SUM(CASE WHEN prev IS NULL OR prev <> content_id THEN 1 ELSE 0 END)
             OVER (PARTITION BY url ORDER BY warc_ts
                   ROWS UNBOUNDED PRECEDING) AS run_id
    FROM (
      SELECT url, content_id, warc_ts,
             lag(content_id) OVER (PARTITION BY url ORDER BY warc_ts) AS prev
      FROM c
    )
  ) GROUP BY url, run_id
),
liv AS (
  SELECT 'https://example.org/'||right(url, 8) AS subj,
         valid_from, valid_to
  FROM (
    SELECT *, row_number() OVER (
        PARTITION BY url ORDER BY valid_to DESC) AS rn
    FROM iv
  ) WHERE rn = 1
),
t AS ({oracle_triples_sql()})
SELECT t.subj, t.pred, t.obj, liv.valid_from, liv.valid_to
FROM t JOIN liv ON liv.subj = t.subj"""


def kg_communities_sql(n_rounds: int = 3, self_loops: bool = False) -> str:
    """Fixed-round synchronous label propagation, iterated CTEs (the
    kg_pagerank_sql pattern): per round each node takes the neighbor
    label with the greatest incident weight, ties to the
    lexicographic-min label — ground truth for
    stages/graph.label_propagation.

    ``self_loops=True`` mirrors ``graph.with_self_loops``: the edge CTE
    is augmented with one (node, node, max incident weight) row per
    node, which stabilizes pendant-pair oscillation (ground truth for
    the kg_communities_stable query)."""
    parts = [_graph_cte()]
    edge_cte = "e"
    if self_loops:
        edge_cte = "es"
        parts.append(
            """, es AS (
  SELECT a, b, cnt FROM e
  UNION ALL
  SELECT a, a, CAST(MAX(cnt) AS BIGINT) FROM e GROUP BY a
)"""
        )
    parts.append(", l0 AS (SELECT node, node AS label FROM w)")
    for k in range(1, n_rounds + 1):
        prev = f"l{k - 1}"
        parts.append(
            f""", l{k} AS (
  SELECT node, label FROM (
    SELECT e.a AS node, l.label,
           row_number() OVER (PARTITION BY e.a
               ORDER BY SUM(e.cnt) DESC, l.label) AS rn
    FROM {edge_cte} e JOIN {prev} l ON l.node = e.b
    GROUP BY e.a, l.label
  ) WHERE rn = 1
)"""
        )
    parts.append(
        f" SELECT node AS entity, label AS community FROM l{n_rounds}"
    )
    return "".join(parts)


def kg_edge_jaccard_sql() -> str:
    """Per-edge neighborhood Jaccard numerator/denominator — ground
    truth for stages/graph.edge_jaccard: common_cnt = triangles through
    the edge (via the kg_triangles_sql tri pattern), union_cnt =
    deg(a) + deg(b) - common_cnt, all BIGINT."""
    return f"""{_graph_cte()},
d AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY a),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e0 e1
  JOIN e0 e2 ON e2.a = e1.b
  JOIN e0 e3 ON e3.a = e1.a AND e3.b = e2.b
),
te AS (
  SELECT x AS a, y AS b FROM tri
  UNION ALL SELECT y, z FROM tri
  UNION ALL SELECT x, z FROM tri
),
cn AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c FROM te GROUP BY a, b)
SELECT e0.a, e0.b,
       CAST(COALESCE(cn.c, 0) AS BIGINT) AS common_cnt,
       CAST(da.deg + db.deg - COALESCE(cn.c, 0) AS BIGINT) AS union_cnt
FROM e0
LEFT JOIN cn ON cn.a = e0.a AND cn.b = e0.b
JOIN d da ON da.node = e0.a
JOIN d db ON db.node = e0.b"""


def kg_link_predict_sql(k: int = 20, max_middle_degree: int = 64) -> str:
    """Top-k non-adjacent pairs by common-neighbor count (hub-capped
    middles, deterministic (cnt desc, a, b) ties) — ground truth for
    stages/graph.link_predict."""
    return f"""{_graph_cte()},
d AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY a),
wp AS (
  SELECT e1.a AS a, e2.a AS b, CAST(count(*) AS BIGINT) AS common_cnt
  FROM e e1
  JOIN d m ON m.node = e1.b AND m.deg <= {max_middle_degree}
  JOIN e e2 ON e2.b = e1.b AND e1.a < e2.a
  GROUP BY e1.a, e2.a
)
SELECT a, b, common_cnt FROM wp
WHERE NOT EXISTS (SELECT 1 FROM e0 WHERE e0.a = wp.a AND e0.b = wp.b)
ORDER BY common_cnt DESC, a, b LIMIT {k}"""


def kg_bfs_sql(n_seeds: int = 4, max_rounds: int = 32) -> str:
    """Bounded multi-source BFS distances (seeds = n lexicographically
    smallest nodes) — ground truth for stages/graph.bfs_layers.  The
    recursive CTE carries (node, dist) states deduplicated by UNION and
    capped by the dist guard; min(dist) per node is the BFS layer."""
    cte = _graph_cte().replace("WITH ", "WITH RECURSIVE ", 1)
    return f"""{cte},
seeds AS (SELECT node FROM w ORDER BY node LIMIT {n_seeds}),
bfs(node, dist) AS (
  SELECT node, CAST(0 AS BIGINT) FROM seeds
  UNION
  SELECT e.b, bfs.dist + 1 FROM bfs JOIN e ON e.a = bfs.node
  WHERE bfs.dist < {max_rounds}
)
SELECT node, CAST(MIN(dist) AS BIGINT) AS dist FROM bfs GROUP BY node"""


def kg_kcore_sql(k: int = 19, n_rounds: int = 16) -> str:
    """Fixed-round synchronous k-core peeling, unrolled CTEs (the
    kg_communities_sql pattern) — ground truth for
    stages/graph.k_core: round i keeps nodes whose degree among round
    i-1 survivors is >= k; converged rounds are no-ops."""
    parts = [_graph_cte()]
    # every c_i is referenced 3x by round i+1 (FROM + two IN filters):
    # without MATERIALIZED, DuckDB inlines CTEs and the plan blows up
    # 3^n_rounds (reproduced as an fd-exhaustion at n_rounds=16)
    parts.append(", c0 AS MATERIALIZED (SELECT a, b FROM e)")
    for i in range(1, n_rounds + 1):
        prev = f"c{i - 1}"
        parts.append(
            f""", s{i} AS MATERIALIZED (
  SELECT a AS node FROM {prev} GROUP BY a HAVING count(*) >= {k}),
c{i} AS MATERIALIZED (SELECT a, b FROM {prev}
  WHERE a IN (SELECT node FROM s{i}) AND b IN (SELECT node FROM s{i}))"""
        )
    parts.append(f" SELECT node AS entity FROM s{n_rounds}")
    return "".join(parts)


def kg_wcore_sql(n_rounds: int = 16, k_divisor: int = 8) -> str:
    """Weighted k-core (s-core) peeling, unrolled CTEs — ground truth
    for stages/graph.k_core(weighted=True) as driven by _q_kg_wcore:
    round i keeps nodes whose SUM(cnt) among round i-1 survivors is
    >= k, with k = GREATEST(2, n_docs // k_divisor) so the threshold
    tracks the corpus scale (co-mention counts grow with documents)."""
    parts = [_graph_cte()]
    parts.append(
        f", kd AS (SELECT GREATEST(2, count(*) // {k_divisor}) AS k "
        "FROM documents)"
    )
    parts.append(", w0 AS MATERIALIZED (SELECT a, b, cnt FROM e)")
    for i in range(1, n_rounds + 1):
        prev = f"w{i - 1}"
        parts.append(
            f""", ws{i} AS MATERIALIZED (
  SELECT a AS node FROM {prev} GROUP BY a
  HAVING SUM(cnt) >= (SELECT k FROM kd)),
w{i} AS MATERIALIZED (SELECT a, b, cnt FROM {prev}
  WHERE a IN (SELECT node FROM ws{i}) AND b IN (SELECT node FROM ws{i}))"""
        )
    parts.append(f" SELECT node AS entity FROM ws{n_rounds}")
    return "".join(parts)


def kg_ktruss_sql(k: int = 4, n_rounds: int = 8) -> str:
    """Fixed-round k-truss peeling, unrolled MATERIALIZED CTEs (the
    kg_kcore_sql pattern) — ground truth for stages/graph.k_truss:
    round i keeps edges with >= k-2 common neighbors among round i-1
    survivors; converged rounds are no-ops."""
    parts = [_graph_cte()]
    parts.append(", t0 AS MATERIALIZED (SELECT a, b FROM e0)")
    for i in range(1, n_rounds + 1):
        prev = f"t{i - 1}"
        parts.append(
            f""", sym{i} AS MATERIALIZED (
  SELECT a, b FROM {prev} UNION ALL SELECT b, a FROM {prev}),
t{i} AS MATERIALIZED (
  SELECT t.a, t.b FROM {prev} t
  JOIN sym{i} e1 ON e1.a = t.a
  JOIN sym{i} e2 ON e2.a = t.b AND e2.b = e1.b
  GROUP BY t.a, t.b HAVING count(*) >= {k - 2})"""
        )
    parts.append(f" SELECT a, b FROM t{n_rounds}")
    return "".join(parts)


def kg_matching_sql(n_rounds: int = 8) -> str:
    """Deterministic greedy maximal matching, unrolled MATERIALIZED
    CTEs — ground truth for stages/graph.maximal_matching: per round,
    every alive node proposes to its alive neighbor with the smallest
    (md5(name || ':round'), name) key — the salted-hash preference
    both engines share (min NAME would be pathological on
    sequentially-named graphs); mutual proposals match and both
    endpoints leave."""
    parts = [_graph_cte()]
    parts.append(
        ", al0 AS MATERIALIZED (SELECT DISTINCT a AS node FROM e)"
    )
    unions = []
    for i in range(1, n_rounds + 1):
        prev = f"al{i - 1}"
        parts.append(
            f""", ei{i} AS MATERIALIZED (
  SELECT a, b FROM e
  WHERE a IN (SELECT node FROM {prev})
    AND b IN (SELECT node FROM {prev})),
pi{i} AS MATERIALIZED (
  SELECT u, v FROM (
    SELECT a AS u, b AS v, row_number() OVER (
      PARTITION BY a ORDER BY md5(b || ':{i}'), b) AS rn
    FROM ei{i}) WHERE rn = 1),
mi{i} AS MATERIALIZED (
  SELECT p1.u AS a, p1.v AS b FROM pi{i} p1
  JOIN pi{i} p2 ON p2.u = p1.v AND p2.v = p1.u
  WHERE p1.u < p1.v),
al{i} AS MATERIALIZED (
  SELECT node FROM {prev}
  WHERE node NOT IN (SELECT a FROM mi{i} UNION ALL SELECT b FROM mi{i}))"""
        )
        unions.append(f"SELECT a, b FROM mi{i}")
    parts.append(" " + " UNION ALL ".join(unions))
    return "".join(parts)


def kg_ball2_sql() -> str:
    """Exact 2-hop neighborhood sizes — ground truth for
    stages/graph.two_hop_counts: distinct nodes within distance <= 2,
    excluding self, over the symmetric co-mention edges."""
    return f"""{_graph_cte()},
pairs AS (
  SELECT a, b AS x FROM e
  UNION
  SELECT e1.a AS a, e2.b AS x FROM e e1 JOIN e e2 ON e2.a = e1.b
  WHERE e2.b <> e1.a
)
SELECT a AS entity, CAST(count(DISTINCT x) AS BIGINT) AS n_ball2
FROM pairs GROUP BY a"""


def kg_hyperball_sql() -> str:
    """Tolerance oracle for the HyperBall cross-validation (the HLL
    pattern): the exact ball sizes are SQL ground truth; the HyperBall
    estimate is deterministic (blake2b node hashes, order-free
    register max-merge), so the within-10% claim is a fixed boolean
    per corpus — `true` is the verified expectation at every sf dir."""
    return f"""{_graph_cte()},
pairs AS (
  SELECT a, b AS x FROM e
  UNION
  SELECT e1.a AS a, e2.b AS x FROM e e1 JOIN e e2 ON e2.a = e1.b
  WHERE e2.b <> e1.a
)
SELECT a AS entity, CAST(count(DISTINCT x) AS BIGINT) AS n_ball2,
       true AS hll_within_10pct
FROM pairs GROUP BY a"""


def kg_harmonic_sql() -> str:
    """Radius-2 harmonic centrality — ground truth for
    stages/graph.harmonic_centrality_2: n1 = distinct neighbors (the
    symmetric co-mention list is already distinct pairs), n2 = the
    exact 2-hop ball, harmonic2 = n1 + (n2 - n1)/2 (one IEEE halving,
    bit-identical both sides)."""
    return f"""{_graph_cte()},
pairs AS (
  SELECT a, b AS x FROM e
  UNION
  SELECT e1.a AS a, e2.b AS x FROM e e1 JOIN e e2 ON e2.a = e1.b
  WHERE e2.b <> e1.a
),
b2 AS (SELECT a AS entity, CAST(count(DISTINCT x) AS BIGINT) AS n2
       FROM pairs GROUP BY a),
d1 AS (SELECT a AS entity, CAST(count(*) AS BIGINT) AS n1
       FROM e GROUP BY a)
SELECT d1.entity, d1.n1, b2.n2,
       d1.n1 + (b2.n2 - d1.n1) / 2.0 AS harmonic2
FROM d1 JOIN b2 ON b2.entity = d1.entity"""


def kg_lift_sql(scale: int = 1_000_000) -> str:
    """Association lift per co-mention pair — ground truth for
    stages/graph.cooccur_lift: floor(cnt * N * scale / (ca * cb)) in
    HUGEINT (the engine folds Python big ints), where ca/cb are the
    out-weights of the symmetric list (== both-endpoint weighted
    degrees of the a<b pairs) and N = SUM(cnt) over the a<b list."""
    return f"""{_graph_cte()},
nt AS (SELECT CAST(SUM(cnt) AS HUGEINT) AS n FROM e0)
SELECT e0.a, e0.b, e0.cnt,
       CAST((CAST(e0.cnt AS HUGEINT) * nt.n * {scale})
            // (CAST(wa.w AS HUGEINT) * CAST(wb.w AS HUGEINT)) AS BIGINT)
         AS lift_x1e6
FROM e0
JOIN w wa ON wa.node = e0.a
JOIN w wb ON wb.node = e0.b
CROSS JOIN nt"""


def kg_assortativity_sql() -> str:
    """Degree assortativity over the symmetric co-mention graph —
    ground truth for stages/graph.assortativity: symmetric marginals
    collapse Pearson to (m*sxy - sx^2) / (m*sxx - sx^2), folded in
    HUGEINT with ONE final double division (the engine folds Python
    big ints and performs the same single division)."""
    return f"""{_graph_cte()},
d AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY a),
p AS (SELECT CAST(da.deg AS HUGEINT) AS x, CAST(db.deg AS HUGEINT) AS y
      FROM e JOIN d da ON da.node = e.a JOIN d db ON db.node = e.b),
s AS (SELECT CAST(count(*) AS HUGEINT) AS m, SUM(x) AS sx,
             SUM(x*x) AS sxx, SUM(x*y) AS sxy FROM p)
SELECT CAST(m AS BIGINT) AS m,
       CASE WHEN m*sxx - sx*sx = 0 THEN NULL
            ELSE CAST(m*sxy - sx*sx AS DOUBLE)
                 / CAST(m*sxx - sx*sx AS DOUBLE) END AS assortativity
FROM s"""


def kg_hits_sql() -> str:
    """Integer-exact HITS over the directed (subj -> obj) assertion
    graph — ground truth for stages/graph.hits_scores: distinct pairs,
    h1 = out-degree, a1 = sum of adjacent h1, h2 = sum of adjacent a1,
    all BIGINT (no normalization inside the fixed 2-iteration budget,
    so sums are bit-exact in both engines)."""
    return f"""WITH t AS ({oracle_triples_sql()}),
e AS (SELECT DISTINCT subj, obj FROM t),
h1 AS (SELECT subj AS node, CAST(count(*) AS BIGINT) AS w
       FROM e GROUP BY subj),
a1 AS (SELECT e.obj AS node, CAST(SUM(h1.w) AS BIGINT) AS w
       FROM e JOIN h1 ON h1.node = e.subj GROUP BY e.obj),
h2 AS (SELECT e.subj AS node, CAST(SUM(a1.w) AS BIGINT) AS w
       FROM e JOIN a1 ON a1.node = e.obj GROUP BY e.subj),
n AS (SELECT subj AS node FROM e UNION SELECT obj AS node FROM e)
SELECT n.node,
       CAST(COALESCE(h2.w, 0) AS BIGINT) AS hub_int,
       CAST(COALESCE(a1.w, 0) AS BIGINT) AS auth_int
FROM n LEFT JOIN h2 ON h2.node = n.node LEFT JOIN a1 ON a1.node = n.node"""


def kg_diff_sql(
    added_pred: str = "form.cpf", removed_pred: str = "form.agencia"
) -> str:
    """Extractor-upgrade delta — ground truth for
    stages/triples.diff_triples as driven by _q_kg_diff: v1 = triples
    minus ``added_pred``, v2 = triples minus ``removed_pred``; the diff
    is the two set differences with a change marker."""
    return f"""WITH t AS ({oracle_triples_sql()}),
old AS (SELECT subj, pred, obj FROM t WHERE pred <> '{added_pred}'),
new AS (SELECT subj, pred, obj FROM t WHERE pred <> '{removed_pred}')
SELECT subj, pred, obj, 'added' AS change
FROM (SELECT * FROM new EXCEPT SELECT * FROM old)
UNION ALL
SELECT subj, pred, obj, 'removed' AS change
FROM (SELECT * FROM old EXCEPT SELECT * FROM new)"""


def kg_degree_delta_sql(
    added_pred: str = "form.cpf", removed_pred: str = "form.agencia"
) -> str:
    """Per-node degree change from the v1/v2 churn (same extractor-
    upgrade derivation as kg_diff_sql) — ground truth for
    stages/graph.degree_delta; zero-net nodes emit nothing."""
    return f"""WITH t AS ({oracle_triples_sql()}),
old AS (SELECT subj, pred, obj FROM t WHERE pred <> '{added_pred}'),
new AS (SELECT subj, pred, obj FROM t WHERE pred <> '{removed_pred}'),
d AS (SELECT subj, obj, 1 AS sign
      FROM (SELECT * FROM new EXCEPT SELECT * FROM old)
      UNION ALL
      SELECT subj, obj, -1 AS sign
      FROM (SELECT * FROM old EXCEPT SELECT * FROM new)),
n AS (SELECT node, CAST(SUM(o) AS BIGINT) AS d_out,
             CAST(SUM(i) AS BIGINT) AS d_in
      FROM (SELECT subj AS node, sign AS o, 0 AS i FROM d
            UNION ALL
            SELECT obj, 0, sign FROM d)
      GROUP BY node)
SELECT node, d_out, d_in FROM n WHERE d_out <> 0 OR d_in <> 0"""


def kg_support_sql() -> str:
    """Per-assertion provenance — ground truth for
    stages/kgstats.triple_support."""
    return f"""WITH t AS ({oracle_triples_sql()})
SELECT pred, obj,
       CAST(count(DISTINCT subj) AS BIGINT) AS n_pages,
       min(subj) AS first_page,
       max(subj) AS last_page
FROM t GROUP BY pred, obj"""


def kg_profile_sql() -> str:
    """Per-predicate schema profile — ground truth for
    stages/kgstats.predicate_profile."""
    return f"""WITH t AS ({oracle_triples_sql()}),
s AS (SELECT pred, subj AS key, count(*) AS c FROM t GROUP BY pred, subj),
o AS (SELECT pred, obj  AS key, count(*) AS c FROM t GROUP BY pred, obj),
s2 AS (SELECT pred, CAST(count(*) AS BIGINT) AS n_keys,
              CAST(sum(c) AS BIGINT) AS n_rows,
              CAST(max(c) AS BIGINT) AS max_per FROM s GROUP BY pred),
o2 AS (SELECT pred, CAST(count(*) AS BIGINT) AS n_keys,
              CAST(max(c) AS BIGINT) AS max_per FROM o GROUP BY pred)
SELECT s2.pred AS pred, s2.n_rows AS n_triples, s2.n_keys AS n_subj,
       o2.n_keys AS n_obj, s2.max_per AS max_per_subj,
       o2.max_per AS max_per_obj
FROM s2 JOIN o2 ON s2.pred = o2.pred"""


def kg_constraints_sql() -> str:
    """Per-predicate format validation — ground truth for
    stages/kgstats.constraint_report (same rule table, both engines
    fullmatch the RE2-and-Python-common pattern subset)."""
    from ..stages.kgstats import DEFAULT_CONSTRAINTS

    values = ",".join(
        f"('{p}', '{pat}')" for p, pat in DEFAULT_CONSTRAINTS.items()
    )
    return f"""WITH t AS ({oracle_triples_sql()}),
r(pred, pat) AS (VALUES {values})
SELECT t.pred AS pred,
       CAST(sum(CASE WHEN regexp_full_match(t.obj, r.pat)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
       CAST(sum(CASE WHEN regexp_full_match(t.obj, r.pat)
                     THEN 0 ELSE 1 END) AS BIGINT) AS n_invalid
FROM t JOIN r ON t.pred = r.pred GROUP BY t.pred"""


def kg_sameas_sql(min_shared: int = 3, max_df: int = 10_000) -> str:
    """Blocking-based entity-resolution pairs — ground truth for
    stages/kgstats.sameas_pairs (same identifying-pred set, same
    semantic max_df block cap)."""
    from ..stages.kgstats import ER_PREDS

    preds = ",".join(f"'{p}'" for p in ER_PREDS)
    return f"""WITH t AS ({oracle_triples_sql()}),
attrs AS (SELECT DISTINCT subj, pred || chr(31) || obj AS attr
          FROM t WHERE pred IN ({preds})),
blocks AS (SELECT attr FROM attrs
           GROUP BY attr HAVING count(*) BETWEEN 2 AND {max_df}),
p AS (SELECT x.subj AS a, y.subj AS b
      FROM attrs x
      JOIN attrs y ON x.attr = y.attr AND x.subj < y.subj
      JOIN blocks d ON x.attr = d.attr)
SELECT a, b, CAST(count(*) AS BIGINT) AS shared
FROM p GROUP BY a, b HAVING count(*) >= {min_shared}"""


def kg_canonical_sql(min_shared: int = 3, max_df: int = 10_000) -> str:
    """sameAs-closure canonicalization — ground truth for
    stages/kgstats.canonicalize_triples: the kg_sameas pair CTE, its
    transitive closure (min-string root per component), then a
    subject rewrite + DISTINCT over the full triples table."""
    from ..stages.kgstats import ER_PREDS

    preds = ",".join(f"'{p}'" for p in ER_PREDS)
    return f"""WITH RECURSIVE t AS ({oracle_triples_sql()}),
attrs AS (SELECT DISTINCT subj, pred || chr(31) || obj AS attr
          FROM t WHERE pred IN ({preds})),
blocks AS (SELECT attr FROM attrs
           GROUP BY attr HAVING count(*) BETWEEN 2 AND {max_df}),
p AS (SELECT x.subj AS a, y.subj AS b
      FROM attrs x
      JOIN attrs y ON x.attr = y.attr AND x.subj < y.subj
      JOIN blocks d ON x.attr = d.attr),
sp AS (SELECT a, b FROM p GROUP BY a, b HAVING count(*) >= {min_shared}),
edges AS (SELECT a AS u, b AS v FROM sp UNION SELECT b, a FROM sp),
cc AS (SELECT u AS node, u AS label FROM edges
       UNION
       SELECT e.u, cc.label FROM edges e JOIN cc ON cc.node = e.v),
labels AS (SELECT node, min(label) AS root FROM cc GROUP BY node)
SELECT DISTINCT COALESCE(l.root, t.subj) AS subj, t.pred, t.obj
FROM t LEFT JOIN labels l ON l.node = t.subj"""


def kg_yield_sql() -> str:
    """Per-source-host fact yield over ALL pages (zero-triple pages
    count) — ground truth for stages/kgstats.extraction_yield."""
    return f"""WITH t AS ({oracle_triples_sql()}),
pc AS (SELECT subj, CAST(count(*) AS BIGINT) AS nt FROM t GROUP BY subj),
d AS (SELECT source || '.example.org' AS host,
             {URL_SQL} AS url
      FROM documents),
j AS (SELECT d.host, COALESCE(pc.nt, 0) AS nt
      FROM d LEFT JOIN pc ON pc.subj = d.url)
SELECT host,
       CAST(count(*) AS BIGINT) AS n_pages,
       CAST(sum(nt) AS BIGINT) AS n_triples,
       CAST(sum(nt) AS DOUBLE) / count(*) AS yield
FROM j GROUP BY host"""


def kg_retract_sql() -> str:
    """Host-retraction support delta — ground truth for
    stages/kgstats.retract_hosts: lossy (pred, obj) assertions after
    withdrawing every page of the blocked crawl sources."""
    from .oracle_crawl import BLOCKED_SOURCES

    blocked = ",".join(f"'{s}'" for s in BLOCKED_SOURCES)
    return f"""WITH t AS ({oracle_triples_sql()}),
d AS (SELECT {URL_SQL} AS url,
             CASE WHEN source IN ({blocked}) THEN 1 ELSE 0 END AS blk
      FROM documents),
j AS (SELECT t.pred, t.obj, d.blk FROM t JOIN d ON t.subj = d.url)
SELECT pred, obj,
       CAST(count(*) AS BIGINT) AS n_before,
       CAST(sum(1 - blk) AS BIGINT) AS n_after
FROM j GROUP BY pred, obj HAVING sum(blk) > 0"""


def kg_encode_sql() -> str:
    """Dense-id (h, r, t) encoding of the graph-predicate triples —
    ground truth for stages/kgstats.encode_triples (page-id head,
    predicate-list index, row_number-ordered entity-vocab index)."""
    from ..stages.graph import GRAPH_PREDS

    preds = ",".join(f"'{p}'" for p in GRAPH_PREDS)
    cases = " ".join(
        f"WHEN '{p}' THEN {i}" for i, p in enumerate(GRAPH_PREDS)
    )
    return f"""WITH tt AS ({oracle_triples_sql()}),
g AS (SELECT subj, pred, obj FROM tt WHERE pred IN ({preds})),
v AS (SELECT ent, CAST(row_number() OVER (ORDER BY ent) - 1 AS BIGINT) AS idx
      FROM (SELECT DISTINCT obj AS ent FROM g))
SELECT CAST(right(subj, 8) AS BIGINT) AS h,
       CAST(CASE pred {cases} END AS BIGINT) AS r,
       v.idx AS t
FROM g JOIN v ON v.ent = g.obj"""


def kg_negatives_sql() -> str:
    """Deterministic corruption negatives — ground truth for
    stages/kgstats.corruption_negatives: glibc LCG over
    (page_id * |preds| + pred_idx), high bits (raw >> 16) indexing the
    row_number()-ordered distinct entity vocabulary, +1 step on self-collision."""
    from ..stages.balance import LCG_INC, LCG_MULT
    from ..stages.graph import GRAPH_PREDS

    preds = ",".join(f"'{p}'" for p in GRAPH_PREDS)
    cases = " ".join(
        f"WHEN '{p}' THEN {i}" for i, p in enumerate(GRAPH_PREDS)
    )
    return f"""WITH t AS ({oracle_triples_sql()}),
g AS (SELECT subj, pred, obj FROM t WHERE pred IN ({preds})),
v AS (SELECT ent, CAST(row_number() OVER (ORDER BY ent) - 1 AS BIGINT) AS idx
      FROM (SELECT DISTINCT obj AS ent FROM g)),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
k AS (SELECT subj, pred, obj,
        ((CAST(right(subj, 8) AS BIGINT) * {len(GRAPH_PREDS)}
          + CASE pred {cases} END) * {LCG_MULT} + {LCG_INC})
        % {2**31} AS raw
      FROM g),
i AS (SELECT k.subj, k.pred, k.obj, (k.raw // 65536) % nn.n AS idx,
             nn.n AS n
      FROM k, nn)
SELECT i.subj AS subj, i.pred AS pred, i.obj AS obj,
       CASE WHEN v1.ent = i.obj THEN v2.ent ELSE v1.ent END AS neg_obj
FROM i
JOIN v v1 ON v1.idx = i.idx
JOIN v v2 ON v2.idx = (i.idx + 1) % i.n"""


def kg_training_pairs_sql() -> str:
    """Fused dense-id KGE training pairs — ground truth for
    stages/kgstats.kge_training_pairs: encode's (h, r, t_pos) joined
    with the corruption draw's index, self-collision stepping +1 on
    the INDEX (vocab is sorted-unique)."""
    from ..stages.balance import LCG_INC, LCG_MULT
    from ..stages.graph import GRAPH_PREDS

    preds = ",".join(f"'{p}'" for p in GRAPH_PREDS)
    cases = " ".join(
        f"WHEN '{p}' THEN {i}" for i, p in enumerate(GRAPH_PREDS)
    )
    return f"""WITH t AS ({oracle_triples_sql()}),
g AS (SELECT subj, pred, obj FROM t WHERE pred IN ({preds})),
v AS (SELECT ent, CAST(row_number() OVER (ORDER BY ent) - 1 AS BIGINT) AS idx
      FROM (SELECT DISTINCT obj AS ent FROM g)),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
k AS (SELECT CAST(right(subj, 8) AS BIGINT) AS h,
             CAST(CASE pred {cases} END AS BIGINT) AS r, obj
      FROM g),
i AS (SELECT k.h, k.r, k.obj,
             ((k.h * {len(GRAPH_PREDS)} + k.r) * {LCG_MULT} + {LCG_INC})
               % {2**31} // 65536 % nn.n AS idx,
             nn.n AS n
      FROM k, nn)
SELECT i.h, i.r, vp.idx AS t_pos,
       CASE WHEN i.idx = vp.idx THEN (i.idx + 1) % i.n
            ELSE i.idx END AS t_neg
FROM i JOIN v vp ON vp.ent = i.obj"""


def kg_neighbor_agg_sql(scale: int = 1_000_000) -> str:
    """GNN-style neighbor aggregation — ground truth for
    stages/kgstats.neighbor_agg: each entity's co-mention-weighted mean
    of its neighbors' entity vectors, the neighbor vectors re-quantized
    to fixed-point BIGINT so the sums are order-free and the single
    division bit-identical.  The vector side is the (hash-proven
    bit-identical) kg_entity_vecs oracle as a subquery."""
    return f"""{_graph_cte()},
em AS MATERIALIZED (SELECT a, b, cnt FROM e),
ev AS MATERIALIZED (
  SELECT entity, dim,
         CAST(floor(avg * {scale}) AS BIGINT) AS qa
  FROM ({kg_entity_vecs_sql(scale)}) sub),
j AS (SELECT em.a AS entity, ev.dim AS dim,
             CAST(SUM(ev.qa * em.cnt) AS BIGINT) AS qsum,
             CAST(SUM(em.cnt) AS BIGINT) AS wsum
      FROM em JOIN ev ON ev.entity = em.b
      GROUP BY em.a, ev.dim)
SELECT entity, dim,
       CAST(qsum AS DOUBLE)
       / (CAST(wsum AS DOUBLE) * CAST({scale} AS DOUBLE)) AS avg
FROM j"""


def kg_neighbor_agg2_sql(scale: int = 1_000_000) -> str:
    """Two composed GraphSAGE layers — ground truth for the
    kg_neighbor_agg2 query: the layer-1 oracle nests as the
    (MATERIALIZED) vector side of the same weighted-mean join, its
    floats re-quantized with the identical floor(avg * scale) the
    engine applies, so exactness composes layer over layer."""
    # CTE names are suffixed '2': DuckDB hoists MATERIALIZED CTEs into
    # one namespace, so the nested layer-1 subquery's own em/ev/j must
    # not collide with the outer layer's
    return f"""{_graph_cte()},
em2 AS MATERIALIZED (SELECT a, b, cnt FROM e),
ev2 AS MATERIALIZED (
  SELECT entity, dim,
         CAST(floor(avg * {scale}) AS BIGINT) AS qa
  FROM ({kg_neighbor_agg_sql(scale)}) sub),
j2 AS (SELECT em2.a AS entity, ev2.dim AS dim,
             CAST(SUM(ev2.qa * em2.cnt) AS BIGINT) AS qsum,
             CAST(SUM(em2.cnt) AS BIGINT) AS wsum
      FROM em2 JOIN ev2 ON ev2.entity = em2.b
      GROUP BY em2.a, ev2.dim)
SELECT entity, dim,
       CAST(qsum AS DOUBLE)
       / (CAST(wsum AS DOUBLE) * CAST({scale} AS DOUBLE)) AS avg
FROM j2"""


def kg_entity_vecs_sql(scale: int = 1_000_000) -> str:
    """Entity embeddings (mean page vector per graph-pred entity) —
    ground truth for stages/kgstats.entity_embeddings.  Fixed-point
    parity: both engines sum floor(float64(v) * scale) as exact int64
    (order-free) and divide ONCE by (n_pages * scale).  ``n_pages``
    counts only mentioning pages that HAVE an embedding row (the
    engine's inner-join semantics): a page missing from the embeddings
    table contributes neither numerator nor denominator, so the mean
    is over observed vectors — not dragged toward zero."""
    from ..stages.graph import GRAPH_PREDS

    preds = ",".join(f"'{p}'" for p in GRAPH_PREDS)
    return f"""WITH t AS ({oracle_triples_sql()}),
g0 AS (SELECT DISTINCT CAST(right(subj, 8) AS BIGINT) AS pid, obj AS entity
       FROM t WHERE pred IN ({preds})),
q AS (SELECT vec_id AS pid, i - 1 AS dim,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * {scale}) AS BIGINT)
               AS qv
      FROM embeddings,
           UNNEST(generate_series(1, len(embedding))) AS u(i)),
g AS (SELECT g0.* FROM g0
      JOIN (SELECT DISTINCT pid FROM q) p ON p.pid = g0.pid),
n AS (SELECT entity, CAST(count(*) AS BIGINT) AS n_pages
      FROM g GROUP BY entity)
SELECT g.entity, CAST(q.dim AS BIGINT) AS dim,
       CAST(SUM(q.qv) AS DOUBLE) / (n.n_pages * {scale}) AS avg
FROM g JOIN q ON q.pid = g.pid JOIN n ON n.entity = g.entity
GROUP BY g.entity, q.dim, n.n_pages"""


def kg_fuse_sql(m2: int = None, m3: int = None) -> str:
    """Majority-vote fusion ground truth for the kg_fuse query: three
    versions of the triples (v1 = original, v2 = objects perturbed to
    'alt-'||obj on pages divisible by m2, v3 = the same on m3) — the
    winner per (subj, pred) is 'alt-' only where BOTH perturbations hit
    (page % lcm(m2, m3) == 0, support 2), the original elsewhere
    (support 3 where no perturbation hit, else 2).  Mirrors
    stages/triples.fuse_majority over pipelines/kg.perturb_objs;
    defaults read pipelines/kg.FUSE_MODS so the contract cannot
    drift."""
    import math

    from ..pipelines.kg import FUSE_MODS

    if m2 is None:
        m2 = FUSE_MODS[0]
    if m3 is None:
        m3 = FUSE_MODS[1]
    lcm = math.lcm(m2, m3)
    return f"""WITH t AS ({oracle_triples_sql()}),
k AS (SELECT subj, pred, obj,
             CAST(right(subj, 8) AS BIGINT) AS pid FROM t)
SELECT subj, pred,
       CASE WHEN pid % {lcm} = 0 THEN 'alt-' || obj ELSE obj END AS obj,
       CAST(CASE WHEN pid % {m2} = 0 OR pid % {m3} = 0
            THEN 2 ELSE 3 END AS BIGINT) AS support
FROM k"""


def kg_conflicts_sql(m2: int = None, m3: int = None) -> str:
    """Cross-extractor conflict report — ground truth for
    stages/triples.conflict_report over the same three perturbed
    versions kg_fuse votes on: a (subj, pred) conflicts exactly where
    at least one perturbation hit (the value set is then
    {obj, 'alt-'||obj}); the base KG holds one object per key (the
    kg_fuse closed form's proven premise)."""
    from ..pipelines.kg import FUSE_MODS

    if m2 is None:
        m2 = FUSE_MODS[0]
    if m3 is None:
        m3 = FUSE_MODS[1]
    return f"""WITH t AS ({oracle_triples_sql()}),
k AS (SELECT subj, pred, obj,
             CAST(right(subj, 8) AS BIGINT) AS pid FROM t)
SELECT subj, pred, CAST(2 AS BIGINT) AS n_vals,
       least(obj, 'alt-' || obj) AS min_obj,
       greatest(obj, 'alt-' || obj) AS max_obj
FROM k WHERE pid % {m2} = 0 OR pid % {m3} = 0"""


def kg_assoc_sql() -> str:
    """Predicate association rules — ground truth for
    stages/kgstats.predicate_assoc: ordered pairs over the distinct
    (subj, pred) set, the diagonal supplying n_p1, one IEEE division."""
    return f"""WITH t AS ({oracle_triples_sql()}),
sp AS (SELECT DISTINCT subj, pred FROM t),
pairs AS (SELECT x.pred AS p1, y.pred AS p2,
                 CAST(count(*) AS BIGINT) AS n
          FROM sp x JOIN sp y ON x.subj = y.subj
          GROUP BY x.pred, y.pred)
SELECT a.p1, a.p2, a.n AS n_both, d.n AS n_p1,
       CAST(a.n AS DOUBLE) / d.n AS confidence
FROM pairs a JOIN pairs d ON d.p1 = a.p1 AND d.p2 = a.p1
WHERE a.p1 <> a.p2"""


def kg_summary_sql(k: int = 3) -> str:
    """Per-entity top-k fact summary — ground truth for
    stages/kgstats.entity_summary: distinct-page support per
    (entity, pred), row_number ordered (n_pages desc, pred asc)."""
    return f"""WITH t AS ({oracle_triples_sql()}),
s AS (SELECT obj AS entity, pred,
             CAST(count(DISTINCT subj) AS BIGINT) AS n_pages
      FROM t GROUP BY obj, pred)
SELECT entity, pred, n_pages FROM (
  SELECT entity, pred, n_pages,
         row_number() OVER (PARTITION BY entity
                            ORDER BY n_pages DESC, pred) AS rnk
  FROM s
) WHERE rnk <= {k}"""


def kg_starquery_sql(constraints=None) -> str:
    """Conjunctive star-pattern bindings — ground truth for
    stages/kgstats.star_query (same fullmatch regexes via DuckDB RE2)."""
    from ..stages.kgstats import STAR_CONSTRAINTS

    rules = STAR_CONSTRAINTS if constraints is None else constraints
    where = " OR ".join(
        f"(pred = '{p}' AND regexp_full_match(obj, '{rx}'))"
        for p, rx in rules.items()
    )
    return f"""WITH t AS ({oracle_triples_sql()}),
m AS (SELECT DISTINCT subj, pred, obj FROM t WHERE {where}),
ok AS (SELECT subj FROM (SELECT DISTINCT subj, pred FROM m)
       GROUP BY subj HAVING count(*) = {len(rules)})
SELECT m.subj, m.pred, m.obj FROM m JOIN ok USING (subj)"""
