"""DuckDB oracle for the E1 T5-example pipeline (``t5_examples`` /
``balanced_examples``).

The whole E1 path is replayed in ANSI SQL over the driver's
``documents`` view: raw-page synthesis (``synth.build_doc_text``), the
byte-identical cleaning chain (``functions/textnorm.clean_text``), stub
SentencePiece tokenization (``functions/tokenizer``), the token-budget
sliding-window extraction (``functions/windows.get_windows_token_context``
with the flagship ``ChunkConfig``: ``use_sentence_id=False`` chunking,
``proportion_before=0``), and the windows x question-schema
cross-product with ``[SENTk]`` sentence tokens
(``stages/squad.SquadGen`` + ``functions/preprocess``).

Why this is expressible at all: with ``use_sentence_id=False`` and
``proportion_before=0`` the reference's 20-step fractional shrink loop
(features/context.py:70-95/229-257) never fires — the initial token
bounds already fit the budget — so a window is a pure function of the
stub-token cumulative-length array: ``start_u = unit_of(p)``,
``end_u = min(start_u + B, n)``, plus the ellipsis space-snapping
(context.py:97-108/259-270) and the ``p += int(len(ctx) * (1 -
overlap))`` advance (context.py:337).  ``max_windows=3`` lets the
sequential window loop unroll into three chained CTEs.

Everything is BUILT from the same constant tables the generator and
registry use, so oracle and pipeline cannot drift.
"""

from __future__ import annotations

from functools import lru_cache

from ..functions.tokenizer import StubSentencePieceTokenizer
from ..registry import QuestionRegistry
from ..stages.chunk import ChunkConfig, LARGEST_QUESTION
from .synth import (
    BAIRROS,
    CITIES,
    ENDERECO_LABELS,
    FIRST_NAMES,
    LAST_NAMES,
    ORGAOS,
    SIMPLE_LABELS,
    STREETS,
    UF_NAMES,
)


def _lst(values) -> str:
    inner = ",".join("'" + v.replace("'", "''") + "'" for v in values)
    return f"[{inner}]"


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


# raw surface value SQL per qa leaf — mirrors synth.field_values (the
# UN-normalized forms rendered into the page text and the T5 labels)
_CPF11 = "lpad(CAST((doc_id*7919+12345678901)%100000000000 AS VARCHAR),11,'0')"
_CEP8 = "lpad(CAST((doc_id*811+9000000)%100000000 AS VARCHAR),8,'0')"
_RAW_VALUE_SQL = {
    "etiqueta": "lpad(CAST((doc_id*17+3)%1000000 AS VARCHAR),6,'0')",
    "agencia": "CAST((doc_id*31+7)%9000+1000 AS VARCHAR)",
    "conta_corrente": (
        "CAST((doc_id*97+13)%90000+10000 AS VARCHAR)||'-'||CAST(doc_id%10 AS VARCHAR)"
    ),
    "cpf": (
        f"substr({_CPF11},1,3)||'.'||substr({_CPF11},4,3)"
        f"||'.'||substr({_CPF11},7,3)||'-'||substr({_CPF11},10,2)"
    ),
    "nome_completo": (
        f"{_lst(FIRST_NAMES)}[doc_id%16+1]||' '||{_lst(LAST_NAMES)}[(doc_id//16)%16+1]"
    ),
    "n_doc_serie": "CAST((doc_id*53+11)%10000000 AS VARCHAR)",
    "orgao_emissor": f"{_lst(ORGAOS)}[doc_id%6+1]",
    "data_emissao": (
        "strftime(DATE '2015-01-01' + CAST((doc_id*13)%3650 AS INTEGER), '%d/%m/%Y')"
    ),
    "data_nascimento": (
        "strftime(DATE '1950-01-01' + CAST((doc_id*29)%18250 AS INTEGER), '%d/%m/%Y')"
    ),
    "nome_mae": (
        f"{_lst(FIRST_NAMES)}[(doc_id*3+1)%16+1]||' '||{_lst(LAST_NAMES)}[(doc_id*5+2)%16+1]"
    ),
    "nome_pai": (
        f"{_lst(FIRST_NAMES)}[(doc_id*7+2)%16+1]||' '||{_lst(LAST_NAMES)}[(doc_id*11+4)%16+1]"
    ),
    "endereco.logradouro": f"'RUA '||{_lst(STREETS)}[(doc_id*7)%12+1]",
    "endereco.numero": "CAST(doc_id%2000+1 AS VARCHAR)",
    "endereco.complemento": "'APTO '||CAST(doc_id%90+1 AS VARCHAR)",
    "endereco.bairro": f"{_lst(BAIRROS)}[doc_id%8+1]",
    "endereco.cidade": f"{_lst(CITIES)}[doc_id%10+1]",
    "endereco.estado": f"{_lst(UF_NAMES)}[(doc_id*5)%27+1]",
    "endereco.cep": f"substr({_CEP8},1,5)||'-'||substr({_CEP8},6,3)",
}
# absence predicates — synth.field_values None branches
_PRESENCE_SQL = {
    "etiqueta": "doc_id % 7 <> 3",
    "nome_pai": "doc_id % 5 <> 0",
    "endereco.complemento": "doc_id % 3 <> 0",
}

_SIMPLE_ORDER = list(SIMPLE_LABELS)
_MEMBER_ORDER = list(ENDERECO_LABELS)


def _token_budget() -> int:
    """Window unit budget B: max_tokens minus the stub-token count of the
    sizing-question prefix (windows.py _position_context token_mode)."""
    cfg = ChunkConfig()
    tok = StubSentencePieceTokenizer(cfg.piece_size)
    prefix = f"question: {cfg.question} context: "
    return cfg.max_tokens - len(tok.tokenize(prefix))


def _vals_cte() -> str:
    cols = []
    for leaf, sql in _RAW_VALUE_SQL.items():
        name = "v_" + leaf.split(".")[-1]
        pred = _PRESENCE_SQL.get(leaf)
        cols.append(
            f"CASE WHEN {pred} THEN {sql} END AS {name}" if pred else f"{sql} AS {name}"
        )
    return "vals AS (\n  SELECT doc_id,\n    " + ",\n    ".join(cols) + "\n  FROM documents\n)"


def _rawt_cte() -> str:
    """Rebuild synth.build_doc_text: header, d%4 filler copies, noisy
    label/value lines, endereco block, footer — joined by the doc's
    separator.  No element contains a newline, so the list joins on
    chr(10) and the ``\\n \\n`` separator of d%3=0 docs is widened
    afterwards (DuckDB needs a constant array_to_string separator)."""
    elems = ["' Proposta™ de Abertura de Conta…'"]
    for k in (1, 2, 3):
        elems.append(f"CASE WHEN v.doc_id % 4 >= {k} THEN p.chunk || '  ' END")
    for leaf in _SIMPLE_ORDER:
        label = SIMPLE_LABELS[leaf]
        noisy = label.replace(" ", "\t", 1)  # first space -> tab on even docs
        label_sql = (
            f"CASE WHEN v.doc_id % 2 = 0 THEN {_q(noisy)} ELSE {_q(label)} END"
            if noisy != label
            else _q(label)
        )
        if leaf in _PRESENCE_SQL:
            elems.append(f"CASE WHEN v.v_{leaf} IS NOT NULL THEN {label_sql} END")
        else:
            elems.append(label_sql)
        elems.append(f"v.v_{leaf}")
    elems.append("'Endereço'")
    for m in _MEMBER_ORDER:
        piece = f"{_q(ENDERECO_LABELS[m] + ': ')} || v.v_{m}"
        if f"endereco.{m}" in _PRESENCE_SQL:
            piece = f"CASE WHEN v.v_{m} IS NOT NULL THEN {piece} END"
        elems.append(piece)
    elems.append(_q("Observações´ finais ༡༨/༢"))
    elems.append("p.chunk")
    lst = ",\n      ".join(elems)
    return f"""rawt0 AS (
  SELECT v.doc_id,
    array_to_string(list_filter([
      {lst}
    ], x -> x IS NOT NULL), chr(10)) AS joined
  FROM vals v JOIN pages p USING (doc_id)
),
rawt AS (
  SELECT doc_id,
    CASE WHEN doc_id % 3 = 0
         THEN replace(joined, chr(10), chr(10)||' '||chr(10))
         ELSE joined END || ' ' AS raw
  FROM rawt0
)"""


def _window_cols(k: int, budget: int) -> str:
    """One window step at char position p{k}: unit lookup into the
    cumulative stub-token end array, budget cut, ellipsis space-snapping,
    and the next start position.  Emitted into its own chained CTE —
    DuckDB lateral aliases are macro-expanded, so cross-window references
    must materialize per CTE or the expression tree grows exponentially."""
    return f"""
    CASE WHEN len(list_filter(ends, x -> x <= p{k})) >= n
         THEN n - 1 ELSE len(list_filter(ends, x -> x <= p{k})) END AS u{k},
    CASE WHEN u{k} = 0 THEN 0 ELSE list_extract(ends, u{k}) END AS scr{k},
    list_extract(ends, least(u{k} + {budget}, n)) AS ecr{k},
    CASE WHEN scr{k} <> 0 THEN
      CASE WHEN strpos(substr(t, scr{k} + 1, p{k} - scr{k}), ' ') > 0
           THEN scr{k} + strpos(substr(t, scr{k} + 1, p{k} - scr{k}), ' ') - 1
           ELSE scr{k} END
      ELSE 0 END AS sc{k},
    CASE WHEN scr{k} <> 0 THEN sc{k} - 3 ELSE 0 END AS off{k},
    CASE WHEN ecr{k} < total THEN
      CASE WHEN strpos(reverse(substr(t, p{k} + 1, ecr{k} - p{k})), ' ') > 0
           THEN ecr{k} - strpos(reverse(substr(t, p{k} + 1, ecr{k} - p{k})), ' ')
           ELSE total - 1 END
      ELSE ecr{k} END AS ec{k},
    CASE WHEN scr{k} <> 0 THEN '...' ELSE '' END
      || substr(t, sc{k} + 1, ec{k} - sc{k})
      || CASE WHEN ecr{k} < total THEN '...' ELSE '' END AS ctx{k},
    off{k} + length(ctx{k}) < total AS more{k},
    p{k} + CAST(floor(CAST(length(ctx{k}) AS DOUBLE) * 0.8) AS BIGINT) AS p{k + 1}"""


@lru_cache(maxsize=1)
def _qa_plan():
    from ..stages.score import _QAPlan

    reg = QuestionRegistry.default()
    return reg, _QAPlan(reg, None, None, "first")


def _qa_cte() -> str:
    """One (qa_id, question, answer) row per document per schema entry —
    present values or forced ``[Type]: N/A`` (SquadGen._answer_for)."""
    reg, plan = _qa_plan()
    tn2type = reg.typename_to_type
    sels = []
    for qa_id in plan.type_names:
        is_compound, questions, leaf_or_sig = plan.plan[qa_id]
        question = questions[0]
        if is_compound:
            parts = [
                f"{_q('[' + tn2type[m] + ']: ')} || coalesce(v_{m}, 'N/A')"
                for m in leaf_or_sig
            ]
            answer = " || ' ' || ".join(parts)
        else:
            leaf = leaf_or_sig
            answer = f"{_q('[' + tn2type[leaf] + ']: ')} || coalesce(v_{leaf}, 'N/A')"
        sels.append(
            f"SELECT doc_id, '{qa_id}' AS qa_id, {_q(question)} AS question, "
            f"{answer} AS answer FROM vals"
        )
    return "qa AS (\n  " + "\n  UNION ALL ".join(sels) + "\n)"


def t5_examples_sql() -> str:
    budget = _token_budget()
    ws = "[ " + chr(9) + chr(10) + "]"  # whitespace chars present in raw pages
    return f"""WITH pages AS (
  SELECT doc_id,
    CASE WHEN text IS NULL OR text = '' THEN 'texto de preenchimento do documento'
         ELSE substr(text, 1, 400) END AS chunk
  FROM documents
),
{_vals_cte()},
{_rawt_cte()},
clean AS (
  SELECT doc_id,
    trim(replace(replace(replace(
      regexp_replace(
        regexp_replace(
          replace(replace(raw, '༡༨/༢', ''), chr(9), ' '),
          '{ws}*' || chr(10) || '+{ws}*', chr(10), 'g'),
        '  +', ' ', 'g'),
      '´', ''''), '™', 'TM'), '…', '...'),
    ' ' || chr(10) || chr(9)) AS t
  FROM rawt
),
words AS (
  SELECT doc_id,
    unnest(list_transform(string_split(t, ' '), (x, i) -> {{'w': x, 'i': i}})) AS s
  FROM clean
),
wpos AS (
  SELECT doc_id, s.w AS w,
    CAST(sum(length(s.w) + 1) OVER (PARTITION BY doc_id ORDER BY s.i
        ROWS UNBOUNDED PRECEDING) - length(s.w) - 1 AS BIGINT) AS S
  FROM words
),
tok AS (
  SELECT doc_id,
    least(S + 4 * unnest(generate_series(1, CAST(ceil((length(w) + 1) / 4.0) AS BIGINT))) - 1,
          S + length(w)) AS e
  FROM wpos
),
docw AS (
  SELECT doc_id, list(e ORDER BY e) AS ends, count(*) AS n
  FROM tok GROUP BY doc_id
),
w0 AS (
  SELECT c.doc_id, c.t, length(c.t) AS total, d.ends, d.n, 0 AS p0,
    {_window_cols(0, budget)}
  FROM clean c JOIN docw d USING (doc_id)
),
w1 AS (
  SELECT *, {_window_cols(1, budget)} FROM w0
),
w2 AS (
  SELECT *, {_window_cols(2, budget)} FROM w1
),
win AS (
  SELECT doc_id, 0 AS wid, ctx0 AS context FROM w2
  UNION ALL SELECT doc_id, 1, ctx1 FROM w2 WHERE more0
  UNION ALL SELECT doc_id, 2, ctx2 FROM w2 WHERE more0 AND more1
),
{_qa_cte()}
SELECT 'https://example.org/'||lpad(CAST(w.doc_id AS VARCHAR),8,'0') AS url,
  CAST(w.wid AS INTEGER) AS window_id,
  qa.qa_id, qa.question,
  'question: ' || qa.question || ' context: ' ||
    array_to_string(list_transform(string_split(w.context, chr(10)),
      (part, i) -> ' [SENT' || i || '] ' || part), '') AS input_sentence,
  '[SENT0] ' || qa.answer AS label_sentence,
  CAST(-1 AS BIGINT) AS answer_start,
  contains(qa.answer, 'N/A') AS is_negative
FROM win w JOIN qa USING (doc_id)"""


def balanced_examples_sql() -> str:
    """Balance oracle for the E1 key choice ``(url, qa_id)``: a key's
    answer is window-invariant, so every key is purely positive or purely
    negative; keys without positives are dropped (reference outer-join +
    dropna, balance_data.py:65-70) and no key has both classes to draw
    from — the resample degenerates to "positives only".  The LCG draw
    machinery itself is oracle-checked by ``balanced_sample`` on
    lineitem, where keys do mix classes."""
    return f"SELECT * FROM ({t5_examples_sql()}) WHERE NOT is_negative"
