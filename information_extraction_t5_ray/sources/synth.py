"""Deterministic synthetic web-page corpus (FIXTURES.md F1/F2).

Pages have exactly the ``BASELINE.json.input_hint`` shape
``(url, warc_ts, html, text, lang)``.  Each page is a form-like
Portuguese document in the style of the reference's golden corpus
(``/root/reference/data/raw/sample_train.json``: label line followed by
value line; one compound ``endereco`` block), wrapped in a trivial HTML
envelope, with injected noise that the cleaning chain must fix
(tabs, space runs, ``\\n \\n``, ``´``, ``™``, ``…``, ``༡༨/༢``).

Every field value is a CLOSED-FORM function of ``doc_id`` that is also
expressible in ANSI SQL — ``oracle_triples_sql()`` in
``sources/oracle.py`` regenerates the expected ``(subj, pred, obj)``
set with DuckDB, which makes the WHOLE extraction pipeline
oracle-checkable end-to-end (the driver's correctness gate).

Two sources:

* ``synth_pages_table(n, seed)`` — standalone Arrow table (unit tests).
* ``read_pages(sf_dir)`` — Ray Dataset derived 1:1 from the driver's
  ``documents.parquet`` (doc_id -> url; documents.text becomes filler
  that shifts the field block across sliding windows).
"""

from __future__ import annotations

import datetime as _dt
from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as _pc

# --- closed-form field model ----------------------------------------------

FIRST_NAMES = [
    "ANA", "BRUNO", "CARLA", "DIEGO", "ELISA", "FABIO", "GISELE", "HUGO",
    "IRIS", "JORGE", "KARLA", "LUCAS", "MARINA", "NELSON", "OLIVIA", "PAULO",
]
LAST_NAMES = [
    "ALMEIDA", "BARROS", "CASTRO", "DUARTE", "ESTEVES", "FERREIRA", "GOMES",
    "HENRIQUE", "IGLESIAS", "JUNQUEIRA", "KLEIN", "LIMA", "MORAES",
    "NOGUEIRA", "OLIVEIRA", "PINTO",
]
STREETS = [
    "DAS FLORES", "SANTOS DUMONT", "PEDRO BIAGI", "REGENTE FEIJO",
    "ALBERT EINSTEIN", "DOM PEDRO II", "QUINZE DE NOVEMBRO", "TIRADENTES",
    "SETE DE SETEMBRO", "DAS PALMEIRAS", "BOA VISTA", "AURORA",
]
BAIRROS = [
    "CENTRO", "VILA NOVA", "JARDIM AMERICA", "BELA VISTA", "SANTA CRUZ",
    "SAO JOSE", "PLANALTO", "INDUSTRIAL",
]
CITIES = [
    "CAMPINAS", "SERTAOZINHO", "CAUCAIA", "NITEROI", "SOROCABA", "LONDRINA",
    "UBERABA", "PELOTAS", "MACEIO", "BLUMENAU",
]
# 'SSP' three times -> deliberate head-entity skew for the salted
# canonicalization groupby (SURVEY.md §7.3)
ORGAOS = ["SSP", "SSP", "SSP", "DETRAN", "IFP", "OAB"]

# 27 federative units, insertion order of the reference alias dict
# (features/highlights.py:13-41)
UF_CODES = [
    "AC", "AL", "AP", "AM", "BA", "CE", "DF", "ES", "GO", "MA", "MT", "MS",
    "MG", "PA", "PB", "PR", "PE", "PI", "RJ", "RN", "RS", "RO", "RR", "SC",
    "SP", "SE", "TO",
]
UF_NAMES = [
    "Acre", "Alagoas", "Amapá", "Amazonas", "Bahia", "Ceará",
    "Distrito Federal", "Espírito Santo", "Goiás", "Maranhão", "Mato Grosso",
    "Mato Grosso do Sul", "Minas Gerais", "Pará", "Paraíba", "Paraná",
    "Pernambuco", "Piauí", "Rio de Janeiro", "Rio Grande do Norte",
    "Rio Grande do Sul", "Rondônia", "Roraima", "Santa Catarina",
    "São Paulo", "Sergipe", "Tocantins",
]

EPOCH_EMISSAO = _dt.date(2015, 1, 1)
EPOCH_NASC = _dt.date(1950, 1, 1)


def replicate_doc_ids(ds, repeat: int):
    """Deterministic work multiplier shared by read_pages and
    read_crawl: replicate every document ``repeat`` times with doc_ids
    shifted by ``r * REPEAT_STRIDE`` (distinct keys, identical work
    profile).  ONE definition so the stress fixtures of the page and
    crawl families cannot diverge."""
    if repeat <= 1:
        return ds

    def replicate(batch: pa.Table) -> pa.Table:
        tables = [batch]
        for r in range(1, repeat):
            tables.append(
                batch.set_column(
                    batch.schema.get_field_index("doc_id"),
                    "doc_id",
                    _pc.add(batch["doc_id"], r * REPEAT_STRIDE),
                )
            )
        return pa.concat_tables(tables)

    return ds.map_batches(replicate, batch_format="pyarrow")


def _fmt_date(base: _dt.date, days: int) -> str:
    return (base + _dt.timedelta(days=days)).strftime("%d/%m/%Y")


def field_values(d: int) -> Dict[str, Optional[str]]:
    """Raw surface values per qa_id leaf; None => field absent from the
    document (exercises the forced-N/A anti-join path)."""
    cpf = str((d * 7919 + 12345678901) % 100000000000).rjust(11, "0")
    cep = str((d * 811 + 9000000) % 100000000).rjust(8, "0")
    conta = str((d * 97 + 13) % 90000 + 10000)
    return {
        "etiqueta": None if d % 7 == 3 else str((d * 17 + 3) % 1000000).rjust(6, "0"),
        "agencia": str((d * 31 + 7) % 9000 + 1000),
        "conta_corrente": f"{conta}-{d % 10}",
        "cpf": f"{cpf[0:3]}.{cpf[3:6]}.{cpf[6:9]}-{cpf[9:11]}",
        "nome_completo": f"{FIRST_NAMES[d % 16]} {LAST_NAMES[(d // 16) % 16]}",
        "n_doc_serie": str((d * 53 + 11) % 10000000),
        "orgao_emissor": ORGAOS[d % 6],
        "data_emissao": _fmt_date(EPOCH_EMISSAO, (d * 13) % 3650),
        "data_nascimento": _fmt_date(EPOCH_NASC, (d * 29) % 18250),
        "nome_mae": f"{FIRST_NAMES[(d * 3 + 1) % 16]} {LAST_NAMES[(d * 5 + 2) % 16]}",
        "nome_pai": None
        if d % 5 == 0
        else f"{FIRST_NAMES[(d * 7 + 2) % 16]} {LAST_NAMES[(d * 11 + 4) % 16]}",
        "endereco.logradouro": f"RUA {STREETS[(d * 7) % 12]}",
        "endereco.numero": str(d % 2000 + 1),
        "endereco.complemento": None if d % 3 == 0 else f"APTO {d % 90 + 1}",
        "endereco.bairro": BAIRROS[d % 8],
        "endereco.cidade": CITIES[d % 10],
        "endereco.estado": UF_NAMES[(d * 5) % 27],
        "endereco.cep": f"{cep[0:5]}-{cep[5:8]}",
    }


# label line per simple field (value goes on the NEXT line); the
# endereco block uses 'Key: value' member lines under an 'Endereço'
# header.  The mock scorer reads the same table.
SIMPLE_LABELS: Dict[str, str] = {
    "etiqueta": "Etiqueta Nº",
    "agencia": "Agência Nº",
    "conta_corrente": "Conta Corrente Nº",
    "cpf": "CPF/CNPJ",
    "nome_completo": "Nome Completo",
    "n_doc_serie": "Documento Nº/Série",
    "orgao_emissor": "Órgão Emissor",
    "data_emissao": "Data de Emissão",
    "data_nascimento": "Data de Nascimento",
    "nome_mae": "Nome da Mãe",
    "nome_pai": "Nome do Pai",
}
ENDERECO_LABELS: Dict[str, str] = {
    "logradouro": "Logradouro",
    "numero": "Número",
    "complemento": "Complemento",
    "bairro": "Bairro",
    "cidade": "Cidade",
    "estado": "Estado",
    "cep": "CEP",
}

URL_PREFIX = "https://example.org/"


def url_of(doc_id: int) -> str:
    return f"{URL_PREFIX}{doc_id:08d}"


def build_doc_text(d: int, filler: str) -> str:
    """NOISY raw text of document ``d``.  ``filler`` is sliced
    deterministically: ``d % 4`` copies of up to 400 chars before the
    field block (shifts the block across sliding windows) and one copy
    after (so the block is never flush with the document end)."""
    vals = field_values(d)
    chunk = filler[:400] if filler else "texto de preenchimento do documento"
    lines: List[str] = [" Proposta™ de Abertura de Conta…"]
    for _ in range(d % 4):
        lines.append(chunk + "  ")  # trailing space run -> cleaned
    for key, label in SIMPLE_LABELS.items():
        v = vals[key]
        if v is None:
            continue
        noisy_label = label.replace(" ", "\t", 1) if d % 2 == 0 else label
        lines.append(noisy_label)
        lines.append(v)
    lines.append("Endereço")
    for sub, label in ENDERECO_LABELS.items():
        v = vals[f"endereco.{sub}"]
        if v is None:
            continue
        lines.append(f"{label}: {v}")
    lines.append("Observações´ finais ༡༨/༢")
    lines.append(chunk)
    sep = "\n \n" if d % 3 == 0 else "\n"
    return sep.join(lines) + " "


_WORDS = (
    "processo registro documento valor contrato sociedade empresa capital "
    "cidade estado comarca cartorio secretaria municipio certidao tributos "
    "requerimento protocolo assinatura testemunha clausula paragrafo"
).split()


def _synth_filler(d: int) -> str:
    rng = np.random.RandomState(42 + d % 1000)
    return " ".join(rng.choice(_WORDS, size=60))


def html_of(text: str) -> bytes:
    return b"<html><body><pre>" + text.encode("utf-8") + b"</pre></body></html>"


PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def synth_pages_table(n: int, seed: int = 42) -> pa.Table:
    """Standalone deterministic pages table (unit tests / golden runs)."""
    assert seed == 42, "corpus is pinned to seed 42 (TESTDATA.md)"
    texts = [build_doc_text(d, _synth_filler(d)) for d in range(n)]
    base = _dt.datetime(2020, 1, 1)
    return pa.table(
        {
            "url": [url_of(d) for d in range(n)],
            "warc_ts": [base + _dt.timedelta(minutes=d) for d in range(n)],
            "html": [html_of(t) for t in texts],
            "text": texts,
            "lang": ["pt" if d % 11 else "en" for d in range(n)],
        },
        schema=PAGES_SCHEMA,
    )


def ground_truth_table(n: int) -> pa.Table:
    """F2: one row per (url, qa_id leaf, value) incl. nulls (N/A)."""
    urls, qa_ids, values = [], [], []
    for d in range(n):
        for key, v in field_values(d).items():
            urls.append(url_of(d))
            qa_ids.append(f"form.{key}")
            values.append(v)
    return pa.table({"url": urls, "qa_id": qa_ids, "value": values})


# --- documents.parquet -> pages (sf-scaled runs) ---------------------------


def documents_to_pages(batch: pa.Table) -> pa.Table:
    """Vector-ish transform: one page per documents row; doc text is the
    window-shifting filler.  Python loop over rows is building ~2 KB
    strings per row — string assembly dominates either way."""
    doc_ids = batch["doc_id"].to_pylist()
    fillers = batch["text"].to_pylist()
    langs = batch["lang"].to_pylist()
    base = _dt.datetime(2020, 1, 1)
    texts = [build_doc_text(d, f or "") for d, f in zip(doc_ids, fillers)]
    # wrap the minute offset so repeat-shifted replica ids (r *
    # REPEAT_STRIDE, bench-only, never oracle-checked) cannot push the
    # timestamp past year 9999; base-corpus ids (< REPEAT_STRIDE) are
    # below the wrap and keep their exact oracle values
    _ts_wrap = 1_000 * 365 * 24 * 60  # ~1000 years of minutes
    return pa.table(
        {
            "url": [url_of(d) for d in doc_ids],
            "warc_ts": [
                base + _dt.timedelta(minutes=int(d) % _ts_wrap)
                for d in doc_ids
            ],
            "html": [html_of(t) for t in texts],
            "text": texts,
            "lang": langs,
        },
        schema=PAGES_SCHEMA,
    )


REPEAT_STRIDE = 50_000_000  # distinct doc_id space per replica


def documents_paths(sf_dir: str) -> List[str]:
    """Resolve the documents table to its file list: the driver fixture
    is a single ``documents.parquet`` FILE; the production layout is a
    DIRECTORY of shard files (``documents.parquet/`` or ``documents/``
    holding ``*.parquet``).  Sorted, so file-range shard selection is
    deterministic run-over-run.  An existing-but-EMPTY directory raises
    — a partially-written or mis-pointed input must fail loudly, not
    'succeed' with zero pages."""
    import glob as _glob
    import os

    for cand in ("documents.parquet", "documents"):
        p = os.path.join(sf_dir, cand)
        if os.path.isdir(p):
            paths = sorted(_glob.glob(os.path.join(p, "*.parquet")))
            if not paths:
                raise FileNotFoundError(
                    f"documents directory {p} contains no *.parquet files"
                )
            return paths
    return [os.path.join(sf_dir, "documents.parquet")]


def read_pages(
    sf_dir: str,
    include_html: bool = True,
    repeat: int = 1,
    shard: Optional[tuple] = None,
    shard_mode: str = "files",
):
    """Ray Dataset of pages derived 1:1 from ``{sf_dir}/documents.parquet``
    (column-pruned read -> map_batches).

    ``repeat > 1`` replicates every document with doc_ids shifted by
    ``r * REPEAT_STRIDE`` (distinct urls, identical work profile) INSIDE
    the read tasks — a deterministic work multiplier for scaling runs
    where the fixture is too small to dominate fixed session overheads
    (bench.py --scaling).  Both cluster sizes see the same input."""
    import ray
    import ray.data as rd

    from ..stages.common import read_parquet_clean

    # schema= override strips the file's b'pandas' metadata AT the read
    # task — a post-read strip left 'Failed to hash the schemas'
    # warnings (and the slow schema-unify path) inside the read itself
    paths = documents_paths(sf_dir)
    row_filter_shard = None
    if shard is not None:
        # shard (k, n) has TWO semantics, chosen by ``shard_mode``:
        #
        # * ``"files"`` (default — the unit of partition-granular
        #   checkpointed resume, run_kg_sharded): when the documents
        #   table is a multi-file directory (the production layout)
        #   the shard is a FILE-RANGE selection ``paths[k::n]`` — only
        #   ~1/n of the input bytes are read, so an n-shard resume
        #   costs one full read total, not n.  Disjoint; union over k
        #   covers every file.  WHICH rows land in shard k depends on
        #   the file layout (callers that checkpoint per shard must
        #   fingerprint the resolved file list).  The single-file
        #   fixture has no ranges and falls back to the row filter.
        # * ``"rows"``: always the deterministic ``doc_id % n == k``
        #   row filter, layout-independent — required when the shard's
        #   CONTENT is part of an operator's contract (e.g. the
        #   kg_merge oracle hardcodes ``doc_id % 2 = 0``).
        k, n = shard
        if shard_mode == "files" and len(paths) > 1:
            paths = paths[k::n]
        else:
            row_filter_shard = (k, n)
    if not paths:  # more shards than files: this shard is empty
        import ray.data as rd

        return rd.from_arrow(PAGES_SCHEMA.empty_table())
    ds = read_parquet_clean(paths, columns=["doc_id", "text", "lang"])
    if row_filter_shard is not None:
        k, n = row_filter_shard

        def keep(batch: pa.Table) -> pa.Table:
            mask = batch["doc_id"].to_numpy() % n == k
            return batch.filter(pa.array(mask))

        ds = ds.map_batches(keep, batch_format="pyarrow")
    # the fixture is ONE parquet file with ONE row group -> one serial
    # read task that trickles blocks out while downstream waits.  Real
    # Common-Crawl input is thousands of shards (parallel read tasks);
    # stand in for that by scattering the tiny raw table across ~2
    # blocks per core BEFORE the ~10x page expansion.
    try:
        n_blocks = max(16, 2 * int(ray.cluster_resources().get("CPU", 8)))
    except Exception:  # pragma: no cover - no cluster yet
        n_blocks = 16
    ds = ds.repartition(n_blocks)
    ds = replicate_doc_ids(ds, repeat)
    # small row bundles: each doc row expands ~10x in bytes (html + text
    # + window duplication downstream), so bundling by the default
    # byte target would fuse the whole corpus into ~16 tasks and cap
    # every downstream stage's parallelism at that number
    return ds.map_batches(
        documents_to_pages, batch_format="pyarrow", batch_size=64
    )
