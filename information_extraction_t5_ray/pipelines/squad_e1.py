"""E1 on raw annotated JSON: the reference's
``convert_dataset_to_squad.py`` entry point as a Ray pipeline.

    read raw JSON (R1) -> clean -> window chunk -> SQuAD qa generation
    -> [train/valid hash split] -> SQuAD JSON files + T5 example rows

Drives the SAME documents the reference ships
(``/root/reference/data/raw/sample_train.json``) and reproduces its
nested SQuAD output structure (title / paragraphs / qas with forced-N/A
and compound concatenation) — parity-tested in
tests/test_squad_e1_parity.py against the reference converter itself.

The train/valid split re-expresses ``train_test_split(test_size=p,
random_state=42)`` (convert_dataset_to_squad.py:316-320) as a pure url
hash so it is stable under any partitioning.
"""

from __future__ import annotations

import json
import zlib
from pathlib import Path
from typing import List, Optional

from ..registry import QuestionRegistry, default_type_names
from ..sources.rawjson import read_raw_json
from ..stages.chunk import ChunkConfig, chunk_stage
from ..stages.clean import clean_stage
from ..stages.squad import t5_examples_stage


def reference_chunk_config(context_content: str = "windows") -> ChunkConfig:
    """params.yaml E1 settings (max_size 2048, overlap 0.2, <=3 windows);
    char-mode 'windows' by default (tokenizer-free)."""
    return ChunkConfig(
        context_content=context_content,
        max_size=2048,
        window_overlap=0.2,
        max_windows=3,
    )


def convert_raw_dataset(
    path: str,
    chunk: Optional[ChunkConfig] = None,
    registry: Optional[QuestionRegistry] = None,
    type_names: Optional[List[str]] = None,
    use_compound: Optional[List[str]] = None,
    choose_question: str = "first",
    use_sentence_id: bool = False,
    include_squad_cols: bool = True,
):
    """raw JSON path -> qa rows Dataset (T5 sentences + SQuAD fields)."""
    reg = registry or QuestionRegistry.default()
    tns = type_names or default_type_names()
    compound = (
        use_compound
        if use_compound is not None
        else [q for q in tns if reg.is_compound(q)]
    )
    ds = read_raw_json(path)
    ds = clean_stage(ds)
    ds = chunk_stage(ds, chunk or reference_chunk_config())
    return t5_examples_stage(
        ds,
        registry=reg,
        type_names=tns,
        use_compound=compound,
        choose_question=choose_question,
        use_sentence_id=use_sentence_id,
        include_squad_cols=include_squad_cols,
    )


def hash_split(ds, valid_percent: float = 0.2, key_col: str = "url"):
    """(train_ds, valid_ds) by deterministic url hash (the scale-stable
    stand-in for the reference's seeded train_test_split)."""
    cut = int(valid_percent * 1000)

    def in_valid(row_url: str) -> bool:
        return zlib.crc32(row_url.encode()) % 1000 < cut

    train = ds.filter(lambda r: not in_valid(r[key_col]))
    valid = ds.filter(lambda r: in_valid(r[key_col]))
    return train, valid


def squad_data_from_rows(df) -> List[dict]:
    """qa rows (with answer/context/qa_seq) -> reference-shaped
    ``[{title, paragraphs: [{context, qas}]}]``; document order = row
    order, paragraph order = window_id, qa order = generation order."""
    out = []
    for url in df["url"].drop_duplicates():
        doc_rows = df[df["url"] == url]
        paragraphs = []
        for wid in sorted(doc_rows["window_id"].unique()):
            w = doc_rows[doc_rows["window_id"] == wid].sort_values("qa_seq")
            qas = [
                {
                    "answers": [
                        {"answer_start": int(r.answer_start), "text": r.answer}
                    ],
                    "question": r.question,
                    "id": r.qa_id,
                }
                for r in w.itertuples()
            ]
            if qas:
                paragraphs.append(
                    {"context": w["context"].iloc[0], "qas": qas}
                )
        out.append({"title": url, "paragraphs": paragraphs})
    return out


def write_squad_json(qas_ds, path: str, version: str = "0.1") -> str:
    """Materialize the (small, human/train-file) SQuAD JSON
    (reference convert_dataset_to_squad.py:376-383)."""
    df = qas_ds.to_pandas()
    data = squad_data_from_rows(df)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        json.dump({"version": version, "data": data}, f, ensure_ascii=False)
    return path


def read_squad_json(path: str, use_sentence_id: bool = False):
    """SQuAD JSON file -> T5-example rows Dataset (the reference's
    SquadV1Processor + squad_convert_examples_to_t5_format read path,
    data/qa_data.py:43-69 + convert_squad_to_t5.py:55-113: takes
    ``answers[0]`` only, generates the seq2seq pair per qa)."""
    import ray.data as rd

    from ..functions.preprocess import (
        generate_t5_input_sentence,
        generate_t5_label_sentence,
    )

    with open(path) as f:
        payload = json.load(f)
    rows = []
    for doc in payload["data"]:
        for wid, paragraph in enumerate(doc["paragraphs"]):
            ctx = paragraph["context"]
            for seq, qa in enumerate(paragraph["qas"]):
                ans = qa["answers"][0]
                rows.append(
                    {
                        "url": doc["title"],
                        "window_id": wid,
                        "qa_id": qa["id"],
                        "question": qa["question"],
                        "input_sentence": generate_t5_input_sentence(
                            ctx, qa["question"], use_sentence_id
                        ),
                        "label_sentence": generate_t5_label_sentence(
                            ans["text"], ans["answer_start"], ctx, use_sentence_id
                        ),
                        "answer_start": int(ans["answer_start"]),
                        "is_negative": "N/A" in ans["text"],
                        "answer": ans["text"],
                        "context": ctx,
                        "qa_seq": seq,
                    }
                )
    return rd.from_items(rows)


def run_convert(
    path: str,
    out_dir: str,
    valid_percent: float = 0.0,
    **convert_kwargs,
):
    """Full E1: raw JSON -> SQuAD JSON file(s) under out_dir."""
    qas = convert_raw_dataset(path, **convert_kwargs)
    paths = {}
    if valid_percent > 0:
        train, valid = hash_split(qas, valid_percent)
        paths["train"] = write_squad_json(train, f"{out_dir}/train-v0.1.json")
        paths["valid"] = write_squad_json(valid, f"{out_dir}/dev-v0.1.json")
    else:
        paths["train"] = write_squad_json(qas, f"{out_dir}/train-v0.1.json")
    return paths
