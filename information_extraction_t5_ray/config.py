"""params.yaml-compatible configuration loader.

A user of the reference configures everything through one
configargparse YAML (``/root/reference/params.yaml``); this maps the
same file onto this engine's config objects so existing configs keep
working.  Keys we consume:

* preprocess: ``context_content``, ``window_overlap``, ``max_windows``,
  ``max_size``, ``max_seq_length``, ``type_names``,
  ``use_compound_question``, ``train_choose_question``,
  ``use_sentence_id``, ``valid_percent``, ``raw_data_file`` /
  ``raw_test_data_file``, ``project``.
* post-process: ``get_highestprob_answer`` (fewer-NA argmax on/off maps
  to use_fewer_na), ``split_compound_answers``, ``group_qas``,
  ``normalize_outputs``, ``only_misprediction_outputs``,
  ``negative_ratio``.
* model keys (``model_name_or_path``, ``num_beams``, ``max_length``,
  batch sizes) are recorded on the returned object for the T5Scorer
  actor path; trainer/optimizer/neptune keys are training-only and
  ignored (training is out of scope — reference E2).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

from .pipelines.kg import KGConfig
from .stages.chunk import ChunkConfig


def _listify(v) -> List:
    if v is None:
        return []
    if isinstance(v, list):
        return [x for x in v if x is not None]
    return [v]


@dataclass
class ParamsConfig:
    """Everything parsed from a reference params.yaml."""

    kg: KGConfig = field(default_factory=KGConfig)
    projects: List[str] = field(default_factory=lambda: ["form"])
    raw_data_files: List[str] = field(default_factory=list)
    raw_test_data_files: List[str] = field(default_factory=list)
    valid_percent: float = 0.0
    choose_question: str = "first"
    use_sentence_id: bool = False
    negative_ratio: int = -1
    split_compound_answers: bool = True
    group_qas: bool = True
    normalize_outputs: bool = True
    only_misprediction_outputs: bool = True
    model: Dict[str, Any] = field(default_factory=dict)
    raw: Dict[str, Any] = field(default_factory=dict)


def load_params_yaml(path: str) -> ParamsConfig:
    """Parse a reference-style params.yaml into engine config."""
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f) or {}

    chunk = ChunkConfig(
        context_content=raw.get("context_content", "windows_token"),
        max_tokens=int(raw.get("max_seq_length", 512)),
        max_size=int(raw.get("max_size", 4000)),
        window_overlap=float(raw.get("window_overlap", 0.5)),
        max_windows=int(raw.get("max_windows", 3)),
        use_sentence_id=bool(raw.get("use_sentence_id", False)),
    )
    kg = KGConfig(
        chunk=chunk,
        type_names=_listify(raw.get("type_names")) or None,
        use_compound=_listify(raw.get("use_compound_question")) or None,
        use_fewer_na=bool(raw.get("get_highestprob_answer", True)),
    )
    model_keys = (
        "model_name_or_path", "num_beams", "max_length", "train_batch_size",
        "val_batch_size", "do_lower_case",
    )
    return ParamsConfig(
        kg=kg,
        projects=_listify(raw.get("project")) or ["form"],
        raw_data_files=_listify(raw.get("raw_data_file")),
        raw_test_data_files=_listify(raw.get("raw_test_data_file")),
        valid_percent=float(raw.get("valid_percent", 0.0) or 0.0),
        choose_question=str(raw.get("train_choose_question", "first")),
        use_sentence_id=bool(raw.get("use_sentence_id", False)),
        negative_ratio=int(raw.get("negative_ratio", -1)),
        split_compound_answers=bool(raw.get("split_compound_answers", True)),
        group_qas=bool(raw.get("group_qas", True)),
        normalize_outputs=bool(raw.get("normalize_outputs", True)),
        only_misprediction_outputs=bool(
            raw.get("only_misprediction_outputs", True)
        ),
        model={k: raw[k] for k in model_keys if k in raw},
        raw=raw,
    )


def convert_from_params(params_path: str, out_dir: str, repo_root: Optional[str] = None):
    """Reference E1 driven by the reference's own YAML: for each
    configured raw data file, run the raw-JSON -> SQuAD conversion with
    the YAML's chunking/question settings (convert_dataset_to_squad.py
    main path, minus tokenizer-bound modes when unavailable)."""
    from pathlib import Path

    from .pipelines.squad_e1 import convert_raw_dataset, hash_split, write_squad_json

    cfg = load_params_yaml(params_path)
    chunk = cfg.kg.chunk
    if chunk.context_content.endswith("token"):
        # no HF tokenizer in this environment: the stub tokenizer keeps
        # token modes runnable; char 'windows' is byte-exact vs reference
        pass
    root = Path(repo_root or Path(params_path).parent)

    def convert_union(files: List[str], choose: str):
        """Per-project datasets union into ONE file (reference
        convert_dataset_to_squad.py:229-367 concatenation)."""
        parts = [
            convert_raw_dataset(
                str(root / rel),
                chunk=chunk,
                type_names=cfg.kg.type_names,
                use_compound=cfg.kg.use_compound,
                choose_question=choose,
                use_sentence_id=cfg.use_sentence_id,
            )
            for rel in files
        ]
        ds = parts[0]
        for extra in parts[1:]:
            ds = ds.union(extra)
        return ds

    paths: Dict[str, str] = {}
    if cfg.raw_data_files:
        qas = convert_union(cfg.raw_data_files, cfg.choose_question)
        if cfg.valid_percent > 0:
            train, valid = hash_split(qas, cfg.valid_percent)
            paths["train"] = write_squad_json(train, f"{out_dir}/train-v0.1.json")
            paths["valid"] = write_squad_json(valid, f"{out_dir}/dev-v0.1.json")
        else:
            paths["train"] = write_squad_json(qas, f"{out_dir}/train-v0.1.json")
    if cfg.raw_test_data_files:
        qas = convert_union(cfg.raw_test_data_files, "first")
        paths["test"] = write_squad_json(qas, f"{out_dir}/test-v0.1.json")
    return paths
