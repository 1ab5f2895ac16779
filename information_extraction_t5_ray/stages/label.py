"""Label providers: attach the reference-format label sentence to each
best (url, qa_id) row.

* ``attach_na_labels`` — inference mode: the label is the forced-N/A
  canonical answer (simple ``[Type]: N/A`` or the compound signature
  joined with all members N/A — exactly
  ``get_notapplicable_question_answers``, basic_to_squad.py:133-193).
  The label's only job downstream is to drive member alignment in the
  compound split; its type-name sequence IS the signature.
* ``attach_synth_labels`` — eval mode over the synthetic corpus: the
  ground-truth label is a closed-form function of the url's doc_id
  (sources/synth.py), built with the same grammar as
  ``get_question_answers`` / ``get_compound_question_answers``
  (basic_to_squad.py:13-130: present members verbatim, absent members
  forced ``[Type]: N/A``, signature order).
"""

from __future__ import annotations

from typing import Dict

import pyarrow as pa

from ..registry import QuestionRegistry
from ..sources.synth import URL_PREFIX, field_values


def na_label_map(registry: QuestionRegistry, qa_ids) -> Dict[str, str]:
    t2 = registry.typename_to_type
    out = {}
    for qa_id in qa_ids:
        if registry.is_compound(qa_id):
            sig = registry.compound_signature(qa_id)
            out[qa_id] = " ".join(f"[{t2[tn]}]: N/A" for tn in sig)
        else:
            out[qa_id] = f"[{t2[qa_id.split('.')[-1]]}]: N/A"
    return out


def _label_stage(best_ds, label_fn, batch_size: int | None = None):
    def add(batch: pa.Table) -> pa.Table:
        labels = [
            label_fn(u, q)
            for u, q in zip(batch["url"].to_pylist(), batch["qa_id"].to_pylist())
        ]
        return batch.append_column("label", pa.array(labels, pa.large_string()))

    kw = {"batch_size": batch_size} if batch_size else {}
    return best_ds.map_batches(add, batch_format="pyarrow", **kw)


def attach_na_labels(best_ds, registry: QuestionRegistry, qa_ids):
    table = na_label_map(registry, qa_ids)
    return _label_stage(best_ds, lambda url, qa_id: table[qa_id])


def synth_label_for(registry: QuestionRegistry, url: str, qa_id: str) -> str:
    d = int(url[len(URL_PREFIX):])
    vals = field_values(d)
    t2 = registry.typename_to_type
    if registry.is_compound(qa_id):
        parts = []
        for tn in registry.compound_signature(qa_id):
            v = vals.get(f"{qa_id.split('.', 1)[1]}.{tn}")
            parts.append(f"[{t2[tn]}]: {v if v is not None else 'N/A'}")
        return " ".join(parts)
    leaf = qa_id.split(".", 1)[1]
    v = vals.get(leaf)
    return f"[{t2[qa_id.split('.')[-1]]}]: {v if v is not None else 'N/A'}"


def attach_synth_labels(best_ds, registry: QuestionRegistry):
    return _label_stage(
        best_ds, lambda url, qa_id: synth_label_for(registry, url, qa_id)
    )
