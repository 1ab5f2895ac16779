"""Stage 5: mention detection + entity-link scoring (north-star stage 3).

Broadcast alias dictionary + deterministic embedding rerank, as an
actor-pool ``map_batches`` stage: the alias index (normalized surface
-> canonical id, plus the embedding matrix for rerank) is built ONCE
per actor in ``__init__`` from a ``ray.put`` handle or a plain dict —
the small side of a broadcast join, never a shuffle (SURVEY.md §2.4).

Reference analog: ``features/highlights.py`` (alias dicts + dynamic
Levenshtein budget + best-match-by-min-distance); extended per the
north star with a cosine rerank over candidate aliases when the fuzzy
budget admits more than one.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa

from ..functions.fuzzy import (
    ESTADOS,
    char_ngram_embedding,
    get_levenshtein_dist,
    levenshtein,
)
from ..functions.textnorm import normalize_answer

# preds whose object is a federative-unit entity
UF_PRED_LEAVES = {"estado", "doc_id_uf"}


class EntityLinker:
    """obj surface form -> canonical entity id.

    For UF-domain predicates: exact normalized alias hit, else fuzzy
    candidates within the length-bucketed Levenshtein budget, reranked
    by embedding cosine; below-threshold stays as-is (surface form is
    its own entity).  Other predicates pass through unchanged.
    """

    def __init__(self, alias_dict: Optional[Dict[str, str]] = None, dim: int = 64):
        if alias_dict is None:
            alias_dict = dict(ESTADOS)
        # ray.put handle support (broadcast once, fetch per actor)
        try:
            import ray

            if isinstance(alias_dict, ray.ObjectRef):
                alias_dict = ray.get(alias_dict)
        except ImportError:  # pragma: no cover
            pass
        # normalized surface -> canonical code (both the code itself and
        # its long-name variations, highlights.py:50-58 reversed)
        self.surface_to_id: Dict[str, str] = {}
        surfaces: List[str] = []
        for code, name in alias_dict.items():
            for surface in (code, name):
                key = normalize_answer(surface)
                self.surface_to_id.setdefault(key, code)
                surfaces.append(key)
        self.surfaces = surfaces
        self.matrix = np.stack([char_ngram_embedding(s, dim) for s in surfaces])
        self.dim = dim
        # per-actor memo: distinct obj surfaces repeat heavily across
        # batches (bounded by the linkable-value vocabulary, small)
        self._memo: Dict[str, str] = {}

    def link_one(self, pred_leaf: str, value: str) -> str:
        if pred_leaf not in UF_PRED_LEAVES or not value:
            return value
        key = normalize_answer(value)
        hit = self.surface_to_id.get(key)
        if hit is not None:
            return hit
        # fuzzy candidates within the dynamic budget
        budget = get_levenshtein_dist(key)
        cands = [
            i
            for i, s in enumerate(self.surfaces)
            if levenshtein(key, s, budget) <= budget
        ]
        if not cands:
            return value
        if len(cands) == 1:
            return self.surface_to_id[self.surfaces[cands[0]]]
        # embedding rerank among admitted candidates
        qv = char_ngram_embedding(key, self.dim)
        sims = self.matrix[cands] @ qv
        return self.surface_to_id[self.surfaces[cands[int(np.argmax(sims))]]]

    def _link_value(self, value) -> str:
        """link_one for a known-UF row, memoized on the surface form
        (the leaf only gates UF membership; linking itself is
        leaf-independent)."""
        if not value:
            return value
        hit = self._memo.get(value)
        if hit is None:
            hit = self.link_one(next(iter(UF_PRED_LEAVES)), value)
            self._memo[value] = hit
        return hit

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Dictionary-encoded linking: both ``pred`` and ``obj_surface``
        repeat heavily, so the per-row work is two integer gathers —
        ``rsplit``/``normalize_answer``/fuzzy run once per DISTINCT value
        (same pattern as triples.project_triples_batch's url crc)."""
        import pyarrow.compute as pc

        preds = batch["pred"]
        if isinstance(preds, pa.ChunkedArray):
            preds = preds.combine_chunks()
        objs = batch["obj_surface"]
        if isinstance(objs, pa.ChunkedArray):
            objs = objs.combine_chunks()

        # nulls would surface as NaN dictionary indices (float array ->
        # IndexError on gather); fill with "" for the encode — "" is
        # never a UF leaf so null preds take the passthrough branch —
        # and restore null obj_linked at the end (the scalar path's
        # behavior for null objects)
        null_obj = pc.is_null(objs).to_numpy(zero_copy_only=False)
        preds = pc.fill_null(preds, "")
        objs = pc.fill_null(objs, "")

        pred_enc = preds.dictionary_encode()
        pred_vals = pred_enc.dictionary.to_pylist()
        uf_leaf = np.fromiter(
            (
                p is not None and p.rsplit(".", 1)[-1] in UF_PRED_LEAVES
                for p in pred_vals
            ),
            bool,
            count=len(pred_vals),
        )
        uf_mask = uf_leaf[np.asarray(pred_enc.indices)] if len(pred_vals) else (
            np.zeros(len(batch), bool)
        )

        obj_enc = objs.dictionary_encode()
        obj_vals = np.asarray(obj_enc.dictionary.to_pylist(), dtype=object)
        obj_idx = np.asarray(obj_enc.indices) if len(obj_vals) else (
            np.zeros(len(batch), np.int64)
        )
        if uf_mask.any():
            linked_vals = obj_vals.copy()
            for i in np.unique(obj_idx[uf_mask]):
                linked_vals[i] = self._link_value(obj_vals[i])
            out = np.where(uf_mask, linked_vals[obj_idx], obj_vals[obj_idx])
        else:
            out = obj_vals[obj_idx] if len(obj_vals) else np.zeros(0, object)
        if null_obj.any():
            out = out.copy()
            out[null_obj] = None
        return batch.append_column("obj_linked", pa.array(out, pa.string()))


def link_stage(
    triples_ds,
    alias_dict=None,
    concurrency=None,
    batch_size: int | None = None,
):
    kwargs = dict(batch_format="pyarrow")
    if batch_size:
        kwargs["batch_size"] = batch_size
    if concurrency is not None:
        return triples_ds.map_batches(
            EntityLinker,
            fn_constructor_kwargs={"alias_dict": alias_dict},
            concurrency=concurrency,
            **kwargs,
        )
    return triples_ds.map_batches(EntityLinker(alias_dict), **kwargs)
