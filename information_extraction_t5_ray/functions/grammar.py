"""The T5 answer micro-grammar: ``[SENTk] [Type]: value [aparece no texto]: raw``.

Stateless parse/build helpers replicating the reference's
``features/sentences.py`` semantics (cited per function).  These run
inside ``map_batches`` UDFs on the predictions table — no state, no I/O.

The grammar constants mirror ``features/sentences.py:7-11`` and
``features/questions/type_map.py:11``.
"""

from __future__ import annotations

import re
from typing import List, Tuple

SENTENCE_ID_PATTERN = re.compile(r"\[SENT(.*?)\]")
SUBANSWER_PATTERN = re.compile(r"([^[\]]+)(?:$|\[)")
TYPE_NAME_PATTERN = re.compile(
    r"\[([A-Za-záàâãéèêíïóôõöúçñÁÀÂÃÉÈÍÏÓÔÕÖÚÇÑºª_ \/]*?)\]"
)
SENT_TOKEN = " [SENT{}] "
COMPLEMENT_TYPE = "aparece no texto"
NOT_APPLICABLE = "N/A"


def has_text(s: str) -> bool:
    """sentences.py:19-22."""
    return len(s.strip()) > 0


def clean_sub_answer(s: str) -> str:
    """sentences.py:25-33 — drop ``:`` and surrounding whitespace."""
    return s.replace(":", "").strip()


def find_sub_answers(sentence: str) -> List[str]:
    """sentences.py:36-52."""
    out = []
    for sub in SUBANSWER_PATTERN.findall(sentence):
        if has_text(sub):
            out.append(clean_sub_answer(sub))
    return out


def find_ids_of_sent_tokens(sentence: str) -> List:
    """sentences.py:55-74 (non-numeric ids are kept as strings)."""
    ids = []
    for sentid in SENTENCE_ID_PATTERN.findall(sentence):
        try:
            ids.append(int(sentid))
        except ValueError:
            ids.append(sentid)
    return ids


def find_type_names(
    sentence: str, type_to_typename: dict | None = None
) -> List[str]:
    """sentences.py:89-107.  ``type_to_typename`` is the broadcast reverse
    type map; when given, display names are mapped back to type-names
    (unknown names raise, matching sentences.py:77-87)."""
    names = TYPE_NAME_PATTERN.findall(sentence)
    if type_to_typename is not None:
        mapped = []
        for n in names:
            if n not in type_to_typename:
                raise ValueError(f"Unknown type name: {n}")
            mapped.append(type_to_typename[n])
        return mapped
    return names


def split_context_into_sentences(context: str) -> List[str]:
    """sentences.py:110-117."""
    return context.split("\n")


def split_t5_sentence_into_components(
    sentence: str, type_to_typename: dict | None = None
) -> Tuple[List, List[str], List[str]]:
    """sentences.py:120-153."""
    return (
        find_ids_of_sent_tokens(sentence),
        find_type_names(sentence, type_to_typename),
        find_sub_answers(sentence),
    )


def check_sent_id_is_valid(context: str, sent_id: int) -> bool:
    """sentences.py:156-171."""
    if sent_id < 0:
        return False
    return len(split_context_into_sentences(context)) >= sent_id


def deconstruct_answer(
    sentence: str, type_to_typename: dict | None = None
) -> Tuple[List[str], List[str]]:
    """sentences.py:174-227 — split a (possibly compound) answer into
    individual ``[SENTk] [type_name]: value`` subsentences, folding a
    trailing ``[aparece no texto]`` complement into its owner."""
    sent_ids, type_names, sub_answers = split_t5_sentence_into_components(
        sentence, type_to_typename
    )
    sub_sentences: List[str] = []
    all_type_names: List[str] = []

    while len(sub_answers) > 0:
        sub = ""
        if len(sent_ids) > 0:
            sid = sent_ids.pop(0)
            sub += SENT_TOKEN.format(sid).strip() + " "
        if len(type_names) > 0:
            tn = type_names.pop(0)
            sub += f"[{tn}]: "
            all_type_names.append(tn)
        sub += f"{sub_answers.pop(0)} "
        if (
            len(type_names) > 0
            and len(sub_answers) > 0
            and type_names[0] == COMPLEMENT_TYPE
        ):
            sub += f"[{type_names.pop(0)}] {sub_answers.pop(0)} "
        sub_sentences.append(sub.strip())

    return sub_sentences, all_type_names


def get_subanswer_from_subsentence(
    subsentence: str,
) -> str:
    """sentences.py:230-256 — ``[SENT1] [tn] 88975 [aparece no texto] 88.975``
    -> ``[tn]: 88975`` (no type-map applied)."""
    _, tn, ans = split_t5_sentence_into_components(subsentence, None)
    if len(ans) == 0:
        return ""
    if len(tn) == 0:
        return ans[0]
    return f"[{tn[0]}]: {ans[0]}"


def get_raw_answer_from_subsentence(subsentence: str):
    """sentences.py:259-278 — text after the ``[aparece no texto]`` marker,
    or None."""
    try:
        return subsentence.split(f"[{COMPLEMENT_TYPE}]")[1].strip()
    except IndexError:
        return None


def get_clean_answer_from_subanswer(subanswer: str) -> List[str]:
    """sentences.py:281-299."""
    try:
        return find_sub_answers(subanswer)
    except Exception:
        return [""]
