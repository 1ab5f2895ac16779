"""T5 input/label sentence construction (reference
``features/preprocess.py:37-97, 236-321`` semantics, re-implemented).

These are the R2->R3 scalar functions: a window context plus a question
becomes the seq2seq input ``question: {q} context: {ctx}``, and an
annotated answer becomes the label ``[SENTk] [Type]: value`` (compound:
one ``[SENTk]`` per sub-answer).  All functions are pure scalars used
inside ``map_batches`` UDFs — no state, no I/O.

Sentence-id model: the context is partitioned by ``\\n``; the id of the
sentence containing char position ``p`` is ``count('\\n' in ctx[:p]) + 1``
(position −1 — unannotated — maps to 0).  When ``use_sentence_id`` is
on, every newline in the context is replaced by a numbered `` [SENTk] ``
token (numbered from 1, one extra token prepended at the start), after
``{``/``}`` are rewritten to parentheses so ``str.format`` numbering is
safe (reference preprocess.py:19-67).
"""

from __future__ import annotations

from typing import List, Optional, Union

from .grammar import SENT_TOKEN
from ..registry import COMPLEMENT_TYPE

# cap so [SENTk] ids never blow up the model vocab assumptions
# (reference preprocess.py:16)
MAX_SENTENCES = 9999


def replace_brackets_with_parenthesis(text: str) -> str:
    return text.replace("{", "(").replace("}", ")")


def replace_linebreaks_with_tokens(text: str) -> str:
    """``'a\\nb'`` -> ``' [SENT1] a [SENT2] b'`` (reference
    preprocess.py:37-67: leading token always added; numbering from 1)."""
    text = "\n" + replace_brackets_with_parenthesis(text)
    num = text.count("\n")
    if num > MAX_SENTENCES:
        raise ValueError("Maximum number of sentences violated.")
    text = text.replace("\n", SENT_TOKEN)
    return text.format(*range(1, num + 1))


def replace_linebreaks_with_spaces(text: str) -> str:
    return text.replace("\n", " ")


def sent_id_of(context: str, answer_position: int) -> int:
    """Sentence id of the char position (0 when unannotated / -1)
    (reference preprocess.py:84-97)."""
    if answer_position == -1:
        return 0
    return context[:answer_position].count("\n") + 1


def generate_t5_input_sentence(
    context: str, question: str, use_sentence_id: bool
) -> str:
    """Reference preprocess.py:252-268."""
    if use_sentence_id:
        context = replace_linebreaks_with_tokens(context)
    else:
        context = replace_linebreaks_with_spaces(context)
    return f"question: {question} context: {context}"


def generate_t5_label_sentence(
    answer: str,
    answer_start: Union[List[int], int, None],
    context: str,
    use_sentence_id: bool,
) -> str:
    """Reference preprocess.py:271-321.

    Simple answer  + int start  -> ``[SENTk] {answer}``.
    Compound answer + list of starts -> each ``[...]`` sub-answer gets
    its own ``[SENTk]`` prefix, except ``[aparece no texto]`` raw-text
    complements which attach to the preceding sub-answer.
    ``answer_start=None`` (unannotated) -> answer unchanged.
    """
    if not use_sentence_id:
        return answer
    if isinstance(answer_start, list):
        sub_answers = answer.split("[")[1:]
        token_pattern = SENT_TOKEN.strip()
        sent_ids = [sent_id_of(context, s) for s in answer_start]
        out = ""
        for sub in sub_answers:
            if sub.startswith(COMPLEMENT_TYPE):
                out = f"{out}[{sub}"
            else:
                out = f"{out}{token_pattern} [{sub}"
        return out.format(*sent_ids)
    if isinstance(answer_start, int):
        return f"[SENT{sent_id_of(context, answer_start)}] {answer}"
    return answer


def complement_questions_to_require_rawdata(
    questions, complement: Optional[str] = None
):
    """Append the raw-text complement to question(s) (reference
    preprocess.py:236-250)."""
    from ..registry import COMPLEMENT

    complement = complement if complement is not None else COMPLEMENT
    if isinstance(questions, str):
        return questions.replace("?", complement)
    return [q.replace("?", complement) for q in questions]
