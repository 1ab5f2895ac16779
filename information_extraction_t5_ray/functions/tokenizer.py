"""Tokenizer protocol for token-budget chunking.

The chunker only needs ``tokenize(text) -> list[str]`` with the
SentencePiece tiling property the reference asserts at
``features/context.py:318-319``: after dropping the first token's ``▁``
prefix char, token lengths tile the text exactly
(``get_tokens_and_offsets``, context.py:8-15, incl. the
``token_lens[0] -= 1`` quirk).

* ``StubSentencePieceTokenizer`` — deterministic, dependency-free:
  ``▁`` replaces each preceding space (so every token's length equals
  the char span it covers) and long words split into fixed-size
  continuation pieces, mimicking subword granularity.  Used for tests
  and benchmarks; satisfies the tiling property for ARBITRARY text.
* ``load_hf_tokenizer`` — the production path (``AutoTokenizer``,
  reference data/convert_dataset_to_squad.py:206-212), gated behind an
  import-try since transformers is not installed in this environment.
"""

from __future__ import annotations

from typing import List, Protocol


class Tokenizer(Protocol):
    def tokenize(self, text: str) -> List[str]: ...


SP_UNDERLINE = "▁"  # '▁'


class StubSentencePieceTokenizer:
    """Deterministic SentencePiece-shaped tokenizer.

    ``piece_size`` bounds token length (~4 chars/token ≈ the subword
    granularity of ptt5-base on Portuguese); continuation pieces carry
    no ``▁``.
    """

    def __init__(self, piece_size: int = 4):
        assert piece_size >= 2
        self.piece_size = piece_size

    def tokenize(self, text: str) -> List[str]:
        if text == "":
            return [SP_UNDERLINE]
        tokens: List[str] = []
        for word in text.split(" "):
            w = SP_UNDERLINE + word
            tokens.append(w[: self.piece_size])
            for i in range(self.piece_size, len(w), self.piece_size):
                tokens.append(w[i : i + self.piece_size])
        return tokens


def load_hf_tokenizer(name: str = "unicamp-dl/ptt5-base-portuguese-vocab"):
    """Production tokenizer (requires transformers; absent here)."""
    try:
        from transformers import AutoTokenizer
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "transformers is not available in this environment; use "
            "StubSentencePieceTokenizer"
        ) from e
    return AutoTokenizer.from_pretrained(name, use_fast=False)  # pragma: no cover
