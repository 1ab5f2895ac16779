"""Byte-identical text normalization: scalar spec vs the reference chain,
and the vectorized Arrow path vs the scalar spec (property-based)."""

import re

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from information_extraction_t5_ray.functions.textnorm import (
    clean_chunked_array,
    clean_text,
    html_to_text,
    html_to_text_array,
    normalize_answer,
)


def reference_clean(text: str) -> str:
    """Independent transcription of the reference chain
    (context.py:409-416 + basic_to_squad.py:226) used as the oracle."""
    text = text.replace("༡༨/༢", "")
    text = text.replace("\t", " ")
    text = re.sub(r"\s*\n+\s*", r"\n", text)
    text = re.sub(r"(\s)\1+", r"\1", text)
    text = text.replace("´", "'")
    text = text.replace("™", "TM")
    text = text.replace("…", "...")
    return text.strip()


CASES = [
    "",
    "   ",
    "plain text",
    "tabs\t\tand  spaces",
    "a \n \n b\n\n\nc",
    "´quote™ …ellipsis… ༡༨/༢ done",
    "mixed \xa0\xa0 nbsp runs",
    "\n lead and trail \n",
    "a\r\n\r\nb",
    "x  y",
    "multi\n\t \nws runs \t\t\n\n here",
]


@pytest.mark.parametrize("text", CASES)
def test_clean_matches_reference_chain(text):
    assert clean_text(text) == reference_clean(text)


@pytest.mark.parametrize("text", CASES)
def test_vectorized_matches_scalar(text):
    got = clean_chunked_array(pa.array([text, text + "!"]))
    assert got[0].as_py() == clean_text(text)
    assert got[1].as_py() == clean_text(text + "!")


WS_CHARS = "\t\n\r \xa0  　\x0b\x0c\x85\x1c"


@settings(max_examples=300, deadline=None)
@given(
    st.text(
        alphabet=st.one_of(
            st.sampled_from(WS_CHARS + "abĉ´™…{}[]é"),
            st.characters(min_codepoint=32, max_codepoint=0x2FFF),
        ),
        max_size=60,
    )
)
def test_property_scalar_equals_reference_and_vectorized(text):
    want = reference_clean(text)
    assert clean_text(text) == want
    assert clean_chunked_array(pa.array([text]))[0].as_py() == want


def test_html_to_text_roundtrip():
    text = "Agência Nº\n0123\nConta  Corrente\t45"
    html = b"<html><body><pre>" + text.encode() + b"</pre></body></html>"
    assert html_to_text(html) == text
    assert html_to_text_array(pa.array([html]))[0].as_py() == text
    # extraction then cleaning == cleaning the raw text (the invariant
    # checked per url at the pipeline level)
    assert clean_text(html_to_text(html)) == clean_text(text)


def test_normalize_answer_against_reference(reference_path):
    from information_extraction_t5.utils.metrics import (
        normalize_answer as ref_norm,
    )

    cases = [
        "São Paulo",
        "88.975",
        "the  A an San   Street",
        "Água--é_boa!",
        "",
        "N/A",
        "R. Álvares Penteado, 112 - Centro",
    ]
    for c in cases:
        assert normalize_answer(c) == ref_norm(c)
