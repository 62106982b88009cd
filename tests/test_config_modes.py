"""Differential tests for the non-default config modes: keep_links
(the reference without ignoreTag('a')) and structure-mode compact."""

from __future__ import annotations

import importlib.util
import string
import sys

import pytest
from hypothesis import given, settings, strategies as st

from wikiextractor_spark import textops


@pytest.fixture(scope="module")
def reference_keeplinks():
    """A FRESH reference import with keepLinks=True and NO
    ignoreTag('a') — the upstream configuration this fork disables
    (reference WikiExtractor.py:78, 712-713)."""
    spec = importlib.util.spec_from_file_location(
        "wikiextractor_reference_keeplinks", "/root/reference/WikiExtractor.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["wikiextractor_reference_keeplinks"] = mod
    spec.loader.exec_module(mod)
    mod.keepLinks = True
    return mod


LINK_FIXTURES = [
    "see [[Target]] ok",
    "see [[Target|anchor]] ok",
    "plural [[dog|dogs]]s trail",
    "drop [[Category:Birds|birds]] now",
    "keep [[w:Page|page]] now",
    "an <a href=x>existing</a> anchor",
    "mixed [[a|b]] with '''bold''' and <b>tags</b>",
]


@pytest.mark.parametrize("text", LINK_FIXTURES)
def test_keeplinks_clean_matches_reference(reference_keeplinks, text):
    assert textops.clean_wikitext(text, keep_links=True) == reference_keeplinks.clean(text)


@pytest.mark.parametrize("text", LINK_FIXTURES)
def test_keeplinks_wikilinks_match_reference(reference_keeplinks, text):
    got = textops.expand_wikilinks(text, keep_links=True)
    exp = reference_keeplinks.wikiLink.sub(reference_keeplinks.make_anchor_tag, text)
    assert got == exp


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet=string.ascii_letters[:6] + "[]|<>:w '", max_size=120))
def test_fuzz_keeplinks(reference_keeplinks, text):
    assert textops.clean_wikitext(text, keep_links=True) == reference_keeplinks.clean(text)


# ---------------------------------------------------------------------------
# Clean-output invariants (SURVEY §5.3.3) — on entity-free input, the
# differential fuzz already implies these; they are kept as readable
# self-documenting properties of the engine contract.
# ---------------------------------------------------------------------------

import re

_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
_LINK = re.compile(r"\[\[.*?\]\]")

soup = st.text(alphabet="abcdefgh{}|[]'<>*=:\n ().,-!?", max_size=200)


@settings(max_examples=200, deadline=None)
@given(soup)
def test_clean_removes_complete_comments(text):
    assert not _COMMENT.search(textops.clean_wikitext(text))


@settings(max_examples=200, deadline=None)
@given(soup)
def test_clean_removes_complete_links(text):
    assert not _LINK.search(textops.clean_wikitext(text))


@settings(max_examples=200, deadline=None)
@given(soup)
def test_compact_lines_nonempty(text):
    assert all(line for line in textops.compact_lines(text))
