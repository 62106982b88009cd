"""Differential tests: wikiextractor_spark.textops vs the reference.

Every clean() step (C1-C27), every compact() branch, and the
drop_nested edge cases get a targeted fixture; hypothesis then fuzzes
the whole chain on adversarial markup soup.
"""

from __future__ import annotations

import string

import pytest
from hypothesis import given, settings, strategies as st

from wikiextractor_spark import textops

# One fixture per clean() step / quirk (FIXTURES.md §A coverage list).
CLEAN_FIXTURES = [
    "plain text with no markup at all",
    # C1 nested templates; unbalanced variants
    "a {{tmpl}} b",
    "a {{outer {{inner}} still outer}} b",
    "unbalanced {{a}}} tail",
    "unbalanced open {{a {{b}} tail",
    "{{a}} mid {{b}} end",
    "close only }} weird",
    "{{}}",
    # C2 tables
    "before {| class=x |cell|} after",
    "t {| a {| b |} c |} u",
    # C3/P5 wikilinks
    "see [[Target]] ok",
    "see [[Target|anchor]] ok",
    "plural [[dog|dogs]]s trail",
    "trail [[cat]]s here",
    "drop [[Category:Birds|birds]] now",
    "keep [[w:Page|page]] now",
    "colon-first [[:weird]] link",
    # C4 residual links
    "residual [[a|b|c]] stays-not",
    # C5/C6 external links
    "ext [http://example.com anchor text] done",
    "bare [http&] done",
    # C7-C12 quotes
    "'''''bolditalic''''' mid",
    "'''bold''' mid",
    "''\"italicquote\"'' mid",
    "''italic'' mid",
    '""qq"" mid',
    "stray ''' triple",
    "stray '' double",
    # C13 entities (double decode, malformed passthrough)
    "amp &amp;nbsp; end",
    "num &#65; hex &#x41; bad &bogus; end",
    "&#xZZ; malformed hex",
    "&#999999999999; overflow",
    # C14 comments
    "a <!-- comment --> b",
    "a <!-- multi\nline --> b",
    # C15 self-closing
    "a <br/> b <ref name=x/> c <hr /> d",
    # C16 ignored tags (incl. 'a' since keepLinks=False)
    "a <b>bold</b> <div class=x>div</div> </span> <a href=x>link</a> b",
    # C17 discard elements; nested same-tag single-pass residue
    "a <table>rows</table> b",
    "a <ref>one<ref>two</ref>three</ref> b",
    "a <ul><li>x</li></ul> b",
    # C18 placeholders incl. identical-content global replace
    "m <math>x+y</math> n <math>z</math> o",
    "c <code>foo</code> d <code>foo</code> e <code>bar</code> f",
    "mix <math>a</math> and <code>a</code> done",
    # C19 guillemets
    "quote <<word>> end",
    # C20 preformatted
    "normal\n preformatted line\nnormal",
    # C21-C23 whitespace
    "tab\there",
    "multi   spaces",
    "dots..... here",
    # C24 literal-sequence near-no-ops (and the near-miss " ,")
    "seq ,:.)]Â» here",
    "pre [(Â« post",
    "near-miss , comma",
    # C25 punctuation-only lines (two adjacent: single pass)
    "a\n!!!\nb",
    "a\n!!!\n???\nb",
    # C26
    "x,, y,. z",
    # C27 magic words
    "a __NOTOC__ b __TOC__ c",
    # compact-facing content survives clean
    "== Section ==\nbody",
    "text with {{tmpl}} and [[link]] and '''bold''' and &amp; and <b>tag</b> together",
]


@pytest.mark.parametrize("text", CLEAN_FIXTURES)
def test_clean_matches_reference(reference, text):
    assert textops.clean_wikitext(text) == reference.clean(text)


COMPACT_FIXTURES = [
    "",
    "plain paragraph",
    "== Head ==\nbody line",
    "== Head ==\n=== Sub ===\nbody line",
    "== Empty ==\n== Next ==\nbody",
    "== Deep ==\n=== Sub ===\n== Back ==\nbody",
    "== Ends! ==\nbody",
    "== Ends? ==\nbody",
    "==  spaced head  ==\nbody",
    "== Head == trailing junk\nbody",
    "++Page Title++\nbody",
    "++Ends!++\nbody",
    "++++",  # empty ++ title
    "* list item\nreal line",
    "# numbered\n: indent\n; def\nreal",
    "{ table residue\nline }\n|pipe start",
    "(parenthesized only)\nreal",
    "...\n.-.-\nreal",
    "== H ==\n* only a list\nbody after list",
    "line one\n\n\nline two",
    "== A ==\nfirst\nsecond",
    "body before any header",
    "== A ==\n== B ==\n=== C ===\nfilled",
]


@pytest.mark.parametrize("structure", [False, True])
@pytest.mark.parametrize("text", COMPACT_FIXTURES)
def test_compact_matches_reference(reference, text, structure):
    assert textops.compact_lines(text, structure) == reference.compact(text, structure)


DROPNESTED_CASES = [
    ("", r"{{", r"}}"),
    ("no delims at all", r"{{", r"}}"),
    ("{{x}}", r"{{", r"}}"),
    ("a{{x}}b{{y}}c", r"{{", r"}}"),
    ("a{{x{{y}}z}}b", r"{{", r"}}"),
    ("a{{x{{y{{z}}}}w}}b", r"{{", r"}}"),
    ("open only {{x", r"{{", r"}}"),
    ("close only x}}", r"{{", r"}}"),
    ("{{a}}}", r"{{", r"}}"),
    ("{{{a}}", r"{{", r"}}"),
    ("{{a{{b}}", r"{{", r"}}"),
    ("{{a}}{{b}}{{c}}", r"{{", r"}}"),
    ("{{a{{b}}c}}{{d}}", r"{{", r"}}"),
    ("x{|t|}y", r"{\|", r"\|}"),
    ("x{|a{|b|}c|}y", r"{\|", r"\|}"),
    ("{{}}{{}}", r"{{", r"}}"),
    ("{{a}} }} {{b}}", r"{{", r"}}"),
    ("{{ {{ }} {{ }}", r"{{", r"}}"),
]


@pytest.mark.parametrize("text,od,cd", DROPNESTED_CASES)
def test_drop_nested_matches_reference(reference, text, od, cd):
    assert textops.drop_nested(text, od, cd) == reference.dropNested(text, od, cd)


UNESCAPE_CASES = [
    "",
    "no entities",
    "&amp;", "&amp;nbsp;", "&lt;b&gt;", "&#65;", "&#x41;", "&#X41;",
    "&bogus;", "&#xZZ;", "&#;", "&;", "&#999999999999;",
    "mixed &amp; &quot; &#97; &#x62; &nope; end",
]


@pytest.mark.parametrize("text", UNESCAPE_CASES)
def test_unescape_matches_reference(reference, text):
    assert textops.unescape_entities(text) == reference.unescape(text)


# ---------------------------------------------------------------------------
# Property-based fuzz: full chain equality on markup soup
# ---------------------------------------------------------------------------

MARKUP_ALPHABET = (
    string.ascii_letters[:8]
    + "{}|[]'\"<>&#;=*:\n ().,-_!?"
)

soup = st.text(alphabet=MARKUP_ALPHABET, max_size=200)


@settings(max_examples=300, deadline=None)
@given(soup)
def test_fuzz_clean(reference, text):
    assert textops.clean_wikitext(text) == reference.clean(text)


@settings(max_examples=300, deadline=None)
@given(soup)
def test_fuzz_compact(reference, text):
    assert textops.compact_lines(text, False) == reference.compact(text, False)


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="{}ab|", max_size=80))
def test_fuzz_drop_nested_braces(reference, text):
    assert textops.drop_nested(text, r"{{", r"}}") == reference.dropNested(text, r"{{", r"}}")


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="{}|ab", max_size=80))
def test_fuzz_drop_nested_tables(reference, text):
    assert textops.drop_nested(text, r"{\|", r"\|}") == reference.dropNested(text, r"{\|", r"\|}")


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="&#;xabc123 ", max_size=60))
def test_fuzz_unescape(reference, text):
    assert textops.unescape_entities(text) == reference.unescape(text)
