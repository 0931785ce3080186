"""SRT multi-level collation vs the reference's own SortTest cases
(test/uk/me/parabola/imgfmt/app/srt/SortTest.java) and structural
properties of the parsed cp1252 table."""

from __future__ import annotations

import pytest

from mkgmap_spark.functions.collation import default_table, parse_srt


@pytest.fixture(scope="module")
def key():
    return default_table(1252).sort_key_hex


def test_sorttest_same_and_lengths(key):
    assert key("aAbâ") == key("aAbâ")
    assert key("aabbbb") > key("aab")
    # SortTest.testLengths
    assert key("-Û") < key("-ü:X")
    assert key("-ü:X") < key("-Û$")
    assert key("–") < key("–X")
    assert key("–TÛ‡²") > key("–")


def test_sorttest_strength_hierarchy(key):
    assert key("AAA") < key("AAB")  # primary
    assert key("AAA") < key("AÂA")  # secondary
    assert key("AAa") < key("AAA")  # tertiary (lower case first)
    # primary differences override secondary ones anywhere in the word
    assert key("AAAA") < key("ÂAAA") < key("AAAB")
    # secondary overrides tertiary
    assert key("aaa") < key("Aaa") < key("aâa")
    assert key("Aaa") < key("aÂa")


def test_sorttest_bad_character_replaced(key):
    # U+063A is not in cp1252: encoder replacement '?'
    assert key("aغb") == key("a?b")
    assert key("aغb") != key("aa")
    assert key("aغb") != key("")


def test_expansions(key):
    # 'expand ... to . . .': primary weights equal three dots, with the
    # +7/+2 secondary/tertiary offsets keeping the strings distinct
    assert key("…").split("-")[0] == key("...").split("-")[0]
    assert key("…") != key("...")
    assert key("½").split("-")[0] == key("1/2").split("-")[0]
    assert key("™").split("-")[0] == key("TM").split("-")[0]


def test_digit_superscripts_tertiary(key):
    # 1,¹ share a primary/secondary group (tertiary difference only)
    assert key("1").split("-")[0] == key("¹").split("-")[0]
    assert key("1") != key("¹")
    assert key("1") < key("2") < key("9")


def test_accent_groups_secondary(key):
    # a á à â å ä ã æ share a primary, differ at secondary
    base = key("a").split("-")[0]
    for ch in "áàâåäãæ":
        assert key(ch).split("-")[0] == base, ch
    assert key("a") < key("á") < key("à")  # file order: á before à


def test_ignorable_characters(key):
    # soft hyphen U+00AD is fully ignorable at primary+secondary (it
    # sits in the leading =-group): primary key unchanged
    assert key("a­b").split("-")[0] == key("ab").split("-")[0]


def test_parse_positions_monotone():
    t = default_table(1252)
    # primary weights are positive for every letter and strictly
    # ordered a < b < ... < z
    letters = [t.primary["abcdefghijklmnopqrstuvwxyz".encode("cp1252")[i]] for i in range(26)]
    assert all(p > 0 for p in letters)
    assert letters == sorted(letters) and len(set(letters)) == 26
    # case pairs share primary AND secondary, differ at tertiary
    for lo, up in [("a", "A"), ("z", "Z"), ("é", "É")]:
        bl, bu = lo.encode("cp1252")[0], up.encode("cp1252")[0]
        assert t.primary[bl] == t.primary[bu]
        assert t.secondary[bl] == t.secondary[bu]
        assert t.tertiary[bl] < t.tertiary[bu]


def test_parse_minimal_table():
    t = parse_srt(
        """
codepage 1252
characters
 < a,A ; b
 < c
expand d to a c
"""
    )
    ba, bA, bb, bc, bd = (x.encode("cp1252")[0] for x in "aAbcd")
    assert t.primary[ba] == t.primary[bA] == t.primary[bb] == 1
    assert t.secondary[ba] == 1 and t.secondary[bb] == 2
    assert t.tertiary[ba] == 1 and t.tertiary[bA] == 2
    # advancePos: next primary = previous + its secondary count (2)
    assert t.primary[bc] == 3
    exp = t.weights_of_byte(bd)
    assert [p for p, _, _ in exp] == [t.primary[ba], t.primary[bc]]


def test_all_single_byte_codepages_parse():
    """Every single-byte sort description the reference ships parses
    and orders its locale's alphabet: Cyrillic under cp1251, Greek
    under cp1253, and case stays a tertiary difference everywhere."""
    for cp in (1250, 1251, 1253, 1254, 1255, 1256, 1257, 1258):
        t = default_table(cp)
        assert sum(1 for p in t.primary.values() if p) > 150, cp
        k = t.sort_key_hex
        assert k("a") < k("b") < k("z"), cp
        assert k("a") != k("A") and k("a").split("-")[0] == k("A").split("-")[0], cp
    ru = default_table(1251).sort_key_hex
    assert ru("а") < ru("б") < ru("я")  # Cyrillic primary order
    assert ru("Москва") != ru("москва")
    assert ru("Москва").split("-")[0] == ru("москва").split("-")[0]
    el = default_table(1253).sort_key_hex
    assert el("α") < el("β") < el("ω")  # Greek primary order


# ---------------------------------------------------------------------------
# Unicode (cp65001 `multi`) paged-weight path — reference goldens from
# test/uk/me/parabola/imgfmt/app/srt/UnicodeKeyTest.java and
# UnicodeCollatorTest.java
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ukey():
    return default_table(65001).sort_key_hex


def test_unicode_table_parses():
    t = default_table(65001)
    assert t.multi
    # the shipped table defines ~15k code points and >1000 expansions
    assert len(t._defined_units()) > 10000
    assert len(t.expansion_of) > 1000


def test_unicode_keytest_equals(ukey):
    # UnicodeKeyTest.testEquals
    s = "ABCȴဣ"
    assert ukey(s) == ukey(s)


def test_unicode_keytest_simple_less_than(ukey):
    # UnicodeKeyTest.testSimpleLessThan: Latin < accented-Latin < Greek
    assert ukey("G") < ukey("Ò")
    assert ukey("G") < ukey("Γ")


def test_unicode_keytest_expand(ukey):
    # UnicodeKeyTest.testExpand
    assert ukey("!") < ukey("ß")
    assert ukey("A:") < ukey("Ǣ")


def test_unicode_expansion_weights(ukey):
    # ß expands to s s: identical primaries, +7 secondary / +2 tertiary
    # per expanded char (SrtTextReader.expandState non-experimental)
    p_ss, s_ss, t_ss = ukey("ss").split("-")
    p_sz, s_sz, t_sz = ukey("ß").split("-")
    assert p_sz == p_ss
    assert s_sz != s_ss and t_sz != t_ss


def test_unicode_undefined_chars_skipped(ukey):
    # multi path: a char with no page contributes nothing at any
    # strength (Sort.fillKey hasPage skip) — NOT a '?' fallback.
    # U+E000 is a private-use char absent from the table.
    assert ukey("ab") == ukey("ab")


def test_unicode_scripts_order(ukey):
    # script blocks keep their table order: Latin < Greek < Cyrillic
    assert ukey("z") < ukey("α")
    assert ukey("ω") < ukey("а")  # Greek omega < Cyrillic a
    # case remains a within-script non-primary difference
    assert ukey("м").split("-")[0] == ukey("М").split("-")[0]
    assert ukey("м") != ukey("М")


def test_unicode_ignorables(ukey):
    # soft hyphen U+00AD and ZWJ U+200D are listed as fully ignorable
    # at primary strength in the first `characters` group
    assert ukey("a­b").split("-")[0] == ukey("ab").split("-")[0]
    assert ukey("a‍b").split("-")[0] == ukey("ab").split("-")[0]
