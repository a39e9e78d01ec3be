"""Golden + property tests for the pure-Python hashing core (SURVEY.md §5.2).

The reference ships no tests of its own functions, so this corpus is the
authoritative Tier-A contract: FIXTURES.md golden (key, slot, node) triples,
the all-16384-slots equivalence of the closed-form node map with the
reference's hardcoded ranges (clusterhash_extension.cpp:71-84), and
hypothesis invariants.
"""

from __future__ import annotations

import pytest
from hypothesis import given, strategies as st

# the reference's domain is UTF-8 strings (DuckDB VARCHAR is validated
# UTF-8, which cannot hold lone surrogates), so exclude category Cs
_utf8_chars = st.characters(blacklist_categories=("Cs",))
_utf8_text = st.text(alphabet=_utf8_chars)

from duckdb_cluster_hash_spark.core import (
    CRC16_TABLE,
    REFERENCE_NODE_RANGES_6,
    TOTAL_SLOTS,
    crc16,
    crc16_bitwise,
    extract_tag,
    get_node,
    get_slot,
    node_of_slot,
)

# FIXTURES.md §3 golden values: (key, slot, node6, node3)
GOLDENS = [
    ("foo", 12182, 5, 3),
    ("bar", 5061, 2, 1),
    ("user:1000", 1649, 1, 1),
    ("{user:1000}:profile", 1649, 1, 1),
    ("{user:1000}:sessions", 1649, 1, 1),
    ("product:5432", 13236, 5, 3),
    ("{user:profile}:1000", 1391, 1, 1),
    ("", 0, 1, 1),
    ("{}", 15257, 6, 3),
    ("user:{}", 6865, 3, 2),
    ("{}}x", 1961, 1, 1),
    ("a{b}c{d}e", 3300, 2, 1),
    ("{{x}}", 11068, 5, 3),
    ("Customer#000000000", 15606, 6, 3),
    ("Customer#000000001", 11479, 5, 3),
    ("Customer#000000002", 7348, 3, 2),
    ("order:1", 14374, 6, 3),
    ("order:2", 2117, 1, 1),
    ("{cust:0}:order:1", 11845, 5, 3),
    ("ключ", 10303, 4, 2),
    ("日本語キー", 15866, 6, 3),
]


@pytest.mark.parametrize("key,slot,node6,node3", GOLDENS)
def test_golden_triples(key, slot, node6, node3):
    assert get_slot(key) == slot
    assert get_node(key) == node6
    assert get_node(key, 3) == node3


def test_crc16_table_matches_bitwise():
    # table-driven vs independent bitwise implementation, byte-level corpus
    samples = [b"", b"\x00", b"\xff" * 5, b"123456789", "ключ".encode()]
    samples += [bytes([i]) for i in range(256)]
    for s in samples:
        assert crc16(s) == crc16_bitwise(s)
    # CRC16/XMODEM check value (public test vector)
    assert crc16(b"123456789") == 0x31C3


def test_table_is_xmodem():
    assert len(CRC16_TABLE) == 256
    assert CRC16_TABLE[0] == 0x0000
    assert CRC16_TABLE[1] == 0x1021  # the polynomial itself


def test_node_closed_form_matches_reference_ranges():
    """ceil(6*(2*slot+1)/32768) equals the hardcoded table for ALL slots."""
    for node, lo, hi in REFERENCE_NODE_RANGES_6:
        for slot in (lo, lo + 1, (lo + hi) // 2, hi - 1, hi):
            assert node_of_slot(slot, 6) == node
    # exhaustive
    expected = {}
    for node, lo, hi in REFERENCE_NODE_RANGES_6:
        for slot in range(lo, hi + 1):
            expected[slot] = node
    for slot in range(TOTAL_SLOTS):
        assert node_of_slot(slot, 6) == expected[slot]


def test_node3_is_canonical_redis_ranges():
    assert node_of_slot(0, 3) == 1
    assert node_of_slot(5460, 3) == 1
    assert node_of_slot(5461, 3) == 2  # floor form would say 2 at 5461? no — near-miss check
    assert node_of_slot(10922, 3) == 2
    assert node_of_slot(10923, 3) == 3
    assert node_of_slot(16383, 3) == 3


def test_tag_extraction_rules():
    assert extract_tag("{user:1000}:profile") == "user:1000"
    assert extract_tag("no-braces") == "no-braces"
    assert extract_tag("{}") == "{}"  # empty tag -> whole key
    assert extract_tag("x{}y{z}") == "x{}y{z}"  # FIRST brace pair only
    assert extract_tag("a{b}c{d}e") == "b"
    assert extract_tag("{{x}}") == "{x"
    assert extract_tag("a{bc") == "a{bc"  # unclosed
    assert extract_tag("}a{b}") == "b"


@given(_utf8_text)
def test_slot_in_range(key):
    assert 0 <= get_slot(key) < TOTAL_SLOTS


@given(_utf8_text, st.integers(min_value=1, max_value=128))
def test_node_in_range_and_monotone(key, n):
    node = get_node(key, n)
    assert 1 <= node <= n


@given(st.integers(min_value=0, max_value=TOTAL_SLOTS - 1),
       st.integers(min_value=1, max_value=128))
def test_node_monotone_in_slot(slot, n):
    if slot > 0:
        assert node_of_slot(slot - 1, n) <= node_of_slot(slot, n)


@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="{}"), min_size=1))
def test_brace_wrapping_is_identity(key):
    assert get_slot("{" + key + "}") == get_slot(key)


@given(st.text(alphabet=_utf8_chars, min_size=0, max_size=40))
def test_tag_equality_implies_slot_equality(tag):
    if tag and "}" not in tag and "{" not in tag:
        a = get_slot("{" + tag + "}:a")
        b = get_slot("b:{" + tag + "}:c" if "{" not in tag else tag)
        assert a == get_slot("{" + tag + "}zzz") == b


def test_user_keys_histogram_golden():
    """FIXTURES.md §4 distribution goldens for user:1..1000."""
    keys = [f"user:{i}" for i in range(1, 1001)]
    h3, h6 = {}, {}
    for k in keys:
        h3[get_node(k, 3)] = h3.get(get_node(k, 3), 0) + 1
        h6[get_node(k, 6)] = h6.get(get_node(k, 6), 0) + 1
    assert h3 == {1: 332, 2: 337, 3: 331}
    assert h6 == {1: 167, 2: 165, 3: 167, 4: 170, 5: 168, 6: 163}
