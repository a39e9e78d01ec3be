"""DuckDB-SQL fragments that independently recompute the hashing core.

The driver's correctness gate runs each Spark query side-by-side with an
ANSI-SQL oracle in DuckDB.  The oracle cannot load the reference extension,
so ``cluster_slot`` is re-derived here in *pure SQL*: the hash-tag rule via
``regexp_extract`` and CRC16/XMODEM via ``list_reduce`` over the key's
UTF-8 bytes with the 256-entry table as a list literal.  Validated against
all FIXTURES.md golden ``(key, slot)`` pairs (tests/test_oracle_sql.py).

These fragments are scalar expressions, so they can be spliced into any
oracle query.  They are intentionally independent of the Spark
implementations in functions/clusterhash.py — agreement between the two is
itself part of the correctness evidence.
"""

from __future__ import annotations

from duckdb_cluster_hash_spark.core import CRC16_TABLE, TOTAL_SLOTS, DEFAULT_NODES

_TABLE_LITERAL = "[" + ",".join(str(v) for v in CRC16_TABLE) + "]"

# Hash-tag rule: first '{', first '}' after it, non-empty between (else whole
# key).  DuckDB regexp_extract returns '' on no-match, like Spark's.
_EFFECTIVE_KEY = (
    "CASE WHEN regexp_extract({key}, '^[^{{]*\\{{([^}}]*)\\}}', 1) <> '' "
    "THEN regexp_extract({key}, '^[^{{]*\\{{([^}}]*)\\}}', 1) ELSE {key} END"
)

# CRC16/XMODEM fold over UTF-8 bytes: bytes come from hex(encode(k)) sliced
# into 2-hex-digit pairs; list_reduce seeds from the prepended 0 (init=0).
_SLOT_OF_EFFECTIVE = (
    "(list_reduce(list_prepend(0::BIGINT, "
    "[ (strpos('0123456789ABCDEF', substr(hex(encode({k})), 2*i-1, 1)) * 16 "
    "+ strpos('0123456789ABCDEF', substr(hex(encode({k})), 2*i, 1)) - 17)::BIGINT "
    "FOR i IN range(1, octet_length(encode({k})) + 1) ]), "
    "(acc, b) -> xor((acc * 256) & 65280, "
    f"({_TABLE_LITERAL})[xor((acc // 256) & 255, b) + 1])) % {TOTAL_SLOTS})"
)


def slot_sql(key_expr: str) -> str:
    """DuckDB scalar SQL: ``cluster_slot(key_expr)`` (NULL-safe, int32)."""
    eff = _EFFECTIVE_KEY.format(key=key_expr)
    return (
        f"(CASE WHEN {key_expr} IS NULL THEN NULL ELSE "
        + _SLOT_OF_EFFECTIVE.format(k=eff)
        + " END)::INTEGER"
    )


def node_of_slot_sql(slot_expr: str, n_nodes: int | str = DEFAULT_NODES) -> str:
    """DuckDB scalar SQL: slot -> shard via the verified closed form."""
    return (
        f"(({n_nodes} * (2 * ({slot_expr}) + 1) + {2 * TOTAL_SLOTS - 1}) "
        f"// {2 * TOTAL_SLOTS})::INTEGER"
    )


def node_sql(key_expr: str, n_nodes: int | str = DEFAULT_NODES) -> str:
    """DuckDB scalar SQL: ``cluster_node(key_expr[, n])``."""
    return node_of_slot_sql(slot_sql(key_expr), n_nodes)
