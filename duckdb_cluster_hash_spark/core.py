"""Pure-Python cluster-hash core (no Spark dependency).

Re-implements, from public knowledge of the algorithm, the semantics of the
reference extension's hashing core (reference: src/clusterhash_extension.cpp):

- ``crc16``            — CRC16/XMODEM (poly 0x1021, init 0x0000, no reflect,
                         no xor-out), table-driven
                         (cpp:18-50).  The table here is *generated* bitwise,
                         not copied, and unit tests additionally cross-check a
                         second independent bitwise implementation.
- ``extract_tag``      — Redis-cluster hash-tag rule: substring between the
                         FIRST ``{`` and the FIRST ``}`` after it, used only
                         if non-empty (cpp:52-61, note ``end != start + 1``).
- ``get_slot``         — ``crc16(tag-or-key bytes) % 16384`` (cpp:52-63).
- ``get_node``         — slot -> shard.  The reference hardcodes 6 inclusive
                         ranges (cpp:65-89); the closed form
                         ``ceil(n*(2*slot+1)/32768)`` is verified equal to the
                         hardcoded table for all 16384 slots at n=6 (see
                         tests/test_core.py) and generalises to the README's
                         documented two-argument ``cluster_node(key, n)``
                         (reference README.md:84,115-117).

Hashing is over the raw UTF-8 bytes of the key — no unicode normalization
(cpp:59,62 hash ``reinterpret_cast<const uint8_t*>`` of the stored string).
"""

from __future__ import annotations

TOTAL_SLOTS = 16384
DEFAULT_NODES = 6

POLY = 0x1021


def _make_crc16_table(poly: int = POLY) -> tuple[int, ...]:
    """Generate the 256-entry CRC16/XMODEM lookup table bitwise."""
    table = []
    for i in range(256):
        crc = i << 8
        for _ in range(8):
            crc = ((crc << 1) ^ poly) if (crc & 0x8000) else (crc << 1)
            crc &= 0xFFFF
        table.append(crc)
    return tuple(table)


CRC16_TABLE: tuple[int, ...] = _make_crc16_table()


def crc16(data: bytes) -> int:
    """CRC16/XMODEM over ``data`` (table-driven; cpp:44-50 semantics)."""
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFF00) ^ CRC16_TABLE[((crc >> 8) & 0xFF) ^ b]
    return crc & 0xFFFF


def crc16_bitwise(data: bytes) -> int:
    """Independent bitwise CRC16/XMODEM (test oracle for :func:`crc16`)."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ POLY) if (crc & 0x8000) else (crc << 1)
            crc &= 0xFFFF
    return crc


def extract_tag(key: str) -> str:
    """Return the effective hash string for ``key``.

    Rule (cpp:52-61): find the first ``{``; find the first ``}`` after it;
    if both exist and the substring between them is non-empty, hash only
    that substring, otherwise hash the whole key.
    """
    start = key.find("{")
    if start != -1:
        end = key.find("}", start + 1)
        if end != -1 and end != start + 1:
            return key[start + 1 : end]
    return key


def get_slot(key: str) -> int:
    """Hash slot of ``key`` in [0, 16383] (cpp:52-63)."""
    return crc16(extract_tag(key).encode("utf-8")) % TOTAL_SLOTS


def node_of_slot(slot: int, n_nodes: int = DEFAULT_NODES) -> int:
    """Owning shard (1..n_nodes) of ``slot``.

    Closed form of the reference's hardcoded even-division ranges
    (cpp:71-84): shard i of n owns slots
    [round((i-1)*16384/n), round(i*16384/n) - 1], i.e.
    node = ceil(n*(2*slot+1)/32768), integer-only.
    """
    if n_nodes < 1:
        raise ValueError(f"n_nodes must be >= 1, got {n_nodes}")
    return (n_nodes * (2 * slot + 1) + 2 * TOTAL_SLOTS - 1) // (2 * TOTAL_SLOTS)


def get_node(key: str, n_nodes: int = DEFAULT_NODES) -> int:
    """Owning shard of ``key`` (cpp:65-89; README.md:84 two-arg form)."""
    return node_of_slot(get_slot(key), n_nodes)


# The reference's hardcoded 6-shard inclusive ranges (cpp:71-82), kept as data
# so tests can assert the closed form reproduces them for every slot.
REFERENCE_NODE_RANGES_6: tuple[tuple[int, int, int], ...] = (
    (1, 0, 2730),
    (2, 2731, 5460),
    (3, 5461, 8191),
    (4, 8192, 10922),
    (5, 10923, 13652),
    (6, 13653, 16383),
)
