"""Packed-bitset Bloom filter built and probed with native Spark
expressions.

Spark's own ``BloomFilterAggregate`` / ``might_contain`` expressions
exist only in the optimizer-internal function registry (they back
Catalyst's runtime shuffle-join filters and are not SQL-callable in
4.1), and PySpark exposes no DataFrame API for them — so this module
implements the same structure with public primitives:

* **build**: each 64-bit key sets ``num_hashes`` positions
  ``pmod(xxhash64(i, key), num_bits)``; positions are packed into
  64-bit words with a ``bit_or`` aggregation (shuffle ∝ the number of
  WORDS, not keys) and the ≤ ``num_bits/64`` (word, bits) rows are
  collected into one dense driver-side list — a few MB for a
  hundred-million-key filter (64M bits ≈ 8 MB), the bounded-collect
  class this engine allows (cf. similarity._MAX_BROADCAST_QUERIES).
* **probe**: the dense word list becomes ONE array literal in the
  plan; membership is ``num_hashes`` row-local ``element_at`` +
  bitwise-AND checks — zero joins, zero exchanges, whole-stage
  codegen.  False positives at the classic ``(1−e^{−kn/m})^k`` rate;
  NEVER false negatives (build and probe share the position
  expression verbatim).

Use it where a distinct-key broadcast relation would be too big: the
probe literal costs ``num_bits/8`` bytes against the hash relation's
~30+ bytes per distinct key.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

#: guard: refuse to build filters whose dense word list would exceed
#: this many longs driver-side (128M bits = 16 MB) — above that the
#: caller should shard the filter or fall back to a shuffle join
_MAX_WORDS = 2_000_000


def optimal_num_hashes(num_bits: int, num_items: int) -> int:
    """The textbook ``k = (m/n)·ln 2``, clamped to [1, 16]."""
    if num_items <= 0:
        return 1
    return max(1, min(16, round(num_bits / num_items * math.log(2))))


def _position(key: Column, i: int, num_bits: int) -> Column:
    """Position of hash-function ``i`` for ``key`` — shared verbatim
    by build and probe so false negatives are structurally
    impossible."""
    return F.pmod(F.xxhash64(F.lit(i), key), F.lit(num_bits))


#: signed-long single-bit masks, indexed by bit position (bit 63 is
#: the sign bit); a 64-element literal lookup avoids variable-shift
#: expressions, which the typed PySpark API does not accept
_POW2 = [1 << i for i in range(63)] + [-(1 << 63)]


def _bit_mask(pos: Column) -> Column:
    """``1 << (pos % 64)`` as a signed long, via the literal table."""
    return F.element_at(
        F.lit(_POW2), (F.pmod(pos, F.lit(64)) + F.lit(1)).cast("int"))


def bloom_build(
    df: DataFrame,
    key_col: str,
    num_bits: int,
    num_hashes: int,
) -> list[int]:
    """Aggregate a Bloom bitset over a 64-bit key column; returns the
    dense word list (``num_bits/64`` Python ints).

    One explode (``num_hashes`` positions per key) + one ``bit_or``
    aggregation keyed on the word index — the exchange carries at
    most ``num_bits/64`` rows regardless of key count (map-side
    partial OR) — then a bounded collect.
    """
    num_bits = ((num_bits + 63) // 64) * 64
    words = num_bits // 64
    if words > _MAX_WORDS:
        raise ValueError(
            f"bloom_build: {num_bits} bits = {words} words exceeds the "
            f"{_MAX_WORDS}-word driver-side bound; shard the filter or "
            "use a shuffle join")
    key = F.col(key_col)
    positions = F.array(
        *[_position(key, i, num_bits) for i in range(num_hashes)])
    sparse = (
        df.select(F.explode(positions).alias("__p"))
        .select(
            F.shiftright("__p", 6).alias("__w"),
            _bit_mask(F.col("__p")).alias("__b"),
        )
        .groupBy("__w")
        .agg(F.bit_or("__b").alias("__bits"))
        .collect()
    )
    dense = [0] * words
    for row in sparse:
        dense[row["__w"]] = row["__bits"]
    return dense


def bloom_might_contain(
    dense: list[int],
    key: Column,
    num_hashes: int,
) -> Column:
    """Row-local membership predicate against a built word list.

    The word list is ONE plan literal; each of the ``num_hashes``
    checks is ``element_at(words, pos>>6 + 1) & (1 << pos%64) != 0``
    — all JVM-side, codegen-friendly, no join.
    """
    num_bits = len(dense) * 64
    arr = F.lit(dense)
    checks = []
    for i in range(num_hashes):
        p = _position(key, i, num_bits)
        word = F.element_at(arr, (F.shiftright(p, 6) + F.lit(1)).cast("int"))
        checks.append(word.bitwiseAND(_bit_mask(p)) != F.lit(0))
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out
