"""Whale-safe capped basket projection — shared by every pair self-join.

Every co-occurrence operator in the tree (market-basket pairs, basket
lift, label-propagation / k-core edge builds) starts from the deduplicated
(l_orderkey, l_partkey) projection and self-joins it on the order key.
That join is QUADRATIC in basket size: C(lines, 2) pairs per order. TPC-H
shaped data bounds lines at 7, but a real event log does not — one 10k-item
whale session produces ~5·10⁷ joined rows in a single task, the exact
defect class the round-10 Q17 incident measured (a planted whale cubed the
per-key fan-out). The fix is the same discipline: bound the fan-out BEFORE
the join, never after.

``capped_order_parts`` keeps at most ``BASKET_CAP`` lines per order,
selected by a deterministic multiplicative hash of the part key SALTED
BY THE ORDER KEY (round-12, ADVICE r11: a part-only hash made every
over-cap basket keep a highly correlated low-hash part subset, so
multi-whale skew concentrated pair support on the same few parts; mixing
``l_orderkey`` into the hash decorrelates the sample across baskets
while staying deterministic and bit-identical cross-engine), in two
stages:

1. **Map-side pre-gate** (whales only). Orders with more than
   ``BASKET_CAP × _OVERSAMPLE`` distinct lines keep a row only when its
   hash falls under ``⌊M·CAP·OVERSAMPLE / n⌋`` — expected survivors
   ≈ CAP·OVERSAMPLE regardless of basket size, so no downstream task ever
   sees the raw whale. The per-order line count feeding the gate is a
   map-combinable aggregate (whale-safe by construction). For orders at or
   under the oversample bound the threshold is ≥ M, i.e. the gate
   provably keeps everything — it only activates on whales.
2. **Exact rank cap.** ``row_number`` per order over (hash, part) keeps
   the first ``BASKET_CAP`` — a hard bound, so per-order pair fan-out is
   at most C(CAP, 2) = 496 rows. The window partition is bounded by the
   pre-gate (≈ CAP·OVERSAMPLE rows even for a whale owning 10% of the
   fact table), so the sort task can never become the straggler the gate
   exists to prevent.

Determinism / oracle parity: both stages use only exact BIGINT arithmetic
(Knuth multiplicative hash mod 2³², integer division) expressible
identically in DuckDB — ``OP_CAPPED_CTES`` is the literal SQL twin, so the
capped projection is bit-identical cross-engine and every consumer stays
hash-checked. Both keys are reduced mod a prime below 2³⁰ before any
multiply so every intermediate stays far inside BIGINT in BOTH engines at
any scale factor (soak replicas shift keys by 10¹²; an unreduced multiply
would overflow): salt = (orderkey mod P)·A + (partkey mod P), all
< 2.7·10¹⁸; then hash = ((salt mod P)·A) mod 2³², again < 2.9·10¹⁸.
Hash ties inside one order break on the raw part key.

Recall contract (documented tradeoff): for baskets over ``BASKET_CAP``
lines, pair supports are computed over a deterministic pseudo-random
sample of CAP lines, so pairs involving a whale basket are UNDERCOUNTED
relative to the unbounded definition — the standard cap in production
basket mining (a 10k-line basket's C(n,2) ≈ 5·10⁷ pairs carry almost no
association signal per pair, and an unbounded build is a scale-killer).
Fixture data never exceeds 7 lines per order, so the cap binds nothing at
any test scale factor; ``tests/test_basket_cap.py`` pins both facts (a
planted whale is capped, the fixtures are untouched).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hadoop_fs_ceph_spark.tables import t

BASKET_CAP = 32  # max lines per basket entering any pair self-join
_OVERSAMPLE = 4  # pre-gate expected survivors = CAP * OVERSAMPLE
_H_P = 999999937  # prime < 2^30: key reduction keeps the multiply in BIGINT
_H_A = 2654435761  # Knuth 32-bit multiplicative hash constant
_H_M = 2**32
_GATE_NUM = _H_M * BASKET_CAP * _OVERSAMPLE  # 549_755_813_888 ≪ 2^63

# SQL twin of capped_order_parts: CTE chain ending in `op`, so existing
# oracle bodies keep reading `FROM op a JOIN op b`. All positive BIGINT
# arithmetic: DuckDB's % / // match Spark's pmod / div exactly.
OP_CAPPED_CTES = f"""
    op0 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    oph AS (
      SELECT l_orderkey, l_partkey,
             ((((l_orderkey % {_H_P}) * {_H_A}
                + (l_partkey % {_H_P})) % {_H_P}) * {_H_A}) % {_H_M} AS _hk
      FROM op0
    ),
    opn AS (SELECT l_orderkey, COUNT(*) AS _n FROM op0 GROUP BY l_orderkey),
    opg AS (
      SELECT o.l_orderkey, o.l_partkey, o._hk, opn._n
      FROM oph o JOIN opn USING (l_orderkey)
      WHERE opn._n <= {BASKET_CAP * _OVERSAMPLE}
         OR o._hk < {_GATE_NUM} // opn._n
    ),
    op AS (
      SELECT l_orderkey, l_partkey FROM (
        SELECT l_orderkey, l_partkey,
               row_number() OVER (PARTITION BY l_orderkey
                                  ORDER BY _hk, l_partkey) AS _rn
        FROM opg
      ) WHERE _rn <= {BASKET_CAP}
    )"""


def capped_order_parts(spark, sf_dir):
    """The deduplicated (l_orderkey, l_partkey) projection with at most
    ``BASKET_CAP`` deterministically-sampled lines per order (module
    docstring has the full two-stage design + recall contract)."""
    op = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    cnt = op.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("_n"))
    salt = F.pmod(
        F.pmod("l_orderkey", F.lit(_H_P)) * F.lit(_H_A)
        + F.pmod("l_partkey", F.lit(_H_P)),
        F.lit(_H_P),
    )
    hk = F.pmod(salt * F.lit(_H_A), F.lit(_H_M))
    gated = (
        op.join(cnt, "l_orderkey")
        .withColumn("_hk", hk)
        .filter(
            (F.col("_n") <= F.lit(BASKET_CAP * _OVERSAMPLE))
            | (F.col("_hk") < F.expr(f"{_GATE_NUM} div _n"))
        )
    )
    w = Window.partitionBy("l_orderkey").orderBy("_hk", "l_partkey")
    return (
        gated.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= BASKET_CAP)
        .select("l_orderkey", "l_partkey")
    )
