"""Skew mitigation: salted two-stage aggregation and salted replicated
join.

The north-rule requirement is explicit skew handling for hot blocks.
Inside the ER pipeline the deployed mitigations are the blocking-cap
stage (operators/blocking.py bounds any block's pair fan-out and reports
the caps via lineage) plus AQE skew-join splitting; these two operators
are the GENERAL-PURPOSE forms for user queries, exact-by-construction:

* ``salted_aggregate`` — a hot grouping key overwhelms one reducer
  because the classic plan shuffles every row of that key to one task.
  Stage 1 groups by (key, salt) so a hot key spreads over ``n_salts``
  tasks; stage 2 combines the algebraic partials by key alone. The
  second shuffle moves ≤ n_salts rows per key, so the hot key's reduce
  work is parallelized at the cost of one tiny extra exchange. Only
  algebraic aggregates are offered (count/sum/min/max, avg derived as
  sum/count) — they re-associate exactly, so the result is IDENTICAL to
  the unsalted plan (oracled against plain GROUP BY SQL). Caveat: a
  float-typed sum re-associates only up to IEEE rounding — sum exact
  encodings (integer cents, unscaled longs) when the result must be
  bit-stable, as the oracled driver query does.
* ``salted_join`` — a hot join key sends every probe row of that key to
  one task. The probe side gets a deterministic salt in [0, n_salts);
  the (small) build side is replicated n_salts times; joining on
  (key, salt) spreads the hot key's probe rows across n_salts tasks.
  Build-side cost is n_salts× rows — use only when build is
  broadcast-small (the same regime where AQE's skew split also works;
  this form is for when the build side must shuffle anyway, e.g. it is
  itself an aggregate too big to broadcast but small per key).

Salts must be DETERMINISTIC (a hash of a stable column, never rand()):
reruns, retried tasks, and the DuckDB oracle all have to agree row for
row, so both operators take ``salt_src`` — any stable unique column —
and derive salt = pmod(xxhash64(salt_src), n_salts). The salt never
appears in the output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (fn name in specs) -> (stage-1 partial, stage-2 combine)
_ALGEBRAIC = {
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def _salt(salt_src: str, n_salts: int) -> Column:
    return F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts)).alias("_salt")


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    specs: list[tuple[str, str, str]],
    salt_src: str,
    n_salts: int = 16,
) -> DataFrame:
    """GROUP BY ``keys`` with hot-key-safe two-stage shuffle.

    ``specs`` = [(fn, col, alias)] with fn in count/sum/min/max ("count"
    ignores its col). Result is exactly ``df.groupBy(keys).agg(...)``.
    """
    for fn, _c, _a in specs:
        if fn not in _ALGEBRAIC:
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted")
    stage1 = df.withColumn("_salt", _salt(salt_src, n_salts)).groupBy(
        *keys, "_salt"
    ).agg(
        *[
            _ALGEBRAIC[fn][0](F.col(c) if fn != "count" else None).alias(f"_p_{a}")
            for fn, c, a in specs
        ]
    )
    return stage1.groupBy(*keys).agg(
        *[
            _ALGEBRAIC[fn][1](F.col(f"_p_{a}")).alias(a)
            for fn, _c, a in specs
        ]
    )


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    salt_src: str,
    n_salts: int = 8,
    how: str = "inner",
    force_shuffle: bool = False,
) -> DataFrame:
    """``probe.join(build, on, how)`` with the probe side's hot keys
    spread across ``n_salts`` tasks (build replicated n_salts times).
    Exact: every probe row still meets every build row of its key
    exactly once. ``how`` in inner/left.

    ``force_shuffle`` hints shuffle_hash on the build side — if the build
    side is broadcast-small the salt is pointless (broadcast joins don't
    shuffle the probe side at all); the flag exists so tests and demos
    can materialize the salted exchange deliberately."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left only")
    p = probe.withColumn("_salt", _salt(salt_src, n_salts))
    b = build.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    if force_shuffle:
        b = b.hint("shuffle_hash")
    joined = p.join(b, [on, "_salt"], how)
    return joined.drop("_salt")
