"""Skew-resistant equi-join via key salting.

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew; explicit salting remains the tool when one build-side key is so hot
that even split shuffle blocks overwhelm a task — the classic power-law
join in web/log data.

Mechanics: the probe side gets a uniform random salt in [0, n); the
build side is replicated n× (one row per salt). The join key becomes
(key, salt) — the hot key's rows spread over n tasks. Replication is
explode over a literal range: cost n·|build|, chosen only for the
small(er) side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# Salting replicates the build side once per salt, so join types where
# unmatched BUILD rows survive (right/full outer) would emit each of them
# n_salts times. Only probe-preserving types are sound.
_SALTABLE = {"inner", "left", "leftouter", "left_outer", "semi", "left_semi", "leftsemi", "anti", "left_anti", "leftanti"}


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join `probe ⋈ build` on `on`, salted to n_salts sub-keys."""
    if how.lower() not in _SALTABLE:
        raise ValueError(
            f"salted_join supports probe-preserving join types only ({sorted(_SALTABLE)}); "
            f"got {how!r} — right/full would duplicate unmatched build rows n_salts times"
        )
    salted_probe = probe.withColumn("_salt", (F.rand(seed) * n_salts).cast("int"))
    salted_build = build.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_probe.join(salted_build, [on, "_salt"], how).drop("_salt")
