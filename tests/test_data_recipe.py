"""data_recipe_epochs (llm/domains.py): the training-mixture sizing
calculation.  Oracle equivalence is certified by the registry sweep;
these pin the semantics a hash alone would not explain — weight
normalization, sqrt flattening, the epoch cap, and budget accounting.
"""

from __future__ import annotations

import math

import go_pulsar_elasticsearch_spark as gpe

gpe.load_all()

from go_pulsar_elasticsearch_spark.llm.domains import (  # noqa: E402
    _RECIPE_BUDGET_X,
    _RECIPE_EPOCH_CAP,
    data_recipe_epochs,
)


def test_recipe_weights_normalize_and_flatten(spark, sf_dir):
    rows = data_recipe_epochs(spark, sf_dir).collect()
    assert rows
    assert math.isclose(sum(r["weight"] for r in rows), 1.0, rel_tol=1e-9)
    # sqrt flattening: weight ratios follow sqrt(token ratios), so the
    # smallest domain is over-represented vs its raw token share
    tot = sum(r["n_tokens"] for r in rows)
    smallest = min(rows, key=lambda r: r["n_tokens"])
    assert smallest["weight"] > smallest["n_tokens"] / tot
    big, small = (
        max(rows, key=lambda r: r["n_tokens"]),
        min(rows, key=lambda r: r["n_tokens"]),
    )
    assert math.isclose(
        big["weight"] / small["weight"],
        math.sqrt(big["n_tokens"] / small["n_tokens"]),
        rel_tol=1e-5,  # the 6dp rounding on sqrt perturbs the ratio
    )


def test_recipe_epoch_cap_and_budget(spark, sf_dir):
    rows = data_recipe_epochs(spark, sf_dir).collect()
    tot = sum(r["n_tokens"] for r in rows)
    for r in rows:
        assert 0 < r["epochs"] <= _RECIPE_EPOCH_CAP
        uncapped = _RECIPE_BUDGET_X * tot * r["weight"] / r["n_tokens"]
        assert math.isclose(
            r["epochs"], min(_RECIPE_EPOCH_CAP, uncapped), rel_tol=1e-9
        )
        assert math.isclose(
            r["alloc_tokens"], r["epochs"] * r["n_tokens"], rel_tol=1e-12
        )
    # the allocation never exceeds the budget (capped domains give
    # tokens back; nothing re-spends them in this single-pass recipe)
    assert sum(r["alloc_tokens"] for r in rows) <= _RECIPE_BUDGET_X * tot + 1e-6
