"""Blanket plan hygiene across the ENTIRE query registry: no plan may
contain a CartesianProduct or a row-at-a-time Python UDF, and no batch
operator may use a Following-bounded shrinking window frame (Spark
evaluates those O(n^2) per partition — see interp_linear's history).

This is the regression net for the whole §2B surface at once; per-op
shape assertions live in test_plans.py.
"""

from __future__ import annotations

import pytest

import go_pulsar_elasticsearch_spark as gpe
from go_pulsar_elasticsearch_spark.registry import QUERIES

gpe.load_all()

# streaming jobs can't be explained as batch plans
_SKIP = {"stream_ingest_e2e"}

# full-partition frames (unbounded preceding AND following) are computed
# once per partition — linear, allowed.  Only the shrinking form
# (current row -> unbounded following) is quadratic; it prints as
# specifiedwindowframe(RowFrame, currentrow$(), unboundedfollowing$()).
_SHRINKING = "currentrow$(),unboundedfollowing$()"


@pytest.mark.parametrize("name", sorted(n for n in QUERIES if n not in _SKIP))
def test_plan_is_clean(spark, sf_dir, name):
    from go_pulsar_elasticsearch_spark.plans.inspect import formatted_plan

    plan = formatted_plan(QUERIES[name](spark, sf_dir))
    low = plan.lower()
    assert "cartesianproduct" not in low, f"{name}: cartesian product"
    # row-at-a-time python eval: BatchEvalPython; Arrow paths show up as
    # ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas and are fine
    assert "batchevalpython" not in low, f"{name}: non-Arrow python UDF"
    assert _SHRINKING not in low.replace(" ", ""), (
        f"{name}: shrinking window frame (O(n^2))"
    )
