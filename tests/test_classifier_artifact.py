"""quality_classifier_lr's train-once/probe-many artifact (round-5
VERDICT #6): the fitted model persists to disk; a later process (here:
a cleared in-process memo) reloads it instead of refitting, and the
reloaded model scores identically to the fresh fit."""

from __future__ import annotations

import shutil

from go_pulsar_elasticsearch_spark.llm import classifier

_SF = "/root/testdata/sf0.001"


def _scores(spark):
    df = classifier.quality_classifier_lr(spark, _SF)
    return {
        r["doc_id"]: (round(r["p_good"], 9), r["pred"])
        for r in df.collect()
    }


def test_artifact_reload_matches_fresh_fit(spark):
    mdir = classifier._model_dir(_SF)
    shutil.rmtree(mdir, ignore_errors=True)
    classifier._LR_MODELS.pop(_SF, None)

    fresh = _scores(spark)          # fits AND writes the artifact
    import os

    assert os.path.isdir(mdir), "fit did not persist the model artifact"

    classifier._LR_MODELS.pop(_SF, None)  # simulate a new process
    reloaded = _scores(spark)       # must LOAD, not refit
    assert reloaded == fresh

    # third call: the in-process memo serves it (no disk, no fit)
    assert _scores(spark) == fresh
