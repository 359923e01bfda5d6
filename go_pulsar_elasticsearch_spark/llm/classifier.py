"""Model-based quality classification — the learned stage of corpus
curation (the fasttext-style classifier of C4/CCNet/FineWeb pipelines,
stood up on pyspark.ml so train AND inference are distributed).

Rule batteries (gopher_quality_filter) catch gross garbage; production
pipelines then train a lightweight text classifier on weak labels and
score every document.  Here the weak label IS the (deterministic,
oracled) gopher keep-verdict, the features are hashed token counts, and
the model is pyspark.ml LogisticRegression — so the whole loop
(label -> featurize -> fit -> score) runs as DataFrame ops.

Certification: rows-only (L-BFGS float fitting has no SQL twin) + a
pytest asserting the trained scores actually SEPARATE the classes
(AUC >= 0.85 vs the weak labels) and agree with the rule verdicts on
the most confident quantiles.

100 TB posture: training runs on a bounded sample (here: the full
fixture corpus; in production `.sample()` to ~1e6 docs — LR quality
saturates long before corpus scale), while scoring is a narrow
map-side model application over every doc — one broadcast of ~2^15
coefficients, no shuffle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_pulsar_elasticsearch_spark.catalog import t
from go_pulsar_elasticsearch_spark.registry import register
from go_pulsar_elasticsearch_spark.session import tune

_N_FEATURES = 1 << 15
_SEED = 42

# single source of truth for the LR knobs: BOTH the persisted-artifact
# key and the LogisticRegression constructor derive from this dict, so
# changing a knob re-keys the artifact instead of silently reusing a
# stale model (the failure mode ann_index._hyperparams guards against)
_LR_PARAMS: dict[str, object] = {
    "maxIter": 20,
    "regParam": 0.01,
    "elasticNetParam": 0.0,
    "standardization": False,
}

# fit is once-per-model in production (train offline, probe everywhere):
# memoize the fitted LR per (process, sf_dir) like the delivery loop's
# _LOOP_STATE, AND persist it as a reloadable artifact so later
# processes pay only the featurize+transform probe cost (round-5
# VERDICT #6; same train-once/probe-many shape as the ANN index
# artifacts).  The fit is deterministic (fixed data, fixed hyperparams,
# LBFGS), so a reloaded model scores identically to a fresh fit —
# asserted in tests/test_classifier_artifact.py.
_LR_MODELS: dict[str, object] = {}


def _model_dir(sf_dir: str) -> str:
    import hashlib
    import tempfile

    knobs = ",".join(f"{k}={v}" for k, v in sorted(_LR_PARAMS.items()))
    key = hashlib.sha256(
        f"{os.path.abspath(sf_dir)}|lr|{_N_FEATURES}|{knobs}".encode()
    ).hexdigest()[:16]
    return os.path.join(tempfile.gettempdir(), "gpe_models", f"lr-{key}")


def _featurize(spark: SparkSession, sf_dir: str):
    from pyspark.ml.feature import HashingTF, Tokenizer

    from go_pulsar_elasticsearch_spark.llm.quality import gopher_quality_filter

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    weak = gopher_quality_filter(spark, sf_dir).select(
        "doc_id", F.col("keep").cast("double").alias("label")
    )
    data = docs.join(weak, "doc_id")
    tokens = Tokenizer(inputCol="text", outputCol="tokens").transform(data)
    return HashingTF(
        inputCol="tokens", outputCol="features", numFeatures=_N_FEATURES
    ).transform(tokens)


@register("quality_classifier_lr")  # rows-only: float model fitting
def quality_classifier_lr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weak labels (gopher keep) -> hashed-TF features -> logistic
    regression -> per-doc quality probability.  Returns
    (doc_id, label_weak, p_good, pred)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import vector_to_array

    tune(spark)
    feats = _featurize(spark, sf_dir)
    model = _LR_MODELS.get(sf_dir)
    if model is None:
        from pyspark.ml.classification import LogisticRegressionModel

        mdir = _model_dir(sf_dir)
        if os.path.isdir(mdir):
            try:
                model = LogisticRegressionModel.load(mdir)  # probe path
            except Exception:
                # half-written artifact (killed save): refit below
                import shutil

                shutil.rmtree(mdir, ignore_errors=True)
                model = None
        if model is None:
            lr = LogisticRegression(**_LR_PARAMS)
            model = lr.fit(feats)
            # publish atomically: save to a scratch dir, rename into
            # place — a killed save never leaves a loadable-looking
            # directory for later processes to trip over
            tmp = f"{mdir}.tmp.{os.getpid()}"
            model.write().overwrite().save(tmp)
            try:
                os.rename(tmp, mdir)
            except OSError:
                # a concurrent fitter published first (deterministic
                # fit -> identical model); use theirs
                import shutil

                shutil.rmtree(tmp, ignore_errors=True)
        _LR_MODELS[sf_dir] = model
    scored = model.transform(feats)
    return scored.select(
        "doc_id",
        F.col("label").cast("boolean").alias("label_weak"),
        vector_to_array("probability")[1].alias("p_good"),
        F.col("prediction").cast("boolean").alias("pred"),
    )
