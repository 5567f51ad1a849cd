"""Model-based quality classifier (stages/qualmodel.py): the
distributed GD must actually learn (recover the teacher boundary),
and the decision must be deterministic across runs."""

import numpy as np
import pytest


def _docs():
    import ray.data as rd

    return rd.read_parquet("/root/testdata/sf0.001/documents.parquet")


def test_classifier_recovers_teacher_boundary(ray_session):
    from octoray.stages.qualmodel import (quality_feature_table,
                                          train_quality_classifier)

    out = train_quality_classifier(_docs()).to_pandas()
    labels = quality_feature_table(_docs()).to_pandas()[["doc_id", "label"]]
    m = out.merge(labels, on="doc_id")
    acc = (m["keep"] == (m["label"] == 1.0)).mean()
    assert acc >= 0.95, f"classifier failed to learn: accuracy {acc}"
    # the scores separate, not just the decisions
    pos = m[m.label == 1.0]["quality_prob"].mean()
    neg = m[m.label == 0.0]["quality_prob"].mean()
    assert pos - neg > 0.5


def test_classifier_deterministic(ray_session):
    from octoray.stages.qualmodel import train_quality_classifier

    a = train_quality_classifier(_docs()).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    b = train_quality_classifier(_docs()).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert (a["quality_prob"] == b["quality_prob"]).all()
    assert (a["keep"] == b["keep"]).all()


def test_standardization_constants_rounded(ray_session):
    from octoray.stages.qualmodel import (FEATURES, _standardize_stats,
                                          quality_feature_table)

    feats = quality_feature_table(_docs()).materialize()
    means, stds = _standardize_stats(feats)
    assert len(means) == len(FEATURES)
    for v in means + stds:
        # on the shared 6-decimal grid (bit-exact across engines)
        assert v == np.floor(v * 1e6 + 0.5) / 1e6


def test_classifier_driver_path_equals_distributed(ray_session):
    from octoray.stages.qualmodel import train_quality_classifier

    a = train_quality_classifier(_docs()).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)  # driver fast path
    b = train_quality_classifier(_docs(), driver_limit=0).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert (a["quality_prob"] == b["quality_prob"]).all()
    assert (a["keep"] == b["keep"]).all()
