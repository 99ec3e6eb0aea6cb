import numpy as np
import pytest

from medical_tri_modal_pilot_tpu.train.metrics import auprc, auroc, best_f1, Evaluator

sklearn = pytest.importorskip("sklearn")
from sklearn.metrics import average_precision_score, roc_auc_score


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_auroc_matches_sklearn(seed):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 2, 500)
    p = rng.random(500)
    # inject ties
    p = np.round(p, 2)
    assert auroc(y, p) == pytest.approx(roc_auc_score(y, p), abs=1e-10)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_auprc_matches_sklearn(seed):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 2, 500)
    p = np.round(rng.random(500), 2)
    assert auprc(y, p) == pytest.approx(average_precision_score(y, p), abs=1e-10)


def test_best_f1_sweep():
    y = np.array([1, 1, 0, 0])
    p = np.array([0.9, 0.8, 0.4, 0.1])
    f1, thr, tpr, tnr = best_f1(y, p)
    assert f1 == 1.0 and 0.4 < thr <= 0.8
    assert tpr == 1.0 and tnr == 1.0


def test_evaluator_accumulates():
    ev = Evaluator()
    ev.add_batch([1, 0], [0.9, 0.2])
    ev.add_batch([1, 0], [0.7, 0.4])
    m = ev.performance_metric()
    assert m["auc"] == 1.0 and m["apr"] == 1.0
    ev.reset()
    assert ev.performance_metric()["f1"] == 0.0
