"""Metric implementations agree: sharded eval step vs numpy topk vs reference
formula; HTML report builder works."""

import numpy as np

import jax
import jax.numpy as jnp

import pretorched_tpu as p
from pretorched_tpu.utils import HTML, topk_accuracy


def test_eval_step_matches_numpy_topk():
    from pretorched_tpu.parallel.evaluate import sharded_accuracy_step

    m = p.resnet18(num_classes=10, pretrained=None)
    step = sharded_accuracy_step(m.module)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 64, 64, 3), jnp.float32)
    labels = np.arange(8) % 10
    out = jax.device_get(step(m.variables, x, jnp.asarray(labels)))
    logits = np.asarray(m.module.apply(m.variables, x))
    top1, top5 = topk_accuracy(logits, labels, topk=(1, 5))
    assert abs(100.0 * out['top1'] / out['count'] - top1) < 1e-4
    assert abs(100.0 * out['top5'] / out['count'] - top5) < 1e-4


def test_html_report():
    page = HTML.page([('a.jpg', 'cat 0.98'), ('b.mp4', 'dog 0.51')],
                     title='preds')
    assert page.startswith('<!DOCTYPE html>')
    assert '<video controls src="b.mp4">' in page
    assert '<img src="a.jpg"/>' in page
    assert HTML.element('div', 'x', id_='i', cls_='c') == \
        '<div id="i" class="c">x</div>'


def test_average_precision_meter_matches_sklearn():
    """AP meter (reference datasets/utils.py:86-199) vs sklearn on tie-free
    scores; VOC's -1/0/1 difficult-example convention handled."""
    sk = __import__('pytest').importorskip('sklearn.metrics')
    from pretorched_tpu.datasets.utils import AveragePrecisionMeter

    rng = np.random.RandomState(0)
    scores = rng.randn(64, 3).astype(np.float32)
    targets = rng.choice([1, -1], size=(64, 3))

    meter = AveragePrecisionMeter(difficult_examples=False)
    meter.add(scores[:40], targets[:40])      # streamed in two batches
    meter.add(scores[40:], targets[40:])
    got = meter.value()
    want = [sk.average_precision_score(targets[:, c] == 1, scores[:, c])
            for c in range(3)]
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # difficult (0) rows are skipped entirely when difficult_examples=True
    targets_d = targets.copy()
    targets_d[::5] = 0
    meter = AveragePrecisionMeter(difficult_examples=True)
    meter.add(scores, targets_d)
    got = meter.value()
    keep = targets_d != 0
    want = [sk.average_precision_score(targets_d[keep[:, c], c] == 1,
                                       scores[keep[:, c], c])
            for c in range(3)]
    np.testing.assert_allclose(got, want, rtol=1e-6)
