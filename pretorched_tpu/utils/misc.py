"""Misc utilities (reference: pretorched/utils.py:9-167).

numpy/JAX-native re-implementations of the reference's grab-bag: memoization
decorators, HTML report builder for video predictions, softmax/log-add,
confusion-matrix class accuracy, chunking, sorting, plus the metric meters the
example CLIs use (AverageMeter / top-k accuracy, imagenet_eval.py:262-301).
"""

from __future__ import annotations

from operator import itemgetter
from typing import Iterable, List, Sequence, Tuple

import numpy as np


class cache:
    """Compute an attribute value once and cache it on the instance
    (reference: utils.py:9-27)."""

    def __init__(self, method, name=None):
        self.method = method
        self.name = name or method.__name__
        self.__doc__ = method.__doc__

    def __get__(self, obj, cls):
        if obj is None:
            return self
        value = self.method(obj)
        setattr(obj, self.name, value)
        return value


def lazy_property(fn):
    """Lazy-evaluated property (reference: utils.py:30-39)."""
    attr_name = '_' + fn.__name__

    @property
    def _lazy_property(self):
        if not hasattr(self, attr_name):
            setattr(self, attr_name, fn(self))
        return getattr(self, attr_name)
    return _lazy_property


class HTML:
    """Minimal HTML report builder for (video) prediction galleries
    (reference capability: utils.py:42-126)."""

    @staticmethod
    def head(title: str = 'predictions') -> str:
        return ('<!DOCTYPE html><html><head>'
                f'<meta charset="utf-8"><title>{title}</title>'
                '<style>body{font-family:sans-serif}'
                '.item{display:inline-block;margin:8px;text-align:center}'
                'img,video{max-width:320px}</style></head><body>')

    @staticmethod
    def element(elem: str, inner: str = '', id_: str = '', cls_: str = '',
                attr: str = '') -> str:
        parts = [elem]
        if id_:
            parts.append(f'id="{id_}"')
        if cls_:
            parts.append(f'class="{cls_}"')
        if attr:
            parts.append(attr)
        return f'<{" ".join(parts)}>{inner}</{elem}>'

    @staticmethod
    def media_item(src: str, caption: str) -> str:
        tag = 'video controls' if src.endswith(('.mp4', '.webm')) else 'img'
        media = (f'<video controls src="{src}"></video>' if 'video' in tag
                 else f'<img src="{src}"/>')
        return f'<div class="item">{media}<div>{caption}</div></div>'

    @staticmethod
    def page(items: Iterable[Tuple[str, str]], title: str = 'predictions') -> str:
        body = ''.join(HTML.media_item(src, cap) for src, cap in items)
        return HTML.head(title) + body + '</body></html>'


def softmax(scores: np.ndarray) -> np.ndarray:
    """Numerically-stable softmax over the last axis (reference: utils.py:141-143)."""
    es = np.exp(scores - scores.max(axis=-1)[..., None])
    return es / es.sum(axis=-1)[..., None]


def log_add(log_a, log_b):
    """log(exp(a) + exp(b)) (reference: utils.py:146-147)."""
    return log_a + np.log(1 + np.exp(log_b - log_a))


def class_accuracy(prediction: Sequence[int], label: Sequence[int]):
    """Per-class + mean class accuracy via confusion matrix
    (reference: utils.py:150-156)."""
    from sklearn.metrics import confusion_matrix

    cf = confusion_matrix(prediction, label)
    cls_cnt = cf.sum(axis=1)
    cls_hit = np.diag(cf)
    cls_acc = cls_hit / np.maximum(cls_cnt, 1).astype(float)
    return cls_acc, cls_acc.mean()


def chunks(l, n):  # noqa: E741
    """Yield successive n-sized chunks (reference: utils.py:159-162)."""
    for i in range(0, len(l), n):
        yield l[i:i + n]


def sort(arr):
    """(indices, sorted values) (reference: utils.py:165-167)."""
    return zip(*sorted(enumerate(arr), key=itemgetter(1)))


class AverageMeter:
    """Running average meter used by the CLIs (reference: imagenet_eval.py:262-278)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class DeviceRunningSums:
    """Accumulates a dict of per-step DEVICE scalars without host syncs.

    The example loops must never device_get per step: that blocks step
    i+1's dispatch behind step i's completion, serializing the loop
    against device round-trips (CLAUDE.md invariant). Instead, ``update``
    adds the step's scalar dict into a device-resident running-sum tree
    (async dispatch) and ``snapshot()`` materializes (last, totals) with
    ONE host sync — call it only at print boundaries / loop end."""

    def __init__(self):
        self.last = None       # the most recent step's device dict
        self.sums = None       # elementwise running sums (device)
        self.steps = 0

    def __bool__(self):
        return self.sums is not None

    def update(self, out: dict):
        self.last = out
        self.sums = (dict(out) if self.sums is None
                     else {k: self.sums[k] + out[k] for k in self.sums})
        self.steps += 1

    def snapshot(self):
        """One host sync: returns (last_step_dict, totals_dict) as floats."""
        import jax
        last, sums = jax.device_get((self.last, self.sums))
        return ({k: float(v) for k, v in last.items()},
                {k: float(v) for k, v in sums.items()})

    def totals(self):
        """One host sync: the running totals as floats."""
        import jax
        return {k: float(v) for k, v in jax.device_get(self.sums).items()}


def topk_accuracy(output, target, topk=(1,)) -> List[float]:
    """Top-k accuracy in percent (reference: imagenet_eval.py:288-301)."""
    output = np.asarray(output)
    target = np.asarray(target)
    maxk = max(topk)
    pred = np.argsort(-output, axis=1)[:, :maxk]
    correct = pred == target[:, None]
    return [100.0 * correct[:, :k].any(axis=1).mean() for k in topk]
