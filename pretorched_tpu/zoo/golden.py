"""Golden-accuracy workflow: local weights dir -> converted zoo -> accuracy
table vs BASELINE.md.

The reference's entire value proposition is hosted weights reproducing a
published accuracy table (reference README.md:203-282, load path
torchvision_models.py:158-167). This module makes checking that table one
command the day weights are locally available:

    python tools/convert_weights.py --eval /path/to/imagenet/val

For every model with a local checkpoint it converts (via zoo.io's
convert-once cache), evaluates on the val folder with the model's own
metadata-derived transform (center crop, reference imagenet_eval.py:112),
and prints measured vs published Acc@1/Acc@5 with a PASS/FAIL at the
north-star |delta| <= 0.1 threshold. The plumbing (fabricated .pth ->
convert -> evaluate -> table) is CI-proven by
tests/test_golden_workflow.py with a synthetic checkpoint, so no step
depends on network egress.
"""

from __future__ import annotations

import math
import re
from pathlib import Path
from typing import Dict, Optional, Tuple

# Table display name -> registry name, where pure normalization (lowercase,
# strip non-alphanumerics) is not enough.  DualPathNet rows carry the
# reference's "_5k" pretrain marker (imagenet+5k heads, dpn.py:98-206).
_SPECIAL = {
    'dualpathnet68': 'dpn68', 'dualpathnet68b5k': 'dpn68b',
    'dualpathnet925k': 'dpn92', 'dualpathnet98': 'dpn98',
    'dualpathnet1075k': 'dpn107', 'dualpathnet131': 'dpn131',
    'nasnetalarge': 'nasnetalarge', 'nasnetamobile': 'nasnetamobile',
    'pnasnet5large': 'pnasnet5large',
}


def _norm(display: str) -> str:
    return re.sub(r'[^a-z0-9]', '', display.lower())


_REGISTRY_BY_NORM: Optional[Dict[str, str]] = None


def _registry_by_norm() -> Dict[str, str]:
    """{normalized name: registry spelling} for every registered model."""
    global _REGISTRY_BY_NORM
    if _REGISTRY_BY_NORM is None:
        from ..core.registry import model_names
        _REGISTRY_BY_NORM = {_norm(n): n for n in model_names}
    return _REGISTRY_BY_NORM


def display_to_registry(display: str) -> Optional[str]:
    """Map a BASELINE.md display name to a registry model name (registry
    spelling, e.g. 'SE-ResNeXt50_32x4d' -> 'se_resnext50_32x4d')."""
    n = _norm(display)
    n = _SPECIAL.get(n, n)
    return _registry_by_norm().get(n, n or None)


def parse_baseline(path: Optional[str] = None) -> Dict[str, Tuple[float, float]]:
    """{registry_name: (top1, top5)} from BASELINE.md's markdown table.

    Rows are keyed by normalized registry name; the reference's own measured
    numbers ("Our porting") win over upstream-quoted rows for the same model.
    """
    if path is None:
        path = Path(__file__).resolve().parents[2] / 'BASELINE.md'
    table: Dict[str, Tuple[float, float]] = {}
    ours: Dict[str, bool] = {}
    for line in Path(path).read_text().splitlines():
        cells = [c.strip() for c in line.strip().strip('|').split('|')]
        if len(cells) < 4 or cells[0] in ('Model', ':---', '---'):
            continue
        try:
            top1, top5 = float(cells[2]), float(cells[3])
        except ValueError:
            continue
        name = display_to_registry(cells[0])
        if name is None:
            continue
        is_ours = 'our porting' in cells[1].lower()
        if name not in table or (is_ours and not ours.get(name)):
            table[name] = (top1, top5)
            ours[name] = is_ours
    return table


def evaluate_imagenet(model, valdir: str, batch_size: int = 64,
                      limit: Optional[int] = None,
                      scale: Optional[float] = None,
                      preserve_aspect_ratio: bool = True,
                      num_workers: int = 0) -> Tuple[float, float, int]:
    """Center-crop top-1/top-5 (%) of ``model`` over an ImageFolder val dir.

    Uses the model's own metadata-derived PIL transform (the numerics
    oracle) and the jitted masked-metrics eval step; ``limit`` bounds the
    number of images for subset runs."""
    import jax.numpy as jnp

    from ..core.wrapper import to_channels_last
    from ..datasets.folder import ImageFolder, batch_iterator
    from ..parallel.evaluate import sharded_accuracy_step
    from ..transforms import TransformImage

    tf = TransformImage(model.settings or model, scale=scale,
                        preserve_aspect_ratio=preserve_aspect_ratio)
    ds = ImageFolder(valdir, transform=tf)
    if limit is not None and limit < len(ds):
        ds.samples = ds.samples[:limit]
    step = sharded_accuracy_step(model.module)
    tot = {'top1': 0, 'top5': 0, 'count': 0}
    for images, labels in batch_iterator(ds, batch_size, shuffle=False,
                                         num_workers=num_workers):
        x = to_channels_last(jnp.asarray(images))
        m = step(model.variables, x, jnp.asarray(labels))
        for k in tot:
            tot[k] += int(m[k])
    n = max(tot['count'], 1)
    return 100.0 * tot['top1'] / n, 100.0 * tot['top5'] / n, tot['count']


def accuracy_row(name: str, tag: str, top1: float, top5: float, count: int,
                 baseline: Dict[str, Tuple[float, float]],
                 tol: float = 0.1) -> str:
    """One formatted table line: measured vs published, PASS/FAIL at tol."""
    ref = baseline.get(name)
    if ref is None:
        return (f'{name}/{tag}: Acc@1 {top1:.3f} Acc@5 {top5:.3f} '
                f'(n={count}) [no published baseline]')
    d1, d5 = top1 - ref[0], top5 - ref[1]
    ok = abs(d1) <= tol and abs(d5) <= tol
    return (f'{name}/{tag}: Acc@1 {top1:.3f} (ref {ref[0]:.3f}, '
            f'{d1:+.3f}) Acc@5 {top5:.3f} (ref {ref[1]:.3f}, {d5:+.3f}) '
            f'(n={count}) {"PASS" if ok else "FAIL"}')
