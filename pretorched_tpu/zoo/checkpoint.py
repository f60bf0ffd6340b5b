"""Training checkpoint save/resume (SURVEY §5.4 item 2).

Reference mechanism: ``torch.save({'epoch', 'arch', 'state_dict',
'best_prec1'})`` + ``model_best`` copy + ``--resume``
(examples/imagenet_eval.py:78-88, 256-259). TPU-native equivalent built on
Orbax (async-capable, multi-host-safe) with a msgpack fallback; restores are
idempotent and sharded arrays round-trip with their shardings.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional


def save_checkpoint(path: str, state: Dict[str, Any],
                    is_best: bool = False, best_name: str = 'model_best') -> None:
    """state: arbitrary pytree dict (params/batch_stats/opt_state/...) plus
    scalar metadata under 'meta'."""
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.abspath(path), state, force=True)
    except Exception:
        from flax import serialization

        # Write the msgpack fallback durably FIRST (temp file + atomic
        # rename), and only then remove any partial/stale Orbax directory
        # (which load_checkpoint would prefer over the msgpack). Ordering
        # matters: if the fallback write itself fails or is interrupted, the
        # last good checkpoint — whichever format — is still on disk.
        fname = path if path.endswith('.msgpack') else path + '.msgpack'
        tmp = fname + '.tmp'
        with open(tmp, 'wb') as f:
            f.write(serialization.to_bytes(state))
        os.replace(tmp, fname)
        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
    if is_best:
        dst = os.path.join(os.path.dirname(os.path.abspath(path)) or '.',
                           best_name)
        if os.path.isdir(path):
            if os.path.exists(dst):
                shutil.rmtree(dst)
            shutil.copytree(path, dst)
        else:
            src = path if os.path.exists(path) else path + '.msgpack'
            shutil.copyfile(src, dst + '.msgpack')


def load_checkpoint(path: str, template: Optional[Dict[str, Any]] = None
                    ) -> Dict[str, Any]:
    """Restore a checkpoint; ``template`` (a matching pytree of arrays)
    enables exact dtype/shape restoration."""
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        try:
            if template is not None:
                return ckptr.restore(os.path.abspath(path), item=template)
            return ckptr.restore(os.path.abspath(path))
        except Exception:
            # a partial/corrupt Orbax dir (e.g. disk-full during save) must
            # not shadow an older good msgpack sitting next to it
            if not os.path.exists(path + '.msgpack'):
                raise
    from flax import serialization

    fname = path if os.path.exists(path) and not os.path.isdir(path) \
        else path + '.msgpack'
    with open(fname, 'rb') as f:
        data = f.read()
    if template is not None:
        return serialization.from_bytes(template, data)
    return serialization.msgpack_restore(data)
