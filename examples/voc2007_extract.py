#!/usr/bin/env python
"""VOC2007 feature extraction + linear SVM transfer.

TPU-native equivalent of the reference's examples/voc2007_extract.py: drop
the model's head with the ``last_linear = Identity()`` trick (:147), extract
features for train/val/test, cache them, then fit per-class sklearn SVMs and
report AP/mAP (:59-114).

Usage:
    python examples/voc2007_extract.py --dir_datasets /tmp/voc -a alexnet
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np  # noqa: E402


def parse_args():
    p = argparse.ArgumentParser(description='VOC2007 feature extraction + SVM')
    p.add_argument('--dir_outputs', default='/tmp/outputs')
    p.add_argument('--dir_datasets', default='/tmp/datasets')
    p.add_argument('--C', default=1.0, type=float)
    p.add_argument('--batch_size', '-b', default=64, type=int)
    p.add_argument('--arch', '-a', default='alexnet')
    p.add_argument('--train_split', default='train')
    p.add_argument('--test_split', default='val')
    p.add_argument('--pretrained', default='imagenet')
    p.add_argument('--cpu', action='store_true')
    return p.parse_args()


def extract_features_targets(model, path_file, loader, split):
    """Cached feature extraction (reference: voc2007_extract.py:27-57)."""
    if os.path.isfile(path_file):
        print(f'Load features from {path_file}')
        data = np.load(path_file)
        return data['features'], data['targets']
    print(f'Extract features on {split} set')
    feats, targets = [], []
    for i, (imgs, _names, tgts) in enumerate(loader):
        out = np.asarray(model(np.stack(imgs)))
        feats.append(out.reshape(out.shape[0], -1))
        targets.append(np.stack(tgts))
        if i % 10 == 0:
            print(f'  batch {i}')
    features = np.concatenate(feats)
    targets = np.concatenate(targets)
    os.makedirs(os.path.dirname(path_file), exist_ok=True)
    np.savez(path_file, features=features, targets=targets)
    print(f'Save features to {path_file}')
    return features, targets


def train_multilabel(features, targets, classes, train_split, test_split, C=1.0):
    """Per-class LinearSVC + AP (reference: voc2007_extract.py:59-114)."""
    from sklearn.svm import LinearSVC

    from pretorched_tpu.datasets.utils import AveragePrecisionMeter

    aps = []
    for ic, c in enumerate(classes):
        # reference protocol (ignore_hard_examples=True, voc2007_extract.py
        # :67-74): rows whose target for THIS class is difficult (0) are
        # excluded from both the SVM fit and the AP; positives are == 1
        tr_mask = targets[train_split][:, ic] != 0
        te_mask = targets[test_split][:, ic] != 0
        train_t = (targets[train_split][tr_mask, ic] == 1).astype(int)
        test_t = (targets[test_split][te_mask, ic] == 1).astype(int)
        clf = LinearSVC(C=C)
        clf.fit(features[train_split][tr_mask], train_t)
        scores = clf.decision_function(features[test_split][te_mask])
        ap = AveragePrecisionMeter.average_precision(
            scores, test_t, difficult_examples=False)
        aps.append(ap)
        print(f'{c}: AP {100*ap:.2f}')
    print(f'mAP: {100*np.mean(aps):.2f}')
    return np.mean(aps)


def main():
    args = parse_args()
    if args.cpu:
        os.environ['JAX_PLATFORMS'] = 'cpu'
        import jax
        jax.config.update('jax_platforms', 'cpu')

    import pretorched_tpu as pretorched
    from pretorched_tpu.datasets.voc import Voc2007Classification
    from pretorched_tpu.transforms import TransformImage
    from pretorched_tpu.utils import chunks

    pretrained = None if args.pretrained in ('none', '') else args.pretrained
    model = pretorched.__dict__[args.arch](num_classes=1000,
                                           pretrained=pretrained)
    model.eval()
    model.last_linear = pretorched.Identity()   # feature extraction trick

    settings = (model.settings if model.settings is not None else
                pretorched.pretrained_settings[args.arch]['imagenet'])
    tf_img = TransformImage(settings)

    features, targets = {}, {}
    dir_root = os.path.join(args.dir_datasets, 'VOC2007')
    dir_feats = os.path.join(args.dir_outputs, 'data', f'voc2007_{args.arch}')
    for split in (args.train_split, args.test_split):
        ds = Voc2007Classification(dir_root, split, transform=tf_img)

        def loader(ds=ds):
            idxs = range(len(ds))
            for batch in chunks(list(idxs), args.batch_size):
                items = [ds[i] for i in batch]
                yield ([x for x, _, _ in items], [n for _, n, _ in items],
                       [t for _, _, t in items])

        features[split], targets[split] = extract_features_targets(
            model, os.path.join(dir_feats, f'{split}.npz'), loader(), split)

    train_multilabel(features, targets, ds.classes, args.train_split,
                     args.test_split, C=args.C)


if __name__ == '__main__':
    main()
