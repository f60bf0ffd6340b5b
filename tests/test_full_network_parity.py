"""FULL-NETWORK conversion parity for the NAS-family architectures
(VERDICT r1 #2): a random full-size torch twin state_dict (tests/torch_twins)
is pushed through zoo.convert and logits must match. Primitive-level parity
(test_nasnet_parity etc.) can't catch cell-wiring bugs; these can.

The heavyweights (NASNet-Large / PNASNet / PolyNet at 331px) are slow-gated
behind PRETORCHED_TEST_SLOW; run once per round and record the result.
"""

import os

import numpy as np
import pytest
import torch

import jax

from pretorched_tpu.zoo import convert

import torch_twins as twins

SLOW = pytest.mark.skipif(not os.environ.get('PRETORCHED_TEST_SLOW'),
                          reason='slow: full-size 331px networks')


def _full_parity(tm, module, size, renames=None, rtol=2e-3, atol=2e-3,
                 batch=1):
    tm = tm.eval()
    twins.randomize_bn(tm)
    variables = dict(module.init(jax.random.key(0),
                                 np.zeros((1, size, size, 3), np.float32)))
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables = convert.convert_state_dict(sd, variables, renames=renames)
    x = np.random.RandomState(0).randn(batch, 3, size, size).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(module.apply(variables, np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(got, ref, rtol=rtol, atol=atol)


def test_xception_full_network_parity():
    """reference xception.py:115-213."""
    from pretorched_tpu.models.xception import Xception
    _full_parity(twins.XceptionTwin(num_classes=12), Xception(num_classes=12),
                 size=128, renames={'last_linear': 'fc'})


def test_inceptionresnetv2_full_network_parity():
    """reference inceptionresnetv2.py:234-331 (299px: head pool is a fixed
    8x8 window)."""
    from pretorched_tpu.models.inceptionresnetv2 import InceptionResNetV2
    _full_parity(twins.InceptionResNetV2Twin(num_classes=12),
                 InceptionResNetV2(num_classes=12), size=299)


def test_nasnetamobile_full_network_parity():
    """reference nasnet_mobile.py:520-616 (224px: head pool is 7x7)."""
    from pretorched_tpu.models.nasnet import NASNetA
    tm = twins.NASNetATwin(num_classes=12, stem_filters=32,
                           penultimate_filters=1056, n=4, specific=True,
                           head_pool=7)
    module = NASNetA(num_classes=12, stem_filters=32,
                     penultimate_filters=1056, num_normal_cells=4,
                     specific_stem1=True, head_pool=7)
    _full_parity(tm, module, size=224)


@SLOW
def test_nasnetalarge_full_network_parity():
    """reference nasnet.py:492-605 (331px, 11x11 head pool)."""
    from pretorched_tpu.models.nasnet import NASNetA
    tm = twins.NASNetATwin(num_classes=12, stem_filters=96,
                           penultimate_filters=4032, n=6, specific=False,
                           head_pool=11)
    module = NASNetA(num_classes=12, stem_filters=96,
                     penultimate_filters=4032, num_normal_cells=6,
                     specific_stem1=False, head_pool=11)
    _full_parity(tm, module, size=331)


@SLOW
def test_pnasnet5large_full_network_parity():
    """reference pnasnet.py:291-370 (331px)."""
    from pretorched_tpu.models.pnasnet import PNASNet5Large
    _full_parity(twins.PNASNet5LargeTwin(num_classes=12),
                 PNASNet5Large(num_classes=12), size=331)


@SLOW
def test_polynet_full_network_parity():
    """reference polynet.py:382-458 (331px, 9x9 head pool)."""
    from pretorched_tpu.models.polynet import PolyNet
    _full_parity(twins.PolyNetTwin(num_classes=12), PolyNet(num_classes=12),
                 size=331)


# -------------------------------------------------------------------------
# SlowFast: full two-pathway nets incl. lateral-concat bookkeeping
# (VERDICT r1 #3; reference slowfast.py:102-396)
# -------------------------------------------------------------------------

def _slowfast_parity(block, layers, mode, renames=None):
    from pretorched_tpu.models.slowfast import SlowFast
    tm = twins.SlowFastTwin(block=block, layers=layers, num_classes=12,
                            mode=mode).eval()
    twins.randomize_bn(tm)
    module = SlowFast(block=block, layers=layers, num_classes=12, mode=mode)
    x4 = np.zeros((1, 32, 48, 48, 3), np.float32)
    variables = dict(module.init(jax.random.key(0), x4))
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables = convert.convert_state_dict(sd, variables, renames=renames)
    x = np.random.RandomState(0).randn(2, 3, 32, 48, 48).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(module.apply(variables,
                                  np.transpose(x, (0, 2, 3, 4, 1))))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_slowfast_full_network_parity_bottleneck():
    _slowfast_parity('bottleneck', (1, 1, 1, 1), 'sf')


def test_slowfast_full_network_parity_basic():
    """resnet18 config: basic blocks, res3 stride 1 (slowfast.py:126-128)."""
    _slowfast_parity('basic', (2, 2, 2, 2), 'sf')


def test_slowonly_full_network_parity():
    _slowfast_parity('bottleneck', (1, 1, 1, 1), 's',
                     renames={'^slow\\.': ''})


def test_fastonly_full_network_parity():
    _slowfast_parity('bottleneck', (1, 1, 1, 1), 'f',
                     renames={'^fast\\.': ''})


# -------------------------------------------------------------------------
# TRN: full network over a per-frame resnet18 backbone
# (VERDICT r1 #3; reference trn.py:192-343)
# -------------------------------------------------------------------------

def _trn_parity(consensus, num_segments):
    from test_resnet import _torch_resnet18

    import pretorched_tpu as p

    model = p.trn(num_classes=12, num_segments=num_segments,
                  consensus=consensus, arch='resnet18', pretrained=None)
    base = _torch_resnet18()
    base.fc = torch.nn.Dropout(0.5)      # reference replaces the classifier
    tm = twins.TRNTwin(base, 512, 12, num_segments, consensus=consensus,
                       video_dim=64, bottleneck=32).eval()
    twins.randomize_bn(tm)
    # rebuild the flax module with the smaller head dims used in the twin
    from pretorched_tpu.models.trn import TRN
    from pretorched_tpu.core.factory import init_variables
    module = TRN(base_module=model.module.base_module, frame_feature_dim=512,
                 num_classes=12, num_segments=num_segments,
                 consensus=consensus, video_feature_dim=64,
                 frame_bottleneck_dim=32)
    variables = init_variables(module, (1, num_segments, 64, 64, 3))
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables = convert.convert_state_dict(
        sd, variables, renames={'^base_module\\.': 'base_model.'})
    x = np.random.RandomState(0).randn(2, num_segments, 3, 64, 64)
    x = x.astype(np.float32)
    np.random.seed(0)   # twin MSTRN sampling (full coverage -> order-free)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(module.apply(variables,
                                  np.transpose(x, (0, 1, 3, 4, 2))))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_trn_full_network_parity_mstrn():
    """MSTRN with 3 segments: num_relations covers every combination, so the
    reference's random subsampling (trn.py:100-110) is deterministic."""
    _trn_parity('MSTRN', 3)


def test_trn_full_network_parity_relation():
    _trn_parity('TRN', 8)


# -------------------------------------------------------------------------
# DPN: full dual-path networks incl. the channel-split bookkeeping and the
# test-time avgmax pooling head (reference dpn.py:248-389)
# -------------------------------------------------------------------------

@pytest.mark.parametrize('name', ['dpn68', 'dpn68b'])
def test_dpn_full_network_parity(name):
    from pretorched_tpu.models.dpn import _CONFIGS, DPN
    cfg = _CONFIGS[name]
    tm = twins.DPNTwin(num_classes=12, test_time_pool=True, **cfg).eval()
    twins.randomize_bn(tm)
    module = DPN(num_classes=12, test_time_pool=True, **cfg)
    variables = dict(module.init(jax.random.key(0),
                                 np.zeros((1, 224, 224, 3), np.float32)))
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables = convert.convert_state_dict(sd, variables)
    x = np.random.RandomState(0).randn(2, 3, 224, 224).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(module.apply(variables, np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


# -------------------------------------------------------------------------
# SENet: full networks for all three bottleneck variants
# (reference senet.py:134-366)
# -------------------------------------------------------------------------

def _senet_parity(kind, layers, groups, **kw):
    from pretorched_tpu.models.senet import SENet
    tm = twins.SENetTwin(kind, layers, groups, num_classes=12, **kw).eval()
    module = SENet(block=kind, layers=layers, groups=groups, num_classes=12,
                   **kw)
    _full_parity(tm, module, size=224)


def test_senet154_style_full_network_parity():
    """senet154 config at reduced depth (3-conv stem, grouped 2x-wide
    bottlenecks, 3x3 downsample convs)."""
    _senet_parity('se', (1, 1, 1, 1), 64)


def test_se_resnext_full_network_parity():
    _senet_parity('se_resnext', (1, 1, 1, 1), 32, inplanes=64,
                  input_3x3=False, downsample_kernel_size=1,
                  downsample_padding=0)


def test_se_resnet_full_network_parity():
    _senet_parity('se_resnet', (1, 1, 1, 1), 1, inplanes=64, input_3x3=False,
                  downsample_kernel_size=1, downsample_padding=0)


@SLOW
def test_se_resnext50_full_depth_parity():
    _senet_parity('se_resnext', (3, 4, 6, 3), 32, inplanes=64,
                  input_3x3=False, downsample_kernel_size=1,
                  downsample_padding=0)


def test_bninception_full_network_parity():
    """Full 10-block BN-Inception (reference bninception.py:27-511): Caffe
    biased convs, ceil-mode pools everywhere, reduction blocks without
    1x1/proj branches, 5b's max branch pool, BGR-era key layout."""
    from pretorched_tpu.models.bninception import _BLOCKS, BNInception
    tm = twins.BNInceptionTwin(_BLOCKS, num_classes=12)
    _full_parity(tm, BNInception(num_classes=12), size=224)


def test_inceptionv4_full_network_parity():
    """Full Inception-v4 (reference inceptionv4.py:263-311): stem mix blocks,
    4xA + ReductionA + 7xB + ReductionB + 3xC, TF 'features.N' layout."""
    from pretorched_tpu.models.inceptionv4 import InceptionV4
    _full_parity(twins.InceptionV4Twin(num_classes=12),
                 InceptionV4(num_classes=12), size=299)


def test_mobilenetv2_full_network_parity():
    """Full MobileNetV2 (reference mobilenet.py:79-141): all 17 inverted
    residuals with the slot-indexed Sequential key layout."""
    from pretorched_tpu.models.mobilenet import MobileNetV2
    _full_parity(twins.MobileNetV2Twin(num_classes=12),
                 MobileNetV2(num_classes=12), size=160)


def test_vggm_full_network_parity():
    """Full VGG-M (reference vggm.py:67-102): cross-map LRN, ceil pools,
    torch-order flatten into the 18432-wide classifier."""
    from pretorched_tpu.models.vggm import VGGM
    _full_parity(twins.VGGMTwin(num_classes=12), VGGM(num_classes=12),
                 size=221, renames={'last_linear': 'classif.6'})


# -------------------------------------------------------------------------
# Video ResNet3D family: full networks at reduced depth
# (reference resnet3D.py / resnext3D.py / wideresnet3D.py /
#  pre_act_resnet3D.py / r2plus1d.py)
# -------------------------------------------------------------------------

def _video_parity(tm, module, frames=8, size=32, renames=None):
    tm = tm.eval()
    twins.randomize_bn(tm)
    variables = dict(module.init(jax.random.key(0),
                                 np.zeros((1, frames, size, size, 3),
                                          np.float32)))
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    renames = dict(renames or {}, last_linear='fc')
    variables = convert.convert_state_dict(sd, variables, renames=renames)
    x = np.random.RandomState(0).randn(2, 3, frames, size, size)
    x = x.astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(module.apply(variables,
                                  np.transpose(x, (0, 2, 3, 4, 1))))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_resnet3d_full_network_parity_shortcut_a():
    """resnet3d10 config with the parameter-free zero-pad shortcut
    (resnet3D.py:65-74)."""
    from pretorched_tpu.models.resnet3d import VideoResNet
    tm = twins.VideoResNet3DTwin('basic', (1, 1, 1, 1), 12, shortcut='A')
    _video_parity(tm, VideoResNet(block='basic', layers=(1, 1, 1, 1),
                                  num_classes=12, shortcut_type='A',
                                  expansion=1))


def test_resnet3d_full_network_parity_bottleneck():
    from pretorched_tpu.models.resnet3d import VideoResNet
    tm = twins.VideoResNet3DTwin('bottleneck', (1, 1, 1, 1), 12,
                                 expansion=4)
    _video_parity(tm, VideoResNet(block='bottleneck', layers=(1, 1, 1, 1),
                                  num_classes=12, expansion=4))


def test_resnext3d_full_network_parity():
    """cardinality-32 grouped bottlenecks, expansion 2, wide stages
    (resnext3D.py:76-121)."""
    from pretorched_tpu.models.resnet3d import VideoResNet
    tm = twins.VideoResNet3DTwin('bottleneck', (1, 1, 1, 1), 12, expansion=2,
                                 widths=(128, 256, 512, 1024), cardinality=32)
    _video_parity(tm, VideoResNet(
        block='bottleneck', layers=(1, 1, 1, 1), num_classes=12, expansion=2,
        width_per_stage=(128, 256, 512, 1024), cardinality=32))


def test_wideresnet3d_full_network_parity():
    from pretorched_tpu.models.resnet3d import VideoResNet
    tm = twins.VideoResNet3DTwin('bottleneck', (1, 1, 1, 1), 12, expansion=2,
                                 widths=(128, 256, 512, 1024))
    _video_parity(tm, VideoResNet(
        block='bottleneck', layers=(1, 1, 1, 1), num_classes=12, expansion=2,
        width_per_stage=(128, 256, 512, 1024)))


@pytest.mark.parametrize('kind,exp', [('basic', 1), ('bottleneck', 4)])
def test_preact_resnet3d_full_network_parity(kind, exp):
    """BN->ReLU->conv ordering, no post-add ReLU (pre_act_resnet3D.py)."""
    from pretorched_tpu.models.resnet3d import VideoResNet
    tm = twins.VideoResNet3DTwin(kind, (1, 1, 1, 1), 12, expansion=exp,
                                 preact=True)
    _video_parity(tm, VideoResNet(block=kind, layers=(1, 1, 1, 1),
                                  num_classes=12, expansion=exp, preact=True))


@pytest.mark.parametrize('kind,exp', [('basic', 1), ('bottleneck', 4)])
def test_r2plus1d_full_network_parity(kind, exp):
    """Factored stem/bottleneck/downsample convs; basic blocks stay plain
    3x3x3 like the reference (r2plus1d.py:93-95)."""
    from pretorched_tpu.models.resnet3d import VideoResNet
    tm = twins.VideoResNet3DTwin(kind, (1, 1, 1, 1), 12, expansion=exp,
                                 factored=True)
    _video_parity(tm, VideoResNet(block=kind, layers=(1, 1, 1, 1),
                                  num_classes=12, expansion=exp,
                                  factored=True))


def test_multiview_conv_op_parity():
    """MultiViewConv op vs the reference formula (multiview.py:13-59),
    bias=True: the bias feeds each of the three view convs BEFORE the
    Linear(3,1) mixer, so it is scaled by sum(linear.weight)."""
    from pretorched_tpu.models.multiview import MultiViewConv
    tm = twins.MultiViewConvTwin(4, 6, 3, stride=(1, 2, 2), padding=1,
                                 bias=True).eval()
    mod = MultiViewConv(features=6, kernel_size=3, stride=(1, 2, 2),
                        padding=1, bias=True)
    variables = dict(mod.init(jax.random.key(0),
                              np.zeros((1, 4, 8, 8, 4), np.float32)))
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables = convert.convert_state_dict(sd, variables)
    x = np.random.RandomState(0).randn(2, 4, 6, 8, 8).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(mod.apply(variables, np.transpose(x, (0, 2, 3, 4, 1))))
    np.testing.assert_allclose(np.transpose(got, (0, 4, 1, 2, 3)), ref,
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize('kind,exp', [('basic', 1), ('bottleneck', 4)])
def test_mvresnet_full_network_parity(kind, exp):
    """MVResNet: every conv (stem, blocks, downsamples) is a MultiViewConv
    (multiview.py:73-93)."""
    from pretorched_tpu.models.multiview import MVResNet
    tm = twins.VideoResNet3DTwin(kind, (1, 1, 1, 1), 12, expansion=exp,
                                 factored='mv')
    _video_parity(tm, MVResNet(block=kind, layers=(1, 1, 1, 1),
                               num_classes=12, expansion=exp))


def test_densenet3d_full_network_parity():
    """Reduced DenseNet3D (reference densenet3D.py:131-214; the norm5 bug is
    fixed identically on both sides): dotted dense-layer keys, 3D
    transitions, duration/size-derived head pool."""
    from pretorched_tpu.models.densenet3d import DenseNet3D
    # 4 blocks/3 transitions so the size-derived head pool (/32 spatial,
    # /16 temporal) collapses the features to 1x1x1 like the reference
    tm = twins.DenseNet3DTwin(growth=16, blocks=(1, 1, 1, 1), init=32,
                              num_classes=12, sample_size=32,
                              sample_duration=16)
    module = DenseNet3D(growth_rate=16, block_config=(1, 1, 1, 1),
                        num_init_features=32, num_classes=12,
                        sample_size=32, sample_duration=16)
    import re

    def dotted(k):   # twin norm1/conv1 -> checkpoint 'norm.1'/'conv.1'
        return re.sub(r'(denselayer\d+)\.(norm|conv)(\d)\.',
                      r'\1.\2.\3.', k)

    tm = tm.eval()
    twins.randomize_bn(tm)
    variables = dict(module.init(jax.random.key(0),
                                 np.zeros((1, 16, 32, 32, 3), np.float32)))
    sd = {dotted(k): v.numpy() for k, v in tm.state_dict().items()}
    variables = convert.convert_state_dict(
        sd, variables, renames={'last_linear': 'classifier'})
    x = np.random.RandomState(0).randn(2, 3, 16, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(module.apply(variables,
                                  np.transpose(x, (0, 2, 3, 4, 1))))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


# -------------------------------------------------------------------------
# FBResNet / CaffeResNet: full networks for the Torch7/Caffe-port deltas
# (conv biases fbresnet.py:22-23,63-69; stride-on-conv1 + ceil stem pool
# cafferesnet.py:66-69,109; avg7 heads) — VERDICT r2 #3
# -------------------------------------------------------------------------

def test_fbresnet18_full_network_parity():
    from pretorched_tpu.models.resnet import ResNet
    tm = twins.ResNet2DTwin(block='basic', layers=(2, 2, 2, 2),
                            num_classes=12, conv_bias=True, avg7=True)
    module = ResNet(block='basic', layers=(2, 2, 2, 2), num_classes=12,
                    conv_bias=True, logits_pool='avg7')
    _full_parity(tm, module, size=224, renames={'last_linear': 'fc'})


@SLOW
def test_fbresnet152_full_network_parity():
    from pretorched_tpu.models.resnet import ResNet
    tm = twins.ResNet2DTwin(block='bottleneck', layers=(3, 8, 36, 3),
                            num_classes=12, conv_bias=True, avg7=True)
    module = ResNet(block='bottleneck', layers=(3, 8, 36, 3), num_classes=12,
                    conv_bias=True, logits_pool='avg7')
    _full_parity(tm, module, size=224, renames={'last_linear': 'fc'})


@SLOW
def test_cafferesnet101_full_network_parity():
    from pretorched_tpu.models.resnet import ResNet
    tm = twins.ResNet2DTwin(block='bottleneck', layers=(3, 4, 23, 3),
                            num_classes=12, stride_on='conv1',
                            stem_pool='ceil', avg7=True)
    module = ResNet(block='bottleneck', layers=(3, 4, 23, 3), num_classes=12,
                    stride_on='conv1', stem_pool='ceil', logits_pool='avg7')
    _full_parity(tm, module, size=224, renames={'last_linear': 'fc'})


@SLOW
@pytest.mark.parametrize('name', ['dpn92', 'dpn98', 'dpn107', 'dpn131'])
def test_dpn_large_full_network_parity(name):
    """All four large-DPN configs incl. the imagenet+5k-sized ones
    (reference dpn.py:98-206, 312-389) — VERDICT r2 #3 + the r2 weak-item
    remainder (dpn98/dpn107 wiring was untested)."""
    from pretorched_tpu.models.dpn import _CONFIGS, DPN
    cfg = _CONFIGS[name]
    tm = twins.DPNTwin(num_classes=12, test_time_pool=True, **cfg).eval()
    twins.randomize_bn(tm)
    module = DPN(num_classes=12, test_time_pool=True, **cfg)
    variables = dict(module.init(jax.random.key(0),
                                 np.zeros((1, 224, 224, 3), np.float32)))
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables = convert.convert_state_dict(sd, variables)
    x = np.random.RandomState(0).randn(1, 3, 224, 224).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(module.apply(variables, np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


# -------------------------------------------------------------------------
# SoundNet: full conv-stack numerical parity incl. the window-averaged
# logits head, and BranchedSoundNet's dual heads (reference soundnet.py:7-77;
# the twins use real bn1..bn7 layers, not the reference's in-forward BN bug)
# — VERDICT r2 #3/#4
# -------------------------------------------------------------------------

def _sound_parity(tm, module, length, heads=1):
    tm = tm.eval()
    twins.randomize_bn(tm)
    variables = dict(module.init(jax.random.key(0),
                                 np.zeros((1, length, 1), np.float32)))
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables = convert.convert_state_dict(sd, variables)
    x = np.random.RandomState(0).randn(1, 1, length).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x))
    got = module.apply(variables, np.transpose(x, (0, 2, 1)))
    if heads == 1:
        np.testing.assert_allclose(np.asarray(got), ref.numpy(),
                                   rtol=2e-3, atol=2e-3)
    else:
        for g, r in zip(got, ref):
            np.testing.assert_allclose(np.asarray(g), r.numpy(),
                                       rtol=2e-3, atol=2e-3)


def test_soundnet_full_network_parity():
    from pretorched_tpu.models.soundnet import SoundNet
    # 67724 samples -> 262 conv8 steps -> exactly one 262000-dim window;
    # 2x that length exercises the multi-window averaging path
    _sound_parity(twins.SoundNetTwin(num_classes=14),
                  SoundNet(num_classes=14), 67724)


def test_soundnet_multiwindow_parity():
    """Multi-window averaging (split[:-1] + right-aligned last window,
    soundnet.py:73-77) at a reduced feature_dim so the CPU run stays cheap."""
    from pretorched_tpu.models.soundnet import SoundNet
    _sound_parity(twins.SoundNetTwin(num_classes=14, feature_dim=32000),
                  SoundNet(num_classes=14, feature_dim=32000), 22000)


def test_branched_soundnet_full_network_parity():
    from pretorched_tpu.models.soundnet import BranchedSoundNet
    _sound_parity(twins.BranchedSoundNetTwin(), BranchedSoundNet(),
                  67724, heads=2)
