"""Version metadata.

TPU-native re-implementation of the capability surface of `pretorched-x`
(reference: /root/reference/pretorched/__version__.py).
"""

__title__ = 'pretorched_tpu'
__description__ = 'TPU-native (JAX/Flax/Pallas) pretrained model zoo for image and video.'
__url__ = 'https://github.com/distsys-graft/pretorched-tpu'
__version__ = '0.1.0'
__author__ = 'pretorched-tpu authors'
__license__ = 'MIT'
