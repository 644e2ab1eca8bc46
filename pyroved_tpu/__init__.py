"""pyroved_tpu: TPU-native variational encoder-decoder framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
ziatdinovmax/pyroVED: invariant VAEs (rotation/translation/scale),
joint discrete-continuous VAEs, semi-supervised classification and
regression VAEs, and im2spec/spec2im encoder-decoder models — designed
for TPU from the ground up (jit-compiled epoch loops, MXU-shaped matmuls,
fused Pallas decoder kernels, mesh-sharded data parallelism).
"""
from . import config, infer, interop, models, nets, ops, parallel, serving, trainers, utils
from .__version__ import __version__

__all__ = ["config", "infer", "interop", "models", "nets", "ops", "parallel",
           "serving", "trainers", "utils", "__version__"]
