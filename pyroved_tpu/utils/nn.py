"""NN helpers: activation registry, one-hot encoding, weight averaging.

TPU-native counterpart of the reference's ``pyroved/utils/nn.py``. The
registry returns jnp-callables instead of ``torch.nn`` module classes; weight
averaging operates on parameter pytrees instead of state dicts; seeding is a
threaded ``jax.random.PRNGKey`` rather than the reference's global
``torch.manual_seed`` (``utils/nn.py:87-100``).
"""
from typing import Callable, Dict, Iterable, Union

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_ACTIVATIONS: Dict[str, Callable[[Array], Array]] = {
    "relu": jax.nn.relu,
    "lrelu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.01),
    "tanh": jnp.tanh,
    "softplus": jax.nn.softplus,
    # exact (erf) flavor: torch nn.GELU's default, which is what the
    # reference registry wires in (reference utils/nn.py:123). jax.nn.gelu
    # defaults to the tanh approximation (~1e-3 off torch) — override it.
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
}


def get_activation(activation: Union[str, None]) -> Union[Callable[[Array], Array], None]:
    """Activation registry (reference: ``utils/nn.py:116-124``):
    relu / lrelu / tanh / softplus / gelu."""
    if activation is None:
        return None
    return _ACTIVATIONS[activation]


def to_onehot(idx, n: int) -> Array:
    """One-hot encode integer labels with range validation
    (reference: ``utils/nn.py:37-48``). Validation runs host-side on
    concrete inputs only (a traced ``idx`` skips it — ``jax.nn.one_hot``
    zero-fills out-of-range entries instead), avoiding a device sync and
    keeping the function jittable."""
    if not isinstance(idx, jax.core.Tracer):
        host = np.asarray(jax.device_get(jnp.asarray(idx)))
        if host.size and (int(host.max()) >= n or int(host.min()) < 0):
            raise AssertionError(
                "Labelling must start from 0 and "
                "maximum label value must be less than total number of classes")
    idx = jnp.asarray(idx).reshape(-1)
    if not jnp.issubdtype(idx.dtype, jnp.integer):
        idx = idx.astype(jnp.int32)
    return jax.nn.one_hot(idx, n, dtype=jnp.float32)


def average_weights(ensemble: Dict[int, dict]) -> dict:
    """Elementwise mean of an ensemble of parameter pytrees with identical
    structure (reference: ``utils/nn.py:11-34``; the batchnorm running-stat
    exclusion does not apply since flax keeps those out of ``params``)."""
    trees = list(ensemble.values())
    if not trees:
        raise ValueError("Empty ensemble")
    return jax.tree_util.tree_map(
        lambda *leaves: sum(leaves) / float(len(leaves)), *trees)


def set_deterministic_mode(seed: int) -> Array:
    """Returns a root PRNG key for the given seed. Unlike the reference's
    global ``torch.manual_seed`` (``utils/nn.py:87-100``), randomness in this
    framework is explicit: every stochastic op consumes a split of this key."""
    return jax.random.PRNGKey(int(seed))


def as_numpy(x) -> np.ndarray:
    """Coerce torch tensors / jax arrays / array-likes to a host numpy array."""
    if hasattr(x, "detach"):  # torch tensor
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def get_bnorm(dim: int):
    """Dimension-keyed BatchNorm factory (reference: ``utils/nn.py:103-105``).
    flax BatchNorm normalizes the channel (last) axis for any rank, so every
    dim maps to the same module class."""
    import flax.linen as fnn
    if dim not in (1, 2, 3):
        raise KeyError(dim)
    return fnn.BatchNorm


def get_conv(dim: int):
    """Dimension-keyed convolution factory (reference: ``utils/nn.py:108-110``).
    Returns a constructor ``(features, kernel_size=3, stride=1) -> nn.Conv``
    in channels-last layout."""
    import flax.linen as fnn
    if dim not in (1, 2, 3):
        raise KeyError(dim)

    def make(features, kernel_size=3, stride=1, padding="SAME", **kw):
        ks = kernel_size if isinstance(kernel_size, tuple) else (kernel_size,) * dim
        st = stride if isinstance(stride, tuple) else (stride,) * dim
        return fnn.Conv(features, ks, st, padding, **kw)

    return make


def get_maxpool(dim: int):
    """Dimension-keyed max-pool op (reference: ``utils/nn.py:113-115``).
    Returns ``pool(x, window=2, stride=2)``."""
    import flax.linen as fnn
    if dim not in (1, 2, 3):
        raise KeyError(dim)

    def pool(x, window=2, stride=2):
        return fnn.max_pool(x, (window,) * dim, (stride,) * dim)

    return pool


def concat_features(args: Union[Array, Iterable[Array]]) -> Array:
    """Concatenate a list of feature tensors on the last dim, flattening
    any input with >=4 dims to 2-D and broadcasting batch dims — the jnp
    equivalent of the reference's ``Concat`` module (``utils/nn.py:51-74``)."""
    if isinstance(args, (jnp.ndarray, np.ndarray)) or hasattr(args, "shape"):
        return args
    args = [a.reshape(a.shape[0], -1) if a.ndim >= 4 else a for a in args]
    batch_shape = jnp.broadcast_shapes(*[a.shape[:-1] for a in args])
    args = [jnp.broadcast_to(a, batch_shape + (a.shape[-1],)) for a in args]
    return jnp.concatenate(args, axis=-1)


class Concat:
    """Callable wrapper over :func:`concat_features` for API parity with the
    reference's ``Concat`` module (``utils/nn.py:51-74``)."""

    def __init__(self, allow_broadcast: bool = True):
        self.allow_broadcast = allow_broadcast

    def __call__(self, input_args):
        return concat_features(input_args)
