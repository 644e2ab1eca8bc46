"""Weight interop with the reference pyroVED (PyTorch state_dicts).

Lets a reference user carry TRAINED weights across the migration in either
direction:

- :func:`load_torch_weights` / :func:`torch_to_params` — map a reference
  ``model.state_dict()`` (saved by ``pyroved/models/base.py:183-186`` as
  ``torch.save(self.state_dict(), path + '.pt')``) onto this framework's
  flax parameter pytree.
- :func:`params_to_torch` — the inverse: emit a reference-keyed state_dict
  (numpy arrays) that ``torch_model.load_state_dict`` accepts after
  wrapping values in tensors.

The reference's module names are stable public API (``pyroved/nets/fc.py``:
``fc_layers.{2i}`` Linear stacks from ``make_fc_layers`` (:307-324),
``fc11/fc12/fc13`` heads, ``coord_latent.fc_coord``/``.fc_latent``
(:202-237), ``out`` heads; ``pyroved/nets/conv.py``:
``feature_extractor.layers.{i}`` / ``upsampler.layers.{i}`` Sequentials
(:146-249), ``features2latent.fc_latent`` (:252-263),
``latent2features.fc`` (:266-277)), so the mapping is generated
structurally from the target model and validated leaf-by-leaf.

Layout conversions applied per leaf:

- Linear ``weight [out, in]``  <->  Dense ``kernel [in, out]`` (transpose).
- ConvNd ``weight [O, I, *K]`` <->  flax ``kernel [*K, I, O]``.
- The two dense bridges flatten feature maps in NCHW (torch) vs NHWC
  (here) order, so their weight rows/columns are permuted channel-wise
  using the feature-map shape derived from the net config.
- BatchNorm ``weight/bias`` <-> ``scale/bias`` params; ``running_mean/var``
  <-> ``batch_stats`` collections (``model.state``).
"""
from typing import Any, Dict, List, Mapping, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["torch_to_params", "params_to_torch", "load_torch_weights"]

_CONV_FWD_PERM = {1: (2, 1, 0), 2: (2, 3, 1, 0), 3: (2, 3, 4, 1, 0)}
_CONV_BWD_PERM = {1: (2, 1, 0), 2: (3, 2, 0, 1), 3: (4, 3, 0, 1, 2)}


def _np(v) -> np.ndarray:
    """torch.Tensor / jax / numpy -> float numpy array (no torch import)."""
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _reorder_chw_to_hwc(x: np.ndarray, ch: int, spatial: Tuple[int, ...]) -> np.ndarray:
    """Permute leading axis from (C, *S) flatten order to (*S, C) order."""
    rest = x.shape[1:]
    x = x.reshape((ch,) + tuple(spatial) + rest)
    x = np.moveaxis(x, 0, len(spatial))
    return x.reshape((ch * int(np.prod(spatial)),) + rest)


def _reorder_hwc_to_chw(x: np.ndarray, ch: int, spatial: Tuple[int, ...]) -> np.ndarray:
    rest = x.shape[1:]
    x = x.reshape(tuple(spatial) + (ch,) + rest)
    x = np.moveaxis(x, len(spatial), 0)
    return x.reshape((ch * int(np.prod(spatial)),) + rest)


class _Leaf:
    """One state_dict leaf <-> one param-tree leaf, with its transform."""

    def __init__(self, torch_key: str, path: Tuple[str, ...], kind: str,
                 ndim: int = 2, ch: int = 0, spatial: Tuple[int, ...] = (),
                 collection: str = "params"):
        self.torch_key = torch_key
        self.path = path
        self.kind = kind
        self.ndim = ndim
        self.ch = ch
        self.spatial = tuple(int(s) for s in spatial)
        self.collection = collection  # "params" | "batch_stats"

    def fwd(self, w: np.ndarray) -> np.ndarray:
        """torch layout -> ours."""
        if self.kind == "linear":
            return w.T
        if self.kind == "conv":
            return np.transpose(w, _CONV_FWD_PERM[self.ndim])
        if self.kind == "bridge_in":      # features2latent.weight [2L, C*S]
            return _reorder_chw_to_hwc(w.T, self.ch, self.spatial)
        if self.kind == "bridge_out_w":   # latent2features.weight [C*S, L]
            return _reorder_chw_to_hwc(w, self.ch, self.spatial).T
        if self.kind == "bridge_out_b":   # latent2features.bias [C*S]
            return _reorder_chw_to_hwc(w, self.ch, self.spatial)
        return w                           # copy

    def bwd(self, w: np.ndarray) -> np.ndarray:
        """our layout -> torch."""
        if self.kind == "linear":
            return w.T
        if self.kind == "conv":
            return np.transpose(w, _CONV_BWD_PERM[self.ndim])
        if self.kind == "bridge_in":
            return _reorder_hwc_to_chw(w, self.ch, self.spatial).T
        if self.kind == "bridge_out_w":
            return _reorder_hwc_to_chw(w.T, self.ch, self.spatial)
        if self.kind == "bridge_out_b":
            return _reorder_hwc_to_chw(w, self.ch, self.spatial)
        return w


# ---------------------------------------------------------------------------
# Mapping construction (structural, from the target model)
# ---------------------------------------------------------------------------

def _fc_leaves(prefix: str, path: Tuple[str, ...], sub: Mapping) -> List[_Leaf]:
    """fc-family nets: fcEncoderNet / jfcEncoderNet / fcDecoderNet /
    sDecoderNet / fcClassifierNet / fcRegressorNet (reference
    ``nets/fc.py``). ``make_fc_layers`` interleaves Linear+activation, so
    Linear ``i`` sits at Sequential index ``2*i``."""
    leaves = []
    n_dense = len(sub["MLP_0"])
    for i in range(n_dense):
        leaves.append(_Leaf(f"{prefix}fc_layers.{2 * i}.weight",
                            path + ("MLP_0", f"Dense_{i}", "kernel"), "linear"))
        leaves.append(_Leaf(f"{prefix}fc_layers.{2 * i}.bias",
                            path + ("MLP_0", f"Dense_{i}", "bias"), "copy"))
    for head in ("fc11", "fc12", "fc13", "out"):
        if head in sub:
            leaves.append(_Leaf(f"{prefix}{head}.weight",
                                path + (head, "kernel"), "linear"))
            leaves.append(_Leaf(f"{prefix}{head}.bias",
                                path + (head, "bias"), "copy"))
    if "fc_coord" in sub:   # sDecoderNet's coord_latent block
        leaves.append(_Leaf(f"{prefix}coord_latent.fc_coord.weight",
                            path + ("fc_coord", "kernel"), "linear"))
        leaves.append(_Leaf(f"{prefix}coord_latent.fc_coord.bias",
                            path + ("fc_coord", "bias"), "copy"))
    if "fc_latent" in sub:  # bias-free (reference nets/fc.py:217)
        leaves.append(_Leaf(f"{prefix}coord_latent.fc_latent.weight",
                            path + ("fc_latent", "kernel"), "linear"))
    return leaves


def _conv_stack_leaves(prefix: str, path: Tuple[str, ...], ndim: int,
                       filters: Sequence[Sequence[int]], batchnorm: bool,
                       pool_last: Optional[bool],
                       upsampler: bool) -> List[_Leaf]:
    """Simulate the reference Sequential layout (``nets/conv.py:170-193``
    for FeatureExtractor, ``:224-246`` for Upsampler) to recover the torch
    layer indices, and pair them with flax's per-type auto-numbering
    (Conv_k / BatchNorm_k / UpsampleBlock_k in creation order)."""
    leaves: List[_Leaf] = []
    idx = conv_i = bn_i = ub_i = 0
    total = sum(len(b) for b in filters)
    done = 0

    def _conv(torch_base: str, our: Tuple[str, ...]):
        leaves.append(_Leaf(f"{torch_base}.weight", our + ("kernel",),
                            "conv", ndim=ndim))
        leaves.append(_Leaf(f"{torch_base}.bias", our + ("bias",), "copy"))

    for b_i, block in enumerate(filters):
        for _ch in block:
            _conv(f"{prefix}{idx}", path + (f"Conv_{conv_i}",))
            idx += 1
            conv_i += 1
            idx += 1  # activation module (always appended by the reference)
            if batchnorm:
                base = f"{prefix}{idx}"
                bpath = path + (f"BatchNorm_{bn_i}",)
                leaves.append(_Leaf(f"{base}.weight", bpath + ("scale",), "copy"))
                leaves.append(_Leaf(f"{base}.bias", bpath + ("bias",), "copy"))
                leaves.append(_Leaf(f"{base}.running_mean", bpath + ("mean",),
                                    "copy", collection="batch_stats"))
                leaves.append(_Leaf(f"{base}.running_var", bpath + ("var",),
                                    "copy", collection="batch_stats"))
                idx += 1
                bn_i += 1
            done += 1
        if upsampler:
            _conv(f"{prefix}{idx}.conv",
                  path + (f"UpsampleBlock_{ub_i}", "Conv_0"))
            idx += 1
            ub_i += 1
        else:
            # Reference maxpool placement counts CONVS (nets/conv.py:188-192:
            # pool iff >= 2 convs remain), our FeatureExtractor counts BLOCKS
            # (nets/conv.py:92). The two agree for every config the reference
            # can actually train (its features2latent sizing is block-based,
            # so conv-count-divergent configs crash the reference forward) —
            # refuse them rather than emit a self-inconsistent mapping.
            ref_pool = done + 1 < total or bool(pool_last)
            block_pool = b_i + 1 < len(filters) or bool(pool_last)
            if ref_pool != block_pool:
                raise ValueError(
                    f"conv filter config {tuple(tuple(b) for b in filters)} "
                    "places maxpools differently in the reference "
                    "(conv-counted, nets/conv.py:188) and here "
                    "(block-counted); the reference cannot train this "
                    "config, so torch interop is undefined for it")
            if ref_pool:
                idx += 1
    if upsampler:  # final 1x1 conv to output_channels (nets/conv.py:244-245)
        _conv(f"{prefix}{idx}", path + (f"Conv_{conv_i}",))
    return leaves


def _enc_feature_shape(net) -> Tuple[int, Tuple[int, ...]]:
    """(channels, spatial dims) of the conv tower output
    (reference ``nets/conv.py:44-46``)."""
    from .nets.conv import _default_enc_filters
    filters = _default_enc_filters(net.hidden_dim)
    denom = 2 ** len(filters) if net.pool_last else 2 ** (len(filters) - 1)
    return filters[-1][-1], tuple(int(d) // denom for d in net.input_dim)


def _dec_feature_shape(net) -> Tuple[int, Tuple[int, ...]]:
    """(channels, spatial dims) fed to the upsampler
    (reference ``nets/conv.py:87-89``)."""
    from .nets.conv import _default_dec_filters
    filters = _default_dec_filters(net.hidden_dim)
    return filters[0][0], tuple(int(d) // 2 ** len(filters) for d in net.output_dim)


def _conv_encoder_leaves(top: str, sub: Mapping, net) -> List[_Leaf]:
    from .nets.conv import _default_enc_filters
    filters = _default_enc_filters(net.hidden_dim)
    ndim = len(net.input_dim)
    leaves = _conv_stack_leaves(f"{top}.feature_extractor.layers.",
                                (top, "FeatureExtractor_0"), ndim, filters,
                                net.batchnorm, net.pool_last, upsampler=False)
    ch, spatial = _enc_feature_shape(net)
    leaves.append(_Leaf(f"{top}.features2latent.fc_latent.weight",
                        (top, "features2latent", "kernel"), "bridge_in",
                        ch=ch, spatial=spatial))
    leaves.append(_Leaf(f"{top}.features2latent.fc_latent.bias",
                        (top, "features2latent", "bias"), "copy"))
    return leaves


def _conv_decoder_leaves(top: str, sub: Mapping, net) -> List[_Leaf]:
    from .nets.conv import _default_dec_filters
    filters = _default_dec_filters(net.hidden_dim)
    ndim = len(net.output_dim)
    ch, spatial = _dec_feature_shape(net)
    leaves = [
        _Leaf(f"{top}.latent2features.fc.weight",
              (top, "latent2features", "kernel"), "bridge_out_w",
              ch=ch, spatial=spatial),
        _Leaf(f"{top}.latent2features.fc.bias",
              (top, "latent2features", "bias"), "bridge_out_b",
              ch=ch, spatial=spatial),
    ]
    leaves += _conv_stack_leaves(f"{top}.upsampler.layers.",
                                 (top, "Upsampler_0"), ndim, filters,
                                 net.batchnorm, None, upsampler=True)
    return leaves


def _model_mapping(model) -> List[_Leaf]:
    """Full leaf mapping for a model, derived from its param tree and net
    configs. Top-level param keys mirror the reference attribute names
    (``encoder_z`` / ``encoder_y`` / ``decoder``)."""
    leaves: List[_Leaf] = []
    nets = {"encoder_z": model.encoder_net,
            "encoder_y": getattr(model, "encoder_y_net", None),
            "decoder": model.decoder_net}
    for top, sub in model.params.items():
        if "MLP_0" in sub:
            leaves += _fc_leaves(f"{top}.", (top,), sub)
        elif "FeatureExtractor_0" in sub:
            leaves += _conv_encoder_leaves(top, sub, nets[top])
        elif "Upsampler_0" in sub:
            leaves += _conv_decoder_leaves(top, sub, nets[top])
        else:
            raise ValueError(
                f"cannot derive a reference mapping for params[{top!r}] "
                f"(keys {sorted(sub)}); custom injected nets are not "
                "supported by the torch interop")
    return leaves


# ---------------------------------------------------------------------------
# Tree helpers
# ---------------------------------------------------------------------------

def _get(tree: Mapping, path: Tuple[str, ...]):
    for k in path:
        if not isinstance(tree, Mapping) or k not in tree:
            raise KeyError("/".join(path))
        tree = tree[k]
    return tree


def _set(tree: Dict, path: Tuple[str, ...], value) -> None:
    for k in path[:-1]:
        tree = tree.setdefault(k, {})
    tree[path[-1]] = value


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def torch_to_params(model, state_dict: Mapping[str, Any], strict: bool = True
                    ) -> Tuple[Dict, Dict]:
    """Map a reference pyroVED ``state_dict`` onto ``model``'s param tree.

    Args:
        model: a pyroved_tpu model (iVAE/jiVAE/ssiVAE/ss_reg_iVAE/VED) whose
            architecture matches the reference model the weights came from.
        state_dict: mapping of reference parameter names to torch tensors
            or numpy arrays.
        strict: raise on missing keys, unconsumed keys (other than
            BatchNorm ``num_batches_tracked`` counters), or shape
            mismatches. With ``strict=False`` missing/extra keys are
            skipped, but shape mismatches still raise.

    Returns:
        ``(params, batch_stats)`` — new trees (the model is not modified);
        ``batch_stats`` is ``{}`` unless the reference nets used batchnorm.
    """
    mapping = _model_mapping(model)
    params = _tree_copy(model.params)
    stats: Dict = {}
    missing = []
    consumed = set()
    for leaf in mapping:
        if leaf.torch_key not in state_dict:
            missing.append(leaf.torch_key)
            continue
        consumed.add(leaf.torch_key)
        val = leaf.fwd(_np(state_dict[leaf.torch_key]).astype(np.float32))
        if leaf.collection == "params":
            expected = tuple(_get(params, leaf.path).shape)
        else:
            # running stats are 1-D of the BatchNorm width (scale's shape)
            expected = tuple(_get(params, leaf.path[:-1] + ("scale",)).shape)
        if expected != tuple(val.shape):
            raise ValueError(
                f"{leaf.torch_key} -> {'/'.join(leaf.path)}: shape "
                f"{tuple(val.shape)} does not match target "
                f"{expected} — architecture mismatch")
        _set(params if leaf.collection == "params" else stats,
             leaf.path, jnp.asarray(val))
    extra = [k for k in state_dict
             if k not in consumed and not k.endswith("num_batches_tracked")]
    if strict and (missing or extra):
        raise KeyError(
            f"state_dict does not line up with the model: "
            f"missing={missing[:5]}{'...' if len(missing) > 5 else ''} "
            f"extra={extra[:5]}{'...' if len(extra) > 5 else ''}")
    return params, stats


def params_to_torch(model, params: Optional[Mapping] = None
                    ) -> Dict[str, np.ndarray]:
    """Emit a reference-keyed state_dict (numpy float32 arrays) from
    ``model``'s params — the inverse of :func:`torch_to_params`. Wrap the
    values in ``torch.tensor`` to ``load_state_dict`` into a reference
    model. BatchNorm running stats come from ``model.state`` when present
    (zeros/ones otherwise), and ``num_batches_tracked`` counters are
    emitted as zeros."""
    params = model.params if params is None else params
    out: Dict[str, np.ndarray] = {}
    for leaf in _model_mapping(model):
        if leaf.collection == "params":
            val = np.asarray(_get(params, leaf.path), np.float32)
        else:
            state = getattr(model, "state", {}) or {}
            try:
                val = np.asarray(_get(state, leaf.path), np.float32)
            except KeyError:
                width = _get(params, leaf.path[:-1] + ("scale",)).shape[0]
                val = (np.zeros(width, np.float32) if leaf.path[-1] == "mean"
                       else np.ones(width, np.float32))
            if leaf.torch_key.endswith("running_var"):
                base = leaf.torch_key[:-len("running_var")]
                out[base + "num_batches_tracked"] = np.asarray(0, np.int64)
        out[leaf.torch_key] = leaf.bwd(val)
    return out


def load_torch_weights(model, source, strict: bool = True):
    """Load reference pyroVED weights into ``model`` in place.

    ``source`` may be a path to a ``.pt`` file saved by the reference's
    ``save_weights`` (loaded with ``torch.load(weights_only=True)``), or a
    state_dict-like mapping. When the state_dict carries BatchNorm running
    statistics, they are installed in ``model.state`` and the model is
    switched to running-average normalization at inference
    (``use_running_stats``), matching the reference's ``eval()`` behavior.
    Returns the model."""
    if isinstance(source, (str, bytes)) or hasattr(source, "__fspath__"):
        import torch
        source = torch.load(source, map_location="cpu", weights_only=True)
    params, stats = torch_to_params(model, source, strict=strict)
    model.params = params
    if stats:
        if not hasattr(model, "state"):
            raise ValueError("model does not track batch_stats but the "
                             "state_dict contains BatchNorm running stats")
        model.state = stats
        model.use_running_stats = True
    return model


def _tree_copy(tree):
    """Copy the dict spine of a nested param mapping into plain mutable
    dicts (array leaves are shared, not copied)."""
    if isinstance(tree, Mapping):
        return {k: _tree_copy(v) for k, v in tree.items()}
    return tree
