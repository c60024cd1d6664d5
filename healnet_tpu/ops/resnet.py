"""ResNet-50 feature extractor (Flax) for WSI patch embeddings.

The reference extracts per-patch features with torchvision's ResNet50
(IMAGENET1K_V2) minus the classifier head on GPU
(`/root/reference/tasks.py:153-187`). Here the extractor is a native Flax
ResNet-50 running the patch batches on TPU — the device-side embedding path
of the preprocessing pipeline (BASELINE.json: "streaming preprocessing
pipeline with device-side patch embedding").

The architecture matches torchvision's v1.5 ResNet-50 (stride-2 in the 3x3
of each downsampling bottleneck), so weights exported from a torchvision
checkpoint can be imported via :func:`params_from_torchvision_state_dict`
(pretrained weights cannot be downloaded in this zero-egress environment —
pass a locally available ``resnet50.pt`` when available; otherwise the
extractor runs with fixed random projections, which is documented and still
yields usable bag-of-patch representations for smoke pipelines).
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, name="bn1")(y)
        y = jax.nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), strides=(self.strides, self.strides),
            padding=((1, 1), (1, 1)), use_bias=False, name="conv2",
        )(y)
        y = nn.BatchNorm(use_running_average=not train, name="bn2")(y)
        y = jax.nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, name="conv3")(y)
        y = nn.BatchNorm(use_running_average=not train, name="bn3")(y)
        if self.downsample:
            residual = nn.Conv(
                self.features * 4, (1, 1), strides=(self.strides, self.strides),
                use_bias=False, name="downsample_conv",
            )(x)
            residual = nn.BatchNorm(
                use_running_average=not train, name="downsample_bn"
            )(residual)
        return jax.nn.relu(y + residual)


class ResNet50(nn.Module):
    """torchvision-compatible ResNet-50; ``features_only`` drops the head."""

    num_classes: int = 1000
    features_only: bool = True
    stage_sizes: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
            use_bias=False, name="conv1",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn1")(x)
        x = jax.nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, blocks in enumerate(self.stage_sizes):
            features = 64 * (2**stage)
            for block in range(blocks):
                strides = 2 if stage > 0 and block == 0 else 1
                x = Bottleneck(
                    features=features,
                    strides=strides,
                    downsample=block == 0,
                    name=f"layer{stage + 1}_{block}",
                )(x, train=train)
        x = jnp.mean(x, axis=(1, 2))  # global average pool -> (b, 2048)
        if self.features_only:
            return x
        return nn.Dense(self.num_classes, name="fc")(x)


class PatchFeatureExtractor:
    """Batched TPU patch -> 2048-d embedding pipeline."""

    def __init__(
        self,
        weights_path: Optional[str] = None,
        batch_size: int = 64,
        seed: int = 0,
    ):
        self.model = ResNet50(features_only=True)
        self.batch_size = batch_size
        dummy = jnp.zeros((1, 224, 224, 3), jnp.float32)
        variables = self.model.init(jax.random.PRNGKey(seed), dummy)
        if weights_path is not None:
            import torch

            state = torch.load(weights_path, map_location="cpu", weights_only=True)
            variables = params_from_torchvision_state_dict(state, variables)
            self.pretrained = True
        else:
            self.pretrained = False
        self._variables = variables
        self._apply = jax.jit(lambda v, x: self.model.apply(v, x, train=False))

    def __call__(self, patches: np.ndarray) -> np.ndarray:
        """(n, 224, 224, 3) uint8/float patches -> (n, 2048) features."""
        patches = np.asarray(patches)
        if patches.dtype == np.uint8:
            patches = patches.astype(np.float32) / 255.0
        patches = (patches - IMAGENET_MEAN) / IMAGENET_STD
        n = patches.shape[0]
        out = np.zeros((n, 2048), np.float32)
        bs = self.batch_size
        for start in range(0, n, bs):
            chunk = patches[start : start + bs]
            pad = bs - chunk.shape[0]
            if pad > 0:
                chunk = np.concatenate([chunk, np.zeros((pad, *chunk.shape[1:]), np.float32)])
            feats = np.asarray(self._apply(self._variables, jnp.asarray(chunk)))
            out[start : start + bs - pad] = feats[: bs - pad]
        return out


def params_from_torchvision_state_dict(state: Mapping, variables) -> Dict:
    """Map a torchvision resnet50 state_dict onto the Flax variables tree."""
    import flax

    params = flax.core.unfreeze(variables["params"])
    batch_stats = flax.core.unfreeze(variables["batch_stats"])

    def np_(t):
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)

    def conv(name_t, tree, name_f):
        tree[name_f]["kernel"] = np_(state[f"{name_t}.weight"]).transpose(2, 3, 1, 0)

    def bn(name_t, p_tree, s_tree, name_f):
        p_tree[name_f]["scale"] = np_(state[f"{name_t}.weight"])
        p_tree[name_f]["bias"] = np_(state[f"{name_t}.bias"])
        s_tree[name_f]["mean"] = np_(state[f"{name_t}.running_mean"])
        s_tree[name_f]["var"] = np_(state[f"{name_t}.running_var"])

    conv("conv1", params, "conv1")
    bn("bn1", params, batch_stats, "bn1")
    for stage, blocks in enumerate((3, 4, 6, 3)):
        for block in range(blocks):
            t = f"layer{stage + 1}.{block}"
            f = f"layer{stage + 1}_{block}"
            for i in (1, 2, 3):
                conv(f"{t}.conv{i}", params[f], f"conv{i}")
                bn(f"{t}.bn{i}", params[f], batch_stats[f], f"bn{i}")
            if block == 0:
                conv(f"{t}.downsample.0", params[f], "downsample_conv")
                bn(f"{t}.downsample.1", params[f], batch_stats[f], "downsample_bn")
    return {"params": params, "batch_stats": batch_stats}
