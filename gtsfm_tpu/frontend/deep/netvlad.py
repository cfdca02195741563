"""NetVLAD global descriptor in Flax (VGG16 backbone + VLAD pooling).

TPU-native replacement for the hloc NetVLAD the reference wraps
(gtsfm/retriever/global_descriptor/netvlad_global_descriptor.py:20; model at
thirdparty/hloc/netvlad.py): VGG16 conv features through conv5_3 ->
soft-assignment VLAD aggregation over 64 clusters -> intra-normalization ->
flatten (64 x 512 = 32768) -> L2 -> PCA-whitening projection to 4096 -> L2.

Weight conversion targets the matconvnet Pitts30K checkpoint layout used by
hloc (``VGG16-NetVLAD-pitts30k.mat``).
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

NUM_CLUSTERS = 64
FEAT_DIM = 512
OUT_DIM = 4096

# VGG16 conv structure: (name, channels); 'M' = maxpool.
VGG16_CFG = [
    ("conv1_1", 64), ("conv1_2", 64), "M",
    ("conv2_1", 128), ("conv2_2", 128), "M",
    ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), "M",
    ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512), "M",
    ("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512),
]


class VGG16Backbone(nn.Module):
    @nn.compact
    def __call__(self, x):  # (B, H, W, 3)
        for item in VGG16_CFG:
            if item == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                name, ch = item
                x = nn.Conv(ch, (3, 3), name=name)(x)
                if name != "conv5_3":
                    x = nn.relu(x)
        return x  # (B, H/16, W/16, 512)


class NetVLADLayer(nn.Module):
    @nn.compact
    def __call__(self, feats):  # (B, h, w, 512)
        B = feats.shape[0]
        x = feats.reshape(B, -1, FEAT_DIM)  # (B, N, 512)
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        # Soft assignment: 1x1 conv == dense, no bias (matconvnet layout).
        scores = nn.Dense(NUM_CLUSTERS, use_bias=False, name="score_proj")(x)
        assign = jax.nn.softmax(scores, axis=-1)  # (B, N, 64)
        centers = self.param(
            "centers", nn.initializers.normal(0.1), (NUM_CLUSTERS, FEAT_DIM)
        )
        # VLAD: sum_n a_nk (x_n - c_k)
        vlad = jnp.einsum("bnk,bnd->bkd", assign, x) - (
            jnp.sum(assign, axis=1)[..., None] * centers[None]
        )
        # Intra-normalization per cluster, flatten, global L2.
        vlad = vlad / jnp.maximum(jnp.linalg.norm(vlad, axis=-1, keepdims=True), 1e-12)
        vlad = vlad.reshape(B, NUM_CLUSTERS * FEAT_DIM)
        vlad = vlad / jnp.maximum(jnp.linalg.norm(vlad, axis=-1, keepdims=True), 1e-12)
        return vlad


class NetVLADNet(nn.Module):
    @nn.compact
    def __call__(self, image):  # (B, H, W, 3) in [0, 1]
        # matconvnet VGG preprocessing: RGB average subtraction, scale 255.
        mean = jnp.asarray([123.68, 116.779, 103.939]) / 255.0
        x = (image - mean) * 255.0
        feats = VGG16Backbone(name="backbone")(x)
        vlad = NetVLADLayer(name="vlad")(feats)
        out = nn.Dense(OUT_DIM, use_bias=True, name="whiten")(vlad)
        return out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)


class NetVLAD:
    def __init__(self, params=None, checkpoint_path: str | None = None):
        self.net = NetVLADNet()
        if params is None and checkpoint_path:
            params = convert_matconvnet_checkpoint(checkpoint_path)
        self.params = params

    def init_random(self, h: int = 224, w: int = 224, seed: int = 0):
        self.params = self.net.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, h, w, 3))
        )["params"]
        return self

    @functools.partial(jax.jit, static_argnames=("self",))
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """images: (B, H, W, 3) float32 in [0, 1] -> (B, 4096) descriptors."""
        return self.net.apply({"params": self.params}, images)


def convert_matconvnet_checkpoint(path: str):
    """hloc VGG16-NetVLAD-pitts30k .mat -> flax params.

    matconvnet stores conv kernels as (kh, kw, I, O) already; the VLAD layer
    exposes soft-assignment weights + cluster centers; whitening is WPCA
    (conv 1x1 over the 32768 vector).
    """
    import scipy.io

    mat = scipy.io.loadmat(path, struct_as_record=False, squeeze_me=True)
    net = mat["net"]
    layers = net.layers
    value_by_name = {}
    for layer in layers:
        name = str(layer.name)
        if hasattr(layer, "weights") and np.size(layer.weights):
            value_by_name[name] = layer.weights

    params: dict = {"backbone": {}, "vlad": {}, "whiten": {}}
    for item in VGG16_CFG:
        if item == "M":
            continue
        name, _ = item
        w, b = value_by_name[name]
        params["backbone"][name] = {
            "kernel": np.asarray(w, np.float32),
            "bias": np.asarray(b, np.float32).reshape(-1),
        }
    w_assign = np.asarray(value_by_name["vlad:assign"][0], np.float32)  # (1,1,512,64)
    centers = np.asarray(value_by_name["vlad:core"][0], np.float32)  # (512, 64)
    params["vlad"] = {
        "score_proj": {"kernel": w_assign.reshape(FEAT_DIM, NUM_CLUSTERS)},
        "centers": centers.T,
    }
    w_wh, b_wh = value_by_name["WPCA"]
    params["whiten"] = {
        "kernel": np.asarray(w_wh, np.float32).reshape(-1, OUT_DIM),
        "bias": np.asarray(b_wh, np.float32).reshape(-1),
    }
    return jax.tree_util.tree_map(jnp.asarray, params)
