"""Backbone-splitting tests: FirstHalf ∘ SecondHalf == full backbone."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from neural_image_compression_tpu.models.vision import (
    FirstHalf, FrozenActivationBlock, GraphBackbone, SecondHalf,
)
from neural_image_compression_tpu.ops import Conv2d

KEY = jax.random.PRNGKey(0)


def _backbone():
    # small YOLO-ish graph: conv, conv, conv, concat(0, 2) -> conv
    return GraphBackbone(layers=(
        (Conv2d(8, 3, 1, 1), -1),
        (Conv2d(8, 3, 2, 1), -1),
        (Conv2d(8, 3, 1, 1), -1),
        (Conv2d(4, 1, 1, 0), [1, 2]),
    ))


def test_graph_backbone_runs():
    bb = _backbone()
    x = jax.random.normal(KEY, (1, 16, 16, 3))
    vs = bb.init(KEY, x)
    out = bb.apply(vs, x)
    assert out.shape == (1, 8, 8, 4)


def test_split_composition_matches_full():
    bb = _backbone()
    x = jax.random.normal(KEY, (1, 16, 16, 3))
    vs = bb.init(KEY, x)
    full = bb.apply(vs, x)
    nested = {"params": {"backbone": vs["params"]}}
    for cut in (0, 1, 2):
        fh = FirstHalf(backbone=bb, cut=cut)
        sh = SecondHalf(backbone=bb, cut=cut)
        mid, outs = fh.apply(nested, x, collect=True)
        # prev_outputs needed when later layers reference pre-cut outputs
        rec = sh.apply(nested, mid, prev_outputs=outs)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(full),
                                   rtol=1e-5, atol=1e-6)


def test_frozen_activation_block():
    c = 6
    rng = np.random.RandomState(0)
    blk = FrozenActivationBlock.from_stats(
        scale=rng.rand(c) + 0.5, bias=rng.randn(c),
        mean=rng.randn(c), var=rng.rand(c) + 0.1)
    x = jnp.asarray(rng.randn(1, 4, 4, c).astype(np.float32))
    out = blk(x)  # no params to init — pure function
    norm = (np.asarray(x) - blk.mean) / np.sqrt(blk.var + blk.eps) * blk.scale + blk.bias
    expected = norm / (1 + np.exp(-norm)) * 1.0  # silu = x*sigmoid(x)
    expected = norm * (1 / (1 + np.exp(-norm)))
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-5)


def test_frozen_block_has_no_trainable_params():
    blk = FrozenActivationBlock.from_stats(
        scale=np.ones(3), bias=np.zeros(3), mean=np.zeros(3), var=np.ones(3))
    vs = blk.init(KEY, jnp.ones((1, 2, 2, 3)))
    assert vs == {} or jax.tree.leaves(vs) == []


# ---------------------------------------------------------------------------
# Realistic CSP/YOLO-style backbone (models/backbones.py)
# ---------------------------------------------------------------------------

from neural_image_compression_tpu.models.backbones import (
    build_yolo_backbone, frozen_activation_from_conv,
)


class TestYoloBackbone:
    def _init(self, w=4, size=64):
        bb = build_yolo_backbone(width=w)
        x = jax.random.normal(KEY, (1, size, size, 3))
        vs = bb.init(KEY, x)
        return bb, vs, x

    def test_shapes_and_grid(self):
        bb, vs, x = self._init()
        out = bb.apply(vs, x)
        # neck output: P3 grid (/8) with 4w channels
        assert out.shape == (1, 8, 8, 16)

    def test_split_across_neck_concat(self):
        """Cuts in [4, 15] force SecondHalf to read layer 4/6 outputs
        through prev_outputs — the YOLO-neck hand-off the machinery exists
        for (Extra.py:21-42)."""
        bb, vs, x = self._init()
        full = bb.apply(vs, x)
        nested = {"params": {"backbone": vs["params"]},
                  "batch_stats": {"backbone": vs["batch_stats"]}}
        for cut in (3, 5, 7, 9, 13):
            fh = FirstHalf(backbone=bb, cut=cut)
            sh = SecondHalf(backbone=bb, cut=cut)
            mid, outs = fh.apply(nested, x, collect=True)
            rec = sh.apply(nested, mid, prev_outputs=outs)
            np.testing.assert_allclose(np.asarray(rec), np.asarray(full),
                                       rtol=1e-5, atol=1e-5)

    def test_frozen_activation_from_cut_layer(self):
        bb, vs, x = self._init()
        blk = frozen_activation_from_conv(vs, 3)
        f = jax.random.normal(KEY, (1, 8, 8, 16))
        out = blk(f)
        assert out.shape == f.shape
        # matches BN+SiLU computed from the raw stats
        p = vs["params"]["layers_3_0"]["BatchNorm_0"]
        s = vs["batch_stats"]["layers_3_0"]["BatchNorm_0"]
        norm = ((np.asarray(f) - np.asarray(s["mean"]))
                / np.sqrt(np.asarray(s["var"]) + 1e-5)
                * np.asarray(p["scale"]) + np.asarray(p["bias"]))
        expected = norm / (1 + np.exp(-norm))
        np.testing.assert_allclose(np.asarray(out), expected,
                                   rtol=1e-4, atol=1e-5)

    def test_frozen_activation_rejects_non_conv_layer(self):
        bb, vs, _ = self._init()
        import pytest
        for bad in (9, 11):  # SPPF (BNs only in sub-scopes), Upsample2x
            with pytest.raises(ValueError):
                frozen_activation_from_conv(vs, bad)

    def test_distillation_end_to_end(self):
        """ScalableImageCoding + vision_rd_loss distilling against the
        frozen CSP backbone: FirstHalf(cut=3) is V, the cut ConvBNSiLU's
        frozen BN+SiLU is the activation; a few adam steps reduce the
        loss and the vision term is finite and live."""
        import optax
        from neural_image_compression_tpu.models import ScalableImageCoding
        from neural_image_compression_tpu.train.loss import vision_rd_loss

        from neural_image_compression_tpu.models import distillation_targets

        bb, bvs, _ = self._init()  # w=4: P3 channels 16 == 2*m1 with m1=8
        act, V = distillation_targets(bb, bvs, cut=3)

        model = ScalableImageCoding(latent_channels=16, base_channels=8, K=1)
        key = jax.random.PRNGKey(3)
        x = jax.random.uniform(key, (2, 64, 64, 3))
        params = model.init({"params": key, "noise": key}, x,
                            training=True)["params"]
        tx = optax.adam(1e-3)
        opt = tx.init(params)

        @jax.jit
        def step(p, o, x, rng):
            def loss_fn(pp):
                out = model.apply({"params": pp}, x, training=True,
                                  rngs={"noise": rng})
                m = vision_rd_loss(out, x, 0.01, gamma=1.0,
                                   frozen_activation=act, V=V)
                return m["loss"], m
            (l, m), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
            u, o = tx.update(g, o)
            return optax.apply_updates(p, u), o, m

        losses, vmses = [], []
        for i in range(12):
            params, opt, m = step(params, opt, x, jax.random.PRNGKey(i))
            losses.append(float(m["loss"]))
            vmses.append(float(m["vision_mse"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
        assert vmses[0] > 0.0  # distillation term is live


def test_backbone_save_load_roundtrip(tmp_path):
    from neural_image_compression_tpu.models.backbones import (
        load_backbone, save_backbone)

    x = jax.random.normal(KEY, (1, 64, 64, 3))
    for depth in (1, 2):  # depth=2 has Bottleneck_1+ scopes that must
        # survive the round-trip (the architecture travels with the file)
        bb = build_yolo_backbone(width=4, depth=depth)
        vs = bb.init(KEY, x)
        path = str(tmp_path / f"bb{depth}.npz")
        save_backbone(path, 4, vs, depth=depth)
        bb2, vs2 = load_backbone(path)
        assert jax.tree.structure(vs2) == jax.tree.structure(
            jax.tree.map(jnp.asarray, vs))
        np.testing.assert_allclose(np.asarray(bb2.apply(vs2, x)),
                                   np.asarray(bb.apply(vs, x)), rtol=1e-6)


def test_yolo_backbone_torch_import_parity():
    """Weights from a torch YOLOv5-family backbone (standard ultralytics
    module naming: model.{i}.conv/bn, cv1/cv2/cv3, m.{j}) map into
    build_yolo_backbone and reproduce the torch eval forward — the path a
    real pretrained checkpoint takes into the distillation teacher."""
    import torch
    import torch.nn as tnn

    from neural_image_compression_tpu.utils import (
        yolo_backbone_variables_from_torch)

    class TConv(tnn.Module):
        def __init__(self, c1, c2, k=1, s=1):
            super().__init__()
            self.conv = tnn.Conv2d(c1, c2, k, s, (k - 1) // 2, bias=False)
            self.bn = tnn.BatchNorm2d(c2)

        def forward(self, x):
            return tnn.functional.silu(self.bn(self.conv(x)))

    class TBottleneck(tnn.Module):
        def __init__(self, c, shortcut=True):
            super().__init__()
            self.cv1 = TConv(c, c, 1)
            self.cv2 = TConv(c, c, 3)
            self.add = shortcut

        def forward(self, x):
            y = self.cv2(self.cv1(x))
            return x + y if self.add else y

    class TC3(tnn.Module):
        def __init__(self, c1, c2, n=1, shortcut=True):
            super().__init__()
            h = c2 // 2
            self.cv1 = TConv(c1, h, 1)
            self.cv2 = TConv(c1, h, 1)
            self.cv3 = TConv(c2, c2, 1)
            self.m = tnn.Sequential(*[TBottleneck(h, shortcut)
                                      for _ in range(n)])

        def forward(self, x):
            return self.cv3(torch.cat([self.m(self.cv1(x)), self.cv2(x)], 1))

    class TSPPF(tnn.Module):
        def __init__(self, c):
            super().__init__()
            h = c // 2
            self.cv1 = TConv(c, h, 1)
            self.cv2 = TConv(4 * h, c, 1)
            self.pool = tnn.MaxPool2d(5, 1, 2)

        def forward(self, x):
            x = self.cv1(x)
            p1 = self.pool(x); p2 = self.pool(p1); p3 = self.pool(p2)
            return self.cv2(torch.cat([x, p1, p2, p3], 1))

    class TBackbone(tnn.Module):
        """The real yolov5n layout (yaml indices 0-17 through the P3 C3);
        Concat layers are nn.Identity so state_dict indices match."""

        def __init__(self, w):
            super().__init__()
            self.model = tnn.ModuleList([
                TConv(3, w, 6, 2), TConv(w, 2 * w, 3, 2),
                TC3(2 * w, 2 * w, 1),
                TConv(2 * w, 4 * w, 3, 2), TC3(4 * w, 4 * w, 2),
                TConv(4 * w, 8 * w, 3, 2), TC3(8 * w, 8 * w, 3),
                TConv(8 * w, 16 * w, 3, 2), TC3(16 * w, 16 * w, 1),
                TSPPF(16 * w),
                TConv(16 * w, 8 * w, 1), tnn.Upsample(scale_factor=2),
                tnn.Identity(), TC3(16 * w, 8 * w, 1, shortcut=False),
                TConv(8 * w, 4 * w, 1), tnn.Upsample(scale_factor=2),
                tnn.Identity(), TC3(8 * w, 4 * w, 1, shortcut=False)])

        def forward(self, x):
            outs, cat_from = [], {12: 6, 16: 4}
            for i, m in enumerate(self.model):
                if i in cat_from:
                    x = torch.cat([x, outs[cat_from[i]]], 1)
                x = m(x)
                outs.append(x)
            return x

    torch.manual_seed(0)
    w = 4
    tb = TBackbone(w).eval()
    with torch.no_grad():  # non-trivial frozen BN statistics
        for m in tb.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.5)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0.0, 0.2)
    x_t = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        ref = tb(x_t).numpy()

    sd = {k: v.numpy() for k, v in tb.state_dict().items()}
    variables = yolo_backbone_variables_from_torch(sd)
    bb = build_yolo_backbone(width=w)
    got = bb.apply(jax.tree.map(jnp.asarray, variables),
                   jnp.asarray(np.transpose(x_t.numpy(), (0, 2, 3, 1))))
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               ref, rtol=2e-4, atol=2e-5)
