"""Kodak-style evaluation harness (capability parity with Evaluator.py).

CompressionEvaluator (Evaluator.py:17-242): batch-1 eval loop at
training=False; metrics MSE(255), PSNR(RGB), MS-SSIM(RGB), PSNR(Y, BT.601),
MS-SSIM(Y) on clamped reconstructions; bpp aggregation; side-by-side sample
plots; high-entropy-channel visualizations; results-txt writer with the
identical format (Evaluator.py:235-242).

Deliberate fix vs the reference (SURVEY §2.3-1): Evaluator.py:81 reports
"BPP" as the mean of bpp_y only (z bits dropped). Here 'BPP' is the TRUE
total, and 'BPP(reference_reported)' reproduces the reference's buggy field
so parity against the published artifact can be checked on both conventions;
'BPP(y)'/'BPP(z)' give the split.

The whole per-image eval (forward + metrics) is one jitted function; the
matplotlib figures are saved to files (headless) instead of plt.show().
"""

import math
import os
import random
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from neural_image_compression_tpu.evaluation.msssim import ms_ssim, rgb_to_luma
from neural_image_compression_tpu.evaluation.viz import render_panel_grid
from neural_image_compression_tpu.train.loss import rd_loss as default_rd_loss
from neural_image_compression_tpu.train.loss import vision_rd_loss as default_vision_rd_loss


def normalize_map(x: np.ndarray, method: str = "minmax") -> np.ndarray:
    """Evaluator.py:9-15."""
    x = x.astype(np.float32)
    if method == "minmax":
        return (x - x.min()) / (x.max() - x.min() + 1e-12)
    if method == "std":
        return (x - x.mean()) / (x.std() + 1e-12)
    return x


def compute_metrics(orig: jax.Array, recon: jax.Array) -> Dict[str, jax.Array]:
    """Distortion metrics on [0,1] NHWC images (Evaluator.py:32-53)."""
    orig = orig.astype(jnp.float32)
    recon = recon.astype(jnp.float32)
    mse_rgb = jnp.mean((orig - recon) ** 2)
    psnr_rgb = 10.0 * jnp.log10(1.0 / mse_rgb)
    msssim_rgb = ms_ssim(recon, orig, data_range=1.0)
    y_orig = rgb_to_luma(orig)
    y_recon = rgb_to_luma(recon)
    mse_y = jnp.mean((y_orig - y_recon) ** 2)
    psnr_y = 10.0 * jnp.log10(1.0 / mse_y)
    msssim_y = ms_ssim(y_recon, y_orig, data_range=1.0)
    return {
        "MSE(255)": mse_rgb * 255.0 ** 2,
        "PSNR(RGB)": psnr_rgb,
        "MS-SSIM(RGB)": msssim_rgb,
        "PSNR(Y)": psnr_y,
        "MS-SSIM(Y)": msssim_y,
    }


class CompressionEvaluator:
    def __init__(self, model, params, dataloader, lambda_val: float,
                 save_dir: str = "./eval_results"):
        self.model = model
        self.params = params
        self.dataloader = dataloader
        self.lambda_val = lambda_val
        if save_dir is not None:  # None = metrics only (no artifacts/plots)
            os.makedirs(save_dir, exist_ok=True)
        self.save_dir = save_dir
        self._forward = jax.jit(
            lambda params, x: model.apply({"params": params}, x, training=False))

    rgb_to_luma = staticmethod(rgb_to_luma)
    compute_metrics = staticmethod(compute_metrics)

    def evaluate(self, rd_loss_fn: Optional[Callable] = None
                 ) -> Tuple[Dict[str, float], List[np.ndarray], List[np.ndarray]]:
        rd_loss_fn = rd_loss_fn or default_rd_loss
        total_metrics = []
        bpp_y_values, bpp_z_values, bpp_total_values = [], [], []
        imgs_list, recon_list = [], []

        # ONE jitted program per image: forward + loss + distortion metrics,
        # fetched together. Eager rd_loss/compute_metrics over device arrays
        # dispatches every primitive separately (CLAUDE.md tunnel gotcha).
        model, lam = self.model, self.lambda_val

        @jax.jit
        def _step(params, imgs):
            out = model.apply({"params": params}, imgs, training=False)
            results = rd_loss_fn(out, imgs, lam)
            recon = jnp.clip(out["x_hat"], 0.0, 1.0)
            scalars = dict(compute_metrics(imgs, recon))
            scalars.update(bpp_y=results["bpp_y"], bpp_z=results["bpp_z"],
                           bpp_total=results["bpp_total"])
            return recon, scalars

        for imgs in self.dataloader:
            recon, scalars = jax.device_get(_step(self.params,
                                                  jnp.asarray(imgs)))
            bpp_y_values.append(float(scalars.pop("bpp_y")))
            bpp_z_values.append(float(scalars.pop("bpp_z")))
            bpp_total_values.append(float(scalars.pop("bpp_total")))
            total_metrics.append({k: float(v) for k, v in scalars.items()})
            imgs_list.append(np.asarray(imgs[0] if imgs.ndim == 4 else imgs))
            recon_list.append(recon[0])

        if not total_metrics:
            raise ValueError("evaluation dataloader yielded no images "
                             "(empty/misnamed data_dir?)")
        avg = {k: float(np.mean([m[k] for m in total_metrics]))
               for k in total_metrics[0]}
        avg["BPP"] = float(np.mean(bpp_total_values))          # fixed: true total
        avg["BPP(y)"] = float(np.mean(bpp_y_values))
        avg["BPP(z)"] = float(np.mean(bpp_z_values))
        avg["BPP(reference_reported)"] = avg["BPP(y)"]         # Evaluator.py:81 convention

        print("\n--- Evaluation Results ---")
        for k, v in avg.items():
            print(f"{k}: {v:.6f}")
        return avg, imgs_list, recon_list

    def evaluate_codec(self, codec, refine_steps: int = 0,
                       refine_lambda: float = None, refine_lr: float = 1e-3,
                       **compress_kwargs) -> Dict[str, float]:
        """Real-bitstream evaluation: compress -> decompress every image with
        the given codec and report measured bpp (actual bytes on the wire)
        next to the analytic rate, plus distortion of the decoded output.
        The reference cannot do this — it has no bitstream (SURVEY §2 #29).
        compress_kwargs forward to codec.compress (e.g. n_streams=8).

        refine_steps > 0: encode-time latent refinement (coding/refine.py;
        refine_lambda is required — pass the model's training lambda) —
        latents are optimized against R + lambda*D and coded via
        codec.compress_latents; the decode side is unchanged, so the
        measured bpp is a true end-to-end number."""
        total_metrics = []
        real_bpps, analytic_bpps = [], []
        model = self.model
        refiner = None
        if refine_steps:
            from neural_image_compression_tpu.coding.refine import (
                make_refiner,
            )

            if refine_lambda is None:
                raise ValueError("refine_steps > 0 requires refine_lambda "
                                 "(use the model's training lambda)")
            refiner = make_refiner(model, {"params": self.params},
                                   refine_lambda, steps=refine_steps,
                                   lr=refine_lr)

        @jax.jit
        def _analysis(params, img, x_hat):
            out = model.apply({"params": params}, img, training=False)
            # analytic rate from whatever logp_* streams the model family
            # has (joint: logp_y + logp_z; scalable: y1 + y2 + z)
            bits = sum(-jnp.sum(v) for k, v in out.items()
                       if k.startswith("logp_"))
            return bits / math.log(2.0), compute_metrics(img, x_hat)

        for imgs in self.dataloader:
            imgs = np.asarray(imgs)
            h, w = imgs.shape[1:3]
            # every image in the batch goes through the codec — a batch-N
            # loader must not silently shrink the evaluated set
            for b in range(imgs.shape[0]):
                img = imgs[b:b + 1]
                if refiner is not None:
                    from neural_image_compression_tpu.data import (
                        pad_to_multiple,
                    )

                    xf = img.astype(np.float32)
                    if img.dtype == np.uint8:
                        xf /= 255.0
                    xp = pad_to_multiple(xf, 64)
                    y_q, z_q, _ = refiner(jnp.asarray(xp))
                    data = codec.compress_latents(
                        np.asarray(y_q)[0], np.asarray(z_q)[0], h, w,
                        **compress_kwargs)
                else:
                    data = codec.compress(img, **compress_kwargs)
                x_hat = codec.decompress(data)
                real_bpps.append(len(data) * 8.0 / (h * w))
                bits, metrics = jax.device_get(_analysis(
                    self.params, jnp.asarray(img), jnp.asarray(x_hat)))
                analytic_bpps.append(float(bits) / (h * w))
                total_metrics.append({k: float(v) for k, v in metrics.items()})

        if not total_metrics:
            raise ValueError("evaluation dataloader yielded no images "
                             "(empty/misnamed data_dir?)")
        avg = {k: float(np.mean([m[k] for m in total_metrics]))
               for k in total_metrics[0]}
        avg["BPP(bitstream)"] = float(np.mean(real_bpps))
        avg["BPP(analytic)"] = float(np.mean(analytic_bpps))
        avg["bitstream_overhead"] = (avg["BPP(bitstream)"] / avg["BPP(analytic)"]
                                     - 1.0)
        print("\n--- Codec Evaluation Results ---")
        for k, v in avg.items():
            print(f"{k}: {v:.6f}")
        return avg

    # -- visualization -------------------------------------------------
    # All evaluator figures go through viz.render_panel_grid; maps are shown
    # in their true value range with per-panel colorbars (the reference
    # min-max-normalized everything, hiding scale information).

    def plot_samples(self, imgs_list, recon_list, rd_loss_fn=None, n: int = 3,
                     seed: Optional[int] = None):
        """Per-image original-vs-reconstruction figures annotated with the
        coded size (capability of Evaluator.py:94-116); saved to save_dir."""
        rd_loss_fn = rd_loss_fn or default_rd_loss
        rng = random.Random(seed)
        indices = rng.sample(range(len(imgs_list)), min(n, len(imgs_list)))
        model, lam = self.model, self.lambda_val

        @jax.jit
        def _rate(params, img):  # fused fwd+loss (CLAUDE.md tunnel gotcha)
            out = model.apply({"params": params}, img, training=False)
            r = rd_loss_fn(out, img, lam)
            return r["bpp_total"], r["bits_total"]

        paths = []
        for idx in indices:
            img = jnp.asarray(imgs_list[idx])[None]
            bpp, bits = jax.device_get(_rate(self.params, img))
            bpp = float(bpp)
            nbytes = math.ceil(float(bits) / 8)
            row = [("original", np.asarray(imgs_list[idx])),
                   (f"reconstruction — {nbytes} B, {bpp:.4f} bpp",
                    np.asarray(recon_list[idx]))]
            paths.append(render_panel_grid(
                [row], os.path.join(self.save_dir, f"sample_{idx}.png"),
                panel=4.0))
        return paths

    @staticmethod
    def _busiest_channel(logp: np.ndarray) -> int:
        """Channel spending the most bits (argmax of mean -logp; the
        reference's argmin-mean-logp, Evaluator.py:135-137, same choice)."""
        return int(logp.reshape(-1, logp.shape[-1]).mean(axis=0).argmin())

    def plot_high_entropy_channel(self, imgs_list, seed: Optional[int] = None):
        """Latent / entropy-parameter maps for the busiest channel
        (capability of Evaluator.py:118-232), K=1 and K>1 layouts."""
        rng = random.Random(seed)
        idx = rng.randint(0, len(imgs_list) - 1)
        img = jnp.asarray(imgs_list[idx])[None]
        out = self._forward(self.params, img)

        logp_y = np.asarray(out["logp_y"])[0]
        logp_z = np.asarray(out["logp_z"])[0]
        c = self._busiest_channel(logp_y)
        cz = self._busiest_channel(logp_z)
        # visualize the QUANTIZED latents (y_in/z_in): logp/mu/sigma describe
        # round(y), so the residual panels must not carry +-0.5 of
        # quantization error from the pre-round y
        y_c = np.asarray(out.get("y_in", out["y"]))[0, :, :, c]
        bits_y = -logp_y[:, :, c] / math.log(2.0)
        bits_z = -logp_z[:, :, cz] / math.log(2.0)
        hyper_row = [(f"hyper z[{cz}]",
                      np.asarray(out.get("z_in", out["z"]))[0, :, :, cz]),
                     (f"hyper bits[{cz}]", bits_z)]

        if "mu" in out and "sigma" in out:
            mu = np.asarray(out["mu"])[0, :, :, c]
            sigma = np.asarray(out["sigma"])[0, :, :, c]
            rows = [[("input", np.asarray(img)[0]),
                     (f"y[{c}]", y_c),
                     ("mu", mu),
                     ("sigma", sigma),
                     ("(y-mu)/sigma", (y_c - mu) / (sigma + 1e-12)),
                     (f"bits[{c}]", bits_y)] + hyper_row]
        elif "weights" in out:
            w = np.asarray(out["weights"])[0, :, :, :, c]   # (H, W, K)
            mus = np.asarray(out["mus"])[0, :, :, :, c]
            sigmas = np.asarray(out["sigmas"])[0, :, :, :, c]
            mix_mu = (w * mus).sum(axis=-1)
            mix_var = (w * (sigmas ** 2 + mus ** 2)).sum(axis=-1) - mix_mu ** 2
            mix_sigma = np.sqrt(np.clip(mix_var, 1e-9, None))
            rows = [[(f"w[{k}]", w[:, :, k]),
                     (f"mu[{k}]", mus[:, :, k]),
                     (f"sigma[{k}]", sigmas[:, :, k]),
                     (f"(y-mu[{k}])/sigma[{k}]",
                      (y_c - mus[:, :, k]) / (sigmas[:, :, k] + 1e-12)),
                     (f"y[{c}]", y_c)]
                    for k in range(w.shape[-1])]
            rows.append([("input", np.asarray(img)[0]),
                         ("mixture mu", mix_mu),
                         ("mixture sigma", mix_sigma),
                         ("(y-mix mu)/mix sigma", (y_c - mix_mu) / mix_sigma),
                         (f"bits[{c}]", bits_y)] + hyper_row)
        else:
            return None

        return render_panel_grid(
            rows, os.path.join(self.save_dir, f"high_entropy_channel_{idx}.png"),
            suptitle=f"busiest latent channel c={c}")

    def save_results(self, metrics: Dict[str, float], nb_steps: int, caption: str = ""):
        """Identical artifact format to Evaluator.py:235-242."""
        path = os.path.join(self.save_dir,
                            f"eval_results_{self.lambda_val}_lambda_" + caption + ".txt")
        with open(path, "w") as f:
            f.write(f"Lambda: {self.lambda_val}\n")
            f.write(f"Trained for: {nb_steps} steps\n")
            for k, v in metrics.items():
                f.write(f"{k}: {v:.6f}\n")
        print(f"Results saved to {path}")
        return path


class VisionCompressionEvaluator(CompressionEvaluator):
    """Scalable-model evaluator with per-layer bpp (Evaluator.py:245-493)."""

    def __init__(self, model, params, dataloader, lambda_val: float, gamma: float,
                 save_dir: str = "./eval_results"):
        super().__init__(model, params, dataloader, lambda_val, save_dir)
        self.gamma = gamma

    def evaluate(self, vision_rd_loss_fn: Optional[Callable] = None):
        loss_fn = vision_rd_loss_fn or default_vision_rd_loss
        total_metrics = []
        stats = {k: [] for k in ("bpp_y", "bpp_y1", "bpp_y2", "bpp_z",
                                 "bpp_total", "vision_mse")}
        imgs_list, recon_list = [], []

        model, lam, gamma = self.model, self.lambda_val, self.gamma

        @jax.jit
        def _step(params, imgs):  # one program per image (CLAUDE.md gotcha)
            out = model.apply({"params": params}, imgs, training=False)
            results = loss_fn(out, imgs, lam, gamma)
            recon = jnp.clip(out["x_hat"], 0.0, 1.0)
            scalars = dict(compute_metrics(imgs, recon))
            scalars.update({k: results[k] for k in stats})
            return recon, scalars

        for imgs in self.dataloader:
            recon, scalars = jax.device_get(_step(self.params,
                                                  jnp.asarray(imgs)))
            for k in stats:
                stats[k].append(float(scalars.pop(k)))
            total_metrics.append({k: float(v) for k, v in scalars.items()})
            imgs_list.append(np.asarray(imgs[0] if np.ndim(imgs) == 4 else imgs))
            recon_list.append(recon[0])

        if not total_metrics:
            raise ValueError("evaluation dataloader yielded no images "
                             "(empty/misnamed data_dir?)")
        avg = {k: float(np.mean([m[k] for m in total_metrics]))
               for k in total_metrics[0]}
        avg["BPP"] = float(np.mean(stats["bpp_total"]))        # fixed: true total
        avg["BPP(y)"] = float(np.mean(stats["bpp_y"]))
        avg["BPP(y1)"] = float(np.mean(stats["bpp_y1"]))
        avg["BPP(y2)"] = float(np.mean(stats["bpp_y2"]))
        avg["BPP(z)"] = float(np.mean(stats["bpp_z"]))
        avg["BPP(reference_reported)"] = avg["BPP(y)"]
        if any(v > 0 for v in stats["vision_mse"]):
            # only meaningful when a distillation-aware loss was supplied
            avg["VisionMSE"] = float(np.mean(stats["vision_mse"]))

        print("\n--- Evaluation Results ---")
        for k, v in avg.items():
            print(f"{k}: {v:.6f}")
        return avg, imgs_list, recon_list

    def plot_samples(self, imgs_list, recon_list, rd_loss_fn=None, n: int = 3,
                     seed: Optional[int] = None):
        loss_fn = rd_loss_fn or default_vision_rd_loss
        bound = lambda out, img, lam: loss_fn(out, img, lam, self.gamma)  # noqa: E731
        return super().plot_samples(imgs_list, recon_list, bound, n, seed)

    def plot_high_entropy_channel(self, imgs_list, latent_idx: int = 1,
                                  seed: Optional[int] = None):
        """Busiest-channel maps for one scalable layer — base (latent_idx=1)
        or enhancement (latent_idx=2) — with per-layer prediction-error
        panels (capability of Evaluator.py:354-483)."""
        rng = random.Random(seed)
        idx = rng.randint(0, len(imgs_list) - 1)
        img = jnp.asarray(imgs_list[idx])[None]
        out = self._forward(self.params, img)
        sfx = str(latent_idx)
        layer = "base" if latent_idx == 1 else "enh"

        logp = np.asarray(out["logp_y" + sfx])[0]
        c = self._busiest_channel(logp)
        y_c = np.asarray(out["y" + sfx])[0, :, :, c]
        bits = -logp[:, :, c] / math.log(2.0)
        logp_z = np.asarray(out["logp_z"])[0]
        cz = min(c, logp_z.shape[-1] - 1)
        hyper_panel = (f"hyper bits[{cz}]", -logp_z[:, :, cz] / math.log(2.0))

        if ("mu" + sfx) in out:
            mu = np.asarray(out["mu" + sfx])[0, :, :, c]
            sigma = np.asarray(out["sigma" + sfx])[0, :, :, c]
            rows = [[("input", np.asarray(img)[0]),
                     (f"{layer} y[{c}]", y_c),
                     (f"{layer} mu", mu),
                     (f"{layer} y-mu", y_c - mu),
                     (f"{layer} sigma", sigma),
                     (f"{layer} bits[{c}]", bits),
                     hyper_panel]]
        elif ("weights" + sfx) in out:
            w = np.asarray(out["weights" + sfx])[0, :, :, :, c]
            mus = np.asarray(out["mus" + sfx])[0, :, :, :, c]
            sigmas = np.asarray(out["sigmas" + sfx])[0, :, :, :, c]
            mix_mu = (w * mus).sum(axis=-1)
            mix_var = (w * (sigmas ** 2 + mus ** 2)).sum(axis=-1) - mix_mu ** 2
            mix_sigma = np.sqrt(np.clip(mix_var, 1e-9, None))
            rows = [[(f"{layer} w[{k}]", w[:, :, k]),
                     (f"{layer} mu[{k}]", mus[:, :, k]),
                     (f"{layer} y-mu[{k}]", y_c - mus[:, :, k]),
                     (f"{layer} sigma[{k}]", sigmas[:, :, k]),
                     (f"{layer} bits[{c}]", bits)]
                    for k in range(w.shape[-1])]
            rows.append([("input", np.asarray(img)[0]),
                         (f"{layer} mixture mu", mix_mu),
                         (f"{layer} mixture sigma", mix_sigma),
                         (f"{layer} y-mix mu", y_c - mix_mu),
                         hyper_panel])
        else:
            return None

        return render_panel_grid(
            rows,
            os.path.join(self.save_dir,
                         f"high_entropy_channel_layer{latent_idx}_{idx}.png"),
            suptitle=f"{layer} layer, busiest channel c={c}")
