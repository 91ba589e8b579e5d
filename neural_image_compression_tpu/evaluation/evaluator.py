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

        for imgs in self.dataloader:
            imgs = jnp.asarray(imgs)
            out = self._forward(self.params, imgs)
            results = rd_loss_fn(out, imgs, self.lambda_val)
            bpp_y_values.append(float(results["bpp_y"]))
            bpp_z_values.append(float(results["bpp_z"]))
            bpp_total_values.append(float(results["bpp_total"]))
            recon = jnp.clip(out["x_hat"], 0.0, 1.0)
            metrics = compute_metrics(imgs, recon)
            total_metrics.append({k: float(v) for k, v in metrics.items()})
            imgs_list.append(np.asarray(imgs[0]))
            recon_list.append(np.asarray(recon[0]))

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

    def evaluate_codec(self, codec, **compress_kwargs) -> Dict[str, float]:
        """Real-bitstream evaluation: compress -> decompress every image with
        the given codec and report measured bpp (actual bytes on the wire)
        next to the analytic rate, plus distortion of the decoded output.
        The reference cannot do this — it has no bitstream (SURVEY §2 #29).
        compress_kwargs forward to codec.compress (e.g. n_streams=8)."""
        total_metrics = []
        real_bpps, analytic_bpps = [], []
        for imgs in self.dataloader:
            imgs = np.asarray(imgs)
            h, w = imgs.shape[1:3]
            data = codec.compress(imgs[:1], **compress_kwargs)
            x_hat = codec.decompress(data)
            real_bpps.append(len(data) * 8.0 / (h * w))
            out = self._forward(self.params, jnp.asarray(imgs))
            # analytic rate from whatever logp_* streams the model family has
            # (joint: logp_y + logp_z; scalable: logp_y1 + logp_y2 + logp_z)
            bits = sum(float(-jnp.sum(v)) for k, v in out.items()
                       if k.startswith("logp_"))
            analytic_bpps.append(bits / math.log(2.0) / (h * w))
            metrics = compute_metrics(jnp.asarray(imgs), jnp.asarray(x_hat))
            total_metrics.append({k: float(v) for k, v in metrics.items()})

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
    def plot_samples(self, imgs_list, recon_list, rd_loss_fn=None, n: int = 3,
                     seed: Optional[int] = None):
        """Side-by-side original/reconstruction figures with byte/bpp captions
        (Evaluator.py:94-116); saved to save_dir."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        rd_loss_fn = rd_loss_fn or default_rd_loss
        rng = random.Random(seed)
        indices = rng.sample(range(len(imgs_list)), min(n, len(imgs_list)))
        paths = []
        for idx in indices:
            img = jnp.asarray(imgs_list[idx])[None]
            out = self._forward(self.params, img)
            results = rd_loss_fn(out, img, self.lambda_val)
            bpp = float(results["bpp_total"])
            nbytes = math.ceil(float(results["bits_total"]) / 8)

            fig = plt.figure(figsize=(8, 4))
            plt.subplot(1, 2, 1)
            plt.imshow(imgs_list[idx])
            plt.title("Original")
            plt.axis("off")
            plt.subplot(1, 2, 2)
            plt.imshow(recon_list[idx])
            plt.title(f"Reconstructed: {nbytes} bytes ({bpp:.4f} bit/px)")
            plt.axis("off")
            path = os.path.join(self.save_dir, f"sample_{idx}.png")
            fig.savefig(path, dpi=100, bbox_inches="tight")
            plt.close(fig)
            paths.append(path)
        return paths

    def plot_high_entropy_channel(self, imgs_list, seed: Optional[int] = None):
        """Latent / entropy-parameter maps for the highest-entropy channel
        (Evaluator.py:118-232), K=1 and K>1 layouts; saved to save_dir."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        rng = random.Random(seed)
        idx = rng.randint(0, len(imgs_list) - 1)
        img = jnp.asarray(imgs_list[idx])[None]
        out = self._forward(self.params, img)

        latents = np.asarray(out["y"])[0]          # (H, W, C)
        logp_y = np.asarray(out["logp_y"])[0]
        logp_z = np.asarray(out["logp_z"])[0]
        hyper_latents = np.asarray(out["z"])[0]
        # highest-entropy channel: argmin of mean logp (Evaluator.py:135-137)
        high_c = int(logp_y.reshape(-1, logp_y.shape[-1]).mean(axis=0).argmin())
        high_cz = int(logp_z.reshape(-1, logp_z.shape[-1]).mean(axis=0).argmin())
        latent_entropy = -logp_y[:, :, high_c] / math.log(2.0)
        hyper_entropy = -logp_z[:, :, high_cz] / math.log(2.0)

        if "mu" in out and "sigma" in out:
            mean = np.asarray(out["mu"])[0, :, :, high_c]
            scale = np.asarray(out["sigma"])[0, :, :, high_c]
            latent = latents[:, :, high_c]
            maps = [
                ("Original", np.asarray(img)[0]),
                ("Latent", normalize_map(latent)),
                ("Predicted Mean", normalize_map(mean)),
                ("Predicted Scale", normalize_map(scale)),
                ("Normalized Latent", normalize_map((latent - mean) / (scale + 1e-12))),
                ("Latent Entropy", normalize_map(latent_entropy)),
                ("Hyper Latent", hyper_latents[:, :, high_cz]),
                ("Hyper Entropy", hyper_entropy),
            ]
            fig, axes = plt.subplots(1, len(maps), figsize=(3 * len(maps), 3))
            for ax, (title, data) in zip(axes, maps):
                if title == "Original":
                    ax.imshow(data)
                else:
                    im = ax.imshow(data, cmap="viridis")
                    fig.colorbar(im, ax=ax, fraction=0.046, pad=0.04)
                ax.set_title(title)
                ax.axis("off")
        elif "weights" in out:
            weights = np.asarray(out["weights"])[0, :, :, :, high_c]  # (H, W, K)
            mus = np.asarray(out["mus"])[0, :, :, :, high_c]
            sigmas = np.asarray(out["sigmas"])[0, :, :, :, high_c]
            latent = latents[:, :, high_c]
            K = weights.shape[-1]
            fig, axes = plt.subplots(K + 1, 6, figsize=(18, 3 * (K + 1)))
            for k in range(K):
                norm_latent = (latent - mus[:, :, k]) / (sigmas[:, :, k] + 1e-12)
                maps = [
                    (f"Comp {k} Weight", normalize_map(weights[:, :, k])),
                    (f"Comp {k} Mean", normalize_map(mus[:, :, k])),
                    (f"Comp {k} Sigma", normalize_map(sigmas[:, :, k])),
                    (f"Comp {k} Norm Latent", normalize_map(norm_latent)),
                    ("Latent", normalize_map(latent)),
                    ("Hyper Latent", normalize_map(hyper_latents[:, :, high_cz])),
                ]
                for ax, (title, data) in zip(axes[k], maps):
                    im = ax.imshow(data, cmap="viridis")
                    fig.colorbar(im, ax=ax, fraction=0.046, pad=0.04)
                    ax.set_title(title)
                    ax.axis("off")
            mixture_mean = (weights * mus).sum(axis=-1)
            mixture_var = (weights * (sigmas ** 2 + mus ** 2)).sum(axis=-1) - mixture_mean ** 2
            mixture_sigma = np.sqrt(np.clip(mixture_var, 1e-9, None))
            maps = [
                ("Original", np.asarray(img)[0]),
                ("Mixture Mean", normalize_map(mixture_mean)),
                ("Mixture Sigma", normalize_map(mixture_sigma)),
                ("Mixture Norm", normalize_map((latent - mixture_mean) / mixture_sigma)),
                ("Latent Entropy", latent_entropy),
                ("Hyper Entropy", hyper_entropy),
            ]
            for ax, (title, data) in zip(axes[K], maps):
                if title == "Original":
                    ax.imshow(data)
                else:
                    im = ax.imshow(data, cmap="viridis")
                    fig.colorbar(im, ax=ax, fraction=0.046, pad=0.04)
                ax.set_title(title)
                ax.axis("off")
            plt.tight_layout()
        else:
            return None

        path = os.path.join(self.save_dir, f"high_entropy_channel_{idx}.png")
        fig.savefig(path, dpi=100, bbox_inches="tight")
        plt.close(fig)
        return path

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
        stats = {k: [] for k in ("bpp_y", "bpp_y1", "bpp_y2", "bpp_z", "bpp_total")}
        imgs_list, recon_list = [], []

        for imgs in self.dataloader:
            imgs = jnp.asarray(imgs)
            out = self._forward(self.params, imgs)
            results = loss_fn(out, imgs, self.lambda_val, self.gamma)
            for k in stats:
                stats[k].append(float(results[k]))
            recon = jnp.clip(out["x_hat"], 0.0, 1.0)
            metrics = compute_metrics(imgs, recon)
            total_metrics.append({k: float(v) for k, v in metrics.items()})
            imgs_list.append(np.asarray(imgs[0]))
            recon_list.append(np.asarray(recon[0]))

        avg = {k: float(np.mean([m[k] for m in total_metrics]))
               for k in total_metrics[0]}
        avg["BPP"] = float(np.mean(stats["bpp_total"]))        # fixed: true total
        avg["BPP(y)"] = float(np.mean(stats["bpp_y"]))
        avg["BPP(y1)"] = float(np.mean(stats["bpp_y1"]))
        avg["BPP(y2)"] = float(np.mean(stats["bpp_y2"]))
        avg["BPP(z)"] = float(np.mean(stats["bpp_z"]))
        avg["BPP(reference_reported)"] = avg["BPP(y)"]

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
        """Base (latent_idx=1) / enhancement (latent_idx=2) layer maps
        (Evaluator.py:354-483); saved to save_dir."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        rng = random.Random(seed)
        idx = rng.randint(0, len(imgs_list) - 1)
        img = jnp.asarray(imgs_list[idx])[None]
        out = self._forward(self.params, img)
        sfx = str(latent_idx)
        layer_name = "Base" if latent_idx == 1 else "Enh."

        latents = np.asarray(out["y" + sfx])[0]
        entropy = -np.asarray(out["logp_y" + sfx])[0] / math.log(2.0)
        high_c = int(entropy.reshape(-1, entropy.shape[-1]).mean(axis=0).argmax())
        latent = latents[:, :, high_c]
        latent_entropy = entropy[:, :, high_c]
        logp_z = np.asarray(out["logp_z"])[0]
        hyper_entropy = -logp_z[:, :, min(high_c, logp_z.shape[-1] - 1)] / math.log(2.0)

        if ("mu" + sfx) in out:
            mean = np.asarray(out["mu" + sfx])[0, :, :, high_c]
            scale = np.asarray(out["sigma" + sfx])[0, :, :, high_c]
            maps = [
                ("Original", np.asarray(img)[0]),
                (f"{layer_name} Latent", latent),
                (f"Predicted {layer_name} Mean", mean),
                (f"{layer_name} Prediction Error", latent - mean),
                (f"Predicted {layer_name} Scale", scale),
                (f"Latent {layer_name} Entropy", latent_entropy),
                ("Hyper Entropy", hyper_entropy),
            ]
            fig, axes = plt.subplots(1, len(maps), figsize=(3 * len(maps), 3))
            for ax, (title, data) in zip(axes, maps):
                if title == "Original":
                    ax.imshow(data)
                else:
                    im = ax.imshow(data, cmap="viridis")
                    fig.colorbar(im, ax=ax, fraction=0.046, pad=0.04)
                ax.set_title(title)
                ax.axis("off")
        elif ("weights" + sfx) in out:
            weights = np.asarray(out["weights" + sfx])[0, :, :, :, high_c]
            mus = np.asarray(out["mus" + sfx])[0, :, :, :, high_c]
            sigmas = np.asarray(out["sigmas" + sfx])[0, :, :, :, high_c]
            K = weights.shape[-1]
            fig, axes = plt.subplots(K + 1, 6, figsize=(18, 3 * (K + 1)))
            for k in range(K):
                maps = [
                    (f"{layer_name} Comp {k} Weight", weights[:, :, k]),
                    (f"{layer_name} Comp {k} Mean", mus[:, :, k]),
                    (f"{layer_name} Comp {k} Pred Error", latent - mus[:, :, k]),
                    (f"{layer_name} Comp {k} Sigma", sigmas[:, :, k]),
                    (f"Latent {layer_name} Entropy", latent_entropy),
                    ("Hyper Entropy", hyper_entropy),
                ]
                for ax, (title, data) in zip(axes[k], maps):
                    im = ax.imshow(data, cmap="viridis")
                    fig.colorbar(im, ax=ax, fraction=0.046, pad=0.04)
                    ax.set_title(title)
                    ax.axis("off")
            mixture_mean = (weights * mus).sum(axis=-1)
            mixture_var = (weights * (sigmas ** 2 + mus ** 2)).sum(axis=-1) - mixture_mean ** 2
            mixture_sigma = np.sqrt(np.clip(mixture_var, 1e-9, None))
            maps = [
                ("Original", np.asarray(img)[0]),
                (f"{layer_name} Mixture Mean", mixture_mean),
                (f"{layer_name} Mixture Sigma", mixture_sigma),
                (f"{layer_name} Mixture Error", latent - mixture_mean),
                (f"Latent {layer_name} Entropy", latent_entropy),
                ("Hyper Entropy", hyper_entropy),
            ]
            for ax, (title, data) in zip(axes[K], maps):
                if title == "Original":
                    ax.imshow(data)
                else:
                    im = ax.imshow(data, cmap="viridis")
                    fig.colorbar(im, ax=ax, fraction=0.046, pad=0.04)
                ax.set_title(title)
                ax.axis("off")
            plt.tight_layout()
        else:
            return None

        path = os.path.join(self.save_dir,
                            f"high_entropy_channel_layer{latent_idx}_{idx}.png")
        fig.savefig(path, dpi=100, bbox_inches="tight")
        plt.close(fig)
        return path
