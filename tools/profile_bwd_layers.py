"""Per-layer BACKWARD profile of the flagship transform stack.

profile_train.py locates the train/eval MFU gap at component granularity
(encoder/decoder dominate, bwd/fwd ~2.3-2.5 vs the theoretical 2.0); this
tool names the layer and the backward PATH. For every conv / deconv / GDN
in the flagship stack, at the training shape (batch 16, 256^2 patches),
it times four isolated jitted programs:

    fwd            the layer alone
    fwd+dx         + gradient w.r.t. the INPUT  (the dx conv)
    fwd+dw         + gradient w.r.t. the WEIGHTS (the filter-grad conv)
    fwd+dx+dw      the full backward

and reports effective TF/s per path against the analytic FLOPs (conv dx
and dw each cost the forward's FLOPs; GDN backward costs ~2x its forward
matmul). The top backward sink is the layer x path with the largest
absolute excess over its forward-rate ideal — the number the DESIGN.md
roofline section quotes.

Run detached on the chip (one TPU process at a time — CLAUDE.md):
  PYTHONPATH=.:/root/.axon_site python -u tools/profile_bwd_layers.py
Env: NIC_PROFILE_M (default 128), NIC_PROFILE_BATCH (default 16).
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from neural_image_compression_tpu.ops.conv import Conv2d, Deconv2d  # noqa: E402
from neural_image_compression_tpu.ops.gdn import GDN  # noqa: E402

M = int(os.environ.get("NIC_PROFILE_M", "128"))
B = int(os.environ.get("NIC_PROFILE_BATCH", "16"))
DT = jnp.bfloat16
PEAK_TFS = 197.0  # v5e bf16


REPEATS = int(os.environ.get("NIC_PROFILE_REPEATS", "1000"))


def t_prog(scalar_fn, variables, x):
    """Time `scalar_fn(variables, x) -> scalar` by folding REPEATS
    evaluations into ONE jitted fori_loop program — a single dispatch, so
    the ~25-30 ms tunnel round-trip and per-call jit dispatch cost are
    amortized to ~RTT/REPEATS (the per-call scheme produced negative
    differences: dispatch noise exceeded sub-5-ms layer times, and
    REPEATS=30 still left a ~1 ms/iter RTT floor that swamped sub-ms
    layers — hence the 1000 default). The loop body perturbs x by i*1e-12
    so XLA cannot hoist the computation out of the loop. Median of 3
    timed runs."""

    @jax.jit
    def run(p, v):
        def body(i, acc):
            return acc + scalar_fn(p, v + jnp.float32(i) * 1e-12)
        return jax.lax.fori_loop(0, REPEATS, body, jnp.float32(0.0))

    _ = float(run(variables, x))  # compile + warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(variables, x)
        _ = float(out)  # host fetch = completion barrier
        ts.append((time.perf_counter() - t0) / REPEATS)
    return sorted(ts)[1]


def profile_layer(name, module, x_shape, gflop_fwd, gflop_dx, gflop_dw,
                  training_arg=False):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, x_shape, jnp.float32)
    if training_arg:
        variables = module.init(key, x, True)
        fn = lambda p, v: module.apply(p, v, True).astype(jnp.float32).sum()
    else:
        variables = module.init(key, x)
        fn = lambda p, v: module.apply(p, v).astype(jnp.float32).sum()

    def _sumg(t):
        return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(t))

    f = fn
    f_dx = lambda p, v: fn(p, v) + _sumg(jax.grad(fn, argnums=1)(p, v))
    f_dw = lambda p, v: fn(p, v) + _sumg(jax.grad(fn, argnums=0)(p, v))
    f_all = (lambda p, v: fn(p, v)
             + _sumg(jax.grad(fn, argnums=(0, 1))(p, v)))

    tf = t_prog(f, variables, x)
    tdx = t_prog(f_dx, variables, x)
    tdw = t_prog(f_dw, variables, x)
    tall = t_prog(f_all, variables, x)

    def tfs(gf, dt):
        return gf / max(dt, 1e-9) / 1e3

    row = {
        "layer": name,
        "fwd_ms": tf * 1e3, "fwd_tfs": tfs(gflop_fwd, tf),
        "dx_ms": (tdx - tf) * 1e3, "dx_tfs": tfs(gflop_dx, tdx - tf),
        "dw_ms": (tdw - tf) * 1e3, "dw_tfs": tfs(gflop_dw, tdw - tf),
        "full_ms": tall * 1e3,
        "bwd_over_fwd": (tall - tf) / max(tf, 1e-9),
        # excess of the measured backward over "backward at the forward's
        # rate" — the quantity whose per-layer sum explains the step-level
        # bwd/fwd ratio exceeding 2.0
        "excess_ms": (tall - tf) * 1e3 - (gflop_dx + gflop_dw)
                     / max(gflop_fwd, 1e-9) * tf * 1e3,
    }
    print(f"{name:18s} fwd {row['fwd_ms']:6.2f} ms {row['fwd_tfs']:6.1f} TF/s"
          f" | dx {row['dx_ms']:6.2f} ms {row['dx_tfs']:6.1f}"
          f" | dw {row['dw_ms']:6.2f} ms {row['dw_tfs']:6.1f}"
          f" | bwd/fwd {row['bwd_over_fwd']:4.2f}"
          f" | excess {row['excess_ms']:+6.2f} ms", flush=True)
    return row


def conv_gf(k, cin, cout, hout, wout):
    return 2.0 * k * k * cin * cout * hout * wout * B / 1e9


def main():
    rows = []

    def conv(name, cin, cout, side, k=5, s=2):
        gf = conv_gf(k, cin, cout, side // s, side // s)
        rows.append(profile_layer(
            name, Conv2d(cout, k, s, k // 2, dtype=DT), (B, side, side, cin),
            gf, gf, gf))

    def deconv(name, cin, cout, side, k=5, s=2):
        gf = conv_gf(k, cin, cout, side, side)  # MACs ride the INPUT grid
        rows.append(profile_layer(
            name, Deconv2d(cout, k, s, k // 2, s - 1, dtype=DT),
            (B, side, side, cin), gf, gf, gf, training_arg=True))

    def gdn(name, c, side, inverse=False):
        gf = 2.0 * c * c * side * side * B / 1e9
        rows.append(profile_layer(
            name, GDN(inverse=inverse, dtype=DT), (B, side, side, c),
            gf, 2 * gf, 2 * gf))  # bwd = dgamma matmul + dx matmul

    print(f"-- per-layer fwd/dx/dw profile (M={M}, batch={B}, bf16, "
          f"256^2 train patches) --", flush=True)
    conv("enc0 3>M @256", 3, M, 256)
    gdn("gdn @128", M, 128)
    conv("enc1 M>M @128", M, M, 128)
    gdn("gdn @64", M, 64)
    conv("enc2 M>M @64", M, M, 64)
    gdn("gdn @32", M, 32)
    conv("enc3 M>M @32", M, M, 32)
    deconv("dec0 M>M @16", M, M, 16)
    gdn("igdn @32", M, 32, inverse=True)
    deconv("dec1 M>M @32", M, M, 32)
    deconv("dec2 M>M @64", M, M, 64)
    gdn("igdn @128", M, 128, inverse=True)
    deconv("dec3 M>3 @128", M, 3, 128)
    conv("hyp_enc M>M @16", M, M, 16)
    deconv("hyp_dec M>1.5M @8", M, int(1.5 * M), 8)

    tot_f = sum(r["fwd_ms"] for r in rows)
    tot_b = sum(r["full_ms"] - r["fwd_ms"] for r in rows)
    top = max(rows, key=lambda r: r["excess_ms"])
    print(f"\nsum fwd {tot_f:.1f} ms, sum bwd {tot_b:.1f} ms, "
          f"bwd/fwd {tot_b / tot_f:.2f}")
    print(f"top backward sink: {top['layer']} "
          f"(excess {top['excess_ms']:+.2f} ms over forward-rate ideal; "
          f"dx {top['dx_tfs']:.1f} TF/s, dw {top['dw_tfs']:.1f} TF/s, "
          f"fwd {top['fwd_tfs']:.1f} TF/s)")
    print(f"peak {PEAK_TFS:.0f} TF/s bf16; forward-rate-ideal bwd/fwd for "
          f"convs is 2.0 (dx+dw each cost the fwd FLOPs), GDN ~2.0")


if __name__ == "__main__":
    main()
