"""Serving-layer throughput on the real chip: how much of the device bench
rate (bench.py: LTT fw_final ~2625 expl/s @B384) survives the production
path — host-side slab packing, per-slab host->device input transfer, the
MicroBatcher dispatcher, and the device->host result fetch?

Context that frames every number here: the remote-TPU tunnel's host->device
link measures ~47 MB/s (probe in this file, --probe).  A 224x224x3 f32
image is 602 KB, so f32 image serving is LINK-bound at ~78 img/s on this
setup no matter what the chip does; uint8 wire rows (dequantized on device,
serve.py images_u8) raise that 4x to ~313.  On a real v5e host (PCIe,
GB/s) the same protocols are chip-bound — protocol A is the number that
transfers.

Protocols (same flagship LTT ViT-B executable, one process):
  A. device-resident async loop (bench.py protocol) — the chip ceiling;
  B. sync per-slab loop, fresh f32 host input + full result fetch — naive
     server, link-bound here;
  C. MicroBatcher depth=2, 24 concurrent f32 clients — the serve.py path;
  D. same but uint8 wire rows — the link-optimal serve.py path.

Run on TPU:  python playground/bench_serve.py [batch]
             python playground/bench_serve.py --probe   # link bandwidth
"""

import os
import sys
import threading
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("AUTOGNOTHI_INT8", "1")

import numpy as np


def probe_link():
    import jax.numpy as jnp

    for mb in (1, 8, 64):
        x = np.random.RandomState(0).randn(mb * 262144).astype(np.float32)
        d = jnp.asarray(x)
        float(np.asarray(jnp.sum(d)))
        t0 = time.perf_counter()
        d = jnp.asarray(x)
        float(np.asarray(jnp.sum(d)))
        dt = time.perf_counter() - t0
        print(f"H2D {mb:3d} MB: {dt*1e3:8.1f} ms  {mb/dt:7.1f} MB/s",
              flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from autognothi_tpu.models.common import cast_tree
    from autognothi_tpu.models.ltt_vit import init_ltt_vit_final
    from autognothi_tpu.pipeline.batching import MicroBatcher, run_concurrent
    from autognothi_tpu.recipes.ltt_vit import fw_final
    from __graft_entry__ import _flagship_ltt_cfg

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 384
    t_start = time.perf_counter()

    cfg = _flagship_ltt_cfg()
    params = cast_tree(init_ltt_vit_final(jax.random.PRNGKey(0), cfg),
                       jnp.bfloat16)
    print(f"[{time.perf_counter()-t_start:6.1f}s] params built", flush=True)

    def fw(p, xs):
        probs, attr = fw_final(cfg, p, xs.astype(jnp.bfloat16))
        return probs.astype(jnp.float32), attr.astype(jnp.float32)

    run = jax.jit(fw)
    run_u8 = jax.jit(
        lambda p, xs: fw(p, xs.astype(jnp.float32) * (1.0 / 255.0)))

    host_x = np.asarray(
        np.random.RandomState(1).randn(batch, 3, 224, 224), np.float32)
    host_u8 = ((host_x - host_x.min())
               / (np.ptp(host_x) + 1e-9) * 255).astype(np.uint8)
    img_mb = host_x[0].nbytes / 1e6

    def fence(x):
        return float(np.asarray(jnp.sum(x)))

    dev_x = jnp.asarray(host_x)
    print(f"[{time.perf_counter()-t_start:6.1f}s] inputs on device "
          f"({host_x.nbytes/1e6:.0f} MB f32 slab)", flush=True)

    # tunnel: the first ~5-8 chained execs of a new executable are slow
    for i in range(8):
        probs, attr = run(params, dev_x)
        fence(probs)
    print(f"[{time.perf_counter()-t_start:6.1f}s] f32 exec warmed", flush=True)
    probs, attr = run_u8(params, jnp.asarray(host_u8))
    fence(probs)
    print(f"[{time.perf_counter()-t_start:6.1f}s] u8 exec compiled", flush=True)

    # --- A: device-resident async loop (bench.py protocol) ---
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        probs, attr = run(params, dev_x)
    fence(probs)
    rate_a = batch * iters / (time.perf_counter() - t0)
    print(f"A device-resident async : {rate_a:8.1f} expl/s", flush=True)

    # --- B: fresh f32 host input + full result fetch each slab ---
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        probs, attr = run(params, jnp.asarray(host_x))
        np.asarray(probs), np.asarray(attr)
    rate_b = batch * iters / (time.perf_counter() - t0)
    print(f"B sync f32 H2D+fetch    : {rate_b:8.1f} expl/s "
          f"(link ceiling ~{47.0/img_mb:.0f})", flush=True)

    # --- C/D: MicroBatcher under sustained concurrent demand (no global
    # barrier: 24 clients x batch/8 rows keeps ~3 slabs of rows queued). ---
    def run_slab(slab):
        r = run_u8 if slab.dtype == np.uint8 else run
        return r(params, jnp.asarray(slab))

    n_clients, rows, per_client = 24, batch // 8, 2

    for label, src, ceiling in (
        ("C batcher f32 depth=2  ", host_x, 47.0 / img_mb),
        ("D batcher u8  depth=2  ", host_u8, 4 * 47.0 / img_mb),
    ):
        b = MicroBatcher(run_slab, batch, window_s=0.05, depth=2)
        run_concurrent(b, [src[:rows]] * 4)  # warm the path
        base = b.slab_count

        def client(i, src=src, b=b):
            lo = (i * rows) % batch
            xs = src[lo:lo + rows]
            for _ in range(per_client):
                b.submit(xs)

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(n_clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        total_rows = n_clients * rows * per_client
        rate = total_rows / (time.perf_counter() - t0)
        slabs = b.slab_count - base
        lat = b.stats()["latency"]  # the /statz cell, here measured on HW
        b.close()
        print(f"{label}: {rate:8.1f} expl/s  ({slabs} slabs, "
              f"link ceiling ~{ceiling:.0f})  "
              f"latency p50 {lat['p50_s'] * 1e3:.1f} / p95 "
              f"{lat['p95_s'] * 1e3:.1f} / p99 {lat['p99_s'] * 1e3:.1f} ms",
              flush=True)

    print(f"A is the chip ceiling ({rate_a:.0f}); B-D are link-bound on "
          f"this tunnel — on a PCIe-attached host they track A.", flush=True)


if __name__ == "__main__":
    if "--probe" in sys.argv:
        probe_link()
    else:
        main()
