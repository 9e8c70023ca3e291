"""Serving-layer throughput on the real chip: how much of the device bench
rate (bench.py: LTT fw_final ~2625 expl/s @B384) survives the production
path — host-side slab packing, per-slab host->device input transfer, the
MicroBatcher dispatcher, and the device->host result fetch?

Protocols measured (same executable, one process, flagship LTT ViT-B dims):
  A. device-resident async loop (bench.py protocol) — the device ceiling;
  B. sync per-slab loop with a FRESH host input each step (launch + fetch
     every slab) — a naive server;
  C. MicroBatcher depth=1, 8 client threads submitting 48-row requests;
  D. MicroBatcher depth=3 (pipelined fetch: completer pays the device->host
     transfer while the dispatcher launches the next slab).

Run on TPU:  python playground/bench_serve.py [batch]
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("AUTOGNOTHI_INT8", "1")

import jax
import jax.numpy as jnp
import numpy as np

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 384
WARM_CHAIN = 8   # tunnel: first ~5-8 chained execs of an executable are slow
ITERS = 20


def main():
    from autognothi_tpu.models.common import cast_tree
    from autognothi_tpu.models.ltt_vit import init_ltt_vit_final
    from autognothi_tpu.pipeline.batching import MicroBatcher, run_concurrent
    from autognothi_tpu.recipes.ltt_vit import fw_final
    from __graft_entry__ import _flagship_ltt_cfg

    cfg = _flagship_ltt_cfg()
    params = cast_tree(init_ltt_vit_final(jax.random.PRNGKey(0), cfg),
                       jnp.bfloat16)

    def fw(p, xs):
        probs, attr = fw_final(cfg, p, xs.astype(jnp.bfloat16))
        return probs.astype(jnp.float32), attr.astype(jnp.float32)

    run = jax.jit(fw)

    host_x = np.asarray(
        np.random.RandomState(1).randn(BATCH, 3, 224, 224), np.float32)
    dev_x = jnp.asarray(host_x)

    def fence(x):
        return float(np.asarray(jnp.sum(x)))

    # chained warmup: feed a cheap scalar of the output back into timing
    for _ in range(WARM_CHAIN):
        probs, attr = run(params, dev_x)
        fence(probs)

    # --- A: device-resident async loop (bench.py protocol) ---
    t0 = time.perf_counter()
    for _ in range(ITERS):
        probs, attr = run(params, dev_x)
    fence(probs)
    rate_a = BATCH * ITERS / (time.perf_counter() - t0)
    print(f"A device-resident async : {rate_a:8.1f} expl/s", flush=True)

    # --- B: fresh host input + full result fetch each slab (naive server) ---
    t0 = time.perf_counter()
    for _ in range(ITERS):
        probs, attr = run(params, jnp.asarray(host_x))
        np.asarray(probs), np.asarray(attr)
    rate_b = BATCH * ITERS / (time.perf_counter() - t0)
    print(f"B sync H2D+fetch loop   : {rate_b:8.1f} expl/s", flush=True)

    # --- C/D: MicroBatcher under sustained concurrent demand.  Clients
    # loop independently (no global barrier) so multiple slabs of demand
    # are pending at once and depth>1 can actually overlap fetch/launch:
    # 24 clients x BATCH/8 rows keeps ~3 slabs of rows in the queue. ---
    import threading

    def run_slab(slab):
        return run(params, jnp.asarray(slab))

    n_clients, rows = 24, BATCH // 8
    per_client = max(2, ITERS // 3)

    for label, depth in (("C batcher depth=1     ", 1),
                         ("D batcher depth=3 pipe", 3)):
        b = MicroBatcher(run_slab, BATCH, window_s=0.05, depth=depth)
        run_concurrent(b, [host_x[:rows]] * n_clients)  # warm the path
        base = b.slab_count

        def client(i):
            xs = host_x[(i * rows) % BATCH:(i * rows) % BATCH + rows]
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
        b.close()
        print(f"{label}: {rate:8.1f} expl/s  ({slabs} slabs for "
              f"{total_rows} rows)", flush=True)

    print(f"A is the device ceiling; B/C/D show what the serving layer "
          f"keeps of {rate_a:.0f}", flush=True)


if __name__ == "__main__":
    main()
