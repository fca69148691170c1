"""Round-5 probe: ring-kNN tile sweep, motivated by the roofline numbers
(probe_r5_knn_roofline.py: extraction-bound at 6.88 steps/visited chunk —
the while loop runs to the MAX per-column emission count, so narrower
query tiles should cut the column-max waste and tighten ring centers,
at the cost of more grid steps)."""

import json

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pytorch_points_tpu.kernels import topk_scan
    from pytorch_points_tpu.utils.benchmark import measure

    rng = np.random.default_rng(0)
    B, N, K = 16, 16384, 16
    x = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)), jnp.float32)

    out = {}
    for tq, tm in ((512, 512), (256, 512), (128, 512), (256, 1024),
                   (512, 256), (1024, 512)):
        f = jax.jit(
            lambda a, tq=tq, tm=tm: topk_scan.knn_ring(a, a, K, tq=tq, tm=tm)
        )
        try:
            out[f"tq{tq}_tm{tm}_ms"] = round(measure(f, x, repeats=3) * 1e3, 2)
        except Exception as e:  # noqa: BLE001 — sweep must survive a bad cfg
            out[f"tq{tq}_tm{tm}_ms"] = f"ERR {type(e).__name__}"
        print(json.dumps(out))


if __name__ == "__main__":
    main()
