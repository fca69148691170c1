"""Round-5 probe: roofline accountability for the Morton-ring kNN kernel
(VERDICT r4 item 3 / weak item 3) + the masked ring path's first timing.

Config-6 shape (B=16, N=16k, k=16).  Quantifies, like chamfer's
visit-rate numbers, where the kernel's time goes:

  * scan floor: visit_rate x (dense pair-distance work at the dense
    chamfer kernel's measured VPU rate — the library's reference
    element rate, BASELINE.md anchors);
  * extraction cost: steps_per_visit x ~5 [tm, tq] plane passes per
    emission step (threshold compare, masked min, argmin-where, buffer
    insert) — the data-dependent part a pure pair-scan bound ignores.

Also times: ring vs stream on unmasked clouds, and ring_masked vs stream
on 75%-valid poisoned clouds (the round-4 gap: masked supports always
paid the stream kernel).
"""

import json

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pytorch_points_tpu.core.masking import poison_points
    from pytorch_points_tpu.kernels import topk_scan
    from pytorch_points_tpu.utils.benchmark import measure

    rng = np.random.default_rng(0)
    B, N, K = 16, 16384, 16
    x = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)), jnp.float32)

    out = {}

    f_ring = jax.jit(lambda a: topk_scan.knn_ring(a, a, K))
    f_stream = jax.jit(lambda a: topk_scan.knn(a, a, K, sorted_ok=False))
    out["ring_ms"] = round(measure(f_ring, x, repeats=3) * 1e3, 2)
    out["stream_ms"] = round(measure(f_stream, x, repeats=3) * 1e3, 2)

    _, _, st = topk_scan.knn_ring_stats(x, x, K)
    out["visit_rate"] = round(st["visit_rate"], 4)
    out["visits_per_tile"] = round(st["visits_per_tile"], 1)
    out["chunks"] = st["chunks"]
    out["trips_per_visit"] = round(st["trips_per_visit"], 2)
    out["steps_per_visit"] = round(st["steps_per_visit"], 2)

    # Bound math.  Dense chamfer rate (BASELINE.md anchor): 60.1 ms for
    # 2 x 32 x 16384^2 pair distances at B=32 -> 3.48 ms per 1e9 pairs.
    pairs = B * (N / 16384.0) ** 2 * 1e0  # in units of 16384^2
    dense_ms_per_unit = 60.1 / 64.0  # 64 such units in the dense run
    scan_all = pairs * dense_ms_per_unit
    out["dense_scan_all_chunks_ms"] = round(scan_all, 2)
    out["scan_floor_visited_ms"] = round(st["visit_rate"] * scan_all, 2)
    # each emission step re-reads the [tm, tq] plane ~5 times (compare,
    # mask, min, arg-where, insert); scan computes it once (3 fma passes)
    out["extraction_est_ms"] = round(
        st["visit_rate"] * scan_all * st["steps_per_visit"] * 5.0 / 3.0, 2
    )

    # masked: 75%-valid prefix masks (what BucketedBatcher emits)
    nv = int(N * 0.75)
    mask = jnp.zeros((B, N), bool).at[:, :nv].set(True)
    xp = poison_points(x, mask, sign=-1.0)
    f_rm = jax.jit(lambda a, b: topk_scan.knn_ring_masked(a, b, K))
    f_sm = jax.jit(lambda a, b: topk_scan.knn(a, b, K, sorted_ok=False))
    out["ring_masked_75pct_ms"] = round(measure(f_rm, x, xp, repeats=3) * 1e3, 2)
    out["stream_masked_75pct_ms"] = round(
        measure(f_sm, x, xp, repeats=3) * 1e3, 2
    )

    # correctness spot-check at this exact scale while we're here
    d1, i1 = f_rm(x, xp)
    d2, i2 = f_sm(x, xp)
    out["masked_bitwise"] = bool(
        np.array_equal(np.asarray(i1), np.asarray(i2))
        and np.array_equal(np.asarray(d1), np.asarray(d2))
    )

    print(json.dumps(out))


if __name__ == "__main__":
    main()
