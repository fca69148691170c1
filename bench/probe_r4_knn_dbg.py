"""Debug the at-scale ring-vs-stream kNN mismatch (tests/test_kernels.py::
test_knn_ring_bitwise_vs_stream_at_scale failed on v5e).

Reports: how many (query, slot) entries differ, whether distances or only
indices differ, the mismatch positions' distance gaps, and which support
chunks the wrong/right indices live in (Morton-sorted space) — to
discriminate AABB-skip unsoundness vs tie-ordering vs miscompile.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp

cache = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from pytorch_points_tpu.kernels import topk_scan, nn_sorted


def main():
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (4, 16384, 3)).astype(np.float32)
    x[:, 1000:1128] = x[:, :128]
    xs = jnp.asarray(x)
    d1, i1 = jax.jit(lambda a: topk_scan.knn(a, a, 16, sorted_ok=False))(xs)
    d2, i2 = jax.jit(lambda a: topk_scan.knn_ring(a, a, 16))(xs)
    d1, i1, d2, i2 = map(np.asarray, (d1, i1, d2, i2))
    dm = d1 != d2
    im = i1 != i2
    print("dist mismatches:", dm.sum(), "index mismatches:", im.sum(),
          "of", d1.size)
    bad = np.argwhere(im | dm)
    if len(bad) == 0:
        print("no mismatch?! (rerun of the test scenario)")
        return
    print("first 20 mismatches (b, q, slot): stream (d,i) vs ring (d,i)")
    for b, q, s in bad[:20]:
        print(f"  b={b} q={q} s={s}: stream d={d1[b,q,s]:.9g} i={i1[b,q,s]}"
              f" | ring d={d2[b,q,s]:.9g} i={i2[b,q,s]}")
    # which queries are affected, and are the wrong entries ties?
    qs_aff = np.unique(bad[:, :2], axis=0)
    print("affected (b,q) count:", len(qs_aff))
    # adjudicate with a numpy oracle on affected queries only: which
    # kernel breaks ties (lowest index) correctly?
    stream_wrong = ring_wrong = 0
    for b, q in qs_aff[:200]:
        dd = ((x[b] - x[b, q][None, :]) ** 2).sum(-1)
        order = np.lexsort((np.arange(len(dd)), dd))[:16]
        ref = order[np.lexsort((order, dd[order]))]  # (d, id) ascending
        s_ok = np.array_equal(i1[b, q], ref)
        r_ok = np.array_equal(i2[b, q], ref)
        stream_wrong += not s_ok
        ring_wrong += not r_ok
        if not s_ok and not r_ok:
            print(f"  BOTH wrong at b={b} q={q}: ref={ref},"
                  f" stream={i1[b,q]}, ring={i2[b,q]}")
    print(f"of {min(len(qs_aff),200)} adjudicated: stream wrong"
          f" {stream_wrong}, ring wrong {ring_wrong}")
    # where do the differing support ids live in Morton-sorted space?
    ss, perm_s = nn_sorted.sort_by_morton(xs)
    perm_s = np.asarray(perm_s)  # sorted pos -> orig id
    inv = np.zeros_like(perm_s)
    for b in range(4):
        inv[b, perm_s[b]] = np.arange(perm_s.shape[1])
    for b, q, s in bad[:10]:
        c1 = inv[b, i1[b, q, s]] // 512
        c2 = inv[b, i2[b, q, s]] // 512 if i2[b, q, s] < 16384 else -1
        qc = inv[b, q] // 512  # query's own sorted chunk (self-point)
        print(f"  b={b} q={q}: stream id chunk {c1}, ring id chunk {c2},"
              f" query chunk {qc}")


if __name__ == "__main__":
    main()
