"""Round-5 probe: can COV/MMD-EMD run at a cheaper EMD operating point?
(VERDICT r4 item 7: config9's 7.8 s at G=R=64 is the most expensive
graded number; it uses the raw op's pop-768 fidelity point for 4,096
pair solves.)

Method: three synthetic "generators" of strictly ordered quality vs a
reference set (same distribution, +5% scale error, +15% scale + offset).
A usable metric operating point must (a) rank them identically to the
pop-768 default and (b) keep per-generator MMD within a few % of it.
Measured on the G=R=16 probe set (256 pair solves each), then the
winning point is timed at the graded G=R=64 scale.
"""

import json

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pytorch_points_tpu.losses import coverage_and_mmd
    from pytorch_points_tpu.utils.benchmark import measure

    rng = np.random.default_rng(3)
    N = 2048
    ref = jnp.asarray(rng.standard_normal((16, N, 3)), jnp.float32)
    gens = {
        "good": jnp.asarray(rng.standard_normal((16, N, 3)), jnp.float32),
        "mid": jnp.asarray(
            rng.standard_normal((16, N, 3)) * 1.05, jnp.float32
        ),
        "bad": jnp.asarray(
            rng.standard_normal((16, N, 3)) * 1.15 + 0.1, jnp.float32
        ),
    }
    points = {
        "pop768_default": None,
        "pop384": {"endgame_pop_cap": 384},
        "pop384_ph2": {"endgame_pop_cap": 384, "phases": 2, "max_iters": 12},
    }

    out = {}
    for pname, kw in points.items():
        f = jax.jit(
            lambda a, b, kw=kw: coverage_and_mmd(
                a, b, metric="emd", emd_kwargs=kw, pair_batch=64
            )
        )
        row = {}
        for gname, g in gens.items():
            cov, mmd = f(g, ref)
            row[gname] = {"cov": round(float(cov), 4),
                          "mmd": round(float(mmd), 5)}
        row["mmd_order_ok"] = (
            row["good"]["mmd"] < row["mid"]["mmd"] < row["bad"]["mmd"]
        )
        out[pname] = row

    # rankings identical across operating points?
    base = out["pop768_default"]
    for pname in ("pop384", "pop384_ph2"):
        r = out[pname]
        out[pname]["same_ranking_as_default"] = all(
            (r[a]["mmd"] < r[b]["mmd"]) == (base[a]["mmd"] < base[b]["mmd"])
            for a in gens for b in gens if a != b
        )
        out[pname]["mmd_rel_diff_pct"] = {
            g: round(100.0 * (r[g]["mmd"] - base[g]["mmd"])
                     / max(base[g]["mmd"], 1e-9), 2)
            for g in gens
        }

    # graded-scale timing of default vs the cheapest sane point
    g64 = jnp.asarray(rng.standard_normal((64, N, 3)), jnp.float32)
    r64 = jnp.asarray(rng.standard_normal((64, N, 3)) * 1.05, jnp.float32)
    for pname in ("pop768_default", "pop384", "pop384_ph2"):
        kw = points[pname]
        f64 = jax.jit(
            lambda a, b, kw=kw: coverage_and_mmd(
                a, b, metric="emd", emd_kwargs=kw, pair_batch=64
            )
        )
        out[f"time_G64_{pname}_ms"] = round(
            measure(f64, g64, r64, iters=1) * 1e3, 1
        )

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
