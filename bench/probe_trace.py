"""Capture an XProf trace of the config-5 model fwd+bwd and print the
top ops by self time."""
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
import jax

jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
from flax import nnx

from pytorch_points_tpu.models import PointCloudAutoencoder

rng = np.random.default_rng(0)
model = PointCloudAutoencoder(npoint1=512, npoint2=128, rngs=nnx.Rngs(0))
graphdef, params = nnx.split(model)
x = jnp.asarray(rng.uniform(-1, 1, (16, 2048, 3)), jnp.float32)


def gsum(g):
    return sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(g))


@jax.jit
def f(params):
    def loss(p):
        m = nnx.merge(graphdef, p)
        return jnp.mean(m(x) ** 2)

    l, g = jax.value_and_grad(loss)(params)
    return l + 0.0 * gsum(g)


from pytorch_points_tpu.utils.benchmark import device_sync

device_sync(f(params))
device_sync(f(params))

tdir = "/tmp/ppt_trace"
os.system(f"rm -rf {tdir}")
with jax.profiler.trace(tdir):
    r = None
    for _ in range(3):
        r = f(params)
    device_sync(r)

# Parse: find the xplane file and dump top ops by total self time.
planes = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
print("planes:", planes)
from xprof.convert import raw_to_tool_data as rtd

data, _ = rtd.xspace_to_tool_data(planes, "framework_op_stats", {})
import csv
import io

# data may be bytes of a protobuf-based table or json; try op_profile instead if needed
if isinstance(data, bytes):
    data = data.decode("utf-8", "replace")
print(data[:3000])
