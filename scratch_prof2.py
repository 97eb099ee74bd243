"""Trace the sampling-ablated flagship to itemize the non-sampling ~16 ms."""
import glob
import gzip
import json
from collections import defaultdict

import jax
import jax.numpy as jnp

from lss2_multimodal_nu_tpu.config import Config, ModelConfig
from lss2_multimodal_nu_tpu.models.factory import build_model
from lss2_multimodal_nu_tpu.ops import deformable_sampling as ds
from __graft_entry__ import _fake_inputs

B, K = 6, 6
cfg = Config(model=ModelConfig(
    family="vovnet_transformer", vovnet_type="vovnet39", lss_version="v2",
    effnet_variant="b4", compute_dtype="bfloat16",
))
model = build_model(cfg)
variables = jax.jit(model.init)(jax.random.PRNGKey(0), *_fake_inputs(b=B, seed=0))
sets = [_fake_inputs(b=B, seed=s) for s in range(K)]
st = tuple(jnp.stack([s[i] for s in sets]) for i in range(6))
st = jax.block_until_ready(st)

ds.set_default_impl("zeros")

@jax.jit
def fwd_k(v, st):
    def one(t):
        out = model.apply(v, *t)
        if not isinstance(out, tuple):
            out = (out,)
        return sum(jnp.sum(o.astype(jnp.float32)) for o in out)
    return jnp.sum(jax.lax.map(one, st))

float(fwd_k(variables, st))
tdir = "/tmp/jax_trace_prof2"
jax.profiler.start_trace(tdir)
float(fwd_k(variables, st))
jax.profiler.stop_trace()
files = glob.glob(tdir + "/**/*.trace.json.gz", recursive=True)
ev = json.loads(gzip.open(sorted(files)[-1]).read())["traceEvents"]
tot = defaultdict(float)
for e in ev:
    if e.get("ph") == "X" and "dur" in e and e.get("pid") == 3:
        tot[e.get("name", "")] += e["dur"]
for name, d in sorted(tot.items(), key=lambda kv: -kv[1])[:30]:
    print(f"{d/1e3/K:8.3f} ms/batch  {name[:100]}")
