import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import glob
import numpy as np, jax, jax.numpy as jnp
from wcmc_tpu.data.batches import synthetic_batch
from wcmc_tpu.train.factory import TrainConfig, init_interfaces

cfg = TrainConfig(base_model="kpcn", use_llpm_buf=True, manif_learn=True,
                  manif_loss="FMSE", finite_check_every=10**9)
iface = init_interfaces(cfg)[0]
rng = np.random.default_rng(0)
batch = synthetic_batch(rng, "kpcn", batch_size=8, patch=128, spp=8, use_llpm_buf=True)
raw_step = iface._make_train_step()
key = jax.random.PRNGKey(0)

@jax.jit
def chained(states, n):
    def body(i, s):
        ns, _ = raw_step(s, batch, jax.random.fold_in(key, i))
        return ns
    return jax.lax.fori_loop(0, n, body, states)

def rb(s):
    return float(jnp.sum(jax.tree_util.tree_leaves(s["dncnn"].params)[0]))

rb(chained(iface.states, 2))
jax.profiler.start_trace("/tmp/trace_chained")
rb(chained(iface.states, 10))
jax.profiler.stop_trace()

from tensorflow.tsl.profiler.protobuf import xplane_pb2
f = glob.glob("/tmp/trace_chained/plugins/profile/*/*.xplane.pb")[0]
xs = xplane_pb2.XSpace(); xs.ParseFromString(open(f,'rb').read())
for plane in xs.planes:
    if "TPU" not in plane.name: continue
    stats = {}
    for line in plane.lines:
        for ev in line.events:
            name = plane.event_metadata[ev.metadata_id].name
            stats[name] = stats.get(name, 0) + ev.duration_ps/1e9
    tot = 0
    for name, ms in sorted(stats.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{ms/10:8.3f} ms/step  {name[:105]}", flush=True)
    break
