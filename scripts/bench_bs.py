import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
from wcmc_tpu.data.batches import synthetic_batch
from wcmc_tpu.train.factory import TrainConfig, init_interfaces
BS = int(sys.argv[1]) if len(sys.argv) > 1 else 16
cfg = TrainConfig(base_model="kpcn", use_llpm_buf=True, manif_learn=True,
                  manif_loss="FMSE", finite_check_every=10**9)
iface = init_interfaces(cfg)[0]
rng = np.random.default_rng(0)
batch = synthetic_batch(rng, "kpcn", batch_size=BS, patch=128, spp=8, use_llpm_buf=True)
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
t0=time.perf_counter(); rb(chained(iface.states, 10))
dt=(time.perf_counter()-t0-0.035)/10
print(f"bs{BS} step: {dt*1e3:.1f} ms -> {BS*128*128/1e6/dt:.2f} MP/s", flush=True)
