import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys, time, numpy as np, jax, jax.numpy as jnp
if len(sys.argv) > 1 and sys.argv[1] == "bf16":
    jax.config.update('jax_default_matmul_precision', 'bfloat16')
from wcmc_tpu.data.batches import synthetic_batch
from wcmc_tpu.train.factory import TrainConfig, init_interfaces

cfg = TrainConfig(base_model="kpcn", use_llpm_buf=True, manif_learn=True,
                  manif_loss="FMSE", finite_check_every=10**9)
iface = init_interfaces(cfg)[0]
rng = np.random.default_rng(0)
batch = synthetic_batch(rng, "kpcn", batch_size=8, patch=128, spp=8, use_llpm_buf=True)
iface.to_train_mode()
def readback(ld):
    return float(sum(jnp.sum(v) for v in ld.values()))
t0=time.time()
for _ in range(3):
    iface.preprocess(batch); ld = iface.train_batch(batch)
readback(ld)
print("compile+warmup:", time.time()-t0, flush=True)
t0=time.perf_counter()
N=10
for _ in range(N):
    iface.preprocess(batch); ld = iface.train_batch(batch)
readback(ld)
dt=(time.perf_counter()-t0)
print(f"mode={sys.argv[1] if len(sys.argv)>1 else 'default'} step: {(dt*1e3-35)/N:.1f} ms/iter")
